"""Bronze→silver standardization for OHLCV rows: the typing/cleanup pass of
/root/reference/code/spark-jobs/raw_to_landing_sparkjob.py:35-53 (Kaggle) and
:92-104 (API), as reusable column transforms.

Semantics preserved exactly (tested against FIXTURES.md §2.7 invariants):
* invalid date strings -> null via to_date -> row quarantined (filtered),
* comma-grouped Volume de-comma'd then cast double,
* source-specific columns dropped (OpenInt / AdjClose),
* Source literal tag, derived year partition column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PRICE_COLS = ["Open", "High", "Low", "Close"]
STANDARD_COLUMNS = [
    "Date",
    "Open",
    "High",
    "Low",
    "Close",
    "Volume",
    "Source",
    "year",
    "Ticker",
]


def standardize_ohlcv(df: DataFrame, source: str, drop: list[str]) -> DataFrame:
    """All-string OHLCV frame (with Ticker column) → typed standard schema."""
    out = (
        df.withColumn("Date", F.to_date("Date", "yyyy-MM-dd"))
        .filter(F.col("Date").isNotNull())
    )
    for c in PRICE_COLS:
        out = out.withColumn(c, F.col(c).cast("double"))
    out = out.withColumn(
        "Volume", F.regexp_replace("Volume", ",", "").cast("double")
    )
    out = (
        out.drop(*drop)
        .withColumn("Source", F.lit(source))
        .withColumn("year", F.year("Date"))
    )
    return out.select(*STANDARD_COLUMNS)


def standardize_kaggle(df: DataFrame) -> DataFrame:
    return standardize_ohlcv(df, source="Kaggle", drop=["OpenInt"])


def standardize_api(df: DataFrame) -> DataFrame:
    return standardize_ohlcv(df, source="API", drop=["AdjClose"])


def filter_to_universe(df, universe, ticker_col: str = "Ticker"):
    """Restrict to the ticker universe via a broadcast semi-join — the
    Spark-native form of the reference's stock_list.csv driver loop
    (raw_to_landing_sparkjob.py:160-178 reads the list with pandas and
    iterates; here the 20-row dimension broadcasts and no row leaves an
    executor). ``universe`` is any DataFrame with a Ticker column."""
    from pyspark.sql import functions as F

    dim = universe.select(F.upper(F.col(ticker_col)).alias(ticker_col)).distinct()
    return df.join(F.broadcast(dim), ticker_col, "left_semi")
