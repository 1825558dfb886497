"""Per-ticker entity CSV pipelines: dividends, analyst recommendations,
earnings estimates and options chains.

The reference ingests all four as raw per-ticker CSVs
(/root/reference/code/airflow/dags/ingest_data_API.py:97-128) and declares a
warehouse shape only for the first two (DIVIDEND_HISTORY,
ANALYSTRECCOMENDATIONS — code/sql/DDLs:164-183,18-29); it never ships a
transform for any of them. This closes that gap the same way as every other
feed: one glob scan, filename-derived Ticker, typed cast, DDL-conformed
warehouse write (earnings estimates / options extend the DDL palette —
see warehouse_schemas.EARNINGS_ESTIMATES / OPTIONS_CHAIN).

yfinance export shapes:
* dividends: header ``Date,Dividends``, one row per ex-date;
* recommendations: header ``Date,Period,StrongBuy,Buy,Hold,Sell,StrongSell``
  (period is a relative tag like ``0m``/``-1m``);
* earnings estimates: header ``period,numberOfAnalysts,avg,low,high,
  yearAgoEps,growth`` — 4 rows (0q,+1q,0y,+1y), one file per ticker
  (ingest_data_API.py:101-103);
* options: files ``calls_{T}.csv`` / ``puts_{T}.csv`` with the yfinance
  chain columns (contractSymbol … currency — ingest_data_API.py:120-128);
  the call/put side lives only in the filename, recovered at scan time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _ticker_from_file() -> F.Column:
    return F.upper(F.regexp_extract(F.input_file_name(), r"([^/]+?)\.csv$", 1))


def dividends(spark: SparkSession, glob: str) -> DataFrame:
    """Raw dividend CSVs → (Ticker, Date, Dividends) rows, invalid dates
    quarantined (the engine-wide bronze→silver pattern)."""
    schema = T.StructType(
        [
            T.StructField("Date", T.StringType()),
            T.StructField("Dividends", T.StringType()),
        ]
    )
    df = spark.read.csv(glob, schema=schema, header=True)
    return (
        df.withColumn("Ticker", _ticker_from_file())
        .withColumn("Date", F.to_date(F.substring("Date", 1, 10), "yyyy-MM-dd"))
        .filter(F.col("Date").isNotNull())
        .withColumn("Dividends", F.col("Dividends").cast("double"))
        .select("Ticker", "Date", "Dividends")
    )


def analyst_recommendations(spark: SparkSession, glob: str) -> DataFrame:
    """Raw recommendation CSVs → typed counts per (Ticker, Date, Period)."""
    counts = ["StrongBuy", "Buy", "Hold", "Sell", "StrongSell"]
    schema = T.StructType(
        [T.StructField("Date", T.StringType()), T.StructField("Period", T.StringType())]
        + [T.StructField(c, T.StringType()) for c in counts]
    )
    df = spark.read.csv(glob, schema=schema, header=True)
    out = (
        df.withColumn("Ticker", _ticker_from_file())
        .withColumn("Date", F.to_date(F.substring("Date", 1, 10), "yyyy-MM-dd"))
        .filter(F.col("Date").isNotNull())
    )
    for c in counts:
        out = out.withColumn(c, F.col(c).cast("int"))
    return out.select("Ticker", "Date", "Period", *counts)


def earnings_estimates(spark: SparkSession, glob: str, as_of: str) -> DataFrame:
    """Raw earnings-estimate CSVs → typed rows per (Ticker, Period).

    ``as_of`` stamps the load date (the feed is a point-in-time snapshot
    with no date column of its own — ingest_data_API.py:101-103)."""
    cols = ["numberOfAnalysts", "avg", "low", "high", "yearAgoEps", "growth"]
    schema = T.StructType(
        [T.StructField("period", T.StringType())]
        + [T.StructField(c, T.StringType()) for c in cols]
    )
    df = spark.read.csv(glob, schema=schema, header=True)
    return (
        df.withColumn("Ticker", _ticker_from_file())
        .filter(F.col("period").isNotNull())
        .select(
            "Ticker",
            F.col("period").alias("Period"),
            F.col("numberOfAnalysts").cast("int").alias("NumberOfAnalysts"),
            F.col("avg").cast("double").alias("Avg"),
            F.col("low").cast("double").alias("Low"),
            F.col("high").cast("double").alias("High"),
            F.col("yearAgoEps").cast("double").alias("YearAgoEps"),
            F.col("growth").cast("double").alias("Growth"),
            F.to_date(F.lit(as_of)).alias("Date"),
        )
    )


_OPTION_COLS = [
    "contractSymbol", "lastTradeDate", "strike", "lastPrice", "bid", "ask",
    "change", "percentChange", "volume", "openInterest", "impliedVolatility",
    "inTheMoney", "contractSize", "currency",
]


def options_chain(spark: SparkSession, glob: str, as_of: str) -> DataFrame:
    """Raw option-chain CSVs (``calls_*.csv``/``puts_*.csv``) → one typed
    table with an ``OptionType`` column recovered from the filename —
    the same one-glob-scan collapse as open_close (no per-file loop)."""
    schema = T.StructType(
        [T.StructField("idx", T.StringType())]
        + [T.StructField(c, T.StringType()) for c in _OPTION_COLS]
    )
    df = spark.read.csv(glob, schema=schema, header=True)
    fname = F.input_file_name()
    return (
        df.filter(F.col("contractSymbol").isNotNull())
        .select(
            F.upper(F.regexp_extract(fname, r"(?:calls|puts)_([^/]+?)\.csv$", 1)).alias(
                "Ticker"
            ),
            F.when(fname.rlike(r"/calls_[^/]+$"), F.lit("call"))
            .otherwise(F.lit("put"))
            .alias("OptionType"),
            F.col("contractSymbol").alias("ContractSymbol"),
            F.to_timestamp(F.substring("lastTradeDate", 1, 19)).alias("LastTradeDate"),
            F.col("strike").cast("double").alias("Strike"),
            F.col("lastPrice").cast("double").alias("LastPrice"),
            F.col("bid").cast("double").alias("Bid"),
            F.col("ask").cast("double").alias("Ask"),
            F.col("change").cast("double").alias("Change"),
            F.col("percentChange").cast("double").alias("PercentChange"),
            F.col("volume").cast("long").alias("Volume"),
            F.col("openInterest").cast("long").alias("OpenInterest"),
            F.col("impliedVolatility").cast("double").alias("ImpliedVolatility"),
            F.col("inTheMoney").cast("boolean").alias("InTheMoney"),
            F.col("contractSize").alias("ContractSize"),
            F.col("currency").alias("Currency"),
            F.to_date(F.lit(as_of)).alias("Date"),
        )
    )


def near_money_options(options: DataFrame, spot: DataFrame, pct: float = 0.10) -> DataFrame:
    """Options whose strike lies within ±``pct`` of the ticker's spot close —
    the strike-range join the options feed exists to serve.

    ``spot`` is (Ticker, Close), one row per ticker — a dimension, so the
    band predicate rides a BROADCAST equi-join on Ticker with the range as
    a post-join filter on the (small) per-ticker chain. No bin rewrite
    needed: cardinality is |chain per ticker|, not big-big (that case is
    operators/intervaljoin.binned_interval_join)."""
    s = F.broadcast(spot.select("Ticker", F.col("Close").cast("double").alias("__spot")))
    return (
        options.join(s, "Ticker")
        .where(
            (F.col("Strike") >= F.col("__spot") * (1.0 - pct))
            & (F.col("Strike") <= F.col("__spot") * (1.0 + pct))
        )
        .withColumn("Moneyness", F.round(F.col("Strike") / F.col("__spot"), 4))
        .drop("__spot")
    )
