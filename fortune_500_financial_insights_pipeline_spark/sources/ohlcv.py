"""OHLCV CSV sources: the reference's two raw price feeds.

* Kaggle bulk export — header, 7 all-string columns, files named
  ``{ticker_lower}.us.txt`` (/root/reference/code/spark-jobs/
  raw_to_landing_sparkjob.py:13-32, ingest file naming :169).
* yfinance API export — NO header, 4 leading metadata rows, files named
  ``{TICKER}.csv`` (raw_to_landing_sparkjob.py:63-89).

Both read with explicit all-StringType schemas (raw layer is stringly by
design — "read as string first, then convert", SURVEY.md §1.2); typing
happens in operators/standardize.py.

The reference reads one file per ticker in a Python loop and folds 20
unions (raw_to_landing_sparkjob.py:165-184). Here a single glob scan reads
every ticker at once and the ticker is derived from ``input_file_name()`` —
one scan node in the plan, executor-parallel across files, no per-ticker
driver round-trips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

KAGGLE_COLUMNS = ["Date", "Open", "High", "Low", "Close", "Volume", "OpenInt"]
API_COLUMNS = ["Date", "AdjClose", "Close", "High", "Low", "Open", "Volume"]


def _string_schema(cols: list[str]) -> T.StructType:
    return T.StructType([T.StructField(c, T.StringType(), True) for c in cols])


def read_kaggle_csv(spark: SparkSession, path: str) -> DataFrame:
    """Kaggle feed: header row present, ticker = lowercase file stem
    (``aapl.us.txt`` → AAPL)."""
    df = spark.read.csv(path, schema=_string_schema(KAGGLE_COLUMNS), header=True)
    ticker = F.upper(
        F.regexp_extract(F.input_file_name(), r"([^/]+?)\.us\.txt$", 1)
    )
    return df.withColumn("Ticker", ticker)


def read_api_csv(spark: SparkSession, path: str) -> DataFrame:
    """yfinance feed: headerless, first 4 rows of each file are metadata
    garbage — dropped per file (parallel across files), not via the
    reference's single-partition global window."""
    from fortune_500_financial_insights_pipeline_spark.operators.skip_rows import skip_rows_per_file

    df = spark.read.csv(path, schema=_string_schema(API_COLUMNS), header=False)
    ticker = F.upper(F.regexp_extract(F.input_file_name(), r"([^/]+?)\.csv$", 1))
    df = df.withColumn("Ticker", ticker)
    return skip_rows_per_file(df, n=4)
