"""Per-ticker entity CSV pipelines: dividends and analyst recommendations.

The reference ingests these as raw per-ticker CSVs (dividend_data/,
analyst_recs/ — /root/reference/code/airflow/dags/ingest_data_API.py:48-60,
97-128) and declares their warehouse shape in the DDLs
(DIVIDEND_HISTORY, ANALYSTRECCOMENDATIONS — code/sql/DDLs:164-183,18-29)
but never ships a transform for them. This closes that gap the same way as
every other feed: one glob scan, filename-derived Ticker, typed cast,
DDL-conformed warehouse write.

yfinance export shapes:
* dividends: header ``Date,Dividends``, one row per ex-date;
* recommendations: header ``Date,Period,StrongBuy,Buy,Hold,Sell,StrongSell``
  (period is a relative tag like ``0m``/``-1m``).
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
