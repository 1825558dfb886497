"""Resilient bronze-layer reads: malformed-record quarantine.

The reference tolerates bad data operationally — try/except-log-and-skip
per ticker (raw_to_landing_sparkjob.py:114-128, SURVEY.md §5) — which
drops a whole file for one bad row and hides the loss in logs. The engine
does it declaratively: PERMISSIVE parsing routes each malformed ROW to a
``_corrupt_record`` column; ``split_corrupt`` forks good rows from a
quarantine frame so bad data is counted, inspectable, and replayable.

One scan feeds both forks (Spark caches the parse); at 100 TB the
quarantine write costs only the bad slice."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    return T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])


def read_json_resilient(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Schema'd JSON read in PERMISSIVE mode: rows that don't parse keep
    their raw text in _corrupt_record instead of killing the job (FAILFAST)
    or vanishing (DROPMALFORMED)."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_csv_resilient(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True
) -> DataFrame:
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path, header=header)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows lose the corrupt column; quarantine
    keeps the raw text for replay after a schema fix.

    Spark requires referencing a non-corrupt column alongside the filter,
    so the frame is cached for the two forks (one parse, two outputs)."""
    df = df.cache()
    clean = df.filter(df[CORRUPT_COL].isNull()).drop(CORRUPT_COL)
    quarantine = df.filter(df[CORRUPT_COL].isNotNull()).select(CORRUPT_COL)
    return clean, quarantine
