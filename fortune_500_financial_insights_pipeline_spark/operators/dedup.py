"""Deduplication operators: exact, keep-latest, and fingerprint-based.

The reference's Kaggle∪API union leaves (Ticker, Date) duplicates that its
own DDL forbids (UNIQUE(Ticker, Date), /root/reference/code/sql/DDLs:14;
union at code/spark-jobs/raw_to_landing_sparkjob.py:131-134). These operators
provide the dedup the schema intends, scaled: everything is a hash-partitioned
window or groupBy on the dedup key — no global ordering, no driver loops.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Exact duplicate removal on a column subset (hash groupBy underneath)."""
    return df.dropDuplicates(list(cols) if cols else None)


def keep_latest(
    df: DataFrame, keys: Sequence[str], order_cols: Sequence[str]
) -> DataFrame:
    """One row per key, the max of ``order_cols`` (lexicographic) winning.

    row_number over (partitionBy keys, orderBy order_cols DESC) == 1.
    The shuffle is on the dedup key only; with AQE skew-join handling a hot
    key splits automatically.
    """
    w = W.partitionBy(*keys).orderBy(*[F.desc(c) for c in order_cols])
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def fingerprint_dedup(
    df: DataFrame, text_col: str, id_col: str, normalize: bool = True
) -> DataFrame:
    """Content-hash dedup: md5 of (optionally whitespace/case-normalized)
    text, keeping the smallest id per fingerprint. The md5 is computed
    map-side; the shuffle key is the 128-bit digest, which is uniformly
    distributed — no skew even when the raw text length distribution is
    skewed."""
    norm = F.col(text_col)
    if normalize:
        norm = F.trim(F.regexp_replace(F.lower(norm), r"\s+", " "))
    fp = F.md5(norm)
    w = W.partitionBy("_fp").orderBy(F.asc(id_col))
    return (
        df.withColumn("_fp", fp)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .withColumnRenamed("_fp", "fingerprint")
    )
