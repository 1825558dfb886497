"""SCD Type-2 reconstruction: snapshot rows → validity intervals.

The reference's entity tables (info, sustainability — SURVEY.md §1.1) are
point-in-time snapshots keyed by ticker; its warehouse keeps only the
latest load (BQ WRITE_TRUNCATE, `transform_json_INFO.py:104-119`). The
standard warehouse treatment is Type-2 history: one row per (key,
attribute-state) episode with [valid_from, valid_to) bounds. This
operator derives that from any snapshot stream in two windows over ONE
shuffle (both windows share the partition key, so Catalyst plans a
single exchange):

1. change detection — drop a snapshot if its tracked attributes equal
   the previous snapshot's (null-safe struct compare);
2. interval assembly — valid_to = next change's valid_from (lead), open
   (null) for the current episode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2(
    snapshots: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """(keys, attrs, valid_from, valid_to) episodes from snapshot rows.

    Ordering within a key follows ``ts_col`` alone — pass a composite
    (e.g. via a struct column) if snapshot timestamps can tie.
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    state = F.struct(*[F.col(c) for c in attr_cols])
    changed = (
        snapshots.withColumn("__prev", F.lag(state).over(w))
        .where(F.col("__prev").isNull() | ~state.eqNullSafe(F.col("__prev")))
        .drop("__prev")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(ts_col)
    return (
        changed.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w2))
        .select(*key_cols, *attr_cols, "valid_from", "valid_to")
    )


def as_of_snapshot(history: DataFrame, ts) -> DataFrame:
    """Point-in-time slice of an SCD2 table: the episode covering ``ts``."""
    t = F.lit(ts)
    return history.where(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )
