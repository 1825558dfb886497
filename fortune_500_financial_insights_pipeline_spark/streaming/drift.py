"""Streaming distribution-drift monitor: running PSI of an event stream
against a static reference distribution.

The batch PSI (operators/stats.psi) answers "has this week's score
distribution moved off the reference?" after the fact; the streaming form
answers it DURING ingestion — each micro-batch folds its bin counts into a
persisted cumulative histogram and re-evaluates the index, so a drifting
upstream pages the pipeline while the bad data is still small.

Design: bin counts are a mergeable aggregate (plain addition), so state is
one tiny (bin, count) relation — n_bins rows forever, regardless of stream
volume. Unlike the bloom/KMV folds, addition is NOT idempotent under
at-least-once replay, so the fold carries a processed-batch-id high-water
mark in the state dir and skips batches it has already absorbed (the
foreachBatch exactly-once pattern for non-idempotent state). The PSI
expression mirrors operators/stats.psi bit-for-bit (same Laplace +1
smoothing over the union bin set, same fixed-point fold), so the final
streaming reading equals the batch operator on the same data exactly —
proven by test_streaming_drift_monitor_matches_batch_psi.

State mechanics mirror streaming/kmv_cardinality.py: parquet state dir,
write-to-_next + atomic rename.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fortune_500_financial_insights_pipeline_spark.functions.deterministic import dsum

_STATE_SCHEMA = T.StructType(
    [T.StructField("b", T.IntegerType()), T.StructField("cnt", T.LongType())]
)


def bin_counts(
    df: DataFrame,
    value_col: str,
    n_bins: int,
    lo: float,
    hi: float,
) -> DataFrame:
    """(b, cnt) equal-width histogram on [lo, hi), edges clamped — the
    same binning rule operators/stats.psi applies."""
    width = (hi - lo) / n_bins
    b = F.greatest(
        F.lit(0),
        F.least(F.floor((F.col(value_col) - lo) / width).cast("int"), F.lit(n_bins - 1)),
    )
    return df.select(b.alias("b")).groupBy("b").agg(F.count(F.lit(1)).alias("cnt"))


def psi_from_bins(ref_bins: DataFrame, new_bins: DataFrame) -> DataFrame:
    """One row (psi, n_ref, n_new) from two (b, cnt) frames — the exact
    formula operators/stats.psi evaluates, factored over pre-binned
    counts: union bin set, Laplace +1 per side, fixed-point fold."""
    j = (
        ref_bins.select("b", F.col("cnt").alias("__r"))
        .join(new_bins.select("b", F.col("cnt").alias("__n")), "b", "full_outer")
        .select(
            (F.coalesce("__r", F.lit(0)) + 1).alias("__cr"),
            (F.coalesce("__n", F.lit(0)) + 1).alias("__cn"),
        )
    )
    tot = j.agg(F.sum("__cr").alias("__tr"), F.sum("__cn").alias("__tn"))
    p_ref = F.col("__cr").cast("double") / F.col("__tr")
    p_new = F.col("__cn").cast("double") / F.col("__tn")
    return (
        j.crossJoin(F.broadcast(tot))
        .agg(
            F.round(dsum((p_new - p_ref) * F.log(p_new / p_ref)), 6).alias("psi"),
            (F.sum("__cr") - F.count(F.lit(1))).cast("long").alias("n_ref"),
            (F.sum("__cn") - F.count(F.lit(1))).cast("long").alias("n_new"),
        )
    )


def drift_monitor_batch_fn(
    ref_bins: DataFrame,
    value_col: str,
    state_dir: str,
    emit: Callable[[DataFrame, int], None],
    n_bins: int = 10,
    lo: float = 0.0,
    hi: float = 1.0,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch fold: add the batch's bin counts to the persisted
    cumulative histogram (batch-id-guarded — addition is not idempotent),
    then emit the running PSI vs ``ref_bins``."""
    ref = ref_bins.localCheckpoint(eager=True)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        mark = os.path.join(state_dir, "last_batch_id")
        if os.path.isfile(mark):
            with open(mark) as fh:
                if batch_id <= int(fh.read().strip()):
                    return  # replayed batch: already folded
        cur = os.path.join(state_dir, "current")
        if os.path.isdir(cur):
            state = spark.read.schema(_STATE_SCHEMA).parquet(cur)
        else:
            state = spark.createDataFrame([], _STATE_SCHEMA)
        fresh = bin_counts(batch_df, value_col, n_bins, lo, hi)
        merged = (
            state.unionByName(fresh)
            .groupBy("b")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
            .localCheckpoint(eager=True)
        )
        nxt = os.path.join(state_dir, "_next")
        merged.coalesce(1).write.mode("overwrite").parquet(nxt)
        if os.path.isdir(cur):
            shutil.rmtree(cur)
        os.rename(nxt, cur)
        with open(mark, "w") as fh:
            fh.write(str(batch_id))
        emit(psi_from_bins(ref, merged), batch_id)

    return process


def drift_monitor_stream(
    stream: DataFrame,
    ref_bins: DataFrame,
    value_col: str,
    state_dir: str,
    emit: Callable[[DataFrame, int], None],
    n_bins: int = 10,
    lo: float = 0.0,
    hi: float = 1.0,
):
    """Returns the DataStreamWriter (caller sets checkpointLocation and
    starts); ``emit`` receives the running (psi, n_ref, n_new) row each
    micro-batch."""
    fn = drift_monitor_batch_fn(
        ref_bins, value_col, state_dir, emit, n_bins=n_bins, lo=lo, hi=hi
    )
    return stream.writeStream.foreachBatch(fn).outputMode("append")
