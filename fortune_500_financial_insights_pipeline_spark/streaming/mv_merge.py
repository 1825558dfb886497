"""Streaming incremental materialized-view maintenance: the streaming twin
of operators/incremental.py, closing the batch/streaming loop the same way
bloom_dedup / kmv_cardinality do — a foreachBatch sink that folds each
micro-batch's per-key aggregate STATE into a persisted state relation and
atomically swaps it.

Why foreachBatch instead of a built-in streaming aggregate: the built-in
form keeps state inside the streaming checkpoint, opaque to everything
else. A WAREHOUSE materialized view must be readable by any batch query
between micro-batches — so the state IS the serving table (per-key
count / fixed-point sum / min / max, finalizable to count+sum+avg+min+max
at read time), the merge is the associative fold `merge_states` already
proven batching-invariant, and a batch backfill can apply the exact same
fold to historical data before the stream attaches.

State size = |keys| rows — bounded by key cardinality, not stream length.
Exactly the same algebraic-aggregate constraint as the batch operator:
count/sum merge under retraction too, min/max do not (a delete would need
a recompute); this sink is append-only by contract.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.operators.incremental import (
    grouped_state,
    merge_states,
)


def _state_path(state_dir: str) -> str:
    return os.path.join(state_dir, "current")


def _load_state(spark, state_dir: str, template: DataFrame) -> DataFrame:
    cur = _state_path(state_dir)
    if os.path.isdir(cur):
        return spark.read.schema(template.schema).parquet(cur)
    return spark.createDataFrame([], template.schema)


def _swap_state(merged: DataFrame, state_dir: str) -> None:
    nxt = os.path.join(state_dir, "_next")
    cur = _state_path(state_dir)
    merged.coalesce(1).write.mode("overwrite").parquet(nxt)
    if os.path.isdir(cur):
        shutil.rmtree(cur)
    os.rename(nxt, cur)


def mv_merge_batch_fn(
    keys: list[str], value_col: str, state_dir: str
) -> Callable[[DataFrame, int], None]:
    """foreachBatch function: batch → per-key state → fold into the
    persisted view state. Exposed separately so a batch backfill applies
    the same fold to history before the stream attaches."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        delta = grouped_state(batch_df, keys, value_col)
        state = _load_state(spark, state_dir, delta)
        merged = merge_states([state, delta], keys).localCheckpoint(eager=True)
        _swap_state(merged, state_dir)

    return process


def mv_merge_stream(
    stream: DataFrame,
    keys: list[str],
    value_col: str,
    state_dir: str,
    checkpoint_dir: str,
):
    """Attach the incremental-MV sink to a streaming DataFrame. Read the
    view anytime with ``read_view``."""
    return (
        stream.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(mv_merge_batch_fn(keys, value_col, state_dir))
        .trigger(availableNow=True)
        .start()
    )


def read_view(spark, state_dir: str, keys: list[str]) -> DataFrame:
    """Finalize the persisted state into the user-facing aggregate —
    identical columns to the batch ``finalize_state``."""
    from fortune_500_financial_insights_pipeline_spark.operators.incremental import (
        finalize_state,
    )

    cur = _state_path(state_dir)
    state = spark.read.parquet(cur)
    return finalize_state(state, keys)
