"""Streaming quantile monitor at fixed memory: a persisted bottom-k value
sample folded per micro-batch.

Exact streaming percentiles need every value ever seen — unbounded state.
The bottom-k value sample (operators/kmv.quantile_sketch) is mergeable:
union + re-trim keeps exactly the k rows whose md5(id) hashes smallest,
and that set is a function of the DATA, not of how it was batched. So the
streaming form is the same sketch-fold as streaming/kmv_cardinality.py:
sample each micro-batch, merge into the persisted k-row-per-group
relation, emit running p50/p90 estimates. The running stream estimate
equals the batch estimate over everything seen so far BIT FOR BIT
(test-pinned), which is what lets one dashboard number be fed by either
path.

State mechanics mirror bloom_dedup/kmv_cardinality: parquet state dir,
write-to-_next + atomic rename; the at-least-once fold is idempotent —
replaying a batch re-unions rows whose (group, id) already sit in state,
and the pre-trim dropDuplicates makes the re-trim a no-op."""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from fortune_500_financial_insights_pipeline_spark.operators.kmv import (
    quantile_sketch,
    sketch_quantiles,
)


def _state_schema(
    group_cols: list[str], id_col: str, value_col: str, template: DataFrame
) -> T.StructType:
    keep = set(group_cols) | {id_col, value_col}
    return T.StructType([f for f in template.schema.fields if f.name in keep])


def quantile_monitor_batch_fn(
    group_cols: list[str],
    id_col: str,
    value_col: str,
    state_dir: str,
    emit: Callable[[DataFrame, int], None],
    k: int = 64,
    probs: tuple[float, ...] = (0.5, 0.9),
) -> Callable[[DataFrame, int], None]:
    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        schema = _state_schema(group_cols, id_col, value_col, batch_df)
        cols = [f.name for f in schema.fields]
        cur = os.path.join(state_dir, "current")
        if os.path.isdir(cur):
            state = spark.read.schema(schema).parquet(cur)
        else:
            state = spark.createDataFrame([], schema)
        pooled = state.unionByName(batch_df.select(*cols)).dropDuplicates(
            [*group_cols, id_col]
        )
        merged = quantile_sketch(
            pooled, group_cols, id_col, value_col, k
        ).localCheckpoint(eager=True)  # cut the read-from-state lineage
        nxt = os.path.join(state_dir, "_next")
        merged.coalesce(1).write.mode("overwrite").parquet(nxt)
        if os.path.isdir(cur):
            shutil.rmtree(cur)
        os.rename(nxt, cur)
        emit(sketch_quantiles(merged, group_cols, value_col, probs), batch_id)

    return process


def quantile_monitor_stream(
    stream: DataFrame,
    group_cols: list[str],
    id_col: str,
    value_col: str,
    state_dir: str,
    emit: Callable[[DataFrame, int], None],
    k: int = 64,
    probs: tuple[float, ...] = (0.5, 0.9),
):
    """Returns the DataStreamWriter (caller sets checkpointLocation and
    starts); ``emit`` receives running per-group quantile estimates each
    micro-batch."""
    fn = quantile_monitor_batch_fn(
        group_cols, id_col, value_col, state_dir, emit, k=k, probs=probs
    )
    return stream.writeStream.foreachBatch(fn).outputMode("append")
