"""Streaming distinct-count at fixed memory: a persisted KMV sketch folded
per micro-batch.

Exact streaming COUNT(DISTINCT) needs per-key state — unbounded on a
forever-stream. The KMV sketch (operators/kmv.py) is mergeable, so the
streaming form is the classic sketch-fold: sketch each micro-batch, merge
into the persisted bottom-k relation (k rows per group, forever), emit the
running estimate. Because merge(sketch(A), sketch(B)) == sketch(A ∪ B)
*exactly* (same k smallest hashes — proven by
test_kmv_merge_equals_sketch_of_union), the running stream estimate equals
the batch estimate over everything seen so far, bit for bit: stream and
batch answers never drift, which is what makes the number trustworthy on a
dashboard fed by both paths.

State mechanics mirror streaming/bloom_dedup.py: parquet state dir,
write-to-_next + atomic rename, at-least-once fold is idempotent (merging
the same batch twice is a no-op — the k smallest of a multiset union are
unchanged by duplicates)."""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from fortune_500_financial_insights_pipeline_spark.operators.kmv import (
    kmv_estimate,
    kmv_merge,
    kmv_sketch,
)


def _state_schema(group_cols: list[str], template: DataFrame) -> T.StructType:
    fields = [f for f in template.schema.fields if f.name in group_cols]
    return T.StructType(fields + [T.StructField("u", T.DoubleType())])


def kmv_cardinality_batch_fn(
    group_cols: list[str],
    key_col: str,
    state_dir: str,
    emit: Callable[[DataFrame, int], None],
    k: int = 64,
) -> Callable[[DataFrame, int], None]:
    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        schema = _state_schema(group_cols, batch_df)
        cur = os.path.join(state_dir, "current")
        if os.path.isdir(cur):
            state = spark.read.schema(schema).parquet(cur)
        else:
            state = spark.createDataFrame([], schema)
        merged = kmv_merge(
            state, kmv_sketch(batch_df, group_cols, key_col, k), group_cols, k
        ).localCheckpoint(eager=True)  # cut the read-from-state lineage
        nxt = os.path.join(state_dir, "_next")
        merged.coalesce(1).write.mode("overwrite").parquet(nxt)
        if os.path.isdir(cur):
            shutil.rmtree(cur)
        os.rename(nxt, cur)
        emit(kmv_estimate(merged, group_cols, k), batch_id)

    return process


def kmv_cardinality_stream(
    stream: DataFrame,
    group_cols: list[str],
    key_col: str,
    state_dir: str,
    emit: Callable[[DataFrame, int], None],
    k: int = 64,
):
    """Returns the DataStreamWriter (caller sets checkpointLocation and
    starts); ``emit`` receives the running per-group estimate each batch."""
    fn = kmv_cardinality_batch_fn(group_cols, key_col, state_dir, emit, k=k)
    return stream.writeStream.foreachBatch(fn).outputMode("append")
