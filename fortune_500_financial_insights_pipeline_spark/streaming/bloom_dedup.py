"""Cross-batch approximate dedup with BOUNDED state: a persisted Bloom
filter instead of a per-key state store.

``dropDuplicates``/``dropDuplicatesWithinWatermark`` (streaming/curation.py)
keep exact per-digest state — unbounded on a forever-stream without event
time, and still O(distinct keys within the watermark) with it. The Bloom
alternative trades exactness for a HARD memory bound: the filter is a fixed
``m_bits`` bits no matter how many keys flow through, and its guarantee
inverts the usual one — **no duplicate is ever emitted twice** (a seen key
always probes positive), while a never-seen key is dropped as a false
positive at the designed (1-e^{-kn/m})^k rate. For training-data ingestion
that is the right trade: emitting a duplicate poisons the corpus; losing a
document at ~1% odds at capacity is noise. Size m to the corpus: at 10 bits
per expected key (k=3) the FP rate stays under ~2%.

Mechanics: ``foreachBatch`` probes each micro-batch against the filter
relation persisted as parquet (``state_dir``), emits the definite-new rows
to the user sink, ORs their bits into the filter, and atomically swaps the
state (write to ``_next``, then rename) so a crashed batch replays against
the old filter — at-least-once state update + always-positive probes keep
the no-duplicate guarantee across restarts. The filter is at most
``m_bits/32`` rows (kilobytes), so the probe join is always broadcast.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fortune_500_financial_insights_pipeline_spark.operators.bloom import (
    bloom_build,
    bloom_probe,
)

_STATE_SCHEMA = T.StructType(
    [T.StructField("word", T.LongType()), T.StructField("bits", T.LongType())]
)


def _load_state(spark, state_dir: str) -> DataFrame:
    cur = os.path.join(state_dir, "current")
    if os.path.isdir(cur):
        return spark.read.schema(_STATE_SCHEMA).parquet(cur)
    return spark.createDataFrame([], _STATE_SCHEMA)


def _swap_state(merged: DataFrame, state_dir: str) -> None:
    nxt = os.path.join(state_dir, "_next")
    cur = os.path.join(state_dir, "current")
    merged.coalesce(1).write.mode("overwrite").parquet(nxt)
    if os.path.isdir(cur):
        shutil.rmtree(cur)
    os.rename(nxt, cur)


def bloom_dedup_batch_fn(
    key_col: str,
    state_dir: str,
    emit: Callable[[DataFrame, int], None],
    m_bits: int = 1 << 20,
    k: int = 3,
) -> Callable[[DataFrame, int], None]:
    """The foreachBatch function: probe → emit definite-new → fold into the
    persisted filter. Exposed separately so batch backfills can reuse the
    exact same state against the exact same semantics."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        state = _load_state(spark, state_dir)
        # in-batch dedup first (a key twice in one batch must emit once),
        # then the cross-batch probe against the persisted filter
        once = batch_df.dropDuplicates([key_col])
        probed = bloom_probe(state, once, key_col, m_bits=m_bits, k=k)
        fresh = probed.where(~F.col("maybe_member")).drop("maybe_member")
        # materialize BEFORE the state swap: `fresh` reads the state dir
        # lazily, and emit() must see rows decided by the OLD filter
        fresh = fresh.localCheckpoint(eager=True)
        emit(fresh, batch_id)
        merged = (
            state.unionByName(bloom_build(fresh, key_col, m_bits=m_bits, k=k))
            .groupBy("word")
            .agg(F.bit_or("bits").alias("bits"))
            .localCheckpoint(eager=True)  # cut the read-from-state lineage
        )
        _swap_state(merged, state_dir)

    return process


def bloom_dedup_stream(
    stream: DataFrame,
    key_col: str,
    state_dir: str,
    emit: Callable[[DataFrame, int], None],
    m_bits: int = 1 << 20,
    k: int = 3,
):
    """Wire the dedup into a streaming query: returns the DataStreamWriter
    (caller adds checkpointLocation/trigger and starts it)."""
    fn = bloom_dedup_batch_fn(key_col, state_dir, emit, m_bits=m_bits, k=k)
    return stream.writeStream.foreachBatch(fn).outputMode("append")
