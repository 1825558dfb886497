"""Streaming MERGE: apply micro-batch changesets to a persisted snapshot.

The batch half lives in ``operators/cdc.py`` (snapshot_diff derives a
changeset, apply_changeset consumes one).  This closes the loop for a
CONTINUOUS change feed: each micro-batch of (keys..., action, payload...)
rows folds into a snapshot persisted as parquet — the streaming upsert a
CDC tail (Debezium-shaped feed, incremental API pull) lands into a lake
table, replacing the reference's wholesale per-DAG-run reloads with
changeset-cost maintenance.

Mechanics mirror the repo's other persisted-state sinks (bloom_dedup.py,
mv_merge.py): ``foreachBatch`` reads the current snapshot, applies the
batch's changeset via the SAME ``apply_changeset`` operator the batch path
uses (one left-anti key join + union — AQE broadcasts small changesets),
writes to ``_next`` and atomically renames over ``current``.  A crashed
batch replays against the pre-batch snapshot: apply is idempotent per
batch (delete of an absent key is a no-op, upsert overwrites), so
at-least-once delivery converges to the same snapshot.

Equivalence law (pinned by test): streaming N micro-batches == folding the
same N changesets sequentially through batch ``apply_changeset``.  Batches
must not be reordered across keys — the checkpointed file source delivers
them in order.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame

from fortune_500_financial_insights_pipeline_spark.operators.cdc import apply_changeset


def _load_snapshot(spark, snapshot_dir: str, template: DataFrame) -> DataFrame:
    cur = os.path.join(snapshot_dir, "current")
    if os.path.isdir(cur):
        return spark.read.schema(template.schema).parquet(cur)
    return template.limit(0)


def _swap_snapshot(merged: DataFrame, snapshot_dir: str) -> None:
    nxt = os.path.join(snapshot_dir, "_next")
    cur = os.path.join(snapshot_dir, "current")
    merged.write.mode("overwrite").parquet(nxt)
    if os.path.isdir(cur):
        shutil.rmtree(cur)
    os.rename(nxt, cur)


def apply_changes_stream(
    changes: DataFrame,
    snapshot_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    payload_cols: list[str],
):
    """Start a foreachBatch sink folding a changeset stream into the
    parquet snapshot at ``snapshot_dir``/current.  Returns the started
    StreamingQuery; callers processAllAvailable()/stop() it."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        template = batch_df.select(*keys, *payload_cols)
        snap = _load_snapshot(spark, snapshot_dir, template)
        merged = apply_changeset(snap, batch_df, keys, payload_cols)
        _swap_snapshot(merged, snapshot_dir)

    return (
        changes.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def read_snapshot(spark, snapshot_dir: str) -> DataFrame:
    """The current materialized snapshot (batch-readable between and
    during micro-batches)."""
    return spark.read.parquet(os.path.join(snapshot_dir, "current"))
