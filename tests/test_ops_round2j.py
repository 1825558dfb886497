"""Round-2j: streaming changeset MERGE (stream == sequential batch fold),
plus property checks for the source-overlap matrix and label-centroid QA
(oracle parity at sf0.001 lives in test_oracle_parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.operators.cdc import apply_changeset
from fortune_500_financial_insights_pipeline_spark.streaming.cdc_apply import (
    apply_changes_stream,
    read_snapshot,
)

CHANGES_SCHEMA = "k long, action string, v string"

BATCHES = [
    [(1, "insert", "a"), (2, "insert", "b"), (3, "insert", "c")],
    [(2, "update", "B"), (3, "delete", None), (4, "insert", "d")],
    [(1, "delete", None), (4, "update", "D"), (5, "insert", "e")],
]


def test_streaming_merge_equals_sequential_batch_fold(spark, tmp_path):
    src = str(tmp_path / "src")
    snap_dir = str(tmp_path / "snap")
    ckpt = str(tmp_path / "ckpt")

    # batch truth: fold the same changesets in order
    expected = spark.createDataFrame([], "k long, v string")
    for rows in BATCHES:
        cs = spark.createDataFrame(rows, CHANGES_SCHEMA)
        expected = apply_changeset(expected, cs, ["k"], ["v"])
    expected_rows = sorted(map(tuple, expected.collect()))

    for i, rows in enumerate(BATCHES):
        spark.createDataFrame(rows, CHANGES_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = (
        spark.readStream.schema(CHANGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = apply_changes_stream(stream, snap_dir, ckpt, ["k"], ["v"])
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(map(tuple, read_snapshot(spark, snap_dir).collect()))
    assert got == expected_rows
    assert got == [(2, "B"), (4, "D"), (5, "e")]


def test_streaming_merge_resumes_from_checkpoint(spark, tmp_path):
    src = str(tmp_path / "src")
    snap_dir = str(tmp_path / "snap")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(BATCHES[0], CHANGES_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema(CHANGES_SCHEMA).parquet(src)
    q = apply_changes_stream(stream, snap_dir, ckpt, ["k"], ["v"])
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sorted(r["k"] for r in read_snapshot(spark, snap_dir).collect()) == [1, 2, 3]

    # restart against the SAME checkpoint: only the new file is applied
    spark.createDataFrame(BATCHES[1], CHANGES_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream2 = spark.readStream.schema(CHANGES_SCHEMA).parquet(src)
    q2 = apply_changes_stream(stream2, snap_dir, ckpt, ["k"], ["v"])
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    got = {r["k"]: r["v"] for r in read_snapshot(spark, snap_dir).collect()}
    assert got == {1: "a", 2: "B", 4: "d"}


def test_source_overlap_symmetric_pairs_once(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_source_overlap"](spark, sf_dir).collect()
    for r in rows:
        assert r["source_a"] < r["source_b"]  # each pair reported once
        assert r["shared_spans"] >= 1


def test_label_centroids_sum_to_corpus_and_cos_bounded(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_label_centroids"](spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r["n"] for r in rows) == total
    assert all(-1.0 <= r["cos_to_global"] <= 1.0 for r in rows)
