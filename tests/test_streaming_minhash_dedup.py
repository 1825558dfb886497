"""Streaming MinHash-LSH near-dup dedup (streaming/minhash_dedup.py):
bucket-disjointness guarantee, cross-batch suppression, restart safety,
and agreement with the batch banding."""

from __future__ import annotations

import pytest as _pytest_r10

from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.streaming.minhash_dedup import (
    band_bucket_keys,
    minhash_dedup_stream,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill in the late afternoon sun"
)
VARIANT = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill in the late afternoon light"
)
OTHER = (
    "completely different text about distributed query engines shuffling "
    "partitioned columnar data across executor boundaries at scale"
)


def _write(spark, path, rows, mode):
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
        mode
    ).parquet(path)


def test_band_keys_shape_and_determinism(spark):
    docs = spark.createDataFrame(
        [(1, BASE), (2, VARIANT), (3, OTHER)], "doc_id long, text string"
    )
    bk = band_bucket_keys(docs, "doc_id", "text", n_hashes=16, bands=4)
    rows = bk.collect()
    assert len(rows) == 12  # 3 docs x 4 bands
    # near-identical docs share at least one bucket; unrelated docs none
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.id, set()).add(r.band_key)
    assert by_doc[1] & by_doc[2], "near-dups must collide in >=1 band"
    assert not (by_doc[1] & by_doc[3])
    # determinism: same input -> identical keys
    again = {(r.id, r.band_key) for r in band_bucket_keys(
        docs, "doc_id", "text", n_hashes=16, bands=4).collect()}
    assert again == {(r.id, r.band_key) for r in rows}


@_pytest_r10.mark.slow  # round 10: heavy e2e — full-suite-only
def test_streaming_neardup_suppressed_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    emitted: list[tuple[int, int]] = []

    def emit(df, batch_id):
        emitted.extend((batch_id, r.doc_id) for r in df.collect())

    # batch 1: base doc + unrelated doc (both emit)
    _write(spark, src, [(1, BASE), (3, OTHER)], "overwrite")
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        minhash_dedup_stream(stream, "doc_id", "text", state, emit, m_bits=1 << 14)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    # batch 2: near-dup of doc 1 (suppressed), exact resend of doc 3
    # (suppressed), fresh doc 4 (emitted)
    doc4 = (
        "an entirely separate passage describing watermark semantics and "
        "stateful aggregation checkpoints inside structured streaming "
        "pipelines recovering deterministically after coordinator restarts"
    )
    _write(spark, src, [(2, VARIANT), (3, OTHER), (4, doc4)], "append")
    q.processAllAvailable()
    q.stop()

    ids = sorted(i for _, i in emitted)
    assert 1 in ids and 3 in ids
    assert 2 not in ids, "near-duplicate must be suppressed across batches"
    # emitted docs never share a band bucket (the operator's guarantee)
    docs = spark.createDataFrame(
        [(1, BASE), (3, OTHER), (4, doc4)], "doc_id long, text string"
    ).where(F.col("doc_id").isin(ids))
    bk = band_bucket_keys(docs, "doc_id", "text").collect()
    seen: dict[str, int] = {}
    for r in bk:
        assert seen.setdefault(r.band_key, r.id) == r.id
    # restart: a NEW query over the same source + state re-emits nothing
    emitted.clear()
    stream2 = spark.readStream.schema("doc_id long, text string").parquet(src)
    q2 = (
        minhash_dedup_stream(stream2, "doc_id", "text", state, emit, m_bits=1 << 14)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    assert emitted == [], f"replay must not re-emit: {emitted}"


def test_in_batch_min_id_survivor(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    emitted: list[int] = []

    def emit(df, batch_id):
        emitted.extend(r.doc_id for r in df.collect())

    # one batch holding a near-dup pair: only the min id survives
    _write(spark, src, [(7, BASE), (5, VARIANT), (9, OTHER)], "overwrite")
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        minhash_dedup_stream(stream, "doc_id", "text", state, emit, m_bits=1 << 14)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert sorted(emitted) == [5, 9]


def test_reconcile_neardup_report(spark, tmp_path):
    """Round-4: the offline reconciliation measures what the online
    shortcuts cost — justified drops (a verified near-dup IS in the
    emitted corpus) vs false drops (nothing similar survived), plus
    Bloom saturation from the persisted state."""
    from fortune_500_financial_insights_pipeline_spark.streaming.minhash_dedup import (
        reconcile_neardup_report,
    )

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    emitted: list[int] = []

    def emit(df, batch_id):
        emitted.extend(r.doc_id for r in df.collect())

    doc4 = (
        "an entirely separate passage describing watermark semantics and "
        "stateful aggregation checkpoints inside structured streaming "
        "pipelines recovering deterministically after coordinator restarts"
    )
    _write(spark, src, [(1, BASE), (3, OTHER)], "overwrite")
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        minhash_dedup_stream(stream, "doc_id", "text", state, emit, m_bits=1 << 14)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    _write(spark, src, [(2, VARIANT), (4, doc4)], "append")
    q.processAllAvailable()
    q.stop()
    assert sorted(emitted) == [1, 3, 4]

    corpus = spark.createDataFrame(
        [(1, BASE), (2, VARIANT), (3, OTHER), (4, doc4)],
        "doc_id long, text string",
    )
    emitted_df = spark.createDataFrame([(i,) for i in emitted], "doc_id long")
    rep = reconcile_neardup_report(
        corpus, emitted_df, "doc_id", "text", state_dir=state, m_bits=1 << 14
    ).head()
    assert (rep.n_corpus, rep.n_emitted, rep.n_dropped) == (4, 3, 1)
    assert rep.n_true_drops == 1 and rep.n_false_drops == 0
    assert rep.false_drop_rate == 0.0
    assert 0.0 < rep.bloom_fill_ratio < 0.5
    assert 0.0 <= rep.bloom_est_fp_per_doc < 0.1

    # strict direction: if doc 2's only near-dup (doc 1) had itself been
    # dropped, BOTH count as false drops — the emitted corpus lost the
    # content regardless of mechanism
    rep2 = reconcile_neardup_report(
        corpus,
        spark.createDataFrame([(3,), (4,)], "doc_id long"),
        "doc_id",
        "text",
    ).head()
    assert (rep2.n_dropped, rep2.n_true_drops, rep2.n_false_drops) == (2, 0, 2)
    assert rep2.false_drop_rate == 1.0
    assert rep2.bloom_fill_ratio is None


def test_streaming_band_keys_plan_is_single_aggregate(spark):
    """Round-10 gate (r9 verdict item 9): the minhash twin's per-batch
    band-key projection inherits the round-9 tokenizer fix — its plan is
    one gram explode + ONE signature aggregate exchange: zero Window
    nodes, no second corpus shuffle, no Python evaluation."""
    from fortune_500_financial_insights_pipeline_spark.streaming.minhash_dedup import (
        band_bucket_keys,
    )

    df = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon " * 4) for i in range(8)],
        "doc_id long, text string",
    )
    keys = band_bucket_keys(df, "doc_id", "text")
    plan = keys._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange") <= 2, plan
