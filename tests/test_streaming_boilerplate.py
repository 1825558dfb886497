"""Streaming cross-corpus boilerplate detection (streaming/boilerplate.py):
cross-batch promotion, never-miss guarantee, replay idempotency of the
set-based cascade, and final-state agreement with the batch operator
(operators/text.boilerplate_units) over the same corpus."""

from __future__ import annotations

import pytest as _pytest_r10

from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.streaming.boilerplate import (
    boilerplate_batch_fn,
    boilerplate_stream,
    chunk_units,
    reconcile_boilerplate_report,
)

# shared template long enough to form at least one full CDC chunk, plus
# per-doc unique tails so the docs are not exact duplicates
TEMPLATE = (
    "subscribe to our newsletter for updates terms of service apply "
    "copyright two thousand twenty four all rights reserved worldwide "
    "privacy policy cookie settings contact support help center site map "
    "follow us on social media channels for the latest announcements "
    "this content is provided as is without warranty of any kind"
)  # 50 words; the k=3/divisor=16 CDC rule places 6 boundaries inside it


def _doc(i: int) -> str:
    tail = " ".join(f"unique{i}word{j}" for j in range(12))
    return f"{TEMPLATE} {tail}"


def _write(spark, path, rows, mode):
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
        mode
    ).parquet(path)


def test_template_chunks_are_shared(spark):
    docs = spark.createDataFrame(
        [(1, _doc(1)), (2, _doc(2))], "doc_id long, text string"
    )
    u = chunk_units(docs)
    shared = (
        u.groupBy("chunk_hash")
        .agg(F.countDistinct("id").alias("nd"))
        .where(F.col("nd") >= 2)
        .count()
    )
    assert shared >= 1, "template must produce at least one shared CDC chunk"


def test_streaming_promotion_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    emitted: dict[tuple[int, int], tuple[int, int]] = {}

    def emit(df, batch_id):
        for r in df.collect():
            emitted[(batch_id, r["doc_id"])] = (r["n_units"], r["n_boiler"])

    _write(spark, src, [(1, _doc(1))], "overwrite")
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        boilerplate_stream(
            stream, "doc_id", "text", state, emit, min_docs=2, m_bits=1 << 16
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    # batch 1: doc 1 alone — nothing can be boilerplate yet
    (b1,) = [k for k in emitted if k[1] == 1]
    assert emitted[b1][1] == 0
    # batch 2: doc 2 shares the template — its shared chunks flag NOW
    # (prior=1 from stage_1 + in-batch 1 reaches min_docs=2)
    _write(spark, src, [(2, _doc(2))], "append")
    q.processAllAvailable()
    q.stop()
    (b2,) = [k for k in emitted if k[1] == 2]
    assert emitted[b2][1] >= 1, "cross-batch template must flag on 2nd doc"
    assert emitted[b2][1] < emitted[b2][0], "unique tail must not flag"


def test_in_batch_flagging_and_batch_agreement(spark, tmp_path):
    """All docs in ONE batch: in-batch distinct count alone reaches
    min_docs, and the reconciliation against exact batch truth shows
    zero missed and (at this m_bits) zero over-flagged chunks."""
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    rows = [(i, _doc(i)) for i in range(1, 6)]
    out = []

    def emit(df, batch_id):
        out.extend(df.collect())

    _write(spark, src, rows, "overwrite")
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        boilerplate_stream(
            stream, "doc_id", "text", state, emit, min_docs=2, m_bits=1 << 16
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert all(r["n_boiler"] >= 1 for r in out), "every doc carries the template"

    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    rep = reconcile_boilerplate_report(
        corpus, state, min_docs=2, m_bits=1 << 16
    ).collect()[0]
    assert rep["n_missed"] == 0, "true boilerplate must never be missed"
    assert rep["n_over"] == 0, "1<<16 bits over ~100 chunks: no FPs expected"
    assert rep["n_true"] >= 1
    assert rep["n_flagged"] == rep["n_true"]


def test_replay_idempotent_state(spark, tmp_path):
    """Re-running the same micro-batch (same batch_id — the foreachBatch
    crash-replay case) leaves the stage sets unchanged: the last-folded
    batch marker skips the folds, so a replayed batch cannot count its
    own prior promotion as a second document."""
    state = str(tmp_path / "state")
    seen = []
    fn = boilerplate_batch_fn(
        "doc_id", "text", state, lambda df, b: seen.append(df.collect()),
        min_docs=2, m_bits=1 << 16,
    )
    batch = spark.createDataFrame(
        [(1, _doc(1)), (2, _doc(2))], "doc_id long, text string"
    )
    fn(batch, 0)
    corpus = batch
    rep1 = reconcile_boilerplate_report(
        corpus, state, min_docs=2, m_bits=1 << 16
    ).collect()[0]
    fn(batch, 0)  # replay
    rep2 = reconcile_boilerplate_report(
        corpus, state, min_docs=2, m_bits=1 << 16
    ).collect()[0]
    assert rep1 == rep2
    assert rep2["n_missed"] == 0 and rep2["n_over"] == 0


def test_final_state_matches_batch_operator_on_fixture(spark, tmp_path):
    """Stream the fixture documents in two micro-batches; the confirmed-
    boilerplate stage must flag exactly the chunks the BATCH operator
    (q_boilerplate_chunks semantics: min_docs=2 over CDC units) counts as
    boilerplate — zero missed by guarantee, zero over at this m_bits."""
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    half_a = docs.where(F.col("doc_id") % 2 == 0)
    half_b = docs.where(F.col("doc_id") % 2 == 1)
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    half_a.coalesce(1).write.mode("overwrite").parquet(src)

    def emit(df, batch_id):
        df.count()

    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        boilerplate_stream(
            stream, "doc_id", "text", state, emit, min_docs=2, m_bits=1 << 22
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    half_b.coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    rep = reconcile_boilerplate_report(
        docs, state, min_docs=2, m_bits=1 << 22
    ).collect()[0]
    assert rep["n_missed"] == 0
    assert rep["n_over"] == 0
    # and the flagged count equals the batch operator's boilerplate count
    from fortune_500_financial_insights_pipeline_spark.operators.chunking import cdc_chunks

    units = cdc_chunks(docs, k=3, divisor=16).select("doc_id", "chunk_hash")
    n_true_batch = (
        units.groupBy("chunk_hash")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .count()
    )
    assert rep["n_true"] == n_true_batch == rep["n_flagged"]
    assert n_true_batch > 0


def test_streaming_curate_gopher_gate_matches_batch(spark, tmp_path):
    """The optional Gopher gate is a stateless inline filter: the chunk
    stream with gopher_gate=True equals the batch composition (same
    dedup, quality gate, rule flags, chunking) over the same documents."""
    from fortune_500_financial_insights_pipeline_spark.operators import text as TX
    from fortune_500_financial_insights_pipeline_spark.operators.chunking import (
        chunk_documents,
    )
    from fortune_500_financial_insights_pipeline_spark.streaming.curation import (
        streaming_curate,
    )
    from pyspark.sql import functions as F

    docs = [
        (1, _doc(1)),                          # passes everything
        (2, "# " * 40),                        # fails symbol ratio
        (3, "the a " + "word " * 20),          # depends on rules
        (4, _doc(1)),                          # exact dup of 1 (normalized)
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)

    got = []
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        streaming_curate(
            stream,
            min_quality=0.0,
            gopher_gate=True,
            gopher_stopwords=TX.EN_STOPWORDS,
        )
        .writeStream.foreachBatch(lambda df, b: got.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    batch_docs = spark.createDataFrame(docs, "doc_id long, text string")
    norm = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    dedup = batch_docs.withColumn("fp", F.md5(norm)).dropDuplicates(["fp"])
    flags = TX.gopher_flag_columns(F.col("text"), stopwords=TX.EN_STOPWORDS)
    cond = F.lit(True)
    for e in flags.values():
        cond = cond & e
    gated = dedup.where(cond).withColumn("text", TX.redact_pii("text"))
    want = chunk_documents(
        gated, id_col="doc_id", text_col="text", chunk_tokens=32, overlap=8,
        keep_cols=[c for c in gated.columns if c not in ("doc_id", "text")],
    ).collect()
    key = lambda r: (r["doc_id"], r["chunk_index"])
    assert sorted((key(r) for r in got)) == sorted(key(r) for r in want)
    assert any(r["doc_id"] == 1 for r in got)
    assert not any(r["doc_id"] == 2 for r in got)


@_pytest_r10.mark.slow  # round 10: heavy e2e — full-suite-only
def test_reconcile_substring_missed_is_zero(spark, tmp_path):
    """Stream the template corpus, then audit the cascade against the
    EXACT suffix-array substring truth: the chunk-level miss count must
    be zero (content-defined chunks + always-positive Bloom), and the
    flagged chunks must cover a nonzero fraction of the exact duplicated
    token positions (the template region)."""
    from fortune_500_financial_insights_pipeline_spark.streaming.boilerplate import (
        reconcile_substring_report,
    )

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    rows1 = [(1, _doc(1)), (2, _doc(2))]
    rows2 = [(3, _doc(3))]
    _write(spark, src, rows1, "overwrite")
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        boilerplate_stream(
            stream, "doc_id", "text", state, lambda df, b: df.collect(),
            min_docs=2, m_bits=1 << 16,
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    _write(spark, src, rows2, "append")
    q.processAllAvailable()
    q.stop()

    corpus = spark.createDataFrame(rows1 + rows2, "doc_id long, text string")
    r = reconcile_substring_report(
        corpus, state, min_docs=2, m_bits=1 << 16
    ).head()
    assert r["n_missed_chunks"] == 0  # the invariant
    assert r["n_dup_chunks"] >= 1
    assert r["n_dup_positions"] > 0  # template spans found by the SA
    assert r["n_covered_positions"] > 0
    assert 0 < r["span_coverage"] <= 1.0


def test_streaming_chunk_units_plan_has_no_window(spark):
    """Round-10 gate (r9 verdict item 9): the microbatch transformation the
    boilerplate twin runs per batch (chunk_units -> cdc_chunks) must keep
    the round-9 row-local rewrite — zero Window nodes, no corpus-text
    shuffle beyond the single (id, chunk_hash) aggregate exchange, and no
    Python evaluation."""
    df = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * 6) for i in range(8)],
        "doc_id long, text string",
    )
    units = chunk_units(df)
    plan = units._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    n_exchange = plan.count("Exchange")
    assert n_exchange <= 2, plan  # groupBy agg (+ optional AQE reuse line)
