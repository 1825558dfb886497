"""Round-5 skew-guard evidence (verdict item 5): the boilerplate-flood
shapes that make candidate generation quadratic, and the guards that keep
it bounded — measured at runtime via SQLMetrics, not plan strings.

Fixture shape: one flood term shared by 60% of documents. Unguarded, that
single term fans the vocabulary-keyed candidate join out to C(0.6N, 2)
pairs (quadratic in corpus size); the max-df cut drops it before the join.
The matching wall-clock rows live in SCALE.md §round-5."""

from __future__ import annotations

from pyspark.sql import functions as F


def _flood_docs(spark, n=600, flood_frac=0.6):
    """n docs, each with two unique terms; the first flood_frac*n share
    one boilerplate term. No cross-doc pair shares a non-flood term."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.concat(F.lit("uniqa"), F.col("id")),
            F.concat(F.lit("uniqb"), F.col("id")),
            F.when(F.col("id") < int(n * flood_frac), F.lit("boilerplate")).otherwise(
                F.concat(F.lit("uniqc"), F.col("id"))
            ),
        ).alias("text"),
    )


def _max_exchange_rows(df) -> int:
    """Largest shuffleRecordsWritten across every Exchange in the executed
    plan (AQE stages included) — the runtime cost that scales with data."""
    df.collect()
    peak = 0

    def walk(node):
        nonlocal peak
        name = node.nodeName()
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            if name == "Exchange" and kv._1() == "shuffleRecordsWritten":
                peak = max(peak, kv._2().value())
        cit = node.children().iterator()
        while cit.hasNext():
            walk(cit.next())
        if name == "AdaptiveSparkPlan":
            walk(node.executedPlan())
        if "QueryStage" in name:
            walk(node.plan())

    walk(df._jdf.queryExecution().executedPlan())
    return peak


def test_sparse_cosine_flood_term_is_cut_before_the_join(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.tfidf import (
        sparse_cosine_pairs,
    )

    docs = _flood_docs(spark)
    # guarded (default max_df_ratio=0.5 < 0.6 flood): the flood term is
    # dropped before the term join, so no exchange may carry anything near
    # the C(360,2)=64,620 candidate rows the flood would generate — the
    # remaining shuffles are vocabulary/doc-sized (~3 terms per doc)
    out = sparse_cosine_pairs(docs, min_sim=0.3)
    assert _max_exchange_rows(out) < 10_000
    assert out.count() == 0  # unique terms share no vocabulary emphasis


def test_sparse_cosine_unguarded_flood_really_is_quadratic(spark):
    """The guard exists because the danger is real: with the cut disabled,
    the SAME corpus fans the candidate join out quadratically. (Kept as a
    measurement twin so the guarded bound above stays an honest claim —
    if tokenization or the join shape drifts, this pair drifts with it.)"""
    from fortune_500_financial_insights_pipeline_spark.operators.tfidf import (
        sparse_cosine_pairs,
    )

    docs = _flood_docs(spark)
    out = sparse_cosine_pairs(docs, min_sim=0.3, max_df_ratio=1.0)
    # the flood term's C(360,2) pairs all reach the dot-product groupBy
    assert _max_exchange_rows(out) > 50_000


def test_pair_memo_cap_falls_back_to_distributed(spark, monkeypatch):
    """Above _PAIR_MEMO_CAP the memo must NOT collect: the returned frame
    stays the distributed pair build (no LocalTableScan) and nothing is
    cached — a degenerate corpus can never turn the memo into driver
    memory growth."""
    from fortune_500_financial_insights_pipeline_spark.queries import _core

    monkeypatch.setattr(_core, "_PAIR_MEMO_CAP", 0)
    _core._TRAINED_MEMO.pop(
        ("doc_jacc_pairs", "/root/testdata/sf0.001", 3, 0.3), None
    )
    out = _core.doc_jaccard_pairs(spark, "/root/testdata/sf0.001", 3, 0.3)
    assert out.count() > 0  # the fixture corpus does have near-dup pairs
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" not in plan
    assert ("doc_jacc_pairs", "/root/testdata/sf0.001", 3, 0.3) not in _core._TRAINED_MEMO


def test_jaccard_pairs_prefix_unique_token_cut_is_lossless(spark):
    """Round-5 setjoin change: prefix rows whose token appears exactly once
    in the corpus are dropped before the self-join (they cannot match).
    Verify against the brute-force O(n²) definition on a randomized corpus
    engineered to stress the cut: heavy unique-token prefixes, shared
    rare tokens at varying positions, identical docs, and a doc whose
    every token is corpus-unique."""
    import itertools
    import random

    from fortune_500_financial_insights_pipeline_spark.operators.setjoin import (
        jaccard_pairs_exact,
    )

    rnd = random.Random(11)
    shared = [f"s{i}" for i in range(12)]
    docs = []
    for i in range(40):
        uniq = [f"u{i}_{j}" for j in range(rnd.randrange(1, 8))]
        take = rnd.sample(shared, rnd.randrange(0, 9))
        toks = sorted(set(uniq + take))
        rnd.shuffle(toks)
        docs.append((i, toks))
    docs.append((100, ["s0", "s1", "s2"]))
    docs.append((101, ["s0", "s1", "s2"]))  # identical pair
    docs.append((102, ["only", "unique", "tokens"]))  # joins to nothing
    df = spark.createDataFrame(docs, "doc_id long, grams array<string>")
    for t in (0.3, 0.6, 0.8):
        got = {
            (r.id_a, r.id_b)
            for r in jaccard_pairs_exact(df, "doc_id", "grams", t).collect()
        }
        want = set()
        for (ia, ga), (ib, gb) in itertools.combinations(docs, 2):
            a, b = set(ga), set(gb)
            if len(a & b) / len(a | b) >= t:
                want.add((min(ia, ib), max(ia, ib)))
        assert got == want, (t, got ^ want)
