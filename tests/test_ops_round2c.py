"""Round-2c operator properties: phrase search, RRF fusion, winnowing,
content-defined chunking — the guarantees the papers state, checked on
constructed inputs (oracle parity at sf0.001 lives in test_oracle_parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.operators.chunking import cdc_chunks
from fortune_500_financial_insights_pipeline_spark.operators.retrieval import (
    phrase_search,
    rrf_fuse,
)
from fortune_500_financial_insights_pipeline_spark.operators.winnow import winnow_fingerprints


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_phrase_search_counts_overlapping_and_repeated_terms(spark):
    docs = _docs(
        spark,
        [
            (1, "a b a b a"),   # "a b a" occurs at 0 AND 2 (overlap)
            (2, "a a a"),       # "a a" at 0 and 1
            (3, "b b b a"),
        ],
    )
    phrases = spark.createDataFrame(
        [(10, "a b a"), (11, "a a")], "phrase_id int, phrase string"
    )
    got = {
        (r.phrase_id, r.doc_id): (r.n_hits, r.first_pos)
        for r in phrase_search(docs, phrases).collect()
    }
    assert got[(10, 1)] == (2, 0)
    assert got[(11, 2)] == (2, 0)
    assert (10, 2) not in got and (11, 1) not in got
    assert (10, 3) not in got  # "b b b a" has no "a b a"


def test_rrf_prefers_docs_ranked_by_both_legs(spark):
    lex = spark.createDataFrame(
        [(1, 100, 1), (1, 101, 2), (1, 102, 3)], "query_id long, doc_id long, rank int"
    )
    dense = spark.createDataFrame(
        [(1, 101, 1), (1, 103, 2)], "query_id long, doc_id long, rank int"
    )
    out = rrf_fuse([lex, dense], topn=10).collect()
    by_doc = {r.doc_id: r for r in out}
    # 101 appears in both legs -> highest fused score
    assert min(out, key=lambda r: r.rank).doc_id == 101
    assert by_doc[101].rank_0 == 2 and by_doc[101].rank_1 == 1
    assert by_doc[100].rank_1 is None  # leg-missing rank surfaces as null
    expected = round(1.0 / 62 + 1.0 / 61, 9)
    assert abs(by_doc[101].rrf - expected) < 1e-12


def test_winnowing_guarantee_shared_run_shares_a_fingerprint(spark):
    # Any shared word run of length >= w + k - 1 = 7 must yield at least
    # one common selected fingerprint (the paper's core guarantee).
    shared = "q w e r t y u"  # 7 words
    docs = _docs(
        spark,
        [
            (1, "x1 x2 x3 " + shared + " z1 z2"),
            (2, "y1 " + shared + " p1 p2 p3 p4"),
        ],
    )
    fp = winnow_fingerprints(docs, k=4, w=4)
    f1 = {r.fp for r in fp.where(F.col("doc_id") == 1).collect()}
    f2 = {r.fp for r in fp.where(F.col("doc_id") == 2).collect()}
    assert f1 & f2, "winnowing guarantee violated: no shared fingerprint"


def test_winnowing_selects_nothing_below_one_window(spark):
    docs = _docs(spark, [(1, "a b c d e f")])  # 3 grams < w=4 -> no window
    assert winnow_fingerprints(docs, k=4, w=4).count() == 0


def test_winnowing_density_is_subset_of_grams(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents").limit(50)
    fp = winnow_fingerprints(d, k=4, w=4)
    per_doc = {r.doc_id: r.n for r in fp.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    toks = {r.doc_id: r.n for r in d.select("doc_id", F.size(F.split("text", " ")).alias("n")).collect()}
    for doc, n_sel in per_doc.items():
        n_grams = toks[doc] - 3
        assert 1 <= n_sel <= n_grams


def test_cdc_chunks_are_edit_stable_past_the_edit(spark):
    # Same suffix Y behind different prefixes: every chunk of Y except the
    # one straddling the splice must carry an identical hash — the CDC
    # selling point fixed-size chunking cannot offer.
    y = " ".join(f"s{i}" for i in range(200))
    docs = _docs(spark, [(1, "a1 a2 a3 " + y), (2, "b1 b2 b3 b4 b5 b6 b7 " + y)])
    out = cdc_chunks(docs, k=3, divisor=16)
    h1 = {r.chunk_hash for r in out.where(F.col("doc_id") == 1).collect()}
    h2 = {r.chunk_hash for r in out.where(F.col("doc_id") == 2).collect()}
    shared = h1 & h2
    # boundaries inside y depend only on y's own 3-token windows (plus the
    # first two positions after the splice), so nearly all of y's chunks
    # must coincide; require a strong majority to stay robust to where
    # boundaries happen to fall
    assert len(shared) >= max(len(h1), len(h2)) - 3 and len(shared) >= 5


def test_cdc_chunks_reassemble_every_token_exactly_once(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents").limit(50)
    out = cdc_chunks(d, k=3, divisor=16)
    per_doc = out.groupBy("doc_id").agg(
        F.sum("n_tokens").alias("total"), F.count("*").alias("n_chunks")
    )
    toks = d.select("doc_id", F.size(F.split("text", " ")).alias("n"))
    joined = per_doc.join(toks, "doc_id").where(F.col("total") != F.col("n"))
    assert joined.count() == 0


def test_bigram_lm_rewards_common_word_order(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.text import bigram_logprob

    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)]
    rows.append((100, "dog the over fox lazy jumps quick brown the"))  # same words, broken order
    scores = {
        r.doc_id: r.avg_log2_bigram
        for r in bigram_logprob(_docs(spark, rows), lam=0.7).collect()
    }
    assert all(v < 0 for v in scores.values())  # probabilities are < 1
    assert scores[0] > scores[100], "frequent word order must outscore scrambled"


def test_cluster_sample_quota_and_coverage(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    out = QUERIES["q_cluster_sample"](spark, sf_dir).toPandas()
    per_cell = out.groupby("cell")["vec_id"].count()
    assert (per_cell <= 10).all()
    assert out["rk"].min() == 1
    # every cell that received any vector contributes — balanced, not
    # proportional: no cell may dominate the sample
    assert per_cell.max() <= 10 and len(per_cell) >= 2


def test_dsir_ranks_target_like_candidates_first(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.dsir import dsir_logweights

    target = _docs(spark, [(i, "alpha beta gamma delta epsilon zeta") for i in range(20)])
    cands = _docs(
        spark,
        [(100, "alpha beta gamma delta epsilon")]  # target-like
        + [(200 + i, f"rock{i} paper{i} scissors{i} lizard{i} spock{i}") for i in range(10)],
    )
    out = dsir_logweights(cands, target, n_buckets=64, alpha=0.5).collect()
    best = max(out, key=lambda r: r.logw)
    assert best.doc_id == 100, "target-like candidate must carry the top importance weight"
    others = [r.logw for r in out if r.doc_id != 100]
    assert all(best.logw > o for o in others)
