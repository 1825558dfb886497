"""Text analysis (SURVEY §2.11).

Split from the single-file registry in round 3 — same functions, same
registration order, registered into the shared QUERIES dict on import."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.catalog import load_table
from fortune_500_financial_insights_pipeline_spark.functions.deterministic import davg, dsum, dsum_w

from fortune_500_financial_insights_pipeline_spark.queries._core import (  # noqa: F401
    q,
)


# ---------------------------------------------------------------------------
# Text analysis (SURVEY §2.11)
# ---------------------------------------------------------------------------


@q("q_text_stats")
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fortune_500_financial_insights_pipeline_spark.operators import text as TX

    d = load_table(spark, sf_dir, "documents")
    return (
        d.withColumn("n_tokens", TX.token_count("text"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("n_tokens").alias("total_tokens"),
            (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
        )
    )

@q("q_token_count")
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fortune_500_financial_insights_pipeline_spark.operators import text as TX

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TX.token_count("text").alias("n_tokens"),
        TX.distinct_token_count("text").alias("n_distinct_tokens"),
        TX.bpe_token_count("text").alias("n_bpe_tokens"),
    )

@q("q_lang_id")
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fortune_500_financial_insights_pipeline_spark.operators import text as TX

    d = load_table(spark, sf_dir, "documents")
    score = TX.english_score("text")
    return d.select(
        "doc_id",
        "lang",
        F.round(score, 6).alias("en_ratio"),
        F.when(score >= 0.05, "en").otherwise("other").alias("pred_lang"),
    )

@q("q_quality_score")
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fortune_500_financial_insights_pipeline_spark.operators import text as TX

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", F.round(TX.quality_score("text"), 6).alias("quality"))

@q("q_fingerprint")
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fortune_500_financial_insights_pipeline_spark.operators import text as TX

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", TX.fingerprint("text").alias("fingerprint"))

@q("q_tfidf")
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (smoothed idf, rounded 6dp)."""
    from fortune_500_financial_insights_pipeline_spark.operators.tfidf import tfidf

    d = load_table(spark, sf_dir, "documents")
    # round 9: the tf frame is the materialized artifact of the
    # tfidf_from_tf story — checkpoint it in-session (guide §5)
    return tfidf(d, top_k=3, checkpoint_tf=True)

@q("q_mix_sources")
def q_mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted data mixture: split a 40%-of-corpus token budget across
    sources with weights 1/2/3 cycling over the sorted source names, keep
    each source's deterministic (md5-ordered) prefix that fits its budget
    (operators/sampling.py mix_sources). Per-source readout. The weight
    table is dim-sized driver traffic (one row per source — sources are
    datasets, not rows), same budget class as centroid lists."""
    from fortune_500_financial_insights_pipeline_spark.operators.sampling import mix_sources

    d = load_table(spark, sf_dir, "documents")
    # driver-side weight table is SOURCE-cardinality-sized (datasets, not
    # rows) — cap it so a mis-keyed column fails loudly instead of pulling
    # an unbounded distinct to the driver
    rows = d.select("source").distinct().limit(10001).collect()
    if len(rows) > 10000:
        raise ValueError("source cardinality exceeds the 10k driver-side weight-table cap")
    sources = sorted(r[0] for r in rows)
    weights = {s: 1 + (i % 3) for i, s in enumerate(sources)}
    kept = mix_sources(d, weights, budget_fraction=0.4)
    return kept.groupBy("source").agg(
        F.count("*").alias("kept_docs"),
        F.sum("n_tokens").alias("kept_tokens"),
        F.max("budget").alias("budget"),
    )

@q("q_classifier_score")
def q_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-feature linear classifier forward pass over documents
    (operators/text.py classifier_score): 256 md5 buckets, fixed-point
    weights (b%21)*50-500 milli-units, prob = round(sigmoid(mean weight),
    6). Model inference as relational algebra — hash-checked end to end."""
    from fortune_500_financial_insights_pipeline_spark.operators.text import classifier_score

    d = load_table(spark, sf_dir, "documents")
    weights = spark.range(256).select(
        F.col("id").cast("int").alias("bucket"),
        ((F.col("id") % 21) * 50 - 500).cast("long").alias("w_fp"),
    )
    return classifier_score(d, weights)

@q("q_upsample_sources")
def q_upsample_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch upsampling readout: factors 1.0/1.5/2.5 cycling over sorted
    source names — full copies for floor(factor), one extra epoch for the
    md5-prefix fraction (operators/sampling.py upsample_sources). Emitted
    rows, distinct docs, and max epoch per source, hash-checked."""
    from fortune_500_financial_insights_pipeline_spark.operators.sampling import (
        upsample_sources,
    )

    d = load_table(spark, sf_dir, "documents")
    # driver-side weight table is SOURCE-cardinality-sized (datasets, not
    # rows) — cap it so a mis-keyed column fails loudly instead of pulling
    # an unbounded distinct to the driver
    rows = d.select("source").distinct().limit(10001).collect()
    if len(rows) > 10000:
        raise ValueError("source cardinality exceeds the 10k driver-side weight-table cap")
    sources = sorted(r[0] for r in rows)
    factors = {s: [1.0, 1.5, 2.5][i % 3] for i, s in enumerate(sources)}
    up = upsample_sources(d, factors)
    return up.groupBy("source").agg(
        F.count("*").alias("emitted_rows"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.max("epoch").alias("max_epoch"),
    )

@q("q_bm25")
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 Okapi BM25 terms per document (k1=1.2, b=0.75, round 6dp) —
    the length-saturating retrieval weight next to q_tfidf's raw TF-IDF
    (operators/tfidf.py bm25)."""
    from fortune_500_financial_insights_pipeline_spark.operators.tfidf import bm25

    d = load_table(spark, sf_dir, "documents")
    # round 9: postings are index-time state (the bm25_from_tf story) —
    # checkpoint in-session; also fixes the stats/scored double explode
    return bm25(d, top_k=3, checkpoint_tf=True)

@q("q_chunk_docs")
def q_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 32-token windows, step 24 — 1→N row expansion."""
    from fortune_500_financial_insights_pipeline_spark.operators.chunking import chunk_documents

    d = load_table(spark, sf_dir, "documents")
    return chunk_documents(d, chunk_tokens=32, overlap=8)

@q("q_dedup_exact")
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: min doc_id survives per normalized-text hash."""
    from fortune_500_financial_insights_pipeline_spark.operators.dedup import fingerprint_dedup

    d = load_table(spark, sf_dir, "documents")
    return fingerprint_dedup(d, text_col="text", id_col="doc_id").select(
        "doc_id", "fingerprint"
    )

@q("q_dup_spans")
def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact dedup: 8-word windows occurring in ≥2 distinct
    documents, per (doc, start position) — the boilerplate-inside-unique-
    documents detector doc-level fingerprint dedup misses. All post-
    explode work rides the md5 span key (operators/text.duplicated_spans);
    oracle mirrors the window construction verbatim."""
    from fortune_500_financial_insights_pipeline_spark.operators.text import duplicated_spans

    d = load_table(spark, sf_dir, "documents")
    return duplicated_spans(d, n=8)

@q("q_ngram_jaccard")
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-bigram Jaccard similarity of every doc against doc_id=0, top 20."""
    from fortune_500_financial_insights_pipeline_spark.operators import text as TX

    d = load_table(spark, sf_dir, "documents")
    grams = d.select("doc_id", TX.word_ngrams("text", 2).alias("grams"))
    ref = grams.filter(F.col("doc_id") == 0).select(F.col("grams").alias("ref_grams"))
    return (
        grams.crossJoin(F.broadcast(ref))
        .filter(F.col("doc_id") != 0)
        .select("doc_id", F.round(TX.jaccard(F.col("grams"), F.col("ref_grams")), 6).alias("jac"))
        .orderBy(F.desc("jac"), F.asc("doc_id"))
        .limit(20)
    )

@q("q_minhash_neardup")
def q_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidate pairs (rows-only; Spark-specific
    hashing). See operators/minhash.py for the banding construction."""
    from fortune_500_financial_insights_pipeline_spark.operators.minhash import minhash_neardup_pairs

    d = load_table(spark, sf_dir, "documents")
    return minhash_neardup_pairs(
        d, id_col="doc_id", text_col="text", n_hashes=16, bands=4, min_jaccard=0.2
    )

@q("q_dedup_clusters")
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-level near-dup dedup: minhash candidate pairs → connected
    components (iterative min-label propagation) → one canonical doc per
    duplicate cluster (rows-only: iterative algorithm, no SQL oracle;
    closure semantics pinned by test_cluster_dedup_transitive)."""
    from fortune_500_financial_insights_pipeline_spark.operators.graph import cluster_dedup
    from fortune_500_financial_insights_pipeline_spark.operators.minhash import minhash_neardup_pairs

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_neardup_pairs(
        d, id_col="doc_id", text_col="text", n_hashes=16, bands=4, min_jaccard=0.2
    )
    return cluster_dedup(d, pairs, "doc_id").select("doc_id", "lang", "n_chars")

@q("q_jaccard_clusters")
def q_jaccard_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-level dedup with a FULL oracle: exact bigram-Jaccard pairs
    (deterministic set math, unlike minhash's engine-specific hashing) →
    connected components → min-id survivor per cluster. The DuckDB oracle
    reproduces the closure with a recursive CTE, so the iterative
    min-label loop is value-checked end-to-end, transitivity included.
    Pair generation is the prefix-filtered set-similarity join
    (operators/setjoin.py — AllPairs/PPJoin candidates from an equi-join
    on rare prefix tokens, identical output to the O(n²) scan); minhash
    LSH banding (q_minhash_neardup) remains the probabilistic path when
    even exact candidates are too many. Pairs come from the per-process
    memo (_core.doc_jaccard_pairs, shared with q_triangles)."""
    from fortune_500_financial_insights_pipeline_spark.operators.graph import cluster_dedup
    from fortune_500_financial_insights_pipeline_spark.queries._core import (
        doc_jaccard_pairs,
    )

    d = load_table(spark, sf_dir, "documents")
    pairs = doc_jaccard_pairs(spark, sf_dir, ngram=2, floor=0.8).select(
        "id_a", "id_b"
    )
    return cluster_dedup(d, pairs, "doc_id").select("doc_id")

@q("q_simhash")
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash fingerprints (rows-only; xxhash64 is Spark-specific)."""
    from fortune_500_financial_insights_pipeline_spark.operators.minhash import simhash

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", simhash("text").alias("simhash64"))
