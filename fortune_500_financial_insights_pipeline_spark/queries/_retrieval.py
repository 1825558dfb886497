"""Retrieval compositions: phrase search, rank fusion, reranking.

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
# Retrieval compositions: positional phrase search + hybrid rank fusion
# ---------------------------------------------------------------------------


@q("q_phrase_search")
def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-word phrase lookup over a positional inverted index
    (operators/retrieval.phrase_search): postings joined ON TERM to the
    broadcast (phrase, offset, term) list, candidate starts derived as
    ``pos - off``, kept when every offset matched. Counts occurrences and
    first position per (phrase, doc). One phrase repeats a term
    ("window window") to prove DISTINCT-offset matching; one carries a
    term absent from the corpus and must return no rows."""
    from fortune_500_financial_insights_pipeline_spark.operators.retrieval import phrase_search

    d = load_table(spark, sf_dir, "documents")
    phrases = spark.createDataFrame(
        [
            (1, "table part"),
            (2, "scan stream fast"),
            (3, "window window"),
            (4, "big table table"),
            (5, "spark zzznosuchterm"),
        ],
        "phrase_id int, phrase string",
    )
    return phrase_search(d, phrases)

@q("q_rrf_fusion")
def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid related-document retrieval: for three query documents, fuse a
    lexical BM25 top-20 (query = the document's own distinct terms) with a
    dense embedding k-NN top-20 via Reciprocal Rank Fusion
    (operators/retrieval.rrf_fuse, rrf_k=60), keeping the fused top-10.
    Leg ranks are the retrievers' own (self-match dropped from the lexical
    list after ranking, exactly as the oracle does); the fused score is a
    fixed-order IEEE expression so it hash-matches cross-engine."""
    from fortune_500_financial_insights_pipeline_spark.operators.retrieval import rrf_fuse
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import knn_join
    from fortune_500_financial_insights_pipeline_spark.operators.tfidf import bm25_search

    d = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    qids = [0, 7, 42]

    queries = d.where(F.col("doc_id").isin(qids)).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("qtext")
    )
    lex = bm25_search(d, queries, k=20).where(
        F.col("doc_id") != F.col("query_id")
    ).select("query_id", "doc_id", "rank")

    from pyspark.sql.window import Window

    dense_raw = knn_join(emb.where(F.col("vec_id").isin(qids)), emb, k=20)
    wd = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    dense = dense_raw.select(
        F.col("q_id").alias("query_id"),
        F.col("vec_id").alias("doc_id"),
        F.row_number().over(wd).alias("rank"),
    )
    return rrf_fuse([lex, dense], rrf_k=60, topn=10)

@q("q_winnow")
def q_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS winnowing fingerprint selection (operators/winnow): word
    4-gram md5-long hashes, window w=4, min-per-window with rightmost
    ties — the position-robust local dedup signature set. Frame-bounded
    window MIN + an equi-join argmin recovery; density ~2/(w+1) of the
    gram stream by construction."""
    from fortune_500_financial_insights_pipeline_spark.operators.winnow import winnow_fingerprints

    d = load_table(spark, sf_dir, "documents")
    return winnow_fingerprints(d, k=4, w=4)

@q("q_cdc_chunks")
def q_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (operators/chunking.cdc_chunks): boundary
    after any token whose 3-token window hash ≡ 0 mod 16, chunk ids via
    one gaps-islands cumulative window, per-chunk md5 over the ordered
    text — the edit-stable chunk-dedup layout (SOSP'01 LBFS rule)."""
    from fortune_500_financial_insights_pipeline_spark.operators.chunking import cdc_chunks

    d = load_table(spark, sf_dir, "documents")
    return cdc_chunks(d, k=3, divisor=16)

@q("q_bigram_lm")
def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram-LM quality score (operators/text.bigram_logprob,
    λ=0.7 Jelinek–Mercer): per-doc average log2(λ·p(w2|w1) + 0.3·p(w2))
    under the corpus's own counts — catches word-order breakage the
    unigram signal (q_unigram_logprob) cannot. Exact count ratios,
    fixed-point doc sums: oracle-exact."""
    from fortune_500_financial_insights_pipeline_spark.operators.text import bigram_logprob

    d = load_table(spark, sf_dir, "documents")
    return bigram_logprob(d, lam=0.7)

@q("q_cluster_sample")
def q_cluster_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced diversity sampling: md5-seeded 8-cell coarse
    quantizer (same portable routing as q_semdedup), then an md5-priority
    top-10 per cell — equal representation per embedding cluster, the
    diversity-preserving subset selection a curation pipeline runs before
    expensive scoring. WindowGroupLimit caps the per-cell shuffle."""
    from pyspark.sql.window import Window
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import (
        ivf_index_portable,
        md5_sample_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    centroids = md5_sample_centroids(emb, k=8)
    idx = ivf_index_portable(emb, centroids)
    w = Window.partitionBy("cell").orderBy(
        F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
    )
    return (
        idx.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 10)
        .select("vec_id", "label", F.col("cell").cast("long").alias("cell"), "rk")
    )

@q("q_dsir_select")
def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (operators/dsir): score every non-English
    document's hashed-bigram bag by its importance log-weight toward the
    English subcorpus (64 md5 buckets, add-0.5 smoothing), keep the
    top-50. The quota cut is a TakeOrdered limit; the 50-row rank window
    runs after the cut, so nothing corpus-sized funnels through one
    partition."""
    from pyspark.sql.window import Window
    from fortune_500_financial_insights_pipeline_spark.operators.dsir import dsir_logweights

    d = load_table(spark, sf_dir, "documents")
    scored = dsir_logweights(
        d.where(F.col("lang") != "en"), d.where(F.col("lang") == "en"),
        n_buckets=64, alpha=0.5,
    )
    top = scored.orderBy(F.desc("logw"), F.asc("doc_id")).limit(50)
    w = Window.orderBy(F.desc("logw"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w))

@q("q_strip_dup_spans")
def q_strip_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-dedup REMOVAL (Lee et al. 2022): drop every disjoint
    20-word chunk whose content occurs in >=2 distinct documents, and
    reassemble the surviving text per doc (operators/dedup.
    strip_duplicate_chunks). q_dup_spans is the detector; this is the edit
    that produces the cleaned corpus. Oracle replays the chunking, hash
    counting, and ordered string_agg reassembly verbatim."""
    from fortune_500_financial_insights_pipeline_spark.operators.dedup import strip_duplicate_chunks

    d = load_table(spark, sf_dir, "documents")
    return strip_duplicate_chunks(d, id_col="doc_id", text_col="text",
                                  chunk_words=20, min_docs=2)

@q("q_split_assign")
def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split assignment (operators/sampling.
    split_assign): md5(doc_id) lands each doc in a fixed hash-space band —
    80/10/10 — so the assignment is engine-portable and stable across
    corpus refreshes. Output is the per-(lang, split) doc count, the
    release-audit view of the split."""
    from fortune_500_financial_insights_pipeline_spark.operators.sampling import split_assign

    d = load_table(spark, sf_dir, "documents")
    assigned = split_assign(d, ["doc_id"], {"train": 0.8, "val": 0.1, "test": 0.1})
    return assigned.groupBy("lang", "split").agg(F.count(F.lit(1)).alias("n_docs"))

@q("q_pairwise_corr")
def q_pairwise_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-series correlation matrix: Pearson correlation between every
    pair of supplier daily-price series, date-aligned by an equi-join on
    the day (the cross-ticker analytics view a finance warehouse derives —
    the reference's Tableau layer shows per-ticker series; this is the
    pairwise extension). The series interior is exact fixed-point (davg),
    so both engines correlate identical inputs; the join key is the day,
    suppliers restricted to a 10-ticker watchlist so the pair fan-out is
    bounded (45 pairs x trading days)."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_suppkey") <= 10)
    series = li.groupBy(
        "l_suppkey", F.date_format("l_shipdate", "yyyy-MM-dd").alias("day")
    ).agg(davg("l_extendedprice").alias("close"))
    a = series.select(
        F.col("l_suppkey").alias("supp_a"), "day", F.col("close").alias("ca")
    )
    b = series.select(
        F.col("l_suppkey").alias("supp_b"), "day", F.col("close").alias("cb")
    )
    return (
        a.join(b, "day")
        .where(F.col("supp_a") < F.col("supp_b"))
        .groupBy("supp_a", "supp_b")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(F.corr("ca", "cb"), 6).alias("corr_close"),
        )
    )
