"""Round-4 extension queries. New module appended AFTER the round-3
modules so the registration order of every existing key — which the
driver's CORRECTNESS rotation depends on — is untouched."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.queries._core import (
    QUERIES,
    doc_jaccard_pairs,
    q,
)


@q("q_neardup_reconcile")
def q_neardup_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline reconciliation of a near-dup dedup decision
    (streaming/minhash_dedup.reconcile_neardup_report): given the corpus
    and an emitted (surviving) set — here q_jaccard_clusters' bigram-0.8
    cluster-dedup survivors — count how many dropped docs were JUSTIFIED
    (a verified exact 3-gram-Jaccard >= 0.5 near-dup exists among the
    emitted docs) vs FALSE drops (the emitted corpus lost that content:
    chain over-suppression or collision-only decisions). The truth leg is
    the exact prefix-filtered set-similarity join via the per-process
    pair memo — banding-free, so the DuckDB oracle replays every step.
    One row: corpus/emitted/dropped/true/false counts + false-drop
    rate."""
    from fortune_500_financial_insights_pipeline_spark.streaming.minhash_dedup import (
        reconcile_neardup_report,
    )

    from fortune_500_financial_insights_pipeline_spark.catalog import load_table

    corpus = load_table(spark, sf_dir, "documents")
    emitted = QUERIES["q_jaccard_clusters"](spark, sf_dir)
    truth = (
        doc_jaccard_pairs(spark, sf_dir, ngram=3, floor=0.3)
        .where(F.col("n_i") / F.col("n_u") >= 0.5)
        .select("id_a", "id_b")
    )
    rep = reconcile_neardup_report(
        corpus, emitted, "doc_id", "text", pairs=truth
    )
    return rep.select(
        "n_corpus",
        "n_emitted",
        "n_dropped",
        "n_true_drops",
        "n_false_drops",
        "false_drop_rate",
    )


@q("q_sparse_cosine_pairs")
def q_sparse_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF cosine near-dup pairs over documents
    (operators/tfidf.sparse_cosine_pairs, min_sim=0.3): the
    LEXICAL-vector member of the dedup family — exact n-gram Jaccard
    catches verbatim overlap, dense embedding cosine catches semantics,
    TF-IDF cosine catches shared vocabulary emphasis. Vocabulary-keyed
    candidate join with zero-weight and max-df skew guards; 1e4
    fixed-point norms/dots so the oracle replays every integer."""
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table
    from fortune_500_financial_insights_pipeline_spark.operators.tfidf import (
        sparse_cosine_pairs,
    )

    d = load_table(spark, sf_dir, "documents")
    return sparse_cosine_pairs(d, min_sim=0.3).orderBy("id_a", "id_b")
