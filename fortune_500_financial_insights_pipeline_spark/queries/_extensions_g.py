"""Round-6 extension queries: the exact substring-dedup primitive
(distributed suffix array + LCP spans) under oracle hash rows."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.catalog import load_table
from fortune_500_financial_insights_pipeline_spark.queries._core import q


@q("q_suffix_array")
def q_suffix_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed generalized suffix array certified cross-engine: the
    prefix-doubling loop (operators/suffix.suffix_array_tokens —
    O(log maxlen) rounds, each a (doc,pos) self-join + range-partitioned
    global dense rank with mapInPandas local ranks and offset folds; no
    single-partition window anywhere) must reproduce EXACTLY the rank
    that brute-force lexicographic suffix sorting assigns. The oracle IS
    that brute force: DuckDB materializes every suffix of documents
    doc_id < 40 as a string (valid because joining tokens with ' ' is
    order-isomorphic to token-sequence comparison when the separator
    sorts below all token characters) and ROW_NUMBERs them with the same
    (suffix, doc, pos) tie-break. A hash match proves ~2,100 global
    ranks byte-for-byte — the Lee et al. 2022 exact-substring-dedup
    primitive, scale path included (suffix strings are never
    materialized on the Spark side)."""
    from fortune_500_financial_insights_pipeline_spark.operators.suffix import (
        suffix_array_tokens,
    )

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 40)
    return suffix_array_tokens(d).select("doc_id", "pos", "sa_rank")


@q("q_suffix_lcp_spans")
def q_suffix_lcp_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT duplicated token spans from the suffix array: adjacent-in-SA
    suffix pairs with their longest common prefix (length >= 3 tokens)
    and the span text itself (operators/suffix.suffix_lcp_spans — the
    LCP is a first-mismatch fold over zipped token arrays, JVM-side).
    This is substring-level dedup made exact where the CDC-chunk family
    (q_boilerplate_*) is approximate: every maximal repeated span
    appears as an adjacent SA pair, so the table is the complete
    repeated-span inventory of the corpus slice. The oracle replays the
    brute-force sort plus a SQL first-mismatch scan over the same
    zipped token lists."""
    from fortune_500_financial_insights_pipeline_spark.operators.suffix import (
        suffix_lcp_spans,
    )

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 40)
    return suffix_lcp_spans(d, min_lcp=3).select(
        "doc_a", "pos_a", "doc_b", "pos_b", "lcp", "span"
    )
