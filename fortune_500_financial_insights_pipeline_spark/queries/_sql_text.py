"""SQL text surface: the same SQL runs verbatim on Spark and DuckDB.

Split from the single-file registry in round 3 — same functions, same
registration order, registered into the shared QUERIES dict on import."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.catalog import load_table
from fortune_500_financial_insights_pipeline_spark.functions.deterministic import davg, dsum, dsum_w

from fortune_500_financial_insights_pipeline_spark.queries._core import (  # noqa: F401
    QUERIES,
    q,
)


# ---------------------------------------------------------------------------
# SQL text surface (sql_surface.py): the same SQL string runs verbatim on
# Spark (here) and DuckDB (oracle side) — spark.sql over registered views.
# ---------------------------------------------------------------------------


def _register_sql_surface() -> None:
    from fortune_500_financial_insights_pipeline_spark.catalog import register_views
    from fortune_500_financial_insights_pipeline_spark.sql_surface import SHARED_SQL

    for name, sql in SHARED_SQL.items():

        def run_sql(spark: SparkSession, sf_dir: str, _sql: str = sql) -> DataFrame:
            register_views(spark, sf_dir)
            return spark.sql(_sql)

        QUERIES[name] = run_sql

_register_sql_surface()

@q("q_decontaminate")
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing ≥3 distinct
    word-bigrams with a benchmark set (here: doc_id < 5 stands in for the
    eval set). Explode distinct grams on both sides; the join key is the
    gram, so contaminated docs surface without any pairwise compare —
    at scale the benchmark gram set is small and broadcasts."""
    from fortune_500_financial_insights_pipeline_spark.operators import text as TX

    d = load_table(spark, sf_dir, "documents")
    grams = d.select(
        "doc_id", F.explode(TX.word_ngrams("text", 2)).alias("gram")
    )
    bench = (
        grams.where(F.col("doc_id") < 5)
        .select(F.col("gram").alias("bgram"))
        .distinct()
    )
    return (
        grams.where(F.col("doc_id") >= 5)
        .join(F.broadcast(bench), F.col("gram") == F.col("bgram"))
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("shared_grams"))
        .where(F.col("shared_grams") >= 3)
    )

@q("q_finance_insights")
def q_finance_insights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's dashboard metrics (daily return, SMA, VWAP,
    cumulative return, drawdown — README.md:9-10's Tableau overlay) on a
    supplier-day price series derived from lineitem, exact fixed-point
    frame sums throughout (functions/finance.with_insights_exact)."""
    from fortune_500_financial_insights_pipeline_spark.functions.deterministic import davg, dsum
    from fortune_500_financial_insights_pipeline_spark.functions.finance import with_insights_exact

    li = load_table(spark, sf_dir, "lineitem")
    series = (
        li.groupBy(
            "l_suppkey",
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("day"),
        )
        .agg(
            davg("l_extendedprice").alias("close"),
            dsum("l_quantity").alias("volume"),
        )
    )
    return with_insights_exact(
        series,
        ticker_col="l_suppkey",
        date_col="day",
        close_col="close",
        volume_col="volume",
        ma_days=5,
    )

@q("q_scd2")
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history from event snapshots: per-user episodes of
    event_type with [valid_from, valid_to) bounds (dates as ISO strings
    for dtype-stable hashing)."""
    from fortune_500_financial_insights_pipeline_spark.operators.scd import scd2

    e = load_table(spark, sf_dir, "events")
    hist = scd2(e, ["user_id"], "ts", ["event_type"])
    fmt = "yyyy-MM-dd HH:mm:ss"
    return hist.select(
        "user_id",
        "event_type",
        F.date_format("valid_from", fmt).alias("valid_from"),
        F.date_format("valid_to", fmt).alias("valid_to"),
    )

@q("q_sql_pivot")
def q_sql_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIVOT clause (Spark dialect; the oracle is the equivalent
    conditional aggregation — PIVOT syntax differs across engines, the
    semantics don't). DataFrame twin: q_pivot."""
    from fortune_500_financial_insights_pipeline_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT * FROM (SELECT l_returnflag, l_linestatus, l_quantity FROM lineitem)
        PIVOT (CAST(SUM(CAST(ROUND(l_quantity * 1000000) AS BIGINT)) AS DOUBLE)
               / 1000000
               FOR l_linestatus IN ('F' AS qty_f, 'O' AS qty_o))
        """
    )

@q("q_udtf_chunk")
def q_udtf_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF via LATERAL join — same semantics (and same oracle) as
    the JVM-side q_chunk_docs, proving the table-function escape hatch."""
    from fortune_500_financial_insights_pipeline_spark.catalog import register_views
    from fortune_500_financial_insights_pipeline_spark.functions.udtfs import register_udtfs

    register_views(spark, sf_dir)
    register_udtfs(spark)
    return spark.sql(
        "SELECT doc_id, s.* FROM documents, LATERAL chunk_tokens(text, 32, 8) s"
    )

@q("q_hash_sample")
def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-keyed 10% sample (rows-only: xxhash64 is
    Spark-specific; partition-invariance is pinned by
    test_hash_sample_is_partition_invariant)."""
    from fortune_500_financial_insights_pipeline_spark.operators.sampling import hash_sample

    d = load_table(spark, sf_dir, "documents")
    return hash_sample(d, 0.1, ["doc_id"]).select("doc_id", "lang", "n_chars")

@q("q_binary_meta")
def q_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary column handling: synthesize a blob from text, compute
    byte length + sha256 — the schema/partitioning pattern for image/audio
    payloads (decode stubs live in operators/multimodal.py)."""
    d = load_table(spark, sf_dir, "documents")
    blob = F.encode("text", "UTF-8")
    return d.select(
        "doc_id",
        F.octet_length(blob).alias("n_bytes"),
        F.lower(F.sha2(blob, 256)).alias("sha"),
    )

@q("q_pack_offsets")
def q_pack_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-offset sequence packing: documents laid end-to-end per
    id%8 bucket, bin boundary every 256 tokens (window cumsum, one
    shuffle on the bucket key)."""
    from fortune_500_financial_insights_pipeline_spark.operators import text as TX
    from fortune_500_financial_insights_pipeline_spark.operators.packing import pack_offsets

    d = load_table(spark, sf_dir, "documents")
    counted = d.select("doc_id", TX.token_count("text").alias("n_tokens"))
    return pack_offsets(counted, budget=256, n_buckets=8)

@q("q_pack_greedy")
def q_pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy first-fit sequence packing (no straddling): per-bucket
    Arrow-batched applyInPandas; oracle is a recursive CTE replaying the
    same non-associative reset recurrence."""
    from fortune_500_financial_insights_pipeline_spark.operators import text as TX
    from fortune_500_financial_insights_pipeline_spark.operators.packing import pack_greedy

    d = load_table(spark, sf_dir, "documents")
    counted = d.select("doc_id", TX.token_count("text").alias("n_tokens"))
    return pack_greedy(counted, budget=256, n_buckets=8)

@q("q_quality_gate")
def q_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive quality gate: keep documents at or above the corpus p25
    quality score. The exact-percentile threshold is a 1-row aggregate
    broadcast into the filter — no second pass over the text."""
    from fortune_500_financial_insights_pipeline_spark.operators import text as TX

    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "lang", F.round(TX.quality_score("text"), 6).alias("quality")
    )
    thr = scored.agg(F.percentile("quality", F.lit(0.25)).alias("__thr"))
    return (
        scored.join(F.broadcast(thr))
        .filter(F.col("quality") >= F.col("__thr"))
        .select("doc_id", "lang", "quality")
    )

@q("q_tech_indicators")
def q_tech_indicators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cutler's RSI-5 and 5-day Bollinger bands on the supplier-day price
    series, exact fixed-point frame sums (functions/finance.
    with_indicators_exact) — value-hash-matched against an op-for-op
    DuckDB replay."""
    from fortune_500_financial_insights_pipeline_spark.functions.deterministic import davg
    from fortune_500_financial_insights_pipeline_spark.functions.finance import with_indicators_exact

    li = load_table(spark, sf_dir, "lineitem")
    series = li.groupBy(
        "l_suppkey", F.date_format("l_shipdate", "yyyy-MM-dd").alias("day")
    ).agg(davg("l_extendedprice").alias("close"))
    return with_indicators_exact(
        series,
        ticker_col="l_suppkey",
        date_col="day",
        close_col="close",
        rsi_days=5,
        bb_days=5,
    )

@q("q_hll_distinct")
def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (rows-only: DataSketches HLL
    binary images and estimates are engine-specific, so no DuckDB value
    twin; test_hll_estimates_within_error pins accuracy vs exact).

    Per-lang HLL(lgK=12) sketches are built once, estimated per group,
    then UNIONED — not recounted — into the corpus-wide row. At 100 TB
    this is the pattern that replaces COUNT(DISTINCT): partials merge
    associatively on executors, the final union touches sketches only."""
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("lang").agg(F.hll_sketch_agg("doc_id", 12).alias("__sk"))
    per_est = per.select(
        "lang", F.hll_sketch_estimate("__sk").alias("est_distinct")
    )
    total = per.agg(F.hll_union_agg("__sk").alias("__sk")).select(
        F.lit("ALL").alias("lang"),
        F.hll_sketch_estimate("__sk").alias("est_distinct"),
    )
    return per_est.unionAll(total)

@q("q_pagerank")
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank (10 rounds, damping 0.85) over the bipartite
    supplier<->customer trade graph from lineitem x orders (customer ids
    offset by 1e6 into their own node-id space). Bit-exact integer
    recurrence, so the oracle is the same 10 rounds unrolled as SQL CTE
    stages — an iterative algorithm that still value-hash-matches."""
    from fortune_500_financial_insights_pipeline_spark.operators.pagerank import pagerank

    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_orderkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("l_suppkey").alias("s"),
            (F.col("o_custkey") + 1000000).alias("c"),
        )
        .distinct()
    )
    edges = base.select(F.col("s").alias("src"), F.col("c").alias("dst")).unionByName(
        base.select(F.col("c").alias("src"), F.col("s").alias("dst"))
    )
    return pagerank(edges, damping=0.85, max_iter=10)

@q("q_det_sample")
def q_det_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-portable deterministic 10% sample: md5 hash-space threshold
    as a plain string predicate — unlike q_hash_sample (xxhash64), this
    one value-hash-matches a DuckDB replay of the same predicate."""
    from fortune_500_financial_insights_pipeline_spark.operators.sampling import md5_sample

    d = load_table(spark, sf_dir, "documents")
    return md5_sample(d, 0.1, ["doc_id"]).select("doc_id", "lang")

@q("q_stratified_sample")
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic class rebalancing: per-lang md5 thresholds (en
    downsampled 20x vs de) via one CASE chain; langs outside the map drop."""
    from fortune_500_financial_insights_pipeline_spark.operators.sampling import md5_stratified

    d = load_table(spark, sf_dir, "documents")
    return md5_stratified(
        d, "lang", {"en": 0.05, "de": 0.5, "es": 0.25}, key_cols=["doc_id"]
    ).select("doc_id", "lang")
