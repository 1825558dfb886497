"""As-of joins, event-time windows, UDF surface, arrays/vectors (SURVEY §2.3 J5, §2.9-2.11).

Split from the single-file registry in round 3 — same functions, same
registration order, registered into the shared QUERIES dict on import."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.catalog import load_table
from fortune_500_financial_insights_pipeline_spark.functions.deterministic import davg, dsum, dsum_w

from fortune_500_financial_insights_pipeline_spark.queries._core import (  # noqa: F401
    _memo_trained,
    _qvec_probe,
    q,
)


# ---------------------------------------------------------------------------
# As-of join (SURVEY §2.3 J5)
# ---------------------------------------------------------------------------


@q("q_asof_lastval")
def q_asof_lastval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase event: the most recent click value by the same user
    at or before the purchase (trade-date → most-recent-statement pattern)."""
    from fortune_500_financial_insights_pipeline_spark.operators.asof import asof_join

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.col("value").alias("click_value")
    )
    return asof_join(
        purchases,
        clicks,
        on=["user_id"],
        ts_col="ts",
        value_cols=["click_value"],
        tiebreak_col="event_id",
    ).select("event_id", "user_id", "ts", "value", "click_value_asof")

# ---------------------------------------------------------------------------
# Event-time windows (SURVEY §2.10) — batch forms; streaming mirrors in
# streaming/events.py are covered by tests/test_streaming.py
# ---------------------------------------------------------------------------


@q("q_funnel")
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel: per user, first click → first purchase at-or-after
    it, with latency — the event-sequence composition (conditional min over
    a self-correlated window, no UDF)."""
    e = load_table(spark, sf_dir, "events")
    first_click = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click_ts"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    conv = (
        first_click.join(purchases, "user_id", "left")
        .filter(F.col("p_ts").isNull() | (F.col("p_ts") >= F.col("first_click_ts")))
        .groupBy("user_id", "first_click_ts")
        .agg(F.min("p_ts").alias("first_purchase_ts"))
    )
    return conv.select(
        "user_id",
        F.date_format("first_click_ts", "yyyy-MM-dd HH:mm:ss").alias("first_click"),
        F.date_format("first_purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("first_purchase"),
        F.when(
            F.col("first_purchase_ts").isNotNull(),
            F.col("first_purchase_ts").cast("timestamp").cast("long")
            - F.col("first_click_ts").cast("timestamp").cast("long"),
        ).alias("latency_s"),
    )

@q("q_histogram")
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order values: bucket = floor(v/width), the
    distribution profile every data-quality dashboard needs — one scan,
    one narrow groupBy."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50000).cast("int")
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )

@q("q_events_tumbling")
def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fortune_500_financial_insights_pipeline_spark.streaming.events import tumbling

    return tumbling(load_table(spark, sf_dir, "events"))

@q("q_events_sliding")
def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fortune_500_financial_insights_pipeline_spark.streaming.events import sliding

    return sliding(load_table(spark, sf_dir, "events"))

@q("q_events_session")
def q_events_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fortune_500_financial_insights_pipeline_spark.streaming.events import session

    return session(load_table(spark, sf_dir, "events"))

# ---------------------------------------------------------------------------
# UDF surface (SURVEY §2.9): Arrow-vectorized grouped transform
# ---------------------------------------------------------------------------


@q("q_pandas_udf_zscore")
def q_pandas_udf_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group zscore via applyInPandas (the escape hatch for whole-group
    logic built-ins can't express; rounded so the vectorized float math
    matches the oracle's window formulation)."""
    import pandas as pd

    e = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mean = pdf["value"].mean()
        std = pdf["value"].std(ddof=0)
        pdf["zscore"] = ((pdf["value"] - mean) / std).round(6)
        return pdf

    return e.groupBy("event_type").applyInPandas(
        zscore, schema="event_id long, event_type string, value double, zscore double"
    )

@q("q_pandas_scalar_udf")
def q_pandas_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Arrow-vectorized pandas_udf (§2.9): batch-at-a-time string
    normalization. Oracle-checkable because the semantics are plain SQL —
    the fixture proves the UDF transport, not exotic logic."""
    from fortune_500_financial_insights_pipeline_spark.functions.udfs import norm_name

    c = load_table(spark, sf_dir, "customer")
    return c.select("c_custkey", norm_name("c_name").alias("name_norm"))

@q("q_pandas_grouped_agg_udf")
def q_pandas_grouped_agg_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas_udf (§2.9): volume-weighted mean price per
    market segment — one Arrow batch per group side, partial-agg free but
    vectorized; rounded for float-order tolerance."""
    from fortune_500_financial_insights_pipeline_spark.functions.udfs import wmean

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey)
    weight = (F.col("o_orderkey") % 5 + 1).cast("double")
    return j.groupBy("c_mktsegment").agg(
        wmean(F.col("o_totalprice"), weight).alias("wmean_price")
    )

@q("q_higher_order")
def q_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions (§2.8): transform/filter/aggregate over
    the embedding vectors — squared-l2, positive-component count, clipped
    mean — all JVM-side lambdas, no UDF."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.round(
            F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x), 6
        ).alias("sq_l2"),
        F.size(F.filter(v, lambda x: x > 0)).alias("n_pos"),
        F.round(
            F.aggregate(
                F.transform(v, lambda x: F.least(F.greatest(x, F.lit(-0.5)), F.lit(0.5))),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.size(v),
            6,
        ).alias("clipped_mean"),
    )

@q("q_percentile")
def q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentile per group (approx twin: q_approx_distinct)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
    )

@q("q_approx_distinct")
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct (A3). No oracle: DuckDB's HLL yields a
    different estimate by construction — the driver records rows-only; the
    exact twin q_count_distinct carries the value check."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
    )

# ---------------------------------------------------------------------------
# Arrays / vectors (SURVEY §2.8, §2.11)
# ---------------------------------------------------------------------------


@q("q_array_explode")
def q_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select("label", F.explode("embedding").alias("component"))
    return ex.groupBy("label").agg(
        F.count("*").alias("n_vals"),
        F.min(F.col("component").cast("double")).alias("min_val"),
        F.max(F.col("component").cast("double")).alias("max_val"),
    )

@q("q_array_pos")
def q_array_pos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (posexplode ↔ UNNEST WITH ORDINALITY)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") < 50).select(
        "vec_id", F.posexplode("embedding").alias("pos", "component")
    ).select("vec_id", "pos", F.col("component").cast("double").alias("component"))

@q("q_conditional")
def q_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional scalar surface: CASE, coalesce, nullif, greatest, least."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("size_band"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("open")).alias("status_x"),
        F.greatest(F.col("o_orderkey") % 7, F.col("o_orderkey") % 5).alias("g75"),
        F.least(F.col("o_orderkey") % 7, F.col("o_orderkey") % 5).alias("l75"),
    )

@q("q_date_arith")
def q_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic (§2.8): day offsets, month adds, day diffs, last_day,
    weekday extraction — outputs as strings/ints for engine-portable hashing."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("plus30d"),
        F.date_format(F.add_months(d, 2), "yyyy-MM-dd").alias("plus2m"),
        F.datediff(F.lit("1999-01-01").cast("date"), d).alias("days_to_99"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.dayofweek(d).alias("dow"),
    )

@q("q_cosine_topk")
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k against the vec_id=0 embedding (ANN baseline;
    the LSH scale path is q_embed_neardup_lsh)."""
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return cosine_topk(emb.select("vec_id", "label", "embedding"), list(qvec), k=20)

@q("q_knn_join")
def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched k-NN similarity join: top-5 cosine neighbors for each of
    the first 10 vectors (self excluded), exact brute force."""
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import knn_join

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    return knn_join(emb.filter(F.col("vec_id") < 10), emb, k=5)

@q("q_knn_join_ivf")
def q_knn_join_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-routed batched k-NN (the registered scale shape round 1 lacked):
    corpus vectors bucketed into 4 md5-seeded centroid cells, each query
    probes its 2 nearest cells, per-query top-3 ranks only cell-sized
    candidate lists. md5 seeding + round-6 routing make the cell
    assignment oracle-reproducible, so this is hash-checked end to end
    (the approximation is in WHICH cells are scanned, mirrored exactly by
    the oracle — returned similarities are exact)."""
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import (
        knn_join_ivf,
        md5_sample_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    centroids = md5_sample_centroids(emb, k=4)
    return knn_join_ivf(
        emb.filter(F.col("vec_id") < 10), emb, centroids, k=3, n_probe=2
    )

@q("q_semdedup")
def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup (SemDeDup): md5-seeded 16-cell coarse quantizer, then
    drop every vector with a cosine>=0.4-similar lower-id neighbor in its
    cell (threshold tuned to the fixture's similarity range — real corpora
    use ~0.95). Kept representatives, hash-checked: md5 seeding + round-6
    routing make cell assignment AND the pairwise drop rule
    oracle-reproducible (operators/similarity.py semdedup)."""
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import (
        md5_sample_centroids,
        semdedup,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    centroids = md5_sample_centroids(emb, k=16)
    return semdedup(emb, centroids, threshold=0.4).select(
        "vec_id", "label", F.col("cell").cast("long").alias("cell")
    )

@q("q_ivf_topk")
def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k with a TRAINED coarse quantizer: two exact
    Lloyd iterations (operators/kmeans.py) tighten the cells before
    index+probe — fewer false candidates per probe than raw sampled seeds
    at the same n_probe. Oracle-exact since r2: routing uses the portable
    round-6 rule (ivf_index_portable / probe_cells_col) and the quantizer
    is the fixed-point Lloyd training q_kmeans already oracles, so the
    whole train→index→probe→score path is hash-checked; recall vs brute
    force additionally pinned by test_ivf_topk_recall_on_clustered_data."""
    from fortune_500_financial_insights_pipeline_spark.operators.kmeans import kmeans_centroids
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import (
        cosine_topk,
        ivf_index_portable,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    centroids = _memo_trained(
        ("kmeans8x2", sf_dir), lambda: kmeans_centroids(emb, k=8, n_iter=2)
    )
    indexed = ivf_index_portable(emb, centroids)
    qvec, probe = _memo_trained(
        ("q0probe8x2", sf_dir), lambda: _qvec_probe(emb, centroids)
    )
    return cosine_topk(
        indexed.filter(F.col("cell").isin(probe)).drop("cell"), qvec, k=20
    )

@q("q_quantized_topk")
def q_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8-quantized cosine top-k. Oracle-exact since r2: per-vector
    max-abs scale, HALF_UP rounding and the cosine fold are all portable
    double arithmetic (recall vs the exact twin additionally pinned by
    test_quantized_embeddings_preserve_neighbors)."""
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import (
        quantize_embeddings,
        quantized_cosine_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    qvec = list(emb.filter(F.col("vec_id") == 0).head().embedding)
    qstore = quantize_embeddings(emb).drop("embedding")
    return quantized_cosine_topk(qstore, qvec, k=20, id_cols=["vec_id", "label"])

@q("q_embed_neardup_lsh")
def q_embed_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate vectors via random-hyperplane LSH bucketing (rows-only:
    the float bucketing is Spark-specific; exact-cosine verification filters
    the candidates). The fixture embeddings are near-orthogonal (max pairwise
    cosine 0.48), so — exactly like the oracle-exact portable twin
    q_embed_neardup_portable — the query PLANTS 50 near-duplicates (vectors
    0-49 rescaled by 1.02 under shifted ids; cosine 1.0, scale-invariant and
    sign-invariant, so each plant collides with its source in every
    hyperplane bucket) and the detector must recover them: a 0-row result
    means the bucketing broke, not that the data had no dups.
    test_lsh_neardup_recovers_planted_pairs pins the recovered pair set."""
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import lsh_neardup_pairs

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    dim = len(emb.select("embedding").head()[0])
    planted = emb.where(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.02)).alias("embedding"),
    )
    return lsh_neardup_pairs(
        emb.unionByName(planted), dim=dim, n_planes=12, min_cosine=0.9
    )
