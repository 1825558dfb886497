"""Analytics extensions: entity resolution, data quality, product analytics, time series, robust stats, graph metrics.

Split from the single-file registry in round 3 — same functions, same
registration order, registered into the shared QUERIES dict on import."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.catalog import load_table
from fortune_500_financial_insights_pipeline_spark.functions.deterministic import davg, dsum, dsum_w

from fortune_500_financial_insights_pipeline_spark.queries._core import (  # noqa: F401
    _memo_trained,
    _qvec_probe,
    pq_codes,
    q,
)


# ---------------------------------------------------------------------------
# Analytics extensions: entity resolution, data quality, product analytics,
# time series, robust stats, graph metrics (SURVEY §2.11 widening)
# ---------------------------------------------------------------------------


@q("q_fuzzy_match")
def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy self-match on customer names: levenshtein <= 1 inside
    prefix blocks (all-but-last-2-chars), the entity-resolution primitive
    for name-keyed dims (reference stock_list.csv / DDL VARCHAR keys).
    Equi-join on the block key — never a cartesian; levenshtein is a JVM
    built-in on both engines, so fully oracle-checked."""
    from fortune_500_financial_insights_pipeline_spark.operators.fuzzy import blocked_fuzzy_pairs

    c = load_table(spark, sf_dir, "customer")
    block = F.expr("substr(c_name, 1, length(c_name) - 2)")
    return blocked_fuzzy_pairs(c, "c_custkey", "c_name", block, max_dist=1)

@q("q_dq_audit")
def q_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit over orders: the constraints the reference only
    declares in unused DDLs (UNIQUE keys, NOT NULL, accepted values —
    code/sql/DDLs:14,28) compiled to executable rules. Row-local rules run
    in ONE aggregation pass; uniqueness is a key groupBy; referential
    integrity is a broadcast left-anti join."""
    from fortune_500_financial_insights_pipeline_spark import checks as QA

    o = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    row_rules = QA.row_rule_violations(
        o,
        {
            "not_null:o_custkey": F.col("o_custkey").isNull(),
            "range:o_totalprice_positive": F.col("o_totalprice") <= 0,
            "accepted:o_orderstatus": ~F.col("o_orderstatus").isin("O", "F", "P"),
            "fresh:o_orderdate_after_1990": F.col("o_orderdate")
            < F.lit("1990-01-01").cast("timestamp"),
        },
    )
    return QA.audit(
        [
            row_rules,
            QA.unique_violations(o, ["o_orderkey"], "unique:o_orderkey"),
            QA.ref_violations(o, "o_custkey", cust, "c_custkey", "ref:o_custkey->customer"),
        ]
    )

@q("q_retention_cohort")
def q_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix over events: cohort = day of a user's first
    event, cell = distinct users active at each day offset. Two shuffles
    (user-grain min, then cohort-grain distinct count) — the canonical
    product-analytics rollup the reference delegates to Tableau."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    first = ev.groupBy("user_id").agg(F.min("d").alias("cd"))
    return (
        ev.join(first, "user_id")
        .groupBy(
            F.date_format("cd", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("d", "cd").alias("offset_days"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )

@q("q_interpolate")
def q_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily series per user (users 0-7, Jan 2024) with missing days
    linearly interpolated between nearest observations, edges clamped.
    Spine = sequence() exploded per key; fill = four IGNORE NULLS windows
    over one (key, day) shuffle. Fixed-order double arithmetic on a
    fixed-point daily mean → bit-identical to the single-threaded oracle."""
    import datetime as dt

    from fortune_500_financial_insights_pipeline_spark.operators.timeseries import fill_gaps_linear

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 8)
    daily = ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        davg("value").alias("v")
    )
    filled = fill_gaps_linear(
        daily, "user_id", "d", "v", dt.date(2024, 1, 1), dt.date(2024, 1, 30)
    )
    return filled.select(
        "user_id",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "value_filled",
    )

@q("q_mad_outliers")
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier flags: |x - median| > 3 * MAD (median
    absolute deviation) per event_type. Exact interpolated medians via
    built-in percentile (two grouped aggregations + re-join) — the
    robust-statistics cousin of the z-score UDF query, entirely JVM-side."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.percentile("value", 0.5).alias("med"))
    dev = ev.join(med, "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.percentile("adev", 0.5).alias("mad"))
    return (
        dev.join(mad, "event_type")
        .where(F.col("adev") > 3 * F.col("mad"))
        .select("event_id", "event_type")
    )

@q("q_triangles")
def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the exact bigram-Jaccard similarity
    graph (same edge rule as q_jaccard_clusters): triangle membership =
    mutually-similar triples, the density signal LSH-based dedup uses to
    distinguish a tight duplicate cluster from a chain of borderline pairs.
    Edges come from the prefix-filtered exact set-similarity join
    (operators/setjoin.py) via the per-process pair memo
    (_core.doc_jaccard_pairs — shared with q_jaccard_clusters); triple
    enumeration is two equi-joins on canonicalized (u < v) edges."""
    from fortune_500_financial_insights_pipeline_spark.operators.graph import triangle_counts
    from fortune_500_financial_insights_pipeline_spark.queries._core import (
        doc_jaccard_pairs,
    )

    pairs = doc_jaccard_pairs(spark, sf_dir, ngram=2, floor=0.8).select(
        "id_a", "id_b"
    )
    return triangle_counts(pairs).select(
        F.col("id").alias("doc_id"), "n_triangles"
    )

@q("q_heavy_hitters")
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact group-relative heavy hitters: users contributing > 1% of their
    event_type's volume. Two partial-aggregated shuffles + a broadcast join
    of the tiny totals side. At sketch scale the same contract is served
    mergeably by Misra-Gries summaries per partition (union = merge +
    re-trim), mirroring the HLL pattern in functions/deterministic."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("n_events"))
    t = ev.groupBy("event_type").agg((F.count(F.lit(1)) * 0.01).alias("thr"))
    return (
        c.join(F.broadcast(t), "event_type")
        .where(F.col("n_events") > F.col("thr"))
        .select("event_type", "user_id", "n_events")
    )

@q("q_redact_pii")
def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction as a curation stage: emails/SSNs/phones/IPs tagged out
    by one chained-regexp projection (operators/text.redact_pii). Fixture
    documents are digit-free, so the contact strings are synthesized
    deterministically from customer columns — both engines build the
    identical raw text, redact it, and count matches, value-hash-checked."""
    from fortune_500_financial_insights_pipeline_spark.operators import text as TX

    c = load_table(spark, sf_dir, "customer")
    raw = F.concat(
        F.lit("reach "),
        F.col("c_name"),
        F.lit(" at c"),
        F.col("c_custkey").cast("string"),
        F.lit("@corp.example.com"),
        F.when(
            F.col("c_custkey") % 2 == 0,
            F.concat(
                F.lit(" or 555-"),
                F.lpad((F.col("c_custkey") % 1000).cast("string"), 3, "0"),
                F.lit("-"),
                F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.lit(" ssn 123-45-6789 ip 10.0.0."),
        (F.col("c_custkey") % 256).cast("string"),
    )
    return c.select(
        "c_custkey",
        TX.redact_pii(raw).alias("redacted"),
        TX.pii_count(raw).cast("int").alias("n_pii"),
    )

@q("q_repetition_filter")
def q_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule repetition filter: flag documents whose most frequent
    bigram occupies >= 8% of the bigram stream (boilerplate detector that
    complements the length/stopword quality score). Two stacked doc-keyed
    aggregations — no cross-document shuffle skew."""
    from fortune_500_financial_insights_pipeline_spark.operators.text import repetition_stats

    d = load_table(spark, sf_dir, "documents")
    stats = repetition_stats(d, "doc_id", "text", n=2)
    return stats.select(
        "doc_id",
        "top_gram_frac",
        "n_grams",
        (F.col("top_gram_frac") >= 0.08).alias("is_repetitive"),
    )

@q("q_asof_tolerance")
def q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-bounded as-of join (pandas merge_asof(tolerance=...) /
    kdb wj semantics): the most recent click value per user reverts to
    null when it is staler than 1 hour at the purchase — same single
    union+window pass as q_asof_lastval, one extra carried timestamp."""
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
        tolerance="1 HOUR",
    ).select("event_id", "user_id", "ts", "value", "click_value_asof")

@q("q_rolling_beta")
def q_rolling_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 10-day beta of each user's daily mean value against the
    all-events market mean: the classic factor-exposure window statistic,
    computed from fixed-point component sums (Σx, Σy, Σxy, Σx²) so the
    distributed result is bit-identical to the single-threaded oracle —
    never from a built-in corr/covar whose online update order differs
    per engine. One shuffle (user, day grain), then one window pass."""
    ev = load_table(spark, sf_dir, "events")
    user_daily = ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        davg("value").alias("y")
    )
    market_daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        davg("value").alias("x")
    )
    j = user_daily.join(market_daily, "d")
    w = W.partitionBy("user_id").orderBy("d").rowsBetween(-9, 0)
    n = F.count(F.lit(1)).over(w).cast("double")
    sx = dsum_w(F.col("x"), w)
    sy = dsum_w(F.col("y"), w)
    sxy = dsum_w(F.col("x") * F.col("y"), w)
    sxx = dsum_w(F.col("x") * F.col("x"), w)
    denom = n * sxx - sx * sx
    beta = F.when(denom != 0, (n * sxy - sx * sy) / denom)
    return j.select(
        "user_id",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        beta.alias("beta"),
    )

@q("q_ab_test")
def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment readout: Welch's t statistic per event_type between the
    user_id-parity split (the deterministic A/B assignment), built from
    fixed-point Σx and Σx² — closed-form mean/variance, no built-in
    stddev whose accumulation order differs per engine. One grouped
    aggregation, one pivot-style self-alignment via conditional sums."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.withColumn("grp", (F.col("user_id") % 2).cast("int"))
    agg = g.groupBy("event_type", "grp").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum("value").alias("sx"),
        dsum(F.col("value") * F.col("value")).alias("sxx"),
    )
    a = agg.where(F.col("grp") == 0).select(
        "event_type",
        F.col("n").alias("na"), F.col("sx").alias("sxa"), F.col("sxx").alias("sxxa"),
    )
    b = agg.where(F.col("grp") == 1).select(
        "event_type",
        F.col("n").alias("nb"), F.col("sx").alias("sxb"), F.col("sxx").alias("sxxb"),
    )
    j = a.join(b, "event_type")
    ma = F.col("sxa") / F.col("na")
    mb = F.col("sxb") / F.col("nb")
    va = (F.col("sxxa") - F.col("sxa") * F.col("sxa") / F.col("na")) / (F.col("na") - 1)
    vb = (F.col("sxxb") - F.col("sxb") * F.col("sxb") / F.col("nb")) / (F.col("nb") - 1)
    t = (ma - mb) / F.sqrt(va / F.col("na") + vb / F.col("nb"))
    return j.select(
        "event_type",
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        (ma - mb).alias("mean_diff"),
        t.alias("t_stat"),
    )

@q("q_market_basket")
def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association mining over (user, event_type) baskets: support and
    lift for every ordered event-type pair. Basket build is a distinct
    user-type projection; co-occurrence is a self-join on user (bounded:
    5 types → ≤ C(5,2) pairs per user); supports broadcast back. The
    co-occurrence self-join is the same shape PPJoin prunes at corpus
    scale (operators/setjoin.py)."""
    ev = load_table(spark, sf_dir, "events")
    baskets = ev.select("user_id", "event_type").distinct()
    n_users = baskets.select("user_id").distinct().count()
    sup = baskets.groupBy("event_type").agg(
        (F.count(F.lit(1)) / F.lit(float(n_users))).alias("support")
    )
    a = baskets.select("user_id", F.col("event_type").alias("t_a"))
    b = baskets.select("user_id", F.col("event_type").alias("t_b"))
    pair = (
        a.join(b, "user_id")
        .where(F.col("t_a") < F.col("t_b"))
        .groupBy("t_a", "t_b")
        .agg((F.count(F.lit(1)) / F.lit(float(n_users))).alias("support_ab"))
    )
    sa = sup.select(F.col("event_type").alias("t_a"), F.col("support").alias("sup_a"))
    sb = sup.select(F.col("event_type").alias("t_b"), F.col("support").alias("sup_b"))
    return (
        pair.join(F.broadcast(sa), "t_a")
        .join(F.broadcast(sb), "t_b")
        .select(
            "t_a", "t_b", "support_ab",
            (F.col("support_ab") / (F.col("sup_a") * F.col("sup_b"))).alias("lift"),
        )
    )

@q("q_variant_json")
def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path: parse the JSON ``props`` payload into
    Spark 4's VARIANT type, extract a typed field, aggregate per event type.

    VARIANT keeps the shredded binary encoding JVM-side (no Python UDF, no
    schema-on-write) — at 100 TB this is the schema-flexible analog of the
    reference's autodetect JSON loads (transform_json_INFO.py:104-119);
    extraction happens inside whole-stage codegen."""
    ev = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_k"),
            F.sum("k").cast("long").alias("sum_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )

@q("q_regr_agg")
def q_regr_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregate family (OLS slope/intercept/R² per group)
    — the one-pass regr_* aggregates the warehouse layer would run for the
    Tableau-style price-vs-volume overlays (SURVEY §2.4: aggregation surface
    delegated downstream by the reference)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.regr_count("l_extendedprice", "l_quantity").alias("n_pairs"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 6).alias("intercept"),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        F.round(F.regr_avgx("l_extendedprice", "l_quantity"), 6).alias("avg_x"),
        F.round(F.regr_avgy("l_extendedprice", "l_quantity"), 6).alias("avg_y"),
    )

@q("q_join_full")
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer equi-join with nulls surviving on BOTH sides: high-balance
    customers vs per-customer order rollups. TPC-H leaves ~1/3 of customers
    orderless and the balance filter drops customers that do have orders, so
    both null wings are populated. Completes the join-type surface (J1-J4 +
    full outer; SURVEY §2.3). Shuffle join on c_custkey; the pre-aggregation
    runs partial map-side so the shuffled right side is one row per customer."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 7500)
        .select("c_custkey", "c_mktsegment", "c_acctbal")
    )
    ords = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("total_spend"))
    )
    return (
        cust.join(ords, cust.c_custkey == ords.o_custkey, "full_outer")
        .select(
            F.coalesce("c_custkey", "o_custkey").alias("custkey"),
            "c_mktsegment",
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_orders",
            "total_spend",
        )
    )

@q("q_mode_exact")
def q_mode_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group mode with a deterministic tie-break (smallest value
    wins). Built-in F.mode is tie-nondeterministic across engines, so the
    portable form is count→rank with an explicit order — two shuffles on the
    grouping key, both partial-aggregated map-side. The same shape yields
    any 'argmax per group' (most common token, dominant language per shard)."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(F.count(F.lit(1)).alias("cnt"))
    w = W.partitionBy("l_returnflag").orderBy(F.desc("cnt"), F.asc("l_quantity"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("l_quantity").alias("mode_qty"),
            F.col("cnt").alias("mode_count"),
        )
    )

@q("q_ohlc_resample")
def q_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series downsample to OHLC candlestick bars: per (series, day),
    open = first value / close = last value by event time, high/low = extrema,
    volume = row count. The first/last pick uses min_by/max_by over a
    composite (ts, event_id) key so ties are deterministic — one shuffle on
    the bar key, all five aggregates partial map-side. The struct key costs
    a SortAggregate (partition-local sorts only; asserted in
    test_plan_quality), still far cheaper than the window-sort formulation,
    which shuffles full tick rows then sorts per key.
    This is the daily→period rollup the reference delegates to Tableau over
    the open_close warehouse table (SURVEY §2.4; DDLs:4-14)."""
    ev = load_table(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.withColumn("day", F.to_date("ts"))
        .groupBy("event_type", "day")
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "open", "high", "low", "close", "n_ticks",
        )
    )

@q("q_kmeans")
def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Lloyd's k-means over the embeddings table (k=8, 3 exact
    integer iterations; operators/kmeans.py) — the trained coarse quantizer
    for the IVF similarity path. Oracle = the iterations unrolled as CTE
    stages replaying the same fixed-point arithmetic."""
    from fortune_500_financial_insights_pipeline_spark.operators.kmeans import kmeans_fit

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_fit(emb, k=8, n_iter=3)

@q("q_cms_heavy")
def q_cms_heavy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy-hitter estimates vs exact counts: build the
    relational CMS over events.user_id (operators/cms.py), then point-query
    the true top-10 users. est_cnt ≥ true_cnt always (CMS guarantee); the
    whole build→estimate pipeline is md5-hash integer arithmetic shared
    verbatim with the DuckDB oracle — a verifiable sketch, unlike binary
    blobs. The sketch shuffle carries ≤ d·w cells, never input rows."""
    from fortune_500_financial_insights_pipeline_spark.operators.cms import cms_build, cms_estimate

    ev = load_table(spark, sf_dir, "events")
    sketch = cms_build(ev, "user_id")
    true_top = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), F.asc("user_id"))
        .limit(10)
    )
    return cms_estimate(sketch, true_top, "user_id")

@q("q_interval_join")
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big-big interval join in batch: purchases within 30 minutes after a
    click by the same user, counted per user. Planned as a shuffle equi-join
    on (user_id, time-bin) with a ≤2-bin left fan-out then an exact band
    refine (operators/intervaljoin.py) — never a nested-loop/cartesian,
    which a raw theta join between two fact tables would be. The batch twin
    of the watermarked stream-stream interval join (streaming/joins.py)."""
    from fortune_500_financial_insights_pipeline_spark.operators.intervaljoin import (
        binned_interval_join,
    )

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("event_id").alias("click_id")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts")
    )
    pairs = binned_interval_join(
        clicks, purchases, ["user_id"], "click_ts", "purchase_ts", 0, 1800
    )
    return pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("click_id").alias("n_clicks_with_followup"),
    )

@q("q_char_entropy")
def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-entropy quality signal per document: low entropy flags
    boilerplate/repetition, high entropy flags binary junk — the
    information-theoretic cousin of the Gopher repetition rule
    (q_repetition_filter). Implementation: operators/text.py char_entropy
    (sequence-explode chars, fixed-point p*log2(p) sum — distributed result
    is bit-identical to the oracle); also a curation-funnel stage
    (pipelines/training_data.py)."""
    from fortune_500_financial_insights_pipeline_spark.operators.text import char_entropy

    return char_entropy(load_table(spark, sf_dir, "documents"))

@q("q_simhash_portable")
def q_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints whose bits derive from md5 hex digits — the
    verifiable twin of q_simhash (xxhash64): DuckDB reproduces the exact
    signature, upgrading the near-dup fingerprint from rows-only checking
    to full value parity. One pass, no UDF, no shuffle beyond the scan."""
    from fortune_500_financial_insights_pipeline_spark.operators.minhash import simhash_portable

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", simhash_portable("text").alias("simhash"))

@q("q_winsorize")
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization: clamp each series' values to its own exact [P05, P95]
    band — the standard outlier treatment before scaling/aggregating a
    feature. Two passes: per-group exact percentiles (tiny frame,
    broadcast back), then a clamp projection; the per-group comparison
    aggregates confirm the clamp (min == p05, max == p95). Same adaptive-
    threshold shape as q_quality_gate but value-clamping, not filtering."""
    e = load_table(spark, sf_dir, "events")
    bands = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("p05"),
        F.expr("percentile(value, 0.95)").alias("p95"),
    )
    clamped = e.join(F.broadcast(bands), "event_type").select(
        "event_type",
        F.greatest(F.least(F.col("value"), F.col("p95")), F.col("p05")).alias("w"),
    )
    return clamped.groupBy("event_type").agg(
        F.round(F.min("w"), 6).alias("min_w"),
        F.round(F.max("w"), 6).alias("max_w"),
        dsum("w").alias("sum_w"),
        F.count(F.lit(1)).alias("n"),
    )

@q("q_calendar_features")
def q_calendar_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar feature derivation per order date: day-of-week, quarter,
    month-end flag, days-in-month — the trading-calendar features the
    reference's Tableau layer derives downstream (SURVEY §2.8 date
    surface). All scan-side projections; the aggregate keeps the output
    compact (one row per distinct date). Day-of-week numbering differs
    across engines (Spark: Sunday=1; DuckDB: Sunday=0) — the oracle maps
    explicitly rather than hiding the divergence."""
    o = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return (
        o.select(
            F.date_format(d, "yyyy-MM-dd").alias("day"),
            F.dayofweek(d).alias("dow"),
            F.quarter(d).alias("quarter"),
            (F.dayofmonth(d) == F.dayofmonth(F.last_day(d))).cast("int").alias("is_month_end"),
            F.dayofmonth(F.last_day(d)).alias("days_in_month"),
        )
        .groupBy("day", "dow", "quarter", "is_month_end", "days_in_month")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )

@q("q_gap_fill")
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward/backward fill per series: sensor-style sparse observations
    (only 'view' events carry a reading here) filled from the last/next
    non-null within each user's timeline — last_value/first_value with
    ignoreNulls over one window family (one shuffle on user_id, shared by
    both directions). The complement of q_interpolate's linear fill."""
    e = load_table(spark, sf_dir, "events")
    obs = F.when(F.col("event_type") == "view", F.col("value"))
    wf = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    wb = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.currentRow, W.unboundedFollowing
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(F.last(obs, ignorenulls=True).over(wf), 6).alias("ffill"),
        F.round(F.first(obs, ignorenulls=True).over(wb), 6).alias("bfill"),
    )

@q("q_simhash_pairs")
def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash candidate pairs with exact Hamming distances: the portable
    48-bit signature splits into 4 12-bit bands; docs sharing any band
    bucket-join into candidates (the standard simhash blocking — an
    equi-join on (band, value), never an O(n²) signature scan), then
    bit_count(a XOR b) scores each pair. With the md5-bit signature the
    entire pipeline — signature, banding arithmetic, xor popcount — is
    engine-portable and oracle-exact, end to end."""
    from fortune_500_financial_insights_pipeline_spark.operators.compact import (
        ensure_min_parallelism,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.minhash import (
        bucket_pairs,
        simhash_portable,
    )

    docs = ensure_min_parallelism(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    )
    # NOTE: an explode + 48-conditional-SUM aggregate form was measured
    # ~15% SLOWER than this interpreted fold (48 agg buffers per group
    # outweigh the lambda overhead) — don't "optimize" it that way again.
    sigs = docs.select("doc_id", simhash_portable("text").alias("sig"))
    bands = sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        (F.floor(F.col("sig") / F.lit(float(2 ** (12 * b)))).cast("long") % 4096).alias("bval"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "sig", "bb.band", "bb.bval")

    # bucket_pairs computes the md5-fold signature subtree ONCE (a bucket
    # self-join would compute it per branch) and yields id_a < id_b pairs.
    # Round 9 (guide §2.4): a pair co-bucketing in k bands used to be
    # emitted k times and collapsed by a dropDuplicates — an exchange +
    # aggregate over EVERY raw candidate pair (727k rows at sf0.1, one
    # 549-member bucket alone contributing 150k). Every band value is
    # arithmetic on the two signatures already carried on the pair, so
    # "is this the FIRST band where the pair matches" is a row-local
    # predicate: emit each pair only there, and the pair set is globally
    # unique by construction — dedup exchange deleted from the plan
    # (test_simhash_pairs_plan_has_no_dedup_exchange pins the shape;
    # test_simhash_pairs_first_band_matches_dedup pins set equality).
    def _bval(sig: Column, b: int) -> Column:
        return F.floor(sig / F.lit(float(2 ** (12 * b)))).cast("long") % 4096

    def _first_band(a: Column, b: Column) -> Column:
        pred = F.lit(True)
        for bb in range(3):  # bands 0..2 can precede; band 3 checks all
            pred = pred & (
                (F.col("band") <= bb) | (_bval(a["sig"], bb) != _bval(b["sig"], bb))
            )
        return pred

    pairs = bucket_pairs(
        bands,
        ["band", "bval"],
        "doc_id",
        carry_cols=("sig",),
        pair_filter=_first_band,
        dedup=False,
        wide_expand=True,
    )
    return pairs.select(
        "id_a",
        "id_b",
        F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).alias("hamming"),
    )

@q("q_source_cap")
def q_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-capped sampling: keep at most N documents per source, the
    standard web-curation guard against one domain dominating the corpus.
    Priority is md5(doc_id) — deterministic, engine-portable, uniformly
    'random' — and the rank ≤ N filter gets Catalyst's partial
    WindowGroupLimit: each map task forwards at most N rows per source
    before the shuffle, so the exchange is capped at N·sources·tasks no
    matter how skewed the source distribution is."""
    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    capped = (
        docs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 50)
        .drop("rn")
    )
    return capped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").cast("long").alias("chars_kept"),
        F.min("doc_id").alias("min_doc_id"),
    )

@q("q_unigram_logprob")
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM quality score: average per-token unigram log-probability
    of each document under the corpus's own token distribution — the
    CCNet-style signal (odd docs score low because their tokens are rare
    corpus-wide). One token explode feeds both the vocabulary counts and
    the per-doc counts; the vocab frame (one row per distinct token) joins
    back broadcast-style. Per-token log2(p) terms are per-row IEEE math;
    the per-doc weighted sum runs in fixed point, so the score is
    partitioning-invariant and oracle-exact."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    ).where(F.col("tok") != "")
    # round 9 (guide §5): doc_tok feeds the vocab aggregate AND the join
    # probe under different partitionings — checkpoint so the tokenize
    # explode runs once per session (the q_perplexity_bucket fix)
    doc_tok = (
        toks.groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("n_dt"))
        .localCheckpoint(eager=False)
    )
    vocab = doc_tok.groupBy("tok").agg(F.sum("n_dt").alias("n_t"))
    total = vocab.agg(F.sum("n_t").alias("n_total"))
    scored = doc_tok.join(vocab, "tok").crossJoin(F.broadcast(total))
    term = F.col("n_dt") * F.log2(F.col("n_t") / F.col("n_total"))
    return scored.groupBy("doc_id").agg(
        (dsum(term) / F.sum("n_dt")).alias("avg_log2_prob"),
        F.sum("n_dt").cast("long").alias("n_tokens"),
    )

@q("q_dataset_card")
def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card summary per language: the corpus-level numbers every
    training-data release reports — document and source counts, char
    volume, exact-dup rate (via content fingerprints), mean doc length.
    One scan, one groupBy; the dup rate reuses the md5 fingerprint so the
    whole card is oracle-exact."""
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")))
    return (
        docs.withColumn("fp", fp)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.countDistinct("fp").alias("n_unique"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.round(F.sum("n_chars") / F.count(F.lit(1)), 6).alias("mean_chars"),
        )
        .withColumn(
            "dup_rate",
            F.round((F.col("n_docs") - F.col("n_unique")) / F.col("n_docs"), 6),
        )
    )

@q("q_rfm")
def q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency (days since last order, against
    the corpus max date so the result is reproducible), frequency (order
    count), monetary (fixed-point spend), each cut into quintiles with a
    customer-id tiebreak so the ntile assignment is total-order
    deterministic across engines. One aggregation pass + three ntile
    windows over the compact per-customer frame (rows = customers, not
    orders)."""
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        dsum("o_totalprice").alias("monetary"),
    )
    anchor = per.agg(F.max("last_order").alias("a"))
    per = per.crossJoin(F.broadcast(anchor)).withColumn(
        "recency_days", F.datediff(F.col("a"), F.col("last_order"))
    )
    r_w = W.orderBy(F.asc("recency_days"), F.asc("o_custkey"))
    f_w = W.orderBy(F.desc("frequency"), F.asc("o_custkey"))
    m_w = W.orderBy(F.desc("monetary"), F.asc("o_custkey"))
    return per.select(
        "o_custkey",
        "recency_days",
        "frequency",
        F.round("monetary", 2).alias("monetary"),
        F.ntile(5).over(r_w).alias("r_score"),
        F.ntile(5).over(f_w).alias("f_score"),
        F.ntile(5).over(m_w).alias("m_score"),
    )

@q("q_new_vs_returning")
def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning user split: a user's first-seen day labels
    each active (user, day); the daily rollup counts both classes. The
    first-seen frame is one row per user (min over the scan, partial
    map-side) joined back on user_id — the standard two-pass shape that
    avoids any window over the raw event stream."""
    e = load_table(spark, sf_dir, "events")
    days = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    first = days.groupBy("user_id").agg(F.min("day").alias("first_day"))
    labeled = days.join(first, "user_id").withColumn(
        "is_new", (F.col("day") == F.col("first_day")).cast("int")
    )
    return (
        labeled.groupBy("day")
        .agg(
            F.sum("is_new").cast("long").alias("new_users"),
            F.sum(1 - F.col("is_new")).cast("long").alias("returning_users"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "new_users",
            "returning_users",
        )
    )

@q("q_skyline")
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of parts under (retail price ↓, size ↑): the
    sort-scan skyline (operators/skyline.py) — two aggregations and one
    window over the distinct-price frame, no dominance self-join."""
    from fortune_500_financial_insights_pipeline_spark.operators.skyline import skyline_2d

    p = load_table(spark, sf_dir, "part")
    return skyline_2d(
        p.select("p_partkey", "p_retailprice", "p_size"),
        minimize="p_retailprice",
        maximize="p_size",
    )

@q("q_rolling_median")
def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trailing 7-observation median of shipped quantity per supplier
    (robust rolling level for anomaly baselines). Bounded-frame
    collect_list + sort_array — exact, JVM-side, state independent of
    table size (operators/timeseries.rolling_median)."""
    from fortune_500_financial_insights_pipeline_spark.operators.timeseries import rolling_median

    li = load_table(spark, sf_dir, "lineitem")
    return rolling_median(
        li.select("l_suppkey", "l_orderkey", "l_linenumber", "l_shipdate", "l_quantity"),
        part_cols=["l_suppkey"],
        order_cols=["l_shipdate", "l_orderkey", "l_linenumber"],
        value_col="l_quantity",
        frame_rows=7,
    ).select("l_suppkey", "l_orderkey", "l_linenumber", "med")

@q("q_bloom_semijoin")
def q_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-join pre-filter: customers whose key passes a 16 Kbit / k=3
    Bloom filter built from order custkeys. Supersets the true semi-join
    (zero false negatives) with ~1% deterministic false positives — the
    map-side shuffle-elimination filter for big-big joins
    (operators/bloom.py)."""
    from fortune_500_financial_insights_pipeline_spark.operators.bloom import (
        bloom_build,
        bloom_probe,
    )

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    # build from a proper subset (1995 orders) so the probe exercises both
    # the hit and the definite-miss path — this fixture has no customer
    # without orders at all, so an unfiltered build passes everyone
    o95 = o.where(F.year(F.to_date("o_orderdate")) == 1995)
    flt = bloom_build(o95, "o_custkey", m_bits=16384, k=3)
    probed = bloom_probe(flt, c.select("c_custkey"), "c_custkey", m_bits=16384, k=3)
    return probed.where("maybe_member").select("c_custkey")

@q("q_shard_stats")
def q_shard_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded-export manifest: md5-deterministic 16-way shard assignment
    of the documents corpus plus per-shard size stats — the balance sheet
    a sharded dataset release ships with (operators/sampling.hash_shards).
    The assignment is map-side; the only exchange is the 16-group agg."""
    from fortune_500_financial_insights_pipeline_spark.operators.sampling import hash_shards

    d = load_table(spark, sf_dir, "documents")
    return (
        hash_shards(d, key_cols=["doc_id"], n_shards=16)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )

@q("q_kmv_distinct")
def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via a k=64 KMV bottom-k sketch — the
    mergeable cardinality sketch whose estimate is engine-portable md5
    arithmetic, so unlike HLL (q_hll_distinct, rows-only) it sits behind
    the exact-hash correctness gate (operators/kmv.py)."""
    from fortune_500_financial_insights_pipeline_spark.operators.kmv import kmv_estimate, kmv_sketch

    e = load_table(spark, sf_dir, "events")
    sk = kmv_sketch(e, ["event_type"], "user_id", k=64)
    return kmv_estimate(sk, ["event_type"], k=64)

@q("q_weighted_sample")
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """50 documents drawn by length-weighted sampling without replacement
    (Efraimidis–Spirakis md5-keyed, operators/sampling.weighted_sample):
    the reproducible quality-weighted corpus selection primitive."""
    from fortune_500_financial_insights_pipeline_spark.operators.sampling import weighted_sample

    d = load_table(spark, sf_dir, "documents")
    dw = d.withColumn("w", F.length("text"))
    return weighted_sample(dw, "w", ["doc_id"], n=50).select("doc_id", "es_score")

@q("q_histogram_equidepth")
def q_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram of order values (10 equal-count buckets): the
    optimizer-statistics form — bucket boundaries track the data density
    where equi-width (q_histogram) leaves most buckets empty under skew.
    ntile over a (value, key) total order is deterministic cross-engine;
    the single global window runs over (value, key) pairs only — at true
    scale swap in exact-percentile cut points (operators/..winsorize
    pattern) to avoid the one-partition sort, which is why the equi-width
    twin stays the default."""
    o = load_table(spark, sf_dir, "orders")
    w = W.orderBy(F.asc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select("o_orderkey", "o_totalprice")
        .withColumn("bucket", F.ntile(10).over(w))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )

@q("q_kmv_overlap")
def q_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimated customer overlap between 1995 and 1996 order cohorts from
    k=128 KMV sketches alone — year-over-year retention sizing without
    joining the two years (operators/kmv.kmv_overlap)."""
    from fortune_500_financial_insights_pipeline_spark.operators.kmv import kmv_overlap

    o = load_table(spark, sf_dir, "orders")
    y = F.year(F.to_date("o_orderdate"))
    a = o.where(y == 1995).select("o_custkey")
    b = o.where(y == 1996).select("o_custkey")
    return kmv_overlap(a, b, "o_custkey", k=128)

@q("q_salted_join")
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted fact⋈dim join + rollup (operators/skew.salted_join):
    result is identical to the plain join — the salt spreads each hot
    nation key over 16 shuffle buckets and never leaves the operator —
    so the oracle is simply the unsalted SQL. Gives the explicit-salting
    fallback (for skew AQE can't split) a driver-checked row."""
    from fortune_500_financial_insights_pipeline_spark.operators.skew import salted_join

    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    joined = salted_join(c, n, on=["c_nationkey"], salt=16)
    return joined.groupBy("n_name").agg(F.count(F.lit(1)).alias("n_customers"))

@q("q_attribution")
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-/last-touch attribution: for every purchase, the first and the
    most recent touch event (click/view) by the same user strictly before
    it — the conversion-credit query a marketing warehouse runs daily. One
    shuffle on user_id; both credits come from the same ignoreNulls window
    family over the interleaved event stream (no self-join, no as-of pass
    per touch type); purchases with no prior touch keep NULL credits."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    touch = F.when(
        F.col("event_type").isin("click", "view"), F.col("event_id")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    labeled = e.select(
        "event_id",
        "user_id",
        "event_type",
        F.first(touch, ignorenulls=True).over(w).alias("first_touch"),
        F.last(touch, ignorenulls=True).over(w).alias("last_touch"),
    )
    return labeled.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "first_touch", "last_touch"
    )

@q("q_cumulative_users")
def q_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users by day — the running-reach curve. Exact
    without any running COUNT(DISTINCT): each user contributes once at
    their first-seen day (one grouped min), then a cumulative sum over the
    per-day frame. The global window runs over days (bounded domain), not
    events; the heavy reduction is the partial-aggregated first-seen min."""
    e = load_table(spark, sf_dir, "events")
    first = e.select("user_id", F.to_date("ts").alias("day")).groupBy("user_id").agg(
        F.min("day").alias("first_day")
    )
    daily = first.groupBy("first_day").agg(F.count(F.lit(1)).alias("new_users"))
    w = W.orderBy("first_day").rowsBetween(W.unboundedPreceding, 0)
    return daily.select(
        F.date_format("first_day", "yyyy-MM-dd").alias("day"),
        F.sum("new_users").over(w).alias("cum_users"),
    )

@q("q_pop_growth")
def q_pop_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: fixed-point monthly sums (exact,
    partitioning-invariant), one lag over the month frame, growth in
    round-6 percent (NULL for the first month). The window is over months
    — a bounded domain — after the heavy aggregation collapsed orders."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_format(F.to_date("o_orderdate"), "yyyy-MM").alias("month")
    ).agg(F.round(dsum("o_totalprice"), 2).alias("revenue"))
    w = W.orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "month",
        "revenue",
        F.round((F.col("revenue") - prev) / prev * 100, 6).alias("growth_pct"),
    )

@q("q_dup_fraction")
def q_dup_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicate-text fraction (share of 8-word windows also
    found in other docs) — the thresholdable scalar the span detector
    (q_dup_spans) feeds a quality filter (operators/text.dup_fraction)."""
    from fortune_500_financial_insights_pipeline_spark.operators.text import dup_fraction

    d = load_table(spark, sf_dir, "documents")
    return dup_fraction(d, n=8)

@q("q_weighted_sample_grouped")
def q_weighted_sample_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 length-weighted draw per language — the per-source quota form
    of q_weighted_sample (operators/sampling.weighted_sample_per_group),
    WindowGroupLimit-capped so skewed sources can't flood the shuffle."""
    from fortune_500_financial_insights_pipeline_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    d = load_table(spark, sf_dir, "documents").withColumn("w", F.length("text"))
    return weighted_sample_per_group(
        d, ["lang"], "w", ["doc_id"], n_per_group=20
    ).select("lang", "doc_id", "es_score")

@q("q_bm25_search")
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 documents per query for four fixed bag-of-words queries —
    inverted-index retrieval over the q_bm25 postings (operators/tfidf
    .bm25_search): broadcast query-term probe, fixed-point score totals,
    WindowGroupLimit top-k per query. One query carries a term absent
    from the corpus to prove unmatched terms drop without nulling the
    score."""
    from fortune_500_financial_insights_pipeline_spark.operators.tfidf import bm25_search

    d = load_table(spark, sf_dir, "documents")
    queries = spark.createDataFrame(
        [
            (1, "spark join hash"),
            (2, "window agg sort"),
            (3, "stream batch merge"),
            (4, "customer query filter zzzmissingterm"),
        ],
        "query_id int, qtext string",
    )
    return bm25_search(d, queries, k=5)

@q("q_epoch_shuffle")
def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-1 deterministic global shuffle of the documents corpus into 8
    shards (operators/sampling.epoch_shuffle): md5 shard + epoch-salted
    in-shard position. The data-loader contract for sharded pretraining
    corpora — same permutation on every rerun, different permutation next
    epoch, never a single-partition window."""
    from fortune_500_financial_insights_pipeline_spark.operators.sampling import epoch_shuffle

    d = load_table(spark, sf_dir, "documents")
    return epoch_shuffle(d, ["doc_id"], n_shards=8, epoch=1).select(
        "doc_id", "shard", "pos"
    )

@q("q_mv_merge")
def q_mv_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view refresh (operators/incremental): the
    orders history is aggregated as three date-range batches into per-status
    mergeable states, folded, and finalized — and the oracle computes the
    SAME aggregate in ONE direct pass, so the hash check proves batch
    boundaries can't leak into an algebraic aggregate (fixed-point sums
    make the proof exact, not approximate)."""
    from fortune_500_financial_insights_pipeline_spark.operators.incremental import (
        finalize_state,
        grouped_state,
        merge_states,
    )

    o = load_table(spark, sf_dir, "orders")
    batches = [
        o.where(F.col("o_orderdate") < "1994-01-01"),
        o.where(
            (F.col("o_orderdate") >= "1994-01-01")
            & (F.col("o_orderdate") < "1996-07-01")
        ),
        o.where(F.col("o_orderdate") >= "1996-07-01"),
    ]
    states = [grouped_state(b, ["o_orderstatus"], "o_totalprice") for b in batches]
    return finalize_state(merge_states(states, ["o_orderstatus"]), ["o_orderstatus"])

@q("q_pq_topk")
def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN, whole path hash-checked: train 4 codebooks
    (k=4, one Lloyd iteration) over 16-dim subvectors, encode the corpus to
    4 codes/vector, answer the vec_id=0 query via the asymmetric-distance
    LUT, top-20 (operators/pq.py). The oracle replays train→encode→ADC in
    one CTE chain — exact because every step is fixed-point integer
    arithmetic."""
    from fortune_500_financial_insights_pipeline_spark.operators.pq import (
        pq_adc_topk,
        pq_train,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    books = _memo_trained(
        ("pq4x4", sf_dir), lambda: pq_train(emb, m=4, k=4, n_iter=1, dim=64)
    )
    qvec = list(emb.filter(F.col("vec_id") == 0).select("embedding").head()[0])
    # round 10 (r9 verdict item 1): the encoded codes ARE the stored index
    # — now a DECLARED memo artifact (_core.pq_codes, prepaid and recorded
    # as its own memo_s line by bench.py) instead of a checkpoint whose
    # materialization the bench min silently excluded.
    enc = pq_codes(spark, sf_dir, residual=False)
    return pq_adc_topk(enc, books, qvec, m=4, dim=64, k_top=20)

@q("q_ivfpq_topk")
def q_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ — the production ANN layout at 100 TB (Jégou et al. 2011):
    coarse quantizer routes the query to 2 of 8 trained cells
    (q_ivf_topk's exact chain), and the candidates inside those cells are
    scored from their 4 PQ codes via the asymmetric-distance LUT
    (q_pq_topk's exact chain) — so a query touches n_probe cells of codes,
    never raw vectors. In a materialized deployment codes are computed at
    index time and the cell filter prunes partitions; here encoding sits
    above the filter so Catalyst computes codes only for probed rows —
    identical results, same scan shape. Top-20 by exact integer ADC
    distance, fully hash-checked."""
    from fortune_500_financial_insights_pipeline_spark.operators.kmeans import kmeans_centroids
    from fortune_500_financial_insights_pipeline_spark.operators.pq import (
        pq_adc_topk,
        pq_encode,
        pq_train,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import (
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
    books = _memo_trained(
        ("pq4x4", sf_dir), lambda: pq_train(emb, m=4, k=4, n_iter=1, dim=64)
    )
    cand = indexed.filter(F.col("cell").isin(probe)).drop("cell")
    enc = pq_encode(cand, books, m=4, dim=64)
    return pq_adc_topk(enc, books, qvec, m=4, dim=64, k_top=20)

@q("q_ivfpq_residual_topk")
def q_ivfpq_residual_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual IVF-PQ — the form production ANN indexes actually ship
    (Jégou et al. 2011 §III): PQ codebooks are trained on residuals to the
    assigned coarse centroid (residuals concentrate near zero, so the same
    m·k code budget quantizes far more finely), the stored row is
    (cell, codes), and the query builds one ADC LUT PER PROBED CELL from
    its own query residual. Coarse chain = q_ivf_topk's (k=8, 2 Lloyd
    iterations, round-6 routing, n_probe=2); residual PQ = m=4, k=4, one
    iteration. Exact integer arithmetic end to end — hash-checked."""
    from fortune_500_financial_insights_pipeline_spark.operators.kmeans import kmeans_centroids
    from fortune_500_financial_insights_pipeline_spark.operators.pq import (
        ivfpq_residual_topk,
        pq_train_residual,
    )
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    centroids = _memo_trained(
        ("kmeans8x2", sf_dir), lambda: kmeans_centroids(emb, k=8, n_iter=2)
    )
    qvec, probe = _memo_trained(
        ("q0probe8x2", sf_dir), lambda: _qvec_probe(emb, centroids)
    )
    books = _memo_trained(
        ("pqres4x4", sf_dir),
        lambda: pq_train_residual(emb, centroids, m=4, k=4, n_iter=1, dim=64),
    )
    # round 10 (r9 verdict item 1): (cell, codes) is "the stored row" —
    # index-time state, now a DECLARED memo artifact (_core.pq_codes,
    # its own recorded memo_s line) instead of a silent checkpoint
    enc = pq_codes(spark, sf_dir, residual=True)
    return ivfpq_residual_topk(
        enc, books, centroids, qvec, probe, m=4, dim=64, k_top=20
    )

@q("q_bpe_train")
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three BPE merges learned from the documents corpus
    (operators/bpe.bpe_train): word-frequency table → per-iteration pair
    count / deterministic argmax / leftmost-greedy merge. The oracle
    replays the full training trajectory relationally (gaps-islands parity
    handles overlapping 'aaa' runs), so the learned vocabulary itself is
    hash-checked, not just row counts. Table comes from the per-process
    model memo (_core.bpe_merges_3, shared with q_bpe_segment and
    q_tokenizer_fertility)."""
    from fortune_500_financial_insights_pipeline_spark.queries._core import bpe_merges_3

    return spark.createDataFrame(
        bpe_merges_3(spark, sf_dir),
        "step int, lhs string, rhs string, pair_count bigint",
    )

@q("q_bpe_segment")
def q_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize docs 0-49 with the 3 learned merges (operators/bpe
    .bpe_segment) — per-document BPE token counts, the encode half of the
    tokenizer lifecycle, applied as chained map-side HOF projections.
    Merges come from the per-process model memo (_core.bpe_merges_3)."""
    from fortune_500_financial_insights_pipeline_spark.operators.bpe import bpe_segment
    from fortune_500_financial_insights_pipeline_spark.queries._core import bpe_merges_3

    d = load_table(spark, sf_dir, "documents")
    merges = [(lhs, rhs) for _, lhs, rhs, _ in bpe_merges_3(spark, sf_dir)]
    return bpe_segment(d.filter(F.col("doc_id") < 50), merges)

@q("q_ivfpq_rerank")
def q_ivfpq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full production retrieval stack: residual IVF-PQ ADC shortlists
    50 candidates from the probed cells (codes only — no raw vectors
    touched), then an EXACT cosine rerank over just those 50 raw vectors
    picks the final top-20. At 100 TB the rerank reads 50 rows by id —
    the expensive exactness is paid only where it changes the answer.
    Shortlist is a broadcast semi-join back to the embeddings table."""
    from fortune_500_financial_insights_pipeline_spark.operators.kmeans import kmeans_centroids
    from fortune_500_financial_insights_pipeline_spark.operators.pq import (
        ivfpq_residual_topk,
        pq_train_residual,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import (
        cosine_similarity,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    centroids = _memo_trained(
        ("kmeans8x2", sf_dir), lambda: kmeans_centroids(emb, k=8, n_iter=2)
    )
    qvec, probe = _memo_trained(
        ("q0probe8x2", sf_dir), lambda: _qvec_probe(emb, centroids)
    )
    books = _memo_trained(
        ("pqres4x4", sf_dir),
        lambda: pq_train_residual(emb, centroids, m=4, k=4, n_iter=1, dim=64),
    )
    # same declared index-state memo as q_ivfpq_residual_topk (round 10)
    enc = pq_codes(spark, sf_dir, residual=True)
    short = ivfpq_residual_topk(
        enc, books, centroids, qvec, probe, m=4, dim=64, k_top=50
    ).select("vec_id")
    qarr = F.array(*[F.lit(float(x)) for x in qvec])
    return (
        emb.join(F.broadcast(short), "vec_id")
        .select(
            "vec_id",
            F.round(cosine_similarity(F.col("embedding"), qarr), 6).alias("sim"),
        )
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(20)
    )

@q("q_late_interaction")
def q_late_interaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-vector late-interaction retrieval (operators/similarity
    .late_interaction_topk): labels act as multi-vector documents, vectors
    0-3 as the query's token embeddings; score = Σ per-query-token MaxSim,
    top-5 labels. Broadcast query grid, partial-agged MaxSim, fixed-point
    score sum — hash-exact."""
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import (
        late_interaction_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    qvecs = [
        list(r["embedding"])
        for r in emb.filter(F.col("vec_id") < 4).orderBy("vec_id").collect()
    ]
    return late_interaction_topk(emb, qvecs, k=5)

@q("q_embed_neardup_portable")
def q_embed_neardup_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup detection with the bucketing itself hash-checked
    — the oracle-exact upgrade of q_embed_neardup_lsh (operators/similarity
    .lsh_neardup_pairs_portable): integer-dot hyperplane signatures, bucket
    equi-join, exact fixed-point cosine verify at >= 0.9. The fixture
    embeddings are near-orthogonal (max pairwise cosine 0.48), so the query
    PLANTS 50 near-duplicates (vectors 0-49 rescaled by 1.02 under shifted
    ids — cosine 1.0, scale-invariant) and the detector must return exactly
    those pairs and nothing else; the oracle replays the planting."""
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import (
        lsh_neardup_pairs_portable,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    planted = emb.where(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.02)).alias("embedding"),
    )
    return lsh_neardup_pairs_portable(
        emb.unionByName(planted), dim=64, n_planes=16, min_cosine=0.9
    )

@q("q_minhash_portable")
def q_minhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs with the ENTIRE pipeline hash-checked —
    the oracle-exact certification of q_minhash_neardup's algorithm
    (operators/minhash.minhash_neardup_pairs_portable): md5 double-hashed
    16-seed signatures, 4-band bucketing, within-bucket pair expansion,
    exact-integer Jaccard verify at >= 0.2. Finds the identical pair set
    the xxhash64 production form finds on the fixtures (by test)."""
    from fortune_500_financial_insights_pipeline_spark.operators.minhash import (
        minhash_neardup_pairs_portable,
    )

    d = load_table(spark, sf_dir, "documents")
    return minhash_neardup_pairs_portable(
        d, id_col="doc_id", text_col="text", n_hashes=16, bands=4, min_jaccard=0.2
    )
