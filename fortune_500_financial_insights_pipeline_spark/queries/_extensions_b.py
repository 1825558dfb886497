"""Round-2 extensions B: statistics, experimentation, forecasting.

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
    _scored_labeled_docs,
    q,
)


@q("q_skipgram_pairs")
def q_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram training pairs from the deterministic walk corpus
    (DeepWalk/node2vec step 2: walks → (center, context) pairs within a
    ±2 window): two lead() columns over the per-walk step sort, four
    union legs (both directions, both distances), one pair-count
    aggregate — the graph-to-sequence-to-pairs hop that feeds embedding
    training. Reuses q_random_walk's oracle-exact corpus, so the pair
    set is hash-checked end to end."""
    walks = QUERIES["q_random_walk"](spark, sf_dir)
    w = W.partitionBy("walk_id").orderBy("step")
    p = walks.select(
        "node",
        F.lead("node", 1).over(w).alias("__n1"),
        F.lead("node", 2).over(w).alias("__n2"),
    )
    # round 9: the four direction/distance legs are an inline struct
    # array exploded once — the union-of-4 form re-evaluated the lead()
    # window subtree per leg (4 window passes in the plan for the same
    # 25-row sort); rows emitted are identical (null contexts filtered
    # exactly where the legs' isNotNull guards were)
    leg = lambda c, x, dist: F.struct(  # noqa: E731
        c.alias("center"), x.alias("context"), F.lit(dist).alias("dist")
    )
    node, n1, n2 = F.col("node"), F.col("__n1"), F.col("__n2")
    structs = F.array(
        leg(node, n1, 1), leg(n1, node, 1), leg(node, n2, 2), leg(n2, node, 2)
    )
    pairs = (
        p.select(
            F.explode(
                F.filter(
                    structs,
                    lambda s: s["center"].isNotNull() & s["context"].isNotNull(),
                )
            ).alias("__s")
        )
        .select("__s.center", "__s.context", "__s.dist")
    )
    return (
        pairs.groupBy("center", "context", "dist")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("center", "context", "dist")
    )

@q("q_bootstrap_ci")
def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic bootstrap confidence interval for the mean order
    value per priority class: B=32 md5-seeded half-subsamples (row in
    resample b iff u(md5(b|key)) < 0.5 — partition-invariant, so the
    WHOLE resampling plan is hash-checked, unlike rand()-seeded
    bootstraps), exact fixed-point subsample means, CI = exact
    interpolated [2.5%, 97.5%] percentiles of the B means. Cost model:
    one B-way row explode with map-side partial aggregation — the
    shuffle carries only (group × B) mean states."""
    o = load_table(spark, sf_dir, "orders")
    B = 32
    b = spark.range(B).select(F.col("id").cast("int").alias("b"))
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("b").cast("string"),
                        F.col("o_orderkey").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(1 << 60))
    )
    sampled = o.crossJoin(F.broadcast(b)).where(u < 0.5)
    means = sampled.groupBy("o_orderpriority", "b").agg(
        davg("o_totalprice").alias("__m")
    )
    return (
        means.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_resamples"),
            F.round(davg("__m"), 6).alias("boot_mean"),
            F.round(F.percentile("__m", F.lit(0.025)), 6).alias("ci_lo"),
            F.round(F.percentile("__m", F.lit(0.975)), 6).alias("ci_hi"),
        )
        .orderBy("o_orderpriority")
    )

@q("q_rag_context_pack")
def q_rag_context_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG context assembly: for each query, walk the RRF-fused top-10 in
    rank order and keep documents while the running whitespace-token
    total stays within a 256-token budget (greedy prefix — the standard
    context packer). One running-sum window over ten-row-per-query
    lists on top of the already-oracled q_rrf_fusion chain: retrieval →
    fusion → budget cut, hash-checked end to end."""
    from fortune_500_financial_insights_pipeline_spark.operators import text as TX

    # round 10 (r9 verdict item 1): the r9 localCheckpoint here fed ONE
    # consumer, so within an action it deduplicated nothing — its only
    # effect was that bench passes 2-3 read 30 cached rows instead of
    # running retrieval ("the 20.2x headline is mostly a 30-row cache
    # read"). Removed: every execution now runs the full two-ranker
    # retrieval + fusion chain; the real r9 wins (broadcast fused side,
    # token_count hoisted above the join) remain below.
    fused = QUERIES["q_rrf_fusion"](spark, sf_dir).select(
        "query_id", "doc_id", "rank"
    )
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    w = (
        W.partitionBy("query_id")
        .orderBy("rank")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    packed = (
        # ten rows per query by construction — broadcast so the corpus
        # scan streams instead of shuffling; token_count is computed
        # ABOVE the join, so the tokenizer split runs only on the ~30
        # surviving rows instead of every document in the corpus (the
        # projection below a broadcast join is evaluated per probe row)
        F.broadcast(fused).join(d, "doc_id")
        .withColumn("tokens", TX.token_count("text"))
        .drop("text")
        .withColumn("cum_tokens", F.sum("tokens").over(w).cast("long"))
        .where(F.col("cum_tokens") <= 256)
    )
    return packed.select(
        "query_id", "doc_id", "rank", F.col("tokens").cast("long").alias("tokens"),
        "cum_tokens",
    ).orderBy("query_id", "rank")

@q("q_interarrival")
def q_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival time distribution per event type: exact interpolated
    p50/p90 of per-user gaps (microsecond epoch lag diffs, attributed to
    the later event) — the number that tunes session timeouts and
    capacity planning. One lag window on the user key, one percentile
    aggregate per type."""
    e = load_table(spark, sf_dir, "events")
    # epoch microseconds are monotone with ts — same sort, one column
    w = W.partitionBy("user_id").orderBy("__us")
    gaps = (
        e.select("user_id", "event_type", F.unix_micros("ts").alias("__us"))
        .withColumn("__gap", F.col("__us") - F.lag("__us").over(w))
        .where(F.col("__gap").isNotNull())
        .select("event_type", (F.col("__gap").cast("double") / 1000000).alias("__s"))
    )
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.round(F.percentile("__s", F.lit(0.5)), 6).alias("p50_gap_s"),
            F.round(F.percentile("__s", F.lit(0.9)), 6).alias("p90_gap_s"),
        )
        .orderBy("event_type")
    )

@q("q_lorenz_deciles")
def q_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve points behind q_gini: customers in revenue deciles
    (deterministic ntile — value asc, custkey tiebreak), per-decile
    revenue and cumulative share — the 'top 10% of customers hold X% of
    revenue' dashboard row. Customer totals are exact fixed point; the
    decile cut is one rank window over the customer-count-sized
    aggregate."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(dsum("o_totalprice").alias("__rev"))
    wn = W.orderBy(F.asc("__rev"), F.asc("o_custkey"))
    dec = per_cust.withColumn("decile", F.ntile(10).over(wn))
    per_dec = dec.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_cust"),
        dsum("__rev").alias("revenue"),
    )
    wc = W.orderBy("decile").rowsBetween(W.unboundedPreceding, W.currentRow)
    tot = per_dec.agg(dsum("revenue").alias("__t"))
    return (
        per_dec.withColumn("__cum", F.sum(F.round(F.col("revenue") * 1000000).cast("long")).over(wc))
        .crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_cust",
            F.round("revenue", 6).alias("revenue"),
            F.round(
                (F.col("__cum").cast("double") / 1000000) / F.col("__t"), 6
            ).alias("cum_share"),
        )
        .orderBy("decile")
    )

@q("q_k_anonymity")
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit of the customer table under the
    quasi-identifier (nation, market segment): equivalence-class sizes,
    how many classes fall below k=5, the share of rows re-identifiable
    through them, and the minimum l (distinct account-balance bands per
    class) — the privacy gate next to PII redaction (q_redact_pii
    scrubs direct identifiers; this measures indirect linkability).
    Two cardinality-bounded aggregates, no row-level output."""
    c = load_table(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / 1000).cast("long")
    classes = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("__sz"),
        F.countDistinct(band).alias("__l"),
    )
    total = c.agg(F.count(F.lit(1)).alias("__n"))
    return classes.crossJoin(F.broadcast(total)).agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.min("__sz").cast("long").alias("min_class_size"),
        F.sum(F.when(F.col("__sz") < 5, 1).otherwise(0)).cast("long").alias(
            "n_classes_below_k"
        ),
        F.sum(F.when(F.col("__sz") < 5, F.col("__sz")).otherwise(0))
        .cast("long")
        .alias("n_rows_at_risk"),
        F.round(
            F.sum(F.when(F.col("__sz") < 5, F.col("__sz")).otherwise(0)).cast(
                "double"
            )
            / F.max("__n"),
            6,
        ).alias("risk_frac"),
        F.min("__l").cast("long").alias("min_l_diversity"),
    )

@q("q_adamic_adar")
def q_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar related-supplier recommendation over the bipartite
    trade graph: for each watchlist supplier (key <= 100), score every
    other supplier by sum_z 1/ln(deg z) over shared CUSTOMERS z (rarer
    mutual customers weigh more; Adamic & Adar 2003), top-20 pairs.
    Scale shape: the two-hop join is keyed on the WITNESS customer and
    the candidate side is watchlist-restricted, so fan-out is
    sum over watchlist of deg(supplier)*deg(customer) — never
    supplier x supplier (the first cut ran AA on the dense co-activity
    graph: 403M two-hop rows at sf0.1 — a dense graph is the wrong
    input for AA on any engine). Single-supplier customers are pruned
    before the fan-out (ln(1)=0, and a deg-1 witness witnesses
    nothing)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_orderkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    sc = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("l_suppkey").alias("s"), F.col("o_custkey").alias("c"))
        .distinct()
        # three consumers (witness degrees + both hop legs) — materialize
        # the incidence list once (setjoin's lesson)
        .localCheckpoint(eager=False)
    )
    cdeg = (
        sc.groupBy("c").agg(F.count(F.lit(1)).alias("deg")).where(F.col("deg") >= 2)
    )
    # the watchlist leg is bounded by construction (suppliers <= 100 ×
    # their customers) — broadcast it through both joins so the
    # corpus-sized incidence list and the degree frame never reshuffle
    # for it (the checkpointed RDD scan has no stats, so the planner
    # defaulted to sort-merge exchanges here)
    e1 = (
        F.broadcast(sc.where(F.col("s") <= 100))
        .join(cdeg, "c")
        .select(F.col("s").alias("pa"), F.col("c").alias("z"), "deg")
        # round 10 (r9 verdict item 1): the r9 localCheckpoint here had ONE
        # consumer — within an action it deduplicated nothing; its only
        # effect was cross-pass caching in the bench. Removed: every
        # execution re-runs cdeg + this scan; `sc`'s checkpoint above (3
        # consumers per action) is the legitimate cut and stays.
    )
    e2 = sc.select(F.col("c").alias("z"), F.col("s").alias("pb"))
    hop2 = F.broadcast(e1).join(e2, "z").where(F.col("pa") != F.col("pb"))
    from fortune_500_financial_insights_pipeline_spark.functions.deterministic import dsum as _ds

    return (
        hop2.groupBy("pa", "pb")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.round(_ds(F.lit(1.0) / F.log(F.col("deg").cast("double"))), 6).alias(
                "aa"
            ),
        )
        .orderBy(F.desc("aa"), F.asc("pa"), F.asc("pb"))
        .limit(20)
    )

@q("q_cuped")
def q_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng et al., WSDM
    2013): per-user pre-period spend (before Jan 16) as the covariate,
    post-period spend as the metric, user-parity as assignment.
    θ = cov(X,Y)/var(X) from exact fixed-point moments; the adjusted
    effect needs only group means (Ȳ_T − θX̄_T) − (Ȳ_C − θX̄_C), and the
    variance-reduction share is ρ² — all closed-form over one user-level
    aggregate + one moment fold, no row-level second pass."""
    e = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    per_user = e.groupBy("user_id").agg(
        dsum(F.when(F.col("ts") < cut, F.col("value")).otherwise(0.0)).alias("__x"),
        dsum(F.when(F.col("ts") >= cut, F.col("value")).otherwise(0.0)).alias("__y"),
    )
    g = per_user.withColumn("__t", (F.col("user_id") % 2 == 0).cast("int"))
    m = g.agg(
        F.count(F.lit(1)).alias("n_users"),
        dsum("__x").alias("__sx"),
        dsum("__y").alias("__sy"),
        dsum(F.col("__x") * F.col("__y")).alias("__sxy"),
        dsum(F.col("__x") * F.col("__x")).alias("__sxx"),
        dsum(F.col("__y") * F.col("__y")).alias("__syy"),
        F.sum("__t").cast("double").alias("__nt"),
        dsum(F.when(F.col("__t") == 1, F.col("__x")).otherwise(0.0)).alias("__sxt"),
        dsum(F.when(F.col("__t") == 1, F.col("__y")).otherwise(0.0)).alias("__syt"),
    )
    n = F.col("n_users").cast("double")
    covxy = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    varx = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    vary = n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    theta = covxy / varx
    nt = F.col("__nt")
    nc = n - nt
    xbar_t = F.col("__sxt") / nt
    ybar_t = F.col("__syt") / nt
    xbar_c = (F.col("__sx") - F.col("__sxt")) / nc
    ybar_c = (F.col("__sy") - F.col("__syt")) / nc
    effect_raw = ybar_t - ybar_c
    effect_cuped = (ybar_t - theta * xbar_t) - (ybar_c - theta * xbar_c)
    rho2 = covxy * covxy / (varx * vary)
    return m.select(
        "n_users",
        F.round(theta, 6).alias("theta"),
        F.round(effect_raw, 6).alias("effect_raw"),
        F.round(effect_cuped, 6).alias("effect_cuped"),
        F.round(rho2, 6).alias("var_reduction"),
    )

@q("q_hash_collision_qa")
def q_hash_collision_qa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing load audit for the 256-bucket hashed classifier
    (operators/text.classifier_score): how many buckets the corpus
    vocabulary actually occupies, the max/avg bucket load and the skew
    ratio — the collision QA that decides whether the hash width is
    large enough before anyone trusts hashed-feature scores. Bucket
    arithmetic is the engine-shared md5-digit expression, so the audit
    is hash-exact."""
    from fortune_500_financial_insights_pipeline_spark.operators.text import (
        _feature_bucket_sql,
    )

    d = load_table(spark, sf_dir, "documents")
    terms = (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .where(F.col("term") != "")
        .distinct()
    )
    bucketed = terms.select(F.expr(_feature_bucket_sql("term")).alias("b"))
    loads = bucketed.groupBy("b").agg(F.count(F.lit(1)).alias("load"))
    return loads.agg(
        F.sum("load").cast("long").alias("n_terms"),
        F.count(F.lit(1)).alias("n_buckets_used"),
        F.max("load").cast("long").alias("max_load"),
        F.round(F.sum("load").cast("double") / F.count(F.lit(1)), 6).alias(
            "avg_load"
        ),
        F.round(
            F.max("load").cast("double")
            / (F.sum("load").cast("double") / F.count(F.lit(1))),
            6,
        ).alias("skew_ratio"),
    )

@q("q_markov_attribution")
def q_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect attribution (operators/paths.
    markov_removal_attribution): journeys = per-user event sequences
    truncated at the first purchase (START → … → CONV/NULL), first-order
    chain probabilities as 1e6 fixed-point integers, absorption
    probability from 24 value-iteration steps run on all five scenarios
    (full + one per removed channel) in ONE union-tagged frame — the
    multi-touch attribution model that, unlike last-touch, credits
    assist channels. Every step is integer arithmetic with truncating
    division, so the whole trajectory (and therefore the credit split)
    is hash-exact."""
    from fortune_500_financial_insights_pipeline_spark.operators.paths import (
        markov_removal_attribution,
    )

    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    )
    firstp = (
        ordered.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("rn").alias("prn"))
    )
    j = ordered.join(firstp, "user_id", "left")
    pre = j.where(F.col("prn").isNull() | (F.col("rn") < F.col("prn")))
    wj = W.partitionBy("user_id").orderBy("rn")
    internal = pre.select(
        F.coalesce(F.lag("event_type").over(wj), F.lit("START")).alias("from_state"),
        F.col("event_type").alias("to_state"),
    )
    users = j.groupBy("user_id").agg(F.max("prn").alias("prn"))
    lastpre = pre.groupBy("user_id").agg(F.max("rn").alias("mrn"))
    last_type = (
        pre.join(lastpre, "user_id")
        .where(F.col("rn") == F.col("mrn"))
        .select("user_id", F.col("event_type").alias("__lt"))
    )
    term = (
        users.join(last_type, "user_id", "left")
        .select(
            F.coalesce("__lt", F.lit("START")).alias("from_state"),
            F.when(F.col("prn").isNotNull(), "CONV").otherwise("NULL").alias(
                "to_state"
            ),
        )
    )
    pairs = internal.unionByName(term)
    counts = pairs.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.groupBy("from_state").agg(F.sum("n").alias("__tot"))
    trans = counts.join(F.broadcast(totals), "from_state").select(
        "from_state",
        "to_state",
        F.round(F.col("n").cast("double") / F.col("__tot") * 1000000)
        .cast("long")
        .alias("t6"),
    )
    return markov_removal_attribution(
        trans, ["click", "error", "signup", "view"], k_iter=24
    )

@q("q_shapley_attribution")
def q_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley-value channel attribution (the coalition counterpart to
    q_markov_attribution): exposure sets are 4-bit masks (bit_or over
    each user's pre-purchase channels), the coalition value v(S) is the
    conversion rate of users exposed to EXACTLY S, and
    φ_i = Σ_{S∌i} w(|S|)·(v(S∪i) − v(S)) with the factorial weights
    embedded as 1e6 fixed-point literals. The whole computation past the
    per-user mask aggregate runs on a 16-row coalition frame × 4
    channels — exact long arithmetic end to end, and the efficiency
    axiom (Σφ = v(full) − v(∅)) is test-pinned."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    )
    firstp = (
        ordered.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("rn").alias("prn"))
    )
    j = ordered.join(firstp, "user_id", "left")
    bit = (
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "error", 2)
        .when(F.col("event_type") == "signup", 4)
        .when(F.col("event_type") == "view", 8)
        .otherwise(0)
    )
    per_user = (
        j.select(
            "user_id",
            F.when(
                F.col("prn").isNull() | (F.col("rn") < F.col("prn")), bit
            ).otherwise(0).alias("__b"),
            F.col("prn").isNotNull().cast("int").alias("__conv"),
        )
        .groupBy("user_id")
        .agg(
            F.expr("bit_or(__b)").alias("mask"),
            F.max("__conv").alias("conv"),
        )
    )
    vset = per_user.groupBy("mask").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("conv").alias("n_conv"),
    )
    allmasks = spark.range(16).select(F.col("id").cast("int").alias("mask"))
    v = (
        allmasks.join(vset, "mask", "left")
        .select(
            "mask",
            F.coalesce(
                F.round(
                    F.col("n_conv").cast("double")
                    / F.col("n_users")
                    * 1000000
                ).cast("long"),
                F.lit(0),
            ).alias("v6"),
        )
        .localCheckpoint(eager=False)
    )
    # factorial weights k!(n-1-k)!/n! for n=4, k=|S| in 0..3, at 1e6 scale
    wlits = [round(f * 1000000) for f in (1 / 4, 1 / 12, 1 / 12, 1 / 4)]
    warr = F.array(*[F.lit(x) for x in wlits])
    ch = spark.createDataFrame(
        [("click", 1), ("error", 2), ("signup", 4), ("view", 8)],
        "channel string, bit int",
    )
    base = v.crossJoin(F.broadcast(ch)).where(
        F.expr("(mask & bit) = 0")
    )
    vwith = v.select(F.col("mask").alias("__mw"), F.col("v6").alias("__vw"))
    terms = base.join(
        vwith, F.expr("(mask | bit)") == F.col("__mw")
    ).select(
        "channel",
        (
            F.element_at(warr, F.expr("bit_count(mask)") + 1)
            * (F.col("__vw") - F.col("v6"))
        ).alias("__t"),
    )
    phi = terms.groupBy("channel").agg(F.sum("__t").alias("__phi"))
    tot = phi.agg(F.sum("__phi").alias("__tot"))
    return (
        phi.crossJoin(F.broadcast(tot))
        .select(
            "channel",
            F.round(F.col("__phi").cast("double") / 1e12, 6).alias("shapley_value"),
            F.round(
                F.when(
                    F.col("__tot") != 0,
                    F.col("__phi").cast("double") / F.col("__tot"),
                ),
                6,
            ).alias("attribution_share"),
        )
        .orderBy("channel")
    )

@q("q_eventually_follows")
def q_eventually_follows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Process-mining eventually-follows matrix: for each ordered pair of
    event types (a, b), in how many user journeys does a occur before
    some later b (first-a position < last-b position) — the causal-order
    view that q_transition_matrix's directly-follows counts miss (a → x
    → b never shows under adjacency). Per user the state collapses to
    ≤5 (type, first_pos, last_pos) rows, so the pair expansion is
    25-bounded per user — never event×event."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    spans = (
        e.select("user_id", "event_type", F.row_number().over(w).alias("rn"))
        .groupBy("user_id", "event_type")
        .agg(F.min("rn").alias("__first"), F.max("rn").alias("__last"))
    )
    a = spans.select(
        "user_id", F.col("event_type").alias("type_a"), F.col("__first").alias("__fa")
    )
    b = spans.select(
        "user_id", F.col("event_type").alias("type_b"), F.col("__last").alias("__lb")
    )
    total = e.agg(F.countDistinct("user_id").alias("__n"))
    return (
        a.join(b, "user_id")
        .where(F.col("__fa") < F.col("__lb"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_journeys"))
        .crossJoin(F.broadcast(total))
        .select(
            "type_a",
            "type_b",
            "n_journeys",
            F.round(F.col("n_journeys").cast("double") / F.col("__n"), 6).alias(
                "support"
            ),
        )
        .orderBy("type_a", "type_b")
    )

@q("q_transition_latency")
def q_transition_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Process-mining performance view: p50/p90 seconds between
    consecutive events per directly-follows pair (from, to) — where the
    journey stalls. One lag window (both type and microsecond epoch ride
    the same sort), exact interpolated percentiles per pair."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("__us", "event_id")
    src = e.select(
        "user_id", "event_type", "event_id", F.unix_micros("ts").alias("__us")
    )
    gaps = (
        src.select(
            F.lag("event_type").over(w).alias("from_type"),
            F.col("event_type").alias("to_type"),
            ((F.col("__us") - F.lag("__us").over(w)).cast("double") / 1000000).alias(
                "__s"
            ),
        )
        .where(F.col("from_type").isNotNull())
    )
    return (
        gaps.groupBy("from_type", "to_type")
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.round(F.percentile("__s", F.lit(0.5)), 6).alias("p50_s"),
            F.round(F.percentile("__s", F.lit(0.9)), 6).alias("p90_s"),
        )
        .orderBy("from_type", "to_type")
    )

@q("q_ivf_balance")
def q_ivf_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index health: per-cell occupancy of the 16-cell md5-seeded
    coarse quantizer (cell sizes and corpus share) — the balance audit an
    ANN index publishes after every build/append, because one hot cell
    turns n_probe routing back into a linear scan. Assignment is the
    oracle-reproducible portable routing (ivf_index_portable); the audit
    is one cell-count aggregate."""
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import (
        ivf_index_portable,
        md5_sample_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    centroids = md5_sample_centroids(emb, k=16)
    cells = ivf_index_portable(emb, centroids).groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_vecs")
    )
    tot = cells.agg(F.sum("n_vecs").alias("__t"))
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            F.col("cell").cast("long").alias("cell"),
            "n_vecs",
            F.round(F.col("n_vecs").cast("double") / F.col("__t"), 6).alias("share"),
        )
        .orderBy("cell")
    )

@q("q_seasonal_anomalies")
def q_seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal anomaly flags: days whose decomposition residual
    (q_seasonal_decompose) sits more than 3 robust deviations (MAD) from
    the median residual — the STL-residual rule ops dashboards alarm on,
    composed on the already-oracled decomposition. The stats pass is one
    two-stage exact-percentile aggregate over the interior-day frame."""
    sd = QUERIES["q_seasonal_decompose"](spark, sf_dir)
    s1 = sd.agg(F.percentile("residual", F.lit(0.5)).alias("__med"))
    s2 = (
        sd.crossJoin(F.broadcast(s1))
        .agg(
            F.percentile(F.abs(F.col("residual") - F.col("__med")), F.lit(0.5)).alias(
                "__mad"
            ),
            F.max("__med").alias("__med"),
        )
    )
    return (
        sd.crossJoin(F.broadcast(s2))
        .where(F.abs(F.col("residual") - F.col("__med")) > 3 * F.col("__mad"))
        .select(
            "d",
            "value",
            F.round("residual", 6).alias("residual"),
            F.round(F.abs(F.col("residual") - F.col("__med")), 6).alias("deviation"),
            F.round(3 * F.col("__mad"), 6).alias("threshold"),
        )
        .orderBy("d")
    )

@q("q_sax_motifs")
def q_sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX motif mining (Lin et al. 2003) over supplier price series:
    z-normalize (exact fixed-point moments, shared-text σ), PAA-average
    4-day blocks, map to a 4-letter alphabet at the N(0,1) quartile
    breakpoints (±0.6745, 0), slide a 3-symbol word window, and report
    words recurring ≥2 times within a series — the repeated-shape
    (motif) detector behind pattern screening. Everything after the
    daily aggregate runs on block-count-sized frames; symbols are
    round-6 compares against shared literals, so the discretization is
    hash-exact."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_suppkey") <= 10)
    daily = li.groupBy(
        "l_suppkey", F.date_format("l_shipdate", "yyyy-MM-dd").alias("day")
    ).agg(F.round(davg("l_extendedprice"), 6).alias("close"))
    stats = daily.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("__n"),
        dsum("close").alias("__s"),
        dsum(F.col("close") * F.col("close")).alias("__ss"),
    )
    nn = F.col("__n").cast("double")
    sigma = F.sqrt((nn * F.col("__ss") - F.col("__s") * F.col("__s")) / (nn * nn))
    wd = W.partitionBy("l_suppkey").orderBy("day")
    z = F.round(
        (F.col("close") - F.col("__s") / nn) / sigma, 6
    )
    blocks = (
        daily.join(F.broadcast(stats), "l_suppkey")
        .withColumn("__rn", F.row_number().over(wd))
        .select(
            "l_suppkey",
            F.expr("(__rn - 1) div 4").alias("__blk"),
            z.alias("__z"),
        )
        .groupBy("l_suppkey", "__blk")
        .agg(F.round(davg("__z"), 6).alias("__paa"))
    )
    sym = (
        F.when(F.col("__paa") < -0.6745, "a")
        .when(F.col("__paa") < 0.0, "b")
        .when(F.col("__paa") < 0.6745, "c")
        .otherwise("d")
    )
    wb = W.partitionBy("l_suppkey").orderBy("__blk")
    words = (
        blocks.select("l_suppkey", "__blk", sym.alias("__sym"))
        .select(
            "l_suppkey",
            F.concat(
                F.col("__sym"),
                F.lead("__sym", 1).over(wb),
                F.lead("__sym", 2).over(wb),
            ).alias("word"),
        )
        .where(F.col("word").isNotNull())
    )
    return (
        words.groupBy("l_suppkey", "word")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .where(F.col("n_occurrences") >= 2)
        .orderBy("l_suppkey", "word")
    )

@q("q_mixture_kl")
def q_mixture_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mixture divergence report: per-source whitespace-token
    share vs the uniform 1/20 target, with the per-source KL(p‖q) term
    p·log2(p/q) — the one-number drift gauge a data-mixing pipeline
    (q_mix_sources sets the target; this audits the delivered corpus)
    alarms on. Shares are exact count ratios rounded to 6dp before the
    log, so every term is hash-exact."""
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.sum(F.size(F.split(F.col("text"), " "))).cast("long").alias("n_tokens")
    )
    tot = per.agg(F.sum("n_tokens").alias("__t"))
    p = F.round(F.col("n_tokens").cast("double") / F.col("__t"), 6)
    q_target = F.lit(0.05)
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_tokens",
            p.alias("share"),
            F.round(p * F.log2(p / q_target), 9).alias("kl_term"),
        )
        .orderBy("source")
    )

@q("q_pr_curve")
def q_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall/F1 sweep of the hashed-feature classifier at nine
    thresholds — the operating-point table next to q_auc (which ranks)
    and q_calibration (which checks honesty): one conditional aggregate
    per threshold over the shared scored frame, ratios rounded to 6dp
    before F1 so every cell is hash-exact."""
    scored = _scored_labeled_docs(spark, sf_dir)
    thr = spark.createDataFrame(
        [(t / 10.0,) for t in range(1, 10)], "threshold double"
    )
    j = scored.crossJoin(F.broadcast(thr))
    agg = j.groupBy("threshold").agg(
        F.sum(F.when((F.col("prob") >= F.col("threshold")) & (F.col("label") == 1), 1).otherwise(0)).cast("long").alias("tp"),
        F.sum(F.when((F.col("prob") >= F.col("threshold")) & (F.col("label") == 0), 1).otherwise(0)).cast("long").alias("fp"),
        F.sum(F.when((F.col("prob") < F.col("threshold")) & (F.col("label") == 1), 1).otherwise(0)).cast("long").alias("fn"),
    )
    p6 = F.round(
        F.when(F.col("tp") + F.col("fp") > 0, F.col("tp").cast("double") / (F.col("tp") + F.col("fp"))),
        6,
    )
    r6 = F.round(
        F.when(F.col("tp") + F.col("fn") > 0, F.col("tp").cast("double") / (F.col("tp") + F.col("fn"))),
        6,
    )
    out = agg.select("threshold", "tp", "fp", "fn", p6.alias("precision"), r6.alias("recall"))
    f1 = F.round(
        F.when(
            F.col("precision") + F.col("recall") > 0,
            2 * F.col("precision") * F.col("recall") / (F.col("precision") + F.col("recall")),
        ),
        6,
    )
    return out.withColumn("f1", f1).orderBy("threshold")

@q("q_lift_deciles")
def q_lift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model gains table: documents ranked by classifier probability
    (deterministic doc_id tiebreak), split into ten deciles, per-decile
    positive rate, lift over the base rate and cumulative gain — the
    how-deep-do-I-have-to-score readout campaign targeting reads.
    The global ntile runs over the scored frame (reporting-sized — the
    q_histogram_equidepth precedent); everything else is exact count
    ratios."""
    scored = _scored_labeled_docs(spark, sf_dir)
    wn = W.orderBy(F.desc("prob"), F.asc("doc_id"))
    dec = scored.withColumn("decile", F.ntile(10).over(wn))
    per = dec.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("label").cast("long").alias("n_pos"),
    )
    tot = per.agg(
        F.sum("n_docs").alias("__n"), F.sum("n_pos").alias("__p")
    )
    wc = W.orderBy("decile").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        per.crossJoin(F.broadcast(tot))
        .withColumn("__cum", F.sum("n_pos").over(wc))
        .select(
            "decile",
            "n_docs",
            "n_pos",
            F.round(
                (F.col("n_pos").cast("double") / F.col("n_docs"))
                / (F.col("__p").cast("double") / F.col("__n")),
                6,
            ).alias("lift"),
            F.round(F.col("__cum").cast("double") / F.col("__p"), 6).alias(
                "cum_gain"
            ),
        )
        .orderBy("decile")
    )

@q("q_abc_analysis")
def q_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts ranked by revenue, class A =
    the prefix holding 80% of cumulative revenue, B = the next 15%, C =
    the tail — the classic supply-chain prioritization cut. Per-part
    totals are exact fixed point; the cumulative share rides one rank
    window over the part-count aggregate (reporting-sized, the
    q_lorenz_deciles precedent); output is the 3-row class summary."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("__rev")
    )
    tot = per_part.agg(dsum("__rev").alias("__t"))
    wr = W.orderBy(F.desc("__rev"), F.asc("l_partkey")).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    cum = (
        per_part.withColumn(
            "__cum", F.sum(F.round(F.col("__rev") * 1000000).cast("long")).over(wr)
        )
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "__cshare", (F.col("__cum").cast("double") / 1000000) / F.col("__t")
        )
    )
    cls = (
        F.when(F.col("__cshare") <= 0.80, "A")
        .when(F.col("__cshare") <= 0.95, "B")
        .otherwise("C")
    )
    return (
        cum.select(cls.alias("abc_class"), "__rev", "__t")
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(dsum("__rev"), 6).alias("revenue"),
            F.round(dsum("__rev") / F.max("__t"), 6).alias("revenue_share"),
        )
        .orderBy("abc_class")
    )

@q("q_zipf_slope")
def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf exponent of the corpus term-frequency distribution: OLS slope
    of log2(freq) on log2(rank) over the top-100 terms (natural text ≈
    −1; a badly deduplicated or templated corpus drifts shallower) — the
    corpus-linguistics screen next to q_heaps_curve. Rank window over
    the vocabulary aggregate, fixed-point moment sums, closed-form
    slope."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    wr = W.orderBy(F.desc("freq"), F.asc("term"))
    top = (
        tf.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= 100)
        .select(
            F.round(F.log2(F.col("rank").cast("double")), 6).alias("__x"),
            F.round(F.log2(F.col("freq").cast("double")), 6).alias("__y"),
        )
    )
    m = top.agg(
        F.count(F.lit(1)).alias("n_terms"),
        dsum("__x").alias("__sx"),
        dsum("__y").alias("__sy"),
        dsum(F.col("__x") * F.col("__y")).alias("__sxy"),
        dsum(F.col("__x") * F.col("__x")).alias("__sxx"),
    )
    nn = F.col("n_terms").cast("double")
    slope = (nn * F.col("__sxy") - F.col("__sx") * F.col("__sy")) / (
        nn * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    )
    intercept = F.col("__sy") / nn - slope * F.col("__sx") / nn
    return m.select(
        "n_terms",
        F.round(slope, 6).alias("zipf_slope"),
        F.round(intercept, 6).alias("log2_c"),
    )

@q("q_heaps_curve")
def q_heaps_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth in ingestion (doc id) order: distinct
    terms seen by each 10%-of-corpus checkpoint — the diminishing-returns
    curve (with q_ngram_novelty's per-doc view) that says when more of
    the same source stops buying vocabulary. Each term carries only its
    FIRST containing doc (one min-aggregate), so the curve is a
    10-bucket count — the corpus is never re-scanned per checkpoint."""
    from fortune_500_financial_insights_pipeline_spark.operators.text import word_ngrams

    d = load_table(spark, sf_dir, "documents")
    maxid = d.agg(F.max("doc_id").alias("__m"))
    # bigram vocabulary: unigrams saturate within the first documents on
    # any fixed token pool — the bigram space is what actually grows
    firstdoc = (
        d.select("doc_id", F.explode(word_ngrams(F.col("text"), 2)).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.min("doc_id").alias("__first"))
    )
    decile = F.least(
        F.lit(10),
        F.floor(F.col("__first") * 10 / (F.col("__m") + 1)).cast("int") + 1,
    )
    per = (
        firstdoc.crossJoin(F.broadcast(maxid))
        .select(decile.alias("checkpoint"))
        .groupBy("checkpoint")
        .agg(F.count(F.lit(1)).alias("new_terms"))
    )
    wc = W.orderBy("checkpoint").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        per.withColumn("vocab_size", F.sum("new_terms").over(wc).cast("long"))
        .orderBy("checkpoint")
    )

@q("q_kaplan_meier")
def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve for time-to-first-purchase: per user,
    duration = days from first event to first purchase (event) or to the
    last observed event (censored); at each event time the curve steps
    by (1 − d/n) over the at-risk set. The product is computed as
    exp(Σ ln(1 − d/n)) with per-term round-9 fixed-point cumulative
    sums — the only order-sensitive float fold is replaced by an exact
    long cumsum, so the curve is hash-identical cross-engine. All work
    after the per-user aggregate runs on the distinct-duration frame
    (≤ observation-window days)."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min("ts").alias("__first"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("__fp"),
        F.max("ts").alias("__last"),
    )
    dur = F.datediff(
        F.coalesce(F.col("__fp"), F.col("__last")).cast("date"),
        F.col("__first").cast("date"),
    )
    users = per_user.select(
        dur.alias("t"), F.col("__fp").isNotNull().cast("int").alias("event")
    )
    per_t = users.groupBy("t").agg(
        F.count(F.lit(1)).alias("__n_at"),
        F.sum("event").cast("long").alias("d"),
    )
    tot = per_t.agg(F.sum("__n_at").alias("__total"))
    wc = W.orderBy("t").rowsBetween(W.unboundedPreceding, -1)
    at_risk = (
        per_t.crossJoin(F.broadcast(tot))
        .withColumn(
            "n_risk",
            (F.col("__total") - F.coalesce(F.sum("__n_at").over(wc), F.lit(0)))
            .cast("long"),
        )
        .where(F.col("d") > 0)
    )
    # d == n_risk (everyone at risk converts at t) sends the curve to an
    # exact 0 — handled as a carried flag, never ln(0)
    term = F.when(
        F.col("d") < F.col("n_risk"),
        F.round(
            F.log(1.0 - F.col("d").cast("double") / F.col("n_risk")) * 1e9
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    zflag = F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0)
    ws = W.orderBy("t").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        at_risk.withColumn("__cum", F.sum(term).over(ws))
        .withColumn("__z", F.max(zflag).over(ws))
        .select(
            "t",
            "n_risk",
            "d",
            F.when(F.col("__z") == 1, 0.0)
            .otherwise(F.round(F.exp(F.col("__cum").cast("double") / 1e9), 6))
            .alias("survival"),
        )
        .orderBy("t")
    )

@q("q_var_backtest")
def q_var_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VaR backtest with Kupiec's proportion-of-failures statistic: fit
    VaR95 on the first half of the market's daily-return history (exact
    ceil(0.05·n) order-statistic rank — the q_var_es discipline), count
    breaches in the held-out second half, and report the POF likelihood
    ratio −2[(n−x)ln((1−p)/(1−x/n)) + x·ln(p/(x/n))] with zero-count
    terms handled explicitly — the model-validation gate a risk desk
    runs before trusting q_var_es's number. Everything past the daily
    aggregate is day-count-sized."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("day")
    ).agg(F.round(davg("l_extendedprice"), 6).alias("close"))
    wd = W.orderBy("day")
    rets = (
        daily.withColumn("__r", F.round(F.col("close") / F.lag("close").over(wd) - 1, 6))
        .where(F.col("__r").isNotNull())
        .withColumn("__rn", F.row_number().over(wd))
    )
    ntot = rets.agg(F.count(F.lit(1)).alias("__n"))
    split = rets.crossJoin(F.broadcast(ntot)).withColumn(
        "__half", F.when(F.col("__rn") <= F.expr("__n div 2"), 1).otherwise(2)
    )
    train = split.where(F.col("__half") == 1)
    n1 = train.agg(F.count(F.lit(1)).alias("__n1"))
    wv = W.orderBy(F.asc("__r"), F.asc("day"))
    var = (
        train.withColumn("__vr", F.row_number().over(wv))
        .crossJoin(F.broadcast(n1))
        .where(F.col("__vr") == F.expr("(__n1 + 19) div 20"))  # integer-exact ceil(0.05 n)
        .select(F.col("__r").alias("var95"))
    )
    test = split.where(F.col("__half") == 2)
    agg = test.crossJoin(F.broadcast(var)).agg(
        F.max("var95").alias("var95"),
        F.count(F.lit(1)).alias("n_test"),
        F.sum(F.when(F.col("__r") < F.col("var95"), 1).otherwise(0))
        .cast("long")
        .alias("n_breaches"),
    )
    n = F.col("n_test").cast("double")
    x = F.col("n_breaches").cast("double")
    p = F.lit(0.05)
    term1 = F.when(
        F.col("n_breaches") < F.col("n_test"),
        (n - x) * F.log((1 - p) / (1 - x / n)),
    ).otherwise(F.lit(0.0))
    term2 = F.when(
        F.col("n_breaches") > 0, x * F.log(p / (x / n))
    ).otherwise(F.lit(0.0))
    return agg.select(
        F.round("var95", 6).alias("var95"),
        "n_test",
        "n_breaches",
        F.round(x / n, 6).alias("breach_rate"),
        F.round(-2 * (term1 + term2), 6).alias("kupiec_lr"),
    )

@q("q_partition_health")
def q_partition_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition data-quality trend: for each ship month, row count,
    required-column null rates, distinct-supplier coverage, and a
    volume-drop flag vs the previous month (> 50% fall = the
    broken-upstream signature) — the freshness/completeness panel every
    landing table publishes (the reference reloads wholesale and would
    never notice a half-empty month). One scan, month-count-sized
    output."""
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy(
        F.date_format("l_shipdate", "yyyy-MM").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(
            F.sum(F.when(F.col("l_extendedprice").isNull(), 1).otherwise(0)).cast(
                "double"
            )
            / F.count(F.lit(1)),
            6,
        ).alias("null_rate_price"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
    )
    wm = W.orderBy("month")
    prev = F.lag("n_rows").over(wm)
    return (
        per.withColumn(
            "volume_drop",
            (prev.isNotNull() & (F.col("n_rows") < prev * 0.5)).cast("int"),
        )
        .orderBy("month")
    )

@q("q_als_rank1")
def q_als_rank1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-1 ALS matrix factorization in relational algebra: quantity
    ratings r(cust, part) factor into u(cust)·v(part) by three
    alternating closed-form solves — u_c = Σ r·v / Σ v², then
    v_p = Σ r·u / Σ u² — each ONE groupBy + equi-join per side (the
    iterative-algorithm discipline of kmeans/PageRank applied to
    recommender factorization; rank-1 keeps the per-key solve
    closed-form, so no driver-side linear algebra). Factors are round-6
    fixed-point at every step, making the whole trajectory — and the
    final item-factor ranking — hash-exact. Output: top-20 parts by
    learned factor (the 'most preference-loaded items' view)."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_partkey") <= 200)
    r = (
        li.select(
            F.col("l_suppkey").alias("c"),
            F.col("l_partkey").alias("p"),
            F.col("l_quantity").cast("double").alias("r"),
        )
        .groupBy("c", "p")
        .agg(F.round(dsum("r"), 6).alias("r"))
        # the ratings frame feeds both solve directions every iteration —
        # materialize once
        .localCheckpoint(eager=False)
    )
    v = r.select("p").distinct().withColumn("v", F.lit(1.0))
    for _ in range(3):
        ju = r.join(v, "p")
        u = (
            ju.groupBy("c")
            .agg(
                (
                    dsum(F.col("r") * F.col("v"))
                    / dsum(F.col("v") * F.col("v"))
                ).alias("__u")
            )
            .select("c", F.round("__u", 6).alias("u"))
            .localCheckpoint(eager=False)
        )
        jv = r.join(u, "c")
        v = (
            jv.groupBy("p")
            .agg(
                (
                    dsum(F.col("r") * F.col("u"))
                    / dsum(F.col("u") * F.col("u"))
                ).alias("__v")
            )
            .select("p", F.round("__v", 6).alias("v"))
            .localCheckpoint(eager=False)
        )
    return v.orderBy(F.desc("v"), F.asc("p")).limit(20)

@q("q_ppr")
def q_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from the 5 seed suppliers over the bipartite
    trade graph (operators/pagerank.personalized_pagerank, 10 rounds,
    damping 0.85): the relevance-to-these-entities ranking behind
    related-supplier panels and seed-expanded audiences — global
    PageRank (q_pagerank) answers 'important overall', this answers
    'important to THESE'. Same bit-exact integer recurrence; top-20
    nodes by rank."""
    from fortune_500_financial_insights_pipeline_spark.operators.pagerank import (
        personalized_pagerank,
    )

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
    seeds = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_suppkey") <= 5)
        .select(F.col("s_suppkey").cast("long").alias("node"))
    )
    ranks = personalized_pagerank(edges, seeds)
    return ranks.orderBy(F.desc("rank_fp"), F.asc("node")).limit(20)

@q("q_reconciliation")
def q_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-way match reconciliation: every order's header total vs the
    sum of its lines (extendedprice·(1−discount)·(1+tax)), the
    finance-ops control that catches partial loads and double-posts
    before the close. Exact fixed-point line sums; the report is the
    top-20 absolute discrepancies plus per-order diffs — at fixture
    scale TPC-H headers are generated FROM the lines, so genuine
    discrepancies are the interesting rows. One join on the order key,
    TakeOrdered cut."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, sf_dir, "lineitem")
    lines = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.round(
            dsum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ),
            6,
        ).alias("line_total")
    )
    j = o.join(lines, "o_orderkey", "left").select(
        "o_orderkey",
        F.round("o_totalprice", 6).alias("header_total"),
        F.coalesce("line_total", F.lit(0.0)).alias("line_total"),
    )
    diff = F.round(F.col("header_total") - F.col("line_total"), 6)
    return (
        j.withColumn("diff", diff)
        .withColumn("abs_diff", F.abs(diff))
        .orderBy(F.desc("abs_diff"), F.asc("o_orderkey"))
        .limit(20)
    )

@q("q_burrows_delta")
def q_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta stylometry between sources: relative frequencies
    of the 30 most common corpus terms per source, z-scored across
    sources (population σ from exact fixed-point moments), and
    Δ(a, b) = mean |z_a − z_b| for every source pair — the authorship/
    provenance distance that flags a relabeled crawl slice. Everything
    past the term count runs on (30 terms × 20 sources)-sized frames;
    the pair join is keyed on the TERM."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(F.split("text", " ")).alias("term")
    ).where(F.col("term") != "")
    top = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("__f"))
        .orderBy(F.desc("__f"), F.asc("term"))
        .limit(30)
        .select("term")
    )
    per_src_tot = toks.groupBy("source").agg(F.count(F.lit(1)).alias("__tot"))
    freq = (
        toks.join(F.broadcast(top), "term")
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("__n"))
        .join(per_src_tot, "source")
        .select(
            "source",
            "term",
            F.round(F.col("__n").cast("double") / F.col("__tot"), 9).alias("__rf"),
        )
    )
    stats = freq.groupBy("term").agg(
        F.count(F.lit(1)).alias("__k"),
        (F.sum(F.round(F.col("__rf") * 1000000000).cast("long")).cast("double") / 1e9).alias("__s"),
        (F.sum(F.round(F.col("__rf") * F.col("__rf") * 1000000000).cast("long")).cast("double") / 1e9).alias("__ss"),
    )
    kk = F.col("__k").cast("double")
    sigma = F.sqrt((kk * F.col("__ss") - F.col("__s") * F.col("__s")) / (kk * kk))
    # a term with zero cross-source variance carries no style signal (and
    # would divide by zero) — drop it on both engines
    z = (
        freq.join(F.broadcast(stats), "term")
        .where(sigma > 0)
        .select(
            "source",
            "term",
            F.round((F.col("__rf") - F.col("__s") / kk) / sigma, 6).alias("__z"),
        )
    )
    a = z.select(F.col("source").alias("src_a"), "term", F.col("__z").alias("__za"))
    b = z.select(F.col("source").alias("src_b"), "term", F.col("__z").alias("__zb"))
    return (
        a.join(b, "term")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(
            F.round(davg(F.abs(F.col("__za") - F.col("__zb"))), 6).alias("delta")
        )
        .orderBy("src_a", "src_b")
    )

@q("q_hits")
def q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS over the directed supplier→customer trade graph
    (operators/pagerank.hits, 8 rounds): hub scores rank suppliers by
    how much authoritative demand they feed, authority scores rank
    customers by how much hub supply they draw — the two-sided
    centrality PageRank's single score conflates. Max-normalized
    round-6 half-steps make the trajectory hash-exact; output is the
    top-10 of each role."""
    from fortune_500_financial_insights_pipeline_spark.operators.pagerank import hits

    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_orderkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("l_suppkey").cast("long").alias("src"),
            (F.col("o_custkey") + 1000000).cast("long").alias("dst"),
        )
        .distinct()
    )
    scored = hits(edges)
    w = W.partitionBy("role").orderBy(F.desc("score"), F.asc("node"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .orderBy("role", "rank")
    )

@q("q_lead_lag_corr")
def q_lead_lag_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation function between two supplier price series at
    lags −5..+5 days: the leading-indicator probe (a peak off lag 0
    says one series anticipates the other) that q_pairwise_corr's
    contemporaneous matrix can't see. One day-keyed equi-join per lag
    via a broadcast lag relation + date_add — never a self cross join;
    exact fixed-point Pearson moments per lag."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_suppkey").isin(1, 2))
    series = li.groupBy(
        "l_suppkey", F.col("l_shipdate").cast("date").alias("d")
    ).agg(F.round(davg("l_extendedprice"), 6).alias("close"))
    a = series.where(F.col("l_suppkey") == 1).select(
        "d", F.col("close").alias("__x")
    )
    b = series.where(F.col("l_suppkey") == 2).select(
        F.col("d").alias("__db"), F.col("close").alias("__y")
    )
    lags = spark.range(-5, 6).select(F.col("id").cast("int").alias("lag"))
    j = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.expr("date_add(d, lag)") == F.col("__db"))
    )
    m = j.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_days"),
        dsum("__x").alias("__sx"),
        dsum("__y").alias("__sy"),
        dsum(F.col("__x") * F.col("__y")).alias("__sxy"),
        dsum(F.col("__x") * F.col("__x")).alias("__sxx"),
        dsum(F.col("__y") * F.col("__y")).alias("__syy"),
    )
    nn = F.col("n_days").cast("double")
    num = nn * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    dx = nn * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    dy = nn * F.col("__syy") - F.col("__sy") * F.col("__sy")
    r = F.when((dx > 0) & (dy > 0), num / F.sqrt(dx * dy))
    return m.select("lag", "n_days", F.round(r, 6).alias("ccf")).orderBy("lag")

@q("q_control_chart")
def q_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPC c-chart over daily error-event counts: center line = mean
    daily count, UCL/LCL = mean ± 3·√mean (Poisson limits), each day
    flagged in/out of control — the ops monitoring rule (a point above
    UCL = investigate; q_seasonal_anomalies models structure, this is
    the assumption-light floor). Exact fixed-point mean, shared-text
    sqrt, day-count-sized output."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.where(F.col("event_type") == "error")
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).alias("n_errors"))
    )
    stats = daily.agg(
        (F.sum("n_errors").cast("double") / F.count(F.lit(1))).alias("__mu")
    )
    mu = F.col("__mu")
    ucl = F.round(mu + 3 * F.sqrt(mu), 6)
    lcl = F.round(F.greatest(mu - 3 * F.sqrt(mu), F.lit(0.0)), 6)
    return (
        daily.crossJoin(F.broadcast(stats))
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "n_errors",
            F.round(mu, 6).alias("center"),
            ucl.alias("ucl"),
            lcl.alias("lcl"),
            (
                (F.col("n_errors") > ucl) | (F.col("n_errors") < lcl)
            ).cast("int").alias("out_of_control"),
        )
        .orderBy("day")
    )

@q("q_simpsons_check")
def q_simpsons_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox audit: the pooled quantity↔price correlation vs
    the same correlation within each return-flag stratum — a sign flip
    (pooled positive, every stratum negative, or vice versa) means the
    stratum is a confounder and any pooled readout is misleading. One
    moment aggregate per stratum + one pooled, exact fixed point; the
    output row carries the pooled r, each stratum r, and the flip
    flag."""
    # kilo-scaled price keeps the fixed-point moment interior (price²
    # terms) inside long range — r is invariant to per-feature scaling
    # (the q_mahalanobis lesson)
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "price_k", F.col("l_extendedprice") / 1000.0
    )

    def moments(df, keys):
        return df.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("n"),
            dsum("l_quantity").alias("sx"),
            dsum("price_k").alias("sy"),
            dsum(F.col("l_quantity") * F.col("price_k")).alias("sxy"),
            dsum(F.col("l_quantity") * F.col("l_quantity")).alias("sxx"),
            dsum(F.col("price_k") * F.col("price_k")).alias("syy"),
        )

    def corr_col():
        nn = F.col("n").cast("double")
        num = nn * F.col("sxy") - F.col("sx") * F.col("sy")
        dx = nn * F.col("sxx") - F.col("sx") * F.col("sx")
        dy = nn * F.col("syy") - F.col("sy") * F.col("sy")
        return F.round(F.when((dx > 0) & (dy > 0), num / F.sqrt(dx * dy)), 6)

    per = moments(li, ["l_returnflag"]).select(
        "l_returnflag", corr_col().alias("r_stratum")
    )
    pooled = moments(li.withColumn("__g", F.lit(1)), ["__g"]).select(
        corr_col().alias("r_pooled")
    )
    return (
        per.crossJoin(F.broadcast(pooled))
        .select(
            "l_returnflag",
            "r_stratum",
            "r_pooled",
            (
                F.signum("r_stratum") != F.signum("r_pooled")
            ).cast("int").alias("sign_flip"),
        )
        .orderBy("l_returnflag")
    )

@q("q_ab_srm")
def q_ab_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail: χ² goodness-of-fit of the
    user-parity assignment against the intended 50/50 split, per event
    type — the first thing a trustworthy experiment platform checks
    before reading any metric (a skewed split invalidates q_ab_test's
    contrast). Exact counts, shared-text χ² expression; χ² > 3.841
    (95%, 1 dof) raises the flag."""
    e = load_table(spark, sf_dir, "events")
    per = e.groupBy("event_type").agg(
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("user_id") % 2 != 0, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
    )
    n = (F.col("n_a") + F.col("n_b")).cast("double")
    ex = n / 2
    chi2 = (F.col("n_a") - ex) * (F.col("n_a") - ex) / ex + (
        F.col("n_b") - ex
    ) * (F.col("n_b") - ex) / ex
    return per.select(
        "event_type",
        "n_a",
        "n_b",
        F.round(chi2, 6).alias("chi2"),
        (chi2 > 3.841).cast("int").alias("srm_flag"),
    ).orderBy("event_type")

@q("q_pvm_bridge")
def q_pvm_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume-mix revenue bridge between 1996 and 1997 (the FP&A
    waterfall a CFO deck opens with): per part, volume effect
    (Δq·p96), price effect (Δp·q96), the Δq·Δp interaction, plus
    new-part and discontinued-part buckets — and the identity
    ΔRev = vol + price + mix + new − discontinued holds EXACTLY because
    every term is the same fixed-point arithmetic (test-pinned). One
    scan, one part-keyed full-outer self-alignment, one-row output."""
    li = load_table(spark, sf_dir, "lineitem")
    yr = F.year("l_shipdate")
    per = (
        li.where(yr.isin(1996, 1997))
        .groupBy("l_partkey", yr.alias("__y"))
        .agg(
            F.round(dsum("l_quantity"), 6).alias("__q"),
            F.round(dsum("l_extendedprice"), 6).alias("__rev"),
        )
        .withColumn("__p", F.round(F.col("__rev") / F.col("__q"), 6))
    )
    a = per.where(F.col("__y") == 1996).select(
        "l_partkey", F.col("__q").alias("q0"), F.col("__p").alias("p0"),
        F.col("__rev").alias("r0"),
    )
    b = per.where(F.col("__y") == 1997).select(
        "l_partkey", F.col("__q").alias("q1"), F.col("__p").alias("p1"),
        F.col("__rev").alias("r1"),
    )
    j = a.join(b, "l_partkey", "full")
    both = F.col("q0").isNotNull() & F.col("q1").isNotNull()
    vol = F.when(both, (F.col("q1") - F.col("q0")) * F.col("p0")).otherwise(0.0)
    price = F.when(both, (F.col("p1") - F.col("p0")) * F.col("q0")).otherwise(0.0)
    mix = F.when(
        both, (F.col("q1") - F.col("q0")) * (F.col("p1") - F.col("p0"))
    ).otherwise(0.0)
    new = F.when(F.col("q0").isNull(), F.col("r1")).otherwise(0.0)
    disc = F.when(F.col("q1").isNull(), F.col("r0")).otherwise(0.0)
    return j.agg(
        F.round(dsum(F.coalesce("r0", F.lit(0.0))), 6).alias("rev_1996"),
        F.round(dsum(F.coalesce("r1", F.lit(0.0))), 6).alias("rev_1997"),
        F.round(dsum(vol), 6).alias("volume_effect"),
        F.round(dsum(price), 6).alias("price_effect"),
        F.round(dsum(mix), 6).alias("mix_effect"),
        F.round(dsum(new), 6).alias("new_parts"),
        F.round(dsum(disc), 6).alias("discontinued"),
    )

@q("q_fulfillment_lag")
def q_fulfillment_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship lead time per priority class: exact interpolated
    p50/p90 lag days and the within-30-days service level — the
    fulfillment KPI a priority tier is supposed to buy (if URGENT's p90
    matches LOW's, the tiering is theater). One key join, one percentile
    aggregate per class."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    lag = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    ).cast("double")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority", lag.alias("__lag")
    )
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.percentile("__lag", F.lit(0.5)), 6).alias("p50_days"),
            F.round(F.percentile("__lag", F.lit(0.9)), 6).alias("p90_days"),
            F.round(
                F.sum(F.when(F.col("__lag") <= 30, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("within_30d_rate"),
        )
        .orderBy("o_orderpriority")
    )

@q("q_ingestion_drift")
def q_ingestion_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-cohort drift: per doc-id decile (≈ arrival order), mean
    quality score, English share and mean length — the is-the-newest-
    crawl-worse trend a curation pipeline reviews before admitting a new
    snapshot (q_mixture_kl audits sources; this audits TIME). Decile =
    integer id band, so the cohort cut is a map-side expression."""
    d = load_table(spark, sf_dir, "documents")
    from fortune_500_financial_insights_pipeline_spark.operators.text import quality_score

    maxid = d.agg(F.max("doc_id").alias("__m"))
    dec = F.least(
        F.lit(10), F.floor(F.col("doc_id") * 10 / (F.col("__m") + 1)).cast("int") + 1
    )
    return (
        d.crossJoin(F.broadcast(maxid))
        .select(
            dec.alias("cohort"),
            F.round(quality_score("text"), 6).alias("__q"),
            (F.col("lang") == "en").cast("int").alias("__en"),
            F.length("text").cast("double").alias("__len"),
        )
        .groupBy("cohort")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(davg("__q"), 6).alias("avg_quality"),
            F.round(
                F.sum("__en").cast("double") / F.count(F.lit(1)), 6
            ).alias("en_share"),
            F.round(davg("__len"), 6).alias("avg_chars"),
        )
        .orderBy("cohort")
    )

@q("q_embedding_isotropy")
def q_embedding_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding isotropy diagnostic: ‖mean vector‖ vs the mean vector
    norm — a ratio near 0 means directions are spread (healthy for
    cosine retrieval), near 1 means the space has collapsed onto a
    dominant direction (the anisotropy failure that silently ruins
    ANN recall). Component sums are exact 1e4 fixed-point longs (the
    q_label_centroids discipline); one aggregate over a HOF fold, no
    shuffle beyond it."""
    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").head()[0])
    comp_sums = [
        F.sum(
            F.round(F.element_at("embedding", i + 1).cast("double") * 10000).cast(
                "long"
            )
        ).alias(f"__c{i}")
        for i in range(dim)
    ]
    sq = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    agg = emb.agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(davg(F.sqrt(sq)), 6).alias("avg_norm"),
        *comp_sums,
    )
    mean_norm_sq = None
    for i in range(dim):
        t = (F.col(f"__c{i}").cast("double") / 10000 / F.col("n_vecs")) * (
            F.col(f"__c{i}").cast("double") / 10000 / F.col("n_vecs")
        )
        mean_norm_sq = t if mean_norm_sq is None else mean_norm_sq + t
    norm_of_mean = F.round(F.sqrt(mean_norm_sq), 6)
    return agg.select(
        "n_vecs",
        "avg_norm",
        norm_of_mean.alias("norm_of_mean"),
        F.round(norm_of_mean / F.col("avg_norm"), 6).alias("anisotropy_ratio"),
    )

@q("q_exposure_fairness")
def q_exposure_fairness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exposure-based ranking fairness (Singh & Joachims, KDD 2018):
    over the BM25 top-20 lists for three queries, each language group's
    share of total exposure Σ 1/log2(rank+1) vs its share of retrieved
    results — a group whose exposure share lags its result share is
    systematically ranked low. Position weights are per-row shared-text
    expressions; sums are fixed point. List-sized compute on top of the
    already-oracled retrieval leg."""
    from fortune_500_financial_insights_pipeline_spark.operators.tfidf import bm25_search

    d = load_table(spark, sf_dir, "documents")
    qids = [0, 7, 42]
    queries = d.where(F.col("doc_id").isin(qids)).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("qtext")
    )
    hits = bm25_search(d, queries, k=20).select("query_id", "doc_id", "rank")
    w = F.round(1.0 / F.log2(F.col("rank").cast("double") + 1.0), 6)
    labeled = hits.join(d.select("doc_id", "lang"), "doc_id").select(
        "lang", w.alias("__w")
    )
    per = labeled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_results"),
        dsum("__w").alias("__exp"),
    )
    tot = per.agg(
        F.sum("n_results").alias("__nt"),
        dsum("__exp").alias("__et"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_results",
            F.round(F.col("__exp"), 6).alias("exposure"),
            F.round(
                F.col("n_results").cast("double") / F.col("__nt"), 6
            ).alias("result_share"),
            F.round(F.col("__exp") / F.col("__et"), 6).alias("exposure_share"),
        )
        .orderBy("lang")
    )

@q("q_dedup_threshold_curve")
def q_dedup_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup threshold-tuning curve: exact 3-gram Jaccard pairs at >= 0.3
    (ONE prefix-filtered set-similarity pass — the thresholds are then
    just filters over the pair list), bucketed into similarity bands
    with cumulative pairs-at-or-above — the how-aggressive-can-I-dedup
    readout that picks min_jaccard before q_jaccard_clusters runs.
    Bands are floor(jac·10)/10 on round-6 values, shared text. Pairs come
    from the per-process memo (_core.doc_jaccard_pairs)."""
    from fortune_500_financial_insights_pipeline_spark.queries._core import (
        doc_jaccard_pairs,
    )

    pairs = doc_jaccard_pairs(spark, sf_dir, ngram=3, floor=0.3).select(
        "id_a", "id_b", F.round(F.col("n_i") / F.col("n_u"), 6).alias("jac")
    )
    band = F.least(F.lit(9), F.floor(F.col("jac") * 10).cast("int"))
    per = pairs.groupBy(band.alias("band")).agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
    wc = W.orderBy(F.desc("band")).rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        per.withColumn("cum_pairs_at_or_above", F.sum("n_pairs").over(wc).cast("long"))
        .select(
            (F.col("band").cast("double") / 10).alias("threshold"),
            "n_pairs",
            "cum_pairs_at_or_above",
        )
        .orderBy("threshold")
    )

@q("q_fk_orphans")
def q_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema: for each
    declared FK edge (lineitem→orders/part/supplier, orders→customer,
    customer→nation, nation→region), child rows whose key finds no
    parent — the orphan scan every warehouse load gate runs (the
    reference trusts BigQuery autodetect and would ship orphans
    silently). Six anti-join counts, one row per edge."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")

    def edge(name, child, ckey, parent, pkey):
        total = child.select(F.col(ckey).alias("__k"))
        orphans = total.join(
            parent.select(F.col(pkey).alias("__k")).distinct(), "__k", "left_anti"
        )
        t = total.agg(F.count(F.lit(1)).alias("n_child_rows"))
        oo = orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
        return (
            t.crossJoin(oo)
            .select(
                F.lit(name).alias("fk_edge"),
                "n_child_rows",
                "n_orphans",
                F.round(
                    F.col("n_orphans").cast("double") / F.col("n_child_rows"), 6
                ).alias("orphan_rate"),
            )
        )

    edges = [
        edge("lineitem->orders", li, "l_orderkey", o, "o_orderkey"),
        edge("lineitem->part", li, "l_partkey", p, "p_partkey"),
        edge("lineitem->supplier", li, "l_suppkey", s, "s_suppkey"),
        edge("orders->customer", o, "o_custkey", c, "c_custkey"),
        edge("customer->nation", c, "c_nationkey", n, "n_nationkey"),
        edge("nation->region", n, "n_regionkey", r, "r_regionkey"),
    ]
    out = edges[0]
    for e2 in edges[1:]:
        out = out.unionByName(e2)
    return out.orderBy("fk_edge")

@q("q_duplicate_payments")
def q_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment screen: orders sharing (customer, amount
    bucket) — the classic AP audit for double-posted invoices (exact
    dedup catches byte-identical rows; this catches re-keyed ones).
    The candidate key is (custkey, floor(total/1000)): the exact
    (custkey, total, date) key never collides in the generator's data,
    so the old shape certified only the empty set (r7 verdict item 3);
    floor (not round) so Spark and the oracle agree on .5 boundaries.
    One groupBy on the candidate key, groups of >= 2 reported with
    their order-id span."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            "o_custkey",
            F.floor(F.col("o_totalprice") / 1000).cast("long").alias("amount_k"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_orderkey").alias("first_orderkey"),
            F.max("o_orderkey").alias("last_orderkey"),
        )
        .where(F.col("n_orders") >= 2)
        .orderBy("o_custkey", "amount_k")
    )

@q("q_seasonality_index")
def q_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-month seasonality index: each month's average daily
    revenue over the all-months average (index > 1 = seasonal high) —
    the retail planning number q_seasonal_decompose's weekly phase view
    doesn't give. Exact fixed-point interiors; 12-row output."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.col("l_shipdate").cast("date").alias("d")).agg(
        F.round(dsum("l_extendedprice"), 6).alias("__rev")
    )
    per_m = daily.groupBy(F.month("d").alias("month")).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(davg("__rev"), 6).alias("avg_daily_rev"),
    )
    overall = daily.agg(F.round(davg("__rev"), 6).alias("__o"))
    return (
        per_m.crossJoin(F.broadcast(overall))
        .select(
            "month",
            "n_days",
            "avg_daily_rev",
            F.round(F.col("avg_daily_rev") / F.col("__o"), 6).alias("index"),
        )
        .orderBy("month")
    )

@q("q_price_dispersion")
def q_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Procurement price-dispersion screen: per part, the spread of unit
    prices across suppliers (weighted mean vs minimum supplier mean) and
    the savings potential = (mean − min)·volume — the same-part-priced-
    differently opportunity list a sourcing team works top-down. Two
    stacked aggregates (part×supplier, then part), TakeOrdered top-20."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.round(dsum("l_quantity"), 6).alias("__q"),
        F.round(dsum("l_extendedprice"), 6).alias("__rev"),
    ).withColumn("__unit", F.round(F.col("__rev") / F.col("__q"), 6))
    per_part = ps.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.round(dsum("__q"), 6).alias("volume"),
        F.round(dsum("__rev"), 6).alias("__trev"),
        F.round(F.min("__unit"), 6).alias("min_unit_price"),
    )
    mean_unit = F.round(F.col("__trev") / F.col("volume"), 6)
    savings = F.round(
        (mean_unit - F.col("min_unit_price")) * F.col("volume"), 6
    )
    return (
        per_part.where(F.col("n_suppliers") >= 2)
        .select(
            "l_partkey",
            "n_suppliers",
            "volume",
            mean_unit.alias("mean_unit_price"),
            "min_unit_price",
            savings.alias("savings_potential"),
        )
        .orderBy(F.desc("savings_potential"), F.asc("l_partkey"))
        .limit(20)
    )

@q("q_image_dims")
def q_image_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-dimension extraction from PNG headers
    (operators/multimodal.png_dimensions): widths/heights parsed from
    the IHDR bytes of synthesized-but-REAL PNG-framed payloads (the
    fixture plants doc-id-derived dimensions in genuine big-endian
    header fields), then the orientation/megapixel profile an image
    -training pipeline reports before resize bucketing. Byte→hex→long
    arithmetic end to end — no decoder, no UDF."""
    from fortune_500_financial_insights_pipeline_spark.operators.multimodal import (
        png_dimensions,
    )

    d = load_table(spark, sf_dir, "documents")
    w = 100 + F.col("doc_id") % 400
    h = 100 + (F.col("doc_id") * 7) % 300
    whex = F.lpad(F.conv(w.cast("string"), 10, 16), 8, "0")
    hhex = F.lpad(F.conv(h.cast("string"), 10, 16), 8, "0")
    payload = F.unhex(
        F.concat(
            F.lit("89504E470D0A1A0A"),  # PNG signature
            F.lit("0000000D"),  # IHDR length
            F.lit("49484452"),  # 'IHDR'
            whex,
            hhex,
            F.lit("0806000000"),  # bit depth / color / compression ...
        )
    )
    pw, ph = png_dimensions(payload)
    orient = (
        F.when(pw > ph, "landscape").when(pw < ph, "portrait").otherwise("square")
    )
    mp = F.round(pw.cast("double") * ph.cast("double") / 1000000, 6)
    return (
        d.select(orient.alias("orientation"), pw.alias("__w"), ph.alias("__h"), mp.alias("__mp"))
        .groupBy("orientation")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.round(davg(F.col("__w").cast("double")), 6).alias("avg_width"),
            F.round(davg(F.col("__h").cast("double")), 6).alias("avg_height"),
            F.round(davg("__mp"), 6).alias("avg_megapixels"),
        )
        .orderBy("orientation")
    )

@q("q_audio_meta")
def q_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio metadata extraction from WAV headers (operators/multimodal
    .wav_meta): sample rate, channel count and exact duration
    (data bytes / byte rate) parsed from little-endian RIFF fields of
    synthesized-but-REAL canonical headers — then the per-sample-rate
    hours/duration profile a speech-data pipeline reports before
    resampling. Byte→hex→long arithmetic, no decoder, no UDF."""
    from fortune_500_financial_insights_pipeline_spark.operators.multimodal import wav_meta

    d = load_table(spark, sf_dir, "documents")
    sr = (
        F.when(F.col("doc_id") % 4 == 0, 8000)
        .when(F.col("doc_id") % 4 == 1, 16000)
        .when(F.col("doc_id") % 4 == 2, 44100)
        .otherwise(48000)
    )
    ch = (1 + F.col("doc_id") % 2).cast("int")
    secs = 1 + F.col("doc_id") % 30
    data_bytes = (sr * 2 * ch * secs).cast("long")

    def le32(col):
        h = F.lpad(F.conv(col.cast("string"), 10, 16), 8, "0")
        return F.concat(
            F.substring(h, 7, 2), F.substring(h, 5, 2),
            F.substring(h, 3, 2), F.substring(h, 1, 2),
        )

    def le16(col):
        h = F.lpad(F.conv(col.cast("string"), 10, 16), 4, "0")
        return F.concat(F.substring(h, 3, 2), F.substring(h, 1, 2))

    payload = F.unhex(
        F.concat(
            F.lit("52494646"), le32(data_bytes + 36), F.lit("57415645"),
            F.lit("666D7420"), F.lit("10000000"), F.lit("0100"),
            le16(ch), le32(sr), le32(sr * 2 * ch), le16(ch * 2),
            F.lit("1000"), F.lit("64617461"), le32(data_bytes),
        )
    )
    prate, pch, pbytes = wav_meta(payload)
    dur = F.round(
        pbytes.cast("double") / (prate * 2 * pch).cast("double"), 6
    )
    return (
        d.select(prate.alias("sample_rate"), pch.alias("__ch"), dur.alias("__s"))
        .groupBy("sample_rate")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.round(dsum("__s") / 3600, 6).alias("total_hours"),
            F.round(F.percentile("__s", F.lit(0.5)), 6).alias("p50_seconds"),
            F.round(
                F.sum(F.when(F.col("__ch") == 2, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("stereo_share"),
        )
        .orderBy("sample_rate")
    )

@q("q_video_meta")
def q_video_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video metadata from MP4 ftyp/mvhd boxes (operators/multimodal
    .mp4_meta): major brand plus big-endian timescale/duration parsed
    from canonical synthesized headers — per-brand clip counts, total
    hours and p50 clip seconds, the video-corpus profile before
    frame-sampling budgets are set. Completes the byte-level
    image/audio/video metadata triad; no demuxer, no UDF."""
    from fortune_500_financial_insights_pipeline_spark.operators.multimodal import mp4_meta

    d = load_table(spark, sf_dir, "documents")
    brand_hex = (
        F.when(F.col("doc_id") % 3 == 0, "69736F6D")
        .when(F.col("doc_id") % 3 == 1, "6D703432")
        .otherwise("71742020")
    )
    timescale = F.lit(600)
    ticks = (600 * (5 + F.col("doc_id") % 120)).cast("long")  # 5..124 s clips

    def be32(col):
        return F.lpad(F.conv(col.cast("string"), 10, 16), 8, "0")

    payload = F.unhex(
        F.concat(
            F.lit("00000010"), F.lit("66747970"), brand_hex, F.lit("00000000"),
            F.lit("00000074"), F.lit("6D6F6F76"),
            F.lit("0000006C"), F.lit("6D766864"),
            F.lit("00000000"),  # version/flags
            F.lit("00000000"), F.lit("00000000"),  # ctime/mtime
            be32(timescale), be32(ticks),
        )
    )
    brand, ts, dur = mp4_meta(payload)
    secs = F.round(dur.cast("double") / ts.cast("double"), 6)
    return (
        d.select(brand.alias("brand"), secs.alias("__s"))
        .groupBy("brand")
        .agg(
            F.count(F.lit(1)).alias("n_clips"),
            F.round(dsum("__s") / 3600, 6).alias("total_hours"),
            F.round(F.percentile("__s", F.lit(0.5)), 6).alias("p50_seconds"),
        )
        .orderBy("brand")
    )

@q("q_script_mismatch")
def q_script_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-label vs script QA: per language tag, the ASCII character
    share and how many docs are pure-ASCII — a 'zh' corpus that is 100%
    ASCII is mislabeled (the label-vs-content check q_langid_confusion
    runs against the classifier; this runs against the raw script).
    Non-ASCII counting is one portable regexp_replace length diff."""
    d = load_table(spark, sf_dir, "documents")
    n_chars = F.length("text").cast("double")
    n_non_ascii = F.length(
        F.regexp_replace(F.col("text"), r"[\x00-\x7F]", "")
    ).cast("double")
    ascii_share = F.round((n_chars - n_non_ascii) / n_chars, 6)
    return (
        d.select("lang", ascii_share.alias("__a"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(davg("__a"), 6).alias("avg_ascii_share"),
            F.sum(F.when(F.col("__a") >= 0.999999, 1).otherwise(0))
            .cast("long")
            .alias("n_pure_ascii"),
        )
        .orderBy("lang")
    )

@q("q_below_list_price")
def q_below_list_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing-leakage analysis: per brand, the share of lines whose
    effective unit price (extendedprice·(1−discount)/quantity) falls
    below the part's list price, and the revenue leakage
    Σ (list − unit)·qty over those lines — the discount-discipline
    readout revenue management works from. One broadcast-joinable part
    dim, exact fixed-point leakage sums."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", F.col("p_retailprice").alias("__list")
    )
    # FLOOR-based micro-unit fixed point (the q_window_pct lesson): the
    # raw unit price lands exactly on .5 micro-unit midpoints for many
    # rows, where Spark's decimal HALF_UP and DuckDB's binary rounding
    # disagree — floor(x·1e6 + 0.5) is pure IEEE arithmetic and therefore
    # bit-identical on both engines
    unit6 = F.floor(
        F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        / F.col("l_quantity")
        * 1000000
        + 0.5
    ).cast("long")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "p_brand",
        unit6.alias("__u6"),
        F.floor(F.col("__list") * 1000000 + 0.5).cast("long").alias("__l6"),
        F.col("l_quantity").alias("__q"),
    )
    below = F.col("__u6") < F.col("__l6")
    leak_u = F.when(
        below, (F.col("__l6") - F.col("__u6")) * F.col("__q").cast("long")
    ).otherwise(F.lit(0).cast("long"))
    return (
        j.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(below.cast("int")).cast("long").alias("n_below_list"),
            F.round(
                F.sum(below.cast("int")).cast("double") / F.count(F.lit(1)), 6
            ).alias("below_list_rate"),
            F.round(F.sum(leak_u).cast("double") / 1000000, 6).alias(
                "revenue_leakage"
            ),
        )
        .orderBy("p_brand")
    )

@q("q_lsh_s_curve")
def q_lsh_s_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH banding S-curve, measured: per true-Jaccard band (exact
    pairs ≥ 0.3 from the set-similarity join), the observed capture rate
    of 16-hash/4-band MinHash banding next to the theoretical
    1 − (1 − j^r)^b at the band midpoint (embedded as shared literals) —
    the gauge that closes the loop on q_lsh_precision/q_lsh_recall: if
    observed tracks theory, the hash family is behaving; if not, the
    banding is broken, not the corpus. Both legs come from the
    per-process pair memo (_core.doc_jaccard_pairs/doc_lsh_candidates;
    jac = ROUND(n_i/n_u, 6) is the identical rounded double)."""
    from fortune_500_financial_insights_pipeline_spark.queries._core import (
        doc_jaccard_pairs,
        doc_lsh_candidates,
    )

    truth = doc_jaccard_pairs(spark, sf_dir, ngram=3, floor=0.3).select(
        "id_a", "id_b", F.round(F.col("n_i") / F.col("n_u"), 6).alias("jac")
    )
    cand = doc_lsh_candidates(spark, sf_dir).select(
        "id_a", "id_b", F.lit(1).alias("__hit")
    )
    j = truth.join(cand, ["id_a", "id_b"], "left")
    band = F.least(F.lit(9), F.floor(F.col("jac") * 10).cast("int"))
    # theoretical capture 1-(1-j^4)^4 at band midpoints, Python-computed
    theo = [
        round(1 - (1 - ((b + 0.5) / 10) ** 4) ** 4, 6) for b in range(10)
    ]
    tarr = F.array(*[F.lit(t) for t in theo])
    per = (
        j.groupBy(band.alias("band"))
        .agg(
            F.count(F.lit(1)).alias("n_true"),
            F.sum(F.coalesce("__hit", F.lit(0))).cast("long").alias("n_caught"),
        )
    )
    return per.select(
        (F.col("band").cast("double") / 10).alias("jac_band"),
        "n_true",
        "n_caught",
        F.round(F.col("n_caught").cast("double") / F.col("n_true"), 6).alias(
            "observed_rate"
        ),
        F.element_at(tarr, F.col("band") + 1).alias("theoretical_rate"),
    ).orderBy("jac_band")

@q("q_window_distinct")
def q_window_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding distinct count — the window aggregate Spark has no native
    form for (COUNT(DISTINCT) OVER is unsupported): per supplier, the
    distinct parts shipped in the trailing 20 rows, via
    size(array_distinct(collect_list)) over the bounded frame. Correct
    exactly BECAUSE the frame is bounded (20 values per row — never a
    whole-partition array); the unbounded form belongs to KMV. Reported
    at each supplier's last 5 rows to keep output stable."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_suppkey") <= 10)
    w = W.partitionBy("l_suppkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    wf = w.rowsBetween(-19, 0)
    ranked = (
        li.select("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber", "l_partkey")
        .withColumn(
            "distinct_parts_20",
            F.size(F.array_distinct(F.collect_list("l_partkey").over(wf))),
        )
        .withColumn("__rn", F.row_number().over(w))
        .withColumn("__mx", F.max("__rn").over(W.partitionBy("l_suppkey")))
    )
    return (
        ranked.where(F.col("__rn") > F.col("__mx") - 5)
        .select(
            "l_suppkey",
            F.col("__rn").cast("long").alias("seq"),
            F.col("distinct_parts_20").cast("long").alias("distinct_parts_20"),
        )
        .orderBy("l_suppkey", "seq")
    )

@q("q_grouping_id")
def q_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING_ID level labels: the subtotal-level
    discriminator that lets one result frame serve detail rows,
    per-region subtotals and the grand total without NULL ambiguity
    (a NULL group key from data vs from rollup are different things —
    grouping_id tells them apart). Completes the A4 grouping-sets
    surface."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.grouping_id().cast("long").alias("level_id"),
        )
        .orderBy("level_id", "r_name", "n_name")
    )

@q("q_collocations")
def q_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by pointwise mutual information: bigrams with
    PMI = log2(p(ab) / (p(a)·p(b))) over corpus counts (min bigram count
    5 — PMI's rare-pair pathology cut), top-20 — the multiword-
    expression detector a tokenizer-merge or phrase-index build starts
    from. Exact count ratios into one shared-text log2; vocabulary-sized
    frames after the gram count."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.split("text", " ").alias("__tk"))
    uni = (
        toks.select(F.explode("__tk").alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("uf"))
    )
    n_uni = uni.agg(F.sum("uf").alias("__nu"))
    from fortune_500_financial_insights_pipeline_spark.operators.text import word_ngrams_all

    bi = (
        d.select(F.explode(word_ngrams_all(F.col("text"), 2)).alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("bf"))
        .where(F.col("bf") >= 5)
    )
    n_bi = bi.agg(F.sum("bf").alias("__nb"))
    w1 = F.element_at(F.split("g", " "), 1)
    w2 = F.element_at(F.split("g", " "), 2)
    ua = uni.select(F.col("w").alias("__w1"), F.col("uf").alias("__f1"))
    ub = uni.select(F.col("w").alias("__w2"), F.col("uf").alias("__f2"))
    scored = (
        bi.withColumn("__w1", w1)
        .withColumn("__w2", w2)
        .join(ua, "__w1")
        .join(ub, "__w2")
        .crossJoin(F.broadcast(n_bi))
        .crossJoin(F.broadcast(n_uni))
        .select(
            F.col("g").alias("bigram"),
            F.col("bf").alias("n_pair"),
            F.round(
                F.log2(
                    (F.col("bf").cast("double") / F.col("__nb"))
                    / (
                        (F.col("__f1").cast("double") / F.col("__nu"))
                        * (F.col("__f2").cast("double") / F.col("__nu"))
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), F.asc("bigram")).limit(20)

@q("q_overdispersion")
def q_overdispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overdispersion check behind q_control_chart: the Fano factor
    (variance/mean of daily counts) per event type — Poisson traffic has
    Fano ≈ 1, bursty arrivals >> 1, and c-chart limits are only valid
    in the first regime. Exact integer daily counts, population variance
    from exact moments."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n").alias("__s"),
        F.sum(F.col("n") * F.col("n")).alias("__ss"),
    )
    nn = F.col("n_days").cast("double")
    mean = F.col("__s").cast("double") / nn
    var = F.col("__ss").cast("double") / nn - mean * mean
    fano = var / mean
    return m.select(
        "event_type",
        "n_days",
        F.round(mean, 6).alias("mean_daily"),
        F.round(var, 6).alias("var_daily"),
        F.round(fano, 6).alias("fano"),
        (fano > 1.5).cast("int").alias("overdispersed"),
    ).orderBy("event_type")

@q("q_dp_release")
def q_dp_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism DP release of per-nation customer counts
    (ε = 1, sensitivity 1): noise = −b·sign(u−½)·ln(1−2|u−½|) via the
    inverse CDF over an md5-derived uniform — the release MECHANISM as
    a relational program. The md5 seed makes the draw reproducible so
    the oracle can check the arithmetic end to end; a production release
    swaps in a real RNG (a seeded release is NOT private — this is the
    mechanism testbed, exactly like multimodal's stubbed decode). Also
    reports the true count so tests can pin the noise-scale contract."""
    c = load_table(spark, sf_dir, "customer")
    per = c.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("true_count"))
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("dp|"), F.col("c_nationkey").cast("string"))), 1, 15),
            16,
            10,
        ).cast("double")
        / F.lit(float(1 << 60))
    )
    b = F.lit(1.0)  # sensitivity / epsilon
    centered = u - 0.5
    noise = -b * F.signum(centered) * F.log(1.0 - 2.0 * F.abs(centered))
    return per.select(
        "c_nationkey",
        "true_count",
        F.round(noise, 6).alias("noise"),
        F.round(F.col("true_count") + F.round(noise, 6), 6).alias("released_count"),
    ).orderBy("c_nationkey")

@q("q_decision_stump")
def q_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A decision stump trained relationally: candidate thresholds = the
    exact deciles of order value, split quality = Gini impurity
    reduction against the is-urgent label, winner by gain — the
    one-node tree that seeds boosting and, more importantly here, shows
    model TRAINING as one conditional aggregate + an argmax (no driver
    loop: all 9 candidate splits are evaluated in a single pass over a
    broadcast threshold relation)."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("__x"),
        (F.col("o_orderpriority") == "1-URGENT").cast("int").alias("__y"),
    )
    thr = (
        o.agg(
            F.percentile("__x", F.array(*[F.lit(i / 10) for i in range(1, 10)])).alias(
                "__t"
            )
        )
        .select(F.explode("__t").alias("threshold"))
        .select(F.round("threshold", 6).alias("threshold"))
    )
    j = o.crossJoin(F.broadcast(thr))
    per = j.groupBy("threshold").agg(
        F.sum(F.when(F.col("__x") <= F.col("threshold"), 1).otherwise(0))
        .cast("long")
        .alias("n_l"),
        F.sum(F.when((F.col("__x") <= F.col("threshold")) & (F.col("__y") == 1), 1).otherwise(0))
        .cast("long")
        .alias("p_l"),
        F.sum(F.when(F.col("__x") > F.col("threshold"), 1).otherwise(0))
        .cast("long")
        .alias("n_r"),
        F.sum(F.when((F.col("__x") > F.col("threshold")) & (F.col("__y") == 1), 1).otherwise(0))
        .cast("long")
        .alias("p_r"),
    )
    n = (F.col("n_l") + F.col("n_r")).cast("double")
    p = (F.col("p_l") + F.col("p_r")).cast("double") / n
    gini_parent = 1.0 - p * p - (1.0 - p) * (1.0 - p)
    pl = F.col("p_l").cast("double") / F.col("n_l")
    pr = F.col("p_r").cast("double") / F.col("n_r")
    gini_l = 1.0 - pl * pl - (1.0 - pl) * (1.0 - pl)
    gini_r = 1.0 - pr * pr - (1.0 - pr) * (1.0 - pr)
    gain = gini_parent - (
        F.col("n_l").cast("double") / n * gini_l
        + F.col("n_r").cast("double") / n * gini_r
    )
    return (
        per.where((F.col("n_l") > 0) & (F.col("n_r") > 0))
        .select(
            "threshold",
            "n_l",
            "n_r",
            F.round(gini_parent, 6).alias("gini_parent"),
            F.round(gain, 9).alias("gini_gain"),
        )
        .orderBy(F.desc("gini_gain"), F.asc("threshold"))
        .limit(1)
    )

@q("q_naive_bayes")
def q_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes trained AND scored relationally: fit
    Laplace-smoothed per-language term log-likelihoods on even doc ids,
    classify the odd ids, return the confusion matrix — the full ML
    train/predict loop as joins and aggregates (q_decision_stump trains
    one split; this trains a real classifier). Log terms are round-9
    per-row; per-(doc, lang) scores fold as EXACT LONG sums (1e9 fixed
    point), so the argmax — and therefore every prediction — is integer
    arithmetic the oracle replays bit for bit. Unseen terms hit the
    smoothed floor via a left join + per-language coalesce."""
    d = load_table(spark, sf_dir, "documents")
    train = d.where(F.col("doc_id") % 2 == 0)
    test = d.where(F.col("doc_id") % 2 == 1)
    ttok = train.select(
        "lang", F.explode(F.split("text", " ")).alias("term")
    ).where(F.col("term") != "")
    cnt = ttok.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("__c"))
    tot = cnt.groupBy("lang").agg(F.sum("__c").alias("__tot"))
    vocab = ttok.select("term").distinct().agg(F.count(F.lit(1)).alias("__v"))
    prior = (
        train.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("__nd"))
        .crossJoin(F.broadcast(train.agg(F.count(F.lit(1)).alias("__n"))))
        .select(
            "lang",
            F.round(
                F.log(F.col("__nd").cast("double") / F.col("__n")) * 1e9
            ).cast("long").alias("__logprior"),
        )
    )
    lstats = (
        tot.crossJoin(F.broadcast(vocab))
        .select(
            "lang",
            "__tot",
            "__v",
            F.round(
                F.log(1.0 / (F.col("__tot") + F.col("__v")).cast("double")) * 1e9
            ).cast("long").alias("__floor"),
        )
        .localCheckpoint(eager=False)
    )
    ll = (
        cnt.join(lstats, "lang")
        .select(
            "lang",
            "term",
            F.round(
                F.log(
                    (F.col("__c") + 1).cast("double")
                    / (F.col("__tot") + F.col("__v")).cast("double")
                )
                * 1e9
            ).cast("long").alias("__ll"),
        )
        .localCheckpoint(eager=False)
    )
    ttest = test.select(
        "doc_id",
        F.col("lang").alias("true_lang"),
        F.explode(F.split("text", " ")).alias("term"),
    ).where(F.col("term") != "")
    cand = ttest.crossJoin(
        F.broadcast(lstats.select(F.col("lang").alias("__cl"), "__floor"))
    )
    scored = (
        cand.join(
            ll.select(F.col("lang").alias("__cl"), "term", "__ll"),
            ["__cl", "term"],
            "left",
        )
        .groupBy("doc_id", "true_lang", "__cl")
        .agg(F.sum(F.coalesce("__ll", F.col("__floor"))).alias("__s"))
        .join(prior.select(F.col("lang").alias("__cl"), "__logprior"), "__cl")
        .withColumn("__score", F.col("__s") + F.col("__logprior"))
    )
    wd = W.partitionBy("doc_id").orderBy(F.desc("__score"), F.asc("__cl"))
    pred = (
        scored.withColumn("__rn", F.row_number().over(wd))
        .where(F.col("__rn") == 1)
        .select("true_lang", F.col("__cl").alias("pred_lang"))
    )
    return (
        pred.groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("true_lang", "pred_lang")
    )

@q("q_logreg_gd")
def q_logreg_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic regression trained by 8 unrolled gradient-descent steps —
    the third rung of the relational-ML ladder (stump → Naive Bayes →
    an ITERATIVE trained model): weights live in a one-row broadcast
    relation at 1e9 fixed point, each step is one scan computing
    σ(w·x) per row and folding the gradient in exact fixed point, so
    the whole training trajectory is integer-reproducible and the
    oracle replays it as unrolled CTE stages (the kmeans/markov/ALS
    discipline). Features: bias + scaled order value; label: is-urgent.
    Output: final weights + training log-loss and accuracy."""
    o = load_table(spark, sf_dir, "orders").select(
        (F.col("o_totalprice") / 100000).alias("__x"),
        (F.col("o_orderpriority") == "1-URGENT").cast("int").alias("__y"),
    ).localCheckpoint(eager=False)
    S = 1_000_000_000
    w = spark.createDataFrame([(0, 0)], "w0 long, w1 long")
    eta = 1.0
    for _ in range(8):
        j = o.crossJoin(F.broadcast(w))
        z = (
            F.col("w0").cast("double") / S
            + F.col("w1").cast("double") / S * F.col("__x")
        )
        p = 1.0 / (1.0 + F.exp(-z))
        g0 = F.round((F.col("__y") - p) * S).cast("long")
        g1 = F.round((F.col("__y") - p) * F.col("__x") * S).cast("long")
        grad = j.agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(g0).alias("__g0"),
            F.sum(g1).alias("__g1"),
            F.max("w0").alias("w0"),
            F.max("w1").alias("w1"),
        )
        w = grad.select(
            (F.col("w0") + F.round(F.lit(eta) * F.col("__g0") / F.col("__n")).cast("long")).alias("w0"),
            (F.col("w1") + F.round(F.lit(eta) * F.col("__g1") / F.col("__n")).cast("long")).alias("w1"),
        ).localCheckpoint(eager=False)
    j = o.crossJoin(F.broadcast(w))
    z = (
        F.col("w0").cast("double") / S
        + F.col("w1").cast("double") / S * F.col("__x")
    )
    p = 1.0 / (1.0 + F.exp(-z))
    ll_term = F.round(
        (
            F.col("__y") * F.log(p) + (1 - F.col("__y")) * F.log(1.0 - p)
        )
        * 1000000
    ).cast("long")
    correct = ((p >= 0.5).cast("int") == F.col("__y")).cast("int")
    return j.agg(
        F.round(F.max("w0").cast("double") / S, 6).alias("w0"),
        F.round(F.max("w1").cast("double") / S, 6).alias("w1"),
        F.round(
            -(F.sum(ll_term).cast("double") / 1000000) / F.count(F.lit(1)), 6
        ).alias("log_loss"),
        F.round(F.sum(correct).cast("double") / F.count(F.lit(1)), 6).alias(
            "accuracy"
        ),
    )
