"""Property tests for the round-2q batch: ANN recall gauge, rank-biased
overlap, n-gram novelty, risk-adjusted returns (oracle parity at sf0.001
is covered by test_oracle_parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.operators.retrieval import (
    rbo_agreement,
    rbo_suffix_weights,
)
from fortune_500_financial_insights_pipeline_spark.operators.text import ngram_novelty
from fortune_500_financial_insights_pipeline_spark.operators.timeseries import (
    risk_adjusted_returns,
)
from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

# round 10: heavyweight suite — excluded from the driver-budget default
# run (pytest.ini addopts), executed in full at every round close
import pytest as _pytest_r10
pytestmark = _pytest_r10.mark.slow



def test_rbo_suffix_weights_monotone_and_bounded():
    w = rbo_suffix_weights(p=0.9, depth=10)
    assert len(w) == 10
    # suffix sums decrease with the first-common depth
    assert all(a > b for a, b in zip(w, w[1:]))
    # identical lists score Σ S[m] = 1 - p^depth (truncated-RBO ceiling)
    total = sum(w) / 10**12
    assert abs(total - (1 - 0.9**10)) < 1e-9


def _leg(spark, rows):
    return spark.createDataFrame(rows, "query_id long, doc_id long, rank int")


def test_rbo_identical_lists_hit_ceiling(spark):
    rows = [(1, d, r) for r, d in enumerate(range(100, 110), start=1)]
    out = rbo_agreement(_leg(spark, rows), _leg(spark, rows)).collect()
    assert len(out) == 1
    assert out[0]["overlap"] == 10
    assert abs(out[0]["rbo"] - (1 - 0.9**10)) < 1e-6


def test_rbo_disjoint_lists_zero(spark):
    a = [(1, d, r) for r, d in enumerate(range(100, 110), start=1)]
    b = [(1, d, r) for r, d in enumerate(range(200, 210), start=1)]
    out = rbo_agreement(_leg(spark, a), _leg(spark, b)).collect()
    assert out[0]["overlap"] == 0
    assert out[0]["rbo"] == 0.0


def test_ngram_novelty_planted_copy(spark):
    base = " ".join(f"tok{i}" for i in range(20))
    other = " ".join(f"alt{i}" for i in range(20))
    df = spark.createDataFrame(
        [(0, base), (1, other), (2, base)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in ngram_novelty(df, n=8).collect()}
    # lowest-id doc owns all its grams; the verbatim copy owns none
    assert out[0]["novelty_rate"] == 1.0
    assert out[1]["novelty_rate"] == 1.0
    assert out[2]["novelty_rate"] == 0.0
    assert out[2]["n_grams"] == 13  # 20 - 8 + 1 distinct windows


def test_risk_adjusted_returns_flat_series_null_sharpe(spark):
    rows = [("a", f"2024-01-{d:02d}", 100.0) for d in range(1, 11)]
    df = spark.createDataFrame(rows, "k string, day string, close double")
    out = risk_adjusted_returns(df, ["k"], ["day"], "close").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_days"] == 9
    assert r["mean_ret"] == 0.0
    assert r["sharpe"] is None  # zero variance
    assert r["sortino"] is None  # no downside


def test_risk_adjusted_returns_downside_only_negative(spark):
    # strictly falling series: sortino defined and negative
    rows = [("a", f"2024-01-{d:02d}", 100.0 - d) for d in range(1, 11)]
    df = spark.createDataFrame(rows, "k string, day string, close double")
    r = risk_adjusted_returns(df, ["k"], ["day"], "close").collect()[0]
    assert r["mean_ret"] < 0
    assert r["sortino"] < 0


def test_ann_recall_bounds(spark, sf_dir):
    out = QUERIES["q_ann_recall"](spark, sf_dir).toPandas()
    assert len(out) == 10
    assert ((out["recall"] >= 0) & (out["recall"] <= 1)).all()
    assert (out["n_hit"] <= 5).all()


def test_curation_report_monotone(spark, sf_dir):
    out = QUERIES["q_curation_report"](spark, sf_dir).toPandas()
    assert list(out["stage"]) == [
        "raw", "exact_dedup", "quality_gate", "repetition_gate", "entropy_band",
    ]
    # survivors never increase; dropped is the exact difference
    ro = list(out["rows_out"])
    assert all(a >= b for a, b in zip(ro, ro[1:]))
    body = out.iloc[1:]
    assert (body["dropped"] == body["rows_in"] - body["rows_out"]).all()
    assert out.iloc[0]["rows_out"] > 0


def test_token_percentiles_ordered(spark, sf_dir):
    out = QUERIES["q_token_percentiles"](spark, sf_dir).toPandas()
    assert len(out) >= 2
    assert (out["p50_tokens"] <= out["p90_tokens"]).all()
    assert (out["p90_tokens"] <= out["p99_tokens"]).all()
    assert (out["p99_tokens"] <= out["max_tokens"]).all()


def test_hill_tail_index_pareto_recovery(spark):
    """On exact Pareto(α=2) order statistics the Hill estimate lands near 2."""
    from fortune_500_financial_insights_pipeline_spark.operators.stats import hill_tail_index

    # deterministic Pareto sample via inverse CDF on a fixed grid
    alpha = 2.0
    rows = [("g", (1.0 - (i + 0.5) / 4000.0) ** (-1.0 / alpha)) for i in range(4000)]
    df = spark.createDataFrame(rows, "g string, x double")
    out = hill_tail_index(df, ["g"], "x", k=50).collect()
    assert len(out) == 1
    assert out[0]["alpha"] is not None
    assert 1.5 <= out[0]["alpha"] <= 2.6


def test_hill_tail_index_small_group_null(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.stats import hill_tail_index

    df = spark.createDataFrame(
        [("g", float(i)) for i in range(10)], "g string, x double"
    )
    out = hill_tail_index(df, ["g"], "x", k=50).collect()
    assert out[0]["alpha"] is None


def test_lsh_recall_planted_dups_recovered(spark, sf_dir):
    """Fixture has planted near-duplicates: truth is non-empty and banding
    at 16/4 captures a usable share (recall is the dial this measures)."""
    out = QUERIES["q_lsh_recall"](spark, sf_dir).collect()[0]
    assert out["n_true"] > 0
    assert 0 <= out["n_captured"] <= out["n_true"]
    assert out["recall"] is not None and 0.0 <= out["recall"] <= 1.0


def test_item_cooccurrence_symmetric_counts(spark, sf_dir):
    out = QUERIES["q_item_cooccurrence"](spark, sf_dir).toPandas()
    assert len(out) > 0
    assert ((out["cosine"] > 0) & (out["cosine"] <= 1.0)).all()
    assert (out.groupby("part_a")["rank"].max() <= 3).all()


def test_mmr_prefers_diverse_over_redundant(spark):
    """Candidates: doc 1 (rel .99), doc 2 (rel .98, duplicate of doc 1),
    doc 3 (rel .60, orthogonal). Pure top-2 returns the duplicate; MMR's
    second pick must be the diverse doc 3."""
    from fortune_500_financial_insights_pipeline_spark.operators.retrieval import mmr_rerank

    cand = spark.createDataFrame(
        [(0, 1, 0.99), (0, 2, 0.98), (0, 3, 0.60)],
        "query_id long, doc_id long, rel double",
    )
    pairs = spark.createDataFrame(
        [(0, 1, 2, 1.0), (0, 2, 1, 1.0),
         (0, 1, 3, 0.0), (0, 3, 1, 0.0),
         (0, 2, 3, 0.0), (0, 3, 2, 0.0)],
        "query_id long, a long, b long, s double",
    )
    out = mmr_rerank(cand, pairs, m=3).collect()
    picks = {r["step"]: r["doc_id"] for r in out}
    assert picks == {1: 1, 2: 3, 3: 2}


def test_mmr_query_selection_sizes(spark, sf_dir):
    out = QUERIES["q_mmr_rerank"](spark, sf_dir).toPandas()
    assert len(out) == 15  # 3 queries x 5 steps
    assert out.groupby("query_id")["doc_id"].nunique().eq(5).all()


def test_quantile_sketch_merge_equals_sketch_of_union(spark):
    """Mergeability: sketch(A ∪ B) == trim(sketch(A) ∪ sketch(B)) — the
    property that lets per-partition sketches fold associatively."""
    from fortune_500_financial_insights_pipeline_spark.operators.kmv import quantile_sketch

    rows_a = [("g", i, float(i)) for i in range(0, 500)]
    rows_b = [("g", i, float(i)) for i in range(500, 1000)]
    schema = "grp string, id long, v double"
    a, b = spark.createDataFrame(rows_a, schema), spark.createDataFrame(rows_b, schema)
    direct = quantile_sketch(a.union(b), ["grp"], "id", "v", k=64).collect()
    merged = quantile_sketch(
        quantile_sketch(a, ["grp"], "id", "v", k=64).union(
            quantile_sketch(b, ["grp"], "id", "v", k=64)
        ),
        ["grp"], "id", "v", k=64,
    ).collect()
    assert sorted((r["id"], r["v"]) for r in direct) == sorted(
        (r["id"], r["v"]) for r in merged
    )


def test_quantile_sketch_rank_error_bounded(spark, sf_dir):
    """Estimate vs exact percentile: the k=64 sample's p50 must land within
    a loose rank band of the true p50 (3σ of the binomial rank spread)."""
    import math

    from fortune_500_financial_insights_pipeline_spark.catalog import load_table

    out = {r["o_orderpriority"]: r for r in QUERIES["q_quantile_sketch"](spark, sf_dir).collect()}
    o = load_table(spark, sf_dir, "orders")
    exact = {
        r["o_orderpriority"]: r
        for r in o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("percentile(CAST(o_totalprice AS DOUBLE), 0.5)").alias("p50"),
            F.expr("percentile(CAST(o_totalprice AS DOUBLE), array(0.2, 0.8))").alias("band"),
        )
        .collect()
    }
    for key, e in exact.items():
        est = out[key]["est_p50"]
        # 3σ rank tolerance at k=64 is ±0.1875 of rank space: check the
        # estimate lies within the exact [p20, p80] band — loose but
        # catches a broken sampler (uniformity or trim bugs) instantly
        lo, hi = e["band"]
        assert lo <= est <= hi, f"{key}: est_p50={est} outside [{lo}, {hi}]"
        assert math.isfinite(est)


def test_assortativity_star_is_negative(spark):
    """A star graph is maximally disassortative: r = -1."""
    from fortune_500_financial_insights_pipeline_spark.operators.graph import (
        degree_assortativity,
    )

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 8)], "id_a long, id_b long"
    )
    out = degree_assortativity(edges).collect()[0]
    assert out["n_directed_edges"] == 14
    assert abs(out["assortativity"] - (-1.0)) < 1e-6


def test_assortativity_regular_graph_null(spark):
    """A cycle is degree-regular: zero variance, r undefined (NULL)."""
    from fortune_500_financial_insights_pipeline_spark.operators.graph import (
        degree_assortativity,
    )

    n = 6
    edges = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "id_a long, id_b long"
    )
    out = degree_assortativity(edges).collect()[0]
    assert out["assortativity"] is None


def test_modularity_two_cliques_positive(spark):
    """Two disjoint triangles labeled by their own component: Q = 0.5
    (maximum for two equal communities with no inter-edges)."""
    from fortune_500_financial_insights_pipeline_spark.operators.graph import modularity

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12)],
        "id_a long, id_b long",
    )
    comm = spark.createDataFrame(
        [(0, "x"), (1, "x"), (2, "x"), (10, "y"), (11, "y"), (12, "y")],
        "node long, community string",
    )
    out = modularity(edges, comm).toPandas()
    assert abs(out["q_contrib"].sum() - 0.5) < 1e-6
    assert (out["m_c"] == 3).all()


def test_modularity_anti_community_negative(spark):
    """Bipartite edges labeled by side: all edges cross communities, Q < 0."""
    from fortune_500_financial_insights_pipeline_spark.operators.graph import modularity

    edges = spark.createDataFrame(
        [(i, 100 + j) for i in range(3) for j in range(3)], "id_a long, id_b long"
    )
    comm = spark.createDataFrame(
        [(i, "l") for i in range(3)] + [(100 + j, "r") for j in range(3)],
        "node long, community string",
    )
    out = modularity(edges, comm).toPandas()
    assert out["q_contrib"].sum() < 0
    assert (out["m_c"] == 0).all()


def test_did_cells_cover_all_events(spark, sf_dir):
    out = QUERIES["q_did"](spark, sf_dir).collect()[0]
    total = (
        out["n_treat_pre"] + out["n_treat_post"]
        + out["n_ctrl_pre"] + out["n_ctrl_post"]
    )
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table

    assert total == load_table(spark, sf_dir, "events").count()
    # the DiD identity holds over the reported means
    expect = round(
        (out["mean_treat_post"] - out["mean_treat_pre"])
        - (out["mean_ctrl_post"] - out["mean_ctrl_pre"]),
        5,
    )
    assert abs(out["did_estimate"] - expect) < 1e-4


def test_skipgram_pairs_symmetric(spark, sf_dir):
    """Every (center, context, dist) pair count equals its mirror — the
    union construction is symmetric by design."""
    out = QUERIES["q_skipgram_pairs"](spark, sf_dir).toPandas()
    assert len(out) > 0
    counts = {(r.center, r.context, r.dist): r.n_pairs for r in out.itertuples()}
    for (c, x, d), n in counts.items():
        assert counts.get((x, c, d)) == n


def test_bootstrap_ci_brackets_mean(spark, sf_dir):
    """CI must bracket the bootstrap mean and have positive width; each
    group reports all 32 resamples (p=0.5 sampling never empties a
    resample at fixture scale)."""
    out = QUERIES["q_bootstrap_ci"](spark, sf_dir).toPandas()
    assert (out["n_resamples"] == 32).all()
    assert (out["ci_lo"] <= out["boot_mean"]).all()
    assert (out["boot_mean"] <= out["ci_hi"]).all()
    assert (out["ci_hi"] > out["ci_lo"]).all()


def test_rag_context_pack_budget_and_prefix(spark, sf_dir):
    out = QUERIES["q_rag_context_pack"](spark, sf_dir).toPandas()
    assert len(out) > 0
    assert (out["cum_tokens"] <= 256).all()
    # kept ranks form a prefix: 1..n per query, no holes
    for _, g in out.groupby("query_id"):
        assert list(g["rank"]) == list(range(1, len(g) + 1))


def test_interarrival_positive_ordered(spark, sf_dir):
    out = QUERIES["q_interarrival"](spark, sf_dir).toPandas()
    assert len(out) == 5
    assert (out["p50_gap_s"] >= 0).all()
    assert (out["p50_gap_s"] <= out["p90_gap_s"]).all()


def test_lorenz_deciles_monotone_to_one(spark, sf_dir):
    out = QUERIES["q_lorenz_deciles"](spark, sf_dir).toPandas()
    assert len(out) == 10
    cs = list(out.sort_values("decile")["cum_share"])
    assert all(a <= b for a, b in zip(cs, cs[1:]))
    assert abs(cs[-1] - 1.0) < 1e-6
    # Lorenz curve lies under the diagonal (top decile holds > 10%)
    assert cs[0] < 0.1


def test_k_anonymity_consistency(spark, sf_dir):
    out = QUERIES["q_k_anonymity"](spark, sf_dir).collect()[0]
    assert out["n_classes"] > 0
    assert out["min_class_size"] >= 1
    assert out["n_classes_below_k"] <= out["n_classes"]
    assert out["n_rows_at_risk"] >= out["n_classes_below_k"] * 1
    assert 0.0 <= out["risk_frac"] <= 1.0
    assert out["min_l_diversity"] >= 1


def test_adamic_adar_watchlist_and_positive(spark, sf_dir):
    out = QUERIES["q_adamic_adar"](spark, sf_dir).toPandas()
    assert 0 < len(out) <= 20
    assert (out["aa"] > 0).all()
    assert (out["n_common"] >= 1).all()
    assert (out["pa"] <= 100).all()  # candidate side is watchlist-bounded
    assert (out["pa"] != out["pb"]).all()


def test_cuped_reduces_or_keeps_variance(spark, sf_dir):
    out = QUERIES["q_cuped"](spark, sf_dir).collect()[0]
    assert out["n_users"] > 0
    assert 0.0 <= out["var_reduction"] <= 1.0
    # CUPED on a synthetic frame with a strong pre/post correlation must
    # recover theta ~ slope and shrink the effect's covariate component
    import math

    assert math.isfinite(out["theta"])


def test_cuped_recovers_planted_effect(spark):
    """Y = X + effect·T (+0 noise): CUPED removes the X component exactly,
    leaving the planted effect; rho^2 is high by construction."""
    rows = []
    for uid in range(200):
        x = float((uid * 37) % 100)
        t = 1 if uid % 2 == 0 else 0
        y = x + 5.0 * t
        rows.append((uid, x, y, t))
    # feed through the same moment algebra via a temp view + the query's
    # internal math replicated over a hand-built frame
    df = spark.createDataFrame(rows, "user_id long, x double, y double, t int")
    from pyspark.sql import functions as FF

    m = df.agg(
        FF.count(FF.lit(1)).alias("n"),
        FF.sum("x").alias("sx"), FF.sum("y").alias("sy"),
        FF.sum(FF.col("x") * FF.col("y")).alias("sxy"),
        FF.sum(FF.col("x") * FF.col("x")).alias("sxx"),
        FF.sum(FF.col("t").cast("double")).alias("nt"),
        FF.sum(FF.when(FF.col("t") == 1, FF.col("x")).otherwise(0.0)).alias("sxt"),
        FF.sum(FF.when(FF.col("t") == 1, FF.col("y")).otherwise(0.0)).alias("syt"),
    ).collect()[0]
    n = float(m["n"])
    theta = (n * m["sxy"] - m["sx"] * m["sy"]) / (n * m["sxx"] - m["sx"] * m["sx"])
    nt, nc = m["nt"], n - m["nt"]
    eff = (m["syt"] / nt - theta * m["sxt"] / nt) - (
        (m["sy"] - m["syt"]) / nc - theta * (m["sx"] - m["sxt"]) / nc
    )
    assert abs(eff - 5.0) < 0.5  # raw effect is confounded by X; CUPED isn't


def test_hash_collision_qa_bounds(spark, sf_dir):
    out = QUERIES["q_hash_collision_qa"](spark, sf_dir).collect()[0]
    assert 1 <= out["n_buckets_used"] <= 256
    assert out["max_load"] >= 1
    assert out["skew_ratio"] >= 1.0
    assert out["n_terms"] >= out["n_buckets_used"]


def test_markov_attribution_shares_sum_to_one(spark, sf_dir):
    out = QUERIES["q_markov_attribution"](spark, sf_dir).toPandas()
    assert len(out) == 4
    assert ((out["removal_effect"] >= 0) & (out["removal_effect"] <= 1)).all()
    assert abs(out["attribution_share"].sum() - 1.0) < 1e-4
    assert ((out["p_conv_without"] >= 0) & (out["p_conv_without"] <= 1)).all()


def test_markov_attribution_single_channel_chain(spark):
    """A chain where every conversion runs through one channel: removing
    it kills all conversions (removal effect 1.0, full credit)."""
    from fortune_500_financial_insights_pipeline_spark.operators.paths import (
        markov_removal_attribution,
    )

    # START -> a (p=1); a -> CONV (p=.5), a -> NULL (p=.5); channel b unused
    trans = spark.createDataFrame(
        [("START", "a", 1000000), ("a", "CONV", 500000), ("a", "NULL", 500000),
         ("START", "b", 0), ("b", "NULL", 1000000)],
        "from_state string, to_state string, t6 long",
    )
    out = {r["channel"]: r for r in markov_removal_attribution(
        trans, ["a", "b"], k_iter=8).collect()}
    assert out["a"]["p_conv_without"] == 0.0
    assert abs(out["a"]["removal_effect"] - 1.0) < 1e-6
    assert abs(out["a"]["attribution_share"] - 1.0) < 1e-6
    assert out["b"]["removal_effect"] <= 1e-6


def test_shapley_efficiency_axiom(spark, sf_dir):
    """Σφ must equal v(full) − v(∅) (Shapley efficiency), and shares sum
    to 1 when the total effect is non-zero."""
    out = QUERIES["q_shapley_attribution"](spark, sf_dir).toPandas()
    assert len(out) == 4
    assert abs(out["attribution_share"].sum() - 1.0) < 1e-4


def test_eventually_follows_superset_of_directly_follows(spark, sf_dir):
    """Every directly-follows pair (adjacent transition) must also appear
    in the eventually-follows matrix with at least as much support."""
    ef = QUERIES["q_eventually_follows"](spark, sf_dir).toPandas()
    tm = QUERIES["q_transition_matrix"](spark, sf_dir).toPandas()
    ef_pairs = set(zip(ef["type_a"], ef["type_b"]))
    for a, b in zip(tm["from_state"], tm["to_state"]):
        assert (a, b) in ef_pairs
    assert ((ef["support"] > 0) & (ef["support"] <= 1)).all()


def test_transition_latency_positive_ordered(spark, sf_dir):
    out = QUERIES["q_transition_latency"](spark, sf_dir).toPandas()
    assert len(out) == 25  # 5x5 event types at fixture scale
    assert (out["p50_s"] >= 0).all()
    assert (out["p50_s"] <= out["p90_s"]).all()


def test_ivf_balance_covers_corpus(spark, sf_dir):
    out = QUERIES["q_ivf_balance"](spark, sf_dir).toPandas()
    assert 1 <= len(out) <= 16
    assert abs(out["share"].sum() - 1.0) < 1e-4
    assert (out["n_vecs"] >= 1).all()


def test_seasonal_anomalies_exceed_threshold(spark, sf_dir):
    out = QUERIES["q_seasonal_anomalies"](spark, sf_dir).toPandas()
    # every flagged day genuinely exceeds its threshold; thresholds positive
    assert (out["deviation"] > out["threshold"] - 1e-9).all()
    assert (out["threshold"] > 0).all()


def test_sax_motifs_recur(spark, sf_dir):
    out = QUERIES["q_sax_motifs"](spark, sf_dir).toPandas()
    assert (out["n_occurrences"] >= 2).all()
    assert out["word"].str.len().eq(3).all()
    assert out["word"].str.fullmatch("[abcd]{3}").all()


def test_mixture_kl_near_uniform_fixture(spark, sf_dir):
    out = QUERIES["q_mixture_kl"](spark, sf_dir).toPandas()
    assert len(out) == 20
    assert abs(out["share"].sum() - 1.0) < 1e-3
    # uniform-by-construction sources: total KL is small but defined
    assert out["kl_term"].notna().all()


def test_pr_curve_monotone_recall(spark, sf_dir):
    out = QUERIES["q_pr_curve"](spark, sf_dir).toPandas().sort_values("threshold")
    # recall is non-increasing as the threshold rises; counts reconcile
    rc = out["recall"].tolist()
    assert all(a >= b - 1e-9 for a, b in zip(rc, rc[1:]))
    assert ((out["tp"] + out["fn"]).nunique() == 1)  # positives constant


def test_lift_deciles_first_above_last(spark, sf_dir):
    out = QUERIES["q_lift_deciles"](spark, sf_dir).toPandas().sort_values("decile")
    assert len(out) == 10
    assert abs(out.iloc[-1]["cum_gain"] - 1.0) < 1e-6
    # ranked by a real signal: the top decile lifts above the bottom one
    assert out.iloc[0]["lift"] >= out.iloc[-1]["lift"]


def test_abc_classes_partition_revenue(spark, sf_dir):
    out = QUERIES["q_abc_analysis"](spark, sf_dir).toPandas()
    assert list(out["abc_class"]) == ["A", "B", "C"]
    assert abs(out["revenue_share"].sum() - 1.0) < 1e-4
    # A holds the bulk of revenue with a minority of parts
    a, c = out.iloc[0], out.iloc[2]
    assert a["revenue_share"] > c["revenue_share"]


def test_zipf_slope_negative(spark, sf_dir):
    out = QUERIES["q_zipf_slope"](spark, sf_dir).collect()[0]
    assert 10 <= out["n_terms"] <= 100  # sf0.001's vocab is < 100 terms
    assert out["zipf_slope"] < 0  # frequency falls with rank, always


def test_heaps_curve_monotone(spark, sf_dir):
    out = QUERIES["q_heaps_curve"](spark, sf_dir).toPandas().sort_values("checkpoint")
    vs = out["vocab_size"].tolist()
    assert all(a < b for a, b in zip(vs, vs[1:])) or len(vs) == 1
    assert (out["new_terms"] >= 1).all()


def test_kaplan_meier_monotone_nonincreasing(spark, sf_dir):
    out = QUERIES["q_kaplan_meier"](spark, sf_dir).toPandas().sort_values("t")
    s = out["survival"].tolist()
    assert all(a >= b - 1e-9 for a, b in zip(s, s[1:]))
    assert ((out["survival"] >= 0) & (out["survival"] <= 1)).all()
    # risk sets shrink over time
    nr = out["n_risk"].tolist()
    assert all(a >= b for a, b in zip(nr, nr[1:]))


def test_var_backtest_sane(spark, sf_dir):
    out = QUERIES["q_var_backtest"](spark, sf_dir).collect()[0]
    assert out["n_test"] > 0
    assert 0 <= out["n_breaches"] <= out["n_test"]
    assert out["kupiec_lr"] >= -1e-9  # LR statistic is non-negative
    assert out["var95"] < 0  # 5% lower tail of returns is a loss


def test_partition_health_covers_months(spark, sf_dir):
    out = QUERIES["q_partition_health"](spark, sf_dir).toPandas()
    assert len(out) > 12
    assert (out["null_rate_price"] == 0.0).all()  # fixture has no nulls
    assert out["volume_drop"].isin([0, 1]).all()


def test_als_rank1_factors_positive_on_positive_ratings(spark, sf_dir):
    """All quantities are positive, so rank-1 factors stay positive and
    the ranking is a real preference signal (not sign-flipped noise)."""
    out = QUERIES["q_als_rank1"](spark, sf_dir).toPandas()
    assert 0 < len(out) <= 20
    assert (out["v"] > 0).all()
    vs = out["v"].tolist()
    assert all(a >= b for a, b in zip(vs, vs[1:]))


def test_ppr_seeds_rank_highest(spark, sf_dir):
    """Teleport concentrates on the seeds, so the 5 seed suppliers must
    dominate the top of the personalized ranking."""
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table

    out = QUERIES["q_ppr"](spark, sf_dir).toPandas()
    assert len(out) == 20
    seeds = {
        r["s_suppkey"]
        for r in load_table(spark, sf_dir, "supplier")
        .where(F.col("s_suppkey") <= 5)
        .select("s_suppkey")
        .collect()
    }
    top = set(out.head(len(seeds))["node"])
    assert top == seeds
    assert (out["rank_fp"] > 0).all()


def test_reconciliation_header_equals_lines_shape(spark, sf_dir):
    out = QUERIES["q_reconciliation"](spark, sf_dir).toPandas()
    assert len(out) == 20
    # the report surfaces the LARGEST discrepancies first
    ad = out["abs_diff"].tolist()
    assert all(a >= b for a, b in zip(ad, ad[1:]))
    assert (out["line_total"] >= 0).all()


def test_burrows_delta_symmetric_pairs_positive(spark, sf_dir):
    out = QUERIES["q_burrows_delta"](spark, sf_dir).toPandas()
    assert len(out) == 190  # C(20, 2) source pairs
    assert (out["delta"] >= 0).all()
    assert (out["src_a"] < out["src_b"]).all()


def test_hits_scores_normalized(spark, sf_dir):
    out = QUERIES["q_hits"](spark, sf_dir).toPandas()
    assert set(out["role"]) == {"hub", "authority"}
    assert ((out["score"] > 0) & (out["score"] <= 1.0)).all()
    # the max-normalized leader of each role scores exactly 1.0
    for role, g in out.groupby("role"):
        assert abs(g["score"].max() - 1.0) < 1e-9
        assert len(g) == 10


def test_lead_lag_corr_full_lag_range(spark, sf_dir):
    out = QUERIES["q_lead_lag_corr"](spark, sf_dir).toPandas()
    assert list(out["lag"]) == list(range(-5, 6))
    defined = out["ccf"].dropna()
    assert ((defined >= -1.0) & (defined <= 1.0)).all()


def test_control_chart_limits_bracket_center(spark, sf_dir):
    out = QUERIES["q_control_chart"](spark, sf_dir).toPandas()
    assert len(out) == 30  # one month of days
    assert (out["lcl"] <= out["center"]).all()
    assert (out["center"] <= out["ucl"]).all()
    flagged = out[out["out_of_control"] == 1]
    ok = out[out["out_of_control"] == 0]
    assert ((ok["n_errors"] <= ok["ucl"]) & (ok["n_errors"] >= ok["lcl"])).all()
    if len(flagged):
        assert (
            (flagged["n_errors"] > flagged["ucl"])
            | (flagged["n_errors"] < flagged["lcl"])
        ).all()


def test_simpsons_check_reports_all_strata(spark, sf_dir):
    out = QUERIES["q_simpsons_check"](spark, sf_dir).toPandas()
    assert len(out) == 3  # return flags A/N/R
    assert out["r_pooled"].nunique() == 1
    assert out["sign_flip"].isin([0, 1]).all()


def test_ab_srm_parity_split_balanced(spark, sf_dir):
    out = QUERIES["q_ab_srm"](spark, sf_dir).toPandas()
    assert len(out) == 5
    assert (out["chi2"] >= 0).all()
    # flags agree with the 3.841 cut
    assert ((out["chi2"] > 3.841) == (out["srm_flag"] == 1)).all()


def test_pvm_bridge_identity(spark, sf_dir):
    """ΔRev must decompose exactly: vol + price + mix + new − disc."""
    r = QUERIES["q_pvm_bridge"](spark, sf_dir).collect()[0]
    delta = r["rev_1997"] - r["rev_1996"]
    recon = (
        r["volume_effect"] + r["price_effect"] + r["mix_effect"]
        + r["new_parts"] - r["discontinued"]
    )
    assert abs(delta - recon) < 1e-2  # round-6 terms over thousands of parts
    assert r["rev_1996"] > 0 and r["rev_1997"] > 0


def test_fulfillment_lag_ordered_percentiles(spark, sf_dir):
    out = QUERIES["q_fulfillment_lag"](spark, sf_dir).toPandas()
    assert len(out) == 5
    assert (out["p50_days"] <= out["p90_days"]).all()
    assert ((out["within_30d_rate"] >= 0) & (out["within_30d_rate"] <= 1)).all()


def test_ingestion_drift_covers_cohorts(spark, sf_dir):
    out = QUERIES["q_ingestion_drift"](spark, sf_dir).toPandas()
    assert len(out) == 10
    assert ((out["avg_quality"] >= 0) & (out["avg_quality"] <= 1)).all()
    assert ((out["en_share"] >= 0) & (out["en_share"] <= 1)).all()


def test_embedding_isotropy_bounds(spark, sf_dir):
    r = QUERIES["q_embedding_isotropy"](spark, sf_dir).collect()[0]
    assert r["n_vecs"] > 0
    # the mean vector can never be longer than the average norm
    assert 0 <= r["anisotropy_ratio"] <= 1.0 + 1e-9
    assert r["avg_norm"] > 0


def test_exposure_fairness_shares_sum_to_one(spark, sf_dir):
    out = QUERIES["q_exposure_fairness"](spark, sf_dir).toPandas()
    assert abs(out["result_share"].sum() - 1.0) < 1e-3
    assert abs(out["exposure_share"].sum() - 1.0) < 1e-3
    assert (out["exposure"] > 0).all()


def test_dedup_threshold_curve_monotone(spark, sf_dir):
    out = QUERIES["q_dedup_threshold_curve"](spark, sf_dir).toPandas()
    assert len(out) >= 1
    s = out.sort_values("threshold")
    # cumulative counts fall (weakly) as the threshold rises
    c = s["cum_pairs_at_or_above"].tolist()
    assert all(a >= b for a, b in zip(c, c[1:]))
    assert (s["threshold"] >= 0.3).all()


def test_fk_orphans_clean_fixture(spark, sf_dir):
    out = QUERIES["q_fk_orphans"](spark, sf_dir).toPandas()
    assert len(out) == 6
    # synthetic star schema is referentially intact
    assert (out["n_orphans"] == 0).all()
    assert (out["orphan_rate"] == 0.0).all()
    assert (out["n_child_rows"] > 0).all()


def test_duplicate_payments_detects_planted(spark, sf_dir):
    """The round-8 coarse candidate key (custkey, floor(total/1000))
    yields a NON-EMPTY screen on the fixture (the r7 verdict's vacuous
    zero-row finding), and the grouping rule itself must flag a planted
    re-keyed double-post (same customer, amounts in the same bucket,
    different dates)."""
    out = QUERIES["q_duplicate_payments"](spark, sf_dir)
    assert out.columns == [
        "o_custkey", "amount_k", "n_orders",
        "first_orderkey", "last_orderkey",
    ]
    assert out.count() > 0  # non-vacuous at every fixture SF
    planted = spark.createDataFrame(
        [(1, 7, 99500.0, "1995-01-01"), (2, 7, 99700.5, "1995-02-09"),
         (3, 8, 50000.0, "1995-01-02")],
        "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate string",
    )
    dup = (
        planted.groupBy(
            "o_custkey",
            F.floor(F.col("o_totalprice") / 1000).cast("long").alias("amount_k"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") >= 2)
        .collect()
    )
    assert len(dup) == 1 and dup[0]["n_orders"] == 2


def test_seasonality_index_averages_to_one(spark, sf_dir):
    out = QUERIES["q_seasonality_index"](spark, sf_dir).toPandas()
    assert len(out) == 12
    # day-weighted mean of the index is ~1 by construction
    w = (out["index"] * out["n_days"]).sum() / out["n_days"].sum()
    assert abs(w - 1.0) < 0.01


def test_price_dispersion_savings_nonnegative(spark, sf_dir):
    out = QUERIES["q_price_dispersion"](spark, sf_dir).toPandas()
    assert 0 < len(out) <= 20
    assert (out["savings_potential"] >= 0).all()
    assert (out["min_unit_price"] <= out["mean_unit_price"] + 1e-6).all()
    assert (out["n_suppliers"] >= 2).all()


def test_png_dimensions_roundtrip(spark):
    """Planted (w, h) must come back exactly from the IHDR bytes."""
    from fortune_500_financial_insights_pipeline_spark.operators.multimodal import (
        png_dimensions,
    )

    df = spark.createDataFrame([(640, 480), (1, 1), (65535, 2)], "w int, h int")
    payload = F.unhex(
        F.concat(
            F.lit("89504E470D0A1A0A0000000D49484452"),
            F.lpad(F.conv(F.col("w").cast("string"), 10, 16), 8, "0"),
            F.lpad(F.conv(F.col("h").cast("string"), 10, 16), 8, "0"),
            F.lit("0806000000"),
        )
    )
    pw, ph = png_dimensions(payload)
    out = df.select("w", "h", pw.alias("pw"), ph.alias("ph")).collect()
    for r in out:
        assert r["pw"] == r["w"] and r["ph"] == r["h"]


def test_image_dims_orientations_partition(spark, sf_dir):
    out = QUERIES["q_image_dims"](spark, sf_dir).toPandas()
    assert set(out["orientation"]) <= {"landscape", "portrait", "square"}
    assert out["n_images"].sum() == 500 * int(
        {"0.001": 1, "0.01": 10}.get(sf_dir.rsplit("sf", 1)[-1].rstrip("/"), 1)
    ) or out["n_images"].sum() > 0


def test_wav_meta_roundtrip(spark):
    """Planted (rate, channels, bytes) must come back exactly from real
    little-endian RIFF header bytes."""
    from fortune_500_financial_insights_pipeline_spark.operators.multimodal import wav_meta
    import struct

    rows = [(44100, 2, 44100 * 4 * 3), (8000, 1, 8000 * 2 * 10)]
    payloads = []
    for sr, ch, nb in rows:
        hdr = (
            b"RIFF" + struct.pack("<I", nb + 36) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + struct.pack("<H", 1)
            + struct.pack("<H", ch) + struct.pack("<I", sr)
            + struct.pack("<I", sr * 2 * ch) + struct.pack("<H", ch * 2)
            + struct.pack("<H", 16) + b"data" + struct.pack("<I", nb)
        )
        payloads.append((sr, ch, nb, bytearray(hdr)))
    df = spark.createDataFrame(payloads, "sr int, ch int, nb long, media binary")
    r, c, b = wav_meta(F.col("media"))
    for row in df.select("sr", "ch", "nb", r.alias("pr"), c.alias("pc"), b.alias("pb")).collect():
        assert (row["pr"], row["pc"], row["pb"]) == (row["sr"], row["ch"], row["nb"])


def test_audio_meta_profile(spark, sf_dir):
    out = QUERIES["q_audio_meta"](spark, sf_dir).toPandas()
    assert set(out["sample_rate"]) == {8000, 16000, 44100, 48000}
    assert (out["total_hours"] > 0).all()
    assert ((out["stereo_share"] >= 0) & (out["stereo_share"] <= 1)).all()


def test_mp4_meta_roundtrip(spark):
    """Planted (brand, timescale, ticks) recovered from real box bytes."""
    import struct

    from fortune_500_financial_insights_pipeline_spark.operators.multimodal import mp4_meta

    def clip(brand, ts, ticks):
        ftyp = struct.pack(">I", 16) + b"ftyp" + brand + struct.pack(">I", 0)
        mvhd = (
            struct.pack(">I", 0x6C) + b"mvhd" + b"\x00" * 4
            + struct.pack(">I", 0) + struct.pack(">I", 0)
            + struct.pack(">I", ts) + struct.pack(">I", ticks)
        )
        moov = struct.pack(">I", 0x74) + b"moov" + mvhd
        return bytearray(ftyp + moov)

    rows = [("isom", 600, 3000), ("mp42", 90000, 90000 * 7)]
    df = spark.createDataFrame(
        [(b, t, k, clip(b.encode().ljust(4), t, k)) for b, t, k in rows],
        "brand string, ts long, ticks long, media binary",
    )
    br, ts, dur = mp4_meta(F.col("media"))
    for r in df.select("brand", "ts", "ticks", br.alias("pb"), ts.alias("pt"), dur.alias("pd")).collect():
        assert (r["pb"], r["pt"], r["pd"]) == (r["brand"], r["ts"], r["ticks"])


def test_video_meta_profile(spark, sf_dir):
    out = QUERIES["q_video_meta"](spark, sf_dir).toPandas()
    assert set(out["brand"]) == {"isom", "mp42", "qt"}
    assert (out["total_hours"] > 0).all()


def test_script_mismatch_latin_langs_ascii(spark, sf_dir):
    out = QUERIES["q_script_mismatch"](spark, sf_dir).toPandas()
    assert len(out) == 5
    assert ((out["avg_ascii_share"] >= 0) & (out["avg_ascii_share"] <= 1)).all()


def test_below_list_price_rates_bounded(spark, sf_dir):
    out = QUERIES["q_below_list_price"](spark, sf_dir).toPandas()
    assert len(out) == 25  # TPC-H brand count
    assert ((out["below_list_rate"] >= 0) & (out["below_list_rate"] <= 1)).all()
    assert (out["revenue_leakage"] >= 0).all()
    assert (out["n_below_list"] <= out["n_lines"]).all()


def test_lsh_s_curve_monotone_theory(spark, sf_dir):
    out = QUERIES["q_lsh_s_curve"](spark, sf_dir).toPandas().sort_values("jac_band")
    # theoretical capture rises with similarity; observed stays in [0,1]
    t = out["theoretical_rate"].tolist()
    assert all(a <= b for a, b in zip(t, t[1:]))
    assert ((out["observed_rate"] >= 0) & (out["observed_rate"] <= 1)).all()
    assert (out["n_caught"] <= out["n_true"]).all()


def test_window_distinct_bounded(spark, sf_dir):
    out = QUERIES["q_window_distinct"](spark, sf_dir).toPandas()
    assert len(out) > 0
    assert ((out["distinct_parts_20"] >= 1) & (out["distinct_parts_20"] <= 20)).all()


def test_grouping_id_levels(spark, sf_dir):
    out = QUERIES["q_grouping_id"](spark, sf_dir).toPandas()
    # detail rows (0), per-region subtotals (1), grand total (3)
    assert set(out["level_id"]) == {0, 1, 3}
    grand = out[out["level_id"] == 3]
    assert len(grand) == 1
    assert grand.iloc[0]["n_cust"] == out[out["level_id"] == 0]["n_cust"].sum()


def test_collocations_min_count_and_finite(spark, sf_dir):
    import math

    out = QUERIES["q_collocations"](spark, sf_dir).toPandas()
    assert 0 < len(out) <= 20
    assert (out["n_pair"] >= 5).all()
    assert out["pmi"].map(math.isfinite).all()


def test_overdispersion_fano_positive(spark, sf_dir):
    out = QUERIES["q_overdispersion"](spark, sf_dir).toPandas()
    assert len(out) == 5
    assert (out["fano"] > 0).all()
    assert (out["mean_daily"] > 0).all()


def test_dp_release_noise_scale(spark, sf_dir):
    """Laplace(b=1) noise: median |noise| should be near ln(2) ≈ 0.69,
    and every release differs from truth by exactly its noise."""
    out = QUERIES["q_dp_release"](spark, sf_dir).toPandas()
    assert len(out) == 25
    assert (abs(out["released_count"] - out["true_count"] - out["noise"]) < 1e-6).all()
    med = out["noise"].abs().median()
    assert 0.1 < med < 2.5  # loose band around ln(2) for 25 draws


def test_decision_stump_positive_gain(spark, sf_dir):
    r = QUERIES["q_decision_stump"](spark, sf_dir).collect()[0]
    assert r["gini_gain"] >= 0
    assert r["n_l"] > 0 and r["n_r"] > 0
    assert 0 <= r["gini_parent"] <= 0.5


def test_naive_bayes_beats_chance(spark, sf_dir):
    out = QUERIES["q_naive_bayes"](spark, sf_dir).toPandas()
    total = out["n_docs"].sum()
    correct = out[out["true_lang"] == out["pred_lang"]]["n_docs"].sum()
    # 5 balanced-ish classes: the trained classifier must beat 1/5 chance
    assert correct / total > 0.2
    assert total > 0


def test_logreg_gd_trains(spark, sf_dir):
    import math

    r = QUERIES["q_logreg_gd"](spark, sf_dir).collect()[0]
    assert math.isfinite(r["w0"]) and math.isfinite(r["w1"])
    # trained loss beats the w=0 starting loss ln(2)
    assert r["log_loss"] < math.log(2)
    assert 0.0 <= r["accuracy"] <= 1.0


def test_knn_classifier_confusion_totals(spark, sf_dir):
    out = QUERIES["q_knn_classifier"](spark, sf_dir).toPandas()
    assert out["n_vecs"].sum() == 50
    assert (out["n_vecs"] >= 1).all()


def test_silhouette_in_range(spark, sf_dir):
    out = QUERIES["q_silhouette"](spark, sf_dir).toPandas()
    assert 1 <= len(out) <= 8
    assert ((out["avg_silhouette"] >= -1.0) & (out["avg_silhouette"] <= 1.0)).all()
    assert out["n_vecs"].sum() > 0


def test_bytes_per_token_at_least_one(spark, sf_dir):
    out = QUERIES["q_bytes_per_token"](spark, sf_dir).toPandas()
    assert len(out) == 5
    # a whitespace token is at least 1 byte + separator amortization
    assert (out["bytes_per_ws_token"] > 1.0).all()
    assert (out["bytes_per_bpe_token"] > 0).all()


def test_vocab_overlap_pairs_complete(spark, sf_dir):
    out = QUERIES["q_vocab_overlap_langs"](spark, sf_dir).toPandas()
    assert len(out) == 10  # C(5,2)
    assert ((out["vocab_jaccard"] >= 0) & (out["vocab_jaccard"] <= 1)).all()


def test_topk_stability_rank1_stable(spark, sf_dir):
    out = QUERIES["q_topk_stability"](spark, sf_dir).toPandas()
    assert len(out) == 20
    assert ((out["stability"] >= 0) & (out["stability"] <= 1)).all()
    # the clear leader survives every leave-one-fold-out variant
    assert out.iloc[0]["stability"] == 1.0


def test_runs_test_consistency(spark, sf_dir):
    r = QUERIES["q_runs_test"](spark, sf_dir).collect()[0]
    n = r["n_pos"] + r["n_neg"]
    assert 1 <= r["n_runs"] <= n
    assert 1.0 <= r["expected_runs"] <= n
    import math

    assert math.isfinite(r["z_score"])


def test_amihud_positive(spark, sf_dir):
    out = QUERIES["q_amihud"](spark, sf_dir).toPandas()
    assert len(out) == 10
    assert (out["amihud_illiq"] >= 0).all()


def test_cohens_d_bands_match_values(spark, sf_dir):
    out = QUERIES["q_cohens_d"](spark, sf_dir).toPandas()
    assert len(out) == 5
    for _, r in out.iterrows():
        d = abs(r["cohens_d"])
        expect = (
            "negligible" if d < 0.2 else "small" if d < 0.5
            else "medium" if d < 0.8 else "large"
        )
        assert r["effect_band"] == expect


def test_price_stickiness_bounded(spark, sf_dir):
    out = QUERIES["q_price_stickiness"](spark, sf_dir).toPandas()
    assert len(out) == 25
    assert ((out["change_frequency"] >= 0) & (out["change_frequency"] <= 1)).all()
    assert ((out["sticky_share"] >= 0) & (out["sticky_share"] <= 1)).all()


def test_forecast_horizons_degrade(spark, sf_dir):
    out = QUERIES["q_forecast_horizons"](spark, sf_dir).toPandas().sort_values("h")
    assert list(out["h"]) == list(range(1, 8))
    assert (out["mae"] > 0).all()
    assert ((out["smape"] >= 0) & (out["smape"] <= 2)).all()


def test_demand_classes_partition(spark, sf_dir):
    out = QUERIES["q_demand_classes"](spark, sf_dir).toPandas()
    assert set(out["demand_class"]) <= {"smooth", "intermittent", "erratic", "lumpy"}
    assert (out["n_parts"] > 0).all()
    assert (out["avg_adi"] >= 1.0).all()


def test_ljung_box_positive(spark, sf_dir):
    r = QUERIES["q_ljung_box"](spark, sf_dir).collect()[0]
    assert r["q_stat"] >= 0
    assert r["n_lags"] == 7
    assert r["reject_whiteness_5pct"] in (0, 1)


def test_hurst_in_physical_range(spark, sf_dir):
    r = QUERIES["q_hurst"](spark, sf_dir).collect()[0]
    assert r["rs_16"] > 0 and r["rs_32"] > 0 and r["rs_64"] > 0
    # R/S grows with block size; H lands in (0, 1)
    assert r["rs_64"] > r["rs_16"]
    assert 0.0 < r["hurst"] < 1.0


def test_load_heatmap_covers_week(spark, sf_dir):
    out = QUERIES["q_load_heatmap"](spark, sf_dir).toPandas()
    assert out["dow"].between(1, 7).all()
    assert out["hour"].between(0, 23).all()
    assert abs(out["share"].sum() - 1.0) < 1e-3


def test_discount_curve_shares_sum(spark, sf_dir):
    out = QUERIES["q_discount_curve"](spark, sf_dir).toPandas()
    assert len(out) == 5
    assert abs(out["revenue_share"].sum() - 1.0) < 1e-3
    assert ((out["avg_discount"] >= 0) & (out["avg_discount"] <= 0.2)).all()


def test_seasonal_strength_bounded(spark, sf_dir):
    r = QUERIES["q_seasonal_strength"](spark, sf_dir).collect()[0]
    assert 0.0 <= r["seasonal_strength"] <= 1.0
    assert 0.0 <= r["trend_strength"] <= 1.0
    assert r["n_days"] > 0


def test_streaks_distribution(spark, sf_dir):
    out = QUERIES["q_streaks"](spark, sf_dir).toPandas()
    assert (out["streak_days"] >= 1).all()
    assert out["n_users"].sum() > 0


def test_return_rates_consistent(spark, sf_dir):
    out = QUERIES["q_return_rates"](spark, sf_dir).toPandas()
    assert len(out) == 25
    assert ((out["return_rate"] >= 0) & (out["return_rate"] <= 1)).all()
    assert out["base_rate"].nunique() == 1
    flagged = out[out["escalate"] == 1]
    if len(flagged):
        assert (flagged["return_rate"] > flagged["base_rate"] * 1.2 - 1e-9).all()


def test_segment_migration_matrix(spark, sf_dir):
    out = QUERIES["q_segment_migration"](spark, sf_dir).toPandas()
    assert set(out["from_seg"]) <= {"low", "mid", "high", "new"}
    assert set(out["to_seg"]) <= {"low", "mid", "high", "churned"}
    # 'new' customers can't also be 'churned'
    assert not ((out["from_seg"] == "new") & (out["to_seg"] == "churned")).any()
    assert (out["n_customers"] > 0).all()


def test_ar_aging_shares(spark, sf_dir):
    out = QUERIES["q_ar_aging"](spark, sf_dir).toPandas()
    assert set(out["age_bucket"]) <= {"0-30", "31-60", "61-90", "90+"}
    assert abs(out["value_share"].sum() - 1.0) < 1e-3
    assert (out["open_value"] > 0).all()


def test_share_shift_sums(spark, sf_dir):
    out = QUERIES["q_share_shift"](spark, sf_dir).toPandas()
    assert len(out) == 25
    assert abs(out["share_1996"].sum() - 1.0) < 1e-3
    assert abs(out["share_1997"].sum() - 1.0) < 1e-3
    assert abs(out["pp_change"].sum()) < 0.1  # shares are zero-sum


def test_coverage_gaps_full_grid(spark, sf_dir):
    out = QUERIES["q_coverage_gaps"](spark, sf_dir).toPandas()
    assert len(out) == 25  # 5x5 region grid, zero cells included
    assert abs(out["flow_share"].sum() - 1.0) < 1e-3
    ws = out[out["white_space"] == 1]
    assert (ws["trade_value"] == 0.0).all()


def test_readability_finite(spark, sf_dir):
    import math

    out = QUERIES["q_readability"](spark, sf_dir).toPandas()
    assert len(out) >= 1
    assert out["avg_flesch"].map(math.isfinite).all()


def test_event_id_audit_invariants(spark, sf_dir):
    r = QUERIES["q_event_id_audit"](spark, sf_dir).collect()[0]
    assert r["n_events"] >= r["n_distinct_ids"]
    assert r["n_replayed"] == r["n_events"] - r["n_distinct_ids"]
    assert 0.0 <= r["replay_rate"] <= 1.0


def test_sma_cross_counts_balanced(spark, sf_dir):
    out = QUERIES["q_sma_cross"](spark, sf_dir).toPandas()
    assert len(out) > 0
    # crosses alternate, so per-series counts differ by at most 1
    assert (abs(out["golden_crosses"] - out["death_crosses"]) <= 1).all()


def test_health_summary_all_checks_present(spark, sf_dir):
    out = QUERIES["q_health_summary"](spark, sf_dir).toPandas()
    assert set(out["check"]) == {
        "error_control_chart", "volume_drops", "srm", "fk_orphans",
    }
    assert (out["n_triggered"] <= out["n_checked"]).all()
    # clean synthetic star schema: no orphans fire
    assert out.set_index("check").loc["fk_orphans", "n_triggered"] == 0


def test_grubbs_positive(spark, sf_dir):
    out = QUERIES["q_grubbs"](spark, sf_dir).toPandas()
    assert len(out) == 5
    assert (out["grubbs_g"] > 0).all()


def test_ridge_path_shrinks(spark, sf_dir):
    out = QUERIES["q_ridge_path"](spark, sf_dir).toPandas().sort_values("lam")
    assert len(out) == 4
    wq = out["w_quantity"].abs().tolist()
    assert all(a >= b - 1e-9 for a, b in zip(wq, wq[1:]))  # monotone shrinkage
    # λ=0 reproduces the unregularized centered solution (non-trivial)
    assert abs(out.iloc[0]["w_quantity"]) > 0


def test_psm_att_bounds(spark, sf_dir):
    r = QUERIES["q_psm_att"](spark, sf_dir).collect()[0]
    assert 0 < r["n_matched"] <= r["n_treated"]
    assert 0.0 < r["match_rate"] <= 1.0
    import math

    assert math.isfinite(r["att"])


def test_gate_overlap_bounds(spark, sf_dir):
    out = QUERIES["q_gate_overlap"](spark, sf_dir).toPandas()
    assert len(out) == 3
    assert (out["n_both"] <= out[["n_fail_a", "n_fail_b"]].min(axis=1)).all()
    assert ((out["fail_jaccard"] >= 0) & (out["fail_jaccard"] <= 1)).all()
