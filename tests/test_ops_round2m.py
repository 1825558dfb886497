"""Property tests for max_drawdown, historical_var_es, bfs_hops
(oracle parity at sf0.001 is covered by test_oracle_parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.queries import QUERIES


def test_drawdown_nonpositive_and_peak_is_max(spark, sf_dir):
    out = QUERIES["q_drawdown"](spark, sf_dir).toPandas()
    assert len(out) > 0
    assert (out["max_drawdown"] <= 0).all()
    assert (out["peak"] > 0).all()


def test_var_es_tail_consistency(spark, sf_dir):
    out = QUERIES["q_var_es"](spark, sf_dir).toPandas()
    assert len(out) > 0
    # upper-tail convention: ES = mean of values >= VaR, so ES >= VaR
    assert (out["es"] >= out["var"]).all()
    assert (out["n_tail"] >= 1).all()


def test_bfs_hops_bipartite_parity(spark, sf_dir):
    """Supplier<->customer graph is bipartite: supplier nodes (< 1e6)
    sit at even hop distance from supplier seeds, customers at odd."""
    out = QUERIES["q_shortest_path"](spark, sf_dir).toPandas()
    assert len(out) > 0
    assert (out["hop"] >= 0).all()
    supp = out[out["id"] < 1_000_000]
    cust = out[out["id"] >= 1_000_000]
    assert (supp["hop"] % 2 == 0).all()
    assert (cust["hop"] % 2 == 1).all()
    # seeds themselves are present at hop 0
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table

    seed_ids = {
        r["s_suppkey"]
        for r in load_table(spark, sf_dir, "supplier")
        .where(F.col("s_suppkey") <= 3)
        .collect()
    }
    assert set(supp[supp["hop"] == 0]["id"]) == seed_ids


def test_bfs_hops_min_semantics(spark):
    """Hand graph: 1-2, 2-3, 3-4, plus shortcut 1-4 => hop(4) = 1."""
    from fortune_500_financial_insights_pipeline_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], ["id_a", "id_b"]
    )
    seeds = spark.createDataFrame([(1,)], ["id"])
    got = {r["id"]: r["hop"] for r in bfs_hops(edges, seeds, rounds=3).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 1}


def test_code_detect_hand_rows(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.text import code_detect

    docs = spark.createDataFrame(
        [
            ("c1", "int main() {\n  return 0;\n}"),
            ("p1", "The quick brown fox jumps over the lazy dog"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in code_detect(docs).collect()}
    assert out["c1"]["is_code"] and out["c1"]["n_code_lines"] == 3
    assert not out["p1"]["is_code"] and out["p1"]["n_code_lines"] == 0


def test_ks_identical_distribution_is_zero(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.stats import ks_statistic

    rows = [("a", float(v)) for v in range(10)] + [("b", float(v)) for v in range(10)]
    df = spark.createDataFrame(rows, ["g", "v"])
    r = ks_statistic(df, "g", "v", "a", "b").collect()[0]
    assert r["ks"] == 0.0 and r["n1"] == 10 and r["n2"] == 10


def test_ks_disjoint_distribution_is_one(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.stats import ks_statistic

    rows = [("a", float(v)) for v in range(5)] + [("b", float(v + 100)) for v in range(5)]
    df = spark.createDataFrame(rows, ["g", "v"])
    assert ks_statistic(df, "g", "v", "a", "b").collect()[0]["ks"] == 1.0


def test_perplexity_buckets_cover_sources(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    out = QUERIES["q_perplexity_bucket"](spark, sf_dir).toPandas()
    assert (out["bucket"].between(1, 10)).all()
    assert (out["n_docs"] >= 1).all()
    # per source the deciles' min_score is non-decreasing with bucket id
    for _, grp in out.groupby("source"):
        g = grp.sort_values("bucket")
        assert g["min_score"].is_monotonic_increasing


def test_roc_auc_perfect_and_reversed(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.stats import roc_auc

    rows = [(0.1, 0), (0.2, 0), (0.8, 1), (0.9, 1)]
    df = spark.createDataFrame(rows, ["s", "y"])
    assert roc_auc(df, "s", "y").collect()[0]["auc"] == 1.0
    rev = spark.createDataFrame([(s, 1 - y) for s, y in rows], ["s", "y"])
    assert roc_auc(rev, "s", "y").collect()[0]["auc"] == 0.0


def test_roc_auc_all_tied_is_half(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.stats import roc_auc

    df = spark.createDataFrame([(0.5, 0), (0.5, 1), (0.5, 0), (0.5, 1)], ["s", "y"])
    assert roc_auc(df, "s", "y").collect()[0]["auc"] == 0.5


def test_chi2_perfectly_balanced_is_zero(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.stats import chi2_independence

    rows = [(x, y) for x in "ab" for y in "cd" for _ in range(5)]
    df = spark.createDataFrame(rows, ["x", "y"])
    r = chi2_independence(df, "x", "y").collect()[0]
    assert r["chi2"] == 0.0 and r["dof"] == 1 and r["n"] == 20


def test_chi2_includes_zero_cells(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.stats import chi2_independence

    # diagonal-only table: the (a,d)/(b,c) cells are unobserved but must
    # still contribute their expected counts
    rows = [("a", "c")] * 5 + [("b", "d")] * 5
    r = chi2_independence(spark.createDataFrame(rows, ["x", "y"]), "x", "y").collect()[0]
    assert r["chi2"] == 10.0  # full association, n == chi2 for 2x2


def test_calibration_bins_sum_to_total(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    out = QUERIES["q_calibration"](spark, sf_dir).toPandas()
    assert out["n"].sum() > 0
    assert (out["n_pos"] <= out["n"]).all()
    assert out["bin"].between(0, 9).all()


def test_psi_identical_groups_is_zero(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.stats import psi

    rows = [("a", float(v % 10) / 10) for v in range(100)] + [
        ("b", float(v % 10) / 10) for v in range(100)
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    r = psi(df, "g", "v", "a", "b", n_bins=10, lo=0.0, hi=1.0).collect()[0]
    assert r["psi"] == 0.0 and r["n_ref"] == 100 and r["n_new"] == 100


def test_woe_iv_symmetric_bins(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.stats import woe_iv

    # bin 0 all-negative, bin 9 all-positive: WoE strictly negative then positive
    rows = [(0.05, 0)] * 20 + [(0.95, 1)] * 20
    df = spark.createDataFrame(rows, ["s", "y"])
    out = {r["bin"]: r for r in woe_iv(df, "s", "y").collect()}
    assert out[0]["woe"] < 0 < out[9]["woe"]
    assert out[0]["iv_term"] > 0 and out[9]["iv_term"] > 0


def test_sorted_neighborhood_finds_adjacent_typo(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.fuzzy import (
        sorted_neighborhood_pairs,
    )

    df = spark.createDataFrame(
        [(1, "smith john"), (2, "smith johm"), (3, "zzz far away")],
        ["id", "name"],
    )
    pairs = sorted_neighborhood_pairs(df, "id", "name", window=3, max_dist=2).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(2, 1)}
    assert pairs[0]["dist"] == 1


def test_cov_matrix_diagonal_is_variance(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    out = QUERIES["q_cov_matrix"](spark, sf_dir).toPandas()
    diag = out[out["ki"] == out["kj"]]
    assert len(diag) > 0
    assert (diag["cov"] >= 0).all()  # variances are non-negative
    assert (out["ki"] <= out["kj"]).all()  # triangular storage


def test_portfolio_vol_bounds(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    cov = QUERIES["q_cov_matrix"](spark, sf_dir).toPandas()
    out = QUERIES["q_portfolio_vol"](spark, sf_dir).toPandas().iloc[0]
    # portfolio variance is positive and no larger than the max diagonal
    max_var = cov[cov["ki"] == cov["kj"]]["cov"].max()
    assert 0 < out["port_var"] <= max_var
    assert abs(out["port_vol"] ** 2 - out["port_var"]) < 1e-3


def test_hhi_monopoly_is_10000(spark):
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES  # noqa: F401
    from pyspark.sql import functions as F  # noqa: F401

    # single supplier in a nation => HHI exactly 10000 by construction
    # (construct directly on the operator's algebra)
    df = spark.createDataFrame([(1, 10, 500_00)], ["nat", "supp", "rev"])
    tot = df.groupBy("nat").agg(F.sum("rev").alias("t"))
    share = F.col("rev").cast("double") / F.col("t")
    from fortune_500_financial_insights_pipeline_spark.functions.deterministic import dsum

    got = (
        df.join(tot, "nat")
        .groupBy("nat")
        .agg(F.round(dsum(share * share * 10000), 6).alias("hhi"))
        .collect()[0]["hhi"]
    )
    assert got == 10000.0


def test_ols2_recovers_exact_plane(spark):
    """y = 2 + 3*x1 - 4*x2 exactly => betas recovered exactly."""
    from fortune_500_financial_insights_pipeline_spark.operators.stats import ols2

    rows = [
        ("g", float(x1), float(x2), 2.0 + 3.0 * x1 - 4.0 * x2)
        for x1 in range(5)
        for x2 in range(5)
    ]
    df = spark.createDataFrame(rows, ["g", "x1", "x2", "y"])
    r = ols2(df, ["g"], "y", "x1", "x2").collect()[0]
    assert (r["beta0"], r["beta1"], r["beta2"]) == (2.0, 3.0, -4.0)
    assert r["n_rows"] == 25


def test_scd2_lookup_unique_episode_per_fact(spark, sf_dir):
    """SCD2 episodes partition time per user, so every purchase matches
    at most one episode — the join must not fan out."""
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    out = QUERIES["q_scd2_lookup"](spark, sf_dir).toPandas()
    assert len(out) > 0
    assert not out.duplicated(subset=["user_id", "purchase_ts", "amount"]).any()


def test_hash_guided_walks_deterministic_and_valid(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    a = QUERIES["q_random_walk"](spark, sf_dir).toPandas()
    b = (
        QUERIES["q_random_walk"](spark, sf_dir)
        .repartition(7)
        .toPandas()
        .sort_values(["walk_id", "step"])
        .reset_index(drop=True)
    )
    a = a.sort_values(["walk_id", "step"]).reset_index(drop=True)
    assert a.equals(b)  # partition-invariant replay
    # every walk has steps 0..4 and alternates bipartite sides
    for _, g in a.groupby("walk_id"):
        assert list(g["step"]) == [0, 1, 2, 3, 4]
        sides = (g["node"] >= 1_000_000).tolist()
        assert sides == [False, True, False, True, False]


def test_fd_audit_detects_pk_and_violations(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    out = {r["fd"]: r for r in QUERIES["q_fd_audit"](spark, sf_dir).collect()}
    assert out["partkey_to_brand"]["holds"] is True
    assert out["partkey_to_brand"]["n_violating_keys"] == 0
    # n_violating_keys > 0 <=> not holds
    for r in out.values():
        assert (r["n_violating_keys"] == 0) == r["holds"]


def test_mix_temperature_weights_sum_to_one(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    out = QUERIES["q_mix_temperature"](spark, sf_dir).toPandas()
    assert abs(out["weight"].sum() - 1.0) < 1e-4
    assert abs(out["expected_docs"].sum() - out["n_docs"].sum()) < 1.0
    # temperature alpha<1 upweights small sources: weight/share ratio is
    # decreasing in n_docs
    out = out.sort_values("n_docs")
    ratio = out["weight"] / (out["n_docs"] / out["n_docs"].sum())
    assert ratio.is_monotonic_decreasing or len(out) == 1


def test_rendezvous_only_new_shard_receives_moves(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    out = {r["shard9"]: r for r in QUERIES["q_rendezvous_shard"](spark, sf_dir).collect()}
    # consistent-hashing property: docs only ever move TO the new shard
    for s, r in out.items():
        if s == 8:
            assert r["n_moved"] == r["n_docs"] > 0
        else:
            assert r["n_moved"] == 0
    total = sum(r["n_docs"] for r in out.values())
    assert 0 < out[8]["n_docs"] < total / 4  # ~1/9 of docs


def test_tokenizer_fertility_at_least_one(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    out = QUERIES["q_tokenizer_fertility"](spark, sf_dir).toPandas()
    assert len(out) >= 2
    # every whitespace word yields >= 1 BPE token
    assert (out["fertility"] >= 1.0).all()
    assert (out["bpe_tokens"] >= out["ws_tokens"]).all()


def test_fifo_match_hand_example(spark):
    """Buys [5, 3], sells [4, 4] FIFO: lot1->sell1 4, lot1->sell2 1,
    lot2->sell2 3."""
    from fortune_500_financial_insights_pipeline_spark.operators.fifo import fifo_match

    buys = spark.createDataFrame(
        [("p", 1, 5, 10.0), ("p", 2, 3, 12.0)], ["k", "seq", "qty", "price"]
    )
    sells = spark.createDataFrame(
        [("p", 1, 4, 11.0), ("p", 2, 4, 13.0)], ["k", "seq", "qty", "price"]
    )
    m = fifo_match(buys, sells, ["k"], ["seq"], "qty").collect()
    got = sorted((r["b_seq"], r["s_seq"], r["matched_qty"]) for r in m)
    assert got == [(1, 1, 4), (1, 2, 1), (2, 2, 3)]


def test_fifo_conservation(spark, sf_dir):
    """Total matched quantity == min(total buys, total sells) per part
    (FIFO allocates until one side is exhausted)."""
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_linenumber", F.col("l_quantity").cast("long").alias("qty")
    )
    buys = li.where(F.col("l_linenumber") % 2 == 1).groupBy("l_partkey").agg(
        F.sum("qty").alias("b")
    )
    sells = li.where(F.col("l_linenumber") % 2 == 0).groupBy("l_partkey").agg(
        F.sum("qty").alias("s")
    )
    expect = (
        buys.join(sells, "l_partkey")
        .select("l_partkey", F.least("b", "s").alias("m"))
        .toPandas()
        .set_index("l_partkey")["m"]
    )
    got = (
        QUERIES["q_fifo_pnl"](spark, sf_dir)
        .toPandas()
        .set_index("l_partkey")["matched_qty"]
    )
    assert got.sort_index().equals(expect.sort_index().astype(got.dtype))


def test_top_paths_are_bounded_and_ranked(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    out = QUERIES["q_top_paths"](spark, sf_dir).toPandas()
    assert 0 < len(out) <= 15
    assert out["n_sessions"].is_monotonic_decreasing
    assert (out["path"].str.count(">") <= 2).all()


def test_wilson_ci_brackets_rate(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    out = QUERIES["q_wilson_ci"](spark, sf_dir).toPandas()
    assert (out["ci_lo"] <= out["rate"]).all()
    assert (out["rate"] <= out["ci_hi"]).all()
    assert (out["ci_lo"] >= 0).all() and (out["ci_hi"] <= 1).all()


def test_mann_kendall_monotonic_series(spark):
    """Strictly increasing series => S = n(n-1)/2, tau = 1."""
    from pyspark.sql import functions as F
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES  # noqa: F401

    rows = [(1, f"d{i:02d}", float(i)) for i in range(10)]
    daily = spark.createDataFrame(rows, ["k", "day", "close"])
    a = daily.select("k", F.col("day").alias("di"), F.col("close").alias("ci"))
    b = daily.select("k", F.col("day").alias("dj"), F.col("close").alias("cj"))
    pairs = a.join(b, "k").where(F.col("di") < F.col("dj"))
    sgn = F.when(F.col("cj") > F.col("ci"), 1).when(F.col("cj") < F.col("ci"), -1).otherwise(0)
    r = pairs.groupBy("k").agg(F.sum(sgn).alias("s"), F.count(F.lit(1)).alias("n")).collect()[0]
    assert r["s"] == 45 and r["n"] == 45


def test_vwap_between_min_max_price(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit")
    )
    bounds = li.groupBy("l_suppkey").agg(
        F.min("unit").alias("lo"), F.max("unit").alias("hi")
    ).toPandas().set_index("l_suppkey")
    out = QUERIES["q_vwap"](spark, sf_dir).toPandas().set_index("l_suppkey")
    j = out.join(bounds)
    # VWAP is the qty-weighted mean EXTENDED price per unit, so it sits
    # within [min unit price, max unit price] per supplier
    assert (j["vwap"] >= j["lo"] - 1e-6).all() and (j["vwap"] <= j["hi"] + 1e-6).all()


def test_er_pipeline_clusters_are_disjoint_merges(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    out = QUERIES["q_er_pipeline"](spark, sf_dir).toPandas()
    assert len(out) > 0
    assert (out["n_members"] >= 2).all()
    # cluster ids are distinct (one row per merged entity)
    assert out["cluster_id"].is_unique
    # canonical record is the min-key member, so its name sorts within
    # levenshtein distance of every other member — spot-check via the
    # stage operator on one cluster
    assert out["canonical_name"].notna().all()


def test_ranking_metrics_bounds(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    out = QUERIES["q_ranking_metrics"](spark, sf_dir).toPandas()
    assert len(out) == 3
    assert ((out["ndcg10"] >= 0) & (out["ndcg10"] <= 1.000001)).all()
    assert ((out["mrr"] >= 0) & (out["mrr"] <= 1)).all()
    # BM25 ranks term-bearing docs first, so every query with relevant
    # docs in corpus should have them retrieved
    assert (out["n_rel"] > 0).any()


def test_mahalanobis_catches_joint_outlier(spark):
    """A point normal in both marginals but off the joint trend must
    out-score on-trend points with larger marginal deviations."""
    from fortune_500_financial_insights_pipeline_spark.operators.stats import (
        mahalanobis_outliers,
    )

    # strong positive correlation y ~ x, plus one anti-trend point
    rows = [("g", i, float(i), float(i) + 0.1 * ((i % 3) - 1)) for i in range(1, 30)]
    rows.append(("g", 99, 5.0, 25.0))  # x low, y high: joint outlier
    df = spark.createDataFrame(rows, ["g", "id", "x", "y"])
    top = mahalanobis_outliers(df, ["g"], "x", "y", ["id"], k=1).collect()[0]
    assert top["id"] == 99


def test_pca_spectrum_identities(spark, sf_dir):
    """lambda1 + lambda2 == trace == var(x1) + var(x2); lambda1 >= lambda2."""
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    out = QUERIES["q_pca_spectrum"](spark, sf_dir).toPandas()
    assert (out["lambda1"] >= out["lambda2"]).all()
    assert (out["lambda2"] >= -1e-6).all()  # covariance PSD
    assert ((out["evr1"] >= 0.5) & (out["evr1"] <= 1.0)).all()


def test_budget_allocation_sums_exactly(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    out = QUERIES["q_budget_allocation"](spark, sf_dir).toPandas()
    assert out["allocated"].sum() == 100000  # Hamilton: exact total
    assert (out["allocated"] > 0).all()


def test_column_entropy_bounds(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES
    import numpy as np

    out = QUERIES["q_column_entropy"](spark, sf_dir).toPandas()
    assert len(out) == 3
    # 0 <= H <= log2(n_distinct)
    assert (out["entropy_bits"] >= 0).all()
    assert (out["entropy_bits"] <= np.log2(out["n_distinct"]) + 1e-6).all()


def test_funnel_windowed_no_looser_than_unbounded(spark, sf_dir):
    """The 7-day-windowed conversion count can never exceed the
    unbounded any-time-after-click conversion count."""
    from pyspark.sql import functions as F
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    e = load_table(spark, sf_dir, "events")
    fc = e.where(F.col("event_type") == "click").groupBy("user_id").agg(
        F.min("ts").alias("c_ts")
    )
    p = e.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    unbounded = (
        fc.join(p, "user_id")
        .where(F.col("p_ts") >= F.col("c_ts"))
        .select("user_id")
        .distinct()
        .count()
    )
    row = QUERIES["q_funnel_windowed"](spark, sf_dir).collect()[0]
    assert 0 < row["n_converted_7d"] <= unbounded
    assert row["n_clickers"] >= unbounded


def test_join_size_estimate_equals_actual(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    est = QUERIES["q_join_size_estimate"](spark, sf_dir).collect()[0]
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    actual = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert est["est_join_rows"] == actual  # exact, not an estimate, for equi-keys


def test_table_checksum_detects_single_change(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.checks import table_checksum
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    base = table_checksum(o).collect()[0]
    # flip one row's status: count unchanged, checksum must move
    mutated = o.withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") == o.first()["o_orderkey"], F.lit("X")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    got = table_checksum(mutated).collect()[0]
    assert got["n_rows"] == base["n_rows"]
    assert got["checksum"] != base["checksum"]


def test_table_checksum_is_order_invariant(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.checks import table_checksum
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    a = table_checksum(o).collect()[0]
    b = table_checksum(o.repartition(13)).collect()[0]
    assert (a["n_rows"], a["checksum"]) == (b["n_rows"], b["checksum"])


def test_funnel_steps_monotone(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    r = QUERIES["q_funnel_steps"](spark, sf_dir).collect()[0]
    assert r["n_view"] >= r["n_click"] >= r["n_purchase"] > 0
    assert 0 < r["rate_click"] <= 1 and 0 < r["rate_purchase"] <= 1


def test_forecast_backtest_smape_bounds(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    out = QUERIES["q_forecast_backtest"](spark, sf_dir).toPandas()
    assert len(out) > 0
    assert (out["mae"] >= 0).all()
    assert ((out["smape"] >= 0) & (out["smape"] <= 2.0)).all()  # sMAPE in [0,2]


def test_elasticity_negative_on_synthetic_demand_curve(spark):
    """qty = price^-2 exactly => log-log slope == -2."""
    from pyspark.sql import functions as F

    rows = [("b", float(p), float(p) ** -2.0) for p in range(1, 20)]
    df = spark.createDataFrame(rows, ["brand", "price", "qty"]).select(
        "brand", F.log("qty").alias("ln_q"), F.log("price").alias("ln_p")
    )
    slope = df.groupBy("brand").agg(
        F.round(F.regr_slope("ln_q", "ln_p"), 6).alias("s")
    ).collect()[0]["s"]
    assert abs(slope + 2.0) < 1e-6


def test_byte_entropy_bounds_and_ascii_vs_cjk(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    out = QUERIES["q_byte_entropy"](spark, sf_dir).toPandas()
    assert len(out) > 0
    assert ((out["byte_entropy"] >= 0) & (out["byte_entropy"] <= 8.0)).all()
    assert (out["n_distinct_bytes"] <= 256).all()
    # utf-8 multibyte docs have n_bytes > n_chars; pure-ascii equal — both
    # classes exist in the fixture (en + zh docs)
    assert (out["n_bytes"] >= out["n_distinct_bytes"]).all()


def test_grid_dbscan_hand_clusters(spark):
    """Two tight blobs far apart + one isolated point: two clusters,
    isolated point dropped as noise."""
    from fortune_500_financial_insights_pipeline_spark.operators.dbscan import grid_dbscan

    blob_a = [(i, 0.01 * i, 0.01) for i in range(5)]           # cells near origin
    blob_b = [(10 + i, 5.0 + 0.01 * i, 5.0) for i in range(5)]  # far away
    noise = [(99, -9.0, 9.0)]
    df = spark.createDataFrame(blob_a + blob_b + noise, ["id", "x", "y"])
    out = grid_dbscan(df, "id", "x", "y", eps=0.5, min_pts=3).toPandas()
    assert 99 not in set(out["id"])  # noise dropped
    clusters = out.groupby("cluster")["id"].apply(set).to_dict()
    assert len(clusters) == 2
    sets = sorted(clusters.values(), key=lambda s: min(s))
    assert sets[0] == {0, 1, 2, 3, 4} and sets[1] == {10, 11, 12, 13, 14}


def test_grid_dbscan_fixture_structure(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    out = QUERIES["q_grid_dbscan"](spark, sf_dir).toPandas()
    assert len(out) >= 2  # more than one cluster at fixture params
    assert (out["n_points"] >= 3).all()  # every cluster >= min_pts


def test_basket_triples_apriori_consistency(spark, sf_dir):
    """Triple support can never exceed any contained pair's support
    (anti-monotonicity — the property Apriori pruning relies on)."""
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table

    triples = QUERIES["q_basket_triples"](spark, sf_dir).toPandas()
    assert len(triples) > 0
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type").distinct()
    n = ev.select("user_id").distinct().count()
    a = ev.selectExpr("user_id", "event_type AS t_a")
    b = ev.selectExpr("user_id", "event_type AS t_b")
    pair_sup = {
        (r["t_a"], r["t_b"]): r["c"] / n
        for r in a.join(b, "user_id")
        .where(F.col("t_a") < F.col("t_b"))
        .groupBy("t_a", "t_b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    for _, r in triples.iterrows():
        for p in [(r["t_a"], r["t_b"]), (r["t_a"], r["t_c"]), (r["t_b"], r["t_c"])]:
            assert r["support"] <= pair_sup[p] + 1e-9


def test_ltv_curve_monotone_per_cohort(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    out = QUERIES["q_ltv_curve"](spark, sf_dir).toPandas()
    assert len(out) > 0
    for _, grp in out.groupby("cohort_month"):
        g = grp.sort_values("age_months")
        assert g["cum_revenue"].is_monotonic_increasing
        assert (g["age_months"] >= 0).all()


def test_embedding_qa_no_degenerates_in_fixture(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    out = QUERIES["q_embedding_qa"](spark, sf_dir).toPandas()
    assert (out["n_degenerate"] == 0).all()
    assert (out["min_norm"] > 0).all()
    assert (out["min_norm"] <= out["avg_norm"]).all()
    assert (out["avg_norm"] <= out["max_norm"]).all()


def test_dup_size_dist_shares_sum_to_one(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    out = QUERIES["q_dup_size_dist"](spark, sf_dir).toPandas()
    assert abs(out["corpus_share"].sum() - 1.0) < 1e-4
    assert (out["n_docs"] == out["cluster_size"] * out["n_groups"]).all()
    assert len(out) >= 2  # fixture has multi-member prefix families
