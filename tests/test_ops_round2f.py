"""Round-2f operator properties: snapshot CDC diff, Z-order layout audit,
finite-horizon EWMA, quantile normalization, robust scaling, key-skew
profile, reciprocal k-NN (oracle parity at sf0.001 lives in
test_oracle_parity)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.operators.cdc import diff_summary, snapshot_diff
from fortune_500_financial_insights_pipeline_spark.operators.normalize import (
    quantile_normalize,
    robust_scale,
)
from fortune_500_financial_insights_pipeline_spark.operators.skew import key_skew_profile
from fortune_500_financial_insights_pipeline_spark.operators.timeseries import ewma_finite
from fortune_500_financial_insights_pipeline_spark.operators.zorder import with_zvalue


def test_snapshot_diff_classifies_all_four_actions(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "CHANGED"), (4, "d")], "k long, v string"
    )
    got = {r["k"]: r["action"] for r in snapshot_diff(old, new, ["k"], ["v"]).collect()}
    assert got == {1: "delete", 2: "unchanged", 3: "update", 4: "insert"}
    summary = {r["action"]: r["n_rows"] for r in
               diff_summary(snapshot_diff(old, new, ["k"], ["v"])).collect()}
    assert summary == {"delete": 1, "unchanged": 1, "update": 1, "insert": 1}


def test_snapshot_diff_null_vs_empty_not_conflated(spark):
    old = spark.createDataFrame([(1, None)], "k long, v string")
    new = spark.createDataFrame([(1, "")], "k long, v string")
    (row,) = snapshot_diff(old, new, ["k"], ["v"]).collect()
    assert row["action"] == "update"  # NULL -> '' is a change, not unchanged


def test_zvalue_interleaves_bits_disjointly(spark):
    # Two dims already spanning [0, 255]: z of (255, 0) uses even bit
    # positions only, (0, 255) odd positions only, and they OR to z(255,255).
    df = spark.createDataFrame(
        [(255, 0), (0, 255), (255, 255), (0, 0)], "a long, b long"
    )
    z = {(r["a"], r["b"]): r["__z"] for r in with_zvalue(df, ["a", "b"], bits=8).collect()}
    assert z[(0, 0)] == 0
    assert z[(255, 0)] | z[(0, 255)] == z[(255, 255)]
    assert z[(255, 0)] & z[(0, 255)] == 0
    assert z[(255, 255)] == (1 << 16) - 1


def test_zorder_locality_beats_single_dim_sort(spark):
    # Points on a 16x16 grid; within one 256-row z-range every bucket's
    # max-min envelope on BOTH dims is bounded, unlike a single-dim sort
    # where the second dim's envelope spans the whole domain.
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "a long, b long")
    z = with_zvalue(df, ["a", "b"], bits=4)
    env = (
        z.groupBy((F.col("__z") / 64).cast("long").alias("bkt"))
        .agg((F.max("a") - F.min("a")).alias("span_a"),
             (F.max("b") - F.min("b")).alias("span_b"))
        .collect()
    )
    assert all(r["span_a"] <= 8 and r["span_b"] <= 8 for r in env)


def test_ewma_finite_matches_hand_rolled_weights(spark):
    df = spark.createDataFrame(
        [("k", i, float(v)) for i, v in enumerate([10, 20, 30, 40])],
        "g string, t long, v double",
    )
    out = {r["t"]: r["ewma"] for r in
           ewma_finite(df, ["g"], ["t"], "v", alpha=0.5, horizon=3).collect()}
    assert out[0] == 10.0
    # t=1: (20*1 + 10*0.5) / 1.5
    assert math.isclose(out[1], 25.0 / 1.5)
    # t=3: (40 + 30*0.5 + 20*0.25) / 1.75
    assert math.isclose(out[3], 60.0 / 1.75)


def test_quantile_normalize_forces_common_distribution(spark):
    # Two groups with different scales map onto identical rank-mean values.
    rows = [("g1", i, float(i)) for i in range(1, 6)] + [
        ("g2", i, float(100 * i)) for i in range(1, 6)
    ]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    out = quantile_normalize(df, "g", "v", order_tiebreak=["id"])
    per_group = (
        out.groupBy("g").agg(F.sort_array(F.collect_list("qnorm")).alias("vals")).collect()
    )
    vals = {r["g"]: r["vals"] for r in per_group}
    assert vals["g1"] == vals["g2"]  # identical empirical distribution
    # rank r mean = (r + 100r)/2
    assert vals["g1"] == [50.5 * r for r in range(1, 6)]


def test_robust_scale_centers_by_median_and_handles_degenerate_iqr(spark):
    rows = [("a", float(v)) for v in [1, 2, 3, 4, 100]] + [("b", 5.0), ("b", 5.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = robust_scale(df, "g", "v").collect()
    a = sorted(r["scaled"] for r in out if r["g"] == "a")
    # median=3, p25=2, p75=4 -> iqr=2; outlier 100 -> 48.5, median row -> 0
    assert a == [-1.0, -0.5, 0.0, 0.5, 48.5]
    assert all(r["scaled"] is None for r in out if r["g"] == "b")  # iqr 0 -> NULL


def test_key_skew_profile_flags_hot_key(spark):
    rows = [(1,)] * 90 + [(k,) for k in range(2, 12)]
    df = spark.createDataFrame(rows, "k long")
    (p,) = key_skew_profile(df, "k", top_n=2).collect()
    assert p["n_rows"] == 100 and p["n_keys"] == 11 and p["max_freq"] == 90
    assert p["top1_share"] == 0.9
    assert p["topn_share"] == 0.91  # hot key + one singleton
    assert p["skew_ratio"] == 90 / (100 / 11)


def test_mutual_knn_requires_reciprocity(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import mutual_knn_pairs

    # v0,v1 nearly parallel (mutual top-1); v2 orthogonal-ish hub excluded
    # at k=1 because v0's top-1 is v1 and vice versa.
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.99, 0.14]),
        (2, [0.7, 0.7]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = mutual_knn_pairs(df, k=1).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(0, 1)]
