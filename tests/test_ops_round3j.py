"""Property tests for the round-3j batch: Wilcoxon signed-rank, Friedman,
ICC(1). Oracle parity at sf0.001 is covered by test_oracle_parity."""

from __future__ import annotations

import math

from fortune_500_financial_insights_pipeline_spark.queries import QUERIES


def test_wilcoxon_w_range(spark, sf_dir):
    r = QUERIES["q_wilcoxon"](spark, sf_dir).collect()[0]
    n = r["n_pairs"]
    assert n > 10
    # W+ lives in [0, n(n+1)/2]
    assert 0 <= r["w_plus"] <= n * (n + 1) / 2
    assert math.isfinite(r["z_stat"])
    assert r["significant"] == (1 if abs(r["z_stat"]) > 1.96 else 0)


def test_friedman_bounds(spark, sf_dir):
    r = QUERIES["q_friedman"](spark, sf_dir).collect()[0]
    assert r["k"] == 5
    assert r["n_blocks"] > 0
    # chi2_F is bounded by n(k-1) (all blocks agreeing perfectly)
    assert 0 - 1e-6 <= r["chi2_f"] <= r["n_blocks"] * (r["k"] - 1) + 1e-6


def test_icc_bounds(spark, sf_dir):
    r = QUERIES["q_icc"](spark, sf_dir).collect()[0]
    assert r["msb"] > 0 and r["msw"] > 0
    # n0 is between the smallest and largest group size, so < n
    assert 1 < r["n0"] < r["n"]
    # ICC(1) is bounded by 1; can be slightly negative when groups carry
    # no signal
    assert -1.0 <= r["icc1"] <= 1.0
