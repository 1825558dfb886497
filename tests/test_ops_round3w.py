"""Property tests for the round-3w batch: Wasserstein-1, total-variation
distance. Oracle parity at sf0.001 is covered by test_oracle_parity."""

from __future__ import annotations

from fortune_500_financial_insights_pipeline_spark.queries import QUERIES


def test_wasserstein_nonnegative(spark, sf_dir):
    r = QUERIES["q_wasserstein"](spark, sf_dir).collect()[0]
    assert r["n_click"] > 0 and r["n_purchase"] > 0
    assert r["wasserstein_1"] >= 0
    # W1 is bounded by the support width (values live in a few hundreds)
    assert r["wasserstein_1"] < 1000


def test_tv_distance_bounds(spark, sf_dir):
    r = QUERIES["q_tv_distance"](spark, sf_dir).collect()[0]
    assert 0.0 <= r["tv_distance"] <= 1.0
    assert r["n_weekend"] > 0 and r["n_weekday"] > 0
