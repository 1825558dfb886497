"""Property tests for the round-3r batch: Cronbach's alpha, KPSS
stationarity. Oracle parity at sf0.001 is covered by test_oracle_parity."""

from __future__ import annotations

from fortune_500_financial_insights_pipeline_spark.queries import QUERIES


def test_cronbach_alpha_bounds(spark, sf_dir):
    r = QUERIES["q_cronbach_alpha"](spark, sf_dir).collect()[0]
    assert r["k_items"] == 5
    # variance of the sum exceeds no-covariance floor... alpha <= 1 always
    assert r["alpha"] <= 1.0
    assert r["sum_item_var"] > 0 and r["total_var"] > 0


def test_kpss_positive(spark, sf_dir):
    r = QUERIES["q_kpss"](spark, sf_dir).collect()[0]
    assert r["n_days"] > 100
    assert r["longrun_var"] > 0
    assert r["kpss_stat"] >= 0
    assert r["flag_nonstationary"] == (1 if r["kpss_stat"] > 0.463 else 0)
