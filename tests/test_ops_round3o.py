"""Property tests for the round-3o batch: Weibull median-rank fit,
negative-binomial moments fit. Oracle parity at sf0.001 is covered by
test_oracle_parity."""

from __future__ import annotations

from fortune_500_financial_insights_pipeline_spark.queries import QUERIES


def test_weibull_fit_positive(spark, sf_dir):
    r = QUERIES["q_weibull_fit"](spark, sf_dir).collect()[0]
    assert r["n_events"] > 10
    assert r["shape_k"] > 0
    assert r["scale_lambda_s"] > 0
    assert r["decreasing_hazard"] == (1 if r["shape_k"] < 1.0 else 0)


def test_nbinom_fit_consistency(spark, sf_dir):
    r = QUERIES["q_nbinom_fit"](spark, sf_dir).collect()[0]
    assert r["mean_count"] > 0 and r["var_count"] >= 0
    assert abs(r["fano"] - r["var_count"] / r["mean_count"]) < 1e-4
    if r["p_hat"] is not None:
        assert 0 < r["p_hat"] <= 1
        assert r["r_hat"] > 0
    else:
        # only valid when the data is not overdispersed
        assert r["var_count"] <= r["mean_count"]
