"""Property tests for the round-4e batch: log-rank test.
Oracle parity at sf0.001 is covered by test_oracle_parity."""

from __future__ import annotations

from fortune_500_financial_insights_pipeline_spark.queries import QUERIES


def test_logrank_consistency(spark, sf_dir):
    r = QUERIES["q_logrank"](spark, sf_dir).collect()[0]
    assert r["n_event_times"] >= 1
    assert r["observed_g1"] >= 0
    assert r["logrank_chi2"] >= 0
    # random parity split: arms share one hazard — chi2 = z^2 stays within
    # a few standard deviations of the null
    assert r["logrank_chi2"] < 36.0
    assert r["flag_differ"] == (1 if r["logrank_chi2"] > 3.841 else 0)
