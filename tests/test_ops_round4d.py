"""Property tests for the round-4d batch: effective sample size, Mood's
median test. Oracle parity at sf0.001 is covered by test_oracle_parity."""

from __future__ import annotations

from fortune_500_financial_insights_pipeline_spark.queries import QUERIES


def test_effective_n_bounds(spark, sf_dir):
    r = QUERIES["q_effective_n"](spark, sf_dir).collect()[0]
    assert -1.0 <= r["rho1"] <= 1.0
    assert r["n_effective"] > 0
    # positive autocorrelation deflates, negative inflates
    if r["rho1"] > 0:
        assert r["n_effective"] < r["n_days"]
    assert abs(r["efficiency"] - r["n_effective"] / r["n_days"]) < 1e-5


def test_mood_median_split(spark, sf_dir):
    r = QUERIES["q_mood_median"](spark, sf_dir).collect()[0]
    assert r["k"] == 5
    assert r["chi2"] >= 0
    assert r["flag_reject"] in (0, 1)
