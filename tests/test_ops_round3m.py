"""Property tests for the round-3m batch: tail dependence, nested ANOVA.
Oracle parity at sf0.001 is covered by test_oracle_parity."""

from __future__ import annotations

from fortune_500_financial_insights_pipeline_spark.queries import QUERIES


def test_tail_dependence_bounds(spark, sf_dir):
    r = QUERIES["q_tail_dependence"](spark, sf_dir).collect()[0]
    assert 0.0 <= r["lambda_upper"] <= 1.0
    assert 0.0 <= r["lambda_lower"] <= 1.0
    assert r["n_joint_upper"] <= r["n_upper_x"]
    # each marginal tail holds ~10% of days
    assert r["n_upper_x"] <= r["n_days"] * 0.2 + 2


def test_nested_anova_decomposition(spark, sf_dir):
    r = QUERIES["q_nested_anova"](spark, sf_dir).collect()[0]
    assert r["k_regions"] == 5 and r["k_nations"] == 25
    assert r["ss_region"] >= 0 and r["ss_nation"] >= 0 and r["ss_within"] > 0
    assert r["f_region"] >= 0 and r["f_nation"] >= 0
    # the within term dominates for value data keyed by random nations
    assert r["ss_within"] > r["ss_region"]
