"""Property tests for the round-3b batch: two-way ANOVA, Tukey HSD.
Oracle parity at sf0.001 is covered by test_oracle_parity."""

from __future__ import annotations

from fortune_500_financial_insights_pipeline_spark.operators.stats import anova_twoway
from fortune_500_financial_insights_pipeline_spark.queries import QUERIES


def test_two_way_anova_decomposition(spark, sf_dir):
    r = QUERIES["q_two_way_anova"](spark, sf_dir).collect()[0]
    assert r["levels_a"] == 5 and r["levels_b"] == 3
    assert r["ss_a"] >= 0 and r["ss_b"] >= 0 and r["ss_within"] > 0
    assert r["f_a"] >= 0 and r["f_b"] >= 0 and r["f_interaction"] >= 0


def test_two_way_anova_additive_design_no_interaction(spark):
    # value = a_effect + b_effect exactly -> cell means are additive ->
    # SS_interaction == 0
    rows = [
        (a, b, float(10 * ai + bi))
        for ai, a in enumerate(["a1", "a2", "a3"])
        for bi, b in enumerate(["b1", "b2"])
        for _ in range(4)
    ]
    df = spark.createDataFrame(rows, "fa_in string, fb_in string, val double")
    r = anova_twoway(df, "val", "fa_in", "fb_in").collect()[0]
    assert abs(r["ss_interaction"]) < 1e-6
    assert r["ss_a"] > 0 and r["ss_b"] > 0


def test_tukey_pairs_complete(spark, sf_dir):
    out = QUERIES["q_tukey_hsd"](spark, sf_dir).toPandas()
    assert len(out) == 10  # C(5,2)
    assert (out["q_stat"] >= 0).all()
    assert set(out["significant"].unique()) <= {0, 1}
    # antisymmetry check via one reversed pair reconstruction
    assert (out["grp_a"] < out["grp_b"]).all()
