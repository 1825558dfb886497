"""Property tests for the round-3l batch: disparate impact, empirical-
Bayes shrinkage. Oracle parity at sf0.001 is covered by test_oracle_parity."""

from __future__ import annotations

from fortune_500_financial_insights_pipeline_spark.queries import QUERIES


def test_disparate_impact_reference(spark, sf_dir):
    out = QUERIES["q_disparate_impact"](spark, sf_dir).toPandas()
    assert len(out) == 25
    # impact ratio is rate / max-rate: bounded by 1, reference itself = 1
    assert (out["impact_ratio"] <= 1.0 + 1e-9).all()
    ref = out[out["nation"] == out["ref_nation"].iloc[0]]
    assert abs(ref["impact_ratio"].iloc[0] - 1.0) < 1e-9
    assert (out["flag_disparate"] == (out["impact_ratio"] < 0.8).astype(int)).all()


def test_empirical_bayes_shrinks_toward_grand(spark, sf_dir):
    out = QUERIES["q_empirical_bayes"](spark, sf_dir).toPandas()
    assert len(out) == 25
    assert ((out["shrink_b"] >= 0) & (out["shrink_b"] <= 1)).all()
    # the EB estimate sits between the raw mean and the grand mean
    lo = out[["raw_mean", "grand_mean"]].min(axis=1) - 1e-6
    hi = out[["raw_mean", "grand_mean"]].max(axis=1) + 1e-6
    assert ((out["eb_mean"] >= lo) & (out["eb_mean"] <= hi)).all()
    # bigger samples shrink less — unless tau^2 = 0 (no between-brand
    # signal), where B = 1 uniformly and full shrinkage is correct
    if out["shrink_b"].nunique() > 1:
        assert out["n_lines"].corr(out["shrink_b"]) <= 0
    else:
        assert (out["shrink_b"] == 1.0).all()
        assert (out["eb_mean"] == out["grand_mean"]).all()
