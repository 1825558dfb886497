"""Property tests for the round-2y batch: Jarque-Bera, Q-Q deciles,
IQR fences. Oracle parity at sf0.001 is covered by test_oracle_parity."""

from __future__ import annotations

from fortune_500_financial_insights_pipeline_spark.queries import QUERIES


def test_jarque_bera_flags_uniformish(spark, sf_dir):
    out = QUERIES["q_jarque_bera"](spark, sf_dir).toPandas()
    assert len(out) == 5
    assert (out["jb_stat"] >= 0).all()
    # order values are uniform-ish, not normal: every group should flag
    assert (out["flag_nonnormal"] == 1).all()
    # uniform distributions are platykurtic (negative excess kurtosis)
    assert (out["excess_kurtosis"] < 0).all()


def test_qq_normal_monotone(spark, sf_dir):
    out = QUERIES["q_qq_normal"](spark, sf_dir).toPandas().sort_values("p")
    assert len(out) == 9
    sq = out["sample_q"].tolist()
    assert all(a <= b for a, b in zip(sq, sq[1:]))  # deciles monotone
    sz = out["sample_z"].tolist()
    assert all(a <= b for a, b in zip(sz, sz[1:]))
    assert out["gap"].abs().max() < 3.0


def test_iqr_fences_consistency(spark, sf_dir):
    out = QUERIES["q_iqr_fences"](spark, sf_dir).toPandas()
    assert len(out) == 5
    assert (out["q3"] >= out["q1"]).all()
    assert (out["n_extreme"] <= out["n_outliers"]).all()
    assert ((out["outlier_share"] >= 0) & (out["outlier_share"] < 0.5)).all()
    # quartiles sit inside the fences by construction
    assert (out["lo_inner"] <= out["q1"]).all()
    assert (out["hi_inner"] >= out["q3"]).all()
