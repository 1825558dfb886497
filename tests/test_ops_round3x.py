"""Property tests for the round-3x batch: partial correlation, VIF.
Oracle parity at sf0.001 is covered by test_oracle_parity."""

from __future__ import annotations

from fortune_500_financial_insights_pipeline_spark.queries import QUERIES


def test_partial_corr_bounds(spark, sf_dir):
    r = QUERIES["q_partial_corr"](spark, sf_dir).collect()[0]
    for c in ("r_xy", "r_xz", "r_yz", "partial_r_xy_given_z"):
        assert -1.0 - 1e-9 <= r[c] <= 1.0 + 1e-9
    # controlling a correlate can only partial OUT shared variance: the
    # partial r stays a valid correlation (tiny fixtures decorrelate
    # price from quantity, so no magnitude assumption is safe here)
    assert r["n"] > 100


def test_vif_at_least_one(spark, sf_dir):
    r = QUERIES["q_vif"](spark, sf_dir).collect()[0]
    for c in ("vif_quantity", "vif_discount", "vif_unit_price"):
        assert r[c] >= 1.0 - 1e-6  # VIF is bounded below by 1
