"""Property tests for the round-3q batch: Kendall's W, chi-squared cell
residuals. Oracle parity at sf0.001 is covered by test_oracle_parity."""

from __future__ import annotations

from fortune_500_financial_insights_pipeline_spark.queries import QUERIES


def test_kendall_w_bounds(spark, sf_dir):
    r = QUERIES["q_kendall_w"](spark, sf_dir).collect()[0]
    assert r["k_rankings"] == 3
    assert r["n_items"] == 25
    # W lives in [0, 1]; revenue/volume/order-count rankings broadly agree
    assert 0.0 <= r["kendall_w"] <= 1.0


def test_chi2_residuals_full_grid(spark, sf_dir):
    out = QUERIES["q_chi2_residuals"](spark, sf_dir).toPandas()
    assert len(out) == 15  # 5 priorities x 3 statuses, zero cells restored
    # residuals are centered: observed totals match expected totals
    assert abs(out["observed"].sum() - out["expected"].sum()) < 1e-3
    assert (out["flag_cell"] == (out["std_residual"].abs() > 2).astype(int)).all()
