"""Property tests for the round-4b batch: share of wallet, month-end
effect. Oracle parity at sf0.001 is covered by test_oracle_parity."""

from __future__ import annotations

from fortune_500_financial_insights_pipeline_spark.queries import QUERIES


def test_wallet_share_bounds(spark, sf_dir):
    r = QUERIES["q_wallet_share"](spark, sf_dir).collect()[0]
    # top-brand share is at least 1/n_brands and at most 1
    assert 0.0 < r["mean_share_of_wallet"] <= 1.0
    assert 0.0 < r["median_share_of_wallet"] <= 1.0
    assert r["n_majority_loyal"] <= r["n_customers"]
    assert abs(
        r["majority_loyal_share"] - r["n_majority_loyal"] / r["n_customers"]
    ) < 1e-5


def test_month_end_effect_sane(spark, sf_dir):
    r = QUERIES["q_month_end_effect"](spark, sf_dir).collect()[0]
    assert r["n_months"] > 12
    # uniform-ish synthetic shipping: mean lift near 1, worst month is max
    assert 0.0 < r["mean_lift"] < 3.0
    assert r["worst_lift"] >= r["mean_lift"]
    assert 0 <= r["n_months_flagged"] <= r["n_months"]
