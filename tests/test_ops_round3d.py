"""Property tests for the round-3d batch: optimal pricing, concurrency
profile, forecast combination. Oracle parity at sf0.001 is covered by
test_oracle_parity."""

from __future__ import annotations

from fortune_500_financial_insights_pipeline_spark.queries import QUERIES


def test_optimal_price_above_cost(spark, sf_dir):
    out = QUERIES["q_optimal_price"](spark, sf_dir).toPandas()
    assert len(out) == 25
    assert (out["unit_cost"] < out["mean_price"]).all()
    got = out[out["optimal_price"].notna()]
    # a monopoly price with downward demand always sits above marginal cost
    assert (got["optimal_price"] >= got["unit_cost"] - 1e-6).all()
    # the gap column is exactly optimal - mean
    assert (
        (got["optimal_price"] - got["mean_price"] - got["price_gap"]).abs() < 1e-5
    ).all()


def test_concurrency_littles_law(spark, sf_dir):
    r = QUERIES["q_concurrency_profile"](spark, sf_dir).collect()[0]
    assert r["peak_concurrent"] >= 1
    assert r["peak_concurrent"] >= r["mean_concurrent"]
    # L = lambda * W holds by construction up to rounding
    assert abs(r["littles_ratio"] - 1.0) < 1e-3
    assert r["arrivals_per_hour"] > 0


def test_forecast_combo_rows(spark, sf_dir):
    out = QUERIES["q_forecast_combo"](spark, sf_dir).toPandas().set_index("model")
    assert set(out.index) == {"naive", "weekly", "drift", "combo"}
    assert (out["test_mae"] > 0).all()
    # the inverse-MAE blend shouldn't be dramatically worse than the best
    # member (it usually wins; noise bound keeps the test scale-stable)
    assert out.loc["combo", "test_mae"] <= out["test_mae"].min() * 1.5
