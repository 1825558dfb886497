"""Property tests for the round-2v batch: inventory policy, Croston
intermittent demand, newsvendor quantile stocking. Oracle parity at
sf0.001 is covered by test_oracle_parity."""

from __future__ import annotations

from fortune_500_financial_insights_pipeline_spark.operators.timeseries import croston
from fortune_500_financial_insights_pipeline_spark.queries import QUERIES


def test_inventory_policy_invariants(spark, sf_dir):
    out = QUERIES["q_inventory_policy"](spark, sf_dir).toPandas()
    assert len(out) == 25
    assert (out["sd_daily_demand"] >= 0).all()
    # reorder point = lead-time demand + safety stock, so it dominates both
    assert (out["reorder_point"] >= out["safety_stock"]).all()
    assert (out["reorder_point"] >= 7 * out["mean_daily_demand"] - 1e-6).all()
    assert (out["eoq"] > 0).all()


def test_croston_constant_series(spark):
    # demand of size 4 every 10 days: z converges at 4, p at 10 exactly
    rows = [("p", f"2024-01-{d:02d}", 4.0) for d in (1, 11, 21, 31)]
    df = spark.createDataFrame(rows, "k string, day string, size double")
    r = croston(df, ["k"], "day", "size", alpha=0.1).collect()[0]
    assert r["size_est"] == 4.0
    assert r["interval_est"] == 10.0
    assert r["demand_rate"] == 0.4
    assert r["n_events"] == 4


def test_croston_two_events_is_init_state(spark):
    rows = [("p", "2024-01-01", 2.0), ("p", "2024-01-06", 8.0)]
    df = spark.createDataFrame(rows, "k string, day string, size double")
    r = croston(df, ["k"], "day", "size").collect()[0]
    # no updates happen with n=2: state is the documented init (x1, i2)
    assert r["size_est"] == 2.0 and r["interval_est"] == 5.0


def test_newsvendor_stockout_at_most_20pct(spark, sf_dir):
    out = QUERIES["q_newsvendor"](spark, sf_dir).toPandas()
    assert len(out) == 25
    # stocking the 0.8 quantile leaves ~20% of days short, up to the
    # one-observation granularity of an interpolated empirical quantile
    assert (out["stockout_share"] <= 0.2 + 1.0 / out["n_days"] + 1e-9).all()
    assert (out["mean_unmet_demand"] >= 0).all()
