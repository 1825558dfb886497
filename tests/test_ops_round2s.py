"""Property tests for the round-2s batch: change-point, Holt linear
smoothing, Theil's U, Nelson-Aalen hazard. Oracle parity at sf0.001 is
covered by test_oracle_parity."""

from __future__ import annotations

import math

from fortune_500_financial_insights_pipeline_spark.operators.timeseries import (
    binary_changepoint,
    holt_linear,
)
from fortune_500_financial_insights_pipeline_spark.queries import QUERIES


def test_changepoint_finds_planted_break(spark):
    # level 10 for t<50, level 30 after: the split must land at t=49/50
    rows = [("s", f"{t:03d}", 10.0 if t < 50 else 30.0) for t in range(100)]
    df = spark.createDataFrame(rows, "sid string, o string, v double")
    r = binary_changepoint(df, ["sid"], "o", "v").collect()[0]
    assert r["break_after"] == "049"
    assert r["mean_before"] == 10.0 and r["mean_after"] == 30.0


def test_changepoint_respects_min_seg(spark):
    rows = [("s", f"{t:03d}", float(t)) for t in range(20)]
    df = spark.createDataFrame(rows, "sid string, o string, v double")
    r = binary_changepoint(df, ["sid"], "o", "v", min_seg=8).collect()[0]
    assert 8 <= r["n_before"] <= 12


def test_holt_constant_series_zero_trend(spark):
    rows = [("g", f"{t:02d}", 5.0) for t in range(30)]
    df = spark.createDataFrame(rows, "g string, o string, x double")
    r = holt_linear(df, ["g"], "o", "x").collect()[0]
    assert r["level"] == 5.0 and r["trend"] == 0.0
    assert r["forecast_h3"] == 5.0


def test_holt_linear_series_recovers_slope(spark):
    # x_t = 2t: Holt converges to trend 2; forecast extrapolates
    rows = [("g", f"{t:02d}", 2.0 * t) for t in range(40)]
    df = spark.createDataFrame(rows, "g string, o string, x double")
    r = holt_linear(df, ["g"], "o", "x").collect()[0]
    assert abs(r["trend"] - 2.0) < 0.05
    assert r["forecast_h3"] > r["level"]


def test_theil_u_positive(spark, sf_dir):
    r = QUERIES["q_theil_u"](spark, sf_dir).collect()[0]
    assert r["n"] > 0
    assert r["rmse_naive"] > 0 and r["rmse_weekly"] > 0
    assert math.isfinite(r["theil_u"]) and r["theil_u"] > 0


def test_nelson_aalen_monotone_and_vs_km(spark, sf_dir):
    na = QUERIES["q_nelson_aalen"](spark, sf_dir).toPandas().sort_values("t")
    assert (na["cum_hazard"].diff().dropna() >= 0).all()  # hazard accumulates
    assert ((na["survival_breslow"] > 0) & (na["survival_breslow"] <= 1)).all()
    # Breslow S = exp(-H) dominates the KM product-limit curve pointwise
    km = QUERIES["q_kaplan_meier"](spark, sf_dir).toPandas().sort_values("t")
    merged = na.merge(km, on="t", suffixes=("_na", "_km"))
    assert (merged["survival_breslow"] >= merged["survival"] - 1e-9).all()
