"""Property tests for the round-3t batch: additive Holt-Winters fold.
Oracle parity at sf0.001 is covered by test_oracle_parity."""

from __future__ import annotations

import math

from fortune_500_financial_insights_pipeline_spark.operators.timeseries import (
    holt_winters_additive,
)
from fortune_500_financial_insights_pipeline_spark.queries import QUERIES


def test_holt_winters_pure_seasonal_signal(spark):
    # value = 100 + seasonal pattern, no trend: level converges near 100,
    # trend near 0, and the seasonal head tracks the true deviation
    pat = [10.0, -5.0, 0.0, 5.0, -10.0, 3.0, -3.0]
    rows = [(f"{t:03d}", 100.0 + pat[t % 7]) for t in range(70)]
    df = spark.createDataFrame(rows, "o string, x double")
    r = holt_winters_additive(df, "o", "x").collect()[0]
    assert abs(r["level"] - 100.0) < 2.0
    assert abs(r["trend"]) < 0.5
    # after 70 obs the queue head is the deviation due at t=70: pat[0]
    assert abs(r["season_next"] - pat[0]) < 2.0
    assert abs(r["forecast_next"] - (100.0 + pat[0])) < 3.0


def test_holt_winters_fixture(spark, sf_dir):
    r = QUERIES["q_holt_winters"](spark, sf_dir).collect()[0]
    assert r["n_obs"] >= 15
    assert math.isfinite(r["level"]) and math.isfinite(r["trend"])
    assert math.isfinite(r["forecast_next"])
