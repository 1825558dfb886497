"""Property tests for the round-3i batch: two-way fixed effects, sourcing
risk. Oracle parity at sf0.001 is covered by test_oracle_parity."""

from __future__ import annotations

import math

from fortune_500_financial_insights_pipeline_spark.queries import QUERIES


def test_fixed_effects_shape(spark, sf_dir):
    r = QUERIES["q_fixed_effects"](spark, sf_dir).collect()[0]
    assert r["n_entities"] >= 5 and r["n_periods"] >= 12
    assert r["n_obs"] <= r["n_entities"] * r["n_periods"]
    assert math.isfinite(r["beta_within"])
    assert 0.0 <= r["r2_within"] <= 1.0


def test_sourcing_risk_partition(spark, sf_dir):
    out = QUERIES["q_sourcing_risk"](spark, sf_dir).toPandas()
    assert set(out["sourcing"]) <= {"1_single", "2_dual", "3_plus"}
    assert (out["n_parts"] > 0).all()
    # shares partition the total spend
    assert abs(out["spend_share"].sum() - 1.0) < 1e-4
