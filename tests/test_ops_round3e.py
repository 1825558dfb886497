"""Property tests for the round-3e batch: permutation test, reach curve,
round-number forensics. Oracle parity at sf0.001 is covered by
test_oracle_parity."""

from __future__ import annotations

from fortune_500_financial_insights_pipeline_spark.queries import QUERIES


def test_permutation_test_valid_p(spark, sf_dir):
    r = QUERIES["q_permutation_test"](spark, sf_dir).collect()[0]
    assert r["n_perms"] == 200
    # the +1 smoothing bounds p away from 0 and 1
    assert 1.0 / 201 <= r["p_value"] <= 1.0
    assert 0 <= r["n_ge"] <= 200
    assert r["obs_diff"] >= 0


def test_reach_curve_monotone(spark, sf_dir):
    out = QUERIES["q_reach_curve"](spark, sf_dir).toPandas().sort_values("rk")
    assert len(out) == 5
    cr = out["cumulative_reach"].tolist()
    assert all(a <= b for a, b in zip(cr, cr[1:]))  # reach accumulates
    # incremental reach can't exceed the channel's solo reach
    assert (out["incremental_reach"] <= out["solo_reach"]).all()
    # the last step covers every active user
    assert abs(out["cumulative_share"].iloc[-1] - 1.0) < 1e-9


def test_round_number_bias_shape(spark, sf_dir):
    out = QUERIES["q_round_number_bias"](spark, sf_dir).toPandas()
    assert set(out["pattern"]) == {"c00", "c50", "c99"}
    assert ((out["obs_share"] >= 0) & (out["obs_share"] <= 1)).all()
    assert (out["expected_share"] == 0.01).all()
