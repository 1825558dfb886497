"""Property tests for the round-3y batch: MDE planner, session gap sweep.
Oracle parity at sf0.001 is covered by test_oracle_parity."""

from __future__ import annotations

from fortune_500_financial_insights_pipeline_spark.queries import QUERIES


def test_mde_planner(spark, sf_dir):
    r = QUERIES["q_mde"](spark, sf_dir).collect()[0]
    assert r["mde_abs"] > 0 and r["mde_relative"] > 0
    assert r["n_per_arm_for_5pct"] > 0
    # detecting a smaller (5%) lift than the current MDE needs more users
    if r["mde_relative"] > 0.05:
        assert r["n_per_arm_for_5pct"] > r["n_users"] / 2


def test_session_gap_sweep_monotone(spark, sf_dir):
    out = QUERIES["q_session_gap_sweep"](spark, sf_dir).toPandas().set_index("sweep")
    assert set(out.index) == {"10min", "30min", "60min"}
    # a larger gap threshold merges sessions: counts weakly decrease
    assert (
        out.loc["10min", "n_sessions"]
        >= out.loc["30min", "n_sessions"]
        >= out.loc["60min", "n_sessions"]
    )
    assert (out["mean_events_per_session"] >= 1).all()
