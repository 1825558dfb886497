"""Property tests for the round-2z batch: SLO burn rate, Apdex, incident
stats. Oracle parity at sf0.001 is covered by test_oracle_parity."""

from __future__ import annotations

from fortune_500_financial_insights_pipeline_spark.queries import QUERIES


def test_error_budget_windows_nest(spark, sf_dir):
    out = QUERIES["q_error_budget"](spark, sf_dir).toPandas().set_index("win")
    assert set(out.index) == {"1d", "3d", "7d"}
    # windows nest: a longer trailing window sees at least as many events
    assert out.loc["1d", "n_events"] <= out.loc["3d", "n_events"] <= out.loc["7d", "n_events"]
    assert (out["n_errors"] <= out["n_events"]).all()
    assert (out["burn_rate"] >= 0).all()
    # fixture error rate is ~20%: every window burns hot
    assert (out["alert"] == 1).all()


def test_apdex_bounds(spark, sf_dir):
    out = QUERIES["q_apdex"](spark, sf_dir).toPandas()
    assert len(out) == 5
    assert ((out["apdex"] >= 0) & (out["apdex"] <= 1)).all()
    assert (out["n_satisfied"] + out["n_tolerating"] <= out["n"]).all()


def test_incident_stats_sane(spark, sf_dir):
    r = QUERIES["q_incident_stats"](spark, sf_dir).collect()[0]
    assert r["n_incidents"] >= 1
    assert r["mean_duration_s"] >= 0
    assert r["median_duration_s"] <= r["mean_duration_s"] * 10 + 1
    assert r["max_burst_errors"] >= 1
    if r["n_incidents"] > 1:
        # incidents are separated by >600s gaps by construction
        assert r["mean_time_between_s"] > 600
