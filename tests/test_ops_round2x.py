"""Property tests for the round-2x batch: session stats, DAU/WAU
stickiness, feature adoption. Oracle parity at sf0.001 is covered by
test_oracle_parity."""

from __future__ import annotations

from fortune_500_financial_insights_pipeline_spark.queries import QUERIES


def test_session_stats_bounds(spark, sf_dir):
    r = QUERIES["q_session_stats"](spark, sf_dir).collect()[0]
    assert r["n_sessions"] > 0
    assert r["sessions_per_user"] >= 1.0
    assert r["mean_events"] >= 1.0
    assert 0.0 <= r["bounce_share"] <= 1.0
    # a 30-min-gap session can't be longer than the whole event window
    assert 0.0 <= r["median_duration_s"] <= r["mean_duration_s"] * 10 + 1


def test_stickiness_bounds(spark, sf_dir):
    out = QUERIES["q_stickiness"](spark, sf_dir).toPandas()
    assert len(out) == 30
    # DAU never exceeds the trailing-7-day audience
    assert (out["dau"] <= out["wau"]).all()
    assert ((out["stickiness"] > 0) & (out["stickiness"] <= 1)).all()
    # after the first week the trailing window is full: wau >= dau strictly
    # on at least one day (users don't all show up every day)
    assert (out["stickiness"] < 1).any()


def test_feature_adoption_shape(spark, sf_dir):
    out = QUERIES["q_feature_adoption"](spark, sf_dir).toPandas()
    assert set(out["event_type"]) == {"click", "view", "purchase", "signup", "error"}
    assert (out["n_week1"] <= out["n_adopters"]).all()
    assert ((out["adoption_share"] > 0) & (out["adoption_share"] <= 1)).all()
    assert (out["median_days_to_adopt"] >= 0).all()
