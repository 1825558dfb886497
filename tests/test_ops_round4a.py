"""Property tests for the round-4a batch: backlog curve, TOPSIS ranking.
Oracle parity at sf0.001 is covered by test_oracle_parity."""

from __future__ import annotations

from fortune_500_financial_insights_pipeline_spark.queries import QUERIES


def test_backlog_curve_conserves(spark, sf_dir):
    out = QUERIES["q_backlog_curve"](spark, sf_dir).toPandas().sort_values("m")
    assert len(out) > 12
    # flow conservation: final backlog = total placed - total closed
    assert out.iloc[-1]["open_backlog"] == out["n_placed"].sum() - out["n_closed"].sum()
    # backlog is a running sum: consecutive deltas match monthly net flow
    deltas = out["open_backlog"].diff().dropna()
    net = (out["n_placed"] - out["n_closed"]).iloc[1:]
    assert (deltas.values == net.values).all()


def test_topsis_closeness_bounds(spark, sf_dir):
    out = QUERIES["q_topsis"](spark, sf_dir).toPandas()
    assert 0 < len(out) <= 10
    assert ((out["closeness"] >= 0) & (out["closeness"] <= 1)).all()
    # output is sorted best-first
    c = out["closeness"].tolist()
    assert all(a >= b for a, b in zip(c, c[1:]))
    assert (out["d_ideal"] >= 0).all() and (out["d_anti"] >= 0).all()
