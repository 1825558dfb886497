"""Property tests for the round-4c batch: profit curve, Youden's J.
Oracle parity at sf0.001 is covered by test_oracle_parity."""

from __future__ import annotations

from fortune_500_financial_insights_pipeline_spark.queries import QUERIES


def test_profit_curve_best_is_max(spark, sf_dir):
    out = QUERIES["q_profit_curve"](spark, sf_dir).toPandas()
    assert len(out) == 9
    assert out["is_best"].sum() == 1
    best = out[out["is_best"] == 1].iloc[0]
    assert best["profit"] == out["profit"].max()
    # profit identity
    assert (out["profit"] == 10 * out["tp"] - out["fp"] - 5 * out["fn"]).all()


def test_youden_bounds(spark, sf_dir):
    out = QUERIES["q_youden"](spark, sf_dir).toPandas()
    assert len(out) == 9
    assert ((out["sensitivity"] >= 0) & (out["sensitivity"] <= 1)).all()
    assert ((out["specificity"] >= 0) & (out["specificity"] <= 1)).all()
    assert ((out["youden_j"] >= -1) & (out["youden_j"] <= 1)).all()
    assert out["is_best"].sum() == 1
    # raising the threshold trades sensitivity down for specificity up
    s = out.sort_values("threshold")
    assert (s["sensitivity"].diff().dropna() <= 1e-9).all()
    assert (s["specificity"].diff().dropna() >= -1e-9).all()
