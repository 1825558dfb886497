"""Property tests for the round-3s batch: Brier decomposition, Qini
uplift curve. Oracle parity at sf0.001 is covered by test_oracle_parity."""

from __future__ import annotations

from fortune_500_financial_insights_pipeline_spark.queries import QUERIES


def test_brier_decomposition_bounds(spark, sf_dir):
    r = QUERIES["q_brier_decomposition"](spark, sf_dir).collect()[0]
    assert 0.0 <= r["brier"] <= 1.0
    assert r["reliability"] >= 0 and r["resolution"] >= 0
    assert 0.0 <= r["uncertainty"] <= 0.25
    assert 0.0 <= r["ece"] <= 1.0
    # resolution can't exceed the outcome uncertainty
    assert r["resolution"] <= r["uncertainty"] + 1e-9
    # binned identity holds up to within-bin variance
    assert abs(r["decomposition_gap"]) < 0.05


def test_qini_curve_shape(spark, sf_dir):
    out = QUERIES["q_qini"](spark, sf_dir).toPandas().sort_values("decile")
    assert len(out) == 10
    # the last point defines the random baseline endpoint: equal there
    assert abs(out.iloc[-1]["qini"] - out.iloc[-1]["random_baseline"]) < 1e-6
    assert abs(out.iloc[-1]["qini_above_random"]) < 1e-6
    # cumulative counts increase
    nt = out["cum_nt"].tolist()
    assert all(a <= b for a, b in zip(nt, nt[1:]))
