"""Property tests for the round-3k batch: survey raking (IPF), Hotelling
T². Oracle parity at sf0.001 is covered by test_oracle_parity."""

from __future__ import annotations

import math

from fortune_500_financial_insights_pipeline_spark.queries import QUERIES


def test_raking_converges_on_last_margin(spark, sf_dir):
    out = QUERIES["q_raking"](spark, sf_dir).toPandas()
    assert len(out) == 5
    # the final sweep adjusted the segment margin: it fits ~exactly
    assert (out["segment_rel_err"] < 1e-4).all()
    # the other (nation) margin keeps a residual — bounded, and possibly
    # large when tiny fixtures leave sample cells empty (weight can never
    # reach a nation with no sampled customers)
    assert (out["max_nation_rel_err"] < 1.0).all()
    assert (out["raked_weight"] > 0).all()


def test_hotelling_positive(spark, sf_dir):
    r = QUERIES["q_hotelling"](spark, sf_dir).collect()[0]
    assert r["n_treat"] > 0 and r["n_control"] > 0
    # T^2 is a quadratic form with a PD pooled covariance: nonnegative
    assert r["t2"] >= 0
    assert math.isfinite(r["diff_pre"]) and math.isfinite(r["diff_post"])
    assert r["flag_reject"] in (0, 1)
