"""Property tests for the round-3a batch: price indices, Bass diffusion,
OLS inference. Oracle parity at sf0.001 is covered by test_oracle_parity."""

from __future__ import annotations

import math

from fortune_500_financial_insights_pipeline_spark.queries import QUERIES


def test_price_index_fisher_between(spark, sf_dir):
    r = QUERIES["q_price_index"](spark, sf_dir).collect()[0]
    assert r["n_parts"] > 0
    lo, hi = sorted([r["laspeyres"], r["paasche"]])
    # Fisher is the geometric mean: always between L and P
    assert lo - 1e-6 <= r["fisher"] <= hi + 1e-6
    assert r["laspeyres"] > 0 and r["paasche"] > 0


def test_bass_diffusion_coefficients(spark, sf_dir):
    r = QUERIES["q_bass_diffusion"](spark, sf_dir).collect()[0]
    assert r["n_days"] >= 3  # needs at least the 3 dof of the quadratic
    assert math.isfinite(r["coef_a"])
    if r["market_size"] is not None:
        # estimated market can't be below the already-observed adopters
        assert r["market_size"] > 0
        if r["p_innovation"] is not None:
            assert r["p_innovation"] > 0


def test_ols_inference_consistency(spark, sf_dir):
    r = QUERIES["q_ols_inference"](spark, sf_dir).collect()[0]
    assert r["se_beta"] > 0
    # t = beta / se by construction
    assert abs(r["t_beta"] - r["beta"] / r["se_beta"]) < 1e-3
    assert 0.0 <= r["r2"] <= 1.0
    # the flag is exactly the |t| > 1.96 decision
    assert r["significant"] == (1 if abs(r["t_beta"]) > 1.96 else 0)
