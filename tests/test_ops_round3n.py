"""Property tests for the round-3n batch: Wald SPRT, Oaxaca-Blinder
decomposition. Oracle parity at sf0.001 is covered by test_oracle_parity."""

from __future__ import annotations

from fortune_500_financial_insights_pipeline_spark.queries import QUERIES


def test_sprt_walk_consistent(spark, sf_dir):
    r = QUERIES["q_sprt"](spark, sf_dir).collect()[0]
    assert r["n_users"] > 0
    assert r["min_llr"] <= r["max_llr"]
    if r["decision"] == "continue":
        assert r["crossed_at"] is None
    else:
        assert 1 <= r["crossed_at"] <= r["n_users"]
        assert r["decision"] in ("accept_h0", "accept_h1")
        # the crossing value actually breaches a boundary (ln 19 ~ 2.944)
        assert abs(r["llr_at_cross"]) >= 2.944


def test_oaxaca_identity(spark, sf_dir):
    r = QUERIES["q_oaxaca"](spark, sf_dir).collect()[0]
    # two-fold decomposition is exact: parts sum to the total gap
    assert abs(
        r["gap_from_participation"] + r["gap_from_severity"] - r["total_gap"]
    ) < 1e-4
    assert r["n_treat"] > 0 and r["n_control"] > 0
