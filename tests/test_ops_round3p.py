"""Property tests for the round-3p batch: capture-recapture, German tank,
Good-Turing missing mass. Oracle parity at sf0.001 is covered by
test_oracle_parity."""

from __future__ import annotations

from fortune_500_financial_insights_pipeline_spark.queries import QUERIES


def test_capture_recapture_bounds(spark, sf_dir):
    r = QUERIES["q_capture_recapture"](spark, sf_dir).collect()[0]
    assert r["m"] <= min(r["n1"], r["n2"])
    # the estimate can never fall below either observed sample
    assert r["n_hat_chapman"] >= max(r["n1"], r["n2"]) - 1


def test_german_tank_reasonable(spark, sf_dir):
    r = QUERIES["q_german_tank"](spark, sf_dir).collect()[0]
    assert r["k"] > 0
    assert r["n_hat"] >= r["max_seen"]
    # a 2% systematic sample estimates the keyspace within ~10%
    assert r["rel_err"] < 0.1


def test_missing_mass_bounds(spark, sf_dir):
    out = QUERIES["q_missing_mass"](spark, sf_dir).toPandas()
    assert len(out) == 5
    assert ((out["missing_mass_p0"] >= 0) & (out["missing_mass_p0"] <= 1)).all()
    assert (out["n_singletons"] <= out["vocab"]).all()
    got = out[out["chao1_unseen_vocab"].notna()]
    assert (got["chao1_unseen_vocab"] >= 0).all()
