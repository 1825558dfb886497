"""Property tests for the round-3z batch: process capability.
Oracle parity at sf0.001 is covered by test_oracle_parity."""

from __future__ import annotations

from fortune_500_financial_insights_pipeline_spark.queries import QUERIES


def test_process_capability_relations(spark, sf_dir):
    r = QUERIES["q_process_capability"](spark, sf_dir).collect()[0]
    assert r["n_out_of_spec"] <= r["n_orders"]
    # Cpk <= Cp always (centering can only hurt)
    assert r["cpk"] <= r["cp"] + 1e-9
    assert 0.0 <= r["oos_share"] <= 1.0
    assert r["taguchi_loss_ratio"] >= 0
