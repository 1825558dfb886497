"""Property tests for the round-3v batch: partition-pruning gain,
bloom-filter sizing. Oracle parity at sf0.001 is covered by
test_oracle_parity."""

from __future__ import annotations

from fortune_500_financial_insights_pipeline_spark.queries import QUERIES


def test_pruning_gain_order(spark, sf_dir):
    out = QUERIES["q_partition_pruning_gain"](spark, sf_dir).toPandas().set_index("pred")
    assert set(out.index) == {"one_week", "one_quarter", "two_years"}
    # pruned scan covers at least the selected rows, at most the table
    assert (out["rows_selected"] <= out["rows_scanned"]).all()
    assert (out["rows_scanned"] <= out["rows_full_scan"]).all()
    # narrower predicates scan less
    assert out.loc["one_week", "scan_fraction"] <= out.loc["two_years", "scan_fraction"]
    assert ((out["scan_precision"] > 0) & (out["scan_precision"] <= 1)).all()


def test_bloom_sizing_formula(spark, sf_dir):
    out = QUERIES["q_bloom_sizing"](spark, sf_dir).toPandas()
    assert len(out) == 4
    # optimal k at 1% fpp is ~6.64 hashes regardless of n
    assert ((out["k_hashes"] - 6.643856).abs() < 0.01).all()
    # ~9.59 bits per element
    assert ((out["m_bits"] / out["n_distinct"] - 9.585) .abs() < 0.1).all()
    assert (out["mib"] > 0).all()
