"""Property tests for the round-2t batch: erasure scope, retention sweep,
O'Brien-Fleming interim looks. Oracle parity at sf0.001 is covered by
test_oracle_parity."""

from __future__ import annotations

from fortune_500_financial_insights_pipeline_spark.queries import QUERIES


def test_erasure_scope_cascade(spark, sf_dir):
    out = QUERIES["q_erasure_scope"](spark, sf_dir).toPandas().set_index("table_name")
    assert set(out.index) == {"customer", "orders", "lineitem"}
    # every seed customer exists; the cascade fans OUT (orders >= customers hit)
    assert out.loc["customer", "n_rows_affected"] > 0
    assert out.loc["orders", "n_rows_affected"] >= out.loc["customer", "n_rows_affected"]
    assert out.loc["lineitem", "n_rows_affected"] >= out.loc["orders", "n_rows_affected"]
    assert ((out["affected_share"] > 0) & (out["affected_share"] < 1)).all()


def test_retention_sweep_shares(spark, sf_dir):
    out = QUERIES["q_retention_sweep"](spark, sf_dir).toPandas().set_index("table_name")
    assert set(out.index) == {"orders", "lineitem", "events"}
    assert ((out["expired_share"] >= 0) & (out["expired_share"] <= 1)).all()
    assert (out["n_expired"] <= out["n_rows"]).all()
    # the oldest surviving row predates each cutoff (fixtures span years/weeks)
    assert out.loc["orders", "oldest_row"] < "1997-08-01"


def test_obrien_fleming_monotone_boundary(spark, sf_dir):
    out = QUERIES["q_obrien_fleming"](spark, sf_dir).toPandas().sort_values("look")
    assert len(out) == 4
    # OBF boundaries decay across looks; cumulative n is non-decreasing
    b = out["obf_boundary"].tolist()
    assert all(a > c for a, c in zip(b, b[1:]))
    nt = out["n_t"].tolist()
    assert all(a <= c for a, c in zip(nt, nt[1:]))
    # crossed is always a concrete 0/1, even when z degenerates
    assert set(out["crossed"].unique()) <= {0, 1}
