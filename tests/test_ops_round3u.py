"""Property tests for the round-3u batch: McNemar, Cochran's Q.
Oracle parity at sf0.001 is covered by test_oracle_parity."""

from __future__ import annotations

from fortune_500_financial_insights_pipeline_spark.queries import QUERIES


def test_mcnemar_cells(spark, sf_dir):
    r = QUERIES["q_mcnemar"](spark, sf_dir).collect()[0]
    assert r["b"] + r["c"] + r["both_right"] <= r["n"]
    assert r["mcnemar_chi2"] >= 0
    assert r["flag_different"] == (1 if r["mcnemar_chi2"] > 3.841 else 0)


def test_cochran_q_bounds(spark, sf_dir):
    r = QUERIES["q_cochran_q"](spark, sf_dir).collect()[0]
    assert r["cochran_q"] >= 0
    for c in ("right_stopword", "right_ascii", "right_length"):
        assert 0 <= r[c] <= r["n_docs"]
    assert r["flag_differ"] in (0, 1)
