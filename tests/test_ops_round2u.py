"""Property tests for the round-2u batch: multiclass F1, MCC, Cohen's
kappa. Oracle parity at sf0.001 is covered by test_oracle_parity."""

from __future__ import annotations

from fortune_500_financial_insights_pipeline_spark.queries import QUERIES


def test_f1_multiclass_consistency(spark, sf_dir):
    out = QUERIES["q_f1_multiclass"](spark, sf_dir).toPandas().set_index("cls")
    per = out[~out.index.str.startswith("__")]
    assert len(per) >= 2
    assert ((per["precision"] >= 0) & (per["precision"] <= 1)).all()
    assert ((per["f1"] >= 0) & (per["f1"] <= 1)).all()
    # single-label multiclass: total fp == total fn, micro == accuracy
    assert out.loc["__micro", "fp"] == out.loc["__micro", "fn"]
    assert out.loc["__micro", "precision"] == out.loc["__micro", "recall"]
    # macro f1 equals the mean of the per-class f1 values
    assert abs(out.loc["__macro", "f1"] - per["f1"].mean()) < 1e-5


def test_mcc_bounds_and_cell_total(spark, sf_dir):
    r = QUERIES["q_mcc"](spark, sf_dir).collect()[0]
    assert -1.0 <= r["mcc"] <= 1.0
    assert 0.0 <= r["balanced_accuracy"] <= 1.0
    n_docs = QUERIES["q_langid_confusion"](spark, sf_dir).groupBy().sum("n").collect()[0][0]
    assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == n_docs


def test_cohen_kappa_bounds(spark, sf_dir):
    r = QUERIES["q_cohen_kappa"](spark, sf_dir).collect()[0]
    assert 0.0 <= r["p_observed"] <= 1.0
    assert 0.0 <= r["p_expected"] <= 1.0
    assert -1.0 <= r["kappa"] <= 1.0
    # kappa never exceeds raw agreement
    assert r["kappa"] <= r["p_observed"] + 1e-9
