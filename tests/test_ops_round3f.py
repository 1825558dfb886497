"""Property tests for the round-3f batch: term burstiness, bigram entropy
rate. Oracle parity at sf0.001 is covered by test_oracle_parity."""

from __future__ import annotations

from fortune_500_financial_insights_pipeline_spark.queries import QUERIES


def test_burstiness_bounds(spark, sf_dir):
    out = QUERIES["q_burstiness"](spark, sf_dir).toPandas()
    assert 0 < len(out) <= 20
    assert ((out["burstiness"] >= 0) & (out["burstiness"] <= 1)).all()
    assert (out["df2"] <= out["df"]).all()
    # a doc with tf>=2 contributes at least 2 to tf_total
    assert (out["tf_total"] >= out["df"] + out["df2"]).all()


def test_entropy_rate_bounds(spark, sf_dir):
    out = QUERIES["q_entropy_rate"](spark, sf_dir).toPandas()
    assert len(out) >= 2
    # conditional entropy is nonnegative and at most log2(vocab) ~ small
    # for the synthetic word-bag fixtures
    assert (out["entropy_rate_bits"] >= 0).all()
    assert (out["entropy_rate_bits"] <= 16).all()
    assert (out["n_bigrams"] > 0).all()
