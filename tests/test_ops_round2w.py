"""Property tests for the round-2w batch: pairs-trading stats, weekday
ANOVA, Fellegi-Sunter linkage weights. Oracle parity at sf0.001 is
covered by test_oracle_parity."""

from __future__ import annotations

import math

from fortune_500_financial_insights_pipeline_spark.queries import QUERIES


def test_pairs_trading_finite(spark, sf_dir):
    r = QUERIES["q_pairs_trading"](spark, sf_dir).collect()[0]
    assert r["n_days"] > 10
    assert math.isfinite(r["beta"]) and math.isfinite(r["alpha"])
    # random iid prices: the spread strongly mean-reverts (phi near -1)
    assert -2.0 < r["phi"] < 0.0
    if r["half_life_days"] is not None:
        assert r["half_life_days"] > 0


def test_weekday_effect_shape(spark, sf_dir):
    r = QUERIES["q_weekday_effect"](spark, sf_dir).collect()[0]
    assert r["k"] == 7
    assert r["f_stat"] >= 0 and math.isfinite(r["f_stat"])


def test_fellegi_sunter_pattern_ordering(spark, sf_dir):
    out = (
        QUERIES["q_fellegi_sunter"](spark, sf_dir)
        .toPandas()
        .set_index(["nation_agree", "segment_agree"])
    )
    assert len(out) == 4
    # more agreements -> strictly more evidence
    assert out.loc[(1, 1), "fs_score"] > out.loc[(1, 0), "fs_score"]
    assert out.loc[(1, 1), "fs_score"] > out.loc[(0, 1), "fs_score"]
    assert out.loc[(0, 0), "fs_score"] < out.loc[(0, 1), "fs_score"]
    # agreement on a field carries positive weight, disagreement negative
    assert out.loc[(1, 1), "fs_score"] > 0
    assert out.loc[(0, 0), "fs_score"] < 0
    assert (out["n_pairs"] > 0).all()
