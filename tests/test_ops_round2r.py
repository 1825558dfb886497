"""Property tests for the round-2r batch: classical inference family
(one-way ANOVA, Spearman, Kruskal-Wallis, Cramér's V, Brown-Forsythe).
Oracle parity at sf0.001 is covered by test_oracle_parity."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.operators.stats import (
    anova_oneway,
    spearman_by_group,
)
from fortune_500_financial_insights_pipeline_spark.queries import QUERIES


def test_anova_nonnegative_and_partition(spark, sf_dir):
    r = QUERIES["q_anova"](spark, sf_dir).collect()[0]
    assert r["k"] == 5
    assert r["ss_between"] >= 0 and r["ss_within"] > 0
    assert math.isfinite(r["f_stat"]) and r["f_stat"] >= 0


def test_anova_identical_groups_zero_f(spark):
    # same values in every group -> SS_between == 0 -> F == 0
    rows = [(g, float(v)) for g in ("a", "b", "c") for v in (1, 2, 3, 4)]
    df = spark.createDataFrame(rows, "grp_in string, val double")
    r = anova_oneway(df, "val", "grp_in").collect()[0]
    assert r["ss_between"] == 0.0
    assert r["f_stat"] == 0.0


def test_spearman_bounds_and_perfect_monotone(spark, sf_dir):
    out = QUERIES["q_spearman"](spark, sf_dir).toPandas()
    assert len(out) == 3
    assert ((out["spearman_rho"] >= -1) & (out["spearman_rho"] <= 1)).all()
    # perfect monotone relationship -> rho == 1 exactly (integer interior)
    df = spark.createDataFrame(
        [("g", float(i), float(i * i)) for i in range(1, 20)],
        "grp_in string, a double, b double",
    )
    r = spearman_by_group(df, "a", "b", "grp_in").collect()[0]
    assert r["spearman_rho"] == 1.0


def test_spearman_reversed_is_minus_one(spark):
    df = spark.createDataFrame(
        [("g", float(i), float(-i)) for i in range(1, 15)],
        "grp_in string, a double, b double",
    )
    r = spearman_by_group(df, "a", "b", "grp_in").collect()[0]
    assert r["spearman_rho"] == -1.0


def test_kruskal_wallis_shapes(spark, sf_dir):
    r = QUERIES["q_kruskal_wallis"](spark, sf_dir).collect()[0]
    assert r["k"] == 5
    assert r["h_stat"] >= 0
    # tie correction can only inflate H (corr <= 1)
    assert r["h_corrected"] >= r["h_stat"] - 1e-9
    assert r["flag_reject"] in (0, 1)


def test_cramers_v_bounds(spark, sf_dir):
    r = QUERIES["q_cramers_v"](spark, sf_dir).collect()[0]
    assert 0.0 <= r["cramers_v"] <= 1.0
    assert r["chi2"] >= 0.0


def test_levene_bounds(spark, sf_dir):
    r = QUERIES["q_levene"](spark, sf_dir).collect()[0]
    assert r["k"] == 3
    assert r["f_stat"] >= 0 and math.isfinite(r["f_stat"])
