"""Round-2l operator properties: delta aggregate refresh, information
gain, Gini coefficient (oracle parity at sf0.001 lives in
test_oracle_parity)."""

from __future__ import annotations

import pytest as _pytest_r10

# round 10: heavyweight suite — excluded from the driver-budget default
# run (pytest.ini addopts); the full suite runs at every round close
pytestmark = _pytest_r10.mark.slow

import math

from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.operators.incremental import delta_agg_refresh
from fortune_500_financial_insights_pipeline_spark.operators.stats import (


    gini_coefficient,
    info_gain,
)

ROWS = "k long, g string, v long"


def _agg(df):
    return df.groupBy("g").agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))


def test_delta_agg_refresh_equals_recompute(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "c", 5)], ROWS
    )
    # delete 1, update 2 in place, MOVE 3 from b->a, leave 4, insert 5
    new = spark.createDataFrame(
        [(2, "a", 25), (3, "a", 30), (4, "c", 5), (5, "b", 7)], ROWS
    )
    got = delta_agg_refresh(
        _agg(old), old, new, ["k"], "g", sum_col="v"
    )
    expect = sorted(map(tuple, _agg(new).collect()))
    assert sorted(map(tuple, got.collect())) == expect
    # group 'b' kept alive only by the insert; without it, it must vanish
    new2 = spark.createDataFrame([(2, "a", 25), (3, "a", 30), (4, "c", 5)], ROWS)
    got2 = delta_agg_refresh(_agg(old), old, new2, ["k"], "g", sum_col="v")
    assert "b" not in {r["g"] for r in got2.collect()}


def test_delta_agg_refresh_count_only(spark):
    old = spark.createDataFrame([(1, "a", 0)], ROWS)
    new = spark.createDataFrame([(1, "a", 0), (2, "a", 0)], ROWS)
    old_agg = old.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    got = delta_agg_refresh(old_agg, old, new, ["k"], "g")
    assert [tuple(r) for r in got.collect()] == [("a", 2)]


def test_info_gain_perfect_and_independent_predictors(spark):
    # x fully determines y -> gain == H(Y); x independent of y -> gain 0.
    perfect = spark.createDataFrame(
        [("p1", "A")] * 2 + [("p2", "B")] * 2, "x string, y string"
    )
    (r,) = info_gain(perfect, "x", "y").collect()
    assert r["h_y"] == 1.0 and r["h_y_given_x"] == 0.0 and r["info_gain"] == 1.0

    indep = spark.createDataFrame(
        [("p1", "A"), ("p1", "B"), ("p2", "A"), ("p2", "B")], "x string, y string"
    )
    (r2,) = info_gain(indep, "x", "y").collect()
    assert r2["h_y"] == 1.0 and abs(r2["info_gain"]) < 1e-6


def test_gini_extremes(spark):
    # perfectly equal -> 0; fully concentrated -> (n-1)/n.
    equal = spark.createDataFrame([(i, 10) for i in range(5)], "id long, v long")
    (r,) = gini_coefficient(equal, "v", "id").collect()
    assert r["gini"] == 0.0
    conc = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 100)], "id long, v long"
    )


    (r2,) = gini_coefficient(conc, "v", "id").collect()
    assert math.isclose(r2["gini"], 3 / 4)
    assert (r2["n"], r2["total"]) == (4, 100)
