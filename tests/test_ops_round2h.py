"""Round-2h operator properties: hard-negative mining, within-doc line
dedup, benchmark containment, Theil–Sen slope, Benford audit (oracle
parity at sf0.001 lives in test_oracle_parity)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.checks import BENFORD_EXPECTED, benford_digit_audit
from fortune_500_financial_insights_pipeline_spark.operators.setjoin import containment_scores
from fortune_500_financial_insights_pipeline_spark.operators.similarity import hard_negatives
from fortune_500_financial_insights_pipeline_spark.operators.text import line_dup_stats
from fortune_500_financial_insights_pipeline_spark.operators.timeseries import theil_sen_slope


def test_hard_negatives_excludes_same_label(spark):
    rows = [
        (0, [1.0, 0.0], 7),
        (1, [0.99, 0.1], 7),   # nearest overall but SAME label -> excluded
        (2, [0.9, 0.3], 3),
        (3, [0.0, 1.0], 3),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = hard_negatives(df, n_queries=1, k=2).collect()
    assert [r["vec_id"] for r in got] == [2, 3]
    assert all(r["label"] != 7 for r in got)


def test_line_dup_stats_counts_repeats(spark):
    df = spark.createDataFrame(
        [(1, "a b. c d. a b. e"), (2, "x y. z w")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in line_dup_stats(df).collect()}
    assert (got[1]["n_lines"], got[1]["n_uniq"]) == (4, 3)
    assert got[1]["dup_line_frac"] == 0.25
    assert got[2]["dup_line_frac"] == 0.0


def test_containment_is_asymmetric_and_normalized_by_bench(spark):
    # bench doc has 4 grams; corpus doc contains 2 of them inside a much
    # larger gram set -> containment 0.5 regardless of corpus doc size.
    bench = spark.createDataFrame(
        [(100, g) for g in ["a b", "b c", "c d", "d e"]], "bench_id long, gram string"
    )
    corpus = spark.createDataFrame(
        [(7, g) for g in ["a b", "b c"] + [f"z{i} z{i+1}" for i in range(20)]],
        "doc_id long, gram string",
    )
    (row,) = containment_scores(corpus, bench, min_containment=0.1).collect()
    assert (row["doc_id"], row["bench_id"], row["shared_grams"]) == (7, 100, 2)
    assert row["containment"] == 0.5


def test_theil_sen_ignores_single_outlier(spark):
    # Perfect slope-2 line with one wild outlier: median slope stays 2.
    rows = [(t, 2 * t) for t in range(10)]
    rows[5] = (5, 1000)
    df = spark.createDataFrame(rows, "t long, n long")
    (row,) = theil_sen_slope(df, "t", "n").collect()
    assert row["n_pairs"] == 45
    assert row["slope_med"] == 2.0


def test_benford_audit_shares_and_expected_literals(spark):
    # 19 values: 10 leading-1s, 9 leading-2s (mixed magnitudes).
    vals = [1, 10, 12, 13, 100, 120, 150, 180, 19, 11, 2, 20, 21, 22, 23, 24, 25, 26, 27]
    df = spark.createDataFrame([(v,) for v in vals], "cents long")
    got = {r["digit"]: r for r in benford_digit_audit(df, "cents").collect()}
    assert set(got) == {1, 2}
    assert got[1]["n"] == 10 and got[2]["n"] == 9
    assert got[1]["obs_share"] == 10 / 19
    assert got[1]["exp_share"] == BENFORD_EXPECTED[1] == math.log10(2)
    assert got[1]["dev"] == 10 / 19 - math.log10(2)


def test_benford_drops_nonpositive(spark):
    df = spark.createDataFrame([(0,), (-5,), (3,)], "cents long")
    got = benford_digit_audit(df, "cents").collect()
    assert [(r["digit"], r["n"]) for r in got] == [(3, 1)]
