"""Round-2k operator properties: golden-record survivorship, TWAP,
Markov transition matrix (oracle parity at sf0.001 lives in
test_oracle_parity)."""

from __future__ import annotations

from fortune_500_financial_insights_pipeline_spark.operators.fuzzy import golden_record
from fortune_500_financial_insights_pipeline_spark.operators.paths import transition_matrix
from fortune_500_financial_insights_pipeline_spark.operators.timeseries import time_weighted_avg


def test_golden_record_latest_nonnull_per_attribute(spark):
    rows = [
        # cluster 1: newest version has null name -> name survives from v2,
        # phone from v3.
        (1, 1, "old-name", None),
        (1, 2, "mid-name", "111"),
        (1, 3, None, "333"),
        # cluster 2: single row, all attrs carried.
        (2, 1, "solo", "999"),
    ]
    df = spark.createDataFrame(rows, "k long, v long, name string, phone string")
    got = {r["k"]: r for r in golden_record(df, "k", "v", ["name", "phone"]).collect()}
    assert (got[1]["name"], got[1]["phone"], got[1]["n_members"]) == ("mid-name", "333", 3)
    assert (got[2]["name"], got[2]["phone"], got[2]["n_members"]) == ("solo", "999", 1)


def test_golden_record_beats_keep_latest_row(spark):
    # keep-latest row dedup would emit (None, "B"); survivorship must not.
    rows = [(1, 1, "A", "a"), (1, 2, None, "B")]
    df = spark.createDataFrame(rows, "k long, v long, x string, y string")
    (r,) = golden_record(df, "k", "v", ["x", "y"]).collect()
    assert (r["x"], r["y"]) == ("A", "B")


def test_twap_weights_by_holding_duration(spark):
    # value 10 held 9s, value 100 held 1s, final obs unweighted:
    # twap = (10*9 + 100*1) / 10 = 19.
    rows = [("u", 0, 10.0), ("u", 9, 100.0), ("u", 10, 7.0)]
    df = spark.createDataFrame(rows, "k string, ts long, value double")
    (r,) = time_weighted_avg(df, "k", "ts", "value", scale=100).collect()
    assert r["twap"] == 19.0


def test_twap_drops_single_observation_keys(spark):
    df = spark.createDataFrame(
        [("a", 0, 5.0), ("b", 0, 1.0), ("b", 10, 1.0)], "k string, ts long, value double"
    )
    got = {r["k"]: r["twap"] for r in
           time_weighted_avg(df, "k", "ts", "value").collect()}
    assert got == {"b": 1.0}  # "a" has zero total duration


def test_transition_matrix_counts_and_row_probabilities(spark):
    rows = [
        ("u1", 1, "a"), ("u1", 2, "b"), ("u1", 3, "a"),
        ("u2", 1, "a"), ("u2", 2, "b"), ("u2", 3, "b"),
    ]
    df = spark.createDataFrame(rows, "k string, t long, s string")
    got = {(r["from_state"], r["to_state"]): (r["n"], r["p"])
           for r in transition_matrix(df, "k", ["t"], "s").collect()}
    assert got[("a", "b")] == (2, 1.0)          # a always goes to b
    assert got[("b", "a")] == (1, 0.5)
    assert got[("b", "b")] == (1, 0.5)
    assert ("a", "a") not in got
    # no cross-user transition: u1's last 'a' never pairs with u2's first 'a'
    assert sum(n for n, _ in got.values()) == 4
