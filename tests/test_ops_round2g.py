"""Round-2g operator properties: changeset MERGE round trip, one-pass
column profiler, seasonal decomposition, exact ACF, CUSUM changepoint,
signed random projection (oracle parity at sf0.001 lives in
test_oracle_parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.checks import profile_columns
from fortune_500_financial_insights_pipeline_spark.operators.cdc import (
    apply_changeset,
    snapshot_diff,
)
from fortune_500_financial_insights_pipeline_spark.operators.timeseries import (
    acf_exact,
    cusum_peaks,
    seasonal_decompose,
)


def test_apply_changeset_round_trips_snapshot_diff(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "CHANGED"), (4, "d")], "k long, v string"
    )
    diff = snapshot_diff(old, new, ["k"], ["v"])
    changeset = diff.select("k", "action").join(new, "k", "left")
    rebuilt = apply_changeset(old, changeset, ["k"], ["v"])
    assert sorted(map(tuple, rebuilt.collect())) == sorted(map(tuple, new.collect()))


def test_apply_changeset_ignores_unchanged_and_delete_payload(spark):
    snap = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    changes = spark.createDataFrame(
        [(1, "unchanged", "IGNORED"), (2, "delete", None), (9, "insert", "z")],
        "k long, action string, v string",
    )
    got = sorted(map(tuple, apply_changeset(snap, changes, ["k"], ["v"]).collect()))
    assert got == [(1, "a"), (9, "z")]


def test_profile_columns_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, None), (3, "y")], "a long, b string"
    )
    prof = {r["col_name"]: r for r in profile_columns(df, ["a", "b"]).collect()}
    a, b = prof["a"], prof["b"]
    assert (a["n_rows"], a["n_nonnull"], a["n_distinct"]) == (4, 4, 3)
    assert (a["min_s"], a["max_s"], a["null_frac"]) == ("1", "3", 0.0)
    assert (b["n_nonnull"], b["n_distinct"], b["null_frac"]) == (3, 2, 0.25)
    assert (b["min_s"], b["max_s"]) == ("x", "y")


def test_seasonal_decompose_recovers_pure_seasonal_signal(spark):
    # level 10 + zero-sum period-3 pattern [3, -1, -2]: trend must be the
    # level, seasonal the pattern, residual exactly zero on every
    # interior row.
    pat = [3, -1, -2]
    rows = [(t, 10 + pat[t % 3]) for t in range(9)]
    df = spark.createDataFrame(rows, "t long, v long")
    out = seasonal_decompose(df, "t", "v", period=3).collect()
    assert len(out) == 7  # 9 rows minus one edge each side
    for r in out:
        assert r["trend"] == 10.0
        assert r["seasonal"] == float(pat[r["t"] % 3])
        assert r["residual"] == 0.0


def test_acf_exact_alternating_series_hits_closed_form(spark):
    # x = 5,1,5,1,... (n=8): r_k = (-1)^k * (n-k)/n exactly.
    rows = [(t, 5 if t % 2 == 0 else 1) for t in range(8)]
    df = spark.createDataFrame(rows, "t long, v long")
    got = {r["lag_k"]: r["acf"] for r in acf_exact(df, "t", "v", max_lag=3).collect()}
    assert got == {1: -7 / 8, 2: 6 / 8, 3: -5 / 8}


def test_cusum_peak_lands_on_the_level_shift(spark):
    rows = [(t, 0) for t in range(10)] + [(t, 4) for t in range(10, 20)]
    df = spark.createDataFrame(rows, "t long, v long")
    top = cusum_peaks(df, "t", "v", top_n=1).collect()
    # c_t = 20*x - 40; running sum bottoms out at the 10th day (t=9).
    assert top[0]["t"] == 9 and top[0]["cusum"] == -400


def test_rp_projection_is_exact_integer_and_finds_duplicates(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.rproj import (
        rp_knn,
        sign_entry,
    )

    assert all(sign_entry(p, d) in (-1, 1) for p in range(8) for d in range(4))
    # vec 0 and its exact duplicate project identically -> pdist 0 for
    # both; an orthogonal-ish vector lands strictly farther.
    rows = [
        (0, [1.0, 2.0, 3.0, 4.0]),
        (1, [1.0, 2.0, 3.0, 4.0]),
        (2, [-4.0, 3.0, -2.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = rp_knn(df, query_id=0, dim=4, m=8, k=3).collect()
    assert [(r["vec_id"], r["pdist"]) for r in got[:2]] == [(0, 0), (1, 0)]
    assert got[2]["vec_id"] == 2 and got[2]["pdist"] > 0


def test_sparse_cosine_pairs_planted(spark):
    """Two vocabulary-similar docs score high; an unrelated doc pairs with
    neither; ubiquitous terms (idf 0) and near-ubiquitous terms (max_df
    cut) never create candidates on their own."""
    from fortune_500_financial_insights_pipeline_spark.operators.tfidf import (
        sparse_cosine_pairs,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta alpha beta"),
            (2, "alpha beta gamma delta epsilon"),
            (3, "zeta eta theta iota kappa"),
            (4, "alpha zeta unrelatedterm anotherone somethingelse"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.id_a, r.id_b): r.cos_sim
        for r in sparse_cosine_pairs(docs, min_sim=0.3).collect()
    }
    assert (1, 2) in got and got[(1, 2)] > 0.5
    assert all(3 not in pair or pair == (1, 2) for pair in got), got
    # partition-invariance of the fixed-point pipeline
    got2 = {
        (r.id_a, r.id_b): r.cos_sim
        for r in sparse_cosine_pairs(docs.repartition(7), min_sim=0.3).collect()
    }
    assert got == got2
