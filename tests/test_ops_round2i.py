"""Round-2i operator properties: magic-byte format detection, k-core
peeling, weighted median, interval coverage (oracle parity at sf0.001
lives in test_oracle_parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.operators.graph import kcore
from fortune_500_financial_insights_pipeline_spark.operators.intervaljoin import interval_coverage
from fortune_500_financial_insights_pipeline_spark.operators.multimodal import detect_format
from fortune_500_financial_insights_pipeline_spark.operators.normalize import weighted_median


def test_detect_format_magic_bytes(spark):
    cases = [
        ("89504E470D0A1A0A", "png"),
        ("FFD8FFE000104A46", "jpeg"),
        ("474946383961AABB", "gif"),
        ("52494646AABBCCDD57454250AABB", "webp"),
        ("52494646AABBCCDD41564920AABB", "unknown"),  # RIFF but AVI, not WEBP
        ("DEADBEEF", "unknown"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "h string").select(
        "h", detect_format(F.unhex(F.col("h"))).alias("fmt")
    )
    got = {r["h"]: r["fmt"] for r in df.collect()}
    for h, want in cases:
        assert got[h] == want, (h, got[h], want)


def test_kcore_peels_cascade_and_keeps_clique(spark):
    # A 5-clique (every node degree 4) plus node 10 wired to the clique
    # (0, 1) and to a weak pair (11, 12): round 1 peels 11 and 12
    # (degree 2 each), which drops 10 to degree 2 so round 2 peels it —
    # a genuine cascade, not a one-shot filter. The clique survives with
    # in-core degree 4.
    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    tail = [(0, 10), (1, 10), (10, 11), (10, 12), (11, 12)]
    df = spark.createDataFrame(clique + tail, "id_a long, id_b long")
    got = {r["node"]: r["degree"] for r in kcore(df, k=3, rounds=3).collect()}
    assert got == {0: 4, 1: 4, 2: 4, 3: 4, 4: 4}
    # Not yet converged after one round: 10 still present, weak pair gone.
    one = {r["node"] for r in kcore(df, k=3, rounds=1).collect()}
    assert 10 in one and 11 not in one and 12 not in one


def test_kcore_fixture_converges_inside_budget(spark, sf_dir):
    # The registered query peels 3 rounds; a 4th round must remove
    # nothing (fixpoint), or the registered result would be a lie.
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    r3 = QUERIES["q_kcore"](spark, sf_dir)
    e = load = None  # rebuild edges via one extra round on the operator
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    ub = ev.select(
        F.col("user_id").alias("u"),
        F.date_trunc("hour", "ts").alias("h"),
        F.col("event_type").alias("t"),
    ).distinct()
    a = ub.select(F.col("u").alias("id_a"), "h", "t")
    b = ub.select(F.col("u").alias("id_b"), "h", "t")
    edges = (
        a.join(b, ["h", "t"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__shared"))
        .where(F.col("__shared") >= 2)
        .select("id_a", "id_b")
    )
    r4 = kcore(edges, k=4, rounds=4)
    assert sorted(map(tuple, r3.collect())) == sorted(map(tuple, r4.collect()))


def test_weighted_median_definition(spark):
    # values 1..4 with weights 1,1,1,7: half the weight (5 of 10) is
    # first reached at value 4 -> weighted median 4; unweighted would be 2.
    df = spark.createDataFrame(
        [("g", 1, 1), ("g", 2, 1), ("g", 3, 1), ("g", 4, 7)],
        "g string, v long, w long",
    )
    (row,) = weighted_median(df, ["g"], "v", "w").collect()
    assert row["w_median"] == 4
    # Exact half-crossing picks the LOWER median value.
    df2 = spark.createDataFrame([("g", 1, 5), ("g", 9, 5)], "g string, v long, w long")
    (row2,) = weighted_median(df2, ["g"], "v", "w").collect()
    assert row2["w_median"] == 1


def test_interval_coverage_merges_overlaps(spark):
    rows = [
        ("u", 0, 10),
        ("u", 5, 15),    # overlaps -> one island [0, 15]
        ("u", 20, 30),   # separate island
        ("u", 22, 25),   # nested, same island
        ("v", 0, 1),
    ]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = {r["k"]: r for r in interval_coverage(df, "k", "s", "e").collect()}
    assert (got["u"]["covered"], got["u"]["n_islands"]) == (25, 2)
    assert (got["v"]["covered"], got["v"]["n_islands"]) == (1, 1)


def test_interval_coverage_touching_intervals_merge(spark):
    # start == prior end: not start > pme, so they merge (closed touch).
    df = spark.createDataFrame([("u", 0, 10), ("u", 10, 20)], "k string, s long, e long")
    (row,) = interval_coverage(df, "k", "s", "e").collect()
    assert (row["covered"], row["n_islands"]) == (20, 1)
