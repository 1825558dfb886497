"""Operator-level tests for the round-2 additions: Bloom filter,
2-D skyline, exact rolling median, shard assignment."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.operators.bloom import (
    bloom_build,
    bloom_probe,
)
from fortune_500_financial_insights_pipeline_spark.operators.sampling import hash_shards
from fortune_500_financial_insights_pipeline_spark.operators.skyline import skyline_2d
from fortune_500_financial_insights_pipeline_spark.operators.timeseries import (
    rolling_median,
)


# ---------------------------------------------------------------- bloom

def test_bloom_no_false_negatives(spark):
    """Every key in the build set must probe as maybe_member — the Bloom
    contract that makes it a sound join pre-filter."""
    build = spark.range(0, 400).withColumnRenamed("id", "k")
    flt = bloom_build(build, "k", m_bits=8192, k=3)
    probed = bloom_probe(flt, build, "k", m_bits=8192, k=3)
    assert probed.where(~F.col("maybe_member")).count() == 0


def test_bloom_false_positive_rate_bounded(spark):
    """Probing disjoint keys: FP rate should sit near the designed
    (1-e^{-kn/m})^k ≈ 0.7% for n=400, m=8192, k=3 — assert well under 5%."""
    build = spark.range(0, 400).withColumnRenamed("id", "k")
    flt = bloom_build(build, "k", m_bits=8192, k=3)
    absent = spark.range(10_000, 12_000).withColumnRenamed("id", "k")
    fp = bloom_probe(flt, absent, "k", m_bits=8192, k=3).where("maybe_member").count()
    assert fp / 2000 < 0.05


def test_bloom_merge_by_union(spark):
    """Two filters of the same shape OR together: rebuild over the union
    equals bit_or-merge of the parts, cell for cell."""
    a = spark.range(0, 100).withColumnRenamed("id", "k")
    b = spark.range(100, 200).withColumnRenamed("id", "k")
    merged = (
        bloom_build(a, "k", m_bits=4096, k=3)
        .unionByName(bloom_build(b, "k", m_bits=4096, k=3))
        .groupBy("word")
        .agg(F.bit_or("bits").alias("bits"))
    )
    whole = bloom_build(a.unionByName(b), "k", m_bits=4096, k=3)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_bloom_build_rejects_unaligned_bits(spark):
    with pytest.raises(ValueError):
        bloom_build(spark.range(1).withColumnRenamed("id", "k"), "k", m_bits=1000)


# -------------------------------------------------------------- skyline

def test_skyline_matches_bruteforce(spark, sf_dir):
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    rows = part.collect()
    brute = {
        r.p_partkey
        for r in rows
        if not any(
            (o.p_retailprice <= r.p_retailprice and o.p_size >= r.p_size)
            and (o.p_retailprice < r.p_retailprice or o.p_size > r.p_size)
            for o in rows
        )
    }
    got = {
        r.p_partkey
        for r in skyline_2d(part, minimize="p_retailprice", maximize="p_size").collect()
    }
    assert got == brute and got  # non-empty frontier


def test_skyline_keeps_exact_ties(spark):
    df = spark.createDataFrame(
        [Row(id=1, cost=1.0, perf=10), Row(id=2, cost=1.0, perf=10),
         Row(id=3, cost=2.0, perf=5)]
    )
    ids = {r.id for r in skyline_2d(df, "cost", "perf").collect()}
    assert ids == {1, 2}  # identical pairs both survive; dominated row drops


# ------------------------------------------------------- rolling median

def test_rolling_median_odd_and_even_frames(spark):
    df = spark.createDataFrame(
        [Row(g=1, i=1, x=10.0), Row(g=1, i=2, x=20.0),
         Row(g=1, i=3, x=5.0), Row(g=1, i=4, x=7.0)]
    )
    out = {
        r.i: r.med
        for r in rolling_median(df, ["g"], ["i"], "x", frame_rows=3).collect()
    }
    # frames: [10] -> 10; [10,20] -> 15 (interpolated); [10,20,5] -> 10;
    # [20,5,7] -> 7
    assert out == {1: 10.0, 2: 15.0, 3: 10.0, 4: 7.0}


# --------------------------------------------------------- hash shards

def test_hash_shards_stable_and_in_range(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    a = hash_shards(df, ["k"], 16)
    assert a.where((F.col("shard") < 0) | (F.col("shard") >= 16)).count() == 0
    # repartitioning must not move any row between shards
    b = hash_shards(df.repartition(7), ["k"], 16)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # roughly uniform: no shard holds more than 3x its fair share
    counts = [r[1] for r in a.groupBy("shard").count().collect()]
    assert len(counts) == 16 and max(counts) < 3 * (1000 / 16)


def test_hash_shards_rejects_nonpositive(spark):
    with pytest.raises(ValueError):
        hash_shards(spark.range(1), ["id"], 0)


# ------------------------------------------------------------------ kmv

def test_kmv_estimate_accuracy(spark, sf_dir):
    """k=64 → relative stderr ≈ 1/sqrt(64) = 12.5%; assert every group
    estimate within 50% of exact (generous so fixture regens can't flake)."""
    from fortune_500_financial_insights_pipeline_spark.operators.kmv import kmv_estimate, kmv_sketch

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    est = {
        r.event_type: r.est_distinct
        for r in kmv_estimate(
            kmv_sketch(e, ["event_type"], "user_id", k=64), ["event_type"], k=64
        ).collect()
    }
    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert est.keys() == exact.keys()
    for t, n in exact.items():
        assert abs(est[t] - n) / n < 0.5, (t, est[t], n)


def test_kmv_merge_equals_sketch_of_union(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.kmv import kmv_merge, kmv_sketch

    a = spark.range(0, 500).select(F.lit("g").alias("g"), F.col("id").alias("k"))
    b = spark.range(300, 900).select(F.lit("g").alias("g"), F.col("id").alias("k"))
    merged = kmv_merge(
        kmv_sketch(a, ["g"], "k", k=32), kmv_sketch(b, ["g"], "k", k=32), ["g"], k=32
    )
    whole = kmv_sketch(a.unionByName(b), ["g"], "k", k=32)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_kmv_small_group_is_exact(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.kmv import kmv_estimate, kmv_sketch

    df = spark.range(0, 10).select(F.lit("g").alias("g"), F.col("id").alias("k"))
    out = kmv_estimate(kmv_sketch(df, ["g"], "k", k=64), ["g"], k=64).collect()
    assert out[0].est_distinct == 10.0


def test_kmv_rejects_tiny_k(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.kmv import kmv_sketch

    with pytest.raises(ValueError):
        kmv_sketch(spark.range(1).select(F.lit("g").alias("g"), "id"), ["g"], "id", k=1)


# -------------------------------------------------------- weighted sample

def test_weighted_sample_partition_invariant(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.operators.sampling import weighted_sample

    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .withColumn("w", F.length("text"))
    )
    a = weighted_sample(d, "w", ["doc_id"], 40).select("doc_id").collect()
    b = weighted_sample(d.repartition(13), "w", ["doc_id"], 40).select("doc_id").collect()
    assert sorted(r.doc_id for r in a) == sorted(r.doc_id for r in b)


def test_weighted_sample_biases_toward_weight(spark):
    """Rows weighted 100x must dominate the draw: ~n_heavy selected from
    the heavy half despite equal counts. Deterministic given md5."""
    from fortune_500_financial_insights_pipeline_spark.operators.sampling import weighted_sample

    df = spark.range(0, 1000).select(
        F.col("id"), F.when(F.col("id") < 500, 100.0).otherwise(1.0).alias("w")
    )
    picked = weighted_sample(df, "w", ["id"], 100).collect()
    heavy = sum(1 for r in picked if r.id < 500)
    assert heavy > 80  # E[heavy] ≈ 99 under w-proportional draws


def test_weighted_sample_rejects_nonpositive_n(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.sampling import weighted_sample

    with pytest.raises(ValueError):
        weighted_sample(spark.range(1).withColumn("w", F.lit(1.0)), "w", ["id"], 0)


# ------------------------------------------------------------ kmv overlap

def test_kmv_overlap_tracks_exact_jaccard(spark):
    """Two overlapping key ranges: sketch estimates must sit near the true
    Jaccard/intersection (k=128 → ~9% stderr; assert within 35%)."""
    from fortune_500_financial_insights_pipeline_spark.operators.kmv import kmv_overlap

    a = spark.range(0, 2000).withColumnRenamed("id", "k")
    b = spark.range(1000, 3000).withColumnRenamed("id", "k")
    r = kmv_overlap(a, b, "k", k=128).collect()[0]
    # truth: |A∩B|=1000, |A∪B|=3000, J=1/3
    assert abs(r.j_est - 1 / 3) / (1 / 3) < 0.35, r
    assert abs(r.union_est - 3000) / 3000 < 0.35, r
    assert abs(r.inter_est - 1000) / 1000 < 0.35, r


def test_kmv_overlap_exact_below_capacity(spark):
    """Fewer than k distinct hashes in the union → all three outputs exact."""
    from fortune_500_financial_insights_pipeline_spark.operators.kmv import kmv_overlap

    a = spark.range(0, 60).withColumnRenamed("id", "k")
    b = spark.range(40, 100).withColumnRenamed("id", "k")
    r = kmv_overlap(a, b, "k", k=128).collect()[0]
    assert r.union_est == 100.0 and r.j_est == 0.2 and r.inter_est == 20.0, r
