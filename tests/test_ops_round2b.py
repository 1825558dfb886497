"""Property and plan tests for the round-2b operators: BM25 retrieval,
epoch shuffle, incremental MV state merge."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.operators.incremental import (
    finalize_state,
    grouped_state,
    merge_states,
)
from fortune_500_financial_insights_pipeline_spark.operators.sampling import epoch_shuffle
from fortune_500_financial_insights_pipeline_spark.operators.tfidf import bm25_search
from fortune_500_financial_insights_pipeline_spark.queries import QUERIES


# --- bm25_search ----------------------------------------------------------


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "spark join hash join"),
            (2, "window agg sort window window"),
            (3, "stream batch merge stream"),
            (4, "join sort merge hash"),
        ],
        "doc_id long, text string",
    )


def test_bm25_search_ranks_and_caps(spark):
    queries = spark.createDataFrame(
        [(1, "join hash"), (2, "window")], "query_id int, qtext string"
    )
    out = bm25_search(_docs(spark), queries, k=2).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {1, 2}
    for rows in by_q.values():
        assert len(rows) <= 2
        assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == list(
            range(1, len(rows) + 1)
        )
        scores = [r.total_score for r in sorted(rows, key=lambda r: r.rank)]
        assert scores == sorted(scores, reverse=True)
    # doc 1 repeats 'join' and has 'hash': it must win query 1
    assert by_q[1][0].doc_id == 1 or by_q[1][0].rank != 1 or by_q[1][0].doc_id == 1


def test_bm25_search_unknown_terms_drop_silently(spark):
    queries = spark.createDataFrame(
        [(1, "join zzznotaword")], "query_id int, qtext string"
    )
    out = bm25_search(_docs(spark), queries, k=10).collect()
    assert out, "known term must still retrieve"
    assert all(r.total_score is not None for r in out)
    # only the 'join' postings matched — docs without 'join' absent
    assert {r.doc_id for r in out} == {1, 4}
    assert all(r.n_terms_hit == 1 for r in out)


def test_bm25_search_matches_full_postings_route(spark):
    """Round 9: the probe-first plan (filter tf by query vocabulary before
    scoring) must be VALUE-identical to scoring the full bm25() postings
    frame and then filtering — the pre-r9 formulation, reconstructed here
    row for row."""
    from pyspark.sql.window import Window

    from fortune_500_financial_insights_pipeline_spark.functions.deterministic import dsum
    from fortune_500_financial_insights_pipeline_spark.operators.tfidf import bm25

    docs = _docs(spark)
    queries = spark.createDataFrame(
        [(1, "join hash"), (2, "window"), (3, "stream zzznotaword")],
        "query_id int, qtext string",
    )
    fast = bm25_search(docs, queries, k=3)

    scored = bm25(docs)
    qterms = (
        queries.select(
            "query_id",
            F.explode(F.array_distinct(F.split(F.col("qtext"), " "))).alias("term"),
        )
        .where(F.col("term") != "")
    )
    totals = (
        scored.join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.round(dsum("score"), 6).alias("total_score"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("total_score"), F.asc("doc_id"))
    slow = totals.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= 3)

    key = lambda r: (r.query_id, r.doc_id)  # noqa: E731
    a = sorted(fast.collect(), key=key)
    b = sorted(slow.collect(), key=key)
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_bm25_search_plan_has_no_corpus_window(spark, sf_dir):
    """The probe form derives df/dl with aggregates over the probed or
    tf frames — the corpus-wide per-term and per-doc window sorts of the
    pre-r9 plan must not come back (the only Window allowed is the
    top-k rank, which rewrites to WindowGroupLimit)."""
    plan = (
        QUERIES["q_bm25_search"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
    n_windows = sum(
        1 for line in plan.splitlines() if line.lstrip("+:- ").startswith("Window [")
    )
    assert n_windows <= 1, n_windows


def test_bm25_search_broadcasts_query_terms(spark, sf_dir):
    plan = (
        QUERIES["q_bm25_search"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, "query-term probe must broadcast"


# --- epoch_shuffle --------------------------------------------------------


def test_epoch_shuffle_is_permutation_and_stable(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    a = epoch_shuffle(d, ["doc_id"], n_shards=4, epoch=0)
    n = d.count()
    rows = a.select("shard", "pos", "doc_id").collect()
    assert len(rows) == n
    # (shard, pos) is a total order: unique, positions contiguous from 1
    assert len({(r.shard, r.pos) for r in rows}) == n
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # rerun-stable
    again = {(r.doc_id): (r.shard, r.pos) for r in a.collect()}
    assert {(r.doc_id): (r.shard, r.pos) for r in rows} == again


def test_epoch_shuffle_epochs_differ_but_shards_do_not(spark):
    d = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    e0 = {r.doc_id: (r.shard, r.pos) for r in epoch_shuffle(d, ["doc_id"], n_shards=4, epoch=0).collect()}
    e1 = {r.doc_id: (r.shard, r.pos) for r in epoch_shuffle(d, ["doc_id"], n_shards=4, epoch=1).collect()}
    # shard assignment is epoch-independent (resumable export contract)
    assert all(e0[k][0] == e1[k][0] for k in e0)
    # but the within-shard order is a different permutation
    assert any(e0[k][1] != e1[k][1] for k in e0)


def test_epoch_shuffle_rejects_nonpositive_shards(spark):
    d = spark.range(3).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        epoch_shuffle(d, ["doc_id"], n_shards=0)


def test_epoch_shuffle_never_single_partition(spark, sf_dir):
    plan = (
        QUERIES["q_epoch_shuffle"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan


# --- incremental MV merge -------------------------------------------------


def test_merge_states_is_batching_invariant(spark):
    df = spark.createDataFrame(
        [(k % 3, float(k) + 0.25) for k in range(100)], "g int, v double"
    )
    whole = finalize_state(grouped_state(df, ["g"], "v"), ["g"])
    # two different batchings must finalize identically
    s2 = [grouped_state(df.where(F.col("v") < 50), ["g"], "v"),
          grouped_state(df.where(F.col("v") >= 50), ["g"], "v")]
    s4 = [
        grouped_state(df.where(F.floor("v") % 4 == i), ["g"], "v") for i in range(4)
    ]
    r_whole = {tuple(r) for r in whole.collect()}
    assert {tuple(r) for r in finalize_state(merge_states(s2, ["g"]), ["g"]).collect()} == r_whole
    assert {tuple(r) for r in finalize_state(merge_states(s4, ["g"]), ["g"]).collect()} == r_whole


def test_merge_states_shuffles_states_not_history(spark, sf_dir):
    plan = (
        QUERIES["q_mv_merge"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # every batch must partial-aggregate below its exchange: history rows
    # never cross the wire unaggregated
    assert plan.count("partial_count") >= 3


def test_merge_states_rejects_empty(spark):
    with pytest.raises(ValueError):
        merge_states([], ["g"])


# --- bm25_from_tf ---------------------------------------------------------


def test_bm25_from_tf_matches_windowed_form(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.tfidf import (
        bm25,
        bm25_from_tf,
        term_frequencies,
    )

    docs = _docs(spark)
    windowed = {tuple(r) for r in bm25(docs).collect()}
    materialized = {
        tuple(r) for r in bm25_from_tf(term_frequencies(docs)).collect()
    }
    assert windowed == materialized


def test_bm25_from_tf_plan_has_no_term_window(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.tfidf import (
        bm25_from_tf,
        term_frequencies,
    )

    plan = (
        bm25_from_tf(term_frequencies(_docs(spark)))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan, "scale path must not window over terms"
