"""BPE trainer/encoder (operators/bpe.py): merge semantics, determinism,
vocabulary structure."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.operators.bpe import (
    _merge_once,
    bpe_segment,
    bpe_train,
    word_frequencies,
)
from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

# round 10: heavyweight suite — excluded from the driver-budget default
# run (pytest.ini addopts), executed in full at every round close
import pytest as _pytest_r10
pytestmark = _pytest_r10.mark.slow



def _syms(spark, word: str, lhs: str, rhs: str) -> list[str]:
    df = spark.createDataFrame([(word,)], "w string")
    return list(
        df.select(_merge_once(F.split("w", ""), lhs, rhs).alias("s")).head()["s"]
    )


def test_merge_is_leftmost_greedy_on_runs(spark):
    # the overlapping-run case: 'aaa' + (a,a) merges the LEFT pair only
    assert _syms(spark, "aaa", "a", "a") == ["aa", "a"]
    assert _syms(spark, "aaaa", "a", "a") == ["aa", "aa"]
    assert _syms(spark, "aaaaa", "a", "a") == ["aa", "aa", "a"]


def test_merge_handles_disjoint_and_absent_sites(spark):
    assert _syms(spark, "abab", "a", "b") == ["ab", "ab"]
    assert _syms(spark, "aab", "a", "b") == ["a", "ab"]
    assert _syms(spark, "xyz", "a", "b") == ["x", "y", "z"]
    # single-char word: the sequence(1,0)=[1,0] trap must not create sites
    assert _syms(spark, "a", "a", "a") == ["a"]


def test_train_learns_the_dominant_pair_first(spark):
    docs = spark.createDataFrame(
        [(1, "abab abab cd"), (2, "abab cd cd")], "doc_id long, text string"
    )
    merges = bpe_train(docs, n_merges=2).collect()
    assert (merges[0].lhs, merges[0].rhs) == ("a", "b")
    # 'ab' appears twice per 'abab' word occurrence -> count 6
    assert merges[0].pair_count == 6
    assert merges[0].step == 1 and merges[1].step == 2


def test_train_tie_breaks_lexicographically(spark):
    docs = spark.createDataFrame([(1, "xy za xy za")], "doc_id long, text string")
    merges = bpe_train(docs, n_merges=1).collect()
    # (x,y) and (z,a) both count 2 — lexicographically lower lhs wins
    assert (merges[0].lhs, merges[0].rhs) == ("x", "y")


def test_train_stops_when_fully_merged(spark):
    docs = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    merges = bpe_train(docs, n_merges=10).collect()
    # one merge exhausts the 2-char vocabulary; no phantom steps
    assert len(merges) == 1


def test_segment_matches_train_vocabulary(spark):
    docs = spark.createDataFrame(
        [(1, "abab cd"), (2, "cd abab abab")], "doc_id long, text string"
    )
    merges = [(r.lhs, r.rhs) for r in bpe_train(docs, n_merges=2).collect()]
    seg = bpe_segment(docs, merges)
    counts = {(r.doc_id, r.token): r.n for r in seg.collect()}
    # merge 1 = (a,b) count 6; merge 2 = (ab,ab) (ties with (c,d), 'ab' < 'c')
    # -> each 'abab' word is ONE token after both merges
    assert merges == [("a", "b"), ("ab", "ab")]
    assert counts[(2, "abab")] == 2 and counts[(1, "abab")] == 1
    # token counts conserve characters
    total_chars = sum(
        len(t) * n for (_, t), n in counts.items()
    )
    assert total_chars == sum(len(w) for w in "abab cd cd abab abab".split())


def test_word_frequencies_is_vocab_sized(spark):
    docs = spark.createDataFrame([(1, "a b a"), (2, "b a")], "doc_id long, text string")
    rows = {r.word: r.cnt for r in word_frequencies(docs).collect()}
    assert rows == {"a": 3, "b": 2}


def test_train_rejects_nonpositive_merges(spark):
    docs = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bpe_train(docs, n_merges=0)


def test_registered_bpe_queries_run(spark, sf_dir):
    m = QUERIES["q_bpe_train"](spark, sf_dir).collect()
    assert len(m) == 3 and [r.step for r in m] == [1, 2, 3]
    seg = QUERIES["q_bpe_segment"](spark, sf_dir)
    assert seg.columns == ["doc_id", "token", "n"]
    assert seg.count() > 0


def test_batched_train_matches_sequential_when_batch_is_one(spark):
    docs = spark.createDataFrame(
        [(1, "abab abab cd"), (2, "abab cd cd ef ef")], "doc_id long, text string"
    )
    seq = [tuple(r) for r in bpe_train(docs, n_merges=4).collect()]
    b1 = [tuple(r) for r in bpe_train(docs, n_merges=4, batch_size=1).collect()]
    assert seq == b1


def test_batched_train_selects_symbol_disjoint_pairs(spark):
    # dominant pairs (a,b) and (b,c) share 'b' -> must land in different
    # batches; (a,b) and (x,y) are disjoint -> same batch is legal
    docs = spark.createDataFrame(
        [(1, "abc abc abc xy xy")], "doc_id long, text string"
    )
    stats: dict = {}
    merges = bpe_train(docs, n_merges=3, batch_size=3, stats=stats).collect()
    got = [(r.lhs, r.rhs) for r in merges]
    # snapshot 1: (a,b) cnt 3 wins; (b,c) cnt 3 shares 'b' -> skipped;
    # (x,y) cnt 2 disjoint -> batched. snapshot 2: (ab,c)
    assert got == [("a", "b"), ("x", "y"), ("ab", "c")]
    assert stats["iterations"] == 2
    # steps stay sequential across batches
    assert [r.step for r in merges] == [1, 2, 3]


def test_batched_train_64_merges_in_bounded_iterations(spark):
    # 64 two-char words over 128 DISTINCT symbols -> 64 fully
    # symbol-disjoint dominant pairs; a 16-wide batch must learn all 64
    # merges in ~4 snapshots, not 64
    words = [chr(0x100 + 2 * i) + chr(0x100 + 2 * i + 1) for i in range(64)]
    text = " ".join(w for w in words for _ in range(2))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    stats: dict = {}
    merges = bpe_train(docs, n_merges=64, batch_size=16, stats=stats).collect()
    assert len(merges) == 64
    assert stats["iterations"] <= 6  # ceil(64/16) + slack, never 64
    assert sorted((r.lhs + r.rhs) for r in merges) == sorted(words)
    # every snapshot count is the true pre-batch pair frequency (2 each)
    assert all(r.pair_count == 2 for r in merges)


def test_select_disjoint_batch_fences_products():
    """Round-4 advisor fix: a candidate whose lhs/rhs equals the
    concatenation of an already-selected pair (or whose concatenation
    equals a symbol an earlier-selected pair touches) is deferred —
    otherwise one in-batch merge consumes tokens another creates and the
    recorded counts diverge from sequential semantics."""
    from fortune_500_financial_insights_pipeline_spark.operators.bpe import _select_disjoint_batch

    # ('ab','c') consumes the product of ('a','b') -> must be deferred
    got = _select_disjoint_batch([("a", "b", 9), ("ab", "c", 8), ("x", "y", 7)], 3)
    assert got == [("a", "b", 9), ("x", "y", 7)]
    # vice versa: ('a','b') produces 'ab', which ('ab','c') (ranked
    # higher) consumes -> the later one is deferred
    got = _select_disjoint_batch([("ab", "c", 9), ("a", "b", 8), ("x", "y", 7)], 3)
    assert got == [("ab", "c", 9), ("x", "y", 7)]
    # product collides with a consumed symbol: ('a','bc') after ('abc','d')
    got = _select_disjoint_batch([("abc", "d", 9), ("a", "bc", 8)], 2)
    assert got == [("abc", "d", 9)]
    # identical products fence each other: ('a','bc') vs ('ab','c')
    got = _select_disjoint_batch([("a", "bc", 9), ("ab", "c", 8)], 2)
    assert got == [("a", "bc", 9)]
    # plain symbol sharing still rejected
    got = _select_disjoint_batch([("a", "b", 9), ("b", "c", 8)], 2)
    assert got == [("a", "b", 9)]
