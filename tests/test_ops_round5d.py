"""Round-5d operators: Gopher quality-rule suite, cross-corpus
boilerplate-unit detection (CCNet paragraph-hash rule over CDC chunks),
and the two real-media feature keys (resize roundtrip, audio features).

Rule tests craft one violation per rule so every flag is shown to flip
independently; the boilerplate tests pin the countDistinct semantics
(within-doc repetition alone is NOT boilerplate) and the plan-quality
test pins the single-build property (ReusedExchange) the operator's
scale story depends on."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.operators.text import (
    EN_STOPWORDS,
    GOPHER_STOPWORDS,
    boilerplate_lines,
    boilerplate_units,
    gopher_rules,
)

PASSING = (
    "the cat sat on the mat and then the dog came to sit with the cat "
    "for a while and that was all they did have done today with the sun"
)


def _flags(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return gopher_rules(df, **kw).collect()[0]


def test_gopher_all_rules_pass_on_clean_text(spark):
    r = _flags(spark, PASSING)
    assert r["pass_all"], r.asDict()


def test_gopher_word_count_rule(spark):
    assert not _flags(spark, "too few words here")["r_word_count"]
    assert _flags(spark, PASSING)["r_word_count"]


def test_gopher_mean_word_len_rule(spark):
    shorts = " ".join(["a b"] * 20)
    assert not _flags(spark, shorts)["r_mean_word_len"]
    longs = " ".join(["pneumonoultramicroscopic"] * 20)
    assert not _flags(spark, longs)["r_mean_word_len"]


def test_gopher_symbol_ratio_rule(spark):
    hashy = PASSING + " " + "#" * 10
    assert not _flags(spark, hashy)["r_symbol_ratio"]
    dots = PASSING + " " + "... " * 10
    assert not _flags(spark, dots)["r_symbol_ratio"]


def test_gopher_bullet_and_ellipsis_line_rules(spark):
    bullets = "\n".join(["- item " + PASSING] * 10)
    assert not _flags(spark, bullets)["r_bullet"]
    ells = "\n".join([PASSING + "..."] * 10)
    assert not _flags(spark, ells)["r_ellipsis"]
    assert _flags(spark, PASSING)["r_bullet"]
    assert _flags(spark, PASSING)["r_ellipsis"]


def test_gopher_alpha_words_rule(spark):
    nums = PASSING + " " + " ".join(str(i) for i in range(40))
    assert not _flags(spark, nums)["r_alpha_words"]


def test_gopher_stopword_rule_and_custom_list(spark):
    no_stop = " ".join(["flux qux zap"] * 10)
    assert not _flags(spark, no_stop)["r_stopwords"]
    # custom list: same text passes when its own words count as stopwords
    assert _flags(spark, no_stop, stopwords=["flux", "qux"])["r_stopwords"]
    assert len(GOPHER_STOPWORDS) == 8 and len(EN_STOPWORDS) == 10


def test_gopher_integer_exactness_boundary(spark):
    # exactly mean word length 3.0 must PASS (3*n <= sum <= 10*n inclusive)
    text = " ".join(["abc"] * 20)
    assert _flags(spark, text)["r_mean_word_len"]


def test_boilerplate_units_counts_distinct_docs_not_occurrences(spark):
    # unit u1 appears 5x in doc 1 only -> NOT boilerplate (min_docs=2);
    # unit u2 appears once in each of docs 1..3 -> boilerplate
    rows = [(1, "u1")] * 5 + [(1, "u2"), (2, "u2"), (3, "u2"), (2, "u3")]
    units = spark.createDataFrame(rows, "doc_id long, unit_key string")
    out = {
        r["doc_id"]: r
        for r in boilerplate_units(units, min_docs=2).collect()
    }
    assert out[1]["n_units"] == 6 and out[1]["n_boiler"] == 1
    assert out[2]["n_units"] == 2 and out[2]["n_boiler"] == 1
    assert out[3]["n_units"] == 1 and out[3]["n_boiler"] == 1
    assert out[2]["boiler_frac"] == 0.5


def test_boilerplate_lines_separator_corpus(spark):
    docs = spark.createDataFrame(
        [
            (1, "unique one. COMMON FOOTER. another unique"),
            (2, "different text. common footer.  "),
            (3, "third doc. Common Footer. tail"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in boilerplate_lines(docs, min_docs=3).collect()}
    # normalization (lower/trim) unifies the footer across all three docs
    assert all(out[d]["n_boiler"] == 1 for d in (1, 2, 3))
    assert out[1]["n_units"] == 3 and out[2]["n_units"] == 2


def test_boilerplate_chunks_plan_reuses_one_build(spark):
    """The (unit, doc) pre-agg exchange must be shared by the frequency
    branch and the per-doc branch — without ReusedExchange the CDC chain
    (explode + window family) runs twice, which doubles the dominant
    cost at any scale."""
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    df = QUERIES["q_boilerplate_chunks"](spark, "/root/testdata/sf0.001")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan or "ReusedQueryStage" in plan
    assert "CartesianProduct" not in plan


def test_boilerplate_chunks_has_cross_doc_signal(spark):
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    df = QUERIES["q_boilerplate_chunks"](spark, "/root/testdata/sf0.001")
    tot = df.agg(F.sum("n_boiler").alias("b"), F.sum("n_units").alias("u")).collect()[0]
    assert tot["b"] > 0, "fixture near-dups must share CDC chunks"
    assert tot["b"] < tot["u"]


def test_resize_roundtrip_matches_formula(spark):
    """End-to-end operator chain equals the pixel formula composed with
    the integer nearest-neighbor map — checked here in numpy, the same
    arithmetic the DuckDB oracle replays in SQL."""
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    rows = {
        r["doc_id"]: r
        for r in QUERIES["q_resize_roundtrip"](spark, "/root/testdata/sf0.001")
        .where(F.col("doc_id") < 6)
        .collect()
    }
    for d in range(6):
        h, w = 5 + d % 4, 7 + d % 5
        y, x, c = np.ogrid[0:h, 0:w, 0:3]
        img = (d * 13 + y * 11 + x * 7 + c * 5) % 256
        ys = (np.arange(3) * h) // 3
        xs = (np.arange(5) * w) // 5
        res = img[ys][:, xs]
        assert rows[d]["width"] == 5 and rows[d]["height"] == 3
        assert rows[d]["sum_pixels"] == int(res.sum())


def test_audio_features_real_decode_values(spark):
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    rows = {
        r["doc_id"]: r
        for r in QUERIES["q_audio_features"](spark, "/root/testdata/sf0.001")
        .where(F.col("doc_id") < 4)
        .collect()
    }
    for d in range(4):
        n = 48 + d % 23
        i = np.arange(n, dtype=np.int64)
        pcm = ((d * 6151 + i * 95789) % 65536) - 32768
        mono = pcm / 32768.0
        assert rows[d]["n_frames"] == n
        assert rows[d]["sample_rate"] == 16000
        assert rows[d]["rms"] == pytest.approx(
            float(np.sqrt((mono * mono).mean())), abs=1e-6
        )
        flips = int((np.signbit(mono[1:]) != np.signbit(mono[:-1])).sum())
        assert rows[d]["zero_cross_rate"] == pytest.approx(
            flips / (n - 1), abs=1e-6
        )


def test_boilerplate_strip_removes_template_keeps_tail(spark):
    """Planted template chunks vanish from the reconstructed text; each
    doc's unique tail survives verbatim (order preserved)."""
    from fortune_500_financial_insights_pipeline_spark.operators.chunking import (
        cdc_chunks,
    )

    docs = spark.createDataFrame(
        [(i, PASSING + " " + " ".join(f"tail{i}word{j}" for j in range(30)))
         for i in (1, 2, 3)],
        "doc_id long, text string",
    )
    ch = cdc_chunks(docs, k=3, divisor=16, keep_text=True)
    freq = ch.groupBy("chunk_hash").agg(F.countDistinct("doc_id").alias("nd"))
    kept = ch.join(freq, "chunk_hash").where(F.col("nd") < 2)
    rows = kept.orderBy("doc_id", "chunk_id").collect()
    assert rows, "unique tails must survive"
    for r in rows:
        assert f"tail{r['doc_id']}word" in r["chunk_text"]
    # the shared-template-only chunks are gone
    assert all("the cat sat" not in r["chunk_text"][:40] or
               f"tail{r['doc_id']}" in r["chunk_text"] for r in rows)


def test_unicode_udfs_nfc_and_strip(spark):
    from fortune_500_financial_insights_pipeline_spark.functions.udfs import (
        nfc_normalize,
        strip_accents,
    )

    df = spark.createDataFrame(
        [(1, "éãx́ plain")], "id long, s string"
    )
    r = df.select(
        F.length("s").alias("raw"),
        nfc_normalize("s").alias("nfc"),
        strip_accents("s").alias("flat"),
    ).collect()[0]
    assert r["raw"] == 12  # 3 base + 3 marks + ' plain'
    assert r["nfc"] == "éãx́ plain"  # é ã compose; x́ cannot
    assert r["flat"] == "eax plain"


def test_gopher_repetition_flags_and_fractions(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.text import (
        gopher_repetition,
    )

    # doc 1: 'alpha beta gamma delta epsil' x4 -> massive dup 5-grams and
    # heavy top-2-gram mass; doc 2: 30 unique words -> everything passes
    doc1 = " ".join(["alpha beta gamma delta epsil"] * 4)
    doc2 = " ".join(f"w{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, doc1), (2, doc2)], "doc_id long, text string"
    )
    r = {x["doc_id"]: x for x in gopher_repetition(df).collect()}
    assert r[2]["pass_all"] and r[2]["dup5_frac"] == 0.0
    assert not r[1]["pass_all"]
    assert r[1]["dup5_frac"] > 0.9 and not r[1]["r_dup5"]
    assert not r[1]["r_top2"]
    # dup coverage counts positions once: fraction can never exceed 1
    for n in (5, 6, 7, 8, 9, 10):
        assert 0.0 <= r[1][f"dup{n}_frac"] <= 1.0


def test_gopher_repetition_boundary_exact(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.text import (
        gopher_repetition,
    )

    # 10 distinct 4-char words, every 2-gram unique: top-2-gram mass =
    # 1 occurrence x 8 token chars (joining space excluded) / 40 = 0.2 —
    # exactly AT the 0.20 threshold, which passes (<=); dup rules clean
    doc = " ".join(f"ab{i:02d}" for i in range(10))
    r = gopher_repetition(
        spark.createDataFrame([(1, doc)], "doc_id long, text string")
    ).collect()[0]
    assert r["top2_frac"] == 0.2 and r["r_top2"]
    assert r["dup5_frac"] == 0.0 and r["r_dup5"]


def test_label_propagation_two_cliques(spark):
    """Two triangles joined by one bridge edge: after enough rounds each
    triangle converges to its min node id; determinism pinned by rerun."""
    from fortune_500_financial_insights_pipeline_spark.operators.graph import (
        label_propagation,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10)],
        "src long, dst long",
    )
    out = {r["node"]: r["label"] for r in label_propagation(edges, rounds=4).collect()}
    assert out[1] == out[2] == 1
    assert out[11] == out[12]
    again = {
        r["node"]: r["label"] for r in label_propagation(edges, rounds=4).collect()
    }
    assert out == again


def test_label_propagation_tie_breaks_to_smallest(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.graph import (
        label_propagation,
    )

    # node 5 has neighbors 1 and 2 (one edge each): tie -> label 1
    edges = spark.createDataFrame([(1, 5), (2, 5)], "src long, dst long")
    out = {r["node"]: r["label"] for r in label_propagation(edges, rounds=1).collect()}
    assert out[5] == 1


def test_cluster_dedup_best_keeps_highest_score(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.graph import (
        cluster_dedup_best,
    )

    # cluster {1,2,3} via transitive pairs; 3 has the best score; doc 9
    # untouched by pairs always survives; tie in {20,21} -> smaller id
    df = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.95), (9, 0.1), (20, 0.5), (21, 0.5)],
        "doc_id long, score double",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (20, 21)], "id_a long, id_b long"
    )
    kept = sorted(
        r["doc_id"]
        for r in cluster_dedup_best(df, pairs, "doc_id", "score").collect()
    )
    assert kept == [3, 9, 20]
