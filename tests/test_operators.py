"""Operator-level unit tests with planted inputs and hand-computed answers —
the behavioral contract the fixture-table oracle checks can't pin (near-dup
recall on actual duplicates, as-of edge cases, per-file skip semantics)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "the quick brown fox jumps over the lazy dog near the river shore"),  # near-dup of 0
    (2, "completely different text about financial statements and revenue"),
    (3, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 0
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_minhash_finds_planted_neardups(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.minhash import minhash_neardup_pairs

    pairs = {
        (r.id_a, r.id_b): r.jac
        for r in minhash_neardup_pairs(
            _docs_df(spark), "doc_id", "text", n_hashes=16, bands=8, min_jaccard=0.5
        ).collect()
    }
    assert pairs[(0, 3)] == 1.0  # exact dup
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.5  # near dup
    assert all(2 not in p for p in pairs)  # unrelated doc never paired


def test_simhash_hamming_tracks_similarity(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.minhash import simhash

    sh = {
        r.doc_id: r.sh
        for r in _docs_df(spark).select("doc_id", simhash("text").alias("sh")).collect()
    }
    assert sh[0] == sh[3]  # identical text -> identical fingerprint

    def hamming(a, b):
        return bin((a ^ b) & (2**63 - 1)).count("1")

    assert hamming(sh[0], sh[1]) < hamming(sh[0], sh[2])


def test_fingerprint_normalizes_case_and_whitespace(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.text import fingerprint

    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "hello worlds")],
        "id long, text string",
    ).select("id", fingerprint("text").alias("fp"))
    fp = {r.id: r.fp for r in df.collect()}
    assert fp[1] == fp[2]
    assert fp[1] != fp[3]


def test_text_metrics_known_values(spark):
    from fortune_500_financial_insights_pipeline_spark.operators import text as TX

    df = spark.createDataFrame([("the cat sat on the mat",)], "text string").select(
        TX.token_count("text").alias("n"),
        TX.distinct_token_count("text").alias("nd"),
        TX.bpe_token_count("text").alias("nb"),
        F.round(TX.stopword_ratio("text"), 6).alias("sw"),
    )
    r = df.head()
    assert r.n == 6
    assert r.nd == 5  # 'the' twice
    assert r.nb == 6
    assert r.sw == round(3 / 6, 6)  # the, on, the


def test_word_ngrams_and_jaccard(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.text import jaccard, word_ngrams

    df = spark.createDataFrame([("a b c d",)], "text string").select(
        word_ngrams("text", 2).alias("g2")
    )
    assert sorted(df.head().g2) == ["a b", "b c", "c d"]

    two = spark.createDataFrame([("a b c", "b c d")], "x string, y string").select(
        F.round(jaccard(word_ngrams("x", 2), word_ngrams("y", 2)), 6).alias("j")
    )
    # grams {a b, b c} vs {b c, c d}: intersection 1, union 3
    assert two.head().j == round(1 / 3, 6)


def test_cosine_topk_matches_exact_math(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import cosine_topk

    vecs = [(0, [1.0, 0.0]), (1, [0.8, 0.6]), (2, [0.0, 1.0]), (3, [-1.0, 0.0])]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = cosine_topk(emb, [1.0, 0.0], k=3).collect()
    assert [r.vec_id for r in got] == [0, 1, 2]
    assert got[0].sim == 1.0
    assert got[1].sim == 0.8  # cos = 0.8/1.0
    assert got[2].sim == 0.0


def test_lsh_neardup_finds_planted_pair(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import lsh_neardup_pairs

    base = [math.sin(i) for i in range(16)]
    close = [v + (0.001 if i == 0 else 0.0) for i, v in enumerate(base)]
    ortho = [(1.0 if i == (j + 1) % 16 else 0.0) for j in range(1) for i in range(16)]
    emb = spark.createDataFrame(
        [(0, base), (1, close), (2, ortho)], "vec_id long, embedding array<float>"
    )
    pairs = lsh_neardup_pairs(emb, dim=16, n_planes=8, min_cosine=0.99).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(0, 1)]
    assert pairs[0].cosine > 0.999


def test_asof_join_edge_cases(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("k", 10, 100), ("k", 20, 101), ("k", 5, 102), ("z", 50, 103)],
        "key string, ts long, lid long",
    )
    # tiebreak col must exist on both sides (shared id namespace)
    right = spark.createDataFrame(
        [("k", 10, 1.0, 900), ("k", 15, 2.0, 901), ("z", 60, 9.9, 902)],
        "key string, ts long, val double, lid long",
    )
    got = {
        r.lid: r.val_asof
        for r in asof_join(
            left, right, on=["key"], ts_col="ts", value_cols=["val"], tiebreak_col="lid"
        ).collect()
    }
    assert got[100] == 1.0  # equal ts visible (<= semantics)
    assert got[101] == 2.0  # latest prior wins
    assert got[102] is None  # nothing at or before -> null
    assert got[103] is None  # right row strictly after left ts


def test_skip_rows_per_file_is_per_file(spark, tmp_path):
    from fortune_500_financial_insights_pipeline_spark.operators.skip_rows import skip_rows_per_file

    for fname in ("a.csv", "b.csv"):
        (tmp_path / fname).write_text("\n".join(f"{fname}:{i}" for i in range(6)) + "\n")
    df = spark.read.csv(str(tmp_path / "*.csv"), schema="v string")
    out = skip_rows_per_file(df, n=4)
    vals = sorted(r.v for r in out.collect())
    # rows 0-3 of EACH file dropped, 4-5 kept
    assert vals == ["a.csv:4", "a.csv:5", "b.csv:4", "b.csv:5"]


def test_keep_latest_tiebreak(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.dedup import keep_latest

    df = spark.createDataFrame(
        [("k", 1, "old"), ("k", 2, "mid"), ("k", 2, "new2"), ("j", 9, "only")],
        "key string, ver long, tag string",
    )
    got = {
        r.key: r.tag
        for r in keep_latest(df, keys=["key"], order_cols=["ver", "tag"]).collect()
    }
    assert got["j"] == "only"
    assert got["k"] == "new2"  # (2, 'new2') > (2, 'mid') on the tiebreak


def test_pivot_unpivot_roundtrip(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.pivot import pivot_wide, unpivot

    long_df = spark.createDataFrame(
        [("t1", "a", 1.0), ("t1", "b", 2.0), ("t2", "a", 3.0)],
        "k string, item string, value double",
    )
    wide = pivot_wide(
        long_df, group_cols=["k"], pivot_col="item", values=["a", "b"],
        agg=F.first("value", ignorenulls=True),
    )
    assert set(wide.columns) == {"k", "a", "b"}
    back = unpivot(wide, id_cols=["k"], value_cols=["a", "b"],
                   var_name="item", value_name="value")
    # t2 has no 'b': pivot makes it null, unpivot keeps the null slot
    got = {(r.k, r.item): r.value for r in back.collect()}
    assert got[("t1", "a")] == 1.0 and got[("t1", "b")] == 2.0
    assert got[("t2", "a")] == 3.0 and got[("t2", "b")] is None


def test_ivf_topk_recall_on_clustered_data(spark):
    """IVF with cluster-aligned centroids: probing 1 of 3 cells returns the
    exact brute-force top-k when the query sits inside a cluster; cell
    assignment routes every vector to its own cluster's centroid."""
    import random

    from fortune_500_financial_insights_pipeline_spark.operators.similarity import (
        cosine_topk,
        ivf_index,
        ivf_topk,
        sample_centroids,
    )

    rng = random.Random(7)
    centers = [[10.0, 0.0, 0.0], [0.0, 10.0, 0.0], [0.0, 0.0, 10.0]]
    rows = []
    vid = 0
    for c in centers:
        for _ in range(30):
            rows.append((vid, [x + rng.uniform(-0.5, 0.5) for x in c]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    indexed = ivf_index(emb, centers)
    cells = {r.vec_id: r.cell for r in indexed.collect()}
    for v, cell in cells.items():
        assert cell == v // 30  # every vector lands in its cluster's cell

    query = [9.5, 0.3, -0.2]
    exact = [r.vec_id for r in cosine_topk(emb, query, k=5).collect()]
    approx = [r.vec_id for r in ivf_topk(indexed, centers, query, k=5, n_probe=1).collect()]
    assert approx == exact  # full recall: the true neighbors share the cell

    # deterministic centroid sampling: same seed rows every call
    s1 = sample_centroids(emb, 3)
    s2 = sample_centroids(emb.repartition(8), 3)
    assert s1 == s2


def test_semdedup_drops_planted_duplicates_keeps_lowest_id(spark):
    """SemDeDup on cluster-structured vectors: an exact copy and a tiny
    perturbation of an existing vector are dropped (their lower-id original
    survives), dissimilar vectors all survive, and the drop rule is
    pairwise — b dropped by a does not shield c from b (a<b<c chain all
    similar: only a remains)."""
    import random

    from fortune_500_financial_insights_pipeline_spark.operators.similarity import semdedup

    rng = random.Random(11)
    centers = [[10.0, 0.0, 0.0], [0.0, 10.0, 0.0], [0.0, 0.0, 10.0]]
    rows = []
    vid = 0
    for c in centers:
        for _ in range(10):
            # spread wide enough that distinct members stay below threshold
            rows.append((vid, [x + rng.uniform(-4.0, 4.0) for x in c]))
            vid += 1
    base = dict(rows)
    rows.append((100, list(base[0])))                        # exact copy of 0
    rows.append((101, [x * 1.001 + 0.001 for x in base[0]]))  # near-copy chain
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    kept = {
        r.vec_id
        for r in semdedup(emb, centers, threshold=0.999).collect()
    }
    assert 0 in kept            # lowest id of the duplicate group survives
    assert 100 not in kept      # exact copy dropped (cos == 1 with 0)
    assert 101 not in kept      # near-copy dropped even though 100 also died
    assert len(kept) == 30      # every non-planted vector survives


def test_classifier_score_exact_and_partition_invariant(spark):
    """classifier_score: uniform weights make the logit exactly w/scale
    regardless of token count; zero-token docs emit no row; and the
    fixed-point sum makes the score identical under any repartitioning."""
    import math

    from pyspark.sql import functions as F

    from fortune_500_financial_insights_pipeline_spark.operators.text import classifier_score

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "x"), (3, "")],
        "doc_id long, text string",
    )
    # every bucket weighs 250 milli-units -> logit = 0.25 for any doc
    weights = spark.range(256).select(
        F.col("id").cast("int").alias("bucket"),
        F.lit(250).cast("long").alias("w_fp"),
    )
    got = {r.doc_id: r.prob for r in classifier_score(docs, weights).collect()}
    expect = round(1.0 / (1.0 + math.exp(-0.25)), 6)
    assert got == {1: expect, 2: expect}  # doc 3: no tokens, no row

    shuffled = {
        r.doc_id: r.prob
        for r in classifier_score(docs.repartition(16), weights).collect()
    }
    assert shuffled == got


def test_mix_sources_prefix_budget_semantics(spark):
    """mix_sources: each source keeps exactly the md5-ordered prefix that
    fits its proportional budget; the first overflowing doc cuts the tail
    (no skip-and-refill); weights split the budget in exact integer
    arithmetic; and exactly one budget parameter is accepted."""
    import hashlib

    import pytest as _pytest

    from fortune_500_financial_insights_pipeline_spark.operators.sampling import mix_sources

    rows = [(i, "a" if i < 8 else "b", "t " * 9 + "t") for i in range(16)]  # 10 tokens each
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")

    # weights 3:1 over a 60-token budget -> a gets 45, b gets 15
    kept = mix_sources(
        docs, {"a": 3, "b": 1}, budget_tokens=60
    ).collect()
    by_src: dict[str, list] = {}
    for r in kept:
        by_src.setdefault(r.source, []).append(r)
    assert {r.budget for r in by_src["a"]} == {45}
    assert {r.budget for r in by_src["b"]} == {15}
    # 10-token docs: floor(45/10)=4 fit in a, floor(15/10)=1 fits in b
    assert len(by_src["a"]) == 4 and len(by_src["b"]) == 1

    # the kept set IS the md5-order prefix, not any other 4 docs
    order = sorted(
        range(8), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
    )
    assert sorted(r.doc_id for r in by_src["a"]) == sorted(order[:4])

    with _pytest.raises(ValueError, match="exactly one"):
        mix_sources(docs, {"a": 1}, budget_tokens=10, budget_fraction=0.5)
    with _pytest.raises(ValueError, match="exactly one"):
        mix_sources(docs, {"a": 1})


def test_upsample_sources_epoch_semantics(spark):
    """upsample_sources: factor 2.0 duplicates every doc, factor 0.5 keeps
    the md5-prefix half at one copy, factor 0.0 emits nothing (and does not
    trip the descending-sequence trap); epochs number from 0; negative
    factors are rejected."""
    import hashlib

    import pytest as _pytest

    from fortune_500_financial_insights_pipeline_spark.operators.sampling import (
        upsample_sources,
    )

    rows = [(i, ["a", "b", "z"][i % 3]) for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = upsample_sources(docs, {"a": 2.0, "b": 0.5, "z": 0.0}).collect()
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)

    a_ids = [i for i in range(30) if i % 3 == 0]
    assert sorted(r.doc_id for r in by_src["a"]) == sorted(a_ids * 2)
    assert {r.epoch for r in by_src["a"]} == {0, 1}

    half = {
        i for i in range(30)
        if i % 3 == 1 and hashlib.md5(str(i).encode()).hexdigest() < "8" + "0" * 31
    }
    assert {r.doc_id for r in by_src["b"]} == half
    assert all(r.epoch == 0 for r in by_src["b"])

    assert "z" not in by_src  # factor 0: no rows, no sequence(0,-1) surprise

    with _pytest.raises(ValueError, match=">= 0"):
        upsample_sources(docs, {"a": -1.0})


def test_hash_sample_is_partition_invariant(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table
    from fortune_500_financial_insights_pipeline_spark.operators.sampling import hash_sample

    o = load_table(spark, sf_dir, "orders")
    s1 = {r.o_orderkey for r in hash_sample(o, 0.1, ["o_orderkey"]).collect()}
    s2 = {
        r.o_orderkey
        for r in hash_sample(o.repartition(17), 0.1, ["o_orderkey"]).collect()
    }
    assert s1 == s2  # same rows regardless of partitioning
    n = o.count()
    assert 0.05 * n < len(s1) < 0.15 * n  # roughly the asked fraction
    # monotone: a bigger fraction strictly contains the smaller sample
    s3 = {r.o_orderkey for r in hash_sample(o, 0.2, ["o_orderkey"]).collect()}
    assert s1 <= s3


def test_stratified_sample_fractions(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table
    from fortune_500_financial_insights_pipeline_spark.operators.sampling import (
        stratified_sample,
    )

    o = load_table(spark, sf_dir, "orders")
    got = stratified_sample(o, "o_orderstatus", {"F": 0.5, "O": 0.1, "P": 1.0})
    by = {r.o_orderstatus: r.n for r in got.groupBy("o_orderstatus").count()
          .withColumnRenamed("count", "n").collect()}
    tot = {r.o_orderstatus: r.n for r in o.groupBy("o_orderstatus").count()
           .withColumnRenamed("count", "n").collect()}
    assert 0.3 < by["F"] / tot["F"] < 0.7
    assert by["O"] / tot["O"] < 0.25
    assert by.get("P", 0) == tot.get("P", 0)  # fraction 1.0 keeps everything


def test_compact_for_write_partition_count(spark, sf_dir, tmp_path):
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table
    from fortune_500_financial_insights_pipeline_spark.operators.compact import (
        compact_for_write,
        estimate_bytes,
    )

    li = load_table(spark, sf_dir, "lineitem")
    est = estimate_bytes(li)
    assert est > 0
    # tiny target -> many partitions; huge target -> exactly one
    many = compact_for_write(li, target_bytes=est // 10)
    one = compact_for_write(li, target_bytes=est * 10)
    assert many.rdd.getNumPartitions() >= 5
    assert one.rdd.getNumPartitions() == 1
    # one output file when compacted to a single partition
    out = str(tmp_path / "one")
    one.write.mode("overwrite").parquet(out)
    import glob as g
    assert len([p for p in g.glob(out + "/part-*") if p.endswith(".parquet")]) == 1


def test_quantized_embeddings_preserve_neighbors(spark, sf_dir):
    """int8 quantization: 4x smaller codes, reconstruction error bounded by
    scale/127, and quantized cosine top-k ~= exact top-k."""
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import (
        cosine_topk,
        dequantize,
        quantize_embeddings,
        quantized_cosine_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = quantize_embeddings(emb)

    # reconstruction error bound: |v - dq(q(v))| <= scale/127 per component
    err = q.select(
        F.array_max(
            F.zip_with(
                F.col("embedding"),
                dequantize("qvec", "qvec_scale"),
                lambda a, b: F.abs(a.cast("double") - b),
            )
        ).alias("max_err"),
        (F.col("qvec_scale") / 127.0).alias("bound"),
    )
    assert err.filter(F.col("max_err") > F.col("bound") * 1.0001).count() == 0

    qvec = list(emb.filter(F.col("vec_id") == 3).head().embedding)
    exact = [r.vec_id for r in cosine_topk(emb, qvec, k=10).collect()]
    approx = [r.vec_id for r in quantized_cosine_topk(q.drop("embedding"), qvec, k=10).collect()]
    # top-1 identical (the query itself), >=70% overlap in the top-10
    assert approx[0] == exact[0] == 3
    assert len(set(exact) & set(approx)) >= 7


def test_connected_components_chain_and_islands(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.graph import connected_components

    # chain 1-2-3, pair 10-11, isolated-by-absence 99 (no edges)
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    comp = {r.id: r.comp for r in connected_components(edges).collect()}
    assert comp[1] == comp[2] == comp[3] == 1  # transitive closure, min id
    assert comp[10] == comp[11] == 10
    assert 99 not in comp  # only edge-touching vertices labeled


def test_cluster_dedup_transitive(spark):
    """A~B and B~C (never A~C) must still leave ONE survivor for {A,B,C} —
    the closure pairwise keep-latest can't express."""
    from fortune_500_financial_insights_pipeline_spark.operators.graph import cluster_dedup

    docs = spark.createDataFrame(
        [(1, "a"), (2, "a'"), (3, "a''"), (7, "unique"), (9, "other")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    kept = sorted(r.doc_id for r in cluster_dedup(docs, pairs, "doc_id").collect())
    assert kept == [1, 7, 9]  # one canonical for {1,2,3}; untouched rows survive


def test_cluster_dedup_end_to_end_with_minhash(spark):
    """Full near-dup pipeline: minhash pairs -> components -> one survivor."""
    from fortune_500_financial_insights_pipeline_spark.operators.graph import cluster_dedup
    from fortune_500_financial_insights_pipeline_spark.operators.minhash import minhash_neardup_pairs

    docs = _docs_df(spark)  # 0~1 near, 0==3 exact, 2 unrelated
    pairs = minhash_neardup_pairs(docs, "doc_id", "text", n_hashes=16, bands=8,
                                  min_jaccard=0.5)
    kept = sorted(r.doc_id for r in cluster_dedup(docs, pairs, "doc_id").collect())
    assert kept == [0, 2]  # {0,1,3} collapse to 0; 2 survives alone


def test_ivf_vectorized_matches_hof(spark, sf_dir):
    """The numpy-matmul cell assignment and the JVM higher-order-function
    path must agree on every vector."""
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import (
        ivf_index,
        sample_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = sample_centroids(emb, k=6)
    hof = {r.vec_id: r.cell for r in ivf_index(emb, cents).collect()}
    vec = {r.vec_id: r.cell for r in ivf_index(emb, cents, vectorized=True).collect()}
    assert hof == vec


def test_chunking_windows_and_reconstruction(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.chunking import chunk_documents

    text = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, chunk_tokens=4, overlap=1).collect(),
        key=lambda r: r.chunk_index,
    )
    # step = 3 → starts 0,3,6,9; final window is the 1-token tail
    assert [r.chunk_start for r in rows] == [0, 3, 6, 9]
    assert [r.n_tokens for r in rows] == [4, 4, 4, 1]
    assert rows[0].chunk_text == "t0 t1 t2 t3"
    assert rows[-1].chunk_text == "t9"
    # overlap property: consecutive chunks share exactly `overlap` tokens
    for a, b in zip(rows, rows[1:]):
        assert a.chunk_text.split()[-1:] == b.chunk_text.split()[:1]


def test_chunking_rejects_bad_overlap(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.chunking import chunk_documents

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    try:
        chunk_documents(df, chunk_tokens=4, overlap=4)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_tfidf_hand_computed(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.tfidf import tfidf

    df = spark.createDataFrame(
        [(0, "apple apple banana"), (1, "banana cherry"), (2, "cherry cherry cherry")],
        "doc_id long, text string",
    )
    out = {(r.doc_id, r.term): (r.tf, r.tfidf) for r in tfidf(df).collect()}
    # idf(term in 1 of 3 docs) = ln(4/2); tf(apple in doc0) = 2
    assert out[(0, "apple")] == (2, round(2 * math.log(4 / 2), 6))
    # term in 2 of 3 docs: ln(4/3)
    assert out[(0, "banana")] == (1, round(math.log(4 / 3), 6))
    assert out[(2, "cherry")] == (3, round(3 * math.log(4 / 3), 6))


def test_tfidf_topk_is_deterministic_on_ties(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.tfidf import tfidf

    # doc 0: four singleton terms, all the same tfidf → top-2 must be the
    # lexicographically first two (stable tie-break, oracle-reproducible)
    df = spark.createDataFrame(
        [(0, "delta alpha charlie bravo"), (1, "zz yy")],
        "doc_id long, text string",
    )
    top = sorted(
        r.term for r in tfidf(df, top_k=2).where(F.col("doc_id") == 0).collect()
    )
    assert top == ["alpha", "bravo"]


def test_tfidf_from_materialized_tf_matches_oneshot(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.tfidf import (
        term_frequencies,
        tfidf,
        tfidf_from_tf,
    )

    df = spark.createDataFrame(
        [(0, "apple apple banana"), (1, "banana cherry"), (2, "cherry date fig")],
        "doc_id long, text string",
    )
    oneshot = {(r.doc_id, r.term): (r.tf, r.tfidf) for r in tfidf(df).collect()}
    tf = term_frequencies(df).localCheckpoint()  # the materialization stand-in
    staged = {(r.doc_id, r.term): (r.tf, r.tfidf) for r in tfidf_from_tf(tf).collect()}
    assert oneshot == staged


def test_scd2_episodes_and_point_in_time(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.scd import as_of_snapshot, scd2

    snaps = spark.createDataFrame(
        [
            (1, "2024-01-01", "Tech", "CA"),
            (1, "2024-02-01", "Tech", "CA"),   # no change → absorbed
            (1, "2024-03-01", "Tech", "NY"),   # state changed → new episode
            (2, "2024-01-15", "Energy", "TX"),
        ],
        "ticker long, ts string, sector string, state string",
    ).withColumn("ts", F.to_date("ts"))
    hist = scd2(snaps, ["ticker"], "ts", ["sector", "state"]).collect()
    eps = {(r.ticker, str(r.valid_from)): (r.state, str(r.valid_to)) for r in hist}
    assert len(hist) == 3  # the unchanged snapshot created no episode
    assert eps[(1, "2024-01-01")] == ("CA", "2024-03-01")  # closed by the change
    assert eps[(1, "2024-03-01")][1] == "None"             # current episode open
    assert eps[(2, "2024-01-15")][1] == "None"

    hist_df = scd2(snaps, ["ticker"], "ts", ["sector", "state"])
    at_feb = as_of_snapshot(hist_df, "2024-02-15").collect()
    assert {(r.ticker, r.state) for r in at_feb} == {(1, "CA"), (2, "TX")}


def test_scd2_single_shuffle(spark, sf_dir):
    """Both windows share the partition key — one exchange, not two."""
    import re
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table
    from fortune_500_financial_insights_pipeline_spark.operators.scd import scd2

    e = load_table(spark, sf_dir, "events")
    plan = (
        scd2(e, ["user_id"], "ts", ["event_type"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_rolling_fingerprint_is_order_sensitive(spark):
    from fortune_500_financial_insights_pipeline_spark.operators import text as TX

    df = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "beta alpha gamma"), (2, "alpha beta gamma")],
        "doc_id long, text string",
    )
    fps = {r.doc_id: r.fp for r in df.select(
        "doc_id", TX.rolling_fingerprint("text").alias("fp")).collect()}
    assert fps[0] == fps[2]          # identical text → identical hash
    assert fps[0] != fps[1]          # transposed tokens → different hash
    assert all(0 <= v < 288230376151711717 for v in fps.values())


def test_rolling_fingerprint_partition_invariant(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.operators import text as TX

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    one = {r.doc_id: r.fp for r in d.select(
        "doc_id", TX.rolling_fingerprint("text").alias("fp")).collect()}
    many = {r.doc_id: r.fp for r in d.repartition(7).select(
        "doc_id", TX.rolling_fingerprint("text").alias("fp")).collect()}
    assert one == many


def test_pack_greedy_respects_budget(spark, sf_dir):
    """No greedy bin exceeds the budget unless it holds a single oversized
    document; every input row is assigned exactly once."""
    from pyspark.sql import functions as F
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table
    from fortune_500_financial_insights_pipeline_spark.operators import text as TX
    from fortune_500_financial_insights_pipeline_spark.operators.packing import pack_greedy

    d = load_table(spark, sf_dir, "documents")
    counted = d.select("doc_id", TX.token_count("text").alias("n_tokens"))
    packed = pack_greedy(counted, budget=64, n_buckets=4).cache()
    try:
        assert packed.count() == counted.count()
        assert packed.select("doc_id").distinct().count() == counted.count()
        bins = packed.groupBy("bucket", "seq_index").agg(
            F.sum("n_tokens").alias("total"), F.count("*").alias("n_docs")
        )
        assert bins.filter((F.col("total") > 64) & (F.col("n_docs") > 1)).count() == 0
        # bin indices are contiguous from 0 within each bucket
        idx = bins.groupBy("bucket").agg(
            F.min("seq_index").alias("lo"),
            F.max("seq_index").alias("hi"),
            F.count("*").alias("n"),
        )
        assert idx.filter((F.col("lo") != 0) | (F.col("n") != F.col("hi") + 1)).count() == 0
    finally:
        packed.unpersist()


def test_pack_offsets_stream_is_gapless(spark, sf_dir):
    """Offset packing concatenates each bucket's documents without gaps:
    per bucket, offsets sorted by doc_id telescope (next start = prev
    start + prev tokens) and bin index is start//budget."""
    from pyspark.sql import functions as F
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table
    from fortune_500_financial_insights_pipeline_spark.operators import text as TX
    from fortune_500_financial_insights_pipeline_spark.operators.packing import pack_offsets

    d = load_table(spark, sf_dir, "documents")
    counted = d.select("doc_id", TX.token_count("text").alias("n_tokens"))
    packed = pack_offsets(counted, budget=64, n_buckets=4)
    rows = packed.orderBy("bucket", "doc_id").collect()
    prev = {}
    for r in rows:
        assert r.start_offset == prev.get(r.bucket, 0)
        assert r.seq_index == r.start_offset // 64
        prev[r.bucket] = r.start_offset + r.n_tokens


def test_hll_estimates_within_error(spark, sf_dir):
    """HLL(lgK=12) estimates land within 5% of exact distinct counts, and
    the merged ALL row equals the union of the per-lang sketches (doc_id
    is unique, so exact distinct = group size)."""
    from pyspark.sql import functions as F
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    est = {r.lang: r.est_distinct for r in QUERIES["q_hll_distinct"](spark, sf_dir).collect()}
    d = load_table(spark, sf_dir, "documents")
    exact = {r.lang: r.n for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    exact["ALL"] = d.count()
    assert set(est) == set(exact)
    for lang, e in est.items():
        assert abs(e - exact[lang]) <= max(1, 0.05 * exact[lang]), (lang, e, exact[lang])


def test_duplicated_spans_finds_planted_boilerplate(spark):
    """Span-level dedup: an 8-word boilerplate block shared by two
    otherwise-different documents is flagged at the right start offsets in
    BOTH docs; a doc shorter than the window and a unique doc produce
    nothing; within-doc repeats alone don't count (≥2 DISTINCT docs)."""
    from fortune_500_financial_insights_pipeline_spark.operators.text import duplicated_spans

    boiler = "please subscribe to our newsletter for more updates every day"  # 10 words
    rows = [
        (1, "alpha beta " + boiler),                    # boiler at pos 2
        (2, boiler + " gamma delta"),                   # boiler at pos 0
        (3, "totally unrelated words that never repeat anywhere at all ok"),
        (4, "short doc"),                               # < 8 words
        (5, "x y " + "z " * 20),                        # within-doc repeats only
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.doc_id, r.pos) for r in duplicated_spans(df, n=8).collect()}
    # 10-word boiler → 3 shared 8-word windows per doc
    assert got == {(1, 2), (1, 3), (1, 4), (2, 0), (2, 1), (2, 2)}


def test_approx_distinct_within_relative_error(spark, sf_dir):
    """A3's check is bounded-error, not hash-match (no exact oracle can
    exist for a sketch estimate): approx_count_distinct's default rsd is
    5% — ONE standard deviation, so individual groups routinely land
    beyond it; pin every estimate within 3σ (15%), the band the estimator
    contract makes overwhelmingly likely."""
    from pyspark.sql import functions as F
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    est = {
        r.l_returnflag: (r.approx_parts, r.approx_orders)
        for r in QUERIES["q_approx_distinct"](spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: (r.p, r.o)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("p"),
            F.countDistinct("l_orderkey").alias("o"),
        )
        .collect()
    }
    assert set(est) == set(exact)
    for flag, (ap, ao) in est.items():
        ep, eo = exact[flag]
        assert abs(ap - ep) <= max(1, 0.15 * ep), (flag, ap, ep)
        assert abs(ao - eo) <= max(1, 0.15 * eo), (flag, ao, eo)


def test_approx_percentile_within_rank_error(spark, sf_dir):
    """percentile_approx(accuracy=1000) guarantees rank error ≤ n/1000:
    the returned value must lie between the exact (q ± n/1000)-rank
    values per group — the bounded-error contract, engine-agnostic."""
    from pyspark.sql import functions as F
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    got = {
        r.l_returnflag: (r.p50_approx, r.p99_approx)
        for r in QUERIES["q_approx_percentile"](spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    for flag, (p50, p99) in got.items():
        vals = sorted(
            r.l_extendedprice
            for r in li.where(F.col("l_returnflag") == flag).collect()
        )
        n = len(vals)
        # rank error ≤ ceil(n/accuracy); +1 absorbs the rank-convention
        # off-by-one (floor(q·n) vs q·(n-1) index the same guarantee band)
        err = n // 1000 + 2
        for q, v in ((0.5, p50), (0.99, p99)):
            rank = int(q * (n - 1))
            lo = vals[max(0, rank - err)]
            hi = vals[min(n - 1, rank + err)]
            assert lo <= v <= hi, (flag, q, v, lo, hi, n)


def test_pagerank_matches_sequential_replay_and_partitioning(spark):
    """The distributed integer recurrence equals a sequential Python
    replay on a handmade graph, and is invariant to input partitioning
    (the determinism claim fixed-point arithmetic exists to buy)."""
    from fortune_500_financial_insights_pipeline_spark.operators.pagerank import (
        RANK_SCALE,
        pagerank,
    )

    edge_list = [(1, 2), (2, 1), (2, 3), (3, 1), (4, 1), (1, 4), (3, 4)]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {r.node: r.rank_fp for r in pagerank(edges, max_iter=10).collect()}
    got_repart = {
        r.node: r.rank_fp
        for r in pagerank(edges.repartition(7, "dst"), max_iter=10).collect()
    }
    assert got == got_repart

    out = {}
    for s, d in edge_list:
        out.setdefault(s, set()).add(d)
    nodes = {n for e in edge_list for n in e}
    deg = {s: len(ds) for s, ds in out.items()}
    ranks = {n: RANK_SCALE for n in nodes}
    teleport = 150 * RANK_SCALE // 1000
    for _ in range(10):
        in_sum = {n: 0 for n in nodes}
        for s, ds in out.items():
            c = ranks[s] // deg[s]
            for d in ds:
                in_sum[d] += c
        ranks = {
            n: teleport + (in_sum[n] // 1000) * 850 + ((in_sum[n] % 1000) * 850) // 1000
            for n in nodes
        }
    assert got == ranks
    # sanity: node 1 (most in-links) outranks the others
    assert got[1] == max(got.values())


def test_md5_sample_invariant_and_near_fraction(spark, sf_dir):
    """md5_sample keeps the same rows under any partitioning and lands
    near the requested fraction; stratified thresholds rebalance per
    class and drop unlisted strata."""
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table
    from fortune_500_financial_insights_pipeline_spark.operators.sampling import (
        md5_sample,
        md5_stratified,
    )

    d = load_table(spark, sf_dir, "documents")
    ids = {r.doc_id for r in md5_sample(d, 0.2, ["doc_id"]).select("doc_id").collect()}
    ids_rep = {
        r.doc_id
        for r in md5_sample(d.repartition(13), 0.2, ["doc_id"]).select("doc_id").collect()
    }
    assert ids == ids_rep
    n = d.count()
    assert 0.1 * n <= len(ids) <= 0.3 * n
    # smaller fraction is a strict subset (supersets compose)
    sub = {r.doc_id for r in md5_sample(d, 0.05, ["doc_id"]).select("doc_id").collect()}
    assert sub <= ids

    strat = md5_stratified(d, "lang", {"en": 1.0, "de": 0.0}, key_cols=["doc_id"])
    langs = {r.lang for r in strat.select("lang").distinct().collect()}
    assert langs == {"en"}


def test_triangle_counts_hand_graph(spark):
    """K4 minus one edge: {1,2,3,4} complete except (1,4) -> triangles
    (1,2,3) and (2,3,4); nodes 1,4 in one each, 2,3 in two. Edge direction
    and duplicates in the input must not matter."""
    from fortune_500_financial_insights_pipeline_spark.operators.graph import triangle_counts

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (2, 3), (2, 4), (4, 3), (5, 6)],
        "id_a long, id_b long",
    )
    got = {r.id: r.n_triangles for r in triangle_counts(edges).collect()}
    assert got == {1: 1, 2: 2, 3: 2, 4: 1}


def test_fill_gaps_linear_interpolates_and_clamps(spark):
    """Observed days 2,4 (values 10, 30): day 3 lerps to 20; days 1 and 5
    clamp to the nearest observation (no extrapolation)."""
    import datetime as dt

    from fortune_500_financial_insights_pipeline_spark.operators.timeseries import fill_gaps_linear

    daily = spark.createDataFrame(
        [("a", dt.date(2024, 1, 2), 10.0), ("a", dt.date(2024, 1, 4), 30.0)],
        "k string, d date, v double",
    )
    out = {
        r.d.day: r.value_filled
        for r in fill_gaps_linear(
            daily, "k", "d", "v", dt.date(2024, 1, 1), dt.date(2024, 1, 5)
        ).collect()
    }
    assert out == {1: 10.0, 2: 10.0, 3: 20.0, 4: 30.0, 5: 30.0}


def test_blocked_fuzzy_pairs_respects_blocks(spark):
    """'cat'~'cot' pair inside the same first-letter block; 'cat'~'bat'
    (distance 1 but different block) must NOT appear — blocking is an
    explicit recall trade, not a bug."""
    from fortune_500_financial_insights_pipeline_spark.operators.fuzzy import blocked_fuzzy_pairs

    df = spark.createDataFrame(
        [(1, "cat"), (2, "cot"), (3, "bat"), (4, "cobalt")],
        "id long, name string",
    )
    pairs = {
        (r.id_a, r.id_b): r.dist
        for r in blocked_fuzzy_pairs(
            df, "id", "name", F.substring("name", 1, 1), max_dist=1
        ).collect()
    }
    assert pairs == {(1, 2): 1}


def test_quality_audit_counts_planted_violations(spark):
    from fortune_500_financial_insights_pipeline_spark import checks as QA

    facts = spark.createDataFrame(
        [(1, 10, 5.0), (1, 11, -2.0), (2, None, 3.0), (3, 99, 0.0)],
        "k long, fk int, amt double",
    )
    dim = spark.createDataFrame([(10,), (11,)], "dk int")
    out = QA.audit(
        [
            QA.row_rule_violations(
                facts,
                {
                    "not_null:fk": F.col("fk").isNull(),
                    "range:amt_positive": F.col("amt") <= 0,
                },
            ),
            QA.unique_violations(facts, ["k"], "unique:k"),
            QA.ref_violations(facts, "fk", dim, "dk", "ref:fk"),
        ]
    )
    got = {r.rule: r.n_violations for r in out.collect()}
    # ref orphans: fk=None and fk=99 both fail the left-anti match
    assert got == {
        "not_null:fk": 1,
        "range:amt_positive": 2,
        "unique:k": 1,
        "ref:fk": 2,
    }


def test_redact_pii_planted(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.text import pii_count, redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.io, ssn 123-45-6789, tel 415-555-1234, host 192.168.0.1"),
            (2, "no pii here at all"),
        ],
        "id long, t string",
    )
    rows = {
        r.id: (r.red, r.n)
        for r in df.select(
            "id", redact_pii("t").alias("red"), pii_count("t").alias("n")
        ).collect()
    }
    assert rows[1] == (
        "mail <EMAIL>, ssn <SSN>, tel <PHONE>, host <IPV4>",
        4,
    )
    assert rows[2] == ("no pii here at all", 0)


def test_repetition_stats_flags_looped_text(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.text import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "spam ham " * 50 + "end"),  # 'spam ham'/'ham spam' dominate
            (2, "a b c d e f g h i j"),  # all bigrams unique
        ],
        "id long, t string",
    )
    got = {r.id: (r.top_gram_frac, r.n_grams) for r in repetition_stats(df, "id", "t").collect()}
    assert got[2] == (1 / 9, 9)
    assert got[1][0] > 0.45  # one gram owns nearly half the stream


def test_setjoin_matches_brute_force(spark):
    """Prefix-filtered exact join == brute-force cross join on random-ish
    token sets, including a pair at EXACTLY the threshold where float
    ceil(t*|g|) overshoots the rational value (the epsilon guard)."""
    from fortune_500_financial_insights_pipeline_spark.operators.setjoin import jaccard_pairs_exact
    from fortune_500_financial_insights_pipeline_spark.operators.text import jaccard

    rows = [
        # |a|=9, |b|=9, overlap 8 -> union 10 -> jaccard exactly 0.8
        (1, [f"t{i}" for i in range(9)]),
        (2, [f"t{i}" for i in range(8)] + ["t9"]),
        (3, [f"u{i}" for i in range(10)]),          # disjoint singleton
        (4, [f"t{i}" for i in range(5)]),           # subset, fails length filter
        (5, [f"t{i}" for i in range(9)]),           # exact dup of 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, grams array<string>")
    a = df.select(F.col("doc_id").alias("id_a"), F.col("grams").alias("ga"))
    b = df.select(F.col("doc_id").alias("id_b"), F.col("grams").alias("gb"))
    brute = {
        (r.id_a, r.id_b)
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .where(jaccard(F.col("ga"), F.col("gb")) >= 0.8)
        .collect()
    }
    fast = {
        (r.id_a, r.id_b)
        for r in jaccard_pairs_exact(df, "doc_id", "grams", 0.8).collect()
    }
    assert (1, 2) in fast  # the exact-boundary pair survives the filters
    assert fast == brute


def test_asof_tolerance_bounds_staleness(spark):
    import datetime as dt

    from fortune_500_financial_insights_pipeline_spark.operators.asof import asof_join

    T = dt.datetime(2024, 1, 1, 12, 0, 0)

    def at(minutes):
        return T + dt.timedelta(minutes=minutes)

    left = spark.createDataFrame(
        [(1, "u", at(0), 1.0), (2, "u", at(90), 2.0)],
        "event_id long, user_id string, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [(10, "u", at(-5), 42.0)],
        "event_id long, user_id string, ts timestamp, click_value double",
    )
    got = {
        r.event_id: r.click_value_asof
        for r in asof_join(
            left, right, on=["user_id"], ts_col="ts",
            value_cols=["click_value"], tiebreak_col="event_id",
            tolerance="1 HOUR",
        ).collect()
    }
    assert got[1] == 42.0   # 5 minutes old: within tolerance
    assert got[2] is None   # 95 minutes old: reverted to null


def test_kmeans_tightens_cells_monotonically(spark, sf_dir):
    """Lloyd's invariant: within-cluster sum of squared distances (WCSS)
    never increases across iterations — and the trained centroids beat the
    raw init seed. Computed in the same fixed-point space the operator
    uses, so the check is exact."""
    from pyspark.sql import functions as F

    from fortune_500_financial_insights_pipeline_spark.catalog import load_table
    from fortune_500_financial_insights_pipeline_spark.operators import kmeans as KM

    emb = load_table(spark, sf_dir, "embeddings")
    df = emb.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        KM._fixed_vec("embedding").alias("v"),
    ).persist()

    def wcss(centroids: dict[int, list[int]]) -> int:
        cells = sorted(centroids)
        dists = F.array(*[KM._sqdist(F.col("v"), centroids[c]) for c in cells])
        return df.select(F.sum(F.array_min(dists)).alias("w")).collect()[0]["w"]

    seed = (
        df.withColumn("h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("h").limit(4).collect()
    )
    centroids = {i: list(r["v"]) for i, r in enumerate(seed)}
    scores = [wcss(centroids)]
    for _ in range(3):
        fitted = KM.kmeans_fit(emb, k=4, n_iter=len(scores))
        rows = fitted.collect()
        cents: dict[int, list[int]] = {}
        for r in rows:
            cents.setdefault(int(r["cell"]), [0] * 64)[int(r["pos"])] = int(r["c"])
        scores.append(wcss(cents))
    assert all(a >= b for a, b in zip(scores, scores[1:])), scores
    assert scores[-1] < scores[0]


def test_kmeans_centroids_feed_ivf(spark, sf_dir):
    """kmeans_centroids output plugs straight into the IVF index/probe path
    and yields a valid top-k (same contract as sample_centroids)."""
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table
    from fortune_500_financial_insights_pipeline_spark.operators.kmeans import kmeans_centroids
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import (
        ivf_index,
        ivf_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_centroids(emb, k=4, n_iter=2)
    assert len(cents) == 4 and all(len(c) == 64 for c in cents)
    qvec = [float(x) for x in emb.limit(1).collect()[0]["embedding"]]
    got = ivf_topk(ivf_index(emb, cents), cents, qvec, k=5, n_probe=2).collect()
    assert len(got) == 5


def test_cms_merge_is_exact_and_estimates_upper_bound(spark, sf_dir):
    """Sketch mergeability: CMS(built on half A) ⊕ CMS(half B) equals
    CMS(all) cell-for-cell (counts are exact longs — no approximation in
    the merge). And every point estimate dominates the true count."""
    from pyspark.sql import functions as F

    from fortune_500_financial_insights_pipeline_spark.catalog import load_table
    from fortune_500_financial_insights_pipeline_spark.operators.cms import (
        cms_build,
        cms_estimate,
        cms_merge,
    )

    ev = load_table(spark, sf_dir, "events")
    whole = cms_build(ev, "user_id")
    merged = cms_merge(
        cms_build(ev.where(F.col("event_id") % 2 == 0), "user_id"),
        cms_build(ev.where(F.col("event_id") % 2 == 1), "user_id"),
    )
    assert {tuple(r) for r in whole.collect()} == {tuple(r) for r in merged.collect()}

    truth = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_cnt"))
    est = cms_estimate(whole, truth, "user_id")
    bad = est.where(F.col("est_cnt") < F.col("true_cnt")).count()
    assert bad == 0


def test_cms_estimate_absent_item_is_zero_not_dropped(spark):
    """General point queries: an item never sketched must surface with
    est_cnt 0 (or the collision noise floor), not vanish — the sketch join
    is LEFT with coalesce(0), so absent cells count as zero (round-1
    advisory: the inner join dropped rows landing in absent cells)."""
    from pyspark.sql import functions as F

    from fortune_500_financial_insights_pipeline_spark.operators.cms import cms_build, cms_estimate

    data = spark.createDataFrame([("a",)] * 5 + [("b",)] * 3, "v string")
    sketch = cms_build(data, "v")
    items = spark.createDataFrame([("a",), ("zzz_never_seen",)], "v string")
    est = {r["v"]: r["est_cnt"] for r in cms_estimate(sketch, items, "v").collect()}
    assert set(est) == {"a", "zzz_never_seen"}  # absent item still present
    assert est["a"] >= 5
    # d independent hash rows all landing on occupied cells is vanishingly
    # unlikely in a near-empty sketch; the guarantee we pin is presence + 0.
    assert est["zzz_never_seen"] == 0


def test_skip_rows_guards_driver_materialization(spark):
    """skip_rows collects n rows to the driver for the threshold — n beyond
    the documented cap must raise, not OOM the driver."""
    import pytest as _pytest

    from fortune_500_financial_insights_pipeline_spark.operators.skip_rows import (
        MAX_SKIP_ROWS,
        skip_rows,
    )

    df = spark.range(10).withColumnRenamed("id", "k")
    with _pytest.raises(ValueError, match="cap"):
        skip_rows(df, "k", MAX_SKIP_ROWS + 1)
    assert skip_rows(df, "k", 3).count() == 7


def test_kmeans_guards_and_exact_trunc_division():
    """n_iter=0 raises (result is the last iteration's aggregate); the
    centroid fixed-point math stays exact past 2^53 where float division
    would drift."""
    import pytest as _pytest

    from fortune_500_financial_insights_pipeline_spark.operators.kmeans import (
        _trunc_div,
        _trunc_mod,
        kmeans_fit,
    )

    with _pytest.raises(ValueError, match="n_iter"):
        kmeans_fit(None, k=2, n_iter=0)

    big = 2**60 + 12345
    for a, b in [(big, 7), (-big, 7), (big, -7), (-big, -7), (7, 3), (-7, 3)]:
        q, r = _trunc_div(a, b), _trunc_mod(a, b)
        assert q * b + r == a
        assert abs(r) < abs(b)
        assert r == 0 or (r > 0) == (a > 0)  # C-style: sign follows dividend


def test_binaryfile_source_feeds_feature_extraction(spark, tmp_path):
    """Media ingestion end-to-end: a directory of binary files read through
    Spark's binaryFile source (the object-store scale path — bytes never
    visit the driver), conformed to the media schema, pushed through the
    mapInPandas feature extractor. Dedup-by-content works off the sha."""
    from fortune_500_financial_insights_pipeline_spark.operators.multimodal import (
        extract_features,
        read_media_dir,
    )

    media = tmp_path / "media"
    media.mkdir()
    payloads = {f"img_{i}.png": bytes([i]) * (100 + i) for i in range(5)}
    payloads["dup_of_0.png"] = payloads["img_0.png"]
    for fname, blob in payloads.items():
        (media / fname).write_bytes(blob)

    df = read_media_dir(spark, str(media), "*.png")
    assert df.count() == 6
    assert dict(df.dtypes)["media"] == "binary"
    # content-hash dedup: the duplicated payload collapses
    assert df.select("sha").distinct().count() == 5

    feats = extract_features(df, fake=True)
    rows = feats.collect()
    assert len(rows) == 6 and all(len(r["feature"]) > 0 for r in rows)


def test_mapinpandas_respects_arrow_batch_size(spark, sf_dir):
    """The Arrow batch contract the multimodal UDFs rely on:
    maxRecordsPerBatch bounds every pandas batch handed to mapInPandas —
    the knob that keeps decoded media from blowing executor memory."""
    from pyspark.sql import functions as F

    from fortune_500_financial_insights_pipeline_spark.catalog import load_table

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "100")
    try:
        df = load_table(spark, sf_dir, "documents").select("doc_id")

        def sizes(batches):
            import pandas as pd

            for b in batches:
                yield pd.DataFrame({"batch_rows": [len(b)]})

        got = df.repartition(2).mapInPandas(sizes, "batch_rows long").collect()
        assert max(r["batch_rows"] for r in got) <= 100
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


def test_char_entropy_separates_junk_from_text(spark):
    """Entropy values behave like Shannon says: a one-char doc scores 0
    bits, a two-char alternation scores exactly 1, and real text scores
    well above the funnel's low-entropy cutoff."""
    from fortune_500_financial_insights_pipeline_spark.operators.text import char_entropy

    docs = spark.createDataFrame(
        [
            (1, "aaaaaaaaaaaaaaaa"),
            (2, "abababababababab"),
            (3, "The quick brown fox jumps over the lazy dog."),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["entropy_bits"] for r in char_entropy(docs).collect()}
    assert got[1] == 0.0
    assert got[2] == 1.0
    assert got[3] > 3.0


def test_resize_images_emits_exact_bitmap_size(spark, sf_dir):
    """Resize plumbing: binary in → binary out inside the Arrow batch, one
    row per image, output payload exactly target_w*target_h bytes, and
    deterministic for the same (payload, dims)."""
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table
    from fortune_500_financial_insights_pipeline_spark.operators.multimodal import (
        attach_media,
        resize_images,
    )

    media = attach_media(load_table(spark, sf_dir, "documents").limit(8))
    out = resize_images(media, target_w=16, target_h=16)
    rows = out.collect()
    assert len(rows) == 8
    assert all(len(r["resized"]) == 256 and r["n_bytes_out"] == 256 for r in rows)
    again = {r["doc_id"]: bytes(r["resized"]) for r in resize_images(media, 16, 16).collect()}
    assert all(bytes(r["resized"]) == again[r["doc_id"]] for r in rows)


def test_portable_minhash_matches_production_form(spark, sf_dir):
    """The md5 double-hash portable MinHash finds the same verified pair
    set as the xxhash64 production form — different hash family, same
    algorithm, same exact-Jaccard verification."""
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table
    from fortune_500_financial_insights_pipeline_spark.operators.minhash import (
        minhash_neardup_pairs,
        minhash_neardup_pairs_portable,
    )

    d = load_table(spark, sf_dir, "documents")
    kw = dict(id_col="doc_id", text_col="text", n_hashes=16, bands=4, min_jaccard=0.2)
    prod = {(r.id_a, r.id_b, r.jac) for r in minhash_neardup_pairs(d, **kw).collect()}
    port = {
        (r.id_a, r.id_b, r.jac)
        for r in minhash_neardup_pairs_portable(d, **kw).collect()
    }
    assert prod == port and prod, "pair sets must agree and be non-empty"
