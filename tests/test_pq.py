"""Product quantization (operators/pq.py): determinism, guards, recall."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.operators.pq import (
    pq_adc_topk,
    pq_encode,
    pq_train,
)
from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

# round 10: heavyweight suite — excluded from the driver-budget default
# run (pytest.ini addopts), executed in full at every round close
import pytest as _pytest_r10
pytestmark = _pytest_r10.mark.slow



def _clustered(spark, dim=8, per=25):
    rng = random.Random(11)
    centers = [
        [10.0 if i == j % dim else 0.0 for i in range(dim)] for j in range(4)
    ]
    rows = []
    vid = 0
    for c in centers:
        for _ in range(per):
            rows.append((vid, [x + rng.uniform(-0.4, 0.4) for x in c]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), centers


def test_pq_train_guards(spark):
    emb, _ = _clustered(spark)
    with pytest.raises(ValueError):
        pq_train(emb, m=3, k=2, dim=8)  # 8 % 3 != 0
    with pytest.raises(ValueError):
        pq_train(emb, m=2, k=2, dim=8, n_iter=0)


def test_pq_encode_deterministic_and_in_book(spark):
    emb, _ = _clustered(spark)
    books = pq_train(emb, m=2, k=4, n_iter=2, dim=8)
    enc = {r.vec_id: list(r.codes) for r in pq_encode(emb, books, m=2, dim=8).collect()}
    # codes reference live codebook entries only
    for codes in enc.values():
        for j, c in enumerate(codes):
            assert c in books[j]
    # partitioning cannot change the result
    enc2 = {
        r.vec_id: list(r.codes)
        for r in pq_encode(emb.repartition(7), books, m=2, dim=8).collect()
    }
    assert enc == enc2


def test_pq_adc_recall_on_clustered_data(spark):
    """With cluster-separated data, ADC top-`per` recovers the query's own
    cluster: quantization error is tiny next to inter-cluster distance."""
    emb, centers = _clustered(spark)
    books = pq_train(emb, m=2, k=4, n_iter=2, dim=8)
    enc = pq_encode(emb, books, m=2, dim=8)
    got = pq_adc_topk(enc, books, centers[0], m=2, dim=8, k_top=25).collect()
    ids = {r.vec_id for r in got}
    assert ids == set(range(25)), "ADC must rank the query's cluster first"
    # distances are exact longs, never null
    assert all(r.adc_dist is not None and r.adc_dist >= 0 for r in got)


def test_pq_query_plan_has_no_corpus_shuffle(spark, sf_dir):
    """The ADC scoring leg is a projection + TakeOrdered over the codes
    table: broadcast LUT join only — no exchange of corpus rows, no
    SinglePartition funnel."""
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    books = pq_train(emb, m=4, k=4, n_iter=1, dim=64)
    enc = pq_encode(emb, books, m=4, dim=64)
    plan = (
        pq_adc_topk(enc, books, [0.0] * 64, m=4, dim=64, k_top=20)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "SinglePartition" not in plan
    assert "hashpartitioning" not in plan, "corpus rows must not shuffle"


def test_pq_registered_query_runs(spark, sf_dir):
    rows = QUERIES["q_pq_topk"](spark, sf_dir).collect()
    assert len(rows) == 20
    dists = [r.adc_dist for r in rows]
    assert dists == sorted(dists)


def test_ivfpq_registered_query_runs(spark, sf_dir):
    rows = QUERIES["q_ivfpq_topk"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    dists = [r.adc_dist for r in rows]
    assert dists == sorted(dists)


def test_ivfpq_subset_of_pq_over_probed_cells(spark, sf_dir):
    """IVF-PQ candidates are exactly the PQ-scored rows whose coarse cell
    was probed — the composition adds pruning, never new candidates."""
    ivfpq = {r.vec_id: r.adc_dist for r in QUERIES["q_ivfpq_topk"](spark, sf_dir).collect()}
    full = {r.vec_id: r.adc_dist for r in QUERIES["q_pq_topk"](spark, sf_dir).collect()}
    # any id in both must carry the same exact ADC distance
    for vid in set(ivfpq) & set(full):
        assert ivfpq[vid] == full[vid]


def test_residual_ivfpq_recall_on_clustered_data(spark):
    """Probing the query's own coarse cell with residual codes recovers the
    cluster; residual encoding is partition-invariant."""
    from fortune_500_financial_insights_pipeline_spark.operators.kmeans import kmeans_centroids
    from fortune_500_financial_insights_pipeline_spark.operators.pq import (
        ivfpq_residual_topk,
        pq_encode_residual,
        pq_train_residual,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import (
        probe_cells_col,
    )

    emb, centers = _clustered(spark)
    cents = kmeans_centroids(emb, k=4, n_iter=2)
    books = pq_train_residual(emb, cents, m=2, k=4, n_iter=1, dim=8)
    enc = pq_encode_residual(emb, cents, books, m=2, dim=8)
    enc2 = pq_encode_residual(emb.repartition(5), cents, books, m=2, dim=8)
    as_map = lambda df: {r.vec_id: (r.cell, tuple(r.codes)) for r in df.collect()}  # noqa: E731
    assert as_map(enc) == as_map(enc2)

    probe_df = spark.createDataFrame([(centers[0],)], "embedding array<float>")
    probe = list(
        probe_df.select(probe_cells_col("embedding", cents, 1).alias("p")).head()["p"]
    )
    got = ivfpq_residual_topk(
        enc, books, cents, centers[0], probe, m=2, dim=8, k_top=25
    ).collect()
    assert {r.vec_id for r in got} == set(range(25))
    dists = [r.adc_dist for r in got]
    assert dists == sorted(dists) and all(d >= 0 for d in dists)


def test_residual_ivfpq_registered_query_runs(spark, sf_dir):
    rows = QUERIES["q_ivfpq_residual_topk"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 20


def test_pq_encode_and_query_guard_dim(spark):
    emb, _ = _clustered(spark)
    books = pq_train(emb, m=2, k=2, n_iter=1, dim=8)
    with pytest.raises(ValueError):
        pq_encode(emb, books, m=3, dim=8)
    with pytest.raises(ValueError):
        pq_adc_topk(spark.range(1).withColumnRenamed("id", "vec_id"), books,
                    [0.0] * 8, m=3, dim=8)


def test_residual_codes_quantize_finer_than_raw(spark):
    """The reason residual IVF-PQ exists: with the same m x k code budget,
    ADC distances computed from residual codes track the TRUE fixed-point
    L2 distances more closely than raw-vector codes (residuals concentrate
    near zero). Asserted as strictly lower total absolute ADC error over
    the corpus, query = cluster-0 center."""
    from fortune_500_financial_insights_pipeline_spark.operators.kmeans import (
        SCALE as KSCALE,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.kmeans import (
        kmeans_centroids,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.pq import (
        ivfpq_residual_topk,
        pq_encode_residual,
        pq_train_residual,
    )

    emb, centers = _clustered(spark)
    n = emb.count()
    query = centers[0]
    q_fp = [int(round(x * KSCALE)) for x in query]
    truth = {
        r.vec_id: sum(
            (q_fp[i] - int(round(float(x) * KSCALE))) ** 2
            for i, x in enumerate(r.embedding)
        )
        for r in emb.collect()
    }

    # raw-vector PQ over every vector
    books_raw = pq_train(emb, m=2, k=4, n_iter=2, dim=8)
    raw = {
        r.vec_id: r.adc_dist
        for r in pq_adc_topk(
            pq_encode(emb, books_raw, m=2, dim=8), books_raw, query,
            m=2, dim=8, k_top=n,
        ).collect()
    }
    # residual PQ, probing ALL cells so every vector is scored
    cents = kmeans_centroids(emb, k=4, n_iter=2)
    books_res = pq_train_residual(emb, cents, m=2, k=4, n_iter=2, dim=8)
    enc = pq_encode_residual(emb, cents, books_res, m=2, dim=8)
    res = {
        r.vec_id: r.adc_dist
        for r in ivfpq_residual_topk(
            enc, books_res, cents, query, list(range(len(cents))),
            m=2, dim=8, k_top=n,
        ).collect()
    }
    assert set(raw) == set(res) == set(truth)
    err_raw = sum(abs(raw[v] - truth[v]) for v in truth)
    err_res = sum(abs(res[v] - truth[v]) for v in truth)
    assert err_res < err_raw, (err_res, err_raw)


def test_ivfpq_index_partitioned_by_cell_prunes_probes(spark, tmp_path):
    """The deployment story: the encoded index written partitionBy('cell')
    turns a probe into PARTITION PRUNING — a 2-cell probe reads 2/k of the
    index, asserted via PartitionFilters in the scan plan and identical
    results to the unpartitioned path."""
    from fortune_500_financial_insights_pipeline_spark.operators.kmeans import kmeans_centroids
    from fortune_500_financial_insights_pipeline_spark.operators.pq import (
        pq_encode_residual,
        pq_train_residual,
    )

    emb, centers = _clustered(spark)
    cents = kmeans_centroids(emb, k=4, n_iter=2)
    books = pq_train_residual(emb, cents, m=2, k=4, n_iter=1, dim=8)
    enc = pq_encode_residual(emb, cents, books, m=2, dim=8)
    path = str(tmp_path / "ivfpq_index")
    enc.write.partitionBy("cell").parquet(path)

    probe = [0, 1]
    scan = spark.read.parquet(path).where(F.col("cell").isin(probe))
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    got = {(r.vec_id, r.cell, tuple(r.codes)) for r in scan.collect()}
    want = {
        (r.vec_id, r.cell, tuple(r.codes))
        for r in enc.where(F.col("cell").isin(probe)).collect()
    }
    assert got == want and got, "pruned scan must equal filtered index"


def test_ivfpq_rerank_registered_query_runs(spark, sf_dir):
    rows = QUERIES["q_ivfpq_rerank"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    sims = [r.sim for r in rows]
    assert sims == sorted(sims, reverse=True)
    # the query vector itself survives shortlist+rerank at similarity 1
    assert rows[0].vec_id == 0 and abs(rows[0].sim - 1.0) < 1e-6


def test_late_interaction_prefers_query_cluster(spark):
    """With cluster-separated vectors and all query tokens drawn from one
    cluster, that cluster's label must win MaxSim-sum retrieval."""
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import (
        late_interaction_topk,
    )

    emb, centers = _clustered(spark)
    lab = emb.withColumn("label", (F.col("vec_id") / 25).cast("int"))
    got = late_interaction_topk(lab, [centers[1], centers[1]], k=2).collect()
    assert got[0].label == 1
    assert got[0].score > got[1].score


def test_late_interaction_registered_query_runs(spark, sf_dir):
    rows = QUERIES["q_late_interaction"](spark, sf_dir).collect()
    assert len(rows) == 5
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_portable_lsh_finds_planted_dups_only(spark):
    """Planted scaled copies (cosine 1.0) are found; near-orthogonal noise
    is not; the signature interior is integer-exact so the pair set is
    partition-invariant."""
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import (
        lsh_neardup_pairs_portable,
    )

    rng = random.Random(3)
    rows = [
        (vid, [rng.uniform(-1.0, 1.0) for _ in range(8)]) for vid in range(80)
    ]
    base = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    planted = base.where(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.02)).alias("embedding"),
    )
    corpus = base.unionByName(planted)
    got = lsh_neardup_pairs_portable(
        corpus, dim=8, n_planes=12, min_cosine=0.9999
    ).collect()
    assert {(r.id_a, r.id_b) for r in got} == {(i, i + 1000) for i in range(5)}
    assert all(abs(r.cosine - 1.0) < 1e-5 for r in got)
    got2 = lsh_neardup_pairs_portable(
        corpus.repartition(7), dim=8, n_planes=12, min_cosine=0.9999
    ).collect()
    assert {tuple(r) for r in got} == {tuple(r) for r in got2}
