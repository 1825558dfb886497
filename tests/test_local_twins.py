"""Round-4: small-graph driver-side twins must be bit-equal to the
distributed loops they stand in for (pagerank / personalized pagerank /
HITS / connected components). The twins exist so fixed-round iterations
don't pay per-round shuffle-stage overhead on graphs that fit in a few MB;
these tests are the contract that the fast path IS the slow path."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

# round 10: heavyweight suite — excluded from the driver-budget default
# run (pytest.ini addopts), executed in full at every round close
import pytest as _pytest_r10
pytestmark = _pytest_r10.mark.slow



def _rand_edges(spark, n_nodes=40, n_edges=120, seed=3):
    rnd = random.Random(seed)
    rows = list(
        {
            (rnd.randrange(n_nodes), rnd.randrange(n_nodes))
            for _ in range(n_edges)
        }
    )
    rows.sort()
    return spark.createDataFrame(rows, "src long, dst long")


def test_pagerank_local_twin_bit_equal(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.pagerank import pagerank

    edges = _rand_edges(spark)
    fast = {r.node: r.rank_fp for r in pagerank(edges, max_iter=10).collect()}
    slow = {
        r.node: r.rank_fp
        for r in pagerank(edges, max_iter=10, local_threshold_edges=0).collect()
    }
    assert fast == slow


def test_ppr_local_twin_bit_equal(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.pagerank import (
        personalized_pagerank,
    )

    edges = _rand_edges(spark, seed=5)
    seeds = spark.createDataFrame([(1,), (7,)], "node long")
    fast = {
        r.node: r.rank_fp
        for r in personalized_pagerank(edges, seeds, max_iter=10).collect()
    }
    slow = {
        r.node: r.rank_fp
        for r in personalized_pagerank(
            edges, seeds, max_iter=10, local_threshold_edges=0
        ).collect()
    }
    assert fast == slow
    # seed mass present, non-seed teleport absent
    assert fast[1] > 0 and fast[7] > 0


def test_hits_local_twin_bit_equal(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.pagerank import hits

    edges = _rand_edges(spark, n_nodes=25, n_edges=70, seed=9).where(
        F.col("src") != F.col("dst")
    )
    fast = {
        (r.role, r.node): r.score for r in hits(edges, max_iter=8).collect()
    }
    slow = {
        (r.role, r.node): r.score
        for r in hits(edges, max_iter=8, local_threshold_edges=0).collect()
    }
    assert fast == slow
    assert max(v for (role, _), v in fast.items() if role == "hub") == 1.0


@pytest.mark.parametrize("seed", [2, 13, 29, 47])
def test_cc_three_way_equivalence_random_graphs(spark, seed):
    """union-find local finish == distributed min-label propagation ==
    large-star/small-star, on random graphs WITH self-loops and multiple
    components — the full interchangeability contract all three
    implementations now share."""
    from fortune_500_financial_insights_pipeline_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    rnd = random.Random(seed)
    n = rnd.randrange(20, 60)
    edges = [(rnd.randrange(n), rnd.randrange(n)) for _ in range(n + 10)]
    edges.append((n + 5, n + 5))  # isolated self-loop vertex
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    local = {r.id: r.comp for r in connected_components(df).collect()}
    prop = {
        r.id: r.comp
        for r in connected_components(df, max_iter=80, local_finish_edges=0).collect()
    }
    star = {r.id: r.comp for r in connected_components_star(df).collect()}
    assert local == prop == star
