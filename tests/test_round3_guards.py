"""Round-3 hardening: loud-failure guards and null-safe checksums
(advisor items on graph.py, dbscan.py, checks.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.checks import table_checksum
from fortune_500_financial_insights_pipeline_spark.operators.dbscan import grid_dbscan
from fortune_500_financial_insights_pipeline_spark.operators.graph import (
    connected_components,
)


def test_connected_components_raises_on_nonconvergence(spark):
    # a 6-node chain needs ~5 label-propagation rounds; max_iter=2 must
    # fail loudly, never return partially-merged components
    # (local_finish_edges=0 forces the distributed loop under test)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], ["id_a", "id_b"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=2, local_finish_edges=0).collect()
    # with enough rounds the same chain converges to one component
    got = connected_components(edges, max_iter=10, local_finish_edges=0)
    assert {r.comp for r in got.collect()} == {0}


def test_connected_components_local_finish_matches_distributed(spark):
    """The bounded union-find finish and the distributed propagation
    produce identical min-id labels (on a graph with chains, islands,
    and a self-loop), and string ids survive the local path."""
    import random

    rnd = random.Random(11)
    edge_list = [(rnd.randrange(40), rnd.randrange(40)) for _ in range(55)]
    edge_list.append((39, 39))  # self-loop vertex
    edges = spark.createDataFrame(edge_list, ["id_a", "id_b"])
    local = {r.id: r.comp for r in connected_components(edges).collect()}
    dist = {
        r.id: r.comp
        for r in connected_components(
            edges, max_iter=60, local_finish_edges=0
        ).collect()
    }
    assert local == dist
    s_edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], ["id_a", "id_b"]
    )
    got = {r.id: r.comp for r in connected_components(s_edges).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_star_cc_self_loop_singleton(spark):
    """A vertex whose only edge is a self-loop is labeled with its own id
    by BOTH implementations (the round-3 advisor divergence)."""
    from fortune_500_financial_insights_pipeline_spark.operators.graph import (
        connected_components_star,
    )

    df = spark.createDataFrame([(1, 2), (7, 7)], ["id_a", "id_b"])
    star = {r.id: r.comp for r in connected_components_star(df).collect()}
    prop = {
        r.id: r.comp
        for r in connected_components(df, local_finish_edges=0).collect()
    }
    assert star == prop == {1: 1, 2: 1, 7: 7}


def test_grid_dbscan_rejects_out_of_range_cells(spark):
    # eps tiny vs coordinate span -> |cx| >= CELL_STRIDE/2 -> loud error,
    # not silently-collided cell ids
    pts = spark.createDataFrame(
        [(1, 1.0e9, 0.0), (2, 1.0e9, 0.0), (3, 1.0e9 + 0.1, 0.0)],
        ["id", "x", "y"],
    )
    with pytest.raises(Exception, match="packing range"):
        grid_dbscan(pts, "id", "x", "y", eps=1.0, min_pts=2).collect()


def test_grid_dbscan_in_range_unchanged(spark):
    pts = spark.createDataFrame(
        [(i, float(i % 3) * 0.1, 0.0) for i in range(12)], ["id", "x", "y"]
    )
    out = grid_dbscan(pts, "id", "x", "y", eps=1.0, min_pts=2)
    # all points land in one dense cell -> one cluster, nobody dropped
    rows = out.collect()
    assert len(rows) == 12 and len({r.cluster for r in rows}) == 1


def test_table_checksum_distinguishes_null_transposition(spark):
    a = spark.createDataFrame([("a", None)], "x string, y string")
    b = spark.createDataFrame([(None, "a")], "x string, y string")
    ca = table_checksum(a).head()
    cb = table_checksum(b).head()
    assert ca.n_rows == cb.n_rows == 1
    assert ca.checksum != cb.checksum


def test_table_checksum_order_and_null_stable(spark):
    df = spark.createDataFrame(
        [("a", None), (None, "b"), ("c", "d")], "x string, y string"
    )
    c1 = table_checksum(df).head()
    c2 = table_checksum(df.orderBy(F.desc("x")).repartition(7)).head()
    assert (c1.n_rows, c1.checksum) == (c2.n_rows, c2.checksum)


def test_star_cc_matches_propagation_on_random_graph(spark):
    import random

    rnd = random.Random(7)
    edges = [(rnd.randrange(60), rnd.randrange(60)) for _ in range(80)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    from fortune_500_financial_insights_pipeline_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    prop = {r.id: r.comp for r in connected_components(df, max_iter=60).collect()}
    star = {r.id: r.comp for r in connected_components_star(df).collect()}
    assert star == prop


def test_star_cc_handles_long_chain_in_log_rounds(spark):
    # a 120-node chain needs ~119 propagation rounds but only O(log n)
    # star rounds — max_iter=12 must suffice
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(120)], ["id_a", "id_b"]
    )
    from fortune_500_financial_insights_pipeline_spark.operators.graph import (
        connected_components_star,
    )

    got = connected_components_star(edges, max_iter=12).collect()
    assert len(got) == 121
    assert {r.comp for r in got} == {0}


def test_star_cc_two_components_and_empty(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.graph import (
        connected_components_star,
    )

    df = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"]
    )
    got = {r.id: r.comp for r in connected_components_star(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components_star(empty).count() == 0


def test_table_checksum_md5_null_transposition(spark):
    from fortune_500_financial_insights_pipeline_spark.checks import table_checksum_md5

    a = spark.createDataFrame([(1, "a", None)], "k long, x string, y string")
    b = spark.createDataFrame([(1, None, "a")], "k long, x string, y string")
    ca = table_checksum_md5(a, ["x", "y"], bucket=F.col("k")).head()
    cb = table_checksum_md5(b, ["x", "y"], bucket=F.col("k")).head()
    assert ca.checksum != cb.checksum


def test_table_checksum_md5_separator_and_sentinel_safe(spark):
    """Round-4 advisor fix: length-framing makes the pre-hash string
    unambiguous — a '|' inside a value cannot realign columns, and a
    literal string equal to the old null sentinel cannot impersonate
    NULL."""
    from fortune_500_financial_insights_pipeline_spark.checks import table_checksum_md5

    a = spark.createDataFrame([(1, "a|b", "c")], "k long, x string, y string")
    b = spark.createDataFrame([(1, "a", "b|c")], "k long, x string, y string")
    ca = table_checksum_md5(a, ["x", "y"], bucket=F.col("k")).head()
    cb = table_checksum_md5(b, ["x", "y"], bucket=F.col("k")).head()
    assert ca.checksum != cb.checksum
    # value framing: '1:a|3:b|c' cannot equal '3:a|b|1:c' style strings
    c = spark.createDataFrame([(1, "<null>", "z")], "k long, x string, y string")
    d = spark.createDataFrame([(1, None, "z")], "k long, x string, y string")
    cc = table_checksum_md5(c, ["x", "y"], bucket=F.col("k")).head()
    cd = table_checksum_md5(d, ["x", "y"], bucket=F.col("k")).head()
    assert cc.checksum != cd.checksum
    # identical tables agree regardless of partitioning/order
    big = spark.createDataFrame(
        [(i, f"v{i}", None if i % 3 == 0 else f"w{i}") for i in range(100)],
        "k long, x string, y string",
    )
    c1 = {(r.bucket, r.n_rows, r.checksum) for r in table_checksum_md5(big, ["x", "y"], F.col("k")).collect()}
    c2 = {(r.bucket, r.n_rows, r.checksum) for r in table_checksum_md5(big.repartition(13), ["x", "y"], F.col("k")).collect()}
    assert c1 == c2
