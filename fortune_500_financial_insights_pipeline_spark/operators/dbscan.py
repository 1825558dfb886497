"""Grid DBSCAN: density clustering as cell aggregation + cell-graph
components.

Point-pairwise DBSCAN is O(n²) without an index; the grid formulation
(GriDBSCAN / cell-based DBSCAN family) buckets points into epsilon-sized
cells, calls a cell dense when it holds >= minpts points, and merges
ADJACENT dense cells — clustering becomes: one hash aggregate (cell
counts), one bounded equi-join (each dense cell meets at most its 9
neighborhood keys, never cell×cell), and connected components over the
CELL graph (operators/graph.py's min-label propagation, running on a
frame that is orders of magnitude smaller than the point set). Points in
sparse cells report as noise.

This trades boundary exactness for scale (two dense points can sit within
eps across a sparse-cell gap and land in different clusters — the standard
grid approximation), and is fully deterministic: cell ids are integer
floors, so an oracle replays every step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.operators.graph import connected_components

CELL_STRIDE = 1_000_000  # cx*STRIDE+cy packing; |cx|,|cy| < STRIDE/2


def grid_dbscan(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    eps: float,
    min_pts: int,
    cc_fn=None,
) -> DataFrame:
    """(id, cell_id, cluster) for points in dense cells; sparse-cell
    points are omitted (noise — callers outer-join them back). cluster
    is the min packed cell id of the connected dense-cell component.

    ``cc_fn`` selects the connected-components implementation over the
    dense-cell graph (default: min-label propagation; pass
    graph.connected_components_star for the O(log n)-round form — both
    converge to min-id labels, so results are identical)."""
    cx = F.floor(F.col(x_col) / eps).cast("long")
    cy = F.floor(F.col(y_col) / eps).cast("long")
    bound = CELL_STRIDE // 2
    # cx*STRIDE+cy is injective only while |cx|,|cy| < STRIDE/2; beyond
    # that distant cells would silently collide into one cell_id and merge
    # unrelated clusters, so violations fail loudly instead.  The guard is
    # a single branch per row with a constant message — cheap enough for
    # the scan stage.
    guard = F.when(
        (F.abs(cx) < bound) & (F.abs(cy) < bound),
        cx * CELL_STRIDE + cy,
    ).otherwise(
        F.raise_error(
            F.lit(
                "grid_dbscan cell index out of packing range "
                f"(|cx|,|cy| must be < {bound}): eps is too small for the "
                "coordinate span — raise eps or use a wider CELL_STRIDE"
            )
        ).cast("long")
    )
    pts = points.select(
        F.col(id_col).alias("id"),
        guard.alias("cell_id"),
        cx.alias("cx"),
        cy.alias("cy"),
    )
    dense = (
        pts.groupBy("cell_id", "cx", "cy")
        .agg(F.count(F.lit(1)).alias("n_pts"))
        .where(F.col("n_pts") >= min_pts)
    )
    # 9-neighborhood expansion on one side -> plain equi-join on the
    # neighbor's packed id: each dense cell generates 9 probe keys
    offsets = F.expr(
        "explode(array("
        + ", ".join(f"struct({ox}L AS ox, {oy}L AS oy)" for ox in (-1, 0, 1) for oy in (-1, 0, 1))
        + "))"
    )
    probes = dense.select(
        F.col("cell_id").alias("id_a"), "cx", "cy", offsets.alias("o")
    ).select(
        "id_a",
        ((F.col("cx") + F.col("o.ox")) * CELL_STRIDE + (F.col("cy") + F.col("o.oy"))).alias(
            "nbr"
        ),
    )
    edges = (
        probes.join(
            dense.select(F.col("cell_id").alias("id_b")),
            probes.nbr == F.col("id_b"),
        )
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    comp = (cc_fn or connected_components)(edges, "id_a", "id_b")
    labeled_cells = (
        dense.join(comp, dense.cell_id == comp.id, "left")
        .select(
            "cell_id",
            F.coalesce("comp", F.col("cell_id")).alias("cluster"),
        )
    )
    return pts.join(labeled_cells, "cell_id").select("id", "cell_id", "cluster")
