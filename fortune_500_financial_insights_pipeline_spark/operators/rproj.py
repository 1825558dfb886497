"""Signed random projection (Johnson–Lindenstrauss with a ±1 Achlioptas
matrix): reduce an embedding column to ``m`` dimensions so downstream
distance work — clustering, shortlist scoring, duplicate triage — runs on
an 8-long vector instead of a 64-float one, with pairwise distances
preserved in expectation (Achlioptas 2003: ±1 entries satisfy the JL
guarantee with none of the Gaussian sampling).

Everything is exact and engine-portable: the sign matrix derives from
``functions/planes.hyperplane_fixed`` (no RNG state — the oracle builder
generates the identical matrix), vector components are fixed-pointed at
1e6, and each projected component is an exact long dot product, so the
projection — and any distance computed from it — hash-matches a
single-threaded oracle bit for bit.

Scale shape (100 TB): the projection is a map-side higher-order-function
fold per row (zero shuffle, stays in whole-stage codegen); the k-NN probe
broadcasts the single projected query row and ranks with a TakeOrdered
top-k — the corpus is scanned once and never shuffled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.functions.planes import hyperplane_fixed


def sign_entry(p: int, d: int) -> int:
    """±1 Achlioptas matrix entry — the SIGN of the shared deterministic
    plane table, so Spark and the oracle spell the same matrix."""
    return 1 if hyperplane_fixed(p, d) >= 0 else -1


def project_fixed(vec_col: str, dim: int, m: int = 8, scale: int = 1_000_000) -> Column:
    """array<long>: m exact-integer projected components of a float
    vector (components fixed-pointed at ``scale`` first)."""
    vfix = F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double") * scale).cast("long")
    )
    comps = []
    for p in range(m):
        signs = F.array(
            *[F.lit(sign_entry(p, d)).cast("long") for d in range(dim)]
        )
        comps.append(
            F.aggregate(
                F.zip_with(vfix, signs, lambda x, s: x * s),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            )
        )
    return F.array(*comps)


def rp_knn(
    emb: DataFrame,
    query_id: int,
    dim: int,
    m: int = 8,
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-``k`` nearest neighbours of ``query_id`` by exact squared L2
    distance in the ``m``-dim projected space: (id, pdist), ascending,
    ties on id.  The projected distance is an exact long, so the ranking
    (including the query itself at pdist 0) is fully deterministic."""
    proj = emb.select(
        F.col(id_col), project_fixed(vec_col, dim, m).alias("__pv")
    )
    qv = proj.where(F.col(id_col) == query_id).select(
        F.col("__pv").alias("__qv")
    )
    dist = F.aggregate(
        F.zip_with(F.col("__pv"), F.col("__qv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return (
        proj.crossJoin(F.broadcast(qv))
        .select(F.col(id_col), dist.alias("pdist"))
        .orderBy(F.asc("pdist"), F.asc(id_col))
        .limit(k)
    )
