"""Bit-deterministic Lloyd's k-means over an ``array<float>`` embedding column.

Trains the coarse quantizer the IVF similarity path (operators/similarity.py)
currently fills with raw sampled vectors — proper centroids tighten the cells,
which is what makes an IVF probe read fewer candidates at 100 TB.

Determinism is the hard part: float means are order-dependent, so a
distributed run and a single-threaded oracle drift. Everything here is exact
integer arithmetic instead (the PageRank playbook, operators/pagerank.py):

* vectors scale to 64-bit fixed point (×10^6, round) — identical per-row in
  any engine;
* squared L2 distances are sums of long products — exact, order-free;
* assignment ties break to the lowest cell id (explicit, both engines);
* centroid update is an exact truncating division ``(s - s % n) / n`` —
  ``%`` truncates toward zero in both Spark and DuckDB, the adjusted
  numerator divides exactly, and the double quotient is far below 2^53.

Scale shape per iteration: one scan of the (persisted) fixed-point vectors
computes all k distances JVM-side (zip_with/aggregate, no UDF); assignment is
a projection; the update is a posexplode → (cell, pos) partial-aggregated
shuffle carrying k·dim rows. Driver traffic is k·dim longs per iteration —
the classic small-k k-means layout. Init = k lowest md5(vec_id) vectors
(engine-portable, same trick as operators/sampling.py).

Centroids reach the executors as a one-row broadcast relation (an
``array<struct<cell,c>>`` column attached by a broadcast nested-loop join),
NOT as per-cell literal arrays in the plan: k·dim plan literals made every
iteration re-analyze and re-compile a fresh giant expression (measured 2-3 s
per iteration at ANY scale factor — pure fixed overhead), and at a realistic
quantizer size (k=4096, dim=1024) a 4M-literal plan would not compile at
all. With the broadcast form the plan shape is identical across iterations,
so analysis and codegen are cached after the first.

Oracle: the iterations unroll to CTE stages (oracles.py q_kmeans) — DuckDB
replays the exact integer computation single-threaded.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000


def _fixed_vec(vec_col: str) -> Column:
    return F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double") * SCALE).cast("long")
    )


def _sqdist(v: Column, centroid: list[int]) -> Column:
    c = F.array(*[F.lit(int(x)).cast("long") for x in centroid])
    return F.aggregate(
        F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, d: acc + d,
    )


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Run ``n_iter`` exact Lloyd iterations; return (cell, pos, c, n):
    per-cell fixed-point centroid components and member counts."""
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1 (the result is the last iteration's aggregate)")
    df = emb.select(
        F.col(id_col).cast("long").alias("vec_id"), _fixed_vec(vec_col).alias("v")
    ).persist()

    # init: the k vectors with lexicographically smallest md5(vec_id),
    # cell ids assigned in that md5 order
    seed_rows = (
        df.withColumn("h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("h")
        .limit(k)
        .collect()
    )
    centroids: dict[int, list[int]] = {i: list(r["v"]) for i, r in enumerate(seed_rows)}

    spark = emb.sparkSession
    cent_schema = "cents array<struct<cell:bigint,c:array<bigint>>>"
    rows: list = []
    for _ in range(n_iter):
        cent_df = spark.createDataFrame(
            [([(int(c), [int(x) for x in centroids[c]]) for c in sorted(centroids)],)],
            cent_schema,
        )
        # squared distance to every live centroid, struct-ordered so
        # array_min picks (min distance, then lowest cell id) — the same
        # tie-break as taking the first occurrence over ascending cells
        scored = F.transform(
            F.col("cents"),
            lambda ct: F.struct(
                F.aggregate(
                    F.zip_with(F.col("v"), ct["c"], lambda x, y: (x - y) * (x - y)),
                    F.lit(0).cast("long"),
                    lambda acc, d: acc + d,
                ).alias("d"),
                ct["cell"].alias("cell"),
            ),
        )
        assigned = (
            df.join(F.broadcast(cent_df))  # 1-row relation: map-side attach
            .withColumn("cell", F.array_min(scored)["cell"])
            .drop("cents")
        )
        agg = (
            assigned.select("cell", F.posexplode("v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
        )
        rows = agg.collect()
        new: dict[int, list[int]] = {}
        dim = len(next(iter(centroids.values())))
        for r in rows:
            vec = new.setdefault(int(r["cell"]), [0] * dim)
            vec[int(r["pos"])] = _trunc_div(int(r["s"]), int(r["n"]))
        centroids = new  # cells that lost every member drop out, as in the oracle

    df.unpersist()
    # The driver already holds the final iteration's aggregate (k·dim longs —
    # the same payload every iteration ships); materializing `agg` again
    # would re-run assignment + shuffle, a full extra pass over the data at
    # scale. _trunc_div matches Spark's `s div n` long division exactly.
    return spark.createDataFrame(
        [
            (int(r["cell"]), int(r["pos"]), _trunc_div(int(r["s"]), int(r["n"])), int(r["n"]))
            for r in rows
        ],
        "cell bigint, pos bigint, c bigint, n bigint",
    )


def _trunc_div(a: int, b: int) -> int:
    """C-style truncated integer division, exact at any magnitude (int(a / b)
    goes through a float and loses precision past 2^53)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _trunc_mod(a: int, b: int) -> int:
    """C-style % (sign follows the dividend) — what Spark and DuckDB compute,
    unlike Python's floor mod."""
    return a - _trunc_div(a, b) * b


def kmeans_centroids(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Trained centroids in float space, ordered by cell id — a drop-in for
    similarity.sample_centroids wherever an IVF index is built
    (similarity.ivf_index / ivf_topk): tighter cells mean an n_probe probe
    reads fewer false candidates at the same recall."""
    rows = kmeans_fit(emb, k=k, n_iter=n_iter, vec_col=vec_col, id_col=id_col).collect()
    by_cell: dict[int, dict[int, float]] = {}
    for r in rows:
        by_cell.setdefault(int(r["cell"]), {})[int(r["pos"])] = r["c"] / SCALE
    return [
        [by_cell[c][p] for p in sorted(by_cell[c])] for c in sorted(by_cell)
    ]
