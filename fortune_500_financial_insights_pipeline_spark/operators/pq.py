"""Product quantization (PQ) for vector similarity at the 100 TB design
point — the missing third leg next to IVF (coarse cells) and int8 scalar
quantization (operators/similarity.py): split each embedding into ``m``
subvectors, learn a tiny k-entry codebook per subspace (Jégou, Douze,
Schmid, "Product Quantization for Nearest Neighbor Search", TPAMI 2011),
store each vector as ``m`` small codes, and answer queries with asymmetric
distance computation (ADC): a per-query lookup table of subspace distances,
so scoring a vector is ``m`` table lookups + adds — no float math per
candidate, and the stored corpus shrinks from d·4 bytes to m bytes.

Determinism discipline matches operators/kmeans.py (which this reuses for
training): fixed-point vectors, exact long arithmetic, md5 seeding,
truncating-division centroid updates — so the whole train → encode → ADC
path is hash-checkable against a single-threaded SQL oracle.

Scale shape:
* training: ALL m subspaces in one combined Lloyd loop — each iteration is
  a single corpus scan (map-side HOF assignment against the broadcast
  books) plus one partial-aggregated shuffle of k·m·(d/m) rows; codebooks
  are m·k·(d/m) longs on the driver (tiny, by PQ's design);
* encoding: one projection pass; codebooks attach as a 1-row broadcast
  relation (same no-giant-literals trick as kmeans.py — plan size is
  independent of m·k);
* query: the LUT is m·k longs computed driver-side from the codebooks
  (no data scan), broadcast once; scoring is a projection over the codes
  table + TakeOrdered(k) — no shuffle, no join against the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.operators.kmeans import (
    SCALE,
    _fixed_vec,
    _trunc_div,
)

Codebooks = dict[int, dict[int, list[int]]]  # sub -> cell -> fixed-point centroid


def pq_train(
    emb: DataFrame,
    *,
    m: int,
    k: int,
    n_iter: int = 1,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> Codebooks:
    """Learn one ``k``-entry codebook per subspace with the bit-deterministic
    Lloyd rules of operators/kmeans.py — but ALL ``m`` subspaces in the same
    pass: each iteration is ONE corpus scan (assignment is a map-side HOF
    projection against the broadcast codebooks; the update is a single
    partial-aggregated shuffle of k·m·d_sub rows), where per-subspace reuse
    of the scalar trainer would scan the corpus m times per iteration.

    Semantics are identical to running kmeans_fit on each slice: seeds are
    the k lowest-md5(vec_id) vectors (the same rows for every subspace, so
    one collect seeds all m books), assignment ties break to the lowest
    cell, updates are exact truncating division. ``dim`` must be divisible
    by ``m``."""
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    fixed = emb.select(
        F.col(id_col).cast("long").alias("vec_id"), _fixed_vec(vec_col).alias("v")
    )
    return _train_on_fixed(fixed, m=m, k=k, n_iter=n_iter, d_sub=dim // m)


def _train_on_fixed(
    fixed: DataFrame, *, m: int, k: int, n_iter: int, d_sub: int
) -> Codebooks:
    """The combined-subspace Lloyd loop over an already-fixed-point
    (vec_id, v array<bigint>) frame — shared by raw-vector and residual
    training."""
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    spark = fixed.sparkSession
    fixed = fixed.persist()
    seed_rows = (
        fixed.withColumn("h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("h")
        .limit(k)
        .collect()
    )
    books: Codebooks = {
        j: {
            i: list(r["v"])[j * d_sub : (j + 1) * d_sub]
            for i, r in enumerate(seed_rows)
        }
        for j in range(m)
    }
    for _ in range(n_iter):
        assigned = fixed.join(F.broadcast(_books_relation(spark, books))).select(
            "vec_id", "v", _codes_col("v", m, d_sub).alias("codes")
        )
        agg = (
            assigned.select(F.posexplode("v").alias("pos", "x"), F.col("codes"))
            .withColumn("sub", F.expr(f"pos div {d_sub}"))
            .withColumn("cell", F.element_at("codes", F.col("sub").cast("int") + 1))
            .groupBy("sub", "cell", F.expr(f"pos % {d_sub}").alias("spos"))
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
        )
        new: Codebooks = {j: {} for j in range(m)}
        for r in agg.collect():
            new[int(r["sub"])].setdefault(int(r["cell"]), [0] * d_sub)[
                int(r["spos"])
            ] = _trunc_div(int(r["s"]), int(r["n"]))
        books = new  # cells that lost every member drop out, as in the oracle
    fixed.unpersist()
    return books


def _codes_col(fv: str, m: int, d_sub: int) -> Column:
    """codes array for an already-fixed-point vector column, against the
    joined-in ``books`` relation column (nearest cell per subspace, ties to
    the lowest cell id)."""

    def code_for(j: int) -> Column:
        sub_v = F.slice(F.col(fv), j * d_sub + 1, d_sub)
        scored = F.transform(
            F.filter(F.col("books"), lambda b: b["sub"] == F.lit(j)),
            lambda b: F.struct(
                _sq_dist(sub_v, b["c"]).alias("d"), b["cell"].alias("cell")
            ),
        )
        return F.array_min(scored)["cell"]

    return F.array(*[code_for(j) for j in range(m)])


def _books_relation(spark, books: Codebooks):
    """Codebooks as a 1-row broadcast relation
    ``array<struct<sub,cell,c:array<bigint>>>`` (plan shape independent of
    m·k — giant literal arrays would re-compile per call, kmeans.py:30)."""
    flat = [
        (int(j), int(cell), [int(x) for x in vec])
        for j in sorted(books)
        for cell, vec in sorted(books[j].items())
    ]
    return spark.createDataFrame(
        [(flat,)], "books array<struct<sub:bigint,cell:bigint,c:array<bigint>>>"
    )


def _sq_dist(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, d: acc + d,
    )


def pq_encode(
    emb: DataFrame,
    books: Codebooks,
    *,
    m: int,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, codes array<bigint>) — nearest codebook entry per subspace,
    ties to the lowest cell id (same rule as the trainer's assignment)."""
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    d_sub = dim // m
    spark = emb.sparkSession
    return (
        emb.join(F.broadcast(_books_relation(spark, books)))
        .withColumn("__fv", _fixed_vec(vec_col))
        .select(
            F.col(id_col),
            _codes_col("__fv", m, d_sub).alias("codes"),
        )
    )


def pq_adc_topk(
    encoded: DataFrame,
    books: Codebooks,
    query_vec: list[float],
    *,
    m: int,
    dim: int,
    k_top: int = 20,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k: exact fixed-point LUT built driver-side
    from the codebooks (m·k longs, no data scan), broadcast once; each
    row's distance is m lookups + adds; TakeOrdered returns k_top rows —
    zero shuffle over the corpus."""
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    d_sub = dim // m
    q_fixed = [int(round(float(x) * SCALE)) for x in query_vec]
    lut = [
        (int(j), int(cell), sum(
            (q_fixed[j * d_sub + i] - vec[i]) ** 2 for i in range(d_sub)
        ))
        for j in sorted(books)
        for cell, vec in sorted(books[j].items())
    ]
    spark = encoded.sparkSession
    lut_df = spark.createDataFrame(
        [(lut,)], "lut array<struct<sub:bigint,cell:bigint,d:bigint>>"
    )
    # adc = Σ_j lut[j][codes[j]]: per element a filter over the ≤ m·k-entry
    # broadcast LUT array — constant work, all JVM-side HOFs
    codes_scored = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(0), F.lit(m - 1)).cast("array<bigint>"),
            lambda code, j: F.element_at(
                F.filter(
                    F.col("lut"), lambda e: (e["sub"] == j) & (e["cell"] == code)
                ),
                1,
            )["d"],
        ),
        F.lit(0).cast("long"),
        lambda acc, d: acc + d,
    )
    return (
        encoded.join(F.broadcast(lut_df))
        .select(F.col(id_col), codes_scored.alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc(id_col))
        .limit(k_top)
    )


# --- residual IVF-PQ (the production layout) -------------------------------


def _cent_relation(spark, centroids: list[list[float]]):
    """Coarse centroids as a 1-row broadcast relation keyed by cell id, in
    fixed point. float(c)/SCALE round-trips to the trained long exactly
    (|c| ≪ 2^52), so residuals computed here match an oracle that uses the
    training chain's fixed centroids directly."""
    flat = [
        (int(cell), [int(round(float(x) * SCALE)) for x in c])
        for cell, c in enumerate(centroids)
    ]
    return spark.createDataFrame(
        [(flat,)], "cents array<struct<cell:bigint,c:array<bigint>>>"
    )


def residual_frame(
    emb: DataFrame,
    centroids: list[list[float]],
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, cell, v) where ``v`` is the fixed-point residual to the
    row's coarse centroid (round-6 portable cosine routing, same rule as
    similarity.ivf_index_portable). Residuals concentrate around zero, so
    the SAME m·k codebook budget quantizes them far more finely than raw
    vectors — the reason IVF-PQ encodes residuals (Jégou et al. 2011 §III)."""
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import (
        ivf_index_portable,
    )

    spark = emb.sparkSession
    indexed = ivf_index_portable(emb, centroids, vec_col)
    cent_c = F.element_at(
        F.filter(F.col("cents"), lambda e: e["cell"] == F.col("cell")), 1
    )["c"]
    return (
        indexed.join(F.broadcast(_cent_relation(spark, centroids)))
        .select(
            F.col(id_col).cast("long").alias("vec_id"),
            F.col("cell"),
            F.zip_with(_fixed_vec(vec_col), cent_c, lambda a, b: a - b).alias("v"),
        )
    )


def pq_train_residual(
    emb: DataFrame,
    centroids: list[list[float]],
    *,
    m: int,
    k: int,
    n_iter: int = 1,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> Codebooks:
    """Codebooks over coarse-cell residuals (one shared book set across
    cells, the standard memory/accuracy compromise)."""
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    res = residual_frame(emb, centroids, vec_col=vec_col, id_col=id_col).select(
        "vec_id", "v"
    )
    return _train_on_fixed(res, m=m, k=k, n_iter=n_iter, d_sub=dim // m)


def pq_encode_residual(
    emb: DataFrame,
    centroids: list[list[float]],
    books: Codebooks,
    *,
    m: int,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, cell, codes) — the stored IVF-PQ index row: coarse cell for
    routing plus m residual codes for scoring."""
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    d_sub = dim // m
    spark = emb.sparkSession
    res = residual_frame(emb, centroids, vec_col=vec_col, id_col=id_col)
    return res.join(F.broadcast(_books_relation(spark, books))).select(
        "vec_id", "cell", _codes_col("v", m, d_sub).alias("codes")
    )


def ivfpq_residual_topk(
    encoded: DataFrame,
    books: Codebooks,
    centroids: list[list[float]],
    query_vec: list[float],
    probe_cells: list[int],
    *,
    m: int,
    dim: int,
    k_top: int = 20,
    id_col: str = "vec_id",
) -> DataFrame:
    """Residual-ADC top-k over the probed cells: ONE LUT per probed cell
    (the query residual differs per cell), built driver-side from the
    codebooks — n_probe·m·k longs, no data scan — broadcast once. Scoring
    stays m lookups + adds per candidate; TakeOrdered; zero corpus shuffle."""
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    d_sub = dim // m
    q_fixed = [int(round(float(x) * SCALE)) for x in query_vec]
    lut = []
    for cell in probe_cells:
        c_fixed = [int(round(float(x) * SCALE)) for x in centroids[cell]]
        q_res = [q_fixed[i] - c_fixed[i] for i in range(dim)]
        for j in sorted(books):
            for code, vec in sorted(books[j].items()):
                d = sum((q_res[j * d_sub + i] - vec[i]) ** 2 for i in range(d_sub))
                lut.append((int(cell), int(j), int(code), int(d)))
    spark = encoded.sparkSession
    lut_df = spark.createDataFrame(
        [(lut,)], "lut array<struct<ccell:bigint,sub:bigint,code:bigint,d:bigint>>"
    )
    adc = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(0), F.lit(m - 1)).cast("array<bigint>"),
            lambda code, j: F.element_at(
                F.filter(
                    F.col("lut"),
                    lambda e: (e["ccell"] == F.col("cell"))
                    & (e["sub"] == j)
                    & (e["code"] == code),
                ),
                1,
            )["d"],
        ),
        F.lit(0).cast("long"),
        lambda acc, d: acc + d,
    )
    return (
        encoded.where(F.col("cell").isin([int(c) for c in probe_cells]))
        .join(F.broadcast(lut_df))
        .select(F.col(id_col), adc.alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc(id_col))
        .limit(k_top)
    )
