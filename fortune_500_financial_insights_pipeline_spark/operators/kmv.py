"""KMV (k-minimum-values) distinct-count sketch as a relation.

The mergeable cardinality sketch with an *engine-portable* estimate:
hash every key to a uniform fraction of hash space, keep the k smallest
values per group, and estimate distinct = (k-1) / u_k where u_k is the
k-th smallest (Bar-Yossef et al. 2002; the KMV/bottom-k form of Beyer et
al., SIGMOD 2007). Unlike HLL (whose register layout is implementation-
defined — `q_hll_distinct` is rows-only for that reason), every step here
is md5 + plain arithmetic, so a DuckDB oracle reproduces the estimate
bit-for-bit: this is the distinct sketch that can sit behind a hard
correctness gate.

Scale shape: the hash + distinct is one shuffle on (group, value); the
bottom-k is a WindowGroupLimit-capped rank (partial top-k map-side, so
the exchange carries at most k rows per group per input partition, never
the raw value stream); the sketch itself is k rows per group — kilobytes.
Sketches merge by union + re-rank (bottom-k of a union of bottom-k sets
is the bottom-k of the union), which is what lets per-partition / per-day
sketches roll up without touching raw data again — the property that
matters when the raw table is 100 TB and the rollup is daily.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

_HASH_SPACE = float(1 << 60)  # first 15 md5 hex chars span [0, 2^60)


def _uniform(key) -> F.Column:
    """md5-derived uniform fraction in [0, 1) — deterministic, portable
    (same arithmetic as operators/bloom._position / sampling.md5_sample)."""
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast("double")
    return h / F.lit(_HASH_SPACE)


def kmv_sketch(
    df: DataFrame, group_cols: list[str], key_col: str, k: int = 64
) -> DataFrame:
    """Bottom-k sketch: the k smallest distinct key-hash fractions per
    group, as rows ``(group…, u)``."""
    if k < 2:
        raise ValueError("k must be >= 2 ((k-1)/u_k needs at least 2 values)")
    u = df.select(*group_cols, _uniform(F.col(key_col)).alias("u")).distinct()
    w = W.partitionBy(*group_cols).orderBy(F.asc("u"))
    return (
        u.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_merge(a: DataFrame, b: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """Union two sketches of the same shape and re-take the bottom k —
    exactly the sketch of the union of the underlying key sets."""
    w = W.partitionBy(*group_cols).orderBy(F.asc("u"))
    return (
        a.unionByName(b)
        .distinct()
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_estimate(sketch: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """Distinct-count estimate per group: exact count when the group held
    fewer than k distinct values (the sketch saw everything), else
    (k-1)/u_k. Rounded to 6 so the division is comparison-stable across
    engines."""
    return sketch.groupBy(*group_cols).agg(
        F.when(F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double"))
        .otherwise(F.round((F.lit(k - 1)) / F.max("u"), 6))
        .alias("est_distinct")
    )


def kmv_overlap(a: DataFrame, b: DataFrame, key_col: str, k: int = 128) -> DataFrame:
    """Jaccard / intersection / union estimates between two key sets from
    bottom-k sketches alone (Beyer et al., SIGMOD 2007 §4): never joins the
    raw sides. M = bottom-k of the sketch union; J ≈ |M ∩ A ∩ B| / |M|;
    |A ∪ B| ≈ (k-1)/u_k; |A ∩ B| ≈ J · |A ∪ B|. When the union holds fewer
    than k distinct hashes the sketches saw everything and all three are
    exact.

    This answers the corpus-planning question — "how much does source A
    overlap source B?" — at sketch cost: each side is scanned once for a
    k-row TakeOrdered; the estimate combines two k-row frames. At 100 TB
    the sketches are reusable artifacts: persist per-source sketches once,
    estimate any pairwise overlap later without touching the data.

    Returns one row: (j_est, union_est, inter_est), round-6.
    """
    def sk(df: DataFrame) -> DataFrame:
        return (
            df.select(_uniform(F.col(key_col)).alias("u"))
            .distinct()
            .orderBy(F.asc("u"))
            .limit(k)
        )

    sa, sb = sk(a), sk(b)
    m = sa.unionByName(sb).distinct().orderBy(F.asc("u")).limit(k)
    both = m.join(sa, "u", "left_semi").join(sb, "u", "left_semi")
    stats = m.agg(F.count(F.lit(1)).alias("n_m"), F.max("u").alias("u_k")).crossJoin(
        both.agg(F.count(F.lit(1)).alias("n_both"))
    )
    j = F.col("n_both") / F.col("n_m")
    union_est = F.when(
        F.col("n_m") < k, F.col("n_m").cast("double")
    ).otherwise(F.round(F.lit(k - 1) / F.col("u_k"), 6))
    return stats.select(
        F.round(j, 6).alias("j_est"),
        union_est.alias("union_est"),
        F.round(j * union_est, 6).alias("inter_est"),
    )


def quantile_sketch(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Mergeable bottom-k VALUE sample per group: retain the k rows whose
    md5(id) hashes smallest (a deterministic uniform sample, same family
    as kmv_sketch but keeping the VALUE alongside the hash) — the
    fixed-memory quantile sketch that, unlike t-digest/KLL, is both
    mergeable (union + re-trim commutes with partitioning) and
    bit-reproducible across engines, so estimates can sit behind the
    hash gate. Rank window + <=k filter plans as WindowGroupLimit: every
    map task forwards at most k rows per group.
    """
    h = F.md5(F.col(id_col).cast("string"))
    w = W.partitionBy(*group_cols).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.select(*group_cols, F.col(id_col), F.col(value_col))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def sketch_quantiles(
    sample: DataFrame,
    group_cols: list[str],
    value_col: str,
    probs: tuple[float, ...] = (0.5, 0.9),
) -> DataFrame:
    """Quantile estimates from a quantile_sketch sample: exact interpolated
    percentiles OF THE SAMPLE (the estimate's only error is sampling error
    — bounded-rank-error by test, like the HLL/KMV accuracy pins)."""
    aggs = [F.count(F.lit(1)).alias("n_sample")] + [
        F.round(F.percentile(F.col(value_col).cast("double"), F.lit(p)), 6).alias(
            f"est_p{int(p * 100)}"
        )
        for p in probs
    ]
    return sample.groupBy(*group_cols).agg(*aggs)
