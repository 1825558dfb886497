"""Skew-resistant join: explicit key salting (SURVEY.md §4, 100 TB design).

AQE's skew-join splitting (``spark.sql.adaptive.skewJoin.enabled``, on via
our session factory) handles most skew at runtime by splitting oversized
partitions. Explicit salting is the deterministic fallback for the cases
AQE can't fix — e.g. one key holding >50% of all rows, where even a split
partition still hot-spots, or non-shuffled-hash strategies.

Mechanics: the skewed (large) side gets a uniform random-ish salt in
``[0, salt)`` derived from a hash of the whole row's key + a spread column;
the other side is replicated ``salt`` times via an exploded literal array.
The join key becomes (key, salt), spreading one hot key over ``salt``
partitions. Replication multiplies the small side by ``salt`` — keep it the
dimension side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``large ⋈ small`` on ``on`` with the hot-key shuffle spread
    over ``salt`` buckets. Result is identical to ``large.join(small, on,
    how)`` for inner/left joins (the salt columns never leave this function).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (salt replicates the right side)")
    salted_large = large.withColumn(
        # spark_partition_id + monotonic id hash: cheap, uniform, and avoids
        # rand()'s non-determinism under task retries
        SALT_COL,
        F.pmod(F.xxhash64(*on, F.monotonically_increasing_id()), F.lit(salt)).cast("int"),
    )
    salted_small = small.withColumn(
        SALT_COL, F.explode(F.array([F.lit(i) for i in range(salt)]))
    )
    return salted_large.join(salted_small, [*on, SALT_COL], how).drop(SALT_COL)


def key_skew_profile(df: DataFrame, key_col: str, top_n: int = 10) -> DataFrame:
    """One-row skew diagnostic for a prospective shuffle key: row count,
    distinct keys, the heaviest key's share, the top-``top_n`` keys'
    combined share, and the max/mean frequency ratio (the factor by which
    the hottest post-shuffle partition would exceed the average — the
    number that decides between plain AQE skew-split and explicit
    salting, SURVEY §4).

    Scale shape: one groupBy on the key (the same shuffle the join would
    do, but reduced to counts), one full aggregate over the frequency
    table, and a TakeOrdered top-``top_n`` of it (per-partition heaps —
    NOT a global sort or a single-partition rank window, either of which
    funnels a billion-key frequency table through one task). The two
    one-row sides broadcast-cross-join. Output is one row — safe to
    collect/log per run.
    """
    freq = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("__n"))
    totals = freq.agg(
        F.sum("__n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("__n").alias("max_freq"),
    )
    top = (
        freq.orderBy(F.col("__n").desc(), F.col(key_col).asc())
        .limit(top_n)
        .agg(F.sum("__n").alias("__top_n_rows"))
    )
    return totals.crossJoin(F.broadcast(top)).select(
        "n_rows",
        "n_keys",
        "max_freq",
        (F.col("max_freq") / (F.col("n_rows") / F.col("n_keys"))).alias("skew_ratio"),
        F.round(F.col("max_freq") / F.col("n_rows"), 6).alias("top1_share"),
        F.round(F.col("__top_n_rows") / F.col("n_rows"), 6).alias("topn_share"),
    )
