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
