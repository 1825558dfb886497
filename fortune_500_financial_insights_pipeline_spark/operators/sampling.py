"""Sampling operators for training-data pipelines (SURVEY.md §2.11 family):
uniform, stratified, and deterministic hash-based row sampling.

``df.sample`` is fast but partition-order dependent — re-running after a
repartition yields a different subset, which poisons reproducible dataset
builds. ``hash_sample`` keys the decision on a row identity hash instead:
the same rows are selected no matter the partitioning, cluster size, or
Spark version, and the sample composes with incremental loads (a row's
in/out decision never changes). That property is what a 100 TB corpus
refresh needs: yesterday's 1% sample is a subset of today's."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# xxhash64 yields a uniform signed 64-bit value; bucket it into [0, 1)
_HASH_BUCKETS = 1_000_000


def hash_sample(df: DataFrame, fraction: float, key_cols: list[str], seed: int = 0) -> DataFrame:
    """Deterministic content-keyed sample: keep rows whose key-hash bucket
    falls below ``fraction``. Same keys in → same rows out, always."""
    bucket = F.pmod(F.xxhash64(*key_cols, F.lit(seed)), F.lit(_HASH_BUCKETS))
    return df.filter(bucket < int(fraction * _HASH_BUCKETS))


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum sampling fractions (class rebalancing): thin wrapper over
    the native ``sampleBy`` (Bernoulli per row, seeded)."""
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)
