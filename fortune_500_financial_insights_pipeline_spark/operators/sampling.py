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


def _hex_threshold(fraction: float) -> str:
    """``fraction`` of the md5 space as a 32-digit lowercase hex string.
    Fixed-width lowercase hex compares byte-wise exactly like the number
    it spells, so `md5(key) < threshold` is a pure string predicate any
    engine evaluates identically — that is what makes md5_sample
    oracle-checkable where xxhash64 (Spark-specific) is not."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return format(int(fraction * (1 << 128)), "032x")[:32]


def md5_sample(df: DataFrame, fraction: float, key_cols: list[str]) -> DataFrame:
    """Deterministic, engine-portable content-keyed sample: keep rows whose
    md5 over the '|'-joined keys lands in the first ``fraction`` of hash
    space. Same reproducibility contract as hash_sample (partition- and
    version-invariant, supersets compose across fractions) with ~2x the
    per-row hashing cost of xxhash64 — the price of portability."""
    key = F.md5(F.concat_ws("|", *key_cols))
    return df.filter(key < F.lit(_hex_threshold(fraction)))


def md5_stratified(
    df: DataFrame, strata_col: str, fractions: dict[str, float], key_cols: list[str]
) -> DataFrame:
    """Deterministic per-stratum sampling (class rebalancing without
    sampleBy's seeded-Bernoulli engine dependence): each stratum gets its
    own md5-space threshold via a CASE chain; strata absent from
    ``fractions`` are dropped (empty threshold sorts below every hash)."""
    case = None
    for stratum, frac in fractions.items():
        arm = (F.col(strata_col) == stratum, F.lit(_hex_threshold(frac)))
        case = F.when(*arm) if case is None else case.when(*arm)
    threshold = case.otherwise(F.lit(""))
    return df.filter(F.md5(F.concat_ws("|", *key_cols)) < threshold)
