"""Relational Bloom filter: build a bit array as a tiny DataFrame, probe it
with a broadcast join.

The 100 TB use case is the semi-join pre-filter (Bloom-join): before
shuffling a huge fact table against a large-but-smaller build side, probe a
Bloom filter of the build keys and drop the guaranteed-miss rows map-side —
the same idea behind Spark's own runtime row-group filters, expressed here
as a first-class operator whose filter can be persisted and reused across
queries (e.g. "have we already ingested this document fingerprint?" across
daily training-data batches).

Representation: ``m_bits`` bits packed into 32-bit words, one row per
non-zero word ``(word, bits)``. Absent words are implicit zeros, so the
relation is at most ``min(k·n, m_bits/32)`` rows — kilobytes; always
broadcast. 32-bit words (not 64) keep every mask and OR inside non-negative
BIGINT range on any ANSI engine (a 1<<63 mask overflows signed 64-bit).

Hashing is k independent md5-derived positions — deterministic and
engine-portable (same arithmetic reproduces bit-exactly in DuckDB/ANSI SQL,
the repo-wide parity pattern used by operators/sampling.md5_sample and
operators/minhash). Bloom guarantees hold: zero false negatives, false
positives at the standard (1 - e^{-kn/m})^k rate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_BITS = 32


def _position(key: Column, i: int, m_bits: int) -> Column:
    """i-th hash position: first 60 bits of md5('{i}:' || key), mod m_bits.

    Non-negative by construction (15 hex chars < 2^60), so ``%`` agrees
    between Spark, DuckDB and ANSI engines without sign fix-ups.
    """
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(str(i)), key.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return h % m_bits


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 16384, k: int = 3
) -> DataFrame:
    """Bloom filter of ``df[key_col]`` as a ``(word, bits)`` relation.

    One narrow projection → explode to k positions → map-side partial
    bit_or, final bit_or over at most m_bits/32 groups. No driver
    materialization; the result is a DataFrame you can persist, union
    (bit_or merge — Bloom filters of the same shape OR together), or
    broadcast into a probe.
    """
    if m_bits % WORD_BITS:
        raise ValueError(f"m_bits must be a multiple of {WORD_BITS}")
    key = F.col(key_col)
    pos = F.explode(
        F.array(*[_position(key, i, m_bits) for i in range(k)])
    ).alias("pos")
    return (
        df.select(pos)
        .select(
            F.floor(F.col("pos") / WORD_BITS).alias("word"),
            F.expr(f"shiftleft(1L, cast(pos % {WORD_BITS} as int))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_probe(
    bloom: DataFrame,
    probe: DataFrame,
    key_col: str,
    m_bits: int = 16384,
    k: int = 3,
) -> DataFrame:
    """Probe rows of ``probe`` against a ``bloom_build`` relation.

    Adds boolean ``maybe_member``: true iff all k bits are set (possible
    member — false positives at the designed rate), false = definitely not
    in the build set. The probe side stays partitioned; the filter side is
    broadcast, so the plan is scan → broadcast hash join → grouped count,
    no shuffle of the probe table beyond the per-key regroup.
    """
    key = F.col(key_col)
    cells = probe.select(
        *probe.columns,
        F.posexplode(F.array(*[_position(key, i, m_bits) for i in range(k)])).alias(
            "__i", "__pos"
        ),
    ).select(
        *probe.columns,
        "__i",
        F.floor(F.col("__pos") / WORD_BITS).alias("word"),
        F.expr(f"shiftleft(1L, cast(__pos % {WORD_BITS} as int))").alias("mask"),
    )
    hit = F.col("bits").isNotNull() & (F.col("bits").bitwiseAND(F.col("mask")) != 0)
    return (
        cells.join(F.broadcast(bloom), "word", "left")
        .groupBy(*probe.columns)
        .agg((F.sum(F.when(hit, 1).otherwise(0)) == k).alias("maybe_member"))
    )
