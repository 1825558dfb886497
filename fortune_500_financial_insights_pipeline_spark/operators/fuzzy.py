"""Blocked fuzzy string matching: edit-distance candidate pairs.

Entity resolution / fuzzy dedup of name-keyed dimensions (the reference's
`stock_list.csv` ticker table and the DDL VARCHAR keys, `code/sql/DDLs:13`,
are exactly this shape) needs "strings within edit distance k" pairs. The
naive formulation is an O(n²) cross join with a levenshtein filter — fine on
a 20-row dimension, fatal on a corpus. The operator therefore requires a
*blocking key*: candidate pairs are generated only inside a block, so the
plan is an equi-join (shuffle on the block key, never a cartesian) and the
quadratic term is bounded by the largest block.

Standard blocking keys, in increasing robustness: a string prefix, a
phonetic code (``F.soundex``), a sorted-neighborhood window, or a MinHash
band (operators/minhash.py) when even the blocks would go quadratic.

``levenshtein`` is a JVM built-in in Spark and a native function in DuckDB,
so the whole operator stays inside whole-stage codegen and is
oracle-checkable — no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block: Column,
    max_dist: int = 1,
) -> DataFrame:
    """Candidate pairs (id_a, id_b, dist) with id_a < id_b, equal blocking
    key, and ``levenshtein(text_a, text_b) <= max_dist``.

    ``block`` is evaluated against ``df``'s columns on both sides of the
    self-join. Pairs across different blocks are never generated — that is
    the recall/cost trade every blocking scheme makes explicit.
    """
    with_block = df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_txt"), block.alias("_blk")
    )
    a = with_block.select(
        F.col("_id").alias("id_a"), F.col("_txt").alias("txt_a"), F.col("_blk").alias("blk")
    )
    b = with_block.select(
        F.col("_id").alias("id_b"), F.col("_txt").alias("txt_b"), F.col("_blk").alias("blk")
    )
    return (
        a.join(b, "blk")
        .where(F.col("id_a") < F.col("id_b"))
        .where(F.levenshtein("txt_a", "txt_b") <= max_dist)
        .select(
            "id_a",
            "id_b",
            F.levenshtein("txt_a", "txt_b").alias("dist"),
        )
    )
