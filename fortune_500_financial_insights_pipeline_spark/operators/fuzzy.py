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
from pyspark.sql import Window as W


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


def golden_record(
    df: DataFrame,
    cluster_col: str,
    recency_col: str,
    attr_cols: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Survivorship: collapse each entity CLUSTER (the output of
    blocked_fuzzy_pairs + graph.cluster_dedup, or any match step) into
    one golden record carrying, per attribute, the most recent NON-NULL
    value — the MDM merge rule ("latest wins, but never let a null
    overwrite data") that a naive keep-latest row-dedup gets wrong
    whenever the newest version is partially filled.

    One window family per cluster (ordered by recency, then
    ``tiebreak_col``): every attribute resolves as
    last(attr, ignorenulls=True) over the unbounded frame, evaluated on
    the same sort; the final row per cluster (row_number desc = 1)
    carries the resolved values plus the member count.  One shuffle on
    the cluster key; no self-joins, no per-attribute passes.
    """
    order = [F.col(recency_col).asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    w = W.partitionBy(cluster_col).orderBy(*order)
    frame = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    resolved = [
        F.last(F.col(c), ignorenulls=True).over(frame).alias(c) for c in attr_cols
    ]
    order_desc = [F.col(recency_col).desc()] + (
        [F.col(tiebreak_col).desc()] if tiebreak_col else []
    )
    rn = F.row_number().over(W.partitionBy(cluster_col).orderBy(*order_desc))
    n = F.count(F.lit(1)).over(W.partitionBy(cluster_col))
    out = df.select(
        F.col(cluster_col),
        n.alias("n_members"),
        *resolved,
        rn.alias("__rn"),
    )
    return out.where(F.col("__rn") == 1).drop("__rn")


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    window: int = 3,
    max_dist: int = 2,
):
    """Sorted-neighborhood entity-resolution blocking: records sort by
    the name key and each record is compared only against the next
    ``window − 1`` neighbors — the classic complement to equality
    blocking (blocked_fuzzy_pairs) that catches near-misses equality
    blocks split apart (e.g. a typo in the block prefix's last kept
    character still sorts adjacently).

    Scale shape: the sort window partitions on the FIRST sort-key
    character, so no single-partition global window; candidates cross a
    partition boundary only when their keys straddle a first-letter
    boundary — the standard multi-pass SN tradeoff (run again with a
    rotated key to close it). Candidates come from ``window − 1``
    lead() calls over one sorted pass — O(n·window), never a cartesian;
    the levenshtein gate is a JVM built-in.
    """
    cands = df.select(F.col(id_col).alias("id_a"), F.col(name_col).alias("name_a"))
    w = W.partitionBy(F.substring("name_a", 1, 1)).orderBy("name_a", "id_a")
    out = None
    for k in range(1, window):
        pair = cands.select(
            "id_a",
            "name_a",
            F.lead("id_a", k).over(w).alias("id_b"),
            F.lead("name_a", k).over(w).alias("name_b"),
        ).where(F.col("id_b").isNotNull())
        out = pair if out is None else out.unionByName(pair)
    return (
        out.withColumn("dist", F.levenshtein("name_a", "name_b"))
        .where(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "dist")
    )
