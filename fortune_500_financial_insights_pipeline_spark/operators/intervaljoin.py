"""Big-big interval join: right events inside a time window after left events.

A theta join ``r.ts ∈ (l.ts + lower, l.ts + upper]`` between two LARGE tables
must not plan as BroadcastNestedLoopJoin/cartesian — that's O(|L|·|R|) and the
classic 100 TB killer. The streaming engine solves it with watermarked
stream-stream interval joins (streaming/joins.py); this is the batch
equivalent, built from the binning identity:

with bin width w = upper - lower, any right timestamp inside the window of a
left timestamp falls in one of the (at most) two w-bins covering
``[l + lower, l + upper]``. So: explode each left row to its ≤2 candidate
bins (array_distinct keeps it one row per distinct bin → no dedup needed
afterwards), equi-join on (keys…, bin) — an ordinary shuffle join Catalyst
can plan, AQE can skew-split, and bucketing can co-locate — then refine with
the exact band predicate. Work is O(matching bins), not O(|L|·|R|).

The same rewrite serves any band/proximity join (price bands between two
fact tables, geo tiles, as-of with bounded staleness on two big sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def binned_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
    how: str = "inner",
) -> DataFrame:
    """Pairs where ``right_ts`` lies in ``(left_ts + lower_s, left_ts + upper_s]``
    and the ``on`` keys match. Columns of both inputs survive with their
    original names (prefix them beforehand on collision).

    ``how`` may be ``inner``, ``left``, ``right`` or ``full``. Outer variants
    cannot ride the exploded join directly: a left row fans out to ≤2 bin
    rows, so a plain outer join would null-extend it once per bin and the
    post-join band refinement would then drop those null rows. Instead the
    inner core is computed once and the unmatched side(s) are recovered with
    a LEFT ANTI join on a per-row id — both legs are ordinary shuffle joins,
    and AQE's exchange reuse shares the core between them.

    Requires ``upper_s > lower_s``; bin width = the window length, which is
    what bounds left fan-out at 2 regardless of data."""
    if upper_s <= lower_s:
        raise ValueError("upper_s must exceed lower_s")
    if how not in ("inner", "left", "right", "full"):
        raise ValueError(f"unsupported how={how!r}")
    width = upper_s - lower_s

    l_epoch = F.col(left_ts).cast("timestamp").cast("long")
    r_epoch = F.col(right_ts).cast("timestamp").cast("long")

    # Row ids for the anti-join rebuild. Deterministic for a fixed input
    # partitioning (partition ordinal << 33 | row ordinal), which is all the
    # rebuild needs: the same id on both sides of the anti join.
    need_lid = how in ("left", "full")
    need_rid = how in ("right", "full")
    if need_lid:
        left = left.withColumn("__lid", F.monotonically_increasing_id())
    if need_rid:
        right = right.withColumn("__rid", F.monotonically_increasing_id())

    lo = (l_epoch + lower_s) / F.lit(width)
    hi = (l_epoch + upper_s) / F.lit(width)
    bins = F.array_distinct(
        F.array(F.floor(lo).cast("long"), F.floor(hi).cast("long"))
    )
    lb = left.withColumn("__bin", F.explode(bins))
    rb = right.withColumn("__bin", F.floor(r_epoch / F.lit(width)).cast("long"))

    band = (F.col(right_ts).cast("timestamp").cast("long") > l_epoch + lower_s) & (
        F.col(right_ts).cast("timestamp").cast("long") <= l_epoch + upper_s
    )
    matched = lb.join(rb, [*on, "__bin"], "inner").where(band).drop("__bin")
    if how == "inner":
        return matched

    out = matched
    if need_lid:
        unmatched_l = left.join(matched.select("__lid"), "__lid", "left_anti")
        for f in right.schema.fields:
            if f.name not in on and f.name != "__rid":
                unmatched_l = unmatched_l.withColumn(
                    f.name, F.lit(None).cast(f.dataType)
                )
        if need_rid:
            unmatched_l = unmatched_l.withColumn("__rid", F.lit(None).cast("long"))
        out = out.unionByName(unmatched_l.select(out.columns))
    if need_rid:
        unmatched_r = right.join(matched.select("__rid"), "__rid", "left_anti")
        for f in left.schema.fields:
            if f.name not in on and f.name != "__lid":
                unmatched_r = unmatched_r.withColumn(
                    f.name, F.lit(None).cast(f.dataType)
                )
        if need_lid:
            unmatched_r = unmatched_r.withColumn("__lid", F.lit(None).cast("long"))
        out = out.unionByName(unmatched_r.select(out.columns))
    return out.drop("__lid", "__rid")


def interval_coverage(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Total covered length per key after merging overlapping intervals —
    the union-of-intervals measure (actual seconds watched, machine
    uptime, session coverage) where naive SUM(end-start) double-counts
    every overlap.

    The merge is the gaps-islands idiom lifted to intervals: ordered by
    (start, end), a new island begins where start exceeds the running
    max of all PRIOR ends; per island, coverage = max(end) − min(start).
    Bounds must be numeric (epoch seconds); all arithmetic is exact
    longs.  Island labels are invariant under permutation of identical
    rows, so the result is partition-deterministic.

    Scale shape: one shuffle on the key; both windows (prior-end max,
    island cumsum) share the same (key, start, end) sort; the two
    aggregates are partial-agged groupBys.

    Returns (key, covered, n_islands).
    """
    w = W.partitionBy(key_col).orderBy(start_col, end_col)
    s = F.col(start_col).cast("long")
    e = F.col(end_col).cast("long")
    prev_max_end = F.max(e).over(w.rowsBetween(W.unboundedPreceding, -1))
    new_island = F.when(
        prev_max_end.isNull() | (s > prev_max_end), F.lit(1)
    ).otherwise(F.lit(0))
    island = F.sum(new_island).over(w.rowsBetween(W.unboundedPreceding, 0))
    return (
        df.select(
            F.col(key_col), s.alias("__s"), e.alias("__e"), island.alias("__isl")
        )
        .groupBy(key_col, "__isl")
        .agg((F.max("__e") - F.min("__s")).alias("__cov"))
        .groupBy(key_col)
        .agg(
            F.sum("__cov").alias("covered"),
            F.count(F.lit(1)).alias("n_islands"),
        )
    )
