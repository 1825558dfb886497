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

    Requires ``upper_s > lower_s``; bin width = the window length, which is
    what bounds left fan-out at 2 regardless of data."""
    if upper_s <= lower_s:
        raise ValueError("upper_s must exceed lower_s")
    width = upper_s - lower_s

    l_epoch = F.col(left_ts).cast("timestamp").cast("long")
    r_epoch = F.col(right_ts).cast("timestamp").cast("long")

    lo = (l_epoch + lower_s) / F.lit(width)
    hi = (l_epoch + upper_s) / F.lit(width)
    bins = F.array_distinct(
        F.array(F.floor(lo).cast("long"), F.floor(hi).cast("long"))
    )
    lb = left.withColumn("__bin", F.explode(bins))
    rb = right.withColumn("__bin", F.floor(r_epoch / F.lit(width)).cast("long"))

    joined = lb.join(rb, [*on, "__bin"], how)
    band = (F.col(right_ts).cast("timestamp").cast("long") > l_epoch + lower_s) & (
        F.col(right_ts).cast("timestamp").cast("long") <= l_epoch + upper_s
    )
    return joined.where(band).drop("__bin")
