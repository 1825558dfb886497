"""FIFO lot allocation as relational algebra: running-total interval
overlap.

Matching consumption to inventory lots first-in-first-out looks
inherently sequential (pop the oldest lot until the sell is filled), but
it has a closed relational form: give each buy lot the running-quantity
interval [cum_before, cum_after) in FIFO order, give each sell the same
over its own sequence, and the quantity lot i fills of sell j is the
OVERLAP of the two intervals — max(0, min(hi_b, hi_s) − max(lo_b, lo_s)).
One window pass per side + one key equi-join with a range-overlap
predicate replaces the sequential scan, so the allocation parallelizes
per key (the classic FIFO-as-interval-algebra rewrite; the realized-P&L
statement a trading book needs from fills).

Scale shape: cumulative sums are one window per side (shuffle on the
key); the match join is keyed on the same column, and because both
interval sets per key are sorted and non-overlapping, each lot overlaps
only the sells it actually feeds — the join's output is |matches|, not
|lots|×|sells|. For keys whose lot counts are huge, compose with
operators/intervaljoin.binned_interval_join on the cum ranges; for
naturally fine-grained keys (per part, per account) the plain keyed join
is already bounded. Quantities fold as exact longs; only unit prices
touch doubles (fixed-order, fixed-point folded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _with_cum(df: DataFrame, key_cols, order_cols, qty_col, prefix: str) -> DataFrame:
    w = (
        W.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    q = F.col(qty_col).cast("long")
    hi = F.sum(q).over(w)
    passthrough = [c for c in df.columns if c not in key_cols and c != qty_col]
    return df.select(
        *key_cols,
        *[F.col(c).alias(f"{prefix}_{c}") for c in passthrough],
        q.alias(f"{prefix}_qty"),
        (hi - q).alias(f"{prefix}_lo"),
        hi.alias(f"{prefix}_hi"),
    )


def fifo_match(
    buys: DataFrame,
    sells: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    qty_col: str,
) -> DataFrame:
    """Per-key FIFO allocation: one row per (lot, sell) pair that
    exchanges quantity, with ``matched_qty`` > 0. Both inputs need a
    total order within each key (pass tiebreak columns in
    ``order_cols``) and integer-valued quantities."""
    b = _with_cum(buys, key_cols, order_cols, qty_col, "b")
    s = _with_cum(sells, key_cols, order_cols, qty_col, "s")
    # Both sides leave their cum windows hash-partitioned on key_cols, so
    # a merge join needs NO exchange (a per-partition sort only); the
    # planner's size estimate instead broadcast one whole side — a
    # driver collect + duplicate hash relation per task that measured
    # 1.24 s vs 0.95 s for the merge route at sf0.1 (round 9). At scale
    # both sides are corpus-sized and merge is the only sane choice.
    j = b.join(s.hint("merge"), key_cols).where(
        (F.col("b_lo") < F.col("s_hi")) & (F.col("s_lo") < F.col("b_hi"))
    )
    matched = F.least("b_hi", "s_hi") - F.greatest("b_lo", "s_lo")
    return j.withColumn("matched_qty", matched)
