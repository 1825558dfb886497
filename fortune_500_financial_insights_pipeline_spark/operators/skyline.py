"""2-D skyline (Pareto frontier) as two aggregations + one tiny window.

The reference's analytics layer (BigQuery + Tableau per
/root/reference/README.md:3-10) serves exactly this kind of "best
trade-off" question (cheapest part per capability tier, best ESG per
sector). The naive formulation is a dominance self-join — O(n²) and a
100 TB non-starter. For two criteria there is a classical sort-scan
identity (Börzsönyi et al., "The Skyline Operator", ICDE 2001):

a row survives iff no row has a strictly better ``minimize`` value with a
``maximize`` value at least as good, and no row with an equal ``minimize``
value is strictly better on ``maximize``. Grouping by ``minimize`` and
taking the running max of the per-group best over *strictly smaller*
values answers both conditions with

1. one hash aggregation (map-side partial) to per-value group maxima,
2. one prefix-max window over the *aggregated* frame — cardinality =
   distinct ``minimize`` values, not table rows, so the single-partition
   window funnel is bounded by value-domain size (prices, sizes: ~1e4-1e6
   tiny rows even at 100 TB of facts),
3. one equi-join back to the base table — the frontier side is an
   anti-chain (at most one row per distinct value), broadcast-sized.

No self-join anywhere; the base table is scanned twice (agg + join), both
scans column-pruned to the two criteria.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def skyline_2d(df: DataFrame, minimize: str, maximize: str) -> DataFrame:
    """Rows not Pareto-dominated under (``minimize`` ↓, ``maximize`` ↑).

    Dominance: a beats b iff a.min <= b.min, a.max >= b.max, and at least
    one is strict. Ties (identical value pairs) all survive — neither
    dominates the other.
    """
    per_val = df.groupBy(minimize).agg(F.max(maximize).alias("__vmax"))
    # prefix max over strictly-smaller minimize values; frame excludes the
    # current (distinct) value so equal-min rows don't suppress each other
    w = W.orderBy(minimize).rowsBetween(W.unboundedPreceding, -1)
    frontier = (
        per_val.withColumn("__cummax_lt", F.max("__vmax").over(w))
        .where(F.col("__cummax_lt").isNull() | (F.col("__cummax_lt") < F.col("__vmax")))
        .select(minimize, "__vmax")
    )
    return (
        df.join(F.broadcast(frontier), on=minimize, how="inner")
        .where(F.col(maximize) == F.col("__vmax"))
        .drop("__vmax")
    )
