"""Path analysis: first-order Markov transition statistics over per-key
ordered event sequences — "given state A, where do keys go next, how
often?".  The navigation/flow primitive (next-page, next-event-type,
order-status progression) the reference's dashboards would pivot on.

Spark shape: ONE window (lag over the per-key time sort — the same
shuffle every sessionization op in this repo rides) produces the
(from, to) pair stream; a partial-agged groupBy counts transitions; the
row-conditional probability divides by the from-state total via a second
tiny aggregate joined back (state-cardinality-sized, broadcast).  All
counts are exact longs; p is one deterministic double division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def transition_matrix(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    state_col: str,
) -> DataFrame:
    """(from_state, to_state, n, p): counts and row-conditional
    probabilities of consecutive state pairs within each key's ordered
    sequence.  ``order_cols`` must totally order rows within a key or
    the pair stream is partition-order dependent."""
    w = W.partitionBy(key_col).orderBy(*order_cols)
    prev = F.lag(F.col(state_col)).over(w)
    pairs = (
        df.select(prev.alias("from_state"), F.col(state_col).alias("to_state"))
        .where(F.col("from_state").isNotNull())
    )
    counts = pairs.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.groupBy("from_state").agg(F.sum("n").alias("__tot"))
    return (
        counts.join(F.broadcast(totals), "from_state")
        .select(
            "from_state",
            "to_state",
            "n",
            (F.col("n").cast("double") / F.col("__tot")).alias("p"),
        )
    )
