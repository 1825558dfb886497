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


def markov_removal_attribution(
    trans: DataFrame,
    channels: list[str],
    k_iter: int = 24,
    scale: int = 10**6,
    pscale: int = 10**12,
) -> DataFrame:
    """Markov removal-effect attribution (Anderl et al. 2016 — the
    standard multi-touch model): conversion credit for channel c is how
    much the chain's START→CONV absorption probability drops when c is
    removed (transitions into c redirected to NULL).

    ``trans``: (from_state, to_state, t6) — row-normalized transition
    probabilities as integers at ``scale`` (CONV/NULL absorbing).
    Absorption probabilities come from ``k_iter`` value-iteration steps
    run on ALL scenarios at once (the full chain + one per removed
    channel, union-tagged into a single (scenario, from, to) frame), so
    each step is ONE equi-join + groupBy over a states×channels-sized
    frame — the kmeans/PageRank unroll discipline, with per-iteration
    integer truncation (long `div`) so both engines compute the
    identical trajectory. p is exact long arithmetic at ``pscale``
    throughout; products stay under 2^63 because Σ row probs ≤ scale.
    Per-step localCheckpoints keep plan analysis linear in k.
    """
    spark = trans.sparkSession
    scen = spark.createDataFrame(
        [("__full__",)] + [(c,) for c in channels], "scenario string"
    )
    strans = (
        trans.crossJoin(F.broadcast(scen))
        .where(
            (F.col("from_state") != F.col("scenario"))
            & (F.col("to_state") != F.col("scenario"))
            & (F.col("to_state") != "NULL")
        )
        .select("scenario", "from_state", "to_state", "t6")
        .localCheckpoint(eager=False)
    )
    states = strans.select("scenario", F.col("from_state").alias("state")).distinct()
    p = states.withColumn("p", F.lit(0).cast("long")).localCheckpoint(eager=False)
    for _ in range(k_iter):
        joined = (
            states.join(
                strans,
                (states["scenario"] == strans["scenario"])
                & (states["state"] == strans["from_state"]),
                "left",
            )
            .select(states["scenario"], states["state"], "to_state", "t6")
            .join(
                p.select(
                    F.col("scenario").alias("__ps"),
                    F.col("state").alias("__pt"),
                    F.col("p").alias("__pp"),
                ),
                (F.col("scenario") == F.col("__ps"))
                & (F.col("to_state") == F.col("__pt")),
                "left",
            )
        )
        contrib = F.when(
            F.col("to_state") == "CONV", F.col("t6") * F.lit(pscale // scale)
        ).otherwise(F.expr(f"(t6 * __pp) div {scale}"))
        p = (
            joined.groupBy("scenario", "state")
            .agg(F.coalesce(F.sum(contrib), F.lit(0)).cast("long").alias("p"))
            .localCheckpoint(eager=False)
        )
    start = p.where(F.col("state") == "START").select(
        "scenario", F.col("p").alias("__pconv")
    )
    full = start.where(F.col("scenario") == "__full__").select(
        F.col("__pconv").alias("__pfull")
    )
    per = (
        start.where(F.col("scenario") != "__full__")
        .crossJoin(F.broadcast(full))
        .select(
            F.col("scenario").alias("channel"),
            F.round(F.col("__pconv").cast("double") / pscale, 6).alias(
                "p_conv_without"
            ),
            (F.col("__pfull") - F.col("__pconv")).alias("__drop_int"),
            F.col("__pfull"),
        )
    )
    tot = per.agg(F.sum("__drop_int").alias("__tot"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "channel",
            "p_conv_without",
            F.round(F.col("__drop_int").cast("double") / F.col("__pfull"), 6).alias(
                "removal_effect"
            ),
            F.round(
                F.when(
                    F.col("__tot") > 0,
                    F.col("__drop_int").cast("double") / F.col("__tot"),
                ),
                6,
            ).alias("attribution_share"),
        )
        .orderBy("channel")
    )
