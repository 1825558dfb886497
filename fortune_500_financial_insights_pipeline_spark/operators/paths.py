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

    Scale shape: the corpus-sized work is building ``trans`` (the caller's
    one window + aggregate pass); the chain itself is CHANNEL-BOUNDED —
    (channels+2)² rows — so the ``k_iter`` value-iteration steps run
    DRIVER-SIDE on the collected matrix in exact Python longs (the same
    integer recurrence the DuckDB oracle unrolls as CTE stages:
    per-iteration truncating division, products under 2^63 because
    Σ row probs ≤ scale).  The earlier all-relational form paid
    k_iter × (2 joins + groupBy) of pure scheduling overhead on a
    ~150-row frame — 24 shuffle rounds for a matrix that fits in one
    collect; this is the kmeans discipline (collect the k·dim moments,
    not the corpus) taken to its endpoint, since here the WHOLE state
    space is driver-sized.  Rounding of the three output ratios
    replicates Spark's ROUND(double, 6) exactly (HALF_UP on the shortest
    decimal repr), so results are bit-identical to the relational form.
    """
    from decimal import ROUND_HALF_UP, Decimal

    def round6(x: float):
        if x != x:  # NaN passes through like Spark round()
            return x
        return float(
            Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
        )

    spark = trans.sparkSession
    base = [
        (r["from_state"], r["to_state"], int(r["t6"]))
        for r in trans.collect()
    ]
    kconv = pscale // scale
    pconv: dict[str, int] = {}
    for scen in ["__full__", *channels]:
        edges = [
            (f, t, w)
            for (f, t, w) in base
            if f != scen and t != scen and t != "NULL"
        ]
        out: dict[str, list[tuple[str, int]]] = {}
        for f, t, w in edges:
            out.setdefault(f, []).append((t, w))
        p = {st: 0 for st in out}
        for _ in range(k_iter):
            nxt = {}
            for st, dests in out.items():
                total = 0
                for t, w in dests:
                    if t == "CONV":
                        total += w * kconv
                    elif t in p:
                        # SQL: (t6 * p) div scale — truncating long division;
                        # a to-state with no outgoing edges joins NULL and is
                        # excluded from the sum, mirrored by the `elif`
                        total += (w * p[t]) // scale
                nxt[st] = total
            p = nxt
        pconv[scen] = p.get("START", 0)

    pfull = pconv["__full__"]
    drops = {c: pfull - pconv[c] for c in channels}
    tot = sum(drops.values())
    rows = []
    for c in sorted(channels):
        removal = (drops[c] / pfull) if pfull != 0 else float("nan")
        share = (drops[c] / tot) if tot > 0 else None
        rows.append(
            (
                c,
                round6(pconv[c] / pscale),
                round6(removal),
                round6(share) if share is not None else None,
            )
        )
    return spark.createDataFrame(
        rows,
        "channel string, p_conv_without double, removal_effect double, "
        "attribution_share double",
    )
