"""As-of join: attach the most recent right-side value at or before each
left-side timestamp (per key). Spark has no native ASOF JOIN; this composes
one from a union + ordered window, which scales linearly:

1. tag right rows, union with left rows on (key, ts),
2. one window partitioned by key, ordered by (ts, right-first, tiebreak),
3. ``last(right_value, ignorenulls=True)`` carries the latest right value
   forward; filter back to left rows.

Cost: a single shuffle on the key (same as any join) and a per-key sort —
no range explosion, no broadcast requirement. Skewed keys are handled by
AQE. The reference's Tableau overlay (prices × most-recent statement,
SURVEY.md §2.3 J5) is exactly this shape.

The ordering puts right rows *before* left rows at equal timestamps, so a
right value with ts == left ts is visible (as-of "<=" semantics).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    tiebreak_col: str,
    suffix: str = "_asof",
    tolerance: str | None = None,
) -> DataFrame:
    """Return ``left`` with ``{v}{suffix}`` columns holding the most recent
    ``right`` values at or before each left row's ``ts_col``.

    ``tiebreak_col`` must make (ts, tiebreak) unique per side so the result
    is deterministic.

    ``tolerance`` (an INTERVAL string, e.g. ``"2 days"``) bounds staleness
    the way pandas ``merge_asof(tolerance=...)`` does: a carried value older
    than ``left.ts - tolerance`` reverts to null. The window also carries
    the matched right row's timestamp, so the bound is one comparison —
    no second join.
    """
    on = list(on)
    lcols = left.columns
    l_tagged = left.select(
        *on,
        F.col(ts_col).alias("_ts"),
        F.col(tiebreak_col).alias("_tb"),
        F.lit(0).alias("_is_right"),
        *[F.lit(None).cast(dict(right.dtypes)[v]).alias(f"_rv_{v}") for v in value_cols],
        F.struct(*lcols).alias("_lrow"),
    )
    r_tagged = right.select(
        *on,
        F.col(ts_col).alias("_ts"),
        F.col(tiebreak_col).alias("_tb"),
        F.lit(1).alias("_is_right"),
        *[F.col(v).alias(f"_rv_{v}") for v in value_cols],
        F.lit(None).cast(l_tagged.schema["_lrow"].dataType.simpleString()).alias("_lrow"),
    )
    u = l_tagged.unionByName(r_tagged)
    w = (
        W.partitionBy(*on)
        .orderBy(F.asc("_ts"), F.desc("_is_right"), F.asc("_tb"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = u.select(
        "*",
        *[
            F.last(f"_rv_{v}", ignorenulls=True).over(w).alias(f"{v}{suffix}")
            for v in value_cols
        ],
        F.last(F.when(F.col("_is_right") == 1, F.col("_ts")), ignorenulls=True)
        .over(w)
        .alias("_rts"),
    ).filter(F.col("_is_right") == 0)
    if tolerance is not None:
        fresh = F.col("_rts") >= F.col("_ts") - F.expr(f"INTERVAL {tolerance}")
        carried = carried.select(
            *[c for c in carried.columns if not c.endswith(suffix)],
            *[
                F.when(fresh, F.col(f"{v}{suffix}")).alias(f"{v}{suffix}")
                for v in value_cols
            ],
        )
    return carried.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in lcols],
        *[F.col(f"{v}{suffix}") for v in value_cols],
    )
