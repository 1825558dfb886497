"""Stream-stream joins (SURVEY.md §2.10 extension): correlate two live
streams within an event-time interval, with bounded state.

The batch twin is q_funnel (click → purchase); in streaming, BOTH sides
buffer rows in state until the watermark proves no counterpart can still
arrive. The interval condition is what makes state finite: a click older
than the join horizon + watermark delay is evictable. Without it,
stream-stream inner join state grows forever."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    horizon: str = "1 hour",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join: right rows within
    [left_ts, left_ts + horizon] per key. Both inputs must be streaming
    DataFrames; both get watermarks so Spark can bound join state.

    ``how="left_outer"`` additionally emits each unmatched left row (right
    columns null) — but only once the watermark has passed the row's join
    horizon, when absence is proven rather than merely unobserved yet. The
    interval condition is what makes the outer form legal: without an upper
    bound on right_ts the engine could never rule a match out."""
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"interval {horizon}"))
    )
    return l.join(r, cond, how).select(
        F.col(f"l.{key}").alias(key),
        F.col(f"l.{left_ts}").alias("left_ts"),
        F.col(f"r.{right_ts}").alias("right_ts"),
        (F.col(f"r.{right_ts}").cast("long") - F.col(f"l.{left_ts}").cast("long")).alias(
            "gap_s"
        ),
    )
