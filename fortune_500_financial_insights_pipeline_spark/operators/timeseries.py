"""Time-series gap filling: dense calendar spine + linear interpolation.

The reference's domain is daily OHLCV series with holes (non-trading days,
source gaps across the Kaggle/API boundary, `ingest_data_API.py:41-42`);
its pipeline simply leaves the holes. This operator produces the dense
series an analytics layer wants: one row per (key, day) over a fixed range,
observed values carried through, missing days linearly interpolated between
the nearest observations (clamped to nearest at the edges).

Spark shape: the spine is ``sequence(start, end)`` exploded per key — no
driver loop, no collect; the join back is an equi-join on (key, day); the
interpolation needs only four IGNORE NULLS window functions over the same
(key, order-by-day) window, so the whole fill is ONE shuffle on the key.
Window frames are unbounded on one side each — Spark evaluates them in a
single pass per direction. All arithmetic is double IEEE-754 with a fixed
evaluation order, so results are bit-identical to a single-threaded oracle.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def fill_gaps_linear(
    daily: DataFrame,
    key_col: str,
    date_col: str,
    value_col: str,
    start: _dt.date,
    end: _dt.date,
) -> DataFrame:
    """(key, day, value_filled) densified over [start, end] per key.

    ``daily`` must be one row per (key, day) (aggregate first). Days inside
    the range with no row get ``prev + (next - prev) * elapsed/gap``;
    leading/trailing gaps clamp to the nearest observation.
    """
    keys = daily.select(F.col(key_col).alias("k")).distinct()
    spine = keys.select(
        "k",
        F.explode(
            F.sequence(F.lit(start), F.lit(end), F.expr("INTERVAL 1 DAY"))
        ).alias("d"),
    )
    obs = daily.select(
        F.col(key_col).alias("k"), F.col(date_col).alias("d"), F.col(value_col).alias("v")
    )
    dense = spine.join(obs, ["k", "d"], "left")

    w_back = W.partitionBy("k").orderBy("d").rowsBetween(W.unboundedPreceding, 0)
    w_fwd = W.partitionBy("k").orderBy("d").rowsBetween(0, W.unboundedFollowing)
    obs_day = F.when(F.col("v").isNotNull(), F.col("d"))
    dense = dense.select(
        "k",
        "d",
        "v",
        F.last("v", ignorenulls=True).over(w_back).alias("pv"),
        F.last(obs_day, ignorenulls=True).over(w_back).alias("pd"),
        F.first("v", ignorenulls=True).over(w_fwd).alias("nv"),
        F.first(obs_day, ignorenulls=True).over(w_fwd).alias("nd"),
    )
    lerp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        F.datediff("d", "pd").cast("double") / F.datediff("nd", "pd").cast("double")
    )
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(lerp)
    )
    return dense.select(
        F.col("k").alias(key_col),
        F.col("d").alias(date_col),
        filled.alias("value_filled"),
    )


def rolling_median(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[str],
    value_col: str,
    frame_rows: int,
    out_col: str = "med",
) -> DataFrame:
    """Exact median over a trailing ``frame_rows``-row window per key.

    Spark has no exact windowed percentile (approx_percentile is sketch-
    based), but for the bounded frames a robust rolling statistic uses
    (7/30/90 observations) the exact answer is a collect_list + sort_array
    inside the frame — all JVM-side array intrinsics, state bounded by the
    frame length regardless of data volume, one shuffle on ``part_cols``.
    Even-count frames interpolate the two middle values ((a+b)/2, the
    median definition DuckDB/Postgres use), odd frames take the middle
    element exactly; the value is cast to double first so both branches
    are plain IEEE arithmetic any engine reproduces bit-exactly.

    ``order_cols`` must be a total order within each partition or the
    frame contents (hence the median) are partition-order dependent.
    """
    w = (
        W.partitionBy(*part_cols)
        .orderBy(*order_cols)
        .rowsBetween(-(frame_rows - 1), 0)
    )
    arr = F.sort_array(F.collect_list(F.col(value_col).cast("double")).over(w))
    n = F.size(arr)
    lo = F.element_at(arr, F.floor((n + 1) / 2).cast("int"))
    hi = F.element_at(arr, (F.floor(n / 2) + 1).cast("int"))
    return df.withColumn(out_col, (lo + hi) / 2)


def ewma_finite(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.5,
    horizon: int = 10,
    out_col: str = "ewma",
) -> DataFrame:
    """Finite-horizon exponentially weighted moving average per key.

    The classic recursive EWMA (s_t = a*x_t + (1-a)*s_{t-1}) carries an
    unbounded tail; truncating at ``horizon`` lags makes it a fixed linear
    combination of the last ``horizon`` observations —
    sum_j w_j x_{t-j} / sum_j w_j over the lags present, w_j = (1-a)^j —
    which a window expression evaluates in one pass with NO recursion and
    NO state beyond the frame. For a=0.5, h=10 the truncation error is
    < 2^-10 of the weight mass — the smoothing signal a monitoring layer
    wants, at completely deterministic cost.

    Scale shape: one shuffle on ``part_cols``; the frame is O(horizon)
    per row. Weights (1-a)^j are exact powers of two for a=0.5 and the
    weighted sum is evaluated lag-by-lag in fixed order, so IEEE doubles
    agree bit-for-bit with any single-threaded engine evaluating the same
    expression.
    """
    w = W.partitionBy(*part_cols).orderBy(*order_cols)
    v = F.col(value_col).cast("double")
    num = F.lit(0.0)
    den = F.lit(0.0)
    for j in range(horizon):
        lagged = F.lag(v, j).over(w)
        wt = float((1.0 - alpha) ** j)
        num = num + F.coalesce(lagged * wt, F.lit(0.0))
        den = den + F.when(lagged.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
    return df.withColumn(out_col, num / den)
