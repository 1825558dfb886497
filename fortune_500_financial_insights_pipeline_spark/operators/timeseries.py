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


def seasonal_decompose(
    series: DataFrame,
    order_col: str,
    value_col: str,
    period: int = 7,
) -> DataFrame:
    """Classical additive seasonal decomposition (the moving-average method
    STL generalizes): value = trend + seasonal + residual, with
    trend = centered ``period``-point moving average, seasonal = the mean
    detrended value per phase (position mod period), centered to sum to
    zero, residual = what's left.  The reference's domain is daily OHLCV
    series with strong weekly structure; this is the decomposition an
    analytics layer runs before anomaly detection or forecasting.

    ``series`` must be ONE row per tick with an integer-valued
    ``value_col`` (aggregate first — e.g. daily order counts).  Only
    interior rows (full centered window) are returned, per the classical
    definition.

    Exactness: the trend rides as the raw window SUM (an exact long);
    detrended values are scaled by ``period`` so they stay integral; the
    per-phase seasonal mean is fixed-pointed at 6dp and centered in
    integer space (subtracting the integer mean of the rounded phase
    values), so every emitted double is one deterministic division of
    exact integers and the whole frame hash-matches a single-threaded
    oracle.

    Scale shape: the only global sort is over the SERIES frame, which is
    aggregate-sized (n_ticks rows — days, not events); the phase means are
    a ``period``-row aggregate broadcast back.  No raw-data shuffle
    happens here.
    """
    if period % 2 == 0 or period < 3:
        raise ValueError("period must be odd and >= 3 (centered window)")
    half = period // 2
    w_ord = W.orderBy(order_col)
    w_frame = w_ord.rowsBetween(-half, half)
    v = F.col(value_col).cast("long")
    base = series.select(
        F.col(order_col),
        v.alias("__v"),
        F.sum(v).over(w_frame).alias("__ts"),
        F.count(v).over(w_frame).alias("__tc"),
        ((F.row_number().over(w_ord) - 1) % period).alias("__ph"),
    )
    interior = base.where(F.col("__tc") == period).select(
        "*", (F.col("__v") * period - F.col("__ts")).alias("__dt")
    )
    seas = interior.groupBy("__ph").agg(
        F.round(
            F.sum("__dt").cast("double") / F.count(F.lit(1)) / period * 1000000
        )
        .cast("long")
        .alias("__s6")
    )
    tot = seas.agg(F.sum("__s6").alias("__tot6"))
    seas_c = seas.crossJoin(F.broadcast(tot)).select(
        "__ph", (F.col("__s6") * period - F.col("__tot6")).alias("__sc6p")
    )
    trend = F.col("__ts").cast("double") / period
    seasonal = F.col("__sc6p").cast("double") / (period * 1000000.0)
    return interior.join(F.broadcast(seas_c), "__ph").select(
        F.col(order_col),
        F.col("__v").alias("value"),
        trend.alias("trend"),
        seasonal.alias("seasonal"),
        (F.col("__v").cast("double") - trend - seasonal).alias("residual"),
    )


def acf_exact(
    series: DataFrame,
    order_col: str,
    value_col: str,
    max_lag: int = 5,
) -> DataFrame:
    """Autocorrelation function r_1..r_max_lag of one integer-valued
    series — the periodicity probe (is there weekly structure? at what
    lag does the signal decay?) run before fixing a seasonal period.

    Exact-integer interior: centering normally divides by n (x_t - S/n);
    scaling the centered series by n instead — c_t = n*x_t - S — keeps it
    integral without changing any correlation RATIO, so numerator
    (sum c_t * c_{t-k}) and denominator (sum c_t^2) are exact long sums
    and each r_k is one deterministic double division.  Uses the textbook
    estimator: lag-k products over the n-k overlapping pairs, denominator
    over all n (so r decays with lag, never exceeds 1).

    Scale shape: one aggregate for (n, S), one window sort over the
    aggregate-sized series frame serving every lag, one final aggregate.
    """
    stats = series.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col(value_col).cast("long")).alias("__S"),
    )
    w = W.orderBy(order_col)
    c = (F.col("__n") * F.col(value_col).cast("long") - F.col("__S")).alias("__c")
    centered = series.crossJoin(F.broadcast(stats)).select(F.col(order_col), c)
    lagged = centered.select(
        "__c", *[F.lag("__c", k).over(w).alias(f"__c{k}") for k in range(1, max_lag + 1)]
    )
    aggs = [F.sum(F.col("__c") * F.col("__c")).alias("__den")] + [
        F.sum(F.col("__c") * F.col(f"__c{k}")).alias(f"__num{k}")
        for k in range(1, max_lag + 1)
    ]
    row = lagged.agg(*aggs)
    stacked = [
        x
        for k in range(1, max_lag + 1)
        for x in (
            F.lit(k),
            F.col(f"__num{k}").cast("double") / F.col("__den").cast("double"),
        )
    ]
    return row.select(
        F.stack(F.lit(max_lag), *stacked).alias("lag_k", "acf")
    )


def cusum_peaks(
    series: DataFrame,
    order_col: str,
    value_col: str,
    top_n: int = 5,
) -> DataFrame:
    """CUSUM mean-shift locator (Page 1954): the running sum of the
    centered series S_t = sum_{u<=t} (x_u - mean) peaks in magnitude AT
    the most likely changepoint — the classic level-shift detector for
    feed drift (a source silently changing volume mid-history).

    Same exact-integer trick as ``acf_exact``: center scaled by n
    (c_t = n*x_t - S), so every running sum is an exact long and the
    top-``top_n`` |S_t| ranking is integer-deterministic (ties break on
    the order column).  Output: (order, cusum) with cusum in the
    n-scaled units — the ARGMAX location is scale-invariant.

    Scale shape: one (n, S) aggregate, one running-sum window over the
    aggregate-sized series frame, then a TakeOrdered top-N — no global
    rank materialization.
    """
    stats = series.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col(value_col).cast("long")).alias("__S"),
    )
    w = W.orderBy(order_col).rowsBetween(W.unboundedPreceding, 0)
    c = F.col("__n") * F.col(value_col).cast("long") - F.col("__S")
    cus = (
        series.crossJoin(F.broadcast(stats))
        .select(F.col(order_col), c.alias("__c"))
        .select(F.col(order_col), F.sum("__c").over(w).alias("cusum"))
    )
    return cus.orderBy(F.abs(F.col("cusum")).desc(), F.col(order_col).asc()).limit(
        top_n
    )


def theil_sen_slope(
    series: DataFrame,
    t_col: str,
    value_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Theil–Sen robust trend estimate: the median of all pairwise slopes
    (v_j − v_i)/(t_j − t_i), i<j — breakdown point 29%, so outlier days
    (feed gaps, flash spikes) cannot drag the trend the way they drag an
    OLS fit (q_regr_agg's family).  One row out: (n_pairs, slope_med).

    O(n²) pairs is deliberate and safe: the input is the aggregate-sized
    SERIES frame (days, not events — callers window it down first), so
    even ten years of daily data is ~6.6M pairs, a map-side flood Spark
    chews through without a shuffle; nothing here scales with raw-data
    volume.  ``t_col`` must be numeric (epoch day).  Each slope is one
    exact-long-over-exact-long division; the median is the exact
    interpolating percentile, rounded like every cross-engine percentile
    in this repo."""
    a = series.select(
        F.col(t_col).cast("long").alias("__t1"),
        F.col(value_col).cast("long").alias("__v1"),
    )
    b = series.select(
        F.col(t_col).cast("long").alias("__t2"),
        F.col(value_col).cast("long").alias("__v2"),
    )
    pairs = a.join(b, F.col("__t2") > F.col("__t1"))
    slope = (F.col("__v2") - F.col("__v1")).cast("double") / (
        F.col("__t2") - F.col("__t1")
    )
    return pairs.select(slope.alias("__s")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.expr("percentile(__s, 0.5)"), round_digits).alias("slope_med"),
    )


def time_weighted_avg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    scale: int = 100,
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """TWAP per key of a piecewise-constant series: each observation's
    value holds until the NEXT observation, so the mean weights values
    by holding duration — Σ v_i·(t_{i+1}−t_i) / (t_n−t_0) — not by row
    count (the row-mean overweights burst periods; TWAP is the execution
    benchmark the reference's finance domain actually quotes).  The
    final observation carries no weight (left-closed convention); keys
    with a single observation drop out (zero total duration).

    Exact: values fixed-pointed at ``scale``, timestamps as epoch-second
    longs, one lead() per row on a single (key, ts, tiebreaks) sort —
    pass ``tiebreak_cols`` (e.g. a unique event id) so the sort is total
    and segment pairing is partition-order independent; the
    numerator and denominator are exact long sums and the TWAP is one
    fixed-order double expression.  One shuffle on the key.
    """
    w = W.partitionBy(key_col).orderBy(ts_col, *tiebreak_cols)
    t = F.col(ts_col).cast("long")
    v = F.round(F.col(value_col).cast("double") * scale).cast("long")
    nxt = F.lead(t).over(w)
    seg = df.select(
        F.col(key_col), v.alias("__v"), (nxt - t).alias("__dur")
    ).where(F.col("__dur").isNotNull())
    return (
        seg.groupBy(key_col)
        .agg(
            F.sum(F.col("__v") * F.col("__dur")).alias("__num"),
            F.sum("__dur").alias("__den"),
        )
        .where(F.col("__den") > 0)
        .select(
            key_col,
            (F.col("__num").cast("double") / F.col("__den") / scale).alias("twap"),
        )
    )


def max_drawdown(
    daily: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Per-key maximum drawdown of a price series: the deepest
    peak-to-trough loss min_t (v_t / max_{s<=t} v_s − 1), plus the peak
    level itself — the risk statistic a finance dashboard quotes next to
    the return number (the reference's Tableau layer shows cumulative
    price charts; drawdown is their worst-case reading).

    Spark shape: ONE shuffle on the key — a running max over the
    (key, order) window (unbounded-preceding frame, single pass), then a
    hash re-aggregate per key.  The running max is exact (no float
    accumulation — max of identically-rounded inputs), and the ratio is
    one fixed-order double division, so results are bit-identical to a
    single-threaded oracle.
    """
    w = (
        W.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    runmax = F.max(F.col(value_col)).over(w)
    dd = F.round(F.col(value_col) / runmax - 1, 6)
    stamped = daily.select(*key_cols, F.col(value_col), dd.alias("__dd"))
    return stamped.groupBy(*key_cols).agg(
        F.min("__dd").alias("max_drawdown"),
        F.round(F.max(value_col), 6).alias("peak"),
    )


def pairwise_covariance(
    returns: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
) -> DataFrame:
    """Covariance matrix of per-key return series as relational algebra:
    series pairs align on the shared time key (inner equi-join on
    ``time_col``, i ≤ j kept), and each pair's covariance comes from
    exact fixed-point moment sums over the COMMON observations —
    cov = Σxy/n − (Σx/n)(Σy/n). The join shuffles on the time key, so
    pair construction is day-bucket-sized, never an all-rows cartesian;
    the output is one row per series pair (k² aggregate rows).
    """
    a = returns.select(
        F.col(key_col).alias("ki"), F.col(time_col).alias("__t"),
        F.col(value_col).alias("__x"),
    )
    b = returns.select(
        F.col(key_col).alias("kj"), F.col(time_col).alias("__t"),
        F.col(value_col).alias("__y"),
    )
    pairs = a.join(b, "__t").where(F.col("ki") <= F.col("kj"))
    from fortune_500_financial_insights_pipeline_spark.functions.deterministic import dsum

    agg = pairs.groupBy("ki", "kj").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("__x").alias("__sx"),
        dsum("__y").alias("__sy"),
        dsum(F.col("__x") * F.col("__y")).alias("__sxy"),
    )
    nn = F.col("n").cast("double")
    cov = F.col("__sxy") / nn - (F.col("__sx") / nn) * (F.col("__sy") / nn)
    return agg.select("ki", "kj", "n", F.round(cov, 6).alias("cov"))


def portfolio_volatility(
    cov_pairs: DataFrame,
    n_assets: int,
) -> DataFrame:
    """Equal-weight portfolio variance/volatility from the i ≤ j
    covariance pair frame: σ²_p = Σ_ij w_i w_j cov_ij with w = 1/k and
    off-diagonal pairs counted twice (the matrix is symmetric but stored
    triangular). The fold runs in fixed point over the k² pair rows —
    aggregate-sized, exact. The number a risk dashboard headline quotes
    from the whole covariance pipeline."""
    from fortune_500_financial_insights_pipeline_spark.functions.deterministic import dsum

    w2 = 1.0 / (n_assets * n_assets)
    mult = F.when(F.col("ki") == F.col("kj"), 1.0).otherwise(2.0)
    agg = cov_pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(dsum(mult * w2 * F.col("cov")), 6).alias("port_var"),
    )
    return agg.select(
        "n_pairs",
        "port_var",
        F.round(F.sqrt(F.col("port_var")), 6).alias("port_vol"),
    )


def risk_adjusted_returns(
    daily: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    periods_per_year: int = 252,
) -> DataFrame:
    """Per-key annualized Sharpe and Sortino ratios from a daily price
    series — the risk-adjusted readout a finance dashboard quotes next to
    max_drawdown (rf = 0: the excess-return baseline is a caller concern).

    Daily simple returns come from one lag window (same single shuffle on
    the key as ``max_drawdown``), rounded to 6dp so both engines aggregate
    identical inputs; Σr and Σr² fold in exact fixed point, and the final
    mean/stddev/ratio arithmetic is a fixed-order double expression shared
    with the oracle SQL — hash-exact despite the sqrt. Sortino uses the
    full-count downside deviation sqrt(Σ min(r,0)² / n) (target = 0),
    the common practitioner form.
    """
    from fortune_500_financial_insights_pipeline_spark.functions.deterministic import dsum

    w = W.partitionBy(*key_cols).orderBy(*order_cols)
    prev = F.lag(F.col(value_col)).over(w)
    r = F.round(F.col(value_col) / prev - 1, 6)
    rets = daily.select(*key_cols, r.alias("__r")).where(F.col("__r").isNotNull())
    neg = F.least(F.col("__r"), F.lit(0.0))
    agg = rets.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_days"),
        dsum("__r").alias("__sr"),
        dsum(F.col("__r") * F.col("__r")).alias("__srr"),
        dsum(neg * neg).alias("__sdd"),
    )
    nn = F.col("n_days").cast("double")
    mean = F.col("__sr") / nn
    # sample variance from exact sums: (n·Σr² − (Σr)²) / (n·(n−1))
    var = (nn * F.col("__srr") - F.col("__sr") * F.col("__sr")) / (nn * (nn - 1))
    ann = F.sqrt(F.lit(float(periods_per_year)))
    sharpe = F.when(var > 0, mean / F.sqrt(var) * ann)
    downside = F.sqrt(F.col("__sdd") / nn)
    sortino = F.when(F.col("__sdd") > 0, mean / downside * ann)
    return agg.select(
        *key_cols,
        "n_days",
        F.round(mean, 6).alias("mean_ret"),
        F.round(sharpe, 6).alias("sharpe"),
        F.round(sortino, 6).alias("sortino"),
    )


def binary_changepoint(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    value_col: str,
    min_seg: int = 5,
) -> DataFrame:
    """Single change-point per series by binary segmentation: the split t
    maximizing the between-segment sum-of-squares gain
    S₁²/n₁ + S₂²/n₂ − S²/n (the first step of the classic binary-seg /
    CUSUM-of-squares family; q_cusum finds level EXCURSIONS, this finds
    the structural BREAK).  One pass of exact fixed-point prefix sums per
    series, one rank to pick the argmax — no per-candidate rescans.
    Ties break to the earliest split.  Splits with fewer than ``min_seg``
    points on either side are ignored.

    Scale: per-series window prefix sums — one shuffle on the group key;
    series length is the per-partition cost, not the corpus."""
    from fortune_500_financial_insights_pipeline_spark.functions.deterministic import dsum_w

    wo = W.partitionBy(*group_cols).orderBy(order_col)
    wall = W.partitionBy(*group_cols)
    p = df.select(
        *group_cols,
        F.col(order_col).alias("__o"),
        F.row_number().over(wo).alias("__rn"),
        dsum_w(value_col, wo.rowsBetween(W.unboundedPreceding, 0)).alias("__s1"),
        F.count(F.lit(1)).over(wall).alias("__n"),
        dsum_w(value_col, wall.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)).alias("__s"),
    )
    n1 = F.col("__rn").cast("double")
    n2 = (F.col("__n") - F.col("__rn")).cast("double")
    s1, s = F.col("__s1"), F.col("__s")
    s2 = s - s1
    gain = s1 * s1 / n1 + s2 * s2 / n2 - s * s / F.col("__n").cast("double")
    cand = p.where(
        (F.col("__rn") >= min_seg) & (F.col("__rn") <= F.col("__n") - min_seg)
    ).withColumn("__gain", gain)
    wr = W.partitionBy(*group_cols).orderBy(F.desc("__gain"), F.asc("__o"))
    return (
        cand.withColumn("__rk", F.row_number().over(wr))
        .where(F.col("__rk") == 1)
        .select(
            *group_cols,
            F.col("__o").alias("break_after"),
            F.col("__rn").cast("long").alias("n_before"),
            (F.col("__n") - F.col("__rn")).cast("long").alias("n_after"),
            F.round(s1 / n1, 6).alias("mean_before"),
            F.round(s2 / n2, 6).alias("mean_after"),
            F.round(F.col("__gain"), 6).alias("ss_gain"),
        )
    )


def holt_linear(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.25,
    horizon: int = 3,
) -> DataFrame:
    """Holt's linear-trend exponential smoothing per series, as an exact
    array fold: level/trend start at (x₀, x₁−x₀) and every update rounds
    to 1e-6 — l' = R(αx + (1−α)(l+b)), b' = R(β(l'−l) + (1−β)b) — so the
    recursion is reproducible bit-for-bit against a single-threaded
    recursive-CTE oracle (the same trick as the packing/k-means folds).
    Returns the final state and the h-step-ahead forecast l + h·b.

    Scale: one collect_list per series (state is 2 doubles; the array is
    the series, so this is for bounded-length series — for unbounded
    streams the streaming twin keeps (l, b) in applyInPandasWithState)."""
    arr = (
        df.groupBy(*group_cols)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(order_col).alias("o"), F.col(value_col).alias("x")))
            ).alias("__sv")
        )
        .withColumn("__xs", F.expr("transform(__sv, s -> s.x)"))
        .where(F.size("__xs") >= 2)
    )
    a, b = float(alpha), float(beta)
    fold = F.expr(
        f"""aggregate(
              slice(__xs, 3, size(__xs) - 2),
              named_struct('l', CAST(__xs[0] AS DOUBLE),
                           'b', CAST(round((__xs[1] - __xs[0]) * 1000000) AS DOUBLE) / 1000000,
                           'n', 2),
              (acc, x) -> named_struct(
                  'l', CAST(round(({a} * x + (1 - {a}) * (acc.l + acc.b)) * 1000000) AS DOUBLE) / 1000000,
                  'b', CAST(round(({b} * ((CAST(round(({a} * x + (1 - {a}) * (acc.l + acc.b)) * 1000000) AS DOUBLE) / 1000000) - acc.l) + (1 - {b}) * acc.b) * 1000000) AS DOUBLE) / 1000000,
                  'n', acc.n + 1))"""
    )
    # seed state consumes __xs[0], __xs[1]; the fold starts at element 3 (1-based
    # slice) exactly like the oracle CTE starting its recursion at rn = 3
    out = arr.withColumn("__st", fold)
    lvl, tr = F.col("__st.l"), F.col("__st.b")
    return out.select(
        *group_cols,
        F.col("__st.n").cast("long").alias("n_obs"),
        F.round(lvl, 6).alias("level"),
        F.round(tr, 6).alias("trend"),
        F.round(lvl + float(horizon) * tr, 6).alias(f"forecast_h{horizon}"),
    )


def croston(
    df: DataFrame,
    group_cols: list[str],
    day_col: str,
    size_col: str,
    alpha: float = 0.1,
) -> DataFrame:
    """Croston's intermittent-demand method per series: separate EWMAs of
    the nonzero demand SIZES and the INTER-DEMAND intervals, forecast
    rate = z/p per day — the estimator q_demand_classes routes lumpy/
    intermittent parts to (smooth ones go to q_ewma/q_holt).  Exact
    per-step-rounded folds (init z=x₁, p=i₂; updates from the 3rd
    event), so a recursive-CTE oracle replays it bit for bit.  Input
    rows are the demand OCCURRENCES (zero days absent by construction).

    Scale: one collect_list per series of (day, size) pairs — the
    occurrence list of an intermittent item is small by definition."""
    arr = (
        df.groupBy(*group_cols)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(day_col).alias("d"), F.col(size_col).alias("x")))
            ).alias("__sv")
        )
        .where(F.size("__sv") >= 2)
    )
    a = float(alpha)
    # guard: sequence(3, 2) DESCENDS in Spark (default step -1), so a
    # 2-event series must fold over an empty array, not [3, 2]
    fold = F.expr(
        f"""aggregate(
              CASE WHEN size(__sv) < 3 THEN CAST(array() AS array<int>)
                   ELSE sequence(3, size(__sv)) END,
              named_struct(
                'z', CAST(element_at(__sv, 1).x AS DOUBLE),
                'p', CAST(datediff(to_date(element_at(__sv, 2).d),
                                   to_date(element_at(__sv, 1).d)) AS DOUBLE)),
              (acc, t) -> named_struct(
                'z', CAST(round(({a} * element_at(__sv, t).x + (1 - {a}) * acc.z) * 1000000) AS DOUBLE) / 1000000,
                'p', CAST(round(({a} * datediff(to_date(element_at(__sv, t).d),
                                                to_date(element_at(__sv, t - 1).d))
                                 + (1 - {a}) * acc.p) * 1000000) AS DOUBLE) / 1000000))"""
    )
    out = arr.withColumn("__st", fold)
    return out.select(
        *group_cols,
        F.size("__sv").cast("long").alias("n_events"),
        F.round(F.col("__st.z"), 6).alias("size_est"),
        F.round(F.col("__st.p"), 6).alias("interval_est"),
        F.round(F.col("__st.z") / F.col("__st.p"), 6).alias("demand_rate"),
    )


def holt_winters_additive(
    df: DataFrame,
    order_col: str,
    value_col: str,
    period: int = 7,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
) -> DataFrame:
    """Additive Holt-Winters (level + trend + rotating seasonal queue) as
    ONE exact array fold: the seasonal state is a ``period``-long queue
    (head = the index due NOW), every update rounds to 1e-6, so the
    triple recursion l/b/s is replayable bit-for-bit by a recursive-CTE
    oracle carrying a LIST column.  Init: l₀ = mean of cycle 1, b₀ =
    (mean cycle 2 − mean cycle 1)/period, s = first-cycle deviations;
    the fold starts at t = period+1.  Returns final state + the 1-step
    forecast l + b + s_head.

    Scale note: the fold is a single-series reduction — at 100 TB this
    runs per KEY after a groupBy (state = period+2 doubles), exactly the
    shape applyInPandasWithState keeps for the streaming twin."""
    arr = df.groupBy().agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(order_col).alias("o"), F.col(value_col).alias("x")))
        ).alias("__sv")
    ).withColumn("__xs", F.expr("transform(__sv, s -> s.x)")).where(
        F.size("__xs") >= 2 * period + 1
    )
    a, b_, g, m = float(alpha), float(beta), float(gamma), int(period)
    # cycle means from EXACT integer micro-unit sums (a float fold's
    # addition order would differ cross-engine at the last ulp)
    init = (
        f"CAST(round(CAST(aggregate(slice(__xs, 1, {m}), CAST(0 AS BIGINT),"
        f" (acc, v) -> acc + CAST(round(v * 1000000) AS BIGINT)) AS DOUBLE)"
        f" / {m}) AS DOUBLE) / 1000000"
    )
    init2 = (
        f"CAST(round(CAST(aggregate(slice(__xs, {m + 1}, {m}), CAST(0 AS BIGINT),"
        f" (acc, v) -> acc + CAST(round(v * 1000000) AS BIGINT)) AS DOUBLE)"
        f" / {m}) AS DOUBLE) / 1000000"
    )
    fold = F.expr(
        f"""aggregate(
              sequence({m} + 1, size(__xs)),
              named_struct(
                'l', {init},
                'b', CAST(round(({init2} - {init}) / {m} * 1000000) AS DOUBLE) / 1000000,
                's', transform(slice(__xs, 1, {m}),
                               v -> CAST(round((v - {init}) * 1000000) AS DOUBLE) / 1000000),
                'n', {m}),
              (acc, t) -> named_struct(
                'l', CAST(round(({a} * (element_at(__xs, t) - element_at(acc.s, 1))
                                 + (1 - {a}) * (acc.l + acc.b)) * 1000000) AS DOUBLE) / 1000000,
                'b', CAST(round(({b_} * ((CAST(round(({a} * (element_at(__xs, t) - element_at(acc.s, 1))
                                 + (1 - {a}) * (acc.l + acc.b)) * 1000000) AS DOUBLE) / 1000000) - acc.l)
                                 + (1 - {b_}) * acc.b) * 1000000) AS DOUBLE) / 1000000,
                's', concat(slice(acc.s, 2, {m} - 1),
                            array(CAST(round(({g} * (element_at(__xs, t)
                                 - (CAST(round(({a} * (element_at(__xs, t) - element_at(acc.s, 1))
                                 + (1 - {a}) * (acc.l + acc.b)) * 1000000) AS DOUBLE) / 1000000))
                                 + (1 - {g}) * element_at(acc.s, 1)) * 1000000) AS DOUBLE) / 1000000)),
                'n', acc.n + 1))"""
    )
    out = arr.withColumn("__st", fold)
    return out.select(
        F.col("__st.n").cast("long").alias("n_obs"),
        F.round(F.col("__st.l"), 6).alias("level"),
        F.round(F.col("__st.b"), 6).alias("trend"),
        F.round(F.expr("element_at(__st.s, 1)"), 6).alias("season_next"),
        F.round(
            F.col("__st.l") + F.col("__st.b") + F.expr("element_at(__st.s, 1)"), 6
        ).alias("forecast_next"),
    )
