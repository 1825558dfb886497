"""Financial time-series analytics: the per-ticker insights the reference
delegates to Tableau over the warehouse (README.md:9-10, the AMZN dashboard
image) — daily returns, moving averages, EMA, rolling volatility, VWAP,
cumulative return, max drawdown — as window expressions over the
``openclose`` schema (Ticker, Date, Open/High/Low/Close, Volume).

Everything is a single-shuffle plan: one window partitioned by Ticker,
ordered by Date. No sequential driver loop — EMA, normally a recursion,
is computed closed-form inside ``aggregate`` over a bounded trailing
window's collected values (exact, JVM-side)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def _w(ticker_col: str, date_col: str) -> W:
    return W.partitionBy(ticker_col).orderBy(date_col)


def with_insights(
    df: DataFrame,
    ticker_col: str = "Ticker",
    date_col: str = "Date",
    close_col: str = "Close",
    volume_col: str = "Volume",
    ma_days: int = 20,
    vol_days: int = 20,
    ema_days: int = 12,
) -> DataFrame:
    """Attach the dashboard metric columns in one pass / one shuffle."""
    w = _w(ticker_col, date_col)
    w_ma = w.rowsBetween(-(ma_days - 1), W.currentRow)
    w_vol = w.rowsBetween(-(vol_days - 1), W.currentRow)
    w_ema = w.rowsBetween(-(ema_days * 4 - 1), W.currentRow)  # 4 spans ≈ exact
    w_run = w.rowsBetween(W.unboundedPreceding, W.currentRow)

    close = F.col(close_col)
    prev = F.lag(close_col, 1).over(w)
    ret = (close / prev - 1).alias("daily_return")

    # EMA closed form over the trailing window's values: newest gets weight
    # a, older values decay by (1-a)^age; normalized so a truncated window
    # is still a proper weighted mean. aggregate() keeps it JVM-side.
    a = 2.0 / (ema_days + 1)
    vals = F.collect_list(close).over(w_ema)  # oldest..newest within window
    n = F.size(vals)
    weighted = F.aggregate(
        F.zip_with(
            vals,
            F.transform(F.sequence(F.lit(1), n), lambda i: F.pow(F.lit(1.0 - a), (n - i).cast("double"))),
            lambda v, wgt: v * wgt,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = (F.lit(1.0) - F.pow(F.lit(1.0 - a), n.cast("double"))) / F.lit(a)

    run_max = F.max(close).over(w_run)

    return df.select(
        "*",
        ret,
        F.avg(close).over(w_ma).alias(f"sma_{ma_days}"),
        (weighted / norm).alias(f"ema_{ema_days}"),
        F.stddev_samp(close / prev - 1).over(w_vol).alias(f"volatility_{vol_days}"),
        (
            F.sum(close * F.col(volume_col)).over(w_ma)
            / F.sum(volume_col).over(w_ma)
        ).alias(f"vwap_{ma_days}"),
        (close / F.first(close).over(w_run) - 1).alias("cum_return"),
        (close / run_max - 1).alias("drawdown"),
        F.min(close / run_max - 1).over(w_run).alias("max_drawdown"),
    )


def with_insights_exact(
    df: DataFrame,
    ticker_col: str = "Ticker",
    date_col: str = "Date",
    close_col: str = "Close",
    volume_col: str = "Volume",
    ma_days: int = 20,
) -> DataFrame:
    """The oracle-checkable subset of ``with_insights`` with an exact
    fixed-point interior for every frame sum (functions/deterministic.py):
    daily return, SMA, VWAP, cumulative return, drawdown, max drawdown.

    EMA and rolling volatility stay in ``with_insights`` only — their
    accumulation (pow-weighted sums, Welford variance) is inherently
    order/algorithm-sensitive across engines, so they're pinned by unit
    tests rather than a value-hash oracle. Two projection stages because
    max_drawdown is a window over a window (min of drawdown), which
    neither Spark nor ANSI SQL allows nested in one expression.
    """
    from fortune_500_financial_insights_pipeline_spark.functions.deterministic import SCALE

    w = _w(ticker_col, date_col)
    w_ma = w.rowsBetween(-(ma_days - 1), W.currentRow)
    w_run = w.rowsBetween(W.unboundedPreceding, W.currentRow)

    close = F.col(close_col)
    prev = F.lag(close_col, 1).over(w)
    fixed = lambda c: F.round(c * SCALE).cast("long")  # noqa: E731

    staged = df.select(
        "*",
        (close / prev - 1).alias("daily_return"),
        (
            (F.sum(fixed(close)).over(w_ma).cast("double") / SCALE)
            / F.count(close).over(w_ma)
        ).alias(f"sma_{ma_days}"),
        (
            F.sum(fixed(close * F.col(volume_col))).over(w_ma).cast("double")
            / F.sum(fixed(F.col(volume_col))).over(w_ma).cast("double")
        ).alias(f"vwap_{ma_days}"),
        (close / F.first(close).over(w_run) - 1).alias("cum_return"),
        (close / F.max(close).over(w_run) - 1).alias("drawdown"),
    )
    return staged.select(
        "*", F.min("drawdown").over(w_run).alias("max_drawdown")
    )


def with_indicators_exact(
    df: DataFrame,
    ticker_col: str = "Ticker",
    date_col: str = "Date",
    close_col: str = "Close",
    rsi_days: int = 14,
    bb_days: int = 20,
) -> DataFrame:
    """Technical indicators with exact fixed-point interiors, oracle-
    checkable like ``with_insights_exact``: Cutler's RSI (simple-average
    gains/losses — Wilder's smoothing is a recursion, deliberately not
    used) and Bollinger bands (mid = exact SMA, width = 2× sample stddev
    from exact Σx/Σx² — the two-sums identity instead of Welford, so the
    oracle can replay the arithmetic op-for-op).

    A missing first-row delta contributes 0 to the gain/loss sums (CASE,
    not ``greatest`` — Spark and DuckDB disagree on greatest's NULL
    handling); an all-flat window yields NULL RSI, a one-row window NULL
    bands. Single shuffle: every frame hangs off one (ticker, date)
    window; the window sums and band edges are bound to columns in their
    own projections (SCALE.md "Expression staging") so each is computed
    once however many downstream expressions read it.
    """
    from fortune_500_financial_insights_pipeline_spark.functions.deterministic import SCALE

    w = _w(ticker_col, date_col)
    w_rsi = w.rowsBetween(-(rsi_days - 1), W.currentRow)
    w_bb = w.rowsBetween(-(bb_days - 1), W.currentRow)

    close = F.col(close_col)
    delta = close - F.lag(close_col, 1).over(w)
    fixed = lambda c: F.round(c * SCALE).cast("long")  # noqa: E731

    gain = F.when(delta > 0, delta).otherwise(F.lit(0.0))
    loss = F.when(delta < 0, -delta).otherwise(F.lit(0.0))

    s0 = df.select(
        "*",
        (F.sum(fixed(gain)).over(w_rsi).cast("double") / SCALE).alias("__g"),
        (F.sum(fixed(loss)).over(w_rsi).cast("double") / SCALE).alias("__l"),
        F.count(close).over(w_bb).alias("__n"),
        (F.sum(fixed(close)).over(w_bb).cast("double") / SCALE).alias("__sx"),
        (F.sum(fixed(close * close)).over(w_bb).cast("double") / SCALE).alias("__sx2"),
    )
    g, l, n = F.col("__g"), F.col("__l"), F.col("__n")
    mean = F.col("__sx") / n
    var = F.when(n > 1, (F.col("__sx2") - F.col("__sx") * mean) / (n - 1))
    s1 = s0.select(
        "*",
        F.when(g + l == 0, F.lit(None).cast("double"))
        .otherwise(F.lit(100.0) * g / (g + l))
        .alias(f"rsi_{rsi_days}"),
        mean.alias(f"bb_mid_{bb_days}"),
        F.sqrt(F.when(var < 0, F.lit(0.0)).otherwise(var)).alias("__sd"),
    )
    mid, sd = F.col(f"bb_mid_{bb_days}"), F.col("__sd")
    s2 = s1.select(
        "*",
        (mid + F.lit(2.0) * sd).alias(f"bb_upper_{bb_days}"),
        (mid - F.lit(2.0) * sd).alias(f"bb_lower_{bb_days}"),
    )
    up, lo = F.col(f"bb_upper_{bb_days}"), F.col(f"bb_lower_{bb_days}")
    return s2.select(
        "*",
        F.when(up == lo, F.lit(None).cast("double"))
        .otherwise((close - lo) / (up - lo))
        .alias(f"bb_pctb_{bb_days}"),
    ).drop("__g", "__l", "__n", "__sx", "__sx2", "__sd")
