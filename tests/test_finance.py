"""Finance insight metrics vs hand-computed / pandas-computed answers."""

from __future__ import annotations

import pandas as pd
import pytest

from fortune_500_financial_insights_pipeline_spark.functions.finance import with_insights

CLOSES = [100.0, 110.0, 99.0, 104.5, 99.275]
VOLUMES = [10.0, 20.0, 30.0, 20.0, 20.0]


@pytest.fixture(scope="module")
def insights(spark):
    rows = [
        ("T", f"2024-01-0{i+1}", c, v)
        for i, (c, v) in enumerate(zip(CLOSES, VOLUMES))
    ] + [("U", "2024-01-01", 50.0, 5.0)]  # second ticker: windows must not leak
    df = spark.createDataFrame(rows, "Ticker string, Date string, Close double, Volume double")
    out = with_insights(df, ma_days=3, vol_days=3, ema_days=2)
    return {(r.Ticker, r.Date): r for r in out.collect()}


def test_daily_returns(insights):
    assert insights[("T", "2024-01-01")].daily_return is None
    assert insights[("T", "2024-01-02")].daily_return == pytest.approx(0.10)
    assert insights[("T", "2024-01-03")].daily_return == pytest.approx(-0.10)
    # ticker boundary: U's first row has no previous close
    assert insights[("U", "2024-01-01")].daily_return is None


def test_sma_and_vwap(insights):
    assert insights[("T", "2024-01-03")].sma_3 == pytest.approx(103.0)
    assert insights[("T", "2024-01-05")].sma_3 == pytest.approx((99.0 + 104.5 + 99.275) / 3)
    vwap3 = (100 * 10 + 110 * 20 + 99 * 30) / 60
    assert insights[("T", "2024-01-03")].vwap_3 == pytest.approx(vwap3)


def test_ema_matches_pandas_ewm(insights):
    want = pd.Series(CLOSES).ewm(span=2, adjust=True).mean()
    for i in range(5):
        got = insights[("T", f"2024-01-0{i+1}")].ema_2
        assert got == pytest.approx(want.iloc[i], rel=1e-9), i


def test_volatility(insights):
    # trailing-3 sample stddev of returns [0.10, -0.10] at day 3
    import statistics

    want = statistics.stdev([0.10, -0.10])
    assert insights[("T", "2024-01-03")].volatility_3 == pytest.approx(want)
    assert insights[("T", "2024-01-01")].volatility_3 is None  # <2 samples


def test_cumulative_and_drawdown(insights):
    r5 = insights[("T", "2024-01-05")]
    assert r5.cum_return == pytest.approx(99.275 / 100.0 - 1)
    # running max is 110 from day 2 on; worst drop is day 3's 99
    assert insights[("T", "2024-01-03")].drawdown == pytest.approx(99.0 / 110.0 - 1)
    assert r5.max_drawdown == pytest.approx(99.0 / 110.0 - 1)
    # second ticker unaffected by T's history
    u = insights[("U", "2024-01-01")]
    assert u.cum_return == pytest.approx(0.0)
    assert u.max_drawdown == pytest.approx(0.0)


def test_single_shuffle_plan(spark):
    """All metrics share one window family: exactly one hash exchange."""
    import re

    df = spark.createDataFrame(
        [("T", "2024-01-01", 1.0, 1.0)],
        "Ticker string, Date string, Close double, Volume double",
    )
    plan = with_insights(df)._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_indicators_bounds(spark, sf_dir):
    """RSI stays in [0,100]; band edges bracket the mid symmetrically."""
    from pyspark.sql import functions as F
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    out = QUERIES["q_tech_indicators"](spark, sf_dir).cache()
    try:
        assert out.count() > 0
        bad_rsi = out.filter((F.col("rsi_5") < 0) | (F.col("rsi_5") > 100))
        assert bad_rsi.count() == 0
        bad_band = out.filter(
            (F.col("bb_upper_5") < F.col("bb_mid_5"))
            | (F.col("bb_lower_5") > F.col("bb_mid_5"))
        )
        assert bad_band.count() == 0
        # %B is defined exactly when the band has width
        assert out.filter(
            F.col("bb_pctb_5").isNull() & (F.col("bb_upper_5") != F.col("bb_lower_5"))
        ).count() == 0
    finally:
        out.unpersist()
