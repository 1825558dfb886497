"""Property-based tests (SURVEY.md §5.5): Hypothesis-generated OHLCV rows
through the standardize operators — the invariants the reference encodes
silently must hold for ALL inputs, not just the fixture rows."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.operators.standardize import (
    STANDARD_COLUMNS,
    standardize_kaggle,
)

_price = st.floats(min_value=0.01, max_value=1e6, allow_nan=False).map(
    lambda v: f"{round(v, 4)}"
)
_volume = st.one_of(
    st.integers(min_value=0, max_value=10**10).map(str),
    # comma-grouped form the Kaggle feed uses
    st.integers(min_value=1000, max_value=10**10).map(lambda v: f"{v:,}"),
)
_date = st.one_of(
    st.dates().map(lambda d: d.isoformat()),
    st.sampled_from(["not-a-date", "", "2020-13-45", "2020/01/01", "01-02-2020"]),
)

_row = st.tuples(_date, _price, _price, _price, _price, _volume, st.just("0"))


@given(rows=st.lists(_row, min_size=1, max_size=25))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_standardize_invariants(spark, rows):
    df = spark.createDataFrame(
        rows,
        "Date string, Open string, High string, Low string, Close string, "
        "Volume string, OpenInt string",
    ).withColumn("Ticker", F.lit("TST"))
    out = standardize_kaggle(df).collect()

    n_valid = sum(
        1
        for r in rows
        if len(r[0]) == 10 and r[0][4] == "-" and r[0][7] == "-" and _parses(r[0])
    )
    # 1. exactly the ISO-parseable rows survive the quarantine
    assert len(out) == n_valid
    for r in out:
        # 2. no null dates downstream; year column consistent with Date
        assert r["Date"] is not None
        assert r["year"] == r["Date"].year
        # 3. volume always numeric (commas stripped), prices doubles
        assert r["Volume"] is None or isinstance(r["Volume"], float)
        assert isinstance(r["Close"], float)
        # 4. provenance tag constant
        assert r["Source"] == "Kaggle"
    # 5. schema is exactly the standard contract
    if out:
        assert list(out[0].asDict()) == STANDARD_COLUMNS


def _parses(s: str) -> bool:
    import datetime

    try:
        datetime.date.fromisoformat(s)
        return True
    except ValueError:
        return False
