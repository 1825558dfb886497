"""Local mini-driver: run a registered query on Spark and its oracle on
DuckDB, and compare the results the way the external driver does —
row count, column names (sorted), and order-insensitive values.

Used by tests/test_oracle_parity.py; strict by default (exact equality,
including floats — the exact-decimal aggregation discipline makes that
attainable)."""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb
import pandas as pd

from fortune_500_financial_insights_pipeline_spark.catalog import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con.execute(sql).df()
    finally:
        con.close()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, Decimal):
        return ("dec", str(v))
    if isinstance(v, pd.Timestamp):
        return ("ts", v.to_pydatetime().replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("ts", datetime.datetime(v.year, v.month, v.day).isoformat())
    if isinstance(v, (bool,)):
        return ("b", v)
    if isinstance(v, (int,)):
        return ("i", int(v))
    if isinstance(v, float):
        return ("f", v)
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_norm_cell(x) for x in v))
    return v


def _normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_norm_cell(v) for v in row))
    out.sort(key=repr)
    return out


def compare_frames(spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}"
        )
        return problems
    if len(spark_df) != len(oracle_df):
        problems.append(f"row count differs: spark={len(spark_df)} oracle={len(oracle_df)}")
    a = _normalize(spark_df)
    b = _normalize(oracle_df)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y]
        sample = diffs[:3] if diffs else [(a[:1], b[:1])]
        problems.append(f"values differ ({len(diffs)} sorted-row mismatches); sample: {sample}")
    return problems
