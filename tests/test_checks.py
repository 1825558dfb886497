"""Data-quality checks + warehouse upsert tests."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark import checks as CK
from fortune_500_financial_insights_pipeline_spark import warehouse as WH
from fortune_500_financial_insights_pipeline_spark.catalog import load_table


def test_checks_single_pass(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    results = {
        r.name: r
        for r in CK.run_checks(
            o,
            CK.not_null("o_orderkey", "o_orderdate"),
            CK.unique_key("o_orderkey"),
            CK.unique_key("o_custkey"),  # NOT unique -> violations
            CK.in_range("o_totalprice", 0.0, 1e9),
            CK.accepted_values("o_orderstatus", ["F", "O", "P"]),
        )
    }
    assert results["not_null(o_orderkey,o_orderdate)"].passed
    assert results["unique(o_orderkey)"].passed
    assert not results["unique(o_custkey)"].passed
    assert results["in_range(o_totalprice,[0.0,1000000000.0])"].passed
    assert results["accepted_values(o_orderstatus)"].passed


def test_checks_detect_planted_violations(spark):
    df = spark.createDataFrame(
        [(1, "x", 5.0), (1, "y", -2.0), (2, None, 3.0)],
        "k long, s string, v double",
    )
    res = {r.name: r.violations for r in CK.run_checks(
        df, CK.not_null("s"), CK.unique_key("k"), CK.in_range("v", 0.0, 10.0)
    )}
    assert res["not_null(s)"] == 1
    assert res["unique(k)"] == 1
    assert res["in_range(v,[0.0,10.0])"] == 1


def test_referential_orphans(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    ok = CK.referential(o, "o_custkey", c, "c_custkey")
    assert ok.passed
    # break it: shift keys out of range
    broken = o.withColumn("o_custkey", F.col("o_custkey") + 10_000_000)
    assert not CK.referential(broken, "o_custkey", c, "c_custkey").passed


def _oc(spark, rows):
    return spark.createDataFrame(
        rows, "Ticker string, Date string, Close double, Volume double"
    ).withColumn("Date", F.to_date("Date"))


def test_upsert_updates_and_inserts(spark, tmp_path):
    base = str(tmp_path / "wh")
    initial = _oc(spark, [
        ("AAPL", "2017-11-09", 175.88, 1.0),
        ("AAPL", "2017-11-10", 174.67, 1.0),
        ("AAPL", "2018-01-02", 43.06, 1.0),
    ])
    WH.write_table(initial, base, "openclose")

    updates = _oc(spark, [
        ("AAPL", "2017-11-10", 999.0, 2.0),   # update existing key
        ("AAPL", "2017-12-01", 171.05, 1.0),  # new key, touched partition
    ])
    WH.upsert_table(spark, base, "openclose", updates, keys=["Ticker", "Date"])

    back = spark.read.parquet(os.path.join(base, "openclose"))
    got = {str(r.Date): r.Close for r in back.collect()}
    assert got["2017-11-10"] == 999.0       # updated row wins
    assert got["2017-11-09"] == 175.88      # untouched same-partition row kept
    assert got["2017-12-01"] == 171.05      # insert landed
    assert got["2018-01-02"] == 43.06       # untouched partition intact
    assert back.count() == 4                # no duplicates
    # unique key constraint holds post-merge (the DDL's UNIQUE(Ticker,Date))
    res = CK.run_checks(back, CK.unique_key("Ticker", "Date"))
    assert res[0].passed
