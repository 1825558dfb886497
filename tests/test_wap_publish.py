"""Write-audit-publish (warehouse.wap_publish / wap_current): audit gate,
atomic pointer swap, failed-load isolation."""

from __future__ import annotations

import os

import pytest

from fortune_500_financial_insights_pipeline_spark.checks import not_null, unique_key
from fortune_500_financial_insights_pipeline_spark.warehouse import wap_current, wap_publish


def test_publish_then_read_roundtrip(spark, tmp_path):
    base = str(tmp_path)
    df = spark.createDataFrame(
        [("AAPL", "2024-01-02", 185.5), ("MSFT", "2024-01-02", 375.1)],
        "Ticker string, Date string, Close double",
    )
    path = wap_publish(
        df, base, "prices", audits=[not_null("Ticker", "Date"), unique_key("Ticker", "Date")]
    )
    assert os.path.isdir(path)
    got = wap_current(spark, base, "prices")
    assert got.count() == 2
    assert sorted(r.Ticker for r in got.collect()) == ["AAPL", "MSFT"]


def test_failed_audit_keeps_previous_version_live(spark, tmp_path):
    base = str(tmp_path)
    good = spark.createDataFrame(
        [("AAPL", "2024-01-02", 185.5)], "Ticker string, Date string, Close double"
    )
    wap_publish(good, base, "prices", audits=[not_null("Ticker")])
    bad = spark.createDataFrame(
        [("AAPL", "2024-01-03", 186.0), (None, "2024-01-03", 1.0)],
        "Ticker string, Date string, Close double",
    )
    with pytest.raises(ValueError, match="audit failed"):
        wap_publish(bad, base, "prices", audits=[not_null("Ticker")])
    # readers still see version 1, untouched
    got = wap_current(spark, base, "prices").collect()
    assert len(got) == 1 and got[0].Date == "2024-01-02"
    # the rejected staging dir is kept for inspection but not live
    assert os.path.isdir(os.path.join(base, "prices", "v=2"))
    with open(os.path.join(base, "prices", "_CURRENT")) as f:
        assert f.read().strip() == "1"


def test_republish_advances_version_atomically(spark, tmp_path):
    base = str(tmp_path)
    v1 = spark.createDataFrame([("A", 1)], "k string, v int")
    v2 = spark.createDataFrame([("A", 1), ("B", 2)], "k string, v int")
    wap_publish(v1, base, "t")
    wap_publish(v2, base, "t")
    assert wap_current(spark, base, "t").count() == 2
    # both versions exist on disk; pointer names the latest
    assert os.path.isdir(os.path.join(base, "t", "v=1"))
    with open(os.path.join(base, "t", "_CURRENT")) as f:
        assert f.read().strip() == "2"
