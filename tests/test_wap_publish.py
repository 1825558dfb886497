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


def test_wap_version_claim_skips_foreign_claims(spark, tmp_path):
    """Round-4 advisor fix: version allocation is an atomic mkdir claim —
    a directory another (possibly crashed) publisher already claimed is
    skipped, never written into, and never silently published."""
    import os

    base = str(tmp_path)
    df = spark.createDataFrame([(1,)], "x long")
    wap_publish(df, base, "t")  # v=1 live
    # simulate a concurrent publisher's claim on v=2
    os.mkdir(os.path.join(base, "t", "v=2"))
    stage = wap_publish(df, base, "t")
    assert stage.endswith("v=3")
    assert wap_current(spark, base, "t").count() == 1
    # the foreign claim stayed empty and unpublished
    assert os.listdir(os.path.join(base, "t", "v=2")) == []


def test_wap_pointer_is_forward_only(spark, tmp_path):
    """A slow publisher finishing after a newer version went live must
    not regress the _CURRENT pointer."""
    import os

    base = str(tmp_path)
    df1 = spark.createDataFrame([(1,)], "x long")
    wap_publish(df1, base, "t")
    ptr = os.path.join(base, "t", "_CURRENT")
    # pretend a newer publisher already flipped to version 9 (its staging
    # dir lives elsewhere in this simulation — only the pointer matters)
    with open(ptr, "w") as f:
        f.write("9")
    stage = wap_publish(df1, base, "t")  # claims v=2 — BELOW the live 9
    assert stage.endswith("v=2")
    with open(ptr) as f:
        assert int(f.read().strip()) == 9, "pointer must never regress"
