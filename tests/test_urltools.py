"""URL canonicalization tests: each rule independently, plus the dedup
collapse semantics of the fixture key."""

from __future__ import annotations

from fortune_500_financial_insights_pipeline_spark.operators.urltools import (
    canonicalize_url,
    url_host,
)


def _canon(spark, url):
    df = spark.createDataFrame([(url,)], "u string")
    return df.select(canonicalize_url("u").alias("c")).head().c


def test_rules_individually(spark):
    # case + default port + fragment
    assert (
        _canon(spark, "HTTP://WWW.Foo.COM:80/A/b#frag")
        == "http://www.foo.com/A/b"
    )
    # path case preserved; https 443 strip; non-default port kept
    assert _canon(spark, "https://x.com:443/P") == "https://x.com/P"
    assert _canon(spark, "https://x.com:8443/P") == "https://x.com:8443/P"
    # empty path -> /
    assert _canon(spark, "http://x.com") == "http://x.com/"
    # tracking strip + byte-sorted params
    assert (
        _canon(spark, "http://x.com/p?z=1&utm_source=a&a=2&fbclid=q&ref=h")
        == "http://x.com/p?a=2&z=1"
    )
    # all params tracking -> no query at all
    assert _canon(spark, "http://x.com/p?utm_a=1&gclid=2") == "http://x.com/p"


def test_url_host(spark):
    df = spark.createDataFrame(
        [("https://Sub.Ex.COM:8443/a?b=1",)], "u string"
    )
    assert df.select(url_host("u").alias("h")).head().h == "sub.ex.com"


def test_fixture_collapse_semantics(spark):
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_url_canonical_dedup"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_n = {}
    for r in rows:
        by_n.setdefault(r.n_raw, 0)
        by_n[r.n_raw] += 1
    # 200 docs -> 200 collapsed triples + 200 singletons
    assert by_n == {3: 200, 1: 200}
    assert all(r.host.startswith("example") for r in rows)
