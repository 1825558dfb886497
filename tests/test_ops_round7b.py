"""Round-7b: WARC (ISO 28500) container parsing — framing, gzip member
walk, HTTP split, the Spark record explode, and the corrupt-payload
ValueError discipline (the fuzz gate covers truncation/flips; these pin
the semantic shapes)."""

from __future__ import annotations

import pytest

from fortune_500_financial_insights_pipeline_spark.operators.warc import (
    http_response_payload,
    http_split,
    warc_build,
    warc_build_record,
    warc_parse,
    warc_records,
)

HTML = b"<html><body><p>hello crawl world</p></body></html>"


def _archive(gz: bool) -> bytes:
    return warc_build(
        [
            warc_build_record(
                "warcinfo", b"software: synthetic\r\n",
                content_type="application/warc-fields",
            ),
            warc_build_record(
                "response", http_response_payload(HTML),
                target_uri="http://example.com/a",
                content_type="application/http;msgtype=response",
            ),
            warc_build_record(
                "metadata", b"fetchTimeMs: 12\r\n",
                target_uri="http://example.com/a",
            ),
        ],
        gzip_members=gz,
    )


@pytest.mark.parametrize("gz", [False, True])
def test_warc_roundtrip_plain_and_gzip_members(gz):
    recs = warc_parse(_archive(gz))
    assert [r["warc_type"] for r in recs] == ["warcinfo", "response", "metadata"]
    assert recs[1]["http_status"] == 200
    assert recs[1]["body"] == HTML
    assert recs[1]["target_uri"] == "http://example.com/a"
    assert recs[0]["http_status"] is None  # warc-fields block is not HTTP
    assert recs[0]["body"] == b"software: synthetic\r\n"


def test_warc_gzip_members_are_individually_framed():
    """Each record must be its own gzip member (the splittability
    property Common Crawl relies on): decompressing the SECOND member
    alone must yield a full record."""
    import zlib

    data = _archive(True)
    do = zlib.decompressobj(16 + zlib.MAX_WBITS)
    do.decompress(data)
    second = do.unused_data
    assert second[:2] == b"\x1f\x8b"  # another member follows
    recs = warc_parse(second)  # parse from the member boundary
    assert [r["warc_type"] for r in recs] == ["response", "metadata"]


def test_warc_corrupt_shapes_fail_closed():
    good = _archive(False)
    bad_cases = [
        b"",  # empty
        b"HTTP/1.1 200 OK\r\n\r\n",  # not WARC
        good.replace(b"Content-Length", b"Content-Lxngth", 1),  # missing length
        good.replace(b"WARC/1.0", b"WARC/9.9", 1),  # unsupported version
        good[:-2],  # clipped terminator
    ]
    for bad in bad_cases:
        with pytest.raises(ValueError):
            warc_parse(bad)
    # oversized Content-Length must bound-check, not allocate/overrun
    evil = warc_build_record("response", b"xy")
    evil = evil.replace(b"Content-Length: 2", b"Content-Length: 99999999")
    with pytest.raises(ValueError, match="Content-Length|truncated"):
        warc_parse(evil)


def test_http_split_contract():
    status, body = http_split(http_response_payload(b"abc", status=404))
    assert (status, body) == (404, b"abc")
    assert http_split(b"not http") == (None, b"not http")
    with pytest.raises(ValueError):
        http_split(b"HTTP/1.1 OK no status here\r\n\r\n")
    with pytest.raises(ValueError):
        http_split(b"HTTP/1.1 200 OK\r\nno terminator")


def test_warc_records_spark_explode(spark):
    df = spark.createDataFrame(
        [(1, bytearray(_archive(True))), (2, bytearray(_archive(False)))],
        "doc_id long, warc binary",
    )
    rows = warc_records(df).orderBy("doc_id", "rec_idx").collect()
    assert len(rows) == 6
    assert [r["warc_type"] for r in rows[:3]] == [
        "warcinfo", "response", "metadata",
    ]
    resp = [r for r in rows if r["warc_type"] == "response"]
    assert all(r["http_status"] == 200 for r in resp)
    assert all(bytes(r["body"]) == HTML for r in resp)


def test_warc_stream_equals_batch(spark, tmp_path):
    """Streaming ingestion (binaryFile source -> warc_record_stream) must
    yield exactly the batch parse of the same archives, including across
    a second micro-batch when a new archive lands."""
    import glob as globmod

    from pyspark.sql import functions as F

    from fortune_500_financial_insights_pipeline_spark.streaming.warc_ingest import (
        warc_archive_stream,
        warc_record_stream,
        warc_response_stream,
    )

    src = tmp_path / "crawl"
    src.mkdir()
    (src / "a.warc.gz").write_bytes(_archive(True))

    got: list[tuple] = []

    def emit(df, batch_id):
        for r in df.collect():
            got.append(
                (r["warc_type"], r["http_status"],
                 bytes(r["body"]) if r["body"] is not None else None)
            )

    stream = warc_archive_stream(spark, str(src))
    q = (
        warc_record_stream(stream)
        .writeStream.foreachBatch(emit)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    (src / "b.warc.gz").write_bytes(_archive(True))
    q.processAllAvailable()
    q.stop()

    # batch twin over the same files
    batch = spark.read.format("binaryFile").load(str(src)).select(
        F.abs(F.xxhash64("path")).alias("doc_id"),
        F.col("content").alias("warc"),
    )
    from fortune_500_financial_insights_pipeline_spark.operators.warc import warc_records

    want = [
        (r["warc_type"], r["http_status"],
         bytes(r["body"]) if r["body"] is not None else None)
        for r in warc_records(batch).collect()
    ]
    assert sorted(got, key=repr) == sorted(want, key=repr)
    assert len(got) == 6  # 2 archives x 3 records
    assert len(globmod.glob(str(src / "*.warc.gz"))) == 2

    # the curation-facing projection decodes response bodies to text
    resp = warc_response_stream(
        spark.read.format("binaryFile").load(str(src)).select(
            F.abs(F.xxhash64("path")).alias("doc_id"),
            F.col("content").alias("warc"),
        )
    ).collect()
    assert len(resp) == 2
    assert all("hello crawl world" in r["text"] for r in resp)
    assert all(r["http_status"] == 200 for r in resp)


def test_robots_parser_groups_and_scope():
    """Group selection (badbot rules don't leak into *), empty Disallow
    matches nothing, comments/unknown directives skipped, wildcard
    patterns kept verbatim for regex translation."""
    from fortune_500_financial_insights_pipeline_spark.operators.robots import parse_robots_txt

    txt = (
        "# politeness\n"
        "User-agent: badbot\nDisallow: /\n\n"
        "User-agent: *\nUser-agent: trainingbot\n"
        "Disallow: /path/\nAllow: /path/2\nDisallow:\nCrawl-delay: 10\n"
    )
    assert parse_robots_txt(txt) == [("disallow", "/path/"), ("allow", "/path/2")]
    assert parse_robots_txt(txt, "trainingbot") == [
        ("disallow", "/path/"), ("allow", "/path/2"),
    ]
    assert parse_robots_txt(txt, "badbot") == [("disallow", "/")]
    # wildcard patterns are in scope since round 8 (RFC 9309 §2.2.3)
    assert parse_robots_txt("User-agent: *\nDisallow: /a/*/b\n") == [
        ("disallow", "/a/*/b"),
    ]
    with pytest.raises(ValueError, match="malformed"):
        parse_robots_txt("User-agent *\n")


def test_robots_parser_star_fallback_and_group_integrity():
    """RFC 9309 §2.2.1: a named agent with no matching group falls back
    to the '*' group (was ADVICE r7 medium: the gate silently failed
    OPEN for named crawlers); §2.2.4: a non-group record between two
    User-agent lines must not split the header (was ADVICE r7 low)."""
    from fortune_500_financial_insights_pipeline_spark.operators.robots import parse_robots_txt

    star_only = "User-agent: *\nDisallow: /private/\n"
    assert parse_robots_txt(star_only, "trainingbot") == [
        ("disallow", "/private/"),
    ]
    # named group exists -> '*' group must NOT be unioned in
    both = (
        "User-agent: trainingbot\nDisallow: /tb/\n\n"
        "User-agent: *\nDisallow: /private/\n"
    )
    assert parse_robots_txt(both, "trainingbot") == [("disallow", "/tb/")]
    assert parse_robots_txt(both) == [("disallow", "/private/")]
    # Sitemap between two User-agent lines: one header, both agents
    # share the rules (a Disallow-then-User-agent DOES open a new group)
    split = (
        "User-agent: a\nSitemap: http://x.com/s.xml\nUser-agent: b\n"
        "Disallow: /\n"
    )
    assert parse_robots_txt(split, "a") == [("disallow", "/")]
    assert parse_robots_txt(split, "b") == [("disallow", "/")]
    # multiple groups naming the same agent: rules union (RFC: groups
    # targeting the same agent are combined)
    multi = (
        "User-agent: a\nDisallow: /one/\n\n"
        "User-agent: a\nDisallow: /two/\n"
    )
    assert parse_robots_txt(multi, "a") == [
        ("disallow", "/one/"), ("disallow", "/two/"),
    ]


def test_robots_pattern_regex_translation():
    from fortune_500_financial_insights_pipeline_spark.operators.robots import pattern_regex

    assert pattern_regex("/plain/prefix") is None  # startswith fast path
    assert pattern_regex("/a/*/b") == "^/a/.*/b"
    assert pattern_regex("/x$") == "^/x$"
    assert pattern_regex("/*.gif$") == r"^/.*\.gif$"
    # '$' not at the end is a literal octet
    assert pattern_regex("/pa$th*") == r"^/pa\$th.*"


def test_robots_gate_wildcards(spark):
    """'*' and '$' rules evaluate through the pre-translated regex
    column; priority stays raw-pattern length (longest wins)."""
    from fortune_500_financial_insights_pipeline_spark.operators.robots import (
        robots_gate,
        robots_rules,
    )

    robots = spark.createDataFrame(
        [(
            "a.com",
            # block any URL with a query string, any .gif, and exactly
            # /cart; a longer wildcard Allow re-opens /search?safe=
            "User-agent: *\nDisallow: /*?\nAllow: /search?safe=*\n"
            "Disallow: /*.gif$\nDisallow: /cart$\n",
        )],
        "host string, robots_txt string",
    )
    rules = robots_rules(robots)
    urls = spark.createDataFrame(
        [
            (1, "http://a.com/page?x=1"),        # /*? -> blocked
            (2, "http://a.com/search?safe=on"),  # longer Allow wins
            (3, "http://a.com/img/pic.gif"),     # $-anchored -> blocked
            (4, "http://a.com/img/pic.gif2"),    # not at end -> allowed
            (5, "http://a.com/cart"),            # exact $ -> blocked
            (6, "http://a.com/cart/extra"),      # $ means no prefix match
            (7, "http://a.com/plain"),           # nothing matches
        ],
        "id long, url string",
    )
    got = {r["id"]: r["allowed"] for r in robots_gate(urls, rules).collect()}
    assert got == {
        1: False, 2: True, 3: False, 4: True, 5: False, 6: True, 7: True,
    }


def test_robots_rules_quarantines_malformed_host(spark):
    """A host whose robots.txt fails to parse becomes ONE synthetic
    disallow-all rule flagged quarantined=true (fail closed per host,
    never job-fatal — r7 verdict item 2); healthy hosts are untouched
    and the gate surfaces the audit column."""
    from fortune_500_financial_insights_pipeline_spark.operators.robots import (
        robots_gate,
        robots_rules,
    )

    robots = spark.createDataFrame(
        [
            ("good.com", "User-agent: *\nDisallow: /x/\n"),
            ("bad.com", "User-agent *\nthis line has no colon either\n"),
        ],
        "host string, robots_txt string",
    )
    rules = robots_rules(robots)
    rows = {(r["host"], r["rule_type"], r["path_prefix"]): r["quarantined"]
            for r in rules.collect()}
    assert rows == {
        ("good.com", "disallow", "/x/"): False,
        ("bad.com", "disallow", "/"): True,
    }
    urls = spark.createDataFrame(
        [
            (1, "http://good.com/x/deep"),
            (2, "http://good.com/ok"),
            (3, "http://bad.com/anything"),
            (4, "http://norules.com/ok"),
        ],
        "id long, url string",
    )
    got = {
        r["id"]: (r["allowed"], r["quarantined_host"])
        for r in robots_gate(urls, rules).collect()
    }
    assert got == {
        1: (False, False),
        2: (True, False),
        3: (False, True),
        4: (True, False),
    }


def test_robots_gate_longest_match_and_tie(spark):
    """RFC 9309: longest matching prefix wins; at equal length Allow
    wins; hosts without rules and non-matching paths stay allowed."""
    from fortune_500_financial_insights_pipeline_spark.operators.robots import (
        robots_gate,
        robots_rules,
    )

    robots = spark.createDataFrame(
        [(
            "a.com",
            "User-agent: *\nDisallow: /x/\nAllow: /x/ok\n"
            # equal-length tie on /t/1: Allow must win
            "Allow: /t/1\nDisallow: /t/1\n",
        )],
        "host string, robots_txt string",
    )
    rules = robots_rules(robots)
    urls = spark.createDataFrame(
        [
            (1, "http://a.com/x/blocked"),
            (2, "http://a.com/x/ok/deeper"),
            (3, "http://a.com/t/1"),
            (4, "http://a.com/elsewhere"),
            (5, "http://norules.com/x/blocked"),
        ],
        "id long, url string",
    )
    got = {r["id"]: r["allowed"] for r in robots_gate(urls, rules).collect()}
    assert got == {1: False, 2: True, 3: True, 4: True, 5: True}


def test_extract_links_skips_script_and_decodes_entities():
    from fortune_500_financial_insights_pipeline_spark.operators.html import extract_links

    page = (
        "<html><head><script>var a = \"<a href='/no'>\";</script></head>"
        "<body><nav><a href='/'>Home</a></nav>"
        "<p><a href='../up/3'>rel</a> "
        "<a href='http://x.com/abs?a=1&amp;b=2'>abs</a>"
        "<a name='anchor-without-href'>n</a></p></body></html>"
    )
    assert extract_links(page) == ["/", "../up/3", "http://x.com/abs?a=1&b=2"]


def test_html_links_resolution_shapes(spark):
    """RFC 3986 reference resolution through the real urljoin: root,
    dot segments, plain relative, absolute, scheme-relative."""
    from fortune_500_financial_insights_pipeline_spark.operators.html import html_links

    page = (
        "<p><a href='/'>r</a><a href='../up/x'>u</a><a href='deep/y'>d</a>"
        "<a href='http://abs.com/z'>a</a><a href='//cdn.com/w'>s</a></p>"
    )
    df = spark.createDataFrame(
        [(1, "http://e.com/dir/sub/page.html", page)],
        "doc_id long, base_url string, html string",
    )
    got = [r["resolved"] for r in html_links(df).orderBy("link_idx").collect()]
    assert got == [
        "http://e.com/",
        "http://e.com/dir/up/x",
        "http://e.com/dir/sub/deep/y",
        "http://abs.com/z",
        "http://cdn.com/w",
    ]
