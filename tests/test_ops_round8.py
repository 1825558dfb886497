"""Round-8 operator tests: splittable (member-offset) WARC ingestion
and its parity with the whole-file batch and streaming readers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _fixture_archives(tmp_path, n_archives=3, recs_per=4, skew_factor=1):
    """Write .warc.gz fixtures: archive i holds recs_per gzip members
    (one response record each); archive 0 optionally skewed to
    skew_factor * recs_per members."""
    from fortune_500_financial_insights_pipeline_spark.operators.warc import (
        http_response_payload,
        warc_build,
        warc_build_record,
    )

    src = tmp_path / "warc"
    src.mkdir()
    for a in range(n_archives):
        n = recs_per * (skew_factor if a == 0 else 1)
        recs = [
            warc_build_record(
                "response",
                http_response_payload(
                    f"<html><body>doc {a}-{i} hello crawl</body></html>".encode()
                ),
                target_uri=f"http://example{a}.com/p/{i}",
            )
            for i in range(n)
        ]
        (src / f"arch{a}.warc.gz").write_bytes(warc_build(recs, gzip_members=True))
    return src


def test_gzip_member_spans_stream_o_chunk(tmp_path):
    """iter_gzip_member_spans finds every member boundary with a tiny
    read chunk (forcing multi-chunk members) and the spans tile the
    file exactly."""
    from fortune_500_financial_insights_pipeline_spark.operators.warc import (
        iter_gzip_member_spans,
        warc_build,
        warc_build_record,
    )

    recs = [
        warc_build_record("response", b"x" * (5000 + 997 * i))
        for i in range(7)
    ]
    blob = warc_build(recs, gzip_members=True)
    f = tmp_path / "a.warc.gz"
    f.write_bytes(blob)
    with open(f, "rb") as fh:
        spans = list(iter_gzip_member_spans(fh.read, chunk_size=512))
    assert len(spans) == 7
    assert spans[0][0] == 0
    assert spans[-1][1] == len(blob)
    for (s1, e1), (s2, _e2) in zip(spans, spans[1:]):
        assert e1 == s2  # spans tile with no gaps/overlap
    # truncated member fails closed
    g = tmp_path / "trunc.warc.gz"
    g.write_bytes(blob[: len(blob) - 10])
    with open(g, "rb") as fh:
        with pytest.raises(ValueError, match="truncated|bad gzip"):
            list(iter_gzip_member_spans(fh.read, chunk_size=512))


def test_warc_split_equals_whole_file_batch(spark, tmp_path):
    """The offset-split reader must produce exactly the records the
    whole-content (binaryFile + warc_records) path produces — same
    doc_id keying, same bodies — while never holding an archive in one
    row."""
    from fortune_500_financial_insights_pipeline_spark.operators.warc import (
        warc_records,
        warc_records_split,
    )

    src = _fixture_archives(tmp_path, n_archives=3, recs_per=4)
    whole = warc_records(
        spark.read.format("binaryFile").load(str(src)).select(
            F.abs(F.xxhash64("path")).alias("doc_id"),
            F.col("content").alias("warc"),
        )
    ).select("doc_id", "rec_idx", "warc_type", "target_uri", "http_status", "body")
    split = warc_records_split(spark, str(src)).select(
        "doc_id",
        F.col("member_idx").alias("rec_idx"),
        "warc_type", "target_uri", "http_status", "body",
    )
    w = {tuple(r) for r in whole.collect()}
    s = {tuple(r) for r in split.collect()}
    assert len(w) == 12
    assert w == s


def test_warc_split_fans_out_skewed_archive(spark, tmp_path):
    """A skewed mix (one big + several small archives) must fan the big
    archive's members across multiple buckets — per-member parallelism,
    the r7 whole-row reader's missing property."""
    from fortune_500_financial_insights_pipeline_spark.operators.warc import (
        warc_member_index,
        warc_records_split,
    )

    src = _fixture_archives(tmp_path, n_archives=4, recs_per=3, skew_factor=40)
    files = (
        spark.read.format("binaryFile").load(str(src)).select("path")
    )
    idx = warc_member_index(files)
    # pick a target that puts ~a few members per bucket for the big file
    big = (
        idx.groupBy("path")
        .agg(F.max("end").alias("sz"), F.count("*").alias("n"))
        .orderBy(F.desc("sz"))
        .collect()
    )
    assert big[0]["n"] == 120  # 40 * 3 members in the skewed archive
    target = int(big[0]["sz"]) // 8
    recs = warc_records_split(spark, str(src), target_split_bytes=target)
    n_buckets = (
        warc_member_index(files)
        .withColumn("bucket", F.floor(F.col("start") / F.lit(target)))
        .where(F.col("path") == big[0]["path"])
        .select("bucket")
        .distinct()
        .count()
    )
    assert n_buckets >= 8  # the big archive splits into >= 8 range units
    assert recs.count() == 120 + 3 * 3


def test_warc_split_equals_stream(spark, tmp_path):
    """Stream (whole-file rows, the streaming source's granularity) and
    the split batch reader agree record-for-record under the same
    doc_id keying."""
    from fortune_500_financial_insights_pipeline_spark.operators.warc import (
        warc_records_split,
    )
    from fortune_500_financial_insights_pipeline_spark.streaming.warc_ingest import (
        warc_archive_stream,
        warc_record_stream,
    )

    src = _fixture_archives(tmp_path, n_archives=2, recs_per=5)
    stream = warc_record_stream(warc_archive_stream(spark, str(src)))
    out = (
        stream.writeStream.format("memory")
        .queryName("warc_split_parity")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    out.awaitTermination(120)
    got_stream = {
        (r["doc_id"], r["rec_idx"], r["warc_type"], r["target_uri"], bytes(r["body"]))
        for r in spark.sql("SELECT * FROM warc_split_parity").collect()
    }
    got_split = {
        (
            r["doc_id"], r["member_idx"], r["warc_type"], r["target_uri"],
            bytes(r["body"]),
        )
        for r in warc_records_split(spark, str(src)).collect()
    }
    assert len(got_split) == 10
    assert got_stream == got_split


def test_robots_fuzz_never_job_fatal():
    """Round-8 fuzz gate over the regexp-translated robots rules (r7
    verdict task 8): for ANY byte-mangled robots.txt body, the
    driver-side parse either returns rules or raises ValueError (the
    quarantine trigger) — never an IndexError/KeyError/re.error — and
    every produced wildcard pattern translates to a COMPILABLE regex,
    so a malformed pattern can never detonate later inside the gate's
    per-row regexp_like."""
    import random
    import re as re_mod

    from fortune_500_financial_insights_pipeline_spark.operators.robots import (
        parse_robots_txt,
        pattern_regex,
    )

    base = (
        "User-agent: *\nDisallow: /a/*/b\nAllow: /x$\nDisallow: /*.gif$\n"
        "Sitemap: http://x.com/s.xml\nUser-agent: bot\nDisallow: /\n"
    ).encode()
    rng = random.Random(8)
    bodies = [base]
    for _ in range(300):
        b = bytearray(base)
        for _ in range(rng.randrange(1, 6)):
            op = rng.randrange(3)
            i = rng.randrange(len(b))
            if op == 0:
                b[i] = rng.randrange(256)
            elif op == 1:
                del b[i]
            else:
                b.insert(i, rng.randrange(256))
        bodies.append(bytes(b))
    # plus adversarial pattern shapes aimed at the regex translator
    for pat in ["/(", "/[a-", "/a\\", "/*)*$", "/+?{2,}$", "/\\Q\\E*", "/✓*"]:
        bodies.append(f"User-agent: *\nDisallow: {pat}\n".encode())

    for body in bodies:
        text = body.decode("utf-8", "replace")
        try:
            rules = parse_robots_txt(text)
        except ValueError:
            continue  # robots_rules quarantines this host
        for _rt, pat in rules:
            rx = pattern_regex(pat)
            if rx is not None:
                re_mod.compile(rx)  # must be a valid (Java-safe) regex


def test_robots_gate_survives_mangled_rule_dim(spark):
    """End-to-end: a rules dim built from a mix of healthy, wildcard,
    and mangled robots bodies gates a URL frame without any task
    failure; mangled hosts come out quarantined-disallowed."""
    from fortune_500_financial_insights_pipeline_spark.operators.robots import (
        robots_gate,
        robots_rules,
    )

    robots = spark.createDataFrame(
        [
            ("ok.com", "User-agent: *\nDisallow: /x/*.gif$\n"),
            ("weird.com", "User-agent: *\nDisallow: /((\n"),  # odd but literal
            ("broken.com", "no colon line at all"),
        ],
        "host string, robots_txt string",
    )
    rules = robots_rules(robots)
    urls = spark.createDataFrame(
        [
            (1, "http://ok.com/x/a.gif"),
            (2, "http://ok.com/x/a.gifx"),
            (3, "http://weird.com/(("),
            (4, "http://weird.com/other"),
            (5, "http://broken.com/anything"),
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
        3: (False, False),  # literal '/((' prefix matches
        4: (True, False),
        5: (False, True),
    }


def test_crawl_bfs_min_depth_and_dead_links(spark):
    """crawl_bfs: depth is the MINIMUM hop count (a page linked at
    depth 1 and again at depth 2 reports 1), dead links (no page in
    the corpus) are discovered but expand nothing, and seeds never
    re-emit."""
    from fortune_500_financial_insights_pipeline_spark.operators.crawl import crawl_bfs

    def page(u, hrefs):
        body = "".join(f"<a href='{h}'>x</a>" for h in hrefs)
        return (u, f"<html><body>{body}</body></html>")

    pages = spark.createDataFrame(
        [
            page("http://t.io/a", ["/b", "/c"]),
            page("http://t.io/b", ["/c", "/dead"]),   # /c again at depth 2
            page("http://t.io/c", ["/a"]),            # back-link to the seed
        ],
        "url string, html string",
    )
    seeds = spark.createDataFrame([("http://t.io/a",)], "url string")
    got = {r["url"]: r["depth"] for r in crawl_bfs(pages, seeds, rounds=3).collect()}
    assert got == {
        "http://t.io/a": 0,
        "http://t.io/b": 1,
        "http://t.io/c": 1,       # min depth, not 2
        "http://t.io/dead": 2,    # discovered, expands nothing
    }
    # rounds=0: seeds only
    got0 = {r["url"]: r["depth"] for r in crawl_bfs(pages, seeds, rounds=0).collect()}
    assert got0 == {"http://t.io/a": 0}
    with pytest.raises(ValueError, match="rounds"):
        crawl_bfs(pages, seeds, rounds=-1)


def test_parse_crawl_delay_group_selection():
    """Crawl-delay is group-scoped: named group wins over '*', fallback
    applies when no group names the agent, strictest (max) wins across
    multiple applicable groups, malformed values raise (quarantine)."""
    from fortune_500_financial_insights_pipeline_spark.operators.robots import (
        parse_crawl_delay,
    )

    txt = (
        "User-agent: slowbot\nCrawl-delay: 30\nDisallow: /x\n\n"
        "User-agent: *\nCrawl-delay: 2.5\nDisallow: /y\n"
    )
    assert parse_crawl_delay(txt, "slowbot") == 30.0
    assert parse_crawl_delay(txt) == 2.5
    assert parse_crawl_delay(txt, "otherbot") == 2.5  # '*' fallback
    assert parse_crawl_delay("User-agent: *\nDisallow: /\n") is None
    multi = (
        "User-agent: a\nCrawl-delay: 1\n\nUser-agent: a\nCrawl-delay: 9\n"
    )
    assert parse_crawl_delay(multi, "a") == 9.0  # strictest wins
    import pytest as _pytest

    with _pytest.raises(ValueError, match="Crawl-delay"):
        parse_crawl_delay("User-agent: *\nCrawl-delay: soon\n")


def test_sitemap_urls_both_shapes(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.crawl import (
        sitemap_urls,
    )

    urlset = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc>http://a.com/1</loc><lastmod>2026-01-05</lastmod>"
        "<priority>0.8</priority></url>"
        "<url><loc>http://a.com/2</loc></url></urlset>"
    )
    index = (
        '<?xml version="1.0"?><sitemapindex>'
        "<sitemap><loc>http://b.com/sm1.xml</loc></sitemap></sitemapindex>"
    )
    df = spark.createDataFrame(
        [("a.com", urlset), ("b.com", index), ("c.com", "not xml at all")],
        "host string, sitemap_xml string",
    )
    rows = {
        (r["host"], r["kind"], r["loc"], r["lastmod"], r["priority"])
        for r in sitemap_urls(df).collect()
    }
    assert rows == {
        ("a.com", "url", "http://a.com/1", "2026-01-05", 0.8),
        ("a.com", "url", "http://a.com/2", None, None),
        ("b.com", "sitemap", "http://b.com/sm1.xml", None, None),
    }  # the non-XML host yields zero rows, never an error


def test_politeness_schedule_ranks_and_defaults(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.crawl import (
        politeness_schedule,
    )

    urls = spark.createDataFrame(
        [("http://a.com/2",), ("http://a.com/1",), ("http://b.com/x",)],
        "url string",
    )
    delays = spark.createDataFrame([("a.com", 3.0)], "host string, crawl_delay double")
    got = {
        r["url"]: (r["fetch_rank"], r["fetch_at_s"])
        for r in politeness_schedule(urls, delays, default_delay=1.5).collect()
    }
    assert got == {
        "http://a.com/1": (0, 0.0),   # URL-ordered within host
        "http://a.com/2": (1, 3.0),
        "http://b.com/x": (0, 0.0),   # no dim row: default delay
    }


def test_crawl_frontier_stream_equals_batch(spark, tmp_path):
    """Streaming frontier expansion == the batch distinct-link frontier
    on the same fetched pages, with cross-batch duplicate links emitted
    ONCE and links back to fetched pages suppressed — bounded Bloom
    seen-set state across micro-batches."""
    from pyspark.sql import functions as F

    from fortune_500_financial_insights_pipeline_spark.operators.html import html_links
    from fortune_500_financial_insights_pipeline_spark.operators.urltools import (
        canonicalize_url,
    )
    from fortune_500_financial_insights_pipeline_spark.streaming.crawl_frontier import (
        crawl_frontier_stream,
    )

    def page(u, hrefs):
        body = "".join(f"<a href='{h}'>x</a>" for h in hrefs)
        return (u, f"<html><body>{body}</body></html>")

    batch1 = [
        page("http://s.io/a", ["/x", "/y", "/b"]),
        page("http://s.io/b", ["/x", "/z?b=2&utm_source=t&a=1"]),
    ]
    batch2 = [
        # /x and /y again (must NOT re-emit), a link back to fetched /a
        # (suppressed), one genuinely new /w
        page("http://s.io/c", ["/x", "/y", "/a", "/w"]),
    ]
    src = tmp_path / "pages"
    src.mkdir()
    spark.createDataFrame(batch1, "url string, html string").coalesce(
        1
    ).write.parquet(str(src / "b1"))
    spark.createDataFrame(batch2, "url string, html string").coalesce(
        1
    ).write.parquet(str(src / "b2"))

    got: list = []
    stream = (
        spark.readStream.schema("url string, html string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "b*"))
    )
    state = str(tmp_path / "state")
    q = (
        crawl_frontier_stream(
            stream, state, lambda df, bid: got.extend(
                r["frontier_url"] for r in df.collect()
            ),
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # batch twin: distinct canonical links over ALL pages, minus the
    # fetched pages' own urls
    pages = spark.createDataFrame(
        batch1 + batch2, "url string, html string"
    ).select(
        F.xxhash64("url").alias("doc_id"),
        F.col("url").alias("base_url"),
        "html",
    )
    links = html_links(pages).select(
        canonicalize_url("resolved").alias("u")
    ).distinct()
    fetched = spark.createDataFrame(
        [(u,) for u, _ in batch1 + batch2], "u string"
    )
    want = {r["u"] for r in links.join(fetched, "u", "left_anti").collect()}
    assert len(got) == len(set(got))  # exactly-once emission
    assert set(got) == want
    assert "http://s.io/z?a=1&b=2" in want  # canonicalization in the loop


def test_warc_split_stream_parity(spark, tmp_path):
    """The offset-split STREAMING reader (path-listing stream through
    the shared split core) produces exactly the batch split reader's
    records across multi-file triggers."""
    from fortune_500_financial_insights_pipeline_spark.operators.warc import (
        warc_records_split,
    )
    from fortune_500_financial_insights_pipeline_spark.streaming.warc_ingest import (
        warc_split_record_stream,
    )

    src = _fixture_archives(tmp_path, n_archives=3, recs_per=4)
    stream = warc_split_record_stream(
        spark, str(src), target_split_bytes=2048, max_files_per_trigger=1
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("warc_split_stream_parity")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got_stream = {
        (r["doc_id"], r["member_idx"], r["rec_in_member"], r["warc_type"],
         r["target_uri"], bytes(r["body"]))
        for r in spark.sql("SELECT * FROM warc_split_stream_parity").collect()
    }
    got_batch = {
        (r["doc_id"], r["member_idx"], r["rec_in_member"], r["warc_type"],
         r["target_uri"], bytes(r["body"]))
        for r in warc_records_split(spark, str(src)).collect()
    }
    assert len(got_batch) == 12
    assert got_stream == got_batch


def test_robots_pattern_regex_property():
    """Property: the regex translation of ANY robots pattern agrees
    with an independent dynamic-programming matcher implementing the
    RFC 9309 semantics directly ('*' = any octet sequence, trailing
    '$' = end anchor, everything else literal, prefix match
    otherwise)."""
    import re as re_mod

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from fortune_500_financial_insights_pipeline_spark.operators.robots import (
        pattern_regex,
    )

    def ref_match(pattern: str, path: str) -> bool:
        anchored = pattern.endswith("$")
        body = pattern[:-1] if anchored else pattern
        segs = body.split("*")

        # DP over "can segs[i:] match path[j:]" with '*' gaps between
        # segments; without the end anchor the final segment may end
        # anywhere (prefix semantics)
        def rec(i: int, j: int) -> bool:
            if i == len(segs):
                return True
            seg = segs[i]
            last = i == len(segs) - 1
            starts = [j] if i == 0 else range(j, len(path) - len(seg) + 1)
            for s in starts:
                if s + len(seg) > len(path):
                    continue
                if path[s : s + len(seg)] != seg:
                    continue
                if last:
                    # anchored: the final literal must end AT path end;
                    # unanchored: prefix semantics, anything may follow
                    if not anchored or s + len(seg) == len(path):
                        return True
                    continue
                if rec(i + 1, s + len(seg)):
                    return True
            return False

        return rec(0, 0)

    alphabet = st.sampled_from(list("ab/.?*$("))
    pat_st = st.text(alphabet, min_size=0, max_size=8)
    path_st = st.text(st.sampled_from(list("ab/.?($")), min_size=0, max_size=10)

    @settings(max_examples=400, deadline=None)
    @given(pat_st, path_st)
    def check(pattern, path):
        rx = pattern_regex(pattern)
        if rx is None:
            got = path.startswith(pattern)
        else:
            got = re_mod.match(rx, path) is not None
        assert got == ref_match(pattern, path), (pattern, path, rx)

    check()


def test_recrawl_delta_all_classes(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.crawl import (
        recrawl_delta,
    )

    entries = spark.createDataFrame(
        [
            ("http://a/1", "2026-02-01"),  # fetched older -> stale
            ("http://a/2", "2026-01-01"),  # fetched same day -> fresh
            ("http://a/3", None),          # fetched, no lastmod -> unknown
            ("http://a/4", "2026-01-01"),  # never fetched -> new
        ],
        "loc string, lastmod string",
    )
    state = spark.createDataFrame(
        [
            ("http://a/1", "2026-01-15"),
            ("http://a/2", "2026-01-01"),
            ("http://a/3", "2026-01-15"),
        ],
        "url string, last_fetch string",
    )
    got = {r["loc"]: r["action"] for r in recrawl_delta(entries, state).collect()}
    assert got == {
        "http://a/1": "stale",
        "http://a/2": "fresh",
        "http://a/3": "unknown",
        "http://a/4": "new",
    }


def test_http_split_headers_and_decoded_text(spark):
    """http_split_headers surfaces lowercased HTTP headers; decoded_text
    decodes per the charset parameter (latin-1 0xE9 -> 'é'; blind UTF-8
    would emit U+FFFD), falls back on parameterless types, quarantines
    unknown charsets per row."""
    from fortune_500_financial_insights_pipeline_spark.operators.warc import (
        decoded_text,
        http_split_headers,
    )

    block = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain; charset=ISO-8859-1\r\n"
        b"X-Custom: V\r\n\r\n\xe9body"
    )
    status, headers, body = http_split_headers(block)
    assert status == 200
    assert headers == {
        "content-type": "text/plain; charset=ISO-8859-1",
        "x-custom": "V",
    }
    assert body == b"\xe9body"

    df = spark.createDataFrame(
        [
            (1, "text/plain; charset=ISO-8859-1", bytearray(b"\xe9")),
            (2, "text/html; charset=UTF-8", bytearray("é".encode())),
            (3, "text/plain", bytearray(b"plain")),
            (4, "text/html; charset=klingon", bytearray(b"x")),
            (5, None, bytearray(b"fallback")),
        ],
        "id long, http_content_type string, body binary",
    )
    got = {
        r["id"]: (r["d"]["text"], r["d"]["charset"], r["d"]["decode_ok"])
        for r in df.withColumn("d", decoded_text()).collect()
    }
    assert got == {
        1: ("é", "iso-8859-1", True),
        2: ("é", "utf-8", True),
        3: ("plain", "utf-8", True),
        4: (None, "klingon", False),
        5: ("fallback", "utf-8", True),
    }
