"""Round-8 extension queries: RFC 9309 wildcard robots evaluation with
per-host quarantine, and the composed crawl pipeline, under oracle hash
rows."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.catalog import load_table
from fortune_500_financial_insights_pipeline_spark.queries._core import q


@q("q_robots_wildcard")
def q_robots_wildcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 WILDCARD robots evaluation certified cross-engine — the
    round-8 extension of q_robots_gate covering the three §2.2.3
    wildcard shapes, the named-agent '*'-group fallback (§2.2.1), and
    the per-host quarantine (fail closed per host, never job-fatal).
    Per document (doc_id < 200, host = example{doc_id mod 5}.com),
    four URLs: /page/{d}?x=1 (hits ``Disallow: /*?``),
    /search?safe={d} (the LONGER ``Allow: /search?safe=*`` re-opens
    it), /img/{d}.gif (hits the $-anchored ``Disallow: /*.gif$``), and
    /cart (hits the exact-anchor ``Disallow: /cart$``). Hosts k in
    {0,1,2} publish the wildcard body under ``User-agent: *`` while the
    gate asks for agent 'trainingbot' — zero rules unless the fallback
    works; host k=3 publishes a MALFORMED body (no-colon line) and must
    be quarantined to disallow-all with the audit flag; host k=4
    publishes none (all allowed). The engine runs the REAL parser +
    regex translation + broadcast longest-match gate; the oracle
    replays the expected verdict per URL shape. Output: one row per
    host with URL/allow/block/quarantine counts."""
    from fortune_500_financial_insights_pipeline_spark.operators.robots import (
        robots_gate,
        robots_rules,
    )

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    k = (F.col("doc_id") % 5).cast("long")
    base = F.concat(F.lit("http://example"), k, F.lit(".com"))
    urls = d.select(
        "doc_id",
        F.explode(
            F.array(
                F.concat(base, F.lit("/page/"), F.col("doc_id"), F.lit("?x=1")),
                F.concat(base, F.lit("/search?safe="), F.col("doc_id")),
                F.concat(base, F.lit("/img/"), F.col("doc_id"), F.lit(".gif")),
                F.concat(base, F.lit("/cart")),
            )
        ).alias("url"),
    )
    wildcard_body = (
        "User-agent: badbot\nDisallow: /\n\n"
        "User-agent: *\nDisallow: /*?\nAllow: /search?safe=*\n"
        "Disallow: /*.gif$\nDisallow: /cart$\n"
    )
    malformed_body = "User-agent *\nthis line has no colon\n"
    hosts = (
        spark.range(4)
        .select(
            F.concat(F.lit("example"), F.col("id"), F.lit(".com")).alias("host"),
            F.when(F.col("id") == 3, F.lit(malformed_body))
            .otherwise(F.lit(wildcard_body))
            .alias("robots_txt"),
        )
    )
    rules = robots_rules(hosts, agent="trainingbot")
    gated = robots_gate(urls, rules)
    host = F.regexp_extract("url", r"^http://([^/?]*)[/?]", 1)
    return (
        gated.groupBy(host.alias("host"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.sum(F.when(F.col("allowed"), 1).otherwise(0))
            .cast("long").alias("n_allowed"),
            F.sum(F.when(~F.col("allowed"), 1).otherwise(0))
            .cast("long").alias("n_blocked"),
            F.sum(F.when(F.col("quarantined_host"), 1).otherwise(0))
            .cast("long").alias("n_quarantined"),
        )
    )


@q("q_crawl_pipeline_e2e")
def q_crawl_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole CRAWL front half COMPOSED and certified in one row —
    the crawl twin of q_web_pipeline_e2e (which starts at raw URLs;
    this starts one stage earlier, at WARC archives, and closes the
    loop with the link frontier): per document (doc_id < 40, host =
    example{doc_id mod 7}.com), a 3-record per-member-gzip WARC archive
    (warcinfo + response carrying the shared _synth_page at
    /dir/page{d}.html with one extra per-doc 'deep/{d}' anchor +
    metadata) flows through warc_records → response projection →
    robots_gate (odd-k hosts publish ``Disallow: /dir/`` with the
    longer ``Allow: /dir/page2``, so odd-host pages survive only when
    the doc id starts with digit 2) → html_main_content on ALLOWED
    pages only → html_links + RFC 3986 resolution + canonicalize_url →
    distinct-canon frontier. Every stage is individually certified by
    its own key (q_warc_crawl_extract, q_robots_gate,
    q_html_main_extract, q_link_frontier, q_url_canonical_dedup); this
    key certifies their COMPOSITION, incl. that robots drops happen
    BEFORE extraction. Stages are map-only plus the gate's broadcast
    aggregate and one frontier distinct — the 100 TB crawl shape. The
    oracle replays archive constants, group selection, the page
    generator's main-text formula (md5-prefix checksum) and the five
    resolved link shapes."""
    from fortune_500_financial_insights_pipeline_spark.operators.html import (
        html_links,
        html_main_content,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.robots import (
        robots_gate,
        robots_rules,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.urltools import (
        canonicalize_url,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.warc import (
        warc_records,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 40)
        .select("doc_id", "text")
    )

    def build(batches):
        import pandas as pd

        from fortune_500_financial_insights_pipeline_spark.operators.warc import (
            http_response_payload,
            warc_build,
            warc_build_record,
        )
        from fortune_500_financial_insights_pipeline_spark.queries._extensions_g import (
            _synth_page,
        )

        for pdf in batches:
            out = {"doc_id": [], "warc": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                k = d % 7
                page = _synth_page(d, str(text)).replace(
                    "</body></html>",
                    f"<p><a href='deep/{d}'>more</a></p></body></html>",
                )
                recs = [
                    warc_build_record("warcinfo", b"software: e2e\r\n"),
                    warc_build_record(
                        "response",
                        http_response_payload(page.encode()),
                        target_uri=f"http://example{k}.com/dir/page{d}.html",
                    ),
                    warc_build_record(
                        "metadata", b"fetchTimeMs: 9\r\n",
                        target_uri=f"http://example{k}.com/dir/page{d}.html",
                    ),
                ]
                out["doc_id"].append(d)
                out["warc"].append(warc_build(recs, gzip_members=True))
            yield pd.DataFrame(out)

    archives = docs.mapInPandas(build, schema="doc_id long, warc binary")
    recs = warc_records(archives)
    responses = recs.where(F.col("warc_type") == "response").select(
        "doc_id",
        "target_uri",
        F.decode("body", "UTF-8").alias("html"),
    )
    robots_body = "User-agent: *\nDisallow: /dir/\nAllow: /dir/page2\n"
    hosts = (
        spark.range(7)
        .where(F.col("id") % 2 == 1)
        .select(
            F.concat(F.lit("example"), F.col("id"), F.lit(".com")).alias("host"),
            F.lit(robots_body).alias("robots_txt"),
        )
    )
    rules = robots_rules(hosts)
    gated = robots_gate(responses, rules, url_col="target_uri")
    allowed = gated.where(F.col("allowed"))

    extracted = html_main_content(
        allowed.select(
            "doc_id", F.col("target_uri").alias("url"), "html"
        )
    ).withColumn("main_sp", F.regexp_replace("main", "\n", " "))
    csum = F.conv(F.substring(F.md5("main_sp"), 1, 8), 16, 10).cast("long")

    links = html_links(
        allowed.select(
            "doc_id", F.col("target_uri").alias("base_url"), "html"
        )
    ).withColumn("canon", canonicalize_url("resolved"))

    one = F.lit(1)
    a_recs = recs.agg(F.count(one).cast("long").alias("n_records"))
    a_resp = responses.agg(F.count(one).cast("long").alias("n_responses"))
    a_gate = gated.agg(
        F.sum(F.when(F.col("allowed"), 1).otherwise(0))
        .cast("long").alias("n_allowed"),
        F.sum(F.when(~F.col("allowed"), 1).otherwise(0))
        .cast("long").alias("n_blocked"),
    )
    a_text = extracted.agg(
        F.sum(F.when(F.length("main_sp") > 0, 1).otherwise(0))
        .cast("long").alias("n_texts"),
        F.sum(csum).cast("long").alias("main_checksum"),
    )
    a_links = links.agg(F.count(one).cast("long").alias("n_links"))
    a_frontier = links.select("canon").distinct().agg(
        F.count(one).cast("long").alias("n_frontier")
    )
    return (
        a_recs.crossJoin(F.broadcast(a_resp))
        .crossJoin(F.broadcast(a_gate))
        .crossJoin(F.broadcast(a_text))
        .crossJoin(F.broadcast(a_links))
        .crossJoin(F.broadcast(a_frontier))
    )


@q("q_warc_split_ingest")
def q_warc_split_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset-SPLIT WARC ingestion certified cross-engine — the round-8
    ranged-read path (warc_records_split: pruned path listing →
    streaming gzip-member span index → ~target-byte range buckets →
    per-member seek+read) exercised end-to-end on REAL archive files:
    per document (doc_id < 30), one .warc.gz with two gzip members
    (a text/plain response carrying the document text + a metadata
    record) is WRITTEN to a scratch dir, read back through the split
    reader with a target size small enough to force multiple buckets,
    and folded to one row per doc: member/record/response counts and
    the md5 of the decoded response body. The oracle replays the
    archive constants and hashes the same text column — builder and
    reader meet only at the ISO 28500 + gzip byte formats. The scratch
    files are removed before returning (localCheckpoint pins the
    result)."""
    import gzip
    import os
    import shutil
    import tempfile

    from fortune_500_financial_insights_pipeline_spark.operators.warc import (
        warc_build_record,
        warc_records_split,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 30)
        .select("doc_id", "text")
        .collect()  # 30 bounded rows: the archive-writing fixture seam
    )
    src = tempfile.mkdtemp(prefix="warc_split_ingest_")
    try:
        for r in docs:
            d = int(r["doc_id"])
            recs = [
                warc_build_record(
                    "response",
                    str(r["text"]).encode(),
                    target_uri=f"http://example{d % 7}.com/doc/{d}",
                    content_type="text/plain",
                ),
                warc_build_record("metadata", b"fetchTimeMs: 7\r\n"),
            ]
            blob = b"".join(
                gzip.compress(rec, compresslevel=6) for rec in recs
            )
            with open(os.path.join(src, f"arch{d}.warc.gz"), "wb") as fh:
                fh.write(blob)
        recs_df = warc_records_split(spark, src, target_split_bytes=4096)
        doc = F.regexp_extract("archive_path", r"arch(\d+)\.warc\.gz$", 1).cast(
            "long"
        )
        out = (
            recs_df.withColumn("doc_id", doc)
            .groupBy("doc_id")
            .agg(
                F.countDistinct("member_idx").cast("long").alias("n_members"),
                F.count(F.lit(1)).cast("long").alias("n_records"),
                F.sum(
                    F.when(F.col("warc_type") == "response", 1).otherwise(0)
                ).cast("long").alias("n_responses"),
                F.max(
                    F.when(
                        F.col("warc_type") == "response",
                        F.md5(F.decode("body", "UTF-8")),
                    )
                ).alias("text_md5"),
            )
            .localCheckpoint(eager=True)  # scratch dir gone after return
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)
    return out


@q("q_crawl_bfs_frontier")
def q_crawl_bfs_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-loop ITERATION certified cross-engine — the stage the
    composed q_crawl_pipeline_e2e stops short of: repeated frontier
    expansion with a seen-set. Per document (doc_id < 60), a page at
    http://crawl.test/p/{d} carries three anchors whose targets are
    pure arithmetic — (3d+1) mod 60, (7d+2) mod 60, (d+1) mod 60 — as
    ROOT-RELATIVE hrefs ('/p/{t}' resolved against the /p/{d} base, so
    RFC 3986 resolution is in the loop every round). operators/crawl.crawl_bfs
    runs 3 rounds from seeds {p/0, p/1}: each round parses ONLY the
    newly-discovered pages (real html_links extraction), canonicalizes,
    and anti-joins the seen set, so depth is the MINIMUM hop count.
    The oracle replays the link arithmetic with a recursive CTE
    (min-depth BFS capped at 3). Output: one row per discovered URL
    (doc_id, depth) plus the engine's URL string — dead links cannot
    exist here (targets stay in 0..59), so engine and oracle row sets
    must match exactly."""
    from fortune_500_financial_insights_pipeline_spark.operators.crawl import crawl_bfs

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 60)

    def build(batches):
        import pandas as pd

        for pdf in batches:
            out = {"url": [], "html": []}
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                targets = [(3 * i + 1) % 60, (7 * i + 2) % 60, (i + 1) % 60]
                anchors = "".join(
                    f"<a href='/p/{t}'>l{j}</a>" for j, t in enumerate(targets)
                )
                out["url"].append(f"http://crawl.test/p/{i}")
                out["html"].append(
                    f"<html><body><p>page {i}</p>{anchors}</body></html>"
                )
            yield pd.DataFrame(out)

    pages = d.select("doc_id").mapInPandas(build, schema="url string, html string")
    seeds = spark.createDataFrame(
        [("http://crawl.test/p/0",), ("http://crawl.test/p/1",)], "url string"
    )
    out = crawl_bfs(pages, seeds, rounds=3)
    return out.select(
        F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long").alias("doc_id"),
        "url",
        F.col("depth").cast("int").alias("depth"),
    ).orderBy("doc_id")


@q("q_sitemap_ingest")
def q_sitemap_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap ingestion (sitemaps.org protocol) certified cross-engine
    — the crawl frontier's OTHER seed source, parsed with Spark's
    NATIVE from_xml (pure Catalyst, no UDF): per document (doc_id <
    50, k = doc_id mod 5), even-k docs publish a <urlset> with two
    page entries (lastmod 2026-01-(1 + d mod 27); entry 0 carries
    priority (d mod 10)/10, entry 1 a changefreq instead) and odd-k
    docs publish a <sitemapindex> with one child-sitemap pointer —
    both shapes flow through operators/crawl.sitemap_urls, which must
    emit kind='url' page rows and kind='sitemap' recursion pointers.
    The oracle replays the XML-generation arithmetic. 80 rows
    hash-checked."""
    from fortune_500_financial_insights_pipeline_spark.operators.crawl import (
        sitemap_urls,
    )

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)

    def build(batches):
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "sitemap_xml": []}
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                k = i % 5
                day = 1 + i % 27
                if k % 2 == 0:
                    xml = (
                        '<?xml version="1.0" encoding="UTF-8"?>\n'
                        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
                        f"<url><loc>http://example{k}.com/s/{i}/0</loc>"
                        f"<lastmod>2026-01-{day:02d}</lastmod>"
                        f"<priority>{(i % 10) / 10.0}</priority></url>\n"
                        f"<url><loc>http://example{k}.com/s/{i}/1</loc>"
                        f"<lastmod>2026-01-{day:02d}</lastmod>"
                        "<changefreq>weekly</changefreq></url>\n"
                        "</urlset>"
                    )
                else:
                    xml = (
                        '<?xml version="1.0" encoding="UTF-8"?>\n'
                        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
                        f"<sitemap><loc>http://example{k}.com/sitemap{i}.xml</loc>"
                        f"<lastmod>2026-01-{day:02d}</lastmod></sitemap>\n"
                        "</sitemapindex>"
                    )
                out["doc_id"].append(i)
                out["sitemap_xml"].append(xml)
            yield pd.DataFrame(out)

    maps = d.select("doc_id").mapInPandas(
        build, schema="doc_id long, sitemap_xml string"
    )
    return (
        sitemap_urls(maps, host_col="doc_id")
        .select(
            F.col("host").alias("doc_id"),
            "kind", "loc", "lastmod", "priority",
        )
        .orderBy("doc_id", "loc")
    )


@q("q_politeness_schedule")
def q_politeness_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host Crawl-delay politeness scheduling certified
    cross-engine — the fetch-RATE half of the robots contract
    (q_robots_gate/q_robots_wildcard certify the allow half): per
    document (doc_id < 200, host = example{doc_id mod 7}.com), two
    frontier URLs (/a/{d}, /b/{d}); odd-k hosts publish robots.txt
    with ``Crawl-delay: {k}.5`` under the ``*`` group, host k=2
    publishes a MALFORMED body (quarantined to the conservative
    86400 s once-a-day delay), other hosts publish none (the explicit
    2.0 s default). robots_crawl_delays extracts the rate dim via the
    REAL group parser; politeness_schedule ranks URLs within each host
    (ONE host-keyed window, broadcast delay dim) and stamps
    fetch_at_s = rank x delay. The oracle replays delays and the
    arithmetic-series totals. One row per host."""
    from fortune_500_financial_insights_pipeline_spark.operators.crawl import (
        politeness_schedule,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.robots import (
        robots_crawl_delays,
    )

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    k = (F.col("doc_id") % 7).cast("long")
    base = F.concat(F.lit("http://example"), k, F.lit(".com"))
    urls = d.select(
        F.explode(
            F.array(
                F.concat(base, F.lit("/a/"), F.col("doc_id")),
                F.concat(base, F.lit("/b/"), F.col("doc_id")),
            )
        ).alias("url")
    )
    hosts = (
        spark.range(7)
        .where((F.col("id") % 2 == 1) | (F.col("id") == 2))
        .select(
            F.concat(F.lit("example"), F.col("id"), F.lit(".com")).alias("host"),
            F.when(F.col("id") == 2, F.lit("User-agent *\nbroken"))
            .otherwise(
                F.concat(
                    F.lit("User-agent: *\nDisallow: /x/\nCrawl-delay: "),
                    F.col("id"), F.lit(".5\n"),
                )
            ).alias("robots_txt"),
        )
    )
    delays = robots_crawl_delays(hosts).select("host", "crawl_delay")
    sched = politeness_schedule(urls, delays, default_delay=2.0)
    host = F.regexp_extract("url", r"^http://([^/]*)/", 1)
    return (
        sched.groupBy(host.alias("host"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.max("fetch_rank").cast("long").alias("max_rank"),
            F.round(F.max("fetch_at_s"), 6).alias("last_fetch_s"),
            F.round(F.sum("fetch_at_s"), 6).alias("total_wait_s"),
        )
        .orderBy("host")
    )


@q("q_recrawl_delta")
def q_recrawl_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental recrawl scheduling certified cross-engine — the
    lifecycle stage after discovery (q_sitemap_ingest) and before the
    politeness queue (q_politeness_schedule): the same even-k sitemap
    feed (doc_id < 50, two page entries at lastmod 2026-01-(1 + d mod
    27); entry 1's lastmod is DROPPED for d mod 4 == 0 to exercise the
    'unknown' class) joins the crawl state, which has fetched entry 0
    of every doc at 2026-01-(1 + (3d) mod 27) and has never seen
    entry 1. operators/crawl.recrawl_delta must classify: entry 1 ->
    'new' (or 'unknown'-less — no state row wins first), entry 0 ->
    'stale' iff lastmod > last_fetch else 'fresh'. One url-keyed left
    join, no window, no UDF. The oracle replays the date arithmetic
    with the same lexicographic ISO comparison. One row per entry."""
    from fortune_500_financial_insights_pipeline_spark.operators.crawl import (
        recrawl_delta,
        sitemap_urls,
    )

    d = load_table(spark, sf_dir, "documents").where(
        (F.col("doc_id") < 50) & ((F.col("doc_id") % 5) % 2 == 0)
    )

    def build(batches):
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "sitemap_xml": []}
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                k = i % 5
                day = 1 + i % 27
                lm1 = (
                    "" if i % 4 == 0
                    else f"<lastmod>2026-01-{day:02d}</lastmod>"
                )
                xml = (
                    '<?xml version="1.0" encoding="UTF-8"?>\n'
                    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
                    f"<url><loc>http://example{k}.com/s/{i}/0</loc>"
                    f"<lastmod>2026-01-{day:02d}</lastmod></url>\n"
                    f"<url><loc>http://example{k}.com/s/{i}/1</loc>{lm1}</url>\n"
                    "</urlset>"
                )
                out["doc_id"].append(i)
                out["sitemap_xml"].append(xml)
            yield pd.DataFrame(out)

    maps = d.select("doc_id").mapInPandas(
        build, schema="doc_id long, sitemap_xml string"
    )
    entries = sitemap_urls(maps, host_col="doc_id").select(
        F.col("host").alias("doc_id"), "loc", "lastmod"
    )
    k = (F.col("doc_id") % 5).cast("long")
    fetch_day = F.lpad(((F.col("doc_id") * 3) % 27 + 1).cast("string"), 2, "0")
    state = d.select(
        F.concat(
            F.lit("http://example"), k, F.lit(".com/s/"), F.col("doc_id"),
            F.lit("/0"),
        ).alias("url"),
        F.concat(F.lit("2026-01-"), fetch_day).alias("last_fetch"),
    )
    out = recrawl_delta(entries, state)
    return out.select("doc_id", "loc", "lastmod", "last_fetch", "action").orderBy(
        "doc_id", "loc"
    )


@q("q_warc_charset_text")
def q_warc_charset_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charset-aware crawl-body decoding certified cross-engine — the
    real-data gap of blind-UTF-8 ingestion (half the web's 0xE9 bytes
    are latin-1 'é'): per document (doc_id < 40, k = doc_id mod 4), a
    WARC response whose HTTP Content-Type and byte encoding vary —
    k=0 UTF-8 with multi-byte text ('Prix é № {d}', charset=UTF-8),
    k=1 ISO-8859-1 with the SAME visible text minus № ('Prix é {d}',
    0xE9 single byte, charset=ISO-8859-1), k=2 plain ASCII with NO
    charset parameter (falls back to UTF-8), k=3 an UNKNOWN charset
    (quarantines per row: NULL text, decode_ok=false — never a job
    error). The engine path: warc_records (which now surfaces the HTTP
    Content-Type header via http_split_headers) → decoded_text (one
    regexp_extract + a codegen when-chain over the charset table, zero
    UDFs). The oracle replays the expected decoded string per class and
    hashes it. One row per doc."""
    from fortune_500_financial_insights_pipeline_spark.operators.warc import (
        decoded_text,
        warc_records,
    )

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 40)

    def build(batches):
        import pandas as pd

        from fortune_500_financial_insights_pipeline_spark.operators.warc import (
            warc_build,
            warc_build_record,
        )

        for pdf in batches:
            out = {"doc_id": [], "warc": []}
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                k = i % 4
                if k == 0:
                    body = f"Prix é № {i}".encode("utf-8")
                    ctype = "text/html; charset=UTF-8"
                elif k == 1:
                    body = f"Prix é {i}".encode("iso-8859-1")
                    ctype = 'text/plain; charset="ISO-8859-1"'
                elif k == 2:
                    body = f"Plain {i}".encode("ascii")
                    ctype = "text/plain"
                else:
                    body = f"Mystery {i}".encode("ascii")
                    ctype = "text/html; charset=klingon"
                http = (
                    f"HTTP/1.1 200 OK\r\nContent-Type: {ctype}\r\n"
                    f"Content-Length: {len(body)}\r\n\r\n"
                ).encode() + body
                recs = [
                    warc_build_record(
                        "response", http,
                        target_uri=f"http://example{k}.com/cs/{i}",
                    ),
                ]
                out["doc_id"].append(i)
                out["warc"].append(warc_build(recs, gzip_members=True))
            yield pd.DataFrame(out)

    archives = d.select("doc_id").mapInPandas(build, schema="doc_id long, warc binary")
    resp = warc_records(archives).where(F.col("warc_type") == "response")
    dec = resp.withColumn("__d", decoded_text())
    return (
        dec.select(
            "doc_id",
            F.col("__d.charset").alias("charset"),
            F.col("__d.decode_ok").alias("decode_ok"),
            F.md5(F.col("__d.text")).alias("text_md5"),
        )
        .orderBy("doc_id")
    )
