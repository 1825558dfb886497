"""HTML extraction operator tests: real-parser semantics on handwritten
markup (script/style skipping incl. raw '<' in CDATA, entity decoding,
block segmentation, link statistics) and the main-content keep rule."""

from __future__ import annotations

from fortune_500_financial_insights_pipeline_spark.operators.html import (
    html_main_text,
    parse_blocks,
)

PAGE = (
    "<html><head><title>T</title><style>p{color:red}</style>"
    "<script>if (1 < 2) { alert('x'); }</script></head><body>"
    "<nav><a href='/'>Home</a> <a href='/x'>Docs</a></nav>"
    "<p>The quick brown fox jumps over the lazy dog again &amp; again.</p>"
    "<div>Short.</div>"
    "<p>Visit <a href='/go'>this link</a> for more context on the topic "
    "at hand today.</p>"
    "<aside><a href='/ad'>Buy this truly amazing product right now!</a></aside>"
    "<footer>&copy; 2026</footer></body></html>"
)


def test_parse_blocks_segments_and_decodes():
    blocks = {b["tag"]: b for b in parse_blocks(PAGE)}
    assert "script" not in " ".join(b["text"] for b in blocks.values())
    assert "color" not in " ".join(b["text"] for b in blocks.values())
    assert blocks["title"]["text"] == "T"
    assert blocks["nav"]["text"] == "Home Docs"
    assert blocks["nav"]["n_links"] == 2
    assert blocks["nav"]["link_chars"] == len("Home") + len("Docs")
    p1 = [b for b in parse_blocks(PAGE) if b["tag"] == "p"][0]
    assert "again & again." in p1["text"]  # entity decoded
    p2 = [b for b in parse_blocks(PAGE) if b["tag"] == "p"][1]
    assert p2["n_links"] == 1 and p2["link_chars"] == len("this link")
    assert blocks["footer"]["text"] == "© 2026"


def test_html_main_text_keep_rule(spark):
    df = spark.createDataFrame([(1, PAGE)], "doc_id long, html string")
    row = html_main_text(df).head()
    # kept: the two long <p> blocks (inline link is under 33% density);
    # dropped: title/footer/div (length), nav/aside (density or length)
    assert row.n_kept == 2
    assert row.n_blocks == 7
    import hashlib

    main = (
        "The quick brown fox jumps over the lazy dog again & again.\n"
        "Visit this link for more context on the topic at hand today."
    )
    assert row.main_chars == len(main)
    assert row.main_md5 == hashlib.md5(main.encode()).hexdigest()


def test_unclosed_and_nested_markup_is_tolerated():
    blocks = parse_blocks("<div><p>one<p>two</div>three<b>four</b>")
    texts = [b["text"] for b in blocks]
    assert "one" in texts and "two" in texts
    # trailing content outside any block lands in an implicit block
    assert any("three" in t for t in texts)


def test_html_extraction_streams_unchanged(spark, tmp_path):
    """html_main_content is a stateless mapInPandas projection, so the
    web front half streams as-is: micro-batch output == batch output on
    the same pages (the streaming-symmetry check every stage of the
    curation family carries)."""
    from pyspark.sql import functions as F

    from fortune_500_financial_insights_pipeline_spark.operators.urltools import (
        canonicalize_url,
    )

    rows = [
        (1, "http://A.com:80/x?utm_source=1&q=2", PAGE),
        (2, "https://b.com/y", PAGE.replace("fox", "wolf")),
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(
        rows, "doc_id long, url string, html string"
    ).coalesce(1).write.mode("overwrite").parquet(src)

    def pipeline(df):
        from fortune_500_financial_insights_pipeline_spark.operators.html import (
            html_main_content,
        )

        canon = df.withColumn("url", canonicalize_url("url"))
        return html_main_content(canon).select(
            "doc_id", "url", F.md5("main").alias("fp")
        )

    got = []
    stream = spark.readStream.schema(
        "doc_id long, url string, html string"
    ).parquet(src)
    q = (
        pipeline(stream)
        .writeStream.foreachBatch(lambda df, b: got.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    batch = pipeline(spark.read.parquet(src)).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch))
    assert {r.url for r in batch} == {"http://a.com/x?q=2", "https://b.com/y"}
