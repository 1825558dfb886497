"""Crawl frontier ITERATION — the loop the round-6/7/8 stages compose
into: seed URLs → fetch → extract links → canonicalize → seen-set
anti-join → NEW frontier → repeat. The single-round pieces are each
certified on their own (operators/warc.py ingestion, robots.py gate,
html.py extraction + RFC 3986 resolution, urltools.py
canonicalization); this module certifies the ITERATION: per round,
extraction runs ONLY over the newly-discovered frontier (you parse
exactly what the previous round discovered — the real crawl shape,
never re-parsing the seen set), and the seen-set is maintained by a
distinct + left_anti join, both url-keyed equi-shuffles.

100 TB shape: per round, one map-only parse over the frontier slice,
one distinct, one anti-join against the (hash-partitioned) seen set —
round count is the crawl DEPTH (operator parameter, single digits in
production politeness budgets), never data-dependent; lineage is cut
per round so plans never stack. The fetch itself is a join against a
page corpus here (retro-crawling an archive); a live crawler swaps
that join for its HTTP stage and keeps every other operator.

Reference scope note: /root/reference has no crawl ingestion at all;
this module is part of the LLM-training-data extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.operators.html import html_links
from fortune_500_financial_insights_pipeline_spark.operators.urltools import (
    canonicalize_url,
)


def crawl_bfs(
    pages: DataFrame,
    seeds: DataFrame,
    rounds: int,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """(url, depth) for every page reachable from ``seeds`` within
    ``rounds`` link hops over a page corpus — breadth-first, so depth
    is the MINIMUM hop count (the seen-set anti-join guarantees a URL
    is emitted the first round it appears and never again). ``pages``
    is the fetchable corpus (canonical url → html); frontier URLs that
    resolve to no page (dead links) still count as discovered but
    contribute no further links. Per round: fetch = url equi-join of
    the frontier against the corpus, parse = html_links over ONLY the
    fetched frontier rows (map-only), then canonicalize + distinct +
    anti-join against the accumulated seen set. Rounds are lineage-cut
    with localCheckpoint."""
    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    corpus = pages.select(
        F.col(url_col).alias("__url"), F.col(html_col).alias("__html")
    )
    frontier = (
        seeds.select(F.col(url_col).alias("__url"))
        .distinct()
        .withColumn("depth", F.lit(0))
        .localCheckpoint(eager=True)
    )
    seen = frontier
    for r in range(1, rounds + 1):
        fetched = (
            frontier.join(corpus, "__url")
            .select(
                F.xxhash64("__url").alias("__fid"),
                F.col("__url").alias("base_url"),
                F.col("__html").alias("html"),
            )
        )
        links = html_links(fetched, id_col="__fid")
        new = (
            links.select(canonicalize_url("resolved").alias("__url"))
            .distinct()
            .join(seen.select("__url"), "__url", "left_anti")
            .withColumn("depth", F.lit(r))
            .localCheckpoint(eager=True)  # consumed twice: union + next fetch
        )
        # lazy: materializes with the next round's anti-join (or the final
        # action), so each round pays ONE eager job, not two
        seen = seen.unionByName(new).localCheckpoint(eager=False)
        frontier = new
    return seen.select(F.col("__url").alias(url_col), "depth")
