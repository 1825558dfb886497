"""Streaming crawl-frontier expansion with BOUNDED seen-set state —
the streaming twin of ``operators/crawl.crawl_bfs``: fetched pages
land as a stream; each micro-batch parses ONLY its own pages (real
``html_links`` extraction + RFC 3986 resolution + canonicalization,
the identical operators the batch loop runs), and every canonical
link is emitted as frontier output EXACTLY ONCE across the stream's
lifetime.

Contract difference from the batch BFS: a live crawler parses
whatever was FETCHED (batch arrival order is the fetch schedule), so
the stream's output set is the distinct canonical links over all
fetched pages minus already-seen — no depth column. On identical page
sets, stream output == the batch distinct-link frontier (pinned by
tests/test_ops_round8.py::test_crawl_frontier_stream_equals_batch).

Seen-set state is the persisted-Bloom machinery of
``streaming/bloom_dedup`` (fixed ``m_bits`` bits forever, broadcast
probe join, atomic parquet stage swap, at-least-once fold across
restarts): no link is ever emitted twice (seen keys always probe
positive); a never-seen link is dropped as a Bloom false positive at
the designed rate — at web scale losing one frontier URL in ~10⁴ is
noise, emitting duplicates melts the fetch budget. Optionally the
fetched pages' own canonical URLs fold into the filter first
(``mark_fetched_seen``), so a page already crawled never re-enters
the frontier via someone else's link.

Reference scope note: /root/reference has no crawl ingestion; this
module is part of the LLM-training-data extension surface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.operators.html import html_links
from fortune_500_financial_insights_pipeline_spark.operators.urltools import (
    canonicalize_url,
)
from fortune_500_financial_insights_pipeline_spark.streaming.bloom_dedup import (
    bloom_dedup_batch_fn,
)


def crawl_frontier_batch_fn(
    state_dir: str,
    emit: Callable[[DataFrame, int], None],
    url_col: str = "url",
    html_col: str = "html",
    m_bits: int = 1 << 20,
    k: int = 3,
    mark_fetched_seen: bool = True,
) -> Callable[[DataFrame, int], None]:
    """The foreachBatch function: pages → links → canonical → Bloom
    frontier dedup. Exposed separately so batch backfills replay the
    identical semantics against the same persisted state."""
    def quiet_emit(df: DataFrame, batch_id: int) -> None:
        # the mark-fetched pass (rows carrying __mark) folds state but
        # emits nothing; only real frontier rows reach the user sink
        if "__mark" in df.columns:
            df.count()  # force the fold's probe materialization
            return
        emit(df, batch_id)

    inner = bloom_dedup_batch_fn(
        "frontier_url", state_dir, quiet_emit, m_bits=m_bits, k=k
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        pages = batch_df.select(
            F.xxhash64(batch_df[url_col]).alias("__fid"),
            batch_df[url_col].alias("base_url"),
            batch_df[html_col].alias("html"),
        )
        links = html_links(pages, id_col="__fid").select(
            canonicalize_url("resolved").alias("frontier_url")
        )
        if mark_fetched_seen:
            fetched = batch_df.select(
                canonicalize_url(url_col).alias("frontier_url")
            )
            # fold the fetched pages in FIRST via the silent mark pass:
            # their URLs become seen before this batch's links probe, so
            # a link back to an already-fetched page never re-emits
            inner(fetched.withColumn("__mark", F.lit(True)), batch_id)
            links = links.join(
                fetched.dropDuplicates(["frontier_url"]),
                "frontier_url",
                "left_anti",
            )
        inner(links, batch_id)

    return process


def crawl_frontier_stream(
    pages: DataFrame,
    state_dir: str,
    emit: Callable[[DataFrame, int], None],
    url_col: str = "url",
    html_col: str = "html",
    m_bits: int = 1 << 20,
    k: int = 3,
    mark_fetched_seen: bool = True,
):
    """Wire the frontier expansion into a streaming query: returns the
    DataStreamWriter (caller adds checkpointLocation/trigger and starts
    it)."""
    fn = crawl_frontier_batch_fn(
        state_dir, emit, url_col=url_col, html_col=html_col,
        m_bits=m_bits, k=k, mark_fetched_seen=mark_fetched_seen,
    )
    return pages.writeStream.foreachBatch(fn).outputMode("append")


def polite_frontier_batch_fn(
    state_dir: str,
    emit: Callable[[DataFrame, int], None],
    rules: DataFrame,
    delays: "DataFrame | None" = None,
    url_col: str = "url",
    html_col: str = "html",
    m_bits: int = 1 << 20,
    k: int = 3,
    mark_fetched_seen: bool = True,
    default_delay: float = 1.0,
) -> Callable[[DataFrame, int], None]:
    """The POLITE streaming frontier — the stream twin of
    ``operators/crawl.crawl_bfs_polite``: each micro-batch's
    newly-discovered frontier links are gated through the RFC 9309
    robots rules (``operators/robots.robots_gate`` — broadcast rule
    dim, MAP-ONLY over the frontier) and the allowed slice is stamped
    with per-(batch, host) Crawl-delay fetch slots
    (``operators/crawl.politeness_schedule``) before reaching the
    user sink.

    Emitted rows carry (frontier_url, allowed, quarantined_host,
    fetch_rank, fetch_at_s); disallowed rows are still emitted ONCE
    flagged ``allowed=false`` (the auditable drop record — and their
    fold into the Bloom seen set means a disallowed URL never
    re-enters the frontier through another page's link either).
    Feeding each batch round's ALLOWED fetches back as the next
    micro-batch reproduces the batch loop's output exactly
    (batch_id == depth; pinned by
    tests/test_ops_round9.py::test_polite_frontier_stream_equals_batch).
    """
    from fortune_500_financial_insights_pipeline_spark.operators.crawl import (
        politeness_schedule,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.robots import (
        robots_gate,
    )

    def gated_emit(df: DataFrame, batch_id: int) -> None:
        dim = delays
        if dim is None:
            dim = df.sparkSession.createDataFrame(
                [], "host string, crawl_delay double"
            )
        gated = robots_gate(df, rules, url_col="frontier_url")
        sched = politeness_schedule(
            gated.where(F.col("allowed")),
            dim,
            url_col="frontier_url",
            default_delay=default_delay,
        )
        blocked = (
            gated.where(~F.col("allowed"))
            .withColumn("fetch_rank", F.lit(None).cast("long"))
            .withColumn("fetch_at_s", F.lit(None).cast("double"))
        )
        emit(sched.unionByName(blocked), batch_id)

    return crawl_frontier_batch_fn(
        state_dir, gated_emit, url_col=url_col, html_col=html_col,
        m_bits=m_bits, k=k, mark_fetched_seen=mark_fetched_seen,
    )
