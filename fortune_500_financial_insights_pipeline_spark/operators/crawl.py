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


def crawl_bfs_polite(
    pages: DataFrame,
    seeds: DataFrame,
    rounds: int,
    rules: DataFrame,
    delays: "DataFrame | None" = None,
    url_col: str = "url",
    html_col: str = "html",
    default_delay: float = 1.0,
) -> DataFrame:
    """:func:`crawl_bfs` with the robots + politeness contract COMPOSED
    INTO the iteration — the shape a real crawler runs: each round, the
    newly-discovered frontier is gated through :func:`robots_gate`
    BEFORE fetching (disallowed URLs are recorded as discovered but
    never fetched and contribute no links), and the allowed slice is
    stamped with per-host fetch slots by :func:`politeness_schedule`
    (rank within (round, host), ordered by URL for determinism).

    Output: one row per DISCOVERED URL — (url, depth, allowed,
    quarantined_host, fetch_rank, fetch_at_s); rank/fetch time are
    NULL for disallowed rows. Depth remains the minimum hop count over
    the POLITE graph: a page only reachable through a disallowed page
    is simply never discovered.

    100 TB shape: allowed-ness is a property of the URL, not the
    round, so the gate runs exactly TWICE total regardless of depth —
    once over the corpus URL dim up front (the fetchable side the loop
    joins against, so disallowed pages never fetch or expand) and once
    over the final discovered set (for the output verdicts, covering
    dead links the corpus pass never sees). Per round the loop is
    byte-identical to :func:`crawl_bfs` (map-only parse over the
    frontier slice, distinct, anti-join against the hash-partitioned
    seen set). Politeness is ONE (depth, host)-keyed window at the
    end — equivalent to a per-round host window because each round is
    one depth, and politeness bounds per-(host, depth) row counts.
    ``delays`` defaults to an empty dim (every host at
    ``default_delay``); pass ``robots_crawl_delays(robots)`` to honor
    Crawl-delay."""
    from fortune_500_financial_insights_pipeline_spark.operators.robots import (
        robots_gate,
    )

    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    if delays is None:
        delays = pages.sparkSession.createDataFrame(
            [], "host string, crawl_delay double"
        )
    corpus = pages.select(
        F.col(url_col).alias("__url"), F.col(html_col).alias("__html")
    )
    # Gate the corpus ONCE: the loop below only ever fetches from the
    # allowed slice, so a disallowed page contributes no links.
    # Cut once: every round's fetch join re-references this frame, and
    # without the checkpoint the gate would re-run inside every round's
    # eager job.
    allowed_corpus = (
        robots_gate(corpus, rules, url_col="__url")
        .where(F.col("allowed"))
        .select("__url", "__html")
        .localCheckpoint(eager=True)
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
            frontier.join(allowed_corpus, "__url")
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
            .localCheckpoint(eager=True)
        )
        seen = seen.unionByName(new).localCheckpoint(eager=False)
        frontier = new
    # One gate pass over the discovered set for the output verdicts
    # (covers dead links), one (depth, host) politeness window over the
    # allowed rows.
    gated = robots_gate(seen, rules, url_col="__url")
    sched = politeness_schedule(
        gated.where(F.col("allowed")),
        delays,
        url_col="__url",
        default_delay=default_delay,
        partition_extra=("depth",),
    )
    blocked = (
        gated.where(~F.col("allowed"))
        .withColumn("fetch_rank", F.lit(None).cast("long"))
        .withColumn("fetch_at_s", F.lit(None).cast("double"))
    )
    return sched.unionByName(blocked).select(
        F.col("__url").alias(url_col),
        "depth",
        "allowed",
        "quarantined_host",
        "fetch_rank",
        "fetch_at_s",
    )


SITEMAP_URLSET_SCHEMA = (
    "url ARRAY<STRUCT<loc: STRING, lastmod: STRING, "
    "changefreq: STRING, priority: DOUBLE>>"
)
SITEMAP_INDEX_SCHEMA = "sitemap ARRAY<STRUCT<loc: STRING, lastmod: STRING>>"


def sitemap_urls(
    sitemaps: DataFrame,
    host_col: str = "host",
    xml_col: str = "sitemap_xml",
) -> DataFrame:
    """Explode per-host sitemap XML (sitemaps.org protocol) into one
    row per entry: (host, kind, loc, lastmod, priority) — the crawl
    frontier's OTHER seed source besides link extraction. Pure
    Catalyst: Spark's native ``from_xml`` parses both document shapes
    (``<urlset>`` page entries, kind='url', and ``<sitemapindex>``
    child-sitemap pointers, kind='sitemap' — feed those back through
    a fetch to recurse), no UDF, rides whole-stage codegen. A document
    that is neither yields zero rows (from_xml returns null structs) —
    count them upstream if ingest auditing is needed."""
    x = F.col("__xml")
    urlset = F.from_xml(x, SITEMAP_URLSET_SCHEMA)
    index = F.from_xml(x, SITEMAP_INDEX_SCHEMA)
    base = sitemaps.select(
        F.col(host_col).alias("host"), F.col(xml_col).alias("__xml")
    )
    pages = base.select(
        "host",
        F.explode(urlset["url"]).alias("__e"),
    ).select(
        "host",
        F.lit("url").alias("kind"),
        F.col("__e.loc").alias("loc"),
        F.col("__e.lastmod").alias("lastmod"),
        F.col("__e.priority").alias("priority"),
    )
    children = base.select(
        "host",
        F.explode(index["sitemap"]).alias("__e"),
    ).select(
        "host",
        F.lit("sitemap").alias("kind"),
        F.col("__e.loc").alias("loc"),
        F.col("__e.lastmod").alias("lastmod"),
        F.lit(None).cast("double").alias("priority"),
    )
    return pages.unionByName(children)


def politeness_schedule(
    urls: DataFrame,
    delays: DataFrame,
    url_col: str = "url",
    default_delay: float = 1.0,
    partition_extra: "tuple[str, ...]" = (),
) -> DataFrame:
    """Assign each frontier URL a per-host fetch slot honoring the
    host's Crawl-delay: slot k of a host fetches at ``k * delay``
    seconds (k = 0-based rank of the URL within its host, ordered by
    URL for determinism). ``delays`` is a (host, crawl_delay) dim —
    see robots.parse_crawl_delay for extracting it from robots.txt;
    hosts without a row use ``default_delay``. One window per HOST
    (host-keyed partitioning — never a global window; web-scale
    frontiers have millions of hosts and politeness bounds per-host
    row counts) plus a broadcast join of the tiny delay dim. Appends
    ``fetch_rank`` (0-based within host) and ``fetch_at_s``.
    ``partition_extra`` adds columns to the window partition (e.g.
    crawl-round/depth, so each round's slots restart at 0)."""
    from pyspark.sql import Window as W

    c = F.col(url_col)
    host = F.lower(
        F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    host = F.regexp_replace(host, r":\d+$", "")
    keyed = urls.withColumn("__host", host)
    # Project the dim to exactly (host, crawl_delay): robots_crawl_delays
    # emits extra audit columns (e.g. ``quarantined``) that must not leak
    # into every output row of the URL frame.
    joined = keyed.join(
        F.broadcast(delays.select(F.col("host").alias("__host"), "crawl_delay")),
        "__host",
        "left",
    )
    w = W.partitionBy("__host", *partition_extra).orderBy(c)
    return (
        joined.withColumn(
            "fetch_rank", (F.row_number().over(w) - 1).cast("long")
        )
        .withColumn(
            "fetch_at_s",
            F.round(
                F.col("fetch_rank")
                * F.coalesce("crawl_delay", F.lit(float(default_delay))),
                6,
            ),
        )
        .drop("__host", "crawl_delay")
    )


def recrawl_delta(
    entries: DataFrame,
    state: DataFrame,
    url_col: str = "loc",
    lastmod_col: str = "lastmod",
    state_url_col: str = "url",
    fetched_col: str = "last_fetch",
) -> DataFrame:
    """Incremental RECRAWL scheduling — the lifecycle stage after
    discovery: sitemap entries (or any (url, lastmod) feed) against the
    crawl state (url, last_fetch) classify into ``action``:

    * ``new``    — never fetched (no state row): fetch;
    * ``stale``  — lastmod after last_fetch: re-fetch;
    * ``fresh``  — fetched at/after lastmod: skip;
    * ``unknown``— entry carries no lastmod: policy row (callers decide
      a TTL; emitting it distinctly keeps the decision auditable).

    Pure relational: one url-keyed left join (state is the big side at
    web scale — both sides hash-partition on url, no window, no UDF).
    Timestamps compare TEMPORALLY: sitemaps.org allows full W3C
    datetime with timezone offsets and mixed precision (date-only vs
    datetime, '+02:00' vs 'Z'), where lexicographic order diverges from
    temporal order — both sides parse with try_to_timestamp (date-only
    coalesces to midnight, offsets normalize); rows where either side
    fails to parse fall back to the string compare rather than silently
    misclassifying."""
    e = entries.withColumnRenamed(url_col, "__u")
    s = state.select(
        F.col(state_url_col).alias("__u"),
        F.col(fetched_col).alias("__fetched"),
    )
    joined = e.join(s, "__u", "left")
    lm_ts = F.try_to_timestamp(F.col(lastmod_col))
    ft_ts = F.try_to_timestamp(F.col("__fetched"))
    newer = F.when(
        lm_ts.isNotNull() & ft_ts.isNotNull(), lm_ts > ft_ts
    ).otherwise(F.col(lastmod_col) > F.col("__fetched"))
    action = (
        F.when(F.col("__fetched").isNull(), F.lit("new"))
        .when(F.col(lastmod_col).isNull(), F.lit("unknown"))
        .when(newer, F.lit("stale"))
        .otherwise(F.lit("fresh"))
    )
    return (
        joined.withColumn("action", action)
        .withColumn("last_fetch", F.col("__fetched"))
        .drop("__fetched")
        .withColumnRenamed("__u", url_col)
    )


def crawl_budget(
    urls: DataFrame,
    budget: int,
    url_col: str = "loc",
    priority_col: str = "priority",
    per_host_cap: "int | None" = None,
    default_priority: float = 0.5,
) -> DataFrame:
    """Allocate a GLOBAL fetch budget across hosts host-fairly with
    priority tie-breaking — the crawl-budget stage between frontier
    discovery and the fetch schedule: every host's URLs are ranked
    within the host (priority DESC, URL ASC — sitemaps.org priority,
    nulls at ``default_priority``), optionally capped per host, and
    the budget then fills HOST-RANK LEVELS in order (every host's
    best URL first, then every host's second, ...) — the fair
    round-robin real crawlers run so one mega-site cannot starve the
    long tail — with (priority DESC, URL ASC) ordering inside the
    partially-funded level.

    Appends host_rank, capped, and selected to the input rows (full
    pass-through: the unselected remainder is the carry-over frontier
    for the next cycle).

    100 TB shape: NO global sort — selection decomposes into (a) a
    host-keyed window (politeness bounds per-host rows), (b) a
    LEVEL-keyed window whose partition count is ``per_host_cap`` and
    whose partitions hold at most one URL per host, and (c) a
    broadcast join of the per-level cumulative counts (rows =
    levels). ``selected`` is then the single rule cum_before_level +
    intra_level_rank < budget, which covers fully-funded, partial,
    and unfunded levels alike. At extreme host counts the one
    partially-funded level's exact rank can be swapped for a priority
    -threshold estimate without changing the operator shape."""
    from pyspark.sql import Window as W

    c = F.col(url_col)
    host = F.lower(
        F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    host = F.regexp_replace(host, r":\d+$", "")
    pr = F.coalesce(
        F.col(priority_col).cast("double"), F.lit(float(default_priority))
    )
    keyed = urls.withColumn("__host", host).withColumn("__pr", pr)
    w_host = W.partitionBy("__host").orderBy(F.desc("__pr"), c)
    ranked = keyed.withColumn(
        "host_rank", (F.row_number().over(w_host) - 1).cast("long")
    ).withColumn(
        "capped",
        F.lit(False)
        if per_host_cap is None
        else F.col("host_rank") >= int(per_host_cap),
    )
    eligible = ranked.where(~F.col("capped"))
    lvl = eligible.groupBy("host_rank").agg(F.count(F.lit(1)).alias("__n"))
    w_lvl = (
        W.orderBy("host_rank").rowsBetween(W.unboundedPreceding, -1)
    )  # level dim only: rows = per_host_cap levels, never URL-sized
    lvl = lvl.withColumn(
        "__cum_before", F.coalesce(F.sum("__n").over(w_lvl), F.lit(0))
    ).select("host_rank", "__cum_before")
    w_in_lvl = W.partitionBy("host_rank").orderBy(F.desc("__pr"), c)
    sel = (
        eligible.join(F.broadcast(lvl), "host_rank")
        .withColumn("__lr", F.row_number().over(w_in_lvl) - 1)
        .withColumn(
            "selected", F.col("__cum_before") + F.col("__lr") < int(budget)
        )
        .drop("__cum_before", "__lr")
    )
    rejected = ranked.where(F.col("capped")).withColumn(
        "selected", F.lit(False)
    )
    return sel.unionByName(rejected).drop("__host", "__pr")


def host_quality_gate(
    docs: DataFrame,
    url_col: str = "url",
    quality_col: str = "quality",
    min_host_quality: float = 0.5,
    min_docs: int = 5,
    scale: int = 1_000_000,
) -> DataFrame:
    """HOST-level quality gating — the domain-reputation filter web
    curation runs before per-document rules (a spam domain's every
    page is suspect even when individual pages score adequately):
    per-host mean quality decides the whole host; hosts with fewer
    than ``min_docs`` documents pass ungated (insufficient evidence —
    they fall through to the per-doc gates downstream).

    Appends host, host_n_docs, host_mean_quality (rounded 1e-6) and
    host_blocked to every input row, 1:1 pass-through — callers filter
    on ``host_blocked`` and keep the audit columns for the funnel
    report. The mean is computed over an EXACT integer interior
    (quality scaled by ``scale`` and summed as BIGINT, one rounded
    double division at the end), so a SQL oracle reproduces it
    bit-for-bit regardless of float summation order.

    100 TB shape: one host-keyed aggregate (host-count-sized result)
    and one host equi-join back — both hash-partition on host, and
    politeness/budget bounds upstream keep per-host row counts sane;
    no window, no UDF, no driver state."""
    c = F.col(url_col)
    host = F.lower(
        F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    host = F.regexp_replace(host, r":\d+$", "")
    keyed = docs.withColumn("host", host)
    q_int = F.round(F.col(quality_col) * scale).cast("long")
    stats = keyed.groupBy("host").agg(
        F.count(F.lit(1)).alias("host_n_docs"),
        F.round(
            F.sum(q_int) / (F.count(F.lit(1)) * F.lit(float(scale))), 6
        ).alias("host_mean_quality"),
    )
    return keyed.join(stats, "host").withColumn(
        "host_blocked",
        (F.col("host_n_docs") >= int(min_docs))
        & (F.col("host_mean_quality") < float(min_host_quality)),
    )
