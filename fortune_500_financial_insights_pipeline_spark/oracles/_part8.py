"""Round-8 oracle SQL: wildcard robots gate and the composed crawl
pipeline."""

from fortune_500_financial_insights_pipeline_spark.oracles._core import ORACLES

# q_robots_wildcard: RFC 9309 wildcard shapes replayed in SQL — on
# wildcard hosts (k 0-2) only the /search?safe= URL survives (the
# longer Allow outranks Disallow: /*?); the malformed host (k=3) is
# quarantined to disallow-all; host k=4 has no robots.txt (all
# allowed). The named agent 'trainingbot' must fall back to the '*'
# group for any rule to apply at all.
ORACLES["q_robots_wildcard"] = """
WITH d AS (
  SELECT doc_id, doc_id % 5 AS k FROM documents WHERE doc_id < 200
), urls AS (
  SELECT k, 'page' AS shape FROM d
  UNION ALL SELECT k, 'search' FROM d
  UNION ALL SELECT k, 'gif' FROM d
  UNION ALL SELECT k, 'cart' FROM d
), verdicts AS (
  SELECT k,
         CASE
           WHEN k = 4 THEN TRUE
           WHEN k = 3 THEN FALSE
           WHEN shape = 'search' THEN TRUE
           ELSE FALSE
         END AS allowed,
         (k = 3) AS quarantined
  FROM urls
)
SELECT 'example' || k || '.com' AS host,
       CAST(COUNT(*) AS BIGINT) AS n_urls,
       CAST(SUM(CASE WHEN allowed THEN 1 ELSE 0 END) AS BIGINT) AS n_allowed,
       CAST(SUM(CASE WHEN NOT allowed THEN 1 ELSE 0 END) AS BIGINT)
         AS n_blocked,
       CAST(SUM(CASE WHEN quarantined THEN 1 ELSE 0 END) AS BIGINT)
         AS n_quarantined
FROM verdicts
GROUP BY k
"""

# q_crawl_pipeline_e2e: the composed crawl funnel replayed — 3 WARC
# records per doc, the robots verdict (odd hosts block /dir/ except
# doc-ids starting with '2' via the longer Allow), the page-generator
# main-text formula (md5-prefix checksum, q_web_pipeline_e2e's proven
# replay) over ALLOWED docs only, and the five resolved+canonical link
# shapes per allowed page (4 host-shared + 1 per-doc deep link).
ORACLES["q_crawl_pipeline_e2e"] = """
WITH d AS (
  SELECT doc_id, doc_id % 7 AS k, string_split(text, ' ') AS l
  FROM documents WHERE doc_id < 40
), allowed AS (
  SELECT * FROM d
  WHERE k % 2 = 0 OR CAST(doc_id AS VARCHAR) LIKE '2%'
), ch AS (
  SELECT doc_id, kk.kk AS pk,
         array_to_string(l[15 * kk.kk + 1 : 15 * kk.kk + 15], ' ') AS raw
  FROM allowed,
       LATERAL (SELECT unnest(range(0, CAST(ceil(len(l) / 15.0) AS BIGINT)))
                AS kk) kk
), paras AS (
  SELECT doc_id, pk,
         trim(regexp_replace(
           CASE WHEN pk = 0 THEN raw || ' A&B' ELSE raw END,
           '\\s+', ' ', 'g')) AS p
  FROM ch
), mains AS (
  SELECT a.doc_id,
         replace(COALESCE(m.main, ''), chr(10), ' ') AS main_sp
  FROM allowed a LEFT JOIN (
    SELECT doc_id, string_agg(p, chr(10) ORDER BY pk) AS main
    FROM paras WHERE length(p) >= 30 GROUP BY doc_id
  ) m USING (doc_id)
), links AS (
  SELECT 'http://example' || k || '.com/' AS canon FROM allowed
  UNION ALL
  SELECT 'http://example' || k || '.com/about' FROM allowed
  UNION ALL
  SELECT 'http://example' || k || '.com/contact' FROM allowed
  UNION ALL
  SELECT 'http://example' || k || '.com/ad' FROM allowed
  UNION ALL
  SELECT 'http://example' || k || '.com/dir/deep/' || doc_id FROM allowed
)
SELECT CAST((SELECT COUNT(*) FROM d) * 3 AS BIGINT) AS n_records,
       CAST((SELECT COUNT(*) FROM d) AS BIGINT) AS n_responses,
       CAST((SELECT COUNT(*) FROM allowed) AS BIGINT) AS n_allowed,
       CAST((SELECT COUNT(*) FROM d) - (SELECT COUNT(*) FROM allowed)
            AS BIGINT) AS n_blocked,
       CAST((SELECT COUNT(*) FROM mains WHERE length(main_sp) > 0)
            AS BIGINT) AS n_texts,
       CAST((SELECT SUM(('0x' || substr(md5(main_sp), 1, 8))::BIGINT)
             FROM mains) AS BIGINT) AS main_checksum,
       CAST((SELECT COUNT(*) FROM links) AS BIGINT) AS n_links,
       CAST((SELECT COUNT(DISTINCT canon) FROM links) AS BIGINT)
         AS n_frontier
"""

# q_warc_split_ingest: archive constants replayed — 2 gzip members per
# doc (response + metadata), response body = the document text.
ORACLES["q_warc_split_ingest"] = """
SELECT doc_id,
       CAST(2 AS BIGINT) AS n_members,
       CAST(2 AS BIGINT) AS n_records,
       CAST(1 AS BIGINT) AS n_responses,
       md5(text) AS text_md5
FROM documents WHERE doc_id < 30
"""

# q_crawl_bfs_frontier: min-depth BFS over the arithmetic link graph
# page d -> {(3d+1)%60, (7d+2)%60, (d+1)%60}, seeds {0,1}, 3 rounds.
ORACLES["q_crawl_bfs_frontier"] = """
WITH RECURSIVE links AS (
  SELECT doc_id AS u, (3 * doc_id + 1) % 60 AS v
  FROM documents WHERE doc_id < 60
  UNION ALL
  SELECT doc_id, (7 * doc_id + 2) % 60 FROM documents WHERE doc_id < 60
  UNION ALL
  SELECT doc_id, (doc_id + 1) % 60 FROM documents WHERE doc_id < 60
), bfs(u, d) AS (
  SELECT * FROM (VALUES (0, 0), (1, 0)) t(u, d)
  UNION ALL
  SELECT l.v, b.d + 1
  FROM bfs b JOIN links l ON l.u = b.u
  WHERE b.d < 3
)
SELECT CAST(u AS BIGINT) AS doc_id,
       'http://crawl.test/p/' || u AS url,
       CAST(MIN(d) AS INTEGER) AS depth
FROM bfs
GROUP BY u
ORDER BY doc_id
"""

# q_sitemap_ingest: the XML-generation arithmetic replayed — even-k
# docs a 2-entry urlset (priority on entry 0 only), odd-k docs a
# 1-child sitemapindex.
ORACLES["q_sitemap_ingest"] = """
WITH d AS (
  SELECT doc_id, doc_id % 5 AS k,
         lpad(CAST(1 + doc_id % 27 AS VARCHAR), 2, '0') AS day
  FROM documents WHERE doc_id < 50
), e AS (
  SELECT doc_id, 'url' AS kind,
         'http://example' || k || '.com/s/' || doc_id || '/0' AS loc,
         '2026-01-' || day AS lastmod,
         (doc_id % 10) / 10.0 AS priority
  FROM d WHERE k % 2 = 0
  UNION ALL
  SELECT doc_id, 'url',
         'http://example' || k || '.com/s/' || doc_id || '/1',
         '2026-01-' || day, CAST(NULL AS DOUBLE)
  FROM d WHERE k % 2 = 0
  UNION ALL
  SELECT doc_id, 'sitemap',
         'http://example' || k || '.com/sitemap' || doc_id || '.xml',
         '2026-01-' || day, CAST(NULL AS DOUBLE)
  FROM d WHERE k % 2 = 1
)
SELECT doc_id, kind, loc, lastmod, priority FROM e ORDER BY doc_id, loc
"""

# q_politeness_schedule: per-host delays (odd k -> k+0.5 from the '*'
# group, k=2 -> 86400 quarantine, else the 2.0 default) and the
# 0..n-1 rank arithmetic series replayed in closed form (all values
# binary-exact, so row-wise rounding == closed-form rounding).
ORACLES["q_politeness_schedule"] = """
WITH d AS (
  SELECT doc_id, doc_id % 7 AS k FROM documents WHERE doc_id < 200
), n AS (
  SELECT k, 2 * COUNT(*) AS n_urls FROM d GROUP BY k
), del AS (
  SELECT k,
         CASE WHEN k = 2 THEN 86400.0
              WHEN k % 2 = 1 THEN k + 0.5
              ELSE 2.0 END AS delay
  FROM n
)
SELECT 'example' || n.k || '.com' AS host,
       CAST(n.n_urls AS BIGINT) AS n_urls,
       CAST(n.n_urls - 1 AS BIGINT) AS max_rank,
       ROUND((n.n_urls - 1) * del.delay, 6) AS last_fetch_s,
       ROUND(del.delay * n.n_urls * (n.n_urls - 1) / 2, 6) AS total_wait_s
FROM n JOIN del USING (k)
ORDER BY host
"""

# q_recrawl_delta: date arithmetic replayed — entry 0 fetched at
# 2026-01-(1+(3d)%27) vs lastmod 2026-01-(1+d%27): stale iff lastmod >
# last_fetch (lexicographic == temporal for zero-padded ISO); entry 1
# never fetched -> 'new' (state-missing outranks the missing-lastmod
# 'unknown' class, which only applies to d%4==0 rows WITH state — none
# here, so entry 1 is always 'new').
ORACLES["q_recrawl_delta"] = """
WITH d AS (
  SELECT doc_id, doc_id % 5 AS k,
         lpad(CAST(1 + doc_id % 27 AS VARCHAR), 2, '0') AS day,
         lpad(CAST(1 + (3 * doc_id) % 27 AS VARCHAR), 2, '0') AS fday
  FROM documents WHERE doc_id < 50 AND (doc_id % 5) % 2 = 0
), e AS (
  SELECT doc_id,
         'http://example' || k || '.com/s/' || doc_id || '/0' AS loc,
         '2026-01-' || day AS lastmod,
         '2026-01-' || fday AS last_fetch,
         CASE WHEN '2026-01-' || day > '2026-01-' || fday
              THEN 'stale' ELSE 'fresh' END AS action
  FROM d
  UNION ALL
  SELECT doc_id,
         'http://example' || k || '.com/s/' || doc_id || '/1',
         CASE WHEN doc_id % 4 = 0 THEN NULL
              ELSE '2026-01-' || day END,
         CAST(NULL AS VARCHAR),
         'new'
  FROM d
)
SELECT doc_id, loc, lastmod, last_fetch, action FROM e
ORDER BY doc_id, loc
"""

# q_warc_charset_text: the per-class decoded strings replayed — the
# engine must decode 0xE9 as 'é' under ISO-8859-1 and the 3-byte № under
# UTF-8, fall back to UTF-8 when no charset parameter is present, and
# quarantine the unknown charset row to NULL text.
ORACLES["q_warc_charset_text"] = """
SELECT doc_id,
       CASE doc_id % 4
         WHEN 0 THEN 'utf-8'
         WHEN 1 THEN 'iso-8859-1'
         WHEN 2 THEN 'utf-8'
         ELSE 'klingon' END AS charset,
       (doc_id % 4) <> 3 AS decode_ok,
       CASE doc_id % 4
         WHEN 0 THEN md5('Prix é № ' || doc_id)
         WHEN 1 THEN md5('Prix é ' || doc_id)
         WHEN 2 THEN md5('Plain ' || doc_id)
         ELSE NULL END AS text_md5
FROM documents WHERE doc_id < 40
ORDER BY doc_id
"""
