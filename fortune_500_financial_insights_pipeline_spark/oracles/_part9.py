"""Round-9 oracle SQL: the polite crawl iteration and the
crawl→curation dedup seam."""

from fortune_500_financial_insights_pipeline_spark.oracles._core import ORACLES

# q_crawl_bfs_polite: min-depth BFS over the arithmetic link graph,
# but expansion is CUT at blocked nodes (h2 = d%3==2 entirely; h1's
# wildcard Disallow /p/*3$ = d%3==1 and d%10==3) — a page reachable
# only through a blocked page is never discovered.  Politeness ranks
# replay the engine's per-(round, host) row_number over allowed rows
# ordered by URL string; delays: h0 1.0, h1 2.5 (h2 rows are all
# blocked so its delay never surfaces).
ORACLES["q_crawl_bfs_polite"] = """
WITH RECURSIVE links AS (
  SELECT doc_id AS u, (3 * doc_id + 1) % 60 AS v
  FROM documents WHERE doc_id < 60
  UNION ALL
  SELECT doc_id, (7 * doc_id + 2) % 60 FROM documents WHERE doc_id < 60
  UNION ALL
  SELECT doc_id, (doc_id + 1) % 60 FROM documents WHERE doc_id < 60
), bfs(u, d) AS (
  SELECT * FROM (VALUES (0, 0), (1, 0), (2, 0)) t(u, d)
  UNION ALL
  SELECT l.v, b.d + 1
  FROM bfs b JOIN links l ON l.u = b.u
  WHERE b.d < 3
    AND NOT (b.u % 3 = 2 OR (b.u % 3 = 1 AND b.u % 10 = 3))
), disc AS (
  SELECT u, MIN(d) AS depth FROM bfs GROUP BY u
), r AS (
  SELECT u, depth,
         'http://h' || (u % 3) || '.test/p/' || u AS url,
         NOT (u % 3 = 2 OR (u % 3 = 1 AND u % 10 = 3)) AS allowed,
         u % 3 AS h
  FROM disc
), ranked AS (
  SELECT u, depth, url, allowed, h,
         ROW_NUMBER() OVER (
           PARTITION BY depth, h, allowed ORDER BY url
         ) - 1 AS rk
  FROM r
)
SELECT CAST(u AS BIGINT) AS doc_id,
       url,
       CAST(depth AS INTEGER) AS depth,
       allowed,
       FALSE AS quarantined_host,
       CASE WHEN allowed THEN CAST(rk AS BIGINT) END AS fetch_rank,
       CASE WHEN allowed THEN
         ROUND(rk * (CASE h WHEN 0 THEN 1.0 WHEN 1 THEN 2.5 ELSE 1.0 END), 6)
       END AS fetch_at_s
FROM ranked
ORDER BY doc_id
"""
