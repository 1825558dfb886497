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
