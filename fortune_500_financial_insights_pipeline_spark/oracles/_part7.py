"""Round-7 oracle SQL (see package docstring for conventions)."""

from fortune_500_financial_insights_pipeline_spark.oracles._core import ORACLES

# q_fmp4_frame_index_roundtrip: same generating formulas as the classic
# q_mp4_frame_index_roundtrip key (the fragment walk must recover the
# identical samples), plus the 3-samples-per-moof fragment count.
ORACLES["q_fmp4_frame_index_roundtrip"] = """
WITH ids AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id < 20),
s AS (
  SELECT doc_id,
         unnest(range(0, CAST(6 + doc_id % 5 AS BIGINT))) AS i
  FROM ids
), per AS (
  SELECT doc_id, i,
         10 + (doc_id * 13 + i * 7) % 50 AS sz,
         (doc_id + i) % 256 AS fb,
         100 + 10 * ((doc_id + i) % 4) AS dur
  FROM s
), ts AS (
  SELECT doc_id, i, sz, fb,
         COALESCE(SUM(dur) OVER (PARTITION BY doc_id ORDER BY i
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS dts
  FROM per
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_samples,
       CAST(((6 + doc_id % 5) + 2) // 3 AS BIGINT) AS n_frags,
       CAST(SUM(sz) AS BIGINT) AS sum_bytes,
       CAST(SUM(fb) AS BIGINT) AS sum_first_byte,
       CAST(SUM(dts) AS BIGINT) AS sum_ts_units
FROM ts
GROUP BY doc_id
"""
