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

# q_substring_reconcile: the CDC chunk chain (q_boilerplate_chunks CTEs,
# plus per-chunk start/length), the >= 2 distinct-doc recount (flagged ==
# dup: the cascade is always-positive and realizes zero Bloom FPs at this
# fill ratio), and the brute-force suffix LCP spans (q_suffix_lcp_spans
# CTEs, lcp >= 3, cross-doc) exploded to token positions for the
# coverage fraction.
ORACLES["q_substring_reconcile"] = """
WITH docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 40
), t AS (
  SELECT doc_id, i - 1 AS pos, l[i] AS tok
  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l))) AS i
        FROM (SELECT doc_id, string_split(text, ' ') AS l FROM docs))
), g AS (
  SELECT doc_id, pos, tok,
         CASE WHEN pos >= 2
               AND ('0x' || substr(md5(concat_ws(' ',
                     LAG(tok, 2) OVER w, LAG(tok, 1) OVER w, tok)),
                     1, 15))::BIGINT % 16 = 0
              THEN 1 ELSE 0 END AS b
  FROM t WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), c AS (
  SELECT doc_id, pos, tok,
         COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS chunk_id
  FROM g
), ch AS (
  SELECT doc_id, chunk_id, MIN(pos) AS chunk_start, COUNT(*) AS n_tokens,
         md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_hash
  FROM c GROUP BY doc_id, chunk_id
), freq AS (
  SELECT chunk_hash, COUNT(DISTINCT doc_id) >= 2 AS is_dup
  FROM ch GROUP BY chunk_hash
), chunk_stats AS (
  SELECT COUNT(*) AS n_chunks,
         SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS n_dup_chunks
  FROM freq
), sl AS (
  SELECT doc_id, i - 1 AS pos, l[i:] AS sl, array_to_string(l[i:], ' ') AS suf
  FROM (SELECT doc_id, l, unnest(range(1, len(l) + 1)) AS i
        FROM (SELECT doc_id, string_split(text, ' ') AS l FROM docs))
), ranked AS (
  SELECT doc_id, pos, sl,
         ROW_NUMBER() OVER (ORDER BY suf, doc_id, pos) AS rk
  FROM sl
), pairs AS (
  SELECT a.doc_id AS doc_a, a.pos AS pos_a, b.doc_id AS doc_b,
         b.pos AS pos_b, a.sl AS sa, b.sl AS sb
  FROM ranked a JOIN ranked b ON b.rk = a.rk + 1
), scored AS (
  SELECT doc_a, pos_a, doc_b, pos_b,
         CAST(CASE WHEN fm = 0 OR fm IS NULL
                   THEN LEAST(len(sa), len(sb))
                   ELSE fm - 1 END AS BIGINT) AS lcp
  FROM (
    SELECT *,
           list_position(
             list_transform(range(1, LEAST(len(sa), len(sb)) + 1),
                            i -> sa[i] != sb[i]),
             true) AS fm
    FROM pairs)
  WHERE doc_a != doc_b
), spans AS (
  SELECT * FROM scored WHERE lcp >= 3
), dup_pos AS (
  SELECT DISTINCT doc, pos FROM (
    SELECT doc_a AS doc, unnest(generate_series(pos_a, pos_a + CAST(lcp AS INTEGER) - 1)) AS pos FROM spans
    UNION ALL
    SELECT doc_b AS doc, unnest(generate_series(pos_b, pos_b + CAST(lcp AS INTEGER) - 1)) AS pos FROM spans
  )
), flagged_pos AS (
  SELECT DISTINCT ch.doc_id AS doc,
         unnest(generate_series(CAST(ch.chunk_start AS INTEGER),
                                CAST(ch.chunk_start + ch.n_tokens - 1 AS INTEGER))) AS pos
  FROM ch JOIN freq USING (chunk_hash) WHERE freq.is_dup
), pos_stats AS (
  SELECT (SELECT COUNT(*) FROM dup_pos) AS n_dup_positions,
         (SELECT COUNT(*) FROM dup_pos d
            WHERE EXISTS (SELECT 1 FROM flagged_pos f
                          WHERE f.doc = d.doc AND f.pos = d.pos))
           AS n_covered_positions
)
SELECT CAST(n_chunks AS BIGINT) AS n_chunks,
       CAST(n_dup_chunks AS BIGINT) AS n_dup_chunks,
       CAST(n_dup_chunks AS BIGINT) AS n_flagged_chunks,
       CAST(0 AS BIGINT) AS n_missed_chunks,
       CAST(0 AS BIGINT) AS n_over_chunks,
       CAST(n_dup_positions AS BIGINT) AS n_dup_positions,
       CAST(n_covered_positions AS BIGINT) AS n_covered_positions,
       CASE WHEN n_dup_positions > 0
            THEN ROUND(CAST(n_covered_positions AS DOUBLE) / n_dup_positions, 6)
            ELSE NULL END AS span_coverage
FROM chunk_stats, pos_stats
"""

# q_warc_crawl_extract: the archive constants (3 records per doc, HTTP
# 200) plus the q_html_main_extract page-generator replay (15-token
# chunks, planted entity, >= 30-char keep rule) over doc_id < 30 — the
# container walk itself has no SQL analogue, so the oracle certifies
# that whatever came OUT of gzip members -> WARC framing -> HTTP split
# is byte-for-byte the planted page's main text.
ORACLES["q_warc_crawl_extract"] = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS l
  FROM documents WHERE doc_id < 30
), ch AS (
  SELECT doc_id, k.k,
         array_to_string(l[15 * k.k + 1 : 15 * k.k + 15], ' ') AS raw
  FROM d,
       LATERAL (SELECT unnest(range(0, CAST(ceil(len(l) / 15.0) AS BIGINT)))
                AS k) k
), paras AS (
  SELECT doc_id, k,
         trim(regexp_replace(
           CASE WHEN k = 0 THEN raw || ' A&B' ELSE raw END,
           '\\s+', ' ', 'g')) AS p
  FROM ch
), kept AS (
  SELECT doc_id, k, p FROM paras WHERE length(p) >= 30
), agg AS (
  SELECT doc_id,
         COUNT(*) AS n_kept,
         string_agg(p, chr(10) ORDER BY k) AS main
  FROM kept GROUP BY doc_id
), blocks AS (
  SELECT doc_id, COUNT(*) FILTER (WHERE p <> '') AS n_paras FROM paras
  GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(3 AS INTEGER) AS n_records,
       CAST(200 AS INTEGER) AS http_status,
       CAST(b.n_paras + 4 AS INTEGER) AS n_blocks,
       CAST(COALESCE(a.n_kept, 0) AS INTEGER) AS n_kept,
       CAST(length(COALESCE(a.main, '')) AS INTEGER) AS main_chars,
       md5(COALESCE(a.main, '')) AS main_md5
FROM blocks b LEFT JOIN agg a USING (doc_id)
"""

# q_robots_gate: RFC 9309 longest-match replayed in SQL — odd-k hosts
# block /path/ except the longer Allow: /path/2 prefix (doc_id text
# starting with '2'); even-k hosts have no robots.txt (all allowed);
# the badbot group must not affect the default agent.
ORACLES["q_robots_gate"] = """
WITH d AS (
  SELECT doc_id, doc_id % 7 AS k FROM documents WHERE doc_id < 200
), urls AS (
  SELECT doc_id, k, '/path/' || doc_id AS path FROM d
  UNION ALL
  SELECT doc_id, k, '/open/' || doc_id AS path FROM d
), verdicts AS (
  SELECT k,
         CASE
           WHEN k % 2 = 0 THEN TRUE
           WHEN path LIKE '/path/2%' THEN TRUE
           WHEN path LIKE '/path/%' THEN FALSE
           ELSE TRUE
         END AS allowed
  FROM urls
)
SELECT 'example' || k || '.com' AS host,
       CAST(COUNT(*) AS BIGINT) AS n_urls,
       CAST(SUM(CASE WHEN allowed THEN 1 ELSE 0 END) AS BIGINT) AS n_allowed,
       CAST(SUM(CASE WHEN NOT allowed THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked
FROM verdicts
GROUP BY k
"""

# q_link_frontier: the four resolution shapes (root, dot-segment
# relative, absolute, plain relative) and the canonical rules (tracking
# strip + byte-sorted params) replayed per link index.
ORACLES["q_link_frontier"] = """
WITH d AS (
  SELECT doc_id, doc_id % 7 AS k FROM documents WHERE doc_id < 200
), links AS (
  SELECT doc_id, 0 AS link_idx,
         '/' AS href,
         'http://example' || k || '.com/' AS resolved,
         'http://example' || k || '.com/' AS canon
  FROM d
  UNION ALL
  SELECT doc_id, 1,
         '../up/' || doc_id,
         'http://example' || k || '.com/dir/up/' || doc_id,
         'http://example' || k || '.com/dir/up/' || doc_id
  FROM d
  UNION ALL
  SELECT doc_id, 2,
         'http://other' || k || '.com/abs/' || doc_id
           || '?b=2&utm_source=x&a=1',
         'http://other' || k || '.com/abs/' || doc_id
           || '?b=2&utm_source=x&a=1',
         'http://other' || k || '.com/abs/' || doc_id || '?a=1&b=2'
  FROM d
  UNION ALL
  SELECT doc_id, 3,
         'deep/' || doc_id,
         'http://example' || k || '.com/dir/sub/deep/' || doc_id,
         'http://example' || k || '.com/dir/sub/deep/' || doc_id
  FROM d
)
SELECT doc_id, CAST(link_idx AS INTEGER) AS link_idx, href, resolved, canon
FROM links
"""
