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

# q_crawl_dedup_e2e: the synthetic page text, trigram shingles, md5
# double-hash signatures, 4-band keys, bucket candidates, exact Jaccard
# (>= 0.2), and the component closure replayed relationally — mirrors
# ORACLES["q_minhash_portable"] with the text GENERATED (tiers 0/1 of a
# group share vocab, tier 1 differs at word 15; tier 2 doc-private) and
# a recursive min-label closure appended.
ORACLES["q_crawl_dedup_e2e"] = """
WITH RECURSIVE base AS (
  SELECT doc_id AS d, doc_id % 10 AS g, doc_id // 10 AS t
  FROM documents WHERE doc_id < 30
), txt AS (
  SELECT d, g,
         string_agg(
           CASE WHEN t = 2 THEN 'z' || d || '_' || j
                WHEN t = 1 AND j = 15 THEN 'x' || g || '_15'
                ELSE 'w' || g || '_' || j END,
           ' ' ORDER BY j) AS text
  FROM base, range(30) r(j)
  GROUP BY d, g, t
), g3 AS (
  SELECT d, UNNEST(list_distinct(
    list_transform(range(1, len(l) - 1),
                   x -> l[x] || ' ' || l[x+1] || ' ' || l[x+2]))) AS gram
  FROM (SELECT d, string_split(text, ' ') AS l FROM txt)
), h AS (
  SELECT d,
         ('0x' || substr(md5(gram), 1, 15))::BIGINT AS u1,
         ('0x' || substr(md5(gram), 17, 15))::BIGINT % 72057594037927936 AS u2
  FROM g3
), sig AS (
  SELECT d, t.i, MIN((u1 + t.i * u2) % 1152921504606846976) AS v
  FROM h CROSS JOIN (SELECT UNNEST(range(0, 16)) AS i) t
  GROUP BY d, t.i
), bandk AS (
  SELECT d, CAST(i // 4 AS BIGINT) AS band,
         string_agg(CAST(v AS VARCHAR), '_' ORDER BY i) AS key
  FROM sig GROUP BY 1, 2
), cand AS (
  SELECT a.d AS id_a, b.d AS id_b
  FROM bandk a
  JOIN bandk b ON a.band = b.band AND a.key = b.key AND a.d < b.d
  GROUP BY 1, 2
), sizes AS (
  SELECT d, COUNT(*) AS n FROM g3 GROUP BY d
), inter AS (
  SELECT ga.d AS id_a, gb.d AS id_b, COUNT(*) AS ninter
  FROM g3 ga JOIN g3 gb ON ga.gram = gb.gram AND ga.d < gb.d
  GROUP BY 1, 2
), pairs AS (
  SELECT id_a, id_b FROM (
    SELECT c.id_a, c.id_b,
           ROUND(CAST(COALESCE(i.ninter, 0) AS DOUBLE)
                 / (sa.n + sb.n - COALESCE(i.ninter, 0)), 6) AS jac
    FROM cand c
    JOIN sizes sa ON sa.d = c.id_a
    JOIN sizes sb ON sb.d = c.id_b
    LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
  ) WHERE jac >= 0.2
), edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
), reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
), comp AS (
  SELECT u AS d, LEAST(u, MIN(v)) AS comp FROM reach GROUP BY u
), np AS (
  SELECT d, COUNT(*) AS n_pairs FROM (
    SELECT id_a AS d FROM pairs UNION ALL SELECT id_b FROM pairs
  ) GROUP BY d
)
SELECT b.d AS doc_id,
       'http://dup' || b.g || '.com/p/' || b.d AS url,
       CAST(COALESCE(c.comp, b.d) AS BIGINT) AS cluster_id,
       COALESCE(c.comp, b.d) = b.d AS kept,
       CAST(COALESCE(np.n_pairs, 0) AS BIGINT) AS n_pairs
FROM base b
LEFT JOIN comp c ON c.d = b.d
LEFT JOIN np ON np.d = b.d
ORDER BY doc_id
"""

# q_minhash_incremental: full-corpus portable LSH candidates with
# both-old pairs EXCLUDED — the incremental contract: identical hash
# family / banding / verify as ORACLES["q_minhash_portable"], text
# generated (50 shared words per vocab group, one variant word at
# position 5+5t), pair_kind by the id-40 boundary (id_a >= 40 -> both
# sides new).
ORACLES["q_minhash_incremental"] = """
WITH base AS (
  SELECT doc_id AS d, doc_id % 20 AS v, doc_id // 20 AS t
  FROM documents WHERE doc_id < 80
), txt AS (
  SELECT d, v, t,
         string_agg(CASE WHEN j = 5 + 5 * t THEN 'x' || v || '_' || t
                         ELSE 'w' || v || '_' || j END,
                    ' ' ORDER BY j) AS text
  FROM base, range(50) r(j)
  GROUP BY d, v, t
), g AS (
  SELECT d, UNNEST(list_distinct(
    list_transform(range(1, len(l) - 1),
                   x -> l[x] || ' ' || l[x+1] || ' ' || l[x+2]))) AS gram
  FROM (SELECT d, string_split(text, ' ') AS l FROM txt)
), h AS (
  SELECT d,
         ('0x' || substr(md5(gram), 1, 15))::BIGINT AS u1,
         ('0x' || substr(md5(gram), 17, 15))::BIGINT % 72057594037927936 AS u2
  FROM g
), sig AS (
  SELECT d, t.i, MIN((u1 + t.i * u2) % 1152921504606846976) AS v
  FROM h CROSS JOIN (SELECT UNNEST(range(0, 16)) AS i) t
  GROUP BY d, t.i
), bandk AS (
  SELECT d, CAST(i // 4 AS BIGINT) AS band,
         string_agg(CAST(v AS VARCHAR), '_' ORDER BY i) AS key
  FROM sig GROUP BY 1, 2
), cand AS (
  SELECT a.d AS id_a, b.d AS id_b
  FROM bandk a
  JOIN bandk b ON a.band = b.band AND a.key = b.key AND a.d < b.d
  WHERE NOT (a.d < 40 AND b.d < 40)
  GROUP BY 1, 2
), sizes AS (
  SELECT d, COUNT(*) AS n FROM g GROUP BY d
), inter AS (
  SELECT ga.d AS id_a, gb.d AS id_b, COUNT(*) AS ninter
  FROM g ga JOIN g gb ON ga.gram = gb.gram AND ga.d < gb.d
  GROUP BY 1, 2
)
SELECT id_a, id_b, jac,
       CASE WHEN id_a >= 40 THEN 'new_new' ELSE 'new_old' END AS pair_kind
FROM (
  SELECT c.id_a, c.id_b,
         ROUND(CAST(COALESCE(i.ninter, 0) AS DOUBLE)
               / (sa.n + sb.n - COALESCE(i.ninter, 0)), 6) AS jac
  FROM cand c
  JOIN sizes sa ON sa.d = c.id_a
  JOIN sizes sb ON sb.d = c.id_b
  LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
)
WHERE jac >= 0.2
ORDER BY id_a, id_b
"""

# q_recrawl_pipeline_e2e: the refetch lifecycle replayed — per-doc
# sitemap entry (lastmod 1 + d%27), state for d%3==0 (fetched 1 +
# (2d)%27), action by temporal compare (same-format zero-padded dates:
# lexicographic == temporal), to-fetch = new + stale, per-host rank
# over loc string order, delay k + 0.5.
ORACLES["q_recrawl_pipeline_e2e"] = """
WITH d AS (
  SELECT doc_id AS d, doc_id % 5 AS k,
         1 + doc_id % 27 AS lday, 1 + (2 * doc_id) % 27 AS fday
  FROM documents WHERE doc_id < 60
), e AS (
  SELECT d, k,
         'http://example' || k || '.com/s/' || d AS loc,
         '2026-01-' || lpad(CAST(lday AS VARCHAR), 2, '0') AS lastmod,
         CASE WHEN d % 3 <> 0 THEN NULL
              ELSE '2026-01-' || lpad(CAST(fday AS VARCHAR), 2, '0')
         END AS last_fetch,
         CASE WHEN d % 3 <> 0 THEN 'new'
              WHEN lday > fday THEN 'stale'
              ELSE 'fresh' END AS action
  FROM d
), tf AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY loc) - 1 AS rk
  FROM e WHERE action <> 'fresh'
)
SELECT CAST(d AS BIGINT) AS doc_id, loc, action, last_fetch,
       CAST(rk AS BIGINT) AS fetch_rank,
       ROUND(rk * (k + 0.5), 6) AS fetch_at_s
FROM tf
ORDER BY doc_id
"""

# q_crawl_budget: host-fair budget selection replayed as the equivalent
# GLOBAL ordering — rank within host by (priority DESC, loc), cap 10,
# then selected = row_number over (host_rank, priority DESC, loc) <= 40
# among uncapped rows; the engine's level-decomposed rule (cum_before +
# intra_level_rank < budget) must produce the identical set.
ORACLES["q_crawl_budget"] = """
WITH d AS (
  SELECT doc_id AS d,
         'http://example' || (doc_id % 7) || '.com/s/' || doc_id AS loc,
         doc_id % 7 AS k,
         CASE WHEN doc_id % 9 = 0 THEN 0.5
              ELSE (doc_id % 10) / 10.0 END AS pr
  FROM documents WHERE doc_id < 100
), ranked AS (
  SELECT d, loc, k, pr,
         ROW_NUMBER() OVER (PARTITION BY k ORDER BY pr DESC, loc) - 1
           AS host_rank
  FROM d
), flagged AS (
  SELECT *, host_rank >= 10 AS capped FROM ranked
), sel AS (
  SELECT d,
         ROW_NUMBER() OVER (ORDER BY host_rank, pr DESC, loc) AS g
  FROM flagged WHERE NOT capped
)
SELECT f.d AS doc_id, f.loc,
       f.pr AS priority_eff,
       CAST(f.host_rank AS BIGINT) AS host_rank,
       f.capped,
       COALESCE(s.g <= 40, FALSE) AS selected
FROM flagged f LEFT JOIN sel s ON s.d = f.d
ORDER BY doc_id
"""

# q_ivf_incremental: the q_knn_join_ivf replay with the quantizer seeds
# drawn from the OLD side only (vec_id < 350), assignment over the full
# union, and a side tag by the id boundary — mirrors
# ORACLES["q_knn_join_ivf"].
ORACLES["q_ivf_incremental"] = """
WITH seeds AS (
  SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell,
         CAST(embedding AS DOUBLE[]) AS cvec
  FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 350
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 4)
), sims AS (
  SELECT e.vec_id, e.label, CAST(e.embedding AS DOUBLE[]) AS vec, s.cell,
         ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), s.cvec)
               / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                        CAST(e.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(s.cvec, s.cvec))), 6) AS csim
  FROM embeddings e CROSS JOIN seeds s
), corpus_cells AS (
  SELECT vec_id, label, vec, cell,
         CASE WHEN vec_id >= 350 THEN 'new' ELSE 'old' END AS side
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY csim DESC, cell ASC) AS rn
    FROM sims) WHERE rn = 1
), query_probes AS (
  SELECT vec_id AS q_id, vec AS qvec, cell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY csim DESC, cell ASC) AS rn
    FROM sims WHERE vec_id < 5) WHERE rn <= 2
), cand AS (
  SELECT p.q_id, c.vec_id, c.label, c.side,
         ROUND(list_dot_product(c.vec, p.qvec)
               / (sqrt(list_dot_product(c.vec, c.vec))
                  * sqrt(list_dot_product(p.qvec, p.qvec))), 6) AS sim
  FROM query_probes p JOIN corpus_cells c USING (cell)
  WHERE c.vec_id <> p.q_id
)
SELECT q_id, vec_id, label, side, sim FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                               ORDER BY sim DESC, vec_id ASC) AS rn
  FROM cand) WHERE rn <= 3
ORDER BY q_id, sim DESC, vec_id
"""

# q_host_quality_gate: the host means replayed over the same exact 1e6
# integer interior; tiny{d}.com hosts have one doc < min_docs=2 ->
# never blocked.
ORACLES["q_host_quality_gate"] = """
WITH d AS (
  SELECT doc_id AS d,
         CASE WHEN doc_id % 40 = 0 THEN 'tiny' || doc_id || '.com'
              ELSE 'example' || (doc_id % 8) || '.com' END AS host,
         ((doc_id % 8) * 10 + doc_id % 13) / 100.0 AS quality
  FROM documents WHERE doc_id < 200
), s AS (
  SELECT host, COUNT(*) AS n,
         ROUND(SUM(CAST(ROUND(quality * 1000000) AS BIGINT))
               / (COUNT(*) * 1000000.0), 6) AS m
  FROM d GROUP BY host
)
SELECT d.d AS doc_id,
       'http://' || d.host || '/p/' || d.d AS url,
       d.quality,
       d.host,
       CAST(s.n AS BIGINT) AS host_n_docs,
       s.m AS host_mean_quality,
       s.n >= 2 AND s.m < 0.45 AS host_blocked
FROM d JOIN s ON s.host = d.host
ORDER BY doc_id
"""

# q_anchor_text_index: the incoming-anchor arithmetic replayed — each
# of the 30 targets collects 4 anchors (2 constant-text, 2 variant);
# dominant text by (count DESC, text ASC).
ORACLES["q_anchor_text_index"] = """
WITH d AS (
  SELECT doc_id AS d, 'h' || (doc_id % 4) || '.com' AS host
  FROM documents WHERE doc_id < 60
), links AS (
  SELECT d, host,
         'http://t.site/t/' || ((3 * d + 1) % 30) AS target,
         'page ' || ((3 * d + 1) % 30) || ' ref' || (d % 3) AS text
  FROM d
  UNION ALL
  SELECT d, host,
         'http://t.site/t/' || ((d + 7) % 30),
         'page ' || ((d + 7) % 30)
  FROM d
), per_text AS (
  SELECT target, text, COUNT(*) AS n,
         COUNT(DISTINCT host) AS nh
  FROM links GROUP BY target, text
), ranked AS (
  SELECT target, text, n,
         ROW_NUMBER() OVER (PARTITION BY target
                            ORDER BY n DESC, text) AS rk
  FROM per_text
), tot AS (
  SELECT target, CAST(SUM(n) AS BIGINT) AS n_anchors
  FROM per_text GROUP BY target
), hosts AS (
  SELECT target, COUNT(DISTINCT host) AS n_source_hosts
  FROM links GROUP BY target
)
SELECT t.target, t.n_anchors,
       CAST(h.n_source_hosts AS INTEGER) AS n_source_hosts,
       r.text AS top_text,
       CAST(r.n AS BIGINT) AS top_text_count
FROM tot t
JOIN hosts h ON h.target = t.target
JOIN ranked r ON r.target = t.target AND r.rk = 1
ORDER BY t.target
"""
