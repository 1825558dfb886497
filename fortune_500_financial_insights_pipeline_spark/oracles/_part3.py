"""Oracle SQL, part 3/6 (file-order split from the single-file
oracles.py in round 3 — same entries, same insertion order)."""

from __future__ import annotations


from fortune_500_financial_insights_pipeline_spark.oracles._core import (  # noqa: F401
    ORACLES,
    _BFS_ROUND,
    _KCORE_PEEL,
    _dsum,
    _mmr_step_sql,
    _rbo_suffix_weight_literals,
)


# --- round-2i -------------------------------------------------------------

ORACLES["q_binary_format"] = """
WITH b AS (
  SELECT doc_id,
         unhex(CASE doc_id % 5
                 WHEN 0 THEN '89504E47'
                 WHEN 1 THEN 'FFD8FFE0'
                 WHEN 2 THEN '47494638'
                 WHEN 3 THEN '52494646AABBCCDD57454250'
                 ELSE '00112233'
               END || substr(md5(text), 1, 16)) AS media
  FROM documents
), d AS (
  SELECT media,
         CASE WHEN hex(media) LIKE '52494646%'
                   AND substr(hex(media), 17, 8) = '57454250' THEN 'webp'
              WHEN hex(media) LIKE '89504E47%' THEN 'png'
              WHEN hex(media) LIKE 'FFD8FF%' THEN 'jpeg'
              WHEN hex(media) LIKE '47494638%' THEN 'gif'
              ELSE 'unknown' END AS format
  FROM b
)
SELECT format, COUNT(*) AS n,
       CAST(SUM(octet_length(media)) AS BIGINT) AS total_bytes
FROM d GROUP BY format
"""

ORACLES["q_kcore"] = (
    """
WITH ub AS (
  SELECT DISTINCT user_id AS u, date_trunc('hour', ts) AS h, event_type AS t
  FROM events
), ed AS (
  SELECT a.u AS id_a, b.u AS id_b
  FROM ub a JOIN ub b ON a.h = b.h AND a.t = b.t AND a.u < b.u
  GROUP BY a.u, b.u
  HAVING COUNT(*) >= 2
), e0 AS (
  SELECT id_a AS src, id_b AS dst FROM ed
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM ed
),
"""
    + ",".join(_KCORE_PEEL.format(r=i, p=i - 1) for i in (1, 2, 3))
    + """
SELECT src AS node, COUNT(*) AS degree FROM e3 GROUP BY src
"""
)

ORACLES["q_weighted_median"] = """
WITH t AS (
  SELECT l_returnflag,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_cents,
         CAST(l_quantity AS BIGINT) AS w
  FROM lineitem
), c AS (
  SELECT l_returnflag, price_cents,
         SUM(w) OVER (PARTITION BY l_returnflag ORDER BY price_cents
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         SUM(w) OVER (PARTITION BY l_returnflag) AS tw
  FROM t
)
SELECT l_returnflag, CAST(MIN(price_cents) AS BIGINT) AS w_median
FROM c WHERE cw * 2 >= tw GROUP BY l_returnflag
"""

ORACLES["q_interval_coverage"] = """
WITH iv AS (
  SELECT user_id,
         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS s,
         CAST(epoch(date_trunc('second', ts)) AS BIGINT)
           + ABS(CAST(ROUND(value * 100) AS BIGINT)) % 3600 + 60 AS e
  FROM events
), m AS (
  SELECT user_id, s, e,
         MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
  FROM iv
), i AS (
  SELECT user_id, s, e,
         CAST(SUM(CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS isl
  FROM m
), g AS (
  SELECT user_id, isl, MAX(e) - MIN(s) AS cov FROM i GROUP BY user_id, isl
)
SELECT user_id, CAST(SUM(cov) AS BIGINT) AS covered, COUNT(*) AS n_islands
FROM g GROUP BY user_id
"""

# --- round-2j -------------------------------------------------------------

ORACLES["q_source_overlap"] = """
WITH toks AS (SELECT source, string_split(text, ' ') AS l FROM documents),
spans AS (
  SELECT DISTINCT source,
         md5(l[i]||' '||l[i+1]||' '||l[i+2]||' '||l[i+3]||' '||l[i+4]
             ||' '||l[i+5]||' '||l[i+6]||' '||l[i+7]) AS span_hash
  FROM (SELECT source, l, unnest(generate_series(1, len(l) - 7)) AS i
        FROM toks WHERE len(l) >= 8)
)
SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS shared_spans
FROM spans a JOIN spans b ON a.span_hash = b.span_hash AND a.source < b.source
GROUP BY a.source, b.source
"""

ORACLES["q_label_centroids"] = """
WITH comp AS (
  SELECT label, CAST(pos AS BIGINT) AS pos,
         CAST(ROUND(CAST(xv AS DOUBLE) * 10000) AS BIGINT) AS x
  FROM (SELECT label, unnest(range(len(embedding))) AS pos,
               unnest(embedding) AS xv
        FROM embeddings)
), lab AS (
  SELECT label, pos, CAST(SUM(x) AS BIGINT) AS s FROM comp GROUP BY label, pos
), gsum AS (
  SELECT pos, CAST(SUM(s) AS BIGINT) AS g FROM lab GROUP BY pos
), n AS (
  SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label
), dots AS (
  SELECT lab.label,
         CAST(SUM(lab.s * gsum.g) AS BIGINT) AS dot,
         CAST(SUM(lab.s * lab.s) AS BIGINT) AS n2l
  FROM lab JOIN gsum USING (pos) GROUP BY lab.label
), n2g AS (
  SELECT CAST(SUM(g * g) AS BIGINT) AS n2g FROM gsum
)
SELECT d.label, n.n,
       ROUND(CAST(d.dot AS DOUBLE)
             / (sqrt(CAST(d.n2l AS DOUBLE)) * sqrt(CAST(n2g.n2g AS DOUBLE))),
             6) AS cos_to_global
FROM dots d, n2g JOIN n ON d.label = n.label
"""

# --- round-2k -------------------------------------------------------------

ORACLES["q_golden_record"] = """
WITH vs AS (
  SELECT c_custkey, v,
         CASE WHEN (c_custkey + v) % 3 = 0 THEN NULL
              ELSE c_name || '#' || CAST(v AS VARCHAR) END AS name_s,
         CASE WHEN (c_custkey * v) % 4 = 0 THEN NULL
              ELSE c_mktsegment || '/' || CAST(v AS VARCHAR) END AS seg_s
  FROM customer, (SELECT UNNEST([1, 2, 3]) AS v)
), r AS (
  SELECT c_custkey,
         COUNT(*) OVER (PARTITION BY c_custkey) AS n_members,
         LAST_VALUE(name_s IGNORE NULLS) OVER w AS name_s,
         LAST_VALUE(seg_s IGNORE NULLS) OVER w AS seg_s,
         ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY v DESC) AS rn
  FROM vs
  WINDOW w AS (PARTITION BY c_custkey ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
SELECT c_custkey, n_members, name_s, seg_s FROM r WHERE rn = 1
"""

ORACLES["q_twap"] = """
WITH s AS (
  SELECT user_id, event_id,
         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS t,
         CAST(ROUND(value * 100) AS BIGINT) AS v,
         ts
  FROM events
), l AS (
  SELECT user_id, v,
         LEAD(t) OVER (PARTITION BY user_id ORDER BY ts, event_id) - t AS dur
  FROM s
), g AS (
  SELECT user_id, CAST(SUM(v * dur) AS BIGINT) AS num,
         CAST(SUM(dur) AS BIGINT) AS den
  FROM l WHERE dur IS NOT NULL GROUP BY user_id
)
SELECT user_id, CAST(num AS DOUBLE) / den / 100 AS twap FROM g WHERE den > 0
"""

ORACLES["q_transition_matrix"] = """
WITH p AS (
  SELECT LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS from_state,
         event_type AS to_state
  FROM events
), c AS (
  SELECT from_state, to_state, COUNT(*) AS n
  FROM p WHERE from_state IS NOT NULL GROUP BY from_state, to_state
), t AS (
  SELECT from_state, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY from_state
)
SELECT c.from_state, c.to_state, c.n, CAST(c.n AS DOUBLE) / t.tot AS p
FROM c JOIN t USING (from_state)
"""

# --- round-2l -------------------------------------------------------------

# Delta refresh law: refreshed aggregate == direct aggregate over the new
# snapshot (the oracle IS the recompute the operator avoids).
ORACLES["q_delta_agg"] = """
WITH base AS (
  SELECT o_orderkey, o_orderstatus AS status_s,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
  FROM orders
), new AS (
  SELECT o_orderkey, status_s,
         CASE WHEN o_orderkey % 13 = 0 THEN price_cents + 1
              ELSE price_cents END AS price_cents
  FROM base WHERE o_orderkey % 89 <> 0
)
SELECT status_s, COUNT(*) AS n, CAST(SUM(price_cents) AS BIGINT) AS s
FROM new GROUP BY status_s
"""

ORACLES["q_info_gain"] = """
WITH cells AS (
  SELECT o_orderpriority AS x, o_orderstatus AS y, COUNT(*) AS nxy
  FROM orders GROUP BY 1, 2
), xt AS (
  SELECT x, CAST(SUM(nxy) AS BIGINT) AS nx FROM cells GROUP BY x
), yt AS (
  SELECT y, CAST(SUM(nxy) AS BIGINT) AS ny FROM cells GROUP BY y
), nn AS (
  SELECT CAST(SUM(nxy) AS BIGINT) AS n FROM cells
), hy AS (
  SELECT -(CAST(SUM(CAST(ROUND(((CAST(ny AS DOUBLE) / n)
             * log2(CAST(ny AS DOUBLE) / n)) * 1000000) AS BIGINT)) AS DOUBLE)
           / 1000000) AS h_y
  FROM yt, nn
), hc AS (
  SELECT (CAST(SUM(CAST(ROUND(((CAST(nxy AS DOUBLE) / n)
            * log2(CAST(nx AS DOUBLE) / nxy)) * 1000000) AS BIGINT)) AS DOUBLE)
          / 1000000) AS h_y_given_x
  FROM cells JOIN xt USING (x), nn
)
SELECT h_y, h_y_given_x, h_y - h_y_given_x AS info_gain FROM hy, hc
"""

ORACLES["q_gini"] = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS val
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT val AS x,
         CAST(ROW_NUMBER() OVER (ORDER BY val, o_custkey) AS BIGINT) AS i
  FROM per_cust
), agg AS (
  SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS total,
         CAST(SUM(i * x) AS BIGINT) AS ix
  FROM ranked
)
SELECT n, total,
       ROUND(2.0 * CAST(ix AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(total AS DOUBLE))
             - (CAST(n AS DOUBLE) + 1) / CAST(n AS DOUBLE), 6) AS gini
FROM agg
"""

ORACLES["q_drawdown"] = f"""
WITH daily AS (
  SELECT l_suppkey,
         strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS day,
         ROUND({_dsum('l_extendedprice')} / COUNT(*), 6) AS close
  FROM lineitem WHERE l_suppkey <= 20
  GROUP BY l_suppkey, strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')
), dd AS (
  SELECT l_suppkey, close,
         ROUND(close / MAX(close) OVER (PARTITION BY l_suppkey ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1, 6) AS d
  FROM daily
)
SELECT l_suppkey, MIN(d) AS max_drawdown, ROUND(MAX(close), 6) AS peak
FROM dd GROUP BY l_suppkey ORDER BY l_suppkey
"""

ORACLES["q_var_es"] = """
WITH ranked AS (
  SELECT o_orderpriority, CAST(o_totalprice AS DOUBLE) AS v,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS rk,
         CAST(COUNT(*) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS n
  FROM orders
), tail AS (
  SELECT * FROM ranked WHERE rk >= (19 * n + 19) // 20
)
SELECT o_orderpriority,
       ROUND(MIN(v), 6) AS var,
       ROUND((CAST(SUM(CAST(ROUND(v * 1000000) AS BIGINT)) AS DOUBLE) / 1000000)
             / COUNT(v), 6) AS es,
       COUNT(*) AS n_tail
FROM tail GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

ORACLES["q_shortest_path"] = f"""
WITH bfs_edges AS (
  SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS u,
         CAST(1000000 + o_custkey AS BIGINT) AS v
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), bfs_both AS (
  SELECT u, v FROM bfs_edges UNION SELECT v AS u, u AS v FROM bfs_edges
), l0 AS (
  SELECT DISTINCT CAST(s_suppkey AS BIGINT) AS id, CAST(0 AS BIGINT) AS hop
  FROM supplier WHERE s_suppkey <= 3
), l1 AS ({_BFS_ROUND.format(prev='l0')}
), l2 AS ({_BFS_ROUND.format(prev='l1')}
), l3 AS ({_BFS_ROUND.format(prev='l2')}
), l4 AS ({_BFS_ROUND.format(prev='l3')}
)
SELECT id, hop FROM l4 ORDER BY id
"""

ORACLES["q_perplexity_bucket"] = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents
),
nz AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
doc_tok AS (SELECT doc_id, tok, COUNT(*) AS n_dt FROM nz GROUP BY doc_id, tok),
vocab AS (SELECT tok, CAST(SUM(n_dt) AS BIGINT) AS n_t FROM doc_tok GROUP BY tok),
total AS (SELECT CAST(SUM(n_t) AS BIGINT) AS n_total FROM vocab),
scored AS (
  SELECT doc_id,
         ROUND((CAST(SUM(CAST(ROUND((n_dt * log2(CAST(n_t AS DOUBLE) / n_total)) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000)
               / CAST(SUM(n_dt) AS DOUBLE), 6) AS score
  FROM doc_tok JOIN vocab USING (tok), total
  GROUP BY doc_id
),
bucketed AS (
  SELECT d.source, s.score,
         CAST(NTILE(10) OVER (PARTITION BY d.source ORDER BY s.score, s.doc_id) AS INTEGER) AS bucket
  FROM scored s JOIN documents d USING (doc_id)
)
SELECT source, bucket,
       COUNT(*) AS n_docs,
       ROUND((CAST(SUM(CAST(ROUND(score * 1000000) AS BIGINT)) AS DOUBLE) / 1000000)
             / COUNT(score), 6) AS avg_score,
       ROUND(MIN(score), 6) AS min_score
FROM bucketed GROUP BY source, bucket
"""

ORACLES["q_code_detect"] = """
WITH feats AS (
  SELECT doc_id,
         CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
         CAST(len(list_filter(string_split(text, chr(10)),
                x -> contains(x, '{') OR contains(x, '}') OR contains(x, ';')
                     OR contains(x, '=') OR starts_with(x, '    ')
                     OR starts_with(x, chr(9)))) AS BIGINT) AS n_code_lines,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS BIGINT) AS n_sym
  FROM documents
)
SELECT doc_id, n_lines, n_code_lines,
       ROUND(CAST(n_code_lines AS DOUBLE) / n_lines, 6) AS code_line_frac,
       ROUND(CASE WHEN n_chars > 0 THEN CAST(n_sym AS DOUBLE) / n_chars ELSE 0.0 END, 6) AS symbol_ratio,
       ROUND(CAST(n_code_lines AS DOUBLE) / n_lines, 6) >= 0.3 AS is_code
FROM feats
"""

ORACLES["q_ks_test"] = """
WITH two AS (
  SELECT event_type AS g, ROUND(CAST(value AS DOUBLE), 6) AS v
  FROM events WHERE event_type IN ('click', 'purchase')
), per_val AS (
  SELECT v,
         CAST(SUM(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c2
  FROM two GROUP BY v
), cum AS (
  SELECT CAST(SUM(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS r1,
         CAST(SUM(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS r2
  FROM per_val
), totals AS (
  SELECT MAX(r1) AS n1, MAX(r2) AS n2 FROM cum
)
SELECT MAX(n1) AS n1, MAX(n2) AS n2,
       ROUND(MAX(ABS(CAST(r1 AS DOUBLE) / n1 - CAST(r2 AS DOUBLE) / n2)), 6) AS ks
FROM cum, totals
"""

ORACLES["q_auc"] = """
WITH w AS (
  SELECT CAST(b AS INTEGER) AS bucket,
         CAST((b % 21) * 50 - 500 AS BIGINT) AS w_fp
  FROM range(256) t(b)
), tok AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
), f AS (
  SELECT doc_id,
         ((instr('0123456789abcdef',
                 substring(md5(concat('f|', CAST(term AS VARCHAR))), 1, 1)) - 1) * 16
          + (instr('0123456789abcdef',
                   substring(md5(concat('f|', CAST(term AS VARCHAR))), 2, 1)) - 1))
           AS bucket
  FROM tok WHERE term <> ''
), s AS (
  SELECT f.doc_id, CAST(SUM(w.w_fp) AS BIGINT) AS sw, COUNT(*) AS nt
  FROM f JOIN w ON f.bucket = w.bucket GROUP BY f.doc_id
), labeled AS (
  SELECT ROUND(1.0 / (1.0 + EXP(-(0.0 + s.sw / (1000.0 * s.nt)))), 6) AS prob,
         CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
  FROM s JOIN documents d USING (doc_id)
), per_val AS (
  SELECT prob, CAST(SUM(y) AS BIGINT) AS np, CAST(COUNT(*) AS BIGINT) AS nt
  FROM labeled GROUP BY prob
), ranked AS (
  SELECT np, nt,
         CAST(SUM(nt) OVER (ORDER BY prob ROWS BETWEEN UNBOUNDED PRECEDING
              AND CURRENT ROW) - nt AS BIGINT) AS cumb
  FROM per_val
), agg AS (
  SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
         CAST(SUM(nt) - SUM(np) AS BIGINT) AS n_neg,
         CAST(SUM(np * (2 * cumb + nt + 1)) AS BIGINT) AS s2
  FROM ranked
)
SELECT n_pos, n_neg,
       ROUND((CAST(s2 AS DOUBLE) - CAST(n_pos AS DOUBLE) * (n_pos + 1))
             / (2.0 * n_pos * n_neg), 6) AS auc
FROM agg
"""

ORACLES["q_calibration"] = """
WITH w AS (
  SELECT CAST(b AS INTEGER) AS bucket,
         CAST((b % 21) * 50 - 500 AS BIGINT) AS w_fp
  FROM range(256) t(b)
), tok AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
), f AS (
  SELECT doc_id,
         ((instr('0123456789abcdef',
                 substring(md5(concat('f|', CAST(term AS VARCHAR))), 1, 1)) - 1) * 16
          + (instr('0123456789abcdef',
                   substring(md5(concat('f|', CAST(term AS VARCHAR))), 2, 1)) - 1))
           AS bucket
  FROM tok WHERE term <> ''
), s AS (
  SELECT f.doc_id, CAST(SUM(w.w_fp) AS BIGINT) AS sw, COUNT(*) AS nt
  FROM f JOIN w ON f.bucket = w.bucket GROUP BY f.doc_id
), labeled AS (
  SELECT ROUND(1.0 / (1.0 + EXP(-(0.0 + s.sw / (1000.0 * s.nt)))), 6) AS prob,
         CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
  FROM s JOIN documents d USING (doc_id)
)
SELECT CAST(LEAST(CAST(FLOOR(prob * 10) AS INTEGER), 9) AS INTEGER) AS bin,
       COUNT(*) AS n,
       CAST(SUM(y) AS BIGINT) AS n_pos,
       ROUND((CAST(SUM(CAST(ROUND(prob * 1000000) AS BIGINT)) AS DOUBLE) / 1000000)
             / COUNT(prob), 6) AS mean_score,
       ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS pos_rate
FROM labeled GROUP BY 1 ORDER BY 1
"""

ORACLES["q_chi2"] = """
WITH cells AS (
  SELECT o_orderpriority AS x, o_orderstatus AS y, COUNT(*) AS nxy
  FROM orders GROUP BY 1, 2
), xt AS (
  SELECT x, CAST(SUM(nxy) AS BIGINT) AS nx FROM cells GROUP BY x
), yt AS (
  SELECT y, CAST(SUM(nxy) AS BIGINT) AS ny FROM cells GROUP BY y
), nn AS (
  SELECT CAST(SUM(nxy) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT x) AS BIGINT) AS dx,
         CAST(COUNT(DISTINCT y) AS BIGINT) AS dy
  FROM cells
), full_cells AS (
  SELECT xt.x, yt.y, xt.nx, yt.ny FROM xt CROSS JOIN yt
), j AS (
  SELECT f.nx, f.ny, CAST(COALESCE(c.nxy, 0) AS BIGINT) AS nxy
  FROM full_cells f LEFT JOIN cells c ON f.x = c.x AND f.y = c.y
), terms AS (
  SELECT nxy, CAST(nx AS DOUBLE) * ny / n AS ex, n, dx, dy FROM j, nn
)
SELECT MAX(n) AS n,
       (MAX(dx) - 1) * (MAX(dy) - 1) AS dof,
       (CAST(SUM(CAST(ROUND((((CAST(nxy AS DOUBLE) - ex) * (nxy - ex) / ex)) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS chi2
FROM terms
"""

ORACLES["q_woe_iv"] = """
WITH w AS (
  SELECT CAST(b AS INTEGER) AS bucket,
         CAST((b % 21) * 50 - 500 AS BIGINT) AS w_fp
  FROM range(256) t(b)
), tok AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
), f AS (
  SELECT doc_id,
         ((instr('0123456789abcdef',
                 substring(md5(concat('f|', CAST(term AS VARCHAR))), 1, 1)) - 1) * 16
          + (instr('0123456789abcdef',
                   substring(md5(concat('f|', CAST(term AS VARCHAR))), 2, 1)) - 1))
           AS bucket
  FROM tok WHERE term <> ''
), s AS (
  SELECT f.doc_id, CAST(SUM(w.w_fp) AS BIGINT) AS sw, COUNT(*) AS nt
  FROM f JOIN w ON f.bucket = w.bucket GROUP BY f.doc_id
), labeled AS (
  SELECT ROUND(1.0 / (1.0 + EXP(-(0.0 + s.sw / (1000.0 * s.nt)))), 6) AS prob,
         CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
  FROM s JOIN documents d USING (doc_id)
), bins AS (
  SELECT CAST(LEAST(CAST(FLOOR(prob * 10) AS INTEGER), 9) AS INTEGER) AS bin,
         CAST(SUM(y) AS BIGINT) AS n_pos,
         CAST(COUNT(*) - SUM(y) AS BIGINT) AS n_neg
  FROM labeled GROUP BY 1
), tot AS (
  SELECT CAST(SUM(n_pos + 1) AS BIGINT) AS tp,
         CAST(SUM(n_neg + 1) AS BIGINT) AS tn
  FROM bins
)
SELECT bin, n_pos, n_neg,
       ROUND(LN((CAST(n_pos + 1 AS DOUBLE) / tp) / (CAST(n_neg + 1 AS DOUBLE) / tn)), 6) AS woe,
       ROUND(((CAST(n_pos + 1 AS DOUBLE) / tp) - (CAST(n_neg + 1 AS DOUBLE) / tn))
             * LN((CAST(n_pos + 1 AS DOUBLE) / tp) / (CAST(n_neg + 1 AS DOUBLE) / tn)), 6) AS iv_term
FROM bins, tot ORDER BY bin
"""

ORACLES["q_psi"] = """
WITH two AS (
  SELECT GREATEST(0, LEAST(CAST(FLOOR((CAST(value AS DOUBLE) - 0.0) / 50.0) AS INTEGER), 9)) AS b,
         event_type AS g
  FROM events WHERE event_type IN ('click', 'purchase')
), bins AS (
  SELECT b,
         CAST(SUM(CASE WHEN g = 'click' THEN 1 ELSE 0 END) + 1 AS BIGINT) AS cr,
         CAST(SUM(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END) + 1 AS BIGINT) AS cn
  FROM two GROUP BY b
), tot AS (
  SELECT CAST(SUM(cr) AS BIGINT) AS tr, CAST(SUM(cn) AS BIGINT) AS tn FROM bins
)
SELECT ROUND(CAST(SUM(CAST(ROUND((((CAST(cn AS DOUBLE) / tn) - (CAST(cr AS DOUBLE) / tr))
               * LN((CAST(cn AS DOUBLE) / tn) / (CAST(cr AS DOUBLE) / tr))) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000, 6) AS psi,
       CAST(SUM(cr) - COUNT(*) AS BIGINT) AS n_ref,
       CAST(SUM(cn) - COUNT(*) AS BIGINT) AS n_new
FROM bins, tot
"""

ORACLES["q_sorted_neighborhood"] = """
WITH s AS (
  SELECT c_custkey AS id_a, c_name AS name_a,
         LEAD(c_custkey, 1) OVER w AS id_b1, LEAD(c_name, 1) OVER w AS name_b1,
         LEAD(c_custkey, 2) OVER w AS id_b2, LEAD(c_name, 2) OVER w AS name_b2
  FROM customer
  WINDOW w AS (PARTITION BY substring(c_name, 1, 1) ORDER BY c_name, c_custkey)
), cand AS (
  SELECT id_a, name_a, id_b1 AS id_b, name_b1 AS name_b FROM s WHERE id_b1 IS NOT NULL
  UNION ALL
  SELECT id_a, name_a, id_b2 AS id_b, name_b2 AS name_b FROM s WHERE id_b2 IS NOT NULL
)
SELECT id_a, id_b, CAST(levenshtein(name_a, name_b) AS INTEGER) AS dist
FROM cand WHERE levenshtein(name_a, name_b) <= 2
"""

ORACLES["q_window_pct"] = """
SELECT l_orderkey, l_linenumber, l_suppkey,
       l_extendedprice AS price,
       FLOOR(PERCENT_RANK() OVER w * 1000000) / 1000000 AS pct_rank,
       FLOOR(CUME_DIST() OVER w * 1000000) / 1000000 AS cume_dist
FROM lineitem WHERE l_suppkey <= 10
WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_extendedprice)
"""

ORACLES["q_hhi"] = """
WITH rev AS (
  SELECT s_nationkey, s_suppkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS r
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY s_nationkey, s_suppkey
), tot AS (
  SELECT s_nationkey, CAST(SUM(r) AS BIGINT) AS t FROM rev GROUP BY s_nationkey
)
SELECT rev.s_nationkey,
       COUNT(*) AS n_suppliers,
       ROUND(CAST(SUM(CAST(ROUND(((CAST(r AS DOUBLE) / t) * (CAST(r AS DOUBLE) / t) * 10000) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000, 6) AS hhi
FROM rev JOIN tot USING (s_nationkey)
GROUP BY rev.s_nationkey ORDER BY rev.s_nationkey
"""

ORACLES["q_prefix_dedup"] = """
WITH pfx AS (
  SELECT substring(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), 1, 50) AS prefix,
         doc_id
  FROM documents
), grp AS (
  SELECT prefix, COUNT(*) AS n_docs, MIN(doc_id) AS canonical_doc
  FROM pfx GROUP BY prefix HAVING COUNT(*) > 1
)
SELECT md5(prefix) AS prefix_hash, n_docs, canonical_doc FROM grp
"""

ORACLES["q_cov_matrix"] = """
WITH daily AS (
  SELECT l_suppkey,
         strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS day,
         ROUND((CAST(SUM(CAST(ROUND((l_extendedprice) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) / COUNT(*), 6) AS close
  FROM lineitem WHERE l_suppkey <= 10
  GROUP BY l_suppkey, strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')
), rets AS (
  SELECT l_suppkey, day,
         ROUND((close / LAG(close) OVER (PARTITION BY l_suppkey ORDER BY day) - 1) * 100, 6) AS ret
  FROM daily
), nz AS (
  SELECT * FROM rets WHERE ret IS NOT NULL
), pairs AS (
  SELECT a.l_suppkey AS ki, b.l_suppkey AS kj, a.ret AS x, b.ret AS y
  FROM nz a JOIN nz b ON a.day = b.day
  WHERE a.l_suppkey <= b.l_suppkey
), agg AS (
  SELECT ki, kj, COUNT(*) AS n,
         (CAST(SUM(CAST(ROUND(x * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS sx,
         (CAST(SUM(CAST(ROUND(y * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS sy,
         (CAST(SUM(CAST(ROUND((x * y) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS sxy
  FROM pairs GROUP BY ki, kj
), covs AS (
  SELECT ki, kj, n,
         ROUND(sxy / CAST(n AS DOUBLE) - (sx / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)), 6) AS cov
  FROM agg
)
SELECT ki, kj, n, cov FROM covs ORDER BY ki, kj
"""

ORACLES["q_portfolio_vol"] = """
WITH daily AS (
  SELECT l_suppkey,
         strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS day,
         ROUND((CAST(SUM(CAST(ROUND((l_extendedprice) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) / COUNT(*), 6) AS close
  FROM lineitem WHERE l_suppkey <= 10
  GROUP BY l_suppkey, strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')
), rets AS (
  SELECT l_suppkey, day,
         ROUND((close / LAG(close) OVER (PARTITION BY l_suppkey ORDER BY day) - 1) * 100, 6) AS ret
  FROM daily
), nz AS (
  SELECT * FROM rets WHERE ret IS NOT NULL
), pairs AS (
  SELECT a.l_suppkey AS ki, b.l_suppkey AS kj, a.ret AS x, b.ret AS y
  FROM nz a JOIN nz b ON a.day = b.day
  WHERE a.l_suppkey <= b.l_suppkey
), agg AS (
  SELECT ki, kj, COUNT(*) AS n,
         (CAST(SUM(CAST(ROUND(x * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS sx,
         (CAST(SUM(CAST(ROUND(y * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS sy,
         (CAST(SUM(CAST(ROUND((x * y) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS sxy
  FROM pairs GROUP BY ki, kj
), covs AS (
  SELECT ki, kj, n,
         ROUND(sxy / CAST(n AS DOUBLE) - (sx / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)), 6) AS cov
  FROM agg
), folded AS (
  SELECT COUNT(*) AS n_pairs,
         ROUND(CAST(SUM(CAST(ROUND(((CASE WHEN ki = kj THEN 1.0 ELSE 2.0 END) * 0.01 * cov) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000, 6) AS port_var
  FROM covs
)
SELECT n_pairs, port_var, ROUND(SQRT(port_var), 6) AS port_vol FROM folded
"""

ORACLES["q_ols_multi"] = """
WITH mom AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         (CAST(SUM(CAST(ROUND((l_quantity) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS s1,
         (CAST(SUM(CAST(ROUND((l_discount) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS s2,
         (CAST(SUM(CAST(ROUND((l_extendedprice) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS sy,
         (CAST(SUM(CAST(ROUND((l_quantity * l_quantity) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS s11,
         (CAST(SUM(CAST(ROUND((l_quantity * l_discount) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS s12,
         (CAST(SUM(CAST(ROUND((l_discount * l_discount) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS s22,
         (CAST(SUM(CAST(ROUND((l_quantity * l_extendedprice) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS s1y,
         (CAST(SUM(CAST(ROUND((l_discount * l_extendedprice) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS s2y
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n_rows,
       ROUND((sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) + s2 * (s1y * s12 - s11 * s2y)) / (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) + s2 * (s1 * s12 - s11 * s2)), 6) AS beta0,
       ROUND((n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) + s2 * (s1 * s2y - s1y * s2)) / (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) + s2 * (s1 * s12 - s11 * s2)), 6) AS beta1,
       ROUND((n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) + sy * (s1 * s12 - s11 * s2)) / (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) + s2 * (s1 * s12 - s11 * s2)), 6) AS beta2
FROM mom ORDER BY l_returnflag
"""

ORACLES["q_scd2_lookup"] = """
WITH nonp AS (
  SELECT user_id, ts, event_type FROM events WHERE event_type <> 'purchase'
), marked AS (
  SELECT user_id, ts, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS prev
  FROM nonp
), changed AS (
  SELECT user_id, ts, event_type FROM marked
  WHERE prev IS NULL OR event_type <> prev
), hist AS (
  SELECT user_id, event_type, ts AS valid_from,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to
  FROM changed
), facts AS (
  SELECT user_id, ts AS p_ts, value AS amount FROM events WHERE event_type = 'purchase'
)
SELECT f.user_id,
       strftime(f.p_ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       ROUND(CAST(f.amount AS DOUBLE), 6) AS amount,
       h.event_type AS state
FROM facts f JOIN hist h ON f.user_id = h.user_id
WHERE f.p_ts >= h.valid_from AND (h.valid_to IS NULL OR f.p_ts < h.valid_to)
"""

ORACLES["q_random_walk"] = """
WITH walk_edges AS (
  SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS u,
         CAST(1000000 + o_custkey AS BIGINT) AS v
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), walk_both AS (
  SELECT u, v FROM walk_edges UNION SELECT v AS u, u AS v FROM walk_edges
), s0 AS (
  SELECT DISTINCT CAST(s_suppkey AS BIGINT) AS walk_id,
         CAST(s_suppkey AS BIGINT) AS node
  FROM supplier WHERE s_suppkey <= 5
), s1 AS (
  SELECT walk_id, 1 AS step, node FROM (
    SELECT c.walk_id, b.v AS node,
           ROW_NUMBER() OVER (PARTITION BY c.walk_id
             ORDER BY md5(concat(CAST(c.walk_id AS VARCHAR), '|', '1', '|', CAST(b.v AS VARCHAR))), b.v) AS rn
    FROM s0 c JOIN walk_both b ON c.node = b.u
  ) WHERE rn = 1
), s2 AS (
  SELECT walk_id, 2 AS step, node FROM (
    SELECT c.walk_id, b.v AS node,
           ROW_NUMBER() OVER (PARTITION BY c.walk_id
             ORDER BY md5(concat(CAST(c.walk_id AS VARCHAR), '|', '2', '|', CAST(b.v AS VARCHAR))), b.v) AS rn
    FROM s1 c JOIN walk_both b ON c.node = b.u
  ) WHERE rn = 1
), s3 AS (
  SELECT walk_id, 3 AS step, node FROM (
    SELECT c.walk_id, b.v AS node,
           ROW_NUMBER() OVER (PARTITION BY c.walk_id
             ORDER BY md5(concat(CAST(c.walk_id AS VARCHAR), '|', '3', '|', CAST(b.v AS VARCHAR))), b.v) AS rn
    FROM s2 c JOIN walk_both b ON c.node = b.u
  ) WHERE rn = 1
), s4 AS (
  SELECT walk_id, 4 AS step, node FROM (
    SELECT c.walk_id, b.v AS node,
           ROW_NUMBER() OVER (PARTITION BY c.walk_id
             ORDER BY md5(concat(CAST(c.walk_id AS VARCHAR), '|', '4', '|', CAST(b.v AS VARCHAR))), b.v) AS rn
    FROM s3 c JOIN walk_both b ON c.node = b.u
  ) WHERE rn = 1
)
SELECT walk_id, CAST(step AS INTEGER) AS step, node FROM (
  SELECT walk_id, 0 AS step, node FROM s0
  UNION ALL SELECT * FROM s1
  UNION ALL SELECT * FROM s2
  UNION ALL SELECT * FROM s3
  UNION ALL SELECT * FROM s4
) ORDER BY walk_id, step
"""

ORACLES["q_fd_audit"] = """
WITH f1 AS (
  SELECT 'partkey_to_brand' AS fd, COUNT(*) AS n_keys,
         CAST(SUM(CASE WHEN nv > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating_keys,
         MAX(nv) <= 1 AS holds
  FROM (SELECT p_partkey, COUNT(DISTINCT p_brand) AS nv FROM part GROUP BY p_partkey)
), f2 AS (
  SELECT 'brand_to_type' AS fd, COUNT(*) AS n_keys,
         CAST(SUM(CASE WHEN nv > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating_keys,
         MAX(nv) <= 1 AS holds
  FROM (SELECT p_brand, COUNT(DISTINCT p_type) AS nv FROM part GROUP BY p_brand)
), f3 AS (
  SELECT 'type_to_size' AS fd, COUNT(*) AS n_keys,
         CAST(SUM(CASE WHEN nv > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating_keys,
         MAX(nv) <= 1 AS holds
  FROM (SELECT p_type, COUNT(DISTINCT p_size) AS nv FROM part GROUP BY p_type)
)
SELECT * FROM f1 UNION ALL SELECT * FROM f2 UNION ALL SELECT * FROM f3
ORDER BY fd
"""

ORACLES["q_mix_temperature"] = """
WITH per_src AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
), tot AS (
  SELECT CAST(SUM(n_docs) AS BIGINT) AS N,
         (CAST(SUM(CAST(ROUND(SQRT(CAST(n_docs AS DOUBLE)) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS Z
  FROM per_src
)
SELECT source, n_docs,
       ROUND(SQRT(CAST(n_docs AS DOUBLE)) / Z, 6) AS weight,
       ROUND(SQRT(CAST(n_docs AS DOUBLE)) / Z * N, 6) AS expected_docs
FROM per_src, tot ORDER BY source
"""

ORACLES["q_tokenizer_fertility"] = """
WITH w0 AS (
  SELECT word, COUNT(*) AS cnt
  FROM (SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY word
),
v0 AS (SELECT word, cnt, string_split(word, '') AS s FROM w0),
p1 AS (
  SELECT lhs, rhs, SUM(cnt) AS c FROM (
    SELECT cnt, s[i] AS lhs, s[i+1] AS rhs
    FROM (SELECT cnt, s, UNNEST(range(1, len(s))) AS i FROM v0)
  ) GROUP BY lhs, rhs
),
b1 AS (SELECT lhs, rhs, c FROM p1 ORDER BY c DESC, lhs, rhs LIMIT 1),
s1 AS (
  SELECT e.word, e.i
  FROM (SELECT word, s, UNNEST(range(1, len(s))) AS i FROM v0) e, b1
  WHERE e.s[e.i] = b1.lhs AND e.s[e.i+1] = b1.rhs
),
k1 AS (
  SELECT word, i FROM (
    SELECT word, i, MIN(i) OVER (PARTITION BY word, g) AS m
    FROM (SELECT word, i,
                 i - ROW_NUMBER() OVER (PARTITION BY word ORDER BY i) AS g
          FROM s1)
  ) WHERE (i - m) % 2 = 0
),
v1 AS (
  SELECT e.word, ANY_VALUE(e.cnt) AS cnt,
         list(CASE WHEN ka.i IS NOT NULL THEN e.sym || e.nxt ELSE e.sym END
              ORDER BY e.idx) AS s
  FROM (SELECT word, cnt, s[idx] AS sym, s[idx+1] AS nxt, idx
        FROM (SELECT word, cnt, s, UNNEST(range(1, len(s)+1)) AS idx FROM v0)) e
  LEFT JOIN k1 ka ON e.word = ka.word AND e.idx = ka.i
  LEFT JOIN k1 kb ON e.word = kb.word AND e.idx = kb.i + 1
  WHERE kb.i IS NULL
  GROUP BY e.word
),
p2 AS (
  SELECT lhs, rhs, SUM(cnt) AS c FROM (
    SELECT cnt, s[i] AS lhs, s[i+1] AS rhs
    FROM (SELECT cnt, s, UNNEST(range(1, len(s))) AS i FROM v1)
  ) GROUP BY lhs, rhs
),
b2 AS (SELECT lhs, rhs, c FROM p2 ORDER BY c DESC, lhs, rhs LIMIT 1),
s2 AS (
  SELECT e.word, e.i
  FROM (SELECT word, s, UNNEST(range(1, len(s))) AS i FROM v1) e, b2
  WHERE e.s[e.i] = b2.lhs AND e.s[e.i+1] = b2.rhs
),
k2 AS (
  SELECT word, i FROM (
    SELECT word, i, MIN(i) OVER (PARTITION BY word, g) AS m
    FROM (SELECT word, i,
                 i - ROW_NUMBER() OVER (PARTITION BY word ORDER BY i) AS g
          FROM s2)
  ) WHERE (i - m) % 2 = 0
),
v2 AS (
  SELECT e.word, ANY_VALUE(e.cnt) AS cnt,
         list(CASE WHEN ka.i IS NOT NULL THEN e.sym || e.nxt ELSE e.sym END
              ORDER BY e.idx) AS s
  FROM (SELECT word, cnt, s[idx] AS sym, s[idx+1] AS nxt, idx
        FROM (SELECT word, cnt, s, UNNEST(range(1, len(s)+1)) AS idx FROM v1)) e
  LEFT JOIN k2 ka ON e.word = ka.word AND e.idx = ka.i
  LEFT JOIN k2 kb ON e.word = kb.word AND e.idx = kb.i + 1
  WHERE kb.i IS NULL
  GROUP BY e.word
),
p3 AS (
  SELECT lhs, rhs, SUM(cnt) AS c FROM (
    SELECT cnt, s[i] AS lhs, s[i+1] AS rhs
    FROM (SELECT cnt, s, UNNEST(range(1, len(s))) AS i FROM v2)
  ) GROUP BY lhs, rhs
),
b3 AS (SELECT lhs, rhs, c FROM p3 ORDER BY c DESC, lhs, rhs LIMIT 1),
s3 AS (
  SELECT e.word, e.i
  FROM (SELECT word, s, UNNEST(range(1, len(s))) AS i FROM v2) e, b3
  WHERE e.s[e.i] = b3.lhs AND e.s[e.i+1] = b3.rhs
),
k3 AS (
  SELECT word, i FROM (
    SELECT word, i, MIN(i) OVER (PARTITION BY word, g) AS m
    FROM (SELECT word, i,
                 i - ROW_NUMBER() OVER (PARTITION BY word ORDER BY i) AS g
          FROM s3)
  ) WHERE (i - m) % 2 = 0
),
v3 AS (
  SELECT e.word, ANY_VALUE(e.cnt) AS cnt,
         list(CASE WHEN ka.i IS NOT NULL THEN e.sym || e.nxt ELSE e.sym END
              ORDER BY e.idx) AS s
  FROM (SELECT word, cnt, s[idx] AS sym, s[idx+1] AS nxt, idx
        FROM (SELECT word, cnt, s, UNNEST(range(1, len(s)+1)) AS idx FROM v2)) e
  LEFT JOIN k3 ka ON e.word = ka.word AND e.idx = ka.i
  LEFT JOIN k3 kb ON e.word = kb.word AND e.idx = kb.i + 1
  WHERE kb.i IS NULL
  GROUP BY e.word
),
toks AS (
  SELECT doc_id, word FROM (
    SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents
  ) WHERE word <> ''
), perdoc AS (
  SELECT t.doc_id,
         CAST(SUM(len(v.s)) AS BIGINT) AS bpe,
         CAST(COUNT(*) AS BIGINT) AS ws
  FROM toks t JOIN v3 v USING (word)
  GROUP BY t.doc_id
)
SELECT d.lang,
       COUNT(*) AS n_docs,
       CAST(SUM(p.ws) AS BIGINT) AS ws_tokens,
       CAST(SUM(p.bpe) AS BIGINT) AS bpe_tokens,
       ROUND(CAST(SUM(p.bpe) AS DOUBLE) / CAST(SUM(p.ws) AS DOUBLE), 6) AS fertility
FROM perdoc p JOIN documents d USING (doc_id)
GROUP BY d.lang ORDER BY d.lang
"""

ORACLES["q_rendezvous_shard"] = """
WITH ex AS (
  SELECT doc_id, s, md5(concat(CAST(doc_id AS VARCHAR), '|', CAST(s AS VARCHAR))) AS h
  FROM documents, UNNEST(range(0, 9)) t(s)
), g8 AS (
  SELECT doc_id, arg_min(s, h) AS shard8 FROM ex WHERE s < 8 GROUP BY doc_id
), g9 AS (
  SELECT doc_id, arg_min(s, h) AS shard9 FROM ex GROUP BY doc_id
)
SELECT g9.shard9, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN g8.shard8 <> g9.shard9 THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
FROM g8 JOIN g9 USING (doc_id)
GROUP BY g9.shard9 ORDER BY g9.shard9
"""

ORACLES["q_fifo_pnl"] = """
WITH li AS (
  SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate,
         CAST(l_quantity AS BIGINT) AS qty,
         FLOOR(l_extendedprice / l_quantity * 1000000.0) / 1000000.0 AS unit_price
  FROM lineitem
), b AS (
  SELECT l_partkey, unit_price AS b_unit_price,
         SUM(qty) OVER w - qty AS b_lo, SUM(qty) OVER w AS b_hi
  FROM li WHERE l_linenumber % 2 = 1
  WINDOW w AS (PARTITION BY l_partkey ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), s AS (
  SELECT l_partkey, unit_price AS s_unit_price,
         SUM(qty) OVER w - qty AS s_lo, SUM(qty) OVER w AS s_hi
  FROM li WHERE l_linenumber % 2 = 0
  WINDOW w AS (PARTITION BY l_partkey ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), m AS (
  SELECT b.l_partkey,
         LEAST(b_hi, s_hi) - GREATEST(b_lo, s_lo) AS matched_qty,
         b_unit_price, s_unit_price
  FROM b JOIN s USING (l_partkey)
  WHERE b_lo < s_hi AND s_lo < b_hi
)
SELECT l_partkey,
       COUNT(*) AS n_matches,
       CAST(SUM(matched_qty) AS BIGINT) AS matched_qty,
       ROUND(CAST(SUM(CAST(ROUND((CAST(matched_qty AS DOUBLE) * (s_unit_price - b_unit_price)) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000, 6) AS realized_pnl
FROM m GROUP BY l_partkey ORDER BY l_partkey
"""

ORACLES["q_top_paths"] = """
WITH marked AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w IS NULL
                OR epoch(ts) - lag(epoch(ts)) OVER w > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts, event_id, event_type,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_no
  FROM marked
), numbered AS (
  SELECT user_id, sess_no, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, sess_no ORDER BY ts, event_id) AS rn
  FROM sess
), paths AS (
  SELECT user_id, sess_no,
         string_agg(event_type, '>' ORDER BY rn) AS path
  FROM numbered WHERE rn <= 3
  GROUP BY user_id, sess_no
)
SELECT path, COUNT(*) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path LIMIT 15
"""

ORACLES["q_wilson_ci"] = """
WITH agg AS (
  SELECT source,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CASE WHEN n_chars > 200 THEN 1 ELSE 0 END) AS DOUBLE) AS k
  FROM documents GROUP BY source
)
SELECT source,
       CAST(n AS BIGINT) AS n_docs,
       CAST(k AS BIGINT) AS n_long,
       ROUND(k / n, 6) AS rate,
       ROUND(((k / n + (1.96 * 1.96) / (2.0 * n)) / (1.0 + (1.96 * 1.96) / n))
             - (1.96 * SQRT((k / n) * (1.0 - k / n) / n + (1.96 * 1.96) / (4.0 * n * n))
                / (1.0 + (1.96 * 1.96) / n)), 6) AS ci_lo,
       ROUND(((k / n + (1.96 * 1.96) / (2.0 * n)) / (1.0 + (1.96 * 1.96) / n))
             + (1.96 * SQRT((k / n) * (1.0 - k / n) / n + (1.96 * 1.96) / (4.0 * n * n))
                / (1.0 + (1.96 * 1.96) / n)), 6) AS ci_hi
FROM agg ORDER BY source
"""

ORACLES["q_mann_kendall"] = """
WITH daily AS (
  SELECT l_suppkey,
         strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS day,
         ROUND((CAST(SUM(CAST(ROUND((l_extendedprice) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) / COUNT(*), 6) AS close
  FROM lineitem WHERE l_suppkey <= 10
  GROUP BY l_suppkey, strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')
), pairs AS (
  SELECT a.l_suppkey,
         CASE WHEN b.close > a.close THEN 1 WHEN b.close < a.close THEN -1 ELSE 0 END AS sgn
  FROM daily a JOIN daily b ON a.l_suppkey = b.l_suppkey AND a.day < b.day
)
SELECT l_suppkey,
       CAST(SUM(sgn) AS BIGINT) AS s_stat,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(CAST(SUM(sgn) AS DOUBLE) / COUNT(*), 6) AS tau
FROM pairs GROUP BY l_suppkey ORDER BY l_suppkey
"""

ORACLES["q_vwap"] = """
SELECT l_suppkey,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
       ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                      * CAST(l_quantity AS BIGINT)) AS DOUBLE)
             / CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) / 100.0, 6) AS vwap
FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey
"""

ORACLES["q_er_pipeline"] = """
WITH RECURSIVE pairs AS (
  SELECT a.c_custkey AS u, b.c_custkey AS v
  FROM customer a JOIN customer b
    ON substr(a.c_name, 1, length(a.c_name) - 2)
       = substr(b.c_name, 1, length(b.c_name) - 2)
   AND a.c_custkey < b.c_custkey
  WHERE levenshtein(a.c_name, b.c_name) <= 1
), edges AS (
  SELECT u, v FROM pairs UNION SELECT v, u FROM pairs
), reach AS (
  SELECT u AS src, v AS dst FROM edges
  UNION
  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
), comp AS (
  SELECT src AS id, LEAST(src, MIN(dst)) AS comp FROM reach GROUP BY src
)
SELECT c2.comp AS cluster_id,
       COUNT(*) AS n_members,
       arg_min(c.c_name, c.c_custkey) AS canonical_name,
       CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_acctbal
FROM customer c JOIN comp c2 ON c.c_custkey = c2.id
GROUP BY c2.comp
HAVING COUNT(*) >= 2
ORDER BY c2.comp
"""

ORACLES["q_ranking_metrics"] = """
WITH tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents)
  WHERE term <> ''
  GROUP BY doc_id, term
), dl AS (
  SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id
), dfreq AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), stats AS (
  SELECT (SELECT SUM(tf) FROM tf) AS total_tf,
         (SELECT COUNT(*) FROM documents) AS n_docs
), scored AS (
  SELECT tf.doc_id, tf.term,
         ROUND(LN(1.0 + (s.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
               * tf.tf * (1.2 + 1.0)
               / (tf.tf + 1.2 * (1.0 - 0.75
                                 + 0.75 * dl.dl / (s.total_tf * 1.0 / s.n_docs))),
               6) AS score
  FROM tf
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN dfreq ON tf.term = dfreq.term
  CROSS JOIN stats s
), queries(query_id, qtext) AS (
  VALUES (1, 'spark join hash'),
         (2, 'window agg sort'),
         (3, 'stream batch merge')
), qterms AS (
  SELECT DISTINCT query_id, term
  FROM (SELECT query_id, UNNEST(string_split(qtext, ' ')) AS term FROM queries)
  WHERE term <> ''
), totals AS (
  SELECT q.query_id, s.doc_id,
         ROUND(CAST(SUM(CAST(ROUND(s.score * 1000000) AS BIGINT)) AS DOUBLE)
               / 1000000, 6) AS total_score
  FROM scored s JOIN qterms q ON s.term = q.term
  GROUP BY q.query_id, s.doc_id
), ranked AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT *, ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY total_score DESC, doc_id ASC
           ) AS rank
    FROM totals
  ) WHERE rank <= 10
), rel_pairs AS (
  SELECT q.query_id, t.doc_id,
         CAST(LEAST(SUM(t.tf), 3) AS INTEGER) AS rel
  FROM qterms q JOIN tf t ON q.term = t.term
  GROUP BY q.query_id, t.doc_id
), jj AS (
  SELECT r.query_id, r.rank, COALESCE(p.rel, 0) AS rel
  FROM ranked r LEFT JOIN rel_pairs p
    ON r.query_id = p.query_id AND r.doc_id = p.doc_id
), ideal AS (
  SELECT query_id, rel,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rel DESC, rank ASC) AS irank
  FROM jj
), idcg AS (
  SELECT query_id,
         (CAST(SUM(CAST(ROUND(((CASE rel WHEN 0 THEN 0.0 WHEN 1 THEN 1.0 WHEN 2 THEN 3.0 ELSE 7.0 END)
             / log2(CAST(irank AS DOUBLE) + 1.0)) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS idcg
  FROM ideal GROUP BY query_id
), dcg AS (
  SELECT query_id,
         (CAST(SUM(CAST(ROUND(((CASE rel WHEN 0 THEN 0.0 WHEN 1 THEN 1.0 WHEN 2 THEN 3.0 ELSE 7.0 END)
             / log2(CAST(rank AS DOUBLE) + 1.0)) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS dcg,
         MIN(CASE WHEN rel > 0 THEN rank END) AS fr,
         CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rel
  FROM jj GROUP BY query_id
)
SELECT d.query_id, d.n_rel,
       ROUND(CASE WHEN i.idcg > 0 THEN d.dcg / i.idcg ELSE 0.0 END, 6) AS ndcg10,
       ROUND(COALESCE(1.0 / CAST(d.fr AS DOUBLE), 0.0), 6) AS mrr
FROM dcg d JOIN idcg i USING (query_id) ORDER BY d.query_id
"""

ORACLES["q_mahalanobis"] = """
WITH mom AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         (CAST(SUM(CAST(ROUND((l_quantity) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS t1,
         (CAST(SUM(CAST(ROUND(((l_extendedprice / 1000.0)) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS t2,
         (CAST(SUM(CAST(ROUND((l_quantity * l_quantity) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS t11,
         (CAST(SUM(CAST(ROUND((l_quantity * (l_extendedprice / 1000.0)) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS t12,
         (CAST(SUM(CAST(ROUND(((l_extendedprice / 1000.0) * (l_extendedprice / 1000.0)) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS t22
  FROM lineitem GROUP BY l_returnflag
), stats AS (
  SELECT l_returnflag,
         t1 / n AS m1, t2 / n AS m2,
         t11 / n - (t1 / n) * (t1 / n) AS s11,
         t12 / n - (t1 / n) * (t2 / n) AS s12,
         t22 / n - (t2 / n) * (t2 / n) AS s22
  FROM mom
), scored AS (
  SELECT li.l_returnflag, li.l_orderkey, li.l_linenumber,
         ROUND(((s22 * ((li.l_quantity - m1) * (li.l_quantity - m1))
                 - (2.0 * s12) * ((li.l_quantity - m1) * ((li.l_extendedprice / 1000.0) - m2))
                 + s11 * (((li.l_extendedprice / 1000.0) - m2) * ((li.l_extendedprice / 1000.0) - m2)))
                / (s11 * s22 - s12 * s12)), 6) AS d2
  FROM lineitem li JOIN stats USING (l_returnflag)
)
SELECT l_returnflag, l_orderkey, l_linenumber, d2, rank
FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY l_returnflag
             ORDER BY d2 DESC, l_orderkey, l_linenumber) AS INTEGER) AS rank
  FROM scored
) WHERE rank <= 5
ORDER BY l_returnflag, rank
"""

ORACLES["q_pca_spectrum"] = """
WITH mom AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         (CAST(SUM(CAST(ROUND((l_quantity) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS t1,
         (CAST(SUM(CAST(ROUND((l_discount) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS t2,
         (CAST(SUM(CAST(ROUND((l_quantity * l_quantity) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS t11,
         (CAST(SUM(CAST(ROUND((l_quantity * l_discount) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS t12,
         (CAST(SUM(CAST(ROUND((l_discount * l_discount) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS t22
  FROM lineitem GROUP BY l_returnflag
), stats AS (
  SELECT l_returnflag,
         t1 / n AS m1, t2 / n AS m2,
         t11 / n - (t1 / n) * (t1 / n) AS s11,
         t12 / n - (t1 / n) * (t2 / n) AS s12,
         t22 / n - (t2 / n) * (t2 / n) AS s22
  FROM mom
)
SELECT l_returnflag,
       ROUND((s11 + s22 + sqrt((s11 + s22) * (s11 + s22) - 4.0 * (s11 * s22 - s12 * s12))) / 2.0, 6) AS lambda1,
       ROUND((s11 + s22 - sqrt((s11 + s22) * (s11 + s22) - 4.0 * (s11 * s22 - s12 * s12))) / 2.0, 6) AS lambda2,
       ROUND(((s11 + s22 + sqrt((s11 + s22) * (s11 + s22) - 4.0 * (s11 * s22 - s12 * s12))) / 2.0)
             / (((s11 + s22 + sqrt((s11 + s22) * (s11 + s22) - 4.0 * (s11 * s22 - s12 * s12))) / 2.0)
                + ((s11 + s22 - sqrt((s11 + s22) * (s11 + s22) - 4.0 * (s11 * s22 - s12 * s12))) / 2.0)), 6) AS evr1
FROM stats ORDER BY l_returnflag
"""

ORACLES["q_budget_allocation"] = """
WITH per_src AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
), tot AS (
  SELECT (CAST(SUM(CAST(ROUND(SQRT(CAST(n_docs AS DOUBLE)) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS Z,
         COUNT(*) AS k
  FROM per_src
), w AS (
  SELECT source, n_docs,
         CAST(ROUND((SQRT(CAST(n_docs AS DOUBLE)) / Z) * 100000 * 1000000) AS BIGINT) AS quota_micro
  FROM per_src, tot
), based AS (
  SELECT source, n_docs,
         quota_micro // 1000000 AS base,
         quota_micro % 1000000 AS rem
  FROM w
), shortfall AS (
  SELECT 100000 - CAST(SUM(base) AS BIGINT) AS short FROM based
), ranked AS (
  SELECT source, n_docs, base, rem,
         ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk
  FROM based
)
SELECT source, n_docs,
       CAST(base + CASE WHEN rk <= short THEN 1 ELSE 0 END AS BIGINT) AS allocated
FROM ranked, shortfall ORDER BY source
"""

ORACLES["q_column_entropy"] = """
WITH long AS (
  SELECT 'o_orderpriority' AS col, o_orderpriority AS val FROM orders
  UNION ALL
  SELECT 'o_orderstatus', o_orderstatus FROM orders
  UNION ALL
  SELECT 'order_year', CAST(year(o_orderdate) AS VARCHAR) FROM orders
), cells AS (
  SELECT col, val, COUNT(*) AS n FROM long GROUP BY col, val
), tot AS (
  SELECT col, CAST(SUM(n) AS BIGINT) AS t FROM cells GROUP BY col
)
SELECT cells.col,
       COUNT(*) AS n_distinct,
       ROUND(-(CAST(SUM(CAST(ROUND(((CAST(n AS DOUBLE) / t) * log2(CAST(n AS DOUBLE) / t)) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000), 6) AS entropy_bits
FROM cells JOIN tot USING (col)
GROUP BY cells.col ORDER BY cells.col
"""

ORACLES["q_funnel_windowed"] = """
WITH first_click AS (
  SELECT user_id, MIN(ts) AS c_ts FROM events WHERE event_type = 'click' GROUP BY user_id
), purchases AS (
  SELECT user_id, ts AS p_ts FROM events WHERE event_type = 'purchase'
), j AS (
  SELECT f.user_id,
         CASE WHEN p.p_ts IS NOT NULL AND p.p_ts >= f.c_ts
               AND CAST(epoch(p.p_ts) AS BIGINT) <= CAST(epoch(f.c_ts) AS BIGINT) + 7 * 86400
              THEN 1 ELSE 0 END AS conv
  FROM first_click f LEFT JOIN purchases p ON f.user_id = p.user_id
), per_user AS (
  SELECT user_id, MAX(conv) AS converted FROM j GROUP BY user_id
)
SELECT COUNT(*) AS n_clickers,
       CAST(SUM(converted) AS BIGINT) AS n_converted_7d,
       ROUND(CAST(SUM(converted) AS DOUBLE) / COUNT(*), 6) AS conv_rate_7d
FROM per_user
"""

ORACLES["q_join_size_estimate"] = """
WITH ha AS (
  SELECT l_orderkey AS k, COUNT(*) AS ca FROM lineitem GROUP BY l_orderkey
), hb AS (
  SELECT o_orderkey AS k, COUNT(*) AS cb FROM orders GROUP BY o_orderkey
)
SELECT CAST(SUM(ca * cb) AS BIGINT) AS est_join_rows,
       COUNT(*) AS n_matching_keys,
       CAST(MAX(ca * cb) AS BIGINT) AS max_key_fanout
FROM ha JOIN hb USING (k)
"""

ORACLES["q_table_checksum"] = """
WITH d AS (
  SELECT o_orderkey % 16 AS bucket,
         CAST('0x' || substring(md5(concat_ws('|',
              CASE WHEN o_orderkey IS NULL THEN 'n' ELSE length(CAST(o_orderkey AS VARCHAR)) || ':' || CAST(o_orderkey AS VARCHAR) END,
              CASE WHEN o_custkey IS NULL THEN 'n' ELSE length(CAST(o_custkey AS VARCHAR)) || ':' || CAST(o_custkey AS VARCHAR) END,
              CASE WHEN o_orderstatus IS NULL THEN 'n' ELSE length(o_orderstatus) || ':' || o_orderstatus END,
              CASE WHEN o_totalprice IS NULL THEN 'n' ELSE length(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR)) || ':' || CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR) END)), 1, 10) AS BIGINT) AS dig
  FROM orders
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       COUNT(*) AS n_rows,
       CAST(SUM(dig) AS BIGINT) AS checksum
FROM d GROUP BY bucket ORDER BY bucket
"""

ORACLES["q_funnel_steps"] = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS step_ts FROM events WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, MIN(e.ts) AS step_ts
  FROM s1 JOIN events e ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts >= s1.step_ts
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, MIN(e.ts) AS step_ts
  FROM s2 JOIN events e ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= s2.step_ts
  GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM s1) AS n_view,
       (SELECT COUNT(*) FROM s2) AS n_click,
       (SELECT COUNT(*) FROM s3) AS n_purchase,
       ROUND(CAST((SELECT COUNT(*) FROM s2) AS DOUBLE) / (SELECT COUNT(*) FROM s1), 6) AS rate_click,
       ROUND(CAST((SELECT COUNT(*) FROM s3) AS DOUBLE) / (SELECT COUNT(*) FROM s2), 6) AS rate_purchase
"""

ORACLES["q_forecast_backtest"] = """
WITH daily AS (
  SELECT l_suppkey,
         strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS day,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM lineitem WHERE l_suppkey <= 10
  GROUP BY l_suppkey, strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')
), scored AS (
  SELECT l_suppkey, y,
         LAG(y, 7) OVER (PARTITION BY l_suppkey ORDER BY day) AS yhat
  FROM daily
), nz AS (
  SELECT l_suppkey, CAST(ABS(y - yhat) AS DOUBLE) AS err,
         CAST(ABS(y - yhat) AS DOUBLE) * 2.0 / (y + yhat) AS st
  FROM scored WHERE yhat IS NOT NULL
)
SELECT l_suppkey,
       COUNT(*) AS n_scored,
       ROUND((CAST(SUM(CAST(ROUND(err * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) / COUNT(err), 6) AS mae,
       ROUND((CAST(SUM(CAST(ROUND(st * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) / COUNT(st), 6) AS smape
FROM nz GROUP BY l_suppkey ORDER BY l_suppkey
"""

ORACLES["q_elasticity"] = """
WITH j AS (
  SELECT p.p_brand,
         LN(CAST(l_quantity AS DOUBLE)) AS ln_q,
         LN(l_extendedprice / l_quantity) AS ln_p
  FROM lineitem li JOIN part p ON li.l_partkey = p.p_partkey
)
SELECT p_brand,
       CAST(regr_count(ln_q, ln_p) AS BIGINT) AS n_obs,
       ROUND(regr_slope(ln_q, ln_p), 6) AS elasticity,
       ROUND(regr_r2(ln_q, ln_p), 6) AS r2
FROM j GROUP BY p_brand ORDER BY p_brand
"""

ORACLES["q_lsh_precision"] = """
WITH g AS (
  SELECT doc_id, UNNEST(list_distinct(
           list_transform(range(1, len(l) - 1),
                          x -> l[x] || ' ' || l[x+1] || ' ' || l[x+2])
         )) AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
),
h AS (
  SELECT doc_id,
         ('0x' || substr(md5(gram), 1, 15))::BIGINT AS u1,
         ('0x' || substr(md5(gram), 17, 15))::BIGINT % 72057594037927936 AS u2
  FROM g
),
sig AS (
  SELECT doc_id, t.i, MIN((u1 + t.i * u2) % 1152921504606846976) AS v
  FROM h CROSS JOIN (SELECT UNNEST(range(0, 16)) AS i) t
  GROUP BY doc_id, t.i
),
bandk AS (
  SELECT doc_id, CAST(i // 4 AS BIGINT) AS band,
         string_agg(CAST(v AS VARCHAR), '_' ORDER BY i) AS key
  FROM sig GROUP BY 1, 2
),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bandk a
  JOIN bandk b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id),
inter AS (
  SELECT ga.doc_id AS id_a, gb.doc_id AS id_b, COUNT(*) AS ninter
  FROM g ga JOIN g gb ON ga.gram = gb.gram AND ga.doc_id < gb.doc_id
  GROUP BY 1, 2
)
SELECT COUNT(*) AS n_candidates,
       CAST(SUM(CASE WHEN jac >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
       ROUND(CAST(SUM(CASE WHEN jac >= 0.5 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS precision,
       ROUND((CAST(SUM(CAST(ROUND(jac * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) / COUNT(jac), 6) AS avg_jac
FROM (
  SELECT c.id_a, c.id_b,
         ROUND(CAST(COALESCE(i.ninter, 0) AS DOUBLE)
               / (sa.n + sb.n - COALESCE(i.ninter, 0)), 6) AS jac
  FROM cand c
  JOIN sizes sa ON sa.doc_id = c.id_a
  JOIN sizes sb ON sb.doc_id = c.id_b
  LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
)

"""

ORACLES["q_byte_entropy"] = """
WITH hx AS (
  SELECT doc_id, lower(hex(encode(text))) AS h FROM documents
  WHERE length(lower(hex(encode(text)))) > 0
), pairs AS (
  SELECT doc_id, UNNEST(regexp_extract_all(h, '..')) AS byte FROM hx
), cells AS (
  SELECT doc_id, byte, COUNT(*) AS n FROM pairs GROUP BY doc_id, byte
), tot AS (
  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS t FROM cells GROUP BY doc_id
)
SELECT cells.doc_id,
       MAX(t) AS n_bytes,
       COUNT(*) AS n_distinct_bytes,
       ROUND(-(CAST(SUM(CAST(ROUND(((CAST(n AS DOUBLE) / t) * log2(CAST(n AS DOUBLE) / t)) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000), 6) AS byte_entropy
FROM cells JOIN tot USING (doc_id)
GROUP BY cells.doc_id
"""

ORACLES["q_langid_confusion"] = """
WITH scored AS (
  SELECT CASE WHEN lang = 'en' THEN 'en' ELSE 'other' END AS truth,
         CASE WHEN CAST(len(list_filter(string_split(text, ' '),
                    t -> list_contains(['the','a','of','and','to','in','is','on','for','with'], t)))
              AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE) >= 0.05
              THEN 'en' ELSE 'other' END AS pred
  FROM documents
)
SELECT truth, pred, COUNT(*) AS n
FROM scored GROUP BY truth, pred ORDER BY truth, pred
"""

ORACLES["q_seasonal_lag"] = """
WITH daily AS (
  SELECT l_suppkey,
         strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS day,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM lineitem WHERE l_suppkey <= 10
  GROUP BY l_suppkey, strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')
), stats AS (
  SELECT l_suppkey, COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS s
  FROM daily GROUP BY l_suppkey
), c0 AS (
  SELECT d.l_suppkey, d.day, st.n * d.x - st.s AS c
  FROM daily d JOIN stats st USING (l_suppkey)
), lagged AS (
  SELECT l_suppkey, c,
         LAG(c, 1) OVER w AS c1,
         LAG(c, 2) OVER w AS c2,
         LAG(c, 3) OVER w AS c3,
         LAG(c, 4) OVER w AS c4,
         LAG(c, 5) OVER w AS c5,
         LAG(c, 6) OVER w AS c6,
         LAG(c, 7) OVER w AS c7,
         LAG(c, 8) OVER w AS c8,
         LAG(c, 9) OVER w AS c9,
         LAG(c, 10) OVER w AS c10
  FROM c0
  WINDOW w AS (PARTITION BY l_suppkey ORDER BY day)
), agg AS (
  SELECT l_suppkey,
         CAST(SUM(c * c) AS BIGINT) AS den,
         CAST(SUM(c * c1) AS BIGINT) AS num1,
         CAST(SUM(c * c2) AS BIGINT) AS num2,
         CAST(SUM(c * c3) AS BIGINT) AS num3,
         CAST(SUM(c * c4) AS BIGINT) AS num4,
         CAST(SUM(c * c5) AS BIGINT) AS num5,
         CAST(SUM(c * c6) AS BIGINT) AS num6,
         CAST(SUM(c * c7) AS BIGINT) AS num7,
         CAST(SUM(c * c8) AS BIGINT) AS num8,
         CAST(SUM(c * c9) AS BIGINT) AS num9,
         CAST(SUM(c * c10) AS BIGINT) AS num10
  FROM lagged GROUP BY l_suppkey
), stacked AS (
  SELECT l_suppkey, 1 AS lag, num1 AS num, den FROM agg UNION ALL SELECT l_suppkey, 2 AS lag, num2 AS num, den FROM agg UNION ALL SELECT l_suppkey, 3 AS lag, num3 AS num, den FROM agg UNION ALL SELECT l_suppkey, 4 AS lag, num4 AS num, den FROM agg UNION ALL SELECT l_suppkey, 5 AS lag, num5 AS num, den FROM agg UNION ALL SELECT l_suppkey, 6 AS lag, num6 AS num, den FROM agg UNION ALL SELECT l_suppkey, 7 AS lag, num7 AS num, den FROM agg UNION ALL SELECT l_suppkey, 8 AS lag, num8 AS num, den FROM agg UNION ALL SELECT l_suppkey, 9 AS lag, num9 AS num, den FROM agg UNION ALL SELECT l_suppkey, 10 AS lag, num10 AS num, den FROM agg
), r AS (
  SELECT l_suppkey, lag, ROUND(CAST(num AS DOUBLE) / den, 6) AS r
  FROM stacked
)
SELECT l_suppkey, CAST(lag AS INTEGER) AS dominant_lag, r
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY l_suppkey ORDER BY r DESC, lag) AS rn
  FROM r
) WHERE rn = 1 ORDER BY l_suppkey
"""

ORACLES["q_grid_dbscan"] = """
WITH RECURSIVE pts AS (
  SELECT vec_id,
         CAST(FLOOR(CAST(embedding[1] AS DOUBLE) / 0.04) AS BIGINT) AS cx,
         CAST(FLOOR(CAST(embedding[2] AS DOUBLE) / 0.04) AS BIGINT) AS cy
  FROM embeddings
), cells AS (
  SELECT cx * 1000000 + cy AS cell_id, cx, cy, COUNT(*) AS n_pts
  FROM pts GROUP BY cx, cy
), dense AS (
  SELECT * FROM cells WHERE n_pts >= 3
), probes AS (
  SELECT d.cell_id AS id_a,
         (d.cx + o.ox) * 1000000 + (d.cy + o.oy) AS nbr
  FROM dense d, (SELECT UNNEST([-1, 0, 1]) AS ox)ox_t(ox),
       (SELECT UNNEST([-1, 0, 1]) AS oy) oy_t(oy),
       LATERAL (SELECT ox_t.ox AS ox, oy_t.oy AS oy) o
), edges0 AS (
  SELECT DISTINCT p.id_a, d2.cell_id AS id_b
  FROM probes p JOIN dense d2 ON p.nbr = d2.cell_id
  WHERE p.id_a < d2.cell_id
), edges AS (
  SELECT id_a AS u, id_b AS v FROM edges0
  UNION SELECT id_b, id_a FROM edges0
), reach AS (
  SELECT u AS src, v AS dst FROM edges
  UNION
  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
), comp AS (
  SELECT src AS id, LEAST(src, MIN(dst)) AS comp FROM reach GROUP BY src
), labeled AS (
  SELECT d.cell_id, COALESCE(c.comp, d.cell_id) AS cluster
  FROM dense d LEFT JOIN comp c ON d.cell_id = c.id
), assigned AS (
  SELECT p.vec_id, l.cell_id, l.cluster
  FROM pts p JOIN labeled l ON p.cx * 1000000 + p.cy = l.cell_id
)
SELECT cluster,
       COUNT(DISTINCT cell_id) AS n_cells,
       COUNT(*) AS n_points
FROM assigned GROUP BY cluster ORDER BY cluster
"""

ORACLES["q_basket_triples"] = """
WITH baskets AS (
  SELECT DISTINCT user_id, event_type FROM events
), nu AS (SELECT CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS n FROM baskets),
sup1 AS (
  SELECT event_type, COUNT(*) / n AS s FROM baskets, nu GROUP BY event_type, n
), pairs AS (
  SELECT a.event_type AS t_a, b.event_type AS t_b, COUNT(*) / ANY_VALUE(nu.n) AS s_ab
  FROM baskets a JOIN baskets b ON a.user_id = b.user_id AND a.event_type < b.event_type, nu
  GROUP BY a.event_type, b.event_type
  HAVING COUNT(*) / ANY_VALUE(nu.n) >= 0.05
), cand AS (
  SELECT a.event_type AS t_a, b.event_type AS t_b, c.event_type AS t_c
  FROM baskets a
  JOIN baskets b ON a.user_id = b.user_id AND a.event_type < b.event_type
  JOIN pairs p ON p.t_a = a.event_type AND p.t_b = b.event_type
  JOIN baskets c ON a.user_id = c.user_id AND c.event_type > b.event_type
), triples AS (
  SELECT t_a, t_b, t_c, COUNT(*) / ANY_VALUE(nu.n) AS support
  FROM cand, nu GROUP BY t_a, t_b, t_c
  HAVING COUNT(*) / ANY_VALUE(nu.n) >= 0.05
)
SELECT t.t_a, t.t_b, t.t_c,
       ROUND(t.support, 6) AS support,
       ROUND(t.support / (sa.s * sb.s * sc.s), 6) AS lift3
FROM triples t
JOIN sup1 sa ON sa.event_type = t.t_a
JOIN sup1 sb ON sb.event_type = t.t_b
JOIN sup1 sc ON sc.event_type = t.t_c
ORDER BY t.t_a, t.t_b, t.t_c
"""

ORACLES["q_ltv_curve"] = """
WITH o AS (
  SELECT o_custkey,
         date_trunc('month', CAST(o_orderdate AS DATE)) AS om,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), first AS (
  SELECT o_custkey, MIN(om) AS cohort FROM o GROUP BY o_custkey
), j AS (
  SELECT f.cohort,
         CAST(ROUND(12 * (year(o.om) - year(f.cohort))
                    + (month(o.om) - month(f.cohort))) AS INTEGER) AS age_months,
         o.cents, o.o_custkey
  FROM o JOIN first f USING (o_custkey)
), per_cell AS (
  SELECT cohort, age_months,
         COUNT(DISTINCT o_custkey) AS n_active,
         CAST(SUM(cents) AS BIGINT) AS rev_cents
  FROM j GROUP BY cohort, age_months
)
SELECT strftime(cohort, '%Y-%m') AS cohort_month,
       age_months, n_active,
       CAST(SUM(rev_cents) OVER (PARTITION BY cohort ORDER BY age_months
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0 AS cum_revenue
FROM per_cell ORDER BY cohort_month, age_months
"""

ORACLES["q_embedding_qa"] = """
WITH norms AS (
  SELECT label,
         ROUND(SQRT(list_aggregate(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 6) AS n
  FROM embeddings
)
SELECT label,
       COUNT(*) AS n_vecs,
       ROUND((CAST(SUM(CAST(ROUND(n * 1000000) AS BIGINT)) AS DOUBLE) / 1000000)
             / COUNT(n), 6) AS avg_norm,
       ROUND(MIN(n), 6) AS min_norm,
       ROUND(MAX(n), 6) AS max_norm,
       CAST(SUM(CASE WHEN n < 0.000001 THEN 1 ELSE 0 END) AS BIGINT) AS n_degenerate
FROM norms GROUP BY label ORDER BY label
"""

ORACLES["q_dup_size_dist"] = """
WITH groups AS (
  SELECT md5(substring(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), 1, 50)) AS fp,
         COUNT(*) AS sz
  FROM documents GROUP BY 1
), tot AS (SELECT CAST(SUM(sz) AS BIGINT) AS t FROM groups)
SELECT sz AS cluster_size,
       COUNT(*) AS n_groups,
       CAST(sz * COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(sz * COUNT(*) AS DOUBLE) / ANY_VALUE(t), 6) AS corpus_share
FROM groups, tot GROUP BY sz ORDER BY sz
"""

ORACLES["q_ann_recall"] = """
WITH seeds AS (
  SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell,
         CAST(embedding AS DOUBLE[]) AS cvec
  FROM (SELECT vec_id, embedding FROM embeddings
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 4)
), sims AS (
  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS vec, s.cell,
         ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), s.cvec)
               / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                        CAST(e.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(s.cvec, s.cvec))), 6) AS csim
  FROM embeddings e CROSS JOIN seeds s
), corpus_cells AS (
  SELECT vec_id, vec, cell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY csim DESC, cell ASC) AS rn
    FROM sims) WHERE rn = 1
), query_probes AS (
  SELECT vec_id AS q_id, vec AS qvec, cell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY csim DESC, cell ASC) AS rn
    FROM sims WHERE vec_id < 10) WHERE rn <= 2
), cand AS (
  SELECT p.q_id, c.vec_id,
         ROUND(list_dot_product(c.vec, p.qvec)
               / (sqrt(list_dot_product(c.vec, c.vec))
                  * sqrt(list_dot_product(p.qvec, p.qvec))), 6) AS sim
  FROM query_probes p JOIN corpus_cells c USING (cell)
  WHERE c.vec_id <> p.q_id
), approx AS (
  SELECT q_id, vec_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                 ORDER BY sim DESC, vec_id ASC) AS rn
    FROM cand) WHERE rn <= 5
), q AS (
  SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < 10
), s2 AS (
  SELECT q.q_id, e.vec_id,
         ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe)
               / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                        CAST(e.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(q.qe, q.qe))), 6) AS sim
  FROM embeddings e, q WHERE e.vec_id <> q.q_id
), exact AS (
  SELECT q_id, vec_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                 ORDER BY sim DESC, vec_id ASC) AS rn
    FROM s2) WHERE rn <= 5
)
SELECT e.q_id,
       CAST(COUNT(a.vec_id) AS BIGINT) AS n_hit,
       ROUND(CAST(COUNT(a.vec_id) AS DOUBLE) / COUNT(*), 6) AS recall
FROM exact e LEFT JOIN approx a USING (q_id, vec_id)
GROUP BY e.q_id
ORDER BY q_id
"""

ORACLES["q_rbo"] = f"""
WITH tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents)
  WHERE term <> ''
  GROUP BY doc_id, term
), dl AS (
  SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id
), dfreq AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), stats AS (
  SELECT (SELECT SUM(tf) FROM tf) AS total_tf,
         (SELECT COUNT(*) FROM documents) AS n_docs
), scored AS (
  SELECT tf.doc_id, tf.term,
         ROUND(LN(1.0 + (s.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
               * tf.tf * (1.2 + 1.0)
               / (tf.tf + 1.2 * (1.0 - 0.75
                                 + 0.75 * dl.dl / (s.total_tf * 1.0 / s.n_docs))),
               6) AS score
  FROM tf
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN dfreq ON tf.term = dfreq.term
  CROSS JOIN stats s
), queries AS (
  SELECT doc_id AS query_id, text AS qtext FROM documents
  WHERE doc_id IN (0, 7, 42)
), qterms AS (
  SELECT DISTINCT query_id, term
  FROM (SELECT query_id, UNNEST(string_split(qtext, ' ')) AS term FROM queries)
  WHERE term <> ''
), totals AS (
  SELECT q.query_id, s.doc_id,
         ROUND(CAST(SUM(CAST(ROUND(s.score * 1000000) AS BIGINT)) AS DOUBLE)
               / 1000000, 6) AS total_score
  FROM scored s JOIN qterms q ON s.term = q.term
  GROUP BY q.query_id, s.doc_id
), lex_raw AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT query_id, doc_id, ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY total_score DESC, doc_id ASC
           ) AS rank
    FROM totals
  ) WHERE rank <= 20 AND doc_id <> query_id
), lex AS (
  SELECT query_id, doc_id, ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY rank ASC
         ) AS rank
  FROM lex_raw
), qv AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id IN (0, 7, 42)
), dsims AS (
  SELECT qv.query_id, e.vec_id AS doc_id,
         ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), qv.qe)
               / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                        CAST(e.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(qv.qe, qv.qe))), 6) AS sim
  FROM embeddings e, qv
  WHERE e.vec_id <> qv.query_id
), dense AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT query_id, doc_id, ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY sim DESC, doc_id ASC
           ) AS rank
    FROM dsims
  ) WHERE rank <= 20
), a AS (SELECT query_id, doc_id, rank AS ra FROM lex WHERE rank <= 10),
b AS (SELECT query_id, doc_id, rank AS rb FROM dense WHERE rank <= 10),
common AS (
  SELECT a.query_id,
         list_extract([{_rbo_suffix_weight_literals()}],
                      CAST(GREATEST(ra, rb) AS INTEGER)) AS w
  FROM a JOIN b USING (query_id, doc_id)
), per_q AS (
  SELECT query_id, COUNT(*) AS overlap, SUM(w) AS wsum
  FROM common GROUP BY query_id
)
SELECT q.query_id,
       CAST(COALESCE(p.overlap, 0) AS BIGINT) AS overlap,
       ROUND(CAST(COALESCE(p.wsum, 0) AS DOUBLE) / 1000000000000.0, 9) AS rbo
FROM (SELECT DISTINCT query_id FROM a) q
LEFT JOIN per_q p USING (query_id)
ORDER BY query_id
"""

ORACLES["q_ngram_novelty"] = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
grams AS (
  SELECT DISTINCT doc_id,
         md5(l[i]||' '||l[i+1]||' '||l[i+2]||' '||l[i+3]||' '||l[i+4]
             ||' '||l[i+5]||' '||l[i+6]||' '||l[i+7]) AS g
  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l) - 7)) AS i
        FROM toks WHERE len(l) >= 8)
),
firstdoc AS (SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY g)
SELECT g.doc_id,
       COUNT(*) AS n_grams,
       CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       ROUND(CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS novelty_rate
FROM grams g JOIN firstdoc f USING (g)
GROUP BY g.doc_id
ORDER BY g.doc_id
"""

ORACLES["q_sharpe"] = f"""
WITH daily AS (
  SELECT l_suppkey,
         strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS day,
         ROUND({_dsum('l_extendedprice')} / COUNT(*), 6) AS close
  FROM lineitem WHERE l_suppkey <= 20
  GROUP BY l_suppkey, strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')
), rets AS (
  SELECT l_suppkey,
         ROUND(close / LAG(close) OVER (PARTITION BY l_suppkey ORDER BY day)
               - 1, 6) AS r
  FROM daily
), agg AS (
  SELECT l_suppkey, COUNT(*) AS n_days,
         {_dsum('r')} AS sr,
         {_dsum('r * r')} AS srr,
         {_dsum('LEAST(r, 0.0) * LEAST(r, 0.0)')} AS sdd
  FROM rets WHERE r IS NOT NULL GROUP BY l_suppkey
)
SELECT l_suppkey, n_days,
       ROUND(sr / CAST(n_days AS DOUBLE), 6) AS mean_ret,
       ROUND(CASE WHEN (CAST(n_days AS DOUBLE) * srr - sr * sr)
                       / (CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) - 1)) > 0
                  THEN sr / CAST(n_days AS DOUBLE)
                       / sqrt((CAST(n_days AS DOUBLE) * srr - sr * sr)
                              / (CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) - 1)))
                       * sqrt(252.0) END, 6) AS sharpe,
       ROUND(CASE WHEN sdd > 0
                  THEN sr / CAST(n_days AS DOUBLE)
                       / sqrt(sdd / CAST(n_days AS DOUBLE))
                       * sqrt(252.0) END, 6) AS sortino
FROM agg ORDER BY l_suppkey
"""

ORACLES["q_curation_report"] = """
WITH s1 AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           row_number() OVER (
             PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
             ORDER BY doc_id ASC) AS rn
    FROM documents) WHERE rn = 1
), s2 AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
      ROUND(
        LEAST(CAST(length(text) AS DOUBLE) / 200.0, 1.0) * 0.4
        + (CASE WHEN CAST(length(text) AS DOUBLE)
                     / CAST(len(string_split(text, ' ')) AS DOUBLE) >= 3.0
                 AND CAST(length(text) AS DOUBLE)
                     / CAST(len(string_split(text, ' ')) AS DOUBLE) <= 10.0
                THEN 1.0 ELSE 0.5 END) * 0.3
        + LEAST((CAST(len(list_filter(string_split(text, ' '),
                    t -> list_contains(['the','a','of','and','to','in','is','on','for','with'], t)))
                 AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 5.0,
                1.0) * 0.3, 6) AS quality
    FROM s1) WHERE quality >= 0.5
), rep AS (
  SELECT doc_id, CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS top_gram_frac
  FROM (SELECT doc_id, gram, COUNT(*) AS cnt
        FROM (SELECT doc_id,
                     unnest(list_transform(range(1, len(l)), x -> l[x] || ' ' || l[x+1])) AS gram
              FROM (SELECT doc_id, string_split(text, ' ') AS l FROM s2))
        GROUP BY doc_id, gram)
  GROUP BY doc_id
), s3 AS (
  SELECT s2.doc_id, s2.text FROM s2 LEFT JOIN rep USING (doc_id)
  WHERE rep.top_gram_frac IS NULL OR rep.top_gram_frac < 0.08
), entdocs AS (
  SELECT doc_id, lower(substring(text, 1, 240)) AS t FROM s3
  WHERE length(lower(substring(text, 1, 240))) > 0
), entcounts AS (
  SELECT doc_id, c, COUNT(*) AS n_c
  FROM (SELECT doc_id, substring(t, CAST(i AS INTEGER), 1) AS c
        FROM (SELECT doc_id, t, unnest(range(1, length(t) + 1)) AS i FROM entdocs))
  GROUP BY doc_id, c
), enttotals AS (
  SELECT doc_id, SUM(n_c) AS n FROM entcounts GROUP BY doc_id
), ent AS (
  SELECT entcounts.doc_id,
         -(CAST(SUM(CAST(ROUND(((n_c / n) * log2(n_c / n)) * 1000000) AS BIGINT))
            AS DOUBLE) / 1000000) AS entropy_bits
  FROM entcounts JOIN enttotals USING (doc_id)
  GROUP BY entcounts.doc_id
), s4 AS (
  SELECT s3.doc_id FROM s3 LEFT JOIN ent USING (doc_id)
  WHERE ent.entropy_bits IS NULL
     OR (ent.entropy_bits >= 1.5 AND ent.entropy_bits <= 7.0)
), counts AS (
  SELECT 0 AS stage_idx, 'raw' AS stage,
         (SELECT COUNT(*) FROM documents) AS rows_out
  UNION ALL SELECT 1, 'exact_dedup', (SELECT COUNT(*) FROM s1)
  UNION ALL SELECT 2, 'quality_gate', (SELECT COUNT(*) FROM s2)
  UNION ALL SELECT 3, 'repetition_gate', (SELECT COUNT(*) FROM s3)
  UNION ALL SELECT 4, 'entropy_band', (SELECT COUNT(*) FROM s4)
)
SELECT CAST(stage_idx AS INTEGER) AS stage_idx, stage,
       CAST(LAG(rows_out) OVER (ORDER BY stage_idx) AS BIGINT) AS rows_in,
       CAST(rows_out AS BIGINT) AS rows_out,
       CAST(LAG(rows_out) OVER (ORDER BY stage_idx) - rows_out AS BIGINT) AS dropped
FROM counts ORDER BY stage_idx
"""

ORACLES["q_token_percentiles"] = """
SELECT lang, COUNT(*) AS n_docs,
       ROUND(quantile_cont(CAST(len(string_split(text, ' ')) AS DOUBLE), 0.5), 6)
         AS p50_tokens,
       ROUND(quantile_cont(CAST(len(string_split(text, ' ')) AS DOUBLE), 0.9), 6)
         AS p90_tokens,
       ROUND(quantile_cont(CAST(len(string_split(text, ' ')) AS DOUBLE), 0.99), 6)
         AS p99_tokens,
       CAST(MAX(len(string_split(text, ' '))) AS BIGINT) AS max_tokens
FROM documents GROUP BY lang ORDER BY lang
"""

ORACLES["q_tail_index"] = """
WITH ranked AS (
  SELECT o_orderpriority, CAST(o_totalprice AS DOUBLE) AS x,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC) AS r
  FROM orders
), top AS (
  SELECT o_orderpriority, x, r,
         MAX(CASE WHEN r = 51 THEN x END)
           OVER (PARTITION BY o_orderpriority) AS xk1
  FROM ranked WHERE r <= 51
), agg AS (
  SELECT o_orderpriority, COUNT(*) AS n,
         CAST(SUM(CAST(ROUND((ln(x / xk1)) * 1000000) AS BIGINT)) AS DOUBLE)
           / 1000000 AS s,
         MIN(xk1) AS xk1
  FROM top WHERE r <= 50 GROUP BY o_orderpriority
)
SELECT o_orderpriority, CAST(50 AS INTEGER) AS k,
       ROUND(xk1, 6) AS x_k1,
       ROUND(CASE WHEN n = 50 AND xk1 IS NOT NULL AND s > 0
                  THEN 50.0 / s END, 6) AS alpha
FROM agg ORDER BY o_orderpriority
"""

ORACLES["q_lsh_recall"] = """
WITH g AS (
  SELECT doc_id, UNNEST(list_distinct(
           list_transform(range(1, len(l) - 1),
                          x -> l[x] || ' ' || l[x+1] || ' ' || l[x+2])
         )) AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
),
h AS (
  SELECT doc_id,
         ('0x' || substr(md5(gram), 1, 15))::BIGINT AS u1,
         ('0x' || substr(md5(gram), 17, 15))::BIGINT % 72057594037927936 AS u2
  FROM g
),
sig AS (
  SELECT doc_id, t.i, MIN((u1 + t.i * u2) % 1152921504606846976) AS v
  FROM h CROSS JOIN (SELECT UNNEST(range(0, 16)) AS i) t
  GROUP BY doc_id, t.i
),
bandk AS (
  SELECT doc_id, CAST(i // 4 AS BIGINT) AS band,
         string_agg(CAST(v AS VARCHAR), '_' ORDER BY i) AS key
  FROM sig GROUP BY 1, 2
),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bandk a
  JOIN bandk b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id),
inter AS (
  SELECT ga.doc_id AS id_a, gb.doc_id AS id_b, COUNT(*) AS ninter
  FROM g ga JOIN g gb ON ga.gram = gb.gram AND ga.doc_id < gb.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT i.id_a, i.id_b
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.id_a
  JOIN sizes sb ON sb.doc_id = i.id_b
  WHERE CAST(i.ninter AS DOUBLE) / (sa.n + sb.n - i.ninter) >= 0.5
),
cap AS (
  SELECT t.id_a, t.id_b FROM truth t
  JOIN cand c ON c.id_a = t.id_a AND c.id_b = t.id_b
)
SELECT (SELECT COUNT(*) FROM truth) AS n_true,
       (SELECT COUNT(*) FROM cap) AS n_captured,
       ROUND(CASE WHEN (SELECT COUNT(*) FROM truth) > 0
                  THEN CAST((SELECT COUNT(*) FROM cap) AS DOUBLE)
                       / (SELECT COUNT(*) FROM truth) END, 6) AS recall
"""

ORACLES["q_item_cooccurrence"] = """
WITH op AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
n_per AS (SELECT l_partkey, COUNT(*) AS n FROM op GROUP BY l_partkey),
co AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_ab
  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey <> b.l_partkey AND a.l_partkey <= 50
  GROUP BY 1, 2
),
scored AS (
  SELECT co.part_a, co.part_b, co.n_ab,
         ROUND(CAST(co.n_ab AS DOUBLE)
               / sqrt(CAST(na.n AS DOUBLE) * CAST(nb.n AS DOUBLE)), 6) AS cosine
  FROM co
  JOIN n_per na ON na.l_partkey = co.part_a
  JOIN n_per nb ON nb.l_partkey = co.part_b
)
SELECT part_a, part_b, CAST(n_ab AS BIGINT) AS n_ab, cosine,
       CAST(rank AS INTEGER) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY part_a
                               ORDER BY cosine DESC, part_b ASC) AS rank
  FROM scored
) WHERE rank <= 3
ORDER BY part_a, rank
"""

ORACLES["q_mmr_rerank"] = f"""
WITH qv AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id IN (0, 7, 42)
), s0 AS (
  SELECT qv.query_id, e.vec_id AS doc_id,
         ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), qv.qe)
               / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                        CAST(e.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(qv.qe, qv.qe))), 6) AS rel
  FROM embeddings e, qv WHERE e.vec_id <> qv.query_id
), cand AS (
  SELECT query_id, doc_id, rel FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY rel DESC, doc_id ASC) AS rn
    FROM s0) WHERE rn <= 10
), vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
pairs AS (
  SELECT c1.query_id, c1.doc_id AS a, c2.doc_id AS b,
         ROUND(list_dot_product(va.v, vb.v)
               / (sqrt(list_dot_product(va.v, va.v))
                  * sqrt(list_dot_product(vb.v, vb.v))), 6) AS s
  FROM cand c1
  JOIN cand c2 ON c1.query_id = c2.query_id AND c1.doc_id <> c2.doc_id
  JOIN vecs va ON va.vec_id = c1.doc_id
  JOIN vecs vb ON vb.vec_id = c2.doc_id
), sel1 AS (
  SELECT query_id, doc_id, 1 AS step, rel FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY rel DESC, doc_id ASC) AS rn
    FROM cand) WHERE rn = 1
), {', '.join(_mmr_step_sql(k) for k in range(2, 6))}
SELECT query_id, doc_id, CAST(step AS INTEGER) AS step, rel
FROM sel5 ORDER BY query_id, step
"""

ORACLES["q_quantile_sketch"] = """
WITH sample AS (
  SELECT o_orderpriority, o_totalprice FROM (
    SELECT o_orderpriority, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                              ORDER BY md5(CAST(o_orderkey AS VARCHAR)) ASC,
                                       o_orderkey ASC) AS rn
    FROM orders
  ) WHERE rn <= 64
)
SELECT o_orderpriority, COUNT(*) AS n_sample,
       ROUND(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5), 6) AS est_p50,
       ROUND(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.9), 6) AS est_p90
FROM sample GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

ORACLES["q_assortativity"] = """
WITH ub AS (
  SELECT DISTINCT user_id AS u, date_trunc('hour', ts) AS h, event_type AS t
  FROM events
), raw AS (
  SELECT a.u AS id_a, b.u AS id_b
  FROM ub a JOIN ub b ON a.h = b.h AND a.t = b.t AND a.u < b.u
  GROUP BY a.u, b.u HAVING COUNT(*) >= 2
), und AS (
  SELECT DISTINCT LEAST(id_a, id_b) AS a, GREATEST(id_a, id_b) AS b FROM raw
), directed AS (
  SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und
), deg AS (
  SELECT a AS node, COUNT(*) AS d FROM directed GROUP BY a
), m AS (
  SELECT COUNT(*) AS n_directed_edges,
         SUM(da.d) AS sx, SUM(db.d) AS sy,
         SUM(da.d * db.d) AS sxy,
         SUM(da.d * da.d) AS sxx,
         SUM(db.d * db.d) AS syy
  FROM directed e
  JOIN deg da ON da.node = e.a
  JOIN deg db ON db.node = e.b
)
SELECT CAST(n_directed_edges AS BIGINT) AS n_directed_edges,
       ROUND(CASE WHEN CAST(n_directed_edges AS DOUBLE) * sxx - sx * sx > 0
                   AND CAST(n_directed_edges AS DOUBLE) * syy - sy * sy > 0
                  THEN (CAST(n_directed_edges AS DOUBLE) * sxy - sx * sy)
                       / sqrt((CAST(n_directed_edges AS DOUBLE) * sxx - sx * sx)
                              * (CAST(n_directed_edges AS DOUBLE) * syy - sy * sy))
             END, 6) AS assortativity
FROM m
"""

ORACLES["q_modularity"] = """
WITH ub AS (
  SELECT DISTINCT user_id AS u, date_trunc('hour', ts) AS h, event_type AS t
  FROM events
), raw AS (
  SELECT a.u AS id_a, b.u AS id_b
  FROM ub a JOIN ub b ON a.h = b.h AND a.t = b.t AND a.u < b.u
  GROUP BY a.u, b.u HAVING COUNT(*) >= 2
), und AS (
  SELECT DISTINCT LEAST(id_a, id_b) AS a, GREATEST(id_a, id_b) AS b FROM raw
), comm AS (
  SELECT user_id AS node, event_type AS community FROM (
    SELECT user_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY COUNT(*) DESC, event_type ASC) AS rn
    FROM events GROUP BY user_id, event_type
  ) WHERE rn = 1
), stamped AS (
  SELECT e.a, e.b, ca.community AS cca, cb.community AS ccb
  FROM und e
  JOIN comm ca ON ca.node = e.a
  JOIN comm cb ON cb.node = e.b
), m AS (SELECT COUNT(*) AS m FROM stamped),
intra AS (
  SELECT cca AS community, COUNT(*) AS m_c FROM stamped
  WHERE cca = ccb GROUP BY cca
), directed AS (
  SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und
), dsum AS (
  SELECT c.community, COUNT(*) AS d_c
  FROM directed e JOIN comm c ON c.node = e.a GROUP BY c.community
)
SELECT d.community,
       CAST(COALESCE(i.m_c, 0) AS BIGINT) AS m_c,
       CAST(d.d_c AS BIGINT) AS d_c,
       ROUND(COALESCE(i.m_c, 0) / CAST(m.m AS DOUBLE)
             - (d.d_c / (2.0 * CAST(m.m AS DOUBLE)))
               * (d.d_c / (2.0 * CAST(m.m AS DOUBLE))), 6) AS q_contrib
FROM dsum d LEFT JOIN intra i USING (community) CROSS JOIN m
ORDER BY community
"""

ORACLES["q_did"] = """
WITH cells AS (
  SELECT value,
         (user_id % 2 = 0) AS t,
         (ts >= TIMESTAMP '2024-01-16 00:00:00') AS p
  FROM events
), agg AS (
  SELECT
    SUM(CASE WHEN t AND NOT p THEN 1 ELSE 0 END) AS n_treat_pre,
    SUM(CASE WHEN t AND p THEN 1 ELSE 0 END) AS n_treat_post,
    SUM(CASE WHEN NOT t AND NOT p THEN 1 ELSE 0 END) AS n_ctrl_pre,
    SUM(CASE WHEN NOT t AND p THEN 1 ELSE 0 END) AS n_ctrl_post,
    CAST(SUM(CASE WHEN t AND NOT p
                  THEN CAST(ROUND(value * 1000000) AS BIGINT) END) AS DOUBLE)
      / 1000000 AS s_t_pre,
    CAST(SUM(CASE WHEN t AND p
                  THEN CAST(ROUND(value * 1000000) AS BIGINT) END) AS DOUBLE)
      / 1000000 AS s_t_post,
    CAST(SUM(CASE WHEN NOT t AND NOT p
                  THEN CAST(ROUND(value * 1000000) AS BIGINT) END) AS DOUBLE)
      / 1000000 AS s_c_pre,
    CAST(SUM(CASE WHEN NOT t AND p
                  THEN CAST(ROUND(value * 1000000) AS BIGINT) END) AS DOUBLE)
      / 1000000 AS s_c_post
  FROM cells
)
SELECT CAST(n_treat_pre AS BIGINT) AS n_treat_pre,
       CAST(n_treat_post AS BIGINT) AS n_treat_post,
       CAST(n_ctrl_pre AS BIGINT) AS n_ctrl_pre,
       CAST(n_ctrl_post AS BIGINT) AS n_ctrl_post,
       ROUND(s_t_pre / n_treat_pre, 6) AS mean_treat_pre,
       ROUND(s_t_post / n_treat_post, 6) AS mean_treat_post,
       ROUND(s_c_pre / n_ctrl_pre, 6) AS mean_ctrl_pre,
       ROUND(s_c_post / n_ctrl_post, 6) AS mean_ctrl_post,
       ROUND((s_t_post / n_treat_post - s_t_pre / n_treat_pre)
             - (s_c_post / n_ctrl_post - s_c_pre / n_ctrl_pre), 6) AS did_estimate
FROM agg
"""

ORACLES["q_skipgram_pairs"] = f"""
WITH walks AS ({ORACLES["q_random_walk"]}),
p AS (
  SELECT node,
         LEAD(node, 1) OVER w AS n1,
         LEAD(node, 2) OVER w AS n2
  FROM walks
  WINDOW w AS (PARTITION BY walk_id ORDER BY step)
), pairs AS (
  SELECT node AS center, n1 AS context, 1 AS dist FROM p WHERE n1 IS NOT NULL
  UNION ALL
  SELECT n1 AS center, node AS context, 1 AS dist FROM p WHERE n1 IS NOT NULL
  UNION ALL
  SELECT node AS center, n2 AS context, 2 AS dist FROM p WHERE n2 IS NOT NULL
  UNION ALL
  SELECT n2 AS center, node AS context, 2 AS dist FROM p WHERE n2 IS NOT NULL
)
SELECT center, context, CAST(dist AS INTEGER) AS dist, COUNT(*) AS n_pairs
FROM pairs GROUP BY center, context, dist
ORDER BY center, context, dist
"""

ORACLES["q_bootstrap_ci"] = """
WITH b AS (SELECT UNNEST(range(0, 32)) AS b),
sampled AS (
  SELECT o.o_orderpriority, b.b, o.o_totalprice
  FROM orders o CROSS JOIN b
  WHERE ('0x' || substr(md5(concat(CAST(b.b AS VARCHAR), '|',
                                   CAST(o.o_orderkey AS VARCHAR))), 1, 15))::BIGINT
        / CAST(1152921504606846976 AS DOUBLE) < 0.5
),
means AS (
  SELECT o_orderpriority, b,
         (CAST(SUM(CAST(ROUND(o_totalprice * 1000000) AS BIGINT)) AS DOUBLE)
          / 1000000) / COUNT(o_totalprice) AS m
  FROM sampled GROUP BY o_orderpriority, b
)
SELECT o_orderpriority, COUNT(*) AS n_resamples,
       ROUND((CAST(SUM(CAST(ROUND(m * 1000000) AS BIGINT)) AS DOUBLE) / 1000000)
             / COUNT(m), 6) AS boot_mean,
       ROUND(quantile_cont(m, 0.025), 6) AS ci_lo,
       ROUND(quantile_cont(m, 0.975), 6) AS ci_hi
FROM means GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

ORACLES["q_rag_context_pack"] = f"""
WITH fused AS ({ORACLES["q_rrf_fusion"]}),
toks AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
  FROM documents
), packed AS (
  SELECT f.query_id, f.doc_id, f.rank, t.tokens,
         SUM(t.tokens) OVER (PARTITION BY f.query_id ORDER BY f.rank
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_tokens
  FROM fused f JOIN toks t USING (doc_id)
)
SELECT query_id, doc_id, CAST(rank AS INTEGER) AS rank,
       CAST(tokens AS BIGINT) AS tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM packed WHERE cum_tokens <= 256
ORDER BY query_id, rank
"""

ORACLES["q_interarrival"] = """
WITH gaps AS (
  SELECT event_type,
         CAST(epoch_us(ts) - LAG(epoch_us(ts))
                OVER (PARTITION BY user_id ORDER BY ts) AS DOUBLE) / 1000000 AS s
  FROM events
)
SELECT event_type, COUNT(*) AS n_gaps,
       ROUND(quantile_cont(s, 0.5), 6) AS p50_gap_s,
       ROUND(quantile_cont(s, 0.9), 6) AS p90_gap_s
FROM gaps WHERE s IS NOT NULL
GROUP BY event_type ORDER BY event_type
"""

ORACLES["q_lorenz_deciles"] = f"""
WITH per_cust AS (
  SELECT o_custkey, {_dsum('o_totalprice')} AS rev
  FROM orders GROUP BY o_custkey
), dec AS (
  SELECT o_custkey, rev,
         NTILE(10) OVER (ORDER BY rev ASC, o_custkey ASC) AS decile
  FROM per_cust
), per_dec AS (
  SELECT decile, COUNT(*) AS n_cust,
         {_dsum('rev')} AS revenue
  FROM dec GROUP BY decile
), tot AS (SELECT {_dsum('revenue')} AS t FROM per_dec)
SELECT CAST(decile AS INTEGER) AS decile, CAST(n_cust AS BIGINT) AS n_cust,
       ROUND(revenue, 6) AS revenue,
       ROUND((CAST(SUM(CAST(ROUND(revenue * 1000000) AS BIGINT))
                     OVER (ORDER BY decile
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS DOUBLE) / 1000000) / tot.t, 6) AS cum_share
FROM per_dec CROSS JOIN tot
ORDER BY decile
"""

ORACLES["q_k_anonymity"] = """
WITH classes AS (
  SELECT c_nationkey, c_mktsegment, COUNT(*) AS sz,
         COUNT(DISTINCT CAST(FLOOR(c_acctbal / 1000) AS BIGINT)) AS l
  FROM customer GROUP BY c_nationkey, c_mktsegment
), total AS (SELECT COUNT(*) AS n FROM customer)
SELECT COUNT(*) AS n_classes,
       CAST(MIN(sz) AS BIGINT) AS min_class_size,
       CAST(SUM(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_classes_below_k,
       CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
         AS n_rows_at_risk,
       ROUND(CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS DOUBLE)
             / MAX(total.n), 6) AS risk_frac,
       CAST(MIN(l) AS BIGINT) AS min_l_diversity
FROM classes CROSS JOIN total
"""

ORACLES["q_adamic_adar"] = """
WITH sc AS (
  SELECT DISTINCT l_suppkey AS s, o_custkey AS c
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), cdeg AS (
  SELECT c, COUNT(*) AS deg FROM sc GROUP BY c HAVING COUNT(*) >= 2
), hop2 AS (
  SELECT e1.s AS pa, e2.s AS pb, d.deg
  FROM sc e1
  JOIN cdeg d ON d.c = e1.c
  JOIN sc e2 ON e2.c = e1.c
  WHERE e1.s <= 100 AND e1.s <> e2.s
)
SELECT pa, pb, COUNT(*) AS n_common,
       ROUND(CAST(SUM(CAST(ROUND((1.0 / ln(CAST(deg AS DOUBLE))) * 1000000)
                           AS BIGINT)) AS DOUBLE) / 1000000, 6) AS aa
FROM hop2 GROUP BY pa, pb
ORDER BY aa DESC, pa ASC, pb ASC
LIMIT 20
"""

ORACLES["q_cuped"] = """
WITH per_user AS (
  SELECT user_id,
         (CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                        THEN CAST(ROUND(value * 1000000) AS BIGINT)
                        ELSE 0 END) AS DOUBLE) / 1000000) AS x,
         (CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
                        THEN CAST(ROUND(value * 1000000) AS BIGINT)
                        ELSE 0 END) AS DOUBLE) / 1000000) AS y
  FROM events GROUP BY user_id
), g AS (
  SELECT x, y, CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS t FROM per_user
), m AS (
  SELECT COUNT(*) AS n_users,
         (CAST(SUM(CAST(ROUND(x * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS sx,
         (CAST(SUM(CAST(ROUND(y * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS sy,
         (CAST(SUM(CAST(ROUND((x * y) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS sxy,
         (CAST(SUM(CAST(ROUND((x * x) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS sxx,
         (CAST(SUM(CAST(ROUND((y * y) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS syy,
         CAST(SUM(t) AS DOUBLE) AS nt,
         (CAST(SUM(CASE WHEN t = 1 THEN CAST(ROUND(x * 1000000) AS BIGINT)
                        ELSE 0 END) AS DOUBLE) / 1000000) AS sxt,
         (CAST(SUM(CASE WHEN t = 1 THEN CAST(ROUND(y * 1000000) AS BIGINT)
                        ELSE 0 END) AS DOUBLE) / 1000000) AS syt
  FROM g
)
SELECT CAST(n_users AS BIGINT) AS n_users,
       ROUND((CAST(n_users AS DOUBLE) * sxy - sx * sy)
             / (CAST(n_users AS DOUBLE) * sxx - sx * sx), 6) AS theta,
       ROUND(syt / nt - (sy - syt) / (CAST(n_users AS DOUBLE) - nt), 6)
         AS effect_raw,
       ROUND((syt / nt - ((CAST(n_users AS DOUBLE) * sxy - sx * sy)
                          / (CAST(n_users AS DOUBLE) * sxx - sx * sx)) * (sxt / nt))
             - ((sy - syt) / (CAST(n_users AS DOUBLE) - nt)
                - ((CAST(n_users AS DOUBLE) * sxy - sx * sy)
                   / (CAST(n_users AS DOUBLE) * sxx - sx * sx))
                  * ((sx - sxt) / (CAST(n_users AS DOUBLE) - nt))), 6)
         AS effect_cuped,
       ROUND((CAST(n_users AS DOUBLE) * sxy - sx * sy)
             * (CAST(n_users AS DOUBLE) * sxy - sx * sy)
             / ((CAST(n_users AS DOUBLE) * sxx - sx * sx)
                * (CAST(n_users AS DOUBLE) * syy - sy * sy)), 6) AS var_reduction
FROM m
"""

ORACLES["q_hash_collision_qa"] = """
WITH terms AS (
  SELECT DISTINCT term FROM (
    SELECT UNNEST(string_split(text, ' ')) AS term FROM documents
  ) WHERE term <> ''
), bucketed AS (
  SELECT ((instr('0123456789abcdef',
                 substring(md5(concat('f|', CAST(term AS STRING))), 1, 1)) - 1) * 16
          + (instr('0123456789abcdef',
                   substring(md5(concat('f|', CAST(term AS STRING))), 2, 1)) - 1))
           AS b
  FROM terms
), loads AS (
  SELECT b, COUNT(*) AS load FROM bucketed GROUP BY b
)
SELECT CAST(SUM(load) AS BIGINT) AS n_terms,
       COUNT(*) AS n_buckets_used,
       CAST(MAX(load) AS BIGINT) AS max_load,
       ROUND(CAST(SUM(load) AS DOUBLE) / COUNT(*), 6) AS avg_load,
       ROUND(CAST(MAX(load) AS DOUBLE)
             / (CAST(SUM(load) AS DOUBLE) / COUNT(*)), 6) AS skew_ratio
FROM loads
"""
