"""Oracle SQL, part 1/6 (file-order split from the single-file
oracles.py in round 3 — same entries, same insertion order)."""

from __future__ import annotations

from fortune_500_financial_insights_pipeline_spark.sql_surface import SHARED_SQL as _SHARED_SQL
from fortune_500_financial_insights_pipeline_spark.operators.sampling import _hex_threshold

from fortune_500_financial_insights_pipeline_spark.oracles._core import (  # noqa: F401
    ORACLES,
    _dsum,
    _pagerank_oracle,
)


ORACLES["q_groupby_agg"] = f"""
SELECT l_returnflag, l_linestatus,
       {_dsum('l_quantity')} AS sum_qty,
       {_dsum('l_extendedprice')} AS sum_base_price,
       {_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {_dsum('l_quantity')} / COUNT(*) AS avg_qty,
       {_dsum('l_extendedprice')} / COUNT(*) AS avg_price,
       {_dsum('l_discount')} / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

ORACLES["q_count_distinct"] = """
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS n_cust,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
"""

ORACLES["q_rollup"] = """
SELECT r_name, n_name, COUNT(*) AS n_cust
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""

ORACLES["q_csv_scan"] = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
       strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS ship_date
FROM lineitem
WHERE l_quantity > 45
"""

ORACLES["q_project_cast"] = """
SELECT o_orderkey,
       CAST(CAST(o_totalprice AS DECIMAL(20,2)) AS DOUBLE) AS price_dec,
       CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
       UPPER(o_orderstatus) AS status_up
FROM orders
"""

ORACLES["q_filter_notnull"] = """
SELECT o_orderkey, strftime(parsed_date, '%Y-%m-%d') AS parsed_date
FROM (
  SELECT o_orderkey,
         TRY_CAST(CASE WHEN o_orderkey % 10 = 0 THEN 'not-a-date'
                       ELSE strftime(o_orderdate, '%Y-%m-%d') END AS DATE) AS parsed_date
  FROM orders
)
WHERE parsed_date IS NOT NULL
"""

ORACLES["q_regex_clean"] = """
SELECT o_orderkey,
       format('{:,}', o_orderkey) AS grouped_str,
       CAST(regexp_replace(format('{:,}', o_orderkey), ',', '', 'g') AS BIGINT) AS cleaned
FROM orders
"""

ORACLES["q_date_extract"] = """
SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year,
       CAST(month(l_shipdate) AS INTEGER) AS ship_month,
       CAST(quarter(l_shipdate) AS INTEGER) AS ship_quarter,
       date_trunc('month', l_shipdate) AS ship_month_start,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY 1, 2, 3, 4
"""

ORACLES["q_string_funcs"] = """
SELECT p_partkey,
       UPPER(p_name) AS name_up,
       LOWER(p_brand) AS brand_lo,
       SUBSTRING(p_name, 1, 3) AS name_pfx,
       LPAD(CAST(p_partkey AS VARCHAR), 8, '0') AS key_pad,
       CONCAT_WS('-', p_brand, p_type) AS brand_type,
       regexp_extract('catalog/' || p_brand || '/' || CAST(p_partkey AS VARCHAR),
                      '([^/]+)$', 1) AS path_base
FROM part
"""

ORACLES["q_isin_filter"] = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
"""

ORACLES["q_math_round"] = """
SELECT o_orderkey,
       ABS(o_orderkey % 7 - 3) AS abs_mod,
       CAST(POW(o_orderkey % 5, 2) AS BIGINT) AS pow_sq,
       ROUND(SQRT(CAST(o_orderkey AS DOUBLE)), 6) AS sqrt_r6,
       ROUND(LN(CAST(o_orderkey AS DOUBLE) + 1.0), 6) AS ln_r6
FROM orders
"""

ORACLES["q_json_parse"] = f"""
SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
       COUNT(*) AS n_events,
       {_dsum('value')} AS sum_value
FROM events
GROUP BY 1
"""

ORACLES["q_json_nested"] = """
WITH built AS (
  SELECT event_id,
         '{"outer": {"inner": ' || COALESCE(json_extract_string(props, '$.k'), 'null')
           || ', "tag": "' || event_type || '"}}' AS nested
  FROM events
)
SELECT event_id,
       COALESCE(CAST(json_extract_string(nested, '$.outer.inner') AS INTEGER), -1) AS inner_val,
       json_extract_string(nested, '$.outer.tag') AS tag,
       COALESCE(json_extract_string(nested, '$.outer.missing'), '') AS missing_dflt
FROM built
"""

ORACLES["q_skip_rows"] = """
SELECT event_id, ts, event_type
FROM (SELECT event_id, ts, event_type,
             row_number() OVER (ORDER BY event_id) AS rn
      FROM events)
WHERE rn > 4
"""

ORACLES["q_join_inner"] = f"""
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       {_dsum('o_totalprice')} AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""

ORACLES["q_join_broadcast"] = f"""
SELECT p_brand,
       COUNT(*) AS n_items,
       {_dsum('l_quantity')} AS sum_qty
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size > 40
GROUP BY p_brand
"""

ORACLES["q_join_left"] = f"""
SELECT c_custkey, c_name,
       COUNT(o_orderkey) AS n_orders,
       {_dsum('o_totalprice')} AS spend
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
"""

ORACLES["q_join_semi"] = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""

ORACLES["q_join_anti"] = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= DATE '1995-01-01'
                  AND o_orderdate < DATE '1996-01-01')
"""

ORACLES["q_union"] = """
SELECT o_orderkey, 'high_value' AS src FROM orders WHERE o_totalprice > 400000
UNION ALL
SELECT o_orderkey, 'urgent' AS src FROM orders WHERE o_orderpriority = '1-URGENT'
"""

ORACLES["q_intersect"] = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
"""

ORACLES["q_except"] = """
SELECT c_custkey FROM customer
EXCEPT
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
"""

ORACLES["q_window_rank"] = """
SELECT o_custkey, o_orderkey, o_totalprice, rn, rk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(row_number() OVER w AS INTEGER) AS rn,
         CAST(rank() OVER w AS INTEGER) AS rk
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
)
WHERE rn <= 3
"""

ORACLES["q_window_lag"] = """
SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
       lag(l_quantity, 1) OVER w AS prev_qty,
       l_quantity - lag(l_quantity, 1) OVER w AS qty_delta
FROM lineitem
WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
"""

ORACLES["q_window_moving_avg"] = """
SELECT o_custkey, o_orderkey,
       (CAST(SUM(CAST(ROUND(o_totalprice * 1000000) AS BIGINT))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) / 1000000)
       / COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS mov_avg7
FROM orders
"""

ORACLES["q_window_cumsum"] = """
SELECT l_suppkey, l_orderkey, l_linenumber,
       (CAST(SUM(CAST(ROUND(l_quantity * 1000000) AS BIGINT))
             OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 1000000) AS cum_qty
FROM lineitem
"""

ORACLES["q_topk"] = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10
"""

ORACLES["q_dedup_keep_latest"] = """
SELECT event_id, user_id, event_type, ts, value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
"""

ORACLES["q_pivot"] = f"""
SELECT l_returnflag,
       {_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS qty_O,
       {_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS qty_F
FROM lineitem
GROUP BY l_returnflag
"""

ORACLES["q_unpivot"] = """
SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS metric_value FROM customer
UNION ALL
SELECT c_custkey, 'nationkey_d' AS metric, CAST(c_nationkey AS DOUBLE) AS metric_value FROM customer
"""

ORACLES["q_asof_lastval"] = """
WITH u AS (
  SELECT user_id, ts, event_id, 0 AS is_right,
         event_id AS p_event_id, value AS p_value, NULL::DOUBLE AS c_value
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, ts, event_id, 1 AS is_right,
         NULL AS p_event_id, NULL AS p_value, value AS c_value
  FROM events WHERE event_type = 'click'
),
carried AS (
  SELECT *, last_value(c_value IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts ASC, is_right DESC, event_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_value_asof
  FROM u
)
SELECT p_event_id AS event_id, user_id, ts, p_value AS value, click_value_asof
FROM carried WHERE is_right = 0
"""

ORACLES["q_events_tumbling"] = f"""
SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart, event_type,
       COUNT(*) AS n_events,
       {_dsum('value')} AS sum_value
FROM events
GROUP BY 1, 2
"""

ORACLES["q_events_sliding"] = f"""
WITH cand AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS wstart, event_type, value FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' AS wstart,
         event_type, value
  FROM events
)
SELECT wstart, event_type, COUNT(*) AS n_events, {_dsum('value')} AS sum_value
FROM cand
GROUP BY 1, 2
"""

ORACLES["q_events_session"] = f"""
WITH gaps AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL '6 hours'
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM gaps
)
SELECT MIN(ts) AS session_start,
       MAX(ts) + INTERVAL '6 hours' AS session_end,
       user_id,
       COUNT(*) AS n_events,
       {_dsum('value')} AS sum_value
FROM sessions
GROUP BY user_id, sid
"""

ORACLES["q_pandas_udf_zscore"] = """
SELECT event_id, event_type, value,
       ROUND((value - AVG(value) OVER (PARTITION BY event_type))
             / stddev_pop(value) OVER (PARTITION BY event_type), 6) AS zscore
FROM events
"""

ORACLES["q_percentile"] = """
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 6) AS p50,
       ROUND(quantile_cont(value, 0.9), 6) AS p90
FROM events
GROUP BY event_type
"""

ORACLES["q_array_explode"] = """
SELECT label, COUNT(*) AS n_vals,
       MIN(CAST(component AS DOUBLE)) AS min_val,
       MAX(CAST(component AS DOUBLE)) AS max_val
FROM (SELECT label, unnest(embedding) AS component FROM embeddings)
GROUP BY label
"""

ORACLES["q_cosine_topk"] = """
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
s AS (
  SELECT vec_id, label,
         ROUND(list_dot_product(CAST(embedding AS DOUBLE[]), qe)
               / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                        CAST(embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(qe, qe))), 6) AS sim
  FROM embeddings, q
)
SELECT vec_id, label, sim FROM s ORDER BY sim DESC, vec_id ASC LIMIT 20
"""

ORACLES["q_semdedup"] = """
WITH seeds AS (
  SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell,
         CAST(embedding AS DOUBLE[]) AS cvec
  FROM (SELECT vec_id, embedding FROM embeddings
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16)
), sims AS (
  SELECT e.vec_id, e.label, CAST(e.embedding AS DOUBLE[]) AS vec, s.cell,
         ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), s.cvec)
               / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                        CAST(e.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(s.cvec, s.cvec))), 6) AS csim
  FROM embeddings e CROSS JOIN seeds s
), cells AS (
  SELECT vec_id, label, vec, cell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY csim DESC, cell ASC) AS rn
    FROM sims) WHERE rn = 1
), dropped AS (
  SELECT DISTINCT b.vec_id
  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE ROUND(list_dot_product(a.vec, b.vec)
              / (sqrt(list_dot_product(a.vec, a.vec))
                 * sqrt(list_dot_product(b.vec, b.vec))), 6) >= 0.4
)
SELECT c.vec_id, c.label, CAST(c.cell AS BIGINT) AS cell
FROM cells c LEFT JOIN dropped d ON c.vec_id = d.vec_id
WHERE d.vec_id IS NULL
"""

ORACLES["q_knn_join_ivf"] = """
WITH seeds AS (
  SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell,
         CAST(embedding AS DOUBLE[]) AS cvec
  FROM (SELECT vec_id, embedding FROM embeddings
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 4)
), sims AS (
  SELECT e.vec_id, e.label, CAST(e.embedding AS DOUBLE[]) AS vec, s.cell,
         ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), s.cvec)
               / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                        CAST(e.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(s.cvec, s.cvec))), 6) AS csim
  FROM embeddings e CROSS JOIN seeds s
), corpus_cells AS (
  SELECT vec_id, label, vec, cell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY csim DESC, cell ASC) AS rn
    FROM sims) WHERE rn = 1
), query_probes AS (
  SELECT vec_id AS q_id, vec AS qvec, cell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY csim DESC, cell ASC) AS rn
    FROM sims WHERE vec_id < 10) WHERE rn <= 2
), cand AS (
  SELECT p.q_id, c.vec_id, c.label,
         ROUND(list_dot_product(c.vec, p.qvec)
               / (sqrt(list_dot_product(c.vec, c.vec))
                  * sqrt(list_dot_product(p.qvec, p.qvec))), 6) AS sim
  FROM query_probes p JOIN corpus_cells c USING (cell)
  WHERE c.vec_id <> p.q_id
)
SELECT q_id, vec_id, label, sim FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                               ORDER BY sim DESC, vec_id ASC) AS rn
  FROM cand) WHERE rn <= 3
"""

ORACLES["q_knn_join"] = """
WITH q AS (
  SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < 10
), s AS (
  SELECT q.q_id, e.vec_id, e.label,
         ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe)
               / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                        CAST(e.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(q.qe, q.qe))), 6) AS sim
  FROM embeddings e, q
  WHERE e.vec_id <> q.q_id
), r AS (
  SELECT q_id, vec_id, label, sim,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rn
  FROM s
)
SELECT q_id, vec_id, label, sim FROM r WHERE rn <= 5
"""

ORACLES["q_text_stats"] = """
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
FROM documents
GROUP BY lang
"""

ORACLES["q_token_count"] = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct_tokens,
       CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS INTEGER)
         AS n_bpe_tokens
FROM documents
"""

ORACLES["q_lang_id"] = """
WITH scored AS (
  SELECT doc_id, lang,
         CAST(len(list_filter(string_split(text, ' '),
                    t -> list_contains(['the','a','of','and','to','in','is','on','for','with'], t)))
              AS DOUBLE)
         / CAST(len(string_split(text, ' ')) AS DOUBLE) AS score
  FROM documents
)
SELECT doc_id, lang, ROUND(score, 6) AS en_ratio,
       CASE WHEN score >= 0.05 THEN 'en' ELSE 'other' END AS pred_lang
FROM scored
"""

ORACLES["q_quality_score"] = """
WITH feats AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_toks,
         CAST(len(list_filter(string_split(text, ' '),
                    t -> list_contains(['the','a','of','and','to','in','is','on','for','with'], t)))
              AS DOUBLE) AS n_stop
  FROM documents
)
SELECT doc_id,
       ROUND(
         LEAST(n_chars / 200.0, 1.0) * 0.4
         + (CASE WHEN n_chars / n_toks >= 3.0 AND n_chars / n_toks <= 10.0
                 THEN 1.0 ELSE 0.5 END) * 0.3
         + LEAST((n_stop / n_toks) * 5.0, 1.0) * 0.3, 6) AS quality
FROM feats
"""

ORACLES["q_fingerprint"] = """
SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
FROM documents
"""

ORACLES["q_dedup_exact"] = """
SELECT doc_id, fingerprint
FROM (
  SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint,
         row_number() OVER (PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                            ORDER BY doc_id ASC) AS rn
  FROM documents
)
WHERE rn = 1
"""

ORACLES["q_dup_spans"] = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
spans AS (
  SELECT doc_id, i - 1 AS pos,
         md5(l[i]||' '||l[i+1]||' '||l[i+2]||' '||l[i+3]||' '||l[i+4]
             ||' '||l[i+5]||' '||l[i+6]||' '||l[i+7]) AS span_hash
  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l) - 7)) AS i
        FROM toks WHERE len(l) >= 8)
),
dups AS (
  SELECT span_hash FROM spans GROUP BY span_hash
  HAVING COUNT(DISTINCT doc_id) >= 2
)
SELECT s.doc_id, CAST(s.pos AS INTEGER) AS pos, s.span_hash
FROM spans s JOIN dups USING (span_hash)
"""

ORACLES["q_ngram_jaccard"] = """
WITH grams AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, len(string_split(text, ' ')) - 1),
           i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
         )) AS g
  FROM documents
),
ref AS (SELECT g AS ref_g FROM grams WHERE doc_id = 0)
SELECT doc_id,
       ROUND(CAST(len(list_intersect(g, ref_g)) AS DOUBLE)
             / CAST(len(list_distinct(list_concat(g, ref_g))) AS DOUBLE), 6) AS jac
FROM grams, ref
WHERE doc_id <> 0
ORDER BY jac DESC, doc_id ASC
LIMIT 20
"""

ORACLES["q_binary_meta"] = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       lower(sha256(text)) AS sha
FROM documents
"""

ORACLES["q_jaccard_clusters"] = """
WITH RECURSIVE g AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(l)),
                                      x -> l[x] || ' ' || l[x+1])) AS grams
  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
), ex AS (
  SELECT doc_id, UNNEST(grams) AS gram FROM g
), sizes AS (
  SELECT doc_id, len(grams) AS n FROM g
), inter AS (
  -- |A ∩ B| via equi-join on the exploded distinct grams: identical to
  -- len(list_intersect(a.grams, b.grams)) but O(shared grams), not O(n^2)
  -- all-pairs list arithmetic; |A ∪ B| = |A| + |B| - |A ∩ B|.
  SELECT a.doc_id AS u, b.doc_id AS v, COUNT(*) AS c
  FROM ex a JOIN ex b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), pairs AS (
  SELECT i.u, i.v
  FROM inter i
  JOIN sizes su ON i.u = su.doc_id
  JOIN sizes sv ON i.v = sv.doc_id
  WHERE CAST(i.c AS DOUBLE) / (su.n + sv.n - i.c) >= 0.8
), edges AS (
  SELECT u, v FROM pairs UNION SELECT v, u FROM pairs
), reach AS (
  SELECT u AS src, v AS dst FROM edges
  UNION
  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
), comp AS (
  SELECT src AS id, LEAST(src, MIN(dst)) AS comp FROM reach GROUP BY src
)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT id FROM comp)
   OR doc_id IN (SELECT id FROM comp WHERE id = comp)
"""

ORACLES["q_tfidf"] = """
WITH tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents)
  WHERE term <> ''
  GROUP BY doc_id, term
), dfreq AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT doc_id, term, tf, tfidf
FROM (
  SELECT tf.doc_id, tf.term, tf.tf,
         ROUND(tf.tf * LN((1.0 + n.n_docs) / (1.0 + dfreq.df)), 6) AS tfidf,
         ROW_NUMBER() OVER (
           PARTITION BY tf.doc_id
           ORDER BY ROUND(tf.tf * LN((1.0 + n.n_docs) / (1.0 + dfreq.df)), 6) DESC,
                    tf.term ASC
         ) AS rn
  FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n
)
WHERE rn <= 3
"""

ORACLES["q_mix_sources"] = """
WITH t AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), tot AS (
  SELECT CAST(FLOOR(SUM(n_tokens) * 0.4) AS BIGINT) AS total_budget FROM t
), w AS (
  SELECT source,
         CAST(1 + (ROW_NUMBER() OVER (ORDER BY source) - 1) % 3 AS BIGINT) AS weight
  FROM (SELECT DISTINCT source FROM t)
), sw AS (SELECT CAST(SUM(weight) AS BIGINT) AS sum_w FROM w),
b AS (
  SELECT w.source,
         CAST((w.weight * tot.total_budget) // sw.sum_w AS BIGINT) AS budget
  FROM w CROSS JOIN tot CROSS JOIN sw
), c AS (
  SELECT t.*, SUM(n_tokens) OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM t
)
SELECT c.source, COUNT(*) AS kept_docs,
       CAST(SUM(c.n_tokens) AS BIGINT) AS kept_tokens,
       MAX(b.budget) AS budget
FROM c JOIN b ON c.source = b.source
WHERE c.cum_tokens <= b.budget
GROUP BY c.source
"""

ORACLES["q_classifier_score"] = """
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
)
SELECT doc_id,
       ROUND(1.0 / (1.0 + EXP(-(0.0 + sw / (1000.0 * nt)))), 6) AS prob
FROM s
"""

ORACLES["q_upsample_sources"] = """
WITH w AS (
  SELECT source, (ROW_NUMBER() OVER (ORDER BY source) - 1) % 3 AS pos
  FROM (SELECT DISTINCT source FROM documents)
), f AS (
  SELECT source,
         CASE pos WHEN 2 THEN 2 ELSE 1 END AS full_epochs,
         CASE pos WHEN 0 THEN '00000000000000000000000000000000'
                  ELSE '80000000000000000000000000000000' END AS th
  FROM w
), n AS (
  SELECT d.doc_id, d.source,
         f.full_epochs
         + CASE WHEN md5(CAST(d.doc_id AS VARCHAR)) < f.th THEN 1 ELSE 0 END
           AS n_copies
  FROM documents d JOIN f ON d.source = f.source
), e AS (
  SELECT doc_id, source, UNNEST(range(0, n_copies)) AS epoch
  FROM n WHERE n_copies >= 1
)
SELECT source, COUNT(*) AS emitted_rows,
       COUNT(DISTINCT doc_id) AS n_docs,
       CAST(MAX(epoch) AS BIGINT) AS max_epoch
FROM e GROUP BY source
"""

ORACLES["q_bm25"] = """
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
)
SELECT doc_id, term, tf, score
FROM (
  SELECT tf.doc_id, tf.term, tf.tf,
         ROUND(LN(1.0 + (s.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
               * tf.tf * (1.2 + 1.0)
               / (tf.tf + 1.2 * (1.0 - 0.75
                                 + 0.75 * dl.dl / (s.total_tf * 1.0 / s.n_docs))),
               6) AS score,
         ROW_NUMBER() OVER (
           PARTITION BY tf.doc_id
           ORDER BY ROUND(LN(1.0 + (s.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
                          * tf.tf * (1.2 + 1.0)
                          / (tf.tf + 1.2 * (1.0 - 0.75
                                            + 0.75 * dl.dl / (s.total_tf * 1.0 / s.n_docs))),
                          6) DESC,
                    tf.term ASC
         ) AS rn
  FROM tf
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN dfreq ON tf.term = dfreq.term
  CROSS JOIN stats s
)
WHERE rn <= 3
"""

ORACLES["q_chunk_docs"] = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
), st AS (
  SELECT doc_id, l, UNNEST(range(0, len(l), 24)) AS start FROM toks
)
SELECT doc_id,
       CAST(start // 24 AS BIGINT) AS chunk_index,
       CAST(start AS BIGINT) AS chunk_start,
       CAST(len(list_slice(l, start + 1, start + 32)) AS BIGINT) AS n_tokens,
       array_to_string(list_slice(l, start + 1, start + 32), ' ') AS chunk_text
FROM st
"""

ORACLES["q_decontaminate"] = """
WITH g AS (
  SELECT doc_id, UNNEST(list_distinct(
           list_transform(range(1, len(l)), x -> l[x] || ' ' || l[x+1])
         )) AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
), bench AS (
  SELECT DISTINCT gram FROM g WHERE doc_id < 5
)
SELECT g.doc_id, COUNT(DISTINCT g.gram) AS shared_grams
FROM g JOIN bench ON g.gram = bench.gram
WHERE g.doc_id >= 5
GROUP BY g.doc_id
HAVING COUNT(DISTINCT g.gram) >= 3
"""

ORACLES["q_finance_insights"] = """
WITH series AS (
  SELECT l_suppkey,
         strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS day,
         (CAST(SUM(CAST(ROUND(l_extendedprice * 1000000) AS BIGINT)) AS DOUBLE)
          / 1000000) / COUNT(*) AS close,
         CAST(SUM(CAST(ROUND(l_quantity * 1000000) AS BIGINT)) AS DOUBLE)
          / 1000000 AS volume
  FROM lineitem
  GROUP BY l_suppkey, day
), staged AS (
  SELECT l_suppkey, day, close, volume,
         close / LAG(close) OVER w - 1 AS daily_return,
         (CAST(SUM(CAST(ROUND(close * 1000000) AS BIGINT))
               OVER wma AS DOUBLE) / 1000000)
           / COUNT(close) OVER wma AS sma_5,
         CAST(SUM(CAST(ROUND(close * volume * 1000000) AS BIGINT))
              OVER wma AS DOUBLE)
           / CAST(SUM(CAST(ROUND(volume * 1000000) AS BIGINT))
                  OVER wma AS DOUBLE) AS vwap_5,
         close / FIRST_VALUE(close) OVER wrun - 1 AS cum_return,
         close / MAX(close) OVER wrun - 1 AS drawdown
  FROM series
  WINDOW w AS (PARTITION BY l_suppkey ORDER BY day),
         wma AS (PARTITION BY l_suppkey ORDER BY day
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
         wrun AS (PARTITION BY l_suppkey ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT l_suppkey, day, close, volume, daily_return, sma_5, vwap_5,
       cum_return, drawdown,
       MIN(drawdown) OVER (PARTITION BY l_suppkey ORDER BY day
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS max_drawdown
FROM staged
"""

ORACLES["q_scd2"] = """
WITH ordered AS (
  SELECT user_id, ts, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS prev
  FROM events
), changed AS (
  SELECT user_id, ts, event_type FROM ordered
  WHERE prev IS NULL OR event_type <> prev
)
SELECT user_id, event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
       strftime(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts),
                '%Y-%m-%d %H:%M:%S') AS valid_to
FROM changed
"""

ORACLES["q_sql_pivot"] = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'F'
                     THEN CAST(ROUND(l_quantity * 1000000) AS BIGINT) END)
            AS DOUBLE) / 1000000 AS qty_f,
       CAST(SUM(CASE WHEN l_linestatus = 'O'
                     THEN CAST(ROUND(l_quantity * 1000000) AS BIGINT) END)
            AS DOUBLE) / 1000000 AS qty_o
FROM lineitem
GROUP BY l_returnflag
"""

# the UDTF chunker is value-interchangeable with the native operator —
# one oracle serves both (functions/udtfs.py docstring)
ORACLES["q_udtf_chunk"] = ORACLES["q_chunk_docs"]

ORACLES.update(_SHARED_SQL)

ORACLES["q_window_ntile"] = """
SELECT c_custkey, c_mktsegment,
       CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
"""

ORACLES["q_range_join"] = f"""
SELECT band,
       COUNT(*) AS n_parts,
       {_dsum('p_retailprice')} / COUNT(*) AS avg_price
FROM part
JOIN (VALUES ('low', 0.0, 930.0),
             ('mid', 930.0, 970.0),
             ('high', 970.0, 1000000000.0)) AS bands(band, lo, hi)
  ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band
"""

ORACLES["q_first_last"] = """
SELECT p_brand,
       MAX(CASE WHEN rn_asc = 1 THEN p_partkey END) AS cheapest_part,
       MAX(CASE WHEN rn_desc = 1 THEN p_partkey END) AS priciest_part,
       MIN(p_retailprice) AS min_price,
       MAX(p_retailprice) AS max_price
FROM (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice, p_partkey) AS rn_asc,
         ROW_NUMBER() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey DESC) AS rn_desc
  FROM part
)
GROUP BY p_brand
"""

ORACLES["q_date_spine"] = """
SELECT strftime(m, '%Y-%m-%d') AS month,
       COALESCE(n, 0) AS n_orders
FROM (
  SELECT unnest(generate_series(DATE '1994-01-01', DATE '1994-12-01',
                                INTERVAL 1 MONTH))::DATE AS m
) spine
LEFT JOIN (
  SELECT date_trunc('month', o_orderdate)::DATE AS m, COUNT(*) AS n
  FROM orders GROUP BY 1
) agg USING (m)
"""

ORACLES["q_string_agg"] = """
SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""

ORACLES["q_union_drift"] = """
SELECT o_orderkey, o_totalprice, 'A' AS src
FROM orders WHERE o_orderkey % 3 = 0
UNION ALL BY NAME
SELECT o_orderkey, o_orderpriority, 'B' AS src
FROM orders WHERE o_orderkey % 3 = 1
"""

ORACLES["q_window_range"] = """
SELECT o_orderkey, o_custkey,
       COUNT(*) OVER w AS n_last30d,
       (CAST(SUM(CAST(ROUND(o_totalprice * 1000000) AS BIGINT)) OVER w AS DOUBLE)
        / 1000000) AS spend_last30d
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
             RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
"""

ORACLES["q_stats_corr"] = """
SELECT l_returnflag,
       ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       ROUND(covar_samp(l_quantity, l_discount), 6) AS covar_qty_disc,
       ROUND(stddev_samp(l_extendedprice), 4) AS std_price
FROM lineitem
GROUP BY l_returnflag
"""

ORACLES["q_array_pos"] = """
SELECT vec_id,
       CAST(i - 1 AS INTEGER) AS pos,
       CAST(embedding[i] AS DOUBLE) AS component
FROM (
  SELECT vec_id, embedding,
         unnest(generate_series(1, len(embedding))) AS i
  FROM embeddings
  WHERE vec_id < 50
)
"""

ORACLES["q_conditional"] = """
SELECT o_orderkey,
       CASE WHEN o_totalprice > 300000 THEN 'big'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'small' END AS size_band,
       COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_x,
       GREATEST(o_orderkey % 7, o_orderkey % 5) AS g75,
       LEAST(o_orderkey % 7, o_orderkey % 5) AS l75
FROM orders
"""

ORACLES["q_date_arith"] = """
SELECT o_orderkey,
       strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30d,
       strftime(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH, '%Y-%m-%d') AS plus2m,
       CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS INTEGER) AS days_to_99,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS INTEGER) AS dow
FROM orders
"""

ORACLES["q_pandas_scalar_udf"] = """
SELECT c_custkey,
       regexp_replace(lower(trim(c_name)), '\\s+', ' ', 'g') AS name_norm
FROM customer
"""

ORACLES["q_pandas_grouped_agg_udf"] = """
SELECT c_mktsegment,
       ROUND(SUM(o_totalprice * (o_orderkey % 5 + 1)) / SUM(o_orderkey % 5 + 1), 6)
         AS wmean_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""

ORACLES["q_higher_order"] = """
SELECT vec_id,
       ROUND(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * x), 'sum'), 6) AS sq_l2,
       CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
       ROUND(list_aggregate(list_transform(embedding,
                x -> least(greatest(CAST(x AS DOUBLE), -0.5), 0.5)), 'sum')
             / len(embedding), 6) AS clipped_mean
FROM embeddings
"""

ORACLES["q_string_advanced"] = """
SELECT p_partkey,
       replace(p_brand, '#', '-') AS brand_tr,
       -- initcap over lowered words
       list_aggregate(list_transform(string_split(lower(p_name), ' '),
         w -> upper(w[1]) || w[2:]), 'string_agg', ' ') AS name_title,
       reverse(p_brand) AS brand_rev,
       repeat(substring(p_brand, 1, 2), 2) AS b2x2,
       CAST(levenshtein(p_brand, 'Brand#11') AS INTEGER) AS lev_b11,
       CAST(strpos(p_type, 'BRASS') AS INTEGER) AS brass_at
FROM part
"""

ORACLES["q_null_semantics"] = """
WITH t AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_custkey END AS v,
         CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_custkey END AS w
  FROM orders
)
SELECT o_orderkey,
       CAST(v IS NOT DISTINCT FROM w AS INTEGER) AS nullsafe_eq,
       CASE WHEN (v = w) IS NULL THEN -1 ELSE CAST(v = w AS INTEGER) END AS plain_eq,
       CASE WHEN v IS NOT NULL THEN 'present' ELSE 'absent' END AS presence,
       COALESCE(v, w, -1) AS first_known
FROM t
"""

ORACLES["q_bitwise"] = """
SELECT o_orderkey,
       o_orderkey & 255 AS and255,
       o_orderkey | 8 AS or8,
       xor(o_orderkey, 170) AS xor170,
       o_orderkey << 2 AS shl2,
       o_orderkey >> 3 AS shr3,
       CAST(bit_count(o_orderkey) AS INTEGER) AS popcount
FROM orders
"""

ORACLES["q_gaps_islands"] = """
WITH marked AS (
  SELECT user_id, event_id,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w IS NULL
                OR epoch(ts) - lag(epoch(ts)) OVER w > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_id,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
  FROM marked
)
SELECT user_id, sess_id,
       COUNT(*) AS n_events,
       MIN(event_id) AS first_event,
       MAX(event_id) AS last_event
FROM sess
GROUP BY user_id, sess_id
"""

ORACLES["q_funnel"] = """
WITH first_click AS (
  SELECT user_id, MIN(ts) AS first_click_ts
  FROM events WHERE event_type = 'click' GROUP BY user_id
),
conv AS (
  SELECT f.user_id, f.first_click_ts, MIN(p.ts) AS first_purchase_ts
  FROM first_click f
  LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
    ON p.user_id = f.user_id AND p.ts >= f.first_click_ts
  GROUP BY f.user_id, f.first_click_ts
)
SELECT user_id,
       strftime(first_click_ts, '%Y-%m-%d %H:%M:%S') AS first_click,
       strftime(first_purchase_ts, '%Y-%m-%d %H:%M:%S') AS first_purchase,
       -- truncate EACH side to whole seconds (Spark's timestamp->long cast)
       -- before differencing, not the difference itself
       CASE WHEN first_purchase_ts IS NOT NULL
            THEN CAST(FLOOR(epoch(first_purchase_ts)) - FLOOR(epoch(first_click_ts)) AS BIGINT)
       END AS latency_s
FROM conv
"""

ORACLES["q_histogram"] = """
SELECT CAST(FLOOR(o_totalprice / 50000) AS INTEGER) AS bucket,
       COUNT(*) AS n,
       MIN(o_totalprice) AS lo,
       MAX(o_totalprice) AS hi
FROM orders
GROUP BY 1
"""

ORACLES["q_window_lead_nth"] = """
SELECT o_custkey, o_orderkey,
       lead(o_orderkey, 1) OVER w AS next_order,
       first_value(o_orderkey) OVER wf AS first_order,
       last_value(o_orderkey) OVER wf AS last_order,
       nth_value(o_orderkey, 2) OVER wf AS second_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""

ORACLES["q_regex_extract_all"] = """
SELECT p_partkey,
       list_aggregate(regexp_extract_all(p_name || ' ' || p_brand || ' ' || p_type,
                                         '\\d+'), 'string_agg', ',') AS numbers,
       CAST(len(regexp_extract_all(p_name || ' ' || p_brand || ' ' || p_type,
                                   '[A-Z]{2,}')) AS INTEGER) AS n_upper_words
FROM part
"""

ORACLES["q_map_ops"] = """
SELECT r_regionkey,
       r_name AS region_name,
       CAST(n_nations AS INTEGER) AS n_nations,
       'name,nations' AS keys
FROM region
JOIN (SELECT n_regionkey, COUNT(*) AS n_nations FROM nation GROUP BY 1) c
  ON r_regionkey = c.n_regionkey
"""

ORACLES["q_pack_offsets"] = """
WITH counted AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(doc_id % 8 AS BIGINT) AS bucket
  FROM documents
), cum AS (
  SELECT doc_id, bucket, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id)
              - n_tokens AS BIGINT) AS start_offset
  FROM counted
)
SELECT doc_id, bucket,
       CAST(start_offset // 256 AS BIGINT) AS seq_index,
       start_offset, n_tokens
FROM cum
"""

ORACLES["q_pack_greedy"] = """
WITH RECURSIVE counted AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(doc_id % 8 AS BIGINT) AS bucket
  FROM documents
), ordered AS (
  SELECT doc_id, bucket, n_tokens,
         row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
  FROM counted
), packed AS (
  SELECT doc_id, bucket, n_tokens, rn,
         CAST(0 AS BIGINT) AS seq_index,
         n_tokens AS seq_fill
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.doc_id, o.bucket, o.n_tokens, o.rn,
         CASE WHEN p.seq_fill + o.n_tokens > 256
              THEN p.seq_index + 1 ELSE p.seq_index END,
         CASE WHEN p.seq_fill + o.n_tokens > 256
              THEN o.n_tokens ELSE p.seq_fill + o.n_tokens END
  FROM packed p
  JOIN ordered o ON o.bucket = p.bucket AND o.rn = p.rn + 1
)
SELECT doc_id, bucket, seq_index, seq_fill, n_tokens FROM packed
"""

ORACLES["q_quality_gate"] = """
WITH feats AS (
  SELECT doc_id, lang,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_toks,
         CAST(len(list_filter(string_split(text, ' '),
                    t -> list_contains(['the','a','of','and','to','in','is','on','for','with'], t)))
              AS DOUBLE) AS n_stop
  FROM documents
), scored AS (
  SELECT doc_id, lang,
         ROUND(
           LEAST(n_chars / 200.0, 1.0) * 0.4
           + (CASE WHEN n_chars / n_toks >= 3.0 AND n_chars / n_toks <= 10.0
                   THEN 1.0 ELSE 0.5 END) * 0.3
           + LEAST((n_stop / n_toks) * 5.0, 1.0) * 0.3, 6) AS quality
  FROM feats
)
SELECT doc_id, lang, quality
FROM scored
WHERE quality >= (SELECT quantile_cont(quality, 0.25) FROM scored)
"""

ORACLES["q_tech_indicators"] = """
WITH series AS (
  SELECT l_suppkey,
         strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS day,
         (CAST(SUM(CAST(ROUND(l_extendedprice * 1000000) AS BIGINT)) AS DOUBLE)
          / 1000000) / COUNT(*) AS close
  FROM lineitem
  GROUP BY l_suppkey, day
), deltas AS (
  SELECT l_suppkey, day, close,
         close - LAG(close) OVER (PARTITION BY l_suppkey ORDER BY day) AS delta
  FROM series
), s0 AS (
  SELECT l_suppkey, day, close,
         CAST(SUM(CAST(ROUND((CASE WHEN delta > 0 THEN delta ELSE 0.0 END) * 1000000) AS BIGINT))
              OVER wr AS DOUBLE) / 1000000 AS g,
         CAST(SUM(CAST(ROUND((CASE WHEN delta < 0 THEN -delta ELSE 0.0 END) * 1000000) AS BIGINT))
              OVER wr AS DOUBLE) / 1000000 AS l,
         COUNT(close) OVER wb AS n,
         CAST(SUM(CAST(ROUND(close * 1000000) AS BIGINT)) OVER wb AS DOUBLE) / 1000000 AS sx,
         CAST(SUM(CAST(ROUND(close * close * 1000000) AS BIGINT)) OVER wb AS DOUBLE) / 1000000 AS sx2
  FROM deltas
  WINDOW wr AS (PARTITION BY l_suppkey ORDER BY day
                ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
         wb AS (PARTITION BY l_suppkey ORDER BY day
                ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
), s1 AS (
  SELECT l_suppkey, day, close,
         CASE WHEN g + l = 0 THEN NULL ELSE 100.0 * g / (g + l) END AS rsi_5,
         sx / n AS bb_mid_5,
         sqrt(CASE WHEN (CASE WHEN n > 1 THEN (sx2 - sx * (sx / n)) / (n - 1) END) < 0
                   THEN 0.0
                   ELSE (CASE WHEN n > 1 THEN (sx2 - sx * (sx / n)) / (n - 1) END) END) AS sd
  FROM s0
), s2 AS (
  SELECT l_suppkey, day, close, rsi_5, bb_mid_5,
         bb_mid_5 + 2.0 * sd AS bb_upper_5,
         bb_mid_5 - 2.0 * sd AS bb_lower_5
  FROM s1
)
SELECT l_suppkey, day, close, rsi_5, bb_mid_5, bb_upper_5, bb_lower_5,
       CASE WHEN bb_upper_5 = bb_lower_5 THEN NULL
            ELSE (close - bb_lower_5) / (bb_upper_5 - bb_lower_5) END AS bb_pctb_5
FROM s2
"""

ORACLES["q_pagerank"] = _pagerank_oracle()

ORACLES["q_det_sample"] = f"""
SELECT doc_id, lang FROM documents
WHERE md5(CAST(doc_id AS VARCHAR)) < '{_hex_threshold(0.1)}'
"""

ORACLES["q_stratified_sample"] = f"""
SELECT doc_id, lang FROM documents
WHERE md5(CAST(doc_id AS VARCHAR)) <
      CASE lang WHEN 'en' THEN '{_hex_threshold(0.05)}'
                WHEN 'de' THEN '{_hex_threshold(0.5)}'
                WHEN 'es' THEN '{_hex_threshold(0.25)}'
                ELSE '' END
"""

# --- analytics extensions: entity resolution, DQ, cohorts, time series,
# robust stats, graph metrics ---

ORACLES["q_fuzzy_match"] = """
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
FROM customer a JOIN customer b
  ON substr(a.c_name, 1, length(a.c_name) - 2)
     = substr(b.c_name, 1, length(b.c_name) - 2)
 AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
"""

ORACLES["q_dq_audit"] = """
SELECT 'not_null:o_custkey' AS rule,
       CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
FROM orders
UNION ALL
SELECT 'range:o_totalprice_positive',
       CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'accepted:o_orderstatus',
       CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'fresh:o_orderdate_after_1990',
       CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01' THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'unique:o_orderkey',
       CAST((SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders) AS BIGINT)
UNION ALL
SELECT 'ref:o_custkey->customer',
       CAST((SELECT COUNT(*) FROM orders
             WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)) AS BIGINT)
"""

ORACLES["q_retention_cohort"] = """
WITH ev AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
f AS (SELECT user_id, MIN(d) AS cd FROM ev GROUP BY user_id)
SELECT strftime(cd, '%Y-%m-%d') AS cohort_day,
       CAST(date_diff('day', cd, d) AS INTEGER) AS offset_days,
       COUNT(DISTINCT user_id) AS n_users
FROM ev JOIN f USING (user_id)
GROUP BY cd, date_diff('day', cd, d)
"""

ORACLES["q_interpolate"] = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         (CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS DOUBLE) / 1000000)
           / COUNT(value) AS v
  FROM events WHERE user_id < 8
  GROUP BY user_id, CAST(ts AS DATE)
),
spine AS (
  SELECT user_id,
         unnest(generate_series(DATE '2024-01-01', DATE '2024-01-30',
                                INTERVAL 1 DAY))::DATE AS d
  FROM (SELECT DISTINCT user_id FROM daily)
),
dense AS (
  SELECT s.user_id, s.d, daily.v
  FROM spine s LEFT JOIN daily ON s.user_id = daily.user_id AND s.d = daily.d
),
w AS (
  SELECT user_id, d, v,
    last_value(v IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY d
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    last_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY d
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
    first_value(v IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY d
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    first_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY d
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
  FROM dense
)
SELECT user_id, strftime(d, '%Y-%m-%d') AS day,
  CASE WHEN v IS NOT NULL THEN v
       WHEN pv IS NULL THEN nv
       WHEN nv IS NULL THEN pv
       ELSE pv + (nv - pv) * (CAST(date_diff('day', pd, d) AS DOUBLE)
                              / CAST(date_diff('day', pd, nd) AS DOUBLE))
  END AS value_filled
FROM w
"""

ORACLES["q_mad_outliers"] = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_id, e.event_type, ABS(e.value - m.med) AS adev
  FROM events e JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY event_type
)
SELECT d.event_id, d.event_type
FROM dev d JOIN mad USING (event_type)
WHERE d.adev > 3 * mad.mad
"""

ORACLES["q_triangles"] = """
WITH g AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(l)),
                                      x -> l[x] || ' ' || l[x+1])) AS grams
  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
), ex AS (
  SELECT doc_id, UNNEST(grams) AS gram FROM g
), sizes AS (
  SELECT doc_id, len(grams) AS n FROM g
), inter AS (
  SELECT a.doc_id AS u, b.doc_id AS v, COUNT(*) AS c
  FROM ex a JOIN ex b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), pairs AS (
  SELECT i.u, i.v
  FROM inter i
  JOIN sizes su ON i.u = su.doc_id
  JOIN sizes sv ON i.v = sv.doc_id
  WHERE CAST(i.c AS DOUBLE) / (su.n + sv.n - i.c) >= 0.8
), tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM pairs e1
  JOIN pairs e2 ON e1.v = e2.u
  JOIN pairs e3 ON e1.u = e3.u AND e2.v = e3.v
), nodes AS (
  SELECT a AS id FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT id AS doc_id, COUNT(*) AS n_triangles FROM nodes GROUP BY id
"""

ORACLES["q_heavy_hitters"] = """
WITH c AS (
  SELECT event_type, user_id, COUNT(*) AS n_events FROM events GROUP BY event_type, user_id
),
t AS (
  SELECT event_type, COUNT(*) * CAST(0.01 AS DOUBLE) AS thr FROM events GROUP BY event_type
)
SELECT c.event_type, c.user_id, CAST(c.n_events AS BIGINT) AS n_events
FROM c JOIN t USING (event_type)
WHERE c.n_events > t.thr
"""

ORACLES["q_redact_pii"] = """
WITH raw AS (
  SELECT c_custkey,
         'reach ' || c_name || ' at c' || CAST(c_custkey AS VARCHAR)
         || '@corp.example.com'
         || CASE WHEN c_custkey % 2 = 0
                 THEN ' or 555-' || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0')
                      || '-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END
         || ' ssn 123-45-6789 ip 10.0.0.' || CAST(c_custkey % 256 AS VARCHAR) AS t
  FROM customer
)
SELECT c_custkey,
       regexp_replace(
         regexp_replace(
           regexp_replace(
             regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g'),
           '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b', '<PHONE>', 'g'),
         '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IPV4>', 'g') AS redacted,
       CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
          + len(regexp_extract_all(t, '\\b\\d{3}-\\d{2}-\\d{4}\\b'))
          + len(regexp_extract_all(t, '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b'))
          + len(regexp_extract_all(t, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'))
         AS INTEGER) AS n_pii
FROM raw
"""

ORACLES["q_repetition_filter"] = """
WITH grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(l)), x -> l[x] || ' ' || l[x+1])) AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
), per AS (
  SELECT doc_id, gram, COUNT(*) AS cnt FROM grams GROUP BY doc_id, gram
)
SELECT doc_id,
       CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS top_gram_frac,
       CAST(SUM(cnt) AS BIGINT) AS n_grams,
       (CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE)) >= 0.08 AS is_repetitive
FROM per
GROUP BY doc_id
"""

ORACLES["q_asof_tolerance"] = """
WITH u AS (
  SELECT user_id, ts, event_id, 0 AS is_right,
         event_id AS p_event_id, value AS p_value, NULL::DOUBLE AS c_value
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, ts, event_id, 1 AS is_right,
         NULL AS p_event_id, NULL AS p_value, value AS c_value
  FROM events WHERE event_type = 'click'
),
carried AS (
  SELECT *, last_value(c_value IGNORE NULLS) OVER w AS cv,
         last_value(CASE WHEN is_right = 1 THEN ts END IGNORE NULLS) OVER w AS rts
  FROM u
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, is_right DESC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT p_event_id AS event_id, user_id, ts, p_value AS value,
       CASE WHEN rts >= ts - INTERVAL 1 HOUR THEN cv END AS click_value_asof
FROM carried
WHERE is_right = 0
"""

ORACLES["q_rolling_beta"] = """
WITH ud AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         (CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS DOUBLE) / 1000000)
           / COUNT(value) AS y
  FROM events GROUP BY user_id, CAST(ts AS DATE)
),
md AS (
  SELECT CAST(ts AS DATE) AS d,
         (CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS DOUBLE) / 1000000)
           / COUNT(value) AS x
  FROM events GROUP BY CAST(ts AS DATE)
),
j AS (SELECT ud.user_id, ud.d, ud.y, md.x FROM ud JOIN md USING (d)),
comp AS (
  SELECT user_id, d,
    CAST(COUNT(*) OVER w AS DOUBLE) AS n,
    (CAST(SUM(CAST(ROUND((x) * 1000000) AS BIGINT)) OVER w AS DOUBLE) / 1000000) AS sx,
    (CAST(SUM(CAST(ROUND((y) * 1000000) AS BIGINT)) OVER w AS DOUBLE) / 1000000) AS sy,
    (CAST(SUM(CAST(ROUND((x * y) * 1000000) AS BIGINT)) OVER w AS DOUBLE) / 1000000) AS sxy,
    (CAST(SUM(CAST(ROUND((x * x) * 1000000) AS BIGINT)) OVER w AS DOUBLE) / 1000000) AS sxx
  FROM j
  WINDOW w AS (PARTITION BY user_id ORDER BY d
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
)
SELECT user_id, strftime(d, '%Y-%m-%d') AS day,
       CASE WHEN n * sxx - sx * sx <> 0
            THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS beta
FROM comp
"""

ORACLES["q_ab_test"] = """
WITH agg AS (
  SELECT event_type, CAST(user_id % 2 AS INTEGER) AS grp,
         CAST(COUNT(*) AS DOUBLE) AS n,
         (CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS sx,
         (CAST(SUM(CAST(ROUND((value * value) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS sxx
  FROM events GROUP BY event_type, CAST(user_id % 2 AS INTEGER)
),
j AS (
  SELECT a.event_type,
         a.n AS na, a.sx AS sxa, a.sxx AS sxxa,
         b.n AS nb, b.sx AS sxb, b.sxx AS sxxb
  FROM (SELECT * FROM agg WHERE grp = 0) a
  JOIN (SELECT * FROM agg WHERE grp = 1) b USING (event_type)
)
SELECT event_type,
       CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       (sxa / na - sxb / nb) AS mean_diff,
       (sxa / na - sxb / nb) /
       sqrt(((sxxa - sxa * sxa / na) / (na - 1)) / na
            + ((sxxb - sxb * sxb / nb) / (nb - 1)) / nb) AS t_stat
FROM j
"""

ORACLES["q_market_basket"] = """
WITH baskets AS (SELECT DISTINCT user_id, event_type FROM events),
nu AS (SELECT CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS n FROM baskets),
sup AS (
  SELECT event_type, COUNT(*) / nu.n AS support FROM baskets, nu
  GROUP BY event_type, nu.n
),
pair AS (
  SELECT a.event_type AS t_a, b.event_type AS t_b, COUNT(*) / nu.n AS support_ab
  FROM baskets a
  JOIN baskets b ON a.user_id = b.user_id AND a.event_type < b.event_type, nu
  GROUP BY a.event_type, b.event_type, nu.n
)
SELECT t_a, t_b, support_ab,
       support_ab / (sa.support * sb.support) AS lift
FROM pair
JOIN sup sa ON sa.event_type = t_a
JOIN sup sb ON sb.event_type = t_b
"""

ORACLES["q_variant_json"] = """
SELECT event_type,
       COUNT(CAST(json_extract(props, '$.k') AS INTEGER)) AS n_k,
       CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       ROUND(AVG(CAST(json_extract(props, '$.k') AS INTEGER)), 6) AS avg_k,
       MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS max_k
FROM events
GROUP BY event_type
"""

ORACLES["q_regr_agg"] = """
SELECT l_returnflag,
       regr_count(l_extendedprice, l_quantity) AS n_pairs,
       ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
       ROUND(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
       ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
       ROUND(regr_avgx(l_extendedprice, l_quantity), 6) AS avg_x,
       ROUND(regr_avgy(l_extendedprice, l_quantity), 6) AS avg_y
FROM lineitem
GROUP BY l_returnflag
"""

ORACLES["q_join_full"] = f"""
WITH cust AS (
  SELECT c_custkey, c_mktsegment, c_acctbal FROM customer WHERE c_acctbal > 7500
),
ords AS (
  SELECT o_custkey, COUNT(*) AS n_orders, {_dsum('o_totalprice')} AS total_spend
  FROM orders GROUP BY o_custkey
)
SELECT COALESCE(c_custkey, o_custkey) AS custkey,
       c_mktsegment,
       ROUND(c_acctbal, 2) AS acctbal,
       n_orders,
       total_spend
FROM cust FULL OUTER JOIN ords ON c_custkey = o_custkey
"""

ORACLES["q_mode_exact"] = """
WITH counts AS (
  SELECT l_returnflag, l_quantity, COUNT(*) AS cnt
  FROM lineitem GROUP BY l_returnflag, l_quantity
),
ranked AS (
  SELECT l_returnflag, l_quantity, cnt,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY cnt DESC, l_quantity ASC) AS rn
  FROM counts
)
SELECT l_returnflag, l_quantity AS mode_qty, cnt AS mode_count
FROM ranked WHERE rn = 1
"""

ORACLES["q_ohlc_resample"] = """
WITH ordered AS (
  SELECT event_type,
         CAST(ts AS DATE) AS day,
         value,
         FIRST_VALUE(value) OVER (PARTITION BY event_type, CAST(ts AS DATE)
                                  ORDER BY ts, event_id) AS open,
         FIRST_VALUE(value) OVER (PARTITION BY event_type, CAST(ts AS DATE)
                                  ORDER BY ts DESC, event_id DESC) AS close
  FROM events
)
SELECT event_type,
       strftime(day, '%Y-%m-%d') AS day,
       ANY_VALUE(open) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       ANY_VALUE(close) AS close,
       COUNT(*) AS n_ticks
FROM ordered
GROUP BY event_type, day
"""

ORACLES["q_kmeans"] = """
WITH v AS (
  SELECT vec_id, CAST(pos AS BIGINT) AS pos,
         CAST(ROUND(CAST(xv AS DOUBLE) * 1000000) AS BIGINT) AS x
  FROM (SELECT vec_id,
               unnest(range(len(embedding))) AS pos,
               unnest(embedding) AS xv
        FROM embeddings)
),
init AS (
  SELECT vec_id,
         CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS BIGINT) AS cell
  FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 8
),
c0 AS (SELECT i.cell, v.pos, v.x AS c FROM init i JOIN v USING (vec_id)),
d0 AS (
  SELECT v.vec_id, c.cell, SUM((v.x - c.c) * (v.x - c.c)) AS dist
  FROM v JOIN c0 c USING (pos) GROUP BY v.vec_id, c.cell
),
a0 AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
    FROM d0
  ) WHERE rn = 1
),
s0 AS (
  SELECT a.cell, v.pos, CAST(SUM(v.x) AS BIGINT) AS s, COUNT(*) AS n
  FROM a0 a JOIN v USING (vec_id) GROUP BY a.cell, v.pos
),
c1 AS (SELECT cell, pos, CAST((s - s % n) / n AS BIGINT) AS c FROM s0),
d1 AS (
  SELECT v.vec_id, c.cell, SUM((v.x - c.c) * (v.x - c.c)) AS dist
  FROM v JOIN c1 c USING (pos) GROUP BY v.vec_id, c.cell
),
a1 AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
    FROM d1
  ) WHERE rn = 1
),
s1 AS (
  SELECT a.cell, v.pos, CAST(SUM(v.x) AS BIGINT) AS s, COUNT(*) AS n
  FROM a1 a JOIN v USING (vec_id) GROUP BY a.cell, v.pos
),
c2 AS (SELECT cell, pos, CAST((s - s % n) / n AS BIGINT) AS c FROM s1),
d2 AS (
  SELECT v.vec_id, c.cell, SUM((v.x - c.c) * (v.x - c.c)) AS dist
  FROM v JOIN c2 c USING (pos) GROUP BY v.vec_id, c.cell
),
a2 AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
    FROM d2
  ) WHERE rn = 1
),
s2 AS (
  SELECT a.cell, v.pos, CAST(SUM(v.x) AS BIGINT) AS s, COUNT(*) AS n
  FROM a2 a JOIN v USING (vec_id) GROUP BY a.cell, v.pos
),
c3 AS (SELECT cell, pos, CAST((s - s % n) / n AS BIGINT) AS c FROM s2)
SELECT cell, pos, CAST((s - s % n) / n AS BIGINT) AS c, n FROM s2
"""

ORACLES["q_cms_heavy"] = """
WITH hashed AS (
  SELECT t.i, ((instr('0123456789abcdef', substring(md5(concat(CAST(t.i AS STRING), '|', CAST(e.user_id AS STRING))), 1, 1)) - 1) * 16 + (instr('0123456789abcdef', substring(md5(concat(CAST(t.i AS STRING), '|', CAST(e.user_id AS STRING))), 2, 1)) - 1)) AS b
  FROM events e, range(4) t(i)
),
cms AS (SELECT i, b, COUNT(*) AS cnt FROM hashed GROUP BY i, b),
true_top AS (
  SELECT user_id, COUNT(*) AS true_cnt FROM events GROUP BY user_id
  ORDER BY true_cnt DESC, user_id ASC LIMIT 10
),
cand AS (
  SELECT tt.user_id, tt.true_cnt, t.i, ((instr('0123456789abcdef', substring(md5(concat(CAST(t.i AS STRING), '|', CAST(tt.user_id AS STRING))), 1, 1)) - 1) * 16 + (instr('0123456789abcdef', substring(md5(concat(CAST(t.i AS STRING), '|', CAST(tt.user_id AS STRING))), 2, 1)) - 1)) AS b
  FROM true_top tt, range(4) t(i)
)
SELECT c.user_id, c.true_cnt, MIN(s.cnt) AS est_cnt
FROM cand c JOIN cms s USING (i, b)
GROUP BY c.user_id, c.true_cnt
"""

ORACLES["q_interval_join"] = """
SELECT l.user_id,
       COUNT(*) AS n_pairs,
       COUNT(DISTINCT l.event_id) AS n_clicks_with_followup
FROM events l
JOIN events r
  ON r.user_id = l.user_id
 AND epoch(r.ts) > epoch(l.ts)
 AND epoch(r.ts) <= epoch(l.ts) + 1800
WHERE l.event_type = 'click' AND r.event_type = 'purchase'
GROUP BY l.user_id
"""

ORACLES["q_char_entropy"] = """
WITH docs AS (
  SELECT doc_id, lower(substring(text, 1, 240)) AS t FROM documents
),
chars AS (
  SELECT doc_id, substring(t, CAST(i AS INTEGER), 1) AS c
  FROM (SELECT doc_id, t, unnest(range(1, length(t) + 1)) AS i FROM docs)
),
counts AS (
  SELECT doc_id, c, COUNT(*) AS n_c FROM chars GROUP BY doc_id, c
),
totals AS (
  SELECT doc_id, SUM(n_c) AS n FROM counts GROUP BY doc_id
)
SELECT counts.doc_id,
       -(CAST(SUM(CAST(ROUND(((n_c / n) * log2(n_c / n)) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS entropy_bits,
       COUNT(*) AS n_distinct_chars
FROM counts JOIN totals USING (doc_id)
GROUP BY counts.doc_id
"""

ORACLES["q_simhash_portable"] = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
bits AS (
  SELECT doc_id, t.i,
         CASE WHEN CAST(FLOOR(
             (instr('0123456789abcdef',
                    substring(md5(tok), 1 + CAST(FLOOR(t.i / 4) AS INTEGER), 1)) - 1)
             / POWER(2, t.i % 4)) AS BIGINT) % 2 = 1
           THEN 1 ELSE -1 END AS sgn
  FROM toks, (SELECT unnest(range(48)) AS i) t
),
counts AS (SELECT doc_id, i, SUM(sgn) AS s FROM bits GROUP BY doc_id, i)
SELECT doc_id,
       CAST(SUM(CASE WHEN s > 0 THEN POWER(2, i) ELSE 0 END) AS BIGINT) AS simhash
FROM counts GROUP BY doc_id
"""

ORACLES["q_winsorize"] = f"""
WITH bands AS (
  SELECT event_type,
         quantile_cont(value, 0.05) AS p05,
         quantile_cont(value, 0.95) AS p95
  FROM events GROUP BY event_type
),
clamped AS (
  SELECT e.event_type,
         GREATEST(LEAST(e.value, b.p95), b.p05) AS w
  FROM events e JOIN bands b USING (event_type)
)
SELECT event_type,
       ROUND(MIN(w), 6) AS min_w,
       ROUND(MAX(w), 6) AS max_w,
       {_dsum('w')} AS sum_w,
       COUNT(*) AS n
FROM clamped GROUP BY event_type
"""

ORACLES["q_calendar_features"] = """
SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS day,
       CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS INTEGER) AS dow,
       CAST(quarter(CAST(o_orderdate AS DATE)) AS INTEGER) AS quarter,
       CAST(CASE WHEN CAST(o_orderdate AS DATE) = last_day(CAST(o_orderdate AS DATE))
            THEN 1 ELSE 0 END AS INTEGER) AS is_month_end,
       CAST(dayofmonth(last_day(CAST(o_orderdate AS DATE))) AS INTEGER) AS days_in_month,
       COUNT(*) AS n_orders
FROM orders
GROUP BY 1, 2, 3, 4, 5
"""

ORACLES["q_gap_fill"] = """
SELECT user_id, event_id,
       ROUND(last_value(CASE WHEN event_type = 'view' THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS ffill,
       ROUND(first_value(CASE WHEN event_type = 'view' THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 6) AS bfill
FROM events
"""

ORACLES["q_simhash_pairs"] = (
    """
WITH sigs AS (
  SELECT doc_id, simhash FROM ("""
    + ORACLES["q_simhash_portable"]
    + """)
),
bands AS (
  SELECT doc_id, simhash AS sig, t.b AS band,
         CAST(FLOOR(simhash / POWER(2, 12 * t.b)) AS BIGINT) % 4096 AS bval
  FROM sigs, (SELECT unnest(range(4)) AS b) t
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.sig AS sig_a, b.sig AS sig_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(sig_a, sig_b)) AS INTEGER) AS hamming
FROM pairs
"""
)

ORACLES["q_source_cap"] = """
WITH ranked AS (
  SELECT source, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
)
SELECT source,
       COUNT(*) AS n_kept,
       CAST(SUM(n_chars) AS BIGINT) AS chars_kept,
       MIN(doc_id) AS min_doc_id
FROM ranked WHERE rn <= 50
GROUP BY source
"""

ORACLES["q_unigram_logprob"] = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents
),
nz AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
doc_tok AS (SELECT doc_id, tok, COUNT(*) AS n_dt FROM nz GROUP BY doc_id, tok),
vocab AS (SELECT tok, CAST(SUM(n_dt) AS BIGINT) AS n_t FROM doc_tok GROUP BY tok),
total AS (SELECT CAST(SUM(n_t) AS BIGINT) AS n_total FROM vocab)
SELECT doc_id,
       (CAST(SUM(CAST(ROUND((n_dt * log2(CAST(n_t AS DOUBLE) / n_total)) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000)
         / CAST(SUM(n_dt) AS DOUBLE) AS avg_log2_prob,
       CAST(SUM(n_dt) AS BIGINT) AS n_tokens
FROM doc_tok JOIN vocab USING (tok), total
GROUP BY doc_id
"""

ORACLES["q_dataset_card"] = """
WITH fps AS (
  SELECT lang, source, n_chars,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
  FROM documents
)
SELECT lang,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT source) AS n_sources,
       COUNT(DISTINCT fp) AS n_unique,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS mean_chars,
       ROUND(CAST(COUNT(*) - COUNT(DISTINCT fp) AS DOUBLE) / COUNT(*), 6) AS dup_rate
FROM fps
GROUP BY lang
"""

ORACLES["q_rfm"] = f"""
WITH per AS (
  SELECT o_custkey,
         MAX(CAST(o_orderdate AS DATE)) AS last_order,
         COUNT(*) AS frequency,
         {_dsum('o_totalprice')} AS monetary
  FROM orders GROUP BY o_custkey
),
anchored AS (
  SELECT p.*, date_diff('day', last_order, (SELECT MAX(last_order) FROM per)) AS recency_days
  FROM per p
)
SELECT o_custkey,
       CAST(recency_days AS INTEGER) AS recency_days,
       frequency,
       ROUND(monetary, 2) AS monetary,
       CAST(NTILE(5) OVER (ORDER BY recency_days ASC, o_custkey ASC) AS INTEGER) AS r_score,
       CAST(NTILE(5) OVER (ORDER BY frequency DESC, o_custkey ASC) AS INTEGER) AS f_score,
       CAST(NTILE(5) OVER (ORDER BY monetary DESC, o_custkey ASC) AS INTEGER) AS m_score
FROM anchored
"""

ORACLES["q_new_vs_returning"] = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
first AS (
  SELECT user_id, MIN(day) AS first_day FROM days GROUP BY user_id
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
       CAST(SUM(CASE WHEN day = first_day THEN 0 ELSE 1 END) AS BIGINT) AS returning_users
FROM days JOIN first USING (user_id)
GROUP BY day
"""

ORACLES["q_skyline"] = """
SELECT a.p_partkey, a.p_retailprice, a.p_size
FROM part a
WHERE NOT EXISTS (
  SELECT 1 FROM part b
  WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
    AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
)
"""

ORACLES["q_rolling_median"] = """
SELECT l_suppkey, l_orderkey, l_linenumber,
       median(CAST(l_quantity AS DOUBLE)) OVER (
         PARTITION BY l_suppkey
         ORDER BY l_shipdate, l_orderkey, l_linenumber
         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
       ) AS med
FROM lineitem
"""

# Mirrors operators/bloom.py arithmetic bit-for-bit: k=3 md5 positions mod
# 16384, packed into 32-bit words, bit_or build, all-bits-set probe.
ORACLES["q_bloom_semijoin"] = """
WITH ks(i) AS (VALUES ('0'), ('1'), ('2')),
build AS (
  SELECT (('0x' || substr(md5(ks.i || ':' || CAST(o.o_custkey AS VARCHAR)), 1, 15))::BIGINT
          % 16384) AS pos
  FROM orders o CROSS JOIN ks
  WHERE year(CAST(o.o_orderdate AS DATE)) = 1995
),
words AS (
  SELECT pos // 32 AS word,
         bit_or(1::BIGINT << CAST(pos % 32 AS INTEGER)) AS bits
  FROM build GROUP BY pos // 32
),
probe AS (
  SELECT c.c_custkey,
         (('0x' || substr(md5(ks.i || ':' || CAST(c.c_custkey AS VARCHAR)), 1, 15))::BIGINT
          % 16384) AS pos
  FROM customer c CROSS JOIN ks
),
hits AS (
  SELECT p.c_custkey,
         SUM(CASE WHEN w.bits IS NOT NULL
                   AND (w.bits & (1::BIGINT << CAST(p.pos % 32 AS INTEGER))) <> 0
             THEN 1 ELSE 0 END) AS nhit
  FROM probe p LEFT JOIN words w ON p.pos // 32 = w.word
  GROUP BY p.c_custkey
)
SELECT c_custkey FROM hits WHERE nhit = 3
"""

ORACLES["q_shard_stats"] = """
SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 16 AS INTEGER)
         AS shard,
       COUNT(*) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc
FROM documents
GROUP BY 1
"""

# Mirrors operators/kmv.py: md5-uniform per distinct (group, key), bottom-64
# rank, (k-1)/u_k estimate (exact count when the group has < k distinct).
ORACLES["q_kmv_distinct"] = """
WITH u AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
           / 1152921504606846976.0 AS u
  FROM events
), r AS (
  SELECT event_type, u,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY u) AS rn
  FROM u
), s AS (
  SELECT event_type, COUNT(*) AS n, MAX(u) AS uk
  FROM r WHERE rn <= 64 GROUP BY event_type
)
SELECT event_type,
       CASE WHEN n < 64 THEN CAST(n AS DOUBLE) ELSE ROUND(63 / uk, 6) END
         AS est_distinct
FROM s
"""

ORACLES["q_weighted_sample"] = """
SELECT doc_id, ROUND(pow(h, 1.0 / w), 6) AS es_score
FROM (
  SELECT doc_id, length(text) AS w,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
           / 1152921504606846976.0 AS h
  FROM documents
)
ORDER BY es_score DESC, doc_id ASC
LIMIT 50
"""

# q_quantized_topk upgraded from rows-only (r1) to exact: the int8 codes are
# NOT engine-specific after all — per-vector max-abs scale, round-half-away
# (Spark HALF_UP == DuckDB round), tinyint cast and the cosine fold are all
# portable double arithmetic; round-6 absorbs fold-order ulps. Verified
# value-identical at sf0.001 and sf0.01.
ORACLES["q_quantized_topk"] = """
WITH qn AS (
  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE) /
           sqrt(list_sum(list_transform(embedding,
                y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS q
  FROM embeddings WHERE vec_id = 0
),
store AS (
  SELECT vec_id, label, embedding,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS s0
  FROM embeddings
),
codes AS (
  SELECT vec_id, label,
         list_transform(embedding,
           x -> CAST(CAST(round(CAST(x AS DOUBLE)
                  / (CASE WHEN s0 = 0 THEN 1.0 ELSE s0 END) * 127.0) AS TINYINT)
                AS DOUBLE)) AS c
  FROM store
),
scored AS (
  SELECT vec_id, label,
         ROUND(
           list_sum(list_transform(list_zip(c, q), s -> s[1] * s[2]))
           / sqrt(list_sum(list_transform(c, x -> x * x))), 6) AS sim
  FROM codes CROSS JOIN qn
)
SELECT vec_id, label, sim FROM scored ORDER BY sim DESC, vec_id LIMIT 20
"""

# q_ivf_topk upgraded from rows-only (r1) to exact: the quantizer is the
# fixed-point Lloyd training already oracled by q_kmeans (prefix below =
# that oracle's first two iterations, k=8), and routing/probing use the
# portable round-6 cosine rule (similarity.ivf_index_portable /
# probe_cells_col) with ties to the lower cell id.
ORACLES["q_ivf_topk"] = """
WITH v AS (
  SELECT vec_id, CAST(pos AS BIGINT) AS pos,
         CAST(ROUND(CAST(xv AS DOUBLE) * 1000000) AS BIGINT) AS x
  FROM (SELECT vec_id,
               unnest(range(len(embedding))) AS pos,
               unnest(embedding) AS xv
        FROM embeddings)
),
init AS (
  SELECT vec_id,
         CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS BIGINT) AS cell
  FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 8
),
c0 AS (SELECT i.cell, v.pos, v.x AS c FROM init i JOIN v USING (vec_id)),
d0 AS (
  SELECT v.vec_id, c.cell, SUM((v.x - c.c) * (v.x - c.c)) AS dist
  FROM v JOIN c0 c USING (pos) GROUP BY v.vec_id, c.cell
),
a0 AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
    FROM d0
  ) WHERE rn = 1
),
s0 AS (
  SELECT a.cell, v.pos, CAST(SUM(v.x) AS BIGINT) AS s, COUNT(*) AS n
  FROM a0 a JOIN v USING (vec_id) GROUP BY a.cell, v.pos
),
c1 AS (SELECT cell, pos, CAST((s - s % n) / n AS BIGINT) AS c FROM s0),
d1 AS (
  SELECT v.vec_id, c.cell, SUM((v.x - c.c) * (v.x - c.c)) AS dist
  FROM v JOIN c1 c USING (pos) GROUP BY v.vec_id, c.cell
),
a1 AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
    FROM d1
  ) WHERE rn = 1
),
s1 AS (
  SELECT a.cell, v.pos, CAST(SUM(v.x) AS BIGINT) AS s, COUNT(*) AS n
  FROM a1 a JOIN v USING (vec_id) GROUP BY a.cell, v.pos
),
cent AS (
  SELECT cell,
         list(CAST(CAST((s - s % n) / n AS BIGINT) AS DOUBLE) / 1000000.0
              ORDER BY pos) AS cvec
  FROM s1 GROUP BY cell
),
e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
),
route AS (
  SELECT e.vec_id, e.label, e.vec, c.cell,
         ROUND(list_dot_product(e.vec, c.cvec)
               / (sqrt(list_dot_product(e.vec, e.vec))
                  * sqrt(list_dot_product(c.cvec, c.cvec))), 6) AS csim
  FROM e CROSS JOIN cent c
),
assigned AS (
  SELECT vec_id, label, vec, cell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY csim DESC, cell ASC) AS rn
    FROM route) WHERE rn = 1
),
probes AS (
  SELECT cell FROM (
    SELECT cell, ROW_NUMBER() OVER (ORDER BY csim DESC, cell ASC) AS rn
    FROM route WHERE vec_id = 0) WHERE rn <= 2
),
q AS (SELECT vec FROM e WHERE vec_id = 0),
cand AS (
  SELECT a.vec_id, a.label,
         ROUND(list_dot_product(a.vec, q.vec)
               / (sqrt(list_dot_product(a.vec, a.vec))
                  * sqrt(list_dot_product(q.vec, q.vec))), 6) AS sim
  FROM assigned a JOIN probes USING (cell) CROSS JOIN q
)
SELECT vec_id, label, sim FROM cand ORDER BY sim DESC, vec_id LIMIT 20
"""

ORACLES["q_histogram_equidepth"] = """
SELECT bucket, COUNT(*) AS n, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
FROM (
  SELECT o_orderkey, o_totalprice,
         CAST(NTILE(10) OVER (ORDER BY o_totalprice ASC, o_orderkey ASC) AS INTEGER) AS bucket
  FROM orders
)
GROUP BY bucket
"""

# Mirrors operators/kmv.kmv_overlap arithmetic: per-side bottom-128 of the
# md5-uniform, M = bottom-128 of the union, J = |M∩A∩B|/|M|,
# union = (k-1)/u_k (exact count when |M| < k), intersection = J * union.
ORACLES["q_kmv_overlap"] = """
WITH ua AS (
  SELECT DISTINCT ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT
           / 1152921504606846976.0 AS u
  FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1995
), ub AS (
  SELECT DISTINCT ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT
           / 1152921504606846976.0 AS u
  FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1996
), sa AS (SELECT u FROM ua ORDER BY u LIMIT 128),
   sb AS (SELECT u FROM ub ORDER BY u LIMIT 128),
   m AS (
     SELECT u FROM (SELECT u FROM sa UNION SELECT u FROM sb)
     ORDER BY u LIMIT 128
   ),
   stats AS (
     SELECT (SELECT COUNT(*) FROM m) AS n_m,
            (SELECT MAX(u) FROM m) AS u_k,
            (SELECT COUNT(*) FROM m
             WHERE u IN (SELECT u FROM sa) AND u IN (SELECT u FROM sb)) AS n_both
   )
SELECT ROUND(CAST(n_both AS DOUBLE) / n_m, 6) AS j_est,
       CASE WHEN n_m < 128 THEN CAST(n_m AS DOUBLE)
            ELSE ROUND(127 / u_k, 6) END AS union_est,
       ROUND(CAST(n_both AS DOUBLE) / n_m *
             (CASE WHEN n_m < 128 THEN CAST(n_m AS DOUBLE)
                   ELSE ROUND(127 / u_k, 6) END), 6) AS inter_est
FROM stats
"""

ORACLES["q_salted_join"] = """
SELECT n.n_name, COUNT(*) AS n_customers
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""

ORACLES["q_attribution"] = """
SELECT event_id AS purchase_id, user_id, first_touch, last_touch
FROM (
  SELECT event_id, user_id, event_type,
         first_value(CASE WHEN event_type IN ('click', 'view') THEN event_id END
                     IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_touch,
         last_value(CASE WHEN event_type IN ('click', 'view') THEN event_id END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch
  FROM events
)
WHERE event_type = 'purchase'
"""

ORACLES["q_cumulative_users"] = """
WITH first_seen AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day FROM events GROUP BY user_id
),
daily AS (
  SELECT first_day, COUNT(*) AS new_users FROM first_seen GROUP BY first_day
)
SELECT strftime(first_day, '%Y-%m-%d') AS day,
       CAST(SUM(new_users) OVER (ORDER BY first_day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
FROM daily
"""

ORACLES["q_pop_growth"] = f"""
WITH monthly AS (
  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
         ROUND({_dsum('o_totalprice')}, 2) AS revenue
  FROM orders GROUP BY strftime(CAST(o_orderdate AS DATE), '%Y-%m')
)
SELECT month, revenue,
       ROUND((revenue - LAG(revenue) OVER (ORDER BY month))
             / LAG(revenue) OVER (ORDER BY month) * 100, 6) AS growth_pct
FROM monthly
"""

ORACLES["q_dup_fraction"] = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
spans AS (
  SELECT doc_id,
         md5(l[i]||' '||l[i+1]||' '||l[i+2]||' '||l[i+3]||' '||l[i+4]
             ||' '||l[i+5]||' '||l[i+6]||' '||l[i+7]) AS span_hash
  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l) - 7)) AS i
        FROM toks WHERE len(l) >= 8)
),
dups AS (
  SELECT span_hash FROM spans GROUP BY span_hash
  HAVING COUNT(DISTINCT doc_id) >= 2
),
tot AS (SELECT doc_id, COUNT(*) AS n_windows FROM spans GROUP BY doc_id),
dupc AS (
  SELECT s.doc_id, COUNT(*) AS n_dup
  FROM spans s JOIN dups USING (span_hash) GROUP BY s.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(t.n_windows, 0) AS BIGINT) AS n_windows,
       CAST(COALESCE(c.n_dup, 0) AS BIGINT) AS n_dup,
       CASE WHEN COALESCE(t.n_windows, 0) = 0 THEN 0.0
            ELSE ROUND(CAST(COALESCE(c.n_dup, 0) AS DOUBLE) / t.n_windows, 6)
       END AS dup_fraction
FROM documents d
LEFT JOIN tot t USING (doc_id)
LEFT JOIN dupc c USING (doc_id)
"""

ORACLES["q_weighted_sample_grouped"] = """
SELECT lang, doc_id, es_score
FROM (
  SELECT lang, doc_id, es_score,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY es_score DESC, doc_id ASC) AS rn
  FROM (
    SELECT lang, doc_id,
           ROUND(pow(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                     / 1152921504606846976.0,
                     1.0 / length(text)), 6) AS es_score
    FROM documents
  )
)
WHERE rn <= 20
"""

ORACLES["q_bm25_search"] = """
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
         (3, 'stream batch merge'),
         (4, 'customer query filter zzzmissingterm')
), qterms AS (
  SELECT DISTINCT query_id, term
  FROM (SELECT query_id, UNNEST(string_split(qtext, ' ')) AS term FROM queries)
  WHERE term <> ''
), totals AS (
  SELECT q.query_id, s.doc_id,
         ROUND(CAST(SUM(CAST(ROUND(s.score * 1000000) AS BIGINT)) AS DOUBLE)
               / 1000000, 6) AS total_score,
         COUNT(*) AS n_terms_hit
  FROM scored s JOIN qterms q ON s.term = q.term
  GROUP BY q.query_id, s.doc_id
)
SELECT query_id, doc_id, total_score, n_terms_hit, rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY total_score DESC, doc_id ASC
         ) AS rank
  FROM totals
)
WHERE rank <= 5
"""

ORACLES["q_epoch_shuffle"] = """
WITH s AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 8
              AS INTEGER) AS shard,
         md5('1' || '|' || CAST(doc_id AS VARCHAR)) AS ek
  FROM documents
)
SELECT doc_id, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY ek ASC, doc_id ASC)
            AS BIGINT) AS pos
FROM s
"""

# Direct single-pass aggregate — the merge-of-batches Spark side must equal
# it exactly (algebraic-aggregate property, fixed-point interior).
ORACLES["q_mv_merge"] = """
SELECT o_orderstatus,
       COUNT(*) AS n_rows,
       ROUND(CAST(SUM(CAST(ROUND(o_totalprice * 1000000) AS BIGINT)) AS DOUBLE)
             / 1000000, 2) AS sum_value,
       MIN(o_totalprice) AS min_value,
       MAX(o_totalprice) AS max_value,
       ROUND(CAST(SUM(CAST(ROUND(o_totalprice * 1000000) AS BIGINT)) AS DOUBLE)
             / 1000000 / COUNT(*), 6) AS avg_value
FROM orders
GROUP BY o_orderstatus
"""

# Mirrors operators/pq.py at m=4, k=4, n_iter=1, dim=64 (d_sub=16): the
# per-subspace Lloyd step is q_kmeans's unrolled chain with `sub` added to
# every key; encode = argmin against the updated codebooks; ADC = LUT join.
ORACLES["q_pq_topk"] = """
WITH v AS (
  SELECT vec_id, CAST(pos AS BIGINT) AS pos,
         CAST(pos // 16 AS BIGINT) AS sub,
         CAST(pos % 16 AS BIGINT) AS spos,
         CAST(ROUND(CAST(xv AS DOUBLE) * 1000000) AS BIGINT) AS x
  FROM (SELECT vec_id,
               unnest(range(len(embedding))) AS pos,
               unnest(embedding) AS xv
        FROM embeddings)
),
init AS (
  SELECT vec_id,
         CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS BIGINT) AS cell
  FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 4
),
c0 AS (
  SELECT i.cell, v.sub, v.spos, v.x AS c FROM init i JOIN v USING (vec_id)
),
d0 AS (
  SELECT v.vec_id, v.sub, c.cell, SUM((v.x - c.c) * (v.x - c.c)) AS dist
  FROM v JOIN c0 c ON v.sub = c.sub AND v.spos = c.spos
  GROUP BY v.vec_id, v.sub, c.cell
),
a0 AS (
  SELECT vec_id, sub, cell FROM (
    SELECT vec_id, sub, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY dist, cell) AS rn
    FROM d0
  ) WHERE rn = 1
),
s0 AS (
  SELECT a.sub, a.cell, v.spos, CAST(SUM(v.x) AS BIGINT) AS s, COUNT(*) AS n
  FROM a0 a JOIN v ON a.vec_id = v.vec_id AND a.sub = v.sub
  GROUP BY a.sub, a.cell, v.spos
),
c1 AS (SELECT sub, cell, spos, CAST((s - s % n) / n AS BIGINT) AS c FROM s0),
de AS (
  SELECT v.vec_id, v.sub, c.cell, SUM((v.x - c.c) * (v.x - c.c)) AS dist
  FROM v JOIN c1 c ON v.sub = c.sub AND v.spos = c.spos
  GROUP BY v.vec_id, v.sub, c.cell
),
enc AS (
  SELECT vec_id, sub, cell AS code FROM (
    SELECT vec_id, sub, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY dist, cell) AS rn
    FROM de
  ) WHERE rn = 1
),
qv AS (SELECT sub, spos, x FROM v WHERE vec_id = 0),
lut AS (
  SELECT c.sub, c.cell, SUM((q.x - c.c) * (q.x - c.c)) AS d
  FROM c1 c JOIN qv q ON c.sub = q.sub AND c.spos = q.spos
  GROUP BY c.sub, c.cell
),
adist AS (
  SELECT e.vec_id, CAST(SUM(l.d) AS BIGINT) AS adc_dist
  FROM enc e JOIN lut l ON e.sub = l.sub AND e.code = l.cell
  GROUP BY e.vec_id
)
SELECT vec_id, adc_dist FROM adist ORDER BY adc_dist ASC, vec_id ASC LIMIT 20
"""
