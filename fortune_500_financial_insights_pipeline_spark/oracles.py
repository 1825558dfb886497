"""DuckDB oracle SQL, one entry per key in queries.QUERIES.

Column names/aliases match the Spark side exactly (the driver sorts columns
by name before hashing). Floating-point aggregates mirror the exact-decimal
interior (functions/deterministic.py) so values are bit-identical.
Integer aggregates are cast to BIGINT because DuckDB widens SUM(BIGINT) to
HUGEINT while Spark stays at long.
"""

from __future__ import annotations

DSUM = "(CAST(SUM(CAST(ROUND(({e}) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000)"


def _dsum(e: str) -> str:
    return DSUM.format(e=e)


ORACLES: dict[str, str] = {}

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
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
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
SELECT o_custkey AS c_custkey FROM orders
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

# SQL text surface: the Spark query and the oracle are the same statement
# (see sql_surface.py — dialect-shared subset, zero translation).
from fortune_500_financial_insights_pipeline_spark.sql_surface import SHARED_SQL as _SHARED_SQL

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

def _pagerank_oracle(iters: int = 10, d_num: int = 850, denom: int = 1000,
                     scale: int = 1_000_000_000) -> str:
    """The q_pagerank integer recurrence unrolled: fixed iteration count
    means the 'iterative' algorithm is just a deep CTE chain — DuckDB
    replays Spark's exact long arithmetic (// == Spark DIV on
    nonnegatives; the damping product is split to avoid overflow)."""
    teleport = (denom - d_num) * scale // denom
    parts = [f"""
WITH base AS (
  SELECT DISTINCT l_suppkey AS s, o_custkey + 1000000 AS c
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), edges AS (
  SELECT s AS src, c AS dst FROM base
  UNION
  SELECT c AS src, s AS dst FROM base
), nodes AS (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges
), deg AS (
  SELECT src, COUNT(*) AS out_deg FROM edges GROUP BY src
), r0 AS (
  SELECT node, CAST({scale} AS BIGINT) AS rank_fp FROM nodes
)"""]
    for k in range(1, iters + 1):
        parts.append(f""", r{k} AS (
  SELECT n.node,
         CAST({teleport}
              + (COALESCE(s.in_sum, 0) // {denom}) * {d_num}
              + ((COALESCE(s.in_sum, 0) % {denom}) * {d_num}) // {denom}
              AS BIGINT) AS rank_fp
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node,
           CAST(SUM(r.rank_fp // d.out_deg) AS BIGINT) AS in_sum
    FROM edges e
    JOIN r{k - 1} r ON e.src = r.node
    JOIN deg d ON d.src = e.src
    GROUP BY e.dst
  ) s ON n.node = s.node
)""")
    parts.append(f"\nSELECT node, rank_fp FROM r{iters}")
    return "".join(parts)


ORACLES["q_pagerank"] = _pagerank_oracle()


from fortune_500_financial_insights_pipeline_spark.operators.sampling import _hex_threshold

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

# IVF-PQ = q_ivf_topk's routing chain (coarse k=8, 2 Lloyd iterations,
# round-6 cosine routing, n_probe=2) feeding q_pq_topk's chain (m=4, k=4,
# 1 iteration, ADC LUT) restricted to the probed cells.
ORACLES["q_ivfpq_topk"] = """
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
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
),
route AS (
  SELECT e.vec_id, e.vec, c.cell,
         ROUND(list_dot_product(e.vec, c.cvec)
               / (sqrt(list_dot_product(e.vec, e.vec))
                  * sqrt(list_dot_product(c.cvec, c.cvec))), 6) AS csim
  FROM e CROSS JOIN cent c
),
assigned AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY csim DESC, cell ASC) AS rn
    FROM route) WHERE rn = 1
),
probes AS (
  SELECT cell FROM (
    SELECT cell, ROW_NUMBER() OVER (ORDER BY csim DESC, cell ASC) AS rn
    FROM route WHERE vec_id = 0) WHERE rn <= 2
),
pv AS (
  SELECT vec_id, CAST(pos // 16 AS BIGINT) AS sub,
         CAST(pos % 16 AS BIGINT) AS spos, x
  FROM v
),
pinit AS (
  SELECT vec_id,
         CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS BIGINT) AS cell
  FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 4
),
pc0 AS (
  SELECT i.cell, p.sub, p.spos, p.x AS c FROM pinit i JOIN pv p USING (vec_id)
),
pd0 AS (
  SELECT p.vec_id, p.sub, c.cell, SUM((p.x - c.c) * (p.x - c.c)) AS dist
  FROM pv p JOIN pc0 c ON p.sub = c.sub AND p.spos = c.spos
  GROUP BY p.vec_id, p.sub, c.cell
),
pa0 AS (
  SELECT vec_id, sub, cell FROM (
    SELECT vec_id, sub, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY dist, cell) AS rn
    FROM pd0
  ) WHERE rn = 1
),
ps0 AS (
  SELECT a.sub, a.cell, p.spos, CAST(SUM(p.x) AS BIGINT) AS s, COUNT(*) AS n
  FROM pa0 a JOIN pv p ON a.vec_id = p.vec_id AND a.sub = p.sub
  GROUP BY a.sub, a.cell, p.spos
),
pc1 AS (SELECT sub, cell, spos, CAST((s - s % n) / n AS BIGINT) AS c FROM ps0),
pde AS (
  SELECT p.vec_id, p.sub, c.cell, SUM((p.x - c.c) * (p.x - c.c)) AS dist
  FROM pv p JOIN pc1 c ON p.sub = c.sub AND p.spos = c.spos
  GROUP BY p.vec_id, p.sub, c.cell
),
penc AS (
  SELECT vec_id, sub, cell AS code FROM (
    SELECT vec_id, sub, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY dist, cell) AS rn
    FROM pde
  ) WHERE rn = 1
),
qv AS (SELECT sub, spos, x FROM pv WHERE vec_id = 0),
lut AS (
  SELECT c.sub, c.cell, SUM((q.x - c.c) * (q.x - c.c)) AS d
  FROM pc1 c JOIN qv q ON c.sub = q.sub AND c.spos = q.spos
  GROUP BY c.sub, c.cell
),
adist AS (
  SELECT pe.vec_id, CAST(SUM(l.d) AS BIGINT) AS adc_dist
  FROM penc pe
  JOIN assigned a ON pe.vec_id = a.vec_id
  JOIN probes pr ON a.cell = pr.cell
  JOIN lut l ON pe.sub = l.sub AND pe.code = l.cell
  GROUP BY pe.vec_id
)
SELECT vec_id, adc_dist FROM adist ORDER BY adc_dist ASC, vec_id ASC LIMIT 20
"""

# Residual IVF-PQ: q_ivfpq_topk's coarse chain, then the PQ chain over
# RESIDUALS (x - assigned coarse centroid, fixed point), and a per-probed-
# cell ADC LUT from the query's own residual.
ORACLES["q_ivfpq_residual_topk"] = """
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
c1f AS (SELECT cell, pos, CAST((s - s % n) / n AS BIGINT) AS c FROM s1),
cent AS (
  SELECT cell,
         list(CAST(c AS DOUBLE) / 1000000.0 ORDER BY pos) AS cvec
  FROM c1f GROUP BY cell
),
e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
),
route AS (
  SELECT e.vec_id, c.cell,
         ROUND(list_dot_product(e.vec, c.cvec)
               / (sqrt(list_dot_product(e.vec, e.vec))
                  * sqrt(list_dot_product(c.cvec, c.cvec))), 6) AS csim
  FROM e CROSS JOIN cent c
),
assigned AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY csim DESC, cell ASC) AS rn
    FROM route) WHERE rn = 1
),
probes AS (
  SELECT cell FROM (
    SELECT cell, ROW_NUMBER() OVER (ORDER BY csim DESC, cell ASC) AS rn
    FROM route WHERE vec_id = 0) WHERE rn <= 2
),
rv AS (
  SELECT v.vec_id, v.pos, v.x - cf.c AS x
  FROM v
  JOIN assigned a USING (vec_id)
  JOIN c1f cf ON cf.cell = a.cell AND cf.pos = v.pos
),
prv AS (
  SELECT vec_id, CAST(pos // 16 AS BIGINT) AS sub,
         CAST(pos % 16 AS BIGINT) AS spos, x
  FROM rv
),
pinit AS (
  SELECT vec_id,
         CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS BIGINT) AS cell
  FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 4
),
pc0 AS (
  SELECT i.cell, p.sub, p.spos, p.x AS c FROM pinit i JOIN prv p USING (vec_id)
),
pd0 AS (
  SELECT p.vec_id, p.sub, c.cell, SUM((p.x - c.c) * (p.x - c.c)) AS dist
  FROM prv p JOIN pc0 c ON p.sub = c.sub AND p.spos = c.spos
  GROUP BY p.vec_id, p.sub, c.cell
),
pa0 AS (
  SELECT vec_id, sub, cell FROM (
    SELECT vec_id, sub, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY dist, cell) AS rn
    FROM pd0
  ) WHERE rn = 1
),
ps0 AS (
  SELECT a.sub, a.cell, p.spos, CAST(SUM(p.x) AS BIGINT) AS s, COUNT(*) AS n
  FROM pa0 a JOIN prv p ON a.vec_id = p.vec_id AND a.sub = p.sub
  GROUP BY a.sub, a.cell, p.spos
),
pc1 AS (SELECT sub, cell, spos, CAST((s - s % n) / n AS BIGINT) AS c FROM ps0),
pde AS (
  SELECT p.vec_id, p.sub, c.cell, SUM((p.x - c.c) * (p.x - c.c)) AS dist
  FROM prv p JOIN pc1 c ON p.sub = c.sub AND p.spos = c.spos
  GROUP BY p.vec_id, p.sub, c.cell
),
penc AS (
  SELECT vec_id, sub, cell AS code FROM (
    SELECT vec_id, sub, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY dist, cell) AS rn
    FROM pde
  ) WHERE rn = 1
),
qres AS (
  SELECT pr.cell AS ccell, cf.pos, q.x - cf.c AS x
  FROM probes pr
  JOIN c1f cf ON cf.cell = pr.cell
  JOIN (SELECT pos, x FROM v WHERE vec_id = 0) q ON q.pos = cf.pos
),
qr AS (
  SELECT ccell, CAST(pos // 16 AS BIGINT) AS sub,
         CAST(pos % 16 AS BIGINT) AS spos, x
  FROM qres
),
lut AS (
  SELECT qr.ccell, c.sub, c.cell AS code,
         SUM((qr.x - c.c) * (qr.x - c.c)) AS d
  FROM qr JOIN pc1 c ON qr.sub = c.sub AND qr.spos = c.spos
  GROUP BY qr.ccell, c.sub, c.cell
),
adist AS (
  SELECT pe.vec_id, CAST(SUM(l.d) AS BIGINT) AS adc_dist
  FROM penc pe
  JOIN assigned a ON pe.vec_id = a.vec_id
  JOIN probes pr ON a.cell = pr.cell
  JOIN lut l ON l.ccell = a.cell AND pe.sub = l.sub AND pe.code = l.code
  GROUP BY pe.vec_id
)
SELECT vec_id, adc_dist FROM adist ORDER BY adc_dist ASC, vec_id ASC LIMIT 20
"""

# BPE training replayed relationally: per-iteration pair count, argmax
# (count DESC, lhs, rhs), leftmost-greedy merge via gaps-islands parity.
ORACLES["q_bpe_train"] = """
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
)
SELECT step, lhs, rhs, pair_count FROM (
  SELECT 1 AS step, lhs, rhs, CAST(c AS BIGINT) AS pair_count FROM b1
  UNION ALL SELECT 2, lhs, rhs, CAST(c AS BIGINT) FROM b2
  UNION ALL SELECT 3, lhs, rhs, CAST(c AS BIGINT) FROM b3
)
"""

ORACLES["q_bpe_segment"] = """
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
tok AS (SELECT word, UNNEST(s) AS token FROM v3),
docw AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS word
  FROM documents WHERE doc_id < 50
)
SELECT d.doc_id, t.token, COUNT(*) AS n
FROM (SELECT doc_id, word FROM docw WHERE word <> '') d
JOIN tok t ON d.word = t.word
GROUP BY d.doc_id, t.token
"""

# Shortlist-then-exact-rerank: the residual IVF-PQ chain's ADC top-50,
# reranked by exact round-6 cosine over raw vectors.
ORACLES["q_ivfpq_rerank"] = ORACLES["q_ivfpq_residual_topk"].replace(
    "SELECT vec_id, adc_dist FROM adist ORDER BY adc_dist ASC, vec_id ASC LIMIT 20",
    """
, short AS (
  SELECT vec_id FROM adist ORDER BY adc_dist ASC, vec_id ASC LIMIT 50
),
rer AS (
  SELECT e.vec_id,
         ROUND(list_dot_product(e.vec, q.vec)
               / (sqrt(list_dot_product(e.vec, e.vec))
                  * sqrt(list_dot_product(q.vec, q.vec))), 6) AS sim
  FROM e JOIN short USING (vec_id)
  CROSS JOIN (SELECT vec FROM e WHERE vec_id = 0) q
)
SELECT vec_id, sim FROM rer ORDER BY sim DESC, vec_id ASC LIMIT 20
""",
)

# MaxSim late interaction: query vectors are vec_id 0..3; doc = label.
ORACLES["q_late_interaction"] = """
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
),
q AS (SELECT vec_id AS qid, vec AS qv FROM e WHERE vec_id < 4),
grid AS (
  SELECT e.label, q.qid,
         ROUND(list_dot_product(e.vec, q.qv)
               / (sqrt(list_dot_product(e.vec, e.vec))
                  * sqrt(list_dot_product(q.qv, q.qv))), 6) AS sim
  FROM e CROSS JOIN q
),
ms AS (SELECT label, qid, MAX(sim) AS maxsim FROM grid GROUP BY label, qid),
sc AS (
  SELECT label,
         CAST(SUM(CAST(ROUND(maxsim * 1000000) AS BIGINT)) AS DOUBLE) / 1000000
           AS score
  FROM ms GROUP BY label
)
SELECT label, score FROM sc ORDER BY score DESC, label ASC LIMIT 5
"""

# Portable LSH near-dup: the 16x64 fixed-point plane table is generated from
# functions/planes.hyperplane_fixed (same ints the Spark operator embeds).
ORACLES["q_embed_neardup_portable"] = """
WITH u AS (
  SELECT vec_id, CAST(xv AS DOUBLE) AS xv, pos FROM (
    SELECT vec_id, unnest(range(len(embedding))) AS pos,
           unnest(embedding) AS xv
    FROM embeddings)
  UNION ALL
  SELECT vec_id + 100000, CAST(xv AS DOUBLE) * 1.02, pos FROM (
    SELECT vec_id, unnest(range(len(embedding))) AS pos,
           unnest(embedding) AS xv
    FROM embeddings WHERE vec_id < 50)
),
v AS (
  SELECT vec_id, CAST(pos AS BIGINT) AS pos,
         CAST(ROUND(xv * 1000000) AS BIGINT) AS x
  FROM u
),
pl(p, pos, c, w) AS (VALUES
  (0,0,-111575,1),
  (0,1,683743,1),
  (0,2,-259614,1),
  (0,3,-333670,1),
  (0,4,-407682,1),
  (0,5,387654,1),
  (0,6,-816951,1),
  (0,7,847723,1),
  (0,8,773783,1),
  (0,9,-430899,1),
  (0,10,-851773,1),
  (0,11,-925788,1),
  (0,12,-999803,1),
  (0,13,-204454,1),
  (0,14,590899,1),
  (0,15,778186,1),
  (0,16,376508,1),
  (0,17,782120,1),
  (0,18,228407,1),
  (0,19,634130,1),
  (0,20,80431,1),
  (0,21,486045,1),
  (0,22,-328866,1),
  (0,23,76821,1),
  (0,24,-738164,1),
  (0,25,-332506,1),
  (0,26,681294,1),
  (0,27,996988,1),
  (0,28,533318,1),
  (0,29,848883,1),
  (0,30,124017,1),
  (0,31,439668,1),
  (0,32,147157,1),
  (0,33,-492154,1),
  (0,34,89139,1),
  (0,35,-550171,1),
  (0,36,-148881,1),
  (0,37,-788204,1),
  (0,38,-468161,1),
  (0,39,892574,1),
  (0,40,-967446,1),
  (0,41,393197,1),
  (0,42,-502974,1),
  (0,43,767641,1),
  (0,44,-741003,1),
  (0,45,709689,1),
  (0,46,-342955,1),
  (0,47,-506963,1),
  (0,48,288350,1),
  (0,49,-303726,1),
  (0,50,577228,1),
  (0,51,-541790,1),
  (0,52,-791429,1),
  (0,53,-599799,1),
  (0,54,19953,1),
  (0,55,900924,1),
  (0,56,651297,1),
  (0,57,581645,1),
  (0,58,940090,1),
  (0,59,-178950,1),
  (0,60,-248553,1),
  (0,61,-236966,1),
  (0,62,382800,1),
  (0,63,-736252,1),
  (1,0,347592,2),
  (1,1,663262,2),
  (1,2,978943,2),
  (1,3,-705448,2),
  (1,4,-389776,2),
  (1,5,-686657,2),
  (1,6,674066,2),
  (1,7,34725,2),
  (1,8,-244585,2),
  (1,9,-883904,2),
  (1,10,476805,2),
  (1,11,-162542,2),
  (1,12,-801901,2),
  (1,13,-918724,2),
  (1,14,441916,2),
  (1,15,-557442,2),
  (1,16,803283,2),
  (1,17,163926,2),
  (1,18,807220,2),
  (1,19,733167,2),
  (1,20,-471418,2),
  (1,21,323946,2),
  (1,22,-272608,2),
  (1,23,-941547,2),
  (1,24,808813,2),
  (1,25,910439,2),
  (1,26,-469871,2),
  (1,27,501120,2),
  (1,28,251523,2),
  (1,29,-430641,2),
  (1,30,180252,2),
  (1,31,-938746,2),
  (1,32,901669,2),
  (1,33,913255,2),
  (1,34,-377029,2),
  (1,35,503950,2),
  (1,36,344258,2),
  (1,37,94618,2),
  (1,38,-51810,2),
  (1,39,-125807,2),
  (1,40,579480,2),
  (1,41,-363881,2),
  (1,42,-609127,2),
  (1,43,-683127,2),
  (1,44,22179,2),
  (1,45,-929976,2),
  (1,46,995995,2),
  (1,47,832019,2),
  (1,48,910018,2),
  (1,49,-508682,2),
  (1,50,851950,2),
  (1,51,991945,2),
  (1,52,352699,2),
  (1,53,-967208,2),
  (1,54,393481,2),
  (1,55,-682744,2),
  (1,56,-367079,2),
  (1,57,-740780,2),
  (1,58,-425092,2),
  (1,59,759905,2),
  (1,60,-924411,2),
  (1,61,-441920,2),
  (1,62,-126233,2),
  (1,63,-679959,2),
  (2,0,18594,4),
  (2,1,899597,4),
  (2,2,649848,4),
  (2,3,661441,4),
  (2,4,-457549,4),
  (2,5,423407,4),
  (2,6,173827,4),
  (2,7,-75847,4),
  (2,8,543850,4),
  (2,9,-575155,4),
  (2,10,-824811,4),
  (2,11,-615595,4),
  (2,12,-689617,4),
  (2,13,516272,4),
  (2,14,31703,4),
  (2,15,106938,4),
  (2,16,-985675,4),
  (2,17,220157,4),
  (2,18,-264314,4),
  (2,19,72189,4),
  (2,20,-564403,4),
  (2,21,76125,4),
  (2,22,156968,4),
  (2,23,797532,4),
  (2,24,617043,4),
  (2,25,-742425,4),
  (2,26,-661633,4),
  (2,27,699082,4),
  (2,28,-921660,4),
  (2,29,204102,4),
  (2,30,-200342,4),
  (2,31,925537,4),
  (2,32,-172708,4),
  (2,33,863068,4),
  (2,34,548608,4),
  (2,35,-415609,4),
  (2,36,-468800,4),
  (2,37,566979,4),
  (2,38,252518,4),
  (2,39,-711656,4),
  (2,40,712594,4),
  (2,41,-251562,4),
  (2,42,154070,4),
  (2,43,-250342,4),
  (2,44,-430798,4),
  (2,45,209766,4),
  (2,46,380521,4),
  (2,47,-978908,4),
  (2,48,-726875,4),
  (2,49,3715,4),
  (2,50,-67546,4),
  (2,51,-82307,4),
  (2,52,-566853,4),
  (2,53,990255,4),
  (2,54,-363636,4),
  (2,55,-378417,4),
  (2,56,875828,4),
  (2,57,891810,4),
  (2,58,97714,4),
  (2,59,-476838,4),
  (2,60,-401628,4),
  (2,61,-881743,4),
  (2,62,-720876,4),
  (2,63,-250401,4),
  (3,0,734592,8),
  (3,1,279697,8),
  (3,2,-124763,8),
  (3,3,996607,8),
  (3,4,592115,8),
  (3,5,758577,8),
  (3,6,354089,8),
  (3,7,259246,8),
  (3,8,214897,8),
  (3,9,642574,8),
  (3,10,238051,8),
  (3,11,-118031,8),
  (3,12,-522462,8),
  (3,13,-356050,8),
  (3,14,-760526,8),
  (3,15,-855364,8),
  (3,16,-179641,8),
  (3,17,375245,8),
  (3,18,456109,8),
  (3,19,227283,8),
  (3,20,308003,8),
  (3,21,79191,8),
  (3,22,-557336,8),
  (3,23,27189,8),
  (3,24,673303,8),
  (3,25,748579,8),
  (3,26,786517,8),
  (3,27,-530097,8),
  (3,28,115973,8),
  (3,29,191273,8),
  (3,30,-32026,8),
  (3,31,-7255,8),
  (3,32,-801370,8),
  (3,33,714055,8),
  (3,34,789330,8),
  (3,35,-564547,8),
  (3,36,-313668,8),
  (3,37,156747,8),
  (3,38,-821784,8),
  (3,39,518016,8),
  (3,40,768973,8),
  (3,41,-760590,8),
  (3,42,882188,8),
  (3,43,-39266,8),
  (3,44,211641,8),
  (3,45,682103,8),
  (3,46,-856244,8),
  (3,47,-956633,8),
  (3,48,734466,8),
  (3,49,-235317,8),
  (3,50,-629798,8),
  (3,51,486076,8),
  (3,52,-715830,8),
  (3,53,-345325,8),
  (3,54,-264505,8),
  (3,55,286050,8),
  (3,56,366761,8),
  (3,57,-902631,8),
  (3,58,-821838,8),
  (3,59,-271319,8),
  (3,60,-190496,8),
  (3,61,-379790,8),
  (3,62,260755,8),
  (3,63,251575,8),
  (4,0,-463806,16),
  (4,1,-478551,16),
  (4,2,-701831,16),
  (4,3,152726,16),
  (4,4,798854,16),
  (4,5,224354,16),
  (4,6,-745438,16),
  (4,7,855598,16),
  (4,8,-983495,16),
  (4,9,-513021,16),
  (4,10,778495,16),
  (4,11,118330,16),
  (4,12,279119,16),
  (4,13,749573,16),
  (4,14,302323,16),
  (4,15,-619037,16),
  (4,16,-458207,16),
  (4,17,12308,16),
  (4,18,-696230,16),
  (4,19,643561,16),
  (4,20,244721,16),
  (4,21,-725080,16),
  (4,22,-254590,16),
  (4,23,-633824,16),
  (4,24,-550269,16),
  (4,25,810391,16),
  (4,26,-138532,16),
  (4,27,-777877,16),
  (4,28,892438,16),
  (4,29,253104,16),
  (4,30,-434621,16),
  (4,31,926051,16),
  (4,32,335117,16),
  (4,33,-304259,16),
  (4,34,746777,16),
  (4,35,-452286,16),
  (4,36,-222205,16),
  (4,37,-301807,16),
  (4,38,973214,16),
  (4,39,-225858,16),
  (4,40,265499,16),
  (4,41,-859108,16),
  (4,42,677234,16),
  (4,43,433072,16),
  (4,44,-291844,16),
  (4,45,583617,16),
  (4,46,381159,16),
  (4,47,136989,16),
  (4,48,-849180,16),
  (4,49,26281,16),
  (4,50,-997210,16),
  (4,51,-681541,16),
  (4,52,-846728,16),
  (4,53,-531079,16),
  (4,54,901598,16),
  (4,55,-127471,16),
  (4,56,182634,16),
  (4,57,284246,16),
  (4,58,-349515,16),
  (4,59,-513526,16),
  (4,60,841571,16),
  (4,61,-273023,16),
  (4,62,-645555,16),
  (4,63,-809597,16),
  (5,0,697919,32),
  (5,1,589885,32),
  (5,2,510256,32),
  (5,3,-219035,32),
  (5,4,581882,32),
  (5,5,-408745,32),
  (5,6,-488283,32),
  (5,7,782395,32),
  (5,8,-416719,32),
  (5,9,557544,32),
  (5,10,-171868,32),
  (5,11,629049,32),
  (5,12,-100310,32),
  (5,13,-963607,32),
  (5,14,-647936,32),
  (5,15,-892041,32),
  (5,16,-216328,32),
  (5,17,920405,32),
  (5,18,-763981,32),
  (5,19,991907,32),
  (5,20,-692425,32),
  (5,21,-78218,32),
  (5,22,237381,32),
  (5,23,-6655,32),
  (5,24,-771201,32),
  (5,25,-716792,32),
  (5,26,321735,32),
  (5,27,-797252,32),
  (5,28,-487125,32),
  (5,29,-736798,32),
  (5,30,-839278,32),
  (5,31,726665,32),
  (5,32,81739,32),
  (5,33,-861624,32),
  (5,34,504615,32),
  (5,35,430548,32),
  (5,36,-214318,32),
  (5,37,581106,32),
  (5,38,-313984,32),
  (5,39,531819,32),
  (5,40,-672817,32),
  (5,41,346501,32),
  (5,42,272564,32),
  (5,43,758265,32),
  (5,44,-446354,32),
  (5,45,-210769,32),
  (5,46,-383584,32),
  (5,47,-942863,32),
  (5,48,897477,32),
  (5,49,349316,32),
  (5,50,-679658,32),
  (5,51,761079,32),
  (5,52,601387,32),
  (5,53,-208001,32),
  (5,54,-578427,32),
  (5,55,302583,32),
  (5,56,865807,32),
  (5,57,-120371,32),
  (5,58,755021,32),
  (5,59,291369,32),
  (5,60,47276,32),
  (5,61,962261,32),
  (5,62,-162340,32),
  (5,63,-454778,32),
  (6,0,72454,64),
  (6,1,863423,64),
  (6,2,54065,64),
  (6,3,326848,64),
  (6,4,812675,64),
  (6,5,648584,64),
  (6,6,884178,64),
  (6,7,-149219,64),
  (6,8,75315,64),
  (6,9,-88773,64),
  (6,10,146814,64),
  (6,11,852211,64),
  (6,12,490580,64),
  (6,13,-143229,64),
  (6,14,562094,64),
  (6,15,178505,64),
  (6,16,-246811,64),
  (6,17,-880582,64),
  (6,18,-175251,64),
  (6,19,657388,64),
  (6,20,-461663,64),
  (6,21,-140413,64),
  (6,22,-390100,64),
  (6,23,181306,64),
  (6,24,800981,64),
  (6,25,-877781,64),
  (6,26,872616,64),
  (6,27,-817317,64),
  (6,28,418875,64),
  (6,29,734535,64),
  (6,30,-390048,64),
  (6,31,-74373,64),
  (6,32,-318489,64),
  (6,33,-2810,64),
  (6,34,872584,64),
  (6,35,-811749,64),
  (6,36,871742,64),
  (6,37,-487710,64),
  (6,38,152800,64),
  (6,39,793357,64),
  (6,40,314429,64),
  (6,41,955016,64),
  (6,42,-404510,64),
  (6,43,396389,64),
  (6,44,-440546,64),
  (6,45,200056,64),
  (6,46,840519,64),
  (6,47,361624,64),
  (6,48,-997848,64),
  (6,49,-357277,64),
  (6,50,283232,64),
  (6,51,-195728,64),
  (6,52,967294,64),
  (6,53,562925,64),
  (6,54,248469,64),
  (6,55,724448,64),
  (6,56,409975,64),
  (6,57,5593,64),
  (6,58,-300544,64),
  (6,59,729726,64),
  (6,60,-672585,64),
  (6,61,-421720,64),
  (6,62,619577,64),
  (6,63,-260111,64),
  (7,0,871396,128),
  (7,1,179970,128),
  (7,2,-224488,128),
  (7,3,591626,128),
  (7,4,-932306,128),
  (7,5,-557417,128),
  (7,6,-961860,128),
  (7,7,-406943,128),
  (7,8,69125,128),
  (7,9,-412172,128),
  (7,10,228387,128),
  (7,11,-90464,128),
  (7,12,-569454,128),
  (7,13,850408,128),
  (7,14,-508974,128),
  (7,15,-566560,128),
  (7,16,504335,128),
  (7,17,275536,128),
  (7,18,826060,128),
  (7,19,-522256,128),
  (7,20,28314,128),
  (7,21,-461774,128),
  (7,22,88776,128),
  (7,23,479182,128),
  (7,24,-610245,128),
  (7,25,638367,128),
  (7,26,233988,128),
  (7,27,-159420,128),
  (7,28,-563853,128),
  (7,29,-98911,128),
  (7,30,-503373,128),
  (7,31,676797,128),
  (7,32,837591,128),
  (7,33,-132130,128),
  (7,34,39802,128),
  (7,35,200718,128),
  (7,36,361525,128),
  (7,37,-608226,128),
  (7,38,-697524,128),
  (7,39,-437837,128),
  (7,40,-276984,128),
  (7,41,753291,128),
  (7,42,222690,128),
  (7,43,-571487,128),
  (7,44,634341,128),
  (7,45,709612,128),
  (7,46,-334678,128),
  (7,47,772346,128),
  (7,48,-21752,128),
  (7,49,934002,128),
  (7,50,-729525,128),
  (7,51,476351,128),
  (7,52,-317782,128),
  (7,53,637898,128),
  (7,54,353129,128),
  (7,55,-702288,128),
  (7,56,503583,128),
  (7,57,-540715,128),
  (7,58,318250,128),
  (7,59,479165,128),
  (7,60,730025,128),
  (7,61,-641938,128),
  (7,62,683564,128),
  (7,63,-414660,128),
  (8,0,201002,256),
  (8,1,-203403,256),
  (8,2,518334,256),
  (8,3,367013,256),
  (8,4,527941,256),
  (8,5,-531878,256),
  (8,6,-621171,256),
  (8,7,-109054,256),
  (8,8,51768,256),
  (8,9,992054,256),
  (8,10,641420,256),
  (8,11,892391,256),
  (8,12,-946802,256),
  (8,13,-6569,256),
  (8,14,-95860,256),
  (8,15,848712,256),
  (8,16,54569,256),
  (8,17,39852,256),
  (8,18,-833225,256),
  (8,19,372675,256),
  (8,20,-511513,256),
  (8,21,444182,256),
  (8,22,429389,256),
  (8,23,-103479,256),
  (8,24,-987609,256),
  (8,25,-31914,256),
  (8,26,-307942,256),
  (8,27,897898,256),
  (8,28,13760,256),
  (8,29,969523,256),
  (8,30,954759,256),
  (8,31,-100663,256),
  (8,32,60227,256),
  (8,33,-746433,256),
  (8,34,934726,256),
  (8,35,530220,256),
  (8,36,136944,256),
  (8,37,-267527,256),
  (8,38,197349,256),
  (8,39,-207075,256),
  (8,40,-339198,256),
  (8,41,-743649,256),
  (8,42,-539965,256),
  (8,43,-944431,256),
  (8,44,662194,256),
  (8,45,257796,256),
  (8,46,722689,256),
  (8,47,318181,256),
  (8,48,293756,256),
  (8,49,-345632,256),
  (8,50,145657,256),
  (8,51,625900,256),
  (8,52,-882821,256),
  (8,53,477888,256),
  (8,54,707935,256),
  (8,55,948976,256),
  (8,56,-298408,256),
  (8,57,-937747,256),
  (8,58,-968955,256),
  (8,59,-488742,256),
  (8,60,2508,256),
  (8,61,-636781,256),
  (8,62,-406764,256),
  (8,63,-882950,256),
  (9,0,-135611,512),
  (9,1,648638,512),
  (9,2,754677,512),
  (9,3,-449957,512),
  (9,4,-609612,512),
  (9,5,734170,512),
  (9,6,-950175,512),
  (9,7,-544507,512),
  (9,8,-228843,512),
  (9,9,-523594,512),
  (9,10,-207930,512),
  (9,11,197714,512),
  (9,12,-606113,512),
  (9,13,-380491,512),
  (9,14,-64793,512),
  (9,15,340827,512),
  (9,16,-223954,512),
  (9,17,361799,512),
  (9,18,677383,512),
  (9,19,-916900,512),
  (9,20,279277,512),
  (9,21,-450122,512),
  (9,22,820509,512),
  (9,23,181244,512),
  (9,24,931518,512),
  (9,25,292168,512),
  (9,26,-437196,512),
  (9,27,-196048,512),
  (9,28,-925413,512),
  (9,29,435275,512),
  (9,30,-294067,512),
  (9,31,186136,512),
  (9,32,-183183,512),
  (9,33,-822503,512),
  (9,34,448169,512),
  (9,35,537276,512),
  (9,36,-757398,512),
  (9,37,992947,512),
  (9,38,-126093,512),
  (9,39,234465,512),
  (9,40,-15145,512),
  (9,41,-3554,512),
  (9,42,-503370,512),
  (9,43,377590,512),
  (9,44,127932,512),
  (9,45,400862,512),
  (9,46,-121162,512),
  (9,47,-880142,512),
  (9,48,870210,512),
  (9,49,881802,512),
  (9,50,381961,512),
  (9,51,-737029,512),
  (9,52,-986671,512),
  (9,53,763732,512),
  (9,54,-875763,512),
  (9,55,-949777,512),
  (9,56,-154393,512),
  (9,57,-217328,512),
  (9,58,-552603,512),
  (9,59,-626632,512),
  (9,60,168707,512),
  (9,61,606107,512),
  (9,62,-350446,512),
  (9,63,-424490,512),
  (10,0,722010,1024),
  (10,1,82666,1024),
  (10,2,-128515,1024),
  (10,3,351638,1024),
  (10,4,842900,1024),
  (10,5,203653,1024),
  (10,6,253602,1024),
  (10,7,-222538,1024),
  (10,8,487141,1024),
  (10,9,233107,1024),
  (10,10,-971511,1024),
  (10,11,-795377,1024),
  (10,12,85630,1024),
  (10,13,-403303,1024),
  (10,14,227535,1024),
  (10,15,67840,1024),
  (10,16,-789909,1024),
  (10,17,1088,1024),
  (10,18,870944,1024),
  (10,19,450022,1024),
  (10,20,-668987,1024),
  (10,21,121954,1024),
  (10,22,752754,1024),
  (10,23,593158,1024),
  (10,24,-877119,1024),
  (10,25,3888,1024),
  (10,26,963804,1024),
  (10,27,-69654,1024),
  (10,28,486394,1024),
  (10,29,-707123,1024),
  (10,30,-1799,1024),
  (10,31,793638,1024),
  (10,32,890750,1024),
  (10,33,-63664,1024),
  (10,34,641610,1024),
  (10,35,-824238,1024),
  (10,36,-988267,1024),
  (10,37,-29760,1024),
  (10,38,-759118,1024),
  (10,39,601529,1024),
  (10,40,655999,1024),
  (10,41,-953860,1024),
  (10,42,406837,1024),
  (10,43,397626,1024),
  (10,44,-145037,1024),
  (10,45,170608,1024),
  (10,46,486314,1024),
  (10,47,801981,1024),
  (10,48,498379,1024),
  (10,49,814043,1024),
  (10,50,-870276,1024),
  (10,51,-554597,1024),
  (10,52,380301,1024),
  (10,53,695978,1024),
  (10,54,-988400,1024),
  (10,55,-672743,1024),
  (10,56,501186,1024),
  (10,57,816870,1024),
  (10,58,-147350,1024),
  (10,59,-951218,1024),
  (10,60,995558,1024),
  (10,61,-923621,1024),
  (10,62,-283058,1024),
  (10,63,917284,1024),
  (11,0,-183356,2048),
  (11,1,-977512,2048),
  (11,2,878306,2048),
  (11,3,655034,2048),
  (11,4,-139051,2048),
  (11,5,-373420,2048),
  (11,6,-478237,2048),
  (11,7,-962747,2048),
  (11,8,-18153,2048),
  (11,9,225822,2048),
  (11,10,-953634,2048),
  (11,11,780324,2048),
  (11,12,-579175,2048),
  (11,13,-428238,2048),
  (11,14,212329,2048),
  (11,15,-837533,2048),
  (11,16,-196961,2048),
  (11,17,-383915,2048),
  (11,18,651798,2048),
  (11,19,-531981,2048),
  (11,20,-376671,2048),
  (11,21,259473,2048),
  (11,22,-704715,2048),
  (11,23,-149799,2048),
  (11,24,-233542,2048),
  (11,25,501444,2048),
  (11,26,-462776,2048),
  (11,27,-169115,2048),
  (11,28,-103797,2048),
  (11,29,622339,2048),
  (11,30,-251836,2048),
  (11,31,213041,2048),
  (11,32,-320770,2048),
  (11,33,-848079,2048),
  (11,34,-297525,2048),
  (11,35,33425,2048),
  (11,36,583980,2048),
  (11,37,-204677,2048),
  (11,38,345847,2048),
  (11,39,893920,2048),
  (11,40,369809,2048),
  (11,41,-114770,2048),
  (11,42,-129532,2048),
  (11,43,68561,2048),
  (11,44,-725553,2048),
  (11,45,699933,2048),
  (11,46,-963594,2048),
  (11,47,-148320,2048),
  (11,48,497803,2048),
  (11,49,483007,2048),
  (11,50,595494,2048),
  (11,51,756300,2048),
  (11,52,357453,2048),
  (11,53,-612348,2048),
  (11,54,999838,2048),
  (11,55,-740471,2048),
  (11,56,860641,2048),
  (11,57,-109141,2048),
  (11,58,-519157,2048),
  (11,59,-880804,2048),
  (11,60,720330,2048),
  (11,61,-249455,2048),
  (11,62,-997344,2048),
  (11,63,342519,2048),
  (12,0,571098,4096),
  (12,1,166621,4096),
  (12,2,-617591,4096),
  (12,3,977922,4096),
  (12,4,894186,4096),
  (12,5,489789,4096),
  (12,6,-132016,4096),
  (12,7,-931682,4096),
  (12,8,-291108,4096),
  (12,9,-210347,4096),
  (12,10,250145,4096),
  (12,11,494135,4096),
  (12,12,-300025,4096),
  (12,13,-784557,4096),
  (12,14,-366834,4096),
  (12,15,-601220,4096),
  (12,16,604630,4096),
  (12,17,-59877,4096),
  (12,18,276562,4096),
  (12,19,-458078,4096),
  (12,20,747764,4096),
  (12,21,83252,4096),
  (12,22,718234,4096),
  (12,23,446554,4096),
  (12,24,47716,4096),
  (12,25,987868,4096),
  (12,26,600051,4096),
  (12,27,589671,4096),
  (12,28,190837,4096),
  (12,29,-868978,4096),
  (12,30,288569,4096),
  (12,31,449369,4096),
  (12,32,-39541,4096),
  (12,33,990684,4096),
  (12,34,692887,4096),
  (12,35,592471,4096),
  (12,36,103625,4096),
  (12,37,-306421,4096),
  (12,38,813795,4096),
  (12,39,-107547,4096),
  (12,40,-991724,4096),
  (12,41,686832,4096),
  (12,42,368082,4096),
  (12,43,448797,4096),
  (12,44,-131230,4096),
  (12,45,-930942,4096),
  (12,46,-988526,4096),
  (12,47,-997752,4096),
  (12,48,773389,4096),
  (12,49,-355347,4096),
  (12,50,-584139,4096),
  (12,51,-593378,4096),
  (12,52,-523693,4096),
  (12,53,26820,4096),
  (12,54,977027,4096),
  (12,55,-472464,4096),
  (12,56,-903062,4096),
  (12,57,692463,4096),
  (12,58,858943,4096),
  (12,59,454457,4096),
  (12,60,-520877,4096),
  (12,61,-925339,4096),
  (12,62,457286,4096),
  (12,63,52826,4096),
  (13,0,440842,8192),
  (13,1,538059,8192),
  (13,2,158849,8192),
  (13,3,-90833,8192),
  (13,4,480484,8192),
  (13,5,-638501,8192),
  (13,6,743177,8192),
  (13,7,493536,8192),
  (13,8,803676,8192),
  (13,9,-576588,8192),
  (13,10,-955823,8192),
  (13,11,-645721,8192),
  (13,12,-21593,8192),
  (13,13,942502,8192),
  (13,14,123056,8192),
  (13,15,43552,8192),
  (13,16,-595798,8192),
  (13,17,-234071,8192),
  (13,18,-873427,8192),
  (13,19,-952991,8192),
  (13,20,407706,8192),
  (13,21,170257,8192),
  (13,22,-469032,8192),
  (13,23,-548600,8192),
  (13,24,812033,8192),
  (13,25,651288,8192),
  (13,26,571659,8192),
  (13,27,-67655,8192),
  (13,28,-386233,8192),
  (13,29,-421865,8192),
  (13,30,453607,8192),
  (13,31,859196,8192),
  (13,32,-265341,8192),
  (13,33,-463353,8192),
  (13,34,502026,8192),
  (13,35,817699,8192),
  (13,36,-635901,8192),
  (13,37,-59018,8192),
  (13,38,906476,8192),
  (13,39,-777890,8192),
  (13,40,367606,8192),
  (13,41,981805,8192),
  (13,42,-612577,8192),
  (13,43,-128219,8192),
  (13,44,-467874,8192),
  (13,45,-157751,8192),
  (13,46,-493059,8192),
  (13,47,-7321,8192),
  (13,48,-941896,8192),
  (13,49,584419,8192),
  (13,50,510492,8192),
  (13,51,667175,8192),
  (13,52,-537510,8192),
  (13,53,727544,8192),
  (13,54,914827,8192),
  (13,55,-329405,8192),
  (13,56,-974265,8192),
  (13,57,-530172,8192),
  (13,58,-283495,8192),
  (13,59,-447531,8192),
  (13,60,907642,8192),
  (13,61,-387032,8192),
  (13,62,-162551,8192),
  (13,63,-921523,8192),
  (14,0,558707,16384),
  (14,1,-170662,16384),
  (14,2,619083,16384),
  (14,3,-885184,16384),
  (14,4,75835,16384),
  (14,5,391506,16384),
  (14,6,217578,16384),
  (14,7,533258,16384),
  (14,8,38989,16384),
  (14,9,354657,16384),
  (14,10,801994,16384),
  (14,11,-882384,16384),
  (14,12,601154,16384),
  (14,13,916849,16384),
  (14,14,-537020,16384),
  (14,15,-618005,16384),
  (14,16,1754,16384),
  (14,17,-557528,16384),
  (14,18,-627164,16384),
  (14,19,-407045,16384),
  (14,20,-481061,16384),
  (14,21,-175384,16384),
  (14,22,620042,16384),
  (14,23,-2658,16384),
  (14,24,-337931,16384),
  (14,25,-32248,16384),
  (14,26,763176,16384),
  (14,27,640797,16384),
  (14,28,44195,16384),
  (14,29,-929936,16384),
  (14,30,186103,16384),
  (14,31,-757257,16384),
  (14,32,-532769,16384),
  (14,33,-786819,16384),
  (14,34,568355,16384),
  (14,35,408632,16384),
  (14,36,714376,16384),
  (14,37,-404649,16384),
  (14,38,-243537,16384),
  (14,39,-231935,16384),
  (14,40,857509,16384),
  (14,41,-261524,16384),
  (14,42,138645,16384),
  (14,43,411452,16384),
  (14,44,-40165,16384),
  (14,45,-686463,16384),
  (14,46,-280811,16384),
  (14,47,594649,16384),
  (14,48,820289,16384),
  (14,49,-304311,16384),
  (14,50,101417,16384),
  (14,51,976864,16384),
  (14,52,247492,16384),
  (14,53,-161190,16384),
  (14,54,-800505,16384),
  (14,55,-970081,16384),
  (14,56,390617,16384),
  (14,57,221046,16384),
  (14,58,-418308,16384),
  (14,59,132243,16384),
  (14,60,-186425,16384),
  (14,61,-915746,16384),
  (14,62,-995315,16384),
  (14,63,275365,16384),
  (15,0,-625591,32768),
  (15,1,490244,32768),
  (15,2,565523,32768),
  (15,3,32874,32768),
  (15,4,977440,32768),
  (15,5,93273,32768),
  (15,6,168573,32768),
  (15,7,-621190,32768),
  (15,8,494678,32768),
  (15,9,655465,32768),
  (15,10,-373267,32768),
  (15,11,918157,32768),
  (15,12,817866,32768),
  (15,13,978667,32768),
  (15,14,188962,32768),
  (15,15,-258350,32768),
  (15,16,-619992,32768),
  (15,17,-459107,32768),
  (15,18,-925379,32768),
  (15,19,-199198,32768),
  (15,20,-603659,32768),
  (15,21,-138749,32768),
  (15,22,-363188,32768),
  (15,23,101777,32768),
  (15,24,-302724,32768),
  (15,25,364400,32768),
  (15,26,-995008,32768),
  (15,27,776132,32768),
  (15,28,-583273,32768),
  (15,29,746599,32768),
  (15,30,-612833,32768),
  (15,31,-580410,32768),
  (15,32,60123,32768),
  (15,33,529700,32768),
  (15,34,-829761,32768),
  (15,35,941458,32768),
  (15,36,-418052,32768),
  (15,37,911804,32768),
  (15,38,-447600,32768),
  (15,39,107317,32768),
  (15,40,688863,32768),
  (15,41,-584950,32768),
  (15,42,-899391,32768),
  (15,43,-173245,32768),
  (15,44,-667684,32768),
  (15,45,-202767,32768),
  (15,46,-517223,32768),
  (15,47,470177,32768),
  (15,48,659268,32768),
  (15,49,-310505,32768),
  (15,50,548491,32768),
  (15,51,709407,32768),
  (15,52,780154,32768),
  (15,53,-189552,32768),
  (15,54,930703,32768),
  (15,55,861318,32768),
  (15,56,-977861,32768),
  (15,57,142350,32768),
  (15,58,388896,32768),
  (15,59,-495273,32768),
  (15,60,710621,32768),
  (15,61,695749,32768),
  (15,62,771016,32768),
  (15,63,-450985,32768)
),
dp AS (
  SELECT v.vec_id, pl.p, MAX(pl.w) AS w, SUM(v.x * pl.c) AS s
  FROM v JOIN pl ON v.pos = pl.pos
  GROUP BY v.vec_id, pl.p
),
sig AS (
  SELECT vec_id,
         CAST(SUM(CASE WHEN s >= 0 THEN w ELSE 0 END) AS BIGINT) AS sig
  FROM dp GROUP BY vec_id
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM sig a JOIN sig b ON a.sig = b.sig AND a.vec_id < b.vec_id
),
n2 AS (SELECT vec_id, SUM(x * x) AS n2 FROM v GROUP BY vec_id),
dots AS (
  SELECT p.id_a, p.id_b, SUM(va.x * vb.x) AS d
  FROM pairs p
  JOIN v va ON va.vec_id = p.id_a
  JOIN v vb ON vb.vec_id = p.id_b AND vb.pos = va.pos
  GROUP BY p.id_a, p.id_b
)
SELECT d.id_a, d.id_b,
       ROUND(CAST(d.d AS DOUBLE)
             / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))),
             6) AS cosine
FROM dots d
JOIN n2 na ON na.vec_id = d.id_a
JOIN n2 nb ON nb.vec_id = d.id_b
WHERE ROUND(CAST(d.d AS DOUBLE)
            / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))),
            6) >= 0.9
"""

# Portable MinHash+LSH replayed relationally: trigram shingles, md5 double
# hashing (u1 + i*u2 mod 2^60), per-seed mins, 4-band keys, bucket pairs,
# exact-set Jaccard verify. Mirrors operators/minhash.py portable form.
ORACLES["q_minhash_portable"] = """
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
SELECT id_a, id_b, jac FROM (
  SELECT c.id_a, c.id_b,
         ROUND(CAST(COALESCE(i.ninter, 0) AS DOUBLE)
               / (sa.n + sb.n - COALESCE(i.ninter, 0)), 6) AS jac
  FROM cand c
  JOIN sizes sa ON sa.doc_id = c.id_a
  JOIN sizes sb ON sb.doc_id = c.id_b
  LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
)
WHERE jac >= 0.2
"""


ORACLES["q_phrase_search"] = """
WITH toks AS (
  SELECT doc_id, i - 1 AS pos, l[i] AS term
  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l))) AS i
        FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents))
  WHERE l[i] <> ''
), phrases(phrase_id, phrase) AS (
  VALUES (1, 'table part'),
         (2, 'scan stream fast'),
         (3, 'window window'),
         (4, 'big table table'),
         (5, 'spark zzznosuchterm')
), pt AS (
  SELECT phrase_id, i - 1 AS off, p[i] AS term, len(p) AS n_terms
  FROM (SELECT phrase_id, p, unnest(generate_series(1, len(p))) AS i
        FROM (SELECT phrase_id, string_split(phrase, ' ') AS p FROM phrases))
  WHERE p[i] <> ''
), occ AS (
  SELECT p.phrase_id, t.doc_id, t.pos - p.off AS start,
         COUNT(DISTINCT p.off) AS matched, MAX(p.n_terms) AS n_terms
  FROM toks t JOIN pt p ON t.term = p.term
  GROUP BY p.phrase_id, t.doc_id, t.pos - p.off
)
SELECT CAST(phrase_id AS INTEGER) AS phrase_id, doc_id,
       COUNT(*) AS n_hits, CAST(MIN(start) AS INTEGER) AS first_pos
FROM occ
WHERE matched = n_terms AND start >= 0
GROUP BY phrase_id, doc_id
"""

# Lexical leg mirrors ORACLES["q_bm25_search"] verbatim (same BM25
# constants and fixed-point total), with the query list drawn from the
# three query documents' own text; dense leg mirrors ORACLES["q_knn_join"]
# restricted to the same query ids at k=20. Fusion is the fixed-order
# two-term RRF expression rrf_fuse builds.
ORACLES["q_rrf_fusion"] = """
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
), lex AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT query_id, doc_id, ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY total_score DESC, doc_id ASC
           ) AS rank
    FROM totals
  ) WHERE rank <= 20 AND doc_id <> query_id
), qv AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id IN (0, 7, 42)
), sims AS (
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
    FROM sims
  ) WHERE rank <= 20
), legs AS (
  SELECT query_id, doc_id, rank, 0 AS leg FROM lex
  UNION ALL
  SELECT query_id, doc_id, rank, 1 AS leg FROM dense
), fused AS (
  SELECT query_id, doc_id,
         MIN(CASE WHEN leg = 0 THEN rank END) AS r0,
         MIN(CASE WHEN leg = 1 THEN rank END) AS r1
  FROM legs GROUP BY query_id, doc_id
), rrfed AS (
  SELECT query_id, doc_id,
         CAST(r0 AS INTEGER) AS rank_0, CAST(r1 AS INTEGER) AS rank_1,
         ROUND(COALESCE(CAST(1 AS DOUBLE) / (60 + r0), CAST(0 AS DOUBLE))
               + COALESCE(CAST(1 AS DOUBLE) / (60 + r1), CAST(0 AS DOUBLE)),
               9) AS rrf
  FROM fused
)
SELECT query_id, doc_id, rank_0, rank_1, rrf, CAST(rank AS INTEGER) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY rrf DESC, doc_id ASC
         ) AS rank
  FROM rrfed
)
WHERE rank <= 10
"""


ORACLES["q_winnow"] = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
grams AS (
  SELECT doc_id, i - 1 AS pos,
         ('0x' || substr(md5(l[i]||' '||l[i+1]||' '||l[i+2]||' '||l[i+3]),
                         1, 15))::BIGINT AS h,
         len(l) - 3 AS n_grams
  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l) - 3)) AS i
        FROM toks WHERE len(l) >= 4)
), starts AS (
  SELECT doc_id, pos AS s,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
  FROM grams
  QUALIFY pos <= n_grams - 4
), sel AS (
  SELECT st.doc_id, st.s, st.wmin, MAX(g.pos) AS pos
  FROM starts st
  JOIN grams g ON g.doc_id = st.doc_id AND g.h = st.wmin
              AND g.pos BETWEEN st.s AND st.s + 3
  GROUP BY st.doc_id, st.s, st.wmin
)
SELECT DISTINCT doc_id, CAST(pos AS INTEGER) AS pos, wmin AS fp FROM sel
"""

ORACLES["q_cdc_chunks"] = """
WITH t AS (
  SELECT doc_id, i - 1 AS pos, l[i] AS tok
  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l))) AS i
        FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents))
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
)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(MIN(pos) AS INTEGER) AS chunk_start,
       COUNT(*) AS n_tokens,
       md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_hash
FROM c GROUP BY doc_id, chunk_id
"""


ORACLES["q_bigram_lm"] = """
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS l FROM documents
), doc_bg AS (
  SELECT doc_id, l[i] || ' ' || l[i+1] AS bg, l[i] AS w1, l[i+1] AS w2,
         COUNT(*) AS n_db
  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l) - 1)) AS i
        FROM toks WHERE len(l) >= 2)
  GROUP BY doc_id, l[i] || ' ' || l[i+1], l[i], l[i+1]
), c_bg AS (
  SELECT bg, CAST(SUM(n_db) AS BIGINT) AS c_bg FROM doc_bg GROUP BY bg
), c_w1 AS (
  SELECT w1, CAST(SUM(n_db) AS BIGINT) AS c_w1 FROM doc_bg GROUP BY w1
), uni AS (
  SELECT tok, COUNT(*) AS n_t
  FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents)
  WHERE tok <> '' GROUP BY tok
), total AS (SELECT CAST(SUM(n_t) AS BIGINT) AS n_total FROM uni)
SELECT doc_id,
       (CAST(SUM(CAST(ROUND((n_db * log2(
            CAST(0.7 AS DOUBLE) * (CAST(c_bg AS DOUBLE) / c_w1)
          + CAST(0.3 AS DOUBLE) * (CAST(n_t AS DOUBLE) / n_total)
        )) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000)
         / CAST(SUM(n_db) AS DOUBLE) AS avg_log2_bigram,
       CAST(SUM(n_db) AS BIGINT) AS n_bigrams
FROM doc_bg
JOIN c_bg USING (bg) JOIN c_w1 USING (w1)
JOIN uni ON doc_bg.w2 = uni.tok, total
GROUP BY doc_id
"""

ORACLES["q_cluster_sample"] = """
WITH seeds AS (
  SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell,
         CAST(embedding AS DOUBLE[]) AS cvec
  FROM (SELECT vec_id, embedding FROM embeddings
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8)
), sims AS (
  SELECT e.vec_id, e.label, s.cell,
         ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), s.cvec)
               / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                        CAST(e.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(s.cvec, s.cvec))), 6) AS csim
  FROM embeddings e CROSS JOIN seeds s
), cells AS (
  SELECT vec_id, label, cell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY csim DESC, cell ASC) AS rn
    FROM sims) WHERE rn = 1
)
SELECT vec_id, label, CAST(cell AS BIGINT) AS cell, CAST(rk AS INTEGER) AS rk
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY cell
             ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
  FROM cells
)
WHERE rk <= 10
"""


ORACLES["q_dsir_select"] = """
WITH cb AS (
  SELECT doc_id,
         ('0x' || substr(md5(l[i] || ' ' || l[i+1]), 1, 15))::BIGINT % 64 AS bucket
  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l) - 1)) AS i
        FROM (SELECT doc_id, string_split(lower(text), ' ') AS l
              FROM documents WHERE lang <> 'en')
        WHERE len(l) >= 2)
), tb AS (
  SELECT doc_id,
         ('0x' || substr(md5(l[i] || ' ' || l[i+1]), 1, 15))::BIGINT % 64 AS bucket
  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l) - 1)) AS i
        FROM (SELECT doc_id, string_split(lower(text), ' ') AS l
              FROM documents WHERE lang = 'en')
        WHERE len(l) >= 2)
), doc_b AS (
  SELECT doc_id, bucket, COUNT(*) AS c FROM cb GROUP BY doc_id, bucket
), q_model AS (
  SELECT bucket, CAST(SUM(c) AS BIGINT) AS cq FROM doc_b GROUP BY bucket
), p_model AS (
  SELECT bucket, COUNT(*) AS ct FROM tb GROUP BY bucket
), qt AS (SELECT CAST(SUM(cq) AS BIGINT) AS qt FROM q_model),
pt AS (SELECT CAST(SUM(ct) AS BIGINT) AS pt FROM p_model),
scored AS (
  SELECT d.doc_id,
         ROUND(CAST(SUM(CAST(ROUND((d.c * (
               ln((COALESCE(p.ct, 0) + CAST(0.5 AS DOUBLE))
                  / (pt.pt + CAST(32 AS DOUBLE)))
             - ln((q.cq + CAST(0.5 AS DOUBLE))
                  / (qt.qt + CAST(32 AS DOUBLE)))
             )) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000, 6) AS logw,
         CAST(SUM(d.c) AS BIGINT) AS n_feats
  FROM doc_b d JOIN q_model q USING (bucket)
  LEFT JOIN p_model p USING (bucket), qt, pt
  GROUP BY d.doc_id
)
SELECT doc_id, logw, n_feats, CAST(rank AS INTEGER) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY logw DESC, doc_id ASC) AS rank
      FROM scored)
WHERE rank <= 50
"""


ORACLES["q_strip_dup_spans"] = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
chunks AS (
  SELECT doc_id, i AS cid,
         array_to_string(l[(i*20+1):(i*20+20)], ' ') AS ctext
  FROM (SELECT doc_id, l,
               unnest(generate_series(0, CAST(ceil(len(l) / 20.0) AS INT) - 1)) AS i
        FROM toks)
),
hashed AS (SELECT doc_id, cid, ctext, md5(ctext) AS h FROM chunks),
dup AS (SELECT h FROM hashed GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
kept AS (SELECT * FROM hashed WHERE h NOT IN (SELECT h FROM dup)),
agg AS (
  SELECT doc_id, string_agg(ctext, ' ' ORDER BY cid) AS clean_text,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
),
tot AS (SELECT doc_id, COUNT(*) AS n_chunks FROM hashed GROUP BY doc_id)
SELECT t.doc_id, COALESCE(a.clean_text, '') AS clean_text,
       CAST(t.n_chunks AS BIGINT) AS n_chunks,
       CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept
FROM tot t LEFT JOIN agg a USING (doc_id)
"""

ORACLES["q_split_assign"] = f"""
SELECT lang,
       CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '{_hex_threshold(0.8)}' THEN 'train'
            WHEN md5(CAST(doc_id AS VARCHAR)) < '{_hex_threshold(0.9)}' THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs
FROM documents
GROUP BY lang, split
"""

ORACLES["q_pairwise_corr"] = """
WITH series AS (
  SELECT l_suppkey,
         strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS day,
         (CAST(SUM(CAST(ROUND(l_extendedprice * 1000000) AS BIGINT)) AS DOUBLE)
          / 1000000) / COUNT(*) AS close
  FROM lineitem
  WHERE l_suppkey <= 10
  GROUP BY l_suppkey, day
)
SELECT a.l_suppkey AS supp_a, b.l_suppkey AS supp_b,
       COUNT(*) AS n_days,
       ROUND(corr(a.close, b.close), 6) AS corr_close
FROM series a JOIN series b USING (day)
WHERE a.l_suppkey < b.l_suppkey
GROUP BY supp_a, supp_b
"""

# ---------------------------------------------------------------------------
# Round-2 batch F: CDC diff, layout, distribution transforms, diagnostics
# ---------------------------------------------------------------------------

ORACLES["q_snapshot_diff"] = """
WITH base AS (
  SELECT o_orderkey, o_orderstatus AS status_s,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
  FROM orders
), old AS (
  SELECT o_orderkey, status_s, CAST(price_cents AS VARCHAR) AS price_s
  FROM base WHERE o_orderkey % 97 <> 0
), new AS (
  SELECT o_orderkey, status_s,
         CAST(CASE WHEN o_orderkey % 13 = 0 THEN price_cents + 1
                   ELSE price_cents END AS VARCHAR) AS price_s
  FROM base WHERE o_orderkey % 89 <> 0
), j AS (
  SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
         CASE WHEN o.o_orderkey IS NULL THEN 'insert'
              WHEN n.o_orderkey IS NULL THEN 'delete'
              WHEN o.status_s = n.status_s AND o.price_s = n.price_s
                   THEN 'unchanged'
              ELSE 'update' END AS action
  FROM old o FULL OUTER JOIN new n USING (o_orderkey)
)
SELECT o_orderkey, action FROM j WHERE action <> 'unchanged'
"""

_Z_CUST = " + ".join(
    f"((((cn >> {i}) & 1)) << {i * 2})" for i in range(8)
)
_Z_DAY = " + ".join(
    f"((((dn >> {i}) & 1)) << {i * 2 + 1})" for i in range(8)
)
ORACLES["q_zorder"] = f"""
WITH src AS (
  SELECT o_orderkey, o_custkey,
         datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS epoch_day
  FROM orders
), stats AS (
  SELECT MIN(o_custkey) AS mn_c, MAX(o_custkey) AS mx_c,
         MIN(epoch_day) AS mn_d, MAX(epoch_day) AS mx_d
  FROM src
), normed AS (
  SELECT o_custkey, epoch_day,
         LEAST(255, CAST(TRUNC((CAST(o_custkey AS DOUBLE) - mn_c)
               / (CASE WHEN mx_c = mn_c THEN 1.0 ELSE CAST(mx_c - mn_c AS DOUBLE) END)
               * 255) AS BIGINT)) AS cn,
         LEAST(255, CAST(TRUNC((CAST(epoch_day AS DOUBLE) - mn_d)
               / (CASE WHEN mx_d = mn_d THEN 1.0 ELSE CAST(mx_d - mn_d AS DOUBLE) END)
               * 255) AS BIGINT)) AS dn
  FROM src, stats
), z AS (
  SELECT o_custkey, epoch_day, ({_Z_CUST} + {_Z_DAY}) AS zval FROM normed
)
SELECT CAST(TRUNC(zval / 256.0) AS BIGINT) AS z_bucket,
       COUNT(*) AS n_rows,
       MIN(o_custkey) AS min_cust, MAX(o_custkey) AS max_cust,
       MIN(epoch_day) AS min_day, MAX(epoch_day) AS max_day
FROM z GROUP BY 1
"""

_EWMA_NUM = "0.0 + " + " + ".join(
    f"COALESCE(LAG(close, {j}) OVER w * {(0.5) ** j!r}, 0.0)" for j in range(10)
)
_EWMA_DEN = "0.0 + " + " + ".join(
    f"CASE WHEN LAG(close, {j}) OVER w IS NOT NULL THEN {(0.5) ** j!r} ELSE 0.0 END"
    for j in range(10)
)
ORACLES["q_ewma"] = f"""
WITH daily AS (
  SELECT l_suppkey,
         strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS day,
         {_dsum('l_extendedprice')} / COUNT(*) AS close
  FROM lineitem WHERE l_suppkey <= 20
  GROUP BY l_suppkey, strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')
)
SELECT l_suppkey, day, ROUND(close, 6) AS close,
       ROUND(({_EWMA_NUM}) / ({_EWMA_DEN}), 6) AS ewma
FROM daily
WINDOW w AS (PARTITION BY l_suppkey ORDER BY day)
"""

ORACLES["q_quantile_norm"] = """
WITH ranked AS (
  SELECT doc_id, source, CAST(n_chars AS DOUBLE) AS v,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY CAST(n_chars AS DOUBLE) ASC,
                            doc_id ASC) AS rk
  FROM documents
), means AS (
  SELECT rk,
         (CAST(SUM(CAST(ROUND(v * 1000000) AS BIGINT)) AS DOUBLE) / 1000000)
           / COUNT(v) AS qnorm
  FROM ranked GROUP BY rk
)
SELECT r.doc_id, r.source, r.v, ROUND(m.qnorm, 6) AS qnorm
FROM ranked r JOIN means m USING (rk)
"""

ORACLES["q_robust_scale"] = """
WITH stats AS (
  SELECT event_type,
         quantile_cont(CAST(value AS DOUBLE), 0.5) AS med,
         quantile_cont(CAST(value AS DOUBLE), 0.25) AS p25,
         quantile_cont(CAST(value AS DOUBLE), 0.75) AS p75
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type, ROUND(e.value, 6) AS value,
       ROUND(CASE WHEN (s.p75 - s.p25) <> 0
                  THEN (CAST(e.value AS DOUBLE) - s.med) / (s.p75 - s.p25)
             END, 6) AS scaled
FROM events e JOIN stats s USING (event_type)
"""

ORACLES["q_skew_profile"] = """
WITH freq AS (
  SELECT l_orderkey, COUNT(*) AS n FROM lineitem GROUP BY l_orderkey
), totals AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_rows, COUNT(*) AS n_keys,
         CAST(MAX(n) AS BIGINT) AS max_freq
  FROM freq
), top AS (
  SELECT CAST(SUM(n) AS BIGINT) AS top_n_rows
  FROM (SELECT n FROM freq ORDER BY n DESC, l_orderkey ASC LIMIT 10)
)
SELECT n_rows, n_keys, max_freq,
       ROUND(max_freq / (n_rows / n_keys), 6) AS skew_ratio,
       ROUND(max_freq / n_rows, 6) AS top1_share,
       ROUND(top_n_rows / n_rows, 6) AS topn_share
FROM totals, top
"""

ORACLES["q_mutual_knn"] = """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE vec_id < 300
), pairs AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         ROUND(list_dot_product(b.e, a.e)
               / (sqrt(list_dot_product(b.e, b.e)) * sqrt(list_dot_product(a.e, a.e))),
               6) AS sim
  FROM v a JOIN v b ON a.vec_id <> b.vec_id
), edges AS (
  SELECT src, dst, sim
  FROM (SELECT src, dst, sim,
               ROW_NUMBER() OVER (PARTITION BY src ORDER BY sim DESC, dst ASC) AS rn
        FROM pairs)
  WHERE rn <= 5
)
SELECT e.src AS id_a, e.dst AS id_b, e.sim
FROM edges e
WHERE e.src < e.dst
  AND EXISTS (SELECT 1 FROM edges r WHERE r.src = e.dst AND r.dst = e.src)
ORDER BY id_a, id_b
"""


# --- round-2g -------------------------------------------------------------

# MERGE round trip: apply(old, diff(old, new)) must reproduce the new
# snapshot exactly, so the oracle IS the new-snapshot expression.
ORACLES["q_apply_changes"] = """
WITH base AS (
  SELECT o_orderkey, o_orderstatus AS status_s,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
  FROM orders
)
SELECT o_orderkey, status_s,
       CAST(CASE WHEN o_orderkey % 13 = 0 THEN price_cents + 1
                 ELSE price_cents END AS VARCHAR) AS price_s
FROM base WHERE o_orderkey % 89 <> 0
"""

_PROF_COL = """
SELECT '{c}' AS col_name, COUNT(*) AS n_rows, COUNT({c}) AS n_nonnull,
       COUNT(DISTINCT {c}) AS n_distinct,
       CAST(COUNT(*) - COUNT({c}) AS DOUBLE) / COUNT(*) AS null_frac,
       CAST(MIN({c}) AS VARCHAR) AS min_s, CAST(MAX({c}) AS VARCHAR) AS max_s
FROM c
"""
ORACLES["q_column_profile"] = (
    """
WITH c AS (
  SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS acctbal_cents
  FROM customer
)
"""
    + " UNION ALL ".join(
        _PROF_COL.format(c=c)
        for c in ["c_custkey", "c_name", "c_nationkey", "c_mktsegment", "acctbal_cents"]
    )
)

_DAILY_ORDERS = """
daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n
  FROM orders GROUP BY 1
)
"""

ORACLES["q_seasonal_decompose"] = f"""
WITH {_DAILY_ORDERS},
base AS (
  SELECT d, CAST(n AS BIGINT) AS v,
         CAST(SUM(CAST(n AS BIGINT)) OVER w AS BIGINT) AS ts,
         COUNT(*) OVER w AS tc,
         (ROW_NUMBER() OVER (ORDER BY d) - 1) % 7 AS ph
  FROM daily
  WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
interior AS (
  SELECT *, v * 7 - ts AS dt FROM base WHERE tc = 7
),
seas AS (
  SELECT ph,
         CAST(ROUND(CAST(SUM(dt) AS DOUBLE) / COUNT(*) / 7 * 1000000)
              AS BIGINT) AS s6
  FROM interior GROUP BY ph
),
tot AS (SELECT CAST(SUM(s6) AS BIGINT) AS tot6 FROM seas),
seas_c AS (SELECT ph, s6 * 7 - tot6 AS sc6p FROM seas, tot)
SELECT i.d, i.v AS value,
       CAST(i.ts AS DOUBLE) / 7 AS trend,
       CAST(s.sc6p AS DOUBLE) / (7 * 1000000.0) AS seasonal,
       CAST(i.v AS DOUBLE) - CAST(i.ts AS DOUBLE) / 7
         - CAST(s.sc6p AS DOUBLE) / (7 * 1000000.0) AS residual
FROM interior i JOIN seas_c s USING (ph)
"""

_ACF_LAGS = list(range(1, 8))
ORACLES["q_acf"] = f"""
WITH {_DAILY_ORDERS},
stats AS (SELECT COUNT(*) AS nn, CAST(SUM(CAST(n AS BIGINT)) AS BIGINT) AS s
          FROM daily),
c AS (
  SELECT d, CAST(nn * CAST(n AS BIGINT) - s AS BIGINT) AS c
  FROM daily, stats
),
lagged AS (
  SELECT c, {", ".join(f"LAG(c, {k}) OVER w AS c{k}" for k in _ACF_LAGS)}
  FROM c WINDOW w AS (ORDER BY d)
),
sums AS (
  SELECT CAST(SUM(c * c) AS BIGINT) AS den,
         {", ".join(f"CAST(SUM(c * c{k}) AS BIGINT) AS num{k}" for k in _ACF_LAGS)}
  FROM lagged
)
{" UNION ALL ".join(
    f"SELECT {k} AS lag_k, CAST(num{k} AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM sums"
    for k in _ACF_LAGS
)}
"""

ORACLES["q_cusum"] = f"""
WITH {_DAILY_ORDERS},
stats AS (SELECT COUNT(*) AS nn, CAST(SUM(CAST(n AS BIGINT)) AS BIGINT) AS s
          FROM daily),
c AS (
  SELECT d, CAST(nn * CAST(n AS BIGINT) - s AS BIGINT) AS c
  FROM daily, stats
),
cus AS (
  SELECT d, CAST(SUM(c) OVER (ORDER BY d
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cusum
  FROM c
)
SELECT d, cusum FROM cus ORDER BY ABS(cusum) DESC, d ASC LIMIT 5
"""

# JL signed random projection: the 8x64 sign matrix is the SIGN of the shared
# fixed-point plane table (operators/rproj.sign_entry), generated here so the
# oracle spells the identical matrix the Spark operator embeds.
from fortune_500_financial_insights_pipeline_spark.operators.rproj import sign_entry as _rp_sign

_SG_ROWS = ",\n  ".join(
    f"({p},{d},{_rp_sign(p, d)})" for p in range(8) for d in range(64)
)
ORACLES["q_random_projection"] = f"""
WITH v AS (
  SELECT vec_id, CAST(pos AS BIGINT) AS pos,
         CAST(ROUND(CAST(xv AS DOUBLE) * 1000000) AS BIGINT) AS x
  FROM (SELECT vec_id, unnest(range(len(embedding))) AS pos,
               unnest(embedding) AS xv
        FROM embeddings)
),
sg(p, pos, w) AS (VALUES
  {_SG_ROWS}
),
proj AS (
  SELECT vec_id, p, CAST(SUM(x * w) AS BIGINT) AS pv
  FROM v JOIN sg ON v.pos = sg.pos GROUP BY vec_id, p
),
q AS (SELECT p, pv AS qv FROM proj WHERE vec_id = 0),
dist AS (
  SELECT vec_id, CAST(SUM((pv - qv) * (pv - qv)) AS BIGINT) AS pdist
  FROM proj JOIN q USING (p) GROUP BY vec_id
)
SELECT vec_id, pdist FROM dist ORDER BY pdist ASC, vec_id ASC LIMIT 20
"""

# --- round-2h -------------------------------------------------------------

ORACLES["q_hard_negatives"] = """
WITH q AS (
  SELECT vec_id AS q_id, label AS qlabel, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < 10
), s AS (
  SELECT q.q_id, e.vec_id, e.label,
         ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe)
               / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                        CAST(e.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(q.qe, q.qe))), 6) AS sim
  FROM embeddings e, q
  WHERE e.vec_id <> q.q_id AND e.label <> q.qlabel
), r AS (
  SELECT q_id, vec_id, label, sim,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rn
  FROM s
)
SELECT q_id, vec_id, label, sim FROM r WHERE rn <= 5
"""

ORACLES["q_line_dedup"] = """
SELECT doc_id,
       CAST(len(string_split(text, '. ')) AS INTEGER) AS n_lines,
       CAST(len(list_distinct(string_split(text, '. '))) AS INTEGER) AS n_uniq,
       CAST(len(string_split(text, '. '))
            - len(list_distinct(string_split(text, '. '))) AS DOUBLE)
         / len(string_split(text, '. ')) AS dup_line_frac
FROM documents
"""

ORACLES["q_containment"] = """
WITH g AS (
  SELECT DISTINCT doc_id, UNNEST(list_distinct(
           list_transform(range(1, len(l)), x -> l[x] || ' ' || l[x+1])
         )) AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
), b AS (
  SELECT doc_id AS bench_id, gram FROM g WHERE doc_id < 5
), bs AS (
  SELECT bench_id, COUNT(*) AS bsize FROM b GROUP BY bench_id
), sh AS (
  SELECT g.doc_id, b.bench_id, COUNT(*) AS shared_grams
  FROM g JOIN b ON g.gram = b.gram
  WHERE g.doc_id >= 5
  GROUP BY g.doc_id, b.bench_id
)
SELECT sh.doc_id, sh.bench_id, CAST(sh.shared_grams AS BIGINT) AS shared_grams,
       CAST(sh.shared_grams AS DOUBLE) / bs.bsize AS containment
FROM sh JOIN bs USING (bench_id)
WHERE CAST(sh.shared_grams AS DOUBLE) / bs.bsize >= 0.05
"""

ORACLES["q_theil_sen"] = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n
  FROM orders GROUP BY 1
), s AS (
  SELECT datediff('day', DATE '1998-01-01', d) AS t, CAST(n AS BIGINT) AS v
  FROM daily WHERE d >= DATE '1998-01-01'
), p AS (
  SELECT CAST(b.v - a.v AS DOUBLE) / (b.t - a.t) AS s
  FROM s a JOIN s b ON b.t > a.t
)
SELECT COUNT(*) AS n_pairs, ROUND(quantile_cont(s, 0.5), 6) AS slope_med
FROM p
"""

from fortune_500_financial_insights_pipeline_spark.checks import BENFORD_EXPECTED as _BF

_BF_CASE = "CASE digit " + " ".join(
    f"WHEN {d} THEN CAST({_BF[d]!r} AS DOUBLE)" for d in range(1, 10)
) + " END"
ORACLES["q_benford"] = f"""
WITH pos AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE ROUND(o_totalprice * 100) > 0
), c AS (
  SELECT CAST(SUBSTR(CAST(cents AS VARCHAR), 1, 1) AS INTEGER) AS digit,
         COUNT(*) AS n
  FROM pos GROUP BY 1
), t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM c)
SELECT digit, n, CAST(n AS DOUBLE) / tot AS obs_share,
       {_BF_CASE} AS exp_share,
       CAST(n AS DOUBLE) / tot - {_BF_CASE} AS dev
FROM c, t
"""

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

# k-core: the identical top-3 kNN edge set, then 3 unrolled peel rounds
# at k=4 (graph.kcore runs the same peels as a Python loop).
_KCORE_PEEL = """
d{r} AS (SELECT src, COUNT(*) AS deg FROM e{p} GROUP BY src),
k{r} AS (SELECT src FROM d{r} WHERE deg >= 4),
e{r} AS (
  SELECT e.src, e.dst FROM e{p} e
  JOIN k{r} a ON e.src = a.src
  JOIN k{r} b ON e.dst = b.src
)
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

_BFS_ROUND = """
  SELECT id, MIN(hop) AS hop FROM (
    SELECT id, hop FROM {prev}
    UNION ALL
    SELECT b.u AS id, MIN(l.hop) + 1 AS hop
    FROM bfs_both b JOIN {prev} l ON b.v = l.id GROUP BY b.u
  ) GROUP BY id
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
              CAST(o_orderkey AS VARCHAR),
              CAST(o_custkey AS VARCHAR),
              o_orderstatus,
              CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR))), 1, 10) AS BIGINT) AS dig
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


def _rbo_suffix_weight_literals(p: float = 0.9, depth: int = 10) -> str:
    # mirrors operators/retrieval.rbo_suffix_weights EXACTLY (same float
    # expression text -> same doubles -> same integer literals)
    s = [0.0] * (depth + 2)
    for m in range(depth, 0, -1):
        s[m] = s[m + 1] + (1.0 - p) * p ** (m - 1) / m
    scale = 10**12
    return ", ".join(str(round(v * scale)) for v in s[1 : depth + 1])


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


def _mmr_step_sql(k: int) -> str:
    p = k - 1
    return f"""score{k} AS (
  SELECT r.query_id, r.doc_id, r.rel, 0.7 * r.rel - 0.3 * MAX(p.s) AS mmr
  FROM cand r
  LEFT JOIN sel{p} x ON x.query_id = r.query_id AND x.doc_id = r.doc_id
  JOIN pairs p ON p.query_id = r.query_id AND p.a = r.doc_id
  JOIN sel{p} t ON t.query_id = p.query_id AND t.doc_id = p.b
  WHERE x.doc_id IS NULL
  GROUP BY r.query_id, r.doc_id, r.rel
), pick{k} AS (
  SELECT query_id, doc_id, {k} AS step, rel FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY mmr DESC, doc_id ASC) AS rn
    FROM score{k}) WHERE rn = 1
), sel{k} AS (SELECT * FROM sel{p} UNION ALL SELECT * FROM pick{k})"""


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


def _markov_iter_sql(k: int) -> str:
    p = k - 1
    return f"""p{k} AS MATERIALIZED (
  SELECT st.scenario, st.state,
         CAST(COALESCE(SUM(CASE WHEN tr.to_state = 'CONV' THEN tr.t6 * 1000000
                                ELSE (tr.t6 * pp.p) // 1000000 END), 0) AS BIGINT) AS p
  FROM states st
  LEFT JOIN strans tr ON tr.scenario = st.scenario AND tr.from_state = st.state
  LEFT JOIN p{p} pp ON pp.scenario = tr.scenario AND pp.state = tr.to_state
  GROUP BY st.scenario, st.state
)"""


ORACLES["q_markov_attribution"] = f"""
WITH ordered AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), firstp AS (
  SELECT user_id, MIN(rn) AS prn FROM ordered
  WHERE event_type = 'purchase' GROUP BY user_id
), j AS (
  SELECT o.user_id, o.event_type, o.rn, f.prn
  FROM ordered o LEFT JOIN firstp f USING (user_id)
), pre AS (
  SELECT * FROM j WHERE prn IS NULL OR rn < prn
), internal AS (
  SELECT COALESCE(LAG(event_type) OVER (PARTITION BY user_id ORDER BY rn),
                  'START') AS from_state,
         event_type AS to_state
  FROM pre
), users AS (
  SELECT user_id, MAX(prn) AS prn FROM j GROUP BY user_id
), lastpre AS (
  SELECT user_id, MAX(rn) AS mrn FROM pre GROUP BY user_id
), last_type AS (
  SELECT p.user_id, p.event_type AS lt
  FROM pre p JOIN lastpre l ON l.user_id = p.user_id AND p.rn = l.mrn
), term AS (
  SELECT COALESCE(lt.lt, 'START') AS from_state,
         CASE WHEN u.prn IS NOT NULL THEN 'CONV' ELSE 'NULL' END AS to_state
  FROM users u LEFT JOIN last_type lt USING (user_id)
), pairs AS (
  SELECT from_state, to_state FROM internal
  UNION ALL SELECT from_state, to_state FROM term
), counts AS (
  SELECT from_state, to_state, COUNT(*) AS n FROM pairs GROUP BY 1, 2
), totals AS (
  SELECT from_state, SUM(n) AS tot FROM counts GROUP BY 1
), trans AS (
  SELECT c.from_state, c.to_state,
         CAST(ROUND(CAST(c.n AS DOUBLE) / t.tot * 1000000) AS BIGINT) AS t6
  FROM counts c JOIN totals t USING (from_state)
), scen AS (
  SELECT UNNEST(['__full__', 'click', 'error', 'signup', 'view']) AS scenario
), strans AS MATERIALIZED (
  SELECT s.scenario, t.from_state, t.to_state, t.t6
  FROM trans t CROSS JOIN scen s
  WHERE t.from_state <> s.scenario AND t.to_state <> s.scenario
    AND t.to_state <> 'NULL'
), states AS MATERIALIZED (
  SELECT DISTINCT scenario, from_state AS state FROM strans
), p0 AS (
  SELECT scenario, state, CAST(0 AS BIGINT) AS p FROM states
), {', '.join(_markov_iter_sql(k) for k in range(1, 25))},
startp AS (
  SELECT scenario, p FROM p24 WHERE state = 'START'
), fullp AS (
  SELECT p AS pfull FROM startp WHERE scenario = '__full__'
), per AS (
  SELECT s.scenario AS channel, s.p AS pw, f.pfull
  FROM startp s CROSS JOIN fullp f WHERE s.scenario <> '__full__'
), tot AS (SELECT SUM(pfull - pw) AS t FROM per)
SELECT channel,
       ROUND(CAST(pw AS DOUBLE) / 1000000000000, 6) AS p_conv_without,
       ROUND(CAST(pfull - pw AS DOUBLE) / pfull, 6) AS removal_effect,
       ROUND(CASE WHEN tot.t > 0
                  THEN CAST(pfull - pw AS DOUBLE) / tot.t END, 6)
         AS attribution_share
FROM per CROSS JOIN tot
ORDER BY channel
"""

ORACLES["q_shapley_attribution"] = """
WITH ordered AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), firstp AS (
  SELECT user_id, MIN(rn) AS prn FROM ordered
  WHERE event_type = 'purchase' GROUP BY user_id
), j AS (
  SELECT o.user_id, o.event_type, o.rn, f.prn
  FROM ordered o LEFT JOIN firstp f USING (user_id)
), per_user AS (
  SELECT user_id,
         bit_or(CASE WHEN prn IS NULL OR rn < prn THEN
                       CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
                            WHEN 'signup' THEN 4 WHEN 'view' THEN 8 ELSE 0 END
                     ELSE 0 END) AS mask,
         MAX(CASE WHEN prn IS NOT NULL THEN 1 ELSE 0 END) AS conv
  FROM j GROUP BY user_id
), vset AS (
  SELECT mask, COUNT(*) AS n_users, SUM(conv) AS n_conv
  FROM per_user GROUP BY mask
), v AS (
  SELECT m.mask,
         COALESCE(CAST(ROUND(CAST(n_conv AS DOUBLE) / n_users * 1000000)
                       AS BIGINT), 0) AS v6
  FROM (SELECT UNNEST(range(0, 16)) AS mask) m
  LEFT JOIN vset USING (mask)
), ch AS (
  SELECT * FROM (VALUES ('click', 1), ('error', 2), ('signup', 4), ('view', 8))
    AS t(channel, bit)
), terms AS (
  SELECT c.channel,
         list_extract([250000, 83333, 83333, 250000],
                      bit_count(v.mask) + 1) * (vw.v6 - v.v6) AS t
  FROM v CROSS JOIN ch c
  JOIN v vw ON vw.mask = (v.mask | c.bit)
  WHERE (v.mask & c.bit) = 0
), phi AS (
  SELECT channel, SUM(t) AS phi FROM terms GROUP BY channel
), tot AS (SELECT SUM(phi) AS t FROM phi)
SELECT channel,
       ROUND(CAST(phi AS DOUBLE) / 1000000000000, 6) AS shapley_value,
       ROUND(CASE WHEN tot.t <> 0 THEN CAST(phi AS DOUBLE) / tot.t END, 6)
         AS attribution_share
FROM phi CROSS JOIN tot
ORDER BY channel
"""

ORACLES["q_eventually_follows"] = """
WITH spans AS (
  SELECT user_id, event_type, MIN(rn) AS f, MAX(rn) AS l
  FROM (SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events)
  GROUP BY user_id, event_type
), total AS (SELECT COUNT(DISTINCT user_id) AS n FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       COUNT(*) AS n_journeys,
       ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(total.n), 6) AS support
FROM spans a
JOIN spans b ON a.user_id = b.user_id
CROSS JOIN total
WHERE a.f < b.l
GROUP BY a.event_type, b.event_type
ORDER BY type_a, type_b
"""

ORACLES["q_transition_latency"] = """
WITH gaps AS (
  SELECT LAG(event_type) OVER w AS from_type,
         event_type AS to_type,
         CAST(epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS DOUBLE) / 1000000 AS s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
)
SELECT from_type, to_type, COUNT(*) AS n_transitions,
       ROUND(quantile_cont(s, 0.5), 6) AS p50_s,
       ROUND(quantile_cont(s, 0.9), 6) AS p90_s
FROM gaps WHERE from_type IS NOT NULL
GROUP BY from_type, to_type
ORDER BY from_type, to_type
"""

ORACLES["q_ivf_balance"] = """
WITH seeds AS (
  SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell,
         CAST(embedding AS DOUBLE[]) AS cvec
  FROM (SELECT vec_id, embedding FROM embeddings
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16)
), sims AS (
  SELECT e.vec_id, s.cell,
         ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), s.cvec)
               / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                        CAST(e.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(s.cvec, s.cvec))), 6) AS csim
  FROM embeddings e CROSS JOIN seeds s
), cells AS (
  SELECT vec_id, cell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY csim DESC, cell ASC) AS rn
    FROM sims) WHERE rn = 1
), occ AS (
  SELECT cell, COUNT(*) AS n_vecs FROM cells GROUP BY cell
), tot AS (SELECT SUM(n_vecs) AS t FROM occ)
SELECT CAST(cell AS BIGINT) AS cell, CAST(n_vecs AS BIGINT) AS n_vecs,
       ROUND(CAST(n_vecs AS DOUBLE) / tot.t, 6) AS share
FROM occ CROSS JOIN tot
ORDER BY cell
"""

ORACLES["q_seasonal_anomalies"] = f"""
WITH sd AS ({ORACLES["q_seasonal_decompose"]}),
s1 AS (SELECT quantile_cont(residual, 0.5) AS med FROM sd),
s2 AS (
  SELECT quantile_cont(abs(residual - s1.med), 0.5) AS mad, MAX(s1.med) AS med
  FROM sd CROSS JOIN s1
)
SELECT sd.d, sd.value,
       ROUND(sd.residual, 6) AS residual,
       ROUND(abs(sd.residual - s2.med), 6) AS deviation,
       ROUND(3 * s2.mad, 6) AS threshold
FROM sd CROSS JOIN s2
WHERE abs(sd.residual - s2.med) > 3 * s2.mad
ORDER BY sd.d
"""

ORACLES["q_sax_motifs"] = f"""
WITH daily AS (
  SELECT l_suppkey,
         strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS day,
         ROUND({_dsum('l_extendedprice')} / COUNT(*), 6) AS close
  FROM lineitem WHERE l_suppkey <= 10
  GROUP BY l_suppkey, strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')
), stats AS (
  SELECT l_suppkey, COUNT(*) AS n,
         {_dsum('close')} AS s,
         {_dsum('close * close')} AS ss
  FROM daily GROUP BY l_suppkey
), blocks AS (
  SELECT d.l_suppkey,
         (ROW_NUMBER() OVER (PARTITION BY d.l_suppkey ORDER BY d.day) - 1) // 4
           AS blk,
         ROUND((d.close - st.s / CAST(st.n AS DOUBLE))
               / sqrt((CAST(st.n AS DOUBLE) * st.ss - st.s * st.s)
                      / (CAST(st.n AS DOUBLE) * CAST(st.n AS DOUBLE))), 6) AS z
  FROM daily d JOIN stats st USING (l_suppkey)
), paa AS (
  SELECT l_suppkey, blk,
         ROUND({_dsum('z')} / COUNT(*), 6) AS p
  FROM blocks GROUP BY l_suppkey, blk
), syms AS (
  SELECT l_suppkey, blk,
         CASE WHEN p < -0.6745 THEN 'a'
              WHEN p < 0.0 THEN 'b'
              WHEN p < 0.6745 THEN 'c'
              ELSE 'd' END AS sym
  FROM paa
), words AS (
  SELECT l_suppkey,
         sym || LEAD(sym, 1) OVER w || LEAD(sym, 2) OVER w AS word
  FROM syms
  WINDOW w AS (PARTITION BY l_suppkey ORDER BY blk)
)
SELECT l_suppkey, word, COUNT(*) AS n_occurrences
FROM words WHERE word IS NOT NULL
GROUP BY l_suppkey, word
HAVING COUNT(*) >= 2
ORDER BY l_suppkey, word
"""

ORACLES["q_mixture_kl"] = """
WITH per AS (
  SELECT source,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), tot AS (SELECT SUM(n_tokens) AS t FROM per)
SELECT source, n_tokens,
       ROUND(CAST(n_tokens AS DOUBLE) / tot.t, 6) AS share,
       ROUND(ROUND(CAST(n_tokens AS DOUBLE) / tot.t, 6)
             * log2(ROUND(CAST(n_tokens AS DOUBLE) / tot.t, 6) / 0.05), 9)
         AS kl_term
FROM per CROSS JOIN tot
ORDER BY source
"""

_SCORED_LABELED_CTE = """w AS (
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
  SELECT s.doc_id,
         ROUND(1.0 / (1.0 + EXP(-(0.0 + s.sw / (1000.0 * s.nt)))), 6) AS prob,
         CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
  FROM s JOIN documents d USING (doc_id)
)"""

ORACLES["q_pr_curve"] = f"""
WITH {_SCORED_LABELED_CTE},
thr AS (SELECT UNNEST([0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS threshold),
agg AS (
  SELECT t.threshold,
         CAST(SUM(CASE WHEN l.prob >= t.threshold AND l.y = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN l.prob >= t.threshold AND l.y = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS fp,
         CAST(SUM(CASE WHEN l.prob < t.threshold AND l.y = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS fn
  FROM labeled l CROSS JOIN thr t
  GROUP BY t.threshold
), pr AS (
  SELECT threshold, tp, fp, fn,
         ROUND(CASE WHEN tp + fp > 0
                    THEN CAST(tp AS DOUBLE) / (tp + fp) END, 6) AS precision,
         ROUND(CASE WHEN tp + fn > 0
                    THEN CAST(tp AS DOUBLE) / (tp + fn) END, 6) AS recall
  FROM agg
)
SELECT threshold, tp, fp, fn, precision, recall,
       ROUND(CASE WHEN precision + recall > 0
                  THEN 2 * precision * recall / (precision + recall) END, 6) AS f1
FROM pr ORDER BY threshold
"""

ORACLES["q_lift_deciles"] = f"""
WITH {_SCORED_LABELED_CTE},
dec AS (
  SELECT y, NTILE(10) OVER (ORDER BY prob DESC, doc_id ASC) AS decile
  FROM labeled
), per AS (
  SELECT decile, COUNT(*) AS n_docs, CAST(SUM(y) AS BIGINT) AS n_pos
  FROM dec GROUP BY decile
), tot AS (SELECT SUM(n_docs) AS n, SUM(n_pos) AS p FROM per)
SELECT CAST(decile AS INTEGER) AS decile, n_docs, n_pos,
       ROUND((CAST(n_pos AS DOUBLE) / n_docs)
             / (CAST(tot.p AS DOUBLE) / tot.n), 6) AS lift,
       ROUND(CAST(SUM(n_pos) OVER (ORDER BY decile
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             / tot.p, 6) AS cum_gain
FROM per CROSS JOIN tot
ORDER BY decile
"""

ORACLES["q_abc_analysis"] = f"""
WITH per_part AS (
  SELECT l_partkey,
         {_dsum('l_extendedprice * (1 - l_discount)')} AS rev
  FROM lineitem GROUP BY l_partkey
), tot AS (SELECT {_dsum('rev')} AS t FROM per_part),
cum AS (
  SELECT rev, t,
         (CAST(SUM(CAST(ROUND(rev * 1000000) AS BIGINT))
                 OVER (ORDER BY rev DESC, l_partkey ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DOUBLE) / 1000000) / t AS cshare
  FROM per_part CROSS JOIN tot
)
SELECT CASE WHEN cshare <= 0.80 THEN 'A'
            WHEN cshare <= 0.95 THEN 'B'
            ELSE 'C' END AS abc_class,
       COUNT(*) AS n_parts,
       ROUND({_dsum('rev')}, 6) AS revenue,
       ROUND({_dsum('rev')} / MAX(t), 6) AS revenue_share
FROM cum
GROUP BY 1 ORDER BY abc_class
"""

ORACLES["q_zipf_slope"] = """
WITH tf AS (
  SELECT term, COUNT(*) AS freq
  FROM (SELECT UNNEST(string_split(text, ' ')) AS term FROM documents)
  WHERE term <> '' GROUP BY term
), top AS (
  SELECT ROUND(log2(CAST(rank AS DOUBLE)), 6) AS x,
         ROUND(log2(CAST(freq AS DOUBLE)), 6) AS y
  FROM (SELECT freq, ROW_NUMBER() OVER (ORDER BY freq DESC, term ASC) AS rank
        FROM tf)
  WHERE rank <= 100
), m AS (
  SELECT COUNT(*) AS n_terms,
         (CAST(SUM(CAST(ROUND(x * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS sx,
         (CAST(SUM(CAST(ROUND(y * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS sy,
         (CAST(SUM(CAST(ROUND((x * y) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS sxy,
         (CAST(SUM(CAST(ROUND((x * x) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS sxx
  FROM top
)
SELECT CAST(n_terms AS BIGINT) AS n_terms,
       ROUND((CAST(n_terms AS DOUBLE) * sxy - sx * sy)
             / (CAST(n_terms AS DOUBLE) * sxx - sx * sx), 6) AS zipf_slope,
       ROUND(sy / CAST(n_terms AS DOUBLE)
             - ((CAST(n_terms AS DOUBLE) * sxy - sx * sy)
                / (CAST(n_terms AS DOUBLE) * sxx - sx * sx))
               * sx / CAST(n_terms AS DOUBLE), 6) AS log2_c
FROM m
"""

ORACLES["q_heaps_curve"] = """
WITH maxid AS (SELECT MAX(doc_id) AS m FROM documents),
firstdoc AS (
  SELECT term, MIN(doc_id) AS first_doc
  FROM (SELECT doc_id,
               UNNEST(list_distinct(list_transform(range(1, len(l)),
                                                   x -> l[x] || ' ' || l[x+1]))) AS term
        FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents))
  WHERE term <> '' GROUP BY term
), per AS (
  SELECT LEAST(10, CAST(FLOOR(first_doc * 10 / (maxid.m + 1)) AS INTEGER) + 1)
           AS checkpoint,
         COUNT(*) AS new_terms
  FROM firstdoc CROSS JOIN maxid
  GROUP BY 1
)
SELECT checkpoint, new_terms,
       CAST(SUM(new_terms) OVER (ORDER BY checkpoint
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS vocab_size
FROM per ORDER BY checkpoint
"""

ORACLES["q_kaplan_meier"] = """
WITH per_user AS (
  SELECT user_id, MIN(ts) AS first_ts,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS fp,
         MAX(ts) AS last_ts
  FROM events GROUP BY user_id
), users AS (
  SELECT datediff('day', CAST(first_ts AS DATE),
                  CAST(COALESCE(fp, last_ts) AS DATE)) AS t,
         CASE WHEN fp IS NOT NULL THEN 1 ELSE 0 END AS event
  FROM per_user
), per_t AS (
  SELECT t, COUNT(*) AS n_at, CAST(SUM(event) AS BIGINT) AS d
  FROM users GROUP BY t
), tot AS (SELECT SUM(n_at) AS total FROM per_t),
at_risk AS (
  SELECT t, d,
         CAST(tot.total - COALESCE(SUM(n_at) OVER (ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS n_risk
  FROM per_t CROSS JOIN tot
)
SELECT t, n_risk, d,
       CASE WHEN MAX(CASE WHEN d >= n_risk THEN 1 ELSE 0 END)
                 OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) = 1
            THEN 0.0
            ELSE ROUND(EXP(CAST(SUM(CASE WHEN d < n_risk
                       THEN CAST(ROUND(LN(1.0 - CAST(d AS DOUBLE) / n_risk)
                                       * 1000000000) AS BIGINT)
                       ELSE 0 END) OVER (ORDER BY t
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DOUBLE) / 1000000000), 6) END AS survival
FROM at_risk WHERE d > 0
ORDER BY t
"""

ORACLES["q_var_backtest"] = f"""
WITH daily AS (
  SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS day,
         ROUND({_dsum('l_extendedprice')} / COUNT(*), 6) AS close
  FROM lineitem
  GROUP BY strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')
), rets AS (
  SELECT day, r, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM (
    SELECT day, ROUND(close / LAG(close) OVER (ORDER BY day) - 1, 6) AS r
    FROM daily) WHERE r IS NOT NULL
), ntot AS (SELECT COUNT(*) AS n FROM rets),
split AS (
  SELECT rets.*, CASE WHEN rn <= ntot.n // 2 THEN 1 ELSE 2 END AS half
  FROM rets CROSS JOIN ntot
), n1 AS (SELECT COUNT(*) AS n1 FROM split WHERE half = 1),
var AS (
  SELECT r AS var95 FROM (
    SELECT r, ROW_NUMBER() OVER (ORDER BY r ASC, day ASC) AS vr
    FROM split WHERE half = 1) CROSS JOIN n1
  WHERE vr = (n1.n1 + 19) // 20
), agg AS (
  SELECT MAX(var.var95) AS var95, COUNT(*) AS n_test,
         CAST(SUM(CASE WHEN s.r < var.var95 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_breaches
  FROM split s CROSS JOIN var WHERE s.half = 2
)
SELECT ROUND(var95, 6) AS var95, CAST(n_test AS BIGINT) AS n_test, n_breaches,
       ROUND(CAST(n_breaches AS DOUBLE) / n_test, 6) AS breach_rate,
       ROUND(-2 * (
         (CASE WHEN n_breaches < n_test
               THEN (CAST(n_test AS DOUBLE) - CAST(n_breaches AS DOUBLE))
                    * LN((1 - 0.05) / (1 - CAST(n_breaches AS DOUBLE)
                                           / CAST(n_test AS DOUBLE)))
               ELSE 0.0 END)
         + (CASE WHEN n_breaches > 0
                 THEN CAST(n_breaches AS DOUBLE)
                      * LN(0.05 / (CAST(n_breaches AS DOUBLE)
                                   / CAST(n_test AS DOUBLE)))
                 ELSE 0.0 END)), 6) AS kupiec_lr
FROM agg
"""

ORACLES["q_partition_health"] = """
WITH per AS (
  SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS month,
         COUNT(*) AS n_rows,
         ROUND(CAST(SUM(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END)
                    AS DOUBLE) / COUNT(*), 6) AS null_rate_price,
         CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers
  FROM lineitem
  GROUP BY strftime(CAST(l_shipdate AS DATE), '%Y-%m')
)
SELECT month, n_rows, null_rate_price, n_suppliers,
       CAST(CASE WHEN LAG(n_rows) OVER (ORDER BY month) IS NOT NULL
                  AND n_rows < LAG(n_rows) OVER (ORDER BY month) * 0.5
                 THEN 1 ELSE 0 END AS INTEGER) AS volume_drop
FROM per ORDER BY month
"""


def _als_iter_sql(k: int) -> str:
    p = k - 1
    return f"""u{k} AS MATERIALIZED (
  SELECT r.c,
         ROUND((CAST(SUM(CAST(ROUND((r.r * v.v) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000)
               / (CAST(SUM(CAST(ROUND((v.v * v.v) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000),
               6) AS u
  FROM ratings r JOIN v{p} v USING (p) GROUP BY r.c
), v{k} AS MATERIALIZED (
  SELECT r.p,
         ROUND((CAST(SUM(CAST(ROUND((r.r * u.u) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000)
               / (CAST(SUM(CAST(ROUND((u.u * u.u) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000),
               6) AS v
  FROM ratings r JOIN u{k} u USING (c) GROUP BY r.p
)"""


ORACLES["q_als_rank1"] = f"""
WITH ratings AS MATERIALIZED (
  SELECT l_suppkey AS c, l_partkey AS p,
         ROUND({_dsum('CAST(l_quantity AS DOUBLE)')}, 6) AS r
  FROM lineitem WHERE l_partkey <= 200
  GROUP BY l_suppkey, l_partkey
), v0 AS (
  SELECT DISTINCT p, 1.0 AS v FROM ratings
), {', '.join(_als_iter_sql(k) for k in range(1, 4))}
SELECT p, v FROM v3
ORDER BY v DESC, p ASC
LIMIT 20
"""


def _ppr_oracle(iters: int = 10, d_num: int = 850, denom: int = 1000,
                scale: int = 1_000_000_000) -> str:
    """q_ppr's integer recurrence unrolled (the _pagerank_oracle shape with
    a seed-concentrated teleport and seed-only initialization)."""
    teleport = (denom - d_num) * scale // denom
    parts = [f"""
WITH base AS (
  SELECT DISTINCT l_suppkey AS s, o_custkey + 1000000 AS c
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), edges AS (
  SELECT s AS src, c AS dst FROM base
  UNION
  SELECT c AS src, s AS dst FROM base
), seedset AS (
  SELECT DISTINCT CAST(s_suppkey AS BIGINT) AS node FROM supplier
  WHERE s_suppkey <= 5
), nodes AS (
  SELECT n.node, CASE WHEN sd.node IS NOT NULL THEN 1 ELSE 0 END AS is_seed
  FROM (SELECT src AS node FROM edges UNION SELECT dst FROM edges) n
  LEFT JOIN seedset sd ON sd.node = n.node
), deg AS (
  SELECT src, COUNT(*) AS out_deg FROM edges GROUP BY src
), r0 AS (
  SELECT node, CAST(CASE WHEN is_seed = 1 THEN {scale} ELSE 0 END AS BIGINT)
           AS rank_fp
  FROM nodes
)"""]
    for k in range(1, iters + 1):
        parts.append(f""", r{k} AS MATERIALIZED (
  SELECT n.node,
         CAST(CASE WHEN n.is_seed = 1 THEN {teleport} ELSE 0 END
              + (COALESCE(s.in_sum, 0) // {denom}) * {d_num}
              + ((COALESCE(s.in_sum, 0) % {denom}) * {d_num}) // {denom}
              AS BIGINT) AS rank_fp
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node,
           CAST(SUM(r.rank_fp // d.out_deg) AS BIGINT) AS in_sum
    FROM edges e
    JOIN r{k - 1} r ON e.src = r.node
    JOIN deg d ON d.src = e.src
    GROUP BY e.dst
  ) s ON n.node = s.node
)""")
    parts.append(
        f"\nSELECT node, rank_fp FROM r{iters} "
        "ORDER BY rank_fp DESC, node ASC LIMIT 20"
    )
    return "".join(parts)


ORACLES["q_ppr"] = _ppr_oracle()

ORACLES["q_reconciliation"] = f"""
WITH lines AS (
  SELECT l_orderkey AS o_orderkey,
         ROUND({_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')}, 6)
           AS line_total
  FROM lineitem GROUP BY l_orderkey
), j AS (
  SELECT o.o_orderkey,
         ROUND(o.o_totalprice, 6) AS header_total,
         COALESCE(l.line_total, 0.0) AS line_total
  FROM orders o LEFT JOIN lines l USING (o_orderkey)
)
SELECT o_orderkey, header_total, line_total,
       ROUND(header_total - line_total, 6) AS diff,
       ABS(ROUND(header_total - line_total, 6)) AS abs_diff
FROM j
ORDER BY abs_diff DESC, o_orderkey ASC
LIMIT 20
"""

ORACLES["q_burrows_delta"] = """
WITH toks AS (
  SELECT source, term FROM (
    SELECT source, UNNEST(string_split(text, ' ')) AS term FROM documents
  ) WHERE term <> ''
), top AS (
  SELECT term FROM (
    SELECT term, COUNT(*) AS f FROM toks GROUP BY term
    ORDER BY f DESC, term ASC LIMIT 30
  )
), per_src_tot AS (
  SELECT source, COUNT(*) AS tot FROM toks GROUP BY source
), freq AS (
  SELECT t.source, t.term,
         ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(p.tot), 9) AS rf
  FROM toks t
  JOIN top USING (term)
  JOIN per_src_tot p ON p.source = t.source
  GROUP BY t.source, t.term
), stats AS (
  SELECT term, COUNT(*) AS k,
         CAST(SUM(CAST(ROUND(rf * 1000000000) AS BIGINT)) AS DOUBLE) / 1000000000 AS s,
         CAST(SUM(CAST(ROUND(rf * rf * 1000000000) AS BIGINT)) AS DOUBLE) / 1000000000 AS ss
  FROM freq GROUP BY term
), z AS (
  SELECT f.source, f.term,
         ROUND((f.rf - st.s / CAST(st.k AS DOUBLE))
               / sqrt((CAST(st.k AS DOUBLE) * st.ss - st.s * st.s)
                      / (CAST(st.k AS DOUBLE) * CAST(st.k AS DOUBLE))), 6) AS z
  FROM freq f JOIN stats st USING (term)
  WHERE sqrt((CAST(st.k AS DOUBLE) * st.ss - st.s * st.s)
             / (CAST(st.k AS DOUBLE) * CAST(st.k AS DOUBLE))) > 0
)
SELECT a.source AS src_a, b.source AS src_b,
       ROUND((CAST(SUM(CAST(ROUND(ABS(a.z - b.z) * 1000000) AS BIGINT)) AS DOUBLE)
              / 1000000) / COUNT(*), 6) AS delta
FROM z a JOIN z b ON a.term = b.term AND a.source < b.source
GROUP BY a.source, b.source
ORDER BY src_a, src_b
"""


def _hits_iter_sql(k: int) -> str:
    p = k - 1
    return f"""araw{k} AS MATERIALIZED (
  SELECT e.dst AS node,
         CAST(SUM(CAST(ROUND(h.h * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS a
  FROM edges e JOIN h{p} h ON h.node = e.src GROUP BY e.dst
), a{k} AS MATERIALIZED (
  SELECT node, ROUND(a / (SELECT MAX(a) FROM araw{k}), 6) AS a FROM araw{k}
), hraw{k} AS MATERIALIZED (
  SELECT e.src AS node,
         CAST(SUM(CAST(ROUND(a.a * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS h
  FROM edges e JOIN a{k} a ON a.node = e.dst GROUP BY e.src
), h{k} AS MATERIALIZED (
  SELECT node, ROUND(h / (SELECT MAX(h) FROM hraw{k}), 6) AS h FROM hraw{k}
)"""


ORACLES["q_hits"] = f"""
WITH edges AS MATERIALIZED (
  SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,
         CAST(o_custkey + 1000000 AS BIGINT) AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), h0 AS (
  SELECT DISTINCT src AS node, 1.0 AS h FROM edges
), {', '.join(_hits_iter_sql(k) for k in range(1, 9))},
scored AS (
  SELECT 'hub' AS role, node, h AS score FROM h8
  UNION ALL
  SELECT 'authority' AS role, node, a AS score FROM a8
)
SELECT role, node, score, CAST(rank AS INTEGER) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY role
                               ORDER BY score DESC, node ASC) AS rank
  FROM scored
) WHERE rank <= 10
ORDER BY role, rank
"""

ORACLES["q_lead_lag_corr"] = f"""
WITH series AS (
  SELECT l_suppkey, CAST(l_shipdate AS DATE) AS d,
         ROUND({_dsum('l_extendedprice')} / COUNT(*), 6) AS close
  FROM lineitem WHERE l_suppkey IN (1, 2)
  GROUP BY l_suppkey, CAST(l_shipdate AS DATE)
), a AS (SELECT d, close AS x FROM series WHERE l_suppkey = 1),
b AS (SELECT d AS db, close AS y FROM series WHERE l_suppkey = 2),
lags AS (SELECT CAST(UNNEST(range(-5, 6)) AS INTEGER) AS lag),
j AS (
  SELECT l.lag, a.x, b.y
  FROM a CROSS JOIN lags l
  JOIN b ON a.d + TO_DAYS(l.lag) = b.db
), m AS (
  SELECT lag, COUNT(*) AS n_days,
         {_dsum('x')} AS sx, {_dsum('y')} AS sy,
         {_dsum('x * y')} AS sxy, {_dsum('x * x')} AS sxx,
         {_dsum('y * y')} AS syy
  FROM j GROUP BY lag
)
SELECT lag, CAST(n_days AS BIGINT) AS n_days,
       ROUND(CASE WHEN CAST(n_days AS DOUBLE) * sxx - sx * sx > 0
                   AND CAST(n_days AS DOUBLE) * syy - sy * sy > 0
                  THEN (CAST(n_days AS DOUBLE) * sxy - sx * sy)
                       / sqrt((CAST(n_days AS DOUBLE) * sxx - sx * sx)
                              * (CAST(n_days AS DOUBLE) * syy - sy * sy))
             END, 6) AS ccf
FROM m ORDER BY lag
"""

ORACLES["q_control_chart"] = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n_errors
  FROM events WHERE event_type = 'error'
  GROUP BY CAST(ts AS DATE)
), stats AS (
  SELECT CAST(SUM(n_errors) AS DOUBLE) / COUNT(*) AS mu FROM daily
)
SELECT strftime(d, '%Y-%m-%d') AS day, n_errors,
       ROUND(stats.mu, 6) AS center,
       ROUND(stats.mu + 3 * sqrt(stats.mu), 6) AS ucl,
       ROUND(GREATEST(stats.mu - 3 * sqrt(stats.mu), 0.0), 6) AS lcl,
       CAST(CASE WHEN n_errors > ROUND(stats.mu + 3 * sqrt(stats.mu), 6)
                   OR n_errors < ROUND(GREATEST(stats.mu - 3 * sqrt(stats.mu), 0.0), 6)
                 THEN 1 ELSE 0 END AS INTEGER) AS out_of_control
FROM daily CROSS JOIN stats
ORDER BY day
"""

ORACLES["q_simpsons_check"] = f"""
WITH src AS (
  SELECT l_returnflag, l_quantity, l_extendedprice / 1000.0 AS price_k
  FROM lineitem
), per AS (
  SELECT l_returnflag, COUNT(*) AS n,
         {_dsum('l_quantity')} AS sx, {_dsum('price_k')} AS sy,
         {_dsum('l_quantity * price_k')} AS sxy,
         {_dsum('l_quantity * l_quantity')} AS sxx,
         {_dsum('price_k * price_k')} AS syy
  FROM src GROUP BY l_returnflag
), pooled AS (
  SELECT COUNT(*) AS n,
         {_dsum('l_quantity')} AS sx, {_dsum('price_k')} AS sy,
         {_dsum('l_quantity * price_k')} AS sxy,
         {_dsum('l_quantity * l_quantity')} AS sxx,
         {_dsum('price_k * price_k')} AS syy
  FROM src
), rs AS (
  SELECT l_returnflag,
         ROUND(CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx > 0
                     AND CAST(n AS DOUBLE) * syy - sy * sy > 0
                    THEN (CAST(n AS DOUBLE) * sxy - sx * sy)
                         / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                                * (CAST(n AS DOUBLE) * syy - sy * sy))
               END, 6) AS r_stratum
  FROM per
), rp AS (
  SELECT ROUND(CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx > 0
                     AND CAST(n AS DOUBLE) * syy - sy * sy > 0
                    THEN (CAST(n AS DOUBLE) * sxy - sx * sy)
                         / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                                * (CAST(n AS DOUBLE) * syy - sy * sy))
               END, 6) AS r_pooled
  FROM pooled
)
SELECT rs.l_returnflag, rs.r_stratum, rp.r_pooled,
       CAST(CASE WHEN SIGN(rs.r_stratum) <> SIGN(rp.r_pooled)
                 THEN 1 ELSE 0 END AS INTEGER) AS sign_flip
FROM rs CROSS JOIN rp
ORDER BY rs.l_returnflag
"""

ORACLES["q_ab_srm"] = """
WITH per AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM events GROUP BY event_type
)
SELECT event_type, n_a, n_b,
       ROUND((n_a - CAST(n_a + n_b AS DOUBLE) / 2)
             * (n_a - CAST(n_a + n_b AS DOUBLE) / 2)
             / (CAST(n_a + n_b AS DOUBLE) / 2)
             + (n_b - CAST(n_a + n_b AS DOUBLE) / 2)
               * (n_b - CAST(n_a + n_b AS DOUBLE) / 2)
               / (CAST(n_a + n_b AS DOUBLE) / 2), 6) AS chi2,
       CAST(CASE WHEN (n_a - CAST(n_a + n_b AS DOUBLE) / 2)
                      * (n_a - CAST(n_a + n_b AS DOUBLE) / 2)
                      / (CAST(n_a + n_b AS DOUBLE) / 2)
                      + (n_b - CAST(n_a + n_b AS DOUBLE) / 2)
                        * (n_b - CAST(n_a + n_b AS DOUBLE) / 2)
                        / (CAST(n_a + n_b AS DOUBLE) / 2) > 3.841
                 THEN 1 ELSE 0 END AS INTEGER) AS srm_flag
FROM per ORDER BY event_type
"""

ORACLES["q_pvm_bridge"] = f"""
WITH per AS (
  SELECT l_partkey, CAST(year(CAST(l_shipdate AS DATE)) AS INTEGER) AS y,
         ROUND({_dsum('l_quantity')}, 6) AS q,
         ROUND({_dsum('l_extendedprice')}, 6) AS rev
  FROM lineitem
  WHERE year(CAST(l_shipdate AS DATE)) IN (1996, 1997)
  GROUP BY l_partkey, year(CAST(l_shipdate AS DATE))
), pp AS (
  SELECT l_partkey, y, q, rev, ROUND(rev / q, 6) AS p FROM per
), a AS (SELECT l_partkey, q AS q0, p AS p0, rev AS r0 FROM pp WHERE y = 1996),
b AS (SELECT l_partkey, q AS q1, p AS p1, rev AS r1 FROM pp WHERE y = 1997),
j AS (SELECT * FROM a FULL OUTER JOIN b USING (l_partkey))
SELECT
  ROUND({_dsum('COALESCE(r0, 0.0)')}, 6) AS rev_1996,
  ROUND({_dsum('COALESCE(r1, 0.0)')}, 6) AS rev_1997,
  ROUND({_dsum('CASE WHEN q0 IS NOT NULL AND q1 IS NOT NULL THEN (q1 - q0) * p0 ELSE 0.0 END')}, 6)
    AS volume_effect,
  ROUND({_dsum('CASE WHEN q0 IS NOT NULL AND q1 IS NOT NULL THEN (p1 - p0) * q0 ELSE 0.0 END')}, 6)
    AS price_effect,
  ROUND({_dsum('CASE WHEN q0 IS NOT NULL AND q1 IS NOT NULL THEN (q1 - q0) * (p1 - p0) ELSE 0.0 END')}, 6)
    AS mix_effect,
  ROUND({_dsum('CASE WHEN q0 IS NULL THEN r1 ELSE 0.0 END')}, 6) AS new_parts,
  ROUND({_dsum('CASE WHEN q1 IS NULL THEN r0 ELSE 0.0 END')}, 6) AS discontinued
FROM j
"""

ORACLES["q_fulfillment_lag"] = """
WITH j AS (
  SELECT o.o_orderpriority,
         CAST(datediff('day', CAST(o.o_orderdate AS DATE),
                       CAST(l.l_shipdate AS DATE)) AS DOUBLE) AS lag
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT o_orderpriority, COUNT(*) AS n_lines,
       ROUND(quantile_cont(lag, 0.5), 6) AS p50_days,
       ROUND(quantile_cont(lag, 0.9), 6) AS p90_days,
       ROUND(CAST(SUM(CASE WHEN lag <= 30 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS within_30d_rate
FROM j GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

_ISO_DIM = 64
_ISO_COMPS = ",\n         ".join(
    f"SUM(CAST(ROUND(CAST(embedding[{i+1}] AS DOUBLE) * 10000) AS BIGINT)) AS c{i}"
    for i in range(_ISO_DIM)
)
_ISO_MEANSQ = " + ".join(
    f"(CAST(c{i} AS DOUBLE) / 10000 / n_vecs) * (CAST(c{i} AS DOUBLE) / 10000 / n_vecs)"
    for i in range(_ISO_DIM)
)

ORACLES["q_embedding_isotropy"] = f"""
WITH agg AS (
  SELECT COUNT(*) AS n_vecs,
         ROUND((CAST(SUM(CAST(ROUND(sqrt(list_dot_product(
                    CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
                  * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) / COUNT(*), 6)
           AS avg_norm,
         {_ISO_COMPS}
  FROM embeddings
), m AS (
  SELECT CAST(n_vecs AS BIGINT) AS n_vecs, avg_norm,
         ROUND(sqrt({_ISO_MEANSQ}), 6) AS norm_of_mean
  FROM agg
)
SELECT n_vecs, avg_norm, norm_of_mean,
       ROUND(norm_of_mean / avg_norm, 6) AS anisotropy_ratio
FROM m
"""

ORACLES["q_ingestion_drift"] = """
WITH maxid AS (SELECT MAX(doc_id) AS m FROM documents),
feats AS (
  SELECT LEAST(10, CAST(FLOOR(doc_id * 10 / (maxid.m + 1)) AS INTEGER) + 1)
           AS cohort,
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
                   1.0) * 0.3, 6) AS q,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS en,
         CAST(length(text) AS DOUBLE) AS len
  FROM documents CROSS JOIN maxid
)
SELECT cohort, COUNT(*) AS n_docs,
       ROUND((CAST(SUM(CAST(ROUND(q * 1000000) AS BIGINT)) AS DOUBLE) / 1000000)
             / COUNT(q), 6) AS avg_quality,
       ROUND(CAST(SUM(en) AS DOUBLE) / COUNT(*), 6) AS en_share,
       ROUND((CAST(SUM(CAST(ROUND(len * 1000000) AS BIGINT)) AS DOUBLE) / 1000000)
             / COUNT(len), 6) AS avg_chars
FROM feats GROUP BY cohort ORDER BY cohort
"""

ORACLES["q_exposure_fairness"] = """
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
), hits AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT query_id, doc_id, ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY total_score DESC, doc_id ASC
           ) AS rank
    FROM totals
  ) WHERE rank <= 20
), labeled AS (
  SELECT d.lang, ROUND(1.0 / log2(CAST(h.rank AS DOUBLE) + 1.0), 6) AS w
  FROM hits h JOIN documents d USING (doc_id)
), per AS (
  SELECT lang, COUNT(*) AS n_results,
         (CAST(SUM(CAST(ROUND(w * 1000000) AS BIGINT)) AS DOUBLE) / 1000000)
           AS expo
  FROM labeled GROUP BY lang
), tot AS (
  SELECT SUM(n_results) AS nt,
         (CAST(SUM(CAST(ROUND(expo * 1000000) AS BIGINT)) AS DOUBLE) / 1000000)
           AS et
  FROM per
)
SELECT lang, n_results,
       ROUND(expo, 6) AS exposure,
       ROUND(CAST(n_results AS DOUBLE) / tot.nt, 6) AS result_share,
       ROUND(expo / tot.et, 6) AS exposure_share
FROM per CROSS JOIN tot
ORDER BY lang
"""

ORACLES["q_dedup_threshold_curve"] = """
WITH g AS (
  SELECT doc_id, UNNEST(list_distinct(
           list_transform(range(1, len(l) - 1),
                          x -> l[x] || ' ' || l[x+1] || ' ' || l[x+2])
         )) AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
), sizes AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id),
inter AS (
  SELECT ga.doc_id AS id_a, gb.doc_id AS id_b, COUNT(*) AS ninter
  FROM g ga JOIN g gb ON ga.gram = gb.gram AND ga.doc_id < gb.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT ROUND(CAST(i.ninter AS DOUBLE)
               / (sa.n + sb.n - i.ninter), 6) AS jac
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.id_a
  JOIN sizes sb ON sb.doc_id = i.id_b
  WHERE CAST(i.ninter AS DOUBLE) / (sa.n + sb.n - i.ninter) >= 0.3
), per AS (
  SELECT LEAST(9, CAST(FLOOR(jac * 10) AS INTEGER)) AS band,
         COUNT(*) AS n_pairs
  FROM pairs GROUP BY 1
)
SELECT CAST(band AS DOUBLE) / 10 AS threshold, n_pairs,
       CAST(SUM(n_pairs) OVER (ORDER BY band DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_pairs_at_or_above
FROM per ORDER BY threshold
"""

ORACLES["q_fk_orphans"] = """
WITH e1 AS (
  SELECT 'lineitem->orders' AS fk_edge, COUNT(*) AS n_child_rows,
         CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_orphans
  FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
    ON l.l_orderkey = o.o_orderkey
), e2 AS (
  SELECT 'lineitem->part', COUNT(*),
         CAST(SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem l LEFT JOIN (SELECT DISTINCT p_partkey FROM part) p
    ON l.l_partkey = p.p_partkey
), e3 AS (
  SELECT 'lineitem->supplier', COUNT(*),
         CAST(SUM(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem l LEFT JOIN (SELECT DISTINCT s_suppkey FROM supplier) s
    ON l.l_suppkey = s.s_suppkey
), e4 AS (
  SELECT 'orders->customer', COUNT(*),
         CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
    ON o.o_custkey = c.c_custkey
), e5 AS (
  SELECT 'customer->nation', COUNT(*),
         CAST(SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM customer c LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation) n
    ON c.c_nationkey = n.n_nationkey
), e6 AS (
  SELECT 'nation->region', COUNT(*),
         CAST(SUM(CASE WHEN r.r_regionkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM nation n LEFT JOIN (SELECT DISTINCT r_regionkey FROM region) r
    ON n.n_regionkey = r.r_regionkey
), u AS (
  SELECT * FROM e1 UNION ALL SELECT * FROM e2 UNION ALL SELECT * FROM e3
  UNION ALL SELECT * FROM e4 UNION ALL SELECT * FROM e5 UNION ALL SELECT * FROM e6
)
SELECT fk_edge, n_child_rows, n_orphans,
       ROUND(CAST(n_orphans AS DOUBLE) / n_child_rows, 6) AS orphan_rate
FROM u ORDER BY fk_edge
"""

ORACLES["q_duplicate_payments"] = """
SELECT o_custkey, ROUND(o_totalprice, 2) AS amount,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
       COUNT(*) AS n_orders,
       CAST(MIN(o_orderkey) AS BIGINT) AS first_orderkey,
       CAST(MAX(o_orderkey) AS BIGINT) AS last_orderkey
FROM orders
GROUP BY o_custkey, ROUND(o_totalprice, 2),
         strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')
HAVING COUNT(*) >= 2
ORDER BY o_custkey, amount, order_date
"""

ORACLES["q_seasonality_index"] = f"""
WITH daily AS (
  SELECT CAST(l_shipdate AS DATE) AS d,
         ROUND({_dsum('l_extendedprice')}, 6) AS rev
  FROM lineitem GROUP BY CAST(l_shipdate AS DATE)
), per_m AS (
  SELECT CAST(month(d) AS INTEGER) AS month, COUNT(*) AS n_days,
         ROUND({_dsum('rev')} / COUNT(*), 6) AS avg_daily_rev
  FROM daily GROUP BY month(d)
), overall AS (
  SELECT ROUND({_dsum('rev')} / COUNT(*), 6) AS o FROM daily
)
SELECT month, n_days, avg_daily_rev,
       ROUND(avg_daily_rev / overall.o, 6) AS "index"
FROM per_m CROSS JOIN overall
ORDER BY month
"""

ORACLES["q_price_dispersion"] = f"""
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         ROUND({_dsum('l_quantity')}, 6) AS q,
         ROUND({_dsum('l_extendedprice')}, 6) AS rev
  FROM lineitem GROUP BY l_partkey, l_suppkey
), pu AS (
  SELECT l_partkey, l_suppkey, q, rev, ROUND(rev / q, 6) AS unit FROM ps
), per_part AS (
  SELECT l_partkey, COUNT(*) AS n_suppliers,
         ROUND({_dsum('q')}, 6) AS volume,
         ROUND({_dsum('rev')}, 6) AS trev,
         ROUND(MIN(unit), 6) AS min_unit_price
  FROM pu GROUP BY l_partkey
)
SELECT l_partkey, n_suppliers, volume,
       ROUND(trev / volume, 6) AS mean_unit_price,
       min_unit_price,
       ROUND((ROUND(trev / volume, 6) - min_unit_price) * volume, 6)
         AS savings_potential
FROM per_part
WHERE n_suppliers >= 2
ORDER BY savings_potential DESC, l_partkey ASC
LIMIT 20
"""

ORACLES["q_image_dims"] = """
WITH payloads AS (
  SELECT doc_id,
         upper(concat('89504E470D0A1A0A', '0000000D', '49484452',
                lpad(to_hex(100 + doc_id % 400), 8, '0'),
                lpad(to_hex(100 + (doc_id * 7) % 300), 8, '0'),
                '0806000000')) AS hx
  FROM documents
), parsed AS (
  SELECT ('0x' || substring(hx, 33, 8))::BIGINT AS w,
         ('0x' || substring(hx, 41, 8))::BIGINT AS h
  FROM payloads
), oriented AS (
  SELECT CASE WHEN w > h THEN 'landscape'
              WHEN w < h THEN 'portrait'
              ELSE 'square' END AS orientation,
         w, h, ROUND(CAST(w AS DOUBLE) * h / 1000000, 6) AS mp
  FROM parsed
)
SELECT orientation, COUNT(*) AS n_images,
       ROUND((CAST(SUM(CAST(ROUND(CAST(w AS DOUBLE) * 1000000) AS BIGINT)) AS DOUBLE)
              / 1000000) / COUNT(*), 6) AS avg_width,
       ROUND((CAST(SUM(CAST(ROUND(CAST(h AS DOUBLE) * 1000000) AS BIGINT)) AS DOUBLE)
              / 1000000) / COUNT(*), 6) AS avg_height,
       ROUND((CAST(SUM(CAST(ROUND(mp * 1000000) AS BIGINT)) AS DOUBLE)
              / 1000000) / COUNT(*), 6) AS avg_megapixels
FROM oriented GROUP BY orientation ORDER BY orientation
"""

ORACLES["q_audio_meta"] = """
WITH params AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0 THEN 8000
              WHEN doc_id % 4 = 1 THEN 16000
              WHEN doc_id % 4 = 2 THEN 44100
              ELSE 48000 END AS sr,
         1 + doc_id % 2 AS ch,
         1 + doc_id % 30 AS secs
  FROM documents
), payloads AS (
  -- the oracle parses the same canonical header fields; building and
  -- re-reading little-endian hex is an identity on (sr, ch, bytes), so
  -- the parse is mirrored arithmetically
  SELECT sr AS sample_rate, ch,
         CAST(sr * 2 * ch * secs AS BIGINT) AS data_bytes
  FROM params
), parsed AS (
  SELECT sample_rate, ch,
         ROUND(CAST(data_bytes AS DOUBLE)
               / CAST(sample_rate * 2 * ch AS DOUBLE), 6) AS s
  FROM payloads
)
SELECT CAST(sample_rate AS BIGINT) AS sample_rate, COUNT(*) AS n_files,
       ROUND((CAST(SUM(CAST(ROUND(s * 1000000) AS BIGINT)) AS DOUBLE) / 1000000)
             / 3600, 6) AS total_hours,
       ROUND(quantile_cont(s, 0.5), 6) AS p50_seconds,
       ROUND(CAST(SUM(CASE WHEN ch = 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS stereo_share
FROM parsed GROUP BY sample_rate ORDER BY sample_rate
"""

ORACLES["q_video_meta"] = """
WITH params AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'isom'
              WHEN doc_id % 3 = 1 THEN 'mp42'
              ELSE 'qt' END AS brand,
         600 AS ts,
         CAST(600 * (5 + doc_id % 120) AS BIGINT) AS ticks
  FROM documents
), parsed AS (
  SELECT brand, ROUND(CAST(ticks AS DOUBLE) / CAST(ts AS DOUBLE), 6) AS s
  FROM params
)
SELECT brand, COUNT(*) AS n_clips,
       ROUND((CAST(SUM(CAST(ROUND(s * 1000000) AS BIGINT)) AS DOUBLE) / 1000000)
             / 3600, 6) AS total_hours,
       ROUND(quantile_cont(s, 0.5), 6) AS p50_seconds
FROM parsed GROUP BY brand ORDER BY brand
"""

ORACLES["q_script_mismatch"] = """
WITH feats AS (
  SELECT lang,
         ROUND((CAST(length(text) AS DOUBLE)
                - CAST(length(regexp_replace(text, '[\\x00-\\x7F]', '', 'g'))
                       AS DOUBLE))
               / CAST(length(text) AS DOUBLE), 6) AS a
  FROM documents
)
SELECT lang, COUNT(*) AS n_docs,
       ROUND((CAST(SUM(CAST(ROUND(a * 1000000) AS BIGINT)) AS DOUBLE) / 1000000)
             / COUNT(a), 6) AS avg_ascii_share,
       CAST(SUM(CASE WHEN a >= 0.999999 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pure_ascii
FROM feats GROUP BY lang ORDER BY lang
"""

ORACLES["q_below_list_price"] = f"""
WITH j AS (
  SELECT p.p_brand,
         CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) / l.l_quantity
                    * 1000000 + 0.5) AS BIGINT) AS u6,
         CAST(FLOOR(p.p_retailprice * 1000000 + 0.5) AS BIGINT) AS l6,
         l.l_quantity AS q
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
)
SELECT p_brand, COUNT(*) AS n_lines,
       CAST(SUM(CASE WHEN u6 < l6 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_below_list,
       ROUND(CAST(SUM(CASE WHEN u6 < l6 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS below_list_rate,
       ROUND(CAST(SUM(CASE WHEN u6 < l6
                      THEN (l6 - u6) * CAST(q AS BIGINT)
                      ELSE 0 END) AS DOUBLE) / 1000000, 6)
         AS revenue_leakage
FROM j GROUP BY p_brand ORDER BY p_brand
"""

ORACLES["q_lsh_s_curve"] = """
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
  SELECT i.id_a, i.id_b,
         ROUND(CAST(i.ninter AS DOUBLE) / (sa.n + sb.n - i.ninter), 6) AS jac
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.id_a
  JOIN sizes sb ON sb.doc_id = i.id_b
  WHERE CAST(i.ninter AS DOUBLE) / (sa.n + sb.n - i.ninter) >= 0.3
),
j AS (
  SELECT t.jac, CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END AS hit
  FROM truth t LEFT JOIN cand c ON c.id_a = t.id_a AND c.id_b = t.id_b
),
per AS (
  SELECT LEAST(9, CAST(FLOOR(jac * 10) AS INTEGER)) AS band,
         COUNT(*) AS n_true,
         CAST(SUM(hit) AS BIGINT) AS n_caught
  FROM j GROUP BY 1
)
SELECT CAST(band AS DOUBLE) / 10 AS jac_band, n_true, n_caught,
       ROUND(CAST(n_caught AS DOUBLE) / n_true, 6) AS observed_rate,
       list_extract([2.5e-05, 0.002023, 0.015534, 0.058687, 0.154209, 0.318779, 0.544575, 0.78163, 0.947798, 0.998816], band + 1) AS theoretical_rate
FROM per ORDER BY jac_band
"""

ORACLES["q_window_distinct"] = """
WITH ranked AS (
  SELECT l_suppkey,
         len(list_distinct(array_agg(l_partkey) OVER w)) AS distinct_parts_20,
         ROW_NUMBER() OVER (PARTITION BY l_suppkey
                            ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn,
         COUNT(*) OVER (PARTITION BY l_suppkey) AS mx
  FROM lineitem
  WHERE l_suppkey <= 10
  WINDOW w AS (PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
)
SELECT l_suppkey, CAST(rn AS BIGINT) AS seq,
       CAST(distinct_parts_20 AS BIGINT) AS distinct_parts_20
FROM ranked WHERE rn > mx - 5
ORDER BY l_suppkey, seq
"""

ORACLES["q_grouping_id"] = """
SELECT r_name, n_name, COUNT(*) AS n_cust,
       CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS BIGINT) AS level_id
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY level_id, r_name, n_name
"""

ORACLES["q_collocations"] = """
WITH toks AS (SELECT string_split(text, ' ') AS l FROM documents),
uni AS (
  SELECT w, COUNT(*) AS uf
  FROM (SELECT UNNEST(l) AS w FROM toks) WHERE w <> ''
  GROUP BY w
), n_uni AS (SELECT SUM(uf) AS nu FROM uni),
bi AS (
  SELECT g, COUNT(*) AS bf
  FROM (SELECT UNNEST(list_transform(range(1, len(l)),
                                     x -> l[x] || ' ' || l[x+1])) AS g
        FROM toks)
  GROUP BY g HAVING COUNT(*) >= 5
), n_bi AS (SELECT SUM(bf) AS nb FROM bi),
scored AS (
  SELECT b.g AS bigram, b.bf AS n_pair,
         ROUND(log2((CAST(b.bf AS DOUBLE) / n_bi.nb)
                    / ((CAST(u1.uf AS DOUBLE) / n_uni.nu)
                       * (CAST(u2.uf AS DOUBLE) / n_uni.nu))), 6) AS pmi
  FROM bi b
  JOIN uni u1 ON u1.w = string_split(b.g, ' ')[1]
  JOIN uni u2 ON u2.w = string_split(b.g, ' ')[2]
  CROSS JOIN n_bi CROSS JOIN n_uni
)
SELECT bigram, n_pair, pmi FROM scored
ORDER BY pmi DESC, bigram ASC
LIMIT 20
"""

ORACLES["q_overdispersion"] = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS n
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), m AS (
  SELECT event_type, COUNT(*) AS n_days,
         SUM(n) AS s, SUM(n * n) AS ss
  FROM daily GROUP BY event_type
)
SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
       ROUND(CAST(s AS DOUBLE) / n_days, 6) AS mean_daily,
       ROUND(CAST(ss AS DOUBLE) / n_days
             - (CAST(s AS DOUBLE) / n_days) * (CAST(s AS DOUBLE) / n_days), 6)
         AS var_daily,
       ROUND((CAST(ss AS DOUBLE) / n_days
              - (CAST(s AS DOUBLE) / n_days) * (CAST(s AS DOUBLE) / n_days))
             / (CAST(s AS DOUBLE) / n_days), 6) AS fano,
       CAST(CASE WHEN (CAST(ss AS DOUBLE) / n_days
                       - (CAST(s AS DOUBLE) / n_days) * (CAST(s AS DOUBLE) / n_days))
                      / (CAST(s AS DOUBLE) / n_days) > 1.5
                 THEN 1 ELSE 0 END AS INTEGER) AS overdispersed
FROM m ORDER BY event_type
"""

ORACLES["q_dp_release"] = """
WITH per AS (
  SELECT c_nationkey, COUNT(*) AS true_count
  FROM customer GROUP BY c_nationkey
), noised AS (
  SELECT c_nationkey, true_count,
         ('0x' || substr(md5(concat('dp|', CAST(c_nationkey AS VARCHAR))), 1, 15))::BIGINT
           / CAST(1152921504606846976 AS DOUBLE) - 0.5 AS centered
  FROM per
)
SELECT c_nationkey, true_count,
       ROUND(-1.0 * SIGN(centered) * LN(1.0 - 2.0 * ABS(centered)), 6) AS noise,
       ROUND(true_count
             + ROUND(-1.0 * SIGN(centered) * LN(1.0 - 2.0 * ABS(centered)), 6), 6)
         AS released_count
FROM noised ORDER BY c_nationkey
"""

ORACLES["q_decision_stump"] = """
WITH o AS (
  SELECT o_totalprice AS x,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
  FROM orders
), thr AS (
  SELECT ROUND(UNNEST(quantile_cont(x, [0.1, 0.2, 0.3, 0.4, 0.5,
                                        0.6, 0.7, 0.8, 0.9])), 6) AS threshold
  FROM o
), per AS (
  SELECT t.threshold,
         CAST(SUM(CASE WHEN o.x <= t.threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_l,
         CAST(SUM(CASE WHEN o.x <= t.threshold AND o.y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS p_l,
         CAST(SUM(CASE WHEN o.x > t.threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_r,
         CAST(SUM(CASE WHEN o.x > t.threshold AND o.y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS p_r
  FROM o CROSS JOIN thr t
  GROUP BY t.threshold
), scored AS (
  SELECT threshold, n_l, n_r,
         ROUND(1.0 - (CAST(p_l + p_r AS DOUBLE) / (n_l + n_r))
                     * (CAST(p_l + p_r AS DOUBLE) / (n_l + n_r))
                   - (1.0 - CAST(p_l + p_r AS DOUBLE) / (n_l + n_r))
                     * (1.0 - CAST(p_l + p_r AS DOUBLE) / (n_l + n_r)), 6)
           AS gini_parent,
         ROUND((1.0 - (CAST(p_l + p_r AS DOUBLE) / (n_l + n_r))
                      * (CAST(p_l + p_r AS DOUBLE) / (n_l + n_r))
                    - (1.0 - CAST(p_l + p_r AS DOUBLE) / (n_l + n_r))
                      * (1.0 - CAST(p_l + p_r AS DOUBLE) / (n_l + n_r)))
               - (CAST(n_l AS DOUBLE) / (n_l + n_r)
                  * (1.0 - (CAST(p_l AS DOUBLE) / n_l) * (CAST(p_l AS DOUBLE) / n_l)
                         - (1.0 - CAST(p_l AS DOUBLE) / n_l)
                           * (1.0 - CAST(p_l AS DOUBLE) / n_l))
                  + CAST(n_r AS DOUBLE) / (n_l + n_r)
                    * (1.0 - (CAST(p_r AS DOUBLE) / n_r) * (CAST(p_r AS DOUBLE) / n_r)
                           - (1.0 - CAST(p_r AS DOUBLE) / n_r)
                             * (1.0 - CAST(p_r AS DOUBLE) / n_r))), 9)
           AS gini_gain
  FROM per WHERE n_l > 0 AND n_r > 0
)
SELECT threshold, n_l, n_r, gini_parent, gini_gain
FROM scored
ORDER BY gini_gain DESC, threshold ASC
LIMIT 1
"""

ORACLES["q_naive_bayes"] = """
WITH train AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
test AS (SELECT * FROM documents WHERE doc_id % 2 = 1),
ttok AS (
  SELECT lang, term FROM (
    SELECT lang, UNNEST(string_split(text, ' ')) AS term FROM train
  ) WHERE term <> ''
), cnt AS (
  SELECT lang, term, COUNT(*) AS c FROM ttok GROUP BY lang, term
), tot AS (
  SELECT lang, SUM(c) AS tot FROM cnt GROUP BY lang
), vocab AS (SELECT COUNT(DISTINCT term) AS v FROM ttok),
prior AS (
  SELECT lang,
         CAST(ROUND(LN(CAST(nd AS DOUBLE) / n) * 1000000000) AS BIGINT)
           AS logprior
  FROM (SELECT lang, COUNT(*) AS nd FROM train GROUP BY lang)
  CROSS JOIN (SELECT COUNT(*) AS n FROM train)
), lstats AS (
  SELECT tot.lang, tot.tot, vocab.v,
         CAST(ROUND(LN(1.0 / CAST(tot.tot + vocab.v AS DOUBLE)) * 1000000000)
              AS BIGINT) AS fl
  FROM tot CROSS JOIN vocab
), ll AS (
  SELECT c.lang, c.term,
         CAST(ROUND(LN(CAST(c.c + 1 AS DOUBLE)
                       / CAST(s.tot + s.v AS DOUBLE)) * 1000000000)
              AS BIGINT) AS ll
  FROM cnt c JOIN lstats s ON s.lang = c.lang
), ttest AS (
  SELECT doc_id, true_lang, term FROM (
    SELECT doc_id, lang AS true_lang,
           UNNEST(string_split(text, ' ')) AS term
    FROM test
  ) WHERE term <> ''
), cand AS (
  SELECT t.doc_id, t.true_lang, t.term, s.lang AS cl, s.fl
  FROM ttest t CROSS JOIN lstats s
), scored AS (
  SELECT c.doc_id, c.true_lang, c.cl,
         CAST(SUM(COALESCE(l.ll, c.fl)) AS BIGINT) AS s
  FROM cand c
  LEFT JOIN ll l ON l.lang = c.cl AND l.term = c.term
  GROUP BY c.doc_id, c.true_lang, c.cl
), with_prior AS (
  SELECT s.doc_id, s.true_lang, s.cl, s.s + p.logprior AS score
  FROM scored s JOIN prior p ON p.lang = s.cl
), pred AS (
  SELECT true_lang, cl AS pred_lang FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                 ORDER BY score DESC, cl ASC) AS rn
    FROM with_prior
  ) WHERE rn = 1
)
SELECT true_lang, pred_lang, COUNT(*) AS n_docs
FROM pred GROUP BY true_lang, pred_lang
ORDER BY true_lang, pred_lang
"""


def _logreg_iter_sql(k: int) -> str:
    p = k - 1
    return f"""g{k} AS MATERIALIZED (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(ROUND((o.y - 1.0 / (1.0 + EXP(-(CAST(w.w0 AS DOUBLE) / 1000000000
                 + CAST(w.w1 AS DOUBLE) / 1000000000 * o.x))))
                 * 1000000000) AS BIGINT)) AS BIGINT) AS s0,
         CAST(SUM(CAST(ROUND((o.y - 1.0 / (1.0 + EXP(-(CAST(w.w0 AS DOUBLE) / 1000000000
                 + CAST(w.w1 AS DOUBLE) / 1000000000 * o.x)))) * o.x
                 * 1000000000) AS BIGINT)) AS BIGINT) AS s1,
         MAX(w.w0) AS w0, MAX(w.w1) AS w1
  FROM odata o CROSS JOIN w{p} w
), w{k} AS MATERIALIZED (
  SELECT CAST(w0 + CAST(ROUND(1.0 * s0 / n) AS BIGINT) AS BIGINT) AS w0,
         CAST(w1 + CAST(ROUND(1.0 * s1 / n) AS BIGINT) AS BIGINT) AS w1
  FROM g{k}
)"""


ORACLES["q_logreg_gd"] = f"""
WITH odata AS MATERIALIZED (
  SELECT o_totalprice / 100000 AS x,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
  FROM orders
), w0_init AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1),
w0 AS (SELECT * FROM w0_init),
{', '.join(_logreg_iter_sql(k) for k in range(1, 9))}
SELECT ROUND(CAST(MAX(w.w0) AS DOUBLE) / 1000000000, 6) AS w0,
       ROUND(CAST(MAX(w.w1) AS DOUBLE) / 1000000000, 6) AS w1,
       ROUND(-(CAST(SUM(CAST(ROUND((o.y * LN(1.0 / (1.0 + EXP(-(CAST(w.w0 AS DOUBLE) / 1000000000
               + CAST(w.w1 AS DOUBLE) / 1000000000 * o.x))))
               + (1 - o.y) * LN(1.0 - 1.0 / (1.0 + EXP(-(CAST(w.w0 AS DOUBLE) / 1000000000
               + CAST(w.w1 AS DOUBLE) / 1000000000 * o.x)))))
               * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) / COUNT(*), 6)
         AS log_loss,
       ROUND(CAST(SUM(CASE WHEN (CASE WHEN 1.0 / (1.0 + EXP(-(CAST(w.w0 AS DOUBLE) / 1000000000
               + CAST(w.w1 AS DOUBLE) / 1000000000 * o.x))) >= 0.5 THEN 1 ELSE 0 END) = o.y
               THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS accuracy
FROM odata o CROSS JOIN w8 w
"""

ORACLES["q_silhouette"] = """
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
route2 AS (
  SELECT e.vec_id, c.cell,
         ROUND(list_dot_product(e.vec, c.cvec)
               / (sqrt(list_dot_product(e.vec, e.vec))
                  * sqrt(list_dot_product(c.cvec, c.cvec))), 6) AS csim,
         list_dot_product(e.vec, c.cvec)
           / (sqrt(list_dot_product(e.vec, e.vec))
              * sqrt(list_dot_product(c.cvec, c.cvec))) AS craw
  FROM e CROSS JOIN cent c
),
ranked AS (
  SELECT vec_id, cell, craw,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY csim DESC, cell ASC) AS rn
  FROM route2
),
ab AS (
  SELECT o.vec_id, o.cell AS cluster,
         ROUND(1.0 - o.craw, 6) AS a,
         ROUND(1.0 - t.craw, 6) AS b
  FROM (SELECT * FROM ranked WHERE rn = 1) o
  JOIN (SELECT * FROM ranked WHERE rn = 2) t USING (vec_id)
),
scored AS (
  SELECT cluster,
         ROUND((b - a) / GREATEST(a, b), 6) AS s
  FROM ab
)
SELECT CAST(cluster AS BIGINT) AS cluster, COUNT(*) AS n_vecs,
       ROUND((CAST(SUM(CAST(ROUND(s * 1000000) AS BIGINT)) AS DOUBLE) / 1000000)
             / COUNT(s), 6) AS avg_silhouette
FROM scored GROUP BY cluster ORDER BY cluster
"""

ORACLES["q_knn_classifier"] = """
WITH q AS (
  SELECT vec_id AS q_id, label AS true_label, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < 50
), c AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS ce
  FROM embeddings WHERE vec_id >= 50
), s AS (
  SELECT q.q_id, q.true_label, c.label,
         ROUND(list_dot_product(c.ce, q.qe)
               / (sqrt(list_dot_product(c.ce, c.ce))
                  * sqrt(list_dot_product(q.qe, q.qe))), 6) AS sim,
         c.vec_id
  FROM c, q
), nn AS (
  SELECT q_id, true_label, label FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                 ORDER BY sim DESC, vec_id ASC) AS rn
    FROM s) WHERE rn <= 5
), votes AS (
  SELECT q_id, MAX(true_label) AS true_label, label AS pred_label,
         COUNT(*) AS v
  FROM nn GROUP BY q_id, label
), pred AS (
  SELECT true_label, pred_label FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                 ORDER BY v DESC, pred_label ASC) AS rn
    FROM votes) WHERE rn = 1
)
SELECT true_label, pred_label, COUNT(*) AS n_vecs
FROM pred GROUP BY true_label, pred_label
ORDER BY true_label, pred_label
"""

ORACLES["q_bytes_per_token"] = """
WITH feats AS (
  SELECT lang,
         CAST(octet_length(encode(text)) AS DOUBLE) AS b,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS t,
         CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))
              AS DOUBLE) AS p
  FROM documents
)
SELECT lang, COUNT(*) AS n_docs,
       ROUND((CAST(SUM(CAST(ROUND(b * 1000000) AS BIGINT)) AS DOUBLE) / 1000000)
             / (CAST(SUM(CAST(ROUND(t * 1000000) AS BIGINT)) AS DOUBLE) / 1000000), 6)
         AS bytes_per_ws_token,
       ROUND((CAST(SUM(CAST(ROUND(b * 1000000) AS BIGINT)) AS DOUBLE) / 1000000)
             / (CAST(SUM(CAST(ROUND(p * 1000000) AS BIGINT)) AS DOUBLE) / 1000000), 6)
         AS bytes_per_bpe_token
FROM feats GROUP BY lang ORDER BY lang
"""

ORACLES["q_vocab_overlap_langs"] = """
WITH lt AS (
  SELECT DISTINCT lang, t FROM (
    SELECT lang, UNNEST(list_distinct(string_split(text, ' '))) AS t
    FROM documents
  ) WHERE t <> ''
), sizes AS (SELECT lang, COUNT(*) AS n FROM lt GROUP BY lang),
inter AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b, COUNT(*) AS n_shared
  FROM lt a JOIN lt b ON a.t = b.t AND a.lang < b.lang
  GROUP BY a.lang, b.lang
)
SELECT i.lang_a, i.lang_b, i.n_shared,
       ROUND(CAST(i.n_shared AS DOUBLE)
             / (sa.n + sb.n - i.n_shared), 6) AS vocab_jaccard
FROM inter i
JOIN sizes sa ON sa.lang = i.lang_a
JOIN sizes sb ON sb.lang = i.lang_b
ORDER BY lang_a, lang_b
"""

ORACLES["q_topk_stability"] = """
WITH pf AS (
  SELECT l_partkey,
         CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 2))::BIGINT % 10
              AS INTEGER) AS f,
         CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 1000000)
                       AS BIGINT)) AS BIGINT) AS rev_u
  FROM lineitem
  GROUP BY l_partkey,
           CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 2))::BIGINT % 10
                AS INTEGER)
), tot AS (
  SELECT l_partkey, CAST(SUM(rev_u) AS BIGINT) AS tot_u FROM pf GROUP BY l_partkey
), folds AS (SELECT CAST(UNNEST(range(0, 10)) AS INTEGER) AS lo),
variants AS (
  SELECT t.l_partkey, fo.lo,
         t.tot_u - COALESCE(p.rev_u, 0) AS lo_rev
  FROM tot t CROSS JOIN folds fo
  LEFT JOIN pf p ON p.l_partkey = t.l_partkey AND p.f = fo.lo
), in_top AS (
  SELECT l_partkey, COUNT(*) AS n_variants_top20 FROM (
    SELECT l_partkey, lo,
           ROW_NUMBER() OVER (PARTITION BY lo
                              ORDER BY lo_rev DESC, l_partkey ASC) AS rn
    FROM variants
  ) WHERE rn <= 20 GROUP BY l_partkey
), full_top AS (
  SELECT l_partkey, CAST(rn AS INTEGER) AS full_rank,
         ROUND(CAST(tot_u AS DOUBLE) / 1000000, 6) AS revenue
  FROM (SELECT l_partkey, tot_u,
               ROW_NUMBER() OVER (ORDER BY tot_u DESC, l_partkey ASC) AS rn
        FROM tot)
  WHERE rn <= 20
)
SELECT f.l_partkey, f.full_rank, f.revenue,
       CAST(COALESCE(i.n_variants_top20, 0) AS BIGINT) AS n_variants_top20,
       ROUND(CAST(COALESCE(i.n_variants_top20, 0) AS DOUBLE) / 10, 6) AS stability
FROM full_top f LEFT JOIN in_top i USING (l_partkey)
ORDER BY full_rank
"""

ORACLES["q_runs_test"] = f"""
WITH daily AS (
  SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS day,
         ROUND({_dsum('l_extendedprice')} / COUNT(*), 6) AS close
  FROM lineitem
  GROUP BY strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')
), rets AS (
  SELECT day, r, CASE WHEN r > 0 THEN 1 ELSE 0 END AS s FROM (
    SELECT day, ROUND(close / LAG(close) OVER (ORDER BY day) - 1, 6) AS r
    FROM daily
  ) WHERE r IS NOT NULL AND r <> 0
), runs AS (
  SELECT s,
         CASE WHEN LAG(s) OVER (ORDER BY day) IS NULL
                OR LAG(s) OVER (ORDER BY day) <> s THEN 1 ELSE 0 END AS new_run
  FROM rets
), agg AS (
  SELECT CAST(SUM(s) AS BIGINT) AS n_pos,
         CAST(SUM(1 - s) AS BIGINT) AS n_neg,
         CAST(SUM(new_run) AS BIGINT) AS n_runs
  FROM runs
)
SELECT n_pos, n_neg, n_runs,
       ROUND(2.0 * n_pos * n_neg / (n_pos + n_neg) + 1.0, 6) AS expected_runs,
       ROUND((CAST(n_runs AS DOUBLE) - (2.0 * n_pos * n_neg / (n_pos + n_neg) + 1.0))
             / sqrt((2.0 * n_pos * n_neg / (n_pos + n_neg) + 1.0 - 1.0)
                    * (2.0 * n_pos * n_neg / (n_pos + n_neg) + 1.0 - 2.0)
                    / (CAST(n_pos + n_neg AS DOUBLE) - 1.0)), 6) AS z_score
FROM agg
"""

ORACLES["q_amihud"] = f"""
WITH daily AS (
  SELECT l_suppkey, strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS day,
         ROUND({_dsum('l_extendedprice')} / COUNT(*), 6) AS close,
         ROUND({_dsum('l_quantity')}, 6) AS vol
  FROM lineitem WHERE l_suppkey <= 20
  GROUP BY l_suppkey, strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')
), rets AS (
  SELECT l_suppkey,
         ROUND(ABS(r) / vol * 1000000, 6) AS illiq
  FROM (
    SELECT l_suppkey, vol,
           ROUND(close / LAG(close) OVER (PARTITION BY l_suppkey ORDER BY day)
                 - 1, 6) AS r
    FROM daily
  ) WHERE r IS NOT NULL AND vol > 0
)
SELECT l_suppkey, COUNT(*) AS n_days,
       ROUND((CAST(SUM(CAST(ROUND(illiq * 1000000) AS BIGINT)) AS DOUBLE) / 1000000)
             / COUNT(illiq), 6) AS amihud_illiq
FROM rets GROUP BY l_suppkey
ORDER BY amihud_illiq DESC, l_suppkey ASC
LIMIT 10
"""

ORACLES["q_cohens_d"] = """
WITH agg AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS na,
         (CAST(SUM(CASE WHEN user_id % 2 = 0
                        THEN CAST(ROUND(value * 1000000) AS BIGINT)
                        ELSE 0 END) AS DOUBLE) / 1000000) AS sa,
         (CAST(SUM(CASE WHEN user_id % 2 = 0
                        THEN CAST(ROUND(value * value * 1000000) AS BIGINT)
                        ELSE 0 END) AS DOUBLE) / 1000000) AS ssa,
         CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS nb,
         (CAST(SUM(CASE WHEN user_id % 2 = 1
                        THEN CAST(ROUND(value * 1000000) AS BIGINT)
                        ELSE 0 END) AS DOUBLE) / 1000000) AS sb,
         (CAST(SUM(CASE WHEN user_id % 2 = 1
                        THEN CAST(ROUND(value * value * 1000000) AS BIGINT)
                        ELSE 0 END) AS DOUBLE) / 1000000) AS ssb
  FROM events GROUP BY event_type
), c AS (
  SELECT event_type,
         sa / na - sb / nb AS mean_diff,
         (sa / na - sb / nb)
           / sqrt(((na - 1) * ((ssa - sa * sa / na) / (na - 1))
                   + (nb - 1) * ((ssb - sb * sb / nb) / (nb - 1)))
                  / (na + nb - 2)) AS d
  FROM agg
)
SELECT event_type,
       ROUND(mean_diff, 6) AS mean_diff,
       ROUND(d, 6) AS cohens_d,
       CASE WHEN ABS(d) < 0.2 THEN 'negligible'
            WHEN ABS(d) < 0.5 THEN 'small'
            WHEN ABS(d) < 0.8 THEN 'medium'
            ELSE 'large' END AS effect_band
FROM c ORDER BY event_type
"""

ORACLES["q_price_stickiness"] = f"""
WITH pm AS (
  SELECT l_partkey, strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS m,
         ROUND(ROUND({_dsum('l_extendedprice')}, 6)
               / ROUND({_dsum('l_quantity')}, 6), 6) AS unit
  FROM lineitem GROUP BY l_partkey, strftime(CAST(l_shipdate AS DATE), '%Y-%m')
), ch AS (
  SELECT l_partkey,
         CASE WHEN ABS(unit / prev - 1) > 0.01 THEN 1 ELSE 0 END AS moved
  FROM (
    SELECT l_partkey, unit,
           LAG(unit) OVER (PARTITION BY l_partkey ORDER BY m) AS prev
    FROM pm
  ) WHERE prev IS NOT NULL
), per_part AS (
  SELECT l_partkey, COUNT(*) AS n_mo, SUM(moved) AS n_ch
  FROM ch GROUP BY l_partkey
)
SELECT p.p_brand, COUNT(*) AS n_parts,
       ROUND(CAST(SUM(n_ch) AS DOUBLE) / SUM(n_mo), 6) AS change_frequency,
       ROUND(CAST(SUM(CASE WHEN n_ch = 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS sticky_share
FROM per_part pp JOIN part p ON pp.l_partkey = p.p_partkey
GROUP BY p.p_brand ORDER BY p.p_brand
"""

ORACLES["q_forecast_horizons"] = f"""
WITH daily AS (
  SELECT CAST(l_shipdate AS DATE) AS d,
         ROUND({_dsum('l_extendedprice')}, 6) AS rev
  FROM lineitem GROUP BY CAST(l_shipdate AS DATE)
), hs AS (SELECT CAST(UNNEST(range(1, 8)) AS INTEGER) AS h),
j AS (
  SELECT hs.h,
         ROUND(ABS(b.rev - p.rev), 6) AS ae,
         ROUND(2.0 * ABS(b.rev - p.rev) / (ABS(b.rev) + ABS(p.rev)), 6) AS sm
  FROM daily b CROSS JOIN hs
  JOIN daily p ON b.d - TO_DAYS(hs.h) = p.d
)
SELECT h, COUNT(*) AS n_days,
       ROUND((CAST(SUM(CAST(ROUND(ae * 1000000) AS BIGINT)) AS DOUBLE) / 1000000)
             / COUNT(ae), 6) AS mae,
       ROUND((CAST(SUM(CAST(ROUND(sm * 1000000) AS BIGINT)) AS DOUBLE) / 1000000)
             / COUNT(sm), 6) AS smape
FROM j GROUP BY h ORDER BY h
"""

ORACLES["q_demand_classes"] = f"""
WITH per_day AS (
  SELECT l_partkey, CAST(l_shipdate AS DATE) AS d,
         ROUND({_dsum('l_quantity')}, 6) AS q
  FROM lineitem GROUP BY l_partkey, CAST(l_shipdate AS DATE)
), per_part AS (
  SELECT l_partkey, COUNT(*) AS nd,
         CAST(datediff('day', MIN(d), MAX(d)) + 1 AS DOUBLE) AS span,
         {_dsum('q')} AS s,
         {_dsum('q * q')} AS ss
  FROM per_day GROUP BY l_partkey
), scored AS (
  SELECT span / nd AS adi,
         (ss / nd - (s / nd) * (s / nd)) / ((s / nd) * (s / nd)) AS cv2
  FROM per_part WHERE nd >= 2
), labeled AS (
  SELECT CASE WHEN adi < 1.32 AND cv2 < 0.49 THEN 'smooth'
              WHEN adi >= 1.32 AND cv2 < 0.49 THEN 'intermittent'
              WHEN adi < 1.32 AND cv2 >= 0.49 THEN 'erratic'
              ELSE 'lumpy' END AS demand_class,
         adi, cv2
  FROM scored
)
SELECT demand_class, COUNT(*) AS n_parts,
       ROUND((CAST(SUM(CAST(ROUND(adi * 1000000) AS BIGINT)) AS DOUBLE) / 1000000)
             / COUNT(adi), 6) AS avg_adi,
       ROUND((CAST(SUM(CAST(ROUND(cv2 * 1000000) AS BIGINT)) AS DOUBLE) / 1000000)
             / COUNT(cv2), 6) AS avg_cv2
FROM labeled GROUP BY demand_class ORDER BY demand_class
"""

ORACLES["q_ljung_box"] = """
WITH acf AS (
WITH 
daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n
  FROM orders GROUP BY 1
)
,
stats AS (SELECT COUNT(*) AS nn, CAST(SUM(CAST(n AS BIGINT)) AS BIGINT) AS s
          FROM daily),
c AS (
  SELECT d, CAST(nn * CAST(n AS BIGINT) - s AS BIGINT) AS c
  FROM daily, stats
),
lagged AS (
  SELECT c, LAG(c, 1) OVER w AS c1, LAG(c, 2) OVER w AS c2, LAG(c, 3) OVER w AS c3, LAG(c, 4) OVER w AS c4, LAG(c, 5) OVER w AS c5, LAG(c, 6) OVER w AS c6, LAG(c, 7) OVER w AS c7
  FROM c WINDOW w AS (ORDER BY d)
),
sums AS (
  SELECT CAST(SUM(c * c) AS BIGINT) AS den,
         CAST(SUM(c * c1) AS BIGINT) AS num1, CAST(SUM(c * c2) AS BIGINT) AS num2, CAST(SUM(c * c3) AS BIGINT) AS num3, CAST(SUM(c * c4) AS BIGINT) AS num4, CAST(SUM(c * c5) AS BIGINT) AS num5, CAST(SUM(c * c6) AS BIGINT) AS num6, CAST(SUM(c * c7) AS BIGINT) AS num7
  FROM lagged
)
SELECT 1 AS lag_k, CAST(num1 AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM sums UNION ALL SELECT 2 AS lag_k, CAST(num2 AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM sums UNION ALL SELECT 3 AS lag_k, CAST(num3 AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM sums UNION ALL SELECT 4 AS lag_k, CAST(num4 AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM sums UNION ALL SELECT 5 AS lag_k, CAST(num5 AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM sums UNION ALL SELECT 6 AS lag_k, CAST(num6 AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM sums UNION ALL SELECT 7 AS lag_k, CAST(num7 AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM sums
),
nrow AS (
  SELECT COUNT(*) AS n FROM (
    SELECT CAST(o_orderdate AS DATE) AS d FROM orders GROUP BY CAST(o_orderdate AS DATE)
  )
), terms AS (
  SELECT nrow.n, acf.lag_k,
         CAST(ROUND(acf.acf * acf.acf
                    / (CAST(nrow.n AS DOUBLE) - acf.lag_k) * 1000000000000)
              AS BIGINT) AS t
  FROM acf CROSS JOIN nrow
), agg AS (
  SELECT MAX(n) AS n, CAST(SUM(t) AS BIGINT) AS t, COUNT(*) AS m FROM terms
)
SELECT CAST(n AS BIGINT) AS n_obs, CAST(m AS INTEGER) AS n_lags,
       ROUND(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2)
             * (CAST(t AS DOUBLE) / 1000000000000), 6) AS q_stat,
       CAST(CASE WHEN ROUND(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2)
                            * (CAST(t AS DOUBLE) / 1000000000000), 6) > 14.0671
                 THEN 1 ELSE 0 END AS INTEGER) AS reject_whiteness_5pct
FROM agg
"""

ORACLES["q_hurst"] = f"""
WITH daily AS (
  SELECT CAST(l_shipdate AS DATE) AS d,
         ROUND({_dsum('l_extendedprice / 1000.0')}, 6) AS rev
  FROM lineitem GROUP BY CAST(l_shipdate AS DATE)
), base AS (
  SELECT rev, CAST(ROUND(rev * 1000000) AS BIGINT) AS x6,
         ROW_NUMBER() OVER (ORDER BY d) AS rn, d
  FROM daily
), sizes AS (SELECT CAST(UNNEST([16, 32, 64]) AS INTEGER) AS size),
tagged AS (
  SELECT b.*, s.size, (b.rn - 1) // s.size AS blk
  FROM base b CROSS JOIN sizes s
), blocked AS (
  SELECT size, blk, rev, x6,
         COUNT(*) OVER wb AS n,
         CAST(SUM(x6) OVER wb AS BIGINT) AS bsum,
         CAST(SUM(x6) OVER wo AS BIGINT) AS cum,
         ROW_NUMBER() OVER (PARTITION BY size, blk ORDER BY rn) AS t
  FROM tagged
  WINDOW wb AS (PARTITION BY size, blk),
         wo AS (PARTITION BY size, blk ORDER BY rn
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), full_blocks AS (
  SELECT size, blk, rev, x6,
         CAST(size AS BIGINT) * cum - CAST(t AS BIGINT) * bsum AS dev
  FROM blocked WHERE n = size
), per_block AS (
  SELECT size, blk,
         CAST(MAX(dev) - MIN(dev) AS DOUBLE) AS rraw,
         CAST(SUM(x6) AS BIGINT) AS s6,
         {_dsum('rev * rev')} AS ssd
  FROM full_blocks GROUP BY size, blk
), rs AS (
  SELECT size,
         ROUND((rraw / (CAST(size AS DOUBLE) * 1000000.0))
               / sqrt(ssd / CAST(size AS DOUBLE)
                      - (CAST(s6 AS DOUBLE) / 1000000.0 / CAST(size AS DOUBLE))
                        * (CAST(s6 AS DOUBLE) / 1000000.0 / CAST(size AS DOUBLE))),
               6) AS r
  FROM per_block
), per_size AS (
  SELECT size,
         ROUND((CAST(SUM(CAST(ROUND(r * 1000000) AS BIGINT)) AS DOUBLE) / 1000000)
               / COUNT(r), 6) AS avg_rs
  FROM rs WHERE r IS NOT NULL GROUP BY size
)
SELECT MAX(CASE WHEN size = 16 THEN avg_rs END) AS rs_16,
       MAX(CASE WHEN size = 32 THEN avg_rs END) AS rs_32,
       MAX(CASE WHEN size = 64 THEN avg_rs END) AS rs_64,
       ROUND((log2(MAX(CASE WHEN size = 64 THEN avg_rs END))
              - log2(MAX(CASE WHEN size = 16 THEN avg_rs END))) / 2.0, 6) AS hurst
FROM per_size
"""

ORACLES["q_load_heatmap"] = """
WITH per AS (
  SELECT CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
         CAST(hour(ts) AS INTEGER) AS hour,
         COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
), tot AS (SELECT SUM(n_events) AS t, COUNT(*) AS cells FROM per)
SELECT dow, hour, n_events,
       ROUND(CAST(n_events AS DOUBLE) / tot.t, 6) AS share,
       CAST(CASE WHEN CAST(n_events AS DOUBLE) / tot.t
                      > 2.0 / CAST(tot.cells AS DOUBLE)
                 THEN 1 ELSE 0 END AS INTEGER) AS peak
FROM per CROSS JOIN tot
ORDER BY dow, hour
"""

ORACLES["q_discount_curve"] = f"""
WITH per AS (
  SELECT LEAST(5, CAST(FLOOR((l_quantity - 1) / 10) AS INTEGER) + 1) AS qty_band,
         COUNT(*) AS n_lines,
         ROUND({_dsum('l_discount')} / COUNT(*), 6) AS avg_discount,
         ROUND(quantile_cont(l_discount, 0.9), 6) AS p90_discount,
         ROUND({_dsum('l_extendedprice * (1 - l_discount)')}, 6) AS rev
  FROM lineitem GROUP BY 1
), tot AS (SELECT ROUND({_dsum('rev')}, 6) AS t FROM per)
SELECT qty_band, n_lines, avg_discount, p90_discount,
       ROUND(rev / tot.t, 6) AS revenue_share
FROM per CROSS JOIN tot
ORDER BY qty_band
"""

ORACLES["q_seasonal_strength"] = """
WITH sd AS (
WITH 
daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n
  FROM orders GROUP BY 1
)
,
base AS (
  SELECT d, CAST(n AS BIGINT) AS v,
         CAST(SUM(CAST(n AS BIGINT)) OVER w AS BIGINT) AS ts,
         COUNT(*) OVER w AS tc,
         (ROW_NUMBER() OVER (ORDER BY d) - 1) % 7 AS ph
  FROM daily
  WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
interior AS (
  SELECT *, v * 7 - ts AS dt FROM base WHERE tc = 7
),
seas AS (
  SELECT ph,
         CAST(ROUND(CAST(SUM(dt) AS DOUBLE) / COUNT(*) / 7 * 1000000)
              AS BIGINT) AS s6
  FROM interior GROUP BY ph
),
tot AS (SELECT CAST(SUM(s6) AS BIGINT) AS tot6 FROM seas),
seas_c AS (SELECT ph, s6 * 7 - tot6 AS sc6p FROM seas, tot)
SELECT i.d, i.v AS value,
       CAST(i.ts AS DOUBLE) / 7 AS trend,
       CAST(s.sc6p AS DOUBLE) / (7 * 1000000.0) AS seasonal,
       CAST(i.v AS DOUBLE) - CAST(i.ts AS DOUBLE) / 7
         - CAST(s.sc6p AS DOUBLE) / (7 * 1000000.0) AS residual
FROM interior i JOIN seas_c s USING (ph)
),
comp AS (
  SELECT ROUND(seasonal + residual, 6) AS sr,
         ROUND(trend + residual, 6) AS tr,
         ROUND(residual, 6) AS r
  FROM sd
), m AS (
  SELECT COUNT(*) AS n_days,
         (CAST(SUM(CAST(ROUND(r * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS s_r,
         (CAST(SUM(CAST(ROUND(r * r * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS ss_r,
         (CAST(SUM(CAST(ROUND(sr * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS s_sr,
         (CAST(SUM(CAST(ROUND(sr * sr * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS ss_sr,
         (CAST(SUM(CAST(ROUND(tr * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS s_tr,
         (CAST(SUM(CAST(ROUND(tr * tr * 1000000) AS BIGINT)) AS DOUBLE) / 1000000) AS ss_tr
  FROM comp
)
SELECT CAST(n_days AS BIGINT) AS n_days,
       ROUND(GREATEST(0.0, 1.0 - (ss_r / CAST(n_days AS DOUBLE)
                                  - (s_r / CAST(n_days AS DOUBLE))
                                    * (s_r / CAST(n_days AS DOUBLE)))
                               / (ss_sr / CAST(n_days AS DOUBLE)
                                  - (s_sr / CAST(n_days AS DOUBLE))
                                    * (s_sr / CAST(n_days AS DOUBLE)))), 6)
         AS seasonal_strength,
       ROUND(GREATEST(0.0, 1.0 - (ss_r / CAST(n_days AS DOUBLE)
                                  - (s_r / CAST(n_days AS DOUBLE))
                                    * (s_r / CAST(n_days AS DOUBLE)))
                               / (ss_tr / CAST(n_days AS DOUBLE)
                                  - (s_tr / CAST(n_days AS DOUBLE))
                                    * (s_tr / CAST(n_days AS DOUBLE)))), 6)
         AS trend_strength
FROM m
"""

ORACLES["q_streaks"] = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
), islands AS (
  SELECT user_id,
         datediff('day', DATE '2024-01-01', d)
           - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS grp
  FROM days
), streaks AS (
  SELECT user_id, grp, COUNT(*) AS len FROM islands GROUP BY user_id, grp
), longest AS (
  SELECT user_id, MAX(len) AS mx FROM streaks GROUP BY user_id
)
SELECT CAST(mx AS BIGINT) AS streak_days, COUNT(*) AS n_users
FROM longest GROUP BY mx ORDER BY streak_days
"""

ORACLES["q_return_rates"] = f"""
WITH j AS (
  SELECT p.p_brand, l.l_returnflag, l.l_extendedprice
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
), per AS (
  SELECT p_brand, COUNT(*) AS n_lines,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_returned,
         ROUND({_dsum("CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0.0 END")}, 6)
           AS ret_rev,
         ROUND({_dsum('l_extendedprice')}, 6) AS rev
  FROM j GROUP BY p_brand
), tot AS (
  SELECT CAST(SUM(n_returned) AS DOUBLE) / SUM(n_lines) AS base FROM per
)
SELECT p_brand, n_lines,
       ROUND(CAST(n_returned AS DOUBLE) / n_lines, 6) AS return_rate,
       ROUND(ret_rev / rev, 6) AS returned_rev_share,
       ROUND(tot.base, 6) AS base_rate,
       CAST(CASE WHEN CAST(n_returned AS DOUBLE) / n_lines > tot.base * 1.2
                 THEN 1 ELSE 0 END AS INTEGER) AS escalate
FROM per CROSS JOIN tot
ORDER BY p_brand
"""

ORACLES["q_segment_migration"] = f"""
WITH a AS (
  SELECT o_custkey,
         CASE NTILE(3) OVER (ORDER BY rev ASC, o_custkey ASC)
           WHEN 1 THEN 'low' WHEN 2 THEN 'mid' ELSE 'high' END AS seg
  FROM (SELECT o_custkey, {_dsum('o_totalprice')} AS rev
        FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1996
        GROUP BY o_custkey)
), b AS (
  SELECT o_custkey,
         CASE NTILE(3) OVER (ORDER BY rev ASC, o_custkey ASC)
           WHEN 1 THEN 'low' WHEN 2 THEN 'mid' ELSE 'high' END AS seg
  FROM (SELECT o_custkey, {_dsum('o_totalprice')} AS rev
        FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1997
        GROUP BY o_custkey)
)
SELECT COALESCE(a.seg, 'new') AS from_seg,
       COALESCE(b.seg, 'churned') AS to_seg,
       COUNT(*) AS n_customers
FROM a FULL OUTER JOIN b USING (o_custkey)
GROUP BY 1, 2
ORDER BY from_seg, to_seg
"""

ORACLES["q_ar_aging"] = f"""
WITH book AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS a FROM orders),
open_o AS (
  SELECT o.o_totalprice,
         datediff('day', CAST(o.o_orderdate AS DATE), book.a) AS age
  FROM orders o CROSS JOIN book
  WHERE o.o_orderstatus = 'O'
), per AS (
  SELECT CASE WHEN age <= 30 THEN '0-30'
              WHEN age <= 60 THEN '31-60'
              WHEN age <= 90 THEN '61-90'
              ELSE '90+' END AS age_bucket,
         COUNT(*) AS n_orders,
         ROUND({_dsum('o_totalprice')}, 6) AS open_value
  FROM open_o GROUP BY 1
), tot AS (SELECT ROUND({_dsum('open_value')}, 6) AS t FROM per)
SELECT age_bucket, n_orders, open_value,
       ROUND(open_value / tot.t, 6) AS value_share
FROM per CROSS JOIN tot
ORDER BY age_bucket
"""

ORACLES["q_share_shift"] = f"""
WITH j AS (
  SELECT n.n_name, o.o_totalprice,
         year(CAST(o.o_orderdate AS DATE)) AS y
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE year(CAST(o.o_orderdate AS DATE)) IN (1996, 1997)
), per AS (
  SELECT n_name,
         ROUND({_dsum("CASE WHEN y = 1996 THEN o_totalprice ELSE 0.0 END")}, 6) AS r96,
         ROUND({_dsum("CASE WHEN y = 1997 THEN o_totalprice ELSE 0.0 END")}, 6) AS r97
  FROM j GROUP BY n_name
), tot AS (
  SELECT ROUND({_dsum('r96')}, 6) AS t96, ROUND({_dsum('r97')}, 6) AS t97 FROM per
)
SELECT n_name,
       ROUND(r96 / tot.t96, 6) AS share_1996,
       ROUND(r97 / tot.t97, 6) AS share_1997,
       ROUND((ROUND(r97 / tot.t97, 6) - ROUND(r96 / tot.t96, 6)) * 100, 6)
         AS pp_change
FROM per CROSS JOIN tot
ORDER BY n_name
"""

ORACLES["q_coverage_gaps"] = f"""
WITH nr AS (
  SELECT n.n_nationkey, r.r_name
  FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
), flows AS (
  SELECT sup.r_name AS supp_region, cus.r_name AS cust_region,
         ROUND({_dsum('l.l_extendedprice')}, 6) AS v
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nr sup ON s.s_nationkey = sup.n_nationkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nr cus ON c.c_nationkey = cus.n_nationkey
  GROUP BY sup.r_name, cus.r_name
), cells AS (
  SELECT a.r_name AS supp_region, b.r_name AS cust_region
  FROM region a CROSS JOIN region b
), tot AS (SELECT ROUND({_dsum('v')}, 6) AS t FROM flows)
SELECT c.supp_region, c.cust_region,
       ROUND(COALESCE(f.v, 0.0), 6) AS trade_value,
       ROUND(COALESCE(f.v, 0.0) / tot.t, 6) AS flow_share,
       CAST(CASE WHEN COALESCE(f.v, 0.0) = 0.0 THEN 1 ELSE 0 END AS INTEGER)
         AS white_space
FROM cells c
LEFT JOIN flows f ON f.supp_region = c.supp_region
                 AND f.cust_region = c.cust_region
CROSS JOIN tot
ORDER BY c.supp_region, c.cust_region
"""

ORACLES["q_readability"] = """
WITH scored AS (
  SELECT lang,
         ROUND(206.835
               - 1.015 * (CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS DOUBLE)
                          / CAST(GREATEST(1, len(regexp_extract_all(text, '[.!?]+')))
                                 AS DOUBLE))
               - 84.6 * (CAST(GREATEST(1, len(regexp_extract_all(text, '[aeiouyAEIOUY]+')))
                              AS DOUBLE)
                         / CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS DOUBLE)),
               6) AS f
  FROM documents
  WHERE len(regexp_extract_all(text, '[A-Za-z]+')) > 0
)
SELECT lang, COUNT(*) AS n_docs,
       ROUND((CAST(SUM(CAST(ROUND(f * 1000000) AS BIGINT)) AS DOUBLE) / 1000000)
             / COUNT(f), 6) AS avg_flesch
FROM scored GROUP BY lang ORDER BY lang
"""

ORACLES["q_event_id_audit"] = """
WITH per_id AS (
  SELECT event_id, COUNT(*) AS n, COUNT(DISTINCT user_id) AS nu
  FROM events GROUP BY event_id
)
SELECT CAST(SUM(n) AS BIGINT) AS n_events,
       COUNT(*) AS n_distinct_ids,
       CAST(SUM(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS BIGINT) AS n_replayed,
       ROUND(CAST(SUM(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS DOUBLE)
             / SUM(n), 6) AS replay_rate,
       CAST(SUM(CASE WHEN nu > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_ids_multi_user
FROM per_id
"""

ORACLES["q_sma_cross"] = f"""
WITH daily AS (
  SELECT l_suppkey, strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS day,
         ROUND({_dsum('l_extendedprice')} / COUNT(*), 6) AS close
  FROM lineitem WHERE l_suppkey <= 10
  GROUP BY l_suppkey, strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')
), framed AS (
  SELECT l_suppkey, day,
         SIGN(ROUND(CAST(SUM(CAST(ROUND(close * 1000000) AS BIGINT)) OVER w5
                         AS DOUBLE) / 1000000 / 5
                    - CAST(SUM(CAST(ROUND(close * 1000000) AS BIGINT)) OVER w20
                           AS DOUBLE) / 1000000 / 20, 6)) AS sgn,
         COUNT(*) OVER w5 AS n5, COUNT(*) OVER w20 AS n20
  FROM daily
  WINDOW w5 AS (PARTITION BY l_suppkey ORDER BY day
                ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
         w20 AS (PARTITION BY l_suppkey ORDER BY day
                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
), gated AS (
  SELECT l_suppkey, day, sgn,
         LAG(sgn) OVER (PARTITION BY l_suppkey ORDER BY day) AS prev
  FROM framed WHERE n5 = 5 AND n20 = 20
)
SELECT l_suppkey,
       CAST(SUM(CASE WHEN sgn > prev THEN 1 ELSE 0 END) AS BIGINT)
         AS golden_crosses,
       CAST(SUM(CASE WHEN sgn < prev THEN 1 ELSE 0 END) AS BIGINT)
         AS death_crosses
FROM gated
WHERE prev IS NOT NULL AND prev <> sgn
GROUP BY l_suppkey ORDER BY l_suppkey
"""

ORACLES["q_health_summary"] = """
WITH cc AS (
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n_errors
  FROM events WHERE event_type = 'error'
  GROUP BY CAST(ts AS DATE)
), stats AS (
  SELECT CAST(SUM(n_errors) AS DOUBLE) / COUNT(*) AS mu FROM daily
)
SELECT strftime(d, '%Y-%m-%d') AS day, n_errors,
       ROUND(stats.mu, 6) AS center,
       ROUND(stats.mu + 3 * sqrt(stats.mu), 6) AS ucl,
       ROUND(GREATEST(stats.mu - 3 * sqrt(stats.mu), 0.0), 6) AS lcl,
       CAST(CASE WHEN n_errors > ROUND(stats.mu + 3 * sqrt(stats.mu), 6)
                   OR n_errors < ROUND(GREATEST(stats.mu - 3 * sqrt(stats.mu), 0.0), 6)
                 THEN 1 ELSE 0 END AS INTEGER) AS out_of_control
FROM daily CROSS JOIN stats
ORDER BY day
),
ph AS (
WITH per AS (
  SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS month,
         COUNT(*) AS n_rows,
         ROUND(CAST(SUM(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END)
                    AS DOUBLE) / COUNT(*), 6) AS null_rate_price,
         CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers
  FROM lineitem
  GROUP BY strftime(CAST(l_shipdate AS DATE), '%Y-%m')
)
SELECT month, n_rows, null_rate_price, n_suppliers,
       CAST(CASE WHEN LAG(n_rows) OVER (ORDER BY month) IS NOT NULL
                  AND n_rows < LAG(n_rows) OVER (ORDER BY month) * 0.5
                 THEN 1 ELSE 0 END AS INTEGER) AS volume_drop
FROM per ORDER BY month
),
srm AS (
WITH per AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM events GROUP BY event_type
)
SELECT event_type, n_a, n_b,
       ROUND((n_a - CAST(n_a + n_b AS DOUBLE) / 2)
             * (n_a - CAST(n_a + n_b AS DOUBLE) / 2)
             / (CAST(n_a + n_b AS DOUBLE) / 2)
             + (n_b - CAST(n_a + n_b AS DOUBLE) / 2)
               * (n_b - CAST(n_a + n_b AS DOUBLE) / 2)
               / (CAST(n_a + n_b AS DOUBLE) / 2), 6) AS chi2,
       CAST(CASE WHEN (n_a - CAST(n_a + n_b AS DOUBLE) / 2)
                      * (n_a - CAST(n_a + n_b AS DOUBLE) / 2)
                      / (CAST(n_a + n_b AS DOUBLE) / 2)
                      + (n_b - CAST(n_a + n_b AS DOUBLE) / 2)
                        * (n_b - CAST(n_a + n_b AS DOUBLE) / 2)
                        / (CAST(n_a + n_b AS DOUBLE) / 2) > 3.841
                 THEN 1 ELSE 0 END AS INTEGER) AS srm_flag
FROM per ORDER BY event_type
),
fk AS (
WITH e1 AS (
  SELECT 'lineitem->orders' AS fk_edge, COUNT(*) AS n_child_rows,
         CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_orphans
  FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
    ON l.l_orderkey = o.o_orderkey
), e2 AS (
  SELECT 'lineitem->part', COUNT(*),
         CAST(SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem l LEFT JOIN (SELECT DISTINCT p_partkey FROM part) p
    ON l.l_partkey = p.p_partkey
), e3 AS (
  SELECT 'lineitem->supplier', COUNT(*),
         CAST(SUM(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem l LEFT JOIN (SELECT DISTINCT s_suppkey FROM supplier) s
    ON l.l_suppkey = s.s_suppkey
), e4 AS (
  SELECT 'orders->customer', COUNT(*),
         CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
    ON o.o_custkey = c.c_custkey
), e5 AS (
  SELECT 'customer->nation', COUNT(*),
         CAST(SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM customer c LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation) n
    ON c.c_nationkey = n.n_nationkey
), e6 AS (
  SELECT 'nation->region', COUNT(*),
         CAST(SUM(CASE WHEN r.r_regionkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM nation n LEFT JOIN (SELECT DISTINCT r_regionkey FROM region) r
    ON n.n_regionkey = r.r_regionkey
), u AS (
  SELECT * FROM e1 UNION ALL SELECT * FROM e2 UNION ALL SELECT * FROM e3
  UNION ALL SELECT * FROM e4 UNION ALL SELECT * FROM e5 UNION ALL SELECT * FROM e6
)
SELECT fk_edge, n_child_rows, n_orphans,
       ROUND(CAST(n_orphans AS DOUBLE) / n_child_rows, 6) AS orphan_rate
FROM u ORDER BY fk_edge
),
u AS (
  SELECT 'error_control_chart' AS check_name,
         CAST(SUM(out_of_control) AS BIGINT) AS n_triggered,
         COUNT(*) AS n_checked
  FROM cc
  UNION ALL
  SELECT 'volume_drops', CAST(SUM(volume_drop) AS BIGINT), COUNT(*) FROM ph
  UNION ALL
  SELECT 'srm', CAST(SUM(srm_flag) AS BIGINT), COUNT(*) FROM srm
  UNION ALL
  SELECT 'fk_orphans',
         CAST(SUM(CASE WHEN n_orphans > 0 THEN 1 ELSE 0 END) AS BIGINT),
         COUNT(*)
  FROM fk
)
SELECT check_name AS "check", n_triggered, n_checked
FROM u ORDER BY check_name
"""

ORACLES["q_grubbs"] = f"""
WITH m AS (
  SELECT o_orderpriority, COUNT(*) AS n,
         {_dsum('o_totalprice')} AS s,
         {_dsum('o_totalprice * o_totalprice / 1000000')} AS ssm,
         ROUND(MAX(o_totalprice), 6) AS mx,
         ROUND(MIN(o_totalprice), 6) AS mn
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, CAST(n AS BIGINT) AS n,
       ROUND(s / CAST(n AS DOUBLE), 6) AS mean_value,
       ROUND(GREATEST(mx - s / CAST(n AS DOUBLE), s / CAST(n AS DOUBLE) - mn)
             / sqrt((ssm * 1000000) / CAST(n AS DOUBLE)
                    - (s / CAST(n AS DOUBLE)) * (s / CAST(n AS DOUBLE))), 6)
         AS grubbs_g,
       CAST(CASE WHEN GREATEST(mx - s / CAST(n AS DOUBLE),
                               s / CAST(n AS DOUBLE) - mn)
                      / sqrt((ssm * 1000000) / CAST(n AS DOUBLE)
                             - (s / CAST(n AS DOUBLE)) * (s / CAST(n AS DOUBLE)))
                      > 4.0
                 THEN 1 ELSE 0 END AS INTEGER) AS flag_outlier
FROM m ORDER BY o_orderpriority
"""

ORACLES["q_ridge_path"] = f"""
WITH mom AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         {_dsum('l_quantity')} AS s1,
         {_dsum('l_discount')} AS s2,
         {_dsum('l_extendedprice / 1000.0')} AS sy,
         {_dsum('l_quantity * l_quantity')} AS s11,
         {_dsum('l_quantity * l_discount')} AS s12,
         {_dsum('l_discount * l_discount')} AS s22,
         {_dsum('l_quantity * (l_extendedprice / 1000.0)')} AS s1y,
         {_dsum('l_discount * (l_extendedprice / 1000.0)')} AS s2y
  FROM lineitem
), cov AS (
  SELECT s11 / n - (s1 / n) * (s1 / n) AS c11,
         s12 / n - (s1 / n) * (s2 / n) AS c12,
         s22 / n - (s2 / n) * (s2 / n) AS c22,
         s1y / n - (s1 / n) * (sy / n) AS c1y,
         s2y / n - (s2 / n) * (sy / n) AS c2y
  FROM mom
), lams AS (SELECT UNNEST([0.0, 1.0, 10.0, 100.0]) AS lam)
SELECT lam,
       ROUND(((c22 + lam) * c1y - c12 * c2y)
             / ((c11 + lam) * (c22 + lam) - c12 * c12), 6) AS w_quantity,
       ROUND(((c11 + lam) * c2y - c12 * c1y)
             / ((c11 + lam) * (c22 + lam) - c12 * c12), 6) AS w_discount
FROM cov CROSS JOIN lams
ORDER BY lam
"""

ORACLES["q_psm_att"] = """
WITH per AS (
  SELECT user_id,
         ROUND(CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                        THEN CAST(ROUND(value * 1000000) AS BIGINT)
                        ELSE 0 END) AS DOUBLE) / 1000000, 6) AS x,
         ROUND(CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
                        THEN CAST(ROUND(value * 1000000) AS BIGINT)
                        ELSE 0 END) AS DOUBLE) / 1000000, 6) AS y
  FROM events GROUP BY user_id
), treated AS (
  SELECT user_id AS t_id, x AS xt, y AS yt FROM per WHERE user_id % 2 = 0
), control AS (
  SELECT user_id AS c_id, x AS xc, y AS yc FROM per WHERE user_id % 2 <> 0
), tb AS (
  SELECT t_id, xt, yt,
         UNNEST([CAST(FLOOR(xt / 50.0) AS BIGINT) - 1,
                 CAST(FLOOR(xt / 50.0) AS BIGINT),
                 CAST(FLOOR(xt / 50.0) AS BIGINT) + 1]) AS band
  FROM treated
), cb AS (
  SELECT c_id, xc, yc, CAST(FLOOR(xc / 50.0) AS BIGINT) AS band FROM control
), cand AS (
  SELECT tb.t_id, tb.xt, tb.yt, cb.c_id, cb.xc, cb.yc
  FROM tb JOIN cb USING (band)
  WHERE ABS(cb.xc - tb.xt) <= 50.0
), matched AS (
  SELECT t_id, yt, yc FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY t_id
                                 ORDER BY ABS(xc - xt) ASC, c_id ASC) AS rn
    FROM cand
  ) WHERE rn = 1
), nt AS (SELECT COUNT(*) AS n_treated FROM treated),
magg AS (
  SELECT COUNT(*) AS n_matched,
         ROUND((CAST(SUM(CAST(ROUND(ROUND(yt - yc, 6) * 1000000) AS BIGINT))
                     AS DOUBLE) / 1000000) / COUNT(*), 6) AS att
  FROM matched
)
SELECT CAST(nt.n_treated AS BIGINT) AS n_treated,
       CAST(magg.n_matched AS BIGINT) AS n_matched,
       ROUND(CAST(magg.n_matched AS DOUBLE) / nt.n_treated, 6) AS match_rate,
       magg.att
FROM magg CROSS JOIN nt
"""

ORACLES["q_gate_overlap"] = """
WITH rep AS (
  SELECT doc_id, CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS frac
  FROM (SELECT doc_id, gram, COUNT(*) AS cnt
        FROM (SELECT doc_id,
                     unnest(list_transform(range(1, len(l)), x -> l[x] || ' ' || l[x+1])) AS gram
              FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents))
        GROUP BY doc_id, gram)
  GROUP BY doc_id
), entdocs AS (
  SELECT doc_id, lower(substring(text, 1, 240)) AS t FROM documents
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
            AS DOUBLE) / 1000000) AS eb
  FROM entcounts JOIN enttotals USING (doc_id)
  GROUP BY entcounts.doc_id
), flags AS (
  SELECT
    CASE WHEN ROUND(
        LEAST(CAST(length(d.text) AS DOUBLE) / 200.0, 1.0) * 0.4
        + (CASE WHEN CAST(length(d.text) AS DOUBLE)
                     / CAST(len(string_split(d.text, ' ')) AS DOUBLE) >= 3.0
                 AND CAST(length(d.text) AS DOUBLE)
                     / CAST(len(string_split(d.text, ' ')) AS DOUBLE) <= 10.0
                THEN 1.0 ELSE 0.5 END) * 0.3
        + LEAST((CAST(len(list_filter(string_split(d.text, ' '),
                    t -> list_contains(['the','a','of','and','to','in','is','on','for','with'], t)))
                 AS DOUBLE) / CAST(len(string_split(d.text, ' ')) AS DOUBLE)) * 5.0,
                1.0) * 0.3, 6) < 0.5 THEN 1 ELSE 0 END AS fq,
    CASE WHEN r.frac IS NOT NULL AND r.frac >= 0.08 THEN 1 ELSE 0 END AS fr,
    CASE WHEN e.eb IS NOT NULL AND (e.eb < 1.5 OR e.eb > 7.0) THEN 1 ELSE 0 END AS fe
  FROM documents d
  LEFT JOIN rep r USING (doc_id)
  LEFT JOIN ent e USING (doc_id)
), agg AS (
  SELECT CAST(SUM(fq) AS BIGINT) AS q, CAST(SUM(fr) AS BIGINT) AS r,
         CAST(SUM(fe) AS BIGINT) AS e,
         CAST(SUM(fq * fr) AS BIGINT) AS qr,
         CAST(SUM(fq * fe) AS BIGINT) AS qe,
         CAST(SUM(fr * fe) AS BIGINT) AS re
  FROM flags
)
SELECT 'quality' AS gate_a, 'repetition' AS gate_b, q AS n_fail_a, r AS n_fail_b,
       qr AS n_both,
       ROUND(CASE WHEN q + r - qr > 0
                  THEN CAST(qr AS DOUBLE) / (q + r - qr) ELSE 0.0 END, 6)
         AS fail_jaccard
FROM agg
UNION ALL
SELECT 'quality', 'entropy', q, e, qe,
       ROUND(CASE WHEN q + e - qe > 0
                  THEN CAST(qe AS DOUBLE) / (q + e - qe) ELSE 0.0 END, 6)
FROM agg
UNION ALL
SELECT 'repetition', 'entropy', r, e, re,
       ROUND(CASE WHEN r + e - re > 0
                  THEN CAST(re AS DOUBLE) / (r + e - re) ELSE 0.0 END, 6)
FROM agg
ORDER BY gate_a, gate_b
"""


ORACLES["q_anova"] = f"""
WITH g AS (
  SELECT o_orderpriority AS grp, COUNT(*) AS ng,
         {_dsum('o_totalprice / 1000.0')} AS sg,
         {_dsum('(o_totalprice / 1000.0) * (o_totalprice / 1000.0)')} AS ssg
  FROM orders GROUP BY o_orderpriority
), tot AS (
  SELECT SUM(ng) AS n,
         ROUND(CAST(SUM(CAST(ROUND(sg * 1000000) AS BIGINT)) AS DOUBLE) / 1000000, 6) AS s,
         COUNT(*) AS k
  FROM g
), terms AS (
  SELECT CAST(ng AS DOUBLE)
           * (sg / CAST(ng AS DOUBLE) - s / CAST(n AS DOUBLE))
           * (sg / CAST(ng AS DOUBLE) - s / CAST(n AS DOUBLE)) AS bt,
         ssg - sg * sg / CAST(ng AS DOUBLE) AS wt,
         n, k
  FROM g CROSS JOIN tot
), red AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n, CAST(MAX(k) AS BIGINT) AS k,
         {_dsum('bt')} AS ssb, {_dsum('wt')} AS ssw
  FROM terms
)
SELECT n, k, ROUND(ssb, 6) AS ss_between, ROUND(ssw, 6) AS ss_within,
       ROUND((ssb / CAST(k - 1 AS DOUBLE)) / (ssw / CAST(n - k AS DOUBLE)), 6) AS f_stat
FROM red
"""

ORACLES["q_spearman"] = """
WITH r AS (
  SELECT l_returnflag AS grp,
         CAST(2 * RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity ASC)
              + COUNT(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1 AS BIGINT) AS ra,
         CAST(2 * RANK() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice ASC)
              + COUNT(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1 AS BIGINT) AS rb,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS nn
  FROM lineitem
), c AS (
  SELECT grp, ra - (nn + 1) AS ca, rb - (nn + 1) AS cb FROM r
), agg AS (
  SELECT grp, COUNT(*) AS n,
         SUM(ca * cb) AS sab, SUM(ca * ca) AS saa, SUM(cb * cb) AS sbb
  FROM c GROUP BY grp
)
SELECT grp, CAST(n AS BIGINT) AS n,
       ROUND(CASE WHEN saa > 0 AND sbb > 0
             THEN CAST(sab AS DOUBLE) / (sqrt(CAST(saa AS DOUBLE)) * sqrt(CAST(sbb AS DOUBLE)))
             END, 6) AS spearman_rho
FROM agg ORDER BY grp
"""

ORACLES["q_kruskal_wallis"] = f"""
WITH r AS (
  SELECT o_orderpriority AS grp,
         CAST(2 * RANK() OVER (ORDER BY o_totalprice ASC)
              + COUNT(*) OVER (PARTITION BY o_totalprice) - 1 AS BIGINT) AS r2
  FROM orders
), gsum AS (
  SELECT grp, COUNT(*) AS ng, SUM(r2) AS rs2 FROM r GROUP BY grp
), ties AS (
  SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tie
  FROM (SELECT COUNT(*) AS t FROM orders GROUP BY o_totalprice)
), tot AS (
  SELECT SUM(ng) AS n, COUNT(*) AS k FROM gsum
), terms AS (
  SELECT 12.0 * CAST(rs2 AS DOUBLE) * CAST(rs2 AS DOUBLE)
           / (4.0 * CAST(ng AS DOUBLE) * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) AS term,
         n, k
  FROM gsum CROSS JOIN tot
), red AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n, CAST(MAX(k) AS BIGINT) AS k,
         {_dsum('term')} AS hsum
  FROM terms
)
SELECT n, k,
       ROUND(hsum - 3.0 * (CAST(n AS DOUBLE) + 1.0), 6) AS h_stat,
       ROUND((hsum - 3.0 * (CAST(n AS DOUBLE) + 1.0))
             / (1.0 - CAST(tie AS DOUBLE)
                / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(n AS DOUBLE))), 6)
         AS h_corrected,
       CAST(CASE WHEN (hsum - 3.0 * (CAST(n AS DOUBLE) + 1.0))
                      / (1.0 - CAST(tie AS DOUBLE)
                         / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)))
                      > 9.488
                 THEN 1 ELSE 0 END AS INTEGER) AS flag_reject
FROM red CROSS JOIN ties
"""

ORACLES["q_cramers_v"] = """
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
), j AS (
  SELECT f.nx, f.ny, CAST(COALESCE(c.nxy, 0) AS BIGINT) AS nxy
  FROM (SELECT xt.x, yt.y, xt.nx, yt.ny FROM xt CROSS JOIN yt) f
  LEFT JOIN cells c ON f.x = c.x AND f.y = c.y
), terms AS (
  SELECT nxy, CAST(nx AS DOUBLE) * ny / n AS ex, n, dx, dy FROM j, nn
), red AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n,
         CAST(LEAST(MAX(dx), MAX(dy)) AS BIGINT) AS min_dim,
         ROUND((CAST(SUM(CAST(ROUND((((CAST(nxy AS DOUBLE) - ex) * (nxy - ex) / ex)) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000), 6) AS chi2
  FROM terms
)
SELECT n, chi2,
       ROUND(sqrt(chi2 / (CAST(n AS DOUBLE) * CAST(min_dim - 1 AS DOUBLE))), 6) AS cramers_v
FROM red
"""

ORACLES["q_levene"] = f"""
WITH med AS (
  SELECT o_orderstatus AS grp, MEDIAN(o_totalprice / 1000.0) AS med
  FROM orders GROUP BY o_orderstatus
), z AS (
  SELECT o.o_orderstatus AS grp,
         ROUND(ABS(o.o_totalprice / 1000.0 - m.med), 6) AS zv
  FROM orders o JOIN med m ON o.o_orderstatus = m.grp
), g AS (
  SELECT grp, COUNT(*) AS ng,
         {_dsum('zv')} AS sg,
         {_dsum('zv * zv')} AS ssg
  FROM z GROUP BY grp
), tot AS (
  SELECT SUM(ng) AS n,
         ROUND(CAST(SUM(CAST(ROUND(sg * 1000000) AS BIGINT)) AS DOUBLE) / 1000000, 6) AS s,
         COUNT(*) AS k
  FROM g
), terms AS (
  SELECT CAST(ng AS DOUBLE)
           * (sg / CAST(ng AS DOUBLE) - s / CAST(n AS DOUBLE))
           * (sg / CAST(ng AS DOUBLE) - s / CAST(n AS DOUBLE)) AS bt,
         ssg - sg * sg / CAST(ng AS DOUBLE) AS wt,
         n, k
  FROM g CROSS JOIN tot
), red AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n, CAST(MAX(k) AS BIGINT) AS k,
         {_dsum('bt')} AS ssb, {_dsum('wt')} AS ssw
  FROM terms
)
SELECT n, k, ROUND(ssb, 6) AS ss_between, ROUND(ssw, 6) AS ss_within,
       ROUND((ssb / CAST(k - 1 AS DOUBLE)) / (ssw / CAST(n - k AS DOUBLE)), 6) AS f_stat
FROM red
"""


ORACLES["q_changepoint"] = f"""
WITH daily AS (
  SELECT l_suppkey, strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS day,
         ROUND({_dsum('l_extendedprice / 1000.0')}, 6) AS close
  FROM lineitem WHERE l_suppkey <= 20
  GROUP BY l_suppkey, strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')
), p AS (
  SELECT l_suppkey, day AS o,
         ROW_NUMBER() OVER (PARTITION BY l_suppkey ORDER BY day) AS rn,
         CAST(SUM(CAST(ROUND(close * 1000000) AS BIGINT))
              OVER (PARTITION BY l_suppkey ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS DOUBLE) / 1000000 AS s1,
         COUNT(*) OVER (PARTITION BY l_suppkey) AS n,
         CAST(SUM(CAST(ROUND(close * 1000000) AS BIGINT))
              OVER (PARTITION BY l_suppkey) AS DOUBLE) / 1000000 AS s
  FROM daily
), cand AS (
  SELECT l_suppkey, o, rn, n, s1, s,
         s1 * s1 / CAST(rn AS DOUBLE)
           + (s - s1) * (s - s1) / CAST(n - rn AS DOUBLE)
           - s * s / CAST(n AS DOUBLE) AS gain
  FROM p WHERE rn >= 5 AND rn <= n - 5
), best AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY l_suppkey
                               ORDER BY gain DESC, o ASC) AS rk
  FROM cand
)
SELECT l_suppkey, o AS break_after,
       CAST(rn AS BIGINT) AS n_before, CAST(n - rn AS BIGINT) AS n_after,
       ROUND(s1 / CAST(rn AS DOUBLE), 6) AS mean_before,
       ROUND((s - s1) / CAST(n - rn AS DOUBLE), 6) AS mean_after,
       ROUND(gain, 6) AS ss_gain
FROM best WHERE rk = 1 ORDER BY l_suppkey
"""

ORACLES["q_holt"] = """
WITH RECURSIVE monthly AS (
  SELECT o_orderpriority AS g, strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
         CAST(COUNT(*) AS DOUBLE) AS x
  FROM orders GROUP BY 1, 2
), s AS (
  SELECT g, x, ROW_NUMBER() OVER (PARTITION BY g ORDER BY month) AS rn FROM monthly
), nmax AS (
  SELECT g, MAX(rn) AS n FROM s GROUP BY g
), r(g, rn, l, b) AS (
  SELECT s0.g, 2, s0.x,
         CAST(ROUND((s1.x - s0.x) * 1000000) AS DOUBLE) / 1000000
  FROM s s0 JOIN s s1 ON s0.g = s1.g AND s0.rn = 1 AND s1.rn = 2
  UNION ALL
  SELECT r.g, r.rn + 1,
         CAST(ROUND((0.5 * s.x + (1 - 0.5) * (r.l + r.b)) * 1000000) AS DOUBLE) / 1000000,
         CAST(ROUND((0.25 * ((CAST(ROUND((0.5 * s.x + (1 - 0.5) * (r.l + r.b)) * 1000000) AS DOUBLE) / 1000000) - r.l) + (1 - 0.25) * r.b) * 1000000) AS DOUBLE) / 1000000
  FROM r JOIN s ON s.g = r.g AND s.rn = r.rn + 1
)
SELECT r.g AS o_orderpriority, CAST(r.rn AS BIGINT) AS n_obs,
       ROUND(r.l, 6) AS level, ROUND(r.b, 6) AS trend,
       ROUND(r.l + 3.0 * r.b, 6) AS forecast_h3
FROM r JOIN nmax ON r.g = nmax.g AND r.rn = nmax.n
ORDER BY r.g
"""

ORACLES["q_theil_u"] = f"""
WITH daily AS (
  SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS day,
         ROUND({_dsum('l_extendedprice / 1000.0')}, 6) AS y
  FROM lineitem GROUP BY strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')
), lagged AS (
  SELECT y,
         LAG(y, 1) OVER (ORDER BY day) AS l1,
         LAG(y, 7) OVER (ORDER BY day) AS l7
  FROM daily
), e AS (
  SELECT ROUND(y - l1, 6) AS e1, ROUND(y - l7, 6) AS e7
  FROM lagged WHERE l7 IS NOT NULL
), agg AS (
  SELECT COUNT(*) AS n, {_dsum('e1 * e1')} AS s1, {_dsum('e7 * e7')} AS s7
  FROM e
)
SELECT CAST(n AS BIGINT) AS n,
       ROUND(sqrt(s1 / CAST(n AS DOUBLE)), 6) AS rmse_naive,
       ROUND(sqrt(s7 / CAST(n AS DOUBLE)), 6) AS rmse_weekly,
       ROUND(sqrt(s7 / CAST(n AS DOUBLE)) / sqrt(s1 / CAST(n AS DOUBLE)), 6) AS theil_u
FROM agg
"""

ORACLES["q_nelson_aalen"] = """
WITH per_user AS (
  SELECT user_id, MIN(ts) AS first_ts,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS fp,
         MAX(ts) AS last_ts
  FROM events GROUP BY user_id
), users AS (
  SELECT datediff('day', CAST(first_ts AS DATE),
                  CAST(COALESCE(fp, last_ts) AS DATE)) AS t,
         CASE WHEN fp IS NOT NULL THEN 1 ELSE 0 END AS event
  FROM per_user
), per_t AS (
  SELECT t, COUNT(*) AS n_at, CAST(SUM(event) AS BIGINT) AS d
  FROM users GROUP BY t
), tot AS (SELECT SUM(n_at) AS total FROM per_t),
at_risk AS (
  SELECT t, d,
         CAST(tot.total - COALESCE(SUM(n_at) OVER (ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS n_risk
  FROM per_t CROSS JOIN tot
), cum AS (
  SELECT t, n_risk, d,
         CAST(SUM(CAST(ROUND(CAST(d AS DOUBLE) / n_risk * 1000000000) AS BIGINT))
              OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS DOUBLE) / 1000000000 AS h
  FROM at_risk
)
SELECT t, n_risk, d,
       ROUND(h, 6) AS cum_hazard,
       ROUND(EXP(-h), 6) AS survival_breslow
FROM cum WHERE d > 0 ORDER BY t
"""


ORACLES["q_erasure_scope"] = """
WITH seeds AS (
  SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0
), ho AS (
  SELECT o_orderkey FROM orders
  WHERE o_custkey IN (SELECT c_custkey FROM seeds)
), hl AS (
  SELECT 1 AS x FROM lineitem
  WHERE l_orderkey IN (SELECT o_orderkey FROM ho)
), u AS (
  SELECT 'customer' AS table_name,
         (SELECT COUNT(*) FROM seeds) AS n_rows_affected,
         (SELECT COUNT(*) FROM customer) AS n_rows_total
  UNION ALL
  SELECT 'orders', (SELECT COUNT(*) FROM ho), (SELECT COUNT(*) FROM orders)
  UNION ALL
  SELECT 'lineitem', (SELECT COUNT(*) FROM hl), (SELECT COUNT(*) FROM lineitem)
)
SELECT table_name,
       CAST(n_rows_affected AS BIGINT) AS n_rows_affected,
       CAST(n_rows_total AS BIGINT) AS n_rows_total,
       ROUND(CAST(n_rows_affected AS DOUBLE) / n_rows_total, 6) AS affected_share
FROM u ORDER BY table_name
"""

ORACLES["q_retention_sweep"] = """
WITH u AS (
  SELECT 'orders' AS table_name, COUNT(*) AS n_rows,
         CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1997-08-01' THEN 1 ELSE 0 END) AS BIGINT) AS n_expired,
         ROUND(CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1997-08-01' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS expired_share,
         strftime(MIN(o_orderdate), '%Y-%m-%d') AS oldest_row
  FROM orders
  UNION ALL
  SELECT 'lineitem', COUNT(*),
         CAST(SUM(CASE WHEN l_shipdate < TIMESTAMP '1997-08-01' THEN 1 ELSE 0 END) AS BIGINT),
         ROUND(CAST(SUM(CASE WHEN l_shipdate < TIMESTAMP '1997-08-01' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6),
         strftime(MIN(l_shipdate), '%Y-%m-%d')
  FROM lineitem
  UNION ALL
  SELECT 'events', COUNT(*),
         CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-17' THEN 1 ELSE 0 END) AS BIGINT),
         ROUND(CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-17' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6),
         strftime(MIN(ts), '%Y-%m-%d')
  FROM events
)
SELECT table_name, CAST(n_rows AS BIGINT) AS n_rows, n_expired, expired_share, oldest_row
FROM u ORDER BY table_name
"""

ORACLES["q_obrien_fleming"] = """
WITH looks(look, cut_ts, obf_boundary) AS (
  VALUES (1, TIMESTAMP '2024-01-02', 4.333),
         (2, TIMESTAMP '2024-01-04', 2.963),
         (3, TIMESTAMP '2024-01-06', 2.359),
         (4, TIMESTAMP '2024-01-08', 2.014)
), j AS (
  SELECT l.look, l.obf_boundary, e.user_id,
         CASE WHEN e.user_id % 2 = 0 THEN 1 ELSE 0 END AS arm,
         CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END AS conv
  FROM events e CROSS JOIN looks l
  WHERE e.ts < l.cut_ts
), pu AS (
  SELECT look, obf_boundary, user_id, arm, MAX(conv) AS conv
  FROM j GROUP BY 1, 2, 3, 4
), g AS (
  SELECT look, obf_boundary,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
         CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
         CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS x_t,
         CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS x_c
  FROM pu GROUP BY 1, 2
)
SELECT CAST(look AS INTEGER) AS look, n_t, n_c,
       ROUND(CAST(x_t AS DOUBLE) / n_t, 6) AS conv_t,
       ROUND(CAST(x_c AS DOUBLE) / n_c, 6) AS conv_c,
       ROUND((CAST(x_t AS DOUBLE) / n_t - CAST(x_c AS DOUBLE) / n_c)
             / sqrt((CAST(x_t + x_c AS DOUBLE) / (n_t + n_c))
                    * (1.0 - CAST(x_t + x_c AS DOUBLE) / (n_t + n_c))
                    * (1.0 / n_t + 1.0 / n_c)), 6) AS z_stat,
       obf_boundary,
       CAST(CASE WHEN ABS((CAST(x_t AS DOUBLE) / n_t - CAST(x_c AS DOUBLE) / n_c)
             / sqrt((CAST(x_t + x_c AS DOUBLE) / (n_t + n_c))
                    * (1.0 - CAST(x_t + x_c AS DOUBLE) / (n_t + n_c))
                    * (1.0 / n_t + 1.0 / n_c))) > obf_boundary
                 THEN 1 ELSE 0 END AS INTEGER) AS crossed
FROM g ORDER BY look
"""


ORACLES["q_f1_multiclass"] = f"""
WITH cm AS ({ORACLES["q_naive_bayes"]}),
t AS (
  SELECT true_lang AS cls, CAST(SUM(n_docs) AS BIGINT) AS n_true,
         CAST(SUM(CASE WHEN pred_lang = true_lang THEN n_docs ELSE 0 END) AS BIGINT) AS tp_t
  FROM cm GROUP BY true_lang
), p AS (
  SELECT pred_lang AS cls, CAST(SUM(n_docs) AS BIGINT) AS n_pred FROM cm GROUP BY pred_lang
), per AS (
  SELECT COALESCE(t.cls, p.cls) AS cls,
         COALESCE(tp_t, 0) AS tp,
         COALESCE(n_pred, 0) - COALESCE(tp_t, 0) AS fp,
         COALESCE(n_true, 0) - COALESCE(tp_t, 0) AS fn
  FROM t FULL JOIN p ON t.cls = p.cls
), rows_ AS (
  SELECT cls, tp, fp, fn,
         ROUND(CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / (tp + fp) ELSE 0.0 END, 6) AS precision,
         ROUND(CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / (tp + fn) ELSE 0.0 END, 6) AS recall,
         ROUND(CASE WHEN tp > 0 THEN 2.0 * CAST(tp AS DOUBLE) / (2.0 * tp + fp + fn) ELSE 0.0 END, 6) AS f1
  FROM per
), summ AS (
  SELECT CAST(SUM(tp) AS BIGINT) AS tp, CAST(SUM(fp) AS BIGINT) AS fp,
         CAST(SUM(fn) AS BIGINT) AS fn,
         {_dsum('precision')} / COUNT(*) AS mp,
         {_dsum('recall')} / COUNT(*) AS mr,
         {_dsum('f1')} / COUNT(*) AS mf,
         CAST(SUM(tp) AS DOUBLE) / (SUM(tp) + SUM(fn)) AS acc
  FROM rows_
)
SELECT * FROM (
  SELECT cls, tp, fp, fn, precision, recall, f1 FROM rows_
  UNION ALL
  SELECT '__macro', tp, fp, fn, ROUND(mp, 6), ROUND(mr, 6), ROUND(mf, 6) FROM summ
  UNION ALL
  SELECT '__micro', tp, fp, fn, ROUND(acc, 6), ROUND(acc, 6), ROUND(acc, 6) FROM summ
) ORDER BY cls
"""

ORACLES["q_mcc"] = """
WITH scored AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS true_en,
         CASE WHEN CAST(len(list_filter(string_split(text, ' '),
                    t -> list_contains(['the','a','of','and','to','in','is','on','for','with'], t)))
              AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE) >= 0.05
              THEN 1 ELSE 0 END AS pred_en
  FROM documents
), g AS (
  SELECT CAST(SUM(CASE WHEN pred_en = 1 AND true_en = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN pred_en = 1 AND true_en = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(SUM(CASE WHEN pred_en = 0 AND true_en = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         CAST(SUM(CASE WHEN pred_en = 0 AND true_en = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
  FROM scored
)
SELECT tp, fp, fn, tn,
       ROUND((CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)
              - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))
             / sqrt((CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE))
                    * (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE))
                    * (CAST(tn AS DOUBLE) + CAST(fp AS DOUBLE))
                    * (CAST(tn AS DOUBLE) + CAST(fn AS DOUBLE))), 6) AS mcc,
       ROUND((CAST(tp AS DOUBLE) / (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE))
              + CAST(tn AS DOUBLE) / (CAST(tn AS DOUBLE) + CAST(fp AS DOUBLE))) / 2.0, 6)
         AS balanced_accuracy,
       ROUND((CAST(tp AS DOUBLE) + CAST(tn AS DOUBLE))
             / (CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE)
                + CAST(fn AS DOUBLE) + CAST(tn AS DOUBLE)), 6) AS accuracy
FROM g
"""

ORACLES["q_cohen_kappa"] = """
WITH scored AS (
  SELECT CASE WHEN CAST(len(list_filter(string_split(text, ' '),
                    t -> list_contains(['the','a','of','and','to','in','is','on','for','with'], t)))
              AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE) >= 0.05
              THEN 1 ELSE 0 END AS ra,
         CASE WHEN CAST(length(regexp_replace(text, '[^\\x00-\\x7F]', '', 'g')) AS DOUBLE)
                   / NULLIF(length(text), 0) >= 0.99
              THEN 1 ELSE 0 END AS rb
  FROM documents
), g AS (
  SELECT CAST(SUM(CASE WHEN ra = 1 AND rb = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n11,
         CAST(SUM(CASE WHEN ra = 1 AND rb = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
         CAST(SUM(CASE WHEN ra = 0 AND rb = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
         CAST(SUM(CASE WHEN ra = 0 AND rb = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n00
  FROM scored
)
SELECT n11, n10, n01, n00,
       ROUND(CAST(n11 + n00 AS DOUBLE) / CAST(n11 + n10 + n01 + n00 AS DOUBLE), 6) AS p_observed,
       ROUND((CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
              + CAST(n01 + n00 AS DOUBLE) * (n10 + n00))
             / (CAST(n11 + n10 + n01 + n00 AS DOUBLE)
                * CAST(n11 + n10 + n01 + n00 AS DOUBLE)), 6) AS p_expected,
       ROUND((CAST(n11 + n00 AS DOUBLE) / CAST(n11 + n10 + n01 + n00 AS DOUBLE)
              - (CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
                 + CAST(n01 + n00 AS DOUBLE) * (n10 + n00))
                / (CAST(n11 + n10 + n01 + n00 AS DOUBLE)
                   * CAST(n11 + n10 + n01 + n00 AS DOUBLE)))
             / (1.0 - (CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
                       + CAST(n01 + n00 AS DOUBLE) * (n10 + n00))
                      / (CAST(n11 + n10 + n01 + n00 AS DOUBLE)
                         * CAST(n11 + n10 + n01 + n00 AS DOUBLE))), 6) AS kappa
FROM g
"""


ORACLES["q_inventory_policy"] = f"""
WITH daily AS (
  SELECT p.p_brand, strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS day,
         ROUND({_dsum('l_quantity')}, 6) AS qty
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand, strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')
), stats AS (
  SELECT p_brand, COUNT(*) AS n_days,
         {_dsum('qty')} AS s, {_dsum('qty * qty')} AS ss
  FROM daily GROUP BY p_brand
), price AS (
  SELECT p_brand, {_dsum('p_retailprice')} / COUNT(p_retailprice) AS price
  FROM part GROUP BY p_brand
)
SELECT stats.p_brand, CAST(n_days AS BIGINT) AS n_days,
       ROUND(s / CAST(n_days AS DOUBLE), 6) AS mean_daily_demand,
       ROUND(sqrt(ss / CAST(n_days AS DOUBLE)
                  - (s / CAST(n_days AS DOUBLE)) * (s / CAST(n_days AS DOUBLE))), 6)
         AS sd_daily_demand,
       ROUND(1.645 * sqrt(ss / CAST(n_days AS DOUBLE)
                          - (s / CAST(n_days AS DOUBLE)) * (s / CAST(n_days AS DOUBLE)))
             * sqrt(7.0), 6) AS safety_stock,
       ROUND(s / CAST(n_days AS DOUBLE) * 7.0
             + 1.645 * sqrt(ss / CAST(n_days AS DOUBLE)
                            - (s / CAST(n_days AS DOUBLE)) * (s / CAST(n_days AS DOUBLE)))
               * sqrt(7.0), 6) AS reorder_point,
       ROUND(sqrt(2.0 * s * 100.0 / (0.2 * price)), 6) AS eoq
FROM stats JOIN price ON stats.p_brand = price.p_brand
ORDER BY stats.p_brand
"""

ORACLES["q_croston"] = f"""
WITH RECURSIVE occ AS (
  SELECT l_partkey, strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS day,
         ROUND({_dsum('l_quantity')}, 6) AS size_v
  FROM lineitem WHERE l_partkey <= 40
  GROUP BY l_partkey, strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')
), s AS (
  SELECT l_partkey, day, size_v,
         ROW_NUMBER() OVER (PARTITION BY l_partkey ORDER BY day) AS rn
  FROM occ
), nmax AS (
  SELECT l_partkey, MAX(rn) AS n FROM s GROUP BY l_partkey
), r(k, rn, z, p) AS (
  SELECT s1.l_partkey, 2, CAST(s1.size_v AS DOUBLE),
         CAST(datediff('day', CAST(s1.day AS DATE), CAST(s2.day AS DATE)) AS DOUBLE)
  FROM s s1 JOIN s s2 ON s1.l_partkey = s2.l_partkey AND s1.rn = 1 AND s2.rn = 2
  UNION ALL
  SELECT r.k, r.rn + 1,
         CAST(ROUND((0.1 * sc.size_v + (1 - 0.1) * r.z) * 1000000) AS DOUBLE) / 1000000,
         CAST(ROUND((0.1 * datediff('day', CAST(sp.day AS DATE), CAST(sc.day AS DATE))
                     + (1 - 0.1) * r.p) * 1000000) AS DOUBLE) / 1000000
  FROM r
  JOIN s sc ON sc.l_partkey = r.k AND sc.rn = r.rn + 1
  JOIN s sp ON sp.l_partkey = r.k AND sp.rn = r.rn
)
SELECT r.k AS l_partkey, CAST(nmax.n AS BIGINT) AS n_events,
       ROUND(r.z, 6) AS size_est, ROUND(r.p, 6) AS interval_est,
       ROUND(r.z / r.p, 6) AS demand_rate
FROM r JOIN nmax ON r.k = nmax.l_partkey AND r.rn = nmax.n
ORDER BY l_partkey
"""

ORACLES["q_newsvendor"] = f"""
WITH daily AS (
  SELECT p.p_brand, strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS day,
         ROUND({_dsum('l_quantity')}, 6) AS qty
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand, strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')
), qv AS (
  SELECT p_brand, ROUND(quantile_cont(qty, 0.8), 6) AS stock_level
  FROM daily GROUP BY p_brand
), j AS (
  SELECT d.p_brand, d.qty, q.stock_level
  FROM daily d JOIN qv q ON d.p_brand = q.p_brand
)
SELECT p_brand, COUNT(*) AS n_days, MAX(stock_level) AS stock_level,
       ROUND(CAST(SUM(CASE WHEN qty > stock_level THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS stockout_share,
       ROUND({_dsum('GREATEST(ROUND(qty - stock_level, 6), 0.0)')} / COUNT(*), 6)
         AS mean_unmet_demand
FROM j GROUP BY p_brand ORDER BY p_brand
"""


ORACLES["q_pairs_trading"] = f"""
WITH daily AS (
  SELECT l_suppkey, strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS day,
         ROUND({_dsum('l_extendedprice / 1000.0')} / COUNT(*), 6) AS px
  FROM lineitem WHERE l_suppkey IN (1, 2)
  GROUP BY l_suppkey, strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')
), pairs AS (
  SELECT a.day, a.px AS x, b.px AS y
  FROM daily a JOIN daily b ON a.day = b.day
  WHERE a.l_suppkey = 1 AND b.l_suppkey = 2
), mom AS (
  SELECT COUNT(*) AS n_days,
         {_dsum('x')} AS sx, {_dsum('y')} AS sy,
         {_dsum('x * x')} AS sxx, {_dsum('x * y')} AS sxy
  FROM pairs
), fit AS (
  SELECT n_days,
         ROUND((sxy - sx * sy / CAST(n_days AS DOUBLE))
               / (sxx - sx * sx / CAST(n_days AS DOUBLE)), 6) AS beta,
         ROUND(sy / CAST(n_days AS DOUBLE)
               - (sxy - sx * sy / CAST(n_days AS DOUBLE))
                 / (sxx - sx * sx / CAST(n_days AS DOUBLE))
                 * (sx / CAST(n_days AS DOUBLE)), 6) AS alpha
  FROM mom
), spr AS (
  SELECT day, n_days, beta, alpha,
         ROUND(y - (alpha + beta * x), 6) AS s
  FROM pairs CROSS JOIN fit
), lagged AS (
  SELECT n_days, beta, alpha, s, LAG(s) OVER (ORDER BY day) AS sl FROM spr
), ar AS (
  SELECT n_days, beta, alpha,
         {_dsum('sl * ROUND(s - sl, 6)')} AS num,
         {_dsum('sl * sl')} AS den
  FROM lagged WHERE sl IS NOT NULL GROUP BY n_days, beta, alpha
)
SELECT CAST(n_days AS BIGINT) AS n_days, beta, alpha,
       ROUND(num / den, 6) AS phi,
       ROUND(CASE WHEN num / den > -1.0 AND num / den < 0.0
                  THEN -LN(2.0) / LN(1.0 + num / den) END, 6) AS half_life_days
FROM ar
"""

ORACLES["q_weekday_effect"] = f"""
WITH daily AS (
  SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS day,
         ROUND({_dsum('l_extendedprice / 1000.0')}, 6) AS rev
  FROM lineitem GROUP BY strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')
), named AS (
  SELECT strftime(CAST(day AS DATE), '%A') AS grp, rev FROM daily
), g AS (
  SELECT grp, COUNT(*) AS ng,
         {_dsum('rev')} AS sg, {_dsum('rev * rev')} AS ssg
  FROM named GROUP BY grp
), tot AS (
  SELECT SUM(ng) AS n,
         ROUND(CAST(SUM(CAST(ROUND(sg * 1000000) AS BIGINT)) AS DOUBLE) / 1000000, 6) AS s,
         COUNT(*) AS k
  FROM g
), terms AS (
  SELECT CAST(ng AS DOUBLE)
           * (sg / CAST(ng AS DOUBLE) - s / CAST(n AS DOUBLE))
           * (sg / CAST(ng AS DOUBLE) - s / CAST(n AS DOUBLE)) AS bt,
         ssg - sg * sg / CAST(ng AS DOUBLE) AS wt,
         n, k
  FROM g CROSS JOIN tot
), red AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n, CAST(MAX(k) AS BIGINT) AS k,
         {_dsum('bt')} AS ssb, {_dsum('wt')} AS ssw
  FROM terms
)
SELECT n, k, ROUND(ssb, 6) AS ss_between, ROUND(ssw, 6) AS ss_within,
       ROUND((ssb / CAST(k - 1 AS DOUBLE)) / (ssw / CAST(n - k AS DOUBLE)), 6) AS f_stat
FROM red
"""

ORACLES["q_fellegi_sunter"] = """
WITH n_tot AS (
  SELECT COUNT(*) AS n FROM customer
), u_nat AS (
  SELECT SUM(CAST(f AS DOUBLE) * f) / (CAST(MAX(n) AS DOUBLE) * MAX(n)) AS u_nation
  FROM (SELECT COUNT(*) AS f FROM customer GROUP BY c_nationkey) CROSS JOIN n_tot
), u_seg AS (
  SELECT SUM(CAST(f AS DOUBLE) * f) / (CAST(MAX(n) AS DOUBLE) * MAX(n)) AS u_segment
  FROM (SELECT COUNT(*) AS f FROM customer GROUP BY c_mktsegment) CROSS JOIN n_tot
), pairs AS (
  SELECT a.c_nationkey AS n1, a.c_mktsegment AS s1,
         b.c_nationkey AS n2, b.c_mktsegment AS s2
  FROM customer a JOIN customer b
    ON CAST(FLOOR(a.c_acctbal / 100) AS BIGINT) = CAST(FLOOR(b.c_acctbal / 100) AS BIGINT)
   AND a.c_custkey < b.c_custkey
), pat AS (
  SELECT CASE WHEN n1 = n2 THEN 1 ELSE 0 END AS nation_agree,
         CASE WHEN s1 = s2 THEN 1 ELSE 0 END AS segment_agree,
         COUNT(*) AS n_pairs
  FROM pairs GROUP BY 1, 2
)
SELECT nation_agree, segment_agree, CAST(n_pairs AS BIGINT) AS n_pairs,
       ROUND((CASE WHEN nation_agree = 1 THEN log2(0.95 / u_nation)
                   ELSE log2((1.0 - 0.95) / (1.0 - u_nation)) END)
             + (CASE WHEN segment_agree = 1 THEN log2(0.95 / u_segment)
                     ELSE log2((1.0 - 0.95) / (1.0 - u_segment)) END), 6) AS fs_score
FROM pat CROSS JOIN u_nat CROSS JOIN u_seg
ORDER BY nation_agree, segment_agree
"""


ORACLES["q_session_stats"] = """
WITH s AS (
  SELECT user_id, ts, event_id,
         COALESCE(CASE WHEN CAST(FLOOR(date_part('epoch', ts)) AS BIGINT)
                            - LAG(CAST(FLOOR(date_part('epoch', ts)) AS BIGINT))
                              OVER (PARTITION BY user_id ORDER BY ts, event_id)
                            > 1800
                       THEN 1 ELSE 0 END, 1) AS newsess
  FROM events
), sid AS (
  SELECT user_id, ts,
         SUM(newsess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM s
), per_sess AS (
  SELECT user_id, sid, COUNT(*) AS n_ev,
         MAX(CAST(FLOOR(date_part('epoch', ts)) AS BIGINT))
           - MIN(CAST(FLOOR(date_part('epoch', ts)) AS BIGINT)) AS dur
  FROM sid GROUP BY user_id, sid
)
SELECT COUNT(*) AS n_sessions,
       ROUND(CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT user_id), 6) AS sessions_per_user,
       ROUND(CAST(SUM(n_ev) AS DOUBLE) / COUNT(*), 6) AS mean_events,
       ROUND(CAST(SUM(dur) AS DOUBLE) / COUNT(*), 6) AS mean_duration_s,
       ROUND(quantile_cont(CAST(dur AS DOUBLE), 0.5), 6) AS median_duration_s,
       ROUND(CAST(SUM(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
         AS bounce_share
FROM per_sess
"""

ORACLES["q_stickiness"] = """
WITH ud AS (
  SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day, user_id FROM events
), days AS (
  SELECT DISTINCT day FROM ud
), dau AS (
  SELECT day, COUNT(DISTINCT user_id) AS dau FROM ud GROUP BY day
), wau AS (
  SELECT d.day AS asof_day, COUNT(DISTINCT u.user_id) AS wau
  FROM days d JOIN ud u
    ON u.day <= d.day
   AND CAST(u.day AS DATE) >= CAST(d.day AS DATE) - INTERVAL 6 DAY
  GROUP BY d.day
)
SELECT dau.day, CAST(dau AS BIGINT) AS dau, CAST(wau AS BIGINT) AS wau,
       ROUND(CAST(dau AS DOUBLE) / wau, 6) AS stickiness
FROM dau JOIN wau ON dau.day = wau.asof_day
ORDER BY dau.day
"""

ORACLES["q_feature_adoption"] = """
WITH first_any AS (
  SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id
), first_ft AS (
  SELECT user_id, event_type, MIN(ts) AS ft FROM events GROUP BY user_id, event_type
), tot AS (
  SELECT COUNT(*) AS n_users FROM first_any
), j AS (
  SELECT f.event_type,
         datediff('day', CAST(a.first_ts AS DATE), CAST(f.ft AS DATE)) AS lag_days,
         CASE WHEN f.ft < TIMESTAMP '2024-01-08' THEN 1 ELSE 0 END AS week1,
         n_users
  FROM first_ft f JOIN first_any a ON f.user_id = a.user_id CROSS JOIN tot
)
SELECT event_type, COUNT(*) AS n_adopters,
       CAST(SUM(week1) AS BIGINT) AS n_week1,
       ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(n_users), 6) AS adoption_share,
       ROUND(quantile_cont(CAST(lag_days AS DOUBLE), 0.5), 6) AS median_days_to_adopt
FROM j GROUP BY event_type ORDER BY event_type
"""


ORACLES["q_jarque_bera"] = f"""
WITH g AS (
  SELECT o_orderpriority AS grp, COUNT(*) AS n,
         {_dsum('o_totalprice / 10000.0')} AS s1,
         {_dsum('(o_totalprice / 10000.0) * (o_totalprice / 10000.0)')} AS s2,
         {_dsum('(o_totalprice / 10000.0) * (o_totalprice / 10000.0) * (o_totalprice / 10000.0)')} AS s3,
         {_dsum('(o_totalprice / 10000.0) * (o_totalprice / 10000.0) * (o_totalprice / 10000.0) * (o_totalprice / 10000.0)')} AS s4
  FROM orders GROUP BY o_orderpriority
), m AS (
  SELECT grp, CAST(n AS BIGINT) AS n,
         s2 / n - (s1 / n) * (s1 / n) AS m2,
         s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
         s4 / n - 4 * (s1 / n) * (s3 / n) + 6 * (s1 / n) * (s1 / n) * (s2 / n)
           - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
  FROM g
)
, r AS (
  SELECT grp, n,
         ROUND(m3 / (m2 * sqrt(m2)), 6) AS skewness,
         ROUND(m4 / (m2 * m2) - 3.0, 6) AS excess_kurtosis
  FROM m
)
SELECT grp, n, skewness, excess_kurtosis,
       CAST(ROUND(n / 6.0 * (skewness * skewness
             + excess_kurtosis * excess_kurtosis / 4.0) * 1000000) AS DOUBLE)
         / 1000000 AS jb_stat,
       CAST(CASE WHEN n / 6.0 * (skewness * skewness
                 + excess_kurtosis * excess_kurtosis / 4.0) > 5.991
            THEN 1 ELSE 0 END AS INTEGER) AS flag_nonnormal
FROM r ORDER BY grp
"""

ORACLES["q_qq_normal"] = f"""
WITH base AS (
  SELECT o_totalprice / 10000.0 AS x FROM orders
), mom AS (
  SELECT COUNT(*) AS n, {_dsum('x')} AS s1, {_dsum('x * x')} AS s2 FROM base
), decs AS (
  SELECT UNNEST(generate_series(0, 8)) AS pos,
         UNNEST(quantile_cont(x, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]))
           AS sample_q
  FROM base
), zs(pos, p, normal_z) AS (
  VALUES (0, 0.1, -1.281552), (1, 0.2, -0.841621), (2, 0.3, -0.524401),
         (3, 0.4, -0.253347), (4, 0.5, 0.0), (5, 0.6, 0.253347),
         (6, 0.7, 0.524401), (7, 0.8, 0.841621), (8, 0.9, 1.281552)
)
SELECT zs.p,
       ROUND(sample_q, 6) AS sample_q,
       ROUND((sample_q - s1 / n) / sqrt(s2 / n - (s1 / n) * (s1 / n)), 6) AS sample_z,
       zs.normal_z,
       ROUND((sample_q - s1 / n) / sqrt(s2 / n - (s1 / n) * (s1 / n)) - zs.normal_z, 6) AS gap
FROM decs JOIN zs ON decs.pos = zs.pos CROSS JOIN mom
ORDER BY zs.p
"""

ORACLES["q_iqr_fences"] = """
WITH qs AS (
  SELECT o_orderpriority AS grp,
         ROUND(quantile_cont(o_totalprice, 0.25), 6) AS q1,
         ROUND(quantile_cont(o_totalprice, 0.75), 6) AS q3
  FROM orders GROUP BY o_orderpriority
), fence AS (
  SELECT grp, q1, q3, ROUND(q3 - q1, 6) AS iqr,
         ROUND(q1 - 1.5 * ROUND(q3 - q1, 6), 6) AS lo_inner,
         ROUND(q3 + 1.5 * ROUND(q3 - q1, 6), 6) AS hi_inner,
         ROUND(q1 - 3.0 * ROUND(q3 - q1, 6), 6) AS lo_outer,
         ROUND(q3 + 3.0 * ROUND(q3 - q1, 6), 6) AS hi_outer
  FROM qs
)
SELECT grp, COUNT(*) AS n, q1, q3, iqr, lo_inner, hi_inner,
       CAST(SUM(CASE WHEN o_totalprice < lo_inner OR o_totalprice > hi_inner
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       CAST(SUM(CASE WHEN o_totalprice < lo_outer OR o_totalprice > hi_outer
                THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
       ROUND(CAST(SUM(CASE WHEN o_totalprice < lo_inner OR o_totalprice > hi_inner
                      THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS outlier_share
FROM orders o JOIN fence f ON o.o_orderpriority = f.grp
GROUP BY grp, q1, q3, iqr, lo_inner, hi_inner
ORDER BY grp
"""


ORACLES["q_error_budget"] = """
WITH anchor AS (
  SELECT MAX(ts) AS asof_ts FROM events
), wins(win, days, burn_alert_at) AS (
  VALUES ('1d', 1, 14.4), ('3d', 3, 6.0), ('7d', 7, 3.0)
), j AS (
  SELECT w.win, w.burn_alert_at, e.event_type
  FROM events e CROSS JOIN anchor CROSS JOIN wins w
  WHERE e.ts >= anchor.asof_ts - w.days * INTERVAL 1 DAY
), g AS (
  SELECT win, burn_alert_at, COUNT(*) AS n_events,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors
  FROM j GROUP BY win, burn_alert_at
)
SELECT win, n_events, n_errors,
       ROUND(CAST(n_errors AS DOUBLE) / n_events, 6) AS error_share,
       ROUND(CAST(n_errors AS DOUBLE) / n_events / CAST(0.005 AS DOUBLE), 6) AS burn_rate,
       CAST(CASE WHEN CAST(n_errors AS DOUBLE) / n_events / CAST(0.005 AS DOUBLE)
                      > burn_alert_at
                 THEN 1 ELSE 0 END AS INTEGER) AS alert
FROM g ORDER BY win
"""

ORACLES["q_apdex"] = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CASE WHEN value <= 150.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_satisfied,
       CAST(SUM(CASE WHEN value > 150.0 AND value <= 600.0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_tolerating,
       ROUND((CAST(SUM(CASE WHEN value <= 150.0 THEN 1 ELSE 0 END) AS DOUBLE)
              + CAST(SUM(CASE WHEN value > 150.0 AND value <= 600.0 THEN 1 ELSE 0 END) AS DOUBLE) / 2.0)
             / COUNT(*), 6) AS apdex
FROM events GROUP BY event_type ORDER BY event_type
"""

ORACLES["q_incident_stats"] = """
WITH err AS (
  SELECT ts, event_id, CAST(FLOOR(date_part('epoch', ts)) AS BIGINT) AS sec
  FROM events WHERE event_type = 'error'
), marked AS (
  SELECT ts, sec,
         COALESCE(CASE WHEN sec - LAG(sec) OVER (ORDER BY ts, event_id) > 600
                       THEN 1 ELSE 0 END, 1) AS newinc,
         event_id
  FROM err
), iid AS (
  SELECT sec,
         SUM(newinc) OVER (ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS iid
  FROM marked
), per_inc AS (
  SELECT iid, COUNT(*) AS n_err, MIN(sec) AS start_s,
         MAX(sec) - MIN(sec) AS dur
  FROM iid GROUP BY iid
), gaps AS (
  SELECT n_err, dur,
         start_s - LAG(start_s) OVER (ORDER BY iid) AS tbi
  FROM per_inc
)
SELECT COUNT(*) AS n_incidents,
       ROUND(CAST(SUM(dur) AS DOUBLE) / COUNT(*), 6) AS mean_duration_s,
       ROUND(quantile_cont(CAST(dur AS DOUBLE), 0.5), 6) AS median_duration_s,
       CAST(MAX(n_err) AS BIGINT) AS max_burst_errors,
       ROUND(CAST(SUM(tbi) AS DOUBLE) / COUNT(tbi), 6) AS mean_time_between_s
FROM gaps
"""


ORACLES["q_price_index"] = f"""
WITH per AS (
  SELECT l_partkey, year(l_shipdate) AS y,
         ROUND({_dsum('l_extendedprice / l_quantity')} / COUNT(*), 6) AS p,
         ROUND({_dsum('l_quantity')}, 6) AS q
  FROM lineitem WHERE year(l_shipdate) IN (1995, 2000)
  GROUP BY l_partkey, year(l_shipdate)
), j AS (
  SELECT b.p AS p0, b.q AS q0, c.p AS p1, c.q AS q1
  FROM per b JOIN per c
    ON b.l_partkey = c.l_partkey AND b.y = 1995 AND c.y = 2000
), agg AS (
  SELECT COUNT(*) AS n_parts,
         {_dsum('p1 * q0 / 1000.0')} AS l_num,
         {_dsum('p0 * q0 / 1000.0')} AS l_den,
         {_dsum('p1 * q1 / 1000.0')} AS p_num,
         {_dsum('p0 * q1 / 1000.0')} AS p_den
  FROM j
)
SELECT CAST(n_parts AS BIGINT) AS n_parts,
       ROUND(l_num / l_den, 6) AS laspeyres,
       ROUND(p_num / p_den, 6) AS paasche,
       ROUND(sqrt((l_num / l_den) * (p_num / p_den)), 6) AS fisher
FROM agg
"""

ORACLES["q_bass_diffusion"] = """
WITH first_s AS (
  SELECT user_id, MIN(strftime(ts, '%Y-%m-%d')) AS day
  FROM events WHERE event_type = 'signup' GROUP BY user_id
), daily AS (
  SELECT day, COUNT(*) AS n_t FROM first_s GROUP BY day
), cc AS (
  SELECT day, CAST(n_t AS BIGINT) AS y,
         CAST(COALESCE(SUM(n_t) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS c
  FROM daily
), mom AS (
  SELECT COUNT(*) AS n,
         SUM(c) AS m1, SUM(c * c) AS m2, SUM(c * c * c) AS m3,
         SUM(c * c * c * c) AS m4,
         SUM(y) AS sy, SUM(y * c) AS sy1, SUM(y * c * c) AS sy2
  FROM cc
), dets AS (
  SELECT CAST(n AS BIGINT) AS n_days,
         CAST(n AS DOUBLE) * (CAST(m2 AS DOUBLE) * m4 - CAST(m3 AS DOUBLE) * m3)
           - CAST(m1 AS DOUBLE) * (CAST(m1 AS DOUBLE) * m4 - CAST(m3 AS DOUBLE) * m2)
           + CAST(m2 AS DOUBLE) * (CAST(m1 AS DOUBLE) * m3 - CAST(m2 AS DOUBLE) * m2) AS det,
         CAST(sy AS DOUBLE) * (CAST(m2 AS DOUBLE) * m4 - CAST(m3 AS DOUBLE) * m3)
           - CAST(m1 AS DOUBLE) * (CAST(sy1 AS DOUBLE) * m4 - CAST(m3 AS DOUBLE) * sy2)
           + CAST(m2 AS DOUBLE) * (CAST(sy1 AS DOUBLE) * m3 - CAST(m2 AS DOUBLE) * sy2) AS det_a,
         CAST(n AS DOUBLE) * (CAST(sy1 AS DOUBLE) * m4 - CAST(m3 AS DOUBLE) * sy2)
           - CAST(sy AS DOUBLE) * (CAST(m1 AS DOUBLE) * m4 - CAST(m3 AS DOUBLE) * m2)
           + CAST(m2 AS DOUBLE) * (CAST(m1 AS DOUBLE) * sy2 - CAST(sy1 AS DOUBLE) * m2) AS det_b,
         CAST(n AS DOUBLE) * (CAST(m2 AS DOUBLE) * sy2 - CAST(sy1 AS DOUBLE) * m3)
           - CAST(m1 AS DOUBLE) * (CAST(m1 AS DOUBLE) * sy2 - CAST(sy1 AS DOUBLE) * m2)
           + CAST(sy AS DOUBLE) * (CAST(m1 AS DOUBLE) * m3 - CAST(m2 AS DOUBLE) * m2) AS det_c
  FROM mom
), coefs AS (
  SELECT n_days,
         ROUND(det_a / det, 6) AS coef_a,
         ROUND(det_b / det, 6) AS coef_b,
         ROUND(det_c / det, 6) AS coef_c
  FROM dets
), msz AS (
  SELECT n_days, coef_a, coef_b, coef_c,
         CASE WHEN coef_c < 0.0 AND coef_b * coef_b - 4.0 * coef_c * coef_a >= 0.0
              THEN ROUND((-coef_b - sqrt(coef_b * coef_b - 4.0 * coef_c * coef_a))
                         / (2.0 * coef_c), 6) END AS market_size
  FROM coefs
)
SELECT n_days, coef_a, coef_b, coef_c, market_size,
       CASE WHEN market_size IS NOT NULL AND market_size > 0.0
            THEN ROUND(coef_a / market_size, 6) END AS p_innovation,
       CASE WHEN market_size IS NOT NULL
            THEN ROUND(-coef_c * market_size, 6) END AS q_imitation
FROM msz
"""

ORACLES["q_ols_inference"] = f"""
WITH mom AS (
  SELECT COUNT(*) AS n,
         {_dsum('l_quantity')} AS sx,
         {_dsum('l_extendedprice / 1000.0')} AS sy,
         {_dsum('l_quantity * l_quantity')} AS sxx,
         {_dsum('l_quantity * (l_extendedprice / 1000.0)')} AS sxy,
         {_dsum('(l_extendedprice / 1000.0) * (l_extendedprice / 1000.0)')} AS syy
  FROM lineitem
), c AS (
  SELECT CAST(n AS BIGINT) AS n,
         sxx - sx * sx / n AS cxx,
         sxy - sx * sy / n AS cxy,
         syy - sy * sy / n AS cyy,
         sx, sy
  FROM mom
)
SELECT n,
       ROUND(cxy / cxx, 6) AS beta,
       ROUND(sy / n - cxy / cxx * (sx / n), 6) AS alpha,
       ROUND(sqrt((cyy - cxy * cxy / cxx) / (n - 2) / cxx), 6) AS se_beta,
       ROUND((cxy / cxx) / sqrt((cyy - cxy * cxy / cxx) / (n - 2) / cxx), 6) AS t_beta,
       ROUND(1.0 - (cyy - cxy * cxy / cxx) / cyy, 6) AS r2,
       CAST(CASE WHEN abs((cxy / cxx) / sqrt((cyy - cxy * cxy / cxx) / (n - 2) / cxx))
                      > 1.96 THEN 1 ELSE 0 END AS INTEGER) AS significant
FROM c
"""


ORACLES["q_two_way_anova"] = f"""
WITH cells AS (
  SELECT o_orderpriority AS fa, o_orderstatus AS fb, COUNT(*) AS n_ab,
         {_dsum('o_totalprice / 1000.0')} AS s_ab,
         {_dsum('(o_totalprice / 1000.0) * (o_totalprice / 1000.0)')} AS ss_ab
  FROM orders GROUP BY o_orderpriority, o_orderstatus
), tot AS (
  SELECT SUM(n_ab) AS n,
         CAST(SUM(CAST(ROUND(s_ab * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS s,
         CAST(SUM(CAST(ROUND(ss_ab * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS ssq,
         COUNT(DISTINCT fa) AS ka, COUNT(DISTINCT fb) AS kb
  FROM cells
), ma AS (
  SELECT fa, SUM(n_ab) AS n_a,
         CAST(SUM(CAST(ROUND(s_ab * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS s_a
  FROM cells GROUP BY fa
), mb AS (
  SELECT fb, SUM(n_ab) AS n_b,
         CAST(SUM(CAST(ROUND(s_ab * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS s_b
  FROM cells GROUP BY fb
), ssa AS (
  SELECT {_dsum('CAST(n_a AS DOUBLE) * (s_a / n_a - s / CAST(n AS DOUBLE)) * (s_a / n_a - s / CAST(n AS DOUBLE))')} AS ss_a
  FROM ma CROSS JOIN tot
), ssb AS (
  SELECT {_dsum('CAST(n_b AS DOUBLE) * (s_b / n_b - s / CAST(n AS DOUBLE)) * (s_b / n_b - s / CAST(n AS DOUBLE))')} AS ss_b
  FROM mb CROSS JOIN tot
), ssc AS (
  SELECT {_dsum('CAST(n_ab AS DOUBLE) * (s_ab / n_ab - s / CAST(n AS DOUBLE)) * (s_ab / n_ab - s / CAST(n AS DOUBLE))')} AS ss_cells
  FROM cells CROSS JOIN tot
), j AS (
  SELECT tot.*, ss_a, ss_b, ss_cells FROM tot CROSS JOIN ssa CROSS JOIN ssb CROSS JOIN ssc
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(ka AS BIGINT) AS levels_a, CAST(kb AS BIGINT) AS levels_b,
       ROUND(ss_a, 6) AS ss_a,
       ROUND(ss_b, 6) AS ss_b,
       ROUND(ss_cells - ss_a - ss_b, 6) AS ss_interaction,
       ROUND(ssq - s * s / CAST(n AS DOUBLE) - ss_cells, 6) AS ss_within,
       ROUND(ss_a / CAST(ka - 1 AS DOUBLE)
             / ((ssq - s * s / CAST(n AS DOUBLE) - ss_cells) / CAST(n - ka * kb AS DOUBLE)), 6) AS f_a,
       ROUND(ss_b / CAST(kb - 1 AS DOUBLE)
             / ((ssq - s * s / CAST(n AS DOUBLE) - ss_cells) / CAST(n - ka * kb AS DOUBLE)), 6) AS f_b,
       ROUND((ss_cells - ss_a - ss_b) / (CAST(ka - 1 AS DOUBLE) * CAST(kb - 1 AS DOUBLE))
             / ((ssq - s * s / CAST(n AS DOUBLE) - ss_cells) / CAST(n - ka * kb AS DOUBLE)), 6) AS f_interaction
FROM j
"""

ORACLES["q_tukey_hsd"] = f"""
WITH g AS (
  SELECT o_orderpriority AS grp, COUNT(*) AS ng,
         {_dsum('o_totalprice / 1000.0')} AS sg,
         {_dsum('(o_totalprice / 1000.0) * (o_totalprice / 1000.0)')} AS ssg
  FROM orders GROUP BY o_orderpriority
), tot AS (
  SELECT SUM(ng) AS n, COUNT(*) AS k FROM g
), within AS (
  SELECT {_dsum('ssg - sg * sg / CAST(ng AS DOUBLE)')} AS ssw FROM g
), msw_rel AS (
  SELECT n, k, ssw / CAST(n - k AS DOUBLE) AS msw
  FROM tot CROSS JOIN within
), pairs AS (
  SELECT a.grp AS grp_a, b.grp AS grp_b,
         a.ng AS na, b.ng AS nb,
         a.sg / CAST(a.ng AS DOUBLE) AS m_a,
         b.sg / CAST(b.ng AS DOUBLE) AS m_b,
         msw
  FROM g a CROSS JOIN g b CROSS JOIN msw_rel
  WHERE a.grp < b.grp
)
SELECT grp_a, grp_b,
       ROUND(m_a - m_b, 6) AS mean_diff,
       ROUND(ABS(m_a - m_b) / sqrt(msw / 2.0 * (1.0 / na + 1.0 / nb)), 6) AS q_stat,
       CAST(CASE WHEN ABS(m_a - m_b) / sqrt(msw / 2.0 * (1.0 / na + 1.0 / nb)) > 3.86
                 THEN 1 ELSE 0 END AS INTEGER) AS significant
FROM pairs ORDER BY grp_a, grp_b
"""


ORACLES["q_huber_regression"] = f"""
WITH li AS (
  SELECT l_quantity AS x, l_extendedprice / 1000.0 AS y FROM lineitem
), mom AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         {_dsum('x')} AS sx, {_dsum('y')} AS sy,
         {_dsum('x * x')} AS sxx, {_dsum('x * y')} AS sxy
  FROM li
), ab0 AS (
  SELECT ROUND((sxy - sx * sy / n) / (sxx - sx * sx / n), 6) AS b,
         ROUND(sy / n - (sxy - sx * sy / n) / (sxx - sx * sx / n) * (sx / n), 6) AS a
  FROM mom
), w1 AS (
  SELECT {_dsum('w')} AS sw, {_dsum('w * x')} AS swx, {_dsum('w * y')} AS swy,
         {_dsum('w * x * x')} AS swxx, {_dsum('w * x * y')} AS swxy
  FROM (SELECT x, y, CASE WHEN ABS(y - (a + b * x)) <= 50.0 THEN 1.0
                          ELSE 50.0 / ABS(y - (a + b * x)) END AS w
        FROM li CROSS JOIN ab0)
), ab1 AS (
  SELECT ROUND((swxy - swx * swy / sw) / (swxx - swx * swx / sw), 6) AS b,
         ROUND(swy / sw - (swxy - swx * swy / sw) / (swxx - swx * swx / sw) * (swx / sw), 6) AS a
  FROM w1
), w2 AS (
  SELECT {_dsum('w')} AS sw, {_dsum('w * x')} AS swx, {_dsum('w * y')} AS swy,
         {_dsum('w * x * x')} AS swxx, {_dsum('w * x * y')} AS swxy
  FROM (SELECT x, y, CASE WHEN ABS(y - (a + b * x)) <= 50.0 THEN 1.0
                          ELSE 50.0 / ABS(y - (a + b * x)) END AS w
        FROM li CROSS JOIN ab1)
), ab2 AS (
  SELECT ROUND((swxy - swx * swy / sw) / (swxx - swx * swx / sw), 6) AS b,
         ROUND(swy / sw - (swxy - swx * swy / sw) / (swxx - swx * swx / sw) * (swx / sw), 6) AS a
  FROM w2
), w3 AS (
  SELECT {_dsum('w')} AS sw, {_dsum('w * x')} AS swx, {_dsum('w * y')} AS swy,
         {_dsum('w * x * x')} AS swxx, {_dsum('w * x * y')} AS swxy
  FROM (SELECT x, y, CASE WHEN ABS(y - (a + b * x)) <= 50.0 THEN 1.0
                          ELSE 50.0 / ABS(y - (a + b * x)) END AS w
        FROM li CROSS JOIN ab2)
), ab3 AS (
  SELECT ROUND((swxy - swx * swy / sw) / (swxx - swx * swx / sw), 6) AS b,
         ROUND(swy / sw - (swxy - swx * swy / sw) / (swxx - swx * swx / sw) * (swx / sw), 6) AS a
  FROM w3
)
SELECT COUNT(*) AS n, b AS slope, a AS intercept,
       CAST(SUM(CASE WHEN ABS(y - (a + b * x)) > 50.0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_downweighted
FROM li CROSS JOIN ab3 GROUP BY a, b
"""

ORACLES["q_trimmed_mean"] = f"""
WITH ranked AS (
  SELECT o_orderpriority, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS rk,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
)
SELECT o_orderpriority, CAST(MAX(n) AS BIGINT) AS n,
       ROUND({_dsum('o_totalprice')} / COUNT(o_totalprice), 6) AS mean_raw,
       ROUND(CAST(SUM(CASE WHEN rk > CAST(FLOOR(n / 10) AS BIGINT)
                            AND rk <= n - CAST(FLOOR(n / 10) AS BIGINT)
                           THEN CAST(ROUND(o_totalprice * 1000000) AS BIGINT)
                           ELSE 0 END) AS DOUBLE) / 1000000
             / SUM(CASE WHEN rk > CAST(FLOOR(n / 10) AS BIGINT)
                         AND rk <= n - CAST(FLOOR(n / 10) AS BIGINT)
                        THEN 1 ELSE 0 END), 6) AS mean_trimmed,
       ROUND(ROUND({_dsum('o_totalprice')} / COUNT(o_totalprice), 6)
             - ROUND(CAST(SUM(CASE WHEN rk > CAST(FLOOR(n / 10) AS BIGINT)
                                    AND rk <= n - CAST(FLOOR(n / 10) AS BIGINT)
                                   THEN CAST(ROUND(o_totalprice * 1000000) AS BIGINT)
                                   ELSE 0 END) AS DOUBLE) / 1000000
                   / SUM(CASE WHEN rk > CAST(FLOOR(n / 10) AS BIGINT)
                               AND rk <= n - CAST(FLOOR(n / 10) AS BIGINT)
                              THEN 1 ELSE 0 END), 6), 6) AS tail_pull
FROM ranked GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

ORACLES["q_business_days"] = """
WITH first_ship AS (
  SELECT l_orderkey, MIN(l_shipdate) AS ship FROM lineitem GROUP BY l_orderkey
), base AS (
  SELECT o_orderpriority,
         datediff('day', CAST(o_orderdate AS DATE), CAST(ship AS DATE)) AS days,
         isodow(CAST(o_orderdate AS DATE)) - 1 AS mon0
  FROM orders o JOIN first_ship f ON o.o_orderkey = f.l_orderkey
), combos AS (
  SELECT DISTINCT days % 7 AS r, mon0 FROM base
), offs AS (
  SELECT UNNEST(generate_series(0, 6)) AS i
), ext AS (
  SELECT r, mon0, COUNT(*) AS extra
  FROM combos CROSS JOIN offs
  WHERE i < r AND (mon0 + i) % 7 <= 4
  GROUP BY r, mon0
), bd AS (
  SELECT o_orderpriority,
         CAST(5 * FLOOR(days / 7) + COALESCE(extra, 0) AS BIGINT) AS bdays
  FROM (SELECT *, days % 7 AS r FROM base) b
  LEFT JOIN ext USING (r, mon0)
)
SELECT o_orderpriority, COUNT(*) AS n_orders,
       ROUND(CAST(SUM(bdays) AS DOUBLE) / COUNT(*), 6) AS mean_business_days,
       CAST(MAX(bdays) AS BIGINT) AS max_business_days
FROM bd GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


ORACLES["q_optimal_price"] = f"""
WITH daily AS (
  SELECT p.p_brand, strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS day,
         ROUND({_dsum('l_extendedprice / l_quantity / 1000.0')} / COUNT(*), 6) AS price,
         ROUND({_dsum('l_quantity')}, 6) AS qty
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand, strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')
), mom AS (
  SELECT p_brand, COUNT(*) AS n_days,
         {_dsum('price')} AS sp, {_dsum('qty')} AS sq,
         {_dsum('price * price')} AS spp, {_dsum('price * qty')} AS spq
  FROM daily GROUP BY p_brand
), fit AS (
  SELECT p_brand, CAST(n_days AS BIGINT) AS n_days,
         (spq - sp * sq / n_days) / (spp - sp * sp / n_days) AS s,
         sq / n_days - (spq - sp * sq / n_days) / (spp - sp * sp / n_days)
           * (sp / n_days) AS a,
         sp / n_days AS mean_price
  FROM mom
), rfit AS (
  SELECT p_brand, n_days,
         ROUND(s, 6) AS demand_slope,
         ROUND(a, 6) AS demand_intercept,
         ROUND(mean_price, 6) AS mean_price
  FROM fit
)
SELECT p_brand, n_days, demand_slope, demand_intercept, mean_price,
       ROUND(0.6 * mean_price, 6) AS unit_cost,
       CASE WHEN demand_slope < 0.0 THEN ROUND((demand_slope * (0.6 * mean_price)
            - demand_intercept) / (2.0 * demand_slope), 6) END AS optimal_price,
       CASE WHEN demand_slope < 0.0 THEN ROUND((demand_slope * (0.6 * mean_price)
            - demand_intercept) / (2.0 * demand_slope) - mean_price, 6) END AS price_gap
FROM rfit ORDER BY p_brand
"""

ORACLES["q_concurrency_profile"] = """
WITH s AS (
  SELECT user_id, ts, event_id, CAST(FLOOR(date_part('epoch', ts)) AS BIGINT) AS sec,
         COALESCE(CASE WHEN CAST(FLOOR(date_part('epoch', ts)) AS BIGINT)
                            - LAG(CAST(FLOOR(date_part('epoch', ts)) AS BIGINT))
                              OVER (PARTITION BY user_id ORDER BY ts, event_id)
                            > 1800
                       THEN 1 ELSE 0 END, 1) AS newsess
  FROM events
), sid AS (
  SELECT user_id, sec,
         SUM(newsess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM s
), sess AS (
  SELECT user_id, sid, MIN(sec) AS st, MAX(sec) + 1 AS en
  FROM sid GROUP BY user_id, sid
), bounds AS (
  SELECT st AS at, 1 AS d FROM sess
  UNION ALL
  SELECT en AS at, -1 AS d FROM sess
), run AS (
  SELECT SUM(d) OVER (ORDER BY at, d
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
  FROM bounds
), peak AS (
  SELECT CAST(MAX(conc) AS BIGINT) AS peak_concurrent FROM run
), stats AS (
  SELECT COUNT(*) AS n_sessions, CAST(SUM(en - st) AS BIGINT) AS busy,
         MIN(st) AS t0, MAX(en) AS t1
  FROM sess
)
SELECT n_sessions, peak_concurrent,
       ROUND(CAST(n_sessions AS DOUBLE) / CAST(t1 - t0 AS DOUBLE) * 3600.0, 6)
         AS arrivals_per_hour,
       ROUND(CAST(busy AS DOUBLE) / n_sessions, 6) AS mean_session_s,
       ROUND(CAST(busy AS DOUBLE) / CAST(t1 - t0 AS DOUBLE), 6) AS mean_concurrent,
       ROUND((CAST(busy AS DOUBLE) / CAST(t1 - t0 AS DOUBLE))
             / ((CAST(n_sessions AS DOUBLE) / CAST(t1 - t0 AS DOUBLE))
                * (CAST(busy AS DOUBLE) / n_sessions)), 6) AS littles_ratio
FROM stats CROSS JOIN peak
"""

ORACLES["q_forecast_combo"] = f"""
WITH daily AS (
  SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS day,
         ROUND({_dsum('l_extendedprice / 1000.0')}, 6) AS y
  FROM lineitem GROUP BY strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')
), base AS (
  SELECT day, y,
         LAG(y, 1) OVER (ORDER BY day) AS l1,
         LAG(y, 7) OVER (ORDER BY day) AS l7,
         ROUND(y - LAG(y, 1) OVER (ORDER BY day), 6) AS step,
         ROW_NUMBER() OVER (ORDER BY day) AS rn,
         COUNT(*) OVER () AS n
  FROM daily
), tstep AS (
  SELECT ROUND({_dsum('step')} / COUNT(step), 6) AS drift_step
  FROM base WHERE rn <= n - 28
), scored AS (
  SELECT rn, n, y, l1, l7, ROUND(l1 + drift_step, 6) AS fdrift
  FROM base CROSS JOIN tstep WHERE l7 IS NOT NULL
), wts AS (
  SELECT
    ROUND(CAST(SUM(CASE WHEN rn > n - 28 AND rn <= n - 14
                THEN CAST(ROUND(ABS(y - l1) * 1000000) AS BIGINT) ELSE 0 END) AS DOUBLE)
          / 1000000 / SUM(CASE WHEN rn > n - 28 AND rn <= n - 14 THEN 1 ELSE 0 END), 6) AS v1,
    ROUND(CAST(SUM(CASE WHEN rn > n - 28 AND rn <= n - 14
                THEN CAST(ROUND(ABS(y - l7) * 1000000) AS BIGINT) ELSE 0 END) AS DOUBLE)
          / 1000000 / SUM(CASE WHEN rn > n - 28 AND rn <= n - 14 THEN 1 ELSE 0 END), 6) AS v7,
    ROUND(CAST(SUM(CASE WHEN rn > n - 28 AND rn <= n - 14
                THEN CAST(ROUND(ABS(y - fdrift) * 1000000) AS BIGINT) ELSE 0 END) AS DOUBLE)
          / 1000000 / SUM(CASE WHEN rn > n - 28 AND rn <= n - 14 THEN 1 ELSE 0 END), 6) AS vd
  FROM scored
), combo AS (
  SELECT rn, n, y, l1, l7, fdrift, v1, v7, vd,
         ROUND((l1 / v1 + l7 / v7 + fdrift / vd)
               / (1.0 / v1 + 1.0 / v7 + 1.0 / vd), 6) AS fcombo
  FROM scored CROSS JOIN wts
), res AS (
  SELECT
    ROUND(CAST(SUM(CASE WHEN rn > n - 14 AND rn <= n - 0
                THEN CAST(ROUND(ABS(y - l1) * 1000000) AS BIGINT) ELSE 0 END) AS DOUBLE)
          / 1000000 / SUM(CASE WHEN rn > n - 14 AND rn <= n - 0 THEN 1 ELSE 0 END), 6) AS naive,
    ROUND(CAST(SUM(CASE WHEN rn > n - 14 AND rn <= n - 0
                THEN CAST(ROUND(ABS(y - l7) * 1000000) AS BIGINT) ELSE 0 END) AS DOUBLE)
          / 1000000 / SUM(CASE WHEN rn > n - 14 AND rn <= n - 0 THEN 1 ELSE 0 END), 6) AS weekly,
    ROUND(CAST(SUM(CASE WHEN rn > n - 14 AND rn <= n - 0
                THEN CAST(ROUND(ABS(y - fdrift) * 1000000) AS BIGINT) ELSE 0 END) AS DOUBLE)
          / 1000000 / SUM(CASE WHEN rn > n - 14 AND rn <= n - 0 THEN 1 ELSE 0 END), 6) AS drift,
    ROUND(CAST(SUM(CASE WHEN rn > n - 14 AND rn <= n - 0
                THEN CAST(ROUND(ABS(y - fcombo) * 1000000) AS BIGINT) ELSE 0 END) AS DOUBLE)
          / 1000000 / SUM(CASE WHEN rn > n - 14 AND rn <= n - 0 THEN 1 ELSE 0 END), 6) AS combo
  FROM combo
)
SELECT 'combo' AS model, combo AS test_mae FROM res
UNION ALL SELECT 'drift', drift FROM res
UNION ALL SELECT 'naive', naive FROM res
UNION ALL SELECT 'weekly', weekly FROM res
ORDER BY model
"""


ORACLES["q_permutation_test"] = f"""
WITH per_user AS (
  SELECT user_id, ROUND({_dsum('value')}, 6) AS spend
  FROM events GROUP BY user_id
), obs AS (
  SELECT ROUND(ABS(
           ROUND({_dsum('CASE WHEN user_id % 2 = 0 THEN spend END')}
                 / COUNT(CASE WHEN user_id % 2 = 0 THEN spend END), 6)
           - ROUND({_dsum('CASE WHEN user_id % 2 <> 0 THEN spend END')}
                   / COUNT(CASE WHEN user_id % 2 <> 0 THEN spend END), 6)), 6) AS obs_diff
  FROM per_user
), perms AS (
  SELECT CAST(UNNEST(generate_series(1, 200)) AS INTEGER) AS i
), fan AS (
  SELECT u.user_id, u.spend, p.i,
         CASE WHEN substring(md5(concat_ws(':', u.user_id, p.i)), 32, 1)
                   IN ('0', '2', '4', '6', '8', 'a', 'c', 'e')
              THEN 0 ELSE 1 END AS arm
  FROM per_user u CROSS JOIN perms p
), pd AS (
  SELECT i,
         ROUND(ABS(
           ROUND({_dsum('CASE WHEN arm = 1 THEN spend END')}
                 / COUNT(CASE WHEN arm = 1 THEN spend END), 6)
           - ROUND({_dsum('CASE WHEN arm = 0 THEN spend END')}
                   / COUNT(CASE WHEN arm = 0 THEN spend END), 6)), 6) AS pdiff
  FROM fan GROUP BY i
)
SELECT MAX(obs_diff) AS obs_diff,
       COUNT(*) AS n_perms,
       CAST(SUM(CASE WHEN pdiff >= obs_diff THEN 1 ELSE 0 END) AS BIGINT) AS n_ge,
       ROUND(CAST(SUM(CASE WHEN pdiff >= obs_diff THEN 1 ELSE 0 END) + 1 AS DOUBLE)
             / (COUNT(*) + 1), 6) AS p_value
FROM pd CROSS JOIN obs
"""

ORACLES["q_reach_curve"] = """
WITH uc AS (
  SELECT DISTINCT user_id, event_type FROM events
), solo AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS solo_reach FROM uc GROUP BY event_type
), ranked AS (
  SELECT event_type, solo_reach,
         ROW_NUMBER() OVER (ORDER BY solo_reach DESC, event_type ASC) AS rk
  FROM solo
), first_t AS (
  SELECT u.user_id, MIN(r.rk) AS first_rk
  FROM uc u JOIN ranked r ON u.event_type = r.event_type
  GROUP BY u.user_id
), inc AS (
  SELECT first_rk, COUNT(*) AS incremental_reach FROM first_t GROUP BY first_rk
), tot AS (
  SELECT COUNT(*) AS n_users FROM first_t
)
SELECT CAST(r.rk AS BIGINT) AS rk, r.event_type,
       CAST(r.solo_reach AS BIGINT) AS solo_reach,
       CAST(COALESCE(i.incremental_reach, 0) AS BIGINT) AS incremental_reach,
       CAST(SUM(COALESCE(i.incremental_reach, 0))
            OVER (ORDER BY r.rk ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cumulative_reach,
       ROUND(CAST(SUM(COALESCE(i.incremental_reach, 0))
                  OVER (ORDER BY r.rk ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DOUBLE) / t.n_users, 6) AS cumulative_share
FROM ranked r LEFT JOIN inc i ON r.rk = i.first_rk CROSS JOIN tot t
ORDER BY rk
"""

ORACLES["q_round_number_bias"] = """
WITH base AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) % 100 AS c FROM orders
), pats(pattern, cval) AS (
  VALUES ('c00', 0), ('c50', 50), ('c99', 99)
), g AS (
  SELECT pattern, COUNT(*) AS n,
         CAST(SUM(CASE WHEN c = cval THEN 1 ELSE 0 END) AS BIGINT) AS n_obs
  FROM base CROSS JOIN pats GROUP BY pattern
)
SELECT pattern, n_obs,
       ROUND(CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE), 6) AS obs_share,
       CAST(0.01 AS DOUBLE) AS expected_share,
       ROUND((CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE) - 0.01)
             / sqrt(0.01 * (1.0 - 0.01) / CAST(n AS DOUBLE)), 6) AS z_stat,
       CAST(CASE WHEN ABS((CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE) - 0.01)
                          / sqrt(0.01 * (1.0 - 0.01) / CAST(n AS DOUBLE))) > 3.0
                 THEN 1 ELSE 0 END AS INTEGER) AS flag
FROM g ORDER BY pattern
"""


ORACLES["q_burstiness"] = """
WITH td AS (
  SELECT term, doc_id, COUNT(*) AS c
  FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents)
  WHERE term <> '' GROUP BY term, doc_id
), per_term AS (
  SELECT term, COUNT(*) AS df,
         CAST(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS df2,
         CAST(SUM(c) AS BIGINT) AS tf_total
  FROM td GROUP BY term
)
SELECT term, CAST(df AS BIGINT) AS df, df2, tf_total,
       ROUND(CAST(df2 AS DOUBLE) / df, 6) AS burstiness
FROM per_term WHERE df >= 50
ORDER BY burstiness DESC, term ASC LIMIT 20
"""

ORACLES["q_entropy_rate"] = f"""
WITH toks AS (
  SELECT lang, doc_id, string_split(text, ' ') AS t FROM documents
), pairs AS (
  SELECT lang, t[k] AS w1, t[k + 1] AS w2
  FROM (SELECT lang, t, UNNEST(generate_series(1, len(t) - 1)) AS k FROM toks)
  WHERE t[k] <> '' AND t[k + 1] <> ''
), big AS (
  SELECT lang, w1, w2, COUNT(*) AS c12 FROM pairs GROUP BY lang, w1, w2
), uni AS (
  SELECT lang, w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM big GROUP BY lang, w1
), tot AS (
  SELECT lang, CAST(SUM(c12) AS BIGINT) AS n FROM big GROUP BY lang
)
SELECT b.lang, CAST(MAX(n) AS BIGINT) AS n_bigrams,
       ROUND({_dsum('-(CAST(c12 AS DOUBLE) / n) * log2(CAST(c12 AS DOUBLE) / c1)')}, 6)
         AS entropy_rate_bits
FROM big b
JOIN uni u ON b.lang = u.lang AND b.w1 = u.w1
JOIN tot t2 ON b.lang = t2.lang
GROUP BY b.lang ORDER BY b.lang
"""


ORACLES["q_growth_accounting"] = """
WITH a AS (
  SELECT DISTINCT user_id,
         strftime(date_trunc('week', ts), '%Y-%m-%d') AS w
  FROM events
), first_w AS (
  SELECT user_id, MIN(w) AS first_w FROM a GROUP BY user_id
), prv AS (
  SELECT user_id,
         strftime(CAST(w AS DATE) + INTERVAL 7 DAY, '%Y-%m-%d') AS w,
         1 AS was
  FROM a
), cur AS (
  SELECT user_id, w, 1 AS iscur FROM a
), j AS (
  SELECT COALESCE(c.user_id, p.user_id) AS user_id,
         COALESCE(c.w, p.w) AS w,
         c.iscur, p.was
  FROM cur c FULL JOIN prv p ON c.user_id = p.user_id AND c.w = p.w
), cls AS (
  SELECT j.w,
         CASE WHEN j.iscur IS NULL THEN 'churned'
              WHEN j.w = f.first_w THEN 'new'
              WHEN j.was IS NOT NULL THEN 'retained'
              ELSE 'resurrected' END AS cls
  FROM j JOIN first_w f ON j.user_id = f.user_id
), weeks AS (
  SELECT DISTINCT w FROM a
)
SELECT c.w,
       CAST(SUM(CASE WHEN cls = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       CAST(SUM(CASE WHEN cls = 'retained' THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
       CAST(SUM(CASE WHEN cls = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected,
       CAST(SUM(CASE WHEN cls = 'churned' THEN 1 ELSE 0 END) AS BIGINT) AS n_churned,
       CASE WHEN SUM(CASE WHEN cls = 'churned' THEN 1 ELSE 0 END) > 0
            THEN ROUND(CAST(SUM(CASE WHEN cls = 'new' THEN 1 ELSE 0 END)
                            + SUM(CASE WHEN cls = 'resurrected' THEN 1 ELSE 0 END) AS DOUBLE)
                       / SUM(CASE WHEN cls = 'churned' THEN 1 ELSE 0 END), 6) END
         AS quick_ratio
FROM cls c JOIN weeks ON c.w = weeks.w
GROUP BY c.w ORDER BY c.w
"""

ORACLES["q_gumbel_maxima"] = f"""
WITH daily AS (
  SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS day,
         ROUND({_dsum('l_extendedprice / 1000.0')}, 6) AS y
  FROM lineitem GROUP BY strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')
), weekly AS (
  SELECT strftime(date_trunc('week', CAST(day AS DATE)), '%Y-%m-%d') AS w,
         MAX(y) AS m
  FROM daily GROUP BY strftime(date_trunc('week', CAST(day AS DATE)), '%Y-%m-%d')
), mom AS (
  SELECT COUNT(*) AS n_weeks, {_dsum('m')} AS s, {_dsum('m * m')} AS ss,
         MAX(m) AS max_observed
  FROM weekly
), fit AS (
  SELECT CAST(n_weeks AS BIGINT) AS n_weeks, max_observed,
         s / n_weeks AS mean_m,
         sqrt(ss / n_weeks - (s / n_weeks) * (s / n_weeks)) AS sd_m
  FROM mom
), anchored AS (
  SELECT n_weeks, max_observed,
         ROUND(sd_m * sqrt(6.0) / 3.141592653589793, 6) AS scale_beta,
         ROUND(mean_m - 0.5772156649015329 * (sd_m * sqrt(6.0) / 3.141592653589793), 6)
           AS loc_mu
  FROM fit
)
SELECT n_weeks, max_observed, loc_mu, scale_beta,
       ROUND(loc_mu - scale_beta * ln(-ln(1.0 - 1.0 / 52.0)), 6) AS return_level_52w
FROM anchored
"""


ORACLES["q_fixed_effects"] = f"""
WITH panel AS (
  SELECT l_suppkey AS ent, strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS t,
         ROUND({_dsum('l_extendedprice / l_quantity / 1000.0')} / COUNT(*), 6) AS y,
         ROUND({_dsum('l_quantity / 100.0')}, 6) AS x
  FROM lineitem WHERE l_suppkey <= 30
  GROUP BY l_suppkey, strftime(CAST(l_shipdate AS DATE), '%Y-%m')
), ent_m AS (
  SELECT ent, ROUND({_dsum('y')} / COUNT(y), 6) AS ye,
         ROUND({_dsum('x')} / COUNT(x), 6) AS xe
  FROM panel GROUP BY ent
), t_m AS (
  SELECT t, ROUND({_dsum('y')} / COUNT(y), 6) AS yt,
         ROUND({_dsum('x')} / COUNT(x), 6) AS xt
  FROM panel GROUP BY t
), g_m AS (
  SELECT ROUND({_dsum('y')} / COUNT(y), 6) AS yg,
         ROUND({_dsum('x')} / COUNT(x), 6) AS xg
  FROM panel
), d AS (
  SELECT ROUND(p.y - e.ye - tm.yt + g.yg, 6) AS yd,
         ROUND(p.x - e.xe - tm.xt + g.xg, 6) AS xd,
         p.ent, p.t
  FROM panel p
  JOIN ent_m e ON p.ent = e.ent
  JOIN t_m tm ON p.t = tm.t
  CROSS JOIN g_m g
), mom AS (
  SELECT COUNT(*) AS n_obs,
         COUNT(DISTINCT ent) AS n_entities,
         COUNT(DISTINCT t) AS n_periods,
         {_dsum('xd * yd')} AS sxy, {_dsum('xd * xd')} AS sxx,
         {_dsum('yd * yd')} AS syy
  FROM d
)
SELECT CAST(n_obs AS BIGINT) AS n_obs,
       CAST(n_entities AS BIGINT) AS n_entities,
       CAST(n_periods AS BIGINT) AS n_periods,
       ROUND(sxy / sxx, 6) AS beta_within,
       ROUND(sxy * sxy / (sxx * syy), 6) AS r2_within
FROM mom
"""

ORACLES["q_sourcing_risk"] = f"""
WITH per_part AS (
  SELECT l_partkey, COUNT(DISTINCT l_suppkey) AS ns,
         {_dsum('l_extendedprice / 1000.0')} AS spend
  FROM lineitem GROUP BY l_partkey
), tot AS (
  SELECT ROUND(CAST(SUM(CAST(ROUND(spend * 1000000) AS BIGINT)) AS DOUBLE) / 1000000, 6) AS t
  FROM per_part
), g AS (
  SELECT CASE WHEN ns = 1 THEN '1_single'
              WHEN ns = 2 THEN '2_dual'
              ELSE '3_plus' END AS sourcing,
         COUNT(*) AS n_parts,
         ROUND(CAST(SUM(CAST(ROUND(spend * 1000000) AS BIGINT)) AS DOUBLE) / 1000000, 6)
           AS spend_k
  FROM per_part GROUP BY 1
)
SELECT sourcing, CAST(n_parts AS BIGINT) AS n_parts, spend_k,
       ROUND(spend_k / t, 6) AS spend_share
FROM g CROSS JOIN tot ORDER BY sourcing
"""


ORACLES["q_wilcoxon"] = f"""
WITH per AS (
  SELECT user_id,
         ROUND({_dsum("CASE WHEN ts < TIMESTAMP '2024-01-16' THEN value ELSE 0.0 END")}, 6) AS pre,
         ROUND({_dsum("CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN value ELSE 0.0 END")}, 6) AS post
  FROM events GROUP BY user_id
), d AS (
  SELECT ROUND(post - pre, 6) AS d FROM per WHERE ROUND(post - pre, 6) <> 0.0
), ranked AS (
  SELECT d,
         CAST(2 * RANK() OVER (ORDER BY ABS(d))
              + COUNT(*) OVER (PARTITION BY ABS(d)) - 1 AS BIGINT) AS r2
  FROM d
), agg AS (
  SELECT COUNT(*) AS n_pairs,
         CAST(SUM(CASE WHEN d > 0 THEN r2 ELSE 0 END) AS BIGINT) AS w2
  FROM ranked
)
SELECT CAST(n_pairs AS BIGINT) AS n_pairs,
       ROUND(CAST(w2 AS DOUBLE) / 2.0, 6) AS w_plus,
       ROUND((CAST(w2 AS DOUBLE) / 2.0 - CAST(n_pairs AS DOUBLE) * (n_pairs + 1) / 4.0)
             / sqrt(CAST(n_pairs AS DOUBLE) * (n_pairs + 1) * (2 * n_pairs + 1) / 24.0), 6)
         AS z_stat,
       CAST(CASE WHEN ABS((CAST(w2 AS DOUBLE) / 2.0
                           - CAST(n_pairs AS DOUBLE) * (n_pairs + 1) / 4.0)
                 / sqrt(CAST(n_pairs AS DOUBLE) * (n_pairs + 1) * (2 * n_pairs + 1) / 24.0))
                 > 1.96 THEN 1 ELSE 0 END AS INTEGER) AS significant
FROM agg
"""

ORACLES["q_friedman"] = f"""
WITH cell AS (
  SELECT user_id, event_type, ROUND({_dsum('value')}, 6) AS v
  FROM events GROUP BY user_id, event_type
), full_b AS (
  SELECT user_id FROM cell GROUP BY user_id HAVING COUNT(*) = 5
), c AS (
  SELECT cell.* FROM cell JOIN full_b USING (user_id)
), ranked AS (
  SELECT user_id, event_type,
         CAST(2 * RANK() OVER (PARTITION BY user_id ORDER BY v, event_type)
              + COUNT(*) OVER (PARTITION BY user_id, v) - 1 AS BIGINT) AS r2
  FROM c
), rj AS (
  SELECT event_type, CAST(SUM(r2) AS BIGINT) AS rs2, COUNT(*) AS n FROM ranked
  GROUP BY event_type
), srj AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n_blocks,
         {_dsum('CAST(rs2 AS DOUBLE) * rs2 / 4.0 / 1000.0')} AS sr_k
  FROM rj
)
SELECT n_blocks, CAST(5 AS BIGINT) AS k,
       ROUND(12.0 * (sr_k * 1000.0) / (n_blocks * 5 * (5 + 1))
             - 3.0 * n_blocks * (5 + 1), 6) AS chi2_f,
       CAST(CASE WHEN 12.0 * (sr_k * 1000.0) / (n_blocks * 5 * (5 + 1))
                      - 3.0 * n_blocks * (5 + 1) > 9.488
                 THEN 1 ELSE 0 END AS INTEGER) AS flag_reject
FROM srj
"""

ORACLES["q_icc"] = f"""
WITH g AS (
  SELECT o_orderpriority AS grp, COUNT(*) AS ng,
         {_dsum('o_totalprice / 1000.0')} AS sg,
         {_dsum('(o_totalprice / 1000.0) * (o_totalprice / 1000.0)')} AS ssg
  FROM orders GROUP BY o_orderpriority
), tot AS (
  SELECT SUM(ng) AS n,
         ROUND(CAST(SUM(CAST(ROUND(sg * 1000000) AS BIGINT)) AS DOUBLE) / 1000000, 6) AS s,
         COUNT(*) AS k
  FROM g
), terms AS (
  SELECT CAST(ng AS DOUBLE)
           * (sg / CAST(ng AS DOUBLE) - s / CAST(n AS DOUBLE))
           * (sg / CAST(ng AS DOUBLE) - s / CAST(n AS DOUBLE)) AS bt,
         ssg - sg * sg / CAST(ng AS DOUBLE) AS wt,
         n, k
  FROM g CROSS JOIN tot
), red AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n, CAST(MAX(k) AS BIGINT) AS k,
         {_dsum('bt')} AS ssb, {_dsum('wt')} AS ssw
  FROM terms
), sizes AS (
  SELECT SUM(ng) AS bn, SUM(ng * ng) AS sn2, COUNT(*) AS bk FROM g
), j AS (
  SELECT n, k,
         ssb / (k - 1) AS msb,
         ssw / (n - k) AS msw,
         (CAST(bn AS DOUBLE) - CAST(sn2 AS DOUBLE) / bn) / (CAST(bk AS DOUBLE) - 1.0)
           AS n0
  FROM red CROSS JOIN sizes
)
SELECT n, k,
       ROUND(msb, 6) AS msb,
       ROUND(msw, 6) AS msw,
       ROUND(n0, 6) AS n0,
       ROUND((msb - msw) / (msb + (n0 - 1.0) * msw), 6) AS icc1
FROM j
"""


ORACLES["q_raking"] = """
WITH pop_n AS (
  SELECT c_nationkey AS nk, COUNT(*) AS pn FROM customer GROUP BY c_nationkey
), pop_s AS (
  SELECT c_mktsegment AS sg, COUNT(*) AS ps FROM customer GROUP BY c_mktsegment
), c0 AS (
  SELECT c_nationkey AS nk, c_mktsegment AS sg, COUNT(*) AS sc, 1.0 AS w
  FROM customer WHERE c_custkey % 3 = 0 GROUP BY c_nationkey, c_mktsegment
), m1 AS (
  SELECT nk, CAST(SUM(CAST(ROUND(sc * w * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS m
  FROM c0 GROUP BY nk
), c1 AS (
  SELECT c0.nk, c0.sg, c0.sc, ROUND(c0.w * (pn / m), 6) AS w
  FROM c0 JOIN m1 ON c0.nk = m1.nk JOIN pop_n p ON c0.nk = p.nk
), m2 AS (
  SELECT sg, CAST(SUM(CAST(ROUND(sc * w * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS m
  FROM c1 GROUP BY sg
), c2 AS (
  SELECT c1.nk, c1.sg, c1.sc, ROUND(c1.w * (ps / m), 6) AS w
  FROM c1 JOIN m2 ON c1.sg = m2.sg JOIN pop_s p ON c1.sg = p.sg
), m3 AS (
  SELECT nk, CAST(SUM(CAST(ROUND(sc * w * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS m
  FROM c2 GROUP BY nk
), c3 AS (
  SELECT c2.nk, c2.sg, c2.sc, ROUND(c2.w * (pn / m), 6) AS w
  FROM c2 JOIN m3 ON c2.nk = m3.nk JOIN pop_n p ON c2.nk = p.nk
), m4 AS (
  SELECT sg, CAST(SUM(CAST(ROUND(sc * w * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS m
  FROM c3 GROUP BY sg
), c4 AS (
  SELECT c3.nk, c3.sg, c3.sc, ROUND(c3.w * (ps / m), 6) AS w
  FROM c3 JOIN m4 ON c3.sg = m4.sg JOIN pop_s p ON c3.sg = p.sg
), seg_fit AS (
  SELECT sg, CAST(SUM(CAST(ROUND(sc * w * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS rw
  FROM c4 GROUP BY sg
), nat_err AS (
  SELECT ROUND(MAX(ABS(rw - pn) / pn), 6) AS max_nation_rel_err
  FROM (
    SELECT n.nk,
           CAST(SUM(CAST(ROUND(sc * w * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS rw,
           MAX(pn) AS pn
    FROM c4 JOIN pop_n n ON c4.nk = n.nk GROUP BY n.nk
  )
)
SELECT s.sg AS segment, CAST(p.ps AS BIGINT) AS pop_n,
       ROUND(s.rw, 6) AS raked_weight,
       ROUND(ABS(s.rw - p.ps) / p.ps, 6) AS segment_rel_err,
       max_nation_rel_err
FROM seg_fit s JOIN pop_s p ON s.sg = p.sg CROSS JOIN nat_err
ORDER BY segment
"""

ORACLES["q_hotelling"] = f"""
WITH per AS (
  SELECT user_id,
         ROUND({_dsum("CASE WHEN ts < TIMESTAMP '2024-01-16' THEN value ELSE 0.0 END")}, 6) AS x,
         ROUND({_dsum("CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN value ELSE 0.0 END")}, 6) AS y,
         CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS g
  FROM events GROUP BY user_id
), mom AS (
  SELECT g, COUNT(*) AS n,
         {_dsum('x')} AS sx, {_dsum('y')} AS sy,
         {_dsum('x * x')} AS sxx, {_dsum('x * y')} AS sxy, {_dsum('y * y')} AS syy
  FROM per GROUP BY g
), j AS (
  SELECT a.n AS n1, a.sx AS sx1, a.sy AS sy1, a.sxx AS sxx1, a.sxy AS sxy1, a.syy AS syy1,
         b.n AS n0, b.sx AS sx0, b.sy AS sy0, b.sxx AS sxx0, b.sxy AS sxy0, b.syy AS syy0
  FROM mom a CROSS JOIN mom b
  WHERE a.g = 1 AND b.g = 0
), c AS (
  SELECT CAST(n1 AS BIGINT) AS n_treat, CAST(n0 AS BIGINT) AS n_control,
         sx1 / n1 - sx0 / n0 AS dx,
         sy1 / n1 - sy0 / n0 AS dy,
         ((sxx1 - sx1 * sx1 / n1) + (sxx0 - sx0 * sx0 / n0)) / (n1 + n0 - 2) AS cxx,
         ((sxy1 - sx1 * sy1 / n1) + (sxy0 - sx0 * sy0 / n0)) / (n1 + n0 - 2) AS cxy,
         ((syy1 - sy1 * sy1 / n1) + (syy0 - sy0 * sy0 / n0)) / (n1 + n0 - 2) AS cyy
  FROM j
), t AS (
  SELECT n_treat, n_control,
         ROUND(dx, 6) AS diff_pre, ROUND(dy, 6) AS diff_post,
         CAST(n_treat AS DOUBLE) * n_control / (n_treat + n_control)
           * (dx * (cyy * dx - cxy * dy) + dy * (cxx * dy - cxy * dx))
           / (cxx * cyy - cxy * cxy) AS t2_raw
  FROM c
)
SELECT n_treat, n_control, diff_pre, diff_post,
       ROUND(t2_raw, 6) AS t2,
       CAST(CASE WHEN t2_raw > 5.991 THEN 1 ELSE 0 END AS INTEGER) AS flag_reject
FROM t
"""


ORACLES["q_disparate_impact"] = """
WITH rates AS (
  SELECT c.c_nationkey AS nation, COUNT(*) AS n_lines,
         CAST(SUM(CASE WHEN l.l_discount >= 0.08 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_favorable,
         ROUND(CAST(SUM(CASE WHEN l.l_discount >= 0.08 THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*), 6) AS rate
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_nationkey
), ref AS (
  SELECT rate AS ref_rate, nation AS ref_nation
  FROM rates ORDER BY rate DESC, nation ASC LIMIT 1
)
SELECT nation, CAST(n_lines AS BIGINT) AS n_lines, n_favorable, rate, ref_nation,
       ROUND(rate / ref_rate, 6) AS impact_ratio,
       CAST(CASE WHEN rate / ref_rate < 0.8 THEN 1 ELSE 0 END AS INTEGER)
         AS flag_disparate
FROM rates CROSS JOIN ref ORDER BY nation
"""

ORACLES["q_empirical_bayes"] = f"""
WITH g AS (
  SELECT p.p_brand, COUNT(*) AS ng,
         {_dsum('l_extendedprice / 1000.0')} AS sg,
         {_dsum('(l_extendedprice / 1000.0) * (l_extendedprice / 1000.0)')} AS ssg
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand
), tot AS (
  SELECT SUM(ng) AS n,
         CAST(SUM(CAST(ROUND(sg * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS s,
         COUNT(*) AS k,
         SUM(ng * ng) AS sn2
  FROM g
), within AS (
  SELECT {_dsum('ssg - sg * sg / CAST(ng AS DOUBLE)')} AS ssw FROM g
), between_ AS (
  SELECT {_dsum('CAST(ng AS DOUBLE) * (sg / ng - s / n) * (sg / ng - s / n)')} AS ssb
  FROM g CROSS JOIN tot
), comp AS (
  SELECT ROUND(s / n, 6) AS grand_mean,
         ROUND(ssw / (n - k), 6) AS s2_within,
         ROUND(CASE WHEN (ssb / (k - 1) - ssw / (n - k))
                         / ((n - CAST(sn2 AS DOUBLE) / n) / (k - 1)) > 0.0
                    THEN (ssb / (k - 1) - ssw / (n - k))
                         / ((n - CAST(sn2 AS DOUBLE) / n) / (k - 1))
                    ELSE 0.0 END, 6) AS tau2
  FROM tot CROSS JOIN within CROSS JOIN between_
), out_ AS (
  SELECT p_brand, CAST(ng AS BIGINT) AS n_lines,
         ROUND(sg / ng, 6) AS raw_mean,
         grand_mean,
         ROUND((s2_within / ng) / (tau2 + s2_within / ng), 6) AS shrink_b
  FROM g CROSS JOIN comp
)
SELECT p_brand, n_lines, raw_mean, grand_mean, shrink_b,
       ROUND(grand_mean + (1.0 - shrink_b) * (raw_mean - grand_mean), 6) AS eb_mean
FROM out_ ORDER BY p_brand
"""


ORACLES["q_tail_dependence"] = f"""
WITH daily AS (
  SELECT l_suppkey, strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS day,
         ROUND({_dsum('l_extendedprice / 1000.0')} / COUNT(*), 6) AS px
  FROM lineitem WHERE l_suppkey IN (1, 2)
  GROUP BY l_suppkey, strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')
), pairs AS (
  SELECT a.day, a.px AS x, b.px AS y
  FROM daily a JOIN daily b ON a.day = b.day
  WHERE a.l_suppkey = 1 AND b.l_suppkey = 2
), th AS (
  SELECT ROUND(quantile_cont(x, 0.9), 6) AS tx_hi,
         ROUND(quantile_cont(y, 0.9), 6) AS ty_hi,
         ROUND(quantile_cont(x, 0.1), 6) AS tx_lo,
         ROUND(quantile_cont(y, 0.1), 6) AS ty_lo
  FROM pairs
), g AS (
  SELECT COUNT(*) AS n_days,
         CAST(SUM(CASE WHEN x >= tx_hi THEN 1 ELSE 0 END) AS BIGINT) AS nx_hi,
         CAST(SUM(CASE WHEN x >= tx_hi AND y >= ty_hi THEN 1 ELSE 0 END) AS BIGINT) AS nj_hi,
         CAST(SUM(CASE WHEN x <= tx_lo THEN 1 ELSE 0 END) AS BIGINT) AS nx_lo,
         CAST(SUM(CASE WHEN x <= tx_lo AND y <= ty_lo THEN 1 ELSE 0 END) AS BIGINT) AS nj_lo
  FROM pairs CROSS JOIN th
)
SELECT CAST(n_days AS BIGINT) AS n_days,
       nx_hi AS n_upper_x, nj_hi AS n_joint_upper,
       ROUND(CAST(nj_hi AS DOUBLE) / nx_hi, 6) AS lambda_upper,
       ROUND(CAST(nj_lo AS DOUBLE) / nx_lo, 6) AS lambda_lower,
       CAST(0.1 AS DOUBLE) AS independence_baseline
FROM g
"""

ORACLES["q_nested_anova"] = f"""
WITH j AS (
  SELECT n.n_regionkey AS rg, c.c_nationkey AS nt, o.o_totalprice / 1000.0 AS val
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
), nat AS (
  SELECT rg, nt, COUNT(*) AS nn,
         {_dsum('val')} AS sn, {_dsum('val * val')} AS ssn
  FROM j GROUP BY rg, nt
), reg AS (
  SELECT rg, SUM(nn) AS nr,
         CAST(SUM(CAST(ROUND(sn * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS sr,
         COUNT(*) AS kn_r
  FROM nat GROUP BY rg
), tot AS (
  SELECT SUM(nr) AS n,
         CAST(SUM(CAST(ROUND(sr * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS s,
         COUNT(*) AS kr, SUM(kn_r) AS kn
  FROM reg
), ss_r AS (
  SELECT {_dsum('CAST(nr AS DOUBLE) * (sr / nr - s / n) * (sr / nr - s / n)')} AS ss_region
  FROM reg CROSS JOIN tot
), ss_n AS (
  SELECT {_dsum('CAST(nn AS DOUBLE) * (sn / nn - sr / nr) * (sn / nn - sr / nr)')} AS ss_nation
  FROM nat JOIN reg ON nat.rg = reg.rg
), sq AS (
  SELECT CAST(SUM(CAST(ROUND(ssn * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS ssq
  FROM nat
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(kr AS BIGINT) AS k_regions,
       CAST(kn AS BIGINT) AS k_nations,
       ROUND(ss_region, 6) AS ss_region,
       ROUND(ss_nation, 6) AS ss_nation,
       ROUND(ssq - s * s / n - ss_region - ss_nation, 6) AS ss_within,
       ROUND((ss_region / (kr - 1)) / (ss_nation / (kn - kr)), 6) AS f_region,
       ROUND((ss_nation / (kn - kr))
             / ((ssq - s * s / n - ss_region - ss_nation) / (n - kn)), 6) AS f_nation
FROM tot CROSS JOIN ss_r CROSS JOIN ss_n CROSS JOIN sq
"""


import math as _math

_LLR_YES = round(_math.log(0.95 / 0.85) * 1e9)
_LLR_NO = round(_math.log(0.05 / 0.15) * 1e9)
_LLR_BOUND = round(_math.log(19.0) * 1e9)

ORACLES["q_sprt"] = f"""
WITH per AS (
  SELECT user_id, MIN(ts) AS first_ts,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
), walk AS (
  SELECT user_id, conv,
         ROW_NUMBER() OVER (ORDER BY first_ts, user_id) AS rn,
         SUM(CASE WHEN conv = 1 THEN CAST({_LLR_YES} AS BIGINT)
                  ELSE CAST({_LLR_NO} AS BIGINT) END)
           OVER (ORDER BY first_ts, user_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS llr9
  FROM per
), firstx AS (
  SELECT rn AS crossed_at,
         ROUND(CAST(llr9 AS DOUBLE) / 1e9, 6) AS llr_at_cross,
         CASE WHEN llr9 >= {_LLR_BOUND} THEN 'accept_h1' ELSE 'accept_h0' END AS decision
  FROM walk
  WHERE llr9 >= {_LLR_BOUND} OR llr9 <= -{_LLR_BOUND}
  ORDER BY rn LIMIT 1
), tot AS (
  SELECT COUNT(*) AS n_users,
         ROUND(CAST(MAX(llr9) AS DOUBLE) / 1e9, 6) AS max_llr,
         ROUND(CAST(MIN(llr9) AS DOUBLE) / 1e9, 6) AS min_llr
  FROM walk
)
SELECT CAST(n_users AS BIGINT) AS n_users, max_llr, min_llr,
       CAST(crossed_at AS BIGINT) AS crossed_at,
       llr_at_cross,
       COALESCE(decision, 'continue') AS decision
FROM tot LEFT JOIN firstx ON TRUE
"""

ORACLES["q_oaxaca"] = f"""
WITH per AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS any_p,
         ROUND({_dsum("CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END")}, 6)
           AS pspend,
         CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS g
  FROM events GROUP BY user_id
), mom AS (
  SELECT g, COUNT(*) AS n, CAST(SUM(any_p) AS BIGINT) AS np,
         {_dsum('CASE WHEN any_p = 1 THEN pspend END')} AS sp
  FROM per GROUP BY g
), j AS (
  SELECT a.n AS n1, a.np AS np1, a.sp AS sp1,
         b.n AS n0, b.np AS np0, b.sp AS sp0
  FROM mom a CROSS JOIN mom b WHERE a.g = 1 AND b.g = 0
), c AS (
  SELECT CAST(n1 AS BIGINT) AS n_treat, CAST(n0 AS BIGINT) AS n_control,
         CAST(np1 AS DOUBLE) / n1 AS p1, CAST(np0 AS DOUBLE) / n0 AS p0,
         sp1 / np1 AS s1, sp0 / np0 AS s0
  FROM j
)
SELECT n_treat, n_control,
       ROUND(p1 - p0, 6) AS participation_gap,
       ROUND(s1 - s0, 6) AS severity_gap,
       ROUND(p1 * s1 - p0 * s0, 6) AS total_gap,
       ROUND((p1 - p0) * ((s1 + s0) / 2.0), 6) AS gap_from_participation,
       ROUND(((p1 + p0) / 2.0) * (s1 - s0), 6) AS gap_from_severity
FROM c
"""


ORACLES["q_weibull_fit"] = f"""
WITH per_user AS (
  SELECT user_id, MIN(ts) AS first_ts,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS fp
  FROM events GROUP BY user_id
), dur AS (
  SELECT CAST(FLOOR(date_part('epoch', fp)) AS BIGINT)
           - CAST(FLOOR(date_part('epoch', first_ts)) AS BIGINT) AS t_s,
         user_id
  FROM per_user WHERE fp IS NOT NULL
), pos AS (
  SELECT t_s, ROW_NUMBER() OVER (ORDER BY t_s, user_id) AS i,
         COUNT(*) OVER () AS n
  FROM dur WHERE t_s > 0
), xy AS (
  SELECT ln(CAST(t_s AS DOUBLE)) AS x,
         ln(-ln(1.0 - (i - 0.3) / (n + 0.4))) AS y,
         n
  FROM pos
), mom AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n_events,
         {_dsum('x')} AS sx, {_dsum('y')} AS sy,
         {_dsum('x * x')} AS sxx, {_dsum('x * y')} AS sxy
  FROM xy
), fit AS (
  SELECT n_events,
         (sxy - sx * sy / n_events) / (sxx - sx * sx / n_events) AS k_raw,
         sy / n_events - (sxy - sx * sy / n_events) / (sxx - sx * sx / n_events)
           * (sx / n_events) AS b_raw
  FROM mom
)
SELECT n_events,
       ROUND(k_raw, 6) AS shape_k,
       ROUND(exp(-b_raw / k_raw), 6) AS scale_lambda_s,
       CAST(CASE WHEN k_raw < 1.0 THEN 1 ELSE 0 END AS INTEGER) AS decreasing_hazard
FROM fit
"""

ORACLES["q_nbinom_fit"] = """
WITH per AS (
  SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id
), mom AS (
  SELECT COUNT(*) AS n_users, CAST(SUM(c) AS BIGINT) AS s,
         CAST(SUM(c * c) AS BIGINT) AS ss
  FROM per
), fit AS (
  SELECT CAST(n_users AS BIGINT) AS n_users,
         CAST(s AS DOUBLE) / n_users AS m,
         CAST(ss AS DOUBLE) / n_users - (CAST(s AS DOUBLE) / n_users)
           * (CAST(s AS DOUBLE) / n_users) AS v
  FROM mom
)
SELECT n_users,
       ROUND(m, 6) AS mean_count,
       ROUND(v, 6) AS var_count,
       ROUND(v / m, 6) AS fano,
       CASE WHEN v > m THEN ROUND(m / v, 6) END AS p_hat,
       CASE WHEN v > m THEN ROUND(m * m / (v - m), 6) END AS r_hat
FROM fit
"""


ORACLES["q_capture_recapture"] = """
WITH per AS (
  SELECT user_id,
         MAX(CASE WHEN ts < TIMESTAMP '2024-01-08' THEN 1 ELSE 0 END) AS in1,
         MAX(CASE WHEN ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'
                  THEN 1 ELSE 0 END) AS in2
  FROM events GROUP BY user_id
), g AS (
  SELECT CAST(SUM(in1) AS BIGINT) AS n1,
         CAST(SUM(in2) AS BIGINT) AS n2,
         CAST(SUM(CASE WHEN in1 + in2 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS m,
         COUNT(*) AS n_observed_total
  FROM per
)
SELECT n1, n2, m, CAST(n_observed_total AS BIGINT) AS n_observed_total,
       ROUND(CAST(n1 + 1 AS DOUBLE) * (n2 + 1) / (m + 1) - 1.0, 6) AS n_hat_chapman,
       ROUND(CAST(n1 + 1 AS DOUBLE) * (n2 + 1) / (m + 1) - 1.0 - n_observed_total, 6)
         AS est_unseen
FROM g
"""

ORACLES["q_german_tank"] = """
WITH samp AS (
  SELECT COUNT(*) AS k, CAST(MAX(o_orderkey) AS BIGINT) AS max_seen
  FROM orders WHERE o_orderkey % 50 = 7
), truth AS (
  SELECT CAST(MAX(o_orderkey) AS BIGINT) AS true_max FROM orders
)
SELECT CAST(k AS BIGINT) AS k, max_seen, true_max,
       ROUND(CAST(max_seen AS DOUBLE) * (1.0 + 1.0 / k) - 1.0, 6) AS n_hat,
       ROUND(ABS(CAST(max_seen AS DOUBLE) * (1.0 + 1.0 / k) - 1.0 - true_max)
             / true_max, 6) AS rel_err
FROM samp CROSS JOIN truth
"""

ORACLES["q_missing_mass"] = """
WITH tf AS (
  SELECT lang, term, COUNT(*) AS c
  FROM (SELECT lang, UNNEST(string_split(text, ' ')) AS term FROM documents)
  WHERE term <> '' GROUP BY lang, term
), g AS (
  SELECT lang, COUNT(*) AS vocab,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_singletons,
         CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_doubletons
  FROM tf GROUP BY lang
)
SELECT lang, CAST(vocab AS BIGINT) AS vocab, n_tokens, n_singletons,
       ROUND(CAST(n_singletons AS DOUBLE) / n_tokens, 6) AS missing_mass_p0,
       CASE WHEN n_doubletons > 0
            THEN ROUND(CAST(n_singletons AS DOUBLE) * n_singletons
                       / (2.0 * n_doubletons), 6) END AS chao1_unseen_vocab
FROM g ORDER BY lang
"""


ORACLES["q_kendall_w"] = f"""
WITH g AS (
  SELECT p.p_brand,
         {_dsum('l_extendedprice')} AS rev,
         {_dsum('l_quantity')} AS qty,
         COUNT(DISTINCT l_orderkey) AS n_ord
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand
), ranked AS (
  SELECT p_brand,
         ROW_NUMBER() OVER (ORDER BY rev DESC, p_brand ASC) AS r1,
         ROW_NUMBER() OVER (ORDER BY qty DESC, p_brand ASC) AS r2,
         ROW_NUMBER() OVER (ORDER BY n_ord DESC, p_brand ASC) AS r3
  FROM g
), sums AS (
  SELECT p_brand, CAST(r1 + r2 + r3 AS BIGINT) AS rs FROM ranked
), agg AS (
  SELECT COUNT(*) AS n, CAST(SUM(rs) AS BIGINT) AS srs,
         CAST(SUM(rs * rs) AS BIGINT) AS srs2
  FROM sums
), dev AS (
  SELECT CAST(n AS BIGINT) AS n_items, CAST(3 AS BIGINT) AS k_rankings,
         CAST(srs2 AS DOUBLE) - CAST(srs AS DOUBLE) * srs / n AS s_dev,
         n
  FROM agg
)
SELECT n_items, k_rankings,
       ROUND(12.0 * s_dev / (3 * 3 * n_items
             * (CAST(n_items AS DOUBLE) * n_items - 1)), 6) AS kendall_w
FROM dev
"""

ORACLES["q_chi2_residuals"] = """
WITH cells AS (
  SELECT o_orderpriority AS x, o_orderstatus AS y, COUNT(*) AS nxy
  FROM orders GROUP BY 1, 2
), xt AS (
  SELECT x, CAST(SUM(nxy) AS BIGINT) AS nx FROM cells GROUP BY x
), yt AS (
  SELECT y, CAST(SUM(nxy) AS BIGINT) AS ny FROM cells GROUP BY y
), nn AS (
  SELECT CAST(SUM(nxy) AS BIGINT) AS n FROM cells
), full_c AS (
  SELECT xt.x, yt.y, xt.nx, yt.ny,
         CAST(COALESCE(c.nxy, 0) AS BIGINT) AS nxy
  FROM xt CROSS JOIN yt
  LEFT JOIN cells c ON xt.x = c.x AND yt.y = c.y
)
SELECT x, y, nxy AS observed,
       ROUND(CAST(nx AS DOUBLE) * ny / n, 6) AS expected,
       ROUND((CAST(nxy AS DOUBLE) - CAST(nx AS DOUBLE) * ny / n)
             / sqrt(CAST(nx AS DOUBLE) * ny / n
                    * (1.0 - CAST(nx AS DOUBLE) / n)
                    * (1.0 - CAST(ny AS DOUBLE) / n)), 6) AS std_residual,
       CAST(CASE WHEN ABS((CAST(nxy AS DOUBLE) - CAST(nx AS DOUBLE) * ny / n)
                 / sqrt(CAST(nx AS DOUBLE) * ny / n
                        * (1.0 - CAST(nx AS DOUBLE) / n)
                        * (1.0 - CAST(ny AS DOUBLE) / n))) > 2.0
                 THEN 1 ELSE 0 END AS INTEGER) AS flag_cell
FROM full_c CROSS JOIN nn
ORDER BY x, y
"""


ORACLES["q_cronbach_alpha"] = f"""
WITH per AS (
  SELECT user_id,
         ROUND({_dsum("CASE WHEN event_type = 'click' THEN value ELSE 0.0 END")}, 6) AS v_click,
         ROUND({_dsum("CASE WHEN event_type = 'error' THEN value ELSE 0.0 END")}, 6) AS v_error,
         ROUND({_dsum("CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END")}, 6) AS v_purchase,
         ROUND({_dsum("CASE WHEN event_type = 'signup' THEN value ELSE 0.0 END")}, 6) AS v_signup,
         ROUND({_dsum("CASE WHEN event_type = 'view' THEN value ELSE 0.0 END")}, 6) AS v_view
  FROM events GROUP BY user_id
), per2 AS (
  SELECT *, ROUND(v_click + v_error + v_purchase + v_signup + v_view, 6) AS v_total
  FROM per
), mom AS (
  SELECT COUNT(*) AS n_users,
         {_dsum('v_click')} AS s_v_click, {_dsum('v_click * v_click')} AS ss_v_click,
         {_dsum('v_error')} AS s_v_error, {_dsum('v_error * v_error')} AS ss_v_error,
         {_dsum('v_purchase')} AS s_v_purchase, {_dsum('v_purchase * v_purchase')} AS ss_v_purchase,
         {_dsum('v_signup')} AS s_v_signup, {_dsum('v_signup * v_signup')} AS ss_v_signup,
         {_dsum('v_view')} AS s_v_view, {_dsum('v_view * v_view')} AS ss_v_view,
         {_dsum('v_total')} AS s_v_total, {_dsum('v_total * v_total')} AS ss_v_total
  FROM per2
), c AS (
  SELECT CAST(n_users AS BIGINT) AS n_users, CAST(5 AS BIGINT) AS k_items,
         (ss_v_click / n_users - (s_v_click / n_users) * (s_v_click / n_users))
         + (ss_v_error / n_users - (s_v_error / n_users) * (s_v_error / n_users))
         + (ss_v_purchase / n_users - (s_v_purchase / n_users) * (s_v_purchase / n_users))
         + (ss_v_signup / n_users - (s_v_signup / n_users) * (s_v_signup / n_users))
         + (ss_v_view / n_users - (s_v_view / n_users) * (s_v_view / n_users))
           AS sum_item_var,
         ss_v_total / n_users - (s_v_total / n_users) * (s_v_total / n_users)
           AS total_var
  FROM mom
)
SELECT n_users, k_items,
       ROUND(sum_item_var, 6) AS sum_item_var,
       ROUND(total_var, 6) AS total_var,
       ROUND(5.0 / 4.0 * (1.0 - sum_item_var / total_var), 6) AS alpha
FROM c
"""

ORACLES["q_kpss"] = f"""
WITH daily AS (
  SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS day,
         ROUND({_dsum('l_extendedprice / 1000.0')}, 6) AS y
  FROM lineitem GROUP BY strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')
), mu AS (
  SELECT ROUND({_dsum('y')} / COUNT(y), 6) AS mu FROM daily
), e AS (
  SELECT day, ROUND(y - mu, 6) AS e FROM daily CROSS JOIN mu
), base AS (
  SELECT day, e,
         CAST(SUM(CAST(ROUND(e * 1000000) AS BIGINT))
              OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS DOUBLE) / 1000000 AS s,
         LAG(e, 1) OVER (ORDER BY day) AS l1,
         LAG(e, 2) OVER (ORDER BY day) AS l2,
         LAG(e, 3) OVER (ORDER BY day) AS l3,
         LAG(e, 4) OVER (ORDER BY day) AS l4,
         LAG(e, 5) OVER (ORDER BY day) AS l5,
         LAG(e, 6) OVER (ORDER BY day) AS l6,
         LAG(e, 7) OVER (ORDER BY day) AS l7
  FROM e
), gam AS (
  SELECT COUNT(*) AS n,
         {_dsum('(s / 1000.0) * (s / 1000.0)')} AS ss_k,
         {_dsum('e * e')} AS g0,
         {_dsum('e * COALESCE(l1, 0.0)')} AS g1,
         {_dsum('e * COALESCE(l2, 0.0)')} AS g2,
         {_dsum('e * COALESCE(l3, 0.0)')} AS g3,
         {_dsum('e * COALESCE(l4, 0.0)')} AS g4,
         {_dsum('e * COALESCE(l5, 0.0)')} AS g5,
         {_dsum('e * COALESCE(l6, 0.0)')} AS g6,
         {_dsum('e * COALESCE(l7, 0.0)')} AS g7
  FROM base
), fin AS (
  SELECT CAST(n AS BIGINT) AS n_days,
         ss_k * 1000000.0 AS ss,
         g0 / n + 2.0 * (1.0 - 1 / 8.0) * (g1 / n) + 2.0 * (1.0 - 2 / 8.0) * (g2 / n)
              + 2.0 * (1.0 - 3 / 8.0) * (g3 / n) + 2.0 * (1.0 - 4 / 8.0) * (g4 / n)
              + 2.0 * (1.0 - 5 / 8.0) * (g5 / n) + 2.0 * (1.0 - 6 / 8.0) * (g6 / n)
              + 2.0 * (1.0 - 7 / 8.0) * (g7 / n) AS s2_lr
  FROM gam
)
SELECT n_days,
       ROUND(s2_lr, 6) AS longrun_var,
       ROUND(ss / (CAST(n_days AS DOUBLE) * n_days) / s2_lr, 6) AS kpss_stat,
       CAST(CASE WHEN ss / (CAST(n_days AS DOUBLE) * n_days) / s2_lr > 0.463
            THEN 1 ELSE 0 END AS INTEGER) AS flag_nonstationary
FROM fin
"""


ORACLES["q_brier_decomposition"] = f"""
WITH {_SCORED_LABELED_CTE},
binned AS (
  SELECT LEAST(CAST(FLOOR(prob * 10) AS INTEGER), 9) AS bin,
         COUNT(*) AS nk,
         {_dsum('prob')} AS sp,
         CAST(SUM(y) AS BIGINT) AS sy
  FROM labeled GROUP BY 1
), tot AS (
  SELECT COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS ny,
         {_dsum('(prob - y) * (prob - y)')} AS bs
  FROM labeled
), parts AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n,
         ROUND(MAX(bs / n), 6) AS brier,
         ROUND({_dsum('nk * (sp / nk - CAST(sy AS DOUBLE) / nk) * (sp / nk - CAST(sy AS DOUBLE) / nk)')}
               / MAX(n), 6) AS reliability,
         ROUND({_dsum('nk * (CAST(sy AS DOUBLE) / nk - CAST(ny AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / nk - CAST(ny AS DOUBLE) / n)')}
               / MAX(n), 6) AS resolution,
         ROUND(MAX(CAST(ny AS DOUBLE) / n * (1.0 - CAST(ny AS DOUBLE) / n)), 6)
           AS uncertainty,
         ROUND({_dsum('nk * ABS(sp / nk - CAST(sy AS DOUBLE) / nk)')} / MAX(n), 6) AS ece
  FROM binned CROSS JOIN tot
)
SELECT n, brier, reliability, resolution, uncertainty, ece,
       ROUND(brier - (reliability - resolution + uncertainty), 6) AS decomposition_gap
FROM parts
"""

ORACLES["q_qini"] = """
WITH per AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-08' THEN 1 ELSE 0 END) AS BIGINT)
           AS score,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS resp,
         CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS treated
  FROM events GROUP BY user_id
), dec AS (
  SELECT treated, resp,
         NTILE(10) OVER (ORDER BY score DESC, user_id ASC) AS decile
  FROM per
), g AS (
  SELECT decile,
         CAST(SUM(treated) AS BIGINT) AS nt,
         CAST(SUM(1 - treated) AS BIGINT) AS nc,
         CAST(SUM(treated * resp) AS BIGINT) AS rt,
         CAST(SUM((1 - treated) * resp) AS BIGINT) AS rc
  FROM dec GROUP BY decile
), cum AS (
  SELECT decile,
         CAST(SUM(nt) OVER w AS BIGINT) AS cum_nt,
         CAST(SUM(nc) OVER w AS BIGINT) AS cum_nc,
         CAST(SUM(rt) OVER w AS BIGINT) AS cum_rt,
         CAST(SUM(rc) OVER w AS BIGINT) AS cum_rc
  FROM g
  WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), last AS (
  SELECT CAST(cum_rt AS DOUBLE) - CAST(cum_rc AS DOUBLE) * cum_nt / cum_nc AS total_qini
  FROM cum ORDER BY decile DESC LIMIT 1
)
SELECT CAST(decile AS INTEGER) AS decile, cum_nt, cum_nc,
       ROUND(CAST(cum_rt AS DOUBLE) - CAST(cum_rc AS DOUBLE) * cum_nt / cum_nc, 6) AS qini,
       ROUND(total_qini * decile / 10.0, 6) AS random_baseline,
       ROUND((CAST(cum_rt AS DOUBLE) - CAST(cum_rc AS DOUBLE) * cum_nt / cum_nc)
             - total_qini * decile / 10.0, 6) AS qini_above_random
FROM cum CROSS JOIN last
ORDER BY decile
"""


ORACLES["q_holt_winters"] = f"""
WITH RECURSIVE daily AS (
  SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS day,
         ROUND({_dsum('l_extendedprice / 1000.0')}, 6) AS y
  FROM lineitem WHERE year(l_shipdate) = 1998
  GROUP BY strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')
), s0 AS (
  SELECT day, y, ROW_NUMBER() OVER (ORDER BY day) AS rn, COUNT(*) OVER () AS n
  FROM daily
), init AS (
  SELECT CAST(ROUND(CAST((SELECT SUM(CAST(ROUND(y * 1000000) AS BIGINT))
                          FROM s0 WHERE rn <= 7) AS DOUBLE) / 7) AS DOUBLE) / 1000000 AS l0,
         CAST(ROUND((CAST(ROUND(CAST((SELECT SUM(CAST(ROUND(y * 1000000) AS BIGINT))
                                      FROM s0 WHERE rn > 7 AND rn <= 14) AS DOUBLE) / 7)
                          AS DOUBLE) / 1000000
                     - CAST(ROUND(CAST((SELECT SUM(CAST(ROUND(y * 1000000) AS BIGINT))
                                        FROM s0 WHERE rn <= 7) AS DOUBLE) / 7)
                            AS DOUBLE) / 1000000) / 7 * 1000000) AS DOUBLE) / 1000000 AS b0
), r(rn, l, b, s) AS (
  SELECT 7, l0, b0,
         (SELECT list(CAST(ROUND((y - init.l0) * 1000000) AS DOUBLE) / 1000000
                      ORDER BY rn)
          FROM s0 WHERE rn <= 7)
  FROM init
  UNION ALL
  SELECT r.rn + 1,
         CAST(ROUND((0.3 * (d.y - r.s[1]) + (1 - 0.3) * (r.l + r.b)) * 1000000)
              AS DOUBLE) / 1000000,
         CAST(ROUND((0.1 * ((CAST(ROUND((0.3 * (d.y - r.s[1]) + (1 - 0.3) * (r.l + r.b))
                                        * 1000000) AS DOUBLE) / 1000000) - r.l)
                     + (1 - 0.1) * r.b) * 1000000) AS DOUBLE) / 1000000,
         r.s[2:7] || [CAST(ROUND((0.2 * (d.y
                      - (CAST(ROUND((0.3 * (d.y - r.s[1]) + (1 - 0.3) * (r.l + r.b))
                                    * 1000000) AS DOUBLE) / 1000000))
                      + (1 - 0.2) * r.s[1]) * 1000000) AS DOUBLE) / 1000000]
  FROM r JOIN s0 d ON d.rn = r.rn + 1
)
SELECT CAST(r.rn AS BIGINT) AS n_obs,
       ROUND(r.l, 6) AS level,
       ROUND(r.b, 6) AS trend,
       ROUND(r.s[1], 6) AS season_next,
       ROUND(r.l + r.b + r.s[1], 6) AS forecast_next
FROM r JOIN (SELECT MAX(rn) AS mx FROM s0) t ON r.rn = t.mx
"""


ORACLES["q_mcnemar"] = """
WITH scored AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS truth,
         CASE WHEN CAST(len(list_filter(string_split(text, ' '),
                    t -> list_contains(['the','a','of','and','to','in','is','on','for','with'], t)))
              AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE) >= 0.05
              THEN 1 ELSE 0 END AS ra,
         CASE WHEN CAST(length(regexp_replace(text, '[^\\x00-\\x7F]', '', 'g')) AS DOUBLE)
                   / NULLIF(length(text), 0) >= 0.99
              THEN 1 ELSE 0 END AS rb
  FROM documents
), ok AS (
  SELECT CASE WHEN ra = truth THEN 1 ELSE 0 END AS ok_a,
         CASE WHEN rb = truth THEN 1 ELSE 0 END AS ok_b
  FROM scored
), g AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CASE WHEN ok_a = 1 AND ok_b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
         CAST(SUM(CASE WHEN ok_a = 0 AND ok_b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN ok_a = 1 AND ok_b = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS both_right
  FROM ok
)
SELECT CAST(n AS BIGINT) AS n, both_right, b, c,
       ROUND((CAST(ABS(b - c) AS DOUBLE) - 1.0) * (CAST(ABS(b - c) AS DOUBLE) - 1.0)
             / CAST(b + c AS DOUBLE), 6) AS mcnemar_chi2,
       CAST(CASE WHEN (CAST(ABS(b - c) AS DOUBLE) - 1.0)
                      * (CAST(ABS(b - c) AS DOUBLE) - 1.0)
                      / CAST(b + c AS DOUBLE) > 3.841
                 THEN 1 ELSE 0 END AS INTEGER) AS flag_different
FROM g
"""

ORACLES["q_cochran_q"] = """
WITH med AS (
  SELECT ROUND(quantile_cont(CAST(length(text) AS DOUBLE), 0.5), 6) AS med
  FROM documents
), scored AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS truth,
         CASE WHEN CAST(len(list_filter(string_split(text, ' '),
                    t -> list_contains(['the','a','of','and','to','in','is','on','for','with'], t)))
              AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE) >= 0.05
              THEN 1 ELSE 0 END AS ra,
         CASE WHEN CAST(length(regexp_replace(text, '[^\\x00-\\x7F]', '', 'g')) AS DOUBLE)
                   / NULLIF(length(text), 0) >= 0.99
              THEN 1 ELSE 0 END AS rb,
         CASE WHEN CAST(length(text) AS DOUBLE) >= med THEN 1 ELSE 0 END AS rc
  FROM documents CROSS JOIN med
), x AS (
  SELECT CAST(CASE WHEN ra = truth THEN 1 ELSE 0 END AS BIGINT) AS x1,
         CAST(CASE WHEN rb = truth THEN 1 ELSE 0 END AS BIGINT) AS x2,
         CAST(CASE WHEN rc = truth THEN 1 ELSE 0 END AS BIGINT) AS x3
  FROM scored
), g AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(x1) AS BIGINT) AS g1, CAST(SUM(x2) AS BIGINT) AS g2,
         CAST(SUM(x3) AS BIGINT) AS g3,
         CAST(SUM(x1 + x2 + x3) AS BIGINT) AS t,
         CAST(SUM((x1 + x2 + x3) * (x1 + x2 + x3)) AS BIGINT) AS l2
  FROM x
), q AS (
  SELECT CAST(n AS BIGINT) AS n_docs, g1 AS right_stopword, g2 AS right_ascii,
         g3 AS right_length,
         3.0 * 2.0 * ((CAST(g1 AS DOUBLE) - CAST(t AS DOUBLE) / 3) * (CAST(g1 AS DOUBLE) - CAST(t AS DOUBLE) / 3)
           + (CAST(g2 AS DOUBLE) - CAST(t AS DOUBLE) / 3) * (CAST(g2 AS DOUBLE) - CAST(t AS DOUBLE) / 3)
           + (CAST(g3 AS DOUBLE) - CAST(t AS DOUBLE) / 3) * (CAST(g3 AS DOUBLE) - CAST(t AS DOUBLE) / 3))
           / (3.0 * t - l2) AS q_raw
  FROM g
)
SELECT n_docs, right_stopword, right_ascii, right_length,
       ROUND(q_raw, 6) AS cochran_q,
       CAST(CASE WHEN q_raw > 5.991 THEN 1 ELSE 0 END AS INTEGER) AS flag_differ
FROM q
"""


ORACLES["q_partition_pruning_gain"] = """
WITH monthly AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS m, COUNT(*) AS n_rows
  FROM orders GROUP BY strftime(o_orderdate, '%Y-%m')
), preds(pred, lo, hi) AS (
  VALUES ('one_week', TIMESTAMP '1997-03-10', TIMESTAMP '1997-03-17'),
         ('one_quarter', TIMESTAMP '1996-01-01', TIMESTAMP '1996-04-01'),
         ('two_years', TIMESTAMP '1995-01-01', TIMESTAMP '1997-01-01')
), tot AS (
  SELECT COUNT(*) AS full_n FROM orders
), scanned AS (
  SELECT pred, CAST(SUM(n_rows) AS BIGINT) AS rows_scanned
  FROM monthly CROSS JOIN preds
  WHERE m >= strftime(lo, '%Y-%m') AND m <= strftime(hi, '%Y-%m')
  GROUP BY pred
), exact AS (
  SELECT pred, COUNT(*) AS rows_selected
  FROM orders CROSS JOIN preds
  WHERE o_orderdate >= lo AND o_orderdate < hi
  GROUP BY pred
)
SELECT s.pred, s.rows_scanned, CAST(e.rows_selected AS BIGINT) AS rows_selected,
       CAST(t.full_n AS BIGINT) AS rows_full_scan,
       ROUND(CAST(s.rows_scanned AS DOUBLE) / t.full_n, 6) AS scan_fraction,
       ROUND(CAST(e.rows_selected AS DOUBLE) / s.rows_scanned, 6) AS scan_precision
FROM scanned s JOIN exact e ON s.pred = e.pred CROSS JOIN tot t
ORDER BY s.pred
"""

ORACLES["q_bloom_sizing"] = """
WITH base AS (
  SELECT 'orders.o_custkey' AS key_col,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct FROM orders
  UNION ALL
  SELECT 'lineitem.l_orderkey', CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) FROM lineitem
  UNION ALL
  SELECT 'lineitem.l_partkey', CAST(COUNT(DISTINCT l_partkey) AS BIGINT) FROM lineitem
  UNION ALL
  SELECT 'customer.c_custkey', CAST(COUNT(DISTINCT c_custkey) AS BIGINT) FROM customer
), m AS (
  SELECT key_col, n_distinct,
         -(CAST(n_distinct AS DOUBLE) * ln(0.01)) / (ln(2.0) * ln(2.0)) AS m_bits_raw
  FROM base
)
SELECT key_col, n_distinct,
       CAST(ceil(m_bits_raw) AS BIGINT) AS m_bits,
       ROUND(ln(2.0) * m_bits_raw / n_distinct, 6) AS k_hashes,
       ROUND(m_bits_raw / 8.0 / 1048576.0, 6) AS mib
FROM m ORDER BY key_col
"""


ORACLES["q_wasserstein"] = f"""
WITH two AS (
  SELECT event_type AS g, ROUND(value, 6) AS v
  FROM events WHERE event_type IN ('click', 'purchase')
), per_val AS (
  SELECT v,
         CAST(SUM(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c2
  FROM two GROUP BY v
), cum AS (
  SELECT v,
         CAST(SUM(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS r1,
         CAST(SUM(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS r2,
         LEAD(v) OVER (ORDER BY v) AS v_next
  FROM per_val
), tot AS (
  SELECT MAX(r1) AS n1, MAX(r2) AS n2 FROM cum
), j AS (
  SELECT ABS(CAST(r1 AS DOUBLE) / n1 - CAST(r2 AS DOUBLE) / n2)
           * ROUND(v_next - v, 6) AS term,
         n1, n2
  FROM cum CROSS JOIN tot WHERE v_next IS NOT NULL
)
SELECT CAST(MAX(n1) AS BIGINT) AS n_click,
       CAST(MAX(n2) AS BIGINT) AS n_purchase,
       ROUND({_dsum('term')}, 6) AS wasserstein_1
FROM j
"""

ORACLES["q_tv_distance"] = f"""
WITH g AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN strftime(ts, '%A') IN ('Saturday', 'Sunday')
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_wk,
         CAST(SUM(CASE WHEN strftime(ts, '%A') IN ('Saturday', 'Sunday')
                  THEN 0 ELSE 1 END) AS BIGINT) AS n_wd
  FROM events GROUP BY event_type
), tot AS (
  SELECT CAST(SUM(n_wk) AS BIGINT) AS tk, CAST(SUM(n_wd) AS BIGINT) AS td FROM g
), j AS (
  SELECT ABS(CAST(n_wk AS DOUBLE) / tk - CAST(n_wd AS DOUBLE) / td) AS diff, tk, td
  FROM g CROSS JOIN tot
)
SELECT CAST(MAX(tk) AS BIGINT) AS n_weekend,
       CAST(MAX(td) AS BIGINT) AS n_weekday,
       ROUND({_dsum('diff')} / 2.0, 6) AS tv_distance
FROM j
"""


ORACLES["q_partial_corr"] = f"""
WITH mom AS (
  SELECT COUNT(*) AS n,
         {_dsum('l_quantity')} AS sx,
         {_dsum('l_extendedprice / 1000.0')} AS sy,
         {_dsum('l_extendedprice / l_quantity / 1000.0')} AS sz,
         {_dsum('l_quantity * l_quantity')} AS sxx,
         {_dsum('(l_extendedprice / 1000.0) * (l_extendedprice / 1000.0)')} AS syy,
         {_dsum('(l_extendedprice / l_quantity / 1000.0) * (l_extendedprice / l_quantity / 1000.0)')} AS szz,
         {_dsum('l_quantity * (l_extendedprice / 1000.0)')} AS sxy,
         {_dsum('l_quantity * (l_extendedprice / l_quantity / 1000.0)')} AS sxz,
         {_dsum('(l_extendedprice / 1000.0) * (l_extendedprice / l_quantity / 1000.0)')} AS syz
  FROM lineitem
), r AS (
  SELECT CAST(n AS BIGINT) AS n,
         ROUND((sxy - sx * sy / n) / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 6) AS r_xy,
         ROUND((sxz - sx * sz / n) / sqrt((sxx - sx * sx / n) * (szz - sz * sz / n)), 6) AS r_xz,
         ROUND((syz - sy * sz / n) / sqrt((syy - sy * sy / n) * (szz - sz * sz / n)), 6) AS r_yz
  FROM mom
)
SELECT n, r_xy, r_xz, r_yz,
       ROUND((r_xy - r_xz * r_yz)
             / sqrt((1.0 - r_xz * r_xz) * (1.0 - r_yz * r_yz)), 6)
         AS partial_r_xy_given_z
FROM r
"""

ORACLES["q_vif"] = f"""
WITH mom AS (
  SELECT COUNT(*) AS n,
         {_dsum('l_quantity')} AS sa,
         {_dsum('l_discount')} AS sb,
         {_dsum('l_extendedprice / l_quantity / 1000.0')} AS sc,
         {_dsum('l_quantity * l_quantity')} AS saa,
         {_dsum('l_discount * l_discount')} AS sbb,
         {_dsum('(l_extendedprice / l_quantity / 1000.0) * (l_extendedprice / l_quantity / 1000.0)')} AS scc,
         {_dsum('l_quantity * l_discount')} AS sab,
         {_dsum('l_quantity * (l_extendedprice / l_quantity / 1000.0)')} AS sac,
         {_dsum('l_discount * (l_extendedprice / l_quantity / 1000.0)')} AS sbc
  FROM lineitem
), r AS (
  SELECT CAST(n AS BIGINT) AS n,
         ROUND((sab - sa * sb / n) / sqrt((saa - sa * sa / n) * (sbb - sb * sb / n)), 6) AS r12,
         ROUND((sac - sa * sc / n) / sqrt((saa - sa * sa / n) * (scc - sc * sc / n)), 6) AS r13,
         ROUND((sbc - sb * sc / n) / sqrt((sbb - sb * sb / n) * (scc - sc * sc / n)), 6) AS r23
  FROM mom
)
SELECT n, r12, r13, r23,
       ROUND(1.0 / ((1.0 + 2.0 * r12 * r13 * r23 - r12 * r12 - r13 * r13 - r23 * r23)
             / (1.0 - r23 * r23)), 6) AS vif_quantity,
       ROUND(1.0 / ((1.0 + 2.0 * r12 * r13 * r23 - r12 * r12 - r13 * r13 - r23 * r23)
             / (1.0 - r13 * r13)), 6) AS vif_discount,
       ROUND(1.0 / ((1.0 + 2.0 * r12 * r13 * r23 - r12 * r12 - r13 * r13 - r23 * r23)
             / (1.0 - r12 * r12)), 6) AS vif_unit_price
FROM r
"""


ORACLES["q_mde"] = f"""
WITH per AS (
  SELECT user_id, ROUND({_dsum('value')}, 6) AS spend FROM events GROUP BY user_id
), mom AS (
  SELECT COUNT(*) AS n_users, {_dsum('spend')} AS s, {_dsum('spend * spend')} AS ss
  FROM per
), c AS (
  SELECT CAST(n_users AS BIGINT) AS n_users,
         s / n_users AS mu,
         ss / n_users - (s / n_users) * (s / n_users) AS var_
  FROM mom
)
SELECT n_users,
       ROUND(mu, 6) AS mean_spend,
       ROUND(sqrt(var_), 6) AS sd_spend,
       ROUND((1.96 + 0.8416) * sqrt(2.0 * var_ / (n_users / 2.0)), 6) AS mde_abs,
       ROUND((1.96 + 0.8416) * sqrt(2.0 * var_ / (n_users / 2.0)) / mu, 6)
         AS mde_relative,
       CAST(ceil(2.0 * var_ * (1.96 + 0.8416) * (1.96 + 0.8416)
            / ((0.05 * mu) * (0.05 * mu))) AS BIGINT) AS n_per_arm_for_5pct
FROM c
"""

ORACLES["q_session_gap_sweep"] = """
WITH base AS (
  SELECT user_id,
         CAST(FLOOR(date_part('epoch', ts)) AS BIGINT)
           - LAG(CAST(FLOOR(date_part('epoch', ts)) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
  FROM events
), gaps(sweep, thr) AS (
  VALUES ('10min', 600), ('30min', 1800), ('60min', 3600)
), starts AS (
  SELECT sweep, thr, COUNT(*) AS n_events,
         CAST(SUM(CASE WHEN gap_s IS NULL OR gap_s > thr THEN 1 ELSE 0 END) AS BIGINT)
           AS n_sessions
  FROM base CROSS JOIN gaps GROUP BY sweep, thr
)
SELECT sweep, n_sessions,
       ROUND(CAST(n_events AS DOUBLE) / n_sessions, 6) AS mean_events_per_session
FROM starts ORDER BY sweep
"""


ORACLES["q_process_capability"] = f"""
WITH first_ship AS (
  SELECT l_orderkey, MIN(l_shipdate) AS ship FROM lineitem GROUP BY l_orderkey
), lag_d AS (
  SELECT CAST(datediff('day', CAST(o_orderdate AS DATE), CAST(ship AS DATE)) AS DOUBLE) AS d
  FROM orders o JOIN first_ship f ON o.o_orderkey = f.l_orderkey
), mom AS (
  SELECT COUNT(*) AS n, {_dsum('d')} AS s, {_dsum('d * d')} AS ss,
         CAST(SUM(CASE WHEN d < 1.0 OR d > 120.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oos
  FROM lag_d
), c AS (
  SELECT CAST(n AS BIGINT) AS n_orders, n_oos AS n_out_of_spec,
         s / n AS mu, sqrt(ss / n - (s / n) * (s / n)) AS sd
  FROM mom
)
SELECT n_orders, n_out_of_spec,
       ROUND(mu, 6) AS mean_lag_days,
       ROUND(sd, 6) AS sd_lag_days,
       ROUND((120.0 - 1.0) / (6.0 * sd), 6) AS cp,
       ROUND(least(120.0 - mu, mu - 1.0) / (3.0 * sd), 6) AS cpk,
       ROUND(CAST(n_out_of_spec AS DOUBLE) / n_orders, 6) AS oos_share,
       ROUND((sd * sd + (mu - 60.0) * (mu - 60.0)) / (60.0 * 60.0), 6)
         AS taguchi_loss_ratio
FROM c
"""


ORACLES["q_backlog_curve"] = """
WITH done AS (
  SELECT l_orderkey, MAX(l_shipdate) AS done_ts FROM lineitem GROUP BY l_orderkey
), placed AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS m, 1 AS d FROM orders
), closed AS (
  SELECT strftime(done_ts, '%Y-%m') AS m, -1 AS d
  FROM orders o JOIN done ON o.o_orderkey = done.l_orderkey
), monthly AS (
  SELECT m,
         CAST(SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_placed,
         CAST(SUM(CASE WHEN d = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_closed
  FROM (SELECT * FROM placed UNION ALL SELECT * FROM closed)
  GROUP BY m
)
SELECT m, n_placed, n_closed,
       CAST(SUM(n_placed - n_closed)
            OVER (ORDER BY m ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS open_backlog
FROM monthly ORDER BY m
"""

ORACLES["q_topsis"] = f"""
WITH base AS (
  SELECT l.l_suppkey, l.l_extendedprice, l.l_returnflag, l.l_shipdate, o.o_orderdate
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), crit AS (
  SELECT l_suppkey,
         ROUND({_dsum('l_extendedprice / 1000.0')}, 6) AS rev,
         ROUND(CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*), 6) AS ret_rate,
         ROUND(CAST(SUM(datediff('day', CAST(o_orderdate AS DATE),
                                 CAST(l_shipdate AS DATE))) AS DOUBLE)
               / COUNT(*), 6) AS lag
  FROM base GROUP BY l_suppkey
), rng AS (
  SELECT MAX(rev) AS rev_hi, MIN(rev) AS rev_lo,
         MAX(ret_rate) AS rr_hi, MIN(ret_rate) AS rr_lo,
         MAX(lag) AS lag_hi, MIN(lag) AS lag_lo,
         COUNT(*) AS n_sup
  FROM crit
), nz AS (
  SELECT l_suppkey,
         ROUND((rev - rev_lo) / (rev_hi - rev_lo), 6) AS c1,
         ROUND((rr_hi - ret_rate) / (rr_hi - rr_lo), 6) AS c2,
         ROUND((lag_hi - lag) / (lag_hi - lag_lo), 6) AS c3,
         n_sup
  FROM crit CROSS JOIN rng
), sums AS (
  SELECT {_dsum('c1')} AS s_c1, {_dsum('c2')} AS s_c2, {_dsum('c3')} AS s_c3,
         MAX(n_sup) AS n_sup
  FROM nz
), ent AS (
  SELECT MAX(nz.n_sup) AS n_sup,
         ROUND(-{_dsum('CASE WHEN c1 > 0 THEN (c1 / s_c1) * ln(c1 / s_c1) ELSE 0.0 END')}
               / ln(CAST(MAX(nz.n_sup) AS DOUBLE)), 6) AS e_c1,
         ROUND(-{_dsum('CASE WHEN c2 > 0 THEN (c2 / s_c2) * ln(c2 / s_c2) ELSE 0.0 END')}
               / ln(CAST(MAX(nz.n_sup) AS DOUBLE)), 6) AS e_c2,
         ROUND(-{_dsum('CASE WHEN c3 > 0 THEN (c3 / s_c3) * ln(c3 / s_c3) ELSE 0.0 END')}
               / ln(CAST(MAX(nz.n_sup) AS DOUBLE)), 6) AS e_c3
  FROM nz CROSS JOIN sums
), w AS (
  SELECT n_sup,
         ROUND((1.0 - e_c1) / ((1.0 - e_c1) + (1.0 - e_c2) + (1.0 - e_c3)), 6) AS w1,
         ROUND((1.0 - e_c2) / ((1.0 - e_c1) + (1.0 - e_c2) + (1.0 - e_c3)), 6) AS w2,
         ROUND((1.0 - e_c3) / ((1.0 - e_c1) + (1.0 - e_c2) + (1.0 - e_c3)), 6) AS w3
  FROM ent
), scored AS (
  SELECT l_suppkey,
         ROUND(sqrt(w1 * w1 * (1.0 - c1) * (1.0 - c1)
                    + w2 * w2 * (1.0 - c2) * (1.0 - c2)
                    + w3 * w3 * (1.0 - c3) * (1.0 - c3)), 6) AS d_ideal,
         ROUND(sqrt(w1 * w1 * c1 * c1 + w2 * w2 * c2 * c2 + w3 * w3 * c3 * c3), 6)
           AS d_anti
  FROM nz CROSS JOIN w
)
SELECT l_suppkey, d_ideal, d_anti,
       ROUND(d_anti / (d_ideal + d_anti), 6) AS closeness
FROM scored ORDER BY closeness DESC, l_suppkey ASC LIMIT 10
"""


ORACLES["q_wallet_share"] = f"""
WITH j AS (
  SELECT o.o_custkey, p.p_brand, l.l_extendedprice
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
), cb AS (
  SELECT o_custkey, p_brand,
         ROUND({_dsum('l_extendedprice / 1000.0')}, 6) AS spend
  FROM j GROUP BY o_custkey, p_brand
), tot AS (
  SELECT o_custkey,
         ROUND(CAST(SUM(CAST(ROUND(spend * 1000000) AS BIGINT)) AS DOUBLE) / 1000000, 6)
           AS total,
         MAX(spend) AS top_spend
  FROM cb GROUP BY o_custkey
), share AS (
  SELECT ROUND(top_spend / total, 6) AS sow FROM tot
)
SELECT COUNT(*) AS n_customers,
       ROUND({_dsum('sow')} / COUNT(sow), 6) AS mean_share_of_wallet,
       ROUND(quantile_cont(sow, 0.5), 6) AS median_share_of_wallet,
       CAST(SUM(CASE WHEN sow >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_majority_loyal,
       ROUND(CAST(SUM(CASE WHEN sow >= 0.5 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
         AS majority_loyal_share
FROM share
"""

ORACLES["q_month_end_effect"] = f"""
WITH base AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS m,
         CAST(l_shipdate AS DATE) AS d,
         l_extendedprice / 1000.0 AS v,
         CASE WHEN datediff('day', CAST(l_shipdate AS DATE),
                            last_day(CAST(l_shipdate AS DATE))) < 3
              THEN 1 ELSE 0 END AS is_tail,
         day(last_day(CAST(l_shipdate AS DATE))) AS dim
  FROM lineitem
), per_m AS (
  SELECT m, dim,
         ROUND({_dsum('v')}, 6) AS rev,
         ROUND({_dsum('CASE WHEN is_tail = 1 THEN v ELSE 0.0 END')}, 6) AS rev_tail
  FROM base GROUP BY m, dim
), scored AS (
  SELECT m,
         ROUND(ROUND(rev_tail / rev, 6) / ROUND(3.0 / dim, 6), 6) AS lift
  FROM per_m
), worst AS (
  SELECT m AS worst_month, lift AS worst_lift
  FROM scored ORDER BY lift DESC, m ASC LIMIT 1
)
SELECT COUNT(*) AS n_months,
       ROUND({_dsum('lift')} / COUNT(lift), 6) AS mean_lift,
       CAST(SUM(CASE WHEN lift > 2.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_months_flagged,
       worst_month, worst_lift
FROM scored CROSS JOIN worst
GROUP BY worst_month, worst_lift
"""


ORACLES["q_profit_curve"] = f"""
WITH {_SCORED_LABELED_CTE},
thr AS (
  SELECT UNNEST([0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS threshold
), g AS (
  SELECT t.threshold,
         CAST(SUM(CASE WHEN l.prob >= t.threshold AND l.y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN l.prob >= t.threshold AND l.y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(SUM(CASE WHEN l.prob < t.threshold AND l.y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn
  FROM labeled l CROSS JOIN thr t GROUP BY t.threshold
), scored AS (
  SELECT threshold, tp, fp, fn,
         CAST(10 * tp - fp - 5 * fn AS BIGINT) AS profit
  FROM g
), best AS (
  SELECT threshold AS best_t FROM scored ORDER BY profit DESC, threshold ASC LIMIT 1
)
SELECT threshold, tp, fp, fn, profit,
       CAST(CASE WHEN threshold = best_t THEN 1 ELSE 0 END AS INTEGER) AS is_best
FROM scored CROSS JOIN best ORDER BY threshold
"""

ORACLES["q_youden"] = f"""
WITH {_SCORED_LABELED_CTE},
thr AS (
  SELECT UNNEST([0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS threshold
), g AS (
  SELECT t.threshold,
         CAST(SUM(CASE WHEN l.prob >= t.threshold AND l.y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN l.prob >= t.threshold AND l.y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(SUM(CASE WHEN l.prob < t.threshold AND l.y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         CAST(SUM(CASE WHEN l.prob < t.threshold AND l.y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
  FROM labeled l CROSS JOIN thr t GROUP BY t.threshold
), scored AS (
  SELECT threshold,
         ROUND(CAST(tp AS DOUBLE) / (tp + fn), 6) AS sensitivity,
         ROUND(CAST(tn AS DOUBLE) / (tn + fp), 6) AS specificity,
         ROUND(CAST(tp AS DOUBLE) / (tp + fn) + CAST(tn AS DOUBLE) / (tn + fp) - 1.0, 6)
           AS youden_j
  FROM g
), best AS (
  SELECT threshold AS best_t FROM scored ORDER BY youden_j DESC, threshold ASC LIMIT 1
)
SELECT threshold, sensitivity, specificity, youden_j,
       CAST(CASE WHEN threshold = best_t THEN 1 ELSE 0 END AS INTEGER) AS is_best
FROM scored CROSS JOIN best ORDER BY threshold
"""


ORACLES["q_effective_n"] = f"""
WITH daily AS (
  SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS day,
         ROUND({_dsum('l_extendedprice / 1000.0')}, 6) AS y
  FROM lineitem GROUP BY strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')
), base AS (
  SELECT y, LAG(y) OVER (ORDER BY day) AS yl FROM daily
), mom AS (
  SELECT COUNT(*) AS n,
         {_dsum('CASE WHEN yl IS NOT NULL THEN y END')} AS sa,
         {_dsum('yl')} AS sb,
         {_dsum('y * yl')} AS sab,
         {_dsum('CASE WHEN yl IS NOT NULL THEN y * y END')} AS saa,
         {_dsum('yl * yl')} AS sbb,
         COUNT(yl) AS m
  FROM base
), r1 AS (
  SELECT CAST(n AS BIGINT) AS n_days,
         ROUND((sab - sa * sb / m) / sqrt((saa - sa * sa / m) * (sbb - sb * sb / m)), 6)
           AS rho1
  FROM mom
)
SELECT n_days, rho1,
       ROUND(n_days * (1.0 - rho1) / (1.0 + rho1), 6) AS n_effective,
       ROUND(n_days * (1.0 - rho1) / (1.0 + rho1) / n_days, 6) AS efficiency
FROM r1
"""

ORACLES["q_mood_median"] = f"""
WITH med AS (
  SELECT ROUND(quantile_cont(o_totalprice, 0.5), 6) AS med FROM orders
), flagged AS (
  SELECT o_orderpriority AS grp,
         CASE WHEN o_totalprice > med THEN 1 ELSE 0 END AS above
  FROM orders CROSS JOIN med
), cells AS (
  SELECT grp, COUNT(*) AS ng, CAST(SUM(above) AS BIGINT) AS na
  FROM flagged GROUP BY grp
), tot AS (
  SELECT SUM(ng) AS n, CAST(SUM(na) AS BIGINT) AS ta, COUNT(*) AS k FROM cells
), terms AS (
  SELECT (CAST(na AS DOUBLE) - CAST(ng AS DOUBLE) * (CAST(ta AS DOUBLE) / n))
           * (na - CAST(ng AS DOUBLE) * (CAST(ta AS DOUBLE) / n))
           / (CAST(ng AS DOUBLE) * (CAST(ta AS DOUBLE) / n))
         + (CAST(ng - na AS DOUBLE) - CAST(ng AS DOUBLE) * (1.0 - CAST(ta AS DOUBLE) / n))
           * ((ng - na) - CAST(ng AS DOUBLE) * (1.0 - CAST(ta AS DOUBLE) / n))
           / (CAST(ng AS DOUBLE) * (1.0 - CAST(ta AS DOUBLE) / n)) AS term,
         n, k
  FROM cells CROSS JOIN tot
), red AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n, CAST(MAX(k) AS BIGINT) AS k,
         ROUND({_dsum('term')}, 6) AS chi2
  FROM terms
)
SELECT n, k, chi2,
       CAST(CASE WHEN chi2 > 9.488 THEN 1 ELSE 0 END AS INTEGER) AS flag_reject
FROM red
"""


ORACLES["q_logrank"] = f"""
WITH per_user AS (
  SELECT user_id, MIN(ts) AS first_ts,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS fp,
         MAX(ts) AS last_ts
  FROM events GROUP BY user_id
), users AS (
  SELECT datediff('day', CAST(first_ts AS DATE),
                  CAST(COALESCE(fp, last_ts) AS DATE)) AS t,
         CASE WHEN fp IS NOT NULL THEN 1 ELSE 0 END AS event,
         CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS g
  FROM per_user
), per_t AS (
  SELECT t,
         CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a1,
         CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a0,
         CAST(SUM(CASE WHEN g = 1 AND event = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
         CAST(SUM(CASE WHEN g = 0 AND event = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d0
  FROM users GROUP BY t
), tot AS (
  SELECT CAST(SUM(a1) AS BIGINT) AS t1, CAST(SUM(a0) AS BIGINT) AS t0 FROM per_t
), risk AS (
  SELECT t, d1, d0,
         CAST(t1 - COALESCE(SUM(a1) OVER (ORDER BY t
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n1,
         CAST(t0 - COALESCE(SUM(a0) OVER (ORDER BY t
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n0
  FROM per_t CROSS JOIN tot
), r2 AS (
  SELECT t, d1, d0, n1, n0, n1 + n0 AS nt, d1 + d0 AS dt
  FROM risk
), f AS (
  SELECT * FROM r2 WHERE dt > 0 AND nt > 1
), agg AS (
  SELECT CAST(SUM(d1) AS BIGINT) AS observed_g1,
         ROUND({_dsum('CAST(dt AS DOUBLE) * n1 / nt')}, 6) AS expected_g1,
         ROUND({_dsum('CAST(dt AS DOUBLE) * (CAST(n1 AS DOUBLE) / nt) * (1.0 - CAST(n1 AS DOUBLE) / nt) * CAST(nt - dt AS DOUBLE) / CAST(nt - 1 AS DOUBLE)')}, 6)
           AS variance,
         COUNT(*) AS n_event_times
  FROM f
)
SELECT CAST(n_event_times AS BIGINT) AS n_event_times, observed_g1, expected_g1,
       ROUND((observed_g1 - expected_g1) * (observed_g1 - expected_g1) / variance, 6)
         AS logrank_chi2,
       CAST(CASE WHEN (observed_g1 - expected_g1) * (observed_g1 - expected_g1)
                      / variance > 3.841 THEN 1 ELSE 0 END AS INTEGER) AS flag_differ
FROM agg
"""
