"""Oracle SQL, part 6/6 (file-order split from the single-file
oracles.py in round 3 — same entries, same insertion order)."""

from __future__ import annotations


from fortune_500_financial_insights_pipeline_spark.oracles._core import (  # noqa: F401
    ORACLES,
    _SCORED_LABELED_CTE,
    _dsum,
)


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


# Star-CC certification twin: identical output contract to q_grid_dbscan
# (both component algorithms converge to min-id labels), so the oracle is
# the same recursive-CTE replay.
ORACLES["q_grid_dbscan_star"] = ORACLES["q_grid_dbscan"]


# Round 4: reconciliation of a dedup decision — bigram-0.8 cluster-dedup
# survivors (q_jaccard_clusters' exact CTE chain) audited against the
# exact trigram-Jaccard >= 0.5 truth (q_lsh_recall's pair CTE): a dropped
# doc is a TRUE drop iff a verified near-dup of it survived.
ORACLES["q_neardup_reconcile"] = """
WITH RECURSIVE g2 AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(l)),
                                      x -> l[x] || ' ' || l[x+1])) AS grams
  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
), ex2 AS (
  SELECT doc_id, UNNEST(grams) AS gram FROM g2
), sizes2 AS (
  SELECT doc_id, len(grams) AS n FROM g2
), inter2 AS (
  SELECT a.doc_id AS u, b.doc_id AS v, COUNT(*) AS c
  FROM ex2 a JOIN ex2 b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), pairs2 AS (
  SELECT i.u, i.v
  FROM inter2 i
  JOIN sizes2 su ON i.u = su.doc_id
  JOIN sizes2 sv ON i.v = sv.doc_id
  WHERE CAST(i.c AS DOUBLE) / (su.n + sv.n - i.c) >= 0.8
), edges AS (
  SELECT u, v FROM pairs2 UNION SELECT v, u FROM pairs2
), reach AS (
  SELECT u AS src, v AS dst FROM edges
  UNION
  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
), comp AS (
  SELECT src AS id, LEAST(src, MIN(dst)) AS comp FROM reach GROUP BY src
), survivors AS (
  SELECT doc_id FROM documents
  WHERE doc_id NOT IN (SELECT id FROM comp)
     OR doc_id IN (SELECT id FROM comp WHERE id = comp)
), g3 AS (
  SELECT doc_id, UNNEST(list_distinct(
           list_transform(range(1, len(l) - 1),
                          x -> l[x] || ' ' || l[x+1] || ' ' || l[x+2])
         )) AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
), sizes3 AS (SELECT doc_id, COUNT(*) AS n FROM g3 GROUP BY doc_id),
inter3 AS (
  SELECT ga.doc_id AS id_a, gb.doc_id AS id_b, COUNT(*) AS ninter
  FROM g3 ga JOIN g3 gb ON ga.gram = gb.gram AND ga.doc_id < gb.doc_id
  GROUP BY 1, 2
), truth AS (
  SELECT i.id_a, i.id_b
  FROM inter3 i
  JOIN sizes3 sa ON sa.doc_id = i.id_a
  JOIN sizes3 sb ON sb.doc_id = i.id_b
  WHERE CAST(i.ninter AS DOUBLE) / (sa.n + sb.n - i.ninter) >= 0.5
), truth_sym AS (
  SELECT id_a AS x, id_b AS y FROM truth
  UNION ALL
  SELECT id_b AS x, id_a AS y FROM truth
), dropped AS (
  SELECT DISTINCT doc_id FROM documents
  WHERE doc_id NOT IN (SELECT doc_id FROM survivors)
), justified AS (
  SELECT DISTINCT d.doc_id
  FROM dropped d
  JOIN truth_sym t ON t.x = d.doc_id
  WHERE t.y IN (SELECT doc_id FROM survivors)
)
SELECT (SELECT COUNT(DISTINCT doc_id) FROM documents) AS n_corpus,
       (SELECT COUNT(*) FROM survivors) AS n_emitted,
       (SELECT COUNT(*) FROM dropped) AS n_dropped,
       (SELECT COUNT(*) FROM justified) AS n_true_drops,
       (SELECT COUNT(*) FROM dropped) - (SELECT COUNT(*) FROM justified)
         AS n_false_drops,
       ROUND(CASE WHEN (SELECT COUNT(*) FROM dropped) > 0
                  THEN CAST((SELECT COUNT(*) FROM dropped)
                            - (SELECT COUNT(*) FROM justified) AS DOUBLE)
                       / (SELECT COUNT(*) FROM dropped)
                  ELSE 0.0 END, 6) AS false_drop_rate
"""


# Round 4: sparse TF-IDF cosine pairs — the exact fixed-point replay of
# operators/tfidf.sparse_cosine_pairs (1e4-scaled round-6 tfidf weights,
# integer norms/dots, fixed-text cosine expression, threshold on the
# ROUNDED value).
ORACLES["q_sparse_cosine_pairs"] = """
WITH tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents)
  WHERE term <> ''
  GROUP BY doc_id, term
), dfreq AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), n AS (SELECT COUNT(*) AS n_docs FROM documents),
w AS (
  SELECT tf.doc_id, tf.term,
         CAST(ROUND(ROUND(tf.tf * LN((1.0 + n.n_docs) / (1.0 + dfreq.df)), 6) * 10000) AS BIGINT) AS wf
  FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n
  WHERE dfreq.df <= 0.5 * n.n_docs
), wnz AS (
  SELECT * FROM w WHERE wf <> 0
), norms AS (
  SELECT doc_id, SUM(wf * wf) AS n2 FROM wnz GROUP BY doc_id
), dots AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, SUM(a.wf * b.wf) AS dot
  FROM wnz a JOIN wnz b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, cos_sim
FROM (
  SELECT d.id_a, d.id_b,
         ROUND(CAST(d.dot AS DOUBLE)
               / (SQRT(CAST(na.n2 AS DOUBLE)) * SQRT(CAST(nb.n2 AS DOUBLE))), 6)
           AS cos_sim
  FROM dots d
  JOIN norms na ON na.doc_id = d.id_a
  JOIN norms nb ON nb.doc_id = d.id_b
)
WHERE cos_sim >= 0.3
ORDER BY id_a, id_b
"""


# round-5 entries -----------------------------------------------------------

from fortune_500_financial_insights_pipeline_spark.oracles._core import (  # noqa: E402
    _pagerank_oracle,
)

# q_pagerank_dist: the same unrolled integer recurrence as q_pagerank but
# 3 rounds — the Spark side runs with local_threshold_edges=0, so this row
# hashes the DISTRIBUTED shuffle loop, not the driver-side twin.
ORACLES["q_pagerank_dist"] = _pagerank_oracle(iters=3)

# q_wav_decode_roundtrip: the generating formula computed directly — the
# Spark side containerizes the same int16 signal to RIFF bytes and decodes
# it back through the pure-stdlib codec; matching hashes prove the decode.
ORACLES["q_wav_decode_roundtrip"] = """
WITH ids AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id < 40),
s AS (
  SELECT doc_id,
         unnest(range(0, CAST(64 + doc_id % 17 AS BIGINT))) AS i
  FROM ids
), pcm AS (
  SELECT doc_id, i,
         ((doc_id * 7919 + i * 104729) % 65536) - 32768 AS v
  FROM s
), flagged AS (
  SELECT doc_id, i, v,
         CASE WHEN (v < 0) <> (LAG(v) OVER (PARTITION BY doc_id ORDER BY i) < 0)
              THEN 1 ELSE 0 END AS zc
  FROM pcm
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(SUM(v) AS BIGINT) AS sum_pcm,
       CAST(MIN(v) AS BIGINT) AS min_pcm,
       CAST(MAX(v) AS BIGINT) AS max_pcm,
       CAST(SUM(zc) AS BIGINT) AS n_zero_cross
FROM flagged
GROUP BY doc_id
"""

# q_png_decode_roundtrip: pixel formula replayed in SQL, incl. the pinned
# BT.601 floor-division luma; Spark decodes genuine deflated PNG bytes.
ORACLES["q_png_decode_roundtrip"] = """
WITH ids AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id < 30),
dims AS (
  SELECT doc_id,
         CAST(8 + doc_id % 5 AS BIGINT) AS w,
         CAST(4 + doc_id % 3 AS BIGINT) AS h
  FROM ids
), px AS (
  SELECT doc_id, w, h, y.y, x.x,
         (doc_id * 31 + y.y * 17 + x.x * 7 + 0) % 256 AS r,
         (doc_id * 31 + y.y * 17 + x.x * 7 + 3) % 256 AS g,
         (doc_id * 31 + y.y * 17 + x.x * 7 + 6) % 256 AS b
  FROM dims,
       LATERAL (SELECT unnest(range(0, h)) AS y) y,
       LATERAL (SELECT unnest(range(0, w)) AS x) x
)
SELECT doc_id,
       CAST(MAX(w) AS INTEGER) AS width,
       CAST(MAX(h) AS INTEGER) AS height,
       CAST(SUM(r + g + b) AS BIGINT) AS sum_pixels,
       CAST(SUM((299 * r + 587 * g + 114 * b) // 1000) AS BIGINT) AS sum_luma
FROM px
GROUP BY doc_id
"""

# q_jpeg_decode_roundtrip: constant-block grayscale pixel formula replayed
# directly (each 8x8 block contributes 64 copies of its value); the Spark
# side round-trips genuine Huffman-coded baseline JPEG bytes.
ORACLES["q_jpeg_decode_roundtrip"] = """
WITH ids AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id < 24),
dims AS (
  SELECT doc_id,
         CAST(16 + 8 * (doc_id % 2) AS BIGINT) AS w,
         CAST(16 AS BIGINT) AS h
  FROM ids
), blocks AS (
  SELECT doc_id, w, h, by.by, bx.bx,
         (doc_id * 37 + by.by * 11 + bx.bx * 5) % 256 AS v
  FROM dims,
       LATERAL (SELECT unnest(range(0, h // 8)) AS by) by,
       LATERAL (SELECT unnest(range(0, w // 8)) AS bx) bx
)
SELECT doc_id,
       CAST(MAX(w) AS INTEGER) AS width,
       CAST(MAX(h) AS INTEGER) AS height,
       CAST(SUM(v * 64) AS BIGINT) AS sum_pixels,
       CAST(MIN(v) AS BIGINT) AS min_pixel,
       CAST(MAX(v) AS BIGINT) AS max_pixel
FROM blocks
GROUP BY doc_id
"""

# q_mp4_frame_index_roundtrip: the sample-size/first-byte/duration
# formulas replayed directly; dts is the windowed cumulative stts sum.
ORACLES["q_mp4_frame_index_roundtrip"] = """
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
       CAST(SUM(sz) AS BIGINT) AS sum_bytes,
       CAST(SUM(fb) AS BIGINT) AS sum_first_byte,
       CAST(SUM(dts) AS BIGINT) AS sum_ts_units
FROM ts
GROUP BY doc_id
"""

# q_gopher_rules: every rule threshold replayed as the same cross-multiplied
# integer comparison (no float enters a pass/fail decision on either side);
# stopword existence uses the repo's 10-word EN list (see the query note).
ORACLES["q_gopher_rules"] = """
WITH feats AS (
  SELECT lang,
    len(string_split(text, ' ')) AS n_words,
    list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS sum_wl,
    length(text) - length(replace(text, '#', '')) AS n_hash,
    (length(text) - length(replace(text, '...', ''))) // 3 AS n_ell,
    len(string_split(text, chr(10))) AS n_lines,
    len(list_filter(string_split(text, chr(10)),
        x -> starts_with(x, '- ') OR starts_with(x, '* ')
             OR starts_with(x, '•'))) AS n_bullet,
    len(list_filter(string_split(text, chr(10)),
        x -> ends_with(x, '...'))) AS n_ell_lines,
    len(list_filter(string_split(text, ' '),
        t -> regexp_matches(t, '[A-Za-z]'))) AS n_alpha,
    len(list_intersect(list_distinct(string_split(text, ' ')),
        ['the','a','of','and','to','in','is','on','for','with'])) AS n_stop
  FROM documents
), flags AS (
  SELECT lang,
    (n_words >= 15 AND n_words <= 100000) AS r1,
    (3 * n_words <= sum_wl AND sum_wl <= 10 * n_words) AS r2,
    (10 * (n_hash + n_ell) <= n_words) AS r3,
    (10 * n_bullet <= 9 * n_lines) AS r4,
    (10 * n_ell_lines <= 3 * n_lines) AS r5,
    (10 * n_alpha >= 8 * n_words) AS r6,
    (n_stop >= 2) AS r7
  FROM feats
)
SELECT lang, COUNT(*) AS n_docs,
  CAST(SUM(CASE WHEN r1 THEN 0 ELSE 1 END) AS BIGINT) AS fail_word_count,
  CAST(SUM(CASE WHEN r2 THEN 0 ELSE 1 END) AS BIGINT) AS fail_mean_word_len,
  CAST(SUM(CASE WHEN r3 THEN 0 ELSE 1 END) AS BIGINT) AS fail_symbol_ratio,
  CAST(SUM(CASE WHEN r4 THEN 0 ELSE 1 END) AS BIGINT) AS fail_bullet,
  CAST(SUM(CASE WHEN r5 THEN 0 ELSE 1 END) AS BIGINT) AS fail_ellipsis,
  CAST(SUM(CASE WHEN r6 THEN 0 ELSE 1 END) AS BIGINT) AS fail_alpha_words,
  CAST(SUM(CASE WHEN r7 THEN 0 ELSE 1 END) AS BIGINT) AS fail_stopwords,
  CAST(SUM(CASE WHEN r1 AND r2 AND r3 AND r4 AND r5 AND r6 AND r7
           THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_all
FROM flags
GROUP BY lang
"""

# q_boilerplate_chunks: the q_cdc_chunks CTE chain rebuilt verbatim (same
# LBFS boundary rule, same md5 chunk hash), then the CCNet cross-doc
# frequency rule — COUNT(DISTINCT doc_id) >= 2 marks a chunk boilerplate.
ORACLES["q_boilerplate_chunks"] = """
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
), ch AS (
  SELECT doc_id, chunk_id,
         md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_hash
  FROM c GROUP BY doc_id, chunk_id
), freq AS (
  SELECT chunk_hash, COUNT(DISTINCT doc_id) AS ndocs FROM ch GROUP BY chunk_hash
), per AS (
  SELECT doc_id, COUNT(*) AS n_units,
         SUM(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS n_boiler
  FROM ch JOIN freq USING (chunk_hash) GROUP BY doc_id
)
SELECT doc_id,
       CAST(n_units AS BIGINT) AS n_units,
       CAST(n_boiler AS BIGINT) AS n_boiler,
       ROUND(CAST(n_boiler AS DOUBLE) / n_units, 6) AS boiler_frac
FROM per
"""

# q_resize_roundtrip: pixel formula composed with the integer nearest-
# neighbor index map (src = (i*src_dim)//target) replayed in SQL; the Spark
# side pushes genuine PNG bytes through decode -> resample -> re-encode.
ORACLES["q_resize_roundtrip"] = """
WITH ids AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id < 30),
dims AS (
  SELECT doc_id,
         CAST(5 + doc_id % 4 AS BIGINT) AS h,
         CAST(7 + doc_id % 5 AS BIGINT) AS w
  FROM ids
), px AS (
  SELECT doc_id,
         (y2.y2 * h) // 3 AS sy,
         (x2.x2 * w) // 5 AS sx,
         (doc_id * 13 + ((y2.y2 * h) // 3) * 11 + ((x2.x2 * w) // 5) * 7 + 0)
           % 256 AS r,
         (doc_id * 13 + ((y2.y2 * h) // 3) * 11 + ((x2.x2 * w) // 5) * 7 + 5)
           % 256 AS g,
         (doc_id * 13 + ((y2.y2 * h) // 3) * 11 + ((x2.x2 * w) // 5) * 7 + 10)
           % 256 AS b
  FROM dims,
       LATERAL (SELECT unnest(range(0, 3)) AS y2) y2,
       LATERAL (SELECT unnest(range(0, 5)) AS x2) x2
)
SELECT doc_id,
       CAST(5 AS INTEGER) AS width,
       CAST(3 AS INTEGER) AS height,
       CAST(SUM(r + g + b) AS BIGINT) AS sum_pixels,
       CAST(SUM((299 * r + 587 * g + 114 * b) // 1000) AS BIGINT) AS sum_luma
FROM px
GROUP BY doc_id
"""

# q_audio_features: duration / RMS / zero-crossing rate computed straight
# from the generating PCM formula; Spark decodes genuine RIFF/WAVE bytes
# through the production operator. Floats round-6 (association-only delta).
ORACLES["q_audio_features"] = """
WITH ids AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id < 40),
dims AS (SELECT doc_id, CAST(48 + doc_id % 23 AS BIGINT) AS n FROM ids),
s AS (
  SELECT doc_id, n, i.i,
         ((doc_id * 6151 + i.i * 95789) % 65536) - 32768 AS p
  FROM dims, LATERAL (SELECT unnest(range(0, n)) AS i) i
), lagged AS (
  SELECT doc_id, n, i, p,
         LAG(p) OVER (PARTITION BY doc_id ORDER BY i) AS prev
  FROM s
)
SELECT doc_id,
       CAST(16000 AS INTEGER) AS sample_rate,
       CAST(1 AS INTEGER) AS n_channels,
       CAST(MAX(n) AS BIGINT) AS n_frames,
       ROUND(CAST(MAX(n) AS DOUBLE) / 16000.0, 6) AS duration_s,
       ROUND(sqrt(SUM((p / 32768.0) * (p / 32768.0)) / MAX(n)), 6) AS rms,
       ROUND(CAST(SUM(CASE WHEN prev IS NOT NULL
                            AND ((p < 0) != (prev < 0)) THEN 1 ELSE 0 END)
                  AS DOUBLE) / (MAX(n) - 1), 6) AS zero_cross_rate
FROM lagged
GROUP BY doc_id
"""

# q_gif_decode_roundtrip: the palette-index pixel formula replayed in SQL
# (incl. BT.601 floor luma); the Spark side round-trips genuine GIF87a
# bytes through real variable-width LZW.
ORACLES["q_gif_decode_roundtrip"] = """
WITH ids AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id < 30),
dims AS (
  SELECT doc_id,
         CAST(6 + doc_id % 3 AS BIGINT) AS h,
         CAST(9 + doc_id % 4 AS BIGINT) AS w,
         CAST(4 + doc_id % 5 AS BIGINT) AS ncol
  FROM ids
), px AS (
  SELECT doc_id, w, h,
         (doc_id * 11 + ((doc_id + y.y * 3 + x.x) % ncol) * 29 + 0) % 256 AS r,
         (doc_id * 11 + ((doc_id + y.y * 3 + x.x) % ncol) * 29 + 17) % 256 AS g,
         (doc_id * 11 + ((doc_id + y.y * 3 + x.x) % ncol) * 29 + 34) % 256 AS b
  FROM dims,
       LATERAL (SELECT unnest(range(0, h)) AS y) y,
       LATERAL (SELECT unnest(range(0, w)) AS x) x
)
SELECT doc_id,
       CAST(MAX(w) AS INTEGER) AS width,
       CAST(MAX(h) AS INTEGER) AS height,
       CAST(SUM(r + g + b) AS BIGINT) AS sum_pixels,
       CAST(SUM((299 * r + 587 * g + 114 * b) // 1000) AS BIGINT) AS sum_luma
FROM px
GROUP BY doc_id
"""

# q_jpeg_progressive_roundtrip: constant-block grayscale formula replayed
# directly; the Spark side round-trips a genuine multi-scan SOF2 stream
# (successive approximation + spectral selection).
ORACLES["q_jpeg_progressive_roundtrip"] = """
WITH ids AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id < 24),
dims AS (
  SELECT doc_id,
         CAST(16 + 8 * (doc_id % 3) AS BIGINT) AS w,
         CAST(24 AS BIGINT) AS h
  FROM ids
), blocks AS (
  SELECT doc_id, w, h, by.by, bx.bx,
         (doc_id * 43 + by.by * 13 + bx.bx * 7) % 256 AS v
  FROM dims,
       LATERAL (SELECT unnest(range(0, h // 8)) AS by) by,
       LATERAL (SELECT unnest(range(0, w // 8)) AS bx) bx
)
SELECT doc_id,
       CAST(MAX(w) AS INTEGER) AS width,
       CAST(MAX(h) AS INTEGER) AS height,
       CAST(SUM(v * 64) AS BIGINT) AS sum_pixels,
       CAST(MIN(v) AS INTEGER) AS min_pixel,
       CAST(MAX(v) AS INTEGER) AS max_pixel
FROM blocks
GROUP BY doc_id
"""

# q_gif_frames_roundtrip: palette formula + cumulative-delay clock + strip
# geometry replayed in SQL; the Spark side composes genuine animated-GIF
# frames through the production sample_frames operator.
ORACLES["q_gif_frames_roundtrip"] = """
WITH ids AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id < 20),
dims AS (
  SELECT doc_id,
         CAST(6 + doc_id % 3 AS BIGINT) AS h,
         CAST(8 + doc_id % 4 AS BIGINT) AS w,
         CAST(3 + doc_id % 4 AS BIGINT) AS ncol,
         CAST(2 + doc_id % 4 AS BIGINT) AS n
  FROM ids
), frames AS (
  SELECT doc_id, h, w, ncol, f.f,
         CAST(5 + (doc_id + f.f) % 6 AS BIGINT) AS delay_cs
  FROM dims, LATERAL (SELECT unnest(range(0, n)) AS f) f
), clock AS (
  SELECT doc_id, h, w, ncol, f, delay_cs,
         COALESCE(SUM(delay_cs) OVER (PARTITION BY doc_id ORDER BY f
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS ts_cs
  FROM frames
), strips AS (
  SELECT doc_id, h, w, ncol, f, ts_cs, s.s,
         (s.s * w) // 8 AS x0,
         GREATEST((s.s * w) // 8 + 1, ((s.s + 1) * w) // 8) AS x1
  FROM clock, LATERAL (SELECT unnest(range(0, 8)) AS s) s
), px AS (
  SELECT doc_id, f, ts_cs, h, w, s, x0, x1,
         ((doc_id * 7 + ((doc_id + f * 5 + y.y * 2 + x.x) % ncol) * 31 + 0)
            % 256) AS r,
         ((doc_id * 7 + ((doc_id + f * 5 + y.y * 2 + x.x) % ncol) * 31 + 13)
            % 256) AS g,
         ((doc_id * 7 + ((doc_id + f * 5 + y.y * 2 + x.x) % ncol) * 31 + 26)
            % 256) AS b
  FROM strips,
       LATERAL (SELECT unnest(range(0, h)) AS y) y,
       LATERAL (SELECT unnest(range(x0, x1)) AS x) x
)
SELECT doc_id,
       CAST(f AS INTEGER) AS frame_idx,
       ROUND(CAST(MAX(ts_cs) AS DOUBLE) / 100.0, 6) AS ts,
       CAST(MAX(h * w * 3) AS INTEGER) AS n_bytes,
       CAST(s AS INTEGER) AS strip,
       ROUND((CAST(SUM((299 * r + 587 * g + 114 * b) // 1000) AS DOUBLE)
              / COUNT(*)) / 255.0, 6) AS lum
FROM px
GROUP BY doc_id, f, s
"""

# q_boilerplate_strip: the CDC CTE chain with chunk text kept, the cross-doc
# frequency rule, and the cleaned-document reassembly replayed in SQL — the
# md5 over the reconstructed text certifies removal byte-for-byte.
ORACLES["q_boilerplate_strip"] = """
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
), ch AS (
  SELECT doc_id, chunk_id, COUNT(*) AS n_tokens,
         string_agg(tok, ' ' ORDER BY pos) AS chunk_text,
         md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_hash
  FROM c GROUP BY doc_id, chunk_id
), freq AS (
  SELECT chunk_hash, COUNT(DISTINCT doc_id) AS ndocs FROM ch GROUP BY chunk_hash
), kept AS (
  SELECT ch.* FROM ch JOIN freq USING (chunk_hash) WHERE ndocs < 2
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_kept_chunks,
       CAST(SUM(n_tokens) AS BIGINT) AS kept_tokens,
       md5(string_agg(chunk_text, ' ' ORDER BY chunk_id)) AS kept_md5
FROM kept
GROUP BY doc_id
"""

# q_unicode_clean: the synthetic decomposed string rebuilt in SQL, then
# DuckDB's OWN nfc_normalize / strip_accents — two independent Unicode
# implementations must agree byte-for-byte for the md5s to match.
ORACLES["q_unicode_clean"] = """
WITH ids AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id < 60),
dims AS (SELECT doc_id, CAST(20 + doc_id % 10 AS BIGINT) AS n FROM ids),
chars AS (
  SELECT doc_id, i.i,
         substr('aeiouxyz', CAST((doc_id + i.i) % 8 AS INTEGER) + 1, 1)
         || CASE WHEN (doc_id + i.i) % 3 = 0 THEN chr(769) ELSE '' END
         || CASE WHEN (doc_id + i.i) % 5 = 0 THEN chr(771) ELSE '' END
           AS piece
  FROM dims, LATERAL (SELECT unnest(range(0, n)) AS i) i
), built AS (
  SELECT doc_id, string_agg(piece, '' ORDER BY i) AS raw
  FROM chars GROUP BY doc_id
)
SELECT doc_id,
       CAST(length(raw) AS INTEGER) AS raw_len,
       CAST(length(nfc_normalize(raw)) AS INTEGER) AS nfc_len,
       md5(nfc_normalize(raw)) AS nfc_md5,
       CAST(length(strip_accents(raw)) AS INTEGER) AS stripped_len,
       md5(strip_accents(raw)) AS stripped_md5
FROM built
"""


def _gopher_repetition_sql() -> str:
    """Mirror of operators/text.gopher_repetition + the per-lang rollup:
    the nine CTE families are generated per n so the SQL stays in exact
    lockstep with the operator's thresholds and arithmetic."""
    top_thr = {2: 0.20, 3: 0.18, 4: 0.16}
    dup_thr = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}
    ctes = ["""toks AS (
  SELECT doc_id, i - 1 AS pos, l[i] AS tok
  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l))) AS i
        FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)))""",
            """tot AS (
  SELECT doc_id, SUM(length(tok)) AS total_chars FROM toks GROUP BY doc_id)"""]
    for n in sorted(set(top_thr) | set(dup_thr)):
        leads = ", ".join(
            f"LEAD(tok, {j}) OVER w AS l{j}" for j in range(1, n)
        )
        parts = ", ".join(["tok"] + [f"l{j}" for j in range(1, n)])
        ctes.append(f"""g{n} AS (
  SELECT doc_id, pos, concat_ws(' ', {parts}) AS gram
  FROM (SELECT doc_id, pos, tok, {leads}
        FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos))
  WHERE l{n - 1} IS NOT NULL)""")
    for n in sorted(top_thr):
        ctes.append(f"""top{n} AS (
  SELECT doc_id, MAX(cnt * (length(gram) - {n - 1})) AS mass
  FROM (SELECT doc_id, gram, COUNT(*) AS cnt FROM g{n} GROUP BY doc_id, gram)
  GROUP BY doc_id)""")
    for n in sorted(dup_thr):
        ctes.append(f"""dup{n} AS (
  SELECT doc_id, gram FROM g{n} GROUP BY doc_id, gram HAVING COUNT(*) >= 2)""")
        ctes.append(f"""cov{n} AS (
  SELECT c.doc_id AS doc_id, SUM(length(toks.tok)) AS chars
  FROM (SELECT DISTINCT gg.doc_id, p.p
        FROM g{n} gg JOIN dup{n} USING (doc_id, gram),
             LATERAL (SELECT unnest(range(gg.pos, gg.pos + {n})) AS p) p) c
       JOIN toks ON toks.doc_id = c.doc_id AND toks.pos = c.p
  GROUP BY c.doc_id)""")
    frac_cols = []
    flag_exprs = []
    joins = []
    for n, thr in sorted(top_thr.items()):
        joins.append(f"LEFT JOIN top{n} USING (doc_id)")
        frac_cols.append(
            f"ROUND(CAST(COALESCE(top{n}.mass, 0) AS DOUBLE) / total_chars, 6)"
            f" <= {thr} AS r_top{n}"
        )
        flag_exprs.append(f"r_top{n}")
    for n, thr in sorted(dup_thr.items()):
        joins.append(f"LEFT JOIN cov{n} USING (doc_id)")
        frac_cols.append(
            f"ROUND(CAST(COALESCE(cov{n}.chars, 0) AS DOUBLE) / total_chars, 6)"
            f" <= {thr} AS r_dup{n}"
        )
        flag_exprs.append(f"r_dup{n}")
    fails = ",\n  ".join(
        f"CAST(SUM(CASE WHEN {f} THEN 0 ELSE 1 END) AS BIGINT) AS fail_{f[2:]}"
        for f in flag_exprs
    )
    allpass = " AND ".join(flag_exprs)
    return (
        "WITH " + ",\n".join(ctes) + f""",
flags AS (
  SELECT tot.doc_id, {", ".join(frac_cols)}
  FROM tot {" ".join(joins)}
)
SELECT d.lang, COUNT(*) AS n_docs,
  {fails},
  CAST(SUM(CASE WHEN {allpass} THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_all
FROM flags JOIN documents d USING (doc_id)
GROUP BY d.lang"""
    )


ORACLES["q_gopher_repetition"] = _gopher_repetition_sql()


def _label_propagation_sql(rounds: int = 3) -> str:
    """Unrolled-round mirror of operators/graph.label_propagation on the
    q_pagerank edge set: per round, neighbor-label counts then the
    (count DESC, label ASC) argmax via ROW_NUMBER."""
    ctes = ["""base AS (
  SELECT DISTINCT l.l_suppkey AS s, o.o_custkey + 1000000 AS c
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)""",
            """sym AS (
  SELECT s AS src, c AS dst FROM base
  UNION
  SELECT c AS src, s AS dst FROM base)""",
            """l0 AS (SELECT DISTINCT src AS node, src AS label FROM sym)"""]
    for r in range(1, rounds + 1):
        ctes.append(f"""c{r} AS (
  SELECT e.dst AS node, l.label, COUNT(*) AS c
  FROM sym e JOIN l{r - 1} l ON e.src = l.node
  GROUP BY e.dst, l.label)""")
        ctes.append(f"""b{r} AS (
  SELECT node, label FROM (
    SELECT node, label,
           ROW_NUMBER() OVER (PARTITION BY node
                              ORDER BY c DESC, label ASC) AS rn
    FROM c{r}) WHERE rn = 1)""")
        ctes.append(f"""l{r} AS (
  SELECT p.node, COALESCE(b{r}.label, p.label) AS label
  FROM l{r - 1} p LEFT JOIN b{r} USING (node))""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, label AS community FROM l{rounds}"
    )


ORACLES["q_label_propagation"] = _label_propagation_sql(3)

# q_bmp_decode_roundtrip: pixel formula replayed in SQL; the Spark side
# round-trips genuine padded bottom-up BI_RGB bytes.
ORACLES["q_bmp_decode_roundtrip"] = """
WITH ids AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id < 30),
dims AS (
  SELECT doc_id,
         CAST(3 + doc_id % 4 AS BIGINT) AS h,
         CAST(5 + doc_id % 6 AS BIGINT) AS w
  FROM ids
), px AS (
  SELECT doc_id, w, h,
         (doc_id * 19 + y.y * 7 + x.x * 3 + 0) % 256 AS r,
         (doc_id * 19 + y.y * 7 + x.x * 3 + 11) % 256 AS g,
         (doc_id * 19 + y.y * 7 + x.x * 3 + 22) % 256 AS b
  FROM dims,
       LATERAL (SELECT unnest(range(0, h)) AS y) y,
       LATERAL (SELECT unnest(range(0, w)) AS x) x
)
SELECT doc_id,
       CAST(MAX(w) AS INTEGER) AS width,
       CAST(MAX(h) AS INTEGER) AS height,
       CAST(SUM(r + g + b) AS BIGINT) AS sum_pixels,
       CAST(SUM((299 * r + 587 * g + 114 * b) // 1000) AS BIGINT) AS sum_luma
FROM px
GROUP BY doc_id
"""

# q_dedup_keep_best: the q_jaccard_clusters recursive-CTE closure with the
# survivor rule swapped to (quality DESC, id ASC) per component.
ORACLES["q_dedup_keep_best"] = """
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
), feats AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_toks,
         CAST(len(list_filter(string_split(text, ' '),
                    t -> list_contains(['the','a','of','and','to','in','is','on','for','with'], t)))
              AS DOUBLE) AS n_stop
  FROM documents
), scored AS (
  SELECT doc_id,
         ROUND(
           LEAST(n_chars / 200.0, 1.0) * 0.4
           + (CASE WHEN n_chars / n_toks >= 3.0 AND n_chars / n_toks <= 10.0
                   THEN 1.0 ELSE 0.5 END) * 0.3
           + LEAST((n_stop / n_toks) * 5.0, 1.0) * 0.3, 6) AS quality
  FROM feats
), tagged AS (
  SELECT s.doc_id, s.quality, COALESCE(c.comp, s.doc_id) AS comp
  FROM scored s LEFT JOIN comp c ON s.doc_id = c.id
), best AS (
  SELECT doc_id, quality FROM (
    SELECT doc_id, quality,
           ROW_NUMBER() OVER (PARTITION BY comp
                              ORDER BY quality DESC, doc_id ASC) AS rn
    FROM tagged) WHERE rn = 1
)
SELECT doc_id, quality FROM best
"""

# q_mjpeg_frame_pixels: constant-block frame formula + cumulative-stts
# clock + strip geometry replayed in SQL; the Spark side packs genuine
# baseline JPEGs into a real ISO BMFF container and decodes end-to-end
# through the production sample_frames operator (container walk + Huffman
# + IDCT). v is y-invariant within a block row, so each (by, x) pixel
# column contributes 8 identical rows — SUM(v * 8) over by∈{0,1} equals
# the full 16-row strip sum.
ORACLES["q_mjpeg_frame_pixels"] = """
WITH ids AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id < 20),
dims AS (
  SELECT doc_id,
         CAST(16 + 8 * (doc_id % 2) AS BIGINT) AS w,
         CAST(16 AS BIGINT) AS h,
         CAST(2 + doc_id % 4 AS BIGINT) AS n
  FROM ids
), frames AS (
  SELECT doc_id, w, h, f.f,
         CAST(100 + 10 * ((doc_id + f.f) % 4) AS BIGINT) AS dur
  FROM dims, LATERAL (SELECT unnest(range(0, n)) AS f) f
), clock AS (
  SELECT doc_id, w, h, f,
         COALESCE(SUM(dur) OVER (PARTITION BY doc_id ORDER BY f
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS dts
  FROM frames
), strips AS (
  SELECT doc_id, w, h, f, dts, s.s,
         (s.s * w) // 8 AS x0,
         GREATEST((s.s * w) // 8 + 1, ((s.s + 1) * w) // 8) AS x1
  FROM clock, LATERAL (SELECT unnest(range(0, 8)) AS s) s
), px AS (
  SELECT doc_id, f, dts, w, h, s, x0, x1,
         ((doc_id * 37 + f * 19 + by.by * 11 + (x.x // 8) * 5) % 256) AS v
  FROM strips,
       LATERAL (SELECT unnest(range(0, h // 8)) AS by) by,
       LATERAL (SELECT unnest(range(x0, x1)) AS x) x
)
SELECT doc_id,
       CAST(f AS INTEGER) AS frame_idx,
       ROUND(CAST(MAX(dts) AS DOUBLE) / 1000.0, 6) AS ts,
       CAST(MAX(h * w) AS INTEGER) AS n_bytes,
       CAST(s AS INTEGER) AS strip,
       ROUND((CAST(SUM(v * 8) AS DOUBLE)
              / (MAX(h) * (MAX(x1) - MAX(x0)))) / 255.0, 6) AS lum
FROM px
GROUP BY doc_id, f, s
"""

# q_curation_stream_funnel: the streaming module's funnel replayed in SQL —
# planted-dup union, fingerprint dedup (survivors are byte-identical so any
# representative text is THE text), the quality formula, the 4-pattern PII
# regex chain, 32/8 token windows, and a survivor-invariant corpus readout.
ORACLES["q_curation_stream_funnel"] = """
WITH base AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 200000, text FROM documents WHERE doc_id < 30
), fp AS (
  SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint,
         MIN(text) AS text
  FROM base GROUP BY 1
), gated AS (
  SELECT fingerprint, text FROM fp
  WHERE ROUND(
        LEAST(CAST(length(text) AS DOUBLE) / 200.0, 1.0) * 0.4
        + (CASE WHEN CAST(length(text) AS DOUBLE)
                     / CAST(len(string_split(text, ' ')) AS DOUBLE) >= 3.0
                 AND CAST(length(text) AS DOUBLE)
                     / CAST(len(string_split(text, ' ')) AS DOUBLE) <= 10.0
                THEN 1.0 ELSE 0.5 END) * 0.3
        + LEAST((CAST(len(list_filter(string_split(text, ' '),
                    t -> list_contains(['the','a','of','and','to','in','is','on','for','with'], t)))
                 AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 5.0,
                1.0) * 0.3, 6) >= 0.5
), red AS (
  SELECT fingerprint,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g'),
             '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b', '<PHONE>', 'g'),
           '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IPV4>', 'g') AS rt
  FROM gated
), toks AS (
  SELECT fingerprint, string_split(rt, ' ') AS l FROM red
), cc AS (
  SELECT fingerprint,
         len(list_slice(l, start + 1, start + 32)) AS n_tokens,
         array_to_string(list_slice(l, start + 1, start + 32), ' ') AS chunk_text
  FROM (SELECT fingerprint, l, UNNEST(range(0, len(l), 24)) AS start FROM toks)
)
SELECT CAST(COUNT(DISTINCT fingerprint) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(COUNT(DISTINCT md5(chunk_text)) AS BIGINT) AS n_distinct_chunks,
       CAST(SUM(('0x' || substr(md5(chunk_text), 1, 8))::BIGINT) AS BIGINT)
         AS chunk_checksum
FROM cc
"""

# q_suffix_array: brute-force generalized suffix sort — every suffix
# materialized as a string (order-isomorphic to token-sequence comparison
# because ' ' sorts below all token characters), ROW_NUMBER with the
# (suffix, doc, pos) tie-break the Spark prefix-doubling form uses.
ORACLES["q_suffix_array"] = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents WHERE doc_id < 40
), s AS (
  SELECT doc_id, i - 1 AS pos, array_to_string(l[i:], ' ') AS suf
  FROM (SELECT doc_id, l, unnest(range(1, len(l) + 1)) AS i FROM d)
)
SELECT doc_id,
       CAST(pos AS INTEGER) AS pos,
       ROW_NUMBER() OVER (ORDER BY suf, doc_id, pos) AS sa_rank
FROM s
"""

# q_suffix_lcp_spans: the same brute sort, adjacent pairs via rk join,
# LCP = position of the first token mismatch over the zipped suffix lists
# (list_position returns 0 — not NULL — when no mismatch exists, i.e. one
# suffix is a prefix of the other: then the LCP is the shorter length).
ORACLES["q_suffix_lcp_spans"] = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents WHERE doc_id < 40
), s AS (
  SELECT doc_id, i - 1 AS pos, l[i:] AS sl, array_to_string(l[i:], ' ') AS suf
  FROM (SELECT doc_id, l, unnest(range(1, len(l) + 1)) AS i FROM d)
), ranked AS (
  SELECT doc_id, pos, sl,
         ROW_NUMBER() OVER (ORDER BY suf, doc_id, pos) AS rk
  FROM s
), pairs AS (
  SELECT a.doc_id AS doc_a, a.pos AS pos_a, b.doc_id AS doc_b,
         b.pos AS pos_b, a.sl AS sa, b.sl AS sb
  FROM ranked a JOIN ranked b ON b.rk = a.rk + 1
), scored AS (
  SELECT doc_a, pos_a, doc_b, pos_b, sa,
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
)
SELECT doc_a,
       CAST(pos_a AS INTEGER) AS pos_a,
       doc_b,
       CAST(pos_b AS INTEGER) AS pos_b,
       lcp,
       array_to_string(sa[1:CAST(lcp AS INTEGER)], ' ') AS span
FROM scored WHERE lcp >= 3
"""

# q_substring_dup_coverage: brute sort + LAG/LEAD first-mismatch scans.
# Per-suffix coverage = max of its adjacent LCPs that individually reach
# the threshold — identical to unioning both sides of every qualifying
# adjacent pair (each pair covers [pos, pos+lcp) on each endpoint).
ORACLES["q_substring_dup_coverage"] = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents WHERE doc_id < 40
), s AS (
  SELECT doc_id, i - 1 AS pos, l[i:] AS sl, array_to_string(l[i:], ' ') AS suf
  FROM (SELECT doc_id, l, unnest(range(1, len(l) + 1)) AS i FROM d)
), ranked AS (
  SELECT doc_id, pos, sl,
         ROW_NUMBER() OVER (ORDER BY suf, doc_id, pos) AS rk
  FROM s
), nb AS (
  SELECT doc_id, pos, sl,
         LAG(sl) OVER (ORDER BY rk) AS pl,
         LEAD(sl) OVER (ORDER BY rk) AS nl
  FROM ranked
), fm AS (
  SELECT *,
         list_position(list_transform(range(1, LEAST(len(sl), len(pl)) + 1),
                                      i -> sl[i] != pl[i]), true) AS fmp,
         list_position(list_transform(range(1, LEAST(len(sl), len(nl)) + 1),
                                      i -> sl[i] != nl[i]), true) AS fmn
  FROM nb
), scored AS (
  SELECT doc_id, pos,
         CASE WHEN pl IS NULL THEN 0
              WHEN fmp = 0 OR fmp IS NULL THEN LEAST(len(sl), len(pl))
              ELSE fmp - 1 END AS lcp_prev,
         CASE WHEN nl IS NULL THEN 0
              WHEN fmn = 0 OR fmn IS NULL THEN LEAST(len(sl), len(nl))
              ELSE fmn - 1 END AS lcp_next
  FROM fm
), eff AS (
  SELECT doc_id, pos,
         GREATEST(CASE WHEN lcp_prev >= 3 THEN lcp_prev ELSE 0 END,
                  CASE WHEN lcp_next >= 3 THEN lcp_next ELSE 0 END) AS L
  FROM scored
), covpos AS (
  SELECT DISTINCT doc_id, p
  FROM (SELECT doc_id, unnest(range(pos, pos + L)) AS p
        FROM eff WHERE L >= 3)
), cov AS (
  SELECT doc_id, COUNT(*) AS dup_tokens FROM covpos GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(d.l) AS BIGINT) AS n_tokens,
       CAST(COALESCE(cov.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       ROUND(CAST(COALESCE(cov.dup_tokens, 0) AS DOUBLE) / len(d.l), 6)
         AS dup_frac
FROM d LEFT JOIN cov USING (doc_id)
"""

# q_substring_dup_strip: coverage replay (see q_substring_dup_coverage)
# + anti-join + ordered string_agg reconstruction; md5 certifies the
# cleaned text byte-for-byte.
ORACLES["q_substring_dup_strip"] = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents WHERE doc_id < 40
), s AS (
  SELECT doc_id, i - 1 AS pos, l[i:] AS sl, array_to_string(l[i:], ' ') AS suf
  FROM (SELECT doc_id, l, unnest(range(1, len(l) + 1)) AS i FROM d)
), ranked AS (
  SELECT doc_id, pos, sl,
         ROW_NUMBER() OVER (ORDER BY suf, doc_id, pos) AS rk
  FROM s
), nb AS (
  SELECT doc_id, pos, sl,
         LAG(sl) OVER (ORDER BY rk) AS pl,
         LEAD(sl) OVER (ORDER BY rk) AS nl
  FROM ranked
), fm AS (
  SELECT *,
         list_position(list_transform(range(1, LEAST(len(sl), len(pl)) + 1),
                                      i -> sl[i] != pl[i]), true) AS fmp,
         list_position(list_transform(range(1, LEAST(len(sl), len(nl)) + 1),
                                      i -> sl[i] != nl[i]), true) AS fmn
  FROM nb
), scored AS (
  SELECT doc_id, pos,
         CASE WHEN pl IS NULL THEN 0
              WHEN fmp = 0 OR fmp IS NULL THEN LEAST(len(sl), len(pl))
              ELSE fmp - 1 END AS lcp_prev,
         CASE WHEN nl IS NULL THEN 0
              WHEN fmn = 0 OR fmn IS NULL THEN LEAST(len(sl), len(nl))
              ELSE fmn - 1 END AS lcp_next
  FROM fm
), eff AS (
  SELECT doc_id, pos,
         GREATEST(CASE WHEN lcp_prev >= 3 THEN lcp_prev ELSE 0 END,
                  CASE WHEN lcp_next >= 3 THEN lcp_next ELSE 0 END) AS L
  FROM scored
), covpos AS (
  SELECT DISTINCT doc_id, p
  FROM (SELECT doc_id, unnest(range(pos, pos + L)) AS p
        FROM eff WHERE L >= 3)
), t AS (
  SELECT doc_id, i - 1 AS pos, l[i] AS tok
  FROM (SELECT doc_id, l, unnest(range(1, len(l) + 1)) AS i FROM d)
), kept AS (
  SELECT t.doc_id, t.pos, t.tok
  FROM t LEFT JOIN covpos ON t.doc_id = covpos.doc_id AND t.pos = covpos.p
  WHERE covpos.p IS NULL
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS kept_tokens,
       md5(string_agg(tok, ' ' ORDER BY pos)) AS kept_md5
FROM kept GROUP BY doc_id
"""


# q_stft_spectrogram: the 8-point DFT replayed with the same closed-form
# twiddles and the same left-associative accumulation chain per (k, n) —
# generated programmatically (like _gopher_repetition_sql) so the 80-term
# chains stay in lockstep with operators/dsp.dft8_frame.
ORACLES["q_stft_spectrogram"] = """
WITH ids AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id < 30),
cells AS (
  SELECT doc_id, f.f, k.k
  FROM ids,
       LATERAL (SELECT unnest(range(0, 7)) AS f) f,
       LATERAL (SELECT unnest(range(0, 5)) AS k) k
), raw AS (
  SELECT doc_id, f, k,
         CASE WHEN k = 0 THEN ((((((((0.0 + ((((doc_id * 37 + (4 * f + 0) * 13) % 2048) - 1024) / 32768.0) * 1.0) + ((((doc_id * 37 + (4 * f + 1) * 13) % 2048) - 1024) / 32768.0) * 1.0) + ((((doc_id * 37 + (4 * f + 2) * 13) % 2048) - 1024) / 32768.0) * 1.0) + ((((doc_id * 37 + (4 * f + 3) * 13) % 2048) - 1024) / 32768.0) * 1.0) + ((((doc_id * 37 + (4 * f + 4) * 13) % 2048) - 1024) / 32768.0) * 1.0) + ((((doc_id * 37 + (4 * f + 5) * 13) % 2048) - 1024) / 32768.0) * 1.0) + ((((doc_id * 37 + (4 * f + 6) * 13) % 2048) - 1024) / 32768.0) * 1.0) + ((((doc_id * 37 + (4 * f + 7) * 13) % 2048) - 1024) / 32768.0) * 1.0) WHEN k = 1 THEN ((((((((0.0 + ((((doc_id * 37 + (4 * f + 0) * 13) % 2048) - 1024) / 32768.0) * 1.0) + ((((doc_id * 37 + (4 * f + 1) * 13) % 2048) - 1024) / 32768.0) * SQRT(0.5)) + ((((doc_id * 37 + (4 * f + 2) * 13) % 2048) - 1024) / 32768.0) * 0.0) + ((((doc_id * 37 + (4 * f + 3) * 13) % 2048) - 1024) / 32768.0) * (-SQRT(0.5))) + ((((doc_id * 37 + (4 * f + 4) * 13) % 2048) - 1024) / 32768.0) * (-1.0)) + ((((doc_id * 37 + (4 * f + 5) * 13) % 2048) - 1024) / 32768.0) * (-SQRT(0.5))) + ((((doc_id * 37 + (4 * f + 6) * 13) % 2048) - 1024) / 32768.0) * 0.0) + ((((doc_id * 37 + (4 * f + 7) * 13) % 2048) - 1024) / 32768.0) * SQRT(0.5)) WHEN k = 2 THEN ((((((((0.0 + ((((doc_id * 37 + (4 * f + 0) * 13) % 2048) - 1024) / 32768.0) * 1.0) + ((((doc_id * 37 + (4 * f + 1) * 13) % 2048) - 1024) / 32768.0) * 0.0) + ((((doc_id * 37 + (4 * f + 2) * 13) % 2048) - 1024) / 32768.0) * (-1.0)) + ((((doc_id * 37 + (4 * f + 3) * 13) % 2048) - 1024) / 32768.0) * 0.0) + ((((doc_id * 37 + (4 * f + 4) * 13) % 2048) - 1024) / 32768.0) * 1.0) + ((((doc_id * 37 + (4 * f + 5) * 13) % 2048) - 1024) / 32768.0) * 0.0) + ((((doc_id * 37 + (4 * f + 6) * 13) % 2048) - 1024) / 32768.0) * (-1.0)) + ((((doc_id * 37 + (4 * f + 7) * 13) % 2048) - 1024) / 32768.0) * 0.0) WHEN k = 3 THEN ((((((((0.0 + ((((doc_id * 37 + (4 * f + 0) * 13) % 2048) - 1024) / 32768.0) * 1.0) + ((((doc_id * 37 + (4 * f + 1) * 13) % 2048) - 1024) / 32768.0) * (-SQRT(0.5))) + ((((doc_id * 37 + (4 * f + 2) * 13) % 2048) - 1024) / 32768.0) * 0.0) + ((((doc_id * 37 + (4 * f + 3) * 13) % 2048) - 1024) / 32768.0) * SQRT(0.5)) + ((((doc_id * 37 + (4 * f + 4) * 13) % 2048) - 1024) / 32768.0) * (-1.0)) + ((((doc_id * 37 + (4 * f + 5) * 13) % 2048) - 1024) / 32768.0) * SQRT(0.5)) + ((((doc_id * 37 + (4 * f + 6) * 13) % 2048) - 1024) / 32768.0) * 0.0) + ((((doc_id * 37 + (4 * f + 7) * 13) % 2048) - 1024) / 32768.0) * (-SQRT(0.5))) WHEN k = 4 THEN ((((((((0.0 + ((((doc_id * 37 + (4 * f + 0) * 13) % 2048) - 1024) / 32768.0) * 1.0) + ((((doc_id * 37 + (4 * f + 1) * 13) % 2048) - 1024) / 32768.0) * (-1.0)) + ((((doc_id * 37 + (4 * f + 2) * 13) % 2048) - 1024) / 32768.0) * 1.0) + ((((doc_id * 37 + (4 * f + 3) * 13) % 2048) - 1024) / 32768.0) * (-1.0)) + ((((doc_id * 37 + (4 * f + 4) * 13) % 2048) - 1024) / 32768.0) * 1.0) + ((((doc_id * 37 + (4 * f + 5) * 13) % 2048) - 1024) / 32768.0) * (-1.0)) + ((((doc_id * 37 + (4 * f + 6) * 13) % 2048) - 1024) / 32768.0) * 1.0) + ((((doc_id * 37 + (4 * f + 7) * 13) % 2048) - 1024) / 32768.0) * (-1.0)) END AS re_raw,
         CASE WHEN k = 0 THEN ((((((((0.0 - ((((doc_id * 37 + (4 * f + 0) * 13) % 2048) - 1024) / 32768.0) * 0.0) - ((((doc_id * 37 + (4 * f + 1) * 13) % 2048) - 1024) / 32768.0) * 0.0) - ((((doc_id * 37 + (4 * f + 2) * 13) % 2048) - 1024) / 32768.0) * 0.0) - ((((doc_id * 37 + (4 * f + 3) * 13) % 2048) - 1024) / 32768.0) * 0.0) - ((((doc_id * 37 + (4 * f + 4) * 13) % 2048) - 1024) / 32768.0) * 0.0) - ((((doc_id * 37 + (4 * f + 5) * 13) % 2048) - 1024) / 32768.0) * 0.0) - ((((doc_id * 37 + (4 * f + 6) * 13) % 2048) - 1024) / 32768.0) * 0.0) - ((((doc_id * 37 + (4 * f + 7) * 13) % 2048) - 1024) / 32768.0) * 0.0) WHEN k = 1 THEN ((((((((0.0 - ((((doc_id * 37 + (4 * f + 0) * 13) % 2048) - 1024) / 32768.0) * 0.0) - ((((doc_id * 37 + (4 * f + 1) * 13) % 2048) - 1024) / 32768.0) * SQRT(0.5)) - ((((doc_id * 37 + (4 * f + 2) * 13) % 2048) - 1024) / 32768.0) * 1.0) - ((((doc_id * 37 + (4 * f + 3) * 13) % 2048) - 1024) / 32768.0) * SQRT(0.5)) - ((((doc_id * 37 + (4 * f + 4) * 13) % 2048) - 1024) / 32768.0) * 0.0) - ((((doc_id * 37 + (4 * f + 5) * 13) % 2048) - 1024) / 32768.0) * (-SQRT(0.5))) - ((((doc_id * 37 + (4 * f + 6) * 13) % 2048) - 1024) / 32768.0) * (-1.0)) - ((((doc_id * 37 + (4 * f + 7) * 13) % 2048) - 1024) / 32768.0) * (-SQRT(0.5))) WHEN k = 2 THEN ((((((((0.0 - ((((doc_id * 37 + (4 * f + 0) * 13) % 2048) - 1024) / 32768.0) * 0.0) - ((((doc_id * 37 + (4 * f + 1) * 13) % 2048) - 1024) / 32768.0) * 1.0) - ((((doc_id * 37 + (4 * f + 2) * 13) % 2048) - 1024) / 32768.0) * 0.0) - ((((doc_id * 37 + (4 * f + 3) * 13) % 2048) - 1024) / 32768.0) * (-1.0)) - ((((doc_id * 37 + (4 * f + 4) * 13) % 2048) - 1024) / 32768.0) * 0.0) - ((((doc_id * 37 + (4 * f + 5) * 13) % 2048) - 1024) / 32768.0) * 1.0) - ((((doc_id * 37 + (4 * f + 6) * 13) % 2048) - 1024) / 32768.0) * 0.0) - ((((doc_id * 37 + (4 * f + 7) * 13) % 2048) - 1024) / 32768.0) * (-1.0)) WHEN k = 3 THEN ((((((((0.0 - ((((doc_id * 37 + (4 * f + 0) * 13) % 2048) - 1024) / 32768.0) * 0.0) - ((((doc_id * 37 + (4 * f + 1) * 13) % 2048) - 1024) / 32768.0) * SQRT(0.5)) - ((((doc_id * 37 + (4 * f + 2) * 13) % 2048) - 1024) / 32768.0) * (-1.0)) - ((((doc_id * 37 + (4 * f + 3) * 13) % 2048) - 1024) / 32768.0) * SQRT(0.5)) - ((((doc_id * 37 + (4 * f + 4) * 13) % 2048) - 1024) / 32768.0) * 0.0) - ((((doc_id * 37 + (4 * f + 5) * 13) % 2048) - 1024) / 32768.0) * (-SQRT(0.5))) - ((((doc_id * 37 + (4 * f + 6) * 13) % 2048) - 1024) / 32768.0) * 1.0) - ((((doc_id * 37 + (4 * f + 7) * 13) % 2048) - 1024) / 32768.0) * (-SQRT(0.5))) WHEN k = 4 THEN ((((((((0.0 - ((((doc_id * 37 + (4 * f + 0) * 13) % 2048) - 1024) / 32768.0) * 0.0) - ((((doc_id * 37 + (4 * f + 1) * 13) % 2048) - 1024) / 32768.0) * 0.0) - ((((doc_id * 37 + (4 * f + 2) * 13) % 2048) - 1024) / 32768.0) * 0.0) - ((((doc_id * 37 + (4 * f + 3) * 13) % 2048) - 1024) / 32768.0) * 0.0) - ((((doc_id * 37 + (4 * f + 4) * 13) % 2048) - 1024) / 32768.0) * 0.0) - ((((doc_id * 37 + (4 * f + 5) * 13) % 2048) - 1024) / 32768.0) * 0.0) - ((((doc_id * 37 + (4 * f + 6) * 13) % 2048) - 1024) / 32768.0) * 0.0) - ((((doc_id * 37 + (4 * f + 7) * 13) % 2048) - 1024) / 32768.0) * 0.0) END AS im_raw
  FROM cells
)
SELECT doc_id,
       CAST(f AS INTEGER) AS frame,
       CAST(k AS INTEGER) AS bin,
       ROUND(re_raw, 6) AS re,
       ROUND(im_raw, 6) AS im,
       ROUND(re_raw * re_raw + im_raw * im_raw, 6) AS power
FROM raw
"""


# q_image_phash_dedup: the integer-cosine basis pixel formula + both DFT
# passes replayed as the identical left-associative chains (pixel values
# staged per (doc, y), row pass per kx, column pass over y-ordered
# lists) — generated programmatically so the chains stay in lockstep
# with operators/dsp.dft8_2d; sign bits fold into the 15-bit hash and
# bucket counts mirror the groupBy.
ORACLES["q_image_phash_dedup"] = """
WITH ids AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id < 25),
docs AS (
  SELECT doc_id FROM ids
  UNION ALL
  SELECT doc_id + 100000 FROM ids
), px AS (
  SELECT doc_id, y.y,
         (((128 + (CASE WHEN ((doc_id % 100000) * 7919 // 1) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * 0) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 2) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * 0) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 4) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * 0) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 8) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * 0) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 16) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * 0) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 32) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * 0) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 64) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * 0) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 128) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * 0) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 256) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * 0) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 512) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * 0) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 1024) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * 0) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 2048) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * 0) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 4096) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * 0) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 8192) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * 0) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 16384) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * 0) % 8) + 1])) + CASE WHEN doc_id >= 100000 AND y = 3 AND 0 = 3 THEN 1 ELSE 0 END) / 256.0) AS xv0,
         (((128 + (CASE WHEN ((doc_id % 100000) * 7919 // 1) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * 1) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 2) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * 1) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 4) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * 1) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 8) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * 1) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 16) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * 1) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 32) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * 1) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 64) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * 1) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 128) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * 1) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 256) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * 1) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 512) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * 1) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 1024) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * 1) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 2048) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * 1) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 4096) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * 1) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 8192) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * 1) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 16384) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * 1) % 8) + 1])) + CASE WHEN doc_id >= 100000 AND y = 3 AND 1 = 3 THEN 1 ELSE 0 END) / 256.0) AS xv1,
         (((128 + (CASE WHEN ((doc_id % 100000) * 7919 // 1) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * 2) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 2) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * 2) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 4) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * 2) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 8) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * 2) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 16) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * 2) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 32) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * 2) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 64) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * 2) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 128) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * 2) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 256) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * 2) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 512) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * 2) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 1024) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * 2) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 2048) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * 2) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 4096) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * 2) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 8192) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * 2) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 16384) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * 2) % 8) + 1])) + CASE WHEN doc_id >= 100000 AND y = 3 AND 2 = 3 THEN 1 ELSE 0 END) / 256.0) AS xv2,
         (((128 + (CASE WHEN ((doc_id % 100000) * 7919 // 1) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * 3) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 2) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * 3) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 4) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * 3) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 8) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * 3) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 16) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * 3) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 32) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * 3) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 64) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * 3) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 128) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * 3) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 256) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * 3) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 512) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * 3) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 1024) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * 3) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 2048) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * 3) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 4096) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * 3) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 8192) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * 3) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 16384) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * 3) % 8) + 1])) + CASE WHEN doc_id >= 100000 AND y = 3 AND 3 = 3 THEN 1 ELSE 0 END) / 256.0) AS xv3,
         (((128 + (CASE WHEN ((doc_id % 100000) * 7919 // 1) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * 4) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 2) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * 4) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 4) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * 4) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 8) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * 4) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 16) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * 4) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 32) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * 4) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 64) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * 4) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 128) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * 4) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 256) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * 4) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 512) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * 4) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 1024) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * 4) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 2048) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * 4) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 4096) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * 4) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 8192) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * 4) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 16384) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * 4) % 8) + 1])) + CASE WHEN doc_id >= 100000 AND y = 3 AND 4 = 3 THEN 1 ELSE 0 END) / 256.0) AS xv4,
         (((128 + (CASE WHEN ((doc_id % 100000) * 7919 // 1) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * 5) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 2) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * 5) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 4) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * 5) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 8) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * 5) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 16) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * 5) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 32) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * 5) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 64) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * 5) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 128) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * 5) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 256) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * 5) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 512) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * 5) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 1024) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * 5) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 2048) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * 5) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 4096) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * 5) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 8192) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * 5) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 16384) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * 5) % 8) + 1])) + CASE WHEN doc_id >= 100000 AND y = 3 AND 5 = 3 THEN 1 ELSE 0 END) / 256.0) AS xv5,
         (((128 + (CASE WHEN ((doc_id % 100000) * 7919 // 1) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * 6) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 2) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * 6) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 4) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * 6) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 8) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * 6) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 16) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * 6) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 32) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * 6) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 64) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * 6) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 128) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * 6) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 256) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * 6) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 512) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * 6) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 1024) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * 6) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 2048) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * 6) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 4096) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * 6) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 8192) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * 6) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 16384) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * 6) % 8) + 1])) + CASE WHEN doc_id >= 100000 AND y = 3 AND 6 = 3 THEN 1 ELSE 0 END) / 256.0) AS xv6,
         (((128 + (CASE WHEN ((doc_id % 100000) * 7919 // 1) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * 7) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 2) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * 7) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 4) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * 7) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 8) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * 7) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 16) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * 7) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 32) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * 7) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 64) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * 7) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 128) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * 7) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 256) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * 7) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 512) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * 7) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 1024) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * 7) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 2048) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((0 * 7) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 4096) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((1 * 7) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 8192) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((2 * 7) % 8) + 1]) + (CASE WHEN ((doc_id % 100000) * 7919 // 16384) % 2 = 1 THEN 1 ELSE -1 END) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * y) % 8) + 1]) * ([2, 1, 0, -1, -2, -1, 0, 1][((3 * 7) % 8) + 1])) + CASE WHEN doc_id >= 100000 AND y = 3 AND 7 = 3 THEN 1 ELSE 0 END) / 256.0) AS xv7
  FROM docs, LATERAL (SELECT unnest(range(0, 8)) AS y) y
), rowp AS (
  SELECT doc_id, y, kx.kx,
         CASE WHEN kx = 0 THEN ((((((((0.0 + xv0 * 1.0) + xv1 * 1.0) + xv2 * 1.0) + xv3 * 1.0) + xv4 * 1.0) + xv5 * 1.0) + xv6 * 1.0) + xv7 * 1.0) WHEN kx = 1 THEN ((((((((0.0 + xv0 * 1.0) + xv1 * SQRT(0.5)) + xv2 * 0.0) + xv3 * (-SQRT(0.5))) + xv4 * (-1.0)) + xv5 * (-SQRT(0.5))) + xv6 * 0.0) + xv7 * SQRT(0.5)) WHEN kx = 2 THEN ((((((((0.0 + xv0 * 1.0) + xv1 * 0.0) + xv2 * (-1.0)) + xv3 * 0.0) + xv4 * 1.0) + xv5 * 0.0) + xv6 * (-1.0)) + xv7 * 0.0) WHEN kx = 3 THEN ((((((((0.0 + xv0 * 1.0) + xv1 * (-SQRT(0.5))) + xv2 * 0.0) + xv3 * SQRT(0.5)) + xv4 * (-1.0)) + xv5 * SQRT(0.5)) + xv6 * 0.0) + xv7 * (-SQRT(0.5))) WHEN kx = 4 THEN ((((((((0.0 + xv0 * 1.0) + xv1 * (-1.0)) + xv2 * 1.0) + xv3 * (-1.0)) + xv4 * 1.0) + xv5 * (-1.0)) + xv6 * 1.0) + xv7 * (-1.0)) WHEN kx = 5 THEN ((((((((0.0 + xv0 * 1.0) + xv1 * (-SQRT(0.5))) + xv2 * 0.0) + xv3 * SQRT(0.5)) + xv4 * (-1.0)) + xv5 * SQRT(0.5)) + xv6 * 0.0) + xv7 * (-SQRT(0.5))) WHEN kx = 6 THEN ((((((((0.0 + xv0 * 1.0) + xv1 * 0.0) + xv2 * (-1.0)) + xv3 * 0.0) + xv4 * 1.0) + xv5 * 0.0) + xv6 * (-1.0)) + xv7 * 0.0) WHEN kx = 7 THEN ((((((((0.0 + xv0 * 1.0) + xv1 * SQRT(0.5)) + xv2 * 0.0) + xv3 * (-SQRT(0.5))) + xv4 * (-1.0)) + xv5 * (-SQRT(0.5))) + xv6 * 0.0) + xv7 * SQRT(0.5)) END AS rr,
         CASE WHEN kx = 0 THEN ((((((((0.0 - xv0 * 0.0) - xv1 * 0.0) - xv2 * 0.0) - xv3 * 0.0) - xv4 * 0.0) - xv5 * 0.0) - xv6 * 0.0) - xv7 * 0.0) WHEN kx = 1 THEN ((((((((0.0 - xv0 * 0.0) - xv1 * SQRT(0.5)) - xv2 * 1.0) - xv3 * SQRT(0.5)) - xv4 * 0.0) - xv5 * (-SQRT(0.5))) - xv6 * (-1.0)) - xv7 * (-SQRT(0.5))) WHEN kx = 2 THEN ((((((((0.0 - xv0 * 0.0) - xv1 * 1.0) - xv2 * 0.0) - xv3 * (-1.0)) - xv4 * 0.0) - xv5 * 1.0) - xv6 * 0.0) - xv7 * (-1.0)) WHEN kx = 3 THEN ((((((((0.0 - xv0 * 0.0) - xv1 * SQRT(0.5)) - xv2 * (-1.0)) - xv3 * SQRT(0.5)) - xv4 * 0.0) - xv5 * (-SQRT(0.5))) - xv6 * 1.0) - xv7 * (-SQRT(0.5))) WHEN kx = 4 THEN ((((((((0.0 - xv0 * 0.0) - xv1 * 0.0) - xv2 * 0.0) - xv3 * 0.0) - xv4 * 0.0) - xv5 * 0.0) - xv6 * 0.0) - xv7 * 0.0) WHEN kx = 5 THEN ((((((((0.0 - xv0 * 0.0) - xv1 * (-SQRT(0.5))) - xv2 * 1.0) - xv3 * (-SQRT(0.5))) - xv4 * 0.0) - xv5 * SQRT(0.5)) - xv6 * (-1.0)) - xv7 * SQRT(0.5)) WHEN kx = 6 THEN ((((((((0.0 - xv0 * 0.0) - xv1 * (-1.0)) - xv2 * 0.0) - xv3 * 1.0) - xv4 * 0.0) - xv5 * (-1.0)) - xv6 * 0.0) - xv7 * 1.0) WHEN kx = 7 THEN ((((((((0.0 - xv0 * 0.0) - xv1 * (-SQRT(0.5))) - xv2 * (-1.0)) - xv3 * (-SQRT(0.5))) - xv4 * 0.0) - xv5 * SQRT(0.5)) - xv6 * 1.0) - xv7 * SQRT(0.5)) END AS ri
  FROM px, LATERAL (SELECT unnest(range(0, 4)) AS kx) kx
), colin AS (
  SELECT doc_id, kx,
         list(rr ORDER BY y) AS lr,
         list(ri ORDER BY y) AS li
  FROM rowp GROUP BY doc_id, kx
), cells AS (
  SELECT doc_id, kx, ky.ky,
         CASE WHEN ky = 0 THEN ((((((((((((((((0.0 + lr[1] * 1.0) + li[1] * 0.0) + lr[2] * 1.0) + li[2] * 0.0) + lr[3] * 1.0) + li[3] * 0.0) + lr[4] * 1.0) + li[4] * 0.0) + lr[5] * 1.0) + li[5] * 0.0) + lr[6] * 1.0) + li[6] * 0.0) + lr[7] * 1.0) + li[7] * 0.0) + lr[8] * 1.0) + li[8] * 0.0) WHEN ky = 1 THEN ((((((((((((((((0.0 + lr[1] * 1.0) + li[1] * 0.0) + lr[2] * SQRT(0.5)) + li[2] * SQRT(0.5)) + lr[3] * 0.0) + li[3] * 1.0) + lr[4] * (-SQRT(0.5))) + li[4] * SQRT(0.5)) + lr[5] * (-1.0)) + li[5] * 0.0) + lr[6] * (-SQRT(0.5))) + li[6] * (-SQRT(0.5))) + lr[7] * 0.0) + li[7] * (-1.0)) + lr[8] * SQRT(0.5)) + li[8] * (-SQRT(0.5))) WHEN ky = 2 THEN ((((((((((((((((0.0 + lr[1] * 1.0) + li[1] * 0.0) + lr[2] * 0.0) + li[2] * 1.0) + lr[3] * (-1.0)) + li[3] * 0.0) + lr[4] * 0.0) + li[4] * (-1.0)) + lr[5] * 1.0) + li[5] * 0.0) + lr[6] * 0.0) + li[6] * 1.0) + lr[7] * (-1.0)) + li[7] * 0.0) + lr[8] * 0.0) + li[8] * (-1.0)) WHEN ky = 3 THEN ((((((((((((((((0.0 + lr[1] * 1.0) + li[1] * 0.0) + lr[2] * (-SQRT(0.5))) + li[2] * SQRT(0.5)) + lr[3] * 0.0) + li[3] * (-1.0)) + lr[4] * SQRT(0.5)) + li[4] * SQRT(0.5)) + lr[5] * (-1.0)) + li[5] * 0.0) + lr[6] * SQRT(0.5)) + li[6] * (-SQRT(0.5))) + lr[7] * 0.0) + li[7] * 1.0) + lr[8] * (-SQRT(0.5))) + li[8] * (-SQRT(0.5))) END AS re2
  FROM colin, LATERAL (SELECT unnest(range(0, 4)) AS ky) ky
), hashes AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN NOT (ky = 0 AND kx = 0) AND re2 > 0
                       THEN CAST(1 AS BIGINT) << CAST(ky * 4 + kx - 1 AS INTEGER)
                       ELSE 0 END) AS BIGINT) AS phash
  FROM cells GROUP BY doc_id
), buckets AS (
  SELECT phash, CAST(COUNT(*) AS BIGINT) AS n_bucket FROM hashes GROUP BY phash
)
SELECT h.doc_id, h.phash, b.n_bucket
FROM hashes h JOIN buckets b USING (phash)
"""

# q_html_main_extract: the page generator replayed — 15-token chunks,
# paragraph 0's planted entity decoded, whitespace collapsed, the same
# >=30-char / link-density keep rule (nav, ad aside, footer, and title
# are boilerplate by construction: title/footer under the length floor,
# nav and aside all link characters), newline-joined md5.
ORACLES["q_html_main_extract"] = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS l
  FROM documents WHERE doc_id < 40
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
       CAST(b.n_paras + 4 AS INTEGER) AS n_blocks,
       CAST(COALESCE(a.n_kept, 0) AS INTEGER) AS n_kept,
       CAST(length(COALESCE(a.main, '')) AS INTEGER) AS main_chars,
       md5(COALESCE(a.main, '')) AS main_md5
FROM blocks b LEFT JOIN agg a USING (doc_id)
"""

# q_url_canonical_dedup: every canonicalization rule replayed in SQL
# string ops — lowercase scheme/host, :80/:443 strip by scheme, fragment
# drop, tracking-param filter (utm_*/fbclid/gclid/ref), byte-sorted
# remaining params. Variants 1-3 collapse (n_raw 3), variant 4 stands
# alone (n_raw 1).
ORACLES["q_url_canonical_dedup"] = """
WITH d AS (
  SELECT doc_id, doc_id % 7 AS k FROM documents WHERE doc_id < 200
), raws AS (
  SELECT doc_id,
         'HTTP://Example' || k || '.COM:80/path/' || doc_id
           || '?b=2&utm_source=x&a=1#frag' AS raw
  FROM d
  UNION ALL
  SELECT doc_id,
         'http://example' || k || '.com/path/' || doc_id || '?a=1&b=2'
  FROM d
  UNION ALL
  SELECT doc_id,
         'http://example' || k || '.com:80/path/' || doc_id
           || '?utm_campaign=y&b=2&a=1'
  FROM d
  UNION ALL
  SELECT doc_id,
         'https://Example' || k || '.com:443/other/' || doc_id
  FROM d
), parts AS (
  SELECT doc_id, raw,
         lower(regexp_extract(raw, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
           AS scheme,
         lower(regexp_extract(raw, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1))
           AS hostport,
         regexp_extract(raw, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1)
           AS pathq
  FROM raws
), norm AS (
  SELECT doc_id,
         scheme,
         CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
              WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
              ELSE hostport END AS host,
         regexp_replace(hostport, ':[0-9]+$', '') AS bare_host,
         CASE WHEN regexp_extract(pathq, '^([^?]*)', 1) = '' THEN '/'
              ELSE regexp_extract(pathq, '^([^?]*)', 1) END AS path,
         array_to_string(
           list_sort(list_filter(
             string_split(regexp_extract(pathq, '\\?(.*)$', 1), '&'),
             p -> p <> ''
                  AND NOT regexp_matches(p, '^(utm_[^=]*|fbclid|gclid|ref)=')
           )), '&') AS canon_q
  FROM parts
), canon AS (
  SELECT doc_id,
         scheme || '://' || host || path
           || CASE WHEN canon_q <> '' THEN '?' || canon_q ELSE '' END
           AS canon_url,
         bare_host AS host
  FROM norm
)
SELECT canon_url, host, CAST(COUNT(*) AS BIGINT) AS n_raw
FROM canon GROUP BY canon_url, host
"""

# q_web_pipeline_e2e: the composed funnel replayed — 4 URL variants per
# doc of which 3 collapse (2 canonical fetches per doc, both serving the
# same page), the page-generator extraction replay (paragraph chunks,
# planted entity, >=30-char keep rule), content dedup by the extracted
# text itself, the quality formula on the space-joined main, and the
# 32/8 chunk windows with an order-invariant md5-prefix checksum.
ORACLES["q_web_pipeline_e2e"] = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS l
  FROM documents WHERE doc_id < 40
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
), mains AS (
  SELECT d.doc_id,
         replace(COALESCE(a.main, ''), chr(10), ' ') AS main_sp
  FROM d LEFT JOIN (
    SELECT doc_id, string_agg(p, chr(10) ORDER BY k) AS main
    FROM paras WHERE length(p) >= 30 GROUP BY doc_id
  ) a USING (doc_id)
), contents AS (
  SELECT DISTINCT main_sp FROM mains
), gated AS (
  SELECT main_sp FROM contents
  WHERE ROUND(
        LEAST(CAST(length(main_sp) AS DOUBLE) / 200.0, 1.0) * 0.4
        + (CASE WHEN CAST(length(main_sp) AS DOUBLE)
                     / CAST(len(string_split(main_sp, ' ')) AS DOUBLE) >= 3.0
                 AND CAST(length(main_sp) AS DOUBLE)
                     / CAST(len(string_split(main_sp, ' ')) AS DOUBLE) <= 10.0
                THEN 1.0 ELSE 0.5 END) * 0.3
        + LEAST((CAST(len(list_filter(string_split(main_sp, ' '),
                    t -> list_contains(['the','a','of','and','to','in','is','on','for','with'], t)))
                 AS DOUBLE) / CAST(len(string_split(main_sp, ' ')) AS DOUBLE)) * 5.0,
                1.0) * 0.3, 6) >= 0.5
), cc AS (
  SELECT len(list_slice(gl, start + 1, start + 32)) AS n_tokens,
         array_to_string(list_slice(gl, start + 1, start + 32), ' ')
           AS chunk_text
  FROM (SELECT string_split(main_sp, ' ') AS gl FROM gated),
       LATERAL (SELECT unnest(range(0, len(gl), 24)) AS start) s
)
SELECT CAST((SELECT COUNT(*) FROM d) * 4 AS BIGINT) AS n_raw_urls,
       CAST((SELECT COUNT(*) FROM d) * 2 AS BIGINT) AS n_fetches,
       CAST((SELECT COUNT(*) FROM contents) AS BIGINT) AS n_contents,
       CAST((SELECT COUNT(*) FROM gated) AS BIGINT) AS n_pass_quality,
       CAST((SELECT COUNT(*) FROM cc) AS BIGINT) AS n_chunks,
       CAST((SELECT SUM(n_tokens) FROM cc) AS BIGINT) AS sum_chunk_tokens,
       CAST((SELECT SUM(('0x' || substr(md5(chunk_text), 1, 8))::BIGINT)
             FROM cc) AS BIGINT) AS chunk_checksum
"""


# q_audio_ahash_dedup: the stepped-envelope tone-mix pcm formula + the
# exact STFT chains (generated like q_stft_spectrogram's oracle, pcm
# staged per (doc, frame)) reduced to ordinal band-power bits; bucket
# counts mirror the groupBy.
ORACLES["q_audio_ahash_dedup"] = """
WITH ids AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id < 25),
docs AS (
  SELECT doc_id FROM ids
  UNION ALL
  SELECT doc_id + 100000 FROM ids
), px AS (
  SELECT doc_id, f.f,
         ((((1000 * (1 + ((doc_id % 100000) * 7919 // 1 + (4 * f + 0) // 4) % 4)) * ([2, 1, 0, -1, -2, -1, 0, 1][(((4 * f + 0) % 8)) + 1]) + (1000 * (1 + ((doc_id % 100000) * 7919 // 4 + (4 * f + 0) // 4) % 4)) * ([1, 0, -1, 0, 1, 0, -1, 0][(((4 * f + 0) % 8)) + 1]) + (1000 * (1 + ((doc_id % 100000) * 7919 // 16 + (4 * f + 0) // 4) % 4)) * ([2, -1, 0, 1, -2, 1, 0, -1][(((4 * f + 0) % 8)) + 1])) + CASE WHEN doc_id >= 100000 AND 4 * f + 0 = 5 THEN 1 ELSE 0 END) / 32768.0) AS xv0,
         ((((1000 * (1 + ((doc_id % 100000) * 7919 // 1 + (4 * f + 1) // 4) % 4)) * ([2, 1, 0, -1, -2, -1, 0, 1][(((4 * f + 1) % 8)) + 1]) + (1000 * (1 + ((doc_id % 100000) * 7919 // 4 + (4 * f + 1) // 4) % 4)) * ([1, 0, -1, 0, 1, 0, -1, 0][(((4 * f + 1) % 8)) + 1]) + (1000 * (1 + ((doc_id % 100000) * 7919 // 16 + (4 * f + 1) // 4) % 4)) * ([2, -1, 0, 1, -2, 1, 0, -1][(((4 * f + 1) % 8)) + 1])) + CASE WHEN doc_id >= 100000 AND 4 * f + 1 = 5 THEN 1 ELSE 0 END) / 32768.0) AS xv1,
         ((((1000 * (1 + ((doc_id % 100000) * 7919 // 1 + (4 * f + 2) // 4) % 4)) * ([2, 1, 0, -1, -2, -1, 0, 1][(((4 * f + 2) % 8)) + 1]) + (1000 * (1 + ((doc_id % 100000) * 7919 // 4 + (4 * f + 2) // 4) % 4)) * ([1, 0, -1, 0, 1, 0, -1, 0][(((4 * f + 2) % 8)) + 1]) + (1000 * (1 + ((doc_id % 100000) * 7919 // 16 + (4 * f + 2) // 4) % 4)) * ([2, -1, 0, 1, -2, 1, 0, -1][(((4 * f + 2) % 8)) + 1])) + CASE WHEN doc_id >= 100000 AND 4 * f + 2 = 5 THEN 1 ELSE 0 END) / 32768.0) AS xv2,
         ((((1000 * (1 + ((doc_id % 100000) * 7919 // 1 + (4 * f + 3) // 4) % 4)) * ([2, 1, 0, -1, -2, -1, 0, 1][(((4 * f + 3) % 8)) + 1]) + (1000 * (1 + ((doc_id % 100000) * 7919 // 4 + (4 * f + 3) // 4) % 4)) * ([1, 0, -1, 0, 1, 0, -1, 0][(((4 * f + 3) % 8)) + 1]) + (1000 * (1 + ((doc_id % 100000) * 7919 // 16 + (4 * f + 3) // 4) % 4)) * ([2, -1, 0, 1, -2, 1, 0, -1][(((4 * f + 3) % 8)) + 1])) + CASE WHEN doc_id >= 100000 AND 4 * f + 3 = 5 THEN 1 ELSE 0 END) / 32768.0) AS xv3,
         ((((1000 * (1 + ((doc_id % 100000) * 7919 // 1 + (4 * f + 4) // 4) % 4)) * ([2, 1, 0, -1, -2, -1, 0, 1][(((4 * f + 4) % 8)) + 1]) + (1000 * (1 + ((doc_id % 100000) * 7919 // 4 + (4 * f + 4) // 4) % 4)) * ([1, 0, -1, 0, 1, 0, -1, 0][(((4 * f + 4) % 8)) + 1]) + (1000 * (1 + ((doc_id % 100000) * 7919 // 16 + (4 * f + 4) // 4) % 4)) * ([2, -1, 0, 1, -2, 1, 0, -1][(((4 * f + 4) % 8)) + 1])) + CASE WHEN doc_id >= 100000 AND 4 * f + 4 = 5 THEN 1 ELSE 0 END) / 32768.0) AS xv4,
         ((((1000 * (1 + ((doc_id % 100000) * 7919 // 1 + (4 * f + 5) // 4) % 4)) * ([2, 1, 0, -1, -2, -1, 0, 1][(((4 * f + 5) % 8)) + 1]) + (1000 * (1 + ((doc_id % 100000) * 7919 // 4 + (4 * f + 5) // 4) % 4)) * ([1, 0, -1, 0, 1, 0, -1, 0][(((4 * f + 5) % 8)) + 1]) + (1000 * (1 + ((doc_id % 100000) * 7919 // 16 + (4 * f + 5) // 4) % 4)) * ([2, -1, 0, 1, -2, 1, 0, -1][(((4 * f + 5) % 8)) + 1])) + CASE WHEN doc_id >= 100000 AND 4 * f + 5 = 5 THEN 1 ELSE 0 END) / 32768.0) AS xv5,
         ((((1000 * (1 + ((doc_id % 100000) * 7919 // 1 + (4 * f + 6) // 4) % 4)) * ([2, 1, 0, -1, -2, -1, 0, 1][(((4 * f + 6) % 8)) + 1]) + (1000 * (1 + ((doc_id % 100000) * 7919 // 4 + (4 * f + 6) // 4) % 4)) * ([1, 0, -1, 0, 1, 0, -1, 0][(((4 * f + 6) % 8)) + 1]) + (1000 * (1 + ((doc_id % 100000) * 7919 // 16 + (4 * f + 6) // 4) % 4)) * ([2, -1, 0, 1, -2, 1, 0, -1][(((4 * f + 6) % 8)) + 1])) + CASE WHEN doc_id >= 100000 AND 4 * f + 6 = 5 THEN 1 ELSE 0 END) / 32768.0) AS xv6,
         ((((1000 * (1 + ((doc_id % 100000) * 7919 // 1 + (4 * f + 7) // 4) % 4)) * ([2, 1, 0, -1, -2, -1, 0, 1][(((4 * f + 7) % 8)) + 1]) + (1000 * (1 + ((doc_id % 100000) * 7919 // 4 + (4 * f + 7) // 4) % 4)) * ([1, 0, -1, 0, 1, 0, -1, 0][(((4 * f + 7) % 8)) + 1]) + (1000 * (1 + ((doc_id % 100000) * 7919 // 16 + (4 * f + 7) // 4) % 4)) * ([2, -1, 0, 1, -2, 1, 0, -1][(((4 * f + 7) % 8)) + 1])) + CASE WHEN doc_id >= 100000 AND 4 * f + 7 = 5 THEN 1 ELSE 0 END) / 32768.0) AS xv7
  FROM docs, LATERAL (SELECT unnest(range(0, 7)) AS f) f
), raw AS (
  SELECT doc_id, f, k.k,
         CASE WHEN k = 0 THEN ((((((((0.0 + xv0 * 1.0) + xv1 * 1.0) + xv2 * 1.0) + xv3 * 1.0) + xv4 * 1.0) + xv5 * 1.0) + xv6 * 1.0) + xv7 * 1.0) WHEN k = 1 THEN ((((((((0.0 + xv0 * 1.0) + xv1 * SQRT(0.5)) + xv2 * 0.0) + xv3 * (-SQRT(0.5))) + xv4 * (-1.0)) + xv5 * (-SQRT(0.5))) + xv6 * 0.0) + xv7 * SQRT(0.5)) WHEN k = 2 THEN ((((((((0.0 + xv0 * 1.0) + xv1 * 0.0) + xv2 * (-1.0)) + xv3 * 0.0) + xv4 * 1.0) + xv5 * 0.0) + xv6 * (-1.0)) + xv7 * 0.0) WHEN k = 3 THEN ((((((((0.0 + xv0 * 1.0) + xv1 * (-SQRT(0.5))) + xv2 * 0.0) + xv3 * SQRT(0.5)) + xv4 * (-1.0)) + xv5 * SQRT(0.5)) + xv6 * 0.0) + xv7 * (-SQRT(0.5))) WHEN k = 4 THEN ((((((((0.0 + xv0 * 1.0) + xv1 * (-1.0)) + xv2 * 1.0) + xv3 * (-1.0)) + xv4 * 1.0) + xv5 * (-1.0)) + xv6 * 1.0) + xv7 * (-1.0)) END AS re_raw,
         CASE WHEN k = 0 THEN ((((((((0.0 - xv0 * 0.0) - xv1 * 0.0) - xv2 * 0.0) - xv3 * 0.0) - xv4 * 0.0) - xv5 * 0.0) - xv6 * 0.0) - xv7 * 0.0) WHEN k = 1 THEN ((((((((0.0 - xv0 * 0.0) - xv1 * SQRT(0.5)) - xv2 * 1.0) - xv3 * SQRT(0.5)) - xv4 * 0.0) - xv5 * (-SQRT(0.5))) - xv6 * (-1.0)) - xv7 * (-SQRT(0.5))) WHEN k = 2 THEN ((((((((0.0 - xv0 * 0.0) - xv1 * 1.0) - xv2 * 0.0) - xv3 * (-1.0)) - xv4 * 0.0) - xv5 * 1.0) - xv6 * 0.0) - xv7 * (-1.0)) WHEN k = 3 THEN ((((((((0.0 - xv0 * 0.0) - xv1 * SQRT(0.5)) - xv2 * (-1.0)) - xv3 * SQRT(0.5)) - xv4 * 0.0) - xv5 * (-SQRT(0.5))) - xv6 * 1.0) - xv7 * (-SQRT(0.5))) WHEN k = 4 THEN ((((((((0.0 - xv0 * 0.0) - xv1 * 0.0) - xv2 * 0.0) - xv3 * 0.0) - xv4 * 0.0) - xv5 * 0.0) - xv6 * 0.0) - xv7 * 0.0) END AS im_raw
  FROM px, LATERAL (SELECT unnest(range(0, 5)) AS k) k
), pw AS (
  SELECT doc_id, f, k, re_raw * re_raw + im_raw * im_raw AS p
  FROM raw
), bits AS (
  SELECT a.doc_id, a.f, a.k,
         CASE WHEN a.p > b.p
              THEN CAST(1 AS BIGINT) << CAST(a.f * 3 + (a.k - 1) AS INTEGER)
              ELSE 0 END AS bit
  FROM pw a JOIN pw b
    ON a.doc_id = b.doc_id AND a.f = b.f AND b.k = a.k + 1
  WHERE a.k BETWEEN 1 AND 3
), hashes AS (
  SELECT doc_id, CAST(SUM(bit) AS BIGINT) AS ahash FROM bits GROUP BY doc_id
), buckets AS (
  SELECT ahash, CAST(COUNT(*) AS BIGINT) AS n_bucket FROM hashes GROUP BY ahash
)
SELECT h.doc_id, h.ahash, b.n_bucket
FROM hashes h JOIN buckets b USING (ahash)
"""
