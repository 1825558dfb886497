"""Oracle SQL, part 5/6 (file-order split from the single-file
oracles.py in round 3 — same entries, same insertion order)."""

from __future__ import annotations


from fortune_500_financial_insights_pipeline_spark.oracles._core import (  # noqa: F401
    ORACLES,
    _LLR_BOUND,
    _LLR_NO,
    _LLR_YES,
    _SCORED_LABELED_CTE,
    _dsum,
)


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
