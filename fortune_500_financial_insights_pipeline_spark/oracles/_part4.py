"""Oracle SQL, part 4/6 (file-order split from the single-file
oracles.py in round 3 — same entries, same insertion order)."""

from __future__ import annotations


from fortune_500_financial_insights_pipeline_spark.oracles._core import (  # noqa: F401
    ORACLES,
    _ISO_COMPS,
    _ISO_MEANSQ,
    _SCORED_LABELED_CTE,
    _als_iter_sql,
    _dsum,
    _hits_iter_sql,
    _logreg_iter_sql,
    _markov_iter_sql,
    _ppr_oracle,
)


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
SELECT o_custkey, CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS amount_k,
       COUNT(*) AS n_orders,
       CAST(MIN(o_orderkey) AS BIGINT) AS first_orderkey,
       CAST(MAX(o_orderkey) AS BIGINT) AS last_orderkey
FROM orders
GROUP BY o_custkey, CAST(FLOOR(o_totalprice / 1000) AS BIGINT)
HAVING COUNT(*) >= 2
ORDER BY o_custkey, amount_k
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
