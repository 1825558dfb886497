"""Oracle SQL, part 2/6 (file-order split from the single-file
oracles.py in round 3 — same entries, same insertion order)."""

from __future__ import annotations

from fortune_500_financial_insights_pipeline_spark.operators.sampling import _hex_threshold

from fortune_500_financial_insights_pipeline_spark.oracles._core import (  # noqa: F401
    ORACLES,
    _ACF_LAGS,
    _BF_CASE,
    _DAILY_ORDERS,
    _EWMA_DEN,
    _EWMA_NUM,
    _PROF_COL,
    _SG_ROWS,
    _Z_CUST,
    _Z_DAY,
    _dsum,
)


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
SELECT strftime(i.d, '%Y-%m-%d') AS d, i.v AS value,
       CAST(i.ts AS DOUBLE) / 7 AS trend,
       CAST(s.sc6p AS DOUBLE) / (7 * 1000000.0) AS seasonal,
       CAST(i.v AS DOUBLE) - CAST(i.ts AS DOUBLE) / 7
         - CAST(s.sc6p AS DOUBLE) / (7 * 1000000.0) AS residual
FROM interior i JOIN seas_c s USING (ph)
"""

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
SELECT strftime(d, '%Y-%m-%d') AS d, cusum
FROM cus ORDER BY ABS(cusum) DESC, d ASC LIMIT 5
"""

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
