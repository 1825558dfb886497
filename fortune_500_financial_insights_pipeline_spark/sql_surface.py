"""SQL text surface: analytical queries served as plain SQL over the
registered views (the interface the reference delegates to BigQuery/Tableau,
SURVEY.md §3 — here ``spark.sql`` IS the warehouse).

Every statement is written in the dialect subset Spark SQL and DuckDB share,
so the same text runs on both engines verbatim — the strongest possible
oracle (zero translation step to hide a semantics bug). Floating-point
aggregates use the fixed-point interior (functions/deterministic.py) inline;
COUNT/SUM-of-int results are cast to BIGINT because DuckDB widens to HUGEINT
where Spark stays at long.
"""

from __future__ import annotations

DSUM = "(CAST(SUM(CAST(ROUND(({e}) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000)"


def _dsum(e: str) -> str:
    return DSUM.format(e=e)


REVENUE = _dsum("l_extendedprice * (1 - l_discount)")

SHARED_SQL: dict[str, str] = {
    # TPC-H Q3 shape: 3-way join, date-band filters on both sides, grouped
    # revenue, top-10. The o_orderkey group is high-cardinality — partial
    # aggregation + top-k keep the shuffle narrow.
    "q_sql_tpch_q3": f"""
SELECT o_orderkey, {REVENUE} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-03-15'
  AND l_shipdate > TIMESTAMP '1997-03-15'
GROUP BY o_orderkey
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
    # TPC-H Q5 shape: 6-way snowflake join (fact + 5 dims) with a region
    # filter that prunes through two dim hops; Catalyst/AQE broadcast the
    # small sides and reorder the join tree.
    "q_sql_tpch_q5": f"""
SELECT n_name, {REVENUE} AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1994-01-01'
  AND o_orderdate < TIMESTAMP '1996-01-01'
GROUP BY n_name
""",
    # correlated scalar subquery (decorrelated by Catalyst into an agg+join)
    "q_sql_scalar_subquery": f"""
SELECT c_custkey, c_acctbal
FROM customer c
WHERE c_acctbal > (
  SELECT {_dsum('c2.c_acctbal')} / COUNT(*)
  FROM customer c2
  WHERE c2.c_nationkey = c.c_nationkey
)
""",
    # correlated EXISTS (rewritten to a semi-join)
    "q_sql_exists": """
SELECT s_suppkey, s_name
FROM supplier s
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49
)
""",
    "q_sql_having": """
SELECT o_custkey, COUNT(*) AS n_orders
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 15
""",
    # conditional aggregation (the pivot-in-SQL idiom)
    "q_sql_case_agg": """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
       CAST(SUM(CASE WHEN l_quantity <= 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_small
FROM lineitem
GROUP BY l_returnflag
""",
    "q_sql_grouping_sets": """
SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n
FROM orders
JOIN customer ON o_custkey = c_custkey
GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority), ())
""",
    "q_sql_cube": """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
}
