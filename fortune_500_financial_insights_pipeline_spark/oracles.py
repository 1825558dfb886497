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
       CAST(l_shipdate AS DATE) AS ship_date
FROM lineitem
WHERE l_quantity > 45
"""

ORACLES["q_project_cast"] = """
SELECT o_orderkey,
       CAST(CAST(o_totalprice AS DECIMAL(20,2)) AS DOUBLE) AS price_dec,
       CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
       CAST(o_orderdate AS DATE) AS order_date,
       UPPER(o_orderstatus) AS status_up
FROM orders
"""

ORACLES["q_filter_notnull"] = """
SELECT o_orderkey, parsed_date
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
