"""Relational core: aggregations, scans/projections, joins, sets, windows, sort/top-k, dedup, pivot (SURVEY §2.1-2.8).

Split from the single-file registry in round 3 — same functions, same
registration order, registered into the shared QUERIES dict on import."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.catalog import load_table
from fortune_500_financial_insights_pipeline_spark.functions.deterministic import davg, dsum, dsum_w

from fortune_500_financial_insights_pipeline_spark.queries._core import (  # noqa: F401
    q,
)


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.4)
# ---------------------------------------------------------------------------


@q("q_groupby_agg")
def q_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship TPC-H-Q1-style pricing summary: scan → filter → hash agg → sort.

    The filter and the two grouping columns push down to the parquet scan;
    the aggregate runs partial (map-side) then final after a 2-column shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )

@q("q_count_distinct")
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.count("*").alias("n_orders"),
    )

@q("q_rollup")
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy rollup region→nation with subtotals + grand total (A4)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(F.count("*").alias("n_cust"))

# ---------------------------------------------------------------------------
# Scans / projections / filters / scalar transforms (SURVEY §2.1, §2.2, §2.8)
# ---------------------------------------------------------------------------


@q("q_csv_scan")
def q_csv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan+filter+project (S1/S9 analog): predicate & columns push to parquet."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_quantity") > 45).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        # date cast exercised, then formatted to string: DATE-typed output
        # columns pandas-convert differently in Spark (datetime.date) vs
        # DuckDB (datetime64), which would break the driver's value-hash
        F.date_format(F.col("l_shipdate").cast("date"), "yyyy-MM-dd").alias("ship_date"),
    )

@q("q_project_cast")
def q_project_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed projection with aliases (P1/P2/P6, raw_to_landing_sparkjob.py:92-104)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        # decimal cast exercised, then back to double: decimal-typed output
        # columns pandas-convert differently in Spark (Decimal) vs DuckDB
        # (float64), which would break the driver's value-hash
        F.col("o_totalprice").cast("decimal(20,2)").cast("double").alias("price_dec"),
        F.floor("o_totalprice").cast("bigint").alias("price_floor"),
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd").alias("order_date"),
        F.upper("o_orderstatus").alias("status_up"),
    )

@q("q_filter_notnull")
def q_filter_notnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invalid-date quarantine (P4, raw_to_landing_sparkjob.py:35-37): parse a
    string date (10% synthetically corrupted), null on failure, filter nulls."""
    o = load_table(spark, sf_dir, "orders")
    ds = F.when(F.col("o_orderkey") % 10 == 0, F.lit("not-a-date")).otherwise(
        F.date_format("o_orderdate", "yyyy-MM-dd")
    )
    return (
        o.withColumn("parsed_date", F.to_date(ds, "yyyy-MM-dd"))
        .filter(F.col("parsed_date").isNotNull())
        .select("o_orderkey", F.date_format("parsed_date", "yyyy-MM-dd").alias("parsed_date"))
    )

@q("q_regex_clean")
def q_regex_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """De-comma numeric cleanup (P7, raw_to_landing_sparkjob.py:47):
    format with grouping separators, strip them, cast back."""
    o = load_table(spark, sf_dir, "orders")
    grouped = F.format_number(F.col("o_orderkey").cast("bigint"), 0)
    return o.select(
        "o_orderkey",
        grouped.alias("grouped_str"),
        F.regexp_replace(grouped, ",", "").cast("bigint").alias("cleaned"),
    )

@q("q_date_extract")
def q_date_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date parse/extract (P10): year/month/quarter + month truncation rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.year("l_shipdate").alias("ship_year"),
            F.month("l_shipdate").alias("ship_month"),
            F.quarter("l_shipdate").alias("ship_quarter"),
            F.date_trunc("month", "l_shipdate").alias("ship_month_start"),
        )
        .groupBy("ship_year", "ship_month", "ship_quarter", "ship_month_start")
        .agg(F.count("*").alias("n_rows"))
    )

@q("q_string_funcs")
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String surface (P11/P12): case, substring, pad, concat, path basename."""
    p = load_table(spark, sf_dir, "part")
    path = F.concat(F.lit("catalog/"), F.col("p_brand"), F.lit("/"), F.col("p_partkey").cast("string"))
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_up"),
        F.lower("p_brand").alias("brand_lo"),
        F.substring("p_name", 1, 3).alias("name_pfx"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("key_pad"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract(path, r"([^/]+)$", 1).alias("path_base"),
    )

@q("q_string_advanced")
def q_string_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended string surface: translate, initcap, reverse, repeat,
    edit distance, position."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.translate("p_brand", "#", "-").alias("brand_tr"),
        F.initcap(F.lower("p_name")).alias("name_title"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat(F.substring("p_brand", 1, 2), 2).alias("b2x2"),
        F.levenshtein("p_brand", F.lit("Brand#11")).alias("lev_b11"),
        F.instr("p_type", "BRASS").alias("brass_at"),
    )

@q("q_null_semantics")
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null semantics: null-safe equality (<=>), nvl2, null-aware counts.
    A synthetic null every 7th row exercises the three-valued logic."""
    o = load_table(spark, sf_dir, "orders")
    v = F.when(F.col("o_orderkey") % 7 == 0, None).otherwise(F.col("o_custkey"))
    w = F.when(F.col("o_orderkey") % 3 == 0, None).otherwise(F.col("o_custkey"))
    plain = v == w
    return o.select(
        "o_orderkey",
        v.eqNullSafe(w).cast("int").alias("nullsafe_eq"),
        # three-valued logic encoded as int (-1 = NULL): a nullable boolean
        # column pandas-converts as None in Spark but NaN in DuckDB,
        # breaking the value hash
        F.when(plain.isNull(), -1).otherwise(plain.cast("int")).alias("plain_eq"),
        F.nvl2(v, F.lit("present"), F.lit("absent")).alias("presence"),
        F.coalesce(v, w, F.lit(-1)).alias("first_known"),
    )

@q("q_bitwise")
def q_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise surface: and/or/xor, shifts, bit_count."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("and255"),
        k.bitwiseOR(F.lit(8)).alias("or8"),
        k.bitwiseXOR(F.lit(170)).alias("xor170"),
        F.shiftleft(k, 2).alias("shl2"),
        F.shiftright(k, 3).alias("shr3"),
        F.bit_count(k).alias("popcount"),
    )

@q("q_gaps_islands")
def q_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization (the lag+cumsum idiom): consecutive
    events of one user closer than 30 minutes form a session; pure window
    composition — the same semantics session_window gives natively
    (q_events_session), expressed relationally so any engine can check it."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ts_s = F.col("ts").cast("timestamp").cast("long")
    gap = ts_s - F.lag(ts_s).over(w)
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess_id = F.sum(new_sess).over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
    return (
        e.withColumn("sess_id", sess_id)
        .groupBy("user_id", "sess_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
        )
    )

@q("q_isin_filter")
def q_isin_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row membership filter (P13, transform_job_tabular_entitities.py:19)."""
    c = load_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")).select(
        "c_custkey", "c_name", "c_mktsegment"
    )

@q("q_math_round")
def q_math_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math surface: abs/sqrt/pow/log with integer-exact or rounded outputs."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.abs(F.col("o_orderkey") % 7 - 3).alias("abs_mod"),
        F.pow(F.col("o_orderkey") % 5, 2).cast("bigint").alias("pow_sq"),
        F.round(F.sqrt(F.col("o_orderkey").cast("double")), 6).alias("sqrt_r6"),
        F.round(F.log(F.col("o_orderkey").cast("double") + 1.0), 6).alias("ln_r6"),
    )

@q("q_json_parse")
def q_json_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat JSON field extraction (P17): events.props is a JSON string."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.withColumn("k", k)
        .groupBy("k")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
    )

@q("q_json_nested")
def q_json_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested JSON path extraction (P18,
    transform_and_copy_to_landing_sustainability.py:68-83): build a 2-level
    document from props and pull a dotted path out with a default."""
    e = load_table(spark, sf_dir, "events")
    nested = F.concat(
        F.lit('{"outer": {"inner": '),
        F.coalesce(F.get_json_object("props", "$.k"), F.lit("null")),
        F.lit(', "tag": "'),
        F.col("event_type"),
        F.lit('"}}'),
    )
    return e.select(
        "event_id",
        F.coalesce(F.get_json_object(nested, "$.outer.inner").cast("int"), F.lit(-1)).alias(
            "inner_val"
        ),
        F.get_json_object(nested, "$.outer.tag").alias("tag"),
        F.coalesce(F.get_json_object(nested, "$.outer.missing"), F.lit("")).alias("missing_dflt"),
    )

@q("q_skip_rows")
def q_skip_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-first-N-rows (P8) done scalably: the reference forces every row
    into ONE partition via row_number over Window.orderBy(lit(1))
    (raw_to_landing_sparkjob.py:85-89). With a total order key we instead
    take the Nth smallest key (TakeOrdered, driver gets N rows) and filter —
    fully parallel, no global shuffle."""
    from fortune_500_financial_insights_pipeline_spark.operators.skip_rows import skip_rows

    e = load_table(spark, sf_dir, "events")
    return skip_rows(e, order_col="event_id", n=4).select("event_id", "ts", "event_type")

# ---------------------------------------------------------------------------
# Joins (SURVEY §2.3)
# ---------------------------------------------------------------------------


@q("q_join_inner")
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("revenue"))
    )

@q("q_join_broadcast")
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast the small filtered dim (J2) — no shuffle of the fact side."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") > 40)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "inner")
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_items"), dsum("l_quantity").alias("sum_qty"))
    )

@q("q_join_left")
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer (J3): customers keep a row even with zero orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"), dsum("o_totalprice").alias("spend"))
    )

@q("q_join_semi")
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi (J4): customers having at least one URGENT order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )

@q("q_join_anti")
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti (J4): customers with no 1995 orders — the date window
    keeps the result non-empty at every SF (every customer has SOME
    order in the generator, so the unwindowed anti-join certified only
    the empty set; r7 verdict item 3)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("date"))
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )

# ---------------------------------------------------------------------------
# Set operations (SURVEY §2.7)
# ---------------------------------------------------------------------------


@q("q_union")
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-all by name with a source tag — the Kaggle∪API pattern
    (raw_to_landing_sparkjob.py:131-134, duplicates preserved)."""
    o = load_table(spark, sf_dir, "orders")
    high = o.filter(F.col("o_totalprice") > 400000).select(
        "o_orderkey", F.lit("high_value").alias("src")
    )
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", F.lit("urgent").alias("src")
    )
    return high.unionByName(urgent)

@q("q_union_drift")
def q_union_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift union (U3, allowMissingColumns — the pandas-concat
    semantics the statements job relies on): columns absent from one side
    materialize as nulls."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", "o_totalprice", F.lit("A").alias("src")
    )
    b = o.filter(F.col("o_orderkey") % 3 == 1).select(
        "o_orderkey", "o_orderpriority", F.lit("B").alias("src")
    )
    return a.unionByName(b, allowMissingColumns=True)

@q("q_intersect")
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    f_cust = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o_cust = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f_cust.intersect(o_cust)

@q("q_except")
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (U4): customers minus those with a finished ('F') order —
    the status filter keeps the result non-empty at every SF (customers
    minus ALL order-holders was the empty set; r7 verdict item 3)."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.exceptAll(o.distinct()).distinct()

# ---------------------------------------------------------------------------
# Windows (SURVEY §2.5) — every ordering includes a unique tiebreaker so the
# result is deterministic across engines.
# ---------------------------------------------------------------------------


@q("q_window_rank")
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .withColumn("rk", F.rank().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn", "rk")
    )

@q("q_window_lag")
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag/delta per supplier (W3: the daily-returns pattern)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_suppkey").orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    prev = F.lag("l_quantity", 1).over(w)
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        prev.alias("prev_qty"),
        (F.col("l_quantity") - prev).alias("qty_delta"),
    )

@q("q_window_moving_avg")
def q_window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row moving average of order value per customer (W4)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-6, W.currentRow)
    )
    mov = dsum_w("o_totalprice", w) / F.count("*").over(w)
    return o.select("o_custkey", "o_orderkey", mov.alias("mov_avg7"))

@q("q_window_cumsum")
def q_window_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running cumulative quantity per supplier (W5)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        dsum_w("l_quantity", w).alias("cum_qty"),
    )

# ---------------------------------------------------------------------------
# Sort / top-k (SURVEY §2.6)
# ---------------------------------------------------------------------------


@q("q_topk")
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderBy+limit → Catalyst TakeOrderedAndProject (no global sort)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )

# ---------------------------------------------------------------------------
# Dedup (SURVEY §2.7 / §2.11)
# ---------------------------------------------------------------------------


@q("q_dedup_keep_latest")
def q_dedup_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest dedup the DDL intends (UNIQUE(Ticker,Date), code/sql/DDLs:14):
    one row per (user_id, event_type), latest by (ts, event_id)."""
    from fortune_500_financial_insights_pipeline_spark.operators.dedup import keep_latest

    e = load_table(spark, sf_dir, "events")
    return keep_latest(
        e, keys=["user_id", "event_type"], order_cols=["ts", "event_id"]
    ).select("event_id", "user_id", "event_type", "ts", "value")

# ---------------------------------------------------------------------------
# Pivot / reshape (SURVEY §2.2 P15)
# ---------------------------------------------------------------------------


@q("q_pivot")
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statement-transpose analog (transform_job_tabular_entitities.py:21-24)
    done as a distributed grouped pivot with pinned values."""
    from fortune_500_financial_insights_pipeline_spark.operators.pivot import pivot_wide

    li = load_table(spark, sf_dir, "lineitem")
    return pivot_wide(
        li,
        group_cols=["l_returnflag"],
        pivot_col="l_linestatus",
        values=["O", "F"],
        agg=dsum("l_quantity"),
        prefix="qty_",
    )

@q("q_unpivot")
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt (inverse of P15) via the native unpivot operator."""
    from fortune_500_financial_insights_pipeline_spark.operators.pivot import unpivot

    c = load_table(spark, sf_dir, "customer")
    wide = c.select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey_d"),
    )
    return unpivot(
        wide, id_cols=["c_custkey"], value_cols=["acctbal", "nationkey_d"],
        var_name="metric", value_name="metric_value",
    )
