"""Fixture query registry: one PySpark callable per operator from SURVEY.md §2.

Each callable takes ``(spark, sf_dir)`` and returns a DataFrame. Every
computed column is aliased to the exact name the matching oracle SQL uses
(fortune_500_financial_insights_pipeline_spark/oracles.py) so the driver's column-sorted value-hash
lines up. Floating-point aggregates use the exact-decimal interior from
functions/deterministic.py so results are bit-identical to the single-threaded
DuckDB oracle regardless of partitioning.

Reference parity notes cite /root/reference files as file:line.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.catalog import load_table
from fortune_500_financial_insights_pipeline_spark.functions.deterministic import davg, dsum, dsum_w

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}


def q(name: str):
    def deco(fn):
        QUERIES[name] = fn
        return fn

    return deco


# Deterministic trained-artifact memo. kmeans/PQ training is
# bit-deterministic given (table, params) — the same fixture tables
# re-yield the identical centroids/codebooks on every call — so the five
# ANN-family keys retraining the same quantizer inside one process only
# re-pay identical Spark jobs. Values are plain Python lists/dicts (no
# Spark handles, so they survive session restarts); keyed by
# (artifact, sf_dir, params). A driver that imports a fresh process per
# query sees a cold memo and simply retrains — results are identical
# either way. Production analogue: an ANN index is trained once at build
# time and shared by every query, not retrained per request.
_TRAINED_MEMO: dict[tuple, object] = {}


def _memo_trained(key: tuple, build: Callable[[], object]):
    if key not in _TRAINED_MEMO:
        _TRAINED_MEMO[key] = build()
    return _TRAINED_MEMO[key]


def _qvec_probe(emb: DataFrame, centroids, n_probe: int = 2):
    """(query vector, probed cells) for vec_id=0 in ONE head() job —
    routing through the same Spark round-6 expression the oracle mirrors
    (python round() is banker's — not a safe stand-in)."""
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import probe_cells_col

    row = (
        emb.filter(F.col("vec_id") == 0)
        .select(
            "embedding",
            probe_cells_col("embedding", centroids, n_probe).alias("p"),
        )
        .head()
    )
    return list(row["embedding"]), list(row["p"])


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
    """Left-anti (J4): customers with no orders at all."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
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
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
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


# ---------------------------------------------------------------------------
# As-of join (SURVEY §2.3 J5)
# ---------------------------------------------------------------------------


@q("q_asof_lastval")
def q_asof_lastval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase event: the most recent click value by the same user
    at or before the purchase (trade-date → most-recent-statement pattern)."""
    from fortune_500_financial_insights_pipeline_spark.operators.asof import asof_join

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.col("value").alias("click_value")
    )
    return asof_join(
        purchases,
        clicks,
        on=["user_id"],
        ts_col="ts",
        value_cols=["click_value"],
        tiebreak_col="event_id",
    ).select("event_id", "user_id", "ts", "value", "click_value_asof")


# ---------------------------------------------------------------------------
# Event-time windows (SURVEY §2.10) — batch forms; streaming mirrors in
# streaming/events.py are covered by tests/test_streaming.py
# ---------------------------------------------------------------------------


@q("q_funnel")
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel: per user, first click → first purchase at-or-after
    it, with latency — the event-sequence composition (conditional min over
    a self-correlated window, no UDF)."""
    e = load_table(spark, sf_dir, "events")
    first_click = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click_ts"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    conv = (
        first_click.join(purchases, "user_id", "left")
        .filter(F.col("p_ts").isNull() | (F.col("p_ts") >= F.col("first_click_ts")))
        .groupBy("user_id", "first_click_ts")
        .agg(F.min("p_ts").alias("first_purchase_ts"))
    )
    return conv.select(
        "user_id",
        F.date_format("first_click_ts", "yyyy-MM-dd HH:mm:ss").alias("first_click"),
        F.date_format("first_purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("first_purchase"),
        F.when(
            F.col("first_purchase_ts").isNotNull(),
            F.col("first_purchase_ts").cast("timestamp").cast("long")
            - F.col("first_click_ts").cast("timestamp").cast("long"),
        ).alias("latency_s"),
    )


@q("q_histogram")
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order values: bucket = floor(v/width), the
    distribution profile every data-quality dashboard needs — one scan,
    one narrow groupBy."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50000).cast("int")
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


@q("q_events_tumbling")
def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fortune_500_financial_insights_pipeline_spark.streaming.events import tumbling

    return tumbling(load_table(spark, sf_dir, "events"))


@q("q_events_sliding")
def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fortune_500_financial_insights_pipeline_spark.streaming.events import sliding

    return sliding(load_table(spark, sf_dir, "events"))


@q("q_events_session")
def q_events_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fortune_500_financial_insights_pipeline_spark.streaming.events import session

    return session(load_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# UDF surface (SURVEY §2.9): Arrow-vectorized grouped transform
# ---------------------------------------------------------------------------


@q("q_pandas_udf_zscore")
def q_pandas_udf_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group zscore via applyInPandas (the escape hatch for whole-group
    logic built-ins can't express; rounded so the vectorized float math
    matches the oracle's window formulation)."""
    import pandas as pd

    e = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mean = pdf["value"].mean()
        std = pdf["value"].std(ddof=0)
        pdf["zscore"] = ((pdf["value"] - mean) / std).round(6)
        return pdf

    return e.groupBy("event_type").applyInPandas(
        zscore, schema="event_id long, event_type string, value double, zscore double"
    )


@q("q_pandas_scalar_udf")
def q_pandas_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Arrow-vectorized pandas_udf (§2.9): batch-at-a-time string
    normalization. Oracle-checkable because the semantics are plain SQL —
    the fixture proves the UDF transport, not exotic logic."""
    from fortune_500_financial_insights_pipeline_spark.functions.udfs import norm_name

    c = load_table(spark, sf_dir, "customer")
    return c.select("c_custkey", norm_name("c_name").alias("name_norm"))


@q("q_pandas_grouped_agg_udf")
def q_pandas_grouped_agg_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas_udf (§2.9): volume-weighted mean price per
    market segment — one Arrow batch per group side, partial-agg free but
    vectorized; rounded for float-order tolerance."""
    from fortune_500_financial_insights_pipeline_spark.functions.udfs import wmean

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey)
    weight = (F.col("o_orderkey") % 5 + 1).cast("double")
    return j.groupBy("c_mktsegment").agg(
        wmean(F.col("o_totalprice"), weight).alias("wmean_price")
    )


@q("q_higher_order")
def q_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions (§2.8): transform/filter/aggregate over
    the embedding vectors — squared-l2, positive-component count, clipped
    mean — all JVM-side lambdas, no UDF."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.round(
            F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x), 6
        ).alias("sq_l2"),
        F.size(F.filter(v, lambda x: x > 0)).alias("n_pos"),
        F.round(
            F.aggregate(
                F.transform(v, lambda x: F.least(F.greatest(x, F.lit(-0.5)), F.lit(0.5))),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.size(v),
            6,
        ).alias("clipped_mean"),
    )


@q("q_percentile")
def q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentile per group (approx twin: q_approx_distinct)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
    )


@q("q_approx_distinct")
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct (A3). No oracle: DuckDB's HLL yields a
    different estimate by construction — the driver records rows-only; the
    exact twin q_count_distinct carries the value check."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
    )


# ---------------------------------------------------------------------------
# Arrays / vectors (SURVEY §2.8, §2.11)
# ---------------------------------------------------------------------------


@q("q_array_explode")
def q_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select("label", F.explode("embedding").alias("component"))
    return ex.groupBy("label").agg(
        F.count("*").alias("n_vals"),
        F.min(F.col("component").cast("double")).alias("min_val"),
        F.max(F.col("component").cast("double")).alias("max_val"),
    )


@q("q_array_pos")
def q_array_pos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (posexplode ↔ UNNEST WITH ORDINALITY)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") < 50).select(
        "vec_id", F.posexplode("embedding").alias("pos", "component")
    ).select("vec_id", "pos", F.col("component").cast("double").alias("component"))


@q("q_conditional")
def q_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional scalar surface: CASE, coalesce, nullif, greatest, least."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("size_band"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("open")).alias("status_x"),
        F.greatest(F.col("o_orderkey") % 7, F.col("o_orderkey") % 5).alias("g75"),
        F.least(F.col("o_orderkey") % 7, F.col("o_orderkey") % 5).alias("l75"),
    )


@q("q_date_arith")
def q_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic (§2.8): day offsets, month adds, day diffs, last_day,
    weekday extraction — outputs as strings/ints for engine-portable hashing."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("plus30d"),
        F.date_format(F.add_months(d, 2), "yyyy-MM-dd").alias("plus2m"),
        F.datediff(F.lit("1999-01-01").cast("date"), d).alias("days_to_99"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.dayofweek(d).alias("dow"),
    )


@q("q_cosine_topk")
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k against the vec_id=0 embedding (ANN baseline;
    the LSH scale path is q_embed_neardup_lsh)."""
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return cosine_topk(emb.select("vec_id", "label", "embedding"), list(qvec), k=20)


@q("q_knn_join")
def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched k-NN similarity join: top-5 cosine neighbors for each of
    the first 10 vectors (self excluded), exact brute force."""
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import knn_join

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    return knn_join(emb.filter(F.col("vec_id") < 10), emb, k=5)


@q("q_knn_join_ivf")
def q_knn_join_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-routed batched k-NN (the registered scale shape round 1 lacked):
    corpus vectors bucketed into 4 md5-seeded centroid cells, each query
    probes its 2 nearest cells, per-query top-3 ranks only cell-sized
    candidate lists. md5 seeding + round-6 routing make the cell
    assignment oracle-reproducible, so this is hash-checked end to end
    (the approximation is in WHICH cells are scanned, mirrored exactly by
    the oracle — returned similarities are exact)."""
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import (
        knn_join_ivf,
        md5_sample_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    centroids = md5_sample_centroids(emb, k=4)
    return knn_join_ivf(
        emb.filter(F.col("vec_id") < 10), emb, centroids, k=3, n_probe=2
    )


@q("q_semdedup")
def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup (SemDeDup): md5-seeded 16-cell coarse quantizer, then
    drop every vector with a cosine>=0.4-similar lower-id neighbor in its
    cell (threshold tuned to the fixture's similarity range — real corpora
    use ~0.95). Kept representatives, hash-checked: md5 seeding + round-6
    routing make cell assignment AND the pairwise drop rule
    oracle-reproducible (operators/similarity.py semdedup)."""
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import (
        md5_sample_centroids,
        semdedup,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    centroids = md5_sample_centroids(emb, k=16)
    return semdedup(emb, centroids, threshold=0.4).select(
        "vec_id", "label", F.col("cell").cast("long").alias("cell")
    )


@q("q_ivf_topk")
def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k with a TRAINED coarse quantizer: two exact
    Lloyd iterations (operators/kmeans.py) tighten the cells before
    index+probe — fewer false candidates per probe than raw sampled seeds
    at the same n_probe. Oracle-exact since r2: routing uses the portable
    round-6 rule (ivf_index_portable / probe_cells_col) and the quantizer
    is the fixed-point Lloyd training q_kmeans already oracles, so the
    whole train→index→probe→score path is hash-checked; recall vs brute
    force additionally pinned by test_ivf_topk_recall_on_clustered_data."""
    from fortune_500_financial_insights_pipeline_spark.operators.kmeans import kmeans_centroids
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import (
        cosine_topk,
        ivf_index_portable,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    centroids = _memo_trained(
        ("kmeans8x2", sf_dir), lambda: kmeans_centroids(emb, k=8, n_iter=2)
    )
    indexed = ivf_index_portable(emb, centroids)
    qvec, probe = _memo_trained(
        ("q0probe8x2", sf_dir), lambda: _qvec_probe(emb, centroids)
    )
    return cosine_topk(
        indexed.filter(F.col("cell").isin(probe)).drop("cell"), qvec, k=20
    )


@q("q_quantized_topk")
def q_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8-quantized cosine top-k. Oracle-exact since r2: per-vector
    max-abs scale, HALF_UP rounding and the cosine fold are all portable
    double arithmetic (recall vs the exact twin additionally pinned by
    test_quantized_embeddings_preserve_neighbors)."""
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import (
        quantize_embeddings,
        quantized_cosine_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    qvec = list(emb.filter(F.col("vec_id") == 0).head().embedding)
    qstore = quantize_embeddings(emb).drop("embedding")
    return quantized_cosine_topk(qstore, qvec, k=20, id_cols=["vec_id", "label"])


@q("q_embed_neardup_lsh")
def q_embed_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate vectors via random-hyperplane LSH bucketing (rows-only:
    the bucketing is Spark-specific; exact-cosine verification filters the
    candidates)."""
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import lsh_neardup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").head()[0])
    return lsh_neardup_pairs(emb, dim=dim, n_planes=12, min_cosine=0.5)


# ---------------------------------------------------------------------------
# Text analysis (SURVEY §2.11)
# ---------------------------------------------------------------------------


@q("q_text_stats")
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fortune_500_financial_insights_pipeline_spark.operators import text as TX

    d = load_table(spark, sf_dir, "documents")
    return (
        d.withColumn("n_tokens", TX.token_count("text"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("n_tokens").alias("total_tokens"),
            (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
        )
    )


@q("q_token_count")
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fortune_500_financial_insights_pipeline_spark.operators import text as TX

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TX.token_count("text").alias("n_tokens"),
        TX.distinct_token_count("text").alias("n_distinct_tokens"),
        TX.bpe_token_count("text").alias("n_bpe_tokens"),
    )


@q("q_lang_id")
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fortune_500_financial_insights_pipeline_spark.operators import text as TX

    d = load_table(spark, sf_dir, "documents")
    score = TX.english_score("text")
    return d.select(
        "doc_id",
        "lang",
        F.round(score, 6).alias("en_ratio"),
        F.when(score >= 0.05, "en").otherwise("other").alias("pred_lang"),
    )


@q("q_quality_score")
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fortune_500_financial_insights_pipeline_spark.operators import text as TX

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", F.round(TX.quality_score("text"), 6).alias("quality"))


@q("q_fingerprint")
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fortune_500_financial_insights_pipeline_spark.operators import text as TX

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", TX.fingerprint("text").alias("fingerprint"))


@q("q_tfidf")
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (smoothed idf, rounded 6dp)."""
    from fortune_500_financial_insights_pipeline_spark.operators.tfidf import tfidf

    d = load_table(spark, sf_dir, "documents")
    return tfidf(d, top_k=3)


@q("q_mix_sources")
def q_mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted data mixture: split a 40%-of-corpus token budget across
    sources with weights 1/2/3 cycling over the sorted source names, keep
    each source's deterministic (md5-ordered) prefix that fits its budget
    (operators/sampling.py mix_sources). Per-source readout. The weight
    table is dim-sized driver traffic (one row per source — sources are
    datasets, not rows), same budget class as centroid lists."""
    from fortune_500_financial_insights_pipeline_spark.operators.sampling import mix_sources

    d = load_table(spark, sf_dir, "documents")
    sources = sorted(r[0] for r in d.select("source").distinct().collect())
    weights = {s: 1 + (i % 3) for i, s in enumerate(sources)}
    kept = mix_sources(d, weights, budget_fraction=0.4)
    return kept.groupBy("source").agg(
        F.count("*").alias("kept_docs"),
        F.sum("n_tokens").alias("kept_tokens"),
        F.max("budget").alias("budget"),
    )


@q("q_classifier_score")
def q_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-feature linear classifier forward pass over documents
    (operators/text.py classifier_score): 256 md5 buckets, fixed-point
    weights (b%21)*50-500 milli-units, prob = round(sigmoid(mean weight),
    6). Model inference as relational algebra — hash-checked end to end."""
    from fortune_500_financial_insights_pipeline_spark.operators.text import classifier_score

    d = load_table(spark, sf_dir, "documents")
    weights = spark.range(256).select(
        F.col("id").cast("int").alias("bucket"),
        ((F.col("id") % 21) * 50 - 500).cast("long").alias("w_fp"),
    )
    return classifier_score(d, weights)


@q("q_upsample_sources")
def q_upsample_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch upsampling readout: factors 1.0/1.5/2.5 cycling over sorted
    source names — full copies for floor(factor), one extra epoch for the
    md5-prefix fraction (operators/sampling.py upsample_sources). Emitted
    rows, distinct docs, and max epoch per source, hash-checked."""
    from fortune_500_financial_insights_pipeline_spark.operators.sampling import (
        upsample_sources,
    )

    d = load_table(spark, sf_dir, "documents")
    sources = sorted(r[0] for r in d.select("source").distinct().collect())
    factors = {s: [1.0, 1.5, 2.5][i % 3] for i, s in enumerate(sources)}
    up = upsample_sources(d, factors)
    return up.groupBy("source").agg(
        F.count("*").alias("emitted_rows"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.max("epoch").alias("max_epoch"),
    )


@q("q_bm25")
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 Okapi BM25 terms per document (k1=1.2, b=0.75, round 6dp) —
    the length-saturating retrieval weight next to q_tfidf's raw TF-IDF
    (operators/tfidf.py bm25)."""
    from fortune_500_financial_insights_pipeline_spark.operators.tfidf import bm25

    d = load_table(spark, sf_dir, "documents")
    return bm25(d, top_k=3)


@q("q_chunk_docs")
def q_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 32-token windows, step 24 — 1→N row expansion."""
    from fortune_500_financial_insights_pipeline_spark.operators.chunking import chunk_documents

    d = load_table(spark, sf_dir, "documents")
    return chunk_documents(d, chunk_tokens=32, overlap=8)


@q("q_dedup_exact")
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: min doc_id survives per normalized-text hash."""
    from fortune_500_financial_insights_pipeline_spark.operators.dedup import fingerprint_dedup

    d = load_table(spark, sf_dir, "documents")
    return fingerprint_dedup(d, text_col="text", id_col="doc_id").select(
        "doc_id", "fingerprint"
    )


@q("q_dup_spans")
def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact dedup: 8-word windows occurring in ≥2 distinct
    documents, per (doc, start position) — the boilerplate-inside-unique-
    documents detector doc-level fingerprint dedup misses. All post-
    explode work rides the md5 span key (operators/text.duplicated_spans);
    oracle mirrors the window construction verbatim."""
    from fortune_500_financial_insights_pipeline_spark.operators.text import duplicated_spans

    d = load_table(spark, sf_dir, "documents")
    return duplicated_spans(d, n=8)


@q("q_ngram_jaccard")
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-bigram Jaccard similarity of every doc against doc_id=0, top 20."""
    from fortune_500_financial_insights_pipeline_spark.operators import text as TX

    d = load_table(spark, sf_dir, "documents")
    grams = d.select("doc_id", TX.word_ngrams("text", 2).alias("grams"))
    ref = grams.filter(F.col("doc_id") == 0).select(F.col("grams").alias("ref_grams"))
    return (
        grams.crossJoin(F.broadcast(ref))
        .filter(F.col("doc_id") != 0)
        .select("doc_id", F.round(TX.jaccard(F.col("grams"), F.col("ref_grams")), 6).alias("jac"))
        .orderBy(F.desc("jac"), F.asc("doc_id"))
        .limit(20)
    )


@q("q_minhash_neardup")
def q_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidate pairs (rows-only; Spark-specific
    hashing). See operators/minhash.py for the banding construction."""
    from fortune_500_financial_insights_pipeline_spark.operators.minhash import minhash_neardup_pairs

    d = load_table(spark, sf_dir, "documents")
    return minhash_neardup_pairs(
        d, id_col="doc_id", text_col="text", n_hashes=16, bands=4, min_jaccard=0.2
    )


@q("q_dedup_clusters")
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-level near-dup dedup: minhash candidate pairs → connected
    components (iterative min-label propagation) → one canonical doc per
    duplicate cluster (rows-only: iterative algorithm, no SQL oracle;
    closure semantics pinned by test_cluster_dedup_transitive)."""
    from fortune_500_financial_insights_pipeline_spark.operators.graph import cluster_dedup
    from fortune_500_financial_insights_pipeline_spark.operators.minhash import minhash_neardup_pairs

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_neardup_pairs(
        d, id_col="doc_id", text_col="text", n_hashes=16, bands=4, min_jaccard=0.2
    )
    return cluster_dedup(d, pairs, "doc_id").select("doc_id", "lang", "n_chars")


@q("q_jaccard_clusters")
def q_jaccard_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-level dedup with a FULL oracle: exact bigram-Jaccard pairs
    (deterministic set math, unlike minhash's engine-specific hashing) →
    connected components → min-id survivor per cluster. The DuckDB oracle
    reproduces the closure with a recursive CTE, so the iterative
    min-label loop is value-checked end-to-end, transitivity included.
    Pair generation is the prefix-filtered set-similarity join
    (operators/setjoin.py — AllPairs/PPJoin candidates from an equi-join
    on rare prefix tokens, identical output to the O(n²) scan); minhash
    LSH banding (q_minhash_neardup) remains the probabilistic path when
    even exact candidates are too many."""
    from fortune_500_financial_insights_pipeline_spark.operators import text as TX
    from fortune_500_financial_insights_pipeline_spark.operators.graph import cluster_dedup
    from fortune_500_financial_insights_pipeline_spark.operators.setjoin import jaccard_pairs_exact

    d = load_table(spark, sf_dir, "documents")
    grams = d.select("doc_id", TX.word_ngrams("text", 2).alias("grams"))
    pairs = jaccard_pairs_exact(grams, "doc_id", "grams", 0.8)
    return cluster_dedup(d, pairs, "doc_id").select("doc_id")


@q("q_simhash")
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash fingerprints (rows-only; xxhash64 is Spark-specific)."""
    from fortune_500_financial_insights_pipeline_spark.operators.minhash import simhash

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", simhash("text").alias("simhash64"))


# ---------------------------------------------------------------------------
# Multimodal plumbing (SURVEY §2.11): binary columns + typed metadata
# ---------------------------------------------------------------------------


@q("q_stats_corr")
def q_stats_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregation surface: Pearson correlation, sample
    covariance, sample stddev per group (the df.stat family as grouped
    aggregates)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("covar_qty_disc"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("std_price"),
    )


@q("q_window_lead_nth")
def q_window_lead_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-looking + positional window values: lead, first/last value in
    frame, nth_value (completes the W-family with the look-ahead side)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lead("o_orderkey", 1).over(w).alias("next_order"),
        F.first("o_orderkey").over(wf).alias("first_order"),
        F.last("o_orderkey").over(wf).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(wf).alias("second_order"),
    )


@q("q_regex_extract_all")
def q_regex_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-match regex extraction: every number in the part name+type,
    joined (array output stringified for engine-portable hashing)."""
    p = load_table(spark, sf_dir, "part")
    blob = F.concat_ws(" ", "p_name", "p_brand", "p_type")
    return p.select(
        "p_partkey",
        F.array_join(F.regexp_extract_all(blob, F.lit(r"\d+"), 0), ",").alias("numbers"),
        F.size(F.regexp_extract_all(blob, F.lit(r"[A-Z]{2,}"), 0)).alias("n_upper_words"),
    )


@q("q_map_ops")
def q_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: construct, access by key, keys/values
    (map internals stringified — map columns don't hash portably)."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    counts = n.groupBy("n_regionkey").agg(F.count("*").alias("n_nations"))
    m = F.map_from_arrays(
        F.array(F.lit("name"), F.lit("nations")),
        F.array(F.col("r_name"), F.col("n_nations").cast("string")),
    )
    return (
        r.join(counts, r.r_regionkey == counts.n_regionkey)
        .select("r_regionkey", m.alias("m"))
        .select(
            "r_regionkey",
            F.col("m")["name"].alias("region_name"),
            F.col("m")["nations"].cast("int").alias("n_nations"),
            F.array_join(F.map_keys("m"), ",").alias("keys"),
        )
    )


@q("q_window_range")
def q_window_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame (vs the row-count frames of W4/W5): per
    customer, count of orders in the trailing 30 *days* — however many rows
    that is. Ordering key is epoch-days so the range arithmetic is integer
    on both engines."""
    o = load_table(spark, sf_dir, "orders")
    days = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
    w = (
        W.partitionBy("o_custkey")
        .orderBy(days)
        .rangeBetween(-29, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.count("*").over(w).alias("n_last30d"),
        dsum_w("o_totalprice", w).alias("spend_last30d"),
    )


@q("q_approx_percentile")
def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based quantiles (rows-only: Spark's approx algorithm differs
    from DuckDB's by construction; the exact twin q_percentile carries the
    value check)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("p50_approx"),
        F.percentile_approx("l_extendedprice", 0.99, 1000).alias("p99_approx"),
    )


@q("q_window_ntile")
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: quartile bucket + percent_rank per
    market segment (W2 family)."""
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


@q("q_range_join")
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi band join (J6): price bands × parts. The literal band table
    broadcasts; the theta condition runs as BroadcastNestedLoopJoin — fine
    because one side is tiny (the only sane shape for theta joins at scale)."""
    p = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("low", 0.0, 930.0), ("mid", 930.0, 970.0), ("high", 970.0, 1e9)],
        "band string, lo double, hi double",
    )
    joined = p.join(
        F.broadcast(bands),
        (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
    )
    return joined.groupBy("band").agg(
        F.count("*").alias("n_parts"),
        davg("p_retailprice").alias("avg_price"),
    )


@q("q_first_last")
def q_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmin/argmax aggregation (A6): cheapest and priciest part per brand.
    min_by/max_by need a unique ordering key — p_partkey breaks price ties
    deterministically via a struct compare."""
    p = load_table(spark, sf_dir, "part")
    price_key = F.struct("p_retailprice", "p_partkey")
    return p.groupBy("p_brand").agg(
        F.min_by("p_partkey", price_key).alias("cheapest_part"),
        F.max_by("p_partkey", price_key).alias("priciest_part"),
        F.min("p_retailprice").alias("min_price"),
        F.max("p_retailprice").alias("max_price"),
    )


@q("q_date_spine")
def q_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated month spine left-joined to monthly order counts — the
    gaps-filled time series every reporting layer needs (sequence+explode;
    months with no orders keep a 0)."""
    o = load_table(spark, sf_dir, "orders")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1994-01-01").cast("date"),
                F.lit("1994-12-01").cast("date"),
                F.expr("interval 1 month"),
            )
        ).alias("month_start")
    ).select(F.date_format("month_start", "yyyy-MM-dd").alias("month"))
    monthly = (
        o.withColumn("month", F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd"))
        .groupBy("month")
        .agg(F.count("*").alias("n"))
    )
    return spine.join(monthly, "month", "left").select(
        "month", F.coalesce("n", F.lit(0)).alias("n_orders")
    )


@q("q_string_agg")
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: nation list per region (collect_list →
    array_sort → join; DuckDB twin is string_agg ORDER BY)."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"))
    )


# ---------------------------------------------------------------------------
# SQL text surface (sql_surface.py): the same SQL string runs verbatim on
# Spark (here) and DuckDB (oracle side) — spark.sql over registered views.
# ---------------------------------------------------------------------------


def _register_sql_surface() -> None:
    from fortune_500_financial_insights_pipeline_spark.catalog import register_views
    from fortune_500_financial_insights_pipeline_spark.sql_surface import SHARED_SQL

    for name, sql in SHARED_SQL.items():

        def run_sql(spark: SparkSession, sf_dir: str, _sql: str = sql) -> DataFrame:
            register_views(spark, sf_dir)
            return spark.sql(_sql)

        QUERIES[name] = run_sql


_register_sql_surface()


@q("q_decontaminate")
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing ≥3 distinct
    word-bigrams with a benchmark set (here: doc_id < 5 stands in for the
    eval set). Explode distinct grams on both sides; the join key is the
    gram, so contaminated docs surface without any pairwise compare —
    at scale the benchmark gram set is small and broadcasts."""
    from fortune_500_financial_insights_pipeline_spark.operators import text as TX

    d = load_table(spark, sf_dir, "documents")
    grams = d.select(
        "doc_id", F.explode(TX.word_ngrams("text", 2)).alias("gram")
    )
    bench = (
        grams.where(F.col("doc_id") < 5)
        .select(F.col("gram").alias("bgram"))
        .distinct()
    )
    return (
        grams.where(F.col("doc_id") >= 5)
        .join(F.broadcast(bench), F.col("gram") == F.col("bgram"))
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("shared_grams"))
        .where(F.col("shared_grams") >= 3)
    )


@q("q_finance_insights")
def q_finance_insights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's dashboard metrics (daily return, SMA, VWAP,
    cumulative return, drawdown — README.md:9-10's Tableau overlay) on a
    supplier-day price series derived from lineitem, exact fixed-point
    frame sums throughout (functions/finance.with_insights_exact)."""
    from fortune_500_financial_insights_pipeline_spark.functions.deterministic import davg, dsum
    from fortune_500_financial_insights_pipeline_spark.functions.finance import with_insights_exact

    li = load_table(spark, sf_dir, "lineitem")
    series = (
        li.groupBy(
            "l_suppkey",
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("day"),
        )
        .agg(
            davg("l_extendedprice").alias("close"),
            dsum("l_quantity").alias("volume"),
        )
    )
    return with_insights_exact(
        series,
        ticker_col="l_suppkey",
        date_col="day",
        close_col="close",
        volume_col="volume",
        ma_days=5,
    )


@q("q_scd2")
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history from event snapshots: per-user episodes of
    event_type with [valid_from, valid_to) bounds (dates as ISO strings
    for dtype-stable hashing)."""
    from fortune_500_financial_insights_pipeline_spark.operators.scd import scd2

    e = load_table(spark, sf_dir, "events")
    hist = scd2(e, ["user_id"], "ts", ["event_type"])
    fmt = "yyyy-MM-dd HH:mm:ss"
    return hist.select(
        "user_id",
        "event_type",
        F.date_format("valid_from", fmt).alias("valid_from"),
        F.date_format("valid_to", fmt).alias("valid_to"),
    )


@q("q_sql_pivot")
def q_sql_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIVOT clause (Spark dialect; the oracle is the equivalent
    conditional aggregation — PIVOT syntax differs across engines, the
    semantics don't). DataFrame twin: q_pivot."""
    from fortune_500_financial_insights_pipeline_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT * FROM (SELECT l_returnflag, l_linestatus, l_quantity FROM lineitem)
        PIVOT (CAST(SUM(CAST(ROUND(l_quantity * 1000000) AS BIGINT)) AS DOUBLE)
               / 1000000
               FOR l_linestatus IN ('F' AS qty_f, 'O' AS qty_o))
        """
    )


@q("q_udtf_chunk")
def q_udtf_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF via LATERAL join — same semantics (and same oracle) as
    the JVM-side q_chunk_docs, proving the table-function escape hatch."""
    from fortune_500_financial_insights_pipeline_spark.catalog import register_views
    from fortune_500_financial_insights_pipeline_spark.functions.udtfs import register_udtfs

    register_views(spark, sf_dir)
    register_udtfs(spark)
    return spark.sql(
        "SELECT doc_id, s.* FROM documents, LATERAL chunk_tokens(text, 32, 8) s"
    )


@q("q_hash_sample")
def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-keyed 10% sample (rows-only: xxhash64 is
    Spark-specific; partition-invariance is pinned by
    test_hash_sample_is_partition_invariant)."""
    from fortune_500_financial_insights_pipeline_spark.operators.sampling import hash_sample

    d = load_table(spark, sf_dir, "documents")
    return hash_sample(d, 0.1, ["doc_id"]).select("doc_id", "lang", "n_chars")


@q("q_binary_meta")
def q_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary column handling: synthesize a blob from text, compute
    byte length + sha256 — the schema/partitioning pattern for image/audio
    payloads (decode stubs live in operators/multimodal.py)."""
    d = load_table(spark, sf_dir, "documents")
    blob = F.encode("text", "UTF-8")
    return d.select(
        "doc_id",
        F.octet_length(blob).alias("n_bytes"),
        F.lower(F.sha2(blob, 256)).alias("sha"),
    )


@q("q_pack_offsets")
def q_pack_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-offset sequence packing: documents laid end-to-end per
    id%8 bucket, bin boundary every 256 tokens (window cumsum, one
    shuffle on the bucket key)."""
    from fortune_500_financial_insights_pipeline_spark.operators import text as TX
    from fortune_500_financial_insights_pipeline_spark.operators.packing import pack_offsets

    d = load_table(spark, sf_dir, "documents")
    counted = d.select("doc_id", TX.token_count("text").alias("n_tokens"))
    return pack_offsets(counted, budget=256, n_buckets=8)


@q("q_pack_greedy")
def q_pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy first-fit sequence packing (no straddling): per-bucket
    Arrow-batched applyInPandas; oracle is a recursive CTE replaying the
    same non-associative reset recurrence."""
    from fortune_500_financial_insights_pipeline_spark.operators import text as TX
    from fortune_500_financial_insights_pipeline_spark.operators.packing import pack_greedy

    d = load_table(spark, sf_dir, "documents")
    counted = d.select("doc_id", TX.token_count("text").alias("n_tokens"))
    return pack_greedy(counted, budget=256, n_buckets=8)


@q("q_quality_gate")
def q_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive quality gate: keep documents at or above the corpus p25
    quality score. The exact-percentile threshold is a 1-row aggregate
    broadcast into the filter — no second pass over the text."""
    from fortune_500_financial_insights_pipeline_spark.operators import text as TX

    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "lang", F.round(TX.quality_score("text"), 6).alias("quality")
    )
    thr = scored.agg(F.percentile("quality", F.lit(0.25)).alias("__thr"))
    return (
        scored.join(F.broadcast(thr))
        .filter(F.col("quality") >= F.col("__thr"))
        .select("doc_id", "lang", "quality")
    )


@q("q_tech_indicators")
def q_tech_indicators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cutler's RSI-5 and 5-day Bollinger bands on the supplier-day price
    series, exact fixed-point frame sums (functions/finance.
    with_indicators_exact) — value-hash-matched against an op-for-op
    DuckDB replay."""
    from fortune_500_financial_insights_pipeline_spark.functions.deterministic import davg
    from fortune_500_financial_insights_pipeline_spark.functions.finance import with_indicators_exact

    li = load_table(spark, sf_dir, "lineitem")
    series = li.groupBy(
        "l_suppkey", F.date_format("l_shipdate", "yyyy-MM-dd").alias("day")
    ).agg(davg("l_extendedprice").alias("close"))
    return with_indicators_exact(
        series,
        ticker_col="l_suppkey",
        date_col="day",
        close_col="close",
        rsi_days=5,
        bb_days=5,
    )


@q("q_hll_distinct")
def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (rows-only: DataSketches HLL
    binary images and estimates are engine-specific, so no DuckDB value
    twin; test_hll_estimates_within_error pins accuracy vs exact).

    Per-lang HLL(lgK=12) sketches are built once, estimated per group,
    then UNIONED — not recounted — into the corpus-wide row. At 100 TB
    this is the pattern that replaces COUNT(DISTINCT): partials merge
    associatively on executors, the final union touches sketches only."""
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("lang").agg(F.hll_sketch_agg("doc_id", 12).alias("__sk"))
    per_est = per.select(
        "lang", F.hll_sketch_estimate("__sk").alias("est_distinct")
    )
    total = per.agg(F.hll_union_agg("__sk").alias("__sk")).select(
        F.lit("ALL").alias("lang"),
        F.hll_sketch_estimate("__sk").alias("est_distinct"),
    )
    return per_est.unionAll(total)


@q("q_pagerank")
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank (10 rounds, damping 0.85) over the bipartite
    supplier<->customer trade graph from lineitem x orders (customer ids
    offset by 1e6 into their own node-id space). Bit-exact integer
    recurrence, so the oracle is the same 10 rounds unrolled as SQL CTE
    stages — an iterative algorithm that still value-hash-matches."""
    from fortune_500_financial_insights_pipeline_spark.operators.pagerank import pagerank

    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_orderkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("l_suppkey").alias("s"),
            (F.col("o_custkey") + 1000000).alias("c"),
        )
        .distinct()
    )
    edges = base.select(F.col("s").alias("src"), F.col("c").alias("dst")).unionByName(
        base.select(F.col("c").alias("src"), F.col("s").alias("dst"))
    )
    return pagerank(edges, damping=0.85, max_iter=10)


@q("q_det_sample")
def q_det_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-portable deterministic 10% sample: md5 hash-space threshold
    as a plain string predicate — unlike q_hash_sample (xxhash64), this
    one value-hash-matches a DuckDB replay of the same predicate."""
    from fortune_500_financial_insights_pipeline_spark.operators.sampling import md5_sample

    d = load_table(spark, sf_dir, "documents")
    return md5_sample(d, 0.1, ["doc_id"]).select("doc_id", "lang")


@q("q_stratified_sample")
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic class rebalancing: per-lang md5 thresholds (en
    downsampled 20x vs de) via one CASE chain; langs outside the map drop."""
    from fortune_500_financial_insights_pipeline_spark.operators.sampling import md5_stratified

    d = load_table(spark, sf_dir, "documents")
    return md5_stratified(
        d, "lang", {"en": 0.05, "de": 0.5, "es": 0.25}, key_cols=["doc_id"]
    ).select("doc_id", "lang")


# ---------------------------------------------------------------------------
# Analytics extensions: entity resolution, data quality, product analytics,
# time series, robust stats, graph metrics (SURVEY §2.11 widening)
# ---------------------------------------------------------------------------


@q("q_fuzzy_match")
def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy self-match on customer names: levenshtein <= 1 inside
    prefix blocks (all-but-last-2-chars), the entity-resolution primitive
    for name-keyed dims (reference stock_list.csv / DDL VARCHAR keys).
    Equi-join on the block key — never a cartesian; levenshtein is a JVM
    built-in on both engines, so fully oracle-checked."""
    from fortune_500_financial_insights_pipeline_spark.operators.fuzzy import blocked_fuzzy_pairs

    c = load_table(spark, sf_dir, "customer")
    block = F.expr("substr(c_name, 1, length(c_name) - 2)")
    return blocked_fuzzy_pairs(c, "c_custkey", "c_name", block, max_dist=1)


@q("q_dq_audit")
def q_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit over orders: the constraints the reference only
    declares in unused DDLs (UNIQUE keys, NOT NULL, accepted values —
    code/sql/DDLs:14,28) compiled to executable rules. Row-local rules run
    in ONE aggregation pass; uniqueness is a key groupBy; referential
    integrity is a broadcast left-anti join."""
    from fortune_500_financial_insights_pipeline_spark import checks as QA

    o = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    row_rules = QA.row_rule_violations(
        o,
        {
            "not_null:o_custkey": F.col("o_custkey").isNull(),
            "range:o_totalprice_positive": F.col("o_totalprice") <= 0,
            "accepted:o_orderstatus": ~F.col("o_orderstatus").isin("O", "F", "P"),
            "fresh:o_orderdate_after_1990": F.col("o_orderdate")
            < F.lit("1990-01-01").cast("timestamp"),
        },
    )
    return QA.audit(
        [
            row_rules,
            QA.unique_violations(o, ["o_orderkey"], "unique:o_orderkey"),
            QA.ref_violations(o, "o_custkey", cust, "c_custkey", "ref:o_custkey->customer"),
        ]
    )


@q("q_retention_cohort")
def q_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix over events: cohort = day of a user's first
    event, cell = distinct users active at each day offset. Two shuffles
    (user-grain min, then cohort-grain distinct count) — the canonical
    product-analytics rollup the reference delegates to Tableau."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    first = ev.groupBy("user_id").agg(F.min("d").alias("cd"))
    return (
        ev.join(first, "user_id")
        .groupBy(
            F.date_format("cd", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("d", "cd").alias("offset_days"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@q("q_interpolate")
def q_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily series per user (users 0-7, Jan 2024) with missing days
    linearly interpolated between nearest observations, edges clamped.
    Spine = sequence() exploded per key; fill = four IGNORE NULLS windows
    over one (key, day) shuffle. Fixed-order double arithmetic on a
    fixed-point daily mean → bit-identical to the single-threaded oracle."""
    import datetime as dt

    from fortune_500_financial_insights_pipeline_spark.operators.timeseries import fill_gaps_linear

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 8)
    daily = ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        davg("value").alias("v")
    )
    filled = fill_gaps_linear(
        daily, "user_id", "d", "v", dt.date(2024, 1, 1), dt.date(2024, 1, 30)
    )
    return filled.select(
        "user_id",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "value_filled",
    )


@q("q_mad_outliers")
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier flags: |x - median| > 3 * MAD (median
    absolute deviation) per event_type. Exact interpolated medians via
    built-in percentile (two grouped aggregations + re-join) — the
    robust-statistics cousin of the z-score UDF query, entirely JVM-side."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.percentile("value", 0.5).alias("med"))
    dev = ev.join(med, "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.percentile("adev", 0.5).alias("mad"))
    return (
        dev.join(mad, "event_type")
        .where(F.col("adev") > 3 * F.col("mad"))
        .select("event_id", "event_type")
    )


@q("q_triangles")
def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the exact bigram-Jaccard similarity
    graph (same edge rule as q_jaccard_clusters): triangle membership =
    mutually-similar triples, the density signal LSH-based dedup uses to
    distinguish a tight duplicate cluster from a chain of borderline pairs.
    Edges come from the prefix-filtered exact set-similarity join
    (operators/setjoin.py); triple enumeration is two equi-joins on
    canonicalized (u < v) edges."""
    from fortune_500_financial_insights_pipeline_spark.operators import text as TX
    from fortune_500_financial_insights_pipeline_spark.operators.graph import triangle_counts
    from fortune_500_financial_insights_pipeline_spark.operators.setjoin import jaccard_pairs_exact

    d = load_table(spark, sf_dir, "documents")
    grams = d.select("doc_id", TX.word_ngrams("text", 2).alias("grams"))
    pairs = jaccard_pairs_exact(grams, "doc_id", "grams", 0.8)
    return triangle_counts(pairs).select(
        F.col("id").alias("doc_id"), "n_triangles"
    )


@q("q_heavy_hitters")
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact group-relative heavy hitters: users contributing > 1% of their
    event_type's volume. Two partial-aggregated shuffles + a broadcast join
    of the tiny totals side. At sketch scale the same contract is served
    mergeably by Misra-Gries summaries per partition (union = merge +
    re-trim), mirroring the HLL pattern in functions/deterministic."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("n_events"))
    t = ev.groupBy("event_type").agg((F.count(F.lit(1)) * 0.01).alias("thr"))
    return (
        c.join(F.broadcast(t), "event_type")
        .where(F.col("n_events") > F.col("thr"))
        .select("event_type", "user_id", "n_events")
    )


@q("q_redact_pii")
def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction as a curation stage: emails/SSNs/phones/IPs tagged out
    by one chained-regexp projection (operators/text.redact_pii). Fixture
    documents are digit-free, so the contact strings are synthesized
    deterministically from customer columns — both engines build the
    identical raw text, redact it, and count matches, value-hash-checked."""
    from fortune_500_financial_insights_pipeline_spark.operators import text as TX

    c = load_table(spark, sf_dir, "customer")
    raw = F.concat(
        F.lit("reach "),
        F.col("c_name"),
        F.lit(" at c"),
        F.col("c_custkey").cast("string"),
        F.lit("@corp.example.com"),
        F.when(
            F.col("c_custkey") % 2 == 0,
            F.concat(
                F.lit(" or 555-"),
                F.lpad((F.col("c_custkey") % 1000).cast("string"), 3, "0"),
                F.lit("-"),
                F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.lit(" ssn 123-45-6789 ip 10.0.0."),
        (F.col("c_custkey") % 256).cast("string"),
    )
    return c.select(
        "c_custkey",
        TX.redact_pii(raw).alias("redacted"),
        TX.pii_count(raw).cast("int").alias("n_pii"),
    )


@q("q_repetition_filter")
def q_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule repetition filter: flag documents whose most frequent
    bigram occupies >= 8% of the bigram stream (boilerplate detector that
    complements the length/stopword quality score). Two stacked doc-keyed
    aggregations — no cross-document shuffle skew."""
    from fortune_500_financial_insights_pipeline_spark.operators.text import repetition_stats

    d = load_table(spark, sf_dir, "documents")
    stats = repetition_stats(d, "doc_id", "text", n=2)
    return stats.select(
        "doc_id",
        "top_gram_frac",
        "n_grams",
        (F.col("top_gram_frac") >= 0.08).alias("is_repetitive"),
    )


@q("q_asof_tolerance")
def q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-bounded as-of join (pandas merge_asof(tolerance=...) /
    kdb wj semantics): the most recent click value per user reverts to
    null when it is staler than 1 hour at the purchase — same single
    union+window pass as q_asof_lastval, one extra carried timestamp."""
    from fortune_500_financial_insights_pipeline_spark.operators.asof import asof_join

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.col("value").alias("click_value")
    )
    return asof_join(
        purchases,
        clicks,
        on=["user_id"],
        ts_col="ts",
        value_cols=["click_value"],
        tiebreak_col="event_id",
        tolerance="1 HOUR",
    ).select("event_id", "user_id", "ts", "value", "click_value_asof")


@q("q_rolling_beta")
def q_rolling_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 10-day beta of each user's daily mean value against the
    all-events market mean: the classic factor-exposure window statistic,
    computed from fixed-point component sums (Σx, Σy, Σxy, Σx²) so the
    distributed result is bit-identical to the single-threaded oracle —
    never from a built-in corr/covar whose online update order differs
    per engine. One shuffle (user, day grain), then one window pass."""
    ev = load_table(spark, sf_dir, "events")
    user_daily = ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        davg("value").alias("y")
    )
    market_daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        davg("value").alias("x")
    )
    j = user_daily.join(market_daily, "d")
    w = W.partitionBy("user_id").orderBy("d").rowsBetween(-9, 0)
    n = F.count(F.lit(1)).over(w).cast("double")
    sx = dsum_w(F.col("x"), w)
    sy = dsum_w(F.col("y"), w)
    sxy = dsum_w(F.col("x") * F.col("y"), w)
    sxx = dsum_w(F.col("x") * F.col("x"), w)
    denom = n * sxx - sx * sx
    beta = F.when(denom != 0, (n * sxy - sx * sy) / denom)
    return j.select(
        "user_id",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        beta.alias("beta"),
    )


@q("q_ab_test")
def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment readout: Welch's t statistic per event_type between the
    user_id-parity split (the deterministic A/B assignment), built from
    fixed-point Σx and Σx² — closed-form mean/variance, no built-in
    stddev whose accumulation order differs per engine. One grouped
    aggregation, one pivot-style self-alignment via conditional sums."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.withColumn("grp", (F.col("user_id") % 2).cast("int"))
    agg = g.groupBy("event_type", "grp").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum("value").alias("sx"),
        dsum(F.col("value") * F.col("value")).alias("sxx"),
    )
    a = agg.where(F.col("grp") == 0).select(
        "event_type",
        F.col("n").alias("na"), F.col("sx").alias("sxa"), F.col("sxx").alias("sxxa"),
    )
    b = agg.where(F.col("grp") == 1).select(
        "event_type",
        F.col("n").alias("nb"), F.col("sx").alias("sxb"), F.col("sxx").alias("sxxb"),
    )
    j = a.join(b, "event_type")
    ma = F.col("sxa") / F.col("na")
    mb = F.col("sxb") / F.col("nb")
    va = (F.col("sxxa") - F.col("sxa") * F.col("sxa") / F.col("na")) / (F.col("na") - 1)
    vb = (F.col("sxxb") - F.col("sxb") * F.col("sxb") / F.col("nb")) / (F.col("nb") - 1)
    t = (ma - mb) / F.sqrt(va / F.col("na") + vb / F.col("nb"))
    return j.select(
        "event_type",
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        (ma - mb).alias("mean_diff"),
        t.alias("t_stat"),
    )


@q("q_market_basket")
def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association mining over (user, event_type) baskets: support and
    lift for every ordered event-type pair. Basket build is a distinct
    user-type projection; co-occurrence is a self-join on user (bounded:
    5 types → ≤ C(5,2) pairs per user); supports broadcast back. The
    co-occurrence self-join is the same shape PPJoin prunes at corpus
    scale (operators/setjoin.py)."""
    ev = load_table(spark, sf_dir, "events")
    baskets = ev.select("user_id", "event_type").distinct()
    n_users = baskets.select("user_id").distinct().count()
    sup = baskets.groupBy("event_type").agg(
        (F.count(F.lit(1)) / F.lit(float(n_users))).alias("support")
    )
    a = baskets.select("user_id", F.col("event_type").alias("t_a"))
    b = baskets.select("user_id", F.col("event_type").alias("t_b"))
    pair = (
        a.join(b, "user_id")
        .where(F.col("t_a") < F.col("t_b"))
        .groupBy("t_a", "t_b")
        .agg((F.count(F.lit(1)) / F.lit(float(n_users))).alias("support_ab"))
    )
    sa = sup.select(F.col("event_type").alias("t_a"), F.col("support").alias("sup_a"))
    sb = sup.select(F.col("event_type").alias("t_b"), F.col("support").alias("sup_b"))
    return (
        pair.join(F.broadcast(sa), "t_a")
        .join(F.broadcast(sb), "t_b")
        .select(
            "t_a", "t_b", "support_ab",
            (F.col("support_ab") / (F.col("sup_a") * F.col("sup_b"))).alias("lift"),
        )
    )


@q("q_variant_json")
def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path: parse the JSON ``props`` payload into
    Spark 4's VARIANT type, extract a typed field, aggregate per event type.

    VARIANT keeps the shredded binary encoding JVM-side (no Python UDF, no
    schema-on-write) — at 100 TB this is the schema-flexible analog of the
    reference's autodetect JSON loads (transform_json_INFO.py:104-119);
    extraction happens inside whole-stage codegen."""
    ev = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_k"),
            F.sum("k").cast("long").alias("sum_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


@q("q_regr_agg")
def q_regr_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregate family (OLS slope/intercept/R² per group)
    — the one-pass regr_* aggregates the warehouse layer would run for the
    Tableau-style price-vs-volume overlays (SURVEY §2.4: aggregation surface
    delegated downstream by the reference)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.regr_count("l_extendedprice", "l_quantity").alias("n_pairs"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 6).alias("intercept"),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        F.round(F.regr_avgx("l_extendedprice", "l_quantity"), 6).alias("avg_x"),
        F.round(F.regr_avgy("l_extendedprice", "l_quantity"), 6).alias("avg_y"),
    )


@q("q_join_full")
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer equi-join with nulls surviving on BOTH sides: high-balance
    customers vs per-customer order rollups. TPC-H leaves ~1/3 of customers
    orderless and the balance filter drops customers that do have orders, so
    both null wings are populated. Completes the join-type surface (J1-J4 +
    full outer; SURVEY §2.3). Shuffle join on c_custkey; the pre-aggregation
    runs partial map-side so the shuffled right side is one row per customer."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 7500)
        .select("c_custkey", "c_mktsegment", "c_acctbal")
    )
    ords = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("total_spend"))
    )
    return (
        cust.join(ords, cust.c_custkey == ords.o_custkey, "full_outer")
        .select(
            F.coalesce("c_custkey", "o_custkey").alias("custkey"),
            "c_mktsegment",
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_orders",
            "total_spend",
        )
    )


@q("q_mode_exact")
def q_mode_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group mode with a deterministic tie-break (smallest value
    wins). Built-in F.mode is tie-nondeterministic across engines, so the
    portable form is count→rank with an explicit order — two shuffles on the
    grouping key, both partial-aggregated map-side. The same shape yields
    any 'argmax per group' (most common token, dominant language per shard)."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(F.count(F.lit(1)).alias("cnt"))
    w = W.partitionBy("l_returnflag").orderBy(F.desc("cnt"), F.asc("l_quantity"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("l_quantity").alias("mode_qty"),
            F.col("cnt").alias("mode_count"),
        )
    )


@q("q_ohlc_resample")
def q_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series downsample to OHLC candlestick bars: per (series, day),
    open = first value / close = last value by event time, high/low = extrema,
    volume = row count. The first/last pick uses min_by/max_by over a
    composite (ts, event_id) key so ties are deterministic — one shuffle on
    the bar key, all five aggregates partial map-side. The struct key costs
    a SortAggregate (partition-local sorts only; asserted in
    test_plan_quality), still far cheaper than the window-sort formulation,
    which shuffles full tick rows then sorts per key.
    This is the daily→period rollup the reference delegates to Tableau over
    the open_close warehouse table (SURVEY §2.4; DDLs:4-14)."""
    ev = load_table(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.withColumn("day", F.to_date("ts"))
        .groupBy("event_type", "day")
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "open", "high", "low", "close", "n_ticks",
        )
    )


@q("q_kmeans")
def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Lloyd's k-means over the embeddings table (k=8, 3 exact
    integer iterations; operators/kmeans.py) — the trained coarse quantizer
    for the IVF similarity path. Oracle = the iterations unrolled as CTE
    stages replaying the same fixed-point arithmetic."""
    from fortune_500_financial_insights_pipeline_spark.operators.kmeans import kmeans_fit

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_fit(emb, k=8, n_iter=3)


@q("q_cms_heavy")
def q_cms_heavy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy-hitter estimates vs exact counts: build the
    relational CMS over events.user_id (operators/cms.py), then point-query
    the true top-10 users. est_cnt ≥ true_cnt always (CMS guarantee); the
    whole build→estimate pipeline is md5-hash integer arithmetic shared
    verbatim with the DuckDB oracle — a verifiable sketch, unlike binary
    blobs. The sketch shuffle carries ≤ d·w cells, never input rows."""
    from fortune_500_financial_insights_pipeline_spark.operators.cms import cms_build, cms_estimate

    ev = load_table(spark, sf_dir, "events")
    sketch = cms_build(ev, "user_id")
    true_top = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), F.asc("user_id"))
        .limit(10)
    )
    return cms_estimate(sketch, true_top, "user_id")


@q("q_interval_join")
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big-big interval join in batch: purchases within 30 minutes after a
    click by the same user, counted per user. Planned as a shuffle equi-join
    on (user_id, time-bin) with a ≤2-bin left fan-out then an exact band
    refine (operators/intervaljoin.py) — never a nested-loop/cartesian,
    which a raw theta join between two fact tables would be. The batch twin
    of the watermarked stream-stream interval join (streaming/joins.py)."""
    from fortune_500_financial_insights_pipeline_spark.operators.intervaljoin import (
        binned_interval_join,
    )

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("event_id").alias("click_id")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts")
    )
    pairs = binned_interval_join(
        clicks, purchases, ["user_id"], "click_ts", "purchase_ts", 0, 1800
    )
    return pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("click_id").alias("n_clicks_with_followup"),
    )


@q("q_char_entropy")
def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-entropy quality signal per document: low entropy flags
    boilerplate/repetition, high entropy flags binary junk — the
    information-theoretic cousin of the Gopher repetition rule
    (q_repetition_filter). Implementation: operators/text.py char_entropy
    (sequence-explode chars, fixed-point p*log2(p) sum — distributed result
    is bit-identical to the oracle); also a curation-funnel stage
    (pipelines/training_data.py)."""
    from fortune_500_financial_insights_pipeline_spark.operators.text import char_entropy

    return char_entropy(load_table(spark, sf_dir, "documents"))


@q("q_simhash_portable")
def q_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints whose bits derive from md5 hex digits — the
    verifiable twin of q_simhash (xxhash64): DuckDB reproduces the exact
    signature, upgrading the near-dup fingerprint from rows-only checking
    to full value parity. One pass, no UDF, no shuffle beyond the scan."""
    from fortune_500_financial_insights_pipeline_spark.operators.minhash import simhash_portable

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", simhash_portable("text").alias("simhash"))


@q("q_winsorize")
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization: clamp each series' values to its own exact [P05, P95]
    band — the standard outlier treatment before scaling/aggregating a
    feature. Two passes: per-group exact percentiles (tiny frame,
    broadcast back), then a clamp projection; the per-group comparison
    aggregates confirm the clamp (min == p05, max == p95). Same adaptive-
    threshold shape as q_quality_gate but value-clamping, not filtering."""
    e = load_table(spark, sf_dir, "events")
    bands = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("p05"),
        F.expr("percentile(value, 0.95)").alias("p95"),
    )
    clamped = e.join(F.broadcast(bands), "event_type").select(
        "event_type",
        F.greatest(F.least(F.col("value"), F.col("p95")), F.col("p05")).alias("w"),
    )
    return clamped.groupBy("event_type").agg(
        F.round(F.min("w"), 6).alias("min_w"),
        F.round(F.max("w"), 6).alias("max_w"),
        dsum("w").alias("sum_w"),
        F.count(F.lit(1)).alias("n"),
    )


@q("q_calendar_features")
def q_calendar_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar feature derivation per order date: day-of-week, quarter,
    month-end flag, days-in-month — the trading-calendar features the
    reference's Tableau layer derives downstream (SURVEY §2.8 date
    surface). All scan-side projections; the aggregate keeps the output
    compact (one row per distinct date). Day-of-week numbering differs
    across engines (Spark: Sunday=1; DuckDB: Sunday=0) — the oracle maps
    explicitly rather than hiding the divergence."""
    o = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return (
        o.select(
            F.date_format(d, "yyyy-MM-dd").alias("day"),
            F.dayofweek(d).alias("dow"),
            F.quarter(d).alias("quarter"),
            (F.dayofmonth(d) == F.dayofmonth(F.last_day(d))).cast("int").alias("is_month_end"),
            F.dayofmonth(F.last_day(d)).alias("days_in_month"),
        )
        .groupBy("day", "dow", "quarter", "is_month_end", "days_in_month")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@q("q_gap_fill")
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward/backward fill per series: sensor-style sparse observations
    (only 'view' events carry a reading here) filled from the last/next
    non-null within each user's timeline — last_value/first_value with
    ignoreNulls over one window family (one shuffle on user_id, shared by
    both directions). The complement of q_interpolate's linear fill."""
    e = load_table(spark, sf_dir, "events")
    obs = F.when(F.col("event_type") == "view", F.col("value"))
    wf = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    wb = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.currentRow, W.unboundedFollowing
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(F.last(obs, ignorenulls=True).over(wf), 6).alias("ffill"),
        F.round(F.first(obs, ignorenulls=True).over(wb), 6).alias("bfill"),
    )


@q("q_simhash_pairs")
def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash candidate pairs with exact Hamming distances: the portable
    48-bit signature splits into 4 12-bit bands; docs sharing any band
    bucket-join into candidates (the standard simhash blocking — an
    equi-join on (band, value), never an O(n²) signature scan), then
    bit_count(a XOR b) scores each pair. With the md5-bit signature the
    entire pipeline — signature, banding arithmetic, xor popcount — is
    engine-portable and oracle-exact, end to end."""
    from fortune_500_financial_insights_pipeline_spark.operators.compact import (
        ensure_min_parallelism,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.minhash import (
        bucket_pairs,
        simhash_portable,
    )

    docs = ensure_min_parallelism(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    )
    # NOTE: an explode + 48-conditional-SUM aggregate form was measured
    # ~15% SLOWER than this interpreted fold (48 agg buffers per group
    # outweigh the lambda overhead) — don't "optimize" it that way again.
    sigs = docs.select("doc_id", simhash_portable("text").alias("sig"))
    bands = sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        (F.floor(F.col("sig") / F.lit(float(2 ** (12 * b)))).cast("long") % 4096).alias("bval"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "sig", "bb.band", "bb.bval")
    # bucket_pairs computes the md5-fold signature subtree ONCE (a bucket
    # self-join would compute it per branch) and yields id_a < id_b pairs.
    pairs = bucket_pairs(bands, ["band", "bval"], "doc_id", carry_cols=("sig",))
    return pairs.select(
        "id_a",
        "id_b",
        F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).alias("hamming"),
    )


@q("q_source_cap")
def q_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-capped sampling: keep at most N documents per source, the
    standard web-curation guard against one domain dominating the corpus.
    Priority is md5(doc_id) — deterministic, engine-portable, uniformly
    'random' — and the rank ≤ N filter gets Catalyst's partial
    WindowGroupLimit: each map task forwards at most N rows per source
    before the shuffle, so the exchange is capped at N·sources·tasks no
    matter how skewed the source distribution is."""
    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    capped = (
        docs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 50)
        .drop("rn")
    )
    return capped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").cast("long").alias("chars_kept"),
        F.min("doc_id").alias("min_doc_id"),
    )


@q("q_unigram_logprob")
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM quality score: average per-token unigram log-probability
    of each document under the corpus's own token distribution — the
    CCNet-style signal (odd docs score low because their tokens are rare
    corpus-wide). One token explode feeds both the vocabulary counts and
    the per-doc counts; the vocab frame (one row per distinct token) joins
    back broadcast-style. Per-token log2(p) terms are per-row IEEE math;
    the per-doc weighted sum runs in fixed point, so the score is
    partitioning-invariant and oracle-exact."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    ).where(F.col("tok") != "")
    doc_tok = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("n_dt"))
    vocab = doc_tok.groupBy("tok").agg(F.sum("n_dt").alias("n_t"))
    total = vocab.agg(F.sum("n_t").alias("n_total"))
    scored = doc_tok.join(vocab, "tok").crossJoin(F.broadcast(total))
    term = F.col("n_dt") * F.log2(F.col("n_t") / F.col("n_total"))
    return scored.groupBy("doc_id").agg(
        (dsum(term) / F.sum("n_dt")).alias("avg_log2_prob"),
        F.sum("n_dt").cast("long").alias("n_tokens"),
    )


@q("q_dataset_card")
def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card summary per language: the corpus-level numbers every
    training-data release reports — document and source counts, char
    volume, exact-dup rate (via content fingerprints), mean doc length.
    One scan, one groupBy; the dup rate reuses the md5 fingerprint so the
    whole card is oracle-exact."""
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")))
    return (
        docs.withColumn("fp", fp)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.countDistinct("fp").alias("n_unique"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.round(F.sum("n_chars") / F.count(F.lit(1)), 6).alias("mean_chars"),
        )
        .withColumn(
            "dup_rate",
            F.round((F.col("n_docs") - F.col("n_unique")) / F.col("n_docs"), 6),
        )
    )


@q("q_rfm")
def q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency (days since last order, against
    the corpus max date so the result is reproducible), frequency (order
    count), monetary (fixed-point spend), each cut into quintiles with a
    customer-id tiebreak so the ntile assignment is total-order
    deterministic across engines. One aggregation pass + three ntile
    windows over the compact per-customer frame (rows = customers, not
    orders)."""
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        dsum("o_totalprice").alias("monetary"),
    )
    anchor = per.agg(F.max("last_order").alias("a"))
    per = per.crossJoin(F.broadcast(anchor)).withColumn(
        "recency_days", F.datediff(F.col("a"), F.col("last_order"))
    )
    r_w = W.orderBy(F.asc("recency_days"), F.asc("o_custkey"))
    f_w = W.orderBy(F.desc("frequency"), F.asc("o_custkey"))
    m_w = W.orderBy(F.desc("monetary"), F.asc("o_custkey"))
    return per.select(
        "o_custkey",
        "recency_days",
        "frequency",
        F.round("monetary", 2).alias("monetary"),
        F.ntile(5).over(r_w).alias("r_score"),
        F.ntile(5).over(f_w).alias("f_score"),
        F.ntile(5).over(m_w).alias("m_score"),
    )


@q("q_new_vs_returning")
def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning user split: a user's first-seen day labels
    each active (user, day); the daily rollup counts both classes. The
    first-seen frame is one row per user (min over the scan, partial
    map-side) joined back on user_id — the standard two-pass shape that
    avoids any window over the raw event stream."""
    e = load_table(spark, sf_dir, "events")
    days = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    first = days.groupBy("user_id").agg(F.min("day").alias("first_day"))
    labeled = days.join(first, "user_id").withColumn(
        "is_new", (F.col("day") == F.col("first_day")).cast("int")
    )
    return (
        labeled.groupBy("day")
        .agg(
            F.sum("is_new").cast("long").alias("new_users"),
            F.sum(1 - F.col("is_new")).cast("long").alias("returning_users"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "new_users",
            "returning_users",
        )
    )


@q("q_skyline")
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of parts under (retail price ↓, size ↑): the
    sort-scan skyline (operators/skyline.py) — two aggregations and one
    window over the distinct-price frame, no dominance self-join."""
    from fortune_500_financial_insights_pipeline_spark.operators.skyline import skyline_2d

    p = load_table(spark, sf_dir, "part")
    return skyline_2d(
        p.select("p_partkey", "p_retailprice", "p_size"),
        minimize="p_retailprice",
        maximize="p_size",
    )


@q("q_rolling_median")
def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trailing 7-observation median of shipped quantity per supplier
    (robust rolling level for anomaly baselines). Bounded-frame
    collect_list + sort_array — exact, JVM-side, state independent of
    table size (operators/timeseries.rolling_median)."""
    from fortune_500_financial_insights_pipeline_spark.operators.timeseries import rolling_median

    li = load_table(spark, sf_dir, "lineitem")
    return rolling_median(
        li.select("l_suppkey", "l_orderkey", "l_linenumber", "l_shipdate", "l_quantity"),
        part_cols=["l_suppkey"],
        order_cols=["l_shipdate", "l_orderkey", "l_linenumber"],
        value_col="l_quantity",
        frame_rows=7,
    ).select("l_suppkey", "l_orderkey", "l_linenumber", "med")


@q("q_bloom_semijoin")
def q_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-join pre-filter: customers whose key passes a 16 Kbit / k=3
    Bloom filter built from order custkeys. Supersets the true semi-join
    (zero false negatives) with ~1% deterministic false positives — the
    map-side shuffle-elimination filter for big-big joins
    (operators/bloom.py)."""
    from fortune_500_financial_insights_pipeline_spark.operators.bloom import (
        bloom_build,
        bloom_probe,
    )

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    # build from a proper subset (1995 orders) so the probe exercises both
    # the hit and the definite-miss path — this fixture has no customer
    # without orders at all, so an unfiltered build passes everyone
    o95 = o.where(F.year(F.to_date("o_orderdate")) == 1995)
    flt = bloom_build(o95, "o_custkey", m_bits=16384, k=3)
    probed = bloom_probe(flt, c.select("c_custkey"), "c_custkey", m_bits=16384, k=3)
    return probed.where("maybe_member").select("c_custkey")


@q("q_shard_stats")
def q_shard_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded-export manifest: md5-deterministic 16-way shard assignment
    of the documents corpus plus per-shard size stats — the balance sheet
    a sharded dataset release ships with (operators/sampling.hash_shards).
    The assignment is map-side; the only exchange is the 16-group agg."""
    from fortune_500_financial_insights_pipeline_spark.operators.sampling import hash_shards

    d = load_table(spark, sf_dir, "documents")
    return (
        hash_shards(d, key_cols=["doc_id"], n_shards=16)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


@q("q_kmv_distinct")
def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via a k=64 KMV bottom-k sketch — the
    mergeable cardinality sketch whose estimate is engine-portable md5
    arithmetic, so unlike HLL (q_hll_distinct, rows-only) it sits behind
    the exact-hash correctness gate (operators/kmv.py)."""
    from fortune_500_financial_insights_pipeline_spark.operators.kmv import kmv_estimate, kmv_sketch

    e = load_table(spark, sf_dir, "events")
    sk = kmv_sketch(e, ["event_type"], "user_id", k=64)
    return kmv_estimate(sk, ["event_type"], k=64)


@q("q_weighted_sample")
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """50 documents drawn by length-weighted sampling without replacement
    (Efraimidis–Spirakis md5-keyed, operators/sampling.weighted_sample):
    the reproducible quality-weighted corpus selection primitive."""
    from fortune_500_financial_insights_pipeline_spark.operators.sampling import weighted_sample

    d = load_table(spark, sf_dir, "documents")
    dw = d.withColumn("w", F.length("text"))
    return weighted_sample(dw, "w", ["doc_id"], n=50).select("doc_id", "es_score")


@q("q_histogram_equidepth")
def q_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram of order values (10 equal-count buckets): the
    optimizer-statistics form — bucket boundaries track the data density
    where equi-width (q_histogram) leaves most buckets empty under skew.
    ntile over a (value, key) total order is deterministic cross-engine;
    the single global window runs over (value, key) pairs only — at true
    scale swap in exact-percentile cut points (operators/..winsorize
    pattern) to avoid the one-partition sort, which is why the equi-width
    twin stays the default."""
    o = load_table(spark, sf_dir, "orders")
    w = W.orderBy(F.asc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select("o_orderkey", "o_totalprice")
        .withColumn("bucket", F.ntile(10).over(w))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


@q("q_kmv_overlap")
def q_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimated customer overlap between 1995 and 1996 order cohorts from
    k=128 KMV sketches alone — year-over-year retention sizing without
    joining the two years (operators/kmv.kmv_overlap)."""
    from fortune_500_financial_insights_pipeline_spark.operators.kmv import kmv_overlap

    o = load_table(spark, sf_dir, "orders")
    y = F.year(F.to_date("o_orderdate"))
    a = o.where(y == 1995).select("o_custkey")
    b = o.where(y == 1996).select("o_custkey")
    return kmv_overlap(a, b, "o_custkey", k=128)


@q("q_salted_join")
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted fact⋈dim join + rollup (operators/skew.salted_join):
    result is identical to the plain join — the salt spreads each hot
    nation key over 16 shuffle buckets and never leaves the operator —
    so the oracle is simply the unsalted SQL. Gives the explicit-salting
    fallback (for skew AQE can't split) a driver-checked row."""
    from fortune_500_financial_insights_pipeline_spark.operators.skew import salted_join

    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    joined = salted_join(c, n, on=["c_nationkey"], salt=16)
    return joined.groupBy("n_name").agg(F.count(F.lit(1)).alias("n_customers"))


@q("q_attribution")
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-/last-touch attribution: for every purchase, the first and the
    most recent touch event (click/view) by the same user strictly before
    it — the conversion-credit query a marketing warehouse runs daily. One
    shuffle on user_id; both credits come from the same ignoreNulls window
    family over the interleaved event stream (no self-join, no as-of pass
    per touch type); purchases with no prior touch keep NULL credits."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    touch = F.when(
        F.col("event_type").isin("click", "view"), F.col("event_id")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    labeled = e.select(
        "event_id",
        "user_id",
        "event_type",
        F.first(touch, ignorenulls=True).over(w).alias("first_touch"),
        F.last(touch, ignorenulls=True).over(w).alias("last_touch"),
    )
    return labeled.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "first_touch", "last_touch"
    )


@q("q_cumulative_users")
def q_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users by day — the running-reach curve. Exact
    without any running COUNT(DISTINCT): each user contributes once at
    their first-seen day (one grouped min), then a cumulative sum over the
    per-day frame. The global window runs over days (bounded domain), not
    events; the heavy reduction is the partial-aggregated first-seen min."""
    e = load_table(spark, sf_dir, "events")
    first = e.select("user_id", F.to_date("ts").alias("day")).groupBy("user_id").agg(
        F.min("day").alias("first_day")
    )
    daily = first.groupBy("first_day").agg(F.count(F.lit(1)).alias("new_users"))
    w = W.orderBy("first_day").rowsBetween(W.unboundedPreceding, 0)
    return daily.select(
        F.date_format("first_day", "yyyy-MM-dd").alias("day"),
        F.sum("new_users").over(w).alias("cum_users"),
    )


@q("q_pop_growth")
def q_pop_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: fixed-point monthly sums (exact,
    partitioning-invariant), one lag over the month frame, growth in
    round-6 percent (NULL for the first month). The window is over months
    — a bounded domain — after the heavy aggregation collapsed orders."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_format(F.to_date("o_orderdate"), "yyyy-MM").alias("month")
    ).agg(F.round(dsum("o_totalprice"), 2).alias("revenue"))
    w = W.orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "month",
        "revenue",
        F.round((F.col("revenue") - prev) / prev * 100, 6).alias("growth_pct"),
    )


@q("q_dup_fraction")
def q_dup_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicate-text fraction (share of 8-word windows also
    found in other docs) — the thresholdable scalar the span detector
    (q_dup_spans) feeds a quality filter (operators/text.dup_fraction)."""
    from fortune_500_financial_insights_pipeline_spark.operators.text import dup_fraction

    d = load_table(spark, sf_dir, "documents")
    return dup_fraction(d, n=8)


@q("q_weighted_sample_grouped")
def q_weighted_sample_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 length-weighted draw per language — the per-source quota form
    of q_weighted_sample (operators/sampling.weighted_sample_per_group),
    WindowGroupLimit-capped so skewed sources can't flood the shuffle."""
    from fortune_500_financial_insights_pipeline_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    d = load_table(spark, sf_dir, "documents").withColumn("w", F.length("text"))
    return weighted_sample_per_group(
        d, ["lang"], "w", ["doc_id"], n_per_group=20
    ).select("lang", "doc_id", "es_score")


@q("q_bm25_search")
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 documents per query for four fixed bag-of-words queries —
    inverted-index retrieval over the q_bm25 postings (operators/tfidf
    .bm25_search): broadcast query-term probe, fixed-point score totals,
    WindowGroupLimit top-k per query. One query carries a term absent
    from the corpus to prove unmatched terms drop without nulling the
    score."""
    from fortune_500_financial_insights_pipeline_spark.operators.tfidf import bm25_search

    d = load_table(spark, sf_dir, "documents")
    queries = spark.createDataFrame(
        [
            (1, "spark join hash"),
            (2, "window agg sort"),
            (3, "stream batch merge"),
            (4, "customer query filter zzzmissingterm"),
        ],
        "query_id int, qtext string",
    )
    return bm25_search(d, queries, k=5)


@q("q_epoch_shuffle")
def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-1 deterministic global shuffle of the documents corpus into 8
    shards (operators/sampling.epoch_shuffle): md5 shard + epoch-salted
    in-shard position. The data-loader contract for sharded pretraining
    corpora — same permutation on every rerun, different permutation next
    epoch, never a single-partition window."""
    from fortune_500_financial_insights_pipeline_spark.operators.sampling import epoch_shuffle

    d = load_table(spark, sf_dir, "documents")
    return epoch_shuffle(d, ["doc_id"], n_shards=8, epoch=1).select(
        "doc_id", "shard", "pos"
    )


@q("q_mv_merge")
def q_mv_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view refresh (operators/incremental): the
    orders history is aggregated as three date-range batches into per-status
    mergeable states, folded, and finalized — and the oracle computes the
    SAME aggregate in ONE direct pass, so the hash check proves batch
    boundaries can't leak into an algebraic aggregate (fixed-point sums
    make the proof exact, not approximate)."""
    from fortune_500_financial_insights_pipeline_spark.operators.incremental import (
        finalize_state,
        grouped_state,
        merge_states,
    )

    o = load_table(spark, sf_dir, "orders")
    batches = [
        o.where(F.col("o_orderdate") < "1994-01-01"),
        o.where(
            (F.col("o_orderdate") >= "1994-01-01")
            & (F.col("o_orderdate") < "1996-07-01")
        ),
        o.where(F.col("o_orderdate") >= "1996-07-01"),
    ]
    states = [grouped_state(b, ["o_orderstatus"], "o_totalprice") for b in batches]
    return finalize_state(merge_states(states, ["o_orderstatus"]), ["o_orderstatus"])


@q("q_pq_topk")
def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN, whole path hash-checked: train 4 codebooks
    (k=4, one Lloyd iteration) over 16-dim subvectors, encode the corpus to
    4 codes/vector, answer the vec_id=0 query via the asymmetric-distance
    LUT, top-20 (operators/pq.py). The oracle replays train→encode→ADC in
    one CTE chain — exact because every step is fixed-point integer
    arithmetic."""
    from fortune_500_financial_insights_pipeline_spark.operators.pq import (
        pq_adc_topk,
        pq_encode,
        pq_train,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    books = _memo_trained(
        ("pq4x4", sf_dir), lambda: pq_train(emb, m=4, k=4, n_iter=1, dim=64)
    )
    qvec = list(emb.filter(F.col("vec_id") == 0).select("embedding").head()[0])
    enc = pq_encode(emb, books, m=4, dim=64)
    return pq_adc_topk(enc, books, qvec, m=4, dim=64, k_top=20)


@q("q_ivfpq_topk")
def q_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ — the production ANN layout at 100 TB (Jégou et al. 2011):
    coarse quantizer routes the query to 2 of 8 trained cells
    (q_ivf_topk's exact chain), and the candidates inside those cells are
    scored from their 4 PQ codes via the asymmetric-distance LUT
    (q_pq_topk's exact chain) — so a query touches n_probe cells of codes,
    never raw vectors. In a materialized deployment codes are computed at
    index time and the cell filter prunes partitions; here encoding sits
    above the filter so Catalyst computes codes only for probed rows —
    identical results, same scan shape. Top-20 by exact integer ADC
    distance, fully hash-checked."""
    from fortune_500_financial_insights_pipeline_spark.operators.kmeans import kmeans_centroids
    from fortune_500_financial_insights_pipeline_spark.operators.pq import (
        pq_adc_topk,
        pq_encode,
        pq_train,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import (
        ivf_index_portable,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    centroids = _memo_trained(
        ("kmeans8x2", sf_dir), lambda: kmeans_centroids(emb, k=8, n_iter=2)
    )
    indexed = ivf_index_portable(emb, centroids)
    qvec, probe = _memo_trained(
        ("q0probe8x2", sf_dir), lambda: _qvec_probe(emb, centroids)
    )
    books = _memo_trained(
        ("pq4x4", sf_dir), lambda: pq_train(emb, m=4, k=4, n_iter=1, dim=64)
    )
    cand = indexed.filter(F.col("cell").isin(probe)).drop("cell")
    enc = pq_encode(cand, books, m=4, dim=64)
    return pq_adc_topk(enc, books, qvec, m=4, dim=64, k_top=20)


@q("q_ivfpq_residual_topk")
def q_ivfpq_residual_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual IVF-PQ — the form production ANN indexes actually ship
    (Jégou et al. 2011 §III): PQ codebooks are trained on residuals to the
    assigned coarse centroid (residuals concentrate near zero, so the same
    m·k code budget quantizes far more finely), the stored row is
    (cell, codes), and the query builds one ADC LUT PER PROBED CELL from
    its own query residual. Coarse chain = q_ivf_topk's (k=8, 2 Lloyd
    iterations, round-6 routing, n_probe=2); residual PQ = m=4, k=4, one
    iteration. Exact integer arithmetic end to end — hash-checked."""
    from fortune_500_financial_insights_pipeline_spark.operators.kmeans import kmeans_centroids
    from fortune_500_financial_insights_pipeline_spark.operators.pq import (
        ivfpq_residual_topk,
        pq_encode_residual,
        pq_train_residual,
    )
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    centroids = _memo_trained(
        ("kmeans8x2", sf_dir), lambda: kmeans_centroids(emb, k=8, n_iter=2)
    )
    qvec, probe = _memo_trained(
        ("q0probe8x2", sf_dir), lambda: _qvec_probe(emb, centroids)
    )
    books = _memo_trained(
        ("pqres4x4", sf_dir),
        lambda: pq_train_residual(emb, centroids, m=4, k=4, n_iter=1, dim=64),
    )
    enc = pq_encode_residual(emb, centroids, books, m=4, dim=64)
    return ivfpq_residual_topk(
        enc, books, centroids, qvec, probe, m=4, dim=64, k_top=20
    )


@q("q_bpe_train")
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three BPE merges learned from the documents corpus
    (operators/bpe.bpe_train): word-frequency table → per-iteration pair
    count / deterministic argmax / leftmost-greedy merge. The oracle
    replays the full training trajectory relationally (gaps-islands parity
    handles overlapping 'aaa' runs), so the learned vocabulary itself is
    hash-checked, not just row counts."""
    from fortune_500_financial_insights_pipeline_spark.operators.bpe import bpe_train

    d = load_table(spark, sf_dir, "documents")
    return bpe_train(d, n_merges=3)


@q("q_bpe_segment")
def q_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize docs 0-49 with the 3 learned merges (operators/bpe
    .bpe_segment) — per-document BPE token counts, the encode half of the
    tokenizer lifecycle, applied as chained map-side HOF projections."""
    from fortune_500_financial_insights_pipeline_spark.operators.bpe import (
        bpe_segment,
        bpe_train,
    )

    d = load_table(spark, sf_dir, "documents")
    merges = [(r["lhs"], r["rhs"]) for r in bpe_train(d, n_merges=3).collect()]
    return bpe_segment(d.filter(F.col("doc_id") < 50), merges)


@q("q_ivfpq_rerank")
def q_ivfpq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full production retrieval stack: residual IVF-PQ ADC shortlists
    50 candidates from the probed cells (codes only — no raw vectors
    touched), then an EXACT cosine rerank over just those 50 raw vectors
    picks the final top-20. At 100 TB the rerank reads 50 rows by id —
    the expensive exactness is paid only where it changes the answer.
    Shortlist is a broadcast semi-join back to the embeddings table."""
    from fortune_500_financial_insights_pipeline_spark.operators.kmeans import kmeans_centroids
    from fortune_500_financial_insights_pipeline_spark.operators.pq import (
        ivfpq_residual_topk,
        pq_encode_residual,
        pq_train_residual,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import (
        cosine_similarity,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    centroids = _memo_trained(
        ("kmeans8x2", sf_dir), lambda: kmeans_centroids(emb, k=8, n_iter=2)
    )
    qvec, probe = _memo_trained(
        ("q0probe8x2", sf_dir), lambda: _qvec_probe(emb, centroids)
    )
    books = _memo_trained(
        ("pqres4x4", sf_dir),
        lambda: pq_train_residual(emb, centroids, m=4, k=4, n_iter=1, dim=64),
    )
    enc = pq_encode_residual(emb, centroids, books, m=4, dim=64)
    short = ivfpq_residual_topk(
        enc, books, centroids, qvec, probe, m=4, dim=64, k_top=50
    ).select("vec_id")
    qarr = F.array(*[F.lit(float(x)) for x in qvec])
    return (
        emb.join(F.broadcast(short), "vec_id")
        .select(
            "vec_id",
            F.round(cosine_similarity(F.col("embedding"), qarr), 6).alias("sim"),
        )
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(20)
    )


@q("q_late_interaction")
def q_late_interaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-vector late-interaction retrieval (operators/similarity
    .late_interaction_topk): labels act as multi-vector documents, vectors
    0-3 as the query's token embeddings; score = Σ per-query-token MaxSim,
    top-5 labels. Broadcast query grid, partial-agged MaxSim, fixed-point
    score sum — hash-exact."""
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import (
        late_interaction_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    qvecs = [
        list(r["embedding"])
        for r in emb.filter(F.col("vec_id") < 4).orderBy("vec_id").collect()
    ]
    return late_interaction_topk(emb, qvecs, k=5)


@q("q_embed_neardup_portable")
def q_embed_neardup_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup detection with the bucketing itself hash-checked
    — the oracle-exact upgrade of q_embed_neardup_lsh (operators/similarity
    .lsh_neardup_pairs_portable): integer-dot hyperplane signatures, bucket
    equi-join, exact fixed-point cosine verify at >= 0.9. The fixture
    embeddings are near-orthogonal (max pairwise cosine 0.48), so the query
    PLANTS 50 near-duplicates (vectors 0-49 rescaled by 1.02 under shifted
    ids — cosine 1.0, scale-invariant) and the detector must return exactly
    those pairs and nothing else; the oracle replays the planting."""
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import (
        lsh_neardup_pairs_portable,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    planted = emb.where(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.02)).alias("embedding"),
    )
    return lsh_neardup_pairs_portable(
        emb.unionByName(planted), dim=64, n_planes=16, min_cosine=0.9
    )


@q("q_minhash_portable")
def q_minhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs with the ENTIRE pipeline hash-checked —
    the oracle-exact certification of q_minhash_neardup's algorithm
    (operators/minhash.minhash_neardup_pairs_portable): md5 double-hashed
    16-seed signatures, 4-band bucketing, within-bucket pair expansion,
    exact-integer Jaccard verify at >= 0.2. Finds the identical pair set
    the xxhash64 production form finds on the fixtures (by test)."""
    from fortune_500_financial_insights_pipeline_spark.operators.minhash import (
        minhash_neardup_pairs_portable,
    )

    d = load_table(spark, sf_dir, "documents")
    return minhash_neardup_pairs_portable(
        d, id_col="doc_id", text_col="text", n_hashes=16, bands=4, min_jaccard=0.2
    )


# ---------------------------------------------------------------------------
# Retrieval compositions: positional phrase search + hybrid rank fusion
# ---------------------------------------------------------------------------


@q("q_phrase_search")
def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-word phrase lookup over a positional inverted index
    (operators/retrieval.phrase_search): postings joined ON TERM to the
    broadcast (phrase, offset, term) list, candidate starts derived as
    ``pos - off``, kept when every offset matched. Counts occurrences and
    first position per (phrase, doc). One phrase repeats a term
    ("window window") to prove DISTINCT-offset matching; one carries a
    term absent from the corpus and must return no rows."""
    from fortune_500_financial_insights_pipeline_spark.operators.retrieval import phrase_search

    d = load_table(spark, sf_dir, "documents")
    phrases = spark.createDataFrame(
        [
            (1, "table part"),
            (2, "scan stream fast"),
            (3, "window window"),
            (4, "big table table"),
            (5, "spark zzznosuchterm"),
        ],
        "phrase_id int, phrase string",
    )
    return phrase_search(d, phrases)


@q("q_rrf_fusion")
def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid related-document retrieval: for three query documents, fuse a
    lexical BM25 top-20 (query = the document's own distinct terms) with a
    dense embedding k-NN top-20 via Reciprocal Rank Fusion
    (operators/retrieval.rrf_fuse, rrf_k=60), keeping the fused top-10.
    Leg ranks are the retrievers' own (self-match dropped from the lexical
    list after ranking, exactly as the oracle does); the fused score is a
    fixed-order IEEE expression so it hash-matches cross-engine."""
    from fortune_500_financial_insights_pipeline_spark.operators.retrieval import rrf_fuse
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import knn_join
    from fortune_500_financial_insights_pipeline_spark.operators.tfidf import bm25_search

    d = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    qids = [0, 7, 42]

    queries = d.where(F.col("doc_id").isin(qids)).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("qtext")
    )
    lex = bm25_search(d, queries, k=20).where(
        F.col("doc_id") != F.col("query_id")
    ).select("query_id", "doc_id", "rank")

    from pyspark.sql.window import Window

    dense_raw = knn_join(emb.where(F.col("vec_id").isin(qids)), emb, k=20)
    wd = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    dense = dense_raw.select(
        F.col("q_id").alias("query_id"),
        F.col("vec_id").alias("doc_id"),
        F.row_number().over(wd).alias("rank"),
    )
    return rrf_fuse([lex, dense], rrf_k=60, topn=10)


@q("q_winnow")
def q_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS winnowing fingerprint selection (operators/winnow): word
    4-gram md5-long hashes, window w=4, min-per-window with rightmost
    ties — the position-robust local dedup signature set. Frame-bounded
    window MIN + an equi-join argmin recovery; density ~2/(w+1) of the
    gram stream by construction."""
    from fortune_500_financial_insights_pipeline_spark.operators.winnow import winnow_fingerprints

    d = load_table(spark, sf_dir, "documents")
    return winnow_fingerprints(d, k=4, w=4)


@q("q_cdc_chunks")
def q_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (operators/chunking.cdc_chunks): boundary
    after any token whose 3-token window hash ≡ 0 mod 16, chunk ids via
    one gaps-islands cumulative window, per-chunk md5 over the ordered
    text — the edit-stable chunk-dedup layout (SOSP'01 LBFS rule)."""
    from fortune_500_financial_insights_pipeline_spark.operators.chunking import cdc_chunks

    d = load_table(spark, sf_dir, "documents")
    return cdc_chunks(d, k=3, divisor=16)


@q("q_bigram_lm")
def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram-LM quality score (operators/text.bigram_logprob,
    λ=0.7 Jelinek–Mercer): per-doc average log2(λ·p(w2|w1) + 0.3·p(w2))
    under the corpus's own counts — catches word-order breakage the
    unigram signal (q_unigram_logprob) cannot. Exact count ratios,
    fixed-point doc sums: oracle-exact."""
    from fortune_500_financial_insights_pipeline_spark.operators.text import bigram_logprob

    d = load_table(spark, sf_dir, "documents")
    return bigram_logprob(d, lam=0.7)


@q("q_cluster_sample")
def q_cluster_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced diversity sampling: md5-seeded 8-cell coarse
    quantizer (same portable routing as q_semdedup), then an md5-priority
    top-10 per cell — equal representation per embedding cluster, the
    diversity-preserving subset selection a curation pipeline runs before
    expensive scoring. WindowGroupLimit caps the per-cell shuffle."""
    from pyspark.sql.window import Window
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import (
        ivf_index_portable,
        md5_sample_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    centroids = md5_sample_centroids(emb, k=8)
    idx = ivf_index_portable(emb, centroids)
    w = Window.partitionBy("cell").orderBy(
        F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
    )
    return (
        idx.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 10)
        .select("vec_id", "label", F.col("cell").cast("long").alias("cell"), "rk")
    )


@q("q_dsir_select")
def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (operators/dsir): score every non-English
    document's hashed-bigram bag by its importance log-weight toward the
    English subcorpus (64 md5 buckets, add-0.5 smoothing), keep the
    top-50. The quota cut is a TakeOrdered limit; the 50-row rank window
    runs after the cut, so nothing corpus-sized funnels through one
    partition."""
    from pyspark.sql.window import Window
    from fortune_500_financial_insights_pipeline_spark.operators.dsir import dsir_logweights

    d = load_table(spark, sf_dir, "documents")
    scored = dsir_logweights(
        d.where(F.col("lang") != "en"), d.where(F.col("lang") == "en"),
        n_buckets=64, alpha=0.5,
    )
    top = scored.orderBy(F.desc("logw"), F.asc("doc_id")).limit(50)
    w = Window.orderBy(F.desc("logw"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w))


@q("q_strip_dup_spans")
def q_strip_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-dedup REMOVAL (Lee et al. 2022): drop every disjoint
    20-word chunk whose content occurs in >=2 distinct documents, and
    reassemble the surviving text per doc (operators/dedup.
    strip_duplicate_chunks). q_dup_spans is the detector; this is the edit
    that produces the cleaned corpus. Oracle replays the chunking, hash
    counting, and ordered string_agg reassembly verbatim."""
    from fortune_500_financial_insights_pipeline_spark.operators.dedup import strip_duplicate_chunks

    d = load_table(spark, sf_dir, "documents")
    return strip_duplicate_chunks(d, id_col="doc_id", text_col="text",
                                  chunk_words=20, min_docs=2)


@q("q_split_assign")
def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split assignment (operators/sampling.
    split_assign): md5(doc_id) lands each doc in a fixed hash-space band —
    80/10/10 — so the assignment is engine-portable and stable across
    corpus refreshes. Output is the per-(lang, split) doc count, the
    release-audit view of the split."""
    from fortune_500_financial_insights_pipeline_spark.operators.sampling import split_assign

    d = load_table(spark, sf_dir, "documents")
    assigned = split_assign(d, ["doc_id"], {"train": 0.8, "val": 0.1, "test": 0.1})
    return assigned.groupBy("lang", "split").agg(F.count(F.lit(1)).alias("n_docs"))


@q("q_pairwise_corr")
def q_pairwise_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-series correlation matrix: Pearson correlation between every
    pair of supplier daily-price series, date-aligned by an equi-join on
    the day (the cross-ticker analytics view a finance warehouse derives —
    the reference's Tableau layer shows per-ticker series; this is the
    pairwise extension). The series interior is exact fixed-point (davg),
    so both engines correlate identical inputs; the join key is the day,
    suppliers restricted to a 10-ticker watchlist so the pair fan-out is
    bounded (45 pairs x trading days)."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_suppkey") <= 10)
    series = li.groupBy(
        "l_suppkey", F.date_format("l_shipdate", "yyyy-MM-dd").alias("day")
    ).agg(davg("l_extendedprice").alias("close"))
    a = series.select(
        F.col("l_suppkey").alias("supp_a"), "day", F.col("close").alias("ca")
    )
    b = series.select(
        F.col("l_suppkey").alias("supp_b"), "day", F.col("close").alias("cb")
    )
    return (
        a.join(b, "day")
        .where(F.col("supp_a") < F.col("supp_b"))
        .groupBy("supp_a", "supp_b")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(F.corr("ca", "cb"), 6).alias("corr_close"),
        )
    )


# ---------------------------------------------------------------------------
# Round-2 batch F: CDC diff, layout, distribution transforms, diagnostics
# ---------------------------------------------------------------------------


@q("q_snapshot_diff")
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch CDC between two deterministic snapshots of orders
    (operators/cdc.snapshot_diff): old = orders minus keys % 97 == 0,
    new = orders minus keys % 89 == 0 with totalprice bumped one cent on
    keys % 13 == 0 — classify insert/delete/update per key (unchanged
    rows are filtered: the change SET is the deliverable a merge
    consumes). Compared columns are pre-stringified portably (status
    string + price in integer cents) so the md5 change digest is
    engine-identical. The reference reloads raw layers wholesale per DAG
    run (dags/ re-land every tick); this derives the incremental form."""
    from fortune_500_financial_insights_pipeline_spark.operators.cdc import snapshot_diff

    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    base = o.select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status_s"),
        cents.alias("price_cents"),
    )
    old = base.where(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey", "status_s", F.col("price_cents").cast("string").alias("price_s")
    )
    new = base.where(F.col("o_orderkey") % 89 != 0).select(
        "o_orderkey",
        "status_s",
        F.when(F.col("o_orderkey") % 13 == 0, F.col("price_cents") + 1)
        .otherwise(F.col("price_cents"))
        .cast("string")
        .alias("price_s"),
    )
    diff = snapshot_diff(old, new, ["o_orderkey"], ["status_s", "price_s"])
    return diff.where(F.col("action") != "unchanged").select(
        "o_orderkey", "action"
    )


@q("q_zorder")
def q_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout audit (operators/zorder.with_zvalue): Morton-
    interleave 8-bit normalized (o_custkey, o_orderdate-as-epoch-day)
    and report, per 256-wide z-range (the would-be file), row count and
    the min/max envelope of BOTH dimensions — the statistics a reader
    prunes on. The oracle replays the interleave bit-by-bit, certifying
    the layout key itself, not just the plumbing. Multi-dim clustering is
    the lake-layout step OSS Spark leaves to table services."""
    from fortune_500_financial_insights_pipeline_spark.operators.zorder import with_zvalue

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date")).alias("epoch_day"),
    )
    z = with_zvalue(o, ["o_custkey", "epoch_day"], bits=8, out_col="zval")
    return (
        z.groupBy((F.col("zval") / 256).cast("long").alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_custkey").alias("min_cust"),
            F.max("o_custkey").alias("max_cust"),
            F.min("epoch_day").alias("min_day"),
            F.max("epoch_day").alias("max_day"),
        )
    )


@q("q_ewma")
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Finite-horizon EWMA smoothing (operators/timeseries.ewma_finite)
    of each supplier's daily average price — the monitoring smoother the
    reference's Tableau layer approximates with moving averages, in the
    bounded-lag exact form (a=0.5 → power-of-two weights; 10 lags).
    Oracle mirrors the identical lag-by-lag IEEE expression."""
    from fortune_500_financial_insights_pipeline_spark.operators.timeseries import ewma_finite

    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_suppkey") <= 20)
    daily = li.groupBy(
        "l_suppkey", F.date_format("l_shipdate", "yyyy-MM-dd").alias("day")
    ).agg(davg("l_extendedprice").alias("close"))
    sm = ewma_finite(daily, ["l_suppkey"], ["day"], "close", alpha=0.5, horizon=10)
    return sm.select(
        "l_suppkey", "day", F.round("close", 6).alias("close"),
        F.round("ewma", 6).alias("ewma"),
    )


@q("q_quantile_norm")
def q_quantile_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization across sources (operators/normalize.
    quantile_normalize): per-source quality scores are forced onto a
    common empirical distribution before corpus mixing — the alignment
    step that stops one source's generous scorer from dominating a
    score-thresholded blend. Value = doc length; groups = source."""
    from fortune_500_financial_insights_pipeline_spark.operators.normalize import (
        quantile_normalize,
    )

    d = load_table(spark, sf_dir, "documents")
    out = quantile_normalize(
        d.select("doc_id", "source", F.col("n_chars").cast("double").alias("v")),
        "source", "v", order_tiebreak=["doc_id"],
    )
    return out.select("doc_id", "source", "v", F.round("qnorm", 6).alias("qnorm"))


@q("q_robust_scale")
def q_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/IQR robust scaling per event type (operators/normalize.
    robust_scale): heavy-tailed `value` series centered and spread
    without letting outliers set the scale — exact interpolated
    percentiles, identical in both engines."""
    from fortune_500_financial_insights_pipeline_spark.operators.normalize import robust_scale

    e = load_table(spark, sf_dir, "events")
    out = robust_scale(
        e.select("event_id", "event_type", "value"), "event_type", "value"
    )
    return out.select(
        "event_id", "event_type", F.round("value", 6).alias("value"),
        F.round("scaled", 6).alias("scaled"),
    )


@q("q_skew_profile")
def q_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostic (operators/skew.key_skew_profile) on
    lineitem.l_orderkey — the one-row profile (distinct keys, hottest
    key's multiplier over the mean, top-10 share) that decides between
    AQE skew-split and explicit salting before a big join lands."""
    from fortune_500_financial_insights_pipeline_spark.operators.skew import key_skew_profile

    li = load_table(spark, sf_dir, "lineitem")
    p = key_skew_profile(li, "l_orderkey", top_n=10)
    return p.select(
        "n_rows", "n_keys", "max_freq",
        F.round("skew_ratio", 6).alias("skew_ratio"),
        "top1_share", "topn_share",
    )


@q("q_mutual_knn")
def q_mutual_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal k-NN pairs over embeddings (operators/similarity.
    mutual_knn_pairs): high-precision near-dup edges — (a,b) each in the
    other's exact cosine top-5 — the edge filter semantic clustering
    builds on. Restricted to vec_id < 300 so the oracle's quadratic
    replay stays cheap; the Spark path is the broadcast-kNN + edge-list
    semi-join that scales past it."""
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import (
        mutual_knn_pairs,
    )

    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 300)
    return mutual_knn_pairs(e, k=5).orderBy("id_a", "id_b")


@q("q_apply_changes")
def q_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE round trip (operators/cdc.apply_changeset): build the same
    old/new order snapshots q_snapshot_diff uses, derive the changeset
    (diff actions joined to the new-side payload), apply it to OLD — the
    result must BE the new snapshot, row for row, which is exactly what
    the oracle asserts (its SQL is just the new-snapshot expression).
    This proves the incremental-load path reconstructs the wholesale
    reload the reference's DAGs perform (dags/ re-land raw layers every
    tick), at changeset cost instead of table cost."""
    from fortune_500_financial_insights_pipeline_spark.operators.cdc import (
        apply_changeset,
        snapshot_diff,
    )

    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    base = o.select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status_s"),
        cents.alias("price_cents"),
    )
    old = base.where(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey", "status_s", F.col("price_cents").cast("string").alias("price_s")
    )
    new = base.where(F.col("o_orderkey") % 89 != 0).select(
        "o_orderkey",
        "status_s",
        F.when(F.col("o_orderkey") % 13 == 0, F.col("price_cents") + 1)
        .otherwise(F.col("price_cents"))
        .cast("string")
        .alias("price_s"),
    )
    diff = snapshot_diff(old, new, ["o_orderkey"], ["status_s", "price_s"])
    changeset = diff.select("o_orderkey", "action").join(
        new, "o_orderkey", "left"
    )
    return apply_changeset(old, changeset, ["o_orderkey"], ["status_s", "price_s"])


@q("q_column_profile")
def q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style one-pass dataset profile (checks.profile_columns) over
    customer: per column, row/non-null/distinct counts, null fraction and
    stringified min/max — the per-snapshot stats sheet completeness and
    cardinality-drift gates diff. acctbal is pre-cast to integer cents so
    no double ever needs a cross-engine string form. One scan for all
    five columns (multi count-distinct plans via Expand)."""
    from fortune_500_financial_insights_pipeline_spark.checks import profile_columns

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("acctbal_cents"),
    )
    return profile_columns(
        c, ["c_custkey", "c_name", "c_nationkey", "c_mktsegment", "acctbal_cents"]
    )


@q("q_seasonal_decompose")
def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of the daily order-count series
    (operators/timeseries.seasonal_decompose, period 7): centered
    moving-average trend, zero-centered per-phase seasonal, residual —
    interior days only. The series frame is aggregate-sized (one row per
    order date), so the decomposition's global sort never touches raw
    rows. Exact by construction: integer window sums, 6dp-fixed-point
    phase means centered in integer space, one deterministic division
    per emitted double."""
    from fortune_500_financial_insights_pipeline_spark.operators.timeseries import (
        seasonal_decompose,
    )

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return seasonal_decompose(daily, "d", "n", period=7)


@q("q_acf")
def q_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation r_1..r_7 of the daily order-count series
    (operators/timeseries.acf_exact) — the periodicity probe run before
    committing to a seasonal period. n-scaled integer centering makes
    numerator and denominator exact long sums; each r_k is one
    deterministic double division, so the whole curve hash-matches the
    oracle."""
    from fortune_500_financial_insights_pipeline_spark.operators.timeseries import acf_exact

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return acf_exact(daily, "d", "n", max_lag=7)


@q("q_cusum")
def q_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM mean-shift scan over the daily order-count series
    (operators/timeseries.cusum_peaks): top-5 |running centered sum|
    days — where the series most likely changed level (feed drift /
    source-volume shifts the reference's wholesale reloads would never
    notice). Integer-exact end to end; ties break on the day."""
    from fortune_500_financial_insights_pipeline_spark.operators.timeseries import cusum_peaks

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return cusum_peaks(daily, "d", "n", top_n=5)


@q("q_random_projection")
def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss shortlist probe (operators/rproj.rp_knn):
    project the 64-dim embeddings to 8 exact-integer components with the
    shared ±1 Achlioptas sign matrix (functions/planes — the oracle
    generates the identical matrix) and rank the top-20 neighbours of
    vec_id 0 by exact projected squared-L2. The projection is a map-side
    HOF fold (zero shuffle) and the ranking a TakeOrdered — the
    dimensionality-reduction leg a 100 TB duplicate-triage pass runs
    before exact scoring."""
    from fortune_500_financial_insights_pipeline_spark.operators.rproj import rp_knn

    emb = load_table(spark, sf_dir, "embeddings")
    return rp_knn(emb, query_id=0, dim=64, m=8, k=20)


@q("q_hard_negatives")
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining (operators/similarity.hard_negatives): for
    each of the first 10 vectors, the 5 most-cosine-similar vectors with
    a DIFFERENT label — the near-miss negatives a contrastive trainer
    batches because random negatives are too easy. Same broadcast-query
    staged-norm plan as q_knn_join with the label predicate on the pair
    filter; round-6 similarities keep the ranking oracle-exact."""
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import hard_negatives

    emb = load_table(spark, sf_dir, "embeddings")
    return hard_negatives(emb, n_queries=10, k=5)


@q("q_line_dedup")
def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repeated-line fraction (operators/text.
    line_dup_stats) — the Gopher/C4 self-repetition rule: a doc
    repeating its own sentence units is boilerplate even if no other doc
    shares them (the cross-doc detector q_dup_spans can't see it). Pure
    map-side array algebra, zero shuffle."""
    from fortune_500_financial_insights_pipeline_spark.operators.text import line_dup_stats

    d = load_table(spark, sf_dir, "documents")
    return line_dup_stats(d)


@q("q_containment")
def q_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark containment scores (operators/setjoin.containment_scores):
    |B ∩ A| / |B| of each benchmark doc's distinct word-bigrams in each
    corpus doc — the normalized decontamination score ranked and audited
    after q_decontaminate's cheap shared-gram gate (GPT-3 appendix C
    measures eval contamination this way). Candidates meet on the GRAM
    (broadcast benchmark side), never pairwise."""
    from fortune_500_financial_insights_pipeline_spark.operators import text as TX
    from fortune_500_financial_insights_pipeline_spark.operators.setjoin import containment_scores

    d = load_table(spark, sf_dir, "documents")
    grams = d.select(
        "doc_id", F.explode(TX.word_ngrams("text", 2)).alias("gram")
    ).distinct()
    bench = grams.where(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("bench_id"), "gram"
    )
    return containment_scores(
        grams.where(F.col("doc_id") >= 5), bench, min_containment=0.05
    )


@q("q_theil_sen")
def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of the 1998 daily order-count series
    (operators/timeseries.theil_sen_slope): median of all pairwise
    slopes — outlier days can't drag it the way they drag the OLS family
    (q_regr_agg). The pair expansion runs on the aggregate-sized series
    frame only."""
    from fortune_500_financial_insights_pipeline_spark.operators.timeseries import theil_sen_slope

    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("d") >= F.lit("1998-01-01").cast("date"))
        .select(
            F.datediff("d", F.lit("1998-01-01").cast("date")).alias("t"), "n"
        )
    )
    return theil_sen_slope(daily, "t", "n")


@q("q_benford")
def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of order totals (checks.
    benford_digit_audit) — the fraud/mis-scaling screen a financial
    feed gets on landing: naturally-occurring prices follow log-uniform
    first digits. Expected shares are Python-computed literals embedded
    identically in the Spark plan and the oracle, so no cross-engine
    libm log10 enters the query."""
    from fortune_500_financial_insights_pipeline_spark.checks import benford_digit_audit

    o = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    return benford_digit_audit(o, "cents")


@q("q_binary_format")
def q_binary_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal format triage (operators/multimodal.detect_format):
    detect png/jpeg/gif/webp/unknown from MAGIC BYTES of a binary media
    column and report per-format counts + byte totals — the routing step
    before format-specific decoders, and unlike the decode path it needs
    no media library, so the real operator is oracle-checked end to end.
    The fixture synthesizes deterministic binaries (documents' md5 bytes
    behind a per-doc magic prefix); production bytes arrive via
    read_media_dir. Hex-prefix algebra, zero shuffle before the 5-group
    aggregate."""
    from fortune_500_financial_insights_pipeline_spark.operators.multimodal import detect_format

    d = load_table(spark, sf_dir, "documents")
    m = F.col("doc_id") % 5
    prefix = (
        F.when(m == 0, F.lit("89504E47"))
        .when(m == 1, F.lit("FFD8FFE0"))
        .when(m == 2, F.lit("47494638"))
        .when(m == 3, F.lit("52494646AABBCCDD57454250"))
        .otherwise(F.lit("00112233"))
    )
    media = F.unhex(F.concat(prefix, F.substring(F.md5("text"), 1, 16)))
    return (
        d.select(detect_format(media).alias("format"), F.length(media).alias("__nb"))
        .groupBy("format")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__nb").alias("total_bytes"),
        )
    )


@q("q_kcore")
def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core of the user co-activity graph (operators/graph.kcore):
    users are linked when they act in >= 2 shared (hour, event_type)
    buckets — the co-occurrence projection every interaction graph
    starts from — then degree < 4 nodes peel for 3 rounds. The
    dense-region filter fringe users fall out of before community work.
    The oracle unrolls the identical 3 peels over the identical edge
    set, so the surviving (node, degree) frame is hash-exact; the
    fixture converges inside the budget (a further round removes
    nothing, by test). Candidate pairs meet in an equi-join on the
    BUCKET (never user×user), so edge building shuffles bucket-sized
    groups."""
    from fortune_500_financial_insights_pipeline_spark.operators.graph import kcore

    e = load_table(spark, sf_dir, "events")
    ub = e.select(
        F.col("user_id").alias("u"),
        F.date_trunc("hour", "ts").alias("h"),
        F.col("event_type").alias("t"),
    ).distinct()
    a = ub.select(F.col("u").alias("id_a"), "h", "t")
    b = ub.select(F.col("u").alias("id_b"), "h", "t")
    edges = (
        a.join(b, ["h", "t"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__shared"))
        .where(F.col("__shared") >= 2)
        .select("id_a", "id_b")
    )
    return kcore(edges, k=4, rounds=3)


@q("q_weighted_median")
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantity-weighted lower median price per return flag
    (operators/normalize.weighted_median): the smallest price-cents value
    at which half the shipped QUANTITY trades at or below — the
    volume-weighted midpoint row-weighted medians misstate. Exact long
    cumulative weights; threshold-crossing value is tie-permutation
    invariant."""
    from fortune_500_financial_insights_pipeline_spark.operators.normalize import weighted_median

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_cents"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    return weighted_median(li, ["l_returnflag"], "price_cents", "qty")


@q("q_interval_coverage")
def q_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-of-intervals coverage per user (operators/intervaljoin.
    interval_coverage): events become [ts, ts + dur) activity windows
    (dur derived deterministically from the value column) and
    overlapping windows merge before summing — actual covered seconds,
    where SUM(end-start) double-counts every overlap. Gaps-islands on
    the running prior-end max; exact long arithmetic (timestamps
    truncated to whole epoch seconds on both engines)."""
    from fortune_500_financial_insights_pipeline_spark.operators.intervaljoin import (
        interval_coverage,
    )

    e = load_table(spark, sf_dir, "events")
    s = F.col("ts").cast("long")
    dur = F.abs(F.round(F.col("value") * 100).cast("long")) % 3600 + 60
    iv = e.select("user_id", s.alias("s"), (s + dur).alias("e"))
    return interval_coverage(iv, "user_id", "s", "e")


@q("q_source_overlap")
def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source boilerplate overlap matrix: for every source pair,
    the number of distinct 8-word span hashes BOTH sources contain — the
    mixing diagnostic run before weighting sources (q_mix_sources):
    heavily-overlapping sources double-bill their shared boilerplate
    under independent per-source caps. Same span construction as
    q_dup_spans (all post-explode work on the 32-byte md5 key); the pair
    join runs on distinct (source, hash) rows — source-count-bounded,
    never doc×doc."""
    from fortune_500_financial_insights_pipeline_spark.operators.compact import (
        ensure_min_parallelism,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.text import tokens

    d = load_table(spark, sf_dir, "documents")
    src = ensure_min_parallelism(
        d.select("source", tokens(F.col("text")).alias("__tk")), "doc_id"
    )
    tk = F.col("__tk")
    windows = F.transform(
        F.sequence(F.lit(0), F.size(tk) - 8),
        lambda i: F.md5(F.array_join(F.slice(tk, i + 1, 8), " ")),
    )
    spans = (
        src.where(F.size(tk) >= 8)
        .select("source", F.explode(windows).alias("span_hash"))
        .distinct()
    )
    a = spans.select(F.col("source").alias("source_a"), "span_hash")
    b = spans.select(F.col("source").alias("source_b"), "span_hash")
    return (
        a.join(b, "span_hash")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("shared_spans"))
    )


@q("q_label_centroids")
def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space QA: per label, member count and the cosine of the
    label's centroid against the global centroid — the drift/collapse
    probe (a label whose centroid hugs the global mean carries no
    signal; one far away is a candidate batch artifact). Cosine of SUM
    vectors (scale-invariant, so means never need dividing): components
    fixed-pointed at 1e4, per-(label, dim) exact long sums, global sums
    derived FROM the label sums (one extra tiny aggregate, no second
    corpus pass), dot/norms as exact long products — margin vs int64
    overflow holds to ~60k vectors at this scale; beyond that the
    production path drops to doubles and forfeits the hash check."""
    emb = load_table(spark, sf_dir, "embeddings")
    vfix = F.transform(
        F.col("embedding"), lambda x: F.round(x.cast("double") * 10000).cast("long")
    )
    comp = emb.select(
        "label", F.posexplode(vfix).alias("pos", "x")
    )
    lab = comp.groupBy("label", "pos").agg(F.sum("x").alias("s"))
    glob = lab.groupBy("pos").agg(F.sum("s").alias("g"))
    n = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    j = lab.join(glob, "pos")
    dots = j.groupBy("label").agg(
        F.sum(F.col("s") * F.col("g")).alias("__dot"),
        F.sum(F.col("s") * F.col("s")).alias("__n2l"),
    )
    n2g = glob.agg(F.sum(F.col("g") * F.col("g")).alias("__n2g"))
    cos = F.round(
        F.col("__dot").cast("double")
        / (F.sqrt(F.col("__n2l").cast("double")) * F.sqrt(F.col("__n2g").cast("double"))),
        6,
    )
    return (
        dots.crossJoin(F.broadcast(n2g))
        .join(n, "label")
        .select("label", "n", cos.alias("cos_to_global"))
    )


@q("q_golden_record")
def q_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship / golden record (operators/fuzzy.golden_record): the
    fixture synthesizes three customer versions with deterministic
    per-attribute nulls; the merge must carry, per attribute, the most
    recent NON-NULL value — the MDM rule keep-latest row dedup
    (q_dedup_keep_latest) gets wrong whenever the newest version is
    partially filled. One window family per cluster, every attribute on
    the same sort."""
    from fortune_500_financial_insights_pipeline_spark.operators.fuzzy import golden_record

    c = load_table(spark, sf_dir, "customer")
    versions = c.select(
        "c_custkey", "c_name", "c_mktsegment",
        F.explode(F.sequence(F.lit(1), F.lit(3))).alias("v"),
    ).select(
        "c_custkey",
        "v",
        F.when((F.col("c_custkey") + F.col("v")) % 3 == 0, F.lit(None)).otherwise(
            F.concat(F.col("c_name"), F.lit("#"), F.col("v").cast("string"))
        ).alias("name_s"),
        F.when((F.col("c_custkey") * F.col("v")) % 4 == 0, F.lit(None)).otherwise(
            F.concat(F.col("c_mktsegment"), F.lit("/"), F.col("v").cast("string"))
        ).alias("seg_s"),
    )
    return golden_record(versions, "c_custkey", "v", ["name_s", "seg_s"])


@q("q_twap")
def q_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (operators/timeseries.
    time_weighted_avg): each event's value holds until the user's next
    event, so burst periods don't overweight the mean — the TWAP
    benchmark convention from the reference's finance domain applied to
    the event stream. Exact long value×duration sums; event_id tiebreak
    makes the segment pairing total-order deterministic."""
    from fortune_500_financial_insights_pipeline_spark.operators.timeseries import (
        time_weighted_avg,
    )

    e = load_table(spark, sf_dir, "events")
    return time_weighted_avg(
        e, "user_id", "ts", "value", scale=100, tiebreak_cols=("event_id",)
    )


@q("q_transition_matrix")
def q_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transitions between event types
    (operators/paths.transition_matrix): counts and row-conditional
    probabilities of consecutive per-user event pairs — the
    where-do-they-go-next flow statistic. One lag window on the
    sessionization sort, one partial-agged groupBy, broadcast row
    totals."""
    from fortune_500_financial_insights_pipeline_spark.operators.paths import transition_matrix

    e = load_table(spark, sf_dir, "events")
    return transition_matrix(e, "user_id", ["ts", "event_id"], "event_type")


@q("q_delta_agg")
def q_delta_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta aggregate refresh (operators/incremental.delta_agg_refresh):
    maintain the per-status (order count, value sum) aggregate from a
    CDC changeset — +new/−old contributions fold into the previous
    aggregate by a state-sized groupBy, never a rescan (the UPDATE/
    DELETE-capable form of the append-only MV merge). The oracle is the
    DIRECT aggregate over the new snapshot, so the hash check proves the
    refresh law, including group-moving updates (keys % 13 bump prices)
    and vanished groups."""
    from fortune_500_financial_insights_pipeline_spark.operators.incremental import (
        delta_agg_refresh,
    )

    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    base = o.select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status_s"),
        cents.alias("price_cents"),
    )
    old = base.where(F.col("o_orderkey") % 97 != 0)
    new = base.where(F.col("o_orderkey") % 89 != 0).select(
        "o_orderkey",
        "status_s",
        F.when(F.col("o_orderkey") % 13 == 0, F.col("price_cents") + 1)
        .otherwise(F.col("price_cents"))
        .alias("price_cents"),
    )
    old_agg = old.groupBy("status_s").agg(
        F.count(F.lit(1)).alias("n"), F.sum("price_cents").alias("s")
    )
    return delta_agg_refresh(
        old_agg, old, new, ["o_orderkey"], "status_s",
        count_alias="n", sum_col="price_cents", sum_alias="s",
    )


@q("q_info_gain")
def q_info_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information of order priority → order status
    (operators/stats.info_gain): the feature-screening statistic (does
    this categorical predict anything?) from exact contingency counts —
    entropies via per-row log2 terms folded in fixed point, so the
    bits hash-match the oracle."""
    from fortune_500_financial_insights_pipeline_spark.operators.stats import info_gain

    o = load_table(spark, sf_dir, "orders")
    return info_gain(o, "o_orderpriority", "o_orderstatus")


@q("q_gini")
def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration
    (operators/stats.gini_coefficient): sorted-rank formula over the
    per-customer order-value totals — exact long Σi·x and Σx, one
    aggregate-sized global sort. The how-concentrated-is-revenue number
    a dashboard quotes next to the top-N table (q_topk)."""
    from fortune_500_financial_insights_pipeline_spark.operators.stats import gini_coefficient

    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("val")
    )
    return gini_coefficient(per_cust, "val", "o_custkey")


@q("q_drawdown")
def q_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per supplier price series (operators/timeseries.
    max_drawdown): deepest peak-to-trough loss of the daily average
    price — the worst-case risk number next to the cumulative-return
    chart the reference's Tableau layer draws. One window pass + one
    re-aggregate, both shuffling only on the supplier key."""
    from fortune_500_financial_insights_pipeline_spark.operators.timeseries import max_drawdown

    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_suppkey") <= 20)
    daily = li.groupBy(
        "l_suppkey", F.date_format("l_shipdate", "yyyy-MM-dd").alias("day")
    ).agg(F.round(davg("l_extendedprice"), 6).alias("close"))
    return max_drawdown(daily, ["l_suppkey"], ["day"], "close").orderBy("l_suppkey")


@q("q_var_es")
def q_var_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Historical VaR-95 + expected shortfall of order values per
    priority class (operators/stats.historical_var_es): the order
    statistic at the integer-exact ceil(0.95·n) rank and the fixed-point
    mean of the at-or-above tail — quantile risk without float
    interpolation, so it hash-matches the oracle exactly."""
    from fortune_500_financial_insights_pipeline_spark.operators.stats import historical_var_es

    o = load_table(spark, sf_dir, "orders")
    return historical_var_es(
        o, ["o_orderpriority"], "o_totalprice", "o_orderkey"
    ).orderBy("o_orderpriority")


@q("q_shortest_path")
def q_shortest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS hop counts (operators/graph.bfs_hops) over the
    supplier↔customer trade graph (same bipartite node space as
    q_pagerank): minimum link distance from the seed suppliers
    (s_suppkey ≤ 3) truncated at 4 rounds — the within-N-hops
    reachability primitive. Each round is one equi-join on the vertex
    key + a min-merge; the unrolled recurrence replays stage-by-stage
    as oracle CTEs."""
    from fortune_500_financial_insights_pipeline_spark.operators.graph import bfs_hops

    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_orderkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("l_suppkey").cast("long").alias("id_a"),
            (F.lit(1000000) + F.col("o_custkey")).cast("long").alias("id_b"),
        )
        .distinct()
    )
    seeds = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_suppkey") <= 3)
        .select(F.col("s_suppkey").cast("long").alias("id"))
    )
    return bfs_hops(edges, seeds, rounds=4).orderBy("id")


@q("q_perplexity_bucket")
def q_perplexity_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source decile bucketing of the corpus-LM quality score
    (q_unigram_logprob's signal): documents ranked by avg token
    log-probability within their source and cut into ntile(10) buckets —
    the stratification step before perplexity-thresholded filtering
    (keep the top-k deciles per source, not a single global cutoff that
    empties small sources). One extra shuffle on source for the ranking
    window; bucket stats re-aggregate on (source, bucket)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    ).where(F.col("tok") != "")
    doc_tok = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("n_dt"))
    vocab = doc_tok.groupBy("tok").agg(F.sum("n_dt").alias("n_t"))
    total = vocab.agg(F.sum("n_t").alias("n_total"))
    term = F.col("n_dt") * F.log2(F.col("n_t") / F.col("n_total"))
    scored = (
        doc_tok.join(vocab, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(F.round(dsum(term) / F.sum("n_dt"), 6).alias("score"))
    )
    src = docs.select("doc_id", "source").join(scored, "doc_id")
    w = W.partitionBy("source").orderBy("score", "doc_id")
    bucketed = src.select("source", "score", F.ntile(10).over(w).alias("bucket"))
    return bucketed.groupBy("source", "bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(davg("score"), 6).alias("avg_score"),
        F.round(F.min("score"), 6).alias("min_score"),
    )


@q("q_code_detect")
def q_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose triage (operators/text.code_detect): line-level code
    signals + symbol density route documents to a code-specific branch
    before expensive classifiers — C4/RefinedWeb pipelines run exactly
    this class of cheap regex gate first. Row-local, zero shuffle."""
    from fortune_500_financial_insights_pipeline_spark.operators.text import code_detect

    return code_detect(load_table(spark, sf_dir, "documents"))


@q("q_ks_test")
def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov drift statistic
    (operators/stats.ks_statistic) between the value distributions of
    two event types — the did-the-distribution-shift check a pipeline
    runs when a new source lands. Counts aggregate per distinct value
    first (shuffle bounded by value cardinality), so the window pass is
    aggregate-sized."""
    from fortune_500_financial_insights_pipeline_spark.operators.stats import ks_statistic

    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value").cast("double"), 6).alias("value")
    )
    return ks_statistic(e, "event_type", "value", "click", "purchase")


def _scored_labeled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier probs (q_classifier_score's exact model) joined with the
    binary is-English label — the shared eval frame for AUC/calibration."""
    from fortune_500_financial_insights_pipeline_spark.operators.text import classifier_score

    d = load_table(spark, sf_dir, "documents")
    weights = spark.range(256).select(
        F.col("id").cast("int").alias("bucket"),
        ((F.col("id") % 21) * 50 - 500).cast("long").alias("w_fp"),
    )
    scored = classifier_score(d, weights)
    return scored.join(
        d.select("doc_id", (F.col("lang") == "en").cast("long").alias("label")),
        "doc_id",
    )


@q("q_auc")
def q_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-corrected ROC AUC (operators/stats.roc_auc) of the
    hashed-feature classifier's probability against the is-English
    label — the ranking-quality number a curation pipeline tracks per
    classifier snapshot. Doubled-rank integer arithmetic end to end, so
    the statistic hash-matches the oracle."""
    from fortune_500_financial_insights_pipeline_spark.operators.stats import roc_auc

    return roc_auc(_scored_labeled_docs(spark, sf_dir), "prob", "label")


@q("q_calibration")
def q_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins (operators/stats.calibration_bins) for the
    same classifier: mean predicted probability vs observed positive rate
    per equal-width bin — ranking (q_auc) and honesty measured off one
    shared scored frame."""
    from fortune_500_financial_insights_pipeline_spark.operators.stats import calibration_bins

    return calibration_bins(
        _scored_labeled_docs(spark, sf_dir), "prob", "label"
    ).orderBy("bin")


@q("q_chi2")
def q_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-squared independence test (operators/stats.
    chi2_independence) on order priority × status — the frequentist
    companion to q_info_gain's mutual information over the same
    contingency scan, zero cells included via the observed-category
    cross."""
    from fortune_500_financial_insights_pipeline_spark.operators.stats import chi2_independence

    o = load_table(spark, sf_dir, "orders")
    return chi2_independence(o, "o_orderpriority", "o_orderstatus")


@q("q_woe_iv")
def q_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value bands (operators/stats.
    woe_iv) of the classifier probability vs the is-English label — the
    credit-scoring-style readout of how much separation each score band
    carries, Laplace-smoothed so empty bands stay finite. Shares the
    scored frame with q_auc / q_calibration."""
    from fortune_500_financial_insights_pipeline_spark.operators.stats import woe_iv

    return woe_iv(_scored_labeled_docs(spark, sf_dir), "prob", "label").orderBy("bin")


@q("q_psi")
def q_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index (operators/stats.psi) between click and
    purchase event-value distributions over 10 fixed bins on [0, 500) —
    the drift alarm a risk/monitoring layer pages on (PSI > 0.2).
    Laplace-smoothed per bin; single-row output from one bin-keyed
    aggregate."""
    from fortune_500_financial_insights_pipeline_spark.operators.stats import psi

    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("value").cast("double").alias("value")
    )
    return psi(e, "event_type", "value", "click", "purchase", n_bins=10, lo=0.0, hi=500.0)


@q("q_sorted_neighborhood")
def q_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood ER blocking (operators/fuzzy.
    sorted_neighborhood_pairs) over customer names: each record compares
    against its 2 sort-neighbors inside first-letter partitions,
    levenshtein ≤ 2 — the complement to q_fuzzy_match's equality
    blocking that survives typos in the block key itself."""
    from fortune_500_financial_insights_pipeline_spark.operators.fuzzy import (
        sorted_neighborhood_pairs,
    )

    c = load_table(spark, sf_dir, "customer")
    return sorted_neighborhood_pairs(c, "c_custkey", "c_name", window=3, max_dist=2)


@q("q_window_pct")
def q_window_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist within supplier partitions (W-family
    completion): both are RANK-based — ties share a value by definition
    on every engine, so no tiebreak column is needed for determinism.
    One shuffle on the partition key serves both functions."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_suppkey") <= 10)
    w = W.partitionBy("l_suppkey").orderBy("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        F.col("l_extendedprice").alias("price"),
        # floor-based fixed point, not ROUND: rank/n quotients land on
        # exact decimal midpoints (n = 640 at sf0.001) where HALF_UP vs
        # engine-native rounding diverge; floor of the identical double
        # cannot
        (F.floor(F.percent_rank().over(w) * 1000000) / 1000000).alias("pct_rank"),
        (F.floor(F.cume_dist().over(w) * 1000000) / 1000000).alias("cume_dist"),
    )


@q("q_hhi")
def q_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration index per nation: suppliers'
    squared revenue shares summed — the market-concentration statistic
    regulators and the reference's financial-dashboard domain quote
    (0 = atomized, 10000 = monopoly). Revenue totals are exact cents;
    shares and the HHI fold are fixed-point deterministic. Two
    hash aggregates, shuffles keyed on supplier then nation."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    rev = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .groupBy("s_nationkey", "s_suppkey")
        .agg(F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("__r"))
    )
    tot = rev.groupBy("s_nationkey").agg(F.sum("__r").alias("__t"))
    share = F.col("__r").cast("double") / F.col("__t")
    return (
        rev.join(tot, "s_nationkey")
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(dsum(share * share * 10000), 6).alias("hhi"),
        )
        .orderBy("s_nationkey")
    )


@q("q_prefix_dedup")
def q_prefix_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-duplicate groups: documents sharing an identical
    whitespace-normalized 50-char prefix — the RefinedWeb-style catch
    for boilerplate openings and mirrored pages that full-document
    hashing misses once trailing content diverges. One hash aggregate
    on the prefix; groups of one drop out."""
    d = load_table(spark, sf_dir, "documents")
    pfx = F.substring(
        F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), 1, 50
    )
    return (
        d.select(pfx.alias("prefix"), "doc_id")
        .groupBy("prefix")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("canonical_doc"),
        )
        .where(F.col("n_docs") > 1)
        .select(F.md5("prefix").alias("prefix_hash"), "n_docs", "canonical_doc")
    )


@q("q_cov_matrix")
def q_cov_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariance matrix of supplier daily-return series
    (operators/timeseries.pairwise_covariance): series pairs align on
    the shared day via an equi-join (day-bucket-sized, never cartesian)
    and each pair's covariance folds exact fixed-point moments over the
    common days. Returns are in percent so the fixed-point interior
    keeps precision."""
    from fortune_500_financial_insights_pipeline_spark.operators.timeseries import (
        pairwise_covariance,
    )

    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_suppkey") <= 10)
    daily = li.groupBy(
        "l_suppkey", F.date_format("l_shipdate", "yyyy-MM-dd").alias("day")
    ).agg(F.round(davg("l_extendedprice"), 6).alias("close"))
    w = W.partitionBy("l_suppkey").orderBy("day")
    rets = daily.select(
        "l_suppkey",
        "day",
        F.round((F.col("close") / F.lag("close").over(w) - 1) * 100, 6).alias("ret"),
    ).where(F.col("ret").isNotNull())
    return pairwise_covariance(rets, "l_suppkey", "day", "ret").orderBy("ki", "kj")


@q("q_portfolio_vol")
def q_portfolio_vol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-weight portfolio volatility (operators/timeseries.
    portfolio_volatility) folded from q_cov_matrix's covariance pairs —
    σ²_p = Σ w_i w_j cov_ij with triangular storage doubled off the
    diagonal. The headline risk number derived entirely in relational
    algebra from raw prices."""
    from fortune_500_financial_insights_pipeline_spark.operators.timeseries import (
        portfolio_volatility,
    )

    cov = QUERIES["q_cov_matrix"](spark, sf_dir)
    return portfolio_volatility(cov, n_assets=10)


@q("q_ols_multi")
def q_ols_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature OLS per return flag (operators/stats.ols2): price
    regressed on quantity and discount via closed-form normal equations
    — the multi-feature step beyond q_regr_agg's regr_* family, still
    one exact aggregate pass and zero iteration."""
    from fortune_500_financial_insights_pipeline_spark.operators.stats import ols2

    li = load_table(spark, sf_dir, "lineitem")
    return ols2(
        li, ["l_returnflag"], "l_extendedprice", "l_quantity", "l_discount"
    ).orderBy("l_returnflag")


@q("q_scd2_lookup")
def q_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal point-in-time enrichment: each purchase event looks up
    the SCD2 activity-state episode (operators/scd.scd2 over the user's
    non-purchase events) covering its timestamp — the dimension-lookup
    join every warehouse runs against slowly-changing dims. Equi-join on
    the user key + interval containment; per-user episode counts bound
    the fan-out, so no interval binning is needed."""
    from fortune_500_financial_insights_pipeline_spark.operators.scd import scd2

    e = load_table(spark, sf_dir, "events")
    hist = scd2(
        e.where(F.col("event_type") != "purchase"), ["user_id"], "ts", ["event_type"]
    )
    facts = e.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("value").alias("amount")
    )
    j = facts.join(hist, "user_id").where(
        (F.col("p_ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("p_ts") < F.col("valid_to")))
    )
    fmt = "yyyy-MM-dd HH:mm:ss"
    return j.select(
        "user_id",
        F.date_format("p_ts", fmt).alias("purchase_ts"),
        F.round(F.col("amount").cast("double"), 6).alias("amount"),
        F.col("event_type").alias("state"),
    )


@q("q_random_walk")
def q_random_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-guided walk corpus (operators/graph.
    hash_guided_walks) over the supplier↔customer trade graph: 4-hop
    walks from the seed suppliers with the next hop chosen by keyed-md5
    argmin — graph-to-sequence training-data generation that replays
    identically on any partitioning, so the oracle can follow every
    hop."""
    from fortune_500_financial_insights_pipeline_spark.operators.graph import hash_guided_walks

    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_orderkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("l_suppkey").cast("long").alias("id_a"),
            (F.lit(1000000) + F.col("o_custkey")).cast("long").alias("id_b"),
        )
        .distinct()
    )
    seeds = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_suppkey") <= 5)
        .select(F.col("s_suppkey").cast("long").alias("id"))
    )
    return hash_guided_walks(edges, seeds, steps=4).orderBy("walk_id", "step")


@q("q_fd_audit")
def q_fd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit (checks.fd_audit) over part: the PK
    FD (partkey → brand) must hold; brand → type and type → size are the
    candidate dependencies a schema-discovery profile tests before a
    MERGE/dim build trusts an assumed key."""
    from fortune_500_financial_insights_pipeline_spark.checks import fd_audit

    p = load_table(spark, sf_dir, "part")
    return fd_audit(
        p,
        [
            ("partkey_to_brand", "p_partkey", "p_brand"),
            ("brand_to_type", "p_brand", "p_type"),
            ("type_to_size", "p_type", "p_size"),
        ],
    ).orderBy("fd")


@q("q_mix_temperature")
def q_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing (α = 0.5): sampling weights
    p_i ∝ (n_i/N)^α — the multilingual/multi-source rebalancing formula
    (mT5-style) that upweights small sources without drowning large
    ones. α = 0.5 evaluates as sqrt (correctly-rounded IEEE on every
    engine — general pow is NOT cross-engine-stable, so the operator
    pins the exponent). Expected per-epoch doc counts come from the
    weights; two tiny aggregates."""
    d = load_table(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = per_src.agg(
        F.sum("n_docs").alias("__N"),
        dsum(F.sqrt(F.col("n_docs").cast("double"))).alias("__Z"),
    )
    # sqrt(n_i/N)/Σ sqrt(n_j/N) == sqrt(n_i)/Σ sqrt(n_j): fold the exact
    # integer counts, normalize once (single fixed-order expression)
    w_col = F.sqrt(F.col("n_docs").cast("double")) / F.col("__Z")
    return (
        per_src.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            F.round(w_col, 6).alias("weight"),
            F.round(w_col * F.col("__N"), 6).alias("expected_docs"),
        )
        .orderBy("source")
    )


@q("q_tokenizer_fertility")
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: BPE tokens emitted per
    whitespace word under the corpus-trained 3-merge model
    (operators/bpe) — the tokenizer-equity readout multilingual pipelines
    track (a high-fertility language pays more sequence length for the
    same text, so it's systematically under-trained at fixed token
    budgets). Composes bpe_train → bpe_segment → per-lang ratio of exact
    token counts."""
    from fortune_500_financial_insights_pipeline_spark.operators.bpe import (
        bpe_segment,
        bpe_train,
    )

    d = load_table(spark, sf_dir, "documents")
    merges = [(r["lhs"], r["rhs"]) for r in bpe_train(d, n_merges=3).collect()]
    bpe_per_doc = (
        bpe_segment(d, merges)
        .groupBy("doc_id")
        .agg(F.sum("n").cast("long").alias("__bpe"))
    )
    ws_per_doc = (
        d.select(
            "doc_id",
            "lang",
            F.size(F.filter(F.split("text", " "), lambda x: x != "")).alias("__ws"),
        )
    )
    j = ws_per_doc.join(bpe_per_doc, "doc_id")
    return (
        j.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__ws").cast("long").alias("ws_tokens"),
            F.sum("__bpe").cast("long").alias("bpe_tokens"),
            F.round(
                F.sum("__bpe").cast("double") / F.sum("__ws").cast("double"), 6
            ).alias("fertility"),
        )
        .orderBy("lang")
    )


@q("q_rendezvous_shard")
def q_rendezvous_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) sharding + rebalance audit:
    each doc's shard is argmin over shards of md5(doc|shard); growing
    the ring 8 → 9 shards moves ONLY docs whose new minimum is the new
    shard — the consistent-hashing property that makes shard scale-out
    cheap (~1/9 of docs move, none shuffle between old shards). Output
    per new-ring shard: doc count and how many arrived by moving.
    All hashing is keyed md5 — deterministic, partition-invariant,
    oracle-replayable."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    exploded = d.select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.lit(8))).alias("s")
    ).select(
        "doc_id",
        "s",
        F.md5(F.concat_ws("|", F.col("doc_id"), F.col("s"))).alias("__h"),
    )
    g8 = (
        exploded.where(F.col("s") < 8)
        .groupBy("doc_id")
        .agg(F.min_by("s", "__h").alias("shard8"))
    )
    g9 = exploded.groupBy("doc_id").agg(F.min_by("s", "__h").alias("shard9"))
    j = g8.join(g9, "doc_id")
    return (
        j.groupBy("shard9")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("shard8") != F.col("shard9"), 1).otherwise(0)
            ).cast("long").alias("n_moved"),
        )
        .orderBy("shard9")
    )


@q("q_fifo_pnl")
def q_fifo_pnl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO realized P&L per part (operators/fifo.fifo_match): odd line
    numbers act as inventory lots, even as consuming fills; the
    sequential pop-the-oldest-lot allocation is rewritten as
    running-total interval overlap — one window per side + one keyed
    join, fully parallel per part. Matched quantities are exact longs;
    P&L folds unit-price differences in fixed point."""
    from fortune_500_financial_insights_pipeline_spark.operators.fifo import fifo_match

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        F.col("l_quantity").cast("long").alias("qty"),
        # floor-based fixed point: ROUND() midpoints can fall either way
        # across engines on raw quotients; floor of the identical double
        # cannot
        (
            F.floor(F.col("l_extendedprice") / F.col("l_quantity") * 1000000.0)
            / 1000000.0
        ).alias("unit_price"),
    )
    buys = li.where(F.col("l_linenumber") % 2 == 1)
    sells = li.where(F.col("l_linenumber") % 2 == 0)
    m = fifo_match(
        buys,
        sells,
        ["l_partkey"],
        ["l_shipdate", "l_orderkey", "l_linenumber"],
        "qty",
    )
    pnl = F.col("matched_qty").cast("double") * (
        F.col("s_unit_price") - F.col("b_unit_price")
    )
    return (
        m.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.sum("matched_qty").cast("long").alias("matched_qty"),
            F.round(dsum(pnl), 6).alias("realized_pnl"),
        )
        .orderBy("l_partkey")
    )


@q("q_top_paths")
def q_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top session-entry paths: sessionize events per user (30-min gap,
    the q_gaps_islands idiom), concatenate each session's first three
    event types, and rank path frequencies — the "how do sessions start"
    product-analytics readout. Window family shares one (user, ts) sort;
    the path frame is session-sized before the count shuffle."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ts_s = F.col("ts").cast("timestamp").cast("long")
    gap = ts_s - F.lag(ts_s).over(w)
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum(new_sess).over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ).alias("sess_no"),
    )
    ws = W.partitionBy("user_id", "sess_no").orderBy("ts", "event_id")
    # collect_list order is partition-dependent; build the path from the
    # rn-keyed struct sort instead so the string is deterministic
    path = (
        sess.withColumn("rn", F.row_number().over(ws))
        .where(F.col("rn") <= 3)
        .groupBy("user_id", "sess_no")
        .agg(
            F.concat_ws(
                ">",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                    lambda s: s["event_type"],
                ),
            ).alias("path")
        )
    )
    return (
        path.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(15)
    )


@q("q_wilson_ci")
def q_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score interval (z = 1.96) per source for the long-doc rate
    (n_chars > 200) — the small-sample-honest proportion CI a quality
    dashboard should quote instead of p̂ ± wald (which collapses at 0/1
    and small n). sqrt is correctly-rounded IEEE on every engine, so the
    bounds are oracle-exact with no fixed-point gymnastics beyond the
    count aggregates."""
    d = load_table(spark, sf_dir, "documents")
    agg = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.sum(F.when(F.col("n_chars") > 200, 1).otherwise(0))
        .cast("double")
        .alias("__k"),
    )
    z2 = 1.96 * 1.96
    p = F.col("__k") / F.col("__n")
    n = F.col("__n")
    denom = 1.0 + z2 / n
    center = (p + z2 / (2.0 * n)) / denom
    half = F.lit(1.96) * F.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n)) / denom
    return agg.select(
        "source",
        F.col("__n").cast("long").alias("n_docs"),
        F.col("__k").cast("long").alias("n_long"),
        F.round(p, 6).alias("rate"),
        F.round(center - half, 6).alias("ci_lo"),
        F.round(center + half, 6).alias("ci_hi"),
    ).orderBy("source")


@q("q_mann_kendall")
def q_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall trend statistic per supplier price series — the
    rank-based monotonic-trend test that pairs with q_theil_sen's robust
    slope (same nonparametric family: MK answers IS there a trend,
    Theil–Sen answers how steep). S = Σ_{i<j} sign(x_j − x_i) over the
    AGGREGATE-sized daily series (pairs are series×series within key,
    never raw rows); exact integer S and Kendall tau-a."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_suppkey") <= 10)
    daily = li.groupBy(
        "l_suppkey", F.date_format("l_shipdate", "yyyy-MM-dd").alias("day")
    ).agg(F.round(davg("l_extendedprice"), 6).alias("close"))
    a = daily.select("l_suppkey", F.col("day").alias("di"), F.col("close").alias("ci"))
    b = daily.select("l_suppkey", F.col("day").alias("dj"), F.col("close").alias("cj"))
    pairs = a.join(b, "l_suppkey").where(F.col("di") < F.col("dj"))
    sgn = F.when(F.col("cj") > F.col("ci"), 1).when(
        F.col("cj") < F.col("ci"), -1
    ).otherwise(0)
    agg = pairs.groupBy("l_suppkey").agg(
        F.sum(sgn).cast("long").alias("s_stat"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    )
    return agg.select(
        "l_suppkey",
        "s_stat",
        "n_pairs",
        F.round(F.col("s_stat").cast("double") / F.col("n_pairs"), 6).alias("tau"),
    ).orderBy("l_suppkey")


@q("q_vwap")
def q_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted average price per supplier — the execution
    benchmark quoted next to TWAP (q_twap): Σ price·qty / Σ qty with
    both folds exact (price in cents, quantity integral), one hash
    aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    qty = F.col("l_quantity").cast("long")
    return (
        li.groupBy("l_suppkey")
        .agg(
            F.sum(cents * qty).alias("__pq"),
            F.sum(qty).alias("__q"),
        )
        .select(
            "l_suppkey",
            F.col("__q").alias("total_qty"),
            F.round(F.col("__pq").cast("double") / F.col("__q") / 100.0, 6).alias("vwap"),
        )
        .orderBy("l_suppkey")
    )


@q("q_er_pipeline")
def q_er_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution in one declarative chain: blocked
    fuzzy candidate pairs (operators/fuzzy.blocked_fuzzy_pairs, never a
    cartesian) → connected components (operators/graph, min-label
    propagation) → cluster-level survivorship report (members, canonical
    record by min key, exact balance rollup). The full MDM user story
    whose stages exist separately as q_fuzzy_match / q_dedup_clusters /
    q_golden_record — composed here because composition is where
    operator contracts actually break. Only multi-member clusters are
    reported (the ER deliverable is "what merged")."""
    from fortune_500_financial_insights_pipeline_spark.operators.fuzzy import blocked_fuzzy_pairs
    from fortune_500_financial_insights_pipeline_spark.operators.graph import (
        connected_components,
    )

    c = load_table(spark, sf_dir, "customer")
    block = F.expr("substr(c_name, 1, length(c_name) - 2)")
    pairs = blocked_fuzzy_pairs(c, "c_custkey", "c_name", block, max_dist=1)
    comp = connected_components(pairs, "id_a", "id_b")
    labeled = c.join(comp, c.c_custkey == comp.id).select(
        F.col("comp").alias("cluster_id"), "c_custkey", "c_name", "c_acctbal"
    )
    return (
        labeled.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min_by("c_name", "c_custkey").alias("canonical_name"),
            (
                F.sum(F.round(F.col("c_acctbal") * 100).cast("long")).cast("double")
                / 100.0
            ).alias("total_acctbal"),
        )
        .where(F.col("n_members") >= 2)
        .orderBy("cluster_id")
    )


@q("q_ranking_metrics")
def q_ranking_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 and MRR per query over the BM25 retrieval stack — the
    ranking-quality scorecard that closes the retrieval family (build
    index → search → MEASURE). Graded relevance = capped query-term
    occurrence count; gains use the integer 2^rel−1 map (a literal
    lookup, not libm pow); log2 discounts per the cross-engine-stable
    precedent; per-query folds in fixed point. IDCG re-ranks the same
    retrieved pool, so NDCG = 1 iff the scorer ordered it perfectly."""
    from fortune_500_financial_insights_pipeline_spark.operators.tfidf import bm25_search

    d = load_table(spark, sf_dir, "documents")
    queries = spark.createDataFrame(
        [
            (1, "spark join hash"),
            (2, "window agg sort"),
            (3, "stream batch merge"),
        ],
        "query_id int, qtext string",
    )
    ranked = bm25_search(d, queries, k=10).select("query_id", "doc_id", "rank")
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .where(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    qterms = (
        queries.select(
            "query_id", F.explode(F.split("qtext", " ")).alias("term")
        )
        .where(F.col("term") != "")
        .distinct()
    )
    rel_pairs = (
        qterms.join(tf, "term")
        .groupBy("query_id", "doc_id")
        .agg(F.least(F.sum("tf"), F.lit(3)).cast("int").alias("rel"))
    )
    j = ranked.join(rel_pairs, ["query_id", "doc_id"], "left").select(
        "query_id",
        "rank",
        F.coalesce("rel", F.lit(0)).alias("rel"),
    )
    gain = F.element_at(
        F.array(F.lit(0.0), F.lit(1.0), F.lit(3.0), F.lit(7.0)), F.col("rel") + 1
    )
    disc = F.log2(F.col("rank").cast("double") + 1.0)
    wi = W.partitionBy("query_id").orderBy(F.col("rel").desc(), "rank")
    ideal = j.select(
        "query_id", "rel", F.row_number().over(wi).alias("irank")
    )
    igain = F.element_at(
        F.array(F.lit(0.0), F.lit(1.0), F.lit(3.0), F.lit(7.0)), F.col("rel") + 1
    )
    idcg = ideal.groupBy("query_id").agg(
        dsum(igain / F.log2(F.col("irank").cast("double") + 1.0)).alias("idcg")
    )
    dcg = j.groupBy("query_id").agg(
        dsum(gain / disc).alias("dcg"),
        F.min(F.when(F.col("rel") > 0, F.col("rank"))).alias("__fr"),
        F.sum(F.when(F.col("rel") > 0, 1).otherwise(0)).cast("long").alias("n_rel"),
    )
    return (
        dcg.join(idcg, "query_id")
        .select(
            "query_id",
            "n_rel",
            F.round(
                F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg")).otherwise(0.0),
                6,
            ).alias("ndcg10"),
            F.round(
                F.coalesce(1.0 / F.col("__fr").cast("double"), F.lit(0.0)), 6
            ).alias("mrr"),
        )
        .orderBy("query_id")
    )


@q("q_mahalanobis")
def q_mahalanobis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 correlation-aware outliers per return flag by squared
    Mahalanobis distance over (quantity, extendedprice)
    (operators/stats.mahalanobis_outliers): the joint-trend outlier
    screen Euclidean z-scores miss. Closed-form 2×2 inverse — one exact
    moment pass + broadcast join + WindowGroupLimit."""
    from fortune_500_financial_insights_pipeline_spark.operators.stats import (
        mahalanobis_outliers,
    )

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        # d2 is invariant to per-feature linear scaling; kilo-price keeps
        # the fixed-point moment interior (price^2 terms) inside long range
        "price_k", F.col("l_extendedprice") / 1000.0
    )
    return mahalanobis_outliers(
        li,
        ["l_returnflag"],
        "l_quantity",
        "price_k",
        ["l_orderkey", "l_linenumber"],
        k=5,
    ).orderBy("l_returnflag", "rank")


@q("q_pca_spectrum")
def q_pca_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-feature PCA spectrum per return flag (operators/stats.
    pca_spectrum2): covariance eigenvalues + explained-variance ratio in
    closed form (sqrt only — no iterative eigensolver, no collect). The
    feature-redundancy screen run before anyone ships both columns to a
    model."""
    from fortune_500_financial_insights_pipeline_spark.operators.stats import pca_spectrum2

    li = load_table(spark, sf_dir, "lineitem")
    return pca_spectrum2(
        li, ["l_returnflag"], "l_quantity", "l_discount"
    ).orderBy("l_returnflag")


@q("q_budget_allocation")
def q_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer token-budget apportionment across sources by the
    largest-remainder (Hamilton) method: each source gets
    floor(budget·weight), and the leftover seats go to the largest
    fractional remainders — the exact-integer allocation a training run
    needs when "sample 1M docs at these mixing weights" must sum to
    EXACTLY 1M (naive rounding over- or under-shoots). Weights are the
    sqrt-temperature mix (q_mix_temperature); everything after the
    weight is integer arithmetic + one rank window, so the allocation
    is oracle-exact and partition-invariant."""
    budget = 100000
    d = load_table(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = per_src.agg(
        dsum(F.sqrt(F.col("n_docs").cast("double"))).alias("__Z"),
        F.count(F.lit(1)).alias("__k"),
    )
    w = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        (F.sqrt(F.col("n_docs").cast("double")) / F.col("__Z")).alias("__w"),
    )
    # integer quota floor + fractional remainder in MICRO units so the
    # comparison is on exact longs, not float fractions
    quota_micro = F.round(F.col("__w") * budget * 1000000).cast("long")
    based = w.select(
        "source",
        "n_docs",
        (quota_micro / 1000000).cast("long").alias("base"),
        (quota_micro % 1000000).alias("rem"),
    )
    shortfall = based.agg((F.lit(budget) - F.sum("base")).alias("__short"))
    wr = W.orderBy(F.col("rem").desc(), "source")
    return (
        based.crossJoin(F.broadcast(shortfall))
        .withColumn("rk", F.row_number().over(wr))
        .select(
            "source",
            "n_docs",
            (
                F.col("base")
                + F.when(F.col("rk") <= F.col("__short"), 1).otherwise(0)
            ).cast("long").alias("allocated"),
        )
        .orderBy("source")
    )


@q("q_column_entropy")
def q_column_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy per categorical column of orders (priority,
    status, and the derived order-year) — the column-level information
    profile that extends q_column_profile's counts (a zero-entropy
    column is dead weight; a full-entropy "category" is probably an id).
    One stack-unpivot pass, counts bounded by category cardinality,
    fixed-point entropy fold."""
    o = load_table(spark, sf_dir, "orders")
    long = o.select(
        F.expr(
            "stack(3, 'o_orderpriority', o_orderpriority,"
            " 'o_orderstatus', o_orderstatus,"
            " 'order_year', CAST(year(o_orderdate) AS STRING)) AS (col, val)"
        )
    )
    cells = long.groupBy("col", "val").agg(F.count(F.lit(1)).alias("__n"))
    tot = cells.groupBy("col").agg(F.sum("__n").alias("__t"))
    p = F.col("__n").cast("double") / F.col("__t")
    return (
        cells.join(tot, "col")
        .groupBy("col")
        .agg(
            F.count(F.lit(1)).alias("n_distinct"),
            F.round(-dsum(p * F.log2(p)), 6).alias("entropy_bits"),
        )
        .orderBy("col")
    )


@q("q_funnel_windowed")
def q_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-boxed conversion funnel: users whose first click converts to
    a purchase WITHIN 7 DAYS — the bounded-attribution variant of
    q_funnel (unbounded conversion flatters the metric; every growth
    dashboard quotes a windowed one). Two tiny per-user aggregates and
    an integer epoch-second bound."""
    e = load_table(spark, sf_dir, "events")
    first_click = (
        e.where(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    j = first_click.join(purchases, "user_id", "left").withColumn(
        "conv",
        (
            F.col("p_ts").isNotNull()
            & (F.col("p_ts") >= F.col("c_ts"))
            & (
                F.col("p_ts").cast("long")
                <= F.col("c_ts").cast("long") + 7 * 86400
            )
        ).cast("int"),
    )
    per_user = j.groupBy("user_id").agg(F.max("conv").alias("converted"))
    return per_user.agg(
        F.count(F.lit(1)).alias("n_clickers"),
        F.sum("converted").cast("long").alias("n_converted_7d"),
        F.round(
            F.sum("converted").cast("double") / F.count(F.lit(1)), 6
        ).alias("conv_rate_7d"),
    )


@q("q_join_size_estimate")
def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact join-output cardinality WITHOUT running the join:
    |A ⋈ B| = Σ_k cntA(k)·cntB(k) over the key histograms — the planner
    statistic, exposed as a query (pairs with q_skew_profile: the same
    histograms say how big AND how skewed the shuffle will be). Cost is
    two key-counted aggregates + a tiny histogram join, versus
    materializing the join itself."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    ha = li.groupBy(F.col("l_orderkey").alias("k")).agg(F.count(F.lit(1)).alias("ca"))
    hb = o.groupBy(F.col("o_orderkey").alias("k")).agg(F.count(F.lit(1)).alias("cb"))
    j = ha.join(hb, "k")
    return j.agg(
        F.sum(F.col("ca") * F.col("cb")).cast("long").alias("est_join_rows"),
        F.count(F.lit(1)).alias("n_matching_keys"),
        F.max(F.col("ca") * F.col("cb")).cast("long").alias("max_key_fanout"),
    )


@q("q_table_checksum")
def q_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent integrity checksum of orders
    (checks.table_checksum): Σ xxhash64(row) as wraparound long — the
    did-the-copy-land gate that costs one scan and no shuffle. xxhash64
    with seed 42 is the same algorithm DuckDB exposes as hash()? No —
    the oracle recomputes Spark's exact digest via md5-derived longs
    instead, so the check is cross-engine by construction."""
    o = load_table(spark, sf_dir, "orders")
    # md5-derived 40-bit digest: cross-engine reproducible (xxhash64's
    # seed/variant is engine-specific, md5 is bit-stable everywhere).
    # 40 bits keeps the per-bucket long sum overflow-free to ~8M rows per
    # bucket; widen the bucket count for bigger tables (the per-bucket
    # report also LOCALIZES a mismatch to 1/16th of the key space).
    digest = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("o_orderkey"),
                    F.col("o_custkey"),
                    F.col("o_orderstatus"),
                    F.round(F.col("o_totalprice") * 100).cast("long"),
                )
            ),
            1,
            10,
        ),
        16,
        10,
    ).cast("long")
    return (
        o.select(digest.alias("__d"), (F.col("o_orderkey") % 16).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("__d").cast("long").alias("checksum"),
        )
        .orderBy("bucket")
    )


@q("q_funnel_steps")
def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step funnel view → click → purchase: each step must
    happen AFTER the user's first completion of the previous step — the
    classic product funnel report (q_funnel_windowed bounds one pair;
    this chains steps). Three per-user min aggregates + two
    ordered-join reductions; one row out."""
    e = load_table(spark, sf_dir, "events")

    def first_after(df_type: str, prev):
        ev = e.where(F.col("event_type") == df_type).select(
            "user_id", F.col("ts").alias("__t")
        )
        if prev is None:
            return ev.groupBy("user_id").agg(F.min("__t").alias("step_ts"))
        j = prev.join(ev, "user_id").where(F.col("__t") >= F.col("step_ts"))
        return j.groupBy("user_id").agg(F.min("__t").alias("step_ts"))

    s1 = first_after("view", None)
    s2 = first_after("click", s1)
    s3 = first_after("purchase", s2)
    n1, n2, n3 = s1.count(), s2.count(), s3.count()
    return spark.createDataFrame(
        [(n1, n2, n3)], "n_view long, n_click long, n_purchase long"
    ).select(
        "n_view",
        "n_click",
        "n_purchase",
        F.round(F.col("n_click") / F.col("n_view"), 6).alias("rate_click"),
        F.round(F.col("n_purchase") / F.col("n_click"), 6).alias("rate_purchase"),
    )


@q("q_forecast_backtest")
def q_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest per supplier: ŷ_t = y_{t-7} on
    the daily order-count series, scored with MAE and sMAPE — forecast
    EVALUATION as relational algebra (the baseline every fancy model
    must beat, and the backtest harness that proves it). One lag window
    per key; integer counts so errors are exact."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_suppkey") <= 10)
    daily = li.groupBy(
        "l_suppkey", F.date_format("l_shipdate", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    w = W.partitionBy("l_suppkey").orderBy("day")
    scored = daily.select(
        "l_suppkey",
        "y",
        F.lag("y", 7).over(w).alias("yhat"),
    ).where(F.col("yhat").isNotNull())
    err = F.abs(F.col("y") - F.col("yhat")).cast("double")
    smape_term = err * 2.0 / (F.col("y") + F.col("yhat"))
    return (
        scored.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_scored"),
            F.round(davg(err), 6).alias("mae"),
            F.round(davg(smape_term), 6).alias("smape"),
        )
        .orderBy("l_suppkey")
    )


@q("q_elasticity")
def q_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price elasticity per brand: the log-log regression slope of
    quantity on unit price over part×lineitem — the econometric readout
    (slope ≈ %Δqty per %Δprice) built on the regr_* aggregate family.
    ln is per-row IEEE (the established cross-engine precedent); the
    regr_slope moments fold on identical doubles."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.log(F.col("l_quantity").cast("double")).alias("ln_q"),
        F.log(F.col("l_extendedprice") / F.col("l_quantity")).alias("ln_p"),
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(p, li.l_partkey == p.p_partkey)
    return (
        j.groupBy("p_brand")
        .agg(
            F.regr_count("ln_q", "ln_p").alias("n_obs"),
            F.round(F.regr_slope("ln_q", "ln_p"), 6).alias("elasticity"),
            F.round(F.regr_r2("ln_q", "ln_p"), 6).alias("r2"),
        )
        .orderBy("p_brand")
    )


@q("q_lsh_precision")
def q_lsh_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding quality readout: over ALL band-collision candidates
    (no Jaccard floor), how many are true near-dups (jac ≥ 0.5) and what
    is the candidate precision — the tune-your-bands measurement that
    q_ranking_metrics is for retrieval (an LSH config is a recall/cost
    dial; this is the dial's gauge). Composes the oracle-certified
    portable MinHash pipeline with min_jaccard=0."""
    from fortune_500_financial_insights_pipeline_spark.operators.minhash import (
        minhash_neardup_pairs_portable,
    )

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_neardup_pairs_portable(
        d, id_col="doc_id", text_col="text", n_hashes=16, bands=4, min_jaccard=0.0
    )
    return pairs.agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum(F.when(F.col("jac") >= 0.5, 1).otherwise(0)).cast("long").alias("n_true"),
        F.round(
            F.sum(F.when(F.col("jac") >= 0.5, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("precision"),
        F.round(davg("jac"), 6).alias("avg_jac"),
    )


@q("q_byte_entropy")
def q_byte_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BYTE-level entropy per document over the utf-8 encoding — the
    corruption/compression detector for binary media columns (near-8
    bits/byte ≈ already-compressed or encrypted payload, near-0 ≈
    zero-filled corruption; q_char_entropy reads characters, this reads
    the raw bytes a media column actually stores). Bytes are surfaced
    portably via hex() — bit-identical text on both engines — so the
    whole histogram+entropy is oracle-exact. Aggregate is bounded by
    256 byte values per doc."""
    d = load_table(spark, sf_dir, "documents")
    hx = d.select(
        "doc_id", F.lower(F.hex(F.encode(F.col("text"), "utf-8"))).alias("__h")
    ).where(F.length("__h") > 0)
    # regexp tokenization is LINEAR in doc bytes; an index-explode with
    # per-index substring re-scans the string per byte (quadratic — the
    # first cut measured 20 s at sf0.01)
    pairs = hx.select(
        "doc_id",
        F.explode(F.expr("regexp_extract_all(__h, '..', 0)")).alias("byte"),
    )
    cells = pairs.groupBy("doc_id", "byte").agg(F.count(F.lit(1)).alias("__n"))
    tot = cells.groupBy("doc_id").agg(F.sum("__n").alias("__t"))
    p = F.col("__n").cast("double") / F.col("__t")
    return (
        cells.join(tot, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.max("__t").cast("long").alias("n_bytes"),
            F.count(F.lit(1)).alias("n_distinct_bytes"),
            F.round(-dsum(p * F.log2(p)), 6).alias("byte_entropy"),
        )
    )


@q("q_langid_confusion")
def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the heuristic language-ID (q_lang_id's
    stopword-ratio rule) against the fixture's true lang label — the
    classifier-eval readout for the cheapest gate in the curation funnel
    (before trusting a lang filter at 100 TB, measure where it lies).
    One row per (truth, prediction) cell with per-cell counts."""
    d = load_table(spark, sf_dir, "documents")
    stop = F.array([F.lit(w) for w in
                    ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]])
    toks = F.split("text", " ")
    score = F.size(F.filter(toks, lambda t: F.array_contains(stop, t))).cast(
        "double"
    ) / F.size(toks)
    pred = F.when(score >= 0.05, "en").otherwise("other")
    truth = F.when(F.col("lang") == "en", "en").otherwise("other")
    return (
        d.select(truth.alias("truth"), pred.alias("pred"))
        .groupBy("truth", "pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("truth", "pred")
    )


@q("q_seasonal_lag")
def q_seasonal_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant seasonality per supplier: the lag k ∈ 1..10 maximizing
    the exact autocorrelation r_k of the daily order-count series — the
    detect-the-period step before q_seasonal_decompose fixes one.
    acf_exact's integer-centering trick (c_t = n·x_t − S), partitioned
    per supplier: every r_k is a ratio of exact longs; argmax breaks
    ties on the smaller lag."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_suppkey") <= 10)
    daily = li.groupBy(
        "l_suppkey", F.date_format("l_shipdate", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    stats = daily.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("s")
    )
    c = daily.join(stats, "l_suppkey").select(
        "l_suppkey",
        "day",
        "n",
        (F.col("n") * F.col("x") - F.col("s")).alias("c"),
    )
    w = W.partitionBy("l_suppkey").orderBy("day")
    lagged = c.select(
        "l_suppkey",
        "c",
        *[F.lag("c", k).over(w).alias(f"c{k}") for k in range(1, 11)],
    )
    agg = lagged.groupBy("l_suppkey").agg(
        F.sum(F.col("c") * F.col("c")).alias("den"),
        *[F.sum(F.col("c") * F.col(f"c{k}")).alias(f"num{k}") for k in range(1, 11)],
    )
    stacked = agg.select(
        "l_suppkey",
        F.expr(
            "stack(10, "
            + ", ".join(f"{k}, num{k}" for k in range(1, 11))
            + ") AS (lag, num)"
        ),
        "den",
    )
    r = stacked.select(
        "l_suppkey",
        "lag",
        F.round(F.col("num").cast("double") / F.col("den"), 6).alias("r"),
    )
    wbest = W.partitionBy("l_suppkey").orderBy(F.col("r").desc(), "lag")
    return (
        r.withColumn("rn", F.row_number().over(wbest))
        .where(F.col("rn") == 1)
        .select("l_suppkey", F.col("lag").cast("int").alias("dominant_lag"), "r")
        .orderBy("l_suppkey")
    )


@q("q_grid_dbscan")
def q_grid_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid DBSCAN (operators/dbscan.grid_dbscan) over the first two
    embedding dimensions: eps-sized cells, dense = ≥3 points, adjacent
    dense cells merge via cell-graph components — density clustering
    whose joins are all bounded (9 probe keys per dense cell, components
    on the CELL frame), never point×point. Report per cluster: cells and
    points; sparse-cell points are the noise remainder."""
    from fortune_500_financial_insights_pipeline_spark.operators.dbscan import grid_dbscan

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.element_at("embedding", 1).cast("double").alias("x"),
        F.element_at("embedding", 2).cast("double").alias("y"),
    )
    assigned = grid_dbscan(e, "vec_id", "x", "y", eps=0.04, min_pts=3)
    return (
        assigned.groupBy("cluster")
        .agg(
            F.countDistinct("cell_id").alias("n_cells"),
            F.count(F.lit(1)).alias("n_points"),
        )
        .orderBy("cluster")
    )


@q("q_basket_triples")
def q_basket_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apriori level-3: frequent event-type TRIPLES with support and
    3-way lift, built by extending only the frequent pairs (the Apriori
    pruning step — candidates never enumerate the full item³ space;
    q_market_basket is the L2 this grows from). Joins are all on
    user_id; supports broadcast back."""
    ev = load_table(spark, sf_dir, "events")
    baskets = ev.select("user_id", "event_type").distinct()
    n_users = baskets.select("user_id").distinct().count()
    min_support = 0.05
    sup1 = baskets.groupBy("event_type").agg(
        (F.count(F.lit(1)) / F.lit(float(n_users))).alias("s")
    )
    a = baskets.select("user_id", F.col("event_type").alias("t_a"))
    b = baskets.select("user_id", F.col("event_type").alias("t_b"))
    c = baskets.select("user_id", F.col("event_type").alias("t_c"))
    pairs = (
        a.join(b, "user_id")
        .where(F.col("t_a") < F.col("t_b"))
        .groupBy("t_a", "t_b")
        .agg((F.count(F.lit(1)) / F.lit(float(n_users))).alias("s_ab"))
        .where(F.col("s_ab") >= min_support)
    )
    # Apriori: extend only frequent pairs; the candidate join is
    # (frequent pair) x (basket item c > b) per user
    cand = (
        a.join(b, "user_id")
        .where(F.col("t_a") < F.col("t_b"))
        .join(F.broadcast(pairs.select("t_a", "t_b")), ["t_a", "t_b"], "left_semi")
        .join(c, "user_id")
        .where(F.col("t_c") > F.col("t_b"))
    )
    triples = cand.groupBy("t_a", "t_b", "t_c").agg(
        (F.count(F.lit(1)) / F.lit(float(n_users))).alias("support")
    ).where(F.col("support") >= min_support)
    s1a = sup1.select(F.col("event_type").alias("t_a"), F.col("s").alias("sa"))
    s1b = sup1.select(F.col("event_type").alias("t_b"), F.col("s").alias("sb"))
    s1c = sup1.select(F.col("event_type").alias("t_c"), F.col("s").alias("sc"))
    return (
        triples.join(F.broadcast(s1a), "t_a")
        .join(F.broadcast(s1b), "t_b")
        .join(F.broadcast(s1c), "t_c")
        .select(
            "t_a",
            "t_b",
            "t_c",
            F.round("support", 6).alias("support"),
            F.round(
                F.col("support") / (F.col("sa") * F.col("sb") * F.col("sc")), 6
            ).alias("lift3"),
        )
        .orderBy("t_a", "t_b", "t_c")
    )


@q("q_ltv_curve")
def q_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: customers grouped by first-order
    month, cumulative revenue per cohort age in months — the LTV readout
    the retention matrix (q_retention_cohort) counts users for, here in
    exact revenue cents with a running cumsum per cohort. Two shuffles
    (customer-grain first-order, cohort-grain rollup) + one bounded
    window."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.trunc("o_orderdate", "month").alias("om"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    first = o.groupBy("o_custkey").agg(F.min("om").alias("cohort"))
    j = o.join(first, "o_custkey").select(
        "cohort",
        F.round(F.months_between("om", "cohort")).cast("int").alias("age_months"),
        "cents",
        "o_custkey",
    )
    per_cell = j.groupBy("cohort", "age_months").agg(
        F.countDistinct("o_custkey").alias("n_active"),
        F.sum("cents").alias("rev_cents"),
    )
    w = (
        W.partitionBy("cohort")
        .orderBy("age_months")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return per_cell.select(
        F.date_format("cohort", "yyyy-MM").alias("cohort_month"),
        "age_months",
        "n_active",
        (F.sum("rev_cents").over(w).cast("double") / 100.0).alias("cum_revenue"),
    ).orderBy("cohort_month", "age_months")


@q("q_embedding_qa")
def q_embedding_qa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-column QA per label: L2-norm statistics and degenerate
    vector counts — the sanity gate an ANN index build runs first (a
    silent all-zeros or exploding-norm batch poisons every cosine
    downstream). Norms fold per-row via a higher-order aggregate (no
    UDF); group stats use the fixed-point interior."""
    e = load_table(spark, sf_dir, "embeddings")
    sq = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    norm = F.round(F.sqrt(sq), 6)
    return (
        e.select("label", norm.alias("__n"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(davg("__n"), 6).alias("avg_norm"),
            F.round(F.min("__n"), 6).alias("min_norm"),
            F.round(F.max("__n"), 6).alias("max_norm"),
            F.sum(F.when(F.col("__n") < 1e-6, 1).otherwise(0))
            .cast("long")
            .alias("n_degenerate"),
        )
        .orderBy("label")
    )


@q("q_dup_size_dist")
def q_dup_size_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size distribution: how many exact-fingerprint
    groups exist at each multiplicity, and what share of the corpus each
    multiplicity band holds — the dataset-card number behind "X% of the
    corpus is duplicated" (q_dedup_exact removes them; this says how
    bad it was). Two nested aggregates, both cardinality-bounded."""
    d = load_table(spark, sf_dir, "documents")
    # prefix-keyed families (the q_prefix_dedup grouping): whole-document
    # fingerprints are all-unique on this fixture, prefix families show
    # the actual multiplicity structure
    fp = F.md5(
        F.substring(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), 1, 50)
    )
    groups = d.select(fp.alias("fp")).groupBy("fp").agg(
        F.count(F.lit(1)).alias("sz")
    )
    tot = groups.agg(F.sum("sz").alias("__t"))
    return (
        groups.groupBy("sz")
        .agg(F.count(F.lit(1)).alias("n_groups"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("sz").alias("cluster_size"),
            "n_groups",
            (F.col("sz") * F.col("n_groups")).cast("long").alias("n_docs"),
            F.round(
                (F.col("sz") * F.col("n_groups")).cast("double") / F.col("__t"), 6
            ).alias("corpus_share"),
        )
        .orderBy("cluster_size")
    )


@q("q_ann_recall")
def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN recall gauge: recall@5 of the IVF-routed k-NN join against the
    exact brute-force top-5, per query vector — the acceptance number an
    index build publishes before the exact path is switched off (the
    routing, candidate scoring AND the exact twin are each oracle-exact
    already; this composes them into the recall readout). Both legs are
    depth-5 lists for 10 queries, so the compare is list-sized — the
    corpus is scanned once per leg, never per depth."""
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import (
        knn_join,
        knn_join_ivf,
        md5_sample_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    queries = emb.where(F.col("vec_id") < 10)
    centroids = md5_sample_centroids(emb, k=4)
    approx = knn_join_ivf(queries, emb, centroids, k=5, n_probe=2).select(
        "q_id", "vec_id"
    )
    exact = knn_join(queries, emb, k=5).select("q_id", "vec_id")
    hits = exact.join(approx, ["q_id", "vec_id"], "left_semi")
    n_hit = hits.groupBy("q_id").agg(F.count(F.lit(1)).alias("n_hit"))
    base = exact.groupBy("q_id").agg(F.count(F.lit(1)).alias("__n"))
    return (
        base.join(n_hit, "q_id", "left")
        .select(
            "q_id",
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            F.round(
                F.coalesce("n_hit", F.lit(0)).cast("double") / F.col("__n"), 6
            ).alias("recall"),
        )
        .orderBy("q_id")
    )


@q("q_rbo")
def q_rbo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (p=0.9, depth 10) between the lexical BM25 and
    dense embedding top-10 lists for three query documents
    (operators/retrieval.rbo_agreement) — the retriever-agreement
    diagnostic next to q_rrf_fusion: high RBO means the legs are
    redundant, low means fusion is buying recall. Contributions are
    fixed-point suffix-sum literals shared with the oracle, so the score
    is an exact long sum despite the geometric weights."""
    from fortune_500_financial_insights_pipeline_spark.operators.retrieval import (
        rbo_agreement,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import knn_join
    from fortune_500_financial_insights_pipeline_spark.operators.tfidf import bm25_search

    d = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    qids = [0, 7, 42]
    queries = d.where(F.col("doc_id").isin(qids)).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("qtext")
    )
    # lexical leg: self dropped, then re-ranked to a gap-free 1..N list
    wl = W.partitionBy("query_id").orderBy(F.asc("rank"))
    lex = (
        bm25_search(d, queries, k=20)
        .where(F.col("doc_id") != F.col("query_id"))
        .select("query_id", "doc_id", F.row_number().over(wl).alias("rank"))
    )
    wd = W.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    dense = knn_join(emb.where(F.col("vec_id").isin(qids)), emb, k=20).select(
        F.col("q_id").alias("query_id"),
        F.col("vec_id").alias("doc_id"),
        F.row_number().over(wd).alias("rank"),
    )
    return rbo_agreement(lex, dense, p=0.9, depth=10)


@q("q_ngram_novelty")
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novel 8-gram rate in corpus (id) order
    (operators/text.ngram_novelty): the marginal-content curve a dataset
    builder reads before ingesting another snapshot — q_containment
    scores overlap against an external benchmark, this is self-novelty.
    Post-explode work rides the md5 gram key only."""
    from fortune_500_financial_insights_pipeline_spark.operators.text import ngram_novelty

    d = load_table(spark, sf_dir, "documents")
    return ngram_novelty(d, n=8)


@q("q_sharpe")
def q_sharpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Annualized Sharpe/Sortino per supplier price series
    (operators/timeseries.risk_adjusted_returns): lag-window daily
    returns, exact fixed-point Σr/Σr²/Σmin(r,0)² folds, shared-text
    sqrt expressions — the risk-adjusted readout next to q_drawdown."""
    from fortune_500_financial_insights_pipeline_spark.operators.timeseries import (
        risk_adjusted_returns,
    )

    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_suppkey") <= 20)
    daily = li.groupBy(
        "l_suppkey", F.date_format("l_shipdate", "yyyy-MM-dd").alias("day")
    ).agg(F.round(davg("l_extendedprice"), 6).alias("close"))
    return risk_adjusted_returns(daily, ["l_suppkey"], ["day"], "close").orderBy(
        "l_suppkey"
    )


@q("q_curation_report")
def q_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation funnel AS A QUERY: per-stage in/out/dropped counts for
    raw → exact dedup → quality gate → repetition gate → entropy band —
    the dataset-card observability row pipelines/training_data.py returns
    driver-side, here computed relationally so the whole report is
    oracle-checkable. Every gate is a per-document predicate (dedup rank,
    round-6 quality_score >= 0.5, top-bigram fraction < 0.08 with
    gramless docs passing, char entropy in [1.5, 7.0] with unscoreable
    docs passing), so the sequential funnel collapses to ONE pass of
    cumulative-AND survival flags + one aggregate — the oracle keeps the
    literal stage-by-stage CTE chain, proving the fusion is equivalence,
    not approximation."""
    from fortune_500_financial_insights_pipeline_spark.operators.text import (
        char_entropy,
        quality_score,
        repetition_stats,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    fp = F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")))
    rn = F.row_number().over(W.partitionBy(fp).orderBy(F.asc("doc_id")))
    rep = repetition_stats(d, "doc_id", "text").select("doc_id", "top_gram_frac")
    ent = char_entropy(d).select("doc_id", "entropy_bits")
    flags = (
        d.select("doc_id", "text", (rn == 1).alias("__f1"))
        .withColumn("__f2", F.round(quality_score("text"), 6) >= 0.5)
        .join(rep, "doc_id", "left")
        .join(ent, "doc_id", "left")
        .select(
            "__f1",
            "__f2",
            (F.col("top_gram_frac").isNull() | (F.col("top_gram_frac") < 0.08)).alias(
                "__f3"
            ),
            (
                F.col("entropy_bits").isNull()
                | ((F.col("entropy_bits") >= 1.5) & (F.col("entropy_bits") <= 7.0))
            ).alias("__f4"),
        )
    )
    one = F.lit(1)
    agg = flags.agg(
        F.count(one).alias("c0"),
        F.sum(F.when(F.col("__f1"), one).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("__f1") & F.col("__f2"), one).otherwise(0)).alias("c2"),
        F.sum(
            F.when(F.col("__f1") & F.col("__f2") & F.col("__f3"), one).otherwise(0)
        ).alias("c3"),
        F.sum(
            F.when(
                F.col("__f1") & F.col("__f2") & F.col("__f3") & F.col("__f4"), one
            ).otherwise(0)
        ).alias("c4"),
    )

    def st(idx: int, name: str, rin, rout):
        return F.struct(
            F.lit(idx).alias("stage_idx"),
            F.lit(name).alias("stage"),
            rin.cast("long").alias("rows_in"),
            F.col(rout).cast("long").alias("rows_out"),
        )

    return (
        agg.select(
            F.explode(
                F.array(
                    st(0, "raw", F.lit(None), "c0"),
                    st(1, "exact_dedup", F.col("c0"), "c1"),
                    st(2, "quality_gate", F.col("c1"), "c2"),
                    st(3, "repetition_gate", F.col("c2"), "c3"),
                    st(4, "entropy_band", F.col("c3"), "c4"),
                )
            ).alias("s")
        )
        .select("s.*")
        .withColumn("dropped", F.col("rows_in") - F.col("rows_out"))
        .orderBy("stage_idx")
    )


@q("q_token_percentiles")
def q_token_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length planning readout: exact interpolated p50/p90/p99
    whitespace-token counts per language — the number that sizes context
    windows and packing bins before tokenization. percentile() is a
    sort-based exact aggregate per group (matches quantile_cont); groups
    are language-count-bounded."""
    d = load_table(spark, sf_dir, "documents")
    tc = F.size(F.split(F.col("text"), " ")).cast("double")
    return (
        d.select("lang", tc.alias("__tc"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.percentile("__tc", F.lit(0.5)), 6).alias("p50_tokens"),
            F.round(F.percentile("__tc", F.lit(0.9)), 6).alias("p90_tokens"),
            F.round(F.percentile("__tc", F.lit(0.99)), 6).alias("p99_tokens"),
            F.max("__tc").cast("long").alias("max_tokens"),
        )
        .orderBy("lang")
    )


@q("q_tail_index")
def q_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill power-law tail exponent of order values per priority class
    (operators/stats.hill_tail_index, k=50): the heavy-tail diagnostic
    that decides whether a shuffle key needs salting (α < 2 ⇒ unbounded
    variance). Top-(k+1) rank window (WindowGroupLimit-pruned), per-row
    ln ratios vs the (k+1)-th order statistic, fixed-point sum."""
    from fortune_500_financial_insights_pipeline_spark.operators.stats import hill_tail_index

    o = load_table(spark, sf_dir, "orders")
    return hill_tail_index(o, ["o_orderpriority"], "o_totalprice", k=50).orderBy(
        "o_orderpriority"
    )


@q("q_lsh_recall")
def q_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding RECALL gauge — the other half of q_lsh_precision's
    dial: of all TRUE near-dup pairs (exact 3-gram Jaccard >= 0.5 via the
    prefix-filtered set-similarity join, never a cross join), what
    fraction did 16-hash/4-band MinHash banding surface as candidates?
    Both legs are oracle-certified pipelines; the compare is
    pair-list-sized."""
    from fortune_500_financial_insights_pipeline_spark.operators.minhash import (
        minhash_neardup_pairs_portable,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.setjoin import (
        jaccard_pairs_exact,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.text import word_ngrams

    d = load_table(spark, sf_dir, "documents")
    truth = jaccard_pairs_exact(
        d.select("doc_id", word_ngrams(F.col("text"), 3).alias("grams")),
        threshold=0.5,
    ).select("id_a", "id_b")
    cand = minhash_neardup_pairs_portable(
        d, id_col="doc_id", text_col="text", n_hashes=16, bands=4, min_jaccard=0.0
    ).select("id_a", "id_b")
    cap = truth.join(cand, ["id_a", "id_b"], "left_semi")
    t = truth.agg(F.count(F.lit(1)).alias("n_true"))
    c = cap.agg(F.count(F.lit(1)).alias("n_captured"))
    return t.crossJoin(c).select(
        "n_true",
        "n_captured",
        F.round(
            F.when(
                F.col("n_true") > 0,
                F.col("n_captured").cast("double") / F.col("n_true"),
            ),
            6,
        ).alias("recall"),
    )


@q("q_item_cooccurrence")
def q_item_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-to-item co-occurrence cosine ("customers who bought X also
    bought Y"): parts meeting in the same order, similarity
    n_ab / sqrt(n_a·n_b) over binary order incidence, top-3 neighbors per
    watchlist part. The self-join key is the ORDER — fan-out is bounded
    by order size (≤7 lines in TPC-H shape), never part×part; counts are
    exact integers, the cosine is one shared-text sqrt expression, and
    the top-k cut is a WindowGroupLimit rank."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").dropDuplicates(
        ["l_orderkey", "l_partkey"]
    )
    n_per = op.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    a = op.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_a"))
    b = op.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_b"))
    co = (
        a.join(b, "l_orderkey")
        .where(F.col("part_a") != F.col("part_b"))
        .where(F.col("part_a") <= 50)
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    na = n_per.select(F.col("l_partkey").alias("part_a"), F.col("n").alias("__na"))
    nb = n_per.select(F.col("l_partkey").alias("part_b"), F.col("n").alias("__nb"))
    scored = (
        co.join(na, "part_a")
        .join(nb, "part_b")
        .withColumn(
            "cosine",
            F.round(
                F.col("n_ab").cast("double")
                / F.sqrt(F.col("__na").cast("double") * F.col("__nb").cast("double")),
                6,
            ),
        )
    )
    w = W.partitionBy("part_a").orderBy(F.desc("cosine"), F.asc("part_b"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("part_a", "part_b", "n_ab", "cosine", "rank")
        .orderBy("part_a", "rank")
    )


@q("q_mmr_rerank")
def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified retrieval (operators/retrieval.mmr_rerank,
    λ=0.7/μ=0.3, m=5 over embedding top-10 candidates for three
    queries): greedy diversity selection unrolled into five relational
    steps, every join candidate-list-sized. Relevance and candidate-pair
    similarities are the already-oracled round-6 cosine; the MMR score is
    one shared-text expression, so the whole greedy trajectory is
    hash-checked step by step."""
    from fortune_500_financial_insights_pipeline_spark.operators.retrieval import mmr_rerank
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import (
        cosine_similarity,
        knn_join,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qids = [0, 7, 42]
    cand = knn_join(emb.where(F.col("vec_id").isin(qids)), emb, k=10).select(
        F.col("q_id").alias("query_id"),
        F.col("vec_id").alias("doc_id"),
        F.col("sim").alias("rel"),
    )
    va = emb.select(F.col("vec_id").alias("a"), F.col("embedding").alias("__va"))
    vb = emb.select(F.col("vec_id").alias("b"), F.col("embedding").alias("__vb"))
    ca = cand.select("query_id", F.col("doc_id").alias("a"))
    cb = cand.select("query_id", F.col("doc_id").alias("b"))
    pairs = (
        ca.join(cb, "query_id")
        .where(F.col("a") != F.col("b"))
        .join(va, "a")
        .join(vb, "b")
        .select(
            "query_id",
            "a",
            "b",
            F.round(cosine_similarity(F.col("__va"), F.col("__vb")), 6).alias("s"),
        )
    )
    return mmr_rerank(cand, pairs, m=5, lam=0.7, mu=0.3)


@q("q_quantile_sketch")
def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable bottom-k quantile sketch (operators/kmv.quantile_sketch,
    k=64): p50/p90 order-value estimates per priority class from a
    deterministic md5-keyed value sample — the fixed-memory quantile
    sketch that is bit-reproducible cross-engine (unlike t-digest/KLL),
    so the ESTIMATE itself is hash-checked; sampling-error bounds and
    merge==sketch-of-union are pinned by tests. WindowGroupLimit keeps
    every map task at <=k rows per group."""
    from fortune_500_financial_insights_pipeline_spark.operators.kmv import (
        quantile_sketch,
        sketch_quantiles,
    )

    o = load_table(spark, sf_dir, "orders")
    s = quantile_sketch(o, ["o_orderpriority"], "o_orderkey", "o_totalprice", k=64)
    return sketch_quantiles(s, ["o_orderpriority"], "o_totalprice").orderBy(
        "o_orderpriority"
    )


@q("q_assortativity")
def q_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the user co-activity graph (same edge rule
    as q_kcore: >= 2 shared (hour, event_type) buckets;
    operators/graph.degree_assortativity) — hubs-link-to-hubs vs
    hubs-link-to-leaves, the topology number that predicts whether
    neighborhood expansion explodes. Degrees are exact integers, so the
    Pearson moments are exact long sums."""
    from fortune_500_financial_insights_pipeline_spark.operators.graph import (
        degree_assortativity,
    )

    e = load_table(spark, sf_dir, "events")
    ub = e.select(
        F.col("user_id").alias("u"),
        F.date_trunc("hour", "ts").alias("h"),
        F.col("event_type").alias("t"),
    ).distinct()
    a = ub.select(F.col("u").alias("id_a"), "h", "t")
    b = ub.select(F.col("u").alias("id_b"), "h", "t")
    edges = (
        a.join(b, ["h", "t"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__shared"))
        .where(F.col("__shared") >= 2)
        .select("id_a", "id_b")
    )
    return degree_assortativity(edges)


@q("q_modularity")
def q_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modularity decomposition of the co-activity graph under the
    dominant-event-type community labeling (operators/graph.modularity):
    per-community m_c/D_c and Q contribution — the acceptance number any
    clustering must clear before it drives downstream grouping. Edges are
    q_kcore's bucket-join rule; community = each user's most frequent
    event type (count desc, type asc tie-break — deterministic)."""
    from fortune_500_financial_insights_pipeline_spark.operators.graph import modularity

    e = load_table(spark, sf_dir, "events")
    ub = e.select(
        F.col("user_id").alias("u"),
        F.date_trunc("hour", "ts").alias("h"),
        F.col("event_type").alias("t"),
    ).distinct()
    a = ub.select(F.col("u").alias("id_a"), "h", "t")
    b = ub.select(F.col("u").alias("id_b"), "h", "t")
    edges = (
        a.join(b, ["h", "t"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__shared"))
        .where(F.col("__shared") >= 2)
        .select("id_a", "id_b")
    )
    wdom = W.partitionBy("user_id").orderBy(F.desc("__n"), F.asc("event_type"))
    comm = (
        e.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn("__rn", F.row_number().over(wdom))
        .where(F.col("__rn") == 1)
        .select(F.col("user_id").alias("node"), F.col("event_type").alias("community"))
    )
    return modularity(edges, comm)


@q("q_did")
def q_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences readout: treatment = even user ids,
    post-period = Jan 16 on; the 2×2 cell means (exact fixed-point
    interiors) and the DiD interaction estimate in one aggregate — the
    experiment-analysis shape next to q_ab_test (which tests a single
    contrast; this removes the pre-period level difference). One scan,
    one one-row aggregate; the estimate is a fixed-order expression over
    four exact means."""
    e = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    treat = F.col("user_id") % 2 == 0
    post = F.col("ts") >= cut
    cells = e.select(
        F.col("value"),
        treat.alias("__t"),
        post.alias("__p"),
    )

    def cell_mean(t: bool, p: bool):
        cond = (F.col("__t") == t) & (F.col("__p") == p)
        s = F.sum(F.when(cond, F.round(F.col("value") * 1000000).cast("long"))).cast(
            "double"
        ) / 1000000
        n = F.sum(F.when(cond, 1).otherwise(0))
        return s / n, n

    m_t_pre, n_t_pre = cell_mean(True, False)
    m_t_post, n_t_post = cell_mean(True, True)
    m_c_pre, n_c_pre = cell_mean(False, False)
    m_c_post, n_c_post = cell_mean(False, True)
    return cells.agg(
        n_t_pre.cast("long").alias("n_treat_pre"),
        n_t_post.cast("long").alias("n_treat_post"),
        n_c_pre.cast("long").alias("n_ctrl_pre"),
        n_c_post.cast("long").alias("n_ctrl_post"),
        F.round(m_t_pre, 6).alias("mean_treat_pre"),
        F.round(m_t_post, 6).alias("mean_treat_post"),
        F.round(m_c_pre, 6).alias("mean_ctrl_pre"),
        F.round(m_c_post, 6).alias("mean_ctrl_post"),
        F.round((m_t_post - m_t_pre) - (m_c_post - m_c_pre), 6).alias("did_estimate"),
    )


@q("q_skipgram_pairs")
def q_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram training pairs from the deterministic walk corpus
    (DeepWalk/node2vec step 2: walks → (center, context) pairs within a
    ±2 window): two lead() columns over the per-walk step sort, four
    union legs (both directions, both distances), one pair-count
    aggregate — the graph-to-sequence-to-pairs hop that feeds embedding
    training. Reuses q_random_walk's oracle-exact corpus, so the pair
    set is hash-checked end to end."""
    walks = QUERIES["q_random_walk"](spark, sf_dir)
    w = W.partitionBy("walk_id").orderBy("step")
    p = walks.select(
        "node",
        F.lead("node", 1).over(w).alias("__n1"),
        F.lead("node", 2).over(w).alias("__n2"),
    )
    legs = [
        p.where(F.col("__n1").isNotNull()).select(
            F.col("node").alias("center"), F.col("__n1").alias("context"),
            F.lit(1).alias("dist"),
        ),
        p.where(F.col("__n1").isNotNull()).select(
            F.col("__n1").alias("center"), F.col("node").alias("context"),
            F.lit(1).alias("dist"),
        ),
        p.where(F.col("__n2").isNotNull()).select(
            F.col("node").alias("center"), F.col("__n2").alias("context"),
            F.lit(2).alias("dist"),
        ),
        p.where(F.col("__n2").isNotNull()).select(
            F.col("__n2").alias("center"), F.col("node").alias("context"),
            F.lit(2).alias("dist"),
        ),
    ]
    pairs = legs[0].unionByName(legs[1]).unionByName(legs[2]).unionByName(legs[3])
    return (
        pairs.groupBy("center", "context", "dist")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("center", "context", "dist")
    )


@q("q_bootstrap_ci")
def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic bootstrap confidence interval for the mean order
    value per priority class: B=32 md5-seeded half-subsamples (row in
    resample b iff u(md5(b|key)) < 0.5 — partition-invariant, so the
    WHOLE resampling plan is hash-checked, unlike rand()-seeded
    bootstraps), exact fixed-point subsample means, CI = exact
    interpolated [2.5%, 97.5%] percentiles of the B means. Cost model:
    one B-way row explode with map-side partial aggregation — the
    shuffle carries only (group × B) mean states."""
    o = load_table(spark, sf_dir, "orders")
    B = 32
    b = spark.range(B).select(F.col("id").cast("int").alias("b"))
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("b").cast("string"),
                        F.col("o_orderkey").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(1 << 60))
    )
    sampled = o.crossJoin(F.broadcast(b)).where(u < 0.5)
    means = sampled.groupBy("o_orderpriority", "b").agg(
        davg("o_totalprice").alias("__m")
    )
    return (
        means.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_resamples"),
            F.round(davg("__m"), 6).alias("boot_mean"),
            F.round(F.percentile("__m", F.lit(0.025)), 6).alias("ci_lo"),
            F.round(F.percentile("__m", F.lit(0.975)), 6).alias("ci_hi"),
        )
        .orderBy("o_orderpriority")
    )


@q("q_rag_context_pack")
def q_rag_context_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG context assembly: for each query, walk the RRF-fused top-10 in
    rank order and keep documents while the running whitespace-token
    total stays within a 256-token budget (greedy prefix — the standard
    context packer). One running-sum window over ten-row-per-query
    lists on top of the already-oracled q_rrf_fusion chain: retrieval →
    fusion → budget cut, hash-checked end to end."""
    from fortune_500_financial_insights_pipeline_spark.operators import text as TX

    fused = QUERIES["q_rrf_fusion"](spark, sf_dir).select(
        "query_id", "doc_id", "rank"
    )
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", TX.token_count("text").alias("tokens")
    )
    w = (
        W.partitionBy("query_id")
        .orderBy("rank")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    packed = (
        fused.join(d, "doc_id")
        .withColumn("cum_tokens", F.sum("tokens").over(w).cast("long"))
        .where(F.col("cum_tokens") <= 256)
    )
    return packed.select(
        "query_id", "doc_id", "rank", F.col("tokens").cast("long").alias("tokens"),
        "cum_tokens",
    ).orderBy("query_id", "rank")


@q("q_interarrival")
def q_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival time distribution per event type: exact interpolated
    p50/p90 of per-user gaps (microsecond epoch lag diffs, attributed to
    the later event) — the number that tunes session timeouts and
    capacity planning. One lag window on the user key, one percentile
    aggregate per type."""
    e = load_table(spark, sf_dir, "events")
    # epoch microseconds are monotone with ts — same sort, one column
    w = W.partitionBy("user_id").orderBy("__us")
    gaps = (
        e.select("user_id", "event_type", F.unix_micros("ts").alias("__us"))
        .withColumn("__gap", F.col("__us") - F.lag("__us").over(w))
        .where(F.col("__gap").isNotNull())
        .select("event_type", (F.col("__gap").cast("double") / 1000000).alias("__s"))
    )
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.round(F.percentile("__s", F.lit(0.5)), 6).alias("p50_gap_s"),
            F.round(F.percentile("__s", F.lit(0.9)), 6).alias("p90_gap_s"),
        )
        .orderBy("event_type")
    )


@q("q_lorenz_deciles")
def q_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve points behind q_gini: customers in revenue deciles
    (deterministic ntile — value asc, custkey tiebreak), per-decile
    revenue and cumulative share — the 'top 10% of customers hold X% of
    revenue' dashboard row. Customer totals are exact fixed point; the
    decile cut is one rank window over the customer-count-sized
    aggregate."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(dsum("o_totalprice").alias("__rev"))
    wn = W.orderBy(F.asc("__rev"), F.asc("o_custkey"))
    dec = per_cust.withColumn("decile", F.ntile(10).over(wn))
    per_dec = dec.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_cust"),
        dsum("__rev").alias("revenue"),
    )
    wc = W.orderBy("decile").rowsBetween(W.unboundedPreceding, W.currentRow)
    tot = per_dec.agg(dsum("revenue").alias("__t"))
    return (
        per_dec.withColumn("__cum", F.sum(F.round(F.col("revenue") * 1000000).cast("long")).over(wc))
        .crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_cust",
            F.round("revenue", 6).alias("revenue"),
            F.round(
                (F.col("__cum").cast("double") / 1000000) / F.col("__t"), 6
            ).alias("cum_share"),
        )
        .orderBy("decile")
    )


@q("q_k_anonymity")
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit of the customer table under the
    quasi-identifier (nation, market segment): equivalence-class sizes,
    how many classes fall below k=5, the share of rows re-identifiable
    through them, and the minimum l (distinct account-balance bands per
    class) — the privacy gate next to PII redaction (q_redact_pii
    scrubs direct identifiers; this measures indirect linkability).
    Two cardinality-bounded aggregates, no row-level output."""
    c = load_table(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / 1000).cast("long")
    classes = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("__sz"),
        F.countDistinct(band).alias("__l"),
    )
    total = c.agg(F.count(F.lit(1)).alias("__n"))
    return classes.crossJoin(F.broadcast(total)).agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.min("__sz").cast("long").alias("min_class_size"),
        F.sum(F.when(F.col("__sz") < 5, 1).otherwise(0)).cast("long").alias(
            "n_classes_below_k"
        ),
        F.sum(F.when(F.col("__sz") < 5, F.col("__sz")).otherwise(0))
        .cast("long")
        .alias("n_rows_at_risk"),
        F.round(
            F.sum(F.when(F.col("__sz") < 5, F.col("__sz")).otherwise(0)).cast(
                "double"
            )
            / F.max("__n"),
            6,
        ).alias("risk_frac"),
        F.min("__l").cast("long").alias("min_l_diversity"),
    )


@q("q_adamic_adar")
def q_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar related-supplier recommendation over the bipartite
    trade graph: for each watchlist supplier (key <= 100), score every
    other supplier by sum_z 1/ln(deg z) over shared CUSTOMERS z (rarer
    mutual customers weigh more; Adamic & Adar 2003), top-20 pairs.
    Scale shape: the two-hop join is keyed on the WITNESS customer and
    the candidate side is watchlist-restricted, so fan-out is
    sum over watchlist of deg(supplier)*deg(customer) — never
    supplier x supplier (the first cut ran AA on the dense co-activity
    graph: 403M two-hop rows at sf0.1 — a dense graph is the wrong
    input for AA on any engine). Single-supplier customers are pruned
    before the fan-out (ln(1)=0, and a deg-1 witness witnesses
    nothing)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_orderkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    sc = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("l_suppkey").alias("s"), F.col("o_custkey").alias("c"))
        .distinct()
        # three consumers (witness degrees + both hop legs) — materialize
        # the incidence list once (setjoin's lesson)
        .localCheckpoint(eager=False)
    )
    cdeg = (
        sc.groupBy("c").agg(F.count(F.lit(1)).alias("deg")).where(F.col("deg") >= 2)
    )
    e1 = (
        sc.where(F.col("s") <= 100)
        .join(cdeg, "c")
        .select(F.col("s").alias("pa"), F.col("c").alias("z"), "deg")
    )
    e2 = sc.select(F.col("c").alias("z"), F.col("s").alias("pb"))
    hop2 = e1.join(e2, "z").where(F.col("pa") != F.col("pb"))
    from fortune_500_financial_insights_pipeline_spark.functions.deterministic import dsum as _ds

    return (
        hop2.groupBy("pa", "pb")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.round(_ds(F.lit(1.0) / F.log(F.col("deg").cast("double"))), 6).alias(
                "aa"
            ),
        )
        .orderBy(F.desc("aa"), F.asc("pa"), F.asc("pb"))
        .limit(20)
    )


@q("q_cuped")
def q_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng et al., WSDM
    2013): per-user pre-period spend (before Jan 16) as the covariate,
    post-period spend as the metric, user-parity as assignment.
    θ = cov(X,Y)/var(X) from exact fixed-point moments; the adjusted
    effect needs only group means (Ȳ_T − θX̄_T) − (Ȳ_C − θX̄_C), and the
    variance-reduction share is ρ² — all closed-form over one user-level
    aggregate + one moment fold, no row-level second pass."""
    e = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    per_user = e.groupBy("user_id").agg(
        dsum(F.when(F.col("ts") < cut, F.col("value")).otherwise(0.0)).alias("__x"),
        dsum(F.when(F.col("ts") >= cut, F.col("value")).otherwise(0.0)).alias("__y"),
    )
    g = per_user.withColumn("__t", (F.col("user_id") % 2 == 0).cast("int"))
    m = g.agg(
        F.count(F.lit(1)).alias("n_users"),
        dsum("__x").alias("__sx"),
        dsum("__y").alias("__sy"),
        dsum(F.col("__x") * F.col("__y")).alias("__sxy"),
        dsum(F.col("__x") * F.col("__x")).alias("__sxx"),
        dsum(F.col("__y") * F.col("__y")).alias("__syy"),
        F.sum("__t").cast("double").alias("__nt"),
        dsum(F.when(F.col("__t") == 1, F.col("__x")).otherwise(0.0)).alias("__sxt"),
        dsum(F.when(F.col("__t") == 1, F.col("__y")).otherwise(0.0)).alias("__syt"),
    )
    n = F.col("n_users").cast("double")
    covxy = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    varx = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    vary = n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    theta = covxy / varx
    nt = F.col("__nt")
    nc = n - nt
    xbar_t = F.col("__sxt") / nt
    ybar_t = F.col("__syt") / nt
    xbar_c = (F.col("__sx") - F.col("__sxt")) / nc
    ybar_c = (F.col("__sy") - F.col("__syt")) / nc
    effect_raw = ybar_t - ybar_c
    effect_cuped = (ybar_t - theta * xbar_t) - (ybar_c - theta * xbar_c)
    rho2 = covxy * covxy / (varx * vary)
    return m.select(
        "n_users",
        F.round(theta, 6).alias("theta"),
        F.round(effect_raw, 6).alias("effect_raw"),
        F.round(effect_cuped, 6).alias("effect_cuped"),
        F.round(rho2, 6).alias("var_reduction"),
    )


@q("q_hash_collision_qa")
def q_hash_collision_qa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing load audit for the 256-bucket hashed classifier
    (operators/text.classifier_score): how many buckets the corpus
    vocabulary actually occupies, the max/avg bucket load and the skew
    ratio — the collision QA that decides whether the hash width is
    large enough before anyone trusts hashed-feature scores. Bucket
    arithmetic is the engine-shared md5-digit expression, so the audit
    is hash-exact."""
    from fortune_500_financial_insights_pipeline_spark.operators.text import (
        _feature_bucket_sql,
    )

    d = load_table(spark, sf_dir, "documents")
    terms = (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .where(F.col("term") != "")
        .distinct()
    )
    bucketed = terms.select(F.expr(_feature_bucket_sql("term")).alias("b"))
    loads = bucketed.groupBy("b").agg(F.count(F.lit(1)).alias("load"))
    return loads.agg(
        F.sum("load").cast("long").alias("n_terms"),
        F.count(F.lit(1)).alias("n_buckets_used"),
        F.max("load").cast("long").alias("max_load"),
        F.round(F.sum("load").cast("double") / F.count(F.lit(1)), 6).alias(
            "avg_load"
        ),
        F.round(
            F.max("load").cast("double")
            / (F.sum("load").cast("double") / F.count(F.lit(1))),
            6,
        ).alias("skew_ratio"),
    )


@q("q_markov_attribution")
def q_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect attribution (operators/paths.
    markov_removal_attribution): journeys = per-user event sequences
    truncated at the first purchase (START → … → CONV/NULL), first-order
    chain probabilities as 1e6 fixed-point integers, absorption
    probability from 24 value-iteration steps run on all five scenarios
    (full + one per removed channel) in ONE union-tagged frame — the
    multi-touch attribution model that, unlike last-touch, credits
    assist channels. Every step is integer arithmetic with truncating
    division, so the whole trajectory (and therefore the credit split)
    is hash-exact."""
    from fortune_500_financial_insights_pipeline_spark.operators.paths import (
        markov_removal_attribution,
    )

    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    )
    firstp = (
        ordered.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("rn").alias("prn"))
    )
    j = ordered.join(firstp, "user_id", "left")
    pre = j.where(F.col("prn").isNull() | (F.col("rn") < F.col("prn")))
    wj = W.partitionBy("user_id").orderBy("rn")
    internal = pre.select(
        F.coalesce(F.lag("event_type").over(wj), F.lit("START")).alias("from_state"),
        F.col("event_type").alias("to_state"),
    )
    users = j.groupBy("user_id").agg(F.max("prn").alias("prn"))
    lastpre = pre.groupBy("user_id").agg(F.max("rn").alias("mrn"))
    last_type = (
        pre.join(lastpre, "user_id")
        .where(F.col("rn") == F.col("mrn"))
        .select("user_id", F.col("event_type").alias("__lt"))
    )
    term = (
        users.join(last_type, "user_id", "left")
        .select(
            F.coalesce("__lt", F.lit("START")).alias("from_state"),
            F.when(F.col("prn").isNotNull(), "CONV").otherwise("NULL").alias(
                "to_state"
            ),
        )
    )
    pairs = internal.unionByName(term)
    counts = pairs.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.groupBy("from_state").agg(F.sum("n").alias("__tot"))
    trans = counts.join(F.broadcast(totals), "from_state").select(
        "from_state",
        "to_state",
        F.round(F.col("n").cast("double") / F.col("__tot") * 1000000)
        .cast("long")
        .alias("t6"),
    )
    return markov_removal_attribution(
        trans, ["click", "error", "signup", "view"], k_iter=24
    )


@q("q_shapley_attribution")
def q_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley-value channel attribution (the coalition counterpart to
    q_markov_attribution): exposure sets are 4-bit masks (bit_or over
    each user's pre-purchase channels), the coalition value v(S) is the
    conversion rate of users exposed to EXACTLY S, and
    φ_i = Σ_{S∌i} w(|S|)·(v(S∪i) − v(S)) with the factorial weights
    embedded as 1e6 fixed-point literals. The whole computation past the
    per-user mask aggregate runs on a 16-row coalition frame × 4
    channels — exact long arithmetic end to end, and the efficiency
    axiom (Σφ = v(full) − v(∅)) is test-pinned."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    )
    firstp = (
        ordered.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("rn").alias("prn"))
    )
    j = ordered.join(firstp, "user_id", "left")
    bit = (
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "error", 2)
        .when(F.col("event_type") == "signup", 4)
        .when(F.col("event_type") == "view", 8)
        .otherwise(0)
    )
    per_user = (
        j.select(
            "user_id",
            F.when(
                F.col("prn").isNull() | (F.col("rn") < F.col("prn")), bit
            ).otherwise(0).alias("__b"),
            F.col("prn").isNotNull().cast("int").alias("__conv"),
        )
        .groupBy("user_id")
        .agg(
            F.expr("bit_or(__b)").alias("mask"),
            F.max("__conv").alias("conv"),
        )
    )
    vset = per_user.groupBy("mask").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("conv").alias("n_conv"),
    )
    allmasks = spark.range(16).select(F.col("id").cast("int").alias("mask"))
    v = (
        allmasks.join(vset, "mask", "left")
        .select(
            "mask",
            F.coalesce(
                F.round(
                    F.col("n_conv").cast("double")
                    / F.col("n_users")
                    * 1000000
                ).cast("long"),
                F.lit(0),
            ).alias("v6"),
        )
        .localCheckpoint(eager=False)
    )
    # factorial weights k!(n-1-k)!/n! for n=4, k=|S| in 0..3, at 1e6 scale
    wlits = [round(f * 1000000) for f in (1 / 4, 1 / 12, 1 / 12, 1 / 4)]
    warr = F.array(*[F.lit(x) for x in wlits])
    ch = spark.createDataFrame(
        [("click", 1), ("error", 2), ("signup", 4), ("view", 8)],
        "channel string, bit int",
    )
    base = v.crossJoin(F.broadcast(ch)).where(
        F.expr("(mask & bit) = 0")
    )
    vwith = v.select(F.col("mask").alias("__mw"), F.col("v6").alias("__vw"))
    terms = base.join(
        vwith, F.expr("(mask | bit)") == F.col("__mw")
    ).select(
        "channel",
        (
            F.element_at(warr, F.expr("bit_count(mask)") + 1)
            * (F.col("__vw") - F.col("v6"))
        ).alias("__t"),
    )
    phi = terms.groupBy("channel").agg(F.sum("__t").alias("__phi"))
    tot = phi.agg(F.sum("__phi").alias("__tot"))
    return (
        phi.crossJoin(F.broadcast(tot))
        .select(
            "channel",
            F.round(F.col("__phi").cast("double") / 1e12, 6).alias("shapley_value"),
            F.round(
                F.when(
                    F.col("__tot") != 0,
                    F.col("__phi").cast("double") / F.col("__tot"),
                ),
                6,
            ).alias("attribution_share"),
        )
        .orderBy("channel")
    )


@q("q_eventually_follows")
def q_eventually_follows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Process-mining eventually-follows matrix: for each ordered pair of
    event types (a, b), in how many user journeys does a occur before
    some later b (first-a position < last-b position) — the causal-order
    view that q_transition_matrix's directly-follows counts miss (a → x
    → b never shows under adjacency). Per user the state collapses to
    ≤5 (type, first_pos, last_pos) rows, so the pair expansion is
    25-bounded per user — never event×event."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    spans = (
        e.select("user_id", "event_type", F.row_number().over(w).alias("rn"))
        .groupBy("user_id", "event_type")
        .agg(F.min("rn").alias("__first"), F.max("rn").alias("__last"))
    )
    a = spans.select(
        "user_id", F.col("event_type").alias("type_a"), F.col("__first").alias("__fa")
    )
    b = spans.select(
        "user_id", F.col("event_type").alias("type_b"), F.col("__last").alias("__lb")
    )
    total = e.agg(F.countDistinct("user_id").alias("__n"))
    return (
        a.join(b, "user_id")
        .where(F.col("__fa") < F.col("__lb"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_journeys"))
        .crossJoin(F.broadcast(total))
        .select(
            "type_a",
            "type_b",
            "n_journeys",
            F.round(F.col("n_journeys").cast("double") / F.col("__n"), 6).alias(
                "support"
            ),
        )
        .orderBy("type_a", "type_b")
    )


@q("q_transition_latency")
def q_transition_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Process-mining performance view: p50/p90 seconds between
    consecutive events per directly-follows pair (from, to) — where the
    journey stalls. One lag window (both type and microsecond epoch ride
    the same sort), exact interpolated percentiles per pair."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("__us", "event_id")
    src = e.select(
        "user_id", "event_type", "event_id", F.unix_micros("ts").alias("__us")
    )
    gaps = (
        src.select(
            F.lag("event_type").over(w).alias("from_type"),
            F.col("event_type").alias("to_type"),
            ((F.col("__us") - F.lag("__us").over(w)).cast("double") / 1000000).alias(
                "__s"
            ),
        )
        .where(F.col("from_type").isNotNull())
    )
    return (
        gaps.groupBy("from_type", "to_type")
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.round(F.percentile("__s", F.lit(0.5)), 6).alias("p50_s"),
            F.round(F.percentile("__s", F.lit(0.9)), 6).alias("p90_s"),
        )
        .orderBy("from_type", "to_type")
    )


@q("q_ivf_balance")
def q_ivf_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index health: per-cell occupancy of the 16-cell md5-seeded
    coarse quantizer (cell sizes and corpus share) — the balance audit an
    ANN index publishes after every build/append, because one hot cell
    turns n_probe routing back into a linear scan. Assignment is the
    oracle-reproducible portable routing (ivf_index_portable); the audit
    is one cell-count aggregate."""
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import (
        ivf_index_portable,
        md5_sample_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    centroids = md5_sample_centroids(emb, k=16)
    cells = ivf_index_portable(emb, centroids).groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_vecs")
    )
    tot = cells.agg(F.sum("n_vecs").alias("__t"))
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            F.col("cell").cast("long").alias("cell"),
            "n_vecs",
            F.round(F.col("n_vecs").cast("double") / F.col("__t"), 6).alias("share"),
        )
        .orderBy("cell")
    )


@q("q_seasonal_anomalies")
def q_seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal anomaly flags: days whose decomposition residual
    (q_seasonal_decompose) sits more than 3 robust deviations (MAD) from
    the median residual — the STL-residual rule ops dashboards alarm on,
    composed on the already-oracled decomposition. The stats pass is one
    two-stage exact-percentile aggregate over the interior-day frame."""
    sd = QUERIES["q_seasonal_decompose"](spark, sf_dir)
    s1 = sd.agg(F.percentile("residual", F.lit(0.5)).alias("__med"))
    s2 = (
        sd.crossJoin(F.broadcast(s1))
        .agg(
            F.percentile(F.abs(F.col("residual") - F.col("__med")), F.lit(0.5)).alias(
                "__mad"
            ),
            F.max("__med").alias("__med"),
        )
    )
    return (
        sd.crossJoin(F.broadcast(s2))
        .where(F.abs(F.col("residual") - F.col("__med")) > 3 * F.col("__mad"))
        .select(
            "d",
            "value",
            F.round("residual", 6).alias("residual"),
            F.round(F.abs(F.col("residual") - F.col("__med")), 6).alias("deviation"),
            F.round(3 * F.col("__mad"), 6).alias("threshold"),
        )
        .orderBy("d")
    )


@q("q_sax_motifs")
def q_sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX motif mining (Lin et al. 2003) over supplier price series:
    z-normalize (exact fixed-point moments, shared-text σ), PAA-average
    4-day blocks, map to a 4-letter alphabet at the N(0,1) quartile
    breakpoints (±0.6745, 0), slide a 3-symbol word window, and report
    words recurring ≥2 times within a series — the repeated-shape
    (motif) detector behind pattern screening. Everything after the
    daily aggregate runs on block-count-sized frames; symbols are
    round-6 compares against shared literals, so the discretization is
    hash-exact."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_suppkey") <= 10)
    daily = li.groupBy(
        "l_suppkey", F.date_format("l_shipdate", "yyyy-MM-dd").alias("day")
    ).agg(F.round(davg("l_extendedprice"), 6).alias("close"))
    stats = daily.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("__n"),
        dsum("close").alias("__s"),
        dsum(F.col("close") * F.col("close")).alias("__ss"),
    )
    nn = F.col("__n").cast("double")
    sigma = F.sqrt((nn * F.col("__ss") - F.col("__s") * F.col("__s")) / (nn * nn))
    wd = W.partitionBy("l_suppkey").orderBy("day")
    z = F.round(
        (F.col("close") - F.col("__s") / nn) / sigma, 6
    )
    blocks = (
        daily.join(F.broadcast(stats), "l_suppkey")
        .withColumn("__rn", F.row_number().over(wd))
        .select(
            "l_suppkey",
            F.expr("(__rn - 1) div 4").alias("__blk"),
            z.alias("__z"),
        )
        .groupBy("l_suppkey", "__blk")
        .agg(F.round(davg("__z"), 6).alias("__paa"))
    )
    sym = (
        F.when(F.col("__paa") < -0.6745, "a")
        .when(F.col("__paa") < 0.0, "b")
        .when(F.col("__paa") < 0.6745, "c")
        .otherwise("d")
    )
    wb = W.partitionBy("l_suppkey").orderBy("__blk")
    words = (
        blocks.select("l_suppkey", "__blk", sym.alias("__sym"))
        .select(
            "l_suppkey",
            F.concat(
                F.col("__sym"),
                F.lead("__sym", 1).over(wb),
                F.lead("__sym", 2).over(wb),
            ).alias("word"),
        )
        .where(F.col("word").isNotNull())
    )
    return (
        words.groupBy("l_suppkey", "word")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .where(F.col("n_occurrences") >= 2)
        .orderBy("l_suppkey", "word")
    )


@q("q_mixture_kl")
def q_mixture_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mixture divergence report: per-source whitespace-token
    share vs the uniform 1/20 target, with the per-source KL(p‖q) term
    p·log2(p/q) — the one-number drift gauge a data-mixing pipeline
    (q_mix_sources sets the target; this audits the delivered corpus)
    alarms on. Shares are exact count ratios rounded to 6dp before the
    log, so every term is hash-exact."""
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.sum(F.size(F.split(F.col("text"), " "))).cast("long").alias("n_tokens")
    )
    tot = per.agg(F.sum("n_tokens").alias("__t"))
    p = F.round(F.col("n_tokens").cast("double") / F.col("__t"), 6)
    q_target = F.lit(0.05)
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_tokens",
            p.alias("share"),
            F.round(p * F.log2(p / q_target), 9).alias("kl_term"),
        )
        .orderBy("source")
    )


@q("q_pr_curve")
def q_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall/F1 sweep of the hashed-feature classifier at nine
    thresholds — the operating-point table next to q_auc (which ranks)
    and q_calibration (which checks honesty): one conditional aggregate
    per threshold over the shared scored frame, ratios rounded to 6dp
    before F1 so every cell is hash-exact."""
    scored = _scored_labeled_docs(spark, sf_dir)
    thr = spark.createDataFrame(
        [(t / 10.0,) for t in range(1, 10)], "threshold double"
    )
    j = scored.crossJoin(F.broadcast(thr))
    agg = j.groupBy("threshold").agg(
        F.sum(F.when((F.col("prob") >= F.col("threshold")) & (F.col("label") == 1), 1).otherwise(0)).cast("long").alias("tp"),
        F.sum(F.when((F.col("prob") >= F.col("threshold")) & (F.col("label") == 0), 1).otherwise(0)).cast("long").alias("fp"),
        F.sum(F.when((F.col("prob") < F.col("threshold")) & (F.col("label") == 1), 1).otherwise(0)).cast("long").alias("fn"),
    )
    p6 = F.round(
        F.when(F.col("tp") + F.col("fp") > 0, F.col("tp").cast("double") / (F.col("tp") + F.col("fp"))),
        6,
    )
    r6 = F.round(
        F.when(F.col("tp") + F.col("fn") > 0, F.col("tp").cast("double") / (F.col("tp") + F.col("fn"))),
        6,
    )
    out = agg.select("threshold", "tp", "fp", "fn", p6.alias("precision"), r6.alias("recall"))
    f1 = F.round(
        F.when(
            F.col("precision") + F.col("recall") > 0,
            2 * F.col("precision") * F.col("recall") / (F.col("precision") + F.col("recall")),
        ),
        6,
    )
    return out.withColumn("f1", f1).orderBy("threshold")


@q("q_lift_deciles")
def q_lift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model gains table: documents ranked by classifier probability
    (deterministic doc_id tiebreak), split into ten deciles, per-decile
    positive rate, lift over the base rate and cumulative gain — the
    how-deep-do-I-have-to-score readout campaign targeting reads.
    The global ntile runs over the scored frame (reporting-sized — the
    q_histogram_equidepth precedent); everything else is exact count
    ratios."""
    scored = _scored_labeled_docs(spark, sf_dir)
    wn = W.orderBy(F.desc("prob"), F.asc("doc_id"))
    dec = scored.withColumn("decile", F.ntile(10).over(wn))
    per = dec.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("label").cast("long").alias("n_pos"),
    )
    tot = per.agg(
        F.sum("n_docs").alias("__n"), F.sum("n_pos").alias("__p")
    )
    wc = W.orderBy("decile").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        per.crossJoin(F.broadcast(tot))
        .withColumn("__cum", F.sum("n_pos").over(wc))
        .select(
            "decile",
            "n_docs",
            "n_pos",
            F.round(
                (F.col("n_pos").cast("double") / F.col("n_docs"))
                / (F.col("__p").cast("double") / F.col("__n")),
                6,
            ).alias("lift"),
            F.round(F.col("__cum").cast("double") / F.col("__p"), 6).alias(
                "cum_gain"
            ),
        )
        .orderBy("decile")
    )


@q("q_abc_analysis")
def q_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts ranked by revenue, class A =
    the prefix holding 80% of cumulative revenue, B = the next 15%, C =
    the tail — the classic supply-chain prioritization cut. Per-part
    totals are exact fixed point; the cumulative share rides one rank
    window over the part-count aggregate (reporting-sized, the
    q_lorenz_deciles precedent); output is the 3-row class summary."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("__rev")
    )
    tot = per_part.agg(dsum("__rev").alias("__t"))
    wr = W.orderBy(F.desc("__rev"), F.asc("l_partkey")).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    cum = (
        per_part.withColumn(
            "__cum", F.sum(F.round(F.col("__rev") * 1000000).cast("long")).over(wr)
        )
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "__cshare", (F.col("__cum").cast("double") / 1000000) / F.col("__t")
        )
    )
    cls = (
        F.when(F.col("__cshare") <= 0.80, "A")
        .when(F.col("__cshare") <= 0.95, "B")
        .otherwise("C")
    )
    return (
        cum.select(cls.alias("abc_class"), "__rev", "__t")
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(dsum("__rev"), 6).alias("revenue"),
            F.round(dsum("__rev") / F.max("__t"), 6).alias("revenue_share"),
        )
        .orderBy("abc_class")
    )


@q("q_zipf_slope")
def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf exponent of the corpus term-frequency distribution: OLS slope
    of log2(freq) on log2(rank) over the top-100 terms (natural text ≈
    −1; a badly deduplicated or templated corpus drifts shallower) — the
    corpus-linguistics screen next to q_heaps_curve. Rank window over
    the vocabulary aggregate, fixed-point moment sums, closed-form
    slope."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    wr = W.orderBy(F.desc("freq"), F.asc("term"))
    top = (
        tf.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= 100)
        .select(
            F.round(F.log2(F.col("rank").cast("double")), 6).alias("__x"),
            F.round(F.log2(F.col("freq").cast("double")), 6).alias("__y"),
        )
    )
    m = top.agg(
        F.count(F.lit(1)).alias("n_terms"),
        dsum("__x").alias("__sx"),
        dsum("__y").alias("__sy"),
        dsum(F.col("__x") * F.col("__y")).alias("__sxy"),
        dsum(F.col("__x") * F.col("__x")).alias("__sxx"),
    )
    nn = F.col("n_terms").cast("double")
    slope = (nn * F.col("__sxy") - F.col("__sx") * F.col("__sy")) / (
        nn * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    )
    intercept = F.col("__sy") / nn - slope * F.col("__sx") / nn
    return m.select(
        "n_terms",
        F.round(slope, 6).alias("zipf_slope"),
        F.round(intercept, 6).alias("log2_c"),
    )


@q("q_heaps_curve")
def q_heaps_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth in ingestion (doc id) order: distinct
    terms seen by each 10%-of-corpus checkpoint — the diminishing-returns
    curve (with q_ngram_novelty's per-doc view) that says when more of
    the same source stops buying vocabulary. Each term carries only its
    FIRST containing doc (one min-aggregate), so the curve is a
    10-bucket count — the corpus is never re-scanned per checkpoint."""
    from fortune_500_financial_insights_pipeline_spark.operators.text import word_ngrams

    d = load_table(spark, sf_dir, "documents")
    maxid = d.agg(F.max("doc_id").alias("__m"))
    # bigram vocabulary: unigrams saturate within the first documents on
    # any fixed token pool — the bigram space is what actually grows
    firstdoc = (
        d.select("doc_id", F.explode(word_ngrams(F.col("text"), 2)).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.min("doc_id").alias("__first"))
    )
    decile = F.least(
        F.lit(10),
        F.floor(F.col("__first") * 10 / (F.col("__m") + 1)).cast("int") + 1,
    )
    per = (
        firstdoc.crossJoin(F.broadcast(maxid))
        .select(decile.alias("checkpoint"))
        .groupBy("checkpoint")
        .agg(F.count(F.lit(1)).alias("new_terms"))
    )
    wc = W.orderBy("checkpoint").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        per.withColumn("vocab_size", F.sum("new_terms").over(wc).cast("long"))
        .orderBy("checkpoint")
    )


@q("q_kaplan_meier")
def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve for time-to-first-purchase: per user,
    duration = days from first event to first purchase (event) or to the
    last observed event (censored); at each event time the curve steps
    by (1 − d/n) over the at-risk set. The product is computed as
    exp(Σ ln(1 − d/n)) with per-term round-9 fixed-point cumulative
    sums — the only order-sensitive float fold is replaced by an exact
    long cumsum, so the curve is hash-identical cross-engine. All work
    after the per-user aggregate runs on the distinct-duration frame
    (≤ observation-window days)."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min("ts").alias("__first"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("__fp"),
        F.max("ts").alias("__last"),
    )
    dur = F.datediff(
        F.coalesce(F.col("__fp"), F.col("__last")).cast("date"),
        F.col("__first").cast("date"),
    )
    users = per_user.select(
        dur.alias("t"), F.col("__fp").isNotNull().cast("int").alias("event")
    )
    per_t = users.groupBy("t").agg(
        F.count(F.lit(1)).alias("__n_at"),
        F.sum("event").cast("long").alias("d"),
    )
    tot = per_t.agg(F.sum("__n_at").alias("__total"))
    wc = W.orderBy("t").rowsBetween(W.unboundedPreceding, -1)
    at_risk = (
        per_t.crossJoin(F.broadcast(tot))
        .withColumn(
            "n_risk",
            (F.col("__total") - F.coalesce(F.sum("__n_at").over(wc), F.lit(0)))
            .cast("long"),
        )
        .where(F.col("d") > 0)
    )
    # d == n_risk (everyone at risk converts at t) sends the curve to an
    # exact 0 — handled as a carried flag, never ln(0)
    term = F.when(
        F.col("d") < F.col("n_risk"),
        F.round(
            F.log(1.0 - F.col("d").cast("double") / F.col("n_risk")) * 1e9
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    zflag = F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0)
    ws = W.orderBy("t").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        at_risk.withColumn("__cum", F.sum(term).over(ws))
        .withColumn("__z", F.max(zflag).over(ws))
        .select(
            "t",
            "n_risk",
            "d",
            F.when(F.col("__z") == 1, 0.0)
            .otherwise(F.round(F.exp(F.col("__cum").cast("double") / 1e9), 6))
            .alias("survival"),
        )
        .orderBy("t")
    )


@q("q_var_backtest")
def q_var_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VaR backtest with Kupiec's proportion-of-failures statistic: fit
    VaR95 on the first half of the market's daily-return history (exact
    ceil(0.05·n) order-statistic rank — the q_var_es discipline), count
    breaches in the held-out second half, and report the POF likelihood
    ratio −2[(n−x)ln((1−p)/(1−x/n)) + x·ln(p/(x/n))] with zero-count
    terms handled explicitly — the model-validation gate a risk desk
    runs before trusting q_var_es's number. Everything past the daily
    aggregate is day-count-sized."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("day")
    ).agg(F.round(davg("l_extendedprice"), 6).alias("close"))
    wd = W.orderBy("day")
    rets = (
        daily.withColumn("__r", F.round(F.col("close") / F.lag("close").over(wd) - 1, 6))
        .where(F.col("__r").isNotNull())
        .withColumn("__rn", F.row_number().over(wd))
    )
    ntot = rets.agg(F.count(F.lit(1)).alias("__n"))
    split = rets.crossJoin(F.broadcast(ntot)).withColumn(
        "__half", F.when(F.col("__rn") <= F.expr("__n div 2"), 1).otherwise(2)
    )
    train = split.where(F.col("__half") == 1)
    n1 = train.agg(F.count(F.lit(1)).alias("__n1"))
    wv = W.orderBy(F.asc("__r"), F.asc("day"))
    var = (
        train.withColumn("__vr", F.row_number().over(wv))
        .crossJoin(F.broadcast(n1))
        .where(F.col("__vr") == F.expr("(__n1 + 19) div 20"))  # integer-exact ceil(0.05 n)
        .select(F.col("__r").alias("var95"))
    )
    test = split.where(F.col("__half") == 2)
    agg = test.crossJoin(F.broadcast(var)).agg(
        F.max("var95").alias("var95"),
        F.count(F.lit(1)).alias("n_test"),
        F.sum(F.when(F.col("__r") < F.col("var95"), 1).otherwise(0))
        .cast("long")
        .alias("n_breaches"),
    )
    n = F.col("n_test").cast("double")
    x = F.col("n_breaches").cast("double")
    p = F.lit(0.05)
    term1 = F.when(
        F.col("n_breaches") < F.col("n_test"),
        (n - x) * F.log((1 - p) / (1 - x / n)),
    ).otherwise(F.lit(0.0))
    term2 = F.when(
        F.col("n_breaches") > 0, x * F.log(p / (x / n))
    ).otherwise(F.lit(0.0))
    return agg.select(
        F.round("var95", 6).alias("var95"),
        "n_test",
        "n_breaches",
        F.round(x / n, 6).alias("breach_rate"),
        F.round(-2 * (term1 + term2), 6).alias("kupiec_lr"),
    )


@q("q_partition_health")
def q_partition_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition data-quality trend: for each ship month, row count,
    required-column null rates, distinct-supplier coverage, and a
    volume-drop flag vs the previous month (> 50% fall = the
    broken-upstream signature) — the freshness/completeness panel every
    landing table publishes (the reference reloads wholesale and would
    never notice a half-empty month). One scan, month-count-sized
    output."""
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy(
        F.date_format("l_shipdate", "yyyy-MM").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(
            F.sum(F.when(F.col("l_extendedprice").isNull(), 1).otherwise(0)).cast(
                "double"
            )
            / F.count(F.lit(1)),
            6,
        ).alias("null_rate_price"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
    )
    wm = W.orderBy("month")
    prev = F.lag("n_rows").over(wm)
    return (
        per.withColumn(
            "volume_drop",
            (prev.isNotNull() & (F.col("n_rows") < prev * 0.5)).cast("int"),
        )
        .orderBy("month")
    )


@q("q_als_rank1")
def q_als_rank1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-1 ALS matrix factorization in relational algebra: quantity
    ratings r(cust, part) factor into u(cust)·v(part) by three
    alternating closed-form solves — u_c = Σ r·v / Σ v², then
    v_p = Σ r·u / Σ u² — each ONE groupBy + equi-join per side (the
    iterative-algorithm discipline of kmeans/PageRank applied to
    recommender factorization; rank-1 keeps the per-key solve
    closed-form, so no driver-side linear algebra). Factors are round-6
    fixed-point at every step, making the whole trajectory — and the
    final item-factor ranking — hash-exact. Output: top-20 parts by
    learned factor (the 'most preference-loaded items' view)."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_partkey") <= 200)
    r = (
        li.select(
            F.col("l_suppkey").alias("c"),
            F.col("l_partkey").alias("p"),
            F.col("l_quantity").cast("double").alias("r"),
        )
        .groupBy("c", "p")
        .agg(F.round(dsum("r"), 6).alias("r"))
        # the ratings frame feeds both solve directions every iteration —
        # materialize once
        .localCheckpoint(eager=False)
    )
    v = r.select("p").distinct().withColumn("v", F.lit(1.0))
    for _ in range(3):
        ju = r.join(v, "p")
        u = (
            ju.groupBy("c")
            .agg(
                (
                    dsum(F.col("r") * F.col("v"))
                    / dsum(F.col("v") * F.col("v"))
                ).alias("__u")
            )
            .select("c", F.round("__u", 6).alias("u"))
            .localCheckpoint(eager=False)
        )
        jv = r.join(u, "c")
        v = (
            jv.groupBy("p")
            .agg(
                (
                    dsum(F.col("r") * F.col("u"))
                    / dsum(F.col("u") * F.col("u"))
                ).alias("__v")
            )
            .select("p", F.round("__v", 6).alias("v"))
            .localCheckpoint(eager=False)
        )
    return v.orderBy(F.desc("v"), F.asc("p")).limit(20)


@q("q_ppr")
def q_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from the 5 seed suppliers over the bipartite
    trade graph (operators/pagerank.personalized_pagerank, 10 rounds,
    damping 0.85): the relevance-to-these-entities ranking behind
    related-supplier panels and seed-expanded audiences — global
    PageRank (q_pagerank) answers 'important overall', this answers
    'important to THESE'. Same bit-exact integer recurrence; top-20
    nodes by rank."""
    from fortune_500_financial_insights_pipeline_spark.operators.pagerank import (
        personalized_pagerank,
    )

    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_orderkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("l_suppkey").alias("s"),
            (F.col("o_custkey") + 1000000).alias("c"),
        )
        .distinct()
    )
    edges = base.select(F.col("s").alias("src"), F.col("c").alias("dst")).unionByName(
        base.select(F.col("c").alias("src"), F.col("s").alias("dst"))
    )
    seeds = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_suppkey") <= 5)
        .select(F.col("s_suppkey").cast("long").alias("node"))
    )
    ranks = personalized_pagerank(edges, seeds)
    return ranks.orderBy(F.desc("rank_fp"), F.asc("node")).limit(20)


@q("q_reconciliation")
def q_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-way match reconciliation: every order's header total vs the
    sum of its lines (extendedprice·(1−discount)·(1+tax)), the
    finance-ops control that catches partial loads and double-posts
    before the close. Exact fixed-point line sums; the report is the
    top-20 absolute discrepancies plus per-order diffs — at fixture
    scale TPC-H headers are generated FROM the lines, so genuine
    discrepancies are the interesting rows. One join on the order key,
    TakeOrdered cut."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, sf_dir, "lineitem")
    lines = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.round(
            dsum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ),
            6,
        ).alias("line_total")
    )
    j = o.join(lines, "o_orderkey", "left").select(
        "o_orderkey",
        F.round("o_totalprice", 6).alias("header_total"),
        F.coalesce("line_total", F.lit(0.0)).alias("line_total"),
    )
    diff = F.round(F.col("header_total") - F.col("line_total"), 6)
    return (
        j.withColumn("diff", diff)
        .withColumn("abs_diff", F.abs(diff))
        .orderBy(F.desc("abs_diff"), F.asc("o_orderkey"))
        .limit(20)
    )


@q("q_burrows_delta")
def q_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta stylometry between sources: relative frequencies
    of the 30 most common corpus terms per source, z-scored across
    sources (population σ from exact fixed-point moments), and
    Δ(a, b) = mean |z_a − z_b| for every source pair — the authorship/
    provenance distance that flags a relabeled crawl slice. Everything
    past the term count runs on (30 terms × 20 sources)-sized frames;
    the pair join is keyed on the TERM."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(F.split("text", " ")).alias("term")
    ).where(F.col("term") != "")
    top = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("__f"))
        .orderBy(F.desc("__f"), F.asc("term"))
        .limit(30)
        .select("term")
    )
    per_src_tot = toks.groupBy("source").agg(F.count(F.lit(1)).alias("__tot"))
    freq = (
        toks.join(F.broadcast(top), "term")
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("__n"))
        .join(per_src_tot, "source")
        .select(
            "source",
            "term",
            F.round(F.col("__n").cast("double") / F.col("__tot"), 9).alias("__rf"),
        )
    )
    stats = freq.groupBy("term").agg(
        F.count(F.lit(1)).alias("__k"),
        (F.sum(F.round(F.col("__rf") * 1000000000).cast("long")).cast("double") / 1e9).alias("__s"),
        (F.sum(F.round(F.col("__rf") * F.col("__rf") * 1000000000).cast("long")).cast("double") / 1e9).alias("__ss"),
    )
    kk = F.col("__k").cast("double")
    sigma = F.sqrt((kk * F.col("__ss") - F.col("__s") * F.col("__s")) / (kk * kk))
    # a term with zero cross-source variance carries no style signal (and
    # would divide by zero) — drop it on both engines
    z = (
        freq.join(F.broadcast(stats), "term")
        .where(sigma > 0)
        .select(
            "source",
            "term",
            F.round((F.col("__rf") - F.col("__s") / kk) / sigma, 6).alias("__z"),
        )
    )
    a = z.select(F.col("source").alias("src_a"), "term", F.col("__z").alias("__za"))
    b = z.select(F.col("source").alias("src_b"), "term", F.col("__z").alias("__zb"))
    return (
        a.join(b, "term")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(
            F.round(davg(F.abs(F.col("__za") - F.col("__zb"))), 6).alias("delta")
        )
        .orderBy("src_a", "src_b")
    )


@q("q_hits")
def q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS over the directed supplier→customer trade graph
    (operators/pagerank.hits, 8 rounds): hub scores rank suppliers by
    how much authoritative demand they feed, authority scores rank
    customers by how much hub supply they draw — the two-sided
    centrality PageRank's single score conflates. Max-normalized
    round-6 half-steps make the trajectory hash-exact; output is the
    top-10 of each role."""
    from fortune_500_financial_insights_pipeline_spark.operators.pagerank import hits

    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_orderkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("l_suppkey").cast("long").alias("src"),
            (F.col("o_custkey") + 1000000).cast("long").alias("dst"),
        )
        .distinct()
    )
    scored = hits(edges)
    w = W.partitionBy("role").orderBy(F.desc("score"), F.asc("node"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .orderBy("role", "rank")
    )


@q("q_lead_lag_corr")
def q_lead_lag_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation function between two supplier price series at
    lags −5..+5 days: the leading-indicator probe (a peak off lag 0
    says one series anticipates the other) that q_pairwise_corr's
    contemporaneous matrix can't see. One day-keyed equi-join per lag
    via a broadcast lag relation + date_add — never a self cross join;
    exact fixed-point Pearson moments per lag."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_suppkey").isin(1, 2))
    series = li.groupBy(
        "l_suppkey", F.col("l_shipdate").cast("date").alias("d")
    ).agg(F.round(davg("l_extendedprice"), 6).alias("close"))
    a = series.where(F.col("l_suppkey") == 1).select(
        "d", F.col("close").alias("__x")
    )
    b = series.where(F.col("l_suppkey") == 2).select(
        F.col("d").alias("__db"), F.col("close").alias("__y")
    )
    lags = spark.range(-5, 6).select(F.col("id").cast("int").alias("lag"))
    j = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.expr("date_add(d, lag)") == F.col("__db"))
    )
    m = j.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_days"),
        dsum("__x").alias("__sx"),
        dsum("__y").alias("__sy"),
        dsum(F.col("__x") * F.col("__y")).alias("__sxy"),
        dsum(F.col("__x") * F.col("__x")).alias("__sxx"),
        dsum(F.col("__y") * F.col("__y")).alias("__syy"),
    )
    nn = F.col("n_days").cast("double")
    num = nn * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    dx = nn * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    dy = nn * F.col("__syy") - F.col("__sy") * F.col("__sy")
    r = F.when((dx > 0) & (dy > 0), num / F.sqrt(dx * dy))
    return m.select("lag", "n_days", F.round(r, 6).alias("ccf")).orderBy("lag")


@q("q_control_chart")
def q_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPC c-chart over daily error-event counts: center line = mean
    daily count, UCL/LCL = mean ± 3·√mean (Poisson limits), each day
    flagged in/out of control — the ops monitoring rule (a point above
    UCL = investigate; q_seasonal_anomalies models structure, this is
    the assumption-light floor). Exact fixed-point mean, shared-text
    sqrt, day-count-sized output."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.where(F.col("event_type") == "error")
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).alias("n_errors"))
    )
    stats = daily.agg(
        (F.sum("n_errors").cast("double") / F.count(F.lit(1))).alias("__mu")
    )
    mu = F.col("__mu")
    ucl = F.round(mu + 3 * F.sqrt(mu), 6)
    lcl = F.round(F.greatest(mu - 3 * F.sqrt(mu), F.lit(0.0)), 6)
    return (
        daily.crossJoin(F.broadcast(stats))
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "n_errors",
            F.round(mu, 6).alias("center"),
            ucl.alias("ucl"),
            lcl.alias("lcl"),
            (
                (F.col("n_errors") > ucl) | (F.col("n_errors") < lcl)
            ).cast("int").alias("out_of_control"),
        )
        .orderBy("day")
    )


@q("q_simpsons_check")
def q_simpsons_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox audit: the pooled quantity↔price correlation vs
    the same correlation within each return-flag stratum — a sign flip
    (pooled positive, every stratum negative, or vice versa) means the
    stratum is a confounder and any pooled readout is misleading. One
    moment aggregate per stratum + one pooled, exact fixed point; the
    output row carries the pooled r, each stratum r, and the flip
    flag."""
    # kilo-scaled price keeps the fixed-point moment interior (price²
    # terms) inside long range — r is invariant to per-feature scaling
    # (the q_mahalanobis lesson)
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "price_k", F.col("l_extendedprice") / 1000.0
    )

    def moments(df, keys):
        return df.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("n"),
            dsum("l_quantity").alias("sx"),
            dsum("price_k").alias("sy"),
            dsum(F.col("l_quantity") * F.col("price_k")).alias("sxy"),
            dsum(F.col("l_quantity") * F.col("l_quantity")).alias("sxx"),
            dsum(F.col("price_k") * F.col("price_k")).alias("syy"),
        )

    def corr_col():
        nn = F.col("n").cast("double")
        num = nn * F.col("sxy") - F.col("sx") * F.col("sy")
        dx = nn * F.col("sxx") - F.col("sx") * F.col("sx")
        dy = nn * F.col("syy") - F.col("sy") * F.col("sy")
        return F.round(F.when((dx > 0) & (dy > 0), num / F.sqrt(dx * dy)), 6)

    per = moments(li, ["l_returnflag"]).select(
        "l_returnflag", corr_col().alias("r_stratum")
    )
    pooled = moments(li.withColumn("__g", F.lit(1)), ["__g"]).select(
        corr_col().alias("r_pooled")
    )
    return (
        per.crossJoin(F.broadcast(pooled))
        .select(
            "l_returnflag",
            "r_stratum",
            "r_pooled",
            (
                F.signum("r_stratum") != F.signum("r_pooled")
            ).cast("int").alias("sign_flip"),
        )
        .orderBy("l_returnflag")
    )


@q("q_ab_srm")
def q_ab_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail: χ² goodness-of-fit of the
    user-parity assignment against the intended 50/50 split, per event
    type — the first thing a trustworthy experiment platform checks
    before reading any metric (a skewed split invalidates q_ab_test's
    contrast). Exact counts, shared-text χ² expression; χ² > 3.841
    (95%, 1 dof) raises the flag."""
    e = load_table(spark, sf_dir, "events")
    per = e.groupBy("event_type").agg(
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("user_id") % 2 != 0, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
    )
    n = (F.col("n_a") + F.col("n_b")).cast("double")
    ex = n / 2
    chi2 = (F.col("n_a") - ex) * (F.col("n_a") - ex) / ex + (
        F.col("n_b") - ex
    ) * (F.col("n_b") - ex) / ex
    return per.select(
        "event_type",
        "n_a",
        "n_b",
        F.round(chi2, 6).alias("chi2"),
        (chi2 > 3.841).cast("int").alias("srm_flag"),
    ).orderBy("event_type")


@q("q_pvm_bridge")
def q_pvm_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume-mix revenue bridge between 1996 and 1997 (the FP&A
    waterfall a CFO deck opens with): per part, volume effect
    (Δq·p96), price effect (Δp·q96), the Δq·Δp interaction, plus
    new-part and discontinued-part buckets — and the identity
    ΔRev = vol + price + mix + new − discontinued holds EXACTLY because
    every term is the same fixed-point arithmetic (test-pinned). One
    scan, one part-keyed full-outer self-alignment, one-row output."""
    li = load_table(spark, sf_dir, "lineitem")
    yr = F.year("l_shipdate")
    per = (
        li.where(yr.isin(1996, 1997))
        .groupBy("l_partkey", yr.alias("__y"))
        .agg(
            F.round(dsum("l_quantity"), 6).alias("__q"),
            F.round(dsum("l_extendedprice"), 6).alias("__rev"),
        )
        .withColumn("__p", F.round(F.col("__rev") / F.col("__q"), 6))
    )
    a = per.where(F.col("__y") == 1996).select(
        "l_partkey", F.col("__q").alias("q0"), F.col("__p").alias("p0"),
        F.col("__rev").alias("r0"),
    )
    b = per.where(F.col("__y") == 1997).select(
        "l_partkey", F.col("__q").alias("q1"), F.col("__p").alias("p1"),
        F.col("__rev").alias("r1"),
    )
    j = a.join(b, "l_partkey", "full")
    both = F.col("q0").isNotNull() & F.col("q1").isNotNull()
    vol = F.when(both, (F.col("q1") - F.col("q0")) * F.col("p0")).otherwise(0.0)
    price = F.when(both, (F.col("p1") - F.col("p0")) * F.col("q0")).otherwise(0.0)
    mix = F.when(
        both, (F.col("q1") - F.col("q0")) * (F.col("p1") - F.col("p0"))
    ).otherwise(0.0)
    new = F.when(F.col("q0").isNull(), F.col("r1")).otherwise(0.0)
    disc = F.when(F.col("q1").isNull(), F.col("r0")).otherwise(0.0)
    return j.agg(
        F.round(dsum(F.coalesce("r0", F.lit(0.0))), 6).alias("rev_1996"),
        F.round(dsum(F.coalesce("r1", F.lit(0.0))), 6).alias("rev_1997"),
        F.round(dsum(vol), 6).alias("volume_effect"),
        F.round(dsum(price), 6).alias("price_effect"),
        F.round(dsum(mix), 6).alias("mix_effect"),
        F.round(dsum(new), 6).alias("new_parts"),
        F.round(dsum(disc), 6).alias("discontinued"),
    )


@q("q_fulfillment_lag")
def q_fulfillment_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship lead time per priority class: exact interpolated
    p50/p90 lag days and the within-30-days service level — the
    fulfillment KPI a priority tier is supposed to buy (if URGENT's p90
    matches LOW's, the tiering is theater). One key join, one percentile
    aggregate per class."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    lag = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    ).cast("double")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority", lag.alias("__lag")
    )
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.percentile("__lag", F.lit(0.5)), 6).alias("p50_days"),
            F.round(F.percentile("__lag", F.lit(0.9)), 6).alias("p90_days"),
            F.round(
                F.sum(F.when(F.col("__lag") <= 30, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("within_30d_rate"),
        )
        .orderBy("o_orderpriority")
    )


@q("q_ingestion_drift")
def q_ingestion_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-cohort drift: per doc-id decile (≈ arrival order), mean
    quality score, English share and mean length — the is-the-newest-
    crawl-worse trend a curation pipeline reviews before admitting a new
    snapshot (q_mixture_kl audits sources; this audits TIME). Decile =
    integer id band, so the cohort cut is a map-side expression."""
    d = load_table(spark, sf_dir, "documents")
    from fortune_500_financial_insights_pipeline_spark.operators.text import quality_score

    maxid = d.agg(F.max("doc_id").alias("__m"))
    dec = F.least(
        F.lit(10), F.floor(F.col("doc_id") * 10 / (F.col("__m") + 1)).cast("int") + 1
    )
    return (
        d.crossJoin(F.broadcast(maxid))
        .select(
            dec.alias("cohort"),
            F.round(quality_score("text"), 6).alias("__q"),
            (F.col("lang") == "en").cast("int").alias("__en"),
            F.length("text").cast("double").alias("__len"),
        )
        .groupBy("cohort")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(davg("__q"), 6).alias("avg_quality"),
            F.round(
                F.sum("__en").cast("double") / F.count(F.lit(1)), 6
            ).alias("en_share"),
            F.round(davg("__len"), 6).alias("avg_chars"),
        )
        .orderBy("cohort")
    )


@q("q_embedding_isotropy")
def q_embedding_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding isotropy diagnostic: ‖mean vector‖ vs the mean vector
    norm — a ratio near 0 means directions are spread (healthy for
    cosine retrieval), near 1 means the space has collapsed onto a
    dominant direction (the anisotropy failure that silently ruins
    ANN recall). Component sums are exact 1e4 fixed-point longs (the
    q_label_centroids discipline); one aggregate over a HOF fold, no
    shuffle beyond it."""
    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").head()[0])
    comp_sums = [
        F.sum(
            F.round(F.element_at("embedding", i + 1).cast("double") * 10000).cast(
                "long"
            )
        ).alias(f"__c{i}")
        for i in range(dim)
    ]
    sq = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    agg = emb.agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(davg(F.sqrt(sq)), 6).alias("avg_norm"),
        *comp_sums,
    )
    mean_norm_sq = None
    for i in range(dim):
        t = (F.col(f"__c{i}").cast("double") / 10000 / F.col("n_vecs")) * (
            F.col(f"__c{i}").cast("double") / 10000 / F.col("n_vecs")
        )
        mean_norm_sq = t if mean_norm_sq is None else mean_norm_sq + t
    norm_of_mean = F.round(F.sqrt(mean_norm_sq), 6)
    return agg.select(
        "n_vecs",
        "avg_norm",
        norm_of_mean.alias("norm_of_mean"),
        F.round(norm_of_mean / F.col("avg_norm"), 6).alias("anisotropy_ratio"),
    )


@q("q_exposure_fairness")
def q_exposure_fairness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exposure-based ranking fairness (Singh & Joachims, KDD 2018):
    over the BM25 top-20 lists for three queries, each language group's
    share of total exposure Σ 1/log2(rank+1) vs its share of retrieved
    results — a group whose exposure share lags its result share is
    systematically ranked low. Position weights are per-row shared-text
    expressions; sums are fixed point. List-sized compute on top of the
    already-oracled retrieval leg."""
    from fortune_500_financial_insights_pipeline_spark.operators.tfidf import bm25_search

    d = load_table(spark, sf_dir, "documents")
    qids = [0, 7, 42]
    queries = d.where(F.col("doc_id").isin(qids)).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("qtext")
    )
    hits = bm25_search(d, queries, k=20).select("query_id", "doc_id", "rank")
    w = F.round(1.0 / F.log2(F.col("rank").cast("double") + 1.0), 6)
    labeled = hits.join(d.select("doc_id", "lang"), "doc_id").select(
        "lang", w.alias("__w")
    )
    per = labeled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_results"),
        dsum("__w").alias("__exp"),
    )
    tot = per.agg(
        F.sum("n_results").alias("__nt"),
        dsum("__exp").alias("__et"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_results",
            F.round(F.col("__exp"), 6).alias("exposure"),
            F.round(
                F.col("n_results").cast("double") / F.col("__nt"), 6
            ).alias("result_share"),
            F.round(F.col("__exp") / F.col("__et"), 6).alias("exposure_share"),
        )
        .orderBy("lang")
    )


@q("q_dedup_threshold_curve")
def q_dedup_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup threshold-tuning curve: exact 3-gram Jaccard pairs at >= 0.3
    (ONE prefix-filtered set-similarity pass — the thresholds are then
    just filters over the pair list), bucketed into similarity bands
    with cumulative pairs-at-or-above — the how-aggressive-can-I-dedup
    readout that picks min_jaccard before q_jaccard_clusters runs.
    Bands are floor(jac·10)/10 on round-6 values, shared text."""
    from fortune_500_financial_insights_pipeline_spark.operators.setjoin import (
        jaccard_pairs_exact,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.text import word_ngrams

    d = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs_exact(
        d.select("doc_id", word_ngrams(F.col("text"), 3).alias("grams")),
        threshold=0.3,
        return_similarity=True,
    )
    band = F.least(F.lit(9), F.floor(F.col("jac") * 10).cast("int"))
    per = pairs.groupBy(band.alias("band")).agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
    wc = W.orderBy(F.desc("band")).rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        per.withColumn("cum_pairs_at_or_above", F.sum("n_pairs").over(wc).cast("long"))
        .select(
            (F.col("band").cast("double") / 10).alias("threshold"),
            "n_pairs",
            "cum_pairs_at_or_above",
        )
        .orderBy("threshold")
    )


@q("q_fk_orphans")
def q_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema: for each
    declared FK edge (lineitem→orders/part/supplier, orders→customer,
    customer→nation, nation→region), child rows whose key finds no
    parent — the orphan scan every warehouse load gate runs (the
    reference trusts BigQuery autodetect and would ship orphans
    silently). Six anti-join counts, one row per edge."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")

    def edge(name, child, ckey, parent, pkey):
        total = child.select(F.col(ckey).alias("__k"))
        orphans = total.join(
            parent.select(F.col(pkey).alias("__k")).distinct(), "__k", "left_anti"
        )
        t = total.agg(F.count(F.lit(1)).alias("n_child_rows"))
        oo = orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
        return (
            t.crossJoin(oo)
            .select(
                F.lit(name).alias("fk_edge"),
                "n_child_rows",
                "n_orphans",
                F.round(
                    F.col("n_orphans").cast("double") / F.col("n_child_rows"), 6
                ).alias("orphan_rate"),
            )
        )

    edges = [
        edge("lineitem->orders", li, "l_orderkey", o, "o_orderkey"),
        edge("lineitem->part", li, "l_partkey", p, "p_partkey"),
        edge("lineitem->supplier", li, "l_suppkey", s, "s_suppkey"),
        edge("orders->customer", o, "o_custkey", c, "c_custkey"),
        edge("customer->nation", c, "c_nationkey", n, "n_nationkey"),
        edge("nation->region", n, "n_regionkey", r, "r_regionkey"),
    ]
    out = edges[0]
    for e2 in edges[1:]:
        out = out.unionByName(e2)
    return out.orderBy("fk_edge")


@q("q_duplicate_payments")
def q_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment screen: orders sharing (customer, total, date) —
    the classic AP audit for double-posted invoices (exact dedup catches
    byte-identical rows; this catches re-keyed ones). One groupBy on the
    candidate key, groups of >= 2 reported with their order-id span."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            "o_custkey",
            F.round("o_totalprice", 2).alias("amount"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_orderkey").alias("first_orderkey"),
            F.max("o_orderkey").alias("last_orderkey"),
        )
        .where(F.col("n_orders") >= 2)
        .orderBy("o_custkey", "amount", "order_date")
    )


@q("q_seasonality_index")
def q_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-month seasonality index: each month's average daily
    revenue over the all-months average (index > 1 = seasonal high) —
    the retail planning number q_seasonal_decompose's weekly phase view
    doesn't give. Exact fixed-point interiors; 12-row output."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.col("l_shipdate").cast("date").alias("d")).agg(
        F.round(dsum("l_extendedprice"), 6).alias("__rev")
    )
    per_m = daily.groupBy(F.month("d").alias("month")).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(davg("__rev"), 6).alias("avg_daily_rev"),
    )
    overall = daily.agg(F.round(davg("__rev"), 6).alias("__o"))
    return (
        per_m.crossJoin(F.broadcast(overall))
        .select(
            "month",
            "n_days",
            "avg_daily_rev",
            F.round(F.col("avg_daily_rev") / F.col("__o"), 6).alias("index"),
        )
        .orderBy("month")
    )


@q("q_price_dispersion")
def q_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Procurement price-dispersion screen: per part, the spread of unit
    prices across suppliers (weighted mean vs minimum supplier mean) and
    the savings potential = (mean − min)·volume — the same-part-priced-
    differently opportunity list a sourcing team works top-down. Two
    stacked aggregates (part×supplier, then part), TakeOrdered top-20."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.round(dsum("l_quantity"), 6).alias("__q"),
        F.round(dsum("l_extendedprice"), 6).alias("__rev"),
    ).withColumn("__unit", F.round(F.col("__rev") / F.col("__q"), 6))
    per_part = ps.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.round(dsum("__q"), 6).alias("volume"),
        F.round(dsum("__rev"), 6).alias("__trev"),
        F.round(F.min("__unit"), 6).alias("min_unit_price"),
    )
    mean_unit = F.round(F.col("__trev") / F.col("volume"), 6)
    savings = F.round(
        (mean_unit - F.col("min_unit_price")) * F.col("volume"), 6
    )
    return (
        per_part.where(F.col("n_suppliers") >= 2)
        .select(
            "l_partkey",
            "n_suppliers",
            "volume",
            mean_unit.alias("mean_unit_price"),
            "min_unit_price",
            savings.alias("savings_potential"),
        )
        .orderBy(F.desc("savings_potential"), F.asc("l_partkey"))
        .limit(20)
    )


@q("q_image_dims")
def q_image_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-dimension extraction from PNG headers
    (operators/multimodal.png_dimensions): widths/heights parsed from
    the IHDR bytes of synthesized-but-REAL PNG-framed payloads (the
    fixture plants doc-id-derived dimensions in genuine big-endian
    header fields), then the orientation/megapixel profile an image
    -training pipeline reports before resize bucketing. Byte→hex→long
    arithmetic end to end — no decoder, no UDF."""
    from fortune_500_financial_insights_pipeline_spark.operators.multimodal import (
        png_dimensions,
    )

    d = load_table(spark, sf_dir, "documents")
    w = 100 + F.col("doc_id") % 400
    h = 100 + (F.col("doc_id") * 7) % 300
    whex = F.lpad(F.conv(w.cast("string"), 10, 16), 8, "0")
    hhex = F.lpad(F.conv(h.cast("string"), 10, 16), 8, "0")
    payload = F.unhex(
        F.concat(
            F.lit("89504E470D0A1A0A"),  # PNG signature
            F.lit("0000000D"),  # IHDR length
            F.lit("49484452"),  # 'IHDR'
            whex,
            hhex,
            F.lit("0806000000"),  # bit depth / color / compression ...
        )
    )
    pw, ph = png_dimensions(payload)
    orient = (
        F.when(pw > ph, "landscape").when(pw < ph, "portrait").otherwise("square")
    )
    mp = F.round(pw.cast("double") * ph.cast("double") / 1000000, 6)
    return (
        d.select(orient.alias("orientation"), pw.alias("__w"), ph.alias("__h"), mp.alias("__mp"))
        .groupBy("orientation")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.round(davg(F.col("__w").cast("double")), 6).alias("avg_width"),
            F.round(davg(F.col("__h").cast("double")), 6).alias("avg_height"),
            F.round(davg("__mp"), 6).alias("avg_megapixels"),
        )
        .orderBy("orientation")
    )


@q("q_audio_meta")
def q_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio metadata extraction from WAV headers (operators/multimodal
    .wav_meta): sample rate, channel count and exact duration
    (data bytes / byte rate) parsed from little-endian RIFF fields of
    synthesized-but-REAL canonical headers — then the per-sample-rate
    hours/duration profile a speech-data pipeline reports before
    resampling. Byte→hex→long arithmetic, no decoder, no UDF."""
    from fortune_500_financial_insights_pipeline_spark.operators.multimodal import wav_meta

    d = load_table(spark, sf_dir, "documents")
    sr = (
        F.when(F.col("doc_id") % 4 == 0, 8000)
        .when(F.col("doc_id") % 4 == 1, 16000)
        .when(F.col("doc_id") % 4 == 2, 44100)
        .otherwise(48000)
    )
    ch = (1 + F.col("doc_id") % 2).cast("int")
    secs = 1 + F.col("doc_id") % 30
    data_bytes = (sr * 2 * ch * secs).cast("long")

    def le32(col):
        h = F.lpad(F.conv(col.cast("string"), 10, 16), 8, "0")
        return F.concat(
            F.substring(h, 7, 2), F.substring(h, 5, 2),
            F.substring(h, 3, 2), F.substring(h, 1, 2),
        )

    def le16(col):
        h = F.lpad(F.conv(col.cast("string"), 10, 16), 4, "0")
        return F.concat(F.substring(h, 3, 2), F.substring(h, 1, 2))

    payload = F.unhex(
        F.concat(
            F.lit("52494646"), le32(data_bytes + 36), F.lit("57415645"),
            F.lit("666D7420"), F.lit("10000000"), F.lit("0100"),
            le16(ch), le32(sr), le32(sr * 2 * ch), le16(ch * 2),
            F.lit("1000"), F.lit("64617461"), le32(data_bytes),
        )
    )
    prate, pch, pbytes = wav_meta(payload)
    dur = F.round(
        pbytes.cast("double") / (prate * 2 * pch).cast("double"), 6
    )
    return (
        d.select(prate.alias("sample_rate"), pch.alias("__ch"), dur.alias("__s"))
        .groupBy("sample_rate")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.round(dsum("__s") / 3600, 6).alias("total_hours"),
            F.round(F.percentile("__s", F.lit(0.5)), 6).alias("p50_seconds"),
            F.round(
                F.sum(F.when(F.col("__ch") == 2, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("stereo_share"),
        )
        .orderBy("sample_rate")
    )


@q("q_video_meta")
def q_video_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video metadata from MP4 ftyp/mvhd boxes (operators/multimodal
    .mp4_meta): major brand plus big-endian timescale/duration parsed
    from canonical synthesized headers — per-brand clip counts, total
    hours and p50 clip seconds, the video-corpus profile before
    frame-sampling budgets are set. Completes the byte-level
    image/audio/video metadata triad; no demuxer, no UDF."""
    from fortune_500_financial_insights_pipeline_spark.operators.multimodal import mp4_meta

    d = load_table(spark, sf_dir, "documents")
    brand_hex = (
        F.when(F.col("doc_id") % 3 == 0, "69736F6D")
        .when(F.col("doc_id") % 3 == 1, "6D703432")
        .otherwise("71742020")
    )
    timescale = F.lit(600)
    ticks = (600 * (5 + F.col("doc_id") % 120)).cast("long")  # 5..124 s clips

    def be32(col):
        return F.lpad(F.conv(col.cast("string"), 10, 16), 8, "0")

    payload = F.unhex(
        F.concat(
            F.lit("00000010"), F.lit("66747970"), brand_hex, F.lit("00000000"),
            F.lit("00000074"), F.lit("6D6F6F76"),
            F.lit("0000006C"), F.lit("6D766864"),
            F.lit("00000000"),  # version/flags
            F.lit("00000000"), F.lit("00000000"),  # ctime/mtime
            be32(timescale), be32(ticks),
        )
    )
    brand, ts, dur = mp4_meta(payload)
    secs = F.round(dur.cast("double") / ts.cast("double"), 6)
    return (
        d.select(brand.alias("brand"), secs.alias("__s"))
        .groupBy("brand")
        .agg(
            F.count(F.lit(1)).alias("n_clips"),
            F.round(dsum("__s") / 3600, 6).alias("total_hours"),
            F.round(F.percentile("__s", F.lit(0.5)), 6).alias("p50_seconds"),
        )
        .orderBy("brand")
    )


@q("q_script_mismatch")
def q_script_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-label vs script QA: per language tag, the ASCII character
    share and how many docs are pure-ASCII — a 'zh' corpus that is 100%
    ASCII is mislabeled (the label-vs-content check q_langid_confusion
    runs against the classifier; this runs against the raw script).
    Non-ASCII counting is one portable regexp_replace length diff."""
    d = load_table(spark, sf_dir, "documents")
    n_chars = F.length("text").cast("double")
    n_non_ascii = F.length(
        F.regexp_replace(F.col("text"), r"[\x00-\x7F]", "")
    ).cast("double")
    ascii_share = F.round((n_chars - n_non_ascii) / n_chars, 6)
    return (
        d.select("lang", ascii_share.alias("__a"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(davg("__a"), 6).alias("avg_ascii_share"),
            F.sum(F.when(F.col("__a") >= 0.999999, 1).otherwise(0))
            .cast("long")
            .alias("n_pure_ascii"),
        )
        .orderBy("lang")
    )


@q("q_below_list_price")
def q_below_list_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing-leakage analysis: per brand, the share of lines whose
    effective unit price (extendedprice·(1−discount)/quantity) falls
    below the part's list price, and the revenue leakage
    Σ (list − unit)·qty over those lines — the discount-discipline
    readout revenue management works from. One broadcast-joinable part
    dim, exact fixed-point leakage sums."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", F.col("p_retailprice").alias("__list")
    )
    # FLOOR-based micro-unit fixed point (the q_window_pct lesson): the
    # raw unit price lands exactly on .5 micro-unit midpoints for many
    # rows, where Spark's decimal HALF_UP and DuckDB's binary rounding
    # disagree — floor(x·1e6 + 0.5) is pure IEEE arithmetic and therefore
    # bit-identical on both engines
    unit6 = F.floor(
        F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        / F.col("l_quantity")
        * 1000000
        + 0.5
    ).cast("long")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "p_brand",
        unit6.alias("__u6"),
        F.floor(F.col("__list") * 1000000 + 0.5).cast("long").alias("__l6"),
        F.col("l_quantity").alias("__q"),
    )
    below = F.col("__u6") < F.col("__l6")
    leak_u = F.when(
        below, (F.col("__l6") - F.col("__u6")) * F.col("__q").cast("long")
    ).otherwise(F.lit(0).cast("long"))
    return (
        j.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(below.cast("int")).cast("long").alias("n_below_list"),
            F.round(
                F.sum(below.cast("int")).cast("double") / F.count(F.lit(1)), 6
            ).alias("below_list_rate"),
            F.round(F.sum(leak_u).cast("double") / 1000000, 6).alias(
                "revenue_leakage"
            ),
        )
        .orderBy("p_brand")
    )


@q("q_lsh_s_curve")
def q_lsh_s_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH banding S-curve, measured: per true-Jaccard band (exact
    pairs ≥ 0.3 from the set-similarity join), the observed capture rate
    of 16-hash/4-band MinHash banding next to the theoretical
    1 − (1 − j^r)^b at the band midpoint (embedded as shared literals) —
    the gauge that closes the loop on q_lsh_precision/q_lsh_recall: if
    observed tracks theory, the hash family is behaving; if not, the
    banding is broken, not the corpus."""
    from fortune_500_financial_insights_pipeline_spark.operators.minhash import (
        minhash_neardup_pairs_portable,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.setjoin import (
        jaccard_pairs_exact,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.text import word_ngrams

    d = load_table(spark, sf_dir, "documents")
    truth = jaccard_pairs_exact(
        d.select("doc_id", word_ngrams(F.col("text"), 3).alias("grams")),
        threshold=0.3,
        return_similarity=True,
    )
    cand = minhash_neardup_pairs_portable(
        d, id_col="doc_id", text_col="text", n_hashes=16, bands=4, min_jaccard=0.0
    ).select("id_a", "id_b", F.lit(1).alias("__hit"))
    j = truth.join(cand, ["id_a", "id_b"], "left")
    band = F.least(F.lit(9), F.floor(F.col("jac") * 10).cast("int"))
    # theoretical capture 1-(1-j^4)^4 at band midpoints, Python-computed
    theo = [
        round(1 - (1 - ((b + 0.5) / 10) ** 4) ** 4, 6) for b in range(10)
    ]
    tarr = F.array(*[F.lit(t) for t in theo])
    per = (
        j.groupBy(band.alias("band"))
        .agg(
            F.count(F.lit(1)).alias("n_true"),
            F.sum(F.coalesce("__hit", F.lit(0))).cast("long").alias("n_caught"),
        )
    )
    return per.select(
        (F.col("band").cast("double") / 10).alias("jac_band"),
        "n_true",
        "n_caught",
        F.round(F.col("n_caught").cast("double") / F.col("n_true"), 6).alias(
            "observed_rate"
        ),
        F.element_at(tarr, F.col("band") + 1).alias("theoretical_rate"),
    ).orderBy("jac_band")


@q("q_window_distinct")
def q_window_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding distinct count — the window aggregate Spark has no native
    form for (COUNT(DISTINCT) OVER is unsupported): per supplier, the
    distinct parts shipped in the trailing 20 rows, via
    size(array_distinct(collect_list)) over the bounded frame. Correct
    exactly BECAUSE the frame is bounded (20 values per row — never a
    whole-partition array); the unbounded form belongs to KMV. Reported
    at each supplier's last 5 rows to keep output stable."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_suppkey") <= 10)
    w = W.partitionBy("l_suppkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    wf = w.rowsBetween(-19, 0)
    ranked = (
        li.select("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber", "l_partkey")
        .withColumn(
            "distinct_parts_20",
            F.size(F.array_distinct(F.collect_list("l_partkey").over(wf))),
        )
        .withColumn("__rn", F.row_number().over(w))
        .withColumn("__mx", F.max("__rn").over(W.partitionBy("l_suppkey")))
    )
    return (
        ranked.where(F.col("__rn") > F.col("__mx") - 5)
        .select(
            "l_suppkey",
            F.col("__rn").cast("long").alias("seq"),
            F.col("distinct_parts_20").cast("long").alias("distinct_parts_20"),
        )
        .orderBy("l_suppkey", "seq")
    )


@q("q_grouping_id")
def q_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING_ID level labels: the subtotal-level
    discriminator that lets one result frame serve detail rows,
    per-region subtotals and the grand total without NULL ambiguity
    (a NULL group key from data vs from rollup are different things —
    grouping_id tells them apart). Completes the A4 grouping-sets
    surface."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.grouping_id().cast("long").alias("level_id"),
        )
        .orderBy("level_id", "r_name", "n_name")
    )


@q("q_collocations")
def q_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by pointwise mutual information: bigrams with
    PMI = log2(p(ab) / (p(a)·p(b))) over corpus counts (min bigram count
    5 — PMI's rare-pair pathology cut), top-20 — the multiword-
    expression detector a tokenizer-merge or phrase-index build starts
    from. Exact count ratios into one shared-text log2; vocabulary-sized
    frames after the gram count."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.split("text", " ").alias("__tk"))
    uni = (
        toks.select(F.explode("__tk").alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("uf"))
    )
    n_uni = uni.agg(F.sum("uf").alias("__nu"))
    from fortune_500_financial_insights_pipeline_spark.operators.text import word_ngrams_all

    bi = (
        d.select(F.explode(word_ngrams_all(F.col("text"), 2)).alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("bf"))
        .where(F.col("bf") >= 5)
    )
    n_bi = bi.agg(F.sum("bf").alias("__nb"))
    w1 = F.element_at(F.split("g", " "), 1)
    w2 = F.element_at(F.split("g", " "), 2)
    ua = uni.select(F.col("w").alias("__w1"), F.col("uf").alias("__f1"))
    ub = uni.select(F.col("w").alias("__w2"), F.col("uf").alias("__f2"))
    scored = (
        bi.withColumn("__w1", w1)
        .withColumn("__w2", w2)
        .join(ua, "__w1")
        .join(ub, "__w2")
        .crossJoin(F.broadcast(n_bi))
        .crossJoin(F.broadcast(n_uni))
        .select(
            F.col("g").alias("bigram"),
            F.col("bf").alias("n_pair"),
            F.round(
                F.log2(
                    (F.col("bf").cast("double") / F.col("__nb"))
                    / (
                        (F.col("__f1").cast("double") / F.col("__nu"))
                        * (F.col("__f2").cast("double") / F.col("__nu"))
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), F.asc("bigram")).limit(20)


@q("q_overdispersion")
def q_overdispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overdispersion check behind q_control_chart: the Fano factor
    (variance/mean of daily counts) per event type — Poisson traffic has
    Fano ≈ 1, bursty arrivals >> 1, and c-chart limits are only valid
    in the first regime. Exact integer daily counts, population variance
    from exact moments."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n").alias("__s"),
        F.sum(F.col("n") * F.col("n")).alias("__ss"),
    )
    nn = F.col("n_days").cast("double")
    mean = F.col("__s").cast("double") / nn
    var = F.col("__ss").cast("double") / nn - mean * mean
    fano = var / mean
    return m.select(
        "event_type",
        "n_days",
        F.round(mean, 6).alias("mean_daily"),
        F.round(var, 6).alias("var_daily"),
        F.round(fano, 6).alias("fano"),
        (fano > 1.5).cast("int").alias("overdispersed"),
    ).orderBy("event_type")


@q("q_dp_release")
def q_dp_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism DP release of per-nation customer counts
    (ε = 1, sensitivity 1): noise = −b·sign(u−½)·ln(1−2|u−½|) via the
    inverse CDF over an md5-derived uniform — the release MECHANISM as
    a relational program. The md5 seed makes the draw reproducible so
    the oracle can check the arithmetic end to end; a production release
    swaps in a real RNG (a seeded release is NOT private — this is the
    mechanism testbed, exactly like multimodal's stubbed decode). Also
    reports the true count so tests can pin the noise-scale contract."""
    c = load_table(spark, sf_dir, "customer")
    per = c.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("true_count"))
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("dp|"), F.col("c_nationkey").cast("string"))), 1, 15),
            16,
            10,
        ).cast("double")
        / F.lit(float(1 << 60))
    )
    b = F.lit(1.0)  # sensitivity / epsilon
    centered = u - 0.5
    noise = -b * F.signum(centered) * F.log(1.0 - 2.0 * F.abs(centered))
    return per.select(
        "c_nationkey",
        "true_count",
        F.round(noise, 6).alias("noise"),
        F.round(F.col("true_count") + F.round(noise, 6), 6).alias("released_count"),
    ).orderBy("c_nationkey")


@q("q_decision_stump")
def q_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A decision stump trained relationally: candidate thresholds = the
    exact deciles of order value, split quality = Gini impurity
    reduction against the is-urgent label, winner by gain — the
    one-node tree that seeds boosting and, more importantly here, shows
    model TRAINING as one conditional aggregate + an argmax (no driver
    loop: all 9 candidate splits are evaluated in a single pass over a
    broadcast threshold relation)."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("__x"),
        (F.col("o_orderpriority") == "1-URGENT").cast("int").alias("__y"),
    )
    thr = (
        o.agg(
            F.percentile("__x", F.array(*[F.lit(i / 10) for i in range(1, 10)])).alias(
                "__t"
            )
        )
        .select(F.explode("__t").alias("threshold"))
        .select(F.round("threshold", 6).alias("threshold"))
    )
    j = o.crossJoin(F.broadcast(thr))
    per = j.groupBy("threshold").agg(
        F.sum(F.when(F.col("__x") <= F.col("threshold"), 1).otherwise(0))
        .cast("long")
        .alias("n_l"),
        F.sum(F.when((F.col("__x") <= F.col("threshold")) & (F.col("__y") == 1), 1).otherwise(0))
        .cast("long")
        .alias("p_l"),
        F.sum(F.when(F.col("__x") > F.col("threshold"), 1).otherwise(0))
        .cast("long")
        .alias("n_r"),
        F.sum(F.when((F.col("__x") > F.col("threshold")) & (F.col("__y") == 1), 1).otherwise(0))
        .cast("long")
        .alias("p_r"),
    )
    n = (F.col("n_l") + F.col("n_r")).cast("double")
    p = (F.col("p_l") + F.col("p_r")).cast("double") / n
    gini_parent = 1.0 - p * p - (1.0 - p) * (1.0 - p)
    pl = F.col("p_l").cast("double") / F.col("n_l")
    pr = F.col("p_r").cast("double") / F.col("n_r")
    gini_l = 1.0 - pl * pl - (1.0 - pl) * (1.0 - pl)
    gini_r = 1.0 - pr * pr - (1.0 - pr) * (1.0 - pr)
    gain = gini_parent - (
        F.col("n_l").cast("double") / n * gini_l
        + F.col("n_r").cast("double") / n * gini_r
    )
    return (
        per.where((F.col("n_l") > 0) & (F.col("n_r") > 0))
        .select(
            "threshold",
            "n_l",
            "n_r",
            F.round(gini_parent, 6).alias("gini_parent"),
            F.round(gain, 9).alias("gini_gain"),
        )
        .orderBy(F.desc("gini_gain"), F.asc("threshold"))
        .limit(1)
    )


@q("q_naive_bayes")
def q_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes trained AND scored relationally: fit
    Laplace-smoothed per-language term log-likelihoods on even doc ids,
    classify the odd ids, return the confusion matrix — the full ML
    train/predict loop as joins and aggregates (q_decision_stump trains
    one split; this trains a real classifier). Log terms are round-9
    per-row; per-(doc, lang) scores fold as EXACT LONG sums (1e9 fixed
    point), so the argmax — and therefore every prediction — is integer
    arithmetic the oracle replays bit for bit. Unseen terms hit the
    smoothed floor via a left join + per-language coalesce."""
    d = load_table(spark, sf_dir, "documents")
    train = d.where(F.col("doc_id") % 2 == 0)
    test = d.where(F.col("doc_id") % 2 == 1)
    ttok = train.select(
        "lang", F.explode(F.split("text", " ")).alias("term")
    ).where(F.col("term") != "")
    cnt = ttok.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("__c"))
    tot = cnt.groupBy("lang").agg(F.sum("__c").alias("__tot"))
    vocab = ttok.select("term").distinct().agg(F.count(F.lit(1)).alias("__v"))
    prior = (
        train.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("__nd"))
        .crossJoin(F.broadcast(train.agg(F.count(F.lit(1)).alias("__n"))))
        .select(
            "lang",
            F.round(
                F.log(F.col("__nd").cast("double") / F.col("__n")) * 1e9
            ).cast("long").alias("__logprior"),
        )
    )
    lstats = (
        tot.crossJoin(F.broadcast(vocab))
        .select(
            "lang",
            "__tot",
            "__v",
            F.round(
                F.log(1.0 / (F.col("__tot") + F.col("__v")).cast("double")) * 1e9
            ).cast("long").alias("__floor"),
        )
        .localCheckpoint(eager=False)
    )
    ll = (
        cnt.join(lstats, "lang")
        .select(
            "lang",
            "term",
            F.round(
                F.log(
                    (F.col("__c") + 1).cast("double")
                    / (F.col("__tot") + F.col("__v")).cast("double")
                )
                * 1e9
            ).cast("long").alias("__ll"),
        )
        .localCheckpoint(eager=False)
    )
    ttest = test.select(
        "doc_id",
        F.col("lang").alias("true_lang"),
        F.explode(F.split("text", " ")).alias("term"),
    ).where(F.col("term") != "")
    cand = ttest.crossJoin(
        F.broadcast(lstats.select(F.col("lang").alias("__cl"), "__floor"))
    )
    scored = (
        cand.join(
            ll.select(F.col("lang").alias("__cl"), "term", "__ll"),
            ["__cl", "term"],
            "left",
        )
        .groupBy("doc_id", "true_lang", "__cl")
        .agg(F.sum(F.coalesce("__ll", F.col("__floor"))).alias("__s"))
        .join(prior.select(F.col("lang").alias("__cl"), "__logprior"), "__cl")
        .withColumn("__score", F.col("__s") + F.col("__logprior"))
    )
    wd = W.partitionBy("doc_id").orderBy(F.desc("__score"), F.asc("__cl"))
    pred = (
        scored.withColumn("__rn", F.row_number().over(wd))
        .where(F.col("__rn") == 1)
        .select("true_lang", F.col("__cl").alias("pred_lang"))
    )
    return (
        pred.groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("true_lang", "pred_lang")
    )


@q("q_logreg_gd")
def q_logreg_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic regression trained by 8 unrolled gradient-descent steps —
    the third rung of the relational-ML ladder (stump → Naive Bayes →
    an ITERATIVE trained model): weights live in a one-row broadcast
    relation at 1e9 fixed point, each step is one scan computing
    σ(w·x) per row and folding the gradient in exact fixed point, so
    the whole training trajectory is integer-reproducible and the
    oracle replays it as unrolled CTE stages (the kmeans/markov/ALS
    discipline). Features: bias + scaled order value; label: is-urgent.
    Output: final weights + training log-loss and accuracy."""
    o = load_table(spark, sf_dir, "orders").select(
        (F.col("o_totalprice") / 100000).alias("__x"),
        (F.col("o_orderpriority") == "1-URGENT").cast("int").alias("__y"),
    ).localCheckpoint(eager=False)
    S = 1_000_000_000
    w = spark.createDataFrame([(0, 0)], "w0 long, w1 long")
    eta = 1.0
    for _ in range(8):
        j = o.crossJoin(F.broadcast(w))
        z = (
            F.col("w0").cast("double") / S
            + F.col("w1").cast("double") / S * F.col("__x")
        )
        p = 1.0 / (1.0 + F.exp(-z))
        g0 = F.round((F.col("__y") - p) * S).cast("long")
        g1 = F.round((F.col("__y") - p) * F.col("__x") * S).cast("long")
        grad = j.agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(g0).alias("__g0"),
            F.sum(g1).alias("__g1"),
            F.max("w0").alias("w0"),
            F.max("w1").alias("w1"),
        )
        w = grad.select(
            (F.col("w0") + F.round(F.lit(eta) * F.col("__g0") / F.col("__n")).cast("long")).alias("w0"),
            (F.col("w1") + F.round(F.lit(eta) * F.col("__g1") / F.col("__n")).cast("long")).alias("w1"),
        ).localCheckpoint(eager=False)
    j = o.crossJoin(F.broadcast(w))
    z = (
        F.col("w0").cast("double") / S
        + F.col("w1").cast("double") / S * F.col("__x")
    )
    p = 1.0 / (1.0 + F.exp(-z))
    ll_term = F.round(
        (
            F.col("__y") * F.log(p) + (1 - F.col("__y")) * F.log(1.0 - p)
        )
        * 1000000
    ).cast("long")
    correct = ((p >= 0.5).cast("int") == F.col("__y")).cast("int")
    return j.agg(
        F.round(F.max("w0").cast("double") / S, 6).alias("w0"),
        F.round(F.max("w1").cast("double") / S, 6).alias("w1"),
        F.round(
            -(F.sum(ll_term).cast("double") / 1000000) / F.count(F.lit(1)), 6
        ).alias("log_loss"),
        F.round(F.sum(correct).cast("double") / F.count(F.lit(1)), 6).alias(
            "accuracy"
        ),
    )


@q("q_knn_classifier")
def q_knn_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classification (k=5 cosine neighbors, majority vote with
    count-desc/label-asc tie-break) for the first 50 vectors against the
    rest of the corpus — the non-parametric rung of the relational-ML
    ladder, composed from the oracle-exact knn_join. Votes, the argmax
    and the confusion matrix are all integer arithmetic."""
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import knn_join

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    queries = emb.where(F.col("vec_id") < 50)
    corpus = emb.where(F.col("vec_id") >= 50)
    nn = knn_join(queries, corpus, k=5).select("q_id", "label")
    votes = nn.groupBy("q_id", F.col("label").alias("pred_label")).agg(
        F.count(F.lit(1)).alias("__v")
    )
    wv = W.partitionBy("q_id").orderBy(F.desc("__v"), F.asc("pred_label"))
    pred = (
        votes.withColumn("__rn", F.row_number().over(wv))
        .where(F.col("__rn") == 1)
        .select("q_id", "pred_label")
    )
    truth = queries.select(F.col("vec_id").alias("q_id"), F.col("label").alias("true_label"))
    return (
        truth.join(pred, "q_id")
        .groupBy("true_label", "pred_label")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
        .orderBy("true_label", "pred_label")
    )


@q("q_silhouette")
def q_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified silhouette per cluster (centroid form: a = distance to
    own centroid, b = distance to the nearest OTHER centroid,
    s = (b−a)/max(a,b)) over the trained 8-cell quantizer — the
    clustering-quality number that says whether q_kmeans' cells are
    real structure or arbitrary bins, at O(n·k) instead of the full
    silhouette's O(n²). Distances are round-6 cosine-space (1−cos);
    per-cluster means fold fixed point."""
    from fortune_500_financial_insights_pipeline_spark.operators.kmeans import kmeans_centroids
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import (
        probe_cells_col,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    centroids = _memo_trained(
        ("kmeans8x2", sf_dir), lambda: kmeans_centroids(emb, k=8, n_iter=2)
    )
    # two nearest cells per vector, via the same portable round-6 routing
    probes = emb.select(
        "vec_id",
        probe_cells_col("embedding", centroids, 2).alias("__cells"),
        *[
            F.round(
                1.0
                - F.aggregate(
                    F.zip_with(
                        "embedding",
                        F.array(*[F.lit(float(x)) for x in c]),
                        lambda a, b: a.cast("double") * b,
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                / (
                    F.sqrt(
                        F.aggregate(
                            F.zip_with(
                                "embedding",
                                F.col("embedding"),
                                lambda a, b: a.cast("double") * b.cast("double"),
                            ),
                            F.lit(0.0),
                            lambda acc, v: acc + v,
                        )
                    )
                    * F.lit(__import__("math").sqrt(sum(x * x for x in c)))
                ),
                6,
            ).alias(f"__d{i}")
            for i, c in enumerate(centroids)
        ],
    )
    darr = F.array(*[F.col(f"__d{i}") for i in range(len(centroids))])
    own = F.element_at("__cells", 1)
    other = F.element_at("__cells", 2)
    a = F.element_at(darr, own + 1)
    b = F.element_at(darr, other + 1)
    s = F.round((b - a) / F.greatest(a, b), 6)
    per = probes.select(own.alias("cluster"), s.alias("__s"))
    return (
        per.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(davg("__s"), 6).alias("avg_silhouette"),
        )
        .select(F.col("cluster").cast("long").alias("cluster"), "n_vecs", "avg_silhouette")
        .orderBy("cluster")
    )


@q("q_bytes_per_token")
def q_bytes_per_token(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bytes-per-token by language: UTF-8 octet length over whitespace
    and BPE-ish token counts — the compression/budget planning number
    (CJK text costs ~3 bytes per character; a token budget priced in
    bytes misallocates across scripts). One scan, per-lang exact
    ratios."""
    from fortune_500_financial_insights_pipeline_spark.operators.text import BPE_PATTERN

    d = load_table(spark, sf_dir, "documents")
    nb = F.octet_length("text").cast("double")
    nt = F.size(F.split(F.col("text"), " ")).cast("double")
    nbpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), 0)).cast(
        "double"
    )
    return (
        d.select("lang", nb.alias("__b"), nt.alias("__t"), nbpe.alias("__p"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(dsum("__b") / dsum("__t"), 6).alias("bytes_per_ws_token"),
            F.round(dsum("__b") / dsum("__p"), 6).alias("bytes_per_bpe_token"),
        )
        .orderBy("lang")
    )


@q("q_vocab_overlap_langs")
def q_vocab_overlap_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-language vocabulary overlap: Jaccard of distinct term sets
    for every language pair — high overlap between supposedly different
    languages flags code-switching or mislabeled slices (the vocabulary
    view of q_script_mismatch). Pairs meet through a term-keyed join of
    (lang, term) sets — vocabulary-sized, never doc×doc."""
    d = load_table(spark, sf_dir, "documents")
    lt = (
        d.select("lang", F.explode(F.array_distinct(F.split("text", " "))).alias("t"))
        .where(F.col("t") != "")
        .distinct()
    )
    sizes = lt.groupBy("lang").agg(F.count(F.lit(1)).alias("__n"))
    a = lt.select(F.col("lang").alias("lang_a"), "t")
    b = lt.select(F.col("lang").alias("lang_b"), "t")
    inter = (
        a.join(b, "t")
        .where(F.col("lang_a") < F.col("lang_b"))
        .groupBy("lang_a", "lang_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("lang").alias("lang_a"), F.col("__n").alias("__na"))
    sb = sizes.select(F.col("lang").alias("lang_b"), F.col("__n").alias("__nb"))
    return (
        inter.join(sa, "lang_a")
        .join(sb, "lang_b")
        .select(
            "lang_a",
            "lang_b",
            "n_shared",
            F.round(
                F.col("n_shared").cast("double")
                / (F.col("__na") + F.col("__nb") - F.col("n_shared")),
                6,
            ).alias("vocab_jaccard"),
        )
        .orderBy("lang_a", "lang_b")
    )


@q("q_topk_stability")
def q_topk_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jackknife stability of the top-20 parts-by-revenue ranking: orders
    are split into 10 md5 folds, the ranking is recomputed leaving each
    fold out (all 10 variants from ONE per-(part, fold) aggregate — no
    re-scan per variant), and each full-data top-20 part reports how
    many leave-one-fold-out variants still rank it top-20 — the
    is-this-leaderboard-real check before anyone acts on it. Fold
    revenue at exact fixed point; 10 rank windows over part-count
    frames."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    fold = F.conv(
        F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 2), 16, 10
    ).cast("int") % 10
    pf = (
        li.groupBy("l_partkey", fold.alias("__f"))
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1000000
                ).cast("long")
            ).alias("__rev_u")
        )
        .localCheckpoint(eager=False)
    )
    tot = pf.groupBy("l_partkey").agg(F.sum("__rev_u").alias("__tot_u"))
    folds = spark.range(10).select(F.col("id").cast("int").alias("__lo"))
    variants = (
        tot.crossJoin(F.broadcast(folds))
        .join(
            pf.select("l_partkey", F.col("__f").alias("__lo"), "__rev_u"),
            ["l_partkey", "__lo"],
            "left",
        )
        .select(
            "l_partkey",
            "__lo",
            (F.col("__tot_u") - F.coalesce("__rev_u", F.lit(0))).alias("__lo_rev"),
        )
    )
    wv = W.partitionBy("__lo").orderBy(F.desc("__lo_rev"), F.asc("l_partkey"))
    in_top = (
        variants.withColumn("__rn", F.row_number().over(wv))
        .where(F.col("__rn") <= 20)
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_variants_top20"))
    )
    wf = W.orderBy(F.desc("__tot_u"), F.asc("l_partkey"))
    full_top = (
        tot.withColumn("__rn", F.row_number().over(wf))
        .where(F.col("__rn") <= 20)
        .select(
            "l_partkey",
            F.col("__rn").cast("int").alias("full_rank"),
            F.round(F.col("__tot_u").cast("double") / 1000000, 6).alias("revenue"),
        )
    )
    return (
        full_top.join(in_top, "l_partkey", "left")
        .select(
            "l_partkey",
            "full_rank",
            "revenue",
            F.coalesce("n_variants_top20", F.lit(0)).cast("long").alias(
                "n_variants_top20"
            ),
            F.round(
                F.coalesce("n_variants_top20", F.lit(0)).cast("double") / 10, 6
            ).alias("stability"),
        )
        .orderBy("full_rank")
    )


@q("q_runs_test")
def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test on the sign sequence of daily market
    returns: observed sign runs vs the 2·n⁺·n⁻/n + 1 expectation and
    its closed-form variance — the randomness check that catches
    autocorrelated (momentum/mean-reverting) series before anyone
    trusts an i.i.d. assumption. One lag window for signs + runs, exact
    integer counts, shared-text z expression."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("day")
    ).agg(F.round(davg("l_extendedprice"), 6).alias("close"))
    wd = W.orderBy("day")
    rets = (
        daily.withColumn(
            "__r", F.round(F.col("close") / F.lag("close").over(wd) - 1, 6)
        )
        .where(F.col("__r").isNotNull() & (F.col("__r") != 0))
        .withColumn("__s", (F.col("__r") > 0).cast("int"))
    )
    runs = rets.withColumn(
        "__new_run",
        (F.lag("__s").over(wd).isNull() | (F.lag("__s").over(wd) != F.col("__s")))
        .cast("int"),
    )
    agg = runs.agg(
        F.sum("__s").cast("long").alias("n_pos"),
        F.sum(1 - F.col("__s")).cast("long").alias("n_neg"),
        F.sum("__new_run").cast("long").alias("n_runs"),
    )
    np_, nn, n = (
        F.col("n_pos").cast("double"),
        F.col("n_neg").cast("double"),
        (F.col("n_pos") + F.col("n_neg")).cast("double"),
    )
    mu = 2.0 * np_ * nn / n + 1.0
    var = (mu - 1.0) * (mu - 2.0) / (n - 1.0)
    z = (F.col("n_runs").cast("double") - mu) / F.sqrt(var)
    return agg.select(
        "n_pos",
        "n_neg",
        "n_runs",
        F.round(mu, 6).alias("expected_runs"),
        F.round(z, 6).alias("z_score"),
    )


@q("q_amihud")
def q_amihud(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Amihud illiquidity (2002): mean |daily return| per unit of daily
    volume, scaled 1e6, per supplier — the price-impact-per-volume
    measure behind liquidity screens, from the same daily frame the
    other indicators share. Exact fixed-point folds; top-10 most
    illiquid."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_suppkey") <= 20)
    daily = li.groupBy(
        "l_suppkey", F.date_format("l_shipdate", "yyyy-MM-dd").alias("day")
    ).agg(
        F.round(davg("l_extendedprice"), 6).alias("close"),
        F.round(dsum("l_quantity"), 6).alias("vol"),
    )
    wd = W.partitionBy("l_suppkey").orderBy("day")
    rets = (
        daily.withColumn(
            "__r", F.round(F.col("close") / F.lag("close").over(wd) - 1, 6)
        )
        .where(F.col("__r").isNotNull() & (F.col("vol") > 0))
        .withColumn("__illiq", F.round(F.abs("__r") / F.col("vol") * 1000000, 6))
    )
    return (
        rets.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(davg("__illiq"), 6).alias("amihud_illiq"),
        )
        .orderBy(F.desc("amihud_illiq"), F.asc("l_suppkey"))
        .limit(10)
    )


@q("q_cohens_d")
def q_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d effect size per event type for the user-parity split —
    the practical-significance number next to q_ab_test's t statistic
    (a tiny d can be 'significant' at scale and still not matter):
    (mean_a − mean_b) / pooled SD from the same exact fixed-point
    moments, with the conventional small/medium/large band label."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.withColumn("grp", (F.col("user_id") % 2).cast("int"))
    agg = g.groupBy("event_type").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).cast("double").alias("na"),
        dsum(F.when(F.col("grp") == 0, F.col("value")).otherwise(0.0)).alias("sa"),
        dsum(
            F.when(F.col("grp") == 0, F.col("value") * F.col("value")).otherwise(0.0)
        ).alias("ssa"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).cast("double").alias("nb"),
        dsum(F.when(F.col("grp") == 1, F.col("value")).otherwise(0.0)).alias("sb"),
        dsum(
            F.when(F.col("grp") == 1, F.col("value") * F.col("value")).otherwise(0.0)
        ).alias("ssb"),
    )
    ma = F.col("sa") / F.col("na")
    mb = F.col("sb") / F.col("nb")
    va = (F.col("ssa") - F.col("sa") * F.col("sa") / F.col("na")) / (F.col("na") - 1)
    vb = (F.col("ssb") - F.col("sb") * F.col("sb") / F.col("nb")) / (F.col("nb") - 1)
    pooled = F.sqrt(
        ((F.col("na") - 1) * va + (F.col("nb") - 1) * vb)
        / (F.col("na") + F.col("nb") - 2)
    )
    d = (ma - mb) / pooled
    band = (
        F.when(F.abs(d) < 0.2, "negligible")
        .when(F.abs(d) < 0.5, "small")
        .when(F.abs(d) < 0.8, "medium")
        .otherwise("large")
    )
    return agg.select(
        "event_type",
        F.round(ma - mb, 6).alias("mean_diff"),
        F.round(d, 6).alias("cohens_d"),
        band.alias("effect_band"),
    ).orderBy("event_type")


@q("q_price_stickiness")
def q_price_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-stickiness profile (menu-cost economics): per part, monthly
    mean unit prices and the share of month-over-month moves larger than
    1% — summarized per brand as the average change frequency and the
    share of fully sticky parts. Two stacked aggregates + one lag
    window on the (part, month) frame; exact fixed-point interiors."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    pm = (
        li.groupBy(
            "l_partkey", F.date_format("l_shipdate", "yyyy-MM").alias("__m")
        )
        .agg(
            F.round(dsum("l_extendedprice"), 6).alias("__rev"),
            F.round(dsum("l_quantity"), 6).alias("__q"),
        )
        .withColumn("__unit", F.round(F.col("__rev") / F.col("__q"), 6))
    )
    wm = W.partitionBy("l_partkey").orderBy("__m")
    ch = (
        pm.withColumn("__prev", F.lag("__unit").over(wm))
        .where(F.col("__prev").isNotNull())
        .withColumn(
            "__moved",
            (F.abs(F.col("__unit") / F.col("__prev") - 1) > 0.01).cast("int"),
        )
    )
    per_part = ch.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("__n_mo"),
        F.sum("__moved").alias("__n_ch"),
    )
    return (
        per_part.join(F.broadcast(p), per_part.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(
                F.sum("__n_ch").cast("double") / F.sum("__n_mo"), 6
            ).alias("change_frequency"),
            F.round(
                F.sum(F.when(F.col("__n_ch") == 0, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("sticky_share"),
        )
        .orderBy("p_brand")
    )


@q("q_forecast_horizons")
def q_forecast_horizons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-quality degradation by horizon: the persistence forecast
    ŷ_h = y_{t−h} scored at horizons 1..7 days (MAE + sMAPE per h) —
    the how-far-ahead-can-we-see curve that sets reorder lead times
    (q_forecast_backtest scores ONE seasonal-naive model; this sweeps
    the horizon). One broadcast horizon relation + a date-shifted
    self-join on the daily aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.col("l_shipdate").cast("date").alias("d")).agg(
        F.round(dsum("l_extendedprice"), 6).alias("rev")
    ).localCheckpoint(eager=False)
    hs = spark.range(1, 8).select(F.col("id").cast("int").alias("h"))
    base = daily.crossJoin(F.broadcast(hs))
    past = daily.select(F.col("d").alias("__dp"), F.col("rev").alias("__yhat"))
    j = base.join(past, F.expr("date_sub(d, h)") == F.col("__dp"))
    ae = F.round(F.abs(F.col("rev") - F.col("__yhat")), 6)
    sm = F.round(
        2.0
        * F.abs(F.col("rev") - F.col("__yhat"))
        / (F.abs(F.col("rev")) + F.abs(F.col("__yhat"))),
        6,
    )
    return (
        j.groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(davg(ae), 6).alias("mae"),
            F.round(davg(sm), 6).alias("smape"),
        )
        .orderBy("h")
    )


@q("q_demand_classes")
def q_demand_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Syntetos–Boylan demand classification per part: ADI (average
    inter-demand interval in days) × CV² (squared coefficient of
    variation of demand sizes) → smooth / intermittent / erratic /
    lumpy quadrants at the standard 1.32/0.49 cutoffs — the
    classification that decides which forecasting family a part gets.
    Per-part exact folds, 4-row class summary."""
    li = load_table(spark, sf_dir, "lineitem")
    per_day = li.groupBy("l_partkey", F.col("l_shipdate").cast("date").alias("d")).agg(
        F.round(dsum("l_quantity"), 6).alias("__q")
    )
    per_part = per_day.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("__nd"),
        (
            F.datediff(F.max("d"), F.min("d")) + 1
        ).cast("double").alias("__span"),
        dsum("__q").alias("__s"),
        dsum(F.col("__q") * F.col("__q")).alias("__ss"),
    )
    nd = F.col("__nd").cast("double")
    adi = F.col("__span") / nd
    mean = F.col("__s") / nd
    var = F.col("__ss") / nd - mean * mean
    cv2 = var / (mean * mean)
    cls = (
        F.when((adi < 1.32) & (cv2 < 0.49), "smooth")
        .when((adi >= 1.32) & (cv2 < 0.49), "intermittent")
        .when((adi < 1.32) & (cv2 >= 0.49), "erratic")
        .otherwise("lumpy")
    )
    return (
        per_part.where(F.col("__nd") >= 2)
        .select(cls.alias("demand_class"), adi.alias("__adi"), cv2.alias("__cv2"))
        .groupBy("demand_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(davg("__adi"), 6).alias("avg_adi"),
            F.round(davg("__cv2"), 6).alias("avg_cv2"),
        )
        .orderBy("demand_class")
    )


@q("q_ljung_box")
def q_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung–Box portmanteau whiteness test over the oracled ACF:
    Q = n(n+2)·Σ r_k²/(n−k) over q_acf's 7 lags — is there ANY
    autocorrelation worth modeling, asked once, instead of eyeballing
    q_acf lag by lag. The lag sum folds fixed point (1e12) so the
    reduction is order-free; reject at the χ²₀.₉₅(7) = 14.0671
    literal."""
    acf = QUERIES["q_acf"](spark, sf_dir)
    o = load_table(spark, sf_dir, "orders")
    nrow = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.count(F.lit(1)).alias("__c")
    ).agg(F.count(F.lit(1)).alias("__n"))
    j = acf.crossJoin(F.broadcast(nrow))
    nn = F.col("__n").cast("double")
    term = F.round(
        F.col("acf") * F.col("acf") / (nn - F.col("lag_k")) * 1e12
    ).cast("long")
    agg = j.agg(
        F.max("__n").alias("__n"),
        F.sum(term).alias("__t"),
        F.count(F.lit(1)).alias("__m"),
    )
    n2 = F.col("__n").cast("double")
    q_stat = F.round(n2 * (n2 + 2) * (F.col("__t").cast("double") / 1e12), 6)
    return agg.select(
        F.col("__n").cast("long").alias("n_obs"),
        F.col("__m").cast("int").alias("n_lags"),
        q_stat.alias("q_stat"),
        (q_stat > 14.0671).cast("int").alias("reject_whiteness_5pct"),
    )


@q("q_hurst")
def q_hurst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent by rescaled-range analysis over dyadic blocks
    (16/32/64 days) of the daily-revenue series: per full block,
    R = range of cumulative deviations (computed as the EXACT long
    D_t = n·cumsum − t·blocksum, so no fractional mean ever enters the
    scan), S = population std from exact moments, H = the closed-form
    slope (log2 RS₆₄ − log2 RS₁₆)/2 — trending (H>0.5) vs
    mean-reverting (H<0.5), the long-memory number next to q_acf's
    short-lag view. One day-count-sized frame × 3 block sizes."""
    li = load_table(spark, sf_dir, "lineitem")
    # kilo-scaled series: R/S is scale-invariant and rev² at full scale
    # overflows the 1e6 fixed-point long interior (the q_simpsons_check
    # lesson, again caught by the hash gate)
    daily = li.groupBy(F.col("l_shipdate").cast("date").alias("d")).agg(
        F.round(dsum(F.col("l_extendedprice") / 1000.0), 6).alias("rev")
    )
    wg = W.orderBy("d")
    base = daily.withColumn("__rn", F.row_number().over(wg)).withColumn(
        "__x6", F.round(F.col("rev") * 1000000).cast("long")
    )
    sizes = spark.createDataFrame([(16,), (32,), (64,)], "size int")
    tagged = base.crossJoin(F.broadcast(sizes)).withColumn(
        "__blk", F.expr("(__rn - 1) div size")
    )
    wb = W.partitionBy("size", "__blk")
    wo = wb.orderBy("__rn").rowsBetween(W.unboundedPreceding, W.currentRow)
    blocked = (
        tagged.withColumn("__n", F.count(F.lit(1)).over(wb))
        .where(F.col("__n") == F.col("size"))
        .withColumn("__bsum", F.sum("__x6").over(wb))
        .withColumn("__cum", F.sum("__x6").over(wo))
        .withColumn("__t", F.row_number().over(wb.orderBy("__rn")))
        .withColumn(
            "__dev",
            F.col("size").cast("long") * F.col("__cum")
            - F.col("__t").cast("long") * F.col("__bsum"),
        )
    )
    per_block = blocked.groupBy("size", "__blk").agg(
        (F.max("__dev") - F.min("__dev")).cast("double").alias("__rraw"),
        F.first("size").alias("__sz"),
        F.sum("__x6").alias("__s6"),
        dsum(F.col("rev") * F.col("rev")).alias("__ssd"),
    )
    nn = F.col("__sz").cast("double")
    r = F.col("__rraw") / (nn * 1e6)
    mean = F.col("__s6").cast("double") / 1e6 / nn
    var = F.col("__ssd") / nn - mean * mean
    rs = F.round(r / F.sqrt(var), 6)
    per_size = (
        per_block.select(F.col("__sz").alias("size"), rs.alias("__rs"))
        .where(F.col("__rs").isNotNull())
        .groupBy("size")
        .agg(
            F.count(F.lit(1)).alias("__nb"),
            F.round(davg("__rs"), 6).alias("__avg_rs"),
        )
    )
    piv = per_size.groupBy().pivot("size", [16, 32, 64]).agg(F.max("__avg_rs"))
    return piv.select(
        F.col("16").alias("rs_16"),
        F.col("32").alias("rs_32"),
        F.col("64").alias("rs_64"),
        F.round(
            (F.log2(F.col("64")) - F.log2(F.col("16"))) / 2.0, 6
        ).alias("hurst"),
    )


@q("q_load_heatmap")
def q_load_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly load heatmap: event counts per (day-of-week, hour) cell
    with share-of-total and peak flags (> 2× the uniform cell share) —
    the capacity-planning grid behind autoscaling schedules. DOW uses
    the cross-engine-explicit mapping q_calendar_features established;
    one scan, 168-cell output."""
    e = load_table(spark, sf_dir, "events")
    dow = F.dayofweek("ts").cast("int")  # 1=Sunday .. 7=Saturday
    hr = F.hour("ts").cast("int")
    per = e.groupBy(dow.alias("dow"), hr.alias("hour")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    tot = per.agg(F.sum("n_events").alias("__t"), F.count(F.lit(1)).alias("__cells"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "dow",
            "hour",
            "n_events",
            F.round(F.col("n_events").cast("double") / F.col("__t"), 6).alias(
                "share"
            ),
            (
                F.col("n_events").cast("double") / F.col("__t")
                > 2.0 / F.col("__cells").cast("double")
            ).cast("int").alias("peak"),
        )
        .orderBy("dow", "hour")
    )


@q("q_discount_curve")
def q_discount_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-discount policy curve: mean and p90 discount per quantity
    band (1-10, 11-20, ...) plus each band's revenue share — does bigger
    volume actually buy a deeper discount, and how much revenue rides
    each band. One scan, five-band output."""
    li = load_table(spark, sf_dir, "lineitem")
    # explicit FLOOR: DuckDB CAST(double AS INTEGER) rounds-to-nearest,
    # Spark cast truncates — floor is the shared semantic
    band = F.least(F.lit(5), F.floor((F.col("l_quantity") - 1) / 10).cast("int") + 1)
    per = li.groupBy(band.alias("qty_band")).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(davg("l_discount"), 6).alias("avg_discount"),
        F.round(F.percentile("l_discount", F.lit(0.9)), 6).alias("p90_discount"),
        F.round(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6).alias(
            "__rev"
        ),
    )
    tot = per.agg(F.round(dsum("__rev"), 6).alias("__t"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "qty_band",
            "n_lines",
            "avg_discount",
            "p90_discount",
            F.round(F.col("__rev") / F.col("__t"), 6).alias("revenue_share"),
        )
        .orderBy("qty_band")
    )


@q("q_seasonal_strength")
def q_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-strength summary over the oracled decomposition:
    F_s = max(0, 1 − var(residual)/var(seasonal+residual)) (Hyndman's
    STL-strength statistic) plus the same for trend — ONE number per
    component saying whether q_seasonal_decompose's weekly structure is
    load-bearing or noise. Variances from exact fixed-point moments over
    the interior-day frame."""
    sd = QUERIES["q_seasonal_decompose"](spark, sf_dir)
    comp = sd.select(
        F.round(F.col("seasonal") + F.col("residual"), 6).alias("__sr"),
        F.round(F.col("trend") + F.col("residual"), 6).alias("__tr"),
        F.round("residual", 6).alias("__r"),
    )
    m = comp.agg(
        F.count(F.lit(1)).alias("n_days"),
        dsum("__r").alias("__s_r"),
        dsum(F.col("__r") * F.col("__r")).alias("__ss_r"),
        dsum("__sr").alias("__s_sr"),
        dsum(F.col("__sr") * F.col("__sr")).alias("__ss_sr"),
        dsum("__tr").alias("__s_tr"),
        dsum(F.col("__tr") * F.col("__tr")).alias("__ss_tr"),
    )
    nn = F.col("n_days").cast("double")

    def var(s, ss):
        return F.col(ss) / nn - (F.col(s) / nn) * (F.col(s) / nn)

    fs = F.greatest(
        F.lit(0.0), 1.0 - var("__s_r", "__ss_r") / var("__s_sr", "__ss_sr")
    )
    ft = F.greatest(
        F.lit(0.0), 1.0 - var("__s_r", "__ss_r") / var("__s_tr", "__ss_tr")
    )
    return m.select(
        "n_days",
        F.round(fs, 6).alias("seasonal_strength"),
        F.round(ft, 6).alias("trend_strength"),
    )


@q("q_streaks")
def q_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity-streak distribution: each user's LONGEST run of
    consecutive active days (gaps-islands on the per-user day frame),
    histogrammed — the engagement-depth number behind habit metrics
    (DAU counts can't tell one 7-day streak from seven scattered days).
    Per-user day counts bound every stage."""
    e = load_table(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    w = W.partitionBy("user_id").orderBy("d")
    streaks = (
        days.withColumn(
            "__grp",
            F.datediff(F.col("d"), F.lit("2024-01-01").cast("date"))
            - F.row_number().over(w),
        )
        .groupBy("user_id", "__grp")
        .agg(F.count(F.lit(1)).alias("__len"))
    )
    longest = streaks.groupBy("user_id").agg(F.max("__len").alias("__max"))
    return (
        longest.groupBy(F.col("__max").alias("streak_days"))
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("streak_days")
    )


@q("q_return_rates")
def q_return_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return-rate league table: per brand, the share of lines (and of
    revenue) flagged returned, against the corpus-wide rate and a
    flag for brands > 1.2× it — the quality-escalation list a retail
    ops review walks. One broadcast part join, exact ratios."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    ret = (F.col("l_returnflag") == "R").cast("int")
    per = j.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(ret).cast("long").alias("n_returned"),
        F.round(dsum(F.when(ret == 1, F.col("l_extendedprice")).otherwise(0.0)), 6).alias(
            "__ret_rev"
        ),
        F.round(dsum("l_extendedprice"), 6).alias("__rev"),
    )
    tot = per.agg(
        (F.sum("n_returned").cast("double") / F.sum("n_lines")).alias("__base")
    )
    rate = F.col("n_returned").cast("double") / F.col("n_lines")
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "p_brand",
            "n_lines",
            F.round(rate, 6).alias("return_rate"),
            F.round(F.col("__ret_rev") / F.col("__rev"), 6).alias(
                "returned_rev_share"
            ),
            F.round(F.col("__base"), 6).alias("base_rate"),
            (rate > F.col("__base") * 1.2).cast("int").alias("escalate"),
        )
        .orderBy("p_brand")
    )


@q("q_segment_migration")
def q_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer value-segment migration 1996 → 1997: deterministic
    revenue terciles (ntile with custkey tiebreak) per year, full-outer
    aligned into a migration matrix with 'new' and 'churned' wings — the
    lifecycle flow behind retention planning (q_retention_cohort counts
    presence; this tracks VALUE movement). Year frames are
    customer-count-sized."""
    o = load_table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")

    def seg(year):
        per = (
            o.where(yr == year)
            .groupBy("o_custkey")
            .agg(dsum("o_totalprice").alias("__rev"))
        )
        wn = W.orderBy(F.asc("__rev"), F.asc("o_custkey"))
        t = per.withColumn("__t", F.ntile(3).over(wn))
        return t.select(
            "o_custkey",
            F.when(F.col("__t") == 1, "low")
            .when(F.col("__t") == 2, "mid")
            .otherwise("high")
            .alias("seg"),
        )

    a = seg(1996).select("o_custkey", F.col("seg").alias("seg_1996"))
    b = seg(1997).select("o_custkey", F.col("seg").alias("seg_1997"))
    j = a.join(b, "o_custkey", "full")
    return (
        j.groupBy(
            F.coalesce("seg_1996", F.lit("new")).alias("from_seg"),
            F.coalesce("seg_1997", F.lit("churned")).alias("to_seg"),
        )
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("from_seg", "to_seg")
    )


@q("q_ar_aging")
def q_ar_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order aging report: orders still open ('O') bucketed by days
    outstanding relative to the book's as-of date (max order date) into
    the classic 0-30 / 31-60 / 61-90 / 90+ bands, with order counts and
    value at risk — the AR-style aging every finance close produces.
    As-of derives from the data (one broadcast scalar), buckets are
    integer day arithmetic."""
    o = load_table(spark, sf_dir, "orders")
    asof = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("__asof"))
    open_o = o.where(F.col("o_orderstatus") == "O").crossJoin(F.broadcast(asof))
    age = F.datediff(F.col("__asof"), F.col("o_orderdate").cast("date"))
    bucket = (
        F.when(age <= 30, "0-30")
        .when(age <= 60, "31-60")
        .when(age <= 90, "61-90")
        .otherwise("90+")
    )
    per = open_o.groupBy(bucket.alias("age_bucket")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(dsum("o_totalprice"), 6).alias("open_value"),
    )
    tot = per.agg(F.round(dsum("open_value"), 6).alias("__t"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "age_bucket",
            "n_orders",
            "open_value",
            F.round(F.col("open_value") / F.col("__t"), 6).alias("value_share"),
        )
        .orderBy("age_bucket")
    )


@q("q_share_shift")
def q_share_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-share shift by customer nation, 1996 → 1997: each nation's
    revenue share in both years and the percentage-point swing — the
    who-is-winning table every regional review opens with. Two
    conditional fixed-point sums in ONE scan (no per-year rescan),
    broadcast nation names."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    yr = F.year("o_orderdate")
    j = (
        o.where(yr.isin(1996, 1997))
        .join(F.broadcast(c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)),
              o.o_custkey == F.col("c_custkey"))
    )
    per = j.groupBy("n_name").agg(
        F.round(dsum(F.when(yr == 1996, F.col("o_totalprice")).otherwise(0.0)), 6).alias("__r96"),
        F.round(dsum(F.when(yr == 1997, F.col("o_totalprice")).otherwise(0.0)), 6).alias("__r97"),
    )
    tot = per.agg(
        F.round(dsum("__r96"), 6).alias("__t96"),
        F.round(dsum("__r97"), 6).alias("__t97"),
    )
    s96 = F.round(F.col("__r96") / F.col("__t96"), 6)
    s97 = F.round(F.col("__r97") / F.col("__t97"), 6)
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "n_name",
            s96.alias("share_1996"),
            s97.alias("share_1997"),
            F.round((s97 - s96) * 100, 6).alias("pp_change"),
        )
        .orderBy("n_name")
    )


@q("q_coverage_gaps")
def q_coverage_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-region × customer-region coverage matrix with ZERO cells
    restored (the q_chi2 lesson: a missing cell and an empty cell are
    different facts): trade value and flow share per region pair, plus
    the white-space flag — the assortment/expansion gap map. Dimension
    joins broadcast; the cell cross is 5×5."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    nr = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "r_name"
    )
    sup = s.join(F.broadcast(nr), s.s_nationkey == nr.n_nationkey).select(
        "s_suppkey", F.col("r_name").alias("supp_region")
    )
    cus = c.join(F.broadcast(nr), c.c_nationkey == nr.n_nationkey).select(
        "c_custkey", F.col("r_name").alias("cust_region")
    )
    flows = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .join(F.broadcast(cus), o.o_custkey == cus.c_custkey)
        .groupBy("supp_region", "cust_region")
        .agg(F.round(dsum("l_extendedprice"), 6).alias("__v"))
    )
    regions = r.select(F.col("r_name"))
    cells = regions.select(F.col("r_name").alias("supp_region")).crossJoin(
        regions.select(F.col("r_name").alias("cust_region"))
    )
    tot = flows.agg(F.round(dsum("__v"), 6).alias("__t"))
    return (
        cells.join(flows, ["supp_region", "cust_region"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "supp_region",
            "cust_region",
            F.round(F.coalesce("__v", F.lit(0.0)), 6).alias("trade_value"),
            F.round(F.coalesce("__v", F.lit(0.0)) / F.col("__t"), 6).alias(
                "flow_share"
            ),
            (F.coalesce("__v", F.lit(0.0)) == 0.0).cast("int").alias("white_space"),
        )
        .orderBy("supp_region", "cust_region")
    )


@q("q_readability")
def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per language: 206.835 − 1.015·(words/sentences)
    − 84.6·(syllables/words), with sentences and vowel-group 'syllables'
    counted by the SAME regexps on both engines (the heuristic syllable
    counter every readability library actually ships) — the
    text-complexity screen next to q_quality_score's length bands.
    Per-doc round-6 scores, fixed-point language means."""
    d = load_table(spark, sf_dir, "documents")
    words = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[A-Za-z]+"), 0)).cast(
        "double"
    )
    sents = F.greatest(
        F.lit(1),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[.!?]+"), 0)),
    ).cast("double")
    sylls = F.greatest(
        F.lit(1),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[aeiouyAEIOUY]+"), 0)),
    ).cast("double")
    flesch = F.round(
        206.835 - 1.015 * (words / sents) - 84.6 * (sylls / words), 6
    )
    scored = d.where(words > 0).select("lang", flesch.alias("__f"))
    return (
        scored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(davg("__f"), 6).alias("avg_flesch"),
        )
        .orderBy("lang")
    )


@q("q_event_id_audit")
def q_event_id_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once ingestion audit on the event stream's id column:
    duplicate-id rate (replayed deliveries) and ids spanning multiple
    users (id-collision / generator bugs) — the two invariants an
    at-least-once pipeline must reconcile before events feed counts.
    Two id-keyed aggregates, one-row report."""
    e = load_table(spark, sf_dir, "events")
    per_id = e.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("__n"),
        F.countDistinct("user_id").alias("__nu"),
    )
    return per_id.agg(
        F.sum("__n").cast("long").alias("n_events"),
        F.count(F.lit(1)).alias("n_distinct_ids"),
        F.sum(F.when(F.col("__n") > 1, F.col("__n") - 1).otherwise(0))
        .cast("long")
        .alias("n_replayed"),
        F.round(
            F.sum(F.when(F.col("__n") > 1, F.col("__n") - 1).otherwise(0)).cast(
                "double"
            )
            / F.sum("__n"),
            6,
        ).alias("replay_rate"),
        F.sum(F.when(F.col("__nu") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_ids_multi_user"),
    )


@q("q_sma_cross")
def q_sma_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-average crossover signals: 5-day vs 20-day SMA per supplier
    series, counting golden (fast crosses above) and death (below)
    crosses — the signal generator the indicator family (RSI/Bollinger/
    EWMA) feeds. Full-window SMAs only (count-gated frames), sign from
    the round-6 spread, crosses via one lag — all inside the single
    per-key window family."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_suppkey") <= 10)
    daily = li.groupBy(
        "l_suppkey", F.date_format("l_shipdate", "yyyy-MM-dd").alias("day")
    ).agg(F.round(davg("l_extendedprice"), 6).alias("close"))
    w = W.partitionBy("l_suppkey").orderBy("day")
    w5 = w.rowsBetween(-4, 0)
    w20 = w.rowsBetween(-19, 0)
    c6 = F.round(F.col("close") * 1000000).cast("long")
    framed = (
        daily.withColumn("__s5", F.sum(c6).over(w5))
        .withColumn("__n5", F.count(F.lit(1)).over(w5))
        .withColumn("__s20", F.sum(c6).over(w20))
        .withColumn("__n20", F.count(F.lit(1)).over(w20))
        .where((F.col("__n5") == 5) & (F.col("__n20") == 20))
        .withColumn(
            "__spread",
            F.round(
                F.col("__s5").cast("double") / 1e6 / 5
                - F.col("__s20").cast("double") / 1e6 / 20,
                6,
            ),
        )
        .withColumn("__sign", F.signum("__spread"))
    )
    crossed = framed.withColumn("__prev", F.lag("__sign").over(w)).where(
        F.col("__prev").isNotNull() & (F.col("__prev") != F.col("__sign"))
    )
    return (
        crossed.groupBy("l_suppkey")
        .agg(
            F.sum(F.when(F.col("__sign") > F.col("__prev"), 1).otherwise(0))
            .cast("long")
            .alias("golden_crosses"),
            F.sum(F.when(F.col("__sign") < F.col("__prev"), 1).otherwise(0))
            .cast("long")
            .alias("death_crosses"),
        )
        .orderBy("l_suppkey")
    )


@q("q_health_summary")
def q_health_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The morning health check as ONE query: triggered-alert counts from
    four already-oracled monitors — error-rate control-chart breaches,
    month-over-month volume drops, experiment sample-ratio mismatches,
    and FK orphans — unioned into a single pane (composition over the
    registry itself: each leg IS the registered query, re-aggregated to
    its alert count)."""

    def leg(name, df, cond_col):
        return df.agg(
            F.sum(F.col(cond_col)).cast("long").alias("n_triggered"),
            F.count(F.lit(1)).alias("n_checked"),
        ).select(F.lit(name).alias("check"), "n_triggered", "n_checked")

    legs = [
        leg("error_control_chart", QUERIES["q_control_chart"](spark, sf_dir), "out_of_control"),
        leg("volume_drops", QUERIES["q_partition_health"](spark, sf_dir), "volume_drop"),
        leg("srm", QUERIES["q_ab_srm"](spark, sf_dir), "srm_flag"),
        leg(
            "fk_orphans",
            QUERIES["q_fk_orphans"](spark, sf_dir).withColumn(
                "__bad", (F.col("n_orphans") > 0).cast("int")
            ),
            "__bad",
        ),
    ]
    out = legs[0]
    for l2 in legs[1:]:
        out = out.unionByName(l2)
    return out.orderBy("check")


@q("q_grubbs")
def q_grubbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' single-outlier statistic per priority class:
    G = max|x − x̄| / s over order values, with the flag at the
    conventional G > 4 screening cut (exact critical values need the t
    quantile; 4.0 is the large-n screening literal) — the one-number
    is-the-extreme-real check before q_mad_outliers' full robust pass.
    Exact moments, one extra max fold."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("o_totalprice").alias("__s"),
        dsum(F.col("o_totalprice") * F.col("o_totalprice") / 1000000).alias("__ssm"),
        F.round(F.max("o_totalprice"), 6).alias("__mx"),
        F.round(F.min("o_totalprice"), 6).alias("__mn"),
    )
    nn = F.col("n").cast("double")
    mean = F.col("__s") / nn
    var = (F.col("__ssm") * 1000000) / nn - mean * mean
    g = F.greatest(F.col("__mx") - mean, mean - F.col("__mn")) / F.sqrt(var)
    return m.select(
        "o_orderpriority",
        "n",
        F.round(mean, 6).alias("mean_value"),
        F.round(g, 6).alias("grubbs_g"),
        (g > 4.0).cast("int").alias("flag_outlier"),
    ).orderBy("o_orderpriority")


@q("q_ridge_path")
def q_ridge_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge-regression shrinkage path in closed form: price regressed on
    centered (quantity, discount) at λ ∈ {0, 1, 10, 100} — the 2×2
    (C + λI)⁻¹ c_xy solve as shared-text column expressions over ONE
    exact moment pass crossed with a broadcast λ relation (the
    regularized step past q_ols_multi; coefficients shrink monotonically
    toward 0, test-pinned). No solver, no iteration."""
    li = load_table(spark, sf_dir, "lineitem")
    x1, x2, yv = F.col("l_quantity"), F.col("l_discount"), F.col("l_extendedprice") / 1000.0
    mom = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum(x1).alias("s1"),
        dsum(x2).alias("s2"),
        dsum(yv).alias("sy"),
        dsum(x1 * x1).alias("s11"),
        dsum(x1 * x2).alias("s12"),
        dsum(x2 * x2).alias("s22"),
        dsum(x1 * yv).alias("s1y"),
        dsum(x2 * yv).alias("s2y"),
    )
    cov = mom.select(
        F.expr("s11 / n - (s1 / n) * (s1 / n)").alias("c11"),
        F.expr("s12 / n - (s1 / n) * (s2 / n)").alias("c12"),
        F.expr("s22 / n - (s2 / n) * (s2 / n)").alias("c22"),
        F.expr("s1y / n - (s1 / n) * (sy / n)").alias("c1y"),
        F.expr("s2y / n - (s2 / n) * (sy / n)").alias("c2y"),
    )
    lams = spark.createDataFrame(
        [(0.0,), (1.0,), (10.0,), (100.0,)], "lam double"
    )
    j = cov.crossJoin(F.broadcast(lams))
    det = "((c11 + lam) * (c22 + lam) - c12 * c12)"
    return j.select(
        "lam",
        F.round(F.expr(f"((c22 + lam) * c1y - c12 * c2y) / {det}"), 6).alias("w_quantity"),
        F.round(F.expr(f"((c11 + lam) * c2y - c12 * c1y) / {det}"), 6).alias("w_discount"),
    ).orderBy("lam")


@q("q_psm_att")
def q_psm_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor caliper matching on pre-period spend: each
    treated (even-id) user matches the control user with the closest
    pre-spend within a one-band (±50) caliper — candidates meet through a ±1
    integer spend-BAND join (never treated×control), nearest resolved by
    one rank window — and the matched-pair ATT estimates the effect with
    the pre-period level removed (the matching member of the causal set:
    q_did differences it out, q_cuped regresses it out, this MATCHES it
    out). Exact fixed-point means; deterministic tie-breaks."""
    e = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    per = e.groupBy("user_id").agg(
        F.round(dsum(F.when(F.col("ts") < cut, F.col("value")).otherwise(0.0)), 6).alias("x"),
        F.round(dsum(F.when(F.col("ts") >= cut, F.col("value")).otherwise(0.0)), 6).alias("y"),
    )
    treated = per.where(F.col("user_id") % 2 == 0).select(
        F.col("user_id").alias("t_id"), F.col("x").alias("xt"), F.col("y").alias("yt")
    )
    control = per.where(F.col("user_id") % 2 != 0).select(
        F.col("user_id").alias("c_id"), F.col("x").alias("xc"), F.col("y").alias("yc")
    )
    band_w = 50.0  # spend-scale band; caliper = one band width
    tb = treated.withColumn(
        "__band", F.explode(F.array(
            F.floor(F.col("xt") / band_w).cast("long") - 1,
            F.floor(F.col("xt") / band_w).cast("long"),
            F.floor(F.col("xt") / band_w).cast("long") + 1,
        ))
    )
    cb = control.withColumn("__band", F.floor(F.col("xc") / band_w).cast("long"))
    cand = tb.join(cb, "__band").where(
        F.abs(F.col("xc") - F.col("xt")) <= band_w
    )
    wn = W.partitionBy("t_id").orderBy(
        F.abs(F.col("xc") - F.col("xt")).asc(), F.asc("c_id")
    )
    matched = (
        cand.withColumn("__rn", F.row_number().over(wn))
        .where(F.col("__rn") == 1)
        .select("t_id", "yt", "yc")
    )
    nt = treated.agg(F.count(F.lit(1)).alias("n_treated"))
    return (
        matched.agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.round(davg(F.round(F.col("yt") - F.col("yc"), 6)), 6).alias("att"),
        )
        .crossJoin(F.broadcast(nt))
        .select(
            "n_treated",
            "n_matched",
            F.round(
                F.col("n_matched").cast("double") / F.col("n_treated"), 6
            ).alias("match_rate"),
            "att",
        )
    )


@q("q_gate_overlap")
def q_gate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation-gate overlap matrix: for each pair of independent gates
    (quality, repetition, entropy), how many documents BOTH would drop
    and the failure-set Jaccard — high overlap means a gate is paying
    rent another already covers (the gates-redundancy diagnostic behind
    q_curation_report's sequential counts). One pass of per-doc flags,
    3×3 conditional sums."""
    from fortune_500_financial_insights_pipeline_spark.operators.text import (
        char_entropy,
        quality_score,
        repetition_stats,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    rep = repetition_stats(d, "doc_id", "text").select("doc_id", "top_gram_frac")
    ent = char_entropy(d).select("doc_id", "entropy_bits")
    flags = (
        d.withColumn("__fq", (F.round(quality_score("text"), 6) < 0.5).cast("int"))
        .join(rep, "doc_id", "left")
        .join(ent, "doc_id", "left")
        .select(
            "__fq",
            (F.col("top_gram_frac").isNotNull() & (F.col("top_gram_frac") >= 0.08))
            .cast("int")
            .alias("__fr"),
            (
                F.col("entropy_bits").isNotNull()
                & ((F.col("entropy_bits") < 1.5) | (F.col("entropy_bits") > 7.0))
            )
            .cast("int")
            .alias("__fe"),
        )
    )
    agg = flags.agg(
        F.sum("__fq").cast("long").alias("q"),
        F.sum("__fr").cast("long").alias("r"),
        F.sum("__fe").cast("long").alias("e"),
        F.sum(F.col("__fq") * F.col("__fr")).cast("long").alias("qr"),
        F.sum(F.col("__fq") * F.col("__fe")).cast("long").alias("qe"),
        F.sum(F.col("__fr") * F.col("__fe")).cast("long").alias("re"),
    )
    pairs = [
        ("quality", "repetition", "q", "r", "qr"),
        ("quality", "entropy", "q", "e", "qe"),
        ("repetition", "entropy", "r", "e", "re"),
    ]
    legs = [
        agg.select(
            F.lit(a).alias("gate_a"),
            F.lit(b).alias("gate_b"),
            F.col(ca).alias("n_fail_a"),
            F.col(cb).alias("n_fail_b"),
            F.col(ci).alias("n_both"),
            F.round(
                F.when(
                    F.col(ca) + F.col(cb) - F.col(ci) > 0,
                    F.col(ci).cast("double")
                    / (F.col(ca) + F.col(cb) - F.col(ci)),
                ).otherwise(0.0),
                6,
            ).alias("fail_jaccard"),
        )
        for a, b, ca, cb, ci in pairs
    ]
    out = legs[0]
    for l2 in legs[1:]:
        out = out.unionByName(l2)
    return out.orderBy("gate_a", "gate_b")


@q("q_anova")
def q_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F (operators/stats.anova_oneway) of order value
    (kilo-scaled so x² stays inside the fixed-point ceiling) across the 5
    order priorities — the k-group generalization of q_ab_test's t test,
    one grouped moment pass + a k-row reduce."""
    from fortune_500_financial_insights_pipeline_spark.operators.stats import anova_oneway

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", (F.col("o_totalprice") / 1000.0).alias("val")
    )
    return anova_oneway(o, "val", "o_orderpriority")


@q("q_spearman")
def q_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (operators/stats.spearman_by_group) of
    quantity vs extended price inside each return flag — the tie-aware,
    outlier-robust monotonic-association number next to q_stats_corr's
    Pearson. Exact integer rank interior (doubled tie-averaged ranks,
    centered by their exact mean n+1)."""
    from fortune_500_financial_insights_pipeline_spark.operators.stats import spearman_by_group

    li = load_table(spark, sf_dir, "lineitem")
    return spearman_by_group(
        li, "l_quantity", "l_extendedprice", "l_returnflag"
    ).orderBy("grp")


@q("q_kruskal_wallis")
def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis H (operators/stats.kruskal_wallis) of order value
    across the 5 priorities — the distribution-free sibling of q_anova
    (same question, no normality assumption); χ²₀.₉₅ cut at 4 dof. Exact
    long rank-sums; tie correction from an exact t³−t fold."""
    from fortune_500_financial_insights_pipeline_spark.operators.stats import kruskal_wallis

    o = load_table(spark, sf_dir, "orders")
    return kruskal_wallis(o, "o_totalprice", "o_orderpriority")


@q("q_cramers_v")
def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V (operators/stats.cramers_v) for priority × status — the
    [0,1] effect-size rescaling of q_chi2 (significance says IS there
    association; V says HOW MUCH), same zero-cell-restored contingency
    scan."""
    from fortune_500_financial_insights_pipeline_spark.operators.stats import cramers_v

    o = load_table(spark, sf_dir, "orders")
    return cramers_v(o, "o_orderpriority", "o_orderstatus")


@q("q_levene")
def q_levene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe variance-homogeneity test (operators/stats.
    brown_forsythe): |x − group median| pushed through the one-way ANOVA
    F, order value by order status — the equal-variances gate you check
    before trusting q_anova / pooled-variance t tests. Median relation is
    k rows, broadcast."""
    from fortune_500_financial_insights_pipeline_spark.operators.stats import brown_forsythe

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", (F.col("o_totalprice") / 1000.0).alias("val")
    )
    return brown_forsythe(o, "val", "o_orderstatus")


@q("q_changepoint")
def q_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-segmentation change-point (operators/timeseries.
    binary_changepoint) over each supplier's kilo-scaled daily revenue —
    WHERE did the level break, where q_cusum only says that it drifted.
    Prefix-sum gains, one argmax rank, earliest-split ties."""
    from fortune_500_financial_insights_pipeline_spark.operators.timeseries import (
        binary_changepoint,
    )

    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_suppkey") <= 20)
    daily = li.groupBy(
        "l_suppkey", F.date_format("l_shipdate", "yyyy-MM-dd").alias("day")
    ).agg(F.round(dsum(F.col("l_extendedprice") / 1000.0), 6).alias("close"))
    return binary_changepoint(daily, ["l_suppkey"], "day", "close").orderBy("l_suppkey")


@q("q_holt")
def q_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend smoothing (operators/timeseries.holt_linear,
    α=0.5 β=0.25) of monthly order counts per priority, 3 months ahead —
    the trend-aware forecaster between q_ewma (no trend) and
    q_forecast_backtest (model-free persistence). Exact per-step-rounded
    fold; oracle is the same recursion as a recursive CTE."""
    from fortune_500_financial_insights_pipeline_spark.operators.timeseries import holt_linear

    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        "o_orderpriority", F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(F.count(F.lit(1)).cast("double").alias("n_orders"))
    return holt_linear(
        monthly, ["o_orderpriority"], "month", "n_orders", alpha=0.5, beta=0.25, horizon=3
    ).orderBy("o_orderpriority")


@q("q_theil_u")
def q_theil_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil's U forecast-skill ratio on the kilo-scaled daily revenue
    series: RMSE(7-back seasonal naive) / RMSE(1-back naive) over the
    rows where both lags exist — U < 1 means weekly structure genuinely
    predicts (the one-number justification for q_seasonal_lag's pick).
    Errors rounded to 1e-6, squared-error sums in fixed point."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.date_format("l_shipdate", "yyyy-MM-dd").alias("day")).agg(
        F.round(dsum(F.col("l_extendedprice") / 1000.0), 6).alias("y")
    )
    wd = W.orderBy("day")
    lagged = daily.select(
        "y",
        F.lag("y", 1).over(wd).alias("__l1"),
        F.lag("y", 7).over(wd).alias("__l7"),
    ).where(F.col("__l7").isNotNull())
    e1 = F.round(F.col("y") - F.col("__l1"), 6)
    e7 = F.round(F.col("y") - F.col("__l7"), 6)
    agg = lagged.agg(
        F.count(F.lit(1)).alias("n"),
        dsum(e1 * e1).alias("__s1"),
        dsum(e7 * e7).alias("__s7"),
    )
    nd = F.col("n").cast("double")
    return agg.select(
        "n",
        F.round(F.sqrt(F.col("__s1") / nd), 6).alias("rmse_naive"),
        F.round(F.sqrt(F.col("__s7") / nd), 6).alias("rmse_weekly"),
        F.round(F.sqrt(F.col("__s7") / nd) / F.sqrt(F.col("__s1") / nd), 6).alias("theil_u"),
    )


@q("q_nelson_aalen")
def q_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson–Aalen cumulative hazard over the same time-to-first-purchase
    frame as q_kaplan_meier: H(t) = Σ d/n_risk as an exact round-9
    fixed-point cumsum, plus the Breslow survival exp(−H) — the hazard
    VIEW of the curve KM shows as survival (and the numerically stabler
    estimator under small risk sets)."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min("ts").alias("__first"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("__fp"),
        F.max("ts").alias("__last"),
    )
    dur = F.datediff(
        F.coalesce(F.col("__fp"), F.col("__last")).cast("date"),
        F.col("__first").cast("date"),
    )
    users = per_user.select(
        dur.alias("t"), F.col("__fp").isNotNull().cast("int").alias("event")
    )
    per_t = users.groupBy("t").agg(
        F.count(F.lit(1)).alias("__n_at"),
        F.sum("event").cast("long").alias("d"),
    )
    tot = per_t.agg(F.sum("__n_at").alias("__total"))
    wc = W.orderBy("t").rowsBetween(W.unboundedPreceding, -1)
    wcum = W.orderBy("t").rowsBetween(W.unboundedPreceding, 0)
    at_risk = (
        per_t.crossJoin(F.broadcast(tot))
        .withColumn(
            "n_risk",
            (F.col("__total") - F.coalesce(F.sum("__n_at").over(wc), F.lit(0))).cast("long"),
        )
    )
    hterm = F.round(F.col("d").cast("double") / F.col("n_risk") * 1000000000).cast("long")
    cum = F.sum(hterm).over(wcum).cast("double") / 1000000000
    return (
        at_risk.withColumn("__h", cum)
        .where(F.col("d") > 0)
        .select(
            "t",
            "n_risk",
            "d",
            F.round("__h", 6).alias("cum_hazard"),
            F.round(F.exp(-F.col("__h")), 6).alias("survival_breslow"),
        )
        .orderBy("t")
    )


@q("q_erasure_scope")
def q_erasure_scope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure impact report: for a deletion request covering a
    seed set of customers (every 97th key — the batch a DSR queue would
    hand over), count the cascade through the FK graph — customer rows,
    their orders, and those orders' lineitems — with each table's share.
    The seed set joins as a broadcast semi-join at every hop (at 100 TB:
    a bloom-filter semi-join), so no fact table ever shuffles."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    seeds = c.where(F.col("c_custkey") % 97 == 0).select("c_custkey")
    hit_orders = o.join(
        F.broadcast(seeds), o["o_custkey"] == seeds["c_custkey"], "left_semi"
    )
    hit_li = li.join(
        F.broadcast(hit_orders.select("o_orderkey")),
        li["l_orderkey"] == F.col("o_orderkey"),
        "left_semi",
    )
    def leg(name, hits, total_df):
        n = hits.agg(F.count(F.lit(1)).alias("n_rows_affected"))
        t = total_df.agg(F.count(F.lit(1)).alias("__t"))
        return n.crossJoin(F.broadcast(t)).select(
            F.lit(name).alias("table_name"),
            F.col("n_rows_affected").cast("long"),
            F.col("__t").cast("long").alias("n_rows_total"),
            F.round(
                F.col("n_rows_affected").cast("double") / F.col("__t"), 6
            ).alias("affected_share"),
        )
    out = (
        leg("customer", seeds, c)
        .unionByName(leg("orders", hit_orders, o))
        .unionByName(leg("lineitem", hit_li, li))
    )
    return out.orderBy("table_name")


@q("q_retention_sweep")
def q_retention_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention-policy sweep: rows past each table's documented horizon
    (orders/lineitem: keep 4 years from the book's 2001-08-01 as-of date,
    cutoff 1997-08-01; events: keep 14 days from the stream's last day) —
    the expired-row counts, shares, and the oldest surviving timestamp a
    purge job would report before deleting. One aggregate per table,
    literal cutoffs, no row-level output."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    e = load_table(spark, sf_dir, "events")
    def leg(name, df, ts_col, cutoff):
        cut = F.lit(cutoff).cast("timestamp")
        return df.agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum((F.col(ts_col) < cut).cast("long")).alias("n_expired"),
            F.round(
                F.sum((F.col(ts_col) < cut).cast("long")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("expired_share"),
            F.date_format(F.min(ts_col), "yyyy-MM-dd").alias("oldest_row"),
        )
    return (
        leg("orders", o, "o_orderdate", "1997-08-01 00:00:00")
        .unionByName(leg("lineitem", li, "l_shipdate", "1997-08-01 00:00:00"))
        .unionByName(leg("events", e, "ts", "2024-01-17 00:00:00"))
        .orderBy("table_name")
    )


@q("q_obrien_fleming")
def q_obrien_fleming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-sequential interim monitoring with O'Brien-Fleming spending:
    the purchase-conversion z statistic (even- vs odd-id users) at four
    cumulative two-day looks over the launch week, each compared against
    its OBF boundary (4.333/2.963/2.359/2.014 — the classic 4-look
    table) — peeking made legal, where q_ab_test reads the experiment
    only once at the end. Looks sit inside the pre-saturation window
    (conversion hits 1.0 by mid-month, where z degenerates). Exact
    counts per look from one conditional-aggregate scan crossed with a
    broadcast look relation; z in closed form."""
    e = load_table(spark, sf_dir, "events")
    looks = spark.createDataFrame(
        [
            (1, "2024-01-02 00:00:00", 4.333),
            (2, "2024-01-04 00:00:00", 2.963),
            (3, "2024-01-06 00:00:00", 2.359),
            (4, "2024-01-08 00:00:00", 2.014),
        ],
        "look int, cut_ts string, obf_boundary double",
    )
    j = e.crossJoin(F.broadcast(looks)).where(
        F.col("ts") < F.col("cut_ts").cast("timestamp")
    )
    arm = (F.col("user_id") % 2 == 0).cast("int")
    conv = (F.col("event_type") == "purchase").cast("long")
    per_user = j.groupBy("look", "obf_boundary", "user_id", arm.alias("__arm")).agg(
        F.max(conv).alias("__conv")
    )
    g = per_user.groupBy("look", "obf_boundary").agg(
        F.sum(F.when(F.col("__arm") == 1, 1).otherwise(0)).cast("long").alias("n_t"),
        F.sum(F.when(F.col("__arm") == 0, 1).otherwise(0)).cast("long").alias("n_c"),
        F.sum(F.when(F.col("__arm") == 1, F.col("__conv")).otherwise(0)).cast("long").alias("x_t"),
        F.sum(F.when(F.col("__arm") == 0, F.col("__conv")).otherwise(0)).cast("long").alias("x_c"),
    )
    pt = F.col("x_t").cast("double") / F.col("n_t")
    pc = F.col("x_c").cast("double") / F.col("n_c")
    pp = (F.col("x_t") + F.col("x_c")).cast("double") / (F.col("n_t") + F.col("n_c"))
    z = (pt - pc) / F.sqrt(
        pp * (1.0 - pp) * (1.0 / F.col("n_t") + 1.0 / F.col("n_c"))
    )
    return g.select(
        "look",
        "n_t",
        "n_c",
        F.round(pt, 6).alias("conv_t"),
        F.round(pc, 6).alias("conv_c"),
        F.round(z, 6).alias("z_stat"),
        "obf_boundary",
        # when/otherwise mirrors SQL CASE: a null z (degenerate pooled
        # variance) reads as not-crossed, not null
        F.when(F.abs(z) > F.col("obf_boundary"), 1).otherwise(0).cast("int").alias("crossed"),
    ).orderBy("look")


@q("q_f1_multiclass")
def q_f1_multiclass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision/recall/F1 over q_naive_bayes's confusion
    matrix, plus the macro (unweighted class mean) and micro (= accuracy
    for single-label) summary rows — the metric layer every trained
    classifier in the registry reports through. Composition over the
    already-oracled confusion; zero-support conventions follow the
    zero-division=0 standard. Per-class F1 values fold fixed-point so
    the macro mean is order-free."""
    cm = QUERIES["q_naive_bayes"](spark, sf_dir)
    t = cm.groupBy(F.col("true_lang").alias("cls")).agg(
        F.sum("n_docs").alias("__n_true"),
        F.sum(F.when(F.col("pred_lang") == F.col("true_lang"), F.col("n_docs")).otherwise(0)).alias("__tp_t"),
    )
    p = cm.groupBy(F.col("pred_lang").alias("cls")).agg(
        F.sum("n_docs").alias("__n_pred")
    )
    per = (
        t.join(p, "cls", "full")
        .select(
            "cls",
            F.coalesce("__tp_t", F.lit(0)).cast("long").alias("tp"),
            (F.coalesce("__n_pred", F.lit(0)) - F.coalesce("__tp_t", F.lit(0))).cast("long").alias("fp"),
            (F.coalesce("__n_true", F.lit(0)) - F.coalesce("__tp_t", F.lit(0))).cast("long").alias("fn"),
        )
    )
    prec = F.when(F.col("tp") + F.col("fp") > 0,
                  F.col("tp").cast("double") / (F.col("tp") + F.col("fp"))).otherwise(0.0)
    rec = F.when(F.col("tp") + F.col("fn") > 0,
                 F.col("tp").cast("double") / (F.col("tp") + F.col("fn"))).otherwise(0.0)
    f1 = F.when(F.col("tp") > 0,
                2.0 * F.col("tp").cast("double")
                / (2.0 * F.col("tp") + F.col("fp") + F.col("fn"))).otherwise(0.0)
    rows = per.select(
        "cls", "tp", "fp", "fn",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )
    summ = rows.agg(
        F.sum("tp").cast("long").alias("tp"),
        F.sum("fp").cast("long").alias("fp"),
        F.sum("fn").cast("long").alias("fn"),
        davg("precision").alias("__mp"),
        davg("recall").alias("__mr"),
        davg("f1").alias("__mf"),
        (F.sum("tp").cast("double") / (F.sum("tp") + F.sum("fn"))).alias("__acc"),
    )
    macro = summ.select(
        F.lit("__macro").alias("cls"), "tp", "fp", "fn",
        F.round("__mp", 6).alias("precision"),
        F.round("__mr", 6).alias("recall"),
        F.round("__mf", 6).alias("f1"),
    )
    micro = summ.select(
        F.lit("__micro").alias("cls"), "tp", "fp", "fn",
        F.round("__acc", 6).alias("precision"),
        F.round("__acc", 6).alias("recall"),
        F.round("__acc", 6).alias("f1"),
    )
    return rows.unionByName(macro).unionByName(micro).orderBy("cls")


@q("q_mcc")
def q_mcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation of the heuristic language-ID rule against the
    true label (en vs other) — the single balanced number for a skewed
    binary gate, where q_langid_confusion shows the raw cells. Exact
    long cell counts from one scan; MCC/balanced-accuracy in closed form
    (each factor cast to double BEFORE multiplying so the product never
    leaves IEEE range at corpus scale)."""
    d = load_table(spark, sf_dir, "documents")
    stop = F.array([F.lit(w) for w in
                    ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]])
    toks = F.split("text", " ")
    score = F.size(F.filter(toks, lambda t: F.array_contains(stop, t))).cast(
        "double"
    ) / F.size(toks)
    pred_en = (score >= 0.05).cast("int")
    true_en = (F.col("lang") == "en").cast("int")
    g = d.agg(
        F.sum(((pred_en == 1) & (true_en == 1)).cast("long")).alias("tp"),
        F.sum(((pred_en == 1) & (true_en == 0)).cast("long")).alias("fp"),
        F.sum(((pred_en == 0) & (true_en == 1)).cast("long")).alias("fn"),
        F.sum(((pred_en == 0) & (true_en == 0)).cast("long")).alias("tn"),
    )
    tp, fp = F.col("tp").cast("double"), F.col("fp").cast("double")
    fn, tn = F.col("fn").cast("double"), F.col("tn").cast("double")
    mcc = (tp * tn - fp * fn) / F.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    bacc = (tp / (tp + fn) + tn / (tn + fp)) / 2.0
    acc = (tp + tn) / (tp + fp + fn + tn)
    return g.select(
        "tp", "fp", "fn", "tn",
        F.round(mcc, 6).alias("mcc"),
        F.round(bacc, 6).alias("balanced_accuracy"),
        F.round(acc, 6).alias("accuracy"),
    )


@q("q_cohen_kappa")
def q_cohen_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two independent cheap language raters — the
    stopword-ratio rule and an ASCII-share rule — chance-corrected
    agreement (po − pe)/(1 − pe): do the funnel's redundant gates
    actually measure the same thing, beyond what class skew forces?
    Exact 2×2 counts from one scan; marginals in closed form."""
    d = load_table(spark, sf_dir, "documents")
    stop = F.array([F.lit(w) for w in
                    ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]])
    toks = F.split("text", " ")
    score = F.size(F.filter(toks, lambda t: F.array_contains(stop, t))).cast(
        "double"
    ) / F.size(toks)
    rater_a = (score >= 0.05).cast("int")
    ascii_share = F.length(
        F.regexp_replace(F.col("text"), "[^\\x00-\\x7F]", "")
    ).cast("double") / F.nullif(F.length("text"), F.lit(0))
    rater_b = F.when(ascii_share >= 0.99, 1).otherwise(0)
    g = d.agg(
        F.sum(((rater_a == 1) & (rater_b == 1)).cast("long")).alias("n11"),
        F.sum(((rater_a == 1) & (rater_b == 0)).cast("long")).alias("n10"),
        F.sum(((rater_a == 0) & (rater_b == 1)).cast("long")).alias("n01"),
        F.sum(((rater_a == 0) & (rater_b == 0)).cast("long")).alias("n00"),
    )
    n = (F.col("n11") + F.col("n10") + F.col("n01") + F.col("n00")).cast("double")
    po = (F.col("n11") + F.col("n00")).cast("double") / n
    pe = (
        (F.col("n11") + F.col("n10")).cast("double") * (F.col("n11") + F.col("n01"))
        + (F.col("n01") + F.col("n00")).cast("double") * (F.col("n10") + F.col("n00"))
    ) / (n * n)
    kappa = (po - pe) / (1.0 - pe)
    return g.select(
        "n11", "n10", "n01", "n00",
        F.round(po, 6).alias("p_observed"),
        F.round(pe, 6).alias("p_expected"),
        F.round(kappa, 6).alias("kappa"),
    )


@q("q_inventory_policy")
def q_inventory_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand inventory policy from one demand scan: daily-demand
    moments (over observed demand days) → reorder point μL + zσ√L and
    safety stock at z=1.645 (95% cycle service, 7-day lead), plus EOQ
    √(2DS/H) with order cost S=100 and holding cost H = 20% of the
    brand's mean retail price — the planning numbers q_abc_analysis
    ranks and q_demand_classes routes. Part dim joins broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    daily = (
        li.join(F.broadcast(p.select("p_partkey", "p_brand")),
                li["l_partkey"] == F.col("p_partkey"))
        .groupBy("p_brand", F.date_format("l_shipdate", "yyyy-MM-dd").alias("day"))
        .agg(F.round(dsum("l_quantity"), 6).alias("qty"))
    )
    stats = daily.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_days"),
        dsum("qty").alias("__s"),
        dsum(F.col("qty") * F.col("qty")).alias("__ss"),
    )
    price = p.groupBy("p_brand").agg(davg("p_retailprice").alias("__price"))
    j = stats.join(F.broadcast(price), "p_brand")
    nd = F.col("n_days").cast("double")
    mu = F.col("__s") / nd
    sigma = F.sqrt(F.col("__ss") / nd - mu * mu)
    lead = 7.0
    z = 1.645
    safety = z * sigma * F.sqrt(F.lit(lead))
    rop = mu * lead + safety
    eoq = F.sqrt(2.0 * F.col("__s") * 100.0 / (0.2 * F.col("__price")))
    return j.select(
        "p_brand",
        "n_days",
        F.round(mu, 6).alias("mean_daily_demand"),
        F.round(sigma, 6).alias("sd_daily_demand"),
        F.round(safety, 6).alias("safety_stock"),
        F.round(rop, 6).alias("reorder_point"),
        F.round(eoq, 6).alias("eoq"),
    ).orderBy("p_brand")


@q("q_croston")
def q_croston(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston intermittent-demand estimates (operators/timeseries.
    croston, α=0.1) for the first 41 part keys — size/interval EWMAs and
    the per-day demand rate for exactly the lumpy series q_demand_classes
    flags (20-40 demand events across 7 years). Exact per-step-rounded
    folds vs a recursive-CTE oracle."""
    from fortune_500_financial_insights_pipeline_spark.operators.timeseries import croston

    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_partkey") <= 40)
    occ = li.groupBy(
        "l_partkey", F.date_format("l_shipdate", "yyyy-MM-dd").alias("day")
    ).agg(F.round(dsum("l_quantity"), 6).alias("size"))
    return croston(occ, ["l_partkey"], "day", "size", alpha=0.1).orderBy("l_partkey")


@q("q_newsvendor")
def q_newsvendor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newsvendor stocking level per brand: with underage cost 40 and
    overage cost 10 the critical ratio is 0.8, so stock the 0.8 quantile
    of daily demand — plus the realized stockout share and the mean
    unmet demand at that level (the second scan every planner runs to
    sanity-check the quantile). Interpolated quantile matches
    quantile_cont cross-engine."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    daily = (
        li.join(F.broadcast(p.select("p_partkey", "p_brand")),
                li["l_partkey"] == F.col("p_partkey"))
        .groupBy("p_brand", F.date_format("l_shipdate", "yyyy-MM-dd").alias("day"))
        .agg(F.round(dsum("l_quantity"), 6).alias("qty"))
    )
    qv = daily.groupBy("p_brand").agg(
        F.round(F.percentile("qty", F.lit(0.8)), 6).alias("stock_level")
    )
    j = daily.join(F.broadcast(qv), "p_brand")
    out = j.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.max("stock_level").alias("stock_level"),
        F.round(
            F.sum((F.col("qty") > F.col("stock_level")).cast("long")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("stockout_share"),
        F.round(
            davg(F.greatest(F.round(F.col("qty") - F.col("stock_level"), 6), F.lit(0.0))),
            6,
        ).alias("mean_unmet_demand"),
    )
    return out.select(
        "p_brand", "n_days", "stock_level", "stockout_share", "mean_unmet_demand"
    ).orderBy("p_brand")


@q("q_pairs_trading")
def q_pairs_trading(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs-trading statistics for two supplier price series: OLS hedge
    ratio (y on x with intercept), the residual spread, its AR(1)
    mean-reversion coefficient φ (Δs on lagged s, no intercept — the
    spread is centered by construction) and the implied half-life
    −ln2/ln(1+φ) — the stat-arb readout built entirely from exact
    moments (the cointegration-style sibling of q_rolling_beta).
    Half-life is null unless φ ∈ (−1, 0) (i.e. the spread actually
    mean-reverts)."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.where(F.col("l_suppkey").isin(1, 2)).groupBy(
        "l_suppkey", F.date_format("l_shipdate", "yyyy-MM-dd").alias("day")
    ).agg(F.round(davg(F.col("l_extendedprice") / 1000.0), 6).alias("px"))
    a = daily.where(F.col("l_suppkey") == 1).select("day", F.col("px").alias("x"))
    b = daily.where(F.col("l_suppkey") == 2).select("day", F.col("px").alias("y"))
    pairs = a.join(b, "day")
    mom = pairs.agg(
        F.count(F.lit(1)).alias("n_days"),
        dsum("x").alias("__sx"),
        dsum("y").alias("__sy"),
        dsum(F.col("x") * F.col("x")).alias("__sxx"),
        dsum(F.col("x") * F.col("y")).alias("__sxy"),
    )
    nd = F.col("n_days").cast("double")
    beta = (F.col("__sxy") - F.col("__sx") * F.col("__sy") / nd) / (
        F.col("__sxx") - F.col("__sx") * F.col("__sx") / nd
    )
    alpha = F.col("__sy") / nd - beta * (F.col("__sx") / nd)
    fit = pairs.crossJoin(F.broadcast(mom.select("n_days",
        F.round(beta, 6).alias("beta"), F.round(alpha, 6).alias("alpha"))))
    spr = fit.select(
        "day", "n_days", "beta", "alpha",
        F.round(F.col("y") - (F.col("alpha") + F.col("beta") * F.col("x")), 6).alias("s"),
    )
    wd = W.orderBy("day")
    lagged = spr.select(
        "n_days", "beta", "alpha", "s",
        F.lag("s", 1).over(wd).alias("__sl"),
    ).where(F.col("__sl").isNotNull())
    ar = lagged.groupBy("n_days", "beta", "alpha").agg(
        dsum(F.col("__sl") * F.round(F.col("s") - F.col("__sl"), 6)).alias("__num"),
        dsum(F.col("__sl") * F.col("__sl")).alias("__den"),
    )
    phi = F.col("__num") / F.col("__den")
    half = F.when(
        (phi > -1.0) & (phi < 0.0), -F.log(F.lit(2.0)) / F.log(1.0 + phi)
    )
    return ar.select(
        "n_days", "beta", "alpha",
        F.round(phi, 6).alias("phi"),
        F.round(half, 6).alias("half_life_days"),
    )


@q("q_weekday_effect")
def q_weekday_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week effect test: one-way ANOVA F (operators/stats.
    anova_oneway) of kilo-scaled daily revenue across weekday names —
    is the weekly seasonality q_seasonal_decompose extracts statistically
    real? Weekday via locale-stable full day names (identical strings
    cross-engine, dodging the Sun=0-vs-1 dow trap)."""
    from fortune_500_financial_insights_pipeline_spark.operators.stats import anova_oneway

    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.date_format("l_shipdate", "yyyy-MM-dd").alias("day")).agg(
        F.round(dsum(F.col("l_extendedprice") / 1000.0), 6).alias("rev")
    )
    named = daily.select(
        F.date_format(F.to_date("day"), "EEEE").alias("weekday"), "rev"
    )
    return anova_oneway(named, "rev", "weekday")


@q("q_fellegi_sunter")
def q_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter linkage scores by agreement pattern: candidate
    customer pairs block on the account-balance century band, then each
    (nation-agrees, segment-agrees) pattern gets the classic log2(m/u) /
    log2((1−m)/(1−u)) weight sum — u estimated from the data as the
    chance-agreement probability Σf²/n², m the literal 0.95 reliability.
    The probabilistic-ER scoring layer over the blocking families
    (q_sorted_neighborhood / q_fuzzy_match find candidates; this says
    how much evidence each agreement carries). Pair counts are exact;
    weights are closed-form from one frequency scan."""
    c = load_table(spark, sf_dir, "customer")
    n_tot = c.agg(F.count(F.lit(1)).alias("__n"))
    u_nat = (
        c.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("__f"))
        .crossJoin(F.broadcast(n_tot))
        .agg(
            (F.sum(F.col("__f").cast("double") * F.col("__f"))
             / (F.max("__n").cast("double") * F.max("__n"))).alias("u_nation")
        )
    )
    u_seg = (
        c.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("__f"))
        .crossJoin(F.broadcast(n_tot))
        .agg(
            (F.sum(F.col("__f").cast("double") * F.col("__f"))
             / (F.max("__n").cast("double") * F.max("__n"))).alias("u_segment")
        )
    )
    band = F.floor(F.col("c_acctbal") / 100).cast("long")
    l = c.select(F.col("c_custkey").alias("k1"), F.col("c_nationkey").alias("n1"),
                 F.col("c_mktsegment").alias("s1"), band.alias("__b"))
    r = c.select(F.col("c_custkey").alias("k2"), F.col("c_nationkey").alias("n2"),
                 F.col("c_mktsegment").alias("s2"), band.alias("__b"))
    pairs = l.join(r, "__b").where(F.col("k1") < F.col("k2"))
    pat = pairs.groupBy(
        (F.col("n1") == F.col("n2")).cast("int").alias("nation_agree"),
        (F.col("s1") == F.col("s2")).cast("int").alias("segment_agree"),
    ).agg(F.count(F.lit(1)).alias("n_pairs"))
    m = 0.95
    j = pat.crossJoin(F.broadcast(u_nat)).crossJoin(F.broadcast(u_seg))
    w_nat = F.when(
        F.col("nation_agree") == 1, F.log2(F.lit(m) / F.col("u_nation"))
    ).otherwise(F.log2((1.0 - F.lit(m)) / (1.0 - F.col("u_nation"))))
    w_seg = F.when(
        F.col("segment_agree") == 1, F.log2(F.lit(m) / F.col("u_segment"))
    ).otherwise(F.log2((1.0 - F.lit(m)) / (1.0 - F.col("u_segment"))))
    return j.select(
        "nation_agree",
        "segment_agree",
        "n_pairs",
        F.round(w_nat + w_seg, 6).alias("fs_score"),
    ).orderBy("nation_agree", "segment_agree")


@q("q_session_stats")
def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-quality summary over 30-minute-gap sessionization: session
    counts, sessions per user, mean events and duration per session,
    median duration, and the bounce share (single-event sessions) — the
    product-analytics header row; q_top_paths walks the same sessions'
    CONTENT, this measures their SHAPE. One lag + running-sum pass
    builds session ids; everything after aggregates session-level rows."""
    e = load_table(spark, sf_dir, "events")
    wu = W.partitionBy("user_id").orderBy("ts", "event_id")
    newsess = (
        F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(wu) > 1800
    ).cast("int")
    sess = e.select(
        "user_id", "ts", "event_id",
        F.coalesce(newsess, F.lit(1)).alias("__new"),
    ).withColumn(
        "__sid", F.sum("__new").over(wu.rowsBetween(W.unboundedPreceding, 0))
    )
    per_sess = sess.groupBy("user_id", "__sid").agg(
        F.count(F.lit(1)).alias("__n_ev"),
        (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))).alias("__dur"),
    )
    return per_sess.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.round(
            F.count(F.lit(1)).cast("double") / F.countDistinct("user_id"), 6
        ).alias("sessions_per_user"),
        F.round(F.sum("__n_ev").cast("double") / F.count(F.lit(1)), 6).alias(
            "mean_events"
        ),
        F.round(F.sum("__dur").cast("double") / F.count(F.lit(1)), 6).alias(
            "mean_duration_s"
        ),
        F.round(F.percentile("__dur", F.lit(0.5)), 6).alias("median_duration_s"),
        F.round(
            F.sum((F.col("__n_ev") == 1).cast("long")).cast("double") / F.count(F.lit(1)),
            6,
        ).alias("bounce_share"),
    )


@q("q_stickiness")
def q_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day-WAU stickiness per day: how much of the
    weekly audience shows up daily — the engagement-depth ratio next to
    q_cumulative_users (growth) and q_streaks (consecutive days). The
    distinct (user, day) grid joins to a day spine over a ±6-day band
    (band join, never user×day cross), so the rolling distinct count is
    exact without a sliding-window distinct."""
    e = load_table(spark, sf_dir, "events")
    ud = e.select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id"
    ).distinct()
    days = ud.select("day").distinct()
    dau = ud.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    band = days.select(F.col("day").alias("asof_day")).join(
        ud,
        (F.col("day") <= F.col("asof_day"))
        & (F.to_date("day") >= F.date_sub(F.to_date("asof_day"), 6)),
    )
    wau = band.groupBy("asof_day").agg(F.countDistinct("user_id").alias("wau"))
    return (
        dau.join(wau, dau["day"] == wau["asof_day"])
        .select(
            "day",
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias("stickiness"),
        )
        .orderBy("day")
    )


@q("q_feature_adoption")
def q_feature_adoption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-adoption curve per event type: users who first touched the
    feature in week 1 vs ever, adoption share of the full user base, and
    median days-to-adoption from each user's first event — which features
    spread and how fast (q_funnel orders steps; this compares features).
    One per-(user, type) first-touch aggregate feeds everything."""
    e = load_table(spark, sf_dir, "events")
    first_any = e.groupBy("user_id").agg(F.min("ts").alias("__first"))
    first_ft = e.groupBy("user_id", "event_type").agg(F.min("ts").alias("__ft"))
    tot = first_any.agg(F.count(F.lit(1)).alias("__n_users"))
    j = first_ft.join(first_any, "user_id").crossJoin(F.broadcast(tot))
    lag_days = F.datediff(F.col("__ft").cast("date"), F.col("__first").cast("date"))
    week1 = F.col("__ft") < F.lit("2024-01-08 00:00:00").cast("timestamp")
    return (
        j.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_adopters"),
            F.sum(week1.cast("long")).alias("n_week1"),
            F.round(
                F.count(F.lit(1)).cast("double") / F.max("__n_users"), 6
            ).alias("adoption_share"),
            F.round(F.percentile(lag_days, F.lit(0.5)), 6).alias(
                "median_days_to_adopt"
            ),
        )
        .orderBy("event_type")
    )


@q("q_jarque_bera")
def q_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test per order priority: skewness and excess
    kurtosis from one exact 4-moment pass (values scaled to 1e-4 so the
    4th power stays inside the fixed-point ceiling), JB = n/6·(S² + K²/4)
    against the χ²(2) 5% literal 5.991 — the is-it-even-normal gate in
    front of every z/t-based screen (q_grubbs, q_ab_test). The moment →
    statistic algebra is SHARED EXPRESSION TEXT with the oracle, so the
    doubles agree bit for bit."""
    o = load_table(spark, sf_dir, "orders")
    xv = F.col("o_totalprice") / 10000.0
    g = o.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.count(F.lit(1)).alias("n"),
        dsum(xv).alias("s1"),
        dsum(xv * xv).alias("s2"),
        dsum(xv * xv * xv).alias("s3"),
        dsum(xv * xv * xv * xv).alias("s4"),
    )
    stat = g.selectExpr(
        "grp",
        "CAST(n AS BIGINT) AS n",
        "s2 / n - (s1 / n) * (s1 / n) AS m2",
        "s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3",
        "s4 / n - 4 * (s1 / n) * (s3 / n) + 6 * (s1 / n) * (s1 / n) * (s2 / n)"
        " - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4",
    ).selectExpr(
        "grp",
        "n",
        "ROUND(m3 / (m2 * sqrt(m2)), 6) AS skewness",
        "ROUND(m4 / (m2 * m2) - 3.0D, 6) AS excess_kurtosis",
    ).selectExpr(
        # JB recomposed from the ROUNDED components (stable anchors), with
        # D-suffixed literals: in Spark SQL text `6.0` is a DECIMAL, so
        # `n / 6.0` silently routes through decimal division and diverges
        # from DuckDB's double math at the 1e-7 level
        "grp",
        "n",
        "skewness",
        "excess_kurtosis",
        "CAST(round(n / 6.0D * (skewness * skewness"
        " + excess_kurtosis * excess_kurtosis / 4.0D) * 1000000) AS DOUBLE)"
        " / 1000000 AS jb_stat",
        "CAST(CASE WHEN n / 6.0D * (skewness * skewness"
        " + excess_kurtosis * excess_kurtosis / 4.0D) > 5.991D"
        " THEN 1 ELSE 0 END AS INT) AS flag_nonnormal",
    )
    return stat.orderBy("grp")


@q("q_qq_normal")
def q_qq_normal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-Q-against-normal decile table for order values: empirical deciles
    standardized by the exact moments vs the literal standard-normal
    deciles (±1.281552 … 0) — WHERE the distribution bends away from
    normal, where q_jarque_bera only scores THAT it does. One percentile
    pass + one moment pass, 9 output rows."""
    o = load_table(spark, sf_dir, "orders")
    xv = (F.col("o_totalprice") / 10000.0).alias("x")
    base = o.select(xv)
    mom = base.agg(
        F.count(F.lit(1)).alias("__n"),
        dsum("x").alias("__s1"),
        dsum(F.col("x") * F.col("x")).alias("__s2"),
    )
    decs = base.agg(
        F.percentile("x", F.array(*[F.lit(i / 10.0) for i in range(1, 10)])).alias("__q")
    ).select(F.posexplode("__q").alias("pos", "sample_q"))
    zs = spark.createDataFrame(
        [
            (0, 0.1, -1.281552), (1, 0.2, -0.841621), (2, 0.3, -0.524401),
            (3, 0.4, -0.253347), (4, 0.5, 0.0), (5, 0.6, 0.253347),
            (6, 0.7, 0.524401), (7, 0.8, 0.841621), (8, 0.9, 1.281552),
        ],
        "pos int, p double, normal_z double",
    )
    j = decs.join(F.broadcast(zs), "pos").crossJoin(F.broadcast(mom))
    mu = F.col("__s1") / F.col("__n")
    sd = F.sqrt(F.col("__s2") / F.col("__n") - mu * mu)
    sample_z = (F.col("sample_q") - mu) / sd
    return j.select(
        "p",
        F.round("sample_q", 6).alias("sample_q"),
        F.round(sample_z, 6).alias("sample_z"),
        "normal_z",
        F.round(sample_z - F.col("normal_z"), 6).alias("gap"),
    ).orderBy("p")


@q("q_iqr_fences")
def q_iqr_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey boxplot fences per order priority: Q1/Q3, the 1.5-IQR inner
    and 3-IQR outer fences, and how many rows fall outside each — the
    nonparametric outlier screen beside q_mad_outliers (median-based) and
    q_grubbs (normal-based). Quantile pass then one re-scan against the
    broadcast fence relation."""
    o = load_table(spark, sf_dir, "orders")
    qs = o.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.round(F.percentile("o_totalprice", F.lit(0.25)), 6).alias("q1"),
        F.round(F.percentile("o_totalprice", F.lit(0.75)), 6).alias("q3"),
    )
    f = qs.select(
        "grp", "q1", "q3",
        F.round(F.col("q3") - F.col("q1"), 6).alias("iqr"),
    )
    fence = f.select(
        "grp", "q1", "q3", "iqr",
        F.round(F.col("q1") - 1.5 * F.col("iqr"), 6).alias("lo_inner"),
        F.round(F.col("q3") + 1.5 * F.col("iqr"), 6).alias("hi_inner"),
        F.round(F.col("q1") - 3.0 * F.col("iqr"), 6).alias("lo_outer"),
        F.round(F.col("q3") + 3.0 * F.col("iqr"), 6).alias("hi_outer"),
    )
    j = o.join(
        F.broadcast(fence), o["o_orderpriority"] == fence["grp"]
    )
    x = F.col("o_totalprice")
    return (
        j.groupBy("grp", "q1", "q3", "iqr", "lo_inner", "hi_inner")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(((x < F.col("lo_inner")) | (x > F.col("hi_inner"))).cast("long")).alias(
                "n_outliers"
            ),
            F.sum(((x < F.col("lo_outer")) | (x > F.col("hi_outer"))).cast("long")).alias(
                "n_extreme"
            ),
        )
        .select(
            "grp", "n", "q1", "q3", "iqr", "lo_inner", "hi_inner",
            "n_outliers", "n_extreme",
            F.round(F.col("n_outliers").cast("double") / F.col("n"), 6).alias(
                "outlier_share"
            ),
        )
        .orderBy("grp")
    )


@q("q_error_budget")
def q_error_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-window SLO burn rate as of the stream's last event: error
    share over trailing 1/3/7-day windows against a 99.5% success SLO,
    burn = share / (1 − SLO), alerting at the window's literal multiple
    (Google-SRE-style multiwindow multiburn: 14.4×/6×/3×) — the paging
    policy q_control_chart's static limits can't express. One scan
    joined to a broadcast window relation anchored on max(ts)."""
    e = load_table(spark, sf_dir, "events")
    asof = e.agg(F.max("ts").alias("__asof"))
    wins = spark.createDataFrame(
        [("1d", 1, 14.4), ("3d", 3, 6.0), ("7d", 7, 3.0)],
        "win string, days int, burn_alert_at double",
    )
    j = (
        e.crossJoin(F.broadcast(asof))
        .crossJoin(F.broadcast(wins))
        .where(
            F.col("ts")
            >= F.col("__asof") - F.col("days") * F.expr("INTERVAL 1 DAY")
        )
    )
    g = j.groupBy("win", "days", "burn_alert_at").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("event_type") == "error").cast("long")).alias("n_errors"),
    )
    share = F.col("n_errors").cast("double") / F.col("n_events")
    # 0.005 literal (not 1.0-0.995: python folds that to 0.00499..893
    # while DuckDB's decimal arithmetic folds it to exactly 0.005)
    burn = share / F.lit(0.005)
    return g.select(
        "win",
        "n_events",
        "n_errors",
        F.round(share, 6).alias("error_share"),
        F.round(burn, 6).alias("burn_rate"),
        F.when(burn > F.col("burn_alert_at"), 1).otherwise(0).cast("int").alias("alert"),
    ).orderBy("win")


@q("q_apdex")
def q_apdex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apdex score per event type, reading the event value as a latency
    proxy: satisfied ≤ 150, tolerating ≤ 600, Apdex = (sat + tol/2)/n —
    the single user-experience number ops dashboards trend, beside
    q_error_budget's reliability view. One conditional aggregate."""
    e = load_table(spark, sf_dir, "events")
    sat = (F.col("value") <= 150.0).cast("long")
    tol = ((F.col("value") > 150.0) & (F.col("value") <= 600.0)).cast("long")
    g = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(sat).alias("n_satisfied"),
        F.sum(tol).alias("n_tolerating"),
    )
    apdex = (
        F.col("n_satisfied").cast("double")
        + F.col("n_tolerating").cast("double") / 2.0
    ) / F.col("n")
    return g.select(
        "event_type", "n", "n_satisfied", "n_tolerating",
        F.round(apdex, 6).alias("apdex"),
    ).orderBy("event_type")


@q("q_incident_stats")
def q_incident_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incident summary from the error stream: consecutive errors within
    a 10-minute gap form one incident (global gaps-islands), then MTTR-
    style numbers — incident count, mean/median duration, largest error
    burst, and mean time between incident starts — the ops twin of
    q_session_stats' engagement sessions. One lag + cumsum pass."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_type") == "error")
    wo = W.orderBy("ts", "event_id")
    sec = F.col("ts").cast("long")
    newinc = (sec - F.lag(sec).over(wo) > 600).cast("int")
    marked = e.select(
        "ts", "event_id", F.coalesce(newinc, F.lit(1)).alias("__new")
    ).withColumn("__iid", F.sum("__new").over(wo.rowsBetween(W.unboundedPreceding, 0)))
    per_inc = marked.groupBy("__iid").agg(
        F.count(F.lit(1)).alias("__n_err"),
        F.min(F.col("ts").cast("long")).alias("__start"),
        (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))).alias("__dur"),
    )
    wi = W.orderBy("__iid")
    gaps = per_inc.select(
        "__n_err", "__dur",
        (F.col("__start") - F.lag("__start").over(wi)).alias("__tbi"),
    )
    return gaps.agg(
        F.count(F.lit(1)).alias("n_incidents"),
        F.round(F.sum("__dur").cast("double") / F.count(F.lit(1)), 6).alias(
            "mean_duration_s"
        ),
        F.round(F.percentile("__dur", F.lit(0.5)), 6).alias("median_duration_s"),
        F.max("__n_err").cast("long").alias("max_burst_errors"),
        F.round(
            F.sum("__tbi").cast("double") / F.count("__tbi"), 6
        ).alias("mean_time_between_s"),
    )


@q("q_price_index")
def q_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres / Paasche / Fisher price indices between fiscal 1995
    (base) and 2000 over the common part basket: per-part unit prices
    and quantities from one year-partitioned scan, index numerators as
    fixed-point folds over the joined basket — the inflation readout
    q_price_dispersion (cross-section) and q_price_stickiness (menu
    costs) don't give. Fisher = √(L·P) closes the bias gap between the
    base-weighted and current-weighted views."""
    li = load_table(spark, sf_dir, "lineitem")
    yr = F.year("l_shipdate")
    per = (
        li.where(yr.isin(1995, 2000))
        .groupBy("l_partkey", yr.alias("__y"))
        .agg(
            F.round(davg(F.col("l_extendedprice") / F.col("l_quantity")), 6).alias("p"),
            F.round(dsum("l_quantity"), 6).alias("q"),
        )
    )
    base = per.where(F.col("__y") == 1995).select(
        "l_partkey", F.col("p").alias("p0"), F.col("q").alias("q0")
    )
    curr = per.where(F.col("__y") == 2000).select(
        "l_partkey", F.col("p").alias("p1"), F.col("q").alias("q1")
    )
    j = base.join(curr, "l_partkey")
    agg = j.agg(
        F.count(F.lit(1)).alias("n_parts"),
        dsum(F.col("p1") * F.col("q0") / 1000.0).alias("__l_num"),
        dsum(F.col("p0") * F.col("q0") / 1000.0).alias("__l_den"),
        dsum(F.col("p1") * F.col("q1") / 1000.0).alias("__p_num"),
        dsum(F.col("p0") * F.col("q1") / 1000.0).alias("__p_den"),
    )
    lasp = F.col("__l_num") / F.col("__l_den")
    paas = F.col("__p_num") / F.col("__p_den")
    return agg.select(
        "n_parts",
        F.round(lasp, 6).alias("laspeyres"),
        F.round(paas, 6).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher"),
    )


@q("q_bass_diffusion")
def q_bass_diffusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bass diffusion model fit in closed form: daily first-signup counts
    regressed on cumulative adopters, n_t = a + b·C + c·C² solved by
    Cramer's rule over one exact moment pass (the 3×3 generalization of
    q_ridge_path's 2×2 solve), then (p, q, M) recovered from the
    quadratic cM² + bM + a = 0 — innovation/imitation coefficients and
    market size from pure relational algebra. Moments are exact longs
    (C ≤ users, tiny powers)."""
    e = load_table(spark, sf_dir, "events")
    first = e.where(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min(F.date_format("ts", "yyyy-MM-dd")).alias("day")
    )
    daily = first.groupBy("day").agg(F.count(F.lit(1)).alias("n_t"))
    wd = W.orderBy("day")
    wc = W.orderBy("day").rowsBetween(W.unboundedPreceding, -1)
    cc = daily.select(
        "day",
        F.col("n_t").cast("long").alias("y"),
        F.coalesce(F.sum("n_t").over(wc), F.lit(0)).cast("long").alias("c"),
    )
    mom = cc.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("m1"),
        F.sum(F.col("c") * F.col("c")).alias("m2"),
        F.sum(F.col("c") * F.col("c") * F.col("c")).alias("m3"),
        F.sum(F.col("c") * F.col("c") * F.col("c") * F.col("c")).alias("m4"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("c")).alias("sy1"),
        F.sum(F.col("y") * F.col("c") * F.col("c")).alias("sy2"),
    )
    sol = mom.selectExpr(
        "CAST(n AS BIGINT) AS n_days",
        # Cramer's rule on the normal equations [n m1 m2; m1 m2 m3; m2 m3 m4]
        "CAST(n AS DOUBLE) * (CAST(m2 AS DOUBLE) * m4 - CAST(m3 AS DOUBLE) * m3)"
        " - CAST(m1 AS DOUBLE) * (CAST(m1 AS DOUBLE) * m4 - CAST(m3 AS DOUBLE) * m2)"
        " + CAST(m2 AS DOUBLE) * (CAST(m1 AS DOUBLE) * m3 - CAST(m2 AS DOUBLE) * m2) AS det",
        "CAST(sy AS DOUBLE) * (CAST(m2 AS DOUBLE) * m4 - CAST(m3 AS DOUBLE) * m3)"
        " - CAST(m1 AS DOUBLE) * (CAST(sy1 AS DOUBLE) * m4 - CAST(m3 AS DOUBLE) * sy2)"
        " + CAST(m2 AS DOUBLE) * (CAST(sy1 AS DOUBLE) * m3 - CAST(m2 AS DOUBLE) * sy2) AS det_a",
        "CAST(n AS DOUBLE) * (CAST(sy1 AS DOUBLE) * m4 - CAST(m3 AS DOUBLE) * sy2)"
        " - CAST(sy AS DOUBLE) * (CAST(m1 AS DOUBLE) * m4 - CAST(m3 AS DOUBLE) * m2)"
        " + CAST(m2 AS DOUBLE) * (CAST(m1 AS DOUBLE) * sy2 - CAST(sy1 AS DOUBLE) * m2) AS det_b",
        "CAST(n AS DOUBLE) * (CAST(m2 AS DOUBLE) * sy2 - CAST(sy1 AS DOUBLE) * m3)"
        " - CAST(m1 AS DOUBLE) * (CAST(m1 AS DOUBLE) * sy2 - CAST(sy1 AS DOUBLE) * m2)"
        " + CAST(sy AS DOUBLE) * (CAST(m1 AS DOUBLE) * m3 - CAST(m2 AS DOUBLE) * m2) AS det_c",
    ).selectExpr(
        "n_days",
        "ROUND(det_a / det, 6) AS coef_a",
        "ROUND(det_b / det, 6) AS coef_b",
        "ROUND(det_c / det, 6) AS coef_c",
    ).selectExpr(
        "n_days",
        "coef_a",
        "coef_b",
        "coef_c",
        # M solves cM² + bM + a = 0; the adoption-curve root is the one
        # with the negative sqrt branch over a negative c
        "CASE WHEN coef_c < 0.0D AND coef_b * coef_b - 4.0D * coef_c * coef_a >= 0.0D"
        " THEN ROUND((-coef_b - sqrt(coef_b * coef_b - 4.0D * coef_c * coef_a))"
        " / (2.0D * coef_c), 6) END AS market_size",
    ).selectExpr(
        "n_days",
        "coef_a",
        "coef_b",
        "coef_c",
        "market_size",
        "CASE WHEN market_size IS NOT NULL AND market_size > 0.0D"
        " THEN ROUND(coef_a / market_size, 6) END AS p_innovation",
        "CASE WHEN market_size IS NOT NULL"
        " THEN ROUND(-coef_c * market_size, 6) END AS q_imitation",
    )
    return sol


@q("q_ols_inference")
def q_ols_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple OLS with the full inference block: slope/intercept PLUS the
    slope's standard error, t statistic, and R² from one exact moment
    pass — q_ols_multi and q_rolling_beta stop at point estimates; this
    is the is-the-effect-real layer (|t| > 1.96 flag). Price (kilo) on
    quantity over lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    x, yv = F.col("l_quantity"), F.col("l_extendedprice") / 1000.0
    mom = li.agg(
        F.count(F.lit(1)).alias("n"),
        dsum(x).alias("sx"),
        dsum(yv).alias("sy"),
        dsum(x * x).alias("sxx"),
        dsum(x * yv).alias("sxy"),
        dsum(yv * yv).alias("syy"),
    )
    out = mom.selectExpr(
        "CAST(n AS BIGINT) AS n",
        "sxx - sx * sx / n AS cxx",
        "sxy - sx * sy / n AS cxy",
        "syy - sy * sy / n AS cyy",
        "sx", "sy",
    ).selectExpr(
        "n",
        "ROUND(cxy / cxx, 6) AS beta",
        "ROUND(sy / n - cxy / cxx * (sx / n), 6) AS alpha",
        "ROUND(sqrt((cyy - cxy * cxy / cxx) / (n - 2) / cxx), 6) AS se_beta",
        "ROUND((cxy / cxx) / sqrt((cyy - cxy * cxy / cxx) / (n - 2) / cxx), 6) AS t_beta",
        "ROUND(1.0D - (cyy - cxy * cxy / cxx) / cyy, 6) AS r2",
        "CAST(CASE WHEN abs((cxy / cxx) / sqrt((cyy - cxy * cxy / cxx) / (n - 2) / cxx))"
        " > 1.96D THEN 1 ELSE 0 END AS INT) AS significant",
    )
    return out


@q("q_two_way_anova")
def q_two_way_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-way ANOVA with interaction (operators/stats.anova_twoway):
    order value (kilo) ~ priority × status — main effects AND whether the
    priority effect depends on the status, which two one-way q_anova
    passes cannot ask. One cell-level moment pass; unweighted unbalanced
    decomposition documented in the operator."""
    from fortune_500_financial_insights_pipeline_spark.operators.stats import anova_twoway

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderstatus",
        (F.col("o_totalprice") / 1000.0).alias("val"),
    )
    return anova_twoway(o, "val", "o_orderpriority", "o_orderstatus")


@q("q_tukey_hsd")
def q_tukey_hsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-Kramer post-hoc pairwise table (operators/stats.tukey_hsd)
    over the same priority groups as q_anova: WHICH priorities differ in
    mean order value, studentized-range statistic per pair against the
    k=5 large-df literal 3.86 — the follow-up every significant ANOVA
    demands."""
    from fortune_500_financial_insights_pipeline_spark.operators.stats import tukey_hsd

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", (F.col("o_totalprice") / 1000.0).alias("val")
    )
    return tukey_hsd(o, "val", "o_orderpriority")


@q("q_huber_regression")
def q_huber_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Huber robust regression by 3 unrolled IRLS steps: start at OLS,
    then reweight each row by min(1, k/|resid|) (k = 50 kilo-units, the
    fixed robustness knob) and re-solve weighted least squares — the
    outlier-resistant line between q_ols_inference (L2, outlier-owned)
    and q_theil_sen (rank-based, no weights). Every step's (a, b) is
    rounded to 1e-6 and broadcast back as a one-row relation, so the
    whole trajectory is reproducible and the oracle replays it as
    unrolled CTE stages (the logreg/kmeans discipline). Weighted moments
    use the fixed-point interior."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("x"),
        (F.col("l_extendedprice") / 1000.0).alias("y"),
    ).localCheckpoint(eager=False)
    mom = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum("x").alias("sx"), dsum("y").alias("sy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
    )
    ab = mom.selectExpr(
        "ROUND((sxy - sx * sy / n) / (sxx - sx * sx / n), 6) AS b",
        "ROUND(sy / n - (sxy - sx * sy / n) / (sxx - sx * sx / n) * (sx / n), 6) AS a",
    )
    k = 50.0
    for _ in range(3):
        j = li.crossJoin(F.broadcast(ab))
        r = F.col("y") - (F.col("a") + F.col("b") * F.col("x"))
        w = F.when(F.abs(r) <= k, 1.0).otherwise(F.lit(k) / F.abs(r))
        wm = j.agg(
            dsum(w).alias("sw"),
            dsum(w * F.col("x")).alias("swx"),
            dsum(w * F.col("y")).alias("swy"),
            dsum(w * F.col("x") * F.col("x")).alias("swxx"),
            dsum(w * F.col("x") * F.col("y")).alias("swxy"),
        )
        ab = wm.selectExpr(
            "ROUND((swxy - swx * swy / sw) / (swxx - swx * swx / sw), 6) AS b",
            "ROUND(swy / sw - (swxy - swx * swy / sw) / (swxx - swx * swx / sw) * (swx / sw), 6) AS a",
        )
    final = li.crossJoin(F.broadcast(ab))
    rr = F.col("y") - (F.col("a") + F.col("b") * F.col("x"))
    return final.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.abs(rr) > k).cast("long")).alias("n_downweighted"),
    ).select(
        "n",
        F.col("b").alias("slope"),
        F.col("a").alias("intercept"),
        "n_downweighted",
    )


@q("q_trimmed_mean")
def q_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% two-sided trimmed mean of order value per priority next to the
    raw mean — how much of each group's average is carried by its tails.
    Trim bounds are INTEGER ranks (floor(n/10) off each end, total-order
    ties on the key), so the trimmed set is exactly determined; both
    means use the fixed-point interior."""
    o = load_table(spark, sf_dir, "orders")
    wr = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wn = W.partitionBy("o_orderpriority")
    ranked = o.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(wr).alias("__rk"),
        F.count(F.lit(1)).over(wn).alias("__n"),
    )
    cut = F.floor(F.col("__n") / 10).cast("long")
    agg = ranked.groupBy("o_orderpriority").agg(
        F.max("__n").cast("long").alias("n"),
        F.round(davg("o_totalprice"), 6).alias("mean_raw"),
        F.round(
            F.sum(
                F.when(
                    (F.col("__rk") > cut) & (F.col("__rk") <= F.col("__n") - cut),
                    F.round(F.col("o_totalprice") * 1000000).cast("long"),
                ).otherwise(F.lit(0))
            ).cast("double")
            / 1000000
            / F.sum(
                ((F.col("__rk") > cut) & (F.col("__rk") <= F.col("__n") - cut)).cast("long")
            ),
            6,
        ).alias("mean_trimmed"),
    )
    return agg.select(
        "o_orderpriority", "n", "mean_raw", "mean_trimmed",
        F.round(F.col("mean_raw") - F.col("mean_trimmed"), 6).alias("tail_pull"),
    ).orderBy("o_orderpriority")


@q("q_business_days")
def q_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-first-shipment lag in BUSINESS days per priority: full
    weeks contribute 5 days, the remainder counts via a broadcast 0..6
    offset relation against the order's Monday-based start dow — exact
    integer calendar arithmetic (the engines' dow encodings differ, so
    each maps to Mon=0 explicitly). The SLA number q_fulfillment_lag
    reports in calendar days, restated the way ops actually commits.
    The lag is SIGNED: synthetic fixtures can ship before the order
    date, and both engines apply the same dividend-signed %."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    first_ship = li.groupBy("l_orderkey").agg(F.min("l_shipdate").alias("__ship"))
    j = o.join(first_ship, o["o_orderkey"] == F.col("l_orderkey"))
    base = j.select(
        "o_orderpriority",
        F.datediff(F.col("__ship").cast("date"), F.col("o_orderdate").cast("date")).alias("days"),
        ((F.dayofweek("o_orderdate") + 5) % 7).alias("mon0"),
    )
    offs = spark.createDataFrame([(i,) for i in range(7)], "i int")
    # remainder-day lookup: extra business days for each (days%7, start-dow)
    # combo — at most 49 rows, computed once and broadcast (never per-order)
    combos = base.select((F.col("days") % 7).alias("r"), "mon0").distinct()
    ext = (
        combos.crossJoin(F.broadcast(offs))
        .where(F.col("i") < F.col("r"))
        .where((F.col("mon0") + F.col("i")) % 7 <= 4)
        .groupBy("r", "mon0")
        .agg(F.count(F.lit(1)).alias("__extra"))
    )
    bd = (
        base.withColumn("r", F.col("days") % 7)
        .join(F.broadcast(ext), ["r", "mon0"], "left")
        .select(
            "o_orderpriority",
            (
                5 * F.floor(F.col("days") / 7) + F.coalesce("__extra", F.lit(0))
            ).cast("long").alias("bdays"),
        )
    )
    return (
        bd.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("bdays").cast("double") / F.count(F.lit(1)), 6).alias(
                "mean_business_days"
            ),
            F.max("bdays").alias("max_business_days"),
        )
        .orderBy("o_orderpriority")
    )


@q("q_optimal_price")
def q_optimal_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monopoly price point per brand from a linear demand fit: daily
    quantity regressed on the daily mean unit price (exact moments), then
    p* = (s·c − a)/(2s) against a unit cost of 60% of the observed mean
    price — the prescription built on top of q_elasticity's description.
    Null when the fitted demand slope isn't downward (no interior
    optimum); gap vs the current mean price says which way to move."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    daily = (
        li.join(F.broadcast(p.select("p_partkey", "p_brand")),
                li["l_partkey"] == F.col("p_partkey"))
        .groupBy("p_brand", F.date_format("l_shipdate", "yyyy-MM-dd").alias("day"))
        .agg(
            F.round(davg(F.col("l_extendedprice") / F.col("l_quantity") / 1000.0), 6).alias("price"),
            F.round(dsum("l_quantity"), 6).alias("qty"),
        )
    )
    mom = daily.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_days"),
        dsum("price").alias("sp"),
        dsum("qty").alias("sq"),
        dsum(F.col("price") * F.col("price")).alias("spp"),
        dsum(F.col("price") * F.col("qty")).alias("spq"),
    )
    out = mom.selectExpr(
        "p_brand",
        "CAST(n_days AS BIGINT) AS n_days",
        "(spq - sp * sq / n_days) / (spp - sp * sp / n_days) AS s",
        "sq / n_days - (spq - sp * sq / n_days) / (spp - sp * sp / n_days) * (sp / n_days) AS a",
        "sp / n_days AS mean_price",
    ).selectExpr(
        "p_brand",
        "n_days",
        "ROUND(s, 6) AS demand_slope",
        "ROUND(a, 6) AS demand_intercept",
        "ROUND(mean_price, 6) AS mean_price",
    ).selectExpr(
        # optimal price recomposed from the ROUNDED fit (the jb_stat
        # lesson): the deep moment expression drifts 1 ulp cross-engine
        # right at a rounding boundary; round-6 anchors are stable
        "p_brand",
        "n_days",
        "demand_slope",
        "demand_intercept",
        "mean_price",
        "ROUND(0.6D * mean_price, 6) AS unit_cost",
        "CASE WHEN demand_slope < 0.0D THEN ROUND((demand_slope * (0.6D * mean_price)"
        " - demand_intercept) / (2.0D * demand_slope), 6) END AS optimal_price",
        "CASE WHEN demand_slope < 0.0D THEN ROUND((demand_slope * (0.6D * mean_price)"
        " - demand_intercept) / (2.0D * demand_slope) - mean_price, 6) END AS price_gap",
    )
    return out.orderBy("p_brand")


@q("q_concurrency_profile")
def q_concurrency_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrency profile of the 30-min-gap sessions: peak simultaneous
    sessions from a +1/−1 boundary sweep (ends sort before starts at the
    same second — half-open intervals), plus arrival rate λ, mean session
    duration W, time-weighted mean concurrency, and the Little's-law
    ratio L/(λW) as the internal-consistency check (≈1 up to rounding) —
    the capacity-planning readout over q_session_stats' shape summary."""
    e = load_table(spark, sf_dir, "events")
    wu = W.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.col("ts").cast("long")
    newsess = (sec - F.lag(sec).over(wu) > 1800).cast("int")
    sess = (
        e.select("user_id", "ts", "event_id",
                 F.coalesce(newsess, F.lit(1)).alias("__new"))
        .withColumn("__sid", F.sum("__new").over(wu.rowsBetween(W.unboundedPreceding, 0)))
        .groupBy("user_id", "__sid")
        .agg(
            F.min(F.col("ts").cast("long")).alias("s"),
            (F.max(F.col("ts").cast("long")) + 1).alias("t"),
        )
    )
    bounds = sess.select(F.col("s").alias("at"), F.lit(1).alias("d")).unionByName(
        sess.select(F.col("t").alias("at"), F.lit(-1).alias("d"))
    )
    wb = W.orderBy("at", "d")  # d=-1 sorts before +1: end-then-start at ties
    run = bounds.withColumn(
        "conc", F.sum("d").over(wb.rowsBetween(W.unboundedPreceding, 0))
    )
    peak = run.agg(F.max("conc").cast("long").alias("peak_concurrent"))
    stats = sess.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.col("t") - F.col("s")).alias("__busy"),
        F.min("s").alias("__t0"),
        F.max("t").alias("__t1"),
    )
    j = stats.crossJoin(F.broadcast(peak))
    horizon = (F.col("__t1") - F.col("__t0")).cast("double")
    lam = F.col("n_sessions").cast("double") / horizon
    wmean = F.col("__busy").cast("double") / F.col("n_sessions")
    lmean = F.col("__busy").cast("double") / horizon
    return j.select(
        "n_sessions",
        "peak_concurrent",
        F.round(lam * 3600.0, 6).alias("arrivals_per_hour"),
        F.round(wmean, 6).alias("mean_session_s"),
        F.round(lmean, 6).alias("mean_concurrent"),
        F.round(lmean / (lam * wmean), 6).alias("littles_ratio"),
    )


@q("q_forecast_combo")
def q_forecast_combo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-combination scoreboard on the kilo-scaled daily revenue
    series: naive (lag-1), weekly (lag-7), and drift (lag-1 + mean train
    step) forecasters scored by MAE on the last 14 observed days, plus
    the inverse-validation-MAE weighted ensemble — the does-the-blend-
    beat-its-members table (weights from the 14 days before the test
    window, so the combo is honestly out-of-sample). All errors rounded
    to 1e-6 and folded in fixed point."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.date_format("l_shipdate", "yyyy-MM-dd").alias("day")).agg(
        F.round(dsum(F.col("l_extendedprice") / 1000.0), 6).alias("y")
    )
    wd = W.orderBy("day")
    base = daily.select(
        "day", "y",
        F.lag("y", 1).over(wd).alias("l1"),
        F.lag("y", 7).over(wd).alias("l7"),
        F.round(F.col("y") - F.lag("y", 1).over(wd), 6).alias("step"),
        F.row_number().over(wd).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("n"),
    )
    train_step = base.where(F.col("rn") <= F.col("n") - 28).agg(
        F.round(davg("step"), 6).alias("drift_step")
    )
    scored = base.crossJoin(F.broadcast(train_step)).select(
        "rn", "n", "y", "l1", "l7",
        F.round(F.col("l1") + F.col("drift_step"), 6).alias("fdrift"),
    ).where(F.col("l7").isNotNull())
    def mae(pred, lo, hi):
        inwin = (F.col("rn") > F.col("n") - hi) & (F.col("rn") <= F.col("n") - lo)
        err = F.when(inwin, F.round(F.abs(F.col("y") - pred) * 1000000).cast("long")).otherwise(F.lit(0))
        cnt = F.sum(inwin.cast("long"))
        return (F.sum(err).cast("double") / 1000000 / cnt)
    wts = scored.agg(
        F.round(mae(F.col("l1"), 14, 28), 6).alias("v1"),
        F.round(mae(F.col("l7"), 14, 28), 6).alias("v7"),
        F.round(mae(F.col("fdrift"), 14, 28), 6).alias("vd"),
    )
    combo = scored.crossJoin(F.broadcast(wts)).select(
        "rn", "n", "y", "l1", "l7", "fdrift", "v1", "v7", "vd",
        F.round(
            (F.col("l1") / F.col("v1") + F.col("l7") / F.col("v7") + F.col("fdrift") / F.col("vd"))
            / (1.0 / F.col("v1") + 1.0 / F.col("v7") + 1.0 / F.col("vd")),
            6,
        ).alias("fcombo"),
    )
    res = combo.agg(
        F.round(mae(F.col("l1"), 0, 14), 6).alias("naive"),
        F.round(mae(F.col("l7"), 0, 14), 6).alias("weekly"),
        F.round(mae(F.col("fdrift"), 0, 14), 6).alias("drift"),
        F.round(mae(F.col("fcombo"), 0, 14), 6).alias("combo"),
        F.max("v1").alias("w_naive_val"),
        F.max("v7").alias("w_weekly_val"),
        F.max("vd").alias("w_drift_val"),
    )
    return res.selectExpr(
        "stack(4, 'combo', combo, 'drift', drift, 'naive', naive, 'weekly', weekly)"
        " AS (model, test_mae)"
    ).orderBy("model")


@q("q_permutation_test")
def q_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation test for the A/B spend difference: 200 SEEDED pseudo-
    permutations reassign each user's arm via md5(user_id:i) (the same
    engine-shared hash discipline as q_det_sample — never an engine-local
    hash), the null distribution is the permuted |mean diff|, and
    p = (1 + #{perm ≥ obs}) / (1 + 200) — distribution-free inference
    beside q_ab_test's normal theory and q_bootstrap_ci's resampling.
    One users×permutations broadcast fan-out, exact fixed-point means."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.round(dsum("value"), 6).alias("spend")
    )
    obs = per_user.agg(
        F.round(
            davg(F.when(F.col("user_id") % 2 == 0, F.col("spend"))), 6
        ).alias("__m1"),
        F.round(
            davg(F.when(F.col("user_id") % 2 != 0, F.col("spend"))), 6
        ).alias("__m0"),
    ).select(
        F.round(F.abs(F.col("__m1") - F.col("__m0")), 6).alias("obs_diff")
    )
    perms = spark.range(1, 201).select(F.col("id").cast("int").alias("i"))
    fan = per_user.crossJoin(F.broadcast(perms))
    # arm = parity of the hash's last hex digit — string-level so both
    # engines share it verbatim (DuckDB has no conv(hex, 16, 10))
    h = F.substring(F.md5(F.concat_ws(":", F.col("user_id"), F.col("i"))), 32, 1)
    arm = F.when(h.isin("0", "2", "4", "6", "8", "a", "c", "e"), 0).otherwise(1)
    pd_ = fan.groupBy("i").agg(
        F.round(davg(F.when(arm == 1, F.col("spend"))), 6).alias("__p1"),
        F.round(davg(F.when(arm == 0, F.col("spend"))), 6).alias("__p0"),
    ).select("i", F.round(F.abs(F.col("__p1") - F.col("__p0")), 6).alias("pdiff"))
    j = pd_.crossJoin(F.broadcast(obs))
    return j.agg(
        F.max("obs_diff").alias("obs_diff"),
        F.count(F.lit(1)).alias("n_perms"),
        F.sum((F.col("pdiff") >= F.col("obs_diff")).cast("long")).alias("n_ge"),
        F.round(
            (F.sum((F.col("pdiff") >= F.col("obs_diff")).cast("long")) + 1).cast("double")
            / (F.count(F.lit(1)) + 1),
            6,
        ).alias("p_value"),
    )


@q("q_reach_curve")
def q_reach_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Channel reach curve: event types ordered by solo reach, each user
    credited to their FIRST channel in that order, cumulative distinct
    reach and share per step — the diminishing-returns table a media
    planner reads before adding the next channel (q_attribution splits
    credit; this sizes coverage). Two bounded aggregates + one broadcast
    rank relation."""
    e = load_table(spark, sf_dir, "events")
    uc = e.select("user_id", "event_type").distinct()
    solo = uc.groupBy("event_type").agg(F.countDistinct("user_id").alias("solo_reach"))
    wr = W.orderBy(F.desc("solo_reach"), F.asc("event_type"))
    ranked = solo.withColumn("rk", F.row_number().over(wr))
    first = (
        uc.join(F.broadcast(ranked.select("event_type", "rk")), "event_type")
        .groupBy("user_id")
        .agg(F.min("rk").alias("first_rk"))
    )
    inc = first.groupBy("first_rk").agg(F.count(F.lit(1)).alias("incremental_reach"))
    tot = first.agg(F.count(F.lit(1)).alias("__n_users"))
    wc = W.orderBy("rk").rowsBetween(W.unboundedPreceding, 0)
    out = (
        ranked.join(inc, ranked["rk"] == inc["first_rk"], "left")
        .withColumn("incremental_reach", F.coalesce("incremental_reach", F.lit(0)))
        .crossJoin(F.broadcast(tot))
        .select(
            "rk",
            "event_type",
            F.col("solo_reach").cast("long").alias("solo_reach"),
            F.col("incremental_reach").cast("long").alias("incremental_reach"),
            F.sum("incremental_reach").over(wc).cast("long").alias("cumulative_reach"),
            F.round(
                F.sum("incremental_reach").over(wc).cast("double") / F.col("__n_users"),
                6,
            ).alias("cumulative_share"),
        )
    )
    return out.orderBy("rk")


@q("q_round_number_bias")
def q_round_number_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-number forensics on order cents: observed share of .00 / .50
    / .99 endings vs the 1% uniform expectation, with the one-proportion
    z statistic per pattern — the psychological-pricing / fabrication
    screen beside q_benford's leading-digit law. Cents are exact
    integers (two-decimal money: ROUND(x·100) is lossless) from one
    conditional scan."""
    o = load_table(spark, sf_dir, "orders")
    cents = (F.round(F.col("o_totalprice") * 100).cast("long") % 100).alias("__c")
    base = o.select(cents)
    pats = spark.createDataFrame(
        [("c00", 0), ("c50", 50), ("c99", 99)], "pattern string, cval int"
    )
    j = base.crossJoin(F.broadcast(pats))
    g = j.groupBy("pattern").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("__c") == F.col("cval")).cast("long")).alias("n_obs"),
    )
    p0 = 0.01
    nd = F.col("n").cast("double")
    share = F.col("n_obs").cast("double") / nd
    z = (share - F.lit(p0)) / F.sqrt(F.lit(p0) * (1.0 - F.lit(p0)) / nd)
    return g.select(
        "pattern",
        F.col("n_obs"),
        F.round(share, 6).alias("obs_share"),
        F.lit(p0).alias("expected_share"),
        F.round(z, 6).alias("z_stat"),
        F.when(F.abs(z) > 3.0, 1).otherwise(0).cast("int").alias("flag"),
    ).orderBy("pattern")


@q("q_burstiness")
def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Church-Gale term burstiness: for every common term (df ≥ 50), the
    probability a document that mentions it mentions it AGAIN —
    P(tf ≥ 2 | tf ≥ 1) = df₂/df — separating topical words (bursty) from
    function words (flat), the per-term view beside q_overdispersion's
    corpus-level Fano factor. One (term, doc) count aggregate; top 20 by
    burstiness with deterministic ties."""
    d = load_table(spark, sf_dir, "documents")
    td = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    per_term = td.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum((F.col("__c") >= 2).cast("long")).alias("df2"),
        F.sum("__c").alias("tf_total"),
    )
    out = per_term.where(F.col("df") >= 50).select(
        "term",
        F.col("df").cast("long").alias("df"),
        F.col("df2").cast("long").alias("df2"),
        F.col("tf_total").cast("long").alias("tf_total"),
        F.round(F.col("df2").cast("double") / F.col("df"), 6).alias("burstiness"),
    )
    return out.orderBy(F.desc("burstiness"), F.asc("term")).limit(20)


@q("q_entropy_rate")
def q_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram entropy rate per language: H(next | prev) =
    −Σ p(w1,w2) · log2(c12/c1) over within-document adjacent token pairs —
    how predictable each language's token stream is (the conditional
    step past q_char_entropy / q_unigram_logprob; the number that sets a
    compression/perplexity floor). Exact bigram counts; per-row IEEE
    log2 with fixed-point folds."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("lang", "doc_id", F.split("text", " ").alias("t"))
    pairs = toks.select(
        "lang",
        F.explode(
            F.expr("transform(sequence(1, size(t) - 1), k -> struct(t[k - 1] AS w1, t[k] AS w2))")
        ).alias("p"),
    ).select("lang", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")).where(
        (F.col("w1") != "") & (F.col("w2") != "")
    )
    big = pairs.groupBy("lang", "w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    uni = big.groupBy("lang", "w1").agg(F.sum("c12").alias("c1"))
    tot = big.groupBy("lang").agg(F.sum("c12").alias("n"))
    j = big.join(uni, ["lang", "w1"]).join(F.broadcast(tot), "lang")
    term = (
        -(F.col("c12").cast("double") / F.col("n"))
        * F.log2(F.col("c12").cast("double") / F.col("c1"))
    )
    return (
        j.groupBy("lang")
        .agg(
            F.max("n").cast("long").alias("n_bigrams"),
            F.round(dsum(term), 6).alias("entropy_rate_bits"),
        )
        .orderBy("lang")
    )


@q("q_growth_accounting")
def q_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting: every active user classifies as new
    (first-ever week), retained (also active the prior week) or
    resurrected (returned after a gap), churn counts the prior week's
    users who went silent, and the quick ratio (new + resurrected) /
    churned says whether the audience is structurally growing — the
    operator view behind q_new_vs_returning's daily split and
    q_retention_cohort's triangle. ISO-Monday weeks (both engines
    date_trunc to Monday); one full outer join of the weekly activity
    grid against its +7-day shift."""
    e = load_table(spark, sf_dir, "events")
    a = e.select(
        "user_id",
        F.date_format(F.date_trunc("week", F.col("ts")), "yyyy-MM-dd").alias("w"),
    ).distinct()
    first = a.groupBy("user_id").agg(F.min("w").alias("first_w"))
    prv = a.select(
        "user_id",
        F.date_format(F.date_add(F.to_date("w"), 7), "yyyy-MM-dd").alias("w"),
        F.lit(1).alias("__was"),
    )
    cur = a.withColumn("__is", F.lit(1))
    j = cur.join(prv, ["user_id", "w"], "full").join(F.broadcast(first), "user_id")
    cls = j.select(
        "w",
        F.when(F.col("__is").isNull(), "churned")
        .when(F.col("w") == F.col("first_w"), "new")
        .when(F.col("__was").isNotNull(), "retained")
        .otherwise("resurrected")
        .alias("cls"),
    )
    weeks = a.select("w").distinct()
    g = (
        cls.join(weeks, "w")
        .groupBy("w")
        .agg(
            F.sum((F.col("cls") == "new").cast("long")).alias("n_new"),
            F.sum((F.col("cls") == "retained").cast("long")).alias("n_retained"),
            F.sum((F.col("cls") == "resurrected").cast("long")).alias("n_resurrected"),
            F.sum((F.col("cls") == "churned").cast("long")).alias("n_churned"),
        )
    )
    qr = F.when(
        F.col("n_churned") > 0,
        F.round(
            (F.col("n_new") + F.col("n_resurrected")).cast("double") / F.col("n_churned"), 6
        ),
    )
    return g.select(
        "w", "n_new", "n_retained", "n_resurrected", "n_churned",
        qr.alias("quick_ratio"),
    ).orderBy("w")


@q("q_gumbel_maxima")
def q_gumbel_maxima(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extreme-value analysis by block maxima: weekly maxima of the
    kilo-scaled daily revenue, Gumbel fit by method of moments
    (β = σ√6/π, μ = m̄ − γβ with the Euler-Mascheroni literal), and the
    52-week return level μ − β·ln(−ln(1 − 1/52)) — the how-bad-can-a-
    peak-week-get number beside q_var_es's tail quantiles and
    q_tail_index's Hill slope. Exact block-max moments, closed form."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.date_format("l_shipdate", "yyyy-MM-dd").alias("day")).agg(
        F.round(dsum(F.col("l_extendedprice") / 1000.0), 6).alias("y")
    )
    weekly = daily.groupBy(
        F.date_format(F.date_trunc("week", F.to_date("day")), "yyyy-MM-dd").alias("w")
    ).agg(F.max("y").alias("m"))
    mom = weekly.agg(
        F.count(F.lit(1)).alias("n_weeks"),
        dsum("m").alias("__s"),
        dsum(F.col("m") * F.col("m")).alias("__ss"),
        F.max("m").alias("max_observed"),
    )
    out = mom.selectExpr(
        "CAST(n_weeks AS BIGINT) AS n_weeks",
        "max_observed",
        "__s / n_weeks AS mean_m",
        "sqrt(__ss / n_weeks - (__s / n_weeks) * (__s / n_weeks)) AS sd_m",
    ).selectExpr(
        "n_weeks",
        "max_observed",
        "ROUND(sd_m * sqrt(6.0D) / 3.141592653589793D, 6) AS scale_beta",
        "ROUND(mean_m - 0.5772156649015329D * (sd_m * sqrt(6.0D) / 3.141592653589793D), 6)"
        " AS loc_mu",
    ).selectExpr(
        "n_weeks",
        "max_observed",
        "loc_mu",
        "scale_beta",
        # recomposed from rounded anchors (boundary-ulp discipline)
        "ROUND(loc_mu - scale_beta * ln(-ln(1.0D - 1.0D / 52.0D)), 6) AS return_level_52w",
    )
    return out


@q("q_fixed_effects")
def q_fixed_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-way fixed-effects panel regression: monthly supplier panel of
    unit price (kilo) on quantity (hecto), both within-transformed
    (x − x̄_entity − x̄_time + x̄) before the slope — supplier- and
    month-level confounders cancel, the panel-data step past
    q_ols_inference's pooled fit and q_did's two groups × two periods.
    Entity/time/grand means are ROUNDED anchors broadcast back; the
    final slope is one fixed-point moment fold."""
    li = load_table(spark, sf_dir, "lineitem")
    panel = li.where(F.col("l_suppkey") <= 30).groupBy(
        F.col("l_suppkey").alias("ent"),
        F.date_format("l_shipdate", "yyyy-MM").alias("t"),
    ).agg(
        F.round(davg(F.col("l_extendedprice") / F.col("l_quantity") / 1000.0), 6).alias("y"),
        F.round(dsum(F.col("l_quantity") / 100.0), 6).alias("x"),
    )
    ent_m = panel.groupBy("ent").agg(
        F.round(davg("y"), 6).alias("ye"), F.round(davg("x"), 6).alias("xe")
    )
    t_m = panel.groupBy("t").agg(
        F.round(davg("y"), 6).alias("yt"), F.round(davg("x"), 6).alias("xt")
    )
    g_m = panel.agg(
        F.round(davg("y"), 6).alias("yg"), F.round(davg("x"), 6).alias("xg")
    )
    j = (
        panel.join(F.broadcast(ent_m), "ent")
        .join(F.broadcast(t_m), "t")
        .crossJoin(F.broadcast(g_m))
    )
    yd = F.round(F.col("y") - F.col("ye") - F.col("yt") + F.col("yg"), 6)
    xd = F.round(F.col("x") - F.col("xe") - F.col("xt") + F.col("xg"), 6)
    mom = j.agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.countDistinct("ent").alias("n_entities"),
        F.countDistinct("t").alias("n_periods"),
        dsum(xd * yd).alias("__sxy"),
        dsum(xd * xd).alias("__sxx"),
        dsum(yd * yd).alias("__syy"),
    )
    beta = F.col("__sxy") / F.col("__sxx")
    r2w = F.col("__sxy") * F.col("__sxy") / (F.col("__sxx") * F.col("__syy"))
    return mom.select(
        F.col("n_obs").cast("long").alias("n_obs"),
        F.col("n_entities").cast("long").alias("n_entities"),
        F.col("n_periods").cast("long").alias("n_periods"),
        F.round(beta, 6).alias("beta_within"),
        F.round(r2w, 6).alias("r2_within"),
    )


@q("q_sourcing_risk")
def q_sourcing_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-sourcing risk report: parts bucketed by distinct supplier
    count (1 / 2 / 3+), with part counts and the spend share flowing
    through each bucket — the procurement continuity metric (how much
    revenue rides on parts with no second source). One part-level
    aggregate; spend in fixed point."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.countDistinct("l_suppkey").alias("__ns"),
        dsum(F.col("l_extendedprice") / 1000.0).alias("__spend"),
    )
    bucket = (
        F.when(F.col("__ns") == 1, "1_single")
        .when(F.col("__ns") == 2, "2_dual")
        .otherwise("3_plus")
    )
    tot = per_part.agg(
        F.round(
            F.sum(F.round(F.col("__spend") * 1000000).cast("long")).cast("double") / 1000000,
            6,
        ).alias("__t")
    )
    g = per_part.groupBy(bucket.alias("sourcing")).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(
            F.sum(F.round(F.col("__spend") * 1000000).cast("long")).cast("double") / 1000000,
            6,
        ).alias("spend_k"),
    )
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            "sourcing",
            "n_parts",
            "spend_k",
            F.round(F.col("spend_k") / F.col("__t"), 6).alias("spend_share"),
        )
        .orderBy("sourcing")
    )


@q("q_wilcoxon")
def q_wilcoxon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test on PAIRED per-user spend (pre vs post
    the mid-month cut): nonzero differences rank by |d| with the
    doubled tie-averaged ranks (exact integers), W⁺ folds as a long,
    z = (W⁺ − n(n+1)/4)/√(n(n+1)(2n+1)/24) — the paired-design member
    of the rank family (q_kruskal_wallis compares groups; this compares
    each user to THEMSELF, killing between-user variance)."""
    e = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    per = e.groupBy("user_id").agg(
        F.round(dsum(F.when(F.col("ts") < cut, F.col("value")).otherwise(0.0)), 6).alias("pre"),
        F.round(dsum(F.when(F.col("ts") >= cut, F.col("value")).otherwise(0.0)), 6).alias("post"),
    )
    d = per.select(
        F.round(F.col("post") - F.col("pre"), 6).alias("d")
    ).where(F.col("d") != 0.0)
    ad = d.select("d", F.abs(F.col("d")).alias("ad"))
    wr = W.orderBy("ad")
    tr = W.partitionBy("ad")
    ranked = ad.select(
        "d",
        (2 * F.rank().over(wr) + F.count(F.lit(1)).over(tr) - 1).cast("long").alias("r2"),
    )
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.when(F.col("d") > 0, F.col("r2")).otherwise(F.lit(0))).alias("__w2"),
    )
    out = agg.selectExpr(
        "CAST(n_pairs AS BIGINT) AS n_pairs",
        "CAST(__w2 AS DOUBLE) / 2.0D AS w_plus",
        "n_pairs * (n_pairs + 1) / 4.0D AS mu_w",
        "sqrt(n_pairs * (n_pairs + 1) * (2 * n_pairs + 1) / 24.0D) AS sd_w",
    ).selectExpr(
        "n_pairs",
        "ROUND(w_plus, 6) AS w_plus",
        "ROUND((w_plus - mu_w) / sd_w, 6) AS z_stat",
        "CAST(CASE WHEN abs((w_plus - mu_w) / sd_w) > 1.96D THEN 1 ELSE 0 END AS INT)"
        " AS significant",
    )
    return out


@q("q_friedman")
def q_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test over complete blocks: each user (block) ranks the 5
    event types by their spend, χ²_F = 12/(nk(k+1))·ΣR_j² − 3n(k+1) from
    exact doubled-rank sums — repeated-measures ANOVA's rank-based
    sibling (the between-user level differences that inflate q_anova
    cancel inside each block). Only complete blocks (all 5 types) enter;
    tie-averaged ranks via the doubled-rank trick."""
    e = load_table(spark, sf_dir, "events")
    cell = e.groupBy("user_id", "event_type").agg(
        F.round(dsum("value"), 6).alias("v")
    )
    k = 5
    full = cell.groupBy("user_id").agg(F.count(F.lit(1)).alias("__kt")).where(
        F.col("__kt") == k
    )
    c = cell.join(full.select("user_id"), "user_id")
    wr = W.partitionBy("user_id").orderBy("v", "event_type")
    tr = W.partitionBy("user_id", "v")
    ranked = c.select(
        "user_id",
        "event_type",
        (2 * F.rank().over(wr) + F.count(F.lit(1)).over(tr) - 1).cast("long").alias("r2"),
    )
    rj = ranked.groupBy("event_type").agg(
        F.sum("r2").alias("__rs2"), F.count(F.lit(1)).alias("__n")
    )
    tot = rj.agg(F.max("__n").alias("n_blocks"))
    srj = rj.crossJoin(F.broadcast(tot)).agg(
        F.max("n_blocks").cast("long").alias("n_blocks"),
        dsum(
            F.col("__rs2").cast("double") * F.col("__rs2") / 4.0 / 1000.0
        ).alias("__sr_k"),
    )
    out = srj.selectExpr(
        "n_blocks",
        f"CAST({k} AS BIGINT) AS k",
        f"ROUND(12.0D * (__sr_k * 1000.0D) / (n_blocks * {k} * ({k} + 1))"
        f" - 3.0D * n_blocks * ({k} + 1), 6) AS chi2_f",
        f"CAST(CASE WHEN 12.0D * (__sr_k * 1000.0D) / (n_blocks * {k} * ({k} + 1))"
        f" - 3.0D * n_blocks * ({k} + 1) > 9.488D THEN 1 ELSE 0 END AS INT) AS flag_reject",
    )
    return out


@q("q_icc")
def q_icc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intraclass correlation ICC(1) of order value within priority
    classes: (MSB − MSW)/(MSB + (n₀−1)·MSW) with the unbalanced-design
    n₀ = (N − Σnᵢ²/N)/(k−1) — how much of the variance lives BETWEEN
    classes (the reliability/clustering readout that says whether the
    grouping matters at all, feeding the design-effect for q_ab_test
    sample sizing). Pure composition over q_anova's exact moments."""
    from fortune_500_financial_insights_pipeline_spark.operators.stats import anova_oneway

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", (F.col("o_totalprice") / 1000.0).alias("val")
    )
    base = anova_oneway(o, "val", "o_orderpriority")
    sizes = o.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("__ng")).agg(
        F.sum("__ng").alias("__N"),
        F.sum(F.col("__ng") * F.col("__ng")).alias("__sn2"),
        F.count(F.lit(1)).alias("__k"),
    )
    j = base.crossJoin(F.broadcast(sizes))
    out = j.selectExpr(
        "n",
        "k",
        "ss_between / (k - 1) AS msb",
        "ss_within / (n - k) AS msw",
        "(CAST(__N AS DOUBLE) - CAST(__sn2 AS DOUBLE) / __N) / (CAST(__k AS DOUBLE) - 1.0D)"
        " AS n0",
    ).selectExpr(
        "n",
        "k",
        "ROUND(msb, 6) AS msb",
        "ROUND(msw, 6) AS msw",
        "ROUND(n0, 6) AS n0",
        "ROUND((msb - msw) / (msb + (n0 - 1.0D) * msw), 6) AS icc1",
    )
    return out


@q("q_raking")
def q_raking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survey raking (iterative proportional fitting): a 1-in-3 customer
    sample gets cell weights adjusted over two nation/segment sweeps so
    the weighted margins match the full population — the
    post-stratification step survey statistics runs before any weighted
    estimate (q_weighted_sample draws; this CALIBRATES). Weights live on
    the ≤125 (nation, segment) cells, every step re-rounds to 1e-6, and
    the readout is the per-segment margin fit plus the worst remaining
    nation-margin error."""
    c = load_table(spark, sf_dir, "customer")
    pop_n = c.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("pn")
    )
    pop_s = c.groupBy(F.col("c_mktsegment").alias("sg")).agg(
        F.count(F.lit(1)).alias("ps")
    )
    cells = (
        c.where(F.col("c_custkey") % 3 == 0)
        .groupBy(F.col("c_nationkey").alias("nk"), F.col("c_mktsegment").alias("sg"))
        .agg(F.count(F.lit(1)).alias("sc"))
        .withColumn("w", F.lit(1.0))
    )
    for dim in ("nk", "sg", "nk", "sg"):
        pop = pop_n if dim == "nk" else pop_s
        tgt = "pn" if dim == "nk" else "ps"
        marg = cells.groupBy(dim).agg(
            (F.sum(F.round(F.col("sc") * F.col("w") * 1000000).cast("long")).cast("double")
             / 1000000).alias("__m")
        )
        cells = (
            cells.join(F.broadcast(marg), dim)
            .join(F.broadcast(pop), dim)
            .withColumn(
                "w",
                F.round(F.col("w") * (F.col(tgt) / F.col("__m")), 6),
            )
            .select("nk", "sg", "sc", "w")
        )
    seg_fit = (
        cells.groupBy("sg")
        .agg(
            (F.sum(F.round(F.col("sc") * F.col("w") * 1000000).cast("long")).cast("double")
             / 1000000).alias("__rw")
        )
        .join(F.broadcast(pop_s), "sg")
    )
    nat_err = (
        cells.groupBy("nk")
        .agg(
            (F.sum(F.round(F.col("sc") * F.col("w") * 1000000).cast("long")).cast("double")
             / 1000000).alias("__rw")
        )
        .join(F.broadcast(pop_n), "nk")
        .agg(
            F.round(
                F.max(F.abs(F.col("__rw") - F.col("pn")) / F.col("pn")), 6
            ).alias("max_nation_rel_err")
        )
    )
    return (
        seg_fit.crossJoin(F.broadcast(nat_err))
        .select(
            F.col("sg").alias("segment"),
            F.col("ps").cast("long").alias("pop_n"),
            F.round("__rw", 6).alias("raked_weight"),
            F.round(F.abs(F.col("__rw") - F.col("ps")) / F.col("ps"), 6).alias(
                "segment_rel_err"
            ),
            "max_nation_rel_err",
        )
        .orderBy("segment")
    )


@q("q_hotelling")
def q_hotelling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hotelling's T² two-sample test on the (pre, post) spend vector:
    even- vs odd-id users compared on BOTH coordinates at once through
    the pooled 2×2 covariance inverse (closed form) — the multivariate
    step past q_ab_test (one metric) that respects the pre/post
    correlation instead of running two dependent t tests. Exact moments;
    χ²(2) large-sample cut 5.991."""
    e = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    per = e.groupBy("user_id").agg(
        F.round(dsum(F.when(F.col("ts") < cut, F.col("value")).otherwise(0.0)), 6).alias("x"),
        F.round(dsum(F.when(F.col("ts") >= cut, F.col("value")).otherwise(0.0)), 6).alias("y"),
    ).withColumn("g", (F.col("user_id") % 2 == 0).cast("int"))
    mom = per.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("x").alias("sx"),
        dsum("y").alias("sy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
        dsum(F.col("y") * F.col("y")).alias("syy"),
    )
    a = mom.where(F.col("g") == 1).select(
        *[F.col(c).alias(c + "1") for c in ("n", "sx", "sy", "sxx", "sxy", "syy")]
    )
    b = mom.where(F.col("g") == 0).select(
        *[F.col(c).alias(c + "0") for c in ("n", "sx", "sy", "sxx", "sxy", "syy")]
    )
    j = a.crossJoin(F.broadcast(b))
    out = j.selectExpr(
        "CAST(n1 AS BIGINT) AS n_treat",
        "CAST(n0 AS BIGINT) AS n_control",
        "sx1 / n1 - sx0 / n0 AS dx",
        "sy1 / n1 - sy0 / n0 AS dy",
        "((sxx1 - sx1 * sx1 / n1) + (sxx0 - sx0 * sx0 / n0)) / (n1 + n0 - 2) AS cxx",
        "((sxy1 - sx1 * sy1 / n1) + (sxy0 - sx0 * sy0 / n0)) / (n1 + n0 - 2) AS cxy",
        "((syy1 - sy1 * sy1 / n1) + (syy0 - sy0 * sy0 / n0)) / (n1 + n0 - 2) AS cyy",
    ).selectExpr(
        "n_treat",
        "n_control",
        "ROUND(dx, 6) AS diff_pre",
        "ROUND(dy, 6) AS diff_post",
        "CAST(n_treat AS DOUBLE) * n_control / (n_treat + n_control)"
        " * (dx * (cyy * dx - cxy * dy) + dy * (cxx * dy - cxy * dx))"
        " / (cxx * cyy - cxy * cxy) AS t2_raw",
    ).selectExpr(
        "n_treat",
        "n_control",
        "diff_pre",
        "diff_post",
        "ROUND(t2_raw, 6) AS t2",
        "CAST(CASE WHEN t2_raw > 5.991D THEN 1 ELSE 0 END AS INT) AS flag_reject",
    )
    return out


@q("q_disparate_impact")
def q_disparate_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four-fifths-rule screen: the favorable-outcome rate (deep
    discount, ≥ 8%) per customer nation vs the best-treated nation's
    rate — any group under 80% of the reference flags for disparate
    impact (the compliance screen beside q_exposure_fairness's ranking
    view). Exact rates from one scan; reference picked deterministically
    (max rate, key tiebreak)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    j = (
        li.join(o.select("o_orderkey", "o_custkey"),
                li["l_orderkey"] == F.col("o_orderkey"))
        .join(F.broadcast(c.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
    )
    rates = j.groupBy(F.col("c_nationkey").alias("nation")).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum((F.col("l_discount") >= 0.08).cast("long")).alias("n_favorable"),
    ).withColumn(
        "rate",
        F.round(F.col("n_favorable").cast("double") / F.col("n_lines"), 6),
    )
    ref = rates.orderBy(F.desc("rate"), F.asc("nation")).limit(1).select(
        F.col("rate").alias("ref_rate"), F.col("nation").alias("ref_nation")
    )
    out = rates.crossJoin(F.broadcast(ref)).select(
        "nation",
        "n_lines",
        "n_favorable",
        "rate",
        "ref_nation",
        F.round(F.col("rate") / F.col("ref_rate"), 6).alias("impact_ratio"),
        F.when(F.col("rate") / F.col("ref_rate") < 0.8, 1).otherwise(0)
        .cast("int").alias("flag_disparate"),
    )
    return out.orderBy("nation")


@q("q_empirical_bayes")
def q_empirical_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrinkage of per-brand mean order-line value: each
    brand's raw mean pulls toward the grand mean by B = (σ²/nᵢ)/(τ² +
    σ²/nᵢ), with the variance components (within σ², between τ² =
    (MSB−MSW)/n₀) estimated from the one-way ANOVA decomposition — the
    leaderboard that stops small-n brands from topping the table on
    noise (the estimation twin of q_topk_stability's diagnosis). All
    components from exact moments; shrinkage per brand in closed form."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p.select("p_partkey", "p_brand")),
                li["l_partkey"] == F.col("p_partkey"))
    val = (F.col("l_extendedprice") / 1000.0)
    g = j.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("ng"),
        dsum(val).alias("sg"),
        dsum(val * val).alias("ssg"),
    )
    fsum = lambda c: (F.sum(F.round(F.col(c) * 1000000).cast("long")).cast("double") / 1000000)
    tot = g.agg(
        F.sum("ng").alias("n"),
        fsum("sg").alias("s"),
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("ng") * F.col("ng")).alias("sn2"),
    )
    within = g.select(
        (F.col("ssg") - F.col("sg") * F.col("sg") / F.col("ng").cast("double")).alias("t")
    ).agg(dsum("t").alias("ssw"))
    between = (
        g.crossJoin(F.broadcast(tot))
        .select(
            (F.col("ng").cast("double")
             * (F.col("sg") / F.col("ng") - F.col("s") / F.col("n"))
             * (F.col("sg") / F.col("ng") - F.col("s") / F.col("n"))).alias("t")
        )
        .agg(dsum("t").alias("ssb"))
    )
    comp = (
        tot.crossJoin(F.broadcast(within))
        .crossJoin(F.broadcast(between))
        .selectExpr(
            "s / n AS grand",
            "ssw / (n - k) AS s2_within",
            "(n - CAST(sn2 AS DOUBLE) / n) / (k - 1) AS n0",
            "ssb / (k - 1) AS msb",
            "ssw / (n - k) AS msw",
        )
        .selectExpr(
            "ROUND(grand, 6) AS grand_mean",
            "ROUND(s2_within, 6) AS s2_within",
            "ROUND(CASE WHEN (msb - msw) / n0 > 0.0D THEN (msb - msw) / n0 ELSE 0.0D END, 6)"
            " AS tau2",
        )
    )
    out = g.crossJoin(F.broadcast(comp)).selectExpr(
        "p_brand",
        "CAST(ng AS BIGINT) AS n_lines",
        "ROUND(sg / ng, 6) AS raw_mean",
        "grand_mean",
        "ROUND((s2_within / ng) / (tau2 + s2_within / ng), 6) AS shrink_b",
    ).selectExpr(
        "p_brand",
        "n_lines",
        "raw_mean",
        "grand_mean",
        "shrink_b",
        "ROUND(grand_mean + (1.0D - shrink_b) * (raw_mean - grand_mean), 6) AS eb_mean",
    )
    return out.orderBy("p_brand")


@q("q_tail_dependence")
def q_tail_dependence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical tail dependence between the two supplier price series:
    λ_U = P(y exceeds its 90% quantile | x exceeds its own) and the
    mirrored λ_L at the 10% tail — do extremes co-occur, the dependence
    question Pearson/Spearman miss entirely (they average over the
    middle). Interpolated per-series quantile thresholds, exact joint
    counts; independence baseline is the marginal tail mass 0.1."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.where(F.col("l_suppkey").isin(1, 2)).groupBy(
        "l_suppkey", F.date_format("l_shipdate", "yyyy-MM-dd").alias("day")
    ).agg(F.round(davg(F.col("l_extendedprice") / 1000.0), 6).alias("px"))
    a = daily.where(F.col("l_suppkey") == 1).select("day", F.col("px").alias("x"))
    b = daily.where(F.col("l_suppkey") == 2).select("day", F.col("px").alias("y"))
    pairs = a.join(b, "day")
    th = pairs.agg(
        F.round(F.percentile("x", F.lit(0.9)), 6).alias("tx_hi"),
        F.round(F.percentile("y", F.lit(0.9)), 6).alias("ty_hi"),
        F.round(F.percentile("x", F.lit(0.1)), 6).alias("tx_lo"),
        F.round(F.percentile("y", F.lit(0.1)), 6).alias("ty_lo"),
    )
    j = pairs.crossJoin(F.broadcast(th))
    g = j.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum((F.col("x") >= F.col("tx_hi")).cast("long")).alias("__nx_hi"),
        F.sum(((F.col("x") >= F.col("tx_hi")) & (F.col("y") >= F.col("ty_hi"))).cast("long")).alias("__nj_hi"),
        F.sum((F.col("x") <= F.col("tx_lo")).cast("long")).alias("__nx_lo"),
        F.sum(((F.col("x") <= F.col("tx_lo")) & (F.col("y") <= F.col("ty_lo"))).cast("long")).alias("__nj_lo"),
    )
    return g.select(
        "n_days",
        F.col("__nx_hi").alias("n_upper_x"),
        F.col("__nj_hi").alias("n_joint_upper"),
        F.round(F.col("__nj_hi").cast("double") / F.col("__nx_hi"), 6).alias("lambda_upper"),
        F.round(F.col("__nj_lo").cast("double") / F.col("__nx_lo"), 6).alias("lambda_lower"),
        F.lit(0.1).alias("independence_baseline"),
    )


@q("q_nested_anova")
def q_nested_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested (hierarchical) ANOVA: order value decomposed as region +
    nation-WITHIN-region + residual — the variance ladder for a nested
    design (region/nation is not a crossed grid, so q_two_way_anova's
    interaction is the wrong model). F_region tests against the nation
    mean square (the correct nested denominator), F_nation against the
    within. Exact nation-level moments; region sums are fixed-point
    folds of nation sums."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    j = (
        o.join(F.broadcast(c.select("c_custkey", "c_nationkey")),
               o["o_custkey"] == F.col("c_custkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_regionkey")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_regionkey").alias("rg"),
            F.col("c_nationkey").alias("nt"),
            (F.col("o_totalprice") / 1000.0).alias("val"),
        )
    )
    nat = j.groupBy("rg", "nt").agg(
        F.count(F.lit(1)).alias("nn"),
        dsum("val").alias("sn"),
        dsum(F.col("val") * F.col("val")).alias("ssn"),
    )
    fsum = lambda c_: (F.sum(F.round(F.col(c_) * 1000000).cast("long")).cast("double") / 1000000)
    reg = nat.groupBy("rg").agg(
        F.sum("nn").alias("nr"), fsum("sn").alias("sr"), F.count(F.lit(1)).alias("kn_r")
    )
    tot = reg.agg(
        F.sum("nr").alias("n"),
        fsum("sr").alias("s"),
        F.count(F.lit(1)).alias("kr"),
        F.sum("kn_r").alias("kn"),
    )
    ss_region = (
        reg.crossJoin(F.broadcast(tot))
        .select(
            (F.col("nr").cast("double")
             * (F.col("sr") / F.col("nr") - F.col("s") / F.col("n"))
             * (F.col("sr") / F.col("nr") - F.col("s") / F.col("n"))).alias("t")
        )
        .agg(dsum("t").alias("ss_region"))
    )
    ss_nation = (
        nat.join(F.broadcast(reg.select("rg", "nr", "sr")), "rg")
        .select(
            (F.col("nn").cast("double")
             * (F.col("sn") / F.col("nn") - F.col("sr") / F.col("nr"))
             * (F.col("sn") / F.col("nn") - F.col("sr") / F.col("nr"))).alias("t")
        )
        .agg(dsum("t").alias("ss_nation"))
    )
    ssq = nat.agg(fsum("ssn").alias("ssq"))
    out = (
        tot.crossJoin(F.broadcast(ss_region))
        .crossJoin(F.broadcast(ss_nation))
        .crossJoin(F.broadcast(ssq))
        .selectExpr(
            "CAST(n AS BIGINT) AS n",
            "CAST(kr AS BIGINT) AS k_regions",
            "CAST(kn AS BIGINT) AS k_nations",
            "ROUND(ss_region, 6) AS ss_region",
            "ROUND(ss_nation, 6) AS ss_nation",
            "ROUND(ssq - s * s / n - ss_region - ss_nation, 6) AS ss_within",
            "ROUND((ss_region / (kr - 1)) / (ss_nation / (kn - kr)), 6) AS f_region",
            "ROUND((ss_nation / (kn - kr))"
            " / ((ssq - s * s / n - ss_region - ss_nation) / (n - kn)), 6) AS f_nation",
        )
    )
    return out


@q("q_sprt")
def q_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's SPRT over the user stream: users ordered by first-event
    time contribute conversion log-likelihood-ratio steps for H₁ p=0.95
    vs H₀ p=0.85, the cumulative LLR walks until it crosses ±ln(19)
    (α=β=0.05) — FULLY sequential monitoring, the continuous sibling of
    q_obrien_fleming's scheduled looks (decide after EVERY user, still
    error-controlled). Round-9 per-step LLR keeps the walk exact; first
    crossing found by one rank over the crossing rows."""
    e = load_table(spark, sf_dir, "events")
    per = e.groupBy("user_id").agg(
        F.min("ts").alias("__first"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("conv"),
    )
    import math as _math

    llr_yes = round(_math.log(0.95 / 0.85) * 1e9)
    llr_no = round(_math.log(0.05 / 0.15) * 1e9)
    bound = round(_math.log(19.0) * 1e9)
    wo = W.orderBy("__first", "user_id")
    walk = per.select(
        "user_id",
        "conv",
        F.row_number().over(wo).alias("rn"),
        F.sum(
            F.when(F.col("conv") == 1, F.lit(llr_yes)).otherwise(F.lit(llr_no))
        ).over(wo.rowsBetween(W.unboundedPreceding, 0)).alias("__llr9"),
    )
    crossed = walk.where(
        (F.col("__llr9") >= bound) | (F.col("__llr9") <= -bound)
    )
    firstx = (
        crossed.orderBy("rn").limit(1)
        .select(
            F.col("rn").alias("crossed_at"),
            F.round(F.col("__llr9").cast("double") / 1e9, 6).alias("llr_at_cross"),
            F.when(F.col("__llr9") >= bound, "accept_h1")
            .otherwise("accept_h0")
            .alias("decision"),
        )
    )
    tot = walk.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(F.max("__llr9").cast("double") / 1e9, 6).alias("max_llr"),
        F.round(F.min("__llr9").cast("double") / 1e9, 6).alias("min_llr"),
    )
    return tot.join(firstx, F.lit(True), "left").select(
        "n_users", "max_llr", "min_llr",
        F.col("crossed_at").cast("long").alias("crossed_at"),
        "llr_at_cross",
        F.coalesce("decision", F.lit("continue")).alias("decision"),
    )


@q("q_oaxaca")
def q_oaxaca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oaxaca-Blinder two-fold decomposition of the even-vs-odd user
    spend gap: total gap = (participation gap)·mean severity +
    mean participation·(severity gap) — is the difference about WHO
    purchases or HOW MUCH purchasers spend (the hurdle-model question
    q_ab_test's single mean hides). Exact counts and fixed-point means;
    reference weights are the pooled averages (symmetric two-fold)."""
    e = load_table(spark, sf_dir, "events")
    per = e.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("any_p"),
        F.round(
            dsum(F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)),
            6,
        ).alias("pspend"),
    ).withColumn("g", (F.col("user_id") % 2 == 0).cast("int"))
    mom = per.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("any_p").alias("np"),
        dsum(F.when(F.col("any_p") == 1, F.col("pspend"))).alias("sp"),
    )
    a = mom.where(F.col("g") == 1).select(
        F.col("n").alias("n1"), F.col("np").alias("np1"), F.col("sp").alias("sp1")
    )
    b = mom.where(F.col("g") == 0).select(
        F.col("n").alias("n0"), F.col("np").alias("np0"), F.col("sp").alias("sp0")
    )
    out = a.crossJoin(F.broadcast(b)).selectExpr(
        "CAST(n1 AS BIGINT) AS n_treat",
        "CAST(n0 AS BIGINT) AS n_control",
        "CAST(np1 AS DOUBLE) / n1 AS p1",
        "CAST(np0 AS DOUBLE) / n0 AS p0",
        "sp1 / np1 AS s1",
        "sp0 / np0 AS s0",
    ).selectExpr(
        "n_treat",
        "n_control",
        "ROUND(p1 - p0, 6) AS participation_gap",
        "ROUND(s1 - s0, 6) AS severity_gap",
        "ROUND(p1 * s1 - p0 * s0, 6) AS total_gap",
        "ROUND((p1 - p0) * ((s1 + s0) / 2.0D), 6) AS gap_from_participation",
        "ROUND(((p1 + p0) / 2.0D) * (s1 - s0), 6) AS gap_from_severity",
    )
    return out


@q("q_weibull_fit")
def q_weibull_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weibull fit of time-to-first-purchase by median-rank regression:
    uncensored durations rank up, F̂ᵢ = (i − 0.3)/(n + 0.4) (Bernard's
    approximation), and OLS of ln(−ln(1 − F̂)) on ln(t) gives shape k
    (slope) and scale λ = exp(−intercept/k) — the parametric layer over
    q_kaplan_meier/q_nelson_aalen's nonparametric curves (k < 1 means
    conversion hazard FALLS with time: convert-early-or-never). Exact
    integer ranks; per-row IEEE ln with fixed-point moment folds."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min("ts").alias("__first"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("__fp"),
    )
    dur = per_user.where(F.col("__fp").isNotNull()).select(
        (
            F.col("__fp").cast("long") - F.col("__first").cast("long")
        ).alias("t_s"),
        F.col("user_id"),
    ).where(F.col("t_s") > 0)
    wr = W.orderBy("t_s", "user_id")
    ranked = dur.select(
        "t_s",
        F.row_number().over(wr).alias("i"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("n"),
    )
    xy = ranked.selectExpr(
        "ln(CAST(t_s AS DOUBLE)) AS x",
        "ln(-ln(1.0D - (i - 0.3D) / (n + 0.4D))) AS y",
        "n",
    )
    mom = xy.agg(
        F.max("n").cast("long").alias("n_events"),
        dsum("x").alias("sx"),
        dsum("y").alias("sy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
    )
    out = mom.selectExpr(
        "n_events",
        "(sxy - sx * sy / n_events) / (sxx - sx * sx / n_events) AS k_raw",
        "sy / n_events - (sxy - sx * sy / n_events) / (sxx - sx * sx / n_events)"
        " * (sx / n_events) AS b_raw",
    ).selectExpr(
        "n_events",
        "ROUND(k_raw, 6) AS shape_k",
        "ROUND(exp(-b_raw / k_raw), 6) AS scale_lambda_s",
        "CAST(CASE WHEN k_raw < 1.0D THEN 1 ELSE 0 END AS INT) AS decreasing_hazard",
    )
    return out


@q("q_nbinom_fit")
def q_nbinom_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative-binomial fit of per-user event counts by method of
    moments: p = m/v, r = m²/(v − m) when overdispersed (v > m) — the
    parametric answer to q_overdispersion's Fano flag (WHICH NB explains
    the clumping), feeding expected-count tails for capacity planning.
    Exact count moments; null parameters when the data is actually
    Poisson-or-under."""
    e = load_table(spark, sf_dir, "events")
    per = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    mom = per.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    )
    out = mom.selectExpr(
        "CAST(n_users AS BIGINT) AS n_users",
        "CAST(s AS DOUBLE) / n_users AS m",
        "CAST(ss AS DOUBLE) / n_users - (CAST(s AS DOUBLE) / n_users)"
        " * (CAST(s AS DOUBLE) / n_users) AS v",
    ).selectExpr(
        "n_users",
        "ROUND(m, 6) AS mean_count",
        "ROUND(v, 6) AS var_count",
        "ROUND(v / m, 6) AS fano",
        "CASE WHEN v > m THEN ROUND(m / v, 6) END AS p_hat",
        "CASE WHEN v > m THEN ROUND(m * m / (v - m), 6) END AS r_hat",
    )
    return out


@q("q_capture_recapture")
def q_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lincoln-Petersen / Chapman population estimate: week-1 actives are
    the marked sample, week-2 actives the recapture, and the overlap
    sizes the estimate N̂ = (n₁+1)(n₂+1)/(m+1) − 1 — the
    how-many-users-exist-that-we-never-saw estimator (the same algebra
    that sizes hidden duplicate populations from two dedup passes).
    Exact set sizes from one scan."""
    e = load_table(spark, sf_dir, "events")
    w1 = F.lit("2024-01-08 00:00:00").cast("timestamp")
    w2 = F.lit("2024-01-15 00:00:00").cast("timestamp")
    per = e.groupBy("user_id").agg(
        F.max((F.col("ts") < w1).cast("int")).alias("in1"),
        F.max(((F.col("ts") >= w1) & (F.col("ts") < w2)).cast("int")).alias("in2"),
    )
    g = per.agg(
        F.sum("in1").cast("long").alias("n1"),
        F.sum("in2").cast("long").alias("n2"),
        F.sum((F.col("in1") + F.col("in2") == 2).cast("long")).alias("m"),
        F.count(F.lit(1)).alias("n_observed_total"),
    )
    nhat = (
        (F.col("n1") + 1).cast("double") * (F.col("n2") + 1) / (F.col("m") + 1) - 1.0
    )
    return g.select(
        "n1", "n2", "m", "n_observed_total",
        F.round(nhat, 6).alias("n_hat_chapman"),
        F.round(nhat - F.col("n_observed_total"), 6).alias("est_unseen"),
    )


@q("q_german_tank")
def q_german_tank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """German-tank (serial-number) estimator over the order keys seen in
    a 1-in-50 audit sample: N̂ = max·(1 + 1/k) − 1 with the UMVU gap
    logic — estimate the true key-space size from a sample's maximum,
    the sequence-cardinality trick for estimating table sizes from
    partial scans. Exact sample max/count; truth column included since
    the fixture knows it."""
    o = load_table(spark, sf_dir, "orders")
    samp = o.where(F.col("o_orderkey") % 50 == 7).agg(
        F.count(F.lit(1)).alias("k"),
        F.max("o_orderkey").alias("max_seen"),
    )
    truth = o.agg(F.max("o_orderkey").alias("true_max"))
    j = samp.crossJoin(F.broadcast(truth))
    nhat = (
        F.col("max_seen").cast("double")
        * (1.0 + 1.0 / F.col("k"))
        - 1.0
    )
    return j.select(
        "k", "max_seen", "true_max",
        F.round(nhat, 6).alias("n_hat"),
        F.round(
            F.abs(nhat - F.col("true_max")) / F.col("true_max"), 6
        ).alias("rel_err"),
    )


@q("q_missing_mass")
def q_missing_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing missing mass per language: P₀ = n₁/N (singleton share
    of token occurrences) estimates how much probability the corpus has
    NEVER seen — the smoothing/coverage number behind every language
    model's OOV budget (q_heaps_curve grows vocabulary; this prices the
    unseen remainder). Exact term-frequency histogram from one scan."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("lang", F.explode(F.split("text", " ")).alias("term"))
        .where(F.col("term") != "")
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    g = tf.groupBy("lang").agg(
        F.count(F.lit(1)).alias("vocab"),
        F.sum("c").cast("long").alias("n_tokens"),
        F.sum((F.col("c") == 1).cast("long")).alias("n_singletons"),
        F.sum((F.col("c") == 2).cast("long")).alias("n_doubletons"),
    )
    return g.select(
        "lang",
        F.col("vocab").cast("long").alias("vocab"),
        "n_tokens",
        "n_singletons",
        F.round(
            F.col("n_singletons").cast("double") / F.col("n_tokens"), 6
        ).alias("missing_mass_p0"),
        F.when(
            F.col("n_doubletons") > 0,
            F.round(
                F.col("n_singletons").cast("double") * F.col("n_singletons")
                / (2.0 * F.col("n_doubletons")),
                6,
            ),
        ).alias("chao1_unseen_vocab"),
    ).orderBy("lang")


@q("q_kendall_w")
def q_kendall_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's W concordance across three brand leaderboards (revenue,
    volume, order count): do the metrics agree on who's on top?
    W = 12·S/(k²·n·(n²−1)) over exact integer ranks (each metric's
    brand ranking, key tiebreak), S the sum of squared deviations of
    rank sums from their mean — the multi-judge agreement number
    (q_rbo compares two lists; this scores k of them jointly)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p.select("p_partkey", "p_brand")),
                li["l_partkey"] == F.col("p_partkey"))
    g = j.groupBy("p_brand").agg(
        dsum("l_extendedprice").alias("rev"),
        dsum("l_quantity").alias("qty"),
        F.countDistinct("l_orderkey").alias("n_ord"),
    )
    ranked = g.select(
        "p_brand",
        F.row_number().over(W.orderBy(F.desc("rev"), F.asc("p_brand"))).alias("r1"),
        F.row_number().over(W.orderBy(F.desc("qty"), F.asc("p_brand"))).alias("r2"),
        F.row_number().over(W.orderBy(F.desc("n_ord"), F.asc("p_brand"))).alias("r3"),
    )
    sums = ranked.select(
        "p_brand", (F.col("r1") + F.col("r2") + F.col("r3")).cast("long").alias("rs")
    )
    k = 3
    agg = sums.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rs").alias("__srs"),
        F.sum(F.col("rs") * F.col("rs")).alias("__srs2"),
    )
    out = agg.selectExpr(
        "CAST(n AS BIGINT) AS n_items",
        f"CAST({k} AS BIGINT) AS k_rankings",
        # S = Σrs² − (Σrs)²/n, all exact longs into double
        "CAST(__srs2 AS DOUBLE) - CAST(__srs AS DOUBLE) * __srs / n AS s_dev",
    ).selectExpr(
        "n_items",
        "k_rankings",
        f"ROUND(12.0D * s_dev / ({k} * {k} * n_items"
        " * (CAST(n_items AS DOUBLE) * n_items - 1)), 6) AS kendall_w",
    )
    return out


@q("q_chi2_residuals")
def q_chi2_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized residuals for the priority × status contingency: per
    cell (O − E)/√(E·(1−rowshare)·(1−colshare)) with |resid| > 2 flags —
    WHICH cells drive q_chi2's significance (the post-hoc diagnosis,
    exactly as q_tukey_hsd follows q_anova). Zero cells restored so
    every (row, col) combination reports."""
    o = load_table(spark, sf_dir, "orders")
    cells = o.groupBy(
        F.col("o_orderpriority").alias("x"), F.col("o_orderstatus").alias("y")
    ).agg(F.count(F.lit(1)).alias("nxy"))
    xt = cells.groupBy("x").agg(F.sum("nxy").alias("nx"))
    yt = cells.groupBy("y").agg(F.sum("nxy").alias("ny"))
    nn = cells.agg(F.sum("nxy").alias("n"))
    full = (
        xt.crossJoin(F.broadcast(yt))
        .join(cells, ["x", "y"], "left")
        .withColumn("nxy", F.coalesce("nxy", F.lit(0)))
        .crossJoin(F.broadcast(nn))
    )
    e = F.col("nx").cast("double") * F.col("ny") / F.col("n")
    resid = (F.col("nxy").cast("double") - e) / F.sqrt(
        e
        * (1.0 - F.col("nx").cast("double") / F.col("n"))
        * (1.0 - F.col("ny").cast("double") / F.col("n"))
    )
    return full.select(
        "x",
        "y",
        F.col("nxy").cast("long").alias("observed"),
        F.round(e, 6).alias("expected"),
        F.round(resid, 6).alias("std_residual"),
        F.when(F.abs(resid) > 2.0, 1).otherwise(0).cast("int").alias("flag_cell"),
    ).orderBy("x", "y")


@q("q_cronbach_alpha")
def q_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's alpha over the five per-user event-type spends as scale
    items: α = k/(k−1)·(1 − Σσᵢ²/σ²_total) — do the "items" measure one
    underlying engagement trait (the internal-consistency companion to
    q_icc's group reliability). Item and total variances from one exact
    moment pass over the user × item grid (missing items are true
    zeros)."""
    e = load_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    per = e.groupBy("user_id").agg(
        *[
            F.round(
                dsum(F.when(F.col("event_type") == t, F.col("value")).otherwise(0.0)), 6
            ).alias(f"v_{t}")
            for t in types
        ]
    )
    tot_expr = None
    for t in types:
        c = F.col(f"v_{t}")
        tot_expr = c if tot_expr is None else tot_expr + c
    per = per.withColumn("v_total", F.round(tot_expr, 6))
    aggs = [F.count(F.lit(1)).alias("n_users")]
    for c in [f"v_{t}" for t in types] + ["v_total"]:
        aggs.append(dsum(c).alias(f"s_{c}"))
        aggs.append(dsum(F.col(c) * F.col(c)).alias(f"ss_{c}"))
    mom = per.agg(*aggs)
    var_parts = " + ".join(
        f"(ss_v_{t} / n_users - (s_v_{t} / n_users) * (s_v_{t} / n_users))"
        for t in types
    )
    out = mom.selectExpr(
        "CAST(n_users AS BIGINT) AS n_users",
        "CAST(5 AS BIGINT) AS k_items",
        f"{var_parts} AS sum_item_var",
        "ss_v_total / n_users - (s_v_total / n_users) * (s_v_total / n_users)"
        " AS total_var",
    ).selectExpr(
        "n_users",
        "k_items",
        "ROUND(sum_item_var, 6) AS sum_item_var",
        "ROUND(total_var, 6) AS total_var",
        "ROUND(5.0D / 4.0D * (1.0D - sum_item_var / total_var), 6) AS alpha",
    )
    return out


@q("q_kpss")
def q_kpss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPSS level-stationarity test on the kilo-scaled daily revenue:
    partial sums of demeaned values against a Bartlett long-run variance
    (lags 1..7, weights 1 − j/8), statistic Σ S_t²/(n²·σ̂²_lr) vs the 5%
    literal 0.463 — the null here is STATIONARY (opposite orientation to
    unit-root tests), closing the trend-diagnosis trio with q_hurst and
    q_mann_kendall. Partial sums are exact fixed-point cumsums; the S²
    fold runs kilo²-scaled to stay inside the ceiling."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.date_format("l_shipdate", "yyyy-MM-dd").alias("day")).agg(
        F.round(dsum(F.col("l_extendedprice") / 1000.0), 6).alias("y")
    )
    mu = daily.agg(F.round(davg("y"), 6).alias("__mu"))
    wd = W.orderBy("day")
    e = daily.crossJoin(F.broadcast(mu)).select(
        "day",
        F.round(F.col("y") - F.col("__mu"), 6).alias("e"),
    )
    from fortune_500_financial_insights_pipeline_spark.functions.deterministic import dsum_w

    base = e.select(
        "day",
        "e",
        dsum_w("e", wd.rowsBetween(W.unboundedPreceding, 0)).alias("s"),
        *[F.lag("e", j).over(wd).alias(f"l{j}") for j in range(1, 8)],
    )
    gam = base.agg(
        F.count(F.lit(1)).alias("n"),
        dsum((F.col("s") / 1000.0) * (F.col("s") / 1000.0)).alias("__ss_k"),
        dsum(F.col("e") * F.col("e")).alias("g0"),
        *[
            dsum(F.col("e") * F.coalesce(F.col(f"l{j}"), F.lit(0.0))).alias(f"g{j}")
            for j in range(1, 8)
        ],
    )
    lr = " + ".join(f"2.0D * (1.0D - {j} / 8.0D) * (g{j} / n)" for j in range(1, 8))
    out = gam.selectExpr(
        "CAST(n AS BIGINT) AS n_days",
        "__ss_k * 1000000.0D AS ss",
        f"g0 / n + {lr} AS s2_lr",
    ).selectExpr(
        "n_days",
        "ROUND(s2_lr, 6) AS longrun_var",
        "ROUND(ss / (CAST(n_days AS DOUBLE) * n_days) / s2_lr, 6) AS kpss_stat",
        "CAST(CASE WHEN ss / (CAST(n_days AS DOUBLE) * n_days) / s2_lr > 0.463D"
        " THEN 1 ELSE 0 END AS INT) AS flag_nonstationary",
    )
    return out


@q("q_brier_decomposition")
def q_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the classifier's Brier score over 10
    probability bins: BS alongside reliability (calibration error),
    resolution (useful separation), uncertainty ȳ(1−ȳ), and the expected
    calibration error Σnₖ|p̄ₖ−ȳₖ|/n — WHY the score is what it is, where
    q_calibration only plots the bins and q_auc only ranks. One binned
    aggregate over the shared scored frame; bin terms fold fixed-point."""
    lab = _scored_labeled_docs(spark, sf_dir)
    b = F.least(F.floor(F.col("prob") * 10).cast("int"), F.lit(9))
    binned = lab.groupBy(b.alias("bin")).agg(
        F.count(F.lit(1)).alias("nk"),
        dsum("prob").alias("sp"),
        F.sum("label").cast("long").alias("sy"),
    )
    tot = lab.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("label").cast("long").alias("ny"),
        dsum(
            (F.col("prob") - F.col("label")) * (F.col("prob") - F.col("label"))
        ).alias("__bs"),
    )
    j = binned.crossJoin(F.broadcast(tot))
    pk = F.col("sp") / F.col("nk")
    yk = F.col("sy").cast("double") / F.col("nk")
    yb = F.col("ny").cast("double") / F.col("n")
    parts = j.agg(
        F.max("n").cast("long").alias("n"),
        F.round(F.max(F.col("__bs") / F.col("n")), 6).alias("brier"),
        F.round(dsum(F.col("nk") * (pk - yk) * (pk - yk)) / F.max("n"), 6).alias(
            "reliability"
        ),
        F.round(dsum(F.col("nk") * (yk - yb) * (yk - yb)) / F.max("n"), 6).alias(
            "resolution"
        ),
        F.round(F.max(yb * (1.0 - yb)), 6).alias("uncertainty"),
        F.round(dsum(F.col("nk") * F.abs(pk - yk)) / F.max("n"), 6).alias("ece"),
    )
    return parts.selectExpr(
        "n", "brier", "reliability", "resolution", "uncertainty", "ece",
        # within-bin probability variance makes the binned identity
        # approximate; the gap quantifies it
        "ROUND(brier - (reliability - resolution + uncertainty), 6) AS decomposition_gap",
    )


@q("q_qini")
def q_qini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini curve for uplift targeting: users ranked by week-1 activity
    (the targeting score), treated = even ids, and per score-decile the
    cumulative incremental responders qini = cumRespₜ − cumResp_c ·
    (cumNₜ/cumN_c) against the proportional random baseline — does the
    score find the persuadables (the causal-EVAL artifact beside
    q_psm_att's estimate). Exact counts; ntile with key tiebreak."""
    e = load_table(spark, sf_dir, "events")
    w1 = F.lit("2024-01-08 00:00:00").cast("timestamp")
    per = e.groupBy("user_id").agg(
        F.sum((F.col("ts") < w1).cast("long")).alias("score"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("resp"),
    ).withColumn("treated", (F.col("user_id") % 2 == 0).cast("int"))
    dec = per.select(
        "treated", "resp",
        F.ntile(10).over(W.orderBy(F.desc("score"), F.asc("user_id"))).alias("decile"),
    )
    g = dec.groupBy("decile").agg(
        F.sum("treated").cast("long").alias("nt"),
        F.sum(F.lit(1) - F.col("treated")).cast("long").alias("nc"),
        F.sum(F.col("treated") * F.col("resp")).cast("long").alias("rt"),
        F.sum((F.lit(1) - F.col("treated")) * F.col("resp")).cast("long").alias("rc"),
    )
    wc = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    cum = g.select(
        "decile",
        F.sum("nt").over(wc).cast("long").alias("cum_nt"),
        F.sum("nc").over(wc).cast("long").alias("cum_nc"),
        F.sum("rt").over(wc).cast("long").alias("cum_rt"),
        F.sum("rc").over(wc).cast("long").alias("cum_rc"),
    )
    qini = (
        F.col("cum_rt").cast("double")
        - F.col("cum_rc").cast("double") * F.col("cum_nt") / F.col("cum_nc")
    )
    last = cum.orderBy(F.desc("decile")).limit(1).select(
        (
            F.col("cum_rt").cast("double")
            - F.col("cum_rc").cast("double") * F.col("cum_nt") / F.col("cum_nc")
        ).alias("__total_qini")
    )
    return (
        cum.crossJoin(F.broadcast(last))
        .select(
            "decile", "cum_nt", "cum_nc",
            F.round(qini, 6).alias("qini"),
            F.round(F.col("__total_qini") * F.col("decile") / 10.0, 6).alias(
                "random_baseline"
            ),
            F.round(
                qini - F.col("__total_qini") * F.col("decile") / 10.0, 6
            ).alias("qini_above_random"),
        )
        .orderBy("decile")
    )


@q("q_holt_winters")
def q_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters (operators/timeseries.holt_winters_additive,
    α=0.3 β=0.1 γ=0.2, weekly period) on the kilo-scaled daily revenue:
    level + trend + a rotating 7-slot seasonal queue folded exactly
    (per-step round-6, exact-integer init means), next-day forecast
    l + b + s_head — the full seasonal smoother completing the q_ewma →
    q_holt ladder, with the oracle replaying the triple recursion as a
    recursive CTE carrying a LIST column."""
    from fortune_500_financial_insights_pipeline_spark.operators.timeseries import (
        holt_winters_additive,
    )

    li = load_table(spark, sf_dir, "lineitem").where(F.year("l_shipdate") == 1998)
    daily = li.groupBy(F.date_format("l_shipdate", "yyyy-MM-dd").alias("day")).agg(
        F.round(dsum(F.col("l_extendedprice") / 1000.0), 6).alias("y")
    )
    # one fiscal year (<= 365 fold steps) keeps the recursive-CTE oracle
    # inside the driver's per-query budget
    return holt_winters_additive(daily, "day", "y", period=7, alpha=0.3, beta=0.1, gamma=0.2)


@q("q_mcnemar")
def q_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test comparing the stopword and ASCII language
    raters against the truth ON THE SAME documents: only the discordant
    cells matter (b = stopword right / ascii wrong, c = the reverse),
    χ² = (|b−c|−1)²/(b+c) with continuity correction — the is-one-
    classifier-actually-better test that unpaired accuracy comparison
    gets wrong (q_cohen_kappa asks if they agree; this asks who wins).
    Exact counts from one scan."""
    d = load_table(spark, sf_dir, "documents")
    stop = F.array([F.lit(w) for w in
                    ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]])
    toks = F.split("text", " ")
    score = F.size(F.filter(toks, lambda t: F.array_contains(stop, t))).cast(
        "double"
    ) / F.size(toks)
    rater_a = (score >= 0.05).cast("int")
    ascii_share = F.length(
        F.regexp_replace(F.col("text"), "[^\\x00-\\x7F]", "")
    ).cast("double") / F.nullif(F.length("text"), F.lit(0))
    rater_b = F.when(ascii_share >= 0.99, 1).otherwise(0)
    truth = (F.col("lang") == "en").cast("int")
    ok_a = (rater_a == truth).cast("int")
    ok_b = (rater_b == truth).cast("int")
    g = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(((ok_a == 1) & (ok_b == 0)).cast("long")).alias("b"),
        F.sum(((ok_a == 0) & (ok_b == 1)).cast("long")).alias("c"),
        F.sum(((ok_a == 1) & (ok_b == 1)).cast("long")).alias("both_right"),
    )
    chi = (F.abs(F.col("b") - F.col("c")).cast("double") - 1.0) * (
        F.abs(F.col("b") - F.col("c")).cast("double") - 1.0
    ) / (F.col("b") + F.col("c")).cast("double")
    return g.select(
        "n", "both_right", "b", "c",
        F.round(chi, 6).alias("mcnemar_chi2"),
        F.when(chi > 3.841, 1).otherwise(0).cast("int").alias("flag_different"),
    )


@q("q_cochran_q")
def q_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q across THREE binary raters (stopword, ASCII share,
    length-over-median rule) scored right/wrong per document: Q =
    k(k−1)·Σ(G_j − T/k)² / (k·T − ΣL²) — do ANY of the k classifiers
    differ, the k-rater gate before pairwise q_mcnemar follow-ups
    (exactly the ANOVA → Tukey discipline, binary edition). Exact
    integer column/row totals; χ²(2) cut 5.991."""
    d = load_table(spark, sf_dir, "documents")
    stop = F.array([F.lit(w) for w in
                    ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]])
    toks = F.split("text", " ")
    score = F.size(F.filter(toks, lambda t: F.array_contains(stop, t))).cast(
        "double"
    ) / F.size(toks)
    rater_a = (score >= 0.05).cast("int")
    ascii_share = F.length(
        F.regexp_replace(F.col("text"), "[^\\x00-\\x7F]", "")
    ).cast("double") / F.nullif(F.length("text"), F.lit(0))
    rater_b = F.when(ascii_share >= 0.99, 1).otherwise(0)
    med = d.agg(F.round(F.percentile(F.length("text"), F.lit(0.5)), 6).alias("__med"))
    base = d.crossJoin(F.broadcast(med))
    rater_c = (F.length("text").cast("double") >= F.col("__med")).cast("int")
    truth = (F.col("lang") == "en").cast("int")
    scored = base.select(
        (rater_a == truth).cast("long").alias("x1"),
        (rater_b == truth).cast("long").alias("x2"),
        (rater_c == truth).cast("long").alias("x3"),
    ).withColumn("li", F.col("x1") + F.col("x2") + F.col("x3"))
    g = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("g1"),
        F.sum("x2").alias("g2"),
        F.sum("x3").alias("g3"),
        F.sum("li").alias("t"),
        F.sum(F.col("li") * F.col("li")).alias("l2"),
    )
    out = g.selectExpr(
        "CAST(n AS BIGINT) AS n_docs",
        "CAST(g1 AS BIGINT) AS right_stopword",
        "CAST(g2 AS BIGINT) AS right_ascii",
        "CAST(g3 AS BIGINT) AS right_length",
        "3.0D * 2.0D * ((CAST(g1 AS DOUBLE) - CAST(t AS DOUBLE) / 3) * (CAST(g1 AS DOUBLE) - CAST(t AS DOUBLE) / 3)"
        " + (CAST(g2 AS DOUBLE) - CAST(t AS DOUBLE) / 3) * (CAST(g2 AS DOUBLE) - CAST(t AS DOUBLE) / 3)"
        " + (CAST(g3 AS DOUBLE) - CAST(t AS DOUBLE) / 3) * (CAST(g3 AS DOUBLE) - CAST(t AS DOUBLE) / 3))"
        " / (3.0D * t - l2) AS q_raw",
    ).selectExpr(
        "n_docs", "right_stopword", "right_ascii", "right_length",
        "ROUND(q_raw, 6) AS cochran_q",
        "CAST(CASE WHEN q_raw > 5.991D THEN 1 ELSE 0 END AS INT) AS flag_differ",
    )
    return out


@q("q_partition_pruning_gain")
def q_partition_pruning_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-layout planning: for three representative date-range
    predicates, the rows a month-partitioned layout would scan (whole
    months touching the range) vs the rows actually selected vs a full
    scan — the pruning-gain table that justifies (or kills) a partition
    key before anyone rewrites 100 TB (q_zorder plans clustering WITHIN
    files; this plans the directory layout). One month-level stats
    aggregate joined to a broadcast predicate relation."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("m")
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    preds = spark.createDataFrame(
        [
            ("one_week", "1997-03-10 00:00:00", "1997-03-17 00:00:00"),
            ("one_quarter", "1996-01-01 00:00:00", "1996-04-01 00:00:00"),
            ("two_years", "1995-01-01 00:00:00", "1997-01-01 00:00:00"),
        ],
        "pred string, lo string, hi string",
    )
    tot = o.agg(F.count(F.lit(1)).alias("__full"))
    pm = monthly.crossJoin(F.broadcast(preds)).where(
        (F.col("m") >= F.date_format(F.col("lo").cast("timestamp"), "yyyy-MM"))
        & (F.col("m") <= F.date_format(F.col("hi").cast("timestamp"), "yyyy-MM"))
    )
    scanned = pm.groupBy("pred").agg(F.sum("n_rows").cast("long").alias("rows_scanned"))
    exact = (
        o.crossJoin(F.broadcast(preds))
        .where(
            (F.col("o_orderdate") >= F.col("lo").cast("timestamp"))
            & (F.col("o_orderdate") < F.col("hi").cast("timestamp"))
        )
        .groupBy("pred")
        .agg(F.count(F.lit(1)).alias("rows_selected"))
    )
    return (
        scanned.join(exact, "pred")
        .crossJoin(F.broadcast(tot))
        .select(
            "pred",
            "rows_scanned",
            "rows_selected",
            F.col("__full").cast("long").alias("rows_full_scan"),
            F.round(
                F.col("rows_scanned").cast("double") / F.col("__full"), 6
            ).alias("scan_fraction"),
            F.round(
                F.col("rows_selected").cast("double") / F.col("rows_scanned"), 6
            ).alias("scan_precision"),
        )
        .orderBy("pred")
    )


@q("q_bloom_sizing")
def q_bloom_sizing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter sizing plan for the join keys a semi-join pushdown
    would build (q_bloom_semijoin USES one; this SIZES them): per key
    column, exact distinct cardinality → optimal bits m = −n·ln(p)/ln2²
    and hash count k = ln2·m/n at 1% target fpp, with the MiB cost —
    the planning table that decides whether the filter fits an
    executor broadcast. One distinct-count pass per key."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    def leg(name, df, col):
        return df.agg(
            F.lit(name).alias("key_col"),
            F.countDistinct(col).cast("long").alias("n_distinct"),
        )
    base = (
        leg("orders.o_custkey", o, "o_custkey")
        .unionByName(leg("lineitem.l_orderkey", li, "l_orderkey"))
        .unionByName(leg("lineitem.l_partkey", li, "l_partkey"))
        .unionByName(leg("customer.c_custkey", c, "c_custkey"))
    )
    out = base.selectExpr(
        "key_col",
        "n_distinct",
        "-(CAST(n_distinct AS DOUBLE) * ln(0.01D)) / (ln(2.0D) * ln(2.0D)) AS m_bits_raw",
    ).selectExpr(
        "key_col",
        "n_distinct",
        "CAST(ceil(m_bits_raw) AS BIGINT) AS m_bits",
        "ROUND(ln(2.0D) * m_bits_raw / n_distinct, 6) AS k_hashes",
        "ROUND(m_bits_raw / 8.0D / 1048576.0D, 6) AS mib",
    )
    return out.orderBy("key_col")


@q("q_wasserstein")
def q_wasserstein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D Wasserstein (earth-mover) distance between the click and
    purchase value distributions: W₁ = Σ |ECDF₁ − ECDF₂| · Δv over the
    merged sorted support — the INTEGRAL drift metric where q_ks_test
    takes the supremum (KS sees the worst point; W₁ prices the whole
    move). Per-value counts bound the shuffle; cumulative ranks exact;
    gap terms fold fixed-point."""
    e = load_table(spark, sf_dir, "events")
    two = e.where(F.col("event_type").isin("click", "purchase")).select(
        F.col("event_type").alias("g"), F.round(F.col("value"), 6).alias("v")
    )
    per_val = two.groupBy("v").agg(
        F.sum((F.col("g") == "click").cast("long")).alias("c1"),
        F.sum((F.col("g") == "purchase").cast("long")).alias("c2"),
    )
    wv = W.orderBy("v")
    cum = per_val.select(
        "v",
        F.sum("c1").over(wv.rowsBetween(W.unboundedPreceding, 0)).alias("r1"),
        F.sum("c2").over(wv.rowsBetween(W.unboundedPreceding, 0)).alias("r2"),
        F.lead("v").over(wv).alias("v_next"),
    )
    tot = cum.agg(F.max("r1").alias("n1"), F.max("r2").alias("n2"))
    j = cum.crossJoin(F.broadcast(tot)).where(F.col("v_next").isNotNull())
    term = (
        F.abs(
            F.col("r1").cast("double") / F.col("n1")
            - F.col("r2").cast("double") / F.col("n2")
        )
        * F.round(F.col("v_next") - F.col("v"), 6)
    )
    return j.agg(
        F.max("n1").cast("long").alias("n_click"),
        F.max("n2").cast("long").alias("n_purchase"),
        F.round(dsum(term), 6).alias("wasserstein_1"),
    )


@q("q_tv_distance")
def q_tv_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-variation distance between the weekday and weekend event-type
    mixes: TV = ½ Σ |p − q| over the 5 types — the worst-case
    probability-mass shift (the L1 sibling of q_mixture_kl and q_psi's
    binned drift). Exact counts; locale-stable day names feed the
    weekend split."""
    e = load_table(spark, sf_dir, "events")
    dn = F.date_format("ts", "EEEE")
    wknd = dn.isin("Saturday", "Sunday").cast("int")
    g = e.groupBy("event_type").agg(
        F.sum(wknd).cast("long").alias("n_wk"),
        F.sum(1 - wknd).cast("long").alias("n_wd"),
    )
    tot = g.agg(F.sum("n_wk").alias("__tk"), F.sum("n_wd").alias("__td"))
    j = g.crossJoin(F.broadcast(tot))
    diff = F.abs(
        F.col("n_wk").cast("double") / F.col("__tk")
        - F.col("n_wd").cast("double") / F.col("__td")
    )
    return j.agg(
        F.max("__tk").cast("long").alias("n_weekend"),
        F.max("__td").cast("long").alias("n_weekday"),
        F.round(dsum(diff) / 2.0, 6).alias("tv_distance"),
    )


@q("q_partial_corr")
def q_partial_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial correlation of quantity and line revenue CONTROLLING for
    unit price: r_xy·z = (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)) from
    the three pairwise Pearson correlations in one exact moment pass —
    does the raw q_stats_corr relationship survive once the confounder
    is held fixed (the three-variable step q_fixed_effects generalizes).
    Correlations recomposed from round-6 anchors."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    yv = F.col("l_extendedprice") / 1000.0
    z = F.col("l_extendedprice") / F.col("l_quantity") / 1000.0
    mom = li.agg(
        F.count(F.lit(1)).alias("n"),
        dsum(x).alias("sx"), dsum(yv).alias("sy"), dsum(z).alias("sz"),
        dsum(x * x).alias("sxx"), dsum(yv * yv).alias("syy"), dsum(z * z).alias("szz"),
        dsum(x * yv).alias("sxy"), dsum(x * z).alias("sxz"), dsum(yv * z).alias("syz"),
    )
    r = mom.selectExpr(
        "CAST(n AS BIGINT) AS n",
        "ROUND((sxy - sx * sy / n) / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 6) AS r_xy",
        "ROUND((sxz - sx * sz / n) / sqrt((sxx - sx * sx / n) * (szz - sz * sz / n)), 6) AS r_xz",
        "ROUND((syz - sy * sz / n) / sqrt((syy - sy * sy / n) * (szz - sz * sz / n)), 6) AS r_yz",
    )
    return r.selectExpr(
        "n", "r_xy", "r_xz", "r_yz",
        "ROUND((r_xy - r_xz * r_yz)"
        " / sqrt((1.0D - r_xz * r_xz) * (1.0D - r_yz * r_yz)), 6) AS partial_r_xy_given_z",
    )


@q("q_vif")
def q_vif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance inflation factors for the three line-level regressors
    (quantity, discount, unit price): VIFᵢ = 1/(1 − Rᵢ²) with each Rᵢ²
    from the closed-form inverse of the 3×3 correlation matrix
    (Rᵢ² = 1 − 1/(R⁻¹)ᵢᵢ · ... = 1 − det(R)/cofactorᵢᵢ) — the
    multicollinearity screen you run before trusting q_ols_multi's
    coefficients. One moment pass; correlations as round-6 anchors."""
    li = load_table(spark, sf_dir, "lineitem")
    a = F.col("l_quantity")
    b = F.col("l_discount")
    c = F.col("l_extendedprice") / F.col("l_quantity") / 1000.0
    mom = li.agg(
        F.count(F.lit(1)).alias("n"),
        dsum(a).alias("sa"), dsum(b).alias("sb"), dsum(c).alias("sc"),
        dsum(a * a).alias("saa"), dsum(b * b).alias("sbb"), dsum(c * c).alias("scc"),
        dsum(a * b).alias("sab"), dsum(a * c).alias("sac"), dsum(b * c).alias("sbc"),
    )
    r = mom.selectExpr(
        "CAST(n AS BIGINT) AS n",
        "ROUND((sab - sa * sb / n) / sqrt((saa - sa * sa / n) * (sbb - sb * sb / n)), 6) AS r12",
        "ROUND((sac - sa * sc / n) / sqrt((saa - sa * sa / n) * (scc - sc * sc / n)), 6) AS r13",
        "ROUND((sbc - sb * sc / n) / sqrt((sbb - sb * sb / n) * (scc - sc * sc / n)), 6) AS r23",
    )
    # det(R) for the 3x3 correlation matrix; R_i^2 = 1 - det(R) / M_ii
    return r.selectExpr(
        "n", "r12", "r13", "r23",
        "ROUND(1.0D / ((1.0D + 2.0D * r12 * r13 * r23 - r12 * r12 - r13 * r13 - r23 * r23)"
        " / (1.0D - r23 * r23)), 6) AS vif_quantity",
        "ROUND(1.0D / ((1.0D + 2.0D * r12 * r13 * r23 - r12 * r12 - r13 * r13 - r23 * r23)"
        " / (1.0D - r13 * r13)), 6) AS vif_discount",
        "ROUND(1.0D / ((1.0D + 2.0D * r12 * r13 * r23 - r12 * r12 - r13 * r13 - r23 * r23)"
        " / (1.0D - r12 * r12)), 6) AS vif_unit_price",
    )


@q("q_mde")
def q_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment-design planner from the live data: the observed per-user
    spend variance prices (a) the minimum detectable effect of the
    CURRENT sample at 80% power / 5% α — MDE = (z_α/2+z_β)·√(2σ²/n) —
    and (b) the per-arm n needed to detect a 5% lift of the mean —
    n = 2σ²(z_α/2+z_β)²/Δ². The before-you-run numbers q_ab_test
    assumes someone computed. Exact moments; z literals 1.96/0.8416."""
    e = load_table(spark, sf_dir, "events")
    per = e.groupBy("user_id").agg(F.round(dsum("value"), 6).alias("spend"))
    mom = per.agg(
        F.count(F.lit(1)).alias("n_users"),
        dsum("spend").alias("s"),
        dsum(F.col("spend") * F.col("spend")).alias("ss"),
    )
    out = mom.selectExpr(
        "CAST(n_users AS BIGINT) AS n_users",
        "s / n_users AS mu",
        "ss / n_users - (s / n_users) * (s / n_users) AS var_",
    ).selectExpr(
        "n_users",
        "ROUND(mu, 6) AS mean_spend",
        "ROUND(sqrt(var_), 6) AS sd_spend",
        # per-arm n = current users / 2
        "ROUND((1.96D + 0.8416D) * sqrt(2.0D * var_ / (n_users / 2.0D)), 6) AS mde_abs",
        "ROUND((1.96D + 0.8416D) * sqrt(2.0D * var_ / (n_users / 2.0D)) / mu, 6)"
        " AS mde_relative",
        "CAST(ceil(2.0D * var_ * (1.96D + 0.8416D) * (1.96D + 0.8416D)"
        " / ((0.05D * mu) * (0.05D * mu))) AS BIGINT) AS n_per_arm_for_5pct",
    )
    return out


@q("q_session_gap_sweep")
def q_session_gap_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization parameter sensitivity: session counts, mean length
    and bounce share at 10/30/60-minute gap thresholds from ONE lag pass
    (the gap threshold only moves a comparison, so all three sweeps
    share the same sorted scan) — the robustness table that says whether
    q_session_stats' headline numbers are an artifact of the 30-minute
    convention."""
    e = load_table(spark, sf_dir, "events")
    wu = W.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.col("ts").cast("long")
    gap = (sec - F.lag(sec).over(wu)).alias("gap_s")
    base = e.select("user_id", gap)
    gaps = spark.createDataFrame(
        [("10min", 600), ("30min", 1800), ("60min", 3600)],
        "sweep string, thr int",
    )
    j = base.crossJoin(F.broadcast(gaps))
    # a session starts where gap is null (first event) or exceeds thr
    starts = j.groupBy("sweep", "thr").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            (F.col("gap_s").isNull() | (F.col("gap_s") > F.col("thr"))).cast("long")
        ).alias("n_sessions"),
    )
    return starts.select(
        "sweep",
        "n_sessions",
        F.round(
            F.col("n_events").cast("double") / F.col("n_sessions"), 6
        ).alias("mean_events_per_session"),
    ).orderBy("sweep")


@q("q_process_capability")
def q_process_capability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Process-capability report for order fulfilment lag (order → first
    ship, days) against a 1..120-day spec window: Cp = (USL−LSL)/6σ,
    Cpk = min(USL−μ, μ−LSL)/3σ, the out-of-spec share, and the Taguchi
    quadratic loss (σ² + (μ−T)²)/T² around the 60-day target — the SPC
    capability layer above q_control_chart's stability view. One moment
    pass + one spec-violation count."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    first_ship = li.groupBy("l_orderkey").agg(F.min("l_shipdate").alias("__ship"))
    lag = (
        o.join(first_ship, o["o_orderkey"] == F.col("l_orderkey"))
        .select(
            F.datediff(F.col("__ship").cast("date"), F.col("o_orderdate").cast("date"))
            .cast("double")
            .alias("d")
        )
    )
    mom = lag.agg(
        F.count(F.lit(1)).alias("n"),
        dsum("d").alias("s"),
        dsum(F.col("d") * F.col("d")).alias("ss"),
        F.sum(((F.col("d") < 1.0) | (F.col("d") > 120.0)).cast("long")).alias("n_oos"),
    )
    out = mom.selectExpr(
        "CAST(n AS BIGINT) AS n_orders",
        "CAST(n_oos AS BIGINT) AS n_out_of_spec",
        "s / n AS mu",
        "sqrt(ss / n - (s / n) * (s / n)) AS sd",
    ).selectExpr(
        "n_orders",
        "n_out_of_spec",
        "ROUND(mu, 6) AS mean_lag_days",
        "ROUND(sd, 6) AS sd_lag_days",
        "ROUND((120.0D - 1.0D) / (6.0D * sd), 6) AS cp",
        "ROUND(least(120.0D - mu, mu - 1.0D) / (3.0D * sd), 6) AS cpk",
        "ROUND(CAST(n_out_of_spec AS DOUBLE) / n_orders, 6) AS oos_share",
        "ROUND((sd * sd + (mu - 60.0D) * (mu - 60.0D)) / (60.0D * 60.0D), 6)"
        " AS taguchi_loss_ratio",
    )
    return out


@q("q_backlog_curve")
def q_backlog_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog as a monthly TIME SERIES: +1 at order placement,
    −1 at the order's last shipment, running sum sampled at month ends —
    the operations curve behind q_ar_aging's single as-of snapshot
    (backlog building or draining?). Boundary events are two tiny frames;
    the sweep is one cumulative sum over months."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    done = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("__done"))
    placed = o.select(
        F.date_format("o_orderdate", "yyyy-MM").alias("m"), F.lit(1).alias("d")
    )
    closed = (
        o.join(done, o["o_orderkey"] == F.col("l_orderkey"))
        .select(F.date_format("__done", "yyyy-MM").alias("m"), F.lit(-1).alias("d"))
    )
    monthly = placed.unionByName(closed).groupBy("m").agg(
        F.sum(F.when(F.col("d") == 1, 1).otherwise(0)).cast("long").alias("n_placed"),
        F.sum(F.when(F.col("d") == -1, 1).otherwise(0)).cast("long").alias("n_closed"),
    )
    wm = W.orderBy("m").rowsBetween(W.unboundedPreceding, 0)
    return monthly.select(
        "m",
        "n_placed",
        "n_closed",
        F.sum(F.col("n_placed") - F.col("n_closed")).over(wm).cast("long").alias(
            "open_backlog"
        ),
    ).orderBy("m")


@q("q_topsis")
def q_topsis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOPSIS multi-criteria supplier ranking with entropy weights: three
    criteria (revenue ↑, return rate ↓, mean ship lag ↓) min-max
    normalized, weighted by the entropy-information method (criteria
    that actually discriminate get weight), and each supplier scored by
    closeness to the ideal/anti-ideal points — the defensible composite
    ranking that replaces ad-hoc weighted scores (q_kendall_w measures
    how much rankings disagree; this builds the consensus one). Exact
    criterion aggregates; normalized values and distances from round-6
    anchors; top 10."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    base = li.join(
        F.broadcast(o.select("o_orderkey", "o_orderdate")),
        li["l_orderkey"] == F.col("o_orderkey"),
    )
    crit = base.groupBy("l_suppkey").agg(
        F.round(dsum(F.col("l_extendedprice") / 1000.0), 6).alias("rev"),
        F.round(
            F.sum((F.col("l_returnflag") == "R").cast("long")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("ret_rate"),
        F.round(
            F.sum(
                F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
            ).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("lag"),
    )
    rng = crit.agg(
        F.max("rev").alias("rev_hi"), F.min("rev").alias("rev_lo"),
        F.max("ret_rate").alias("rr_hi"), F.min("ret_rate").alias("rr_lo"),
        F.max("lag").alias("lag_hi"), F.min("lag").alias("lag_lo"),
        F.count(F.lit(1)).alias("n_sup"),
    )
    nz = crit.crossJoin(F.broadcast(rng)).select(
        "l_suppkey",
        # benefit criterion normalizes up, cost criteria invert
        F.round((F.col("rev") - F.col("rev_lo")) / (F.col("rev_hi") - F.col("rev_lo")), 6).alias("c1"),
        F.round((F.col("rr_hi") - F.col("ret_rate")) / (F.col("rr_hi") - F.col("rr_lo")), 6).alias("c2"),
        F.round((F.col("lag_hi") - F.col("lag")) / (F.col("lag_hi") - F.col("lag_lo")), 6).alias("c3"),
        "n_sup",
    )
    # entropy weights: e_j = -sum(p ln p)/ln(n); w ~ (1 - e_j)
    sums = nz.agg(
        *[dsum(c).alias(f"s_{c}") for c in ("c1", "c2", "c3")],
    )
    ent = nz.crossJoin(F.broadcast(sums)).agg(
        F.max("n_sup").alias("n_sup"),
        *[
            F.round(
                -dsum(
                    F.when(
                        F.col(c) > 0,
                        (F.col(c) / F.col(f"s_{c}")) * F.log(F.col(c) / F.col(f"s_{c}")),
                    ).otherwise(0.0)
                )
                / F.log(F.max("n_sup").cast("double")),
                6,
            ).alias(f"e_{c}")
            for c in ("c1", "c2", "c3")
        ],
    )
    w = ent.selectExpr(
        "n_sup",
        "ROUND((1.0D - e_c1) / ((1.0D - e_c1) + (1.0D - e_c2) + (1.0D - e_c3)), 6) AS w1",
        "ROUND((1.0D - e_c2) / ((1.0D - e_c1) + (1.0D - e_c2) + (1.0D - e_c3)), 6) AS w2",
        "ROUND((1.0D - e_c3) / ((1.0D - e_c1) + (1.0D - e_c2) + (1.0D - e_c3)), 6) AS w3",
    )
    scored = nz.crossJoin(F.broadcast(w)).select(
        "l_suppkey",
        F.round(
            F.sqrt(
                F.col("w1") * F.col("w1") * (1.0 - F.col("c1")) * (1.0 - F.col("c1"))
                + F.col("w2") * F.col("w2") * (1.0 - F.col("c2")) * (1.0 - F.col("c2"))
                + F.col("w3") * F.col("w3") * (1.0 - F.col("c3")) * (1.0 - F.col("c3"))
            ),
            6,
        ).alias("d_ideal"),
        F.round(
            F.sqrt(
                F.col("w1") * F.col("w1") * F.col("c1") * F.col("c1")
                + F.col("w2") * F.col("w2") * F.col("c2") * F.col("c2")
                + F.col("w3") * F.col("w3") * F.col("c3") * F.col("c3")
            ),
            6,
        ).alias("d_anti"),
    )
    out = scored.select(
        "l_suppkey",
        "d_ideal",
        "d_anti",
        F.round(
            F.col("d_anti") / (F.col("d_ideal") + F.col("d_anti")), 6
        ).alias("closeness"),
    )
    return out.orderBy(F.desc("closeness"), F.asc("l_suppkey")).limit(10)


@q("q_wallet_share")
def q_wallet_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-wallet concentration: per customer, the spend share of
    their TOP brand (rank window over the customer × brand spend grid),
    rolled into deciles-of-loyalty counts plus the overall mean — are
    customers single-brand loyal or spread (the per-entity concentration
    view q_hhi takes market-wide). Two bounded aggregates + one rank."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    j = (
        li.join(F.broadcast(o.select("o_orderkey", "o_custkey")),
                li["l_orderkey"] == F.col("o_orderkey"))
        .join(F.broadcast(p.select("p_partkey", "p_brand")),
              li["l_partkey"] == F.col("p_partkey"))
    )
    cb = j.groupBy("o_custkey", "p_brand").agg(
        F.round(dsum(F.col("l_extendedprice") / 1000.0), 6).alias("spend")
    )
    tot = cb.groupBy("o_custkey").agg(
        F.round(
            F.sum(F.round(F.col("spend") * 1000000).cast("long")).cast("double") / 1000000,
            6,
        ).alias("total"),
        F.max("spend").alias("top_spend"),
    )
    share = tot.select(
        F.round(F.col("top_spend") / F.col("total"), 6).alias("sow")
    )
    g = share.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(davg("sow"), 6).alias("mean_share_of_wallet"),
        F.sum((F.col("sow") >= 0.5).cast("long")).alias("n_majority_loyal"),
        F.round(F.percentile("sow", F.lit(0.5)), 6).alias("median_share_of_wallet"),
    )
    return g.select(
        "n_customers",
        "mean_share_of_wallet",
        "median_share_of_wallet",
        "n_majority_loyal",
        F.round(
            F.col("n_majority_loyal").cast("double") / F.col("n_customers"), 6
        ).alias("majority_loyal_share"),
    )


@q("q_month_end_effect")
def q_month_end_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-end hockey stick: the revenue share landing in each month's
    last 3 days vs the uniform expectation (3/days-in-month) — the
    sandbagging/quota-gaming forensic a sales-ops review runs (q_benford
    checks digits; this checks TIMING). Exact per-month shares; output
    is the distribution summary plus the worst month."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        F.date_format("l_shipdate", "yyyy-MM").alias("m"),
        F.col("l_shipdate").cast("date").alias("d"),
        (F.col("l_extendedprice") / 1000.0).alias("v"),
    ).withColumn(
        "is_tail",
        (
            F.datediff(F.last_day("d"), F.col("d")) < 3
        ).cast("int"),
    ).withColumn("dim", F.dayofmonth(F.last_day("d")))
    per_m = base.groupBy("m", "dim").agg(
        F.round(dsum("v"), 6).alias("rev"),
        F.round(dsum(F.when(F.col("is_tail") == 1, F.col("v")).otherwise(0.0)), 6).alias(
            "rev_tail"
        ),
    )
    scored = per_m.select(
        "m",
        F.round(F.col("rev_tail") / F.col("rev"), 6).alias("tail_share"),
        F.round(3.0 / F.col("dim"), 6).alias("uniform_share"),
    ).select(
        "m", "tail_share", "uniform_share",
        F.round(F.col("tail_share") / F.col("uniform_share"), 6).alias("lift"),
    )
    worst = scored.orderBy(F.desc("lift"), F.asc("m")).limit(1).select(
        F.col("m").alias("worst_month"), F.col("lift").alias("worst_lift")
    )
    agg = scored.agg(
        F.count(F.lit(1)).alias("n_months"),
        F.round(davg("lift"), 6).alias("mean_lift"),
        F.sum((F.col("lift") > 2.0).cast("long")).alias("n_months_flagged"),
    )
    return agg.crossJoin(F.broadcast(worst))


@q("q_profit_curve")
def q_profit_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected-profit threshold sweep for the classifier gate: at each
    cut, profit = 10·TP − 1·FP − 5·FN (keep-value, review-cost,
    miss-cost literals) — the cost-sensitive layer that picks the
    OPERATING POINT q_pr_curve only describes. One scan against a
    broadcast threshold relation; the argmax row flags the recommended
    cut."""
    lab = _scored_labeled_docs(spark, sf_dir)
    thr = spark.createDataFrame(
        [(i / 10.0,) for i in range(1, 10)], "threshold double"
    )
    j = lab.crossJoin(F.broadcast(thr))
    g = j.groupBy("threshold").agg(
        F.sum(((F.col("prob") >= F.col("threshold")) & (F.col("label") == 1)).cast("long")).alias("tp"),
        F.sum(((F.col("prob") >= F.col("threshold")) & (F.col("label") == 0)).cast("long")).alias("fp"),
        F.sum(((F.col("prob") < F.col("threshold")) & (F.col("label") == 1)).cast("long")).alias("fn"),
    )
    profit = (10 * F.col("tp") - F.col("fp") - 5 * F.col("fn")).cast("long")
    scored = g.select("threshold", "tp", "fp", "fn", profit.alias("profit"))
    best = scored.orderBy(F.desc("profit"), F.asc("threshold")).limit(1).select(
        F.col("threshold").alias("__best")
    )
    return (
        scored.crossJoin(F.broadcast(best))
        .select(
            "threshold", "tp", "fp", "fn", "profit",
            (F.col("threshold") == F.col("__best")).cast("int").alias("is_best"),
        )
        .orderBy("threshold")
    )


@q("q_youden")
def q_youden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Youden's J optimal cut for the classifier: J = sensitivity +
    specificity − 1 per threshold, argmax = the cost-agnostic operating
    point (q_profit_curve prices errors; this balances them) — plus the
    J value itself as the skill-above-chance summary at the chosen cut.
    Same one-scan sweep."""
    lab = _scored_labeled_docs(spark, sf_dir)
    thr = spark.createDataFrame(
        [(i / 10.0,) for i in range(1, 10)], "threshold double"
    )
    j = lab.crossJoin(F.broadcast(thr))
    g = j.groupBy("threshold").agg(
        F.sum(((F.col("prob") >= F.col("threshold")) & (F.col("label") == 1)).cast("long")).alias("tp"),
        F.sum(((F.col("prob") >= F.col("threshold")) & (F.col("label") == 0)).cast("long")).alias("fp"),
        F.sum(((F.col("prob") < F.col("threshold")) & (F.col("label") == 1)).cast("long")).alias("fn"),
        F.sum(((F.col("prob") < F.col("threshold")) & (F.col("label") == 0)).cast("long")).alias("tn"),
    )
    sens = F.col("tp").cast("double") / (F.col("tp") + F.col("fn"))
    spec = F.col("tn").cast("double") / (F.col("tn") + F.col("fp"))
    scored = g.select(
        "threshold",
        F.round(sens, 6).alias("sensitivity"),
        F.round(spec, 6).alias("specificity"),
        F.round(sens + spec - 1.0, 6).alias("youden_j"),
    )
    best = scored.orderBy(F.desc("youden_j"), F.asc("threshold")).limit(1).select(
        F.col("threshold").alias("__best")
    )
    return (
        scored.crossJoin(F.broadcast(best))
        .select(
            "threshold", "sensitivity", "specificity", "youden_j",
            (F.col("threshold") == F.col("__best")).cast("int").alias("is_best"),
        )
        .orderBy("threshold")
    )


@q("q_effective_n")
def q_effective_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation-effective sample size of the daily revenue series:
    n_eff = n·(1−ρ₁)/(1+ρ₁) from the lag-1 autocorrelation — how many
    INDEPENDENT observations the series is actually worth (the inference
    deflator that turns q_acf's diagnosis into a corrected standard
    error; q_mde without this overstates power on autocorrelated
    metrics). Exact moments; ρ from round-6 anchors."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.date_format("l_shipdate", "yyyy-MM-dd").alias("day")).agg(
        F.round(dsum(F.col("l_extendedprice") / 1000.0), 6).alias("y")
    )
    wd = W.orderBy("day")
    base = daily.select("y", F.lag("y").over(wd).alias("yl"))
    mom = base.agg(
        F.count(F.lit(1)).alias("n"),
        dsum("y").alias("sy"),
        dsum(F.col("y") * F.col("y")).alias("syy"),
        dsum(F.when(F.col("yl").isNotNull(), F.col("y"))).alias("sa"),
        dsum("yl").alias("sb"),
        dsum(F.col("y") * F.col("yl")).alias("sab"),
        dsum(F.when(F.col("yl").isNotNull(), F.col("y") * F.col("y"))).alias("saa"),
        dsum(F.col("yl") * F.col("yl")).alias("sbb"),
        F.count("yl").alias("m"),
    )
    r1 = mom.selectExpr(
        "CAST(n AS BIGINT) AS n_days",
        "ROUND((sab - sa * sb / m) / sqrt((saa - sa * sa / m) * (sbb - sb * sb / m)), 6)"
        " AS rho1",
    )
    return r1.selectExpr(
        "n_days",
        "rho1",
        "ROUND(n_days * (1.0D - rho1) / (1.0D + rho1), 6) AS n_effective",
        "ROUND(n_days * (1.0D - rho1) / (1.0D + rho1) / n_days, 6) AS efficiency",
    )


@q("q_mood_median")
def q_mood_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test across order priorities: counts above the GRAND
    median per group fed through the chi-squared independence machinery —
    the coarsest (most outlier-proof) location test, the triage before
    q_kruskal_wallis's rank precision. Exact counts; grand median
    interpolated identically cross-engine."""
    o = load_table(spark, sf_dir, "orders")
    med = o.agg(F.round(F.percentile("o_totalprice", F.lit(0.5)), 6).alias("__med"))
    flagged = o.crossJoin(F.broadcast(med)).select(
        F.col("o_orderpriority").alias("grp"),
        (F.col("o_totalprice") > F.col("__med")).cast("int").alias("above"),
    )
    cells = flagged.groupBy("grp").agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum("above").cast("long").alias("na"),
    )
    tot = cells.agg(
        F.sum("ng").alias("n"), F.sum("na").alias("ta"), F.count(F.lit(1)).alias("k")
    )
    j = cells.crossJoin(F.broadcast(tot))
    pa = F.col("ta").cast("double") / F.col("n")
    ea = F.col("ng").cast("double") * pa
    eb = F.col("ng").cast("double") * (1.0 - pa)
    term = (
        (F.col("na").cast("double") - ea) * (F.col("na") - ea) / ea
        + ((F.col("ng") - F.col("na")).cast("double") - eb)
        * ((F.col("ng") - F.col("na")) - eb)
        / eb
    )
    red = j.agg(
        F.max("n").cast("long").alias("n"),
        F.max("k").cast("long").alias("k"),
        F.round(dsum(term), 6).alias("chi2"),
    )
    return red.selectExpr(
        "n", "k", "chi2",
        "CAST(CASE WHEN chi2 > 9.488D THEN 1 ELSE 0 END AS INT) AS flag_reject",
    )


@q("q_logrank")
def q_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test comparing time-to-first-purchase between even- and
    odd-id users: at every event time the observed group-1 events are
    compared to the expectation under a shared hazard (E = d·n₁/n, the
    hypergeometric variance V), χ² = (ΣO − ΣE)²/ΣV — the DO-the-curves-
    differ test completing the survival family (q_kaplan_meier draws
    them, q_nelson_aalen integrates hazard, q_weibull_fit parametrizes).
    Exact risk-set counts from cumulative windows; fixed-point folds."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min("ts").alias("__first"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("__fp"),
        F.max("ts").alias("__last"),
    )
    dur = F.datediff(
        F.coalesce(F.col("__fp"), F.col("__last")).cast("date"),
        F.col("__first").cast("date"),
    )
    users = per_user.select(
        dur.alias("t"),
        F.col("__fp").isNotNull().cast("int").alias("event"),
        (F.col("user_id") % 2 == 0).cast("int").alias("g"),
    )
    per_t = users.groupBy("t").agg(
        F.sum((F.col("g") == 1).cast("long")).alias("a1"),
        F.sum((F.col("g") == 0).cast("long")).alias("a0"),
        F.sum(((F.col("g") == 1) & (F.col("event") == 1)).cast("long")).alias("d1"),
        F.sum(((F.col("g") == 0) & (F.col("event") == 1)).cast("long")).alias("d0"),
    )
    tot = per_t.agg(F.sum("a1").alias("__t1"), F.sum("a0").alias("__t0"))
    wc = W.orderBy("t").rowsBetween(W.unboundedPreceding, -1)
    risk = per_t.crossJoin(F.broadcast(tot)).select(
        "t", "d1", "d0",
        (F.col("__t1") - F.coalesce(F.sum("a1").over(wc), F.lit(0))).cast("long").alias("n1"),
        (F.col("__t0") - F.coalesce(F.sum("a0").over(wc), F.lit(0))).cast("long").alias("n0"),
    ).withColumn("nt", F.col("n1") + F.col("n0")).withColumn(
        "dt", F.col("d1") + F.col("d0")
    ).where((F.col("dt") > 0) & (F.col("nt") > 1))
    e1 = F.col("dt").cast("double") * F.col("n1") / F.col("nt")
    v = (
        F.col("dt").cast("double")
        * (F.col("n1").cast("double") / F.col("nt"))
        * (1.0 - F.col("n1").cast("double") / F.col("nt"))
        * (F.col("nt") - F.col("dt")).cast("double")
        / (F.col("nt") - 1).cast("double")
    )
    agg = risk.agg(
        F.sum("d1").cast("long").alias("observed_g1"),
        F.round(dsum(e1), 6).alias("expected_g1"),
        F.round(dsum(v), 6).alias("variance"),
        F.count(F.lit(1)).alias("n_event_times"),
    )
    return agg.selectExpr(
        "n_event_times",
        "observed_g1",
        "expected_g1",
        "ROUND((observed_g1 - expected_g1) * (observed_g1 - expected_g1) / variance, 6)"
        " AS logrank_chi2",
        "CAST(CASE WHEN (observed_g1 - expected_g1) * (observed_g1 - expected_g1)"
        " / variance > 3.841D THEN 1 ELSE 0 END AS INT) AS flag_differ",
    )
