"""Multimodal plumbing: binary columns + typed metadata (SURVEY §2.11).

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
