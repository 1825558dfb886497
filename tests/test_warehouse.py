"""Warehouse layer tests: DDL-type conformance, partitioned round-trip,
spark.sql serving (SURVEY.md §7.4)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from fortune_500_financial_insights_pipeline_spark import warehouse as WH


def _sample_openclose(spark):
    rows = [
        ("AAPL", "2017-11-09", 174.9, 175.5, 173.0, 175.88, 30000000.0),
        ("AAPL", "2017-11-10", 175.1, 175.6, 174.2, 174.67, 25000000.0),
        ("MSFT", "2017-11-10", 83.5, 84.1, 83.1, 83.87, 18000000.0),
        ("MSFT", "2018-01-02", 86.1, 86.3, 85.5, 85.95, 22000000.0),
    ]
    return (
        spark.createDataFrame(
            rows, "Ticker string, Date string, Open double, High double, Low double, Close double, Volume double"
        )
        .withColumn("Date", F.to_date("Date"))
    )


def test_conform_types_and_missing_columns(spark):
    df = WH.conform(_sample_openclose(spark), "openclose")
    fields = {f.name: f.dataType for f in df.schema.fields}
    assert isinstance(fields["Date"], T.DateType)
    assert isinstance(fields["Volume"], T.LongType)  # DDL BIGINT, not double
    assert isinstance(fields["Close"], T.DoubleType)
    # declared-but-absent columns materialize as typed nulls
    assert isinstance(fields["Dividends"], T.DoubleType)
    assert df.filter(F.col("Dividends").isNotNull()).count() == 0


def test_conform_decimal_money(spark):
    df = spark.createDataFrame(
        [("AAPL", "2024-12-31", 96995000000.456, 3.14159)],
        "Ticker string, Date string, Free_Cash_Flow double, ignored double",
    ).withColumn("Date", F.to_date("Date"))
    out = WH.conform(df, "cashflow5y")
    fields = {f.name: f.dataType for f in out.schema.fields}
    assert fields["Free_Cash_Flow"] == T.DecimalType(20, 2)
    assert "ignored" not in out.columns
    got = out.select("Free_Cash_Flow").head()[0]
    assert str(got) == "96995000000.46"  # exact DECIMAL(20,2), not float


def test_surrogate_key_deterministic(spark):
    df = _sample_openclose(spark)
    k1 = WH.add_surrogate_key(df, ["Ticker", "Date"]).select("ID").collect()
    k2 = WH.add_surrogate_key(df.repartition(8), ["Ticker", "Date"]).select("ID").collect()
    assert sorted(r.ID for r in k1) == sorted(r.ID for r in k2)
    assert len({r.ID for r in k1}) == 4  # unique per natural key


def test_write_register_serve(spark, tmp_path):
    base = str(tmp_path / "wh")
    WH.write_table(_sample_openclose(spark), base, "openclose")
    meta = spark.createDataFrame(
        [("AAPL", "Tech", "Consumer Electronics"), ("MSFT", "Tech", "Software")],
        "Ticker string, Sector string, Industry string",
    ).withColumn("Date", F.to_date(F.lit("2024-12-31")))
    WH.write_table(meta, base, "metadata")

    # year-partitioned layout on disk (partition pruning works on read)
    assert os.path.isdir(os.path.join(base, "openclose", "year=2017"))
    assert os.path.isdir(os.path.join(base, "openclose", "year=2018"))

    registered = WH.register(spark, base)
    assert set(registered) == {"openclose", "metadata"}

    yearly = {
        (r.Ticker, r.year): r.trading_days
        for r in WH.serve(spark, "yearly_price_summary").collect()
    }
    assert yearly[("AAPL", 2017)] == 2
    assert yearly[("MSFT", 2018)] == 1

    latest = {r.Ticker: r.Close for r in WH.serve(spark, "latest_close_per_ticker").collect()}
    assert latest["MSFT"] == 85.95

    joined = WH.serve(spark, "price_with_metadata").collect()
    assert {r.Sector for r in joined} == {"Tech"}


def test_partition_pruning_on_year(spark, tmp_path):
    """A year-filtered scan reads only that partition's files."""
    base = str(tmp_path / "wh")
    WH.write_table(_sample_openclose(spark), base, "openclose")
    df = spark.read.parquet(os.path.join(base, "openclose")).filter(F.col("year") == 2018)
    assert df.count() == 1
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(year" in plan or "year#" in plan


def test_bucketed_join_needs_no_exchange(spark, sf_dir, tmp_path):
    """Same-key same-count bucketed tables sort-merge join with zero
    shuffles — the write-once-join-many layout for recurring fact joins."""
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    WH.write_bucketed(
        orders, "orders_b", ["o_custkey"], num_buckets=8,
        sort_cols=["o_custkey"], path=str(tmp_path / "orders_b"),
    )
    WH.write_bucketed(
        customer, "customer_b", ["c_custkey"], num_buckets=8,
        sort_cols=["c_custkey"], path=str(tmp_path / "customer_b"),
    )
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("orders_b").join(
                spark.table("customer_b"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange hashpartitioning" not in plan  # co-located
            # result parity with the plain (shuffling) join
            assert joined.count() == orders.join(
                customer, orders.o_custkey == customer.c_custkey
            ).count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


def test_salted_join_matches_plain_join(spark, sf_dir):
    """Salted skew join returns exactly the plain join's rows, while the
    shuffle key carries the salt (hot key spread over N partitions)."""
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table
    from fortune_500_financial_insights_pipeline_spark.operators.skew import salted_join

    # manufacture skew: 80% of rows share one key
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "skew_key", F.when(F.col("o_orderkey") % 5 != 0, 1).otherwise(F.col("o_orderkey"))
    )
    dim = spark.range(0, 50).select(
        (F.col("id") * 5).alias("skew_key"), (F.col("id") % 7).alias("dim_val")
    ).union(spark.createDataFrame([(1, 99)], "skew_key long, dim_val long"))

    plain = orders.join(dim, "skew_key", "inner").select("o_orderkey", "dim_val")
    salted = salted_join(orders, dim, on=["skew_key"], salt=8).select(
        "o_orderkey", "dim_val"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))

    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan  # join key includes the salt → spread shuffle


def test_dynamic_partition_overwrite_keeps_history(spark, tmp_path):
    """A reload carrying only one year must replace only that partition."""
    base = str(tmp_path / "wh")
    WH.write_table(_sample_openclose(spark), base, "openclose")
    # incremental load: only a 2018 row, with a changed close
    inc = _sample_openclose(spark).filter(F.year("Date") == 2018).withColumn(
        "Close", F.lit(99.99)
    )
    WH.write_table(inc, base, "openclose")
    back = spark.read.parquet(os.path.join(base, "openclose"))
    assert back.filter(F.col("year") == 2017).count() == 3  # history intact
    assert back.filter(F.col("year") == 2018).head().Close == 99.99


def test_statements_conform_to_quarterly_ddl(spark, tmp_path):
    """Financial-statement wide frame -> DDL-named columns -> QUARTERLY
    table with exact DECIMAL money types."""
    from fortune_500_financial_insights_pipeline_spark.pipelines.tabular import (
        statements_wide,
        to_warehouse_columns,
    )

    csv = "\n".join(
        [
            ",2024-03-31,2023-12-31",
            "Total Revenue,90753000000,119575000000",
            "Net Income,23636000000,33916000000",
            "Basic EPS,1.5328,2.1812",
        ]
    )
    d = tmp_path / "q"
    d.mkdir()
    (d / "AAPL.csv").write_text(csv + "\n")
    wide = statements_wide(
        spark, {"AAPL": str(d / "AAPL.csv")},
        ["Total Revenue", "Net Income", "Basic EPS"],
    )
    named = to_warehouse_columns(wide)
    assert {"Total_Revenue", "Net_Income", "Basic_EPS"} <= set(named.columns)

    conformed = WH.conform(named.withColumn("Quarter", F.lit("Q1")), "quarterly")
    fields = {f.name: f.dataType for f in conformed.schema.fields}
    assert str(fields["Total_Revenue"]) == "DecimalType(20,2)"
    assert str(fields["Basic_EPS"]) == "DecimalType(10,4)"
    row = {str(r.Date): r for r in conformed.collect()}
    assert str(row["2024-03-31"].Total_Revenue) == "90753000000.00"
    assert str(row["2024-03-31"].Basic_EPS) == "1.5328"


def test_bucketed_table_has_cbo_stats(spark, sf_dir, tmp_path):
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table

    WH.write_bucketed(
        load_table(spark, sf_dir, "nation"), "nation_b", ["n_nationkey"],
        num_buckets=4, path=str(tmp_path / "nation_b"),
    )
    try:
        desc = spark.sql("DESCRIBE EXTENDED nation_b").collect()
        stats = next((r.data_type for r in desc if r.col_name == "Statistics"), "")
        assert "rows" in stats  # row-count stat recorded for the CBO
    finally:
        spark.sql("DROP TABLE IF EXISTS nation_b")


def test_dynamic_partition_pruning_from_dim_filter(spark, tmp_path):
    """A filter on a joined dim must prune fact partitions at RUNTIME:
    the year-partitioned scan carries a dynamicpruning expression, so at
    100 TB the fact read is bounded by the dim's selectivity, not the
    calendar."""
    base = str(tmp_path / "wh")
    WH.write_table(_sample_openclose(spark), base, "openclose")
    fact = spark.read.parquet(os.path.join(base, "openclose"))
    dim = spark.createDataFrame(
        [(2018, "keep"), (2017, "drop")], "year int, tag string"
    )
    joined = fact.join(dim.filter(F.col("tag") == "keep"), "year")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    assert joined.count() == 1


def test_sql_ddl_dml_roundtrip(spark, tmp_path):
    """Pure-SQL table lifecycle against the session catalog: CREATE TABLE
    USING parquet, INSERT INTO (+ partition overwrite semantics via SQL),
    then query — the DDL surface a BigQuery-style user expects."""
    loc = str(tmp_path / "sqltbl")
    spark.sql(
        f"CREATE TABLE sql_prices (ticker STRING, close DOUBLE, year INT) "
        f"USING parquet PARTITIONED BY (year) LOCATION '{loc}'"
    )
    try:
        spark.sql(
            "INSERT INTO sql_prices VALUES ('AAPL', 180.0, 2023), ('MSFT', 390.5, 2023), ('AAPL', 190.1, 2024)"
        )
        got = {
            (r.ticker, r.year): r.close
            for r in spark.sql("SELECT * FROM sql_prices").collect()
        }
        assert got[("AAPL", 2024)] == 190.1 and len(got) == 3
        # INSERT OVERWRITE a single partition leaves the others intact
        spark.sql(
            "INSERT OVERWRITE sql_prices PARTITION (year=2023) VALUES ('GOOG', 140.0)"
        )
        left = spark.sql(
            "SELECT ticker FROM sql_prices WHERE year = 2023"
        ).collect()
        assert {r.ticker for r in left} == {"GOOG"}
        assert spark.sql("SELECT COUNT(*) AS n FROM sql_prices").head().n == 2
    finally:
        spark.sql("DROP TABLE IF EXISTS sql_prices")


def test_python_udf_callable_from_sql(spark):
    """A registered Python UDF is first-class in the SQL surface."""
    from pyspark.sql.types import DoubleType

    spark.udf.register(
        "pct_change",
        lambda a, b: None if a is None or b is None else (b - a) / a,
        DoubleType(),
    )
    got = spark.sql(
        "SELECT pct_change(CAST(100.0 AS DOUBLE), CAST(110.0 AS DOUBLE)) AS pc"
    ).head().pc
    assert abs(got - 0.1) < 1e-12


def test_analyze_table_feeds_cbo(spark, tmp_path):
    """ANALYZE TABLE puts row/size stats in the catalog, and the optimizer
    picks them up (plan statistics show the exact row count instead of a
    size-based guess)."""
    base = str(tmp_path / "wh")
    WH.write_table(_sample_openclose(spark), base, "openclose")
    stats = WH.analyze_table(spark, base, "openclose", columns=["Ticker", "Close"])
    prev_cbo = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")  # vanilla sessions: off
    try:
        assert "Statistics" in stats and "rows" in stats["Statistics"]
        plan_stats = (
            spark.table("openclose_stats")
            ._jdf.queryExecution().optimizedPlan().stats().toString()
        )
        n = _sample_openclose(spark).count()
        assert f"rowCount={n}" in plan_stats, plan_stats
    finally:
        spark.conf.set("spark.sql.cbo.enabled", prev_cbo)
        spark.sql("DROP TABLE IF EXISTS openclose_stats")


def test_incremental_agg_refresh_equals_full_recompute(spark, sf_dir, tmp_path):
    """Two incremental refreshes (first half, then second half) must land
    exactly where a full recompute lands — mergeable aggregates, no
    history rescan (the rollup path holds only group rows between
    refreshes)."""
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table
    from fortune_500_financial_insights_pipeline_spark.warehouse import incremental_agg_refresh

    orders = load_table(spark, sf_dir, "orders")
    h1 = orders.where(F.col("o_orderkey") % 2 == 0)
    h2 = orders.where(F.col("o_orderkey") % 2 == 1)
    path = str(tmp_path / "rollup")

    incremental_agg_refresh(spark, path, h1, ["o_orderpriority"], ["o_totalprice"])
    got = incremental_agg_refresh(spark, path, h2, ["o_orderpriority"], ["o_totalprice"])

    full = orders.groupBy("o_orderpriority").agg(
        F.sum("o_totalprice").alias("sum_o_totalprice"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
    g = {
        (r["o_orderpriority"], r["n_rows"], round(r["sum_o_totalprice"], 4))
        for r in got.collect()
    }
    f = {
        (r["o_orderpriority"], r["n_rows"], round(r["sum_o_totalprice"], 4))
        for r in full.collect()
    }
    assert g == f


def test_incremental_distinct_via_hll_sketch_column(spark, sf_dir, tmp_path):
    """Incremental DISTINCT maintenance: store the HLL sketch as a binary
    column in the rollup, union-merge it on each refresh. Two half-batch
    refreshes produce the identical sketch (and thus estimate) as one
    full build — the sketch is the mergeable form of count-distinct, the
    piece a sum/count rollup can't provide."""
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table

    orders = load_table(spark, sf_dir, "orders")
    h1 = orders.where(F.col("o_orderkey") % 2 == 0)
    h2 = orders.where(F.col("o_orderkey") % 2 == 1)
    path = str(tmp_path / "hll_rollup")

    def refresh(new_df):
        partial = new_df.groupBy("o_orderpriority").agg(
            F.hll_sketch_agg("o_custkey", 12).alias("sk")
        )
        import os

        if os.path.isdir(path):
            existing = spark.read.parquet(path)
            merged = (
                existing.unionByName(partial)
                .groupBy("o_orderpriority")
                .agg(F.hll_union_agg("sk").alias("sk"))
            )
        else:
            merged = partial
        merged = merged.localCheckpoint()
        merged.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    refresh(h1)
    got = refresh(h2).select(
        "o_orderpriority", F.hll_sketch_estimate("sk").alias("est")
    )
    full = orders.groupBy("o_orderpriority").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey", 12)).alias("est")
    )
    g = {(r["o_orderpriority"], r["est"]) for r in got.collect()}
    f = {(r["o_orderpriority"], r["est"]) for r in full.collect()}
    assert g == f
