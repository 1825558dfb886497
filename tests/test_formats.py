"""Storage-format matrix: every format the engine reads/writes round-trips
with schema fidelity (parquet is the canonical warehouse format; CSV/JSON
mirror the reference's raw/landing layers; ORC is the remaining columnar
format Spark ships natively)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.catalog import load_table


@pytest.fixture(scope="module")
def sample(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").limit(200).cache()


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_round_trip(spark, sample, tmp_path, fmt):
    path = str(tmp_path / fmt)
    writer = sample.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        writer = writer.option("header", True)
    writer.save(path)

    reader = spark.read.format(fmt)
    if fmt in ("csv", "json"):
        # text formats don't carry types: re-apply the schema (the engine's
        # bronze-layer contract — explicit schemas, never inference)
        reader = reader.schema(sample.schema)
    if fmt == "csv":
        reader = reader.option("header", True)
    back = reader.load(path)

    assert back.schema == sample.schema
    key = [r.o_orderkey for r in sample.select("o_orderkey").collect()]
    assert sorted(r.o_orderkey for r in back.select("o_orderkey").collect()) == sorted(key)
    # value fidelity on a non-key column
    want = {r.o_orderkey: r.o_totalprice for r in sample.collect()}
    got = {r.o_orderkey: r.o_totalprice for r in back.collect()}
    assert got == want


def test_jsonl_sink_is_newline_delimited(spark, sample, tmp_path):
    """The landing JSONL contract (S8/S10): one object per line, readable
    back as NDJSON."""
    import glob as globmod
    import json

    path = str(tmp_path / "jsonl")
    sample.select("o_orderkey", "o_orderstatus").coalesce(1).write.json(path)
    part = next(p for p in globmod.glob(path + "/part-*") if not p.endswith(".crc"))
    with open(part) as fh:
        first = fh.readline().strip()
    obj = json.loads(first)
    assert set(obj) <= {"o_orderkey", "o_orderstatus"}


def test_partitioned_write_prunes_and_preserves(spark, sf_dir, tmp_path):
    """partitionBy layout: values survive the round trip and the partition
    column is directory-encoded (S6 semantics)."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "ship_year", F.year("l_shipdate")
    )
    path = str(tmp_path / "byyear")
    li.write.partitionBy("ship_year").mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    assert back.count() == li.count()
    years = {r.ship_year for r in back.select("ship_year").distinct().collect()}
    assert years == {r.ship_year for r in li.select("ship_year").distinct().collect()}


def test_corrupt_json_quarantine(spark, tmp_path):
    from pyspark.sql import types as T

    from fortune_500_financial_insights_pipeline_spark.sources.resilient import (
        read_json_resilient,
        split_corrupt,
    )

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "name": "ok"}\n'
        'this is not json at all\n'
        '{"id": 2, "name": "fine"}\n'
        '{"id": "not-a-number", "name": 3}\n'
    )
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
    )
    clean, quarantine = split_corrupt(read_json_resilient(spark, str(p), schema))
    ids = sorted(r.id for r in clean.collect())
    assert ids == [1, 2]
    bad = [r._corrupt_record for r in quarantine.collect()]
    assert len(bad) == 2
    assert any("not json" in b for b in bad)  # raw text preserved for replay


def test_corrupt_csv_quarantine(spark, tmp_path):
    from pyspark.sql import types as T

    from fortune_500_financial_insights_pipeline_spark.sources.resilient import (
        read_csv_resilient,
        split_corrupt,
    )

    p = tmp_path / "in.csv"
    p.write_text("id,qty\n1,10\n2,notanumber\n3,30\n")
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("qty", T.LongType())]
    )
    clean, quarantine = split_corrupt(read_csv_resilient(spark, str(p), schema))
    assert sorted(r.id for r in clean.collect()) == [1, 3]
    assert quarantine.count() == 1


def test_market_api_datasource(spark):
    """Custom Python DataSource (Spark 4): the API feed as a registered
    format — one partition per ticker, deterministic rows, weekend gaps."""
    from fortune_500_financial_insights_pipeline_spark.sources import market_api

    market_api.register(spark)
    df = (
        spark.read.format("market_api")
        .option("tickers", "AAPL,MSFT,GOOG")
        .option("start", "2024-01-01")
        .option("days", "14")
        .load()
    )
    assert [f.name for f in df.schema.fields] == [
        "Ticker", "Date", "Open", "High", "Low", "Close", "Volume",
    ]
    rows = df.collect()
    assert {r.Ticker for r in rows} == {"AAPL", "MSFT", "GOOG"}
    assert len(rows) == 3 * 10  # 14 calendar days = 10 weekdays
    assert all(r.Date.weekday() < 5 for r in rows)
    assert all(r.Low <= min(r.Open, r.Close) <= max(r.Open, r.Close) <= r.High for r in rows)
    # one input partition per ticker
    assert df.rdd.getNumPartitions() == 3
    # deterministic across re-reads
    again = spark.read.format("market_api").option("tickers", "AAPL,MSFT,GOOG").option(
        "start", "2024-01-01").option("days", "14").load().collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_market_api_feeds_standardize(spark):
    """The custom source plugs straight into the bronze->silver pipeline:
    conform to the warehouse schema and serve."""
    from fortune_500_financial_insights_pipeline_spark import warehouse as WH
    from fortune_500_financial_insights_pipeline_spark.sources import market_api

    market_api.register(spark)
    df = (
        spark.read.format("market_api")
        .option("tickers", "AAPL").option("start", "2024-01-01").option("days", "7")
        .load()
    )
    conformed = WH.conform(df, "openclose")
    got = conformed.select("Ticker", "Date", "Volume").collect()
    assert len(got) == 5
    assert all(isinstance(r.Volume, int) for r in got)  # DDL BIGINT


def test_market_api_stream_matches_batch(spark, tmp_path):
    """The streaming form of the custom data source delivers exactly the
    batch rows, exactly once, across several microbatch offset ranges."""
    from fortune_500_financial_insights_pipeline_spark.sources.market_api import register

    register(spark)
    opts = {"tickers": "AAPL,MSFT", "start": "2024-01-02"}
    batch = spark.read.format("market_api").options(**opts, days="30").load()
    expected = {tuple(map(str, r)) for r in batch.collect()}

    q = (
        spark.readStream.format("market_api")
        .options(**opts, batch_days="7", max_days="30")
        .load()
        .writeStream.format("memory")
        .queryName("mkt_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            tuple(map(str, r)) for r in spark.sql("SELECT * FROM mkt_stream").collect()
        }
        n_rows = spark.sql("SELECT COUNT(*) FROM mkt_stream").head()[0]
    finally:
        q.stop()
    assert got == expected
    assert n_rows == len(expected)  # exactly once: no replayed duplicates


def test_load_table_coerces_schema_drift(spark, sf_dir, tmp_path):
    """The driver regenerates fixture parquet between rounds and has shifted
    physical types before (TIMESTAMP(NANOS) → naive timestamp[us]). Simulate
    the next likely drifts — narrowed keys, decimal prices, date-typed
    shipdate — and require load_table to hand back the canonical schema
    every query and oracle is written against."""
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem").limit(100)
    drifted = li.selectExpr(
        "cast(l_orderkey as int) as l_orderkey",
        "cast(l_partkey as int) as l_partkey",
        "cast(l_suppkey as int) as l_suppkey",
        "cast(l_linenumber as smallint) as l_linenumber",
        "cast(l_quantity as decimal(12,2)) as l_quantity",
        "cast(l_extendedprice as decimal(12,2)) as l_extendedprice",
        "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "cast(l_shipdate as date) as l_shipdate",
    )
    drifted.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    back = load_table(spark, str(tmp_path), "lineitem")
    got = {f.name: f.dataType.simpleString() for f in back.schema.fields}
    assert got["l_orderkey"] == "bigint"
    assert got["l_linenumber"] == "int"
    assert got["l_quantity"] == "double"
    assert got["l_shipdate"] == "timestamp"
    # and an untouched read stays cast-free: same plan as a bare scan
    clean = load_table(spark, sf_dir, "lineitem")
    assert "cast" not in clean._jdf.queryExecution().optimizedPlan().toString().lower()
