"""CLI + universe-filter + observation tests."""

from __future__ import annotations

import json

from pyspark.sql import functions as F


def test_universe_filter_broadcasts(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table
    from fortune_500_financial_insights_pipeline_spark.operators.standardize import (
        filter_to_universe,
    )

    df = load_table(spark, sf_dir, "customer").withColumn(
        "Ticker", F.concat(F.lit("T"), (F.col("c_custkey") % 30).cast("string"))
    )
    universe = spark.createDataFrame([("t1",), ("T2",), ("T3",)], "Ticker string")
    got = filter_to_universe(df, universe)
    assert set(r.Ticker for r in got.select("Ticker").distinct().collect()) == {
        "T1", "T2", "T3"  # case-normalized dimension
    }
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_observed_metrics_ride_the_action(spark, sf_dir):
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table
    from fortune_500_financial_insights_pipeline_spark.checks import observed

    o = load_table(spark, sf_dir, "orders")
    df, obs = observed(
        o, "load_metrics",
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("o_totalprice") > 300000).cast("long")).alias("n_big"),
    )
    n = df.filter(F.col("o_orderkey") >= 0).count()  # one action
    got = obs.get
    assert got["n_rows"] == n
    assert 0 < got["n_big"] < n


def test_cli_elt_and_serve(spark, tmp_path, capsys):
    from tests.test_pipelines import API_ROWS, INFO_FULL, KAGGLE_ROWS

    from fortune_500_financial_insights_pipeline_spark import cli

    kaggle = tmp_path / "kaggle"
    api = tmp_path / "api"
    info = tmp_path / "info"
    esg = tmp_path / "esg"
    for d in (kaggle, api, info, esg):
        d.mkdir()
    (kaggle / "aapl.us.txt").write_text("\n".join(KAGGLE_ROWS) + "\n")
    (api / "AAPL.csv").write_text("\n".join(API_ROWS) + "\n")
    (info / "AAPL.json").write_text(json.dumps(INFO_FULL))
    (esg / "AAPL.json").write_text(json.dumps({"esgScores": {"totalEsg": 17.2}}))
    wh = str(tmp_path / "wh")

    # patch get_spark so the CLI reuses the test session (and doesn't stop it)
    import fortune_500_financial_insights_pipeline_spark.session as sess

    orig_get, orig_stop = sess.get_spark, spark.stop
    sess.get_spark = lambda **kw: spark
    spark.stop = lambda: None
    try:
        rc = cli.main([
            "elt", "--kaggle", str(kaggle / "*.us.txt"), "--api", str(api / "*.csv"),
            "--info", str(info / "*.json"), "--esg", str(esg / "*.json"),
            "--warehouse", wh,
        ])
        assert rc == 0
        statuses = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
        assert {s["status"] for s in statuses} == {"success"}

        rc = cli.main(["serve", "--warehouse", wh, "--query", "yearly_price_summary"])
        assert rc == 0
        rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
        assert rows and rows[0]["Ticker"] == "AAPL"

        rc = cli.main([
            "serve", "--warehouse", wh, "--sql",
            "--query", "SELECT COUNT(*) AS n FROM openclose",
        ])
        assert rc == 0
        out = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
        # 3 valid kaggle + 2 api rows, minus the deduped overlap date
        assert out[0]["n"] == 4
    finally:
        sess.get_spark = orig_get
        spark.stop = orig_stop
