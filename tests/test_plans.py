"""Orchestration shim tests: DAG runner semantics + the end-to-end ELT
graph landing DDL-typed warehouse tables (SURVEY.md §7.5)."""

from __future__ import annotations

import json

import pytest

from fortune_500_financial_insights_pipeline_spark.plans.jobs import build_elt_dag
from fortune_500_financial_insights_pipeline_spark.plans.runner import Dag


def test_runner_topological_order_and_results():
    seen = []
    dag = (
        Dag("t")
        .add("c", lambda: seen.append("c"), deps=["a", "b"])
        .add("a", lambda: seen.append("a"))
        .add("b", lambda: seen.append("b"), deps=["a"])
    )
    results = dag.run()
    assert seen == ["a", "b", "c"]
    assert all(r.status == "success" for r in results.values())


def test_runner_failure_skips_downstream_keeps_siblings():
    seen = []

    def boom():
        raise RuntimeError("nope")

    dag = (
        Dag("t")
        .add("a", boom)
        .add("b", lambda: seen.append("b"), deps=["a"])
        .add("c", lambda: seen.append("c"))  # independent branch
    )
    results = dag.run()
    assert results["a"].status == "failed"
    assert "RuntimeError" in results["a"].error
    assert results["b"].status == "skipped"
    assert results["c"].status == "success"
    assert seen == ["c"]


def test_runner_retries():
    attempts = {"n": 0}

    def flaky():
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise ValueError("transient")
        return "ok"

    results = Dag("t").add("a", flaky, retries=2).run()
    assert results["a"].status == "success"
    assert results["a"].attempts == 3


def test_runner_rejects_cycles_and_unknown_deps():
    dag = Dag("t").add("a", lambda: 1, deps=["b"]).add("b", lambda: 2, deps=["a"])
    with pytest.raises(ValueError, match="cycle"):
        dag.run()
    with pytest.raises(ValueError, match="unknown"):
        Dag("t").add("a", lambda: 1, deps=["ghost"]).run()


def test_elt_dag_end_to_end(spark, tmp_path):
    """The full reference graph: raw CSV+JSON fixtures → standardize/flatten
    → DDL-typed warehouse → spark.sql serving."""
    from tests.test_pipelines import API_ROWS, INFO_FULL, INFO_SPARSE, KAGGLE_ROWS

    kaggle = tmp_path / "kaggle"
    api = tmp_path / "api"
    info = tmp_path / "info"
    esg = tmp_path / "esg"
    for d in (kaggle, api, info, esg):
        d.mkdir()
    (kaggle / "aapl.us.txt").write_text("\n".join(KAGGLE_ROWS) + "\n")
    (api / "AAPL.csv").write_text("\n".join(API_ROWS) + "\n")
    (info / "AAPL.json").write_text(json.dumps(INFO_FULL))
    (info / "MSFT.json").write_text(json.dumps(INFO_SPARSE))
    (esg / "AAPL.json").write_text(
        json.dumps({"esgScores": {"totalEsg": 17.2, "peerGroup": "Tech", "peerCount": 40}})
    )

    wh = str(tmp_path / "wh")
    dag = build_elt_dag(
        spark,
        kaggle_glob=str(kaggle / "*.us.txt"),
        api_glob=str(api / "*.csv"),
        info_glob=str(info / "*.json"),
        sustainability_glob=str(esg / "*.json"),
        warehouse_path=wh,
    )
    results = dag.run()
    assert {r.status for r in results.values()} == {"success"}, {
        k: (v.status, v.error) for k, v in results.items()
    }
    assert set(results["register_warehouse"].output) == {
        "openclose",
        "metadata",
        "sustainability",
    }

    # serving SQL over the registered warehouse
    close = spark.sql(
        "SELECT Ticker, MAX(Close) AS mx FROM openclose GROUP BY Ticker"
    ).collect()
    assert {r.Ticker for r in close} == {"AAPL"}
    meta = spark.sql("SELECT Ticker, Sector FROM metadata ORDER BY Ticker").collect()
    assert [r.Ticker for r in meta] == ["AAPL", "MSFT"]
    esg_rows = spark.sql("SELECT Ticker, TotalESG, PeerGroup FROM sustainability").collect()
    assert len(esg_rows) == 1 and str(esg_rows[0].TotalESG) == "17.20"
    assert esg_rows[0].Ticker == "AAPL"


def test_api_entities_dag_lands_all_four_feeds(spark, tmp_path):
    """The Data_API_Ingestion graph: four independent per-ticker CSV feeds
    → DDL-typed warehouse tables → spark.sql serving, including the
    ingested-only earnings_estimates/options_chain the reference never
    transforms."""
    from tests.test_pipelines import CALLS_CSV, DIVIDEND_CSV, ESTIMATES_CSV, PUTS_CSV, RECS_CSV

    from fortune_500_financial_insights_pipeline_spark.plans.jobs import build_api_entities_dag

    div, recs, est, opts = (tmp_path / n for n in ("div", "recs", "est", "opts"))
    for d in (div, recs, est, opts):
        d.mkdir()
    (div / "AAPL.csv").write_text(DIVIDEND_CSV + "\n")
    (recs / "AAPL.csv").write_text(RECS_CSV + "\n")
    (est / "AAPL.csv").write_text(ESTIMATES_CSV + "\n")
    (opts / "calls_AAPL.csv").write_text(CALLS_CSV + "\n")
    (opts / "puts_AAPL.csv").write_text(PUTS_CSV + "\n")

    wh = str(tmp_path / "wh")
    dag = build_api_entities_dag(
        spark,
        dividends_glob=str(div / "*.csv"),
        recs_glob=str(recs / "*.csv"),
        estimates_glob=str(est / "*.csv"),
        options_glob=str(opts / "*.csv"),
        warehouse_path=wh,
        as_of="2024-06-15",
    )
    results = dag.run()
    assert {r.status for r in results.values()} == {"success"}, {
        k: (v.status, v.error) for k, v in results.items()
    }
    assert {
        "dividend_history",
        "analystreccomendations",
        "earnings_estimates",
        "options_chain",
    } <= set(results["register_warehouse"].output)

    atm = spark.sql(
        "SELECT OptionType, COUNT(*) AS n FROM options_chain "
        "WHERE InTheMoney GROUP BY OptionType ORDER BY OptionType"
    ).collect()
    assert [(r.OptionType, r.n) for r in atm] == [("call", 2), ("put", 1)]
    est_row = spark.sql(
        "SELECT Avg FROM earnings_estimates WHERE Period = '0y'"
    ).head()
    assert str(est_row.Avg) == "7.3200"


def test_statements_dag_lands_quarterly(spark, tmp_path):
    from fortune_500_financial_insights_pipeline_spark.plans.jobs import build_statements_dag

    csv = "\n".join(
        [
            ",2024-03-31,2023-12-31",
            "Total Revenue,90753000000,119575000000",
            "Net Income,23636000000,33916000000",
        ]
    )
    d = tmp_path / "stmts"
    d.mkdir()
    (d / "AAPL.csv").write_text(csv + "\n")
    (d / "MSFT.csv").write_text(csv + "\n")

    wh = str(tmp_path / "wh")
    dag = build_statements_dag(
        spark,
        sheet_files={"quarterly": {"AAPL": str(d / "AAPL.csv"), "MSFT": str(d / "MSFT.csv")}},
        interest_items={"quarterly": ["Total Revenue", "Net Income"]},
        warehouse_path=wh,
    )
    results = dag.run()
    assert {r.status for r in results.values()} == {"success"}, {
        k: (v.status, v.error) for k, v in results.items()
    }
    rows = spark.sql(
        "SELECT Ticker, Date, Total_Revenue FROM quarterly ORDER BY Ticker, Date"
    ).collect()
    assert len(rows) == 4  # 2 tickers x 2 periods
    assert str(rows[1].Total_Revenue) == "90753000000.00"  # DECIMAL(20,2)


def test_refresh_dag_is_incremental_and_idempotent(spark, tmp_path):
    from fortune_500_financial_insights_pipeline_spark.plans.jobs import build_refresh_dag

    wh = str(tmp_path / "wh")
    first = build_refresh_dag(spark, ["AAPL", "MSFT"], "2024-01-01", 7, wh).run()
    assert all(r.status == "success" for r in first.values())
    n1 = spark.sql("SELECT COUNT(*) AS n FROM openclose").head().n
    assert n1 == 2 * 5  # 5 weekdays x 2 tickers

    # overlapping re-run + extension: idempotent on overlap, adds the tail
    second = build_refresh_dag(spark, ["AAPL", "MSFT"], "2024-01-01", 14, wh).run()
    assert all(r.status == "success" for r in second.values())
    n2 = spark.sql("SELECT COUNT(*) AS n FROM openclose").head().n
    assert n2 == 2 * 10  # no duplicates from the overlapping window
    dup = spark.sql(
        "SELECT Ticker, Date, COUNT(*) c FROM openclose GROUP BY 1,2 HAVING COUNT(*) > 1"
    ).count()
    assert dup == 0
