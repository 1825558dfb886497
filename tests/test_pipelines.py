"""Reference-parity pipeline tests on reference-shaped fixtures
(FIXTURES.md §2): Kaggle/API OHLCV CSVs, statement CSVs, info/ESG JSON.
Asserts the §2.7 invariants the reference's operators silently encode."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.pipelines.entity_json import (
    info_pipeline,
    sustainability_pipeline,
)
from fortune_500_financial_insights_pipeline_spark.pipelines.open_close import (
    open_close,
    write_open_close,
)
from fortune_500_financial_insights_pipeline_spark.pipelines.tabular import statements_wide

KAGGLE_ROWS = [
    "Date,Open,High,Low,Close,Volume,OpenInt",
    "2017-11-08,100.0,101.5,99.0,101.0,\"1,234,567\",0",
    "2017-11-09,101.0,102.0,100.0,101.5,2000000,0",
    "2017-11-10,101.5,103.0,101.0,102.5,\"2,500,000\",0",
    "not-a-date,1.0,1.0,1.0,1.0,10,0",  # must be quarantined
]

API_ROWS = [
    "Price,AdjClose,Close,High,Low,Open,Volume",  # 4 metadata rows
    "Ticker,AAPL,AAPL,AAPL,AAPL,AAPL,AAPL",
    "Date,,,,,,",
    ",,,,,,",
    "2017-11-10,102.0,102.6,103.1,101.2,101.6,\"2,600,000\"",  # overlap date
    "2017-11-13,102.5,103.0,103.5,102.0,102.6,2700000",
]


@pytest.fixture(scope="module")
def ohlcv_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("ohlcv")
    kaggle = root / "kaggle"
    api = root / "api"
    kaggle.mkdir()
    api.mkdir()
    (kaggle / "aapl.us.txt").write_text("\n".join(KAGGLE_ROWS) + "\n")
    (kaggle / "msft.us.txt").write_text("\n".join(KAGGLE_ROWS) + "\n")
    (api / "AAPL.csv").write_text("\n".join(API_ROWS) + "\n")
    (api / "MSFT.csv").write_text("\n".join(API_ROWS) + "\n")
    return str(kaggle / "*.us.txt"), str(api / "*.csv")


def test_open_close_parity_mode(spark, ohlcv_dirs, tmp_path):
    kaggle_glob, api_glob = ohlcv_dirs
    df = open_close(spark, kaggle_glob, api_glob, dedup=False)
    assert [f.name for f in df.schema.fields] == [
        "Date", "Open", "High", "Low", "Close", "Volume", "Source", "year", "Ticker",
    ]
    rows = df.collect()
    # 3 valid kaggle + 2 api rows per ticker, invalid date dropped
    assert len(rows) == 2 * (3 + 2)
    assert all(r["Date"] is not None for r in rows)
    # de-comma'd volumes are numeric doubles
    vols = {r["Volume"] for r in rows}
    assert 1234567.0 in vols and 2600000.0 in vols
    # overlap date duplicated, distinguished only by Source (raw-union parity)
    overlap = [r for r in rows if str(r["Date"]) == "2017-11-10" and r["Ticker"] == "AAPL"]
    assert {r["Source"] for r in overlap} == {"Kaggle", "API"}
    # round-trip through the year-partitioned sink
    out = str(tmp_path / "oc")
    write_open_close(df, out)
    back = spark.read.parquet(out)
    assert back.count() == len(rows)
    assert set(back.select("year").distinct().toPandas()["year"]) == {2017}


def test_open_close_dedup_mode(spark, ohlcv_dirs):
    kaggle_glob, api_glob = ohlcv_dirs
    df = open_close(spark, kaggle_glob, api_glob, dedup=True)
    rows = df.collect()
    # unique (Ticker, Date) as the DDL intends
    keys = [(r["Ticker"], r["Date"]) for r in rows]
    assert len(keys) == len(set(keys))
    # API wins the overlap date
    overlap = [r for r in rows if str(r["Date"]) == "2017-11-10" and r["Ticker"] == "AAPL"]
    assert len(overlap) == 1 and overlap[0]["Source"] == "API"


STATEMENT_CSV = "\n".join(
    [
        ",2023-12-31,2022-12-31",
        "Total Revenue,394328000000,365817000000",
        "Net Income,96995000000,94680000000",
        "Secret Sauce,1,2",  # not in interest list -> filtered
        "Gross Profit,,152836000000",  # empty cell
    ]
)

INTEREST = ["Total Revenue", "Net Income", "Gross Profit"]


def test_statements_wide(spark, tmp_path):
    d = tmp_path / "stmts"
    d.mkdir()
    (d / "AAPL.csv").write_text(STATEMENT_CSV + "\n")
    (d / "MSFT.csv").write_text(STATEMENT_CSV + "\n")
    wide = statements_wide(
        spark, {"AAPL": str(d / "AAPL.csv"), "MSFT": str(d / "MSFT.csv")}, INTEREST
    )
    assert wide.columns == ["Ticker", "Date"] + INTEREST
    pdf = wide.toPandas().set_index(["Ticker", "Date"]).sort_index()
    assert len(pdf) == 4  # 2 tickers x 2 periods
    assert pdf.loc[("AAPL", "2023-12-31"), "Total Revenue"] == 394328000000.0
    # filtered line-item never becomes a column; empty cell -> null
    assert "Secret Sauce" not in wide.columns
    assert pdf.loc[("AAPL", "2023-12-31"), "Gross Profit"] != pdf.loc[("AAPL", "2023-12-31"), "Gross Profit"]  # NaN


INFO_FULL = {
    "symbol": "AAPL",
    "shortName": "Apple Inc.",
    "industry": "Consumer Electronics",
    "sector": "Technology",
    "fullTimeEmployees": 161000,
    "totalRevenue": 394328000000.0,
    "address1": "One Apple Park Way",
    "city": "Cupertino",
    "state": "CA",
    "zip": "95014",
    "website": "https://www.apple.com",
    "extraneousKey": "ignored",
}
INFO_SPARSE = {"symbol": "MSFT", "fullTimeEmployees": 221000}


def test_info_flatten(spark, tmp_path):
    d = tmp_path / "info"
    d.mkdir()
    (d / "AAPL.json").write_text(json.dumps(INFO_FULL))
    (d / "MSFT.json").write_text(json.dumps(INFO_SPARSE))
    out = info_pipeline(spark, str(d / "*.json"))
    assert len(out.columns) == 11
    assert "address" in out.columns and "address1" not in out.columns
    rows = {r["symbol"]: r for r in out.collect()}
    assert rows["AAPL"]["address"] == "One Apple Park Way"
    # missing string keys default to "" (reference: data.get(k, ""))
    assert rows["MSFT"]["industry"] == ""
    assert rows["MSFT"]["fullTimeEmployees"] == 221000


ESG_FULL = {
    "esgScores": {
        "totalEsg": 17.2,
        "environmentScore": 2.1,
        "socialScore": 9.8,
        "governanceScore": 5.3,
        "percentile": 33.0,
        "ratingYear": 2024,
        "ratingMonth": 9,
        "maxAge": 86400,
        "peerCount": 40,
        "esgPerformance": "AVG_PERF",
        "peerGroup": "Retailing",
        "adult": False,
        "alcoholic": False,
        "animalTesting": False,
        "catholic": False,
        "coal": True,
        "controversialWeapons": False,
        "furLeather": False,
        "gambling": False,
        "militaryContract": False,
        "nuclear": False,
        "palmOil": False,
        "pesticides": False,
        "smallArms": False,
        "tobacco": False,
        "environmentPercentile": None,
        "peerEnvironmentPerformance": {"min": 1.0, "avg": 6.3, "max": 14.6},
        "peerEsgScorePerformance": {"min": 7.6, "avg": 17.9, "max": 28.2},
        "peerGovernancePerformance": {"min": 3.0, "avg": 6.6, "max": 11.8},
        "peerSocialPerformance": {"min": 2.2, "avg": 5.0, "max": 10.6},
        "peerHighestControversyPerformance": {"min": 0.0, "avg": 2.1, "max": 4.0},
    }
}


def test_sustainability_flatten(spark, tmp_path):
    d = tmp_path / "esg"
    d.mkdir()
    (d / "AMZN.json").write_text(json.dumps(ESG_FULL))
    (d / "EMPTY.json").write_text(json.dumps({"someOtherKey": 1}))  # esgScores absent
    out = sustainability_pipeline(spark, str(d / "*.json"))
    assert len(out.columns) == 31
    rows = out.collect()
    full = next(r for r in rows if r["totalEsg"] is not None)
    empty = next(r for r in rows if r["totalEsg"] is None)
    assert full["peerEnvironmentPerformance_avg"] == 6.3
    assert full["coal"] is True
    assert full["environmentPercentile"] is None
    # wholly-missing esgScores -> defaults everywhere
    assert empty["esgPerformance"] == "" and empty["peerCount"] is None


def test_multimodal_plumbing(spark, sf_dir):
    """Binary payload column + Arrow mapInPandas feature extraction."""
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table
    from fortune_500_financial_insights_pipeline_spark.operators.multimodal import (
        attach_media,
        extract_features,
    )

    d = load_table(spark, sf_dir, "documents").limit(50)
    media = attach_media(d)
    assert dict(media.dtypes)["media"] == "binary"
    feats = extract_features(media, fake=True)
    rows = feats.collect()
    assert len(rows) == 50
    assert all(len(r["feature"]) == 8 for r in rows)
    assert all(16 <= r["width"] < 256 for r in rows)
    # deterministic: same payload -> same feature
    again = {r["doc_id"]: r["feature"] for r in extract_features(media, fake=True).collect()}
    assert all(again[r["doc_id"]] == r["feature"] for r in rows)


def test_decode_stub_raises():
    from fortune_500_financial_insights_pipeline_spark.operators.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"payload", fake=False)


DIVIDEND_CSV = "\n".join(
    [
        "Date,Dividends",
        "2024-02-09 00:00:00-05:00,0.24",
        "2024-05-10 00:00:00-04:00,0.25",
        "bogus,1.0",
    ]
)

RECS_CSV = "\n".join(
    [
        "Date,Period,StrongBuy,Buy,Hold,Sell,StrongSell",
        "2024-03-01,0m,10,21,8,1,0",
        "2024-03-01,-1m,9,22,8,2,0",
    ]
)

ESTIMATES_CSV = "\n".join(
    [
        "period,numberOfAnalysts,avg,low,high,yearAgoEps,growth",
        "0q,28,2.35,2.19,2.53,2.18,0.0779",
        "+1q,27,1.7,1.55,1.82,1.4,0.2142",
        "0y,41,7.32,7.11,7.65,6.57,0.1141",
        "+1y,41,8.31,7.41,9.16,7.32,0.1352",
    ]
)

CALLS_CSV = "\n".join(
    [
        "idx," + "contractSymbol,lastTradeDate,strike,lastPrice,bid,ask,change,"
        "percentChange,volume,openInterest,impliedVolatility,inTheMoney,"
        "contractSize,currency",
        "0,AAPL240621C00150000,2024-06-14 19:59:59+00:00,150.0,62.3,61.9,62.7,"
        "1.2,1.96,105,2011,0.4321,True,REGULAR,USD",
        "1,AAPL240621C00210000,2024-06-14 19:58:01+00:00,210.0,4.05,4.0,4.1,"
        "-0.3,-6.89,5210,11025,0.2211,True,REGULAR,USD",
        "2,AAPL240621C00260000,2024-06-13 15:10:00+00:00,260.0,0.12,0.11,0.13,"
        "0.0,0.0,380,9907,0.1918,False,REGULAR,USD",
    ]
)

PUTS_CSV = "\n".join(
    [
        "idx," + "contractSymbol,lastTradeDate,strike,lastPrice,bid,ask,change,"
        "percentChange,volume,openInterest,impliedVolatility,inTheMoney,"
        "contractSize,currency",
        "0,AAPL240621P00200000,2024-06-14 18:22:10+00:00,200.0,1.31,1.29,1.33,"
        "0.05,3.96,801,5902,0.2533,False,REGULAR,USD",
        "1,AAPL240621P00230000,2024-06-14 19:01:44+00:00,230.0,18.75,18.5,19.0,"
        "-0.9,-4.58,44,310,0.2711,True,REGULAR,USD",
    ]
)


def test_dividends_pipeline_to_warehouse(spark, tmp_path):
    from fortune_500_financial_insights_pipeline_spark import warehouse as WH
    from fortune_500_financial_insights_pipeline_spark.pipelines.entity_csv import dividends

    d = tmp_path / "div"
    d.mkdir()
    (d / "AAPL.csv").write_text(DIVIDEND_CSV + "\n")
    df = dividends(spark, str(d / "*.csv"))
    rows = df.collect()
    assert len(rows) == 2  # bogus date quarantined
    assert {r.Ticker for r in rows} == {"AAPL"}
    # tz-suffixed timestamps parse on the date prefix
    assert {str(r.Date) for r in rows} == {"2024-02-09", "2024-05-10"}

    WH.write_table(df, str(tmp_path / "wh"), "dividend_history")
    back = spark.read.parquet(str(tmp_path / "wh" / "dividend_history"))
    amt = {str(r.Date): str(r.Dividends) for r in back.collect()}
    assert amt["2024-02-09"] == "0.24"  # DECIMAL(20,2) exact


def test_analyst_recs_pipeline(spark, tmp_path):
    from fortune_500_financial_insights_pipeline_spark.pipelines.entity_csv import (
        analyst_recommendations,
    )

    d = tmp_path / "recs"
    d.mkdir()
    (d / "MSFT.csv").write_text(RECS_CSV + "\n")
    df = analyst_recommendations(spark, str(d / "*.csv"))
    rows = {r.Period: r for r in df.collect()}
    assert rows["0m"].StrongBuy == 10 and rows["-1m"].Sell == 2
    assert df.schema["StrongBuy"].dataType.typeName() == "integer"


def test_earnings_estimates_pipeline_to_warehouse(spark, tmp_path):
    """The ingested-only earnings-estimate feed lands as a DDL-typed table:
    per-ticker point-in-time snapshot, load-date stamped, DECIMAL(10,4)
    EPS ratios exact after the warehouse conform."""
    from fortune_500_financial_insights_pipeline_spark import warehouse as WH
    from fortune_500_financial_insights_pipeline_spark.pipelines.entity_csv import earnings_estimates

    d = tmp_path / "est"
    d.mkdir()
    (d / "AAPL.csv").write_text(ESTIMATES_CSV + "\n")
    (d / "MSFT.csv").write_text(ESTIMATES_CSV + "\n")
    df = earnings_estimates(spark, str(d / "*.csv"), as_of="2024-06-15")
    assert df.count() == 8  # 4 periods × 2 tickers
    assert {r.Ticker for r in df.collect()} == {"AAPL", "MSFT"}

    typed = WH.add_surrogate_key(df, ["Ticker", "Period", "Date"])
    WH.write_table(typed, str(tmp_path / "wh"), "earnings_estimates")
    back = spark.read.parquet(str(tmp_path / "wh" / "earnings_estimates"))
    row = {
        (r.Ticker, r.Period): r
        for r in back.collect()
    }[("AAPL", "+1q")]
    assert str(row.Avg) == "1.7000"  # DECIMAL(10,4) exact
    assert str(row.Date) == "2024-06-15"
    assert row.NumberOfAnalysts == 27
    assert row.ID is not None


def test_options_chain_pipeline_and_strike_range_join(spark, tmp_path):
    """calls_/puts_ files collapse to ONE glob scan with OptionType
    recovered from the filename; the DDL conform lands exact DECIMAL
    strikes; the near-money strike-range join keeps only contracts within
    ±10% of spot via a broadcast join (plan-checked: no cartesian)."""
    from fortune_500_financial_insights_pipeline_spark import warehouse as WH
    from fortune_500_financial_insights_pipeline_spark.pipelines.entity_csv import (
        near_money_options,
        options_chain,
    )

    d = tmp_path / "opts"
    d.mkdir()
    (d / "calls_AAPL.csv").write_text(CALLS_CSV + "\n")
    (d / "puts_AAPL.csv").write_text(PUTS_CSV + "\n")
    df = options_chain(spark, str(d / "*.csv"), as_of="2024-06-15")
    rows = df.collect()
    assert len(rows) == 5
    assert {r.OptionType for r in rows} == {"call", "put"}
    assert all(r.Ticker == "AAPL" for r in rows)

    typed = WH.add_surrogate_key(df, ["ContractSymbol", "Date"])
    WH.write_table(typed, str(tmp_path / "wh"), "options_chain")
    back = spark.read.parquet(str(tmp_path / "wh" / "options_chain"))
    strikes = {str(r.Strike) for r in back.collect()}
    assert "210.00" in strikes  # DECIMAL(20,2) exact

    spot = spark.createDataFrame([("AAPL", 212.5)], "Ticker string, Close double")
    near = near_money_options(back, spot, pct=0.10)
    got = {(r.OptionType, str(r.Strike)) for r in near.collect()}
    # 10% band around 212.5 = [191.25, 233.75]: keeps 210C, 200P, 230P
    assert got == {("call", "210.00"), ("put", "200.00"), ("put", "230.00")}
    plan = near._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "Cartesian" not in plan


def test_multimodal_frame_sampling(spark, sf_dir):
    """1->N mapInPandas: each media row yields fps*duration frame rows,
    deterministic features, no shuffle in the plan."""
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table
    from fortune_500_financial_insights_pipeline_spark.operators.multimodal import (
        attach_media,
        sample_frames,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 5)
    media = attach_media(docs)
    frames = sample_frames(media, fps=2.0, duration_s=3.0)
    rows = frames.collect()
    assert len(rows) == 5 * 6  # ceil(3s * 2fps) frames per doc
    one = [r for r in rows if r.doc_id == rows[0].doc_id]
    assert [r.frame_idx for r in sorted(one, key=lambda r: r.frame_idx)] == list(range(6))
    assert all(len(r.feature) == 8 for r in rows)
    assert abs(one[1].frame_ts - 0.5) < 1e-9  # 2 fps spacing
    # determinism: same inputs -> same features
    again = {(r.doc_id, r.frame_idx): r.feature for r in sample_frames(media, 2.0, 3.0).collect()}
    for r in rows:
        assert again[(r.doc_id, r.frame_idx)] == r.feature
    plan = frames._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # partition-preserving


def test_training_data_curation_funnel(spark, sf_dir, tmp_path):
    """End-to-end curation: every stage of the funnel removes what it
    should, the report counts are consistent, and the landed parquet is
    partitioned and re-readable."""
    from fortune_500_financial_insights_pipeline_spark.pipelines.training_data import (
        curate,
        write_curated,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # plant one exact dup and one near-dup of doc 0 with fresh ids
    base = docs.limit(1).select(
        F.lit(900001).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    near = docs.limit(1).select(
        F.lit(900002).alias("doc_id"),
        F.concat("text", F.lit(" tailword")).alias("text"),
        "lang", "source", "n_chars",
    )
    # a boilerplate doc (one bigram dominates) and a doc carrying PII
    rep = docs.limit(1).select(
        F.lit(900003).alias("doc_id"),
        F.lit("the spam ham of " * 20 + "end").alias("text"),
        "lang", "source", "n_chars",
    )
    pii = docs.limit(1).select(
        F.lit(900004).alias("doc_id"),
        F.lit(
            "the report for a customer is at bob@x.io and the data is "
            "in the table with a key for the join and a value to read"
        ).alias("text"),
        "lang", "source", "n_chars",
    )
    corpus = (
        docs.unionByName(base).unionByName(near).unionByName(rep).unionByName(pii)
    )

    chunks, report = curate(
        corpus, min_quality=0.3, min_jaccard=0.5, sample_fraction=0.5
    )
    assert report.n_raw == docs.count() + 4
    # the exact dup dies in stage 1, the near dup in stage 2
    assert report.n_after_exact_dedup == report.n_raw - 1
    assert report.n_after_neardup < report.n_after_exact_dedup
    assert report.n_after_quality <= report.n_after_neardup
    # the boilerplate plant dies in the repetition gate; nothing else does
    assert report.n_after_repetition == report.n_after_quality - 1
    # the planted email was counted; NO chunk anywhere carries raw PII,
    # and the pii doc's chunks (if the 0.5 sample kept any) carry the tag
    assert report.n_pii_redactions >= 1
    assert chunks.where(F.col("chunk_text").contains("bob@x.io")).count() == 0
    # the email sits in the doc's first 32 tokens: if the sample kept
    # chunk 0, that chunk must carry the tag (later chunks needn't)
    first = chunks.where(
        (F.col("doc_id") == 900004) & (F.col("chunk_index") == 0)
    )
    if first.count() > 0:
        assert first.where(F.col("chunk_text").contains("<EMAIL>")).count() == 1
    assert 0 < report.n_sampled_chunks < report.n_chunks
    # survivors keep the min id: the planted copies never outlive doc 0
    ids = {r.doc_id for r in chunks.select("doc_id").distinct().collect()}
    assert 900001 not in ids and 900002 not in ids
    # metadata columns ride through the 1→N expansion
    assert {"lang", "source"} <= set(chunks.columns)

    out = str(tmp_path / "curated")
    write_curated(chunks, out, partition_col="lang")
    back = spark.read.parquet(out)
    assert back.count() == report.n_sampled_chunks
    assert "lang=" in str((tmp_path / "curated").iterdir().__next__())


def test_curation_sample_is_partition_invariant(spark, sf_dir):
    """The sampled chunk set must be a pure function of the data — not of
    partitioning, scheduling, or which executor ran what."""
    from fortune_500_financial_insights_pipeline_spark.pipelines.training_data import curate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a, _ = curate(docs, sample_fraction=0.3)
    b, _ = curate(docs.repartition(13), sample_fraction=0.3)
    ka = sorted((r.doc_id, r.chunk_index) for r in a.collect())
    kb = sorted((r.doc_id, r.chunk_index) for r in b.collect())
    assert ka == kb


def test_publish_open_close_wap_failed_audit_keeps_previous(spark, ohlcv_dirs, tmp_path):
    """Round-4: the final open_close load goes stage -> audit -> flip; a
    constraint-violating load leaves the PREVIOUS version live."""
    import pytest as _pytest

    from fortune_500_financial_insights_pipeline_spark.pipelines.open_close import publish_open_close
    from fortune_500_financial_insights_pipeline_spark.warehouse import wap_current

    kaggle_glob, api_glob = ohlcv_dirs
    base = str(tmp_path / "wh")
    good = open_close(spark, kaggle_glob, api_glob, dedup=True)
    stage = publish_open_close(good, base, dedup=True)
    assert "v=1" in stage
    live1 = wap_current(spark, base, "openclose")
    n1 = live1.count()
    assert n1 > 0
    # year-partitioned physical layout survives the WAP stage
    import os

    assert any(d.startswith("year=") for d in os.listdir(stage))
    # a load violating NOT NULL Ticker must fail and not go live
    bad = good.withColumn(
        "Ticker", F.when(F.col("Source") == "API", None).otherwise(F.col("Ticker"))
    )
    with _pytest.raises(ValueError, match="audit failed"):
        publish_open_close(bad, base, dedup=True)
    assert wap_current(spark, base, "openclose").count() == n1
    # parity mode (raw-union duplicates) publishes without the UNIQUE audit
    raw = open_close(spark, kaggle_glob, api_glob, dedup=False)
    publish_open_close(raw, base, dedup=False)
    assert wap_current(spark, base, "openclose").count() == raw.count()


def test_publish_statements_wap(spark, tmp_path):
    from fortune_500_financial_insights_pipeline_spark.pipelines.tabular import (
        publish_statements,
        statements_wide,
    )
    from fortune_500_financial_insights_pipeline_spark.warehouse import wap_current

    d = tmp_path / "stmts"
    d.mkdir()
    (d / "AAPL.csv").write_text(STATEMENT_CSV + "\n")
    wide = statements_wide(spark, {"AAPL": str(d / "AAPL.csv")}, INTEREST)
    base = str(tmp_path / "wh")
    publish_statements(wide, base, "quarterly")
    assert wap_current(spark, base, "quarterly").count() == wide.count()
    # duplicated (Ticker, Date) rows violate the DDL key -> stays on v1
    import pytest as _pytest

    dup = wide.unionByName(wide)
    with _pytest.raises(ValueError, match="audit failed"):
        publish_statements(dup, base, "quarterly")
    assert wap_current(spark, base, "quarterly").count() == wide.count()
