"""open_close pipeline: Kaggle CSV ∪ API CSV → standardized, year-partitioned
parquet — the reference's flagship job (/root/reference/code/spark-jobs/
raw_to_landing_sparkjob.py) as ONE declarative plan.

Differences from the reference, all load-bearing at scale:
* one glob scan per source + ``input_file_name`` ticker derivation instead
  of a 20-iteration Python loop of scans folded with unionByName (:165-184) —
  plan size O(1) in ticker count;
* per-file metadata-row skip instead of a single-partition global window
  (:85-89);
* optional keep-latest dedup on (Ticker, Date) honoring the DDL's
  UNIQUE(Ticker, Date) (code/sql/DDLs:14) with API preferred over Kaggle —
  the reference's raw union keeps both rows (parity mode: dedup=False);
* write partitioned by ``year`` (matches :187-189) and sorted within
  partitions by (Ticker, Date) so per-ticker reads cluster, without the
  small-files explosion a PARTITION BY LIST (Ticker) would cause.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.operators.dedup import keep_latest
from fortune_500_financial_insights_pipeline_spark.operators.standardize import (
    standardize_api,
    standardize_kaggle,
)
from fortune_500_financial_insights_pipeline_spark.sources.ohlcv import read_api_csv, read_kaggle_csv


def open_close(
    spark: SparkSession,
    kaggle_glob: str,
    api_glob: str,
    dedup: bool = False,
) -> DataFrame:
    kaggle = standardize_kaggle(read_kaggle_csv(spark, kaggle_glob))
    api = standardize_api(read_api_csv(spark, api_glob))
    merged = kaggle.unionByName(api)
    if dedup:
        # API covers the recent range and wins on overlap dates
        merged = keep_latest(
            merged.withColumn(
                "_prio", F.when(F.col("Source") == "API", 1).otherwise(0)
            ),
            keys=["Ticker", "Date"],
            order_cols=["_prio"],
        ).drop("_prio")
    return merged


def write_open_close(df: DataFrame, path: str) -> None:
    (
        df.sortWithinPartitions("Ticker", "Date")
        .write.partitionBy("year")
        .mode("overwrite")
        .parquet(path)
    )


def publish_open_close(
    df: DataFrame, base_path: str, dedup: bool = False
) -> str:
    """Write-audit-publish form of the final load (warehouse.wap_publish):
    the standardized frame stages under ``<base>/openclose/v=<n>`` with the
    same year-partitioned, (Ticker, Date)-clustered layout as
    :func:`write_open_close`, the DDL constraint audits run against the
    STAGED files (NOT NULL Ticker/Date always; UNIQUE(Ticker, Date) —
    code/sql/DDLs:14 — only in dedup mode, since parity mode deliberately
    keeps the reference's raw-union duplicates), and only a green audit
    flips the live pointer — a failed load leaves the previous version
    live, which the reference's direct WRITE_TRUNCATE load cannot
    guarantee. Read the live version via ``warehouse.wap_current(spark,
    base_path, 'openclose')``."""
    from fortune_500_financial_insights_pipeline_spark.checks import not_null, unique_key
    from fortune_500_financial_insights_pipeline_spark.warehouse import wap_publish

    audits = [not_null("Ticker", "Date")]
    if dedup:
        audits.append(unique_key("Ticker", "Date"))
    return wap_publish(
        df,
        base_path,
        "openclose",
        audits=audits,
        partition_by=["year"],
        sort_within=["Ticker", "Date"],
    )
