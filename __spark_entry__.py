"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001 as a smoke check;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 for the driver's DuckDB-oracle comparison at sf0.01.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from fortune_500_financial_insights_pipeline_spark.oracles import ORACLES
from fortune_500_financial_insights_pipeline_spark.queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on /root/testdata/sf0.001."""
    return QUERIES["q_groupby_agg"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
