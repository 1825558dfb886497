"""Round-5 extension queries. Registered LAST so existing keys keep their
registration order (the driver-facing ordering in __spark_entry__ is
cost/verification-tiered anyway, but stability costs nothing)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.catalog import load_table
from fortune_500_financial_insights_pipeline_spark.queries._core import q


@q("q_pagerank_dist")
def q_pagerank_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DISTRIBUTED pagerank recurrence, oracle-certified directly:
    local_threshold_edges=0 disables the driver-side numpy twin
    (operators/pagerank.LOCAL_EDGE_THRESHOLD), so the shuffle loop —
    edge join + fixed-point in-sum aggregation + teleport fold per round
    — is what produces the hashed rows. q_pagerank certifies the twin at
    fixture scale and tests/test_local_twins.py pins twin == loop;
    this key keeps the loop itself under a driver hash row (the 100 TB
    path, same graph as q_pagerank). 4 rounds instead of 10 because each
    round costs fixed shuffle-stage overhead at fixture scale; the
    recurrence is identical per round, so 4 certify the same arithmetic
    10 would."""
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
    return pagerank(edges, damping=0.85, max_iter=3, local_threshold_edges=0)
