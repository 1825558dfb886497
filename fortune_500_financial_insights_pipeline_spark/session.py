"""SparkSession factory.

Defaults are tuned for the local[32] test harness but every knob scales to a
real cluster: AQE handles runtime re-planning + skew, shuffle partitions
default to core count locally (on a cluster you'd size them to data volume /
target partition size instead), session timezone is pinned to UTC so results
are reproducible against external oracles.

ANSI mode is disabled deliberately: the reference pipeline
(/root/reference/code/spark-jobs/raw_to_landing_sparkjob.py:35-47) relies on
Spark 3.x null-on-invalid cast semantics (invalid dates -> null -> filtered).
We keep those semantics engine-wide and use try_* functions where failure
tolerance must be explicit.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "f500-insights-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # NOTE (round 9): a session-global
        # coalescePartitions.minPartitionSize=64k floor was tried here to
        # keep CPU-dense small-byte exchanges parallel (jaccard verify ran
        # 4-wide on 32 cores under the default 1 MB floor). The A/B showed
        # it taxed every other small exchange instead (q_kcore 0.27->0.58 s,
        # q_perplexity_bucket 1.30->1.69, q_ltv_curve 1.41->1.58,
        # q_fifo_pnl 1.26->1.52 at sf0.1): more tasks per tiny shuffle is
        # pure scheduling overhead where the stage is NOT CPU-bound. The
        # width is now pinned at the one CPU-dense site that needed it
        # (operators/setjoin.py: user repartition, AQE-exempt) and the
        # global floor stays at Spark's default.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # cost-based optimizer: inert without stats, but lets ANALYZE'd
        # tables (warehouse.analyze_table) drive join reordering and
        # rowCount-based broadcast decisions
        .config("spark.sql.cbo.enabled", "true")
        .config("spark.sql.cbo.joinReorder.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.ansi.enabled", "false")
        # the events fixture stores TIMESTAMP(NANOS) which Spark's parquet
        # reader rejects; read as long and convert in the catalog
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # naive timestamp[us] parquet columns read as session-tz TIMESTAMP
        # (not NTZ): watermarks and epoch casts need TIMESTAMP, and with the
        # UTC session tz the values match the naive/DuckDB reading exactly
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        # parquet scans: vectorized reader + pushdown are on by default; keep
        # files splittable at a sane size for the 100 TB design point
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
