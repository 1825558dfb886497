"""Catalog: load the driver's parquet tables and register them as temp views.

Parquet is self-describing (schema travels with the data), so the scan gets
column pruning + predicate pushdown from Catalyst for free — mirrors the
reference's landing-layer contract (SURVEY.md §1.3) without BigQuery.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _ensure_runtime_conf(spark: SparkSession) -> None:
    """Pin the runtime-settable semantics every query depends on.

    The external driver imports __spark_entry__ with a *vanilla*
    SparkSession — none of our session-factory defaults apply — so any
    conf that changes query semantics must be (re)asserted here, on the
    session actually running the query. Both are runtime-settable:

    * UTC session timezone: timestamp→date casts (l_shipdate, o_orderdate)
      shift by the local offset otherwise, breaking oracle value-hashes;
    * ANSI off: the engine standardizes on null-on-invalid cast/parse
      semantics (the reference's invalid-date quarantine,
      raw_to_landing_sparkjob.py:35-37); Spark 4 defaults ANSI on, where
      to_date('not-a-date') throws instead of yielding null.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    # The fixture parquet stores naive timestamp[us]; Spark 4 infers
    # TIMESTAMP_NTZ by default, which rejects event-time watermarks and
    # direct epoch casts. Read them as session-tz TIMESTAMP instead — the
    # session tz is pinned UTC above, so the wall-clock values are
    # bit-identical to the NTZ reading (and to DuckDB's naive reading).
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    # performance only (results are partitioning-invariant by design): a
    # vanilla session defaults to 200 shuffle partitions, pure task
    # overhead at fixture scale; AQE still coalesces/splits as needed
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    _ensure_worker_imports(spark)


def _ensure_worker_imports(spark: SparkSession) -> None:
    """Make this package importable on Python workers under ANY driver.

    The external driver imports __spark_entry__ by path from its own cwd;
    driver-side sys.path edits don't reach the executor Python workers, so
    any UDF whose closure references a module-level name (cloudpickle
    serializes those by module reference) dies with ModuleNotFoundError.
    Ship the package once per SparkContext as a zip via addPyFile — workers
    zipimport it; in-repo runs are unaffected (the local import wins)."""
    sc = spark.sparkContext
    if getattr(sc, "_f500_pyfiles_added", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    zip_path = os.path.join(
        tempfile.gettempdir(), f"{pkg_name}_pyfiles_{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fname in files:
                    if not fname.endswith(".py"):
                        continue
                    full = os.path.join(root, fname)
                    rel = os.path.join(pkg_name, os.path.relpath(full, pkg_dir))
                    zf.write(full, rel)
    sc.addPyFile(zip_path)
    sc._f500_pyfiles_added = True


# Canonical logical types per table. The driver regenerates the fixture
# parquet between rounds and has already shifted physical types twice
# (TIMESTAMP(NANOS) → naive timestamp[us]); every query and oracle is written
# against THESE types, so load_table coerces drift instead of letting it
# surface as per-query failures. Casts are emitted only on mismatch — when
# the file already matches, the scan keeps full pushdown/pruning.
CANONICAL_TYPES: dict[str, dict[str, str]] = {
    "region": {"r_regionkey": "int"},
    "nation": {"n_nationkey": "int", "n_regionkey": "int"},
    "customer": {"c_custkey": "bigint", "c_nationkey": "int", "c_acctbal": "double"},
    "supplier": {"s_suppkey": "bigint", "s_nationkey": "int", "s_acctbal": "double"},
    "part": {"p_partkey": "bigint", "p_size": "int", "p_retailprice": "double"},
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_totalprice": "double",
        "o_orderdate": "timestamp",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_shipdate": "timestamp",
    },
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",
        "user_id": "bigint",
        "value": "double",
        "props": "string",
    },
    "documents": {"doc_id": "bigint", "n_chars": "bigint"},
    "embeddings": {"vec_id": "bigint", "embedding": "array<float>", "label": "int"},
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_runtime_conf(spark)
    if name == "events":
        # must be set on whatever session calls us (the external driver builds
        # its own SparkSession without our factory defaults)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    field = dict(zip(df.schema.names, df.schema.fields))
    if name == "events" and isinstance(field["ts"].dataType, T.LongType):
        # events.ts as parquet TIMESTAMP(NANOS): with
        # spark.sql.legacy.parquet.nanosAsLong it arrives as epoch-nanos long.
        # `div` keeps the integer division in long (a double would lose
        # precision above 2^53).
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        field = dict(zip(df.schema.names, df.schema.fields))

    drifted = {
        col: want
        for col, want in CANONICAL_TYPES.get(name, {}).items()
        if col in field and field[col].dataType.simpleString() != want
    }
    if drifted:
        df = df.withColumns({col: F.col(col).cast(want) for col, want in drifted.items()})
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
