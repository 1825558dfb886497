"""Warehouse layer (SURVEY.md §7.4): DDL-typed, partitioned parquet tables
served through ``spark.sql``.

Replaces the reference's BigQuery leg (``bq load`` with autodetect,
transform_open_close_data.py:84-98) with Spark-native managed parquet:
pipeline outputs are conformed to the declared DDL types
(warehouse_schemas.py), written partitioned, and registered so the
Tableau-style analytical queries the reference outsources run as plain SQL
on this engine.

Scale notes (100 TB design point):
* Partition by low-cardinality ``year`` derived from the DATE key, never by
  Ticker — the DDL's PARTITION BY LIST (Ticker) (code/sql/DDLs:15) would
  create one directory per key, and at high ticker cardinality that's a
  small-files explosion. Within partitions, rows are sorted by (Ticker,
  Date) so per-ticker reads cluster into few row groups.
* Writes are idempotent overwrites per partition
  (``partitionOverwriteMode=dynamic``) so re-running a day's load replaces
  only that slice, not the table.
* SERIAL surrogate keys become deterministic row hashes, not a global
  row_number — an auto-increment over 100 TB would serialize on a single
  partition exactly like the reference's Window.orderBy(lit(1)) skip-rows.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.warehouse_schemas import WAREHOUSE_SCHEMAS

# tables whose DATE column is a time-series key worth partitioning on
PARTITIONED = {"openclose", "dividend_history", "analystreccomendations", "quarterly"}


def conform(df: DataFrame, table: str) -> DataFrame:
    """Cast/select ``df`` onto the table's declared DDL schema.

    Column matching is case-insensitive; declared columns missing from the
    input materialize as typed nulls (the autodetect-tolerant behavior the
    reference relies on, made explicit); undeclared input columns are
    dropped. The cast to DecimalType(20,2)/(10,4) is where the engine
    upgrades the reference's lossy doubles to the DDL's exact money types.
    """
    schema = WAREHOUSE_SCHEMAS[table]
    by_lower = {c.lower(): c for c in df.columns}
    cols = []
    for field in schema.fields:
        src = by_lower.get(field.name.lower())
        if src is None:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.col(src).cast(field.dataType).alias(field.name))
    return df.select(*cols)


def add_surrogate_key(df: DataFrame, key_cols: list[str], name: str = "ID") -> DataFrame:
    """Deterministic 64-bit surrogate for the DDL's SERIAL columns: a hash
    of the natural key — stable across runs and partitioning, no global
    ordering required."""
    return df.withColumn(name, F.xxhash64(*key_cols))


def write_table(df: DataFrame, base_path: str, table: str) -> None:
    """Conform + write one warehouse table as partitioned parquet.

    Partitioned tables write in dynamic-overwrite mode: a load that carries
    only 2024 data replaces only ``year=2024``, so incremental reloads never
    truncate history (the reference's BQ loads are WRITE_TRUNCATE — full
    rewrites every run)."""
    out = conform(df, table)
    writer = out.write.mode("overwrite")
    if table in PARTITIONED and "Date" in out.columns:
        df.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        out = out.withColumn("year", F.year("Date"))
        writer = (
            out.sortWithinPartitions("Ticker", "Date")
            .write.mode("overwrite")
            .partitionBy("year")
        )
    writer.parquet(os.path.join(base_path, table))


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    analyze: bool = True,
) -> None:
    """Persist as a bucketed (+ optionally sorted) table in the session
    catalog. Two tables bucketed on the same keys with the same bucket count
    join with NO exchange on either side — the shuffle is paid once at write
    time and amortized over every subsequent join/aggregate on that key,
    which is the economics that matter when the same 100 TB fact table joins
    daily. Bucket pruning also kicks in for key-equality filters."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
    if analyze:
        # table + column stats feed the cost-based optimizer (join
        # reordering, broadcast decisions) — cheap at write time, paid
        # back on every query against the table
        df.sparkSession.sql(
            f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS "
            + ", ".join(bucket_cols)
        )


def register(spark: SparkSession, base_path: str) -> list[str]:
    """Register every table present under ``base_path`` as a temp view (plus
    partition discovery on the year-partitioned ones). Parquet is
    self-describing, so the declared types round-trip exactly."""
    registered = []
    for table in WAREHOUSE_SCHEMAS:
        path = os.path.join(base_path, table)
        if os.path.isdir(path):
            spark.read.parquet(path).createOrReplaceTempView(table)
            registered.append(table)
    return registered


def upsert_table(
    spark: SparkSession,
    base_path: str,
    table: str,
    updates: DataFrame,
    keys: list[str],
    order_col: str = "Date",
) -> None:
    """Merge-upsert without a table format: union existing rows with the
    update batch, keep-latest per natural key (updates win ties), rewrite
    only the year partitions the update touches (dynamic overwrite).

    At scale the read side prunes to the touched partitions — the cost is
    proportional to the updated slice, not the table. A real LakeHouse
    format (Delta/Iceberg MERGE) drops in here unchanged; this is the
    format-free equivalent with the same idempotence contract."""
    from fortune_500_financial_insights_pipeline_spark.operators.dedup import keep_latest

    path = os.path.join(base_path, table)
    conformed = conform(updates, table).withColumn("_new", F.lit(1))
    if os.path.isdir(path):
        existing = spark.read.parquet(path).drop("year")
        if table in PARTITIONED:
            years = [r[0] for r in conformed.select(F.year(order_col)).distinct().collect()]
            existing = existing.filter(F.year(order_col).isin(years))
        merged = keep_latest(
            existing.withColumn("_new", F.lit(0)).unionByName(conformed),
            keys=keys,
            order_cols=["_new"],
        ).drop("_new")
    else:
        merged = conformed.drop("_new")
    write_table(merged, base_path, table)


# The analytical queries the reference delegates to Tableau/BigQuery
# (README.md:9-10, images/tableau_AMZN.png: per-ticker price trends overlaid
# with fundamentals), expressed on the warehouse tables.
SERVING_QUERIES: dict[str, str] = {
    "yearly_price_summary": """
        SELECT Ticker, year,
               MIN(Low)    AS yr_low,
               MAX(High)   AS yr_high,
               AVG(Close)  AS avg_close,
               SUM(Volume) AS total_volume,
               COUNT(*)    AS trading_days
        FROM openclose
        GROUP BY Ticker, year
    """,
    "latest_close_per_ticker": """
        SELECT Ticker, Date, Close
        FROM (
          SELECT Ticker, Date, Close,
                 ROW_NUMBER() OVER (PARTITION BY Ticker ORDER BY Date DESC) AS rn
          FROM openclose
        ) WHERE rn = 1
    """,
    "price_with_metadata": """
        SELECT o.Ticker, m.Sector, m.Industry,
               AVG(o.Close) AS avg_close, SUM(o.Volume) AS total_volume
        FROM openclose o
        JOIN metadata m ON o.Ticker = m.Ticker
        GROUP BY o.Ticker, m.Sector, m.Industry
    """,
}


def serve(spark: SparkSession, name: str) -> DataFrame:
    return spark.sql(SERVING_QUERIES[name])


def analyze_table(
    spark: SparkSession, base_path: str, table: str, columns: list[str] | None = None
) -> dict[str, str]:
    """Register ``table``'s parquet directory as an external catalog table
    (temp views can't hold stats) and compute table + column statistics —
    what turns on cost-based join reordering and better broadcast
    decisions (SURVEY.md §4 "Collect stats for CBO"). Returns the stats
    DESCRIBE EXTENDED reports.

    Idempotent: re-running refreshes the stats in place."""
    path = os.path.join(base_path, table)
    cat_name = f"{table}_stats"
    spark.sql(f"DROP TABLE IF EXISTS {cat_name}")
    spark.sql(f"CREATE TABLE {cat_name} USING parquet LOCATION '{path}'")
    if any(f.name == "year" for f in spark.read.parquet(path).schema.fields):
        spark.sql(f"MSCK REPAIR TABLE {cat_name}")
    cols = ", ".join(columns) if columns else None
    spark.sql(
        f"ANALYZE TABLE {cat_name} COMPUTE STATISTICS"
        + (f" FOR COLUMNS {cols}" if cols else "")
    )
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {cat_name}").collect()
    return {r.col_name: r.data_type for r in rows if r.col_name == "Statistics"}


def incremental_agg_refresh(
    spark: SparkSession,
    agg_path: str,
    new_df: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Maintain a sum/count rollup incrementally: partial-aggregate only the
    new batch, merge with the stored rollup by summing (sums, counts, and
    anything else decomposable are mergeable aggregates), rewrite the
    rollup. History is NEVER rescanned — per refresh the cost is
    O(new batch) + O(existing groups), which is what keeps a daily rollup
    over a 100 TB fact table affordable. Averages reconstruct as
    sum/count downstream; non-decomposable aggregates (exact medians)
    don't belong here — use sketches (operators/cms.py, q_hll_distinct)
    which merge the same way.

    Returns the merged rollup after persisting it to ``agg_path``."""
    sums = [F.sum(c).alias(f"sum_{c}") for c in sum_cols]
    partial = new_df.groupBy(*keys).agg(
        *sums, F.count(F.lit(1)).cast("long").alias(count_col)
    )
    if os.path.isdir(agg_path):
        existing = spark.read.parquet(agg_path)
        merged = (
            existing.unionByName(partial)
            .groupBy(*keys)
            .agg(
                *[F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols],
                F.sum(count_col).cast("long").alias(count_col),
            )
        )
    else:
        merged = partial
    # materialize off the input files before overwriting the path we read
    merged = merged.localCheckpoint()
    merged.write.mode("overwrite").parquet(agg_path)
    return spark.read.parquet(agg_path)


# --- write-audit-publish (WAP) -----------------------------------------------


def wap_publish(
    df: DataFrame,
    base_path: str,
    table: str,
    audits: "list[tuple[str, Column]] | None" = None,
    max_violations: int = 0,
    partition_by: "list[str] | None" = None,
    sort_within: "list[str] | None" = None,
) -> str:
    """Atomic write-audit-publish: stage → audit → swap.

    The lakehouse loading discipline the reference's direct BQ
    WRITE_TRUNCATE loads lack (a half-written or constraint-violating load
    is immediately live there): here the frame is written to a staging
    directory, the data-quality audits run against the STAGED files (what
    readers would actually see, not the logical plan), and only a fully
    green audit flips the `current` symlink-style pointer — readers resolve
    through `wap_current`, so they observe either the old version or the
    new one, never a partial write, and a failed audit leaves the previous
    version live with the quarantined staging dir kept for inspection.

    ``audits``: (name, aggregate Column) pairs in checks.py's violation-
    count convention (0 = pass), e.g. ``not_null("Ticker")``,
    ``unique_key("Ticker", "Date")``. Each version lands under
    ``<base>/<table>/v=<n>``; the pointer file holds the live version
    number and is replaced atomically (single rename) — the same
    swap discipline as streaming/bloom_dedup's filter state.

    Concurrency: version numbers are ALLOCATED by atomic ``os.mkdir`` of
    the stage directory itself — of two racing publishers exactly one
    claims ``v=n`` and the other moves on to ``v=n+1``, so no publisher
    ever writes into another's staging dir (a crashed claim leaves an
    empty dir that later allocations simply skip past; it is never
    published because its pointer flip never ran). The pointer flip is
    forward-only (a slower publisher of an older version does not regress
    a newer live version). These guarantees rely on POSIX directory
    semantics — i.e. Spark writing to a local/NFS filesystem; on an
    object store, version allocation belongs in a catalog service
    (Iceberg/Delta solve exactly this), not in listings.

    Returns the published version directory. Raises ValueError (table
    stays on the old version) when any audit exceeds ``max_violations``.
    """
    from fortune_500_financial_insights_pipeline_spark.checks import run_checks

    root = os.path.join(base_path, table)
    os.makedirs(root, exist_ok=True)
    existing = [
        int(d.split("=", 1)[1])
        for d in os.listdir(root)
        if d.startswith("v=") and d.split("=", 1)[1].isdigit()
    ]
    version = max(existing, default=0)
    while True:
        version += 1
        stage = os.path.join(root, f"v={version}")
        try:
            os.mkdir(stage)  # atomic claim: exactly one publisher wins v=n
            break
        except FileExistsError:
            continue
    # the claim created the (empty) dir, so write with APPEND into the
    # directory this process exclusively owns. mode("overwrite") would
    # delete-and-recreate the claim dir, and during that delete window a
    # racing publisher could re-list, see v=n gone, and mkdir the same
    # version — two publishers sharing one staging dir. Appending into an
    # empty directory produces identical output while the claim dir
    # stays alive for the whole write. partition_by / sort_within let
    # pipelines keep their physical layout (hive partitions, clustered
    # sort) while still getting the stage->audit->flip discipline.
    out = df.sortWithinPartitions(*sort_within) if sort_within else df
    writer = out.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(stage)

    if audits:
        staged = df.sparkSession.read.parquet(stage)
        results = run_checks(staged, *audits)
        bad = [r for r in results if r.violations > max_violations]
        if bad:
            raise ValueError(
                "wap_publish audit failed; previous version stays live; "
                "staged files kept for inspection at "
                f"{stage}: "
                + ", ".join(f"{r.name}={r.violations}" for r in bad)
            )

    pointer = os.path.join(root, "_CURRENT")
    # forward-only flip: a publisher that lost the race and finished after
    # a NEWER version went live must not regress the pointer (the
    # read-compare-replace window is not fully serialized without a lock
    # file, but regression requires the newer publisher to complete
    # entirely inside it — and a same-version rewrite is idempotent)
    try:
        with open(pointer) as f:
            live = int(f.read().strip())
    except (OSError, ValueError):
        live = 0
    if version > live:
        tmp = pointer + f".tmp.{version}"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, pointer)  # atomic on POSIX
    return stage


def wap_current(spark: SparkSession, base_path: str, table: str) -> DataFrame:
    """Read the LIVE version of a WAP-published table (the version the
    `_CURRENT` pointer names). Staged-but-unpublished versions are
    invisible here by construction."""
    root = os.path.join(base_path, table)
    pointer = os.path.join(root, "_CURRENT")
    with open(pointer) as f:
        version = int(f.read().strip())
    return spark.read.parquet(os.path.join(root, f"v={version}"))
