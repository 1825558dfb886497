"""Streaming WARC ingestion: crawl archives landing in object storage
become a record stream — the front door of the streaming curation
funnel (this module feeds streaming/curation.streaming_curate exactly
what its batch twin gets from parquet).

Shape: Structured Streaming's ``binaryFile`` source (one row per newly
landed ``.warc.gz``, content inline) → the SAME
``operators/warc.warc_records`` mapInPandas explode the batch path uses
→ optional response-only projection with the HTTP body decoded. All
map-only: the stream inherits the batch operator's zero-shuffle plan,
so stream == batch on identical inputs is structural, not incidental
(pinned by tests/test_ops_round7b.py::test_warc_stream_equals_batch).

100 TB shape: archives are independent files and records are
independent rows — no state, no watermark, no shuffle; parallelism is
file-count × member-count, and a malformed archive fails its task
closed (the operator's ValueError discipline) without poisoning the
stream.

Reference scope note: /root/reference has no crawl ingestion
(code/airflow/dags/* is tabular/JSON market data); extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.operators.warc import warc_records


def warc_archive_stream(
    spark: SparkSession,
    path: str,
    glob: str = "*.warc.gz",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming frame of (doc_id, warc) from archives landing under
    ``path`` — doc_id is a stable 63-bit hash of the file path (archives
    are identified by object key, not by any in-band id)."""
    # binaryFile's schema is fixed by the source, but the STREAMING form
    # requires it stated explicitly (no inference on streams)
    reader = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("pathGlobFilter", glob)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.load(path)
    return raw.select(
        F.abs(F.xxhash64("path")).alias("doc_id"),
        F.col("path").alias("archive_path"),
        F.col("content").alias("warc"),
    )


def warc_record_stream(archives: DataFrame) -> DataFrame:
    """Explode a (doc_id, warc) archive stream into one row per WARC
    record — the identical operator the batch path runs (map-only, no
    stream-side state), so the stream is batch-equivalent by
    construction."""
    return warc_records(archives, id_col="doc_id", payload_col="warc")


def warc_response_stream(archives: DataFrame) -> DataFrame:
    """Response records only, HTTP body decoded to text — the shape
    streaming_curate consumes (doc_id keyed on archive×record so
    multi-record archives stay distinct documents). The record id is a
    HASH COMBINE of the archive id and record index — arithmetic like
    ``doc_id * 1000 + rec_idx`` overflows bigint for xxhash64-sized
    archive ids (silent wraparound to negatives under non-ANSI,
    ArithmeticException under ANSI; ADVICE r7)."""
    recs = warc_records(archives, id_col="doc_id", payload_col="warc")
    return recs.where(F.col("warc_type") == "response").select(
        F.abs(F.xxhash64("doc_id", "rec_idx")).alias("doc_id"),
        F.col("target_uri"),
        F.col("http_status"),
        F.decode("body", "UTF-8").alias("text"),
    )


def warc_split_record_stream(
    spark: SparkSession,
    path: str,
    glob: str = "*.warc.gz",
    target_split_bytes: int = 64 << 20,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """OFFSET-SPLIT streaming WARC ingestion (round 8): newly landed
    archives enter as PATH rows (content pruned out of the source scan),
    then flow through the same member-span index → range buckets →
    per-member ranged reads the batch reader uses
    (operators/warc.split_records_from_listing) — so one skewed archive
    fans across tasks and peak memory is one member, in the STREAM too.
    The whole lineage is map transformations plus the tiny index
    repartition (no stream-side state, no watermark), so stream ==
    split-batch == whole-batch row-for-row on identical inputs (pinned
    by tests/test_ops_round8.py::test_warc_split_stream_parity)."""
    from fortune_500_financial_insights_pipeline_spark.operators.warc import (
        split_records_from_listing,
    )

    reader = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("pathGlobFilter", glob)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    files = reader.load(path).select("path")
    return split_records_from_listing(files, target_split_bytes)
