"""Event-time windowing over the events table — batch and streaming forms.

The reference has no streaming surface (all DAGs @once — SURVEY.md §2.10);
this module declares the standard event-time operators batch-first, with
Structured Streaming mirrors that add a watermark. The batch and streaming
versions share the same aggregation expressions, so correctness is oracle-
checked on the batch form and the streaming mirror is covered by memory-sink
tests (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.functions.deterministic import dsum


def _windowed(df: DataFrame, window_col, extra_keys: list[str]) -> DataFrame:
    return (
        df.groupBy(window_col.alias("w"), *extra_keys)
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("wstart"),
            *extra_keys,
            "n_events",
            "sum_value",
        )
    )


def tumbling(df: DataFrame, duration: str = "1 hour") -> DataFrame:
    """Tumbling event-time windows per event_type."""
    return _windowed(df, F.window("ts", duration), ["event_type"])


def sliding(df: DataFrame, duration: str = "1 hour", slide: str = "30 minutes") -> DataFrame:
    """Sliding windows: each event lands in duration/slide windows."""
    return _windowed(df, F.window("ts", duration, slide), ["event_type"])


def session(df: DataFrame, gap: str = "6 hours") -> DataFrame:
    """Session windows per user: gap-merged activity bursts. Native
    session_window keeps merge logic JVM-side (batch mode here; the same
    expression works under readStream with a watermark)."""
    return (
        df.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def streaming_tumbling(
    stream: DataFrame, duration: str = "1 hour", watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming mirror of ``tumbling``: watermarked so state for closed
    windows is dropped (late rows beyond the watermark are discarded) and
    append-mode sinks emit each window exactly once."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", duration).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
        .select(F.col("w.start").alias("wstart"), "event_type", "n_events", "sum_value")
    )


def streaming_session(
    stream: DataFrame, gap: str = "6 hours", watermark: str = "0 seconds"
) -> DataFrame:
    """Streaming mirror of ``session``: dynamic-gap windows merge in state
    until the watermark passes a session's end, then append emits it
    exactly once and drops the state. (Sessions still open at the
    watermark — every user's last burst — stay in state and don't emit:
    that withheld tail is the semantic difference from the batch form,
    asserted in tests.)"""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )
