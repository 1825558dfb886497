"""Custom stateful streaming operators (SURVEY.md §2.10 extension).

The reference has no streaming at all; these are the two stateful shapes a
production feed of its data (prices ticking in, entity snapshots) needs:

* ``dedup_within_watermark`` — drop (key) duplicates across micro-batches
  with bounded state: Spark's native ``dropDuplicatesWithinWatermark``
  keeps a key's fingerprint only until the watermark passes it, so state
  doesn't grow without bound the way a plain ``dropDuplicates`` would on
  an infinite stream.
* ``running_totals`` — per-key running count/sum maintained across
  micro-batches via ``applyInPandasWithState`` (Arrow-batched, one state
  object per group), the escape hatch for custom stateful logic the
  built-in windowed aggregates can't express.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = "user_id long, n_events long, total_value double"
_STATE_SCHEMA = "n long, total double"


def dedup_within_watermark(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Exactly-once per key within the watermark horizon, bounded state."""
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)


def running_totals(stream: DataFrame) -> DataFrame:
    """Running per-user event count + value sum, carried across micro-batches.

    Emits the updated total for every user seen in the current batch
    (update-mode semantics). State is two scalars per user — O(distinct
    users), independent of stream length.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_to_warehouse(
    stream: DataFrame,
    base_path: str,
    table: str,
    keys: list[str],
    order_col: str = "Date",
    checkpoint: str | None = None,
):
    """Streaming → warehouse loop: each micro-batch merge-upserts into the
    DDL-typed table via foreachBatch. Exactly-once per key: the upsert is
    idempotent (keep-latest on the natural key), so a replayed batch after
    failure converges to the same table state — the property checkpointed
    foreachBatch needs since its side effects are at-least-once."""
    from fortune_500_financial_insights_pipeline_spark.warehouse import upsert_table

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_table(batch_df.sparkSession, base_path, table, batch_df, keys, order_col)

    writer = stream.writeStream.foreachBatch(sink).outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


class RunningTotalsProcessor:
    """`transformWithStateInPandas` processor: same running per-user
    totals as ``running_totals`` on the Spark-4 successor API —
    typed state handles (ValueState here; ListState/MapState available),
    timers, and TTL support that ``applyInPandasWithState`` lacks.

    Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``) — the HDFS-backed
    default does not implement the new state engine — and the
    ``protobuf`` package (the TWS state-server wire protocol;
    ``pyspark[connect]`` ships it). In environments without protobuf the
    query fails at init with STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE;
    ``applyInPandasWithState`` (``running_totals``) is the
    dependency-free fallback with identical semantics for this shape.
    """

    def init(self, handle) -> None:
        self._state = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        if self._state.exists():
            n, total = self._state.get()
        else:
            n, total = 0, 0.0
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    def close(self) -> None:
        pass


def running_totals_tws(stream: DataFrame) -> DataFrame:
    """``running_totals`` on the transformWithStateInPandas API."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    # subclass dynamically so import of this module never hard-depends on
    # the Spark-4-only API surface
    proc = type(
        "_RunningTotals", (StatefulProcessor,), dict(RunningTotalsProcessor.__dict__)
    )()
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=proc,
            outputStructType=RUNNING_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


SESSION_SCHEMA = "user_id long, session_start long, session_end long, n_events long"
_SESS_STATE_SCHEMA = "start long, last long, n long"


def streaming_sessions(stream: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Streaming twin of the batch 30-min-gap sessionization behind
    q_session_stats: per-user open-session state (start, last-event,
    count) carries across micro-batches via ``applyInPandasWithState``;
    a finalized session row is emitted the moment an arrival lands more
    than ``gap_s`` after the open session's last event — so a session
    spanning a micro-batch boundary is NEVER split, which is exactly
    what a per-batch groupBy cannot guarantee.  The still-open session
    stays in state (production closes stragglers with a state timeout;
    the contract here emits closed sessions only).  State is three
    scalars per user."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        start, last, n = state.get if state.exists else (None, None, 0)
        closed: list[tuple[int, int, int]] = []
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["sec", "event_id"])
        for sec in rows["sec"]:
            sec = int(sec)
            if start is None:
                start, last, n = sec, sec, 1
            elif sec - last > gap_s:
                closed.append((start, last, n))
                start, last, n = sec, sec, 1
            else:
                last, n = sec, n + 1
        state.update((start, last, n))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(closed),
                    "session_start": [c[0] for c in closed],
                    "session_end": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

    prepared = stream.selectExpr(
        "user_id", "CAST(ts AS LONG) AS sec", "event_id"
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        update,
        SESSION_SCHEMA,
        _SESS_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
