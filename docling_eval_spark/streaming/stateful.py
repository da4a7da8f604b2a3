"""Custom stateful streaming operator (SURVEY §2.10):
per-key sessionization via ``applyInPandasWithState``.

The reference has no streaming at all; this is the Spark-native
capability the rebuild adds: group events by key, close a session when
``gap`` elapses between events (event-time), emit one row per closed
session. Timeout closes sessions when a key goes quiet.

Batch twin (``sessionize_batch``) implements the same semantics with a
lag/cumsum window (SURVEY "Sessionization" pattern) — it is the oracle
the streaming test compares against.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, Window
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _session_fn(gap_sec: float):
    gap_ms = int(gap_sec * 1000)

    def fn(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        out: list[dict[str, Any]] = []
        if state.hasTimedOut:
            # event-time timeout: watermark passed last_event + gap →
            # the session is closed, emit and clear
            if state.exists:
                s, l, n, total = state.get
                out.append(dict(start=s, end=l, n=n, total=total))
                state.remove()
        else:
            rows = pd.concat(list(batches))
            rows = rows.sort_values("ts")
            if state.exists:
                s, l, n, total = state.get
            else:
                s = l = None
                n, total = 0, 0.0
            for ts, value in zip(rows["ts"], rows["value"]):
                us = int(ts.value // 1_000)  # keep µs precision
                if s is None:
                    s, l, n, total = us, us, 1, float(value)
                elif us - l > gap_ms * 1000:
                    out.append(dict(start=s, end=l, n=n, total=total))
                    s, l, n, total = us, us, 1, float(value)
                else:
                    l, n, total = us, n + 1, total + float(value)
            state.update((s, l, n, total))
            # fire once the event-time watermark passes the session gap
            state.setTimeoutTimestamp(l // 1000 + gap_ms)
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out),
                "session_start": [pd.Timestamp(o["start"], unit="us") for o in out],
                "session_end": [pd.Timestamp(o["end"], unit="us") for o in out],
                "n_events": [o["n"] for o in out],
                "sum_value": [o["total"] for o in out],
            }
        )

    return fn


def sessionize_stream(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """events readStream (user_id, ts, value) → closed-session rows.

    Event-time timeouts (watermark = gap): under
    ``trigger(availableNow)`` the final watermark advance fires the
    timeouts for all sessions older than max(ts) − gap, so draining a
    static directory emits every closed session exactly once.
    (ProcessingTimeTimeout would spin "cleaning up state" batches
    until the wall-clock duration elapsed — observed hang.)"""
    gap_sec = _parse_gap_seconds(gap)
    return (
        events.withWatermark("ts", gap)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_sec),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def _parse_gap_seconds(gap: str) -> float:
    qty, unit = gap.split()
    mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600}[unit]
    return float(qty) * mult


def sessionize_batch(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Batch oracle: identical session semantics via lag + cumsum
    (the classic windowed sessionization)."""
    gap_sec = _parse_gap_seconds(gap)
    w = Window.partitionBy("user_id").orderBy("ts")
    # TIMESTAMP_NTZ (parquet default here) can't cast straight to
    # double — go via TIMESTAMP
    secs = F.col("ts").cast("timestamp").cast("double")
    marked = events.withColumn(
        "new_session",
        F.when(secs - F.lag(secs).over(w) > gap_sec, 1).otherwise(0),
    ).withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return marked.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6).alias(
            "sum_value"
        ),
    )
