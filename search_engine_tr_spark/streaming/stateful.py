"""Custom stateful streaming operator: event-time sessionization with
``applyInPandasWithState``.

The reference has no streaming at all — its scheduler re-reads everything
on a timer (task_scheduler.py:5-14). This is the Structured-Streaming-native
upgrade for the engine's event surfaces (crawl telemetry, query logs):
per-key session state carried across micro-batches, Arrow-batched, with
the same semantics as the batch sessionization so the two are testable
against each other.

Semantics (pure event time, deterministic):
- events within ``gap_sec`` of the session's last event extend the session
- a later event for the same key more than ``gap_sec`` after the last one
  CLOSES the open session (emitted downstream) and opens a new one
- at end of input the still-open session stays in state (emitted only by a
  timeout policy in a long-running deployment; the availableNow/batch-drain
  form keeps it pending — callers needing flush-at-end use
  ``sessionize_batch`` on the tail)

Scale notes: state is one tiny tuple per active key, partitioned by the
stream's groupBy hash — no skew beyond key popularity; Arrow transfers
batch the per-key event frames.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType(), False),
    T.StructField("session_start", T.DoubleType(), False),  # epoch seconds
    T.StructField("session_end", T.DoubleType(), False),
    T.StructField("n_events", T.LongType(), False),
    T.StructField("total_value", T.DoubleType(), False),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("start", T.DoubleType(), False),
    T.StructField("last", T.DoubleType(), False),
    T.StructField("n", T.LongType(), False),
    T.StructField("total", T.DoubleType(), False),
])


def _fold(uid: int, events: list[tuple[float, float]],
          state: tuple | None, gap_sec: float):
    """Fold (ts, value) events into sessions; returns (closed_rows, state)."""
    closed = []
    cur = list(state) if state is not None else None
    for ts, val in events:
        if cur is not None and ts - cur[1] > gap_sec:
            closed.append((uid, cur[0], cur[1], cur[2], cur[3]))
            cur = None
        if cur is None:
            cur = [ts, ts, 0, 0.0]
        cur[1] = ts
        cur[2] += 1
        cur[3] += float(val)
    return closed, (tuple(cur) if cur is not None else None)


def sessionize_stream(events: DataFrame, gap_sec: float = 1800.0) -> DataFrame:
    """Streaming (user_id, ts, value) → closed sessions, state across
    micro-batches via applyInPandasWithState."""

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        uid = int(key[0])
        rows: list[tuple[float, float]] = []
        for pdf in pdfs:
            # datetime64[ns] → seconds; Arrow hands timestamps in session-tz
            # naive form, so absolute values are session-tz-relative — only
            # DIFFERENCES drive session semantics, which are tz-free
            ts = pdf["ts"].astype("int64") / 1e9
            rows.extend(zip(ts, pdf["value"]))
        rows.sort()
        prev = state.get if state.exists else None
        closed, cur = _fold(uid, rows, prev, gap_sec)
        if cur is not None:
            state.update(cur)
        elif state.exists:
            state.remove()
        yield pd.DataFrame(closed, columns=[f.name for f in
                                            SESSION_SCHEMA.fields])

    return (events
            .select("user_id", "ts", "value")
            .groupBy("user_id")
            .applyInPandasWithState(
                fn, SESSION_SCHEMA, _STATE_SCHEMA, "append",
                GroupStateTimeout.NoTimeout))


def sessionize_batch(events: DataFrame, gap_sec: float = 1800.0) -> DataFrame:
    """Batch twin of the streaming operator — ALL sessions including the
    trailing open one, as native window functions (no Python state):
    session boundary = event-time gap > gap_sec, session id = running count
    of boundaries per user.

    Gap arithmetic is interval-based (works for TIMESTAMP and
    TIMESTAMP_NTZ alike, no epoch cast, timezone-proof); session bounds
    come back as timestamps of the input's type."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    # millisecond interval: a whole-second truncation would disagree with
    # the streaming twin's float comparison (ts - last > gap_sec) for
    # fractional gaps — the two paths must share one boundary rule
    gap_ms = round(gap_sec * 1000)
    if abs(gap_sec * 1000 - gap_ms) > 1e-6:
        raise ValueError(f"gap_sec={gap_sec!r} has sub-millisecond "
                         "precision — the interval comparison cannot "
                         "represent it; use a whole number of milliseconds")
    gap = F.expr(f"INTERVAL {int(gap_ms)} MILLISECONDS")
    marked = (events
              .select("user_id", "ts", "value")
              .withColumn("_prev", F.lag("ts").over(w))
              .withColumn("_new", (F.col("_prev").isNull() |
                                   ((F.col("ts") - F.col("_prev")) > gap))
                          .cast("long"))
              .withColumn("_sid", F.sum("_new").over(
                  w.rowsBetween(Window.unboundedPreceding, 0))))
    return (marked.groupBy("user_id", "_sid")
            .agg(F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end"),
                 F.count("*").alias("n_events"),
                 F.sum("value").alias("total_value"))
            .drop("_sid"))
