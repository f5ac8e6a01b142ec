"""Watermarked event-time window aggregation — the Structured-Streaming
form of the batch tumbling/hopping windows in __spark_entry__
(q_tumbling_window / q_hopping_window are the exact batch twins).

Append-mode semantics (the production shape for downstream sinks that
cannot retract): a window's row is emitted exactly once, when the
watermark (max event time seen − ``late``) passes the window end; events
arriving later than the watermark are DROPPED, bounding state. State per
key is one row per (window, event_type) — the watermark is what keeps the
state store finite on an unbounded stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts_stream(events: DataFrame, window_dur: str = "1 hour",
                           late: str = "30 minutes",
                           slide: str | None = None) -> DataFrame:
    """Streaming (ts, event_type, value) → finalized per-window aggregates
    (win_start, event_type, n, total). ``slide`` turns the tumbling window
    into a hopping one."""
    win = (F.window("ts", window_dur, slide) if slide
           else F.window("ts", window_dur))
    return (events
            .withWatermark("ts", late)
            .groupBy(win.alias("w"), "event_type")
            .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
            .select(F.col("w.start").alias("win_start"), "event_type",
                    "n", "total"))


def windowed_counts_batch(events: DataFrame, window_dur: str = "1 hour",
                          slide: str | None = None) -> DataFrame:
    """Batch twin: ALL windows (nothing pending, nothing dropped) — the
    semantic oracle for the stream on a fully-delivered, on-time input."""
    win = (F.window("ts", window_dur, slide) if slide
           else F.window("ts", window_dur))
    return (events
            .groupBy(win.alias("w"), "event_type")
            .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
            .select(F.col("w.start").alias("win_start"), "event_type",
                    "n", "total"))
