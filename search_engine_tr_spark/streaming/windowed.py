"""Watermarked event-time streaming operators: window aggregation (the
Structured-Streaming form of the batch tumbling/hopping windows in
__spark_entry__ — q_tumbling_window / q_hopping_window are the exact
batch twins), a stream-stream interval (attribution) join, and bounded-
state streaming dedup. Every stream op has a batch twin here that serves
as its semantic oracle on fully-delivered, on-time input.

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


def _attribution_condition(max_delay: str):
    """Shared join condition for the stream and batch attribution twins:
    same key, effect within (cause_ts, cause_ts + max_delay]."""
    return (
        (F.col("l.key") == F.col("r.key"))
        & (F.col("r.effect_ts") > F.col("l.cause_ts"))
        & (F.col("r.effect_ts")
           <= F.col("l.cause_ts") + F.expr(f"INTERVAL {max_delay}"))
    )


def _attribution_cols():
    return [
        F.col("l.key").alias("key"),
        F.col("l.cause_ts").alias("cause_ts"),
        F.col("r.effect_ts").alias("effect_ts"),
        # timestampdiff, not unix_timestamp subtraction: unix_timestamp
        # interprets TIMESTAMP_NTZ through the session timezone, so a
        # DST-crossing cause→effect pair would drift by the offset change
        # under a non-UTC session; timestampdiff stays wall-clock-pure
        F.expr("timestampdiff(SECOND, l.cause_ts, r.effect_ts)")
        .alias("delay_sec"),
    ]


def attribution_join_stream(causes: DataFrame, effects: DataFrame,
                            max_delay: str = "1 hour",
                            late: str = "30 minutes") -> DataFrame:
    """Stream-stream inner equi-join with a time-range condition — the
    attribution shape (impression→click, crawl→recrawl, query→result-click):
    each ``effects`` row (key, effect_ts) matches every ``causes`` row
    (key, cause_ts) with the same key whose cause_ts precedes it by at most
    ``max_delay``.

    Both sides carry a watermark and the join condition bounds event-time
    distance, so Spark can evict join state: a cause's buffered row is
    dropped once the effect-side watermark passes cause_ts + max_delay —
    state is O(events within the delay horizon), not O(stream length),
    which is what makes the operator safe on an unbounded 100 TB/day feed.
    Inner matches are emitted as soon as both rows have arrived; inputs
    older than the recovered watermark are dropped (tested across a
    checkpoint restart in test_stream_join).
    """
    lt = causes.withWatermark("cause_ts", late).alias("l")
    rt = effects.withWatermark("effect_ts", late).alias("r")
    return lt.join(rt, _attribution_condition(max_delay), "inner") \
             .select(*_attribution_cols())


def attribution_join_batch(causes: DataFrame, effects: DataFrame,
                           max_delay: str = "1 hour") -> DataFrame:
    """Batch twin: the same interval join over fully-delivered inputs —
    the semantic oracle for the stream when nothing arrives late."""
    return (causes.alias("l")
            .join(effects.alias("r"), _attribution_condition(max_delay),
                  "inner")
            .select(*_attribution_cols()))


def dedup_stream(events: DataFrame, keys: list[str],
                 late: str = "30 minutes", ts_col: str = "ts") -> DataFrame:
    """Streaming exact dedup: emit the first row per ``keys`` and drop
    any duplicate arriving within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` keeps one state row per live key and
    evicts it once the watermark passes the key's event time + ``late`` —
    so, unlike a plain streaming ``dropDuplicates`` (whose state grows
    forever), memory is bounded by the duplicate-arrival horizon. The
    contract is correspondingly weaker: a duplicate arriving AFTER its
    key's state expired is re-emitted (demonstrated in test_stream_join);
    size ``late`` to the feed's real duplicate skew.
    """
    return (events
            .withWatermark(ts_col, late)
            .dropDuplicatesWithinWatermark(keys))


def dedup_batch(events: DataFrame, keys: list[str],
                ts_col: str = "ts") -> DataFrame:
    """Batch twin: earliest-event-time row per key (total order: ts, then
    the remaining columns — a bare ``dropDuplicates`` keeps an ARBITRARY
    row, which would make the twin plan-dependent and useless as an
    oracle). Matches the stream's output row-for-row when duplicates
    arrive in event-time order; for out-of-order feeds the stream keeps
    the first-ARRIVED row instead, so compare on key sets there."""
    from pyspark.sql import Window

    order = [ts_col] + [c for c in events.columns
                        if c not in keys and c != ts_col]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (events
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn"))
