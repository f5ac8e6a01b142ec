"""applyInPandasWithState sessionization: state carried across
micro-batches AND across stream restarts (checkpoint recovery), with the
batch twin as the semantic oracle."""

import pytest
from pyspark.sql import functions as F

from search_engine_tr_spark.streaming.stateful import (sessionize_batch,
                                                       sessionize_stream)

_SCHEMA = "user_id long, ts timestamp, value double"
_GAP = 60.0


def _events_df(spark, rows):
    # rows: (user_id, epoch_sec, value) — exact instants via timestamp_seconds
    df = spark.createDataFrame(rows, "user_id long, sec long, value double")
    return df.select("user_id", F.timestamp_seconds("sec").alias("ts"), "value")


def _drain(spark, src, ckpt, sink):
    stream = spark.readStream.schema(_SCHEMA).parquet(src)
    q = (sessionize_stream(stream, gap_sec=_GAP)
         .writeStream
         .foreachBatch(lambda df, _bid: sink.extend(df.collect()))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def _sec(v):
    """epoch-ish seconds from either path (stream: float, batch: datetime)."""
    return float(v) if isinstance(v, (int, float)) else v.timestamp()


def _shape(rows):
    """tz-free comparable shape: (user, n, total, duration)."""
    return {(r["user_id"], r["n_events"], r["total_value"],
             round(_sec(r["session_end"]) - _sec(r["session_start"]), 3))
            for r in rows}


def test_sessionize_state_survives_batches_and_restarts(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    closed = []

    # batch 1: u1 one open session (0,10,20); u2 session [0] closed by the
    # t=100 event INSIDE the batch, new session opens at 100
    b1 = [(1, 0, 1.0), (1, 10, 2.0), (1, 20, 3.0), (2, 0, 5.0), (2, 100, 7.0)]
    _events_df(spark, b1).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, closed)
    assert _shape(closed) == {(2, 1, 5.0, 0.0)}

    # batch 2 (separate drain = stream RESTART from checkpoint): u1's t=200
    # closes the session held in state since batch 1 — state recovered
    b2 = [(1, 200, 9.0), (2, 130, 11.0)]
    _events_df(spark, b2).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, closed)
    assert _shape(closed) == {(2, 1, 5.0, 0.0), (1, 3, 6.0, 20.0)}

    # batch oracle over ALL events: closed streaming sessions must equal
    # the batch sessions minus each user's trailing (still-open) session
    all_df = _events_df(spark, b1 + b2)
    batch = sessionize_batch(all_df, gap_sec=_GAP).collect()
    last_per_user = {}
    for r in batch:
        cur = last_per_user.get(r["user_id"])
        if cur is None or _sec(r["session_start"]) > _sec(cur["session_start"]):
            last_per_user[r["user_id"]] = r
    expected_closed = _shape(
        [r for r in batch if r is not last_per_user[r["user_id"]]])
    assert _shape(closed) == expected_closed


def test_sessionize_batch_structure(spark):
    rows = [(1, 0, 1.0), (1, 30, 1.0), (1, 200, 1.0), (3, 5, 2.0)]
    out = sessionize_batch(_events_df(spark, rows), gap_sec=_GAP).collect()
    assert _shape(out) == {(1, 2, 2.0, 30.0), (1, 1, 1.0, 0.0),
                           (3, 1, 2.0, 0.0)}


def test_sessionize_batch_fractional_gap_matches_fold(spark):
    """gap_sec=1.5 must NOT truncate to a 1-second interval: events 1.2s
    apart stay in one session, 1.8s apart split — same rule as the
    streaming twin's float comparison (round-2 ADVICE)."""
    from search_engine_tr_spark.streaming.stateful import _fold

    df = spark.createDataFrame(
        [(1, 0.0, 1.0), (1, 1.2, 1.0), (1, 3.0, 1.0)],
        "user_id long, sec double, value double"
    ).select("user_id", F.timestamp_seconds("sec").alias("ts"), "value")
    out = sessionize_batch(df, gap_sec=1.5).collect()
    # 0.0 and 1.2 together (1.2 <= 1.5); 3.0 alone (1.8 > 1.5)
    assert _shape(out) == {(1, 2, 2.0, 1.2), (1, 1, 1.0, 0.0)}
    # streaming-fold twin agrees on the same boundaries
    closed, open_ = _fold(1, [(0.0, 1.0), (1.2, 1.0), (3.0, 1.0)],
                          None, 1.5)
    assert [(c[3], round(c[2] - c[1], 3)) for c in closed] == [(2, 1.2)]
    assert open_[2] == 1

    with pytest.raises(ValueError, match="sub-millisecond"):
        sessionize_batch(df, gap_sec=1.0005).collect()
