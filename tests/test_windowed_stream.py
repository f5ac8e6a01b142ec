"""Watermarked streaming window agg: append-mode finalization across
stream restarts, late-data drop at the watermark, batch twin agreement
for on-time data."""

from pyspark.sql import functions as F

from search_engine_tr_spark.streaming.windowed import (windowed_counts_batch,
                                                       windowed_counts_stream)

_SCHEMA = "ts timestamp, event_type string, value double"


def _events_df(spark, rows):
    df = spark.createDataFrame(rows, "sec long, event_type string, value double")
    return df.select(F.timestamp_seconds("sec").alias("ts"),
                     "event_type", "value")


def _drain(spark, src, ckpt, sink):
    stream = spark.readStream.schema(_SCHEMA).parquet(src)
    q = (windowed_counts_stream(stream, window_dur="1 hour",
                                late="30 minutes")
         .writeStream
         .foreachBatch(lambda df, _bid: sink.extend(df.collect()))
         .outputMode("append")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def _shape(rows):
    return {(r["win_start"].timestamp(), r["event_type"],
             r["n"], r["total"]) for r in rows}


H = 3600


def test_watermark_finalizes_windows_and_drops_late(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    out = []

    # drain 1: two events in hour-0, one in hour-2. The hour-2 event
    # advances the watermark past hour-0's end (2h − 30min = 1.5h > 1h),
    # and availableNow's finalization batch emits the closed window within
    # the drain. Hour-2 itself stays pending (watermark < its end).
    b1 = [(10, "click", 1.0), (1800, "click", 2.0), (2 * H + 60, "view", 5.0)]
    _events_df(spark, b1).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)
    assert _shape(out) == {(0.0, "click", 2, 3.0)}

    # drain 2 (restart from checkpoint — watermark state recovered):
    # a LATE hour-0 event (behind the 1.5h watermark) must be DROPPED —
    # no re-emission, no new hour-0 row — while the fresh hour-4 event
    # pushes the watermark to 3.5h and finalizes hour-2.
    b2 = [(120, "click", 100.0), (4 * H, "view", 7.0)]
    _events_df(spark, b2).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)
    assert _shape(out) == {(0.0, "click", 2, 3.0),
                           (2.0 * H, "view", 1, 5.0)}  # late 100.0 gone

    # drain 3: a 6h event finalizes hour-4
    _events_df(spark, [(6 * H, "view", 0.5)]).coalesce(1) \
        .write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)
    assert (4.0 * H, "view", 1, 7.0) in _shape(out)

    # batch twin on the ON-TIME events == every window the stream has or
    # will finalize (the stream's rows are a prefix of the twin's)
    on_time = b1 + [(4 * H, "view", 7.0), (6 * H, "view", 0.5)]
    twin = _shape(windowed_counts_batch(
        _events_df(spark, on_time), "1 hour").collect())
    assert _shape(out) <= twin


def test_hopping_stream_form_builds(spark, tmp_path):
    """The hopping variant resolves against a streaming source (plan-level
    check; semantics are value-checked via the batch twin's gate oracle)."""
    src = str(tmp_path / "empty_src")
    import os
    os.makedirs(src, exist_ok=True)
    stream = spark.readStream.schema(_SCHEMA).parquet(src)
    df = windowed_counts_stream(stream, "2 hours", "30 minutes", "1 hour")
    assert df.isStreaming
    assert set(df.columns) == {"win_start", "event_type", "n", "total"}
