"""Stream-stream watermarked interval join + bounded-state streaming dedup:
batch-twin agreement, late-input drop across a checkpoint restart, and
post-expiry re-emission (the dropDuplicatesWithinWatermark contract)."""

from pyspark.sql import functions as F

from search_engine_tr_spark.streaming.windowed import (attribution_join_batch,
                                                       attribution_join_stream,
                                                       dedup_batch,
                                                       dedup_stream)

H = 3600

_CAUSE_SCHEMA = "key string, cause_ts timestamp"
_EFFECT_SCHEMA = "key string, effect_ts timestamp"
_EVENT_SCHEMA = "key string, ts timestamp, value double"


def _ts_df(spark, rows, sec_schema, ts_col):
    df = spark.createDataFrame(rows, sec_schema)
    return df.select("key", F.timestamp_seconds("sec").alias(ts_col),
                     *([c for c in df.columns if c not in ("key", "sec")]))


def _causes(spark, rows):
    return _ts_df(spark, rows, "key string, sec long", "cause_ts")


def _effects(spark, rows):
    return _ts_df(spark, rows, "key string, sec long", "effect_ts")


def _drain_join(spark, cause_src, effect_src, ckpt, sink):
    joined = attribution_join_stream(
        spark.readStream.schema(_CAUSE_SCHEMA).parquet(cause_src),
        spark.readStream.schema(_EFFECT_SCHEMA).parquet(effect_src),
        max_delay="1 hour", late="30 minutes")
    q = (joined.writeStream
         .foreachBatch(lambda df, _bid: sink.extend(df.collect()))
         .outputMode("append")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def _join_shape(rows):
    return {(r["key"], r["cause_ts"].timestamp(), r["effect_ts"].timestamp(),
             r["delay_sec"]) for r in rows}


# Base offset keeps every event strictly after the stream's initial
# watermark (epoch 0): a row whose event time EQUALS the watermark is
# dropped by the strictly-greater late filter, so ts=0 test data would
# vanish — a test-data artifact real feeds never hit.
B = 1000 * H


def test_attribution_join_matches_batch_twin(spark, tmp_path):
    cause_src = str(tmp_path / "causes")
    effect_src = str(tmp_path / "effects")
    ckpt = str(tmp_path / "ckpt")
    out = []

    causes = [("ad1", B), ("ad2", B + 100), ("ad1", B + 2 * H)]
    effects = [("ad1", B + 600),         # within 1h of ad1@B -> match
               ("ad1", B + 2 * H + 50),  # within 1h of ad1@B+2H -> one match
               ("ad2", B + 100 + 2 * H),  # > max_delay after ad2 -> no match
               ("ad3", B + 50)]           # no cause -> no match
    _causes(spark, causes).coalesce(1).write.mode("append").parquet(cause_src)
    _effects(spark, effects).coalesce(1).write.mode("append") \
        .parquet(effect_src)
    _drain_join(spark, cause_src, effect_src, ckpt, out)

    got = _join_shape(out)
    assert got == {("ad1", float(B), float(B + 600), 600),
                   ("ad1", float(B + 2 * H), float(B + 2 * H + 50), 50)}

    twin = _join_shape(attribution_join_batch(
        _causes(spark, causes), _effects(spark, effects), "1 hour").collect())
    assert got == twin

    # restart: an effect behind the recovered watermark (max effect_ts
    # B+2H+100s - 30min ≈ B+1.53h) is dropped even though a cause matches
    # it, while an on-time effect still joins — state and lateness survive
    # the checkpoint.
    _effects(spark, [("ad1", B + 120),            # late -> dropped
                     ("ad1", B + 2 * H + 900)]).coalesce(1) \
        .write.mode("append").parquet(effect_src)
    _drain_join(spark, cause_src, effect_src, ckpt, out)
    assert _join_shape(out) == got | {
        ("ad1", float(B + 2 * H), float(B + 2 * H + 900), 900)}


def _events(spark, rows):
    return _ts_df(spark, rows, "key string, sec long, value double", "ts")


def _drain_dedup(spark, src, ckpt, sink):
    deduped = dedup_stream(
        spark.readStream.schema(_EVENT_SCHEMA).parquet(src),
        keys=["key"], late="30 minutes")
    q = (deduped.writeStream
         .foreachBatch(lambda df, _bid: sink.extend(df.collect()))
         .outputMode("append")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def test_streaming_dedup_bounded_state(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    out = []

    # drain 1: k1 twice in one batch -> emitted once; k2 once.
    b1 = [("k1", 10, 1.0), ("k1", 20, 1.0), ("k2", 15, 2.0)]
    _events(spark, b1).coalesce(1).write.mode("append").parquet(src)
    _drain_dedup(spark, src, ckpt, out)
    assert sorted(r["key"] for r in out) == ["k1", "k2"]

    # drain 2 (restart): k1 again while its state row is still live
    # (watermark ~0 < 10s + 30min) -> still deduped; k3 is new.
    b2 = [("k1", 60, 1.0), ("k3", 5 * H, 3.0)]
    _events(spark, b2).coalesce(1).write.mode("append").parquet(src)
    _drain_dedup(spark, src, ckpt, out)
    assert sorted(r["key"] for r in out) == ["k1", "k2", "k3"]

    # drain 3: watermark recovered at 5h - 30min = 4.5h, far past every
    # earlier key's expiry (ts + 30min) -> k1's state was EVICTED, so a
    # fresh k1 re-emits. This is the documented within-watermark contract
    # (bounded state traded for horizon-limited dedup).
    _events(spark, [("k1", 5 * H + 60, 9.0)]).coalesce(1) \
        .write.mode("append").parquet(src)
    _drain_dedup(spark, src, ckpt, out)
    assert sorted(r["key"] for r in out) == ["k1", "k1", "k2", "k3"]

    # batch twin: deterministic earliest-ts-per-key — exact rows, not an
    # arbitrary dropDuplicates pick. The stream's survivor is
    # first-ARRIVED (shuffle-order-dependent within a batch), so compare
    # it on (key, value) — identical across picks here by construction.
    twin = {(r["key"], r["ts"].timestamp(), r["value"])
            for r in dedup_batch(_events(spark, b1), ["key"]).collect()}
    assert twin == {("k1", 10.0, 1.0), ("k2", 15.0, 2.0)}
    assert {(r["key"], r["value"]) for r in out[:2]} \
        == {("k1", 1.0), ("k2", 2.0)}


from hypothesis import given, settings
from hypothesis import strategies as st


def _py_attribution(causes, effects, max_delay_sec):
    """Pure-python oracle: every (cause, effect) pair with the same key and
    0 < effect_ts - cause_ts <= max_delay_sec."""
    return {(k, float(ct), float(et), et - ct)
            for k, ct in causes for k2, et in effects
            if k == k2 and 0 < et - ct <= max_delay_sec}


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 5000)),
                min_size=0, max_size=30),
       st.lists(st.tuples(st.integers(0, 3), st.integers(0, 5000)),
                min_size=0, max_size=30))
def test_attribution_batch_twin_matches_python(spark, causes, effects):
    """Property: the batch twin (the stream's semantic oracle) equals a
    pure-python pair scan for any key/ts layout — duplicates, boundary
    delays (exactly max_delay in; exactly 0 out), unmatched keys. The
    interval is seconds-scale so INTERVAL arithmetic crosses no DST-like
    edge; ts mapped off epoch to mirror real feeds."""
    B = 10 ** 6
    crows = [(f"k{k}", B + t) for k, t in causes]
    erows = [(f"k{k}", B + t) for k, t in effects]
    cdf = (spark.createDataFrame(crows, "key string, sec long")
           if crows else spark.createDataFrame([], "key string, sec long"))
    edf = (spark.createDataFrame(erows, "key string, sec long")
           if erows else spark.createDataFrame([], "key string, sec long"))
    got = _join_shape(attribution_join_batch(
        _to_cause_ts(cdf), _to_effect_ts(edf), "100 seconds").collect())
    assert got == _py_attribution(crows, erows, 100)


def _to_cause_ts(df):
    return df.select("key", F.timestamp_seconds("sec").alias("cause_ts"))


def _to_effect_ts(df):
    return df.select("key", F.timestamp_seconds("sec").alias("effect_ts"))


def test_attribution_stream_plan_is_streaming(spark, tmp_path):
    import os
    c, e = str(tmp_path / "c"), str(tmp_path / "e")
    os.makedirs(c), os.makedirs(e)
    df = attribution_join_stream(
        spark.readStream.schema(_CAUSE_SCHEMA).parquet(c),
        spark.readStream.schema(_EFFECT_SCHEMA).parquet(e))
    assert df.isStreaming
    assert df.columns == ["key", "cause_ts", "effect_ts", "delay_sec"]
