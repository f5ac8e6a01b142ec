"""Compaction: content-identical rewrite, fewer files, idempotent skip,
partition layout preserved, orphan cleanup."""

import os

from pyspark.sql import functions as F

from search_engine_tr_spark.plans.compact import compact_parquet


def _files(path):
    return [os.path.join(r, f) for r, _d, fs in os.walk(path)
            for f in fs if f.endswith(".parquet")]


def test_compact_roundtrip_and_skip(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(5000).select(
        "id", (F.col("id") % 7).alias("k"),
        F.md5(F.col("id").cast("string")).alias("payload"))
    # simulate many small appends
    for i in range(10):
        df.filter(F.col("id") % 10 == i).repartition(8) \
          .write.mode("append").parquet(path)
    before = sorted(map(tuple, spark.read.parquet(path).collect()))
    n_before = len(_files(path))
    assert n_before >= 50

    res = compact_parquet(spark, path, target_mb=128)
    assert res["skipped"] is False
    assert res["files_before"] == n_before
    assert len(_files(path)) == res["files_after"] < n_before
    after = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert after == before  # content-identical, layout-only

    # second run: already compact → no rewrite
    res2 = compact_parquet(spark, path, target_mb=128)
    assert res2["skipped"] is True

    # a stale orphan dir from a "crashed" run is cleared, not tripped over
    os.makedirs(path + ".__compact_tmp/garbage", exist_ok=True)
    res3 = compact_parquet(spark, path, target_mb=128)
    assert res3["skipped"] is True
    assert not os.path.exists(path + ".__compact_tmp")


def test_compact_preserves_partition_layout(spark, tmp_path):
    path = str(tmp_path / "p")
    df = spark.range(2000).select(
        "id", (F.col("id") % 3).alias("bucket"))
    for _ in range(6):
        df.repartition(5).write.mode("append") \
          .partitionBy("bucket").parquet(path)
    before = sorted(map(tuple, spark.read.parquet(path)
                        .select("id", "bucket").collect()))
    res = compact_parquet(spark, path, target_mb=128,
                          partition_by=["bucket"])
    assert res["files_after"] < res["files_before"]
    assert sorted(os.listdir(path) + ["_SUCCESS"]).count("bucket=0") <= 1
    assert os.path.isdir(os.path.join(path, "bucket=2"))
    after = sorted(map(tuple, spark.read.parquet(path)
                       .select("id", "bucket").collect()))
    assert after == before
