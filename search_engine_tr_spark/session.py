"""SparkSession builders tuned for this engine.

Local testing runs on ``local[N]`` (single JVM); the same configs are what
we'd set on a multi-executor cluster — AQE on (skew-join + coalesce),
Arrow for all pandas UDF exchange, shuffle partitions sized to the scale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def ensure_scan_parallelism(df, min_parts: int | None = None):
    """Round-robin repartition when the input is under-split — the guide
    §2.5 remedy for unsplittable inputs ("one huge unsplittable file …
    repartition immediately after the read"). A parquet file is split by
    BYTE RANGE, but a range only parallelizes across row groups: a
    single-row-group file always lands in one task no matter how small
    ``maxPartitionBytes`` is, so any expensive per-row stage behind it
    (tokenizers, Arrow kernels, HOF array math) runs on one core.

    Scale-adaptive by construction: the floor is the session's default
    parallelism, so a real multi-file/multi-row-group table (the 100 TB
    case) already exceeds it and the call is a NO-OP — no exchange is
    added. Callers project to the needed columns first so the one-off
    shuffle moves only those bytes."""
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def get_spark(app: str = "search-engine-tr-spark", cores: int | None = None,
              shuffle_partitions: int | None = None, extra: dict | None = None
              ) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(32, cores)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.local.dir",
                os.environ.get("SPARK_LOCAL_DIR", "/tmp"))
    )
    for k, v in (extra or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
