"""Query-result cache — the reference's search_results table re-done.

Reference (src/models/db.py:130-138, src/services/SearchResultService.py:
29-57, document_search_client_CLI.py:11-21,40-48): a query→pickled-top-k
cache with upsert write-back and read-repair (on a cache hit the query is
re-run fresh in the background and the cache updated).

Here: a parquet table keyed by the NORMALIZED query string storing the
top-k as typed rows (no pickle anywhere — input_hint forbids it), with:

- ``lookup``  — point read, partition-pruned by query_hash bucket
- ``upsert``  — merge-by-key (delete-matching + append semantics via
  overwrite of the key's bucket; at Iceberg scale this is MERGE INTO)
- ``cached_search`` — read-through + write-back + read-repair
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import normalize_query

_CACHE_SCHEMA = T.StructType([
    T.StructField("query_norm", T.StringType(), False),
    T.StructField("bucket", T.IntegerType(), False),
    T.StructField("rank", T.IntegerType(), False),
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("score", T.DoubleType(), False),
    T.StructField("doc_count", T.LongType(), False),
])

N_BUCKETS = 64


class ResultCache:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def _norm(self, raw_query: str) -> str:
        return " ".join(normalize_query(raw_query))

    @staticmethod
    def _bucket(qnorm: str) -> int:
        import zlib

        return zlib.crc32(qnorm.encode("utf-8")) % N_BUCKETS

    def _bucket_path(self, bucket: int) -> str:
        return os.path.join(self.path, f"bucket={bucket}")

    def lookup(self, raw_query: str) -> DataFrame | None:
        """→ cached top-k DataFrame or None on miss.

        The hit is materialized eagerly (top-k rows are tiny): a lazy
        DataFrame over the bucket files would break when a later upsert
        rewrites the bucket underneath it.
        """
        qnorm = self._norm(raw_query)
        bpath = self._bucket_path(self._bucket(qnorm))
        if not os.path.exists(bpath):
            return None
        rows = (self.spark.read.schema(_CACHE_SCHEMA).parquet(bpath)
                .filter(F.col("query_norm") == qnorm)
                .collect())
        if not rows:
            return None
        return self.spark.createDataFrame(rows, _CACHE_SCHEMA)

    def upsert(self, raw_query: str, results: DataFrame, doc_count: int) -> None:
        """Merge the key's rows: existing rows for OTHER queries in the same
        bucket are kept, this query's rows are replaced (MERGE INTO shape)."""
        qnorm = self._norm(raw_query)
        bucket = self._bucket(qnorm)
        bpath = self._bucket_path(bucket)
        from pyspark.sql import Window

        new = (results.select("doc_id", "score")
               .withColumn("rank", F.row_number().over(
                   Window.orderBy(F.desc("score"), F.asc("doc_id"))))
               .withColumn("query_norm", F.lit(qnorm))
               .withColumn("bucket", F.lit(bucket))
               .withColumn("doc_count", F.lit(doc_count).cast("long"))
               .select([f.name for f in _CACHE_SCHEMA.fields]))
        if os.path.exists(bpath):
            keep = (self.spark.read.schema(_CACHE_SCHEMA).parquet(bpath)
                    .filter(F.col("query_norm") != qnorm))
            merged = keep.unionByName(new)
        else:
            merged = new
        # crash-atomic swap: write the merged bucket to a tmp dir, then
        # rename it into place. A second overwrite write of bpath would
        # delete-before-rewrite — a crash mid-rewrite loses the whole bucket
        # and a concurrent lookup reading bpath mid-swap would fail.
        import shutil

        tmp = bpath + "__tmp"
        old = bpath + "__old"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)
        merged.coalesce(1).write.mode("overwrite").parquet(tmp)
        if os.path.exists(bpath):
            os.rename(bpath, old)
        os.rename(tmp, bpath)
        shutil.rmtree(old, ignore_errors=True)

    def cached_search(self, index, raw_query: str, k: int = 10):
        """Read-through with the reference's read-repair: on a hit, return
        the cached rows AND refresh the entry from a fresh search; on a
        miss, search and write back. → (DataFrame, cache_hit: bool)."""
        hit = self.lookup(raw_query)
        fresh = index.search(raw_query, k=k)
        doc_count = fresh.count()
        self.upsert(raw_query, fresh, doc_count)
        if hit is not None:
            return hit.orderBy("rank").select("doc_id", "score"), True
        return fresh, False
