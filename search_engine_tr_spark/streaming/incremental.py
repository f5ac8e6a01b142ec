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
                             index_dir: str,
                             refresh_derived: bool = False) -> dict:
    """Append-only index update for pages whose url is not yet in doc_map.

    Appends doc_map + flat postings; with ``refresh_derived=True`` also
    rebuilds term_stats/blocks/meta so the BM25 query path sees the new
    docs (the derived rebuild reads only the compact postings table, not
    the raw pages — the expensive tokenization never re-runs). If the
    index carries the companion tables (pages_text / doc_meta / links —
    any build_index with defaults), the fresh docs' rows are appended to
    them too, so snippets, result metadata and backlink authority keep
    covering stream-ingested documents, not just the original corpus.
    """
    paths = IndexPaths(index_dir)
    doc_map = spark.read.parquet(paths.doc_map)
    # localCheckpoint (not cache): appending to doc_map below invalidates
    # any cached plan that READS doc_map (recacheByPath), which would make
    # a cached anti-join silently recompute as empty — checkpointing severs
    # the path lineage instead
    fresh = new_pages.join(doc_map.select("url"), "url", "left_anti") \
        .localCheckpoint()
    n_new = fresh.count()
    if n_new == 0:
        return {"new_docs": 0}
    # explicit None check: `or -1` would treat a legitimate max doc_id of 0
    # as missing and restart ids at 0, colliding with the existing doc
    _max_id = doc_map.agg(F.max("doc_id")).collect()[0][0]
    base = -1 if _max_id is None else int(_max_id)
    new_ids = (assign_doc_ids(fresh)
               .withColumn("doc_id", F.col("doc_id") + F.lit(base + 1))
               .localCheckpoint())
    new_ids.write.mode("append").parquet(paths.doc_map)
    if os.path.isdir(paths.pages_text):
        from ..functions.text import extract_text_udf
        (fresh.select("url", extract_text_udf(F.col("html")).alias("text"),
                      "lang")
         .write.mode("append").parquet(paths.pages_text))
    if os.path.isdir(paths.doc_meta):
        from ..plans.index_build import materialize_doc_meta
        materialize_doc_meta(fresh, new_ids, paths.doc_meta, mode="append")
    if os.path.isdir(paths.links):
        from ..plans.index_build import materialize_links
        materialize_links(fresh, paths.links, mode="append")
    occ = occurrences_from_pages(fresh)
    postings = postings_from_occurrences(occ, new_ids).localCheckpoint()
    n_postings = postings.count()
    postings.write.mode("append").parquet(paths.postings)
    out = {"new_docs": n_new, "new_postings": n_postings}
    if refresh_derived:
        out.update(rebuild_derived(spark, index_dir))
    return out


def rebuild_derived(spark: SparkSession, index_dir: str,
                    n_shards: int | None = None,
                    term_buckets: int | None = None) -> dict:
    """Rebuild term_stats/blocks/meta.json from the (appended) postings."""
    import json

    from ..plans.index_build import build_blocks
    from ..plans.stats import corpus_stats, doc_lengths, term_stats

    paths = IndexPaths(index_dir)
    with open(paths.meta) as f:
        meta = json.load(f)
    n_shards = n_shards or int(meta.get("n_shards", 32))
    term_buckets = term_buckets or int(meta.get("term_buckets", 64))
    postings = spark.read.parquet(paths.postings)
    doclens = doc_lengths(postings).cache()
    stats = corpus_stats(doclens)
    ts = (term_stats(postings)
          .withColumn("term_bucket",
                      F.pmod(F.xxhash64("term"), F.lit(term_buckets)).cast("int")))
    ts.write.mode("overwrite").partitionBy("term_bucket") \
        .parquet(paths.term_stats)
    blocks = build_blocks(postings, doclens, stats.avgdl, n_shards, term_buckets)
    blocks.write.mode("overwrite").partitionBy("term_bucket").parquet(paths.blocks)
    doclens.unpersist()
    meta.update({"n_docs": stats.n_docs, "avgdl": stats.avgdl,
                 "total_postings": stats.total_postings,
                 "n_shards": n_shards, "term_buckets": term_buckets})
    with open(paths.meta, "w") as f:
        json.dump(meta, f, indent=2)
    return {"n_docs": stats.n_docs, "total_postings": stats.total_postings}


def stream_ingest_index(spark: SparkSession, pages_dir: str, index_dir: str,
                        checkpoint_dir: str, n_shards: int = 8,
                        term_buckets: int = 16, pages_schema=None) -> dict:
    """Streaming ingestion into the QUERYABLE index: watch ``pages_dir``
    for new parquet files and fold each micro-batch into the block index.

    Composition of the two exactly-once layers this module already has:
    the file-source checkpoint guarantees each page FILE enters exactly
    one micro-batch (across restarts), and ``incremental_index_update``'s
    url anti-join makes a replayed batch a no-op — so a crash between
    "batch delivered" and "checkpoint committed" cannot double-index.
    Cold start bootstraps a full ``build_index`` from the first batch;
    warm batches append (postings + the companion pages_text/doc_meta/
    links rows). Derived tables (term_stats/blocks/meta) are rebuilt at
    most ONCE after the availableNow drain rather than per batch — at
    100 TB the tokenize/append work is the data-proportional part and
    runs per batch, while the derived rebuild reads only the compact
    postings table. The rebuild triggers on a STALENESS CHECK
    (doc_map count vs meta.json's n_docs), not on this drain's append
    counter: a crash between a committed micro-batch and the rebuild
    leaves the derived tables stale, and the next drain — even an empty
    one — detects the mismatch and heals it.

    ``index_dir`` must be reachable by the driver's local ``open()`` for
    meta.json — the same constraint as build_index/rebuild_derived (for
    an object-store index root, port the meta handling to the Hadoop FS
    API first; the bootstrap probe below shares that assumption).

    Blocking (availableNow): returns {"new_docs": total appended this
    drain, ...} after the drain and any needed derived refresh.
    """
    if pages_schema is None:
        from ..sources.synth import pages_schema as ps
        pages_schema = ps()
    paths = IndexPaths(index_dir)
    totals = {"new_docs": 0, "new_postings": 0}

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not os.path.exists(paths.meta):
            from ..plans.index_build import build_index
            m = build_index(spark, batch_df, index_dir, n_shards=n_shards,
                            term_buckets=term_buckets)
            totals["new_docs"] += int(m.get("n_docs", 0))
            totals["new_postings"] += int(m.get("total_postings", 0))
        else:
            m = incremental_index_update(spark, batch_df, index_dir,
                                         refresh_derived=False)
            totals["new_docs"] += int(m.get("new_docs", 0))
            totals["new_postings"] += int(m.get("new_postings", 0))

    q = (spark.readStream.schema(pages_schema).parquet(pages_dir)
         .writeStream
         .foreachBatch(process_batch)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    if os.path.exists(paths.meta):
        import json
        with open(paths.meta) as f:
            indexed = int(json.load(f).get("n_docs", -1))
        if spark.read.parquet(paths.doc_map).count() != indexed:
            totals.update(rebuild_derived(spark, index_dir))
    return totals


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
