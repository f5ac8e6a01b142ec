"""Inverted-index build: pages → occurrences → postings → posting blocks.

Spark-first layout (vs the reference's one-DB-row-per-occurrence,
indexer.py:28-38):

- ``doc_map``     (url, doc_id)                    dense stable ids (docids.py)
- ``postings``    (doc_id, term, tf, positions, tags)   flat logical index
- ``doclens``     (doc_id, dl)
- ``term_stats``  (term, df, term_bucket)          exact df for BM25 idf
- ``blocks``      (term, shard, block_no, n, max_doc_id, max_tfnorm,
                   avgdl0, block)
                  parquet partitioned BY term_bucket → query-term partition
                  pruning, the scalable replacement for the reference's
                  27-way first-letter routing (src/models/db.py:105-114)

Skew strategy (north rule): every term's posting list is doc-sharded into
``n_shards`` sub-lists (shard = pmod(xxhash64(doc_id), S)) that are merged
at score time by the global top-k — this IS the "split a head term's
postings into term#salt sub-lists" salting: a Zipfian head term occupying
50% of documents costs any single task at most df/S postings, and the block
builder groups by (term_bucket, shard) so no pandas group ever holds more
than one bucket of one shard. Skew ratios (max/mean postings per bucket and
per shard) are measured and reported in the build metrics.

Scale notes (100 TB / 1000 executors):
- tokenize+explode is a map-only stage (no shuffle) feeding a partial-agg
  groupBy — the only wide exchanges are groupBy(doc_id, term) and the
  (term_bucket, shard) repartition for block packing.
- blocks parquet is written with data-change-friendly deterministic content;
  rewriting a shard is idempotent (resume support in checkpoint.py).
"""

from __future__ import annotations

import json
import math
import os
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.codec import BLOCK_SIZE, encode_block
from ..functions.text import (extract_links_udf, extract_meta_udf,
                              extract_text_udf, tokenize_udf)
from ..oracle.refscore import BM25_B, BM25_K1
from . import fsio
from .docids import assign_doc_ids
from .stats import corpus_stats, doc_lengths


@dataclass
class IndexPaths:
    root: str

    @property
    def doc_map(self) -> str: return os.path.join(self.root, "doc_map")
    @property
    def postings(self) -> str: return os.path.join(self.root, "postings")
    @property
    def doclens(self) -> str: return os.path.join(self.root, "doclens")
    @property
    def term_stats(self) -> str: return os.path.join(self.root, "term_stats")
    @property
    def blocks(self) -> str: return os.path.join(self.root, "blocks")
    @property
    def meta(self) -> str: return os.path.join(self.root, "meta.json")
    @property
    def pages_text(self) -> str: return os.path.join(self.root, "pages_text")
    @property
    def links(self) -> str: return os.path.join(self.root, "links")
    @property
    def doc_meta(self) -> str: return os.path.join(self.root, "doc_meta")
    @property
    def domain_scores(self) -> str: return os.path.join(self.root, "domain_scores")


def read_postings(spark: SparkSession, postings_dir: str) -> DataFrame:
    """Layout-agnostic postings read. The resumable builder writes under
    ``chunk=N`` subdirectories while incremental ingest appends flat
    files at the table root; partition INFERENCE on that mixed layout
    silently drops the top-level files (found in optimization round 6 —
    an appended batch became unsearchable after a resumable bootstrap).
    ``recursiveFileLookup`` unions every file regardless of nesting and
    skips the synthetic ``chunk`` directory column, which no reader uses.
    """
    return (spark.read.option("recursiveFileLookup", "true")
            .parquet(postings_dir))


def extract_pages(pages: DataFrame) -> DataFrame:
    """Fill the ``text`` column (byte-identical per url, input_hint)."""
    return pages.withColumn("text", extract_text_udf(F.col("html")))


def occurrences_from_pages(pages: DataFrame) -> DataFrame:
    """pages → (url, word, loc, tag), empty-body guard per indexer.py:19-22."""
    toks = (pages
            .filter(F.col("html").isNotNull())
            .select("url", F.explode(tokenize_udf(F.col("html"))).alias("t")))
    return toks.select(
        "url",
        F.col("t.word").alias("word"),
        F.col("t.loc").alias("loc"),
        F.col("t.tag").alias("tag"),
    )


def postings_from_occurrences(occ: DataFrame, doc_map: DataFrame) -> DataFrame:
    """(doc_id, term, tf, positions, tags) — A1: positions sorted ascending,
    tags aligned to positions (struct-sort keeps pairs together)."""
    joined = occ.join(doc_map, "url")
    return (joined
            .groupBy("doc_id", F.col("word").alias("term"))
            .agg(
                F.count("*").cast("int").alias("tf"),
                F.sort_array(F.collect_list(F.struct("loc", "tag"))).alias("_occ"),
            )
            .select(
                "doc_id", "term", "tf",
                F.col("_occ.loc").alias("positions"),
                F.col("_occ.tag").alias("tags"),
            ))


_POSTINGS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("term", T.StringType(), False),
    T.StructField("tf", T.IntegerType(), False),
    T.StructField("positions", T.ArrayType(T.IntegerType(), False), False),
    T.StructField("tags", T.ArrayType(T.StringType(), False), False),
])


def _postings_rows_batches(batches):
    """mapInPandas kernel: (doc_id, html) batches → postings rows.

    A document's occurrences all live in ITS OWN input row (the tokenizer
    is per-page), so the per-(doc, term) aggregation is row-local — the
    round-5/early-r6 shape exploded one row per occurrence and shipped the
    whole occurrence stream (positions, tags) through a wide
    groupBy(doc_id, term) exchange to reassemble what this kernel builds
    in place (guide §2.4: remove shuffles outright). Occurrence order is
    the tokenizer's global location counter (strictly increasing), so
    per-term (loc, tag) pairs appended in emission order equal the old
    ``sort_array(struct(loc, tag))`` output exactly. Module-level so every
    caller pickles the identical function (plan canonicalization)."""
    from ..oracle.htmltext import tokenize

    for pdf in batches:
        out_doc: list = []
        out_term: list = []
        out_tf: list = []
        out_pos: list = []
        out_tags: list = []
        for did, html in zip(pdf["doc_id"], pdf["html"]):
            if html is None:
                continue
            content = bytes(html).decode("utf-8", errors="ignore")
            occ = tokenize(content)
            if not occ:
                continue
            by: dict = {}
            for word, loc, tag in occ:
                e = by.get(word)
                if e is None:
                    by[word] = ([loc], [tag])
                else:
                    e[0].append(loc)
                    e[1].append(tag)
            did = int(did)
            for word, (locs, tags) in by.items():
                out_doc.append(did)
                out_term.append(word)
                out_tf.append(len(locs))
                out_pos.append(locs)
                out_tags.append(tags)
        yield pd.DataFrame({"doc_id": out_doc, "term": out_term,
                            "tf": out_tf, "positions": out_pos,
                            "tags": out_tags})


def postings_from_pages(pages: DataFrame, doc_map: DataFrame) -> DataFrame:
    """Same rows as ``postings_from_occurrences(occurrences_from_pages(
    pages), doc_map)``: the doc_map join happens BEFORE tokenization (one
    row per PAGE crosses the join, guide §3.3), and the per-(doc, term)
    aggregation runs INSIDE the tokenize kernel (``_postings_rows_batches``)
    — a document's occurrences are row-local, so the flat occurrence
    stream never crosses an exchange at all (the pre-r6 shape shuffled
    every (word, loc, tag) occurrence through a groupBy). Same tokenizer,
    same empty-body guard, same (loc-ordered) positions/tags."""
    with_ids = (pages
                .filter(F.col("html").isNotNull())
                .join(doc_map, "url")
                .select("doc_id", "html"))
    return with_ids.mapInPandas(_postings_rows_batches,
                                schema=_POSTINGS_SCHEMA)


_BLOCK_SCHEMA = T.StructType([
    T.StructField("term", T.StringType(), False),
    T.StructField("term_bucket", T.IntegerType(), False),
    T.StructField("shard", T.IntegerType(), False),
    T.StructField("block_no", T.IntegerType(), False),
    T.StructField("n", T.IntegerType(), False),
    T.StructField("max_doc_id", T.LongType(), False),
    T.StructField("max_tfnorm", T.DoubleType(), False),
    # the avgdl the packer used for max_tfnorm. Blocks appended later by
    # refresh_derived_delta are packed under a DIFFERENT (newer) avgdl, and
    # the corpus avgdl keeps moving as docs arrive — the reader restores a
    # valid upper bound by scaling max_tfnorm with max(1, avgdl_now/avgdl0)
    # (tfnorm grows at most linearly in avgdl; see BM25Index.search)
    T.StructField("avgdl0", T.DoubleType(), False),
    T.StructField("block", T.BinaryType(), False),
])


def _block_packer(avgdl: float, k1: float = BM25_K1, b: float = BM25_B):
    """applyInPandas fn: one (term_bucket, shard) group → packed blocks.

    max_tfnorm is the term-independent part of the BM25 impact upper bound;
    at query time block max impact = idf(term) * max_tfnorm (exact bound).
    """

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["term", "doc_id"], kind="mergesort")
        docs = pdf["doc_id"].to_numpy(np.int64)
        tfs = pdf["tf"].to_numpy(np.int64)
        dls = pdf["dl"].to_numpy(np.int64)
        tfnorm = (tfs * (k1 + 1.0)) / (tfs + k1 * (1.0 - b + b * dls / avgdl))
        bucket = int(pdf["term_bucket"].iloc[0])
        shard = int(pdf["shard"].iloc[0])
        rows = []
        # term boundaries in the sorted frame
        terms = pdf["term"].to_numpy()
        starts = np.nonzero(np.concatenate(([True], terms[1:] != terms[:-1])))[0]
        ends = np.concatenate((starts[1:], [len(terms)]))
        for s, e in zip(starts, ends):
            term = terms[s]
            for bno, off in enumerate(range(s, e, BLOCK_SIZE)):
                hi = min(off + BLOCK_SIZE, e)
                blk_docs = docs[off:hi].astype(np.uint64)
                blk = encode_block(blk_docs, tfs[off:hi].astype(np.uint64),
                                   dls[off:hi].astype(np.uint64))
                rows.append((term, bucket, shard, bno, int(hi - off),
                             int(docs[hi - 1]), float(tfnorm[off:hi].max()),
                             float(avgdl), blk))
        return pd.DataFrame(rows, columns=[f.name for f in _BLOCK_SCHEMA.fields])

    return pack


def _enrich_for_blocks(postings: DataFrame, doclens: DataFrame,
                       n_shards: int, term_buckets: int) -> DataFrame:
    return (postings.select("doc_id", "term", "tf")
            .join(doclens, "doc_id")
            .withColumn("shard",
                        F.pmod(F.xxhash64("doc_id"), F.lit(n_shards)).cast("int"))
            .withColumn("term_bucket",
                        F.pmod(F.xxhash64("term"), F.lit(term_buckets)).cast("int")))


def build_blocks(postings: DataFrame, doclens: DataFrame, avgdl: float,
                 n_shards: int, term_buckets: int) -> DataFrame:
    """Group-at-a-time packing: one pandas group per (term_bucket, shard).
    Simple and fast, but a task holds its whole group in memory — bounded
    by salting (≤ 1/(B·S) of all postings), which the builder must size."""
    enriched = _enrich_for_blocks(postings, doclens, n_shards, term_buckets)
    return (enriched
            .groupBy("term_bucket", "shard")
            .applyInPandas(_block_packer(avgdl), schema=_BLOCK_SCHEMA))


def _sorted_stream_packer(avgdl: float, k1: float = BM25_K1, b: float = BM25_B):
    """mapInPandas fn over a (term_bucket, shard)-hashed, fully sorted
    partition: streams Arrow batches, emitting each term's blocks as its
    sorted run completes. Peak memory = one Arrow batch + one term's
    in-flight run (df/S postings) — NOT the whole group."""
    cols = [f.name for f in _BLOCK_SCHEMA.fields]

    def pack(batches):
        carry = None  # (key(bucket, shard, term), docs, tfs, dls)
        out_rows: list = []

        def emit(key, d, t, l):
            bucket, shard, term = key
            tfnorm = (t * (k1 + 1.0)) / (t + k1 * (1.0 - b + b * l / avgdl))
            for bno, off in enumerate(range(0, len(d), BLOCK_SIZE)):
                hi = min(off + BLOCK_SIZE, len(d))
                blk = encode_block(d[off:hi].astype(np.uint64),
                                   t[off:hi].astype(np.uint64),
                                   l[off:hi].astype(np.uint64))
                out_rows.append((term, int(bucket), int(shard), bno,
                                 int(hi - off), int(d[hi - 1]),
                                 float(tfnorm[off:hi].max()),
                                 float(avgdl), blk))

        for pdf in batches:
            if pdf.empty:
                continue
            buckets = pdf["term_bucket"].to_numpy()
            shards = pdf["shard"].to_numpy()
            terms = pdf["term"].to_numpy()
            docs = pdf["doc_id"].to_numpy(np.int64)
            tfs = pdf["tf"].to_numpy(np.int64)
            dls = pdf["dl"].to_numpy(np.int64)
            change = np.concatenate(([True],
                                     (terms[1:] != terms[:-1])
                                     | (buckets[1:] != buckets[:-1])
                                     | (shards[1:] != shards[:-1])))
            starts = np.nonzero(change)[0]
            ends = np.concatenate((starts[1:], [len(terms)]))
            last = len(starts) - 1
            for i, (s, e) in enumerate(zip(starts, ends)):
                key = (buckets[s], shards[s], terms[s])
                d, t, l = docs[s:e], tfs[s:e], dls[s:e]
                if carry is not None:
                    if carry[0] == key:  # run continues across batches
                        d = np.concatenate((carry[1], d))
                        t = np.concatenate((carry[2], t))
                        l = np.concatenate((carry[3], l))
                    else:
                        emit(carry[0], carry[1], carry[2], carry[3])
                    carry = None
                if i == last:
                    carry = (key, d, t, l)  # may continue into next batch
                else:
                    emit(key, d, t, l)
            if out_rows:
                yield pd.DataFrame(out_rows, columns=cols)
                out_rows = []
        if carry is not None:
            emit(carry[0], carry[1], carry[2], carry[3])
        if out_rows:
            yield pd.DataFrame(out_rows, columns=cols)

    return pack


def build_blocks_sorted(postings: DataFrame, doclens: DataFrame, avgdl: float,
                        n_shards: int, term_buckets: int) -> DataFrame:
    """The north-rule multi-pass sorted merge: repartition on the block key
    and SORT WITHIN PARTITIONS, then stream-pack — Spark's external sort
    spills arbitrarily large partitions to disk, and the packer never holds
    more than one term run, so this path survives groups (and terms) that
    exceed task memory. Output is bit-identical to ``build_blocks``."""
    enriched = _enrich_for_blocks(postings, doclens, n_shards, term_buckets)
    return (enriched
            .repartition("term_bucket", "shard")
            .sortWithinPartitions("term_bucket", "shard", "term", "doc_id")
            .mapInPandas(_sorted_stream_packer(avgdl), schema=_BLOCK_SCHEMA))


def _skew_ratio(df: DataFrame, key: str) -> float:
    row = (df.groupBy(key).count()
           .agg(F.max("count").alias("mx"), F.avg("count").alias("mean"))
           .collect()[0])
    return float(row["mx"] / row["mean"]) if row["mean"] else 0.0


def materialize_doc_meta(pages: DataFrame, doc_map: DataFrame,
                         out_path: str, mode: str = "overwrite") -> None:
    """(doc_id, url, title, description, keywords) — the result-page
    metadata the reference attaches to every hit (src/modules/pagerank.py:
    119-126, document_search_client_CLI.py:57-61). ``mode='append'`` is
    the incremental-ingest form (new docs only)."""
    (pages.select("url", extract_meta_udf(F.col("html")).alias("m"))
     .join(doc_map, "url")
     .select("doc_id", "url",
             F.col("m.title").alias("title"),
             F.col("m.description").alias("description"),
             F.col("m.keywords").alias("keywords"))
     .write.mode(mode).parquet(out_path))


def materialize_links(pages: DataFrame, out_path: str,
                      mode: str = "overwrite") -> None:
    """(source_url, link_type, target_url, anchor_text) — the backlinks
    table the reference's crawler persists and backlink_analyser.py:29-62
    consumes. One explode over the Arrow-batched link extractor; map-only."""
    (pages.select(
        F.col("url").alias("source_url"),
        F.explode(extract_links_udf(F.col("url"), F.col("html"))).alias("l"))
     .select("source_url",
             F.col("l.type").alias("link_type"),
             F.col("l.href").alias("target_url"),
             F.col("l.anchor_text").alias("anchor_text"))
     .write.mode(mode).parquet(out_path))


def build_index(spark: SparkSession, pages: DataFrame, out_dir: str,
                n_shards: int = 32, term_buckets: int = 64,
                collect_metrics: bool = True, write_text: bool = True,
                write_meta: bool = True, write_links: bool = True,
                packer: str = "group") -> dict:
    """Full build. Writes all index tables under ``out_dir``; returns metrics.

    ``write_text=True`` also materializes the input_hint contract column —
    the byte-identical extracted ``text`` per url — as a pages_text table
    (url, text, lang). This is part of the job, not an extra: the input
    table arrives with text=NULL and the engine must fill it.

    ``write_meta``/``write_links`` materialize the result-metadata and
    backlink tables (doc_meta, links) so the standing authority pipeline
    (plans.backlinks.refresh_domain_scores → search_blended /
    reference_rank) runs off this build with no hand-assembly.
    """
    paths = IndexPaths(out_dir)
    t0 = time.monotonic()

    # guide §2.5: an under-split pages input (e.g. one unsplittable parquet
    # row group) would pin every UDF stage below — extract, tokenize, link
    # parse — to one task; the widen is a no-op when pages is already
    # split, i.e. on any real corpus
    from ..session import ensure_scan_parallelism
    pages = ensure_scan_parallelism(pages)

    # pages_text depends only on the pages scan — run its extract+write in
    # a driver thread CONCURRENT with the doc_map/postings chain (guide
    # §2.6: overlap independent jobs so one job's task tail back-fills
    # with the next job's tasks). Spark schedules concurrent jobs FIFO;
    # errors propagate at the join below.
    text_thread, text_err = None, []
    if write_text:
        import threading

        def _write_text() -> None:
            try:
                spark.sparkContext.setJobDescription("build: pages_text")
                (pages.select("url",
                              extract_text_udf(F.col("html")).alias("text"),
                              "lang")
                 .write.mode("overwrite").parquet(paths.pages_text))
            except BaseException as e:  # re-raised on the main thread
                text_err.append(e)

        text_thread = threading.Thread(target=_write_text,
                                       name="build-pages-text")
        text_thread.start()

    doc_map = assign_doc_ids(pages)
    doc_map.write.mode("overwrite").parquet(paths.doc_map)
    doc_map = spark.read.parquet(paths.doc_map)

    if write_meta:
        materialize_doc_meta(pages, doc_map, paths.doc_meta)
    if write_links:
        materialize_links(pages, paths.links)

    postings = postings_from_pages(pages, doc_map)
    postings.write.mode("overwrite").parquet(paths.postings)
    postings = read_postings(spark, paths.postings)

    if text_thread is not None:
        text_thread.join()
        if text_err:
            raise text_err[0]

    # doclens is derived (dl is packed into the blocks; the query path never
    # reads a doclens table) — cache instead of a write+read round-trip
    doclens = doc_lengths(postings).cache()
    stats = corpus_stats(doclens)

    block_fn = {"group": build_blocks, "sorted": build_blocks_sorted}[packer]
    blocks = block_fn(postings, doclens, stats.avgdl, n_shards, term_buckets)
    # repartition ON the partitionBy key before the write (guide §6): the
    # packer's output partitions each hold many term_buckets, so a direct
    # partitionBy write sprays one file per (task × bucket) — measured 891
    # files for a 12k-page build. Clustering by term_bucket first writes
    # ONE file per bucket (packed block bytes, a cheap exchange of the
    # already-compact payload), which every pruned query read and the
    # term_stats derivation below then benefit from.
    (blocks.repartition("term_bucket")
     .write.mode("overwrite")
     .partitionBy("term_bucket")
     .parquet(paths.blocks))
    doclens.unpersist()

    # term_stats derived FROM the written blocks table (round 6, guide
    # §2.3): every posting of a term lands in exactly one block, so
    # df = Σ block.n — grouping the blocks table (one row per
    # term×shard×block, ≪ postings rows) replaces a second full-postings
    # aggregate pass, and term_stats can never disagree with the blocks it
    # serves. Partitioned by term_bucket: a query's df/idf lookup prunes
    # to its terms' buckets instead of scanning every term row (at 10^12
    # docs term_stats is itself hundreds of millions of rows).
    tstats = (spark.read.parquet(paths.blocks)
              .groupBy("term", "term_bucket")
              .agg(F.sum("n").cast("long").alias("df"))
              .select("term", "df", "term_bucket"))
    tstats.write.mode("overwrite").partitionBy("term_bucket") \
        .parquet(paths.term_stats)

    elapsed = time.monotonic() - t0
    n_pages = stats.n_docs  # every non-empty page is a doc
    # n_pages_mapped counts doc_map rows, which INCLUDES zero-token pages
    # (in doc_map but never in postings) — it is the convergent staleness
    # sentinel for incremental ingest, where postings-derived n_docs is not
    _dm_row = doc_map.agg(F.count("*").alias("n"),
                          F.max("doc_id").alias("mx")).collect()[0]
    n_pages_mapped = int(_dm_row["n"])
    _dm_max = _dm_row["mx"]
    metrics = {
        "n_docs": stats.n_docs,
        "n_pages_mapped": n_pages_mapped,
        # high-water mark of doc_ids covered by the derived tables: later
        # appends carry strictly larger ids, so a delta refresh reads only
        # postings with doc_id > this (row-group stats prune base files)
        "derived_max_doc_id": -1 if _dm_max is None else int(_dm_max),
        "n_pages": n_pages,
        "avgdl": stats.avgdl,
        "total_postings": stats.total_postings,
        "n_shards": n_shards,
        "term_buckets": term_buckets,
        "block_size": BLOCK_SIZE,
        "k1": BM25_K1,
        "b": BM25_B,
        "build_sec": elapsed,
        "docs_per_sec": n_pages / elapsed if elapsed else 0.0,
        "postings_per_sec": stats.total_postings / elapsed if elapsed else 0.0,
    }
    if collect_metrics:
        p = read_postings(spark, paths.postings)
        metrics["skew_term_bucket"] = _skew_ratio(
            p.withColumn("term_bucket",
                         F.pmod(F.xxhash64("term"), F.lit(term_buckets)).cast("int")),
            "term_bucket")
        metrics["skew_shard"] = _skew_ratio(
            p.withColumn("shard",
                         F.pmod(F.xxhash64("doc_id"), F.lit(n_shards)).cast("int")),
            "shard")
    fsio.write_json(spark, paths.meta, metrics)
    return metrics


def load_meta(out_dir: str, spark: SparkSession | None = None) -> dict:
    """Read meta.json. With ``spark`` the read goes through plans.fsio
    (any Hadoop filesystem); without it only driver-local roots work."""
    if spark is not None:
        return fsio.read_json(spark, IndexPaths(out_dir).meta)
    with open(IndexPaths(out_dir).meta) as f:
        return json.load(f)
