"""The sorted-merge block path (repartition + sortWithinPartitions +
streaming packer) must produce BIT-IDENTICAL blocks to the group packer,
and an index built with it must answer queries identically."""

from pyspark.sql import functions as F

from search_engine_tr_spark.operators.query_bm25 import BM25Index
from search_engine_tr_spark.plans.index_build import (build_blocks,
                                                      build_blocks_sorted,
                                                      build_index)
from search_engine_tr_spark.plans.stats import corpus_stats, doc_lengths
from search_engine_tr_spark.sources.synth import reference_queries


def _key_blocks(rows):
    return {(r["term"], r["shard"], r["block_no"]):
            (r["term_bucket"], r["n"], r["max_doc_id"], r["max_tfnorm"],
             bytes(r["block"])) for r in rows}


def test_sorted_packer_bit_identical(spark, tiny_index):
    out, _ = tiny_index
    postings = spark.read.parquet(out + "/postings")
    doclens = doc_lengths(postings).cache()
    stats = corpus_stats(doclens)
    grouped = _key_blocks(build_blocks(
        postings, doclens, stats.avgdl, 4, 8).collect())
    streamed = _key_blocks(build_blocks_sorted(
        postings, doclens, stats.avgdl, 4, 8).collect())
    doclens.unpersist()
    assert grouped == streamed
    assert len(grouped) > 0


def test_sorted_packer_small_arrow_batches(spark, tiny_index):
    """Force term runs to straddle Arrow batch boundaries: tiny
    maxRecordsPerBatch exercises the carry logic."""
    out, _ = tiny_index
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        postings = spark.read.parquet(out + "/postings")
        doclens = doc_lengths(postings).cache()
        stats = corpus_stats(doclens)
        grouped = _key_blocks(build_blocks(
            postings, doclens, stats.avgdl, 2, 4).collect())
        streamed = _key_blocks(build_blocks_sorted(
            postings, doclens, stats.avgdl, 2, 4).collect())
        doclens.unpersist()
        assert grouped == streamed
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_index_built_with_sorted_packer_queries_identically(
        spark, tiny_pages_df, tmp_path, tiny_index):
    out_sorted = str(tmp_path / "ix_sorted")
    build_index(spark, tiny_pages_df, out_sorted, n_shards=4, term_buckets=8,
                collect_metrics=False, write_text=False, write_meta=False,
                write_links=False, packer="sorted")
    base, _ = tiny_index
    a = BM25Index(spark, base)
    b = BM25Index(spark, out_sorted)
    for q in reference_queries()[:5]:
        ra = [(r["doc_id"], r["score"]) for r in a.search(q, k=10).collect()]
        rb = [(r["doc_id"], r["score"]) for r in b.search(q, k=10).collect()]
        assert ra == rb, q
