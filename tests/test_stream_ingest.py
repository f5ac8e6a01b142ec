"""Streaming ingestion into the queryable index (stream_ingest_index):
cold-start bootstrap, exactly-once appends across drains, duplicate-url
replay safety, empty-drain no-op, and search parity with a from-scratch
build over the same unique pages."""

import os

from search_engine_tr_spark.operators.query_bm25 import BM25Index
from search_engine_tr_spark.plans.index_build import build_index
from search_engine_tr_spark.sources.synth import gen_pages, pages_schema
from search_engine_tr_spark.streaming.incremental import stream_ingest_index


def _write_wave(spark, pages, dest):
    spark.createDataFrame(pages, schema=pages_schema()) \
        .coalesce(1).write.mode("append").parquet(dest)


def _results(spark, index_dir, queries, k=50):
    idx = BM25Index(spark, index_dir)
    out = {}
    for q in queries:
        out[q] = {(r["url"], round(r["score"], 6))
                  for r in idx.search_with_urls(q, k=k).collect()}
    return out


QUERIES = ["haber", "istanbul spor", "ankara"]


def test_stream_ingest_end_to_end(spark, tmp_path):
    pages = gen_pages(60, seed=11)
    src = str(tmp_path / "pages")
    ix = str(tmp_path / "ix")
    ck = str(tmp_path / "ck")

    # drain 1 (cold start): first 40 pages bootstrap a full build
    _write_wave(spark, pages[:40], src)
    s1 = stream_ingest_index(spark, src, ix, ck, n_shards=4, term_buckets=8)
    assert s1["new_docs"] == 40
    assert len(_results(spark, ix, ["haber"])["haber"]) > 0

    # drain 2: 10 replayed urls + 20 genuinely new -> only 20 appended
    # (file-level delivery is new, row-level anti-join drops the dupes)
    _write_wave(spark, pages[30:60], src)
    s2 = stream_ingest_index(spark, src, ix, ck, n_shards=4, term_buckets=8)
    assert s2["new_docs"] == 20
    assert s2["n_docs"] == 60  # derived refresh sees the full corpus

    # drain 3: nothing new -> checkpoint yields an empty drain, no-op
    s3 = stream_ingest_index(spark, src, ix, ck, n_shards=4, term_buckets=8)
    assert s3["new_docs"] == 0 and "n_docs" not in s3

    # parity: search results equal a from-scratch build over the same 60
    # unique pages (scores depend on corpus stats, not ingestion order)
    fresh_ix = str(tmp_path / "fresh")
    fresh_pages = spark.createDataFrame(pages, schema=pages_schema())
    build_index(spark, fresh_pages, fresh_ix, n_shards=4, term_buckets=8)
    got = _results(spark, ix, QUERIES)
    want = _results(spark, fresh_ix, QUERIES)
    assert got == want
    assert any(want[q] for q in QUERIES)  # non-vacuous

    # the checkpoint really is the delivery ledger: a fresh checkpoint
    # over the same files replays them all, and the anti-join still
    # refuses every row — the two layers compose, not just coexist
    s4 = stream_ingest_index(spark, src, ix, str(tmp_path / "ck2"),
                             n_shards=4, term_buckets=8)
    assert s4["new_docs"] == 0
    assert _results(spark, ix, QUERIES) == want
    assert os.path.isdir(ck)
