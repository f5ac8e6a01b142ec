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

    # companion tables cover stream-ingested docs too (not just the
    # bootstrap corpus): snippets/meta/backlinks read these
    for table in ("pages_text", "doc_meta"):
        assert spark.read.parquet(os.path.join(ix, table)) \
            .select("url").distinct().count() == 60
    # links: a page with no anchors has no rows, so compare against the
    # from-scratch build's links table instead of all wave-2 urls
    def _link_rows(d):
        return {tuple(r) for r in spark.read.parquet(
            os.path.join(d, "links")).collect()}
    assert _link_rows(ix) == _link_rows(fresh_ix)
    wave2_urls = {p["url"] for p in pages[40:60]}
    assert wave2_urls & {s for (s, *_) in _link_rows(ix)}  # non-vacuous


def test_stream_ingest_heals_stale_derived(spark, tmp_path):
    """Crash window: a micro-batch commits (doc_map/postings appended) but
    the process dies before the derived rebuild. The NEXT drain — even one
    with no new files — must detect doc_map ≠ meta.n_docs and heal, or the
    appended docs would stay invisible to BM25 forever."""
    from search_engine_tr_spark.streaming.incremental import \
        incremental_index_update

    pages = gen_pages(70, seed=11)
    src = str(tmp_path / "pages")
    ix = str(tmp_path / "ix")
    ck = str(tmp_path / "ck")

    _write_wave(spark, pages[:60], src)
    stream_ingest_index(spark, src, ix, ck, n_shards=4, term_buckets=8)

    # simulate the crash: append directly (committed batch) w/o rebuild
    seen = {p["url"] for p in pages[:60]}
    extra = [p for p in pages[60:] if p["url"] not in seen]
    assert extra
    m = incremental_index_update(
        spark, spark.createDataFrame(extra, schema=pages_schema()), ix)
    assert m["new_docs"] > 0

    # empty drain heals: staleness check fires, derived tables catch up
    healed = stream_ingest_index(spark, src, ix, ck,
                                 n_shards=4, term_buckets=8)
    assert healed["new_docs"] == 0
    assert healed["n_docs"] == 60 + m["new_docs"]
    # and the late docs are actually searchable now
    all_urls = {u for q in QUERIES
                for (u, _) in _results(spark, ix, [q])[q]}
    fresh_ix = str(tmp_path / "fresh")
    build_index(spark,
                spark.createDataFrame(pages[:60] + extra,
                                      schema=pages_schema()),
                fresh_ix, n_shards=4, term_buckets=8)
    fresh_urls = {u for q in QUERIES
                  for (u, _) in _results(spark, fresh_ix, [q])[q]}
    assert all_urls == fresh_urls
