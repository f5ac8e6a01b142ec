"""Multi-seed engine parity sweep — slow, env-gated (SETR_FUZZ=1).

Fresh synthetic corpora per seed: (1) built-index postings must be
tf-identical to the pure-Python oracle's index_rows, (2) block-max WAND
must equal exhaustive scoring on every reference query. Run in round 3
over seeds (11, 23, 37, 58, 71) / ~60k postings: zero failures.
"""

import os
import shutil

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("SETR_FUZZ"),
    reason="slow multi-seed sweep; set SETR_FUZZ=1")


@pytest.mark.parametrize("seed", [11, 23, 37, 58, 71])
def test_fresh_corpus_parity(spark, tmp_path, seed):
    from search_engine_tr_spark.operators.query_bm25 import BM25Index
    from search_engine_tr_spark.oracle.htmltext import index_rows
    from search_engine_tr_spark.plans.index_build import build_index
    from search_engine_tr_spark.sources.synth import (gen_pages, pages_df,
                                                      reference_queries)

    out = str(tmp_path / f"ix_{seed}")
    shutil.rmtree(out, ignore_errors=True)
    build_index(spark, pages_df(spark, 120, seed=seed), out, n_shards=4,
                term_buckets=8, collect_metrics=False, write_text=False,
                write_meta=False, write_links=False)

    py_tf = {}
    for p in gen_pages(120, seed=seed):
        html = bytes(p["html"]).decode("utf-8", errors="ignore")
        for url, word, freq, _loc, _tag in index_rows(p["url"], html):
            py_tf[(url, word)] = freq
    sp = (spark.read.parquet(out + "/postings")
          .join(spark.read.parquet(out + "/doc_map"), "doc_id").collect())
    assert {(r["url"], r["term"]): r["tf"] for r in sp} == py_tf

    idx = BM25Index(spark, out)
    for q in reference_queries():
        w = [(r["doc_id"], round(r["score"], 10))
             for r in idx.search(q, k=10, mode="wand").collect()]
        e = [(r["doc_id"], round(r["score"], 10))
             for r in idx.search(q, k=10, mode="exhaustive").collect()]
        assert w == e, (seed, q)


@pytest.mark.parametrize("seed,cut", [(13, 10), (29, 25), (47, 39)])
def test_stream_ingest_split_invariance(spark, tmp_path, seed, cut):
    """Ingest invariant under arbitrary wave splits: streaming a corpus in
    as (bootstrap wave, append wave) — any cut point — must yield the same
    BM25 results as one from-scratch build. Catches order-dependent doc-id
    or corpus-stat bugs the fixed-split test can't."""
    from search_engine_tr_spark.operators.query_bm25 import BM25Index
    from search_engine_tr_spark.plans.index_build import build_index
    from search_engine_tr_spark.sources.synth import (gen_pages,
                                                      pages_schema,
                                                      reference_queries)
    from search_engine_tr_spark.streaming.incremental import \
        stream_ingest_index

    pages = gen_pages(50, seed=seed)
    src = str(tmp_path / "src")
    ix, ck = str(tmp_path / "ix"), str(tmp_path / "ck")

    def _wave(rows):
        spark.createDataFrame(rows, schema=pages_schema()) \
            .coalesce(1).write.mode("append").parquet(src)

    _wave(pages[:cut])
    stream_ingest_index(spark, src, ix, ck, n_shards=4, term_buckets=8)
    _wave(pages[cut:])
    stream_ingest_index(spark, src, ix, ck, n_shards=4, term_buckets=8)

    fresh = str(tmp_path / "fresh")
    build_index(spark, spark.createDataFrame(pages, schema=pages_schema()),
                fresh, n_shards=4, term_buckets=8, collect_metrics=False)

    got_idx, want_idx = BM25Index(spark, ix), BM25Index(spark, fresh)
    checked = 0
    for q in reference_queries()[:8]:
        got = {(r["url"], round(r["score"], 6))
               for r in got_idx.search_with_urls(q, k=50).collect()}
        want = {(r["url"], round(r["score"], 6))
                for r in want_idx.search_with_urls(q, k=50).collect()}
        assert got == want
        checked += len(want)
    assert checked > 0  # non-vacuous: at least one query matched docs
