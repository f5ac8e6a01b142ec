"""Rank-identical parity: distributed reference ranker vs the scalar oracle
over the reference query set (SURVEY.md §5.3), incl. domain authority."""

import pytest
from pyspark.sql import functions as F

from search_engine_tr_spark.operators.pagerank import indegree_authority
from search_engine_tr_spark.operators.refrank import page_seq_map, reference_rank
from search_engine_tr_spark.oracle.htmltext import base_url, extract_links
from search_engine_tr_spark.oracle.refscore import reference_search
from search_engine_tr_spark.sources.synth import (
    gen_links,
    links_df,
    reference_queries,
)


@pytest.fixture(scope="module")
def parity_setup(spark, tiny_pages, tiny_pages_df, tiny_index, oracle_index):
    out, _ = tiny_index
    postings = spark.read.parquet(out + "/postings").cache()
    doc_map = spark.read.parquet(out + "/doc_map")
    doc_meta = doc_map.join(page_seq_map(tiny_pages_df), "url").cache()
    doc_meta.count()

    from search_engine_tr_spark.functions.urlfns import base_url_col

    links = links_df(spark, tiny_pages)
    # domains universe = base urls of all fixture pages (the "IP table")
    domains = (tiny_pages_df
               .select(base_url_col(F.col("url")).alias("domain")).distinct())
    dscores = indegree_authority(links, domains).cache()
    dscores_map = {r["domain"]: r["score"] for r in dscores.collect()}
    return postings, doc_meta, dscores, dscores_map


def test_indegree_authority_matches_pure_python(spark, tiny_pages, parity_setup):
    _, _, dscores, dscores_map = parity_setup
    # pure-python recount following backlink_analyser.py:40-57
    counts: dict[str, float] = {}
    domains = {base_url(p["url"]) for p in tiny_pages}
    for e in gen_links(tiny_pages):
        s, t = e["source_url"], e["target_url"]
        if base_url(s) == base_url(t):
            continue
        hs = base_url(s).split("//")[1].split(".")
        ht = base_url(t).split("//")[1].split(".")
        if hs[-2:] == ht[-2:]:
            continue
        if base_url(t) not in domains:
            continue
        counts[base_url(t)] = counts.get(base_url(t), 0) + 1
    expected = {d: counts.get(d, 0.0) for d in domains}
    assert dscores_map == expected


@pytest.mark.parametrize("qi", range(10))
def test_reference_rank_identical_to_oracle(spark, oracle_index, parity_setup, qi):
    postings, doc_meta, dscores, dscores_map = parity_setup
    q = reference_queries()[qi]
    expected, count = reference_search(oracle_index, q,
                                       domain_scores=dscores_map, top=10)
    got = reference_rank(postings, doc_meta, q,
                         domain_scores=dscores, k=10).collect()
    assert [r["url"] for r in got] == [d.url for d in expected], q
    if got:
        assert got[0]["pinned"] and expected[0].pinned
    for r, d in zip(got, expected):
        assert r["score"] == pytest.approx(d.score, rel=1e-9, abs=1e-9), (q, r["url"])
