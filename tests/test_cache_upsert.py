"""Result cache (S7), merge upsert (S4), delete (S5), meta/links UDFs."""

import pytest
from pyspark.sql import functions as F

from search_engine_tr_spark.functions.text import extract_links_udf, extract_meta_udf
from search_engine_tr_spark.operators.result_cache import ResultCache
from search_engine_tr_spark.operators.upsert import (
    delete_where,
    merge_apply,
    merge_upsert,
)
from search_engine_tr_spark.oracle.htmltext import extract_links, parse_document


def test_merge_upsert_and_apply(spark):
    t = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, name string, v double")
    u = spark.createDataFrame([(2, "B", 99.0), (4, "d", 40.0)],
                              "k long, name string, v double")
    got = {r["k"]: (r["name"], r["v"]) for r in merge_upsert(t, u, "k").collect()}
    assert got == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}

    upd = spark.createDataFrame([(2, 5.0)], "k long, delta double")
    got2 = {r["k"]: r["v"] for r in
            merge_apply(t, upd, "k", {"v": F.col("v") + F.col("delta")}).collect()}
    assert got2 == {1: 10.0, 2: 25.0, 3: 30.0}

    left = {r["k"] for r in delete_where(t, F.col("v") >= 20).collect()}
    assert left == {1}


def test_result_cache_roundtrip(spark, tiny_index, tmp_path):
    from search_engine_tr_spark.operators.query_bm25 import BM25Index

    out, _ = tiny_index
    idx = BM25Index(spark, out)
    cache = ResultCache(spark, str(tmp_path / "cache"))

    assert cache.lookup("haber") is None
    r1, hit1 = cache.cached_search(idx, "haber", k=5)
    assert not hit1
    fresh = [(r["doc_id"], r["score"]) for r in r1.collect()]

    r2, hit2 = cache.cached_search(idx, "haber", k=5)
    assert hit2
    cached = [(r["doc_id"], r["score"]) for r in r2.collect()]
    assert cached == fresh

    # normalization: raw variants of the same query share an entry
    assert cache.lookup("  HABER! ") is not None
    # other queries don't collide
    assert cache.lookup("tamamen farkli bir sey") is None

    # read-repair keeps the entry fresh after another upsert
    r3, hit3 = cache.cached_search(idx, "haber", k=5)
    assert hit3 and [(r["doc_id"], r["score"]) for r in r3.collect()] == fresh


def test_meta_and_links_udfs_match_oracle(spark, tiny_pages, tiny_pages_df):
    sample = tiny_pages[:25]
    df = tiny_pages_df.limit(25)
    meta = {r["url"]: r["m"] for r in
            df.select("url", extract_meta_udf("html").alias("m")).collect()}
    links = {r["url"]: r["l"] for r in
             df.select("url", extract_links_udf("url", "html").alias("l")).collect()}
    for p in sample:
        body = p["html"].decode("utf-8", errors="ignore")
        doc = parse_document(body)
        m = meta[p["url"]]
        exp_title = doc.title.strip() if doc.title and doc.title.strip() else None
        assert m["title"] == exp_title
        assert m["description"] == doc.description
        assert m["keywords"] == doc.keywords
        exp_links = extract_links(p["url"], body)
        got_links = [(l["type"], l["base_url"], l["href"], l["anchor_text"])
                     for l in links[p["url"]]]
        assert got_links == exp_links
