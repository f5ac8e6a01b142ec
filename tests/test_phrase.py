"""Phrase + conjunctive retrieval over the positional postings, verified
against a pure-Python recount from the oracle tokenizer's positions."""

from pyspark.sql import functions as F

from search_engine_tr_spark.functions.text import normalize_query
from search_engine_tr_spark.operators.phrase import (all_terms_match,
                                                     phrase_match,
                                                     phrase_search)
from search_engine_tr_spark.oracle.htmltext import tokenize


def _py_phrase_counts(pages, terms):
    """url → number of consecutive-position phrase occurrences."""
    out = {}
    for p in pages:
        html = bytes(p["html"]).decode("utf-8", errors="ignore")
        pos = {}
        for word, loc, _tag in tokenize(html):
            pos.setdefault(word, set()).add(loc)
        starts = [s for s in pos.get(terms[0], set())
                  if all(s + i in pos.get(t, set())
                         for i, t in enumerate(terms))]
        if starts:
            out[p["url"]] = len(starts)
    return out


def test_phrase_match_vs_python_oracle(spark, tiny_pages, tiny_index):
    out, _ = tiny_index
    postings = spark.read.parquet(out + "/postings")
    doc_map = spark.read.parquet(out + "/doc_map")
    for raw in ("haber spor", "ve bir", "istanbul ekonomi", "zzz qqq"):
        terms = [t for t in normalize_query(raw) if t]
        got = {r["url"]: r["n_matches"] for r in
               phrase_match(postings, terms)
               .join(doc_map, "doc_id").collect()}
        exp = _py_phrase_counts(tiny_pages, terms)
        assert got == exp, raw


def test_all_terms_match_semantics(spark, tiny_pages, tiny_index):
    out, _ = tiny_index
    postings = spark.read.parquet(out + "/postings")
    doc_map = spark.read.parquet(out + "/doc_map")
    terms = ["haber", "spor"]
    got = {r["url"] for r in all_terms_match(postings, terms)
           .join(doc_map, "doc_id").collect()}
    exp = set()
    for p in tiny_pages:
        html = bytes(p["html"]).decode("utf-8", errors="ignore")
        words = {w for w, _l, _t in tokenize(html)}
        if all(t in words for t in terms):
            exp.add(p["url"])
    assert got == exp
    # duplicate query terms collapse (['ve','ve'] == ['ve'])
    a = sorted(r["doc_id"] for r in
               all_terms_match(postings, ["ve", "ve"]).collect())
    b = sorted(r["doc_id"] for r in
               all_terms_match(postings, ["ve"]).collect())
    assert a == b


def test_phrase_search_engine_level(spark, tiny_index):
    out, _ = tiny_index
    res = phrase_search(spark, out, "haber spor", k=5).collect()
    assert all(r["url"].startswith("https://") for r in res)
    assert all(r["n_matches"] >= 1 for r in res)
    # a single-word "phrase" degrades to term lookup
    one = phrase_search(spark, out, "haber", k=3).collect()
    assert len(one) > 0
    # gibberish phrase → empty
    assert phrase_search(spark, out, "zzqqx wwyyk", k=3).count() == 0
    # degenerate query (normalizes to zero terms) → empty, not a crash —
    # same contract as the other search modes (round-3 review finding)
    assert phrase_search(spark, out, "!!! ...", k=3).count() == 0