"""Reference scoring-pipeline oracle tests (no Spark)."""

import math

from search_engine_tr_spark.oracle import (
    clip_scores,
    exp_transform,
    log_transform,
    min_max,
    preprocess_words,
    reference_search,
    robust_scale,
    z_score,
    bm25_search,
)
from search_engine_tr_spark.oracle.refscore import OracleIndex, bm25_idf, bm25_term


def test_normalizers_match_reference_formulas():
    scores = [10.0, 20.0, 30.0, 40.0, 1000.0]
    assert min_max(scores)[0] == 0.0 and min_max(scores)[-1] == 1.0
    z = z_score(scores)
    mean = sum(scores) / 5
    std = (sum((s - mean) ** 2 for s in scores) / 5) ** 0.5  # population σ
    assert abs(z[0] - (10 - mean) / std) < 1e-12
    assert log_transform([0.0]) == [0.0]
    # index-based quartiles: sorted[n//4], sorted[n//2], sorted[3n//4]
    rs = robust_scale(scores)
    assert rs[2] == 0.0  # median element
    assert rs[0] == (10 - 30) / (40 - 20)
    assert clip_scores(scores, 0, 50)[-1] == 50
    assert abs(exp_transform([1.0])[0] - (1 - math.exp(-1))) < 1e-12
    assert min_max([5.0, 5.0]) == [1.0, 1.0]
    assert z_score([5.0, 5.0]) == [0.0, 0.0]
    assert robust_scale([5.0, 5.0]) == [0.0, 0.0]


def test_preprocess_words_drops_non_alnum_keeps_dups():
    assert preprocess_words(["Ve", "ve", "a_b", "", "iki2"]) == ["ve", "ve", "iki2"]


def _index(pages):
    idx = OracleIndex()
    for url, html in pages:
        idx.add_page(url, html)
    return idx


def test_reference_search_pins_argmax_and_orders():
    pages = [
        ("https://a.com/1", "<p>elma elma elma armut</p>"),
        ("https://b.com/2", "<h1>elma armut</h1><p>armut armut</p>"),
        ("https://c.com/3", "<p>armut</p>"),
    ]
    idx = _index(pages)
    ranked, count = reference_search(idx, "elma armut")
    assert count == 3
    # doc1 has tf(elma)=3 — the max by FIRST query word's tf → pinned at rank 0
    assert ranked[0].url == "https://a.com/1" and ranked[0].pinned
    # pinned keeps its raw candidate-relative TF-IDF score
    # N=3, df(elma)=2, df(armut)=3 → 3*log10(3/2) + 1*log10(3/3)
    assert abs(ranked[0].score - 3 * math.log10(3 / 2)) < 1e-12
    assert {d.url for d in ranked} == {p[0] for p in pages}


def test_reference_search_empty_and_fold_miss():
    idx = _index([("https://a.com/1", "<p>kapı</p>")])
    # query 'kapı' folds to 'kapi' on the query path; index has 'kapı' → miss
    ranked, count = reference_search(idx, "kapı")
    assert ranked == [] and count == 0


def test_reference_search_duplicate_query_words_double_count():
    pages = [("https://a.com/1", "<p>ve bir</p>"), ("https://b.com/2", "<p>ve iki</p>")]
    idx = _index(pages)
    ranked, count = reference_search(idx, "ve ve")
    assert count == 2
    # df double-counts twice over: 2 dup query words × 2 docs × 2 matching
    # wfs per doc = 8 over N=2 → per-word score 1*log10(2/8), added twice
    assert abs(ranked[0].score - 2 * math.log10(2 / 8)) < 1e-12


def test_reference_search_domain_authority_affects_rank():
    pages = [
        ("https://a.com/1", "<p>elma elma elma</p>"),  # pinned (tf max)
        ("https://b.com/2", "<p>elma kek</p>"),
        ("https://c.com/3", "<p>elma kek</p>"),
        ("https://d.com/4", "<p>elma kek</p>"),
    ]
    idx = _index(pages)
    lo, _ = reference_search(idx, "elma", domain_scores={"https://d.com": 0.0})
    hi, _ = reference_search(idx, "elma", domain_scores={"https://d.com": 50.0})
    assert [d.url for d in lo][0] == "https://a.com/1"
    # with authority boost, d.com must rank first among the re-ranked docs
    assert [d.url for d in hi][1] == "https://d.com/4"


def test_bm25_oracle_basic():
    corpus = {
        1: ["elma", "armut", "elma"],
        2: ["armut", "kiraz"],
        3: ["elma"],
    }
    top = bm25_search(corpus, "elma")
    assert [d for d, _ in top] == [3, 1]  # doc3 shorter → higher tf-norm
    n, df = 3, 2
    idf = bm25_idf(n, df)
    avgdl = 6 / 3
    exp3 = bm25_term(1, 1, avgdl, idf)
    assert abs(top[0][1] - exp3) < 1e-12
    assert bm25_search(corpus, "yok") == []
    assert bm25_search({}, "elma") == []


def test_bm25_tie_break_by_doc_id():
    corpus = {5: ["a", "b"], 2: ["a", "b"], 9: ["a", "b"]}
    top = bm25_search(corpus, "a b")
    assert [d for d, _ in top] == [2, 5, 9]
