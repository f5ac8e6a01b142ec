"""Snippets: exact-token highlighting, window bounds + ellipses, no-match
lead fallback, end-to-end over a real index (post-limit join)."""

from pyspark.sql import functions as F

from search_engine_tr_spark.operators.snippets import (_make_snippet,
                                                       search_with_snippets,
                                                       with_snippets)


def test_make_snippet_pure():
    text = "a b c target d e f g h i j"
    s = _make_snippet(text, ["target"], window=2)
    assert s == "… b c <b>target</b> d e …"
    # match at the start: no leading ellipsis
    assert _make_snippet("target x y z", ["target"], 2) == "<b>target</b> x y …"
    # exact-token only: 'tar' must not highlight inside 'target'
    assert "<b>" not in _make_snippet("the target word", ["tar"], 3)
    # no match → document lead
    assert _make_snippet("w1 w2 w3 w4 w5 w6 w7", [], 2) == "w1 w2 w3 w4 w5"
    assert _make_snippet("", ["x"], 2) is None
    # multiple query terms both highlighted inside one window
    s2 = _make_snippet("x aa bb y", ["aa", "bb"], 1)
    assert s2 == "x <b>aa</b> <b>bb</b> …"


def test_with_snippets_join_shape(spark):
    hits = spark.createDataFrame(
        [("u1", 1, 2.0), ("u2", 2, 1.0), ("u3", 3, 0.5)],
        "url string, doc_id long, score double")
    pages_text = spark.createDataFrame(
        [("u1", "alpha beta gamma delta"), ("u2", "no match here")],
        "url string, text string")
    out = {r["url"]: r["snippet"] for r in
           with_snippets(hits, pages_text, ["gamma"], window=1).collect()}
    assert out["u1"] == "… beta <b>gamma</b> delta"
    assert out["u2"] == "no match here"   # lead fallback
    assert out["u3"] is None              # url missing from pages_text


def test_with_snippets_never_broadcasts_the_corpus(spark):
    """The pages_text side is filtered to the k hit urls BEFORE the
    broadcast (round-3 review finding: broadcasting the corpus table OOMs
    on a real index)."""
    hits = spark.createDataFrame([("u1", 1, 2.0)],
                                 "url string, doc_id long, score double")
    pages_text = spark.createDataFrame(
        [(f"u{i}", f"text {i}") for i in range(500)],
        "url string, text string")
    df = with_snippets(hits, pages_text, ["text"], window=2)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    # the text side carries an IN-filter on exactly the hit urls
    assert "u1" in optimized and ("IN (" in optimized or "In(" in optimized
                                  or "= u1" in optimized)
    out = df.collect()
    assert len(out) == 1 and "<b>text</b> 1" in out[0]["snippet"]


def test_search_with_snippets_e2e(spark, tiny_index):
    from search_engine_tr_spark.operators.query_bm25 import BM25Index

    out, _ = tiny_index
    idx = BM25Index(spark, out)
    rows = search_with_snippets(idx, "haber spor", k=5).collect()
    assert 0 < len(rows) <= 5
    # every returned hit carries a snippet highlighting a query term
    # somewhere in the result set (every doc matched ≥1 term, but a term
    # may appear only in a weighted tag — lead fallback is allowed)
    assert all(r["snippet"] for r in rows)
    assert any("<b>" in r["snippet"] for r in rows)
    # snippets never exceed the window (2*8+1 words + 2 ellipses + tags)
    for r in rows:
        assert len(r["snippet"].split(" ")) <= 8 * 2 + 3
