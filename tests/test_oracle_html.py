"""Oracle HTML/text semantics tests (no Spark).

These pin the parity spec: reference crawler.py:113-168 (extraction) and
:217-245 (tokenizer), including the documented quirks (SURVEY.md §8).
"""

import string

from search_engine_tr_spark.oracle import (
    base_url,
    extract_text,
    index_rows,
    link_type,
    parse_document,
    partition_key,
    tokenize,
)
from search_engine_tr_spark.oracle.htmltext import extract_links


def test_izmir_lowercase_bug():
    # İ → i + U+0307; U+0307 is not \w so it becomes a space on the
    # extraction path — verified against the reference's regex pipeline.
    assert extract_text("<p>İZMİR</p>") == "i zmi r"
    # index tokenizer REMOVES non-word chars instead → "izmir" (Q1 asymmetry)
    assert tokenize("<p>İZMİR</p>") == [("izmir", 0, "p")]


def test_turkish_fold_query_side_only():
    assert extract_text("<p>kapı değil</p>") == "kapi degil"
    assert [w for w, _, _ in tokenize("<p>kapı değil</p>")] == ["kapı", "değil"]


def test_script_style_comment_excluded():
    html = ("<html><head><script>var x=1;</script><style>.a{}</style></head>"
            "<body><!-- yorum --><p>merhaba dünya</p></body></html>")
    assert extract_text(html) == "merhaba dünya"
    assert [w for w, _, _ in tokenize(html)] == ["merhaba", "dünya"]


def test_comment_splits_text_nodes_on_extraction_only():
    # bs4 text-node granularity: "hel<!--x-->lo" → two strings.
    # extraction joins with ' '; tokenizer joins with '' (get_text defaults).
    html = "<p>hel<!--x-->lo</p>"
    assert extract_text(html) == "hel lo"
    assert tokenize(html) == [("hello", 0, "p")]


def test_nested_tags_double_count_with_global_positions():
    html = "<p>bir <a>iki üç</a> dört</p>"
    occ = tokenize(html)
    # p.get_text() = "bir iki üç dört" then the nested <a> re-emits its words
    assert occ == [
        ("bir", 0, "p"), ("iki", 1, "p"), ("üç", 2, "p"), ("dört", 3, "p"),
        ("iki", 4, "a"), ("üç", 5, "a"),
    ]


def test_position_counter_skips_dropped_words():
    occ = tokenize("<p>a !!! b</p>")  # "!!!" cleans to empty → no index slot
    assert occ == [("a", 0, "p"), ("b", 1, "p")]


def test_punctuation_and_whitespace():
    assert extract_text("<p>Merhaba,   dünya! (test)</p>") == "merhaba dünya test"


def test_truncation_then_fold():
    # fold happens AFTER the 100k truncation (crawler.py:150-163)
    body = "ı" * 150_000
    out = extract_text(f"<p>{body}</p>")
    assert len(out) == 100_000 and set(out) == {"i"}


def test_index_rows_order_and_tf():
    html = "<h1>elma armut</h1><p>elma</p>"
    rows = index_rows("https://x.com/a", html)
    # word first-occurrence order: elma(tf=2: pos0 h1, pos2 p), armut(tf=1)
    assert rows == [
        ("https://x.com/a", "elma", 2, 0, "h1"),
        ("https://x.com/a", "elma", 2, 2, "p"),
        ("https://x.com/a", "armut", 1, 1, "h1"),
    ]


def test_partition_key():
    assert partition_key("elma") == "e"
    assert partition_key("çocuk") == "default"
    assert partition_key("7up") == "default"
    for c in string.ascii_lowercase:
        assert partition_key(c + "x") == c


def test_base_url_and_link_type():
    assert base_url("https://example.com.tr/a/b?c=1") == "https://example.com.tr"
    page = "https://a.com/x"
    assert link_type(page, "https://a.com/y") == "INTERNAL"
    assert link_type(page, "/rel") == "INTERNAL"
    assert link_type(page, "https://b.com/z") == "EXTERNAL"
    assert link_type(page, "https://b.com/f.pdf") == "INVALID"
    assert link_type(page, "mailto:x@y.com") == "INVALID"
    assert link_type(page, "None") == "INVALID"


def test_extract_links_none_href_quirk():
    html = '<p><a>no href</a> <a href="https://b.com/z">dış</a></p>'
    links = extract_links("https://a.com/x", html)
    assert links[0] == ("INVALID", "https://a.com", "None", "no href")
    assert links[1] == ("EXTERNAL", "https://a.com", "https://b.com/z", "dış")


def test_link_anchor_is_direct_text_only():
    # lxml `.text` semantics: text before the first child element
    html = '<a href="/x">önce<b>sonra</b></a>'
    links = extract_links("https://a.com/", html)
    assert links[0][3] == "önce"
    html2 = '<a href="/x"><b>hemen</b>metin</a>'
    assert extract_links("https://a.com/", html2)[0][3] is None


def test_meta_and_title():
    html = ('<html><head><title> Başlık </title>'
            '<meta name="description" content=" açıklama ">'
            '<meta name="keywords" content="bir, iki , üç"></head>'
            "<body><p>x</p></body></html>")
    doc = parse_document(html)
    assert doc.title == " Başlık "  # lxml .text is raw; reference strips later
    assert doc.description == "açıklama"
    assert doc.keywords == "bir,iki,üç"


def test_empty_and_malformed():
    assert extract_text("") == ""
    assert tokenize("") == []
    assert tokenize("düz metin, etiketsiz") == []  # no TAG_WEIGHTS tag → no words
    assert extract_text("düz metin, etiketsiz") == "düz metin etiketsiz"
    # unclosed tag: implicit close at EOF must not crash
    assert tokenize("<p>açık kalan") == [("açık", 0, "p"), ("kalan", 1, "p")]
