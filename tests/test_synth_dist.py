"""Distributed page synthesis must equal the sequential generator row-for-row
(per-page independent RNG contract) — the scaling/bench corpora depend on it."""

from search_engine_tr_spark.sources.synth import gen_pages, pages_df_dist


def test_pages_df_dist_matches_gen_pages(spark):
    n = 80
    expected = {p["url"]: (p["html"], p["lang"], p["warc_ts"])
                for p in gen_pages(n, seed=11)}
    got = {r["url"]: (bytes(r["html"]), r["lang"], r["warc_ts"])
           for r in pages_df_dist(spark, n, seed=11, partitions=7).collect()}
    assert set(got) == set(expected)
    for url, (html, lang, ts) in expected.items():
        g_html, g_lang, g_ts = got[url]
        assert g_html == html, url
        assert g_lang == lang and g_ts == ts
