"""Deterministic synthetic Common-Crawl-style Turkish pages fixture.

Shape follows BASELINE.json ``input_hint``:
``(url:string, warc_ts:timestamp, html:binary, text:string(NULL), lang:string)``.

Coverage requirements from FIXTURES.md §1:
- tags title/h1/h2/h3/p/a/span incl. NESTED a/span inside p (double-count path)
- <script>/<style>/comments (stripped on extraction path only)
- Turkish İ ı ğ ş ç ö ü both cases (İ-lowercasing bug; fold asymmetry Q1)
- punctuation, multi-whitespace, digits, ≥1 document >100k extracted chars
- Zipfian vocabulary with hot head terms in >50% of docs (skew/salting tests)
- repeated words within and across tags (tf>1, multiple positions/tags)
- ~1 domain per 20 pages; some ç/ö/ü/digit-leading hosts ("default" partition)
- a few ISO-8859-9-encoded bodies (decode errors="ignore" path)
- mostly lang=tr, some lang=en

Everything is seeded ``random.Random`` — no wall clock, no global RNG.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

_EPOCH = datetime(2024, 1, 1, 0, 0, 0)

# Hot head terms (injected into >50% of docs) + common Turkish words.
HEAD_TERMS = ["ve", "bir", "bu", "için", "ile", "daha", "çok", "haber", "son", "yeni"]

_BASE_WORDS = [
    "istanbul", "ankara", "izmir", "türkiye", "dünya", "spor", "ekonomi",
    "teknoloji", "sağlık", "eğitim", "kültür", "sanat", "müzik", "sinema",
    "kitap", "yazar", "şehir", "kapı", "pencere", "deniz", "dağ", "orman",
    "çocuk", "okul", "üniversite", "öğrenci", "öğretmen", "çalışma", "işçi",
    "güzel", "büyük", "küçük", "uzun", "kısa", "hızlı", "yavaş", "sıcak",
    "soğuk", "gazete", "televizyon", "internet", "bilgisayar", "telefon",
    "araba", "otobüs", "uçak", "tren", "yol", "köprü", "bina", "market",
    "yemek", "kahvaltı", "çay", "kahve", "şeker", "tuz", "ekmek", "peynir",
    "futbol", "basketbol", "voleybol", "maç", "takım", "oyuncu", "gol",
    "hükümet", "meclis", "seçim", "parti", "belediye", "başkan", "bakan",
]

_SYLLABLES = ["ka", "le", "mi", "no", "tu", "sa", "de", "gö", "rü", "ba",
              "ci", "da", "el", "fi", "gu", "ha", "ki", "lo", "mu", "ne",
              "şa", "çe", "ğa", "ır", "po", "ra", "si", "ta", "ul", "ve",
              "ya", "zi", "ot", "ek", "in", "ur", "as", "et", "ol", "um"]

_EN_WORDS = ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
             "news", "sports", "world", "economy", "technology", "health",
             "music", "cinema", "book", "writer", "city", "sea", "mountain"]

_TLDS = [".com.tr", ".com", ".net", ".org.tr", ".gen.tr"]

_PUNCT = [",", ".", "!", "?", ";", ":", "'", '"', "(", ")", "-"]


def build_vocab(size: int = 5000, seed: int = 42) -> list[str]:
    rng = random.Random(seed * 7919 + 13)
    vocab = list(HEAD_TERMS) + list(_BASE_WORDS)
    seen = set(vocab)
    while len(vocab) < size:
        w = "".join(rng.choices(_SYLLABLES, k=rng.randint(2, 4)))
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    return vocab


def _zipf_weights(n: int, s: float = 1.07) -> list[float]:
    return [1.0 / (i + 1) ** s for i in range(n)]


def _domains(n_pages: int, rng: random.Random, vocab: list[str]) -> list[str]:
    n = max(3, n_pages // 20)
    out = []
    for i in range(n):
        stem = vocab[rng.randrange(len(_BASE_WORDS))].replace("ı", "i")
        if i % 11 == 7:  # ç/ö/ü/digit-leading hosts → reference "default" partition
            stem = rng.choice(["çiçek", "örnek", "üçgen", "7renk"]) + str(i)
        out.append(f"{stem}{i}{rng.choice(_TLDS)}")
    return out


def _sentence(rng: random.Random, vocab: list[str], weights: list[float],
              n_words: int) -> str:
    words = rng.choices(vocab, weights=weights, k=n_words)
    parts = []
    for w in words:
        if rng.random() < 0.02:
            # explicit dotted-capital-İ tokens (Python's ASCII upper() never
            # produces İ) — exercises the İ-lowercasing bug (crawler.py:132)
            w = rng.choice(["İzmir", "İstanbul", "İNDİRİM", "İyi"])
        elif rng.random() < 0.10:
            w = w.upper() if rng.random() < 0.4 else w.capitalize()
        if rng.random() < 0.12:
            w += rng.choice(_PUNCT)
        parts.append(w)
        if rng.random() < 0.05:
            parts.append(str(rng.randint(0, 2024)))
    sep = "  " if rng.random() < 0.05 else " "
    return sep.join(parts)


def _page_html(rng: random.Random, vocab: list[str], weights: list[float],
               domains: list[str], domain: str, big: bool) -> str:
    title = _sentence(rng, vocab, weights, rng.randint(2, 5))
    h1 = _sentence(rng, vocab, weights, rng.randint(3, 7))
    head_inject = " ".join(
        rng.choices(HEAD_TERMS, k=rng.randint(1, 4))) if rng.random() < 0.6 else ""
    paras = []
    n_paras = rng.randint(2, 6) if not big else 900
    for _ in range(n_paras):
        body = _sentence(rng, vocab, weights, rng.randint(8, 30))
        inner = ""
        if rng.random() < 0.7:  # nested <a> (double-count path)
            target_dom = rng.choice(domains)
            href = (f"https://{target_dom}/sayfa-{rng.randint(0, 99)}"
                    if rng.random() < 0.8 else f"/ic-{rng.randint(0, 99)}")
            anchor = _sentence(rng, vocab, weights, rng.randint(1, 3))
            inner += f' <a href="{href}">{anchor}</a>'
        if rng.random() < 0.5:  # nested <span>
            inner += f" <span>{_sentence(rng, vocab, weights, rng.randint(2, 5))}</span>"
        paras.append(f"<p>{body}{inner} {head_inject}</p>")
    h2 = f"<h2>{_sentence(rng, vocab, weights, rng.randint(2, 6))}</h2>" if rng.random() < 0.7 else ""
    h3 = f"<h3>{_sentence(rng, vocab, weights, rng.randint(2, 6))}</h3>" if rng.random() < 0.5 else ""
    comment = "<!-- gizli yorum kelimeleri -->" if rng.random() < 0.5 else ""
    script = "<script>var x = 1; /* kod */</script>" if rng.random() < 0.6 else ""
    style = "<style>.cls { color: red; }</style>" if rng.random() < 0.4 else ""
    desc = _sentence(rng, vocab, weights, rng.randint(4, 10))
    kw = ", ".join(rng.choices(vocab, weights=weights, k=3))
    return (
        "<!DOCTYPE html>\n<html><head>"
        f"<title>{title}</title>"
        f'<meta name="description" content="{desc}">'
        f'<meta name="keywords" content="{kw}">'
        f"{script}{style}</head><body>{comment}"
        f"<h1>{h1}</h1>{h2}{h3}"
        + "".join(paras)
        + "</body></html>"
    )


class _GenCtx:
    """Shared deterministic generation context (vocab/weights/domains).

    Page i is generated from its own ``Random((seed << 32) ^ i)`` so
    generation is per-page independent → distributable with mapInPandas
    (no sequential RNG state)."""

    def __init__(self, n: int, seed: int):
        self.n = n
        self.seed = seed
        self.vocab = build_vocab(seed=seed)
        self.weights = _zipf_weights(len(self.vocab))
        self.domains = _domains(n, random.Random(seed), self.vocab)


def gen_page(i: int, ctx: _GenCtx) -> dict:
    rng = random.Random((ctx.seed << 32) ^ i)
    domain = ctx.domains[i % len(ctx.domains)]
    url = f"https://{domain}/sayfa-{i}"
    big = i == 17 and ctx.n > 20  # one >100k-char doc (truncation path)
    lang = "en" if rng.random() < 0.08 else "tr"
    html = _page_html(rng, ctx.vocab, ctx.weights, ctx.domains, domain, big)
    if lang == "en":
        html = html.replace("<h1>", f"<h1>{' '.join(rng.choices(_EN_WORDS, k=6))} ")
    if i % 47 == 13:  # ISO-8859-9 body → utf-8 errors="ignore" decode path
        body = html.encode("iso-8859-9", errors="replace")
    else:
        body = html.encode("utf-8")
    return {
        "url": url,
        "warc_ts": _EPOCH + timedelta(minutes=i),
        "html": body,
        "text": None,
        "lang": lang,
    }


def gen_pages(n: int, seed: int = 42) -> list[dict]:
    """Deterministic pages rows: url, warc_ts, html(bytes), text(None), lang."""
    ctx = _GenCtx(n, seed)
    return [gen_page(i, ctx) for i in range(n)]


def gen_links(pages: list[dict]) -> list[dict]:
    """Edges derived from each page's <a href> (oracle link semantics).

    target_url: absolute href as-is; root-relative resolved against the page's
    base URL; INVALID links dropped (crawler.py:43-66 classification).
    """
    from ..oracle.htmltext import base_url, extract_links

    out = []
    for p in pages:
        content = p["html"].decode("utf-8", errors="ignore")
        for ltype, base, href, anchor in extract_links(p["url"], content):
            if ltype == "INVALID":
                continue
            target = href if href.startswith("http") else base_url(p["url"]) + href
            out.append({"source_url": p["url"], "target_url": target,
                        "anchor_text": anchor})
    return out


def reference_queries() -> list[str]:
    """Reference Turkish query set (FIXTURES.md §5 coverage requirements)."""
    return [
        "haber",                      # single hot term
        "istanbul spor ekonomi",      # multi-term OR
        "kapı",                       # ı → query folds to "kapi" (Q1 miss path)
        "İZMİR",                      # İ-lowercasing bug → "i zmi r"
        "çocuk",                      # ç term → reference "default" partition
        "ve bir bu",                  # hot head terms, many ties
        "ve ve",                      # duplicate query word double-count
        "deniz dağ orman yemek",      # mixed-frequency multi-term
        "zzzzz qqqqq",                # no results
        "Güzel, yeni!",               # punctuation + case on the query path
    ]


# ---------------------------------------------------------------------------
# Spark constructors (imported lazily so oracle tests don't need pyspark)
# ---------------------------------------------------------------------------

def pages_schema():
    from pyspark.sql import types as T

    return T.StructType([
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ])


def pages_df(spark, n: int, seed: int = 42):
    return spark.createDataFrame(gen_pages(n, seed), schema=pages_schema())


def links_df(spark, pages: list[dict]):
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("source_url", T.StringType(), False),
        T.StructField("target_url", T.StringType(), False),
        T.StructField("anchor_text", T.StringType(), True),
    ])
    return spark.createDataFrame(gen_links(pages), schema=schema)


def pages_df_dist(spark, n: int, seed: int = 42, partitions: int | None = None):
    """Distributed page synthesis: spark.range(n) → mapInPandas(gen_page).
    Same rows as gen_pages(n, seed) (per-page independent RNG); scales to
    millions of pages without driver memory."""
    import pandas as pd

    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        ctx = _GenCtx(n, seed)
        for pdf in batches:
            rows = [gen_page(int(i), ctx) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html",
                                              "text", "lang"])

    return (spark.range(n).repartition(parts)
            .mapInPandas(gen, schema=pages_schema()))


def write_pages_parquet(spark, path: str, n: int, seed: int = 42,
                        partitions: int | None = None) -> None:
    df = pages_df_dist(spark, n, seed, partitions)
    df.write.mode("overwrite").parquet(path)
