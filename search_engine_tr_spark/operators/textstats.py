"""Text analysis for training-data pipelines — all native column math
(no UDFs): language-ID heuristic, quality scoring, token counting,
rolling-hash document fingerprinting.

Every function is also expressible in ANSI SQL (DuckDB oracles in
__spark_entry__.py), so these operators sit in the driver's correctness
gate.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import ensure_scan_parallelism as _widen

# high-frequency function words (public knowledge)
TR_STOPWORDS = [
    "ve", "bir", "bu", "da", "de", "için", "ile", "çok", "daha", "gibi",
    "en", "kadar", "sonra", "her", "ama", "ne", "o", "ben", "sen", "biz",
]
EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "at", "by", "it", "this", "that",
]


def words_col(text: Column) -> Column:
    """Whitespace tokens of lowercased text (empty strings removed)."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda w: w != "")


def token_count(df: DataFrame, text_col: str = "text",
                out: str = "n_tokens") -> DataFrame:
    return _widen(df).withColumn(out, F.size(words_col(F.col(text_col))))


def bpe_ish_token_count(df: DataFrame, text_col: str = "text",
                        out: str = "n_subtokens") -> DataFrame:
    """Sub-word-ish count: ceil(len(word)/4) summed over whitespace words —
    a deterministic proxy for BPE token counts (no tokenizer dep).
    Punctuation attached to a word counts toward that word's length; there
    is no separate punctuation term."""
    words = words_col(F.col(text_col))
    per_word = F.aggregate(
        words, F.lit(0),
        lambda acc, w: acc + F.ceil(F.length(w) / F.lit(4.0)).cast("int"))
    return _widen(df).withColumn(out, per_word)


def _ratio_in(words: Column, vocab: list[str]) -> Column:
    hits = F.size(F.filter(words, lambda w: w.isin(vocab)))
    return F.when(F.size(words) > 0, hits / F.size(words)).otherwise(F.lit(0.0))


def _fresh(df: DataFrame, base: str) -> str:
    """A staging-column name guaranteed absent from df — so the staged
    projections can never clobber (and then drop) a caller's column."""
    name = base
    while name in df.columns:
        name += "_"
    return name


def lang_id(df: DataFrame, text_col: str = "text",
            out: str = "lang_pred") -> DataFrame:
    """Stopword-ratio language ID: 'tr' / 'en' / 'unknown'.

    The words array is materialized once in its own projection so the split
    runs once per row, not once per ratio expression (Spark does no CSE
    inside/around higher-order-function lambdas; CollapseProject keeps a
    non-cheap multiply-referenced alias in its own project)."""
    wname = _fresh(df, "_li_w")
    staged = _widen(df).withColumn(wname, words_col(F.col(text_col)))
    w = F.col(wname)
    tr = _ratio_in(w, TR_STOPWORDS)
    en = _ratio_in(w, EN_STOPWORDS)
    return staged.withColumn(
        out,
        F.when((tr > en) & (tr > 0.02), F.lit("tr"))
         .when((en > tr) & (en > 0.02), F.lit("en"))
         .otherwise(F.lit("unknown"))).drop(wname)


# high-frequency character trigrams (public knowledge: frequency tables of
# common Turkish / English text)
TR_TRIGRAMS = [
    "lar", "ler", "bir", " bi", "in ", "ın ", "en ", "an ", "eri", "ve ",
    " ve", "ara", "ını", "arı", "nda", "ile", " ka", "da ", "de ", "iği",
]
EN_TRIGRAMS = [
    "the", " th", "he ", "ing", "ng ", "and", " an", "nd ", "ion", " of",
    "of ", "ed ", "to ", " to", "er ", " in", "is ", "on ", "ent", "at ",
]


def char_trigrams(text: Column) -> Column:
    """Character 3-grams of whitespace-normalized lowercased text.

    NOTE: pass an *attribute* (a materialized column), not a compound
    expression — the substr lambda references ``text`` once per array
    element and Spark does no CSE inside HOF lambdas, so a compound input
    is re-evaluated O(len) times per row (the round-2 scale-killer:
    78.9 s vs 1.4 s on the same 5k-doc table). ``lang_id_ngram`` below
    stages the normalization in its own projection for exactly this
    reason."""
    n = F.length(text)
    return F.when(n >= 3, F.transform(
        F.sequence(F.lit(1), n - 2),
        lambda i: text.substr(i, F.lit(3)))) \
        .otherwise(F.expr("CAST(array() AS array<string>)"))


# ---------------------------------------------------------------------------
# vectorized trigram kernel (optimization round 6, guide §4.2)
#
# The round-5 shape materialized every document's trigram array as JVM
# strings (one substr per position) and, for entropy, exploded ~n rows per
# doc through a hash-aggregate shuffle. Both consumers below now hand the
# JVM-normalized string to ONE mapInPandas pass that packs each trigram's
# three codepoints into a single uint64 (21 bits/codepoint — Unicode max
# is 0x10FFFF) and counts with numpy over the whole Arrow batch: no
# per-trigram string objects, no shuffle. Normalization (lower +
# \s+ collapse) STAYS in the JVM so regex/locale semantics are unchanged.
# ---------------------------------------------------------------------------

def _pack_trigrams_batch(texts: list):
    """Normalized strings → (codes: uint64 packed trigrams, doc_idx: which
    input string each code came from, n_tri: trigram count per string).
    Strings shorter than 3 codepoints contribute zero trigrams (the
    ``char_trigrams`` rule); None counts as empty."""
    texts = ["" if t is None else t for t in texts]
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64,
                       count=len(texts))
    n_tri = np.maximum(lens - 2, 0)
    total = int(n_tri.sum())
    if total == 0:
        return (np.empty(0, np.uint64), np.empty(0, np.int64), n_tri)
    cp = np.frombuffer("".join(texts).encode("utf-32-le"),
                       dtype="<u4").astype(np.uint64)
    offs = np.cumsum(lens) - lens          # start offset of each string
    doc_idx = np.repeat(np.arange(len(texts)), n_tri)
    first = np.cumsum(n_tri) - n_tri       # first output slot of each doc
    starts = (np.arange(total) - np.repeat(first, n_tri)
              + np.repeat(offs, n_tri))
    codes = ((cp[starts] << np.uint64(42))
             | (cp[starts + 1] << np.uint64(21)) | cp[starts + 2])
    return codes, doc_idx, n_tri


def _pack_trigram_literals(trigrams: list[str]) -> np.ndarray:
    """The same uint64 packing for literal 3-char profile entries."""
    return np.array(sorted((ord(t[0]) << 42) | (ord(t[1]) << 21) | ord(t[2])
                           for t in trigrams), dtype=np.uint64)


def lang_id_ngram(df: DataFrame, text_col: str = "text",
                  out: str = "lang_pred") -> DataFrame:
    """Character-trigram language ID — the n-gram upgrade of the stopword
    heuristic (robust to short/no-stopword text): 'tr' / 'en' / 'unknown'
    by profile-hit ratio with a 1% floor.

    Round-6 shape: normalization in the JVM (regex semantics unchanged),
    then one mapInPandas pass counts TR/EN profile hits against the packed
    trigram codes of each Arrow batch (``_pack_trigrams_batch`` — no
    per-trigram JVM strings, no isin filter over a materialized array).
    The decision rule is the exact int/double math of the round-5 column
    expression (hits/n in IEEE double, same comparisons)."""
    sname = _fresh(df, "_lng_s")
    staged = _widen(df).withColumn(sname,
                           F.regexp_replace(F.lower(F.col(text_col)),
                                            r"\s+", " "))
    out_schema = T.StructType(list(df.schema.fields)
                              + [T.StructField(out, T.StringType(), False)])
    cols = [f.name for f in df.schema.fields]
    tr_set = _pack_trigram_literals(TR_TRIGRAMS)
    en_set = _pack_trigram_literals(EN_TRIGRAMS)

    def run(batches):
        for pdf in batches:
            codes, doc_idx, n_tri = _pack_trigrams_batch(list(pdf[sname]))
            nd = len(pdf)
            trh = np.bincount(doc_idx[np.isin(codes, tr_set)], minlength=nd)
            enh = np.bincount(doc_idx[np.isin(codes, en_set)], minlength=nd)
            pred = np.full(nd, "unknown", dtype=object)
            nz = n_tri > 0
            with np.errstate(divide="ignore", invalid="ignore"):
                rt = np.where(nz, trh / n_tri, 0.0)
                re_ = np.where(nz, enh / n_tri, 0.0)
            pred[nz & (trh > enh) & (rt > 0.01)] = "tr"
            pred[nz & (enh > trh) & (re_ > 0.01)] = "en"
            res = pdf[cols].copy()
            res[out] = pred
            yield res

    return staged.mapInPandas(run, schema=out_schema)


def quality_score(df: DataFrame, text_col: str = "text",
                  out: str = "quality") -> DataFrame:
    """[0,1] heuristic from length, punctuation density, stopword ratio and
    mean word length — the usual webtext quality gates.

    The words array is staged in its own projection (same HOF-lambda
    no-CSE reasoning as lang_id): one split per row instead of one per
    score component."""
    wname = _fresh(df, "_q_w")
    df = _widen(df).withColumn(wname, words_col(F.col(text_col)))
    text = F.col(text_col)
    w = F.col(wname)
    n_chars = F.length(text)
    n_words = F.size(w)
    punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = _ratio_in(w, TR_STOPWORDS + EN_STOPWORDS)
    mean_wlen = F.when(n_words > 0,
                       F.aggregate(w, F.lit(0),
                                   lambda acc, x: acc + F.length(x)) / n_words
                       ).otherwise(F.lit(0.0))
    len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    punct_score = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio * 4)
    stop_score = F.least(stop_ratio * 5, F.lit(1.0))
    wlen_score = F.when((mean_wlen >= 3) & (mean_wlen <= 10), F.lit(1.0)) \
                  .otherwise(F.lit(0.5))
    return df.withColumn(
        out,
        (len_score * 0.3 + punct_score * 0.2 + stop_score * 0.3
         + wlen_score * 0.2)).drop(wname)


def char_trigram_entropy(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id",
                         out: str = "entropy") -> DataFrame:
    """Shannon entropy (base 2) of each document's character-trigram
    distribution — low entropy flags repetitive/boilerplate/gibberish text
    (a standard webtext quality signal). Docs shorter than 3 normalized
    chars produce no trigrams and drop out (same rule as the SQL oracle's
    unnest of an empty list).

    Round-6 shape (guide §4.2/§2.4): normalization in the JVM, then ONE
    map-only mapInPandas pass — trigrams packed to uint64 codes
    (``_pack_trigrams_batch``), per-doc counts from a single lexsort +
    run-length pass over the Arrow batch, H = log2(N) − Σ c·log2(c) / N
    in float64. The round-5 shape exploded ~n trigram STRINGS per doc
    through a two-level hash-aggregate (one wide shuffle of the whole
    trigram stream); this computes the same per-doc count multisets with
    zero shuffle and no per-trigram objects. Values agree with both the
    old plan and DuckDB's native entropy() at the gate's 6-dp rounding
    (summation order differs only at ~1e-12, as it already did between
    engines)."""
    import pandas as pd

    id_type = df.schema[id_col].dataType
    staged = _widen(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col).alias("_id"),
        F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ").alias("_s"))
    schema = T.StructType([T.StructField(id_col, id_type, False),
                           T.StructField(out, T.DoubleType(), False)])

    def run(batches):
        for pdf in batches:
            codes, doc_idx, n_tri = _pack_trigrams_batch(list(pdf["_s"]))
            if codes.size == 0:
                continue
            order = np.lexsort((codes, doc_idx))
            d_s, c_s = doc_idx[order], codes[order]
            new = np.concatenate(
                ([True], (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])))
            counts = np.bincount(np.cumsum(new) - 1)  # per (doc, trigram)
            gdoc = d_s[new]                           # doc of each group
            s = np.bincount(gdoc, weights=counts * np.log2(counts),
                            minlength=len(pdf))
            keep = n_tri > 0
            nn = n_tri[keep].astype(np.float64)
            ent = np.log2(nn) - s[keep] / nn
            yield pd.DataFrame({id_col: pdf["_id"].to_numpy()[keep],
                                out: ent})

    return staged.mapInPandas(run, schema=schema)


def doc_fingerprint(df: DataFrame, text_col: str = "text",
                    out: str = "fingerprint") -> DataFrame:
    """Whitespace-normalized md5 fingerprint (near-whitespace-invariant)."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    return _widen(df).withColumn(out, F.md5(norm))
