"""Text analysis for training-data pipelines — all native column math
(no UDFs): language-ID heuristic, quality scoring, token counting,
rolling-hash document fingerprinting.

Every function is also expressible in ANSI SQL (DuckDB oracles in
__spark_entry__.py), so these operators sit in the driver's correctness
gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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
    return df.withColumn(out, F.size(words_col(F.col(text_col))))


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
    return df.withColumn(out, per_word)


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
    staged = df.withColumn(wname, words_col(F.col(text_col)))
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


def lang_id_ngram(df: DataFrame, text_col: str = "text",
                  out: str = "lang_pred") -> DataFrame:
    """Character-trigram language ID — the n-gram upgrade of the stopword
    heuristic (robust to short/no-stopword text): 'tr' / 'en' / 'unknown'
    by profile-hit ratio with a 1% floor.

    Plan shape (the O(n²)-per-doc fix): three staged projections —
    (1) normalize the string ONCE, (2) build the trigram array ONCE from
    that attribute, (3) take the three counts from the array attribute —
    so the regexp runs once per row and each trigram is a 3-char substr of
    a stored string. CollapseProject keeps the stages separate because the
    staged aliases are non-cheap and multiply-referenced."""
    names = {b: _fresh(df, b)
             for b in ("_lng_s", "_lng_tg", "_lng_n", "_lng_tr", "_lng_en")}
    staged = (df
              .withColumn(names["_lng_s"],
                          F.regexp_replace(F.lower(F.col(text_col)),
                                           r"\s+", " "))
              .withColumn(names["_lng_tg"],
                          char_trigrams(F.col(names["_lng_s"])))
              .withColumn(names["_lng_n"], F.size(names["_lng_tg"]))
              .withColumn(names["_lng_tr"],
                          F.size(F.filter(F.col(names["_lng_tg"]),
                                          lambda t: t.isin(TR_TRIGRAMS))))
              .withColumn(names["_lng_en"],
                          F.size(F.filter(F.col(names["_lng_tg"]),
                                          lambda t: t.isin(EN_TRIGRAMS)))))
    n = F.col(names["_lng_n"])
    trh = F.col(names["_lng_tr"])
    enh = F.col(names["_lng_en"])
    return (staged
            .withColumn(
                out,
                F.when(n == 0, F.lit("unknown"))
                 .when((trh > enh) & (trh / n > 0.01), F.lit("tr"))
                 .when((enh > trh) & (enh / n > 0.01), F.lit("en"))
                 .otherwise(F.lit("unknown")))
            .drop(*names.values()))


def quality_score(df: DataFrame, text_col: str = "text",
                  out: str = "quality") -> DataFrame:
    """[0,1] heuristic from length, punctuation density, stopword ratio and
    mean word length — the usual webtext quality gates.

    The words array is staged in its own projection (same HOF-lambda
    no-CSE reasoning as lang_id): one split per row instead of one per
    score component."""
    wname = _fresh(df, "_q_w")
    df = df.withColumn(wname, words_col(F.col(text_col)))
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

    Shape: explode → two-level aggregate with map-side partial combine;
    H = log2(N) − Σ c·log2(c) / N avoids materializing per-doc
    probability vectors."""
    staged = df.select(
        F.col(id_col),
        F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ").alias("_s"))
    ex = staged.select(id_col,
                       F.explode(char_trigrams(F.col("_s"))).alias("_t"))
    counts = ex.groupBy(id_col, "_t").agg(F.count("*").alias("_c"))
    n = F.sum("_c")
    return (counts.groupBy(id_col)
            .agg((F.log2(n) - F.sum(F.col("_c") * F.log2("_c")) / n)
                 .alias(out)))


def doc_fingerprint(df: DataFrame, text_col: str = "text",
                    out: str = "fingerprint") -> DataFrame:
    """Whitespace-normalized md5 fingerprint (near-whitespace-invariant)."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    return df.withColumn(out, F.md5(norm))
