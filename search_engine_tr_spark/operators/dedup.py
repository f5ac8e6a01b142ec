"""Deduplication operators for large-scale training-data pipelines.

All operators work over a documents table ``(doc_id:long, text:string)`` and
are designed scale-first:

- exact:    one hash-groupBy on a digest column (map-side partial agg)
- token-set Jaccard: inverted-index join on tokens — pairs are generated
  only for documents sharing a token (no O(n²) cross join); common tokens
  (df above a cap) are dropped from pair generation like stopwords, which
  bounds the join fan-out (explicit skew control)
- MinHash+LSH: shingle → K minhashes → B bands; candidate pairs only from
  shared band buckets, then exact-verified on shingle sets
- SimHash: 64-bit signature; near-dup pairs via 4-segment blocking
  (Hamming ≤ 3 guarantees an exact match in one 16-bit segment)

Hash functions are deterministic (xxhash64 with integer seed columns), no
RNG at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add an md5 content fingerprint (exact-dup key)."""
    return df.withColumn("fingerprint", F.md5(F.col(text_col)))


def exact_dedup(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Keep the smallest id per identical text. → original columns."""
    w = fingerprint(df, text_col)
    keep = w.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    return (w.join(keep, ["fingerprint", id_col], "left_semi")
            .drop("fingerprint"))


def exact_dup_groups(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """→ (fingerprint, n_dupes, keeper) for groups with >1 doc."""
    return (fingerprint(df, text_col)
            .groupBy("fingerprint")
            .agg(F.count("*").alias("n_dupes"), F.min(id_col).alias("keeper"))
            .filter(F.col("n_dupes") > 1))


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, token) distinct word tokens (lowercased, non-alnum split)."""
    return (df.select(F.col(id_col).alias("id"),
                      F.explode(F.array_distinct(
                          F.split(F.lower(F.col(text_col)), r"[^\p{L}\p{N}]+")
                      )).alias("token"))
            .filter(F.col("token") != ""))


def token_jaccard_pairs(df: DataFrame, threshold: float = 0.8,
                        id_col: str = "doc_id", text_col: str = "text",
                        max_token_df: int | None = None) -> DataFrame:
    """Exact token-set Jaccard ≥ threshold via inverted-index join.

    → (id_a, id_b, jaccard) with id_a < id_b. ``max_token_df`` drops tokens
    appearing in more than that many docs from PAIR GENERATION only —
    intersection counts then undercount, so it is exact only when None
    (the default used for oracle-checked queries).
    """
    toks = _tokens(df, id_col, text_col)
    sizes = toks.groupBy("id").agg(F.count("*").alias("sz"))
    gen = toks
    if max_token_df is not None:
        rare = (toks.groupBy("token").agg(F.count("*").alias("tdf"))
                .filter(F.col("tdf") <= max_token_df))
        gen = toks.join(rare.select("token"), "token", "left_semi")
    a = gen.select(F.col("id").alias("id_a"), "token")
    b = gen.select(F.col("id").alias("id_b"), "token")
    inter = (a.join(b, "token")
             .filter(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "id_b")
             .agg(F.count("*").alias("inter")))
    return (inter
            .join(sizes.select(F.col("id").alias("id_a"),
                               F.col("sz").alias("sz_a")), "id_a")
            .join(sizes.select(F.col("id").alias("id_b"),
                               F.col("sz").alias("sz_b")), "id_b")
            .withColumn("jaccard",
                        F.col("inter") /
                        (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _shingles(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(id, shingle) distinct word k-grams."""
    words = F.split(F.lower(F.col(text_col)), r"[^\p{L}\p{N}]+")
    words = F.filter(words, lambda w: w != "")
    n = F.size(words)
    sh = F.when(n >= k, F.transform(
        F.sequence(F.lit(1), n - k + 1),
        lambda i: F.concat_ws(" ", F.slice(words, i, k)),
    )).otherwise(F.array(F.concat_ws(" ", words)))
    return (df.select(F.col(id_col).alias("id"),
                      F.explode(F.array_distinct(sh)).alias("shingle")))


def minhash_signatures(df: DataFrame, num_hashes: int = 64,
                       id_col: str = "doc_id", text_col: str = "text",
                       shingle_k: int = 3) -> DataFrame:
    """(id, sig: array<long>) — sig[i] = min over shingles of
    xxhash64(shingle, seed=i). One explode + one groupBy; the K mins are
    computed as one array aggregate (no K passes)."""
    sh = _shingles(df, id_col, text_col, shingle_k)
    hashed = sh.select(
        "id",
        F.transform(F.sequence(F.lit(0), F.lit(num_hashes - 1)),
                    lambda i: F.xxhash64(F.col("shingle"), i)).alias("hs"))
    zero = F.array([F.lit(None).cast("long")] * num_hashes)
    merged = hashed.groupBy("id").agg(
        F.aggregate(
            F.collect_list("hs"), zero,
            lambda acc, x: F.zip_with(acc, x, lambda a, b: F.least(a, b))
        ).alias("sig"))
    return merged


def minhash_lsh_pairs(df: DataFrame, num_hashes: int = 64, bands: int = 16,
                      threshold: float = 0.7, id_col: str = "doc_id",
                      text_col: str = "text", shingle_k: int = 3) -> DataFrame:
    """Near-dup pairs: LSH banding for candidates, exact shingle-Jaccard
    verification ≥ threshold. → (id_a, id_b, jaccard)."""
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    sigs = minhash_signatures(df, num_hashes, id_col, text_col, shingle_k)
    banded = sigs.select(
        "id",
        F.explode(F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.struct(
                b.alias("band"),
                F.xxhash64(F.concat_ws(
                    ",", F.transform(F.slice("sig", b * rows + 1, rows),
                                     lambda v: v.cast("string"))
                )).alias("bucket")))).alias("bb"))
    cand = (banded.alias("x").join(
        banded.alias("y"),
        (F.col("x.bb.band") == F.col("y.bb.band"))
        & (F.col("x.bb.bucket") == F.col("y.bb.bucket"))
        & (F.col("x.id") < F.col("y.id")))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct())
    # exact verification on shingle sets
    sh = _shingles(df, id_col, text_col, shingle_k)
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    inter = (cand
             .join(sh.select(F.col("id").alias("id_a"), "shingle"), "id_a")
             .join(sh.select(F.col("id").alias("id_b"),
                             F.col("shingle").alias("sh_b")), "id_b")
             .filter(F.col("shingle") == F.col("sh_b"))
             .groupBy("id_a", "id_b")
             .agg(F.count("*").alias("inter")))
    return (inter
            .join(sizes.select(F.col("id").alias("id_a"),
                               F.col("sz").alias("sz_a")), "id_a")
            .join(sizes.select(F.col("id").alias("id_b"),
                               F.col("sz").alias("sz_b")), "id_b")
            .withColumn("jaccard",
                        F.col("inter") /
                        (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(df: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """(id, simhash:long) — 64-bit simhash over distinct word tokens:
    bit j = 1 iff Σ_tokens sign(bit j of xxhash64(token)) > 0.

    Bit shifts are static Python-side loops (Spark's shiftright takes an
    int, not a Column) — the expression tree is wide but codegen'd.
    """
    toks = _tokens(df, id_col, text_col)
    h = F.xxhash64("token")
    bits = toks.select(
        "id",
        F.array(*[
            F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, F.lit(1))
             .otherwise(F.lit(-1)) for j in range(64)
        ]).alias("v"))
    zero = F.array([F.lit(0)] * 64)
    summed = bits.groupBy("id").agg(
        F.aggregate(F.collect_list("v"), zero,
                    lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b)
                    ).alias("sums"))
    bit_terms = []
    for j in range(64):
        val = (1 << j) if j < 63 else -(1 << 63)  # sign bit as signed long
        bit_terms.append(
            F.when(F.element_at("sums", j + 1) > 0, F.lit(val).cast("long"))
             .otherwise(F.lit(0).cast("long")))
    acc = bit_terms[0]
    for t in bit_terms[1:]:
        acc = acc.bitwiseOR(t)
    return summed.select("id", acc.alias("simhash"))


def simhash_near_pairs(df: DataFrame, max_hamming: int = 3,
                       id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming via 4-segment
    blocking (pigeonhole: ≤3 differing bits → ≥1 identical 16-bit segment).
    → (id_a, id_b, hamming)."""
    sh = simhash(df, id_col, text_col)
    seg = sh.select(
        "id", "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(s).alias("seg"),
                F.shiftright(F.col("simhash"), s * 16)
                 .bitwiseAND(F.lit(0xFFFF)).alias("key"))
            for s in range(4)
        ])).alias("sk"))
    cand = (seg.alias("x").join(
        seg.alias("y"),
        (F.col("x.sk.seg") == F.col("y.sk.seg"))
        & (F.col("x.sk.key") == F.col("y.sk.key"))
        & (F.col("x.id") < F.col("y.id")))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"),
                F.col("x.simhash").alias("h_a"), F.col("y.simhash").alias("h_b"))
        .distinct())
    return (cand
            .withColumn("hamming", F.bit_count(
                F.col("h_a").bitwiseXOR(F.col("h_b"))))
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))
