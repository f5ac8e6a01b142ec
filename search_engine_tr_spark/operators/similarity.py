"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force exact cosine top-k — native column math
  (zip_with/aggregate), no UDF; the correctness baseline.
- ``lsh_cosine_topk``: random-hyperplane LSH bucketing — the scale path.
  Planes are derived deterministically from a seed (no runtime RNG); query
  probes its own bucket plus optional multiprobe neighbors. Approximate:
  property-tested for recall against brute force, no SQL oracle.
- ``pairwise_cosine_dupes``: embedding near-duplicate pairs ≥ threshold
  via the same LSH buckets.

At cluster scale the brute-force path is a single map + TakeOrdered
(no shuffle); LSH turns the scan into a bucket-pruned scan.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import ensure_scan_parallelism as _widen
from .dedup import DEFAULT_MAX_BUCKET_SIZE


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def with_cosine(df: DataFrame, query_vec: list[float],
                vec_col: str = "embedding", out: str = "cosine") -> DataFrame:
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    return df.withColumn(
        out,
        _dot(F.col(vec_col).cast("array<double>"), q) /
        (_norm(F.col(vec_col).cast("array<double>")) * F.lit(qn)))


def cosine_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                round_dp: int | None = None) -> DataFrame:
    """Exact brute-force cosine top-k → (id, cosine), (cosine desc, id asc).

    ``round_dp`` rounds the cosine BEFORE ordering (and returns the rounded
    value) so the top-k boundary tie-break matches an engine that orders by
    the rounded output column (the DuckDB gate does: ORDER BY the alias)."""
    # guide §2.5: the fixture embeddings table is one unsplittable parquet
    # row group — widen so the per-row dot/norm array math parallelizes
    # (no-op on an already-split input)
    scored = with_cosine(_widen(df), query_vec, vec_col)
    if round_dp is not None:
        scored = scored.withColumn("cosine", F.round("cosine", round_dp))
    return (scored
            .select(F.col(id_col), F.col("cosine"))
            .orderBy(F.desc("cosine"), F.asc(id_col))
            .limit(k))


def _planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim))


def _bucket_col(vec_col, planes: np.ndarray):
    """Sign-pattern bucket id as a long (≤ 63 planes)."""
    bits = []
    for i, p in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(vec_col,
                       F.array(*[F.lit(float(x)) for x in p]),
                       lambda x, y: x * y),
            F.lit(0.0), lambda acc, v: acc + v)
        bits.append(F.when(dot >= 0,
                           F.shiftleft(F.lit(1).cast("long"), i))
                    .otherwise(F.lit(0).cast("long")))
    out = F.lit(0).cast("long")
    for b in bits:
        out = out.bitwiseOR(b)
    return out


def query_bucket_bits(query_vec: list[float], planes: np.ndarray) -> int:
    """Sign-bucket of the query vector — sequential left-to-right dots so the
    summation order matches the Column-side ``_bucket_col`` aggregate (numpy
    ``@`` uses pairwise/SIMD summation, which could flip a borderline sign)."""
    bits = 0
    for i, p in enumerate(planes):
        acc = 0.0
        for a, b in zip(query_vec, p):
            acc += float(a) * float(b)
        if acc >= 0:
            bits |= 1 << i
    return bits


def lsh_cosine_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    n_planes: int = 8, seed: int = 42,
                    multiprobe: int = 1,
                    round_dp: int | None = None) -> DataFrame:
    """Approximate cosine top-k: scan only vectors whose hyperplane
    sign-bucket is within Hamming ≤ multiprobe of the query's bucket."""
    dim = len(query_vec)
    planes = _planes(dim, n_planes, seed)
    qbits = query_bucket_bits(query_vec, planes)
    bucketed = _widen(df).withColumn(
        "_bucket", _bucket_col(F.col(vec_col).cast("array<double>"), planes))
    probe = bucketed.filter(
        F.bit_count(F.col("_bucket").bitwiseXOR(F.lit(qbits))) <= multiprobe)
    scored = with_cosine(probe, query_vec, vec_col)
    if round_dp is not None:
        scored = scored.withColumn("cosine", F.round("cosine", round_dp))
    return (scored
            .select(F.col(id_col), F.col("cosine"))
            .orderBy(F.desc("cosine"), F.asc(id_col))
            .limit(k))


def pairwise_cosine_dupes(df: DataFrame, threshold: float = 0.95,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          n_planes: int = 8, seed: int = 42,
                          max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
                          ) -> DataFrame:
    """Embedding near-dup pairs ≥ threshold, candidates from shared LSH
    bucket (approximate recall, exact precision). → (id_a, id_b, cosine).

    ``max_bucket_size`` (default ``operators.dedup.
    DEFAULT_MAX_BUCKET_SIZE``, None = uncapped) drops hot buckets (skew
    guard for near-constant corpora where one sign-pattern absorbs most
    vectors); dropped-bucket count is logged — never silently capped."""
    planes = _planes(df.select(F.size(vec_col)).first()[0], n_planes, seed)
    b = _widen(df).withColumn(
        "_bucket", _bucket_col(F.col(vec_col).cast("array<double>"), planes))
    if max_bucket_size is not None:
        # localCheckpoint: reused by the count and the keep-join — avoids
        # recomputing every plane dot twice (round-5 review)
        sizes = (b.groupBy("_bucket").agg(F.count("*").alias("_bsz"))
                 .localCheckpoint())
        n_hot = sizes.filter(F.col("_bsz") > max_bucket_size).count()
        if n_hot:
            import logging

            logging.getLogger(__name__).warning(
                "pairwise_cosine_dupes: dropping %d hot bucket(s) > %d "
                "vectors (recall reduced for their members)",
                n_hot, max_bucket_size)
        b = (b.join(F.broadcast(sizes.filter(F.col("_bsz") <= max_bucket_size)
                                .select("_bucket")), "_bucket", "left_semi"))
    # Round-6 (guide §2.3/§4.2): cast to array<double> and take each
    # vector's norm ONCE per row before the bucket self-join — the
    # round-5 shape recomputed cast+norm per CANDIDATE PAIR (a vector in
    # p pairs paid its norm aggregate p times), tripling the per-pair
    # array work. cosine = dot/(norm_a*norm_b) is the same expression on
    # the same doubles, so values are bit-identical.
    bd = b.withColumn("_vd", F.col(vec_col).cast("array<double>"))
    bd = bd.withColumn("_nrm", _norm(F.col("_vd")))
    x = bd.select(F.col(id_col).alias("id_a"), F.col("_vd").alias("v_a"),
                  F.col("_nrm").alias("n_a"), "_bucket")
    y = bd.select(F.col(id_col).alias("id_b"), F.col("_vd").alias("v_b"),
                  F.col("_nrm").alias("n_b"), "_bucket")
    cand = x.join(y, "_bucket").filter(F.col("id_a") < F.col("id_b"))
    return (cand.withColumn("cosine", _dot(F.col("v_a"), F.col("v_b"))
                            / (F.col("n_a") * F.col("n_b")))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))
