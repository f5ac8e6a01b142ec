"""IVF (inverted-file) approximate nearest neighbor over an embedding
column — the coarse-quantization scale path beside hyperplane LSH
(``operators.similarity``).

All steps are DataFrame-native:

- ``kmeans_centroids``: deterministic Lloyd's iterations. Init = the k
  vectors whose md5(id) sorts first (seedless deterministic sample);
  assignment = argmax cosine against broadcast centroid literals (pure
  column math, whole-stage codegen); update = element-wise mean via
  posexplode → groupBy(cluster, pos) → avg. Per-iteration driver state is
  k × dim floats — tiny by design (k is the coarse codebook size).
- ``ivf_assign``: adds the ``cluster`` column. At ingest time this is the
  partition key: writing the corpus partitioned by cluster turns every ANN
  probe into a directory-pruned scan of n_probe/k of the data.
- ``ivf_cosine_topk``: rank centroids against the query driver-side (k
  values), scan only the top ``n_probe`` clusters, exact cosine top-k
  inside. With ``n_probe == k`` the result is EXACTLY brute force (the
  equality property tests rely on this).

At 100 TB: kmeans runs on a deterministic sample (``fit_fraction``), the
assign pass is one map-only projection, and query cost is bounded by the
probed clusters' row count — no shuffle anywhere on the query path.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import ensure_scan_parallelism as _widen
from .similarity import _dot, _norm


def _centroid_lit(c: list[float]):
    return F.array(*[F.lit(float(x)) for x in c])


def _cos_to(vec_col, c: list[float], nrm_col=None):
    """cosine(vec, c). ``nrm_col``: a pre-staged ``_norm(vec_col)`` column —
    the k-means assignment evaluates one cosine per centroid, and Spark
    does no CSE inside HOF lambdas, so without staging the norm aggregate
    re-runs k× per row (guide §4.2 / the lang_id no-CSE class). The
    expression is ``dot / (norm * cn)`` either way — bit-identical."""
    cn = math.sqrt(sum(float(x) * float(x) for x in c)) or 1.0
    nrm = _norm(vec_col) if nrm_col is None else nrm_col
    return _dot(vec_col, _centroid_lit(c)) / (nrm * F.lit(cn))


def _assign_col(vec_col, centroids: list[list[float]], nrm_col=None):
    """argmax-cosine cluster id (first-maximal tie-break, deterministic)."""
    sims = F.array(*[_cos_to(vec_col, c, nrm_col) for c in centroids])
    return (F.array_position(sims, F.array_max(sims)) - 1).cast("int")


def kmeans_centroids(df: DataFrame, k: int = 16, max_iter: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     fit_fraction: float | None = None) -> list[list[float]]:
    """Deterministic Lloyd's k-means → k × dim python floats.

    ``fit_fraction`` fits on a deterministic md5-ordered prefix sample —
    the 100-TB path (the codebook needs a sample, not the corpus)."""
    v = F.col(vec_col).cast("array<double>")
    # widen BEFORE the cache: a single-row-group input would otherwise pin
    # every Lloyd's iteration's argmax-cosine pass to one cached partition
    # (guide §2.5; no-op on an already-split input)
    base = _widen(df.select(F.col(id_col).alias("_id"), v.alias("_v")))
    if fit_fraction is not None:
        n = base.count()
        base = (base.orderBy(F.md5(F.col("_id").cast("string")))
                .limit(max(k, int(n * fit_fraction))))
    # the vector norm is iteration-invariant: stage it INTO the cached
    # frame so every Lloyd's pass (k cosines per row) reuses one stored
    # double instead of re-running the norm aggregate k× per row
    base = base.withColumn("_nrm", _norm(F.col("_v"))).cache()
    try:
        init = (base.orderBy(F.md5(F.col("_id").cast("string")), "_id")
                .limit(k).collect())
        centroids = [list(r["_v"]) for r in init]
        for _ in range(max_iter):
            assigned = base.select(
                _assign_col(F.col("_v"), centroids,
                            F.col("_nrm")).alias("cluster"), "_v")
            means = (assigned
                     .select("cluster", F.posexplode("_v").alias("pos", "x"))
                     .groupBy("cluster", "pos").agg(F.avg("x").alias("m"))
                     .groupBy("cluster")
                     .agg(F.sort_array(F.collect_list(
                         F.struct("pos", "m"))).alias("pm"))
                     .select("cluster", F.col("pm.m").alias("mean"))
                     .collect())
            new = list(centroids)  # empty clusters keep their old centroid
            for r in means:
                new[int(r["cluster"])] = list(r["mean"])
            if new == centroids:
                break
            centroids = new
        return centroids
    finally:
        base.unpersist()


def ivf_assign(df: DataFrame, centroids: list[list[float]],
               vec_col: str = "embedding",
               out: str = "cluster") -> DataFrame:
    """Add the coarse-quantizer cluster column (map-only; at ingest this is
    the partitionBy key for directory-pruned ANN scans). The cast vector
    and its norm are staged once per row (no CSE inside HOF lambdas — the
    pre-r6 shape re-ran both k× per row, once per centroid cosine)."""
    vd, nrm = "_ivf_vd", "_ivf_nrm"
    while vd in df.columns:
        vd += "_"
    while nrm in df.columns:
        nrm += "_"
    staged = (df.withColumn(vd, F.col(vec_col).cast("array<double>"))
              .withColumn(nrm, _norm(F.col(vd))))
    return (staged.withColumn(
        out, _assign_col(F.col(vd), centroids, F.col(nrm)))
        .drop(vd, nrm))


def ivf_cosine_topk(df: DataFrame, query_vec: list[float],
                    centroids: list[list[float]], k: int = 10,
                    n_probe: int = 4, id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    round_dp: int | None = None) -> DataFrame:
    """Approximate cosine top-k scanning only the ``n_probe`` clusters whose
    centroids are most query-similar. n_probe == len(centroids) ⇒ exact."""
    from .similarity import with_cosine

    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec)) or 1.0

    def cos(c):
        cn = math.sqrt(sum(float(x) * float(x) for x in c)) or 1.0
        acc = 0.0
        for a, b in zip(query_vec, c):
            acc += float(a) * float(b)
        return acc / (qn * cn)

    order = sorted(range(len(centroids)),
                   key=lambda i: (-cos(centroids[i]), i))
    probe = order[:max(1, n_probe)]
    cand = (ivf_assign(_widen(df), centroids, vec_col)
            .filter(F.col("cluster").isin(probe)))
    scored = with_cosine(cand, query_vec, vec_col)
    if round_dp is not None:
        scored = scored.withColumn("cosine", F.round("cosine", round_dp))
    return (scored.select(F.col(id_col), F.col("cosine"))
            .orderBy(F.desc("cosine"), F.asc(id_col))
            .limit(k))
