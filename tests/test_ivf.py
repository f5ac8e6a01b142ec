"""IVF coarse-quantized ANN: deterministic k-means, probe-all exactness,
recall of identical-direction vectors, cluster-assignment invariants."""

import numpy as np
import pytest

from search_engine_tr_spark.operators import ivf, similarity


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.RandomState(11)
    vecs = rng.standard_normal((80, 12)).astype(np.float32)
    vecs[20] = vecs[5] * 3.0  # same direction as row 5 → cosine 1
    rows = [(i, v.tolist()) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df.cache(), vecs


def test_kmeans_deterministic(spark, vectors):
    df, _ = vectors
    a = ivf.kmeans_centroids(df, k=6, max_iter=4)
    b = ivf.kmeans_centroids(df, k=6, max_iter=4)
    assert a == b
    assert len(a) == 6 and all(len(c) == 12 for c in a)


def test_assignment_in_range(spark, vectors):
    df, _ = vectors
    cents = ivf.kmeans_centroids(df, k=6, max_iter=3)
    clusters = [r["cluster"]
                for r in ivf.ivf_assign(df, cents).select("cluster").collect()]
    assert len(clusters) == 80
    assert all(0 <= c < 6 for c in clusters)


def test_probe_all_equals_bruteforce(spark, vectors):
    """n_probe == k scans everything → must equal brute force EXACTLY."""
    df, vecs = vectors
    q = [float(x) for x in vecs[5]]
    cents = ivf.kmeans_centroids(df, k=6, max_iter=3)
    brute = [(r["vec_id"], r["cosine"])
             for r in similarity.cosine_topk(df, q, k=10).collect()]
    probed = [(r["vec_id"], r["cosine"])
              for r in ivf.ivf_cosine_topk(df, q, cents, k=10,
                                           n_probe=6).collect()]
    assert probed == brute


def test_identical_direction_recall(spark, vectors):
    """The query's own cluster is always probed first, so an
    identical-direction vector is found even at n_probe=1."""
    df, vecs = vectors
    q = [float(x) for x in vecs[5]]
    cents = ivf.kmeans_centroids(df, k=6, max_iter=3)
    top = [r["vec_id"]
           for r in ivf.ivf_cosine_topk(df, q, cents, k=2,
                                        n_probe=1).collect()]
    assert set(top) == {5, 20}


def test_fit_fraction_sample_path(spark, vectors):
    df, vecs = vectors
    cents = ivf.kmeans_centroids(df, k=4, max_iter=3, fit_fraction=0.5)
    assert len(cents) == 4
    q = [float(x) for x in vecs[5]]
    brute = [r["vec_id"]
             for r in similarity.cosine_topk(df, q, k=5).collect()]
    probed = [r["vec_id"]
              for r in ivf.ivf_cosine_topk(df, q, cents, k=5,
                                           n_probe=4).collect()]
    assert probed == brute  # probe-all still exact with sampled codebook
