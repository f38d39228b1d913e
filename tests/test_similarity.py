"""Similarity-search operator tests: exactness of brute force, recall of
the approximate variants, IVF assignment invariants."""

import pytest
from pyspark.sql import functions as F

from mr_dice_spark.catalog import Catalog
from mr_dice_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_ivf,
    cosine_topk_lsh,
    ivf_assign,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return Catalog(spark, sf_dir).embeddings


@pytest.fixture(scope="module")
def qvec(emb):
    return [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]


def _ids(df):
    return [r["vec_id"] for r in df.collect()]


def test_bruteforce_self_is_top1(emb, qvec):
    top = _ids(cosine_topk_bruteforce(emb, "vec_id", "embedding", qvec, k=5))
    assert top[0] == 0  # the query vector itself


def test_ivf_assignment_covers_all_rows(emb):
    assigned, centroids = ivf_assign(emb, "vec_id", "embedding", n_centroids=8)
    assert len(centroids) == 8
    total = emb.count()
    assert assigned.count() == total
    clusters = assigned.groupBy("__cluster").count()
    rows = {r["__cluster"]: r["count"] for r in clusters.collect()}
    assert set(rows) <= set(range(8)) and sum(rows.values()) == total


def test_ivf_recall_vs_bruteforce(emb, qvec):
    exact = set(_ids(cosine_topk_bruteforce(emb, "vec_id", "embedding", qvec, k=10)))
    approx = set(_ids(cosine_topk_ivf(emb, "vec_id", "embedding", qvec,
                                      k=10, n_centroids=8, n_probe=4)))
    # probing half the lists on a small corpus should recover most of top-10
    assert len(exact & approx) >= 5
    # full probe == exact (IVF with n_probe = n_centroids degenerates to brute force)
    full = set(_ids(cosine_topk_ivf(emb, "vec_id", "embedding", qvec,
                                    k=10, n_centroids=8, n_probe=8)))
    assert full == exact


def test_lsh_recall_vs_bruteforce(emb, qvec):
    exact = set(_ids(cosine_topk_bruteforce(emb, "vec_id", "embedding", qvec, k=10)))
    approx = set(_ids(cosine_topk_lsh(emb, "vec_id", "embedding", qvec,
                                      k=10, n_planes=16, max_hamming=6)))
    assert len(exact & approx) >= 3


def test_kmeans_objective_nondecreasing(spark, emb):
    """Spherical k-means: mean assigned cosine must not decrease over
    sweeps (the Lloyd's convergence guarantee)."""
    from mr_dice_spark.operators.similarity import (
        _argmax_cluster, cosine, kmeans_fit,
    )

    def objective(centroids):
        vec = F.col("embedding").cast("array<double>")
        assigned = emb.select(_argmax_cluster(vec, centroids).alias("__c"), vec.alias("__v"))
        per = [
            F.when(F.col("__c") == ci,
                   cosine(F.col("__v"), F.array(*[F.lit(x) for x in c])))
            for ci, c in centroids
        ]
        return assigned.select(F.coalesce(*per).alias("s")).agg(F.avg("s")).first()[0]

    objs = [
        objective(kmeans_fit(emb, "vec_id", "embedding", k=8, n_iter=i))
        for i in (0, 1, 3)
    ]
    assert objs[0] <= objs[1] + 1e-9 <= objs[2] + 2e-9
    assert objs[2] > objs[0]  # training actually moved the centroids


def test_kmeans_centroids_unit_norm_and_count(emb):
    from mr_dice_spark.operators.similarity import kmeans_fit

    cents = kmeans_fit(emb, "vec_id", "embedding", k=8, n_iter=2)
    assert len(cents) == 8
    for _, c in cents:
        assert len(c) == 64
        assert abs(sum(x * x for x in c) - 1.0) < 1e-9


def test_trained_ivf_recall_not_worse(emb, qvec):
    """Trained inverted lists must not lose recall vs sampled-init on the
    same probe budget (they should tighten clusters)."""
    exact = set(_ids(cosine_topk_bruteforce(emb, "vec_id", "embedding", qvec, k=10)))
    raw = set(_ids(cosine_topk_ivf(emb, "vec_id", "embedding", qvec,
                                   k=10, n_centroids=8, n_probe=2)))
    trained = set(_ids(cosine_topk_ivf(emb, "vec_id", "embedding", qvec,
                                       k=10, n_centroids=8, n_probe=2, train_iters=3)))
    assert len(trained & exact) >= len(raw & exact)
    assert len(trained & exact) >= 5  # sane recall on the synthetic corpus
