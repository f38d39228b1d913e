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
