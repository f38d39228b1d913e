"""Tests for deterministic Lloyd's k-means (operators/clustering.py)."""

import pytest

from mr_dice_spark.operators.clustering import kmeans_assign


def test_kmeans_separates_obvious_clusters(spark):
    # two tight blobs far apart; init = two lowest ids (one from each blob)
    rows = [(1, [0.0, 0.0]), (2, [10.0, 10.0])]
    rows += [(10 + i, [0.1 * i, 0.1]) for i in range(4)]
    rows += [(20 + i, [10.0 + 0.1 * i, 9.9]) for i in range(4)]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    got = {r["id"]: r["cluster"] for r in kmeans_assign(df, "id", "v", k=2, sweeps=2).collect()}
    low = {got[1]} | {got[10 + i] for i in range(4)}
    high = {got[2]} | {got[20 + i] for i in range(4)}
    assert low == {0} and high == {1}


def test_kmeans_zero_sweeps_is_nearest_init_and_ties_break_low(spark):
    # sweeps=0: assignment against the raw init centroids (ids 1, 2);
    # id 3 is equidistant from both -> lowest cluster index wins
    df = spark.createDataFrame(
        [(1, [0.0]), (2, [4.0]), (3, [2.0]), (4, [3.9])],
        "id long, v array<double>",
    )
    got = {r["id"]: (r["cluster"], r["dist"]) for r in
           kmeans_assign(df, "id", "v", k=2, sweeps=0).collect()}
    assert got[1] == (0, 0.0)
    assert got[2] == (1, 0.0)
    assert got[3][0] == 0  # tie -> lower index
    assert got[4][0] == 1


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    # ids 1 and 2 carry the SAME vector [5.0], so both init centroids
    # coincide; every point ties and the low-index rule drains cluster 1
    # on sweep 1. The update must KEEP cluster 1's previous centroid
    # (5.0): on the final assignment the exact-5.0 points then return to
    # cluster 1 (dist 0) while the off-center points stay with the moved
    # cluster-0 mean. A buggy update that zeroes the empty cluster would
    # put every point in cluster 0 (nothing sits near 0).
    rows = [(1, [5.0]), (2, [5.0]), (3, [5.1]), (4, [5.2]), (5, [5.3])]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    out = {r["id"]: r["cluster"] for r in kmeans_assign(df, "id", "v", k=2, sweeps=1).collect()}
    # sweep-1 mean for cluster 0 is 5.12; exact-5.0 points are closer to
    # the preserved 5.0 centroid, the rest closer to 5.12
    assert out == {1: 1, 2: 1, 3: 0, 4: 0, 5: 0}


def test_kmeans_deterministic_and_validates(spark):
    import random

    rng = random.Random(5)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    a = sorted((r["id"], r["cluster"], r["dist"]) for r in
               kmeans_assign(df, "id", "v", k=3, sweeps=2).collect())
    b = sorted((r["id"], r["cluster"], r["dist"]) for r in
               kmeans_assign(df, "id", "v", k=3, sweeps=2).collect())
    assert a == b
    with pytest.raises(ValueError):
        kmeans_assign(df, "id", "v", k=0)
    with pytest.raises(ValueError):
        kmeans_assign(df, "id", "v", k=2, sweeps=-1)
    with pytest.raises(ValueError):
        kmeans_assign(df.limit(2), "id", "v", k=5)


def test_single_linkage_known_topology(spark):
    """Chain a-b-c must merge into ONE cluster (transitivity — exactly
    what first-wins pair dedup gets wrong), an isolated pair stays a
    doubleton, and rows in no pair are singletons of themselves."""
    from mr_dice_spark.operators.clustering import single_linkage_clusters

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 8)], "id long, x double"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    got = {
        r["id"]: (r["cluster"], r["cluster_size"])
        for r in single_linkage_clusters(df, pairs, "id").collect()
    }
    assert got == {
        1: (1, 3), 2: (1, 3), 3: (1, 3),   # chain -> one cluster, min id
        4: (4, 1),                          # singleton
        5: (5, 2), 6: (5, 2),               # isolated pair
        7: (7, 1),                          # singleton
    }


def test_cosine_pairs_exact_threshold_and_symmetry(spark):
    """Pairs are emitted once (id_a < id_b), the rounded-cosine threshold
    is inclusive, and orthogonal vectors never pair."""
    from mr_dice_spark.operators.clustering import cosine_pairs_exact

    rows = [
        (1, [1.0, 0.0]),
        (2, [1.0, 0.0]),     # identical to 1 -> cosine 1.0
        (3, [0.0, 1.0]),     # orthogonal to 1/2
        (4, [1.0, 1.0]),     # cos 0.707107 to 1/2 and 3
    ]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in cosine_pairs_exact(df, "id", "v", threshold=0.707107).collect()
    }
    assert set(got) == {(1, 2), (1, 4), (2, 4), (3, 4)}
    assert got[(1, 2)] == 1.0
    assert got[(1, 4)] == 0.707107  # rounded value sits exactly ON the threshold


def test_cosine_pairs_exact_circuit_breaker(spark):
    """Oversized input fails fast instead of running quadratic (the
    edit_distance_join max_block_rows policy); max_rows=None opts out."""
    import pytest
    from pyspark.sql import functions as F

    from mr_dice_spark.operators.clustering import cosine_pairs_exact

    df = spark.range(30).select(
        F.col("id"), F.array(F.lit(1.0), F.lit(0.0)).alias("v")
    )
    with pytest.raises(ValueError, match="max_rows"):
        cosine_pairs_exact(df, "id", "v", 0.9, max_rows=10)
    n = cosine_pairs_exact(df, "id", "v", 0.9, max_rows=None).count()
    assert n == 30 * 29 // 2  # identical vectors: every pair
