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


# ---------------------------------------------------------------------------
# product quantization
# ---------------------------------------------------------------------------


def test_pq_exact_on_codeword_vectors(spark):
    """Vectors that ARE codewords reconstruct losslessly: ADC score equals
    the exact cosine."""
    from mr_dice_spark.operators.similarity import pq_encode, pq_topk, pq_train

    base = [[0.0] * 8 for _ in range(4)]
    for i in range(4):
        base[i][2 * i] = 1.0  # orthogonal unit vectors
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(base)], "vec_id long, embedding array<double>"
    )
    books = pq_train(df, "vec_id", "embedding", m=2, nbits=2, n_iter=2)
    assert len(books) == 2 and len(books[0]) == 4 and len(books[0][0]) == 4
    enc = pq_encode(df, "vec_id", "embedding", books)
    top = pq_topk(enc, "vec_id", base[1], books, k=4).collect()
    assert top[0]["vec_id"] == 1
    assert top[0]["adc_score"] == pytest.approx(1.0)
    assert all(abs(r["adc_score"]) < 1e-9 for r in top[1:])  # orthogonal rest


def test_pq_recall_vs_bruteforce(emb, qvec):
    from mr_dice_spark.operators.similarity import pq_encode, pq_topk, pq_train

    exact = set(_ids(cosine_topk_bruteforce(emb, "vec_id", "embedding", qvec, k=10)))
    books = pq_train(emb, "vec_id", "embedding", m=16, nbits=4, n_iter=3)
    enc = pq_encode(emb, "vec_id", "embedding", books)
    approx = {r["vec_id"] for r in pq_topk(enc, "vec_id", qvec, books, k=20).collect()}
    # 64x compression (64 dims * 8B -> 16 codes * 4 bits): expect solid
    # overlap of the exact top-10 within the approximate top-20
    assert len(exact & approx) >= 6


def test_ivf_pq_recall_and_pruning(emb, qvec):
    from mr_dice_spark.operators.similarity import ivf_pq_index, ivf_pq_topk

    exact = set(_ids(cosine_topk_bruteforce(emb, "vec_id", "embedding", qvec, k=10)))
    index_df, centroids, books = ivf_pq_index(
        emb, "vec_id", "embedding", n_centroids=8, m=16, nbits=4,
        train_iters=2, pq_iters=2,
    )
    # probing all clusters must equal plain PQ ADC over the full corpus
    from mr_dice_spark.operators.similarity import pq_topk

    full = _ids(pq_topk(index_df, "vec_id", qvec, books, k=10))
    allp = _ids(ivf_pq_topk(index_df, "vec_id", qvec, centroids, books,
                            k=10, n_probe=8))
    assert full == allp
    # pruned probe keeps decent recall of the exact top-10 in its top-20
    approx = {r["vec_id"] for r in
              ivf_pq_topk(index_df, "vec_id", qvec, centroids, books,
                          k=20, n_probe=3).collect()}
    assert len(exact & approx) >= 5


def test_pq_validates_input(emb):
    from mr_dice_spark.operators.similarity import pq_train

    with pytest.raises(ValueError, match="not divisible"):
        pq_train(emb, "vec_id", "embedding", m=7)


def test_semantic_dedup_min_id_wins_within_cluster(spark):
    """Two identical-direction vectors in one cluster: the higher id is
    dropped; an unrelated orthogonal vector (its own cluster) survives;
    a near-dup pair SPLIT across clusters is missed by design (SemDeDup's
    documented recall trade)."""
    from mr_dice_spark.operators.similarity import semantic_dedup

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.0, 0.0, 0.0]),   # scaled copy of 1 -> cosine 1.0
        (3, [0.0, 1.0, 0.0, 0.0]),   # orthogonal, own cluster
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # centroids = first 2 vectors (ids 1, 2 — same direction), so vec 3
    # still lands on the nearest of those; all three share geometry
    # decisions deterministically
    out = {r["vec_id"]: (r["cluster"], r["kept"])
           for r in semantic_dedup(df, "vec_id", "embedding",
                                   threshold=0.95, n_centroids=2).collect()}
    assert out[1][1] is True and out[2][1] is False   # min id wins
    assert out[3][1] is True
    assert out[1][0] == out[2][0]                     # same cluster

    # transitive chain: 1~2, 2~3' but 1!~3' — first-wins drops BOTH 2 and
    # the chained member (b dropped if ANY lower-id member is close)
    chain = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.12]), (3, [1.0, 0.24])],
        "vec_id long, embedding array<double>",
    )
    got = {r["vec_id"]: r["kept"]
           for r in semantic_dedup(chain, "vec_id", "embedding",
                                   threshold=0.99, n_centroids=1).collect()}
    # cos(1,2)=0.9929>=0.99 drops 2; cos(1,3)=0.9724<0.99 but
    # cos(2,3)=0.9982 — 3 is dropped via the surviving-or-not 2 (first-
    # wins is NOT transitive-closure pruning; documented approximation)
    assert got == {1: True, 2: False, 3: False}


def test_semantic_dedup_threshold_boundary_keeps_distant_pairs(spark):
    from mr_dice_spark.operators.similarity import semantic_dedup

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.8, 0.6])],  # cosine 0.8
        "vec_id long, embedding array<double>",
    )
    got = {r["vec_id"]: r["kept"]
           for r in semantic_dedup(df, "vec_id", "embedding",
                                   threshold=0.81, n_centroids=1).collect()}
    assert got == {1: True, 2: True}
    got2 = {r["vec_id"]: r["kept"]
            for r in semantic_dedup(df, "vec_id", "embedding",
                                    threshold=0.80, n_centroids=1).collect()}
    assert got2 == {1: True, 2: False}


def test_embedding_near_dup_empty_input_keeps_id_type(spark):
    from mr_dice_spark.operators.similarity import embedding_near_dup

    df = spark.createDataFrame([], "doc_id string, vec array<double>")
    out = embedding_near_dup(df, "doc_id", "vec")
    assert dict(out.dtypes) == {"id_a": "string", "id_b": "string", "cosine": "double"}


def test_simhash_dedup_hamming_zero(spark):
    from mr_dice_spark.operators.dedup import simhash_dedup

    text = "the quick brown fox jumps over the lazy dog and runs far away today"
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, "completely different words entirely here")],
        "doc_id long, text string",
    )
    pairs = simhash_dedup(df, "doc_id", "text", max_hamming=0).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]


def test_band_keys_rejects_indivisible_bands(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from mr_dice_spark.operators.dedup import band_keys

    with _pytest.raises(ValueError, match="divisible"):
        band_keys([F.lit(1), F.lit(2), F.lit(3)], bands=2)


def test_portable_band_keys_tuple_equality_semantics(spark):
    """The ':'-concat portable band key equals another key iff the
    component tuples are equal (decimal components make ':' unambiguous
    — the property the DuckDB oracle's tuple-equality join relies on);
    same divisibility guard as band_keys."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from mr_dice_spark.operators.dedup import portable_band_keys

    rows = spark.createDataFrame(
        [(1, 12, 3), (2, 12, 3), (3, 1, 23), (4, 123, 0)],
        "id long, a long, b long",
    ).select(
        "id", portable_band_keys([F.col("a"), F.col("b")], bands=1)[0].alias("k")
    )
    got = {r["id"]: r["k"] for r in rows.collect()}
    assert got[1] == got[2] == "12:3"
    # the concat collision that would merge (12,3) with (1,23) or (123,)
    # cannot happen with the ':' separator
    assert len({got[1], got[3], got[4]}) == 3
    with _pytest.raises(ValueError, match="divisible"):
        portable_band_keys([F.lit(1), F.lit(2), F.lit(3)], bands=2)


def test_int8_quantize_stats_zero_vector_and_bounds(spark):
    """Zero vectors report scale 0 / zero error; nonzero vectors have
    max_abs_err <= scale/2 + rounding nudge (half-up code rounding can be
    off by at most half a step) and the max-|x| element reconstructs
    exactly (its code is exactly 127)."""
    from mr_dice_spark.operators.similarity import int8_quantize_stats

    df = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0]), (1, [1.0, -0.5, 0.25]), (2, [-2.0, 2.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    rows = {r["vec_id"]: r for r in int8_quantize_stats(df).collect()}
    assert rows[0]["scale"] == 0.0
    assert rows[0]["max_abs_err"] == 0.0 and rows[0]["mse"] == 0.0
    for i in (1, 2):
        assert rows[i]["scale"] > 0
        assert rows[i]["max_abs_err"] <= rows[i]["scale"] / 2 + 1e-6
        assert rows[i]["mse"] <= rows[i]["max_abs_err"] ** 2 + 1e-9


def test_truncate_rerank_matches_bruteforce_when_coarse_is_full(spark):
    """With coarse_dims = full dim and coarse_k = corpus size the two-stage
    operator degenerates to exact brute force — same ids, same order."""
    import random

    from mr_dice_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_truncate_rerank,
    )

    rng = random.Random(7)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = [rng.gauss(0, 1) for _ in range(8)]
    exact = [
        r["vec_id"] for r in cosine_topk_bruteforce(df, "vec_id", "embedding", q, k=5).collect()
    ]
    two_stage = [
        r["vec_id"]
        for r in cosine_topk_truncate_rerank(
            df, "vec_id", "embedding", q, k=5, coarse_dims=8, coarse_k=60
        ).collect()
    ]
    assert two_stage == exact


def test_truncate_rerank_recall_reasonable_and_validates(spark):
    """Truncated coarse pass at half dims keeps good recall on smooth
    gaussian data, and parameter validation rejects coarse_k < k."""
    import random

    import pytest as _pytest

    from mr_dice_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_truncate_rerank,
    )

    rng = random.Random(11)
    rows = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = [rng.gauss(0, 1) for _ in range(16)]
    exact = {
        r["vec_id"] for r in cosine_topk_bruteforce(df, "vec_id", "embedding", q, k=10).collect()
    }
    approx = {
        r["vec_id"]
        for r in cosine_topk_truncate_rerank(
            df, "vec_id", "embedding", q, k=10, coarse_dims=8, coarse_k=50
        ).collect()
    }
    assert len(exact & approx) >= 6  # >=60% recall at half dims, 25% cand pool
    with _pytest.raises(ValueError):
        cosine_topk_truncate_rerank(df, "vec_id", "embedding", q, k=10, coarse_k=5)


def test_int8_quantize_oracle_parity_on_degenerate_vectors(spark):
    """The golden's SQL oracle and the operator must agree on empty and
    zero vectors too (review finding: the oracle used to propagate a NULL
    scale where the operator coalesces to 0.0 — latent until a fixture
    regeneration introduces a degenerate row)."""
    import duckdb

    from mr_dice_spark.golden_training import INT8_ORACLE
    from mr_dice_spark.operators.similarity import int8_quantize_stats

    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM (VALUES "
            "(0, CAST([] AS FLOAT[]), 0), "
            "(1, CAST([0.0, 0.0] AS FLOAT[]), 0), "
            "(2, CAST([1.0, -0.5] AS FLOAT[]), 0)) t(vec_id, embedding, label)"
        )
        oracle_rows = [tuple(r) for r in con.sql(INT8_ORACLE).fetchall()]
    finally:
        con.close()
    df = spark.createDataFrame(
        [(0, []), (1, [0.0, 0.0]), (2, [1.0, -0.5])],
        "vec_id long, embedding array<float>",
    )
    spark_rows = [
        tuple(r) for r in int8_quantize_stats(df).orderBy("vec_id").collect()
    ]
    assert spark_rows == oracle_rows


def test_truncate_rerank_rejects_short_query(spark):
    """A query vector shorter than coarse_dims must raise, not silently
    NULL-score every row (review finding)."""
    import pytest as _pytest

    from mr_dice_spark.operators.similarity import cosine_topk_truncate_rerank

    df = spark.createDataFrame(
        [(0, [1.0] * 16)], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(ValueError, match="fewer than coarse_dims"):
        cosine_topk_truncate_rerank(df, "vec_id", "embedding", [1.0] * 8, coarse_dims=16)


def test_embedding_outliers_flags_planted_outlier(spark):
    """A planted far-away vector is flagged; inliers are not; a
    single-member group gets NULL z and outlier=false (no sample
    stddev), never a crash."""
    import random

    from mr_dice_spark.operators.similarity import embedding_outliers

    rng = random.Random(5)
    rows = [(i, 0, [1.0 + rng.gauss(0, 0.01) for _ in range(8)]) for i in range(40)]
    rows.append((99, 0, [-1.0] * 8))          # opposite direction: huge dist
    rows.append((100, 1, [0.5] * 8))          # singleton group
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")
    out = {r["vec_id"]: r for r in embedding_outliers(df).collect()}
    assert out[99]["outlier"] and out[99]["z"] > 3
    assert sum(1 for r in out.values() if r["outlier"]) == 1
    assert out[100]["z"] is None and out[100]["outlier"] is False


def test_embedding_outliers_zero_stddev_group_null_z(spark):
    """A multi-member group whose distances are all identical (sd == 0)
    gets NULL z / outlier=false in BOTH engines (ADVICE r3): Spark's
    x/0.0 is NULL but DuckDB's is Inf, so the operator guards sd > 0 and
    the oracle divides by NULLIF(sd, 0)."""
    from mr_dice_spark.operators.similarity import embedding_outliers

    rows = [(i, 7, [1.0] * 8) for i in range(5)]  # identical -> dist 0, sd 0
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")
    out = embedding_outliers(df).collect()
    assert len(out) == 5
    assert all(r["z"] is None and r["outlier"] is False for r in out)


def test_ivf_recall_audit_full_probe_is_exact(spark):
    """With n_probe == n_centroids every list is probed, so IVF equals
    brute force and recall must be exactly 1.0 for every query."""
    import random

    from mr_dice_spark.operators.similarity import ivf_recall_audit

    rng = random.Random(3)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = df.where("vec_id < 3")
    out = ivf_recall_audit(
        df, "vec_id", "embedding", qs, "vec_id", "embedding",
        k=5, n_centroids=4, n_probe=4,
    ).collect()
    assert len(out) == 3
    assert all(r["recall"] == 1.0 and r["n_hits"] == 5 and r["n_ivf"] == 5 for r in out)


def test_ivf_recall_audit_fewer_probes_bounded(spark):
    """With 1 of 4 lists probed, n_ivf <= k and 0 <= n_hits <= n_ivf —
    and a probed list smaller than k yields n_ivf < k, not a crash."""
    import random

    from mr_dice_spark.operators.similarity import ivf_recall_audit

    rng = random.Random(4)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = df.where("vec_id < 2")
    out = ivf_recall_audit(
        df, "vec_id", "embedding", qs, "vec_id", "embedding",
        k=10, n_centroids=4, n_probe=1,
    ).collect()
    assert len(out) == 2
    for r in out:
        assert 0 <= r["n_hits"] <= r["n_ivf"] <= 10
        assert r["recall"] == round(r["n_hits"] / 10 + 1e-9, 6)


def test_bm25_and_rrf_semantics_and_guards(spark):
    """BM25: term frequency and doc length move scores the right way,
    no-match docs are absent; RRF: shared docs outscore single-list
    docs at equal ranks, guards fire."""
    import pytest
    from pyspark.sql import functions as F

    from mr_dice_spark.operators.similarity import rrf_fuse
    from mr_dice_spark.operators.terms import bm25_scores

    df = spark.createDataFrame(
        [
            (1, "spark spark spark rocks"),
            (2, "spark is fine"),
            (3, "nothing relevant here at all whatsoever in this one"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["score"] for r in bm25_scores(df, "doc_id", "text", ["spark"]).collect()}
    assert set(got) == {1, 2}          # no-match and NULL docs absent
    assert got[1] > got[2] > 0         # higher tf wins
    with pytest.raises(ValueError, match="non-empty"):
        bm25_scores(df, "doc_id", "text", [])
    with pytest.raises(ValueError, match="duplicate"):
        bm25_scores(df, "doc_id", "text", ["a", "a"])

    a = spark.createDataFrame([(10, 1), (11, 2)], "doc_id long, rank int")
    b = spark.createDataFrame([(10, 1), (12, 2)], "doc_id long, rank int")
    fused = {r["doc_id"]: (r["rrf_score"], r["n_lists"])
             for r in rrf_fuse([a, b], "doc_id", k=60).collect()}
    assert fused[10] == (2 / 61, 2)
    assert fused[11] == (1 / 62, 1) and fused[12] == (1 / 62, 1)
    assert fused[10][0] > fused[11][0]
    with pytest.raises(ValueError, match="non-empty"):
        rrf_fuse([], "doc_id")
    with pytest.raises(ValueError, match="k must be"):
        rrf_fuse([a], "doc_id", k=0)


def test_mmr_rerank_diversifies_and_guards(spark):
    """A redundant near-copy of the top pick must be deferred in favor
    of a diverse lower-relevance candidate; rank 1 is the pure-relevance
    argmax; k > n degrades to n picks; guards fire."""
    import pytest

    from mr_dice_spark.operators.similarity import mmr_rerank

    rows = [
        # query 7: id 1 most relevant; id 2 is its near-copy; id 3 diverse
        (7, 1, 0.99, [1.0, 0.0, 0.0]),
        (7, 2, 0.98, [0.999, 0.01, 0.0]),
        (7, 3, 0.50, [0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(
        rows, "query_id long, vec_id long, rel double, embedding array<double>"
    )
    got = [
        (r["rank"], r["vec_id"])
        for r in mmr_rerank(df, "query_id", "vec_id", "rel", "embedding",
                            k=3, lam=0.5).orderBy("rank").collect()
    ]
    assert got == [(1, 1), (2, 3), (3, 2)]  # diverse id 3 beats copy id 2
    short = mmr_rerank(df, "query_id", "vec_id", "rel", "embedding",
                       k=10, lam=0.5).collect()
    assert len(short) == 3
    with pytest.raises(ValueError, match="k must be"):
        mmr_rerank(df, "query_id", "vec_id", "rel", "embedding", k=0)
    with pytest.raises(ValueError, match="lam"):
        mmr_rerank(df, "query_id", "vec_id", "rel", "embedding", k=1, lam=1.5)
