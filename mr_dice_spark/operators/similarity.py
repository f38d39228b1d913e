"""Similarity search over embedding columns (north-star operator).

Brute-force cosine top-k is the exact baseline; the LSH (random hyperplane)
variant is the 100 TB path: signatures prune the candidate space, exact
cosine reranks. Everything is built from array expressions
(zip_with/aggregate) so the dot products run inside whole-stage codegen —
no Python, no UDF. The reference's nearest analogue is the blocked
StructureMatcher near-dup join (SURVEY.md §2.7 D4): block cheaply, verify
exactly on the survivors.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mr_dice_spark.operators.scale import fan_out


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk_bruteforce(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine against a literal query vector.

    One scan, no shuffle beyond the global top-k (TakeOrderedAndProject);
    this is the correct plan shape even at scale — the k results are tiny.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        cosine(F.col(vec_col).cast("array<double>"), q).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def signature_bits(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: bit i = sign(vec . plane_i). Returns a
    long (n_planes <= 63)."""
    bits = [
        F.when(
            dot(vec, F.array(*[F.lit(float(x)) for x in p])) >= 0,
            F.shiftleft(F.lit(1).cast("long"), i),
        ).otherwise(F.lit(0).cast("long"))
        for i, p in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def cosine_topk_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 16,
    max_hamming: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: random-hyperplane bucket filter + exact rerank.

    Candidates are rows whose signature is within ``max_hamming`` bits of
    the query's (hamming on signatures approximates angle). The signature
    filter is a scan-side predicate — at scale, signatures would be a stored
    column (computed at ingest) so the filter prunes before any vector math.
    """
    dim = len(query_vec)
    planes = _hyperplanes(dim, n_planes, seed)
    q_sig = 0
    for i, p in enumerate(planes):
        if sum(x * y for x, y in zip(query_vec, p)) >= 0:
            q_sig |= 1 << i
    vec = F.col(vec_col).cast("array<double>")
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cand = df.withColumn("__sig", signature_bits(vec, planes)).where(
        F.bit_count(F.col("__sig").bitwiseXOR(F.lit(q_sig).cast("long"))) <= max_hamming
    )
    return (
        cand.select(F.col(id_col), cosine(vec, q).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def embedding_near_dup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_planes: int = 16,
    band_bits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >= t).

    LSH banding on hyperplane signatures proposes candidates (pairs agreeing
    on at least one band of ``band_bits`` signature bits); exact cosine
    verifies. Dimension is read from the first row.
    """
    first = df.select(F.size(vec_col)).first()
    if first is None:
        return df.sparkSession.createDataFrame([], f"id_a long, id_b long, cosine double")
    dim = first[0]
    planes = _hyperplanes(dim, n_planes, seed)
    vec = F.col(vec_col).cast("array<double>")
    sig = fan_out(df.select(F.col(id_col).alias("__id"), vec.alias("__v"))).withColumn(
        "__sig", signature_bits(F.col("__v"), planes)
    )
    n_bands = max(1, n_planes // band_bits)
    keyed = sig.select(
        "__id",
        "__v",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("__sig"), b * band_bits)
                    .bitwiseAND(F.lit((1 << band_bits) - 1).cast("long"))
                    for b in range(n_bands)
                ]
            )
        ).alias("__band", "__key"),
    )
    pairs = (
        keyed.alias("x")
        .join(
            keyed.alias("y"),
            (F.col("x.__band") == F.col("y.__band"))
            & (F.col("x.__key") == F.col("y.__key"))
            & (F.col("x.__id") < F.col("y.__id")),
        )
        .select(
            F.col("x.__id").alias("id_a"),
            F.col("y.__id").alias("id_b"),
            F.col("x.__v").alias("__va"),
            F.col("y.__v").alias("__vb"),
        )
        .distinct()
    )
    return pairs.select(
        "id_a", "id_b", cosine(F.col("__va"), F.col("__vb")).alias("cosine")
    ).where(F.col("cosine") >= threshold)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN index
# ---------------------------------------------------------------------------

def _argmax_cluster(vec: Column, centroids: list[tuple[int, list[float]]]) -> Column:
    """Cluster id of the most-cosine-similar broadcast centroid (ties ->
    lowest id). Centroids are unit-normalized driver-side so the score
    dot(v, unit_c) is proportional to the true cosine (row norm is a
    positive per-row constant — argmax-invariant, so not computed).
    Unrolled struct-max over literal centroid arrays: stays in whole-stage
    codegen, no UDF, no shuffle."""
    best = F.greatest(
        *[
            F.struct(
                dot(vec, F.array(*[F.lit(x) for x in _unit(c)])).alias("sim"),
                F.lit(-ci).alias("neg_cluster"),
            )
            for ci, c in centroids
        ]
    )
    return -best["neg_cluster"]


def kmeans_fit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 16,
    n_iter: int = 5,
) -> list[tuple[int, list[float]]]:
    """Spherical k-means (Lloyd's) over an embedding column; returns
    ``[(cluster_id, unit_centroid)]`` for :func:`ivf_assign`.

    Deterministic init (first ``k`` vectors by id). Each sweep is one
    broadcast-argmax assignment pass + one per-dimension mean: the vectors
    are unit-normalized per row, posexploded to (cluster, dim, component)
    and hash-aggregated, so the shuffle carries k × dim partial sums per
    map partition — never the vectors. The spherical update
    unit(sum(v/|v|)) maximizes mean assigned cosine, making it
    non-decreasing sweep to sweep (summing RAW vectors would let one
    large-norm vector dominate a cluster and break the guarantee). Empty
    clusters keep their previous centroid. Driver state is k × dim floats
    per sweep — trivial at any corpus size; cost is n_iter × (one scan +
    one k×dim-wide shuffle).
    """
    rows = (
        df.select(F.col(id_col), F.col(vec_col).cast("array<double>"))
        .orderBy(F.col(id_col))
        .limit(k)
        .collect()
    )
    centroids = [(i, _unit([float(x) for x in r[1]])) for i, r in enumerate(rows)]
    vec = F.col(vec_col).cast("array<double>")
    for _ in range(n_iter):
        assigned = df.select(
            _argmax_cluster(vec, centroids).alias("__cluster"),
            vec.alias("__v"),
            norm(vec).alias("__norm"),
        )
        sums = (
            assigned.select(
                "__cluster", "__norm", F.posexplode("__v").alias("__dim", "__x")
            )
            .groupBy("__cluster", "__dim")
            # zero-norm vectors contribute 0 to the mean direction; a plain
            # division would yield NULL (Spark divide-by-zero), NULL-poison
            # the sum for all-zero clusters, and crash _unit with None
            .agg(
                F.sum(
                    F.when(F.col("__norm") > 0, F.col("__x") / F.col("__norm"))
                    .otherwise(F.lit(0.0))
                ).alias("__s")
            )
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in sums:
            by_cluster.setdefault(r["__cluster"], {})[r["__dim"]] = r["__s"]
        new = []
        for ci, old in centroids:
            dims = by_cluster.get(ci)
            if dims:
                mean = [dims.get(d, 0.0) for d in range(len(old))]
                new.append((ci, _unit(mean)))
            else:
                new.append((ci, old))  # empty cluster: keep previous centroid
        centroids = new
    return centroids


def _unit(v: list[float]) -> list[float]:
    n = math.sqrt(sum(x * x for x in v)) or 1.0
    return [x / n for x in v]


def ivf_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int = 16,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Partition vectors into ``n_centroids`` inverted lists.

    Default centroids are the first ``n_centroids`` vectors by id —
    deterministic "sampled init"; pass :func:`kmeans_fit` output for
    trained lists (tighter clusters -> better probe recall). Returns
    (assigned DataFrame with a ``__cluster`` column, centroid list).

    Scale shape: the centroid table is tiny and broadcast; assignment is one
    narrow pass (argmax over n_centroids dot products per row). At ingest
    you'd persist the output partitioned/bucketed BY ``__cluster`` so probe
    queries prune whole files — the batch analogue of an IVF index.
    """
    if centroids is None:
        rows = (
            df.select(F.col(id_col), F.col(vec_col).cast("array<double>"))
            .orderBy(F.col(id_col))
            .limit(n_centroids)
            .collect()
        )
        centroids = [(i, [float(x) for x in r[1]]) for i, r in enumerate(rows)]
    vec = F.col(vec_col).cast("array<double>")
    assigned = df.withColumn("__cluster", _argmax_cluster(vec, centroids))
    return assigned, centroids


def cosine_topk_ivf(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    train_iters: int = 0,
) -> DataFrame:
    """Approximate top-k: probe the ``n_probe`` inverted lists whose
    centroids are most similar to the query, exact-cosine rerank inside.

    ``train_iters > 0`` runs that many spherical k-means sweeps first
    (:func:`kmeans_fit`) instead of the raw sampled-init lists.

    With cluster-partitioned storage the probe filter becomes partition
    pruning (reads n_probe/n_centroids of the data); here it is a scan-side
    predicate on the assignment column.
    """
    trained = (
        kmeans_fit(df, id_col, vec_col, k=n_centroids, n_iter=train_iters)
        if train_iters > 0
        else None
    )
    assigned, centroids = ivf_assign(df, id_col, vec_col, n_centroids, centroids=trained)
    qn = math.sqrt(sum(x * x for x in query_vec)) or 1.0

    def csim(c: list[float]) -> float:
        cn = math.sqrt(sum(x * x for x in c)) or 1.0
        return sum(a * b for a, b in zip(query_vec, c)) / (qn * cn)

    probes = [ci for ci, _ in sorted(centroids, key=lambda t: (-csim(t[1]), t[0]))[:n_probe]]
    vec = F.col(vec_col).cast("array<double>")
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        assigned.where(F.col("__cluster").isin(probes))
        .select(F.col(id_col), cosine(vec, q).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )
