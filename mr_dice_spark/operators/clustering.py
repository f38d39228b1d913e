"""Deterministic Lloyd's k-means over embedding columns — the clustering
primitive under semantic dedup (SemDeDup partitions pair work by cluster),
IVF index construction (operators/similarity.py stores cluster-partitioned
vectors), and corpus topic maps.

Beyond-reference operator (the reference has no vector surface at all);
joins the repo's iterative family next to PageRank (operators/graph.py)
with the same verification strategy: a FIXED sweep count, deterministic
initialization, and interim state quantized so the whole loop can be
restated as unrolled SQL CTEs and hash-checked — a convergence loop would
be neither deterministic nor restatable.

Sibling: operators/similarity.kmeans_fit is the SPHERICAL variant
(argmax cosine on unit vectors, centroids re-normalized) tuned for IVF
index construction; this module is the Euclidean Lloyd's with the
quantized-state / unrolled-oracle contract. Same per-sweep scale shape,
different geometry and verification depth — not a duplicate.

Determinism levers (each load-bearing for oracle parity):

* init: the k vectors with the LOWEST ids (a deterministic, restatable
  seeding; k-means++ draws would need an RNG the oracle cannot mirror).
* assignment: argmin of squared L2; ties break on the lowest centroid
  index. Distances are folded left-to-right over the dimensions in both
  engines (Spark ``aggregate`` / DuckDB ``list_sum`` are sequential
  folds), so identical centroid inputs give identical floats.
* update: per-(cluster, dim) mean, nudge-rounded to ``round_digits`` —
  float summation order over a shuffle is nondeterministic, so the raw
  mean can wobble in the last ulp; quantizing the interim state makes
  each sweep's centroids EXACTLY equal across engines and reruns. A
  cluster that loses all members keeps its previous centroid.

Scale shape (per sweep): one narrow assignment projection (centroids are
broadcast as plan literals — k*dim doubles), then one (cluster, dim)-keyed
aggregate via posexplode whose map-side partials reduce to k*dim rows
before the exchange; the driver round-trip per sweep is k*dim floats (the
same bounded-collect altitude as the mixture quotas and PageRank's
convergence probe). No all-pairs anything: total work is O(n * k * dim)
per sweep, embarrassingly parallel, and the 100 TB run is k*dim*sweeps
driver bytes plus linear scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dist_to(vec_col, centroid: list[float]):
    """Squared L2 to a literal centroid, folded left-to-right."""
    lit = F.array(*[F.lit(float(v)) for v in centroid])
    return F.aggregate(
        F.zip_with(vec_col, lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign(df: DataFrame, vec, centroids: list[list[float]]) -> DataFrame:
    """Add ``__cluster`` (argmin distance, lowest index on ties) and
    ``__dist`` columns for the given centroid list."""
    dists = [
        _dist_to(vec, centroids[j]).alias(f"__d{j}")
        for j in range(len(centroids))
    ]
    with_d = df.select("*", *dists)
    best = F.least(*[F.col(f"__d{j}") for j in range(len(centroids))])
    cluster = F.lit(None)
    # first (lowest) index attaining the min wins: chain whens in order
    chain = None
    for j in range(len(centroids)):
        cond = F.col(f"__d{j}") == best
        chain = F.when(cond, F.lit(j)) if chain is None else chain.when(cond, F.lit(j))
    out = with_d.withColumn("__cluster", chain).withColumn("__dist", best)
    return out.drop(*[f"__d{j}" for j in range(len(centroids))])


def kmeans_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    sweeps: int = 2,
    round_digits: int = 4,
) -> DataFrame:
    """Run ``sweeps`` Lloyd iterations and return the final assignment:
    ``(id, cluster, dist)`` with ``dist`` the nudge-rounded squared L2 to
    the final centroid. See module docstring for the determinism
    contract; vectors must share one dimensionality (NULL vectors are
    excluded)."""
    if k < 1:
        raise ValueError(f"kmeans_assign: k must be >= 1, got {k}")
    if sweeps < 0:
        raise ValueError(f"kmeans_assign: sweeps must be >= 0, got {sweeps}")
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = df.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("__id"), vec.alias("__v")
    )
    init_rows = base.orderBy("__id").limit(k).collect()
    if len(init_rows) < k:
        raise ValueError(
            f"kmeans_assign: need at least k={k} non-null vectors, "
            f"got {len(init_rows)}"
        )
    centroids = [list(r["__v"]) for r in init_rows]
    dim = len(centroids[0])
    for _ in range(sweeps):
        assigned = _assign(base, F.col("__v"), centroids)
        means = (
            assigned.select("__cluster", F.posexplode("__v").alias("__i", "__x"))
            .groupBy("__cluster", "__i")
            .agg(
                F.round(F.avg("__x") + F.lit(1e-9), round_digits).alias("__m")
            )
            .collect()
        )
        upd: dict[int, list[float]] = {}
        for r in means:
            upd.setdefault(r["__cluster"], [0.0] * dim)[r["__i"]] = r["__m"]
        # empty cluster: keep its previous centroid
        centroids = [upd.get(j, centroids[j]) for j in range(k)]
    final = _assign(base, F.col("__v"), centroids)
    return final.select(
        F.col("__id").alias(id_col),
        F.col("__cluster").alias("cluster"),
        F.round(F.col("__dist") + F.lit(1e-9), 6).alias("dist"),
    )
