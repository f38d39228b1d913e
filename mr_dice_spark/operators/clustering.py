"""Deterministic Lloyd's k-means over embedding columns — the clustering
primitive under semantic dedup (SemDeDup partitions pair work by cluster),
IVF index construction (operators/similarity.py stores cluster-partitioned
vectors), and corpus topic maps. Also threshold single-linkage clustering
(cosine_pairs_exact + single_linkage_clusters): the flat agglomerative
cut, computed as connected components of the epsilon-graph instead of a
sequential merge loop.

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


def cosine_pairs_exact(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    round_digits: int = 6,
    max_rows: int = 50_000,
) -> DataFrame:
    """Exact epsilon-graph edges: every (id_a < id_b) pair whose cosine
    similarity (nudge-rounded to ``round_digits`` — the kmeans
    quantized-state idiom, so a threshold compare lands identically in
    Spark and the SQL oracle) is >= ``threshold``.

    This is deliberately the ALL-PAIRS exact path — a broadcast
    nested-loop self-join, O(n²·dim) — for corpora (or pre-blocked
    groups) small enough to afford exactness; it plays the same role as
    SemDeDup's within-cluster pair pass (operators/similarity.py:226).
    Dense-vector exact cosine join has no subquadratic blocking with
    exact recall (Bayardo-style prefix filtering prunes nothing when
    every vector populates every dimension), so instead of silently
    running quadratic on an oversized input the operator FAILS FAST:
    ``max_rows`` is a circuit breaker (one cheap count; the same policy
    as edit_distance_join's max_block_rows). At 100 TB, generate
    candidate edges with the banded family instead (embedding near-dup
    LSH / IVF buckets) and feed them to single_linkage_clusters
    directly."""
    from mr_dice_spark.operators.similarity import cosine

    if max_rows is not None:
        n = df.limit(int(max_rows) + 1).count()
        if n > int(max_rows):
            raise ValueError(
                f"cosine_pairs_exact: input exceeds max_rows={max_rows} "
                "(all-pairs would run quadratic); block the corpus first "
                "or feed banded LSH/IVF candidate pairs to "
                "single_linkage_clusters (max_rows=None overrides)"
            )
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).cast("array<double>").alias("__va"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).cast("array<double>").alias("__vb"),
    )
    sim = F.round(cosine(F.col("__va"), F.col("__vb")) + F.lit(1e-9), round_digits)
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def single_linkage_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    pair_a: str = "id_a",
    pair_b: str = "id_b",
    max_iter: int = 10,
) -> DataFrame:
    """Threshold single-linkage clustering (flat agglomerative at a fixed
    linkage distance): vertices = rows of ``df``, edges = ``pairs``,
    clusters = connected components of the epsilon-graph — exactly the
    dendrogram cut of single-linkage agglomerative clustering at the
    pairing threshold, computed without any sequential merge loop.
    Returns every input row with ``(cluster, cluster_size)``: cluster =
    min reachable id, singletons cluster with themselves.

    Scale shape: edge generation is the caller's contract (exact within
    blocks via cosine_pairs_exact, banded LSH/IVF candidates at corpus
    scale); components run hash-min label propagation (O(diameter)
    joins, operators/components.py); the size attach is ONE
    cluster-keyed count window — cluster cardinality grows with the
    corpus, so a broadcast of the size dim would be the
    per-group-broadcast trap (see length_bucketed_batches)."""
    from pyspark.sql import Window

    from mr_dice_spark.operators.components import connected_components

    comp = connected_components(pairs, pair_a, pair_b, max_iter).withColumnRenamed(
        "id", id_col
    )
    labeled = df.join(comp, id_col, "left").withColumn(
        "cluster", F.coalesce(F.col("component"), F.col(id_col))
    ).drop("component")
    return labeled.withColumn(
        "cluster_size", F.count(F.lit(1)).over(Window.partitionBy("cluster"))
    )
