"""Connected components over a pair graph — iterative dedup clustering.

The dedup family's first-wins rule (drop b when a~b and a < b) is one
shuffle but not transitive: a~b, b~c with a!~c keeps {a, c}. When true
cluster semantics are required (a training-data dedup that keeps ONE
representative per equivalence class), run connected components over the
candidate-pair graph and keep the minimum id per component.

Algorithm: hash-min label propagation — every vertex repeatedly adopts the
minimum label in its closed neighborhood. Converges in O(graph diameter)
iterations; near-dup graphs are overwhelmingly tiny cliques/chains, so 3-5
iterations close almost everything and ``max_iter`` bounds the worst case.
Each iteration is one join + one aggregate (shuffles on vertex id);
``localCheckpoint`` truncates the lineage so plans don't grow with the
iteration count (the classic iterative-DataFrame pitfall).

This is the non-SQL-expressible class of operator (iterative fixpoint) —
its golden is rows-only by design; correctness is pinned by unit tests on
known topologies and the fixpoint invariant (one label per component).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 10,
) -> DataFrame:
    """(id, component) for every vertex in ``edges``; component = min vertex
    id reachable. Undirected: each edge is used in both directions.

    Raises if labels have not reached the fixpoint within ``max_iter``
    sweeps (graph diameter exceeded the bound): silently returning split
    components would hand downstream dedup several "clusters" for one
    equivalence class with no error anywhere.
    """
    from mr_dice_spark.operators.graph import _node_sized

    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        # materialized once: every iteration joins sym against the
        # current labels, and without this the edge union+distinct
        # shuffle re-executes per action
        .localCheckpoint(eager=True)
    )
    # broadcast/shuffle-hash decision for the node-sized label frame
    # (r12, same _node_sized policy as the graph sweeps): the directed
    # edge-row count bounds the vertex count at one ~10 ms job on the
    # materialized RDD. Below the ceiling the per-sweep neighbor join
    # broadcasts labels and THE EDGE LIST IS NEVER SHUFFLED (the old
    # stat-blind shape fell back to SortMergeJoin and re-exchanged sym
    # every sweep).
    n_bound = sym.count()
    labels = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    changed = 1
    for _ in range(max_iter):
        # candidate labels: own + each neighbor's current label. The own
        # row carries a marker so the aggregate emits old and new labels
        # together — the changed check then reads the checkpointed
        # result instead of re-joining new against old (r12: one
        # node-sized join and its exchanges removed per sweep).
        neighbor_labels = (
            sym.join(_node_sized(labels.withColumnRenamed("id", "v"), n_bound), "v")
            .select(F.col("u").alias("id"), "component")
            .withColumn("__own", F.lit(0))
        )
        agg = (
            labels.withColumn("__own", F.lit(1))
            .unionByName(neighbor_labels)
            .groupBy("id")
            .agg(
                F.min("component").alias("component"),
                # exactly one own-row per id: its component IS the old label
                F.max(F.when(F.col("__own") == 1, F.col("component"))).alias(
                    "__old"
                ),
            )
        ).localCheckpoint(eager=True)
        changed = (
            agg.where(F.col("component") != F.col("__old")).limit(1).count()
        )
        labels = agg.select("id", "component")
        if changed == 0:
            break
    if changed != 0:
        raise ValueError(
            f"connected_components did not converge in max_iter={max_iter} "
            "sweeps (graph diameter exceeds the bound); raise max_iter"
        )
    return labels


def dedup_connected(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    pair_a: str = "id_a",
    pair_b: str = "id_b",
    max_iter: int = 10,
) -> DataFrame:
    """Cluster-aware dedup: keep exactly one row (the min id) per connected
    component of ``pairs``; rows not in any pair survive untouched."""
    comp = connected_components(pairs, pair_a, pair_b, max_iter)
    losers = comp.where(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def dedup_connected_best(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    best_by: str,
    pair_a: str = "id_a",
    pair_b: str = "id_b",
    max_iter: int = 10,
) -> DataFrame:
    """Cluster-aware dedup keeping the BEST row per component — the copy
    with the maximum ``best_by`` value (ties: minimum id) — instead of
    ``dedup_connected``'s min-id representative. This is the production
    near-dup policy when copies differ in quality: keep the longest /
    highest-scoring crawl of a page, not whichever was crawled first.

    Rows in no pair survive untouched (their component is themselves).
    Cost over ``dedup_connected``: one extra per-component window — a
    single hash shuffle on the component label, whose cardinality is the
    cluster count, with the literal rank-1 limit eligible for
    WindowGroupLimit pushdown.
    """
    from pyspark.sql import Window

    comp = connected_components(pairs, pair_a, pair_b, max_iter).withColumnRenamed(
        "id", id_col
    )
    labeled = df.join(comp, id_col, "left").withColumn(
        "__comp", F.coalesce(F.col("component"), F.col(id_col))
    )
    w = Window.partitionBy("__comp").orderBy(
        F.col(best_by).desc(), F.col(id_col).asc()
    )
    return (
        labeled.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__comp", "component")
    )
