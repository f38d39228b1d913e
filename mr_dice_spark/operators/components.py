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
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        # materialized once: every iteration joins sym twice (neighbor
        # labels + the changed check actions), and without this the edge
        # union+distinct shuffle re-executes per action
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    changed = 1
    for _ in range(max_iter):
        # candidate labels: own + each neighbor's current label
        neighbor_labels = (
            sym.join(labels.withColumnRenamed("id", "v"), "v")
            .select(F.col("u").alias("id"), "component")
        )
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        ).localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
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
