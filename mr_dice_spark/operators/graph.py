"""Iterative graph ranking: PageRank over a DataFrame edge list.

Beyond-reference operator — link-authority signals (PageRank / harmonic
centrality over the crawl's host graph) are a standard crawl-curation
quality input (the Common Crawl ranking family); the nearest reference
analogue is nothing — it has no iterative graph surface. Together with
``operators.components`` this pins the repo's iterative-DataFrame
pattern: bounded sweeps, one join + one aggregate per sweep, eager
``localCheckpoint`` so plans don't grow with the iteration count.

Scale shape per sweep: the contribution join shuffles on the source key
and the aggregate on the destination key — the two exchanges any
message-passing step costs; ranks and degrees are node-sized (orders of
magnitude below the edge list). A FIXED iteration count (default 5)
rather than a convergence test keeps the result deterministic and
SQL-restatable (the oracle unrolls the same sweeps), which is how the
golden hash-checks an iterative float algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 5,
    damping: float = 0.85,
    undirected: bool = True,
) -> DataFrame:
    """PageRank after exactly ``n_iter`` sweeps: ``(node, rank)`` for
    every node appearing in ``edges``; ``rank_0 = 1/N`` and
    ``rank_{t+1}(v) = (1-d)/N + d * sum_{u->v} rank_t(u)/outdeg(u)``.
    ``undirected=True`` (default) walks each edge both ways. Directed
    graphs may have rank SINKS (no in-edges): those nodes hold the
    teleport term ``(1-d)/N``; dangling mass (out-degree-0 nodes) is
    dropped, not redistributed — acceptable for authority ranking,
    documented so nobody mistakes this for the stochastic-matrix
    formulation.

    ``N`` (node count) is one bounded driver scalar; everything else is
    joins/aggregates (see module docstring).
    """
    if n_iter < 0:
        raise ValueError(f"n_iter must be >= 0: {n_iter}")
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1): {damping}")
    e = edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d")).distinct()
    if undirected:
        e = e.union(
            e.select(F.col("__d").alias("__s"), F.col("__s").alias("__d"))
        ).distinct()
    e = e.localCheckpoint(eager=True)  # every sweep re-reads the edge list
    deg = e.groupBy("__s").agg(F.count(F.lit(1)).alias("__deg"))
    # degree is STATIC across sweeps: merge it into the edge list once
    # (and materialize) instead of paying a second edge-sized join per
    # sweep — measured 3.5x -> ~2x at the 10x probe
    e = e.join(deg, "__s").localCheckpoint(eager=True)
    nodes = e.select("__s").union(e.select("__d")).distinct()
    n = nodes.count()
    if n == 0:
        # schema must match the non-empty path (node typed after the edge
        # column) or a union with a previous snapshot breaks only on the
        # empty day
        return nodes.select(
            F.col("__s").alias("node"), F.lit(None).cast("double").alias("rank")
        )
    teleport = (1.0 - damping) / n
    ranks = nodes.withColumn("__r", F.lit(1.0 / n))
    for _ in range(n_iter):
        contrib = (
            e.join(ranks, "__s")
            .groupBy("__d")
            .agg(F.sum(F.col("__r") / F.col("__deg")).alias("__c"))
        )
        ranks = (
            nodes.join(contrib, nodes["__s"] == contrib["__d"], "left")
            .select(
                nodes["__s"],
                (
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce(F.col("__c"), F.lit(0.0))
                ).alias("__r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(F.col("__s").alias("node"), F.col("__r").alias("rank"))
