"""Per-group top-k / result-cap operators (SURVEY.md §2.6 O1-O4, O6).

The reference caps results per provider (``max_results_per_provider``,
Optimade_Server/server.py:114) and truncates final output to 30
(MAX_RETURNED_STRUCTS). Per-group limits have no single Spark builtin; the
canonical distributed form is a rank-filter window, which AQE executes as one
shuffle with partial top-k pushdown (WindowGroupLimit in Spark 3.5+ rewrites
rank<=k filters into per-partition limits before the shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def per_group_topk(
    df: DataFrame,
    group_cols: list[str],
    order_by: list,
    k: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Keep the top ``k`` rows of each group under a deterministic order.

    ``order_by`` should be a total order (include a unique tiebreaker) so
    results are reproducible across engines and runs.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    ranked = df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") <= k)
    if rank_col:
        return ranked.withColumnRenamed("__rn", rank_col)
    return ranked.drop("__rn")


def skyline_2d(
    df: DataFrame,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """2-D skyline (Pareto frontier, both dimensions MINIMIZED): rows no
    other row strictly dominates — q dominates p iff q.a <= p.a and
    q.b <= p.b with at least one strict. The multi-criteria shortlist
    operator (cheapest-AND-smallest part, best quality per token cost)
    classic OLAP engines ship and Spark lacks.

    NOT the naive O(n^2) dominance anti-join (a non-equi NOT EXISTS
    plans as BNLJ): per-a minima first (one hash aggregate — survivors
    of same-a dominance are exactly the rows at their a-group's minimum
    b), then a running strict-predecessor minimum over the DISTINCT-a
    relation ordered by a (cross-a dominance: survive iff every
    strictly-smaller a has a strictly-larger min-b), joined back
    broadcast. Duplicate (a, b) points tie and BOTH survive (neither
    strictly dominates). NULL in either dimension excludes the row
    (incomparable). Cost: one corpus aggregate + a window over the
    distinct-a table (bounded by the a-domain, NOT the corpus — the
    one global-sort surface, documented) + one broadcast join back.

    Returns the input rows (all columns) that form the frontier.
    """
    a, b = F.col(a_col), F.col(b_col)
    base = df.where(a.isNotNull() & b.isNotNull())
    mb = base.groupBy(a_col).agg(F.min(b).alias("__mb"))
    w = (
        Window.orderBy(F.col(a_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier_a = mb.withColumn("__m1", F.min("__mb").over(w)).where(
        F.col("__m1").isNull() | (F.col("__m1") > F.col("__mb"))
    )
    return (
        base.join(F.broadcast(frontier_a), a_col)
        .where(b == F.col("__mb"))
        .drop("__mb", "__m1")
    )
