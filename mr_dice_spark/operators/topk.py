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
