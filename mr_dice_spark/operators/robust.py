"""Robust value statistics: percentile winsorization and MAD-based
outlier flags — the heavy-tail-safe complements of the mean/stddev
z-score screen (operators/similarity.embedding_outliers), for metric
columns where a single corrupted reading would poison the mean itself.

Cross-engine determinism: both operators QUANTIZE their interim
statistics (quantiles / median / MAD nudge-rounded to 6 places) before
any comparison or arithmetic that depends on them — the kmeans-centroid
rule: an exact percentile interpolated in a different expression order
differs in the last ulp between engines, and an unquantized boundary
would flip clip/flag decisions. With the statistics pinned, every
downstream value is a pure function of (row value, quantized stats) and
restates exactly in SQL.

Scale shape: each operator is per-group aggregates (exact percentiles —
one shuffle of the group keys; Spark's percentile is a typed
accumulator, not a full sort) broadcast back onto the rows as a
dimension join — rows never shuffle twice, and the stats dimension has
one row per group. For quantile sketches at extreme group cardinality
see operators/sketch.kll_* (mergeable, approximate); these operators
are the exact small-group-count regime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# the classic consistency constant: MAD * 1/Phi^-1(3/4) estimates sigma
# for normal data, so robust_z is comparable to an ordinary z-score
_MAD_K = 0.6745


def winsorize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo_p: float = 0.05,
    hi_p: float = 0.95,
) -> DataFrame:
    """Clip ``value_col`` to its per-group [lo_p, hi_p] exact percentile
    band: adds ``value_wins`` (the clipped value, nudge-rounded to 6),
    ``clipped_low``/``clipped_high`` booleans. NULL values pass through
    unclipped (flags false) — absence is not an outlier."""
    if not 0.0 <= lo_p < hi_p <= 1.0:
        raise ValueError(f"winsorize: need 0 <= lo_p < hi_p <= 1, got {lo_p}, {hi_p}")
    stats = df.groupBy(group_col).agg(
        F.round(F.percentile(value_col, lo_p) + F.lit(1e-9), 6).alias("__lo"),
        F.round(F.percentile(value_col, hi_p) + F.lit(1e-9), 6).alias("__hi"),
    )
    v = F.col(value_col)
    out = df.join(F.broadcast(stats), group_col)
    return out.select(
        *df.columns,
        F.when(v.isNull(), F.lit(None).cast("double"))
        .otherwise(
            F.round(F.least(F.greatest(v, F.col("__lo")), F.col("__hi")) + F.lit(1e-9), 6)
        )
        .alias("value_wins"),
        F.coalesce(v < F.col("__lo"), F.lit(False)).alias("clipped_low"),
        F.coalesce(v > F.col("__hi"), F.lit(False)).alias("clipped_high"),
    )


def weighted_percentile(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    p: float = 0.5,
) -> DataFrame:
    """Per-group weighted lower percentile: the smallest value whose
    cumulative weight reaches ``p`` of the group's total — the
    quantity-weighted median (p=0.5) and friends. ``percentile()``
    answers "the median ROW"; this answers "the median UNIT" (the price
    at which half the QUANTITY trades, the quality score of the median
    TOKEN) — the distinction that matters whenever row sizes vary by
    orders of magnitude, which is every document corpus.

    The lower (no-interpolation) convention keeps the result an actual
    data value. Cross-engine contract: per-(group, value) weight cells
    are quantized (nudge-round 6), the cumulative weight is an ordered
    window sum over them (identical accumulation order both engines),
    and the group total is read as the LAST cumulative value from the
    same window — never a separately-summed total whose addition order
    could differ in the last ulp from the running sum it gates. Rows
    with NULL or non-positive weight are excluded (a zero-weight row
    must not become the answer).

    Scale shape: one (group, value) hash aggregate with map-side
    combine, one group-partitioned cumulative window over the DISTINCT
    values, one min-reduce. Returns ``(group, n_rows, total_weight,
    wpct)``; NULL wpct for groups with zero total weight."""
    if not 0.0 < p <= 1.0:
        raise ValueError(f"weighted_percentile: need 0 < p <= 1, got {p}")
    v = F.col(value_col).cast("double")
    w = F.col(weight_col).cast("double")
    cells = (
        df.where(
            F.col(group_col).isNotNull() & v.isNotNull() & w.isNotNull() & (w > 0)
        )
        .groupBy(F.col(group_col).alias("__g"), v.alias("__v"))
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.round(F.sum(w) + F.lit(1e-9), 6).alias("__w"),
        )
    )
    run = (
        Window.partitionBy("__g")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cells.select(
        "__g", "__v", "__n", F.sum("__w").over(run).alias("__cw")
    )
    # weights are strictly positive, so the running sum is monotone and
    # its group MAX is bit-identical to its last value — the total that
    # gates the comparison is read from the SAME accumulation, never a
    # separately-ordered sum whose addition order could differ
    gated = cum.select(
        "__g", "__v", "__n", "__cw",
        F.max("__cw").over(Window.partitionBy("__g")).alias("__tw"),
    )
    return (
        gated.groupBy("__g")
        .agg(
            F.sum("__n").alias("__rows"),
            F.max("__tw").alias("__total"),
            F.min(
                F.when(
                    F.col("__cw") >= F.lit(float(p)) * F.col("__tw"), F.col("__v")
                )
            ).alias("__p"),
        )
        .select(
            F.col("__g").alias(group_col),
            F.col("__rows").cast("long").alias("n_rows"),
            F.round(F.col("__total") + F.lit(1e-9), 6).alias("total_weight"),
            F.col("__p").alias("wpct"),
        )
    )


def mad_outlier_flags(
    df: DataFrame,
    group_col: str,
    value_col: str,
    threshold: float = 3.5,
) -> DataFrame:
    """Median/MAD outlier screen per group: adds ``robust_z`` =
    0.6745*(x - median)/MAD (nudge-rounded to 4; NULL when MAD
    quantizes to 0 — a constant-majority group has no robust spread, the
    same fail-closed rule as the sd=0 z-score guard) and ``outlier`` =
    |robust_z| > threshold (false when NULL). Two passes: the group
    median, then the median absolute deviation around it — both exact
    percentiles, both quantized before use."""
    med = df.groupBy(group_col).agg(
        F.round(F.percentile(value_col, 0.5) + F.lit(1e-9), 6).alias("__med")
    )
    with_med = df.join(F.broadcast(med), group_col)
    mad = (
        with_med.where(F.col(value_col).isNotNull())
        .groupBy(group_col)
        .agg(
            F.round(
                F.percentile(F.abs(F.col(value_col) - F.col("__med")), 0.5)
                + F.lit(1e-9),
                6,
            ).alias("__mad")
        )
    )
    v = F.col(value_col)
    z = F.when(
        F.col("__mad") > 0,
        F.round(
            F.lit(_MAD_K) * (v - F.col("__med")) / F.col("__mad") + F.lit(1e-9), 4
        ),
    )
    out = with_med.join(F.broadcast(mad), group_col)
    return out.select(
        *df.columns,
        z.alias("robust_z"),
        F.coalesce(F.abs(z) > threshold, F.lit(False)).alias("outlier"),
    )
