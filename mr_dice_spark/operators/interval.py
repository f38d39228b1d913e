"""Interval (range) join: points matched to containing time intervals.

Spark has no native range join; the naive formulation
``p.ts BETWEEN i.start AND i.end`` plans as BroadcastNestedLoopJoin (or a
cartesian) — quadratic and unusable at scale. This operator uses the
standard **bin bucketing** strategy: time is discretized into fixed
buckets, each interval is exploded onto every bucket it covers, each point
carries its single bucket, and the join becomes an equi-join on bucket
(plus any explicit keys) with the exact BETWEEN as a residual filter.

Cost: shuffle of points + intervals × (avg interval span / bucket width).
Pick ``bucket_seconds`` near the typical interval length so the explode
factor stays ~1-2. A point lands in exactly one bucket, so a matching
(point, interval) pair joins exactly once — no post-dedup needed.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    on: Optional[list[str]] = None,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point <= end`` (and equal ``on`` keys, if given).

    Column names of the two inputs must be disjoint apart from ``on``.
    ``how`` may be ``inner`` or ``left`` (left keeps unmatched points with
    NULL interval columns).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"interval_join supports inner/left, got {how!r}")
    on = on or []
    clash = (set(points.columns) & set(intervals.columns)) - set(on)
    if clash:
        raise ValueError(f"ambiguous columns {sorted(clash)}; rename one side")

    b = F.lit(bucket_seconds)
    p = points.withColumn("__pb", F.floor(F.unix_timestamp(F.col(point_ts)) / b))
    startb = F.floor(F.unix_timestamp(F.col(start_ts)) / b)
    endb = F.floor(F.unix_timestamp(F.col(end_ts)) / b)
    # inverted intervals (end < start, corrupt rows) must bucket to NOTHING:
    # F.sequence(start, stop) with start > stop counts DOWN by default, so a
    # single swapped-timestamp row would explode into a huge descending
    # bucket range that the residual then discards at full shuffle cost
    seq = F.when(endb >= startb, F.sequence(startb, endb)).otherwise(
        F.array().cast("array<bigint>")
    )
    i = intervals.withColumn("__ib", F.explode_outer(seq))
    # the interval side's on-keys are renamed, not dropped: the join
    # condition must reference attributes present in the join child
    for k in on:
        i = i.withColumnRenamed(k, f"__on_{k}")
    cond = F.col("__pb") == F.col("__ib")
    for k in on:
        cond = cond & (F.col(k) == F.col(f"__on_{k}"))
    residual = (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) <= F.col(end_ts))

    # left keeps every point once even with no matching interval: a left
    # join with composite condition yields exactly one null-extended row
    # per unmatched point
    out = p.join(i, cond & residual, how)
    return out.drop("__pb", "__ib", *[f"__on_{k}" for k in on])


def interval_coverage(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Per-key union of overlapping/touching intervals: merged-island
    count, total covered length, raw length and the overlap ratio — the
    gaps-and-islands union that answers "how much time was actually
    covered" when raw durations double-count (user activity windows,
    audio/video segment coverage, sensor uptime). Intervals that touch
    (next.start == prev.end) merge; zero-length intervals count toward
    islands but add no length; rows with end < start are rejected
    fail-fast (silently swapping ends hides upstream bugs).

    Classic single-window derivation: a row starts a new island iff its
    start exceeds the running max of all previous ends (one
    key-partitioned ordered window), the island id is the running sum
    of those flags (same window), and the rest is two hash aggregates.
    All comparisons are on the raw input values — no derived floats —
    so the island structure is cross-engine exact. Returns
    ``(key, n_intervals, n_islands, covered, raw_length,
    overlap_ratio)`` with covered/raw in the column's native units and
    the ratio nudge-rounded."""
    from pyspark.sql import Window

    s, e = F.col(start_col).cast("double"), F.col(end_col).cast("double")
    base = df.where(
        F.col(key_col).isNotNull() & s.isNotNull() & e.isNotNull()
    ).select(F.col(key_col).alias("__k"), s.alias("__s"), e.alias("__e"))
    bad = base.where(F.col("__e") < F.col("__s")).limit(1).collect()
    if bad:
        r = bad[0]
        raise ValueError(
            f"interval_coverage: end < start for key {r['__k']!r} "
            f"({r['__e']} < {r['__s']}) — fix the extraction instead of "
            "silently swapping"
        )
    w = Window.partitionBy("__k").orderBy("__s", "__e").rowsBetween(
        Window.unboundedPreceding, -1
    )
    run = Window.partitionBy("__k").orderBy("__s", "__e").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    flagged = base.select(
        "__k", "__s", "__e",
        F.when(
            F.col("__s") > F.coalesce(F.max("__e").over(w), F.lit(float("-inf"))),
            1,
        ).otherwise(0).alias("__new"),
    )
    islands = flagged.select(
        "__k", "__s", "__e", F.sum("__new").over(run).alias("__island")
    )
    per_island = islands.groupBy("__k", "__island").agg(
        F.count(F.lit(1)).alias("__n"),
        F.min("__s").alias("__lo"),
        F.max("__e").alias("__hi"),
        F.sum(F.col("__e") - F.col("__s")).alias("__rawi"),
    )
    return (
        per_island.groupBy("__k")
        .agg(
            F.sum("__n").alias("__rows"),
            F.count(F.lit(1)).alias("n_islands"),
            F.sum(F.col("__hi") - F.col("__lo")).alias("__cov"),
            F.sum("__rawi").alias("__raw"),
        )
        .select(
            F.col("__k").alias(key_col),
            F.col("__rows").cast("long").alias("n_intervals"),
            F.col("n_islands").cast("long").alias("n_islands"),
            F.round(F.col("__cov") + F.lit(1e-9), 6).alias("covered"),
            F.round(F.col("__raw") + F.lit(1e-9), 6).alias("raw_length"),
            F.round(
                F.try_divide(F.col("__cov"), F.col("__raw")) + F.lit(1e-9), 6
            ).alias("overlap_ratio"),
        )
    )
