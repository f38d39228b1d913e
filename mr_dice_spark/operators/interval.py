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
