"""Sessionization (beyond-reference; motivated by the events table and the
streaming extension, SURVEY.md §2.10).

Gap-based sessions: a new session starts when the gap since the previous
event of the same key is >= ``gap`` (matching Structured Streaming's
``session_window`` close semantics, where an event at exactly start+gap
opens a new window).

Batch implementation is gaps-and-islands — lag + running sum — one shuffle
on the key; the same semantics are available incrementally via
``mr_dice_spark.streaming`` with session_window + watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Assign a per-key session index (0-based) to every row."""
    order = [F.col(ts_col).asc()] + ([F.col(tiebreak_col).asc()] if tiebreak_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    gap = F.col(ts_col).cast("double") - F.lag(F.col(ts_col).cast("double")).over(w)
    new_session = F.when(gap.isNull() | (gap < gap_seconds), 0).otherwise(1)
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )


def session_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-session aggregate: (key, session_id, n_events, start/end epoch ms).

    Epoch millis (not raw timestamps) so results hash identically across
    engines with different timestamp precisions.
    """
    s = sessionize(df, key_col, ts_col, gap_seconds, tiebreak_col)
    return s.groupBy(key_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.unix_millis(F.min(ts_col)).alias("start_ms"),
        F.unix_millis(F.max(ts_col)).alias("end_ms"),
    )
