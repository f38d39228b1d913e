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


def session_path_counts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    gap_seconds: int,
    max_steps: int = 5,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Path analysis: the count of each distinct session journey — the
    first ``max_steps`` event types of every session joined with '>'
    (view>click>purchase...), the product-analytics complement of the
    funnel (funnel asks "did the target sequence happen"; paths ask
    "what sequences actually happen"). Returns (path, n_sessions).

    Determinism: steps order by (microsecond timestamp, tiebreak)
    inside a sorted struct array, so equal-timestamp events order
    identically on any engine or partitioning.

    Scale shape: sessionize's one key-ordered window exchange, then ONE
    (key, session) aggregate whose per-session array is truncated at
    max_steps IN-ROW before the path string exists, and one path-keyed
    count — output is bounded by distinct paths (alphabet^max_steps at
    worst), not sessions."""
    if max_steps < 1:
        raise ValueError(f"max_steps must be >= 1: {max_steps}")
    # NULL key/ts/type rows are excluded BEFORE sessionization so they
    # cannot bridge or split a gap (paths are journeys of typed,
    # attributable events)
    nn = df.where(
        F.col(key_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(type_col).isNotNull()
    )
    s = sessionize(nn, key_col, ts_col, gap_seconds, tiebreak_col)
    step = F.struct(
        F.unix_micros(F.col(ts_col)).alias("us"),
        *( [F.col(tiebreak_col).alias("tb")] if tiebreak_col else [] ),
        F.col(type_col).alias("t"),
    )
    return (
        s.groupBy(key_col, "session_id")
        .agg(
            F.array_join(
                F.transform(
                    F.slice(F.array_sort(F.collect_list(step)), 1, max_steps),
                    lambda x: x["t"],
                ),
                ">",
            ).alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )
