"""Stream-stream joins and streaming dedup (SURVEY.md §2.10 extension).

The reference's nearest analogue is its batch cross-source union + id dedup
(D1/D5); a 100 TB ingest pipeline needs the streaming forms: joining two
live feeds within a bounded time skew, and dropping duplicate records as
they arrive with bounded state.

State-size discipline (what makes these viable on a real cluster):
* BOTH sides of a stream-stream join carry a watermark and the join
  condition bounds event time on both sides — otherwise Spark must buffer
  every row forever (unbounded state). With the watermark + time-range
  condition, each side's state is ~(rate x (watermark + within)) rows.
* ``dedup_stream`` uses dropDuplicatesWithinWatermark: the key state for a
  duplicate is dropped once the watermark passes it, so state is bounded by
  keys-per-watermark-window, not keys-ever-seen. Exactly-once duplicate
  suppression therefore only holds for duplicates arriving within the
  watermark delay of each other — the batch operators (dedup_exact,
  dedup_incremental) are the full-history complement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "30 minutes",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join two (streaming or batch) frames on ``key`` where the right event
    lands inside [left_ts, left_ts + within].

    Output columns are qualified via the aliases ``l`` / ``r`` — select with
    ``F.col("l.event_id")`` etc. Works identically on batch frames (the
    watermark is a no-op there), which is how the tests oracle it.
    """
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {within}"))
    )
    return left.alias("l").join(right.alias("r"), cond, how)


def dedup_stream(
    df: DataFrame,
    subset: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """First-wins duplicate suppression over a stream with bounded state.

    Duplicates separated by more than ``watermark`` in event time are NOT
    suppressed (their state has been reclaimed) — the documented contract
    of watermark-bounded streaming dedup.

    "First" means ARRIVAL order on the streaming path (inherent to
    dropDuplicatesWithinWatermark); the batch path keeps the EVENT-TIME
    first row per key (deterministic row_number, ts then remaining columns
    as tiebreak) — so batch-vs-stream parity is guaranteed at the KEY
    level, and on the non-key columns only when arrival order matches
    event time."""
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(subset)
    # tiebreak on every orderable column: only map types are unorderable in
    # Spark (analysis error) — including maps NESTED in arrays/structs, so
    # test for containment, not prefix. Arrays/structs/binary sort fine and
    # dropping them would let rows differing only there tie
    # nondeterministically
    orderable = {c for c, t in df.dtypes if "map<" not in t}
    tiebreak = [c for c in df.columns if c not in subset and c in orderable]
    w = Window.partitionBy(*subset).orderBy(
        F.col(ts_col).asc(), *[F.col(c).asc() for c in tiebreak if c != ts_col]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
