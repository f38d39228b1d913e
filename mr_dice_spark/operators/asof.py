"""As-of join (beyond-reference operator, SURVEY.md §2.3 note).

For each left row, attach the most recent right row with
``right.ts <= left.ts`` within the same key — the time-series point lookup
Spark lacks as a builtin.

Implementation is the union-marker pattern, NOT a range self-join:
interleave both sides, sort within key by (ts, side) so right rows precede
left rows at equal timestamps (>= semantics), and carry the latest right
payload forward with last(ignorenulls) over an unbounded-preceding window.
One shuffle on the key, linear in rows — survives 100x scale where a
windowed theta-join would be quadratic per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_matched",
) -> DataFrame:
    """Backward as-of left join. Right side must be unique per (on, ts) —
    pre-dedup it deterministically if not (ties would be ambiguous)."""
    lcols = left.columns
    l = left.withColumn("__t", F.col(left_ts)).withColumn("__side", F.lit(1))
    r = right.select(
        *on,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    for c in lcols:
        if c not in on:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    u = l.select(
        *lcols, "__t", "__side", *[F.lit(None).cast(dict(r.dtypes)[f"__v_{c}"]).alias(f"__v_{c}") for c in value_cols]
    ).unionByName(r.select(*lcols, "__t", "__side", *[f"__v_{c}" for c in value_cols]))

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *lcols,
        "__side",
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return filled.where(F.col("__side") == 1).drop("__side")
