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
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """As-of left join. Right side must be unique per (on, ts) —
    pre-dedup it deterministically if not (ties would be ambiguous).

    direction:
      * ``backward`` (default): most recent right row with ts <= left ts
      * ``forward``: earliest right row with ts >= left ts
      * ``nearest``: whichever of the two is closer (backward wins ties)

    ``tolerance_seconds`` nulls out matches farther than the bound (pandas
    merge_asof semantics). The matched right timestamp is always emitted as
    ``__asof_ts{suffix}`` alongside the value columns.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    if direction == "nearest":
        back = _asof_one_direction(
            left, right, on, left_ts, right_ts, value_cols, suffix + "__b", "backward"
        )
        both = _asof_one_direction(
            back, right, on, left_ts, right_ts, value_cols, suffix + "__f", "forward"
        )
        lt = F.col(left_ts).cast("double")
        bt = F.col(f"__asof_ts{suffix}__b").cast("double")
        ft = F.col(f"__asof_ts{suffix}__f").cast("double")
        # backward wins when both exist and is at least as close
        use_b = bt.isNotNull() & (ft.isNull() | ((lt - bt) <= (ft - lt)))
        out = both
        for c in value_cols:
            out = out.withColumn(
                f"{c}{suffix}",
                F.when(use_b, F.col(f"{c}{suffix}__b")).otherwise(F.col(f"{c}{suffix}__f")),
            )
        out = out.withColumn(
            f"__asof_ts{suffix}", F.when(use_b, bt).otherwise(ft).cast("timestamp")
        )
        drop = [f"{c}{suffix}__{d}" for c in value_cols for d in "bf"] + [
            f"__asof_ts{suffix}__b", f"__asof_ts{suffix}__f",
        ]
        out = out.drop(*drop)
    else:
        out = _asof_one_direction(
            left, right, on, left_ts, right_ts, value_cols, suffix, direction
        )
    if tolerance_seconds is not None:
        dist = F.abs(
            F.col(left_ts).cast("double") - F.col(f"__asof_ts{suffix}").cast("double")
        )
        within = F.col(f"__asof_ts{suffix}").isNotNull() & (dist <= tolerance_seconds)
        for c in value_cols:
            out = out.withColumn(
                f"{c}{suffix}", F.when(within, F.col(f"{c}{suffix}"))
            )
        out = out.withColumn(
            f"__asof_ts{suffix}", F.when(within, F.col(f"__asof_ts{suffix}"))
        )
    return out


def _asof_one_direction(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str,
    direction: str,
) -> DataFrame:
    """Union-marker as-of in one direction. For ``forward`` the timeline is
    sorted descending and right rows still precede left at equal ts, giving
    >=-semantics symmetric to backward's <=.

    The matched right row is carried as ONE struct under
    ``last(ignorenulls)`` — per-column carries would independently skip
    NULL values and stitch a chimera of different right rows whenever the
    true match holds a NULL value column (pandas merge_asof returns the
    match's NULL; so do we). NULL-timestamp right rows can never be an
    order position and are dropped; NULL-timestamp left rows match nothing
    (their outputs are NULLed after the scan — under desc ordering they
    would otherwise inherit a spurious carry)."""
    lcols = left.columns
    l = left.withColumn("__t", F.col(left_ts)).withColumn("__side", F.lit(1))
    r = right.where(F.col(right_ts).isNotNull()).select(
        *on,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(
            *[F.col(c).alias(c) for c in value_cols],
            F.col(right_ts).alias("__asof_ts"),
        ).alias("__vrow"),
    )
    for c in lcols:
        if c not in on:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    u = l.select(
        *lcols,
        "__t",
        "__side",
        F.lit(None).cast(dict(r.dtypes)["__vrow"]).alias("__vrow"),
    ).unionByName(r.select(*lcols, "__t", "__side", "__vrow"))

    order = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__vrow", ignorenulls=True).over(w)
    filled = (
        u.select(*lcols, "__side", matched.alias("__m"))
        .where(F.col("__side") == 1)
        .drop("__side")
    )
    valid = F.col(left_ts).isNotNull()
    out = filled.select(
        *lcols,
        *[
            F.when(valid, F.col("__m").getField(c)).alias(f"{c}{suffix}")
            for c in value_cols
        ],
        F.when(valid, F.col("__m").getField("__asof_ts")).alias(f"__asof_ts{suffix}"),
    )
    return out
