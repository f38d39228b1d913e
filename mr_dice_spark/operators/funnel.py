"""Ordered-funnel conversion analysis: how many users performed a given
sequence of event types IN ORDER (view → click → purchase), the product-
analytics primitive next to sessionization and cohort retention
(golden_builders' events family).

Semantics: a user reaches step i if, scanning their events in (time,
type) order, steps 1..i match greedily — the greedy earliest match is
optimal for subsequence matching, so "reached" is exactly the longest
funnel prefix the user's history contains. Events with types outside the
funnel are ignored; NULL users are excluded (no identity, no funnel).

Scale shape: ONE user-keyed shuffle (collect each user's in-funnel
events), then the subsequence scan as an in-row ``aggregate`` fold over
the sorted array — no joins, no per-step passes (a conditional-
aggregation formulation would need k dependent shuffles). The final
per-step rollup is a single tiny global aggregate. Per-user arrays are
bounded by that user's in-funnel event count; a pathological single user
with billions of events would need per-user pre-bucketing, the same
caveat as sessionize. Engine-portable: the sort key is (epoch_ms, type)
and the fold is restated in SQL as list_reduce over step indices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_conversion(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: list[str],
) -> DataFrame:
    """Per funnel step: ``(step_index, step, n_users, conversion)`` with
    1-based step_index, n_users = users whose history contains steps
    1..i as a time-ordered subsequence, and conversion = n_users /
    step-1 users (nudge-rounded to 6; NULL when nobody entered)."""
    if not steps or len(set(steps)) != len(steps):
        raise ValueError(f"steps must be non-empty and distinct: {steps}")
    k = len(steps)
    evs = (
        # an unstamped event has no position in a sequence; NULL ts would
        # also sort differently across engines (Spark NULLS FIRST in the
        # array-sort struct vs list_sort's NULL handling)
        df.where(
            F.col(type_col).isin(list(steps))
            & F.col(user_col).isNotNull()
            & F.col(ts_col).isNotNull()
        )
        .select(
            F.col(user_col).alias("__u"),
            F.struct(
                F.unix_millis(F.col(ts_col)).alias("t"),
                F.col(type_col).alias("ty"),
            ).alias("__e"),
        )
        .groupBy("__u")
        .agg(F.array_sort(F.collect_list("__e")).alias("__evs"))
    )
    idxs = F.transform(F.col("__evs"), lambda e: _step_index(e["ty"], steps))
    reached = F.aggregate(
        idxs,
        F.lit(0),
        lambda acc, x: F.when(x == acc, acc + 1).otherwise(acc),
    )
    per_user = evs.select(reached.alias("__reached"))
    counts = per_user.agg(
        *[
            F.count_if(F.col("__reached") >= i + 1).alias(f"__n{i}")
            for i in range(k)
        ]
    )
    # conversion computed on the ONE-row counts frame against __n0, so no
    # window is ever needed on the exploded side
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step_index"),
                F.lit(steps[i]).alias("step"),
                F.col(f"__n{i}").alias("n_users"),
                F.when(
                    F.col("__n0") > 0,
                    F.round(
                        F.col(f"__n{i}") / F.col("__n0") + F.lit(1e-9), 6
                    ),
                ).alias("conversion"),
            )
            for i in range(k)
        ]
    )
    return counts.select(F.explode(rows).alias("r")).select(
        "r.step_index", "r.step", "r.n_users", "r.conversion"
    )


def _step_index(ty, steps):
    out = F.lit(None).cast("int")
    for i in range(len(steps) - 1, -1, -1):
        out = F.when(ty == steps[i], F.lit(i)).otherwise(out)
    return out


def event_transitions(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
) -> DataFrame:
    """First-order transition matrix over each user's event stream:
    ``(from_type, to_type, n_transitions, prob)`` where consecutive
    events per user (in (epoch_ms, type) order — the deterministic tie
    rule shared with funnel_conversion) form one transition and ``prob``
    row-normalizes per from_type (nudge-rounded to 6). The
    session-behavior fingerprint next to the funnel: where users
    actually GO after each event. NULL users are excluded.

    Scale shape: one user-keyed window (lead over the per-user sort)
    then a hash aggregate on the (from, to) pairs — type-cardinality²
    keys at most — and a tiny per-from normalization window over that
    aggregate. No collects, no per-user arrays (unlike the funnel fold,
    adjacency needs only lead())."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(
        F.unix_millis(F.col(ts_col)), F.col(type_col)
    )
    pairs = (
        df.where(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(
            F.col(user_col).alias("__u"),
            F.col(type_col).alias("from_type"),
            F.lead(F.col(type_col)).over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    wf = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(wf) + F.lit(1e-9),
            6,
        ).alias("prob"),
    )
