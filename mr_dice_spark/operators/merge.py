"""CDC merge / upsert operators (beyond-reference, north-star pipeline).

A 100 TB training-data pipeline ingests change feeds: a base snapshot plus
an append-only stream of keyed changes (upserts and deletes), from which the
current snapshot must be rebuilt (or incrementally advanced). The reference
has no mutation surface at all — its stores are read-only (SURVEY.md §2.1
S2-S5) — so these operators are the Spark-native extension of its
"first-writer-wins by traversal order" dedup (D1,
optimade_database/Optimade_Server/utils.py:398,426-431) to the inverse
*last-writer-wins by explicit version* semantics a mutable corpus needs.

Scale notes:
* ``merge_latest_wins`` is ONE hash shuffle on the key columns; Spark 3.5+
  rewrites the ``row_number() = 1`` filter into a per-partition group limit
  (WindowGroupLimit) before the exchange, so the shuffle carries at most one
  row per (partition, key) — not the whole history.
* ``apply_changes`` unions the (usually huge) base with the (usually small)
  change feed; both sides shuffle once on the key. If the base is bucketed
  by key at ingest (ingest.write_bucketed_table), its exchange disappears.
* Version ties are broken by ``tiebreakers`` — always pass a unique column
  (event id, file offset) or the snapshot is nondeterministic under
  concurrent writers with equal timestamps.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def merge_latest_wins(
    df: DataFrame,
    key_cols: list[str],
    version_col: str,
    tiebreakers: list[str] | None = None,
) -> DataFrame:
    """Collapse a keyed history to the single latest row per key.

    Deterministic: orders by ``version_col`` DESC then each tiebreaker DESC.
    """
    order = [F.col(version_col).desc()] + [F.col(c).desc() for c in (tiebreakers or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    version_col: str,
    delete_col: str = "is_deleted",
    tiebreakers: list[str] | None = None,
) -> DataFrame:
    """Advance a snapshot by a change feed: last writer (by version) wins,
    and a winning change row with ``delete_col`` true removes the key.

    ``base`` needs no ``delete_col`` (it is added as false) and every base
    row is treated as older than any change with an equal version (changes
    carry ``__src=1`` as the first tiebreaker), matching the usual CDC
    convention that a same-version change supersedes the snapshot it was
    derived from.

    ``delete_col`` is CDC metadata, CONSUMED by this operator: it is not in
    the returned snapshot (a base carrying its own ``delete_col`` gets its
    soft-deletes applied). ``__src`` is reserved.
    """
    for df, side in ((base, "base"), (changes, "changes")):
        if "__src" in df.columns:
            raise ValueError(f"{side} must not contain the reserved column '__src'")
    if delete_col not in base.columns:
        base = base.withColumn(delete_col, F.lit(False))
    if delete_col not in changes.columns:
        changes = changes.withColumn(delete_col, F.lit(False))
    base = base.withColumn("__src", F.lit(0))
    changes = changes.withColumn("__src", F.lit(1))
    merged = merge_latest_wins(
        base.unionByName(changes),
        key_cols,
        version_col,
        tiebreakers=["__src"] + list(tiebreakers or []),
    )
    # a NULL delete flag means "not deleted", never "drop the row"
    return merged.where(~F.coalesce(F.col(delete_col), F.lit(False))).drop("__src", delete_col)


def snapshot_delta(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Diff two snapshots into a change feed: one row per changed key with
    ``change_op`` in ('insert', 'update', 'delete').

    The inverse of :func:`apply_changes` — useful to re-derive an incremental
    feed when only full snapshots are available. One full-outer join (single
    shuffle per side, co-located if both are bucketed on the key).
    """
    compare_cols = compare_cols or [c for c in new.columns if c not in key_cols]
    o = old.select(*key_cols, F.struct(*compare_cols).alias("__old")).alias("o")
    n = new.select(*key_cols, F.struct(*compare_cols).alias("__new")).alias("n")
    # eqNullSafe on the keys too: with plain equality a NULL-keyed row never
    # matches itself across snapshots and every diff reports phantom
    # delete+insert churn for it
    cond = None
    for k in key_cols:
        c = F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}"))
        cond = c if cond is None else (cond & c)
    joined = o.join(n, cond, "full_outer").select(
        *[
            F.coalesce(F.col(f"o.{k}"), F.col(f"n.{k}")).alias(k)
            for k in key_cols
        ],
        "__old",
        "__new",
    )
    op: Column = (
        F.when(F.col("__old").isNull(), F.lit("insert"))
        .when(F.col("__new").isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    # eqNullSafe: a field updated to/from NULL must count as a change, but
    # plain struct != evaluates to NULL there and the row would be dropped
    return (
        joined.withColumn("change_op", op)
        .where(~F.col("__old").eqNullSafe(F.col("__new")))
        .select(*key_cols, "change_op", F.coalesce("__new", "__old").alias("row"))
    )


def scd2_history(
    changes: DataFrame,
    keys: Sequence[str],
    version_col: str,
    tracked: Sequence[str],
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change feed: one
    validity interval per (key, consecutive run of identical tracked
    values). Consecutive versions whose tracked attributes are unchanged
    COLLAPSE into one interval (the warehouse-standard dedup of no-op
    updates); the final interval per key is open (``valid_to`` NULL,
    ``is_current`` true).

    Single-pass gaps-and-islands: per key, a lag comparison marks change
    points, a running sum numbers the runs, and min/max + lead complete the
    intervals — three window functions over ONE key shuffle, no self-join.
    At scale the shuffle is on the dimension key; skewed hot keys are not
    expected in dimension feeds (keys are entities, not events).
    """
    key_cols = [F.col(k) for k in keys]
    order = [F.col(version_col)] + [F.col(t) for t in tiebreakers]
    w = Window.partitionBy(*key_cols).orderBy(*order)

    changed = F.lit(False)
    for t in tracked:
        prev = F.lag(F.col(t)).over(w)
        # null-safe inequality: a change to/from NULL is a change
        changed = changed | ~F.col(t).eqNullSafe(prev)
    first_row = F.lag(F.col(version_col)).over(w).isNull()
    marked = changes.withColumn("__brk", (first_row | changed).cast("int"))
    runs = marked.withColumn(
        "__run", F.sum("__brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    grouped = runs.groupBy(*key_cols, F.col("__run")).agg(
        F.min(version_col).alias("valid_from"),
        *[F.first(t).alias(t) for t in tracked],
    )
    w2 = Window.partitionBy(*key_cols).orderBy(F.col("valid_from"))
    return (
        grouped.withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("__run")
    )
