"""CDC merge/upsert operators (operators/merge.py)."""

from pyspark.sql import functions as F

from mr_dice_spark.operators.merge import apply_changes, merge_latest_wins, snapshot_delta


def test_merge_latest_wins_picks_highest_version(spark):
    df = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 5, "c")], "k int, v int, payload string"
    )
    out = {r.k: (r.v, r.payload) for r in merge_latest_wins(df, ["k"], "v").collect()}
    assert out == {1: (20, "b"), 2: (5, "c")}


def test_merge_latest_wins_tiebreaker_deterministic(spark):
    df = spark.createDataFrame(
        [(1, 10, 100, "lo"), (1, 10, 200, "hi")], "k int, v int, seq int, payload string"
    )
    rows = merge_latest_wins(df, ["k"], "v", tiebreakers=["seq"]).collect()
    assert len(rows) == 1 and rows[0].payload == "hi"


def test_apply_changes_upsert_insert_delete(spark):
    base = spark.createDataFrame(
        [(1, 1, "old1"), (2, 1, "old2"), (3, 1, "old3")], "k int, v int, payload string"
    )
    changes = spark.createDataFrame(
        [(1, 2, "new1", False),   # update
         (4, 2, "new4", False),   # insert
         (2, 2, "gone", True),    # delete
         (3, 0, "stale", False)], # stale change loses to base v=1
        "k int, v int, payload string, is_deleted boolean",
    )
    out = {r.k: (r.v, r.payload)
           for r in apply_changes(base, changes, ["k"], "v").collect()}
    assert out == {1: (2, "new1"), 3: (1, "old3"), 4: (2, "new4")}


def test_apply_changes_equal_version_change_wins(spark):
    base = spark.createDataFrame([(1, 5, "base")], "k int, v int, payload string")
    changes = spark.createDataFrame([(1, 5, "chg", False)],
                                    "k int, v int, payload string, is_deleted boolean")
    rows = apply_changes(base, changes, ["k"], "v").collect()
    assert rows[0].payload == "chg"


def test_snapshot_delta_roundtrip(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, payload string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "k int, payload string"
    )
    d = {r.k: r.change_op for r in snapshot_delta(old, new, ["k"]).collect()}
    assert d == {2: "update", 3: "delete", 4: "insert"}


def test_snapshot_delta_then_apply_changes_rebuilds_new(spark):
    old = spark.createDataFrame([(1, "a"), (2, "b")], "k int, payload string")
    new = spark.createDataFrame([(2, "B"), (3, "c")], "k int, payload string")
    delta = snapshot_delta(old, new, ["k"]).select(
        "k",
        F.col("row.payload").alias("payload"),
        (F.col("change_op") == "delete").alias("is_deleted"),
        F.lit(1).alias("v"),
    )
    rebuilt = apply_changes(old.withColumn("v", F.lit(0)), delta, ["k"], "v")
    got = {(r.k, r.payload) for r in rebuilt.select("k", "payload").collect()}
    want = {(r.k, r.payload) for r in new.collect()}
    assert got == want


def test_apply_changes_null_delete_flag_means_not_deleted(spark):
    base = spark.createDataFrame([(1, 1, "a")], "k int, v int, payload string")
    changes = spark.createDataFrame([(1, 2, "b", None)],
                                    "k int, v int, payload string, is_deleted boolean")
    rows = apply_changes(base, changes, ["k"], "v").collect()
    assert len(rows) == 1 and rows[0].payload == "b"


def test_snapshot_delta_null_field_update_detected(spark):
    """payload a -> NULL is an update; plain struct != would return NULL
    and silently drop it."""
    old = spark.createDataFrame([(1, "a"), (2, "b")], "k int, payload string")
    new = spark.createDataFrame([(1, None), (2, "b")], "k int, payload string")
    d = {r.k: r.change_op for r in snapshot_delta(old, new, ["k"]).collect()}
    assert d == {1: "update"}


def test_snapshot_delta_null_key_not_phantom_churn(spark):
    """A NULL-keyed row identical in both snapshots must NOT appear as a
    delete+insert pair (null-safe key join)."""
    old = spark.createDataFrame([(None, "a"), (1, "b")], "k int, payload string")
    new = spark.createDataFrame([(None, "a"), (1, "b")], "k int, payload string")
    assert snapshot_delta(old, new, ["k"]).count() == 0


def test_apply_changes_rejects_reserved_src_column(spark):
    import pytest
    from pyspark.sql import functions as F

    base = spark.createDataFrame([(1, 1, "a")], "k int, v int, payload string")
    with pytest.raises(ValueError):
        apply_changes(base.withColumn("__src", F.lit(9)), base, ["k"], "v")


# ---------------------------------------------------------------------------
# property test: apply_changes vs a pure-Python CDC reference model
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

row_st = st.tuples(
    st.integers(min_value=0, max_value=5),    # key
    st.integers(min_value=0, max_value=8),    # version
    st.integers(min_value=0, max_value=99),   # payload
    st.booleans(),                            # is_deleted (changes only)
)


def _model(base_rows, change_rows):
    """Reference semantics: per key take max (version, src, seq); change
    beats base at equal version; later change row beats earlier at equal
    version; drop if winner is a delete."""
    best = {}
    for seq, (k, v, p, d) in enumerate(base_rows):
        key = (v, 0, seq)
        if k not in best or key > best[k][0]:
            best[k] = (key, p, False)
    for seq, (k, v, p, d) in enumerate(change_rows):
        key = (v, 1, seq)
        if k not in best or key > best[k][0]:
            best[k] = (key, p, d)
    return {k: p for k, (key, p, d) in best.items() if not d}


@given(
    base=st.lists(row_st, max_size=12),
    changes=st.lists(row_st, max_size=12),
)
@settings(max_examples=25, deadline=None)
def test_apply_changes_matches_model(spark, base, changes):
    from pyspark.sql import functions as F

    base_df = spark.createDataFrame(
        [(k, v, p, i) for i, (k, v, p, _) in enumerate(base)],
        "k int, v int, payload int, seq int",
    )
    chg_df = spark.createDataFrame(
        [(k, v, p, d, i) for i, (k, v, p, d) in enumerate(changes)],
        "k int, v int, payload int, is_deleted boolean, seq int",
    )
    if not base and not changes:
        return
    got = {
        r.k: r.payload
        for r in apply_changes(base_df, chg_df, ["k"], "v",
                               tiebreakers=["seq"]).collect()
    }
    assert got == _model(base, changes)


# ---------------------------------------------------------------------------
# SCD2 history
# ---------------------------------------------------------------------------


def test_scd2_collapses_noop_updates_and_tracks_nulls(spark):
    from mr_dice_spark.operators.merge import scd2_history

    rows = [
        # key 1: A, A (no-op), B, B (no-op), A  -> 3 intervals A/B/A
        (1, 1, "A"), (1, 2, "A"), (1, 3, "B"), (1, 4, "B"), (1, 5, "A"),
        # key 2: NULL -> A -> NULL : null transitions are real changes
        (2, 1, None), (2, 2, "A"), (2, 3, None),
    ]
    df = spark.createDataFrame(rows, "k int, v int, attr string")
    out = scd2_history(df, keys=["k"], version_col="v", tracked=["attr"])
    got = sorted(
        (r["k"], r["valid_from"], r["valid_to"], r["is_current"], r["attr"])
        for r in out.collect()
    )
    assert got == [
        (1, 1, 3, False, "A"),
        (1, 3, 5, False, "B"),
        (1, 5, None, True, "A"),
        (2, 1, 2, False, None),
        (2, 2, 3, False, "A"),
        (2, 3, None, True, None),
    ]
