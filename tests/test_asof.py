"""As-of join family: backward/forward/nearest directions + tolerance
(pandas merge_asof semantics, distributed via the union-marker pattern)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from mr_dice_spark.operators.asof import asof_join


def T(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, T("2024-01-01 10:00:00")), (2, T("2024-01-01 12:00:00")),
         (3, T("2024-01-01 23:00:00")), (4, T("2024-01-01 10:45:00"))],
        "pid long, ts timestamp",
    ).withColumn("k", F.lit(1))
    right = spark.createDataFrame(
        [(T("2024-01-01 09:00:00"), "a"), (T("2024-01-01 11:00:00"), "b"),
         (T("2024-01-01 12:00:00"), "c")],
        "rts timestamp, tag string",
    ).withColumn("k", F.lit(1))
    return left, right


def _run(left, right, **kw):
    out = asof_join(left, right, ["k"], "ts", "rts", ["tag"], **kw)
    return {r["pid"]: r["tag_matched"] for r in out.collect()}


def test_backward(frames):
    assert _run(*frames, direction="backward") == {1: "a", 2: "c", 3: "c", 4: "a"}


def test_forward(frames):
    # equal timestamps match (>= semantics); nothing after 23:00
    assert _run(*frames, direction="forward") == {1: "b", 2: "c", 3: None, 4: "b"}


def test_nearest_prefers_closer_and_breaks_ties_backward(frames):
    # pid1: 1h both ways -> backward wins; pid4: forward b is 15m away
    assert _run(*frames, direction="nearest") == {1: "a", 2: "c", 3: "c", 4: "b"}


def test_tolerance_nulls_far_matches(frames):
    got = _run(*frames, tolerance_seconds=1800)
    assert got == {1: None, 2: "c", 3: None, 4: None}


def test_unknown_direction_rejected(frames):
    left, right = frames
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, ["k"], "ts", "rts", ["tag"], direction="sideways")


def test_asof_null_value_column_is_not_chimera(spark):
    """The true as-of match carries its own NULL value — per-column carry
    would stitch the value from an older row onto the newer match's ts."""
    from pyspark.sql import functions as F

    from mr_dice_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 3)], "k int, t long").select(
        "k", F.timestamp_seconds("t").alias("ts")
    )
    right = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, None)], "k int, t long, tag string"
    ).select("k", F.timestamp_seconds("t").alias("ts"), "tag")
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts",
                    value_cols=["tag"], direction="backward").collect()
    assert len(out) == 1
    row = out[0]
    assert row["__asof_ts_matched"] is not None and row["__asof_ts_matched"].second == 2
    assert row["tag_matched"] is None  # the ts=2 match's own NULL, not ts=1's 'a'


def test_asof_null_timestamps_match_nothing(spark):
    from pyspark.sql import functions as F

    from mr_dice_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, None), (1, 5)], "k int, t long").select(
        "k", F.timestamp_seconds("t").alias("ts")
    )
    right = spark.createDataFrame([(1, 1, "a"), (1, None, "z")],
                                  "k int, t long, tag string").select(
        "k", F.timestamp_seconds("t").alias("ts"), "tag"
    )
    for direction in ("backward", "forward", "nearest"):
        rows = {(
            r["ts"].second if r["ts"] else None
        ): r["tag_matched"] for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts",
            value_cols=["tag"], direction=direction,
        ).collect()}
        assert rows[None] is None, direction      # NULL-ts left matches nothing
        if direction != "forward":
            assert rows[5] == "a", direction       # NULL-ts right never matches


def test_interval_join_with_on_keys(spark):
    """Keyed interval join: same-bucket points in DIFFERENT keys must not
    match (this path previously threw MISSING_ATTRIBUTES)."""
    from pyspark.sql import functions as F

    from mr_dice_spark.operators.interval import interval_join

    pts = spark.createDataFrame(
        [("a", 1, 30), ("b", 2, 30)], "key string, pid long, t long"
    ).select("key", "pid", F.timestamp_seconds("t").alias("ts"))
    ivs = spark.createDataFrame(
        [("a", 10, 0, 60)], "key string, iid long, s long, e long"
    ).select(
        "key", "iid",
        F.timestamp_seconds("s").alias("s"), F.timestamp_seconds("e").alias("e"),
    )
    out = interval_join(pts, ivs, "ts", "s", "e", on=["key"])
    rows = [(r["pid"], r["iid"]) for r in out.collect()]
    assert rows == [(1, 10)]  # key 'b' point must not join key 'a' interval
    assert "key" in out.columns and out.columns.count("key") == 1


def test_interval_join_inverted_interval_yields_nothing(spark):
    from pyspark.sql import functions as F

    from mr_dice_spark.operators.interval import interval_join

    pts = spark.createDataFrame([(1, 30)], "pid long, t long").select(
        "pid", F.timestamp_seconds("t").alias("ts")
    )
    ivs = spark.createDataFrame([(10, 60, 0)], "iid long, s long, e long").select(
        "iid", F.timestamp_seconds("s").alias("s"), F.timestamp_seconds("e").alias("e")
    )
    assert interval_join(pts, ivs, "ts", "s", "e").count() == 0


def test_touch_attribution_window_edges_and_ties(spark):
    """A touch exactly at the conversion instant counts; one just past
    the lookback does not; same-instant touch ties pick max/min id for
    last/first; unattributed conversions keep NULLs."""
    import datetime as dt

    import pytest

    from mr_dice_spark.operators.funnel import touch_attribution

    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)
    LOOK = 3600 * 1_000_000  # 1 hour
    rows = [
        # user 1: click at conversion instant (counts, ties by id),
        # click 1h+1us before (out of window), click 30min before (in)
        (1, 1, "click", t0 - dt.timedelta(hours=1, microseconds=1)),
        (2, 1, "click", t0 - dt.timedelta(minutes=30)),
        (3, 1, "click", t0),
        (4, 1, "click", t0),
        (5, 1, "purchase", t0),
        # user 2: no clicks at all
        (6, 2, "purchase", t0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    got = {
        r["conversion_id"]: r
        for r in touch_attribution(
            df, "user_id", "ts", "event_type", "event_id",
            "purchase", "click", lookback_us=LOOK,
        ).collect()
    }
    assert got[5]["first_touch_id"] == 2       # 1h-old click excluded
    assert got[5]["last_touch_id"] == 4        # same-instant tie -> max id
    assert got[5]["last_touch_lag_us"] == 0
    assert got[6]["first_touch_id"] is None
    assert got[6]["last_touch_lag_us"] is None
    with pytest.raises(ValueError, match="lookback_us"):
        touch_attribution(df, "user_id", "ts", "event_type", "event_id",
                          "purchase", "click", lookback_us=0)


def test_session_path_counts_truncation_gap_and_ties(spark):
    """Paths truncate at max_steps, a >= gap break starts a new path,
    same-timestamp steps order by tiebreak, NULL-typed rows are
    excluded before gaps are measured."""
    import datetime as dt

    import pytest

    from mr_dice_spark.operators.sessionize import session_path_counts

    t0 = dt.datetime(2024, 1, 1, 8, 0, 0)

    def at(sec):
        return t0 + dt.timedelta(seconds=sec)

    rows = [
        (1, 1, "a", at(0)), (2, 1, "b", at(10)), (3, 1, "c", at(20)),
        (4, 1, "d", at(30)),                       # truncated at 3 steps
        (5, 1, "x", at(4000)),                     # new session after gap
        # user 2: same-instant pair orders by event_id; NULL type dropped
        (7, 2, "q", at(0)), (6, 2, "p", at(0)), (8, 2, None, at(5)),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    got = {
        r["path"]: r["n_sessions"]
        for r in session_path_counts(
            df, "user_id", "ts", "event_type", 1800,
            max_steps=3, tiebreak_col="event_id",
        ).collect()
    }
    assert got == {"a>b>c": 1, "x": 1, "p>q": 1}
    with pytest.raises(ValueError, match="max_steps"):
        session_path_counts(df, "user_id", "ts", "event_type", 1800, 0)
