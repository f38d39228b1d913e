"""Tests for robust value statistics (operators/robust.py)."""

import pytest

from mr_dice_spark.operators.robust import mad_outlier_flags, winsorize


def test_winsorize_clips_at_exact_percentiles(spark):
    # values 1..20 in one group: p05 = 1.95, p95 = 19.05 (p*(n-1) interp)
    rows = [(i, "g", float(i)) for i in range(1, 21)] + [(99, "g", None)]
    df = spark.createDataFrame(rows, "id long, g string, value double")
    got = {r["id"]: r for r in winsorize(df, "g", "value", 0.05, 0.95).collect()}
    assert got[1]["value_wins"] == pytest.approx(1.95)
    assert got[1]["clipped_low"] and not got[1]["clipped_high"]
    assert got[20]["value_wins"] == pytest.approx(19.05)
    assert got[20]["clipped_high"]
    assert got[10]["value_wins"] == 10.0
    assert not got[10]["clipped_low"] and not got[10]["clipped_high"]
    # NULL passes through unflagged
    assert got[99]["value_wins"] is None
    assert not got[99]["clipped_low"] and not got[99]["clipped_high"]
    with pytest.raises(ValueError):
        winsorize(df, "g", "value", 0.9, 0.1)


def test_mad_outliers_known_values_and_zero_mad(spark):
    # group a: median 10, MAD 1 -> x=20 has robust_z = 6.745 (outlier)
    rows = [(i, "a", v) for i, v in enumerate([9.0, 10.0, 11.0, 9.0, 11.0, 10.0, 20.0])]
    # group b: constant majority -> MAD 0 -> z NULL, outlier false even
    # for the wild value
    rows += [(100 + i, "b", 5.0) for i in range(5)] + [(199, "b", 500.0)]
    df = spark.createDataFrame(rows, "id long, g string, value double")
    got = {r["id"]: r for r in mad_outlier_flags(df, "g", "value", 3.5).collect()}
    assert got[6]["robust_z"] == pytest.approx(6.745, abs=1e-3)
    assert got[6]["outlier"]
    assert got[0]["outlier"] is False
    for i in list(range(100, 105)) + [199]:
        assert got[i]["robust_z"] is None
        assert got[i]["outlier"] is False


def test_group_ols_trend_exact_line_and_degenerate_groups(spark):
    """A perfect line recovers slope/intercept/r2 exactly; constant-x
    and single-row groups yield NULLs, constant-y yields slope 0 with
    NULL r2."""
    from mr_dice_spark.operators.timeseries import group_ols_trend

    rows = (
        [("line", x, 3.0 * x + 2.0) for x in range(10)]
        + [("constx", 5, float(v)) for v in range(4)]
        + [("single", 1, 7.0)]
        + [("consty", x, 4.5) for x in range(6)]
    )
    df = spark.createDataFrame(rows, "g string, x int, y double")
    got = {r["g"]: r for r in group_ols_trend(df, ["g"], "x", "y").collect()}
    assert got["line"]["slope"] == 3.0
    assert got["line"]["intercept"] == 2.0
    assert got["line"]["r2"] == 1.0
    assert got["constx"]["slope"] is None and got["constx"]["r2"] is None
    assert got["single"]["slope"] is None
    assert got["consty"]["slope"] == 0.0 and got["consty"]["intercept"] == 4.5
    assert got["consty"]["r2"] is None
