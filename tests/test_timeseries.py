"""Unit tests for time-series resampling."""

from datetime import datetime

from mr_dice_spark.operators.timeseries import resample_ffill


def _ts(h):
    return datetime(2024, 1, 1, h, 30)  # mid-hour observations


def test_resample_ffill_fills_gaps_forward(spark):
    rows = [
        (1, _ts(0), 10.0),
        (1, _ts(0), 20.0),  # same bucket -> avg 15.0
        (1, _ts(3), 40.0),
        (2, _ts(5), 7.0),   # single-bucket key -> 1 grid row, no fill
    ]
    df = spark.createDataFrame(rows, "k int, ts timestamp, v double")
    out = resample_ffill(df, "k", "ts", "v", step_seconds=3600, agg="avg")
    got = sorted(
        (r["k"], r["bucket_ts"].hour, r["v"], r["filled"]) for r in out.collect()
    )
    assert got == [
        (1, 0, 15.0, False),
        (1, 1, 15.0, True),   # gap: carries the last observed bucket avg
        (1, 2, 15.0, True),
        (1, 3, 40.0, False),
        (2, 5, 7.0, False),
    ]


def test_resample_ffill_rejects_unknown_agg(spark):
    import pytest

    df = spark.createDataFrame([(1, _ts(0), 1.0)], "k int, ts timestamp, v double")
    with pytest.raises(ValueError):
        resample_ffill(df, "k", "ts", "v", agg="median")


def test_interpolate_linear_interior_gaps(spark):
    from mr_dice_spark.operators.timeseries import interpolate_linear

    rows = [
        (1, _ts(0), 10.0),
        (1, _ts(3), 40.0),   # 3-bucket gap: 10 -> 20 -> 30 -> 40
        (1, _ts(4), 0.0),
        (2, _ts(5), 7.0),    # single-bucket key -> 1 grid row
    ]
    df = spark.createDataFrame(rows, "k int, ts timestamp, v double")
    out = interpolate_linear(df, "k", "ts", "v", step_seconds=3600, agg="avg")
    got = sorted(
        (r["k"], r["bucket_ts"].hour, r["v"], r["filled"]) for r in out.collect()
    )
    assert got == [
        (1, 0, 10.0, False),
        (1, 1, 20.0, True),
        (1, 2, 30.0, True),
        (1, 3, 40.0, False),
        (1, 4, 0.0, False),
        (2, 5, 7.0, False),
    ]


def test_interpolate_linear_matches_ffill_grid(spark):
    # grid rows and `filled` flags are identical to resample_ffill; only
    # the fill VALUES differ (and observed buckets are untouched)
    from mr_dice_spark.operators.timeseries import interpolate_linear

    rows = [(1, _ts(0), 5.0), (1, _ts(2), 11.0), (1, _ts(2), 13.0)]
    df = spark.createDataFrame(rows, "k int, ts timestamp, v double")
    lin = interpolate_linear(df, "k", "ts", "v", agg="avg").collect()
    ff = resample_ffill(df, "k", "ts", "v", agg="avg").collect()
    assert [(r["k"], r["bucket_ts"], r["filled"]) for r in lin] == [
        (r["k"], r["bucket_ts"], r["filled"]) for r in ff
    ]
    assert [r["v"] for r in sorted(lin, key=lambda r: r["bucket_ts"])] == [
        5.0, 8.5, 12.0
    ]


def test_interpolate_linear_rejects_unknown_agg(spark):
    import pytest

    from mr_dice_spark.operators.timeseries import interpolate_linear

    df = spark.createDataFrame([(1, _ts(0), 1.0)], "k int, ts timestamp, v double")
    with pytest.raises(ValueError):
        interpolate_linear(df, "k", "ts", "v", agg="median")


def test_autocorrelation_by_lag_perfect_cycles(spark):
    import math

    from mr_dice_spark.operators.timeseries import autocorrelation_by_lag

    # period-2 alternating series: lag-1 autocorr -1, lag-2 autocorr +1
    rows = [(1, datetime(2024, 1, 1, h, 30), 10.0 if h % 2 == 0 else -10.0)
            for h in range(24)]
    df = spark.createDataFrame(rows, "k int, ts timestamp, v double")
    got = {
        (r["k"], r["lag"]): (r["n"], r["autocorr"])
        for r in autocorrelation_by_lag(df, "k", "ts", "v", lags=[1, 2]).collect()
    }
    n1, r1 = got[(1, 1)]
    n2, r2 = got[(1, 2)]
    assert n1 == 23 and math.isclose(r1, -1.0, abs_tol=1e-9)
    assert n2 == 22 and math.isclose(r2, 1.0, abs_tol=1e-9)


def test_autocorrelation_by_lag_degenerate_and_validation(spark):
    import pytest

    from mr_dice_spark.operators.timeseries import autocorrelation_by_lag

    # constant series -> zero variance -> NULL; short series -> NULL
    rows = [(1, datetime(2024, 1, 1, h, 0), 5.0) for h in range(4)] + [
        (2, datetime(2024, 1, 1, 0, 0), 1.0)
    ]
    df = spark.createDataFrame(rows, "k int, ts timestamp, v double")
    got = {
        (r["k"], r["lag"]): r["autocorr"]
        for r in autocorrelation_by_lag(df, "k", "ts", "v", lags=[1]).collect()
    }
    assert got[(1, 1)] is None and got[(2, 1)] is None
    with pytest.raises(ValueError):
        autocorrelation_by_lag(df, "k", "ts", "v", lags=[])
    with pytest.raises(ValueError):
        autocorrelation_by_lag(df, "k", "ts", "v", lags=[0])


def test_autocorrelation_by_lag_single_pair_is_null_not_error(spark):
    from mr_dice_spark.operators.timeseries import autocorrelation_by_lag

    # exactly one complete (v, lag) pair: sample moments undefined -> NULL
    rows = [(1, datetime(2024, 1, 1, 0, 0), 1.0), (1, datetime(2024, 1, 1, 1, 0), 2.0)]
    df = spark.createDataFrame(rows, "k int, ts timestamp, v double")
    [r] = autocorrelation_by_lag(df, "k", "ts", "v", lags=[1]).collect()
    assert r["n"] == 1 and r["autocorr"] is None
