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
