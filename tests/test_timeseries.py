"""Unit tests for time-series resampling."""

import math
from datetime import datetime

import pytest

from pyspark.sql import functions as F

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


def test_cusum_reflection_matches_recursive_reference(spark):
    """The prefix-form CUSUM must equal the textbook recursion
    S+_t = max(0, S+_{t-1} + z_t - k) computed in Python on the same
    rounded z sequence; the planted +10 shift must flag."""
    import datetime

    from mr_dice_spark.operators.timeseries import cusum_changepoints

    base = datetime.datetime(2024, 1, 1)
    vals = [10.0, 11.0, 9.0, 10.5, 9.5, 10.0, 11.0, 9.0] + [20.0] * 8
    rows = [("k", base + datetime.timedelta(hours=i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = cusum_changepoints(df, "k", "ts", "v", 3600, 0.5, 3.0)
    got = sorted(
        (r["bucket"], r["z"], r["cusum_pos"], r["cusum_neg"], r["is_shift"])
        for r in out.collect()
    )
    mean = sum(vals) / len(vals)
    sd = (sum((v - mean) ** 2 for v in vals) / (len(vals) - 1)) ** 0.5
    sp = sn = 0.0
    for i, (_, z, cp, cn, flag) in enumerate(got):
        zref = round((vals[i] - mean) / sd + 1e-9, 6)
        assert abs(z - zref) < 1e-12
        sp = max(0.0, sp + zref - 0.5)
        sn = max(0.0, sn - zref - 0.5)
        assert abs(cp - sp) < 1e-9 and abs(cn - sn) < 1e-9
        assert flag == (sp > 3.0 or sn > 3.0)
    assert any(r[4] for r in got[8:])          # the shift fires
    assert not any(r[4] for r in got[:6])      # the stable head does not


def test_cusum_constant_series_yields_nulls(spark):
    import datetime

    from mr_dice_spark.operators.timeseries import cusum_changepoints

    base = datetime.datetime(2024, 1, 1)
    rows = [("k", base + datetime.timedelta(hours=i), 5.0) for i in range(4)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    for r in cusum_changepoints(df, "k", "ts", "v").collect():
        assert r["z"] is None and r["cusum_pos"] is None
        assert r["is_shift"] is None


def test_theil_sen_robust_to_outlier_and_matches_python(spark):
    """One corrupted bucket must barely move the Theil-Sen slope (true
    slope 1/bucket), and the exact value must equal a direct Python
    median-of-pairwise-slopes on the same quantized means."""
    import datetime

    from mr_dice_spark.operators.timeseries import theil_sen_trend

    base = datetime.datetime(2024, 1, 1)
    vals = [10.0, 11.0, 12.0, 99.0, 14.0, 15.0, 16.0, 17.0]
    rows = [("k", base + datetime.timedelta(hours=i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    [r] = theil_sen_trend(df, "k", "ts", "v").collect()
    x0 = int(base.replace(tzinfo=datetime.timezone.utc).timestamp() // 3600)
    xs = [x0 + i for i in range(len(vals))]
    vq = [round(v + 1e-9, 6) for v in vals]
    slopes = sorted(
        (vq[j] - vq[i]) / (xs[j] - xs[i])
        for i in range(len(vals)) for j in range(i + 1, len(vals))
    )
    m = len(slopes)
    med = slopes[m // 2] if m % 2 else (slopes[m // 2 - 1] + slopes[m // 2]) / 2
    resid = sorted(vq[i] - med * xs[i] for i in range(len(vals)))
    k = len(resid)
    icpt = resid[k // 2] if k % 2 else (resid[k // 2 - 1] + resid[k // 2]) / 2
    assert r["n_buckets"] == 8 and r["n_pairs"] == 28
    assert abs(r["slope"] - med) < 1e-12
    assert abs(r["intercept"] - icpt) < 1e-9
    assert abs(r["slope"] - 1.0) < 0.2  # the outlier cannot drag it


def test_theil_sen_single_bucket_yields_null(spark):
    import datetime

    from mr_dice_spark.operators.timeseries import theil_sen_trend

    df = spark.createDataFrame(
        [("k", datetime.datetime(2024, 1, 1), 5.0)],
        "k string, ts timestamp, v double",
    )
    [r] = theil_sen_trend(df, "k", "ts", "v").collect()
    assert r["n_buckets"] == 1 and r["n_pairs"] == 0
    assert r["slope"] is None and r["intercept"] is None


def test_time_weighted_avg_known_series(spark):
    """Hand series: value 10 held 3s, then 20 held 1s, then 0 (no
    successor) -> twap = (10*3 + 20*1)/4 = 12.5; plain avg = 10."""
    import datetime

    from mr_dice_spark.operators.timeseries import time_weighted_avg

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        ("k", t0, 1, 10.0),
        ("k", t0 + datetime.timedelta(seconds=3), 2, 20.0),
        ("k", t0 + datetime.timedelta(seconds=4), 3, 0.0),
        ("single", t0, 9, 7.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, id long, v double")
    got = {r["k"]: r for r in time_weighted_avg(df, "k", "ts", "v", "id").collect()}
    r = got["k"]
    assert r["n_obs"] == 3 and r["span_us"] == 4_000_000
    assert abs(r["avg_plain"] - 10.0) < 1e-12
    assert abs(r["avg_time_weighted"] - 12.5) < 1e-12
    assert got["single"]["avg_time_weighted"] is None  # no duration


def test_time_weighted_avg_tied_timestamps_deterministic(spark):
    """Two observations at the SAME microsecond: the (ts, id) order must
    give the lower id zero duration — the engine-portable convention."""
    import datetime

    from mr_dice_spark.operators.timeseries import time_weighted_avg

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        ("k", t0, 2, 100.0),       # tied, higher id -> holds until t1
        ("k", t0, 1, 50.0),        # tied, lower id -> zero duration
        ("k", t0 + datetime.timedelta(seconds=2), 3, 0.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, id long, v double")
    [r] = time_weighted_avg(df, "k", "ts", "v", "id").collect()
    assert abs(r["avg_time_weighted"] - 100.0) < 1e-12


def test_rolling_median_hand_series_and_edges(spark):
    """Spike at bucket 3 must vanish from the smoothed series; edge
    buckets use the partial window (min_periods=1 semantics)."""
    import datetime

    from mr_dice_spark.operators.timeseries import rolling_median

    t0 = datetime.datetime(2024, 1, 1)
    vals = [10.0, 10.0, 10.0, 999.0, 10.0, 10.0, 10.0]
    rows = [("k", t0 + datetime.timedelta(hours=i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    got = {int((r["bucket"] - t0.replace(tzinfo=None)).total_seconds() // 3600):
           r["smoothed"] for r in rolling_median(df, "k", "ts", "v", 3600, 3).collect()}
    assert all(abs(got[i] - 10.0) < 1e-9 for i in range(7))  # spike gone
    import pytest
    with pytest.raises(ValueError, match="half_window"):
        rolling_median(df, "k", "ts", "v", 3600, 0)


def test_trailing_distinct_count_hand_series(spark):
    """User A in hours 0 and 25, user B in hour 1: trailing-24h
    distinct at hour 1 sees {A, B}; at hour 25 only {A} (hour-1 B fell
    out of (25-24, 25])."""
    import datetime

    from mr_dice_spark.operators.timeseries import trailing_distinct_count

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        ("k", t0, "A"),
        ("k", t0 + datetime.timedelta(hours=1), "B"),
        ("k", t0 + datetime.timedelta(hours=25), "A"),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, u string")
    got = {
        int((r["bucket"] - t0.replace(tzinfo=None)).total_seconds() // 3600):
        (r["n_events_bucket"], r["n_distinct_trailing"])
        for r in trailing_distinct_count(df, "k", "ts", "u", 3600, 24).collect()
    }
    assert got == {0: (1, 1), 1: (1, 2), 25: (1, 1)}
    import pytest
    with pytest.raises(ValueError, match="trailing_buckets"):
        trailing_distinct_count(df, "k", "ts", "u", 3600, 0)


def test_holt_linear_matches_python_reference_and_edge_cases(spark):
    """Hand recurrence on a known series; single-point series warm-starts
    at trend 0; NULLs excluded; parameter validation fires."""
    import pytest

    from mr_dice_spark.operators.timeseries import holt_linear_smooth

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    series = [10.0, 12.0, 15.0, 14.0, 18.0]
    rows = [("a", t0 + dt.timedelta(hours=i), v) for i, v in enumerate(series)]
    rows += [("b", t0, 7.0)]                      # single point
    rows += [(None, t0, 1.0), ("c", t0, None)]    # excluded
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    got = {r["k"]: r for r in holt_linear_smooth(df, "k", "ts", "v", 0.3, 0.2).collect()}
    l, b = series[0], 0.0
    for v in series[1:]:
        nl = 0.3 * v + (1.0 - 0.3) * (l + b)
        b = 0.2 * (nl - l) + (1.0 - 0.2) * b
        l = nl
    ra = got["a"]
    assert ra["n_points"] == 5
    assert abs(ra["level"] - l) < 1e-12 and abs(ra["trend"] - b) < 1e-12
    assert abs(ra["forecast_1"] - (l + b)) < 1e-12
    rb = got["b"]
    assert rb["n_points"] == 1 and rb["level"] == 7.0 and rb["trend"] == 0.0
    assert "c" not in got and None not in got
    with pytest.raises(ValueError, match="alpha"):
        holt_linear_smooth(df, "k", "ts", "v", alpha=0.0)
    # rising series: trend must be positive and the forecast above level
    assert ra["trend"] > 0 and ra["forecast_1"] > ra["level"]


def test_holt_linear_tie_determinism_and_hot_key_breaker(spark):
    """Duplicate (key, ts) rows: the stable (ts, value) mergesort gives
    ONE deterministic order regardless of input arrangement (ADVICE r6 —
    pandas' default quicksort made tied timestamps run-dependent in an
    order-sensitive recurrence). The per-key row cap fails fast instead
    of materializing a hot key's full series in one Arrow batch."""
    import datetime as dt

    import pytest

    from mr_dice_spark.operators.timeseries import holt_linear_smooth

    t0 = dt.datetime(2024, 1, 1)
    rows = [("a", t0, 5.0), ("a", t0, 1.0), ("a", t0, 3.0),
            ("a", t0 + dt.timedelta(hours=1), 2.0)]
    outs = []
    for perm in (rows, rows[::-1], [rows[2], rows[0], rows[3], rows[1]]):
        df = spark.createDataFrame(perm, "k string, ts timestamp, v double")
        r = holt_linear_smooth(df, "k", "ts", "v", 0.3, 0.2).collect()[0]
        outs.append((r["level"], r["trend"], r["forecast_1"]))
    assert outs[0] == outs[1] == outs[2]
    # hand recurrence over the tie-broken order 1,3,5 then 2
    l, b = 1.0, 0.0
    for v in (3.0, 5.0, 2.0):
        nl = 0.3 * v + (1.0 - 0.3) * (l + b)
        b = 0.2 * (nl - l) + (1.0 - 0.2) * b
        l = nl
    assert abs(outs[0][0] - l) < 1e-12 and abs(outs[0][1] - b) < 1e-12
    big = spark.range(0, 50).select(
        F.lit("hot").alias("k"),
        F.timestamp_seconds(F.col("id")).alias("ts"),
        F.col("id").cast("double").alias("v"),
    )
    with pytest.raises(Exception, match="max_points_per_key"):
        holt_linear_smooth(big, "k", "ts", "v", max_points_per_key=10).collect()


def test_seasonal_naive_backtest_hand_series(spark):
    """Season-2 hand series: forecasts, sMAPE and the naive-1 MASE
    denominator check against literal arithmetic; a series shorter than
    the season returns NULL stats but stays present."""
    import datetime as dt

    from mr_dice_spark.operators.timeseries import seasonal_naive_backtest

    t0 = dt.datetime(2024, 1, 1)
    series = [10.0, 20.0, 12.0, 18.0, 16.0]
    rows = [("a", t0 + dt.timedelta(hours=i), v) for i, v in enumerate(series)]
    rows += [("short", t0, 5.0), ("short", t0 + dt.timedelta(hours=1), 7.0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    got = {
        r["k"]: r
        for r in seasonal_naive_backtest(
            df, "k", "ts", "v", season=2, step_seconds=3600
        ).collect()
    }
    ra = got["a"]
    # scored buckets: t=2 (f=10), t=3 (f=20), t=4 (f=12)
    errs = [abs(12 - 10), abs(18 - 20), abs(16 - 12)]
    mae = sum(errs) / 3
    smape = (
        2 * 2 / (12 + 10) + 2 * 2 / (18 + 20) + 2 * 4 / (16 + 12)
    ) / 3
    d1 = (abs(20 - 10) + abs(12 - 20) + abs(18 - 12) + abs(16 - 18)) / 4
    assert ra["n_buckets"] == 5 and ra["n_scored"] == 3
    assert abs(ra["mae"] - mae) < 1e-6
    assert abs(ra["smape"] - smape) < 1e-6
    assert abs(ra["mase"] - mae / d1) < 1e-6
    rs = got["short"]
    assert rs["n_scored"] == 0 and rs["mae"] is None and rs["mase"] is None


def test_cross_correlation_planted_lag(spark):
    """Series B leads A by exactly one bucket (A(h) = B(h-1)): xcorr = 1
    at lag 1, and the lag-0 pairing of a linear-vs-shifted series stays
    below it; calendar gaps pair nothing; bad lags fail fast."""
    import datetime as dt

    import pytest

    from mr_dice_spark.operators.timeseries import cross_correlation_by_lag

    t0 = dt.datetime(2024, 1, 1)
    bvals = [1.0, 4.0, 2.0, 8.0, 5.0, 9.0, 3.0, 7.0]
    rows = []
    for i, v in enumerate(bvals):
        rows.append(("B", t0 + dt.timedelta(hours=i), v))
        rows.append(("A", t0 + dt.timedelta(hours=i + 1), v))  # A(h)=B(h-1)
    df = spark.createDataFrame(rows, "s string, ts timestamp, v double")
    got = {
        r["lag"]: r
        for r in cross_correlation_by_lag(
            df, "ts", "v", "s", "A", "B", lags=[0, 1]
        ).collect()
    }
    assert got[1]["n_pairs"] == 8 and abs(got[1]["xcorr"] - 1.0) < 1e-9
    assert got[0]["n_pairs"] == 7 and got[0]["xcorr"] < 1.0
    with pytest.raises(ValueError, match="lags"):
        cross_correlation_by_lag(df, "ts", "v", "s", "A", "B", lags=[])


def test_pinball_loss_hand_series(spark):
    """Season-1 hand series: pinball at q=0.5 is half the MAE; an
    asymmetric q penalizes under-forecasts harder; validation fires."""
    import datetime as dt

    import pytest

    from mr_dice_spark.operators.timeseries import pinball_forecast_loss

    t0 = dt.datetime(2024, 1, 1)
    series = [10.0, 14.0, 8.0, 8.0]  # errs vs lag-1 forecast: +4, -6, 0
    rows = [("a", t0 + dt.timedelta(hours=i), v) for i, v in enumerate(series)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    got = {
        r["quantile"]: r
        for r in pinball_forecast_loss(
            df, "k", "ts", "v", quantiles=[0.5, 0.9], season=1
        ).collect()
    }
    # q=.5: mean(.5*4, .5*6, 0) = mean(2,3,0)
    assert abs(got[0.5]["pinball"] - (2 + 3 + 0) / 3) < 1e-6
    # q=.9: under-forecast err=+4 costs .9*4; over-forecast err=-6 costs .1*6
    assert abs(got[0.9]["pinball"] - (3.6 + 0.6 + 0) / 3) < 1e-6
    assert got[0.5]["n_scored"] == 3 and got[0.5]["n_buckets"] == 4
    with pytest.raises(ValueError, match="quantiles"):
        pinball_forecast_loss(df, "k", "ts", "v", quantiles=[1.5])


def test_page_hinkley_hand_values(spark):
    # series [0, 0, 3] at 1s buckets, delta=0: at t3 the running mean is
    # 1, so the increase sum jumps to 2 (> lambda=1 -> drift); the
    # decrease side stays clamped at 0
    from pyspark.sql import functions as F

    from mr_dice_spark.operators.timeseries import page_hinkley

    rows = [("k", 0, 0.0), ("k", 1, 0.0), ("k", 2, 3.0)]
    df = spark.createDataFrame(rows, "k string, t long, v double").select(
        "k", F.timestamp_seconds("t").alias("ts"), "v"
    )
    out = page_hinkley(df, "k", "ts", "v", step_seconds=1,
                       delta=0.0, lambda_threshold=1.0)
    got = sorted(out.collect(), key=lambda r: r["bucket"])
    assert [r["ph_inc"] for r in got] == pytest.approx([0.0, 0.0, 2.0], abs=1e-6)
    assert [r["ph_dec"] for r in got] == pytest.approx([0.0, 0.0, 0.0], abs=1e-6)
    assert [r["is_drift"] for r in got] == [False, False, True]


def test_page_hinkley_detects_decrease(spark):
    # mirrored series [3, 3, 0]: the DECREASE side fires symmetrically
    from pyspark.sql import functions as F

    from mr_dice_spark.operators.timeseries import page_hinkley

    rows = [("k", 0, 3.0), ("k", 1, 3.0), ("k", 2, 0.0)]
    df = spark.createDataFrame(rows, "k string, t long, v double").select(
        "k", F.timestamp_seconds("t").alias("ts"), "v"
    )
    out = page_hinkley(df, "k", "ts", "v", step_seconds=1,
                       delta=0.0, lambda_threshold=1.0)
    got = sorted(out.collect(), key=lambda r: r["bucket"])
    assert got[-1]["ph_dec"] == pytest.approx(2.0, abs=1e-6)
    assert got[-1]["ph_inc"] == pytest.approx(0.0, abs=1e-6)
    assert got[-1]["is_drift"]


def test_seasonal_decompose_pure_period4_signal(spark):
    # pure period-4 signal [0,5,0,-5] with zero trend: the 2x4
    # half-weighted MA of a periodic series is exactly its mean (0), so
    # detrended == signal, phase indices recover [0,5,0,-5] and the
    # remainder is zero -> strength 1.0; trend exists for t=2..17 ->
    # 4 observations per phase
    from pyspark.sql import functions as F

    from mr_dice_spark.operators.timeseries import seasonal_decompose

    s = [0.0, 5.0, 0.0, -5.0]
    rows = [("k", t, s[t % 4]) for t in range(20)]
    df = spark.createDataFrame(rows, "k string, t long, v double").select(
        "k", F.timestamp_seconds("t").alias("ts"), "v"
    )
    out = seasonal_decompose(df, "k", "ts", "v", step_seconds=1, period=4)
    got = {r["phase"]: r for r in out.collect()}
    assert [got[p]["seasonal"] for p in range(4)] == pytest.approx(
        [0.0, 5.0, 0.0, -5.0], abs=1e-6
    )
    assert all(got[p]["n_obs"] == 4 for p in range(4))
    assert got[0]["seasonal_strength"] == pytest.approx(1.0, abs=1e-4)


def test_seasonal_decompose_odd_period_and_validation(spark):
    # odd period uses the plain centered MA: period-3 signal [3,0,-3]
    # recovers exactly; period < 2 raises
    from pyspark.sql import functions as F

    from mr_dice_spark.operators.timeseries import seasonal_decompose

    s = [3.0, 0.0, -3.0]
    rows = [("k", t, s[t % 3]) for t in range(12)]
    df = spark.createDataFrame(rows, "k string, t long, v double").select(
        "k", F.timestamp_seconds("t").alias("ts"), "v"
    )
    out = seasonal_decompose(df, "k", "ts", "v", step_seconds=1, period=3)
    got = {r["phase"]: r["seasonal"] for r in out.collect()}
    assert [got[p] for p in range(3)] == pytest.approx([3.0, 0.0, -3.0], abs=1e-6)
    with pytest.raises(ValueError):
        seasonal_decompose(df, "k", "ts", "v", period=1)


def test_seasonal_decompose_gap_yields_null_trend_not_bias(spark):
    # knock one observation out of the period-4 signal: every centered
    # window covering the gap loses its trend (NULL), phase counts drop,
    # but the recovered indices stay exact (no biased fill-in)
    from pyspark.sql import functions as F

    from mr_dice_spark.operators.timeseries import seasonal_decompose

    s = [0.0, 5.0, 0.0, -5.0]
    rows = [("k", t, s[t % 4]) for t in range(20) if t != 9]
    df = spark.createDataFrame(rows, "k string, t long, v double").select(
        "k", F.timestamp_seconds("t").alias("ts"), "v"
    )
    out = seasonal_decompose(df, "k", "ts", "v", step_seconds=1, period=4)
    got = {r["phase"]: r for r in out.collect()}
    assert [got[p]["seasonal"] for p in range(4)] == pytest.approx(
        [0.0, 5.0, 0.0, -5.0], abs=1e-6
    )
    assert sum(got[p]["n_obs"] for p in range(4)) < 16


def test_mann_kendall_hand_values(spark):
    # strictly increasing 4 buckets: S=6, no ties -> Var = 4*3*13/18,
    # z = (6-1)/sqrt(Var); mirrored decreasing -> S=-6, z negated;
    # constant -> Var=0 -> NULL z (fail-closed)
    import math

    from pyspark.sql import functions as F

    from mr_dice_spark.operators.timeseries import mann_kendall_trend

    rows = (
        [("up", t, float(t + 1)) for t in range(4)]
        + [("dn", t, float(4 - t)) for t in range(4)]
        + [("fl", t, 5.0) for t in range(4)]
    )
    df = spark.createDataFrame(rows, "k string, t long, v double").select(
        "k", F.timestamp_seconds("t").alias("ts"), "v"
    )
    got = {r["k"]: r for r in
           mann_kendall_trend(df, "k", "ts", "v", step_seconds=1).collect()}
    var = 4 * 3 * 13 / 18
    assert got["up"]["s"] == 6 and got["dn"]["s"] == -6
    assert got["up"]["z"] == pytest.approx(5 / math.sqrt(var), abs=1e-6)
    assert got["dn"]["z"] == pytest.approx(-5 / math.sqrt(var), abs=1e-6)
    assert got["fl"]["s"] == 0 and got["fl"]["z"] is None
    assert got["fl"]["var_s"] == pytest.approx(0.0, abs=1e-4)


def test_best_changepoint_planted_shift(spark):
    # key A: [1,1,1,5,5] -> split after pos 3 (gain 19.2), means 1 and 5;
    # hand gains: k=2 -> 8.533..., k=3 -> 19.2, k=4 -> 7.2
    from mr_dice_spark.operators.timeseries import best_changepoint

    rows = [("A", i + 1, v) for i, v in enumerate([1.0, 1.0, 1.0, 5.0, 5.0])]
    df = spark.createDataFrame(rows, "k string, o int, v double")
    [r] = best_changepoint(df, "k", "o", "v").collect()
    assert r["n"] == 5 and r["split_pos"] == 3 and r["split_order"] == 3
    assert r["gain"] == pytest.approx(19.2, abs=1e-6)
    assert r["mean_left"] == pytest.approx(1.0, abs=1e-6)
    assert r["mean_right"] == pytest.approx(5.0, abs=1e-6)


def test_best_changepoint_tie_and_degenerate(spark):
    from mr_dice_spark.operators.timeseries import best_changepoint

    # constant series: every gain 0 -> smallest k wins
    rows = [("A", i, 2.0) for i in range(3)] + [("B", 0, 7.0)]
    df = spark.createDataFrame(rows, "k string, o int, v double")
    got = {r["k"]: r for r in best_changepoint(df, "k", "o", "v").collect()}
    assert got["A"]["split_pos"] == 1
    assert got["A"]["gain"] == pytest.approx(0.0, abs=1e-6)
    # single-row key: no interior split -> NULL row with n reported
    assert got["B"]["n"] == 1 and got["B"]["split_pos"] is None
    assert got["B"]["gain"] is None and got["B"]["mean_left"] is None


# ---------------------------------------------------------------------------
# Chow structural-break test
# ---------------------------------------------------------------------------


def test_chow_test_clear_break_vs_one_line(spark):
    import pytest as _pt

    from mr_dice_spark.operators.timeseries import chow_test

    # key 'b': slope 1 before x<=5, slope -1 after -> huge F
    rows_b = [("b", float(x), float(x)) for x in range(1, 6)]
    rows_b += [("b", float(x), float(10 - x)) for x in range(6, 11)]
    # key 'l': one line y = 2x + noise-free -> pooled fits perfectly,
    # pinned SSEs all 0 -> F NULL (nothing to ratio)
    rows_l = [("l", float(x), 2.0 * x) for x in range(1, 11)]
    df = spark.createDataFrame(rows_b + rows_l, "k string, x double, y double")
    out = {r["k"]: r for r in chow_test(df, "k", "x", "y", breakpoint=5.0).collect()}
    b, line = out["b"], out["l"]
    assert (b["n"], b["n_1"], b["n_2"]) == (10, 5, 5)
    assert b["sse_1"] == _pt.approx(0.0, abs=1e-6)
    assert b["sse_2"] == _pt.approx(0.0, abs=1e-6)
    assert b["sse_pooled"] > 10.0
    assert b["f_stat"] is None  # perfect segment fits -> pinned 0 denominator
    assert line["f_stat"] is None and line["sse_pooled"] == 0.0


def test_chow_test_f_statistic_hand_computed(spark):
    import pytest as _pt

    from mr_dice_spark.operators.timeseries import chow_test

    # segment 1: y = x with one bent point; segment 2: y = x + 3 offset
    rows = [("k", 1.0, 1.0), ("k", 2.0, 2.0), ("k", 3.0, 3.5),
            ("k", 4.0, 7.0), ("k", 5.0, 8.0), ("k", 6.0, 9.5)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    [r] = chow_test(df, "k", "x", "y", breakpoint=3.0).collect()
    # hand numbers via numpy-style OLS power sums
    import numpy as np

    def sse(pts):
        x = np.array([p[0] for p in pts]); y = np.array([p[1] for p in pts])
        n = len(x)
        sxx = (x * x).sum() - x.sum() ** 2 / n
        sxy = (x * y).sum() - x.sum() * y.sum() / n
        syy = (y * y).sum() - y.sum() ** 2 / n
        return syy - sxy ** 2 / sxx

    p = [(1, 1), (2, 2), (3, 3.5), (4, 7), (5, 8), (6, 9.5)]
    s_p = round(sse(p) + 1e-9, 6)
    s_1 = round(sse(p[:3]) + 1e-9, 6)
    s_2 = round(sse(p[3:]) + 1e-9, 6)
    f = ((s_p - s_1 - s_2) / 2.0) / ((s_1 + s_2) / 2.0)
    assert r["sse_pooled"] == _pt.approx(s_p, abs=1e-6)
    assert r["f_stat"] == _pt.approx(f, abs=1e-3)


def test_chow_test_guards(spark):
    from mr_dice_spark.operators.timeseries import chow_test

    # n = 4 (< 5): F NULL; NULL rows excluded
    rows = [("k", 1.0, 1.0), ("k", 2.0, 2.2), ("k", 3.0, 2.9),
            ("k", 4.0, 4.1), (None, 5.0, 5.0), ("k", None, 6.0),
            ("k", 7.0, None)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    [r] = chow_test(df, "k", "x", "y", breakpoint=2.0).collect()
    assert r["n"] == 4 and r["f_stat"] is None


def test_chow_test_row_order_invariant(spark):
    import random

    from mr_dice_spark.operators.timeseries import chow_test

    rng = random.Random(5)
    rows = [("k", float(x), rng.uniform(0, 10)) for x in range(1, 21)]
    df1 = spark.createDataFrame(rows, "k string, x double, y double")
    df2 = spark.createDataFrame(list(reversed(rows)), "k string, x double, y double")
    r1 = chow_test(df1, "k", "x", "y", breakpoint=10.0).collect()[0]
    r2 = chow_test(df2, "k", "x", "y", breakpoint=10.0).collect()[0]
    # the 6dp SSE pins make the output row-order-deterministic
    assert r1.asDict() == r2.asDict()


def test_wasserstein_1_hand_computed(spark):
    import pytest as _pt

    from mr_dice_spark.operators.timeseries import wasserstein_1

    # A = {0, 1}, B = {1, 2}: |F_A - F_B| is 0.5 on [0,1) and 0.5 on
    # [1,2) -> W1 = 1.0 (a unit shift of a uniform pair)
    rows = [("k", True, 0.0), ("k", True, 1.0),
            ("k", False, 1.0), ("k", False, 2.0),
            ("one_sided", True, 5.0),
            (None, True, 1.0), ("k", None, 1.0), ("k", True, None),
            ("k", True, float("nan"))]  # NaN excluded like NULL
    df = spark.createDataFrame(rows, "k string, a boolean, v double")
    got = {r["k"]: r for r in wasserstein_1(df, "k", "a", "v", True).collect()}
    assert got["k"]["w1"] == _pt.approx(1.0, abs=1e-6)
    assert (got["k"]["n_a"], got["k"]["n_b"]) == (2, 2)
    assert got["one_sided"]["w1"] is None  # missing sample B fail-closed
    assert set(got) == {"k", "one_sided"}  # NULL rows excluded


def test_wasserstein_1_identical_and_point_mass(spark):
    from mr_dice_spark.operators.timeseries import wasserstein_1

    rows = [("same", s, float(v)) for s in (True, False) for v in (1, 2, 3)]
    rows += [("point", True, 7.0), ("point", False, 7.0)]
    df = spark.createDataFrame(rows, "k string, a boolean, v double")
    got = {r["k"]: r["w1"] for r in wasserstein_1(df, "k", "a", "v", True).collect()}
    assert got["same"] == 0.0
    assert got["point"] == 0.0  # single shared value: no gap terms, W1 = 0


def test_wasserstein_1_missing_sample_fails_closed(spark):
    # a key with only one sample must report NULL w1 per the docstring,
    # not raise ANSI DIVIDE_BY_ZERO inside the aggregate (round-9 fix)
    from mr_dice_spark.operators.timeseries import wasserstein_1

    df = spark.createDataFrame(
        [("solo", True, 1.0), ("solo", True, 2.0),
         ("ok", True, 1.0), ("ok", False, 3.0)],
        "k string, s boolean, v double",
    )
    out = {r["k"]: r for r in wasserstein_1(df, "k", "s", "v", True).collect()}
    assert out["solo"]["w1"] is None
    assert out["solo"]["n_b"] == 0
    assert out["ok"]["w1"] == pytest.approx(2.0, abs=1e-6)


def test_wasserstein_1_scale_shift_property(spark):
    import random

    import pytest as _pt

    from mr_dice_spark.operators.timeseries import wasserstein_1

    # W1(A + c, B + c) == W1(A, B): translation invariance
    rng = random.Random(3)
    rows = [("k", rng.random() < 0.5, round(rng.uniform(0, 50), 2))
            for _ in range(400)]
    df = spark.createDataFrame(rows, "k string, a boolean, v double")
    shifted = df.selectExpr("k", "a", "v + 123.0 AS v")
    [r1] = wasserstein_1(df, "k", "a", "v", True).collect()
    [r2] = wasserstein_1(shifted, "k", "a", "v", True).collect()
    assert r1["w1"] == _pt.approx(r2["w1"], abs=1e-5)


# ---------------------------------------------------------------------------
# Round-9 additions: DW / Ljung-Box / runs / Gumbel / Hellinger-TVD / influence
# ---------------------------------------------------------------------------


def test_durbin_watson_hand_value_and_guards(spark):
    from mr_dice_spark.operators.timeseries import durbin_watson

    rows = list(zip([1, 2, 3, 4, 5, 6, 7, 8],
                    [2, 4, 5, 8, 11, 12, 14, 30.0]))
    df = spark.createDataFrame([("k", float(x), float(y)) for x, y in rows],
                               "k string, x double, y double")
    [r] = durbin_watson(df, "k", "x", "y").collect()
    assert r["n"] == 8
    assert r["slope"] == pytest.approx(3.214286, abs=1e-6)
    assert r["intercept"] == pytest.approx(-3.714286, abs=1e-6)
    assert r["dw"] == pytest.approx(1.580346, abs=1e-6)
    # perfect fit: SSE = 0 -> NULL dw (fail-closed)
    perf = spark.createDataFrame(
        [("p", float(i), 2.0 * i) for i in range(1, 6)],
        "k string, x double, y double",
    )
    [rp] = durbin_watson(perf, "k", "x", "y").collect()
    assert rp["dw"] is None and rp["slope"] == pytest.approx(2.0)
    # duplicate x fails closed via NULL (ambiguous lag order)
    dup = spark.createDataFrame(
        [("d", 1.0, 1.0), ("d", 1.0, 2.0), ("d", 2.0, 3.0), ("d", 3.0, 1.0)],
        "k string, x double, y double",
    )
    [rd] = durbin_watson(dup, "k", "x", "y").collect()
    assert rd["dw"] is None


def test_ljung_box_hand_value_and_guards(spark):
    from mr_dice_spark.operators.timeseries import ljung_box

    df = spark.createDataFrame(
        [("k", float(i), float(v)) for i, v in enumerate([1, 2, 3, 4, 5])],
        "k string, x double, y double",
    )
    [r] = ljung_box(df, "k", "x", "y", max_lag=2).collect()
    assert r["n"] == 5 and r["df_lags"] == 2
    assert r["q_stat"] == pytest.approx(1.516667, abs=1e-6)
    # n <= max_lag -> NULL
    [r2] = ljung_box(df, "k", "x", "y", max_lag=5).collect()
    assert r2["q_stat"] is None
    # zero variance -> NULL
    const = spark.createDataFrame(
        [("c", float(i), 7.0) for i in range(6)],
        "k string, x double, y double",
    )
    [r3] = ljung_box(const, "k", "x", "y", max_lag=2).collect()
    assert r3["q_stat"] is None
    with pytest.raises(ValueError, match="max_lag"):
        ljung_box(df, "k", "x", "y", max_lag=0)


def test_runs_test_hand_value_and_edges(spark):
    from mr_dice_spark.operators.timeseries import runs_test

    # perfectly alternating around the median: 6 runs of 6 points
    df = spark.createDataFrame(
        [("k", float(i), float(v)) for i, v in enumerate([1, 2, 1, 2, 1, 2])],
        "k string, x double, y double",
    )
    [r] = runs_test(df, "k", "x", "y").collect()
    assert (r["n_above"], r["n_below"], r["runs"]) == (3, 3, 6)
    assert r["z"] == pytest.approx(1.825742, abs=1e-6)
    # constant series: every value ties the median -> fail-closed row
    const = spark.createDataFrame(
        [("c", float(i), 5.0) for i in range(4)],
        "k string, x double, y double",
    )
    [rc] = runs_test(const, "k", "x", "y").collect()
    assert (rc["n_above"], rc["n_below"], rc["runs"]) == (0, 0, 0)
    assert rc["z"] is None
    # one run each side (fully clustered): z < 0 (too few runs)
    clust = spark.createDataFrame(
        [("g", float(i), float(v)) for i, v in enumerate([1, 1, 1, 9, 9, 9])],
        "k string, x double, y double",
    )
    [rg] = runs_test(clust, "k", "x", "y").collect()
    assert rg["runs"] == 2 and rg["z"] < 0


def test_gumbel_block_maxima_hand_value(spark):
    from mr_dice_spark.operators.timeseries import gumbel_block_maxima

    # two rows per block so the block-max stage is exercised
    rows = []
    for b, mx in enumerate([2.0, 4.0, 6.0, 3.0, 5.0]):
        rows += [("k", b, mx), ("k", b, mx - 1.0)]
    df = spark.createDataFrame(rows, "k string, b long, v double")
    [r] = gumbel_block_maxima(df, "k", "b", "v", return_period=100).collect()
    assert r["n_blocks"] == 5
    assert r["gumbel_loc"] == pytest.approx(3.288403, abs=1e-6)
    assert r["gumbel_scale"] == pytest.approx(1.232809, abs=1e-6)
    assert r["ret_level"] == pytest.approx(8.959508, abs=1e-6)
    # single block -> NULL fit
    one = spark.createDataFrame([("o", 1, 2.0)], "k string, b long, v double")
    [ro] = gumbel_block_maxima(one, "k", "b", "v").collect()
    assert ro["gumbel_loc"] is None and ro["n_blocks"] == 1
    with pytest.raises(ValueError, match="return_period"):
        gumbel_block_maxima(df, "k", "b", "v", return_period=1)


def test_hellinger_tvd_hand_value_and_missing_sample(spark):
    from mr_dice_spark.operators.timeseries import hellinger_tvd_from_buckets

    rows = (
        [("k", True, "a")] * 2 + [("k", True, "b")] * 2
        + [("k", False, "a")] * 1 + [("k", False, "b")] * 3
        + [("solo", True, "a")] * 3  # no B sample -> NULL distances
    )
    df = spark.createDataFrame(rows, "k string, s boolean, b string")
    out = {r["k"]: r for r in
           hellinger_tvd_from_buckets(df, "k", "s", "b", True).collect()}
    assert out["k"]["hellinger"] == pytest.approx(0.184592, abs=1e-6)
    assert out["k"]["tvd"] == pytest.approx(0.25, abs=1e-6)
    assert (out["k"]["n_a"], out["k"]["n_b"]) == (4, 4)
    assert out["solo"]["hellinger"] is None and out["solo"]["tvd"] is None
    # identical distributions -> 0 / 0
    same = spark.createDataFrame(
        [("i", True, "a"), ("i", False, "a"), ("i", True, "b"), ("i", False, "b")],
        "k string, s boolean, b string",
    )
    [ri] = hellinger_tvd_from_buckets(same, "k", "s", "b", True).collect()
    assert ri["hellinger"] == pytest.approx(0.0, abs=1e-6)
    assert ri["tvd"] == pytest.approx(0.0, abs=1e-6)


def test_ols_influence_hand_values_and_fail_empty(spark):
    from mr_dice_spark.operators.timeseries import ols_influence

    rows = list(zip([1, 2, 3, 4, 5, 6, 7, 8],
                    [2, 4, 5, 8, 11, 12, 14, 30.0]))
    df = spark.createDataFrame([("k", float(x), float(y)) for x, y in rows],
                               "k string, x double, y double")
    out = ols_influence(df, "k", "x", "y", top_k=3).orderBy(
        F.desc("cooks_d")
    ).collect()
    assert [r["x"] for r in out] == [8.0, 7.0, 1.0]
    top = out[0]
    assert top["leverage"] == pytest.approx(0.416667, abs=1e-6)
    assert top["std_resid"] == pytest.approx(2.429018, abs=1e-6)
    assert top["cooks_d"] == pytest.approx(2.107189, abs=1e-6)
    # perfect fit -> no rows (fail-empty, nothing to rank)
    perf = spark.createDataFrame(
        [("p", float(i), 3.0 * i) for i in range(1, 8)],
        "k string, x double, y double",
    )
    assert ols_influence(perf, "k", "x", "y").count() == 0
    # n < 4 -> no rows
    tiny = spark.createDataFrame(
        [("t", 1.0, 1.0), ("t", 2.0, 3.0), ("t", 3.0, 2.0)],
        "k string, x double, y double",
    )
    assert ols_influence(tiny, "k", "x", "y").count() == 0
    with pytest.raises(ValueError, match="top_k"):
        ols_influence(df, "k", "x", "y", top_k=0)


# ---------------------------------------------------------------------------
# Round-10: Cramér–von Mises + energy distance (two-sample drift family)
# ---------------------------------------------------------------------------


def _brute_cvm_energy(A, B):
    n, m = len(A), len(B)
    N = n + m

    def cdf(s, x):
        return sum(1 for t in s if t <= x) / len(s)

    cvm = n * m / N**2 * sum((cdf(A, x) - cdf(B, x)) ** 2 for x in A + B)
    exy = sum(abs(a - b) for a in A for b in B) / (n * m)
    exx = sum(abs(a - b) for a in A for b in A) / (n * n)
    eyy = sum(abs(a - b) for a in B for b in B) / (m * m)
    return cvm, 2 * exy - exx - eyy


def test_cvm_and_energy_hand_computed(spark):
    from mr_dice_spark.operators.timeseries import (
        cramer_von_mises_2s,
        energy_distance_2s,
    )

    A = [1.0, 2.5, 2.5, 4.0, 7.0]
    B = [2.0, 2.5, 5.0, 6.0]
    rows = [("k", True, v) for v in A] + [("k", False, v) for v in B]
    # NULL/NaN rows excluded like wasserstein_1
    rows += [(None, True, 1.0), ("k", None, 1.0), ("k", True, None),
             ("k", True, float("nan"))]
    df = spark.createDataFrame(rows, "k string, a boolean, v double")
    cvm_exp, d2_exp = _brute_cvm_energy(A, B)

    got = cramer_von_mises_2s(df, "k", "a", "v", True).collect()[0]
    assert (got["n_a"], got["n_b"]) == (5, 4)
    assert got["cvm"] == pytest.approx(cvm_exp, abs=2e-6)

    ed = energy_distance_2s(df, "k", "a", "v", True).collect()[0]
    assert (ed["n_a"], ed["n_b"]) == (5, 4)
    assert ed["energy_d2"] == pytest.approx(d2_exp, abs=2e-6)
    assert ed["energy_d"] == pytest.approx(d2_exp**0.5, abs=2e-6)


def test_cvm_and_energy_identical_and_missing_sample(spark):
    from mr_dice_spark.operators.timeseries import (
        cramer_von_mises_2s,
        energy_distance_2s,
    )

    rows = [("same", s, float(v)) for s in (True, False) for v in (1, 2, 3)]
    rows += [("solo", True, 5.0), ("point", True, 7.0), ("point", False, 7.0)]
    df = spark.createDataFrame(rows, "k string, a boolean, v double")

    cvm = {r["k"]: r for r in cramer_von_mises_2s(df, "k", "a", "v", True).collect()}
    assert cvm["same"]["cvm"] == 0.0
    assert cvm["point"]["cvm"] == 0.0
    assert cvm["solo"]["cvm"] is None  # fail-closed, no DIVIDE_BY_ZERO

    ed = {r["k"]: r for r in energy_distance_2s(df, "k", "a", "v", True).collect()}
    assert ed["same"]["energy_d2"] == 0.0 and ed["same"]["energy_d"] == 0.0
    assert ed["point"]["energy_d2"] == 0.0
    assert ed["solo"]["energy_d2"] is None and ed["solo"]["energy_d"] is None


def test_cvm_and_energy_shift_properties(spark):
    """A pure location shift: energy D^2 grows with the shift and is
    translation-invariant in the pair; CvM saturates toward its
    disjoint-support ceiling nm(n+m)/... — both must strictly exceed
    the half-overlap case."""
    import random

    from mr_dice_spark.operators.timeseries import (
        cramer_von_mises_2s,
        energy_distance_2s,
    )

    rng = random.Random(7)
    base = [round(rng.uniform(0, 10), 2) for _ in range(60)]
    rows = []
    for tag, shift in (("small", 1.0), ("big", 8.0)):
        rows += [(tag, True, v) for v in base]
        rows += [(tag, False, round(v + shift, 2)) for v in base]
    # translation invariance: the same pair moved +50 must score the same
    rows += [("moved", True, round(v + 50.0, 2)) for v in base]
    rows += [("moved", False, round(v + 1.0 + 50.0, 2)) for v in base]
    df = spark.createDataFrame(rows, "k string, a boolean, v double")
    cvm = {r["k"]: r["cvm"] for r in cramer_von_mises_2s(df, "k", "a", "v", True).collect()}
    ed = {r["k"]: r["energy_d2"] for r in energy_distance_2s(df, "k", "a", "v", True).collect()}
    assert cvm["big"] > cvm["small"] > 0
    assert ed["big"] > ed["small"] > 0
    assert ed["moved"] == pytest.approx(ed["small"], abs=1e-6)
    assert cvm["moved"] == pytest.approx(cvm["small"], abs=1e-6)


# ---------------------------------------------------------------------------
# Round-10: PACF (Durbin-Levinson closed forms) + Hurst R/S
# ---------------------------------------------------------------------------


def _brute_pacf(y):
    n = len(y)
    m = sum(y) / n
    d = [v - m for v in y]
    ss = sum(x * x for x in d)
    r = [1.0] + [
        sum(d[t] * d[t - h] for t in range(h, n)) / ss for h in (1, 2, 3)
    ]
    p1 = r[1]
    p2 = (r[2] - r[1] ** 2) / (1 - r[1] ** 2)
    f21 = p1 - p2 * p1
    p3 = (r[3] - f21 * r[2] - p2 * r[1]) / (1 - f21 * r[1] - p2 * r[2])
    return r[1:], [p1, p2, p3]


def test_pacf_hand_computed_and_fail_closed(spark):
    import random

    from mr_dice_spark.operators.timeseries import pacf_by_lag

    rng = random.Random(11)
    y = [0.0]
    for _ in range(59):
        y.append(round(0.7 * y[-1] + rng.gauss(0, 1), 2))
    y = [round(v + 5.0, 2) for v in y]
    rows = [("a", float(i), v) for i, v in enumerate(y)]
    rows += [("short", 1.0, 1.0), ("short", 2.0, 2.0), ("short", 3.0, 3.0)]
    rows += [("const", float(i), 2.0) for i in range(10)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    out = pacf_by_lag(df, "k", "x", "y").collect()
    got = {(r["k"], r["lag"]): r for r in out}
    racf, rpacf = _brute_pacf(y)
    for h in (1, 2, 3):
        assert got[("a", h)]["acf"] == pytest.approx(racf[h - 1], abs=5e-6)
        assert got[("a", h)]["pacf"] == pytest.approx(rpacf[h - 1], abs=5e-6)
        assert got[("a", h)]["n"] == 60
        # n <= 3 and zero-variance keys fail closed at every lag
        for k in ("short", "const"):
            g = got[(k, h)]
            assert g["acf"] is None and g["pacf"] is None
    assert len(out) == 9  # 3 rows per key, always


def test_pacf_ar1_cuts_off_after_lag1(spark):
    """For an AR(1) series, pacf_1 is large and pacf_2/pacf_3 are near
    zero — the identification property the operator exists for."""
    import random

    from mr_dice_spark.operators.timeseries import pacf_by_lag

    rng = random.Random(5)
    y = [0.0]
    for _ in range(499):
        y.append(round(0.8 * y[-1] + rng.gauss(0, 1), 2))
    df = spark.createDataFrame(
        [("a", float(i), v) for i, v in enumerate(y)],
        "k string, x double, y double",
    )
    got = {r["lag"]: r["pacf"] for r in pacf_by_lag(df, "k", "x", "y").collect()}
    assert got[1] > 0.7
    assert abs(got[2]) < 0.15 and abs(got[3]) < 0.15


def _brute_hurst(y, sizes=(8, 16, 32, 64)):
    import math

    pts = []
    for s in sizes:
        rss = []
        for b in range(len(y) // s):
            blk = y[b * s:(b + 1) * s]
            m = sum(blk) / s
            var = sum((v - m) ** 2 for v in blk) / s
            if var <= 0:
                continue
            cum, zs = 0.0, []
            for v in blk:
                cum += v
                zs.append(cum - (len(zs) + 1) * m)
            rss.append((max(zs) - min(zs)) / math.sqrt(var))
        if rss and sum(rss) / len(rss) > 0:
            pts.append((math.log2(s), math.log2(sum(rss) / len(rss))))
    n = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    return (n * sxy - sx * sy) / (n * sxx - sx * sx), n


def test_hurst_hand_computed_and_regimes(spark):
    import random

    from mr_dice_spark.operators.timeseries import hurst_rs

    rng = random.Random(42)
    wn = [round(rng.gauss(0, 1), 2) for _ in range(512)]
    prev, tr = 0.0, []
    for _ in range(512):
        prev = 0.8 * prev + rng.gauss(0, 1)
        tr.append(round(prev, 2))
    rows = [("wn", float(i), v) for i, v in enumerate(wn)]
    rows += [("tr", float(i), v) for i, v in enumerate(tr)]
    rows += [("const", float(i), 3.0) for i in range(200)]
    rows += [("short", float(i), float(i % 7)) for i in range(10)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    got = {r["k"]: r for r in hurst_rs(df, "k", "x", "y").collect()}
    for k, y in (("wn", wn), ("tr", tr)):
        exp, npts = _brute_hurst(y)
        assert got[k]["hurst"] == pytest.approx(exp, abs=1e-4)
        assert got[k]["n_scales"] == npts
    assert got["const"]["hurst"] is None and got["const"]["n_scales"] == 0
    assert got["short"]["hurst"] is None  # one usable ladder point
    # persistence orders the exponents
    assert got["tr"]["hurst"] > got["wn"]["hurst"]


def test_hurst_sub_block_key_is_dropped(spark):
    """A key with n < block_sizes[0] never fills a complete block at any
    scale: the complete-block filter drops it from the output entirely
    (the documented fail-empty convention — NOT a NULL-hurst row)."""
    from mr_dice_spark.operators.timeseries import hurst_rs

    rows = [("tiny", float(i), float(i % 3)) for i in range(7)]  # n=7 < 8
    rows += [("ok", float(i), float((i * 7) % 13)) for i in range(40)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    out = hurst_rs(df, "k", "x", "y").collect()
    keys = {r["k"] for r in out}
    assert keys == {"ok"}  # 'tiny' vanishes, no NULL row


def test_hurst_validates_block_ladder(spark):
    from mr_dice_spark.operators.timeseries import hurst_rs

    df = spark.createDataFrame([("a", 1.0, 1.0)], "k string, x double, y double")
    for bad in ((8,), (16, 8), (8, 8, 16), (1, 8)):
        with pytest.raises(ValueError, match="block_sizes"):
            hurst_rs(df, "k", "x", "y", block_sizes=bad)


def test_dispersion_index_hand_computed(spark):
    import statistics

    from mr_dice_spark.operators.timeseries import dispersion_index

    rows = [("A", 1)] * 3 + [("A", 2)] * 1 + [("A", 3)] * 2 + [("B", 1)] * 4
    rows += [(None, 1), ("A", None)]  # excluded
    df = spark.createDataFrame(rows, "k string, b int")
    got = {r["k"]: r for r in dispersion_index(df, "k", "b").collect()}
    cnts = [3, 1, 2]
    vmr = statistics.variance(cnts) / statistics.mean(cnts)
    assert (got["A"]["n_buckets"], got["A"]["total"]) == (3, 6)
    assert got["A"]["vmr"] == pytest.approx(vmr, abs=1e-9)
    assert got["A"]["chi2"] == pytest.approx(2 * vmr, abs=1e-5)
    assert got["A"]["dof"] == 2
    # single observed bucket: undefined, all-NULL fail-closed
    assert got["B"]["vmr"] is None and got["B"]["chi2"] is None
    assert got["B"]["dof"] is None


def test_dispersion_index_poisson_regimes(spark):
    from mr_dice_spark.operators.timeseries import dispersion_index

    # regular (every bucket exactly 5 arrivals) -> VMR 0; bursty (one
    # bucket holds half the mass) -> VMR >> 1
    rows = [("reg", b) for b in range(20) for _ in range(5)]
    rows += [("burst", 0)] * 50 + [("burst", b) for b in range(1, 20) for _ in range(3)]
    df = spark.createDataFrame(rows, "k string, b int")
    got = {r["k"]: r["vmr"] for r in dispersion_index(df, "k", "b").collect()}
    assert got["reg"] == 0.0
    assert got["burst"] > 10.0


def test_hampel_outliers_spike_and_edges(spark):
    from datetime import datetime, timedelta

    from mr_dice_spark.operators.timeseries import hampel_outliers

    base = datetime(2024, 1, 1)
    vals = [10.0, 10.2, 9.8, 10.1, 9.9, 10.0, 100.0,
            10.3, 9.7, 10.0, 10.1, 9.9, 10.2]
    rows = [("k", base + timedelta(hours=i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    got = {r["bucket"].hour: r for r in hampel_outliers(df, "k", "ts", "v").collect()}

    win = sorted(vals[3:10])
    med = win[3]
    mad = sorted(abs(x - med) for x in vals[3:10])[3]
    assert got[6]["med"] == med and got[6]["mad"] == mad
    assert got[6]["robust_z"] == round(0.6745 * (100.0 - med) / mad + 1e-9, 4)
    assert got[6]["outlier"] is True
    # the spike's neighbours are judged against windows CONTAINING the
    # spike — a median shrugs it off, so they survive
    assert got[5]["outlier"] is False and got[7]["outlier"] is False
    # edges (< 7 neighbours) are NOT screened: NULL, not False
    for h in (0, 1, 2, 10, 11, 12):
        assert got[h]["robust_z"] is None and got[h]["outlier"] is None
        assert got[h]["med"] is None and got[h]["mad"] is None


def test_hampel_constant_window_fails_closed_and_validates(spark):
    from datetime import datetime, timedelta

    from mr_dice_spark.operators.timeseries import hampel_outliers

    base = datetime(2024, 1, 1)
    rows = [("k", base + timedelta(hours=i), 5.0) for i in range(9)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    got = {r["bucket"].hour: r for r in hampel_outliers(df, "k", "ts", "v").collect()}
    assert got[4]["mad"] == 0.0            # complete window, constant
    assert got[4]["robust_z"] is None      # zero-MAD: fail closed
    assert got[4]["outlier"] is None
    with pytest.raises(ValueError, match="half_window"):
        hampel_outliers(df, "k", "ts", "v", half_window=0)
    with pytest.raises(ValueError, match="threshold"):
        hampel_outliers(df, "k", "ts", "v", threshold=0.0)


def _brute_kpss(y, q=4):
    n = len(y)
    m = sum(y) / n
    e = [v - m for v in y]
    g = [sum(e[t] * e[t - h] for t in range(h, n)) / n for h in range(q + 1)]
    lrv = g[0] + 2 * sum((1 - h / (q + 1)) * g[h] for h in range(1, q + 1))
    S, cum = [], 0.0
    for v in e:
        cum += v
        S.append(cum)
    return lrv, sum(s * s for s in S) / (n * n * lrv)


def test_kpss_hand_computed_and_regimes(spark):
    import random

    from mr_dice_spark.operators.timeseries import kpss_level_stat

    rng = random.Random(13)
    stat = [round(10 + rng.gauss(0, 1), 2) for _ in range(200)]
    shift = [round(rng.gauss(0, 1), 2) for _ in range(100)] + [
        round(10 + rng.gauss(0, 1), 2) for _ in range(100)
    ]
    rows = [("stat", float(i), v) for i, v in enumerate(stat)]
    rows += [("shift", float(i), v) for i, v in enumerate(shift)]
    rows += [("short", 1.0, 1.0), ("short", 2.0, 2.0)]     # n <= lags
    rows += [("const", float(i), 5.0) for i in range(20)]  # lrv 0
    df = spark.createDataFrame(rows, "k string, x double, y double")
    got = {r["k"]: r for r in kpss_level_stat(df, "k", "x", "y").collect()}
    for k, y in (("stat", stat), ("shift", shift)):
        lrv, eta = _brute_kpss(y)
        assert got[k]["lrv"] == pytest.approx(lrv, abs=1e-4)
        assert got[k]["kpss"] == pytest.approx(eta, abs=1e-4)
    assert got["short"]["kpss"] is None and got["const"]["kpss"] is None
    # null (stationary) sits under the 5% critical value, the level
    # shift far above it — the decision the statistic exists for
    assert got["stat"]["kpss"] < 0.463 < got["shift"]["kpss"]
    with pytest.raises(ValueError, match="n_lags"):
        kpss_level_stat(df, "k", "x", "y", n_lags=-1)


# ---------------------------------------------------------------------------
# round-11 additions: Kuiper, Anderson-Darling 2s, Cox-Stuart, Theil's U2
# ---------------------------------------------------------------------------


def _brute_kuiper(a, b):
    pooled = sorted(set(a) | set(b))
    dp = dm = 0.0
    for v in pooled:
        fa = sum(1 for x in a if x <= v) / len(a)
        fb = sum(1 for x in b if x <= v) / len(b)
        dp = max(dp, fa - fb)
        dm = max(dm, fb - fa)
    return dp, dm


def test_kuiper_hand_computed(spark):
    from mr_dice_spark.operators.timeseries import kuiper_2s

    a = [1.0, 2.0, 2.0, 3.0, 7.0]
    b = [2.0, 4.0, 5.0, 6.0]
    rows = [("k1", "A", v) for v in a] + [("k1", "B", v) for v in b]
    rows += [("only_a", "A", 1.0), ("only_a", "A", 2.0)]
    rows += [(None, "A", 1.0), ("k1", None, 1.0), ("k1", "A", None)]
    df = spark.createDataFrame(rows, "k string, s string, v double")
    got = {r["k"]: r for r in kuiper_2s(df, "k", "s", "v", "A").collect()}
    dp, dm = _brute_kuiper(a, b)
    assert got["k1"]["n_a"] == 5 and got["k1"]["n_b"] == 4
    assert got["k1"]["d_plus"] == pytest.approx(dp, abs=1e-6)
    assert got["k1"]["d_minus"] == pytest.approx(dm, abs=1e-6)
    assert got["k1"]["kuiper_v"] == pytest.approx(dp + dm, abs=1e-6)
    # identical samples: V = 0
    eq = [("e", "A", float(v)) for v in (1, 2, 3)]
    eq += [("e", "B", float(v)) for v in (1, 2, 3)]
    same = kuiper_2s(
        spark.createDataFrame(eq, "k string, s string, v double"),
        "k", "s", "v", "A",
    ).collect()[0]
    assert same["kuiper_v"] == 0.0
    # missing sample: fail-closed NULLs
    assert got["only_a"]["kuiper_v"] is None
    assert got["only_a"]["d_plus"] is None


def _brute_ad_2s(a, b):
    """Scholz-Stephens A2akN (midrank/tie-adjusted), k = 2."""
    pooled = sorted(a + b)
    zstar = sorted(set(pooled))
    n, bign = [len(a), len(b)], len(pooled)
    total = 0.0
    for i, s in enumerate((sorted(a), sorted(b))):
        inner = 0.0
        for v in zstar:
            lj = sum(1 for x in pooled if x == v)
            cum = sum(1 for x in pooled if x <= v)
            bj = cum - lj / 2.0
            lij = sum(1 for x in s if x == v)
            mij = sum(1 for x in s if x <= v) - lij / 2.0
            den = bj * (bign - bj) - bign * lj / 4.0
            inner += (lj / bign) * (bign * mij - n[i] * bj) ** 2 / den
        total += inner / n[i]
    return (bign - 1.0) / bign * total


def test_anderson_darling_2s_hand_computed(spark):
    from mr_dice_spark.operators.timeseries import anderson_darling_2s

    a = [1.0, 2.0, 2.0, 3.0, 7.0, 9.0]
    b = [2.0, 4.0, 5.0, 6.0, 6.0]
    rows = [("k1", "A", v) for v in a] + [("k1", "B", v) for v in b]
    rows += [("only_a", "A", 1.0), ("only_a", "A", 2.0)]
    rows += [("onecell", "A", 5.0), ("onecell", "B", 5.0)]
    df = spark.createDataFrame(rows, "k string, s string, v double")
    got = {
        r["k"]: r
        for r in anderson_darling_2s(df, "k", "s", "v", "A").collect()
    }
    assert got["k1"]["n_a"] == 6 and got["k1"]["n_b"] == 5
    assert got["k1"]["ad"] == pytest.approx(_brute_ad_2s(a, b), abs=1e-5)
    # missing sample and single-pooled-cell keys fail closed
    assert got["only_a"]["ad"] is None
    assert got["onecell"]["ad"] is None


def test_cox_stuart_hand_computed(spark):
    from mr_dice_spark.operators.timeseries import cox_stuart_trend

    # rising series, n = 7 (odd: middle unused, pairs (1,5)(2,6)(3,7))
    up = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0]
    rows = [("up", float(i), v) for i, v in enumerate(up)]
    # falling series, n = 6
    rows += [("down", float(i), 10.0 - i) for i in range(6)]
    # tied pairs drop: [5,5,5,5] has 2 pairs, both tied
    rows += [("flat", float(i), 5.0) for i in range(4)]
    # single point: no pairs, dropped from the output
    rows += [("tiny", 0.0, 1.0)]
    rows += [(None, 0.0, 1.0), ("up", None, 1.0), ("up", 99.0, None)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    got = {r["k"]: r for r in cox_stuart_trend(df, "k", "x", "y").collect()}
    assert set(got) == {"up", "down", "flat"}
    assert (got["up"]["n_pairs"], got["up"]["n_pos"], got["up"]["n_neg"]) == (3, 3, 0)
    assert got["up"]["z"] == pytest.approx(3 / math.sqrt(3), abs=1e-6)
    assert (got["down"]["n_pos"], got["down"]["n_neg"]) == (0, 3)
    assert got["down"]["z"] == pytest.approx(-3 / math.sqrt(3), abs=1e-6)
    assert got["flat"]["n_pairs"] == 2 and got["flat"]["z"] is None


def test_cox_stuart_x_ties_fail_closed(spark):
    from mr_dice_spark.operators.timeseries import cox_stuart_trend

    rows = [("k", 1.0, 1.0), ("k", 1.0, 2.0), ("k", 2.0, 3.0), ("k", 3.0, 4.0)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    out = cox_stuart_trend(df, "k", "x", "y").collect()[0]
    assert out["z"] is None


def test_theils_u2_hand_computed(spark):
    from mr_dice_spark.operators.timeseries import theils_u2

    # period-3 seasonal signal plus a ramp: seasonal-naive should beat
    # the lag-1 naive (U2 < 1)
    base = [10.0, 1.0, 5.0]
    y = [base[i % 3] + 0.1 * i for i in range(12)]
    rows = [("s", float(i), v) for i, v in enumerate(y)]
    # constant series: naive denominator 0 -> NULL
    rows += [("c", float(i), 4.0) for i in range(8)]
    # too short for the seasonal lag -> no scored rows -> NULL
    rows += [("short", float(i), float(i)) for i in range(3)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    got = {r["k"]: r for r in theils_u2(df, "k", "x", "y", season=3).collect()}
    num = sum((y[t] - y[t - 3]) ** 2 for t in range(3, 12))
    den = sum((y[t] - y[t - 1]) ** 2 for t in range(3, 12))
    assert got["s"]["n_scored"] == 9
    assert got["s"]["u2"] == pytest.approx(math.sqrt(num / den), abs=1e-6)
    assert got["s"]["u2"] < 1.0
    assert got["c"]["u2"] is None
    assert got["short"]["u2"] is None and got["short"]["n_scored"] == 0
    with pytest.raises(ValueError, match="season"):
        theils_u2(df, "k", "x", "y", season=1)


# ---------------------------------------------------------------------------
# round-11 addition: Pettitt rank change-point
# ---------------------------------------------------------------------------


def _brute_pettitt(xs):
    import math

    n = len(xs)
    best = None  # (K, t, u)
    for t in range(1, n):
        u = sum(
            (xs[i] > xs[j]) - (xs[i] < xs[j])
            for i in range(t)
            for j in range(t, n)
        )
        if best is None or abs(u) > best[0]:
            best = (abs(u), t, u)
    k, t, u = best
    p = min(1.0, 2.0 * math.exp(-6.0 * k * k / (n**3 + n**2)))
    return k, t, u, p


def test_pettitt_hand_computed(spark):
    from mr_dice_spark.operators.timeseries import pettitt_from_buckets

    shift = [1.0, 2.0] * 5 + [10.0, 11.0] * 5
    tied = [3.0, 3.0, 1.0, 3.0, 3.0, 5.0, 5.0]
    rows = [("shift", float(i), v) for i, v in enumerate(shift)]
    rows += [("tied", float(i), v) for i, v in enumerate(tied)]
    rows += [("single", 0.0, 4.0)]
    rows += [("const", float(i), 7.0) for i in range(5)]
    df = spark.createDataFrame(rows, "__k string, __h double, __v double")
    got = {r["__k"]: r for r in pettitt_from_buckets(df, "__k").collect()}
    for k, xs in (("shift", shift), ("tied", tied)):
        kk, tt, uu, pp = _brute_pettitt(xs)
        assert got[k]["k_stat"] == kk
        assert got[k]["cp_index"] == tt
        assert got[k]["u_at_cp"] == uu
        assert got[k]["cp_bucket"] == float(tt - 1)  # 1-based t, 0-based h
        assert got[k]["p_approx"] == pytest.approx(pp, abs=1e-6)
    # the shift series splits exactly at the level break
    assert got["shift"]["cp_index"] == 10
    assert got["shift"]["p_approx"] < 0.05
    # n < 2: row KEPT, stats fail closed (no silent key drop) — p too
    # (least() skips NULLs, so this needs the explicit gate)
    assert got["single"]["n"] == 1 and got["single"]["k_stat"] is None
    assert got["single"]["p_approx"] is None
    # constant series: every U_t = 0, smallest-t tie-break, p capped at 1
    assert got["const"]["k_stat"] == 0
    assert got["const"]["cp_index"] == 1
    assert got["const"]["p_approx"] == 1.0


def test_pettitt_buckets_end_to_end(spark):
    import datetime as dt

    from mr_dice_spark.operators.timeseries import pettitt_change_point

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for d in range(10):
        for h in (3, 15):
            v = 5.0 if d < 6 else 50.0
            rows.append(("m", t0 + dt.timedelta(days=d, hours=h), v + h))
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = pettitt_change_point(df, "k", "ts", "v").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n"] == 10 and r["cp_index"] == 6
    assert r["cp_bucket"] == t0 + dt.timedelta(days=5)
    kk, tt, uu, pp = _brute_pettitt([14.0] * 6 + [59.0] * 4)
    assert r["k_stat"] == kk and r["p_approx"] == pytest.approx(pp, abs=1e-6)


# ---------------------------------------------------------------------------
# round-11 addition: seasonal (Hirsch-Slack) Mann-Kendall
# ---------------------------------------------------------------------------


def _brute_smk(series_by_phase):
    s = 0
    v18 = 0
    for xs in series_by_phase.values():
        for i in range(len(xs)):
            for j_ in range(i + 1, len(xs)):
                s += (xs[j_] > xs[i]) - (xs[j_] < xs[i])
        n = len(xs)
        from collections import Counter

        tt = sum(
            t * (t - 1) * (2 * t + 5) for t in Counter(xs).values()
        )
        v18 += n * (n - 1) * (2 * n + 5) - tt
    var = v18 / 18.0
    if var <= 0:
        return s, var, None
    import math

    z = (s - 1) / math.sqrt(var) if s > 0 else (
        (s + 1) / math.sqrt(var) if s < 0 else 0.0
    )
    return s, var, z


def test_seasonal_mann_kendall_hand_computed(spark):
    import datetime as dt

    from mr_dice_spark.operators.timeseries import seasonal_mann_kendall

    t0 = dt.datetime(2024, 1, 1)
    # period 2: even phases trend up day over day, odd phases carry a
    # large alternating cycle that would mask the trend in plain MK
    phases = {
        0: [1.0, 2.0, 2.0, 4.0, 5.0, 6.0],
        1: [100.0, 90.0, 95.0, 99.0, 91.0, 101.0],
    }
    rows = []
    for p, xs in phases.items():
        for d, v in enumerate(xs):
            rows.append(("m", t0 + dt.timedelta(days=d, hours=p), v))
    rows += [("tiny", t0, 5.0)]                      # one bucket
    rows += [("const", t0 + dt.timedelta(hours=h), 3.0) for h in range(6)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    got = {
        r["k"]: r
        for r in seasonal_mann_kendall(
            df, "k", "ts", "v", step_seconds=3600, period=2
        ).collect()
    }
    s, var, z = _brute_smk(phases)
    m = got["m"]
    assert m["n_buckets"] == 12 and m["n_seasons"] == 2
    assert m["s"] == s
    assert m["var_s"] == pytest.approx(var, abs=1e-4)
    assert m["z"] == pytest.approx(z, abs=1e-6)
    # single bucket / constant series: fail-closed NULL z, rows kept
    assert got["tiny"]["z"] is None and got["tiny"]["s"] == 0
    assert got["const"]["z"] is None
    with pytest.raises(ValueError, match="period"):
        seasonal_mann_kendall(df, "k", "ts", "v", period=1)


def test_seasonal_mk_beats_plain_mk_under_cycle(spark):
    """The reason the seasonal form exists: a strong cycle hides a
    real within-phase trend from plain MK but not from seasonal MK."""
    import datetime as dt

    from mr_dice_spark.operators.timeseries import (
        mann_kendall_trend,
        seasonal_mann_kendall,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for d in range(10):
        for h in range(4):
            # diurnal swing +-50 dwarfs the +1/day drift
            rows.append(
                ("m", t0 + dt.timedelta(days=d, hours=h * 6),
                 50.0 * (h % 2) + d)
            )
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    [smk] = seasonal_mann_kendall(
        df, "k", "ts", "v", step_seconds=21600, period=4
    ).collect()
    [mk] = mann_kendall_trend(df, "k", "ts", "v", 21600).collect()
    # every within-phase pair rises: S' = 4 * C(10,2) = 180, z max
    assert smk["s"] == 180
    assert smk["z"] > abs(mk["z"]) + 2.0
