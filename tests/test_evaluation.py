"""Unit tests for the model-evaluation aggregates (AUC / calibration /
kappa) against hand-computed statistics."""

import pytest

from mr_dice_spark.operators.evaluation import (
    auc_by_group,
    calibration_bins,
    cohens_kappa,
)


def test_auc_perfect_and_random_separation(spark):
    rows = (
        # group 'perfect': positives strictly above negatives -> AUC 1.0
        [("perfect", 0.9, True), ("perfect", 0.8, True),
         ("perfect", 0.2, False), ("perfect", 0.1, False)]
        # group 'inverse': positives strictly below -> AUC 0.0
        + [("inverse", 0.1, True), ("inverse", 0.9, False)]
        # group 'onlypos': no negatives -> NULL
        + [("onlypos", 0.5, True)]
    )
    df = spark.createDataFrame(rows, "g string, s double, y boolean")
    got = {r["g"]: r["auc"] for r in auc_by_group(df, "g", "s", "y").collect()}
    assert got["perfect"] == 1.0
    assert got["inverse"] == 0.0
    assert got["onlypos"] is None


def test_auc_midrank_ties_exact(spark):
    # scores: pos {0.5, 0.3}, neg {0.5, 0.1}. Tie at 0.5 counts 1/2:
    # pairs = (0.5>0.1)=1, (0.5~0.5)=0.5, (0.3>0.1)=1, (0.3<0.5)=0
    # AUC = 2.5 / 4 = 0.625
    rows = [("g", 0.5, True), ("g", 0.3, True), ("g", 0.5, False), ("g", 0.1, False)]
    df = spark.createDataFrame(rows, "g string, s double, y boolean")
    [r] = auc_by_group(df, "g", "s", "y").collect()
    assert r["auc"] == pytest.approx(0.625, abs=1e-12)
    assert (r["n_pos"], r["n_neg"]) == (2, 2)


def test_calibration_bins_clamp_and_rates(spark):
    rows = [
        (0.05, False), (0.05, True),   # bin 0: rate 0.5
        (1.0, True),                   # score exactly 1.0 -> top bin
        (-0.2, False), (1.7, True),    # out-of-range clamps to edge bins
        (None, True), (0.5, None),     # NULLs excluded
    ]
    df = spark.createDataFrame(rows, "s double, y boolean")
    got = {r["bin"]: r for r in calibration_bins(df, "s", "y", n_bins=10).collect()}
    assert set(got) == {0, 9}
    assert got[0]["n"] == 3 and got[0]["pos_rate"] == pytest.approx(1 / 3)
    assert got[9]["n"] == 2 and got[9]["pos_rate"] == 1.0
    with pytest.raises(ValueError):
        calibration_bins(df, "s", "y", n_bins=0)


def test_cohens_kappa_known_value(spark):
    # 2x2 example: agree on 45+35=80 of 100 -> po = 0.8;
    # marginals a: 50/50, b: 60/40 -> pe = 0.5*0.6 + 0.5*0.4 = 0.5
    # kappa = (0.8 - 0.5) / 0.5 = 0.6
    rows = [("x", "x")] * 45 + [("x", "y")] * 5 + [("y", "x")] * 15 + [("y", "y")] * 35
    df = spark.createDataFrame(rows, "a string, b string")
    [r] = cohens_kappa(df, "a", "b").collect()
    assert r["n"] == 100
    assert r["po"] == pytest.approx(0.8)
    assert r["pe"] == pytest.approx(0.5 * 0.6 + 0.5 * 0.4)
    assert r["kappa"] == pytest.approx((0.8 - 0.5) / 0.5)


def test_cohens_kappa_degenerate_single_category(spark):
    df = spark.createDataFrame([("x", "x")] * 4, "a string, b string")
    [r] = cohens_kappa(df, "a", "b").collect()
    assert r["po"] == 1.0 and r["pe"] == 1.0 and r["kappa"] is None
