"""Unit tests for the classic hypothesis tests (one-way ANOVA /
Brown-Forsythe / Jarque-Bera) against hand-computed statistics."""

import pytest

from mr_dice_spark.operators.anova import (
    brown_forsythe,
    jarque_bera_by_group,
    oneway_anova,
)


def test_anova_hand_values(spark):
    # a=[1,2,3], b=[4,5,6]: SSB=13.5, SSW=4 -> F=13.5, eta2=13.5/17.5
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 4.0), ("b", 5.0), ("b", 6.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    [r] = oneway_anova(df, "g", "v").collect()
    assert (r["k"], r["n"]) == (2, 6)
    assert r["f_stat"] == pytest.approx(13.5, abs=1e-4)
    assert r["eta_sq"] == pytest.approx(13.5 / 17.5, abs=1e-6)


def test_anova_degenerate_null_contract(spark):
    # single group -> F NULL; all-constant groups -> 0/0 -> NULL F,
    # NULL eta (sstot = 0)
    one = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "g string, v double")
    [r] = oneway_anova(one, "g", "v").collect()
    assert r["f_stat"] is None
    const = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 1.0), ("b", 1.0)], "g string, v double"
    )
    [r] = oneway_anova(const, "g", "v").collect()
    assert r["f_stat"] is None and r["eta_sq"] is None


def test_brown_forsythe_hand_values(spark):
    # a=[1,2,3] -> z=[1,0,1]; b=[10,20,30] -> z=[10,0,10]
    # ANOVA on z: SSB=54, SSW=202/3 -> F = 54/( (202/3)/4 ) = 648/202
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0),
            ("b", 10.0), ("b", 20.0), ("b", 30.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    [r] = brown_forsythe(df, "g", "v").collect()
    assert (r["k"], r["n"]) == (2, 6)
    assert r["f_stat"] == pytest.approx(648.0 / 202.0, abs=1e-4)


def test_brown_forsythe_equal_spreads_near_zero_f(spark):
    # identical spreads around different centers -> z distributions
    # identical -> SSB = 0 -> F = 0
    rows = [("a", 0.0), ("a", 2.0), ("a", 4.0),
            ("b", 100.0), ("b", 102.0), ("b", 104.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    [r] = brown_forsythe(df, "g", "v").collect()
    assert r["f_stat"] == pytest.approx(0.0, abs=1e-4)


def test_jarque_bera_hand_moments_and_null(spark):
    # uniform {1..5}: mu=3, m2=2, m3=0, m4=6.8 -> skew 0, exk -1.3,
    # jb = 5/6 * (0 + 1.69/4) = 0.352083...
    rows = [("u", float(i)) for i in range(1, 6)] + [("c", 7.0), ("c", 7.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["g"]: r for r in jarque_bera_by_group(df, "g", "v").collect()}
    u = got["u"]
    assert u["n"] == 5
    assert u["skewness"] == pytest.approx(0.0, abs=1e-6)
    assert u["ex_kurtosis"] == pytest.approx(-1.3, abs=1e-6)
    assert u["jb"] == pytest.approx(5.0 / 6.0 * (1.69 / 4.0), abs=1e-4)
    # constant group: zero variance -> fail-closed NULLs
    c = got["c"]
    assert c["skewness"] is None and c["ex_kurtosis"] is None and c["jb"] is None


def test_jarque_bera_skew_sign(spark):
    # right-skewed {0,0,0,10}: m3 > 0 -> positive skewness
    df = spark.createDataFrame(
        [("g", 0.0), ("g", 0.0), ("g", 0.0), ("g", 10.0)], "g string, v double"
    )
    [r] = jarque_bera_by_group(df, "g", "v").collect()
    assert r["skewness"] > 1.0


def test_kendall_tau_b_hand_contingency(spark):
    # 2x2 cells: (0,0)=2, (0,1)=1, (1,0)=1, (1,1)=2  (n=6)
    # C = 2*2 = 4... plus (0,0)x(1,1): 2*2=4; (0,1)x(1,0) discordant 1*1=1
    # concordant = c00*c11 = 4, discordant = c01*c10 = 1
    # n0x2 = 6*5 = 30; row ties x: rows 3,3 -> t1x2 = 3*2+3*2 = 12; same y
    # tau_b = (4-1) / (sqrt((30-12)*(30-12))/2) = 3/9 = 1/3
    from mr_dice_spark.operators.anova import kendall_tau_b_cells

    rows = ([(0, 0)] * 2 + [(0, 1)] + [(1, 0)] + [(1, 1)] * 2)
    df = spark.createDataFrame(rows, "x int, y int")
    [r] = kendall_tau_b_cells(df, "x", "y").collect()
    assert r["n"] == 6
    assert (r["concordant"], r["discordant"]) == (4, 1)
    assert (r["n1_ties_x"], r["n2_ties_y"]) == (6, 6)
    assert r["tau_b"] == pytest.approx(1.0 / 3.0, abs=1e-6)


def test_kendall_tau_b_perfect_and_constant(spark):
    from mr_dice_spark.operators.anova import kendall_tau_b_cells

    # strictly increasing, no ties -> tau_b = 1
    inc = spark.createDataFrame([(i, i) for i in range(5)], "x int, y int")
    [r] = kendall_tau_b_cells(inc, "x", "y").collect()
    assert r["tau_b"] == pytest.approx(1.0, abs=1e-6)
    # constant y -> zero denominator -> NULL (fail-closed)
    const = spark.createDataFrame([(i, 7) for i in range(5)], "x int, y int")
    [r] = kendall_tau_b_cells(const, "x", "y").collect()
    assert r["tau_b"] is None


def test_cochran_armitage_hand_trend(spark):
    # doses 0,1,2 with n=4 each, positives 0,2,4 -> perfect rising trend
    # pbar=0.5; wr = 0*0+1*2+2*4 = 10; wn = 0+4+8 = 12; wwn = 0+4+16 = 20
    # num = 10 - 0.5*12 = 4; var = 0.25*(20 - 144/12) = 2 -> z = 4/sqrt(2)
    from mr_dice_spark.operators.anova import cochran_armitage_trend

    rows = []
    for dose, pos in [(0.0, 0), (1.0, 2), (2.0, 4)]:
        rows += [(dose, i < pos) for i in range(4)]
    df = spark.createDataFrame(rows, "w double, y boolean")
    [r] = cochran_armitage_trend(df, "w", "y").collect()
    assert (r["k"], r["n"], r["n_pos"]) == (3, 12, 6)
    assert r["z_trend"] == pytest.approx(4.0 / 2.0**0.5, abs=1e-6)
    assert r["chi2_trend"] == pytest.approx(8.0, abs=1e-4)


def test_cochran_armitage_constant_outcome_null(spark):
    from mr_dice_spark.operators.anova import cochran_armitage_trend

    df = spark.createDataFrame(
        [(0.0, True), (1.0, True), (2.0, True)], "w double, y boolean"
    )
    [r] = cochran_armitage_trend(df, "w", "y").collect()
    assert r["z_trend"] is None and r["chi2_trend"] is None


def test_kruskal_wallis_hand_values(spark):
    # a=[1,2,3], b=[2,4]: midranks 1, 2.5, 4 | 2.5, 5 -> R_a=R_b=7.5
    # H = 12/30*(7.5^2/3 + 7.5^2/2) - 18 = 0.75; ties: one pair ->
    # C = 1 - 6/120 = 0.95; H_c = 0.75/0.95 (scipy.kruskal agrees)
    from mr_dice_spark.operators.anova import kruskal_wallis_by_group

    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 2.0), ("b", 4.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    [r] = kruskal_wallis_by_group(df, "g", "v").collect()
    assert (r["k"], r["n"]) == (2, 5)
    assert r["h"] == pytest.approx(0.75, abs=1e-4)
    assert r["tie_correction"] == pytest.approx(0.95, abs=1e-6)
    assert r["h_corrected"] == pytest.approx(0.75 / 0.95, abs=1e-4)


def test_kruskal_wallis_all_tied_null_contract(spark):
    # every value identical: zero rank information -> H = 0, C = 0,
    # corrected H NULL (fail-closed, not 0/0)
    from mr_dice_spark.operators.anova import kruskal_wallis_by_group

    rows = [("a", 5.0), ("a", 5.0), ("b", 5.0), ("b", 5.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    [r] = kruskal_wallis_by_group(df, "g", "v").collect()
    assert r["h"] == pytest.approx(0.0, abs=1e-4)
    assert r["tie_correction"] == pytest.approx(0.0, abs=1e-6)
    assert r["h_corrected"] is None


# ---------------------------------------------------------------------------
# Round-10: Grubbs max deviate + Mood's median test
# ---------------------------------------------------------------------------


def test_grubbs_hand_computed_and_fail_closed(spark):
    import statistics

    from mr_dice_spark.operators.anova import grubbs_max_deviate

    A = [1.0, 2.0, 2.5, 3.0, 9.0]
    rows = [("A", v) for v in A]
    rows += [("B", 5.0), ("B", 5.0)]          # n < 3
    rows += [("C", 4.0), ("C", 4.0), ("C", 4.0)]  # zero variance
    rows += [(None, 1.0), ("A", None)]        # excluded
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["g"]: r for r in grubbs_max_deviate(df, "g", "v").collect()}

    m, sd = statistics.mean(A), statistics.stdev(A)
    assert got["A"]["n"] == 5
    assert got["A"]["mean"] == pytest.approx(m, abs=2e-6)
    assert got["A"]["sd"] == pytest.approx(sd, abs=2e-6)
    assert got["A"]["outlier_value"] == 9.0
    assert got["A"]["grubbs_g"] == pytest.approx(
        max(abs(x - m) for x in A) / sd, abs=2e-6
    )
    for k in ("B", "C"):  # all-or-nothing fail-closed
        assert all(
            got[k][c] is None
            for c in ("mean", "sd", "outlier_value", "grubbs_g")
        ), got[k]


def test_grubbs_symmetric_tie_breaks_to_smaller_value(spark):
    from mr_dice_spark.operators.anova import grubbs_max_deviate

    df = spark.createDataFrame(
        [("T", 1.0), ("T", 5.0), ("T", 9.0)], "g string, v double"
    )
    got = grubbs_max_deviate(df, "g", "v").collect()[0]
    assert got["outlier_value"] == 1.0  # |1-5| == |9-5|, smaller wins


def test_moods_median_hand_computed(spark):
    from mr_dice_spark.operators.anova import moods_median_test

    # k1: g1 strictly below, g2 strictly above the pooled median 4 ->
    # fully separated 2x2 table, chi2 = N = 8, dof = 1
    rows = [("k1", "g1", float(v)) for v in (1, 2, 3, 4)]
    rows += [("k1", "g2", float(v)) for v in (5, 6, 7, 8)]
    rows += [("k2", "g1", 2.0), ("k2", "g2", 2.0)]  # degenerate: all == med
    rows += [("k3", "g1", 1.0), ("k3", "g1", 5.0)]  # single group
    df = spark.createDataFrame(rows, "k string, g string, v double")
    got = {r["k"]: r for r in moods_median_test(df, "k", "g", "v").collect()}

    assert got["k1"]["grand_median"] == 4.0  # lower median of 8 values
    assert got["k1"]["chi2"] == pytest.approx(8.0, abs=1e-6)
    assert (got["k1"]["n"], got["k1"]["n_groups"], got["k1"]["dof"]) == (8, 2, 1)
    assert got["k2"]["chi2"] is None and got["k2"]["dof"] is None
    assert got["k2"]["grand_median"] == 2.0
    assert got["k3"]["chi2"] is None  # one group: nothing to compare


def test_moods_median_location_shift_signal(spark):
    """A clean location shift must score a larger chi2 than identical
    distributions (which split evenly at the pooled median)."""
    import random

    from mr_dice_spark.operators.anova import moods_median_test

    rng = random.Random(3)
    base = [round(rng.uniform(0, 10), 2) for _ in range(200)]
    rows = [("same", "g1", v) for v in base]
    rows += [("same", "g2", v) for v in base]
    rows += [("shift", "g1", v) for v in base]
    rows += [("shift", "g2", round(v + 5.0, 2)) for v in base]
    df = spark.createDataFrame(rows, "k string, g string, v double")
    got = {r["k"]: r["chi2"] for r in moods_median_test(df, "k", "g", "v").collect()}
    assert got["same"] == pytest.approx(0.0, abs=1.5)  # even split, tiny chi2
    assert got["shift"] > 50.0


def _brute_jt(groups):
    import math
    from collections import Counter

    ords = sorted(groups)
    jt = 0.0
    for i, a in enumerate(ords):
        for b in ords[i + 1:]:
            for x in groups[a]:
                for y in groups[b]:
                    jt += 1.0 if x < y else (0.5 if x == y else 0.0)
    ns = [len(groups[g]) for g in ords]
    N = sum(ns)
    ts = list(Counter(v for g in ords for v in groups[g]).values())
    e = (N * N - sum(n * n for n in ns)) / 4
    A = (
        N * (N - 1) * (2 * N + 5)
        - sum(n * (n - 1) * (2 * n + 5) for n in ns)
        - sum(t * (t - 1) * (2 * t + 5) for t in ts)
    )
    B = sum(n * (n - 1) * (n - 2) for n in ns) * sum(
        t * (t - 1) * (t - 2) for t in ts
    )
    C = sum(n * (n - 1) for n in ns) * sum(t * (t - 1) for t in ts)
    var = A / 72 + B / (36 * N * (N - 1) * (N - 2)) + C / (8 * N * (N - 1))
    return jt, e, var, (jt - e) / math.sqrt(var)


def test_jonckheere_terpstra_hand_computed(spark):
    import random

    from mr_dice_spark.operators.anova import jonckheere_terpstra

    rng = random.Random(9)
    g_trend = {
        i: [round(rng.uniform(0, 5) + i, 1) for _ in range(40)]
        for i in range(4)
    }
    g_null = {
        i: [round(rng.uniform(0, 5), 1) for _ in range(40)] for i in range(4)
    }
    rows = [("trend", g, v) for g, vs in g_trend.items() for v in vs]
    rows += [("null", g, v) for g, vs in g_null.items() for v in vs]
    rows += [("one", 0, 1.0), ("one", 0, 2.0)]
    rows += [("const", 0, 3.0), ("const", 1, 3.0), ("const", 2, 3.0)]
    df = spark.createDataFrame(rows, "k string, g long, v double")
    got = {r["k"]: r for r in jonckheere_terpstra(df, "k", "g", "v").collect()}
    for k, gr in (("trend", g_trend), ("null", g_null)):
        jt, e, var, z = _brute_jt(gr)
        assert got[k]["jt"] == pytest.approx(jt, abs=1e-9)
        assert got[k]["e_jt"] == pytest.approx(e, abs=1e-9)
        assert got[k]["var_jt"] == pytest.approx(var, abs=2e-6)
        assert got[k]["z"] == pytest.approx(z, abs=5e-6)
    # single group: nothing ordered to compare
    assert got["one"]["jt"] is None and got["one"]["z"] is None
    # every value tied: jt defined (all half-counts), variance 0 -> NULL z
    assert got["const"]["jt"] is not None
    assert got["const"]["var_jt"] is None and got["const"]["z"] is None
    # the planted monotone shift reads as a strong positive z
    assert got["trend"]["z"] > 5 and abs(got["null"]["z"]) < 2.5


def _brute_bartlett(groups):
    """groups: list of lists of values (each len >= 2)."""
    import math

    k = len(groups)
    ns = [len(g) for g in groups]
    bign = sum(ns)
    variances = []
    for g in groups:
        m = sum(g) / len(g)
        variances.append(sum((x - m) ** 2 for x in g) / (len(g) - 1))
    sp2 = sum((n - 1) * v for n, v in zip(ns, variances)) / (bign - k)
    num = (bign - k) * math.log(sp2) - sum(
        (n - 1) * math.log(v) for n, v in zip(ns, variances)
    )
    c = 1.0 + (sum(1.0 / (n - 1) for n in ns) - 1.0 / (bign - k)) / (
        3.0 * (k - 1)
    )
    return num / c


def test_bartlett_hand_computed(spark):
    from mr_dice_spark.operators.anova import bartlett_by_key

    g1 = [1.0, 2.0, 3.0, 4.0, 9.0]
    g2 = [5.0, 5.5, 6.0, 6.5]
    g3 = [1.0, 8.0, 15.0]
    rows = [("k1", "a", v) for v in g1]
    rows += [("k1", "b", v) for v in g2]
    rows += [("k1", "c", v) for v in g3]
    # a singleton group is excluded from the statistic, not fatal
    rows += [("k1", "solo", 42.0)]
    # zero-variance group -> NULL chi2, counts still report
    rows += [("zv", "a", 1.0), ("zv", "a", 1.0), ("zv", "b", 2.0), ("zv", "b", 3.0)]
    # single usable group -> NULL
    rows += [("one", "a", 1.0), ("one", "a", 2.0)]
    rows += [(None, "a", 1.0), ("k1", None, 1.0), ("k1", "a", None)]
    df = spark.createDataFrame(rows, "k string, g string, v double")
    got = {r["k"]: r for r in bartlett_by_key(df, "k", "g", "v").collect()}
    assert got["k1"]["k_groups"] == 3 and got["k1"]["n"] == 12
    assert got["k1"]["dof"] == 2
    assert got["k1"]["chi2"] == pytest.approx(
        _brute_bartlett([g1, g2, g3]), abs=1e-4
    )
    assert got["zv"]["chi2"] is None and got["zv"]["k_groups"] == 2
    assert got["one"]["chi2"] is None and got["one"]["dof"] is None


# ---------------------------------------------------------------------------
# round-11 addition: Somers' D (asymmetric ordinal association)
# ---------------------------------------------------------------------------


def _brute_somers(pairs_xy):
    n = len(pairs_xy)
    cc = dd = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            (x1, y1), (x2, y2) = pairs_xy[i], pairs_xy[j]
            if x1 == x2:
                tx += 1
            if y1 == y2:
                ty += 1
            if x1 != x2 and y1 != y2:
                if (x1 < x2) == (y1 < y2):
                    cc += 1
                else:
                    dd += 1
    n0 = n * (n - 1) // 2
    d_yx = (cc - dd) / (n0 - tx) if n0 != tx else None
    d_xy = (cc - dd) / (n0 - ty) if n0 != ty else None
    return cc, dd, tx, ty, d_yx, d_xy


def test_somers_d_hand_computed(spark):
    from mr_dice_spark.operators.anova import somers_d_cells

    data = [(1, 1), (1, 2), (2, 2), (2, 2), (2, 3), (3, 2), (3, 3), (3, 3)]
    rows = [("k1", x, y) for x, y in data]
    rows += [("constx", 5, y) for y in (1, 2, 3)]   # x constant: d_yx NULL
    rows += [("consty", x, 7) for x in (1, 2, 3)]   # y constant: d_xy NULL
    rows += [(None, 1, 1), ("k1", None, 1), ("k1", 1, None)]
    df = spark.createDataFrame(rows, "k string, x int, y int")
    got = {r["k"]: r for r in somers_d_cells(df, "k", "x", "y").collect()}
    cc, dd, tx, ty, d_yx, d_xy = _brute_somers(data)
    r = got["k1"]
    assert r["n"] == len(data)
    assert r["concordant"] == cc and r["discordant"] == dd
    assert r["n1_ties_x"] == tx and r["n2_ties_y"] == ty
    assert r["d_yx"] == pytest.approx(d_yx, abs=1e-6)
    assert r["d_xy"] == pytest.approx(d_xy, abs=1e-6)
    # asymmetry is the point: the two directions differ under ties
    assert r["d_yx"] != r["d_xy"]
    # constant x: no untied-x pairs -> d_yx fail-closed NULL, d_xy 0
    assert got["constx"]["d_yx"] is None
    assert got["constx"]["d_xy"] == 0.0
    assert got["consty"]["d_xy"] is None
    assert got["consty"]["d_yx"] == 0.0
    # NULL key/x/y rows are excluded, not crashed on
    assert set(got) == {"k1", "constx", "consty"}


# ---------------------------------------------------------------------------
# round-11 addition: Dunn post-hoc pairwise rank comparisons
# ---------------------------------------------------------------------------


def _brute_dunn(groups):
    """groups: dict g -> list of values; returns {(a,b): (mra, mrb, z)}."""
    import math

    pooled = sorted(v for vs in groups.values() for v in vs)
    n = len(pooled)
    rank = {}
    i = 0
    while i < n:
        j = i
        while j < n and pooled[j] == pooled[i]:
            j += 1
        for t in range(i, j):
            rank[pooled[i]] = (i + 1 + j) / 2.0
        i = j
    from collections import Counter

    ties = Counter(pooled)
    t3 = sum(t**3 - t for t in ties.values())
    out = {}
    ks = sorted(groups)
    for ai in range(len(ks)):
        for bi in range(ai + 1, len(ks)):
            ga, gb = ks[ai], ks[bi]
            na, nb = len(groups[ga]), len(groups[gb])
            mra = sum(rank[v] for v in groups[ga]) / na
            mrb = sum(rank[v] for v in groups[gb]) / nb
            var = (n * (n + 1) / 12.0 - t3 / (12.0 * (n - 1))) * (
                1.0 / na + 1.0 / nb
            )
            z = (mra - mrb) / math.sqrt(var) if var > 0 else None
            out[(ga, gb)] = (mra, mrb, z)
    return out


def test_dunn_posthoc_hand_computed(spark):
    from mr_dice_spark.operators.anova import dunn_posthoc

    groups = {
        "A": [1.0, 2.0, 2.0, 3.0],
        "B": [2.0, 4.0, 5.0],
        "C": [6.0, 7.0, 7.0, 9.0, 10.0],
    }
    rows = [("k1", g, v) for g, vs in groups.items() for v in vs]
    rows += [("onegrp", "A", 1.0), ("onegrp", "A", 2.0)]
    rows += [("alltied", g, 5.0) for g in ("A", "B") for _ in range(3)]
    rows += [(None, "A", 1.0), ("k1", None, 1.0), ("k1", "A", None)]
    df = spark.createDataFrame(rows, "k string, g string, v double")
    res = dunn_posthoc(df, "k", "g", "v").collect()
    got = {(r["k"], r["g_a"], r["g_b"]): r for r in res}
    exp = _brute_dunn(groups)
    assert len([r for r in res if r["k"] == "k1"]) == 3
    for (ga, gb), (mra, mrb, z) in exp.items():
        r = got[("k1", ga, gb)]
        assert r["mean_rank_a"] == pytest.approx(mra, abs=1e-6)
        assert r["mean_rank_b"] == pytest.approx(mrb, abs=1e-6)
        assert r["z"] == pytest.approx(z, abs=1e-6)
    # C clearly above A: large positive separation means rank(A) < rank(C)
    assert got[("k1", "A", "C")]["z"] < -2.0
    # single-group key: the pair relation has no rows (documented)
    assert not [r for r in res if r["k"] == "onegrp"]
    # all values tied: zero variance fails z closed, pair row kept
    at = got[("alltied", "A", "B")]
    assert at["z"] is None and at["mean_rank_a"] == at["mean_rank_b"]


# ---------------------------------------------------------------------------
# round-11 addition: Conover squared-ranks scale test
# ---------------------------------------------------------------------------


def _brute_conover(groups):
    devs = []
    for g, vs in groups.items():
        m = sum(vs) / len(vs)
        devs += [(g, abs(v - m)) for v in vs]
    zs = sorted(z for _, z in devs)
    n = len(zs)
    rank = {}
    i = 0
    while i < n:
        j = i
        while j < n and zs[j] == zs[i]:
            j += 1
        rank[zs[i]] = (i + 1 + j) / 2.0
        i = j
    s = {g: [rank[z] ** 2 for gg, z in devs if gg == g] for g in groups}
    G = sum(sum(v) for v in s.values())
    Q = sum(x * x for v in s.values() for x in v)
    num = sum(sum(v) ** 2 / len(v) for v in s.values()) - G * G / n
    den = Q - G * G / n
    return (n - 1) * num / den if den > 0 else None


def test_conover_squared_ranks_hand_computed(spark):
    from mr_dice_spark.operators.anova import conover_squared_ranks

    groups = {
        "A": [5.0, 6.0, 7.0, 8.0],
        "B": [0.0, 4.0, 16.0, 20.0],
        "C": [3.0, 3.5, 4.5, 5.0, 9.0],
    }
    rows = [("k1", g, v) for g, vs in groups.items() for v in vs]
    rows += [("onegrp", "A", 1.0), ("onegrp", "A", 5.0)]
    rows += [("tied", "A", 0.0), ("tied", "A", 2.0),
             ("tied", "B", 5.0), ("tied", "B", 7.0)]
    rows += [(None, "A", 1.0), ("k1", None, 1.0), ("k1", "A", None)]
    df = spark.createDataFrame(rows, "k string, g string, v double")
    got = {r["k"]: r for r in conover_squared_ranks(df, "k", "g", "v").collect()}
    r = got["k1"]
    assert r["n"] == 13 and r["k_groups"] == 3
    assert r["t_stat"] == pytest.approx(_brute_conover(groups), abs=1e-5)
    assert r["dof"] == 2
    # B's spread dwarfs A's: two groups alone give a near-maximal T
    two = {"A": groups["A"], "B": groups["B"]}
    df2 = spark.createDataFrame(
        [("kk", g, v) for g, vs in two.items() for v in vs],
        "k string, g string, v double",
    )
    [r2] = conover_squared_ranks(df2, "k", "g", "v").collect()
    assert r2["t_stat"] == pytest.approx(_brute_conover(two), abs=1e-5)
    # single group / all-|dev|-tied: fail-closed NULL, rows kept
    assert got["onegrp"]["k_groups"] == 1 and got["onegrp"]["t_stat"] is None
    assert got["tied"]["t_stat"] is None and got["tied"]["dof"] is None
    assert set(got) == {"k1", "onegrp", "tied"}
