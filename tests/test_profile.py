"""Unit tests for the observability operators (operators/profile.py)."""

from __future__ import annotations

import pytest

from mr_dice_spark.operators.profile import (
    profile_columns,
    snapshot_diff,
    value_histogram,
)


def test_snapshot_diff_all_change_classes(spark):
    """added/removed/changed classified; NULL-safe compare: NULL -> NULL
    is unchanged (suppressed), NULL -> value is changed."""
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, None), (5, "e")],
        "id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, None), (4, "now set"), (6, "f")],
        "id long, text string",
    )
    out = {r["id"]: r["change"] for r in snapshot_diff(old, new, "id", ["text"]).collect()}
    assert out == {2: "changed", 4: "changed", 5: "removed", 6: "added"}


def test_snapshot_diff_include_unchanged(spark):
    old = spark.createDataFrame([(1, "a")], "id long, text string")
    new = spark.createDataFrame([(1, "a")], "id long, text string")
    assert snapshot_diff(old, new, "id", ["text"]).count() == 0
    rows = snapshot_diff(old, new, "id", ["text"], include_unchanged=True).collect()
    assert [(r["id"], r["change"]) for r in rows] == [(1, "unchanged")]


def test_profile_columns_exact_counts(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, None), (4, "y")],
        "id long, s string",
    )
    out = {r["column"]: r for r in profile_columns(df, ["id", "s"]).collect()}
    assert out["id"]["n_rows"] == 4 and out["id"]["n_null"] == 0
    assert out["id"]["n_distinct"] == 4 and out["id"]["null_frac"] == 0.0
    assert out["s"]["n_null"] == 1 and out["s"]["n_distinct"] == 2
    assert out["s"]["null_frac"] == 0.25
    with pytest.raises(ValueError, match="non-empty"):
        profile_columns(df, [])


def test_value_histogram_clamps_and_drops_null(spark):
    """Outliers clamp into edge bins; NULLs dropped; empty bins absent;
    edges derive from bin arithmetic."""
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (9.9,), (10.0,), (25.0,), (999.0,), (None,)],
        "v double",
    )
    out = {r["bin"]: r for r in value_histogram(df, "v", 0.0, 30.0, 3).collect()}
    assert set(out) == {0, 1, 2}
    assert out[0]["n"] == 3   # -5 clamped, 0.0, 9.9
    assert out[1]["n"] == 1   # 10.0
    assert out[2]["n"] == 2   # 25.0, 999 clamped
    assert out[1]["lo_edge"] == 10.0 and out[1]["hi_edge"] == 20.0
    with pytest.raises(ValueError, match="nbins"):
        value_histogram(df, "v", 0.0, 1.0, 0)
    with pytest.raises(ValueError, match="hi > lo"):
        value_histogram(df, "v", 1.0, 1.0, 4)


def test_snapshot_diff_digest_mode_matches_exact(spark):
    """digest=True (fixed-width shuffle payload, the 100 TB mode) must
    classify identically to the exact mode, including NULL handling."""
    old = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", None), (3, None, "z"), (4, "d", "w")],
        "id long, t string, u string",
    )
    new = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "set"), (3, None, "z"), (5, "e", "v")],
        "id long, t string, u string",
    )
    exact = {r["id"]: r["change"] for r in snapshot_diff(old, new, "id", ["t", "u"]).collect()}
    dig = {r["id"]: r["change"] for r in snapshot_diff(old, new, "id", ["t", "u"], digest=True).collect()}
    assert exact == dig == {2: "changed", 4: "removed", 5: "added"}


def test_value_histogram_drops_nan(spark):
    """NaN is dropped like NULL (code-review r4): an unguarded NaN casts
    to bin 0 and silently inflates the lowest bin."""
    df = spark.createDataFrame(
        [(float("nan"),), (5.0,), (None,)], "v double"
    )
    rows = value_histogram(df, "v", 0.0, 30.0, 3).collect()
    assert [(r["bin"], r["n"]) for r in rows] == [(0, 1)]


def test_profile_columns_approx_mode(spark):
    """exact=False trades the Expand for approx_count_distinct: no
    Expand in the plan, counts within the published ~2% envelope (assert
    5%), null accounting identical to exact mode."""
    from pyspark.sql import functions as F

    df = spark.range(20_000).select(
        F.col("id"),
        F.when(F.col("id") % 100 == 0, None).otherwise(F.col("id") % 500).alias("m"),
    )
    out = {r["column"]: r for r in profile_columns(df, ["id", "m"], exact=False).collect()}
    assert abs(out["id"]["n_distinct"] - 20_000) / 20_000 < 0.05
    assert abs(out["m"]["n_distinct"] - 499) / 499 < 0.05
    assert out["m"]["n_null"] == 200
    plan = (
        profile_columns(df, ["id", "m"], exact=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" not in plan


def test_psi_drift_identity_and_emptied_bin(spark):
    """Identical snapshots give psi_term ~ 0 in every bin; a snapshot
    whose mass leaves a bin entirely produces a large FINITE term via
    the eps floor (never inf/NaN); NULLs are excluded from both sides."""
    from mr_dice_spark.operators.profile import psi_drift

    import pytest

    old = spark.createDataFrame(
        [(float(i),) for i in range(1, 101)] + [(None,)], "v double"
    )
    same = psi_drift(old, old, "v", n_bins=5).collect()
    assert len(same) == 5
    assert sum(r["n_old"] for r in same) == 100  # NULL dropped
    for r in same:
        assert r["n_old"] == r["n_new"] == 20
        assert abs(r["psi_term"]) < 1e-6
    # new snapshot entirely above the old range: all mass lands in the
    # top bin, lower bins empty on the new side
    new = spark.createDataFrame([(float(i),) for i in range(200, 300)], "v double")
    drift = {r["bin"]: r for r in psi_drift(old, new, "v", n_bins=5).collect()}
    assert drift[5]["share_new"] == 1.0
    for b in range(1, 5):
        t = drift[b]["psi_term"]
        assert t is not None and t > 1.0  # (eps - 0.2) * ln(eps/0.2) is large
    total = sum(r["psi_term"] for r in drift.values())
    assert total > 0.25  # way past the "shifted" reading
    with pytest.raises(ValueError):
        psi_drift(old, new, "v", n_bins=1)


def test_psi_drift_empty_side_degrades_not_errors(spark):
    """An empty COMPARISON snapshot yields NULL shares and NULL psi
    terms (never an ANSI divide-by-zero mid-job, never an eps-floored
    pseudo-drift); an empty BASELINE has no distribution to bin against
    and fails fast with a clear error."""
    import pytest
    from pyspark.sql import functions as F

    from mr_dice_spark.operators.profile import psi_drift

    old = spark.createDataFrame([(float(i),) for i in range(1, 101)], "v double")
    empty = old.where(F.col("v") < 0)
    rows = psi_drift(old, empty, "v", n_bins=5).collect()
    assert len(rows) == 5
    assert all(r["share_new"] is None and r["psi_term"] is None for r in rows)
    with pytest.raises(ValueError, match="no non-null"):
        psi_drift(empty, old, "v", n_bins=5)


def test_ks_drift_identical_zero_planted_shift_positive_empty_null(spark):
    """Identical snapshots give ks_stat 0; a location shift is detected;
    an empty comparison side degrades to NULL shares (no ANSI divide
    error); cumulative shares end at 1."""
    from pyspark.sql import functions as F

    from mr_dice_spark.operators.profile import ks_drift

    base = spark.range(1000).select((F.col("id") % 100).cast("double").alias("v"))
    same = ks_drift(base, base, "v", n_bins=5).collect()
    assert all(r["ks_gap"] == 0.0 for r in same)
    assert all(r["ks_stat"] == 0.0 for r in same)
    assert max(r["cum_share_old"] for r in same) == 1.0

    shifted = base.select((F.col("v") + 50).alias("v"))
    drift = ks_drift(base, shifted, "v", n_bins=5).collect()
    assert drift[0]["ks_stat"] > 0.3

    empty = base.where(F.lit(False))
    degraded = ks_drift(base, empty, "v", n_bins=5).collect()
    assert all(r["cum_share_new"] is None and r["ks_gap"] is None
               for r in degraded)


def test_corpus_fingerprint_order_and_partition_invariant(spark):
    from mr_dice_spark.operators.profile import corpus_fingerprint

    rows = [(1, "a"), (2, "b"), (3, None)]
    df = spark.createDataFrame(rows, "id long, t string")
    [r1] = corpus_fingerprint(df, ["id", "t"]).collect()
    [r2] = corpus_fingerprint(
        spark.createDataFrame(list(reversed(rows)), "id long, t string").repartition(7),
        ["id", "t"],
    ).collect()
    assert (r1["n_rows"], r1["content_hash"]) == (r2["n_rows"], r2["content_hash"])
    # any value change moves the hash
    [r3] = corpus_fingerprint(
        spark.createDataFrame([(1, "a"), (2, "B"), (3, None)], "id long, t string"),
        ["id", "t"],
    ).collect()
    assert r3["content_hash"] != r1["content_hash"]
    # NULL and empty string are distinct
    [r4] = corpus_fingerprint(
        spark.createDataFrame([(1, "a"), (2, "b"), (3, "")], "id long, t string"),
        ["id", "t"],
    ).collect()
    assert r4["content_hash"] != r1["content_hash"]


def test_corpus_fingerprint_injective_canonicalization(spark):
    from mr_dice_spark.operators.profile import corpus_fingerprint

    # separator bytes inside a value must NOT shift content between
    # columns: ('a|b', 'c') and ('a', 'b|c') are different rows
    [h1] = corpus_fingerprint(
        spark.createDataFrame([("a|b", "c")], "x string, y string"), ["x", "y"]
    ).collect()
    [h2] = corpus_fingerprint(
        spark.createDataFrame([("a", "b|c")], "x string, y string"), ["x", "y"]
    ).collect()
    assert h1["content_hash"] != h2["content_hash"]
    # a literal 'N' value is distinct from NULL
    [h3] = corpus_fingerprint(
        spark.createDataFrame([("N",)], "x string"), ["x"]
    ).collect()
    [h4] = corpus_fingerprint(
        spark.createDataFrame([(None,)], "x string"), ["x"]
    ).collect()
    assert h3["content_hash"] != h4["content_hash"]


def test_corpus_fingerprint_counts_duplicates(spark):
    from mr_dice_spark.operators.profile import corpus_fingerprint

    import pytest as _pytest

    one = spark.createDataFrame([(1, "x")], "id long, t string")
    two = spark.createDataFrame([(1, "x"), (1, "x")], "id long, t string")
    [h1] = corpus_fingerprint(one, ["id", "t"]).collect()
    [h2] = corpus_fingerprint(two, ["id", "t"]).collect()
    # a summed multiset hash sees the duplicate (an XOR fold would not)
    assert h2["content_hash"] == (2 * h1["content_hash"]) % (1 << 60)
    with _pytest.raises(ValueError):
        corpus_fingerprint(one, [])


def test_category_entropy_known_values(spark):
    import math

    from mr_dice_spark.operators.profile import category_entropy

    rows = (
        [("bot", "click")] * 8                       # single class -> 0
        + [("uni", "a"), ("uni", "b"), ("uni", "c"), ("uni", "d")]  # ln 4
        + [("skew", "x")] * 3 + [("skew", "y")]      # -(3/4 ln 3/4 + 1/4 ln 1/4)
        + [("nulls", None), ("nulls", "z")]          # NULL is its own class
    )
    df = spark.createDataFrame(rows, "g string, c string")
    got = {r["g"]: r for r in category_entropy(df, "g", "c").collect()}
    assert got["bot"]["entropy"] == 0.0 and got["bot"]["n_cats"] == 1
    assert math.isclose(got["uni"]["entropy"], math.log(4), rel_tol=1e-12)
    expect_skew = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert math.isclose(got["skew"]["entropy"], expect_skew, rel_tol=1e-12)
    assert got["nulls"]["n_cats"] == 2
    assert math.isclose(got["nulls"]["entropy"], math.log(2), rel_tol=1e-12)


def test_fk_orphan_audit_planted_breaks(spark):
    from mr_dice_spark.operators.profile import fk_orphan_audit

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    [r] = fk_orphan_audit(child, "fk", parent, "pk", "c->p").collect()
    assert (r["relationship"], r["n_rows"], r["n_null_fk"], r["n_orphans"]) == (
        "c->p", 4, 1, 1,
    )
    # intact edge reports zero orphans
    ok_child = spark.createDataFrame([(1, 10), (2, 20)], "id long, fk long")
    [r2] = fk_orphan_audit(ok_child, "fk", parent, "pk", "ok").collect()
    assert r2["n_orphans"] == 0 and r2["n_null_fk"] == 0


def test_mutual_information_known_values(spark):
    import math

    from mr_dice_spark.operators.profile import mutual_information

    # independent -> 0; identical -> mi = H(X), nmi = 1
    ind = spark.createDataFrame(
        [(a, b) for a in "xy" for b in "uv" for _ in range(25)], "a string, b string"
    )
    [r] = mutual_information(ind, "a", "b").collect()
    assert r["mi"] == 0.0 and r["nmi"] == 0.0
    dep = spark.createDataFrame(
        [("x", "x")] * 30 + [("y", "y")] * 70, "a string, b string"
    )
    [r2] = mutual_information(dep, "a", "b").collect()
    h = -(0.3 * math.log(0.3) + 0.7 * math.log(0.7))
    assert math.isclose(r2["mi"], h, rel_tol=1e-12)
    assert math.isclose(r2["nmi"], 1.0, rel_tol=1e-12)
    # constant column -> zero entropy -> nmi NULL, mi 0
    const = spark.createDataFrame([("x", "u"), ("x", "v")], "a string, b string")
    [r3] = mutual_information(const, "a", "b").collect()
    assert r3["mi"] == 0.0 and r3["nmi"] is None


def test_benford_digits_shares_and_exclusions(spark):
    """Known digit mix incl. negatives, sub-1 magnitudes, zero and NULL:
    shares over the 4 countable rows; zero/NULL carry no digit."""
    from mr_dice_spark.operators.profile import benford_audit

    rows = [(1, 123.0), (2, -19.5), (3, 0.047), (4, 900.1), (5, 0.0), (6, None)]
    df = spark.createDataFrame(rows, "id long, v double")
    got = {r["digit"]: r for r in benford_audit(df, "v").collect()}
    assert set(got) == {1, 4, 9}
    assert got[1]["n"] == 2 and got[4]["n"] == 1 and got[9]["n"] == 1
    assert abs(got[1]["share"] - 0.5) < 1e-12
    import math
    assert abs(got[9]["expected"] - math.log10(1 + 1 / 9)) < 1e-12
    assert abs(got[1]["excess"] - (0.5 - math.log10(2))) < 1e-12


def test_gini_extremes_and_guards(spark):
    """All-equal values -> G = (n-1)/n - 1 + 2*avg-rank-form = 0-ish
    exactly via the rank formula; total concentration -> (n-1)/n;
    negative values excluded; singleton group -> NULL."""
    from mr_dice_spark.operators.profile import gini_concentration

    rows = [("eq", 5.0, i) for i in range(4)]
    rows += [("one", 0.0, 1), ("one", 0.0, 2), ("one", 0.0, 3), ("one", 12.0, 4)]
    rows += [("neg", -1.0, 1), ("neg", 3.0, 2), ("neg", 3.0, 3)]
    rows += [("single", 7.0, 1)]
    df = spark.createDataFrame(rows, "g string, v double, id long")
    got = {r["g"]: r for r in gini_concentration(df, "g", "v", "id").collect()}
    # equal mass: G = 2*(sum r * x)/(n*sum x) - (n+1)/n = 2*(1+2+3+4)/(4*4) - 5/4 = 0
    assert abs(got["eq"]["gini"]) < 1e-12
    # one holder of everything: G = 2*4*12/(4*12) - 5/4 = 3/4 = (n-1)/n
    assert abs(got["one"]["gini"] - 0.75) < 1e-12
    assert got["neg"]["n"] == 2          # the -1 row is excluded
    assert got["single"]["gini"] is None


def test_chi_square_known_2x2_and_absent_cells(spark):
    """Hand-computed 2x2 chi-square; then a table with an absent cell —
    the closing reduce must add the absent cell's expected mass."""
    from mr_dice_spark.operators.profile import chi_square_independence

    rows = [("a", 0)] * 30 + [("a", 1)] * 10 + [("b", 0)] * 10 + [("b", 1)] * 30
    df = spark.createDataFrame(rows, "x string, y int")
    [r] = chi_square_independence(df, "x", "y").collect()
    # marginals 40/40 and 40/40 over n=80 -> every e = 20; chi2 = 4*(10^2/20)
    assert r["n"] == 80 and r["dof"] == 1
    assert abs(r["chi2"] - 20.0) < 1e-9
    assert abs(r["cramers_v"] - (20.0 / 80) ** 0.5) < 1e-12

    rows2 = [("a", 0)] * 6 + [("a", 1)] * 2 + [("b", 0)] * 4  # (b,1) absent
    df2 = spark.createDataFrame(rows2, "x string, y int")
    [r2] = chi_square_independence(df2, "x", "y").collect()
    exp = {( "a",0): 8*10/12, ("a",1): 8*2/12, ("b",0): 4*10/12, ("b",1): 4*2/12}
    obs = {("a",0): 6, ("a",1): 2, ("b",0): 4, ("b",1): 0}
    chi2 = sum((obs[k] - e) ** 2 / e for k, e in exp.items())
    assert abs(r2["chi2"] - chi2) < 1e-9


def test_chi_square_constant_column_degenerate(spark):
    from mr_dice_spark.operators.profile import chi_square_independence

    df = spark.createDataFrame([("a", 1), ("b", 1), ("a", 1)], "x string, y int")
    [r] = chi_square_independence(df, "x", "y").collect()
    assert r["dof"] == 0 and r["cramers_v"] is None
    assert abs(r["chi2"]) < 1e-9


def test_gini_binned_matches_exact_at_extremes_and_guards(spark):
    """The binned estimator is EXACT at both Gini extremes (all-equal,
    single-holder) and must refuse exact mode without an id; n_bins
    validated."""
    import pytest

    from mr_dice_spark.operators.profile import gini_concentration

    rows = [("eq", 5.0, i) for i in range(6)]
    rows += [("one", 0.0, i) for i in range(5)] + [("one", 9.0, 99)]
    df = spark.createDataFrame(rows, "g string, v double, id long")
    got = {r["g"]: r["gini"] for r in
           gini_concentration(df, "g", "v", exact=False, n_bins=16).collect()}
    assert abs(got["eq"]) < 1e-12
    assert abs(got["one"] - 5.0 / 6.0) < 1e-12
    with pytest.raises(ValueError, match="id_col"):
        gini_concentration(df, "g", "v")          # exact without id
    with pytest.raises(ValueError, match="n_bins"):
        gini_concentration(df, "g", "v", exact=False, n_bins=1)


def test_gini_binned_close_to_exact_on_skewed_data(spark):
    from mr_dice_spark.operators.profile import gini_concentration

    rows = [("g", float(i * i), i) for i in range(1, 200)]
    df = spark.createDataFrame(rows, "g string, v double, id long")
    [ex] = gini_concentration(df, "g", "v", "id").collect()
    [ap] = gini_concentration(df, "g", "v", exact=False, n_bins=256).collect()
    assert abs(ex["gini"] - ap["gini"]) < 0.01


def test_validate_expectations_fail_closed_and_counts(spark):
    from pyspark.sql import functions as F

    from mr_dice_spark.operators.profile import validate_expectations

    import pytest

    rows = [(1, 5.0, "a"), (2, -1.0, "b"), (3, None, "a"), (4, 2.0, None)]
    df = spark.createDataFrame(rows, "id long, v double, c string")
    out = {r["rule"]: r for r in validate_expectations(df, [
        ("v_positive", F.col("v") > 0),               # NULL v -> failed
        ("c_enum", F.col("c").isin("a", "b")),        # NULL c -> failed
        ("v_nullable_positive", F.col("v").isNull() | (F.col("v") > 0)),
    ]).collect()}
    assert out["v_positive"]["n_failed"] == 2       # -1 and NULL
    assert out["c_enum"]["n_failed"] == 1           # NULL c fails closed
    assert out["v_nullable_positive"]["n_failed"] == 1  # only -1
    assert abs(out["v_positive"]["pass_rate"] - 0.5) < 1e-9
    with pytest.raises(ValueError, match="no rules"):
        validate_expectations(df, [])
    # rule names are spliced into the stack() literal — quotes and
    # backslashes must be escaped, not break the parse (ADVICE r5)
    quoted = {r["rule"]: r for r in validate_expectations(df, [
        ("price's range", F.col("v") > 0),
        ('back\\slash "mix\'d"', F.col("c").isNotNull()),
    ]).collect()}
    assert quoted["price's range"]["n_failed"] == 2
    assert quoted['back\\slash "mix\'d"']["n_failed"] == 1


def test_k_anonymity_counts_and_null_as_value(spark):
    import pytest

    from mr_dice_spark.operators.profile import k_anonymity_audit

    rows = [("a", 1)] * 5 + [("a", 2)] * 2 + [(None, 1)] * 1
    df = spark.createDataFrame(rows, "q1 string, q2 int")
    [r] = k_anonymity_audit(df, ["q1", "q2"], k=5).collect()
    assert r["n_rows"] == 8 and r["n_groups"] == 3
    assert r["n_violating_groups"] == 2      # the 2-row and the NULL 1-row group
    assert r["n_rows_at_risk"] == 3
    assert r["min_group_size"] == 1
    with pytest.raises(ValueError, match="k must"):
        k_anonymity_audit(df, ["q1"], k=1)
    with pytest.raises(ValueError, match="quasi_cols"):
        k_anonymity_audit(df, [], k=5)


def test_l_diversity_homogeneous_group_flagged(spark):
    import pytest

    from mr_dice_spark.operators.profile import l_diversity_audit

    # group A: 4 rows, all sensitive 'x' (k-anonymous, NOT diverse)
    # group B: 2 rows, sensitive x/y (diverse at l=2)
    rows = [("A", "x")] * 4 + [("B", "x"), ("B", "y")]
    df = spark.createDataFrame(rows, "q string, s string")
    [r] = l_diversity_audit(df, ["q"], "s", l=2).collect()
    assert r["n_groups"] == 2 and r["n_violating_groups"] == 1
    assert r["n_rows_at_risk"] == 4 and r["min_diversity"] == 1
    with pytest.raises(ValueError, match="l must"):
        l_diversity_audit(df, ["q"], "s", l=1)


def test_t_closeness_distance_by_hand_and_absent_values(spark):
    """TVD distances computed by hand, including a group MISSING a
    sensitive value (the absent-value identity must charge it p(v)),
    and NULL-as-a-value semantics."""
    import pytest

    from mr_dice_spark.operators.profile import t_closeness_audit

    # corpus: a x8, b x4 -> p = (2/3, 1/3)
    # g1 a:3 b:1 -> 0.5*(|3/4-2/3| + |1/4-1/3|) = 1/12
    # g2 a:1 b:3 -> 5/12 ; g3 a:4 (b absent) -> 0.5*(1/3 + 1/3) = 1/3
    rows = (
        [("g1", "a")] * 3 + [("g1", "b")]
        + [("g2", "a")] + [("g2", "b")] * 3
        + [("g3", "a")] * 4
    )
    df = spark.createDataFrame(rows, "q string, s string")
    [r] = t_closeness_audit(df, ["q"], "s", t=0.3).collect()
    assert r["n_rows"] == 12 and r["n_groups"] == 3
    assert r["n_violating_groups"] == 2          # g2 (5/12), g3 (1/3)
    assert r["n_rows_at_risk"] == 8
    assert abs(r["max_distance"] - 5 / 12) < 1e-6
    # NULL sensitive is a value: an all-NULL group in a mixed corpus is far
    rows2 = [("h1", None)] * 3 + [("h2", "v")] * 3
    df2 = spark.createDataFrame(rows2, "q string, s string")
    [r2] = t_closeness_audit(df2, ["q"], "s", t=0.4).collect()
    assert r2["n_violating_groups"] == 2         # both at TVD 0.5
    assert abs(r2["max_distance"] - 0.5) < 1e-6
    with pytest.raises(ValueError, match="t must"):
        t_closeness_audit(df, ["q"], "s", t=0.0)
    with pytest.raises(ValueError, match="quasi_cols"):
        t_closeness_audit(df, [], "s", t=0.2)


def test_js_divergence_identical_disjoint_and_bounds(spark):
    """Identical snapshots => every term 0; disjoint distributions =>
    total JSD = 1 bit (the upper bound); zero-share bins contribute the
    finite q-part with no epsilon."""
    from mr_dice_spark.operators.profile import js_divergence_bins

    vals = [float(v) for v in range(1, 101)]
    a = spark.createDataFrame([(v,) for v in vals], "v double")
    same = js_divergence_bins(a, a, "v", n_bins=5).collect()
    assert len(same) == 5
    assert all(abs(r["jsd_term"]) < 1e-7 for r in same)
    # shifted: new values all above the old maximum -> all new mass in
    # the TOP bin (bucket = 1 + edges-below count caps there)
    b = spark.createDataFrame([(v + 1000.0,) for v in vals], "v double")
    rows = js_divergence_bins(a, b, "v", n_bins=5).collect()
    total = sum(r["jsd_term"] for r in rows)
    import math

    # bins 1-4: p=.2, q=0, m=.1 -> term .5*.2*log2(2) = .1 each;
    # bin 5: p=.2 AND q=1, m=.6 -> .5*.2*log2(.2/.6) + .5*1*log2(1/.6)
    exp = 4 * 0.1 + 0.1 * math.log2(0.2 / 0.6) + 0.5 * math.log2(1 / 0.6)
    assert abs(total - exp) < 1e-6
    # per-bin terms may be negative (the p-part of a mixed bin); the
    # TOTAL is the bounded quantity
    assert 0.0 <= total <= 1.0


def test_simpson_diversity_hand_counts(spark):
    from mr_dice_spark.operators.profile import simpson_diversity

    rows = [("u", "a")] * 5 + [("u", "b")] * 5 + [("m", "a")] * 9 + [("m", "b")]
    df = spark.createDataFrame(rows, "g string, l string")
    got = {r["g"]: r for r in simpson_diversity(df, "g", "l").collect()}
    # uniform two labels: sum p^2 = .5 -> simpson .5, effective 2
    assert abs(got["u"]["simpson"] - 0.5) < 1e-9
    assert abs(got["u"]["effective_labels"] - 2.0) < 1e-9
    # 90/10 split: sum p^2 = .82
    assert abs(got["m"]["simpson"] - 0.18) < 1e-9
    assert abs(got["m"]["effective_labels"] - 1 / 0.82) < 1e-6
    assert got["m"]["n"] == 10 and got["m"]["n_labels"] == 2


def test_lorenz_curve_hand_values_and_edges(spark):
    import pytest as _pt

    from mr_dice_spark.operators.profile import lorenz_curve

    rows = [("g", i, float(v)) for i, v in enumerate([1, 2, 3, 4])]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    out = lorenz_curve(df, "g", "v", "id", n_points=2).orderBy("tile").collect()
    assert [(r["tile"], r["n"]) for r in out] == [(1, 2), (2, 2)]
    assert out[0]["cum_pop_share"] == _pt.approx(0.5, abs=1e-6)
    assert out[0]["cum_value_share"] == _pt.approx(0.3, abs=1e-6)
    assert out[1]["cum_pop_share"] == _pt.approx(1.0, abs=1e-6)
    assert out[1]["cum_value_share"] == _pt.approx(1.0, abs=1e-6)
    # zero total mass: pop shares exact, value shares NULL
    zero = spark.createDataFrame(
        [("z", 1, 0.0), ("z", 2, 0.0)], "g string, id long, v double"
    )
    zout = lorenz_curve(zero, "g", "v", "id", n_points=2).orderBy("tile").collect()
    assert zout[0]["cum_value_share"] is None
    assert zout[0]["cum_pop_share"] == _pt.approx(0.5, abs=1e-6)
    # negative values excluded (Lorenz needs non-negative mass)
    neg = spark.createDataFrame(
        [("n", 1, -5.0), ("n", 2, 1.0), ("n", 3, 3.0)],
        "g string, id long, v double",
    )
    nout = lorenz_curve(neg, "g", "v", "id", n_points=2).collect()
    assert sum(r["n"] for r in nout) == 2
    with _pt.raises(ValueError, match="n_points"):
        lorenz_curve(df, "g", "v", "id", n_points=1)
