"""Hypothesis property tests for the round-11 rank statistics: every
rank-based statistic must be INVARIANT under the transform class its
theory promises (strictly monotone for pure-rank tests, affine for
deviation-then-rank, label permutation for categorical tables).

These run each example through Spark, so example counts stay small —
the properties are exact-equality checks on exact-integer outputs, so
a single violating example would fail deterministically.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

_vals = st.lists(
    st.integers(min_value=0, max_value=9), min_size=4, max_size=12
)


@settings(max_examples=8, deadline=None)
@given(xs=_vals)
def test_pettitt_monotone_invariant(spark, xs):
    from mr_dice_spark.operators.timeseries import pettitt_from_buckets

    rows = [("a", float(i), float(v)) for i, v in enumerate(xs)]
    rows += [("b", float(i), float(2 * v + 1) ** 3) for i, v in enumerate(xs)]
    df = spark.createDataFrame(rows, "__k string, __h double, __v double")
    got = {r["__k"]: r for r in pettitt_from_buckets(df, "__k").collect()}
    a, b = got["a"], got["b"]
    # k_stat / cp_index / u_at_cp are exact longs over ranks only
    assert (a["k_stat"], a["cp_index"], a["u_at_cp"], a["p_approx"]) == (
        b["k_stat"], b["cp_index"], b["u_at_cp"], b["p_approx"]
    )


@settings(max_examples=8, deadline=None)
@given(
    xs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.integers(min_value=0, max_value=6),
        ),
        min_size=6,
        max_size=16,
    )
)
def test_dunn_monotone_invariant(spark, xs):
    from mr_dice_spark.operators.anova import dunn_posthoc

    rows = [("a", str(g), float(v)) for g, v in xs]
    rows += [("b", str(g), float(3 * v) ** 3 + 1.0) for g, v in xs]
    df = spark.createDataFrame(rows, "k string, g string, v double")
    res = dunn_posthoc(df, "k", "g", "v").collect()
    a = sorted(
        (r["g_a"], r["g_b"], r["mean_rank_a"], r["mean_rank_b"], r["z"])
        for r in res
        if r["k"] == "a"
    )
    b = sorted(
        (r["g_a"], r["g_b"], r["mean_rank_a"], r["mean_rank_b"], r["z"])
        for r in res
        if r["k"] == "b"
    )
    assert a == b


@settings(max_examples=8, deadline=None)
@given(
    xs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.integers(min_value=0, max_value=8),
        ),
        min_size=6,
        max_size=16,
    )
)
def test_conover_affine_invariant(spark, xs):
    """|x - mean| scales by |a| under x -> a x + b (a > 0 here), so
    the pooled ranks — and T — cannot move. Integer a, b and small
    integer values keep every double exact, so equality is exact."""
    from mr_dice_spark.operators.anova import conover_squared_ranks

    rows = [("a", str(g), float(v)) for g, v in xs]
    rows += [("b", str(g), 4.0 * v - 7.0) for g, v in xs]
    df = spark.createDataFrame(rows, "k string, g string, v double")
    got = {
        r["k"]: r for r in conover_squared_ranks(df, "k", "g", "v").collect()
    }
    assert got["a"]["t_stat"] == got["b"]["t_stat"]
    assert got["a"]["dof"] == got["b"]["dof"]


@settings(max_examples=8, deadline=None)
@given(
    xs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=3),
        ),
        min_size=5,
        max_size=20,
    )
)
def test_somers_order_embedding_invariant(spark, xs):
    """Somers' D depends only on the ORDER of the category codes: any
    strictly increasing relabeling (here 0,1,2,3 -> 0,5,6,50) leaves
    every output — counts and both d's — identical."""
    from mr_dice_spark.operators.anova import somers_d_cells

    remap = {0: 0, 1: 5, 2: 6, 3: 50}
    rows = [("a", x, y) for x, y in xs]
    rows += [("b", remap[x], remap[y]) for x, y in xs]
    df = spark.createDataFrame(rows, "k string, x int, y int")
    got = {r["k"]: r for r in somers_d_cells(df, "k", "x", "y").collect()}
    cols = [
        "n", "concordant", "discordant", "n1_ties_x", "n2_ties_y",
        "d_yx", "d_xy",
    ]
    assert [got["a"][c] for c in cols] == [got["b"][c] for c in cols]


@settings(max_examples=8, deadline=None)
@given(
    xs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.integers(min_value=0, max_value=2),
        ),
        min_size=6,
        max_size=25,
    )
)
def test_stuart_maxwell_label_permutation_invariant(spark, xs):
    """Marginal homogeneity is a property of the (row, col) label
    STRUCTURE: permuting the three category labels consistently on
    both margins permutes d and the pair sums together, so chi2 is
    unchanged."""
    from mr_dice_spark.operators.evaluation import stuart_maxwell_3

    perm = {0: 2, 1: 0, 2: 1}
    rows = [("a", x, y) for x, y in xs]
    rows += [("b", perm[x], perm[y]) for x, y in xs]
    df = spark.createDataFrame(rows, "k string, a int, b int")
    got = {r["k"]: r for r in stuart_maxwell_3(df, "k", "a", "b").collect()}
    assert got["a"]["chi2"] == got["b"]["chi2"]
    assert got["a"]["k_categories"] == got["b"]["k_categories"]
    assert got["a"]["dof"] == got["b"]["dof"]
