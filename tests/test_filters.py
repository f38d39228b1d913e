"""OPTIMADE filter parser/compiler tests (P1-P8, P12-P13)."""

import pytest
from pyspark.sql import functions as F

from mr_dice_spark.filters import FilterSyntaxError, compile_filter, parse_filter
from mr_dice_spark.filters.optimade import BoolOp, Cmp, Has, Not
from mr_dice_spark.functions.formula import anonymous_formula, hill_formula, parse_formula


@pytest.fixture(scope="module")
def structures(spark):
    rows = [
        (1, "SiO2", "O2Si", ["Si", "O"], 2, 2.1),
        (2, "Fe2O3", "Fe2O3", ["Fe", "O"], 2, None),
        (3, "TiAl", "AlTi", ["Ti", "Al"], 2, 0.0),
        (4, "MgAl2O4", "Al2MgO4", ["Mg", "Al", "O"], 3, 5.5),
        (5, "C6H12O6", "C6H12O6", ["C", "H", "O"], 3, 1.2),
    ]
    return spark.createDataFrame(
        rows,
        "id int, formula string, chemical_formula_reduced string, "
        "elements array<string>, nelements int, band_gap double",
    )


def ids(df, cond):
    return sorted(r.id for r in df.where(cond).select("id").collect())


def test_equality_and_hill_canonicalization(structures):
    # literal SiO2 is canonicalized to Hill order O2Si at compile time (P12)
    assert ids(structures, compile_filter('chemical_formula_reduced="SiO2"')) == [1]
    assert ids(structures, compile_filter('chemical_formula_reduced="O2Si"')) == [1]


def test_unicode_digit_literal(structures):
    assert ids(structures, compile_filter('formula="SiO₂"')) == [1]


def test_comparisons_and_bool(structures):
    c = compile_filter('nelements>=2 AND nelements<=2 AND band_gap>1')
    assert ids(structures, c) == [1]
    c = compile_filter('nelements=3 OR (band_gap>=2 AND band_gap<=3)')
    assert ids(structures, c) == [1, 4, 5]


def test_has_all_any_only(structures):
    assert ids(structures, compile_filter('elements HAS ALL "Al","O"')) == [4]
    assert ids(structures, compile_filter('elements HAS ANY "Fe","Ti"')) == [2, 3]
    assert ids(structures, compile_filter('elements HAS ONLY "Si","O","C","H"')) == [1, 5]
    assert ids(structures, compile_filter('elements HAS "O"')) == [1, 2, 4, 5]
    # NOT + HAS ANY (the agent's demo idiom)
    c = compile_filter('(elements HAS ANY "O") AND NOT (elements HAS ANY "H")')
    assert ids(structures, c) == [1, 2, 4]


def test_contains_starts_ends(structures):
    assert ids(structures, compile_filter('formula CONTAINS "O2"')) == [1]
    assert ids(structures, compile_filter('formula CONTAINS "2O"')) == [2, 4, 5]
    assert ids(structures, compile_filter('formula STARTS WITH "Fe"')) == [2]
    assert ids(structures, compile_filter('formula ENDS WITH "4"')) == [4]


def test_length_known(structures):
    assert ids(structures, compile_filter("elements LENGTH 3")) == [4, 5]
    assert ids(structures, compile_filter("elements LENGTH >= 3")) == [4, 5]
    assert ids(structures, compile_filter("band_gap IS UNKNOWN")) == [2]
    assert ids(structures, compile_filter("band_gap IS KNOWN")) == [1, 3, 4, 5]


def test_reversed_comparison(structures):
    assert ids(structures, compile_filter('3 = nelements')) == [4, 5]
    assert ids(structures, compile_filter('2 < nelements')) == [4, 5]


def test_ast_shape():
    node = parse_filter('(a=1 OR b=2) AND NOT c HAS "x"')
    assert isinstance(node, BoolOp) and node.op == "and"
    assert isinstance(node.children[0], BoolOp) and node.children[0].op == "or"
    assert isinstance(node.children[1], Not)
    assert node.children[0].children[0] == Cmp("a", "=", 1)
    assert node.children[1].child == Has("c", "has", ("x",))


@pytest.mark.parametrize(
    "bad",
    ["", "AND", "a =", 'a HAS', "a CONTAINS 5", "(a=1", "a=1)", "a ~~ 2", 'a=1 b=2'],
)
def test_syntax_errors(bad):
    with pytest.raises(FilterSyntaxError):
        parse_filter(bad)


def test_pushdown_reaches_scan(spark, oracle_sf_dir):
    """The compiled predicate must reach the Parquet scan (SURVEY.md §4 R1)."""
    from mr_dice_spark.catalog import Catalog
    from mr_dice_spark.filters import compile_filter

    part = Catalog(spark, oracle_sf_dir).part
    df = part.where(compile_filter('p_size>=10 AND p_type="PROMO"'))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(p_size,10)" in plan and "EqualTo(p_type,PROMO)" in plan


# formula functions -----------------------------------------------------------

def test_parse_formula():
    assert parse_formula("Fe2O3") == {"Fe": 2, "O": 3}
    assert parse_formula("C6H12O6") == {"C": 6, "H": 12, "O": 6}
    with pytest.raises(ValueError):
        parse_formula("xyz!")


def test_hill_formula():
    assert hill_formula("SiO2") == "O2Si"
    assert hill_formula("O2Si") == "O2Si"
    assert hill_formula("C6H12O6") == "C6H12O6"
    assert hill_formula("H2O") == "H2O"  # no C: alphabetical H then O
    assert hill_formula("CaCO3") == "CCaO3"


def test_anonymous_formula():
    assert anonymous_formula("SiO2") == "A2B"
    assert anonymous_formula("Fe2O3") == "A3B2"
    assert anonymous_formula("MgAl2O4") == "A4B2C"


def test_formation_energy_per_atom(spark):
    from mr_dice_spark.functions.formula import formation_energy_per_atom

    df = spark.createDataFrame(
        [
            (1, "Fe2O3", -10.0),   # (-10 - (2*-1 + 3*-2)) / 5 = -0.4
            (2, "SrTiO₃", -20.0),  # unicode subscript -> (-20 + 8) / 5
            (3, "Fe", -3.0),       # implicit count 1
            (4, "Zz2O", -1.0),     # unknown element -> NULL
            (5, "garbage!", -1.0), # untokenizable -> NULL
            (6, "", -1.0),         # empty -> NULL
            (7, None, -1.0),       # NULL formula -> NULL
        ],
        "id long, formula string, e double",
    )
    ref = {"Fe": -1.0, "O": -2.0, "Sr": -0.5, "Ti": -1.5}
    out = formation_energy_per_atom(df, "id", "formula", "e", ref, out_col="fe")
    got = {r["id"]: r["fe"] for r in out.collect()}
    assert got[1] == pytest.approx(-0.4)
    assert got[2] == pytest.approx(-2.4)
    assert got[3] == pytest.approx(-2.0)
    assert got[4] is None and got[5] is None and got[6] is None and got[7] is None


# ---------------------------------------------------------------------------
# property test: random filter ASTs rendered to OPTIMADE text, parsed back,
# compiled to Columns, and checked against a pure-Python three-valued-logic
# reference model — parser precedence, literal handling, HAS/LENGTH/KNOWN
# semantics, and SQL NULL propagation all in one net.
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

from mr_dice_spark.filters.optimade import (
    BoolOp,
    Cmp,
    Has,
    Known,
    Length,
    Not,
    StrMatch,
    compile_filter,
    parse_filter,
)

_PROP_ROWS = [
    {"id": 0, "nelements": 1, "band_gap": 0.0, "name": "abc", "elements": ["Si", "O"]},
    {"id": 1, "nelements": 2, "band_gap": 1.5, "name": "abd", "elements": ["Si"]},
    {"id": 2, "nelements": 3, "band_gap": None, "name": "xyz", "elements": ["Fe", "O"]},
    {"id": 3, "nelements": 4, "band_gap": 3.2, "name": "xabc", "elements": []},
    {"id": 4, "nelements": 2, "band_gap": None, "name": "bcd", "elements": ["Al", "Si", "O"]},
    {"id": 5, "nelements": 6, "band_gap": 0.7, "name": "abcx", "elements": ["O"]},
]

_cmp_int = st.builds(
    Cmp,
    st.just("nelements"),
    st.sampled_from(["=", "!=", "<", "<=", ">", ">="]),
    st.integers(1, 5),
)
_cmp_float = st.builds(
    Cmp,
    st.just("band_gap"),
    st.sampled_from(["=", "!=", "<", "<=", ">", ">="]),
    st.sampled_from([0.0, 0.7, 1.5, 2.0]),
)
_strmatch = st.builds(
    StrMatch,
    st.just("name"),
    st.sampled_from(["contains", "starts", "ends"]),
    st.sampled_from(["a", "ab", "abc", "x", "bc"]),
)
_has = st.builds(
    Has,
    st.just("elements"),
    st.sampled_from(["all", "any", "only"]),
    st.lists(st.sampled_from(["Si", "O", "Fe", "Al"]), min_size=1, max_size=3, unique=True).map(tuple),
)
_length = st.builds(
    Length,
    st.just("elements"),
    st.sampled_from(["=", "<", "<=", ">", ">="]),
    st.integers(0, 3),
)
_known = st.builds(Known, st.just("band_gap"), st.booleans())

_leaf = st.one_of(_cmp_int, _cmp_float, _strmatch, _has, _length, _known)

_ast = st.recursive(
    _leaf,
    lambda children: st.one_of(
        st.builds(Not, children),
        st.builds(
            BoolOp,
            st.sampled_from(["and", "or"]),
            st.lists(children, min_size=2, max_size=3).map(tuple),
        ),
    ),
    max_leaves=6,
)


def _render(n) -> str:
    if isinstance(n, Cmp):
        v = f'"{n.value}"' if isinstance(n.value, str) else repr(n.value)
        return f"{n.field} {n.op} {v}"
    if isinstance(n, StrMatch):
        kw = {"contains": "CONTAINS", "starts": "STARTS WITH", "ends": "ENDS WITH"}[n.mode]
        return f'{n.field} {kw} "{n.value}"'
    if isinstance(n, Has):
        vals = ", ".join(f'"{v}"' for v in n.values)
        return f"{n.field} HAS {n.mode.upper()} {vals}"
    if isinstance(n, Length):
        return f"{n.field} LENGTH {n.op} {n.value}"
    if isinstance(n, Known):
        return f"{n.field} IS {'KNOWN' if n.known else 'UNKNOWN'}"
    if isinstance(n, Not):
        return f"NOT ({_render(n.child)})"
    if isinstance(n, BoolOp):
        return "(" + f" {n.op.upper()} ".join(_render(c) for c in n.children) + ")"
    raise TypeError(n)


def _kleene_eval(n, row):
    """SQL three-valued logic reference: returns True / False / None."""
    if isinstance(n, Cmp):
        v = row[n.field]
        if v is None:
            return None
        import operator as op_mod

        ops = {"=": op_mod.eq, "!=": op_mod.ne, "<": op_mod.lt,
               "<=": op_mod.le, ">": op_mod.gt, ">=": op_mod.ge}
        return ops[n.op](v, n.value)
    if isinstance(n, StrMatch):
        v = row[n.field]
        if v is None:
            return None
        if n.mode == "contains":
            return n.value in v
        return v.startswith(n.value) if n.mode == "starts" else v.endswith(n.value)
    if isinstance(n, Has):
        have = set(row[n.field])
        want = set(n.values)
        if n.mode in ("has", "all"):
            return want <= have
        if n.mode == "any":
            return bool(want & have)
        return have <= want
    if isinstance(n, Length):
        import operator as op_mod

        ops = {"=": op_mod.eq, "!=": op_mod.ne, "<": op_mod.lt,
               "<=": op_mod.le, ">": op_mod.gt, ">=": op_mod.ge}
        return ops[n.op](len(row[n.field]), n.value)
    if isinstance(n, Known):
        return (row[n.field] is not None) == n.known
    if isinstance(n, Not):
        c = _kleene_eval(n.child, row)
        return None if c is None else (not c)
    if isinstance(n, BoolOp):
        vals = [_kleene_eval(c, row) for c in n.children]
        if n.op == "and":
            if any(v is False for v in vals):
                return False
            return None if any(v is None for v in vals) else True
        if any(v is True for v in vals):
            return True
        return None if any(v is None for v in vals) else False
    raise TypeError(n)


@given(ast=_ast)
@settings(max_examples=30, deadline=None)
def test_filter_roundtrip_matches_kleene_model(spark, ast):
    text = _render(ast)
    parsed = parse_filter(text)
    df = spark.createDataFrame(
        _PROP_ROWS,
        "id long, nelements int, band_gap double, name string, elements array<string>",
    )
    got = sorted(r["id"] for r in df.where(compile_filter(parsed)).collect())
    want = sorted(r["id"] for r in _PROP_ROWS if _kleene_eval(ast, r) is True)
    assert got == want, f"filter: {text}"
