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
