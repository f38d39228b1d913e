"""structure_near_dup / energy-above-hull family (SURVEY.md D4/F16)."""

import pytest
from pyspark.sql import functions as F

from mr_dice_spark.operators.structures import (
    energy_above_block_min,
    energy_above_hull,
    energy_band_pair,
    structure_candidate_pairs,
    structure_near_dup,
)


def _frame(spark, rows):
    return spark.createDataFrame(
        rows,
        "id long, formula string, energy double, "
        "lengths array<double>, angles array<double>",
    )


def test_candidate_pairs_block_and_band(spark):
    df = _frame(spark, [
        (1, "SiO2", -10.0, [4.0, 4.0, 4.0], [90.0, 90.0, 90.0]),
        (2, "SiO2", -10.2, [4.0, 4.0, 4.0], [90.0, 90.0, 90.0]),   # within 5%
        (3, "SiO2", -12.0, [4.0, 4.0, 4.0], [90.0, 90.0, 90.0]),   # band outlier
        (4, "NaCl", -10.0, [4.0, 4.0, 4.0], [90.0, 90.0, 90.0]),   # other block
        (5, "SiO2", None, [4.0, 4.0, 4.0], [90.0, 90.0, 90.0]),    # NULL energy
    ])
    got = {(r["id_a"], r["id_b"])
           for r in structure_candidate_pairs(df, "id", "formula", "energy").collect()}
    assert got == {(1, 2)}


def test_energy_band_zero_zero_is_duplicate_eligible(spark):
    # the reference divides by max(|e1|,|e2|) and would raise at 0/0; the
    # restated predicate must treat equal zero energies as in-band
    row = spark.range(1).select(
        energy_band_pair(F.lit(0.0), F.lit(0.0)).alias("ok")
    ).first()
    assert row["ok"] is True


def test_near_dup_lattice_tolerances_and_symmetry(spark):
    base = [4.0, 5.0, 6.0]
    angles = [90.0, 95.0, 100.0]
    df = _frame(spark, [
        (1, "SiO2", -10.0, base, angles),
        (2, "SiO2", -10.1, [4.1, 5.1, 6.1], [94.9, 90.2, 104.9]),  # within ltol/angle_tol
        (3, "SiO2", -10.1, [4.5, 5.0, 6.0], angles),               # length out of 5%
        (4, "SiO2", -10.1, base, [90.0, 95.0, 106.0]),             # angle out of 5 deg
    ])
    got = {(r["id_a"], r["id_b"])
           for r in structure_near_dup(
               df, "id", "formula", "energy", "lengths", "angles").collect()}
    assert (1, 2) in got
    assert (1, 3) not in got and (1, 4) not in got
    # symmetric relative tolerance: match(a,b) == match(b,a) regardless of
    # which id sorts first (tolerance measured against the larger length)
    flipped = _frame(spark, [
        (2, "SiO2", -10.0, base, angles),
        (1, "SiO2", -10.1, [4.1, 5.1, 6.1], [94.9, 90.2, 104.9]),
    ])
    got2 = {(r["id_a"], r["id_b"])
            for r in structure_near_dup(
                flipped, "id", "formula", "energy", "lengths", "angles").collect()}
    assert got2 == {(1, 2)}


def test_energy_above_block_min(spark):
    df = spark.createDataFrame(
        [(1, "A", -3.0), (2, "A", -1.0), (3, "B", 0.5)],
        "id long, formula string, eform double",
    )
    got = {r["id"]: r["e_above_min"]
           for r in energy_above_block_min(df, "formula", "eform").collect()}
    assert got == {1: 0.0, 2: 2.0, 3: 0.0}


def test_energy_above_hull_raises_without_pymatgen(spark):
    pytest.importorskip  # not used; explicit both-ways check below
    try:
        import pymatgen  # noqa: F401
        has = True
    except ImportError:
        has = False
    df = spark.createDataFrame([(1, "SiO2", -1.0)], "id long, f string, e double")
    if has:
        pytest.skip("pymatgen present; the UDF path is exercised elsewhere")
    with pytest.raises(NotImplementedError, match="pymatgen"):
        energy_above_hull(df, "f", "e", hull=None)


def test_e_above_hull_rows_uses_reduced_composition(monkeypatch):
    """The PDEntry must pair the REDUCED composition with an energy scaled
    by the reduced atom count (lam_optimize/utils.py:176-190): for a
    non-reduced input formula like Fe2O6 the entry is (FeO3, e*4), never
    (Fe2O6, e*4) or (FeO3, e*8)."""
    import sys
    import types

    from mr_dice_spark.operators.structures import _e_above_hull_rows

    ATOMS = {"Fe2O6": 8, "FeO3": 4, "SiO2": 3}
    REDUCED = {"Fe2O6": "FeO3", "FeO3": "FeO3", "SiO2": "SiO2"}

    class FakeComposition:
        def __init__(self, formula):
            self.formula = formula
            self.num_atoms = ATOMS[formula]

        @property
        def reduced_composition(self):
            return FakeComposition(REDUCED[self.formula])

    class FakePDEntry:
        def __init__(self, composition, energy):
            self.composition = composition
            self.energy = energy

    class FakeHull:
        def __init__(self):
            self.entries = []

        def get_e_above_hull(self, entry):
            self.entries.append(entry)
            if entry.composition.formula == "SiO2":
                raise ValueError("No valid decomposition found for entry")
            return entry.energy / entry.composition.num_atoms + 0.25

    core = types.ModuleType("pymatgen.core")
    core.Composition = FakeComposition
    phase = types.ModuleType("pymatgen.analysis.phase_diagram")
    phase.PDEntry = FakePDEntry
    pkg = types.ModuleType("pymatgen")
    analysis = types.ModuleType("pymatgen.analysis")
    monkeypatch.setitem(sys.modules, "pymatgen", pkg)
    monkeypatch.setitem(sys.modules, "pymatgen.core", core)
    monkeypatch.setitem(sys.modules, "pymatgen.analysis", analysis)
    monkeypatch.setitem(sys.modules, "pymatgen.analysis.phase_diagram", phase)

    hull = FakeHull()
    out = _e_above_hull_rows(["Fe2O6", "SiO2"], [-2.0, -1.0], hull)

    fe = hull.entries[0]
    assert fe.composition.formula == "FeO3"          # reduced, not Fe2O6
    assert fe.energy == -2.0 * 4                     # scaled by reduced atoms
    assert out[0] == pytest.approx(-2.0 + 0.25)
    assert out[1] == 0.0                             # no-decomposition -> 0.0


def test_energy_above_block_min_keeps_null_formula_rows(spark):
    df = spark.createDataFrame(
        [(1, "A", -3.0), (2, None, -1.0), (3, None, -2.0)],
        "id long, formula string, eform double",
    )
    got = {r["id"]: r["e_above_min"]
           for r in energy_above_block_min(df, "formula", "eform").collect()}
    # NULL formulas form their own block (matching the window-function
    # PARTITION BY semantics) and every input row survives
    assert got == {1: 0.0, 2: 1.0, 3: 0.0}


# ---------------------------------------------------------------------------
# property test: structure_near_dup vs a pure-Python reference model
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_e_st = st.sampled_from([-10.0, -10.2, -10.4, -12.0, 0.0, 3.0])
_len_st = st.sampled_from([4.0, 4.1, 4.3, 5.0])
_ang_st = st.sampled_from([90.0, 93.0, 96.0])


@st.composite
def _structs(draw):
    n = draw(st.integers(min_value=2, max_value=8))
    rows = []
    for i in range(n):
        rows.append((
            i,
            draw(st.sampled_from(["SiO2", "NaCl"])),
            draw(_e_st),
            [draw(_len_st) for _ in range(3)],
            [draw(_ang_st) for _ in range(3)],
        ))
    return rows


def _model(rows, tol=0.05, ltol=0.05, angle_tol=5.0):
    out = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i], rows[j]
            if a[1] != b[1]:
                continue
            if abs(a[2] - b[2]) > tol * max(abs(a[2]), abs(b[2])):
                continue
            if any(abs(x - y) > ltol * max(abs(x), abs(y)) for x, y in zip(a[3], b[3])):
                continue
            if any(abs(x - y) > angle_tol for x, y in zip(a[4], b[4])):
                continue
            out.add((a[0], b[0]))
    return out


@settings(max_examples=30, deadline=None)
@given(_structs())
def test_structure_near_dup_matches_model(spark, rows):
    df = spark.createDataFrame(
        rows,
        "id long, formula string, energy double, "
        "lengths array<double>, angles array<double>",
    )
    got = {(r["id_a"], r["id_b"])
           for r in structure_near_dup(
               df, "id", "formula", "energy", "lengths", "angles").collect()}
    assert got == _model(rows)
