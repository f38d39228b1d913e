"""Crystal-structure near-duplicate detection and hull energies at
reference fidelity (SURVEY.md §2 D4/F16).

Reference semantics (public, cited for parity checking):

* duplicate check — openlam_database/openlam/lam_optimize/main.py:102-122:
  for each relaxed structure, query known structures with the SAME reduced
  formula (blocking), skip candidates whose energy differs RELATIVELY by
  more than 5% (``abs(e1-e2)/max(abs(e1),abs(e2)) > 0.05`` -> not a dup),
  then confirm with ``StructureMatcher(ltol=0.05, stol=0.1,
  angle_tol=5).fit()`` (matcher config at lam_optimize/utils.py:15).
* energy above hull — lam_optimize/utils.py:161-190: build a PDEntry from
  the reduced formula and formation energy and ask the PhaseDiagram for
  ``get_e_above_hull``; "no valid decomposition" maps to 0.0.

Spark-first re-expression: blocking and the energy band are a formula-
partitioned self-join with a codegen'd band predicate — they shuffle once
on the formula key and never materialize cross-formula pairs. The
pairwise matcher is the only non-relational step; it runs as an
Arrow-batched pandas UDF over CANDIDATE pairs only (the same
candidates-only shape as the LSH verifies in operators/similarity.py).
pymatgen is not shipped in this environment, so the matcher resolves at
runtime: pymatgen's StructureMatcher when importable, otherwise a
deterministic lattice-parameter comparator applying the same ltol /
angle_tol tolerances (documented approximation — it checks the reduced
lattice, not site permutations, so it is a necessary-condition filter
rather than full crystallographic equivalence).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# StructureMatcher defaults from the reference (lam_optimize/utils.py:15)
MATCHER_LTOL = 0.05
MATCHER_STOL = 0.1
MATCHER_ANGLE_TOL = 5.0
REL_ENERGY_TOL = 0.05


def _has_pymatgen() -> bool:
    try:
        import pymatgen  # noqa: F401

        return True
    except ImportError:
        return False


def energy_band_pair(ea: Column, eb: Column, tol: float = REL_ENERGY_TOL) -> Column:
    """Reference band predicate (main.py:105-113) without the division:
    ``abs(e1-e2)/max(|e1|,|e2|) <= tol`` restated as
    ``abs(e1-e2) <= tol * greatest(|e1|,|e2|)`` — identical truth table for
    any non-degenerate pair and well-defined (True) at e1 == e2 == 0,
    where the reference's division would raise."""
    return F.abs(ea - eb) <= F.lit(tol) * F.greatest(F.abs(ea), F.abs(eb))


def structure_candidate_pairs(
    df: DataFrame,
    id_col: str,
    formula_col: str,
    energy_col: str,
    rel_energy_tol: float = REL_ENERGY_TOL,
) -> DataFrame:
    """Blocking stage: (id_a, id_b, formula, energy_a, energy_b) for every
    same-formula pair inside the relative-energy band, id_a < id_b.

    The self-join key is the formula block — at scale this shuffles each
    side once on formula and AQE handles skewed blocks; no cross-formula
    pair ever exists in the plan (the reference's per-structure query loop
    has the same blocking, executed row-at-a-time)."""
    s = df.select(
        F.col(id_col).alias("__id"),
        F.col(formula_col).alias("formula"),
        F.col(energy_col).alias("__e"),
    ).where(F.col(formula_col).isNotNull() & F.col(energy_col).isNotNull())
    return (
        s.alias("a")
        .join(
            s.alias("b"),
            (F.col("a.formula") == F.col("b.formula"))
            & (F.col("a.__id") < F.col("b.__id"))
            & energy_band_pair(F.col("a.__e"), F.col("b.__e"), rel_energy_tol),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.formula").alias("formula"),
            F.col("a.__e").alias("energy_a"),
            F.col("b.__e").alias("energy_b"),
        )
    )


def lattice_match_pair(
    len_a: Column,
    ang_a: Column,
    len_b: Column,
    ang_b: Column,
    ltol: float = MATCHER_LTOL,
    angle_tol: float = MATCHER_ANGLE_TOL,
) -> Column:
    """Deterministic fallback comparator: every lattice length within
    ``ltol`` RELATIVE tolerance (symmetric — measured against the larger
    of the two, so match(a,b) == match(b,a)) and every lattice angle
    within ``angle_tol`` degrees. ``len_*``/``ang_*`` are 3-element double
    array columns. This is the necessary-condition part of
    StructureMatcher.fit (a true match must have a matching reduced
    lattice); full site fitting needs pymatgen (structures_match_udf)."""
    idx = [1, 2, 3]  # element_at is 1-indexed
    length_ok = [
        F.abs(F.element_at(len_a, i) - F.element_at(len_b, i))
        <= F.lit(ltol)
        * F.greatest(F.abs(F.element_at(len_a, i)), F.abs(F.element_at(len_b, i)))
        for i in idx
    ]
    angle_ok = [
        F.abs(F.element_at(ang_a, i) - F.element_at(ang_b, i)) <= F.lit(angle_tol)
        for i in idx
    ]
    out = F.lit(True)
    for c in length_ok + angle_ok:
        out = out & c
    return out


def structure_near_dup(
    df: DataFrame,
    id_col: str,
    formula_col: str,
    energy_col: str,
    lengths_col: str,
    angles_col: str,
    species_col: Optional[str] = None,
    frac_coords_col: Optional[str] = None,
    rel_energy_tol: float = REL_ENERGY_TOL,
    ltol: float = MATCHER_LTOL,
    stol: float = MATCHER_STOL,
    angle_tol: float = MATCHER_ANGLE_TOL,
) -> DataFrame:
    """Reference-fidelity duplicate detection: formula block -> 5%%
    relative-energy band -> pairwise matcher on candidates only.
    Returns (id_a, id_b, formula) for matched pairs, id_a < id_b.

    With pymatgen importable AND ``species_col``/``frac_coords_col``
    given, the matcher is ``StructureMatcher(ltol, stol, angle_tol).fit``
    in an Arrow-batched pandas UDF (bit-for-bit the reference check).
    Otherwise the lattice-parameter fallback runs entirely JVM-side."""
    cand = structure_candidate_pairs(df, id_col, formula_col, energy_col, rel_energy_tol)
    geo_cols = ["__len", "__ang"] + (
        ["__sp", "__fc"] if species_col and frac_coords_col else []
    )
    geo = df.select(
        F.col(id_col).alias("__id"),
        F.col(lengths_col).alias("__len"),
        F.col(angles_col).alias("__ang"),
        *(
            [F.col(species_col).alias("__sp"), F.col(frac_coords_col).alias("__fc")]
            if species_col and frac_coords_col
            else []
        ),
    )
    paired = cand.join(
        geo.select(F.col("__id").alias("id_a"), *[F.col(c).alias(f"{c}_a") for c in geo_cols]),
        "id_a",
    ).join(
        geo.select(F.col("__id").alias("id_b"), *[F.col(c).alias(f"{c}_b") for c in geo_cols]),
        "id_b",
    )
    use_pymatgen = species_col and frac_coords_col and _has_pymatgen()
    if use_pymatgen:
        match = _pymatgen_fit_udf(ltol, stol, angle_tol)(
            "__len_a", "__ang_a", "__sp_a", "__fc_a",
            "__len_b", "__ang_b", "__sp_b", "__fc_b",
        )
    else:
        match = lattice_match_pair(
            F.col("__len_a"), F.col("__ang_a"),
            F.col("__len_b"), F.col("__ang_b"),
            ltol=ltol, angle_tol=angle_tol,
        )
    return paired.where(match).select("id_a", "id_b", "formula")


def _pymatgen_fit_udf(ltol: float, stol: float, angle_tol: float):
    """Arrow-batched StructureMatcher.fit over candidate pairs. Import
    inside the UDF body so executors resolve pymatgen independently."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def fit(
        len_a: pd.Series, ang_a: pd.Series, sp_a: pd.Series, fc_a: pd.Series,
        len_b: pd.Series, ang_b: pd.Series, sp_b: pd.Series, fc_b: pd.Series,
    ) -> pd.Series:
        from pymatgen.analysis.structure_matcher import StructureMatcher
        from pymatgen.core import Lattice, Structure

        matcher = StructureMatcher(ltol=ltol, stol=stol, angle_tol=angle_tol)

        def build(lengths, angles, species, coords):
            lat = Lattice.from_parameters(*lengths, *angles)
            return Structure(lat, list(species), [list(c) for c in coords])

        out = []
        for i in range(len(len_a)):
            a = build(len_a[i], ang_a[i], sp_a[i], fc_a[i])
            b = build(len_b[i], ang_b[i], sp_b[i], fc_b[i])
            out.append(bool(matcher.fit(a, b)))
        return pd.Series(out)

    return fit


# ---------------------------------------------------------------------------
# F16: energy above hull
# ---------------------------------------------------------------------------

def energy_above_block_min(
    df: DataFrame, formula_col: str, eform_col: str
) -> DataFrame:
    """Relational hull proxy: formation energy above the MINIMUM formation
    energy of the same reduced-formula block (>= 0, 0 for each block's
    ground state). One hash aggregation + one broadcast-or-shuffle join on
    the formula key; fully SQL-expressible, so it carries a DuckDB oracle.

    This is NOT the thermodynamic hull: the true e_above_hull decomposes a
    composition against the convex hull of COMPETING phases in composition-
    energy space (reference lam_optimize/utils.py:161-190), which needs a
    phase-diagram construction — see ``energy_above_hull``."""
    mins = df.groupBy(F.col(formula_col).alias("__f")).agg(
        F.min(F.col(eform_col)).alias("__emin")
    )
    # eqNullSafe: groupBy keeps a NULL-formula group, and the join must
    # match it back (a plain equi-join drops NULL-key rows, silently
    # breaking the row-count-preserving enrichment contract)
    return (
        df.join(F.broadcast(mins), F.col(formula_col).eqNullSafe(F.col("__f")))
        .withColumn("e_above_min", F.col(eform_col) - F.col("__emin"))
        .drop("__f", "__emin")
    )


def energy_above_hull(
    df: DataFrame,
    formula_col: str,
    eform_per_atom_col: str,
    hull,
) -> DataFrame:
    """True thermodynamic e_above_hull via a pymatgen PhaseDiagram
    (reference lam_optimize/utils.py:176-190 semantics: PDEntry from the
    reduced formula and per-atom formation energy scaled by the reduced
    composition's atom count; "no valid decomposition" -> 0.0).

    ``hull`` is a pymatgen PhaseDiagram (the reference downloads one per
    chemical system). pymatgen is not shipped in this environment, so this
    raises NotImplementedError with the exact dependency needed unless it
    is importable; the relational path with an oracle is
    ``energy_above_block_min``."""
    if not _has_pymatgen():
        raise NotImplementedError(
            "energy_above_hull needs pymatgen (PhaseDiagram.get_e_above_hull); "
            "install pymatgen or use energy_above_block_min for the "
            "relational hull proxy"
        )
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    b_hull = df.sparkSession.sparkContext.broadcast(hull)

    @pandas_udf("double")
    def e_hull(formula: pd.Series, eform: pd.Series) -> pd.Series:
        return pd.Series(_e_above_hull_rows(formula, eform, b_hull.value))

    return df.withColumn(
        "e_above_hull", e_hull(F.col(formula_col), F.col(eform_per_atom_col))
    )


def _e_above_hull_rows(formulas, eforms_per_atom, hull) -> list:
    """Per-batch body of :func:`energy_above_hull`, kept import-late and
    Spark-free so the PDEntry construction (reduced composition + energy
    scaled by the REDUCED atom count, lam_optimize/utils.py:176-190) is
    unit-testable with a stubbed pymatgen."""
    from pymatgen.analysis.phase_diagram import PDEntry
    from pymatgen.core import Composition

    out = []
    for f, e in zip(formulas, eforms_per_atom):
        # Reduced composition for BOTH the entry and the energy scale:
        # a non-reduced formula (e.g. Fe2O6) would otherwise pair an
        # 8-atom composition with an energy scaled by 4 atoms.
        comp = Composition(f).reduced_composition
        entry = PDEntry(comp, e * comp.num_atoms)
        try:
            out.append(float(hull.get_e_above_hull(entry)))
        except Exception as exc:  # reference maps no-decomposition to 0.0
            if str(exc).startswith("No valid decomposition found"):
                out.append(0.0)
            else:
                raise
    return out
