"""Golden corpus part 6: reference-fidelity structure dedup (D4) and the
hull-energy family (F16) over a structures frame derived deterministically
from the driver's ``embeddings`` table.

The reference's dedup flow (openlam_database/openlam/lam_optimize/
main.py:102-122) runs per-structure: query known structures by reduced
formula, skip energy-band outliers, confirm with pymatgen's
StructureMatcher. The driver fixture has no crystal table, so both sides
of each golden derive the SAME synthetic structures from ``embeddings``:
formula block from ``label``, energy and lattice parameters from fixed
embedding components — every derived quantity is rounded (with the corpus
nudge) so the two engines compare identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mr_dice_spark.catalog import Catalog
from mr_dice_spark.golden import _r, golden
from mr_dice_spark.operators.structures import (
    energy_above_block_min,
    structure_near_dup,
)

_FORMULAS = ("SiO2", "NaCl", "Fe2O3", "TiO2", "MgO")


def _structures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived structures frame: (vec_id, formula, energy, lengths[3],
    angles[3]). Component picks are 1-indexed to read like the oracle."""
    emb = Catalog(spark, sf_dir).embeddings

    def e(i: int):
        return F.element_at("embedding", i).cast("double")

    formula = F.element_at(
        F.array(*[F.lit(f) for f in _FORMULAS]), (F.col("label") % 5 + 1).cast("int")
    )
    return emb.select(
        "vec_id",
        formula.alias("formula"),
        _r(F.lit(-2.0) + e(1), 4).alias("energy"),
        F.array(*[_r(F.lit(4.0) + F.abs(e(i)) * 4, 4) for i in (2, 3, 4)]).alias(
            "lengths"
        ),
        F.array(*[_r(F.lit(90.0) + e(i) * 30, 4) for i in (5, 6, 7)]).alias("angles"),
    )


_DERIVE_SQL = """
  SELECT vec_id,
         ['SiO2', 'NaCl', 'Fe2O3', 'TiO2', 'MgO'][(label % 5) + 1] AS formula,
         ROUND(1e-9 + -2.0 + CAST(embedding[1] AS DOUBLE), 4) AS energy,
         ROUND(1e-9 + 4.0 + ABS(CAST(embedding[2] AS DOUBLE)) * 4, 4) AS l1,
         ROUND(1e-9 + 4.0 + ABS(CAST(embedding[3] AS DOUBLE)) * 4, 4) AS l2,
         ROUND(1e-9 + 4.0 + ABS(CAST(embedding[4] AS DOUBLE)) * 4, 4) AS l3,
         ROUND(1e-9 + 90.0 + CAST(embedding[5] AS DOUBLE) * 30, 4) AS g1,
         ROUND(1e-9 + 90.0 + CAST(embedding[6] AS DOUBLE) * 30, 4) AS g2,
         ROUND(1e-9 + 90.0 + CAST(embedding[7] AS DOUBLE) * 30, 4) AS g3
  FROM embeddings
"""

NEAR_DUP_ORACLE = f"""
WITH s AS ({_DERIVE_SQL})
SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.formula AS formula
FROM s a JOIN s b
  ON a.formula = b.formula AND a.vec_id < b.vec_id
 AND ABS(a.energy - b.energy) <= 0.05 * GREATEST(ABS(a.energy), ABS(b.energy))
 AND ABS(a.l1 - b.l1) <= 0.05 * GREATEST(ABS(a.l1), ABS(b.l1))
 AND ABS(a.l2 - b.l2) <= 0.05 * GREATEST(ABS(a.l2), ABS(b.l2))
 AND ABS(a.l3 - b.l3) <= 0.05 * GREATEST(ABS(a.l3), ABS(b.l3))
 AND ABS(a.g1 - b.g1) <= 5.0
 AND ABS(a.g2 - b.g2) <= 5.0
 AND ABS(a.g3 - b.g3) <= 5.0
ORDER BY id_a, id_b
"""


@golden("structure_near_dup_openlam", NEAR_DUP_ORACLE, tags=("dedup", "D4", "structures"))
def structure_near_dup_openlam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference D4 at fidelity: formula block -> 5% relative-energy band
    -> pairwise matcher on candidates only (main.py:102-122; matcher
    config utils.py:15). pymatgen is absent here, so the matcher is the
    deterministic lattice comparator with the same ltol/angle_tol — which
    the oracle restates clause-for-clause, giving full value parity for
    the whole pipeline rather than a rows-only check."""
    return structure_near_dup(
        _structures(spark, sf_dir),
        id_col="vec_id",
        formula_col="formula",
        energy_col="energy",
        lengths_col="lengths",
        angles_col="angles",
    ).orderBy("id_a", "id_b")


HULL_ORACLE = f"""
WITH s AS ({_DERIVE_SQL})
SELECT vec_id, formula,
       ROUND(1e-9 + energy - MIN(energy) OVER (PARTITION BY formula), 4)
         AS e_above_min
FROM s
ORDER BY vec_id
"""


@golden("energy_above_hull_probe", HULL_ORACLE, tags=("scalar", "F16", "structures"))
def energy_above_hull_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F16 relational hull proxy with a full oracle: formation energy above
    the formula block's ground state. The TRUE thermodynamic hull
    (reference utils.py:161-190) needs pymatgen's PhaseDiagram and is
    implemented as operators.structures.energy_above_hull, which raises a
    tested NotImplementedError here (pymatgen not shipped)."""
    s = _structures(spark, sf_dir)
    return (
        energy_above_block_min(s, "formula", "energy")
        .select("vec_id", "formula", _r("e_above_min", 4).alias("e_above_min"))
        .orderBy("vec_id")
    )
