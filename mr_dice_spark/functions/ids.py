"""Identifier/unit scalar functions (SURVEY.md §2.8 F11, F13, F14).

All pure Column expressions (no UDFs): codegen-friendly at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def shorten_id(col: Column, max_len: int = 12, keep: int = 6) -> Column:
    """F11: ``abcdef...uvwxyz`` display shortening (reference shorten_id,
    Optimade_Server/utils.py:208-226): ids longer than ``max_len`` keep the
    first and last ``keep`` chars around an ellipsis."""
    c = col.cast("string")
    # only shorten when it actually SAVES space: the shortened form is
    # 2*keep+3 chars, so ids of length max_len+1 .. 2*keep+3 would come out
    # LONGER than the original while destroying middle characters
    threshold = max(max_len, 2 * keep + 3)
    return F.when(
        F.length(c) > threshold,
        F.concat(F.substring(c, 1, keep), F.lit("..."), F.substring(c, -keep, keep)),
    ).otherwise(c)


def pick_identifier(*candidates: Column, fallback: Column) -> Column:
    """F13: first non-null, non-empty identifier in priority order
    (reference _pick_identifier, mofdb Mofdb_Server/utils.py:81-92: name ->
    mofkey -> mofid -> id -> row index)."""
    cleaned = [
        F.when(F.trim(c.cast("string")) != "", F.trim(c.cast("string")))
        for c in candidates
    ]
    return F.coalesce(*cleaned, fallback.cast("string"))


# F14: pressure-unit conversion dimension (reference delegates conversion to
# the MOFdb API after validating against its classification list,
# mofdb_client/main.py:8-31; here the factor table IS the implementation).
PRESSURE_UNITS: dict[str, float] = {
    "Pa": 1.0,
    "kPa": 1_000.0,
    "MPa": 1_000_000.0,
    "bar": 100_000.0,
    "mbar": 100.0,
    "atm": 101_325.0,
    "psi": 6_894.757293168,
    "Torr": 133.322368421,
}


def pressure_unit_dim(spark: SparkSession) -> DataFrame:
    """8-row broadcast dimension table (unit, to_pa factor)."""
    return spark.createDataFrame(
        [(u, f) for u, f in sorted(PRESSURE_UNITS.items())], "unit string, to_pa double"
    )


def validate_unit(unit: str) -> str:
    """Fail-fast enum validation (reference InvalidUnit shape)."""
    if unit not in PRESSURE_UNITS:
        raise ValueError(
            f"invalid unit {unit!r}; known: {sorted(PRESSURE_UNITS)}"
        )
    return unit


def convert_pressure(value_col: Column, from_unit: str, to_unit: str) -> Column:
    """Scalar conversion with compile-time-validated units — the factor
    folds to a literal, so the expression is a single multiply."""
    factor = PRESSURE_UNITS[validate_unit(from_unit)] / PRESSURE_UNITS[validate_unit(to_unit)]
    return value_col * F.lit(factor)
