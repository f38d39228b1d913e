"""Chemical-formula domain functions (SURVEY.md §2.8 F6-F8, §2.2 P8/P12/P13).

The reference canonicalizes ``chemical_formula_reduced`` literals to Hill
order before execution (Optimade_Server/utils.py:157-175) and normalizes
unicode sub/superscript digits (utils.py:129-155). Here those are:

* pure-Python forms used at PLAN BUILD time to canonicalize predicate
  literals (constant folding — the preferred place: the stored column is
  canonicalized once at ingest, the literal once per query, and the
  predicate stays a plain pushdown-able equality), and
* Column forms (builtin ``translate`` / pandas_udf) for deriving canonical
  columns at ingest.

No pymatgen dependency: Hill ordering needs only element-count parsing.
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F

_ELEM = re.compile(r"([A-Z][a-z]?)(\d*)")

# unicode digit variants -> ascii (reference utils.py:129-155 table)
_SUBSCRIPT = "₀₁₂₃₄₅₆₇₈₉"
_SUPERSCRIPT = "⁰¹²³⁴⁵⁶⁷⁸⁹"
_FULLWIDTH = "０１２３４５６７８９"
_ASCII = "0123456789"
_TRANS = str.maketrans(
    _SUBSCRIPT + _SUPERSCRIPT + _FULLWIDTH, _ASCII * 3
)


def normalize_unicode_digits(s: str) -> str:
    """SrTiO₃ -> SrTiO3 (P13)."""
    return s.translate(_TRANS)


def normalize_unicode_digits_col(col: Column) -> Column:
    """Column form of P13 via the builtin translate (stays in codegen)."""
    return F.translate(col, _SUBSCRIPT + _SUPERSCRIPT + _FULLWIDTH, _ASCII * 3)


def parse_formula(formula: str) -> dict[str, int]:
    """'Fe2O3' -> {'Fe': 2, 'O': 3}. Tolerates unicode digits."""
    s = normalize_unicode_digits(formula.strip())
    counts: dict[str, int] = {}
    pos = 0
    for m in _ELEM.finditer(s):
        if m.start() != pos:
            raise ValueError(f"cannot parse formula {formula!r} at {pos}")
        counts[m.group(1)] = counts.get(m.group(1), 0) + int(m.group(2) or 1)
        pos = m.end()
    if pos != len(s) or not counts:
        raise ValueError(f"cannot parse formula {formula!r}")
    return counts


def hill_formula(formula: str) -> str:
    """Hill order: C first, then H, then alphabetical; without C, all
    alphabetical (SiO2 -> O2Si). Count 1 is omitted."""
    counts = parse_formula(formula)
    if "C" in counts:
        order = ["C"] + (["H"] if "H" in counts else []) + sorted(
            e for e in counts if e not in ("C", "H")
        )
    else:
        order = sorted(counts)
    return "".join(f"{e}{counts[e] if counts[e] != 1 else ''}" for e in order)


def anonymous_formula(formula: str) -> str:
    """OPTIMADE anonymous form: proportions descending, elements renamed
    A, B, C, ... (Fe2O3 -> A3B2; SiO2 -> A2B)."""
    counts = sorted(parse_formula(formula).values(), reverse=True)
    letters = _anonymous_letters(len(counts))
    return "".join(
        f"{letter}{c if c != 1 else ''}" for letter, c in zip(letters, counts)
    )


def _anonymous_letters(n: int) -> list[str]:
    out = []
    for i in range(n):
        name = ""
        x = i
        while True:
            name = chr(ord("A") + x % 26) + name
            x = x // 26 - 1
            if x < 0:
                break
        out.append(name)
    return out


def hill_formula_udf():
    """pandas_udf for deriving a canonical formula column at ingest."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _hill(s: pd.Series) -> pd.Series:
        def safe(v):
            try:
                return hill_formula(v) if v is not None else None
            except ValueError:
                return None

        return s.map(safe)

    return _hill


def anonymous_formula_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _anon(s: pd.Series) -> pd.Series:
        def safe(v):
            try:
                return anonymous_formula(v) if v is not None else None
            except ValueError:
                return None

        return s.map(safe)

    return _anon


def formation_energy_per_atom(
    df,
    id_col: str,
    formula_col: str,
    energy_col: str,
    ref_energies: dict[str, float],
    out_col: str = "formation_energy_per_atom",
):
    """F15 (reference openlam_database/openlam/lam_optimize/utils.py:16-115):
    formation energy per atom = (E_total - Σ n_e·E_ref(e)) / Σ n_e.

    Spark-first shape — no Python UDF anywhere: the formula is tokenized
    JVM-side with ``regexp_extract_all`` (after unicode-digit translate),
    exploded to (element, count) rows, broadcast-joined against the
    ~100-row reference-energy dimension (the reference's in-process dict
    lookup), and re-aggregated per row id. At scale this is one explode +
    one broadcast join + one shuffle on ``id_col``; the dimension never
    shuffles.

    ``out_col`` is NULL when the formula does not fully tokenize into
    element symbols (garbage / empty) or contains an element missing from
    ``ref_energies`` — the distributed analogue of the reference's KeyError.
    ``energy_col`` is the TOTAL energy of the formula unit (the reference
    divides by the structure's atom count; here the formula unit IS the
    unit of account).
    """
    from pyspark.sql import functions as F  # noqa: F811 (local for clarity)

    cleaned = F.trim(normalize_unicode_digits_col(F.col(formula_col)))
    # Column API, not an F.expr f-string: interpolating formula_col raw
    # breaks on names needing quoting, and the translate table would be
    # duplicated from normalize_unicode_digits_col
    toks = F.regexp_extract_all(cleaned, F.lit(r"([A-Z][a-z]?)([0-9]*)"), 0)
    parsed = df.select(
        F.col(id_col).alias("__fid"),
        # full-coverage check: tokens must reassemble the cleaned formula
        ((F.length(cleaned) > 0) & (F.concat_ws("", toks) == cleaned)).alias("__ok"),
        F.explode_outer(toks).alias("__tok"),
    ).select(
        "__fid",
        "__ok",
        F.regexp_extract("__tok", r"([A-Z][a-z]?)", 1).alias("__elem"),
        F.coalesce(
            F.nullif(F.regexp_extract("__tok", r"([0-9]+)", 1), F.lit("")),
            F.lit("1"),
        ).cast("long").alias("__cnt"),
    )
    ref = F.broadcast(
        df.sparkSession.createDataFrame(
            list(ref_energies.items()), "__elem string, __eref double"
        )
    )
    per_id = (
        parsed.join(ref, "__elem", "left")
        .groupBy("__fid")
        .agg(
            F.min("__ok").alias("__ok"),
            F.sum("__cnt").alias("__natoms"),
            F.sum(F.col("__cnt") * F.col("__eref")).alias("__refsum"),
            F.max(F.col("__eref").isNull()).alias("__missing"),
        )
    )
    joined = df.join(per_id, df[id_col] == per_id["__fid"], "left")
    # the natoms > 0 guard matters under ANSI mode (Spark 4 default):
    # an explicit-zero formula like 'Fe0' tokenizes fully (__ok true) with
    # zero atoms, and an unguarded /0 would crash the job instead of
    # yielding the documented NULL
    out = F.when(
        F.col("__ok") & ~F.col("__missing") & (F.col("__natoms") > 0),
        (F.col(energy_col) - F.col("__refsum")) / F.col("__natoms"),
    )
    return joined.withColumn(out_col, out).drop(
        "__fid", "__ok", "__natoms", "__refsum", "__missing"
    )
