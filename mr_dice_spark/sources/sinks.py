"""Sinks (SURVEY.md §2.1 S6-S10).

The reference materializes every query as per-row files (CIF/JSON), a
summary manifest, and a tagged output directory. Spark-first: per-row JSON
is ``df.write.json`` (or a text sink of rendered CIF), the manifest is a
driver-side JSON of collected query metadata, and the tag/hash naming is a
pure function.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import time
from typing import Any, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def filter_to_tag(filter_text: str, max_len: int = 40) -> str:
    """S10: sanitized tag from a filter/query string (reference
    filter_to_tag, Optimade_Server/utils.py:488-518 shape): alnum runs
    kept, everything else collapsed to '_', truncated."""
    tag = re.sub(r"[^A-Za-z0-9]+", "_", filter_text.strip()).strip("_")
    return (tag[:max_len] or "query").lower()


def tagged_output_dir(base: str, filter_text: str) -> str:
    """S10: dir = tag + timestamp + sha1(filter)[:8] (reference
    Optimade_Server/server.py:135-138)."""
    digest = hashlib.sha1(filter_text.encode()).hexdigest()[:8]
    stamp = time.strftime("%Y%m%d_%H%M%S")
    return os.path.join(base, f"{filter_to_tag(filter_text)}_{stamp}_{digest}")


def write_json_sink(df: DataFrame, path: str, single_file: bool = False) -> None:
    """S7: JSON sink. ``single_file`` coalesces to one partition — only for
    small result sets (the reference's per-query outputs are <=30 rows);
    large writes keep natural partitioning."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").json(path)


def write_manifest(
    path: str,
    query: str,
    n_found: int,
    stats: Optional[dict[str, Any]] = None,
    warnings: Optional[list[str]] = None,
) -> str:
    """S9: summary.json with the query, result count, per-group stats/quota
    plan and warnings (reference Optimade_Server/server.py:175-188)."""
    os.makedirs(path, exist_ok=True)
    manifest = {
        "query": query,
        "n_found": n_found,
        "stats": stats or {},
        "warnings": warnings or [],
        "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    target = os.path.join(path, "summary.json")
    with open(target, "w") as fh:
        json.dump(manifest, fh, indent=2)
    return target


def cif_text_column(
    formula: Column,
    lattice: Column,
    species: Column,
    positions: Column,
) -> Column:
    """S6: render a minimal CIF document per row as a string column — pure
    concat/transform expressions (the reference writes one .cif per
    structure via pymatgen, Optimade_Server/utils.py:440-449; here the
    rendering itself is the operator and ``write.text`` is the sink).

    lattice: array<array<double>> 3x3 (a/b/c vectors); species:
    array<string>; positions: array<array<double>> cartesian.
    """
    def fmt(x: Column) -> Column:
        # format_string, NOT format_number: the latter inserts thousands
        # separators (1234.5 -> '1,234.500000'), and a comma inside a CIF
        # numeric field corrupts the file for any downstream parser
        return F.format_string("%.6f", x.cast("double"))

    site_lines = F.concat_ws(
        "\n",
        F.zip_with(
            species,
            positions,
            lambda s, p: F.concat_ws(
                "  ", s, fmt(F.element_at(p, 1)), fmt(F.element_at(p, 2)), fmt(F.element_at(p, 3))
            ),
        ),
    )
    vec_lines = F.concat_ws(
        "\n",
        F.transform(
            lattice,
            lambda v: F.concat_ws(
                "  ", fmt(F.element_at(v, 1)), fmt(F.element_at(v, 2)), fmt(F.element_at(v, 3))
            ),
        ),
    )
    return F.concat(
        F.lit("data_"), formula, F.lit("\n_chemical_formula_sum  "), formula,
        F.lit("\n# lattice vectors\n"), vec_lines,
        F.lit("\n# cartesian sites\n"), site_lines, F.lit("\n"),
    )


def derive_output_path(
    database_col: Column,
    name_col: Column,
    rules: dict[str, str],
    explicit_path: Optional[Column] = None,
    default_dir: str = "misc",
    extension: str = ".cif",
) -> Column:
    """S8: per-row source-file path derivation (reference save_mofs,
    mofdbsql Mofdb_Server/utils.py:135-265, rules at 189-210): an explicit
    stored path wins; otherwise the path is <dir-for-database>/<name><ext>
    via the hard-coded database->directory rules, falling back to
    ``default_dir``. Pure when-chain — evaluated scan-side, feeding a
    foreachPartition copier (or a distributed FileSystem copy job)."""
    derived: Column = F.concat(F.lit(default_dir + "/"), name_col, F.lit(extension))
    chain = None
    for db, subdir in rules.items():
        cond = database_col == F.lit(db)
        val = F.concat(F.lit(subdir.rstrip("/") + "/"), name_col, F.lit(extension))
        chain = F.when(cond, val) if chain is None else chain.when(cond, val)
    derived = chain.otherwise(derived) if chain is not None else derived
    if explicit_path is not None:
        return F.coalesce(explicit_path, derived)
    return derived
