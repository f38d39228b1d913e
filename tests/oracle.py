"""DuckDB-oracle comparison harness, mirroring the driver's t2 check:
row-count + schema + order-insensitive value compare, columns sorted by name.
"""

from __future__ import annotations

import math

import duckdb

from mr_dice_spark.catalog import TABLE_NAMES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # FULL-precision normalization (driver-grade strictness). The
        # previous f"{v:.9g}" (9 *significant* digits) masked pinned
        # decimals for |v| >= 1: at |v| >= 1000 the 6th pinned decimal
        # was invisible, which hid the round-10 durbin_watson driver red
        # row from every local fresh-process compare. repr round-trips
        # the exact double; `v + 0.0` collapses -0.0 to 0.0.
        return repr(v + 0.0)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted((tuple(_norm(r[i]) for i in order) for r in rows), key=repr)


def compare_spark_duckdb(spark_df, oracle_sql: str, sf_dir: str):
    """Return (ok, message). Order-insensitive, column-name-sorted compare.

    The DuckDB side is fetched through ARROW, not fetchall(): the driver's
    harness normalizes through pandas/arrow, where DuckDB's wide types
    change representation (HUGEINT -> decimal128/float64, not Python int).
    fetchall() hands back plain ints and silently masks exactly that class
    of divergence — the root cause of the round-1 events_sessionize red
    row, which this harness could not reproduce until the fetch matched."""
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    con = duckdb_conn(sf_dir)
    try:
        res = con.sql(oracle_sql)
        d_cols = res.columns
        tbl = res.arrow()
        d_rows = [
            tuple(row[c] for c in d_cols) for row in tbl.to_pylist()
        ]
    finally:
        con.close()
    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row-count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    cs, cd = _canon(s_rows, s_cols), _canon(d_rows, d_cols)
    if cs != cd:
        diff = [(a, b) for a, b in zip(cs, cd) if a != b][:5]
        return False, f"value mismatch, first diffs: {diff}"
    return True, f"ok ({len(s_rows)} rows)"
