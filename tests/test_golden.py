"""Every golden query with an oracle must match DuckDB at sf0.01 (the
driver's t2 shape) — and at sf0.001 for speed during development."""

import pytest

from mr_dice_spark.golden import GOLDEN
from tests.oracle import compare_spark_duckdb

ORACLE_QUERIES = sorted(name for name, q in GOLDEN.items() if q.oracle)
ROWS_ONLY_QUERIES = sorted(name for name, q in GOLDEN.items() if not q.oracle)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_golden_executes(spark, sf_dir, name):
    """Every golden WITHOUT an oracle must still build and execute — a
    rows-only query that is never run can hide a plan-construction bug
    (this caught a broken SimHash implementation once)."""
    df = GOLDEN[name].spark(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


@pytest.mark.full
@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_golden_matches_oracle(spark, oracle_sf_dir, name):
    q = GOLDEN[name]
    df = q.spark(spark, oracle_sf_dir)
    ok, msg = compare_spark_duckdb(df, q.oracle, oracle_sf_dir)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_output_types_driver_safe(sf_dir, name):
    """No oracle may output a HUGEINT (int128) column. DuckDB widens any
    SUM over integers to HUGEINT; fetchall() hands back Python ints (so the
    in-repo compare passes) but a pandas/arrow fetch — the driver's path —
    exports HUGEINT as float64, which hash-diverges from Spark's int64
    ('3' vs '3.0'). Root cause of the round-1 events_sessionize red row.
    Fix sites by wrapping the output column in CAST(... AS BIGINT)."""
    from tests.oracle import duckdb_conn

    con = duckdb_conn(sf_dir)
    try:
        res = con.sql(GOLDEN[name].oracle)
        bad = [
            (c, str(t))
            for c, t in zip(res.columns, res.types)
            if "HUGEINT" in str(t).upper() or "INT128" in str(t).upper()
        ]
    finally:
        con.close()
    assert not bad, f"{name}: driver-unsafe oracle output types {bad}"


@pytest.mark.full
@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_golden_nonempty_unless_anti(spark, oracle_sf_dir, name):
    # every golden query except anti-join style ones should produce rows at sf0.01
    q = GOLDEN[name]
    if "anti" in q.tags:
        pytest.skip("anti-join may legitimately be empty")
    assert q.spark(spark, oracle_sf_dir).limit(1).count() >= 1, f"{name} returned no rows"
