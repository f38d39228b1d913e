"""Every golden query with an oracle must match DuckDB at sf0.01 (the
driver's t2 shape) — and at sf0.001 for speed during development."""

import pytest

from mr_dice_spark.golden import GOLDEN
from tests.oracle import compare_spark_duckdb

ORACLE_QUERIES = sorted(name for name, q in GOLDEN.items() if q.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_golden_matches_oracle(spark, oracle_sf_dir, name):
    q = GOLDEN[name]
    df = q.spark(spark, oracle_sf_dir)
    ok, msg = compare_spark_duckdb(df, q.oracle, oracle_sf_dir)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_golden_nonempty_unless_anti(spark, oracle_sf_dir, name):
    # every golden query except anti-join style ones should produce rows at sf0.01
    q = GOLDEN[name]
    if "anti" in q.tags:
        pytest.skip("anti-join may legitimately be empty")
    assert q.spark(spark, oracle_sf_dir).limit(1).count() >= 1, f"{name} returned no rows"
