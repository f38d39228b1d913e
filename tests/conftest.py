import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mr_dice_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="mr-dice-tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def oracle_sf_dir():
    return SF_DIR_ORACLE


# --- suite tiering scaffolding (round-11; VERDICT r10 stretch #8) --------
# The corpus grows ~10 goldens/round and the full-suite wall is dominated
# by tests/test_golden.py's per-golden DuckDB oracle sweeps. Those carry
# the `full` marker; by default EVERYTHING still runs (no behavior
# change). The flip, when the suite crosses the 30-minute threshold, is
# one environment variable: SPARK_GRAFT_TEST_TIER=quick deselects the
# `full` tier (CI keeps the default full run; the quick tier is for
# inner-loop development).


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "full: oracle-sweep tier — deselected when "
        "SPARK_GRAFT_TEST_TIER=quick",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("SPARK_GRAFT_TEST_TIER") != "quick":
        return
    skip_full = pytest.mark.skip(
        reason="SPARK_GRAFT_TEST_TIER=quick deselects the `full` tier"
    )
    for item in items:
        if "full" in item.keywords:
            item.add_marker(skip_full)
