"""Golden corpus part 3: parametric-builder queries (SURVEY.md §2.2
P14-P18, §2.6 O3, §2.1 S5) — the typed fetch surfaces of the reference's
MOFdb/OpenLAM/Bohrium modules compiled through
``mr_dice_spark.plans.ParametricQuery`` and checked against literal SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mr_dice_spark.catalog import Catalog
from mr_dice_spark.golden import _r, golden
from mr_dice_spark.plans import bohrium_fetch, mofdb_fetch, openlam_fetch


def _utc(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.session.timeZone", "UTC")


MOFDB_ORACLE = """
SELECT p_partkey, p_name, p_brand, p_size,
       ROUND(1e-9 + p_retailprice, 2) AS price
FROM part
WHERE p_brand = 'Brand#7'
  AND p_size BETWEEN 10 AND 40
  AND p_retailprice >= 500.0
ORDER BY p_partkey
LIMIT 50
"""


@golden("param_mofdb_range_fetch", MOFDB_ORACLE, tags=("builder", "range", "enum"))
def param_mofdb_range_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P14/P15: enum-validated equality + two closed numeric ranges, all
    pushed into the Parquet scan (reference
    mofdb_database/Mofdb_Server/server.py:59-75)."""
    part = Catalog(spark, sf_dir).part
    return mofdb_fetch(
        part, brand="Brand#7", size_min=10, size_max=40, price_min=500.0, limit=50
    ).select(
        "p_partkey", "p_name", "p_brand", "p_size",
        _r("p_retailprice", 2).alias("price"),
    )


OPENLAM_ORACLE = """
SELECT event_id, user_id, event_type,
       ROUND(1e-9 + value, 2) AS value,
       epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms
FROM events
WHERE event_type = 'purchase'
  AND value BETWEEN 50.0 AND 200.0
  AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-10 00:00:00'
  AND CAST(ts AS TIMESTAMP) <= TIMESTAMP '2024-01-20 00:00:00'
ORDER BY event_id
LIMIT 100
"""


@golden("param_openlam_time_window", OPENLAM_ORACLE, tags=("builder", "timewindow"))
def param_openlam_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P16: formula/energy/time-window surface (reference
    openlam/lam_optimize/db.py:55-68) — equality + value range + ISO-8601
    UTC window on the timestamp column."""
    _utc(spark)
    ev = Catalog(spark, sf_dir).events
    return openlam_fetch(
        ev,
        event_type="purchase",
        value_min=50.0,
        value_max=200.0,
        submitted_after="2024-01-10T00:00:00Z",
        submitted_before="2024-01-20T00:00:00Z",
        limit=100,
    ).select(
        "event_id", "user_id", "event_type",
        _r("value", 2).alias("value"),
        F.unix_millis("ts").alias("ts_ms"),
    )


BOHRIUM_ORACLE = """
SELECT p_partkey, p_type, p_size,
       ROUND(1e-9 + p_retailprice, 2) AS price
FROM part
WHERE p_type LIKE '%AR%'
  AND p_size BETWEEN 1 AND 50
ORDER BY ROUND(1e-9 + p_retailprice, 2) DESC, p_partkey
LIMIT 20 OFFSET 40
"""


@golden("param_bohrium_fuzzy_page", BOHRIUM_ORACLE, tags=("builder", "fuzzy", "pagination"))
def param_bohrium_fuzzy_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P17/P18/O3/S5: fuzzy keyword match, open-ended range auto-completed
    to domain bounds, server-side sort + page-3/size-20 pagination
    (reference Bohriumpublic_Server/server.py:61-178). Sorting on the
    ROUNDED price (same grid as the oracle) with a unique key tiebreak
    keeps the page deterministic across engines."""
    part = Catalog(spark, sf_dir).part.withColumn("price", _r("p_retailprice", 2))
    return bohrium_fetch(
        part, keyword="AR", exact=False, sort_field="price",
        descending=True, page=3, size=20,
    ).select("p_partkey", "p_type", "p_size", "price")
