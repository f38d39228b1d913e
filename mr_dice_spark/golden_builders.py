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


# ---------------------------------------------------------------------------
# free-with-Spark relational extras the reference lacks (SURVEY.md §2.7
# notes INTERSECT/EXCEPT absent; §2.4 notes cube/rollup/approx absent —
# exposed here as first-class golden shapes)
# ---------------------------------------------------------------------------

INTERSECT_ORACLE = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
ORDER BY o_custkey
"""


@golden("setop_intersect_custkeys", INTERSECT_ORACLE, tags=("setop", "intersect"))
def setop_intersect_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with BOTH open and finished orders (INTERSECT dedups)."""
    o = Catalog(spark, sf_dir).orders
    open_ = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    fin = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_.intersect(fin).orderBy("o_custkey")


EXCEPT_ORACLE = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
ORDER BY o_custkey
"""


@golden("setop_except_custkeys", EXCEPT_ORACLE, tags=("setop", "except"))
def setop_except_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    open_ = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    fin = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    # subtract == EXCEPT (set semantics): removes every custkey that appears
    # in fin at all (exceptAll would be multiset-minus — wrong here)
    return open_.subtract(fin).orderBy("o_custkey")


CUBE_ORACLE = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n,
       ROUND(1e-9 + SUM(o_totalprice), 2) AS total
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
ORDER BY status, priority
"""


@golden("cube_status_priority", CUBE_ORACLE, tags=("agg", "cube"))
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), _r(F.sum("o_totalprice"), 2).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
        .orderBy("status", "priority")
    )


@golden("approx_distinct_users_daily", None, tags=("agg", "approx", "sketch"))
def approx_distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogL og++ distinct-user sketch per day — the 100 TB cardinality
    path (exact distinct needs a full shuffle of user ids; the sketch is
    map-side mergeable). Rows-only golden (approximation is
    engine-specific); tests assert <2% relative error vs exact."""
    _utc(spark)
    ev = Catalog(spark, sf_dir).events
    return (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(F.unix_millis("day").alias("day_ms"), "approx_users", "n_events")
        .orderBy("day_ms")
    )


CMS_ORACLE = """
SELECT event_type, COUNT(*) AS est_count
FROM events
WHERE event_type IS NOT NULL
GROUP BY event_type
HAVING COUNT(*) >= 0.05 * (SELECT COUNT(event_type) FROM events)
ORDER BY est_count DESC, event_type
"""


@golden("heavy_hitters_cms_events", CMS_ORACLE, tags=("agg", "approx", "sketch", "cms"))
def heavy_hitters_cms_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters over event types: one map-side-merged
    sketch pass + driver point queries, the frequency twin of the HLL
    cardinality sketch. At eps=1e-4 the collision probability for this key
    domain is ~1e-17, so estimates equal exact counts and the golden
    hash-matches the exact GROUP BY oracle — the sketch's overcount bound
    is property-tested separately at tiny width."""
    from mr_dice_spark.operators.sketch import heavy_hitters_cms

    ev = Catalog(spark, sf_dir).events
    return heavy_hitters_cms(ev, "event_type", min_share=0.05)


# ---------------------------------------------------------------------------
# P19/F8: 230-row space-group dimension as a broadcast join
# ---------------------------------------------------------------------------

def _spg_dim_oracle() -> str:
    from mr_dice_spark.functions.spacegroup import HM_SYMBOLS

    values = ", ".join(f"({n}, '{s}')" for n, s in sorted(HM_SYMBOLS.items()))
    return f"""
WITH dim(spg_number, hm_symbol) AS (VALUES {values}),
parts AS (
  SELECT p_partkey, CAST(p_partkey % 230 + 1 AS INT) AS spg_number FROM part
)
SELECT d.hm_symbol, COUNT(*) AS n_parts
FROM parts p JOIN dim d USING (spg_number)
GROUP BY d.hm_symbol
HAVING COUNT(*) >= 2
ORDER BY hm_symbol
"""


@golden("spacegroup_dim_join", _spg_dim_oracle(), tags=("join", "broadcast", "P19"))
def spacegroup_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Space-group symbol lookup as a broadcast dimension join (the
    reference's 230-entry dict, SURVEY.md P19/F8): a synthetic spg_number
    per part joins the dim; Catalyst broadcasts the 230-row side."""
    from mr_dice_spark.functions.spacegroup import spacegroup_dim

    part = Catalog(spark, sf_dir).part
    dim = spacegroup_dim(spark).select("spg_number", "hm_symbol")
    parts = part.select(
        "p_partkey", (F.col("p_partkey") % 230 + 1).cast("int").alias("spg_number")
    )
    return (
        parts.join(F.broadcast(dim), "spg_number")
        .groupBy("hm_symbol")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .where(F.col("n_parts") >= 2)
        .orderBy("hm_symbol")
    )


PCTL_ORACLE = """
SELECT event_type,
       ROUND(1e-9 + quantile_cont(value, 0.5), 4) AS p50,
       ROUND(1e-9 + quantile_cont(value, 0.95), 4) AS p95,
       COUNT(*) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@golden("percentile_value_by_type", PCTL_ORACLE, tags=("agg", "percentile"))
def percentile_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` == ANSI
    PERCENTILE_CONT == DuckDB quantile_cont). At 100 TB swap for
    ``approx_percentile`` (t-digest sketch, map-side mergeable) — the exact
    form is the oracle-checkable baseline."""
    ev = Catalog(spark, sf_dir).events
    return (
        ev.groupBy("event_type")
        .agg(
            _r(F.percentile("value", 0.5), 4).alias("p50"),
            _r(F.percentile("value", 0.95), 4).alias("p95"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


GSETS_ORACLE = """
SELECT COALESCE(event_type, 'ALL') AS etype,
       COALESCE(CAST(user_id % 10 AS BIGINT), -1) AS user_bucket,
       COUNT(*) AS n
FROM events
GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
ORDER BY etype, user_bucket
"""


@golden("grouping_sets_events", GSETS_ORACLE, tags=("agg", "grouping-sets"))
def grouping_sets_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind rollup/cube) via the
    SQL surface — registered views + spark.sql, same entry path as
    fetch_sql."""
    Catalog(spark, sf_dir).register_views()
    return spark.sql(
        """
        SELECT COALESCE(event_type, 'ALL') AS etype,
               COALESCE(user_id % 10, -1) AS user_bucket,
               COUNT(*) AS n
        FROM events
        GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
        ORDER BY etype, user_bucket
        """
    )


# ---------------------------------------------------------------------------
# TPC-H classics re-targeted to the driver tables (relational breadth:
# multi-join top-k with expression aggregate, and the scan-dominated
# filter-aggregate). q01 lives in golden.py.
# ---------------------------------------------------------------------------

Q3_ORACLE = """
SELECT l_orderkey,
       ROUND(1e-9 + SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       epoch_ms(CAST(o_orderdate AS TIMESTAMP)) AS orderdate_ms,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@golden("q03_shipping_priority", Q3_ORACLE, tags=("join", "agg", "topk", "tpch"), bench=True)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dimension filter broadcast into a 3-way
    join, expression aggregate, global top-10 (TakeOrderedAndProject)."""
    _utc(spark)
    t = Catalog(spark, sf_dir)
    return (
        t.customer.where(F.col("c_mktsegment") == "BUILDING")
        .join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
        .where(F.col("o_orderdate") < "1998-01-01")
        .join(t.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > "1998-01-01")
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .select(
            "l_orderkey", "revenue",
            F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("orderdate_ms"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


Q6_ORACLE = """
SELECT ROUND(1e-9 + SUM(l_extendedprice * l_discount), 4) AS revenue,
       COUNT(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@golden("q06_forecast_revenue", Q6_ORACLE, tags=("agg", "filter", "tpch"), bench=True)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: scan-dominated conjunctive filter + global aggregate
    — every predicate reaches the parquet scan, no shuffle beyond the
    single-row final aggregate."""
    _utc(spark)
    l = Catalog(spark, sf_dir).lineitem
    return (
        l.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _r(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


Q5_ORACLE = """
SELECT n_name,
       ROUND(1e-9 + SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@golden("q05_local_supplier_volume", Q5_ORACLE, tags=("join", "agg", "tpch"))
def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join where region→nation→supplier is a
    broadcast dimension chain and the same-nation condition
    (c_nationkey = s_nationkey) rides the lineitem-supplier join — the
    only big shuffles are the fact-side equi-joins, which is the plan
    that survives at 100 TB."""
    _utc(spark)
    t = Catalog(spark, sf_dir)
    dims = (
        t.supplier.join(
            F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey")
        ).join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "ASIA")
    )
    return (
        t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
        .where(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .join(t.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            dims,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            _r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


Q18_ORACLE = """
SELECT c_name, c_custkey, o_orderkey,
       epoch_ms(CAST(o_orderdate AS TIMESTAMP)) AS orderdate_ms,
       o_totalprice,
       ROUND(1e-9 + SUM(l_quantity), 4) AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
    HAVING SUM(l_quantity) > 300
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


@golden("q18_large_volume_customer", Q18_ORACLE, tags=("join", "agg", "semi", "tpch"))
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: the IN-subquery becomes an aggregate + left-semi
    join against the fact table (the qualifying-order list is tiny, so
    AQE broadcasts the semi side), then re-join and re-aggregate. The
    big-order list is computed once — not a correlated per-row probe."""
    _utc(spark)
    t = Catalog(spark, sf_dir)
    big = (
        t.lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .where(F.col("__q") > 300)
        .select("l_orderkey")
    )
    return (
        t.lineitem.join(big.withColumnRenamed("l_orderkey", "__ok"),
                        F.col("l_orderkey") == F.col("__ok"), "left_semi")
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(_r(F.sum("l_quantity"), 4).alias("sum_qty"))
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("orderdate_ms"),
            "o_totalprice", "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


PIVOT_ORACLE = """
SELECT l_returnflag,
       ROUND(1e-9 + SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END), 4) AS qty_f,
       ROUND(1e-9 + SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END), 4) AS qty_o
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@golden("pivot_returnflag_status", PIVOT_ORACLE, tags=("agg", "pivot"))
def pivot_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): Spark's pivot with explicit value list — the
    explicit list keeps it one pass (no extra distinct-values job) and
    makes the output schema static, which is what a 100 TB pipeline wants."""
    l = Catalog(spark, sf_dir).lineitem
    out = (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.coalesce(_r(F.sum("l_quantity"), 4), F.lit(0.0)))
        .withColumnsRenamed({"F": "qty_f", "O": "qty_o"})
        .orderBy("l_returnflag")
    )
    return out


RUNNING_ORACLE = """
SELECT user_id,
       event_id,
       ROUND(1e-9 + SUM(value) OVER (PARTITION BY user_id
                                     ORDER BY CAST(ts AS TIMESTAMP), event_id
                                     ROWS UNBOUNDED PRECEDING), 4) AS running_value,
       ROUND(1e-9 + AVG(value) OVER (PARTITION BY user_id
                                     ORDER BY CAST(ts AS TIMESTAMP), event_id
                                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS avg_5
FROM events
WHERE user_id % 50 = 0
ORDER BY user_id, event_id
"""


@golden("window_running_totals", RUNNING_ORACLE, tags=("window", "frames"))
def window_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit window frames (rowsBetween): running sum + trailing-5
    moving average per user — the frame specs the reference never uses but
    a metrics pipeline lives on (SURVEY.md §2.5 note)."""
    from pyspark.sql import Window

    _utc(spark)
    ev = Catalog(spark, sf_dir).events.where(F.col("user_id") % 50 == 0)
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    running = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    trailing = base.rowsBetween(-4, Window.currentRow)
    return ev.select(
        "user_id",
        "event_id",
        _r(F.sum("value").over(running), 4).alias("running_value"),
        _r(F.avg("value").over(trailing), 4).alias("avg_5"),
    ).orderBy("user_id", "event_id")


RANKING_ORACLE = """
SELECT s_nationkey, s_suppkey,
       RANK() OVER w AS rnk,
       DENSE_RANK() OVER w AS drnk,
       NTILE(4) OVER w AS quartile,
       ROUND(1e-9 + PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(1e-9 + CUME_DIST() OVER w, 6) AS cume
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
ORDER BY s_nationkey, rnk, s_suppkey
"""


@golden("window_ranking_family", RANKING_ORACLE, tags=("window", "rank", "ntile"))
def window_ranking_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking family (rank, dense_rank, ntile, percent_rank,
    cume_dist) per nation over supplier balances — the W-functions the
    reference never uses but Spark's Window gives for free (SURVEY.md
    §2.5 note). Total order inside the partition (tiebreak s_suppkey)
    makes every function deterministic, ntile included."""
    from pyspark.sql import Window

    s = Catalog(spark, sf_dir).supplier
    w = Window.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), "s_suppkey")
    return s.select(
        "s_nationkey",
        "s_suppkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        _r(F.percent_rank().over(w), 6).alias("pct_rank"),
        _r(F.cume_dist().over(w), 6).alias("cume"),
    ).orderBy("s_nationkey", "rnk", "s_suppkey")


LAG_ORACLE = """
SELECT user_id, event_id,
       epoch_ms(CAST(ts AS TIMESTAMP))
         - epoch_ms(LAG(CAST(ts AS TIMESTAMP)) OVER w) AS ms_since_prev,
       ROUND(1e-9 + value - LAG(value) OVER w, 4) AS value_delta,
       LEAD(event_id) OVER w AS next_event_id
FROM events
WHERE user_id % 100 = 0
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
ORDER BY user_id, event_id
"""


@golden("window_lag_lead_deltas", LAG_ORACLE, tags=("window", "lag", "lead"))
def window_lag_lead_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics: inter-event gaps and deltas per user."""
    from pyspark.sql import Window

    _utc(spark)
    ev = Catalog(spark, sf_dir).events.where(F.col("user_id") % 100 == 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        (F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w))).alias("ms_since_prev"),
        _r(F.col("value") - F.lag("value").over(w), 4).alias("value_delta"),
        F.lead("event_id").over(w).alias("next_event_id"),
    ).orderBy("user_id", "event_id")


FUNNEL_ORACLE = """
WITH f AS (
  SELECT user_id,
         list_sort(list(struct_pack(
             t := epoch_ms(CAST(ts AS TIMESTAMP)), ty := event_type))) AS evs
  FROM events
  WHERE event_type IN ('view', 'click', 'purchase') AND user_id IS NOT NULL
    AND ts IS NOT NULL AND ts < TIMESTAMP '2024-01-03 00:00:00'
  GROUP BY user_id
),
r AS (
  SELECT user_id,
         list_reduce(
           list_prepend(0, list_transform(evs,
               e -> CASE e.ty WHEN 'view' THEN 0
                              WHEN 'click' THEN 1
                              ELSE 2 END)),
           (acc, x) -> acc + CASE WHEN x = acc THEN 1 ELSE 0 END) AS reached
  FROM f
),
c AS (
  SELECT CAST(count_if(reached >= 1) AS BIGINT) AS n0,
         CAST(count_if(reached >= 2) AS BIGINT) AS n1,
         CAST(count_if(reached >= 3) AS BIGINT) AS n2
  FROM r
)
SELECT * FROM (
  SELECT 1 AS step_index, 'view' AS step, n0 AS n_users,
         CASE WHEN n0 > 0 THEN ROUND(1e-9 + n0 / CAST(n0 AS DOUBLE), 6) END AS conversion
  FROM c
  UNION ALL
  SELECT 2, 'click', n1,
         CASE WHEN n0 > 0 THEN ROUND(1e-9 + n1 / CAST(n0 AS DOUBLE), 6) END
  FROM c
  UNION ALL
  SELECT 3, 'purchase', n2,
         CASE WHEN n0 > 0 THEN ROUND(1e-9 + n2 / CAST(n0 AS DOUBLE), 6) END
  FROM c
)
ORDER BY step_index
"""


@golden(
    "events_funnel_conversion",
    FUNNEL_ORACLE,
    tags=("events", "funnel", "sequence", "analytics"),
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis (view -> click -> purchase): users
    reaching each step as a time-ordered subsequence of their history,
    via ONE user-keyed shuffle and an in-row greedy subsequence fold —
    no per-step passes. The oracle restates the identical fold
    (list_reduce over step indices on the same (epoch_ms, type) sort),
    so the greedy-match semantics, not just the counts, are pinned."""
    from mr_dice_spark.operators.funnel import funnel_conversion

    _utc(spark)
    # first two days only: on the full month every user completes the
    # funnel (dense fixture) and the ordering semantics would be
    # untestable — the slice yields a real drop-off (92 -> 41 -> 21 at
    # sf0.01), so out-of-order histories actually fail steps
    ev = Catalog(spark, sf_dir).events.where(
        F.col("ts") < F.lit("2024-01-03 00:00:00").cast("timestamp")
    )
    return funnel_conversion(
        ev, "user_id", "event_type", "ts", ["view", "click", "purchase"]
    ).orderBy("step_index")


TRANSITIONS_ORACLE = """
WITH p AS (
  SELECT event_type AS from_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY epoch_ms(CAST(ts AS TIMESTAMP)), event_type)
           AS to_type
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
c AS (
  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_transitions
  FROM p WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type
)
SELECT from_type, to_type, n_transitions,
       ROUND(1e-9 + n_transitions / CAST(SUM(n_transitions) OVER (PARTITION BY from_type) AS DOUBLE), 6) AS prob
FROM c
ORDER BY from_type, to_type
"""


@golden(
    "events_transition_matrix",
    TRANSITIONS_ORACLE,
    tags=("events", "markov", "sequence", "analytics"),
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: consecutive
    per-user events (deterministic (epoch_ms, type) order) counted and
    row-normalized per from_type — the where-do-users-go-next complement
    of the funnel. One user-keyed lead window + a type²-keyed aggregate;
    the normalization window runs over at most type² rows."""
    from mr_dice_spark.operators.funnel import event_transitions

    _utc(spark)
    ev = Catalog(spark, sf_dir).events
    return event_transitions(ev, "user_id", "event_type", "ts").orderBy(
        "from_type", "to_type"
    )


MATCH_PATTERN_ORACLE = """
WITH e AS (
  SELECT user_id,
         epoch_ms(CAST(ts AS TIMESTAMP)) AS t,
         event_type AS ty,
         CASE event_type WHEN 'signup' THEN 's' WHEN 'error' THEN 'e'
                         WHEN 'click' THEN 'c' WHEN 'view' THEN 'v'
                         WHEN 'purchase' THEN 'p' END AS ch
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IN ('signup', 'error', 'click', 'view', 'purchase')
),
s AS (
  SELECT user_id, string_agg(ch, '' ORDER BY t, ty) AS seq
  FROM e GROUP BY user_id
),
m AS (
  SELECT user_id, regexp_extract_all(seq, 'v[vc]*p') AS hits FROM s
),
u AS (
  SELECT user_id,
         CAST(unnest(range(1, len(hits) + 1)) AS INT) AS match_no,
         unnest(hits) AS hit
  FROM m
)
SELECT user_id AS "user", match_no, hit, CAST(length(hit) AS INT) AS n_events
FROM u
ORDER BY "user", match_no
"""


@golden(
    "events_pattern_match",
    MATCH_PATTERN_ORACLE,
    tags=("events", "sequence", "match_recognize", "regex"),
)
def events_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style row-pattern detection: uninterrupted
    browse-to-buy runs — a view, then any mix of views/clicks, ending in
    a purchase (regex v[vc]*p over the per-user letter-encoded event
    sequence; signup/error letters break the run because they are in the
    alphabet but not the pattern). Funnel_conversion asks 'did the steps
    happen in order, ever'; this asks 'did they happen CONTIGUOUSLY',
    which is the SQL:2016 row-pattern semantics. The oracle rebuilds the
    identical string (string_agg over the shared (epoch_ms, type) sort)
    and scans it with DuckDB's RE2 — leftmost-greedy non-overlapping
    matching must agree with Java regex exactly, match-by-match."""
    from mr_dice_spark.operators.funnel import match_pattern

    _utc(spark)
    ev = Catalog(spark, sf_dir).events
    return match_pattern(
        ev,
        "user_id",
        "event_type",
        "ts",
        {
            "signup": "s",
            "error": "e",
            "click": "c",
            "view": "v",
            "purchase": "p",
        },
        "v[vc]*p",
    ).orderBy("user", "match_no")


PSI_DRIFT_ORACLE = """
WITH o AS (
  SELECT value FROM events
  WHERE value IS NOT NULL AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16'
),
n AS (
  SELECT value * 1.2 AS value FROM events
  WHERE value IS NOT NULL AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16'
),
e AS (
  SELECT list_transform(
           quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
           x -> round(1e-9 + x, 6)) AS edges
  FROM o
),
ob AS (
  SELECT 1 + len(list_filter((SELECT edges FROM e), ed -> value > ed)) AS bin
  FROM o
),
nb AS (
  SELECT 1 + len(list_filter((SELECT edges FROM e), ed -> value > ed)) AS bin
  FROM n
),
oc AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_old FROM ob GROUP BY bin),
nc AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_new FROM nb GROUP BY bin),
b AS (SELECT CAST(unnest(range(1, 11)) AS INT) AS bin),
c AS (
  SELECT b.bin, COALESCE(n_old, 0) AS n_old, COALESCE(n_new, 0) AS n_new
  FROM b LEFT JOIN oc ON oc.bin = b.bin LEFT JOIN nc ON nc.bin = b.bin
),
s AS (
  SELECT bin, n_old, n_new,
         ROUND(1e-9 + n_old / CAST(SUM(n_old) OVER () AS DOUBLE), 6) AS share_old,
         ROUND(1e-9 + n_new / CAST(SUM(n_new) OVER () AS DOUBLE), 6) AS share_new
  FROM c
)
SELECT bin, n_old, n_new, share_old, share_new,
       ROUND(1e-9 + (GREATEST(share_new, 1e-6) - GREATEST(share_old, 1e-6))
                    * LN(GREATEST(share_new, 1e-6) / GREATEST(share_old, 1e-6)),
             6) AS psi_term
FROM s
ORDER BY bin
"""


@golden(
    "value_drift_psi_events",
    PSI_DRIFT_ORACLE,
    tags=("observability", "drift", "psi", "profile"),
)
def value_drift_psi_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two corpus snapshots: baseline
    = the first 15 days of events, comparison = the rest with value
    scaled 1.2x (a planted instrumentation-change drift, so the detector
    has something real to flag — the generator's distribution is
    time-stationary). Decile edges come from the baseline's exact
    quantiles; each side's bin shares and the (q-p)*ln(q/p) terms are
    nudge-quantized so Spark's percentile/log agree with DuckDB's
    quantile_cont/ln digit for digit. The distribution-drift complement
    of snapshot_diff's row-identity diff."""
    from mr_dice_spark.operators.profile import psi_drift

    _utc(spark)
    ev = Catalog(spark, sf_dir).events
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    old = ev.where(F.col("ts") < cut)
    new = ev.where(F.col("ts") >= cut).withColumn(
        "value", F.col("value") * 1.2
    )
    return psi_drift(old, new, "value", n_bins=10).orderBy("bin")


SESSION_PATHS_ORACLE = """
WITH t AS (
  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
         epoch_us(CAST(ts AS TIMESTAMP)) AS us
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL
),
marked AS (
  SELECT user_id, event_id, event_type, us,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) >= 1800
              THEN 1 ELSE 0 END AS brk
  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, event_id, event_type, us,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                        ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
),
p AS (
  SELECT user_id, session_id,
         array_to_string(list_transform(
           list_slice(list_sort(list(struct_pack(us := us, tb := event_id,
                                                 t := event_type))), 1, 5),
           x -> x.t), '>') AS path
  FROM s GROUP BY user_id, session_id
),
c AS MATERIALIZED (
  SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions FROM p GROUP BY path
)
SELECT path, n_sessions, CAST(rn AS INT) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY n_sessions DESC, path) AS rn FROM c
) WHERE rn <= 15
ORDER BY rank
"""


@golden(
    "session_path_topk",
    SESSION_PATHS_ORACLE,
    tags=("events", "sessionize", "paths", "analytics"),
)
def session_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 session journeys: every 30-minute session's first five
    event types joined with '>' and counted — the path-analysis
    complement of the funnel (which asks about ONE target sequence).
    Steps order by (epoch-microsecond, event_id) inside a sorted struct
    array, so equal-timestamp ordering is engine-identical; the top-k
    is orderBy+limit then a 15-row rank window (TakeOrderedAndProject,
    the bpe_pair_stats global-top-k rule)."""
    from pyspark.sql import Window

    from mr_dice_spark.operators.sessionize import session_path_counts

    _utc(spark)
    ev = Catalog(spark, sf_dir).events
    counts = session_path_counts(
        ev, "user_id", "ts", "event_type", 1800,
        max_steps=5, tiebreak_col="event_id",
    )
    top = counts.orderBy(F.desc("n_sessions"), "path").limit(15)
    w = Window.orderBy(F.desc("n_sessions"), F.col("path"))
    return top.withColumn("rank", F.row_number().over(w)).orderBy("rank")


ATTRIBUTION_ORACLE = """
WITH e AS (
  SELECT event_id, user_id, event_type,
         epoch_us(CAST(ts AS TIMESTAMP)) AS us
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_type IS NOT NULL
),
w AS (
  SELECT event_id, user_id, event_type, us,
         MAX(CASE WHEN event_type = 'click'
                  THEN struct_pack(us := us, id := event_id) END)
           OVER (PARTITION BY user_id ORDER BY us
                 RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW) AS lt,
         MIN(CASE WHEN event_type = 'click'
                  THEN struct_pack(us := us, id := event_id) END)
           OVER (PARTITION BY user_id ORDER BY us
                 RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW) AS ft
  FROM e
)
SELECT event_id AS conversion_id, user_id,
       ft.id AS first_touch_id, lt.id AS last_touch_id,
       us - lt.us AS last_touch_lag_us
FROM w WHERE event_type = 'purchase'
ORDER BY conversion_id
"""


@golden(
    "purchase_touch_attribution",
    ATTRIBUTION_ORACLE,
    tags=("events", "attribution", "funnel", "analytics"),
)
def purchase_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First- and last-touch click attribution for every purchase within
    a microsecond-exact 7-day lookback: one user-keyed RANGE-frame
    window over integer epoch-microseconds, min/max of a (us, id)
    struct — no self-join or interval join, same-instant ties resolved
    by id in both engines. At sf0.01, 1771 of 1981 purchases attribute
    (the rest genuinely have no click in window — the NULL path stays
    populated)."""
    from mr_dice_spark.operators.funnel import touch_attribution

    _utc(spark)
    ev = Catalog(spark, sf_dir).events
    return touch_attribution(
        ev, "user_id", "ts", "event_type", "event_id",
        convert_type="purchase", touch_type="click",
    ).orderBy("conversion_id")


OLS_TREND_ORACLE = """
WITH s AS (
  SELECT event_type,
         datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
         ROUND(1e-9 + value + CASE WHEN event_type = 'click'
               THEN 2.5 * datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
               ELSE 0 END, 6) AS y
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL
),
a AS (
  SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(CAST(x AS DOUBLE)) AS sx, SUM(y) AS sy,
         SUM(CAST(x * x AS DOUBLE)) AS sxx, SUM(y * y) AS syy,
         SUM(x * y) AS sxy
  FROM s GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       ROUND(1e-9 + (n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       ROUND(1e-9 + (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
                    / n, 6) AS intercept,
       ROUND(1e-9 + ((n * sxy - sx * sy) * (n * sxy - sx * sy))
                    / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM a
ORDER BY event_type
"""


@golden(
    "ols_trend_by_event_type",
    OLS_TREND_ORACLE,
    tags=("analytics", "regression", "trend", "timeseries"),
)
def ols_trend_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type least-squares trend of value over the day index,
    with a planted +2.5/day ramp on 'click' (the stationary generator
    gives every other type slope ~0 and r2 ~0, so the fit has one real
    signal to find — click's r2 lands near 1). The operator aggregates
    the six OLS moment statistics in ONE group-keyed pass; x is a
    SMALL day index (not epoch seconds) and y is pre-quantized, keeping
    every closed-form product's float-sum noise orders below the 1e-6
    rounding grid, which is what lets two engines' different summation
    orders hash-agree."""
    from mr_dice_spark.operators.timeseries import group_ols_trend

    _utc(spark)
    ev = Catalog(spark, sf_dir).events.where(
        F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & F.col("event_type").isNotNull()
    )
    day = F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
    planted = ev.select(
        "event_type",
        day.alias("x"),
        F.round(
            F.col("value")
            + F.when(F.col("event_type") == "click", 2.5 * day).otherwise(
                F.lit(0)
            )
            + F.lit(1e-9),
            6,
        ).alias("y"),
    )
    return group_ols_trend(planted, ["event_type"], "x", "y").orderBy(
        "event_type"
    )


KS_DRIFT_ORACLE = """
WITH o AS (
  SELECT value FROM events
  WHERE value IS NOT NULL AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16'
),
n AS (
  SELECT value * 1.2 AS value FROM events
  WHERE value IS NOT NULL AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16'
),
e AS (
  SELECT list_transform(
           quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
           x -> round(1e-9 + x, 6)) AS edges
  FROM o
),
ob AS (
  SELECT 1 + len(list_filter((SELECT edges FROM e), ed -> value > ed)) AS bin
  FROM o
),
nb AS (
  SELECT 1 + len(list_filter((SELECT edges FROM e), ed -> value > ed)) AS bin
  FROM n
),
oc AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_old FROM ob GROUP BY bin),
nc AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_new FROM nb GROUP BY bin),
b AS (SELECT CAST(unnest(range(1, 11)) AS INT) AS bin),
c AS MATERIALIZED (
  SELECT b.bin, COALESCE(n_old, 0) AS n_old, COALESCE(n_new, 0) AS n_new
  FROM b LEFT JOIN oc ON oc.bin = b.bin LEFT JOIN nc ON nc.bin = b.bin
),
cum AS (
  SELECT a.bin, a.n_old, a.n_new,
         SUM(b2.n_old) AS co, SUM(b2.n_new) AS cn
  FROM c a JOIN c b2 ON b2.bin <= a.bin
  GROUP BY a.bin, a.n_old, a.n_new
),
t AS (
  SELECT CAST(SUM(n_old) AS DOUBLE) AS t_o, CAST(SUM(n_new) AS DOUBLE) AS t_n
  FROM c
),
g AS MATERIALIZED (
  SELECT bin, n_old, n_new,
         ROUND(1e-9 + co / t.t_o, 6) AS cum_share_old,
         ROUND(1e-9 + cn / t.t_n, 6) AS cum_share_new,
         ROUND(1e-9 + ABS(co / t.t_o - cn / t.t_n), 6) AS ks_gap
  FROM cum CROSS JOIN t
)
SELECT bin, n_old, n_new, cum_share_old, cum_share_new, ks_gap,
       (SELECT MAX(ks_gap) FROM g) AS ks_stat
FROM g
ORDER BY bin
"""


@golden(
    "ks_drift_events",
    KS_DRIFT_ORACLE,
    tags=("observability", "drift", "ks", "profile"),
)
def ks_drift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned two-sample Kolmogorov-Smirnov on the SAME snapshot split
    and planted 1.2x shift as value_drift_psi_events — the sup-gap
    complement of PSI's mass-ratio view, sharing the baseline's
    quantile-edge grid so the two detectors are directly comparable on
    one dashboard. Cumulative shares come from an n_bins-squared
    triangle join (no single-partition WindowExec); ks_stat repeats the
    max gap per row."""
    from mr_dice_spark.operators.profile import ks_drift

    _utc(spark)
    ev = Catalog(spark, sf_dir).events
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    old = ev.where(F.col("ts") < cut)
    new = ev.where(F.col("ts") >= cut).withColumn(
        "value", F.col("value") * 1.2
    )
    return ks_drift(old, new, "value", n_bins=10).orderBy("bin")


@golden(
    "streaming_psi_drift",
    PSI_DRIFT_ORACLE,  # byte-identical output to the batch golden above
    tags=("streaming", "drift", "psi", "observability"),
)
def streaming_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitoring ON THE STREAM ENGINE: the baseline
    (first 15 days) fixes decile edges and bin counts as a batch job;
    the live side (the rest, with the same planted 1.2x shift) arrives
    through readStream, is bucketed by the literal edges (a narrow
    streaming-safe projection), and aggregates per-bin counts in
    complete mode. The finishing PSI math (psi_from_counts) runs on the
    materialized sink — byte-identical to the batch
    value_drift_psi_events output, so the SAME DuckDB oracle
    hash-checks the streaming path. Finite replay makes the streaming
    aggregate exact, like the other streaming goldens."""
    import uuid

    from mr_dice_spark.operators.profile import (
        psi_bin_counts,
        psi_bins_frame,
        psi_edges,
        psi_from_counts,
    )
    from mr_dice_spark.streaming.windows import (
        read_events_stream,
        run_stream_to_memory,
    )

    _utc(spark)
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    old = Catalog(spark, sf_dir).events.where(F.col("ts") < cut)
    edges = psi_edges(old, "value", 10)
    old_counts = psi_bin_counts(old, "value", edges, "n_old")

    stream = (
        read_events_stream(spark, f"{sf_dir}/events.parquet")
        .where(F.col("ts") >= cut)
        .withColumn("value", F.col("value") * 1.2)
    )
    name = f"stream_psi_{uuid.uuid4().hex[:8]}"
    q = run_stream_to_memory(
        psi_bin_counts(stream, "value", edges, "n_new"),
        name,
        output_mode="complete",
    )
    try:
        counts = (
            psi_bins_frame(spark, 10)
            .join(old_counts, "bin", "left")
            .join(spark.table(name), "bin", "left")
            .select(
                "bin",
                F.coalesce("n_old", F.lit(0)).alias("n_old"),
                F.coalesce("n_new", F.lit(0)).alias("n_new"),
            )
        )
        out = psi_from_counts(counts).orderBy("bin")
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        q.stop()


HEAVY_HITTERS_ORACLE = """
WITH c AS (
  SELECT epoch_ms(date_trunc('day', CAST(ts AS TIMESTAMP))) AS window_start_ms,
         event_type, COUNT(*) AS n
  FROM events
  WHERE ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT window_start_ms, event_type, CAST(n AS BIGINT) AS n, rank
FROM (
  SELECT window_start_ms, event_type, n,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY window_start_ms ORDER BY n DESC, event_type
         ) AS INTEGER) AS rank
  FROM c
)
WHERE rank <= 3
ORDER BY window_start_ms, rank
"""


@golden(
    "streaming_topk_heavy_hitters",
    HEAVY_HITTERS_ORACLE,
    tags=("streaming", "window", "topk", "heavy-hitters"),
)
def streaming_topk_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day top-3 event types ON THE STREAM ENGINE: watermarked
    tumbling-day counts aggregate in complete mode (state bounded by
    windows x keys, never rows), then the heavy_hitters_topk finisher
    ranks the materialized sink with the deterministic (n DESC, key)
    tiebreak. Finite replay makes the streaming counts exact, so one
    batch SQL oracle hash-checks the whole path — the streaming twin of
    the tumbling-window family with a per-window ranking stage on top."""
    import uuid

    from mr_dice_spark.streaming.windows import (
        heavy_hitters_topk,
        read_events_stream,
        run_stream_to_memory,
        windowed_key_counts,
    )

    _utc(spark)
    stream = read_events_stream(spark, f"{sf_dir}/events.parquet").where(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    name = f"stream_hh_{uuid.uuid4().hex[:8]}"
    q = run_stream_to_memory(
        windowed_key_counts(stream, "event_type", "1 day", "1 day"),
        name,
        output_mode="complete",
    )
    try:
        out = heavy_hitters_topk(spark.table(name), "event_type", 3).orderBy(
            "window_start_ms", "rank"
        )
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        q.stop()


ITEMSETS_ORACLE = """
WITH e AS MATERIALIZED (
  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         event_type AS it
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL
),
nb AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n
  FROM (SELECT DISTINCT user_id, day FROM e)
),
u AS (
  SELECT it AS itemset, 1 AS size, COUNT(*) AS support FROM e GROUP BY it
  UNION ALL
  SELECT a.it || ' ' || b.it, 2, COUNT(*)
  FROM e a JOIN e b ON a.user_id = b.user_id AND a.day = b.day AND a.it < b.it
  GROUP BY 1
  UNION ALL
  SELECT a.it || ' ' || b.it || ' ' || c.it, 3, COUNT(*)
  FROM e a
  JOIN e b ON a.user_id = b.user_id AND a.day = b.day AND a.it < b.it
  JOIN e c ON a.user_id = c.user_id AND a.day = c.day AND b.it < c.it
  GROUP BY 1
)
SELECT itemset, size, CAST(support AS BIGINT) AS support,
       ROUND(1e-9 + support / nb.n, 6) AS support_ratio
FROM u CROSS JOIN nb
WHERE support >= 100
ORDER BY itemset
"""


@golden(
    "frequent_event_itemsets",
    ITEMSETS_ORACLE,
    tags=("events", "itemsets", "basket", "analytics"),
)
def frequent_event_itemsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket mining over (user, day) event baskets: which sets
    of 1-3 event types co-occur in >= 100 baskets. The operator expands
    candidate combinations IN-ROW from each basket's sorted distinct
    items (no exploded-item self-joins); the oracle deliberately uses
    the OPPOSITE algorithm — two- and three-way self-joins over distinct
    (user, day, type) rows — so a combination-enumeration bug cannot be
    mirrored. At sf0.01 all 5 singles, 10 pairs and 10 triples clear the
    floor with distinct supports. The oracle's first CTE is pinned ``AS
    MATERIALIZED``: inlined, DuckDB re-plans the thrice-referenced
    DISTINCT subquery into a join that spills tens of GB at sf0.1;
    materialized it runs in 0.25 s."""
    from mr_dice_spark.operators.itemsets import frequent_itemsets

    _utc(spark)
    ev = Catalog(spark, sf_dir).events.withColumn("day", F.to_date("ts"))
    return frequent_itemsets(
        ev, ["user_id", "day"], "event_type", min_support=100
    ).orderBy("itemset")


WINSORIZE_ORACLE = """
WITH s AS (
  SELECT event_type,
         ROUND(1e-9 + quantile_cont(value, 0.05), 6) AS lo,
         ROUND(1e-9 + quantile_cont(value, 0.95), 6) AS hi
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type, e.value,
       CASE WHEN e.value IS NULL THEN NULL
            ELSE ROUND(1e-9 + LEAST(GREATEST(e.value, s.lo), s.hi), 6) END AS value_wins,
       COALESCE(e.value < s.lo, false) AS clipped_low,
       COALESCE(e.value > s.hi, false) AS clipped_high
FROM events e JOIN s USING (event_type)
"""


@golden(
    "winsorize_values_by_type",
    WINSORIZE_ORACLE,
    tags=("robust", "winsorize", "quality", "events"),
)
def winsorize_values_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile winsorization per event type (clip to the exact
    [p05, p95] band): the heavy-tail-safe value cleaning step. Interim
    quantiles are quantized before any comparison (the kmeans-centroid
    rule) so both engines clip from identical bounds; exact percentile
    parity Spark percentile vs DuckDB quantile_cont is part of what this
    golden pins."""
    from mr_dice_spark.operators.robust import winsorize

    _utc(spark)
    ev = Catalog(spark, sf_dir).events.select("event_id", "event_type", "value")
    return winsorize(ev, "event_type", "value", 0.05, 0.95)


MAD_ORACLE = """
WITH m AS (
  SELECT event_type, ROUND(1e-9 + quantile_cont(value, 0.5), 6) AS med
  FROM events GROUP BY event_type
),
d AS (
  SELECT e.event_type,
         ROUND(1e-9 + quantile_cont(ABS(e.value - m.med), 0.5), 6) AS mad
  FROM events e JOIN m USING (event_type)
  WHERE e.value IS NOT NULL
  GROUP BY e.event_type, m.med
)
SELECT e.event_id, e.event_type, e.value,
       CASE WHEN d.mad > 0
            THEN ROUND(1e-9 + 0.6745 * (e.value - m.med) / d.mad, 4) END AS robust_z,
       COALESCE(ABS(CASE WHEN d.mad > 0
            THEN ROUND(1e-9 + 0.6745 * (e.value - m.med) / d.mad, 4) END) > 3.5,
            false) AS outlier
FROM events e JOIN m USING (event_type) JOIN d USING (event_type)
"""


@golden(
    "mad_outliers_by_type",
    MAD_ORACLE,
    tags=("robust", "mad", "outliers", "events"),
)
def mad_outliers_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD outlier screen per event type — the robust twin of the
    mean/stddev z-score (a single corrupted reading cannot poison the
    median): robust_z = 0.6745*(x-med)/MAD, flagged at |z| > 3.5, NULL z
    when the MAD quantizes to zero (fail-closed, the sd=0 rule). Both
    percentile passes quantized before use so the engines agree
    bit-for-bit."""
    from mr_dice_spark.operators.robust import mad_outlier_flags

    _utc(spark)
    ev = Catalog(spark, sf_dir).events.select("event_id", "event_type", "value")
    return mad_outlier_flags(ev, "event_type", "value", 3.5)


from mr_dice_spark.golden_pipeline import CUSUM_ORACLE as _CUSUM_ORACLE  # noqa: E402


@golden(
    "streaming_cusum_monitor",
    _CUSUM_ORACLE,  # byte-identical output to the batch cusum golden
    tags=("streaming", "drift", "cusum", "observability"),
)
def streaming_cusum_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM level-shift monitoring ON THE STREAM ENGINE: hourly bucket
    means (same planted +15 click shift as the batch golden) aggregate
    through readStream in complete mode — the shape a live drift
    dashboard runs — and the CUSUM finisher (standardize, reflection
    prefix sums) runs batch-side on the materialized sink, byte-
    identical to the batch cusum_level_shift_hourly output, so the SAME
    DuckDB oracle hash-checks the streaming path. Finite replay makes
    the streaming aggregate exact (the streaming-golden contract)."""
    import uuid

    from mr_dice_spark.operators.timeseries import cusum_from_buckets
    from mr_dice_spark.streaming.windows import (
        read_events_stream,
        run_stream_to_memory,
    )

    _utc(spark)
    stream = read_events_stream(spark, f"{sf_dir}/events.parquet").withColumn(
        "value",
        F.when(
            (F.col("event_type") == "click")
            & (F.col("ts") >= F.lit("2024-01-23").cast("timestamp")),
            F.col("value") + 15.0,
        ).otherwise(F.col("value")),
    )
    agg = (
        stream.where(F.col("value").isNotNull())
        .groupBy("event_type", F.window("ts", "1 hour").alias("w"))
        .agg(F.avg("value").alias("__v"))
    )
    name = f"stream_cusum_{uuid.uuid4().hex[:8]}"
    q = run_stream_to_memory(agg, name, output_mode="complete")
    try:
        b = spark.table(name).select(
            F.col("event_type").alias("__k"),
            F.col("w.start").alias("__h"),
            "__v",
        )
        out = cusum_from_buckets(b, "event_type", 0.5, 5.0).select(
            "event_type",
            F.unix_timestamp("bucket").alias("bucket_s"),
            _r("value", 6).alias("value"),
            "z",
            _r("cusum_pos", 6).alias("cusum_pos"),
            _r("cusum_neg", 6).alias("cusum_neg"),
            "is_shift",
        ).orderBy("event_type", "bucket_s")
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        q.stop()


from mr_dice_spark.golden_pipeline import (  # noqa: E402
    PAGE_HINKLEY_ORACLE as _PH_ORACLE,
)


@golden(
    "streaming_page_hinkley",
    _PH_ORACLE,  # byte-identical output to the batch PH golden
    tags=("streaming", "drift", "page-hinkley", "observability"),
)
def streaming_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley drift monitoring ON THE STREAM ENGINE: daily bucket
    means (same planted +15/day 'view' creep as the batch golden)
    aggregate through readStream in complete mode and the PH finisher
    (running mean / running sum / running min) runs batch-side on the
    materialized sink — byte-identical to page_hinkley_drift_daily, so
    the SAME DuckDB oracle hash-checks the streaming path. PH is the
    natural streaming drift statistic (it only ever looks backward),
    which is exactly why the finisher splits from the bucketing. Finite
    replay makes the streaming aggregate exact (the streaming-golden
    contract)."""
    import uuid

    from mr_dice_spark.operators.timeseries import ph_from_buckets
    from mr_dice_spark.streaming.windows import (
        read_events_stream,
        run_stream_to_memory,
    )

    _utc(spark)
    stream = read_events_stream(spark, f"{sf_dir}/events.parquet").withColumn(
        "value",
        F.when(
            (F.col("event_type") == "view")
            & (F.col("ts") >= F.lit("2024-01-16").cast("timestamp")),
            F.col("value")
            + 15.0
            * (F.floor(F.unix_timestamp("ts") / 86400).cast("long") - 19737),
        ).otherwise(F.col("value")),
    )
    agg = (
        stream.where(F.col("value").isNotNull())
        .groupBy("event_type", F.window("ts", "1 day").alias("w"))
        .agg(F.avg("value").alias("__v"))
    )
    name = f"stream_ph_{uuid.uuid4().hex[:8]}"
    q = run_stream_to_memory(agg, name, output_mode="complete")
    try:
        b = spark.table(name).select(
            F.col("event_type").alias("__k"),
            F.col("w.start").alias("__h"),
            "__v",
        )
        out = ph_from_buckets(b, "event_type", 15.0, 80.0).select(
            "event_type",
            F.unix_timestamp("bucket").alias("bucket_s"),
            "value",
            "ph_inc",
            "ph_dec",
            "is_drift",
        ).orderBy("event_type", "bucket_s")
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        q.stop()


CORR_MATRIX_ORACLE = """
WITH base AS (
  SELECT CAST(l_quantity AS DOUBLE) AS q,
         CAST(l_extendedprice AS DOUBLE) AS p,
         CAST(l_discount AS DOUBLE) AS d,
         CAST(l_tax AS DOUBLE) AS t
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    AND l_discount IS NOT NULL AND l_tax IS NOT NULL
),
m AS (
  SELECT COUNT(*) AS n,
         var_pop(q) AS vq, var_pop(p) AS vp,
         var_pop(d) AS vd, var_pop(t) AS vt,
         covar_pop(q, p) AS cqp, covar_pop(q, d) AS cqd,
         covar_pop(q, t) AS cqt, covar_pop(p, d) AS cpd,
         covar_pop(p, t) AS cpt, covar_pop(d, t) AS cdt
  FROM base
)
SELECT col_a, col_b, CAST(n AS BIGINT) AS n,
       ROUND(r + 1e-9, 6) + 0.0 AS r
FROM (
  SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, n,
         CASE WHEN vq * vp > 0 THEN cqp / SQRT(vq * vp) END AS r FROM m
  UNION ALL
  SELECT 'l_quantity', 'l_discount', n,
         CASE WHEN vq * vd > 0 THEN cqd / SQRT(vq * vd) END FROM m
  UNION ALL
  SELECT 'l_quantity', 'l_tax', n,
         CASE WHEN vq * vt > 0 THEN cqt / SQRT(vq * vt) END FROM m
  UNION ALL
  SELECT 'l_extendedprice', 'l_discount', n,
         CASE WHEN vp * vd > 0 THEN cpd / SQRT(vp * vd) END FROM m
  UNION ALL
  SELECT 'l_extendedprice', 'l_tax', n,
         CASE WHEN vp * vt > 0 THEN cpt / SQRT(vp * vt) END FROM m
  UNION ALL
  SELECT 'l_discount', 'l_tax', n,
         CASE WHEN vd * vt > 0 THEN cdt / SQRT(vd * vt) END FROM m
)
ORDER BY col_a, col_b
"""


@golden(
    "correlation_matrix_lineitem",
    CORR_MATRIX_ORACLE,
    tags=("profile", "correlation", "collinearity", "olap"),
)
def correlation_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson matrix over the four lineitem numerics in ONE
    aggregate pass (per-pair corr() calls would be six corpus scans) —
    the collinearity screen a feature/quality-signal battery needs
    before anything downstream trusts the signals as independent.
    Complete-case semantics: every pair computed over the SAME row set
    (pairwise deletion makes the entries incomparable; the operator
    refuses to produce that)."""
    from mr_dice_spark.operators.profile import correlation_matrix

    _utc(spark)
    li = Catalog(spark, sf_dir).lineitem
    return correlation_matrix(
        li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    ).orderBy("col_a", "col_b")


INTERVAL_COVERAGE_ORACLE = """
WITH base AS (
  SELECT user_id AS k,
         CAST(CAST(FLOOR(epoch(ts)) AS BIGINT) AS DOUBLE) AS s,
         CAST(CAST(FLOOR(epoch(ts)) AS BIGINT) + 300 AS DOUBLE) AS e
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
f AS (
  SELECT k, s, e,
         CASE WHEN s > COALESCE(MAX(e) OVER (PARTITION BY k ORDER BY s, e
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1e308)
              THEN 1 ELSE 0 END AS nw
  FROM base
),
i AS (
  SELECT k, s, e,
         SUM(nw) OVER (PARTITION BY k ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
  FROM f
),
pi AS (
  SELECT k, isl, COUNT(*) AS n, MIN(s) AS lo, MAX(e) AS hi,
         SUM(e - s) AS rawi
  FROM i GROUP BY 1, 2
)
SELECT k AS user_id, CAST(SUM(n) AS BIGINT) AS n_intervals,
       CAST(COUNT(*) AS BIGINT) AS n_islands,
       ROUND(SUM(hi - lo) + 1e-9, 6) AS covered,
       ROUND(SUM(rawi) + 1e-9, 6) AS raw_length,
       ROUND(CASE WHEN SUM(rawi) <> 0 THEN SUM(hi - lo) / SUM(rawi) END
             + 1e-9, 6) AS overlap_ratio
FROM pi GROUP BY k ORDER BY user_id
"""


@golden(
    "user_active_coverage",
    INTERVAL_COVERAGE_ORACLE,
    tags=("interval", "gaps-and-islands", "coverage", "events"),
)
def user_active_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of each user's 5-minute activity windows: how much wall
    time was the user ACTUALLY active, with overlapping windows counted
    once — the double-counting raw durations always get wrong. Event
    density scales with sf, so merging intensifies up the sweep (sparse
    ~1 merge/user at sf0.01, heavy merging at sf0.1) — the same golden
    exercises both regimes. All comparisons run on exact integer-second
    epochs, so the island structure and the covered/raw sums are
    cross-engine exact."""
    from mr_dice_spark.operators.interval import interval_coverage

    _utc(spark)
    ev = Catalog(spark, sf_dir).events.where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    iv = ev.select(
        "user_id",
        F.unix_timestamp("ts").cast("double").alias("s"),
        (F.unix_timestamp("ts") + 300).cast("double").alias("e"),
    )
    return interval_coverage(iv, "user_id", "s", "e").orderBy("user_id")


RFM_ORACLE = """
WITH units AS MATERIALIZED (
  SELECT user_id AS u,
         MAX(CAST(FLOOR(epoch(ts)) AS BIGINT)) AS last,
         CAST(COUNT(*) AS DOUBLE) AS f,
         ROUND(SUM(value) + 1e-9, 6) AS m
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY user_id
),
ref AS (SELECT MAX(last) AS e FROM units),
si AS (SELECT u, CAST(e - last AS DOUBLE) AS r, f, m FROM units, ref),
cuts AS (
  SELECT ROUND(quantile_cont(r, 0.25) + 1e-9, 6) AS r1,
         ROUND(quantile_cont(r, 0.5) + 1e-9, 6) AS r2,
         ROUND(quantile_cont(r, 0.75) + 1e-9, 6) AS r3,
         ROUND(quantile_cont(f, 0.25) + 1e-9, 6) AS f1,
         ROUND(quantile_cont(f, 0.5) + 1e-9, 6) AS f2,
         ROUND(quantile_cont(f, 0.75) + 1e-9, 6) AS f3,
         ROUND(quantile_cont(m, 0.25) + 1e-9, 6) AS m1,
         ROUND(quantile_cont(m, 0.5) + 1e-9, 6) AS m2,
         ROUND(quantile_cont(m, 0.75) + 1e-9, 6) AS m3
  FROM si
),
sc AS (
  SELECT m,
         4 - (CAST(r > r1 AS INT) + CAST(r > r2 AS INT)
              + CAST(r > r3 AS INT)) AS rs,
         1 + (CAST(f > f1 AS INT) + CAST(f > f2 AS INT)
              + CAST(f > f3 AS INT)) AS fs,
         1 + (CAST(m > m1 AS INT) + CAST(m > m2 AS INT)
              + CAST(m > m3 AS INT)) AS ms
  FROM si, cuts
)
SELECT CAST(rs AS VARCHAR) || CAST(fs AS VARCHAR) || CAST(ms AS VARCHAR)
         AS segment,
       CAST(rs AS BIGINT) AS r_score, CAST(fs AS BIGINT) AS f_score,
       CAST(ms AS BIGINT) AS m_score,
       CAST(COUNT(*) AS BIGINT) AS n_units,
       ROUND(AVG(m) + 1e-9, 6) AS avg_monetary
FROM sc GROUP BY 1, 2, 3, 4 ORDER BY segment
"""


@golden(
    "rfm_segments_users",
    RFM_ORACLE,
    tags=("analytics", "rfm", "segmentation", "events"),
)
def rfm_segments_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quartile segmentation of the user base (recency from the
    corpus end, event frequency, value sum) rolled up per segment code
    — the classic behavioral-cohort cut, built on threshold quartiles
    (quantized, broadcast) instead of a single-task global NTILE sort.
    Boundary ties share a score by design: reproducible, and the 6dp-
    pinned thresholds make segment membership cross-engine exact."""
    from mr_dice_spark.operators.funnel import rfm_segments

    _utc(spark)
    ev = Catalog(spark, sf_dir).events
    return rfm_segments(ev, "user_id", "ts", "value").orderBy("segment")


MISRA_GRIES_AUDIT_ORACLE = r"""
WITH toks AS (
  SELECT unnest(string_split_regex(trim(text), '\s+')) AS t FROM documents
),
c AS (SELECT t, COUNT(*) AS n FROM toks WHERE t <> '' GROUP BY t)
SELECT t AS token, CAST(n AS BIGINT) AS exact_count, true AS within_bound
FROM c ORDER BY n DESC, t ASC LIMIT 10
"""


@golden(
    "misra_gries_topk_audit_tokens",
    MISRA_GRIES_AUDIT_ORACLE,
    tags=("sketch", "misra-gries", "heavy-hitters", "audit"),
)
def misra_gries_topk_audit_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic-guarantee audit of the Misra-Gries summary
    (m=256) over document tokens: the exact top-10 tokens carry their
    exact counts plus the sandwich verdict ``exact - N/257 <= est <=
    exact`` — the approx_distinct_audit pattern for the one sketch
    whose bound is DETERMINISTIC (no collisions, no failure
    probability). Estimates vary with partitioning by nature and stay
    out of the output; the guarantee is what the oracle hash-checks."""
    from mr_dice_spark.operators.sketch import misra_gries_topk_audit

    _utc(spark)
    docs = Catalog(spark, sf_dir).documents
    toks = docs.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token")
    ).where(F.col("token") != "")
    return misra_gries_topk_audit(toks, "token", m=256, k=10)


WEIGHTED_MEDIAN_ORACLE = """
WITH cells AS (
  SELECT l_returnflag AS g, l_extendedprice AS v,
         COUNT(*) AS n, ROUND(SUM(l_quantity) + 1e-9, 6) AS w
  FROM lineitem
  WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL
    AND l_quantity IS NOT NULL AND l_quantity > 0
  GROUP BY 1, 2
),
cum AS (
  SELECT g, v, n,
         SUM(w) OVER (PARTITION BY g ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
  FROM cells
),
gated AS (
  SELECT g, v, n, cw, MAX(cw) OVER (PARTITION BY g) AS tw FROM cum
)
SELECT g AS l_returnflag,
       CAST(SUM(n) AS BIGINT) AS n_rows,
       ROUND(MAX(tw) + 1e-9, 6) AS total_weight,
       MIN(CASE WHEN cw >= 0.5 * tw THEN v END) AS wpct
FROM gated GROUP BY g ORDER BY l_returnflag
"""


@golden(
    "weighted_median_price_by_flag",
    WEIGHTED_MEDIAN_ORACLE,
    tags=("robust", "weighted-median", "percentile", "olap"),
)
def weighted_median_price_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median extended price per return flag — 'the
    price at which half the QUANTITY trades', vs percentile()'s median
    ROW; the distinction that matters whenever row sizes vary (every
    document corpus weighted by tokens). Lower-percentile convention
    keeps the answer an actual data value; the gating total is read
    from the SAME cumulative accumulation on both engines, so the
    threshold compare cannot flip on a separately-summed total's last
    ulp."""
    from mr_dice_spark.operators.robust import weighted_percentile

    _utc(spark)
    li = Catalog(spark, sf_dir).lineitem
    return weighted_percentile(
        li, "l_returnflag", "l_extendedprice", "l_quantity", p=0.5
    ).orderBy("l_returnflag")


RULES_ORACLE = """
WITH e AS MATERIALIZED (
  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         event_type AS it
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL
),
nb AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n
  FROM (SELECT DISTINCT user_id, day FROM e)
),
singles AS MATERIALIZED (
  SELECT it, COUNT(*) AS s FROM e GROUP BY it HAVING COUNT(*) >= 100
),
pairs AS MATERIALIZED (
  SELECT a.it AS ia, b.it AS ib, COUNT(*) AS sab
  FROM e a JOIN e b ON a.user_id = b.user_id AND a.day = b.day AND a.it < b.it
  GROUP BY 1, 2 HAVING COUNT(*) >= 100
),
directed AS (
  SELECT ia AS antecedent, ib AS consequent, sab FROM pairs
  UNION ALL
  SELECT ib, ia, sab FROM pairs
)
SELECT d.antecedent, d.consequent, CAST(d.sab AS BIGINT) AS support,
       ROUND(1e-9 + d.sab * 1.0 / sa.s, 6) AS confidence,
       ROUND(1e-9 + (d.sab * 1.0 / sa.s) * nb.n / sc.s, 6) AS lift
FROM directed d
JOIN singles sa ON sa.it = d.antecedent
JOIN singles sc ON sc.it = d.consequent
CROSS JOIN nb
WHERE d.sab * 1.0 / sa.s >= 0.3
ORDER BY antecedent, consequent
"""


@golden(
    "association_rules_events",
    RULES_ORACLE,
    tags=("events", "itemsets", "rules", "analytics"),
)
def association_rules_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over the (user, day) event baskets: directed
    confidence and chance-normalized lift from the frequent pairs —
    the diagnostics layer on frequent_event_itemsets (lift < 1 flags
    substitutes, > 1 genuine co-occurrence). The oracle mines pairs by
    the opposite algorithm (self-joins, the itemsets golden's
    cross-check strategy) and restates the rule arithmetic on exact
    counts."""
    from mr_dice_spark.operators.itemsets import association_rules

    _utc(spark)
    ev = Catalog(spark, sf_dir).events.withColumn("day", F.to_date("ts"))
    out = association_rules(
        ev, ["user_id", "day"], "event_type",
        min_support=100, min_confidence=0.3,
    )
    return out.select(
        "antecedent", "consequent", "support",
        _r("confidence", 6).alias("confidence"),
        _r("lift", 6).alias("lift"),
    ).orderBy("antecedent", "consequent")


# ---------------------------------------------------------------------------
# Jensen-Shannon divergence between class-conditional value distributions
# (round 7)
# ---------------------------------------------------------------------------

JS_DIVERGENCE_ORACLE = """
WITH o AS (
  SELECT value FROM events
  WHERE value IS NOT NULL AND event_type = 'purchase'
),
n AS (
  SELECT value FROM events
  WHERE value IS NOT NULL AND event_type <> 'purchase'
),
e AS (
  SELECT list_transform(
           quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
           x -> round(1e-9 + x, 6)) AS edges
  FROM o
),
ob AS (
  SELECT 1 + len(list_filter((SELECT edges FROM e), ed -> value > ed)) AS bin
  FROM o
),
nb AS (
  SELECT 1 + len(list_filter((SELECT edges FROM e), ed -> value > ed)) AS bin
  FROM n
),
oc AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_old FROM ob GROUP BY bin),
nc AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_new FROM nb GROUP BY bin),
b AS (SELECT CAST(unnest(range(1, 11)) AS INT) AS bin),
c AS (
  SELECT b.bin, COALESCE(n_old, 0) AS n_old, COALESCE(n_new, 0) AS n_new
  FROM b LEFT JOIN oc ON oc.bin = b.bin LEFT JOIN nc ON nc.bin = b.bin
),
s AS (
  SELECT bin, n_old, n_new,
         ROUND(n_old / CAST(SUM(n_old) OVER () AS DOUBLE) + 1e-9, 6) AS share_old,
         ROUND(n_new / CAST(SUM(n_new) OVER () AS DOUBLE) + 1e-9, 6) AS share_new
  FROM c
)
SELECT bin, n_old, n_new, share_old, share_new,
       ROUND((CASE WHEN share_old > 0 THEN
                0.5 * share_old * log2(share_old / ((share_old + share_new) / 2.0))
              ELSE 0.0 END
              + CASE WHEN share_new > 0 THEN
                0.5 * share_new * log2(share_new / ((share_old + share_new) / 2.0))
              ELSE 0.0 END) + 1e-9, 8) AS jsd_term
FROM s
ORDER BY bin
"""


@golden(
    "js_divergence_purchase_values",
    JS_DIVERGENCE_ORACLE,
    tags=("observability", "drift", "jsd", "profile"),
)
def js_divergence_purchase_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence (bits, bounded [0,1]) between the
    purchase and non-purchase value distributions on the purchase-side
    decile grid — the symmetric, epsilon-free drift/feature-signal
    readout beside PSI and KS (a JSD near 0 says the 'purchase
    classifier' golden has no value signal to exploit; the three
    detectors share one dashboard threshold because JSD is bounded).
    Terms are computed from the nudge-rounded shares and rounded at 8
    (drift terms are legitimately ~1e-4)."""
    from mr_dice_spark.operators.profile import js_divergence_bins

    ev = Catalog(spark, sf_dir).events.where(F.col("value").isNotNull())
    old = ev.where(F.col("event_type") == "purchase")
    new = ev.where(F.col("event_type") != "purchase")
    return js_divergence_bins(old, new, "value", n_bins=10).orderBy("bin")


@golden(
    "streaming_js_divergence",
    JS_DIVERGENCE_ORACLE,  # byte-identical output to the batch golden
    tags=("streaming", "drift", "jsd", "observability"),
)
def streaming_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon drift monitoring ON THE STREAM ENGINE: the
    purchase-side baseline fixes decile edges and bin counts as a batch
    job; the non-purchase side arrives through readStream, buckets by
    the literal edges (streaming-safe narrow projection) and aggregates
    per-bin counts in complete mode; the finishing JSD math
    (js_from_counts) runs on the materialized sink — byte-identical to
    the batch js_divergence_purchase_values output, so the SAME DuckDB
    oracle hash-checks the streaming path (the streaming_psi_drift
    pattern; finite replay makes the aggregate exact)."""
    import uuid

    from mr_dice_spark.operators.profile import (
        js_from_counts,
        psi_bin_counts,
        psi_bins_frame,
        psi_edges,
    )
    from mr_dice_spark.streaming.windows import (
        read_events_stream,
        run_stream_to_memory,
    )

    _utc(spark)
    ev = Catalog(spark, sf_dir).events.where(F.col("value").isNotNull())
    old = ev.where(F.col("event_type") == "purchase")
    edges = psi_edges(old, "value", 10)
    old_counts = psi_bin_counts(old, "value", edges, "n_old")

    stream = (
        read_events_stream(spark, f"{sf_dir}/events.parquet")
        .where(F.col("value").isNotNull() & (F.col("event_type") != "purchase"))
    )
    name = f"stream_jsd_{uuid.uuid4().hex[:8]}"
    q = run_stream_to_memory(
        psi_bin_counts(stream, "value", edges, "n_new"),
        name,
        output_mode="complete",
    )
    try:
        counts = (
            psi_bins_frame(spark, 10)
            .join(old_counts, "bin", "left")
            .join(spark.table(name), "bin", "left")
            .select(
                "bin",
                F.coalesce("n_old", F.lit(0)).alias("n_old"),
                F.coalesce("n_new", F.lit(0)).alias("n_new"),
            )
        )
        out = js_from_counts(counts).orderBy("bin")
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        q.stop()


# ---------------------------------------------------------------------------
# classic hypothesis tests: ANOVA / Brown-Forsythe / Jarque-Bera (round 7)
# ---------------------------------------------------------------------------

ANOVA_ORACLE = """
WITH g AS (
  SELECT event_type AS grp, CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(value) AS s1, SUM(value * value) AS s2
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
t AS (
  SELECT COUNT(*) AS k, SUM(n) AS nn, SUM(s1) AS s,
         SUM(s1 * s1 / n) AS sbr, SUM(s2) AS sst
  FROM g
)
SELECT CAST(k AS BIGINT) AS k, CAST(nn AS BIGINT) AS n,
       ROUND((CASE WHEN k > 1 AND nn > k THEN
                ((sbr - s * s / nn) / (CAST(k AS DOUBLE) - 1))
                / ((sst - sbr) / (nn - CAST(k AS DOUBLE)))
              END) + 1e-9, 4) AS f_stat,
       ROUND((sbr - s * s / nn) / (sst - s * s / nn) + 1e-9, 6) AS eta_sq
FROM t
"""


@golden(
    "anova_value_by_type",
    ANOVA_ORACLE,
    tags=("stats", "anova", "effect-size", "events"),
)
def anova_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of value across event types, with eta-squared — the
    'do the group means differ AT ALL, and by how much of the variance'
    pre-test. Only ratios are emitted (raw sums of squares cancel in
    the last ulps); both engines state SSB/SSW in the identical
    expression shape over per-group power sums."""
    from mr_dice_spark.operators.anova import oneway_anova

    ev = Catalog(spark, sf_dir).events
    return oneway_anova(ev, "event_type", "value")


BROWN_FORSYTHE_ORACLE = """
WITH base AS (
  SELECT event_type AS grp, value FROM events WHERE value IS NOT NULL
),
med AS (
  SELECT grp, ROUND(quantile_cont(value, 0.5) + 1e-9, 6) AS med
  FROM base GROUP BY grp
),
z AS (
  SELECT b.grp, ABS(b.value - m.med) AS z
  FROM base b JOIN med m USING (grp)
),
g AS (
  SELECT grp, CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(z) AS s1, SUM(z * z) AS s2
  FROM z GROUP BY grp
),
t AS (
  SELECT COUNT(*) AS k, SUM(n) AS nn, SUM(s1) AS s,
         SUM(s1 * s1 / n) AS sbr, SUM(s2) AS sst
  FROM g
)
SELECT CAST(k AS BIGINT) AS k, CAST(nn AS BIGINT) AS n,
       ROUND((CASE WHEN k > 1 AND nn > k THEN
                ((sbr - s * s / nn) / (CAST(k AS DOUBLE) - 1))
                / ((sst - sbr) / (nn - CAST(k AS DOUBLE)))
              END) + 1e-9, 4) AS f_stat
FROM t
"""


@golden(
    "brown_forsythe_value_by_type",
    BROWN_FORSYTHE_ORACLE,
    tags=("stats", "levene", "variance", "events"),
)
def brown_forsythe_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe equal-variance test on value across event types —
    the median-centered Levene variant; a large F says pooled-variance
    methods are unsafe on this column. The group median is quantized
    (nudge-round 6) before |x - med| on BOTH engines, so every row's z
    is a pure function of (value, pinned constant)."""
    from mr_dice_spark.operators.anova import brown_forsythe

    ev = Catalog(spark, sf_dir).events
    return brown_forsythe(ev, "event_type", "value")


JARQUE_BERA_ORACLE = """
WITH g AS (
  SELECT event_type AS grp, CAST(COUNT(*) AS DOUBLE) AS n,
         AVG(value) AS mu,
         SUM(value * value) AS p2,
         SUM(value * value * value) AS p3,
         SUM(value * value * value * value) AS p4
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
m AS (
  SELECT grp, n, mu, p2 / n AS e2, p3 / n AS e3, p4 / n AS e4
  FROM g
),
c AS (
  SELECT grp, n,
         e2 - mu * mu AS m2,
         e3 - 3.0 * mu * e2 + 2.0 * mu * mu * mu AS m3,
         e4 - 4.0 * mu * e3 + 6.0 * mu * mu * e2
            - 3.0 * mu * mu * mu * mu AS m4
  FROM m
),
s AS (
  SELECT grp, n,
         CASE WHEN m2 > 0 THEN m3 / (m2 * SQRT(m2)) END AS skew,
         CASE WHEN m2 > 0 THEN m4 / (m2 * m2) - 3.0 END AS exk
  FROM c
)
SELECT grp AS event_type, CAST(n AS BIGINT) AS n,
       ROUND(skew + 1e-9, 6) AS skewness,
       ROUND(exk + 1e-9, 6) AS ex_kurtosis,
       ROUND(n / 6.0 * (skew * skew + exk * exk / 4.0) + 1e-9, 4) AS jb
FROM s ORDER BY event_type
"""


@golden(
    "jarque_bera_value_by_type",
    JARQUE_BERA_ORACLE,
    tags=("stats", "normality", "moments", "events"),
)
def jarque_bera_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type Jarque-Bera normality screen (skewness, excess kurtosis,
    JB) — 'is a normality-assuming method defensible on this column?'.
    Central moments expand from raw power sums in the identical
    association order on both engines; m2^1.5 is written m2*sqrt(m2)
    (correctly-rounded IEEE ops) instead of libm pow."""
    from mr_dice_spark.operators.anova import jarque_bera_by_group

    ev = Catalog(spark, sf_dir).events
    return jarque_bera_by_group(ev, "event_type", "value").orderBy("event_type")


KENDALL_ORACLE = """
WITH base AS (
  SELECT (CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) % 7) AS x,
         LEAST(9, CAST(FLOOR(value / 50.0) AS BIGINT)) AS y
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
),
cells AS MATERIALIZED (
  SELECT x, y, COUNT(*) AS c FROM base GROUP BY 1, 2
),
cd AS (
  SELECT SUM(CASE WHEN b.y > a.y THEN a.c * b.c ELSE 0 END) AS cc,
         SUM(CASE WHEN b.y < a.y THEN a.c * b.c ELSE 0 END) AS dd
  FROM cells a JOIN cells b ON a.x < b.x
),
tx AS (
  SELECT SUM(r) AS n, SUM(r * (r - 1)) AS t1x2
  FROM (SELECT x, SUM(c) AS r FROM cells GROUP BY x)
),
ty AS (
  SELECT SUM(cn * (cn - 1)) AS t2x2
  FROM (SELECT y, SUM(c) AS cn FROM cells GROUP BY y)
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(cc AS BIGINT) AS concordant,
       CAST(dd AS BIGINT) AS discordant,
       CAST(t1x2 / 2 AS BIGINT) AS n1_ties_x,
       CAST(t2x2 / 2 AS BIGINT) AS n2_ties_y,
       ROUND((CAST(cc AS DOUBLE) - CAST(dd AS DOUBLE))
             / (SQRT((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)
                      - CAST(t1x2 AS DOUBLE))
                     * (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)
                        - CAST(t2x2 AS DOUBLE))) / 2.0)
             + 1e-9, 6) AS tau_b
FROM cd, tx, ty
"""


@golden(
    "kendall_tau_weekday_value_band",
    KENDALL_ORACLE,
    tags=("stats", "kendall", "rank-correlation", "events"),
)
def kendall_tau_weekday_value_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between weekday (epoch-day mod 7) and the value
    band (50-wide deciles) — monotone association under heavy ties,
    where Pearson/Spearman on raw rows mislead. C/D/tie terms stay
    exact integers from cell counts; pair work is the bounded 70-cell
    square, independent of row count."""
    from mr_dice_spark.operators.anova import kendall_tau_b_cells

    _utc(spark)
    ev = Catalog(spark, sf_dir).events.where(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    banded = ev.select(
        (F.floor(F.unix_timestamp("ts") / 86400).cast("long") % 7).alias("x"),
        F.least(F.lit(9), F.floor(F.col("value") / 50.0)).cast("long").alias("y"),
    )
    return kendall_tau_b_cells(banded, "x", "y")


COCHRAN_ARMITAGE_ORACLE = """
WITH base AS (
  SELECT CAST((CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) % 7) AS DOUBLE) AS w,
         (event_type = 'purchase') AS y
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
),
per AS (
  SELECT w, CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(CASE WHEN y THEN 1.0 ELSE 0.0 END) AS r
  FROM base GROUP BY w
),
t AS (
  SELECT COUNT(*) AS k, SUM(n) AS nn, SUM(r) AS rr,
         SUM(w * r) AS wr, SUM(w * n) AS wn, SUM(w * w * n) AS wwn
  FROM per
),
zc AS (
  SELECT k, nn, rr,
         CASE WHEN (rr / nn) * (1.0 - rr / nn) * (wwn - wn * wn / nn) > 0
              THEN (wr - (rr / nn) * wn)
                   / SQRT((rr / nn) * (1.0 - rr / nn) * (wwn - wn * wn / nn))
         END AS z
  FROM t
)
SELECT CAST(k AS BIGINT) AS k, CAST(nn AS BIGINT) AS n,
       CAST(rr AS BIGINT) AS n_pos,
       ROUND(z + 1e-9, 6) AS z_trend,
       ROUND(z * z + 1e-9, 4) AS chi2_trend
FROM zc
"""


@golden(
    "cochran_armitage_purchase_by_weekday",
    COCHRAN_ARMITAGE_ORACLE,
    tags=("stats", "trend", "dose-response", "events"),
)
def cochran_armitage_purchase_by_weekday(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cochran-Armitage trend: does the purchase rate move monotonically
    across the weekday index (the ordered 'dose')? The sharper
    dose-response question beside chi2_type_by_weekday's 'any
    association'. Integer counts until the final ratio; identical
    expression shapes both engines."""
    from mr_dice_spark.operators.anova import cochran_armitage_trend

    _utc(spark)
    ev = Catalog(spark, sf_dir).events.where(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    dosed = ev.select(
        (F.floor(F.unix_timestamp("ts") / 86400).cast("long") % 7)
        .cast("double")
        .alias("w"),
        (F.col("event_type") == "purchase").alias("y"),
    )
    return cochran_armitage_trend(dosed, "w", "y")


KRUSKAL_ORACLE = """
WITH base AS (
  SELECT event_type AS g, value AS v FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
),
cells AS MATERIALIZED (
  SELECT v, g, COUNT(*) AS c FROM base GROUP BY 1, 2
),
vt AS MATERIALIZED (
  SELECT v, SUM(c) AS t FROM cells GROUP BY v
),
vr AS (
  SELECT v, t, SUM(t) OVER (ORDER BY v) - t AS clt FROM vt
),
tot AS (
  SELECT SUM(t) AS nn,
         SUM(CAST(t AS DOUBLE) * (t - 1) * (t + 1)) AS tie3
  FROM vt
),
gr AS (
  SELECT g, SUM(c) AS ng,
         SUM(CAST(c AS DOUBLE) * CAST(2 * clt + t + 1 AS DOUBLE)) AS r2
  FROM cells JOIN vr USING (v) GROUP BY g
),
s AS (
  SELECT COUNT(*) AS k,
         SUM(r2 * r2 / (4.0 * CAST(ng AS DOUBLE))) AS s
  FROM gr
)
SELECT CAST(k AS BIGINT) AS k,
       CAST(nn AS BIGINT) AS n,
       ROUND((12.0 * s / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) + 1))
              - 3.0 * (CAST(nn AS DOUBLE) + 1)) + 1e-9, 4) AS h,
       ROUND((1.0 - tie3 / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1)
                            * (CAST(nn AS DOUBLE) + 1))) + 1e-9, 6)
         AS tie_correction,
       ROUND(CASE WHEN (1.0 - tie3 / (CAST(nn AS DOUBLE)
                                      * (CAST(nn AS DOUBLE) - 1)
                                      * (CAST(nn AS DOUBLE) + 1))) > 0
             THEN (12.0 * s / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) + 1))
                   - 3.0 * (CAST(nn AS DOUBLE) + 1))
                  / (1.0 - tie3 / (CAST(nn AS DOUBLE)
                                   * (CAST(nn AS DOUBLE) - 1)
                                   * (CAST(nn AS DOUBLE) + 1)))
             END + 1e-9, 4) AS h_corrected
FROM s, tot
"""


@golden(
    "kruskal_wallis_value_by_type",
    KRUSKAL_ORACLE,
    tags=("stats", "kruskal-wallis", "rank-test", "events"),
)
def kruskal_wallis_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across the five event types on value — the
    rank-based k-group test beside oneway_anova's mean-based F (same
    fixture, so an analyst can read both and see whether a 'significant'
    mean shift survives dropping the normality assumption). Global
    midranks are integer-exact via the distributed prefix sum; the
    oracle restates the tie-cell -> cumulative -> join-back derivation
    with a plain window (DuckDB runs at oracle scale where one
    partition is fine)."""
    from mr_dice_spark.operators.anova import kruskal_wallis_by_group

    ev = Catalog(spark, sf_dir).events
    return kruskal_wallis_by_group(ev, "event_type", "value")


# ---------------------------------------------------------------------------
# Mood's median test: the assumption-free k-sample location screen,
# keyed by weekday so the plan stays multi-partition (round 10).
# ---------------------------------------------------------------------------

MOODS_MEDIAN_ORACLE = """
WITH base AS (
  SELECT ((CAST(FLOOR(epoch(ts) / 86400) AS BIGINT)) % 7) AS wd,
         event_type AS g, CAST(value AS DOUBLE) AS v
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
    AND NOT isnan(CAST(value AS DOUBLE))
),
cells AS (
  SELECT wd, g, v, COUNT(*) AS c FROM base GROUP BY wd, g, v
),
staged AS (
  SELECT wd, g, v, c,
         SUM(c) OVER (PARTITION BY wd ORDER BY v
                      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS ccnt,
         SUM(c) OVER (PARTITION BY wd) AS nn
  FROM cells
),
med AS (
  SELECT wd, g, v, c, nn,
         MIN(CASE WHEN ccnt * 2 >= nn + nn % 2 THEN v END)
           OVER (PARTITION BY wd) AS medv
  FROM staged
),
pg AS (
  SELECT wd, g, MAX(nn) AS nn, MAX(medv) AS medv,
         SUM(CASE WHEN v > medv THEN c ELSE 0 END) AS ab,
         SUM(CASE WHEN v <= medv THEN c ELSE 0 END) AS le
  FROM med GROUP BY wd, g
),
mg AS (
  SELECT wd, nn, medv, ab, le,
         SUM(ab) OVER (PARTITION BY wd) AS ca,
         SUM(le) OVER (PARTITION BY wd) AS cl,
         COUNT(*) OVER (PARTITION BY wd) AS ng
  FROM pg
),
et AS (
  SELECT wd, nn, ng, medv, ca, cl,
         CAST(ab AS DOUBLE) AS oa, CAST(le AS DOUBLE) AS ol,
         CAST(ab + le AS DOUBLE) * CAST(ca AS DOUBLE)
           / CAST(nn AS DOUBLE) AS ea,
         CAST(ab + le AS DOUBLE) * CAST(cl AS DOUBLE)
           / CAST(nn AS DOUBLE) AS el
  FROM mg
),
terms AS (
  SELECT wd, nn, ng, medv, ca, cl,
         ROUND(CASE WHEN ea = 0 THEN NULL
                    ELSE (oa - ea) * (oa - ea) / ea END
               + CASE WHEN el = 0 THEN NULL
                      ELSE (ol - el) * (ol - el) / el END
               + 1e-12, 9) AS t
  FROM et
)
SELECT wd, CAST(MAX(nn) AS BIGINT) AS n,
       CAST(MAX(ng) AS BIGINT) AS n_groups,
       MAX(medv) AS grand_median,
       ROUND(CASE WHEN MAX(ng) >= 2 AND MIN(ca) > 0 AND MIN(cl) > 0
             THEN CAST(SUM(CAST(t AS DECIMAL(19,9))) AS DOUBLE)
             END + 1e-9, 6) AS chi2,
       CASE WHEN MAX(ng) >= 2 AND MIN(ca) > 0 AND MIN(cl) > 0
            THEN CAST(MAX(ng) - 1 AS BIGINT) END AS dof
FROM terms GROUP BY wd ORDER BY wd
"""


@golden(
    "moods_median_value_by_weekday",
    MOODS_MEDIAN_ORACLE,
    tags=("stats", "moods-median", "rank-test", "events"),
)
def moods_median_value_by_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test of value across the five event types, keyed
    by weekday — the robustness end of the k-sample family next to
    kruskal_wallis (full ranks) and oneway_anova (means): split at the
    pooled per-weekday median, 2 x k chi-square on exact counts. The
    weekday key keeps the median windows multi-partition."""
    from mr_dice_spark.operators.anova import moods_median_test

    _utc(spark)
    ev = Catalog(spark, sf_dir).events.where(
        F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
    )
    rows = ev.select(
        (F.floor(F.unix_timestamp("ts") / 86400).cast("long") % 7).alias("wd"),
        F.col("event_type").alias("g"),
        F.col("value").cast("double").alias("v"),
    )
    return moods_median_test(rows, "wd", "g", "v").orderBy("wd")


# ---------------------------------------------------------------------------
# Jonckheere-Terpstra: does value shift monotonically across the weeks?
# (round 10)
# ---------------------------------------------------------------------------

JT_ORACLE = """
WITH base AS (
  SELECT event_type AS k,
         CAST(FLOOR(CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) / 7)
              AS BIGINT) AS g,
         CAST(value AS DOUBLE) AS v
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
    AND NOT isnan(CAST(value AS DOUBLE))
),
cells AS (SELECT k, g, v, COUNT(*) AS c FROM base GROUP BY k, g, v),
dg AS (SELECT DISTINCT k, g FROM base),
pairs AS (
  SELECT l.k, l.g AS a, r.g AS b
  FROM dg l JOIN dg r ON l.k = r.k AND l.g < r.g
),
tagged AS (
  SELECT c.k, p.a, p.b, c.v,
         CASE WHEN c.g = p.a THEN c.c ELSE 0 END AS ca0,
         CASE WHEN c.g = p.b THEN c.c ELSE 0 END AS cb0
  FROM cells c JOIN pairs p ON p.k = c.k AND (c.g = p.a OR c.g = p.b)
),
pv AS (
  SELECT k, a, b, v, SUM(ca0) AS ca, SUM(cb0) AS cb
  FROM tagged GROUP BY k, a, b, v
),
terms AS (
  SELECT k,
         cb * (2 * COALESCE(SUM(ca) OVER (PARTITION BY k, a, b ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + ca) AS u2
  FROM pv
),
jt2 AS (SELECT k, SUM(u2) AS jt2 FROM terms GROUP BY k),
gs AS (
  SELECT k, COUNT(*) AS ng, SUM(n) AS nn, SUM(n * n) AS sn2,
         SUM(n * (n - 1) * (2 * n + 5)) AS g25, SUM(n * (n - 1)) AS g11,
         SUM(n * (n - 1) * (n - 2)) AS g12
  FROM (SELECT k, g, COUNT(*) AS n FROM base GROUP BY k, g) GROUP BY k
),
tsx AS (
  SELECT k, SUM(t * (t - 1) * (2 * t + 5)) AS t25, SUM(t * (t - 1)) AS t11,
         SUM(t * (t - 1) * (t - 2)) AS t12
  FROM (SELECT k, v, COUNT(*) AS t FROM base GROUP BY k, v) GROUP BY k
),
j AS (
  SELECT gs.*, tsx.t25, tsx.t11, tsx.t12, jt2.jt2
  FROM gs JOIN tsx ON tsx.k = gs.k LEFT JOIN jt2 ON jt2.k = gs.k
),
calc AS (
  SELECT k, nn, ng,
         CAST(jt2 AS DOUBLE) / 2.0 AS jt,
         (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE) - CAST(sn2 AS DOUBLE))
           / 4.0 AS e,
         (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0)
            * (2.0 * CAST(nn AS DOUBLE) + 5.0)
          - CAST(g25 AS DOUBLE) - CAST(t25 AS DOUBLE)) / 72.0
         + CASE WHEN nn > 2
                THEN CAST(g12 AS DOUBLE) * CAST(t12 AS DOUBLE)
                     / (36.0 * CAST(nn AS DOUBLE)
                        * (CAST(nn AS DOUBLE) - 1.0)
                        * (CAST(nn AS DOUBLE) - 2.0))
                ELSE NULL END
         + CASE WHEN nn > 1
                THEN CAST(g11 AS DOUBLE) * CAST(t11 AS DOUBLE)
                     / (8.0 * CAST(nn AS DOUBLE)
                        * (CAST(nn AS DOUBLE) - 1.0))
                ELSE NULL END AS var
  FROM j
)
SELECT k AS event_type, CAST(nn AS BIGINT) AS n,
       CAST(ng AS BIGINT) AS n_groups,
       CASE WHEN ng >= 2 THEN jt END AS jt,
       -- e_jt/var_jt RAW (mirrors the operator): identical IEEE chains
       -- on exact operands are bit-equal; ROUND(double) diverges
       -- cross-engine past |x| ~ 9e9 (the round-11 magnitude-cliff
       -- finding — var reads ~2e11 at sf0.1)
       CASE WHEN ng >= 2 THEN e END AS e_jt,
       CASE WHEN ng >= 2 AND var > 0 THEN var END AS var_jt,
       ROUND(CASE WHEN ng >= 2 AND var > 0
             THEN ROUND((jt - e) / ROUND(sqrt(var) + 1e-12, 9) + 1e-12, 9)
             END + 1e-9, 6) AS z
FROM calc ORDER BY event_type
"""


@golden(
    "jt_weekly_value_trend_by_type",
    JT_ORACLE,
    tags=("stats", "jonckheere", "trend", "events"),
)
def jt_weekly_value_trend_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere-Terpstra ordered-trend test: does each event type's
    value distribution shift monotonically across the month's weeks?
    The ordered-alternative member between kruskal_wallis (unordered
    any-difference) and cochran_armitage (binary outcome), with
    Hollander-Wolfe tie-corrected null moments on exact integers and
    the doubled-U half-integer discipline."""
    from mr_dice_spark.operators.anova import jonckheere_terpstra

    _utc(spark)
    ev = Catalog(spark, sf_dir).events.where(
        F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
    )
    rows = ev.select(
        F.col("event_type").alias("k"),
        F.floor(F.floor(F.unix_timestamp("ts") / 86400) / 7)
        .cast("long")
        .alias("g"),
        F.col("value").cast("double").alias("v"),
    )
    return jonckheere_terpstra(rows, "k", "g", "v").withColumnRenamed(
        "k", "event_type"
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Somers' D: which direction does the ordinal dependence run? (round 11)
# ---------------------------------------------------------------------------

SOMERS_ORACLE = """
WITH base AS (
  SELECT event_type AS k,
         CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) % 24 AS x,
         LEAST(9, CAST(FLOOR(value / 50.0) AS BIGINT)) AS y
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
),
cells AS MATERIALIZED (
  SELECT k, x, y, COUNT(*) AS c FROM base GROUP BY 1, 2, 3
),
cd AS (
  SELECT a.k,
         SUM(CASE WHEN b.y > a.y THEN a.c * b.c ELSE 0 END) AS cc,
         SUM(CASE WHEN b.y < a.y THEN a.c * b.c ELSE 0 END) AS dd
  FROM cells a JOIN cells b ON a.k = b.k AND a.x < b.x
  GROUP BY a.k
),
tx AS (
  SELECT k, SUM(r) AS n, SUM(r * (r - 1)) AS t1x2
  FROM (SELECT k, x, SUM(c) AS r FROM cells GROUP BY k, x) GROUP BY k
),
ty AS (
  SELECT k, SUM(cn * (cn - 1)) AS t2x2
  FROM (SELECT k, y, SUM(c) AS cn FROM cells GROUP BY k, y) GROUP BY k
),
j AS (
  SELECT tx.k, tx.n, tx.t1x2, ty.t2x2,
         COALESCE(cd.cc, 0) AS cc, COALESCE(cd.dd, 0) AS dd
  FROM tx LEFT JOIN cd ON cd.k = tx.k JOIN ty ON ty.k = tx.k
)
SELECT k AS event_type, CAST(n AS BIGINT) AS n,
       CAST(cc AS BIGINT) AS concordant,
       CAST(dd AS BIGINT) AS discordant,
       CAST(t1x2 / 2 AS BIGINT) AS n1_ties_x,
       CAST(t2x2 / 2 AS BIGINT) AS n2_ties_y,
       ROUND(CASE WHEN CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)
                       - CAST(t1x2 AS DOUBLE) <> 0
             THEN (CAST(cc AS DOUBLE) - CAST(dd AS DOUBLE)) * 2.0
                  / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)
                     - CAST(t1x2 AS DOUBLE)) END + 1e-9, 6) AS d_yx,
       ROUND(CASE WHEN CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)
                       - CAST(t2x2 AS DOUBLE) <> 0
             THEN (CAST(cc AS DOUBLE) - CAST(dd AS DOUBLE)) * 2.0
                  / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)
                     - CAST(t2x2 AS DOUBLE)) END + 1e-9, 6) AS d_xy
FROM j ORDER BY event_type
"""


@golden(
    "somers_d_hour_value_by_type",
    SOMERS_ORACLE,
    tags=("stats", "somers-d", "ordinal-association", "events"),
)
def somers_d_hour_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Somers' D between hour-of-day and the value band per event type
    — the ASYMMETRIC reading kendall_tau_weekday_value_band's tau-b
    symmetrizes away: d_yx (value band dependent on hour) vs d_xy, and
    their gap says which margin's ties absorb the association. Exact
    integer concordance counts from the bounded 240-cell square per
    key; each d is one IEEE division."""
    from mr_dice_spark.operators.anova import somers_d_cells

    _utc(spark)
    ev = Catalog(spark, sf_dir).events.where(
        F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
    )
    banded = ev.select(
        F.col("event_type").alias("k"),
        (F.floor(F.unix_timestamp("ts") / 3600).cast("long") % 24).alias("x"),
        F.least(F.lit(9), F.floor(F.col("value") / 50.0)).cast("long").alias("y"),
    )
    return (
        somers_d_cells(banded, "k", "x", "y")
        .withColumnRenamed("k", "event_type")
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Dunn post-hoc: WHICH event-type pairs differ, per weekday (round 11)
# ---------------------------------------------------------------------------

DUNN_ORACLE = """
WITH base AS (
  SELECT (CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) % 7) AS k,
         event_type AS g,
         CAST(value AS DOUBLE) AS v
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
    AND NOT isnan(CAST(value AS DOUBLE))
),
cells AS MATERIALIZED (
  SELECT k, g, v, COUNT(*) AS c FROM base GROUP BY 1, 2, 3
),
vt AS (SELECT k, v, SUM(c) AS t FROM cells GROUP BY k, v),
vr AS (
  SELECT k, v, t,
         COALESCE(SUM(t) OVER (PARTITION BY k ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS clt
  FROM vt
),
tie AS (SELECT k, SUM(t * (t - 1) * (t + 1)) AS tie3 FROM vr GROUP BY k),
gr AS (
  SELECT c.k, c.g, SUM(c.c) AS ng,
         SUM(c.c * (2 * r.clt + r.t + 1)) AS r2
  FROM cells c JOIN vr r ON r.k = c.k AND r.v = c.v
  GROUP BY c.k, c.g
),
tot AS (SELECT k, SUM(ng) AS nn FROM gr GROUP BY k),
pairs AS (
  SELECT a.k, a.g AS ga, b.g AS gb, a.ng AS na, b.ng AS nb,
         a.r2 AS r2a, b.r2 AS r2b
  FROM gr a JOIN gr b ON a.k = b.k AND a.g < b.g
),
j AS (
  SELECT p.k, p.ga, p.gb, p.na, p.nb,
         CAST(p.r2a AS DOUBLE) / (2.0 * CAST(p.na AS DOUBLE)) AS mra,
         CAST(p.r2b AS DOUBLE) / (2.0 * CAST(p.nb AS DOUBLE)) AS mrb,
         (CAST(t.nn AS DOUBLE) * (CAST(t.nn AS DOUBLE) + 1.0) / 12.0
          - CAST(e.tie3 AS DOUBLE)
            / (12.0 * (CAST(t.nn AS DOUBLE) - 1.0)))
         * (1.0 / CAST(p.na AS DOUBLE) + 1.0 / CAST(p.nb AS DOUBLE)) AS var
  FROM pairs p JOIN tot t ON t.k = p.k JOIN tie e ON e.k = p.k
)
SELECT k AS weekday, ga AS g_a, gb AS g_b,
       CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       ROUND(mra + 1e-9, 6) AS mean_rank_a,
       ROUND(mrb + 1e-9, 6) AS mean_rank_b,
       ROUND(CASE WHEN var > 0
             THEN ROUND((mra - mrb) / ROUND(sqrt(var) + 1e-12, 9)
                        + 1e-12, 9) END + 1e-9, 6) AS z
FROM j ORDER BY weekday, g_a, g_b
"""


@golden(
    "dunn_posthoc_value_by_weekday",
    DUNN_ORACLE,
    tags=("stats", "dunn", "posthoc", "rank-test", "events"),
)
def dunn_posthoc_value_by_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunn post-hoc pairwise rank z for value across the five event
    types, keyed by weekday — the WHICH-pairs follow-up to
    kruskal_wallis's SOME-group-differs, on the same pooled midranks
    with tie-corrected variance; raw z per pair (BH adjustment
    composes downstream). 10 pairs x 7 weekdays, every rank sum an
    exact long."""
    from mr_dice_spark.operators.anova import dunn_posthoc

    _utc(spark)
    ev = Catalog(spark, sf_dir).events.where(
        F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
    )
    rows = ev.select(
        (F.floor(F.unix_timestamp("ts") / 86400).cast("long") % 7).alias("k"),
        F.col("event_type").alias("g"),
        F.col("value").cast("double").alias("v"),
    )
    return (
        dunn_posthoc(rows, "k", "g", "v")
        .withColumnRenamed("k", "weekday")
        .orderBy("weekday", "g_a", "g_b")
    )


# ---------------------------------------------------------------------------
# Conover squared ranks: do days differ in hourly dispersion? (round 11)
# ---------------------------------------------------------------------------

CONOVER_ORACLE = """
WITH b AS (
  SELECT event_type AS k,
         CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) * 3600 AS h,
         ROUND(1e-9 + AVG(value), 6) AS v
  FROM events
  WHERE value IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
),
g AS (SELECT k, h // 86400 AS d, v FROM b),
m AS (
  SELECT k, d, v,
         ROUND(CAST(SUM(CAST(v AS DECIMAL(16,6)))
                    OVER (PARTITION BY k, d) AS DOUBLE)
               / CAST(COUNT(*) OVER (PARTITION BY k, d) AS DOUBLE)
               + 1e-12, 9) AS mu
  FROM g
),
z AS (SELECT k, d, ABS(ROUND(v - mu + 1e-12, 9)) AS z FROM m),
r AS (
  SELECT k, d,
         2 * RANK() OVER (PARTITION BY k ORDER BY z)
           + COUNT(*) OVER (PARTITION BY k, z) - 1 AS r2
  FROM z
),
q AS (SELECT k, d, r2 * r2 AS q FROM r),
gr AS (SELECT k, d, COUNT(*) AS ng, SUM(q) AS sq FROM q GROUP BY k, d),
qq AS (
  SELECT k, SUM(CAST(q AS HUGEINT) * CAST(q AS HUGEINT)) AS qq
  FROM q GROUP BY k
),
tot AS (
  SELECT k, COUNT(*) AS kg, SUM(ng) AS nn, SUM(sq) AS gq
  FROM gr GROUP BY k
),
terms AS (
  SELECT gr.k,
         SUM(CAST(ROUND(CAST(t.nn AS DOUBLE) * CAST(gr.sq AS DOUBLE)
                        * CAST(gr.sq AS DOUBLE) / CAST(gr.ng AS DOUBLE)
                        + 1e-12, 9) AS DECIMAL(38,9))) AS ws
  FROM gr JOIN tot t ON t.k = gr.k GROUP BY gr.k
),
fin AS (
  SELECT t.k, t.kg, t.nn,
         CAST(te.ws - CAST(CAST(t.gq AS HUGEINT) * CAST(t.gq AS HUGEINT)
                           AS DECIMAL(38,9)) AS DOUBLE) AS num,
         CAST(CAST(t.nn AS HUGEINT) * qq.qq
              - CAST(t.gq AS HUGEINT) * CAST(t.gq AS HUGEINT)
              AS DOUBLE) AS den
  FROM tot t JOIN terms te ON te.k = t.k JOIN qq ON qq.k = t.k
)
SELECT k AS event_type, CAST(nn AS BIGINT) AS n,
       CAST(kg AS BIGINT) AS k_groups,
       ROUND(CASE WHEN kg >= 2 AND den > 0
             THEN ROUND((CAST(nn AS DOUBLE) - 1.0) * num / den + 1e-12, 9)
             END + 1e-9, 6) AS t_stat,
       CASE WHEN kg >= 2 AND den > 0
            THEN CAST(kg - 1 AS BIGINT) END AS dof
FROM fin ORDER BY event_type
"""


@golden(
    "conover_scale_hourly_by_type",
    CONOVER_ORACLE,
    tags=("stats", "conover", "scale-test", "rank-test", "events"),
)
def conover_scale_hourly_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conover squared-ranks scale test per event type: do the days of
    the month differ in DISPERSION of their hourly mean values? The
    rank-based row of the variance-test family (bartlett assumes
    normality; brown_forsythe averages |dev|): a volatility-regime
    screen that one heavy-tailed hour cannot buy. ~720 hourly buckets
    per key in ~30 day-groups; every rank moment an exact long and
    both cancelling differences formed in exact decimal."""
    from mr_dice_spark.operators.anova import conover_squared_ranks
    from mr_dice_spark.operators.timeseries import _bucket_agg

    _utc(spark)
    ev = Catalog(spark, sf_dir).events.where(
        F.col("value").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_type").isNotNull()
    )
    b = _bucket_agg(ev, "event_type", "ts", "value", 3600, "avg").select(
        "__k",
        "__h",
        F.round(F.col("__v") + F.lit(1e-9), 6).alias("__v"),
    )
    rows = b.select(
        F.col("__k").alias("k"),
        # floor, not cast: cast("long") truncates toward zero and would
        # misalign pre-1970 hours vs the oracle's // floor division
        F.floor(F.unix_timestamp("__h") / F.lit(86400))
        .cast("long")
        .alias("g"),
        F.col("__v").alias("v"),
    )
    return (
        conover_squared_ranks(rows, "k", "g", "v")
        .withColumnRenamed("k", "event_type")
        .orderBy("event_type")
    )
