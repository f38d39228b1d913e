"""TPC-H-shape golden queries, part 4 of the corpus.

The reference's relational surface (SURVEY.md §2.3-2.6: multi-way joins,
EXISTS/NOT-EXISTS chains, correlated scalar subqueries, conditional
aggregation, outer joins — mofdbsql_database/Mofdb_Agent/agent.py:73-250)
is exercised here through the standard TPC-H query shapes Q4-Q22, adapted
to the driver's trimmed schema (no partsupp table, no commit/receipt dates,
no comment columns — predicates are re-targeted onto existing columns while
keeping each query's distinctive plan shape).

Every query is written the way it should run at 100 TB: dimension tables
broadcast, EXISTS as left-semi / NOT-EXISTS as left-anti (never a
collect-and-filter), correlated subqueries de-correlated into aggregate
joins, and single-pass conditional aggregation instead of self-unions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mr_dice_spark.catalog import Catalog
from mr_dice_spark.golden import _r, golden
from mr_dice_spark.golden_builders import _utc

# ---------------------------------------------------------------------------
# Q4 — order priority checking: EXISTS turned into a non-equi left-semi join.
# Reference shape: EXISTS chain (mofdb_test/test.py:98-345 uses IN/EXISTS
# subqueries); late-line predicate replaces l_commitdate < l_receiptdate.
# ---------------------------------------------------------------------------

Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@golden("q04_order_priority", Q4_ORACLE, tags=("semi", "agg", "tpch"))
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: the EXISTS probe is a left-semi join with an equi key
    (orderkey) plus a non-equi residual (shipdate > orderdate) — Spark plans
    the equi part as the shuffle key so the semi join stays hash-based; the
    date filter prunes orders at the scan before the join."""
    _utc(spark)
    t = Catalog(spark, sf_dir)
    o = t.orders.where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    sel = o.join(
        t.lineitem.select("l_orderkey", "l_shipdate"),
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return (
        sel.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations, by year.
# ---------------------------------------------------------------------------

Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year,
       ROUND(1e-9 + SUM(volume), 4) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(year FROM l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@golden("q07_volume_shipping", Q7_ORACLE, tags=("join", "agg", "tpch"))
def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two aliased copies of the nation dimension, both
    broadcast; the nation-pair disjunction runs AFTER both broadcast joins
    (a residual filter on two tiny-cardinality columns), so the only
    shuffles are the lineitem-orders and orders-customer fact joins."""
    _utc(spark)
    t = Catalog(spark, sf_dir)
    n1 = t.nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t.nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    l = t.lineitem.where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    return (
        l.join(t.supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            _r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q8 — national market share within a region, by year.
# ---------------------------------------------------------------------------

Q8_ORACLE = """
SELECT o_year,
       ROUND(1e-9 + SUM(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END), 4)
         AS nation_volume,
       ROUND(1e-9 + SUM(volume), 4) AS total_volume,
       ROUND(1e-9 + SUM(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END)
                    / SUM(volume), 6) AS mkt_share
FROM (
  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


@golden("q08_market_share", Q8_ORACLE, tags=("join", "agg", "tpch"))
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: the share-of-total is ONE conditional aggregation
    (sum(case)/sum), not a join of two aggregates — a single pass over the
    joined fact stream. part (filtered to one type) broadcasts against
    lineitem, so the selective part filter prunes the fact rows before the
    orders join."""
    _utc(spark)
    t = Catalog(spark, sf_dir)
    p = t.part.where(F.col("p_type") == "PROMO").select("p_partkey")
    cust_region = (
        t.customer.join(
            F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "ASIA")
        .select("c_custkey")
    )
    n2 = t.nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    o = t.orders.where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation_vol = F.sum(F.when(F.col("nation") == "NATION_5", vol).otherwise(0.0))
    return (
        t.lineitem.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(t.supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_region, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            _r(nation_vol, 4).alias("nation_volume"),
            _r(F.sum(vol), 4).alias("total_volume"),
            _r(nation_vol / F.sum(vol), 6).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q9 — product-line profit by supplier nation and year.
# ---------------------------------------------------------------------------

Q9_ORACLE = """
SELECT nation, o_year, ROUND(1e-9 + SUM(amount), 4) AS sum_profit
FROM (
  SELECT n_name AS nation,
         EXTRACT(year FROM o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS amount
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%widget%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@golden("q09_product_profit", Q9_ORACLE, tags=("join", "agg", "tpch"), bench=True)
def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (sans partsupp): LIKE-filtered part list broadcast
    into the fact scan, supplier and nation broadcast, one shuffle join
    against orders, then a low-cardinality (nation x year) hash aggregate
    whose partial side collapses almost everything map-side."""
    _utc(spark)
    t = Catalog(spark, sf_dir)
    p = t.part.where(F.col("p_name").like("%widget%")).select("p_partkey")
    return (
        t.lineitem.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(t.supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t.orders.select("o_orderkey", "o_orderdate"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(_r(F.sum("amount"), 4).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# ---------------------------------------------------------------------------
# Q10 — returned-item reporting: top 20 customers by lost revenue.
# ---------------------------------------------------------------------------

Q10_ORACLE = """
SELECT c_custkey, c_name,
       ROUND(1e-9 + SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       ROUND(1e-9 + c_acctbal, 2) AS acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@golden("q10_returned_items", Q10_ORACLE, tags=("join", "agg", "topk", "tpch"))
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: quarter-filtered orders join return-flagged lines,
    aggregate per customer, then a global top-20 (TakeOrderedAndProject —
    per-partition heaps, never a full sort). The returnflag filter is pushed
    into the lineitem scan."""
    _utc(spark)
    t = Catalog(spark, sf_dir)
    o = t.orders.where(
        (F.col("o_orderdate") >= "1996-10-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    return (
        t.lineitem.where(F.col("l_returnflag") == "R")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            _r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .select(
            "c_custkey", "c_name", "revenue",
            _r("c_acctbal", 2).alias("acctbal"), "n_name",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q12 — shipping-delay priority classification (adapted: the late-line
# predicate l_shipdate >= o_orderdate + 60 days replaces the
# commit/receipt-date comparison the trimmed schema lacks).
# ---------------------------------------------------------------------------

Q12_ORACLE = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
         AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
         AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


@golden("q12_shipping_delay", Q12_ORACLE, tags=("join", "agg", "tpch"))
def q12_shipping_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: one equi-join with a non-equi residual (the 60-day
    lateness window), then both priority classes counted in a single
    conditional aggregation pass — never two scans."""
    _utc(spark)
    t = Catalog(spark, sf_dir)
    o = t.orders.where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(t.lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution: the corpus's only OUTER join.
# ---------------------------------------------------------------------------

Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders ON c_custkey = o_custkey
                        AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@golden("q13_customer_distribution", Q13_ORACLE, tags=("join", "outer", "agg", "tpch"))
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: left-outer join keeping order-less customers (their
    COUNT(o_orderkey) is 0, counting the column not the row), then a
    re-aggregation over the counts. The join filter lives in the join
    condition, NOT a where clause — pushing it below the outer join would
    silently turn it inner."""
    _utc(spark)
    t = Catalog(spark, sf_dir)
    o = t.orders.where(F.col("o_orderpriority") != "1-URGENT").select(
        "o_custkey", "o_orderkey"
    )
    return (
        t.customer.select("c_custkey")
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue: correlated scalar subquery
# de-correlated into an aggregate join.
# ---------------------------------------------------------------------------

Q17_ORACLE = """
SELECT ROUND(1e-9 + SUM(l_extendedprice) / 7.0, 2) AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#3'
  AND l_quantity < (
    SELECT 0.2 * AVG(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey
  )
"""


@golden("q17_small_quantity", Q17_ORACLE, tags=("join", "correlated", "agg", "tpch"))
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: the per-part correlated AVG becomes one grouped
    aggregate joined back to the fact rows (computed once, not per row).
    The per-part average intentionally spans ALL parts' lines (matching the
    subquery, which ignores the brand filter), while the brand filter
    prunes the outer side before the threshold join."""
    _utc(spark)
    t = Catalog(spark, sf_dir)
    brand_parts = t.part.where(F.col("p_brand") == "Brand#3").select("p_partkey")
    avg_qty = (
        t.lineitem.join(
            F.broadcast(brand_parts.select(F.col("p_partkey").alias("bp_key"))),
            F.col("l_partkey") == F.col("bp_key"), "left_semi",
        )
        .groupBy("l_partkey")
        .agg((F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold"))
        .withColumnRenamed("l_partkey", "t_partkey")
    )
    return (
        t.lineitem.join(F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("t_partkey"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            _r(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q19 — discounted revenue: disjunction of conjunctive band predicates.
# ---------------------------------------------------------------------------

Q19_ORACLE = """
SELECT ROUND(1e-9 + SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 21)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       AND l_quantity >= 10 AND l_quantity <= 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity >= 20 AND l_quantity <= 40)
"""


@golden("q19_disjunctive_bands", Q19_ORACLE, tags=("join", "predicate", "tpch"))
def q19_disjunctive_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs spanning both join sides. The part-only
    disjunction (brand x size) is factored out and applied BEFORE the join
    — Catalyst does not always distribute mixed-side ORs, and at 100 TB
    pre-shrinking the build side is the difference between broadcasting
    3 brands' parts and shuffling all of them."""
    _utc(spark)
    t = Catalog(spark, sf_dir)
    part_pred = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35))
    )
    p = t.part.where(part_pred).select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    full_pred = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & (q >= 1) & (q <= 21))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25)
           & (q >= 10) & (q <= 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35)
           & (q >= 20) & (q <= 40))
    )
    return (
        t.lineitem.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .where(full_pred)
        .agg(
            _r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (adapted lateness predicate):
# the corpus's EXISTS + NOT-EXISTS combination on the same fact table.
# ---------------------------------------------------------------------------

Q21_ORACLE = """
WITH late AS (
  SELECT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
    AND l_shipdate >= o_orderdate + INTERVAL 30 DAY
)
SELECT s_name, COUNT(*) AS numwait
FROM late l1
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM late l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


@golden("q21_waiting_supplier", Q21_ORACLE, tags=("semi", "anti", "agg", "tpch"))
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS -> left-semi, NOT EXISTS -> left-anti, both
    on (orderkey equi + suppkey non-equi residual) against the same late-line
    set. The late set is derived once; both probes shuffle on l_orderkey so
    AQE can reuse the exchange."""
    _utc(spark)
    t = Catalog(spark, sf_dir)
    late = (
        t.lineitem.join(
            t.orders.where(F.col("o_orderstatus") == "F").select(
                "o_orderkey", "o_orderdate"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .where(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    all_lines = t.lineitem.select(
        F.col("l_orderkey").alias("x_orderkey"), F.col("l_suppkey").alias("x_suppkey")
    )
    late_other = late.select(
        F.col("l_orderkey").alias("y_orderkey"), F.col("l_suppkey").alias("y_suppkey")
    )
    return (
        late.join(
            all_lines,
            (F.col("x_orderkey") == F.col("l_orderkey"))
            & (F.col("x_suppkey") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            late_other,
            (F.col("y_orderkey") == F.col("l_orderkey"))
            & (F.col("y_suppkey") != F.col("l_suppkey")),
            "left_anti",
        )
        .join(t.supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity: scalar subquery + anti join.
# ---------------------------------------------------------------------------

Q22_ORACLE = """
SELECT c_nationkey AS nationkey, COUNT(*) AS numcust,
       ROUND(1e-9 + SUM(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
ORDER BY nationkey
"""


@golden("q22_sales_opportunity", Q22_ORACLE, tags=("anti", "agg", "scalar-subquery", "tpch"))
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: the global scalar (average positive balance) is a
    1-row aggregate broadcast via crossJoin — computed once, streamed
    against every customer row; order-less customers via left-anti on a
    column-pruned orders scan (o_custkey only reaches the shuffle)."""
    _utc(spark)
    t = Catalog(spark, sf_dir)
    threshold = (
        t.customer.where(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    return (
        t.customer.crossJoin(F.broadcast(threshold))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(t.orders.select("o_custkey"),
              F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _r(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("nationkey")
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier by quarterly revenue: aggregate-view + scalar-max probe.
# ---------------------------------------------------------------------------

Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         ROUND(1e-9 + SUM(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


@golden("q15_top_supplier", Q15_ORACLE, tags=("scalar-subquery", "agg", "tpch"))
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the revenue view is computed ONCE, its global max
    becomes a 1-row broadcast, and the winner filter streams over the same
    aggregate — the view is small (one row per supplier) so the re-use costs
    a broadcast, not a rescan of lineitem. The max probe compares values
    nudge-rounded identically on both sides, so cross-engine double noise
    cannot flip the argmax."""
    _utc(spark)
    t = Catalog(spark, sf_dir)
    revenue = (
        t.lineitem.where(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            _r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "total_revenue"
            )
        )
    )
    best = revenue.agg(F.max("total_revenue").alias("best_revenue"))
    return (
        revenue.crossJoin(F.broadcast(best))
        .where(F.col("total_revenue") == F.col("best_revenue"))
        .join(F.broadcast(t.supplier), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q16 — supplier diversity per part class: COUNT(DISTINCT) + NOT-IN anti.
# ---------------------------------------------------------------------------

Q16_ORACLE = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@golden("q16_supplier_diversity", Q16_ORACLE, tags=("anti", "distinct-agg", "tpch"))
def q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT IN over a non-null key list is a left-anti join
    (never a collected blacklist), the brand/type/size filters prune the
    broadcast part side before the fact join, and COUNT(DISTINCT) runs as
    Spark's two-phase distinct-aggregate expand."""
    _utc(spark)
    t = Catalog(spark, sf_dir)
    p = t.part.where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = t.supplier.where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        t.lineitem.select("l_partkey", "l_suppkey")
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q20 — suppliers with excess shipments: nested IN chain as semi-join chain.
# ---------------------------------------------------------------------------

Q20_ORACLE = """
SELECT s_name, ROUND(1e-9 + s_acctbal, 2) AS acctbal
FROM supplier
WHERE s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_name LIKE '%widget%'
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_suppkey
    HAVING SUM(l_quantity) > 300
  )
  AND s_nationkey IN (
    SELECT n_nationkey FROM nation
    WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
  )
ORDER BY s_name
"""


@golden("q20_excess_shipments", Q20_ORACLE, tags=("semi", "having", "tpch"))
def q20_excess_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: both IN subqueries become left-semi joins — the
    heavy one (year of widget shipments, grouped with a HAVING threshold)
    reduces to one row per qualifying supplier before the probe, and the
    nation list is a broadcast semi against a 3-row dimension slice."""
    _utc(spark)
    t = Catalog(spark, sf_dir)
    widget = t.part.where(F.col("p_name").like("%widget%")).select("p_partkey")
    heavy = (
        t.lineitem.where(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
        )
        .join(F.broadcast(widget), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 300)
        .select("l_suppkey")
    )
    nations = t.nation.where(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    ).select("n_nationkey")
    return (
        t.supplier.join(
            F.broadcast(heavy), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .join(F.broadcast(nations), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .select("s_name", _r("s_acctbal", 2).alias("acctbal"))
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# Q2 — min-cost supplier per part within a region (partsupp emulated as the
# distinct (part, supplier) relationship observed in lineitem, with
# avg unit price as the supply-cost proxy).
# ---------------------------------------------------------------------------

Q2_ORACLE = """
WITH ps AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         ROUND(1e-9 + AVG(l_extendedprice / l_quantity), 4) AS ps_supplycost
  FROM lineitem WHERE l_quantity > 0
  GROUP BY l_partkey, l_suppkey
),
regional AS (
  SELECT ps.*, s_name, s_acctbal, n_name
  FROM ps
  JOIN supplier ON s_suppkey = ps_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
),
best AS (
  SELECT ps_partkey AS b_key, MIN(ps_supplycost) AS min_cost
  FROM regional GROUP BY ps_partkey
)
SELECT ROUND(1e-9 + s_acctbal, 2) AS acctbal, s_name, n_name,
       p_partkey, p_type, ps_supplycost AS supplycost
FROM regional
JOIN best ON b_key = ps_partkey AND ps_supplycost = min_cost
JOIN part ON p_partkey = ps_partkey
WHERE p_size <= 10
ORDER BY acctbal DESC, n_name, s_name, p_partkey
LIMIT 25
"""


@golden("q02_min_cost_supplier", Q2_ORACLE, tags=("correlated", "join", "tpch"))
def q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the correlated MIN subquery de-correlates into a
    per-part aggregate joined back on (part, cost) — the regional
    relationship table is derived ONCE and feeds both the min-aggregate
    and the winner probe. Costs are nudge-rounded BEFORE the min/equality
    so cross-engine double noise cannot flip the argmin. Dimension chain
    (supplier->nation->region) broadcasts; the only corpus-sized shuffles
    are the relationship aggregate and its self-probe."""
    _utc(spark)
    t = Catalog(spark, sf_dir)
    ps = (
        t.lineitem.where(F.col("l_quantity") > 0)
        .groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(
            _r(F.avg(F.col("l_extendedprice") / F.col("l_quantity")), 4).alias(
                "ps_supplycost"
            )
        )
    )
    regional = (
        ps.join(F.broadcast(t.supplier), F.col("s_suppkey") == F.col("ps_suppkey"))
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "ASIA")
        .select("ps_partkey", "ps_suppkey", "ps_supplycost", "s_name", "s_acctbal", "n_name")
    )
    best = regional.groupBy(F.col("ps_partkey").alias("b_key")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    small_parts = t.part.where(F.col("p_size") <= 10).select("p_partkey", "p_type")
    return (
        regional.join(
            best,
            (F.col("b_key") == F.col("ps_partkey"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .join(F.broadcast(small_parts), F.col("p_partkey") == F.col("ps_partkey"))
        .select(
            _r("s_acctbal", 2).alias("acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            F.col("ps_supplycost").alias("supplycost"),
        )
        .orderBy(F.desc("acctbal"), "n_name", "s_name", "p_partkey")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Q11 — important-stock identification: group value vs a global-fraction
# scalar threshold.
# ---------------------------------------------------------------------------

Q11_ORACLE = """
WITH ps AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         SUM(l_extendedprice * (1 - l_discount)) AS val
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
national AS (
  SELECT pk, val FROM ps
  JOIN supplier ON sk = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
)
SELECT pk AS p_partkey, ROUND(1e-9 + SUM(val), 2) AS stock_value
FROM national
GROUP BY pk
HAVING ROUND(1e-9 + SUM(val), 2) >
       (SELECT ROUND(1e-9 + SUM(val) * 0.001, 2) FROM national)
ORDER BY stock_value DESC, p_partkey
"""


@golden("q11_important_stock", Q11_ORACLE, tags=("scalar-subquery", "having", "tpch"))
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value filtered against a fraction of the
    GLOBAL total — the total is a 1-row aggregate broadcast against the
    grouped rows (J5/A6 pattern), never a second scan of lineitem: the
    national relationship feeds both the per-part aggregate and the global
    sum. Both sides of the threshold comparison are nudge-rounded so the
    strict > cannot flip on cross-engine double noise."""
    _utc(spark)
    t = Catalog(spark, sf_dir)
    ps = t.lineitem.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("val"))
    nat7 = (
        t.supplier.join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .where(F.col("n_name") == "NATION_7")
        .select("s_suppkey")
    )
    national = ps.join(
        F.broadcast(nat7), F.col("sk") == F.col("s_suppkey"), "left_semi"
    ).select("pk", "val")
    total = national.agg(_r(F.sum("val") * 0.001, 2).alias("threshold"))
    return (
        national.groupBy("pk")
        .agg(_r(F.sum("val"), 2).alias("stock_value"))
        .crossJoin(F.broadcast(total))
        .where(F.col("stock_value") > F.col("threshold"))
        .select(F.col("pk").alias("p_partkey"), "stock_value")
        .orderBy(F.desc("stock_value"), "p_partkey")
    )
