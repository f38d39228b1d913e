"""Golden query corpus: Spark DataFrame plan + DuckDB oracle SQL pairs.

Each entry re-targets one operator shape from the reference's golden query
set (the SQL Demo 1-9 corpus at
mofdbsql_database/MOFdb_SQL_vs_Traditional_Comparison.md:175-417 and the
agent-prompt examples at mofdbsql_database/Mofdb_Agent/agent.py:73-250) onto
the driver's synthetic tables, per FIXTURES.md §B3, plus the
beyond-reference pipeline operators (dedup, similarity, text analysis,
as-of join, sessionization, streaming-equivalent windows).

Determinism rules (the driver hash-compares values):
* every computed column is aliased identically on both sides;
* floating aggregates are ROUNDed at a resolution where the true value is
  decimal-exact (or the double error is orders of magnitude below the grid);
* every LIMIT query sorts by a rounded/exact key with a unique tiebreaker;
* collect_list-style aggregations sort inside the group (the reference's
  GROUP_CONCAT is arrival-ordered — SURVEY.md §7.3);
* no raw timestamp output (ns-vs-us precision differs between engines);
  timestamps surface as epoch millis.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mr_dice_spark.catalog import Catalog


def _r(col, scale: int):
    """Boundary-nudged rounding, applied identically in the oracle SQL.

    Money averages are rationals (2-decimal sums / group size) that land
    EXACTLY on round-half boundaries (e.g. 27788.53625 at scale 4); the two
    engines' last-bit-different double sums then round opposite ways. Adding
    1e-9 before rounding pushes exact-boundary values decisively off the tie
    while staying orders of magnitude above cross-engine double error.
    """
    if isinstance(col, str):
        col = F.col(col)
    return F.round(col + F.lit(1e-9), scale)


@dataclass(frozen=True)
class GoldenQuery:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # ANSI SQL for DuckDB; None => rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in the bench.py headline set


GOLDEN: dict[str, GoldenQuery] = {}


def golden(name: str, oracle: Optional[str], tags: tuple[str, ...] = (), bench: bool = False):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in GOLDEN:
            # five modules register into one dict at import time; a reused
            # name would silently REPLACE the earlier query, shrinking the
            # corpus with no error anywhere
            raise ValueError(f"duplicate golden query name {name!r}")
        GOLDEN[name] = GoldenQuery(name=name, spark=fn, oracle=oracle, tags=tags, bench=bench)
        return fn

    return deco


# ---------------------------------------------------------------------------
# q01 — flagship pricing summary (A1/A2/A4 aggregate shapes; TPC-H Q1 form).
# Reference shapes: GROUP BY + COUNT/AVG/MIN/MAX (Mofdb_Agent/agent.py:92,99).
# ---------------------------------------------------------------------------

Q01_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  ROUND(1e-9 + SUM(l_quantity), 4) AS sum_qty,
  ROUND(1e-9 + SUM(l_extendedprice), 4) AS sum_base_price,
  ROUND(1e-9 + SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
  ROUND(1e-9 + AVG(l_quantity), 4) AS avg_qty,
  ROUND(1e-9 + AVG(l_extendedprice), 4) AS avg_price,
  ROUND(1e-9 + AVG(l_discount), 4) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@golden("q01_pricing_summary", Q01_ORACLE, tags=("agg", "A1", "A2", "A4"), bench=True)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    l = t.lineitem
    return (
        l.where(F.col("l_shipdate") <= F.lit("1998-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r(F.sum("l_quantity"), 4).alias("sum_qty"),
            _r(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            _r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "sum_disc_price"
            ),
            _r(F.avg("l_quantity"), 4).alias("avg_qty"),
            _r(F.avg("l_extendedprice"), 4).alias("avg_price"),
            _r(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# demo1 — multi-join + DISTINCT + sort + limit (Mofdb_Agent/agent.py:77-86:
# "MOFs containing BOTH element A and element B" AND-of-elements idiom, J1/J3/
# A8/O1). Driver realization: orders whose lineitems span two given brands.
# Spark-first: the AND-of-containment self-join becomes two left-semi joins
# (no fan-out, no DISTINCT needed — semantically identical, shuffle-lighter).
# ---------------------------------------------------------------------------

DEMO1_ORACLE = """
SELECT DISTINCT o.o_orderkey AS orderkey, o.o_totalprice AS totalprice
FROM orders o
JOIN lineitem l1 ON o.o_orderkey = l1.l_orderkey
JOIN part p1 ON l1.l_partkey = p1.p_partkey
JOIN lineitem l2 ON o.o_orderkey = l2.l_orderkey
JOIN part p2 ON l2.l_partkey = p2.p_partkey
WHERE p1.p_brand = 'Brand#11' AND p2.p_brand = 'Brand#22'
ORDER BY totalprice DESC, orderkey
LIMIT 10
"""


@golden("demo1_and_containment", DEMO1_ORACLE, tags=("join", "J1", "J3", "A8", "O1"), bench=True)
def demo1_and_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    o, l, p = t.orders, t.lineitem, t.part

    def orders_with_brand(brand: str) -> DataFrame:
        return (
            l.join(F.broadcast(p.where(p.p_brand == brand)), l.l_partkey == p.p_partkey)
            .select(l.l_orderkey)
            .distinct()
        )

    return (
        o.join(orders_with_brand("Brand#11"), o.o_orderkey == F.col("l_orderkey"), "left_semi")
        .join(orders_with_brand("Brand#22"), o.o_orderkey == F.col("l_orderkey"), "left_semi")
        .select(o.o_orderkey.alias("orderkey"), o.o_totalprice.alias("totalprice"))
        .orderBy(F.desc("totalprice"), "orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# demo2 — GROUP BY count (Mofdb_Agent/agent.py:92, A1).
# ---------------------------------------------------------------------------

DEMO2_ORACLE = """
SELECT o_orderpriority AS priority, COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
ORDER BY priority
"""


@golden("demo2_groupby_count", DEMO2_ORACLE, tags=("agg", "A1"))
def demo2_groupby_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return (
        t.orders.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# demo3 — two CTE aggregates joined on key, ratio sort (Mofdb_Agent/
# agent.py:98-125 CO2/H2 selectivity, J6/A2/F2). Driver realization:
# per-customer avg extendedprice for returnflag R vs N, ratio-ranked.
# ---------------------------------------------------------------------------

DEMO3_ORACLE = """
WITH base AS (
  SELECT o_custkey AS custkey, l_returnflag AS flag, l_extendedprice AS price
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
r AS (SELECT custkey, AVG(price) AS r_avg FROM base WHERE flag = 'R' GROUP BY custkey),
n AS (SELECT custkey, AVG(price) AS n_avg FROM base WHERE flag = 'N' GROUP BY custkey)
SELECT r.custkey AS custkey,
       ROUND(1e-9 + r.r_avg, 4) AS r_avg,
       ROUND(1e-9 + n.n_avg, 4) AS n_avg,
       ROUND(1e-9 + r.r_avg / n.n_avg, 4) AS ratio
FROM r JOIN n ON r.custkey = n.custkey
WHERE n.n_avg > 0
ORDER BY ratio DESC, custkey
LIMIT 20
"""


@golden("demo3_cte_ratio", DEMO3_ORACLE, tags=("join", "agg", "J6", "A2", "F2"), bench=True)
def demo3_cte_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    base = (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("l_returnflag").alias("flag"),
            F.col("l_extendedprice").alias("price"),
        )
    )
    r = base.where(F.col("flag") == "R").groupBy("custkey").agg(F.avg("price").alias("r_avg"))
    n = base.where(F.col("flag") == "N").groupBy("custkey").agg(F.avg("price").alias("n_avg"))
    return (
        r.join(n, "custkey")
        .where(F.col("n_avg") > 0)
        .select(
            "custkey",
            _r("r_avg", 4).alias("r_avg"),
            _r("n_avg", 4).alias("n_avg"),
            _r(F.col("r_avg") / F.col("n_avg"), 4).alias("ratio"),
        )
        .orderBy(F.desc("ratio"), "custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# demo4 — ROW_NUMBER + COUNT(*) OVER partition, top-p% filter
# (Mofdb_Agent/agent.py:131-147, W1/W2/W4). Driver realization: top 25% of
# suppliers by acctbal within each nation.
# ---------------------------------------------------------------------------

DEMO4_ORACLE = """
WITH ranked AS (
  SELECT s_suppkey AS suppkey, s_name AS name, s_nationkey AS nationkey,
         s_acctbal AS acctbal,
         CAST(ROW_NUMBER() OVER (PARTITION BY s_nationkey
                                 ORDER BY s_acctbal DESC, s_suppkey) AS BIGINT) AS rnk,
         COUNT(*) OVER (PARTITION BY s_nationkey) AS total
  FROM supplier
)
SELECT suppkey, name, nationkey, acctbal, rnk, total,
       ROUND(1e-9 + rnk * 100.0 / total, 4) AS pct
FROM ranked
WHERE rnk <= total * 0.25
ORDER BY nationkey, rnk
"""


@golden("demo4_window_toppct", DEMO4_ORACLE, tags=("window", "W1", "W2", "W4"), bench=True)
def demo4_window_toppct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    w = Window.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    wc = Window.partitionBy("s_nationkey")
    return (
        t.supplier.select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("name"),
            F.col("s_nationkey").alias("nationkey"),
            F.col("s_acctbal").alias("acctbal"),
            F.row_number().over(w).cast("long").alias("rnk"),
            F.count(F.lit(1)).over(wc).alias("total"),
        )
        .where(F.col("rnk") <= F.col("total") * 0.25)
        .withColumn("pct", _r(F.col("rnk") * 100.0 / F.col("total"), 4))
        .orderBy("nationkey", "rnk")
    )


# ---------------------------------------------------------------------------
# demo5 — composition key via sorted string-agg + theta self-join
# (Mofdb_Agent/agent.py:152-172, A5/J4). Driver realization: pairs of orders
# with the identical (partkey, quantity) multiset. The sorted aggregation is
# the determinism fix for SQLite's arrival-ordered GROUP_CONCAT; the theta
# self-join semantics (equi on composition + `o1 < o2` residual) execute as
# group-then-pair — see the in-function note on why not a literal self-join.
# ---------------------------------------------------------------------------

DEMO5_ORACLE = """
WITH comp AS (
  SELECT l_orderkey,
         string_agg(CAST(l_partkey AS VARCHAR) || ':' ||
                    CAST(CAST(FLOOR(l_quantity) AS INT) AS VARCHAR),
                    ',' ORDER BY l_partkey, FLOOR(l_quantity)) AS composition
  FROM lineitem GROUP BY l_orderkey
)
SELECT a.l_orderkey AS o1, b.l_orderkey AS o2, a.composition AS composition
FROM comp a JOIN comp b
  ON a.composition = b.composition AND a.l_orderkey < b.l_orderkey
ORDER BY o1, o2
"""


@golden("demo5_composition_selfjoin", DEMO5_ORACLE, tags=("join", "J4", "A5"), bench=True)
def demo5_composition_selfjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    comp = t.lineitem.groupBy("l_orderkey").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("l_partkey").alias("pk"),
                            # FLOOR on BOTH sides: a bare int cast truncates
                            # toward zero in Spark but ROUNDS in DuckDB
                            # (5.6 -> 5 vs 6) — latent divergence if the
                            # fixture ever gains fractional quantities
                            F.floor("l_quantity").cast("int").alias("q"),
                        )
                    )
                ),
                lambda s: F.concat_ws(
                    ":", s.getField("pk").cast("string"), s.getField("q").cast("string")
                ),
            ),
        ).alias("composition")
    )
    # Pair WITHIN composition groups instead of a self-join: Spark does not
    # reuse the aggregation exchange across the two join sides (measured:
    # no ReusedExchange fires), so the self-join form scans and aggregates
    # lineitem TWICE. Grouping by composition and exploding ordered pairs
    # costs one lineitem pass + one composition shuffle, no join. Pair
    # fan-out is quadratic in group size — same output cardinality as the
    # join, and composition groups are near-singletons by construction.
    grouped = comp.groupBy("composition").agg(
        F.array_sort(F.collect_list("l_orderkey")).alias("ids")
    )
    return (
        grouped.where(F.size("ids") >= 2)
        .select("composition", F.col("ids"), F.posexplode("ids").alias("i", "o1"))
        .select(
            "composition",
            "o1",
            F.explode(
                F.slice(
                    "ids", F.col("i") + 2, F.greatest(F.size("ids") - F.col("i") - 1, F.lit(0))
                )
            ).alias("o2"),
        )
        .select("o1", "o2", "composition")
        # NO trailing orderBy: a global sort of an unlimited result makes
        # the range partitioner SAMPLE the input, re-executing the pair
        # explode — measured 1.31s -> 1.01s at sf0.1 and 3.65s -> 2.20s at
        # 10x (PERFORMANCE.md finding 9). Result-set semantics are
        # unchanged (the driver compare is order-insensitive); ordering is
        # a presentation concern for the client.
    )


# ---------------------------------------------------------------------------
# demo6 — two-level re-aggregation + HAVING (Mofdb_Agent/agent.py:176-211
# temperature-coefficient analysis, A7/A3). Driver realization: per
# (part, ship-month) avg price, then per-part spread over the monthly avgs.
# ---------------------------------------------------------------------------

DEMO6_ORACLE = """
WITH monthly AS (
  SELECT l_partkey AS partkey,
         DATE_TRUNC('month', l_shipdate) AS month,
         AVG(l_extendedprice) AS avg_price
  FROM lineitem
  GROUP BY 1, 2
)
SELECT partkey,
       COUNT(*) AS n_months,
       ROUND(1e-9 + MIN(avg_price), 4) AS min_avg,
       ROUND(1e-9 + MAX(avg_price), 4) AS max_avg,
       ROUND(1e-9 + (MAX(avg_price) - MIN(avg_price)) / MIN(avg_price), 4) AS rel_spread
FROM monthly
GROUP BY partkey
HAVING COUNT(*) >= 3 AND MIN(avg_price) > 0
ORDER BY rel_spread DESC, partkey
LIMIT 20
"""


@golden("demo6_reagg_having", DEMO6_ORACLE, tags=("agg", "A7", "A3"), bench=True)
def demo6_reagg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    monthly = (
        t.lineitem.groupBy(
            F.col("l_partkey").alias("partkey"),
            F.date_trunc("month", F.col("l_shipdate")).alias("month"),
        ).agg(F.avg("l_extendedprice").alias("avg_price"))
    )
    return (
        monthly.groupBy("partkey")
        .agg(
            F.count(F.lit(1)).alias("n_months"),
            F.min("avg_price").alias("_min"),
            F.max("avg_price").alias("_max"),
        )
        .where((F.col("n_months") >= 3) & (F.col("_min") > 0))
        .select(
            "partkey",
            "n_months",
            _r("_min", 4).alias("min_avg"),
            _r("_max", 4).alias("max_avg"),
            _r((F.col("_max") - F.col("_min")) / F.col("_min"), 4).alias("rel_spread"),
        )
        .orderBy(F.desc("rel_spread"), "partkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# demo7 — global stats CROSS JOIN + normalized-diff outliers
# (Mofdb_Agent/agent.py:216-249, J5/A6/F1/F2). Driver realization: customer
# acctbal vs global avg/min/max; one-row aggregate is broadcast.
# ---------------------------------------------------------------------------

DEMO7_ORACLE = """
WITH stats AS (
  SELECT AVG(c_acctbal) AS avg_bal, MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal
  FROM customer
)
SELECT c_custkey AS custkey,
       c_acctbal AS acctbal,
       ROUND(1e-9 + (c_acctbal - s.avg_bal) / (s.max_bal - s.min_bal), 4) AS norm_diff,
       ROUND(1e-9 + ABS((c_acctbal - s.avg_bal) / (s.max_bal - s.min_bal)), 4) AS abs_diff
FROM customer CROSS JOIN stats s
WHERE s.max_bal > s.min_bal
ORDER BY abs_diff DESC, custkey
LIMIT 20
"""


@golden("demo7_global_outliers", DEMO7_ORACLE, tags=("agg", "J5", "A6"), bench=True)
def demo7_global_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    c = t.customer
    stats = c.agg(
        F.avg("c_acctbal").alias("avg_bal"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
    )
    norm = (F.col("c_acctbal") - F.col("avg_bal")) / (F.col("max_bal") - F.col("min_bal"))
    return (
        c.crossJoin(F.broadcast(stats))
        .where(F.col("max_bal") > F.col("min_bal"))
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_acctbal").alias("acctbal"),
            _r(norm, 4).alias("norm_diff"),
            _r(F.abs(norm), 4).alias("abs_diff"),
        )
        .orderBy(F.desc("abs_diff"), "custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# demo8 — multi-window stats per partition
# (MOFdb_SQL_vs_Traditional_Comparison.md:352-372, W2/W3). Driver
# realization: part price vs per-brand window aggregates, full output.
# ---------------------------------------------------------------------------

DEMO8_ORACLE = """
SELECT p_partkey AS partkey,
       p_brand AS brand,
       p_retailprice AS price,
       COUNT(*) OVER (PARTITION BY p_brand) AS brand_n,
       ROUND(1e-9 + AVG(p_retailprice) OVER (PARTITION BY p_brand), 4) AS brand_avg,
       ROUND(1e-9 + p_retailprice - AVG(p_retailprice) OVER (PARTITION BY p_brand), 4) AS diff_from_avg,
       ROUND(1e-9 + MAX(p_retailprice) OVER (PARTITION BY p_brand)
             - MIN(p_retailprice) OVER (PARTITION BY p_brand), 4) AS brand_range
FROM part
ORDER BY partkey
"""


@golden("demo8_multiwindow", DEMO8_ORACLE, tags=("window", "W2", "W3"), bench=True)
def demo8_multiwindow(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    wb = Window.partitionBy("p_brand")
    return (
        t.part.select(
            F.col("p_partkey").alias("partkey"),
            F.col("p_brand").alias("brand"),
            F.col("p_retailprice").alias("price"),
            F.count(F.lit(1)).over(wb).alias("brand_n"),
            _r(F.avg("p_retailprice").over(wb), 4).alias("brand_avg"),
            _r(F.col("p_retailprice") - F.avg("p_retailprice").over(wb), 4).alias(
                "diff_from_avg"
            ),
            _r(
                F.max("p_retailprice").over(wb) - F.min("p_retailprice").over(wb), 4
            ).alias("brand_range"),
        ).orderBy("partkey")
    )


# ---------------------------------------------------------------------------
# demo9 — 3-stage CTE selectivity matrix
# (MOFdb_SQL_vs_Traditional_Comparison.md:377-417, A7/A3/F2). Driver
# realization: per (supplier, returnflag) avgs -> multi-flag suppliers ->
# max/min ratio.
# ---------------------------------------------------------------------------

DEMO9_ORACLE = """
WITH pairs AS (
  SELECT l_suppkey AS suppkey, l_returnflag AS flag, AVG(l_extendedprice) AS avg_price
  FROM lineitem GROUP BY 1, 2
),
multi AS (
  SELECT suppkey FROM pairs GROUP BY suppkey HAVING COUNT(*) >= 2
)
SELECT p.suppkey AS suppkey,
       COUNT(*) AS n_flags,
       ROUND(1e-9 + MAX(p.avg_price), 4) AS max_avg,
       ROUND(1e-9 + MIN(p.avg_price), 4) AS min_avg,
       ROUND(1e-9 + MAX(p.avg_price) / MIN(p.avg_price), 4) AS ratio
FROM pairs p JOIN multi m ON p.suppkey = m.suppkey
GROUP BY p.suppkey
ORDER BY ratio DESC, suppkey
LIMIT 20
"""


@golden("demo9_selectivity_matrix", DEMO9_ORACLE, tags=("agg", "A7", "A3"), bench=True)
def demo9_selectivity_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    pairs = t.lineitem.groupBy(
        F.col("l_suppkey").alias("suppkey"), F.col("l_returnflag").alias("flag")
    ).agg(F.avg("l_extendedprice").alias("avg_price"))
    multi = pairs.groupBy("suppkey").agg(F.count(F.lit(1)).alias("nf")).where(F.col("nf") >= 2)
    return (
        pairs.join(multi.select("suppkey"), "suppkey", "left_semi")
        .groupBy("suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_flags"),
            _r(F.max("avg_price"), 4).alias("max_avg"),
            _r(F.min("avg_price"), 4).alias("min_avg"),
            _r(F.max("avg_price") / F.min("avg_price"), 4).alias("ratio"),
        )
        .orderBy(F.desc("ratio"), "suppkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# semi/anti joins — exposed beyond the reference (SURVEY.md §2.3 note):
# the reference expresses anti-semantics as NOT-filters; Spark has first-class
# left_semi / left_anti.
# ---------------------------------------------------------------------------

SEMI_ORACLE = """
SELECT c_custkey AS custkey, c_name AS name, c_acctbal AS acctbal
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
ORDER BY custkey
"""


@golden("join_semi_customers_with_orders", SEMI_ORACLE, tags=("join", "semi"))
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return (
        t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("c_acctbal").alias("acctbal"),
        )
        .orderBy("custkey")
    )


ANTI_ORACLE = """
SELECT c_custkey AS custkey, c_name AS name, c_acctbal AS acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
ORDER BY custkey
"""


@golden("join_anti_customers_without_orders", ANTI_ORACLE, tags=("join", "anti"))
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return (
        t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("c_acctbal").alias("acctbal"),
        )
        .orderBy("custkey")
    )


def bench_queries() -> dict[str, GoldenQuery]:
    return {k: v for k, v in GOLDEN.items() if v.bench}


# Extended bench set: the round-5 heavy operator families (fuzzy join,
# graph, ER linkage, winnowing overlap ranking, BPE training, LSH
# clustering). Kept OUT of the headline `bench` flag so the headline
# total stays comparable across rounds 1-6; bench.py reports them under
# a separate "extended" key (best-of-1 — these run 5-35 s each at sf0.1,
# so best-of-3 would triple the driver's bench wall clock for queries
# whose run-to-run noise is already amortized by their length).
BENCH_EXTENDED: tuple[str, ...] = (
    "fuzzy_name_join_k2",
    "triangle_counts_copurchase",
    "label_propagation_communities",
    "er_best_match_linkage",
    "winnowing_overlap_topk",
    "bpe_train_merges_corpus",
    "lsh_single_linkage_clusters",
)


def bench_extended_queries() -> dict[str, GoldenQuery]:
    return {k: GOLDEN[k] for k in BENCH_EXTENDED}


# register parts 2-3 of the corpus (pipeline operators, parametric
# builders); imports are at the bottom because both use this module's
# decorator
from mr_dice_spark import golden_pipeline  # noqa: E402,F401  isort:skip
from mr_dice_spark import golden_builders  # noqa: E402,F401  isort:skip
from mr_dice_spark import golden_multimodal  # noqa: E402,F401  isort:skip
from mr_dice_spark import golden_tpch  # noqa: E402,F401  isort:skip
from mr_dice_spark import golden_olap  # noqa: E402,F401  isort:skip
from mr_dice_spark import golden_structures  # noqa: E402,F401  isort:skip
from mr_dice_spark import golden_web  # noqa: E402,F401  isort:skip
from mr_dice_spark import golden_training  # noqa: E402,F401  isort:skip
from mr_dice_spark import golden_quality  # noqa: E402,F401  isort:skip
