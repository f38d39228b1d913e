"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``mr_dice_spark``; the golden corpus (Spark plan +
oracle SQL pairs) is registered in ``mr_dice_spark.golden.GOLDEN``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mr_dice_spark.golden import GOLDEN  # noqa: E402

# The driver's CORRECTNESS check covers the first 50 entries of queries()
# in dict order. Round-10 window, exactly as VERDICT r9 next-#1 (and the
# pre-plan written here in round 9) prescribes: 1 flagship + the 11
# round-9 golden additions (the documented ROUND-10 WINDOW QUEUE, never
# driver-checked, landing order — all 11 judge-verified green against
# DuckDB in the r9 review plus a 52-compare fresh-process flake campaign)
# + all 38 remaining goldens whose latest driver row is round 3
# (alphabetical; age 7 at round 10, one round inside the derived horizon
# of 8). 1 + 11 + 38 = 50 exactly. A green CORRECTNESS_r10.json on this
# window reaches lifetime driver coverage 344/344 of the pre-round-10
# corpus AND resets every golden's freshness to <= r4 age. Everything
# displaced is r4-r9-green and stays oracle-checked every CI run by
# tests/test_golden.py under the identical DuckDB compare.
#
# SUSTAINABILITY NOTE: tests/test_coverage.py derives the freshness
# horizon from corpus size (ceil((N-1)/49)+1 rounds — the provably
# achievable round-robin period plus one round of slack) and asserts
# NEXT round's window arithmetic stays feasible. After round 10 the
# oldest surviving rows are the round-4 cohort (age 7 at round 11,
# within the horizon), so the ROUND-11 WINDOW is pre-planned at the
# bottom of this list: 1 flagship + any round-10 golden additions
# (never-checked, lead the queue) + r4-latest rows oldest-first
# alphabetically to fill 50.
_CHECK_FIRST = [
    # flagship (also entry())
    "q01_pricing_summary",
    # --- ROUND-10 WINDOW QUEUE: the 11 round-9 golden additions,
    #     landing order (never driver-checked before this round):
    "compression_ratio_fixed_oracle",
    "durbin_watson_daily_value_by_type",
    "ljung_box_daily_value_by_type",
    "runs_test_daily_value_by_type",
    "gumbel_daily_max_value_by_type",
    "hellinger_tvd_weekend_value_bands",
    "friedman_weekday_value_by_type",
    "icc_user_bucket_value_by_type",
    "lins_ccc_even_odd_days_by_type",
    "lorenz_value_deciles_by_type",
    "ols_influence_daily_value_by_type",
    # --- the 38 r3-latest goldens, alphabetical (computed from the
    #     union of CORRECTNESS_r01-r09; VERDICT r9 next-#1):
    "grouping_sets_event_bands",
    "grouping_sets_events",
    "heavy_hitters_cms_events",
    "hll_rollup_distinct_users",
    "jaccard_similarity_join",
    "length_outlier_filter",
    "multimodal_sample_extraction",
    "multimodal_video_probe",
    "percentiles_value_by_type",
    "pivot_returnflag_status",
    "pq_topk_adc",
    "q03_shipping_priority",
    "q04_order_priority",
    "q05_local_supplier_volume",
    "q06_forecast_revenue",
    "q07_volume_shipping",
    "q08_market_share",
    "q09_product_profit",
    "q10_returned_items",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_diversity",
    "q17_small_quantity",
    "q18_large_volume_customer",
    "q20_excess_shipments",
    "q22_sales_opportunity",
    "rollup_pricing_subtotals",
    "semantic_dedup_planted",
    "set_except_lapsed_customers",
    "set_intersect_repeat_customers",
    "setop_except_custkeys",
    "split_contamination_audit",
    "streaming_dedup_keys",
    "streaming_interval_join_pairs",
    "token_budget_sample_by_lang",
    "train_split_assign",
    "winnowing_boilerplate_spans",
    "winnowing_overlap_pairs",
    # ROUND-11 WINDOW QUEUE: round-10 golden additions (never
    # driver-checked; they lead the round-11 rotation, landing order):
    # (names are appended here in the same commit that lands each new
    # golden — tests/test_coverage.py parses this comment.)
    # cvm_value_weekend_by_type
    # energy_dist_value_weekend_by_type
    # grubbs_daily_value_by_type
    # moods_median_value_by_weekday
    # pacf_daily_value_by_type
    # hurst_hourly_value_by_type
    # dispersion_daily_counts_by_type
    # jt_weekly_value_trend_by_type
    # mood_scale_value_weekend_by_type
    # hampel_outliers_hourly_by_type
    # streaming_hampel_monitor
    # page_trend_weekly_by_weekday
    # kpss_daily_value_by_type
    # Round-11 window = 1 flagship + that 13-golden queue + the first
    # 36 alphabetical r4-latest goldens = 50 slots exactly. The r4
    # cohort holds 49 rows, so 13 r4 rows roll to round 12 at age 8 —
    # inside the corpus-derived horizon of 9 (N = 357 goldens ->
    # ceil(356/49)+1), as tests/test_coverage.py's feasibility guard
    # verifies.
]


def _ordered() -> list[str]:
    head = [n for n in _CHECK_FIRST if n in GOLDEN]
    return head + [n for n in GOLDEN if n not in set(head)]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary, TPC-H Q1 shape) on sf0.001."""
    return GOLDEN["q01_pricing_summary"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: GOLDEN[name].spark for name in _ordered()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query; omitted entries get the
    driver's weaker rows-only check (non-SQL-expressible operators)."""
    return {name: GOLDEN[name].oracle for name in _ordered() if GOLDEN[name].oracle is not None}
