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
# in dict order. Round-9 window, exactly as VERDICT r8 next-#1 prescribes:
# 1 flagship + ALL 40 never-driver-checked goldens (the documented
# ROUND-9 WINDOW QUEUE: 26 round-7 leftovers in landing order, then the
# 14 round-8 additions in landing order) + the 9 pre-planned spares (the
# first 9 alphabetical goldens whose latest driver row is round 3).
# 1 flagship + 40 queue + 9 spares = 50. A green CORRECTNESS_r09.json on
# this window makes lifetime driver coverage 333/333 for the first time
# (every pre-round-9 golden will hold at least one driver row; 24 of the
# 40 queue entries were additionally judge-verified green against DuckDB
# in the round-8 review). Everything displaced is r3-r8-green and stays
# oracle-checked every CI run by tests/test_golden.py under the
# identical DuckDB compare.
#
# SUSTAINABILITY NOTE: tests/test_coverage.py derives the freshness
# horizon from corpus size (ceil((N-1)/49)+1 rounds — the provably
# achievable round-robin period plus one round of slack) and asserts
# NEXT round's window arithmetic stays feasible. After round 9 the
# oldest surviving rows are the 38 remaining r3 goldens (age 7 at round
# 10, within the derived horizon of 8), so the ROUND-10 WINDOW is
# pre-planned at the bottom of this list: 1 flagship + the round-9
# additions (never-checked, lead the queue) + the remaining r3 rows,
# oldest-first alphabetically, to fill 50.
_CHECK_FIRST = [
    # flagship (also entry())
    "q01_pricing_summary",
    # --- ROUND-9 WINDOW QUEUE part 1: the 26 round-7 leftovers,
    #     landing order (never driver-checked before this round):
    "cochran_armitage_purchase_by_weekday",
    "distinct_ngram_diversity_by_lang",
    "kendall_tau_weekday_value_band",
    "degree_assortativity_copurchase",
    "kruskal_wallis_value_by_type",
    "retrieval_eval_purchase_topk",
    "clustering_coefficient_copurchase",
    "page_hinkley_drift_daily",
    "seasonal_decompose_daily_cycle",
    "term_burstiness_documents",
    "unigram_kl_by_lang",
    "streaming_page_hinkley",
    "logrank_time_to_purchase_arms",
    "cronbach_alpha_user_engagement",
    "mann_kendall_trend_hourly",
    "randomization_test_user_value",
    "weighted_median_price_by_flag",
    "misra_gries_topk_audit_tokens",
    "user_active_coverage",
    "correlation_matrix_lineitem",
    "covariate_balance_experiment_arms",
    "hodges_lehmann_weekend_shift",
    "llr_collocations_top",
    "rfm_segments_users",
    "uncertainty_coeffs_type_weekday",
    "rmst_time_to_purchase",
    # --- ROUND-9 WINDOW QUEUE part 2: the 14 round-8 additions,
    #     landing order (all judge-verified green in the r8 review):
    "effect_size_weekend_by_type",
    "bh_fdr_weekday_conversion",
    "cochran_q_high_value_types",
    "fleiss_kappa_value_bands",
    "changepoint_daily_value_by_type",
    "pq_topk_fixed_oracle",
    "nelson_aalen_time_to_purchase",
    "did_monthhalf_value_by_arm",
    "mantel_haenszel_highvalue_by_type",
    "chow_break_daily_value_by_type",
    "jaro_winkler_name_pairs",
    "w1_value_weekend_by_type",
    "kendalls_w_bucket_rank_by_type",
    "uplift_curve_purchase_by_cohort",
    # --- the 9 pre-planned spares: first 9 alphabetical r3-latest rows
    #     (computed from CORRECTNESS_r01-r08; VERDICT r8 next-#1):
    "approx_distinct_users_daily",
    "boilerplate_removal_cleaned",
    "cosine_topk_ivf_pq_approx",
    "cosine_topk_truncate_rerank",
    "crawl_curation_pipeline",
    "cube_order_status_priority",
    "demo5_composition_selfjoin",
    "document_chunking_windows",
    "embedding_int8_quantize",
    # ROUND-10 WINDOW QUEUE: the round-9 golden additions (never
    # driver-checked; they lead the round-10 rotation, landing order):
    # compression_ratio_fixed_oracle
    # durbin_watson_daily_value_by_type
    # ljung_box_daily_value_by_type
    # runs_test_daily_value_by_type
    # gumbel_daily_max_value_by_type
    # hellinger_tvd_weekend_value_bands
    # friedman_weekday_value_by_type
    # icc_user_bucket_value_by_type
    # lins_ccc_even_odd_days_by_type
    # lorenz_value_deciles_by_type
    # ols_influence_daily_value_by_type
    # Round-10 window = 1 flagship + that 11-golden queue + all 38
    # remaining r3-latest goldens alphabetically
    # (grouping_sets_event_bands, grouping_sets_events,
    # heavy_hitters_cms_events, ... through the r3 cohort) = 50 slots
    # exactly, as tests/test_coverage.py's feasibility guard verifies.
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
