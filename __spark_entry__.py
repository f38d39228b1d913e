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
# in dict order. Round-12 window, exactly as VERDICT r11 next-#3 amends
# the pre-planned rotation: 1 flagship + the 11 goldens whose OPERATOR
# PATHS WERE REWRITTEN in optimization round 11 (winnowing count-join,
# fuzzy k=2 verify-below-exchange/shift-tightening, graph adjacency
# intersection + shuffle_hash sweeps + co-purchase edge build) — only 3
# of the 14 rewritten goldens sat in the r11 window, so the other 11
# lead this one for an independent driver re-check — + the 20 round-11
# golden additions (never driver-checked, landing order) + the 14
# leftover r4-latest rows (age 8, the oldest cohort) + the first 4
# alphabetical r5-latest rows. 1 + 11 + 20 + 14 + 4 = 50 exactly.
# Every slot is ORACLE-CHECKABLE (VERDICT r11 next-#4: the r11 window
# spent 4 slots on rows-only queries the driver can only score
# "no_oracle"; those queries are property-tested in CI and their rows
# are fresh as of r11, so no slot is burned on them here).
#
# SUSTAINABILITY NOTE: tests/test_coverage.py derives the freshness
# horizon from corpus size (ceil((N-1)/49)+1 rounds — the provably
# achievable round-robin period plus one round of slack) and asserts
# NEXT round's window arithmetic stays feasible. The ROUND-13 WINDOW is
# pre-planned: 1 flagship + any round-12 golden additions (never-checked
# lead the queue; this optimization round adds none) + the remaining 45
# r5-latest rows alphabetically to fill 50 (age 8 at round 13, inside
# the horizon of 9).
_CHECK_FIRST = [
    # flagship (also entry())
    "q01_pricing_summary",
    # --- the 11 r11-REWRITTEN goldens not driver-checked since their
    #     rewrite (VERDICT r11 next-#3; attested so far only by the
    #     builder's full-corpus sweeps + CI):
    "winnowing_overlap_pairs",
    "winnowing_overlap_topk",
    "fuzzy_name_join_k2",
    "er_best_match_linkage",
    "triangle_counts_copurchase",
    "kcore_copurchase_parts",
    "label_propagation_communities",
    "community_modularity_copurchase",
    "adamic_adar_link_prediction",
    "degree_assortativity_copurchase",
    "clustering_coefficient_copurchase",
    # --- ROUND-12 WINDOW QUEUE: the 20 round-11 golden additions,
    #     landing order (never driver-checked before this round):
    "kuiper_value_weekend_by_type",
    "ad_value_weekend_by_type",
    "bartlett_daily_value_by_weekday",
    "cox_stuart_daily_value_by_type",
    "theils_u2_hourly_value_by_type",
    "ansari_value_weekend_by_type",
    "quade_weekday_value_by_type",
    "streaming_theils_u2_monitor",
    "lepage_value_weekend_by_type",
    "brunner_munzel_value_weekend_by_type",
    "wilcoxon_signed_even_odd_by_type",
    "bowker_user_band_weekend_by_type",
    "partial_corr_weekend_given_volume",
    "pettitt_change_day_by_type",
    "somers_d_hour_value_by_type",
    "dunn_posthoc_value_by_weekday",
    "stuart_maxwell_band_shift_by_type",
    "conover_scale_hourly_by_type",
    "streaming_pettitt_monitor",
    "seasonal_mk_hourly_by_type",
    # --- the 14 leftover r4-latest goldens (age 8, the oldest cohort;
    #     computed from the union of CORRECTNESS_r01-r11):
    "multimodal_frame_sample",
    "ngram_novelty_by_doc",
    "profile_events_columns",
    "quality_bucketed_mixture",
    "shuffle_shards_training_order",
    "snapshot_diff_incremental",
    "streaming_static_enrichment",
    "streaming_upsert_snapshot",
    "streaming_user_value_ema",
    "text_analysis_stats",
    "theta_overlap_event_types",
    "unicode_nfc_dedup",
    "vocab_oov_audit",
    "window_trailing_range_sum",
    # --- the first 4 alphabetical r5-latest goldens (fill to 50):
    "audio_tone_detection",
    "bigram_lm_quality",
    "bloom_decontamination_prescreen",
    "bpe_train_merges_corpus",
    # ROUND-13 WINDOW QUEUE: (names of any never-driver-checked goldens
    # are appended here in the same commit that lands each new golden —
    # tests/test_coverage.py parses this comment. This optimization
    # round adds no goldens, so the queue is empty; round 13 = 1
    # flagship + the remaining 45 r5-latest rows alphabetically + 4
    # r6-latest rows to fill 50.)
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
