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
# in dict order. Round 1 proved the demo/core-SQL prefix green, so this
# round rotates the window: queries changed this round come first (their
# fixes need the driver's hard signal), then the operators whose covering
# goldens sat past the round-1 cap. Everything else stays oracle-checked
# by tests/test_golden.py regardless of position.
_CHECK_FIRST = [
    # flagship (also entry())
    "q01_pricing_summary",
    # changed or added this round — need driver re-verification
    "events_sessionize",
    "jaccard_similarity_join",
    "heavy_hitters_cms_events",
    "structure_near_dup_openlam",
    "energy_above_hull_probe",
    "repetition_stats_per_doc",
    "unigram_lm_quality",
    "q12_shipping_delay",
    "pivot_event_counts",
    "multimodal_audio_stats",
    "resample_ffill_hourly",
    # LLM-pipeline flagships past the round-1 cap
    "tfidf_top_terms_per_doc",
    "benchmark_decontamination",
    "sequence_packing_spans",
    "corpus_curation_pipeline",
    "mixture_sample_by_lang",
    "pii_redaction_probe",
    "line_dedup_boilerplate",
    "duplicate_span_ratio",
    "cosine_topk_batch_queries",
    # streaming trio (§2.10)
    "streaming_hourly_window",
    "streaming_sliding_window",
    "streaming_session_window",
    # parametric builders + dialect/dim/scalar operators (S3-S5, P9-P19, F8, F15)
    "param_mofdb_range_fetch",
    "param_openlam_time_window",
    "param_bohrium_fuzzy_page",
    "spacegroup_dim_join",
    "formation_energy_openlam",
    # subquery / set-op / OLAP shapes past the cap
    "exists_chain_big_spenders",
    "union_all_sources_agg",
    "correlated_above_type_avg",
    "setop_intersect_custkeys",
    # setop_except rotates to the suite (same set-op family as intersect,
    # and set_except_lapsed_customers keeps the shape suite-checked)
    "cube_status_priority",
    # grouping-sets family stays covered by cube_status_priority in-window
    # and grouping_sets_event_bands in the suite; winnowing (brief-listed
    # rolling-hash fingerprinting) takes the slot
    "winnowing_fingerprints_portable",
    "percentile_value_by_type",
    # pivot family stays covered in-window by pivot_event_counts; the
    # composed crawl pipeline (url dedup -> quality -> domain quota)
    # takes the slot
    "crawl_curation_pipeline",
    "scd2_user_event_history",
    # window families past the cap
    "window_running_totals",
    "window_ranking_family",
    "window_lag_lead_deltas",
    # multimodal (§2.9)
    "multimodal_image_probe",
    "multimodal_frame_sample",
    # hardest TPC-H shapes
    "q02_min_cost_supplier",
    "q11_important_stock",
    "q19_disjunctive_bands",
    "q21_waiting_supplier",
    # round-2 additions: new operator families get the hard signal first;
    # q13/q17 rotate to the suite (outer-join/correlated shapes remain
    # covered in-window by q02/q11/q19/q21 and the demo corpus history)
    "url_normalize_canonical",
    "url_dedup_survivors",
    "cosine_topk_ivf_fixed_oracle",
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
