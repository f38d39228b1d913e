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
# in dict order. Rounds 1-3 drove 141 distinct goldens green; this
# round's window leads with the 7 goldens that never had a driver row
# (closing lifetime coverage of the pre-round-4 corpus), then every
# query added or changed this round, then 28 rows last verified in
# round 1 (bench headliners + the CDC/components/LSH/quota/OPTIMADE
# families). Everything displaced is r2/r3-green and stays
# oracle-checked by tests/test_golden.py regardless of position.
_CHECK_FIRST = [
    # flagship (also entry())
    "q01_pricing_summary",
    # --- the 7 goldens never driver-checked through round 3 (closing
    # lifetime coverage of the pre-round-4 corpus)
    "corpus_datasheet",
    "embedding_outlier_flags",        # also changed: sd=0 z guard (r3 advice)
    "image_ahash_dedup",
    "kll_quantiles_daily_rollup",
    "multimodal_avi_sample_extraction",  # also changed: avih chunk cap
    "quality_bucketed_mixture",
    "shuffle_shards_training_order",
    # --- added this round
    "gopher_quality_gate",            # Gopher document rules
    "c4_line_cleaning",               # C4 line filter (narrow map)
    "bpe_pair_merge_stats",           # tokenizer pair counts
    "ngram_novelty_by_doc",           # first-seen trigram novelty
    "vocab_oov_audit",                # top-K vocabulary OOV rate
    "cluster_keep_best_copy",         # keep-longest cluster dedup
    "streaming_user_value_ema",       # applyInPandasWithState, full parity
    "snapshot_diff_incremental",      # added/removed/changed audit
    "profile_events_columns",         # exact column profile, one pass
    "doc_length_histogram",           # fixed-range length histogram
    "ann_recall_audit_ivf",           # measured IVF recall@10
    "mixture_upsample_epochs_lang",   # fractional-epoch upsampling
    "streaming_static_enrichment",    # stream-static broadcast join
    "crawl_quality_tokenizer_report", # c4->gate->dedup->OOV composition
    "fuzzy_name_join_customers",      # edit-distance-1 pigeonhole join
    "link_authority_pagerank",        # iterative graph ranking
    "minhash_recall_audit_curve",     # measured LSH banding S-curve
    "compression_ratio_signal",       # zlib signal (rows-only)
    "unicode_nfc_dedup",              # NFC normalize + dedup (UDF vs builtin)
    "streaming_upsert_snapshot",      # foreachBatch CDC sink, full parity
    "window_trailing_range_sum",      # rangeBetween trailing frame
    # --- changed this round
    "theta_overlap_event_types",      # NULL group keys excluded up front
    "multimodal_frame_sample",        # avi_sample_slices cap in its path
    # --- r1-only re-verification: these 19 were last driver-checked in
    # round 1; re-verify the bench headliners and the highest-complexity
    # operator families (CDC, components, LSH families, quota, OPTIMADE).
    # Everything displaced is r2/r3-green and stays covered by
    # tests/test_golden.py under the identical compare.
    "demo1_and_containment",
    "demo3_cte_ratio",
    "demo4_window_toppct",
    "demo6_reagg_having",
    "demo7_global_outliers",
    "demo8_multiwindow",
    "demo9_selectivity_matrix",
    "events_hourly_window",
    "events_asof_join",
    "interval_join_error_windows",
    "minhash_lsh_dedup_survivors",
    "text_analysis_stats",
    "cosine_topk_bruteforce",
    "cdc_apply_changes_snapshot",
    "cdc_latest_snapshot",
    "dedup_connected_clusters",
    "embedding_near_dup_pairs",
    "fair_quota_topk_events",
    "incremental_dedup_two_batches",
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
