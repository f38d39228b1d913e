"""Scale-up probe: replicate the sf0.1 tables Nx and measure operator
scaling (internal perf harness — NOT part of the driver contract).

The driver's largest fixture is sf0.1 (~600 k lineitem rows). To check the
100 TB story empirically rather than by argument, this script fabricates an
~sfN fixture by unioning N key-shifted copies of sf0.1 into /tmp parquet,
then times a representative operator slice at both scales. A healthy
operator shows ~Nx wall clock (linear in input) — anything superlinear is a
hazard (quadratic candidate growth, driver-side materialization, a global
sort) and gets investigated.

Run: python tools/scale_probe.py [N] [probe ...]   (default N=10, all PROBES)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

from pyspark.sql import DataFrame, functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mr_dice_spark.catalog import Catalog  # noqa: E402
from mr_dice_spark.golden import GOLDEN  # noqa: E402
from mr_dice_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# (table, key columns to shift so replicas don't collide)
SHIFT = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    # dimensions stay single-copy: part/supplier/nation/region
}

PROBES = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q09_product_profit",
    "q10_returned_items",
    "q21_waiting_supplier",
    "events_sessionize",
    "events_hourly_window",
    "minhash_lsh_dedup_survivors",
    "jaccard_similarity_join",
    "text_analysis_stats",
    "cosine_topk_bruteforce",
    "scd2_user_event_history",
    "resample_ffill_hourly",
    "demo5_composition_selfjoin",
    # round-3 training-data operators
    "train_split_assign",
    "length_outlier_filter",
    "embedding_int8_quantize",
    "cosine_topk_truncate_rerank",
    "token_budget_sample_by_lang",
    "split_contamination_audit",
    "hll_rollup_distinct_users",
    "theta_overlap_event_types",
    # round-4 quality/observability operators
    "gopher_quality_gate",
    "c4_line_cleaning",
    "bpe_pair_merge_stats",
    "ngram_novelty_by_doc",
    "vocab_oov_audit",
    "cluster_keep_best_copy",
    "snapshot_diff_incremental",
    "profile_events_columns",
    "doc_length_histogram",
    "ann_recall_audit_ivf",
    "link_authority_pagerank",
    "unicode_nfc_dedup",
    "crawl_quality_tokenizer_report",
    "minhash_recall_audit_curve",
    # round-5 operators. NOTE on replicated fixtures: copies shift KEYS
    # but not CONTENT, so every document/name exists 10x — pair-output
    # operators (fuzzy join, overlap ranking) see ~quadratic-in-copies
    # TRUE output on this fixture, like demo5; their ratios measure
    # output volume, not candidate blow-up.
    "temperature_mixture_sample_lang",
    "weighted_sample_by_length",
    "profile_approx_audit",
    "quarantine_ingest_audit",
    "kmeans_embedding_clusters",
    "bloom_decontamination_prescreen",
    "jpeg_decode_ahash_dedup",
    "fuzzy_name_join_customers",
    "events_funnel_conversion",
    "events_transition_matrix",
    "winsorize_values_by_type",
    "mad_outliers_by_type",
    "recursive_hierarchy_chain",
    "cluster_balanced_subsample",
    "hard_negative_mining_labels",
    "length_bucketed_batches_docs",
    # round-5 continuation operators. embedding_single_linkage is NOT
    # probed: its golden deliberately uses the exact all-pairs edge
    # generator (cosine_pairs_exact — O(n^2) by contract, with a
    # max_rows circuit breaker), so a 10x probe measures the documented
    # quadratic wall, not the operator; the scale path feeds
    # single_linkage_clusters banded LSH/IVF candidate pairs, whose
    # component stage is the already-probed connected-components shape
    # (cluster_keep_best_copy / dedup_connected_clusters).
    "jpeg_progressive_decode_dedup",
    "events_pattern_match",
    "value_drift_psi_events",
    "streaming_psi_drift",
    "bigram_lm_quality",
    "pmi_collocations_top",
    "quality_percentile_blend_docs",
    "ngram_containment_subset_dedup",
    "kfold_assign_docs",
    "gif_decode_ahash_dedup",
    "corpus_distinct_ngram_diversity",
    "frequent_event_itemsets",
    "lsh_single_linkage_clusters",
    "ccnet_perplexity_buckets",
    "bpe_train_merges_corpus",
    "ks_drift_events",
    "hybrid_retrieval_rrf",
    "mmr_diversified_topk",
    "ols_trend_by_event_type",
    "purchase_touch_attribution",
    "session_path_topk",
    # round-5 session-3 operators. mjpeg_frame_decode_dedup is NOT
    # probed separately: its cost shape is jpeg_decode_ahash_dedup's
    # (per-frame entropy decode, linear in frames) plus the already-
    # probed AVI container walk.
    "interpolate_linear_hourly",
    "audio_tone_detection",
    "triangle_counts_copurchase",
    "dsir_importance_select_en",
    # round-5 session-4 operators. er_best_match_linkage carries the
    # replicated-fixture caveat in the note above TWICE over: names are
    # content (not shifted), so every clean name exists 10x and every
    # dirty twin matches all 10 copies — output is quadratic in copies
    # by construction; the probe measures that output volume plus the
    # hot-block refinement's detection pass, not candidate blow-up.
    "label_propagation_communities",
    "spearman_value_time_by_type",
    "bradley_terry_brand_prefs",
    "cusum_level_shift_hourly",
    "streaming_cusum_monitor",
    "theil_sen_trend_hourly",
    "benford_first_digit_orders",
    "gini_value_concentration",
    "gini_approx_audit",
    "chi2_type_by_weekday",
    "er_best_match_linkage",
    # round-5 session-4 continuation. er_linkage_bcubed/_ari share the
    # er_best_match probe's shape (the metric tail is cell-sized);
    # minhash_precision_audit shares the recall curve's (already
    # probed via minhash_recall_audit_curve + the candidate-verify
    # join is output-bound on the replicated fixture).
    "bpe_encode_fertility_by_lang",
    "skyline_cheapest_smallest_parts",
    "welch_t_weekend_split",
    "heaps_law_vocab_growth",
    "rolling_median_value_hourly",
    "expectations_orders_contract",
    "time_weighted_avg_by_type",
    "trailing_distinct_users_hourly",
    "kaplan_meier_time_to_purchase",
    "association_rules_events",
    # round-6 operators. exact_repeated_spans carries the replicated-
    # fixture caveat at full strength: content is copied 10x, so EVERY
    # position is part of a cross-doc repeat — the probe measures the
    # total-duplication regime (candidate coverage = whole corpus, the
    # operator's documented worst case, still linear per position),
    # not the sparse-boilerplate case the candidate bound targets.
    "t_closeness_customer_release",
    "approx_distinct_audit_daily",
    "kll_quantiles_audit_global",
    "exact_repeated_spans_documents",
    # round-7 operators. Bucket-grid detectors (page_hinkley, seasonal
    # decompose, mann_kendall, cross_correlation, seasonal_naive,
    # pinball) keep a CONSTANT bucket table under replication — replicas
    # share the fixture's time span — so their probe measures the one
    # corpus-sized bucket aggregate plus a fixed-size tail; graph probes
    # (adamic_adar, clustering_coefficient, degree_assortativity) carry
    # the triangle_counts density caveat on the default fixture (use
    # --sparse for the honest exponent); ahash/png decode shapes were
    # probed via the jpeg twins.
    "adamic_adar_link_prediction",
    "anova_value_by_type",
    "average_precision_value_by_type",
    "brier_decomposition_events",
    "brown_forsythe_value_by_type",
    "clustering_coefficient_copurchase",
    "cochran_armitage_purchase_by_weekday",
    "cronbach_alpha_user_engagement",
    "cross_correlation_purchase_view",
    "decile_lift_value_by_type",
    "degree_assortativity_copurchase",
    "distinct_ngram_diversity_by_lang",
    "eb_shrunk_return_rates_brand",
    "jackknife_value_ci_by_type",
    "jarque_bera_value_by_type",
    "js_divergence_purchase_values",
    "kendall_tau_weekday_value_band",
    "kruskal_wallis_value_by_type",
    "logrank_time_to_purchase_arms",
    "mann_kendall_trend_hourly",
    "mann_whitney_purchase_by_weekday",
    "mcnemar_model_compare",
    "ndcg_user_ranking_by_type",
    "page_hinkley_drift_daily",
    "pinball_loss_seasonal_naive",
    "png_decode_ahash_dedup",
    "post_stratified_effect_weekday",
    "randomization_test_user_value",
    "rbo_value_vs_count_leaderboards",
    "readability_flesch_documents",
    "retrieval_eval_purchase_topk",
    "seasonal_decompose_daily_cycle",
    "seasonal_naive_backtest_hourly",
    "simpson_lang_diversity_by_source",
    "sprt_high_value_rate_monitor",
    "streaming_js_divergence",
    "streaming_page_hinkley",
    "term_burstiness_documents",
    "two_proportion_z_conversion",
    "unigram_kl_by_lang",
    "vocab_richness_documents",
    "wilson_ci_high_value_rate",
    "weighted_median_price_by_flag",
    "misra_gries_topk_audit_tokens",
    "user_active_coverage",
    "correlation_matrix_lineitem",
    "hodges_lehmann_weekend_shift",
    "covariate_balance_experiment_arms",
    "llr_collocations_top",
    "rfm_segments_users",
    "uncertainty_coeffs_type_weekday",
    "rmst_time_to_purchase",
    # round-8 additions
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
    # round-9 additions (daily-bucket detectors scale like the round-7
    # bucket-grid family: the frame is span-bounded, so x10 rows mostly
    # deepens the bucket aggregate, not the per-key series)
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
    "compression_ratio_fixed_oracle",
    # round-10 drift-family additions (value-cell frames: x10 rows add
    # few new distinct values, so cells deepen, not widen)
    "cvm_value_weekend_by_type",
    "energy_dist_value_weekend_by_type",
    "grubbs_daily_value_by_type",
    "moods_median_value_by_weekday",
    "pacf_daily_value_by_type",
    "hurst_hourly_value_by_type",
    "dispersion_daily_counts_by_type",
    "jt_weekly_value_trend_by_type",
    "mood_scale_value_weekend_by_type",
    "hampel_outliers_hourly_by_type",
    "page_trend_weekly_by_weekday",
    "kpss_daily_value_by_type",
    # round-11 additions (same value-cell / bucketed frames)
    "kuiper_value_weekend_by_type",
    "ad_value_weekend_by_type",
    "bartlett_daily_value_by_weekday",
    "cox_stuart_daily_value_by_type",
    "theils_u2_hourly_value_by_type",
    "ansari_value_weekend_by_type",
    "quade_weekday_value_by_type",
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
    "seasonal_mk_hourly_by_type",
]


def build_scaled(spark, factor: int, out_dir: str, sparse: bool = False) -> None:
    """``sparse=True`` builds the DENSITY-HONEST variant for graph/text
    probes: the default replication shifts lineitem order keys but not
    part keys, so the co-purchase graph gets factor-times DENSER over
    the same 2 000 parts (degrees — and wedge work — grow with the
    factor, which real TPC-H scaling does not do: parts scale with
    lineitem). The sparse build additionally shifts l_partkey (replicas
    become disjoint subgraphs, like real scale-out; joins to the
    single-copy part table dangle — graph/text probes don't use them)
    and ROTATES each document replica's vowels by the replica index so
    text content is mostly DISTINCT across replicas — modeling a bigger
    corpus instead of the total-duplication regime (content-pair
    operators like winnowing otherwise see quadratic-in-copies TRUE
    output by construction). A perf-harness transform only — never a
    correctness fixture."""
    cat = Catalog(spark, SF_DIR)
    for table, keys in SHIFT.items():
        src = cat.table(table)
        shift_keys = list(keys)
        if sparse and table == "lineitem":
            shift_keys.append("l_partkey")
        # key stride larger than any real key so replicas never collide
        stride = 10 ** 12
        copies = []
        for i in range(factor):
            c = src
            for k in shift_keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * stride))
            if sparse and table == "documents" and i > 0:
                rot = "aeiou"[i % 5 :] + "aeiou"[: i % 5]
                c = c.withColumn("text", F.translate("text", "aeiou", rot))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")
    for table in ["part", "supplier", "nation", "region"]:
        cat.table(table).write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")


def time_probe(spark, name: str, sf_dir: str) -> float:
    """Steady-state (min of 2 after an untimed warmup, cache cleared
    between runs — same methodology as bench.py). The previous single
    cold run attributed session startup and first-time codegen to
    whichever probe ran first, which mis-ranked ratios by up to 2x."""

    def once() -> float:
        spark.catalog.clearCache()
        # localCheckpoint blocks (minhash's shingle materialization) are
        # freed by the ContextCleaner only after JVM GC notices the dead
        # RDD refs; without a nudge they pile up across probes and tax
        # whichever query runs last (measured: demo5 2.5 s isolated vs
        # 5.0 s at the tail of the probe list)
        spark.sparkContext._jvm.System.gc()
        t0 = time.monotonic()
        df = GOLDEN[name].spark(spark, sf_dir)
        if isinstance(df, DataFrame):
            df.write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    once()  # warmup: codegen + parquet footers
    return min(once() for _ in range(2))


def main() -> None:
    argv = [a for a in sys.argv[1:] if a != "--sparse"]
    sparse = "--sparse" in sys.argv[1:]
    factor = int(argv[0]) if argv else 10
    # optional probe-name args restrict the run (iterating on one operator
    # shouldn't pay for the other seventeen). With --sparse, any GOLDEN
    # name is accepted (the density-honest fixture exists precisely for
    # operators whose default-replica ratio measures fixture density,
    # not the operator).
    only = argv[1:]
    pool = GOLDEN if sparse else PROBES
    probes = [n for n in pool if not only or n in only]
    unknown = [n for n in only if n not in pool]
    if unknown:
        raise SystemExit(f"unknown probes: {unknown}")
    spark = get_spark(app_name="scale-probe")
    tag = f"mr_dice_scale_{'sparse_' if sparse else ''}x{factor}"
    scaled_dir = os.path.join(tempfile.gettempdir(), tag)
    # region is written LAST — its presence means the build completed
    if not os.path.exists(os.path.join(scaled_dir, "region.parquet")):
        print(f"# building x{factor} fixture at {scaled_dir}", file=sys.stderr)
        build_scaled(spark, factor, scaled_dir, sparse=sparse)

    report = {}
    for name in probes:
        base = time_probe(spark, name, SF_DIR)
        big = time_probe(spark, name, scaled_dir)
        ratio = big / base if base > 0 else float("inf")
        report[name] = {
            "base_s": round(base, 2),
            f"x{factor}_s": round(big, 2),
            "ratio": round(ratio, 1),
        }
        print(f"# {name}: {base:.2f}s -> {big:.2f}s (x{ratio:.1f})", file=sys.stderr)
    print(json.dumps({"factor": factor, "sparse": sparse, "probes": report}))


if __name__ == "__main__":
    main()
