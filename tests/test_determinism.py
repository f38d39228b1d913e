"""Partitioning-independence tests.

The oracle compare runs Spark with one fixed shuffle layout, so an
order-dependent aggregate (collect_list without a sort, first() without a
within-group constant, float summation order leaking past the rounding
grid) can pass the oracle and still be nondeterministic on a cluster
whose partitioning differs. These tests re-run order-sensitive goldens
under a different shuffle-partition count and a pre-shuffled input
lineage, and require identical results.
"""

import pytest

from mr_dice_spark.golden import GOLDEN

# goldens whose construction involves collect_list/first/limit — the
# shapes where partition order could leak into results
SENSITIVE = [
    "demo5_composition_selfjoin",   # sorted collect_list composition key
    "tfidf_top_terms_per_doc",      # per-doc top-k with tiebreaks
    "minhash_signatures_portable",  # bit-exact aggregate signatures
    "scd2_user_event_history",      # first() over runs + window lineage
    "q10_returned_items",           # global top-20 with tiebreak
    "fair_quota_topk_events",       # quota water-fill + per-group limit
    # round-5 order-sensitive shapes
    "events_funnel_conversion",     # sorted collect_list + greedy fold
    "kmeans_embedding_clusters",    # float mean quantization per sweep
    "cluster_balanced_subsample",   # clustering feeding hash-rank sample
    "weighted_sample_by_length",    # global top-n with hash/id tiebreak
    # round-5 continuation order-sensitive shapes
    "events_pattern_match",         # sorted collect_list -> regex scan
    "pmi_collocations_top",         # global top-k at a rounded-tie boundary
    "embedding_single_linkage",     # iterative label propagation fixpoint
    "value_drift_psi_events",       # percentile edges feed literal folds
    "lsh_single_linkage_clusters",  # banding join -> verify -> fixpoint
    "ccnet_perplexity_buckets",     # NTILE at quantized-score ties
    "bpe_train_merges_corpus",      # iterative argmax feeds literal folds
]


@pytest.mark.parametrize("name", SENSITIVE)
def test_result_independent_of_shuffle_partitioning(spark, oracle_sf_dir, name):
    q = GOLDEN[name]
    base_conf = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        a = [tuple(r) for r in q.spark(spark, oracle_sf_dir).collect()]
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = [tuple(r) for r in q.spark(spark, oracle_sf_dir).collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base_conf)
    assert a == b, f"{name} result depends on shuffle partitioning"
