from mr_dice_spark.operators.quota import distribute_quota_fair, fair_quota_topk
from mr_dice_spark.operators.topk import per_group_topk
from mr_dice_spark.operators.dedup import (
    dedup_exact,
    dedup_first_wins,
    minhash_lsh_candidates,
    minhash_lsh_dedup,
    simhash_dedup,
    ngram_jaccard_join,
)
from mr_dice_spark.operators.similarity import (
    cosine_topk_batch,
    cosine_topk_bruteforce,
    cosine_topk_lsh,
    cosine_topk_ivf,
    ivf_assign,
    kmeans_fit,
    embedding_near_dup,
    pq_encode,
    pq_topk,
    pq_train,
    ivf_pq_index,
    ivf_pq_topk,
)
from mr_dice_spark.operators.asof import asof_join
from mr_dice_spark.operators.curation import curate_corpus
from mr_dice_spark.operators.sketch import cms_estimate, cms_sketch, heavy_hitters_cms
from mr_dice_spark.operators.components import connected_components, dedup_connected
from mr_dice_spark.operators.interval import interval_join
from mr_dice_spark.operators.sampling import (
    apportion_weighted,
    deterministic_sample,
    hash_bucket,
    mixture_sample,
    stratified_sample_exact,
)
from mr_dice_spark.operators.scale import fan_out, hot_keys, salted_join
from mr_dice_spark.operators.sessionize import sessionize
from mr_dice_spark.operators.lines import line_dedup
from mr_dice_spark.operators.terms import (
    duplicate_span_stats,
    repetition_stats,
    tfidf_top_terms,
    unigram_lm_score,
)
from mr_dice_spark.operators.decontaminate import contamination_stats, decontaminate
from mr_dice_spark.operators.packing import pack_sequences
from mr_dice_spark.operators.merge import apply_changes, merge_latest_wins, scd2_history, snapshot_delta
from mr_dice_spark.operators.timeseries import resample_ffill
from mr_dice_spark.operators.incremental import (
    dedup_incremental,
    minhash_index_append,
    minhash_index_create,
)

__all__ = [
    "connected_components",
    "dedup_connected",
    "interval_join",
    "deterministic_sample",
    "hash_bucket",
    "stratified_sample_exact",
    "apportion_weighted",
    "mixture_sample",
    "fan_out",
    "hot_keys",
    "salted_join",
    "distribute_quota_fair",
    "fair_quota_topk",
    "per_group_topk",
    "dedup_exact",
    "dedup_first_wins",
    "minhash_lsh_candidates",
    "minhash_lsh_dedup",
    "simhash_dedup",
    "ngram_jaccard_join",
    "cosine_topk_batch",
    "cosine_topk_bruteforce",
    "cosine_topk_lsh",
    "cosine_topk_ivf",
    "ivf_assign",
    "kmeans_fit",
    "embedding_near_dup",
    "pq_train",
    "pq_encode",
    "pq_topk",
    "ivf_pq_index",
    "ivf_pq_topk",
    "asof_join",
    "curate_corpus",
    "cms_sketch",
    "cms_estimate",
    "heavy_hitters_cms",
    "sessionize",
    "tfidf_top_terms",
    "repetition_stats",
    "unigram_lm_score",
    "line_dedup",
    "duplicate_span_stats",
    "contamination_stats",
    "decontaminate",
    "pack_sequences",
    "apply_changes",
    "merge_latest_wins",
    "resample_ffill",
    "scd2_history",
    "snapshot_delta",
    "dedup_incremental",
    "minhash_index_append",
    "minhash_index_create",
]
