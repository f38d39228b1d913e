"""Incremental MinHash dedup against a persisted signature index.

The batch operators in ``operators.dedup`` dedup a corpus against itself.
A production training-data pipeline almost never does that: it ingests a
daily/hourly batch that must be deduped against **everything already
accepted** — at 100 TB, recomputing corpus signatures per batch is the
difference between a viable pipeline and an O(corpus × batches) one. This
module persists the per-document MinHash state (signature vector + LSH band
keys, docs × num_hashes longs — orders of magnitude smaller than the text)
and dedups each new batch by joining against that index only.

Semantics: first-wins generalized across time — the index (earlier batches)
always beats the new batch; within the new batch, min id wins (the same
deterministic rule as ``dedup.minhash_lsh_dedup``, reference D1:
optimade_database/Optimade_Server/utils.py:398,426-431).

Verification note: batch dedup verifies candidates with EXACT jaccard on
shingle sets; the incremental path verifies with the SIGNATURE-ESTIMATED
jaccard (fraction of agreeing MinHash components — an unbiased estimator
with sd ~= sqrt(j(1-j)/k), ±0.035 at k=128) because the index deliberately
does not retain corpus text or shingles. The estimator runs as a
higher-order zip_with over candidate pairs only — interpreted, but
post-pruning (candidate counts, not corpus counts), so it stays off the
hot path documented in PERFORMANCE.md §1.

Scale notes:
* the index is two parquet datasets — ``signatures/`` (id, sig array<long>)
  and ``bands/`` (id, band, key) — plus a params manifest. At real scale,
  write ``bands/`` bucketed by (band, key) so the per-batch candidate join
  shuffles only the (small) new batch side;
* each batch appends its survivors' state to the index (append-mode parquet
  write — no rewrite of existing index files);
* candidate generation shuffles (id, band, key) pairs; signature
  verification shuffles candidate ids × one signature array each.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mr_dice_spark.operators.dedup import minhash_signatures, shingle_sets

_META = "index_meta.json"


def _default_params() -> dict:
    return {"shingle_n": 3, "num_hashes": 128, "bands": 32}


def _batch_state(
    df: DataFrame, id_col: str, text_col: str, params: dict
) -> tuple[DataFrame, DataFrame]:
    """(signatures, band_keys) for one batch.

    signatures: (__id, __sig array<long>); band_keys: (__id, __band, __key).
    """
    num_hashes, bands = params["num_hashes"], params["bands"]
    rows_per_band = num_hashes // bands
    sets_ = shingle_sets(df, id_col, text_col, params["shingle_n"])
    exploded = sets_.select(
        "__id", F.explode_outer("__sh").alias("__s")
    ).where(F.col("__s").isNotNull())  # avoid InferFiltersFromGenerate re-evaluation
    wide = minhash_signatures(exploded, num_hashes)
    sig = wide.select(
        "__id", F.array(*[F.col(f"__h{i}") for i in range(num_hashes)]).alias("__sig")
    )
    band_cols = [
        F.xxhash64(*[F.col(f"__h{b * rows_per_band + j}") for j in range(rows_per_band)])
        for b in range(bands)
    ]
    keys = wide.select(
        "__id", F.posexplode(F.array(*band_cols)).alias("__band", "__key")
    )
    return sig, keys


def estimated_jaccard(sig_a: Column, sig_b: Column) -> Column:
    """MinHash estimate: fraction of agreeing signature components."""
    matches = F.aggregate(
        F.zip_with(sig_a, sig_b, lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return matches / F.size(sig_a)


def minhash_index_create(
    spark: SparkSession,
    index_path: str,
    shingle_n: int = 3,
    num_hashes: int = 128,
    bands: int = 32,
) -> dict:
    """Initialize an empty index directory with a params manifest."""
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be divisible by bands")
    params = {"shingle_n": shingle_n, "num_hashes": num_hashes, "bands": bands}
    os.makedirs(index_path, exist_ok=True)
    with open(os.path.join(index_path, _META), "w") as f:
        json.dump(params, f)
    return params


def _read_params(index_path: str) -> dict:
    with open(os.path.join(index_path, _META)) as f:
        return json.load(f)


def _index_nonempty(index_path: str) -> bool:
    return os.path.isdir(os.path.join(index_path, "signatures"))


def minhash_index_append(
    df: DataFrame, id_col: str, text_col: str, index_path: str
) -> None:
    """Compute and append MinHash state for ``df``'s rows to the index.

    Caller guarantees ``df`` is already deduped (normally: the survivors
    returned by :func:`dedup_incremental`)."""
    params = _read_params(index_path)
    sig, keys = _batch_state(df, id_col, text_col, params)
    sig.write.mode("append").parquet(os.path.join(index_path, "signatures"))
    keys.write.mode("append").parquet(os.path.join(index_path, "bands"))


def dedup_incremental(
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    index_path: str,
    threshold: float = 0.8,
    append_survivors: bool = True,
) -> DataFrame:
    """Dedup ``new_df`` against the persisted index AND within itself;
    optionally append the survivors' state to the index.

    Returns the surviving rows of ``new_df`` (full original columns).

    Documents too short to produce a shingle have no signature: they always
    survive and leave no index state (exact copies of them are not
    suppressed later) — same contract as the batch MinHash operators; pair
    with ``dedup_exact`` if short-doc dedup matters.
    """
    spark = new_df.sparkSession
    params = _read_params(index_path)
    sig, keys = _batch_state(new_df, id_col, text_col, params)
    sig = sig.localCheckpoint(eager=False)  # reused 3x: vs-index, within-batch, append
    keys = keys.localCheckpoint(eager=False)

    # --- new-vs-index candidates: index always wins ---------------------
    if _index_nonempty(index_path):
        idx_sig = spark.read.parquet(os.path.join(index_path, "signatures"))
        idx_keys = spark.read.parquet(os.path.join(index_path, "bands"))
        cand_idx = (
            keys.alias("n")
            .join(
                idx_keys.alias("i"),
                (F.col("n.__band") == F.col("i.__band"))
                & (F.col("n.__key") == F.col("i.__key")),
            )
            .select(F.col("n.__id").alias("__nid"), F.col("i.__id").alias("__iid"))
            .distinct()
        )
        idx_losers = (
            cand_idx.join(sig.withColumnsRenamed({"__id": "__nid", "__sig": "__sa"}), "__nid")
            .join(idx_sig.withColumnsRenamed({"__id": "__iid", "__sig": "__sb"}), "__iid")
            .where(estimated_jaccard(F.col("__sa"), F.col("__sb")) >= threshold)
            .select("__nid")
            .distinct()
        )
    else:
        idx_losers = None

    # --- within-batch candidates: min id wins ---------------------------
    cand_new = (
        keys.alias("x")
        .join(
            keys.alias("y"),
            (F.col("x.__band") == F.col("y.__band"))
            & (F.col("x.__key") == F.col("y.__key"))
            & (F.col("x.__id") < F.col("y.__id")),
        )
        .select(F.col("x.__id").alias("__ida"), F.col("y.__id").alias("__idb"))
        .distinct()
    )
    new_losers = (
        cand_new.join(sig.withColumnsRenamed({"__id": "__ida", "__sig": "__sa"}), "__ida")
        .join(sig.withColumnsRenamed({"__id": "__idb", "__sig": "__sb"}), "__idb")
        .where(estimated_jaccard(F.col("__sa"), F.col("__sb")) >= threshold)
        .select(F.col("__idb").alias("__nid"))
        .distinct()
    )
    losers = new_losers if idx_losers is None else new_losers.unionByName(idx_losers).distinct()

    survivors = new_df.join(
        losers.withColumnRenamed("__nid", id_col), id_col, "left_anti"
    )
    if append_survivors:
        # materialize the survivor set once; append its precomputed state
        survivors = survivors.localCheckpoint(eager=True)
        surv_ids = survivors.select(F.col(id_col).alias("__id"))
        sig.join(surv_ids, "__id", "left_semi").write.mode("append").parquet(
            os.path.join(index_path, "signatures")
        )
        keys.join(surv_ids, "__id", "left_semi").write.mode("append").parquet(
            os.path.join(index_path, "bands")
        )
    return survivors
