"""Incremental MinHash dedup against a persisted signature index
(operators/incremental.py)."""

import pytest
from pyspark.sql import functions as F

from mr_dice_spark.catalog import Catalog
from mr_dice_spark.operators.incremental import (
    dedup_incremental,
    estimated_jaccard,
    minhash_index_append,
    minhash_index_create,
)


@pytest.fixture
def index_path(tmp_path):
    p = str(tmp_path / "mh_index")
    return p


def _docs(spark, sf_dir):
    return Catalog(spark, sf_dir).documents


def test_create_writes_manifest(spark, index_path):
    params = minhash_index_create(spark, index_path, num_hashes=32, bands=8)
    assert params["num_hashes"] == 32


def test_create_rejects_bad_banding(spark, index_path):
    with pytest.raises(ValueError):
        minhash_index_create(spark, index_path, num_hashes=30, bands=8)


def test_first_batch_passes_self_dedup_only(spark, sf_dir, index_path):
    """Empty index: only within-batch dedup applies; batch containing an
    exact copy of one doc loses exactly the higher-id copy."""
    minhash_index_create(spark, index_path, num_hashes=64, bands=16)
    docs = _docs(spark, sf_dir).limit(20)
    dup = docs.where(F.col("doc_id") == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    batch = docs.unionByName(dup)
    surv = dedup_incremental(batch, "doc_id", "text", index_path, threshold=0.9)
    ids = {r.doc_id for r in surv.select("doc_id").collect()}
    assert 0 in ids and 100000 not in ids
    assert len(ids) >= 18  # distinct synthetic docs survive


def test_second_batch_deduped_against_index(spark, sf_dir, index_path):
    """Docs accepted in batch 1 knock out their exact copies in batch 2
    (index wins), while genuinely new docs survive."""
    minhash_index_create(spark, index_path, num_hashes=64, bands=16)
    docs = _docs(spark, sf_dir)
    b1 = docs.where(F.col("doc_id") < 10)
    dedup_incremental(b1, "doc_id", "text", index_path, threshold=0.9)

    copies = b1.select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    # 10/11/13/14/15 verified non-dup of docs 0-9 (true jaccard < 0.02);
    # 12 is excluded — it IS a near-dup of doc 8 (true jaccard 0.97) in the
    # synthetic corpus and must be dropped by a correct incremental dedup.
    fresh = docs.where(F.col("doc_id").isin(10, 11, 13, 14, 15))
    b2 = copies.unionByName(fresh)
    surv = dedup_incremental(b2, "doc_id", "text", index_path, threshold=0.9)
    ids = {r.doc_id for r in surv.select("doc_id").collect()}
    assert not any(i >= 200000 for i in ids), "index copies must be dropped"
    assert {10, 11, 13, 14, 15} <= ids, "fresh docs must survive"


def test_append_survivors_false_leaves_index_untouched(spark, sf_dir, index_path):
    minhash_index_create(spark, index_path, num_hashes=64, bands=16)
    b1 = _docs(spark, sf_dir).where(F.col("doc_id") < 5)
    dedup_incremental(b1, "doc_id", "text", index_path, threshold=0.9,
                      append_survivors=False)
    # index still empty -> re-submitting the same docs passes untouched
    surv = dedup_incremental(b1, "doc_id", "text", index_path, threshold=0.9)
    assert surv.count() == 5


def test_estimated_jaccard_bounds(spark):
    df = spark.createDataFrame(
        [([1, 2, 3, 4], [1, 2, 3, 4]), ([1, 2, 3, 4], [9, 9, 9, 9]),
         ([1, 2, 3, 4], [1, 2, 9, 9])],
        "a array<long>, b array<long>",
    )
    vals = [r.j for r in df.select(
        estimated_jaccard(F.col("a"), F.col("b")).alias("j")).collect()]
    assert vals == [1.0, 0.0, 0.5]


def test_manual_append_then_dedup(spark, sf_dir, index_path):
    """minhash_index_append seeds the index directly (e.g. bootstrap from an
    already-clean corpus)."""
    minhash_index_create(spark, index_path, num_hashes=64, bands=16)
    clean = _docs(spark, sf_dir).where(F.col("doc_id") < 8)
    minhash_index_append(clean, "doc_id", "text", index_path)
    resubmit = clean.select(
        (F.col("doc_id") + 300000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    surv = dedup_incremental(resubmit, "doc_id", "text", index_path, threshold=0.9)
    assert surv.count() == 0


def test_crash_retry_rerun_is_idempotent(spark, sf_dir, index_path):
    """Re-running the SAME batch after its append (crash between append and
    downstream persist) must return the same survivors, not 0 — same-id
    index hits mean 'this document, re-submitted' and are not losers."""
    minhash_index_create(spark, index_path, num_hashes=64, bands=16)
    batch = _docs(spark, sf_dir).where(F.col("doc_id") < 10)
    first = {r.doc_id for r in dedup_incremental(
        batch, "doc_id", "text", index_path, threshold=0.9).select("doc_id").collect()}
    second = {r.doc_id for r in dedup_incremental(
        batch, "doc_id", "text", index_path, threshold=0.9).select("doc_id").collect()}
    assert first == second and len(first) > 0
    # and the retry did not duplicate index state
    import os
    sig = spark.read.parquet(os.path.join(index_path, "signatures"))
    assert sig.count() == sig.select("__id").distinct().count()


def test_id_reuse_with_different_content_raises(spark, sf_dir, index_path):
    """An indexed id re-submitted with DIFFERENT content is id reuse, not a
    crash-retry — it must fail loudly instead of surviving unindexed."""
    minhash_index_create(spark, index_path, num_hashes=64, bands=16)
    docs = _docs(spark, sf_dir)
    b1 = docs.where(F.col("doc_id") < 5).select("doc_id", "text")
    dedup_incremental(b1, "doc_id", "text", index_path, threshold=0.9)
    reused = docs.where((F.col("doc_id") >= 20) & (F.col("doc_id") < 25)).select(
        (F.col("doc_id") - 20).alias("doc_id"), "text"  # ids 0-4, other docs' text
    )
    with pytest.raises(ValueError, match="id reuse"):
        dedup_incremental(reused, "doc_id", "text", index_path, threshold=0.9)


def test_create_refuses_overwrite_and_exist_ok(spark, sf_dir, index_path):
    minhash_index_create(spark, index_path, num_hashes=64, bands=16)
    with pytest.raises(ValueError, match="already exists"):
        minhash_index_create(spark, index_path, num_hashes=64, bands=16)
    with pytest.raises(ValueError, match="already exists"):
        minhash_index_create(spark, index_path, num_hashes=128, bands=32, exist_ok=True)
    # matching params + exist_ok: idempotent daily-job setup
    p = minhash_index_create(spark, index_path, num_hashes=64, bands=16, exist_ok=True)
    assert p["num_hashes"] == 64


def test_kmeans_survives_zero_vectors(spark):
    from mr_dice_spark.operators.similarity import kmeans_fit

    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])],
        "vec_id int, embedding array<double>",
    )
    cents = kmeans_fit(df, "vec_id", "embedding", k=2, n_iter=2)
    assert len(cents) == 2
    for _, c in cents:
        assert all(x == x for x in c)  # no NaN / None


def test_dedup_incremental_rejects_duplicate_ids_within_batch(spark, tmp_path):
    import pytest as _pytest

    from mr_dice_spark.operators.incremental import (
        dedup_incremental,
        minhash_index_create,
    )

    p = str(tmp_path / "idx")
    minhash_index_create(spark, p, num_hashes=32, bands=8)
    text = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(7, text), (7, "completely different content here for id seven")],
        "doc_id long, text string",
    )
    with _pytest.raises(ValueError, match="duplicate id"):
        dedup_incremental(df, "doc_id", "text", p)
