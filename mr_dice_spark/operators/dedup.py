"""Deduplication operator family (north-star pipeline operators).

The reference's own dedup surface is (a) first-wins id dedup across
providers (Optimade_Server/utils.py:398,426-431 — SURVEY.md §2.7 D1) and
(b) blocked near-duplicate structure detection: block on reduced formula,
band on relative energy, verify pairwise (openlam_database/openlam/
lam_optimize/main.py:102-122 — D4). This module generalizes both to the
LLM-training-data shapes: exact content dedup, MinHash+LSH, SimHash, and
exact n-gram Jaccard joins.

Scale notes (100 TB):
* the hot path is **explode + codegen'd hash aggregation**, not nested
  higher-order array functions — Spark evaluates HOF lambdas interpreted
  (outside whole-stage codegen) and re-evaluates captured sub-expressions
  per element, which measured ~60 µs/hash on this corpus vs far sub-µs for
  the same xxhash64 inside a codegen'd aggregate. Signatures therefore come
  from ``explode(shingles).groupBy(id).agg(min(hash(s, i)) ...)``: partial
  (map-side) aggregation collapses each partition to one row per doc before
  the shuffle, so the shuffle volume is docs × num_hashes longs, never the
  shingle stream;
* candidate generation shuffles only (id, band_key) pairs, never documents;
* verification joins shingle SETS for candidate pairs only (LSH prunes the
  quadratic pair space to near-linear);
* representative selection is the reference's deterministic first-wins rule
  (min id wins), not iterative connected components — documented
  approximation, one extra shuffle instead of O(diameter) rounds.
"""

from __future__ import annotations

import logging
import threading
from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mr_dice_spark.operators.scale import fan_out


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def dedup_exact(df: DataFrame, content_cols: list[str], id_col: str) -> DataFrame:
    """Exact dedup on a content hash; deterministic keeper = min id.

    Hash-groupBy shape: one shuffle on the 256-bit content digest (collision
    probability negligible), map-side combine applies.

    The digest is over ``to_json(struct(cols))``: JSON framing distinguishes
    NULL from absent and escapes delimiters, where a concat_ws serialization
    silently DROPS null operands — (NULL,'a') and ('a',NULL) would collide
    and one row be wrongly deleted, and separator injection could forge
    collisions across column boundaries.
    """
    h = F.sha2(F.to_json(F.struct(*[F.col(c) for c in content_cols])), 256)
    w = Window.partitionBy(h).orderBy(F.col(id_col).asc())
    return df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")


def dedup_first_wins(df: DataFrame, id_col: str, priority_cols: list) -> DataFrame:
    """Reference D1: global first-writer-wins dedup by id.

    The reference's winner depends on traversal order; a distributed engine
    needs an explicit priority (SURVEY.md §7.3) — ``priority_cols`` is that
    deterministic provider ranking.
    """
    w = Window.partitionBy(id_col).orderBy(*priority_cols)
    return df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")


# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------

def word_shingles(words_col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a *materialized* words-array
    column. Pass an attribute reference (a column produced by an earlier
    projection), NOT an inline ``split(...)`` expression — HOF lambdas
    re-evaluate captured expression trees per element, so an inline split
    would re-split the text for every gram."""
    k = F.greatest(F.size(words_col) - (n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
        lambda i: F.concat_ws(
            " ", *[F.element_at(words_col, (i + j).cast("int")) for j in range(n)]
        ),
    )
    return F.array_distinct(F.when(k > 0, grams).otherwise(F.array()))


def shingle_sets(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(__id, __sh: array<string>) — one row per doc with its distinct
    shingle set (possibly empty for short docs). The words array is
    materialized in its own projection behind the fan_out exchange, so the
    split runs exactly once per row.

    Deliberately NO ``where(size(__sh) > 0)`` here: a filter over the
    transform output would be predicate-pushed *below* the repartition
    exchange, re-evaluating the whole shingle expression on the narrow
    pre-fan-out side (measured 7.6 s vs 0.3 s on this corpus). Empty sets
    are harmless downstream — explode() drops them and candidate joins are
    inner."""
    words = fan_out(
        df.select(
            F.col(id_col).alias("__id"),
            F.split(F.trim(F.col(text_col)), r"\s+").alias("__w"),
        )
    )
    return words.select("__id", word_shingles(F.col("__w"), n).alias("__sh"))


def shingles_exploded(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(__id, __n: set size, __s: shingle) — the exploded inverted-index
    form the signature/join operators below consume.

    ``explode_outer`` + null-filter instead of ``explode``: for plain
    explode, Catalyst's InferFiltersFromGenerate adds ``size(arr) > 0``
    and pushes it below the fan_out exchange with the entire shingle
    expression substituted in — re-running the transform (with split
    re-evaluated per element) single-partition (measured ~7.6 s vs 0.3 s).
    The outer variant infers nothing; the IS NOT NULL filter sits above the
    Generate and drops the same rows."""
    return (
        shingle_sets(df, id_col, text_col, n)
        .select("__id", F.size("__sh").alias("__n"), F.explode_outer("__sh").alias("__s"))
        .where(F.col("__s").isNotNull())
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def portable_hash60(col: Column, seed: str = "") -> Column:
    """60-bit engine-portable hash: integer value of the first 15 hex chars
    of md5(seed || value). ~3x slower than xxhash64 — used only where a
    DuckDB oracle must reproduce the exact hashes (60 bits so the value
    fits a signed BIGINT in both engines)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(seed), col)), 1, 15), 16, 10
    ).cast("long")


def minhash_signatures(
    exploded: DataFrame, num_hashes: int = 128, portable: bool = False
) -> DataFrame:
    """(__id, __h0..__h{k-1}) MinHash signature via codegen'd aggregation:
    sig[i] = min over shingles of hash_i(shingle). Map-side combine
    collapses each partition to one partial row per doc before the shuffle.

    ``portable=True`` switches xxhash64 -> md5-derived 60-bit hashes that a
    SQL oracle can restate verbatim (same signatures in DuckDB)."""
    if portable:
        aggs = [
            F.min(portable_hash60(F.col("__s"), f"{i}|")).alias(f"__h{i}")
            for i in range(num_hashes)
        ]
    else:
        aggs = [
            F.min(F.xxhash64(F.col("__s"), F.lit(i))).alias(f"__h{i}")
            for i in range(num_hashes)
        ]
    return exploded.groupBy("__id").agg(*aggs)


def band_keys(sig_cols: list[Column], bands: int) -> Column:
    """Array of LSH band keys from signature component columns: one
    xxhash64 over each band's ``len(sig_cols)/bands`` components.

    THE single definition of the banding scheme — the incremental index
    (operators.incremental) derives keys from STORED signature arrays with
    this same function, so batch- and index-computed keys stay
    hash-compatible by construction."""
    if bands <= 0 or len(sig_cols) % bands != 0:
        # silent truncation would band only the first bands*(n//bands)
        # components — paid-for hashes ignored and recall silently off the
        # requested configuration (the index path validates this at create;
        # the batch path must match)
        raise ValueError(
            f"num_hashes ({len(sig_cols)}) must be divisible by bands ({bands})"
        )
    rows_per_band = len(sig_cols) // bands
    return F.array(
        *[
            F.xxhash64(*sig_cols[b * rows_per_band : (b + 1) * rows_per_band])
            for b in range(bands)
        ]
    )


def portable_band_keys(sig_cols: list[Column], bands: int) -> Column:
    """SQL-restatable LSH band keys: each band's key is its signature
    components joined with ':' (vs ``band_keys``' xxhash64 compression).
    Key equality == component-tuple equality because minhash components
    are non-negative decimal integers, so ':' is an unambiguous
    separator — a DuckDB oracle can restate the banding join as plain
    tuple equality on the same MIN(md5-hash) columns. Wider shuffle keys
    than band_keys (use only at oracle-checked scales); same
    divisibility contract."""
    if bands <= 0 or len(sig_cols) % bands != 0:
        raise ValueError(
            f"num_hashes ({len(sig_cols)}) must be divisible by bands ({bands})"
        )
    rows_per_band = len(sig_cols) // bands
    return F.array(
        *[
            F.concat_ws(":", *sig_cols[b * rows_per_band : (b + 1) * rows_per_band])
            for b in range(bands)
        ]
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    num_hashes: int = 128,
    bands: int = 32,
    portable: bool = False,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash LSH.

    Returns (id_a, id_b, jaccard) with id_a < id_b and EXACT jaccard computed
    on the candidates' shingle sets (LSH proposes, exact verify disposes).

    ``portable=True`` switches both the signatures and the band keys to
    the md5-derived engine-portable scheme (portable_hash60 +
    portable_band_keys) so a DuckDB oracle reproduces the exact
    candidate set — slower hashes and wider band keys, for
    oracle-checked scales only.
    """
    # the shingle transform is the expensive step (see PERFORMANCE.md §1-2)
    # and sets_ feeds THREE consumers (signatures + both verify joins);
    # materialize it once instead of re-running the transform per branch
    sets_ = shingle_sets(df, id_col, text_col, shingle_n).localCheckpoint(eager=True)
    exploded = sets_.select(
        "__id", F.explode_outer("__sh").alias("__s")
    ).where(F.col("__s").isNotNull())  # see shingles_exploded: avoids InferFiltersFromGenerate
    sig = minhash_signatures(exploded, num_hashes, portable=portable)

    keyer = portable_band_keys if portable else band_keys
    band_keys_df = sig.select(
        "__id",
        F.posexplode(
            keyer([F.col(f"__h{i}") for i in range(num_hashes)], bands)
        ).alias("__band", "__key"),
    )
    cand = (
        band_keys_df.alias("x")
        .join(
            band_keys_df.alias("y"),
            (F.col("x.__band") == F.col("y.__band"))
            & (F.col("x.__key") == F.col("y.__key"))
            & (F.col("x.__id") < F.col("y.__id")),
        )
        .select(F.col("x.__id").alias("id_a"), F.col("y.__id").alias("id_b"))
        .distinct()
    )
    return (
        cand.join(sets_.withColumnsRenamed({"__id": "id_a", "__sh": "__sh_a"}), "id_a")
        .join(sets_.withColumnsRenamed({"__id": "id_b", "__sh": "__sh_b"}), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("__sh_a", "__sh_b"))
                / F.size(F.array_union("__sh_a", "__sh_b"))
            ).alias("jaccard"),
        )
    )


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    shingle_n: int = 3,
    num_hashes: int = 128,
    bands: int = 32,
) -> DataFrame:
    """Near-dup dedup: drop every doc that matches a SMALLER-id doc at
    jaccard >= threshold (deterministic first-wins, reference D1 rule
    generalized; not transitive-closure clustering — documented tradeoff)."""
    pairs = minhash_lsh_candidates(df, id_col, text_col, shingle_n, num_hashes, bands)
    losers = pairs.where(F.col("jaccard") >= threshold).select(
        F.col("id_b").alias(id_col)
    ).distinct()
    return df.join(losers, id_col, "left_anti")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_bits: int = 64,
    portable: bool = False,
) -> DataFrame:
    """(__id, __fp: long) 64-bit SimHash per doc, fully codegen'd.

    Explode tokens (multiplicity preserved — repeated tokens vote
    repeatedly), hash once, then 64 conditional-sum aggregates (one per
    bit) with map-side combine; the fingerprint is assembled from the vote
    signs with compile-time shift amounts. No higher-order functions, so
    the whole pipeline stays inside whole-stage codegen.
    """
    toks = fan_out(
        df.select(
            F.col(id_col).alias("__id"),
            F.split(F.trim(F.col(text_col)), r"\s+").alias("__w"),
        )
    ).select("__id", F.explode("__w").alias("__t"))
    toks = toks.select(
        "__id",
        (portable_hash60(F.col("__t")) if portable else F.xxhash64(F.col("__t"))).alias("__hh"),
    )
    votes = toks.groupBy("__id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("__hh"), b).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"__v{b}")
            for b in range(n_bits)
        ]
    )
    fp = reduce(
        Column.bitwiseOR,
        [
            F.when(
                F.col(f"__v{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
            ).otherwise(F.lit(0).cast("long"))
            for b in range(n_bits)
        ],
    )
    return votes.select("__id", fp.alias("__fp"))


def simhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    n_bits: int = 64,
    portable: bool = False,
) -> DataFrame:
    """SimHash near-dup pairs within hamming distance ``max_hamming``.

    Banding by pigeonhole: split the ``n_bits``-bit fingerprint into
    ``max_hamming + 1`` chunks — any pair within the distance budget agrees
    exactly on at least one chunk, so an equi-join per chunk finds all pairs
    without a cartesian product. Recall is EXACT, not probabilistic (any
    ``n_bits % chunks`` remainder bits are simply uncovered by banding,
    which only lowers the covered-diff count — the pigeonhole argument
    still holds), so the output is fully determined by the fingerprints;
    with ``portable=True`` a SQL oracle can brute-force the same pair set.
    Returns (id_a, id_b, hamming).
    """
    chunks = max_hamming + 1
    width = n_bits // chunks
    fp = simhash_fingerprints(df, id_col, text_col, n_bits=n_bits, portable=portable)

    def chunk_of(c: int) -> Column:
        shifted = F.shiftrightunsigned(F.col("__fp"), c * width)
        if width >= 64:
            # max_hamming=0: the single chunk is the whole fingerprint; a
            # (1<<64)-1 mask literal would overflow a signed long
            return shifted
        return shifted.bitwiseAND(F.lit((1 << width) - 1).cast("long"))

    keyed = fp.select(
        "__id",
        "__fp",
        F.posexplode(F.array(*[chunk_of(c) for c in range(chunks)])).alias(
            "__chunk", "__key"
        ),
    )
    pairs = (
        keyed.alias("x")
        .join(
            keyed.alias("y"),
            (F.col("x.__chunk") == F.col("y.__chunk"))
            & (F.col("x.__key") == F.col("y.__key"))
            & (F.col("x.__id") < F.col("y.__id")),
        )
        .select(
            F.col("x.__id").alias("id_a"),
            F.col("y.__id").alias("id_b"),
            F.col("x.__fp").alias("__fa"),
            F.col("y.__fp").alias("__fb"),
        )
        .distinct()
    )
    return pairs.select(
        "id_a",
        "id_b",
        F.bit_count(F.col("__fa").bitwiseXOR(F.col("__fb"))).alias("hamming"),
    ).where(F.col("hamming") <= max_hamming)


# ---------------------------------------------------------------------------
# exact n-gram Jaccard similarity join (inverted-index form)
# ---------------------------------------------------------------------------

# rotation slots for ngram_jaccard_join's persisted classes frames: bounded
# FIFO rather than a single slot, so a caller building several joins before
# consuming any (df1 = join(...); df2 = join(...); df1.collect()) doesn't
# have an earlier frame unpersisted out from under its still-lazy plan —
# which would silently recompute the classes aggregation per consumer.
# The FIFO lives ON the SparkSession object (same pattern as
# catalog.py's table cache): its lifetime is exactly the session's, so a
# dead session's frames drop with it instead of pinning executor storage
# until 4 newer joins rotate them out, and two sessions never evict each
# other's frames. A module lock guards the pop/append window — concurrent
# ngram_jaccard_join calls on the same session would otherwise race.
_CLASSES_CACHE_ATTR = "_mr_dice_jaccard_classes_cache"
_CLASSES_CACHE_SLOTS = 4
_CLASSES_CACHE_LOCK = threading.Lock()
_log = logging.getLogger(__name__)


def _rotate_classes_cache(spark, classes: DataFrame) -> None:
    """Register ``classes`` in the session-scoped persist FIFO, unpersisting
    the oldest frames past the slot budget. Unpersist failures are logged
    (a torn-down session can't strand storage anyway), never swallowed
    silently."""
    with _CLASSES_CACHE_LOCK:
        cache = getattr(spark, _CLASSES_CACHE_ATTR, None)
        if cache is None:
            cache = []
            setattr(spark, _CLASSES_CACHE_ATTR, cache)
        while len(cache) >= _CLASSES_CACHE_SLOTS:
            old = cache.pop(0)
            try:
                old.unpersist(False)
            except Exception:
                _log.warning(
                    "ngram_jaccard_join: failed to unpersist rotated classes "
                    "frame (session may be stopped)",
                    exc_info=True,
                )
        cache.append(classes)


def _shingle_classes(df: DataFrame, id_col: str, text_col: str, shingle_n: int):
    """Set-equivalence collapse shared by the exact similarity joins:
    (members, classes) where members maps ids to their shingle-set class
    and classes holds one row per DISTINCT set with its sorted set,
    member count __m, and size __n.

    Canonicalization keeps empty sets (they join to nothing and never
    pair — matching inverted-index semantics where a shingle-less doc
    can't share a shingle). Class identity = 128 bits from two
    independently-seeded xxhash64 passes over the sorted set: a single
    64-bit hash is an exact-identity proxy only until the birthday bound
    (~2.7% collision odds at 1e9 distinct sets at target scale), and a
    collision would both fabricate similarity-1.0 pairs and silently
    drop one set's true pairs; 128 bits push that to ~1e-20.
    sha2(to_json(...)) gives the same guarantee but measured 5s slower
    end-to-end at sf0.1. ``members`` is a narrow projection, NOT
    checkpointed (materializing it costs more at 10x than recomputing);
    ``classes`` is persisted, not localCheckpointed (it feeds the pair
    join twice plus both expansions; measured 2.4s vs 8.7s for an eager
    checkpoint at sf0.1) and rotated through the session-scoped FIFO so
    stranded cache is capped."""
    sets_ = shingle_sets(df, id_col, text_col, shingle_n)
    canon = sets_.select(
        "__id", F.array_sort(F.array_distinct("__sh")).alias("__set")
    )
    cls_key = F.struct(
        F.xxhash64("__set").alias("h1"), F.xxhash64(F.lit(1), "__set").alias("h2")
    )
    members = canon.select("__id", cls_key.alias("__cls"))
    classes = (
        canon.groupBy(cls_key.alias("__cls"))
        .agg(F.first("__set").alias("__set"), F.count(F.lit(1)).alias("__m"))
        .withColumn("__n", F.size("__set"))
        .persist()
    )
    _rotate_classes_cache(df.sparkSession, classes)
    return members, classes


def ngram_jaccard_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    shingle_n: int = 3,
) -> DataFrame:
    """EXACT jaccard similarity join via the inverted-index (explode-join)
    pattern: pairs sharing >=1 shingle are grouped to count intersections;
    |A ∪ B| = |A| + |B| - |A ∩ B|. Deterministic — this is the
    oracle-checkable sibling of MinHash LSH (which approximates the same
    output). Returns (id_a, id_b, jaccard) with id_a < id_b.

    Scale: two defenses bound the candidate explosion that made the naive
    inverted-index join quadratic on duplicate-dense corpora (the dominant
    regime for LLM dedup — many exact copies per document):

    * set-equivalence collapse: docs are grouped by their EXACT shingle
      set first, and the pair join runs over DISTINCT sets only. A corpus
      where each doc has k copies does k^2 less join work; the true pairs
      are recovered afterwards by expanding class pairs (output-bound, and
      the output is the answer). Intra-class pairs are emitted directly
      with jaccard = 1.0 — no join at all.
    * the AllPairs/PPJoin length filter inside the class-level join:
      jaccard >= t forces t*|A| <= |B| <= |A|/t, pruning length-
      incompatible set pairs before the pair-aggregation shuffle.

    A positional-prefix-filter variant (rare-first ordering, prefix-only
    index, array_intersect verify) was built and measured 7x SLOWER at
    both 1x and 10x on this corpus: the verify joins ship full shingle-
    array payloads and forfeit the count-join's map-side combine, and on
    duplicate-dense data every copy indexes the same prefix so posting
    lists shrink far less than the collapse achieves. For near-dup-dense
    corpora (distinct sets, high overlap) exact pair output is inherently
    quadratic — that regime's scale path is MinHash LSH, not this join.
    """
    members, classes = _shingle_classes(df, id_col, text_col, shingle_n)
    # class-level inverted-index join: explode distinct sets, pair classes
    # sharing a shingle, count intersections with map-side combine
    ex = classes.select("__cls", "__n", F.explode("__set").alias("__s"))
    length_compatible = (
        F.col("y.__n") >= F.lit(threshold) * F.col("x.__n")
    ) & (F.col("x.__n") >= F.lit(threshold) * F.col("y.__n"))
    class_pairs = (
        ex.alias("x")
        .join(
            ex.alias("y"),
            (F.col("x.__s") == F.col("y.__s"))
            & (F.col("x.__cls") < F.col("y.__cls"))
            & length_compatible,
        )
        .groupBy(
            F.col("x.__cls").alias("__ca"),
            F.col("y.__cls").alias("__cb"),
            F.col("x.__n").alias("__na"),
            F.col("y.__n").alias("__nb"),
        )
        .agg(F.count(F.lit(1)).alias("__i"))
        .select(
            "__ca",
            "__cb",
            (F.col("__i") / (F.col("__na") + F.col("__nb") - F.col("__i"))).alias(
                "jaccard"
            ),
        )
        .where(F.col("jaccard") >= threshold)
    )
    # inter-class doc pairs: expand each qualifying class pair to its
    # member cross product (output-bound: every emitted row is an answer)
    inter = (
        class_pairs.join(
            members.select(F.col("__cls").alias("__ca"), F.col("__id").alias("__ia")),
            "__ca",
        )
        .join(
            members.select(F.col("__cls").alias("__cb"), F.col("__id").alias("__ib")),
            "__cb",
        )
        .select(
            F.least("__ia", "__ib").alias("id_a"),
            F.greatest("__ia", "__ib").alias("id_b"),
            "jaccard",
        )
        # duplicate ids landing in two different classes would otherwise
        # emit a reflexive (id, id) pair — an output the per-row join could
        # never produce
        .where(F.col("id_a") != F.col("id_b"))
    )
    # intra-class doc pairs: identical non-empty sets are jaccard 1.0 by
    # definition (empty classes excluded — no shared shingle, and 0/0 is
    # not a similarity)
    intra_members = members.join(
        classes.where((F.col("__m") > 1) & (F.col("__n") > 0)).select("__cls"), "__cls"
    )
    intra = (
        intra_members.alias("x")
        .join(
            intra_members.alias("y"),
            (F.col("x.__cls") == F.col("y.__cls")) & (F.col("x.__id") < F.col("y.__id")),
        )
        .select(
            F.col("x.__id").alias("id_a"),
            F.col("y.__id").alias("id_b"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    if threshold > 1.0:
        return inter  # degenerate: nothing passes, keep plan shape
    return inter.unionByName(intra)


def minhash_recall_audit(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Measured recall of banded MinHash LSH against the EXACT Jaccard
    pair set, bucketed by similarity: ``(bucket_lo, n_true, n_hit,
    recall)`` where ``n_true`` counts exact pairs with jaccard in
    [bucket_lo, bucket_lo + 0.1) (1.0 its own bucket) and ``n_hit``
    those the banding also proposed — the empirical S-curve a dedup
    rollout reads before committing to a (num_hashes, bands)
    configuration, the dedup-side twin of similarity.ivf_recall_audit.
    "Measure, don't guess": the theoretical 1-(1-s^r)^b curve assumes
    independent hashes; this audits the ACTUAL config on the ACTUAL
    corpus.

    Deterministic end to end: portable md5-derived signatures
    (:func:`portable_hash60`) and banding by the band's component TUPLE
    (key hashing is only compression — equality of tuples is the banding
    relation), so even the audit is SQL-restatable and hash-checkable.
    Buckets compare integer-derived doubles (intersection/union counts),
    identical on any IEEE engine.

    Scale shape: the exact side is :func:`ngram_jaccard_join` (the
    operator's documented bounded-corpus/verification regime — an exact
    audit inherently pays for exact pairs); the banding side shuffles
    (id, band tuple) only; the final bucket aggregate is tiny.
    """
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands ({bands})"
        )
    per = num_hashes // bands
    true_pairs = ngram_jaccard_join(
        df, id_col, text_col, threshold=threshold, shingle_n=shingle_n
    ).select("id_a", "id_b", "jaccard")

    ex = shingles_exploded(df, id_col, text_col, shingle_n).select("__id", "__s")
    sig = minhash_signatures(ex, num_hashes=num_hashes, portable=True)
    band_tuple = F.array(
        *[
            F.concat_ws(
                ",", *[F.col(f"__h{b * per + i}") for i in range(per)]
            )
            for b in range(bands)
        ]
    )
    bk = sig.select("__id", F.posexplode(band_tuple).alias("__band", "__key"))
    cand = (
        bk.alias("x")
        .join(
            bk.alias("y"),
            (F.col("x.__band") == F.col("y.__band"))
            & (F.col("x.__key") == F.col("y.__key"))
            & (F.col("x.__id") < F.col("y.__id")),
        )
        .select(
            F.col("x.__id").alias("id_a"),
            F.col("y.__id").alias("id_b"),
            F.lit(True).alias("__hit"),
        )
        .distinct()
    )
    bucket = F.least(F.floor(F.col("jaccard") * 10) / 10, F.lit(1.0))
    return (
        true_pairs.join(cand, ["id_a", "id_b"], "left")
        .groupBy(bucket.alias("bucket_lo"))
        .agg(
            F.count(F.lit(1)).alias("n_true"),
            F.count_if(F.col("__hit").isNotNull()).alias("n_hit"),
        )
        .select(
            "bucket_lo",
            "n_true",
            "n_hit",
            F.round(F.col("n_hit") / F.col("n_true") + F.lit(1e-9), 6).alias(
                "recall"
            ),
        )
        .orderBy("bucket_lo")
    )


def ngram_containment_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    shingle_n: int = 3,
) -> DataFrame:
    """EXACT containment (asymmetric Jaccard) join: DIRECTIONAL rows
    ``(src_id, dst_id, containment)`` with ``containment = |src ∩ dst| /
    |src| >= threshold`` — "src's shingles are mostly inside dst". This
    is the subset-duplicate detector symmetric Jaccard misses: a
    paragraph quoted whole inside a much longer page has near-1.0
    containment but tiny Jaccard (the RefinedWeb-style sub-document
    dedup case). Both directions are evaluated; identical non-empty sets
    yield 1.0 both ways.

    Scale shape: the same set-equivalence collapse as ngram_jaccard_join
    (intersections counted once per DISTINCT set pair, duplicate-dense
    corpora linearize; output expansion is answer-bound). The one shape
    difference is deliberate: NO length filter — containment of the
    smaller side cannot be bounded by sizes (a 10-shingle doc may sit
    entirely inside a 10,000-shingle doc), so any co-occurring pair is a
    legitimate candidate and the AllPairs prune would break exactness.
    The candidate space is therefore the full co-occurrence graph; on
    corpora dominated by high-overlap DISTINCT sets the scale path is
    MinHash-LSH prefiltering feeding this join on survivors, exactly as
    with the Jaccard sibling."""
    members, classes = _shingle_classes(df, id_col, text_col, shingle_n)
    ex = classes.select("__cls", "__n", F.explode("__set").alias("__s"))
    # unordered class pairs (cls_a < cls_b by the 128-bit key) — the
    # intersection is symmetric, so count once and derive both directions
    class_pairs = (
        ex.alias("x")
        .join(
            ex.alias("y"),
            (F.col("x.__s") == F.col("y.__s"))
            & (F.col("x.__cls") < F.col("y.__cls")),
        )
        .groupBy(
            F.col("x.__cls").alias("__ca"),
            F.col("y.__cls").alias("__cb"),
            F.col("x.__n").alias("__na"),
            F.col("y.__n").alias("__nb"),
        )
        .agg(F.count(F.lit(1)).alias("__i"))
    )
    directional = class_pairs.select(
        F.col("__ca").alias("__src"),
        F.col("__cb").alias("__dst"),
        (F.col("__i") / F.col("__na")).alias("containment"),
    ).unionByName(
        class_pairs.select(
            F.col("__cb").alias("__src"),
            F.col("__ca").alias("__dst"),
            (F.col("__i") / F.col("__nb")).alias("containment"),
        )
    ).where(F.col("containment") >= threshold)
    inter = (
        directional.join(
            members.select(F.col("__cls").alias("__src"), F.col("__id").alias("__is")),
            "__src",
        )
        .join(
            members.select(F.col("__cls").alias("__dst"), F.col("__id").alias("__id_d")),
            "__dst",
        )
        .select(
            F.col("__is").alias("src_id"),
            F.col("__id_d").alias("dst_id"),
            "containment",
        )
        .where(F.col("src_id") != F.col("dst_id"))
    )
    # intra-class: identical non-empty sets contain each other fully —
    # emit BOTH directions (directional semantics)
    intra_members = members.join(
        classes.where((F.col("__m") > 1) & (F.col("__n") > 0)).select("__cls"),
        "__cls",
    )
    intra = (
        intra_members.alias("x")
        .join(
            intra_members.alias("y"),
            (F.col("x.__cls") == F.col("y.__cls"))
            & (F.col("x.__id") != F.col("y.__id")),
        )
        .select(
            F.col("x.__id").alias("src_id"),
            F.col("y.__id").alias("dst_id"),
            F.lit(1.0).alias("containment"),
        )
    )
    if threshold > 1.0:
        return inter
    return inter.unionByName(intra)


def minhash_precision_audit(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Measured PRECISION of banded MinHash LSH — the complement of
    :func:`minhash_recall_audit` (together they are the PR view a dedup
    rollout reads): every candidate pair the banding proposes is
    verified against its EXACT Jaccard and bucketed,
    ``(bucket_lo, n_candidates, n_confirmed, precision)`` with
    ``n_confirmed`` the candidates at or above ``threshold``. Low
    precision in the low buckets prices the wasted verify work the
    banding config buys; recall prices what it misses.

    Deterministic end to end (same portable signatures and tuple
    banding as the recall audit). Scale shape: candidates shuffle
    (id, band tuple) only; the verification join explodes shingles for
    CANDIDATE pairs only (the dedup pipeline's verify cost, never
    all-pairs); the bucket aggregate is tiny.
    """
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands ({bands})"
        )
    per = num_hashes // bands
    ex = shingles_exploded(df, id_col, text_col, shingle_n).select("__id", "__s")
    sig = minhash_signatures(ex, num_hashes=num_hashes, portable=True)
    band_tuple = F.array(
        *[
            F.concat_ws(
                ",", *[F.col(f"__h{b * per + i}") for i in range(per)]
            )
            for b in range(bands)
        ]
    )
    bk = sig.select("__id", F.posexplode(band_tuple).alias("__band", "__key"))
    cand = (
        bk.alias("x")
        .join(
            bk.alias("y"),
            (F.col("x.__band") == F.col("y.__band"))
            & (F.col("x.__key") == F.col("y.__key"))
            & (F.col("x.__id") < F.col("y.__id")),
        )
        .select(
            F.col("x.__id").alias("id_a"), F.col("y.__id").alias("id_b")
        )
        .distinct()
    )
    sets = ex.distinct()
    cnt = sets.groupBy("__id").agg(F.count(F.lit(1)).alias("__n"))
    inter = (
        cand.join(sets.alias("sa"), cand["id_a"] == F.col("sa.__id"))
        .join(
            sets.alias("sb"),
            (cand["id_b"] == F.col("sb.__id"))
            & (F.col("sa.__s") == F.col("sb.__s")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__i"))
    )
    j = F.col("__i") / (F.col("__na") + F.col("__nb") - F.col("__i"))
    verified = (
        cand.join(inter, ["id_a", "id_b"], "left")
        .join(cnt.select(F.col("__id").alias("id_a"), F.col("__n").alias("__na")), "id_a")
        .join(cnt.select(F.col("__id").alias("id_b"), F.col("__n").alias("__nb")), "id_b")
        .select(
            "id_a", "id_b",
            F.coalesce(j, F.lit(0.0)).alias("jaccard"),
        )
    )
    bucket = F.least(F.floor(F.col("jaccard") * 10) / 10, F.lit(1.0))
    return (
        verified.groupBy(bucket.alias("bucket_lo"))
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.count_if(F.col("jaccard") >= threshold).alias("n_confirmed"),
        )
        .select(
            "bucket_lo",
            "n_candidates",
            "n_confirmed",
            F.round(
                F.col("n_confirmed") / F.col("n_candidates") + F.lit(1e-9), 6
            ).alias("precision"),
        )
        .orderBy("bucket_lo")
    )


def hamming_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    bits_col: str,
    max_dist: int = 4,
    width: int = 64,
    max_block_rows: int | None = 2_000_000,
) -> DataFrame:
    """All unordered pairs whose fixed-width bit STRINGS (e.g. the
    perceptual aHash of ``multimodal.ops.image_dedup_ahash``, or any
    simhash-style fingerprint rendered as '0'/'1' chars) differ in at
    most ``max_dist`` positions — perceptual near-duplicate detection
    where exact-hash dedup only catches identical images.

    Exact recall by pigeonhole banding (the simhash rule): the string
    splits into ``max_dist + 1`` contiguous bands, and two strings
    within distance ``max_dist`` must agree VERBATIM on at least one
    band, so the candidate join on (band index, band value) misses no
    true pair; candidates are verified with the exact positional
    Hamming count, stated as per-position substr compares so a SQL
    oracle restates it character by character. Returns
    ``(id_a, id_b, dist)`` with ``id_a < id_b``.

    Rows whose bit string is NULL or not exactly ``width`` chars fail
    fast (a silent length mismatch would quietly break the pigeonhole
    guarantee). ``max_block_rows`` is the standard circuit breaker and
    is ON BY DEFAULT (the fuzzy join's convention — VERDICT r6): a band
    value shared by m rows emits O(m^2) candidate pairs on one shuffle
    key (an all-dark image corpus collapses every band onto one key and
    runs quadratic silently), so the breaker raises with guidance
    instead. Pass ``max_block_rows=None`` to opt OUT deliberately after
    sizing the corpus; the probe costs one hash aggregate over the
    banded keys, cheap next to the candidate join it guards.

    Scale shape: max_dist+1 keys per row into one equi-join, DISTINCT
    on the id pair, two id-keyed joins to attach the strings, one
    narrow verify map — candidate-bound, never all-pairs.
    """
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0: {max_dist}")
    if width < max_dist + 1:
        raise ValueError(f"width {width} < max_dist + 1 bands")
    base = df.select(F.col(id_col).alias("__id"), F.col(bits_col).alias("__bits"))
    bad = base.where(
        F.col("__bits").isNull() | (F.length("__bits") != width)
    ).limit(1).collect()
    if bad:
        raise ValueError(
            f"hamming_near_dup_pairs: a {bits_col} value is NULL or not "
            f"{width} chars (id {bad[0]['__id']!r}) — the pigeonhole "
            "bands require uniform width"
        )
    n_bands = max_dist + 1
    step = width // n_bands
    bounds = []
    start = 1
    for i in range(n_bands):
        ln = step + (1 if i < width % n_bands else 0)
        bounds.append((start, ln))
        start += ln
    keyed = base.select(
        "__id",
        "__bits",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("bi"),
                        F.col("__bits").substr(F.lit(s), F.lit(ln)).alias("bv"),
                    )
                    for i, (s, ln) in enumerate(bounds)
                ]
            )
        ).alias("__b"),
    ).select("__id", F.col("__b.bi").alias("__bi"), F.col("__b.bv").alias("__bv"))
    if max_block_rows is not None:
        worst = (
            keyed.groupBy("__bi", "__bv")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.max("c").alias("mx"))
            .first()
        )
        if worst and worst["mx"] and worst["mx"] > max_block_rows:
            raise ValueError(
                f"hamming_near_dup_pairs: a band value holds {worst['mx']} "
                f"rows (> max_block_rows={max_block_rows}); candidate "
                "generation would be quadratic on that key — near-constant "
                "fingerprints (e.g. uniform images). Dedup exact bit "
                "strings first or raise the cap deliberately."
            )
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.__bi") == F.col("b.__bi"))
            & (F.col("a.__bv") == F.col("b.__bv"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )
    ba = base.select(F.col("__id").alias("id_a"), F.col("__bits").alias("__ba"))
    bb = base.select(F.col("__id").alias("id_b"), F.col("__bits").alias("__bb"))
    dist = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.lit(width)),
            lambda i: F.when(
                F.col("__ba").substr(i, F.lit(1))
                == F.col("__bb").substr(i, F.lit(1)),
                0,
            ).otherwise(1),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        cand.join(ba, "id_a")
        .join(bb, "id_b")
        .withColumn("dist", dist)
        .where(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "dist")
    )
