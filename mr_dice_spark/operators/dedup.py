"""Deduplication operator family (north-star pipeline operators).

The reference's own dedup surface is (a) first-wins id dedup across
providers (Optimade_Server/utils.py:398,426-431 — SURVEY.md §2.7 D1) and
(b) blocked near-duplicate structure detection: block on reduced formula,
band on relative energy, verify pairwise (openlam_database/openlam/
lam_optimize/main.py:102-122 — D4). This module generalizes both to the
LLM-training-data shapes: exact content dedup, MinHash+LSH, SimHash, and
exact n-gram Jaccard joins.

Scale notes (100 TB):
* signatures are computed entirely JVM-side with array expressions over a
  per-row shingle array — no shuffle, no Python;
* candidate generation shuffles only (id, band_key) pairs, never documents;
* verification joins shingle SETS for candidate pairs only (LSH prunes the
  quadratic pair space to near-linear);
* representative selection is the reference's deterministic first-wins rule
  (min id wins), not iterative connected components — documented
  approximation, one extra shuffle instead of O(diameter) rounds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def dedup_exact(df: DataFrame, content_cols: list[str], id_col: str) -> DataFrame:
    """Exact dedup on a content hash; deterministic keeper = min id.

    Hash-groupBy shape: one shuffle on the 256-bit content digest (collision
    probability negligible), map-side combine applies.
    """
    h = F.sha2(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in content_cols]), 256)
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
# shingling + MinHash + LSH
# ---------------------------------------------------------------------------

def word_shingles(text_col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array column — pure JVM
    expression (split + transform over an index sequence), no UDF."""
    words = F.split(F.trim(text_col), r"\s+")
    k = F.greatest(F.size(words) - (n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, (i + j).cast("int")) for j in range(n)]
        ),
    )
    return F.array_distinct(F.when(k > 0, grams).otherwise(F.array()))


def minhash_signature(shingles_col: Column, num_hashes: int = 128) -> Column:
    """MinHash signature: sig[i] = min over shingles of xxhash64(shingle, i).

    xxhash64 with the seed column appended gives ``num_hashes`` independent
    hash families; array_min/transform keep it all inside codegen.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(F.transform(shingles_col, lambda s: F.xxhash64(s, i))),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    num_hashes: int = 128,
    bands: int = 32,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash LSH.

    Returns (id_a, id_b, jaccard) with id_a < id_b and EXACT jaccard computed
    on the candidates' shingle sets (LSH proposes, exact verify disposes).
    """
    rows_per_band = num_hashes // bands
    base = df.select(
        F.col(id_col).alias("__id"), word_shingles(F.col(text_col), shingle_n).alias("__sh")
    ).where(F.size("__sh") > 0)
    sig = base.withColumn("__sig", minhash_signature(F.col("__sh"), num_hashes))

    band_keys = sig.select(
        "__id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(",", F.slice(F.col("__sig"), b * rows_per_band + 1, rows_per_band)),
                ),
            )
        ).alias("__band", "__key"),
    )
    cand = (
        band_keys.alias("x")
        .join(
            band_keys.alias("y"),
            (F.col("x.__band") == F.col("y.__band"))
            & (F.col("x.__key") == F.col("y.__key"))
            & (F.col("x.__id") < F.col("y.__id")),
        )
        .select(F.col("x.__id").alias("id_a"), F.col("y.__id").alias("id_b"))
        .distinct()
    )
    sh = base.select(F.col("__id"), F.col("__sh"))
    return (
        cand.join(sh.withColumnsRenamed({"__id": "id_a", "__sh": "__sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"__id": "id_b", "__sh": "__sh_b"}), "id_b")
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

def simhash64(tokens_col: Column) -> Column:
    """64-bit SimHash of a token array, entirely in array expressions.

    For each bit b: sum over tokens of (+1 if bit set else -1); the sign
    forms the fingerprint bit. shiftright+bitwise keeps it JVM-side.
    """
    hashes = F.transform(tokens_col, lambda t: F.xxhash64(t))
    bit_votes = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda b: F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, b.cast("int")).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        ),
    )
    return F.aggregate(
        F.zip_with(
            bit_votes,
            F.sequence(F.lit(0), F.lit(63)),
            lambda v, b: F.when(v > 0, F.shiftleft(F.lit(1).cast("long"), b.cast("int"))).otherwise(
                F.lit(0).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )


def simhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs within hamming distance ``max_hamming``.

    Banding by pigeonhole: split the 64-bit fingerprint into
    ``max_hamming + 1`` chunks — any pair within the distance budget agrees
    exactly on at least one chunk, so an equi-join per chunk finds all pairs
    without a cartesian product. Returns (id_a, id_b, hamming).
    """
    chunks = max_hamming + 1
    width = 64 // chunks
    fp = df.select(
        F.col(id_col).alias("__id"),
        simhash64(F.split(F.trim(F.col(text_col)), r"\s+")).alias("__fp"),
    )
    keyed = fp.select(
        "__id",
        "__fp",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(chunks - 1)),
                lambda c: F.shiftrightunsigned(F.col("__fp"), (c * width).cast("int"))
                .bitwiseAND(F.lit((1 << width) - 1).cast("long")),
            )
        ).alias("__chunk", "__key"),
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

    Scale note: fan-out is bounded by shingle document frequency; for
    heavy-tailed corpora, drop ultra-frequent shingles (stop-shingles)
    before the join or switch to the LSH variant.
    """
    sh = (
        df.select(
            F.col(id_col).alias("__id"), word_shingles(F.col(text_col), shingle_n).alias("__sh")
        )
        .where(F.size("__sh") > 0)
        .select("__id", F.size("__sh").alias("__n"), F.explode("__sh").alias("__s"))
    )
    inter = (
        sh.alias("x")
        .join(
            sh.alias("y"),
            (F.col("x.__s") == F.col("y.__s")) & (F.col("x.__id") < F.col("y.__id")),
        )
        .groupBy(
            F.col("x.__id").alias("id_a"),
            F.col("y.__id").alias("id_b"),
            F.col("x.__n").alias("__na"),
            F.col("y.__n").alias("__nb"),
        )
        .agg(F.count(F.lit(1)).alias("__i"))
    )
    return inter.select(
        "id_a",
        "id_b",
        (F.col("__i") / (F.col("__na") + F.col("__nb") - F.col("__i"))).alias("jaccard"),
    ).where(F.col("jaccard") >= threshold)
