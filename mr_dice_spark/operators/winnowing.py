"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003;
the MOSS algorithm). Beyond-reference pipeline operator: the guarantee-
bearing fingerprint scheme for substring-level duplicate detection —
any shared substring of length >= window + k - 1 produces at least one
SHARED fingerprint, a property MinHash (whole-set similarity) and
SimHash (global distance) do not give.

Spark shape: all codegen'd array expressions, zero UDFs, zero shuffles
for extraction —

1. normalize: lowercase + whitespace collapse (fingerprints should not
   change with formatting),
2. k-gram hashes: ``transform(sequence(...), i -> hash(substr(s,i,k)))``.
   A classic CPU rolling hash reuses the previous gram's value; that
   recurrence is inexpressible in pure SQL, so each gram hashes its own
   substring — O(n*k) instead of O(n), a constant-factor trade that
   keeps the whole operator inside whole-stage codegen (the same call
   made for MinHash signatures, PERFORMANCE.md finding 1),
3. winnow: per sliding window of ``window`` consecutive gram hashes,
   keep the minimum; distinct survivors are the fingerprint set. The
   window minimum is ``array_min(slice(...))`` per position — O(n*w)
   array arithmetic, again codegen'd.

``portable=True`` switches xxhash64 to the md5-derived 60-bit hash an
ANSI-SQL oracle reproduces bit-for-bit (operators/dedup.portable_hash60).

Selection-count intuition: winnowing keeps ~2/(window+1) of the gram
hashes, so fingerprint storage is a tunable fraction of document size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mr_dice_spark.operators.dedup import portable_hash60


def _normalized(text_col: Column) -> Column:
    return F.lower(F.regexp_replace(F.trim(text_col), r"\s+", " "))


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    window: int = 4,
    portable: bool = False,
) -> DataFrame:
    """(id, fingerprint) — one row per distinct winnowed k-gram hash.

    Documents shorter than ``k`` normalized characters yield no rows;
    documents with fewer than ``window`` grams yield the single minimum
    (the only window). Deterministic: equal texts (up to case/whitespace)
    produce identical fingerprint sets.
    """
    if k <= 0 or window <= 0:
        raise ValueError(f"k and window must be > 0, got k={k} window={window}")
    s = _normalized(F.col(text_col))
    n = F.length(s)
    n_grams = n - (k - 1)

    def gram_hash(i: Column) -> Column:
        sub = s.substr(i, F.lit(k))
        return portable_hash60(sub) if portable else F.xxhash64(sub)

    grams = F.when(
        n_grams >= 1,
        F.transform(F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1))), gram_hash),
    ).otherwise(F.array().cast("array<bigint>"))
    n_windows = F.greatest(F.size("__g") - (window - 1), F.lit(1))
    mins = F.when(
        F.size("__g") > 0,
        F.transform(
            F.sequence(F.lit(1), n_windows),
            lambda j: F.array_min(F.slice(F.col("__g"), j, window)),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return (
        df.select(F.col(id_col).alias("__id"), grams.alias("__g"))
        .select("__id", F.explode(F.array_distinct(mins)).alias("fingerprint"))
        .select(F.col("__id").alias(id_col), "fingerprint")
    )


def fingerprint_overlap_join(
    fps: DataFrame, id_col: str, min_shared: int = 2
) -> DataFrame:
    """(id_a, id_b, shared) for pairs sharing >= ``min_shared`` winnowed
    fingerprints — the MOSS ranking join. Inverted-index shape: one
    shuffle on the fingerprint, map-side-combined pair counting; posting
    lists are bounded because winnowing keeps ~2/(w+1) of gram hashes and
    common boilerplate collapses to few distinct fingerprints (drop
    ultra-frequent fingerprints first on heavy-tailed corpora, exactly
    the stop-shingle rule of the Jaccard join)."""
    l, r = fps.alias("x"), fps.alias("y")
    return (
        l.join(
            r,
            (F.col(f"x.fingerprint") == F.col(f"y.fingerprint"))
            & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
        )
        .groupBy(
            F.col(f"x.{id_col}").alias("id_a"), F.col(f"y.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
