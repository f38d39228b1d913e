"""Benchmark decontamination (beyond-reference training-data-pipeline
operator): flag or drop corpus documents that share word n-grams with a
held-out benchmark/eval set, the standard pre-training hygiene step.

Scale shape: the benchmark side is tiny relative to the corpus (thousands
of eval documents vs billions of training documents), so its distinct-gram
set is BROADCAST — the corpus never shuffles for the membership test; the
only corpus-sized shuffle is the per-doc hit aggregate, keyed on the doc
id. If the probe set ever outgrows broadcast range, replace the broadcast
with a plain shuffled semi-join — semantics unchanged.

Reuses the dedup module's shingle machinery (materialized words array,
fan_out, explode_outer hazards — see operators/dedup.py:69-121).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mr_dice_spark.operators.dedup import shingle_sets


def contamination_stats(
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    probe: DataFrame,
    probe_text_col: str,
    n: int = 3,
    broadcast_probe: bool = True,
) -> DataFrame:
    """Per corpus document: (id, n_grams, n_shared, share, contaminated)
    where n_shared counts the doc's distinct word n-grams that appear
    anywhere in the probe set. Docs too short to form a gram report
    n_grams=0, share=0.0, contaminated=false.

    ``broadcast_probe`` fits the benchmark-decontamination case (tiny
    held-out probe vs huge corpus); pass False when the probe side is
    itself corpus-sized (e.g. the TRAIN split in
    :func:`split_contamination_audit`) so the gram membership test runs
    as a shuffled hash join on the gram key instead of collecting the
    majority side's gram set to every executor."""
    # sets_ feeds two plan branches (the exploded probe join AND the
    # n_grams size projection); without materialization the shingle
    # transform — the most expensive stage — would execute twice
    sets_ = shingle_sets(corpus, id_col, text_col, n).localCheckpoint(eager=True)
    # probe ids are irrelevant (only the distinct gram set is used) — a
    # constant satisfies shingle_sets' id column without assuming one exists
    probe_keyed = probe.select(
        F.lit(0).alias("__pid"), F.col(probe_text_col).alias("__ptext")
    )
    probe_grams = (
        shingle_sets(probe_keyed, "__pid", "__ptext", n)
        .select(F.explode_outer("__sh").alias("__s"))
        .where(F.col("__s").isNotNull())
        .distinct()
    )
    ex = sets_.select("__id", F.explode_outer("__sh").alias("__s")).where(
        F.col("__s").isNotNull()
    )
    probe_side = F.broadcast(probe_grams) if broadcast_probe else probe_grams
    hits = ex.join(probe_side, "__s").groupBy("__id").agg(
        F.count(F.lit(1)).alias("n_shared")
    )
    out = (
        sets_.select("__id", F.size("__sh").alias("n_grams"))
        .join(hits, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            "n_grams",
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            F.when(
                F.col("n_grams") > 0,
                F.coalesce("n_shared", F.lit(0)) / F.col("n_grams"),
            ).otherwise(F.lit(0.0)).alias("share"),
            (F.coalesce("n_shared", F.lit(0)) > 0).alias("contaminated"),
        )
    )
    return out


def decontaminate(
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    probe: DataFrame,
    probe_text_col: str,
    n: int = 3,
    max_share: float = 0.0,
) -> DataFrame:
    """Drop corpus docs whose shared-gram share exceeds ``max_share``
    (default: any overlap). Anti-join on the flagged ids — corpus rows
    stream through untouched except the one key shuffle."""
    flagged = (
        contamination_stats(corpus, id_col, text_col, probe, probe_text_col, n)
        .where(F.col("share") > max_share)
        .select(id_col)
    )
    return corpus.join(flagged, id_col, "left_anti")


def split_contamination_audit(
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    splits=(("train", 0.8), ("val", 0.1), ("test", 0.1)),
    seed: str = "",
    train_split: str = "train",
    n: int = 3,
) -> DataFrame:
    """Leakage QA for a train/eval cut: assign splits deterministically
    (:func:`~mr_dice_spark.operators.sampling.split_assign`), then score
    every NON-train document's n-gram overlap against the train side —
    ``contaminated`` rows are eval documents whose content (exactly or
    near-exactly) also trains the model, the thing a decontamination pass
    exists to prevent. Run it after any split; a high contaminated share
    means the split key is wrong (row id instead of content/domain group).

    Output: ``(id, split, n_grams, n_shared, share, contaminated)`` for
    each non-train document.

    Scale shape: split assignment is a narrow CASE; the overlap test is
    :func:`contamination_stats` with ``broadcast_probe=False`` — the
    probe here is the TRAIN side, i.e. the MAJORITY of the corpus, so
    its gram set must never broadcast; the membership test shuffles on
    the gram key instead — plus one id-keyed hash join to carry the
    split label."""
    from mr_dice_spark.operators.sampling import split_assign

    assigned = split_assign(
        corpus.select(F.col(id_col), F.col(text_col)),
        id_col,
        splits=splits,
        seed=seed,
    )
    train = assigned.where(F.col("split") == train_split)
    eval_ = assigned.where(F.col("split") != train_split)
    stats = contamination_stats(
        eval_, id_col, text_col, train, text_col, n=n, broadcast_probe=False
    )
    return stats.join(eval_.select(F.col(id_col), "split"), id_col).select(
        F.col(id_col), "split", "n_grams", "n_shared", "share", "contaminated"
    )


def bloom_gram_positions(gram, m: int, k: int, seed: str = "bloom/"):
    """The ``k`` Bloom probe positions of one gram in a ``m``-bit filter:
    double hashing (Kirsch-Mitzenmacher: p_i = h1 + i*h2 mod m, which
    gives k independent-enough probes from ONE hash evaluation) over the
    two halves of the portable md5 — the same engine-portable arithmetic
    as sampling.hash_bucket, so an ANSI-SQL oracle reproduces every
    position bit-for-bit. h1, h2 < 2^32 and i < k keep the sum far from
    int64 overflow."""
    md = F.md5(F.concat(F.lit(seed), gram))
    h1 = F.conv(F.substring(md, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(md, 9, 8), 16, 10).cast("long")
    return F.array(*[((h1 + F.lit(i) * h2) % m).cast("int") for i in range(k)])


def bloom_prescreen_stats(
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    probe: DataFrame,
    probe_text_col: str,
    n: int = 3,
    m: int = 1 << 18,
    k: int = 3,
    seed: str = "bloom/",
) -> DataFrame:
    """Bloom-filter PRESCREEN for decontamination, for when the probe
    side's gram set is too large to broadcast (split_contamination_audit
    deliberately shuffles instead — this is the third regime): compress
    the probe grams to an m-BIT set-membership filter whose size is
    FIXED regardless of probe cardinality, broadcast that, and let only
    documents with at least one maybe-shared gram proceed to the exact
    (shuffled) check. No false negatives by construction — a truly
    shared gram has all k positions set — so prescreen_hit=false proves
    clean; false positives ~ (1 - e^{-k*n_set/m})^k re-check exactly.

    Returns per corpus doc: ``(id, n_grams, n_maybe_shared,
    prescreen_hit)`` where n_maybe_shared counts distinct grams whose k
    positions are ALL set.

    Scale shape: probe side collapses to <= m distinct bit positions
    (one small distinct + broadcast — KBs at any probe scale); corpus
    side explodes each gram to k (gram, position) probes, joins the
    broadcast bit set, and a gram survives iff all k matched — one
    corpus-keyed aggregate, no corpus-vs-probe shuffle at all.
    """
    if m <= 0 or k <= 0:
        raise ValueError(f"bloom_prescreen_stats: need m > 0 and k > 0, got {m=} {k=}")
    sets_ = shingle_sets(corpus, id_col, text_col, n).localCheckpoint(eager=True)
    probe_keyed = probe.select(
        F.lit(0).alias("__pid"), F.col(probe_text_col).alias("__ptext")
    )
    bits = (
        shingle_sets(probe_keyed, "__pid", "__ptext", n)
        .select(F.explode_outer("__sh").alias("__s"))
        .where(F.col("__s").isNotNull())
        .select(F.explode(bloom_gram_positions(F.col("__s"), m, k, seed)).alias("__pos"))
        .distinct()
    )
    ex = sets_.select("__id", F.explode_outer("__sh").alias("__s")).where(
        F.col("__s").isNotNull()
    )
    probes = ex.select(
        "__id", "__s",
        F.explode(bloom_gram_positions(F.col("__s"), m, k, seed)).alias("__pos"),
    )
    # a gram passes iff ALL k of its positions are set; positions within
    # one gram are distinct with overwhelming probability but CAN collide
    # (h2 small or zero), so count DISTINCT matched positions against the
    # gram's own distinct-position count, not against the literal k
    maybe = (
        probes.join(F.broadcast(bits), "__pos")
        .groupBy("__id", "__s")
        .agg(F.count_distinct("__pos").alias("__hit"))
    )
    own = probes.groupBy("__id", "__s").agg(
        F.count_distinct("__pos").alias("__need")
    )
    passed = (
        own.join(maybe, ["__id", "__s"], "left")
        .where(F.coalesce("__hit", F.lit(0)) == F.col("__need"))
        .groupBy("__id")
        .agg(F.count(F.lit(1)).alias("n_maybe_shared"))
    )
    return (
        sets_.select("__id", F.size("__sh").alias("n_grams"))
        .join(passed, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            "n_grams",
            F.coalesce("n_maybe_shared", F.lit(0)).alias("n_maybe_shared"),
            (F.coalesce("n_maybe_shared", F.lit(0)) > 0).alias("prescreen_hit"),
        )
    )
