"""Corpus curation: the end-to-end keep/drop gate of a training-data
pipeline, composing the text-quality signals into one verdict per document.

The reference has no corpus operators (north-star extension; nearest
analogue is the cleaning/projection stage, SURVEY.md §2.2 P20); the rule
set here is the standard C4/Gopher-style cascade: exact-duplicate removal,
length gate, language gate, stopword-density gate. Every signal is a JVM
expression (no UDF) and the whole verdict is restatable in ANSI SQL, so
the operator is oracle-checkable end to end.

Scale shape: one window shuffle keyed by the text hash (the dedup rank),
then a single narrow pass for every other signal — the cascade adds zero
joins. At 100 TB the hash-window is the only exchange, and it is the same
shuffle an exact-dedup pass would need anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mr_dice_spark.functions.text import (
    detect_language,
    stopword_ratio,
    tokens,
)


def curate_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 25,
    min_stopword_ratio: float = 0.02,
) -> DataFrame:
    """Per-document curation verdict: ``(id, n_tokens, detected_lang,
    verdict, reason)`` where ``reason`` is the FIRST failing rule of

    1. ``exact_dup``   — not the lowest-id holder of this exact text
    2. ``too_short``   — fewer than ``min_tokens`` whitespace tokens
    3. ``lang_und``    — no language-marker words at all
    4. ``low_stopword``— stopword density under ``min_stopword_ratio``

    and ``'ok'`` (verdict ``keep``) otherwise. Deterministic: the
    canonical duplicate is the lowest id, ties in language detection break
    alphabetically (see :func:`detect_language`).
    """
    # NULL text folds to '' up front: md5(NULL) is NULL and window
    # partitioning groups all NULLs together, which would mislabel every
    # NULL-text doc after the first as 'exact_dup' (and NULL-propagate
    # n_tokens); as '' they take the honest too_short path
    t = F.coalesce(F.col(text_col), F.lit(""))
    w = Window.partitionBy(F.md5(t)).orderBy(F.col(id_col))
    sig = df.select(
        F.col(id_col),
        F.size(tokens(t)).cast("long").alias("n_tokens"),
        detect_language(t).alias("detected_lang"),
        stopword_ratio(t).alias("__swr"),
        F.row_number().over(w).alias("__dup_rank"),
    )
    reason = (
        F.when(F.col("__dup_rank") > 1, F.lit("exact_dup"))
        .when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
        .when(F.col("detected_lang") == "und", F.lit("lang_und"))
        .when(F.col("__swr") < min_stopword_ratio, F.lit("low_stopword"))
        .otherwise(F.lit("ok"))
    )
    return sig.select(
        F.col(id_col),
        "n_tokens",
        "detected_lang",
        reason.alias("reason"),
        F.when(reason == "ok", F.lit("keep")).otherwise(F.lit("drop")).alias("verdict"),
    )


def quantile_length_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    low: float = 0.05,
    high: float = 0.95,
    boundary_eps: float = 1e-6,
) -> DataFrame:
    """Adaptive length-outlier gate: keep documents whose whitespace token
    count lies within the corpus's own exact [low, high] quantiles —
    C4/Gopher-style outlier removal whose thresholds TRACK the corpus
    instead of hardcoding magic numbers that rot as the mixture shifts.

    Output: the input columns plus ``n_tokens``; rows outside the band are
    dropped. Quantiles are exact linear-interpolated (``percentile``, the
    same semantics as SQL ``quantile_cont``), so the gate is restatable in
    ANSI SQL for oracle parity.

    ``boundary_eps`` widens the band by a hair: the metric is
    integer-valued but the interpolated bound is a double, and when the
    bound lands EXACTLY on an integer a one-ulp cross-engine difference in
    the interpolation arithmetic would flip every document sitting on the
    boundary. Widening by 1e-6 (far below the integer grid, far above
    double noise) makes the comparison decision identical everywhere.

    Scale shape: one aggregate pass for the two bounds (a 1-row result,
    broadcast back against the corpus — BroadcastNestedLoopJoin on a
    scalar, never a CartesianProduct) plus one narrow filter pass; no
    corpus-sized shuffle at any size.
    """
    if not 0.0 <= low <= high <= 1.0:
        raise ValueError(f"need 0 <= low <= high <= 1, got {low}, {high}")
    sized = df.withColumn(
        "n_tokens",
        F.size(tokens(F.coalesce(F.col(text_col), F.lit("")))).cast("long"),
    )
    bounds = sized.agg(
        F.percentile("n_tokens", F.lit(low)).alias("__lo"),
        F.percentile("n_tokens", F.lit(high)).alias("__hi"),
    )
    return (
        sized.crossJoin(F.broadcast(bounds))
        .where(
            (F.col("n_tokens") >= F.col("__lo") - boundary_eps)
            & (F.col("n_tokens") <= F.col("__hi") + boundary_eps)
        )
        .drop("__lo", "__hi")
    )


def quality_percentile_blend(
    df: DataFrame,
    id_col: str,
    signals: dict[str, float],
    n_bins: int = 100,
) -> DataFrame:
    """Blend heterogeneous quality signals into one comparable score by
    QUANTILE NORMALIZATION: each signal maps to its percentile bucket
    midpoint ``(bucket - 0.5) / n_bins`` against the signal's own exact
    quantile edges, then the blend is the weight-normalized mean of the
    percentiles. Raw signals live on incompatible scales (token counts
    vs ratios vs log-probs); percentile space makes a weighted average
    meaningful — the standard multi-signal curation ranker.

    Returns the id, one ``pct_<signal>`` column per signal, and
    ``blend_score``, all nudge-rounded to 6. Rows with a NULL signal get
    NULL for that percentile and are EXCLUDED from the blend's weight
    mass for that row (renormalized over present signals; a row with
    all signals NULL gets a NULL blend).

    Scale shape: the scalable alternative to a global percent_rank —
    ranking needs a full sort (and the window form is the banned
    single-partition shape), while this is one bounded edge collect per
    signal (n_bins-1 floats, the PSI/kmeans altitude) followed by a
    single NARROW projection: bucket lookups are literal folds, so the
    whole scoring pass is one scan with no shuffle at all. Resolution
    is 1/n_bins of a true percent_rank — raise n_bins if the blend
    feeds a tight selection threshold."""
    from mr_dice_spark.operators.profile import psi_bucket, psi_edges

    if not signals:
        raise ValueError("signals must be non-empty")
    if any(w <= 0 for w in signals.values()):
        raise ValueError(f"signal weights must be positive: {signals}")
    pct_cols = {}
    for sig in signals:
        edges = psi_edges(df, sig, n_bins)
        pct = (psi_bucket(F.col(sig), edges).cast("double") - 0.5) / n_bins
        pct_cols[sig] = F.when(
            F.col(sig).isNotNull(), F.round(pct + F.lit(1e-9), 6)
        )
    wsum = None
    psum = None
    for sig, w in signals.items():
        wpart = F.when(F.col(sig).isNotNull(), F.lit(float(w))).otherwise(
            F.lit(0.0)
        )
        ppart = F.coalesce(pct_cols[sig] * F.lit(float(w)), F.lit(0.0))
        wsum = wpart if wsum is None else wsum + wpart
        psum = ppart if psum is None else psum + ppart
    blend = F.when(wsum > 0, F.round(psum / wsum + F.lit(1e-9), 6))
    return df.select(
        F.col(id_col),
        *[pct_cols[s].alias(f"pct_{s}") for s in signals],
        blend.alias("blend_score"),
    )


def perplexity_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
    n_buckets: int = 3,
    labels: tuple[str, ...] = ("head", "middle", "tail"),
) -> DataFrame:
    """CCNet-style perplexity bucketing: score every document with the
    corpus-self-trained bigram LM (operators.terms.bigram_lm_score),
    then cut each ``group_col`` population into ``n_buckets`` equal-count
    quantile buckets by score — bucket 'head' is the most fluent third,
    'tail' the least, the partition CCNet uses to keep head+middle and
    audit tail. Output: (id, group, ppl, bucket) where ppl is the
    nudge-rounded avg negative logprob. Documents with fewer than two
    tokens have no bigram score and are ABSENT (they never reach the LM;
    gate them upstream with quantile_length_filter).

    Determinism: buckets come from NTILE over (quantized ppl, id) — the
    rounding grid absorbs float summation-order noise and the id
    tiebreak pins equal scores, so the assignment survives any shuffle
    layout and restates verbatim in SQL.

    Scale shape: the LM scoring is bigram_lm_score's aggregates; the cut
    is ONE group-keyed window sort (per-language sort is the honest cost
    of CCNet's exact equal-count split — with few groups and large
    populations, swap the NTILE for percentile EDGES computed per group
    (a groups x (n_buckets-1) dim, broadcast back) when the corpus
    outgrows per-group sorts; the exact split is the oracle-checked
    reference semantics)."""
    from mr_dice_spark.operators.terms import bigram_lm_score

    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2: {n_buckets}")
    if len(labels) != n_buckets:
        raise ValueError(
            f"labels must have exactly n_buckets={n_buckets} entries: {labels}"
        )
    scored = bigram_lm_score(df, id_col, text_col).select(
        id_col, F.round(F.col("avg_neg_logprob") + F.lit(1e-9), 6).alias("ppl")
    )
    w = Window.partitionBy(group_col).orderBy("ppl", id_col)
    tile = F.ntile(n_buckets).over(w)
    label = F.element_at(F.array(*[F.lit(x) for x in labels]), tile)
    return (
        df.select(id_col, group_col)
        .join(scored, id_col)
        .select(id_col, group_col, "ppl", label.alias("bucket"))
    )


def dsir_importance_select(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_col: str,
    k: int,
    buckets: int = 256,
    seed: str = "dsir/",
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023):
    pick the ``k`` pool documents whose hashed-unigram distribution looks
    most like a target domain, by Gumbel-top-k over importance weights.

    ``target_col`` (boolean) marks the in-domain sample. Features are
    lowercased word unigrams hashed into ``buckets`` cells with the
    engine-portable md5 hash; the target and pool cell distributions get
    Laplace (+1) smoothing, each document scores
    ``logw = Σ_grams ln(p_target(cell)/p_pool(cell))``, and selection
    adds deterministic Gumbel noise ``-ln(-ln(u))`` (u from the id hash)
    so the draw is a true sample-without-replacement, reproducible and
    SQL-restatable end to end.

    Returns the selected rows: ``(id, logw, gumbel_key)``, highest key
    first by construction but unordered in the plan (the caller sorts).

    Scale shape: one narrow explode over tokens, two ``buckets``-sized
    cell aggregates joined back as a BROADCAST dim (bounded by the
    parameter, never the corpus), one (id) aggregation for the per-doc
    sum, and TakeOrderedAndProject for the top-k — no global sort, no
    corpus-sized build side. The gram aggregation is the same shuffle
    class as TF-IDF; everything else is map-side.
    """
    from mr_dice_spark.operators.sampling import hash_bucket

    if k <= 0:
        raise ValueError(f"k must be positive: {k}")
    if buckets <= 0:
        raise ValueError(f"buckets must be positive: {buckets}")
    b_lit = float(buckets)
    # ONE tokenize/explode pass: gram instances collapse to per-(id, t,
    # cell) counts immediately, and both the cell distributions and the
    # per-doc scores derive from that aggregate — the corpus-wide regex
    # split (the dominant scan cost) is never evaluated twice, and the
    # scoring join's input shrinks from gram instances to at most
    # |docs| x |buckets| rows
    doc_cells = (
        df.select(
            F.col(id_col).alias("__id"),
            F.col(target_col).alias("__t"),
            F.explode(F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), "[^a-z]+")).alias("__g"),
        )
        .where(F.col("__g") != "")
        .groupBy(
            "__id", "__t", (hash_bucket(F.col("__g"), seed) % buckets).alias("__b")
        )
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    counts = doc_cells.groupBy("__b").agg(
        F.sum(F.when(F.col("__t"), F.col("__cnt")).otherwise(0)).alias("__ct"),
        F.sum("__cnt").alias("__cp"),
    )
    totals = counts.agg(F.sum("__ct").alias("__nt"), F.sum("__cp").alias("__np"))
    cells = counts.crossJoin(F.broadcast(totals)).select(
        "__b",
        (
            F.log((F.col("__ct") + 1.0) / (F.col("__nt") + b_lit))
            - F.log((F.col("__cp") + 1.0) / (F.col("__np") + b_lit))
        ).alias("__lr"),
    )
    scored = (
        doc_cells.join(F.broadcast(cells), "__b")
        .groupBy("__id")
        .agg(F.sum(F.col("__cnt") * F.col("__lr")).alias("logw"))
    )
    ids = df.select(F.col(id_col).alias("__id"))
    u = (hash_bucket(F.col("__id"), seed + "gumbel/") + 0.5) / 4294967296.0
    keyed = (
        ids.join(scored, "__id", "left")
        .select(
            "__id",
            F.coalesce(F.col("logw"), F.lit(0.0)).alias("logw"),
            (
                F.coalesce(F.col("logw"), F.lit(0.0)) + (-F.log(-F.log(u)))
            ).alias("gumbel_key"),
        )
    )
    return (
        keyed.orderBy(F.col("gumbel_key").desc(), F.col("__id"))
        .limit(k)
        .withColumnRenamed("__id", id_col)
    )
