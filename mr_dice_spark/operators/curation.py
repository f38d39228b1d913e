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
