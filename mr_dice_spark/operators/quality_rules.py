"""Rule-based document quality filters: the Gopher repetition/shape rules
and the C4 line-level cleaning pass.

Beyond-reference training-data-pipeline operators (the reference's nearest
analogue is its projection/cleaning stage, SURVEY.md §2.2); the rules
themselves are the published heuristics every web-scale pretraining corpus
is screened with — Gopher (Rae et al. 2021, Table A1: word-count bounds,
mean word length, symbol-to-word ratio, bullet/ellipsis line fractions,
alphabetic-word fraction, required-stopword hits, duplicate-line
fractions) and C4 (Raffel et al. 2020 §2.2: keep lines ending in terminal
punctuation with at least three words, drop 'javascript' lines, drop pages
containing braces or 'lorem ipsum', drop pages with too few surviving
lines).

Scale shapes
------------
``gopher_quality_flags`` is two corpus-sized hash aggregates keyed on the
document id — one over exploded lines for the shape fractions, one over
``(doc, line)`` then ``doc`` for the duplicate-line fractions — plus a
narrow in-row pass for the whole-text signals (symbol counts, stopword
regexes), all map-side combinable; nothing global, nothing collected.

``c4_line_filter`` is a pure NARROW map: the line array is split, filtered
and re-joined per row with higher-order functions, so the operator adds no
shuffle at any scale — the cheap first pass a crawl pipeline runs before
anything that costs an exchange.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Gopher's required-stopword rule: a document must contain at least
# ``min_stopword_hits`` DISTINCT words from this list (word-boundary,
# case-sensitive — the rule targets running English prose).
GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)

BULLET_PREFIXES: tuple[str, ...] = ("-", "*", "•")  # -, *, •
ELLIPSIS_SUFFIXES: tuple[str, ...] = ("...", "…")  # ..., …


def _line_words(line: Column) -> Column:
    """Whitespace tokens of a trimmed line; '' -> empty array (a bare
    split('') would yield [''], counting one phantom word)."""
    t = F.trim(line)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def _count_occurrences(text: Column, needle: str) -> Column:
    """Non-overlapping occurrence count via length difference — stays in
    whole-stage codegen, and DuckDB's replace() counts identically."""
    return (
        F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit("")))
    ) / F.lit(len(needle))


def gopher_quality_flags(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
    min_stopword_hits: int = 2,
    max_dup_line_frac: float = 0.3,
    max_dup_line_char_frac: float = 0.2,
) -> DataFrame:
    """Per-document Gopher quality signals and the composed ``keep`` flag:
    ``(id, n_lines, n_words, mean_word_len, alpha_word_frac, symbol_ratio,
    bullet_line_frac, ellipsis_line_frac, dup_line_frac,
    dup_line_char_frac, stopword_hits, keep)``.

    Fractions are nudge-rounded to 6 places (cross-engine float hygiene);
    ratios whose denominator is zero (no words / no line chars) are NULL,
    and a NULL ratio fails its threshold — an empty document is never
    kept. ``dup_line_char_frac`` counts the characters of every occurrence
    of a repeated line BEYOND the first, over all line characters, per the
    Gopher definition.
    """
    id_ = F.col(id_col)
    lines = df.select(
        id_.alias("__id"), F.explode(F.split(F.col(text_col), "\n")).alias("__l")
    )
    lw = _line_words(F.col("__l"))
    ltrimmed = F.ltrim(F.col("__l"))
    rtrimmed = F.rtrim(F.col("__l"))
    is_bullet = F.greatest(
        *[ltrimmed.startswith(p).cast("int") for p in BULLET_PREFIXES]
    )
    is_ellipsis = F.greatest(
        *[rtrimmed.endswith(s).cast("int") for s in ELLIPSIS_SUFFIXES]
    )
    # the alpha filter runs per line over a handful of words (a non-codegen
    # HOF, but on tiny arrays and with no shuffle); the heavy counting all
    # lands in the codegen'd aggregate below
    alpha_w = F.size(F.filter(lw, lambda w: w.rlike("[A-Za-z]")))
    shape = (
        lines.select(
            "__id",
            F.size(lw).alias("__nw"),
            F.length(F.regexp_replace(F.col("__l"), r"\s+", "")).alias("__wc"),
            alpha_w.alias("__aw"),
            is_bullet.alias("__b"),
            is_ellipsis.alias("__e"),
        )
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("__nw").cast("long").alias("n_words"),
            F.sum("__wc").cast("long").alias("__word_chars"),
            F.sum("__aw").cast("long").alias("__alpha_words"),
            F.sum("__b").cast("long").alias("__bullet_lines"),
            F.sum("__e").cast("long").alias("__ellipsis_lines"),
        )
    )
    dup = (
        lines.groupBy("__id", "__l")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("__distinct_lines"),
            F.sum((F.col("__c") - 1) * F.length("__l")).alias("__dup_chars"),
            F.sum(F.col("__c") * F.length("__l")).alias("__line_chars"),
        )
    )
    t = F.col(text_col)
    # re.escape: a caller-supplied stopword containing regex metacharacters
    # ('c++', 'u.s.') must match literally, not as a pattern
    hits = sum(
        (t.rlike(rf"\b{re.escape(w)}\b").cast("int") for w in stopwords), F.lit(0)
    )
    # '…' counts like '...': the ellipsis-line rule above treats them as
    # equivalent, so the symbol ratio must too or a '…'-spammed page
    # passes the gate its ASCII-dotted twin fails
    docsig = df.select(
        id_.alias("__id"),
        (
            _count_occurrences(t, "#")
            + _count_occurrences(t, "...")
            + _count_occurrences(t, "…")
        ).alias("__symbols"),
        F.coalesce(hits, F.lit(0)).alias("stopword_hits"),
    )

    def frac(num: Column, den: Column) -> Column:
        return F.when(den > 0, F.round(num / den + F.lit(1e-9), 6))

    n_words = F.col("n_words")
    mean_wl = frac(F.col("__word_chars"), n_words)
    alpha_frac = frac(F.col("__alpha_words"), n_words)
    sym_ratio = frac(F.col("__symbols"), n_words)
    bullet_frac = frac(F.col("__bullet_lines"), F.col("n_lines"))
    ellipsis_frac = frac(F.col("__ellipsis_lines"), F.col("n_lines"))
    dup_line_frac = frac(
        F.col("n_lines") - F.col("__distinct_lines"), F.col("n_lines")
    )
    dup_char_frac = frac(F.col("__dup_chars"), F.col("__line_chars"))
    keep = (
        n_words.between(min_words, max_words)
        & mean_wl.between(min_mean_word_len, max_mean_word_len)
        & (sym_ratio <= max_symbol_ratio)
        & (bullet_frac <= max_bullet_line_frac)
        & (ellipsis_frac <= max_ellipsis_line_frac)
        & (alpha_frac >= min_alpha_word_frac)
        & (F.col("stopword_hits") >= min_stopword_hits)
        & (dup_line_frac <= max_dup_line_frac)
        & (dup_char_frac <= max_dup_line_char_frac)
    )
    # join FROM docsig (one row per input doc — the narrow whole-text
    # pass never loses rows) with the line aggregates LEFT-joined: a
    # NULL-text document produces no exploded lines, and inner joins
    # would silently drop it from the report instead of emitting the
    # keep=false row the contract promises
    return (
        docsig.join(shape, "__id", "left")
        .join(dup, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce(F.col("n_lines"), F.lit(0)).alias("n_lines"),
            F.coalesce(F.col("n_words"), F.lit(0)).alias("n_words"),
            mean_wl.alias("mean_word_len"),
            alpha_frac.alias("alpha_word_frac"),
            sym_ratio.alias("symbol_ratio"),
            bullet_frac.alias("bullet_line_frac"),
            ellipsis_frac.alias("ellipsis_line_frac"),
            dup_line_frac.alias("dup_line_frac"),
            dup_char_frac.alias("dup_line_char_frac"),
            "stopword_hits",
            F.coalesce(keep, F.lit(False)).alias("keep"),
        )
    )


# terminal punctuation accepted by the C4 line rule: . ! ? and a closing
# double quote (straight or curly) — checked on the right-trimmed line
_C4_TERMINAL_RE = '[.!?"”]$'


def c4_line_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_words_per_line: int = 3,
    min_kept_lines: int = 3,
) -> DataFrame:
    """C4 cleaning as one narrow map: per document, keep only lines that
    end in terminal punctuation, have at least ``min_words_per_line``
    words, and do not mention 'javascript' (case-insensitive); drop the
    whole page when the original text contains a curly brace or 'lorem
    ipsum', or when fewer than ``min_kept_lines`` lines survive.

    Output: ``(id, n_lines, n_kept, cleaned_text, has_brace, has_lorem,
    keep)`` — ``cleaned_text`` is the surviving lines re-joined in
    original order ('' when none survive), emitted for dropped pages too
    so downstream can audit the decision.

    The whole operator is higher-order array functions over the split
    line array — zero shuffles, zero UDFs; at 100 TB it pipelines inside
    the scan stage.
    """
    t = F.col(text_col)
    larr = F.split(t, "\n")

    def line_ok(line: Column) -> Column:
        return (
            F.rtrim(line).rlike(_C4_TERMINAL_RE)
            & (F.size(_line_words(line)) >= min_words_per_line)
            & ~F.lower(line).contains("javascript")
        )

    kept = F.filter(larr, line_ok)
    has_brace = t.contains("{") | t.contains("}")
    has_lorem = F.lower(t).contains("lorem ipsum")
    n_kept = F.size(kept)
    keep = ~has_brace & ~has_lorem & (n_kept >= min_kept_lines)
    # NULL text: split/size/contains all go NULL, and a NULL keep is
    # invisible to BOTH keep and ~keep filters downstream — coalesce to
    # the dropped-empty-page shape instead (same fail-closed contract as
    # gopher_quality_flags)
    return df.select(
        F.col(id_col),
        F.coalesce(F.size(larr), F.lit(0)).alias("n_lines"),
        F.coalesce(n_kept, F.lit(0)).alias("n_kept"),
        F.coalesce(F.array_join(kept, "\n"), F.lit("")).alias("cleaned_text"),
        F.coalesce(has_brace, F.lit(False)).alias("has_brace"),
        F.coalesce(has_lorem, F.lit(False)).alias("has_lorem"),
        F.coalesce(keep, F.lit(False)).alias("keep"),
    )
