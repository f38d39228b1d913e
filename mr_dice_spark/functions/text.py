"""Text-analysis functions for the documents pipeline (north-star surface):
tokenization, token counting, quality scoring, stopword/language heuristics,
document fingerprinting. All builtin-expression based (split/regexp/
aggregate) so they run inside whole-stage codegen at 100 TB; no Python in
the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# small English stopword list for the stopword-ratio language heuristic
EN_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "was", "at", "by", "this", "be",
)


def tokens(text_col: Column) -> Column:
    """Whitespace tokenization of trimmed text (empty text -> empty array)."""
    t = F.trim(text_col)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(text_col: Column) -> Column:
    return F.size(tokens(text_col))


def bpe_ish_token_count(text_col: Column) -> Column:
    """Sub-word-ish token count: splits on whitespace AND word/punct/digit
    boundaries (a cheap BPE stand-in: ~tokens a byte-pair encoder would not
    merge across). Useful as a token-budget estimator."""
    pieces = F.regexp_extract_all(
        F.lower(text_col), F.lit(r"[a-z]+|\d+|[^\sa-z\d]"), 0
    )
    return F.size(pieces)


def punct_ratio(text_col: Column) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    stripped = F.regexp_replace(text_col, r"[A-Za-z0-9\s]", "")
    return F.when(F.length(text_col) > 0, F.length(stripped) / F.length(text_col)).otherwise(
        F.lit(0.0)
    )


def stopword_ratio(text_col: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    """Fraction of tokens that are (lowercased) stopwords — the n-gram-free
    language-ID heuristic: high ratio => likely English."""
    toks = tokens(F.lower(text_col))
    sw = F.array(*[F.lit(w) for w in stopwords])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(text_col: Column) -> Column:
    """Composite [0,1] quality heuristic: length in a sane band, low punct
    ratio, some stopwords present. Weights are arbitrary but deterministic —
    the operator shape (cheap per-doc scoring feeding a filter) is the point.
    """
    n = F.length(text_col)
    length_ok = F.when((n >= 50) & (n <= 20000), 1.0).otherwise(
        F.when(n < 50, n / 50.0).otherwise(F.lit(20000.0) / n)
    )
    punct_ok = 1.0 - F.least(punct_ratio(text_col) * 4.0, F.lit(1.0))
    sw_ok = F.least(stopword_ratio(text_col) * 5.0, F.lit(1.0))
    return (length_ok * 0.4 + punct_ok * 0.3 + sw_ok * 0.3).cast("double")


# marker-word profiles for the n-gram language-ID heuristic; ten
# highest-frequency function words per language (public common-word lists)
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "ich", "zu"),
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "you", "that"),
    "es": ("el", "la", "que", "y", "en", "un", "es", "se", "no", "los"),
    "fr": ("le", "et", "les", "des", "une", "est", "dans", "pour", "qui", "sur"),
    "zh": ("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"),
}


def lang_score(text_col: Column, lang: str) -> Column:
    """Marker score of ``lang``: token matches for space-delimited
    languages; for zh, marker-CHARACTER occurrences in the raw text —
    unspaced Chinese never isolates single-character markers under
    whitespace tokenization, so token matching would leave zh permanently
    unreachable (every Chinese document scored 0 -> 'und')."""
    if lang == "zh":
        score = F.lit(0)
        for m in LANG_PROFILES["zh"]:
            score = score + (
                F.length(text_col) - F.length(F.replace(text_col, F.lit(m), F.lit("")))
            )
        return score.cast("int")
    toks = tokens(F.lower(text_col))
    profile = F.array(*[F.lit(w) for w in LANG_PROFILES[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(profile, t)))


def detect_language(text_col: Column, default: str = "und") -> Column:
    """Marker-word language-ID: argmax of per-language marker counts,
    alphabetically-first language on ties, ``default`` when no marker hits.

    A deliberately simple, fully-JVM heuristic (the classic stopword-profile
    method); scores compose as plain integer columns so the classifier is
    restatable in ANSI SQL for oracle parity."""
    scores = {lg: lang_score(text_col, lg) for lg in sorted(LANG_PROFILES)}
    mx = F.greatest(*scores.values())
    chain = F.when(mx == 0, F.lit(default))
    for lg in sorted(LANG_PROFILES):  # first (alphabetical) match wins ties
        chain = chain.when(scores[lg] == mx, F.lit(lg))
    return chain.otherwise(F.lit(default))


def doc_fingerprint(text_col: Column) -> Column:
    """64-bit order-sensitive document fingerprint: xxhash of the token
    stream with positions (a deterministic rolling-hash stand-in; exact-dup
    detection key)."""
    toks = tokens(text_col)
    return F.aggregate(
        F.zip_with(
            toks,
            F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1))),
            lambda t, i: F.xxhash64(t, i),
        ),
        F.lit(0).cast("long"),
        lambda acc, h: F.xxhash64(acc, h),
    )


# ---------------------------------------------------------------------------
# PII redaction (beyond-reference: standard C4/Dolma/FineWeb-style cleaning
# step for training corpora). Patterns deliberately avoid backreferences and
# lookaround so Java regex (Spark codegen) and RE2 (DuckDB oracle) agree
# token-for-token; rules apply in a fixed order (URL first: emails/IPs inside
# URLs are swallowed by <URL>; IP before phone so dotted quads are not
# re-matched as phone digits).
# ---------------------------------------------------------------------------

PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    # single-line separators only: \s would let one match swallow digit
    # runs across NEWLINES, merging separate numbers on consecutive lines.
    # Known tradeoff (no lookaround allowed for RE2 parity): ISO dates and
    # space-grouped numbers match the phone shape and are redacted too —
    # the conservative direction for a privacy scrubber.
    ("phone", r"\+?[0-9][0-9()\t .-]{6,}[0-9]", "<PHONE>"),
)


def redact_pii(text_col: Column, rules: tuple[tuple[str, str, str], ...] = PII_RULES) -> Column:
    """Replace URLs, emails, IPv4 addresses and phone-like digit runs with
    typed placeholders. A chain of builtin regexp_replace calls — one
    codegen'd projection, no UDF, embarrassingly parallel at any scale."""
    out = text_col
    for _name, pat, repl in rules:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_oracle_sql(expr: str, rules: tuple[tuple[str, str, str], ...] = PII_RULES) -> str:
    """The identical redaction chain as DuckDB SQL (RE2, 'g' flag)."""
    out = expr
    for _name, pat, repl in rules:
        p = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{repl}', 'g')"
    return out


def compression_ratio_stats(df, id_col: str, text_col: str):
    """Per-document zlib compressibility — the machine-text/repetition
    screen (highly compressible documents are boilerplate, spam, or
    generated text; near-incompressible ones are often binary junk in a
    text field): ``(id, n_bytes, n_compressed, ratio)`` with
    ``ratio = n_compressed / n_bytes`` (NULL for empty/NULL text).

    The one quality signal in this module that cannot be a codegen'd
    expression (DEFLATE needs real LZ77+Huffman state), so it takes the
    documented slow path: an Arrow-batched pandas UDF over UTF-8 bytes at
    zlib level 6 — a narrow map, no shuffle; at 100 TB it pipelines
    inside the scan stage like any other per-row transform, just on the
    Python worker pool. Deterministic for a given zlib, but there is no
    SQL restatement — the golden is rows-only and correctness is pinned
    by unit tests on known-compressible/incompressible payloads.
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    def _clen(s):
        import zlib

        return s.map(
            lambda t: None if t is None else len(zlib.compress(t.encode("utf-8"), 6))
        ).astype("Int64")

    # real annotation objects: this module's `from __future__ import
    # annotations` stringifies inline hints, which pandas_udf's eval-type
    # inference cannot resolve
    _clen.__annotations__ = {"s": pd.Series, "return": pd.Series}
    _compressed_len = pandas_udf(_clen, "long")

    nb = F.length(F.encode(F.col(text_col), "utf-8")).cast("long")
    # materialize n_compressed ONCE, then derive ratio from the column —
    # referencing the UDF expression twice would create two distinct
    # PythonUDF nodes and run zlib.compress twice per row
    base = df.select(
        F.col(id_col),
        nb.alias("n_bytes"),
        _compressed_len(F.col(text_col)).alias("n_compressed"),
    )
    return base.select(
        id_col,
        "n_bytes",
        "n_compressed",
        F.when(
            F.col("n_bytes") > 0,
            F.round(F.col("n_compressed") / F.col("n_bytes") + F.lit(1e-9), 6),
        ).alias("ratio"),
    )


def nfc_normalize(text_col: Column) -> Column:
    """Unicode NFC normalization (composed forms) — the canonicalization
    step run before any text hashing/dedup so that visually identical
    strings ('e'+COMBINING ACUTE vs the precomposed 'é') collapse to one
    byte sequence. No Spark builtin exists, so this is an Arrow-batched
    pandas UDF over Python's unicodedata (NFC is stability-guaranteed
    across Unicode versions, and DuckDB's nfc_normalize agrees — the
    golden hash-checks the parity). Narrow map, no shuffle."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _n(s):
        import unicodedata

        return s.map(
            lambda t: None if t is None else unicodedata.normalize("NFC", t)
        )

    _n.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_n, "string")(text_col)


# The common Cyrillic/Greek -> Latin confusable pairs (the high-frequency
# subset of UTS #39's confusables table — the ones spam/SEO evasion
# actually uses; a full table is a data file, not a code path). Source
# and destination strings MUST stay aligned 1:1 for translate().
_HOMOGLYPH_SRC = (
    "аеорсухіѕј"  # аеорсухіѕј
    "АВЕКМНОРСТХЅІЈ"  # АВЕКМНОРСТХЅІЈ
    "οΟΑΒΕΖΗΙΚΜΝΡΤΥΧ"  # οΟΑΒΕΖΗΙΚΜΝΡΤΥΧ
)
_HOMOGLYPH_DST = "aeopcyxisj" "ABEKMHOPCTXSIJ" "oOABEZHIKMNPTYX"
assert len(_HOMOGLYPH_SRC) == len(_HOMOGLYPH_DST)


def fold_homoglyphs(text_col: Column) -> Column:
    """Map the common Cyrillic/Greek Latin-lookalike characters to their
    Latin forms — the adversarial-dedup normalizer (spam and SEO farms
    evade exact dedup by swapping visually identical codepoints; NFC
    does NOT touch these, they are distinct letters, not combining
    forms). One codegen'd translate(), restatable verbatim in SQL."""
    return F.translate(text_col, _HOMOGLYPH_SRC, _HOMOGLYPH_DST)


def homoglyph_translate_sql(expr: str) -> str:
    """The DuckDB restatement of :func:`fold_homoglyphs` — same source
    and destination alphabets, so both engines fold identically."""
    src = _HOMOGLYPH_SRC.replace("'", "''")
    dst = _HOMOGLYPH_DST.replace("'", "''")
    return f"translate({expr}, '{src}', '{dst}')"


def readability_flesch(text_col: Column):
    """Flesch reading-ease with the portable vowel-group syllable proxy
    — the classic text-difficulty signal a quality-filtering pipeline
    bins on beside length/stopword ratios (Flesch 1948; heuristic
    syllables = maximal [aeiouy]+ runs, the standard approximation when
    no dictionary ships with the engine):

        206.835 - 1.015 * words/sentences - 84.6 * syllables/words

    Counts are ASCII-regex based (words = [a-z]+ runs of the lowercased
    text, sentences = [.!?]+ runs, floored at 1) so a DuckDB oracle
    restates them with the identical patterns; returns a struct
    ``(n_words, n_sentences, n_syllables, flesch)`` with the score
    nudge-rounded at 4. Pure column expressions — no Python crossing.
    """
    low = F.lower(text_col)
    n_words = F.size(F.regexp_extract_all(low, F.lit("[a-z]+"), F.lit(0)))
    n_sents = F.size(F.regexp_extract_all(low, F.lit("[.!?]+"), F.lit(0)))
    n_syll = F.size(F.regexp_extract_all(low, F.lit("[aeiouy]+"), F.lit(0)))
    w = F.greatest(n_words, F.lit(1)).cast("double")
    s = F.greatest(n_sents, F.lit(1)).cast("double")
    y = n_syll.cast("double")
    score = F.lit(206.835) - F.lit(1.015) * (w / s) - F.lit(84.6) * (y / w)
    return F.struct(
        n_words.cast("long").alias("n_words"),
        n_sents.cast("long").alias("n_sentences"),
        n_syll.cast("long").alias("n_syllables"),
        F.round(score + F.lit(1e-9), 4).alias("flesch"),
    )
