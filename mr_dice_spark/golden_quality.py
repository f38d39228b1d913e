"""Golden corpus part 9: rule-based quality filtering and tokenizer
statistics — the Gopher document gate, the C4 line-cleaning pass, BPE
pair counts, and n-gram novelty.

All four are beyond-reference training-data operators (nearest reference
analogue: the projection/cleaning stage, SURVEY.md §2.2) implementing the
published heuristics (Rae et al. 2021 Table A1; Raffel et al. 2020 §2.2;
Sennrich et al. 2016) that screen every web-scale pretraining corpus.

The documents fixture is single-line word salad, so the two line-level
goldens reshape it into deterministic multi-line pages first (the same
8-word-chunk device as ``line_dedup_boilerplate``), planting duplicate
lines / terminal punctuation / 'javascript' / braces / 'lorem ipsum'
markers arithmetically from ``doc_id`` so both engines rebuild the exact
same corpus and every rule fires on some page.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mr_dice_spark.catalog import Catalog
from mr_dice_spark.golden import _r, golden

# ---------------------------------------------------------------------------
# shared reshape: 8-word lines
# ---------------------------------------------------------------------------

_CHUNK = 8

# DuckDB restatement of the 8-word-line list (before any per-golden
# decoration); ``w`` is the whitespace-token list CTE column
_CHUNKS_SQL = (
    "list_transform("
    "  generate_series(0, CAST(ceil(len(w) / 8.0) AS INT) - 1),"
    "  i -> array_to_string(list_slice(w, i * 8 + 1, i * 8 + 8), ' '))"
)


def _word_chunks(w):
    nch = F.ceil(F.size(w) / F.lit(float(_CHUNK))).cast("int")
    return F.transform(
        F.sequence(F.lit(0), nch - 1),
        lambda i: F.array_join(F.slice(w, i * F.lit(_CHUNK) + 1, _CHUNK), " "),
    )


# ---------------------------------------------------------------------------
# Gopher document gate
# ---------------------------------------------------------------------------

# the fixture vocabulary only contains 'the' and 'a' from Gopher's English
# stopword list, so the golden requires fixture-frequent words instead —
# the RULE under test (>= 2 distinct required words present, word-boundary
# match) is unchanged
_GOPHER_STOPS = ("the", "a", "data", "table")
_MIN_WORDS = 30

_G_STOP_SQL = " + ".join(
    f"(CASE WHEN regexp_matches(text, '\\b{w}\\b') THEN 1 ELSE 0 END)"
    for w in _GOPHER_STOPS
)

GOPHER_ORACLE = rf"""
WITH tok AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
),
lined AS (
  SELECT doc_id,
         array_to_string(
           CASE WHEN doc_id % 6 = 0
                THEN list_concat({_CHUNKS_SQL}, [({_CHUNKS_SQL})[1], ({_CHUNKS_SQL})[1]])
                ELSE {_CHUNKS_SQL} END,
           chr(10)) AS text
  FROM tok
),
lines AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS l FROM lined),
perline AS (
  SELECT doc_id, l,
    CASE WHEN trim(l) = '' THEN 0
         ELSE len(string_split_regex(trim(l), '\s+')) END AS nw,
    length(regexp_replace(l, '\s+', '', 'g')) AS wc,
    CASE WHEN trim(l) = '' THEN 0
         ELSE len(list_filter(string_split_regex(trim(l), '\s+'),
                              x -> regexp_matches(x, '[A-Za-z]'))) END AS aw,
    CASE WHEN ltrim(l) LIKE '-%' OR ltrim(l) LIKE '*%' OR ltrim(l) LIKE '•%'
         THEN 1 ELSE 0 END AS b,
    CASE WHEN rtrim(l) LIKE '%...' OR rtrim(l) LIKE '%…'
         THEN 1 ELSE 0 END AS e
  FROM lines
),
shape AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(nw) AS BIGINT) AS n_words,
         CAST(sum(wc) AS BIGINT) AS word_chars,
         CAST(sum(aw) AS BIGINT) AS alpha_words,
         CAST(sum(b) AS BIGINT) AS bullets,
         CAST(sum(e) AS BIGINT) AS ells
  FROM perline GROUP BY doc_id
),
dl AS (SELECT doc_id, l, count(*) AS c FROM lines GROUP BY doc_id, l),
dup AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS distinct_lines,
         CAST(sum((c - 1) * length(l)) AS BIGINT) AS dup_chars,
         CAST(sum(c * length(l)) AS BIGINT) AS line_chars
  FROM dl GROUP BY doc_id
),
docsig AS (
  SELECT doc_id,
         (length(text) - length(replace(text, '#', ''))) / 1.0
           + (length(text) - length(replace(text, '...', ''))) / 3.0
           + (length(text) - length(replace(text, '…', ''))) / 1.0 AS symbols,
         CAST({_G_STOP_SQL} AS INT) AS stopword_hits
  FROM lined
),
m AS (
  SELECT s.doc_id, s.n_lines, s.n_words,
    CASE WHEN s.n_words > 0
         THEN ROUND(1e-9 + CAST(s.word_chars AS DOUBLE) / s.n_words, 6) END AS mean_word_len,
    CASE WHEN s.n_words > 0
         THEN ROUND(1e-9 + CAST(s.alpha_words AS DOUBLE) / s.n_words, 6) END AS alpha_word_frac,
    CASE WHEN s.n_words > 0
         THEN ROUND(1e-9 + g.symbols / s.n_words, 6) END AS symbol_ratio,
    CASE WHEN s.n_lines > 0
         THEN ROUND(1e-9 + CAST(s.bullets AS DOUBLE) / s.n_lines, 6) END AS bullet_line_frac,
    CASE WHEN s.n_lines > 0
         THEN ROUND(1e-9 + CAST(s.ells AS DOUBLE) / s.n_lines, 6) END AS ellipsis_line_frac,
    CASE WHEN s.n_lines > 0
         THEN ROUND(1e-9 + CAST(s.n_lines - d.distinct_lines AS DOUBLE) / s.n_lines, 6) END AS dup_line_frac,
    CASE WHEN d.line_chars > 0
         THEN ROUND(1e-9 + CAST(d.dup_chars AS DOUBLE) / d.line_chars, 6) END AS dup_line_char_frac,
    g.stopword_hits
  FROM shape s JOIN dup d USING (doc_id) JOIN docsig g USING (doc_id)
)
SELECT *, COALESCE(
    n_words BETWEEN {_MIN_WORDS} AND 100000
    AND mean_word_len BETWEEN 3.0 AND 10.0
    AND symbol_ratio <= 0.1
    AND bullet_line_frac <= 0.9
    AND ellipsis_line_frac <= 0.3
    AND alpha_word_frac >= 0.8
    AND stopword_hits >= 2
    AND dup_line_frac <= 0.3
    AND dup_line_char_frac <= 0.2, false) AS keep
FROM m
ORDER BY doc_id
"""


@golden(
    "gopher_quality_gate",
    GOPHER_ORACLE,
    tags=("text", "quality", "gopher", "filter"),
)
def gopher_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule gate (Rae et al. 2021 Table A1) over the corpus
    reshaped into 8-word lines, with every sixth document's first line
    planted twice more so the duplicate-line rules fire. Two doc-keyed
    hash aggregates + a narrow whole-text pass; see
    operators/quality_rules.py for the 100 TB shape."""
    from mr_dice_spark.operators.quality_rules import gopher_quality_flags

    docs = Catalog(spark, sf_dir).documents
    w = F.split(F.trim(F.col("text")), r"\s+")
    chunks = _word_chunks(w)
    first = F.slice(chunks, 1, 1)
    lines = F.when(
        F.col("doc_id") % 6 == 0, F.concat(chunks, first, first)
    ).otherwise(chunks)
    lined = docs.select("doc_id", F.array_join(lines, "\n").alias("text"))
    return gopher_quality_flags(
        lined,
        "doc_id",
        "text",
        min_words=_MIN_WORDS,
        stopwords=_GOPHER_STOPS,
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# C4 line-cleaning pass
# ---------------------------------------------------------------------------

# per-line decoration: (doc_id + i) % 4 selects '', '.', '!', or a
# javascript marker, so each page mixes kept lines, punctuation-less
# drops, and javascript drops; every 11th page gains a brace line and
# every 13th a lorem-ipsum line (page-level drops)
_C4_SUFFIXES = ("", ".", "!", ". javascript")

C4_ORACLE = rf"""
WITH tok AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
),
lined AS (
  SELECT doc_id,
         array_to_string(
           list_concat(
             list_concat(
               list_transform(
                 generate_series(0, CAST(ceil(len(w) / 8.0) AS INT) - 1),
                 i -> array_to_string(list_slice(w, i * 8 + 1, i * 8 + 8), ' ')
                      || (['', '.', '!', '. javascript'])[CAST((doc_id + i) % 4 AS INT) + 1]),
               CASE WHEN doc_id % 11 = 0 THEN ['{{ config }}.'] ELSE [] END),
             CASE WHEN doc_id % 13 = 0 THEN ['lorem ipsum dolor.'] ELSE [] END),
           chr(10)) AS text
  FROM tok
),
f AS (
  SELECT doc_id, text,
         string_split(text, chr(10)) AS larr,
         list_filter(string_split(text, chr(10)),
           x -> regexp_matches(rtrim(x), '[.!?"”]$')
                AND (CASE WHEN trim(x) = '' THEN 0
                          ELSE len(string_split_regex(trim(x), '\s+')) END) >= 3
                AND NOT contains(lower(x), 'javascript')) AS kept
  FROM lined
)
SELECT doc_id,
       CAST(len(larr) AS INT) AS n_lines,
       CAST(len(kept) AS INT) AS n_kept,
       COALESCE(array_to_string(kept, chr(10)), '') AS cleaned_text,
       (contains(text, '{{') OR contains(text, '}}')) AS has_brace,
       contains(lower(text), 'lorem ipsum') AS has_lorem,
       (NOT (contains(text, '{{') OR contains(text, '}}'))
        AND NOT contains(lower(text), 'lorem ipsum')
        AND len(kept) >= 3) AS keep
FROM f
ORDER BY doc_id
"""


@golden(
    "c4_line_cleaning",
    C4_ORACLE,
    tags=("text", "quality", "c4", "filter", "lines"),
)
def c4_line_cleaning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 cleaning pass (Raffel et al. 2020 §2.2) over deterministically
    decorated 8-word lines. The operator is one narrow higher-order-
    function map — zero shuffles; the only exchange below is the final
    presentation sort."""
    from mr_dice_spark.operators.quality_rules import c4_line_filter

    docs = Catalog(spark, sf_dir).documents
    w = F.split(F.trim(F.col("text")), r"\s+")
    nch = F.ceil(F.size(w) / F.lit(float(_CHUNK))).cast("int")
    suffixes = F.array(*[F.lit(s) for s in _C4_SUFFIXES])
    chunks = F.transform(
        F.sequence(F.lit(0), nch - 1),
        lambda i: F.concat(
            F.array_join(F.slice(w, i * F.lit(_CHUNK) + 1, _CHUNK), " "),
            F.element_at(
                suffixes, ((F.col("doc_id") + i) % 4).cast("int") + 1
            ),
        ),
    )
    empty = F.array().cast("array<string>")
    brace = F.when(
        F.col("doc_id") % 11 == 0, F.array(F.lit("{ config }."))
    ).otherwise(empty)
    lorem = F.when(
        F.col("doc_id") % 13 == 0, F.array(F.lit("lorem ipsum dolor."))
    ).otherwise(empty)
    lined = docs.select(
        "doc_id",
        F.array_join(F.concat(chunks, brace, lorem), "\n").alias("text"),
    )
    return c4_line_filter(lined, "doc_id", "text").orderBy("doc_id")


# ---------------------------------------------------------------------------
# BPE pair statistics
# ---------------------------------------------------------------------------

_BPE_TOP_K = 25

BPE_ORACLE = rf"""
WITH words AS (
  SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
  FROM documents WHERE trim(COALESCE(text, '')) <> ''
),
wc AS (SELECT w, count(*) AS n FROM words GROUP BY w),
pairs AS (
  SELECT substring(w, CAST(g.i AS INT), 2) AS pair, n
  FROM wc, UNNEST(generate_series(1, length(w) - 1)) AS g(i)
  WHERE length(w) >= 2
),
pc AS (SELECT pair, CAST(SUM(n) AS BIGINT) AS n_occurrences FROM pairs GROUP BY pair),
ranked AS (
  SELECT pair, n_occurrences,
         CAST(row_number() OVER (ORDER BY n_occurrences DESC, pair ASC) AS INT) AS rank
  FROM pc
)
SELECT pair, n_occurrences, rank FROM ranked
WHERE rank <= {_BPE_TOP_K}
ORDER BY rank
"""


@golden(
    "bpe_pair_merge_stats",
    BPE_ORACLE,
    tags=("text", "tokenizer", "bpe", "vocab"),
)
def bpe_pair_merge_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE merge step's pair table (Sennrich et al. 2016): top-25
    adjacent character pairs across the corpus, each distinct word's
    pairs weighted by the word's frequency. After the wordcount
    aggregate, all work is vocabulary-sized — the property that makes
    tokenizer training tractable at 100 TB."""
    from mr_dice_spark.operators.vocab import bpe_pair_stats

    docs = Catalog(spark, sf_dir).documents
    return bpe_pair_stats(docs, "text", top_k=_BPE_TOP_K)


# ---------------------------------------------------------------------------
# n-gram novelty
# ---------------------------------------------------------------------------

NOVELTY_ORACLE = r"""
WITH tok AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
  FROM documents WHERE trim(COALESCE(text, '')) <> ''
),
g0 AS (
  SELECT doc_id,
         array_to_string(
           list_slice(w, CAST(g.i AS INT), CAST(g.i AS INT) + 2), ' ') AS g
  FROM tok, UNNEST(generate_series(1, len(w) - 2)) AS g(i)
),
grams AS (SELECT DISTINCT doc_id, g FROM g0),
first AS (SELECT g, min(doc_id) AS first_doc FROM grams GROUP BY g)
SELECT grams.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(count_if(first.first_doc = grams.doc_id) AS BIGINT) AS n_novel,
       ROUND(1e-9 + CAST(count_if(first.first_doc = grams.doc_id) AS DOUBLE)
             / count(*), 6) AS novelty_frac
FROM grams JOIN first USING (g)
GROUP BY grams.doc_id
ORDER BY grams.doc_id
"""


@golden(
    "ngram_novelty_by_doc",
    NOVELTY_ORACLE,
    tags=("text", "dedup", "novelty", "diversity"),
)
def ngram_novelty_by_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 3-gram novelty: the share of a document's distinct
    word trigrams first seen (smallest doc_id) in that document — the
    corpus-diversity audit complementing pairwise near-dup detection.
    One gram-keyed aggregate + a gram-keyed join (shared partitioning),
    then a doc-keyed re-aggregate."""
    from mr_dice_spark.operators.vocab import ngram_novelty

    docs = Catalog(spark, sf_dir).documents
    return ngram_novelty(docs, "doc_id", "text", n=3).orderBy("doc_id")


# ---------------------------------------------------------------------------
# vocabulary OOV audit
# ---------------------------------------------------------------------------

_VOCAB_K = 10

VOCAB_OOV_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
  FROM documents WHERE trim(COALESCE(text, '')) <> ''
),
wc AS (SELECT w, count(*) AS n FROM toks GROUP BY w),
vocab AS (
  SELECT w FROM (
    SELECT w, row_number() OVER (ORDER BY n DESC, w ASC) AS r FROM wc
  ) WHERE r <= {_VOCAB_K}
)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count_if(v.w IS NULL) AS BIGINT) AS n_oov,
       ROUND(1e-9 + CAST(count_if(v.w IS NULL) AS DOUBLE) / count(*), 6) AS oov_frac
FROM toks t LEFT JOIN vocab v ON t.w = v.w
GROUP BY t.doc_id
ORDER BY t.doc_id
"""


@golden(
    "vocab_oov_audit",
    VOCAB_OOV_ORACLE,
    tags=("text", "tokenizer", "vocab", "coverage"),
)
def vocab_oov_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-coverage audit: per-document out-of-vocabulary token
    rate under the corpus's own top-10 word vocabulary (frequency desc,
    word asc — deterministic ties). Wordcount aggregate -> tiny top-k ->
    vocabulary BROADCAST back into the token stream; only the wordcount
    shuffles the corpus."""
    from mr_dice_spark.operators.vocab import vocab_coverage

    docs = Catalog(spark, sf_dir).documents
    return vocab_coverage(docs, "doc_id", "text", vocab_size=_VOCAB_K).orderBy(
        "doc_id"
    )


# ---------------------------------------------------------------------------
# cluster dedup keeping the best copy
# ---------------------------------------------------------------------------

CLUSTER_BEST_ORACLE = r"""
WITH RECURSIVE words AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_distinct(list_transform(
             range(1, greatest(len(w) - 1, 1)),
             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS shingle
  FROM words WHERE len(w) >= 3
),
cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b FROM inter
  JOIN cnt ca ON inter.id_a = ca.doc_id
  JOIN cnt cb ON inter.id_b = cb.doc_id
  WHERE i * 1.0 / (ca.n + cb.n - i) >= 0.8
),
sym AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(u, v) AS (
  SELECT u, v FROM sym
  UNION
  SELECT r.u, s.v FROM reach r JOIN sym s ON s.u = r.v
),
comp AS (
  SELECT d.doc_id,
         least(d.doc_id,
               COALESCE((SELECT min(r.v) FROM reach r WHERE r.u = d.doc_id),
                        d.doc_id)) AS component
  FROM documents d
),
ranked AS (
  SELECT d.doc_id, d.lang, d.source, d.n_chars,
         ROW_NUMBER() OVER (PARTITION BY c.component
                            ORDER BY d.n_chars DESC, d.doc_id ASC) AS rn
  FROM documents d JOIN comp c USING (doc_id)
)
SELECT doc_id, lang, source, n_chars FROM ranked WHERE rn = 1
ORDER BY doc_id
"""


@golden(
    "cluster_keep_best_copy",
    CLUSTER_BEST_ORACLE,
    tags=("dedup", "components", "iterative", "quality"),
)
def cluster_keep_best_copy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-aware dedup keeping the LONGEST copy (max n_chars, ties
    min doc_id) per exact-Jaccard (>= 0.8) connected component — the
    production near-dup policy when crawl copies differ in completeness,
    vs dedup_connected_clusters' first-wins min-id rule. The iterative
    hash-min fixpoint is hash-checked against DuckDB's WITH RECURSIVE
    closure plus an argmax window."""
    from mr_dice_spark.operators.components import dedup_connected_best
    from mr_dice_spark.operators.dedup import ngram_jaccard_join

    docs = Catalog(spark, sf_dir).documents
    pairs = ngram_jaccard_join(docs, "doc_id", "text", threshold=0.8)
    return (
        dedup_connected_best(docs, pairs, "doc_id", best_by="n_chars")
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# snapshot diff (incremental-curation audit)
# ---------------------------------------------------------------------------

SNAPSHOT_DIFF_ORACLE = """
WITH new AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text,
         lang, source
  FROM documents WHERE doc_id % 17 <> 0
  UNION ALL
  SELECT doc_id + 100000, text || ' copy', lang, source
  FROM documents WHERE doc_id % 23 = 0
),
j AS (
  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
         o.doc_id IS NOT NULL AS in_old,
         n.doc_id IS NOT NULL AS in_new,
         (o.text IS NOT DISTINCT FROM n.text)
           AND (o.lang IS NOT DISTINCT FROM n.lang)
           AND (o.source IS NOT DISTINCT FROM n.source) AS same
  FROM documents o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
)
SELECT doc_id,
       CASE WHEN NOT in_old THEN 'added'
            WHEN NOT in_new THEN 'removed'
            WHEN NOT same THEN 'changed'
            ELSE 'unchanged' END AS change
FROM j
WHERE NOT (in_old AND in_new AND same)
ORDER BY doc_id
"""


@golden(
    "snapshot_diff_incremental",
    SNAPSHOT_DIFF_ORACLE,
    tags=("cdc", "diff", "incremental", "audit"),
)
def snapshot_diff_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot reconciliation: the 'new' snapshot deterministically
    removes every 17th document, rewrites every 7th's text, and adds a
    copy (id + 100000) of every 23rd — snapshot_diff reports exactly the
    added/removed/changed ids from ONE full-outer join with null-safe
    column compares. This is the audit (and the recompute work-list) an
    incremental curation run publishes."""
    from mr_dice_spark.operators.profile import snapshot_diff

    docs = Catalog(spark, sf_dir).documents.select("doc_id", "text", "lang", "source")
    changed = F.when(
        F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
    ).otherwise(F.col("text"))
    # withColumn-then-select: never alias an expression to a name the
    # same projection still reads (the Catalyst projection-collapse
    # rebinding hazard documented at minhash_recall_audit_curve)
    new = docs.where(F.col("doc_id") % 17 != 0).withColumn(
        "text", changed
    ).unionByName(
        docs.where(F.col("doc_id") % 23 == 0)
        .withColumn("text", F.concat(F.col("text"), F.lit(" copy")))
        .select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text", "lang", "source"
        )
    )
    return snapshot_diff(docs, new, "doc_id", ["text", "lang", "source"]).orderBy(
        "doc_id"
    )


# ---------------------------------------------------------------------------
# column profile
# ---------------------------------------------------------------------------

_PROFILE_COLS = ("event_id", "user_id", "event_type", "value", "props")


def _profile_oracle() -> str:
    parts = []
    for c in _PROFILE_COLS:
        parts.append(
            f"SELECT '{c}' AS \"column\", CAST(count(*) AS BIGINT) AS n_rows, "
            f"CAST(count_if({c} IS NULL) AS BIGINT) AS n_null, "
            f"CASE WHEN count(*) > 0 THEN ROUND(1e-9 + "
            f"CAST(count_if({c} IS NULL) AS DOUBLE) / count(*), 6) END AS null_frac, "
            f"CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct FROM events"
        )
    return " UNION ALL ".join(parts) + ' ORDER BY "column"'


@golden(
    "profile_events_columns",
    _profile_oracle(),
    tags=("profile", "quality", "audit", "events"),
)
def profile_events_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-column health profile of the events table (null counts
    and rates, exact distinct cardinalities) in ONE corpus pass — the
    observability row a pipeline publishes per ingest. The multi-distinct
    Expand cost is the documented price of exactness (see
    operators/profile.py)."""
    from mr_dice_spark.operators.profile import profile_columns

    ev = Catalog(spark, sf_dir).events
    return profile_columns(ev, list(_PROFILE_COLS)).orderBy("column")


def _profile_approx_oracle() -> str:
    parts = []
    for c in _PROFILE_COLS:
        parts.append(
            f"SELECT '{c}' AS \"column\", CAST(count(*) AS BIGINT) AS n_rows, "
            f"CAST(count_if({c} IS NULL) AS BIGINT) AS n_null, "
            f"CASE WHEN count(*) > 0 THEN ROUND(1e-9 + "
            f"CAST(count_if({c} IS NULL) AS DOUBLE) / count(*), 6) END AS null_frac, "
            f"CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct_exact, "
            f"true AS nd_within_tol FROM events"
        )
    return " UNION ALL ".join(parts) + ' ORDER BY "column"'


@golden(
    "profile_approx_audit",
    _profile_approx_oracle(),
    tags=("profile", "approx", "hll", "audit", "events"),
)
def profile_approx_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accuracy audit of the approx (dashboard-mode) column profile, in
    the measured-recall style of ann_recall_audit_ivf: run
    profile_columns(exact=False) — the plain single-width aggregate that
    replaces the multi-distinct Expand at 100 TB — alongside the exact
    profile, and emit per column whether the HLL++ estimate landed
    within 3·rsd (15% at Spark's default rsd=0.05, or ±2 absolute for
    tiny cardinalities). approx_count_distinct is deterministic (fixed
    xxhash64, no seed), so the verdict is stable and the oracle pins it
    TRUE next to the exact counts; the measured errors on these fixtures
    are 0–8.3% across three scale factors. The approximate estimate
    itself is deliberately NOT in the output — no SQL engine restates
    Spark's HLL++ bias tables, the bounded verdict is the checkable
    claim."""
    from mr_dice_spark.operators.profile import profile_columns

    ev = Catalog(spark, sf_dir).events
    cols = list(_PROFILE_COLS)
    ap = profile_columns(ev, cols, exact=False).select(
        "column", F.col("n_distinct").alias("__nd_approx")
    )
    ex = profile_columns(ev, cols, exact=True)
    tol = F.greatest(F.lit(2.0), 0.15 * F.col("n_distinct"))
    return (
        ex.join(ap, "column")
        .select(
            "column",
            "n_rows",
            "n_null",
            "null_frac",
            F.col("n_distinct").alias("n_distinct_exact"),
            (F.abs(F.col("__nd_approx") - F.col("n_distinct")) <= tol).alias(
                "nd_within_tol"
            ),
        )
        .orderBy("column")
    )


# ---------------------------------------------------------------------------
# value histogram
# ---------------------------------------------------------------------------

DOC_LEN_HIST_ORACLE = """
WITH b AS (
  SELECT least(greatest(CAST(floor((CAST(n_chars AS DOUBLE) - 0.0) / 50.0)
                        AS BIGINT), 0), 11) AS bin
  FROM documents WHERE n_chars IS NOT NULL
)
SELECT bin,
       ROUND(1e-9 + 0.0 + bin * 50.0, 6) AS lo_edge,
       ROUND(1e-9 + 0.0 + (bin + 1) * 50.0, 6) AS hi_edge,
       CAST(count(*) AS BIGINT) AS n
FROM b GROUP BY bin ORDER BY bin
"""


@golden(
    "doc_length_histogram",
    DOC_LEN_HIST_ORACLE,
    tags=("profile", "histogram", "documents", "quality"),
)
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """12-bin fixed-range histogram of document length (n_chars over
    [0, 600), 50-char bins) via the generic value_histogram operator —
    the length-distribution profile a curation run publishes before
    picking filter thresholds (complements quantile_length_filter's
    adaptive gate; histogram_value_buckets profiles events.value with
    inlined arithmetic). A narrow bucket expression + a hash aggregate on
    at most 12 keys — the shuffle moves bins, not rows; outliers clamp
    into the edge bins by contract."""
    from mr_dice_spark.operators.profile import value_histogram

    docs = Catalog(spark, sf_dir).documents
    return value_histogram(docs, "n_chars", 0.0, 600.0, 12).orderBy("bin")


# ---------------------------------------------------------------------------
# ANN recall audit (IVF vs exact)
# ---------------------------------------------------------------------------

ANN_RECALL_ORACLE = """
WITH c AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid,
         CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings ORDER BY vec_id LIMIT 8
),
q AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 8
),
assign AS (
  SELECT vec_id, emb, cid FROM (
    SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS emb, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                             c.cv) DESC, c.cid) AS rn
    FROM embeddings e CROSS JOIN c
  ) WHERE rn = 1
),
probes AS (
  SELECT qid, cid FROM (
    SELECT q.qid, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY q.qid
             ORDER BY ROUND(1e-9 + list_cosine_similarity(c.cv, q.qv), 6)
                        DESC, c.cid) AS pr
    FROM q CROSS JOIN c
  ) WHERE pr <= 2
),
ivf AS (
  SELECT qid, vec_id FROM (
    SELECT p.qid, a.vec_id,
           ROW_NUMBER() OVER (
             PARTITION BY p.qid
             ORDER BY ROUND(1e-9 + list_cosine_similarity(a.emb, q.qv), 6)
                        DESC, a.vec_id) AS rn
    FROM assign a JOIN probes p ON a.cid = p.cid JOIN q ON q.qid = p.qid
  ) WHERE rn <= 10
),
exact AS (
  SELECT qid, vec_id FROM (
    SELECT q.qid, e.vec_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.qid
             ORDER BY ROUND(1e-9 + list_cosine_similarity(
                        CAST(e.embedding AS DOUBLE[]), q.qv), 6)
                        DESC, e.vec_id) AS rn
    FROM embeddings e CROSS JOIN q
  ) WHERE rn <= 10
),
h AS (
  SELECT exact.qid, count(*) AS n_hits
  FROM exact JOIN ivf ON exact.qid = ivf.qid AND exact.vec_id = ivf.vec_id
  GROUP BY exact.qid
),
ni AS (SELECT qid, count(*) AS n_ivf FROM ivf GROUP BY qid)
SELECT q.qid AS vec_id,
       CAST(COALESCE(ni.n_ivf, 0) AS BIGINT) AS n_ivf,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       ROUND(1e-9 + COALESCE(h.n_hits, 0) / 10.0, 6) AS recall
FROM q LEFT JOIN ni ON ni.qid = q.qid LEFT JOIN h ON h.qid = q.qid
ORDER BY vec_id
"""


@golden(
    "ann_recall_audit_ivf",
    ANN_RECALL_ORACLE,
    tags=("similarity", "ann", "ivf", "recall", "audit"),
)
def ann_recall_audit_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall@10 of the IVF probe path (8 sampled-init
    centroids, 2 probes) against exact brute force, for 8 query vectors
    — the 'measure, don't guess' QA an ANN rollout runs before trusting
    probes at scale. Every stage is deterministic (rounded-grid ranking,
    id tiebreaks), so even the AUDIT is hash-checked end to end."""
    from mr_dice_spark.operators.similarity import ivf_recall_audit

    emb = Catalog(spark, sf_dir).embeddings
    qs = emb.where(F.col("vec_id") < 8).select("vec_id", "embedding")
    return ivf_recall_audit(
        emb, "vec_id", "embedding", qs, "vec_id", "embedding",
        k=10, n_centroids=8, n_probe=2, round_scores=6,
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# epoch-based mixture upsampling
# ---------------------------------------------------------------------------

_UPS_SEED = "ups/v1"
_UPS_EPOCHS = (("de", 2.0), ("en", 0.5), ("fr", 1.25), ("zh", 3.0))
# 'es' deliberately absent -> dropped (mixture semantics)

_UPS_CASE = "CASE lang " + " ".join(
    f"WHEN '{g}' THEN {e}" for g, e in _UPS_EPOCHS
) + " END"

UPSAMPLE_ORACLE = f"""
WITH e AS (
  SELECT doc_id, lang, {_UPS_CASE} AS eps
  FROM documents
  WHERE lang IN ({", ".join(f"'{g}'" for g, _ in _UPS_EPOCHS)})
),
c AS (
  SELECT doc_id, lang,
         CAST(floor(eps) AS INT) AS fullep,
         eps - floor(eps) AS frac
  FROM e
),
t AS (
  SELECT doc_id, lang,
         fullep + CASE WHEN
           CAST(('0x' || substring(md5('{_UPS_SEED}' || CAST(doc_id AS VARCHAR)
                || '@' || CAST(fullep AS VARCHAR)), 1, 8)) AS BIGINT)
             < CAST(floor(frac * 4294967296.0) AS BIGINT)
           THEN 1 ELSE 0 END AS total
  FROM c
)
SELECT doc_id, lang, CAST(g.i AS INT) AS epoch
FROM t, UNNEST(generate_series(0, total - 1)) AS g(i)
WHERE total > 0
ORDER BY doc_id, epoch
"""


@golden(
    "mixture_upsample_epochs_lang",
    UPSAMPLE_ORACLE,
    tags=("sampling", "mixture", "upsample", "epochs"),
)
def mixture_upsample_epochs_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional-epoch UP-sampling by language ('2 epochs of de, 0.5 of
    en, 1.25 of fr, 3 of zh; es dropped') — the repeat-underrepresented
    half of mixture weighting, complementing the down-samplers. The
    fractional copy is a per-epoch-salted portable hash choice, so the
    whole replication plan is a pure function of (doc_id, seed) and the
    oracle restates it exactly. Broadcast dim + in-row explode: a narrow
    map, no shuffle (the presentation sort aside)."""
    from mr_dice_spark.operators.sampling import mixture_upsample_epochs

    docs = Catalog(spark, sf_dir).documents.select("doc_id", "lang")
    out = mixture_upsample_epochs(
        docs, "lang", dict(_UPS_EPOCHS), "doc_id", seed=_UPS_SEED
    )
    return out.select("doc_id", "lang", "epoch").orderBy("doc_id", "epoch")


# ---------------------------------------------------------------------------
# composed pipeline: C4 clean -> page gate -> exact dedup -> OOV report
# ---------------------------------------------------------------------------

# NOTE: the tok/lined/f construction below restates C4_ORACLE's corpus
# build verbatim (same arithmetic decoration) — keep the two in sync.
PIPELINE_REPORT_ORACLE = rf"""
WITH tok AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
),
lined AS (
  SELECT doc_id,
         array_to_string(
           list_concat(
             list_concat(
               list_transform(
                 generate_series(0, CAST(ceil(len(w) / 8.0) AS INT) - 1),
                 i -> array_to_string(list_slice(w, i * 8 + 1, i * 8 + 8), ' ')
                      || (['', '.', '!', '. javascript'])[CAST((doc_id + i) % 4 AS INT) + 1]),
               CASE WHEN doc_id % 11 = 0 THEN ['{{ config }}.'] ELSE [] END),
             CASE WHEN doc_id % 13 = 0 THEN ['lorem ipsum dolor.'] ELSE [] END),
           chr(10)) AS text
  FROM tok
),
f AS (
  SELECT doc_id, text,
         list_filter(string_split(text, chr(10)),
           x -> regexp_matches(rtrim(x), '[.!?"”]$')
                AND (CASE WHEN trim(x) = '' THEN 0
                          ELSE len(string_split_regex(trim(x), '\s+')) END) >= 3
                AND NOT contains(lower(x), 'javascript')) AS kept
  FROM lined
),
pages AS (
  SELECT doc_id, COALESCE(array_to_string(kept, chr(10)), '') AS cleaned
  FROM f
  WHERE NOT (contains(text, '{{') OR contains(text, '}}'))
    AND NOT contains(lower(text), 'lorem ipsum')
    AND len(kept) >= 3
),
ded AS (
  SELECT doc_id, cleaned FROM (
    SELECT doc_id, cleaned,
           ROW_NUMBER() OVER (PARTITION BY cleaned ORDER BY doc_id) AS rn
    FROM pages
  ) WHERE rn = 1
),
toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(cleaned), '\s+')) AS w
  FROM ded WHERE trim(cleaned) <> ''
),
wc AS (SELECT w, count(*) AS n FROM toks GROUP BY w),
vocab AS (
  SELECT w FROM (
    SELECT w, row_number() OVER (ORDER BY n DESC, w ASC) AS r FROM wc
  ) WHERE r <= 10
),
oov AS (
  SELECT t.doc_id,
         count(*) AS n_tokens,
         count_if(v.w IS NULL) AS n_oov
  FROM toks t LEFT JOIN vocab v ON t.w = v.w
  GROUP BY t.doc_id
)
SELECT d.lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(o.n_tokens) AS BIGINT) AS total_tokens,
       ROUND(1e-9 + AVG(o.n_oov * 1.0 / o.n_tokens), 6) AS avg_oov_frac
FROM ded JOIN documents d USING (doc_id) JOIN oov o ON o.doc_id = ded.doc_id
GROUP BY d.lang
ORDER BY d.lang
"""


@golden(
    "crawl_quality_tokenizer_report",
    PIPELINE_REPORT_ORACLE,
    tags=("text", "pipeline", "c4", "dedup", "vocab", "quality"),
)
def crawl_quality_tokenizer_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end composition of the round-4 operators: C4 line cleaning
    (narrow map) -> page gate -> exact dedup of the CLEANED text (first
    wins) -> top-10 vocabulary OOV audit over the surviving corpus ->
    per-language release report (docs, tokens, mean OOV rate). Each stage
    is the operator under its own golden; this entry pins that they
    compose — the report a curation run publishes before handing the
    corpus to a tokenizer build."""
    from mr_dice_spark.operators.dedup import dedup_exact
    from mr_dice_spark.operators.quality_rules import c4_line_filter
    from mr_dice_spark.operators.vocab import vocab_coverage

    docs = Catalog(spark, sf_dir).documents
    w = F.split(F.trim(F.col("text")), r"\s+")
    nch = F.ceil(F.size(w) / F.lit(float(_CHUNK))).cast("int")
    suffixes = F.array(*[F.lit(s) for s in _C4_SUFFIXES])
    chunks = F.transform(
        F.sequence(F.lit(0), nch - 1),
        lambda i: F.concat(
            F.array_join(F.slice(w, i * F.lit(_CHUNK) + 1, _CHUNK), " "),
            F.element_at(suffixes, ((F.col("doc_id") + i) % 4).cast("int") + 1),
        ),
    )
    empty = F.array().cast("array<string>")
    brace = F.when(
        F.col("doc_id") % 11 == 0, F.array(F.lit("{ config }."))
    ).otherwise(empty)
    lorem = F.when(
        F.col("doc_id") % 13 == 0, F.array(F.lit("lorem ipsum dolor."))
    ).otherwise(empty)
    lined = docs.select(
        "doc_id", F.array_join(F.concat(chunks, brace, lorem), "\n").alias("text")
    )
    pages = (
        c4_line_filter(lined, "doc_id", "text")
        .where(F.col("keep"))
        .select("doc_id", F.col("cleaned_text").alias("cleaned"))
    )
    ded = dedup_exact(pages, ["cleaned"], "doc_id")
    oov = vocab_coverage(ded, "doc_id", "cleaned", vocab_size=10)
    return (
        ded.join(docs.select("doc_id", "lang"), "doc_id")
        .join(oov, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            _r(F.avg(F.col("n_oov") / F.col("n_tokens")), 6).alias("avg_oov_frac"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# fuzzy entity-resolution join (edit distance <= 1)
# ---------------------------------------------------------------------------

FUZZY_JOIN_ORACLE = """
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
FROM customer a JOIN customer b
  ON a.c_custkey < b.c_custkey
 AND levenshtein(a.c_name, b.c_name) <= 1
ORDER BY id_a, id_b
"""


@golden(
    "fuzzy_name_join_customers",
    FUZZY_JOIN_ORACLE,
    tags=("join", "fuzzy", "entity-resolution", "dedup"),
)
def fuzzy_name_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-linkage self-join: every customer-name pair within edit
    distance 1 via the PassJoin k=1 segment pigeonhole (exact recall —
    the oracle brute-forces the same pair set with a quadratic
    levenshtein cross join the operator exists to avoid). The fixture's
    constant 'Customer#' prefix exercises the documented degenerate-block
    hazard: candidates come from the high-entropy suffix half."""
    from mr_dice_spark.operators.fuzzy import edit_distance_join

    cust = Catalog(spark, sf_dir).customer
    out = edit_distance_join(cust, "c_custkey", "c_name")
    return out.select(
        F.col("id_a"), F.col("id_b"), F.col("dist").cast("int").alias("dist")
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# link-authority PageRank (iterative graph ranking)
# ---------------------------------------------------------------------------

# five sweeps unrolled as chained CTEs — the SQL restatement of the
# operator's fixed-iteration loop (a convergence test would not be
# deterministic or restatable)
PAGERANK_ORACLE = """
WITH e0 AS (
  SELECT DISTINCT CAST(o.o_custkey AS BIGINT) AS s,
         CAST(1000000 + l.l_suppkey AS BIGINT) AS d
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
),
e AS (SELECT s, d FROM e0 UNION SELECT d, s FROM e0),
deg AS (SELECT s, CAST(count(*) AS DOUBLE) AS deg FROM e GROUP BY s),
nodes AS (SELECT DISTINCT s FROM e),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
p0 AS (SELECT s AS v, 1.0 / (SELECT n FROM nn) AS r FROM nodes),
p1 AS (
  SELECT n.s AS v,
         (1 - 0.85) / (SELECT n FROM nn)
           + 0.85 * COALESCE(c.c, 0.0) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.d AS v, SUM(p.r / dg.deg) AS c
    FROM e JOIN p0 p ON p.v = e.s JOIN deg dg ON dg.s = e.s
    GROUP BY e.d
  ) c ON c.v = n.s
),
p2 AS (
  SELECT n.s AS v,
         (1 - 0.85) / (SELECT n FROM nn)
           + 0.85 * COALESCE(c.c, 0.0) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.d AS v, SUM(p.r / dg.deg) AS c
    FROM e JOIN p1 p ON p.v = e.s JOIN deg dg ON dg.s = e.s
    GROUP BY e.d
  ) c ON c.v = n.s
),
p3 AS (
  SELECT n.s AS v,
         (1 - 0.85) / (SELECT n FROM nn)
           + 0.85 * COALESCE(c.c, 0.0) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.d AS v, SUM(p.r / dg.deg) AS c
    FROM e JOIN p2 p ON p.v = e.s JOIN deg dg ON dg.s = e.s
    GROUP BY e.d
  ) c ON c.v = n.s
),
p4 AS (
  SELECT n.s AS v,
         (1 - 0.85) / (SELECT n FROM nn)
           + 0.85 * COALESCE(c.c, 0.0) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.d AS v, SUM(p.r / dg.deg) AS c
    FROM e JOIN p3 p ON p.v = e.s JOIN deg dg ON dg.s = e.s
    GROUP BY e.d
  ) c ON c.v = n.s
),
p5 AS (
  SELECT n.s AS v,
         (1 - 0.85) / (SELECT n FROM nn)
           + 0.85 * COALESCE(c.c, 0.0) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.d AS v, SUM(p.r / dg.deg) AS c
    FROM e JOIN p4 p ON p.v = e.s JOIN deg dg ON dg.s = e.s
    GROUP BY e.d
  ) c ON c.v = n.s
)
SELECT v AS node, ROUND(1e-9 + r, 6) AS "rank" FROM p5 ORDER BY node
"""


@golden(
    "link_authority_pagerank",
    PAGERANK_ORACLE,
    tags=("graph", "iterative", "pagerank", "authority"),
)
def link_authority_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (5 sweeps, damping 0.85) over the undirected
    customer-supplier purchase graph (orders x lineitem; supplier nodes
    offset by 1e6) — the link-authority quality signal crawl curation
    derives from its host graph, and the repo's second iterative
    DataFrame fixpoint after connected components. Fixed sweeps make the
    float recurrence deterministic and SQL-restatable: the oracle
    unrolls the same five message-passing rounds."""
    from mr_dice_spark.operators.graph import pagerank

    t = Catalog(spark, sf_dir)
    edges = (
        t.orders.join(
            t.lineitem, t.orders["o_orderkey"] == t.lineitem["l_orderkey"]
        )
        .select(
            F.col("o_custkey").cast("long").alias("src"),
            (F.lit(1000000) + F.col("l_suppkey")).cast("long").alias("dst"),
        )
        .distinct()
    )
    out = pagerank(edges, "src", "dst", n_iter=5, damping=0.85)
    return out.select(
        "node", _r(F.col("rank"), 6).alias("rank")
    ).orderBy("node")


# ---------------------------------------------------------------------------
# MinHash banding recall audit (measured S-curve)
# ---------------------------------------------------------------------------

# Every doc gains a variant (id + 100000) with every m-th word marked,
# m in {5, 9, 17, 33} by doc_id % 4 — pair similarities spread across
# ~0.2..0.9 so the banding S-curve has mass in several buckets instead
# of only the planted >= 0.9 near-dups.
MINHASH_RECALL_ORACLE = r"""
WITH base AS (SELECT doc_id, text FROM documents),
vsrc AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w,
         ([5, 9, 17, 33])[CAST(doc_id % 4 AS INT) + 1] AS m
  FROM documents
),
corpus AS (
  SELECT doc_id, text FROM base
  UNION ALL
  SELECT doc_id + 100000,
         array_to_string(
           list_transform(generate_series(1, len(w)),
             i -> CASE WHEN (i - 1 + doc_id) % m = 0
                       THEN w[CAST(i AS INT)] || '~'
                       ELSE w[CAST(i AS INT)] END),
           ' ')
  FROM vsrc
),
words AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM corpus
),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_distinct(list_transform(
             range(1, greatest(len(w) - 1, 1)),
             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS shingle
  FROM words WHERE len(w) >= 3
),
cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT id_a, id_b, i * 1.0 / (ca.n + cb.n - i) AS j
  FROM inter
  JOIN cnt ca ON inter.id_a = ca.doc_id
  JOIN cnt cb ON inter.id_b = cb.doc_id
  WHERE i * 1.0 / (ca.n + cb.n - i) >= 0.2
),
sig AS (
  SELECT doc_id,
         MIN(CAST(('0x' || substring(md5('0|' || shingle), 1, 15)) AS BIGINT)) AS h0,
         MIN(CAST(('0x' || substring(md5('1|' || shingle), 1, 15)) AS BIGINT)) AS h1,
         MIN(CAST(('0x' || substring(md5('2|' || shingle), 1, 15)) AS BIGINT)) AS h2,
         MIN(CAST(('0x' || substring(md5('3|' || shingle), 1, 15)) AS BIGINT)) AS h3,
         MIN(CAST(('0x' || substring(md5('4|' || shingle), 1, 15)) AS BIGINT)) AS h4,
         MIN(CAST(('0x' || substring(md5('5|' || shingle), 1, 15)) AS BIGINT)) AS h5,
         MIN(CAST(('0x' || substring(md5('6|' || shingle), 1, 15)) AS BIGINT)) AS h6,
         MIN(CAST(('0x' || substring(md5('7|' || shingle), 1, 15)) AS BIGINT)) AS h7
  FROM sh GROUP BY doc_id
),
bk AS (
  SELECT doc_id, b.band,
         CASE b.band
           WHEN 0 THEN CAST(h0 AS VARCHAR) || ',' || CAST(h1 AS VARCHAR)
           WHEN 1 THEN CAST(h2 AS VARCHAR) || ',' || CAST(h3 AS VARCHAR)
           WHEN 2 THEN CAST(h4 AS VARCHAR) || ',' || CAST(h5 AS VARCHAR)
           ELSE CAST(h6 AS VARCHAR) || ',' || CAST(h7 AS VARCHAR)
         END AS key
  FROM sig, (VALUES (0), (1), (2), (3)) b(band)
),
cand AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
  FROM bk x JOIN bk y
    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
)
SELECT least(floor(t.j * 10) / 10, 1.0) AS bucket_lo,
       CAST(count(*) AS BIGINT) AS n_true,
       CAST(count_if(c.id_a IS NOT NULL) AS BIGINT) AS n_hit,
       ROUND(1e-9 + count_if(c.id_a IS NOT NULL) * 1.0 / count(*), 6) AS recall
FROM truth t LEFT JOIN cand c ON t.id_a = c.id_a AND t.id_b = c.id_b
GROUP BY 1
ORDER BY bucket_lo
"""


@golden(
    "minhash_recall_audit_curve",
    MINHASH_RECALL_ORACLE,
    tags=("dedup", "minhash", "lsh", "recall", "audit"),
)
def minhash_recall_audit_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured banding recall of the 8-hash/4-band MinHash config
    against exact Jaccard, bucketed by similarity — the empirical
    S-curve (the dedup twin of ann_recall_audit_ivf), over the corpus
    plus deterministic partial-overlap variants so mid-similarity
    buckets carry mass. Fully portable construction (md5 signatures,
    tuple banding), so even the audit hash-matches SQL."""
    from mr_dice_spark.functions.text import tokens
    from mr_dice_spark.operators.dedup import minhash_recall_audit

    docs = Catalog(spark, sf_dir).documents.select("doc_id", "text")
    w = tokens(F.col("text"))
    m = F.element_at(
        F.array(F.lit(5), F.lit(9), F.lit(17), F.lit(33)),
        (F.col("doc_id") % 4).cast("int") + 1,
    )
    idx = F.when(F.size(w) >= 1, F.sequence(F.lit(1), F.size(w))).otherwise(
        F.array().cast("array<int>")
    )
    repl = F.transform(
        idx,
        lambda i: F.when(
            ((i - 1 + F.col("doc_id")) % m) == 0,
            F.concat(F.element_at(w, i), F.lit("~")),
        ).otherwise(F.element_at(w, i)),
    )
    # two-step select: the SAME projection must not alias an expression
    # to "doc_id" while repl still READS the input doc_id — under the
    # union + downstream filters Catalyst collapses the projections and
    # rebinds the name to the shifted id, silently un-marking every
    # variant (caught by the oracle: jaccard 1.0 where 0.54 was right)
    variants = docs.withColumn("text", F.array_join(repl, " ")).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(variants)
    return minhash_recall_audit(
        corpus, "doc_id", "text", threshold=0.2, num_hashes=8, bands=4
    )


# ---------------------------------------------------------------------------
# zlib compressibility signal (rows-only: no SQL DEFLATE)
# ---------------------------------------------------------------------------

@golden(
    "compression_ratio_signal",
    None,  # rows-only: DEFLATE has no SQL restatement; pinned by unit tests
    tags=("text", "quality", "compression", "udf"),
)
def compression_ratio_signal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document zlib compressibility (the machine-text/repetition
    screen) over the corpus — the repo's one Arrow-batched pandas-UDF
    quality signal; a narrow map with no shuffle. Rows-only by necessity
    (no SQL DEFLATE); the arithmetic and edge semantics are unit-tested
    in tests/test_quality_rules.py."""
    from mr_dice_spark.functions.text import compression_ratio_stats

    docs = Catalog(spark, sf_dir).documents
    return compression_ratio_stats(docs, "doc_id", "text").orderBy("doc_id")


def _cr_twin_corpus() -> list[tuple[int, str | None]]:
    """The pinned 12-document corpus for the compression fixed-oracle
    twin: pure-stdlib deterministic payloads spanning the signal's whole
    range — boilerplate (ratio 0.017), natural-ish prose, LCG
    pseudo-random incompressible text (ratio > 1: DEFLATE framing
    overhead), empty string, single char, multibyte UTF-8, and NULL."""

    def lcg_text(seed: int, n: int) -> str:
        x = seed
        out = []
        for _ in range(n):
            x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            out.append(chr(33 + (x >> 33) % 94))
        return "".join(out)

    return [
        (1, "a" * 1000),
        (2, "ab" * 500),
        (3, ("the quick brown fox jumps over the lazy dog. " * 40).strip()),
        (4, lcg_text(42, 1000)),
        (5, lcg_text(7, 200)),
        (6, ""),
        (7, "x"),
        (8, "naïve café — déjà vu ✓ " * 50),
        (9, "0123456789" * 123),
        (10, None),
        (
            11,
            "lorem ipsum dolor sit amet, consectetur adipiscing elit, "
            "sed do eiusmod tempor " * 25,
        ),
        (12, "zzzz" + lcg_text(99, 400) + "zzzz"),
    ]


# Precomputed once with CPython's bundled zlib (level 6) over the UTF-8
# bytes of _cr_twin_corpus and hard-coded as literals: the oracle must be
# an INDEPENDENT pin, not a runtime re-run of the same library call. Both
# engines derive ratio from these integers under the repo's shared nudge
# rounding, so the hash compare exercises the operator's edge semantics
# (empty -> NULL ratio, NULL -> NULL row, ratio > 1) without needing a
# SQL DEFLATE.
COMPRESSION_TWIN_ORACLE = """
WITH pin(doc_id, n_bytes, n_compressed) AS (
  VALUES (1, 1000, 17), (2, 1000, 18), (3, 1799, 68), (4, 1000, 855),
         (5, 200, 202), (6, 0, 8), (7, 1, 9), (8, 1550, 54),
         (9, 1230, 29), (10, NULL, NULL), (11, 1975, 86), (12, 408, 372)
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_bytes AS BIGINT) AS n_bytes,
       CAST(n_compressed AS BIGINT) AS n_compressed,
       CASE WHEN n_bytes > 0
            THEN ROUND(1e-9 + CAST(n_compressed AS DOUBLE) / n_bytes, 6)
       END AS ratio
FROM pin ORDER BY doc_id
"""


@golden(
    "compression_ratio_fixed_oracle",
    COMPRESSION_TWIN_ORACLE,
    tags=("text", "quality", "compression", "udf", "fixed-oracle"),
)
def compression_ratio_fixed_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked fixed-oracle twin for :func:`compression_ratio_signal`
    (the pq_topk_fixed_oracle recipe, VERDICT r8 next-#3): the REAL
    operator — the same Arrow-batched zlib pandas UDF the corpus golden
    runs — over a pinned 12-document corpus whose compressed lengths were
    precomputed once and hard-coded in the oracle as a VALUES table. The
    corpus golden stays rows-only (no SQL DEFLATE can restate it on live
    data); this twin gives the operator a lifetime hash-exact signal:
    any drift in the UDF's byte handling, the empty/NULL edge semantics,
    the nudge rounding, or zlib's level-6 output breaks the hash.
    Ignores ``sf_dir`` by design — the pin is the input."""
    from mr_dice_spark.functions.text import compression_ratio_stats

    docs = spark.createDataFrame(_cr_twin_corpus(), "doc_id long, text string")
    return compression_ratio_stats(docs, "doc_id", "text").orderBy("doc_id")


# ---------------------------------------------------------------------------
# Unicode NFC normalization + dedup
# ---------------------------------------------------------------------------

NFC_DEDUP_ORACLE = r"""
WITH va AS (
  SELECT doc_id + 100000 AS doc_id,
         regexp_replace(text, '\ba\b', chr(225), 'g') AS text
  FROM documents
),
vb AS (
  SELECT doc_id + 200000 AS doc_id,
         regexp_replace(text, '\ba\b', 'a' || chr(769), 'g') AS text
  FROM documents
),
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id, text FROM va
  UNION ALL SELECT doc_id, text FROM vb
),
norm AS (SELECT doc_id, nfc_normalize(text) AS text FROM corpus),
ded AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
    FROM norm
  ) WHERE rn = 1
)
SELECT doc_id, md5(text) AS text_hash FROM ded ORDER BY doc_id
"""


@golden(
    "unicode_nfc_dedup",
    NFC_DEDUP_ORACLE,
    tags=("text", "unicode", "normalize", "dedup", "udf"),
)
def unicode_nfc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NFC normalization before exact dedup: the corpus gains a
    PRECOMPOSED variant (every word 'a' -> U+00E1) and a DECOMPOSED one
    ('a' + U+0301) per document — byte-different, visually identical.
    After nfc_normalize both variants collapse to one byte sequence, so
    first-wins dedup keeps the precomposed copy and drops the decomposed
    twin; documents without the word keep only the base. The Spark side
    is the Arrow-batched unicodedata UDF; DuckDB's builtin nfc_normalize
    must agree byte-for-byte for the hash to pass — cross-engine proof
    the canonicalization is standard NFC, not an approximation."""
    from mr_dice_spark.functions.text import nfc_normalize
    from mr_dice_spark.operators.dedup import dedup_exact

    docs = Catalog(spark, sf_dir).documents.select("doc_id", "text")
    va = docs.withColumn(
        "text", F.regexp_replace(F.col("text"), r"\ba\b", "á")
    ).select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    vb = docs.withColumn(
        "text", F.regexp_replace(F.col("text"), r"\ba\b", "a\u0301")
    ).select((F.col("doc_id") + 200000).alias("doc_id"), "text")
    corpus = docs.unionByName(va).unionByName(vb)
    norm = corpus.withColumn("text", nfc_normalize(F.col("text")))
    ded = dedup_exact(norm, ["text"], "doc_id")
    return ded.select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("text_hash")
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# range-frame trailing window (W-family depth: rangeBetween)
# ---------------------------------------------------------------------------

RANGE_FRAME_ORACLE = """
SELECT event_id, user_id,
       epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms,
       CAST(n_1h AS BIGINT) AS n_1h,
       ROUND(1e-9 + sum_1h, 4) AS sum_1h
FROM (
  SELECT event_id, user_id, ts,
         COUNT(*) OVER w AS n_1h,
         SUM(value) OVER w AS sum_1h
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(CAST(ts AS TIMESTAMP))
               RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
)
ORDER BY event_id
"""


@golden(
    "window_trailing_range_sum",
    RANGE_FRAME_ORACLE,
    tags=("window", "range-frame", "timeseries", "events"),
)
def window_trailing_range_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour RANGE frame per user (count + value sum over
    [ts - 1h, ts]) — the value-based frame spec (rangeBetween) the
    row-frame window family cannot express: the frame holds however many
    events fall in the hour, not a fixed row count. Ranged on integer
    epoch-millis so both engines bound the frame with exact integer
    comparisons. One user-keyed shuffle + an ordered scan per partition;
    no self-join (the naive interval-join restatement of the same query
    is quadratic per user)."""
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).events
    ms = F.unix_millis(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(ms)
        .rangeBetween(-3600000, 0)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            ms.alias("ts_ms"),
            F.count(F.lit(1)).over(w).alias("n_1h"),
            _r(F.sum("value").over(w), 4).alias("sum_1h"),
        )
        .orderBy("event_id")
    )


FUZZY_K2_ORACLE = """
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
FROM customer a JOIN customer b
  ON a.c_custkey < b.c_custkey
 AND levenshtein(a.c_name, b.c_name) <= 2
ORDER BY id_a, id_b
"""


@golden(
    "fuzzy_name_join_k2",
    FUZZY_K2_ORACLE,
    tags=("join", "fuzzy", "entity-resolution", "passjoin"),
)
def fuzzy_name_join_k2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GENERAL k+1-segment PassJoin path (k=2: three segments,
    position-shifted probes) over customer names, hash-matched against
    the quadratic levenshtein cross-join oracle — the end-to-end
    complement of the randomized property tests. At k=2 on this
    fixture's 'Customer#'-prefixed names two of three segments are
    constant (the documented degenerate-block regime), so this golden
    also pins that candidate blowup degrades only WALL TIME, never the
    pair set."""
    from mr_dice_spark.operators.fuzzy import edit_distance_join

    cust = Catalog(spark, sf_dir).customer
    out = edit_distance_join(cust, "c_custkey", "c_name", max_dist=2)
    return out.select(
        F.col("id_a"), F.col("id_b"), F.col("dist").cast("int").alias("dist")
    ).orderBy("id_a", "id_b")


TRAILING_ANOMALY_ORACLE = """
SELECT event_id, user_id,
       CAST(n_prev AS BIGINT) AS n_prev,
       ROUND(1e-9 + z, 4) AS z,
       COALESCE(ROUND(1e-9 + z, 4) > 3.0, false) AS anomaly
FROM (
  SELECT event_id, user_id,
         COUNT(value) OVER w AS n_prev,
         (value - AVG(value) OVER w) / NULLIF(STDDEV_SAMP(value) OVER w, 0) AS z
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(CAST(ts AS TIMESTAMP))
               RANGE BETWEEN 3600000 PRECEDING AND 1 PRECEDING)
)
"""


@golden(
    "trailing_window_anomalies",
    TRAILING_ANOMALY_ORACLE,
    tags=("window", "range-frame", "anomaly", "timeseries", "events"),
)
def trailing_window_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-referential anomaly screen: each event's value z-scored
    against the SAME user's PRECEDING hour (range frame ending 1 ms
    before the current row — the current value must not contaminate its
    own baseline). Events with fewer than two prior samples, or a
    zero-variance baseline, get NULL z and anomaly=false (the sd<=0
    cross-engine rule from embedding_outliers: Spark x/0.0 is NULL,
    DuckDB's is Inf — NULLIF pins both). One user-keyed shuffle, and
    NO terminal global sort — an unlimited orderBy on an analytical
    result is the PERFORMANCE.md finding-9 anti-pattern (the harness
    compares order-insensitively); the live-stream twin of this screen
    is the stateful EMA operator."""
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).events
    ms = F.unix_millis(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(ms).rangeBetween(-3600000, -1)
    sd = F.stddev_samp("value").over(w)
    z = F.when(
        sd > 0, (F.col("value") - F.avg("value").over(w)) / sd
    )
    zr = F.round(z + F.lit(1e-9), 4)
    return (
        ev.select(
            "event_id",
            "user_id",
            F.count("value").over(w).alias("n_prev"),
            zr.alias("z"),
            F.coalesce(zr > 3.0, F.lit(False)).alias("anomaly"),
        )
    )


# ---------------------------------------------------------------------------
# quarantine ingestion (PERMISSIVE parse with bad-record capture)
# ---------------------------------------------------------------------------

QUARANTINE_ORACLE = """
WITH base AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 7 = 0
)
SELECT o_orderkey,
       CASE WHEN o_orderkey % 13 = 0 THEN 'quarantined' ELSE 'good' END AS status,
       CASE WHEN o_orderkey % 13 = 0 THEN NULL ELSE o_totalprice END AS o_totalprice,
       CASE WHEN o_orderkey % 13 = 0 THEN NULL ELSE o_orderstatus END AS o_orderstatus
FROM base
ORDER BY o_orderkey
"""


@golden(
    "quarantine_ingest_audit",
    QUARANTINE_ORACLE,
    tags=("source", "ingest", "quarantine", "permissive"),
)
def quarantine_ingest_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-enforced ingest with bad-record capture, end to end: a
    JSON-lines feed derived from orders (every 13th key's line is
    deliberately truncated mid-value) goes through the PERMISSIVE
    parse/split (sources.parse_with_quarantine — the path-reading
    read_with_quarantine minus the text scan, so the fixture needs no
    filesystem). Good rows surface their typed fields — the doubles
    round-trip bit-exactly through JSON — and quarantined rows surface
    the key RECOVERED from the raw _corrupt_record (the partial-repair
    workflow), with their typed fields NULL. The oracle restates the
    classification and the survivors' values from the base table."""
    from mr_dice_spark.sources.registry import parse_with_quarantine

    orders = Catalog(spark, sf_dir).orders.where(F.col("o_orderkey") % 7 == 0)
    line = F.when(
        F.col("o_orderkey") % 13 == 0,
        F.concat(
            F.lit('{"o_orderkey":'),
            F.col("o_orderkey").cast("string"),
            F.lit(',"o_totalprice":#TRUNCATED'),
        ),
    ).otherwise(
        F.to_json(F.struct("o_orderkey", "o_totalprice", "o_orderstatus"))
    )
    raw = orders.select(line.alias("value"))
    good, bad = parse_with_quarantine(
        raw, "o_orderkey bigint, o_totalprice double, o_orderstatus string", "json"
    )
    good_rows = good.select(
        "o_orderkey",
        F.lit("good").alias("status"),
        "o_totalprice",
        "o_orderstatus",
    )
    bad_rows = bad.select(
        F.regexp_extract(F.col("_corrupt_record"), r'"o_orderkey":(\d+)', 1)
        .cast("bigint")
        .alias("o_orderkey"),
        F.lit("quarantined").alias("status"),
        F.lit(None).cast("double").alias("o_totalprice"),
        F.lit(None).cast("string").alias("o_orderstatus"),
    )
    # no terminal global sort: the audit scales with the corpus and the
    # harness compares order-insensitively (PERFORMANCE.md finding 9)
    return good_rows.unionByName(bad_rows)


# ---------------------------------------------------------------------------
# triangle counting (compact-forward) over the part co-purchase graph
# ---------------------------------------------------------------------------

def _copurchase_edges(
    spark: SparkSession,
    sf_dir: str,
    min_qty: int | None = None,
    with_order: bool = False,
):
    """(src, dst) co-purchase pairs — parts sharing an order, src < dst —
    for the seven graph goldens (r11 optimization, guide §2.4): pack each
    order's DISTINCT parts into one array (TPC-H orders hold <= 7 line
    items, so the in-array pair fan-out is bounded by 21) and enumerate
    pairs inside the row. One scan + one order-keyed aggregate replaces
    the lineitem self-join's two scans + join (measured 2.7 s -> 1.9 s
    warm for the distinct edge set at sf0.1, and the saving repeats in
    every graph golden that builds this frame). The emitted edge SET is
    identical to the self-join's: per-order duplicate parts collapse
    here, and every consumer operator already canonicalizes edges with
    least/greatest + DISTINCT, so multiplicity was never observable.
    The oracles keep their self-join restatement — same set,
    independently stated.

    ``with_order=True`` keeps ``l_orderkey`` on each pair row (one row
    per (order, pair) — the support-counting input the k-core golden
    aggregates); the self-join's per-order duplicate-part multiplicity
    is collapsed here, which COUNT(DISTINCT l_orderkey) never observed
    either."""
    li = Catalog(spark, sf_dir).lineitem
    if min_qty is not None:
        li = li.where(F.col("l_quantity") >= min_qty)
    g = (
        li.select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("__ps"))
    )
    pairs = g.select(
        "l_orderkey",
        F.explode(
            F.filter(
                F.flatten(
                    F.transform(
                        "__ps",
                        lambda a: F.transform(
                            "__ps", lambda b: F.struct(a.alias("src"), b.alias("dst"))
                        ),
                    )
                ),
                lambda s: s["src"] < s["dst"],
            )
        ).alias("__e"),
    )
    if with_order:
        return pairs.select("l_orderkey", "__e.src", "__e.dst")
    return pairs.select("__e.src", "__e.dst")


TRIANGLE_ORACLE = """
WITH raw AS (
  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
  FROM lineitem x
  JOIN lineitem y
    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
),
und AS (SELECT a AS n FROM raw UNION ALL SELECT b FROM raw),
deg AS (SELECT n, COUNT(*) AS dg FROM und GROUP BY n),
orient AS (
  SELECT CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND a < b)
              THEN a ELSE b END AS u,
         CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND a < b)
              THEN b ELSE a END AS v,
         CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND a < b)
              THEN db.dg ELSE da.dg END AS vdg
  FROM raw JOIN deg da ON da.n = a JOIN deg db ON db.n = b
),
tri AS (
  SELECT e1.u AS x, e1.v AS y, e2.v AS z
  FROM orient e1
  JOIN orient e2 ON e1.u = e2.u
   AND (e1.vdg < e2.vdg OR (e1.vdg = e2.vdg AND e1.v < e2.v))
  JOIN orient e3 ON e3.u = e1.v AND e3.v = e2.v
),
pern AS (
  SELECT n, COUNT(*) AS t FROM (
    SELECT x AS n FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri
  ) GROUP BY n
)
SELECT CAST(d.n AS BIGINT) AS node,
       CAST(COALESCE(p.t, 0) AS BIGINT) AS triangles
FROM deg d LEFT JOIN pern p ON p.n = d.n
ORDER BY node
"""


@golden(
    "triangle_counts_copurchase",
    TRIANGLE_ORACLE,
    tags=("graph", "triangles", "join"),
)
def triangle_counts_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle counts over the co-purchase graph (parts sharing
    an order, ≤ 7 items per TPC-H order so the pair build is bounded):
    compact-forward counting — edges oriented low→high by (degree, node),
    wedges joined at the oriented source, closed by one equi-join on the
    oriented pair — so each triangle is found exactly once and no hub
    can absorb quadratic wedge work (out-degrees are capped at O(sqrt m)
    by the orientation). The oracle restates the identical orientation
    and joins; counts are integers, so the hash has no FP surface."""
    from mr_dice_spark.operators.graph import triangle_counts

    edges = _copurchase_edges(spark, sf_dir)
    return triangle_counts(edges).orderBy("node")


# ---------------------------------------------------------------------------
# sorted-neighborhood record linkage (SNM) over customers
# ---------------------------------------------------------------------------

SNM_ORACLE = """
WITH r AS (
  SELECT c_custkey AS id, c_nationkey AS blk, c_name AS k,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY c_name, c_custkey) AS rn
  FROM customer
)
SELECT a.id AS id1, b.id AS id2, a.k AS key1, b.k AS key2,
       CAST(b.rn - a.rn AS BIGINT) AS gap,
       CAST(levenshtein(a.k, b.k) AS INT) AS distance
FROM r a
JOIN r b ON a.blk = b.blk AND b.rn - a.rn BETWEEN 1 AND 4
WHERE levenshtein(a.k, b.k) <= 2
ORDER BY id1, id2
"""


@golden(
    "snm_linkage_customers",
    SNM_ORACLE,
    tags=("fuzzy", "linkage", "snm", "window"),
)
def snm_linkage_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood record linkage over customers: per-nation
    blocks sorted by name, a 5-row sliding neighborhood, levenshtein <= 2
    verification — the bounded-cost ER strategy complementary to the
    PassJoin exact-recall join (every row compares against exactly 4
    neighbors regardless of corpus shape, so no degenerate block can
    exist BY CONSTRUCTION). The neighborhood self-join is bucketed at
    rank width 4 (same/adjacent bucket equi-join, no rank range scan,
    no global sort); the oracle restates it as the naive ROW_NUMBER
    range join."""
    from mr_dice_spark.operators.fuzzy import sorted_neighborhood_pairs

    cust = Catalog(spark, sf_dir).customer
    out = sorted_neighborhood_pairs(
        cust, id_col="c_custkey", key_col="c_name", block_col="c_nationkey",
        window=5, max_distance=2,
    )
    return out.select(
        "id1", "id2", "key1", "key2",
        F.col("gap").cast("long").alias("gap"),
        F.col("distance").cast("int").alias("distance"),
    ).orderBy("id1", "id2")


# ---------------------------------------------------------------------------
# entity-resolution pipeline: corrupt twin -> PassJoin -> best-match linkage
# ---------------------------------------------------------------------------

ER_LINKAGE_ORACLE = """
WITH dirty AS (
  SELECT c_custkey + 10000000 AS did,
         substring(c_name, 1, 1 + (c_custkey % (length(c_name) - 1)) - 1)
           || substring(c_name, 1 + (c_custkey % (length(c_name) - 1)) + 1)
           AS dname
  FROM customer
),
cand AS (
  SELECT did, cid, dist FROM (
    SELECT d.did, c.c_custkey AS cid,
           levenshtein(d.dname, c.c_name) AS dist
    FROM dirty d CROSS JOIN customer c
  ) WHERE dist <= 1
),
best AS (
  SELECT did, cid, dist,
         ROW_NUMBER() OVER (PARTITION BY did ORDER BY dist, cid) AS rk
  FROM cand
)
SELECT CAST(did - 10000000 AS BIGINT) AS dirty_key,
       CAST(cid AS BIGINT) AS matched_key,
       CAST(dist AS INT) AS dist,
       (cid = did - 10000000) AS is_true_parent
FROM best WHERE rk = 1
ORDER BY dirty_key
"""


@golden(
    "er_best_match_linkage",
    ER_LINKAGE_ORACLE,
    tags=("fuzzy", "entity-resolution", "pipeline", "linkage"),
)
def er_best_match_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution: every customer gets a 'dirty' twin
    with one deterministically-deleted character, the PassJoin k=1
    operator links the union (clean ids vs offset dirty ids — one exact-
    recall fuzzy join instead of a quadratic compare), and a per-dirty
    best-match window (dist, then lowest id — ambiguity is REAL here:
    deleting a digit can leave a name within distance 1 of several
    sequential customers) emits the linkage table plus whether the match
    recovered the true parent. The oracle restates the corruption in
    pure string arithmetic and brute-forces the linkage with a quadratic
    levenshtein join."""
    from mr_dice_spark.operators.fuzzy import edit_distance_join

    OFF = 10_000_000
    cust = Catalog(spark, sf_dir).customer.select("c_custkey", "c_name")
    dirty = cust.select(
        (F.col("c_custkey") + OFF).alias("id"),
        F.concat(
            F.expr("substring(c_name, 1, 1 + (c_custkey % (length(c_name) - 1)) - 1)"),
            F.expr("substring(c_name, 1 + (c_custkey % (length(c_name) - 1)) + 1, length(c_name))"),
        ).alias("name"),
    )
    clean = cust.select(F.col("c_custkey").alias("id"), F.col("c_name").alias("name"))
    pairs = edit_distance_join(clean.unionByName(dirty), "id", "name", max_dist=1)
    # keep clean<->dirty pairs only (id_a < id_b, so id_a is the clean side)
    cross = pairs.where((F.col("id_a") < OFF) & (F.col("id_b") >= OFF))
    w = Window.partitionBy("id_b").orderBy("dist", "id_a")
    best = cross.withColumn("rk", F.row_number().over(w)).where(F.col("rk") == 1)
    return best.select(
        (F.col("id_b") - OFF).alias("dirty_key"),
        F.col("id_a").alias("matched_key"),
        F.col("dist").cast("int").alias("dist"),
        (F.col("id_a") == F.col("id_b") - OFF).alias("is_true_parent"),
    ).orderBy("dirty_key")


# ---------------------------------------------------------------------------
# k-core peeling over the co-purchase graph (fixed rounds, unrolled oracle)
# ---------------------------------------------------------------------------

def _kcore_oracle(k: int = 2, rounds: int = 5) -> str:
    """Unrolled peeling rounds as chained CTEs (the PageRank strategy).
    Every CTE is MATERIALIZED: each e_r is referenced twice (by k_{r+1}
    and e_{r+1}), so an inlining planner re-expands the chain
    exponentially — 2^rounds rebuilds of the support join, measured at
    >500 s vs 0.5 s materialized on the same fixture."""
    parts = [
        """WITH raw AS MATERIALIZED (
  SELECT x.l_partkey AS a, y.l_partkey AS b
  FROM lineitem x
  JOIN lineitem y
    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(DISTINCT x.l_orderkey) >= 2
),
e0 AS MATERIALIZED (SELECT a AS s, b AS d FROM raw UNION ALL SELECT b, a FROM raw),"""
    ]
    for r in range(1, rounds + 1):
        prev = f"e{r - 1}"
        parts.append(
            f"""k{r} AS MATERIALIZED (
  SELECT s FROM {prev} GROUP BY s HAVING COUNT(*) >= {k}
),
e{r} AS MATERIALIZED (
  SELECT e.s, e.d FROM {prev} e
  JOIN k{r} ka ON ka.s = e.s
  JOIN k{r} kb ON kb.s = e.d
),"""
        )
    parts.append(
        f"""fin AS (SELECT s, COUNT(*) AS degree FROM e{rounds} GROUP BY s)
SELECT CAST(s AS BIGINT) AS node, CAST(degree AS BIGINT) AS degree
FROM fin ORDER BY node"""
    )
    return "\n".join(parts)


@golden(
    "kcore_copurchase_parts",
    _kcore_oracle(),
    tags=("graph", "kcore", "iterative"),
)
def kcore_copurchase_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the SUPPORT-2 co-purchase graph (parts co-bought in at
    least two distinct orders — the association-strength edge filter)
    after 5 peels: nodes whose repeat-co-purchase degree survives
    iterated removal of sparse neighbours, the density gate between raw
    degree and community detection. The raw graph is too dense to peel
    (min degree 42 at sf0.01); the support filter makes the peel REAL —
    1880 -> 1572 -> 1535 nodes at sf0.01 and a drastic 5922 -> 583 ->
    13 -> 3 at sf0.1 (three parts survive as a repeat-co-purchase
    triangle). Fixed rounds + eager checkpoints keep the plan flat and
    the recurrence SQL-restatable; the oracle unrolls the same 5 peels
    as MATERIALIZED CTEs (inlined, the chain re-expands exponentially).
    Integer degrees, no FP surface."""
    from mr_dice_spark.operators.graph import k_core

    edges = (
        _copurchase_edges(spark, sf_dir, with_order=True)
        .groupBy("src", "dst")
        .agg(F.countDistinct("l_orderkey").alias("support"))
        .where(F.col("support") >= 2)
        .select("src", "dst")
    )
    return k_core(edges, k=2, n_iter=5).orderBy("node")


# ---------------------------------------------------------------------------
# label-propagation communities (deterministic LPA, unrolled oracle)
# ---------------------------------------------------------------------------

def _lpa_oracle(rounds: int = 4) -> str:
    """Unrolled synchronous LPA sweeps as chained CTEs (the PageRank /
    k-core strategy). Every CTE is MATERIALIZED: each l_r feeds c_{r+1}
    and the vote join re-reads e every round — an inlining planner
    re-expands the chain exponentially (the k-core lesson)."""
    parts = [
        """WITH raw AS MATERIALIZED (
  SELECT x.l_partkey AS a, y.l_partkey AS b
  FROM lineitem x
  JOIN lineitem y
    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
  GROUP BY 1, 2
),
e AS MATERIALIZED (SELECT a AS s, b AS d FROM raw UNION ALL SELECT b, a FROM raw),
l0 AS MATERIALIZED (SELECT DISTINCT s AS node, s AS lbl FROM e),"""
    ]
    for r in range(1, rounds + 1):
        prev = f"l{r - 1}"
        parts.append(
            f"""c{r} AS MATERIALIZED (
  SELECT e.s, l.lbl, COUNT(*) AS c
  FROM e JOIN {prev} l ON l.node = e.d
  GROUP BY 1, 2
),
l{r} AS MATERIALIZED (
  SELECT s AS node, lbl FROM (
    SELECT s, lbl,
           ROW_NUMBER() OVER (PARTITION BY s ORDER BY c DESC, lbl) AS rn
    FROM c{r}
  ) WHERE rn = 1
),"""
        )
    parts.append(
        f"""fin AS (SELECT node, lbl FROM l{rounds})
SELECT CAST(node AS BIGINT) AS node, CAST(lbl AS BIGINT) AS community
FROM fin ORDER BY node"""
    )
    return "\n".join(parts)


def _lpa_modularity_oracle(rounds: int = 4) -> str:
    """The same unrolled-LPA CTE chain, closed with the Newman
    modularity + conductance tail instead of the label dump — one
    source of truth for the sweeps (a fix to the LPA recurrence can
    never diverge the two oracles)."""
    base = _lpa_oracle(rounds)
    prefix = base[: base.index(f"fin AS (SELECT node, lbl FROM l{rounds})")]
    return (
        prefix
        + f"""fin AS MATERIALIZED (SELECT node, lbl AS community FROM l{rounds}),
mm AS (SELECT COUNT(*) AS m FROM raw),
ee AS (
  SELECT la.community, COUNT(*) AS internal_edges
  FROM raw JOIN fin la ON la.node = raw.a JOIN fin lb ON lb.node = raw.b
  WHERE la.community = lb.community GROUP BY 1
),
deg AS (SELECT s AS node, COUNT(*) AS deg FROM e GROUP BY 1),
vol AS (
  SELECT l.community, SUM(d.deg) AS degree_sum, COUNT(*) AS n_nodes
  FROM deg d JOIN fin l ON l.node = d.node GROUP BY 1
)
SELECT CAST(v.community AS BIGINT) AS community,
       CAST(v.n_nodes AS BIGINT) AS n_nodes,
       CAST(COALESCE(ee.internal_edges, 0) AS BIGINT) AS internal_edges,
       CAST(v.degree_sum AS BIGINT) AS degree_sum,
       -- association order matches Spark's (a - b) + 1e-9 (ADVICE r6)
       ROUND((COALESCE(ee.internal_edges, 0) / (1.0 * mm.m)
             - POWER(v.degree_sum / (2.0 * mm.m), 2)) + 1e-9, 6) + 0 AS q_term,
       ROUND(1e-9 + (v.degree_sum - 2 * COALESCE(ee.internal_edges, 0))
             / (1.0 * LEAST(v.degree_sum, 2 * mm.m - v.degree_sum)), 6) + 0
         AS conductance
FROM vol v LEFT JOIN ee ON ee.community = v.community CROSS JOIN mm
ORDER BY community"""
    )


@golden(
    "label_propagation_communities",
    _lpa_oracle(),
    tags=("graph", "communities", "iterative"),
)
def label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Communities of the co-purchase graph by deterministic synchronous
    label propagation (4 sweeps, min-label tie-break): the cluster
    grouping step between pairwise similarity and curation decisions —
    the same role connected components plays for EXACT duplicate links,
    over a graph where membership is soft. Fixed sweeps + smallest-label
    ties make the result a pure function of the edge list, so the oracle
    unrolls the identical sweeps (MATERIALIZED, the k-core lesson).
    Integer labels, no FP surface."""
    from mr_dice_spark.operators.graph import label_propagation

    edges = _copurchase_edges(spark, sf_dir)
    return label_propagation(edges, n_iter=4)


@golden(
    "community_modularity_copurchase",
    _lpa_modularity_oracle(),
    tags=("graph", "communities", "evaluation"),
)
def community_modularity_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality metrics for the LPA communities — per-community Newman
    modularity terms and conductance (what B-cubed/ARI are to the ER
    linkage: the measured-quality layer over a clustering operator).
    The oracle reuses the unrolled-LPA CTE chain verbatim and closes it
    with the modularity tail, so the sweeps have one source of truth.
    All-integer inputs; the two ratio columns round on the 1e-9-nudged
    grid."""
    from mr_dice_spark.operators.graph import label_propagation, modularity

    edges = _copurchase_edges(spark, sf_dir)
    comm = label_propagation(edges, n_iter=4)
    return modularity(edges, comm).orderBy("community")


# ---------------------------------------------------------------------------
# homoglyph folding + dedup (adversarial codepoint-swap evasion)
# ---------------------------------------------------------------------------

def _homoglyph_oracle() -> str:
    from mr_dice_spark.functions.text import homoglyph_translate_sql

    fold = homoglyph_translate_sql("text")
    return f"""
WITH evaded AS (
  SELECT doc_id + 500000 AS doc_id,
         translate(text, 'aeopc', chr(1072) || chr(1077) || chr(1086)
                                  || chr(1088) || chr(1089)) AS text
  FROM documents WHERE doc_id % 2 = 0
),
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id, text FROM evaded
),
folded AS (SELECT doc_id, {fold} AS text FROM corpus),
ded AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
    FROM folded
  ) WHERE rn = 1
)
SELECT doc_id, md5(text) AS text_hash FROM ded ORDER BY doc_id
"""


@golden(
    "homoglyph_fold_dedup",
    _homoglyph_oracle(),
    tags=("text", "unicode", "homoglyph", "dedup"),
)
def homoglyph_fold_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adversarial dedup: every even document gains an 'evaded' twin
    whose Latin a/e/o/p/c are swapped for the visually identical
    Cyrillic codepoints (the spam/SEO trick NFC cannot undo — these are
    distinct letters, not combining forms). fold_homoglyphs maps the
    common confusable set back to Latin, so first-wins exact dedup
    drops every evaded twin while odd documents (no twin) and genuinely
    distinct texts survive. Pure codegen translate() on both engines —
    the oracle folds with the identical alphabet strings."""
    from mr_dice_spark.functions.text import fold_homoglyphs
    from mr_dice_spark.operators.dedup import dedup_exact

    docs = Catalog(spark, sf_dir).documents.select("doc_id", "text")
    evaded = (
        docs.where(F.col("doc_id") % 2 == 0)
        .select(
            (F.col("doc_id") + 500000).alias("doc_id"),
            F.translate(
                F.col("text"), "aeopc", "аеорс"
            ).alias("text"),
        )
    )
    corpus = docs.unionByName(evaded)
    folded = corpus.withColumn("text", fold_homoglyphs(F.col("text")))
    ded = dedup_exact(folded, ["text"], "doc_id")
    return ded.select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("text_hash")
    ).orderBy("doc_id")


# Precision twin: same corpus prep / signatures / banding CTEs as the
# recall oracle (everything up to `cand`; DuckDB skips the unreferenced
# truth/inter CTEs), with the tail flipped to verify CANDIDATES.
MINHASH_PRECISION_ORACLE = MINHASH_RECALL_ORACLE.rsplit(
    "SELECT least(floor(t.j", 1
)[0] + """, inter_c AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS i
  FROM cand c
  JOIN sh a ON a.doc_id = c.id_a
  JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
  GROUP BY 1, 2
),
v AS (
  SELECT c.id_a, c.id_b,
         COALESCE(ic.i * 1.0 / (ca.n + cb.n - ic.i), 0.0) AS j
  FROM cand c
  LEFT JOIN inter_c ic ON ic.id_a = c.id_a AND ic.id_b = c.id_b
  JOIN cnt ca ON c.id_a = ca.doc_id
  JOIN cnt cb ON c.id_b = cb.doc_id
)
SELECT least(floor(j * 10) / 10, 1.0) AS bucket_lo,
       CAST(count(*) AS BIGINT) AS n_candidates,
       CAST(count_if(j >= 0.2) AS BIGINT) AS n_confirmed,
       ROUND(1e-9 + count_if(j >= 0.2) * 1.0 / count(*), 6) AS precision
FROM v GROUP BY 1
ORDER BY bucket_lo
"""


@golden(
    "minhash_precision_audit_curve",
    MINHASH_PRECISION_ORACLE,
    tags=("dedup", "minhash", "lsh", "precision", "audit"),
)
def minhash_precision_audit_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured banding PRECISION of the same 8-hash/4-band config on
    the same variant-augmented corpus as the recall curve — together
    the full PR view: every candidate pair the banding proposes is
    verified against exact Jaccard and bucketed, pricing the wasted
    verify work (false candidates) the config buys. Same portable
    construction, so the audit itself hash-matches SQL."""
    from mr_dice_spark.functions.text import tokens
    from mr_dice_spark.operators.dedup import minhash_precision_audit

    docs = Catalog(spark, sf_dir).documents.select("doc_id", "text")
    w = tokens(F.col("text"))
    m = F.element_at(
        F.array(F.lit(5), F.lit(9), F.lit(17), F.lit(33)),
        (F.col("doc_id") % 4).cast("int") + 1,
    )
    idx = F.when(F.size(w) >= 1, F.sequence(F.lit(1), F.size(w))).otherwise(
        F.array().cast("array<int>")
    )
    repl = F.transform(
        idx,
        lambda i: F.when(
            ((i - 1 + F.col("doc_id")) % m) == 0,
            F.concat(F.element_at(w, i), F.lit("~")),
        ).otherwise(F.element_at(w, i)),
    )
    # two-step select (the recall golden's projection-collapse lesson)
    variants = docs.withColumn("text", F.array_join(repl, " ")).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(variants)
    return minhash_precision_audit(
        corpus, "doc_id", "text", threshold=0.2, num_hashes=8, bands=4
    )


ER_BCUBED_ORACLE = """
WITH dirty AS (
  SELECT c_custkey + 10000000 AS did,
         substring(c_name, 1, 1 + (c_custkey % (length(c_name) - 1)) - 1)
           || substring(c_name, 1 + (c_custkey % (length(c_name) - 1)) + 1)
           AS dname
  FROM customer
),
cand AS (
  SELECT did, cid, dist FROM (
    SELECT d.did, c.c_custkey AS cid,
           levenshtein(d.dname, c.c_name) AS dist
    FROM dirty d CROSS JOIN customer c
  ) WHERE dist <= 1
),
best AS (
  SELECT did, cid,
         ROW_NUMBER() OVER (PARTITION BY did ORDER BY dist, cid) AS rk
  FROM cand
),
assign AS (
  SELECT c_custkey AS id, c_custkey AS cl, c_custkey AS gold FROM customer
  UNION ALL
  SELECT did, cid, did - 10000000 FROM best WHERE rk = 1
),
cells AS (SELECT cl, gold, COUNT(*) AS o FROM assign GROUP BY 1, 2),
nc AS (SELECT cl, SUM(o) AS n_c FROM cells GROUP BY cl),
ng AS (SELECT gold, SUM(o) AS n_g FROM cells GROUP BY gold),
s AS (
  SELECT SUM(o) AS n,
         SUM(CAST(o AS DOUBLE) * o / n_c) AS sp,
         SUM(CAST(o AS DOUBLE) * o / n_g) AS sr
  FROM cells JOIN nc USING (cl) JOIN ng USING (gold)
)
SELECT CAST(n AS BIGINT) AS n,
       ROUND(1e-9 + sp / n, 6) AS bcubed_precision,
       ROUND(1e-9 + sr / n, 6) AS bcubed_recall,
       ROUND(1e-9 + 2.0 * (sp / n) * (sr / n) / ((sp / n) + (sr / n)), 6)
         AS bcubed_f1
FROM s
"""


@golden(
    "er_linkage_bcubed",
    ER_BCUBED_ORACLE,
    tags=("evaluation", "entity-resolution", "clustering", "pipeline"),
)
def er_linkage_bcubed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-cubed quality of the ER best-match linkage against the planted
    ground truth: clean records cluster with the dirty twins matched to
    them; gold groups each twin with its true parent. A twin matched to
    the WRONG clean record merges two entities and is charged on both
    sides per record — the honest scalar for 'how good is this linkage'
    (the raw true-parent rate ignores the merge damage). Runs the full
    pipeline: corrupt -> PassJoin (hot-block refined) -> best-match
    window -> B-cubed, all cell-sized aggregates after the linkage."""
    from mr_dice_spark.operators.evaluation import bcubed_scores

    OFF = 10_000_000
    linkage = er_best_match_linkage(spark, sf_dir)
    clean = Catalog(spark, sf_dir).customer.select(
        F.col("c_custkey").alias("id"),
        F.col("c_custkey").alias("cl"),
        F.col("c_custkey").alias("gold"),
    )
    dirty = linkage.select(
        (F.col("dirty_key") + OFF).alias("id"),
        F.col("matched_key").alias("cl"),
        F.col("dirty_key").alias("gold"),
    )
    out = bcubed_scores(clean.unionByName(dirty), "id", "cl", "gold")
    return out.select(
        "n",
        _r("bcubed_precision", 6).alias("bcubed_precision"),
        _r("bcubed_recall", 6).alias("bcubed_recall"),
        _r("bcubed_f1", 6).alias("bcubed_f1"),
    )


# Same linkage CTEs as ER_BCUBED_ORACLE, ARI tail.
ER_ARI_ORACLE = ER_BCUBED_ORACLE.rsplit("cells AS", 1)[0] + """cells AS (
  SELECT cl, gold, COUNT(*) AS o FROM assign GROUP BY 1, 2
),
so AS (
  SELECT SUM(o) AS n, SUM(CAST(o AS DOUBLE) * (o - 1) / 2) AS s_o FROM cells
),
sc AS (
  SELECT SUM(CAST(nc AS DOUBLE) * (nc - 1) / 2) AS s_c
  FROM (SELECT SUM(o) AS nc FROM cells GROUP BY cl)
),
sg AS (
  SELECT SUM(CAST(ng AS DOUBLE) * (ng - 1) / 2) AS s_g
  FROM (SELECT SUM(o) AS ng FROM cells GROUP BY gold)
)
SELECT CAST(n AS BIGINT) AS n,
       ROUND(1e-9 + (s_o - s_c * s_g / (CAST(n AS DOUBLE) * (n - 1) / 2))
             / NULLIF((s_c + s_g) / 2
                      - s_c * s_g / (CAST(n AS DOUBLE) * (n - 1) / 2), 0), 6)
         AS ari
FROM so CROSS JOIN sc CROSS JOIN sg
"""


@golden(
    "er_linkage_ari",
    ER_ARI_ORACLE,
    tags=("evaluation", "entity-resolution", "clustering", "pipeline"),
)
def er_linkage_ari(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjusted Rand Index of the same ER linkage clustering — the
    chance-corrected pair-counting view next to B-cubed's per-record
    view (two metrics disagreeing flags size-skewed damage). Same
    planted truth, same cell-sized arithmetic."""
    from mr_dice_spark.operators.evaluation import adjusted_rand_index

    OFF = 10_000_000
    linkage = er_best_match_linkage(spark, sf_dir)
    clean = Catalog(spark, sf_dir).customer.select(
        F.col("c_custkey").alias("id"),
        F.col("c_custkey").alias("cl"),
        F.col("c_custkey").alias("gold"),
    )
    dirty = linkage.select(
        (F.col("dirty_key") + OFF).alias("id"),
        F.col("matched_key").alias("cl"),
        F.col("dirty_key").alias("gold"),
    )
    out = adjusted_rand_index(clean.unionByName(dirty), "id", "cl", "gold")
    return out.select("n", _r("ari", 6).alias("ari"))


# ---------------------------------------------------------------------------
# Adamic-Adar link prediction over the sparsified co-purchase graph (round 7)
# ---------------------------------------------------------------------------

ADAMIC_ADAR_ORACLE = """
WITH li AS MATERIALIZED (
  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 45
),
e AS MATERIALIZED (
  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
  FROM li x JOIN li y
    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
),
und AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
deg AS (SELECT a AS w, COUNT(*) AS dg FROM und GROUP BY 1),
inc AS (SELECT a AS w, b AS u FROM und),
wed AS (
  SELECT x.u AS na, y.u AS nb, x.w AS w
  FROM inc x JOIN inc y ON x.w = y.w AND x.u < y.u
),
sc AS (
  SELECT na, nb, COUNT(*) AS n_common,
         SUM(1.0 / LN(CAST(dg AS DOUBLE))) AS s
  FROM wed JOIN deg ON deg.w = wed.w
  GROUP BY 1, 2
),
non AS (
  SELECT sc.* FROM sc LEFT JOIN e ON e.a = sc.na AND e.b = sc.nb
  WHERE e.a IS NULL
)
SELECT CAST(na AS BIGINT) AS node_a,
       CAST(nb AS BIGINT) AS node_b,
       CAST(n_common AS BIGINT) AS n_common,
       ROUND(s + 1e-9, 6) AS score
FROM non ORDER BY node_a, node_b
"""


@golden(
    "adamic_adar_link_prediction",
    ADAMIC_ADAR_ORACLE,
    tags=("graph", "link-prediction", "join"),
)
def adamic_adar_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link-prediction scores over the high-quantity
    co-purchase graph (l_quantity >= 45 sparsifies deterministically so
    the full exact wedge set stays linear in scale factor — ~11k wedges
    at sf0.01, ~114k at sf0.1): every non-adjacent part pair at
    distance 2 scored by hub-down-weighted common neighbors. A wedge
    center always has degree >= 2, so 1/ln(deg) needs no epsilon; the
    oracle restates the degree join, wedge self-join and anti-join
    verbatim."""
    from mr_dice_spark.operators.graph import adamic_adar_scores

    edges = _copurchase_edges(spark, sf_dir, min_qty=45)
    out = adamic_adar_scores(edges)
    return out.select(
        F.col("node_a").cast("long").alias("node_a"),
        F.col("node_b").cast("long").alias("node_b"),
        "n_common",
        "score",
    ).orderBy("node_a", "node_b")


# ---------------------------------------------------------------------------
# Degree assortativity over the same sparsified co-purchase graph (round 7)
# ---------------------------------------------------------------------------

ASSORTATIVITY_ORACLE = """
WITH li AS MATERIALIZED (
  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 45
),
e AS MATERIALIZED (
  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
  FROM li x JOIN li y
    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
),
und AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
deg AS MATERIALIZED (SELECT a AS w, COUNT(*) AS dg FROM und GROUP BY 1),
st AS (
  SELECT d1.dg AS j, d2.dg AS kk
  FROM und JOIN deg d1 ON d1.w = und.a JOIN deg d2 ON d2.w = und.b
),
t AS (
  SELECT COUNT(*) AS m,
         SUM(CAST(j AS DOUBLE)) AS sj,
         SUM(CAST(j AS DOUBLE) * CAST(kk AS DOUBLE)) AS sjk,
         SUM(CAST(j AS DOUBLE) * CAST(j AS DOUBLE)) AS sj2
  FROM st
),
c AS (SELECT (SELECT COUNT(*) FROM deg) AS nv, (SELECT COUNT(*) FROM e) AS ne)
SELECT CAST(nv AS BIGINT) AS n_nodes,
       CAST(ne AS BIGINT) AS n_edges,
       CAST(m AS BIGINT) AS m_stubs,
       ROUND(CASE WHEN CAST(m AS DOUBLE) * sj2 - sj * sj <> 0
             THEN (CAST(m AS DOUBLE) * sjk - sj * sj)
                  / (CAST(m AS DOUBLE) * sj2 - sj * sj) END + 1e-9, 6) + 0.0
         AS r
FROM t, c
"""


@golden(
    "degree_assortativity_copurchase",
    ASSORTATIVITY_ORACLE,
    tags=("graph", "assortativity", "topology"),
)
def degree_assortativity_copurchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Degree assortativity of the high-quantity co-purchase graph —
    does this graph wire hubs-to-hubs (dedup of a hub barely dents it)
    or hubs-to-leaves (hub removal fragments it)? Same sparsified edge
    builder as the Adamic-Adar golden so the two read as one topology
    report. Exact-integer stub moments; r is the only float and is
    -0-normalized on both sides (near-zero assortativity is the
    expected regime for an order-co-membership graph)."""
    from mr_dice_spark.operators.graph import degree_assortativity

    edges = _copurchase_edges(spark, sf_dir, min_qty=45)
    out = degree_assortativity(edges)
    return out.select(
        "n_nodes", "n_edges", "m_stubs", (F.col("r") + F.lit(0.0)).alias("r")
    )


# ---------------------------------------------------------------------------
# Local clustering coefficients over the same sparsified graph (round 7)
# ---------------------------------------------------------------------------

LCC_ORACLE = """
WITH li AS MATERIALIZED (
  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 45
),
e AS MATERIALIZED (
  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
  FROM li x JOIN li y
    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
),
und AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
deg AS (SELECT a AS node, COUNT(*) AS degree FROM und GROUP BY 1),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
),
tn AS (
  SELECT node, COUNT(*) AS t FROM (
    SELECT x AS node FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri
  ) GROUP BY 1
)
SELECT CAST(d.node AS BIGINT) AS node,
       CAST(d.degree AS BIGINT) AS degree,
       CAST(COALESCE(t, 0) AS BIGINT) AS triangles,
       ROUND(CASE WHEN d.degree >= 2
             THEN (2.0 * CAST(COALESCE(t, 0) AS DOUBLE))
                  / (CAST(d.degree AS DOUBLE)
                     * (CAST(d.degree AS DOUBLE) - 1)) END + 1e-9, 6) AS lcc
FROM deg d LEFT JOIN tn ON tn.node = d.node
ORDER BY node
"""


@golden(
    "clustering_coefficient_copurchase",
    LCC_ORACLE,
    tags=("graph", "clustering-coefficient", "triangles"),
)
def clustering_coefficient_copurchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-node local clustering coefficient of the high-quantity
    co-purchase graph (same sparsified edge builder as the Adamic-Adar
    and assortativity goldens — the three read as one topology report):
    dense-core vs broker separation at node granularity. The Spark side
    counts triangles with the degree-oriented compact-forward wedge
    join (per-source fan-out O(sqrt m)); the oracle re-derives them
    with the plain node-ordered enumeration — same set, independently
    stated. lcc is an exact small-integer ratio."""
    from mr_dice_spark.operators.graph import clustering_coefficients

    edges = _copurchase_edges(spark, sf_dir, min_qty=45)
    return clustering_coefficients(edges).orderBy("node")


# ---------------------------------------------------------------------------
# Term burstiness (Church-Gale Fano factor) + per-lang unigram KL (round 7)
# ---------------------------------------------------------------------------

BURSTINESS_ORACLE = r"""
WITH toks AS (
  SELECT doc_id AS id,
         unnest(string_split_regex(trim(text), '\s+')) AS t
  FROM documents
),
tf AS (
  SELECT id, t, COUNT(*) AS tf FROM toks WHERE t <> '' GROUP BY 1, 2
),
per AS (
  SELECT t, COUNT(*) AS df, SUM(tf) AS s1, SUM(tf * tf) AS s2
  FROM tf GROUP BY t
),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nn FROM documents),
f AS (
  SELECT t, df, s1,
         CAST(s1 AS DOUBLE) / nn AS m,
         (CAST(s2 AS DOUBLE) / nn
          - (CAST(s1 AS DOUBLE) / nn) * (CAST(s1 AS DOUBLE) / nn))
         / (CAST(s1 AS DOUBLE) / nn) AS fano
  FROM per, n WHERE df >= 20
)
SELECT t AS term, CAST(df AS BIGINT) AS df, CAST(s1 AS BIGINT) AS total_tf,
       ROUND(m + 1e-9, 6) AS mean_tf,
       ROUND(fano + 1e-9, 6) AS fano
FROM f ORDER BY f.fano DESC, term ASC LIMIT 50
"""


@golden(
    "term_burstiness_documents",
    BURSTINESS_ORACLE,
    tags=("text", "burstiness", "fano", "terms"),
)
def term_burstiness_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 burstiest terms (df >= 20) over the documents corpus —
    the dispersion signal that separates clumped/templated tokens from
    evenly-spread connective tissue. The fano is exact-integer-derived
    and bit-identical across engines, so the top-k membership and order
    are deterministic; the oracle restates the zeros-free
    variance-from-sums identity verbatim."""
    from mr_dice_spark.operators.terms import term_burstiness

    docs = Catalog(spark, sf_dir).documents
    return term_burstiness(docs, "doc_id", "text", min_df=20, k=50)


UNIGRAM_KL_ORACLE = r"""
WITH cells AS MATERIALIZED (
  SELECT lang AS g, t, COUNT(*) AS c FROM (
    SELECT lang,
           unnest(string_split_regex(trim(text), '\s+')) AS t
    FROM documents
  ) WHERE t <> '' GROUP BY 1, 2
),
gt AS (SELECT g, SUM(c) AS ng FROM cells GROUP BY g),
tt AS (SELECT t, SUM(c) AS ct FROM cells GROUP BY t),
nn AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM cells),
term AS (
  SELECT cells.g, ng,
         (CAST(c AS DOUBLE) / CAST(ng AS DOUBLE))
         * log2((CAST(c AS DOUBLE) * n)
                / (CAST(ng AS DOUBLE) * CAST(ct AS DOUBLE))) AS kl
  FROM cells
  JOIN gt ON gt.g = cells.g
  JOIN tt ON tt.t = cells.t
  CROSS JOIN nn
)
SELECT g AS lang, CAST(MAX(ng) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS vocab_terms,
       ROUND(SUM(kl) + 1e-9, 6) AS kl_bits
FROM term GROUP BY g ORDER BY lang
"""


@golden(
    "unigram_kl_by_lang",
    UNIGRAM_KL_ORACLE,
    tags=("text", "kl-divergence", "mixture", "documents"),
)
def unigram_kl_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram KL(lang || corpus) in bits per language — the
    distribution-level mixture diagnostic: the slice whose KL moves
    after an ingest is the slice whose new shards changed character.
    No smoothing needed (group tokens are corpus tokens by
    construction); one transcendental per (lang, term) with
    exact-integer operands, ulp drift absorbed by the output round."""
    from mr_dice_spark.operators.terms import unigram_kl_by_group

    docs = Catalog(spark, sf_dir).documents
    return unigram_kl_by_group(docs, "lang", "text").orderBy("lang")


# ---------------------------------------------------------------------------
# Flesch readability scoring (round 7)
# ---------------------------------------------------------------------------

READABILITY_ORACLE = """
WITH t AS (
  SELECT doc_id, lower(COALESCE(text, '')) AS s FROM documents
),
c AS (
  SELECT doc_id,
         len(regexp_extract_all(s, '[a-z]+')) AS w,
         len(regexp_extract_all(s, '[.!?]+')) AS se,
         len(regexp_extract_all(s, '[aeiouy]+')) AS sy
  FROM t
)
SELECT doc_id,
       CAST(w AS BIGINT) AS n_words,
       CAST(se AS BIGINT) AS n_sentences,
       CAST(sy AS BIGINT) AS n_syllables,
       ROUND((206.835
              - 1.015 * (CAST(GREATEST(w, 1) AS DOUBLE) / GREATEST(se, 1))
              - 84.6 * (CAST(sy AS DOUBLE) / GREATEST(w, 1))) + 1e-9, 4)
         AS flesch
FROM c ORDER BY doc_id
"""


@golden(
    "readability_flesch_documents",
    READABILITY_ORACLE,
    tags=("text", "quality", "readability"),
)
def readability_flesch_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document with the portable vowel-group
    syllable proxy — the difficulty signal a quality-filter pipeline
    bins on beside Gopher/C4 rules. ASCII regex counts (words,
    sentence-enders, vowel groups) restate identically in DuckDB; the
    score is the only float and rounds at 4."""
    from mr_dice_spark.functions.text import readability_flesch

    docs = Catalog(spark, sf_dir).documents
    return (
        docs.select(
            "doc_id",
            readability_flesch(F.coalesce(F.col("text"), F.lit(""))).alias("__r"),
        )
        .select(
            "doc_id",
            F.col("__r.n_words").alias("n_words"),
            F.col("__r.n_sentences").alias("n_sentences"),
            F.col("__r.n_syllables").alias("n_syllables"),
            F.col("__r.flesch").alias("flesch"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# vocabulary richness estimates (round 7)
# ---------------------------------------------------------------------------

VOCAB_RICHNESS_ORACLE = r"""
WITH words AS (
  SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'),
                            x -> x <> '')) AS w
  FROM documents
),
freq AS (SELECT w, COUNT(*) AS c FROM words GROUP BY w),
a AS (
  SELECT SUM(c) AS n_tokens, COUNT(*) AS vocab,
         COUNT(CASE WHEN c = 1 THEN 1 END) AS f1,
         COUNT(CASE WHEN c = 2 THEN 1 END) AS f2
  FROM freq
)
SELECT CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(vocab AS BIGINT) AS vocab,
       CAST(f1 AS BIGINT) AS f1,
       CAST(f2 AS BIGINT) AS f2,
       ROUND(CAST(vocab AS DOUBLE)
             + CAST(f1 AS DOUBLE) * (CAST(f1 AS DOUBLE) - 1.0)
               / (2.0 * (CAST(f2 AS DOUBLE) + 1.0)) + 1e-9, 4) AS chao1,
       ROUND(CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE) + 1e-9, 6)
         AS gt_unseen_mass
FROM a
"""


@golden(
    "vocab_richness_documents",
    VOCAB_RICHNESS_ORACLE,
    tags=("text", "vocab", "chao1", "good-turing"),
)
def vocab_richness_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 + Good-Turing vocabulary-coverage estimates over the
    documents corpus (whitespace tokens, the heaps/zipf convention) —
    does more crawling buy new types? Integer type-frequency counts
    until the two closed-form estimates."""
    from mr_dice_spark.operators.vocab import vocab_richness_estimate

    return vocab_richness_estimate(Catalog(spark, sf_dir).documents, "text")


# ---------------------------------------------------------------------------
# Simpson diversity per source (round 7)
# ---------------------------------------------------------------------------

SIMPSON_ORACLE = """
WITH cells AS (
  SELECT source AS g, lang AS l, COUNT(*) AS c
  FROM documents
  WHERE source IS NOT NULL AND lang IS NOT NULL
  GROUP BY 1, 2
),
a AS (
  SELECT g, SUM(c) AS n, COUNT(*) AS n_labels,
         SUM(CAST(c AS DOUBLE) * c) AS s2
  FROM cells GROUP BY g
)
SELECT g AS source,
       CAST(n AS BIGINT) AS n,
       CAST(n_labels AS BIGINT) AS n_labels,
       ROUND((1.0 - s2 / (CAST(n AS DOUBLE) * n)) + 1e-9, 6) AS simpson,
       ROUND(1.0 / NULLIF(s2 / (CAST(n AS DOUBLE) * n), 0) + 1e-9, 6)
         AS effective_labels
FROM a ORDER BY source
"""


@golden(
    "simpson_lang_diversity_by_source",
    SIMPSON_ORACLE,
    tags=("profile", "diversity", "concentration"),
)
def simpson_lang_diversity_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson diversity / effective language count of each source's
    documents — the concentration readout beside Shannon entropy that
    weights dominant labels harder. Exact rational shares from
    counts."""
    from mr_dice_spark.operators.profile import simpson_diversity

    return simpson_diversity(
        Catalog(spark, sf_dir).documents, "source", "lang"
    ).orderBy("source")


# ---------------------------------------------------------------------------
# distinct-n n-gram diversity (round 7)
# ---------------------------------------------------------------------------

DISTINCT_NGRAM_ORACLE = r"""
WITH toks AS (
  SELECT lang,
         CASE WHEN trim(COALESCE(text, '')) = '' THEN []
              ELSE string_split_regex(trim(text), '\s+') END AS t
  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
),
grams AS (
  SELECT lang, nn.n AS n,
         unnest(list_transform(generate_series(1, len(t) - nn.n + 1),
                               i -> array_to_string(t[i:i + nn.n - 1], ' ')))
           AS gram
  FROM toks, (VALUES (1), (2), (3)) AS nn(n)
)
SELECT lang, CAST(n AS INT) AS n,
       CAST(COUNT(*) AS BIGINT) AS total_ngrams,
       CAST(COUNT(DISTINCT gram) AS BIGINT) AS distinct_ngrams,
       ROUND(CAST(COUNT(DISTINCT gram) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) + 1e-9, 6) AS distinct_ratio
FROM grams GROUP BY lang, n ORDER BY lang, n
"""


@golden(
    "distinct_ngram_diversity_by_lang",
    DISTINCT_NGRAM_ORACLE,
    tags=("text", "diversity", "ngram", "documents"),
)
def distinct_ngram_diversity_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-1/2/3 n-gram diversity per language (Li et al. 2016) —
    the template-collapse detector that fires long before exact-dup
    detectors do, because no two templated documents are identical. All
    three n sizes build in one codegen projection and explode once; the
    corpus is scanned and tokenized exactly once."""
    from mr_dice_spark.operators.vocab import distinct_ngram_diversity

    docs = Catalog(spark, sf_dir).documents
    return distinct_ngram_diversity(docs, "lang", "text", ns=(1, 2, 3)).orderBy(
        "lang", "n"
    )


# ---------------------------------------------------------------------------
# Jaro-Winkler ER pairs over the collapsed part-name domain
# ---------------------------------------------------------------------------

JARO_WINKLER_ORACLE = """
WITH names AS (
  SELECT p_name, COUNT(*) AS n_parts, split_part(p_name, ' ', 1) AS w
  FROM part WHERE p_name IS NOT NULL
  GROUP BY p_name
),
p AS (
  SELECT a.p_name AS name_a, b.p_name AS name_b,
         ROUND(jaro_winkler_similarity(a.p_name, b.p_name) + 1e-9, 6) AS jw,
         a.n_parts AS n_a, b.n_parts AS n_b
  FROM names a JOIN names b ON a.w = b.w AND a.p_name < b.p_name
)
SELECT name_a, name_b, jw,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b
FROM p WHERE jw >= 0.8
ORDER BY name_a, name_b
"""


@golden(
    "jaro_winkler_name_pairs",
    JARO_WINKLER_ORACLE,
    tags=("fuzzy", "er", "jaro-winkler", "part", "udf"),
)
def jaro_winkler_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaro-Winkler similar-name candidate pairs over the COLLAPSED
    part-name domain, blocked on the first token (the standard ER
    blocking trade) — the record-linkage scorer for short strings where
    edit distance over-penalizes transpositions. The collapse-first
    shape is the scale discipline: the quadratic pair work runs on the
    distinct-name frame (64 names here, bounded by the vocabulary at
    any corpus size), never on the corpus, and per-name part counts
    ride along for the join-back read a linkage pipeline needs. The
    Arrow-batched scorer reproduces DuckDB's byte-level
    jaro_winkler_similarity bit-for-bit, so the oracle restates it
    verbatim."""
    from mr_dice_spark.operators.fuzzy import jaro_winkler_pairs

    part = Catalog(spark, sf_dir).part
    names = (
        part.where(F.col("p_name").isNotNull())
        .groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .withColumn("w", F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)))
    )
    pairs = jaro_winkler_pairs(names, "p_name", "p_name", "w", threshold=0.8)
    na = names.select(
        F.col("p_name").alias("id_a"), F.col("n_parts").alias("n_a")
    )
    nb = names.select(
        F.col("p_name").alias("id_b"), F.col("n_parts").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(na), "id_a")
        .join(F.broadcast(nb), "id_b")
        .select(
            F.col("id_a").alias("name_a"),
            F.col("id_b").alias("name_b"),
            "jw",
            "n_a",
            "n_b",
        )
        .orderBy("name_a", "name_b")
    )
