"""Golden corpus part 7: URL canonicalization + URL-keyed dedup
(functions/urls.py) over URLs derived deterministically from ``documents``.

The oracle does NOT re-implement the parser: because both sides generate
the URLs from the same components, the oracle computes the expected
canonical form directly from those components — ground truth, so a parser
bug on the Spark side cannot be masked by a twin bug in the restatement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mr_dice_spark.catalog import Catalog
from mr_dice_spark.functions.urls import (
    dedup_by_url,
    normalize_url,
    registered_domain,
    url_host,
)
from mr_dice_spark.golden import golden


def _messy_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, url) with scheme-case, default-port, tracking-param,
    fragment, and trailing-slash noise, all keyed off doc_id. The TLD
    varies by doc_id so per-domain operators (the crawl pipeline's quota)
    have multiple real groups — a constant domain would make a per-group
    cap indistinguishable from a global top-k."""
    d = Catalog(spark, sf_dir).documents
    m = lambda k: F.col("doc_id") % k  # noqa: E731
    scheme = (
        F.when(m(3) == 0, "https").when(m(3) == 1, "HTTPS").otherwise("http")
    )
    tld = (
        F.when(m(3) == 0, ".Example.COM")
        .when(m(3) == 1, ".Example.ORG")
        .otherwise(".Sample.NET")
    )
    host = F.concat("source", tld)
    port = (
        F.when((m(4) == 0) & (m(3) != 2), ":443")
        .when((m(4) == 0) & (m(3) == 2), ":80")
        .when(m(4) == 1, ":8080")
        .otherwise("")
    )
    path = F.concat(
        F.lit("/Docs/"), (m(50)).cast("string"), F.when(m(5) == 0, "/").otherwise("")
    )
    query = F.when(m(2) == 0, "?utm_source=feed&b=2&a=1").otherwise(
        "?a=1&b=2&utm_campaign=x"
    )
    frag = F.when(m(7) == 0, "#sec").otherwise("")
    return d.select(
        "doc_id",
        F.concat(scheme, F.lit("://"), host, port, path, query, frag).alias("url"),
    )


# ground-truth canonical pieces, restated over the same generators
_CANON_SQL = """
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 2 THEN 'http' ELSE 'https' END
           || '://' || source
           || CASE doc_id % 3 WHEN 0 THEN '.example.com'
                              WHEN 1 THEN '.example.org'
                              ELSE '.sample.net' END
           || CASE WHEN doc_id % 4 = 1 THEN ':8080' ELSE '' END
           || '/Docs/' || CAST(doc_id % 50 AS VARCHAR)
           || '?a=1&b=2' AS url_norm,
         source || CASE doc_id % 3 WHEN 0 THEN '.example.com'
                                   WHEN 1 THEN '.example.org'
                                   ELSE '.sample.net' END AS host,
         CASE doc_id % 3 WHEN 0 THEN 'example.com'
                         WHEN 1 THEN 'example.org'
                         ELSE 'sample.net' END AS domain
  FROM documents
"""

URL_NORM_ORACLE = f"""
WITH c AS ({_CANON_SQL})
SELECT doc_id, url_norm, host, domain FROM c ORDER BY doc_id
"""


@golden("url_normalize_canonical", URL_NORM_ORACLE, tags=("web", "url", "text"))
def url_normalize_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalizer vs ground truth: scheme/host lowercased, default
    ports and fragments stripped, tracking params removed, query sorted,
    trailing slash dropped — all codegen'd string expressions."""
    u = _messy_urls(spark, sf_dir)
    return u.select(
        "doc_id",
        normalize_url("url").alias("url_norm"),
        url_host("url").alias("host"),
        registered_domain("url").alias("domain"),
    ).orderBy("doc_id")


URL_DEDUP_ORACLE = f"""
WITH c AS ({_CANON_SQL})
SELECT doc_id FROM (
  SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY url_norm ORDER BY doc_id)
           AS rn
  FROM c
) WHERE rn = 1
ORDER BY doc_id
"""


@golden("url_dedup_survivors", URL_DEDUP_ORACLE, tags=("web", "url", "dedup"))
def url_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per canonical URL, min doc_id wins — the cheap first stage
    of crawl dedup (before any content-level MinHash pass)."""
    u = _messy_urls(spark, sf_dir)
    return dedup_by_url(u, "url", "doc_id").select("doc_id").orderBy("doc_id")


CRAWL_PIPELINE_ORACLE = f"""
WITH c AS ({_CANON_SQL}),
d AS (
  SELECT c.doc_id, c.url_norm, c.domain, doc.lang, doc.n_chars
  FROM c JOIN documents doc USING (doc_id)
),
survivors AS (
  SELECT * FROM (
    SELECT d.*, ROW_NUMBER() OVER (PARTITION BY url_norm ORDER BY doc_id) AS rn
    FROM d
  ) WHERE rn = 1
),
quality AS (
  SELECT doc_id, domain, lang, n_chars FROM survivors
  WHERE n_chars >= 120 AND lang IN ('en', 'de', 'fr')
)
SELECT doc_id, domain, lang, CAST(n_chars AS BIGINT) AS n_chars FROM (
  SELECT q.*, ROW_NUMBER() OVER (PARTITION BY domain ORDER BY doc_id) AS dq
  FROM quality q
) WHERE dq <= 25
ORDER BY doc_id
"""


@golden("crawl_curation_pipeline", CRAWL_PIPELINE_ORACLE, tags=("web", "pipeline", "quota"))
def crawl_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed crawl-ingest path a web corpus actually runs:
    URL-canonical dedup (cheap first stage) -> quality gate (length +
    language allowlist) -> per-domain quota (crawl-politeness cap,
    deterministic min-doc_id winners). Three existing operators stitched:
    dedup_by_url + plain filters + per_group_topk — two shuffles total
    (canonical-url window, domain window), everything else scan-side."""
    from mr_dice_spark.operators.topk import per_group_topk

    d = Catalog(spark, sf_dir).documents
    u = _messy_urls(spark, sf_dir).join(d.select("doc_id", "lang", "n_chars"), "doc_id")
    survivors = dedup_by_url(u, "url", "doc_id")
    quality = survivors.where(
        (F.col("n_chars") >= 120) & F.col("lang").isin("en", "de", "fr")
    ).withColumn("domain", registered_domain("url"))
    capped = per_group_topk(quality, ["domain"], [F.col("doc_id").asc()], 25)
    return capped.select("doc_id", "domain", "lang", "n_chars").orderBy("doc_id")


WINNOW_ORACLE = r"""
WITH t AS (
  SELECT doc_id, lower(regexp_replace(trim(text), '[ \t\n\r\f\x0B]+', ' ', 'g')) AS s
  FROM documents
),
g AS (
  SELECT doc_id,
         list_transform(
           generate_series(1, GREATEST(len(s) - 7, 1)),
           i -> CAST(('0x' || substring(md5(substr(s, CAST(i AS INT), 8)), 1, 15))
                     AS BIGINT)) AS h
  FROM t WHERE len(s) >= 8
),
m AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, GREATEST(len(h) - 3, 1)),
           j -> list_min(h[CAST(j AS INT):CAST(j + 3 AS INT)]))) AS fps
  FROM g
)
SELECT doc_id, UNNEST(fps) AS fingerprint
FROM m ORDER BY doc_id, fingerprint
"""


@golden("winnowing_fingerprints_portable", WINNOW_ORACLE, tags=("text", "fingerprint", "winnowing"))
def winnowing_fingerprints_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS winnowing fingerprints (k=8 char grams, window=4) with the
    md5-derived portable hash — DuckDB reproduces every gram hash, window
    minimum, and distinct fingerprint bit-for-bit. The guarantee-bearing
    substring fingerprint scheme (any shared substring >= window+k-1
    chars forces a shared fingerprint), complementing MinHash (set
    similarity) and SimHash (global distance)."""
    from mr_dice_spark.operators.winnowing import winnowing_fingerprints

    docs = Catalog(spark, sf_dir).documents
    fps = winnowing_fingerprints(docs, "doc_id", "text", k=8, window=4, portable=True)
    return fps.orderBy("doc_id", "fingerprint")


WINNOW_OVERLAP_ORACLE = r"""
WITH t AS (
  SELECT doc_id, lower(regexp_replace(trim(text), '[ \t\n\r\f\x0B]+', ' ', 'g')) AS s
  FROM documents
),
g AS (
  SELECT doc_id,
         list_transform(
           generate_series(1, GREATEST(len(s) - 7, 1)),
           i -> CAST(('0x' || substring(md5(substr(s, CAST(i AS INT), 8)), 1, 15))
                     AS BIGINT)) AS h
  FROM t WHERE len(s) >= 8
),
m AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, GREATEST(len(h) - 3, 1)),
           j -> list_min(h[CAST(j AS INT):CAST(j + 3 AS INT)]))) AS fps
  FROM g
),
fp AS (SELECT doc_id, UNNEST(fps) AS f FROM m)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
FROM fp a JOIN fp b ON a.f = b.f AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING COUNT(*) >= 3
ORDER BY id_a, id_b
"""


@golden("winnowing_overlap_pairs", WINNOW_OVERLAP_ORACLE, tags=("text", "fingerprint", "dedup"))
def winnowing_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS ranking pass: document pairs sharing >= 3 winnowed
    fingerprints (substring-level near-dup evidence), oracle-checked over
    the identical fingerprint sets.

    ``prefix_filter=False`` (the inverted-index count-join) is the
    deliberate strategy choice for THIS query's regime, not a shortcut:
    at ``min_shared=3`` against ~110-fingerprint documents the PPJoin
    prefix keeps ``n - 2`` of ``n`` fingerprints, so the candidate join
    explodes identically on both paths (78.2M rows measured at sf0.1)
    while the prefix path then pays a 54M-row distinct AND two joins
    shipping full fingerprint ARRAYS to 10.9M pairs for the
    array_intersect verify. The count-join computes ``shared`` from the
    very same join with a map-side-combinable COUNT — no distinct, no
    array payloads (measured 59->5 s at sf0.1; both paths are exact and
    tests/test_winnowing.py::test_overlap_join_prefix_filter_matches_naive
    pins their equality). Prefix filtering remains the right call when
    ``min_shared`` is a large fraction of the set size — that regime
    keeps the operator default."""
    from mr_dice_spark.operators.winnowing import (
        fingerprint_overlap_join,
        winnowing_fingerprints,
    )

    docs = Catalog(spark, sf_dir).documents
    fps = winnowing_fingerprints(docs, "doc_id", "text", k=8, window=4, portable=True)
    return fingerprint_overlap_join(
        fps, "doc_id", min_shared=3, prefix_filter=False
    ).orderBy("id_a", "id_b")


WINNOW_TOPK_ORACLE = WINNOW_OVERLAP_ORACLE.replace(
    "ORDER BY id_a, id_b", "ORDER BY shared DESC, id_a, id_b LIMIT 500"
)


@golden(
    "winnowing_overlap_topk",
    WINNOW_TOPK_ORACLE,
    tags=("text", "fingerprint", "dedup", "topk"),
)
def winnowing_overlap_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MOSS REPORT shape: the 500 most-overlapping document pairs
    (shared DESC, pair id tiebreak) — what a reviewer actually reads,
    vs winnowing_overlap_pairs' full pair dump. Same count-join
    aggregate underneath (``prefix_filter=False`` — the regime
    rationale, with measurements, is on winnowing_overlap_pairs; at
    min_shared=3 the PPJoin prefix cannot prune and its array-verify
    joins were 85% of this query's 60 s wall at sf0.1); the LIMIT rides
    Spark's TakeOrdered, so the result sink is 500 rows however many
    pairs exist. This is also the bench entry for the overlap family:
    the full dump's 9.7M-row sink serialization (91 s of the 122 s noop
    write at sf0.1) measures the sink, not the operator."""
    from mr_dice_spark.operators.winnowing import (
        fingerprint_overlap_join,
        winnowing_fingerprints,
    )

    docs = Catalog(spark, sf_dir).documents
    fps = winnowing_fingerprints(docs, "doc_id", "text", k=8, window=4, portable=True)
    return (
        fingerprint_overlap_join(fps, "doc_id", min_shared=3, prefix_filter=False)
        .orderBy(F.desc("shared"), "id_a", "id_b")
        .limit(500)
    )


# shared winnowing CTE prefix (normalize -> gram hashes -> window minima
# with positions -> common fingerprints -> covered intervals `iv`) used by
# BOTH span-family oracles, so a fix to the gram/normalization arithmetic
# can never land in one and silently diverge the other (same pattern as
# golden_multimodal's _BYTES_CTE)
_WINNOW_IV_CTES = r"""
t AS (
  SELECT doc_id, lower(regexp_replace(trim(text), '[ \t\n\r\f\x0B]+', ' ', 'g')) AS s
  FROM documents
),
g AS (
  SELECT doc_id,
         list_transform(
           generate_series(1, GREATEST(len(s) - 7, 1)),
           i -> CAST(('0x' || substring(md5(substr(s, CAST(i AS INT), 8)), 1, 15))
                     AS BIGINT)) AS h
  FROM t WHERE len(s) >= 8
),
m AS (
  SELECT doc_id,
         list_transform(
           generate_series(1, GREATEST(len(h) - 3, 1)),
           j -> list_min(h[CAST(j AS INT):CAST(j + 3 AS INT)])) AS mins,
         list_transform(
           generate_series(1, GREATEST(len(h) - 3, 1)),
           j -> j - 1 + list_position(h[CAST(j AS INT):CAST(j + 3 AS INT)],
                                      list_min(h[CAST(j AS INT):CAST(j + 3 AS INT)]))) AS poss
  FROM g
),
fp AS (
  SELECT DISTINCT doc_id, mins[CAST(i AS INT)] AS f, poss[CAST(i AS INT)] AS p
  FROM m, UNNEST(generate_series(1, len(mins))) AS u(i)
),
common AS (SELECT f FROM fp GROUP BY f HAVING COUNT(DISTINCT doc_id) >= 2),
iv AS (SELECT DISTINCT fp.doc_id, fp.p AS s, fp.p + 7 AS e FROM fp JOIN common USING (f))
"""

BOILERPLATE_SPANS_ORACLE = f"""
WITH {_WINNOW_IV_CTES},
fl AS (
  SELECT doc_id, s, e,
         CASE WHEN s > COALESCE(MAX(e) OVER (
                  PARTITION BY doc_id ORDER BY s, e
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
              THEN 1 ELSE 0 END AS nw
  FROM iv
),
isl AS (
  SELECT *, SUM(nw) OVER (PARTITION BY doc_id ORDER BY s, e
                          ROWS UNBOUNDED PRECEDING) AS gid
  FROM fl
)
SELECT doc_id,
       CAST(MIN(s) AS INT) AS span_start,
       CAST(MAX(e) AS INT) AS span_end,
       CAST(MAX(e) - MIN(s) + 1 AS INT) AS span_len
FROM isl GROUP BY doc_id, gid
ORDER BY doc_id, span_start
"""


BOILERPLATE_REMOVAL_ORACLE = f"""
WITH {_WINNOW_IV_CTES},
chars AS (
  SELECT t.doc_id, u.i, substr(t.s, CAST(u.i AS INT), 1) AS ch
  FROM t, UNNEST(generate_series(1, len(t.s))) AS u(i)
),
cov AS (
  SELECT DISTINCT c.doc_id, c.i
  FROM chars c JOIN iv ON c.doc_id = iv.doc_id AND c.i BETWEEN iv.s AND iv.e
),
kept AS (
  SELECT c.doc_id, string_agg(c.ch, '' ORDER BY c.i) AS text_clean
  FROM chars c LEFT JOIN cov ON c.doc_id = cov.doc_id AND c.i = cov.i
  WHERE cov.i IS NULL GROUP BY c.doc_id
)
SELECT t.doc_id,
       COALESCE(k.text_clean, '') AS text_clean,
       CAST(len(t.s) - len(COALESCE(k.text_clean, '')) AS INT) AS n_removed
FROM t LEFT JOIN kept k USING (doc_id)
ORDER BY t.doc_id
"""


@golden("boilerplate_removal_cleaned", BOILERPLATE_REMOVAL_ORACLE, tags=("text", "fingerprint", "spans", "pipeline"))
def boilerplate_removal_cleaned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full detect-then-cut chain: boilerplate_spans finds the
    cross-document repeated ranges, remove_spans stitches each document
    back together without them (row-count preserving; docs with no
    boilerplate keep their normalized text). The oracle recomputes the
    spans from scratch AND strips them character-by-character (kept char
    = not covered by any merged span) — a completely different stitch
    algorithm, so a fold bug on the Spark side cannot be mirrored.
    Note the merged-vs-unmerged difference is immaterial here: covering
    is a union either way."""
    from mr_dice_spark.operators.winnowing import boilerplate_spans, remove_spans

    docs = Catalog(spark, sf_dir).documents
    spans = boilerplate_spans(docs, "doc_id", "text", min_docs=2, k=8, window=4, portable=True)
    out = remove_spans(docs, "doc_id", "text", spans)
    return out.orderBy("doc_id")


@golden("winnowing_boilerplate_spans", BOILERPLATE_SPANS_ORACLE, tags=("text", "fingerprint", "spans"))
def winnowing_boilerplate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-span extraction: character ranges covered
    by fingerprints appearing in >= 2 documents, merged per document —
    the boilerplate a curation pipeline cuts from otherwise-unique docs.
    Linear shape (doc-frequency aggregate + interval merge, NO pair
    join); the oracle restates position-carrying winnowing, the
    doc-frequency filter, and the gaps-and-islands merge from scratch."""
    from mr_dice_spark.operators.winnowing import boilerplate_spans

    docs = Catalog(spark, sf_dir).documents
    out = boilerplate_spans(docs, "doc_id", "text", min_docs=2, k=8, window=4, portable=True)
    return out.select(
        "doc_id",
        F.col("span_start").cast("int").alias("span_start"),
        F.col("span_end").cast("int").alias("span_end"),
        F.col("span_len").cast("int").alias("span_len"),
    ).orderBy("doc_id", "span_start")


EXACT_REPEAT_ORACLE = r"""
WITH t AS MATERIALIZED (
  SELECT doc_id, lower(regexp_replace(trim(text), '[ \t\n\r\f\x0B]+', ' ', 'g')) AS s
  FROM documents
),
g AS MATERIALIZED (
  SELECT doc_id, u.i AS q, substr(s, CAST(u.i AS INT), 50) AS gram
  FROM t, UNNEST(generate_series(1, len(s) - 49)) AS u(i)
  WHERE len(s) >= 50
),
rep AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2),
cov AS (SELECT g.doc_id, g.q AS s, g.q + 49 AS e FROM g JOIN rep USING (gram)),
scan AS (
  SELECT doc_id, s, e,
         CASE WHEN s > COALESCE(MAX(e) OVER (PARTITION BY doc_id ORDER BY s, e
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
              THEN 1 ELSE 0 END AS new_island
  FROM cov
),
isl AS (
  SELECT doc_id, s, e,
         SUM(new_island) OVER (PARTITION BY doc_id ORDER BY s, e
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gid
  FROM scan
)
SELECT doc_id,
       CAST(MIN(s) AS INT) AS span_start,
       CAST(MAX(e) AS INT) AS span_end,
       CAST(MAX(e) - MIN(s) + 1 AS INT) AS span_len
FROM isl GROUP BY doc_id, gid
ORDER BY doc_id, span_start
"""


@golden(
    "exact_repeated_spans_documents",
    EXACT_REPEAT_ORACLE,
    tags=("text", "dedup", "spans", "exact-substring"),
)
def exact_repeated_spans_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact repeated-substring dedup (the Lee et al. ACL'22 50-token
    rule, at 50 normalized characters): every maximal span occurring
    verbatim in >= 2 documents. Winnowing prefilter (guaranteed recall)
    -> candidate-bound 50-gram hash grouping -> grouped exact text
    confirm -> islands merge; the oracle brute-forces ALL 50-grams and
    merges, so prefilter recall bugs (a missed candidate region) and
    precision bugs (an unconfirmed hash collision) both surface as hash
    mismatches. See operators/winnowing.py:exact_repeated_spans for the
    100 TB shape (work scales with candidate coverage, not corpus)."""
    from mr_dice_spark.operators.winnowing import exact_repeated_spans

    docs = Catalog(spark, sf_dir).documents
    out = exact_repeated_spans(docs, "doc_id", "text", min_len=50, min_docs=2)
    return out.select(
        "doc_id",
        F.col("span_start").cast("int").alias("span_start"),
        F.col("span_end").cast("int").alias("span_end"),
        F.col("span_len").cast("int").alias("span_len"),
    ).orderBy("doc_id", "span_start")


CONTAMINATION_ORACLE = r"""
WITH corpus AS MATERIALIZED (
  SELECT doc_id, lower(regexp_replace(trim(text), '[ \t\n\r\f\x0B]+', ' ', 'g')) AS s
  FROM documents WHERE doc_id % 17 <> 0
),
bench AS MATERIALIZED (
  SELECT doc_id, lower(regexp_replace(trim(text), '[ \t\n\r\f\x0B]+', ' ', 'g')) AS s
  FROM documents WHERE doc_id % 17 = 0
),
bg AS (
  SELECT DISTINCT substr(s, CAST(u.i AS INT), 50) AS gram
  FROM bench, UNNEST(generate_series(1, len(s) - 49)) AS u(i)
  WHERE len(s) >= 50
),
cg AS (
  SELECT doc_id, u.i AS q, substr(s, CAST(u.i AS INT), 50) AS gram
  FROM corpus, UNNEST(generate_series(1, len(s) - 49)) AS u(i)
  WHERE len(s) >= 50
),
cov AS (SELECT cg.doc_id, cg.q AS s, cg.q + 49 AS e FROM cg JOIN bg USING (gram)),
scan AS (
  SELECT doc_id, s, e,
         CASE WHEN s > COALESCE(MAX(e) OVER (PARTITION BY doc_id ORDER BY s, e
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
              THEN 1 ELSE 0 END AS new_island
  FROM cov
),
isl AS (
  SELECT doc_id, s, e,
         SUM(new_island) OVER (PARTITION BY doc_id ORDER BY s, e
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gid
  FROM scan
)
SELECT doc_id,
       CAST(MIN(s) AS INT) AS span_start,
       CAST(MAX(e) AS INT) AS span_end,
       CAST(MAX(e) - MIN(s) + 1 AS INT) AS span_len
FROM isl GROUP BY doc_id, gid
ORDER BY doc_id, span_start
"""


@golden(
    "contamination_spans_documents",
    CONTAMINATION_ORACLE,
    tags=("text", "decontamination", "spans", "exact-substring"),
)
def contamination_spans_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination surgery: exact >= 50-char spans in corpus documents
    (doc_id % 17 != 0) copied verbatim from the held-out benchmark slice
    (doc_id % 17 == 0) — the region-level complement of the
    whole-document decontamination family, feeding remove_spans so the
    document survives with the benchmark text cut out. Cross-table twin
    of exact_repeated_spans (shared-fingerprint candidates, shared-hash
    grouping, shared-TEXT confirm); the oracle brute-forces all corpus
    50-grams against the benchmark gram set."""
    from mr_dice_spark.operators.winnowing import exact_contamination_spans

    docs = Catalog(spark, sf_dir).documents
    corpus = docs.where(F.col("doc_id") % 17 != 0)
    bench = docs.where(F.col("doc_id") % 17 == 0)
    out = exact_contamination_spans(corpus, bench, "doc_id", "text", min_len=50)
    return out.select(
        "doc_id",
        F.col("span_start").cast("int").alias("span_start"),
        F.col("span_end").cast("int").alias("span_end"),
        F.col("span_len").cast("int").alias("span_len"),
    ).orderBy("doc_id", "span_start")
