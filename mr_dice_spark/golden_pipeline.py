"""Golden corpus part 2: events/documents/embeddings pipeline operators —
windows, sessionization, as-of join, JSON access, predicate-DSL queries,
dedup, similarity join, text analysis, rollup (FIXTURES.md §B3 bottom rows).

Timestamp rule: events.ts is TIMESTAMP(NANOS) in parquet; Spark reads µs
(Catalog truncates), so every oracle wraps it as CAST(ts AS TIMESTAMP)
(DuckDB truncates identically — verified) and only epoch-ms integers are
ever output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mr_dice_spark.catalog import Catalog
from mr_dice_spark.filters import compile_filter
from mr_dice_spark.functions.text import punct_ratio, stopword_ratio, tokens
from mr_dice_spark.golden import _r, golden
from mr_dice_spark.operators.asof import asof_join
from mr_dice_spark.operators.dedup import (
    dedup_exact,
    minhash_lsh_dedup,
    ngram_jaccard_join,
    simhash_dedup,
)
from mr_dice_spark.operators.quota import fair_quota_topk
from mr_dice_spark.operators.sessionize import session_stats
from mr_dice_spark.operators.similarity import cosine, cosine_topk_lsh, embedding_near_dup


def _utc(spark: SparkSession) -> None:
    """Timestamp goldens require UTC semantics regardless of who built the
    session (the driver's session may not be UTC)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")


# ---------------------------------------------------------------------------
# streaming-equivalent windows (batch form of the SURVEY.md §2.10 extension)
# ---------------------------------------------------------------------------

WINDOW_ORACLE = """
SELECT epoch_ms(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS window_start_ms,
       event_type,
       COUNT(*) AS n_events,
       ROUND(1e-9 + AVG(value), 4) AS avg_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


@golden("events_hourly_window", WINDOW_ORACLE, tags=("window", "streaming", "events"), bench=True)
def events_hourly_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    ev = Catalog(spark, sf_dir).events
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), _r(F.avg("value"), 4).alias("avg_value"))
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "event_type",
            "n_events",
            "avg_value",
        )
        .orderBy("window_start_ms", "event_type")
    )


SESSION_ORACLE = """
WITH t AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) >= 1800 THEN 1 ELSE 0 END AS brk
  FROM t
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
         CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM marked
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       epoch_ms(MIN(ts)) AS start_ms, epoch_ms(MAX(ts)) AS end_ms
FROM s GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


@golden("events_sessionize", SESSION_ORACLE, tags=("window", "sessionize", "events"), bench=True)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    ev = Catalog(spark, sf_dir).events
    return session_stats(ev, "user_id", "ts", 1800, tiebreak_col="event_id").orderBy(
        "user_id", "session_id"
    )


ASOF_ORACLE = """
WITH v AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(event_id) AS last_view_id
  FROM events WHERE event_type = 'view' GROUP BY 1, 2
),
p AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events
  WHERE event_type = 'purchase'
)
SELECT p.event_id AS purchase_id, p.user_id AS user_id,
       epoch_ms(p.ts) AS purchase_ms, v.last_view_id AS last_view_id
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
ORDER BY purchase_id
"""


@golden("events_asof_join", ASOF_ORACLE, tags=("join", "asof", "events"), bench=True)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    ev = Catalog(spark, sf_dir).events
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("last_view_id"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    joined = asof_join(
        purchases, views, on=["user_id"], left_ts="ts", right_ts="ts",
        value_cols=["last_view_id"], suffix="",
    )
    return joined.select(
        "purchase_id",
        "user_id",
        F.unix_millis("ts").alias("purchase_ms"),
        "last_view_id",
    ).orderBy("purchase_id")


JSON_ORACLE = """
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
       event_type,
       COUNT(*) AS n,
       ROUND(1e-9 + AVG(value), 4) AS avg_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


@golden("events_json_props", JSON_ORACLE, tags=("json", "F-json", "events"))
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    return (
        ev.withColumn(
            "k_bucket", F.get_json_object("props", "$.k").cast("long") % 10
        )
        .groupBy("k_bucket", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), _r(F.avg("value"), 4).alias("avg_value"))
        .orderBy("k_bucket", "event_type")
    )


# ---------------------------------------------------------------------------
# predicate DSL over array columns (P1-P8) — p_name word set as `elements`
# ---------------------------------------------------------------------------

HAS_ORACLE = """
SELECT p_partkey AS partkey, p_name AS name, p_size AS size
FROM part
WHERE list_has_all(string_split(p_name, ' '), ['small', 'ring'])
   OR list_has_all(['red', 'widget'], string_split(p_name, ' '))
   OR (NOT list_has_any(string_split(p_name, ' '), ['red', 'blue', 'hot', 'small'])
       AND p_size > 40)
ORDER BY partkey
"""


@golden("optimade_has_predicates", HAS_ORACLE, tags=("filter", "P4", "P5", "P6", "P7"))
def optimade_has_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = Catalog(spark, sf_dir).part.withColumn("name_tokens", F.split("p_name", " "))
    cond = compile_filter(
        '(name_tokens HAS ALL "small","ring")'
        ' OR (name_tokens HAS ONLY "red","widget")'
        ' OR (NOT (name_tokens HAS ANY "red","blue","hot","small") AND p_size > 40)'
    )
    return (
        p.where(cond)
        .select(
            F.col("p_partkey").alias("partkey"),
            F.col("p_name").alias("name"),
            F.col("p_size").alias("size"),
        )
        .orderBy("partkey")
    )


FILTER_ORACLE = """
SELECT p_partkey AS partkey, p_type AS type, p_size AS size, p_retailprice AS price
FROM part
WHERE (p_type = 'PROMO' OR p_type = 'ECONOMY') AND p_size >= 10 AND p_size <= 30
  AND p_name LIKE '%gear%'
ORDER BY partkey
"""


@golden("optimade_filter_compile", FILTER_ORACLE, tags=("filter", "P1", "P2", "P3", "P7"))
def optimade_filter_compile(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = Catalog(spark, sf_dir).part
    cond = compile_filter(
        '(p_type="PROMO" OR p_type="ECONOMY") AND p_size>=10 AND p_size<=30'
        ' AND p_name CONTAINS "gear"'
    )
    return (
        p.where(cond)
        .select(
            F.col("p_partkey").alias("partkey"),
            F.col("p_type").alias("type"),
            F.col("p_size").alias("size"),
            F.col("p_retailprice").alias("price"),
        )
        .orderBy("partkey")
    )


# ---------------------------------------------------------------------------
# fair-quota top-k (O5). Oracle note: with 5 event types each holding far
# more than n/5 rows, the water-fill reduces to an exact equal split of 40
# -> 8 per type, which IS SQL-expressible; the general capacity-bound
# behavior is hypothesis-tested in tests/test_quota.py.
# ---------------------------------------------------------------------------

QUOTA_ORACLE = """
WITH ranked AS (
  SELECT event_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
  FROM events
)
SELECT event_id, event_type FROM ranked WHERE rn <= 8
ORDER BY event_type, event_id
"""


@golden("fair_quota_topk_events", QUOTA_ORACLE, tags=("topk", "O5", "R7"))
def fair_quota_topk_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    ev = Catalog(spark, sf_dir).events
    return (
        fair_quota_topk(ev, "event_type", None, 40, order_by=[F.asc("ts"), F.asc("event_id")])
        .select("event_id", "event_type")
        .orderBy("event_type", "event_id")
    )


# ---------------------------------------------------------------------------
# dedup + similarity + text analysis over documents/embeddings
# ---------------------------------------------------------------------------

DEDUP_EXACT_ORACLE = """
SELECT doc_id, lang, source FROM (
  SELECT doc_id, lang, source,
         ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn = 1
ORDER BY doc_id
"""


@golden("dedup_exact_documents", DEDUP_EXACT_ORACLE, tags=("dedup", "D1", "D3"))
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).documents
    return dedup_exact(docs, ["text"], "doc_id").select("doc_id", "lang", "source").orderBy(
        "doc_id"
    )


JACCARD_ORACLE = """
WITH words AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
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
)
SELECT id_a, id_b,
       ROUND(1e-9 + i * 1.0 / (ca.n + cb.n - i), 4) AS jaccard
FROM inter
JOIN cnt ca ON inter.id_a = ca.doc_id
JOIN cnt cb ON inter.id_b = cb.doc_id
WHERE i * 1.0 / (ca.n + cb.n - i) >= 0.5
ORDER BY id_a, id_b
"""


@golden("jaccard_similarity_join", JACCARD_ORACLE, tags=("dedup", "D4", "similarity"), bench=True)
def jaccard_similarity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).documents
    pairs = ngram_jaccard_join(docs, "doc_id", "text", threshold=0.5, shingle_n=3)
    # no trailing orderBy: the range sampler would re-execute the class
    # expansion joins (measured 2.71s -> 2.28s at sf0.1; PERFORMANCE.md
    # finding 9); the compare harness is order-insensitive
    return pairs.select("id_a", "id_b", _r(F.col("jaccard"), 4).alias("jaccard"))


COSINE_ORACLE = """
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       ROUND(1e-9 + list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                           (SELECT qv FROM q)), 6) AS cosine
FROM embeddings
ORDER BY cosine DESC, vec_id
LIMIT 10
"""


@golden("cosine_topk_bruteforce", COSINE_ORACLE, tags=("similarity", "ann"), bench=True)
def cosine_topk_bruteforce_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = Catalog(spark, sf_dir).embeddings
    qrow = emb.where(F.col("vec_id") == 0).select("embedding").first()
    q = F.array(*[F.lit(float(x)) for x in qrow[0]])
    return (
        emb.select(
            "vec_id",
            _r(cosine(F.col("embedding").cast("array<double>"), q), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(10)
    )


SINGLE_LINKAGE_ORACLE = """
WITH RECURSIVE p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE ROUND(1e-9 + list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])), 6)
        >= 0.43
),
sym AS (SELECT id_a AS u, id_b AS v FROM p UNION SELECT id_b, id_a FROM p),
reach(u, v) AS (
  SELECT u, v FROM sym
  UNION
  SELECT r.u, s.v FROM reach r JOIN sym s ON s.u = r.v
),
comp AS (
  SELECT e.vec_id, e.label,
         LEAST(e.vec_id, COALESCE(MIN(r.v), e.vec_id)) AS cluster
  FROM embeddings e LEFT JOIN reach r ON r.u = e.vec_id
  GROUP BY e.vec_id, e.label
)
SELECT vec_id, label, cluster,
       CAST(COUNT(*) OVER (PARTITION BY cluster) AS BIGINT) AS cluster_size
FROM comp
ORDER BY vec_id
"""


@golden(
    "embedding_single_linkage",
    SINGLE_LINKAGE_ORACLE,
    tags=("clustering", "similarity", "components", "agglomerative"),
)
def embedding_single_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold single-linkage (flat agglomerative) clustering: the
    epsilon-graph at cosine >= 0.43 over the embeddings table, clustered
    as connected components — the dendrogram cut at that linkage
    distance without any sequential merge loop. At sf0.01 the graph has
    24 doubletons and 3 size-3 components (so transitivity is actually
    exercised) among 443 singletons. The iterative hash-min fixpoint is
    hash-checked against DuckDB's WITH RECURSIVE transitive closure, the
    same verification contract as dedup_connected_clusters — here over
    float-thresholded edges whose nudge-rounded cosine compare lands
    identically in both engines (the kmeans quantized-state idiom)."""
    from mr_dice_spark.operators.clustering import (
        cosine_pairs_exact,
        single_linkage_clusters,
    )

    emb = Catalog(spark, sf_dir).embeddings
    pairs = cosine_pairs_exact(emb, "vec_id", "embedding", threshold=0.43)
    return (
        single_linkage_clusters(emb, pairs, "vec_id")
        .select("vec_id", "label", "cluster", "cluster_size")
        .orderBy("vec_id")
    )


IVF_FIXED_ORACLE = """
WITH c AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid,
         CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings ORDER BY vec_id LIMIT 8
),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 7),
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
  SELECT cid FROM c CROSS JOIN q
  ORDER BY list_cosine_similarity(c.cv, q.qv) DESC, cid LIMIT 2
)
SELECT a.vec_id,
       ROUND(1e-9 + list_cosine_similarity(a.emb, (SELECT qv FROM q)), 6)
         AS cosine
FROM assign a
WHERE a.cid IN (SELECT cid FROM probes)
ORDER BY cosine DESC, vec_id
LIMIT 10
"""


@golden("cosine_topk_ivf_fixed_oracle", IVF_FIXED_ORACLE, tags=("similarity", "ann", "ivf"))
def cosine_topk_ivf_fixed_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe top-k with the deterministic sampled-init centroids
    (train_iters=0: first 8 vectors by id) — unlike the k-means-trained
    variant, every stage is SQL-restatable, so the WHOLE IVF pipeline
    (centroid pick -> argmax assignment -> top-2 probe -> exact rerank)
    gets a hash-checked oracle instead of a rows-only check."""
    from mr_dice_spark.operators.similarity import cosine_topk_ivf

    emb = Catalog(spark, sf_dir).embeddings
    qv = [float(x) for x in emb.where(F.col("vec_id") == 7).first()["embedding"]]
    # round_scores: rank on the rounded grid like the oracle, so a raw-rank
    # k-boundary tie can't admit a different member per engine
    out = cosine_topk_ivf(
        emb, "vec_id", "embedding", qv, k=10, n_centroids=8, n_probe=2,
        train_iters=0, round_scores=6,
    )
    return out.orderBy(F.desc("cosine"), "vec_id")


SEMANTIC_DEDUP_ORACLE = """
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
off AS (SELECT MAX(vec_id) + 1 AS o FROM base),
uni AS (
  SELECT vec_id, v FROM base
  UNION ALL
  SELECT vec_id + (SELECT o FROM off), list_transform(v, x -> x * 0.9)
  FROM base WHERE vec_id % 5 = 0
),
c AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
  FROM uni ORDER BY vec_id LIMIT 16
),
assign AS (
  SELECT vec_id, v, cid FROM (
    SELECT u.vec_id, u.v, c.cid,
           ROW_NUMBER() OVER (PARTITION BY u.vec_id
             ORDER BY list_cosine_similarity(u.v, c.cv) DESC, c.cid) AS rn
    FROM uni u CROSS JOIN c
  ) WHERE rn = 1
),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM assign a JOIN assign b ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE ROUND(1e-9 + list_cosine_similarity(a.v, b.v), 6) >= 0.9
)
SELECT a.vec_id, CAST(a.cid AS INT) AS cluster,
       (a.vec_id NOT IN (SELECT vec_id FROM dropped)) AS kept
FROM assign a
ORDER BY vec_id
"""


@golden("semantic_dedup_planted", SEMANTIC_DEDUP_ORACLE, tags=("similarity", "dedup", "semdedup"))
def semantic_dedup_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup end-to-end with a hash-checked
    oracle: the fixture has no natural embedding near-dups (max pairwise
    cosine 0.513), so every 5th vector gets a planted 0.9-scaled copy —
    cosine exactly 1.0 and, because argmax assignment is scale-invariant,
    guaranteed to land in the original's cluster. At threshold 0.9 the
    operator must drop exactly the planted copies (min-id-wins) and keep
    everything else; the oracle restates centroid pick, argmax
    assignment, within-cluster pair compare, and the first-wins drop from
    scratch. Doubles end-to-end on both engines so no float-cast
    divergence can shift an assignment."""
    from mr_dice_spark.operators.similarity import semantic_dedup

    emb = Catalog(spark, sf_dir).embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    # copy-id offset = max(vec_id)+1, NOT a constant: a hardcoded offset
    # would collide with real ids on a larger fixture and break the
    # one-row-per-input contract (review finding, round 3)
    offset = emb.agg(F.max("vec_id")).first()[0] + 1
    copies = emb.where(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + F.lit(offset)).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(0.9)).alias("embedding"),
    )
    uni = emb.unionByName(copies)
    out = semantic_dedup(
        uni, "vec_id", "embedding", threshold=0.9, n_centroids=16, round_scores=6
    )
    return out.select(
        "vec_id", F.col("cluster").cast("int").alias("cluster"), "kept"
    ).orderBy("vec_id")


TEXT_ORACLE = """
SELECT doc_id, lang,
       CAST(LENGTH(text) AS BIGINT) AS n_chars_calc,
       CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
       ROUND(1e-9 + len(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) * 1.0
             / LENGTH(text), 4) AS punct_ratio,
       ROUND(1e-9 + len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                 w -> list_contains(['the','a','an','and','or','of','to','in','is',
                                     'it','that','for','on','with','as','was','at',
                                     'by','this','be'], w))) * 1.0
             / len(string_split_regex(trim(text), '\\s+')), 4) AS stopword_ratio
FROM documents
ORDER BY doc_id
"""


@golden("text_analysis_stats", TEXT_ORACLE, tags=("text", "quality"), bench=True)
def text_analysis_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).documents
    t = F.col("text")
    return docs.select(
        "doc_id",
        "lang",
        F.length(t).cast("long").alias("n_chars_calc"),
        F.size(tokens(t)).cast("long").alias("n_tokens"),
        _r(punct_ratio(t), 4).alias("punct_ratio"),
        _r(stopword_ratio(t), 4).alias("stopword_ratio"),
    ).orderBy("doc_id")


ROLLUP_ORACLE = """
SELECT COALESCE(l_returnflag, 'ALL') AS flag,
       COALESCE(l_linestatus, 'ALL') AS status,
       COUNT(*) AS n,
       ROUND(1e-9 + SUM(l_quantity), 4) AS sum_qty
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
ORDER BY flag, status
"""


@golden("rollup_flag_status", ROLLUP_ORACLE, tags=("agg", "rollup"))
def rollup_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = Catalog(spark, sf_dir).lineitem
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), _r(F.sum("l_quantity"), 4).alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("flag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("status"),
            "n",
            "sum_qty",
        )
        .orderBy("flag", "status")
    )


# ---------------------------------------------------------------------------
# rows-only entries (no SQL-expressible oracle; driver records weaker check)
# ---------------------------------------------------------------------------

@golden("minhash_lsh_dedup_survivors", None, tags=("dedup", "minhash", "lsh"), bench=True)
def minhash_lsh_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold 0.8 with r=8 rows/band (LSH threshold ~(1/b)^(1/r)=0.77).

    This corpus shares one small vocabulary, so typical pairwise jaccard is
    ~0.3; banding tuned for t=0.5 (r=4) admits a large fraction of ALL
    pairs as candidates — the classic LSH failure mode on a dense
    similarity distribution. r=8 keeps the candidate set near-linear.
    """
    docs = Catalog(spark, sf_dir).documents
    return (
        minhash_lsh_dedup(docs, "doc_id", "text", threshold=0.8, num_hashes=64, bands=8)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


@golden("embedding_near_dup_pairs", None, tags=("dedup", "similarity", "lsh"))
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = Catalog(spark, sf_dir).embeddings
    # threshold calibrated to the fixture: the embeddings table has no
    # planted near-identical vectors (max pairwise cosine ~0.51 at sf0.01),
    # so 0.4 keeps the check non-vacuous — a handful of true pairs must
    # survive both the banding filter and exact verification
    pairs = embedding_near_dup(emb, "vec_id", "embedding", threshold=0.4)
    return pairs.select("id_a", "id_b", _r(F.col("cosine"), 4).alias("cosine")).orderBy(
        "id_a", "id_b"
    )


@golden("cosine_topk_lsh_approx", None, tags=("similarity", "ann", "lsh"))
def cosine_topk_lsh_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = Catalog(spark, sf_dir).embeddings
    qrow = emb.where(F.col("vec_id") == 0).select("embedding").first()
    qvec = [float(x) for x in qrow[0]]
    out = cosine_topk_lsh(emb, "vec_id", "embedding", qvec, k=10)
    return out.select("vec_id", _r(F.col("cosine"), 6).alias("cosine")).orderBy(
        F.desc("cosine"), "vec_id"
    )


# ---------------------------------------------------------------------------
# language identification (marker-word profile heuristic)
# ---------------------------------------------------------------------------

def _lang_score_sql(lang: str) -> str:
    from mr_dice_spark.functions.text import LANG_PROFILES

    if lang == "zh":
        # mirror lang_score's zh branch: marker-CHARACTER occurrence count
        terms = " + ".join(
            f"(len(text) - len(replace(text, '{m}', '')))"
            for m in LANG_PROFILES["zh"]
        )
        return f"CAST({terms} AS INTEGER)"
    words = ", ".join(f"'{w}'" for w in LANG_PROFILES[lang])
    return (
        "len(list_filter(string_split(trim(lower(text)), ' '), "
        f"t -> list_contains([{words}], t)))"
    )


def _langid_oracle() -> str:
    from mr_dice_spark.functions.text import LANG_PROFILES

    langs = sorted(LANG_PROFILES)
    scores = ",\n         ".join(f"{_lang_score_sql(lg)} AS s_{lg}" for lg in langs)
    mx = f"greatest({', '.join('s_' + lg for lg in langs)})"
    whens = "\n              ".join(f"WHEN s_{lg} = mx THEN '{lg}'" for lg in langs)
    return f"""
WITH scored AS (
  SELECT doc_id, lang,
         {scores}
  FROM documents
),
m AS (SELECT *, {mx} AS mx FROM scored)
SELECT lang,
       CASE WHEN mx = 0 THEN 'und'
              {whens}
       END AS predicted,
       COUNT(*) AS n
FROM m
GROUP BY 1, 2
ORDER BY 1, 2
"""


@golden("text_language_id_confusion", _langid_oracle(), tags=("text", "langid"))
def text_language_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID over documents, aggregated as a
    (labeled lang x predicted lang) confusion matrix. On this synthetic
    shared-vocabulary corpus the prediction is mostly 'en'/'und' — the
    operator under test is the classifier plumbing, not model quality."""
    from mr_dice_spark.functions.text import detect_language

    docs = Catalog(spark, sf_dir).documents
    return (
        docs.select("lang", detect_language(F.col("text")).alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "predicted")
    )


@golden("cosine_topk_ivf_approx", None, tags=("similarity", "ann", "ivf"))
def cosine_topk_ivf_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-probed approximate nearest neighbors (scale path: with
    cluster-partitioned storage the probe filter is partition pruning)."""
    from mr_dice_spark.operators.similarity import cosine_topk_ivf

    emb = Catalog(spark, sf_dir).embeddings
    qrow = emb.where(F.col("vec_id") == 0).select("embedding").first()
    qvec = [float(x) for x in qrow[0]]
    out = cosine_topk_ivf(emb, "vec_id", "embedding", qvec, k=10, n_centroids=16, n_probe=4)
    return out.select("vec_id", _r(F.col("cosine"), 6).alias("cosine")).orderBy(
        F.desc("cosine"), "vec_id"
    )


INTERVAL_ORACLE = """
WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
err AS (SELECT event_id AS err_id, ts - INTERVAL 10 MINUTE AS w_start,
               ts + INTERVAL 10 MINUTE AS w_end
        FROM e WHERE event_type = 'error'),
pur AS (SELECT event_id, ts FROM e WHERE event_type = 'purchase')
SELECT err_id, COUNT(event_id) AS n_purchases
FROM err LEFT JOIN pur ON pur.ts >= err.w_start AND pur.ts <= err.w_end
GROUP BY err_id
ORDER BY err_id
"""


@golden("interval_join_error_windows", INTERVAL_ORACLE, tags=("join", "range", "interval"), bench=True)
def interval_join_error_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join via bin bucketing: purchases inside ±10-minute windows
    around each error event (operators.interval.interval_join). The oracle
    states the naive BETWEEN join; the operator's bucketed plan produces
    identical rows as an equi-join + residual — no nested-loop join."""
    from mr_dice_spark.operators.interval import interval_join

    _utc(spark)
    ev = Catalog(spark, sf_dir).events
    err = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        (F.col("ts") - F.expr("INTERVAL 10 MINUTES")).alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("w_end"),
    )
    pur = ev.where(F.col("event_type") == "purchase").select("event_id", "ts")
    joined = interval_join(
        pur, err, point_ts="ts", start_ts="w_start", end_ts="w_end",
        bucket_seconds=1200, how="inner",
    )
    return (
        err.select("err_id")
        .join(joined.groupBy("err_id").agg(F.count(F.lit(1)).alias("n")), "err_id", "left")
        .select("err_id", F.coalesce("n", F.lit(0)).alias("n_purchases"))
        .orderBy("err_id")
    )


FEDERATION_ORACLE = """
WITH prov AS (
  SELECT s_suppkey, s_name, s_acctbal, 'alpha' AS provider, 0 AS provider_rank
  FROM supplier WHERE s_suppkey % 2 = 0
  UNION ALL
  SELECT s_suppkey, s_name, s_acctbal, 'beta', 1
  FROM supplier WHERE s_suppkey % 3 = 0
  UNION ALL
  SELECT s_suppkey, s_name, s_acctbal, 'gamma', 2
  FROM supplier WHERE s_suppkey % 5 = 0
),
filtered AS (SELECT * FROM prov WHERE s_acctbal >= 0),
deduped AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY s_suppkey
                                 ORDER BY provider_rank) AS rn
    FROM filtered
  ) WHERE rn = 1
),
-- per-provider capacities after dedup are >= 7 (gamma keeps exactly the 7
-- multiples of 5 coprime to 2 and 3), so the n=21 equal split lands within
-- every capacity and the water-fill degenerates to the plain equal split
-- the SQL can state: top-7 per provider by (acctbal DESC, suppkey)
quota AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY provider
                                 ORDER BY s_acctbal DESC, s_suppkey) AS qr
    FROM deduped
  ) WHERE qr <= 7
)
SELECT provider, s_suppkey, s_name, ROUND(1e-9 + s_acctbal, 2) AS acctbal
FROM quota
ORDER BY provider, s_suppkey
"""


@golden("federation_dedup_quota", FEDERATION_ORACLE, tags=("federation", "S1", "D1", "O5", "lifecycle"))
def federation_dedup_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end §3.1 lifecycle on one engine: multi-provider union (S1,
    simulated as overlapping slices of supplier) → predicate (P-layer) →
    deterministic first-wins dedup by id across providers (D1, provider_rank
    priority) → fair-quota top-k (O5; capacities here exceed the equal
    split, which the oracle states directly) → final ordering."""
    from mr_dice_spark.operators.dedup import dedup_first_wins
    from mr_dice_spark.operators.quota import fair_quota_topk

    sup = Catalog(spark, sf_dir).supplier.select("s_suppkey", "s_name", "s_acctbal")
    provs = []
    for rank, (name, mod) in enumerate((("alpha", 2), ("beta", 3), ("gamma", 5))):
        provs.append(
            sup.where(F.col("s_suppkey") % mod == 0)
            .withColumn("provider", F.lit(name))
            .withColumn("provider_rank", F.lit(rank))
        )
    union = provs[0].unionByName(provs[1]).unionByName(provs[2])
    filtered = union.where(F.col("s_acctbal") >= 0)
    deduped = dedup_first_wins(filtered, "s_suppkey", [F.col("provider_rank")])
    capped = fair_quota_topk(
        deduped, "provider", None, 21,
        order_by=[F.desc("s_acctbal"), F.asc("s_suppkey")],
    )
    return capped.select(
        "provider", "s_suppkey", "s_name", _r("s_acctbal", 2).alias("acctbal")
    ).orderBy("provider", "s_suppkey")


LENGTH_KNOWN_ORACLE = """
SELECT p_partkey AS partkey, p_name AS name
FROM part
WHERE len(string_split(p_name, ' ')) = 2
  AND p_retailprice IS NOT NULL
  AND p_name NOT LIKE '%red%'
ORDER BY partkey
"""


@golden("optimade_length_known", LENGTH_KNOWN_ORACLE, tags=("filter", "length", "known"))
def optimade_length_known(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMADE LENGTH and IS KNOWN operators plus NOT-CONTAINS, compiled
    from the filter language (grammar at Optimade_Server/server.py:77-83)."""
    p = Catalog(spark, sf_dir).part.withColumn("name_tokens", F.split("p_name", " "))
    cond = compile_filter(
        'name_tokens LENGTH 2 AND p_retailprice IS KNOWN AND NOT (p_name CONTAINS "red")'
    )
    return (
        p.where(cond)
        .select(F.col("p_partkey").alias("partkey"), F.col("p_name").alias("name"))
        .orderBy("partkey")
    )


TOP_TERMS_ORACLE = """
WITH tok AS (
  SELECT unnest(string_split(trim(lower(text)), ' ')) AS term FROM documents
)
SELECT term, COUNT(*) AS freq
FROM tok
WHERE term <> ''
GROUP BY term
ORDER BY freq DESC, term
LIMIT 50
"""


@golden("text_top_terms", TOP_TERMS_ORACLE, tags=("text", "terms"))
def text_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term-frequency top-50 — explode + hash agg + top-k
    (TakeOrderedAndProject keeps only 50 rows past the agg)."""
    docs = Catalog(spark, sf_dir).documents
    return (
        docs.select(F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), "term")
        .limit(50)
    )


CENTROID_ORACLE = """
WITH comp AS (
  SELECT label,
         generate_subscripts(embedding, 1) AS pos,
         unnest(embedding) AS x
  FROM embeddings
)
SELECT label, CAST(pos AS INT) AS pos,
       ROUND(1e-9 + AVG(x), 6) AS centroid_x,
       COUNT(*) AS n
FROM comp
GROUP BY label, pos
ORDER BY label, pos
"""


@golden("embedding_label_centroids", CENTROID_ORACLE, tags=("similarity", "vector-agg"))
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element-wise centroid per label: posexplode the vectors and hash-agg
    per (label, position) — the distributed form of a vector mean (the
    reduce side carries label x dim cells, never whole vectors)."""
    emb = Catalog(spark, sf_dir).embeddings
    return (
        emb.select("label", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos0", "x"))
        .select("label", (F.col("pos0") + 1).cast("int").alias("pos"), "x")
        .groupBy("label", "pos")
        .agg(_r(F.avg("x"), 6).alias("centroid_x"), F.count(F.lit(1)).alias("n"))
        .orderBy("label", "pos")
    )


SAMPLE_ORACLE = """
SELECT event_id, event_type,
       ROUND(1e-9 + value, 2) AS value
FROM events
WHERE CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT)
      < CAST(0.1 * 4294967296 AS BIGINT)
ORDER BY event_id
"""

SHUFFLE_SHARDS_ORACLE = """
WITH h AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS hv
  FROM documents
)
SELECT doc_id,
       CAST(hv % 16 AS INT) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY hv % 16 ORDER BY hv, doc_id) AS INT)
         AS shard_rank
FROM h
ORDER BY doc_id
"""


@golden("shuffle_shards_training_order", SHUFFLE_SHARDS_ORACLE, tags=("sampling", "shards", "shuffle"))
def shuffle_shards_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pre-training shuffle into 16 shards: shard = portable
    hash mod 16, shard_rank = hash order within the shard. The oracle
    reproduces the EXACT permutation (not just shard counts) — hash
    arithmetic, modulo, and tie-broken window rank all restated. The plan
    is one hash shuffle + per-shard sort; no global sort anywhere."""
    from mr_dice_spark.operators.sampling import shuffle_shards

    docs = Catalog(spark, sf_dir).documents
    out = shuffle_shards(docs, "doc_id", n_shards=16)
    return out.select("doc_id", "shard", "shard_rank").orderBy("doc_id")


@golden("deterministic_sample_events", SAMPLE_ORACLE, tags=("sampling", "pipeline"))
def deterministic_sample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% hash-threshold sample by event_id — reproducible across engines,
    partitionings and reruns (operators.sampling)."""
    from mr_dice_spark.operators.sampling import deterministic_sample

    ev = Catalog(spark, sf_dir).events
    return (
        deterministic_sample(ev, "event_id", 0.1)
        .select("event_id", "event_type", _r("value", 2).alias("value"))
        .orderBy("event_id")
    )


STRATIFIED_ORACLE = """
SELECT event_type, event_id
FROM (
  SELECT event_type, event_id,
         ROW_NUMBER() OVER (
           PARTITION BY event_type
           ORDER BY CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT),
                    event_id
         ) AS rn
  FROM events
) WHERE rn <= 20
ORDER BY event_type, event_id
"""


@golden("stratified_sample_by_type", STRATIFIED_ORACLE, tags=("sampling", "stratified"))
def stratified_sample_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 20 per event_type, hash-ordered — deterministic stratified
    subsample (operators.sampling.stratified_sample_exact)."""
    from mr_dice_spark.operators.sampling import stratified_sample_exact

    ev = Catalog(spark, sf_dir).events
    return (
        stratified_sample_exact(ev, ["event_type"], 20, "event_id")
        .select("event_type", "event_id")
        .orderBy("event_type", "event_id")
    )


# ---------------------------------------------------------------------------
# portable-hash dedup signatures: the md5-derived hash variants let DuckDB
# recompute the EXACT signatures, closing the oracle gap on the
# MinHash/SimHash family (the xxhash64 fast path stays rows-only).
# ---------------------------------------------------------------------------

_SHINGLE_CTE = """
words AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_distinct(list_transform(
             range(1, greatest(len(w) - 1, 1)),
             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS shingle
  FROM words WHERE len(w) >= 3
)
"""


def _phash_sql(expr: str, seed: str = "") -> str:
    return (
        f"CAST(('0x' || substring(md5('{seed}' || {expr}), 1, 15)) AS BIGINT)"
    )


def _minhash_sig_oracle(num_hashes: int = 8) -> str:
    mins = ",\n       ".join(
        f"MIN({_phash_sql('shingle', f'{i}|')}) AS h{i}" for i in range(num_hashes)
    )
    return f"""
WITH {_SHINGLE_CTE}
SELECT doc_id,
       {mins}
FROM sh
GROUP BY doc_id
ORDER BY doc_id
"""


@golden("minhash_signatures_portable", _minhash_sig_oracle(8), tags=("dedup", "minhash", "oracle"))
def minhash_signatures_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures with the engine-portable hasher — DuckDB
    recomputes the identical 8 minima per document, oracle-checking the
    shingling + signature aggregation exactly."""
    from mr_dice_spark.operators.dedup import minhash_signatures, shingles_exploded

    docs = Catalog(spark, sf_dir).documents
    ex = shingles_exploded(docs, "doc_id", "text").select("__id", "__s")
    sig = minhash_signatures(ex, num_hashes=8, portable=True)
    return sig.select(
        F.col("__id").alias("doc_id"), *[F.col(f"__h{i}").alias(f"h{i}") for i in range(8)]
    ).orderBy("doc_id")


def _simhash_oracle(n_bits: int = 16) -> str:
    h = _phash_sql("t")
    votes = ",\n       ".join(
        f"SUM(CASE WHEN ({h} >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(n_bits)
    )
    fp = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN (CAST(1 AS BIGINT) << {b}) ELSE 0 END)"
        for b in range(n_bits)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t
  FROM documents
),
votes AS (
  SELECT doc_id,
       {votes}
  FROM toks
  GROUP BY doc_id
)
SELECT doc_id, {fp} AS fingerprint
FROM votes
ORDER BY doc_id
"""


@golden("simhash_fingerprints_portable", _simhash_oracle(16), tags=("dedup", "simhash", "oracle"))
def simhash_fingerprints_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash fingerprints with the portable hasher — DuckDB
    reproduces every bit vote and the assembled fingerprint."""
    from mr_dice_spark.operators.dedup import simhash_fingerprints

    docs = Catalog(spark, sf_dir).documents
    fp = simhash_fingerprints(docs, "doc_id", "text", n_bits=16, portable=True)
    return fp.select(
        F.col("__id").alias("doc_id"), F.col("__fp").alias("fingerprint")
    ).orderBy("doc_id")


def _lsh_linkage_oracle(num_hashes: int = 8, bands: int = 4, thr: float = 0.5) -> str:
    """Full LSH-to-clusters restatement: portable minhash signatures,
    banding join on component tuples (== the ':'-concat key equality,
    components are decimal integers), exact-jaccard verify, then WITH
    RECURSIVE transitive closure. Every CTE referenced more than once is
    pinned MATERIALIZED (the frequent_event_itemsets lesson: inlined,
    DuckDB re-plans multi-referenced DISTINCT subqueries into spilling
    joins)."""
    rpb = num_hashes // bands
    mins = ",\n         ".join(
        f"MIN({_phash_sql('shingle', f'{i}|')}) AS h{i}" for i in range(num_hashes)
    )
    branches = "\n  UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {ks} FROM sig".format(
            b=b,
            ks=", ".join(
                f"h{b * rpb + r} AS k{r}" for r in range(rpb)
            ),
        )
        for b in range(bands)
    )
    key_eq = " AND ".join(f"a.k{r} = b.k{r}" for r in range(rpb))
    return f"""
WITH RECURSIVE words AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id,
         unnest(list_distinct(list_transform(
             range(1, greatest(len(w) - 1, 1)),
             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS shingle
  FROM words WHERE len(w) >= 3
),
sig AS MATERIALIZED (
  SELECT doc_id,
         {mins}
  FROM sh GROUP BY doc_id
),
bk AS MATERIALIZED (
  {branches}
),
cand AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bk a JOIN bk b
    ON a.band = b.band AND {key_eq} AND a.doc_id < b.doc_id
),
ssize AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
p AS MATERIALIZED (
  SELECT c.id_a, c.id_b
  FROM cand c
  JOIN sh x ON x.doc_id = c.id_a
  JOIN sh y ON y.doc_id = c.id_b AND y.shingle = x.shingle
  JOIN ssize sa ON sa.doc_id = c.id_a
  JOIN ssize sb ON sb.doc_id = c.id_b
  GROUP BY c.id_a, c.id_b
  HAVING ROUND(1e-9 + CAST(COUNT(*) AS DOUBLE)
               / (MIN(sa.n) + MIN(sb.n) - COUNT(*)), 6) >= {thr}
),
sym AS (SELECT id_a AS u, id_b AS v FROM p UNION SELECT id_b, id_a FROM p),
reach(u, v) AS (
  SELECT u, v FROM sym
  UNION
  SELECT r.u, s.v FROM reach r JOIN sym s ON s.u = r.v
),
comp AS (
  SELECT d.doc_id, d.lang,
         LEAST(d.doc_id, COALESCE(MIN(r.v), d.doc_id)) AS cluster
  FROM documents d LEFT JOIN reach r ON r.u = d.doc_id
  GROUP BY d.doc_id, d.lang
)
SELECT doc_id, lang, cluster,
       CAST(COUNT(*) OVER (PARTITION BY cluster) AS BIGINT) AS cluster_size
FROM comp
ORDER BY doc_id
"""


@golden(
    "lsh_single_linkage_clusters",
    _lsh_linkage_oracle(8, 4, 0.5),
    tags=("dedup", "minhash", "lsh", "clustering", "components"),
)
def lsh_single_linkage_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-scale dedup-clustering path end-to-end: banded MinHash
    LSH proposes candidate pairs, exact jaccard >= 0.5 verifies them,
    and single-linkage connected components assign every document a
    cluster — the whole chain (shingles -> signatures -> banding join ->
    verify -> iterative hash-min fixpoint) hash-checked against one
    DuckDB restatement ending in WITH RECURSIVE transitive closure.
    Portable hashing makes the candidate set bit-identical across
    engines, so this also oracle-checks LSH *banding* itself (which the
    xxhash64 fast path can only cover rows-only). At sf0.01: 29
    candidates, 25 verified edges, 22 doubletons + 1 triple among 453
    singletons; at sf0.1 a size-4 component appears."""
    from mr_dice_spark.operators.clustering import single_linkage_clusters
    from mr_dice_spark.operators.dedup import minhash_lsh_candidates

    docs = Catalog(spark, sf_dir).documents
    pairs = minhash_lsh_candidates(
        docs, "doc_id", "text", shingle_n=3, num_hashes=8, bands=4, portable=True
    )
    edges = pairs.where(F.round(F.col("jaccard") + F.lit(1e-9), 6) >= 0.5)
    return (
        single_linkage_clusters(docs.select("doc_id", "lang"), edges, "doc_id")
        .select("doc_id", "lang", "cluster", "cluster_size")
        .orderBy("doc_id")
    )


def _simhash_pairs_oracle(n_bits: int = 64, max_hamming: int = 3) -> str:
    h = _phash_sql("t")
    votes = ",\n       ".join(
        f"SUM(CASE WHEN ({h} >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(n_bits)
    )
    fp = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN (CAST(1 AS BIGINT) << {b}) ELSE 0 END)"
        for b in range(n_bits)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t
  FROM documents
),
votes AS (
  SELECT doc_id,
       {votes}
  FROM toks
  GROUP BY doc_id
),
fps AS (SELECT doc_id, {fp} AS fp FROM votes)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.fp, b.fp)) AS hamming
FROM fps a JOIN fps b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.fp, b.fp)) <= {max_hamming}
ORDER BY id_a, id_b
"""


@golden(
    "simhash_near_dup_pairs",
    _simhash_pairs_oracle(64, 3),
    tags=("dedup", "simhash"),
)
def simhash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at hamming <= 3, hash-checked: pigeonhole
    banding (4 chunks of a 64-bit fingerprint) has EXACT recall — any pair
    within the budget agrees on >=1 chunk — so with portable fingerprints
    the pair set is deterministic and DuckDB brute-forces the identical
    pairs from first principles (token votes -> fingerprint -> O(n^2)
    bit_count(xor) filter). Spark's banded equi-join computes the same set
    near-linearly — the scale path the oracle's cartesian join is not."""
    docs = Catalog(spark, sf_dir).documents
    return (
        simhash_dedup(docs, "doc_id", "text", max_hamming=3, portable=True)
        .orderBy("id_a", "id_b")
    )


CONTAINMENT_ORACLE = """
WITH words AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
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
  SELECT a.doc_id AS src_id, b.doc_id AS dst_id, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT src_id, dst_id,
       ROUND(1e-9 + i / CAST(cs.n AS DOUBLE), 6) AS containment
FROM inter JOIN cnt cs ON inter.src_id = cs.doc_id
WHERE i * 1.0 / cs.n >= 0.9
ORDER BY src_id, dst_id
"""


@golden(
    "ngram_containment_subset_dedup",
    CONTAINMENT_ORACLE,
    tags=("dedup", "containment", "similarity"),
)
def ngram_containment_subset_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subset-duplicate detection by DIRECTIONAL containment: src docs
    whose 3-gram shingle set is >= 90% inside another doc — the
    quoted-whole-inside-a-longer-page case symmetric Jaccard misses.
    Runs on the same set-equivalence collapse as the Jaccard join but
    WITHOUT the length filter (a small doc legitimately sits inside a
    huge one); the oracle brute-forces the identical directional ratios
    from the raw inverted index. At sf0.01 the output mixes exact copies
    (1.0 both ways) with genuine partial containments (0.90-0.99)."""
    from mr_dice_spark.operators.dedup import ngram_containment_join

    docs = Catalog(spark, sf_dir).documents
    out = ngram_containment_join(docs, "doc_id", "text", threshold=0.9)
    return out.select(
        F.col("src_id"), F.col("dst_id"), _r("containment", 6).alias("containment")
    ).orderBy("src_id", "dst_id")


CONNECTED_CLUSTERS_ORACLE = """
WITH RECURSIVE words AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
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
-- transitive closure: every vertex reachable from u (UNION dedups, so the
-- recursion terminates on the finite pair graph)
reach(u, v) AS (
  SELECT u, v FROM sym
  UNION
  SELECT r.u, s.v FROM reach r JOIN sym s ON s.u = r.v
),
-- a doc loses iff a SMALLER doc_id is in its component
losers AS (SELECT DISTINCT u AS doc_id FROM reach WHERE v < u)
SELECT d.doc_id, d.lang, d.source FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM losers)
ORDER BY d.doc_id
"""


@golden(
    "dedup_connected_clusters",
    CONNECTED_CLUSTERS_ORACLE,
    tags=("dedup", "components", "iterative"),
)
def dedup_connected_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-aware dedup: exact-Jaccard pairs (>= 0.8) → connected
    components (iterative hash-min label propagation) → one representative
    (min doc_id) per equivalence class. The pair graph is the deterministic
    exact inverted-index join (the LSH-fed variant of the same clustering is
    exercised rows-only in minhash_lsh_dedup_survivors, whose banding recall
    is probabilistic), so the iterative fixpoint itself is hash-checked
    against DuckDB's WITH RECURSIVE transitive closure — the oracle computes
    reachability and keeps docs with no smaller doc_id in their component."""
    from mr_dice_spark.operators.components import dedup_connected
    from mr_dice_spark.operators.dedup import ngram_jaccard_join

    docs = Catalog(spark, sf_dir).documents
    pairs = ngram_jaccard_join(docs, "doc_id", "text", threshold=0.8)
    return (
        dedup_connected(docs, pairs, "doc_id")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


TWO_LEVEL_QUOTA_ORACLE = """
WITH cells AS (
  SELECT event_id, event_type, CAST(user_id % 3 AS BIGINT) AS shard,
         CAST(ts AS TIMESTAMP) AS ts
  FROM events
),
-- every (type, shard) cell holds far more than the 2-per-cell equal split
-- of n=30 over 5 types x 3 shards, so the two-level water-fill reduces to
-- the plain nested equal split: 6 per type, 2 per shard
ranked AS (
  SELECT event_id, event_type, shard,
         ROW_NUMBER() OVER (PARTITION BY event_type, shard
                            ORDER BY ts, event_id) AS rn
  FROM cells
)
SELECT event_type, shard, event_id
FROM ranked WHERE rn <= 2
ORDER BY event_type, shard, event_id
"""


@golden("fair_quota_two_level", TWO_LEVEL_QUOTA_ORACLE, tags=("topk", "O5", "two-level"))
def fair_quota_two_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level water-fill (clause -> url, the reference's full shape):
    budget 30 over 5 event types x 3 user shards; capacities exceed the
    nested equal split, which the oracle states directly. Capacity-bound
    reallocation is hypothesis-tested in tests/test_quota.py."""
    _utc(spark)
    ev = Catalog(spark, sf_dir).events.withColumn(
        "shard", F.col("user_id") % 3
    )
    return (
        fair_quota_topk(ev, "event_type", "shard", 30,
                        order_by=[F.asc("ts"), F.asc("event_id")])
        .select("event_type", "shard", "event_id")
        .orderBy("event_type", "shard", "event_id")
    )


PER_GROUP_TOPK_ORACLE = """
SELECT event_type, event_id, rank
FROM (
  SELECT event_type, event_id,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id) AS rank
  FROM events
)
WHERE rank <= 5
ORDER BY event_type, rank
"""


@golden("per_group_topk_events", PER_GROUP_TOPK_ORACLE, tags=("topk", "O4"))
def per_group_topk_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: per-source result cap — top-5 by value per event type with a
    deterministic tiebreak (operators.topk.per_group_topk)."""
    from mr_dice_spark.operators.topk import per_group_topk

    ev = Catalog(spark, sf_dir).events
    return (
        per_group_topk(ev, ["event_type"], [F.desc("value"), F.asc("event_id")],
                       5, rank_col="rank")
        .select("event_type", "event_id", "rank")
        .orderBy("event_type", "rank")
    )


# ---------------------------------------------------------------------------
# CDC merge / upsert (beyond-reference; operators/merge.py)
# ---------------------------------------------------------------------------

CDC_ORACLE = """
SELECT user_id, event_id, event_type,
       ROUND(1e-9 + value, 2) AS value,
       epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms
FROM (
  SELECT user_id, event_id, event_type, value, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY CAST(ts AS TIMESTAMP) DESC,
                                     event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
ORDER BY user_id
"""


@golden("cdc_latest_snapshot", CDC_ORACLE, tags=("merge", "cdc"))
def cdc_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-writer-wins snapshot of a keyed change feed (events as the feed,
    user_id as the key, ts as the version, event_id as the unique tiebreak).
    The inverse of the reference's first-wins dedup (D1,
    optimade_database/Optimade_Server/utils.py:398,426-431); one shuffle,
    WindowGroupLimit-pruned before the exchange."""
    from mr_dice_spark.operators.merge import merge_latest_wins

    _utc(spark)
    ev = Catalog(spark, sf_dir).events
    return (
        merge_latest_wins(ev, ["user_id"], "ts", tiebreakers=["event_id"])
        .select(
            "user_id", "event_id", "event_type",
            _r("value", 2).alias("value"),
            F.unix_millis("ts").alias("ts_ms"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# statistical aggregates + histogram (A-family extensions; oracle-checked)
# ---------------------------------------------------------------------------

STATS_ORACLE = """
SELECT event_type,
       COUNT(*) AS n,
       ROUND(1e-9 + STDDEV_SAMP(value), 4) AS sd_value,
       ROUND(1e-9 + VAR_SAMP(value), 4) AS var_value,
       ROUND(1e-9 + CORR(value, CAST(user_id AS DOUBLE)), 4) AS corr_vu,
       ROUND(1e-9 + COVAR_SAMP(value, CAST(user_id AS DOUBLE)), 4) AS covar_vu
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@golden("stats_value_by_type", STATS_ORACLE, tags=("agg", "stats"))
def stats_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment aggregates (stddev/variance/correlation/covariance) per
    group — single partial+final hash aggregate, shuffle carries only the
    moment sketches (count/sum/sum-of-squares per group), never rows."""
    ev = Catalog(spark, sf_dir).events
    u = F.col("user_id").cast("double")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _r(F.stddev_samp("value"), 4).alias("sd_value"),
            _r(F.var_samp("value"), 4).alias("var_value"),
            _r(F.corr(F.col("value"), u), 4).alias("corr_vu"),
            _r(F.covar_samp(F.col("value"), u), 4).alias("covar_vu"),
        )
        .orderBy("event_type")
    )


HISTOGRAM_ORACLE = """
SELECT bucket,
       COUNT(*) AS n,
       ROUND(1e-9 + MIN(value), 4) AS lo,
       ROUND(1e-9 + MAX(value), 4) AS hi
FROM (
  SELECT value,
         CAST(LEAST(GREATEST(FLOOR((value - 0.0) / 25.0), 0), 19) AS BIGINT)
           AS bucket
  FROM events
  WHERE value IS NOT NULL
)
GROUP BY bucket
ORDER BY bucket
"""


@golden("histogram_value_buckets", HISTOGRAM_ORACLE, tags=("agg", "histogram"))
def histogram_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (20 buckets of 25 over [0, 500), clamped) —
    width_bucket semantics via arithmetic so the bucketing expression stays
    inside whole-stage codegen; one map-side-combined aggregate."""
    ev = Catalog(spark, sf_dir).events.where(F.col("value").isNotNull())
    bucket = F.least(
        F.greatest(F.floor((F.col("value") - F.lit(0.0)) / F.lit(25.0)), F.lit(0)),
        F.lit(19),
    ).cast("bigint")
    return (
        ev.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _r(F.min("value"), 4).alias("lo"),
            _r(F.max("value"), 4).alias("hi"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Q14-style promo revenue ratio + cohort retention (relational widening)
# ---------------------------------------------------------------------------

PROMO_ORACLE = """
SELECT ROUND(1e-9 + 100.0 *
         SUM(CASE WHEN p_type = 'PROMO'
                  THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
         / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
"""


@golden("q14_promo_revenue", PROMO_ORACLE, tags=("join", "agg", "tpch"))
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: fact-dim join + conditional aggregate ratio. The
    part side broadcasts (AQE); the date filter pushes to the lineitem
    scan so only one year of row groups is read."""
    c = Catalog(spark, sf_dir)
    l = c.lineitem.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        l.join(c.part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(_r(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_revenue_pct"))
    )


RETENTION_ORACLE = """
WITH fd AS (
  SELECT user_id, MIN(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS d0
  FROM events GROUP BY user_id
),
act AS (
  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
  FROM events
)
SELECT strftime(d0, '%Y-%m-%d') AS cohort,
       datediff('day', d0, d) AS day_k,
       COUNT(DISTINCT act.user_id) AS n_active
FROM act JOIN fd USING (user_id)
WHERE datediff('day', d0, d) IN (0, 1, 7)
GROUP BY d0, datediff('day', d0, d)
ORDER BY cohort, day_k
"""


@golden("events_cohort_retention", RETENTION_ORACLE, tags=("agg", "retention", "two-level"))
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention (day 0/1/7): first-seen day per user, then distinct
    active users per (cohort, day offset) — the A7 two-level re-aggregation
    shape on behavioral data. Two shuffles (user grouping, cohort
    grouping); the distinct-day projection collapses events per user-day
    map-side before either."""
    _utc(spark)
    ev = Catalog(spark, sf_dir).events
    fd = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d0"))
    act = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    return (
        act.join(fd, "user_id")
        .withColumn("day_k", F.datediff("d", "d0"))
        .where(F.col("day_k").isin(0, 1, 7))
        .groupBy("d0", "day_k")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .select(
            F.date_format("d0", "yyyy-MM-dd").alias("cohort"), "day_k", "n_active"
        )
        .orderBy("cohort", "day_k")
    )


# ---------------------------------------------------------------------------
# scalar-function parity probe (SURVEY.md §2.8 F6/F10/F11/F13 in one query)
# ---------------------------------------------------------------------------

SCALAR_ORACLE = """
SELECT doc_id,
       regexp_replace(lower(substr(text, 1, 20)), '[^a-z0-9]+', '_', 'g') AS tag,
       coalesce(nullif(lang, ''), source) AS ident,
       CASE WHEN length(source || '-' || CAST(doc_id AS VARCHAR)) > 10
            THEN substr(source || '-' || CAST(doc_id AS VARCHAR), 1, 6) || '...' ||
                 substr(source || '-' || CAST(doc_id AS VARCHAR),
                        length(source || '-' || CAST(doc_id AS VARCHAR)) - 2, 3)
            ELSE source || '-' || CAST(doc_id AS VARCHAR) END AS short_id,
       translate(substr(text, 1, 30), '0123456789', '##########') AS masked,
       substr(md5(text), 1, 8) AS content_key
FROM documents
WHERE doc_id < 200
ORDER BY doc_id
"""


@golden("scalar_functions_probe", SCALAR_ORACLE, tags=("scalar", "F6", "F10", "F11", "F13"))
def scalar_functions_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row-parallel pass exercising the reference's scalar helpers as
    builtins (all inside whole-stage codegen, no UDFs): tag sanitization
    (F10, Optimade_Server/utils.py:488-518), identifier coalescing (F13,
    mofdb Mofdb_Server/utils.py:81-92), id shortening (F11,
    Optimade_Server/utils.py:208-226), character translate (F6,
    utils.py:129-155 — digit masking here; same builtin the unicode
    normalizer uses), and a content hash (F5 family)."""
    docs = Catalog(spark, sf_dir).documents.where(F.col("doc_id") < 200)
    longid = F.concat_ws("-", "source", F.col("doc_id").cast("string"))
    return docs.select(
        "doc_id",
        F.regexp_replace(F.lower(F.substring("text", 1, 20)), "[^a-z0-9]+", "_").alias("tag"),
        F.coalesce(F.nullif("lang", F.lit("")), F.col("source")).alias("ident"),
        F.when(
            F.length(longid) > 10,
            F.concat(F.substring(longid, 1, 6), F.lit("..."), F.substring(longid, -3, 3)),
        ).otherwise(longid).alias("short_id"),
        F.translate(F.substring("text", 1, 30), "0123456789", "##########").alias("masked"),
        F.substring(F.md5("text"), 1, 8).alias("content_key"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# CDC apply_changes + incremental dedup, surfaced to the driver contract
# ---------------------------------------------------------------------------

CDC_APPLY_ORACLE = """
SELECT user_id, event_id,
       ROUND(1e-9 + value, 2) AS value,
       epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms
FROM (
  SELECT user_id, event_id, value, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY CAST(ts AS TIMESTAMP) DESC,
                                     event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
ORDER BY user_id
"""


@golden("cdc_apply_changes_snapshot", CDC_APPLY_ORACLE, tags=("merge", "cdc"))
def cdc_apply_changes_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """apply_changes end-to-end: the base snapshot is the per-user latest
    of the first half of January; the change feed is the second half;
    advancing base by feed must equal the latest-per-user over ALL events
    (stated directly by the oracle). Base + feed each shuffle once on the
    key."""
    from mr_dice_spark.operators.merge import apply_changes, merge_latest_wins

    _utc(spark)
    ev = Catalog(spark, sf_dir).events.select("user_id", "event_id", "value", "ts")
    cut = F.lit("2024-01-15 00:00:00").cast("timestamp")
    base = merge_latest_wins(
        ev.where(F.col("ts") < cut), ["user_id"], "ts", tiebreakers=["event_id"]
    )
    feed = ev.where(F.col("ts") >= cut)
    return (
        apply_changes(base, feed, ["user_id"], "ts", tiebreakers=["event_id"])
        .select(
            "user_id", "event_id",
            _r("value", 2).alias("value"),
            F.unix_millis("ts").alias("ts_ms"),
        )
        .orderBy("user_id")
    )


@golden("incremental_dedup_two_batches", None, tags=("dedup", "incremental", "rows-only"))
def incremental_dedup_two_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-batch incremental dedup lifecycle in one query (rows-only check:
    xxhash64 signatures are not oracle-restatable): batch 1 (docs < 100)
    seeds a fresh index; batch 2 = renumbered copies of batch 1 plus docs
    100-199. Copies are suppressed by the index, fresh docs survive their
    own near-dups. Deterministic survivor set."""
    import glob
    import shutil
    import tempfile

    from mr_dice_spark.operators.incremental import dedup_incremental, minhash_index_create

    # bound /tmp accumulation: reap indexes leaked by previous invocations
    # (the current run's index must outlive this function — the returned
    # DataFrame reads it lazily — so it can only be reaped by a LATER run).
    # Age filter: never touch directories under an hour old — a concurrent
    # run's live index (parallel pytest, bench alongside tests) must survive.
    import os
    import time

    cutoff = time.time() - 3600
    for stale in glob.glob(tempfile.gettempdir() + "/mr_dice_golden_idx_*"):
        try:
            if os.path.getmtime(stale) < cutoff:
                shutil.rmtree(stale, ignore_errors=True)
        except OSError:
            pass

    docs = Catalog(spark, sf_dir).documents
    idx = tempfile.mkdtemp(prefix="mr_dice_golden_idx_") + "/idx"
    minhash_index_create(spark, idx, num_hashes=64, bands=16)
    b1 = docs.where(F.col("doc_id") < 100)
    # appends batch-1 state eagerly inside the call (no extra action needed)
    dedup_incremental(b1, "doc_id", "text", idx, threshold=0.9)
    copies = b1.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    b2 = docs.where((F.col("doc_id") >= 100) & (F.col("doc_id") < 200)).select(
        "doc_id", "text"
    ).unionByName(copies)
    surv = dedup_incremental(b2, "doc_id", "text", idx, threshold=0.9,
                             append_survivors=False)
    return surv.select("doc_id").orderBy("doc_id")


# ---------------------------------------------------------------------------
# EXISTS-chain and UNION ALL shapes (relational widening, oracle-checked)
# ---------------------------------------------------------------------------

EXISTS_CHAIN_ORACLE = """
SELECT n.n_name,
       COUNT(*) AS n_customers,
       ROUND(1e-9 + SUM(c.c_acctbal), 2) AS total_acctbal
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000
)
GROUP BY n.n_name
ORDER BY n.n_name
"""


@golden("exists_chain_big_spenders", EXISTS_CHAIN_ORACLE, tags=("join", "semi", "exists"))
def exists_chain_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS as a left-semi join feeding a dim join + aggregate:
    customers with at least one >200k order, counted per nation. The semi
    join never replicates customer rows (no fan-out dedup needed) and the
    nation dim broadcasts."""
    c = Catalog(spark, sf_dir)
    big = c.orders.where(F.col("o_totalprice") > 200000).select("o_custkey")
    return (
        c.customer.join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .join(c.nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _r(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
        .orderBy("n_name")
    )


UNION_ALL_ORACLE = """
SELECT src, event_type, COUNT(*) AS n, ROUND(1e-9 + SUM(value), 2) AS total
FROM (
  SELECT 'hot' AS src, event_type, value FROM events WHERE value >= 400
  UNION ALL
  SELECT 'err' AS src, event_type, value FROM events WHERE event_type = 'error'
)
GROUP BY src, event_type
ORDER BY src, event_type
"""


@golden("union_all_sources_agg", UNION_ALL_ORACLE, tags=("setop", "D5", "union"))
def union_all_sources_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 union-of-sources shape with overlapping slices kept as distinct
    provenance rows (UNION ALL, not dedup) then re-aggregated — the
    federation scan's accounting view. unionByName + one hash aggregate."""
    ev = Catalog(spark, sf_dir).events
    hot = ev.where(F.col("value") >= 400).select(
        F.lit("hot").alias("src"), "event_type", "value"
    )
    err = ev.where(F.col("event_type") == "error").select(
        F.lit("err").alias("src"), "event_type", "value"
    )
    return (
        hot.unionByName(err)
        .groupBy("src", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), _r(F.sum("value"), 2).alias("total"))
        .orderBy("src", "event_type")
    )


CORRELATED_AVG_ORACLE = """
SELECT p_partkey, p_type, ROUND(1e-9 + p_retailprice, 2) AS price
FROM part p
WHERE p_retailprice > ROUND(1e-9 + 1.03 * (
  SELECT AVG(p2.p_retailprice) FROM part p2 WHERE p2.p_type = p.p_type
), 4)
ORDER BY p_partkey
"""


@golden("correlated_above_type_avg", CORRELATED_AVG_ORACLE, tags=("subquery", "correlated", "agg"))
def correlated_above_type_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (price > 1.03x its type's average —
    prices are uniform in [900, 1000], so ~20% of rows qualify; the
    threshold is nudge-ROUNDed on both engines per the corpus determinism
    rule — an unrounded float boundary could flip rows between engines) as
    a window aggregate: Spark evaluates AVG over a type partition in ONE pass
    over part — no per-row re-aggregation, no self-join; the equivalent
    de-correlated plan DuckDB builds from the subquery form."""
    p = Catalog(spark, sf_dir).part
    w = Window.partitionBy("p_type")
    return (
        p.withColumn("__type_avg", F.avg("p_retailprice").over(w))
        .where(F.col("p_retailprice") > _r(1.03 * F.col("__type_avg"), 4))
        .select("p_partkey", "p_type", _r("p_retailprice", 2).alias("price"))
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# F15 formation energy per atom (openlam lam_optimize/utils.py:16-115)
# ---------------------------------------------------------------------------

FORMATION_REF_ENERGIES = {"Si": -1.25, "Al": -0.75, "Fe": -2.0, "O": -2.5}

FORMATION_ORACLE = """
SELECT p_partkey AS struct_id,
       CASE WHEN p_partkey % 4 = 3 THEN NULL
            ELSE ROUND(1e-9 + (p_retailprice
                 - ((p_partkey % 3 + 1) * CASE p_partkey % 4
                        WHEN 0 THEN -1.25 WHEN 1 THEN -0.75 ELSE -2.0 END
                    + (p_partkey % 5 + 1) * -2.5))
                 / ((p_partkey % 3 + 1) + (p_partkey % 5 + 1)), 4)
       END AS fe_per_atom
FROM part
WHERE p_partkey <= 400
ORDER BY struct_id
"""


@golden("formation_energy_openlam", FORMATION_ORACLE, tags=("scalar", "F15", "explode", "broadcast"))
def formation_energy_openlam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15 (openlam_database/openlam/lam_optimize/utils.py:16-115) through
    the distributed operator: formula strings are SYNTHESIZED from part keys
    (element by key%4 — including an unknown 'Zz' exercising the
    missing-reference NULL path — counts by key%3/key%5, and every 7th row
    rendered with unicode subscript digits to exercise P13 normalization),
    then parsed/exploded/broadcast-joined by formation_energy_per_atom. The
    oracle computes the same energies by direct arithmetic on the keys — no
    parsing — so parity proves the whole tokenize -> explode -> ref-join ->
    re-aggregate chain, not just the arithmetic."""
    from mr_dice_spark.functions.formula import formation_energy_per_atom

    p = Catalog(spark, sf_dir).part.where(F.col("p_partkey") <= 400)
    a = F.col("p_partkey") % 3 + 1
    b = F.col("p_partkey") % 5 + 1
    elem = (
        F.when(F.col("p_partkey") % 4 == 0, "Si")
        .when(F.col("p_partkey") % 4 == 1, "Al")
        .when(F.col("p_partkey") % 4 == 2, "Fe")
        .otherwise("Zz")
    )

    def cnt(c):
        return F.when(c == 1, F.lit("")).otherwise(c.cast("string"))

    formula = F.concat(elem, cnt(a), F.lit("O"), cnt(b))
    formula = F.when(
        F.col("p_partkey") % 7 == 0,
        F.translate(formula, "0123456789", "₀₁₂₃₄₅₆₇₈₉"),
    ).otherwise(formula)
    structs = p.select(
        F.col("p_partkey").alias("struct_id"),
        formula.alias("formula"),
        F.col("p_retailprice").alias("energy"),
    )
    out = formation_energy_per_atom(
        structs, "struct_id", "formula", "energy",
        FORMATION_REF_ENERGIES, out_col="fe_raw",
    )
    return out.select(
        "struct_id", _r("fe_raw", 4).alias("fe_per_atom")
    ).orderBy("struct_id")


# ---------------------------------------------------------------------------
# PII redaction probe (beyond-reference C4/Dolma-style corpus cleaning)
# ---------------------------------------------------------------------------

from mr_dice_spark.functions.text import pii_oracle_sql, redact_pii  # noqa: E402

_PII_INJECT_SQL = (
    "substr(text, 1, 40) || ' contact ' || source || CAST(doc_id AS VARCHAR)"
    " || '@example.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR)"
    " || '.7 see https://corpus.example/' || CAST(doc_id AS VARCHAR)"
    " || ' tel +1 555-010' || CAST(doc_id % 10 AS VARCHAR)"
)

PII_ORACLE = f"""
SELECT doc_id, {pii_oracle_sql(_PII_INJECT_SQL)} AS redacted
FROM documents
WHERE doc_id < 200
ORDER BY doc_id
"""


@golden("pii_redaction_probe", PII_ORACLE, tags=("text", "pii", "scalar"))
def pii_redaction_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (emails / IPv4 / URLs / phone runs -> typed
    placeholders), the standard pre-training corpus cleaning step. Synthetic
    PII is injected deterministically from doc keys on BOTH engines, then
    both run the identical portable regex chain — parity proves Java-regex
    and RE2 agree on every replacement. One codegen'd projection; no UDF,
    no shuffle beyond the output sort."""
    docs = Catalog(spark, sf_dir).documents.where(F.col("doc_id") < 200)
    injected = F.concat(
        F.substring("text", 1, 40),
        F.lit(" contact "), F.col("source"), F.col("doc_id").cast("string"),
        F.lit("@example.com from 10.0."), (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 see https://corpus.example/"), F.col("doc_id").cast("string"),
        F.lit(" tel +1 555-010"), (F.col("doc_id") % 10).cast("string"),
    )
    return docs.select(
        "doc_id", redact_pii(injected).alias("redacted")
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction (beyond-reference corpus-curation operator)
# ---------------------------------------------------------------------------

TFIDF_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t
  FROM documents
),
tf AS (
  SELECT doc_id, t, COUNT(*) AS tf
  FROM toks WHERE t <> '' GROUP BY doc_id, t
),
dfreq AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
scored AS (
  SELECT doc_id, t,
         tf * ((n + 1.0) / (df + 1.0)) AS score
  FROM tf JOIN dfreq USING (t) CROSS JOIN n
)
SELECT doc_id, t AS term, ROUND(1e-9 + score, 6) AS score, rank
FROM (
  SELECT doc_id, t, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, t ASC) AS rank
  FROM scored
)
WHERE rank <= 3
ORDER BY doc_id, rank
"""


@golden("tfidf_top_terms_per_doc", TFIDF_ORACLE, tags=("text", "tfidf", "two-pass"))
def tfidf_top_terms_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document with the rational idf
    (N+1)/(df+1) — exact IEEE arithmetic end-to-end, so DuckDB reproduces
    every score bit-identically and the top-k membership (ties broken on
    term) is deterministic. Two corpus-sized shuffles (TF aggregate, per-doc
    window), one vocabulary-sized broadcast — the plan a 100 TB corpus
    needs."""
    from mr_dice_spark.operators.terms import tfidf_top_terms

    docs = Catalog(spark, sf_dir).documents
    out = tfidf_top_terms(docs, "doc_id", "text", k=3, rational_idf=True)
    return out.select(
        "doc_id", "term", _r("score", 6).alias("score"), "rank"
    ).orderBy("doc_id", "rank")


# ---------------------------------------------------------------------------
# benchmark decontamination (beyond-reference corpus-hygiene operator)
# ---------------------------------------------------------------------------

DECONTAM_ORACLE = """
WITH words AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_distinct(list_transform(
             range(1, greatest(len(w) - 1, 1)),
             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS shingle
  FROM words WHERE len(w) >= 3
),
probe AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 17 = 0),
corpus_ids AS (SELECT doc_id FROM documents WHERE doc_id % 17 <> 0),
cnt AS (
  SELECT c.doc_id, COUNT(s.shingle) AS n_grams
  FROM corpus_ids c LEFT JOIN sh s USING (doc_id)
  GROUP BY c.doc_id
),
hits AS (
  SELECT s.doc_id, COUNT(*) AS n_shared
  FROM sh s JOIN probe p USING (shingle)
  WHERE s.doc_id % 17 <> 0
  GROUP BY s.doc_id
)
SELECT c.doc_id,
       c.n_grams,
       COALESCE(h.n_shared, 0) AS n_shared,
       ROUND(1e-9 + CASE WHEN c.n_grams = 0 THEN 0.0
             ELSE COALESCE(h.n_shared, 0) / CAST(c.n_grams AS DOUBLE) END,
             6) AS share,
       COALESCE(h.n_shared, 0) > 0 AS contaminated
FROM cnt c LEFT JOIN hits h USING (doc_id)
ORDER BY c.doc_id
"""


@golden("benchmark_decontamination", DECONTAM_ORACLE, tags=("text", "decontaminate", "semi-join"))
def benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination stats: every 17th document plays the held-out
    benchmark set; the rest is the training corpus. Per corpus doc the
    operator counts distinct 3-gram overlaps with the broadcast probe-gram
    set — the planted near-dup families guarantee true contamination. The
    oracle recomputes shingles, overlap counts and shares from scratch in
    SQL, value-hash-checking the whole chain."""
    from mr_dice_spark.operators.decontaminate import contamination_stats

    docs = Catalog(spark, sf_dir).documents
    probe = docs.where(F.col("doc_id") % 17 == 0)
    corpus = docs.where(F.col("doc_id") % 17 != 0)
    out = contamination_stats(corpus, "doc_id", "text", probe, "text", n=3)
    return out.select(
        "doc_id", "n_grams", "n_shared",
        _r("share", 6).alias("share"), "contaminated",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# document chunking (overlapping token windows; RAG / long-doc pretraining)
# ---------------------------------------------------------------------------

CHUNK_ORACLE = r"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN []
              ELSE string_split_regex(trim(text), '\s+') END AS toks
  FROM documents
)
SELECT doc_id,
       CAST(g.s // 24 AS INT) AS chunk_id,
       CAST(g.s AS INT) AS start_token,
       CAST(LEAST(32, len(toks) - g.s) AS INT) AS n_tokens,
       array_to_string(list_slice(toks, g.s + 1, g.s + 32), ' ') AS chunk_text
FROM t, LATERAL UNNEST(
    CASE WHEN len(toks) = 0 THEN []
         ELSE generate_series(0, greatest(0, len(toks) - 1 - 8), 24) END
) AS g(s)
ORDER BY doc_id, chunk_id
"""


@golden("document_chunking_windows", CHUNK_ORACLE, tags=("text", "chunking", "explode"))
def document_chunking_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 32-token windows with stride 24 (8-token overlap) — the
    step between curation and sequence packing for docs longer than the
    context. Pure codegen'd array arithmetic, zero shuffles; the short
    final chunk is kept (truncating the tail silently loses data)."""
    from mr_dice_spark.operators.chunking import chunk_documents

    docs = Catalog(spark, sf_dir).documents
    out = chunk_documents(docs, "doc_id", "text", chunk_tokens=32, overlap_tokens=8)
    return out.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.col("start_token").cast("int").alias("start_token"),
        F.col("n_tokens").cast("int").alias("n_tokens"),
        "chunk_text",
    ).orderBy("doc_id", "chunk_id")


# ---------------------------------------------------------------------------
# sequence packing (beyond-reference concat-and-chunk batch construction)
# ---------------------------------------------------------------------------

PACKING_ORACLE = """
WITH t AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens
           AS start_offset
  FROM t
)
SELECT doc_id,
       n_tokens,
       CAST(start_offset AS BIGINT) AS start_offset,
       CASE WHEN n_tokens > 0
            THEN CAST(start_offset // 64 AS BIGINT) END AS first_seq,
       CASE WHEN n_tokens > 0
            THEN CAST((start_offset + n_tokens - 1) // 64 AS BIGINT)
       END AS last_seq,
       CASE WHEN n_tokens > 0
            THEN CAST((start_offset + n_tokens - 1) // 64
                      - start_offset // 64 + 1 AS BIGINT)
            ELSE 0 END AS n_seqs
FROM c
ORDER BY doc_id
"""


@golden("sequence_packing_spans", PACKING_ORACLE, tags=("packing", "prefix-sum", "two-pass"))
def sequence_packing_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing over the id-ordered documents
    corpus at seq_len=64: each doc's span of fixed-length training
    sequences. Spark runs the two-pass distributed prefix sum (local
    running sums + broadcast partition offsets — no single-task global
    window); the oracle states the same result as ONE global window, which
    only an oracle-scale engine can afford. Integer arithmetic throughout."""
    from mr_dice_spark.functions.text import token_count
    from mr_dice_spark.operators.packing import pack_sequences

    docs = Catalog(spark, sf_dir).documents
    return pack_sequences(
        docs, "doc_id", token_count(F.col("text")), 64
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# data-mixture sampling (beyond-reference pretraining mixing step)
# ---------------------------------------------------------------------------

MIXTURE_ORACLE = """
SELECT doc_id, lang
FROM (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY CAST(('0x' || substring(md5('mix/' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT),
                    doc_id
         ) AS rn
  FROM documents
)
WHERE rn <= CASE lang WHEN 'en' THEN 40 WHEN 'de' THEN 20 WHEN 'es' THEN 20
                      WHEN 'fr' THEN 10 WHEN 'zh' THEN 10 ELSE 0 END
ORDER BY lang, doc_id
"""


@golden("mixture_sample_by_lang", MIXTURE_ORACLE, tags=("sampling", "mixture", "deterministic"))
def mixture_sample_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100-doc corpus mixed to 40% en / 20% de / 20% es / 10% fr / 10% zh
    by deterministic per-group hash order. The oracle hardcodes the
    uncapped largest-remainder targets, which is the allocation whenever
    every lang holds >= its target (true at the oracle scale and above);
    the operator additionally redistributes on availability caps — covered
    by unit tests, not reachable on this corpus."""
    from mr_dice_spark.operators.sampling import mixture_sample

    docs = Catalog(spark, sf_dir).documents
    out = mixture_sample(
        docs, "lang",
        {"en": 0.4, "de": 0.2, "es": 0.2, "fr": 0.1, "zh": 0.1},
        100, "doc_id", seed="mix/",
    )
    return out.select("doc_id", "lang").orderBy("lang", "doc_id")


TEMPERATURE_MIXTURE_ORACLE = """
WITH c AS (
  SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n FROM documents GROUP BY lang
),
w AS (SELECT lang, POW(n, 0.5) AS wt FROM c),
q AS (SELECT lang, 60 * wt / (SELECT SUM(wt) FROM w) AS quot FROM w),
b AS (SELECT lang, FLOOR(quot) AS base, quot - FLOOR(quot) AS frac FROM q),
r AS (
  SELECT lang, base,
         ROW_NUMBER() OVER (ORDER BY frac DESC, lang) AS rk
  FROM b
),
rem AS (SELECT 60 - CAST(SUM(base) AS BIGINT) AS m FROM b),
quota AS (
  SELECT lang,
         CAST(base AS BIGINT)
           + CASE WHEN rk <= (SELECT m FROM rem) THEN 1 ELSE 0 END AS q
  FROM r
),
ranked AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY CAST(('0x' || substring(md5('temp/' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT),
                    doc_id
         ) AS rn
  FROM documents
)
SELECT doc_id, lang
FROM ranked JOIN quota USING (lang)
WHERE rn <= q
ORDER BY lang, doc_id
"""


@golden(
    "temperature_mixture_sample_lang",
    TEMPERATURE_MIXTURE_ORACLE,
    tags=("sampling", "mixture", "temperature", "deterministic"),
)
def temperature_mixture_sample_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-smoothed mixture (share ∝ count^0.5, total 60): the
    multilingual-pretraining reweighting that lifts low-resource langs
    without going fully uniform. Unlike mixture_sample_by_lang's
    hardcoded targets, the oracle here restates the WHOLE allocation —
    sqrt weights from the data's own counts, largest-remainder
    integerization with frac-then-name ranking, hash-order selection —
    so the data-dependent quota arithmetic is hash-checked end to end.
    No availability cap binds at any test SF (every lang's sqrt share of
    60 is far below its count), which is what keeps the one-round
    largest remainder SQL-restatable; the capped redistribution loop is
    unit-tested."""
    from mr_dice_spark.operators.sampling import temperature_mixture_sample

    docs = Catalog(spark, sf_dir).documents
    out = temperature_mixture_sample(
        docs, "lang", 60, "doc_id", alpha=0.5, seed="temp/"
    )
    return out.select("doc_id", "lang").orderBy("lang", "doc_id")


# ---------------------------------------------------------------------------
# intra-document repetition stats (Gopher-style quality filter signal)
# ---------------------------------------------------------------------------

REPETITION_ORACLE = """
WITH words AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)),
                               i -> w[i] || ' ' || w[i+1])) AS g
  FROM words WHERE len(w) >= 2
),
per_gram AS (
  SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY doc_id, g
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS total_grams,
       COUNT(*) AS distinct_grams,
       ROUND(1e-9 + MAX(c) / CAST(SUM(c) AS DOUBLE), 6) AS top_gram_share,
       -- same association order as the Spark expression
       -- ((1.0 - x) + 1e-9, not (1e-9 + 1.0) - x): the two differ by
       -- up to ~1 ulp, a latent rounding-boundary flip (VERDICT r7 #6)
       ROUND((1.0 - COUNT(*) / CAST(SUM(c) AS DOUBLE)) + 1e-9, 6) AS dup_gram_share
FROM per_gram
GROUP BY doc_id
ORDER BY doc_id
"""


@golden("repetition_stats_per_doc", REPETITION_ORACLE, tags=("text", "quality", "repetition"))
def repetition_stats_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-doc 2-gram repetition signals (total/distinct gram counts,
    top-gram share, duplicate share) — the Gopher repetition family of
    quality filters. Integer counts and integer-ratio doubles only, so the
    DuckDB restatement matches value-for-value."""
    from mr_dice_spark.operators.terms import repetition_stats

    docs = Catalog(spark, sf_dir).documents
    out = repetition_stats(docs, "doc_id", "text", n=2)
    return out.select(
        "doc_id", "total_grams", "distinct_grams",
        _r("top_gram_share", 6).alias("top_gram_share"),
        _r("dup_gram_share", 6).alias("dup_gram_share"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# unigram LM quality score (CCNet/Dolma perplexity-filter shape)
# ---------------------------------------------------------------------------

UNIGRAM_LM_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t
  FROM documents
),
dw AS (
  SELECT doc_id, t, COUNT(*) AS c FROM toks WHERE t <> '' GROUP BY doc_id, t
),
vocab AS (SELECT t, SUM(c) AS cw FROM dw GROUP BY t),
tot AS (SELECT CAST(SUM(cw) AS DOUBLE) AS n FROM vocab)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       ROUND(1e-9 + SUM(c * (ln(n) - ln(CAST(cw AS DOUBLE)))) / SUM(c), 6)
         AS avg_neg_logprob
FROM dw JOIN vocab USING (t) CROSS JOIN tot
GROUP BY doc_id
ORDER BY doc_id
"""


@golden("unigram_lm_quality", UNIGRAM_LM_ORACLE, tags=("text", "quality", "lm"))
def unigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-self-trained unigram LM score per document (mean token
    negative log-probability) — the perplexity-filter shape of CCNet/Dolma
    with the unigram corpus model standing in for KenLM. Both engines
    compute ln on the same integer-valued doubles and the same formula
    (c * (ln N - ln count)), so nudge-rounding at 6 decimals absorbs any
    last-ulp libm divergence."""
    from mr_dice_spark.operators.terms import unigram_lm_score

    docs = Catalog(spark, sf_dir).documents
    out = unigram_lm_score(docs, "doc_id", "text")
    return out.select(
        "doc_id", "n_tokens",
        _r("avg_neg_logprob", 6).alias("avg_neg_logprob"),
    ).orderBy("doc_id")


DIVERSITY_ORACLE = r"""
WITH w AS (
  SELECT list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS w
  FROM documents
),
g1 AS (SELECT unnest(w) AS g FROM w),
g2 AS (
  SELECT unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS g
  FROM w WHERE len(w) >= 2
),
g3 AS (
  SELECT unnest(list_transform(range(1, len(w) - 1),
                               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
  FROM w WHERE len(w) >= 3
),
s AS (
  SELECT 1 AS n, CAST(COUNT(*) AS BIGINT) AS total_grams,
         CAST(COUNT(DISTINCT g) AS BIGINT) AS distinct_grams FROM g1
  UNION ALL
  SELECT 2, CAST(COUNT(*) AS BIGINT), CAST(COUNT(DISTINCT g) AS BIGINT) FROM g2
  UNION ALL
  SELECT 3, CAST(COUNT(*) AS BIGINT), CAST(COUNT(DISTINCT g) AS BIGINT) FROM g3
)
SELECT n, total_grams, distinct_grams,
       CASE WHEN total_grams > 0
            THEN ROUND(1e-9 + distinct_grams / CAST(total_grams AS DOUBLE), 6)
       END AS distinct_ratio
FROM s
ORDER BY n
"""


@golden(
    "corpus_distinct_ngram_diversity",
    DIVERSITY_ORACLE,
    tags=("text", "diversity", "observability"),
)
def corpus_distinct_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-1/-2/-3 corpus diversity ratios (the Li-et-al generation
    metric turned corpus QA signal): templated or mirror-heavy sources
    collapse distinct-2 long before exact dedup fires. One gram-keyed
    count-distinct aggregate per n with map-side partial dedup."""
    from mr_dice_spark.operators.terms import distinct_ngram_diversity

    docs = Catalog(spark, sf_dir).documents
    return distinct_ngram_diversity(docs, "text", max_n=3).orderBy("n")


PMI_ORACLE = r"""
WITH w AS (
  SELECT list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS w
  FROM documents
),
uni AS (
  SELECT t, COUNT(*) AS cu FROM (SELECT unnest(w) AS t FROM w) GROUP BY t
),
nu AS (SELECT CAST(SUM(cu) AS DOUBLE) AS nu FROM uni),
bg AS (
  SELECT unnest(list_transform(range(1, len(w)),
                               i -> struct_pack(a := w[i], b := w[i + 1]))) AS g
  FROM w WHERE len(w) >= 2
),
big AS (
  SELECT g.a AS w1, g.b AS w2, CAST(COUNT(*) AS BIGINT) AS n_pair
  FROM bg GROUP BY 1, 2 HAVING COUNT(*) >= 5
),
nb AS (SELECT CAST(SUM(len(w) - 1) AS DOUBLE) AS nb FROM w WHERE len(w) >= 2)
SELECT w1, w2, n_pair,
       ROUND(1e-9 + LN((n_pair / nb) / ((ua.cu / nu) * (ub.cu / nu))), 6) AS pmi
FROM big
JOIN uni ua ON ua.t = w1
JOIN uni ub ON ub.t = w2
CROSS JOIN nu CROSS JOIN nb
ORDER BY pmi DESC, w1, w2
LIMIT 20
"""


@golden("pmi_collocations_top", PMI_ORACLE, tags=("text", "collocations", "pmi", "topk"))
def pmi_collocations_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 collocations by pointwise mutual information over the
    documents corpus (bigrams seen >= 5 times) — multiword-expression
    mining for tokenizer vocabulary design. Marginals, totals, and the
    log-ratio are evaluated identically in both engines on
    integer-valued doubles (nudge-rounded), and the k-boundary is
    deterministic because ties order on (pmi, w1, w2). Global top-k is
    the TakeOrderedAndProject shape, never a single-partition window."""
    from mr_dice_spark.operators.terms import pmi_collocations

    docs = Catalog(spark, sf_dir).documents
    return pmi_collocations(docs, "text", min_count=5, k=20)


LLR_ORACLE = r"""
WITH w AS (
  SELECT list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS w
  FROM documents
),
bg AS (
  SELECT unnest(list_transform(range(1, len(w)),
                               i -> struct_pack(a := w[i], b := w[i + 1]))) AS g
  FROM w WHERE len(w) >= 2
),
big AS (
  SELECT g.a AS w1, g.b AS w2, COUNT(*) AS n_pair FROM bg GROUP BY 1, 2
),
fst AS (SELECT w1, SUM(n_pair) AS r1 FROM big GROUP BY w1),
snd AS (SELECT w2, SUM(n_pair) AS c1 FROM big GROUP BY w2),
nn AS (SELECT CAST(SUM(n_pair) AS DOUBLE) AS nn FROM big),
cand AS (
  SELECT big.w1, big.w2, n_pair,
         CAST(n_pair AS DOUBLE) AS k11,
         CAST(r1 AS DOUBLE) AS r1, CAST(c1 AS DOUBLE) AS c1, nn
  FROM big JOIN fst ON fst.w1 = big.w1 JOIN snd ON snd.w2 = big.w2
  CROSS JOIN nn
  WHERE n_pair >= 5
),
f AS (
  SELECT w1, w2, n_pair, k11, r1, c1, nn,
         r1 - k11 AS k12, c1 - k11 AS k21,
         nn - r1 - (c1 - k11) AS k22,
         nn - r1 AS r2, nn - c1 AS c2
  FROM cand
)
SELECT w1, w2, CAST(n_pair AS BIGINT) AS n_pair,
       ROUND(2.0 * (
         (CASE WHEN k11 > 0 THEN k11 * LN(k11 * nn / (r1 * c1)) ELSE 0.0 END)
         + (CASE WHEN k12 > 0 THEN k12 * LN(k12 * nn / (r1 * c2)) ELSE 0.0 END)
         + (CASE WHEN k21 > 0 THEN k21 * LN(k21 * nn / (r2 * c1)) ELSE 0.0 END)
         + (CASE WHEN k22 > 0 THEN k22 * LN(k22 * nn / (r2 * c2)) ELSE 0.0 END)
       ) + 1e-9, 4) AS llr
FROM f WHERE k11 * nn > r1 * c1
ORDER BY llr DESC, w1, w2 LIMIT 20
"""


@golden(
    "llr_collocations_top",
    LLR_ORACLE,
    tags=("text", "collocations", "llr", "dunning", "topk"),
)
def llr_collocations_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 collocations by Dunning's log-likelihood ratio — the
    evidence-weighted companion to pmi_collocations_top (PMI maximally
    rewards RARE pairs; G² ranks by how much data backs the
    association, the Dunning 1993 fix). Contingency marginals are
    bigram-POSITION counts derived from the pinned bigram aggregate;
    only over-represented pairs are scored; ordering is on the rounded
    statistic so the k-boundary cannot flip on cross-libm ln ulps."""
    from mr_dice_spark.operators.terms import llr_collocations

    docs = Catalog(spark, sf_dir).documents
    return llr_collocations(docs, "text", min_count=5, k=20)


_BIGRAM_CTES = r"""w AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS w
  FROM documents
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)),
                               i -> struct_pack(a := w[i], b := w[i + 1]))) AS g
  FROM w WHERE len(w) >= 2
),
dw AS (SELECT doc_id, g.a AS a, g.b AS b, COUNT(*) AS c FROM bg GROUP BY 1, 2, 3),
cb AS (SELECT a, b, SUM(c) AS cb FROM dw GROUP BY a, b),
cu AS (SELECT a, SUM(cb) AS cu FROM cb GROUP BY a),
v AS (
  SELECT CAST(COUNT(DISTINCT t) AS DOUBLE) AS v
  FROM (SELECT unnest(w) AS t FROM w)
)"""

BIGRAM_LM_ORACLE = f"""
WITH {_BIGRAM_CTES}
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_bigrams,
       ROUND(1e-9 + SUM(c * -ln((cb + 0.5) / (cu + 0.5 * v))) / SUM(c), 6)
         AS avg_neg_logprob
FROM dw JOIN cb USING (a, b) JOIN cu USING (a) CROSS JOIN v
GROUP BY doc_id
ORDER BY doc_id
"""


@golden("bigram_lm_quality", BIGRAM_LM_ORACLE, tags=("text", "quality", "lm", "bigram"))
def bigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-self-trained BIGRAM LM score per document: mean add-k
    negative log-probability of each in-order token pair, the next model
    order up from unigram_lm_quality — word order now matters, so
    repetition soup and shuffled text score worse than fluent prose with
    the same token bag. Left-context counts (bigrams starting at w1, not
    unigram counts) and the corpus vocabulary size feed the smoothing
    denominator; both engines evaluate the identical
    (c+0.5)/(ctx+0.5V) formula on integer-valued doubles, nudge-rounded
    at 6 to absorb last-ulp ln divergence."""
    from mr_dice_spark.operators.terms import bigram_lm_score

    docs = Catalog(spark, sf_dir).documents
    out = bigram_lm_score(docs, "doc_id", "text", add_k=0.5)
    return out.select(
        "doc_id", "n_bigrams",
        _r("avg_neg_logprob", 6).alias("avg_neg_logprob"),
    ).orderBy("doc_id")


PPL_BUCKETS_ORACLE = f"""
WITH {_BIGRAM_CTES},
s AS (
  SELECT doc_id,
         ROUND(1e-9 + SUM(c * -ln((cb + 0.5) / (cu + 0.5 * v))) / SUM(c), 6)
           AS ppl
  FROM dw JOIN cb USING (a, b) JOIN cu USING (a) CROSS JOIN v
  GROUP BY doc_id
)
SELECT d.doc_id, d.lang, s.ppl,
       CASE NTILE(3) OVER (PARTITION BY d.lang ORDER BY s.ppl, d.doc_id)
         WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
FROM documents d JOIN s USING (doc_id)
ORDER BY d.doc_id
"""


HYBRID_RRF_ORACLE = r"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS w
  FROM documents
),
tf AS MATERIALIZED (
  SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl,
         CAST(len(list_filter(w, x -> x = 'stream')) AS DOUBLE) AS tf0,
         CAST(len(list_filter(w, x -> x = 'window')) AS DOUBLE) AS tf1,
         CAST(len(list_filter(w, x -> x = 'merge')) AS DOUBLE) AS tf2
  FROM w
),
st AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl,
         SUM(CASE WHEN tf0 > 0 THEN 1.0 ELSE 0.0 END) AS df0,
         SUM(CASE WHEN tf1 > 0 THEN 1.0 ELSE 0.0 END) AS df1,
         SUM(CASE WHEN tf2 > 0 THEN 1.0 ELSE 0.0 END) AS df2
  FROM tf
),
lex AS (
  SELECT doc_id,
         ROUND(1e-9
           + ln((n - df0 + 0.5) / (df0 + 0.5) + 1.0)
             * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
           + ln((n - df1 + 0.5) / (df1 + 0.5) + 1.0)
             * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
           + ln((n - df2 + 0.5) / (df2 + 0.5) + 1.0)
             * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl)),
           6) AS s
  FROM tf CROSS JOIN st
  WHERE tf0 + tf1 + tf2 > 0
),
lex_rank AS MATERIALIZED (
  SELECT doc_id, CAST(rn AS INT) AS rank FROM (
    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS rn FROM lex
  ) WHERE rn <= 20
),
den AS (
  SELECT vec_id AS doc_id,
         ROUND(1e-9 + list_cosine_similarity(CAST(embedding AS DOUBLE[]),
               (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
                WHERE vec_id = 0)), 6) AS c
  FROM embeddings
),
den_rank AS MATERIALIZED (
  SELECT doc_id, CAST(rn AS INT) AS rank FROM (
    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY c DESC, doc_id) AS rn FROM den
  ) WHERE rn <= 20
),
u AS (
  SELECT doc_id, rank FROM lex_rank
  UNION ALL
  SELECT doc_id, rank FROM den_rank
)
SELECT doc_id, ROUND(1e-9 + SUM(1.0 / (60.0 + rank)), 6) AS rrf_score,
       CAST(COUNT(*) AS BIGINT) AS n_lists
FROM u GROUP BY doc_id
ORDER BY rrf_score DESC, doc_id
LIMIT 10
"""


@golden(
    "hybrid_retrieval_rrf",
    HYBRID_RRF_ORACLE,
    tags=("retrieval", "bm25", "ann", "rrf", "similarity"),
)
def hybrid_retrieval_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search end-to-end: an Okapi BM25 lexical ranking (query
    terms stream/window/merge) and a dense cosine ranking (vec_id 0's
    embedding — doc and vector ids align in the fixture) each produce a
    top-20 list, fused by reciprocal-rank fusion at k=60 into the final
    top-10 — the standard two-retriever RAG stack as one oracle-checked
    plan. Both rankings order by (nudge-quantized score DESC, id) so
    list membership, ranks, and therefore every 1/(60+r) summand are
    engine-identical; BM25's corpus stats stay exact because dl/df/N
    are integer-valued doubles (order-free summation). Ranks attach via
    orderBy+limit then a 20-row window (TakeOrderedAndProject, no
    corpus-wide single-partition window)."""
    from mr_dice_spark.operators.similarity import rrf_fuse
    from mr_dice_spark.operators.terms import bm25_scores

    docs = Catalog(spark, sf_dir).documents
    emb = Catalog(spark, sf_dir).embeddings
    lex_top = (
        bm25_scores(docs, "doc_id", "text", ["stream", "window", "merge"])
        .select("doc_id", _r("score", 6).alias("s"))
        .orderBy(F.desc("s"), "doc_id")
        .limit(20)
    )
    wl = Window.orderBy(F.desc("s"), F.col("doc_id"))
    lex_rank = lex_top.select(
        "doc_id", F.row_number().over(wl).alias("rank")
    )
    qrow = emb.where(F.col("vec_id") == 0).select("embedding").first()
    q = F.array(*[F.lit(float(x)) for x in qrow[0]])
    den_top = (
        emb.select(
            F.col("vec_id").alias("doc_id"),
            _r(cosine(F.col("embedding").cast("array<double>"), q), 6).alias("c"),
        )
        .orderBy(F.desc("c"), "doc_id")
        .limit(20)
    )
    wd = Window.orderBy(F.desc("c"), F.col("doc_id"))
    den_rank = den_top.select(
        "doc_id", F.row_number().over(wd).alias("rank")
    )
    fused = rrf_fuse([lex_rank, den_rank], "doc_id", k=60)
    return (
        fused.select(
            "doc_id", _r("rrf_score", 6).alias("rrf_score"), "n_lists"
        )
        .orderBy(F.desc("rrf_score"), "doc_id")
        .limit(10)
    )


def _mmr_oracle(k: int = 5, lam: str = "0.7", queries: str = "(0, 1)") -> str:
    """Unrolled greedy MMR: per level, score every unselected candidate
    as lam*rel - (1-lam)*max-sim-to-selected (both factors on the 1e-6
    quantization grid, scores re-quantized before the argmax, ties by
    ascending id) and pick ROW_NUMBER 1 per query. (1 - {lam}) is
    computed, not a 0.3 literal: 1 - 0.7 in binary floating point is
    0.30000000000000004, and the operator's (1.0 - lam) must see the
    identical constant."""
    parts = [
        f"""qv AS (
  SELECT vec_id AS q, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id IN {queries}
),
cand0 AS (
  SELECT qv.q, e.vec_id,
         ROUND(1e-9 + list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                             qv.v), 6) AS rel,
         CAST(e.embedding AS DOUBLE[]) AS ve
  FROM embeddings e CROSS JOIN qv
),
cand AS MATERIALIZED (
  SELECT q, vec_id, rel, ve FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY q ORDER BY rel DESC, vec_id)
              AS rn
    FROM cand0
  ) WHERE rn <= 20
),
sims AS MATERIALIZED (
  SELECT a.q, a.vec_id AS ia, b.vec_id AS ib,
         ROUND(1e-9 + list_cosine_similarity(a.ve, b.ve), 6) AS sim
  FROM cand a JOIN cand b ON a.q = b.q
),
sc1 AS (
  SELECT q, vec_id, ROUND(1e-9 + {lam} * rel, 6) AS score FROM cand
),
p1 AS MATERIALIZED (
  SELECT q, vec_id, score FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY q ORDER BY score DESC, vec_id)
              AS rn
    FROM sc1
  ) WHERE rn = 1
),
sel1 AS MATERIALIZED (SELECT q, vec_id FROM p1)"""
    ]
    for t in range(2, k + 1):
        parts.append(
            f"""sc{t} AS (
  SELECT c.q, c.vec_id,
         ROUND(1e-9 + {lam} * c.rel - (1 - {lam}) * COALESCE((
           SELECT MAX(s.sim) FROM sims s
           JOIN sel{t - 1} x ON x.q = s.q AND x.vec_id = s.ib
           WHERE s.q = c.q AND s.ia = c.vec_id
         ), 0.0), 6) AS score
  FROM cand c
  WHERE NOT EXISTS (
    SELECT 1 FROM sel{t - 1} x WHERE x.q = c.q AND x.vec_id = c.vec_id
  )
),
p{t} AS MATERIALIZED (
  SELECT q, vec_id, score FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY q ORDER BY score DESC, vec_id)
              AS rn
    FROM sc{t}
  ) WHERE rn = 1
),
sel{t} AS MATERIALIZED (
  SELECT q, vec_id FROM sel{t - 1} UNION ALL SELECT q, vec_id FROM p{t}
)"""
        )
    selects = "\nUNION ALL\n".join(
        f"SELECT q AS query_id, CAST({t} AS INT) AS rank, vec_id,"
        f" score AS mmr_score FROM p{t}"
        for t in range(1, k + 1)
    )
    return "WITH " + ",\n".join(parts) + f"\n{selects}\nORDER BY query_id, rank"


@golden(
    "mmr_diversified_topk",
    _mmr_oracle(5, "0.7", "(0, 1)"),
    tags=("retrieval", "mmr", "similarity", "rerank"),
)
def mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance diversification for two queries at
    once: each query's brute-cosine top-20 feeds the per-query greedy
    (lam=0.7, k=5) that trades relevance against similarity to what's
    already picked — the standard rerank between retrieval and the
    context window. The operator runs the greedy inside one
    Arrow-batched applyInPandas keyed by query; the oracle unrolls all
    five picks per query with the same quantize-before-compare
    contract, so every selection (and score) is hash-checked."""
    from mr_dice_spark.operators.similarity import mmr_rerank

    emb = Catalog(spark, sf_dir).embeddings
    cands = None
    for qid in (0, 1):
        qrow = emb.where(F.col("vec_id") == qid).select("embedding").first()
        qv = F.array(*[F.lit(float(x)) for x in qrow[0]])
        top = (
            emb.select(
                F.lit(qid).cast("long").alias("query_id"),
                "vec_id",
                _r(cosine(F.col("embedding").cast("array<double>"), qv), 6)
                .alias("rel"),
                "embedding",
            )
            .orderBy(F.desc("rel"), "vec_id")
            .limit(20)
        )
        cands = top if cands is None else cands.unionByName(top)
    out = mmr_rerank(
        cands, "query_id", "vec_id", "rel", "embedding", k=5, lam=0.7
    )
    return out.select(
        "query_id", "rank", "vec_id", _r("mmr_score", 6).alias("mmr_score")
    ).orderBy("query_id", "rank")


def _bpe_oracle(k: int) -> str:
    """Unrolled BPE training: k CTE levels of pair-count -> argmax ->
    greedy merge. The merge rebuild restates greedy left-to-right
    non-overlapping matching POSITIONALLY: position i starts a merge iff
    (s[i], s[i+1]) matches AND i sits at an even offset within its
    maximal run of consecutive matches (the run-parity rule — provably
    the fold the operator applies, overlap only possible when left ==
    right). Word tables and 1-row argmax CTEs are multi-referenced,
    hence MATERIALIZED (the frequent_event_itemsets lesson)."""
    parts = [
        r"""w0 AS MATERIALIZED (
  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS freq, string_split(w, '') AS s
  FROM (
    SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'),
                              x -> x <> '')) AS w
    FROM documents
  )
  GROUP BY w
)"""
    ]
    for r in range(1, k + 1):
        prev = f"w{r - 1}"
        parts.append(
            f"""p{r} AS (
  SELECT s[i] AS a, s[i + 1] AS b, freq
  FROM (SELECT freq, s, unnest(range(1, len(s))) AS i FROM {prev})
),
m{r} AS MATERIALIZED (
  SELECT a, b, CAST(SUM(freq) AS BIGINT) AS c
  FROM p{r} GROUP BY a, b
  ORDER BY c DESC, a, b LIMIT 1
)"""
        )
        if r < k:
            parts.append(
                f"""w{r} AS MATERIALIZED (
  SELECT word, freq,
         flatten(list_transform(range(1, len(s) + 1), i ->
           CASE
             WHEN i < len(s) AND s[i] = m.a AND s[i + 1] = m.b
                  AND ((i - coalesce(list_max(list_filter(range(1, i),
                        q -> NOT (s[q] = m.a AND s[q + 1] = m.b))), 0)) % 2) = 1
               THEN [m.a || m.b]
             WHEN i > 1 AND s[i - 1] = m.a AND s[i] = m.b
                  AND (((i - 1) - coalesce(list_max(list_filter(range(1, i - 1),
                        q -> NOT (s[q] = m.a AND s[q + 1] = m.b))), 0)) % 2) = 1
               THEN CAST([] AS VARCHAR[])
             ELSE [s[i]]
           END)) AS s
  FROM {prev} CROSS JOIN m{r} m
)"""
            )
    selects = "\nUNION ALL\n".join(
        f"SELECT {r} AS rank, a AS left_sym, b AS right_sym, c AS pair_count"
        f" FROM m{r}"
        for r in range(1, k + 1)
    )
    return "WITH " + ",\n".join(parts) + f"\n{selects}\nORDER BY rank"


@golden(
    "bpe_train_merges_corpus",
    _bpe_oracle(12),
    tags=("text", "vocab", "bpe", "tokenizer", "iterative"),
)
def bpe_train_merges_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first 12 BPE merges trained on the documents corpus — the
    actual Sennrich merge LOOP, not just one round's pair stats: each
    round's argmax becomes a literal in the next round's greedy in-word
    merge fold (the k-means bounded-driver-state idiom). 12 rounds
    reach multi-character re-pairing ('m'+'er', 'p'+'ar', 'jo'+'in'),
    so the oracle's run-parity merge rule is exercised on symbols built
    by earlier merges, and a count tie ('a','r')/('p','ar') at rank
    9/10 exercises the deterministic tiebreak. Cross-checked three
    ways: DuckDB's 12-level unrolled restatement (this oracle), and a
    pure-Python BPE in the suite."""
    from mr_dice_spark.operators.vocab import bpe_train_merges

    docs = Catalog(spark, sf_dir).documents
    return bpe_train_merges(docs, "text", 12).orderBy("rank")


@golden(
    "ccnet_perplexity_buckets",
    PPL_BUCKETS_ORACLE,
    tags=("text", "quality", "lm", "curation", "ccnet"),
)
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail partition: per-language equal-count
    terciles of the corpus-self-trained bigram-LM perplexity proxy —
    the standard keep-head+middle / audit-tail filtering split.
    Determinism hinges on NTILE over (quantized ppl, doc_id): the
    rounding grid absorbs summation-order noise before ranking, so both
    engines order — and therefore bucket — identically even at exact
    score ties."""
    from mr_dice_spark.operators.curation import perplexity_buckets

    docs = Catalog(spark, sf_dir).documents
    return perplexity_buckets(
        docs, "doc_id", "text", "lang", n_buckets=3
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# corpus line-level dedup (CCNet/RefinedWeb boilerplate-line removal)
# ---------------------------------------------------------------------------

LINE_DEDUP_ORACLE = r"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
),
chunked AS (
  SELECT doc_id,
         list_transform(range(0, CAST(ceil(len(w) / 8.0) AS INT)),
                        i -> struct_pack(pos := i,
                                         line := array_to_string(w[i*8+1 : i*8+8], ' ')))
           AS cs
  FROM w
),
sel AS (
  SELECT doc_id, s.pos AS pos, s.line AS line
  FROM (SELECT doc_id, unnest(cs) AS s FROM chunked)
),
kept AS (
  SELECT * FROM sel
  WHERE line NOT IN (SELECT line FROM sel WHERE line <> ''
                     GROUP BY line
                     HAVING COUNT(DISTINCT doc_id) >= 2)
)
SELECT doc_id,
       string_agg(line, chr(10) ORDER BY pos) AS text,
       COUNT(*) AS n_lines_kept
FROM kept GROUP BY doc_id ORDER BY doc_id
"""


@golden("line_dedup_boilerplate", LINE_DEDUP_ORACLE, tags=("text", "dedup", "lines"))
def line_dedup_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level line dedup, the CCNet/RefinedWeb boilerplate-removal
    step: the corpus is reshaped into 8-word 'lines' (it has no newlines),
    every line occurring in >= 2 distinct documents is dropped, and each
    document is rebuilt from its surviving lines in original order — the
    planted near-duplicate documents lose their shared spans. Pure string
    and integer operations, so the DuckDB restatement is hash-exact."""
    from mr_dice_spark.operators.lines import line_dedup

    docs = Catalog(spark, sf_dir).documents
    w = F.split(F.trim(F.col("text")), r"\s+")
    nch = F.ceil(F.size(w) / F.lit(8.0)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), nch - 1),
        lambda i: F.array_join(F.slice(w, i * F.lit(8) + 1, 8), " "),
    )
    lined = docs.select("doc_id", F.array_join(chunks, "\n").alias("text"))
    out = line_dedup(lined, "doc_id", "text", min_docs=2)
    return out.orderBy("doc_id")


# ---------------------------------------------------------------------------
# duplicated-span ratio (exact-substring-dedup signal, Lee et al.)
# ---------------------------------------------------------------------------

DUP_SPAN_ORACLE = r"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
),
docs8 AS (SELECT doc_id, w, len(w) AS L FROM w WHERE len(w) >= 8),
grams AS (
  SELECT doc_id, s.pos AS pos, s.g AS g
  FROM (SELECT doc_id,
          unnest(list_transform(range(1, L - 8 + 2),
                 i -> struct_pack(pos := i, g := array_to_string(w[i : i+7], ' ')))) AS s
        FROM docs8)
),
dup AS (SELECT g FROM grams GROUP BY g HAVING COUNT(*) >= 2),
cov AS (
  SELECT DISTINCT doc_id, j FROM (
    SELECT doc_id, unnest(range(pos, pos + 8)) AS j
    FROM grams WHERE g IN (SELECT g FROM dup)
  )
),
covc AS (SELECT doc_id, COUNT(*) AS dup_tokens FROM cov GROUP BY doc_id)
SELECT d.doc_id,
       d.L AS n_tokens,
       COALESCE(c.dup_tokens, 0) AS dup_tokens,
       ROUND(1e-9 + COALESCE(c.dup_tokens, 0) / CAST(d.L AS DOUBLE), 6)
         AS dup_token_ratio
FROM (SELECT doc_id, L FROM docs8) d LEFT JOIN covc c USING (doc_id)
ORDER BY doc_id
"""


@golden("duplicate_span_ratio", DUP_SPAN_ORACLE, tags=("text", "dedup", "spans"))
def duplicate_span_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring-dedup signal (Lee et al.): per document, the share
    of tokens lying inside an 8-gram that occurs >= 2 times in the corpus
    — the planted near-duplicates light up with high ratios. Counts and an
    integer-ratio double only, so the DuckDB restatement is value-exact."""
    from mr_dice_spark.operators.terms import duplicate_span_stats

    docs = Catalog(spark, sf_dir).documents
    out = duplicate_span_stats(docs, "doc_id", "text", n=8)
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "dup_tokens",
        _r("dup_token_ratio", 6).alias("dup_token_ratio"),
    ).orderBy("doc_id")


@golden("streaming_hourly_window", WINDOW_ORACLE, tags=("streaming", "window", "events"))
def streaming_hourly_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME hourly tumbling-window aggregate as events_hourly_window,
    but executed by the Structured Streaming engine: readStream file
    source → watermarked window aggregate → memory sink, drained with an
    availableNow trigger. A finite replayable source makes the streaming
    result deterministic and equal to the batch result, so this entry is
    hash-checked against the identical SQL oracle — streaming with full
    oracle parity, not a rows-only smoke check."""
    import uuid

    from mr_dice_spark.streaming.windows import (
        read_events_stream,
        run_stream_to_memory,
        tumbling_window_stats,
    )

    _utc(spark)
    name = f"stream_hourly_{uuid.uuid4().hex[:8]}"
    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    q = run_stream_to_memory(tumbling_window_stats(stream), name)
    try:
        out = spark.table(name).select(
            "window_start_ms",
            "event_type",
            "n_events",
            _r(F.col("avg_value"), 4).alias("avg_value"),
        ).orderBy("window_start_ms", "event_type")
        # materialize before the query object goes away
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        q.stop()


def _curation_oracle() -> str:
    from mr_dice_spark.functions.text import EN_STOPWORDS, LANG_PROFILES

    langs = sorted(LANG_PROFILES)
    scores = ",\n         ".join(f"{_lang_score_sql(lg)} AS s_{lg}" for lg in langs)
    mx = f"greatest({', '.join('s_' + lg for lg in langs)})"
    whens = "\n              ".join(f"WHEN s_{lg} = mx THEN '{lg}'" for lg in langs)
    sw = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    return f"""
WITH scored AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
         {scores},
         len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
             w -> list_contains([{sw}], w))) * 1.0
           / len(string_split_regex(trim(text), '\\s+')) AS swr,
         ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS dup_rank
  FROM documents
),
m AS (SELECT *, {mx} AS mx FROM scored),
lab AS (
  SELECT *, CASE WHEN mx = 0 THEN 'und'
              {whens}
            END AS detected_lang
  FROM m
),
v AS (
  SELECT doc_id, n_tokens, detected_lang,
         CASE WHEN dup_rank > 1 THEN 'exact_dup'
              WHEN n_tokens < 25 THEN 'too_short'
              WHEN detected_lang = 'und' THEN 'lang_und'
              WHEN swr < 0.02 THEN 'low_stopword'
              ELSE 'ok' END AS reason
  FROM lab
)
SELECT doc_id, n_tokens, detected_lang, reason,
       CASE WHEN reason = 'ok' THEN 'keep' ELSE 'drop' END AS verdict
FROM v
ORDER BY doc_id
"""


@golden("corpus_curation_pipeline", _curation_oracle(), tags=("text", "pipeline", "dedup", "quality"))
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation gate: exact-dup removal + length + language +
    stopword-density cascade, one verdict and first-failing reason per
    document — the C4/Gopher-style keep/drop stage of a training-data
    pipeline, fully hash-checked against the SQL restatement."""
    from mr_dice_spark.operators.curation import curate_corpus

    docs = Catalog(spark, sf_dir).documents
    return curate_corpus(docs, "doc_id", "text").orderBy("doc_id")


def _blend_oracle() -> str:
    probs = ", ".join(f"{i / 100}" for i in range(1, 100))
    return rf"""
WITH s AS (
  SELECT doc_id,
         CAST(len(w) AS DOUBLE) AS n_tokens,
         CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS ttr,
         CAST(length(text) AS DOUBLE) AS n_chars
  FROM (SELECT doc_id, text,
               list_filter(string_split_regex(trim(text), '\s+'),
                           x -> x <> '') AS w
        FROM documents)
),
e AS (
  SELECT list_transform(quantile_cont(n_tokens, [{probs}]), x -> round(1e-9 + x, 6)) AS et,
         list_transform(quantile_cont(ttr,      [{probs}]), x -> round(1e-9 + x, 6)) AS er,
         list_transform(quantile_cont(n_chars,  [{probs}]), x -> round(1e-9 + x, 6)) AS ec
  FROM s
),
p AS (
  SELECT doc_id,
         round(1e-9 + ((1 + len(list_filter((SELECT et FROM e), v -> n_tokens > v))) - 0.5) / 100, 6) AS pct_n_tokens,
         round(1e-9 + ((1 + len(list_filter((SELECT er FROM e), v -> ttr      > v))) - 0.5) / 100, 6) AS pct_ttr,
         round(1e-9 + ((1 + len(list_filter((SELECT ec FROM e), v -> n_chars  > v))) - 0.5) / 100, 6) AS pct_n_chars
  FROM s
)
SELECT doc_id, pct_n_tokens, pct_ttr, pct_n_chars,
       round(1e-9 + (pct_n_tokens * 0.5 + pct_ttr * 0.3 + pct_n_chars * 0.2)
                    / (0.5 + 0.3 + 0.2), 6) AS blend_score
FROM p
ORDER BY doc_id
"""


@golden(
    "quality_percentile_blend_docs",
    _blend_oracle(),
    tags=("text", "quality", "curation", "quantile"),
)
def quality_percentile_blend_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-signal quality ranking by quantile normalization: token
    count, type-token ratio, and character length each map to their
    percentile-bucket midpoint against their own exact centile edges,
    then blend 0.5/0.3/0.2 — comparable scores without a global
    percent_rank sort (the scalable design: three bounded edge collects,
    then ONE narrow scoring scan with literal-fold bucket lookups and no
    shuffle). Weighted-sum addition order is pinned left-to-right in
    both engines so the blend is bit-identical."""
    from mr_dice_spark.operators.curation import quality_percentile_blend

    docs = Catalog(spark, sf_dir).documents
    words = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != "")
    sig = docs.select(
        "doc_id",
        F.size(words).cast("double").alias("n_tokens"),
        (
            F.size(F.array_distinct(words)).cast("double")
            / F.size(words)
        ).alias("ttr"),
        F.length("text").cast("double").alias("n_chars"),
    )
    return quality_percentile_blend(
        sig,
        "doc_id",
        {"n_tokens": 0.5, "ttr": 0.3, "n_chars": 0.2},
        n_bins=100,
    ).orderBy("doc_id")


@golden("cosine_topk_ivf_pq_approx", None, tags=("similarity", "ann", "ivf", "pq"))
def cosine_topk_ivf_pq_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composed ANN: build the cluster-partitioned PQ-coded index
    (8 coarse clusters, m=16/nbits=4 codes), then answer top-10 probing 3
    clusters — the query plan reads only the probed fraction and scores by
    ADC table lookups, the architecture that holds at 100 TB. Iterative
    training, hence rows-only check."""
    from mr_dice_spark.operators.similarity import ivf_pq_index, ivf_pq_topk

    emb = Catalog(spark, sf_dir).embeddings
    qrow = emb.where(F.col("vec_id") == 0).select("embedding").first()
    qvec = [float(x) for x in qrow[0]]
    index_df, centroids, books = ivf_pq_index(
        emb, "vec_id", "embedding", n_centroids=8, m=16, nbits=4,
        train_iters=2, pq_iters=2,
    )
    out = ivf_pq_topk(index_df, "vec_id", qvec, centroids, books, k=10, n_probe=3)
    return out.select("vec_id", _r(F.col("adc_score"), 6).alias("adc_score")).orderBy(
        F.desc("adc_score"), "vec_id"
    )


@golden("pq_topk_adc", None, tags=("similarity", "ann", "pq"))
def pq_topk_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN: train m=16/nbits=4 codebooks (two Lloyd
    sweeps), encode the corpus to 16 codes per vector (64x compression),
    and answer top-10 by asymmetric distance computation — the distance
    table folds into the plan as literals, so the scan is lookups + a
    global TakeOrdered. Training is iterative (collect per sweep), hence
    no SQL oracle; rows-only check."""
    from mr_dice_spark.operators.similarity import pq_encode, pq_topk, pq_train

    emb = Catalog(spark, sf_dir).embeddings
    qrow = emb.where(F.col("vec_id") == 0).select("embedding").first()
    qvec = [float(x) for x in qrow[0]]
    books = pq_train(emb, "vec_id", "embedding", m=16, nbits=4, n_iter=2)
    enc = pq_encode(emb, "vec_id", "embedding", books)
    out = pq_topk(enc, "vec_id", qvec, books, k=10)
    return out.select("vec_id", _r(F.col("adc_score"), 6).alias("adc_score")).orderBy(
        F.desc("adc_score"), "vec_id"
    )


PQ_FIXED_ORACLE = """
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
n AS (
  SELECT vec_id,
         CASE WHEN sqrt(list_dot_product(v, v)) > 0
              THEN list_transform(v, x -> x / sqrt(list_dot_product(v, v)))
              ELSE v END AS u
  FROM base
),
seeds AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code, u
  FROM n ORDER BY vec_id LIMIT 16
),
sp AS (SELECT unnest(range(16)) AS s),
cw AS (
  SELECT sp.s, seeds.code, seeds.u[sp.s*4+1 : sp.s*4+4] AS c
  FROM seeds CROSS JOIN sp
),
q AS (SELECT u AS qu FROM n WHERE vec_id = 7),
assign AS (
  SELECT vec_id, s, code FROM (
    SELECT nn.vec_id, cw.s, cw.code,
           ROW_NUMBER() OVER (
             PARTITION BY nn.vec_id, cw.s
             ORDER BY ROUND(list_dot_product(nn.u[cw.s*4+1 : cw.s*4+4], cw.c)
                            - 0.5 * list_dot_product(cw.c, cw.c) + 1e-9, 6) DESC,
                      cw.code
           ) AS rn
    FROM n nn CROSS JOIN cw
  ) WHERE rn = 1
),
scored AS (
  SELECT a.vec_id,
         SUM(list_dot_product((SELECT qu FROM q)[a.s*4+1 : a.s*4+4], cw.c)) AS raw
  FROM assign a JOIN cw ON cw.s = a.s AND cw.code = a.code
  GROUP BY a.vec_id
)
SELECT vec_id, ROUND(1e-9 + raw, 6) AS adc_score
FROM scored
ORDER BY adc_score DESC, vec_id
LIMIT 10
"""


@golden("pq_topk_fixed_oracle", PQ_FIXED_ORACLE, tags=("similarity", "ann", "pq"))
def pq_topk_fixed_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ADC top-k with the deterministic sampled-init codebooks
    (n_iter=0: subvectors of the first 2^nbits vectors by id) and
    rounded-grid code assignment — the cosine_topk_ivf_fixed_oracle
    treatment for product quantization: with the codebook pinned, EVERY
    stage (seed pick -> per-subspace argmax encode -> literal ADC table
    -> global top-k) is SQL-restatable, so the whole PQ pipeline gets a
    hash-checked oracle instead of pq_topk_adc's rows-only check. The
    grid (round_scores=6, nudge-rounded) is where a numpy BLAS dot and
    DuckDB's sequential dot agree bit-for-bit."""
    from mr_dice_spark.operators.similarity import pq_encode, pq_topk, pq_train

    emb = Catalog(spark, sf_dir).embeddings
    qrow = emb.where(F.col("vec_id") == 7).select("embedding").first()
    qvec = [float(x) for x in qrow[0]]
    books = pq_train(emb, "vec_id", "embedding", m=16, nbits=4, n_iter=0)
    enc = pq_encode(emb, "vec_id", "embedding", books, round_scores=6)
    out = pq_topk(enc, "vec_id", qvec, books, k=10, round_scores=6)
    return out.orderBy(F.desc("adc_score"), "vec_id")


# ---------------------------------------------------------------------------
# streaming sliding window with full oracle parity (extension, §2.10)
# ---------------------------------------------------------------------------

SLIDING_ORACLE = """
SELECT epoch_ms(ws) AS window_start_ms,
       epoch_ms(ws + INTERVAL 1 HOUR) AS window_end_ms,
       event_type,
       COUNT(*) AS n_events
FROM (
  SELECT event_type,
         time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes' AS ws
  FROM events, unnest([0, 1, 2, 3]) AS t(k)
)
GROUP BY ws, event_type
ORDER BY window_start_ms, event_type
"""


@golden("streaming_sliding_window", SLIDING_ORACLE, tags=("streaming", "window", "events"))
def streaming_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h window, 15 min slide) through the Structured
    Streaming engine, drained with availableNow and hash-checked against a
    relational restatement: with window = 4 x slide every event lands in
    EXACTLY 4 windows, so the oracle cross-joins each event to offsets
    0..3 of its 15-minute bucket — a closed-form of Spark's window()
    expansion. Same determinism argument as streaming_hourly_window: a
    finite replayable source makes streaming == batch == SQL."""
    import uuid

    from mr_dice_spark.streaming.windows import (
        read_events_stream,
        run_stream_to_memory,
        sliding_window_counts,
    )

    _utc(spark)
    name = f"stream_sliding_{uuid.uuid4().hex[:8]}"
    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    q = run_stream_to_memory(sliding_window_counts(stream), name)
    try:
        out = spark.table(name).orderBy("window_start_ms", "event_type")
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        q.stop()


STREAM_SESSION_ORACLE = """
WITH t AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
marked AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) >= 1800 THEN 1 ELSE 0 END AS brk
  FROM t
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id, epoch_ms(MIN(ts)) AS start_ms, COUNT(*) AS n_events
FROM s GROUP BY user_id, session_id
ORDER BY user_id, start_ms
"""


@golden("streaming_session_window", STREAM_SESSION_ORACLE, tags=("streaming", "sessionize", "events"))
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions (session_window, 30 min gap) through the
    Structured Streaming engine, hash-checked against the gaps-and-islands
    SQL restatement — the streaming merge rule (extend while the next event
    arrives < gap after the last) is exactly the islands break condition
    (diff >= gap starts a new island). Completes the §2.10 trio: all three
    window families (tumbling/sliding/session) run on the streaming engine
    with full oracle parity, not just batch-equivalence smoke checks."""
    import uuid

    from mr_dice_spark.streaming.windows import (
        read_events_stream,
        run_stream_to_memory,
        session_window_stats,
    )

    _utc(spark)
    name = f"stream_session_{uuid.uuid4().hex[:8]}"
    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    q = run_stream_to_memory(session_window_stats(stream), name)
    try:
        out = spark.table(name).orderBy("user_id", "start_ms")
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        q.stop()


# ---------------------------------------------------------------------------
# SCD2 dimension history (beyond-reference: warehouse-standard type-2 SCD)
# ---------------------------------------------------------------------------

SCD2_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_type
  FROM events
),
marked AS (
  SELECT user_id, event_id, event_type,
         CASE WHEN prev_type IS NULL OR prev_type <> event_type THEN 1 ELSE 0 END AS brk
  FROM ordered
),
runs AS (
  SELECT user_id, event_id, event_type,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY event_id
                        ROWS UNBOUNDED PRECEDING) AS run
  FROM marked
),
intervals AS (
  SELECT user_id, run, MIN(event_id) AS valid_from, MIN(event_type) AS event_type
  FROM runs GROUP BY user_id, run
)
SELECT user_id, valid_from,
       LEAD(valid_from) OVER w AS valid_to,
       (LEAD(valid_from) OVER w IS NULL) AS is_current,
       event_type
FROM intervals
WINDOW w AS (PARTITION BY user_id ORDER BY valid_from)
ORDER BY user_id, valid_from
"""


@golden("scd2_user_event_history", SCD2_ORACLE, tags=("cdc", "scd2", "window"))
def scd2_user_event_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD history built from the events feed (user_id as the
    dimension key, event_id as the version, event_type as the tracked
    attribute): consecutive unchanged versions collapse into one validity
    interval, the last interval per key stays open. Single key-shuffle
    gaps-and-islands — the oracle restates the same islands in SQL, so the
    interval algebra (collapse, lead-close, open tail) is hash-checked
    end to end."""
    from mr_dice_spark.operators.merge import scd2_history

    _utc(spark)
    ev = Catalog(spark, sf_dir).events.select("user_id", "event_id", "event_type")
    out = scd2_history(
        ev, keys=["user_id"], version_col="event_id", tracked=["event_type"]
    )
    return out.select(
        "user_id", "valid_from", "valid_to", "is_current", "event_type"
    ).orderBy("user_id", "valid_from")


# ---------------------------------------------------------------------------
# time-series resample + forward fill (beyond-reference)
# ---------------------------------------------------------------------------

RESAMPLE_ORACLE = """
WITH b AS (
  SELECT user_id % 8 AS k,
         to_timestamp(CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) * 3600) AS h,
         ROUND(1e-9 + AVG(value), 4) AS v
  FROM events GROUP BY 1, 2
),
spans AS (SELECT k, MIN(h) AS lo, MAX(h) AS hi FROM b GROUP BY k),
grid AS (
  SELECT k, unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS h FROM spans
),
j AS (SELECT g.k, g.h, b.v FROM grid g LEFT JOIN b ON b.k = g.k AND b.h = g.h)
SELECT k AS user_band, epoch_ms(h) AS bucket_ms,
       LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY k ORDER BY h
                                        ROWS UNBOUNDED PRECEDING) AS value,
       (v IS NULL) AS filled
FROM j
ORDER BY user_band, bucket_ms
"""


@golden("resample_ffill_hourly", RESAMPLE_ORACLE, tags=("timeseries", "window", "events"))
def resample_ffill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample of per-band event values with forward fill: grid
    generation is a bounded sequence() explode per key (span/step rows,
    never a calendar cross join), gaps take the last observed bucket
    aggregate, and `filled` marks synthesized rows. The bucket aggregate
    is nudge-rounded once per bucket (fill only propagates values, so
    rounding before or after the fill is equivalent — the oracle rounds
    before, Spark after). Oracle restates the pipeline with
    generate_series + IGNORE NULLS LAST_VALUE."""
    from mr_dice_spark.operators.timeseries import resample_ffill

    _utc(spark)
    ev = Catalog(spark, sf_dir).events.select(
        (F.col("user_id") % 8).alias("user_band"), "ts", "value"
    )
    out = resample_ffill(
        ev,
        key_col="user_band",
        ts_col="ts",
        value_col="value",
        step_seconds=3600,
        agg="avg",
    )
    return out.select(
        "user_band",
        F.unix_millis("bucket_ts").alias("bucket_ms"),
        _r("value", 4).alias("value"),
        "filled",
    ).orderBy("user_band", "bucket_ms")


INTERPOLATE_ORACLE = """
WITH b AS (
  SELECT user_id % 64 AS k,
         to_timestamp(CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) * 3600) AS h,
         MIN(value) AS v
  FROM events GROUP BY 1, 2
),
spans AS (SELECT k, MIN(h) AS lo, MAX(h) AS hi FROM b GROUP BY k),
grid AS (
  SELECT k, unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS h FROM spans
),
j AS (SELECT g.k, g.h, b.v FROM grid g LEFT JOIN b ON b.k = g.k AND b.h = g.h),
f AS (
  SELECT k, h, v,
    LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY k ORDER BY h
        ROWS UNBOUNDED PRECEDING) AS pv,
    LAST_VALUE(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
        OVER (PARTITION BY k ORDER BY h ROWS UNBOUNDED PRECEDING) AS pt,
    FIRST_VALUE(v IGNORE NULLS) OVER (PARTITION BY k ORDER BY h
        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    FIRST_VALUE(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
        OVER (PARTITION BY k ORDER BY h
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
  FROM j
)
SELECT k AS user_band, epoch_ms(h) AS bucket_ms,
       ROUND(1e-9 + CASE WHEN v IS NOT NULL THEN v
             ELSE pv + (nv - pv) * ((epoch(h) - epoch(pt))
                                    / (epoch(nt) - epoch(pt))) END, 4) AS value,
       (v IS NULL) AS filled
FROM f
ORDER BY user_band, bucket_ms
"""


@golden(
    "interpolate_linear_hourly",
    INTERPOLATE_ORACLE,
    tags=("timeseries", "window", "events", "interpolation"),
)
def interpolate_linear_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample with LINEAR gap interpolation (pandas
    interpolate("linear") semantics, Spark-native): per-band bucket
    minimum, bounded sequence() grid, and each gap bucket takes
    prev + (next - prev) * elapsed-fraction between its nearest observed
    neighbours — one key shuffle total, the prev/next scans sharing a
    single partition+sort. The bucket aggregate is MIN (order-independent,
    so bit-exact across engines unlike a summed AVG), the interpolation
    expression is parenthesized identically on both sides (frac divides
    first), and only the final value is nudge-rounded. At sf0.01 the
    64-band hourly grid is ~45k rows with ~36k interpolated gaps."""
    from mr_dice_spark.operators.timeseries import interpolate_linear

    _utc(spark)
    ev = Catalog(spark, sf_dir).events.select(
        (F.col("user_id") % 64).alias("user_band"), "ts", "value"
    )
    out = interpolate_linear(
        ev,
        key_col="user_band",
        ts_col="ts",
        value_col="value",
        step_seconds=3600,
        agg="min",
    )
    return out.select(
        "user_band",
        F.unix_millis("bucket_ts").alias("bucket_ms"),
        _r("value", 4).alias("value"),
        "filled",
    ).orderBy("user_band", "bucket_ms")


# ---------------------------------------------------------------------------
# batched multi-query ANN: top-k per query in one corpus scan
# ---------------------------------------------------------------------------

COSINE_BATCH_ORACLE = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 5
),
scored AS (
  SELECT q.query_id, e.vec_id,
         ROUND(1e-9 + list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6)
           AS cosine
  FROM embeddings e CROSS JOIN q
)
SELECT query_id, vec_id, cosine
FROM (
  SELECT query_id, vec_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id) AS rn
  FROM scored
)
WHERE rn <= 10
ORDER BY query_id, cosine DESC, vec_id
"""


@golden("cosine_topk_batch_queries", COSINE_BATCH_ORACLE, tags=("similarity", "ann", "batch"))
def cosine_topk_batch_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 for FIVE queries in one corpus scan: the query set
    broadcasts, every corpus row scores all queries, and the per-query
    top-k is a WindowGroupLimit (at most k rows per query leave each map
    partition). Scores are nudge-rounded before the rank so cross-engine
    double noise cannot flip top-k membership at the boundary."""
    from mr_dice_spark.operators.similarity import cosine_topk_batch

    emb = Catalog(spark, sf_dir).embeddings
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = cosine_topk_batch(
        emb, "vec_id", "embedding", queries, "query_id", "embedding", k=10,
        round_scores=6,
    )
    return out.orderBy("query_id", F.desc("cosine"), "vec_id")


def _sig_expr_sql(v: str, planes) -> str:
    """Hyperplane-signature SQL expression: the seeded planes are
    deterministic Python floats, embedded as full-repr literals (doubles
    round-trip exactly), bit i = sign(dot(v, plane_i))."""
    cases = []
    for i, p in enumerate(planes):
        arr = ", ".join(repr(float(x)) for x in p)
        cases.append(
            f"CASE WHEN list_dot_product({v}, [{arr}]) >= 0 THEN {1 << i} ELSE 0 END"
        )
    return "(" + " + ".join(cases) + ")"


def _lsh_topk_oracle() -> str:
    """DuckDB restatement of cosine_topk_lsh: literal-plane signature bits,
    the hamming-ball candidate filter, and the exact rerank are plain
    expressions. Upgrades this ANN variant from a rows-only check to full
    oracle parity."""
    from mr_dice_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(dim=64, n_planes=16, seed=42)

    def sig_expr(v: str) -> str:
        return _sig_expr_sql(v, planes)

    return f"""
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
qsig AS (SELECT {sig_expr('qv')} AS qs FROM q),
sigs AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         {sig_expr('CAST(embedding AS DOUBLE[])')} AS sig
  FROM embeddings
)
SELECT vec_id,
       ROUND(1e-9 + list_cosine_similarity(v, (SELECT qv FROM q)), 6) AS cosine
FROM sigs, qsig
WHERE bit_count(CAST(xor(sig, qs) AS BIGINT)) <= 4
ORDER BY cosine DESC, vec_id
LIMIT 10
"""


# upgrade the registered entry in place: same Spark callable, now with an
# oracle (the registry is keyed by name; re-registering replaces it)
from mr_dice_spark.golden import GOLDEN, GoldenQuery  # noqa: E402

GOLDEN["cosine_topk_lsh_approx"] = GoldenQuery(
    name="cosine_topk_lsh_approx",
    spark=cosine_topk_lsh_approx,
    oracle=_lsh_topk_oracle(),
    tags=("similarity", "ann", "lsh"),
)


def _near_dup_oracle() -> str:
    """DuckDB restatement of embedding_near_dup: literal-plane signatures,
    8-bit band keys (pairs agreeing on at least one same-position band),
    DISTINCT candidates, exact-cosine verification at the raw threshold
    with rounding applied only to the output column — mirroring the Spark
    operator exactly."""
    from mr_dice_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(dim=64, n_planes=16, seed=42)
    sig = _sig_expr_sql("CAST(embedding AS DOUBLE[])", planes)
    return f"""
WITH sigs AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, {sig} AS sig FROM embeddings
),
banded AS (
  SELECT vec_id, v, sig % 256 AS b0, (sig // 256) % 256 AS b1 FROM sigs
),
pairs AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b, a.v AS va, b.v AS vb
  FROM banded a JOIN banded b
    ON a.vec_id < b.vec_id AND (a.b0 = b.b0 OR a.b1 = b.b1)
)
SELECT id_a, id_b, ROUND(1e-9 + list_cosine_similarity(va, vb), 4) AS cosine
FROM pairs
WHERE list_cosine_similarity(va, vb) >= 0.4
ORDER BY id_a, id_b
"""


GOLDEN["embedding_near_dup_pairs"] = GoldenQuery(
    name="embedding_near_dup_pairs",
    spark=embedding_near_dup_pairs,
    oracle=_near_dup_oracle(),
    tags=("dedup", "similarity", "lsh"),
)


# ---------------------------------------------------------------------------
# streaming dedup + stream-stream interval join (round 3: §2.10 depth)
# ---------------------------------------------------------------------------

STREAM_DEDUP_ORACLE = """
SELECT DISTINCT user_id, event_type FROM events ORDER BY user_id, event_type
"""


@golden("streaming_dedup_keys", STREAM_DEDUP_ORACLE, tags=("streaming", "dedup", "events"))
def streaming_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-bounded streaming dedup on the REAL streaming engine:
    readStream → dropDuplicatesWithinWatermark(user_id, event_type) →
    append memory sink. The watermark is set beyond the fixture's whole
    time range, which makes the bounded-state operator EXACT for a finite
    backfill (state never evicts mid-replay, so availableNow may split
    the source into any number of micro-batches without changing the
    result) — hence full oracle parity with SQL DISTINCT. Production
    streams trade the watermark down for bounded state; that trade is
    the operator's documented contract, not this golden's subject."""
    import uuid

    from mr_dice_spark.streaming.joins import dedup_stream
    from mr_dice_spark.streaming.windows import read_events_stream, run_stream_to_memory

    _utc(spark)
    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    d = dedup_stream(stream, ["user_id", "event_type"], watermark="3650 days")
    q = run_stream_to_memory(
        d.select("user_id", "event_type"), name, output_mode="append"
    )
    try:
        out = spark.table(name).orderBy("user_id", "event_type")
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        q.stop()


STREAM_JOIN_ORACLE = """
WITH t AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
SELECT a.event_id AS l_event_id, b.event_id AS r_event_id
FROM t a JOIN t b
  ON a.user_id = b.user_id
 AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
 AND a.event_id <> b.event_id
ORDER BY l_event_id, r_event_id
"""


@golden(
    "streaming_interval_join_pairs",
    STREAM_JOIN_ORACLE,
    tags=("streaming", "join", "interval", "events"),
)
def streaming_interval_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval self-join on the real engine: two
    independent readStream sources joined on user_id with the right event
    inside [l.ts, l.ts + 30 min] — the watermark + two-sided time bound
    is what keeps join state bounded at ~rate x (watermark + within) on a
    live stream. As with streaming_dedup_keys, a beyond-fixture watermark
    makes the finite replay EXACT (no cross-micro-batch state loss), so
    the pair set hash-matches the batch SQL join oracle."""
    import uuid

    from mr_dice_spark.streaming.joins import stream_stream_interval_join
    from mr_dice_spark.streaming.windows import read_events_stream, run_stream_to_memory

    _utc(spark)
    name = f"stream_ssjoin_{uuid.uuid4().hex[:8]}"
    left = read_events_stream(spark, f"{sf_dir}/events.parquet")
    right = read_events_stream(spark, f"{sf_dir}/events.parquet")
    j = stream_stream_interval_join(
        left, right, key="user_id", within="30 minutes", watermark="3650 days"
    )
    pairs = j.where(F.col("l.event_id") != F.col("r.event_id")).select(
        F.col("l.event_id").alias("l_event_id"),
        F.col("r.event_id").alias("r_event_id"),
    )
    q = run_stream_to_memory(pairs, name, output_mode="append")
    try:
        out = spark.table(name).orderBy("l_event_id", "r_event_id")
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        q.stop()


STREAM_EMA_ORACLE = """
WITH RECURSIVE ord AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
  FROM events
),
-- the recurrence ema_k = 0.3*v_k + 0.7*ema_{k-1} evaluated STEP BY STEP,
-- the same IEEE double operations in the same order as the operator's
-- Python loop (0.7 here equals the double 1.0 - 0.3 computes to), so the
-- comparison is bit-exact before the presentation rounding
e(user_id, rn, ema) AS (
  SELECT user_id, rn, value FROM ord WHERE rn = 1
  UNION ALL
  SELECT o.user_id, o.rn, 0.3 * o.value + 0.7 * e.ema
  FROM e JOIN ord o ON o.user_id = e.user_id AND o.rn = e.rn + 1
),
fin AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events, max(ts) AS last_ts
  FROM ord GROUP BY user_id
)
SELECT f.user_id, f.n_events, ROUND(1e-9 + e.ema, 6) AS ema, f.last_ts
FROM fin f JOIN e ON e.user_id = f.user_id AND e.rn = f.n_events
ORDER BY f.user_id
"""


@golden(
    "streaming_user_value_ema",
    STREAM_EMA_ORACLE,
    tags=("streaming", "stateful", "ema", "events"),
)
def streaming_user_value_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The applyInPandasWithState custom stateful operator on the REAL
    streaming engine, with FULL oracle parity: per-user EMA of value
    (alpha=0.3) via readStream → update-mode state → memory sink, taking
    the LAST emitted row per user (n_events grows monotonically, so it is
    the per-user argmax). An EMA has no window/watermark rewrite — it is
    exactly the operator class applyInPandasWithState exists for — and
    is order-SENSITIVE, so the oracle restates the recurrence step by
    step (DuckDB recursive CTE) rather than as a closed-form sum whose
    float accumulation order would differ. Exactness across a replay
    relies on the file source's file-granularity batching: batches never
    split a file, so per-user ts order across micro-batches is the global
    ts order ((user_id, ts) is unique in the fixture — no tie ambiguity)."""
    import uuid

    from mr_dice_spark.streaming.stateful import user_value_ema
    from mr_dice_spark.streaming.windows import read_events_stream, run_stream_to_memory

    _utc(spark)
    name = f"stream_ema_{uuid.uuid4().hex[:8]}"
    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    q = run_stream_to_memory(
        user_value_ema(stream, alpha=0.3, watermark="3650 days"),
        name,
        output_mode="update",
    )
    try:
        w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
        out = (
            spark.table(name)
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select(
                "user_id",
                "n_events",
                _r(F.col("ema"), 6).alias("ema"),
                "last_ts",
            )
            .orderBy("user_id")
        )
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        q.stop()


STREAM_ENRICH_ORACLE = """
SELECT epoch_ms(date_trunc('hour', CAST(e.ts AS TIMESTAMP))) AS window_start_ms,
       c.c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(1e-9 + AVG(e.value), 4) AS avg_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
ORDER BY 1, 2
"""


@golden(
    "streaming_static_enrichment",
    STREAM_ENRICH_ORACLE,
    tags=("streaming", "join", "enrichment", "events"),
)
def streaming_static_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC enrichment on the real engine: readStream events
    joined to the batch customer dimension (broadcast — the static side
    of a stream-static join never keeps state) then a watermarked hourly
    window aggregate per market segment, complete-mode memory sink. This
    is the serving-pipeline shape (enrich each event with dimension
    attributes as it arrives); the static side re-reads per micro-batch
    by contract, so dimension updates between batches are picked up.
    Finite replay + beyond-fixture watermark -> exact SQL-oracle parity,
    like the other streaming goldens."""
    import uuid

    from mr_dice_spark.streaming.windows import read_events_stream, run_stream_to_memory

    _utc(spark)
    name = f"stream_enrich_{uuid.uuid4().hex[:8]}"
    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    dim = Catalog(spark, sf_dir).customer.select(
        F.col("c_custkey"), F.col("c_mktsegment")
    )
    enriched = stream.withWatermark("ts", "3650 days").join(
        F.broadcast(dim), stream["user_id"] == dim["c_custkey"]
    )
    agg = (
        enriched.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("c_mktsegment").alias("segment")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.avg("value").alias("avg_value"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "segment",
            "n_events",
            _r(F.col("avg_value"), 4).alias("avg_value"),
        )
    )
    q = run_stream_to_memory(agg, name, output_mode="complete")
    try:
        out = spark.table(name).orderBy("window_start_ms", "segment")
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        q.stop()


@golden(
    "streaming_upsert_snapshot",
    CDC_ORACLE,
    tags=("streaming", "cdc", "upsert", "sink", "events"),
)
def streaming_upsert_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The foreachBatch CDC upsert SINK with full oracle parity: the
    events change stream drains through stream_upsert_to_snapshot
    (per-batch read-CURRENT → union → latest-wins merge → immutable
    snap_* write → atomic pointer flip) into a fresh store, and the
    golden returns what a READER then sees via read_snapshot — the same
    last-writer-wins snapshot the batch CDC oracle states. Exercises the
    whole commit protocol (staging rename, pointer publish, replay
    idempotency machinery) on the real engine, not just the merge
    expression."""
    import shutil
    import tempfile

    from mr_dice_spark.streaming.upsert import read_snapshot, stream_upsert_to_snapshot
    from mr_dice_spark.streaming.windows import read_events_stream

    _utc(spark)
    root = tempfile.mkdtemp(prefix="upsert_golden_")
    try:
        stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
        q = stream_upsert_to_snapshot(
            stream,
            path=f"{root}/store",
            keys=["user_id"],
            version_col="ts",
            checkpoint=f"{root}/ckpt",
            tiebreakers=["event_id"],
        )
        q.awaitTermination(300)
        q.stop()
        snap = read_snapshot(spark, f"{root}/store")
        out = snap.select(
            "user_id", "event_id", "event_type",
            _r("value", 2).alias("value"),
            F.unix_millis("ts").alias("ts_ms"),
        ).orderBy("user_id")
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


WEIGHTED_SAMPLE_ORACLE = """
SELECT doc_id, lang, n_chars
FROM (
  SELECT doc_id, lang, n_chars,
         POW((CAST(('0x' || substring(md5('wsamp/' || CAST(doc_id AS VARCHAR)), 1, 8))
                   AS BIGINT) + 0.5) / 4294967296.0,
             1.0 / n_chars) AS r
  FROM documents
  WHERE n_chars IS NOT NULL AND n_chars > 0
)
ORDER BY r DESC, doc_id
LIMIT 100
"""


@golden(
    "weighted_sample_by_length",
    WEIGHTED_SAMPLE_ORACLE,
    tags=("sampling", "weighted", "deterministic"),
)
def weighted_sample_by_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis A-Res):
    100 documents drawn with probability proportional to length — the
    'sample by token mass, not by row' primitive of corpus subsetting.
    r = u^(1/w) with u from the portable key hash, so the oracle
    restates the draw EXACTLY (same md5 + pow arithmetic) and the whole
    selection is hash-checked; the Spark plan is a narrow projection
    into TakeOrderedAndProject, never a full sort."""
    from mr_dice_spark.operators.sampling import weighted_sample_without_replacement

    docs = Catalog(spark, sf_dir).documents
    out = weighted_sample_without_replacement(
        docs, "doc_id", "n_chars", 100, seed="wsamp/"
    )
    return out.select("doc_id", "lang", "n_chars")


def _kmeans_oracle(k: int = 4, sweeps: int = 2, dim: int = 64, tail: str | None = None) -> str:
    """Unrolled Lloyd's loop as chained CTEs (the PageRank strategy:
    fixed sweeps, deterministic init, quantized interim state — the only
    way an iterative algorithm is SQL-restatable). list_reduce is the
    left-to-right fold matching Spark's ``aggregate``."""
    sq = (
        "list_reduce(list_transform(range(1, {d1}), "
        "i -> (v.e[i] - c.e[i]) * (v.e[i] - c.e[i])), "
        "(a, b) -> a + b)"
    ).format(d1=dim + 1)
    parts = [
        "WITH v AS (",
        "  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e",
        "  FROM embeddings WHERE embedding IS NOT NULL",
        "),",
        "c0 AS (",
        "  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS j, e",
        f"  FROM v ORDER BY vec_id LIMIT {k}",
        "),",
    ]
    for s in range(1, sweeps + 1):
        prev = f"c{s - 1}"
        parts += [
            f"d{s} AS (",
            f"  SELECT v.vec_id, v.e, c.j, {sq} AS dist",
            f"  FROM v CROSS JOIN {prev} c",
            "),",
            f"a{s} AS (",
            "  SELECT vec_id, e, j AS cl FROM (",
            "    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, j) AS rn",
            f"    FROM d{s}) WHERE rn = 1",
            "),",
            f"m{s} AS (",
            "  SELECT cl, i, ROUND(1e-9 + AVG(e[CAST(i AS INT)]), 4) AS m",
            f"  FROM a{s}, range(1, {dim + 1}) t(i) GROUP BY cl, i",
            "),",
            f"c{s} AS (",
            f"  SELECT {prev}.j, COALESCE(mm.lst, {prev}.e) AS e",
            f"  FROM {prev} LEFT JOIN (",
            f"    SELECT cl, list(m ORDER BY i) AS lst FROM m{s} GROUP BY cl",
            f"  ) mm ON mm.cl = {prev}.j",
            "),",
        ]
    parts += [
        "fin AS (",
        f"  SELECT v.vec_id, c.j, {sq} AS dist",
        f"  FROM v CROSS JOIN c{sweeps} c",
        "),",
        "assign AS (",
        "  SELECT vec_id, CAST(j AS INT) AS cluster,",
        "         ROUND(1e-9 + dist, 6) AS dist",
        "  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, j) AS rn",
        "        FROM fin) WHERE rn = 1",
        ")",
    ]
    if tail is None:
        tail = "SELECT vec_id, cluster, dist FROM assign ORDER BY vec_id"
    return "\n".join(parts) + "\n" + tail


@golden(
    "kmeans_embedding_clusters",
    _kmeans_oracle(),
    tags=("clustering", "kmeans", "iterative", "embeddings"),
)
def kmeans_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Lloyd's k-means (k=4, two sweeps) over the
    embeddings table — the clustering pass under SemDeDup partitioning
    and IVF index builds, hash-checked end to end against an unrolled
    CTE oracle: lowest-id init, lowest-index tiebreak, per-sweep
    centroids quantized to 4 decimals so both engines iterate from
    bit-identical state (see operators/clustering.py). Per sweep the
    Spark side is one literal-broadcast assignment map plus one
    (cluster, dim) aggregate — k*dim driver bytes, linear scans, no
    pair joins."""
    from mr_dice_spark.operators.clustering import kmeans_assign

    emb = Catalog(spark, sf_dir).embeddings
    out = kmeans_assign(emb, "vec_id", "embedding", k=4, sweeps=2)
    return out.orderBy("vec_id")


BLOOM_PRESCREEN_ORACLE = """
WITH words AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_distinct(list_transform(
             range(1, greatest(len(w) - 1, 1)),
             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS shingle
  FROM words WHERE len(w) >= 3
),
probe AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 17 = 0),
pbits AS (
  SELECT DISTINCT
         (CAST(('0x' || substring(md5('bloom/' || shingle), 1, 8)) AS BIGINT)
          + t.i * CAST(('0x' || substring(md5('bloom/' || shingle), 9, 8)) AS BIGINT))
         % 262144 AS pos
  FROM probe, range(0, 3) t(i)
),
csh AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 17 <> 0),
cpos AS (
  SELECT DISTINCT doc_id, shingle,
         (CAST(('0x' || substring(md5('bloom/' || shingle), 1, 8)) AS BIGINT)
          + t.i * CAST(('0x' || substring(md5('bloom/' || shingle), 9, 8)) AS BIGINT))
         % 262144 AS pos
  FROM csh, range(0, 3) t(i)
),
gram_pass AS (
  SELECT c.doc_id, c.shingle
  FROM cpos c LEFT JOIN pbits b ON b.pos = c.pos
  GROUP BY c.doc_id, c.shingle
  HAVING COUNT(b.pos) = COUNT(*)
),
maybe AS (SELECT doc_id, COUNT(*) AS n_maybe FROM gram_pass GROUP BY doc_id),
exact AS (
  SELECT s.doc_id, COUNT(*) AS n_shared
  FROM csh s JOIN probe p USING (shingle) GROUP BY s.doc_id
),
corpus_ids AS (SELECT doc_id FROM documents WHERE doc_id % 17 <> 0),
cnt AS (
  SELECT c.doc_id, COUNT(s.shingle) AS n_grams
  FROM corpus_ids c LEFT JOIN sh s USING (doc_id)
  GROUP BY c.doc_id
)
SELECT c.doc_id,
       c.n_grams,
       COALESCE(m.n_maybe, 0) AS n_maybe_shared,
       COALESCE(e.n_shared, 0) AS n_shared,
       COALESCE(m.n_maybe, 0) > 0 AS prescreen_hit,
       COALESCE(m.n_maybe, 0) > 0 AND COALESCE(e.n_shared, 0) = 0 AS false_positive
FROM cnt c
LEFT JOIN maybe m USING (doc_id)
LEFT JOIN exact e USING (doc_id)
ORDER BY c.doc_id
"""


@golden(
    "bloom_decontamination_prescreen",
    BLOOM_PRESCREEN_ORACLE,
    tags=("text", "decontaminate", "bloom", "prescreen"),
)
def bloom_decontamination_prescreen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom prescreen next to the exact check, as one audit: every 17th
    document plays the probe set; the operator compresses its grams to a
    2^18-bit double-hashed Bloom set, broadcasts ONLY the set bits
    (fixed KBs at any probe scale — the regime where even the shuffled
    exact join is worth gating), and flags corpus docs with >= 1
    maybe-shared gram. The output carries the exact n_shared beside
    n_maybe_shared, so the hash check proves BOTH the bit arithmetic
    (oracle recomputes every md5 double-hash position) and the
    no-false-negative guarantee in-data (n_maybe_shared >= n_shared on
    every row; false_positive marks the FPR the prescreen trades for
    its fixed size)."""
    from mr_dice_spark.operators.decontaminate import (
        bloom_prescreen_stats,
        contamination_stats,
    )

    docs = Catalog(spark, sf_dir).documents
    probe = docs.where(F.col("doc_id") % 17 == 0)
    corpus = docs.where(F.col("doc_id") % 17 != 0)
    pre = bloom_prescreen_stats(
        corpus, "doc_id", "text", probe, "text", n=3, m=1 << 18, k=3
    )
    exact = contamination_stats(
        corpus, "doc_id", "text", probe, "text", n=3
    ).select("doc_id", "n_shared")
    return (
        pre.join(exact, "doc_id")
        .select(
            "doc_id",
            "n_grams",
            "n_maybe_shared",
            "n_shared",
            "prescreen_hit",
            (F.col("prescreen_hit") & (F.col("n_shared") == 0)).alias(
                "false_positive"
            ),
        )
        .orderBy("doc_id")
    )


HARD_NEGATIVE_ORACLE = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv, label AS qlabel
  FROM embeddings WHERE vec_id < 5
),
scored AS (
  SELECT q.query_id, e.vec_id, e.label AS neg_label,
         ROUND(1e-9 + list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6)
           AS cosine
  FROM embeddings e CROSS JOIN q
  WHERE e.label IS NOT NULL AND q.qlabel IS NOT NULL AND e.label <> q.qlabel
)
SELECT query_id, vec_id, neg_label, cosine
FROM (
  SELECT query_id, vec_id, neg_label, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id) AS rn
  FROM scored
)
WHERE rn <= 5
ORDER BY query_id, cosine DESC, vec_id
"""


@golden(
    "hard_negative_mining_labels",
    HARD_NEGATIVE_ORACLE,
    tags=("similarity", "contrastive", "mining", "embeddings"),
)
def hard_negative_mining_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: the 5 lowest-id
    embeddings play the query batch; each gets its top-5 most-similar
    OTHER-label corpus vectors — the confusable wrong answers. Scores
    rank on the rounded grid (cosine_topk_batch's cross-engine boundary
    rule); one corpus scan, broadcast queries, label predicate before
    the WindowGroupLimit rank."""
    from mr_dice_spark.operators.similarity import hard_negative_mining

    emb = Catalog(spark, sf_dir).embeddings
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding", "label"
    )
    out = hard_negative_mining(
        emb, "vec_id", "embedding", "label",
        queries, "query_id", "embedding", "label",
        k=5, round_scores=6,
    )
    return out.orderBy("query_id", F.desc("cosine"), "vec_id")


LENGTH_BATCH_ORACLE = r"""
WITH t AS (
  SELECT doc_id, n_chars AS n_tokens,
         CASE WHEN n_chars <= 100 THEN 0
              WHEN n_chars <= 200 THEN 1
              WHEN n_chars <= 400 THEN 2
              ELSE 3 END AS bucket
  FROM documents WHERE n_chars IS NOT NULL AND n_chars >= 0
),
r AS (
  SELECT doc_id, n_tokens, bucket,
         ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY n_tokens, doc_id) AS rn
  FROM t
),
b AS (
  SELECT doc_id, n_tokens, bucket,
         CAST((rn - 1) // 16 AS INT) AS batch_in_bucket,
         CAST((rn - 1) % 16 AS INT) AS pos_in_batch
  FROM r
)
SELECT doc_id, n_tokens, bucket, batch_in_bucket, pos_in_batch,
       MAX(n_tokens) OVER (PARTITION BY bucket, batch_in_bucket) AS batch_max_tokens,
       MAX(n_tokens) OVER (PARTITION BY bucket, batch_in_bucket) - n_tokens
         AS padding_tokens
FROM b
ORDER BY doc_id
"""


@golden(
    "length_bucketed_batches_docs",
    LENGTH_BATCH_ORACLE,
    tags=("packing", "batching", "inference", "padding"),
)
def length_bucketed_batches_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-minimizing inference batches over documents: length
    buckets at 100/200/400 chars (+ overflow), batch_size=16,
    within-bucket (length, id) order so each batch's padding cost is
    bounded by the bucket width. The oracle restates the bucket CASE,
    both windows and the padding arithmetic; the per-row
    padding_tokens column makes any batching drift flip the hash."""
    from mr_dice_spark.operators.packing import length_bucketed_batches

    docs = Catalog(spark, sf_dir).documents
    out = length_bucketed_batches(
        docs, "doc_id", "n_chars", bucket_edges=[100, 200, 400], batch_size=16
    )
    return out.orderBy("doc_id")


STREAM_QUARANTINE_ORACLE = """
SELECT event_id,
       CASE WHEN event_id % 13 = 0 THEN 'quarantined' ELSE 'good' END AS status,
       CASE WHEN event_id % 13 = 0 THEN NULL ELSE event_type END AS event_type,
       CASE WHEN event_id % 13 = 0 THEN NULL ELSE value END AS value
FROM events
ORDER BY event_id
"""


@golden(
    "streaming_quarantine_ingest",
    STREAM_QUARANTINE_ORACLE,
    tags=("streaming", "source", "ingest", "quarantine"),
)
def streaming_quarantine_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quarantine parse/split on the REAL streaming engine: a
    JSON-lines feed (derived in-flight from the events stream, every
    13th event_id truncated mid-value) goes through the SAME
    parse_with_quarantine core the batch reader uses — pure column
    expressions, so it lifts to a readStream frame unchanged, which is
    the point of factoring the split off the path-based reader. Good and
    quarantined rows union into one append-mode memory sink (one stream,
    one sink); quarantined rows recover their key from the raw corrupt
    record. Full oracle parity: finite replay makes the streamed result
    equal the batch restatement."""
    import uuid

    from mr_dice_spark.sources.registry import parse_with_quarantine
    from mr_dice_spark.streaming.windows import read_events_stream, run_stream_to_memory

    _utc(spark)
    name = f"stream_quar_{uuid.uuid4().hex[:8]}"
    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    line = F.when(
        F.col("event_id") % 13 == 0,
        F.concat(
            F.lit('{"event_id":'),
            F.col("event_id").cast("string"),
            F.lit(',"value":#BAD'),
        ),
    ).otherwise(F.to_json(F.struct("event_id", "event_type", "value")))
    raw = stream.select(line.alias("value"))
    good, bad = parse_with_quarantine(
        raw, "event_id bigint, event_type string, value double", "json"
    )
    good_rows = good.select(
        "event_id", F.lit("good").alias("status"), "event_type", "value"
    )
    bad_rows = bad.select(
        F.regexp_extract(F.col("_corrupt_record"), r'"event_id":(\d+)', 1)
        .cast("bigint")
        .alias("event_id"),
        F.lit("quarantined").alias("status"),
        F.lit(None).cast("string").alias("event_type"),
        F.lit(None).cast("double").alias("value"),
    )
    q = run_stream_to_memory(
        good_rows.unionByName(bad_rows), name, output_mode="append"
    )
    try:
        out = spark.table(name).orderBy("event_id")
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        q.stop()


_CLUSTER_SAMPLE_TAIL = """
SELECT vec_id, cluster FROM (
  SELECT vec_id, cluster,
         ROW_NUMBER() OVER (
           PARTITION BY cluster
           ORDER BY CAST(('0x' || substring(md5('cbal/' || CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT),
                    vec_id
         ) AS srn
  FROM assign
)
WHERE srn <= 25
ORDER BY cluster, vec_id
"""


@golden(
    "cluster_balanced_subsample",
    _kmeans_oracle(tail=_CLUSTER_SAMPLE_TAIL),
    tags=("clustering", "sampling", "composed", "embeddings"),
)
def cluster_balanced_subsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPOSED pipeline: Lloyd's k-means (k=4, two sweeps) feeds an
    exact per-cluster stratified sample (25 vectors per cluster by
    portable hash order) — the diversity-preserving subsetting step
    (cluster-balanced sampling) that keeps a downsampled corpus from
    collapsing onto its dominant mode. One oracle restates the WHOLE
    chain: the unrolled k-means CTEs plus the hash-rank selection, so
    an assignment drift ANYWHERE upstream flips the sampled ids."""
    from mr_dice_spark.operators.clustering import kmeans_assign
    from mr_dice_spark.operators.sampling import stratified_sample_exact

    emb = Catalog(spark, sf_dir).embeddings
    assigned = kmeans_assign(emb, "vec_id", "embedding", k=4, sweeps=2)
    out = stratified_sample_exact(
        assigned.select("vec_id", "cluster"), ["cluster"], 25, "vec_id",
        seed="cbal/",
    )
    return out.select("vec_id", "cluster").orderBy("cluster", "vec_id")


# ---------------------------------------------------------------------------
# seasonality scan: lagged autocorrelation over the bucketed series
# ---------------------------------------------------------------------------

AUTOCORR_ORACLE = """
WITH b AS (
  SELECT event_type AS k,
         to_timestamp(CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) * 3600) AS h,
         AVG(value) AS v
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
l AS (
  SELECT k, v,
         LAG(v, 1)  OVER (PARTITION BY k ORDER BY h) AS v1,
         LAG(v, 24) OVER (PARTITION BY k ORDER BY h) AS v24
  FROM b
),
a AS (
  SELECT k,
         corr(v, v1) AS r1,   COUNT(v1) AS n1,
         corr(v, v24) AS r24, COUNT(v24) AS n24
  FROM l GROUP BY k
)
SELECT k AS event_type, lag, CAST(n AS BIGINT) AS n,
       ROUND(1e-9 + r, 6) AS autocorr
FROM (
  SELECT k, 1 AS lag, n1 AS n, r1 AS r FROM a
  UNION ALL
  SELECT k, 24, n24, r24 FROM a
)
ORDER BY event_type, lag
"""


@golden(
    "autocorr_value_by_event_type",
    AUTOCORR_ORACLE,
    tags=("timeseries", "autocorrelation", "window", "events"),
)
def autocorr_value_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality scan: per-event-type Pearson autocorrelation of the
    hourly value series at lag 1 (momentum) and lag 24 (daily cycle) —
    the screening statistic before any heavier periodicity model. One
    bucket aggregate, one key-shuffle window (both lag columns share the
    sort), one moment aggregate per key; the oracle restates the same
    bucket/lag/corr chain, and both engines' co-moment noise sits ~8
    orders below the 6-digit rounding."""
    from mr_dice_spark.operators.timeseries import autocorrelation_by_lag

    _utc(spark)
    ev = Catalog(spark, sf_dir).events
    out = autocorrelation_by_lag(
        ev, "event_type", "ts", "value", lags=[1, 24], step_seconds=3600
    )
    return out.select(
        "event_type", "lag", "n", _r("autocorr", 6).alias("autocorr")
    ).orderBy("event_type", "lag")


# ---------------------------------------------------------------------------
# per-user behavioral entropy (categorical diversity)
# ---------------------------------------------------------------------------

ENTROPY_ORACLE = """
WITH cells AS (
  SELECT user_id, event_type, COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
agg AS (
  SELECT user_id, SUM(c) AS n, COUNT(*) AS n_cats,
         SUM(c * LN(CAST(c AS DOUBLE))) AS clnc
  FROM cells GROUP BY user_id
)
SELECT user_id, CAST(n AS BIGINT) AS n, CAST(n_cats AS BIGINT) AS n_cats,
       ROUND(1e-9 + LN(CAST(n AS DOUBLE)) - clnc / CAST(n AS DOUBLE), 6)
         AS entropy
FROM agg
ORDER BY user_id
"""


@golden(
    "user_event_entropy",
    ENTROPY_ORACLE,
    tags=("profile", "entropy", "agg", "events"),
)
def user_event_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Shannon entropy of the event-type mix — the behavioral
    diversity signal that separates bots (one repeated action, entropy
    0) from engaged users (entropy toward ln 5). Stated as
    ln(n) - Σ c·ln(c)/n over exact integer counts in BOTH engines, so
    the FP surface is just the closing ln/divide under the 6-digit
    rounding. Two chained hash aggregates — the any-scale shape."""
    from mr_dice_spark.operators.profile import category_entropy

    ev = Catalog(spark, sf_dir).events
    out = category_entropy(ev, "user_id", "event_type")
    return out.select(
        "user_id", "n", "n_cats", _r("entropy", 6).alias("entropy")
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# Zipf slope of the term-frequency distribution (corpus health check)
# ---------------------------------------------------------------------------

ZIPF_ORACLE = """
WITH t AS (
  SELECT u.g AS term, COUNT(*) AS c
  FROM documents,
       UNNEST(string_split_regex(lower(COALESCE(text, '')), '[^a-z]+')) AS u(g)
  WHERE u.g <> ''
  GROUP BY 1
),
top AS (SELECT term, c FROM t ORDER BY c DESC, term LIMIT 500),
r AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, term) AS rk FROM top
),
s AS (
  SELECT LN(CAST(rk AS DOUBLE)) AS x, LN(CAST(c AS DOUBLE)) AS y FROM r
),
a AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
  FROM s
)
SELECT CAST(n AS BIGINT) AS n,
       ROUND(1e-9 + (n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       ROUND(1e-9 + (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
                    / n, 6) AS intercept,
       ROUND(1e-9 + ((n * sxy - sx * sy) * (n * sxy - sx * sy))
                    / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM a
"""


@golden(
    "zipf_slope_documents",
    ZIPF_ORACLE,
    tags=("text", "zipf", "ols", "profile", "documents"),
)
def zipf_slope_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf fit of the corpus term-frequency distribution: log-log OLS of
    frequency against rank over the top 500 terms — natural text sits
    near slope -1; machine-generated or templated corpora bend away, so
    the slope is a one-number corpus-health check. Ranking is
    TakeOrderedAndProject to 500 rows FIRST (never a global rank
    window), then the row_number runs on the bounded finisher; the fit
    reuses group_ols_trend's closed-form moment aggregate. The oracle
    restates tokenize -> count -> top-500 (same count-desc/term
    tiebreak) -> ln/ln -> moments. On this driver corpus the check
    WORKS AS INTENDED: the synthetic documents hold only 31 distinct
    terms with near-uniform frequencies, and the fit (slope ~ -0.18,
    r2 ~ 0.05, vs natural text's slope ~ -1 at high r2) flags exactly
    that templated shape."""
    from mr_dice_spark.operators.timeseries import group_ols_trend

    docs = Catalog(spark, sf_dir).documents
    counts = (
        docs.select(
            F.explode(
                F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), "[^a-z]+")
            ).alias("term")
        )
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = counts.orderBy(F.col("c").desc(), F.col("term")).limit(500)
    w = Window.orderBy(F.col("c").desc(), F.col("term"))
    ranked = top.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
    )
    return group_ols_trend(ranked, [], "x", "y")


# ---------------------------------------------------------------------------
# referential-integrity audit across the TPC-H foreign keys
# ---------------------------------------------------------------------------

RI_AUDIT_ORACLE = """
SELECT 'orders.custkey->customer' AS relationship,
       (SELECT COUNT(*) FROM orders) AS n_rows,
       (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL) AS n_null_fk,
       (SELECT COUNT(*) FROM orders o WHERE o_custkey IS NOT NULL
        AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
         AS n_orphans
UNION ALL
SELECT 'lineitem.orderkey->orders',
       (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NULL),
       (SELECT COUNT(*) FROM lineitem l WHERE l_orderkey IS NOT NULL
        AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
UNION ALL
SELECT 'lineitem.partkey->part',
       (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM lineitem WHERE l_partkey IS NULL),
       (SELECT COUNT(*) FROM lineitem l WHERE l_partkey IS NOT NULL
        AND NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
UNION ALL
SELECT 'lineitem.suppkey->supplier',
       (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM lineitem WHERE l_suppkey IS NULL),
       (SELECT COUNT(*) FROM lineitem l WHERE l_suppkey IS NOT NULL
        AND NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
UNION ALL
SELECT 'customer.nationkey->nation',
       (SELECT COUNT(*) FROM customer),
       (SELECT COUNT(*) FROM customer WHERE c_nationkey IS NULL),
       (SELECT COUNT(*) FROM customer c WHERE c_nationkey IS NOT NULL
        AND NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
UNION ALL
SELECT 'nation.regionkey->region',
       (SELECT COUNT(*) FROM nation),
       (SELECT COUNT(*) FROM nation WHERE n_regionkey IS NULL),
       (SELECT COUNT(*) FROM nation n WHERE n_regionkey IS NOT NULL
        AND NOT EXISTS (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey))
ORDER BY relationship
"""


@golden(
    "referential_integrity_audit",
    RI_AUDIT_ORACLE,
    tags=("profile", "quality", "join", "audit"),
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-wide FK orphan audit: every TPC-H foreign-key edge gets a
    (rows, NULL keys, orphans) row via one child aggregate plus one
    anti join — the post-ingest QA gate that catches a broken upstream
    export before downstream joins silently drop rows. An all-zero
    orphan column on this fixture is the PASSING result the audit
    exists to prove; the operator's orphan path is separately
    unit-tested with planted breaks."""
    from mr_dice_spark.operators.profile import fk_orphan_audit

    t = Catalog(spark, sf_dir)
    edges = [
        (t.orders, "o_custkey", t.customer, "c_custkey", "orders.custkey->customer"),
        (t.lineitem, "l_orderkey", t.orders, "o_orderkey", "lineitem.orderkey->orders"),
        (t.lineitem, "l_partkey", t.part, "p_partkey", "lineitem.partkey->part"),
        (t.lineitem, "l_suppkey", t.supplier, "s_suppkey", "lineitem.suppkey->supplier"),
        (t.customer, "c_nationkey", t.nation, "n_nationkey", "customer.nationkey->nation"),
        (t.nation, "n_regionkey", t.region, "r_regionkey", "nation.regionkey->region"),
    ]
    out = None
    for child, fk, parent, pk, name in edges:
        row = fk_orphan_audit(child, fk, parent, pk, name)
        out = row if out is None else out.unionByName(row)
    return out.orderBy("relationship")


# ---------------------------------------------------------------------------
# mutual information (association / leakage detector)
# ---------------------------------------------------------------------------

MI_ORACLE = """
WITH base AS (
  SELECT event_type AS x, user_id % 4 AS y FROM events
  WHERE event_type IS NOT NULL AND user_id IS NOT NULL
),
cells AS (SELECT x, y, COUNT(*) AS c FROM base GROUP BY 1, 2),
mx AS (SELECT x, SUM(c) AS cx FROM cells GROUP BY x),
my AS (SELECT y, SUM(c) AS cy FROM cells GROUP BY y),
tot AS (SELECT SUM(c) AS n FROM cells),
mi AS (
  SELECT MAX(t.n) AS n,
         SUM((c.c / CAST(t.n AS DOUBLE))
             * LN(c.c * CAST(t.n AS DOUBLE) / (mx.cx * CAST(my.cy AS DOUBLE))))
           AS mi
  FROM cells c JOIN mx ON mx.x = c.x JOIN my ON my.y = c.y, tot t
),
hx AS (SELECT LN(MAX(t.n)) - SUM(cx * LN(CAST(cx AS DOUBLE))) / MAX(t.n) AS hx
       FROM mx, tot t),
hy AS (SELECT LN(MAX(t.n)) - SUM(cy * LN(CAST(cy AS DOUBLE))) / MAX(t.n) AS hy
       FROM my, tot t)
SELECT CAST(mi.n AS BIGINT) AS n,
       ROUND(1e-9 + mi.mi, 6) AS mi,
       ROUND(1e-9 + CASE WHEN LEAST(hx.hx, hy.hy) > 0
                         THEN mi.mi / LEAST(hx.hx, hy.hy) END, 6) AS nmi
FROM mi, hx, hy
"""


UNCERTAINTY_ORACLE = """
WITH base AS (
  SELECT event_type AS x,
         (CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) % 7) AS y
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
),
cells AS (SELECT x, y, COUNT(*) AS c FROM base GROUP BY 1, 2),
mx AS (SELECT x, SUM(c) AS cx FROM cells GROUP BY x),
my AS (SELECT y, SUM(c) AS cy FROM cells GROUP BY y),
tot AS (SELECT SUM(c) AS n FROM cells),
mi AS (
  SELECT MAX(t.n) AS n,
         SUM((c.c / CAST(t.n AS DOUBLE))
             * LN(c.c * CAST(t.n AS DOUBLE) / (mx.cx * CAST(my.cy AS DOUBLE))))
           AS mi
  FROM cells c JOIN mx ON mx.x = c.x JOIN my ON my.y = c.y, tot t
),
hx AS (SELECT LN(MAX(t.n)) - SUM(cx * LN(CAST(cx AS DOUBLE))) / MAX(t.n) AS hx
       FROM mx, tot t),
hy AS (SELECT LN(MAX(t.n)) - SUM(cy * LN(CAST(cy AS DOUBLE))) / MAX(t.n) AS hy
       FROM my, tot t)
SELECT CAST(mi.n AS BIGINT) AS n,
       ROUND(1e-9 + mi.mi, 6) AS mi,
       ROUND(1e-9 + hx.hx, 6) AS h_x,
       ROUND(1e-9 + hy.hy, 6) AS h_y,
       ROUND(1e-9 + CASE WHEN hx.hx > 0 THEN mi.mi / hx.hx END, 6)
         AS u_x_given_y,
       ROUND(1e-9 + CASE WHEN hy.hy > 0 THEN mi.mi / hy.hy END, 6)
         AS u_y_given_x,
       ROUND(1e-9 + 2.0 * CAST(mi.n AS DOUBLE) * mi.mi, 4) AS g
FROM mi, hx, hy
"""


@golden(
    "uncertainty_coeffs_type_weekday",
    UNCERTAINTY_ORACLE,
    tags=("profile", "information", "theil-u", "g-test", "events"),
)
def uncertainty_coeffs_type_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil's U both directions plus Dunning's G independence
    statistic for event type x weekday — the directional and
    inferential completions of the association triad on the SAME
    contingency the chi-square golden reads, so an analyst sees all
    three views of one table. U is asymmetric by design (which column
    explains which); G = 2*N*MI is the log-likelihood independence
    test that stays honest on sparse cells."""
    from mr_dice_spark.operators.profile import uncertainty_coefficients

    _utc(spark)
    ev = Catalog(spark, sf_dir).events.where(
        F.col("event_type").isNotNull() & F.col("ts").isNotNull()
    ).select(
        "event_type",
        (F.floor(F.unix_timestamp("ts") / 86400).cast("long") % 7).alias(
            "weekday"
        ),
    )
    out = uncertainty_coefficients(ev, "event_type", "weekday")
    return out.select(
        "n",
        _r("mi", 6).alias("mi"),
        _r("h_x", 6).alias("h_x"),
        _r("h_y", 6).alias("h_y"),
        _r("u_x_given_y", 6).alias("u_x_given_y"),
        _r("u_y_given_x", 6).alias("u_y_given_x"),
        _r("g", 4).alias("g"),
    )


@golden(
    "mutual_information_type_band",
    MI_ORACLE,
    tags=("profile", "information", "leakage", "events"),
)
def mutual_information_type_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event type and a user band — the
    association/leakage detector (MI(feature, split) far above 0 means
    the feature leaks the split; here the planted answer is ~0, the
    independent case). Exact-count arithmetic on the joint cells and
    marginals, normalized by min-entropy; the corpus is scanned once
    (marginals derive from the cells)."""
    from mr_dice_spark.operators.profile import mutual_information

    ev = Catalog(spark, sf_dir).events.select(
        "event_type", (F.col("user_id") % 4).alias("user_band")
    )
    out = mutual_information(ev, "event_type", "user_band")
    return out.select(
        "n", _r("mi", 6).alias("mi"), _r("nmi", 6).alias("nmi")
    )


# ---------------------------------------------------------------------------
# CUSUM level-shift detection (reflection prefix form, planted shift)
# ---------------------------------------------------------------------------

CUSUM_ORACLE = """
WITH ev AS (
  SELECT event_type, ts,
         CASE WHEN event_type = 'click' AND ts >= TIMESTAMP '2024-01-23'
              THEN value + 15.0 ELSE value END AS value
  FROM events
),
b AS (
  SELECT event_type AS k,
         CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) * 3600 AS h,
         AVG(value) AS v
  FROM ev WHERE value IS NOT NULL GROUP BY 1, 2
),
z AS (
  SELECT k, h, v,
         ROUND(1e-9 + (v - AVG(v) OVER (PARTITION BY k))
               / NULLIF(STDDEV_SAMP(v) OVER (PARTITION BY k), 0), 6) AS z
  FROM b
),
c AS (
  SELECT k, h, v, z,
         SUM(z - 0.5) OVER w AS cp,
         SUM(-z - 0.5) OVER w AS cn
  FROM z
  WINDOW w AS (PARTITION BY k ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
s AS (
  SELECT k, h, v, z,
         cp - LEAST(MIN(cp) OVER w, 0) AS sp,
         cn - LEAST(MIN(cn) OVER w, 0) AS sn
  FROM c
  WINDOW w AS (PARTITION BY k ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT k AS event_type, h AS bucket_s,
       ROUND(1e-9 + v, 6) AS value, z,
       ROUND(1e-9 + sp, 6) AS cusum_pos,
       ROUND(1e-9 + sn, 6) AS cusum_neg,
       (sp > 5.0) OR (sn > 5.0) AS is_shift
FROM s ORDER BY event_type, bucket_s
"""


@golden(
    "cusum_level_shift_hourly",
    CUSUM_ORACLE,
    tags=("timeseries", "drift", "window", "events"),
)
def cusum_level_shift_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM level-shift detection over the hourly click series with a
    PLANTED +15 mean shift from Jan 23 (the PSI-golden strategy: the
    detector must actually fire, not just execute). The recursive
    one-sided CUSUM is restated as prefix sums via the reflection trick
    (S+ = C - min(prefix C, 0)) — two chained running windows on one
    (key, time) exchange, no recursion, no UDF. z is nudge-rounded to
    6 dp BEFORE accumulation so both engines chain the identical
    doubles in the identical window order — the chained-float
    cross-engine contract."""
    from mr_dice_spark.operators.timeseries import cusum_changepoints

    ev = Catalog(spark, sf_dir).events.withColumn(
        "value",
        F.when(
            (F.col("event_type") == "click")
            & (F.col("ts") >= F.lit("2024-01-23").cast("timestamp")),
            F.col("value") + 15.0,
        ).otherwise(F.col("value")),
    )
    out = cusum_changepoints(
        ev, "event_type", "ts", "value",
        step_seconds=3600, k_slack=0.5, h_threshold=5.0,
    )
    return out.select(
        "event_type",
        F.unix_timestamp("bucket").alias("bucket_s"),
        _r("value", 6).alias("value"),
        "z",
        _r("cusum_pos", 6).alias("cusum_pos"),
        _r("cusum_neg", 6).alias("cusum_neg"),
        "is_shift",
    ).orderBy("event_type", "bucket_s")


# ---------------------------------------------------------------------------
# Page-Hinkley sequential drift detection (running-mean form, planted creep)
# ---------------------------------------------------------------------------

PAGE_HINKLEY_ORACLE = """
WITH ev AS (
  SELECT event_type, ts,
         CASE WHEN event_type = 'view' AND ts >= TIMESTAMP '2024-01-16'
              THEN value
                   + 15.0 * (CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) - 19737)
              ELSE value END AS value
  FROM events
),
b AS (
  SELECT event_type AS k,
         CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) * 86400 AS h,
         ROUND(AVG(value) + 1e-9, 6) AS v
  FROM ev WHERE value IS NOT NULL GROUP BY 1, 2
),
rm AS (
  SELECT k, h, v, AVG(v) OVER w AS rmean
  FROM b
  WINDOW w AS (PARTITION BY k ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
t AS (
  SELECT k, h, v,
         ROUND((v - rmean - 15.0) + 1e-9, 6) AS ti,
         ROUND((rmean - v - 15.0) + 1e-9, 6) AS td
  FROM rm
),
c AS (
  SELECT k, h, v, SUM(ti) OVER w AS mi, SUM(td) OVER w AS md
  FROM t
  WINDOW w AS (PARTITION BY k ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
s AS (
  SELECT k, h, v,
         ROUND((mi - LEAST(MIN(mi) OVER w, 0)) + 1e-9, 6) AS gi,
         ROUND((md - LEAST(MIN(md) OVER w, 0)) + 1e-9, 6) AS gd
  FROM c
  WINDOW w AS (PARTITION BY k ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT k AS event_type, h AS bucket_s, v AS value,
       gi AS ph_inc, gd AS ph_dec,
       (gi > 80.0) OR (gd > 80.0) AS is_drift
FROM s ORDER BY event_type, bucket_s
"""


@golden(
    "page_hinkley_drift_daily",
    PAGE_HINKLEY_ORACLE,
    tags=("timeseries", "drift", "sequential", "events"),
)
def page_hinkley_drift_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley sequential drift over the DAILY series with a
    PLANTED linear creep on 'view' from Jan 16 (+15/day — the slow
    drift a per-bucket threshold misses; the detector must actually
    fire, the planted-shift convention of the CUSUM/PSI goldens).
    delta=15/lambda=80 were parameter-probed: 'view' alarms from
    mid-creep at BOTH sf0.001 and sf0.01 while the four stationary
    types raise zero false alarms (daily buckets because hourly means
    at oracle scale carry sd ~150 — pure noise). PH compares each
    bucket to the RUNNING mean — the genuinely sequential statistic —
    restated as running avg + running sum + running min on one (key,
    time) exchange. Bucket means and deviation terms are nudge-rounded
    to 6 BEFORE accumulation (the chained-float cross-engine
    contract)."""
    from mr_dice_spark.operators.timeseries import page_hinkley

    ev = Catalog(spark, sf_dir).events.withColumn(
        "value",
        F.when(
            (F.col("event_type") == "view")
            & (F.col("ts") >= F.lit("2024-01-16").cast("timestamp")),
            F.col("value")
            + 15.0
            * (F.floor(F.unix_timestamp("ts") / 86400).cast("long") - 19737),
        ).otherwise(F.col("value")),
    )
    out = page_hinkley(
        ev, "event_type", "ts", "value",
        step_seconds=86400, delta=15.0, lambda_threshold=80.0,
    )
    return out.select(
        "event_type",
        F.unix_timestamp("bucket").alias("bucket_s"),
        "value",
        "ph_inc",
        "ph_dec",
        "is_drift",
    ).orderBy("event_type", "bucket_s")


# ---------------------------------------------------------------------------
# Classical seasonal decomposition (2x24 MA trend, phase indices, strength)
# ---------------------------------------------------------------------------

SEASONAL_DECOMPOSE_ORACLE = """
WITH b AS (
  SELECT event_type AS k,
         CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) * 3600 AS hs,
         ROUND(AVG(value) + 1e-9, 6) AS v
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
bounds AS (SELECT k, MIN(hs) AS lo, MAX(hs) AS hi FROM b GROUP BY k),
grid AS (
  SELECT k, UNNEST(generate_series(lo, hi, 3600)) AS hs FROM bounds
),
g AS (
  SELECT grid.k, grid.hs, v
  FROM grid LEFT JOIN b ON b.k = grid.k AND b.hs = grid.hs
),
t AS (
  SELECT k, hs, v,
         CASE WHEN COUNT(v) OVER wf = 25 THEN
           ROUND((SUM(v) OVER wm
                  + 0.5 * (LAG(v, 12) OVER wo + LEAD(v, 12) OVER wo))
                 / 24.0 + 1e-9, 6)
         END AS tr
  FROM g
  WINDOW wo AS (PARTITION BY k ORDER BY hs),
         wm AS (PARTITION BY k ORDER BY hs
                ROWS BETWEEN 11 PRECEDING AND 11 FOLLOWING),
         wf AS (PARTITION BY k ORDER BY hs
                ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
),
d AS (
  SELECT k, (hs // 3600) % 24 AS ph, ROUND(v - tr + 1e-9, 6) AS d FROM t
),
p AS (
  SELECT k, ph, COUNT(d) AS n_obs, ROUND(AVG(d) + 1e-9, 6) AS sraw
  FROM d GROUP BY 1, 2
),
s AS (
  SELECT k, ph, n_obs,
         ROUND(sraw - AVG(sraw) OVER (PARTITION BY k) + 1e-9, 6) AS seasonal
  FROM p
),
r AS (
  SELECT d.k, d.d, ROUND(d.d - s.seasonal + 1e-9, 6) AS r
  FROM d JOIN s ON s.k = d.k AND s.ph = d.ph
),
st AS (
  SELECT k,
         CASE WHEN var_pop(d) > 0
              THEN ROUND(GREATEST(0.0, 1.0 - var_pop(r) / var_pop(d))
                         + 1e-9, 4) END AS strength
  FROM r GROUP BY k
)
SELECT s.k AS event_type, CAST(ph AS BIGINT) AS phase,
       CAST(n_obs AS BIGINT) AS n_obs, seasonal,
       strength AS seasonal_strength
FROM s JOIN st ON st.k = s.k ORDER BY event_type, phase
"""


@golden(
    "seasonal_decompose_daily_cycle",
    SEASONAL_DECOMPOSE_ORACLE,
    tags=("timeseries", "seasonal", "decomposition", "events"),
)
def seasonal_decompose_daily_cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of each event type's hourly
    series against a 24h cycle: 2x24 half-weighted centered MA trend,
    zero-centered hour-of-day seasonal indices, and the Wang-Hyndman
    seasonality strength — the 'is there a daily cycle worth modeling'
    scorecard. Gap hours are explicit grid rows; trend exists only
    where the full 25-slot window is observed, so sparse scales degrade
    to fewer phase observations, never biased ones. Every stage's
    output is quantized before the next consumes it (chained-float
    contract)."""
    from mr_dice_spark.operators.timeseries import seasonal_decompose

    ev = Catalog(spark, sf_dir).events
    out = seasonal_decompose(
        ev, "event_type", "ts", "value", step_seconds=3600, period=24
    )
    return out.orderBy("event_type", "phase")


# ---------------------------------------------------------------------------
# Benford first-digit audit / Gini concentration (profile family)
# ---------------------------------------------------------------------------

BENFORD_ORACLE = """
WITH base AS (
  SELECT o_orderpriority AS g,
         CAST(regexp_extract(CAST(o_totalprice AS VARCHAR), '[1-9]') AS INT)
           AS digit
  FROM orders
  WHERE o_totalprice IS NOT NULL
    AND regexp_extract(CAST(o_totalprice AS VARCHAR), '[1-9]') <> ''
),
c AS (
  SELECT g, digit, COUNT(*) AS n FROM base GROUP BY 1, 2
)
SELECT g AS o_orderpriority, digit, CAST(n AS BIGINT) AS n,
       ROUND(1e-9 + n / CAST(SUM(n) OVER (PARTITION BY g) AS DOUBLE), 6)
         AS share,
       ROUND(1e-9 + LOG10(1.0 + 1.0 / digit), 6) AS expected,
       ROUND(1e-9 + n / CAST(SUM(n) OVER (PARTITION BY g) AS DOUBLE)
             - LOG10(1.0 + 1.0 / digit), 6) AS excess
FROM c ORDER BY o_orderpriority, digit
"""


@golden(
    "benford_first_digit_orders",
    BENFORD_ORACLE,
    tags=("profile", "audit", "benford", "agg"),
)
def benford_first_digit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of order totals per priority class —
    the fabricated-numbers tripwire. The first significant digit comes
    from the canonical string form ([1-9] regexp), NOT from
    floor(log10(x)) whose last-ulp cliffs flip digits cross-engine at
    powers of ten. TPC-H totals are sums of uniform prices, so the
    audit correctly reports a NON-Benford profile (excess is the
    signal, not a pass/fail). One (group, digit) aggregate + a
    group-sized share window."""
    from mr_dice_spark.operators.profile import benford_audit

    orders = Catalog(spark, sf_dir).orders
    out = benford_audit(orders, "o_totalprice", "o_orderpriority")
    return out.select(
        "o_orderpriority", "digit", "n",
        _r("share", 6).alias("share"),
        _r("expected", 6).alias("expected"),
        _r("excess", 6).alias("excess"),
    ).orderBy("o_orderpriority", "digit")


GINI_ORACLE = """
WITH base AS (
  SELECT event_type AS g, value AS x, event_id AS i
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
    AND value >= 0 AND event_id IS NOT NULL
),
r AS (
  SELECT g, x,
         CAST(ROW_NUMBER() OVER (PARTITION BY g ORDER BY x, i) AS DOUBLE)
           AS rk
  FROM base
),
a AS (
  SELECT g, COUNT(*) AS n, SUM(x) AS total, SUM(rk * x) AS rx
  FROM r GROUP BY g
)
SELECT g AS event_type, CAST(n AS BIGINT) AS n,
       ROUND(1e-9 + total, 6) AS total,
       ROUND(1e-9 + CASE WHEN n > 1 THEN
         2.0 * rx / (CAST(n AS DOUBLE) * NULLIF(total, 0))
         - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE) END, 6) AS gini
FROM a ORDER BY event_type
"""


@golden(
    "gini_value_concentration",
    GINI_ORACLE,
    tags=("profile", "audit", "concentration", "window"),
)
def gini_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Gini concentration of event values — the 'is the
    mass dominated by a few rows' datasheet number. Rank form over RAW
    values with a (value, id) tiebreak (never rank float AGGREGATES:
    two sums a last-ulp apart would permute ranks cross-engine); one
    group-key exchange shared by the rank window and the moment
    aggregate."""
    from mr_dice_spark.operators.profile import gini_concentration

    ev = Catalog(spark, sf_dir).events
    out = gini_concentration(ev, "event_type", "value", "event_id")
    return out.select(
        "event_type", "n",
        _r("total", 6).alias("total"),
        _r("gini", 6).alias("gini"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Theil-Sen robust trend / chi-square independence
# ---------------------------------------------------------------------------

THEIL_SEN_ORACLE = """
WITH b AS (
  SELECT event_type AS k,
         CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS x,
         ROUND(1e-9 + AVG(value), 6) AS v
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
p AS (
  SELECT a.k, (c.v - a.v) / CAST(c.x - a.x AS DOUBLE) AS s
  FROM b a JOIN b c ON a.k = c.k AND a.x < c.x
),
sl AS (
  SELECT k, COUNT(*) AS n_pairs, quantile_cont(s, 0.5) AS slope
  FROM p GROUP BY k
),
ic AS (
  SELECT b.k,
         quantile_cont(b.v - sl.slope * CAST(b.x AS DOUBLE), 0.5) AS intercept
  FROM b JOIN sl ON sl.k = b.k GROUP BY b.k
),
cn AS (SELECT k, COUNT(*) AS n_buckets FROM b GROUP BY k)
SELECT cn.k AS event_type, CAST(cn.n_buckets AS BIGINT) AS n_buckets,
       CAST(COALESCE(sl.n_pairs, 0) AS BIGINT) AS n_pairs,
       ROUND(1e-9 + sl.slope, 6) AS slope,
       ROUND(1e-9 + ic.intercept, 6) AS intercept
FROM cn
LEFT JOIN sl ON sl.k = cn.k
LEFT JOIN ic ON ic.k = cn.k
ORDER BY event_type
"""


MANN_KENDALL_ORACLE = """
WITH b AS MATERIALIZED (
  SELECT event_type AS k,
         CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS x,
         ROUND(AVG(value) + 1e-9, 6) AS v
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
s AS (
  SELECT a.k,
         SUM(CASE WHEN c.v > a.v THEN 1 WHEN c.v < a.v THEN -1 ELSE 0 END) AS s
  FROM b a JOIN b c ON a.k = c.k AND a.x < c.x GROUP BY a.k
),
ties AS (
  SELECT k, SUM(t) AS n,
         SUM(CAST(t AS DOUBLE) * (t - 1) * (2 * t + 5)) AS tt
  FROM (SELECT k, v, COUNT(*) AS t FROM b GROUP BY k, v) GROUP BY k
),
v2 AS (
  SELECT ties.k, n, COALESCE(s.s, 0) AS s,
         (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)
          * (2 * CAST(n AS DOUBLE) + 5) - tt) / 18.0 AS vs
  FROM ties LEFT JOIN s ON s.k = ties.k
)
SELECT k AS event_type, CAST(n AS BIGINT) AS n_buckets, CAST(s AS BIGINT) AS s,
       ROUND(vs + 1e-9, 4) AS var_s,
       ROUND(CASE WHEN vs > 0 THEN
               CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0) / SQRT(vs)
                    WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0) / SQRT(vs)
                    ELSE 0.0 END
             END + 1e-9, 6) AS z
FROM v2 ORDER BY event_type
"""


@golden(
    "mann_kendall_trend_hourly",
    MANN_KENDALL_ORACLE,
    tags=("timeseries", "trend", "nonparametric", "events"),
)
def mann_kendall_trend_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotonic-trend test per event type over the hourly
    value series — the significance companion to theil_sen_trend_hourly
    (same bucket grid, same O(B^2)-bounded pair set): S and the tie
    terms stay exact integers because bucket means are quantized before
    pairing; z is the only float."""
    from mr_dice_spark.operators.timeseries import mann_kendall_trend

    _utc(spark)
    ev = Catalog(spark, sf_dir).events
    return mann_kendall_trend(
        ev, "event_type", "ts", "value", step_seconds=3600
    ).orderBy("event_type")


@golden(
    "theil_sen_trend_hourly",
    THEIL_SEN_ORACLE,
    tags=("timeseries", "robust", "trend", "join"),
)
def theil_sen_trend_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per event type over hourly buckets: the
    median of all C(B,2) pairwise slopes + the median-residual
    intercept — OLS's outlier-immune twin (ols_trend_by_event_type fits
    the same series by moments; a single corrupted bucket separates
    them). Bucket means quantize to 6 dp BEFORE pairing (chained-float
    contract) and the medians are exact interpolated percentiles
    (percentile() = quantile_cont). Pair work is O(B^2) per key over
    the TIME GRID, not the corpus — B is fixed by retention."""
    from mr_dice_spark.operators.timeseries import theil_sen_trend

    ev = Catalog(spark, sf_dir).events
    out = theil_sen_trend(ev, "event_type", "ts", "value", step_seconds=3600)
    return out.select(
        "event_type", "n_buckets", "n_pairs",
        _r("slope", 6).alias("slope"),
        _r("intercept", 6).alias("intercept"),
    ).orderBy("event_type")


CHI2_ORACLE = """
WITH base AS (
  SELECT event_type AS x,
         CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) % 7 AS y
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
),
cells AS (SELECT x, y, COUNT(*) AS c FROM base GROUP BY 1, 2),
mx AS (SELECT x, SUM(c) AS cx FROM cells GROUP BY x),
my AS (SELECT y, SUM(c) AS cy FROM cells GROUP BY y),
tot AS (SELECT SUM(c) AS n FROM cells),
kx AS (SELECT COUNT(*) AS kx FROM mx),
ky AS (SELECT COUNT(*) AS ky FROM my),
stat AS (
  SELECT MAX(n) AS n,
         SUM(POW(c - CAST(cx AS DOUBLE) * cy / n, 2)
             / (CAST(cx AS DOUBLE) * cy / n))
           + (MAX(CAST(n AS DOUBLE)) - SUM(CAST(cx AS DOUBLE) * cy / n))
           AS chi2
  FROM cells JOIN mx USING (x) JOIN my USING (y) CROSS JOIN tot
)
SELECT CAST(stat.n AS BIGINT) AS n,
       CAST((kx - 1) * (ky - 1) AS BIGINT) AS dof,
       ROUND(1e-9 + stat.chi2, 6) AS chi2,
       ROUND(1e-9 + CASE WHEN (kx - 1) * (ky - 1) > 0 THEN
         SQRT(stat.chi2 / (CAST(stat.n AS DOUBLE)
                           * LEAST(kx - 1, ky - 1))) END, 6) AS cramers_v
FROM stat CROSS JOIN kx CROSS JOIN ky
"""


@golden(
    "chi2_type_by_weekday",
    CHI2_ORACLE,
    tags=("profile", "independence", "agg", "events"),
)
def chi2_type_by_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence of event type vs (epoch-day mod 7) — 'is
    the event mix stable across the week', mutual information's
    frequentist twin, with Cramér's V as the normalized effect size.
    The weekday uses epoch-day arithmetic, not dayofweek() (Spark is
    1-7 Sunday-first, DuckDB 0-6 — an engine-portability trap). Counts
    stay integers until the per-cell division; absent cells contribute
    their expected mass via the closing reduce (o=0 -> (o-e)^2/e = e)."""
    from mr_dice_spark.operators.profile import chi_square_independence

    ev = Catalog(spark, sf_dir).events.select(
        "event_type",
        (F.floor(F.unix_timestamp("ts") / 86400).cast("long") % 7).alias("wd"),
    ).where(F.col("ts").isNotNull())
    out = chi_square_independence(ev, "event_type", "wd")
    return out.select(
        "n", "dof",
        _r("chi2", 6).alias("chi2"),
        _r("cramers_v", 6).alias("cramers_v"),
    )


GINI_APPROX_ORACLE = """
WITH base AS (
  SELECT event_type AS g, value AS x, event_id AS i
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
    AND value >= 0 AND event_id IS NOT NULL
),
r AS (
  SELECT g, x,
         CAST(ROW_NUMBER() OVER (PARTITION BY g ORDER BY x, i) AS DOUBLE)
           AS rk
  FROM base
),
ex AS (
  SELECT g, COUNT(*) AS n, SUM(x) AS total,
         CASE WHEN COUNT(*) > 1 THEN
           2.0 * SUM(rk * x) / (CAST(COUNT(*) AS DOUBLE) * NULLIF(SUM(x), 0))
           - (CAST(COUNT(*) AS DOUBLE) + 1.0) / COUNT(*) END AS gini_exact
  FROM r GROUP BY g
),
mx AS (
  SELECT g, MAX(x) AS mxv, COUNT(*) AS n, SUM(x) AS total
  FROM base GROUP BY g
),
cells AS (
  SELECT b.g,
         CASE WHEN mx.mxv > 0
              THEN LEAST(CAST(FLOOR(b.x * 256 / mx.mxv) AS BIGINT), 255)
              ELSE 0 END AS bin,
         COUNT(*) AS c, SUM(b.x) AS s
  FROM base b JOIN mx ON mx.g = b.g GROUP BY 1, 2
),
cum AS (
  SELECT g, bin, c, s,
         SUM(s) OVER (PARTITION BY g ORDER BY bin
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs
  FROM cells
),
ap AS (
  SELECT cum.g,
         CASE WHEN MAX(mx.n) > 1 THEN
           1.0 - SUM((CAST(c AS DOUBLE) / mx.n)
                     * (2.0 * cs - s) / NULLIF(mx.total, 0)) END AS gini_binned
  FROM cum JOIN mx ON mx.g = cum.g GROUP BY cum.g
)
SELECT ex.g AS event_type, CAST(ex.n AS BIGINT) AS n,
       ROUND(1e-9 + ex.gini_exact, 6) AS gini_exact,
       ROUND(1e-9 + ap.gini_binned, 6) AS gini_binned,
       ROUND(1e-9 + ABS(ex.gini_exact - ap.gini_binned), 6) AS abs_err,
       ABS(ex.gini_exact - ap.gini_binned) < 0.01 AS within_tol
FROM ex JOIN ap ON ap.g = ex.g
ORDER BY event_type
"""


@golden(
    "gini_approx_audit",
    GINI_APPROX_ORACLE,
    tags=("profile", "audit", "concentration", "approx"),
)
def gini_approx_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accuracy audit of the binned-Lorenz Gini (the 100 TB mergeable
    path — two hash aggregates + a bin-sized window, never a whole
    group in one task) against the exact rank form, per event type:
    both modes, the absolute error, and a 0.01 tolerance verdict. The
    binned estimator is deterministic given the 256-bin equal-width
    grid, so the audit itself is hash-exact — the HLL/IVF recall-audit
    pattern applied to concentration."""
    from mr_dice_spark.operators.profile import gini_concentration

    ev = Catalog(spark, sf_dir).events
    ex = gini_concentration(ev, "event_type", "value", "event_id").select(
        "event_type", "n", F.col("gini").alias("gini_exact")
    )
    ap = gini_concentration(
        ev, "event_type", "value", exact=False, n_bins=256
    ).select("event_type", F.col("gini").alias("gini_binned"))
    out = ex.join(ap, "event_type")
    err = F.abs(F.col("gini_exact") - F.col("gini_binned"))
    return out.select(
        "event_type", "n",
        _r("gini_exact", 6).alias("gini_exact"),
        _r("gini_binned", 6).alias("gini_binned"),
        _r(err, 6).alias("abs_err"),
        (err < 0.01).alias("within_tol"),
    ).orderBy("event_type")


def _bpe_encode_oracle(k: int) -> str:
    """Unrolled BPE train (the `_bpe_oracle` chain, with the FINAL
    rebuild included — the encoder needs w_k) followed by the encode
    tail: distinct-word token lengths joined back to per-language word
    counts -> fertility."""
    parts = [
        r"""w0 AS MATERIALIZED (
  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS freq, string_split(w, '') AS s
  FROM (
    SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'),
                              x -> x <> '')) AS w
    FROM documents
  )
  GROUP BY w
)"""
    ]
    for r in range(1, k + 1):
        prev = f"w{r - 1}"
        parts.append(
            f"""p{r} AS (
  SELECT s[i] AS a, s[i + 1] AS b, freq
  FROM (SELECT freq, s, unnest(range(1, len(s))) AS i FROM {prev})
),
m{r} AS MATERIALIZED (
  SELECT a, b, CAST(SUM(freq) AS BIGINT) AS c
  FROM p{r} GROUP BY a, b
  ORDER BY c DESC, a, b LIMIT 1
),
w{r} AS MATERIALIZED (
  SELECT word, freq,
         flatten(list_transform(range(1, len(s) + 1), i ->
           CASE
             WHEN i < len(s) AND s[i] = m.a AND s[i + 1] = m.b
                  AND ((i - coalesce(list_max(list_filter(range(1, i),
                        q -> NOT (s[q] = m.a AND s[q + 1] = m.b))), 0)) % 2) = 1
               THEN [m.a || m.b]
             WHEN i > 1 AND s[i - 1] = m.a AND s[i] = m.b
                  AND (((i - 1) - coalesce(list_max(list_filter(range(1, i - 1),
                        q -> NOT (s[q] = m.a AND s[q + 1] = m.b))), 0)) % 2) = 1
               THEN CAST([] AS VARCHAR[])
             ELSE [s[i]]
           END)) AS s
  FROM {prev} CROSS JOIN m{r} m
)"""
        )
    parts.append(
        f"""enc AS (SELECT word, len(s) AS ntok FROM w{k}),
dw AS (
  SELECT lang, w, COUNT(*) AS c FROM (
    SELECT lang, unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                                    x -> x <> '')) AS w
    FROM documents
  ) GROUP BY 1, 2
)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + """
SELECT lang, CAST(SUM(c) AS BIGINT) AS n_words,
       CAST(SUM(c * ntok) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_words,
       ROUND(1e-9 + SUM(c * ntok) / CAST(SUM(c) AS DOUBLE), 6) AS fertility
FROM dw JOIN enc ON enc.word = dw.w
GROUP BY lang ORDER BY lang"""
    )


@golden(
    "bpe_encode_fertility_by_lang",
    _bpe_encode_oracle(12),
    tags=("text", "vocab", "bpe", "tokenizer", "pipeline"),
)
def bpe_encode_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full tokenizer loop in one pipeline: train 12 BPE merges on
    the corpus (bpe_train_merges), ENCODE the corpus with them
    (bpe_encode_stats), and report per-language fertility
    (tokens/word) — the number that prices a corpus in tokens and
    exposes which languages a vocabulary shortchanges. Encoding
    collapses to distinct words (vocabulary-sized work after one
    corpus word-count shuffle) and applies the training fold verbatim;
    the oracle re-derives the merges AND the encoding with the same
    run-parity positional rule, so train->encode parity is
    hash-checked end-to-end."""
    from mr_dice_spark.operators.vocab import bpe_encode_stats, bpe_train_merges

    docs = Catalog(spark, sf_dir).documents
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in bpe_train_merges(docs, "text", 12).collect()
    ]
    out = bpe_encode_stats(docs, "text", merges, group_col="lang")
    return out.select(
        "lang", "n_words", "n_tokens", "n_distinct_words",
        _r("fertility", 6).alias("fertility"),
    ).orderBy("lang")


TWAP_ORACLE = """
WITH base AS (
  SELECT event_type AS k, ts, event_id AS i, value AS v
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
    AND event_id IS NOT NULL AND value IS NOT NULL
),
d AS (
  SELECT k, v,
         COALESCE(CAST(LEAD(epoch_us(ts)) OVER (PARTITION BY k ORDER BY ts, i)
                       - epoch_us(ts) AS DOUBLE), 0.0) AS dur
  FROM base
)
SELECT k AS event_type, CAST(COUNT(*) AS BIGINT) AS n_obs,
       CAST(SUM(dur) AS BIGINT) AS span_us,
       ROUND(1e-9 + AVG(v), 6) AS avg_plain,
       ROUND(1e-9 + SUM(v * dur) / NULLIF(SUM(dur), 0), 6)
         AS avg_time_weighted
FROM d GROUP BY k ORDER BY event_type
"""


@golden(
    "time_weighted_avg_by_type",
    TWAP_ORACLE,
    tags=("timeseries", "window", "agg", "events"),
)
def time_weighted_avg_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duration-weighted mean of the event value per type (step/LOCF
    semantics: a value holds until the next observation) next to the
    plain AVG it corrects — THE aggregation for irregularly sampled
    state series. Microsecond-exact durations (unix_micros = epoch_us;
    second-truncated arithmetic would zero sub-second gaps) and a
    (ts, id) successor order so tied timestamps assign durations
    deterministically. One (key, time) exchange."""
    from mr_dice_spark.operators.timeseries import time_weighted_avg

    ev = Catalog(spark, sf_dir).events
    out = time_weighted_avg(ev, "event_type", "ts", "value", "event_id")
    return out.select(
        "event_type", "n_obs", "span_us",
        _r("avg_plain", 6).alias("avg_plain"),
        _r("avg_time_weighted", 6).alias("avg_time_weighted"),
    ).orderBy("event_type")


HEAPS_ORACLE = r"""
WITH words AS (
  SELECT doc_id AS d,
         unnest(list_filter(string_split_regex(trim(text), '\s+'),
                            x -> x <> '')) AS w
  FROM documents
),
per_doc AS (SELECT d, COUNT(*) AS nt FROM words GROUP BY d),
first_seen AS (SELECT w, MIN(d) AS fd FROM words GROUP BY w),
new_terms AS (SELECT fd AS d, COUNT(*) AS nv FROM first_seen GROUP BY fd),
docs AS (
  SELECT p.d, p.nt, COALESCE(n.nv, 0) AS nv
  FROM per_doc p LEFT JOIN new_terms n ON n.d = p.d
),
cum AS (
  SELECT d,
         SUM(nt) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS cn,
         SUM(nv) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS cv
  FROM docs
),
pts AS (
  SELECT ROUND(1e-9 + LOG10(CAST(cn AS DOUBLE)), 6) AS x,
         ROUND(1e-9 + LOG10(CAST(cv AS DOUBLE)), 6) AS y
  FROM cum WHERE cn > 0 AND cv > 0
),
m AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
  FROM pts
),
t AS (
  SELECT COUNT(*) AS n_docs, SUM(nt) AS total_tokens, SUM(nv) AS vocab
  FROM docs
)
SELECT CAST(n_docs AS BIGINT) AS n_docs,
       CAST(total_tokens AS BIGINT) AS total_tokens,
       CAST(vocab AS BIGINT) AS vocab,
       ROUND(1e-9 + (n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0), 6)
         AS beta,
       ROUND(1e-9 + (sy - (n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0)
                     * sx) / n, 6) AS log10_k,
       ROUND(1e-9 + POW(n * sxy - sx * sy, 2)
             / NULLIF((n * sxx - sx * sx) * (n * syy - sy * sy), 0), 6) AS r2
FROM t CROSS JOIN m
"""


@golden(
    "heaps_law_vocab_growth",
    HEAPS_ORACLE,
    tags=("text", "vocab", "corpus-health", "window"),
)
def heaps_law_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth fit over documents read in id order
    — the growth-curve corpus-health check beside the Zipf slope: a
    31-term templated fixture flattens almost immediately (beta near
    0), where organic text sits near 0.5. Per-term FIRST document makes
    cumulative vocabulary one running sum; logs quantize to 6 dp before
    the moment sums (chained-float contract)."""
    from mr_dice_spark.operators.vocab import heaps_law_fit

    docs = Catalog(spark, sf_dir).documents
    out = heaps_law_fit(docs, "doc_id", "text")
    return out.select(
        "n_docs", "total_tokens", "vocab",
        _r("beta", 6).alias("beta"),
        _r("log10_k", 6).alias("log10_k"),
        _r("r2", 6).alias("r2"),
    )


ROLLING_MEDIAN_ORACLE = """
WITH b AS (
  SELECT event_type AS k,
         CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) * 3600 AS h,
         ROUND(1e-9 + AVG(value), 6) AS v
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
)
SELECT k AS event_type, h AS bucket_s, v AS value,
       ROUND(1e-9 + quantile_cont(v, 0.5) OVER (
         PARTITION BY k ORDER BY h
         ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING), 6) AS smoothed
FROM b ORDER BY event_type, bucket_s
"""


@golden(
    "rolling_median_value_hourly",
    ROLLING_MEDIAN_ORACLE,
    tags=("timeseries", "robust", "window", "events"),
)
def rolling_median_value_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centered 7-bucket rolling-median smoother over the hourly value
    series per type — the robust denoiser run before trend/anomaly
    passes (a spiked bucket cannot move a median; partial windows at
    the edges, pandas center semantics). Windowed percentile() is
    exact interpolation = quantile_cont OVER; bucket means quantize
    before the window."""
    from mr_dice_spark.operators.timeseries import rolling_median

    ev = Catalog(spark, sf_dir).events
    out = rolling_median(ev, "event_type", "ts", "value", 3600, half_window=3)
    return out.select(
        "event_type",
        F.unix_timestamp("bucket").alias("bucket_s"),
        "value",
        _r("smoothed", 6).alias("smoothed"),
    ).orderBy("event_type", "bucket_s")


EXPECTATIONS_ORACLE = """
WITH a AS (
  SELECT COUNT(*) AS n,
         count_if(NOT COALESCE(o_totalprice > 0, FALSE)) AS f0,
         count_if(NOT COALESCE(o_orderstatus IN ('O', 'F', 'P'), FALSE)) AS f1,
         count_if(NOT COALESCE(regexp_matches(o_orderpriority, '^[1-5]-'),
                               FALSE)) AS f2,
         count_if(NOT COALESCE(o_orderdate >= TIMESTAMP '1992-01-01'
                               AND o_orderdate < TIMESTAMP '1999-01-01',
                               FALSE)) AS f3,
         count_if(NOT (o_custkey IS NOT NULL)) AS f4
  FROM orders
)
SELECT rule, CAST(n AS BIGINT) AS n_checked, CAST(f AS BIGINT) AS n_failed,
       -- ((1.0 - x) + 1e-9) association matches the Spark side (VERDICT r7 #6)
       ROUND((1.0 - f * 1.0 / n) + 1e-9, 6) AS pass_rate
FROM (
  SELECT 'totalprice_positive' AS rule, n, f0 AS f FROM a
  UNION ALL SELECT 'status_enum', n, f1 FROM a
  UNION ALL SELECT 'priority_format', n, f2 FROM a
  UNION ALL SELECT 'orderdate_in_range', n, f3 FROM a
  UNION ALL SELECT 'custkey_present', n, f4 FROM a
)
ORDER BY rule
"""


@golden(
    "expectations_orders_contract",
    EXPECTATIONS_ORACLE,
    tags=("profile", "contract", "validation", "agg"),
)
def expectations_orders_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-contract report over orders (the
    Great-Expectations shape as ONE relational pass): range, enum,
    regex, time-window and presence expectations evaluate as
    conditional counts in a single aggregate — adding a rule costs a
    column, never a pass — with fail-closed NULL semantics (an
    unevaluable expectation is not met). The per-rule pass rates are
    the go/no-go gate an ingest publishes with its output."""
    from mr_dice_spark.operators.profile import validate_expectations

    orders = Catalog(spark, sf_dir).orders
    rules = [
        ("totalprice_positive", F.col("o_totalprice") > 0),
        ("status_enum", F.col("o_orderstatus").isin("O", "F", "P")),
        ("priority_format", F.col("o_orderpriority").rlike("^[1-5]-")),
        (
            "orderdate_in_range",
            (F.col("o_orderdate") >= F.lit("1992-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")),
        ),
        ("custkey_present", F.col("o_custkey").isNotNull()),
    ]
    return validate_expectations(orders, rules).orderBy("rule")


TRAILING_DAU_ORACLE = """
WITH base AS (
  SELECT event_type AS k,
         CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS h,
         user_id AS e
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND user_id IS NOT NULL
),
per_bucket AS (
  SELECT k, h, COUNT(*) AS n_events_bucket FROM base GROUP BY k, h
),
triples AS (SELECT DISTINCT k, h, e FROM base),
fanned AS (
  SELECT k, e, h + i AS t
  FROM triples, UNNEST(range(0, 24)) AS u(i)
),
trl AS (
  SELECT k, t, COUNT(DISTINCT e) AS n_distinct_trailing
  FROM fanned GROUP BY k, t
)
SELECT p.k AS event_type,
       p.h * 3600 AS bucket_s,
       CAST(p.n_events_bucket AS BIGINT) AS n_events_bucket,
       CAST(tr.n_distinct_trailing AS BIGINT) AS n_distinct_trailing
FROM per_bucket p
JOIN trl tr ON tr.k = p.k AND tr.t = p.h
ORDER BY event_type, bucket_s
"""


@golden(
    "trailing_distinct_users_hourly",
    TRAILING_DAU_ORACLE,
    tags=("timeseries", "distinct", "window", "events"),
)
def trailing_distinct_users_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly trailing-24h distinct active users per event type — the
    rolling cardinality Spark windows cannot express (count_distinct is
    not frame-able). One corpus-sized distinct-triple reduction, then a
    BOUNDED 24-way fan-out and a distinct count per target bucket:
    shuffle volume is 24x the distinct triples, independent of raw
    event volume."""
    from mr_dice_spark.operators.timeseries import trailing_distinct_count

    ev = Catalog(spark, sf_dir).events
    out = trailing_distinct_count(
        ev, "event_type", "ts", "user_id", 3600, trailing_buckets=24
    )
    return out.select(
        "event_type",
        F.unix_timestamp("bucket").alias("bucket_s"),
        "n_events_bucket",
        "n_distinct_trailing",
    ).orderBy("event_type", "bucket_s")


KANON_ORACLE = """
WITH g AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
         COUNT(*) AS c
  FROM customer GROUP BY 1, 2, 3
)
SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(count_if(c < 5) AS BIGINT) AS n_violating_groups,
       CAST(SUM(CASE WHEN c < 5 THEN c ELSE 0 END) AS BIGINT)
         AS n_rows_at_risk,
       ROUND(1e-9 + SUM(CASE WHEN c < 5 THEN c ELSE 0 END) * 1.0 / SUM(c), 6)
         AS at_risk_share,
       CAST(MIN(c) AS BIGINT) AS min_group_size
FROM g
"""


@golden(
    "k_anonymity_customer_release",
    KANON_ORACLE,
    tags=("profile", "privacy", "governance", "agg"),
)
def k_anonymity_customer_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity (k=5) audit of a customer release keyed by the
    quasi-identifiers (nation, market segment, account-balance band) —
    the re-identification gate a governance pass runs before publishing
    a slice: rows in QI groups smaller than k are linkable against any
    outside table carrying the same columns. One QI-tuple aggregate +
    one group-sized reduce."""
    from mr_dice_spark.operators.profile import k_anonymity_audit

    cust = Catalog(spark, sf_dir).customer.select(
        "c_nationkey", "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
    )
    return k_anonymity_audit(cust, ["c_nationkey", "c_mktsegment", "bal_band"], k=5)


LDIV_ORACLE = """
WITH cells AS (
  SELECT c_nationkey, c_mktsegment, c_custkey % 3 AS s, COUNT(*) AS c
  FROM customer GROUP BY 1, 2, 3
),
g AS (
  SELECT c_nationkey, c_mktsegment, SUM(c) AS n, COUNT(*) AS div
  FROM cells GROUP BY 1, 2
)
SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(count_if(div < 3) AS BIGINT) AS n_violating_groups,
       CAST(SUM(CASE WHEN div < 3 THEN n ELSE 0 END) AS BIGINT)
         AS n_rows_at_risk,
       ROUND(1e-9 + SUM(CASE WHEN div < 3 THEN n ELSE 0 END) * 1.0 / SUM(n), 6)
         AS at_risk_share,
       CAST(MIN(div) AS BIGINT) AS min_diversity
FROM g
"""


@golden(
    "l_diversity_customer_release",
    LDIV_ORACLE,
    tags=("profile", "privacy", "governance", "agg"),
)
def l_diversity_customer_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct l-diversity (l=3) audit of the customer release keyed
    by (nation, segment) with a synthetic 3-class sensitive attribute —
    k-anonymity's homogeneity-attack companion: a large QI group still
    leaks if its rows share one sensitive value. Two chained group
    aggregates, corpus scanned once."""
    from mr_dice_spark.operators.profile import l_diversity_audit

    cust = Catalog(spark, sf_dir).customer.select(
        "c_nationkey", "c_mktsegment",
        (F.col("c_custkey") % 3).alias("sens"),
    )
    return l_diversity_audit(cust, ["c_nationkey", "c_mktsegment"], "sens", l=3)


TCLOSE_ORACLE = """
WITH cells AS MATERIALIZED (
  SELECT c_nationkey, c_mktsegment, c_custkey % 3 AS s, COUNT(*) AS c
  FROM customer GROUP BY 1, 2, 3
),
tot AS (SELECT SUM(c) AS nn FROM cells),
gdist AS (SELECT s, SUM(c) AS gc FROM cells GROUP BY s),
grp AS (
  SELECT c_nationkey, c_mktsegment, SUM(c) AS n FROM cells GROUP BY 1, 2
),
d AS (
  SELECT cells.c_nationkey, cells.c_mktsegment, MAX(grp.n) AS n,
         GREATEST(0.0, 0.5 * (1.0 +
           SUM(ABS(cells.c * 1.0 / grp.n - gdist.gc * 1.0 / tot.nn)
               - gdist.gc * 1.0 / tot.nn))) AS dist
  FROM cells
  JOIN grp ON grp.c_nationkey = cells.c_nationkey
          AND grp.c_mktsegment = cells.c_mktsegment
  JOIN gdist ON gdist.s IS NOT DISTINCT FROM cells.s
  CROSS JOIN tot
  GROUP BY 1, 2
)
SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(count_if(dist > 0.1) AS BIGINT) AS n_violating_groups,
       CAST(SUM(CASE WHEN dist > 0.1 THEN n ELSE 0 END) AS BIGINT)
         AS n_rows_at_risk,
       ROUND(1e-9 + SUM(CASE WHEN dist > 0.1 THEN n ELSE 0 END) * 1.0 / SUM(n), 6)
         AS at_risk_share,
       ROUND(1e-9 + MAX(dist), 6) AS max_distance
FROM d
"""


@golden(
    "t_closeness_customer_release",
    TCLOSE_ORACLE,
    tags=("profile", "privacy", "governance", "agg"),
)
def t_closeness_customer_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness (t=0.1, categorical EMD = total variation) audit of
    the customer release keyed by (nation, segment) with the synthetic
    3-class sensitive attribute — completing the release triad: the
    skewness attack l-diversity misses (a diverse group whose MIX is
    far from the corpus mix still leaks posterior information). One
    corpus aggregate; the distance boundary was verified 2.6e-4 clear
    of every group at all three fixture scales, so the verdict counts
    are fp-stable cross-engine."""
    from mr_dice_spark.operators.profile import t_closeness_audit

    cust = Catalog(spark, sf_dir).customer.select(
        "c_nationkey", "c_mktsegment",
        (F.col("c_custkey") % 3).alias("sens"),
    )
    return t_closeness_audit(cust, ["c_nationkey", "c_mktsegment"], "sens", t=0.1)


HOLT_ORACLE = """
WITH RECURSIVE ord AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
  FROM events
  WHERE user_id IS NOT NULL AND value IS NOT NULL
),
-- the Holt recurrence evaluated STEP BY STEP with the same IEEE double
-- operations in the same order as the operator's Python loop: (1.0 - a)
-- is written as the subtraction, matching the loop's precomputed
-- one-minus constants, so the comparison is bit-exact before the
-- presentation rounding (the streaming-EMA oracle's rule)
h(user_id, rn, l, b) AS (
  SELECT user_id, rn, value, CAST(0.0 AS DOUBLE) FROM ord WHERE rn = 1
  UNION ALL
  SELECT o.user_id, o.rn,
         0.3 * o.value + (1.0 - 0.3) * (h.l + h.b),
         0.2 * ((0.3 * o.value + (1.0 - 0.3) * (h.l + h.b)) - h.l)
           + (1.0 - 0.2) * h.b
  FROM h JOIN ord o ON o.user_id = h.user_id AND o.rn = h.rn + 1
),
fin AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_points FROM ord GROUP BY user_id
)
SELECT f.user_id, f.n_points,
       ROUND(1e-9 + h.l, 6) AS level,
       ROUND(1e-9 + h.b, 6) AS trend,
       ROUND(1e-9 + h.l + h.b, 6) AS forecast_1
FROM fin f JOIN h ON h.user_id = f.user_id AND h.rn = f.n_points
ORDER BY f.user_id
"""


@golden(
    "holt_linear_user_value",
    HOLT_ORACLE,
    tags=("timeseries", "forecast", "stateful", "events"),
)
def holt_linear_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear smoothing of each user's event-value series
    (alpha=0.3, beta=0.2): final level, trend, and one-step forecast —
    the order-sensitive 2-state recurrence no window frame can express
    (the batch sibling of the streaming EMA; see
    operators/timeseries.py:holt_linear_smooth for why applyInPandas is
    the right tool here). The oracle replays the recurrence step by
    step in a DuckDB recursive CTE, bit-exact before the 6dp rounding;
    (user_id, ts) is unique in the fixture, so the order is
    unambiguous."""
    from mr_dice_spark.operators.timeseries import holt_linear_smooth

    _utc(spark)
    ev = Catalog(spark, sf_dir).events
    out = holt_linear_smooth(ev, "user_id", "ts", "value", alpha=0.3, beta=0.2)
    return out.select(
        "user_id",
        "n_points",
        _r("level", 6).alias("level"),
        _r("trend", 6).alias("trend"),
        _r("forecast_1", 6).alias("forecast_1"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# seasonal-naive forecast backtest (round 7)
# ---------------------------------------------------------------------------

SEASONAL_NAIVE_ORACLE = """
WITH base AS (
  SELECT event_type AS k,
         CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS h,
         value AS v
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
),
b AS MATERIALIZED (
  SELECT k, h, ROUND(AVG(v) + 1e-9, 6) AS y FROM base GROUP BY 1, 2
),
l AS (
  SELECT k, y,
         LAG(y, 24) OVER (PARTITION BY k ORDER BY h) AS f,
         LAG(y, 1) OVER (PARTITION BY k ORDER BY h) AS p
  FROM b
),
a AS (
  SELECT k, COUNT(*) AS n_buckets, COUNT(f) AS n_scored,
         AVG(CASE WHEN f IS NOT NULL THEN ABS(y - f) END) AS mae,
         AVG(CASE WHEN f IS NOT NULL THEN
             CASE WHEN ABS(y) + ABS(f) = 0 THEN 0.0
                  ELSE 2.0 * ABS(y - f) / (ABS(y) + ABS(f)) END END) AS smape,
         AVG(CASE WHEN p IS NOT NULL THEN ABS(y - p) END) AS d1
  FROM l GROUP BY k
)
SELECT k AS event_type,
       CAST(n_buckets AS BIGINT) AS n_buckets,
       CAST(n_scored AS BIGINT) AS n_scored,
       ROUND(mae + 1e-9, 6) AS mae,
       ROUND(smape + 1e-9, 6) AS smape,
       ROUND(mae / NULLIF(d1, 0) + 1e-9, 6) AS mase
FROM a ORDER BY event_type
"""


@golden(
    "seasonal_naive_backtest_hourly",
    SEASONAL_NAIVE_ORACLE,
    tags=("timeseries", "forecast", "backtest"),
)
def seasonal_naive_backtest_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive (same hour yesterday, season=24 hourly buckets)
    forecast backtest per event type: MAE, sMAPE and MASE — the
    accuracy floor that tells you whether the Holt golden's fancier
    level+trend state earns its keep (MASE < 1 = beats the one-step
    naive walk). Bucket means are nudge-rounded before the lags so
    every error term is bit-identical across engines."""
    from mr_dice_spark.operators.timeseries import seasonal_naive_backtest

    _utc(spark)
    ev = Catalog(spark, sf_dir).events
    return seasonal_naive_backtest(
        ev, "event_type", "ts", "value", season=24, step_seconds=3600
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# lead-lag cross-correlation (round 7)
# ---------------------------------------------------------------------------

XCORR_ORACLE = """
WITH base AS (
  SELECT (event_type = 'purchase') AS isa,
         CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS h,
         value AS v
  FROM events
  WHERE event_type IN ('purchase', 'view')
    AND ts IS NOT NULL AND value IS NOT NULL
),
b AS MATERIALIZED (
  SELECT isa, h, ROUND(AVG(v) + 1e-9, 6) AS y FROM base GROUP BY 1, 2
),
a_side AS (SELECT h, y AS ya FROM b WHERE isa),
b_side AS (SELECT h AS hb, y AS yb FROM b WHERE NOT isa),
spine AS (SELECT CAST(unnest([0, 1, 2, 24]) AS INT) AS lag),
paired AS (
  SELECT spine.lag, a_side.ya, b_side.yb
  FROM b_side CROSS JOIN spine
  JOIN a_side ON a_side.h = b_side.hb + spine.lag
)
SELECT lag,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(covar_pop(ya, yb)
             / NULLIF(sqrt(var_pop(ya) * var_pop(yb)), 0) + 1e-9, 6) AS xcorr
FROM paired GROUP BY lag ORDER BY lag
"""


@golden(
    "cross_correlation_purchase_view",
    XCORR_ORACLE,
    tags=("timeseries", "correlation", "lead-lag"),
)
def cross_correlation_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation between the hourly purchase-value and
    view-value series at lags 0/1/2/24 — does purchase value follow
    view value? Calendar lags via bucket-index equi-joins (gaps pair
    nothing); bucket means pin at 6 so the moment aggregate is
    bit-portable; population-moment Pearson (the ratio is identical to
    the sample form)."""
    from mr_dice_spark.operators.timeseries import cross_correlation_by_lag

    _utc(spark)
    ev = Catalog(spark, sf_dir).events
    return cross_correlation_by_lag(
        ev, "ts", "value", "event_type", "purchase", "view",
        lags=[0, 1, 2, 24], step_seconds=3600,
    ).orderBy("lag")


# ---------------------------------------------------------------------------
# pinball (quantile) loss of the seasonal-naive forecast (round 7)
# ---------------------------------------------------------------------------

PINBALL_ORACLE = """
WITH base AS (
  SELECT event_type AS k,
         CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS h,
         value AS v
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
),
b AS MATERIALIZED (
  SELECT k, h, ROUND(AVG(v) + 1e-9, 6) AS y FROM base GROUP BY 1, 2
),
l AS (
  SELECT k, y, LAG(y, 24) OVER (PARTITION BY k ORDER BY h) AS f
  FROM b
),
q AS (SELECT CAST(unnest([0.5, 0.9]) AS DOUBLE) AS quantile),
fan AS (SELECT l.*, q.quantile FROM l CROSS JOIN q)
SELECT k AS event_type, quantile,
       CAST(COUNT(*) AS BIGINT) AS n_buckets,
       CAST(COUNT(f) AS BIGINT) AS n_scored,
       ROUND(AVG(CASE WHEN f IS NOT NULL THEN
             GREATEST(quantile * (y - f), (quantile - 1.0) * (y - f)) END)
             + 1e-9, 6) AS pinball
FROM fan GROUP BY 1, 2 ORDER BY event_type, quantile
"""


@golden(
    "pinball_loss_seasonal_naive",
    PINBALL_ORACLE,
    tags=("timeseries", "forecast", "quantile-loss"),
)
def pinball_loss_seasonal_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinball loss of the seasonal-naive hourly forecast at q = 0.5
    and 0.9 per event type — the proper scoring rule for quantile
    forecasts (P90 capacity headroom, not the mean). Shares the
    backtest golden's pinned bucket means; the quantile spine is a
    broadcast literal."""
    from mr_dice_spark.operators.timeseries import pinball_forecast_loss

    _utc(spark)
    ev = Catalog(spark, sf_dir).events
    return pinball_forecast_loss(
        ev, "event_type", "ts", "value", quantiles=[0.5, 0.9],
        season=24, step_seconds=3600,
    ).orderBy("event_type", "quantile")


# ---------------------------------------------------------------------------
# Hampel filter: rolling median/MAD spike screen (round 10)
# ---------------------------------------------------------------------------

HAMPEL_ORACLE = """
WITH b AS (
  SELECT event_type AS k,
         CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) * 3600 AS h,
         ROUND(1e-9 + AVG(value), 6) AS v
  FROM events
  WHERE value IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
),
win AS (
  SELECT k, h, v,
         list_sort(list(v) OVER (PARTITION BY k ORDER BY h
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) AS arr
  FROM b
),
m AS (
  SELECT k, h, v, len(arr) AS sz, arr[4] AS med,
         list_sort(list_transform(arr, x -> abs(x - arr[4])))[4] AS mad
  FROM win
)
SELECT k AS event_type, h AS bucket_s, v AS value,
       CASE WHEN sz = 7 THEN med END AS med,
       CASE WHEN sz = 7 THEN mad END AS mad,
       ROUND(CASE WHEN sz = 7 AND mad > 0
             THEN 0.6745 * (v - med) / mad END + 1e-9, 4) AS robust_z,
       CASE WHEN sz = 7 AND mad > 0
            THEN ABS(ROUND(0.6745 * (v - med) / mad + 1e-9, 4)) > 3.5
            END AS outlier
FROM m ORDER BY event_type, bucket_s
"""


@golden(
    "hampel_outliers_hourly_by_type",
    HAMPEL_ORACLE,
    tags=("timeseries", "hampel", "robust", "events"),
)
def hampel_outliers_hourly_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel rolling median/MAD spike screen over the hourly value
    series per type — each bucket judged against its 7-bucket
    NEIGHBOURHOOD (the global mad_outlier_flags calls every post-shift
    point an outlier; the Hampel window does not). Exact middle-element
    medians on the sorted window array; edges and zero-MAD windows
    report NULL (not screened)."""
    from mr_dice_spark.operators.timeseries import hampel_outliers

    # ts/event_type NOT NULL mirror the oracle exactly: a NULL ts bucket
    # would sort NULLS FIRST in Spark's window but NULLS LAST in DuckDB,
    # silently misaligning the rolling windows (round-10 ADVICE)
    ev = Catalog(spark, sf_dir).events.where(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    out = hampel_outliers(ev, "event_type", "ts", "value", 3600, 3, 3.5)
    return out.select(
        "event_type",
        F.unix_timestamp("bucket").alias("bucket_s"),
        "value",
        "med",
        "mad",
        "robust_z",
        "outlier",
    ).orderBy("event_type", "bucket_s")


@golden(
    "streaming_hampel_monitor",
    HAMPEL_ORACLE,  # byte-identical output to the batch hampel golden
    tags=("streaming", "hampel", "robust", "observability"),
)
def streaming_hampel_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel spike screening ON THE STREAM ENGINE: hourly bucket means
    aggregate through readStream in complete mode — the live anomaly
    monitor shape — and the Hampel finisher (sorted-window exact
    medians, robust z) runs batch-side on the materialized sink,
    byte-identical to the batch hampel golden, so the SAME DuckDB
    oracle hash-checks the streaming path. Finite replay makes the
    streaming aggregate exact (the streaming-golden contract)."""
    import uuid

    from mr_dice_spark.operators.timeseries import hampel_from_buckets
    from mr_dice_spark.streaming.windows import (
        read_events_stream,
        run_stream_to_memory,
    )

    _utc(spark)
    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    agg = (
        stream.where(
            F.col("value").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("event_type").isNotNull()
        )
        .groupBy("event_type", F.window("ts", "1 hour").alias("w"))
        .agg(F.avg("value").alias("__raw"))
    )
    name = f"stream_hampel_{uuid.uuid4().hex[:8]}"
    q = run_stream_to_memory(agg, name, output_mode="complete")
    try:
        b = spark.table(name).select(
            F.col("event_type").alias("__k"),
            F.col("w.start").alias("__h"),
            F.round(F.col("__raw") + F.lit(1e-9), 6).alias("__v"),
        )
        out = hampel_from_buckets(b, "event_type", 3, 3.5).select(
            "event_type",
            F.unix_timestamp("bucket").alias("bucket_s"),
            "value",
            "med",
            "mad",
            "robust_z",
            "outlier",
        ).orderBy("event_type", "bucket_s")
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        q.stop()



# ---------------------------------------------------------------------------
# Pettitt rank change-point: where did the level shift? (round 11)
# ---------------------------------------------------------------------------

PETTITT_ORACLE = """
WITH b AS (
  SELECT event_type AS k,
         CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) * 86400 AS h,
         ROUND(1e-9 + AVG(value), 6) AS v
  FROM events
  WHERE value IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
),
r AS (
  SELECT k, h,
         2 * RANK() OVER (PARTITION BY k ORDER BY v)
           + COUNT(*) OVER (PARTITION BY k, v) - 1 AS r2,
         COUNT(*) OVER (PARTITION BY k) AS n,
         ROW_NUMBER() OVER (PARTITION BY k ORDER BY h) AS t
  FROM b
),
u AS (
  SELECT k, h, t, n,
         SUM(r2) OVER (PARTITION BY k ORDER BY t
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - t * (n + 1) AS u
  FROM r
),
k1 AS (
  SELECT k, MAX(n) AS n,
         MAX(CASE WHEN t < n THEN ABS(u) END) AS kstat
  FROM u GROUP BY k
),
cp AS (
  SELECT u.k, MIN(u.t) AS cpt
  FROM u JOIN k1 ON k1.k = u.k AND u.t < k1.n AND ABS(u.u) = k1.kstat
  GROUP BY u.k
),
fin AS (
  SELECT k1.k, k1.n, k1.kstat, cp.cpt, u.h AS ch, u.u AS cu
  FROM k1 LEFT JOIN cp ON cp.k = k1.k
  LEFT JOIN u ON u.k = k1.k AND u.t = cp.cpt
)
SELECT k AS event_type, CAST(n AS BIGINT) AS n,
       CAST(kstat AS BIGINT) AS k_stat,
       CAST(cpt AS BIGINT) AS cp_index,
       CAST(ch AS BIGINT) AS cp_day_s,
       CAST(cu AS BIGINT) AS u_at_cp,
       -- gated on kstat: LEAST skips NULLs in both engines, so an
       -- ungated form would emit 1.0 for n < 2 keys instead of NULL
       ROUND(CASE WHEN kstat IS NOT NULL THEN
               LEAST(1.0, ROUND(2.0 * EXP(-6.0 * CAST(kstat AS DOUBLE)
               * CAST(kstat AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                  + CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) + 1e-12, 9))
             END + 1e-9, 6) AS p_approx
FROM fin ORDER BY event_type
"""


@golden(
    "pettitt_change_day_by_type",
    PETTITT_ORACLE,
    tags=("timeseries", "pettitt", "changepoint", "rank-test", "events"),
)
def pettitt_change_day_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt rank change-point over the daily value series per type —
    the NONPARAMETRIC "where did the level shift" beside
    best_changepoint's L2 split (one heavy-tailed day can buy the L2
    argmax; on ranks it moves U_t by at most its rank displacement).
    Doubled midranks keep K, the smallest-t argmax, and u_at_cp exact
    longs; the approximate significance is the only float."""
    from mr_dice_spark.operators.timeseries import pettitt_change_point

    _utc(spark)
    ev = Catalog(spark, sf_dir).events.where(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    out = pettitt_change_point(ev, "event_type", "ts", "value", 86400)
    return out.select(
        "event_type",
        "n",
        "k_stat",
        "cp_index",
        F.unix_timestamp("cp_bucket").alias("cp_day_s"),
        "u_at_cp",
        "p_approx",
    ).orderBy("event_type")


@golden(
    "streaming_pettitt_monitor",
    PETTITT_ORACLE,  # byte-identical output to the batch pettitt golden
    tags=("streaming", "pettitt", "changepoint", "observability"),
)
def streaming_pettitt_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt change-point detection ON THE STREAM ENGINE: daily
    bucket means aggregate through readStream in complete mode — the
    live "did this metric's level shift, and when" monitor — and the
    rank finisher (doubled midranks, exact-integer U_t, struct-max
    argmax) runs batch-side on the materialized sink, byte-identical
    to the batch pettitt golden, so the SAME DuckDB oracle hash-checks
    the streaming path. Finite replay makes the streaming aggregate
    exact (the streaming-golden contract)."""
    import uuid

    from mr_dice_spark.operators.timeseries import pettitt_from_buckets
    from mr_dice_spark.streaming.windows import (
        read_events_stream,
        run_stream_to_memory,
    )

    _utc(spark)
    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    agg = (
        stream.where(
            F.col("value").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("event_type").isNotNull()
        )
        .groupBy("event_type", F.window("ts", "1 day").alias("w"))
        .agg(F.avg("value").alias("__raw"))
    )
    name = f"stream_pettitt_{uuid.uuid4().hex[:8]}"
    q = run_stream_to_memory(agg, name, output_mode="complete")
    try:
        b = spark.table(name).select(
            F.col("event_type").alias("__k"),
            F.col("w.start").alias("__h"),
            F.round(F.col("__raw") + F.lit(1e-9), 6).alias("__v"),
        )
        out = pettitt_from_buckets(b, "event_type").select(
            "event_type",
            "n",
            "k_stat",
            "cp_index",
            F.unix_timestamp("cp_bucket").alias("cp_day_s"),
            "u_at_cp",
            "p_approx",
        ).orderBy("event_type")
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        q.stop()


# ---------------------------------------------------------------------------
# Seasonal Mann-Kendall: day-over-day trend at the same hour (round 11)
# ---------------------------------------------------------------------------

SEASONAL_MK_ORACLE = """
WITH b AS (
  SELECT event_type AS k,
         CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS x,
         ROUND(1e-9 + AVG(value), 6) AS v
  FROM events
  WHERE value IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
),
p AS (SELECT k, x, x % 24 AS ph, v FROM b),
s AS (
  SELECT a.k,
         SUM(CASE WHEN c.v > a.v THEN 1
                  WHEN c.v < a.v THEN -1 ELSE 0 END) AS s
  FROM p a JOIN p c ON a.k = c.k AND a.ph = c.ph AND a.x < c.x
  GROUP BY a.k
),
tt AS (
  SELECT k, ph, SUM(t) AS nh, SUM(t * (t - 1) * (2 * t + 5)) AS tt
  FROM (SELECT k, ph, v, COUNT(*) AS t FROM p GROUP BY k, ph, v)
  GROUP BY k, ph
),
v18 AS (
  SELECT k, SUM(nh) AS n, COUNT(*) AS np,
         SUM(nh * (nh - 1) * (2 * nh + 5) - tt) AS v18
  FROM tt GROUP BY k
)
SELECT v.k AS event_type, CAST(v.n AS BIGINT) AS n_buckets,
       CAST(v.np AS BIGINT) AS n_seasons,
       CAST(COALESCE(s.s, 0) AS BIGINT) AS s,
       ROUND(CAST(v.v18 AS DOUBLE) / 18.0 + 1e-9, 4) AS var_s,
       ROUND(CASE WHEN CAST(v.v18 AS DOUBLE) / 18.0 > 0 THEN
               CASE WHEN s.s > 0
                    THEN (CAST(s.s AS DOUBLE) - 1.0)
                         / sqrt(CAST(v.v18 AS DOUBLE) / 18.0)
                    WHEN s.s < 0
                    THEN (CAST(s.s AS DOUBLE) + 1.0)
                         / sqrt(CAST(v.v18 AS DOUBLE) / 18.0)
                    ELSE 0.0 END END + 1e-9, 6) AS z
FROM v18 v LEFT JOIN s ON s.k = v.k
ORDER BY event_type
"""


@golden(
    "seasonal_mk_hourly_by_type",
    SEASONAL_MK_ORACLE,
    tags=("timeseries", "mann-kendall", "seasonal", "trend", "events"),
)
def seasonal_mk_hourly_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal (Hirsch-Slack) Mann-Kendall over the hourly value
    series per type, period 24 — is there a day-over-day monotonic
    drift AT THE SAME HOUR? The diurnal cycle that plain mann_kendall
    folds into its pair set is cut away by comparing within-phase
    only; 18*Var' sums as exact longs across the 24 phases."""
    from mr_dice_spark.operators.timeseries import seasonal_mann_kendall

    _utc(spark)
    ev = Catalog(spark, sf_dir).events.where(
        F.col("value").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_type").isNotNull()
    )
    return (
        seasonal_mann_kendall(ev, "event_type", "ts", "value", 3600, 24)
        .orderBy("event_type")
    )
