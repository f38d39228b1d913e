"""Golden corpus part 8: training-data plumbing operators — deterministic
split assignment, corpus-adaptive length gating, embedding int8
quantization audit, truncate-then-rerank ANN.

All four are north-star extensions (the reference has no corpus/embedding
surface; nearest analogues are its projection/cleaning stage and the
dedup family, SURVEY.md §2.2/§2.6) but are the operators a 100 TB
pretraining pipeline runs daily: leakage-safe train/val/test cuts, length
outlier removal whose thresholds track the corpus, a go/no-go check
before compressing the embedding store, and the dimension-truncation ANN
path that complements LSH (bucketing) and IVF (clustering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mr_dice_spark.catalog import Catalog
from mr_dice_spark.golden import golden
from mr_dice_spark.operators.sampling import split_assign, split_thresholds

# ---------------------------------------------------------------------------
# deterministic train/val/test split
# ---------------------------------------------------------------------------

_SPLITS = (("train", 0.9), ("val", 0.05), ("test", 0.05))
_SPLIT_SEED = "split/v1"


def _split_oracle() -> str:
    """The oracle takes its integer thresholds from the SAME
    ``split_thresholds`` call the operator compiles, so the cumulative
    float arithmetic cannot drift between the two statements."""
    bounds = split_thresholds(_SPLITS)
    cases = " ".join(
        f"WHEN hv < {upper} THEN '{name}'" for name, upper in bounds[:-1]
    )
    return f"""
SELECT doc_id,
       CASE {cases} ELSE '{bounds[-1][0]}' END AS split
FROM (
  SELECT doc_id,
         CAST(('0x' || substring(md5('{_SPLIT_SEED}' || CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) AS hv
  FROM documents
)
ORDER BY doc_id
"""


@golden("train_split_assign", _split_oracle(), tags=("sampling", "split", "documents"))
def train_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90/5/5 leakage-safe split over documents: assignment is a pure
    function of (doc_id, seed) via the portable md5-prefix hash, so the
    cut is identical under repartitioning, re-runs, and engines. Plan is
    one narrow CASE — no shuffle, no aggregate."""
    docs = Catalog(spark, sf_dir).documents
    out = split_assign(docs, "doc_id", splits=_SPLITS, seed=_SPLIT_SEED)
    return out.select("doc_id", "split").orderBy("doc_id")


# ---------------------------------------------------------------------------
# corpus-adaptive length outlier gate
# ---------------------------------------------------------------------------

LENGTH_FILTER_ORACLE = r"""
WITH t AS (
  SELECT doc_id,
         CAST(CASE WHEN trim(COALESCE(text, '')) = '' THEN 0
                   ELSE len(string_split_regex(trim(text), '\s+')) END
              AS BIGINT) AS n_tokens
  FROM documents
),
b AS (
  SELECT quantile_cont(n_tokens, 0.05) AS lo,
         quantile_cont(n_tokens, 0.95) AS hi
  FROM t
)
SELECT doc_id, n_tokens
FROM t, b
WHERE n_tokens >= lo - 1e-6 AND n_tokens <= hi + 1e-6
ORDER BY doc_id
"""


@golden(
    "length_outlier_filter",
    LENGTH_FILTER_ORACLE,
    tags=("curation", "percentile", "documents"),
)
def length_outlier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep documents inside the corpus's own exact [p5, p95] token-count
    band (quantile_length_filter): one 2-quantile aggregate broadcast back
    as a scalar bound, one narrow filter pass — no corpus shuffle. The
    1e-6 boundary widening makes the integer-vs-interpolated-double
    comparison engine-exact (see the operator docstring)."""
    from mr_dice_spark.operators.curation import quantile_length_filter

    docs = Catalog(spark, sf_dir).documents
    out = quantile_length_filter(docs, "doc_id", "text", low=0.05, high=0.95)
    return out.select("doc_id", "n_tokens").orderBy("doc_id")


# ---------------------------------------------------------------------------
# embedding int8 quantization audit
# ---------------------------------------------------------------------------

INT8_ORACLE = """
WITH t AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
s AS (
  SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) / 127.0 AS sc
  FROM t
),
e AS (
  -- sc IS NULL (empty/NULL vector: list_max of nothing) folds into the
  -- zero-error branch and a 0.0 scale, matching the operator's coalesce
  SELECT vec_id, sc,
         CASE WHEN sc IS NULL OR sc = 0 THEN list_transform(v, x -> 0.0)
              ELSE list_transform(v, x -> abs(floor(x / sc + 0.5) * sc - x)) END
           AS errs,
         len(v) AS nd
  FROM s
)
SELECT vec_id,
       ROUND(1e-9 + COALESCE(sc, 0.0), 6) AS scale,
       ROUND(1e-9 + CASE WHEN nd = 0 THEN 0.0 ELSE list_max(errs) END, 6)
         AS max_abs_err,
       ROUND(1e-9 + CASE WHEN nd = 0 THEN 0.0
                         ELSE list_sum(list_transform(errs, x -> x * x)) / nd END, 8)
         AS mse
FROM e
ORDER BY vec_id
"""


@golden(
    "embedding_int8_quantize",
    INT8_ORACLE,
    tags=("similarity", "quantization", "embeddings"),
)
def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization error audit per vector — scale,
    max-abs reconstruction error, MSE — entirely JVM-side array HOFs
    (int8_quantize_stats): map-only, zero shuffle, code rounding stated
    as floor(x/scale + 0.5) so both engines tie-break identically."""
    from mr_dice_spark.operators.similarity import int8_quantize_stats

    emb = Catalog(spark, sf_dir).embeddings
    return int8_quantize_stats(emb, "vec_id", "embedding").orderBy("vec_id")


# ---------------------------------------------------------------------------
# truncate-then-rerank ANN (Matryoshka shape)
# ---------------------------------------------------------------------------

TRUNCATE_RERANK_ORACLE = """
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
),
t AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id <> 0
),
coarse AS (
  SELECT vec_id, v,
         ROUND(1e-9 + list_cosine_similarity(v[1:16], (SELECT qv[1:16] FROM q)), 6)
           AS cs
  FROM t
  ORDER BY cs DESC, vec_id
  LIMIT 50
)
SELECT vec_id,
       ROUND(1e-9 + list_cosine_similarity(v, (SELECT qv FROM q)), 6) AS cosine
FROM coarse
ORDER BY cosine DESC, vec_id
LIMIT 10
"""


@golden(
    "cosine_topk_truncate_rerank",
    TRUNCATE_RERANK_ORACLE,
    tags=("similarity", "ann", "rerank"),
)
def cosine_topk_truncate_rerank_q0(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 neighbours of vector 0 via a 16-dim coarse pass over the
    truncated prefix, then exact 64-dim rerank of the 50 candidates —
    both stages TakeOrderedAndProject (per-partition heads, no global
    sort), both scores nudge-rounded before ranking so candidate
    membership is engine-exact."""
    from mr_dice_spark.operators.similarity import cosine_topk_truncate_rerank

    emb = Catalog(spark, sf_dir).embeddings
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).head()["embedding"]]
    corpus = emb.where(F.col("vec_id") != 0)
    return cosine_topk_truncate_rerank(
        corpus, "vec_id", "embedding", qv, k=10, coarse_dims=16, coarse_k=50
    )
