"""Corpus term statistics: TF-IDF keyword extraction (beyond-reference
training-data-pipeline operator — keyword/topic signals for corpus curation,
the same two-pass shape as C4/RefinedWeb boilerplate statistics).

Scale shape: one explode + one (doc, term) hash aggregate with map-side
combine; the document-frequency dimension is vocabulary-sized (orders of
magnitude smaller than the corpus) and is broadcast back, so the only
corpus-sized shuffles are the TF aggregate and the per-doc top-k window —
both keyed on the document id. Nothing touches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tfidf_top_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    rational_idf: bool = False,
    persist_tf: bool = False,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document: (id, term, score, rank).

    ``rational_idf=False`` (default) uses the standard smoothed
    ``ln((N+1)/(df+1)) + 1``. ``rational_idf=True`` substitutes the
    monotone-in-df rational weight ``(N+1)/(df+1)`` — every operation is
    then exact IEEE arithmetic on integer-valued doubles, so an independent
    engine (the DuckDB oracle) reproduces scores BIT-identically; ``ln``
    implementations may differ in the last ulp across libms, which a
    hash-compare would see. Ranking ties (identical scores) break on term
    order, so top-k membership is deterministic on both engines.
    """
    # The TF aggregate feeds BOTH the scores and the document-frequency
    # dimension; without persistence Catalyst recomputes its lineage (a
    # second full corpus scan). persist_tf=True caches the (doc, term, tf)
    # aggregate — corpus-sized but far smaller than raw text — trading
    # executor storage for the second scan at 100 TB.
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("__t"),
    ).where(F.col("__t") != "")
    tf = toks.groupBy("__id", "__t").agg(F.count(F.lit(1)).alias("tf"))
    if persist_tf:
        from pyspark.storagelevel import StorageLevel

        tf = tf.persist(StorageLevel.MEMORY_AND_DISK)
    dfreq = tf.groupBy("__t").agg(F.count(F.lit(1)).alias("df"))
    n = df.select(F.count(F.lit(1)).cast("double").alias("__n"))
    ratio = (F.col("__n") + 1.0) / (F.col("df") + F.lit(1.0))
    idf = ratio if rational_idf else (F.log(ratio) + 1.0)
    scored = (
        tf.join(F.broadcast(dfreq), "__t")
        .crossJoin(F.broadcast(n))
        .select("__id", "__t", (F.col("tf") * idf).alias("__score"))
    )
    w = Window.partitionBy("__id").orderBy(F.desc("__score"), F.asc("__t"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("__id").alias(id_col),
            F.col("__t").alias("term"),
            F.col("__score").alias("score"),
            "rank",
        )
    )
