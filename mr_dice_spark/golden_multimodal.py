"""Golden corpus part 4: multimodal plumbing (north-star extension).

The codec layer is a deterministic byte-derived stub (see
``multimodal/codecs.py``), which makes the full pipeline — binary payload →
Arrow-batched ``mapInPandas`` probe → typed metadata → JVM-side frame
sampling — oracle-checkable: DuckDB restates the stub arithmetic over the
same bytes (documents.text is pure ASCII in this corpus, so
``ascii(substring(...))`` equals the byte value and ``length`` equals
``octet_length``; asserted in tests/test_multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mr_dice_spark.catalog import Catalog
from mr_dice_spark.golden import golden
from mr_dice_spark.multimodal import (
    payload_from_text,
    probe_audio,
    probe_images,
    probe_videos,
    sample_frames,
)

# shared oracle fragment: byte length + checksum of the fixture payload
_BYTES_CTE = """
b AS (
  SELECT doc_id,
         length(text) AS n,
         CAST(list_sum(list_transform(range(1, length(text) + 1),
                                      i -> ascii(substring(text, i, 1))))
              AS BIGINT) AS csum
  FROM documents
)
"""

IMAGE_PROBE_ORACLE = f"""
WITH {_BYTES_CTE}
SELECT doc_id,
       CAST(64 + n % 512 AS INT) AS width,
       CAST(64 + csum % 512 AS INT) AS height,
       CAST(1 + n % 3 AS INT) AS channels,
       'jpeg' AS format
FROM b
ORDER BY doc_id
"""


@golden("multimodal_image_probe", IMAGE_PROBE_ORACLE, tags=("multimodal", "mapInPandas"))
def multimodal_image_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text → binary payload → image-probe stub → typed metadata.

    The probe prunes to (doc_id, payload) before the Arrow transfer, so at
    scale only the blob column crosses to Python."""
    docs = Catalog(spark, sf_dir).documents
    media = docs.select("doc_id", payload_from_text(F.col("text")).alias("payload"))
    return probe_images(media, id_cols=["doc_id"]).orderBy("doc_id")


FRAME_SAMPLE_ORACLE = f"""
WITH {_BYTES_CTE},
probed AS (
  SELECT doc_id,
         1 + csum % 300 AS n_frames,
         CAST(ceil((1 + csum % 300) / 8.0) AS INT) AS stride
  FROM b
)
SELECT doc_id,
       CAST(frame_idx // stride AS INT) AS frame_rank,
       CAST(frame_idx AS INT) AS frame_idx
FROM (
  SELECT doc_id, stride,
         unnest(list_slice(range(0, n_frames, stride), 1, 8)) AS frame_idx
  FROM probed
)
ORDER BY doc_id, frame_rank
"""


@golden("multimodal_frame_sample", FRAME_SAMPLE_ORACLE, tags=("multimodal", "video"))
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video probe (Python, once) → uniform frame-index sampling (pure JVM
    sequence/posexplode — codegen, no second Python hop)."""
    docs = Catalog(spark, sf_dir).documents
    media = docs.select("doc_id", payload_from_text(F.col("text")).alias("payload"))
    probed = probe_videos(media, id_cols=["doc_id"])
    return (
        sample_frames(probed, target=8, id_cols=["doc_id"])
        .orderBy("doc_id", "frame_rank")
    )


AUDIO_STATS_ORACLE = f"""
WITH {_BYTES_CTE},
probed AS (
  SELECT doc_id,
         ([8000, 16000, 22050, 44100, 48000])[csum % 5 + 1] AS sample_rate,
         n * 128 AS n_samples,
         1 + n % 2 AS n_channels
  FROM b
)
SELECT CAST(sample_rate AS INT) AS sample_rate,
       CAST(n_channels AS INT) AS n_channels,
       COUNT(*) AS n_clips,
       CAST(SUM(n_samples) AS BIGINT) AS total_samples
FROM probed
GROUP BY 1, 2
ORDER BY 1, 2
"""


@golden("multimodal_audio_stats", AUDIO_STATS_ORACLE, tags=("multimodal", "audio"))
def multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio probe → relational aggregation over typed metadata (the probe
    is the only Python stage; the groupBy is ordinary codegen'd hash agg)."""
    docs = Catalog(spark, sf_dir).documents
    media = docs.select("doc_id", payload_from_text(F.col("text")).alias("payload"))
    return (
        probe_audio(media, id_cols=["doc_id"])
        .groupBy("sample_rate", "n_channels")
        .agg(
            F.count(F.lit(1)).alias("n_clips"),
            F.sum("n_samples").alias("total_samples"),
        )
        .orderBy("sample_rate", "n_channels")
    )
