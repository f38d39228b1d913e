"""Multimodal column model: opaque ``binary`` payloads + typed metadata.

Design (north-star extension; no counterpart in the reference, which is
text/JSON-only): an image/audio/video corpus at 100 TB is a Parquet table
whose payload column is ``binary`` (or a pointer column ``uri: string``
when blobs live out-of-line in object storage) plus a *typed* metadata
struct. All filtering/joining/grouping happens on the cheap typed columns;
the heavy payload column is only touched by Arrow-batched decode operators
(`mr_dice_spark.multimodal.ops`), so column pruning keeps every relational
stage payload-free.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Typed metadata carried alongside a binary payload. Nullable throughout:
# metadata may be unknown until decode.
IMAGE_META = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)

AUDIO_META = T.StructType(
    [
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)

VIDEO_META = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("fps", T.DoubleType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)


def media_table_schema(id_type: T.DataType = T.LongType(), meta: T.StructType = IMAGE_META) -> T.StructType:
    """Canonical media-table shape: (id, uri, payload, meta).

    ``payload`` may be NULL when the blob lives at ``uri`` only (out-of-line
    storage); decode operators accept either and a loader op resolves
    uri -> bytes.
    """
    return T.StructType(
        [
            T.StructField("media_id", id_type, nullable=False),
            T.StructField("uri", T.StringType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("meta", meta),
        ]
    )
