"""Document chunking (beyond-reference training-data-pipeline operator):
split long documents into overlapping fixed-size token windows — the step
between corpus curation and sequence packing when documents exceed the
model context (RAG indexing and long-doc pretraining both need it).

Spark shape: one narrow projection builds the whitespace token array,
``sequence()`` enumerates chunk starts (stride = chunk - overlap),
``posexplode`` emits one row per chunk, ``slice`` + ``array_join`` rebuild
the chunk text. Everything is codegen'd array arithmetic — no UDFs, no
shuffle at all (chunking is embarrassingly row-local; the explode factor
is ceil(n_tokens/stride), bounded by document length).

Chunk semantics:
* chunks start at token offsets 0, stride, 2*stride, ... (0-based);
  the final chunk may be short (it is NOT dropped — truncating the tail
  silently loses training data);
* with overlap > 0, start enumeration stops once the previous chunk
  reaches the document end: a start with ``start + overlap >= n_tokens``
  would emit a chunk fully contained in the previous one (e.g. 7 tokens,
  chunk=3, overlap=1 must not emit the lone 'g' already covered by
  'e f g'), duplicating text downstream;
* a document with fewer tokens than ``chunk_tokens`` yields exactly one
  chunk (the whole document);
* empty / whitespace-only documents yield no chunks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 64,
    overlap_tokens: int = 0,
) -> DataFrame:
    """(id, chunk_id, start_token, n_tokens, chunk_text) — one row per
    overlapping token window. ``chunk_id`` is 0-based per document;
    ``start_token`` is the 0-based token offset of the window.
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be > 0, got {chunk_tokens}")
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError(
            f"overlap_tokens must be in [0, chunk_tokens), got {overlap_tokens}"
        )
    stride = chunk_tokens - overlap_tokens
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # trim('')  splits to [''] — normalize to a true empty array
    toks = F.when(F.col(text_col).isNull() | (F.trim(F.col(text_col)) == ""), F.array()).otherwise(toks)
    n = F.size("__toks")
    # upper start bound n-1-overlap (clamped to 0 so short docs keep their
    # single full-document chunk): a start past it satisfies
    # start + overlap >= n, i.e. the previous chunk already covers it
    starts = F.when(
        n > 0,
        F.sequence(
            F.lit(0), F.greatest(F.lit(0), n - 1 - F.lit(overlap_tokens)), F.lit(stride)
        ),
    ).otherwise(F.array())
    base = df.select(F.col(id_col), toks.alias("__toks")).select(
        id_col,
        "__toks",
        F.size("__toks").alias("__n"),
        F.posexplode(starts).alias("chunk_id", "start_token"),
    )
    return base.select(
        id_col,
        "chunk_id",
        "start_token",
        F.least(F.lit(chunk_tokens), F.col("__n") - F.col("start_token")).alias(
            "n_tokens"
        ),
        F.array_join(
            F.slice(F.col("__toks"), F.col("start_token") + 1, F.lit(chunk_tokens)),
            " ",
        ).alias("chunk_text"),
    )
