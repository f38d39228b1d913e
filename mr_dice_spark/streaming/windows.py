"""Structured Streaming extension (SURVEY.md §2.10 — beyond-reference).

The reference is purely request/response; the 100 TB north star needs
incremental ingestion. These helpers wrap the standard shapes — file-source
ingestion of the events schema, watermarked tumbling/sliding/session
windows — so the SAME aggregation logic runs batch (golden corpus:
events_hourly_window / events_sessionize) and streaming: each helper takes
any DataFrame, batch or streaming, and the batch goldens are the oracle for
the streaming path (tests feed the events parquet through readStream and
compare against the batch result).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream over events-shaped parquet.

    On a cluster this would be Kafka/Kinesis; the file source exercises the
    identical incremental plan. The ``ts`` column is normalized to
    TIMESTAMP (LTZ) at the source boundary exactly like ``Catalog.load``:
    parquet writers vary between TIMESTAMP(NANOS) (arrives as long ns under
    ``spark.sql.legacy.parquet.nanosAsLong``), TIMESTAMP_NTZ, and TIMESTAMP,
    so the footer schema is inferred with a batch read (readStream requires
    an explicit schema) and the conversion picked to match.
    """
    import hashlib
    import os
    import tempfile

    # the file stream source requires a DIRECTORY; the driver's layout is a
    # single parquet file per table — stage a symlink dir when needed
    if os.path.isfile(path):
        staged = os.path.join(
            tempfile.gettempdir(),
            f"mr_dice_stream_{hashlib.sha1(path.encode()).hexdigest()[:12]}",
        )
        os.makedirs(staged, exist_ok=True)
        link = os.path.join(staged, os.path.basename(path))
        if not os.path.exists(link):
            os.symlink(path, link)
        path = staged

    from mr_dice_spark.catalog import nanos_timestamp_cols, normalize_timestamps

    footer_schema = spark.read.parquet(path).schema
    raw = (
        spark.readStream.format("parquet")
        .schema(footer_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
    )
    # same normalization rule as the batch Catalog — one shared helper and
    # the same footer-driven nanos detection, so the next physical-type
    # variant is fixed in one place
    return normalize_timestamps(raw, nanos_long_cols=nanos_timestamp_cols(path))


def tumbling_window_stats(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window aggregate; same output schema as the
    batch golden ``events_hourly_window``."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window_duration).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.avg("value").alias("avg_value"))
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "event_type",
            "n_events",
            "avg_value",
        )
    )


def sliding_window_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window_duration, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            F.unix_millis(F.col("w.end")).alias("window_end_ms"),
            "event_type",
            "n_events",
        )
    )


def session_window_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based session windows (session_window builtin). Semantics match
    the batch ``sessionize`` operator: a gap >= the threshold closes the
    session."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_millis(F.col("w.start")).alias("start_ms"),
            "n_events",
        )
    )


def windowed_key_counts(
    events: DataFrame,
    key_col: str = "event_type",
    window_duration: str = "1 day",
    watermark: str = "1 day",
) -> DataFrame:
    """Per-(tumbling window, key) counts — the streaming-side state of a
    heavy-hitters monitor. Partial aggregation collapses each micro-batch
    map-side, so state and shuffle are bounded by (windows x keys), not
    rows; the watermark bounds how many windows stay open. Pair with
    ``heavy_hitters_topk`` on the materialized sink (the psi_from_counts
    finisher pattern)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window_duration).alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            key_col,
            "n",
        )
    )


def heavy_hitters_topk(counts: DataFrame, key_col: str, k: int) -> DataFrame:
    """Per-window top-k keys by count with the deterministic
    (n DESC, key) tiebreak. row_number under a per-partition LIMIT is
    the WindowGroupLimit shape — rank k+1 rows never cross the
    exchange."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    w = Window.partitionBy("window_start_ms").orderBy(
        F.desc("n"), F.col(key_col)
    )
    return counts.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def run_stream_to_memory(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
    timeout_seconds: int = 120,
):
    """Drive a streaming aggregate to completion against a finite file
    source and return the in-memory result table (test/demo harness)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_seconds)
    return q


def stream_to_parquet(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: tuple[str, ...] = (),
    query_name: str = "ingest",
    timeout_seconds: int = 300,
):
    """Durable streaming sink: exactly-once parquet ingestion.

    The file sink + checkpoint commit log gives end-to-end exactly-once for
    a replayable source — restarting after failure resumes from the last
    committed batch without duplicating files. ``availableNow`` drains the
    backlog and stops (batch-style backfill through the SAME streaming
    plan); drop the trigger for continuous ingestion. Partition columns
    become hive-style directories, so the landed table gets the same
    planning-time pruning as `ingest.write_partitioned`.
    """
    writer = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .trigger(availableNow=True)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    q = writer.start()
    q.awaitTermination(timeout_seconds)
    return q
