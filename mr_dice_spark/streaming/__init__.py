from mr_dice_spark.streaming.joins import dedup_stream, stream_stream_interval_join
from mr_dice_spark.streaming.stateful import user_value_ema
from mr_dice_spark.streaming.upsert import read_snapshot, stream_upsert_to_snapshot
from mr_dice_spark.streaming.windows import (
    stream_to_parquet,
    read_events_stream,
    session_window_stats,
    sliding_window_counts,
    tumbling_window_stats,
)

__all__ = [
    "dedup_stream",
    "stream_stream_interval_join",
    "stream_to_parquet",
    "user_value_ema",
    "read_events_stream",
    "session_window_stats",
    "sliding_window_counts",
    "tumbling_window_stats",
]
