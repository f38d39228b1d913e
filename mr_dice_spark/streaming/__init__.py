from mr_dice_spark.streaming.windows import (
    read_events_stream,
    session_window_stats,
    sliding_window_counts,
    tumbling_window_stats,
)

__all__ = [
    "read_events_stream",
    "session_window_stats",
    "sliding_window_counts",
    "tumbling_window_stats",
]
