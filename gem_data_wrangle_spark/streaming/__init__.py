from gem_data_wrangle_spark.streaming.screening import (
    compact_screen_index,
    maybe_compact,
    stream_dedup_screen,
    stream_embedding_screen,
    stream_hamming_screen,
    stream_neardup_screen,
)
from gem_data_wrangle_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    stream_dedup,
    stream_interval_join,
    stream_static_enrich,
    tumbling_window_agg,
)

__all__ = [
    "compact_screen_index",
    "maybe_compact",
    "session_window_agg",
    "sliding_window_agg",
    "stream_dedup",
    "stream_dedup_screen",
    "stream_embedding_screen",
    "stream_hamming_screen",
    "stream_interval_join",
    "stream_neardup_screen",
    "stream_static_enrich",
    "tumbling_window_agg",
]
