from .ops import (
    read_stream_parquet,
    sessionize_stream,
    streaming_asof_join,
    streaming_minhash_pairs,
    streaming_dedup,
    streaming_geofence_transitions,
    streaming_heavy_hitters,
    streaming_running_counts,
    streaming_binned_counts,
    streaming_spatial_join,
    windowed_counts,
    windowed_extent,
)

__all__ = [
    "read_stream_parquet",
    "windowed_counts",
    "windowed_extent",
    "sessionize_stream",
    "streaming_asof_join",
    "streaming_minhash_pairs",
    "streaming_dedup",
    "streaming_geofence_transitions",
    "streaming_heavy_hitters",
    "streaming_running_counts",
    "streaming_binned_counts",
    "streaming_spatial_join",
]
