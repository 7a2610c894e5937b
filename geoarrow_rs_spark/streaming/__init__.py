from .ops import read_stream_parquet, sessionize_stream, windowed_counts

__all__ = ["read_stream_parquet", "windowed_counts", "sessionize_stream"]
