from osmgraft.streaming.pages_stream import (
    read_pages_stream,
    streaming_scored_counts,
    streaming_tile_counts,
)

__all__ = [
    "read_pages_stream",
    "streaming_scored_counts",
    "streaming_tile_counts",
]
