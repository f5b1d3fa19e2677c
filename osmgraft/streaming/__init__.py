from osmgraft.streaming.pages_stream import (
    read_pages_stream,
    streaming_hex_tile_counts,
    streaming_scored_counts,
    streaming_tile_counts,
)

__all__ = [
    "read_pages_stream",
    "streaming_hex_tile_counts",
    "streaming_scored_counts",
    "streaming_tile_counts",
]
