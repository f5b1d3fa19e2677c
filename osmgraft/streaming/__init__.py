from osmgraft.streaming.pages_stream import (
    read_pages_stream,
    streaming_hex_tile_counts,
    streaming_scored_counts,
    streaming_tile_counts,
)
from osmgraft.streaming.sessionize import (
    sessionize_batch,
    sessionize_stream,
)

__all__ = [
    "read_pages_stream",
    "sessionize_batch",
    "sessionize_stream",
    "streaming_hex_tile_counts",
    "streaming_scored_counts",
    "streaming_tile_counts",
]
