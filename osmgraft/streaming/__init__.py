from osmgraft.streaming.pages_stream import (
    incremental_tile_counts,
    read_pages_stream,
    read_tile_totals,
    streaming_dedup_pages,
    streaming_hex_tile_counts,
    streaming_scored_counts,
    streaming_tile_counts,
)
from osmgraft.streaming.sessionize import (
    sessionize_batch,
    sessionize_stream,
)

__all__ = [
    "incremental_tile_counts",
    "read_pages_stream",
    "read_tile_totals",
    "streaming_dedup_pages",
    "sessionize_batch",
    "sessionize_stream",
    "streaming_hex_tile_counts",
    "streaming_scored_counts",
    "streaming_tile_counts",
]
