from osmgraft.sources.catalog import TableIO
from osmgraft.sources.export import (
    export_csv,
    export_geojson_tiles,
    export_json_report,
    weekly_markdown_report,
)

__all__ = [
    "export_csv",
    "export_geojson_tiles",
    "export_json_report",
    "weekly_markdown_report",
    "TableIO",
]
