from osmgraft.sources.export import export_csv, export_json_report, weekly_markdown_report
from osmgraft.sources.catalog import TableIO

__all__ = ["export_csv", "export_json_report", "weekly_markdown_report", "TableIO"]
