from osmgraft.extract.page_extract import extract_features

__all__ = ["extract_features"]
