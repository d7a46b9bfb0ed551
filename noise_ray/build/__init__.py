from .pipeline import build_index, term_bucket, DEFAULT_FIELDS, MANIFEST_NAME

__all__ = ["build_index", "term_bucket", "DEFAULT_FIELDS", "MANIFEST_NAME"]
