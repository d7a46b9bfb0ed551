from .compact import compact_index
from .incremental import add_documents, total_docs
from .pipeline import build_index, term_bucket, DEFAULT_FIELDS, MANIFEST_NAME

__all__ = ["add_documents", "build_index", "compact_index", "term_bucket",
           "total_docs", "DEFAULT_FIELDS", "MANIFEST_NAME"]
