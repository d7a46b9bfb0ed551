from .flagship import (
    documents_index,
    transcripts_corpus,
    transcripts_index,
    search,
)

__all__ = ["documents_index", "transcripts_corpus", "transcripts_index", "search"]
