from .flagship import (
    corpus_at,
    documents_index,
    transcripts_corpus,
    transcripts_index,
    search,
)

__all__ = ["corpus_at", "documents_index", "transcripts_corpus",
           "transcripts_index", "search"]
