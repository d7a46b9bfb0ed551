from .documents import (documents_corpus_at, embeddings_corpus_at,
                        generate_documents, generate_embeddings)
from .jsonl import csv_to_parquet, jsonl_to_parquet
from .transcripts import generate_transcripts, FIXTURE_TEXTS

__all__ = ["csv_to_parquet", "documents_corpus_at", "embeddings_corpus_at",
           "generate_documents", "generate_embeddings",
           "generate_transcripts", "jsonl_to_parquet", "FIXTURE_TEXTS"]
