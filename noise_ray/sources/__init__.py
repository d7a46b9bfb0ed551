from .jsonl import jsonl_to_parquet
from .transcripts import generate_transcripts, FIXTURE_TEXTS

__all__ = ["generate_transcripts", "jsonl_to_parquet", "FIXTURE_TEXTS"]
