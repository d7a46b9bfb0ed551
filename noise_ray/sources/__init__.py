from .transcripts import generate_transcripts, FIXTURE_TEXTS

__all__ = ["generate_transcripts", "FIXTURE_TEXTS"]
