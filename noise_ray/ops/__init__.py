from . import dedup, multimodal, relational, similarity, text

__all__ = ["dedup", "multimodal", "relational", "similarity", "text"]
