from . import cluster, dedup, multimodal, relational, similarity, text

__all__ = ["cluster", "dedup", "multimodal", "relational", "similarity",
           "text"]
