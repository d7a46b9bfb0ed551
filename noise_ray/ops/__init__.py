from . import (cluster, dedup, mixing, multimodal, relational, similarity,
               text)

__all__ = ["cluster", "dedup", "mixing", "multimodal", "relational",
           "similarity", "text"]
