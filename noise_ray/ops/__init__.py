from . import (bpe, cluster, dedup, mixing, multimodal, relational,
               similarity, text)

__all__ = ["bpe", "cluster", "dedup", "mixing", "multimodal", "relational",
           "similarity", "text"]
