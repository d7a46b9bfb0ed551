from .porter2 import stem
from .tokenizer import tokenize, tokenize_grouped, word_segments

__all__ = ["stem", "tokenize", "tokenize_grouped", "word_segments"]
