from . import ast
from .engine import CompiledQuery
from .executor import run_query
from .parser import parse_query
from .reader import IndexReader

__all__ = ["ast", "CompiledQuery", "run_query", "parse_query", "IndexReader"]
