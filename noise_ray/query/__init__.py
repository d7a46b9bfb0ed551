from . import ast
from .distributed import run_query_distributed
from .engine import CompiledQuery
from .executor import run_query
from .parser import parse_query
from .reader import IndexReader

__all__ = ["ast", "CompiledQuery", "run_query", "run_query_distributed",
           "parse_query", "IndexReader"]
