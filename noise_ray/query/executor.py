"""Query execution: compile → evaluate → score → order/limit → materialize.

Mirrors the reference's QueryResults loop (src/query.rs:511-573): matches
stream in doc (seq) order; scores are computed per match; ordering and limit
use the ported buffered machinery (results.py); finally the winning docs are
materialized from the docmap (the analogue of V-key fetches).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import ast
from .engine import CompiledQuery, F32
from .parser import parse_query
from .reader import IndexReader
from .results import order_and_limit


def run_query(reader: IndexReader, q: ast.Query | str) -> pa.Table:
    if isinstance(q, str):
        q = parse_query(q)

    compiled = CompiledQuery(reader, q.filter)
    result = compiled.evaluate()
    docs = result.docs
    scores = compiled.final_scores(result)

    if q.order:
        # fetch field values for all matched docs (only fields used as keys)
        key_fields = [k.field for k in q.order if not k.score]
        field_vals: dict[str, list] = {}
        if key_fields and docs.size:
            t = reader.fetch_docs(docs, key_fields)
            for f in key_fields:
                field_vals[f] = t.column(f).to_pylist()
        rows = []
        for i in range(docs.size):
            keys = []
            for k in q.order:
                if k.score:
                    keys.append(float(scores[i]))
                else:
                    v = field_vals[k.field][i] if docs.size else None
                    if v is None:
                        v = k.default
                    keys.append(_normalize_key(v))
            rows.append((*keys, i))
        ordered = order_and_limit(rows, [k.desc for k in q.order], q.limit)
        sel = [r[-1] for r in ordered]
        docs = docs[sel]
        scores = scores[sel]
    elif q.limit is not None:
        docs = docs[: q.limit]
        scores = scores[: q.limit]

    return _materialize(reader, docs, scores, q.returns)


def _normalize_key(v):
    """Map a doc value to the reference's JSON value domain (timestamps and
    ints become numbers, like noise's all-numbers-are-f64)."""
    import datetime

    if isinstance(v, datetime.datetime):
        return v.timestamp()
    if isinstance(v, (np.integer, np.floating)):
        return float(v)
    return v


def _materialize(reader: IndexReader, docs: np.ndarray, scores: np.ndarray,
                 returns) -> pa.Table:
    cols: dict[str, pa.Array] = {}
    want_fields: list[str] = []
    if returns:
        for r in returns:
            if r in ("score()", "_id", "."):
                continue
            want_fields.append(r)
    key_cols = reader.manifest["key_columns"]
    fetch_cols = list(dict.fromkeys([*key_cols, *want_fields]))
    t = (reader.fetch_docs(docs, fetch_cols) if docs.size
         else None)
    out = {"doc_id": pa.array(docs, pa.int64())}
    for c in fetch_cols:
        if t is not None:
            out[c] = t.column(c)
        else:
            out[c] = pa.array([], pa.string())
    out["score"] = pa.array(scores.astype(np.float32), pa.float32())
    return pa.table(out)
