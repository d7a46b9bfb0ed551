"""Retrieve-then-rerank: first-stage BM25 candidates, second-stage
re-scoring over the candidates' stored text.

The two-stage shape is the standard scale pattern for model-based
ranking: stage 1 touches the INDEX (posting lists, distributed fan-out,
ops/bm25.py) to cut the corpus to ``k_retrieve`` candidates; stage 2
touches only those candidates' stored fields.  Here the second stage is
a deterministic lexical feature scorer — coverage (distinct query terms
present) weighted above density (query-term tf / doc length) — standing
in for a cross-encoder exactly like the multimodal decode stub stands in
for a real decoder: the plumbing (candidate fetch from the doc store,
bounded second-stage cost, rerank-then-cut) is real and oracle-checked,
and a model scorer drops in as an actor-pool ``map_batches`` stage when
candidate sets are large enough to warrant one.

Determinism: rerank scores are exact rationals computed identically in
SQL (coverage * 10 + tf_sum/len, rounded to 6dp), ordered by (rerank
desc, doc_id asc).
"""

from __future__ import annotations

import re

import pyarrow as pa

from .bm25 import DEFAULT_TERMS, bm25_topk

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def _rerank_score(text: str, terms: tuple[str, ...]) -> float:
    toks = _TOKEN_RE.findall(text.lower())
    if not toks:
        return 0.0
    tset = set(terms)
    coverage = len(tset & set(toks))
    tf_sum = sum(1 for t in toks if t in tset)
    return coverage * 10.0 + tf_sum / len(toks)


def rerank_topk(sf_dir: str, terms: tuple[str, ...] = DEFAULT_TERMS,
                k_retrieve: int = 100, k_final: int = 10,
                index_dir: str | None = None) -> pa.Table:
    """BM25 top-``k_retrieve`` -> rerank -> top-``k_final``.
    Returns (doc_id, rerank) with rerank rounded to 6dp."""
    from ..pipelines import documents_index

    cand = bm25_topk(sf_dir, terms=terms, k=k_retrieve,
                     index_dir=index_dir)
    ids = cand.column("doc_id").to_pylist()
    if not ids:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "rerank": pa.array([], pa.float64())})
    if index_dir is not None:
        from ..query.distributed import _cached_reader

        reader = _cached_reader(index_dir)
    else:
        reader = documents_index(sf_dir)
    import numpy as np

    t = reader.fetch_docs(np.asarray(ids, np.int64), ["text"])
    scored = sorted(
        ((int(d), round(_rerank_score(s, terms), 6))
         for d, s in zip(t.column("doc_id").to_pylist(),
                         t.column("text").to_pylist())),
        key=lambda p: (-p[1], p[0]))[:k_final]
    return pa.table({
        "doc_id": pa.array([d for d, _ in scored], pa.int64()),
        "rerank": pa.array([s for _, s in scored], pa.float64()),
    })
