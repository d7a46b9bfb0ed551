"""Retrieve-then-rerank: first-stage BM25 candidates, second-stage
re-scoring over the candidates' stored text.

The two-stage shape is the standard scale pattern for model-based
ranking: stage 1 touches the INDEX (posting lists, distributed fan-out,
ops/bm25.py) to cut the corpus to ``k_retrieve`` candidates; stage 2
touches only those candidates' stored fields.  Here the second stage is
a deterministic lexical feature scorer — coverage (distinct query terms
present) weighted above density (query-term tf / doc length) — standing
in for a neural cross-encoder (no model weights ship in this
environment): the plumbing (candidate fetch from the doc store,
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


def mmr_rerank(sf_dir: str, terms: tuple[str, ...] = DEFAULT_TERMS,
               k: int = 10, n_cand: int = 20, lam: float = 0.7):
    """MMR-diversified retrieval (Carbonell & Goldstein, SIGIR 1998):
    greedy maximal-marginal-relevance selection over the BM25
    candidate set, trading relevance against redundancy —
    ``mmr(i) = λ·rel(i) − (1−λ)·max_{j∈S} cos(emb_i, emb_j)``.

    Stage 1 is the distributed BM25 top-``n_cand`` (relevance = the
    4dp-rounded score); stage 2 gathers ONLY the candidates'
    embeddings (vec_id == doc_id, the hybrid-search correspondence)
    and runs the greedy loop driver-side over the ≤ n_cand×n_cand
    cosine matrix — candidate-bounded by construction, like every
    second stage here.  Per-round mmr values are rounded to 6dp and
    ties break toward the smaller doc_id, which makes the unrolled
    greedy SQL oracle (ops/score_oracle.mmr_rerank_sql — one
    MATERIALIZED CTE pair per round) an exact value check.  Cosine is
    computed as dot/(|a|·|b|) in f64, DuckDB's formula.  Returns
    (rank, doc_id, mmr)."""
    import numpy as np
    import pyarrow.parquet as pq

    cand = bm25_topk(sf_dir, tuple(terms), k=n_cand)
    ids = cand.column("doc_id").to_numpy()
    rel = cand.column("score").to_numpy()  # 4dp-rounded
    empty = pa.table({"rank": pa.array([], pa.int64()),
                      "doc_id": pa.array([], pa.int64()),
                      "mmr": pa.array([], pa.float64())})
    if not ids.size:
        return empty
    from .similarity import embed_matrix

    et = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"],
                       filters=[("vec_id", "in", ids.tolist())])
    evids = et.column("vec_id").to_numpy()
    # inner-join semantics: keep candidates that have an embedding,
    # in candidate (rounded score desc, doc_id asc) order
    pos = {int(v): i for i, v in enumerate(evids)}
    keep = np.array([int(d) in pos for d in ids], bool)
    ids, rel = ids[keep], rel[keep]
    if not ids.size:
        return empty
    m = embed_matrix(et.column("embedding"))
    m = m[[pos[int(d)] for d in ids]]
    norms = np.sqrt((m * m).sum(axis=1))
    n = ids.size
    selected: list[int] = []
    out_r, out_d, out_m = [], [], []
    # round 1: pure relevance (same 6dp contract as later rounds)
    first_scores = np.round(lam * rel, 6)
    i0 = int(np.lexsort((ids, -first_scores))[0])
    selected.append(i0)
    out_r.append(1)
    out_d.append(int(ids[i0]))
    out_m.append(float(first_scores[i0]))
    while len(selected) < min(k, n):
        srows = m[selected]
        snorms = norms[selected]
        rest = np.setdiff1d(np.arange(n), np.array(selected))
        # duckdb's cosine: dot / (|a|·|b|), f64
        cos = (m[rest] @ srows.T) / np.outer(norms[rest], snorms)
        mmr = np.round(lam * rel[rest] - (1.0 - lam) * cos.max(axis=1), 6)
        j = int(np.lexsort((ids[rest], -mmr))[0])
        pick = int(rest[j])
        selected.append(pick)
        out_r.append(len(selected))
        out_d.append(int(ids[pick]))
        out_m.append(float(mmr[j]))
    return pa.table({"rank": pa.array(out_r, pa.int64()),
                     "doc_id": pa.array(out_d, pa.int64()),
                     "mmr": pa.array(out_m, pa.float64())})
