"""True BM25 (Okapi, k1/b) top-k straight off the inverted index.

The engine's native scorer reproduces the reference's TF-IDF formula
bit-for-bit (query/engine.py — that is the parity contract).  This
operator adds the standard BM25 ranking the north rule names, computed
from exactly the index artifacts the posting lists already carry: per
posting ``tfs`` (term frequency) and ``lens`` (field length), per term
the doc frequency (posting length), and corpus stats from the manifest
(``N`` docs, ``field_k`` total tokens → ``avgdl``).  No extra pass over
the corpus: scoring k terms touches k posting lists.

``idf_t = ln(1 + (N - df + 0.5) / (df + 0.5))`` (the Lucene/standard
non-negative variant) and
``score = Σ_t idf_t · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))``.

Determinism: scores are f64, rounded to 4dp, ordered by (rounded score
desc, doc_id asc) on BOTH sides — the same cross-engine contract as the
other scored oracles (ops/score_oracle.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DEFAULT_TERMS = ("merge", "scan")


def _field_total_tokens(reader, fid: int) -> float:
    """Total token count of one field = Σ per-term C over the stats
    sidecar (term-cardinality-sized, one filtered column read per stats
    partition; the manifest's field_k is the reference's K = distinct
    (doc, stem) count, which is NOT the BM25 avgdl numerator).  Memoized
    on the reader; epochs recurse."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    cache = getattr(reader, "_bm25_tok_totals", None)
    if cache is None:
        cache = reader._bm25_tok_totals = {}
    if fid in cache:
        return cache[fid]
    total = 0
    for paths in reader._stats_by_bucket.values():
        for p in paths:
            t = pq.read_table(p, columns=["c"],
                              filters=[("field", "==", fid)])
            if t.num_rows:
                total += int(pc.sum(t.column("c")).as_py())
    for e in getattr(reader, "_epochs", ()):
        total += _field_total_tokens(e, fid)
    cache[fid] = float(total)
    return cache[fid]


def bm25_topk(sf_dir: str, terms: tuple[str, ...] = DEFAULT_TERMS,
              k: int = 20, k1: float = 1.2, b: float = 0.75,
              field: str = "text") -> pa.Table:
    """BM25 top-``k`` over the documents index for a bag of ``terms``
    (terms must be their own stem on this corpus, like every term-oracle
    entry).  Returns (doc_id, score) with score rounded to 4dp."""
    from ..query.engine import _stem_one
    from ..pipelines import documents_index

    reader = documents_index(sf_dir)
    n_docs = float(reader.num_docs)
    fid = reader.field_id[field]
    avgdl = _field_total_tokens(reader, fid) / n_docs

    all_docs: list[np.ndarray] = []
    all_scores: list[np.ndarray] = []
    for t in terms:
        pl = reader.postings(field, _stem_one(t), need_positions=False)
        if pl is None or pl.docs.size == 0:
            continue
        df = float(pl.docs.size)
        idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        tf = pl.tfs.astype(np.float64)
        dl = pl.lens.astype(np.float64)
        contrib = idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b
                                                      + b * dl / avgdl))
        all_docs.append(pl.docs.astype(np.int64))
        all_scores.append(contrib)
    if not all_docs:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})
    docs = np.concatenate(all_docs)
    scores = np.concatenate(all_scores)
    # fold per-doc contributions in term order (stable over sorted docs)
    order = np.argsort(docs, kind="stable")
    docs, scores = docs[order], scores[order]
    uniq, starts = np.unique(docs, return_index=True)
    summed = np.add.reduceat(scores, starts)
    tomb = reader.tombstones
    if tomb.size:
        live = ~np.isin(uniq, tomb)
        uniq, summed = uniq[live], summed[live]
    r4 = np.round(summed, 4)
    top = np.lexsort((uniq, -r4))[:k]  # rounded score desc, doc_id asc
    return pa.table({"doc_id": pa.array(uniq[top], pa.int64()),
                     "score": pa.array(r4[top], pa.float64())})
