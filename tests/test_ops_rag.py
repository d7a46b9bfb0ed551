"""Chunked retrieval (ops/rag.py): chunk-level BM25 collapsed to parent
docs — checked against a full raw-text recomputation (chunking, chunk
BM25 with chunk-local stats, candidate cut, parent collapse)."""

import collections
import math
import re

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _raw_rag(terms, k, k_chunks, size, stride, k1=1.2, b=0.75):
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"])
    chunks = []  # (doc, ci, tokens)
    for d, s in zip(t.column("doc_id").to_pylist(),
                    t.column("text").to_pylist()):
        toks = re.findall(r"[a-z0-9]+", s.lower())
        n = len(toks)
        for ci, start in enumerate(range(0, n, stride)):
            if start and start + size - stride >= n:
                break
            chunks.append((d, ci, toks[start:start + size]))
    n = len(chunks)
    avgdl = sum(len(c[2]) for c in chunks) / n
    df = collections.Counter()
    for _, _, toks in chunks:
        for term in set(toks) & set(terms):
            df[term] += 1
    scored = []
    for d, ci, toks in chunks:
        cnt = collections.Counter(toks)
        s = 0.0
        for term in terms:
            tf = cnt.get(term, 0)
            if tf:
                idf = math.log(1.0 + (n - df[term] + 0.5) / (df[term] + 0.5))
                s += idf * tf * (k1 + 1.0) / (
                    tf + k1 * (1.0 - b + b * len(toks) / avgdl))
        if s > 0.0:
            scored.append((d, ci, round(s, 4)))
    cand = sorted(scored, key=lambda r: (-r[2], r[0], r[1]))[:k_chunks]
    best = {}
    for d, ci, s in cand:  # already in rank order: first wins per parent
        if d not in best:
            best[d] = (ci, s)
    return sorted(((d, ci, s) for d, (ci, s) in best.items()),
                  key=lambda r: (-r[2], r[0]))[:k]


def test_rag_search_matches_raw_recomputation(ray_session):
    from noise_ray.ops.rag import rag_search

    want = _raw_rag(("merge", "scan"), 10, 100, 64, 48)
    got = rag_search(SF)
    rows = list(zip(got.column("doc_id").to_pylist(),
                    got.column("chunk_idx").to_pylist(),
                    got.column("score").to_pylist()))
    assert rows == want
    assert len(rows) == 10
    # parents are distinct (the collapse really collapsed)
    assert len({d for d, _, _ in rows}) == len(rows)


def test_rag_chunk_stats_are_passage_local(ray_session):
    """A multi-chunk doc's best passage outranks whole-doc scoring bias:
    chunk dl <= size, so the reported score uses passage length — any
    returned chunk_idx > 0 proves a non-leading passage can win."""
    from noise_ray.ops.rag import rag_search

    got = rag_search(SF, k=200, k_chunks=500)
    idxs = got.column("chunk_idx").to_pylist()
    assert any(ci > 0 for ci in idxs)
