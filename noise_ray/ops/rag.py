"""Chunked retrieval (the RAG shape): chunk the corpus into overlapping
token windows, build an inverted index OVER THE CHUNKS, answer BM25
queries at chunk granularity, and collapse the hits to their parent
documents — "which documents contain the best-matching passage".

The pipeline composes pieces the repo already has:

    ops/text.chunk_documents  →  build/pipeline.build_index
         (fan-out map_batches)      (fields=("chunk_text",),
                                     key_columns=(doc_id, chunk_idx) —
                                     dense chunk ids assigned in parent
                                     order by the planner)
    →  ops/bm25.bm25_topk over the chunk index (k_chunks candidates)
    →  per-parent best chunk (field-collapse fold, ops/aggs shape)

Chunk stats are chunk-local by construction (N = chunk count, df/avgdl
over chunks), which is exactly what passage-level BM25 wants: a long
document no longer drowns its one relevant passage in its own length
normalization.  Every stage is the already-distributed machinery — the
chunker streams, the index build is the resumable shuffle pipeline, the
query fans out per doc range above 5M chunks — so the composite
inherits the 100 TB story of its parts.  The chunk corpus is written
shard-wise by the chunker (``write_parquet`` — nothing driver-sized);
the shards' key ranges overlap, so the index planner's distributed
global-sort fallback assigns the same deterministic dense chunk ids a
pre-sorted single file would get.

DuckDB oracle: ops/score_oracle.rag_search_sql replicates chunking,
chunk-level Okapi BM25 (4dp round), the k_chunks candidate cut and the
parent collapse, all on (doc_id, chunk_idx) keys — byte-exact.
"""

from __future__ import annotations

import os
import threading

import numpy as np
import pyarrow as pa

_CACHE_ROOT = "/tmp/noise_ray_cache"
_LOCK = threading.Lock()


def _corpus_tag(sf_dir: str) -> str:
    import re

    m = re.search(r"sf([0-9.]+)", sf_dir)
    return m.group(1) if m else re.sub(
        r"[^A-Za-z0-9._-]", "_", os.path.basename(sf_dir.rstrip("/")))


def chunks_index(sf_dir: str, size: int = 64, stride: int = 48):
    """Build (cached) the chunk-granularity index for a documents table:
    chunk rows written as parquet, then the standard index build with
    ``key_columns=("doc_id", "chunk_idx")`` — the planner assigns dense
    internal chunk ids in (parent, chunk) order, and the docmap stores
    the parent key for the collapse gather.  Returns an IndexReader."""
    from ..build import build_index
    from ..query.reader import IndexReader
    from .text import chunk_documents

    import glob

    root = os.path.join(
        _CACHE_ROOT, f"chunks-{_corpus_tag(sf_dir)}-{size}-{stride}-v2")
    marker = os.path.join(root, "index", "manifest.json")
    with _LOCK:
        if not os.path.exists(marker):
            corpus = os.path.join(root, "corpus")
            os.makedirs(corpus, exist_ok=True)

            def rename(b: pa.Table) -> pa.Table:
                # parent key renamed: the index assigns its OWN dense
                # doc_id per chunk (fetch_docs returns it by that name)
                return b.rename_columns(
                    ["parent_id" if c == "doc_id" else c
                     for c in b.column_names])

            # sharded write, nothing driver-sized; the chunk shards'
            # (parent, chunk) key ranges overlap, so build_index's
            # planner takes its distributed global-sort fallback and
            # assigns the same deterministic dense chunk ids a sorted
            # single file would get
            (chunk_documents(sf_dir, size, stride)
             .map_batches(rename, batch_format="pyarrow")
             .write_parquet(corpus))
            build_index(sorted(glob.glob(os.path.join(corpus, "*"))),
                        os.path.join(root, "index"),
                        fields=("chunk_text",),
                        key_columns=("parent_id", "chunk_idx"),
                        num_buckets=8)
        return IndexReader(os.path.join(root, "index"))


def rag_search(sf_dir: str, terms=("merge", "scan"), k: int = 10,
               k_chunks: int = 100, size: int = 64, stride: int = 48,
               k1: float = 1.2, b: float = 0.75) -> pa.Table:
    """Chunk-level BM25 retrieval collapsed to parent documents (module
    docstring).  Returns (doc_id, chunk_idx, score): each parent's best
    chunk among the top-``k_chunks`` candidates, top-``k`` parents by
    (rounded chunk score desc, doc_id asc)."""
    from .bm25 import bm25_topk

    reader = chunks_index(sf_dir, size, stride)
    top = bm25_topk(sf_dir, tuple(terms), k=k_chunks, k1=k1, b=b,
                    field="chunk_text", index_dir=reader.index_dir)
    cids = top.column("doc_id").to_numpy()  # internal chunk ordinals
    r4 = top.column("score").to_numpy()
    if not cids.size:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "chunk_idx": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})
    meta = reader.fetch_docs(np.sort(cids), ["parent_id", "chunk_idx"])
    by_cid = dict(zip(np.sort(cids).tolist(),
                      zip(meta.column("parent_id").to_pylist(),
                          meta.column("chunk_idx").to_pylist())))
    # candidates arrive ranked (r4 desc, internal chunk id asc) ==
    # (r4 desc, parent asc, chunk_idx asc); first hit per parent wins
    best: dict[int, tuple[int, float]] = {}
    for cid, s in zip(cids.tolist(), r4.tolist()):
        parent, cidx = by_cid[cid]
        if parent not in best:
            best[parent] = (cidx, s)
    rows = sorted(((p, ci, s) for p, (ci, s) in best.items()),
                  key=lambda r: (-r[2], r[0]))[:k]
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "chunk_idx": pa.array([r[1] for r in rows], pa.int64()),
        "score": pa.array([r[2] for r in rows], pa.float64()),
    })
