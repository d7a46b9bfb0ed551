"""Similarity search over the ``embeddings`` table.

Brute-force cosine top-k is the oracle-checkable baseline: the query matrix
is broadcast once (``ray.put``) and each ``map_batches`` task computes a
partial top-k against its batch (numpy matmul); the driver merges partial
heaps.  The LSH-bucketed variant is the 100 TB scale path: random-hyperplane
bucket keys turn the all-pairs problem into a bounded groupby.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def embed_matrix(col: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    """Zero-copy-ish (n, dim) float64 matrix from a fixed-width list column
    (avoids to_pylist + np.stack row materialization)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.zeros((0, 0))
    vals = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return vals.reshape(n, -1)


def _load_queries(sf_dir: str, n_queries: int):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
                      filters=[("vec_id", "<", n_queries)])
    q = embed_matrix(t.column("embedding"))
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    return t.column("vec_id").to_numpy(), qn


def ann_topk_bruteforce(sf_dir: str, n_queries: int = 5, k: int = 10):
    """Exact cosine top-k of each query vector against the corpus
    (vec_id >= n_queries).  Output (query_id, rank, vec_id)."""
    qids, qn = _load_queries(sf_dir, n_queries)
    q_ref = ray.put(qn)

    def partial_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        ids = batch.column("vec_id").to_numpy()
        keep = ids >= n_queries
        if not keep.any():
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        ids = ids[keep]
        m = embed_matrix(batch.column("embedding"))[keep]
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        sims = q @ mn.T  # (nq, nb)
        out_q, out_v, out_s = [], [], []
        kk = min(k, ids.size)
        for qi in range(q.shape[0]):
            # partial top-k per batch; ties resolved at the final merge
            top = np.argpartition(-sims[qi], kk - 1)[:kk]
            out_q.extend([int(qids[qi])] * top.size)
            out_v.extend(ids[top].tolist())
            out_s.extend(sims[qi][top].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    parts = (
        ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                              columns=["vec_id", "embedding"])
        .map_batches(partial_topk, batch_format="pyarrow", batch_size=4096)
    )
    t = pa.concat_tables(ray.get(parts.to_arrow_refs()))
    # driver-side final merge: tiny (n_queries × k per input block)
    out_q, out_r, out_v = [], [], []
    tq = t.column("query_id").to_numpy()
    tv = t.column("vec_id").to_numpy()
    ts = t.column("sim").to_numpy()
    for qid in sorted(set(qids.tolist())):
        m = tq == qid
        v, s = tv[m], ts[m]
        order = np.lexsort((v, -s))[:k]  # sim desc, vec_id asc
        for r, i in enumerate(order, 1):
            out_q.append(int(qid))
            out_r.append(r)
            out_v.append(int(v[i]))
    return pa.table({"query_id": pa.array(out_q, pa.int64()),
                     "rank": pa.array(out_r, pa.int64()),
                     "vec_id": pa.array(out_v, pa.int64())})


class _HyperplaneBucket:
    """Actor-pool stage: random-hyperplane LSH bucket key per vector."""

    def __init__(self, dim: int, n_planes: int, seed: int = 777):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_planes, dim))

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = embed_matrix(batch.column("embedding"))
        bits = (m @ self.planes.T) > 0
        keys = (bits.astype(np.uint32) << np.arange(bits.shape[1], dtype=np.uint32)).sum(axis=1)
        return pa.table({"vec_id": batch.column("vec_id"),
                         "bucket": pa.array(keys, pa.int64()),
                         "label": batch.column("label")})


def ann_bucketed(sf_dir: str, n_planes: int = 8):
    """LSH-bucketed index layout: (bucket, n_vectors) histogram — the
    candidate-pruning structure for ANN at scale.  Rows-only check."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Count

    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    first = next(pf.iter_batches(batch_size=1, columns=["embedding"]))
    dim = len(first.column("embedding")[0])
    return (
        ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
        .map_batches(_HyperplaneBucket, batch_format="pyarrow",
                     fn_constructor_kwargs={"dim": dim, "n_planes": n_planes},
                     concurrency=(1, 4))
        .groupby("bucket")
        .aggregate(Count(alias_name="n_vectors"))
        .sort("bucket")
    )
