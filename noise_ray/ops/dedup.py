"""Deduplication operators over the ``documents`` table.

The large-scale training-data cleaning suite: exact (hash) dedup,
MinHash+LSH near-dup, SimHash near-dup, n-gram Jaccard, and
embedding-cosine near-dup.  Exact and brute-force variants have DuckDB
oracles; the LSH/banded variants are the 100 TB scale paths (candidate
generation via groupby on band keys — a bounded shuffle of small keys, not
an all-pairs join).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Min

_WORD_RE = re.compile(r"[a-z0-9]+")


def _read_docs(sf_dir: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def dedup_exact(sf_dir: str):
    """Keep the smallest doc_id per exact text: hash-partition by content
    hash, per-group min — one bounded shuffle of (hash, doc_id) pairs."""
    def h(batch: pa.Table) -> pa.Table:
        return pa.table({
            "h": pa.array([_md5(t) for t in batch.column("text").to_pylist()]),
            "doc_id": batch.column("doc_id"),
        })

    return (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(h, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min("doc_id", alias_name="doc_id"))
        .select_columns(["doc_id"])
        .sort("doc_id")
    )


def _shingles(text: str, n: int = 3) -> set:
    toks = _WORD_RE.findall(text.lower())
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.5, max_doc: int = 300):
    """Brute-force n-gram Jaccard pairs within a doc_id block (the oracle-
    checkable baseline; LSH below is the scale path).  Output (a_id, b_id)
    with a_id < b_id < max_doc and jaccard >= threshold."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    # filter pushed into the parquet read: only the bounded doc block
    # (row-group pruned) is ever materialized, however large the corpus
    t = pa.concat_tables(ray.get(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
            filter=pads.field("doc_id") < max_doc,
        ).to_arrow_refs()))
    t = t.filter(pc.less(t.column("doc_id"), max_doc))  # exact residue
    ids = np.asarray(t.column("doc_id").to_numpy())
    texts = t.column("text").to_pylist()
    sh = [ _shingles(x) for x in texts ]
    order = np.argsort(ids)
    pairs_a, pairs_b = [], []
    for ii in range(len(order)):
        i = order[ii]
        for jj in range(ii + 1, len(order)):
            j = order[jj]
            a, b = sh[i], sh[j]
            if not a and not b:
                continue
            inter = len(a & b)
            union = len(a | b)
            if union and inter / union >= threshold:
                pairs_a.append(int(ids[i]))
                pairs_b.append(int(ids[j]))
    return pa.table({"a_id": pa.array(pairs_a, pa.int64()),
                     "b_id": pa.array(pairs_b, pa.int64())})


def _minhash_sig(shingles: set, num_hashes: int, seeds: np.ndarray) -> np.ndarray:
    if not shingles:
        return np.full(num_hashes, np.iinfo(np.uint64).max, dtype=np.uint64)
    base = np.array(
        [int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
         for s in shingles],
        dtype=np.uint64,
    )
    # xor-multiply-shift family per seed, vectorized over shingles
    sig = np.empty(num_hashes, dtype=np.uint64)
    for k in range(num_hashes):
        h = (base ^ seeds[k]) * np.uint64(0x9E3779B97F4A7C15)
        sig[k] = h.min()
    return sig


class _MinHashBatch:
    """Actor-pool stage: shingle → MinHash signature → LSH band keys."""

    def __init__(self, num_hashes: int, bands: int):
        self.num_hashes = num_hashes
        self.bands = bands
        self.rows = num_hashes // bands
        rng = np.random.default_rng(12345)
        self.seeds = rng.integers(0, 2**63, size=num_hashes, dtype=np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_band, out_key, out_doc = [], [], []
        for doc, text in zip(batch.column("doc_id").to_pylist(),
                             batch.column("text").to_pylist()):
            sig = _minhash_sig(_shingles(text), self.num_hashes, self.seeds)
            for b in range(self.bands):
                chunk = sig[b * self.rows : (b + 1) * self.rows]
                key = hashlib.md5(chunk.tobytes() + bytes([b])).hexdigest()[:16]
                out_band.append(b)
                out_key.append(key)
                out_doc.append(doc)
        return pa.table({
            "band": pa.array(out_band, pa.int32()),
            "key": pa.array(out_key, pa.string()),
            "doc_id": pa.array(out_doc, pa.int64()),
        })


def minhash_lsh_pairs(sf_dir: str, num_hashes: int = 64, bands: int = 16):
    """MinHash+LSH near-duplicate candidate pairs: signatures in an
    actor-pool map_batches, then ONE groupby on (band, key) — each bucket
    emits its pairs.  Scale path: bucket sizes are bounded by signature
    collisions, never by corpus size."""
    def bucket_pairs(group: pa.Table) -> pa.Table:
        docs = sorted(group.column("doc_id").to_pylist())
        a, b = [], []
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                a.append(docs[i])
                b.append(docs[j])
        return pa.table({"a_id": pa.array(a, pa.int64()),
                         "b_id": pa.array(b, pa.int64())})

    pairs = (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(_MinHashBatch, batch_format="pyarrow",
                     fn_constructor_kwargs={"num_hashes": num_hashes, "bands": bands},
                     concurrency=(1, 4))
        .groupby(["band", "key"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    t = pa.concat_tables(ray.get(pairs.to_arrow_refs()))
    if t.num_rows == 0:
        return t
    # dedup candidate pairs discovered in multiple bands
    import pyarrow.compute as pc

    key = pc.add(pc.multiply(t.column("a_id"), 10_000_000), t.column("b_id"))
    idx = np.unique(key.to_numpy(), return_index=True)[1]
    return t.take(np.sort(idx))


def simhash_pairs(sf_dir: str, hamming: int = 3):
    """SimHash near-dup: 64-bit signature from token hashes; candidates via
    4-way band tables (any identical 16-bit quarter → a pair survives the
    banding iff hamming<=3 guarantees one identical quarter, pigeonhole),
    verified by Hamming distance.

    Scale path: signatures in map_batches, candidates via ONE
    groupby((quarter_idx, quarter_value)) carrying the full signature —
    bucket-local pair verification, no all-pairs join and no driver-side
    signature table."""
    _BITS = np.arange(64, dtype=np.uint64)

    def sig_batch(batch: pa.Table) -> pa.Table:
        sigs = []
        for text in batch.column("text").to_pylist():
            toks = _WORD_RE.findall(text.lower())
            if toks:
                hs = np.array(
                    [int.from_bytes(hashlib.md5(t.encode()).digest()[:8],
                                    "little") for t in toks],
                    dtype=np.uint64)
                bits = (hs[:, None] >> _BITS[None, :]) & np.uint64(1)
                acc = (2 * bits.astype(np.int64) - 1).sum(axis=0)
            else:
                acc = np.zeros(64, dtype=np.int64)
            sig = np.uint64(0)
            for bit in np.flatnonzero(acc > 0):
                sig |= np.uint64(1) << np.uint64(bit)
            sigs.append(int(sig))
        docs = batch.column("doc_id").to_pylist()
        out_q, out_key, out_doc, out_sig = [], [], [], []
        for doc, sig in zip(docs, sigs):
            for q in range(4):
                out_q.append(q)
                out_key.append((sig >> (16 * q)) & 0xFFFF)
                out_doc.append(doc)
                out_sig.append(sig)
        return pa.table({
            "q": pa.array(out_q, pa.int32()),
            "key": pa.array(out_key, pa.int32()),
            "doc_id": pa.array(out_doc, pa.int64()),
            "sig": pa.array(out_sig, pa.uint64()),
        })

    def bucket_pairs(group: pa.Table) -> pa.Table:
        order = np.argsort(group.column("doc_id").to_numpy())
        docs = group.column("doc_id").to_numpy()[order]
        sigs = group.column("sig").to_numpy()[order]
        a, b = [], []
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                if bin(int(sigs[i]) ^ int(sigs[j])).count("1") <= hamming:
                    a.append(int(docs[i]))
                    b.append(int(docs[j]))
        return pa.table({"a_id": pa.array(a, pa.int64()),
                         "b_id": pa.array(b, pa.int64())})

    pairs = (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(sig_batch, batch_format="pyarrow")
        .groupby(["q", "key"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    t = pa.concat_tables(ray.get(pairs.to_arrow_refs()))
    if t.num_rows == 0:
        return pa.table({"a_id": pa.array([], pa.int64()),
                         "b_id": pa.array([], pa.int64())})
    a = t.column("a_id").to_numpy()
    b = t.column("b_id").to_numpy()
    key = a * 10_000_000 + b
    idx = np.unique(key, return_index=True)[1]
    idx = idx[np.argsort(key[idx], kind="stable")]
    return pa.table({"a_id": pa.array(a[idx], pa.int64()),
                     "b_id": pa.array(b[idx], pa.int64())})


def embedding_dup_pairs(sf_dir: str, threshold: float = 0.45):
    """Embedding-cosine near-dup pairs (brute force, oracle-checkable)."""
    t = pa.concat_tables(ray.get(
        ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                              columns=["vec_id", "embedding"]).to_arrow_refs()))
    ids = t.column("vec_id").to_numpy()
    from .similarity import embed_matrix
    m = embed_matrix(t.column("embedding"))
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mn = m / norms
    sims = mn @ mn.T
    iu = np.triu_indices(len(ids), k=1)
    mask = sims[iu] >= threshold
    order = np.argsort(ids)
    # ids are already sorted in the file; emit (min,max) id pairs sorted
    a = ids[iu[0][mask]]
    b = ids[iu[1][mask]]
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    key = np.argsort(lo * 10_000_000 + hi)
    return pa.table({"a_id": pa.array(lo[key], pa.int64()),
                     "b_id": pa.array(hi[key], pa.int64())})
