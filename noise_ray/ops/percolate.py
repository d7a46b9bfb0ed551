"""Percolator: reverse search — registered queries matched against a
document STREAM (cf. Elasticsearch's percolate query / Lucene Monitor).

The routing/alerting shape: N standing queries are registered up front,
and every incoming document reports which queries it satisfies.  For an
LLM data pipeline this is the standing-classifier stage — route each
crawled doc to the data-mix buckets whose predicates it matches — so
the implementation is a pure Ray Data streaming pass, not an index op:

    read_parquet → map_batches(_Percolator, actor pool) → (doc, query)

Each registered query is a bag of surface terms plus a
minimum-should-match count ``m`` (``m = len(terms)`` is AND, ``1`` is
OR — the same reduction ops/bm25.py uses).  Matching is UNANALYZED
(raw ``[a-z0-9]+`` tokens, no stemming), like a percolated term query
on a keyword field, which keeps the DuckDB oracle byte-exact.

The per-batch kernel is fully vectorized (no per-row Python): one
``tokenize_hashes`` pass (ops/hashing.py) over the batch, distinct
(row, token-hash) pairs by lexsort+mask, a ``searchsorted`` probe into
the sorted registered-term hash table, CSR expansion term→queries, and
a bincount of distinct matched terms per (row, query).  The registered
index builds once per WORKER PROCESS (module-level cache keyed by the
query spec — the same persistence trick the build tokenizer relies on:
task-based ``map_batches``, so no actor-pool ramp-up lag, while the
KB-sized state still constructs once, not per batch).
Same 64-bit-hash caveat as ops/text.token_stats: a within-batch
collision is the only failure mode, vanishingly unlikely.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

# (terms, min_match) per registered query; query_id = position
DEFAULT_QUERIES = (
    (("merge", "scan"), 2),
    (("row", "column"), 1),
    (("fast", "slow", "batch"), 2),
)


_PERC_CACHE: dict = {}


def _percolator_for(qspec) -> "_Percolator":
    """Worker-process-cached matcher (keyed by the query spec): tasks on
    the same worker reuse the built hash index across batches."""
    p = _PERC_CACHE.get(qspec)
    if p is None:
        if len(_PERC_CACHE) > 8:
            _PERC_CACHE.clear()
        p = _PERC_CACHE[qspec] = _Percolator(qspec)
    return p


class _Percolator:
    """Registered-query hash index built once (module cache above),
    vectorized matching in __call__ (per batch)."""

    def __init__(self, qspec):
        from .hashing import hash_string_array

        pairs = []  # (term_hash, qid)
        self.m = np.array([int(m) for _, m in qspec], np.int64)
        for qid, (terms, _) in enumerate(qspec):
            hs = hash_string_array(pa.array(sorted(set(terms)),
                                            pa.string()))
            pairs.extend((int(h), qid) for h in hs)
        pairs.sort()
        self.term_hashes = np.array([h for h, _ in pairs], np.uint64)
        qids = np.array([q for _, q in pairs], np.int64)
        # CSR over the UNIQUE hash table: one term may feed many queries
        uniq, start = np.unique(self.term_hashes, return_index=True)
        self.uniq_hashes = uniq
        self.indptr = np.append(start, self.term_hashes.size)
        self.qid_data = qids  # already grouped by hash via the sort
        self.n_queries = len(qspec)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .hashing import tokenize_hashes

        hashes, offs = tokenize_hashes(batch.column("text"))
        counts = np.diff(offs)
        rows = np.repeat(np.arange(counts.size, dtype=np.int64), counts)
        if not hashes.size:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "query_id": pa.array([], pa.int64())})
        # distinct (row, hash): each term counts once per doc
        order = np.lexsort((hashes, rows))
        h, r = hashes[order], rows[order]
        keep = np.ones(h.size, bool)
        keep[1:] = (h[1:] != h[:-1]) | (r[1:] != r[:-1])
        h, r = h[keep], r[keep]
        # probe the registered-term table
        idx = np.searchsorted(self.uniq_hashes, h)
        idx[idx == self.uniq_hashes.size] = 0
        hit = self.uniq_hashes[idx] == h
        r, idx = r[hit], idx[hit]
        if not r.size:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "query_id": pa.array([], pa.int64())})
        # CSR expansion: matched (row, term) -> every query using the term
        starts, ends = self.indptr[idx], self.indptr[idx + 1]
        reps = ends - starts
        rr = np.repeat(r, reps)
        flat = np.repeat(starts - np.concatenate(
            ([0], np.cumsum(reps)[:-1])), reps) + np.arange(reps.sum())
        qq = self.qid_data[flat]
        # distinct matched-term count per (row, query): (row, term) pairs
        # are distinct and a qid appears once per term, so just bincount
        key = rr * self.n_queries + qq
        uniq_key, cnt = np.unique(key, return_counts=True)
        urow, uq = uniq_key // self.n_queries, uniq_key % self.n_queries
        ok = cnt >= self.m[uq]
        urow, uq = urow[ok], uq[ok]
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": pa.array(doc_ids[urow], pa.int64()),
                         "query_id": pa.array(uq, pa.int64())})


def percolate(sf_dir: str, queries=DEFAULT_QUERIES,
              concurrency: int = 8) -> ray.data.Dataset:
    """(doc_id, query_id) for every registered query each document
    matches (module docstring).  A lazy streaming Dataset — consume
    with write_parquet / aggregate; nothing corpus-sized materializes."""
    qspec = tuple((tuple(t), int(m)) for t, m in queries)

    def match(batch: pa.Table) -> pa.Table:
        return _percolator_for(qspec)(batch)

    # task-based (not an actor pool): stateless tasks schedule with no
    # pool ramp-up, and the worker-process module cache keeps the
    # registered index warm across tasks — the build tokenizer's trick
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(match, batch_format="pyarrow")
