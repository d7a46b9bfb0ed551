"""Distributed query execution: range-partitioned scoring fan-out.

The SURVEY §3.2 query path for cluster scale: the doc space is split into
contiguous doc_id ranges; one Ray task per range evaluates the query
restricted to its range (``CompiledQuery(doc_range=...)``) and returns its
local candidates — for scored top-k queries only the local top k plus every
tie at the local k-th score (a doc outside its range's top k is beaten by
>= k docs of that range alone, so it can never reach the global top k; ties
at the cut are kept so the global tie-break machinery sees every
contender).  The driver concatenates candidates in doc order and applies
the SAME buffered order/limit machinery as the local path, so results are
bit-identical to single-process evaluation.

Exactness rests on per-doc independence: every filter decision and every
score component (tf, field_len, idf from GLOBAL stats, query_norm) depends
only on the doc itself and index-wide statistics, never on other matched
docs.  Workers open the manifest independently and cache readers
process-wide (one open per worker per index version).

Aggregate-return queries also work: matches stream back per range and the
order-sensitive aggregate fold runs on the driver over the doc-ordered
concatenation — the identical row stream the local path folds.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from . import ast
from .engine import F32, CompiledQuery
from .parser import parse_query, ret_leaves
from .reader import IndexReader

_READER_CACHE: dict[tuple, IndexReader] = {}


def _cached_reader(index_dir: str) -> IndexReader:
    import os

    from ..build.incremental import _epoch_dirs

    try:
        tomb_mtime = os.stat(os.path.join(index_dir, "tombstones.json")).st_mtime_ns
    except FileNotFoundError:
        tomb_mtime = 0
    # key includes the published-epoch set (an incremental add must refresh
    # cached readers even when it tombstoned nothing) AND the manifest
    # mtime (compaction swaps in a new manifest with no epochs and no
    # tombstones — indistinguishable from the original build otherwise)
    man_mtime = os.stat(os.path.join(index_dir, "manifest.json")).st_mtime_ns
    key = (index_dir, man_mtime, tomb_mtime,
           tuple(os.path.basename(d) for d in _epoch_dirs(index_dir)))
    r = _READER_CACHE.get(key)
    if r is None:
        r = _READER_CACHE[key] = IndexReader(index_dir)
    return r


@ray.remote
def _eval_range_task(index_dir: str, qtext: str, params: dict | None,
                     lo: int, hi: int, keep_topk: int | None):
    reader = _cached_reader(index_dir)
    q = parse_query(qtext, params)
    cq = CompiledQuery(reader, q.filter, doc_range=(lo, hi))
    res = cq.evaluate()
    docs = res.docs
    scores = cq.final_scores(res)
    if keep_topk is not None and docs.size > keep_topk:
        # local top-k + ties at the k-th score (float64 view is fine for
        # selection: equal f32s are equal f64s)
        kth = np.partition(scores, docs.size - keep_topk)[docs.size - keep_topk]
        keep = scores >= kth
        docs, scores = docs[keep], scores[keep]
    return docs, scores.astype(F32)


def run_query_distributed(index_dir: str, query: str,
                          params: dict | None = None,
                          num_partitions: int | None = None) -> pa.Table:
    """Evaluate ``query`` with one Ray task per doc range; results are
    identical to ``run_query`` on a local reader."""
    from . import executor as ex

    reader = _cached_reader(index_dir)
    q = parse_query(query, params)

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(1, min(cpus, reader.num_docs // 10_000 + 1))
    span = max(1, -(-reader.num_docs // num_partitions))
    ranges = [(lo, min(lo + span, reader.num_docs))
              for lo in range(0, reader.num_docs, span)]

    # scored-top-k queries prune to local top-k in the workers
    keep_topk = None
    if (q.limit and q.order and len(q.order) == 1 and q.order[0].score
            and q.order[0].desc):
        keep_topk = q.limit

    parts = ray.get([
        _eval_range_task.remote(index_dir, query, params, lo, hi, keep_topk)
        for lo, hi in ranges
    ])
    docs = np.concatenate([d for d, _ in parts]) if parts else np.zeros(0, np.int64)
    scores = (np.concatenate([s for _, s in parts]).astype(F32)
              if parts else np.zeros(0, F32))
    # ranges are disjoint and ascending → already doc-ordered

    agg_leaves = None
    if isinstance(q.returns, ex._TREE_TYPES):
        leaves = ret_leaves(q.returns)
        if any(isinstance(l, ast.RetAgg) for l in leaves):
            agg_leaves = leaves
    if agg_leaves is not None:
        return ex._run_aggregates(reader, q, docs, scores, agg_leaves)
    if isinstance(q.returns, ex._TREE_TYPES):
        docs, scores = ex._apply_order_limit(reader, q, docs, scores)
        return ex._render_tree_table(reader, q.returns, leaves, docs, scores)
    docs, scores = ex._apply_order_limit(reader, q, docs, scores)
    return ex._materialize(reader, docs, scores, q.returns)
