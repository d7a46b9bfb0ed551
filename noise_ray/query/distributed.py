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

Aggregate-return queries run as per-range PARTIAL folds in the workers
with a driver-side state merge (only one state row per (range, group)
crosses the wire).  The merge reproduces the local buffered fold exactly
— including array()/concat()'s reversed accumulation order — except that
sum/avg reassociate float addition across ranges (deterministic, last-ulp
on non-integer data).  An aggregate query WITH a limit streams matches
back and folds on the driver instead: the reference's buffered early-cut
truncates mid-merge in an order-sensitive way per-range partials cannot
reproduce.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from . import ast
from .engine import F32, CompiledQuery
from .parser import parse_query, ret_leaves
from .reader import IndexReader

_READER_CACHE: dict[tuple, object] = {}


def dist_min_docs() -> int:
    """Document-count threshold above which ops fan out through the
    range-actor pool instead of evaluating in-process.  Overridable via
    ``NOISE_RAY_DIST_MIN_DOCS`` so the correctness harness can force the
    distributed dispatch end-to-end at small scale (the worker bodies
    are equality-tested regardless; this gates the *dispatch* itself)."""
    import os

    return int(os.environ.get("NOISE_RAY_DIST_MIN_DOCS", 5_000_000))


def _cached_reader(index_dir: str, cls: type = IndexReader):
    """Per-worker-process reader cache, shared by the flat AND nested
    (``cls=JsonIndexReader``) distributed paths: one open per worker per
    index version, so repeated range tasks reuse decoded postings /
    values / docmap caches instead of rebuilding them per query."""
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
    key = (index_dir, cls.__name__, man_mtime, tomb_mtime,
           tuple(os.path.basename(d) for d in _epoch_dirs(index_dir)))
    r = _READER_CACHE.get(key)
    if r is None:
        # evict this index's older versions: each stale reader pins up to
        # _DOCMAP_CACHE_CAP of decoded columns and is never used again
        for k in [k for k in _READER_CACHE
                  if k[0] == index_dir and k[1] == cls.__name__]:
            del _READER_CACHE[k]
        r = _READER_CACHE[key] = cls(index_dir)
    return r


def _merge_states(fun: str, a, b, sep):
    """Merge two per-range partial aggregate states (same group).

    States are exactly the local fold's state domain, so min/max/array
    merges reuse the ported actions.  sum/avg reassociate float addition
    across ranges (deterministic — fixed range boundaries — but may differ
    from the sequential fold in the last ulp on non-integer data)."""
    from .aggregates import AGG_IMPLS

    if fun == "count" or fun == "sum":
        return a + b
    if fun == "avg":
        n = a[1] + b[1]
        if n == 0.0:
            return [0.0, 0.0]
        return [(a[0] * a[1] + b[0] * b[1]) / n, n]
    if fun in ("array", "array_flat"):
        return a + b
    if fun == "concat":
        if isinstance(a, str) and isinstance(b, str):
            return a + sep + b
        return a if isinstance(a, str) else b
    # min / max / min_array / max_array: b's state is in the value domain
    # the action accepts as `new`
    return AGG_IMPLS[fun][1](a, b, None)


def _partial_fold(leaves, rows):
    """Per-range partial aggregation: fold rows (doc order) into one state
    row per group.  Returns [(hashable_group_key, slot_states)] in
    first-seen order."""
    from .aggregates import AGG_IMPLS

    group_slots = [n for n, l in enumerate(leaves)
                   if isinstance(l, ast.RetAgg) and l.fun == "group"]
    agg_slots = [(n, l.fun, l.sep) for n, l in enumerate(leaves)
                 if isinstance(l, ast.RetAgg) and l.fun != "group"]

    # Type-tagged canonical key: two values collide iff cmp_json treats
    # them as equal.  A bare Python-hash key would merge True with 1.0
    # (hash-equal, cmp_json-distinct) and TypeError on dict group values.
    def hashable(v):
        if v is None:
            return (0,)
        if isinstance(v, bool):  # before int: bool is an int subclass
            return (1, v)
        if isinstance(v, (int, float)):
            return (2, float(v))
        if isinstance(v, str):
            return (3, v)
        if isinstance(v, list):
            return (4, tuple(map(hashable, v)))
        if isinstance(v, dict):
            return (5, tuple((k, hashable(x)) for k, x in v.items()))
        return (6, v)

    # REVERSED doc order: the local buffered merge accumulates group rows
    # back to front (observable in array()/concat() output,
    # repl-tests/group.noise); folding each range reversed — and merging
    # ranges reversed — reproduces it exactly for unlimited aggregates
    partial: dict = {}
    for row in reversed(rows):
        key = tuple(hashable(row[n]) for n in group_slots)
        state = partial.get(key)
        if state is None:
            state = list(row)
            for n, fun, _sep in agg_slots:
                init = AGG_IMPLS[fun][0]
                if init is not None:
                    state[n] = init(row[n])
            partial[key] = state
        else:
            for n, fun, sep in agg_slots:
                state[n] = AGG_IMPLS[fun][1](state[n], row[n], sep)
    return list(partial.items())


def _agg_range_impl(index_dir: str, qtext: str, params: dict | None,
                    lo: int, hi: int):
    """Evaluate + leaf-fetch + partial-aggregate one doc range — the heavy
    per-match work (docmap column reads, per-row fold) never leaves the
    workers; only one state row per (range, group) reaches the driver."""
    from . import executor as ex

    reader = _cached_reader(index_dir)
    q = parse_query(qtext, params)
    cq = CompiledQuery(reader, q.filter, doc_range=(lo, hi))
    res = cq.evaluate()
    docs = res.docs
    scores = cq.final_scores(res)
    leaves = ret_leaves(q.returns)
    rows = ex._leaf_values(reader, leaves, docs, scores)
    return _partial_fold(leaves, rows)


def _eval_range_impl(index_dir: str, qtext: str, params: dict | None,
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


@ray.remote
class _RangeWorker:
    """Long-lived range worker shared by the flat and nested distributed
    fan-outs.

    Plain ``ray.remote`` tasks land on arbitrary worker processes, so the
    per-process reader cache (``_cached_reader``) only helped when Ray
    happened to reschedule a range onto a process that had served it
    before — warm latencies of values-heavy queries equalled cold ones.
    A pool of actors with a deterministic range→actor assignment (range
    i → actor i mod n) gives every doc range a stable home: the second
    query finds that range's postings/values/docmap already decoded.

    ``num_cpus=0``: the pool must not RESERVE cores — an idle pool
    holding n×1 CPU starves every later Ray Data job on the cluster
    (builds, compactions) into deadlock.  Parallelism is bounded by the
    actor count instead."""

    def flat_eval(self, index_dir, qtext, params, lo, hi, keep_topk):
        return _eval_range_impl(index_dir, qtext, params, lo, hi, keep_topk)

    def flat_agg(self, index_dir, qtext, params, lo, hi):
        return _agg_range_impl(index_dir, qtext, params, lo, hi)

    def json_eval(self, index_dir, filter_node, lo, hi, keep):
        from .json_executor import _json_eval_range_impl

        return _json_eval_range_impl(index_dir, filter_node, lo, hi, keep)

    def json_agg(self, index_dir, q, lo, hi):
        from .json_executor import _json_agg_range_impl

        return _json_agg_range_impl(index_dir, q, lo, hi)

    def bm25_df(self, index_dir, field, stemmed, lo, hi):
        from ..ops.bm25 import bm25_df_range

        return bm25_df_range(index_dir, field, stemmed, lo, hi)

    def bm25_score(self, index_dir, field, stemmed, dfs, n_docs, avgdl,
                   k1, b, k, lo, hi, filter_query=None, min_match=1,
                   search_after=None):
        from ..ops.bm25 import bm25_score_range

        return bm25_score_range(index_dir, field, stemmed, dfs, n_docs,
                                avgdl, k1, b, k, lo, hi, filter_query,
                                min_match, search_after)

    def ops_call(self, module, fn, args):
        """Generic range-worker dispatch: run ``noise_ray.ops.<module>.
        <fn>(*args)`` on this actor — new per-range operator bodies
        (synonym df/score, value boost, …) reuse the pool and its cached
        readers without growing this class per feature."""
        import importlib

        m = importlib.import_module(f"noise_ray.ops.{module}")
        return getattr(m, fn)(*args)

    def bm25_fields_score(self, index_dir, weights, stemmed, dfs, avgdls,
                          n_docs, k1, b, k, lo, hi):
        from ..ops.bm25 import bm25_fields_score_range

        return bm25_fields_score_range(index_dir, weights, stemmed, dfs,
                                       avgdls, n_docs, k1, b, k, lo, hi)

    def bm25_phrase_df(self, index_dir, field, stemmed, lo, hi):
        from ..ops.bm25 import bm25_phrase_df_range

        return bm25_phrase_df_range(index_dir, field, stemmed, lo, hi)

    def bm25_phrase_score(self, index_dir, field, stemmed, df, n_docs,
                          avgdl, k1, b, k, lo, hi):
        from ..ops.bm25 import bm25_phrase_score_range

        return bm25_phrase_score_range(index_dir, field, stemmed, df,
                                       n_docs, avgdl, k1, b, k, lo, hi)

    def call_batch(self, calls):
        """Run ``[(method_name, args_tuple), ...]`` sequentially on this
        actor and return their results as a list — the per-WORKER
        coalesced form of the per-range dispatch (see pool_batched)."""
        return [getattr(self, m)(*a) for m, a in calls]


_pool: list = []


def pool_batched(pool: list, calls: list) -> list:
    """Dispatch ``calls[i] = (method_name, args_tuple)`` with ONE remote
    round-trip per WORKER instead of one per range: call ``i`` keeps its
    deterministic home ``pool[i % len(pool)]`` (so per-actor reader
    caches stay warm across this change), but each actor receives a
    single task carrying all of its calls and returns their results
    together.  Actors execute tasks sequentially anyway
    (max_concurrency=1), so grouping changes only the dispatch count —
    it cuts the per-query latency floor from ~rtt × ranges to
    ~rtt × workers — never the results, and shared per-call args (df
    tables, vocab dicts) serialize once per worker, not once per range.
    Results return in the original call order."""
    if not calls:
        return []
    n = len(pool)
    groups: dict[int, list[int]] = {}
    for i in range(len(calls)):
        groups.setdefault(i % n, []).append(i)
    ws = sorted(groups)
    refs = [pool[w].call_batch.remote([calls[i] for i in groups[w]])
            for w in ws]
    out: list = [None] * len(calls)
    for w, res in zip(ws, ray.get(refs)):
        for i, r in zip(groups[w], res):
            out[i] = r
    return out


def serve_partitions() -> int:
    """Per-query fan-out width on the SERVING path (concurrent-query
    workloads).  A single query's useful work (k posting lookups + WAND
    over its ranges) is milliseconds; fanning it over every core of a
    growing cluster multiplies its FIXED costs (dispatch, per-range
    setup) by the cluster size — measured on the 22M index, 8->32 CPUs
    only cut 16-query round latency 0.12s -> 0.053s (2.2x for 4x
    cores).  Serving therefore pins each query to a fixed number of
    partitions and scales concurrency with REPLICA GROUPS instead
    (``replica_slice``), the partition x replication grid every search
    cluster uses: latency governed by P, throughput by R = pool/P."""
    import os

    return max(1, int(os.environ.get("NOISE_RAY_SERVE_PARTITIONS", "8")))


def replica_slice(pool: list, partitions: int, group: int) -> list:
    """Carve the worker pool into R = len(pool) // partitions disjoint
    replica groups of ``partitions`` actors; round ``group`` is served
    by group ``group % R``.  Range i keeps a deterministic home WITHIN
    each group (``pool_batched``'s i % n over the slice), so every
    group independently warms reader caches for all ranges and
    concurrent rounds on different groups never queue on each other's
    actors.  Falls back to the whole pool when it cannot hold two full
    groups.  Routing only relocates which actor evaluates a range —
    the per-range bodies and the merge are untouched, so results are
    bit-identical for every group value
    (tests/test_search_server.py)."""
    r = len(pool) // partitions
    if r < 2:
        return pool
    g = group % r
    return pool[g * partitions:(g + 1) * partitions]


def worker_pool() -> list:
    """Lazily created, driver-lifetime actor pool sized to the cluster
    (<= 32); actors die with the driver.  ``NOISE_RAY_POOL_SIZE`` caps
    the size per driver — a serving frontend sharing the cluster with
    other frontends takes only its slice of actors (one frontend per
    ~8 cores, each an independent partition-complete serving unit; see
    bench.py qps mode)."""
    import os

    global _pool
    cap = int(os.environ.get("NOISE_RAY_POOL_SIZE", "32"))
    n = max(1, min(cap, int(ray.cluster_resources().get("CPU", 1))))
    if len(_pool) != n:
        _pool = [_RangeWorker.options(num_cpus=0).remote()
                 for _ in range(n)]
    return _pool


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

    agg_leaves = None
    if isinstance(q.returns, ex._TREE_TYPES):
        leaves = ret_leaves(q.returns)
        if any(isinstance(l, ast.RetAgg) for l in leaves):
            agg_leaves = leaves
    if agg_leaves is not None:
        if q.limit is not None:
            # limit + aggregates: the reference's buffered early-cut is
            # order-sensitive mid-merge — stream matches back and fold on
            # the driver so results stay bit-identical to run_query
            pool = worker_pool()
            parts = pool_batched(pool, [
                        ("flat_eval", (index_dir, query, params, lo, hi, None))
                        for (lo, hi) in ranges])
            docs = (np.concatenate([d for d, _ in parts])
                    if parts else np.zeros(0, np.int64))
            scores = (np.concatenate([s for _, s in parts]).astype(F32)
                      if parts else np.zeros(0, F32))
            return ex._run_aggregates(reader, q, docs, scores, agg_leaves)
        pool = worker_pool()
        parts = pool_batched(pool, [
                    ("flat_agg", (index_dir, query, params, lo, hi))
                    for (lo, hi) in ranges])
        return _merge_agg_partials(q, agg_leaves, parts)

    # scored-top-k queries prune to local top-k in the workers
    keep_topk = None
    if (q.limit and q.order and len(q.order) == 1 and q.order[0].score
            and q.order[0].desc):
        keep_topk = q.limit

    pool = worker_pool()
    parts = pool_batched(pool, [
                ("flat_eval", (index_dir, query, params, lo, hi, keep_topk))
                for (lo, hi) in ranges])
    docs = np.concatenate([d for d, _ in parts]) if parts else np.zeros(0, np.int64)
    scores = (np.concatenate([s for _, s in parts]).astype(F32)
              if parts else np.zeros(0, F32))
    # ranges are disjoint and ascending → already doc-ordered

    if isinstance(q.returns, ex._TREE_TYPES):
        docs, scores = ex._apply_order_limit(reader, q, docs, scores)
        return ex._render_tree_table(reader, q.returns, leaves, docs, scores)
    docs, scores = ex._apply_order_limit(reader, q, docs, scores)
    return ex._materialize(reader, docs, scores, q.returns)


def _merge_agg_partials(q, leaves, parts) -> pa.Table:
    from . import executor as ex

    return ex._rows_to_table(q.returns, leaves, merge_agg_rows(q, leaves, parts))


def merge_agg_rows(q, leaves, parts) -> list:
    """Merge per-range partial aggregate states in reversed range order
    (see _partial_fold), finalize, order groups, limit; returns the final
    group rows (one value list per group).  Shared by the flat and nested
    distributed aggregate paths — only the final rendering differs.

    Only divergence from the local buffered fold: sum/avg reassociate
    float addition across ranges.  Queries with a limit never reach this
    path (both distributed paths fall back to the driver-side fold to
    keep the reference's buffered early-cut semantics)."""
    import functools

    from .aggregates import AGG_FINALS
    from .results import cmp_json

    agg_slots = [(n, l.fun, l.sep) for n, l in enumerate(leaves)
                 if isinstance(l, ast.RetAgg) and l.fun != "group"]
    merged: dict = {}
    for part in reversed(parts):  # reversed range order (see _partial_fold)
        for key, state in part:
            cur = merged.get(key)
            if cur is None:
                merged[key] = state
            else:
                for n, fun, sep in agg_slots:
                    cur[n] = _merge_states(fun, cur[n], state[n], sep)
    rows = list(merged.values())
    for n, leaf in enumerate(leaves):
        if isinstance(leaf, ast.RetAgg):
            fin = AGG_FINALS.get(leaf.fun)
            if fin is not None:
                for row in rows:
                    row[n] = fin(row[n])

    orders = [(l.desc, n) for n, l in enumerate(leaves)
              if isinstance(l, ast.RetAgg) and l.fun == "group"]

    def cmp(a, b):
        for desc, n in orders:
            c = cmp_json(b[n], a[n]) if desc else cmp_json(a[n], b[n])
            if c:
                return c
        return 0

    rows.sort(key=functools.cmp_to_key(cmp))
    if q.limit is not None:
        rows = rows[: q.limit]
    return rows
