"""Connected-component clustering over duplicate-pair sets, and the
end-to-end "keep the first doc per duplicate cluster" operator.

Pair generators (ops/dedup.py) emit near-duplicate EDGES; real training-
data dedup needs the transitive closure — one canonical document per
duplicate CLUSTER, however long the chain a->b->c of pairwise matches.
This module computes that closure with the alternating large-star /
small-star algorithm (Kiveris, Lattanzi, Mirrokni, Rastogi,
Vassilvitskii — "Connected Components in MapReduce and Beyond",
SoCC'14): every round is one groupby shuffle over the edge set,
convergence in O(log^2 n) rounds, and at the fixpoint each component is
a star whose hub is the component's minimum doc_id.  Nothing
corpus-sized touches the driver; the per-round state is the edge
Dataset itself, and the per-group reduce is vectorized numpy over a
HASH BUCKET of nodes (not one Python call per node).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_NB = 64  # default node-hash buckets; each group is a bucket of many
          # nodes so the reduce runs segmented numpy, not per-node
          # Python.  The distributed star rounds SCALE this with the
          # edge count (_edge_buckets) so one group's rows stay
          # task-sized at any corpus scale.

_EDGE_SCHEMA = pa.schema([("a_id", pa.int64()), ("b_id", pa.int64())])
_OUT_SCHEMA = pa.schema([("doc_id", pa.int64()), ("cluster_id", pa.int64())])


def _bucket_of(x: np.ndarray, nb: int = _NB) -> np.ndarray:
    from .hashing import splitmix64

    return (splitmix64(x.astype(np.uint64)) % np.uint64(nb)).astype(np.int32)


def _edge_buckets(n_edges: int) -> int:
    """Bucket count targeting ~1M edge rows per star-round group,
    clamped to [64, 65536].  Granularity only: per-src fold logic is
    invariant to which bucket a node hashes into."""
    return int(min(65536, max(64, 64 * -(-n_edges // 1_000_000))))


def _emit(batch: pa.Table, large: bool, nb: int = _NB) -> pa.Table:
    """Map side of a star round: direct the edges and attach the shuffle
    bucket.  Large-star groups on BOTH endpoints (each node sees its full
    neighborhood); small-star groups on the larger endpoint only."""
    a = batch.column("a_id").to_numpy().astype(np.int64, copy=False)
    b = batch.column("b_id").to_numpy().astype(np.int64, copy=False)
    keep = a != b  # self-loops carry no connectivity
    a, b = a[keep], b[keep]
    if large:
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
    else:
        src = np.maximum(a, b)
        dst = np.minimum(a, b)
    return pa.table({"bucket": pa.array(_bucket_of(src, nb)),
                     "src": pa.array(src), "dst": pa.array(dst)})


def _star_reduce(group: pa.Table, large: bool) -> pa.Table:
    """Reduce side over ONE bucket (many node segments), vectorized:
    sort by (src, dst), drop consecutive duplicates, take the per-segment
    minimum, then emit the star edges.

      large-star: for node u with neighborhood G(u),
                  m = min(G(u) + {u}); emit (v, m) for v in G(u), v > u.
      small-star: edges arrive as (max, min) so G(u) < u and
                  m = min(G(u)); emit (v, m) for v in G(u)\\{m} plus (u, m).
    """
    src = group.column("src").to_numpy()
    dst = group.column("dst").to_numpy()
    if src.size == 0:
        return _EDGE_SCHEMA.empty_table()
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    keep = np.ones(src.size, bool)
    keep[1:] = (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])
    src, dst = src[keep], dst[keep]
    starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
    counts = np.diff(np.r_[starts, src.size])
    u = src[starts]
    min_nbr = dst[starts]  # dst ascending within each segment
    if large:
        m_row = np.repeat(np.minimum(min_nbr, u), counts)
        mask = dst > src
        out_a, out_b = dst[mask], m_row[mask]
    else:
        m_row = np.repeat(min_nbr, counts)  # all dst < u, so m = min(dst)
        mask = dst != m_row
        out_a = np.concatenate([dst[mask], u])
        out_b = np.concatenate([m_row[mask], min_nbr])
    return pa.table({"a_id": pa.array(out_a, pa.int64()),
                     "b_id": pa.array(out_b, pa.int64())})


def _digest(edges) -> tuple:
    """Order-insensitive multiset digest of the edge set (count + two
    mixed 31-bit sums), computed as a streaming aggregate — the
    convergence test never collects the edges."""
    from .hashing import splitmix64

    def d(batch: pa.Table) -> pa.Table:
        a = batch.column("a_id").to_numpy().astype(np.uint64)
        b = batch.column("b_id").to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            h = splitmix64(a * np.uint64(0x9E3779B97F4A7C15) ^ splitmix64(b))
        return pa.table({
            "n": pa.array([len(batch)], pa.int64()),
            "s1": pa.array([int((h % np.uint64(2**31)).sum())], pa.int64()),
            "s2": pa.array([int((splitmix64(h) % np.uint64(2**31)).sum())],
                           pa.int64()),
        })

    t = edges.map_batches(d, batch_format="pyarrow")
    agg = t.sum(["n", "s1", "s2"])
    return (agg["sum(n)"], agg["sum(s1)"], agg["sum(s2)"])


def _local_cc(edges: pa.Table, max_rounds: int) -> pa.Table:
    """The SAME star rounds run in-process on one numpy table — used when
    the (bounded) edge set is far below shuffle granularity, where each
    Dataset round would be pure fixed overhead.  Bit-identical output to
    the distributed rounds: both paths call _emit/_star_reduce."""
    t = edges
    prev_t = None
    for _ in range(max_rounds):
        for large in (True, False):
            t = _star_reduce(_emit(t, large), large)
        # local fixpoint test is exact: canonical-sort the edge list
        order = np.lexsort((t.column("b_id").to_numpy(),
                            t.column("a_id").to_numpy()))
        t = t.take(pa.array(order))
        if prev_t is not None and t.equals(prev_t):
            break
        prev_t = t
    else:
        raise RuntimeError(f"connected_components: no fixpoint "
                           f"in {max_rounds} rounds")
    a = t.column("a_id").to_numpy()
    b = t.column("b_id").to_numpy()
    doc = np.concatenate([a, np.unique(b)])
    cl = np.concatenate([b, np.unique(b)])
    order = np.argsort(doc, kind="stable")
    return pa.table({"doc_id": pa.array(doc[order], pa.int64()),
                     "cluster_id": pa.array(cl[order], pa.int64())})


def connected_components(pairs, max_rounds: int = 64,
                         local_threshold: int = 2**21):
    """(a_id, b_id) pair Dataset -> (doc_id, cluster_id) Dataset, where
    cluster_id is the smallest doc_id in the node's connected component.
    Only nodes that appear in at least one non-self pair are emitted
    (isolated docs have no cluster).  Deterministic; at the fixpoint the
    edge multiset is exactly one (member, hub) edge per non-hub member,
    which the digest detects as two identical consecutive rounds.

    The edge set is materialized once up front (it is the candidate-pair
    output — orders of magnitude smaller than the corpus).  Below
    ``local_threshold`` edges the star rounds run in-process (same
    kernels, identical output); above it each round is one bucketed
    groupby shuffle, so the closure of a 100 TB corpus' pair set never
    lands on one machine."""
    from ray.data.aggregate import Count

    if isinstance(pairs, pa.Table):
        pairs = ray.data.from_arrow(pairs)
    edges = pairs.select_columns(["a_id", "b_id"]).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_arrow(_OUT_SCHEMA.empty_table())
    if n_edges <= local_threshold:
        t = pa.concat_tables(
            ray.get(edges.to_arrow_refs())).combine_chunks()
        return ray.data.from_arrow(_local_cc(t, max_rounds))
    nb = _edge_buckets(n_edges)
    prev = None
    for _ in range(max_rounds):
        for large in (True, False):
            edges = (
                edges.map_batches(lambda t, lg=large: _emit(t, lg, nb),
                                  batch_format="pyarrow")
                .groupby("bucket")
                .map_groups(lambda g, lg=large: _star_reduce(g, lg),
                            batch_format="pyarrow")
            )
        # each round rewrites the whole edge set: materialize so the next
        # round's lineage is one hop, not an exponentially deep replay
        edges = edges.materialize()
        cur = _digest(edges)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"connected_components: no fixpoint "
                           f"in {max_rounds} rounds")
    if prev[0] == 0:
        return ray.data.from_arrow(_OUT_SCHEMA.empty_table())
    members = edges.map_batches(
        lambda t: pa.table({"doc_id": t.column("a_id"),
                            "cluster_id": t.column("b_id")}),
        batch_format="pyarrow")
    hubs = (
        edges.select_columns(["b_id"])
        .groupby("b_id")
        .aggregate(Count(alias_name="_n"))
        .map_batches(
            lambda t: pa.table({"doc_id": t.column("b_id"),
                                "cluster_id": t.column("b_id")}),
            batch_format="pyarrow")
    )
    return members.union(hubs).sort("doc_id")


def anti_join_ids(ids, drop, key: str = "doc_id", nb: int = _NB):
    """Distributed anti-join on a single int64 key: keep the rows of
    ``ids`` whose ``key`` does not appear in ``drop``.  One bucketed
    shuffle (tagged union + per-bucket ``np.isin``) — the drop set is
    never collected or broadcast, so it may be corpus-sized; size
    ``nb`` to the id-set scale so one bucket stays task-sized."""

    def tag(is_drop: int):
        def f(t: pa.Table) -> pa.Table:
            v = t.column(key).to_numpy().astype(np.int64, copy=False)
            return pa.table({
                "bucket": pa.array(_bucket_of(v, nb)),
                "id": pa.array(v),
                "d": pa.array(np.full(v.size, is_drop, np.int8)),
            })
        return f

    tagged = ids.map_batches(tag(0), batch_format="pyarrow").union(
        drop.map_batches(tag(1), batch_format="pyarrow"))

    def reduce(g: pa.Table) -> pa.Table:
        v = g.column("id").to_numpy()
        d = g.column("d").to_numpy()
        keep_ids = v[d == 0]
        mask = ~np.isin(keep_ids, v[d != 0])
        return pa.table({key: pa.array(keep_ids[mask], pa.int64())})

    return tagged.groupby("bucket").map_groups(reduce, batch_format="pyarrow")


def dedup_clusters(sf_dir: str, threshold: float = 0.5, max_doc: int = 300):
    """Duplicate clusters over the VERIFIED n-gram Jaccard pairs (the
    oracle-checkable bounded block): (doc_id, cluster_id) with cluster_id
    = min doc_id of the component.  DuckDB oracle: the pair SQL wrapped
    in a recursive-CTE transitive closure."""
    from .dedup import ngram_jaccard_pairs

    return connected_components(
        ngram_jaccard_pairs(sf_dir, threshold=threshold, max_doc=max_doc))


def dedup_clusters_lsh(sf_dir: str, num_hashes: int = 64, bands: int = 16):
    """Duplicate clusters over the full-corpus MinHash+LSH candidate
    pairs — the 100 TB scale path (banded signature groupby for edges,
    star rounds for the closure; every stage a bounded shuffle).  The
    fixed-seed signature pipeline is deterministic, so the DuckDB oracle
    is its exact SQL replica plus the same recursive closure."""
    from .dedup import minhash_lsh_pairs

    return connected_components(
        minhash_lsh_pairs(sf_dir, num_hashes=num_hashes, bands=bands))


def dedup_keep_first(sf_dir: str, num_hashes: int = 64, bands: int = 16):
    """End-to-end near-duplicate removal: MinHash+LSH pairs -> connected
    components -> drop every member that is not its cluster's minimum
    -> surviving doc_ids.  The anti-join is a bucketed shuffle, not a
    broadcast, so the drop set may be corpus-sized."""
    cc = dedup_clusters_lsh(sf_dir, num_hashes=num_hashes, bands=bands)
    drop = cc.map_batches(
        lambda t: pa.table({"doc_id": t.column("doc_id").filter(
            pc.not_equal(t.column("doc_id"), t.column("cluster_id")))}),
        batch_format="pyarrow")
    from .dedup import _scaled_window_buckets

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"])
    return anti_join_ids(docs, drop,
                         nb=_scaled_window_buckets(sf_dir)).sort("doc_id")
