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


def dedup_exact(sf_dir: str):
    """Keep the smallest doc_id per exact text: hash-partition by content
    hash, per-group min — one bounded shuffle of (hash, doc_id) pairs.

    The content key is a vectorized 128-bit hash (ops/hashing.py) rather
    than a per-row hashlib call; any injective-enough function of the
    text yields the same groups, and the DuckDB oracle (GROUP BY
    md5(text)) compares only the surviving doc_ids."""
    from .hashing import hash_string_array_128

    def h(batch: pa.Table) -> pa.Table:
        h1, h2 = hash_string_array_128(batch.column("text"))
        # int64 bit views: groupby keys only need equality, and uint64
        # keys above 2^63 overflow Ray's aggregate key conversion (it
        # falls back to pickled-object blocks)
        return pa.table({
            "h1": pa.array(h1.view(np.int64)),
            "h2": pa.array(h2.view(np.int64)),
            "doc_id": batch.column("doc_id"),
        })

    return (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(h, batch_format="pyarrow")
        .groupby(["h1", "h2"])
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
    from .collect import arrow_blocks

    t = pa.concat_tables(arrow_blocks(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
            filter=pads.field("doc_id") < max_doc,
        )))
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


def _shingle_hashes(texts, n: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc shingle-hash arrays, fully vectorized (no per-shingle
    Python).  Returns ``(sh[uint64], offsets[int64, n_docs+1])`` — shingle
    hashes for all docs concatenated.  Docs with ``0 < n_toks < n`` get one
    shingle over all their tokens (mirrors ``_shingles``); empty docs get
    none (two no-content docs have no Jaccard, same as the brute-force
    oracle's skip)."""
    from .hashing import splitmix64, tokenize_hashes

    h, doc_offs = tokenize_hashes(texts)
    n_docs = doc_offs.size - 1
    counts = doc_offs[1:] - doc_offs[:-1]
    with np.errstate(over="ignore"):
        # rolling n-gram combine of token hashes (position-weighted so
        # "a b c" != "c b a"), then avalanche.  Clamped stop: a raw
        # ``h.size - n + 1 + k`` goes negative when the whole batch
        # holds fewer than n tokens, and a negative stop wraps to a
        # non-empty slice (same fix as _window_hashes)
        n_full = max(h.size - n + 1, 0)
        full = np.zeros(n_full, np.uint64)
        for k in range(n):
            full += h[k : n_full + k] * np.uint64(2 * k + 3)
        full = splitmix64(full)
    # valid 3-gram start positions: doc_start <= i <= doc_end - n
    sh_counts = np.maximum(counts - n + 1, 0)
    keep = np.zeros(full.size, bool)
    starts, ends = doc_offs[:-1], doc_offs[:-1] + sh_counts
    for d in np.flatnonzero(sh_counts):  # interval fill; cheap vs hashing
        keep[starts[d] : ends[d]] = True
    out_offs = np.zeros(n_docs + 1, np.int64)
    np.cumsum(sh_counts, out=out_offs[1:])
    sh = full[keep] if full.size else full
    # short docs (1..n-1 tokens): one shingle over all tokens
    short = np.flatnonzero((counts > 0) & (counts < n))
    if short.size:
        with np.errstate(over="ignore"):
            extra = np.zeros(short.size, np.uint64)
            for si, d in enumerate(short):
                seg = h[doc_offs[d] : doc_offs[d + 1]]
                acc = np.uint64(0)
                for k in range(seg.size):
                    acc += seg[k] * np.uint64(2 * k + 3)
                extra[si] = acc
            extra = splitmix64(extra)
        # splice the extras into per-doc order
        pieces, off_counts = [], sh_counts.copy()
        off_counts[short] = 1
        new_offs = np.zeros(n_docs + 1, np.int64)
        np.cumsum(off_counts, out=new_offs[1:])
        merged = np.empty(int(new_offs[-1]), np.uint64)
        for d in range(n_docs):
            if counts[d] and counts[d] < n:
                merged[new_offs[d]] = extra[np.searchsorted(short, d)]
            elif sh_counts[d]:
                merged[new_offs[d] : new_offs[d + 1]] = \
                    sh[out_offs[d] : out_offs[d + 1]]
        return merged, new_offs
    return sh, out_offs


_MAX_BUCKET = 2000  # above this, emit star pairs (min-doc vs rest)


def _bucket_index_pairs(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Candidate index pairs within one UNVERIFIED bucket (all members
    share the exact band key): all pairs normally; a degenerate bucket
    (boilerplate content at corpus scale) degrades to star pairs
    (0 vs rest) — linear output that still unions the bucket into one
    connected component for dedup.  Pipelines that VERIFY pairs after
    candidate generation must use :func:`_verified_bucket_pairs`
    instead — a star member failing verification would otherwise
    disconnect silently."""
    if n > _MAX_BUCKET:
        return np.zeros(n - 1, np.int64), np.arange(1, n, dtype=np.int64)
    iu = np.triu_indices(n, k=1)
    return iu[0].astype(np.int64), iu[1].astype(np.int64)


def _verified_bucket_pairs(n: int, pair_mask_fn):
    """Verified pairs within one bucket, degeneracy-safe.

    ``pair_mask_fn(ii, jj) -> bool mask`` runs the verification
    (hamming / cosine) vectorized over index pairs.  Small buckets do
    verified all-pairs (exact).  Giant buckets peel in HUB ROUNDS: the
    min member verifies against the rest; matched members join its
    component and drop out; the unmatched remainder repeats with a new
    hub until small enough for all-pairs.  Guarantees in the degenerate
    regime: every emitted pair is verified, and every member that
    matches SOME hub is connected to a component.  It is NOT a complete
    pair list: a pair between a hub-matched member and a later member is
    not re-tested once the former drops out (completeness there costs
    O(n²) in buckets that only arise from boilerplate content at corpus
    scale; below _MAX_BUCKET the result is exact, which covers the
    oracle fixtures).  Returns verified ``(ii, jj)`` index pairs."""
    if n <= _MAX_BUCKET:
        iu = np.triu_indices(n, k=1)
        ii, jj = iu[0].astype(np.int64), iu[1].astype(np.int64)
        keep = pair_mask_fn(ii, jj)
        return ii[keep], jj[keep]
    out_i: list[np.ndarray] = []
    out_j: list[np.ndarray] = []
    remaining = np.arange(n, dtype=np.int64)
    rounds = 0
    while remaining.size > _MAX_BUCKET and rounds < 64:
        rounds += 1
        hub, rest = remaining[0], remaining[1:]
        m = pair_mask_fn(np.full(rest.size, hub, np.int64), rest)
        if m.any():
            out_i.append(np.full(int(m.sum()), hub, np.int64))
            out_j.append(rest[m])
        remaining = rest[~m]
    if remaining.size > _MAX_BUCKET:
        # pathological low-match giant bucket: bounded rounds exhausted
        # without shrinking — degrade to star CANDIDATES (verified), the
        # pre-existing linear behavior, instead of going O(N^2)
        hub, rest = remaining[0], remaining[1:]
        m = pair_mask_fn(np.full(rest.size, hub, np.int64), rest)
        out_i.append(np.full(int(m.sum()), hub, np.int64))
        out_j.append(rest[m])
        remaining = remaining[:0]
    if remaining.size > 1:
        iu = np.triu_indices(remaining.size, k=1)
        ii, jj = remaining[iu[0]], remaining[iu[1]]
        keep = pair_mask_fn(ii, jj)
        out_i.append(ii[keep])
        out_j.append(jj[keep])
    if not out_i:
        z = np.zeros(0, np.int64)
        return z, z
    return np.concatenate(out_i), np.concatenate(out_j)


def _prune_singleton_buckets(sigs, key_col: str = "key"):
    """Drop signature rows whose bucket has a single member before the
    grouped pair-emission stage.

    ``groupby().map_groups`` invokes Python once per GROUP, and in an
    LSH banding almost every bucket is a singleton (at 200k docs the
    pair stage burned 183 s of CPU making ~3M empty per-group calls;
    a Count aggregate is no better — Ray's aggregate finalize also
    walks the ~3M distinct keys in Python).  Instead: one distributed
    SORT on the key (vectorized range shuffle), then a block-local
    vectorized run-length filter keeps only rows whose key repeats
    within the block — plus the block's first/last key runs, which
    could continue in a neighboring block and must survive for the
    grouped stage to reunite.  Output is bounded by the corpus's real
    duplicate structure + 2 keys per block; the groupby after it only
    shuffles candidates.  Band keys are band-tagged 64-bit mixed
    hashes, so multiplicity is detected on the key alone; a size-1
    group reaching the pair stage emits no pairs, so edge
    false-positives are harmless."""
    def keep_candidates(t: pa.Table) -> pa.Table:
        k = t.column(key_col).to_numpy()
        if k.size == 0:
            return t
        new = np.ones(k.size, dtype=bool)
        new[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(new)
        run_len = np.diff(np.append(starts, k.size))
        keep_run = run_len >= 2
        keep_run[0] = keep_run[-1] = True  # block-edge keys: may continue
        return t.filter(pa.array(np.repeat(keep_run, run_len)))

    return sigs.sort(key_col).map_batches(
        keep_candidates, batch_format="pyarrow")


def _bucket_pairs(group: pa.Table) -> pa.Table:
    docs = np.sort(group.column("doc_id").to_numpy())
    ii, jj = _bucket_index_pairs(docs.size)
    return pa.table({"a_id": pa.array(docs[ii], pa.int64()),
                     "b_id": pa.array(docs[jj], pa.int64())})


def _distinct_pairs(pairs):
    """Distributed pair distinct: a groupby on (a_id, b_id) — the pair set
    never materializes on the driver."""
    from ray.data.aggregate import Count

    return (
        pairs.groupby(["a_id", "b_id"])
        .aggregate(Count(alias_name="_n"))
        .select_columns(["a_id", "b_id"])
        .sort(["a_id", "b_id"])
    )


class _MinHashBatch:
    """Actor-pool stage: text → shingle hashes → MinHash signature → LSH
    band keys.  Signature kernel is numpy end-to-end: one
    ``minimum.reduceat`` over doc boundaries per seed block."""

    def __init__(self, num_hashes: int, bands: int):
        self.num_hashes = num_hashes
        self.bands = bands
        self.rows = num_hashes // bands
        rng = np.random.default_rng(12345)
        self.seeds = rng.integers(0, 2**63, size=num_hashes, dtype=np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .hashing import splitmix64

        sh, offs = _shingle_hashes(batch.column("text"))
        counts = offs[1:] - offs[:-1]
        nz = np.flatnonzero(counts)         # docs with >= 1 shingle
        docs = batch.column("doc_id").to_numpy()[nz]
        if nz.size == 0:
            return pa.table({"band": pa.array([], pa.int32()),
                             "key": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64())})
        starts = offs[:-1][nz]
        sig = np.empty((nz.size, self.num_hashes), np.uint64)
        with np.errstate(over="ignore"):
            for k0 in range(0, self.num_hashes, 16):  # bound temp matrix
                k1 = min(k0 + 16, self.num_hashes)
                m = (sh[:, None] ^ self.seeds[None, k0:k1]) * \
                    np.uint64(0x9E3779B97F4A7C15)
                sig[:, k0:k1] = np.minimum.reduceat(m, starts, axis=0)
            # band key = mixed combine of the band's rows (tagged by band
            # index so identical row-chunks in different bands don't meet)
            keys = np.empty((nz.size, self.bands), np.uint64)
            for b in range(self.bands):
                acc = np.full(nz.size, np.uint64(b + 1), np.uint64)
                for r in range(self.rows):
                    acc = splitmix64(acc ^ sig[:, b * self.rows + r])
                keys[:, b] = acc
        return pa.table({
            "band": pa.array(np.tile(np.arange(self.bands, dtype=np.int32),
                                     nz.size), pa.int32()),
            # int64 bit view: equality-only groupby key (see dedup_exact)
            "key": pa.array(keys.reshape(-1).view(np.int64), pa.int64()),
            "doc_id": pa.array(np.repeat(docs, self.bands), pa.int64()),
        })


def minhash_lsh_pairs(sf_dir: str, num_hashes: int = 64, bands: int = 16):
    """MinHash+LSH near-duplicate candidate pairs: vectorized signatures in
    an actor-pool map_batches, ONE groupby on (band, key) for candidate
    generation, then a distributed distinct over the pair set.  Nothing
    corpus-sized ever reaches the driver; returns the (a_id, b_id) Dataset."""
    sigs = (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(_MinHashBatch, batch_format="pyarrow",
                     fn_constructor_kwargs={"num_hashes": num_hashes, "bands": bands},
                     # autoscaling actor pool: stays at 1 actor on small
                     # fixtures, grows toward the core count when the
                     # signature stage backlogs at corpus scale
                     concurrency=(1, 16))
    )
    pairs = (
        _prune_singleton_buckets(sigs)
        .groupby(["band", "key"])
        .map_groups(_bucket_pairs, batch_format="pyarrow")
    )
    return _distinct_pairs(pairs)


def _simhash_sigs(texts) -> tuple[np.ndarray, np.ndarray]:
    """64-bit SimHash per doc, vectorized: token hashes → per-doc bit
    counts via segment sums → majority bits.  Returns (sigs[uint64],
    n_tokens[int64]) aligned with ``texts``."""
    from .hashing import tokenize_hashes

    h, offs = tokenize_hashes(texts)
    counts = offs[1:] - offs[:-1]
    # per-doc bit counts with ONE uint8 bits matrix + reduceat at doc
    # starts (a token×64 int32 matrix plus a full cumsum copy would be
    # ~512 B/token of transient memory per batch — enough to OOM
    # concurrent workers on long-text blocks)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.uint8)
    nz = counts > 0
    sigs = np.zeros(counts.size, np.uint64)
    if h.size == 0 or not nz.any():
        return sigs, counts
    # reduceat over NON-EMPTY doc starts only: empty docs own no token
    # rows, so consecutive non-empty starts bound exactly one doc's
    # segment (clamping empty starts instead would split the last doc's
    # segment and corrupt its signature at batch boundaries)
    starts_nz = offs[:-1][nz].astype(np.int64)
    ones = np.add.reduceat(bits, starts_nz, axis=0).astype(np.int64)
    sig_bits = 2 * ones > counts[nz][:, None]
    sigs[nz] = np.bitwise_or.reduce(
        sig_bits.astype(np.uint64) << np.arange(64, dtype=np.uint64)[None, :],
        axis=1)
    return sigs, counts


def simhash_pairs(sf_dir: str, hamming: int = 3):
    """SimHash near-dup: 64-bit signature from token hashes; candidates via
    4-way band tables (hamming<=3 guarantees one identical 16-bit quarter,
    pigeonhole), verified by Hamming distance inside the bucket.

    Scale path: vectorized signatures in map_batches, candidates via ONE
    groupby((quarter_idx, quarter_value)) carrying the full signature,
    bucket-local verification, distributed pair distinct — no driver-side
    signature or pair table.  Empty docs (no tokens) are skipped."""
    def sig_batch(batch: pa.Table) -> pa.Table:
        sigs, counts = _simhash_sigs(batch.column("text"))
        nz = counts > 0
        sigs = sigs[nz]
        docs = batch.column("doc_id").to_numpy()[nz]
        q = np.tile(np.arange(4, dtype=np.int32), sigs.size)
        rep = np.repeat(sigs, 4)
        key = ((rep >> (np.uint64(16) * q.astype(np.uint64)))
               & np.uint64(0xFFFF)).astype(np.int32)
        return pa.table({
            "q": pa.array(q, pa.int32()),
            "key": pa.array(key, pa.int32()),
            "doc_id": pa.array(np.repeat(docs, 4), pa.int64()),
            "sig": pa.array(rep, pa.uint64()),
        })

    _POP = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                         axis=1).sum(axis=1).astype(np.uint8)

    def bucket_pairs(group: pa.Table) -> pa.Table:
        order = np.argsort(group.column("doc_id").to_numpy())
        docs = group.column("doc_id").to_numpy()[order]
        sigs = group.column("sig").to_numpy()[order]

        def within(ii, jj):
            x = sigs[ii] ^ sigs[jj]
            return _POP[x.view(np.uint8).reshape(-1, 8)].sum(axis=1) \
                <= hamming

        ii, jj = _verified_bucket_pairs(docs.size, within)
        return pa.table({"a_id": pa.array(docs[ii], pa.int64()),
                         "b_id": pa.array(docs[jj], pa.int64())})

    pairs = (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(sig_batch, batch_format="pyarrow")
        .groupby(["q", "key"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    return _distinct_pairs(pairs)


def embedding_dup_pairs(sf_dir: str, threshold: float = 0.45):
    """Embedding-cosine near-dup pairs (brute force, oracle-checkable)."""
    from .collect import arrow_blocks

    t = pa.concat_tables(arrow_blocks(
        ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                              columns=["vec_id", "embedding"])))
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


def embedding_dup_pairs_bucketed(sf_dir: str, threshold: float = 0.45,
                                 n_planes: int = 4, n_tables: int = 48,
                                 seed: int = 777):
    """Bucketed embedding near-dup pairs — the scale path next to the
    brute-force ``embedding_dup_pairs`` oracle.

    ``n_tables`` independent hyperplane-LSH tables of ``n_planes`` bits
    each: a vector lands in one bucket per table, candidate pairs are
    verified with EXACT cosine inside the bucket (precision 1.0 by
    construction; recall is the LSH collision probability —
    1-(1-p_bit**4)**48 ≈ 0.9999 per true pair AT the cosine-0.45
    threshold with these defaults, higher above it; measured against
    brute force in tests/test_ops_dedup.py and pair-set-equal on both
    test fixtures — the earlier 6-plane default was ≈ 0.976/pair and
    measurably dropped ~3 of 144 sf0.1 pairs).  One
    groupby((table, bucket)) carrying the normalized vectors, then a
    distributed pair distinct — nothing corpus-sized on the driver.
    Raise ``n_planes`` to shrink buckets (compute) at the cost of
    recall; at near-dup thresholds (>= 0.9 cosine) p_bit is ~0.86+ and
    a handful of tables with 8+ planes suffices."""
    from .similarity import embed_matrix, hyperplane_keys

    def bucketize(batch: pa.Table) -> pa.Table:
        m = embed_matrix(batch.column("embedding"))
        if m.size == 0:
            return pa.table({"table": pa.array([], pa.int32()),
                             "bucket": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "vec": pa.array([], pa.list_(pa.float32()))})
        mn = (m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True),
                             1e-30)).astype(np.float32)
        rng = np.random.default_rng(seed)  # same planes in every task
        ids = batch.column("vec_id").to_numpy()
        tabs, keys = [], []
        for ti in range(n_tables):
            planes = rng.standard_normal((n_planes, m.shape[1]))
            keys.append(hyperplane_keys(mn, planes).astype(np.int64))
            tabs.append(np.full(ids.size, ti, np.int32))
        vec = pa.FixedSizeListArray.from_arrays(
            pa.array(np.tile(mn, (n_tables, 1)).reshape(-1), pa.float32()),
            m.shape[1]).cast(pa.list_(pa.float32()))
        return pa.table({"table": pa.array(np.concatenate(tabs), pa.int32()),
                         "bucket": pa.array(np.concatenate(keys), pa.int64()),
                         "vec_id": pa.array(np.tile(ids, n_tables), pa.int64()),
                         "vec": vec})

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group.column("vec_id").to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        mn = embed_matrix(group.column("vec"))[order]

        def within(ii, jj):
            return np.einsum("ij,ij->i", mn[ii], mn[jj]) >= threshold

        ii, jj = _verified_bucket_pairs(ids.size, within)
        return pa.table({"a_id": pa.array(ids[ii], pa.int64()),
                         "b_id": pa.array(ids[jj], pa.int64())})

    pairs = (
        ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                              columns=["vec_id", "embedding"])
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby(["table", "bucket"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    return _distinct_pairs(pairs)


def _window_hashes(texts, w: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc rolling hashes of every w-token window (position-weighted
    combine + splitmix64, same kernel family as _shingle_hashes but with
    NO short-doc fallback: a doc with fewer than w tokens has no window).
    Returns (hashes[uint64], offsets[int64, n_docs+1])."""
    from .hashing import splitmix64, tokenize_hashes

    h, doc_offs = tokenize_hashes(texts)
    n_docs = doc_offs.size - 1
    counts = doc_offs[1:] - doc_offs[:-1]
    with np.errstate(over="ignore"):
        n_full = max(h.size - w + 1, 0)
        full = np.zeros(n_full, np.uint64)
        for k in range(w):
            # clamped stop: a raw ``h.size - w + 1 + k`` goes NEGATIVE
            # when the whole batch holds fewer than w tokens, and a
            # negative stop wraps around to a non-empty slice
            full += h[k : n_full + k] * np.uint64(2 * k + 3)
        full = splitmix64(full)
    win_counts = np.maximum(counts - w + 1, 0)
    keep = np.zeros(full.size, bool)
    starts, ends = doc_offs[:-1], doc_offs[:-1] + win_counts
    for d in np.flatnonzero(win_counts):
        keep[starts[d] : ends[d]] = True
    offs = np.zeros(n_docs + 1, np.int64)
    np.cumsum(win_counts, out=offs[1:])
    return (full[keep] if full.size else full), offs


def _scaled_window_buckets(sf_dir: str) -> int:
    """Shuffle-bucket count for window-hash groupbys, proportional to
    the corpus so one group's rows stay task-sized at ANY scale
    (64 buckets per ~1M docs, clamped to [64, 65536] — a 10B-doc corpus
    gets 65536 buckets of ~150k docs' windows each).  Bucketing is a
    granularity knob only: per-whash logic inside the fold is invariant
    to which bucket a hash lands in."""
    import glob as _glob
    import os as _os

    import pyarrow.parquet as _pq

    path = f"{sf_dir}/documents.parquet"
    if _os.path.isdir(path):
        n = sum(_pq.read_metadata(p).num_rows
                for p in _glob.glob(f"{path}/*.parquet"))
    else:
        n = _pq.read_metadata(path).num_rows
    return int(min(65536, max(64, 64 * -(-n // 1_000_000))))


def _window_bucket_of(wh: np.ndarray, nb: int) -> np.ndarray:
    from .hashing import splitmix64

    return (splitmix64(wh.astype(np.uint64) ^ np.uint64(0xA5A5A5A5))
            % np.uint64(nb)).astype(np.int32)


def substring_dup_clusters(sf_dir: str, window: int = 12):
    """Exact-substring duplicate CLUSTERS: docs sharing ANY run of
    ``window`` consecutive tokens, closed transitively — the
    training-data dedup primitive of Lee et al., "Deduplicating Training
    Data Makes Language Models Better" (ACL'22), expressed Ray-Data-first.

    Shape: per-batch vectorized rolling window hashes -> ONE groupby on a
    bucket of the window hash, whose vectorized reduce emits per-window
    STAR edges (member, window-min) — linear in bucket size where
    all-pairs would be quadratic, and connected components over stars
    equal components over the full cliques — then the star-round closure
    (ops/cluster.py).  The DuckDB oracle groups the literal token-window
    STRINGS (collision-free by construction), so a 64-bit window-hash
    collision would surface as an oracle mismatch; none occur on the
    fixtures and the probability at 10^12 windows is ~1e-7."""
    from .cluster import connected_components

    nb = _scaled_window_buckets(sf_dir)

    def emit(batch: pa.Table) -> pa.Table:
        wh, offs = _window_hashes(batch.column("text"), window)
        docs = np.repeat(batch.column("doc_id").to_numpy(),
                         offs[1:] - offs[:-1])
        # per-doc unique windows: one (window, doc) row each
        u = np.unique(np.stack([wh, docs.astype(np.uint64)], axis=1), axis=0)
        return pa.table({
            "bucket": pa.array(_window_bucket_of(u[:, 0], nb)),
            "whash": pa.array(u[:, 0], pa.uint64()),
            "doc_id": pa.array(u[:, 1].astype(np.int64), pa.int64()),
        })

    def star_edges(group: pa.Table) -> pa.Table:
        src = group.column("whash").to_numpy()
        dst = group.column("doc_id").to_numpy()
        if src.size == 0:
            return pa.table({"a_id": pa.array([], pa.int64()),
                             "b_id": pa.array([], pa.int64())})
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        keep = np.ones(src.size, bool)
        keep[1:] = (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])
        src, dst = src[keep], dst[keep]
        starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        counts = np.diff(np.r_[starts, src.size])
        m_row = np.repeat(dst[starts], counts)  # min doc per window
        mask = dst != m_row
        return pa.table({"a_id": pa.array(dst[mask], pa.int64()),
                         "b_id": pa.array(m_row[mask], pa.int64())})

    edges = (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(emit, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(star_edges, batch_format="pyarrow")
    )
    return connected_components(edges)


def duplicate_spans(sf_dir: str, window: int = 12) -> "ray.data.Dataset":
    """Span-level exact-substring dedup (Lee et al., ACL'22): for each
    doc, the MAXIMAL token spans covered by ``window``-token runs that
    also occur in at least one OTHER document — the regions a
    span-removal dedup pass would cut, not just which docs collide
    (that is substring_dup_clusters).

    Shape: one rolling-hash pass emits (bucket, whash, doc, start);
    one groupby over the hash bucket keeps windows with >= 2 distinct
    docs (vectorized per-group fold, star-free — positions pass
    through); one groupby(doc) merges each doc's surviving window
    intervals [s, s+window-1] into maximal islands (overlap-or-adjacent
    union) — all three stages bounded, nothing corpus-sized on the
    driver.  Returns (doc_id, start_tok, end_tok, n_windows) ordered;
    token positions are 0-based over the ``[a-z0-9]+`` token stream.
    The oracle replicates with literal window STRINGS (collision-free
    by construction) and a gaps-and-islands window-function merge, so
    a 64-bit hash collision would surface as a mismatch."""
    return _span_dataset(sf_dir, window).sort(["doc_id", "start_tok"])


def _span_dataset(sf_dir: str, window: int) -> "ray.data.Dataset":
    """duplicate_spans' core without the final presentation sort —
    remove_duplicate_spans consumes this through its own doc groupby,
    which re-shuffles anyway."""
    nb = _scaled_window_buckets(sf_dir)

    def emit(batch: pa.Table) -> pa.Table:
        wh, offs = _window_hashes(batch.column("text"), window)
        counts = offs[1:] - offs[:-1]
        docs = np.repeat(batch.column("doc_id").to_numpy(), counts)
        pos = (np.arange(wh.size, dtype=np.int64)
               - np.repeat(offs[:-1], counts))
        return pa.table({
            "bucket": pa.array(_window_bucket_of(wh, nb)),
            "whash": pa.array(wh, pa.uint64()),
            "doc_id": pa.array(docs.astype(np.int64), pa.int64()),
            "start": pa.array(pos, pa.int64()),
        })

    def keep_dup(group: pa.Table) -> pa.Table:
        wh = group.column("whash").to_numpy()
        docs = group.column("doc_id").to_numpy()
        pos = group.column("start").to_numpy()
        order = np.lexsort((pos, docs, wh))
        wh, docs, pos = wh[order], docs[order], pos[order]
        # distinct-doc count per whash run (docs sorted within run)
        new_w = np.r_[True, wh[1:] != wh[:-1]]
        new_d = new_w | np.r_[True, docs[1:] != docs[:-1]]
        w_ids = np.cumsum(new_w) - 1
        ndocs = np.bincount(w_ids[new_d])
        keep = ndocs[w_ids] >= 2
        return pa.table({
            "doc_id": pa.array(docs[keep], pa.int64()),
            "start": pa.array(pos[keep], pa.int64()),
        })

    def merge_spans(group: pa.Table) -> pa.Table:
        s = np.sort(group.column("start").to_numpy())
        did = group.column("doc_id")[0].as_py()
        if not s.size:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "start_tok": pa.array([], pa.int64()),
                             "end_tok": pa.array([], pa.int64()),
                             "n_windows": pa.array([], pa.int64())})
        # islands over covered intervals [s, s+window-1]: break when a
        # start exceeds the running covered end + 1
        brk = np.r_[True, s[1:] > s[:-1] + window]
        g = np.cumsum(brk) - 1
        firsts = np.flatnonzero(brk)
        counts = np.diff(np.r_[firsts, s.size])
        return pa.table({
            "doc_id": pa.array(np.full(firsts.size, did), pa.int64()),
            "start_tok": pa.array(s[firsts], pa.int64()),
            "end_tok": pa.array(s[firsts + counts - 1] + window - 1,
                                pa.int64()),
            "n_windows": pa.array(counts, pa.int64()),
        })

    return (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(emit, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(keep_dup, batch_format="pyarrow")
        .groupby("doc_id")
        .map_groups(merge_spans, batch_format="pyarrow")
    )


def remove_duplicate_spans(sf_dir: str, window: int = 12,
                           broadcast_limit: int = 250_000
                           ) -> "ray.data.Dataset":
    """The Lee et al. span-REMOVAL transform: excise every duplicated
    region found by :func:`duplicate_spans` from each document's token
    stream, emitting the cleaned corpus — (doc_id, clean_text,
    n_removed) with ``clean_text`` the surviving ``[a-z0-9]+`` tokens
    joined by single spaces (the analyzer-normalized form both the
    engine and the SQL oracle compute identically).

    Shape: the spans Dataset folds to per-doc interval lists (one
    bounded groupby over the SPARSE span table — only docs with
    duplicated regions appear).  When that table fits the object store
    (the overwhelmingly common case: duplicated-region docs are a
    fraction of the corpus) it is broadcast ONCE via ``ray.put`` and an
    actor-pool ``map_batches`` streams the documents table through a
    per-actor lookup — NO corpus-wide shuffle; measured at 20M docs the
    former documents×spans hash join shuffled the entire text corpus
    (35 GB spilled) where the broadcast path is one read-side pass.
    Above ``broadcast_limit`` span-docs the span table is written
    doc_id-RANGE-PARTITIONED to disk instead (it exits a doc_id groupby
    already) and each cleaning actor reads only the partition slices
    covering its batches (LRU-cached per actor) — a partitioned
    broadcast that also never shuffles the corpus, at any span count.
    The limit is set where the paths cross: at 20M docs / 562k
    span-docs the partitioned path measured 114.3 s vs the broadcast's
    139.1 s (the object-store round trip of one big table beats
    nothing, but per-actor partition reads beat materializing it),
    while tiny span tables skip the filesystem round trip entirely.
    Cleaning itself re-tokenizes and drops covered tokens in one
    batch-wide vectorized pass (_clean_batch)."""
    import ray
    import ray.data

    spans = _span_dataset(sf_dir, window)

    def per_doc(group: pa.Table) -> pa.Table:
        # spans ride the join as one compact "s:e,s:e" string per doc —
        # Acero hash joins reject list-typed payload columns
        did = group.column("doc_id")[0].as_py()
        enc = ",".join(f"{s}:{e}" for s, e in zip(
            group.column("start_tok").to_pylist(),
            group.column("end_tok").to_pylist()))
        return pa.table({
            "doc_id": pa.array([did], pa.int64()),
            "spans": pa.array([enc], pa.string()),
        })

    span_lists = spans.groupby("doc_id").map_groups(
        per_doc, batch_format="pyarrow").materialize()

    docs = _read_docs(sf_dir, ["doc_id", "text"])
    if span_lists.count() <= broadcast_limit:
        # all-empty upstreams can surface as schema-less zero-column
        # blocks — drop those before concat.  The broadcast payload is
        # a doc_id-SORTED Arrow table, not a Python dict: building and
        # ray.put-ing a 562k-entry dict measured 21 s of driver time at
        # 20M docs, where sorting the Arrow table and putting it is
        # ~1 s (columnar serialization) and the actor-side lookup is a
        # vectorized searchsorted per batch.
        tables = [t for t in ray.get(span_lists.to_arrow_refs())
                  if t.num_columns]
        if tables:
            table = pa.concat_tables(tables)
            table = table.take(pa.array(np.argsort(
                table.column("doc_id").to_numpy(), kind="stable")))
        else:
            table = pa.table({"doc_id": pa.array([], pa.int64()),
                              "spans": pa.array([], pa.string())})
        ref = ray.put(table)
        return (docs.map_batches(
                    _SpanCleaner, fn_constructor_kwargs={"spans_ref": ref,
                                                         "window": window},
                    batch_format="pyarrow", concurrency=(1, 24))
                .sort("doc_id"))

    # partitioned-broadcast fallback: doc_id-range span partitions on
    # disk, cleaned by actors that load only their slices
    import glob as _glob
    import os as _os

    import pyarrow.parquet as pqt

    n_span_docs = span_lists.count()
    path = f"{sf_dir}/documents.parquet"
    if _os.path.isdir(path):  # large corpora are file-per-shard dirs
        num_docs = sum(pqt.read_metadata(p).num_rows
                       for p in _glob.glob(f"{path}/*.parquet"))
    else:
        num_docs = pqt.read_metadata(path).num_rows
    n_parts = max(1, min(4096, -(-n_span_docs // 262_144)))
    doc_span = max(1, -(-num_docs // n_parts))
    root = _write_span_partitions(span_lists, doc_span)
    return (docs.map_batches(
                _PartitionedSpanCleaner,
                fn_constructor_kwargs={"root": root, "doc_span": doc_span,
                                       "window": window},
                batch_format="pyarrow", concurrency=(1, 24))
            .sort("doc_id"))


def _write_span_partitions(span_lists, doc_span: int) -> str:
    """Write the per-doc span table doc_id-range partitioned under /tmp:
    each map task slices its batch by ``doc_id // doc_span`` and appends
    one parquet file per touched partition dir — only ack paths reach
    the driver.  Multiple files per partition are fine; readers glob."""
    import os
    import tempfile
    import uuid

    import pyarrow.parquet as pqt

    os.makedirs("/tmp/noise_ray_cache", exist_ok=True)
    root = tempfile.mkdtemp(prefix="spans-", dir="/tmp/noise_ray_cache")

    def write_part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or b.num_columns == 0:
            return pa.table({"path": pa.array([], pa.string())})
        part = b.column("doc_id").to_numpy() // doc_span
        order = np.argsort(part, kind="stable")
        b = b.take(pa.array(order))
        part = part[order]
        brk = np.flatnonzero(np.r_[True, part[1:] != part[:-1]])
        bounds = np.r_[brk, part.size]
        paths = []
        for i, s in enumerate(brk):
            pdir = os.path.join(root, f"part={int(part[s]):08d}")
            os.makedirs(pdir, exist_ok=True)
            fp = os.path.join(pdir, f"{uuid.uuid4().hex}.parquet")
            pqt.write_table(b.slice(s, bounds[i + 1] - s), fp)
            paths.append(fp)
        return pa.table({"path": pa.array(paths, pa.string())})

    span_lists.map_batches(write_part, batch_format="pyarrow").take_all()
    return root


class _PartitionedSpanCleaner:
    """Actor-pool cleaning stage for the above-broadcast-limit case:
    per batch it loads (LRU-cached) just the doc_id-range span
    partitions its documents fall in — memory is bounded by
    ``max_cached`` partition slices, not the span-table size."""

    def __init__(self, root: str, doc_span: int, window: int,
                 max_cached: int = 8):
        from collections import OrderedDict

        self.root = root
        self.doc_span = doc_span
        self.window = window
        self._cache: "OrderedDict[int, dict]" = OrderedDict()
        self._max = max_cached

    def _part(self, p: int) -> dict:
        import glob
        import os

        import pyarrow.parquet as pqt

        c = self._cache
        if p in c:
            c.move_to_end(p)
            return c[p]
        lut: dict = {}
        for f in glob.glob(os.path.join(self.root, f"part={p:08d}",
                                        "*.parquet")):
            t = pqt.read_table(f)
            lut.update(zip(t.column("doc_id").to_pylist(),
                           t.column("spans").to_pylist()))
        c[p] = lut
        if len(c) > self._max:
            c.popitem(last=False)
        return lut

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        luts = {int(p): self._part(int(p))
                for p in np.unique(ids // self.doc_span)}
        dspan = self.doc_span
        return _clean_batch(batch,
                            lambda _i, did: luts[did // dspan].get(did))


def _clean_batch(batch: pa.Table, spans_of) -> pa.Table:
    """Shared cleaning kernel, vectorized over the WHOLE batch: one
    Arrow lower+regex-collapse+split tokenization pass, one global
    searchsorted for span membership (per-doc coordinates lifted onto
    disjoint int64 ranges via a doc stride, with a sentinel span per
    doc so docs without spans need no branch), and one Arrow
    ``binary_join`` to re-assemble the surviving tokens — no per-doc
    Python tokenize/join in the hot path."""
    import pyarrow.compute as pc

    n = batch.num_rows
    ids = batch.column("doc_id").to_pylist()
    if n == 0:
        return pa.table({
            "doc_id": pa.array([], pa.int64()),
            "clean_text": pa.array([], pa.string()),
            "n_removed": pa.array([], pa.int64()),
        })

    norm = pc.utf8_trim_whitespace(pc.replace_substring_regex(
        pc.utf8_lower(batch.column("text")), "[^a-z0-9]+", " "))
    toks = pc.split_pattern(norm, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    counts = np.asarray(toks.value_lengths(), np.int64)
    flat = toks.flatten()
    # an all-separator doc trims to "" and splits to one empty token —
    # drop those so positions match the oracle's [a-z0-9]+ stream
    valid = np.asarray(pc.utf8_length(flat), np.int64) > 0
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
    counts_v = np.bincount(doc_idx[valid], minlength=n).astype(np.int64)
    flat_v = flat.filter(pa.array(valid))
    cum = np.r_[0, np.cumsum(counts_v)]
    pos = np.arange(cum[-1], dtype=np.int64) - np.repeat(cum[:-1], counts_v)
    doc_idx_v = np.repeat(np.arange(n, dtype=np.int64), counts_v)

    # per-doc spans with a leading (-1, -1) sentinel, lifted by a doc
    # stride so one sorted global searchsorted covers every doc
    st_parts, en_parts, sp_counts = [], [], np.empty(n, np.int64)
    for i in range(n):
        enc = spans_of(i, ids[i])
        if enc:
            arr = np.fromiter(
                (int(x) for p in enc.split(",") for x in p.split(":")),
                np.int64)
            s, e = arr[0::2], arr[1::2]
        else:
            s = e = np.empty(0, np.int64)
        st_parts.append(np.r_[-1, s])
        en_parts.append(np.r_[-1, e])
        sp_counts[i] = s.size + 1
    stride = int(counts_v.max(initial=0)) + 2
    doc_of_span = np.repeat(np.arange(n, dtype=np.int64), sp_counts)
    starts_g = np.concatenate(st_parts) + doc_of_span * stride
    ends_g = np.concatenate(en_parts) + doc_of_span * stride
    pos_g = pos + doc_idx_v * stride
    j = np.searchsorted(starts_g, pos_g, side="right") - 1
    covered = pos_g <= ends_g[j]

    n_removed = np.bincount(doc_idx_v[covered], minlength=n)
    kept = counts_v - n_removed
    surv = flat_v.filter(pa.array(~covered))
    out = pa.ListArray.from_arrays(
        pa.array(np.r_[0, np.cumsum(kept)], pa.int32()), surv)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "clean_text": pc.binary_join(out, " "),
        "n_removed": pa.array(n_removed.astype(np.int64), pa.int64()),
    })


class _SpanCleaner:
    """Actor-pool cleaning stage: the broadcast doc_id-sorted span
    table materializes ONCE per actor in __init__ (ray.get of the
    shared ref — zero-copy columns from the object store), then every
    batch resolves its docs' span strings with one searchsorted."""

    def __init__(self, spans_ref, window: int):
        import ray as _ray

        table = _ray.get(spans_ref)
        self._ids = table.column("doc_id").to_numpy()
        self._spans = table.column("spans")
        self.window = window

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = self._ids
        spans = self._spans
        docs = batch.column("doc_id").to_numpy()
        pos = np.searchsorted(ids, docs)
        pos_c = np.minimum(pos, max(ids.size - 1, 0))
        hit = (ids[pos_c] == docs) if ids.size else np.zeros(docs.size,
                                                            bool)

        def lookup(i, _did):
            return spans[pos[i]].as_py() if hit[i] else None

        return _clean_batch(batch, lookup)
