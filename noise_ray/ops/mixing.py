"""Corpus-assembly operators: token-budget sequence packing, domain
mixture resampling, and deterministic train/val/test splits — the last
mile of a training-data pipeline (after dedup/quality filtering, before
the tokenizer).

Scale notes live on each operator; the common theme is that every
decision is a pure function of (doc_id, config) — no RNG state, no
driver-side ordering pass — so results are identical at any cluster
size and any partitioning, and a resumed run reproduces the same packs
and splits.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .hashing import splitmix64

_SPLIT_SALT = np.uint64(999983)


def _read_docs(sf_dir: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def pack_sequences(sf_dir: str, budget: int = 256,
                   bucket_docs: int = 1 << 14):
    """Token-budget sequence packing: assign each doc (in doc_id order)
    to the training shard whose ``budget``-token window contains the
    doc's starting token offset — ``pack_id = tokens_before // budget``,
    the contiguous-packing layout a dataloader consumes.

    Distributed as a two-level prefix sum, the textbook scale shape for
    a global running total:
      1. one streaming pass computes per-doc token counts (vectorized
         list-offset diff) and a per-bucket (``doc_id // bucket_docs``)
         token sum via a small groupby — bucket count is corpus_size /
         16k, thousands of rows at 100 TB, so the driver-side exclusive
         prefix scan over buckets is trivial and broadcast via
         ``ray.put``;
      2. a ``groupby(bucket).map_groups`` pass sorts each bucket by
         doc_id, takes the within-bucket exclusive cumsum, and adds the
         bucket's broadcast offset.
    The per-doc counts table (3 ints/doc, ~3 orders smaller than the
    text) is materialized once so the text is tokenized exactly once;
    the object store spills it if needed.  The shuffle moves only that
    counts table, never text."""
    from .hashing import tokenize_hashes

    def counts(t: pa.Table) -> pa.Table:
        _, offs = tokenize_hashes(t.column("text"))
        ids = t.column("doc_id").to_numpy()
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_tokens": pa.array(np.diff(offs), pa.int64()),
            "bucket": pa.array(ids // bucket_docs, pa.int64()),
        })

    per_doc = (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(counts, batch_format="pyarrow")
        .materialize()
    )
    return _assign_packs(per_doc, budget)


def _assign_packs(per_doc: "ray.data.Dataset", budget: int):
    """The two-level prefix-sum pack assignment over a materialized
    (doc_id, n_tokens, bucket) counts dataset — shared by
    :func:`pack_sequences` and :func:`corpus_prep`."""
    from ray.data.aggregate import Sum

    bucket_rows = per_doc.groupby("bucket").aggregate(
        Sum("n_tokens", alias_name="tok")).take_all()
    bucket_rows.sort(key=lambda r: r["bucket"])
    bids = np.array([r["bucket"] for r in bucket_rows], dtype=np.int64)
    sums = np.array([r["tok"] for r in bucket_rows], dtype=np.int64)
    offsets = np.concatenate(([0], np.cumsum(sums)[:-1]))
    offset_ref = ray.put((bids, offsets))

    def assign(g: pa.Table) -> pa.Table:
        bids_, offs_ = ray.get(offset_ref)
        g = g.sort_by("doc_id")
        ntok = g.column("n_tokens").to_numpy()
        base = offs_[np.searchsorted(bids_, g.column("bucket")[0].as_py())]
        before = base + np.concatenate(([0], np.cumsum(ntok)[:-1]))
        return pa.table({
            "doc_id": g.column("doc_id"),
            "n_tokens": g.column("n_tokens"),
            "pack_id": pa.array(before // budget, pa.int64()),
        })

    return (
        per_doc.groupby("bucket")
        .map_groups(assign, batch_format="pyarrow")
        .sort("doc_id")
    )


def default_domain_rates(sources) -> dict[str, int]:
    """Deterministic per-source keep percentages standing in for a
    mixture recipe (in real pipelines the weights ARE offline config)."""
    return {s: (int(s.removeprefix("src")) * 13) % 90 + 5
            for s in sources}


def domain_mix_split(sf_dir: str, rates: dict[str, int] | None = None):
    """Domain-mixture resampling + deterministic train/val/test split:
    keep each doc with its source's configured probability (splitmix64
    hash of doc_id against a per-source threshold — reproducible at any
    cluster size, no RNG to coordinate), then assign survivors to
    train/val/test 98/1/1 by a second, salted hash.  One streaming
    ``map_batches`` filter; the mixture table is tiny config captured in
    the task closure.  Output: (doc_id, source, split 0/1/2)."""
    if rates is None:
        rates = default_domain_rates([f"src{i}" for i in range(20)])
    rate_items = sorted(rates.items())
    srcs = np.array([s for s, _ in rate_items])
    thresholds = np.array([(2**64 // 100) * p for _, p in rate_items],
                          dtype=np.uint64)
    unit = np.uint64(2**64 // 100)

    def pick(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.uint64)
        enc = t.column("source").combine_chunks().dictionary_encode()
        uniq_thr = thresholds[
            np.searchsorted(srcs, np.asarray(enc.dictionary, dtype=str))]
        keep = splitmix64(ids) < uniq_thr[enc.indices.to_numpy()]
        t = t.filter(pa.array(keep))
        ids = t.column("doc_id").to_numpy().astype(np.uint64)
        h2 = splitmix64(ids + _SPLIT_SALT)
        split = np.where(h2 < unit * np.uint64(98), 0,
                         np.where(h2 < unit * np.uint64(99), 1, 2))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "source": t.column("source"),
            "split": pa.array(split.astype(np.int64), pa.int64()),
        })

    return (
        _read_docs(sf_dir, ["doc_id", "source"])
        .map_batches(pick, batch_format="pyarrow")
        .sort("doc_id")
    )


def corpus_prep(sf_dir: str, budget: int = 256, bucket_docs: int = 1 << 14):
    """END-TO-END corpus preparation — the composite pipeline a
    training-data team actually runs, as one Ray Data program:

      1. Gopher quality filter on the raw text (drop failing docs),
      2. PII redaction of the survivors,
      3. exact keep-first dedup on the REDACTED text (hash-partitioned
         ``groupby((h1, h2))`` + vectorized Min aggregates — n_tokens is
         identical within a group because the text is, so no join-back),
      4. token-budget sequence packing of the deduped survivors via the
         shared two-level prefix sum.

    Output: (doc_id, n_tokens, pack_id) for every surviving document,
    doc_id-ordered.  Scale shape: steps 1–2 fuse into ONE streaming
    map_batches pass that also hashes and token-counts, so the text is
    read and tokenized exactly once; the only corpus-wide shuffles are
    the dedup groupby (24 B/doc of hashes + 2 ints) and the pack
    bucket-counts fold.  Everything is a pure function of (doc_id,
    text), so a resumed run reproduces identical packs."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    from .hashing import hash_string_array_128, tokenize_values
    from .text import PII_PATTERNS, gopher_counters

    pii = "|".join(f"(?:{p})" for p in PII_PATTERNS.values())
    a_empty = pa.table({"h1": pa.array([], pa.int64()),
                        "h2": pa.array([], pa.int64()),
                        "doc_id": pa.array([], pa.int64()),
                        "n_tokens": pa.array([], pa.int64())})

    def stage_a(b: pa.Table) -> pa.Table:
        *_, keep = gopher_counters(b.column("text"))
        t = b.filter(pa.array(keep.astype(bool)))
        if t.num_rows == 0:
            return a_empty
        red = pc.replace_substring_regex(
            t.column("text").combine_chunks()
            if isinstance(t.column("text"), pa.ChunkedArray)
            else t.column("text"), pii, "[PII]")
        h1, h2 = hash_string_array_128(red)
        _, offs = tokenize_values(red)
        return pa.table({
            "h1": pa.array(h1.view(np.int64)),
            "h2": pa.array(h2.view(np.int64)),
            "doc_id": t.column("doc_id"),
            "n_tokens": pa.array(np.diff(offs), pa.int64()),
        })

    def add_bucket(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_tokens": b.column("n_tokens"),
            "bucket": pa.array(ids // bucket_docs, pa.int64()),
        })

    per_doc = (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(stage_a, batch_format="pyarrow", batch_size=16384)
        .groupby(["h1", "h2"])
        .aggregate(Min("doc_id", alias_name="doc_id"),
                   Min("n_tokens", alias_name="n_tokens"))
        .map_batches(add_bucket, batch_format="pyarrow")
        .materialize()
    )
    return _assign_packs(per_doc, budget)
