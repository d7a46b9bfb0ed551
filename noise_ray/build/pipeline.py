"""Index build pipeline (Ray Data).

Logical stages, mirroring the reference ingest path
(/root/reference/src/index.rs:131-161 ``add`` → shred → postings → counts)
re-expressed as ONE streaming Ray Data execution:

  stage 1  ingest+docmap   per input file task: assign dense doc_ids from the
                           metadata plan, verify/establish (conv_id, turn_idx)
                           order, write `docmap-*.parquet` (the doc store —
                           the analogue of noise's V keyspace) as a side
                           effect, and EMIT the sorted (doc_id, fields…)
                           table downstream — no write+read-back round trip.
                           Idempotent (tmp+rename), resumable per file.
  stage 2  tokenize        actor-pool ``map_batches`` over zero-copy Arrow
                           batches → per-(field, term) PRE-COMBINED posting
                           runs, already delta+varint ENCODED (ascending
                           doc order) with a shuffle key `gkey` = (term
                           bucket, doc range).  Replicates
                           src/json_shred.rs:148-203 with a map-side
                           combiner: the wide shuffle moves one ~2B/posting
                           binary row per (task, field, term), not one
                           20B+ row per posting.
  stage 3  shuffle+write   ``groupby(gkey).map_groups`` → segment writer:
                           order the mapper's finished blocks by (field,
                           term, min_doc) and write them through (runs are
                           doc-disjoint — each ingest task owns a contiguous
                           doc range — and arrive pre-chunked to block_size
                           with block-max metadata, so no posting is decoded
                           or re-encoded here),
                           write `seg-*.parquet` AND the group's term-stats
                           partition `stats-*.parquet` (C = Σ tf and
                           K-contribution = Σ postings per (field, term) —
                           the reference's merge-summed C/K counters,
                           src/key_builder.rs:84-102, computed locally since
                           a (field, term) run lives wholly inside its
                           shuffle group).  Idempotent, resumable per group
                           (committed groups are filtered before the
                           shuffle); commit order stats→segment so a segment
                           file's presence implies its stats exist.
  stage 4  manifest        atomic manifest.json publish (the analogue of the
                           reference's atomic WriteBatch flush,
                           src/index.rs:218-227), assembled from the plan
                           metadata + writer acks — no re-read of payloads.

Hot-term skew is handled structurally: the shuffle key includes the doc
range, so a hot term's postings split across `num_ranges` groups, each
bounded; the per-term posting list is the doc-ordered concatenation of its
blocks across range files (a streaming merge at query time).  At 10^12-turn
scale, tune ``docs_per_range`` (group memory bound) and ``num_buckets``
(shuffle fan-out) together; both are recorded in the manifest so readers
need no configuration.
"""

from __future__ import annotations

import json
import os
import time
import uuid
import zlib
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..analysis.tokenizer import tokenize_grouped
from .codec import encode_deltas, encode_position_lists, encode_varint
from .docids import FilePlan, plan_doc_ids, sorted_key_indices

DEFAULT_FIELDS = ("role", "text", "tool")
MANIFEST_NAME = "manifest.json"


def term_bucket(term: str, num_buckets: int) -> int:
    return zlib.crc32(term.encode("utf-8")) % num_buckets


def _atomic_write_table(table: pa.Table, path: str, row_group_size: int = 2048):
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    pq.write_table(table, tmp, row_group_size=row_group_size)
    os.replace(tmp, path)


# ----------------------------------------------------------------- stage 1

def _ingest_emit(batch: pa.Table, key_columns, docmap_dir: str,
                 fields: tuple) -> pa.Table:
    """Ingest the plan rows in ``batch``: write each file's docmap partition
    (idempotent) and emit the sorted (doc_id, *fields) rows downstream."""
    outs = []
    emit_cols = ["doc_id", *fields]
    for row in batch.to_pylist():
        plan_path, offset, rows, seq = (
            row["path"], int(row["offset"]), int(row["rows"]), int(row["seq"]))
        out_path = os.path.join(docmap_dir, f"docmap-{seq:05d}.parquet")
        if os.path.exists(out_path):
            md = pq.read_metadata(out_path)
            if md.num_rows == rows:  # lineage hit: already ingested
                outs.append(pq.read_table(out_path, columns=emit_cols))
                continue
        t = pq.read_table(plan_path)
        idx = sorted_key_indices(t, list(key_columns))
        idx_np = np.asarray(idx)
        if not (idx_np == np.arange(len(idx_np))).all():
            t = t.take(idx)
        if "doc_id" in t.column_names:  # source already has a doc_id column
            t = t.rename_columns(
                ["src_doc_id" if c == "doc_id" else c for c in t.column_names])
        doc_ids = pa.array(np.arange(offset, offset + t.num_rows, dtype=np.int64))
        t = t.add_column(0, "doc_id", doc_ids)
        if t.num_rows != rows:
            raise ValueError(
                f"{plan_path}: footer said {rows} rows, read {t.num_rows}")
        _atomic_write_table(t, out_path, row_group_size=65536)
        outs.append(t.select(emit_cols))
    if not outs:
        return pa.table({c: [] for c in emit_cols})
    return pa.concat_tables(outs)


# ----------------------------------------------------------------- stage 2

_BUCKET_CACHE: dict[tuple[int, str], int] = {}


def tokenize_batch(batch: pa.Table, *, fields: tuple, num_buckets: int,
                   num_ranges: int, range_span: int,
                   range_base: int = 0, block_size: int = 4096) -> pa.Table:
    """Task-based batch tokenizer with a map-side combiner (see
    TokenizeBatch).  Worker processes persist module state across tasks, so
    the stemmer lru_cache and bucket cache warm up exactly like an actor's
    would — without actor-pool scale-up lag."""
    tk = TokenizeBatch(fields, num_buckets, num_ranges, range_span, range_base,
                       block_size)
    tk._bucket_cache = _BUCKET_CACHE_FOR(num_buckets)
    return tk(batch)


_BUCKET_CACHES: dict[int, dict] = {}


def _BUCKET_CACHE_FOR(num_buckets: int) -> dict:
    c = _BUCKET_CACHES.get(num_buckets)
    if c is None:
        c = _BUCKET_CACHES[num_buckets] = {}
    return c


class TokenizeBatch:
    """Batch tokenizer with a map-side combiner.

    Tokenizes every field of every doc in the batch
    (src/json_shred.rs:148-203) and PRE-COMBINES postings per (field, term)
    into one "posting run" row per distinct term: ``docs`` ascending, plus
    aligned ``tfs`` / ``lens`` and the flattened position lists.  Batches
    arrive in ascending doc order (each ingest task covers a contiguous
    doc_id range), so runs from different tasks are doc-disjoint and the
    segment writer can merge them by simple min_doc-ordered concatenation.
    This shrinks the wide shuffle from one row per posting to one row per
    (task, field, term) — the partial-aggregation-before-groupby pattern.
    """

    def __init__(self, fields: tuple, num_buckets: int, num_ranges: int,
                 range_span: int, range_base: int = 0,
                 block_size: int = 4096):
        self.fields = fields
        self.num_buckets = num_buckets
        self.num_ranges = num_ranges
        self.range_span = range_span
        self.range_base = range_base  # first doc_id (incremental epochs)
        self.block_size = block_size
        self._bucket_cache: dict[str, int] = {}

    def _bucket(self, term: str) -> int:
        b = self._bucket_cache.get(term)
        if b is None:
            b = term_bucket(term, self.num_buckets)
            if len(self._bucket_cache) < 1_000_000:
                self._bucket_cache[term] = b
        return b

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy()
        nr, span = self.num_ranges, self.range_span
        bucket = self._bucket
        # (field, term) -> [docs, tfs, lens, flat positions]
        acc: dict[tuple[int, str], list] = {}
        for fi, fname in enumerate(self.fields):
            col = batch.column(fname)
            for i, v in enumerate(col.to_pylist()):
                if v is None:
                    continue  # absent field: no postings, no K/L entries
                terms, positions, field_len = tokenize_grouped(v)
                doc = int(doc_ids[i])
                for t, p in zip(terms, positions):
                    e = acc.get((fi, t))
                    if e is None:
                        acc[(fi, t)] = e = ([], [], [], [])
                    e[0].append(doc)
                    e[1].append(len(p))
                    e[2].append(field_len)
                    e[3].extend(p)
        out = {k: [] for k in ("gkey", "field", "term", "min_doc", "max_doc",
                               "cnt", "c_block", "max_tf_norm",
                               "max_tf", "min_len",
                               "docs", "tfs", "lens", "pos")}
        bsz = self.block_size
        for (fi, t), (docs, tfs, lens, pos) in acc.items():
            b = bucket(t) * nr
            docs_np = np.asarray(docs, dtype=np.int64)
            tfs_np = np.asarray(tfs, dtype=np.int64)
            lens_np = np.asarray(lens, dtype=np.int64)
            pos_np = np.asarray(pos, dtype=np.int64)
            pos_ends = np.cumsum(tfs_np)
            tf_norm = np.sqrt(tfs_np.astype(np.float32)) / np.sqrt(
                lens_np.astype(np.float32))
            # split the run at doc-range boundaries so each row belongs to
            # exactly one shuffle group (gkey = bucket × range)
            if nr == 1:
                starts, ends = [0], [docs_np.size]
            else:
                rng_of = np.minimum((docs_np - self.range_base) // span, nr - 1)
                cut = np.flatnonzero(np.diff(rng_of)) + 1
                starts = np.concatenate(([0], cut))
                ends = np.concatenate((cut, [docs_np.size]))
            for r_lo, r_hi in zip(starts, ends):
                r_lo, r_hi = int(r_lo), int(r_hi)
                rng = min((int(docs_np[r_lo]) - self.range_base) // span,
                          nr - 1)
                g = b + rng
                # chunk at block_size: each emitted row IS a finished
                # posting block (self-contained encodings, block metadata
                # computed here) — the segment writer never re-encodes
                for lo in range(r_lo, r_hi, bsz):
                    hi = min(lo + bsz, r_hi)
                    p_lo = int(pos_ends[lo - 1]) if lo else 0
                    p_hi = int(pos_ends[hi - 1])
                    out["gkey"].append(g)
                    out["field"].append(fi)
                    out["term"].append(t)
                    out["min_doc"].append(int(docs_np[lo]))
                    out["max_doc"].append(int(docs_np[hi - 1]))
                    out["cnt"].append(hi - lo)
                    out["c_block"].append(int(p_hi - p_lo))
                    out["max_tf_norm"].append(float(tf_norm[lo:hi].max()))
                    # BM25 block bounds: the kernel is increasing in tf and
                    # decreasing in dl, so (max tf, min dl) upper-bounds any
                    # posting's contribution (Lucene-impact-style skip data)
                    out["max_tf"].append(int(tfs_np[lo:hi].max()))
                    out["min_len"].append(int(lens_np[lo:hi].min()))
                    # pre-encode in the mapper: the wide shuffle moves varint
                    # bytes (~2B/posting), not int64 lists (~20B/posting)
                    out["docs"].append(encode_deltas(docs_np[lo:hi]))
                    out["tfs"].append(encode_varint(tfs_np[lo:hi]))
                    out["lens"].append(encode_varint(lens_np[lo:hi]))
                    out["pos"].append(
                        encode_position_lists(pos_np[p_lo:p_hi],
                                              tfs_np[lo:hi]))
        return pa.table(
            {
                "gkey": pa.array(out["gkey"], pa.int32()),
                "field": pa.array(out["field"], pa.int32()),
                "term": pa.array(out["term"], pa.string()),
                "min_doc": pa.array(out["min_doc"], pa.int64()),
                "max_doc": pa.array(out["max_doc"], pa.int64()),
                "cnt": pa.array(out["cnt"], pa.int32()),
                "c_block": pa.array(out["c_block"], pa.int64()),
                "max_tf_norm": pa.array(out["max_tf_norm"], pa.float32()),
                "max_tf": pa.array(out["max_tf"], pa.int64()),
                "min_len": pa.array(out["min_len"], pa.int64()),
                "docs": pa.array(out["docs"], pa.binary()),
                "tfs": pa.array(out["tfs"], pa.binary()),
                "lens": pa.array(out["lens"], pa.binary()),
                "pos": pa.array(out["pos"], pa.binary()),
            }
        )


# ----------------------------------------------------------------- stage 3

def _seg_path(seg_dir: str, gkey: int) -> str:
    return os.path.join(seg_dir, f"seg-{gkey:08d}.parquet")


def _stats_path(stats_dir: str, gkey: int) -> str:
    return os.path.join(stats_dir, f"stats-{gkey:08d}.parquet")


def _ack(gkey: int, path: str, stats_path: str, postings: int,
         field_k: dict) -> pa.Table:
    return pa.table({
        "gkey": pa.array([gkey], pa.int32()),
        "path": pa.array([path]),
        "stats_path": pa.array([stats_path]),
        "postings": pa.array([postings], pa.int64()),
        "field_k": pa.array([json.dumps(field_k, sort_keys=True)]),
    })


def read_group_meta(stats_path: str) -> dict:
    """Committed-group metadata (postings count, per-field K contribution)
    from the stats file's schema metadata — no payload read."""
    md = pq.read_metadata(stats_path).metadata or {}
    return {
        "postings": int(md.get(b"noise_postings", b"0")),
        "field_k": json.loads(md.get(b"noise_field_k", b"{}")),
    }


def _write_segment_group(group: pa.Table, seg_dir: str, stats_dir: str,
                         block_size: int) -> pa.Table:
    """Segment writer: one shuffle group (term bucket × doc range) → one
    segment file + its term-stats partition."""
    gkey = int(group.column("gkey")[0].as_py())
    out_path = _seg_path(seg_dir, gkey)
    stats_path = _stats_path(stats_dir, gkey)
    if os.path.exists(out_path) and os.path.exists(stats_path):
        meta = read_group_meta(stats_path)  # resume: group already committed
        return _ack(gkey, out_path, stats_path, meta["postings"],
                    meta["field_k"])

    # ---- order finished blocks by (field, term, min_doc): rows arrive from
    # the mapper ALREADY encoded and chunked to block_size with their block
    # metadata computed, so the writer is a pure passthrough — no posting is
    # ever decoded or re-encoded here (runs are doc-disjoint per (field,
    # term); each block's encodings are self-contained).
    r_field = group.column("field").to_numpy()
    r_min = group.column("min_doc").to_numpy()
    # dictionary codes replace per-row term strings: the sort key is the
    # sorted rank of each DISTINCT term (distinct terms << rows), so no
    # object array of row strings ever materializes
    enc = pa.compute.dictionary_encode(group.column("term")
                                       .combine_chunks())
    t_codes = enc.indices.to_numpy().astype(np.int64)
    t_dict = enc.dictionary.to_pylist()
    rank_of = np.empty(len(t_dict), np.int64)
    rank_of[np.argsort(np.asarray(t_dict, dtype=object))] = np.arange(
        len(t_dict))
    r_rank = rank_of[t_codes] if len(t_dict) else t_codes
    order = np.lexsort((r_min, r_rank, r_field))
    ordered = group.take(pa.array(order))

    # term stats over the sorted rows (one reduceat per column): C = Σ tf,
    # K-contribution = Σ postings — the reference's merge-summed counters
    # (/root/reference/src/json_shred.rs:191-199)
    s_field = r_field[order]
    s_rank = r_rank[order]
    s_code = t_codes[order]
    s_cnt = group.column("cnt").to_numpy()[order].astype(np.int64)
    s_cblk = group.column("c_block").to_numpy()[order]
    n = len(order)
    if n:
        new_term = np.empty(n, dtype=bool)
        new_term[0] = True
        new_term[1:] = ((s_field[1:] != s_field[:-1])
                        | (s_rank[1:] != s_rank[:-1]))
        t_starts = np.flatnonzero(new_term)
        stat_c = np.add.reduceat(s_cblk, t_starts)
        stat_k = np.add.reduceat(s_cnt, t_starts)
        stat_field_np = s_field[t_starts]
        field_k: dict[str, int] = {}
        for fi in np.unique(s_field):
            field_k[str(int(fi))] = int(s_cnt[s_field == fi].sum())
        stats = pa.table({
            "field": pa.array(stat_field_np.astype(np.int32)),
            "term": pa.array([t_dict[c] for c in s_code[t_starts]],
                             pa.string()),
            "c": pa.array(stat_c.astype(np.int64)),
            "k": pa.array(stat_k.astype(np.int64)),
        })
        postings_total = int(s_cnt.sum())
    else:
        field_k = {}
        stats = pa.table({
            "field": pa.array([], pa.int32()),
            "term": pa.array([], pa.string()),
            "c": pa.array([], pa.int64()),
            "k": pa.array([], pa.int64()),
        })
        postings_total = 0
    stats = stats.replace_schema_metadata({
        "noise_gkey": str(gkey),
        "noise_postings": str(postings_total),
        "noise_field_k": json.dumps(field_k, sort_keys=True),
    })

    seg = ordered.select(["field", "term", "min_doc", "max_doc", "cnt",
                          "c_block", "max_tf_norm", "max_tf", "min_len",
                          "docs", "tfs", "lens", "pos"]).rename_columns(
        ["field", "term", "min_doc", "max_doc", "cnt", "c_block",
         "max_tf_norm", "max_tf", "min_len", "docs", "tfs", "lens",
         "positions"])
    seg = seg.replace_schema_metadata(
        {"noise_gkey": str(gkey), "noise_postings": str(postings_total)})
    # commit order: stats first, segment last — segment presence ⇒ committed
    _atomic_write_table(stats, stats_path, row_group_size=8192)
    # small row groups: a block row is ~block_size×2B of payload, so 64
    # rows ≈ 0.5 MB — per-block WAND payload fetches (min_doc filters)
    # prune to one row group instead of re-reading the term's whole run
    _atomic_write_table(seg, out_path, row_group_size=64)
    return _ack(gkey, out_path, stats_path, postings_total, field_k)


# ------------------------------------------------------------------ driver

def _repartition_by_key(paths: list[str], key_columns: list[str],
                        out_dir: str) -> list[str]:
    """Globally sort ``paths`` by ``key_columns`` into a range-partitioned
    copy under ``out_dir`` (one explicit wide shuffle), so the metadata-only
    doc_id plan applies.  Idempotent: an existing copy whose recorded input
    fingerprint (sorted paths + sizes + mtimes) matches is reused (resume);
    anything else — partial copy, or a rebuild with different inputs that
    happen to share a row count — is rebuilt."""
    import shutil

    expected = sum(pq.read_metadata(p).num_rows for p in paths)
    fp = {"inputs": sorted(
        [os.path.abspath(p), os.path.getsize(p), os.path.getmtime(p)]
        for p in paths)}

    def _files(d: str) -> list[str]:
        return sorted(os.path.join(d, f) for f in os.listdir(d)
                      if f.endswith(".parquet"))

    fp_name = "inputs.json"
    if os.path.isdir(out_dir):
        files = _files(out_dir)
        old_fp = None
        try:
            with open(os.path.join(out_dir, fp_name)) as f:
                old_fp = json.load(f)
        except (FileNotFoundError, ValueError):
            pass
        if (files and old_fp == fp
                and sum(pq.read_metadata(f).num_rows for f in files) == expected):
            return files
        shutil.rmtree(out_dir)

    tmp = f"{out_dir}.tmp-{uuid.uuid4().hex[:8]}"
    ray.data.read_parquet(paths).sort(list(key_columns)).write_parquet(tmp)
    files = _files(tmp)
    got = sum(pq.read_metadata(f).num_rows for f in files)
    if got != expected:
        raise RuntimeError(
            f"repartition wrote {got} rows, expected {expected}")
    with open(os.path.join(tmp, fp_name), "w") as f:
        json.dump(fp, f)
    os.replace(tmp, out_dir)
    return _files(out_dir)


def build_index(
    input_paths: list[str],
    index_dir: str,
    *,
    fields: tuple = DEFAULT_FIELDS,
    key_columns: tuple = ("conv_id", "turn_idx"),
    num_buckets: int | None = None,
    docs_per_range: int | None = None,
    block_size: int = 4096,
    tokenize_batch_size: int | None = None,
    tokenize_concurrency: tuple | int | None = None,
    doc_id_offset: int = 0,
    docs_per_ingest_task: int | None = None,
) -> dict[str, Any]:
    """Build (or resume) an index at ``index_dir``; returns the manifest.

    ``doc_id_offset`` shifts all assigned doc_ids (used by incremental
    epochs, noise_ray/build/incremental.py: new docs continue the parent
    index's seq space, mirroring the reference's monotonically increasing
    seq across adds, /root/reference/src/index.rs:146-155)."""
    t_build_start = time.time()
    docmap_dir = os.path.join(index_dir, "docmap")
    seg_dir = os.path.join(index_dir, "segments")
    stats_dir = os.path.join(index_dir, "stats")
    for d in (docmap_dir, seg_dir, stats_dir):
        os.makedirs(d, exist_ok=True)

    # ---- plan: metadata-only doc_id assignment; inputs whose key ranges
    # overlap first pass through ONE explicit global sort into a
    # range-partitioned copy (the documented fallback in docids.py — the
    # normal 100 TB layout is already range-partitioned and skips this)
    try:
        plans: list[FilePlan] = plan_doc_ids(list(input_paths),
                                             list(key_columns))
    except ValueError:
        repart = _repartition_by_key(list(input_paths), list(key_columns),
                                     os.path.join(index_dir, "repartitioned"))
        plans = plan_doc_ids(repart, list(key_columns))
    for p in plans:
        p.offset += doc_id_offset
    num_docs = sum(p.rows for p in plans)
    if docs_per_range is None:
        # doc ranges bound per-group work AND split hot-term buckets (Zipf
        # skew): the hottest stem's postings never concentrate in a single
        # straggler group.  Cap range count so the manifest stays small.
        docs_per_range = 250_000
    num_ranges = max(1, min(64, -(-num_docs // docs_per_range)))
    range_span = max(1, -(-num_docs // num_ranges))
    if num_buckets is None:
        # shuffle fan-out sized to the corpus; floor keeps small builds cheap
        num_buckets = max(32, min(4096, -(-num_docs // 200_000)))

    # ---- resume state: a group is committed iff BOTH files exist
    done_gkeys = frozenset(
        g for g in (
            int(f.split("-")[1].split(".")[0])
            for f in os.listdir(seg_dir)
            if f.startswith("seg-") and f.endswith(".parquet")
        )
        if os.path.exists(_stats_path(stats_dir, g))
    )

    # ---- single streaming execution: ingest → tokenize → shuffle → write
    # The plan rows are ~100-byte blocks; without this, Ray Data bundles them
    # all into ONE ingest task (target_min_block_size coalescing) and the
    # whole pipeline serializes.
    ctx = ray.data.DataContext.get_current()
    prev_min_block = ctx.target_min_block_size
    ctx.target_min_block_size = 1

    # Ingest task granularity is DATA-proportional (~docs_per_ingest_task
    # rows per task), NOT file- or cluster-proportional.  One task per file
    # would make the sort shuffle's partition-object count quadratic in file
    # count (400 files -> 160k tiny objects) and multiply combiner output
    # rows (each task re-lists the common stems); scaling tasks with
    # cluster CPUs would make the TOTAL work depend on cluster size, so
    # the same input must produce the same tasks at every parallelism
    # (the two-cluster-size scaling criterion measures pure scheduling).
    # Each task owns a contiguous RUN of files — doc_id ranges stay
    # contiguous, which the run-merge in the segment writer relies on.
    # Above ~4.2M docs the per-task size grows so the task count caps at
    # a fixed 256 (input-only, cluster-agnostic): the shuffle's constant
    # overhead grows with map-blocks x reduce-partitions, measured at 22M
    # turns as 172 s with 1343 blocks vs 112 s with 245 (1.53x, same
    # output).
    if docs_per_ingest_task is None:
        docs_per_ingest_task = max(16384, -(-max(num_docs, 1) // 256))
    num_tasks = max(1, min(len(plans),
                           -(-num_docs // docs_per_ingest_task)))

    plan_rows = [{"path": p.path, "offset": p.offset, "rows": p.rows, "seq": i}
                 for i, p in enumerate(plans)]
    postings = (
        ray.data.from_items(plan_rows, override_num_blocks=num_tasks)
        .map_batches(
            _ingest_emit,
            fn_kwargs={"key_columns": key_columns, "docmap_dir": docmap_dir,
                       "fields": tuple(fields)},
            batch_format="pyarrow",
        )
        .map_batches(
            tokenize_batch,
            fn_kwargs={
                "fields": tuple(fields),
                "num_buckets": num_buckets,
                "num_ranges": num_ranges,
                "range_span": range_span,
                "range_base": doc_id_offset,
                "block_size": block_size,
            },
            # batch_size=None → per-block batches: the fused
            # ingest→tokenize op runs one task per input file.  An explicit
            # batch_size would make Ray bundle the 1-row plan blocks into a
            # single task to satisfy it, serializing the whole pipeline.
            batch_size=tokenize_batch_size,
            batch_format="pyarrow",
            concurrency=tokenize_concurrency,
        )
    )
    if done_gkeys:  # resume: drop postings for already-committed groups

        def _drop_done(batch: pa.Table) -> pa.Table:
            mask = np.isin(batch.column("gkey").to_numpy(),
                           np.fromiter(done_gkeys, dtype=np.int64),
                           invert=True)
            return batch.filter(pa.array(mask))

        postings = postings.map_batches(_drop_done, batch_format="pyarrow")

    try:
        acks_ds = (
            postings.groupby("gkey")
            .map_groups(_write_segment_group, batch_format="pyarrow",
                        fn_kwargs={"seg_dir": seg_dir, "stats_dir": stats_dir,
                                   "block_size": block_size})
        )
        acks = acks_ds.take_all()
        if os.environ.get("NOISE_RAY_BUILD_STATS"):
            print(acks_ds.stats())
    finally:
        ctx.target_min_block_size = prev_min_block

    # ---- assemble: writer acks + committed-but-skipped groups
    by_gkey = {int(a["gkey"]): a for a in acks}
    for g in done_gkeys:
        if g not in by_gkey:
            meta = read_group_meta(_stats_path(stats_dir, g))
            by_gkey[g] = {"gkey": g, "path": _seg_path(seg_dir, g),
                          "stats_path": _stats_path(stats_dir, g),
                          "postings": meta["postings"],
                          "field_k": json.dumps(meta["field_k"])}

    field_k: dict[int, int] = {}
    for a in by_gkey.values():
        for f, k in json.loads(a["field_k"]).items():
            field_k[int(f)] = field_k.get(int(f), 0) + int(k)

    # ---- manifest (atomic publish — the analogue of the reference's
    # WriteBatch flush, /root/reference/src/index.rs:218-227)
    manifest = {
        "version": 1,
        "analyzer": "noise-porter2-v1",
        "fields": list(fields),
        "key_columns": list(key_columns),
        "num_docs": num_docs,
        "doc_id_offset": doc_id_offset,
        "num_buckets": num_buckets,
        "num_ranges": num_ranges,
        "range_span": range_span,
        "block_size": block_size,
        "field_k": {str(k): v for k, v in sorted(field_k.items())},
        "docmap": [
            {"path": os.path.join(docmap_dir, f"docmap-{i:05d}.parquet"),
             "rows": p.rows, "min_doc": p.offset,
             "max_doc": p.offset + p.rows - 1}
            for i, p in enumerate(plans)
        ],
        "segments": [
            {"gkey": g, "path": a["path"], "postings": int(a["postings"])}
            for g, a in sorted(by_gkey.items())
        ],
        "stats": [
            {"gkey": g, "bucket": g // num_ranges, "path": a["stats_path"]}
            for g, a in sorted(by_gkey.items())
        ],
        # build metrics next to the lineage (north-rule: resumable from
        # checkpoint with per-partition lineage + metrics): wall/throughput
        # for THIS invocation, and how much of the work a resume skipped
        "metrics": {
            "build_wall_sec": round(time.time() - t_build_start, 3),
            "turns_per_sec": round(
                num_docs / max(time.time() - t_build_start, 1e-9), 1),
            "ingest_tasks": len(plans),
            "segment_groups": len(by_gkey),
            "resumed_groups": len(done_gkeys),
            "total_postings": int(sum(int(a["postings"])
                                      for a in by_gkey.values())),
        },
    }
    # on disk the manifest holds RELATIVE paths (the index directory is
    # relocatable — compaction swaps directories, and a 100 TB index moves
    # between stores); the returned dict keeps absolute paths for callers.
    disk = json.loads(json.dumps(manifest))
    for part in ("docmap", "segments", "stats"):
        for e in disk[part]:
            e["path"] = os.path.relpath(e["path"], index_dir)
    tmp = os.path.join(index_dir, f".{MANIFEST_NAME}.tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        json.dump(disk, f, indent=1)
    os.replace(tmp, os.path.join(index_dir, MANIFEST_NAME))
    return manifest
