"""Index build pipeline (Ray Data).

Logical stages, mirroring the reference ingest path
(/root/reference/src/index.rs:131-161 ``add`` → shred → postings → counts)
re-expressed as a streaming Ray Data pipeline:

  stage 1  ingest+docmap   per input file task: assign dense doc_ids from the
                           metadata plan, verify/establish (conv_id, turn_idx)
                           order, write `docmap-*.parquet` (the doc store —
                           the analogue of noise's V keyspace).  Idempotent
                           (tmp+rename), resumable per file.
  stage 2  tokenize        actor-pool ``map_batches`` over zero-copy Arrow
                           batches → exploded posting rows
                           (field, term, doc_id, tf, positions, field_len)
                           with a shuffle key `gkey` = (term bucket, doc
                           range).  Replicates src/json_shred.rs:148-203.
  stage 3  shuffle+write   ``groupby(gkey).map_groups`` → segment writer:
                           sort by (field, term, doc_id), chunk into posting
                           blocks, delta+varint encode, block-max metadata,
                           write `seg-*.parquet`.  Idempotent, resumable per
                           group (done groups are filtered before the
                           shuffle).
  stage 4  stats           read back segment block metadata columns only →
                           small ``groupby(field, term)`` aggregate → the
                           C/K term statistics (src/key_builder.rs:84-102),
                           partitioned by term bucket for point lookups.
  stage 5  manifest        atomic manifest.json publish (the analogue of the
                           reference's atomic WriteBatch flush,
                           src/index.rs:218-227).

Hot-term skew is handled structurally: the shuffle key includes the doc
range, so a hot term's postings split across `num_ranges` groups, each
bounded; the per-term posting list is the doc-ordered concatenation of its
blocks across range files (a streaming merge at query time).
"""

from __future__ import annotations

import json
import os
import uuid
import zlib
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data
from ray.data.aggregate import Sum

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

def _ingest_file(row: dict, key_columns, docmap_dir: str) -> dict:
    """Read one input file, assign doc_ids, write its docmap partition."""
    plan_path, offset, rows, seq = (
        row["path"],
        int(row["offset"]),
        int(row["rows"]),
        int(row["seq"]),
    )
    out_path = os.path.join(docmap_dir, f"docmap-{seq:05d}.parquet")
    if os.path.exists(out_path):
        md = pq.read_metadata(out_path)
        if md.num_rows == rows:  # lineage hit: already ingested
            return {"path": out_path, "rows": rows, "min_doc": offset,
                    "max_doc": offset + rows - 1, "skipped": True}
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
        raise ValueError(f"{plan_path}: footer said {rows} rows, read {t.num_rows}")
    _atomic_write_table(t, out_path, row_group_size=65536)
    return {"path": out_path, "rows": rows, "min_doc": offset,
            "max_doc": offset + rows - 1, "skipped": False}


# ----------------------------------------------------------------- stage 2

class TokenizeBatch:
    """Actor-pool batch tokenizer: one instance per actor, caches stems.

    Emits one posting row per (doc, field, distinct stem) — the exploded
    form of the reference's W/L entries (src/json_shred.rs:148-203).
    """

    def __init__(self, fields: tuple, num_buckets: int, num_ranges: int,
                 range_span: int):
        self.fields = fields
        self.num_buckets = num_buckets
        self.num_ranges = num_ranges
        self.range_span = range_span
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
        out_field: list[int] = []
        out_term: list[str] = []
        out_doc: list[int] = []
        out_tf: list[int] = []
        out_len: list[int] = []
        out_pos: list[list[int]] = []
        out_gkey: list[int] = []
        nr, span = self.num_ranges, self.range_span
        for fi, fname in enumerate(self.fields):
            col = batch.column(fname)
            for i, v in enumerate(col.to_pylist()):
                if v is None:
                    continue  # absent field: no postings, no K/L entries
                terms, positions, field_len = tokenize_grouped(v)
                doc = int(doc_ids[i])
                rng = min(doc // span, nr - 1)
                for t, p in zip(terms, positions):
                    out_field.append(fi)
                    out_term.append(t)
                    out_doc.append(doc)
                    out_tf.append(len(p))
                    out_len.append(field_len)
                    out_pos.append(p)
                    out_gkey.append(self._bucket(t) * nr + rng)
        return pa.table(
            {
                "gkey": pa.array(out_gkey, pa.int32()),
                "field": pa.array(out_field, pa.int32()),
                "term": pa.array(out_term, pa.string()),
                "doc_id": pa.array(out_doc, pa.int64()),
                "tf": pa.array(out_tf, pa.int32()),
                "field_len": pa.array(out_len, pa.int32()),
                "positions": pa.array(out_pos, pa.list_(pa.int32())),
            }
        )


# ----------------------------------------------------------------- stage 3

def _write_segment_group(group: pa.Table, seg_dir: str, block_size: int) -> pa.Table:
    """Segment writer: one shuffle group (term bucket × doc range) → one file."""
    gkey = int(group.column("gkey")[0].as_py())
    out_path = os.path.join(seg_dir, f"seg-{gkey:08d}.parquet")
    ack = pa.table({"gkey": pa.array([gkey], pa.int32()),
                    "path": pa.array([out_path]),
                    "postings": pa.array([group.num_rows], pa.int64())})
    if os.path.exists(out_path):
        return ack  # resume: group already committed

    idx = pc.sort_indices(
        group,
        sort_keys=[("field", "ascending"), ("term", "ascending"),
                   ("doc_id", "ascending")],
    )
    group = group.take(idx)
    fields = group.column("field").to_numpy()
    terms = group.column("term").to_pandas().to_numpy()  # object array
    docs = group.column("doc_id").to_numpy()
    tfs = group.column("tf").to_numpy()
    lens = group.column("field_len").to_numpy()
    pos = group.column("positions")
    pos_flat = np.asarray(pos.combine_chunks().flatten())
    pos_splits = np.cumsum(tfs)

    # run boundaries per (field, term)
    n = len(fields)
    new_run = np.empty(n, dtype=bool)
    new_run[0] = True
    new_run[1:] = (fields[1:] != fields[:-1]) | (terms[1:] != terms[:-1])
    run_starts = np.flatnonzero(new_run)
    run_ends = np.append(run_starts[1:], n)

    rows: dict[str, list] = {k: [] for k in (
        "field", "term", "min_doc", "max_doc", "cnt", "c_block",
        "max_tf_norm", "docs", "tfs", "lens", "positions")}
    tf_norm_all = np.sqrt(tfs.astype(np.float32)) / np.sqrt(lens.astype(np.float32))
    for rs, re_ in zip(run_starts, run_ends):
        for bs in range(rs, re_, block_size):
            be = min(bs + block_size, re_)
            d = docs[bs:be]
            t = tfs[bs:be]
            l = lens[bs:be]
            p0 = int(pos_splits[bs - 1]) if bs > 0 else 0
            p1 = int(pos_splits[be - 1])
            rows["field"].append(int(fields[rs]))
            rows["term"].append(terms[rs])
            rows["min_doc"].append(int(d[0]))
            rows["max_doc"].append(int(d[-1]))
            rows["cnt"].append(be - bs)
            rows["c_block"].append(int(t.sum()))
            rows["max_tf_norm"].append(float(tf_norm_all[bs:be].max()))
            rows["docs"].append(encode_deltas(d))
            rows["tfs"].append(encode_varint(t.astype(np.uint64)))
            rows["lens"].append(encode_varint(l.astype(np.uint64)))
            rows["positions"].append(
                encode_position_lists(pos_flat[p0:p1], t))

    seg = pa.table({
        "field": pa.array(rows["field"], pa.int32()),
        "term": pa.array(rows["term"], pa.string()),
        "min_doc": pa.array(rows["min_doc"], pa.int64()),
        "max_doc": pa.array(rows["max_doc"], pa.int64()),
        "cnt": pa.array(rows["cnt"], pa.int32()),
        "c_block": pa.array(rows["c_block"], pa.int64()),
        "max_tf_norm": pa.array(rows["max_tf_norm"], pa.float32()),
        "docs": pa.array(rows["docs"], pa.binary()),
        "tfs": pa.array(rows["tfs"], pa.binary()),
        "lens": pa.array(rows["lens"], pa.binary()),
        "positions": pa.array(rows["positions"], pa.binary()),
    })
    seg = seg.replace_schema_metadata(
        {"noise_gkey": str(gkey), "noise_postings": str(group.num_rows)})
    _atomic_write_table(seg, out_path)
    return ack


# ----------------------------------------------------------------- stage 4

def _add_bucket(batch: pa.Table, num_buckets: int) -> pa.Table:
    buckets = [term_bucket(t, num_buckets)
               for t in batch.column("term").to_pylist()]
    return batch.append_column("bucket", pa.array(buckets, pa.int32()))


def _write_stats_group(group, stats_dir: str) -> pa.Table:
    bucket = int(group.column("bucket")[0].as_py())
    out_path = os.path.join(stats_dir, f"stats-{bucket:05d}.parquet")
    idx = pc.sort_indices(group, sort_keys=[("field", "ascending"),
                                            ("term", "ascending")])
    group = group.take(idx).select(["field", "term", "c", "k"])
    _atomic_write_table(group, out_path)
    return pa.table({"bucket": pa.array([bucket], pa.int32()),
                     "path": pa.array([out_path])})


# ------------------------------------------------------------------ driver

def build_index(
    input_paths: list[str],
    index_dir: str,
    *,
    fields: tuple = DEFAULT_FIELDS,
    key_columns: tuple = ("conv_id", "turn_idx"),
    num_buckets: int = 32,
    docs_per_range: int = 4_000_000,
    block_size: int = 4096,
    tokenize_batch_size: int = 2048,
    tokenize_concurrency: tuple | int = (1, 8),
) -> dict[str, Any]:
    """Build (or resume) an index at ``index_dir``; returns the manifest."""
    docmap_dir = os.path.join(index_dir, "docmap")
    seg_dir = os.path.join(index_dir, "segments")
    stats_dir = os.path.join(index_dir, "stats")
    for d in (docmap_dir, seg_dir, stats_dir):
        os.makedirs(d, exist_ok=True)

    # ---- stage 1: plan + ingest (metadata-only doc_id assignment)
    plans: list[FilePlan] = plan_doc_ids(list(input_paths), list(key_columns))
    num_docs = sum(p.rows for p in plans)
    num_ranges = max(1, -(-num_docs // docs_per_range))
    range_span = max(1, -(-num_docs // num_ranges))

    plan_rows = [{"path": p.path, "offset": p.offset, "rows": p.rows, "seq": i}
                 for i, p in enumerate(plans)]
    acks = (
        ray.data.from_items(plan_rows)
        .map(_ingest_file, fn_kwargs={"key_columns": key_columns,
                                      "docmap_dir": docmap_dir})
        .take_all()
    )
    docmap_files = sorted(a["path"] for a in acks)

    # ---- stages 2+3: tokenize → shuffle by (term bucket, doc range) → write
    done_gkeys = {
        int(f.split("-")[1].split(".")[0])
        for f in os.listdir(seg_dir)
        if f.startswith("seg-") and f.endswith(".parquet")
    }
    postings = (
        ray.data.read_parquet(docmap_files, columns=["doc_id", *fields])
        .map_batches(
            TokenizeBatch,
            fn_constructor_kwargs={
                "fields": tuple(fields),
                "num_buckets": num_buckets,
                "num_ranges": num_ranges,
                "range_span": range_span,
            },
            batch_size=tokenize_batch_size,
            batch_format="pyarrow",
            concurrency=tokenize_concurrency,
        )
    )
    if done_gkeys:  # resume: drop postings for already-committed groups
        done_ref = ray.put(frozenset(done_gkeys))

        def _drop_done(batch: pa.Table) -> pa.Table:
            done = ray.get(done_ref)
            keep = [g not in done for g in batch.column("gkey").to_pylist()]
            return batch.filter(pa.array(keep))

        postings = postings.map_batches(_drop_done, batch_format="pyarrow")

    (
        postings.groupby("gkey")
        .map_groups(_write_segment_group, batch_format="pyarrow",
                    fn_kwargs={"seg_dir": seg_dir, "block_size": block_size})
        .take_all()
    )
    seg_files = sorted(
        os.path.join(seg_dir, f) for f in os.listdir(seg_dir)
        if f.startswith("seg-") and f.endswith(".parquet")
    )
    # the authoritative segment list comes from the committed files (resumed
    # builds skip groups, so in-flight acks are incomplete)
    seg_entries = []
    for p in seg_files:
        md = pq.read_metadata(p).metadata or {}
        seg_entries.append({
            "gkey": int(md.get(b"noise_gkey", b"-1")),
            "path": p,
            "postings": int(md.get(b"noise_postings", b"0")),
        })

    # ---- stage 4: term statistics (C = Σ tf, K = Σ field-instance×stem)
    # from segment block metadata only — cheap columns, no posting payloads.
    stats_ds = (
        ray.data.read_parquet(seg_files, columns=["field", "term", "c_block", "cnt"])
        .groupby(["field", "term"])
        .aggregate(
            Sum("c_block", alias_name="c"),
            Sum("cnt", alias_name="k"),
        )
        .map_batches(_add_bucket, fn_kwargs={"num_buckets": num_buckets},
                     batch_format="pyarrow")
    )
    k_rows = stats_ds.groupby("field").aggregate(
        Sum("k", alias_name="k_total")).take_all()
    stats_acks = (
        stats_ds.groupby("bucket")
        .map_groups(_write_stats_group, batch_format="pyarrow",
                    fn_kwargs={"stats_dir": stats_dir})
        .take_all()
    )

    # ---- stage 5: manifest
    field_k = {int(r["field"]): int(r["k_total"]) for r in k_rows}
    manifest = {
        "version": 1,
        "analyzer": "noise-porter2-v1",
        "fields": list(fields),
        "key_columns": list(key_columns),
        "num_docs": num_docs,
        "num_buckets": num_buckets,
        "num_ranges": num_ranges,
        "range_span": range_span,
        "block_size": block_size,
        "field_k": {str(k): v for k, v in sorted(field_k.items())},
        "docmap": [
            {"path": a["path"], "rows": a["rows"], "min_doc": a["min_doc"],
             "max_doc": a["max_doc"]}
            for a in sorted(acks, key=lambda a: a["min_doc"])
        ],
        "segments": sorted(seg_entries, key=lambda a: a["gkey"]),
        "stats": [
            {"bucket": int(a["bucket"]), "path": a["path"]}
            for a in sorted(stats_acks, key=lambda a: a["bucket"])
        ],
    }
    tmp = os.path.join(index_dir, f".{MANIFEST_NAME}.tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(index_dir, MANIFEST_NAME))
    return manifest
