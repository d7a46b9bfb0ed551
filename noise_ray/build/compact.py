"""Compaction: fold epochs + tombstones back into a fresh base index.

The reference GCs dead entries during RocksDB compaction (zero-count keys
dropped by the compaction filter, /root/reference/src/index.rs:271-282);
Lucene merges segments and drops hidden deletes.  Our analogue rewrites the
index so that ``compact_index(dir)`` produces exactly what
``build_index(live rows)`` would: tombstoned and upsert-shadowed docs
disappear from postings AND stats (idf inputs shrink — merge semantics),
epochs fold into the base, and tombstones reset to empty.

Invariant (tested): because doc_ids are dense in global key order and the
staged partition files keep non-overlapping key ranges, the compacted index
is byte-equivalent in query results — doc_ids and f32 scores — to a fresh
``build_index`` over the merged live source rows.

Scale shape: one streaming fan-out over the BASE docmap partitions (each
task filters its partition and splices in the epoch rows routed to its key
range), with the epoch live-set broadcast once via ``ray.put`` — epochs are
assumed small relative to the base (the normal compaction regime; a
base-sized epoch set should be rebuilt from source instead).  No driver-side
iteration over base data; the only wide operation is the rebuild's own
posting shuffle.
"""

from __future__ import annotations

import bisect
import json
import os
import shutil
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from .pipeline import MANIFEST_NAME, build_index


def _restore_source_schema(t: pa.Table) -> pa.Table:
    """Drop the internal doc_id and restore a source-held doc_id column."""
    t = t.drop_columns(["doc_id"])
    if "src_doc_id" in t.column_names:
        t = t.rename_columns(
            ["doc_id" if c == "src_doc_id" else c for c in t.column_names])
    return t


def _first_key(path: str, key_columns: list[str]) -> tuple:
    """The partition's lexicographic minimum key = its FIRST row (docmap
    partitions are written key-sorted).  Per-column footer minima would be
    wrong for composite keys: min(col1) over all rows is not the first
    row's col1, and routing on it can create overlapping staged ranges
    (forcing the rebuild into a needless global re-sort)."""
    pf = pq.ParquetFile(path)
    first = pf.read_row_group(0, columns=list(key_columns)).slice(0, 1)
    return tuple(first.column(c)[0].as_py() for c in key_columns)


def _stage_partition(batch: pa.Table, *, staging_dir: str, tombstones: tuple,
                     key_columns: tuple, epoch_ref) -> pa.Table:
    """Write one staging file per base docmap partition in ``batch``:
    live base rows + the epoch rows routed to this partition's key range.
    Idempotent (tmp+rename); build_index re-sorts rows within each file."""
    import numpy as np

    tomb = np.asarray(tombstones, dtype=np.int64)
    epoch_tbl = ray.get(epoch_ref) if epoch_ref is not None else None
    acks = {"part": [], "path": [], "rows": []}
    for row in batch.to_pylist():
        part, dm_path = int(row["part"]), row["path"]
        out_path = os.path.join(staging_dir, f"part-{part:05d}.parquet")
        idx = json.loads(row["epoch_idx"])
        t = pq.read_table(dm_path)
        if tomb.size:
            live = ~np.isin(t.column("doc_id").to_numpy(), tomb)
            if not live.all():
                t = t.filter(pa.array(live))
        t = _restore_source_schema(t)
        if idx:
            extra = _restore_source_schema(epoch_tbl.take(idx))
            t = pa.concat_tables([t, extra.select(t.column_names)],
                                 promote_options="permissive")
        if t.num_rows == 0:
            continue  # fully-dead partition: no staging file
        tmp = f"{out_path}.tmp-{uuid.uuid4().hex[:8]}"
        pq.write_table(t, tmp, row_group_size=65536)
        os.replace(tmp, out_path)
        acks["part"].append(part)
        acks["path"].append(out_path)
        acks["rows"].append(t.num_rows)
    return pa.table(acks)


def _empty_manifest(index_dir: str, base: dict) -> dict:
    """Publish a valid manifest for an index whose docs were all deleted."""
    manifest = {
        "version": 1, "analyzer": base.get("analyzer", "noise-porter2-v1"),
        "fields": base["fields"], "key_columns": base["key_columns"],
        "num_docs": 0, "doc_id_offset": 0,
        "num_buckets": base["num_buckets"], "num_ranges": 1, "range_span": 1,
        "block_size": base.get("block_size", 4096),
        "field_k": {}, "docmap": [], "segments": [], "stats": [],
    }
    for sub in ("docmap", "segments", "stats"):
        os.makedirs(os.path.join(index_dir, sub), exist_ok=True)
    tmp = os.path.join(index_dir, f".{MANIFEST_NAME}.tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(index_dir, MANIFEST_NAME))
    return manifest


def compact_index(index_dir: str) -> dict:
    """Rewrite ``index_dir`` as a single fresh base index (no epochs, no
    tombstones) over its current live document set.  Returns the new
    manifest.  doc_ids are reassigned (dense in key order), exactly as a
    fresh build over the live rows would assign them."""
    from ..query.reader import IndexReader

    reader = IndexReader(index_dir)
    if not reader._epochs and not reader.tombstones.size:
        return reader.manifest  # nothing to fold: no-op

    key_columns = list(reader.manifest["key_columns"])
    tombs = set(int(d) for d in reader.tombstones.tolist())

    # ---- epoch live rows: loaded once, broadcast once (epochs << base)
    epoch_parts = []
    for e in reader._epochs:
        for dm in e.manifest["docmap"]:
            t = pq.read_table(dm["path"])
            if tombs:
                import numpy as np
                live = ~np.isin(t.column("doc_id").to_numpy(),
                                np.fromiter(tombs, dtype=np.int64))
                if not live.all():
                    t = t.filter(pa.array(live))
            if t.num_rows:
                epoch_parts.append(t)
    epoch_tbl = (pa.concat_tables(epoch_parts, promote_options="permissive")
                 if epoch_parts else None)

    # ---- route epoch rows to base partitions by first-row key boundaries
    base_dms = reader.manifest["docmap"]
    routed: list[list[int]] = [[] for _ in base_dms]
    extra_rows: list[int] = []  # epoch rows with no base partition to join
    if epoch_tbl is not None:
        key_cols = [epoch_tbl.column(c).to_pylist() for c in key_columns]
        if base_dms:
            mins = [_first_key(dm["path"], key_columns) for dm in base_dms]
            for i, key in enumerate(zip(*key_cols)):
                j = bisect.bisect_right(mins, key) - 1
                routed[max(j, 0)].append(i)
        else:
            # base fully deleted earlier: every live row comes from epochs
            extra_rows = list(range(epoch_tbl.num_rows))

    # ---- staging fan-out (one file per base partition, epoch broadcast)
    work_root = index_dir.rstrip("/") + ".compacting"
    if os.path.exists(work_root):
        shutil.rmtree(work_root)
    staging_dir = os.path.join(work_root, "staging")
    new_index = os.path.join(work_root, "index")
    os.makedirs(staging_dir)

    epoch_ref = ray.put(epoch_tbl) if epoch_tbl is not None else None
    items = [{"part": i, "path": dm["path"],
              "epoch_idx": json.dumps(routed[i])}
             for i, dm in enumerate(base_dms)]
    acks: list = []
    if extra_rows:
        # no base partition exists: stage the epoch live rows directly
        t = _restore_source_schema(epoch_tbl)
        out_path = os.path.join(staging_dir, "part-epochs.parquet")
        pq.write_table(t, out_path, row_group_size=65536)
        acks.append({"part": -1, "path": out_path, "rows": t.num_rows})
    if items:
        cpus = int(ray.cluster_resources().get("CPU", 32))
        ctx = ray.data.DataContext.get_current()
        prev_min_block = ctx.target_min_block_size
        ctx.target_min_block_size = 1
        try:
            acks.extend(
                ray.data.from_items(
                    items,
                    override_num_blocks=max(1, min(len(items), 3 * cpus)))
                .map_batches(
                    _stage_partition, batch_format="pyarrow",
                    fn_kwargs={"staging_dir": staging_dir,
                               "tombstones": tuple(sorted(tombs)),
                               "key_columns": tuple(key_columns),
                               "epoch_ref": epoch_ref})
                .take_all()
            )
        finally:
            ctx.target_min_block_size = prev_min_block

    base_manifest = reader.manifest
    del reader  # release docmap caches before the swap

    staged = sorted(a["path"] for a in acks)
    if staged:
        build_index(staged, new_index,
                    fields=tuple(base_manifest["fields"]),
                    key_columns=tuple(key_columns),
                    num_buckets=int(base_manifest["num_buckets"]),
                    block_size=int(base_manifest.get("block_size", 4096)))
    else:
        os.makedirs(new_index, exist_ok=True)
        _empty_manifest(new_index, base_manifest)

    # ---- swap (two renames; if interrupted between them the old index
    # survives intact at <dir>.pre-compact — documented recovery point)
    old = index_dir.rstrip("/") + f".pre-compact-{uuid.uuid4().hex[:8]}"
    os.replace(index_dir, old)
    os.replace(new_index, index_dir)
    shutil.rmtree(old)
    shutil.rmtree(work_root, ignore_errors=True)

    with open(os.path.join(index_dir, MANIFEST_NAME)) as f:
        return json.load(f)
