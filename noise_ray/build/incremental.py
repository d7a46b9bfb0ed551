"""Incremental document adds: Lucene-style epoch indexes.

The reference's ``Index::add`` + ``flush`` appends documents to a live
index under a monotonically increasing seq, and re-adding an existing
``_id`` is an upsert (delete old entries + reinsert,
/root/reference/src/index.rs:131-161, src/json_shred.rs:452-475).

Our batch-immutable analogue: each ``add_documents`` call builds a
self-contained DELTA index ("epoch") under ``<index>/epochs/epoch-NNNN/``
with the SAME streaming Ray Data pipeline as the base build, doc_ids
continuing the parent's seq space (``doc_id_offset``).  The root
``IndexReader`` merges postings / stats / docmaps across epochs at query
time; upserts tombstone the older doc_id (Lucene hidden-doc deletes).

An epoch is visible only once its ``manifest.json`` exists (build_index
publishes it last, atomically), so a crashed add leaves an invisible
partial epoch that the next add with the same inputs resumes (same epoch
id = max existing + 1 only counts *published* epochs; unpublished
directories are re-entered by name).
"""

from __future__ import annotations

import json
import os
import re

import pyarrow as pa
import pyarrow.parquet as pq

from .pipeline import MANIFEST_NAME, build_index

_EPOCH_RE = re.compile(r"^epoch-(\d{4})(?:-(\d{4}))?$")


def _dist_min_docs() -> int:
    from ..query.distributed import dist_min_docs

    return dist_min_docs()


def _epoch_span(name: str) -> tuple[int, int] | None:
    """(first, last) epoch numbers a directory covers — a plain
    ``epoch-0007`` covers (7, 7); a merged ``epoch-0001-0006`` covers
    (1, 6).  None for non-epoch names."""
    m = _EPOCH_RE.match(name)
    if not m:
        return None
    a = int(m.group(1))
    return a, (int(m.group(2)) if m.group(2) else a)


def _epoch_dirs(index_dir: str) -> list[str]:
    """Published epoch directories (manifest present), in epoch order
    (names sort by first covered number, so a merged epoch sorts before
    the epochs kept after it — reader postings concatenate in this order
    and doc ids must ascend).  Directories named in a published merged
    epoch's ``supersedes.json`` are hidden: the merge publish is atomic
    at the manifest write, deleting the sources afterwards is garbage
    collection, not correctness."""
    edir = os.path.join(index_dir, "epochs")
    if not os.path.isdir(edir):
        return []
    pub = [name for name in sorted(os.listdir(edir))
           if _EPOCH_RE.match(name) and os.path.exists(
               os.path.join(edir, name, MANIFEST_NAME))]
    superseded: set[str] = set()
    for name in pub:
        sp = os.path.join(edir, name, "supersedes.json")
        if os.path.exists(sp):
            with open(sp) as f:
                superseded.update(json.load(f))
    return [os.path.join(edir, name) for name in pub
            if name not in superseded]


def total_docs(index_dir: str) -> int:
    """Seq-space high-water mark across the base index and all epochs."""
    with open(os.path.join(index_dir, MANIFEST_NAME)) as f:
        base = json.load(f)
    total = int(base.get("doc_id_offset", 0)) + int(base["num_docs"])
    for ed in _epoch_dirs(index_dir):
        with open(os.path.join(ed, MANIFEST_NAME)) as f:
            m = json.load(f)
        total = max(total, int(m.get("doc_id_offset", 0)) + int(m["num_docs"]))
    return total


def add_documents(index_dir: str, new_paths: list[str],
                  *, update: bool = True) -> dict:
    """Append documents from ``new_paths`` to an existing index.

    Builds one new epoch; with ``update=True`` (the reference's upsert
    semantics) any older doc sharing the new docs' key columns is
    tombstoned so the new row shadows it.  Returns the epoch manifest.
    """
    with open(os.path.join(index_dir, MANIFEST_NAME)) as f:
        base = json.load(f)
    fields = tuple(base["fields"])
    key_columns = tuple(base["key_columns"])
    offset = total_docs(index_dir)

    # number from the raw PUBLISHED listing (including superseded dirs
    # pending deletion) so a merged epoch's sources are never renumbered
    # over while they still exist on disk
    edir = os.path.join(index_dir, "epochs")
    published = [s for name in (sorted(os.listdir(edir))
                                if os.path.isdir(edir) else [])
                 if (s := _epoch_span(name)) is not None
                 and os.path.exists(os.path.join(edir, name, MANIFEST_NAME))]
    n = max((last for _, last in published), default=0) + 1
    epoch_dir = os.path.join(index_dir, "epochs", f"epoch-{n:04d}")
    # A crashed (unpublished) epoch dir is resumed ONLY for the same
    # inputs: build_index's lineage checks (docmap row counts, committed
    # segments) can't tell two input sets with equal shapes apart, so a
    # fingerprint mismatch wipes the partial dir instead of splicing the
    # old inputs' committed files into the new epoch.
    fp = {"paths": sorted(os.path.abspath(p) for p in new_paths),
          "offset": offset}
    fp_path = os.path.join(epoch_dir, "inputs.json")
    if os.path.isdir(epoch_dir):
        old_fp = None
        if os.path.exists(fp_path):
            with open(fp_path) as f:
                old_fp = json.load(f)
        if old_fp != fp:
            import shutil

            shutil.rmtree(epoch_dir)
    os.makedirs(epoch_dir, exist_ok=True)
    with open(fp_path, "w") as f:
        json.dump(fp, f)

    manifest = build_index(
        list(new_paths), epoch_dir,
        fields=fields, key_columns=key_columns,
        # the term -> bucket hash must agree across epochs so a term's
        # postings are found in every epoch's segment set; block geometry
        # too, so base and epochs share one posting-block layout
        num_buckets=int(base["num_buckets"]),
        block_size=int(base.get("block_size", 4096)),
        doc_id_offset=offset,
    )

    tombstoned: list[int] = []
    if update:
        tombstoned = _tombstone_shadowed(index_dir, new_paths,
                                         list(key_columns), offset)
    manifest["tombstoned"] = tombstoned
    return manifest


def merge_epochs(index_dir: str, *, keep: int = 0) -> dict | None:
    """Tiered epoch merge (the Lucene TieredMergePolicy analogue): fold
    the OLDEST published epochs — all but the newest ``keep`` — into one
    equivalent epoch WITHOUT re-tokenizing anything.

    Epoch doc ids are append-ordered and never change, so a term's
    merged posting rows are exactly the source epochs' rows re-sorted by
    (field, term, min_doc) — encoded payload bytes untouched; per-bucket
    stats fold by (field, term) sums; docmap partitions are copied.
    Query results are bit-identical before/after (the reader sees the
    same postings, stats totals, ids and tombstones; only the number of
    per-term segment lookups shrinks from k epochs to one).

    The merged directory is named ``epoch-<first>-<last>`` so it SORTS
    BEFORE any kept epochs (reader postings concatenate in name order
    and doc ids must ascend).  Publication is atomic: everything is
    written into the final directory, ``supersedes.json`` (naming the
    source dirs) before the manifest, the manifest last via tmp+rename —
    ``_epoch_dirs`` hides the sources the instant the manifest exists,
    and deleting them afterwards is garbage collection.  A crash mid-
    merge leaves an invisible unpublished dir that the next call wipes.

    Scale shape: one Ray Data fan-out with a task per bucket (each task
    reads only its bucket's segment/stats files across the source epochs
    and writes the merged pair); the driver handles only manifests and
    the docmap file copies.  Returns the merged manifest, or None when
    fewer than two epochs would merge."""
    import shutil
    import uuid

    import ray.data as rd

    from .pipeline import _atomic_write_table

    edir = os.path.join(index_dir, "epochs")
    # GC superseded dirs a crashed earlier merge left behind
    live = {os.path.basename(d) for d in _epoch_dirs(index_dir)}
    if os.path.isdir(edir):
        for name in os.listdir(edir):
            if (_EPOCH_RE.match(name) and name not in live
                    and os.path.exists(os.path.join(edir, name,
                                                    MANIFEST_NAME))):
                shutil.rmtree(os.path.join(edir, name))

    eds = _epoch_dirs(index_dir)
    if keep:
        eds = eds[:len(eds) - keep]
    if len(eds) < 2:
        return None
    manifests = []
    for ed in eds:
        with open(os.path.join(ed, MANIFEST_NAME)) as f:
            manifests.append(json.load(f))
    m0 = manifests[0]
    for m in manifests[1:]:
        for key in ("version", "analyzer", "fields", "key_columns",
                    "num_buckets", "block_size"):
            if m.get(key) != m0.get(key):
                raise ValueError(f"epochs disagree on {key}: "
                                 f"{m.get(key)!r} != {m0.get(key)!r}")
    spans = [_epoch_span(os.path.basename(ed)) for ed in eds]
    first, last = spans[0][0], spans[-1][1]
    out_name = f"epoch-{first:04d}-{last:04d}"
    out_dir = os.path.join(edir, out_name)
    if os.path.isdir(out_dir):  # unpublished leftover of a crashed merge
        shutil.rmtree(out_dir)
    for sub in ("segments", "stats", "docmap"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)

    num_buckets = int(m0["num_buckets"])
    seg_by_bucket: dict[int, list[str]] = {b: [] for b in range(num_buckets)}
    stats_by_bucket: dict[int, list[str]] = {b: []
                                             for b in range(num_buckets)}
    for ed, m in zip(eds, manifests):
        nr = int(m["num_ranges"])
        for s in m["segments"]:
            seg_by_bucket[int(s["gkey"]) // nr].append(
                os.path.join(ed, s["path"]))
        for s in m["stats"]:
            stats_by_bucket[int(s["bucket"])].append(
                os.path.join(ed, s["path"]))

    def merge_bucket(batch: pa.Table) -> pa.Table:
        outs = []
        for bucket in batch.column("bucket").to_pylist():
            segs = seg_by_bucket[bucket]
            if not segs:
                continue
            merged = pa.concat_tables([pq.read_table(p) for p in segs])
            merged = merged.sort_by([("field", "ascending"),
                                     ("term", "ascending"),
                                     ("min_doc", "ascending")])
            seg_rel = f"segments/seg-{bucket:08d}.parquet"
            stats_rel = f"stats/stats-{bucket:08d}.parquet"
            st = pa.concat_tables(
                [pq.read_table(p) for p in stats_by_bucket[bucket]])
            st = (st.group_by(["field", "term"])
                  .aggregate([("c", "sum"), ("k", "sum")])
                  .rename_columns(["field", "term", "c", "k"])
                  .sort_by([("field", "ascending"), ("term", "ascending")]))
            # commit order mirrors the build: stats first, segment last
            _atomic_write_table(st, os.path.join(out_dir, stats_rel),
                                row_group_size=8192)
            _atomic_write_table(merged, os.path.join(out_dir, seg_rel),
                                row_group_size=64)
            outs.append({"bucket": bucket, "seg": seg_rel,
                         "stats": stats_rel,
                         "postings": int(merged.column("cnt")
                                         .to_numpy().sum())})
        return pa.Table.from_pylist(outs) if outs else pa.table(
            {"bucket": pa.array([], pa.int64()),
             "seg": pa.array([], pa.string()),
             "stats": pa.array([], pa.string()),
             "postings": pa.array([], pa.int64())})

    acks = sorted(
        rd.from_items([{"bucket": b} for b in range(num_buckets)],
                      override_num_blocks=num_buckets)
        .map_batches(merge_bucket, batch_format="pyarrow")
        .take_all(), key=lambda a: a["bucket"])

    # docmap: copy partitions in epoch order (ids ascend across epochs)
    docmap_entries = []
    for ed, m in zip(eds, manifests):
        for dm in m["docmap"]:
            rel = f"docmap/docmap-{len(docmap_entries):05d}.parquet"
            shutil.copyfile(os.path.join(ed, dm["path"]),
                            os.path.join(out_dir, rel + ".tmp"))
            os.replace(os.path.join(out_dir, rel + ".tmp"),
                       os.path.join(out_dir, rel))
            docmap_entries.append({"path": rel, "rows": dm["rows"],
                                   "min_doc": dm["min_doc"],
                                   "max_doc": dm["max_doc"]})

    offset = min(int(m.get("doc_id_offset", 0)) for m in manifests)
    high = max(int(m.get("doc_id_offset", 0)) + int(m["num_docs"])
               for m in manifests)
    field_k: dict[str, int] = {}
    for m in manifests:
        for fid, kv in m["field_k"].items():
            field_k[fid] = field_k.get(fid, 0) + int(kv)
    manifest = {
        "version": m0["version"],
        "analyzer": m0["analyzer"],
        "fields": m0["fields"],
        "key_columns": m0["key_columns"],
        "num_docs": high - offset,
        "doc_id_offset": offset,
        "num_buckets": num_buckets,
        "num_ranges": 1,
        "range_span": high - offset,
        "block_size": m0.get("block_size", 4096),
        "field_k": field_k,
        "docmap": docmap_entries,
        "segments": [{"gkey": a["bucket"], "path": a["seg"],
                      "postings": a["postings"]} for a in acks],
        "stats": [{"gkey": a["bucket"], "bucket": a["bucket"],
                   "path": a["stats"]} for a in acks],
        "metrics": {"merged_epochs": [os.path.basename(d) for d in eds]},
    }
    with open(os.path.join(out_dir, "supersedes.json"), "w") as f:
        json.dump([os.path.basename(d) for d in eds], f)
    tmp = os.path.join(out_dir, f".manifest-{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(out_dir, MANIFEST_NAME))  # publish
    for ed in eds:  # GC — correctness no longer depends on it
        shutil.rmtree(ed)
    return manifest


def _tombstone_shadowed(index_dir: str, new_paths: list[str],
                        key_columns: list[str], offset: int) -> list[int]:
    """Tombstone older docs whose key columns collide with the new batch
    (upsert semantics): a distributed hash semi-join over the docmap
    partitions' key columns only."""
    new_keys = pa.concat_tables(
        [pq.read_table(p, columns=key_columns) for p in new_paths]
    )
    # root-level reader state: tombstones live at the index root
    from ..query.reader import IndexReader

    reader = IndexReader(index_dir)
    dead = shadowed_doc_ids(reader._docmap, new_keys, key_columns, offset)
    if dead:
        reader.add_tombstones(dead)
    return dead


def shadowed_doc_ids(docmap_parts, new_keys: pa.Table,
                     key_columns: list[str], offset: int) -> list[int]:
    """Doc ids of pre-``offset`` docs whose key columns collide with
    ``new_keys`` — one Ray task per docmap partition with the delta-sized
    key table broadcast once via ``ray.put``; only the colliding doc_ids
    (bounded by the delta) return to the driver.  Shared by the flat and
    nested upsert paths."""
    import ray
    import ray.data as rd

    parts = [dm["path"] for dm in docmap_parts if dm["min_doc"] < offset]
    if not parts or new_keys.num_rows == 0:
        return []
    keys_ref = ray.put(new_keys)

    def scan(batch: pa.Table) -> pa.Table:
        nk = ray.get(keys_ref)
        outs = []
        for p in batch.column("path").to_pylist():
            # dedupe: indexes keyed ON doc_id would otherwise request
            # the column twice and break the acero join's field lookup
            t = pq.read_table(
                p, columns=list(dict.fromkeys(["doc_id", *key_columns])))
            outs.append(t.join(nk, keys=key_columns, join_type="inner")
                        .select(["doc_id"]))
        return pa.concat_tables(outs)

    hits = (rd.from_items([{"path": p} for p in parts],
                          override_num_blocks=len(parts))
            .map_batches(scan, batch_format="pyarrow"))
    # materialize first: to_arrow_refs on a lazy ds re-executes for schema
    tables = ray.get(hits.materialize().to_arrow_refs())
    if not tables:
        return []
    t = pa.concat_tables(tables)
    return sorted(t.column("doc_id").to_pylist())


def delete_by_query(index_dir: str, query: str,
                    params: dict | None = None) -> int:
    """Tombstone every doc matching a filter-only ``query`` — the natural
    extension of the reference's id-list delete (src/index.rs
    ``Index::delete``; the reference has no query-addressed delete, its
    REPL deletes one _id at a time).  Returns the number of NEWLY deleted
    docs.

    The matched set is evaluated with the distributed range fan-out above
    ~5M docs (same worker pool and per-doc-independence exactness argument
    as run_query_distributed) and folded into the tombstone sidecar, which
    every cached reader picks up via its mtime-keyed cache.  The sidecar
    holds an id list, so a MASS delete (a large corpus fraction) should be
    followed by ``compact_index()``: compaction rewrites segments without
    the tombstoned docs and clears the sidecar, restoring O(live) state.
    """
    from ..query import IndexReader
    from ..query.parser import parse_query, ret_leaves
    from ..query import ast as qast

    q = parse_query(query, params)
    if q.order or q.limit is not None:
        raise ValueError("delete_by_query takes a filter-only query "
                         "(no order/limit)")
    from ..query import executor as _ex

    if isinstance(q.returns, _ex._TREE_TYPES):
        if any(isinstance(l, qast.RetAgg) for l in ret_leaves(q.returns)):
            raise ValueError("delete_by_query takes a filter-only query "
                             "(no aggregate return clause)")

    reader = IndexReader(index_dir)
    if reader.num_docs >= _dist_min_docs():
        import ray

        from ..query.distributed import pool_batched, worker_pool

        cpus = int(ray.cluster_resources().get("CPU", 8))
        n = max(1, min(cpus, reader.num_docs // 10_000 + 1))
        span = max(1, -(-reader.num_docs // n))
        pool = worker_pool()
        parts = pool_batched(pool, [
            ("flat_eval", (index_dir, query, params, lo,
                           min(lo + span, reader.num_docs), None))
            for lo in range(0, reader.num_docs, span)])
        import numpy as np

        docs = (np.concatenate([d for d, _ in parts]) if parts
                else np.zeros(0, np.int64))
    else:
        from ..query.engine import CompiledQuery

        docs = CompiledQuery(reader, q.filter).evaluate().docs
    before = reader.tombstones.size
    if docs.size:
        reader.add_tombstones(docs.tolist())
    return int(reader.tombstones.size - before)
