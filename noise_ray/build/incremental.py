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

_EPOCH_RE = re.compile(r"^epoch-(\d{4})$")


def _epoch_dirs(index_dir: str) -> list[str]:
    """Published epoch directories (manifest present), in epoch order."""
    edir = os.path.join(index_dir, "epochs")
    if not os.path.isdir(edir):
        return []
    out = []
    for name in sorted(os.listdir(edir)):
        if _EPOCH_RE.match(name) and os.path.exists(
                os.path.join(edir, name, MANIFEST_NAME)):
            out.append(os.path.join(edir, name))
    return out


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

    existing = _epoch_dirs(index_dir)
    n = (int(_EPOCH_RE.match(os.path.basename(existing[-1])).group(1)) + 1
         if existing else 1)
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
            t = pq.read_table(p, columns=["doc_id", *key_columns])
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
    if reader.num_docs >= 5_000_000:
        import ray

        from ..query.distributed import worker_pool

        cpus = int(ray.cluster_resources().get("CPU", 8))
        n = max(1, min(cpus, reader.num_docs // 10_000 + 1))
        span = max(1, -(-reader.num_docs // n))
        pool = worker_pool()
        parts = ray.get([
            pool[i % len(pool)].flat_eval.remote(
                index_dir, query, params, lo,
                min(lo + span, reader.num_docs), None)
            for i, lo in enumerate(range(0, reader.num_docs, span))
        ])
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
