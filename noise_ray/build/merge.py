"""Posting-level index merge: N sealed indexes → one, WITHOUT re-tokenizing
(flat and nested engines both).

The Lucene segment-merge analogue (and the "merge" of the north rule's
"posting-list construction, merge, compression, top-k scoring"): given N
independently built indexes over disjoint corpora, produce a single index
whose query results are bit-identical to a fresh ``build_index`` over the
concatenated source rows — while never touching raw text:

- **segments**: posting blocks are self-contained (doc deltas restart
  absolute at each block, query/reader.py:380-383), so shifting a source
  into the merged doc-id space patches ONLY the first varint of each
  block's ``docs`` buffer (+ the block's min_doc/max_doc columns).  tfs,
  lens, positions, and the WAND block bounds (max_tf_norm, max_tf,
  min_len) are doc-id-free and copy through byte-identical.  No shuffle,
  no re-encode of the delta tails.
- **gkeys**: the merged index keeps per-source range files side by side —
  ``num_ranges = Σ nrᵢ``; source *i*'s (bucket, rng) file becomes merged
  gkey ``bucket·NR + (Σ_{j<i} nr_j + rng)``.  The reader walks rngs in
  order and sources occupy ascending doc spans, so concatenated blocks
  stay globally doc-sorted — the invariant every posting consumer relies
  on.  Requires equal ``num_buckets`` (same term → bucket routing).
- **stats**: sidecar rows carry no doc ids; files copy through and the
  reader's sum-across-files semantics merges dfs exactly.  ``field_k``
  (per-field token totals) sums per field, so merged idf/avgdl equal the
  unified build's — which is why merged BM25 scores are f64-bit-equal.
- **docmap**: partitions are rewritten with the shifted ``doc_id``
  column (the one column readers consult raw: ``lookup_doc``,
  incremental's collision scan); stored payload columns pass through
  unchanged.  This is the only data-sized copy — sequential I/O, one
  task per partition, no shuffle (Lucene merges copy stored fields too).
- **tombstones**: shifted per source and unioned.

All file work runs as Ray tasks over a work-item Dataset (one item per
output file, written tmp+rename and skipped when already present —
re-running a crashed merge resumes), and the manifest commits atomically
last, the same checkpoint discipline as build_index.  Sources must be
epoch-free (compact first; epochs are a *mutation* log, merge is for
sealed indexes).
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .codec import decode_varint, encode_varint
from .pipeline import MANIFEST_NAME


def _shift_first_varint(buf, offset: int) -> bytes:
    """Add ``offset`` to the FIRST value of a varint-delta buffer (the
    block's absolute first doc id); the delta tail passes through."""
    b = bytes(buf)
    i = 0
    while b[i] & 0x80:
        i += 1
    first = int(decode_varint(b[: i + 1], 1)[0])
    head = encode_varint(np.array([first + offset], dtype=np.uint64))
    return head + b[i + 1:]


def _patch_segment(src: str, dst: str, offset: int) -> None:
    t = pq.read_table(src)
    if offset:
        docs = [_shift_first_varint(v, offset)
                for v in t.column("docs").to_pylist()]
        t = (t.set_column(t.schema.get_field_index("docs"), "docs",
                          pa.array(docs, pa.binary()))
             .set_column(t.schema.get_field_index("min_doc"), "min_doc",
                         pa.compute.add(t.column("min_doc"), offset))
             .set_column(t.schema.get_field_index("max_doc"), "max_doc",
                         pa.compute.add(t.column("max_doc"), offset)))
    pq.write_table(t, dst + ".tmp")
    os.replace(dst + ".tmp", dst)


def _patch_docmap(src: str, dst: str, offset: int) -> None:
    t = pq.read_table(src)
    if offset:
        i = t.schema.get_field_index("doc_id")
        t = t.set_column(i, "doc_id",
                         pa.compute.add(t.column("doc_id"), offset))
    pq.write_table(t, dst + ".tmp")
    os.replace(dst + ".tmp", dst)


def _copy_file(src: str, dst: str) -> None:
    try:  # hardlink when possible: stats files are immutable
        os.link(src, dst)
    except OSError:
        shutil.copy2(src, dst + ".tmp")
        os.replace(dst + ".tmp", dst)


def merge_indexes(src_dirs: list[str], out_dir: str) -> dict:
    """Merge sealed FLAT indexes into ``out_dir`` (module docstring).
    Returns the merged manifest."""
    return _merge(src_dirs, out_dir, nested=False)


def merge_json_indexes(src_dirs: list[str], out_dir: str) -> dict:
    """The NESTED twin: same block patching (nested posting blocks use
    the identical docs-delta layout; arraypaths are plain varints with
    no doc dependency, so they copy through), plus the values
    partitions — rewritten with the shifted ``doc_id`` column while the
    per-kp zone maps ride along in the preserved parquet KV metadata."""
    return _merge(src_dirs, out_dir, nested=True)


def _merge(src_dirs: list[str], out_dir: str, nested: bool) -> dict:
    import ray.data

    from .incremental import _epoch_dirs

    mans = []
    for d in src_dirs:
        with open(os.path.join(d, MANIFEST_NAME)) as f:
            mans.append(json.load(f))
        if _epoch_dirs(d):
            raise ValueError(f"{d} has live epochs — compact before merge")
        if bool(mans[-1].get("nested")) != nested:
            raise ValueError(f"{d}: nested flag != {nested}")
    base = mans[0]
    for key in ("version", "analyzer", "fields", "key_columns",
                "num_buckets", "block_size"):
        vals = {json.dumps(m.get(key)) for m in mans}
        if len(vals) != 1:
            raise ValueError(f"sources disagree on {key}: {vals}")

    # doc-id space layout: source i shifts by the size of all earlier
    # sources' id spaces (offset + num_docs = the span queries can see)
    sizes = [int(m.get("doc_id_offset", 0)) + int(m["num_docs"])
             for m in mans]
    offsets = [0]
    for s in sizes[:-1]:
        offsets.append(offsets[-1] + s)
    nrs = [int(m["num_ranges"]) for m in mans]
    nr_merged = sum(nrs)
    rng_base = [0]
    for r in nrs[:-1]:
        rng_base.append(rng_base[-1] + r)

    parts_list = ("docmap", "segments", "stats", "values") if nested \
        else ("docmap", "segments", "stats")
    for part in parts_list:
        os.makedirs(os.path.join(out_dir, part), exist_ok=True)

    items, man_docmap, man_segments, man_stats = [], [], [], []
    man_values: list = []
    for i, (d, m) in enumerate(zip(src_dirs, mans)):
        off = offsets[i]
        for e in m["docmap"]:
            rel = f"docmap/m{i:02d}-{os.path.basename(e['path'])}"
            items.append({"kind": "docmap", "off": off,
                          "src": os.path.join(d, e["path"]),
                          "dst": os.path.join(out_dir, rel)})
            man_docmap.append({"path": rel, "rows": e["rows"],
                               "min_doc": e["min_doc"] + off,
                               "max_doc": e["max_doc"] + off})
        for e in m.get("values", []):
            rel = f"values/m{i:02d}-{os.path.basename(e['path'])}"
            items.append({"kind": "docmap", "off": off,  # same patch
                          "src": os.path.join(d, e["path"]),
                          "dst": os.path.join(out_dir, rel)})
            man_values.append({"path": rel,
                               "min_doc": e["min_doc"] + off,
                               "max_doc": e["max_doc"] + off})
        nr_i = nrs[i]
        for e in m["segments"]:
            bucket, rng = divmod(int(e["gkey"]), nr_i)
            rel = f"segments/m{i:02d}-{os.path.basename(e['path'])}"
            items.append({"kind": "segment", "off": off,
                          "src": os.path.join(d, e["path"]),
                          "dst": os.path.join(out_dir, rel)})
            man_segments.append(
                {"gkey": bucket * nr_merged + rng_base[i] + rng,
                 "path": rel, "postings": e.get("postings", 0)})
        for e in m["stats"]:
            rel = f"stats/m{i:02d}-{os.path.basename(e['path'])}"
            items.append({"kind": "stats", "off": 0,
                          "src": os.path.join(d, e["path"]),
                          "dst": os.path.join(out_dir, rel)})
            man_stats.append({"bucket": e["bucket"], "path": rel})

    def work(row: dict) -> list[dict]:
        if not os.path.exists(row["dst"]):  # resume: skip finished files
            if row["kind"] == "segment":
                _patch_segment(row["src"], row["dst"], row["off"])
            elif row["kind"] == "docmap":
                _patch_docmap(row["src"], row["dst"], row["off"])
            else:
                _copy_file(row["src"], row["dst"])
        return [{"dst": row["dst"]}]

    (ray.data.from_items(items, override_num_blocks=max(1, len(items)))
     .flat_map(work).count())

    # merged field_k: per-field token totals sum (exact avgdl inputs)
    field_k: dict[str, int] = {}
    for m in mans:
        for k, v in m["field_k"].items():
            field_k[k] = field_k.get(k, 0) + int(v)

    tombs: list[int] = []
    for i, d in enumerate(src_dirs):
        tp = os.path.join(d, "tombstones.json")
        if os.path.exists(tp):
            with open(tp) as f:
                tombs.extend(int(t) + offsets[i] for t in json.load(f))
    if tombs:
        with open(os.path.join(out_dir, "tombstones.json"), "w") as f:
            json.dump(sorted(tombs), f)

    man = dict(base)
    man.update({
        "num_docs": int(sum(sizes)),
        "doc_id_offset": 0,
        "num_ranges": nr_merged,
        "range_span": max(int(m.get("range_span", 0)) for m in mans),
        "field_k": field_k,
        "docmap": man_docmap,
        "segments": man_segments,
        "stats": man_stats,
        "metrics": {"merged_from": [os.path.abspath(d) for d in src_dirs],
                    "source_sizes": sizes},
    })
    if nested:
        man["values"] = man_values
    tmp = os.path.join(out_dir, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, os.path.join(out_dir, MANIFEST_NAME))
    return man
