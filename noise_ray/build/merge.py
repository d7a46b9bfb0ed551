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
    per-kp zone maps ride along in the preserved parquet KV metadata.
    Spatial sidecars are NOT carried (the merged values file names no
    longer match a sidecar): bbox queries on geometry-bearing merged
    partitions take the documented per-partition fallback scan until a
    compaction rebuilds the sidecars."""
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


# ---------------------------------------------------------------- split


def _split_bucket(src_dir: str, man: dict, bucket: int, lo: int, hi: int,
                  out_seg: str, out_stats: str) -> dict:
    """One (bucket, split) task: decode the bucket's posting blocks
    masked to [lo, hi), rebase doc ids to 0, re-encode, and recompute
    block metadata + the bucket's term stats from the kept entries.
    Returns {"postings": int, "field_k": {fid: Σcnt}} (empty files are
    not written)."""
    from .codec import (decode_position_lists, decode_varint,
                        encode_deltas, encode_position_lists,
                        encode_varint)

    nr = int(man["num_ranges"])
    seg_by_gkey = {s["gkey"]: s["path"] for s in man["segments"]}
    cols = ["field", "term", "cnt", "docs", "tfs", "lens", "positions"]
    rows: dict[str, list] = {c: [] for c in (
        "field", "term", "min_doc", "max_doc", "cnt", "c_block",
        "max_tf_norm", "max_tf", "min_len", "docs", "tfs", "lens",
        "positions")}
    filters = [("max_doc", ">=", lo), ("min_doc", "<", hi)]
    for rng in range(nr):
        path = seg_by_gkey.get(bucket * nr + rng)
        if path is None:
            continue
        t = pq.read_table(os.path.join(src_dir, path), columns=cols,
                          filters=filters)
        for i in range(t.num_rows):
            cnt = int(t.column("cnt")[i].as_py())
            docs = np.cumsum(decode_varint(
                t.column("docs")[i].as_py(), cnt).astype(np.int64))
            keep = (docs >= lo) & (docs < hi)
            if not keep.any():
                continue
            tfs = decode_varint(t.column("tfs")[i].as_py(),
                                cnt).astype(np.int64)
            lens = decode_varint(t.column("lens")[i].as_py(),
                                 cnt).astype(np.int64)
            pos = decode_position_lists(t.column("positions")[i].as_py(),
                                        tfs)
            pos_ends = np.cumsum(tfs)
            pkeep = np.zeros(pos.size, bool)
            for j in np.flatnonzero(keep):
                pkeep[(pos_ends[j] - tfs[j]):pos_ends[j]] = True
            docs, tfs, lens = docs[keep] - lo, tfs[keep], lens[keep]
            rows["field"].append(int(t.column("field")[i].as_py()))
            rows["term"].append(t.column("term")[i].as_py())
            rows["min_doc"].append(int(docs[0]))
            rows["max_doc"].append(int(docs[-1]))
            rows["cnt"].append(int(docs.size))
            rows["c_block"].append(int(tfs.sum()))
            tf_norm = (np.sqrt(tfs.astype(np.float32))
                       / np.sqrt(lens.astype(np.float32)))
            rows["max_tf_norm"].append(float(tf_norm.max()))
            rows["max_tf"].append(int(tfs.max()))
            rows["min_len"].append(int(lens.min()))
            rows["docs"].append(encode_deltas(docs))
            rows["tfs"].append(encode_varint(tfs))
            rows["lens"].append(encode_varint(lens))
            rows["positions"].append(
                encode_position_lists(pos[pkeep], tfs))
    if not rows["field"]:
        return {"postings": 0, "field_k": {}}
    fld = np.asarray(rows["field"], np.int64)
    trm = np.asarray(rows["term"], object)
    mnd = np.asarray(rows["min_doc"], np.int64)
    order = np.lexsort((mnd, trm, fld))
    seg = pa.table({
        "field": pa.array(fld[order].astype(np.int32)),
        "term": pa.array(trm[order].tolist(), pa.string()),
        "min_doc": pa.array(mnd[order], pa.int64()),
        "max_doc": pa.array(np.asarray(rows["max_doc"])[order], pa.int64()),
        "cnt": pa.array(np.asarray(rows["cnt"])[order].astype(np.int32)),
        "c_block": pa.array(np.asarray(rows["c_block"])[order], pa.int64()),
        "max_tf_norm": pa.array(
            np.asarray(rows["max_tf_norm"], np.float32)[order]),
        "max_tf": pa.array(np.asarray(rows["max_tf"])[order], pa.int64()),
        "min_len": pa.array(np.asarray(rows["min_len"])[order], pa.int64()),
        "docs": pa.array(np.asarray(rows["docs"], object)[order].tolist(),
                         pa.binary()),
        "tfs": pa.array(np.asarray(rows["tfs"], object)[order].tolist(),
                        pa.binary()),
        "lens": pa.array(np.asarray(rows["lens"], object)[order].tolist(),
                         pa.binary()),
        "positions": pa.array(
            np.asarray(rows["positions"], object)[order].tolist(),
            pa.binary()),
    })
    # term stats from the kept entries: c = Σ tf, k = Σ postings
    sf, st_ = fld[order], trm[order]
    new = np.ones(sf.size, bool)
    new[1:] = (sf[1:] != sf[:-1]) | (st_[1:] != st_[:-1])
    starts = np.flatnonzero(new)
    c_arr = np.add.reduceat(np.asarray(rows["c_block"])[order], starts)
    k_arr = np.add.reduceat(np.asarray(rows["cnt"])[order], starts)
    stats = pa.table({
        "field": pa.array(sf[starts].astype(np.int32)),
        "term": pa.array(st_[starts].tolist(), pa.string()),
        "c": pa.array(c_arr.astype(np.int64)),
        "k": pa.array(k_arr.astype(np.int64)),
    })
    field_k = {str(int(fi)): int(np.asarray(rows["cnt"])[fld == fi].sum())
               for fi in np.unique(fld)}
    stats = stats.replace_schema_metadata(
        {"noise_gkey": str(bucket), "noise_postings": str(int(k_arr.sum())),
         "noise_field_k": json.dumps(field_k, sort_keys=True)})
    pq.write_table(seg, out_seg + ".tmp")
    os.replace(out_seg + ".tmp", out_seg)
    pq.write_table(stats, out_stats + ".tmp")
    os.replace(out_stats + ".tmp", out_stats)
    return {"postings": int(k_arr.sum()), "field_k": field_k}


def split_index(src_dir: str, out_dirs: list[str],
                cuts: list[int] | None = None) -> list[dict]:
    """The merge's inverse: physically repartition a sealed FLAT index
    into ``len(out_dirs)`` doc-range splits, each a standalone index
    rebased to doc ids 0..nⱼ — WITHOUT re-tokenizing.  Posting blocks
    decode→mask→re-encode (the only op that must re-encode: cut points
    land inside blocks), block WAND metadata (max_tf_norm/max_tf/
    min_len, corpus-independent) and the term stats (c = Σ tf,
    k = Σ postings, field_k) recompute EXACTLY from the kept entries,
    and docmap partitions rewrite filtered + rebased.  merge + split =
    shard rebalancing for sealed indexes at any layout.  One Ray task
    per (bucket, split) and per docmap slice; resumable (skip-if-
    present, manifests commit last).  Returns the split manifests."""
    import ray.data

    from .incremental import _epoch_dirs

    if _epoch_dirs(src_dir):
        raise ValueError("compact before split")
    with open(os.path.join(src_dir, MANIFEST_NAME)) as f:
        man = json.load(f)
    if man.get("nested"):
        raise ValueError("split_index is flat-only")
    n_docs = int(man.get("doc_id_offset", 0)) + int(man["num_docs"])
    n = len(out_dirs)
    if cuts is None:
        cuts = [round(j * n_docs / n) for j in range(n + 1)]
    if len(cuts) != n + 1 or cuts[0] != 0 or cuts[-1] != n_docs:
        raise ValueError("cuts must be [0, ..., num_docs]")

    for d in out_dirs:
        for part in ("docmap", "segments", "stats"):
            os.makedirs(os.path.join(d, part), exist_ok=True)

    nb = int(man["num_buckets"])
    items = [{"kind": "bucket", "bucket": b, "j": j, "src": "",
              "name": ""}
             for b in range(nb) for j in range(n)]  # key order == dm_items
    dm_items = []
    for j in range(n):
        lo, hi = cuts[j], cuts[j + 1]
        for e in man["docmap"]:
            if e["max_doc"] < lo or e["min_doc"] >= hi:
                continue
            dm_items.append({"kind": "docmap", "bucket": -1, "j": j,
                             "src": e["path"],
                             "name": os.path.basename(e["path"])})
    src_abs = os.path.abspath(src_dir)
    outs_abs = [os.path.abspath(d) for d in out_dirs]
    cuts_t = list(cuts)

    def work(row: dict) -> list[dict]:
        j = row["j"]
        lo, hi = cuts_t[j], cuts_t[j + 1]
        if row["kind"] == "bucket":
            b = row["bucket"]
            seg = os.path.join(outs_abs[j], "segments",
                               f"seg-{b:08d}.parquet")
            stp = os.path.join(outs_abs[j], "stats",
                               f"stats-{b:08d}.parquet")
            if os.path.exists(seg) and os.path.exists(stp):
                t = pq.read_table(stp, columns=["k"])
                import pyarrow.compute as pc

                fk = json.loads((pq.read_metadata(stp).metadata or {})
                                .get(b"noise_field_k", b"{}"))
                return [{"j": j, "kind": "bucket", "bucket": b,
                         "postings": int(pc.sum(t.column("k")).as_py()
                                         or 0),
                         "field_k": json.dumps(fk), "rows": 0,
                         "min_doc": 0, "max_doc": 0, "name": ""}]
            r = _split_bucket(src_abs, man, b, lo, hi, seg, stp)
            return [{"j": j, "kind": "bucket", "bucket": b,
                     "postings": r["postings"],
                     "field_k": json.dumps(r["field_k"]), "rows": 0,
                     "min_doc": 0, "max_doc": 0, "name": ""}]
        dst = os.path.join(outs_abs[j], "docmap", row["name"])
        t = pq.read_table(os.path.join(src_abs, row["src"]),
                          filters=[("doc_id", ">=", lo),
                                   ("doc_id", "<", hi)])
        if t.num_rows and not os.path.exists(dst):
            i = t.schema.get_field_index("doc_id")
            t = t.set_column(i, "doc_id",
                             pa.compute.subtract(t.column("doc_id"), lo))
            pq.write_table(t, dst + ".tmp")
            os.replace(dst + ".tmp", dst)
        elif os.path.exists(dst):
            t = pq.read_table(dst, columns=["doc_id"])
        if not t.num_rows:
            return []
        dmin = int(pa.compute.min(t.column("doc_id")).as_py())
        dmax = int(pa.compute.max(t.column("doc_id")).as_py())
        return [{"j": j, "kind": "docmap", "bucket": -1, "postings": 0,
                 "field_k": "{}", "rows": t.num_rows, "min_doc": dmin,
                 "max_doc": dmax, "name": row["name"]}]

    acks = (ray.data.from_items(items + dm_items,
                                override_num_blocks=max(
                                    1, len(items) + len(dm_items)))
            .flat_map(work).take_all())

    tombs = []
    tp = os.path.join(src_dir, "tombstones.json")
    if os.path.exists(tp):
        with open(tp) as f:
            tombs = json.load(f)

    mans = []
    for j, d in enumerate(out_dirs):
        lo, hi = cuts[j], cuts[j + 1]
        field_k: dict[str, int] = {}
        segs, stats, dms = [], [], []
        for a in sorted((a for a in acks if a["j"] == j),
                        key=lambda a: (a["kind"], a["bucket"], a["name"])):
            if a["kind"] == "bucket":
                if a["postings"]:
                    segs.append({"gkey": a["bucket"],
                                 "path": f"segments/seg-{a['bucket']:08d}"
                                         ".parquet",
                                 "postings": a["postings"]})
                    stats.append({"bucket": a["bucket"],
                                  "path": f"stats/stats-{a['bucket']:08d}"
                                          ".parquet"})
                for k, v in json.loads(a["field_k"]).items():
                    field_k[k] = field_k.get(k, 0) + int(v)
            else:
                dms.append({"path": f"docmap/{a['name']}",
                            "rows": a["rows"], "min_doc": a["min_doc"],
                            "max_doc": a["max_doc"]})
        out_man = dict(man)
        out_man.update({
            "num_docs": hi - lo, "doc_id_offset": 0, "num_ranges": 1,
            "range_span": hi - lo, "field_k": field_k,
            "docmap": sorted(dms, key=lambda e: e["min_doc"]),
            "segments": segs, "stats": stats,
            "metrics": {"split_from": src_abs, "doc_range": [lo, hi]},
        })
        st = [t - lo for t in tombs if lo <= t < hi]
        if st:
            with open(os.path.join(d, "tombstones.json"), "w") as f:
                json.dump(st, f)
        tmp = os.path.join(d, MANIFEST_NAME + ".tmp")
        with open(tmp, "w") as f:
            json.dump(out_man, f)
        os.replace(tmp, os.path.join(d, MANIFEST_NAME))
        mans.append(out_man)
    return mans


def _split_json_bucket(src_dir: str, man: dict, bucket: int, lo: int,
                       hi: int, out_seg: str, out_stats: str) -> dict:
    """Nested twin of _split_bucket: posting entries carry arraypath
    streams (plain varints, cnt × depth per block) that mask row-wise
    with the docs; stats rows are (kp, term, c, k) with string kps."""
    from .codec import (decode_position_lists, decode_varint,
                        encode_deltas, encode_position_lists,
                        encode_varint)

    nr = int(man["num_ranges"])
    seg_by_gkey = {s["gkey"]: s["path"] for s in man["segments"]}
    cols = ["field", "term", "depth", "cnt", "docs", "aps", "tfs",
            "lens", "positions"]
    rows: dict[str, list] = {c: [] for c in (
        "field", "term", "depth", "min_doc", "max_doc", "cnt", "c_block",
        "max_tf_norm", "docs", "aps", "tfs", "lens", "positions")}
    filters = [("max_doc", ">=", lo), ("min_doc", "<", hi)]
    for rng in range(nr):
        path = seg_by_gkey.get(bucket * nr + rng)
        if path is None:
            continue
        t = pq.read_table(os.path.join(src_dir, path), columns=cols,
                          filters=filters)
        for i in range(t.num_rows):
            cnt = int(t.column("cnt")[i].as_py())
            depth = int(t.column("depth")[i].as_py())
            docs = np.cumsum(decode_varint(
                t.column("docs")[i].as_py(), cnt).astype(np.int64))
            keep = (docs >= lo) & (docs < hi)
            if not keep.any():
                continue
            aps = decode_varint(t.column("aps")[i].as_py(),
                                cnt * depth).astype(np.int64)
            aps = aps.reshape(cnt, depth)[keep]
            tfs = decode_varint(t.column("tfs")[i].as_py(),
                                cnt).astype(np.int64)
            lens = decode_varint(t.column("lens")[i].as_py(),
                                 cnt).astype(np.int64)
            pos = decode_position_lists(t.column("positions")[i].as_py(),
                                        tfs)
            pos_ends = np.cumsum(tfs)
            pkeep = np.zeros(pos.size, bool)
            for j in np.flatnonzero(keep):
                pkeep[(pos_ends[j] - tfs[j]):pos_ends[j]] = True
            docs, tfs, lens = docs[keep] - lo, tfs[keep], lens[keep]
            rows["field"].append(t.column("field")[i].as_py())
            rows["term"].append(t.column("term")[i].as_py())
            rows["depth"].append(depth)
            rows["min_doc"].append(int(docs[0]))
            rows["max_doc"].append(int(docs[-1]))
            rows["cnt"].append(int(docs.size))
            rows["c_block"].append(int(tfs.sum()))
            tf_norm = (np.sqrt(tfs.astype(np.float32))
                       / np.sqrt(lens.astype(np.float32)))
            rows["max_tf_norm"].append(float(tf_norm.max()))
            rows["docs"].append(encode_deltas(docs))
            rows["aps"].append(encode_varint(aps.ravel()))
            rows["tfs"].append(encode_varint(tfs))
            rows["lens"].append(encode_varint(lens))
            rows["positions"].append(
                encode_position_lists(pos[pkeep], tfs))
    if not rows["field"]:
        return {"postings": 0, "field_k": {}}
    fld = np.asarray(rows["field"], object)
    trm = np.asarray(rows["term"], object)
    mnd = np.asarray(rows["min_doc"], np.int64)
    order = np.lexsort((mnd, trm, fld))
    seg = pa.table({
        "field": pa.array(fld[order].tolist(), pa.string()),
        "term": pa.array(trm[order].tolist(), pa.string()),
        "depth": pa.array(
            np.asarray(rows["depth"])[order].astype(np.int64)),
        "min_doc": pa.array(mnd[order], pa.int64()),
        "max_doc": pa.array(np.asarray(rows["max_doc"])[order],
                            pa.int64()),
        "cnt": pa.array(np.asarray(rows["cnt"])[order].astype(np.int32)),
        "c_block": pa.array(np.asarray(rows["c_block"])[order],
                            pa.int64()),
        "max_tf_norm": pa.array(
            np.asarray(rows["max_tf_norm"], np.float32)[order]),
        "docs": pa.array(np.asarray(rows["docs"], object)[order].tolist(),
                         pa.binary()),
        "aps": pa.array(np.asarray(rows["aps"], object)[order].tolist(),
                        pa.binary()),
        "tfs": pa.array(np.asarray(rows["tfs"], object)[order].tolist(),
                        pa.binary()),
        "lens": pa.array(np.asarray(rows["lens"], object)[order].tolist(),
                         pa.binary()),
        "positions": pa.array(
            np.asarray(rows["positions"], object)[order].tolist(),
            pa.binary()),
    })
    sf, st_ = fld[order], trm[order]
    new = np.ones(sf.size, bool)
    new[1:] = (sf[1:] != sf[:-1]) | (st_[1:] != st_[:-1])
    starts = np.flatnonzero(new)
    c_arr = np.add.reduceat(np.asarray(rows["c_block"])[order], starts)
    k_arr = np.add.reduceat(np.asarray(rows["cnt"])[order], starts)
    stats = pa.table({
        "field": pa.array(sf[starts].tolist(), pa.string()),
        "term": pa.array(st_[starts].tolist(), pa.string()),
        "c": pa.array(c_arr.astype(np.int64)),
        "k": pa.array(k_arr.astype(np.int64)),
    })
    field_k = {str(kp): int(np.asarray(rows["cnt"])[fld == kp].sum())
               for kp in np.unique(fld)}
    stats = stats.replace_schema_metadata(
        {"noise_gkey": str(bucket), "noise_postings": str(int(k_arr.sum())),
         "noise_field_k": json.dumps(field_k, sort_keys=True)})
    pq.write_table(seg, out_seg + ".tmp")
    os.replace(out_seg + ".tmp", out_seg)
    pq.write_table(stats, out_stats + ".tmp")
    os.replace(out_stats + ".tmp", out_stats)
    return {"postings": int(k_arr.sum()), "field_k": field_k}


def _split_values_part(src: str, dst: str, lo: int, hi: int) -> int:
    """Filter one values partition to [lo, hi), rebase doc_id, and
    recompute the per-kp zone maps from the kept rows (same format the
    build writes: n / sorted codes / fmin / fmax when numeric)."""
    t = pq.read_table(src, filters=[("doc_id", ">=", lo),
                                    ("doc_id", "<", hi)])
    if not t.num_rows:
        return 0
    i = t.schema.get_field_index("doc_id")
    t = t.set_column(i, "doc_id",
                     pa.compute.subtract(t.column("doc_id"), lo))
    kps = t.column("kp").to_pylist()
    codes = t.column("code").to_pylist()
    nums = t.column("num").to_pylist()
    zones: dict = {}
    for kp, code, num in zip(kps, codes, nums):
        z = zones.get(kp)
        if z is None:
            z = zones[kp] = {"n": 0, "codes": set()}
        z["n"] += 1
        z["codes"].add(code)
        if num is not None:
            z["fmin"] = min(z.get("fmin", num), num)
            z["fmax"] = max(z.get("fmax", num), num)
    zmeta = {kp: {**{key: v for key, v in z.items() if key != "codes"},
                  "codes": sorted(z["codes"])}
             for kp, z in zones.items()}
    t = t.replace_schema_metadata(
        {"noise_kp_zones": json.dumps(zmeta, sort_keys=True)})
    pq.write_table(t, dst + ".tmp", row_group_size=16384)
    os.replace(dst + ".tmp", dst)
    return t.num_rows


def split_json_index(src_dir: str, out_dirs: list[str],
                     cuts: list[int] | None = None) -> list[dict]:
    """The NESTED split: like :func:`split_index` plus the values
    partitions, which filter + rebase and recompute their per-kp zone
    maps (spatial sidecars are NOT carried — the bbox reader's
    per-partition fallback scan covers sidecar-less partitions)."""
    import ray.data

    from .incremental import _epoch_dirs

    if _epoch_dirs(src_dir):
        raise ValueError("compact before split")
    with open(os.path.join(src_dir, MANIFEST_NAME)) as f:
        man = json.load(f)
    if not man.get("nested"):
        raise ValueError("split_json_index is nested-only")
    n_docs = int(man.get("doc_id_offset", 0)) + int(man["num_docs"])
    n = len(out_dirs)
    if cuts is None:
        cuts = [round(j * n_docs / n) for j in range(n + 1)]
    if len(cuts) != n + 1 or cuts[0] != 0 or cuts[-1] != n_docs:
        raise ValueError("cuts must be [0, ..., num_docs]")

    for d in out_dirs:
        for part in ("docmap", "segments", "stats", "values"):
            os.makedirs(os.path.join(d, part), exist_ok=True)

    nb = int(man["num_buckets"])
    items = [{"kind": "bucket", "bucket": b, "j": j, "src": "",
              "name": ""}
             for b in range(nb) for j in range(n)]
    for j in range(n):
        lo, hi = cuts[j], cuts[j + 1]
        for part in ("docmap", "values"):
            for e in man[part]:
                if e["max_doc"] < lo or e["min_doc"] >= hi:
                    continue
                items.append({"kind": part, "bucket": -1, "j": j,
                              "src": e["path"],
                              "name": os.path.basename(e["path"])})
    src_abs = os.path.abspath(src_dir)
    outs_abs = [os.path.abspath(d) for d in out_dirs]
    cuts_t = list(cuts)

    def work(row: dict) -> list[dict]:
        j = row["j"]
        lo, hi = cuts_t[j], cuts_t[j + 1]
        if row["kind"] == "bucket":
            b = row["bucket"]
            seg = os.path.join(outs_abs[j], "segments",
                               f"seg-{b:08d}.parquet")
            stp = os.path.join(outs_abs[j], "stats",
                               f"stats-{b:08d}.parquet")
            if not (os.path.exists(seg) and os.path.exists(stp)):
                r = _split_json_bucket(src_abs, man, b, lo, hi, seg, stp)
            else:
                fk = json.loads((pq.read_metadata(stp).metadata or {})
                                .get(b"noise_field_k", b"{}"))
                r = {"postings": sum(fk.values()), "field_k": fk}
            return [{"j": j, "kind": "bucket", "bucket": b,
                     "postings": r["postings"],
                     "field_k": json.dumps(r["field_k"]), "rows": 0,
                     "min_doc": 0, "max_doc": 0, "name": ""}]
        dst = os.path.join(outs_abs[j], row["kind"], row["name"])
        srcp = os.path.join(src_abs, row["src"])
        if row["kind"] == "values":
            if not os.path.exists(dst):
                nrows = _split_values_part(srcp, dst, lo, hi)
            else:
                nrows = pq.read_metadata(dst).num_rows
            if not nrows:
                return []
            t = pq.read_table(dst, columns=["doc_id"])
        else:
            if not os.path.exists(dst):
                t = pq.read_table(srcp, filters=[("doc_id", ">=", lo),
                                                 ("doc_id", "<", hi)])
                if t.num_rows:
                    i = t.schema.get_field_index("doc_id")
                    t = t.set_column(
                        i, "doc_id",
                        pa.compute.subtract(t.column("doc_id"), lo))
                    pq.write_table(t, dst + ".tmp")
                    os.replace(dst + ".tmp", dst)
            else:
                t = pq.read_table(dst, columns=["doc_id"])
            if not t.num_rows:
                return []
        dmin = int(pa.compute.min(t.column("doc_id")).as_py())
        dmax = int(pa.compute.max(t.column("doc_id")).as_py())
        return [{"j": j, "kind": row["kind"], "bucket": -1,
                 "postings": 0, "field_k": "{}", "rows": t.num_rows,
                 "min_doc": dmin, "max_doc": dmax, "name": row["name"]}]

    acks = (ray.data.from_items(items,
                                override_num_blocks=max(1, len(items)))
            .flat_map(work).take_all())

    tombs = []
    tp = os.path.join(src_dir, "tombstones.json")
    if os.path.exists(tp):
        with open(tp) as f:
            tombs = json.load(f)

    mans = []
    for j, d in enumerate(out_dirs):
        lo, hi = cuts[j], cuts[j + 1]
        field_k: dict[str, int] = {}
        segs, stats, dms, vals = [], [], [], []
        for a in sorted((a for a in acks if a["j"] == j),
                        key=lambda a: (a["kind"], a["bucket"],
                                       a["name"])):
            if a["kind"] == "bucket":
                if a["postings"]:
                    segs.append({"gkey": a["bucket"],
                                 "path": f"segments/seg-{a['bucket']:08d}"
                                         ".parquet",
                                 "postings": a["postings"]})
                    stats.append({"bucket": a["bucket"],
                                  "path": f"stats/stats-{a['bucket']:08d}"
                                          ".parquet"})
                for key, v in json.loads(a["field_k"]).items():
                    field_k[key] = field_k.get(key, 0) + int(v)
            elif a["kind"] == "docmap":
                dms.append({"path": f"docmap/{a['name']}",
                            "rows": a["rows"], "min_doc": a["min_doc"],
                            "max_doc": a["max_doc"]})
            else:
                vals.append({"path": f"values/{a['name']}",
                             "min_doc": a["min_doc"],
                             "max_doc": a["max_doc"]})
        out_man = dict(man)
        out_man.update({
            "num_docs": hi - lo, "doc_id_offset": 0, "num_ranges": 1,
            "range_span": hi - lo, "field_k": field_k,
            "docmap": sorted(dms, key=lambda e: e["min_doc"]),
            "values": sorted(vals, key=lambda e: e["min_doc"]),
            "segments": segs, "stats": stats,
            "metrics": {"split_from": src_abs, "doc_range": [lo, hi]},
        })
        st = [x - lo for x in tombs if lo <= x < hi]
        if st:
            with open(os.path.join(d, "tombstones.json"), "w") as f:
                json.dump(st, f)
        tmp = os.path.join(d, MANIFEST_NAME + ".tmp")
        with open(tmp, "w") as f:
            json.dump(out_man, f)
        os.replace(tmp, os.path.join(d, MANIFEST_NAME))
        mans.append(out_man)
    return mans


def merge_dedup_keys(out_dir: str) -> int:
    """Upsert semantics for merges of OVERLAPPING corpora: tombstone
    every doc whose key columns collide with a higher merged doc id
    (later source wins — the lookup rule).  One key-hash groupby over
    the merged docmap's key columns (column-pruned read, only colliding
    ids return to the driver); stats stay untouched until compaction —
    the same Lucene hidden-delete semantics as the incremental upsert.
    Returns the number of tombstoned docs."""
    import ray.data

    with open(os.path.join(out_dir, MANIFEST_NAME)) as f:
        man = json.load(f)
    kc = list(man["key_columns"])
    paths = [os.path.join(out_dir, e["path"]) for e in man["docmap"]]
    schema_names = pq.read_schema(paths[0]).names
    # when the key column IS doc_id, the source key rides as src_doc_id
    # (the internal doc_id column was rewritten by the merge)
    keycols = [("src_doc_id" if c == "doc_id"
                and "src_doc_id" in schema_names else c) for c in kc]
    cols = list(dict.fromkeys(["doc_id", *keycols]))

    def dead_of(g: pa.Table) -> pa.Table:
        ids = g.column("doc_id")
        if g.num_rows <= 1:
            return pa.table({"dead": pa.array([], pa.int64())})
        mx = pa.compute.max(ids).as_py()
        dead = [int(v.as_py()) for v in ids if v.as_py() != mx]
        return pa.table({"dead": pa.array(dead, pa.int64())})

    dead_rows = (ray.data.read_parquet(paths, columns=cols)
                 .groupby(keycols)
                 .map_groups(dead_of, batch_format="pyarrow")
                 .take_all())
    dead = sorted(int(r["dead"]) for r in dead_rows)
    if not dead:
        return 0
    tp = os.path.join(out_dir, "tombstones.json")
    prior = []
    if os.path.exists(tp):
        with open(tp) as f:
            prior = json.load(f)
    merged = sorted(set(prior) | set(dead))
    with open(tp + ".tmp", "w") as f:
        json.dump(merged, f)
    os.replace(tp + ".tmp", tp)
    return len(dead)
