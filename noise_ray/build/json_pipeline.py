"""Nested-JSON index build pipeline (Ray Data).

The nested-document analogue of ``pipeline.build_index``: input rows are
arbitrary JSON documents (``_id`` + ``json`` string columns); each doc is
shredded (build/shred.py, the analogue of the reference Shredder,
/root/reference/src/json_shred.rs:485-576) into

- **docmap** partitions ``(doc_id, _id, json)`` — the doc store,
- **values** partitions ``(doc_id, kp, ap, code, num, str)`` — every
  shredded scalar/marker entry, one row per (doc, keypath, arraypath).
  This is the columnar analogue of the reference's V/f/T/F/N value
  keyspaces (src/key_builder.rs:163-262): RangeQ scans filter it by kp,
  exact matches verify against it, NOT existence checks consult it.
- **segments** of instance-level posting blocks: ``field`` is the full
  keypath STRING (e.g. ``.msgs$.text``), and each posting entry is one
  (doc, arraypath) string instance — the block rows carry an extra
  ``aps`` varint stream (cnt × depth indices) and a ``depth`` column.
  Within a (field, term) run entries sort by (doc, arraypath) in NUMERIC
  order.  (The reference iterates RocksDB keys whose seq/arraypath are
  DECIMAL STRINGS, so its iteration order diverges from its own numeric
  DocResult comparisons once an array has 10+ elements — undefined
  behavior we do not replicate; numeric order is used throughout.)
- **stats**: C = Σ tf per (kp, stem), K per kp = Σ (instance ×
  distinct-stem) — the same merge-summed counters as the flat build
  (src/json_shred.rs:191-199), keyed by keypath string.

Doc ids are assigned by INPUT ORDER (file order × row order), mirroring
the reference's monotonically increasing seq on add — there is no sort
key for arbitrary JSON.  The pipeline is one streaming execution with
the same map-side combiner, gkey = (hash(kp, term) bucket × doc range)
shuffle, idempotent tmp+rename writes and committed-group resume as the
flat build.
"""

from __future__ import annotations

import json
import os
import zlib
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..analysis.tokenizer import tokenize_grouped
from .arrow_shred import accumulate_postings, shred_table_fast
from .codec import encode_deltas, encode_position_lists, encode_varint
from .pipeline import (
    MANIFEST_NAME, _ack, _atomic_write_table, _seg_path, _stats_path,
    read_group_meta,
)
from .shred import shred

VALUES_CODES = ("s", "f", "T", "F", "N", "o", "a", "r")


def kp_term_bucket(kp: str, term: str, num_buckets: int) -> int:
    return zlib.crc32(f"{kp}\0{term}".encode("utf-8")) % num_buckets


# ------------------------------------------------------------------ inputs

def docs_to_parquet(docs: list, out_path: str, docid_base: int = 0,
                    seqs: list[int] | None = None,
                    id_prefix: str = ""):
    """Write JSON documents to one build-ready parquet shard
    ``(_id, json, seq)``.  ``docs`` entries are dicts or JSON strings;
    docs without a root ``_id`` get a deterministic ``"doc<n>"`` id (the
    reference generates a UUID here, src/json_shred.rs:477-483 — we need
    determinism for resumable builds).  ``seqs`` records the reference's
    monotonically increasing add-order seq per doc (defaults to position);
    it is carried for the REPL's seq-string iteration-order quirks, not
    used as the doc_id."""
    ids, texts = [], []
    for i, d in enumerate(docs):
        if isinstance(d, str):
            d = json.loads(d)
        if not isinstance(d, dict):
            raise ValueError("Expected JSON object document")
        if "_id" in d and not isinstance(d["_id"], str):
            # a present-but-non-string _id (incl. null) is an error,
            # like the reference shredder
            raise ValueError(
                "Expected string for `_id` field, got another type")
        the_id = d.get("_id")
        if the_id is None:
            # inject the generated id into the stored doc, like the
            # reference's add_id (src/json_shred.rs:477-483): `return
            # ._id` and whole-doc fetches must see it
            the_id = f"doc{id_prefix}{docid_base + i}"
            d = {**d, "_id": the_id}
        ids.append(the_id)
        texts.append(json.dumps(d, ensure_ascii=False))
    if seqs is None:
        seqs = list(range(docid_base, docid_base + len(ids)))
    t = pa.table({"_id": pa.array(ids, pa.string()),
                  "json": pa.array(texts, pa.string()),
                  "seq": pa.array(seqs, pa.int64())})
    _atomic_write_table(t, out_path)
    return out_path


def jsonl_to_doc_parquet(in_paths: list[str], out_dir: str) -> list[str]:
    """Convert JSONL files of arbitrary JSON docs into ``(_id, json)``
    shards, one per input file (per-file tasks keep within-file line
    order, which defines doc_id order)."""
    import hashlib as _hashlib

    os.makedirs(out_dir, exist_ok=True)
    dest_tag = _hashlib.md5(
        os.path.abspath(out_dir).encode()).hexdigest()[:8]

    def _one(row: dict) -> dict:
        src = row["path"]
        out = os.path.join(out_dir, f"docs-{row['seq']:05d}.parquet")
        if not os.path.exists(out):
            with open(src) as f:
                docs = [l for l in f if l.strip()]
            # id prefix unique per (destination, file): _id-less docs
            # must not collide across files OR across separate ingest
            # calls (the reference generates UUIDs; we keep determinism
            # per destination so resumed conversions reuse the same ids)
            docs_to_parquet(docs, out, id_prefix=f"{dest_tag}-{row['seq']}-")
        return {"path": out}

    items = [{"path": p, "seq": i} for i, p in enumerate(sorted(in_paths))]
    outs = ray.data.from_items(items).map(_one).take_all()
    # take_all row order is not guaranteed across parallel tasks; shard
    # names carry the input file order, so sorting restores doc order
    return sorted(o["path"] for o in outs)


# ----------------------------------------------------------------- stage 1+2

def _pack_ap_order(doc_ids: np.ndarray, aps: list[tuple[int, ...]]):
    """argsort by (doc, arraypath) numerically."""
    n = len(aps)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    depth = len(aps[0]) if aps else 0
    cols = [doc_ids] + [np.fromiter((a[j] for a in aps), dtype=np.int64,
                                    count=n) for j in range(depth)]
    return np.lexsort(tuple(reversed(cols)))


def _kp_rank_codes(col) -> np.ndarray:
    """Alphabetical-rank codes per row for a dictionary-encoded kp
    column (chunked, possibly with per-chunk dictionaries): the rank
    map is DISTINCT-kp-sized, row work is one vectorized gather."""
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    dicts = [c.dictionary.to_pylist() for c in chunks]
    rank = {k: i for i, k in enumerate(sorted(set().union(*map(set, dicts))))}
    out = np.empty(len(col), np.int64)
    off = 0
    for c, d in zip(chunks, dicts):
        codes = np.array([rank[k] for k in d], np.int64)
        idx = c.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        out[off:off + len(c)] = codes[idx]
        off += len(c)
    return out


class ShredTokenize:
    """Fused shred + tokenize + map-side combiner for one batch of plan
    rows.  Writes the docmap and values partitions as side effects
    (idempotent per input file) and returns finished posting-block rows
    keyed by gkey for the shuffle."""

    def __init__(self, docmap_dir: str, values_dir: str, num_buckets: int,
                 num_ranges: int, range_span: int, range_base: int,
                 block_size: int, fast: bool = True):
        self.docmap_dir = docmap_dir
        self.values_dir = values_dir
        self.num_buckets = num_buckets
        self.num_ranges = num_ranges
        self.range_span = range_span
        self.range_base = range_base
        self.block_size = block_size
        self.fast = fast  # try the Arrow column-wise shred first
        self._bucket_cache: dict[tuple[str, str], int] = {}

    def _bucket(self, kp: str, term: str) -> int:
        k = (kp, term)
        b = self._bucket_cache.get(k)
        if b is None:
            b = kp_term_bucket(kp, term, self.num_buckets)
            if len(self._bucket_cache) < 1_000_000:
                self._bucket_cache[k] = b
        return b

    # -------------------------------------------------------- per file

    def _shred_file(self, path: str, offset: int, rows: int, seq: int, acc):
        docmap_path = os.path.join(self.docmap_dir,
                                   f"docmap-{seq:05d}.parquet")
        values_path = os.path.join(self.values_dir,
                                   f"values-{seq:05d}.parquet")
        have_seq = "seq" in pq.read_schema(path).names
        t = pq.read_table(path, columns=(["_id", "json", "seq"] if have_seq
                                         else ["_id", "json"]))
        if t.num_rows != rows:
            raise ValueError(
                f"{path}: footer said {rows} rows, read {t.num_rows}")
        ids = t.column("_id").to_pylist()
        texts = t.column("json").to_pylist()

        vt_fast = zmeta_fast = None
        slow_sel = range(rows)
        if self.fast:
            fast = shred_table_fast(ids, texts, offset)
            if fast is not None:
                vt_fast, zmeta_fast, text_groups, slow_rows = fast
                accumulate_postings(text_groups, acc, tokenize_grouped)
                slow_sel = slow_rows
                if not slow_rows:
                    # purely fast shard: write artifacts directly
                    if not os.path.exists(values_path):
                        vt = vt_fast.replace_schema_metadata(
                            {"noise_kp_zones": json.dumps(zmeta_fast,
                                                          sort_keys=True)})
                        _atomic_write_table(vt, values_path,
                                            row_group_size=16384)
                    if not os.path.exists(docmap_path):
                        cols = {
                            "doc_id": pa.array(
                                np.arange(offset, offset + rows,
                                          dtype=np.int64)),
                            "_id": pa.array(ids, pa.string()),
                            "json": pa.array(texts, pa.string()),
                        }
                        if have_seq:
                            cols["seq"] = t.column("seq")
                        _atomic_write_table(pa.table(cols), docmap_path,
                                            row_group_size=65536)
                    return

        # per-document walk: the whole shard when the fast path bailed,
        # else just the null-bearing rows the fast path routed here
        v_doc: list[int] = []
        v_kp: list[str] = []
        v_ap: list[list[int]] = []
        v_code: list[str] = []
        v_num: list[float | None] = []
        v_str: list[str | None] = []
        v_bbox: list[list[float] | None] = []
        for i in slow_sel:
            the_id, text = ids[i], texts[i]
            doc = offset + i
            sd = shred(json.loads(text), docid=the_id, sort=False)
            for e in sd.entries:
                v_doc.append(doc)
                v_kp.append(e.kp)
                v_ap.append(list(e.ap))
                v_code.append(e.code)
                v_num.append(e.value if e.code == "f" else None)
                v_str.append(e.value if e.code == "s" else None)
                v_bbox.append(list(e.value) if e.code == "r" else None)
                if e.code == "s":
                    # add_stemmed_entries (src/json_shred.rs:148-203):
                    # one posting instance per (kp, stem, doc, ap)
                    terms, positions, field_len = tokenize_grouped(e.value)
                    for term, p in zip(terms, positions):
                        ent = acc.get((e.kp, term))
                        if ent is None:
                            acc[(e.kp, term)] = ent = ([], [], [], [], [])
                        ent[0].append(doc)
                        ent[1].append(e.ap)
                        ent[2].append(len(p))
                        ent[3].append(field_len)
                        ent[4].extend(p)

        spatial_path = os.path.join(
            os.path.join(os.path.dirname(self.values_dir), "spatial"),
            f"spatial-{seq:05d}.parquet")
        if not os.path.exists(spatial_path):
            self._write_spatial(spatial_path, v_doc, v_kp, v_ap, v_code,
                                v_bbox)
        if not os.path.exists(values_path):
            # (kp, doc)-sorted rows: every values read filters on kp, so
            # kp-contiguous row groups let parquet stats prune the other
            # keypaths; the stable sort keeps docs ascending per kp for
            # the doc-range filters (same layout as the Arrow fast path)
            _, kp_inv = np.unique(
                np.asarray(v_kp, dtype=object), return_inverse=True)
            vorder = np.argsort(kp_inv, kind="stable")
            v_doc = [v_doc[i] for i in vorder]
            v_kp = [v_kp[i] for i in vorder]
            v_ap = [v_ap[i] for i in vorder]
            v_code = [v_code[i] for i in vorder]
            v_num = [v_num[i] for i in vorder]
            v_str = [v_str[i] for i in vorder]
            v_bbox = [v_bbox[i] for i in vorder]
            vt = pa.table({
                "doc_id": pa.array(v_doc, pa.int64()),
                "kp": pa.array(v_kp, pa.string()).dictionary_encode(),
                "ap": pa.array(v_ap, pa.list_(pa.int64())),
                "code": pa.array(v_code, pa.string()).dictionary_encode(),
                "num": pa.array(v_num, pa.float64()),
                "str": pa.array(v_str, pa.string()),
                "bbox": pa.array(v_bbox, pa.list_(pa.float64())),
            })
            # per-kp zone map (numeric min/max + row count + codes seen):
            # the value-index analogue the flat path gets from Parquet
            # footer stats per column; here columns are rows, so the zones
            # are computed at write time and stored in the file metadata
            zones: dict[str, dict] = {}
            for kp, code, num in zip(v_kp, v_code, v_num):
                z = zones.get(kp)
                if z is None:
                    z = zones[kp] = {"n": 0, "codes": set()}
                z["n"] += 1
                z["codes"].add(code)
                if num is not None:
                    z["fmin"] = min(z.get("fmin", num), num)
                    z["fmax"] = max(z.get("fmax", num), num)
            zmeta = {kp: {**{k: v for k, v in z.items() if k != "codes"},
                          "codes": sorted(z["codes"])}
                     for kp, z in zones.items()}
            if vt_fast is not None:
                # mixed shard: merge the column-wise shred of the
                # null-free rows with the per-doc shred of the rest.
                # np.lexsort is stable, and a doc is in exactly one
                # source, so within-(kp, doc) arraypath order survives.
                # kp sort keys come from the dictionary chunks (a rank
                # per DISTINCT kp), never a per-row string gather
                vt = pa.concat_tables([vt_fast, vt],
                                      promote_options="default")
                m_inv = _kp_rank_codes(vt.column("kp"))
                m_doc = vt.column("doc_id").to_numpy()
                vt = vt.take(pa.array(np.lexsort((m_doc, m_inv))))
                for kp, zf in zmeta_fast.items():
                    z = zones.get(kp)
                    if z is None:
                        zmeta[kp] = zf
                        continue
                    merged = {"n": z["n"] + zf["n"],
                              "codes": sorted(set(z["codes"])
                                              | set(zf["codes"]))}
                    fmins = [v for v in (z.get("fmin"), zf.get("fmin"))
                             if v is not None]
                    fmaxs = [v for v in (z.get("fmax"), zf.get("fmax"))
                             if v is not None]
                    if fmins:
                        merged["fmin"] = min(fmins)
                        merged["fmax"] = max(fmaxs)
                    zmeta[kp] = merged
            vt = vt.replace_schema_metadata(
                {"noise_kp_zones": json.dumps(zmeta, sort_keys=True)})
            _atomic_write_table(vt, values_path, row_group_size=16384)

        if not os.path.exists(docmap_path):
            cols = {
                "doc_id": pa.array(
                    np.arange(offset, offset + rows, dtype=np.int64)),
                "_id": pa.array(ids, pa.string()),
                "json": pa.array(texts, pa.string()),
            }
            if have_seq:
                cols["seq"] = t.column("seq")
            dt = pa.table(cols)
            _atomic_write_table(dt, docmap_path, row_group_size=65536)

    @staticmethod
    def _write_spatial(spatial_path: str, v_doc, v_kp, v_ap, v_code,
                       v_bbox) -> None:
        """Grid-bucketed sidecar of this partition's ``r`` rows (the
        rtree-CF analogue, build/spatial.py): rows replicated per
        intersected cell, sorted by (kp, cell, doc) with small row groups
        so a bbox query's cell filter prunes at the parquet layer.  No
        file is written when the partition has no geometry."""
        from .spatial import cells_for_boxes

        r_idx = [i for i, c in enumerate(v_code) if c == "r"]
        if not r_idx:
            return
        boxes = np.asarray([v_bbox[i] for i in r_idx], dtype=np.float64)
        rows, cells = cells_for_boxes(boxes)
        docs = np.asarray([v_doc[i] for i in r_idx], dtype=np.int64)[rows]
        kps = [v_kp[r_idx[i]] for i in rows]
        aps = [v_ap[r_idx[i]] for i in rows]
        order = sorted(range(len(rows)),
                       key=lambda i: (kps[i], int(cells[i]), int(docs[i])))
        st = pa.table({
            "kp": pa.array([kps[i] for i in order],
                           pa.string()).dictionary_encode(),
            "cell": pa.array([int(cells[i]) for i in order], pa.int32()),
            "doc_id": pa.array([int(docs[i]) for i in order], pa.int64()),
            "ap": pa.array([aps[i] for i in order], pa.list_(pa.int64())),
            "bbox": pa.array([list(boxes[rows[i]]) for i in order],
                             pa.list_(pa.float64())),
        })
        os.makedirs(os.path.dirname(spatial_path), exist_ok=True)
        _atomic_write_table(st, spatial_path, row_group_size=4096)

    # ------------------------------------------------------------ batch

    def __call__(self, batch: pa.Table) -> pa.Table:
        # (kp, term) -> [docs, aps, tfs, lens, flat positions]
        acc: dict[tuple[str, str], tuple] = {}
        for row in batch.to_pylist():
            self._shred_file(row["path"], int(row["offset"]),
                             int(row["rows"]), int(row["seq"]), acc)

        out = {k: [] for k in ("gkey", "field", "term", "depth", "min_doc",
                               "max_doc", "cnt", "c_block", "max_tf_norm",
                               "docs", "aps", "tfs", "lens", "pos")}
        nr, span, bsz = self.num_ranges, self.range_span, self.block_size
        for (kp, term), (docs, aps, tfs, lens, pos) in acc.items():
            docs_np = np.asarray(docs, dtype=np.int64)
            order = _pack_ap_order(docs_np, aps)
            depth = len(aps[0]) if aps else 0
            docs_np = docs_np[order]
            tf_all = np.asarray(tfs, dtype=np.int64)
            tfs_np = tf_all[order]
            lens_np = np.asarray(lens, dtype=np.int64)[order]
            # positions re-gathered in instance order: one vectorized
            # variable-length gather (repeat starts + ranges)
            p_starts = np.zeros(tf_all.size, dtype=np.int64)
            np.cumsum(tf_all[:-1], out=p_starts[1:])
            pos_np = np.asarray(pos, dtype=np.int64)
            if pos_np.size:
                sel_starts = p_starts[order]
                sel_ends = np.cumsum(tfs_np)
                rel = (np.arange(int(sel_ends[-1]), dtype=np.int64)
                       - np.repeat(sel_ends - tfs_np, tfs_np))
                pos_np = pos_np[np.repeat(sel_starts, tfs_np) + rel]
            ap_mat = (np.asarray(aps, dtype=np.int64)
                      .reshape(len(aps), depth)[order])
            pos_ends = np.cumsum(tfs_np)
            tf_norm = np.sqrt(tfs_np.astype(np.float32)) / np.sqrt(
                lens_np.astype(np.float32))
            b = self._bucket(kp, term) * nr
            if nr == 1:
                starts, ends = [0], [docs_np.size]
            else:
                rng_of = np.minimum((docs_np - self.range_base) // span,
                                    nr - 1)
                cut = np.flatnonzero(np.diff(rng_of)) + 1
                starts = np.concatenate(([0], cut))
                ends = np.concatenate((cut, [docs_np.size]))
            for r_lo, r_hi in zip(starts, ends):
                r_lo, r_hi = int(r_lo), int(r_hi)
                rng = min((int(docs_np[r_lo]) - self.range_base) // span,
                          nr - 1)
                g = b + rng
                for lo in range(r_lo, r_hi, bsz):
                    hi = min(lo + bsz, r_hi)
                    p_lo = int(pos_ends[lo - 1]) if lo else 0
                    p_hi = int(pos_ends[hi - 1])
                    out["gkey"].append(g)
                    out["field"].append(kp)
                    out["term"].append(term)
                    out["depth"].append(depth)
                    out["min_doc"].append(int(docs_np[lo]))
                    out["max_doc"].append(int(docs_np[hi - 1]))
                    out["cnt"].append(hi - lo)
                    out["c_block"].append(int(p_hi - p_lo))
                    out["max_tf_norm"].append(float(tf_norm[lo:hi].max()))
                    out["docs"].append(encode_deltas(docs_np[lo:hi]))
                    out["aps"].append(
                        encode_varint(ap_mat[lo:hi].ravel()))
                    out["tfs"].append(encode_varint(tfs_np[lo:hi]))
                    out["lens"].append(encode_varint(lens_np[lo:hi]))
                    out["pos"].append(
                        encode_position_lists(pos_np[p_lo:p_hi],
                                              tfs_np[lo:hi]))
        return pa.table({
            "gkey": pa.array(out["gkey"], pa.int32()),
            "field": pa.array(out["field"], pa.string()),
            "term": pa.array(out["term"], pa.string()),
            "depth": pa.array(out["depth"], pa.int32()),
            "min_doc": pa.array(out["min_doc"], pa.int64()),
            "max_doc": pa.array(out["max_doc"], pa.int64()),
            "cnt": pa.array(out["cnt"], pa.int32()),
            "c_block": pa.array(out["c_block"], pa.int64()),
            "max_tf_norm": pa.array(out["max_tf_norm"], pa.float32()),
            "docs": pa.array(out["docs"], pa.binary()),
            "aps": pa.array(out["aps"], pa.binary()),
            "tfs": pa.array(out["tfs"], pa.binary()),
            "lens": pa.array(out["lens"], pa.binary()),
            "pos": pa.array(out["pos"], pa.binary()),
        })


# ----------------------------------------------------------------- stage 3

def _write_segment_group_json(group: pa.Table, seg_dir: str,
                              stats_dir: str) -> pa.Table:
    """Nested-mode segment writer: identical passthrough design to the
    flat ``_write_segment_group`` but ``field`` is a keypath string and
    blocks carry ``aps``/``depth``."""
    gkey = int(group.column("gkey")[0].as_py())
    out_path = _seg_path(seg_dir, gkey)
    stats_path = _stats_path(stats_dir, gkey)
    if os.path.exists(out_path) and os.path.exists(stats_path):
        meta = read_group_meta(stats_path)
        return _ack(gkey, out_path, stats_path, meta["postings"],
                    meta["field_k"])

    r_field = group.column("field").to_numpy(zero_copy_only=False)
    r_term = group.column("term").to_numpy(zero_copy_only=False)
    r_min = group.column("min_doc").to_numpy()
    _, f_codes = np.unique(r_field, return_inverse=True)
    _, t_codes = np.unique(r_term, return_inverse=True)
    order = np.lexsort((r_min, t_codes, f_codes))
    ordered = group.take(pa.array(order))

    s_field = r_field[order]
    s_term = r_term[order]
    s_cnt = group.column("cnt").to_numpy()[order].astype(np.int64)
    s_cblk = group.column("c_block").to_numpy()[order]
    n = len(order)
    if n:
        new_term = np.empty(n, dtype=bool)
        new_term[0] = True
        new_term[1:] = (s_field[1:] != s_field[:-1]) | (s_term[1:] != s_term[:-1])
        t_starts = np.flatnonzero(new_term)
        stat_c = np.add.reduceat(s_cblk, t_starts)
        stat_k = np.add.reduceat(s_cnt, t_starts)
        field_k: dict[str, int] = {}
        for kp in np.unique(s_field):
            field_k[str(kp)] = int(s_cnt[s_field == kp].sum())
        stats = pa.table({
            "field": pa.array(s_field[t_starts].tolist(), pa.string()),
            "term": pa.array(s_term[t_starts].tolist(), pa.string()),
            "c": pa.array(stat_c.astype(np.int64)),
            "k": pa.array(stat_k.astype(np.int64)),
        })
        postings_total = int(s_cnt.sum())
    else:
        field_k = {}
        stats = pa.table({
            "field": pa.array([], pa.string()),
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
    seg = ordered.select(["field", "term", "depth", "min_doc", "max_doc",
                          "cnt", "c_block", "max_tf_norm", "docs", "aps",
                          "tfs", "lens", "pos"]).rename_columns(
        ["field", "term", "depth", "min_doc", "max_doc", "cnt", "c_block",
         "max_tf_norm", "docs", "aps", "tfs", "lens", "positions"])
    seg = seg.replace_schema_metadata(
        {"noise_gkey": str(gkey), "noise_postings": str(postings_total)})
    _atomic_write_table(stats, stats_path, row_group_size=8192)
    _atomic_write_table(seg, out_path)
    return _ack(gkey, out_path, stats_path, postings_total, field_k)


# ------------------------------------------------------------------ driver

def build_json_index(
    input_paths: list[str],
    index_dir: str,
    *,
    num_buckets: int | None = None,
    docs_per_range: int | None = None,
    block_size: int = 4096,
    doc_id_offset: int = 0,
    docs_per_ingest_task: int | None = None,
    local: bool | None = None,
    fast: bool = True,
) -> dict[str, Any]:
    """Build (or resume) a nested-JSON index; returns the manifest.

    ``input_paths`` are parquet shards with ``(_id, json)`` columns (see
    docs_to_parquet / jsonl_to_doc_parquet).

    ``local=True`` runs the identical stages in-process with no Ray tasks —
    the REPL path, where a transcript re-indexes a handful of documents
    between statements and a distributed execution would be all overhead.
    Defaults to local under 5_000 docs."""
    import time as _time

    t_build_start = _time.time()
    docmap_dir = os.path.join(index_dir, "docmap")
    values_dir = os.path.join(index_dir, "values")
    seg_dir = os.path.join(index_dir, "segments")
    stats_dir = os.path.join(index_dir, "stats")
    for d in (docmap_dir, values_dir, seg_dir, stats_dir):
        os.makedirs(d, exist_ok=True)

    # metadata-only plan: doc ids by input order
    offsets, rows_per = [], []
    off = doc_id_offset
    for p in input_paths:
        r = pq.read_metadata(p).num_rows
        offsets.append(off)
        rows_per.append(r)
        off += r
    num_docs = off - doc_id_offset

    if docs_per_ingest_task is None:
        # Adaptive, INPUT-ONLY sizing: the ingest-task count bounds the
        # SORT-INPUT block count, and the groupby shuffle's constant
        # overhead grows with map-blocks x reduce-partitions.  Measured
        # at 22M turns / 2M docs / 32 CPUs: 2048 fixed-size tasks ->
        # 1313 s build (shred itself only 136 s), ~250 adaptive tasks ->
        # 236 s — identical output, 5.6x.  The target is a fixed 256
        # tasks (not CPU-proportional: the same input must produce the
        # same tasks at every parallelism so the two-cluster-size
        # scaling measurement isolates scheduling), with a floor so
        # small corpora keep data-proportional granularity.
        docs_per_ingest_task = max(1024, -(-max(num_docs, 1) // 256))
    if docs_per_range is None:
        docs_per_range = 250_000
    num_ranges = max(1, min(64, -(-max(num_docs, 1) // docs_per_range)))
    range_span = max(1, -(-max(num_docs, 1) // num_ranges))
    if num_buckets is None:
        num_buckets = max(32, min(4096, -(-max(num_docs, 1) // 200_000)))

    done_gkeys = frozenset(
        g for g in (
            int(f.split("-")[1].split(".")[0])
            for f in os.listdir(seg_dir)
            if f.startswith("seg-") and f.endswith(".parquet")
        )
        if os.path.exists(_stats_path(stats_dir, g))
    )

    num_tasks = max(1, min(len(input_paths),
                           -(-max(num_docs, 1) // docs_per_ingest_task)))
    plan_rows = [
        {"path": os.path.abspath(p), "offset": o, "rows": r, "seq": i}
        for i, (p, o, r) in enumerate(zip(input_paths, offsets, rows_per))
    ]
    shredder = ShredTokenize(docmap_dir, values_dir, num_buckets,
                             num_ranges, range_span, doc_id_offset,
                             block_size, fast=fast)
    if local is None:
        local = num_docs < 5_000
    if local:
        plan = pa.table({
            "path": pa.array([r["path"] for r in plan_rows]),
            "offset": pa.array([r["offset"] for r in plan_rows], pa.int64()),
            "rows": pa.array([r["rows"] for r in plan_rows], pa.int64()),
            "seq": pa.array([r["seq"] for r in plan_rows], pa.int64()),
        })
        blocks = shredder(plan)
        gkeys = blocks.column("gkey").to_numpy()
        acks = []
        for g in np.unique(gkeys):
            if int(g) in done_gkeys:
                continue
            grp = blocks.filter(pa.array(gkeys == g))
            ack = _write_segment_group_json(grp, seg_dir, stats_dir)
            acks.append(ack.to_pylist()[0])
    else:
        ctx = ray.data.DataContext.get_current()
        prev_min_block = ctx.target_min_block_size
        ctx.target_min_block_size = 1
        postings = (
            ray.data.from_items(plan_rows, override_num_blocks=num_tasks)
            .map_batches(shredder, batch_format="pyarrow")
        )
        if done_gkeys:

            def _drop_done(batch: pa.Table) -> pa.Table:
                mask = np.isin(batch.column("gkey").to_numpy(),
                               np.fromiter(done_gkeys, dtype=np.int64),
                               invert=True)
                return batch.filter(pa.array(mask))

            postings = postings.map_batches(_drop_done,
                                            batch_format="pyarrow")

        try:
            acks = (
                postings.groupby("gkey")
                .map_groups(_write_segment_group_json,
                            batch_format="pyarrow",
                            fn_kwargs={"seg_dir": seg_dir,
                                       "stats_dir": stats_dir})
                .take_all()
            )
        finally:
            ctx.target_min_block_size = prev_min_block

    by_gkey = {int(a["gkey"]): a for a in acks}
    for g in done_gkeys:
        if g not in by_gkey:
            meta = read_group_meta(_stats_path(stats_dir, g))
            by_gkey[g] = {"gkey": g, "path": _seg_path(seg_dir, g),
                          "stats_path": _stats_path(stats_dir, g),
                          "postings": meta["postings"],
                          "field_k": json.dumps(meta["field_k"])}

    field_k: dict[str, int] = {}
    for a in by_gkey.values():
        for f, k in json.loads(a["field_k"]).items():
            field_k[f] = field_k.get(f, 0) + int(k)

    manifest = {
        "version": 1,
        "nested": True,
        "analyzer": "noise-porter2-v1",
        "fields": [],
        "key_columns": ["_id"],
        "num_docs": num_docs,
        "doc_id_offset": doc_id_offset,
        "num_buckets": num_buckets,
        "num_ranges": num_ranges,
        "range_span": range_span,
        "block_size": block_size,
        "field_k": {k: v for k, v in sorted(field_k.items())},
        "docmap": [
            {"path": os.path.join(docmap_dir, f"docmap-{i:05d}.parquet"),
             "rows": r, "min_doc": o, "max_doc": o + r - 1}
            for i, (o, r) in enumerate(zip(offsets, rows_per))
        ],
        "values": [
            {"path": os.path.join(values_dir, f"values-{i:05d}.parquet"),
             "min_doc": o, "max_doc": o + r - 1}
            for i, (o, r) in enumerate(zip(offsets, rows_per))
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
        # checkpoint with per-partition lineage + metrics)
        "metrics": {
            "build_wall_sec": round(_time.time() - t_build_start, 3),
            "docs_per_sec": round(
                num_docs / max(_time.time() - t_build_start, 1e-9), 1),
            "ingest_tasks": len(input_paths),
            "segment_groups": len(by_gkey),
            "resumed_groups": len(done_gkeys),
            "total_postings": int(sum(int(a["postings"])
                                      for a in by_gkey.values())),
            "local": bool(local),
        },
    }
    disk = json.loads(json.dumps(manifest))
    for part in ("docmap", "values", "segments", "stats"):
        for e in disk[part]:
            e["path"] = os.path.relpath(e["path"], index_dir)
    import uuid as _uuid

    tmp = os.path.join(index_dir,
                       f".{MANIFEST_NAME}.tmp-{_uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        json.dump(disk, f, indent=1)
    os.replace(tmp, os.path.join(index_dir, MANIFEST_NAME))
    return manifest
