"""IndexReader: manifest-bound point lookups into the segment/stats files.

The query-side analogue of the reference's ``Snapshot``
(/root/reference/src/snapshot.rs:17-67): a reader binds to one immutable
manifest version; all lookups are Parquet reads pruned by row-group
statistics (segment files are sorted by (field, term), so a (field, term)
filter touches only matching row groups — the columnar stand-in for RocksDB
prefix seeks).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from ..build.codec import decode_deltas, decode_position_lists, decode_varint
from ..build.pipeline import MANIFEST_NAME, term_bucket


@dataclass
class PostingList:
    """Decoded postings of one (field, term), doc-ascending.

    ``pos_concat`` / ``pos_starts`` are None when the postings were read
    without positions (term / boolean / range evaluation never touches
    them; skipping the positions column halves the segment bytes read and
    the decode work for the hottest stopword terms)."""
    docs: np.ndarray                   # int64
    tfs: np.ndarray                    # int64
    lens: np.ndarray                   # int64 (field length per instance)
    pos_concat: np.ndarray | None      # int64, concatenated position lists
    pos_starts: np.ndarray | None      # int64, per-doc start offsets

    @property
    def size(self) -> int:
        return int(self.docs.size)

    def positions_of(self, i: int) -> np.ndarray:
        s = self.pos_starts[i]
        e = s + self.tfs[i]
        return self.pos_concat[s:e]

    def slice_range(self, lo: int, hi: int) -> "PostingList":
        """Postings restricted to doc_ids in [lo, hi) — zero-copy views.
        Used by range-partitioned (distributed) query evaluation."""
        s = int(np.searchsorted(self.docs, lo, side="left"))
        e = int(np.searchsorted(self.docs, hi, side="left"))
        if s == 0 and e == self.size:
            return self
        if self.pos_concat is None:
            return PostingList(self.docs[s:e], self.tfs[s:e], self.lens[s:e],
                               None, None)
        p0 = int(self.pos_starts[s]) if s < self.size else len(self.pos_concat)
        p1 = (int(self.pos_starts[e - 1] + self.tfs[e - 1])
              if e > s else p0)
        return PostingList(
            docs=self.docs[s:e],
            tfs=self.tfs[s:e],
            lens=self.lens[s:e],
            pos_concat=self.pos_concat[p0:p1],
            pos_starts=self.pos_starts[s:e] - p0,
        )

    def restrict_to(self, cand: np.ndarray) -> "PostingList":
        """Postings restricted to the sorted candidate doc ids ``cand``
        (positions gathered per kept posting) — the phrase kernel then
        runs over candidate rows only, not the full posting list."""
        idx = np.searchsorted(cand, self.docs)
        idx[idx == cand.size] = 0  # out-of-range rows can't match
        m = cand[idx] == self.docs
        if m.all():
            return self
        docs, tfs, lens = self.docs[m], self.tfs[m], self.lens[m]
        if self.pos_concat is None:
            return PostingList(docs, tfs, lens, None, None)
        total = int(tfs.sum())
        out_starts = np.zeros(tfs.size, dtype=np.int64)
        np.cumsum(tfs[:-1], out=out_starts[1:])
        take = (np.repeat(self.pos_starts[m] - out_starts, tfs)
                + np.arange(total, dtype=np.int64))
        return PostingList(docs, tfs, lens, self.pos_concat[take],
                           out_starts)


@dataclass
class LazyBlock:
    """One posting block: skip metadata eager, payload FETCHED and decoded
    on demand.  ``max_tf``/``min_len`` are the BM25 block bounds written by
    round-3 builds (0 = unknown: pre-upgrade segment file, BM25 pruning
    falls back to exhaustive scoring).  ``_loader`` fetches this block
    row's raw payload bytes through its segment file's cached skip index
    (one row-group read, footer parsed once per file) — pruned blocks
    never read their payload columns at all."""
    min_doc: int
    max_doc: int
    cnt: int
    max_tf_norm: float
    _docs_raw: bytes | None
    _tfs_raw: bytes | None
    _lens_raw: bytes | None
    _decoded: tuple | None = None
    max_tf: int = 0
    min_len: int = 0
    _loader: "object | None" = None
    _pos_raw: bytes | None = None
    _pos_decoded: np.ndarray | None = None

    def decode(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(docs, tfs, lens), doc-ascending."""
        if self._decoded is None:
            if self._docs_raw is None:
                self._loader(self)
            docs = decode_deltas(self._docs_raw, self.cnt)
            tfs = decode_varint(self._tfs_raw, self.cnt).astype(np.int64)
            lens = decode_varint(self._lens_raw, self.cnt).astype(np.int64)
            self._decoded = (docs, tfs, lens)
        return self._decoded

    def decode_with_positions(self):
        """(docs, tfs, lens, pos_concat) — the candidate-driven phrase
        path decodes positions for ONLY the blocks overlapping its
        candidate docs; every other access path never touches the
        positions payload of this block."""
        if self._pos_decoded is None:
            if self._pos_raw is None:
                self._loader(self, True)
            _, tfs, _ = self.decode()
            self._pos_decoded = decode_position_lists(self._pos_raw, tfs)
        docs, tfs, lens = self.decode()
        return docs, tfs, lens, self._pos_decoded

    @property
    def fetched(self) -> bool:
        return self._docs_raw is not None


class _SegBlockIndex:
    """In-memory skip index of ONE segment file: the small metadata
    columns of every block row (field/term/min_doc/max_doc/cnt/
    max_tf_norm and, in the round-3 format, max_tf/min_len), a
    ``(field, term) -> row range`` lookup, and a footer-parsed
    ``ParquetFile`` handle for per-row-group payload fetches.

    The footer and metadata columns are read ONCE per reader process and
    serve every query; payload bytes (docs/tfs/lens, the heavy columns)
    are fetched per ROW GROUP only when a block actually decodes —
    repeated ``pq.read_table(filters=...)`` calls would re-parse the
    footer and re-evaluate filters on every block fetch, which dominated
    cold WAND latency at 22M docs."""

    _PAYLOAD = ["docs", "tfs", "lens"]

    def __init__(self, path: str):
        self.path = path
        self.pf = pq.ParquetFile(path)
        names = self.pf.schema_arrow.names
        self.has_bounds = "max_tf" in names
        cols = ["field", "term", "min_doc", "max_doc", "cnt",
                "max_tf_norm"]
        if self.has_bounds:
            cols += ["max_tf", "min_len"]
        t = self.pf.read(columns=cols)
        self.field = t.column("field").to_numpy()
        self.min_doc = t.column("min_doc").to_numpy()
        self.max_doc = t.column("max_doc").to_numpy()
        self.cnt = t.column("cnt").to_numpy()
        self.max_tf_norm = t.column("max_tf_norm").to_numpy()
        if self.has_bounds:
            self.max_tf = t.column("max_tf").to_numpy()
            self.min_len = t.column("min_len").to_numpy()
        else:
            self.max_tf = np.zeros(t.num_rows, np.int64)
            self.min_len = np.zeros(t.num_rows, np.int64)
        # rows are (field, term, min_doc)-sorted: record each (field,
        # term) run's [start, end) once, vectorized over change points.
        # dictionary codes stand in for the strings (equal term ⇔ equal
        # code), so only the distinct-term dictionary leaves Arrow
        n = t.num_rows
        self.runs: dict[tuple[int, str], tuple[int, int]] = {}
        if n:
            import pyarrow.compute as pc

            enc = pc.dictionary_encode(t.column("term").combine_chunks())
            codes = enc.indices.to_numpy().astype(np.int64)
            dict_vals = enc.dictionary.to_pylist()
            new = np.empty(n, dtype=bool)
            new[0] = True
            new[1:] = ((self.field[1:] != self.field[:-1])
                       | (codes[1:] != codes[:-1]))
            starts = np.flatnonzero(new)
            ends = np.append(starts[1:], n)
            for s, e in zip(starts.tolist(), ends.tolist()):
                self.runs[(int(self.field[s]),
                           dict_vals[codes[s]])] = (s, e)
        # uniform row groups (last may be short): ordinal -> group is a
        # division, no per-group scan
        self._rg_rows = (self.pf.metadata.row_group(0).num_rows
                         if self.pf.metadata.num_row_groups else 1)
        from collections import OrderedDict
        self._rg_cache: OrderedDict[int, object] = OrderedDict()

    def fetch(self, blk: "LazyBlock", row: int,
              positions: bool = False) -> None:
        """Assign one block row's payload bytes from its row group
        (footer already parsed; small LRU of recently read groups).
        ``positions=True`` additionally loads the positions column —
        cached separately so position-free access paths never pay for
        the heaviest column."""
        gid = row // self._rg_rows
        key = (gid, positions)
        tbl = self._rg_cache.get(key)
        if tbl is None:
            cols = self._PAYLOAD + (["positions"] if positions else [])
            tbl = self.pf.read_row_groups([gid], columns=cols)
            self._rg_cache[key] = tbl
            if len(self._rg_cache) > 8:
                self._rg_cache.popitem(last=False)
        off = row - gid * self._rg_rows
        blk._docs_raw = tbl.column("docs")[off].as_py()
        blk._tfs_raw = tbl.column("tfs")[off].as_py()
        blk._lens_raw = tbl.column("lens")[off].as_py()
        if positions:
            blk._pos_raw = tbl.column("positions")[off].as_py()


class _BlockFetch:
    """Bound (segment index, row ordinal) loader for one LazyBlock."""

    __slots__ = ("seg", "row")

    def __init__(self, seg: _SegBlockIndex, row: int):
        self.seg, self.row = seg, row

    def __call__(self, blk: "LazyBlock", positions: bool = False) -> None:
        self.seg.fetch(blk, self.row, positions)


def _zone_value(v, arrow_type=None):
    """Map a Parquet-footer min/max into the engine's RangeQ comparison
    domain (engine._eval_range casts timestamps/dates to int64 in the
    COLUMN'S OWN UNIT and numerics to float64), so the timestamp cast
    must use the column unit — a ns column's stat converted at the
    datetime default (us) would be 1000x off and silently prune
    partitions that match.  Bools pass through; unmappable → None."""
    import datetime

    import pyarrow.types as pt

    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, datetime.datetime):
        unit = (arrow_type.unit if arrow_type is not None
                and pt.is_timestamp(arrow_type) else "us")
        return float(np.datetime64(v.replace(tzinfo=None), unit)
                     .astype(np.int64))
    if isinstance(v, datetime.date):
        return float(np.datetime64(v, "D").astype(np.int64))
    return None


_EMPTY = None


def _empty_postings() -> PostingList:
    global _EMPTY
    if _EMPTY is None:
        z = np.zeros(0, dtype=np.int64)
        _EMPTY = PostingList(z, z, z, z, z)
    return _EMPTY


class IndexReader:
    """A reader binds to the index as published at construction time: the
    base manifest plus every published epoch (incremental add,
    noise_ray/build/incremental.py).  Epoch postings/stats/docmaps are
    merged here — the multi-segment analogue of the reference's snapshot
    over one LSM (/root/reference/src/snapshot.rs:17-67)."""

    def __init__(self, index_dir: str, _is_epoch: bool = False):
        self.index_dir = index_dir
        with open(os.path.join(index_dir, MANIFEST_NAME)) as f:
            self.manifest = json.load(f)
        # manifests store index-relative paths (relocatable directory);
        # absolutize once here — older absolute-path manifests pass through
        for part in ("docmap", "segments", "stats"):
            for e in self.manifest.get(part, []):
                if not os.path.isabs(e["path"]):
                    e["path"] = os.path.join(index_dir, e["path"])
        self.fields: list[str] = self.manifest["fields"]
        self.field_id = {f: i for i, f in enumerate(self.fields)}
        self.num_buckets: int = self.manifest["num_buckets"]
        self.num_ranges: int = self.manifest["num_ranges"]
        self.field_k = {int(k): v for k, v in self.manifest["field_k"].items()}
        # ---- epochs (never nested: an epoch index has no epochs/ dir)
        self._epochs: list[IndexReader] = []
        if not _is_epoch:
            from ..build.incremental import _epoch_dirs

            self._epochs = [IndexReader(d, _is_epoch=True)
                            for d in _epoch_dirs(index_dir)]
        offset = int(self.manifest.get("doc_id_offset", 0))
        self.num_docs: int = offset + int(self.manifest["num_docs"])
        for e in self._epochs:
            self.num_docs = max(self.num_docs, e.num_docs)
            for fid, k in e.field_k.items():
                self.field_k[fid] = self.field_k.get(fid, 0) + k
        self._seg_by_gkey = {s["gkey"]: s["path"] for s in self.manifest["segments"]}
        # one stats partition per shuffle group; a bucket spans num_ranges
        # groups, so stats lookups sum across the bucket's partitions
        self._stats_by_bucket: dict[int, list[str]] = {}
        for s in self.manifest["stats"]:
            self._stats_by_bucket.setdefault(s["bucket"], []).append(s["path"])
        self._postings_cache: dict[tuple[int, str], PostingList] = {}
        self._block_cache: dict[tuple[int, str], list] = {}
        self._stats_cache: dict[tuple[int, str], tuple[int, int]] = {}
        self._docmap = list(self.manifest["docmap"])
        for e in self._epochs:
            self._docmap.extend(e._docmap)
        from collections import OrderedDict
        self._docmap_col_cache: OrderedDict = OrderedDict()
        self._docmap_cache_bytes = 0
        # tombstoned doc_ids (Lucene-style deletes: hidden from every query,
        # stats unchanged until a rebuild — the segment-tombstone design
        # SURVEY §2.10 reserves for the reference's Index::delete,
        # /root/reference/src/index.rs:164-179)
        self._tombstone_path = os.path.join(index_dir, "tombstones.json")
        self.tombstones = self._load_tombstones()
        # zone maps: per-(docmap partition, column) footer statistics
        self._zone_cache: dict[tuple[str, str], tuple] = {}
        self._docmap_meta: dict[str, "pq.FileMetaData"] = {}

    def _load_tombstones(self) -> np.ndarray:
        if os.path.exists(self._tombstone_path):
            with open(self._tombstone_path) as f:
                return np.array(sorted(set(json.load(f))), dtype=np.int64)
        return np.zeros(0, dtype=np.int64)

    def add_tombstones(self, doc_ids) -> int:
        """Mark docs deleted (atomic publish); returns live tombstone count."""
        import uuid

        merged = sorted(set(self.tombstones.tolist()) | {int(d) for d in doc_ids})
        tmp = f"{self._tombstone_path}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(merged, f)
        os.replace(tmp, self._tombstone_path)
        self.tombstones = np.array(merged, dtype=np.int64)
        return len(merged)

    def lookup_doc(self, conv_id: str, turn_idx: int) -> int | None:
        """Resolve a (key columns) identity to its doc_id (the analogue of
        the reference's I<id> lookup, src/key_builder.rs:104-109)."""
        keys = list(self.manifest["key_columns"])
        if keys[0] == "doc_id":
            # the internal doc_id column shadows a doc_id key column;
            # the SOURCE key rides as src_doc_id in the docmap
            names = pq.read_schema(self._docmap[0]["path"]).names
            if "src_doc_id" in names:
                keys[0] = "src_doc_id"
        filters = [(keys[0], "==", conv_id)]
        if len(keys) > 1:
            filters.append((keys[1], "==", turn_idx))
        best = None  # upsert semantics: the HIGHEST live doc_id wins
        for dm in self._docmap:
            t = pq.read_table(dm["path"], columns=["doc_id"], filters=filters)
            for v in t.column("doc_id").to_pylist():
                d = int(v)
                if self.tombstones.size and d in self.tombstones:
                    continue
                best = d if best is None else max(best, d)
        return best

    # ---------------------------------------------------------- postings

    def postings(self, field: str | int, term: str,
                 need_positions: bool = True,
                 doc_range: tuple[int, int] | None = None) -> PostingList:
        """Decoded postings of one (field, term).

        ``need_positions=False`` (term / boolean / range evaluation) skips
        reading AND decoding the positions column — roughly half the bytes
        of a stopword's postings.  ``doc_range=(lo, hi)`` pushes block
        bounds into the segment read (``max_doc >= lo``, ``min_doc < hi``)
        so a range-partitioned worker decodes only its slice of each
        posting list, not the whole corpus's.  Decoding is one vectorized
        pass per stream over the concatenated raw block buffers: block doc
        deltas restart absolute at each block, recovered with a
        segmented-cumsum reset rather than a per-block Python loop."""
        fid = field if isinstance(field, int) else self.field_id.get(field, -1)
        if fid < 0:
            return _empty_postings()
        key = (fid, term) if doc_range is None else (fid, term, doc_range)
        hit = self._postings_cache.get(key)
        if hit is not None and (not need_positions
                                or hit.pos_concat is not None
                                or hit.size == 0):
            return hit
        if doc_range is None:
            full = None
        else:
            # a cached full posting list serves every range for free
            full = self._postings_cache.get((fid, term))
            if full is not None and (not need_positions
                                     or full.pos_concat is not None
                                     or full.size == 0):
                return full
        bucket = term_bucket(term, self.num_buckets)
        cols = ["cnt", "docs", "tfs", "lens"]
        if need_positions:
            cols.append("positions")
        filters = [("field", "==", fid), ("term", "==", term)]
        if doc_range is not None:
            filters.append(("max_doc", ">=", doc_range[0]))
            filters.append(("min_doc", "<", doc_range[1]))
        cnts: list[int] = []
        d_bufs: list[bytes] = []
        t_bufs: list[bytes] = []
        l_bufs: list[bytes] = []
        p_bufs: list[bytes] = []
        for rng in range(self.num_ranges):
            gkey = bucket * self.num_ranges + rng
            path = self._seg_by_gkey.get(gkey)
            if path is None:
                continue
            t = pq.read_table(path, columns=cols, filters=filters)
            if t.num_rows:
                cnts.extend(t.column("cnt").to_pylist())
                d_bufs.extend(t.column("docs").to_pylist())
                t_bufs.extend(t.column("tfs").to_pylist())
                l_bufs.extend(t.column("lens").to_pylist())
                if need_positions:
                    p_bufs.extend(t.column("positions").to_pylist())
        if cnts:
            total = int(sum(cnts))
            blk_starts = np.zeros(len(cnts), dtype=np.int64)
            np.cumsum(np.asarray(cnts[:-1], dtype=np.int64),
                      out=blk_starts[1:])
            deltas = decode_varint(b"".join(d_bufs), total).astype(np.int64)
            run = np.cumsum(deltas)
            # each block's first delta is its absolute min_doc: subtract the
            # running total at each block start (valid: run is non-decreasing)
            base = np.zeros(total, dtype=np.int64)
            base[blk_starts[1:]] = run[blk_starts[1:] - 1]
            docs = run - np.maximum.accumulate(base)
            tfs = decode_varint(b"".join(t_bufs), total).astype(np.int64)
            lens = decode_varint(b"".join(l_bufs), total).astype(np.int64)
            pos = (decode_position_lists(b"".join(p_bufs), tfs)
                   if need_positions else None)
            parts = [(docs, tfs, lens, pos)]
        else:
            parts = []
        # epoch postings: every epoch's doc_ids exceed all earlier ones,
        # so appending in epoch order preserves global doc order
        for e in self._epochs:
            pl = e.postings(fid, term, need_positions, doc_range)
            if pl.size:
                parts.append((pl.docs, pl.tfs, pl.lens, pl.pos_concat))
        if not parts:
            pl = _empty_postings()
        else:
            docs = np.concatenate([p[0] for p in parts])
            tfs = np.concatenate([p[1] for p in parts])
            order_ok = (np.diff(docs) > 0).all() if docs.size > 1 else True
            if not order_ok:
                raise AssertionError(f"postings for {key} not doc-sorted")
            if need_positions:
                starts = np.zeros(tfs.size, dtype=np.int64)
                np.cumsum(tfs[:-1], out=starts[1:])
                pos_concat = np.concatenate([p[3] for p in parts])
            else:
                starts = None
                pos_concat = None
            pl = PostingList(
                docs=docs,
                tfs=tfs,
                lens=np.concatenate([p[2] for p in parts]),
                pos_concat=pos_concat,
                pos_starts=starts,
            )
        if len(self._postings_cache) < 4096 or key in self._postings_cache:
            self._postings_cache[key] = pl
        return pl

    # ------------------------------------------------- lazy posting blocks

    def _seg_index(self, path: str) -> "_SegBlockIndex":
        """Per-segment-file skip index (footer + small metadata columns),
        built once per reader and shared by every term lookup."""
        cache = getattr(self, "_seg_index_cache", None)
        if cache is None:
            cache = self._seg_index_cache = {}
        idx = cache.get(path)
        if idx is None:
            idx = cache[path] = _SegBlockIndex(path)
        return idx

    def term_blocks(self, field: str | int, term: str,
                    doc_range: tuple[int, int] | None = None
                    ) -> list["LazyBlock"]:
        """Per-block view of a term's postings with skip metadata
        (min_doc/max_doc/cnt/max_tf_norm + BM25 max_tf/min_len when the
        segment format carries them) served from the in-memory segment
        skip index; payload bytes are NOT read until a block is decoded
        (then one row-group read through the cached footer) — the
        block-max WAND access path never touches the payload of pruned
        blocks.  ``doc_range`` masks to overlapping blocks
        (block-granular like ``postings``).  Blocks are doc-range sorted
        and disjoint."""
        fid = field if isinstance(field, int) else self.field_id.get(field, -1)
        if fid < 0:
            return []
        key = (fid, term) if doc_range is None else (fid, term, doc_range)
        hit = self._block_cache.get(key)
        if hit is not None:
            return hit
        if doc_range is not None:
            full = self._block_cache.get((fid, term))
            if full is not None:
                # the cached full block list serves any range (block-granular)
                sub = [b for b in full if b.max_doc >= doc_range[0]
                       and b.min_doc < doc_range[1]]
                if len(self._block_cache) < 4096:
                    self._block_cache[key] = sub
                return sub
        blocks: list[LazyBlock] = []
        bucket = term_bucket(term, self.num_buckets)
        for rng in range(self.num_ranges):
            path = self._seg_by_gkey.get(bucket * self.num_ranges + rng)
            if path is None:
                continue
            seg = self._seg_index(path)
            run = seg.runs.get((fid, term))
            if run is None:
                continue
            s, e = run
            if doc_range is not None:
                # narrow to overlapping blocks (min_doc sorted in the run)
                s = s + int(np.searchsorted(seg.min_doc[s:e], doc_range[0],
                                            side="left"))
                # max_doc is equally sorted (blocks are disjoint)
                while s > run[0] and seg.max_doc[s - 1] >= doc_range[0]:
                    s -= 1
                e = run[0] + int(np.searchsorted(seg.min_doc[run[0]:run[1]],
                                                 doc_range[1], side="left"))
            for row in range(s, e):
                blocks.append(LazyBlock(
                    min_doc=int(seg.min_doc[row]),
                    max_doc=int(seg.max_doc[row]),
                    cnt=int(seg.cnt[row]),
                    max_tf_norm=float(seg.max_tf_norm[row]),
                    _docs_raw=None, _tfs_raw=None, _lens_raw=None,
                    max_tf=int(seg.max_tf[row]),
                    min_len=int(seg.min_len[row]),
                    _loader=_BlockFetch(seg, row),
                ))
        for e in self._epochs:
            blocks.extend(e.term_blocks(fid, term, doc_range))
        blocks.sort(key=lambda b: b.min_doc)
        if len(self._block_cache) < 4096:
            self._block_cache[key] = blocks
        return blocks

    def positions_for_docs(self, field: str | int, term: str,
                           cand: np.ndarray,
                           doc_range: tuple[int, int] | None = None
                           ) -> PostingList:
        """Positional postings of one (field, term) restricted to the
        sorted candidate doc ids ``cand`` — the phrase access path: the
        doc-set intersection (position-free, cheap) picks candidates
        first, then ONLY the blocks containing a candidate fetch and
        decode their positions payload.  A phrase pairing a rare word
        with a stopword decodes the stopword's positions for a handful
        of blocks instead of the whole corpus."""
        blocks = self.term_blocks(field, term, doc_range)
        d_p, t_p, l_p, p_p = [], [], [], []
        for bl in blocks:
            i = int(np.searchsorted(cand, bl.min_doc, side="left"))
            if i == cand.size or cand[i] > bl.max_doc:
                continue  # no candidate in this block: positions unread
            docs, tfs, lens, pos = bl.decode_with_positions()
            idx = np.searchsorted(cand, docs)
            idx[idx == cand.size] = 0  # out-of-range rows can't match
            m = cand[idx] == docs
            if not m.any():
                continue
            d_p.append(docs[m])
            t_p.append(tfs[m])
            l_p.append(lens[m])
            # gather the kept postings' position segments
            starts = np.zeros(tfs.size, dtype=np.int64)
            np.cumsum(tfs[:-1], out=starts[1:])
            keep_tfs = tfs[m]
            total = int(keep_tfs.sum())
            out_starts = np.zeros(keep_tfs.size, dtype=np.int64)
            np.cumsum(keep_tfs[:-1], out=out_starts[1:])
            take = (np.repeat(starts[m] - out_starts, keep_tfs)
                    + np.arange(total, dtype=np.int64))
            p_p.append(pos[take])
        if not d_p:
            return _empty_postings()
        docs = np.concatenate(d_p)
        tfs = np.concatenate(t_p)
        pos_starts = np.zeros(tfs.size, dtype=np.int64)
        np.cumsum(tfs[:-1], out=pos_starts[1:])
        return PostingList(docs=docs, tfs=tfs,
                           lens=np.concatenate(l_p),
                           pos_concat=np.concatenate(p_p),
                           pos_starts=pos_starts)

    # ------------------------------------------------------------- stats

    def term_stats(self, field: str | int, term: str) -> tuple[int, int]:
        """(C, K) for the scorer: C = index-wide total occurrences of the
        term under the field (the reference's merge-summed ``C`` key), K =
        the field's total (instance × distinct-stem) count (``K`` key)."""
        fid = field if isinstance(field, int) else self.field_id.get(field, -1)
        if fid < 0:
            return (0, 0)
        key = (fid, term)
        hit = self._stats_cache.get(key)
        if hit is not None:
            return hit
        bucket = term_bucket(term, self.num_buckets)
        c = 0
        for path in self._stats_by_bucket.get(bucket, ()):
            t = pq.read_table(
                path, columns=["c"],
                filters=[("field", "==", fid), ("term", "==", term)],
            )
            if t.num_rows:
                c += int(pc.sum(t.column("c")).as_py())
        for e in self._epochs:
            c += e.term_stats(fid, term)[0]
        # field_k was merged across epochs at construction time
        k = int(self.field_k.get(fid, 0))
        out = (c, k)
        self._stats_cache[key] = out
        return out

    # ------------------------------------------------------------ docmap

    # decoded docmap-column LRU budget: sized so a dictionary-encoded
    # metadata column of a ~10^7-doc index stays resident (a single string
    # column at 22M rows is ~200 MB; thrashing it re-reads every partition
    # per query)
    _DOCMAP_CACHE_CAP = 1 << 30

    def _docmap_col(self, path: str, col: str):
        """LRU-cached decoded docmap column (combine-chunked Array)."""
        key = (path, col)
        hit = self._docmap_col_cache.get(key)
        if hit is not None:
            self._docmap_col_cache.move_to_end(key)
            return hit
        arr = pq.read_table(path, columns=[col]).column(col).combine_chunks()
        self._docmap_col_cache[key] = arr
        self._docmap_cache_bytes += arr.nbytes
        while (self._docmap_cache_bytes > self._DOCMAP_CACHE_CAP
               and len(self._docmap_col_cache) > 1):
            _, old = self._docmap_col_cache.popitem(last=False)
            self._docmap_cache_bytes -= old.nbytes
        return arr

    def docmap_zone(self, path: str, col: str):
        """Zone map of one docmap partition column, read from the Parquet
        footer statistics (never the data pages): ``(vmin, vmax,
        null_count, num_rows)``.  The reference keeps a dedicated
        number/bool/null value keyspace (``f``/``T``/``F``/``N``,
        /root/reference/src/key_builder.rs:163-188); our columnar analogue
        is the min/max statistics Parquet already persists per row group —
        RangeQ evaluation prunes whole partitions on them before touching
        any data (engine._eval_range).

        ``vmin``/``vmax`` are mapped into the engine's comparison domain
        (numbers as float64; timestamps/dates as their int64 cast; bools
        kept as bools) and are None when the footer has no usable stats
        for the column — callers must then fall back to reading.
        ``null_count`` is None when unavailable."""
        key = (path, col)
        hit = self._zone_cache.get(key)
        if hit is not None:
            return hit
        md = self._docmap_meta.get(path)
        if md is None:
            md = self._docmap_meta[path] = pq.read_metadata(path)
        try:
            schema = md.schema.to_arrow_schema()
            ci = schema.names.index(col)
            arrow_type = schema.field(ci).type
        except ValueError:
            out = (None, None, None, 0)
            self._zone_cache[key] = out
            return out
        vmin = vmax = None
        null_count: int | None = 0
        rows = 0
        ok = True
        for rg in range(md.num_row_groups):
            c = md.row_group(rg).column(ci)
            rows += md.row_group(rg).num_rows
            st = c.statistics
            if st is None:
                ok = False
                null_count = None
                break
            if st.null_count is None:
                null_count = None
            elif null_count is not None:
                null_count += st.null_count
            if not st.has_min_max:
                # all-null row groups legitimately carry no min/max
                if st.null_count == md.row_group(rg).num_rows:
                    continue
                ok = False
                continue
            lo = _zone_value(st.min, arrow_type)
            hi = _zone_value(st.max, arrow_type)
            if lo is None or hi is None:
                ok = False
                continue
            import pyarrow.types as _pt

            if _pt.is_timestamp(arrow_type) and arrow_type.unit == "ns":
                # footer stats surface as datetimes (us precision): widen
                # by the truncation so boundary rows never prune away
                lo -= 1000.0
                hi += 1000.0
            vmin = lo if vmin is None else min(vmin, lo)
            vmax = hi if vmax is None else max(vmax, hi)
        out = ((vmin, vmax, null_count, rows) if ok
               else (None, None, null_count, rows))
        self._zone_cache[key] = out
        return out

    def fetch_docs(self, doc_ids: np.ndarray, columns: list[str] | None = None):
        """Materialize doc rows for result rendering (the analogue of the
        reference's V-key fetches, src/snapshot.rs:233-433).

        Docmap partitions hold contiguous doc_id ranges, so a doc's row index
        inside its partition is ``doc_id - min_doc`` — lookups are pure
        vectorized gathers on LRU-cached columns, no filter expressions.
        Rows come back in ``doc_ids`` order."""
        import pyarrow as pa

        doc_ids = np.asarray(doc_ids, dtype=np.int64)
        if columns is None:
            schema = pq.read_schema(self._docmap[0]["path"])
            columns = [n for n in schema.names if n != "doc_id"]
        sorted_ids = np.sort(doc_ids)
        col_parts: dict[str, list] = {c: [] for c in columns}
        for dm in self._docmap:
            lo, hi = dm["min_doc"], dm["max_doc"]
            s = np.searchsorted(sorted_ids, lo, side="left")
            e = np.searchsorted(sorted_ids, hi, side="right")
            if e <= s:
                continue
            idx = pa.array(sorted_ids[s:e] - lo, pa.int64())
            for c in columns:
                col_parts[c].append(self._docmap_col(dm["path"], c).take(idx))
        out = {"doc_id": pa.array(sorted_ids, pa.int64())}
        for c in columns:
            if col_parts[c]:
                out[c] = pa.concat_arrays(
                    [a if isinstance(a, pa.Array) else a.combine_chunks()
                     for a in col_parts[c]])
            else:
                out[c] = pa.array([], pa.string())
        full = pa.table(out)
        if doc_ids.size and not np.array_equal(sorted_ids, doc_ids):
            # restore caller order
            pos = np.searchsorted(sorted_ids, doc_ids)
            full = full.take(pa.array(pos, pa.int64()))
        return full

    def doc_values(self, doc_ids: np.ndarray, column: str) -> list:
        t = self.fetch_docs(doc_ids, [column])
        return t.column(column).to_pylist()
