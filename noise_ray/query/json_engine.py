"""Nested-query evaluation: the (seq, arraypath)-granular filter algebra.

The flat engine (engine.py) evaluates per doc; the reference evaluates per
DocResult = (seq, arraypath) (/root/reference/src/query.rs:21-26), with
each boolean operator comparing results truncated/zero-padded to its array
context depth (AndFilter/OrFilter resize, src/filters.rs:727-942).  This
module replicates that algebra vectorized over sorted instance-key arrays:

- a filter node evaluates to an :class:`InstSet` — unique (doc, arraypath)
  keys in ascending order with per-slot score columns and optional bind
  collections;
- ``resize(depth)`` truncates or zero-pads arraypaths; on truncation the
  FIRST instance of each surviving key keeps its scores/binds, which is
  exactly what the reference's iterator protocol observes (parents always
  consume the first result with a given truncated key; the top-level loop
  then keeps the first result per seq, src/query.rs:479-491);
- and/or intersect/union those key sets, combining scores and binds on
  equal keys (DocResult::combine);
- NOT enumerates candidates the way NotFilter walks them
  (src/filters.rs:944-1066): per doc, arraypaths (0,..,0,j) for j = 0 and
  every j below the array length at the all-zeros prefix, minus the
  negated filter's keys — j=0 needs only doc existence, j>0 needs the
  element to exist (is_a_not_match).

Scoring is the same f32 TF-IDF kernel as the flat engine, applied per
string instance (the reference scores each W key instance independently);
the final per-doc score is the first matching instance's, matching the
reference's seq-level dedup.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

import numpy as np

from ..analysis.tokenizer import tokenize
from ..build.shred import fill_vkey, parse_kp
from ..nputil import sorted_member_mask
from . import ast
from .engine import (
    F32, _Slot, _check_double_not, _is_all_not, _stem_one,
    distance_filter_stream, phrase_chain_survivors,
)
from .json_reader import InstPostings, JsonIndexReader, kp_depth


@dataclass
class InstSet:
    """Sorted unique (doc, arraypath) keys + aligned score/bind columns."""

    docs: np.ndarray            # int64 (n,)
    aps: np.ndarray             # int64 (n, depth)
    # slot ordinal -> (sum f32, count int32), aligned to rows
    slots: dict = dc_field(default_factory=dict)
    # aligned bind collections: row -> {name: [vkey, ...]} or None
    binds: list | None = None
    # per-row ITERATION rank when it differs from (doc, ap) order — only
    # the bbox filter sets this (the reference's rtree iterator yields
    # bbox order, observable in bind-variable collection order,
    # repl-tests/geojson.noise); bind collection sorts by it
    order: np.ndarray | None = None

    @property
    def size(self) -> int:
        return int(self.docs.size)

    @property
    def depth(self) -> int:
        return int(self.aps.shape[1])

    def keys(self) -> np.ndarray:
        return np.hstack([self.docs[:, None], self.aps])


class RowPack:
    """Packs (doc, arraypath) key rows into single int64 scalars so set
    ops run on 1-D arrays (union1d/intersect1d/searchsorted) instead of
    void-view ``np.unique(axis=0)`` argsorts — the profile-dominant cost
    of boolean queries.  Bit allocation follows column order, so packed
    order == lexicographic row order.  Falls back (``ok=False``) when the
    value ranges exceed 63 bits; callers then use the matrix paths."""

    __slots__ = ("ok", "shifts", "widths", "k")

    def __init__(self, mats):
        self.k = mats[0].shape[1] if mats else 0
        maxes = np.zeros(self.k, dtype=np.int64)
        ok = True
        for m in mats:
            if m.shape[0] == 0:
                continue
            if m.min() < 0:
                ok = False
                break
            maxes = np.maximum(maxes, m.max(axis=0))
        if ok:
            widths = [max(int(v).bit_length(), 1) for v in maxes]
            ok = sum(widths) <= 63
        if not ok:
            self.ok = False
            self.shifts = self.widths = None
            return
        self.ok = True
        self.widths = widths
        shifts = []
        acc = sum(widths)
        for w in widths:
            acc -= w
            shifts.append(acc)
        self.shifts = shifts

    def pack(self, mat: np.ndarray) -> np.ndarray:
        out = np.zeros(mat.shape[0], dtype=np.int64)
        for c, sh in enumerate(self.shifts):
            out |= mat[:, c] << np.int64(sh)
        return out

    def unpack(self, keys: np.ndarray) -> np.ndarray:
        out = np.empty((keys.size, self.k), dtype=np.int64)
        for c, (sh, w) in enumerate(zip(self.shifts, self.widths)):
            out[:, c] = (keys >> np.int64(sh)) & np.int64((1 << w) - 1)
        return out


def _rank_rows(mats: list[np.ndarray]):
    """Shared dense ranking of key rows across matrices: returns
    (uniq_rows, [ranks per mat]); ranks are positions into uniq_rows,
    which is lexicographically sorted."""
    pk = RowPack(mats)
    if pk.ok:
        packed = [pk.pack(m) for m in mats]
        uniq = np.unique(np.concatenate(packed)) if mats else \
            np.zeros(0, dtype=np.int64)
        return pk.unpack(uniq), [np.searchsorted(uniq, p) for p in packed]
    allm = np.vstack(mats)
    uniq, inv = np.unique(allm, axis=0, return_inverse=True)
    ranks = []
    off = 0
    for m in mats:
        ranks.append(inv[off: off + m.shape[0]])
        off += m.shape[0]
    return uniq, ranks


def _first_occurrence_mask(keys: np.ndarray) -> np.ndarray:
    n = keys.shape[0]
    if n == 0:
        return np.zeros(0, dtype=bool)
    keep = np.empty(n, dtype=bool)
    keep[0] = True
    if n > 1:
        keep[1:] = np.any(keys[1:] != keys[:-1], axis=1)
    return keep


def _gather(s: InstSet, idx: np.ndarray, docs: np.ndarray,
            aps: np.ndarray) -> InstSet:
    out = InstSet(docs, aps)
    for o, (sums, cnts) in s.slots.items():
        out.slots[o] = (sums[idx], cnts[idx])
    if s.binds is not None:
        out.binds = [s.binds[i] for i in idx]
    if s.order is not None:
        out.order = s.order[idx]
    return out


def resized(s: InstSet, depth: int) -> InstSet:
    """arraypath.resize(depth, 0) + first-instance-per-key selection."""
    d = s.depth
    if d == depth:
        return s
    if d < depth:
        aps = np.hstack([s.aps, np.zeros((s.size, depth - d),
                                         dtype=np.int64)])
        return InstSet(s.docs, aps, s.slots, s.binds, s.order)
    aps = np.ascontiguousarray(s.aps[:, :depth])
    keep = _first_occurrence_mask(np.hstack([s.docs[:, None], aps]))
    idx = np.flatnonzero(keep)
    return _gather(s, idx, s.docs[idx], aps[idx])


class LazyVkeys:
    """Deferred bind-vkey list: holds the matched instances' arraypath
    rows (in collection order) and materializes the ``fill_vkey`` strings
    only when iterated — i.e. only for docs that survive order/limit.  A
    bind query matching millions of docs with ``limit 10`` builds 10 docs'
    worth of strings instead of millions, and the distributed path ships
    a small int matrix per doc instead of string lists.  List-like where
    it matters: ``_merge_bind_rows`` iterates (materializing only at the
    rare bind-combine points) and ``RetBind`` iterates at render time."""

    __slots__ = ("kp", "aps", "_mat")

    def __init__(self, kp: str, aps: np.ndarray):
        self.kp = kp
        self.aps = aps
        self._mat = None

    def _materialize(self) -> list[str]:
        if self._mat is None:
            self._mat = [fill_vkey(self.kp, tuple(int(x) for x in row))
                         for row in self.aps]
        return self._mat

    def __iter__(self):
        return iter(self._materialize())

    def __len__(self) -> int:
        return int(self.aps.shape[0])

    def __getstate__(self):
        return (self.kp, self.aps)

    def __setstate__(self, st):
        self.kp, self.aps = st
        self._mat = None


def _merge_bind_rows(a: dict | None, b: dict | None) -> dict | None:
    if a is None:
        return b
    if b is None:
        return a
    out = {k: list(v) for k, v in a.items()}
    for k, v in b.items():
        out.setdefault(k, []).extend(v)
    return out


def _union(lr: InstSet, rr: InstSet) -> InstSet:
    """OrFilter::take_smallest with combine on equal keys
    (src/filters.rs:846-912)."""
    uniq, (l_ranks, r_ranks) = _rank_rows([lr.keys(), rr.keys()])
    out = InstSet(uniq[:, 0].copy(), np.ascontiguousarray(uniq[:, 1:]))
    n = uniq.shape[0]
    for src, ranks in ((lr, l_ranks), (rr, r_ranks)):
        for o, (sums, cnts) in src.slots.items():
            osums, ocnts = out.slots.get(o, (None, None))
            if osums is None:
                osums = np.zeros(n, dtype=F32)
                ocnts = np.zeros(n, dtype=np.int32)
                out.slots[o] = (osums, ocnts)
            # same ordinal can only come from ONE side (ordinals are
            # per-leaf), so plain scatter is exact
            osums[ranks] = sums
            ocnts[ranks] = cnts
    if lr.binds is not None or rr.binds is not None:
        binds: list = [None] * n
        for src, ranks in ((lr, l_ranks), (rr, r_ranks)):
            if src.binds is None:
                continue
            for i, rk_ in enumerate(ranks):
                binds[rk_] = _merge_bind_rows(binds[rk_], src.binds[i])
        out.binds = binds
    return out


def _intersect(sets: list[InstSet]) -> InstSet:
    """AndFilter at one depth: keys present in every set; scores/binds
    combined from each side's (first) instance (src/filters.rs:727-807)."""
    uniq, ranks = _rank_rows([s.keys() for s in sets])
    common = ranks[0]
    for r in ranks[1:]:
        common = np.intersect1d(common, r, assume_unique=True)
    docs = uniq[common, 0].copy()
    aps = np.ascontiguousarray(uniq[common, 1:])
    out = InstSet(docs, aps)
    any_binds = any(s.binds is not None for s in sets)
    if any_binds:
        out.binds = [None] * common.size
    for s, r in zip(sets, ranks):
        idx = np.searchsorted(r, common)
        for o, (sums, cnts) in s.slots.items():
            out.slots[o] = (sums[idx], cnts[idx])
        if s.binds is not None:
            for j, i in enumerate(idx):
                out.binds[j] = _merge_bind_rows(out.binds[j], s.binds[i])
    return out


class _PLShim:
    """Posting-like view whose ``docs`` are instance ordinals — feeds the
    shared phrase/proximity kernels (engine.py)."""

    __slots__ = ("docs", "tfs", "lens", "pos_concat", "pos_starts")

    def __init__(self, ordinals, pl: InstPostings):
        self.docs = ordinals
        self.tfs = pl.tfs
        self.lens = pl.lens
        self.pos_concat = pl.pos_concat
        self.pos_starts = pl.pos_starts

    @property
    def size(self) -> int:
        return int(self.docs.size)

    def positions_of(self, i: int) -> np.ndarray:
        s = self.pos_starts[i]
        return self.pos_concat[s:s + self.tfs[i]]


def _ordinalize(pls: list[InstPostings]):
    """Shared (doc, arraypath) → dense ordinal mapping across posting
    lists of the same keypath; returns (shims, key_matrix) where
    key_matrix[ordinal] = (doc, *ap)."""
    mats = [np.hstack([pl.docs[:, None], pl.aps]) for pl in pls]
    uniq, ranks = _rank_rows(mats)
    shims = [_PLShim(r, pl) for r, pl in zip(ranks, pls)]
    return shims, uniq


class CompiledJsonQuery:
    """Nested-index analogue of engine.CompiledQuery.  ``doc_range``
    restricts evaluation to a doc_id interval (exact under range
    partitioning: every filter and score is per-doc independent)."""

    def __init__(self, reader: JsonIndexReader, node: ast.Node,
                 doc_range: tuple[int, int] | None = None):
        self.reader = reader
        self.node = node
        self.doc_range = doc_range
        self.num_slots = 0
        self.sum_idf_sq = F32(0.0)
        self._prepare(node)
        if self.num_slots > 0:
            with np.errstate(divide="ignore"):
                self.query_norm = F32(1.0) / self.sum_idf_sq
        else:
            self.query_norm = F32(0.0)

    # -------------------------------------------------- prepare (slots)

    def _new_slot(self, idf: F32, boost: float) -> _Slot:
        s = _Slot(self.num_slots, idf, boost)
        self.num_slots += 1
        self.sum_idf_sq = F32(self.sum_idf_sq + F32(idf * idf))
        return s

    def _idf(self, kp: str, term: str) -> F32:
        c, k = self.reader.term_stats(kp, term)
        with np.errstate(divide="ignore"):
            return F32(F32(1.0) + np.log(F32(k) / (F32(c) + F32(1.0))))

    def _prepare(self, node: ast.Node):
        if isinstance(node, ast.Term):
            node._slot = self._new_slot(
                self._idf(node.field, _stem_one(node.word)), node.boost)
        elif isinstance(node, (ast.Phrase, ast.Proximity)):
            node._terms = [t for _, t in tokenize(node.text)]
            node._slots = [
                self._new_slot(self._idf(node.field, t), node.boost)
                for t in node._terms
            ]
        elif isinstance(node, (ast.Exact, ast.RangeQ, ast.BboxQ)):
            node._slot = self._new_slot(F32(1.0), 1.0)
        elif isinstance(node, ast.AllDocs):
            self._new_slot(F32(1.0), 1.0)
        elif isinstance(node, ast.And):
            for c in node.clauses:
                self._prepare(c)
        elif isinstance(node, ast.Or):
            self._prepare(node.left)
            self._prepare(node.right)
        elif isinstance(node, ast.Not):
            pass  # NotFilter.prepare_relevancy_scoring is a no-op
        elif isinstance(node, (ast.Boost, ast.Bind)):
            self._prepare(node.inner)
        else:
            raise TypeError(f"unknown node {node!r}")

    # ------------------------------------------------------- evaluation

    def evaluate(self) -> InstSet:
        # double-not before all-not: error precedence matches the
        # reference (src/query.rs:220-228)
        _check_double_not(self.node, False)
        if _is_all_not(self.node):
            raise ValueError(
                "query cannot be made up of only logical not. Must have at "
                "least one match clause not negated.")
        return resized(self._eval(self.node), 0)

    def _postings(self, kp: str, term: str,
                  need_positions: bool = True,
                  span: tuple[int, int] | None = None) -> InstPostings:
        """``span`` narrows the read beyond the compiled doc_range (the
        allowed-candidates span of an enclosing AND): block bounds push
        into the segment read, then the decoded list is sliced exactly."""
        rng = self.doc_range
        if span is not None:
            if rng is None:
                rng = span
            else:
                rng = (max(rng[0], span[0]), min(rng[1], span[1]))
            if rng[0] >= rng[1]:
                from .json_reader import _empty_inst, kp_depth as _kd

                return _empty_inst(_kd(kp))
        pl = self.reader.postings(kp, term, need_positions, rng)
        if rng is not None:
            pl = pl.slice_range(*rng)
        return pl

    def _doc_universe(self) -> np.ndarray:
        lo, hi = (self.doc_range if self.doc_range is not None
                  else (0, self.reader.num_docs))
        u = np.arange(lo, hi, dtype=np.int64)
        t = self.reader.tombstones
        if t.size:
            u = np.setdiff1d(u, t, assume_unique=True)
        return u

    def _term_scores(self, tfs, lens, slot: _Slot) -> np.ndarray:
        tf = np.sqrt(tfs.astype(F32))
        norm = F32(1.0) / np.sqrt(lens.astype(F32))
        return ((slot.idf * slot.idf) * tf * norm
                * F32(slot.boost)).astype(F32)

    _LEAVES = (ast.Term, ast.Phrase, ast.Proximity, ast.Exact,
               ast.RangeQ, ast.BboxQ)

    def _drop_dead(self, r: InstSet) -> InstSet:
        """Filter tombstoned docs out of a leaf result (slots/binds stay
        aligned) — compositions inherit the exclusion because every leaf
        and the universe exclude them (same design as the flat engine)."""
        t = self.reader.tombstones
        if t.size == 0 or r.size == 0:
            return r
        keep = ~sorted_member_mask(t, r.docs)
        if keep.all():
            return r
        idx = np.flatnonzero(keep)
        return _gather(r, idx, r.docs[idx], r.aps[idx])

    def _eval(self, node: ast.Node,
              allowed: np.ndarray | None = None) -> InstSet:
        """``allowed`` is a sorted array of LIVE doc ids that the result
        will be intersected with at doc level by an enclosing AND — a
        pure pruning hint.  Restricting any subtree to a doc SUPERSET of
        the final intersection is exact (scores and binds of surviving
        instances are computed from their own postings/values either
        way), and it turns the classic leapfrog advantage of the
        reference's AndFilter into candidate pushdown: the selective
        side evaluates first and the unselective side (a low-selectivity
        exact match is otherwise a corpus-wide values scan) only touches
        the candidates' doc span."""
        r = self._eval_node(node, allowed)
        if isinstance(node, self._LEAVES):
            r = self._drop_dead(r)
        return r

    @staticmethod
    def _restrict(r: InstSet, allowed: np.ndarray | None) -> InstSet:
        if allowed is None or r.size == 0:
            return r
        keep = sorted_member_mask(allowed, r.docs)
        if keep.all():
            return r
        idx = np.flatnonzero(keep)
        return _gather(r, idx, r.docs[idx], r.aps[idx])

    @staticmethod
    def _span_of(allowed: np.ndarray | None):
        if allowed is None:
            return None
        if allowed.size == 0:
            return (0, 0)
        return (int(allowed[0]), int(allowed[-1]) + 1)

    def _eval_node(self, node: ast.Node,
                   allowed: np.ndarray | None = None) -> InstSet:
        if isinstance(node, ast.Term):
            pl = self._postings(node.field, _stem_one(node.word),
                                need_positions=False,
                                span=self._span_of(allowed))
            r = InstSet(pl.docs, pl.aps)
            slot = getattr(node, "_slot", None)
            if slot is not None and not np.isnan(slot.idf):
                r.slots[slot.ordinal] = (
                    self._term_scores(pl.tfs, pl.lens, slot),
                    np.ones(pl.size, dtype=np.int32))
            return self._restrict(r, allowed)

        if isinstance(node, ast.Phrase):
            return self._restrict(self._eval_phrase(node, allowed), allowed)

        if isinstance(node, ast.Proximity):
            return self._restrict(self._eval_proximity(node, allowed),
                                  allowed)

        if isinstance(node, ast.Exact):
            return self._eval_exact(node, allowed)

        if isinstance(node, ast.RangeQ):
            return self._eval_range(node, allowed)

        if isinstance(node, ast.BboxQ):
            return self._eval_bbox(node, allowed)

        if isinstance(node, ast.AllDocs):
            docs = allowed if allowed is not None else self._doc_universe()
            r = InstSet(docs, np.zeros((docs.size, 0), dtype=np.int64))
            # ordinal 1 hardcoded, like the reference (src/filters.rs:58-63)
            r.slots[1] = (np.ones(docs.size, dtype=F32),
                          np.ones(docs.size, dtype=np.int32))
            return r

        if isinstance(node, ast.Boost):
            r = self._eval(node.inner, allowed)  # keeps binds + order
            for o, (s, c) in r.slots.items():
                r.slots[o] = ((s * F32(node.factor)).astype(F32), c)
            return r

        if isinstance(node, ast.And):
            # evaluate selective children first and thread the shrinking
            # candidate-doc set into the rest — the vectorized form of
            # AndFilter's leapfrog (results are identical: restricting a
            # side to a doc superset of the intersection is exact)
            order = sorted(range(len(node.clauses)),
                           key=lambda i: _sel_rank(node.clauses[i]))
            sets: list = [None] * len(node.clauses)
            cur = allowed
            for i in order:
                r = resized(self._eval(node.clauses[i], cur), node.depth)
                sets[i] = r
                docs = np.unique(r.docs)
                cur = docs if cur is None else \
                    np.intersect1d(cur, docs, assume_unique=True)
            return _intersect(sets)

        if isinstance(node, ast.Or):
            lr = resized(self._eval(node.left, allowed), node.depth)
            rr = resized(self._eval(node.right, allowed), node.depth)
            return _union(lr, rr)

        if isinstance(node, ast.Not):
            return self._eval_not(node, allowed)

        if isinstance(node, ast.Bind):
            return self._eval_bind(node, allowed)

        raise TypeError(f"unknown node {node!r}")

    # ---------------------------------------------------------- phrase

    def _phrase_meta(self, node):
        terms = getattr(node, "_terms", None)
        if terms is None:
            terms = [t for _, t in tokenize(node.text)]
            node._terms = terms
        slots = getattr(node, "_slots", None)
        if slots is None:
            slots = [_Slot(-1, F32(np.nan), 1.0) for _ in terms]
            node._slots = slots
        return terms, slots

    def _phrase_candidates(self, kp: str, terms: list[str],
                           allowed: np.ndarray | None = None):
        """(surviving ordinals, ordinal→key matrix, shims) — the
        instance-granular phrase chain: instances align by
        (doc, arraypath), exactly the StemmedPhraseFilter equality test
        on DocResults."""
        span = self._span_of(allowed)
        pls = [self._postings(kp, t, span=span) for t in terms]
        shims, keymat = _ordinalize(pls)
        cand = shims[0].docs
        for s in shims[1:]:
            cand = np.intersect1d(cand, s.docs, assume_unique=True)
        if cand.size and len(shims) > 1:
            surv = phrase_chain_survivors(shims, cand)
            cand = cand[surv]
        return cand, keymat, shims

    def _eval_phrase(self, node: ast.Phrase,
                     allowed: np.ndarray | None = None) -> InstSet:
        terms, slots = self._phrase_meta(node)
        if len(terms) == 1:
            pl = self._postings(node.field, terms[0], need_positions=False,
                                span=self._span_of(allowed))
            r = InstSet(pl.docs, pl.aps)
            if not np.isnan(slots[0].idf):
                r.slots[slots[0].ordinal] = (
                    self._term_scores(pl.tfs, pl.lens, slots[0]),
                    np.ones(pl.size, dtype=np.int32))
            return r
        cand, keymat, shims = self._phrase_candidates(node.field, terms,
                                                      allowed)
        keys = keymat[cand]
        r = InstSet(keys[:, 0].copy(), np.ascontiguousarray(keys[:, 1:]))
        if cand.size and not np.isnan(slots[0].idf):
            # only filters[0]'s DocResult survives the leapfrog
            idx0 = np.searchsorted(shims[0].docs, cand)
            scores0 = self._term_scores(shims[0].tfs, shims[0].lens,
                                        slots[0])
            r.slots[slots[0].ordinal] = (
                scores0[idx0], np.ones(cand.size, np.int32))
        return r

    # ----------------------------------------------------------- exact

    def _eval_exact(self, node: ast.Exact,
                    allowed: np.ndarray | None = None) -> InstSet:
        terms = [t for _, t in tokenize(node.literal)]
        cand, keymat, _shims = self._phrase_candidates(node.field, terms,
                                                       allowed)
        keys = keymat[cand]
        if allowed is not None and keys.shape[0]:
            keep = np.searchsorted(allowed, keys[:, 0])
            keep[keep >= allowed.size] = max(allowed.size - 1, 0)
            keys = keys[allowed[keep] == keys[:, 0]] if allowed.size \
                else keys[:0]
        if keys.shape[0]:
            if allowed is not None:
                vdocs, vaps, vcodes, _vnums, vstrs, _vb = \
                    self.reader.values_kp_for_docs(
                        node.field, np.unique(keys[:, 0]))
            else:
                vdocs, vaps, vcodes, _vnums, vstrs, _vb = \
                    self.reader.values_kp(node.field, self.doc_range)
            # restrict the value rows to matching strings FIRST, then a
            # sorted-rank membership test locates the candidates whose
            # stored value equals the literal (the phrase filter already
            # guarantees the value exists and is a string,
            # src/filters.rs:316-339)
            eq = (vcodes == "s") & (np.asarray(vstrs, dtype=object)
                                    == node.literal)
            vk = np.hstack([vdocs[eq][:, None], vaps[eq]])
            keep = _rows_in(keys, vk)
            keys = keys[keep]
        r = InstSet(keys[:, 0].copy(), np.ascontiguousarray(keys[:, 1:]))
        slot = getattr(node, "_slot", None)
        if slot is not None:
            n = keys.shape[0]
            r.slots[slot.ordinal] = (np.ones(n, dtype=F32),
                                     np.ones(n, dtype=np.int32))
        return r

    # ----------------------------------------------------------- range

    def _eval_range(self, node: ast.RangeQ,
                    allowed: np.ndarray | None = None) -> InstSet:
        if allowed is not None:
            docs, aps, codes, nums, _strs, _vb = \
                self.reader.values_kp_for_docs(node.field, allowed)
        else:
            docs, aps, codes, nums, _strs, _vb = self.reader.values_kp(
                node.field, self.doc_range)
        if node.special == "true":
            mask = codes == "T"
        elif node.special == "false":
            mask = codes == "F"
        elif node.special == "null":
            mask = codes == "N"
        else:
            mask = codes == "f"
            if node.min is not None:
                m = (nums >= node.min if node.min_inclusive
                     else nums > node.min)
                mask = mask & np.where(np.isnan(nums), False, m)
            if node.max is not None:
                m = (nums <= node.max if node.max_inclusive
                     else nums < node.max)
                mask = mask & np.where(np.isnan(nums), False, m)
        r = InstSet(docs[mask], aps[mask])
        slot = getattr(node, "_slot", None)
        if slot is not None:
            n = r.size
            r.slots[slot.ordinal] = (np.ones(n, dtype=F32),
                                     np.ones(n, dtype=np.int32))
        return r

    def _eval_bbox(self, node: ast.BboxQ,
                   allowed: np.ndarray | None = None) -> InstSet:
        """BboxFilter (src/filters.rs:503-586): stored boxes intersecting
        the query box.  ``order`` records the rtree-iteration rank — the
        rtree column family orders entries by their box, so within a doc
        results stream in bbox order, not arraypath order."""
        if allowed is not None:
            # candidate pushdown from a selective AND sibling: a doc-keyed
            # read beats a space-keyed one when candidates are few
            docs, aps, codes, _nums, _strs, bboxes = \
                self.reader.values_kp_for_docs(node.field, allowed)
            mask = codes == "r"
        else:
            # grid-bucketed read (build/spatial.py): only cells the query
            # box touches are materialized; candidates only, so the exact
            # predicate below still decides
            docs, aps, bboxes = self.reader.bbox_rows(
                node.field, (node.west, node.east, node.south, node.north),
                self.doc_range)
            mask = np.ones(docs.size, dtype=bool)
        if mask.any():
            w, e = bboxes[:, 0], bboxes[:, 1]
            s_, n_ = bboxes[:, 2], bboxes[:, 3]
            mask = mask & (w <= node.east) & (e >= node.west) \
                & (s_ <= node.north) & (n_ >= node.south)
        docs = docs[mask]
        aps = aps[mask]
        bb = bboxes[mask]
        r = InstSet(docs, aps)
        if docs.size:
            # rank within each doc by (west, east, south, north)
            rank = np.lexsort((bb[:, 3], bb[:, 2], bb[:, 1], bb[:, 0],
                               docs))
            order = np.empty(docs.size, dtype=np.int64)
            order[rank] = np.arange(docs.size)
            r.order = order
        slot = getattr(node, "_slot", None)
        if slot is not None:
            n = r.size
            r.slots[slot.ordinal] = (np.ones(n, dtype=F32),
                                     np.ones(n, dtype=np.int32))
        return r

    # ------------------------------------------------------- proximity

    def _eval_proximity(self, node: ast.Proximity,
                        allowed: np.ndarray | None = None) -> InstSet:
        terms, slots = self._phrase_meta(node)
        span = self._span_of(allowed)
        pls = [self._postings(node.field, t, span=span) for t in terms]
        shims, keymat = _ordinalize(pls)
        score_arrays = [
            None if np.isnan(s.idf)
            else self._term_scores(sh.tfs, sh.lens, s)
            for sh, s in zip(shims, slots)
        ]
        out_keys, out_slot, out_score = distance_filter_stream(
            shims, score_arrays, node.distance)
        keys = keymat[np.array(out_keys, dtype=np.int64)] if out_keys \
            else keymat[:0]
        r = InstSet(keys[:, 0].copy(), np.ascontiguousarray(keys[:, 1:]))
        n = keys.shape[0]
        for t in range(len(shims)):
            mask = np.array([s == t for s in out_slot], dtype=bool)
            if mask.any() and score_arrays[t] is not None:
                sums = np.zeros(n, dtype=F32)
                cnts = np.zeros(n, dtype=np.int32)
                sums[mask] = np.array(out_score, dtype=F32)[mask]
                cnts[mask] = 1
                r.slots[slots[t].ordinal] = (sums, cnts)
        return r

    # --------------------------------------------------------------- not

    def _eval_not(self, node: ast.Not,
                  allowed: np.ndarray | None = None) -> InstSet:
        inner = resized(self._eval(node.inner, allowed), node.depth)
        docs = allowed if allowed is not None else self._doc_universe()
        d = node.depth
        if d == 0:
            if inner.size:
                pos = np.searchsorted(docs, inner.docs)
                pos = pos[pos < docs.size]
                mask = np.ones(docs.size, dtype=bool)
                # inner docs are live (leaves drop tombstones), so every
                # searchsorted position is an exact hit
                mask[pos] = False
            else:
                mask = np.ones(docs.size, dtype=bool)
            out_docs = docs[mask]
            return InstSet(out_docs,
                           np.zeros((out_docs.size, 0), dtype=np.int64))
        # candidate walk per doc: j = 0 always (doc existence only), plus
        # j in [1, L) where L is the array length at the all-zeros prefix
        # (src/filters.rs:964-993); minus the negated filter's keys with
        # all-zero middle dims.
        segs = parse_kp(node.kp)
        rng = self.doc_range
        span = self._span_of(allowed)
        if span is not None:
            rng = span if rng is None else (max(rng[0], span[0]),
                                            min(rng[1], span[1]))
        ldocs, lens = self.reader.zero_prefix_lengths(segs, rng)
        L = np.ones(docs.size, dtype=np.int64)  # j=0 candidate for all
        if ldocs.size:
            # ldocs may contain docs NOT in the universe (tombstoned):
            # scatter only exact hits, or a dead doc's array length lands
            # on whichever live doc sorts next
            pos = np.searchsorted(docs, ldocs)
            ok = pos < docs.size
            ok[ok] = docs[pos[ok]] == ldocs[ok]
            L[pos[ok]] = np.maximum(lens[ok], 1)
        total = int(L.sum())
        cand_docs = np.repeat(docs, L)
        ends = np.cumsum(L)
        cand_j = np.arange(total, dtype=np.int64) - np.repeat(ends - L, L)
        cand_aps = np.zeros((total, d), dtype=np.int64)
        cand_aps[:, d - 1] = cand_j
        if inner.size:
            mid_zero = (np.all(inner.aps[:, : d - 1] == 0, axis=1)
                        if d > 1 else np.ones(inner.size, dtype=bool))
            keep = ~_rows_in(
                np.column_stack([cand_docs, cand_j]),
                np.column_stack([inner.docs[mid_zero],
                                 inner.aps[mid_zero, d - 1]]))
            cand_docs = cand_docs[keep]
            cand_aps = cand_aps[keep]
        return InstSet(cand_docs, cand_aps)

    # -------------------------------------------------------------- bind

    def _eval_bind(self, node: ast.Bind,
                   allowed: np.ndarray | None = None) -> InstSet:
        inner = self._eval(node.inner, allowed)
        if inner.size == 0:
            return inner
        # one row per doc: the first instance's key/scores; vkeys of ALL
        # the doc's instances collected in order (collect_results,
        # src/filters.rs:1091-1105)
        first = np.empty(inner.size, dtype=bool)
        first[0] = True
        first[1:] = inner.docs[1:] != inner.docs[:-1]
        starts = np.flatnonzero(first)
        counts = np.diff(np.append(starts, inner.size))
        d = node.depth
        if inner.depth < d:
            ap_mat = np.hstack([
                inner.aps,
                np.zeros((inner.size, d - inner.depth), dtype=np.int64)])
        else:
            ap_mat = inner.aps[:, :d]
        binds: list = []
        for s, c in zip(starts, counts):
            sl = np.arange(s, s + c)
            if inner.order is not None:
                # collect in the inner filter's ITERATION order (bbox
                # results stream in rtree/bbox order, geojson.noise)
                sl = sl[np.argsort(inner.order[sl], kind="stable")]
            row = {node.name: LazyVkeys(node.kp, ap_mat[sl])}
            if inner.binds is not None and inner.binds[s] is not None:
                row = _merge_bind_rows(dict(inner.binds[s]), row)
            binds.append(row)
        idx = starts
        out = _gather(inner, idx, inner.docs[idx], inner.aps[idx])
        out.binds = binds
        return out

    # ---------------------------------------------------- final scores

    def final_scores(self, result: InstSet) -> np.ndarray:
        """compute_relevancy_score vectorized (src/query.rs:463-477)."""
        n = result.size
        if self.num_slots == 0:
            return np.zeros(n, dtype=F32)
        acc = np.zeros(n, dtype=F32)
        matched = np.zeros(n, dtype=np.int32)
        for o in sorted(result.slots):
            s, c = result.slots[o]
            has = c > 0
            with np.errstate(invalid="ignore", divide="ignore"):
                contrib = np.where(has, s / c.astype(F32),
                                   F32(0.0)).astype(F32)
            acc = (acc + contrib).astype(F32)
            matched += has.astype(np.int32)
        return ((self.query_norm * acc).astype(F32)
                * matched.astype(F32) / F32(self.num_slots)).astype(F32)


def _sel_rank(node) -> int:
    """Evaluation-order heuristic for AND children: postings-backed
    leaves (bounded by their term's document frequency) before
    values-scan leaves, with the corpus-wide NOT/AllDocs last."""
    while isinstance(node, ast.Boost):
        node = node.inner
    if isinstance(node, (ast.Term, ast.Phrase, ast.Proximity)):
        return 0
    if isinstance(node, ast.BboxQ):
        return 1
    if isinstance(node, ast.RangeQ):
        return 2
    if isinstance(node, ast.Exact):
        return 3
    if isinstance(node, (ast.And, ast.Or, ast.Bind)):
        return 4
    if isinstance(node, ast.AllDocs):
        return 5
    return 6


def _rows_in(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Per-row membership of a's rows in b's rows (int64, same width)."""
    if b.shape[0] == 0:
        return np.zeros(a.shape[0], dtype=bool)
    _, (a_ranks, b_ranks) = _rank_rows([a, b])
    return np.isin(a_ranks, np.unique(b_ranks))


