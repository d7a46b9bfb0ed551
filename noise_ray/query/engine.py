"""Query evaluation with exact (float32) reference score parity.

Replicates the reference's filter algebra and TF-IDF scoring operation for
operation:

- scorer init/idf:        /root/reference/src/snapshot.rs:132-151
  ``idf = 1 + ln(K / (C + 1))`` in f32, where C is the merge-summed total
  occurrence count of the term under the keypath and K the field's total
  (instance × distinct-stem) count.
- per-match score:        /root/reference/src/snapshot.rs:169-183
  ``idf² · sqrt(tf) · (1/sqrt(field_len)) · boost`` in f32.
- query norm + final:     /root/reference/src/query.rs:348-361, 463-477
  ``query_norm = 1/Σ idf²``;
  ``score = query_norm · Σ_slot (sum/count) · matched / num_slots``.

Slot bookkeeping mirrors ``DocResult.scores`` (src/query.rs:60-66): each
scoring leaf gets an ordinal in prepare (DFS) order; phrase/proximity give
one slot per word but only the "base" filter's slot receives contributions
(StemmedPhraseFilter keeps only filters[0]'s DocResult,
src/filters.rs:175-272; DistanceFilter keeps whichever filter last became
base, src/filters.rs:588-726 — replicated sequentially below).

Evaluation is vectorized: posting lists are numpy arrays; and/or/not are
sorted-array set operations; only the proximity filter runs the reference's
stateful leapfrog literally (its result stream depends on iterator state).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

import numpy as np

from ..analysis.tokenizer import tokenize
from . import ast
from .reader import IndexReader, PostingList

F32 = np.float32


@dataclass
class _Slot:
    ordinal: int
    idf: F32  # may be -inf; NaN disables scoring (uninitialized scorer)
    boost: float


@dataclass
class EvalResult:
    docs: np.ndarray  # int64 ascending
    # slot ordinal -> (sum f32 aligned to docs, count int32 aligned to docs)
    slots: dict[int, tuple[np.ndarray, np.ndarray]] = dc_field(default_factory=dict)


class CompiledQuery:
    """``doc_range=(lo, hi)`` restricts evaluation to that doc_id interval
    — exact under range partitioning because every filter and score is
    per-doc independent (the basis of the distributed query fan-out)."""

    def __init__(self, reader: IndexReader, node: ast.Node,
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

    def _idf(self, field: str, term: str) -> F32:
        c, k = self.reader.term_stats(field, term)
        with np.errstate(divide="ignore"):
            return F32(F32(1.0) + np.log(F32(k) / (F32(c) + F32(1.0))))

    def _prepare(self, node: ast.Node):
        """DFS ordinal assignment, mirroring prepare_relevancy_scoring."""
        if isinstance(node, ast.Term):
            node._slot = self._new_slot(self._idf(node.field, _stem_one(node.word)), node.boost)
        elif isinstance(node, (ast.Phrase, ast.Proximity)):
            node._terms = [t for _, t in tokenize(node.text)]
            node._slots = [
                self._new_slot(self._idf(node.field, t), node.boost)
                for t in node._terms
            ]
        elif isinstance(node, ast.Exact):
            # binary-scored: ordinal with idf contribution 1.0
            # (src/filters.rs:363-368); inner word scorers stay uninitialized.
            node._slot = self._new_slot(F32(1.0), 1.0)
        elif isinstance(node, ast.RangeQ):
            node._slot = self._new_slot(F32(1.0), 1.0)  # src/filters.rs:487-492
        elif isinstance(node, ast.AllDocs):
            self._new_slot(F32(1.0), 1.0)  # src/filters.rs:66-70
        elif isinstance(node, ast.And):
            for c in node.clauses:
                self._prepare(c)
        elif isinstance(node, ast.Or):
            self._prepare(node.left)
            self._prepare(node.right)
        elif isinstance(node, ast.Not):
            pass  # NotFilter.prepare_relevancy_scoring is a no-op
        elif isinstance(node, ast.Boost):
            self._prepare(node.inner)
        else:
            raise TypeError(f"unknown node {node!r}")

    # ------------------------------------------------------- evaluation

    def evaluate(self) -> EvalResult:
        self._check_not_validity(self.node)
        return self._eval(self.node)

    def _drop_dead(self, r: EvalResult) -> EvalResult:
        """Filter tombstoned docs out of a leaf result (slots stay
        aligned).  Compositions (and/or/not) inherit the exclusion because
        every leaf and the universe exclude them."""
        t = self.reader.tombstones
        if t.size == 0 or r.docs.size == 0:
            return r
        pos = np.searchsorted(t, r.docs)
        pos[pos >= t.size] = t.size - 1
        keep = t[pos] != r.docs
        if keep.all():
            return r
        out = EvalResult(r.docs[keep])
        for o, (s, c) in r.slots.items():
            out.slots[o] = (s[keep], c[keep])
        return out

    def _check_not_validity(self, node: ast.Node):
        if _is_all_not(node):
            raise ValueError(
                "query must contain at least one full match expression"
            )  # src/query.rs:222-228
        _check_double_not(node, False)  # src/filters.rs:1051-1061

    def _postings(self, field: str, term: str,
                  need_positions: bool = True) -> PostingList:
        # the doc range is pushed into the segment read (block-bound
        # filters), then sliced exactly — a range worker never decodes
        # another range's postings
        pl = self.reader.postings(field, term, need_positions,
                                  self.doc_range)
        if self.doc_range is not None:
            pl = pl.slice_range(*self.doc_range)
        return pl

    def _universe(self) -> np.ndarray:
        lo, hi = (self.doc_range if self.doc_range is not None
                  else (0, self.reader.num_docs))
        u = np.arange(lo, hi, dtype=np.int64)
        t = self.reader.tombstones
        if t.size:
            u = np.setdiff1d(u, t, assume_unique=True)
        return u

    def _term_scores(self, pl: PostingList, slot: _Slot) -> np.ndarray:
        """Vectorized add_match_score over a posting list (f32)."""
        tf = np.sqrt(pl.tfs.astype(F32))
        norm = F32(1.0) / np.sqrt(pl.lens.astype(F32))
        return ((slot.idf * slot.idf) * tf * norm * F32(slot.boost)).astype(F32)

    _LEAVES = (ast.Term, ast.Phrase, ast.Proximity, ast.Exact, ast.RangeQ)

    def _eval(self, node: ast.Node) -> EvalResult:
        r = self._eval_node(node)
        if isinstance(node, self._LEAVES):
            r = self._drop_dead(r)
        return r

    def _eval_node(self, node: ast.Node) -> EvalResult:
        reader = self.reader
        if isinstance(node, ast.Term):
            # positions are never consulted for a single-term match
            pl = self._postings(node.field, _stem_one(node.word),
                                need_positions=False)
            r = EvalResult(pl.docs)
            slot = getattr(node, "_slot", None)  # None inside Not: unscored
            if slot is not None and not np.isnan(slot.idf):
                r.slots[slot.ordinal] = (
                    self._term_scores(pl, slot),
                    np.ones(pl.size, dtype=np.int32),
                )
            return r

        if isinstance(node, ast.Phrase):
            return self._eval_phrase(node)

        if isinstance(node, ast.Proximity):
            return self._eval_proximity(node)

        if isinstance(node, ast.Exact):
            return self._eval_exact(node)

        if isinstance(node, ast.RangeQ):
            return self._eval_range(node)

        if isinstance(node, ast.AllDocs):
            docs = self._universe()
            r = EvalResult(docs)
            # the reference hardcodes ordinal 1 here (src/filters.rs:58-63)
            r.slots[1] = (np.ones(docs.size, dtype=F32),
                          np.ones(docs.size, dtype=np.int32))
            return r

        if isinstance(node, ast.Boost):
            r = self._eval(node.inner)
            for o, (s, c) in r.slots.items():
                r.slots[o] = ((s * F32(node.factor)).astype(F32), c)
            return r

        if isinstance(node, ast.Or):
            lr = self._eval(node.left)
            rr = self._eval(node.right)
            docs = np.union1d(lr.docs, rr.docs)
            out = EvalResult(docs)
            for src in (lr, rr):
                if not src.slots:
                    continue
                idx = np.searchsorted(docs, src.docs)
                for o, (s, c) in src.slots.items():
                    sums = np.zeros(docs.size, dtype=F32)
                    cnts = np.zeros(docs.size, dtype=np.int32)
                    sums[idx] = s
                    cnts[idx] = c
                    out.slots[o] = (sums, cnts)
            return out

        if isinstance(node, ast.And):
            positives = [c for c in node.clauses if not _is_all_not(c)]
            negatives = [c for c in node.clauses if _is_all_not(c)]
            if positives:
                results = [self._eval(c) for c in positives]
                docs = results[0].docs
                for r in results[1:]:
                    docs = np.intersect1d(docs, r.docs, assume_unique=True)
            else:
                docs = self._universe()
                results = []
            for c in negatives:
                ndocs = self._not_docs(c)  # complement of the negated match
                docs = docs[np.isin(docs, ndocs)]
            out = EvalResult(docs)
            for r in results:
                if not r.slots:
                    continue
                idx = np.searchsorted(r.docs, docs)
                # docs ⊆ r.docs, so idx addresses exact matches
                for o, (s, c) in r.slots.items():
                    out.slots[o] = (s[idx], c[idx])
            return out

        if isinstance(node, ast.Not):
            return EvalResult(self._not_docs(node))

        raise TypeError(f"unknown node {node!r}")

    def _not_docs(self, node: ast.Node) -> np.ndarray:
        """Complement over the doc universe (NotFilter,
        src/filters.rs:944-1066).  Boolean-mask complement: O(N) with no
        sort and no arange+setdiff materialization — at 10^7+ docs the
        sort-based set difference dominated whole queries."""
        if isinstance(node, ast.Not):
            inner = self._eval(node.inner).docs
        else:
            inner = self._eval(node).docs
        lo, hi = (self.doc_range if self.doc_range is not None
                  else (0, self.reader.num_docs))
        mask = np.ones(hi - lo, dtype=bool)
        if inner.size:
            mask[inner - lo] = False
        t = self.reader.tombstones
        if t.size:
            tt = t[(t >= lo) & (t < hi)]
            mask[tt - lo] = False
        return np.flatnonzero(mask) + lo

    # ---------------------------------------------------------- phrase

    def _phrase_meta(self, node):
        """(terms, slots) for a phrase/proximity node; inside a Not the
        node was never prepared (NotFilter's prepare is a no-op), so slots
        are unscored placeholders."""
        terms = getattr(node, "_terms", None)
        if terms is None:
            terms = [t for _, t in tokenize(node.text)]
            node._terms = terms
        slots = getattr(node, "_slots", None)
        if slots is None:
            slots = [_Slot(-1, F32(np.nan), 1.0) for _ in terms]
            node._slots = slots
        return terms, slots

    def _phrase_candidates(self, field: str, terms: list[str]):
        """Docs where all terms occur with adjacent positions (chained),
        plus the per-term posting lists.  Replicates the surviving-positions
        chain of src/filters.rs:206-215 (including the saturating_sub(1)
        quirk at position 0)."""
        pls = [self._postings(field, t) for t in terms]
        docs = pls[0].docs
        for pl in pls[1:]:
            docs = np.intersect1d(docs, pl.docs, assume_unique=True)
        if docs.size == 0 or len(pls) == 1:
            return docs, pls
        return docs[phrase_chain_survivors(pls, docs)], pls

    def _eval_phrase(self, node: ast.Phrase) -> EvalResult:
        terms, slots = self._phrase_meta(node)
        if len(terms) == 1:
            # parser emits a plain StemmedWordFilter for one token
            pl = self._postings(node.field, terms[0], need_positions=False)
            r = EvalResult(pl.docs)
            if not np.isnan(slots[0].idf):
                r.slots[slots[0].ordinal] = (
                    self._term_scores(pl, slots[0]),
                    np.ones(pl.size, dtype=np.int32),
                )
            return r
        docs, pls = self._phrase_candidates(node.field, terms)
        r = EvalResult(docs)
        if docs.size and not np.isnan(slots[0].idf):
            # only filters[0]'s DocResult survives the leapfrog
            idx0 = np.searchsorted(pls[0].docs, docs)
            scores0 = self._term_scores(pls[0], slots[0])[idx0]
            r.slots[slots[0].ordinal] = (scores0, np.ones(docs.size, np.int32))
        return r

    # ----------------------------------------------------------- exact

    def _eval_exact(self, node: ast.Exact) -> EvalResult:
        terms = [t for _, t in tokenize(node.literal)]
        docs, _pls = self._phrase_candidates(node.field, terms)
        if docs.size:
            import pyarrow.compute as pc

            col = self.reader.fetch_docs(docs, [node.field]).column(node.field)
            keep = pc.fill_null(pc.equal(col, node.literal), False).to_numpy(
                zero_copy_only=False).astype(bool)
            docs = docs[keep]
        r = EvalResult(docs)
        slot = getattr(node, "_slot", None)
        if slot is not None:
            r.slots[slot.ordinal] = (
                np.ones(docs.size, dtype=F32),
                np.ones(docs.size, dtype=np.int32),
            )
        return r

    # ----------------------------------------------------------- range

    @staticmethod
    def _zone_prunes(reader, path: str, node: ast.RangeQ) -> bool:
        """True iff the partition's zone map (Parquet footer min/max /
        null_count, reader.docmap_zone) proves no row can satisfy the
        range — the columnar stand-in for the reference's f/T/F/N value
        keyspace (src/key_builder.rs:163-188).  Conservative: missing or
        unmappable statistics never prune."""
        vmin, vmax, nulls, rows = reader.docmap_zone(path, node.field)
        if rows == 0:
            return False  # unknown column shape: fall through to the read
        if node.special == "null":
            return nulls == 0
        all_null = nulls is not None and nulls == rows
        if node.special in ("true", "false"):
            if all_null:
                return True
            if not isinstance(vmin, bool) or not isinstance(vmax, bool):
                return False
            want = node.special == "true"
            return not (vmin <= want <= vmax)
        # numeric / timestamp range: null rows never match
        if all_null:
            return True
        if isinstance(vmin, bool) or vmin is None or vmax is None:
            return False
        if node.min is not None and (
                vmax < node.min
                or (vmax == node.min and not node.min_inclusive)):
            return True
        if node.max is not None and (
                vmin > node.max
                or (vmin == node.max and not node.max_inclusive)):
            return True
        return False

    def _eval_range(self, node: ast.RangeQ) -> EvalResult:
        import pyarrow.parquet as pq

        reader = self.reader
        fieldname = node.field
        docs_parts = []
        rlo, rhi = (self.doc_range if self.doc_range is not None
                    else (0, reader.num_docs))
        for dm in reader._docmap:
            if dm["max_doc"] < rlo or dm["min_doc"] >= rhi:
                continue  # partition outside the evaluated doc range
            if self._zone_prunes(reader, dm["path"], node):
                continue  # footer statistics rule the partition out
            try:
                t = pq.read_table(dm["path"], columns=["doc_id", fieldname])
            except Exception:
                return EvalResult(np.zeros(0, dtype=np.int64))
            col = t.column(fieldname)
            import pyarrow.compute as pc

            if node.special == "null":
                mask = pc.is_null(col)
            elif node.special in ("true", "false"):
                try:
                    mask = pc.equal(col, node.special == "true")
                except Exception:
                    continue
            else:
                import pyarrow as pa_

                ctype = col.type
                if pa_.types.is_timestamp(ctype) or pa_.types.is_date(ctype):
                    col = col.cast("int64")
                vals = col.cast("float64", safe=False)
                mask = None
                if node.min is not None:
                    m = (pc.greater_equal(vals, node.min)
                         if node.min_inclusive else pc.greater(vals, node.min))
                    mask = m
                if node.max is not None:
                    m = (pc.less_equal(vals, node.max)
                         if node.max_inclusive else pc.less(vals, node.max))
                    mask = m if mask is None else pc.and_(mask, m)
                if mask is None:
                    mask = pc.is_valid(vals)
                else:
                    mask = pc.and_(mask, pc.is_valid(vals))
            sel = t.filter(mask).column("doc_id").to_numpy().astype(np.int64)
            sel = sel[(sel >= rlo) & (sel < rhi)]
            if sel.size:
                docs_parts.append(sel)
        docs = (np.sort(np.concatenate(docs_parts))
                if docs_parts else np.zeros(0, dtype=np.int64))
        r = EvalResult(docs)
        slot = getattr(node, "_slot", None)
        if slot is not None:
            r.slots[slot.ordinal] = (
                np.ones(docs.size, dtype=F32),
                np.ones(docs.size, dtype=np.int32),
            )
        return r

    # ------------------------------------------------------- proximity

    def _eval_proximity(self, node: ast.Proximity) -> EvalResult:
        """Literal port of DistanceFilter (src/filters.rs:588-726): the
        result stream and which filter's DocResult (and hence score slot)
        survives depend on persistent iterator state, so this runs the
        reference algorithm sequentially over the decoded posting arrays."""
        terms, slots = self._phrase_meta(node)
        pls = [self._postings(node.field, t) for t in terms]
        score_arrays = [
            None if np.isnan(s.idf) else self._term_scores(pl, s)
            for pl, s in zip(pls, slots)
        ]
        out_docs, out_slot, out_score = distance_filter_stream(
            pls, score_arrays, node.distance)
        docs = np.array(out_docs, dtype=np.int64)
        r = EvalResult(docs)
        for t in range(len(pls)):
            mask = np.array([s == t for s in out_slot], dtype=bool)
            if mask.any() and score_arrays[t] is not None:
                sums = np.zeros(docs.size, dtype=F32)
                cnts = np.zeros(docs.size, dtype=np.int32)
                sums[mask] = np.array(out_score, dtype=F32)[mask]
                cnts[mask] = 1
                r.slots[slots[t].ordinal] = (sums, cnts)
        return r

    # ---------------------------------------------------- final scores

    def final_scores(self, result: EvalResult) -> np.ndarray:
        """compute_relevancy_score vectorized (src/query.rs:463-477)."""
        ndocs = result.docs.size
        if self.num_slots == 0:
            return np.zeros(ndocs, dtype=F32)
        acc = np.zeros(ndocs, dtype=F32)
        matched = np.zeros(ndocs, dtype=np.int32)
        for o in sorted(result.slots):
            s, c = result.slots[o]
            has = c > 0
            with np.errstate(invalid="ignore", divide="ignore"):
                contrib = np.where(has, s / c.astype(F32), F32(0.0)).astype(F32)
            acc = (acc + contrib).astype(F32)
            matched += has.astype(np.int32)
        return (
            (self.query_norm * acc).astype(F32)
            * matched.astype(F32)
            / F32(self.num_slots)
        ).astype(F32)


# ---------------------------------------------------- shared kernels
# Used by both the flat engine (doc_ids) and the nested engine
# (json_engine.py, instance ordinals): the "docs" of the posting-likes may
# be any ascending int64 keys as long as all lists share the key space.

def phrase_chain_survivors(pls, docs) -> np.ndarray:
    """Indices into ``docs`` whose positions survive the phrase chain of
    src/filters.rs:206-215 (incl. the saturating_sub(1) quirk at pos 0).
    ``docs`` must be a sorted subset of every pl's ``.docs``.

    Vectorized over ALL candidate docs at once: positions become flat
    (candidate_ordinal << 32 | position) keys — ascending, so each chain
    step is one searchsorted membership test instead of a Python loop per
    doc.  Candidate ordinals (not doc_ids) keep the key in 63 bits at any
    corpus size."""
    idxs = [np.searchsorted(pl.docs, docs) for pl in pls]

    def flat_pos(pl, idx):
        tf = pl.tfs[idx]
        st = pl.pos_starts[idx]
        total = int(tf.sum())
        ends = np.cumsum(tf)
        rel = np.arange(total, dtype=np.int64) - np.repeat(ends - tf, tf)
        pos = pl.pos_concat[np.repeat(st, tf) + rel]
        ordinal = np.repeat(np.arange(docs.size, dtype=np.int64), tf)
        return ordinal, pos.astype(np.int64)

    ordinal0, pos0 = flat_pos(pls[0], idxs[0])
    surv = (ordinal0 << np.int64(32)) | pos0
    for t in range(1, len(pls)):
        if surv.size == 0:
            return np.zeros(0, dtype=np.int64)
        ordinal_t, pos_t = flat_pos(pls[t], idxs[t])
        probe = (ordinal_t << np.int64(32)) | np.maximum(pos_t - 1, 0)
        j = np.minimum(np.searchsorted(surv, probe), surv.size - 1)
        mask = surv[j] == probe
        surv = ((ordinal_t << np.int64(32)) | pos_t)[mask]
    if surv.size == 0:
        return np.zeros(0, dtype=np.int64)
    return np.unique(surv >> np.int64(32))


def distance_filter_stream(pls, score_arrays, distance: int):
    """Literal port of DistanceFilter (src/filters.rs:588-726) over
    posting-like lists; returns ``(keys, slot_idx, score)`` python lists —
    one entry per emitted result, consumed with the top-level
    first-match-per-key dedup.  The result stream and which filter's
    DocResult (and hence score slot) survives depend on persistent
    iterator state, so this runs the reference algorithm sequentially."""

    class WordIter:
        """StemmedWordPosFilter: advance_gte + next over one posting list."""

        __slots__ = ("pl", "i")

        def __init__(self, pl):
            self.pl = pl
            self.i = 0

        def first_result(self, start_key):
            self.i = int(np.searchsorted(self.pl.docs, start_key,
                                         side="left"))
            return self.next_result()

        def next_result(self):
            if self.i >= self.pl.size:
                return None
            j = self.i
            self.i += 1
            return j  # index into pl arrays

    import bisect

    iters = [WordIter(pl) for pl in pls]
    n = len(iters)
    dis = distance + 1
    current = [0]  # persistent current_filter state

    def result(base):
        # base = (filter_idx, posting_idx) or None
        matches_left = n - 1
        if base is None:
            return None
        bf, bi = base
        base_key = int(pls[bf].docs[bi])
        base_positions = [(int(p), bf) for p in pls[bf].positions_of(bi)]
        if matches_left == 0:
            return (bf, bi)
        while True:
            current[0] += 1
            if current[0] == n:
                current[0] = 0
            cf = current[0]
            nj = iters[cf].first_result(base_key)
            if nj is None:
                return None
            next_key = int(pls[cf].docs[nj])
            if base_key != next_key:
                bf, bi, base_key = cf, nj, next_key
                base_positions = [(int(p), cf)
                                  for p in pls[cf].positions_of(nj)]
                matches_left = n - 1
                continue
            pos_only = [p for p, _ in base_positions]
            new_map = {}
            for p in pls[cf].positions_of(nj):
                p = int(p)
                lo = max(p - dis, 0)
                start = bisect.bisect_left(pos_only, lo)
                end = bisect.bisect_left(pos_only, p + dis)
                encountered = {f for _, f in base_positions[start:end]}
                if len(encountered) == n - matches_left:
                    for pp, ff in base_positions[start:end]:
                        new_map[pp] = ff
                    new_map[p] = cf
            if new_map:
                base_positions = sorted(new_map.items())
                pos_only = [p for p, _ in base_positions]
                matches_left -= 1
                if matches_left == 0:
                    return (bf, bi)
                continue
            nj = iters[cf].next_result()
            if nj is None:
                return None
            bf, bi = cf, nj
            base_key = int(pls[cf].docs[bi])
            base_positions = [(int(p), cf) for p in pls[cf].positions_of(bi)]
            matches_left = n - 1

    out_keys: list[int] = []
    out_slot: list[int] = []
    out_score: list[float] = []
    start = 0
    while True:
        base = iters[current[0]].first_result(start)
        dr = result((current[0], base) if base is not None else None)
        if dr is None:
            break
        bf, bi = dr
        key = int(pls[bf].docs[bi])
        out_keys.append(key)
        out_slot.append(bf)
        sa = score_arrays[bf]
        out_score.append(float(sa[bi]) if sa is not None else 0.0)
        start = key + 1
    return out_keys, out_slot, out_score


# ------------------------------------------------------------- helpers

def _stem_one(word: str) -> str:
    toks = tokenize(word)
    return toks[0][1] if toks else ""


def _is_all_not(node: ast.Node) -> bool:
    if isinstance(node, ast.Not):
        return True
    if isinstance(node, ast.And):
        return all(_is_all_not(c) for c in node.clauses)
    if isinstance(node, ast.Or):
        return _is_all_not(node.left) and _is_all_not(node.right)
    if isinstance(node, ast.Boost):
        return _is_all_not(node.inner)
    if isinstance(node, ast.Bind):
        return _is_all_not(node.inner)
    return False


def _check_double_not(node: ast.Node, parent_is_neg: bool):
    if isinstance(node, ast.Not):
        if parent_is_neg:
            raise ValueError(
                'Logical not ("!") is nested inside of another logical not. '
                "This is not allowed."
            )
        _check_double_not(node.inner, True)
    elif isinstance(node, ast.And):
        for c in node.clauses:
            _check_double_not(c, parent_is_neg)
    elif isinstance(node, ast.Or):
        _check_double_not(node.left, parent_is_neg)
        _check_double_not(node.right, parent_is_neg)
    elif isinstance(node, ast.Boost):
        _check_double_not(node.inner, parent_is_neg)
    elif isinstance(node, ast.Bind):
        _check_double_not(node.inner, parent_is_neg)
