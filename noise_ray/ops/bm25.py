"""True BM25 (Okapi, k1/b) top-k straight off the inverted index.

The engine's native scorer reproduces the reference's TF-IDF formula
bit-for-bit (query/engine.py — that is the parity contract).  This
operator adds the standard BM25 ranking the north rule names, computed
from exactly the index artifacts the posting lists already carry: per
posting ``tfs`` (term frequency) and ``lens`` (field length), per term
the doc frequency (posting length), and corpus stats from the manifest
(``N`` docs, ``field_k`` total tokens → ``avgdl``).  No extra pass over
the corpus: scoring k terms touches k posting lists.

``idf_t = ln(1 + (N - df + 0.5) / (df + 0.5))`` (the Lucene/standard
non-negative variant) and
``score = Σ_t idf_t · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))``.

Determinism: scores are f64, rounded to 4dp, ordered by (rounded score
desc, doc_id asc) on BOTH sides — the same cross-engine contract as the
other scored oracles (ops/score_oracle.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DEFAULT_TERMS = ("merge", "scan")


def _field_total_tokens(reader, fid: int) -> float:
    """Total token count of one field = Σ per-term C over the stats
    sidecar (term-cardinality-sized, one filtered column read per stats
    partition; the manifest's field_k is the reference's K = distinct
    (doc, stem) count, which is NOT the BM25 avgdl numerator).  Memoized
    on the reader; epochs recurse."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    cache = getattr(reader, "_bm25_tok_totals", None)
    if cache is None:
        cache = reader._bm25_tok_totals = {}
    if fid in cache:
        return cache[fid]
    total = 0
    for paths in reader._stats_by_bucket.values():
        for p in paths:
            t = pq.read_table(p, columns=["c"],
                              filters=[("field", "==", fid)])
            if t.num_rows:
                total += int(pc.sum(t.column("c")).as_py())
    for e in getattr(reader, "_epochs", ()):
        total += _field_total_tokens(e, fid)
    cache[fid] = float(total)
    return cache[fid]


def bm25_topk(sf_dir: str, terms: tuple[str, ...] = DEFAULT_TERMS,
              k: int = 20, k1: float = 1.2, b: float = 0.75,
              field: str = "text", *,
              index_dir: str | None = None,
              filter_query: str | None = None) -> pa.Table:
    """BM25 top-``k`` over the documents index for a bag of ``terms``
    (terms must be their own stem on this corpus, like every term-oracle
    entry).  Returns (doc_id, score) with score rounded to 4dp.
    ``index_dir`` points at any flat index (e.g. the 22M transcript one)
    instead of the per-sf documents index.  ``filter_query`` is a
    filter-only noise query (e.g. ``'find {lang: =="en"} ;'``) narrowing
    the scored set — the filter+relevance "bool query" shape; the
    engine's own filter machinery (postings, zone maps, tombstones)
    computes the allowed set, BM25 ranks only inside it.  IDF statistics
    stay CORPUS-wide (the standard filtered-search semantics: a filter
    narrows candidates, it does not re-weight terms)."""
    from ..query.engine import _stem_one
    from ..pipelines import documents_index

    if index_dir is not None:
        # version-keyed cache: repeat queries reuse the decoded stats
        # sidecar totals and posting caches instead of re-opening
        from ..query.distributed import _cached_reader

        reader = _cached_reader(index_dir)
    else:
        reader = documents_index(sf_dir)
    n_docs = float(reader.num_docs)
    fid = reader.field_id[field]
    avgdl = _field_total_tokens(reader, fid) / n_docs

    stemmed = [_stem_one(t) for t in terms]
    if index_dir is not None and reader.num_docs >= 5_000_000:
        return _bm25_distributed(index_dir, reader, stemmed, field,
                                 k, k1, b, n_docs, avgdl, filter_query)

    dfs = {}
    pls = {}
    for t in stemmed:
        pl = reader.postings(field, t, need_positions=False)
        if pl is not None and pl.docs.size:
            pls[t] = pl
            dfs[t] = float(pl.docs.size)
    uniq, r4 = _fold_scores(
        [(pls[t].docs, pls[t].tfs, pls[t].lens, dfs[t]) for t in pls],
        n_docs, avgdl, k1, b, reader.tombstones)
    if filter_query is not None:
        allowed = _allowed_docs(reader, filter_query, None)
        m = np.isin(uniq, allowed)
        uniq, r4 = uniq[m], r4[m]
    top = np.lexsort((uniq, -r4))[:k]  # rounded score desc, doc_id asc
    return pa.table({"doc_id": pa.array(uniq[top], pa.int64()),
                     "score": pa.array(r4[top], pa.float64())})


def _allowed_docs(reader, filter_query: str, doc_range):
    """Matched doc set of a filter-only noise query (the engine's own
    filter machinery: postings, zone maps, tombstones)."""
    from ..query.engine import CompiledQuery
    from ..query.parser import parse_query

    q = parse_query(filter_query)
    if q.order or q.limit is not None:
        raise ValueError("bm25 filter_query must be filter-only")
    return CompiledQuery(reader, q.filter, doc_range=doc_range).evaluate().docs


def _fold_scores(term_parts, n_docs, avgdl, k1, b, tomb):
    """Sum per-term BM25 contributions into per-doc 4dp scores.
    ``term_parts`` = [(docs, tfs, lens, global_df)] in term order."""
    all_docs, all_scores = [], []
    for docs_t, tfs, lens, df in term_parts:
        if not len(docs_t):
            continue
        idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        tf = np.asarray(tfs, np.float64)
        dl = np.asarray(lens, np.float64)
        all_docs.append(np.asarray(docs_t, np.int64))
        all_scores.append(idf * tf * (k1 + 1.0)
                          / (tf + k1 * (1.0 - b + b * dl / avgdl)))
    if not all_docs:
        return np.zeros(0, np.int64), np.zeros(0, np.float64)
    docs = np.concatenate(all_docs)
    scores = np.concatenate(all_scores)
    order = np.argsort(docs, kind="stable")
    docs, scores = docs[order], scores[order]
    uniq, starts = np.unique(docs, return_index=True)
    summed = np.add.reduceat(scores, starts)
    if tomb is not None and tomb.size:
        live = ~np.isin(uniq, tomb)
        uniq, summed = uniq[live], summed[live]
    return uniq, np.round(summed, 4)


def bm25_df_range(index_dir: str, field: str, stemmed: list[str],
                  lo: int, hi: int) -> list[int]:
    """Phase-1 worker body: per-range doc frequency per term (postings
    read with the range pushdown through the per-worker cached reader;
    the decoded postings stay cached for phase 2)."""
    from ..query.distributed import _cached_reader

    reader = _cached_reader(index_dir)
    out = []
    for t in stemmed:
        pl = reader.postings(field, t, need_positions=False,
                             doc_range=(lo, hi))
        if pl is None:
            out.append(0)
            continue
        # the pushdown is block-granular (may return boundary docs
        # outside [lo, hi), or the cached full list) — mask exactly
        d = pl.docs
        out.append(int(((d >= lo) & (d < hi)).sum()))
    return out


def bm25_score_range(index_dir: str, field: str, stemmed: list[str],
                     dfs: list[float], n_docs: float, avgdl: float,
                     k1: float, b: float, k: int, lo: int, hi: int,
                     filter_query: str | None = None):
    """Phase-2 worker body: score one doc range, return its local top-k
    by (rounded score desc, doc_id asc) — a doc outside its range's
    top-k is beaten by >= k docs of that range alone, so the union of
    local top-ks contains the global top-k exactly."""
    from ..query.distributed import _cached_reader

    reader = _cached_reader(index_dir)
    parts = []
    for t, df in zip(stemmed, dfs):
        pl = reader.postings(field, t, need_positions=False,
                             doc_range=(lo, hi))
        if pl is None or not pl.docs.size or not df:
            continue
        m = (pl.docs >= lo) & (pl.docs < hi)  # block-granular pushdown
        if m.any():
            parts.append((pl.docs[m], pl.tfs[m], pl.lens[m], df))
    uniq, r4 = _fold_scores(parts, n_docs, avgdl, k1, b,
                            reader.tombstones)
    if filter_query is not None:
        allowed = _allowed_docs(reader, filter_query, (lo, hi))
        m = np.isin(uniq, allowed)
        uniq, r4 = uniq[m], r4[m]
    top = np.lexsort((uniq, -r4))[:k]
    return uniq[top], r4[top]


def _bm25_distributed(index_dir: str, reader, stemmed: list[str],
                      field: str, k: int, k1: float, b: float,
                      n_docs: float, avgdl: float,
                      filter_query: str | None = None) -> pa.Table:
    import ray

    from ..query.distributed import worker_pool

    cpus = int(ray.cluster_resources().get("CPU", 8))
    n = max(1, min(cpus, reader.num_docs // 10_000 + 1))
    span = max(1, -(-reader.num_docs // n))
    ranges = [(lo, min(lo + span, reader.num_docs))
              for lo in range(0, reader.num_docs, span)]
    pool = worker_pool()
    df_parts = ray.get([
        pool[i % len(pool)].bm25_df.remote(index_dir, field, stemmed,
                                           lo, hi)
        for i, (lo, hi) in enumerate(ranges)])
    dfs = [float(sum(p[j] for p in df_parts))
           for j in range(len(stemmed))]
    parts = ray.get([
        pool[i % len(pool)].bm25_score.remote(
            index_dir, field, stemmed, dfs, n_docs, avgdl, k1, b, k,
            lo, hi, filter_query)
        for i, (lo, hi) in enumerate(ranges)])
    docs = np.concatenate([p[0] for p in parts])
    r4 = np.concatenate([p[1] for p in parts])
    top = np.lexsort((docs, -r4))[:k]
    return pa.table({"doc_id": pa.array(docs[top], pa.int64()),
                     "score": pa.array(r4[top], pa.float64())})
