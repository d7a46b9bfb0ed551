"""Okapi BM25 over the inverted index (ops/bm25.py): compared against
an independent raw-text recomputation (no index involved)."""

import collections
import math
import re

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _reference_bm25(terms=("merge", "scan"), k=20, k1=1.2, b=0.75):
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    toks = [re.findall(r"[a-z0-9]+", s.lower()) for s in texts]
    n = len(ids)
    avgdl = sum(len(x) for x in toks) / n
    df = collections.Counter()
    for x in toks:
        for term in set(x) & set(terms):
            df[term] += 1
    scores = {}
    for d, x in zip(ids, toks):
        s = 0.0
        cnt = collections.Counter(x)
        for term in terms:
            tf = cnt.get(term, 0)
            if not tf:
                continue
            idf = math.log(1.0 + (n - df[term] + 0.5) / (df[term] + 0.5))
            s += idf * tf * (k1 + 1.0) / (
                tf + k1 * (1.0 - b + b * len(x) / avgdl))
        if s > 0.0:
            scores[d] = round(s, 4)
    top = sorted(scores.items(), key=lambda p: (-p[1], p[0]))[:k]
    return top


def test_bm25_matches_raw_recomputation(ray_session):
    from noise_ray.ops.bm25 import bm25_topk

    got = bm25_topk(SF)
    rows = list(zip(got.column("doc_id").to_pylist(),
                    got.column("score").to_pylist()))
    assert rows == _reference_bm25()
    assert len(rows) == 20
    # scores strictly positive, non-increasing after 4dp rounding
    vals = [s for _, s in rows]
    assert all(v > 0 for v in vals) and vals == sorted(vals, reverse=True)


def test_bm25_b_zero_removes_length_normalization(ray_session):
    """With b=0 the per-term contribution depends only on tf, so any two
    docs with equal tf for the single query term tie exactly."""
    from noise_ray.ops.bm25 import bm25_topk

    got = bm25_topk(SF, terms=("merge",), k=1000, b=0.0)
    by_score = {}
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    cnt = {d: len(re.findall(r"\bmerge\b", s.lower()))
           for d, s in zip(t.column("doc_id").to_pylist(),
                           t.column("text").to_pylist())}
    for d, s in zip(got.column("doc_id").to_pylist(),
                    got.column("score").to_pylist()):
        by_score.setdefault(s, set()).add(cnt[d])
    for tf_set in by_score.values():
        assert len(tf_set) == 1  # equal score <=> equal tf


def test_rerank_topk_two_stage(ray_session):
    """Final docs must come from the BM25 candidate set, ordered by the
    rerank feature (coverage-dominant), recomputed independently."""
    from noise_ray.ops.bm25 import bm25_topk
    from noise_ray.ops.rerank import _rerank_score, rerank_topk

    terms = ("merge", "scan")
    cand = set(bm25_topk(SF, terms=terms,
                         k=100).column("doc_id").to_pylist())
    got = rerank_topk(SF, terms=terms, k_retrieve=100, k_final=10)
    ids = got.column("doc_id").to_pylist()
    scores = got.column("rerank").to_pylist()
    assert set(ids) <= cand and len(ids) == 10

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(t.column("doc_id").to_pylist(),
                     t.column("text").to_pylist()))
    expect = sorted(((d, round(_rerank_score(texts[d], terms), 6))
                     for d in cand), key=lambda p: (-p[1], p[0]))[:10]
    assert list(zip(ids, scores)) == expect
    # coverage dominates: any doc with both terms outranks any with one
    both = [s for s in scores if s >= 20.0]
    assert both == scores[:len(both)]


def test_bm25_filtered_subset_semantics(ray_session):
    """Filtered BM25: every hit satisfies the predicate, scores equal
    the unfiltered scores (filter narrows, never re-weights), and the
    distributed-path helper matches on a range."""
    from noise_ray.ops.bm25 import bm25_topk

    full = dict(zip(*[bm25_topk(SF, k=1000).column(c).to_pylist()
                      for c in ("doc_id", "score")]))
    filt = bm25_topk(SF, k=1000, filter_query='find {lang: =="en"} ;')
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "lang"])
    lang = dict(zip(t.column("doc_id").to_pylist(),
                    t.column("lang").to_pylist()))
    ids = filt.column("doc_id").to_pylist()
    assert ids and all(lang[d] == "en" for d in ids)
    for d, s in zip(ids, filt.column("score").to_pylist()):
        assert s == full[d]
    assert set(ids) == {d for d in full if lang[d] == "en"}
