"""Introspection surfaces (ops/introspect.py)."""

SF = "/root/testdata/sf0.001"


def test_explain_contributions_sum_to_score(ray_session):
    """The per-term contributions (6dp) sum to the doc's reported BM25
    score (4dp) within rounding slack, and the doc IS the top-1."""
    from noise_ray.ops.bm25 import bm25_topk
    from noise_ray.ops.introspect import explain_score

    exp = explain_score(SF, ("merge", "scan"))
    top = bm25_topk(SF, ("merge", "scan"), k=1)
    assert exp.num_rows >= 1
    doc = exp.column("doc_id").to_pylist()
    assert set(doc) == {top.column("doc_id")[0].as_py()}
    total = sum(exp.column("contrib").to_pylist())
    assert abs(total - top.column("score")[0].as_py()) < 1e-3
    # idf/df consistency: higher df -> lower idf
    rows = sorted(zip(exp.column("df").to_pylist(),
                      exp.column("idf").to_pylist()))
    for (d1, i1), (d2, i2) in zip(rows, rows[1:]):
        assert d1 <= d2 and i1 >= i2


def test_index_stats_token_conservation(ray_session):
    """Index token totals equal a raw-text recount (the build dropped
    or duplicated nothing)."""
    import re

    import pyarrow.parquet as pq

    from noise_ray.ops.introspect import index_stats

    got = {f: (n, t) for f, n, t in zip(
        *(index_stats(SF).column(c).to_pylist()
          for c in ("field", "n_docs", "total_tokens")))}
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["text", "lang", "source"])
    for f in ("text", "lang", "source"):
        n = t.num_rows
        toks = sum(len(re.findall(r"[a-z0-9]+", s.lower()))
                   for s in t.column(f).to_pylist())
        assert got[f] == (n, toks)


def test_term_vectors_matches_raw_recomputation(ray_session):
    import collections
    import re

    import pyarrow.parquet as pq

    from noise_ray.ops.introspect import term_vectors

    SF = "/root/testdata/sf0.001"
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"])
    toks = {d: re.findall(r"[a-z0-9]+", s.lower())
            for d, s in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist())}
    df = collections.Counter()
    cf = collections.Counter()
    for x in toks.values():
        df.update(set(x))
        cf.update(x)
    want = []
    for d in (3, 7, 11):
        tf = collections.Counter(toks[d])
        for w in sorted(tf):
            want.append((d, w, tf[w], df[w], cf[w]))

    got = term_vectors(SF)
    assert list(zip(got.column("doc_id").to_pylist(),
                    got.column("term").to_pylist(),
                    got.column("tf").to_pylist(),
                    got.column("df").to_pylist(),
                    got.column("cf").to_pylist())) == want
