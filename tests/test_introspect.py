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


def test_term_vectors_stem_collision_fold(ray_session, tmp_path):
    """A corpus holding both 'it' and 'its' (stem 'it') must merge them
    into one engine row with summed tf and union df/cf, and the oracle's
    stem fold (_docs_stem_fold) must agree — the ADVICE round-3 gap."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as e
    from noise_ray.ops.introspect import term_vectors

    texts = [
        "it runs now",            # doc 0
        "its engine runs it",     # doc 1
        "engine merge scan",      # doc 2
        "it it its merge",        # doc 3 (requested)
    ]
    sf = str(tmp_path)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["src0"] * len(texts), pa.string()),
    }), f"{sf}/documents.parquet")

    # explicit index build: the sf-keyed documents_index cache must not
    # swallow a tmp-dir corpus
    from noise_ray.build.pipeline import build_index
    from noise_ray.ops.termdict import _reader_and_dict

    idx = f"{sf}/idx"
    build_index([f"{sf}/documents.parquet"], idx,
                fields=("text", "lang", "source"),
                key_columns=("doc_id",), num_buckets=8)
    _reader_and_dict(sf, index_dir=idx)  # dictionary for surface naming
    got = term_vectors(sf, doc_ids=(0, 3), index_dir=idx).to_pandas()
    # doc 3: 'it'×2 + 'its'×1 merge to term 'it' with tf 3
    row = got[(got.doc_id == 3) & (got.term == "it")]
    assert len(row) == 1 and int(row.tf.iloc[0]) == 3
    assert "its" not in set(got.term)
    # df: docs 0,1,3 contain the stem group; cf: 2+1+3 = 6
    assert int(row.df.iloc[0]) == 3 and int(row.cf.iloc[0]) == 6

    # the static oracle fold reproduces the same merged rows
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    sql = e.oracle_sql()["term_vectors"].replace("IN (3, 7, 11)",
                                                 "IN (0, 3)")
    want = con.execute(sql).fetchdf()
    got = got.sort_values(["doc_id", "term"]).reset_index(drop=True)
    want = want.sort_values(["doc_id", "term"]).reset_index(drop=True)
    assert got[want.columns.tolist()].astype(
        want.dtypes.to_dict()).equals(want)
