"""Percolator (ops/percolate.py): registered queries matched against
the document stream — checked against a raw-text recomputation and the
DuckDB oracle (ops/score_oracle.percolate_sql)."""

import re

import duckdb
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"

QSPEC = (
    (("merge", "scan"), 2),
    (("row", "column"), 1),
    (("fast", "slow", "batch"), 2),
)


def _raw_pairs(qspec):
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"])
    out = []
    for d, s in zip(t.column("doc_id").to_pylist(),
                    t.column("text").to_pylist()):
        toks = set(re.findall(r"[a-z0-9]+", s.lower()))
        for qid, (terms, m) in enumerate(qspec):
            if len(toks & set(terms)) >= m:
                out.append((d, qid))
    return sorted(out)


def test_percolate_matches_raw_recomputation(ray_session):
    from noise_ray.ops.percolate import percolate

    got = percolate(SF, QSPEC).take_all()
    got = sorted((r["doc_id"], r["query_id"]) for r in got)
    want = _raw_pairs(QSPEC)
    assert got == want
    assert len(want) > 0  # the fixture corpus exercises every query
    assert len({q for _, q in want}) == len(QSPEC)


def test_percolate_matches_duckdb_oracle(ray_session):
    from noise_ray.ops.percolate import percolate
    from noise_ray.ops.score_oracle import percolate_sql

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{SF}/documents.parquet')")
    want = con.execute(percolate_sql(QSPEC)).fetchall()
    got = [(r["doc_id"], r["query_id"])
           for r in percolate(SF, QSPEC).sort(
               ["doc_id", "query_id"]).take_all()]
    assert got == [tuple(r) for r in want]


def test_percolate_min_match_semantics(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data

    from noise_ray.ops.percolate import _Percolator

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["alpha beta gamma", "alpha", "beta beta",
                          "delta"], pa.string()),
    })
    # (alpha AND beta), (alpha OR beta), never-matching
    spec = ((("alpha", "beta"), 2), (("alpha", "beta"), 1),
            (("zzz",), 1))
    p = _Percolator(spec)
    out = p(docs)
    pairs = sorted(zip(out.column("doc_id").to_pylist(),
                       out.column("query_id").to_pylist()))
    assert pairs == [(0, 0), (0, 1), (1, 1), (2, 1)]
    # repeated tokens count once (doc 2: beta beta is ONE distinct term)
    empty = p(docs.slice(0, 0))
    assert empty.num_rows == 0
