"""Job CLI (noise_ray/cli.py): build → stats → bm25 → merge → snapshot →
restore round-trips, invoked in-process (the ray job submit surface)."""

import io
import json
import os
from contextlib import redirect_stdout

SF = "/root/testdata/sf0.001"


def _run(argv) -> tuple[int, str]:
    from noise_ray.cli import main

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(argv)
    return rc, buf.getvalue()


def test_cli_build_stats_bm25(ray_session, tmp_path):
    import pyarrow.parquet as pq

    src = os.path.join(SF, "documents.parquet")
    # documents rows key on doc_id; rename for the transcript-ish schema
    t = pq.read_table(src, columns=["doc_id", "text", "source", "lang"])
    staged = str(tmp_path / "docs.parquet")
    pq.write_table(t, staged)
    idx = str(tmp_path / "idx")
    rc, out = _run(["build", idx, staged,
                    "--fields", "text,source,lang",
                    "--key-cols", "doc_id"])
    assert rc == 0
    built = json.loads(out)
    assert built["num_docs"] == t.num_rows

    rc, out = _run(["stats", idx])
    assert rc == 0
    st = json.loads(out)
    assert st["num_docs"] == t.num_rows and not st["nested"]

    rc, out = _run(["bm25", idx, "merge", "scan", "-k", "5"])
    assert rc == 0
    lines = [ln for ln in out.strip().split("\n") if ln]
    assert len(lines) == 5

    # the CLI build must agree with the library build used everywhere
    from noise_ray.ops.bm25 import bm25_topk

    want = bm25_topk(SF, k=5)
    got = [tuple(map(float, ln.split("\t"))) for ln in lines]
    assert got == [(float(d), float(s)) for d, s in
                   zip(want.column("doc_id").to_pylist(),
                       want.column("score").to_pylist())]


def test_cli_merge_snapshot_restore(ray_session, tmp_path):
    from noise_ray.ops.federated import shard_documents_indexes

    dirs = shard_documents_indexes(SF, 3)
    idx = str(tmp_path / "merged")
    rc, out = _run(["merge", idx, *dirs])
    assert rc == 0
    assert json.loads(out)["merged_from"] == 3

    snap = str(tmp_path / "snap")
    rc, _ = _run(["snapshot", idx, snap])
    assert rc == 0
    dest = str(tmp_path / "restored")
    rc, _ = _run(["restore", snap, dest])
    assert rc == 0

    rc, a = _run(["bm25", idx, "merge", "-k", "3"])
    assert rc == 0
    rc, b = _run(["bm25", dest, "merge", "-k", "3"])
    assert rc == 0
    assert a == b


def test_cli_query_nested(ray_session, tmp_path):
    from noise_ray.ops.nested_docs import nested_transcripts_index

    uni = nested_transcripts_index(SF)
    rc, out = _run(["query", uni.index_dir,
                    "find {n_turns: >= 18.0} return ._id ;"])
    assert rc == 0
    rows = [json.loads(ln) for ln in out.strip().split("\n") if ln]
    assert rows and all(isinstance(r, str) for r in rows)


def test_cli_split_json_and_merge_json(ray_session, tmp_path):
    from noise_ray.ops.nested_docs import nested_transcripts_index
    from noise_ray.query.json_executor import run_json_query
    from noise_ray.query.json_reader import JsonIndexReader

    uni = nested_transcripts_index(SF)
    outs = [str(tmp_path / "a"), str(tmp_path / "b")]
    rc, out = _run(["split-json", uni.index_dir, *outs])
    assert rc == 0
    sizes = json.loads(out)
    assert sum(sizes) == uni.num_docs

    back = str(tmp_path / "back")
    rc, out = _run(["merge-json", back, *outs])
    assert rc == 0
    assert json.loads(out)["num_docs"] == uni.num_docs
    q = "find {n_turns: >= 18.0} return ._id ;"
    assert (run_json_query(JsonIndexReader(back), q)
            == run_json_query(uni, q))


def test_cli_merge_dedup_keys(ray_session, tmp_path):
    from noise_ray.ops.federated import shard_documents_indexes
    from noise_ray.query.reader import IndexReader

    shard = shard_documents_indexes(SF, 3)[0]
    n = IndexReader(shard).num_docs
    out = str(tmp_path / "m")
    rc, outp = _run(["merge", out, shard, shard, "--dedup-keys"])
    assert rc == 0
    r = json.loads(outp)
    assert r["tombstoned"] == n
