"""JSONL source: the reference's JSON ingestion surface
(/root/reference/src/index.rs:131-161) adapted to the streaming build —
conversion must be schema-normalized, key-sorted, and index-identical to
native Parquet input."""

import io
import json
import os

from noise_ray.build import build_index
from noise_ray.query import IndexReader, run_query
from noise_ray.sources.jsonl import jsonl_to_parquet

ROWS = [
    {"conv_id": "b", "turn_idx": 0, "role": "user", "text": "fox season"},
    {"conv_id": "a", "turn_idx": 1, "role": "assistant",
     "text": "lazy dogs sleep", "tool": "search"},
    {"conv_id": "a", "turn_idx": 0, "role": "user",
     "text": "the quick brown fox"},
]


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return path


def test_jsonl_converts_and_builds(ray_session, tmp_path):
    p = _write_jsonl(str(tmp_path / "turns.jsonl"), ROWS)
    shards = jsonl_to_parquet([p], str(tmp_path / "pq"))
    assert shards
    idx = str(tmp_path / "idx")
    m = build_index(shards, idx, num_buckets=4)
    assert m["num_docs"] == 3
    got = run_query(IndexReader(idx), 'find {text: ~="fox"} return ._id ;')
    # dense doc_ids in (conv_id, turn_idx) order despite unsorted input
    assert got.column("doc_id").to_pylist() == [0, 2]
    assert got.column("conv_id").to_pylist() == ["a", "b"]


def test_repl_add_jsonl(ray_session, tmp_path):
    from noise_ray.repl import run

    p = _write_jsonl(str(tmp_path / "turns.jsonl"), ROWS)
    idx = str(tmp_path / "idx")
    out = io.StringIO()
    run(io.StringIO(
        f'create {idx} ; add {p} ; commit ; '
        'find {text: ~="quick"} return ._id ;'),
        out, interactive=False)
    lines = out.getvalue().strip().splitlines()
    assert lines[1].startswith("committed 3 docs")
    assert eval(lines[2])["conv_id"] == "a"


def test_repl_add_jsonl_twice(ray_session, tmp_path):
    """Regression: a second JSONL add after a commit used to collide on
    the staging directory name (commit resets the staged list) and stage
    nothing."""
    from noise_ray.repl import run

    p0 = _write_jsonl(str(tmp_path / "a.jsonl"), ROWS)
    p1 = _write_jsonl(str(tmp_path / "b.jsonl"),
                      [{"conv_id": "z", "turn_idx": 0, "role": "user",
                        "text": "zeta fox"}])
    idx = str(tmp_path / "idx")
    out = io.StringIO()
    run(io.StringIO(
        f'create {idx} ; add {p0} ; commit ; add {p1} ; commit ; '
        'find {text: ~="fox"} return ._id ;'),
        out, interactive=False)
    lines = out.getvalue().strip().splitlines()
    assert lines[3].startswith("committed 1 new docs")
    found = [eval(l)["conv_id"] for l in lines if l.startswith("{")]
    assert "z" in found


def test_csv_converts_and_builds(ray_session, tmp_path):
    import csv as _csv

    from noise_ray.sources.jsonl import csv_to_parquet

    p = str(tmp_path / "turns.csv")
    with open(p, "w", newline="") as f:
        w = _csv.DictWriter(f, fieldnames=["conv_id", "turn_idx", "role",
                                           "text"])
        w.writeheader()
        for r in ROWS:
            w.writerow({k: r[k] for k in w.fieldnames})
    shards = csv_to_parquet([p], str(tmp_path / "pq"))
    idx = str(tmp_path / "idx")
    build_index(shards, idx, num_buckets=4)
    got = run_query(IndexReader(idx), 'find {text: ~="fox"} return ._id ;')
    assert got.column("doc_id").to_pylist() == [0, 2]


def test_jsonl_missing_required_field(ray_session, tmp_path):
    import pytest

    p = _write_jsonl(str(tmp_path / "bad.jsonl"),
                     [{"conv_id": "x", "turn_idx": 0, "role": "user"}])
    with pytest.raises(Exception, match="text"):
        jsonl_to_parquet([p], str(tmp_path / "pq"))
