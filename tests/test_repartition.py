"""Overlapping-input fallback: build_index must accept input files whose
key ranges overlap by first range-partitioning them with ONE global sort
(docids.py documents this; the normal curated layout skips it).  The
resulting index must equal a build over pre-sorted input: same dense
doc_ids in global (conv_id, turn_idx) order, same scores."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from noise_ray.build import build_index
from noise_ray.query import IndexReader, run_query


def _write(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array(["user"] * len(rows), pa.string()),
        "text": pa.array([r[2] for r in rows], pa.string()),
        "tool": pa.array([None] * len(rows), pa.string()),
        "ts": pa.array(range(len(rows)), pa.timestamp("us")),
    }), path)
    return path

# interleaved conv ranges: file ranges overlap, rows unsorted within files
ROWS = [("c", 0, "gamma fox jumps"), ("a", 1, "alpha two quick"),
        ("e", 0, "epsilon fox"), ("b", 0, "beta dog"),
        ("a", 0, "alpha one fox"), ("d", 0, "delta quick fox")]


def test_overlapping_inputs_fall_back_to_global_sort(ray_session, tmp_path):
    p0 = _write(str(tmp_path / "in" / "f0.parquet"), ROWS[:3])
    p1 = _write(str(tmp_path / "in" / "f1.parquet"), ROWS[3:])
    idx = str(tmp_path / "idx")
    m = build_index([p0, p1], idx, num_buckets=4)
    assert m["num_docs"] == 6
    assert os.path.isdir(os.path.join(idx, "repartitioned"))

    # ground truth: one pre-sorted file
    want_rows = sorted(ROWS, key=lambda r: (r[0], r[1]))
    ps = _write(str(tmp_path / "sorted" / "f.parquet"), want_rows)
    idx2 = str(tmp_path / "idx2")
    build_index([ps], idx2, num_buckets=4)

    q = 'find {text: ~="fox"} order score() desc return score() limit 10 ;'
    got = run_query(IndexReader(idx), q)
    want = run_query(IndexReader(idx2), q)
    assert got.column("doc_id").to_pylist() == want.column("doc_id").to_pylist()
    assert got.column("conv_id").to_pylist() == want.column("conv_id").to_pylist()
    assert got.column("score").to_pylist() == want.column("score").to_pylist()

    # dense doc_ids in global key order
    all_docs = run_query(IndexReader(idx),
                         'find {role: =="user"} limit 10 ;')
    assert all_docs.column("doc_id").to_pylist() == list(range(6))
    assert all_docs.column("conv_id").to_pylist() == list("aabcde")


def test_repartition_reused_on_resume(ray_session, tmp_path):
    p0 = _write(str(tmp_path / "in" / "f0.parquet"), ROWS[:3])
    p1 = _write(str(tmp_path / "in" / "f1.parquet"), ROWS[3:])
    idx = str(tmp_path / "idx")
    build_index([p0, p1], idx, num_buckets=4)
    rp = os.path.join(idx, "repartitioned")
    mtimes = {f: os.stat(os.path.join(rp, f)).st_mtime_ns
              for f in os.listdir(rp)}
    # resume: manifest lost, repartitioned copy intact -> not rewritten
    os.remove(os.path.join(idx, "manifest.json"))
    build_index([p0, p1], idx, num_buckets=4)
    assert {f: os.stat(os.path.join(rp, f)).st_mtime_ns
            for f in os.listdir(rp)} == mtimes
