"""Build-pipeline invariants: text equality, determinism, resume lineage.

Covers FIXTURES.md §4 and the north rule's resumability requirement: a build
killed after some partitions committed must resume to an identical index.
"""

import hashlib
import json
import os
import shutil

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from noise_ray.build import build_index
from noise_ray.query import IndexReader, run_query
from noise_ray.sources import generate_transcripts


def _hash_dir_files(index_dir):
    out = {}
    for sub in ("docmap", "segments", "stats"):
        d = os.path.join(index_dir, sub)
        for f in sorted(os.listdir(d)):
            with open(os.path.join(d, f), "rb") as fh:
                out[f"{sub}/{f}"] = hashlib.sha256(fh.read()).hexdigest()
    return out


def test_text_equality_under_stable_order(small_transcripts):
    """Per-turn text byte-equality between source and doc store, and doc_id
    order == stable (conv_id, turn_idx) order (the input_hint invariant)."""
    import pyarrow as pa

    src = pq.read_table(
        [p for p in small_transcripts["input"]],
        columns=["conv_id", "turn_idx", "text"],
    )
    idx = pc.sort_indices(
        src, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    src = src.take(idx)

    dm_files = [d["path"] for d in small_transcripts["manifest"]["docmap"]]
    dm = pq.read_table(dm_files, columns=["doc_id", "conv_id", "turn_idx", "text"])
    dm = dm.take(pc.sort_indices(dm, sort_keys=[("doc_id", "ascending")]))

    assert dm.num_rows == src.num_rows
    assert dm.column("doc_id").to_pylist() == list(range(src.num_rows))
    for col in ("conv_id", "turn_idx", "text"):
        assert dm.column(col).to_pylist() == src.column(col).to_pylist(), col


def test_build_deterministic(ray_session, tmp_path):
    paths = generate_transcripts(str(tmp_path / "in"), num_convs=40, num_files=4)
    m1 = build_index(paths, str(tmp_path / "idx1"), num_buckets=8)
    m2 = build_index(paths, str(tmp_path / "idx2"), num_buckets=8)
    assert _hash_dir_files(str(tmp_path / "idx1")) == _hash_dir_files(
        str(tmp_path / "idx2")
    )
    assert m1["field_k"] == m2["field_k"]
    assert m1["num_docs"] == m2["num_docs"]


def test_resume_after_partial_build(ray_session, tmp_path):
    """Delete the manifest plus some committed outputs; resume must
    reconstruct a byte-identical index and skip already-done partitions."""
    paths = generate_transcripts(str(tmp_path / "in"), num_convs=40, num_files=4)
    full_dir = str(tmp_path / "full")
    build_index(paths, full_dir, num_buckets=8)
    want = _hash_dir_files(full_dir)

    resume_dir = str(tmp_path / "resume")
    build_index(paths, resume_dir, num_buckets=8)
    # simulate a crash: manifest gone, one docmap partition and two segment
    # groups lost, stats lost
    os.remove(os.path.join(resume_dir, "manifest.json"))
    dm = sorted(os.listdir(os.path.join(resume_dir, "docmap")))
    os.remove(os.path.join(resume_dir, "docmap", dm[1]))
    segs = sorted(os.listdir(os.path.join(resume_dir, "segments")))
    for s in segs[:2]:
        os.remove(os.path.join(resume_dir, "segments", s))
    shutil.rmtree(os.path.join(resume_dir, "stats"))
    os.makedirs(os.path.join(resume_dir, "stats"))

    m = build_index(paths, resume_dir, num_buckets=8)
    assert _hash_dir_files(resume_dir) == want
    with open(os.path.join(full_dir, "manifest.json")) as f:
        full_segs = json.load(f)["segments"]
    assert [(s["gkey"], s["postings"]) for s in m["segments"]] == [
        (s["gkey"], s["postings"]) for s in full_segs
    ]


def test_partitioning_independence(ray_session, tmp_path):
    """Index CONTENT must not depend on input file layout or batch size
    (the sandbox stand-in for cluster-size independence): identical term
    stats (byte-for-byte — they are per-term totals), identical decoded
    posting lists for the whole vocabulary, identical scores.  Segment
    FILES may differ: posting blocks are finished in the mapper, so block
    boundaries follow ingest-task boundaries (by design — the writer never
    re-encodes)."""
    p_a = generate_transcripts(str(tmp_path / "a"), num_convs=40, num_files=2)
    p_b = generate_transcripts(str(tmp_path / "b"), num_convs=40, num_files=7)
    build_index(p_a, str(tmp_path / "idxa"), num_buckets=8,
                tokenize_batch_size=64)
    build_index(p_b, str(tmp_path / "idxb"), num_buckets=8,
                tokenize_batch_size=1024)
    ha = {k: v for k, v in _hash_dir_files(str(tmp_path / "idxa")).items()
          if k.startswith("stats/")}
    hb = {k: v for k, v in _hash_dir_files(str(tmp_path / "idxb")).items()
          if k.startswith("stats/")}
    assert ha == hb

    ra = IndexReader(str(tmp_path / "idxa"))
    rb = IndexReader(str(tmp_path / "idxb"))

    # whole-vocabulary postings equality (decoded form)
    vocab = set()
    for s in ra.manifest["stats"]:
        t = pq.read_table(s["path"], columns=["field", "term"])
        vocab.update(zip(t.column("field").to_pylist(),
                         t.column("term").to_pylist()))
    assert vocab
    for fid, term in sorted(vocab):
        pa_, pb_ = ra.postings(fid, term), rb.postings(fid, term)
        assert pa_.docs.tolist() == pb_.docs.tolist(), (fid, term)
        assert pa_.tfs.tolist() == pb_.tfs.tolist(), (fid, term)
        assert pa_.lens.tolist() == pb_.lens.tolist(), (fid, term)
        assert pa_.pos_concat.tolist() == pb_.pos_concat.tolist(), (fid, term)
        assert ra.term_stats(fid, term) == rb.term_stats(fid, term)

    q = 'find {text: ~="the quick"} order score() desc return score() limit 10 ;'
    ta, tb = run_query(ra, q), run_query(rb, q)
    assert ta.column("doc_id").to_pylist() == tb.column("doc_id").to_pylist()
    assert ta.column("score").to_pylist() == tb.column("score").to_pylist()
