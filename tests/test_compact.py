"""Compaction: fold epochs + tombstones into a fresh base index.

The invariant under test: ``compact_index(dir)`` is result-identical —
doc_ids AND f32 scores — to a fresh ``build_index`` over the merged live
rows (the reference's compaction-filter GC drops dead entries the same
way, /root/reference/src/index.rs:271-282)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from noise_ray.build import (add_documents, build_index, compact_index,
                             total_docs)
from noise_ray.query import IndexReader, run_query, run_query_distributed

from test_incremental import _write, BASE, DELTA, ids

Q_SCORED = 'find {text: ~="fox"} order score() desc return score() limit 10 ;'


@pytest.fixture()
def live_index(ray_session, tmp_path):
    """Base (3 docs) + epoch (2 docs) + an upsert + a delete."""
    p = _write(str(tmp_path / "in0"), "part-0.parquet", BASE)
    idx = str(tmp_path / "idx")
    build_index([p], idx, num_buckets=4)
    p1 = _write(str(tmp_path / "in1"), "part-1.parquet", DELTA)
    add_documents(idx, [p1])
    # upsert (a, 0): tombstones doc 0, adds doc 5
    p2 = _write(str(tmp_path / "in2"), "part-2.parquet",
                [("a", 0, "user", "updated fox text entirely")])
    add_documents(idx, [p2])
    # plain delete of (b, 0) = doc 2
    IndexReader(idx).add_tombstones([2])
    return idx


def _live_rows():
    # what survives: (a,0) upserted, (a,1), both DELTA rows; (b,0) deleted
    return [("a", 0, "user", "updated fox text entirely"),
            ("a", 1, "assistant", "lazy dogs sleep"),
            *DELTA]


def test_compact_equals_fresh_build(live_index, tmp_path):
    pre_keys = set(zip(
        run_query(IndexReader(live_index), 'find {text: ~="fox"} limit 99 ;')
        .column("conv_id").to_pylist(),
        run_query(IndexReader(live_index), 'find {text: ~="fox"} limit 99 ;')
        .column("turn_idx").to_pylist()))

    m = compact_index(live_index)
    assert m["num_docs"] == 4
    assert total_docs(live_index) == 4

    r = IndexReader(live_index)
    assert not r._epochs
    assert not r.tombstones.size
    got = run_query(r, Q_SCORED)

    # ground truth: fresh build over the merged live rows
    scratch_in = str(tmp_path / "union")
    _write(scratch_in, "part-0.parquet", _live_rows())
    scratch = str(tmp_path / "scratch")
    build_index([os.path.join(scratch_in, "part-0.parquet")], scratch,
                num_buckets=4)
    want = run_query(IndexReader(scratch), Q_SCORED)
    assert ids(got) == ids(want)
    assert got.column("score").to_pylist() == want.column("score").to_pylist()

    # the live (conv_id, turn_idx) view is preserved across the rewrite
    post = run_query(r, 'find {text: ~="fox"} limit 99 ;')
    post_keys = set(zip(post.column("conv_id").to_pylist(),
                        post.column("turn_idx").to_pylist()))
    assert post_keys == pre_keys

    # distributed path binds to the compacted manifest, not a stale cache
    dist = run_query_distributed(live_index, Q_SCORED, num_partitions=2)
    assert ids(dist) == ids(want)


def test_compact_noop_without_epochs_or_tombstones(ray_session, tmp_path):
    p = _write(str(tmp_path / "in0"), "part-0.parquet", BASE)
    idx = str(tmp_path / "idx")
    m0 = build_index([p], idx, num_buckets=4)
    assert compact_index(idx) == m0


def test_compact_all_deleted(ray_session, tmp_path):
    p = _write(str(tmp_path / "in0"), "part-0.parquet", BASE)
    idx = str(tmp_path / "idx")
    build_index([p], idx, num_buckets=4)
    IndexReader(idx).add_tombstones([0, 1, 2])
    m = compact_index(idx)
    assert m["num_docs"] == 0
    r = IndexReader(idx)
    assert r.num_docs == 0
    assert run_query(r, 'find {text: ~="fox"} limit 10 ;').num_rows == 0


def test_compact_empty_base_with_epochs(ray_session, tmp_path):
    """Regression: after a compaction that left zero docmap partitions,
    a later epoch + compaction crashed routing epoch rows into an empty
    partition list."""
    p = _write(str(tmp_path / "in0"), "part-0.parquet",
               [("a", 0, "user", "doomed fox")])
    idx = str(tmp_path / "idx")
    build_index([p], idx, num_buckets=4)
    IndexReader(idx).add_tombstones([0])
    compact_index(idx)
    assert IndexReader(idx).num_docs == 0

    p1 = _write(str(tmp_path / "in1"), "part-0.parquet",
                [("b", 0, "user", "reborn fox")])
    add_documents(idx, [p1])
    m = compact_index(idx)
    assert m["num_docs"] == 1
    got = run_query(IndexReader(idx), 'find {text: ~="fox"} limit 5 ;')
    assert got.column("conv_id").to_pylist() == ["b"]
    assert ids(got) == [0]


def test_compact_routes_interleaved_epoch_keys(ray_session, tmp_path):
    """Epoch keys that fall INSIDE the base key range must land in the
    right staging partition (non-overlapping ranges for the rebuild)."""
    b0 = _write(str(tmp_path / "in0"), "part-0.parquet",
                [("a", 0, "user", "alpha fox"), ("c", 0, "user", "carol fox")])
    b1 = _write(str(tmp_path / "in0"), "part-1.parquet",
                [("e", 0, "user", "echo fox"), ("g", 0, "user", "golf fox")])
    idx = str(tmp_path / "idx")
    build_index([b0, b1], idx, num_buckets=4)
    # epoch keys interleave: b < c (file 0), f inside file 1, z beyond max
    p = _write(str(tmp_path / "in1"), "part-0.parquet",
               [("b", 0, "user", "bravo fox"),
                ("f", 0, "user", "foxtrot fox"),
                ("z", 0, "user", "zulu fox")])
    add_documents(idx, [p])
    compact_index(idx)

    r = IndexReader(idx)
    assert r.num_docs == 7
    got = run_query(r, 'find {text: ~="fox"} limit 99 ;')
    # dense doc_ids in global (conv_id, turn_idx) order
    assert got.column("conv_id").to_pylist() == list("abcefgz")
    assert ids(got) == list(range(7))


def test_repl_compact(ray_session, tmp_path):
    import io

    from noise_ray.repl import run

    c0 = _write(str(tmp_path / "c"), "part-0.parquet", BASE)
    c1 = _write(str(tmp_path / "c2"), "part-1.parquet", DELTA)
    idx = str(tmp_path / "idx")
    out = io.StringIO()
    run(io.StringIO(
        f"create {idx} ; add {c0} ; commit ; add {c1} ; commit ; "
        f"del 0 ; compact ; find {{text: ~=\"fox\"}} return ._id ;"),
        out, interactive=False)
    lines = out.getvalue().strip().splitlines()
    assert any(l.startswith("compacted to 4 docs") for l in lines)
    # doc 0 ("a",0 quick brown fox) deleted; survivors with "fox": b0 + DELTA
    found = [eval(l)["doc_id"] for l in lines if l.startswith("{")]
    assert len(found) == 3
