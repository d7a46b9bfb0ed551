"""Snapshot/restore (build/snapshot.py): point-in-time manifest-closure
copies; query results identical through snapshot + restore; repeat
snapshots are incremental (unchanged immutable files transfer 0)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _mini_index(tmp_path):
    from noise_ray.build import build_index

    rows = [{"doc_id": d, "text": f"alpha beta doc{d} " + "pad " * (d % 5)}
            for d in range(120)]
    src = str(tmp_path / "docs.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    idx = str(tmp_path / "index")
    build_index([src], idx, fields=("text",), key_columns=("doc_id",),
                num_buckets=4, block_size=32)
    return src, idx


def test_snapshot_restore_roundtrip(tmp_path, ray_session):
    from noise_ray.build.incremental import add_documents
    from noise_ray.build.snapshot import restore_index, snapshot_index
    from noise_ray.ops.bm25 import bm25_topk
    from noise_ray.query.reader import IndexReader

    src, idx = _mini_index(tmp_path)
    # make it interesting: an epoch + a tombstone
    extra = str(tmp_path / "extra.parquet")
    pq.write_table(pa.Table.from_pylist(
        [{"doc_id": 200, "text": "alpha gamma fresh"}]), extra)
    add_documents(idx, [extra])
    IndexReader(idx).add_tombstones([3])

    want = bm25_topk("unused", ("alpha",), k=50, index_dir=idx)

    snap = str(tmp_path / "snap")
    r1 = snapshot_index(idx, snap)
    assert r1["transferred"] == r1["files"] > 0
    # a snapshot IS an index
    got_snap = bm25_topk("unused", ("alpha",), k=50, index_dir=snap)
    assert got_snap.equals(want)

    # restore elsewhere and query
    dest = str(tmp_path / "restored")
    restore_index(snap, dest)
    got = bm25_topk("unused", ("alpha",), k=50, index_dir=dest)
    assert got.equals(want)

    # incremental: nothing changed -> nothing transferred
    r2 = snapshot_index(idx, snap)
    assert r2["transferred"] == 0 and r2["files"] == r1["files"]

    # mutate (another tombstone) -> only the tombstone file refreshes
    # (add_tombstones atomically REPLACES the file; the snapshot's old
    # hardlink points at the superseded inode, so _transfer detects it)
    IndexReader(idx).add_tombstones([5])
    snap2 = str(tmp_path / "snap")
    r3 = snapshot_index(idx, snap2)
    assert r3["transferred"] == 1
    # ...and the re-snapshot reflects the new deletion
    got2 = bm25_topk("unused", ("alpha",), k=50, index_dir=snap2)
    want2 = bm25_topk("unused", ("alpha",), k=50, index_dir=idx)
    assert got2.equals(want2)


def test_snapshot_is_isolated_from_later_writes(tmp_path, ray_session):
    """Files are immutable + tombstones are copied, so a snapshot's
    results do not change when the live index keeps mutating."""
    from noise_ray.build.snapshot import snapshot_index
    from noise_ray.ops.bm25 import bm25_topk
    from noise_ray.query.reader import IndexReader

    src, idx = _mini_index(tmp_path)
    snap = str(tmp_path / "snap")
    snapshot_index(idx, snap)
    before = bm25_topk("unused", ("alpha",), k=50, index_dir=snap)
    IndexReader(idx).add_tombstones([0, 1, 2])
    after = bm25_topk("unused", ("alpha",), k=50, index_dir=snap)
    assert after.equals(before)
    live = bm25_topk("unused", ("alpha",), k=50, index_dir=idx)
    assert not live.equals(before)


def test_nested_snapshot_restore_roundtrip(tmp_path, ray_session):
    """Nested indexes snapshot their values partitions (and spatial
    sidecars) too — the restored copy answers values-range and scored
    queries identically."""
    from noise_ray.build.snapshot import restore_index, snapshot_index
    from noise_ray.ops.nested_docs import nested_transcripts_index
    from noise_ray.query.json_executor import run_json_query
    from noise_ray.query.json_reader import JsonIndexReader

    uni = nested_transcripts_index("/root/testdata/sf0.001")
    snap = str(tmp_path / "snap")
    snapshot_index(uni.index_dir, snap)
    dest = str(tmp_path / "restored")
    restore_index(snap, dest)
    r = JsonIndexReader(dest)
    assert r.num_docs == uni.num_docs
    for q in ("find {n_turns: >= 18.0} return ._id ;",
              'find {turns: [{role: =="assistant", text: ~="of your"}]} '
              "order score() desc, ._id asc return [._id, score()] "
              "limit 20 ;"):
        assert run_json_query(r, q) == run_json_query(uni, q)
