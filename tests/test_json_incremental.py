"""Nested-index lifecycle: epoch adds, upserts, deletes, compaction.

Mirrors the flat lifecycle guarantees: an epoch add is queryable
immediately with doc_ids continuing the seq space; re-adding an ``_id``
shadows the old doc; deletes hide docs; compaction folds everything into
a fresh base whose query results equal a fresh build over the live
documents."""

from __future__ import annotations

import os

import pytest

DOCS_A = [
    {"_id": "a", "msgs": [{"t": "quick brown fox"}], "n": 1},
    {"_id": "b", "msgs": [{"t": "lazy dog"}], "n": 2},
    {"_id": "c", "msgs": [{"t": "fox season"}], "n": 3},
]
DOCS_B = [
    {"_id": "a", "msgs": [{"t": "updated fox text"}], "n": 10},  # upsert
    {"_id": "d", "msgs": [{"t": "quick quick fox"}], "n": 4},
]

QUERIES = [
    'find {msgs: [{t: ~="fox"}]} order score() desc '
    "return [._id, score()] ;",
    'find {n: > 2} return [._id, .n] ;',
    'find {msgs: [{t: ~="quick"}]} return ._id ;',
]


def _run_all(idx):
    from noise_ray.query.json_executor import run_json_query
    from noise_ray.query.json_reader import JsonIndexReader

    r = JsonIndexReader(idx)
    return [run_json_query(r, q) for q in QUERIES]


def test_epoch_add_upsert_delete_compact(ray_session, tmp_path):
    from noise_ray.build.json_incremental import (
        add_json_documents, compact_json_index,
    )
    from noise_ray.build.json_pipeline import build_json_index, docs_to_parquet
    from noise_ray.query.json_executor import run_json_query
    from noise_ray.query.json_reader import JsonIndexReader

    base = str(tmp_path)
    p0 = docs_to_parquet(DOCS_A, os.path.join(base, "in0.parquet"))
    idx = os.path.join(base, "idx")
    build_json_index([p0], idx, num_buckets=8)

    p1 = docs_to_parquet(DOCS_B, os.path.join(base, "in1.parquet"),
                         docid_base=3)
    m = add_json_documents(idx, [p1])
    assert m["tombstoned"] == [0]  # old "a" shadowed

    r = JsonIndexReader(idx)
    assert r.num_docs == 5 and r.tombstones.tolist() == [0]
    ids = run_json_query(r, 'find {msgs: [{t: ~="fox"}]} return ._id ;')
    assert ids == ["c", "a", "d"]  # new "a" at seq 3; old hidden
    assert run_json_query(r, 'find {n: > 5} return [._id, .n] ;') == \
        [["a", 10.0]]
    assert r.lookup_id("a") == 3

    # delete "d"
    r.add_tombstones([4])
    r2 = JsonIndexReader(idx)
    assert run_json_query(
        r2, 'find {msgs: [{t: ~="fox"}]} return ._id ;') == ["c", "a"]

    # compaction ≡ fresh build over live docs (b, c, a-updated)
    before = _run_all(idx)
    compact_json_index(idx)
    assert _run_all(idx) == before

    live = [{"_id": "b", "msgs": [{"t": "lazy dog"}], "n": 2},
            {"_id": "c", "msgs": [{"t": "fox season"}], "n": 3},
            {"_id": "a", "msgs": [{"t": "updated fox text"}], "n": 10}]
    fresh_dir = os.path.join(base, "fresh")
    pf = docs_to_parquet(live, os.path.join(base, "fresh.parquet"))
    build_json_index([pf], fresh_dir, num_buckets=8)
    assert _run_all(idx) == _run_all(fresh_dir)


def test_not_after_upsert_ignores_tombstoned_lengths(ray_session, tmp_path):
    """Regression: a tombstoned doc's array length must not scatter onto
    the next live doc in NOT's candidate walk — an unrelated upsert used
    to fabricate NOT instances and flip query results."""
    from noise_ray.build.json_incremental import add_json_documents
    from noise_ray.build.json_pipeline import build_json_index, docs_to_parquet
    from noise_ray.query.json_executor import run_json_query
    from noise_ray.query.json_reader import JsonIndexReader

    base = str(tmp_path)
    docs = [
        {"_id": "t", "arr": [{"x": "a"}, {"x": "a"}, {"x": "a"},
                             {"x": "a"}]},
        {"_id": "d", "arr": [{"y": "a"}, {"y": "b"}, {"y": "r"}]},
        {"_id": "e", "arr": [{"x": "q"}]},
    ]
    p = docs_to_parquet(docs, os.path.join(base, "in.parquet"))
    idx = os.path.join(base, "idx")
    build_json_index([p], idx, num_buckets=4)
    q = 'find {arr: [{x: != "q", y: == "r"}]} return ._id ;'
    before = run_json_query(JsonIndexReader(idx), q)
    assert before == []
    # upsert doc "t" (tombstones doc 0, whose arr has length 4)
    p2 = docs_to_parquet([{"_id": "t", "arr": [{"x": "zz"}]}],
                         os.path.join(base, "in2.parquet"), docid_base=3)
    add_json_documents(idx, [p2])
    assert run_json_query(JsonIndexReader(idx), q) == before
