"""Distributed nested evaluation ≡ in-process evaluation.

The range fan-out (json_executor._evaluate_distributed) is exact because
every filter, score and bind collection is per-doc independent and term
stats are global — asserted here by forcing the distributed path on a
small corpus and comparing full result streams."""

from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="module")
def nested_idx(tmp_path_factory):
    from noise_ray.build.json_pipeline import build_json_index, docs_to_parquet

    base = str(tmp_path_factory.mktemp("njdist"))
    docs = []
    words = ["quick", "brown", "fox", "lazy", "dog", "engine", "ray"]
    for i in range(200):
        docs.append({
            "_id": f"d{i:03d}",
            "msgs": [{"who": ["u", "b"][t % 2],
                      "t": " ".join(words[(i + t + j) % len(words)]
                                    for j in range(4))}
                     for t in range(1 + i % 4)],
            "n": float(i % 17),
            # two geo clusters, exercising the grid-bucketed bbox read
            # inside range workers
            "geometry": {"type": "Point",
                         "coordinates": [(-100.0 if i % 2 else 15.0)
                                         + (i % 9) * 0.01,
                                         (30.0 if i % 2 else -40.0)
                                         + (i % 7) * 0.01]},
        })
    paths = []
    for s in range(4):
        paths.append(docs_to_parquet(
            docs[s * 50:(s + 1) * 50],
            os.path.join(base, f"in{s}.parquet"), docid_base=s * 50))
    idx = os.path.join(base, "idx")
    build_json_index(paths, idx, num_buckets=8, docs_per_range=50)
    return idx


QUERIES = [
    'find {msgs: [{t: ~="fox", who: =="u"}]} order score() desc '
    "return [._id, score()] ;",
    'find {msgs: [{t: ~="quick brown"}]} return ._id ;',
    'find {n: >= 5, n: < 12} return [._id, .n] ;',
    'find {msgs: [{t: ~="engine"}]} && !{msgs: [{t: ~="dog"}]} '
    "return ._id ;",
    'find {msgs: [{t: ~="ray"}]} return {n: count()} ;',
    # worker-side top-k prune (score desc + limit), incl. ties
    'find {msgs: [{t: ~="fox"}]} order score() desc '
    "return [._id, score()] limit 7 ;",
    # worker-side head prune (no order + limit)
    'find {n: >= 3} return ._id limit 9 ;',
    # per-range partial aggregate folds (group/sum/avg/max/array/concat)
    'find {msgs: [{who: =="b"}]} return {g: group(.n), s: sum(.n), '
    "a: avg(.n), m: max(.n), ids: array(._id)} ;",
    'find {n: < 9} return {g: group(.n), c: concat(._id sep="|")} ;',
    # aggregate WITH limit: driver-side buffered early-cut fallback
    'find {msgs: [{who: =="u"}]} return {g: group(.n), '
    "c: count()} limit 3 ;",
    # AllDocs root aggregate: string-seq fold order, driver fallback
    "find {} return {c: count(), ids: array(._id)} ;",
    # bind collection with worker-side top-k prune
    'find {msgs: x::[{t: ~="engine"}]} order score() desc '
    "return [._id, x.who] limit 5 ;",
    # grid-bucketed bbox read under range workers (one cluster only)
    'find {geometry: && [-101, 29, -99, 31]} return ._id ;',
    # bbox AND a selective term: candidate-pushdown path
    'find {geometry: && [14, -41, 16, -39], msgs: [{t: ~="engine"}]} '
    "return ._id ;",
]


def test_distributed_matches_inprocess(ray_session, nested_idx):
    from noise_ray.query.json_executor import run_json_query
    from noise_ray.query.json_reader import JsonIndexReader

    r = JsonIndexReader(nested_idx)
    assert r.num_ranges > 1  # the fan-out actually partitions
    for q in QUERIES:
        local = run_json_query(r, q)
        dist = run_json_query(r, q, distributed_threshold=1)
        assert local == dist, q
        assert local  # non-empty: the comparison is meaningful
