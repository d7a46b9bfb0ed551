"""JSONL → nested index end to end: the ingestion path for arbitrary
JSON document files (jsonl_to_doc_parquet + build_json_index), including
the per-file auto-id prefixes that keep _id-less docs from colliding
across files."""

from __future__ import annotations

import json
import os


def test_jsonl_to_nested_index(ray_session, tmp_path):
    from noise_ray.build import build_json_index
    from noise_ray.build.json_pipeline import jsonl_to_doc_parquet
    from noise_ray.query import JsonIndexReader, run_json_query

    base = str(tmp_path)
    f1 = os.path.join(base, "a.jsonl")
    f2 = os.path.join(base, "b.jsonl")
    with open(f1, "w") as f:
        f.write(json.dumps({"_id": "x", "msgs": [{"t": "quick fox"}]}) + "\n")
        f.write(json.dumps({"msgs": [{"t": "lazy dog"}]}) + "\n")  # no _id
    with open(f2, "w") as f:
        f.write(json.dumps({"msgs": [{"t": "brown fox"}]}) + "\n")  # no _id
        f.write(json.dumps({"_id": "y", "n": 5}) + "\n")

    shards = jsonl_to_doc_parquet([f1, f2], os.path.join(base, "conv"))
    idx = os.path.join(base, "idx")
    build_json_index(shards, idx, num_buckets=4)
    r = JsonIndexReader(idx)
    assert r.num_docs == 4

    ids = run_json_query(r, 'find {msgs: [{t: ~="fox"}]} return ._id ;')
    # auto-ids carry a (destination, file) prefix: no collisions across
    # files or across separate ingest calls
    assert ids[0] == "x" and ids[1].startswith("doc") \
        and ids[1].endswith("-1-0")
    assert run_json_query(r, "find {n: >= 5} return ._id ;") == ["y"]
    # every auto-id is unique
    import numpy as np

    all_ids = r.doc_id_strs(np.arange(4))
    assert len(set(all_ids)) == 4
