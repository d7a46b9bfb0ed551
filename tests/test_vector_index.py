"""IVF-partitioned vector index (build/vector_index.py): the indexed
query path must reproduce ops/similarity.ann_ivf exactly, degrade to
brute force at nprobe == n_centroids, and read ONLY probed lists."""

import glob
import os
import shutil

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def vec_index(ray_session, tmp_path_factory):
    from noise_ray.build.vector_index import build_vector_index

    d = str(tmp_path_factory.mktemp("vecidx"))
    build_vector_index(f"{SF}/embeddings.parquet", d,
                       n_centroids=32, reserve=5)
    return d


def test_indexed_equals_compute_pruned(ray_session, vec_index):
    from noise_ray.build.vector_index import ann_ivf_indexed
    from noise_ray.ops.similarity import ann_ivf

    a = ann_ivf(SF).to_pandas()
    b = ann_ivf_indexed(SF, index_dir=vec_index).to_pandas()
    assert a.equals(b)


def test_full_probe_equals_bruteforce(ray_session, vec_index):
    from noise_ray.build.vector_index import ann_ivf_indexed
    from noise_ray.ops.similarity import ann_topk_bruteforce

    a = ann_topk_bruteforce(SF).to_pandas()
    b = ann_ivf_indexed(SF, nprobe=32, index_dir=vec_index).to_pandas()
    assert a.equals(b)


def test_partition_layout_and_coverage(vec_index):
    import json

    import pyarrow.parquet as pq

    with open(os.path.join(vec_index, "vector_manifest.json")) as f:
        man = json.load(f)
    files = sorted(glob.glob(os.path.join(vec_index, "lists/*.parquet")))
    assert len(files) == len(man["lists"]) > 1
    total = sum(pq.read_metadata(p).num_rows for p in files)
    src = pq.read_metadata(f"{SF}/embeddings.parquet").num_rows
    assert total == src  # every vector landed in exactly one list
    assert sum(d["rows"] for d in man["lists"]) == total


def test_query_reads_only_probed_lists(ray_session, vec_index, tmp_path):
    """Delete every list file a query does NOT probe; the result must be
    unchanged — proof the read is pruned to the probe set."""
    import json

    import numpy as np

    from noise_ray.build.vector_index import ann_ivf_indexed, ivf_query
    from noise_ray.ops.similarity import _load_queries

    before = ann_ivf_indexed(SF, index_dir=vec_index).to_pandas()

    work = str(tmp_path / "pruned")
    shutil.copytree(vec_index, work)
    with open(os.path.join(work, "vector_manifest.json")) as f:
        man = json.load(f)
    cn = np.asarray(man["centroids"])
    qids, qn = _load_queries(SF, 5)
    csims = qn @ cn.T
    probed = set()
    for qi in range(qn.shape[0]):
        probed.update(int(x) for x in
                      np.lexsort((np.arange(cn.shape[0]), -csims[qi]))[:4])
    removed = 0
    for d in man["lists"]:
        if d["list"] not in probed:
            os.remove(os.path.join(work, d["path"]))
            removed += 1
    assert removed > 0  # the probe sets must not cover everything
    after = ann_ivf_indexed(SF, index_dir=work).to_pandas()
    assert before.equals(after)


def test_add_vectors_epoch_visible_and_equal_to_rebuild(ray_session,
                                                        tmp_path):
    """Epoch-append new vectors, then compare the probed query against a
    fresh index built over the concatenated corpus — same centroids
    (frozen at the base build) must give identical results."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from noise_ray.build.vector_index import (add_vectors,
                                              build_vector_index, ivf_query)
    from noise_ray.ops.similarity import _load_queries

    base_t = pq.read_table(f"{SF}/embeddings.parquet",
                           columns=["vec_id", "embedding"])
    half = base_t.num_rows // 2
    p0 = str(tmp_path / "base.parquet")
    p1 = str(tmp_path / "delta.parquet")
    pq.write_table(base_t.slice(0, half), p0)
    pq.write_table(base_t.slice(half), p1)

    inc = str(tmp_path / "inc")
    build_vector_index(p0, inc, n_centroids=16, reserve=5)
    man = add_vectors(inc, p1)
    assert man["epochs"] == 1
    assert sum(d["rows"] for d in man["lists"]) == base_t.num_rows

    full = str(tmp_path / "full")
    build_vector_index(f"{SF}/embeddings.parquet", full,
                       n_centroids=16, reserve=5)

    qids, qn = _load_queries(SF, 5)
    a = ivf_query(inc, qn, qids, k=10, nprobe=3,
                  exclude_below=5).to_pandas()
    b = ivf_query(full, qn, qids, k=10, nprobe=3,
                  exclude_below=5).to_pandas()
    assert a.equals(b) and len(a) == 50


def test_compact_vector_index(ray_session, tmp_path):
    """After epoch-append + compaction: one file per list again, epoch
    files gone, query results unchanged."""
    import pyarrow.parquet as pq

    from noise_ray.build.vector_index import (add_vectors,
                                              build_vector_index,
                                              compact_vector_index,
                                              ivf_query)
    from noise_ray.ops.similarity import _load_queries

    base_t = pq.read_table(f"{SF}/embeddings.parquet",
                           columns=["vec_id", "embedding"])
    half = base_t.num_rows // 2
    p0 = str(tmp_path / "base.parquet")
    p1 = str(tmp_path / "delta.parquet")
    pq.write_table(base_t.slice(0, half), p0)
    pq.write_table(base_t.slice(half), p1)
    idx = str(tmp_path / "idx")
    build_vector_index(p0, idx, n_centroids=16, reserve=5)
    add_vectors(idx, p1)

    qids, qn = _load_queries(SF, 5)
    before = ivf_query(idx, qn, qids, k=10, nprobe=3,
                       exclude_below=5).to_pandas()
    man = compact_vector_index(idx)
    assert man["epochs"] == 0
    assert not glob.glob(os.path.join(idx, "lists/*epoch*"))
    assert all(not d["epoch_paths"] for d in man["lists"])
    after = ivf_query(idx, qn, qids, k=10, nprobe=3,
                      exclude_below=5).to_pandas()
    assert before.equals(after)


def test_build_resume_after_partial_failure(ray_session, tmp_path):
    """Re-running build_vector_index after a simulated crash (manifest
    missing, one list file gone) reproduces the same index and the same
    query results — every write is tmp+rename idempotent and the
    manifest publishes last."""
    from noise_ray.build.vector_index import build_vector_index, ivf_query
    from noise_ray.ops.similarity import _load_queries

    idx = str(tmp_path / "idx")
    build_vector_index(f"{SF}/embeddings.parquet", idx,
                       n_centroids=16, reserve=5)
    qids, qn = _load_queries(SF, 5)
    before = ivf_query(idx, qn, qids, k=10, nprobe=3,
                       exclude_below=5).to_pandas()

    os.remove(os.path.join(idx, "vector_manifest.json"))
    victim = sorted(glob.glob(os.path.join(idx, "lists/*.parquet")))[0]
    os.remove(victim)
    build_vector_index(f"{SF}/embeddings.parquet", idx,
                       n_centroids=16, reserve=5)
    after = ivf_query(idx, qn, qids, k=10, nprobe=3,
                      exclude_below=5).to_pandas()
    assert before.equals(after)


def test_filtered_indexed_matches_streaming_filtered(ray_session, tmp_path):
    """The persistent filtered-IVF path (label stored in the lists,
    predicate pushed into the routed read) is bit-identical to the
    streaming ann_ivf_filtered."""
    from noise_ray.build.vector_index import ann_ivf_filtered_indexed
    from noise_ray.ops.similarity import ann_ivf_filtered

    want = ann_ivf_filtered(SF, label=3).to_pandas()
    got = ann_ivf_filtered_indexed(
        SF, label=3, index_dir=str(tmp_path / "vecidx")).to_pandas()
    assert got.equals(want)
