"""Connected-components clustering: the star-rounds Dataset algorithm
must agree EXACTLY with a plain union-find on the same pair set, for
random graphs, worst-case chains, and the dedup entry points."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

SF = "/root/testdata/sf0.001"


def _union_find(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Reference clustering: node -> min doc_id of its component, for
    every node that appears in a non-self pair."""
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        if a == b:
            continue
        for v in (a, b):
            parent.setdefault(v, v)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def _run_cc(pairs: list[tuple[int, int]],
            local_threshold: int = 2**21) -> dict[int, int]:
    from noise_ray.ops.cluster import connected_components

    t = pa.table({"a_id": pa.array([a for a, _ in pairs], pa.int64()),
                  "b_id": pa.array([b for _, b in pairs], pa.int64())})
    out = connected_components(ray.data.from_arrow(t),
                               local_threshold=local_threshold).take_all()
    got = {r["doc_id"]: r["cluster_id"] for r in out}
    assert len(got) == len(out), "duplicate doc_id rows in cluster output"
    return got


@pytest.mark.parametrize("seed,n_nodes,n_edges", [
    (0, 40, 25), (1, 80, 80), (2, 200, 400), (3, 60, 5), (4, 30, 200),
])
def test_cc_matches_union_find_random(ray_session, seed, n_nodes, n_edges):
    rng = np.random.default_rng(seed)
    pairs = [(int(a), int(b)) for a, b in
             rng.integers(0, n_nodes, size=(n_edges, 2))]
    want = _union_find(pairs)
    # local fast path and distributed star rounds must agree exactly
    assert _run_cc(pairs) == want
    assert _run_cc(pairs, local_threshold=0) == want


def test_cc_chain_worst_case_diameter(ray_session):
    # a single path 0-1-2-...-99: max diameter, exercises the star
    # rounds' O(log^2 n) convergence rather than one-hop luck
    pairs = [(i, i + 1) for i in range(99)]
    want = {i: 0 for i in range(100)}
    assert _run_cc(pairs) == want
    assert _run_cc(pairs, local_threshold=0) == want


def test_cc_two_components_and_self_loops(ray_session):
    pairs = [(5, 3), (3, 9), (20, 21), (7, 7)]
    got = _run_cc(pairs)
    # 7 only self-pairs: no cluster row
    assert got == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20}


def test_cc_empty_pairs(ray_session):
    got = _run_cc([])
    assert got == {}


def test_anti_join_ids(ray_session):
    from noise_ray.ops.cluster import anti_join_ids

    ids = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array(range(100), pa.int64())}))
    drop = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array([2, 3, 50, 98, 200], pa.int64())}))
    out = sorted(r["doc_id"] for r in anti_join_ids(ids, drop).take_all())
    assert out == [i for i in range(100) if i not in (2, 3, 50, 98)]


def test_dedup_clusters_matches_pairs_closure(ray_session):
    """dedup_clusters == union-find over the oracle-checked pair set."""
    from noise_ray.ops.cluster import dedup_clusters
    from noise_ray.ops.dedup import ngram_jaccard_pairs

    pairs_t = ngram_jaccard_pairs(SF, threshold=0.5, max_doc=300)
    pairs = list(zip(pairs_t.column("a_id").to_pylist(),
                     pairs_t.column("b_id").to_pylist()))
    want = _union_find(pairs)
    out = dedup_clusters(SF, threshold=0.5, max_doc=300).take_all()
    got = {r["doc_id"]: r["cluster_id"] for r in out}
    assert got == want
    assert len(pairs) > 0  # the fixture corpus must actually have dups


def test_dedup_keep_first_semantics(ray_session):
    """keep_first == all docs minus non-hub members of the LSH clusters."""
    from noise_ray.ops.cluster import dedup_clusters_lsh, dedup_keep_first
    from noise_ray.ops.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(SF).take_all()
    want_cc = _union_find([(r["a_id"], r["b_id"]) for r in pairs])
    cc = {r["doc_id"]: r["cluster_id"]
          for r in dedup_clusters_lsh(SF).take_all()}
    assert cc == want_cc

    all_ids = set(pq.read_table(f"{SF}/documents.parquet",
                                columns=["doc_id"])
                  .column("doc_id").to_pylist())
    want = sorted(all_ids - {d for d, c in want_cc.items() if d != c})
    got = [r["doc_id"] for r in dedup_keep_first(SF).take_all()]
    assert got == want


def test_substring_dup_clusters_matches_reference(ray_session):
    """Star edges over window hashes + closure == union-find over the
    brute-force 'share a 12-token window' relation."""
    from noise_ray.ops.dedup import substring_dup_clusters

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    import re
    word = re.compile(r"[a-z0-9]+")
    wins = {}
    for did, txt in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
        toks = word.findall(txt.lower())
        for i in range(len(toks) - 11):
            wins.setdefault(tuple(toks[i:i + 12]), []).append(did)
    pairs = []
    for docs in wins.values():
        mn = min(docs)
        pairs.extend((d, mn) for d in docs if d != mn)
    want = _union_find(pairs)
    got = {r["doc_id"]: r["cluster_id"]
           for r in substring_dup_clusters(SF).take_all()}
    assert got == want
    assert want, "fixture corpus must contain substring duplicates"
