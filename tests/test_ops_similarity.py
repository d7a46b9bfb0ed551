"""Similarity-search operator tests: the bucketed ANN path is lossy by
design (rows-only at the oracle gate), so recall against the exact
brute-force path is pinned here instead."""

import numpy as np

SF = "/root/testdata/sf0.001"


def _recall_per_query(exact, approx):
    out = []
    for q in sorted(set(exact.query_id)):
        e = set(exact[exact.query_id == q].vec_id)
        a = set(approx[approx.query_id == q].vec_id)
        out.append(len(e & a) / len(e))
    return out


def test_ann_bucketed_routes_and_recalls(ray_session):
    from noise_ray.ops import similarity

    exact = similarity.ann_topk_bruteforce(SF).to_pandas()
    approx = similarity.ann_bucketed(SF).to_pandas()
    # same shape contract as the exact path
    assert list(approx.columns) == ["query_id", "rank", "vec_id"]
    for q, grp in approx.groupby("query_id"):
        assert list(grp["rank"]) == list(range(1, len(grp) + 1))
        assert grp.vec_id.nunique() == len(grp)
        assert (grp.vec_id >= 5).all()  # queries never return themselves
    rec = _recall_per_query(exact, approx)
    # near-uniform synthetic vectors are the ANN worst case; the defaults
    # are tuned for ~0.6-0.8 measured recall there (see docstring)
    assert np.mean(rec) >= 0.5, rec


def test_ann_bucketed_more_tables_more_recall(ray_session):
    """Recall is monotone-ish in table count: the exhaustive limit
    (every bucket probed) must reproduce the exact result."""
    from noise_ray.ops import similarity

    exact = similarity.ann_topk_bruteforce(SF).to_pandas()
    # 1 plane/table -> each probe plan covers both half-spaces (own
    # bucket + the single 1-bit neighbor) == full corpus scan
    full = similarity.ann_bucketed(SF, n_planes=1, n_tables=1).to_pandas()
    assert full.equals(exact)


def test_ann_ivf_recall_and_exhaustive_limit(ray_session):
    """IVF recall at defaults; probing every list reproduces brute force."""
    from noise_ray.ops import similarity

    exact = similarity.ann_topk_bruteforce(SF).to_pandas()
    ivf = similarity.ann_ivf(SF).to_pandas()
    assert list(ivf.columns) == ["query_id", "rank", "vec_id"]
    for q, grp in ivf.groupby("query_id"):
        assert list(grp["rank"]) == list(range(1, len(grp) + 1))
        assert (grp.vec_id >= 5).all()
    rec = _recall_per_query(exact, ivf)
    # near-uniform vectors + corpus-sample centroids: nprobe/n_centroids
    # of the corpus is scanned, so recall ~ that fraction is the floor
    assert np.mean(rec) >= 0.3, rec
    full = similarity.ann_ivf(SF, n_centroids=8, nprobe=8).to_pandas()
    assert full.equals(exact)


def test_semdedup_within_cluster_rule(ray_session):
    """Survivor set == brute-force application of the pairwise drop rule:
    j is dropped iff some i<j in the SAME cluster has cosine >= t."""
    import pyarrow.parquet as pq

    from noise_ray.ops import similarity

    out = similarity.semdedup(SF, threshold=0.45).to_pandas()
    clusters = similarity.kmeans_embeddings(SF).to_pandas()
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"]).to_pandas()
    m = np.stack(t.embedding.to_numpy())
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    sims = mn @ mn.T
    cl = clusters.set_index("vec_id").cluster
    keep = [j for j in sorted(t.vec_id)
            if not any(sims[i, j] >= 0.45 and cl[i] == cl[j]
                       for i in range(j))]
    assert sorted(out.vec_id) == keep
    # survivors keep their cluster assignment
    assert (out.set_index("vec_id").cluster
            == cl[out.vec_id].values).all()


def test_ann_filtered_matches_numpy_recomputation(ray_session):
    """Filtered kNN == brute-force cosine over the label-matching
    subset, recomputed directly with numpy off the parquet file."""
    import pyarrow.parquet as pq

    from noise_ray.ops import similarity

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding", "label"])
    ids = t.column("vec_id").to_numpy()
    lbl = t.column("label").to_numpy()
    m = similarity.embed_matrix(t.column("embedding"))
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    want = []
    cand = (ids >= 5) & (lbl == 3)
    for qi in np.flatnonzero(ids < 5):
        sims = mn[qi] @ mn[cand].T
        cids = ids[cand]
        order = np.lexsort((cids, -sims))[:10]
        want.extend((int(ids[qi]), r, int(cids[i]))
                    for r, i in enumerate(order, 1))

    got = similarity.ann_filtered(SF, label=3)
    rows = list(zip(got.column("query_id").to_pylist(),
                    got.column("rank").to_pylist(),
                    got.column("vec_id").to_pylist()))
    assert rows == want
    # every hit carries the filter label
    by_id = dict(zip(ids.tolist(), lbl.tolist()))
    assert all(by_id[v] == 3 for _, _, v in rows)


def test_ann_ivf_filtered_exhaustive_limit(ray_session):
    """Probing every list reproduces the exact filtered result; default
    nprobe keeps the shape contract and only label-matching hits."""
    import pyarrow.parquet as pq

    from noise_ray.ops import similarity

    exact = similarity.ann_filtered(SF, label=3).to_pandas()
    full = similarity.ann_ivf_filtered(SF, nprobe=32, label=3).to_pandas()
    assert full.equals(exact)

    ivf = similarity.ann_ivf_filtered(SF, label=3).to_pandas()
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "label"])
    by_id = dict(zip(t.column("vec_id").to_pylist(),
                     t.column("label").to_pylist()))
    for q, grp in ivf.groupby("query_id"):
        assert list(grp["rank"]) == list(range(1, len(grp) + 1))
        assert all(by_id[v] == 3 for v in grp.vec_id)
    rec = _recall_per_query(exact, ivf)
    assert np.mean(rec) >= 0.1, rec
