"""ops.pca: distributed Gram + power-iteration PCA projections."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from noise_ray.ops import pca

SF = "/root/testdata/sf0.001"


def _corpus():
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    m = np.stack([np.asarray(x, np.float64)
                  for x in t.column("embedding").to_pylist()])
    order = np.argsort(ids)
    return ids[order], m[order]


def test_gram_matches_local(ray_session):
    _, m = _corpus()
    g = pca._gram(SF)
    assert g.shape == (m.shape[1], m.shape[1])
    np.testing.assert_allclose(g, m.T @ m, rtol=1e-12)


def test_projections_match_fixed_iteration(ray_session):
    """The distributed pipeline reproduces the same fixed-round power
    iteration computed entirely in-driver."""
    ids, m = _corpus()
    gg = (m.T @ m).copy()
    comps = []
    for _ in range(2):
        v = np.full(gg.shape[0], 1.0 / np.sqrt(gg.shape[0]))
        for _ in range(6):
            w = gg @ v
            v = w / np.linalg.norm(w)
        comps.append(v)
        lam = float(v @ gg @ v)
        gg = gg - lam * np.outer(v, v)
    expect = m @ np.stack(comps).T

    out = pca.pca_project(SF).to_pandas()
    assert list(out.columns) == ["vec_id", "proj1", "proj2"]
    np.testing.assert_array_equal(out["vec_id"].to_numpy(), ids)
    np.testing.assert_allclose(out["proj1"].to_numpy(), expect[:, 0],
                               atol=1e-9)
    np.testing.assert_allclose(out["proj2"].to_numpy(), expect[:, 1],
                               atol=1e-9)


def test_component_is_near_top_eigvec(ray_session):
    """With enough rounds the first component aligns with the true top
    eigenvector of X^T X (sign-invariant)."""
    _, m = _corpus()
    g = m.T @ m
    vals, vecs = np.linalg.eigh(g)
    top = vecs[:, -1]
    v = pca._power_components(g, 1, 60)[0]
    assert abs(float(v @ top)) > 0.99


def test_components_orthonormal():
    # spectrum with clear gaps so the fixed-round iteration converges
    rng = np.random.default_rng(7)
    x = rng.normal(size=(200, 16)) * (2.0 ** -np.arange(16))
    c = pca._power_components(x.T @ x, 2, 40)
    np.testing.assert_allclose(np.linalg.norm(c, axis=1), 1.0, atol=1e-12)
    assert abs(float(c[0] @ c[1])) < 1e-6
