"""ops.sketch: count-min sketch + heavy-hitter readout."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from noise_ray.ops import sketch
from noise_ray.ops.hashing import tokenize_hashes

SF = "/root/testdata/sf0.001"


def test_sketch_total_mass(ray_session):
    """Every sketch row sums to the corpus token count (each token lands
    in exactly one cell per row)."""
    sk = sketch._sketch(SF)
    t = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    hs, _ = tokenize_hashes(t.column("text").combine_chunks())
    assert sk.shape == (sketch._D, sketch._W)
    assert (sk.sum(axis=1) == hs.size).all()


def test_estimates_upper_bound_and_tight(ray_session):
    out = sketch.countmin_heavy(SF).to_pandas()
    assert list(out.columns) == ["term", "n", "est_n"]
    assert len(out) == 20
    # count-min never underestimates
    assert (out.est_n >= out.n).all()
    # ordered by (n desc, term asc)
    assert (out.n.values == np.sort(out.n.values)[::-1]).all()
    # with w=1024 >> top-20 vocabulary pressure, the heavy terms'
    # estimates stay within a small additive error of the truth
    assert (out.est_n - out.n).max() < out.n.min()


def test_merge_order_invariance():
    """Partial grids add elementwise — any merge order gives the same
    sketch (the mergeability property the op exists for)."""
    rng = np.random.default_rng(3)
    hs = rng.integers(0, 2**63, size=1000, dtype=np.uint64)
    full = np.zeros((sketch._D, sketch._W), np.int64)
    for r, cells in enumerate(sketch._cells(hs)):
        full[r] += np.bincount(cells, minlength=sketch._W)
    acc = np.zeros_like(full)
    for lo in (500, 0):  # reversed chunk order
        part = np.zeros_like(full)
        for r, cells in enumerate(sketch._cells(hs[lo:lo + 500])):
            part[r] += np.bincount(cells, minlength=sketch._W)
        acc += part
    assert (acc == full).all()


def test_bit_length_exact():
    rng = np.random.default_rng(11)
    w = rng.integers(0, 2**63, size=5000, dtype=np.uint64)
    w = np.r_[w, np.uint64([0, 1, 2**32 - 1, 2**32, 2**53, 2**53 + 1,
                            2**55 - 1, 2**63 - 1])]
    got = sketch._bit_length_u64(w)
    want = np.array([int(x).bit_length() for x in w])
    assert (got == want).all()


def test_hll_estimate_accuracy():
    """On 100k random distinct hashes the p=9 estimate lands within the
    ~3 sigma relative error band (1.04/sqrt(512) ~ 4.6%)."""
    rng = np.random.default_rng(5)
    hs = np.unique(rng.integers(0, 2**64, size=100_000, dtype=np.uint64))
    reg, rho = sketch._hll_rho(hs)
    m = float(sketch._HLL_M)
    grid = np.zeros(sketch._HLL_M, np.int64)
    np.maximum.at(grid, reg, rho)
    s = (grid == 0).sum() + np.sum(2.0 ** (-grid[grid > 0].astype(float)))
    est = (0.7213 / (1.0 + 1.079 / m)) * m * m / s
    assert abs(est - hs.size) / hs.size < 0.15


def test_hll_pipeline_rows(ray_session):
    out = sketch.hll_distinct(SF).to_pandas()
    assert list(out.columns) == ["source", "register", "rho", "est_distinct"]
    # registers are per-source strictly increasing, rho >= 1
    assert (out.rho >= 1).all()
    for _, g in out.groupby("source"):
        assert g.register.is_monotonic_increasing
        assert g.est_distinct.nunique() == 1
