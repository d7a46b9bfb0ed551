"""Property test for the in-process star-round kernels (_emit /
_star_reduce / _local_cc): pure numpy, no Ray session — hypothesis
drives arbitrary small graphs against a union-find reference, including
the degenerate shapes (self-loops only, parallel edges, long chains)
random sampling rarely hits."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st


def _union_find(pairs):
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        if a == b:
            continue
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


edge = st.tuples(st.integers(0, 30), st.integers(0, 30))


@settings(max_examples=300, deadline=None)
@given(st.lists(edge, max_size=120))
def test_local_cc_matches_union_find(pairs):
    from noise_ray.ops.cluster import _local_cc

    t = pa.table({"a_id": pa.array([a for a, _ in pairs], pa.int64()),
                  "b_id": pa.array([b for _, b in pairs], pa.int64())})
    out = _local_cc(t, max_rounds=64)
    got = dict(zip(out.column("doc_id").to_pylist(),
                   out.column("cluster_id").to_pylist()))
    assert len(got) == out.num_rows
    assert got == _union_find(pairs)


@settings(max_examples=50, deadline=None)
@given(st.integers(2, 200))
def test_local_cc_chain(n):
    from noise_ray.ops.cluster import _local_cc

    t = pa.table({"a_id": pa.array(range(n - 1), pa.int64()),
                  "b_id": pa.array(range(1, n), pa.int64())})
    out = _local_cc(t, max_rounds=64)
    assert out.column("cluster_id").to_pylist() == [0] * n
