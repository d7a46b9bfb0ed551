import numpy as np
import pytest
from hypothesis import given, strategies as st

from noise_ray.build.codec import (
    decode_deltas,
    decode_position_lists,
    decode_varint,
    encode_deltas,
    encode_position_lists,
    encode_varint,
)


def test_varint_roundtrip_simple():
    v = np.array([0, 1, 127, 128, 255, 300, 16383, 16384, 2**32, 2**63 - 1], dtype=np.uint64)
    assert (decode_varint(encode_varint(v)) == v).all()


def test_varint_empty():
    assert encode_varint(np.array([], dtype=np.uint64)) == b""
    assert decode_varint(b"").size == 0


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
def test_varint_roundtrip_hypothesis(vals):
    v = np.array(vals, dtype=np.uint64)
    assert (decode_varint(encode_varint(v), v.size) == v).all()


@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=200))
def test_delta_roundtrip(vals):
    v = np.sort(np.array(vals, dtype=np.int64))
    assert (decode_deltas(encode_deltas(v), v.size) == v).all()


def test_delta_rejects_unsorted():
    with pytest.raises(ValueError):
        encode_deltas(np.array([5, 3], dtype=np.int64))


def test_position_lists_roundtrip():
    # three docs with position lists [0,2,7], [1], [0,1,2,3]
    pos = np.array([0, 2, 7, 1, 0, 1, 2, 3], dtype=np.int64)
    tfs = np.array([3, 1, 4], dtype=np.int64)
    enc = encode_position_lists(pos, tfs)
    assert (decode_position_lists(enc, tfs) == pos).all()


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=10000), min_size=1, max_size=20),
        min_size=1,
        max_size=30,
    )
)
def test_position_lists_hypothesis(lists):
    lists = [sorted(set(l)) for l in lists]
    pos = np.array([p for l in lists for p in l], dtype=np.int64)
    tfs = np.array([len(l) for l in lists], dtype=np.int64)
    enc = encode_position_lists(pos, tfs)
    assert (decode_position_lists(enc, tfs) == pos).all()
