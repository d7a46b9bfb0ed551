"""Vectorized varint / delta codecs for posting blocks.

Postings are stored per block as LEB128-style varints (7 data bits per byte,
high bit = continuation), doc_ids delta-encoded within a block and positions
delta-encoded within each document — the columnar analogue of the reference's
varint posting values (/root/reference/src/json_shred.rs:176-182,
src/key_builder.rs:64-82).  Encode/decode are numpy-vectorized: no Python
loop over values.
"""

from __future__ import annotations

import numpy as np

_MAX_BYTES = 10  # enough for uint64


def encode_varint(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64/int64 array (values must be >= 0)."""
    v = np.asarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b""
    # byte i of each value: (v >> 7i) & 0x7f, emitted while v >= 2^(7i)
    shifts = (np.arange(_MAX_BYTES, dtype=np.uint64) * np.uint64(7))[None, :]
    chunks = (v[:, None] >> shifts).astype(np.uint64)
    data = (chunks & np.uint64(0x7F)).astype(np.uint8)
    # needed[i,j] = True if byte j is part of value i's encoding
    needed = chunks != 0
    needed[:, 0] = True  # at least one byte per value
    # a byte is needed if ANY later chunk is nonzero (fill holes): suffix-or
    needed = np.logical_or.accumulate(needed[:, ::-1], axis=1)[:, ::-1]
    # continuation bit on all but the last needed byte
    last = needed.sum(axis=1) - 1
    cont = needed.copy()
    cont[np.arange(n), last] = False
    data = data | (cont.astype(np.uint8) << 7)
    return data[needed].tobytes()


def decode_varint(buf: bytes | memoryview, count: int | None = None) -> np.ndarray:
    """Decode LEB128 bytes to a uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.zeros(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    offsets = np.arange(b.size, dtype=np.int64) - np.repeat(starts, ends - starts + 1)
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << (
        offsets.astype(np.uint64) * np.uint64(7)
    )
    out = np.add.reduceat(contrib, starts)
    if count is not None and out.size != count:
        raise ValueError(f"varint decode: expected {count} values, got {out.size}")
    return out


def encode_deltas(sorted_values: np.ndarray) -> bytes:
    """Delta+varint encode an ascending int64 array (first value absolute)."""
    v = np.asarray(sorted_values, dtype=np.int64)
    if v.size == 0:
        return b""
    d = np.empty_like(v)
    d[0] = v[0]
    np.subtract(v[1:], v[:-1], out=d[1:])
    if d.size > 1 and d[1:].min() < 0:
        raise ValueError("encode_deltas requires ascending input")
    return encode_varint(d.astype(np.uint64))


def decode_deltas(buf: bytes | memoryview, count: int | None = None) -> np.ndarray:
    """Inverse of :func:`encode_deltas` → int64 array."""
    d = decode_varint(buf, count)
    return np.cumsum(d.astype(np.int64))


def encode_position_lists(positions_concat: np.ndarray, tfs: np.ndarray) -> bytes:
    """Encode concatenated per-doc position lists, delta-coded within a doc.

    ``positions_concat`` holds each doc's ascending positions back to back;
    ``tfs`` gives the per-doc list lengths (the split points).
    """
    p = np.asarray(positions_concat, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    if p.size == 0:
        return b""
    d = np.empty_like(p)
    d[0] = p[0]
    np.subtract(p[1:], p[:-1], out=d[1:])
    starts = np.zeros(tfs.size, dtype=np.int64)
    np.cumsum(tfs[:-1], out=starts[1:])
    d[starts] = p[starts]  # reset delta at each doc boundary
    return encode_varint(d.astype(np.uint64))


def decode_position_lists(buf: bytes | memoryview, tfs: np.ndarray) -> np.ndarray:
    """Inverse of :func:`encode_position_lists` → concatenated positions."""
    tfs = np.asarray(tfs, dtype=np.int64)
    total = int(tfs.sum())
    d = decode_varint(buf, total).astype(np.int64)
    if total == 0:
        return d
    starts = np.zeros(tfs.size, dtype=np.int64)
    np.cumsum(tfs[:-1], out=starts[1:])
    out = np.cumsum(d)
    # subtract the running total at each doc start to undo the global cumsum
    # (valid because all deltas are >= 0, so `out` is non-decreasing)
    base = np.zeros(total, dtype=np.int64)
    base[starts[1:]] = out[starts[1:] - 1]
    base = np.maximum.accumulate(base)
    return out - base
