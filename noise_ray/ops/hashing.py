"""Vectorized 64-bit token hashing shared by the dedup operators.

The round-1 implementations hashed every shingle / token with
``hashlib.md5`` in a Python loop — the CPU wall of the signature stage at
scale.  This module replaces that with a fully vectorized pipeline:

1. Arrow kernels tokenize a whole batch (``utf8_lower`` +
   ``split_pattern_regex`` on ``[^a-z0-9]+``), matching the tokenizer the
   brute-force Jaccard oracle uses (``[a-z0-9]+`` runs of lowercased text).
2. One numpy pass over the flat token byte buffer computes a polynomial
   rolling hash per token from modular prefix sums (base ``B`` odd, so it
   is invertible mod 2**64): ``H(i..j) = B**(j-1) * (Q[j] - Q[i])`` with
   ``Q[k] = sum(data[t] * B**-t for t < k)`` — no per-token Python at all.
3. A splitmix64 finalizer avalanches the bits.

Everything is deterministic across processes and platforms (fixed
constants, explicit uint64 wrap-around arithmetic).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_B = np.uint64(0x100000001B3)          # odd -> invertible mod 2**64
_BINV = np.uint64(pow(0x100000001B3, -1, 2**64))

_old = np.seterr(over="ignore")
np.seterr(**_old)


def splitmix64(z: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain mixing constants)."""
    z = z.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z += np.uint64(0x9E3779B97F4A7C15)
        z ^= z >> np.uint64(30)
        z *= np.uint64(0xBF58476D1CE4E5B9)
        z ^= z >> np.uint64(27)
        z *= np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(31)
    return z


def _string_offsets_data(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(offsets[int64, n+1], data[uint8]) of a string/large_string array,
    honoring a possible slice offset."""
    if pa.types.is_large_string(arr.type):
        odt = np.int64
    else:
        odt = np.int32
    offs = np.frombuffer(arr.buffers()[1], dtype=odt)[
        arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return offs, data


def hash_string_array(arr: pa.Array) -> np.ndarray:
    """One uint64 hash per string, vectorized over the whole array."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.zeros(0, np.uint64)
    offs, data = _string_offsets_data(arr)
    lo, hi = int(offs[0]), int(offs[-1])
    data = data[lo:hi]
    offs = offs - lo
    m = data.size
    with np.errstate(over="ignore"):
        # Bpow[k] = B**k, Binvpow[k] = B**-k (mod 2**64), k in 0..m
        bp = np.empty(m + 1, np.uint64)
        bp[0] = np.uint64(1)
        np.multiply.accumulate(np.full(m, _B, np.uint64), out=bp[1:])
        ip = np.empty(m + 1, np.uint64)
        ip[0] = np.uint64(1)
        np.multiply.accumulate(np.full(m, _BINV, np.uint64), out=ip[1:])
        q = np.empty(m + 1, np.uint64)
        q[0] = np.uint64(0)
        np.cumsum((data.astype(np.uint64) + np.uint64(1)) * ip[:m], out=q[1:])
        i, j = offs[:-1], offs[1:]
        h = bp[np.maximum(j, 1) - 1] * (q[j] - q[i])
        # empty strings hash to a fixed sentinel (mixed 0)
    return splitmix64(h)


def tokenize_values(texts: "pa.Array | pa.ChunkedArray") -> tuple[pa.Array, np.ndarray]:
    """Tokenize a batch of texts into ``[a-z0-9]+`` runs, keeping the
    token STRINGS: ``(values[StringArray, empties removed],
    doc_offsets[int64, len(texts)+1])`` — all docs' tokens concatenated,
    with per-doc boundaries.  Shared tokenizer of the text-analysis ops;
    :func:`tokenize_hashes` is this plus the vectorized hash."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_docs = len(texts)
    if n_docs == 0:
        return pa.array([], pa.string()), np.zeros(1, np.int64)
    toks = pc.split_pattern_regex(pc.utf8_lower(texts), "[^a-z0-9]+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    values = toks.values
    list_offs = np.frombuffer(
        toks.buffers()[1],
        dtype=np.int64 if pa.types.is_large_list(toks.type) else np.int32,
    )[toks.offset : toks.offset + n_docs + 1].astype(np.int64)
    lo = int(list_offs[0])
    if lo or len(values) > int(list_offs[-1]):
        values = values.slice(lo, int(list_offs[-1]) - lo)
        list_offs = list_offs - lo
    # split_pattern_regex leaves empty tokens at the edges ("!a b!" ->
    # ["", "a", "b", ""]); drop them and rebuild per-doc counts
    voffs, _ = _string_offsets_data(values)
    nonempty = voffs[1:] > voffs[:-1]
    keep_csum = np.zeros(len(values) + 1, np.int64)
    np.cumsum(nonempty, out=keep_csum[1:])
    doc_offsets = keep_csum[list_offs]
    return values.filter(pa.array(nonempty)), doc_offsets


def tokenize_hashes(texts: "pa.Array | pa.ChunkedArray") -> tuple[np.ndarray, np.ndarray]:
    """Tokenize a batch of texts into ``[a-z0-9]+`` runs and hash each token.

    Returns ``(tok_hash[uint64], doc_offsets[int64, len(texts)+1])`` —
    token hashes for all docs concatenated, with per-doc boundaries.
    """
    values, doc_offsets = tokenize_values(texts)
    return hash_string_array(values), doc_offsets


_B2 = np.uint64(0x9E3779B97F4A7C15 | 1)   # second independent odd base
_B2INV = np.uint64(pow(int(_B2), -1, 2**64))


def hash_string_array_128(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Two independent uint64 hashes per string — a 128-bit content key
    for exact dedup grouping, where a single 64-bit key's birthday bound
    is uncomfortable at billions of documents.  Same vectorized
    polynomial construction as :func:`hash_string_array` with a second
    base; both halves avalanche through splitmix64."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.zeros(0, np.uint64), np.zeros(0, np.uint64)
    offs, data = _string_offsets_data(arr)
    lo, hi = int(offs[0]), int(offs[-1])
    data = data[lo:hi]
    offs = offs - lo
    m = data.size
    out = []
    with np.errstate(over="ignore"):
        d1 = data.astype(np.uint64) + np.uint64(1)
        for base, binv in ((_B, _BINV), (_B2, _B2INV)):
            bp = np.empty(m + 1, np.uint64)
            bp[0] = np.uint64(1)
            np.multiply.accumulate(np.full(m, base, np.uint64), out=bp[1:])
            ip = np.empty(m + 1, np.uint64)
            ip[0] = np.uint64(1)
            np.multiply.accumulate(np.full(m, binv, np.uint64), out=ip[1:])
            q = np.empty(m + 1, np.uint64)
            q[0] = np.uint64(0)
            np.cumsum(d1 * ip[:m], out=q[1:])
            i, j = offs[:-1], offs[1:]
            out.append(splitmix64(bp[np.maximum(j, 1) - 1] * (q[j] - q[i])))
    return out[0], out[1]
