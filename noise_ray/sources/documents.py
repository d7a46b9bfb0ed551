"""Deterministic synthetic ``documents``-table generator for scale runs.

The testdata ships `documents.parquet` only up to 5k rows (sf0.1); the
corpus-analytics operators (dedup, packing, redaction, contamination)
need orders of magnitude more rows to demonstrate their scale shape.
This generator reproduces the exact testdata schema
``(doc_id:int64, text:string, lang:string, source:string,
n_chars:int64)`` at any size, fully seeded.

Content is a pure per-doc function of (seed, doc_id) built from
vectorized splitmix64 draws — independent of ``num_files`` and of
where generation runs, like sources/transcripts.py.  Structure the
operators exploit:

- Zipf-ish vocabulary skew (rank = nv * u^3) so hot terms exist;
- every 100-doc block carries one EXACT duplicate pair (x00+7 = x00+8's
  text) and one NEAR duplicate (x00+9 = that text + one extra word), so
  exact/MinHash/SimHash dedup and cluster closure have real targets;
- lang/source drawn per doc from the same 5/20 values the testdata uses.

The output directory is laid out as ``<root>/documents.parquet/part-*``
— a parquet DATASET directory with the table's name, so the generated
root can stand in for an ``sf_dir`` in every operator that reads
``f"{sf_dir}/documents.parquet"``.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..ops.hashing import splitmix64

_LANGS = np.array(["en", "de", "fr", "es", "zh"])
_SOURCES = np.array([f"src{i}" for i in range(20)])

# same base vocabulary family as the transcript generator (English-ish +
# engine jargon) — hot stems overlap across the two corpora
from .transcripts import _VOCAB  # noqa: E402

_MIN_WORDS, _MAX_WORDS = 8, 72


def _doc_words(seed: int, eff_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized word-rank matrix for ``eff_ids``: returns (ranks,
    offsets) where ranks[offsets[i]:offsets[i+1]] are doc i's vocab
    ranks.  Pure function of (seed, effective doc_id)."""
    s = np.uint64(seed)
    nw = (splitmix64(eff_ids.astype(np.uint64) * np.uint64(2) + s)
          % np.uint64(_MAX_WORDS - _MIN_WORDS)).astype(np.int64) + _MIN_WORDS
    offs = np.concatenate(([0], np.cumsum(nw)))
    pos = np.arange(offs[-1], dtype=np.uint64) - np.repeat(
        offs[:-1].astype(np.uint64), nw)
    base = np.repeat(eff_ids.astype(np.uint64), nw)
    u = splitmix64(base * np.uint64(1_000_003) + pos * np.uint64(7) + s)
    u = u.astype(np.float64) / 2.0**64
    ranks = np.minimum((len(_VOCAB) * u**3).astype(np.int64),
                       len(_VOCAB) - 1)
    return ranks, offs


def _gen_range(seed: int, lo: int, hi: int) -> pa.Table:
    ids = np.arange(lo, hi, dtype=np.int64)
    mod = ids % 100
    eff = ids.copy()
    eff[mod == 8] -= 1   # exact duplicate of x00+7
    eff[mod == 9] -= 2   # near duplicate: x00+7's words + one extra
    ranks, offs = _doc_words(seed, eff)
    words = _VOCAB[ranks]
    texts = []
    for i in range(ids.size):
        t = " ".join(words[offs[i]:offs[i + 1]])
        if mod[i] == 9:
            t += " appended"
        texts.append(t)
    h = splitmix64(ids.astype(np.uint64) * np.uint64(3) + np.uint64(seed))
    langs = _LANGS[(h % np.uint64(len(_LANGS))).astype(np.int64)]
    srcs = _SOURCES[((h >> np.uint64(8))
                     % np.uint64(len(_SOURCES))).astype(np.int64)]
    text_arr = pa.array(texts, pa.string())
    import pyarrow.compute as pc

    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": text_arr,
        "lang": pa.array(langs.tolist(), pa.string()),
        "source": pa.array(srcs.tolist(), pa.string()),
        "n_chars": pc.cast(pc.utf8_length(text_arr), pa.int64()),
    })


def _write_file(ds_dir: str, f: int, seed: int, lo: int, hi: int) -> str:
    path = os.path.join(ds_dir, f"part-{f:05d}.parquet")
    tmp = f"{path}.tmp"
    pq.write_table(_gen_range(seed, lo, hi), tmp)
    os.replace(tmp, path)
    return path


def generate_documents(out_root: str, num_docs: int, seed: int = 42,
                       num_files: int = 8) -> str:
    """Write ``<out_root>/documents.parquet/part-*.parquet``; return
    ``out_root`` (usable as an ``sf_dir``).  Content depends only on
    (num_docs, seed); ``num_files`` changes partitioning only.  Large
    corpora generate as one Ray task per file."""
    ds_dir = os.path.join(out_root, "documents.parquet")
    os.makedirs(ds_dir, exist_ok=True)
    bounds = np.linspace(0, num_docs, num_files + 1).astype(int)
    jobs = [(f, int(bounds[f]), int(bounds[f + 1]))
            for f in range(num_files) if bounds[f + 1] > bounds[f]]
    use_ray = num_docs >= 65536
    if use_ray:
        import ray

        use_ray = ray.is_initialized()
    if use_ray:
        import ray

        gen = ray.remote(_write_file)
        ray.get([gen.remote(ds_dir, f, seed, lo, hi) for f, lo, hi in jobs])
    else:
        for f, lo, hi in jobs:
            _write_file(ds_dir, f, seed, lo, hi)
    return out_root


def documents_corpus_at(num_docs: int, seed: int = 42,
                        cache_root: str | None = None) -> str:
    """Cached large documents corpus; returns an sf_dir-shaped root."""
    root = cache_root or os.environ.get("NOISE_RAY_CACHE",
                                        "/tmp/noise_ray_cache")
    num_files = max(8, min(512, num_docs // 16384))
    out = os.path.join(root, f"documents-synth-v1-{num_docs}-{num_files}")
    marker = os.path.join(out, ".done")
    if not os.path.exists(marker):
        generate_documents(out, num_docs, seed=seed, num_files=num_files)
        with open(marker, "w") as f:
            f.write("ok")
    return out


# ------------------------------------------------------------ embeddings

_EMB_DIM = 64
_EMB_LABELS = 10


def _gen_emb_range(seed: int, lo: int, hi: int) -> pa.Table:
    """Vectors = unit-ish cluster centroid (by label) + seeded noise —
    same schema as the testdata embeddings table, with real cluster
    structure so ANN / k-means / cosine-dedup have meaningful targets.
    Pure function of (seed, vec_id): splitmix64 draws → Box-Muller."""
    ids = np.arange(lo, hi, dtype=np.int64)
    labels = (splitmix64(ids.astype(np.uint64) * np.uint64(5)
                         + np.uint64(seed))
              % np.uint64(_EMB_LABELS)).astype(np.int32)

    def normals(tag: int, rows: np.ndarray) -> np.ndarray:
        base = rows[:, None].astype(np.uint64) * np.uint64(_EMB_DIM * 2) \
            + np.arange(_EMB_DIM, dtype=np.uint64)[None, :]
        u1 = splitmix64(base * np.uint64(2) + np.uint64(tag)) \
            .astype(np.float64) / 2.0**64
        u2 = splitmix64(base * np.uint64(2) + np.uint64(tag + 1)) \
            .astype(np.float64) / 2.0**64
        u1 = np.maximum(u1, 1e-12)
        return np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)

    centers = normals(7, np.arange(_EMB_LABELS, dtype=np.int64)
                      + np.int64(seed))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    # 0.15/dim over 64 dims → noise norm ≈ 1.2 vs unit centroids:
    # same-label cosine ≈ 0.4, cross-label ≈ 0 — clustered but not trivial
    noise = normals(101, ids) * 0.15
    vecs = (centers[labels] + noise).astype(np.float32)
    flat = pa.array(vecs.reshape(-1), pa.float32())
    emb = pa.ListArray.from_arrays(
        pa.array(np.arange(ids.size + 1, dtype=np.int32) * _EMB_DIM),
        flat)
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": emb,
        "label": pa.array(labels, pa.int32()),
    })


def _write_emb_file(ds_dir: str, f: int, seed: int, lo: int, hi: int) -> str:
    path = os.path.join(ds_dir, f"part-{f:05d}.parquet")
    tmp = f"{path}.tmp"
    pq.write_table(_gen_emb_range(seed, lo, hi), tmp)
    os.replace(tmp, path)
    return path


def generate_embeddings(out_root: str, num_vecs: int, seed: int = 42,
                        num_files: int = 8) -> str:
    """Write ``<out_root>/embeddings.parquet/part-*``; return out_root.
    Content depends only on (num_vecs, seed)."""
    ds_dir = os.path.join(out_root, "embeddings.parquet")
    os.makedirs(ds_dir, exist_ok=True)
    bounds = np.linspace(0, num_vecs, num_files + 1).astype(int)
    jobs = [(f, int(bounds[f]), int(bounds[f + 1]))
            for f in range(num_files) if bounds[f + 1] > bounds[f]]
    use_ray = num_vecs >= 65536
    if use_ray:
        import ray

        use_ray = ray.is_initialized()
    if use_ray:
        import ray

        gen = ray.remote(_write_emb_file)
        ray.get([gen.remote(ds_dir, f, seed, lo, hi) for f, lo, hi in jobs])
    else:
        for f, lo, hi in jobs:
            _write_emb_file(ds_dir, f, seed, lo, hi)
    return out_root


def embeddings_corpus_at(num_vecs: int, seed: int = 42,
                         cache_root: str | None = None) -> str:
    """Cached large embeddings corpus; returns an sf_dir-shaped root."""
    root = cache_root or os.environ.get("NOISE_RAY_CACHE",
                                        "/tmp/noise_ray_cache")
    num_files = max(8, min(256, num_vecs // 32768))
    out = os.path.join(root, f"embeddings-synth-v1-{num_vecs}-{num_files}")
    marker = os.path.join(out, ".done")
    if not os.path.exists(marker):
        generate_embeddings(out, num_vecs, seed=seed, num_files=num_files)
        with open(marker, "w") as f:
            f.write("ok")
    return out
