"""Count-min sketch over the token stream — the mergeable frequency
sketch for corpus-scale term statistics.

The sketch is the canonical "no shuffle at all" distributed aggregate:
every batch folds its token stream into a tiny (d x w) counter grid
(cell = splitmix64(token_hash xor row_seed) mod w), the per-batch grids
add elementwise on the driver (integer addition — merge order is
irrelevant), and point-frequency estimates read min over the d rows.
At 100 TB that is d*w*8 bytes shipped per task (32 KB here) regardless
of corpus size, against a vocabulary-sized shuffle for exact counts.

``countmin_heavy`` pairs the sketch with the exact top-k heavy hitters
(ops.text.top_terms — the vocabulary-bounded combiner + one groupby) so
the output exposes the sketch's guarantee directly: ``est_n >= n`` for
every term, with equality when the term's cells are collision-free.
Everything is deterministic uint64 arithmetic, so the whole pipeline —
token hashes, cells, counter sums, min-readout — replicates exactly in
DuckDB (ops/oracle_sqlgen.countmin_heavy_sql).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .collect import arrow_blocks
from .hashing import hash_string_array, splitmix64, tokenize_hashes

_W = 1024          # sketch width (counters per row)
_D = 4             # sketch depth (independent rows)

# deterministic per-row seeds: splitmix64(1..d)
_SEEDS = splitmix64(np.arange(1, _D + 1, dtype=np.uint64))


def _cells(hashes: np.ndarray, w: int = _W) -> np.ndarray:
    """(d, n) int64 cell index of every token hash in every sketch row."""
    return np.stack([
        (splitmix64(hashes ^ s) % np.uint64(w)).astype(np.int64)
        for s in _SEEDS])


def _fold_grids(t: pa.Table, col: str = "sk") -> np.ndarray:
    """Elementwise sum of a table of equal-length list-column grids."""
    import pyarrow.compute as pc

    flat = np.asarray(pc.list_flatten(t.column(col)).combine_chunks(),
                      dtype=np.int64)
    return flat.reshape(t.num_rows, -1).sum(axis=0)


def _sketch(sf_dir: str, w: int = _W) -> np.ndarray:
    """(d, w) int64 count-min sketch of the corpus token stream: per-batch
    partial grids, a distributed combine level (so the driver folds
    ~#batches/1024 grids, not one per batch — at corpus scale the raw
    partial stream would be GBs), then a tiny elementwise driver fold."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        hs, _ = tokenize_hashes(batch.column("text"))
        sk = np.zeros((_D, w), np.int64)
        for r, cells in enumerate(_cells(hs, w)):
            sk[r] += np.bincount(cells, minlength=w)
        return pa.table({"sk": pa.array([sk.ravel()], pa.list_(pa.int64()))})

    def combine(t: pa.Table) -> pa.Table:
        return pa.table(
            {"sk": pa.array([_fold_grids(t)], pa.list_(pa.int64()))})

    parts = arrow_blocks(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=16384)
        .map_batches(combine, batch_format="pyarrow", batch_size=1024))
    total = np.zeros(_D * w, np.int64)
    for t in parts:
        if t.num_rows:
            total += _fold_grids(t)
    return total.reshape(_D, w)


def countmin_heavy(sf_dir: str, k: int = 20, w: int = _W) -> pa.Table:
    """(term, n, est_n) for the k most frequent tokens: exact counts from
    the vocabulary-bounded top_terms pipeline, estimates from the
    count-min sketch.  est_n >= n always."""
    from .text import top_terms

    sk = _sketch(sf_dir, w)
    top = top_terms(sf_dir, k)
    tt = pa.concat_tables(
        [t.select(["term", "n"]) for t in arrow_blocks(top) if t.num_rows])
    tt = tt.sort_by([("n", "descending"), ("term", "ascending")])
    terms = tt.column("term").combine_chunks()
    th = hash_string_array(
        terms if isinstance(terms, pa.Array) else terms.combine_chunks())
    cells = _cells(th, w)
    est = np.min(
        np.stack([sk[r][cells[r]] for r in range(_D)]), axis=0)
    return pa.table({
        "term": tt.column("term"),
        "n": tt.column("n").cast(pa.int64()),
        "est_n": pa.array(est, pa.int64()),
    })
