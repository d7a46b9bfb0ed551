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
    the vocabulary-bounded top_terms shape, estimates from the count-min
    sketch.  est_n >= n always.

    Tokenizes the corpus ONCE: the per-batch (term, n) value-count
    partials are materialized and consumed twice — summed into the grid
    (a cell's count is the same whether folded per occurrence or per
    (term, n) partial) and shuffled into the exact top-k groupby.  The
    standalone :func:`_sketch` stays the pure no-shuffle primitive."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    def vc_partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern_regex(
            pc.utf8_lower(batch.column("text")), "[^a-z0-9]+"))
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = pc.value_counts(
            toks.combine_chunks() if isinstance(toks, pa.ChunkedArray)
            else toks)
        return pa.table({"term": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    vc = (ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                columns=["text"])
          .map_batches(vc_partial, batch_format="pyarrow",
                       batch_size=16384)
          .materialize())

    def grid_partial(t: pa.Table) -> pa.Table:
        hs = hash_string_array(t.column("term").combine_chunks())
        n = t.column("n").to_numpy()
        sk = np.zeros((_D, w), np.int64)
        for r, cells in enumerate(_cells(hs, w)):
            np.add.at(sk[r], cells, n)
        return pa.table({"sk": pa.array([sk.ravel()], pa.list_(pa.int64()))})

    parts = arrow_blocks(vc.map_batches(grid_partial, batch_format="pyarrow",
                                        batch_size=65536))
    sk = np.zeros(_D * w, np.int64)
    for t in parts:
        if t.num_rows:
            sk += _fold_grids(t)
    sk = sk.reshape(_D, w)

    top = (vc.groupby("term").aggregate(Sum("n", alias_name="n"))
           .sort(["n", "term"], descending=[True, False]).limit(k))
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


# ------------------------------------------------------------ HyperLogLog

_HLL_P = 9                     # 2**9 = 512 registers per source
_HLL_M = 1 << _HLL_P
_HLL_LOW = 64 - _HLL_P         # bits feeding the rank
_HLL_MASK = np.uint64((1 << _HLL_LOW) - 1)


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length of uint64 values: two 32-bit halves
    through np.frexp (every half is exact in float64, so the exponent IS
    the bit length — no log2 rounding hazard)."""
    hi = (w >> np.uint64(32)).astype(np.float64)
    lo = (w & np.uint64(0xFFFFFFFF)).astype(np.float64)
    _, ehi = np.frexp(hi)
    _, elo = np.frexp(lo)
    return np.where(hi > 0, ehi + 32, elo).astype(np.int64)


def _hll_rho(hashes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(register, rho) of every token hash: register = top p bits, rho =
    1 + leading zeros of the remaining 64-p bits (capped at 64-p+1)."""
    reg = (hashes >> np.uint64(_HLL_LOW)).astype(np.int64)
    w = hashes & _HLL_MASK
    rho = _HLL_LOW + 1 - _bit_length_u64(w)
    rho[w == 0] = _HLL_LOW + 1
    return reg, rho


def hll_distinct(sf_dir: str):
    """(source, register, rho, est_distinct): per-source HyperLogLog
    distinct-token sketch — the 512 max-rank registers that are nonzero,
    plus the standard bias-corrected estimate (linear counting in the
    small range).  The third mergeable sketch alongside KMV (distinct)
    and count-min (frequency): registers combine by elementwise MAX, so
    the pipeline is per-batch scatter-max partials → one
    register-bounded groupby MAX → a per-source finalize over 512 rows.
    Pure integer registers (exact bit_length on both sides — no libm
    log2 on 64-bit values), so the DuckDB oracle
    (ops/oracle_sqlgen.hll_distinct_sql, via length(bin(w))) matches the
    register rows bit-for-bit and the estimate to float64 noise."""
    from ray.data.aggregate import Max

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        hs, offs = tokenize_hashes(batch.column("text"))
        src = np.asarray(batch.column("source").to_numpy(
            zero_copy_only=False))
        doc_of_tok = np.repeat(np.arange(len(src)), np.diff(offs))
        reg, rho = _hll_rho(hs)
        usrc, sidx = np.unique(src, return_inverse=True)
        grid = np.zeros((usrc.size, _HLL_M), np.int64)
        np.maximum.at(grid, (sidx[doc_of_tok], reg), rho)
        si, rj = np.nonzero(grid)
        return pa.table({
            "source": pa.array(usrc[si], pa.string()),
            "register": pa.array(rj, pa.int64()),
            "rho": pa.array(grid[si, rj], pa.int64()),
        })

    def finalize(g: pa.Table) -> pa.Table:
        reg = g.column("register").to_numpy()
        rho = g.column("rho").to_numpy().astype(np.float64)
        m = float(_HLL_M)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        v = m - reg.size                      # empty registers
        s = v + np.sum(2.0 ** (-rho))
        est = alpha * m * m / s
        if est <= 2.5 * m and v > 0:
            est = m * np.log(m / v)
        order = np.argsort(reg)
        n = reg.size
        return pa.table({
            "source": pa.array(
                [g.column("source")[0].as_py()] * n, pa.string()),
            "register": pa.array(reg[order], pa.int64()),
            "rho": pa.array(rho[order].astype(np.int64), pa.int64()),
            "est_distinct": pa.array(np.full(n, est), pa.float64()),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=16384)
        .groupby(["source", "register"])
        .aggregate(Max("rho", alias_name="rho"))
        .groupby("source")
        .map_groups(finalize, batch_format="pyarrow")
        .sort(["source", "register"])
    )
