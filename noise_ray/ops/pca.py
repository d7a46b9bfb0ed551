"""Distributed PCA over the embedding column via power iteration.

The reference engine has no linear-algebra surface at all; this is part
of the beyond-reference LLM-pipeline suite (SURVEY §2: embedding-space
analysis alongside kmeans/semdedup).  The shape is the textbook one for
a 100 TB corpus:

- ONE streaming pass reduces each batch to its (dim x dim) Gram partial
  ``X^T X`` — dim**2 floats per task, folded on the driver.  Nothing
  corpus-sized moves; no shuffle at all.
- Power iteration then runs on the tiny (dim x dim) Gram matrix on the
  driver (dim = 64 here; even dim = 4096 is a 128 MB matrix), with
  rank-1 deflation for the later components.
- A second streaming pass projects every vector onto the components —
  an embarrassingly parallel ``map_batches`` matmul.

Everything is DETERMINISTIC — fixed all-ones/sqrt(dim) start vector,
fixed iteration count, no convergence test — so the whole pipeline
replicates as an exact DuckDB oracle (ops/oracle_sqlgen.pca_project_sql:
the Gram matrix as a parallel-unnest self-join, each power-iteration
round and the deflation as chained CTEs).  Components are uncentered
(top right-singular directions of X, not of X - mean); that is what the
relational oracle expresses cleanly and what downstream length-norm'd
embedding work wants anyway.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .collect import arrow_blocks
from .similarity import embed_matrix


def _gram(sf_dir: str) -> np.ndarray:
    """(dim, dim) float64 Gram matrix X^T X of the embedding table in
    one streaming pass: per-batch partials, a distributed combine level
    (so the driver folds ~#batches/1024 grids, not one per batch — at
    corpus scale the raw partial stream would be GBs), then a tiny
    elementwise driver fold."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        m = embed_matrix(batch.column("embedding"))
        g = m.T @ m
        return pa.table({"g": pa.array([g.ravel()], pa.list_(pa.float64())),
                         "d": pa.array([g.shape[0]], pa.int64())})

    def combine(t: pa.Table) -> pa.Table:
        return pa.table({
            "g": pa.array([embed_matrix(t.column("g")).sum(axis=0)],
                          pa.list_(pa.float64())),
            "d": t.select(["d"]).slice(0, 1).column("d"),
        })

    parts = pa.concat_tables(arrow_blocks(
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(combine, batch_format="pyarrow", batch_size=1024)))
    dim = int(parts.column("d")[0].as_py())
    flat = embed_matrix(parts.column("g"))
    return flat.sum(axis=0).reshape(dim, dim)


def _power_components(gram: np.ndarray, n_components: int,
                      iters: int) -> np.ndarray:
    """(n_components, dim) unit vectors: ``iters`` fixed power-iteration
    rounds per component from the all-ones/sqrt(dim) start, with rank-1
    deflation ``G -= lam * v v^T`` between components.  No convergence
    test — the fixed round count is what makes the SQL oracle exact."""
    g = gram.astype(np.float64).copy()
    dim = g.shape[0]
    comps = []
    for _ in range(n_components):
        v = np.full(dim, 1.0 / np.sqrt(dim))
        for _ in range(iters):
            w = g @ v
            v = w / np.linalg.norm(w)
        comps.append(v)
        lam = float(v @ g @ v)
        g = g - lam * np.outer(v, v)
    return np.stack(comps)


def pca_project(sf_dir: str, n_components: int = 2, iters: int = 6):
    """(vec_id, proj1..projN): every embedding projected onto the top
    ``n_components`` uncentered principal directions."""
    comps = _power_components(_gram(sf_dir), n_components, iters)
    cref = ray.put(comps)

    def project(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        m = embed_matrix(batch.column("embedding"))
        p = m @ c.T
        cols = {"vec_id": batch.column("vec_id")}
        for j in range(c.shape[0]):
            cols[f"proj{j + 1}"] = pa.array(p[:, j], pa.float64())
        return pa.table(cols)

    return (
        ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                              columns=["vec_id", "embedding"])
        .map_batches(project, batch_format="pyarrow")
        .sort("vec_id")
    )
