"""IVF-partitioned vector index: the IO-pruned ANN scale path.

``ops/similarity.ann_ivf`` and ``ann_bucketed`` prune COMPUTE — every
query still streams the whole embeddings table off storage and masks
candidates per batch.  That is the right shape for one-off sweeps, but a
repeatedly-queried corpus wants the pruning at the READ, exactly like
the inverted text index: build once, then open only the data a query
can touch.

Build (one streaming execution): nearest-centroid assignment
(broadcast centroid matrix, one matmul per batch, argmax ties to the
smaller centroid id — identical to ``ann_ivf``'s rule) →
``groupby(list)`` → ONE parquet file per inverted list + a manifest
holding the centroid matrix.  Query: pick the ``nprobe`` nearest
centroids, ``ray.data.read_parquet`` ONLY those lists' files, exact
cosine partial top-k per batch, tiny driver merge — IO scales with
``nprobe / n_centroids`` instead of the corpus.

Centroids are the same deterministic corpus sample as ``ann_ivf`` (the
first ``n_centroids`` vectors at/after ``reserve``), so the indexed
query path reproduces ``ann_ivf``'s output EXACTLY (asserted in
tests/test_vector_index.py) and shares its DuckDB oracle.  At 100 TB,
size ``n_centroids`` so a list is a few GB (the build's groupby moves
each vector once; the manifest stays centroid-sized), and re-run a few
Lloyd rounds (`ops/similarity._kmeans_centroids`) first if the sample
centroids skew.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

MANIFEST = "vector_manifest.json"


def _assign(mn: np.ndarray, cn: np.ndarray) -> np.ndarray:
    # argmax ties pick the first (smallest centroid id) — ann_ivf's rule
    return np.argmax(mn @ cn.T, axis=1)


def build_vector_index(emb_path: str, out_dir: str, *,
                       n_centroids: int = 32, reserve: int = 0,
                       extra_columns: tuple = ()) -> dict:
    """Partition the embeddings at ``emb_path`` (file or directory) into
    one parquet file per IVF list under ``out_dir``.  ``reserve`` skips
    the first vec_ids when sampling centroids (they are query fixtures
    in the benchmark layout, matching ``ann_ivf(n_queries=reserve)``).
    ``extra_columns`` stores metadata columns (e.g. ``label``) in the
    list files so filtered kNN can push its predicate into the routed
    read (recorded in the manifest; epoch adds carry them too)."""
    from ..ops.similarity import embed_matrix

    ct = pq.read_table(
        emb_path, columns=["vec_id", "embedding"],
        filters=[("vec_id", ">=", reserve),
                 ("vec_id", "<", reserve + n_centroids)])
    cm = embed_matrix(ct.column("embedding"))
    cn = cm / np.maximum(np.linalg.norm(cm, axis=1, keepdims=True), 1e-30)
    cn_ref = ray.put(cn)

    lists_dir = os.path.join(out_dir, "lists")
    os.makedirs(lists_dir, exist_ok=True)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cn_ref)
        m = embed_matrix(batch.column("embedding"))
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        return batch.append_column(
            "list", pa.array(_assign(mn, c).astype(np.int64), pa.int64()))

    def write_list(group: pa.Table) -> pa.Table:
        li = int(group.column("list")[0].as_py())
        path = os.path.join(lists_dir, f"list-{li:05d}.parquet")
        tmp = f"{path}.tmp-{os.getpid()}"
        pq.write_table(group.sort_by("vec_id"), tmp, row_group_size=65536)
        os.replace(tmp, path)  # idempotent commit per list
        return pa.table({"list": pa.array([li], pa.int64()),
                         "rows": pa.array([group.num_rows], pa.int64())})

    stats = (ray.data.read_parquet(
                 emb_path,
                 columns=["vec_id", "embedding", *extra_columns])
             .map_batches(assign, batch_format="pyarrow")
             .groupby("list")
             .map_groups(write_list, batch_format="pyarrow")
             .take_all())
    manifest = {
        "n_centroids": n_centroids,
        "reserve": reserve,
        "extra_columns": list(extra_columns),
        "centroids": cn.tolist(),
        "lists": sorted(
            ({"list": int(r["list"]), "rows": int(r["rows"]),
              "path": f"lists/list-{int(r['list']):05d}.parquet"}
             for r in stats), key=lambda d: d["list"]),
    }
    tmp = os.path.join(out_dir, f"{MANIFEST}.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(out_dir, MANIFEST))
    return manifest


def add_vectors(index_dir: str, emb_path: str) -> dict:
    """Append new vectors to an existing IVF index as an EPOCH: each new
    vector is assigned with the INDEX'S OWN centroids (frozen at build —
    the IVF invariant that keeps old lists valid), and every touched list
    gains one epoch file next to its base file.  Queries read all files
    of a probed list, so appended vectors are visible immediately; no
    existing file is rewritten.  Mirrors the text index's epoch adds
    (build/incremental.py) minus upsert semantics — vec_ids are assumed
    append-only, like doc_ids."""
    from ..ops.similarity import embed_matrix

    with open(os.path.join(index_dir, MANIFEST)) as f:
        man = json.load(f)
    cn = np.asarray(man["centroids"], np.float64)
    cn_ref = ray.put(cn)
    epoch = int(man.get("epochs", 0)) + 1
    lists_dir = os.path.join(index_dir, "lists")

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cn_ref)
        m = embed_matrix(batch.column("embedding"))
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        return batch.append_column(
            "list", pa.array(_assign(mn, c).astype(np.int64), pa.int64()))

    def write_epoch_list(group: pa.Table) -> pa.Table:
        li = int(group.column("list")[0].as_py())
        path = os.path.join(lists_dir,
                            f"list-{li:05d}-epoch{epoch:04d}.parquet")
        tmp = f"{path}.tmp-{os.getpid()}"
        pq.write_table(group.sort_by("vec_id"), tmp, row_group_size=65536)
        os.replace(tmp, path)
        return pa.table({"list": pa.array([li], pa.int64()),
                         "rows": pa.array([group.num_rows], pa.int64())})

    stats = (ray.data.read_parquet(
                 emb_path,
                 columns=["vec_id", "embedding",
                          *man.get("extra_columns", [])])
             .map_batches(assign, batch_format="pyarrow")
             .groupby("list")
             .map_groups(write_epoch_list, batch_format="pyarrow")
             .take_all())
    by_list = {d["list"]: d for d in man["lists"]}
    for r in stats:
        li = int(r["list"])
        entry = by_list.get(li)
        if entry is None:
            entry = by_list[li] = {"list": li, "rows": 0, "path": None,
                                   "epoch_paths": []}
            man["lists"].append(entry)
        entry.setdefault("epoch_paths", []).append(
            f"lists/list-{li:05d}-epoch{epoch:04d}.parquet")
        entry["rows"] = int(entry["rows"]) + int(r["rows"])
    man["lists"].sort(key=lambda d: d["list"])
    man["epochs"] = epoch
    tmp = os.path.join(index_dir, f"{MANIFEST}.tmp")
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, os.path.join(index_dir, MANIFEST))
    return man


def compact_vector_index(index_dir: str) -> dict:
    """Fold every list's epoch files back into its base file (one map
    task per touched list — reads that list's files, rewrites one sorted
    file, atomic rename; untouched lists are left alone).  Query results
    are unchanged by construction (same rows, same assignment); the
    epoch counter resets."""
    with open(os.path.join(index_dir, MANIFEST)) as f:
        man = json.load(f)
    touched = [d for d in man["lists"] if d.get("epoch_paths")]
    if not touched:
        return man
    lists_dir = os.path.join(index_dir, "lists")

    def fold(batch: pa.Table) -> pa.Table:
        out = []
        for li in batch.column("list").to_pylist():
            li = int(li)
            entry = next(d for d in man["lists"] if d["list"] == li)
            parts = [pq.read_table(p)
                     for p in _list_paths(index_dir, entry)]
            merged = pa.concat_tables(parts).sort_by("vec_id")
            path = os.path.join(lists_dir, f"list-{li:05d}.parquet")
            tmp = f"{path}.tmp-{os.getpid()}"
            pq.write_table(merged, tmp, row_group_size=65536)
            os.replace(tmp, path)
            out.append((li, merged.num_rows))
        return pa.table({"list": pa.array([l for l, _ in out], pa.int64()),
                         "rows": pa.array([n for _, n in out], pa.int64())})

    stats = (ray.data.from_items([{"list": d["list"]} for d in touched],
                                 override_num_blocks=len(touched))
             .map_batches(fold, batch_format="pyarrow")
             .take_all())
    rows_by_list = {int(r["list"]): int(r["rows"]) for r in stats}
    for d in man["lists"]:
        if d["list"] in rows_by_list:
            stale = d.get("epoch_paths", [])
            d["path"] = f"lists/list-{d['list']:05d}.parquet"
            d["rows"] = rows_by_list[d["list"]]
            d["epoch_paths"] = []
            for p in stale:  # GC only after the base rewrite landed
                try:
                    os.remove(os.path.join(index_dir, p))
                except FileNotFoundError:
                    pass
    man["epochs"] = 0
    tmp = os.path.join(index_dir, f"{MANIFEST}.tmp")
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, os.path.join(index_dir, MANIFEST))
    return man


def _list_paths(index_dir: str, entry: dict) -> list[str]:
    paths = []
    if entry.get("path"):
        paths.append(os.path.join(index_dir, entry["path"]))
    paths.extend(os.path.join(index_dir, p)
                 for p in entry.get("epoch_paths", []))
    return paths


def ivf_query(index_dir: str, queries: np.ndarray, qids: np.ndarray,
              k: int = 10, nprobe: int = 4,
              exclude_below: int = 0,
              exclude_id: int | None = None,
              filter_expr=None) -> pa.Table:
    """Cosine top-k per (normalized) query row, reading ONLY the
    ``nprobe`` probed lists' files per query.  Output (query_id, rank,
    vec_id) — identical to ``ops/similarity.ann_ivf`` for the same
    centroids/params (ties to the smaller id everywhere).
    ``filter_expr`` (a pyarrow dataset expression over stored metadata
    columns) pushes a kNN pre-filter into the routed read — double
    pruning: list routing cuts the files, row-group statistics cut the
    survivors."""
    with open(os.path.join(index_dir, MANIFEST)) as f:
        man = json.load(f)
    cn = np.asarray(man["centroids"], np.float64)
    csims = queries @ cn.T
    probes = np.stack([
        np.lexsort((np.arange(cn.shape[0]), -csims[qi]))[:nprobe]
        for qi in range(queries.shape[0])])
    needed = sorted({int(li) for row in probes for li in row})
    by_list = {d["list"]: d for d in man["lists"]}
    paths = [p for li in needed if li in by_list
             for p in _list_paths(index_dir, by_list[li])]
    plan_ref = ray.put((queries, probes))

    from ..ops.collect import arrow_blocks
    from ..ops.similarity import embed_matrix

    def partial_topk(batch: pa.Table) -> pa.Table:
        qn, probes = ray.get(plan_ref)
        ids = batch.column("vec_id").to_numpy()
        keep = ids >= exclude_below
        if exclude_id is not None:
            keep &= ids != exclude_id
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "vec_id": pa.array([], pa.int64()),
                          "sim": pa.array([], pa.float64())})
        if not keep.any():
            return empty
        ids = ids[keep]
        lists = batch.column("list").to_numpy()[keep]
        m = embed_matrix(batch.column("embedding"))[keep]
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        out_q, out_v, out_s = [], [], []
        for qi in range(qn.shape[0]):
            sel = np.isin(lists, probes[qi])
            if not sel.any():
                continue
            sims = qn[qi] @ mn[sel].T
            bids = ids[sel]
            kk = min(k, bids.size)
            top = np.argpartition(-sims, kk - 1)[:kk]
            out_q.extend([int(qids[qi])] * top.size)
            out_v.extend(bids[top].tolist())
            out_s.extend(sims[top].tolist())
        if not out_q:
            return empty
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    if not paths:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64())})
    parts = (ray.data.read_parquet(paths, filter=filter_expr)
             .map_batches(partial_topk, batch_format="pyarrow",
                          batch_size=4096))
    # a filtered read can emit columnless empty blocks; keep real ones
    tabs = [b for b in arrow_blocks(parts) if b.num_columns and b.num_rows]
    if not tabs:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64())})
    t = pa.concat_tables(tabs)
    out_q, out_r, out_v = [], [], []
    tq = t.column("query_id").to_numpy()
    tv = t.column("vec_id").to_numpy()
    ts = t.column("sim").to_numpy()
    for qid in sorted(set(int(q) for q in qids)):
        sel = tq == qid
        v, s = tv[sel], ts[sel]
        order = np.lexsort((v, -s))[:k]  # sim desc, vec_id asc
        for r, i in enumerate(order, 1):
            out_q.append(qid)
            out_r.append(r)
            out_v.append(int(v[i]))
    return pa.table({"query_id": pa.array(out_q, pa.int64()),
                     "rank": pa.array(out_r, pa.int64()),
                     "vec_id": pa.array(out_v, pa.int64())})


def ann_ivf_indexed(sf_dir: str, n_queries: int = 5, k: int = 10,
                    n_centroids: int = 32, nprobe: int = 4,
                    index_dir: str | None = None) -> pa.Table:
    """``ann_ivf`` through a PERSISTENT partitioned index: build (or
    reuse) the IVF layout for ``sf_dir``'s embeddings, then answer the
    benchmark query set reading only the probed lists.  Output is
    identical to ``ops/similarity.ann_ivf`` (same oracle)."""
    from ..ops.similarity import _load_queries

    if index_dir is None:
        base = os.environ.get("NOISE_RAY_CACHE", "/tmp/noise_ray_cache")
        tag = os.path.basename(os.path.normpath(sf_dir))
        index_dir = os.path.join(
            base, f"vecidx-{tag}-{n_centroids}-{n_queries}")
    if not os.path.exists(os.path.join(index_dir, MANIFEST)):
        build_vector_index(f"{sf_dir}/embeddings.parquet", index_dir,
                           n_centroids=n_centroids, reserve=n_queries)
    qids, qn = _load_queries(sf_dir, n_queries)
    return ivf_query(index_dir, qn, qids, k=k, nprobe=nprobe,
                     exclude_below=n_queries)


def ann_ivf_filtered_indexed(sf_dir: str, n_queries: int = 5, k: int = 10,
                             n_centroids: int = 32, nprobe: int = 8,
                             label: int = 3,
                             index_dir: str | None = None) -> pa.Table:
    """``ops/similarity.ann_ivf_filtered`` through a persistent IVF
    index that stores the ``label`` metadata column: the query routes
    to its ``nprobe`` lists' files AND pushes ``label == L`` into the
    read (row-group statistics pruning inside each list).  Output is
    bit-identical to ``ann_ivf_filtered`` (same centroids, same widened
    nprobe, same tie rules), so it shares its SQL oracle."""
    import pyarrow.compute as pc

    from ..ops.similarity import _load_queries

    if index_dir is None:
        base = os.environ.get("NOISE_RAY_CACHE", "/tmp/noise_ray_cache")
        tag = os.path.basename(os.path.normpath(sf_dir))
        index_dir = os.path.join(
            base, f"vecidx-{tag}-{n_centroids}-{n_queries}-lbl")
    if not os.path.exists(os.path.join(index_dir, MANIFEST)):
        build_vector_index(f"{sf_dir}/embeddings.parquet", index_dir,
                           n_centroids=n_centroids, reserve=n_queries,
                           extra_columns=("label",))
    qids, qn = _load_queries(sf_dir, n_queries)
    return ivf_query(index_dir, qn, qids, k=k, nprobe=nprobe,
                     exclude_below=n_queries,
                     filter_expr=pc.field("label") == label)
