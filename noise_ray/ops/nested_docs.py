"""Nested-JSON document pipelines over the relational test tables.

Exercises the nested index end to end on DuckDB-oracleable data: orders
become one JSON document each with their lineitems as a nested array
(sorted by linenumber), built into a nested index
(build/json_pipeline.py) and queried with keypath / array-context find
clauses (query/json_executor.py).  The array-context queries are the
semantics SQL EXISTS subqueries express — both clauses must hit the SAME
array element — which is exactly what the reference's arraypath
granularity provides (/root/reference/src/filters.rs:727-807).

Corpus construction is a Ray Data ``groupby(l_orderkey).map_groups``
(one all-to-all shuffle on the join key — at 100 TB this is the same
single co-shuffle every doc-assembly join needs), writing build-ready
``(_id, json)`` shards; the nested index build then streams them.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pyarrow as pa
import ray.data

_CACHE = "/tmp/noise_ray_cache"


def _orders_index(sf_dir: str) -> str:
    """Build (once) the nested orders corpus + index for ``sf_dir``."""
    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = os.path.join(_CACHE, f"nested-orders-v1-{key}")
    idx_dir = os.path.join(root, "idx")
    if os.path.exists(os.path.join(idx_dir, "manifest.json")):
        return idx_dir
    os.makedirs(root, exist_ok=True)
    shard_dir = os.path.join(root, "shards")
    os.makedirs(shard_dir, exist_ok=True)

    def one_order(group: pa.Table) -> pa.Table:
        # strict total order: linenumbers can repeat in the synthetic
        # data and group row order is shuffle-dependent, so break ties on
        # every carried column (identical rows are then interchangeable)
        order = np.lexsort((
            np.asarray(group.column("l_returnflag").to_pylist(),
                       dtype=object),
            group.column("l_quantity").to_numpy(),
            group.column("l_linenumber").to_numpy(),
        ))
        lines = [
            {"ln": float(group.column("l_linenumber")[int(i)].as_py()),
             "flag": group.column("l_returnflag")[int(i)].as_py(),
             "qty": float(group.column("l_quantity")[int(i)].as_py())}
            for i in order
        ]
        okey = int(group.column("l_orderkey")[0].as_py())
        doc = {"_id": str(okey), "okey": float(okey), "lines": lines}
        return pa.table({
            "okey": pa.array([okey], pa.int64()),
            "json": pa.array([json.dumps(doc, ensure_ascii=False)]),
        })

    docs = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_linenumber", "l_returnflag",
                     "l_quantity"])
        .groupby("l_orderkey")
        .map_groups(one_order, batch_format="pyarrow")
    )
    # deterministic doc order: one shard per sorted block, written INSIDE
    # the task (nothing reaches the driver but ack rows); shard names
    # carry the block's first order key, so file order == doc order no
    # matter how the sort split blocks
    def write_shard(part: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        if part.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string())})
        first = int(part.column("okey")[0].as_py())
        p = os.path.join(shard_dir, f"docs-{first:012d}.parquet")
        # always overwrite via tmp+rename: a crashed earlier run may have
        # left a same-named shard from different sort-block boundaries
        pq.write_table(pa.table({
            "_id": pa.compute.cast(part.column("okey"), pa.string()),
            "json": part.column("json"),
        }), p + ".tmp")
        os.replace(p + ".tmp", p)
        return pa.table({"path": pa.array([p])})

    from ..build.json_pipeline import build_json_index

    acks = (docs.sort("okey")
            .map_batches(write_shard, batch_format="pyarrow",
                         batch_size=None)
            .take_all())
    paths = sorted(a["path"] for a in acks)
    build_json_index(paths, idx_dir, local=False)
    return idx_dir


def nested_transcripts_index(sf_dir: str, paths: list[str] | None = None):
    """The flagship transcript corpus packed as NESTED conversation
    documents — ``{_id: conv_id, turns: [{i, role, text, tool}, ...]}``
    — indexed by the nested build.  This is the reference's native data
    model applied to the target workload: per-turn postings under
    ``.turns$.text`` with the turn index as the arraypath, so
    array-context queries scope boolean logic to a single turn.

    ``paths`` overrides the corpus (bench.py passes its own, which may
    be resized via GRAFT_BENCH_CONVS — the cache dir must follow the
    ACTUAL corpus or a stale index gets measured)."""
    if paths is None:
        from ..pipelines.flagship import transcripts_corpus

        paths = transcripts_corpus(sf_dir)
    root = os.path.join(os.path.dirname(paths[0]), "nested")
    idx_dir = os.path.join(root, "idx")
    from ..query.json_reader import JsonIndexReader

    if os.path.exists(os.path.join(idx_dir, "manifest.json")):
        return JsonIndexReader(idx_dir)
    os.makedirs(root, exist_ok=True)
    shard_dir = os.path.join(root, "shards")
    os.makedirs(shard_dir, exist_ok=True)

    # The corpus files hold NON-OVERLAPPING conv_id ranges sorted by
    # (conv_id, turn_idx) (sources/transcripts.py), so packing needs no
    # shuffle at all: one task per file groups rows at conv boundaries
    # and writes a build-ready (_id, json) shard — the same
    # partitioning-reuse the flat build exploits.
    def pack_file(row: dict) -> list[dict]:
        import pyarrow.parquet as pq

        t = pq.read_table(row["path"],
                          columns=["conv_id", "turn_idx", "role", "text",
                                   "tool"])
        conv = np.asarray(t.column("conv_id").to_pylist(), dtype=object)
        idxs = t.column("turn_idx").to_numpy()
        roles = t.column("role").to_pylist()
        texts = t.column("text").to_pylist()
        tools = t.column("tool").to_pylist()
        starts = np.flatnonzero(
            np.concatenate(([True], conv[1:] != conv[:-1])))
        ends = np.append(starts[1:], conv.size)
        ids, docs = [], []
        for s, e in zip(starts.tolist(), ends.tolist()):
            turns = []
            for i in range(s, e):
                turn = {"i": float(idxs[i]), "role": roles[i],
                        "text": texts[i]}
                if tools[i] is not None:
                    turn["tool"] = tools[i]
                turns.append(turn)
            doc = {"_id": conv[s], "turns": turns,
                   "n_turns": float(e - s)}
            ids.append(conv[s])
            docs.append(json.dumps(doc, ensure_ascii=False))
        # multiple shards per input file: the shred stage parallelizes
        # per shard, so shard count — not input file count — bounds the
        # build's ingest parallelism
        outs = []
        chunk = 1024
        for ci, lo in enumerate(range(0, len(ids), chunk)):
            out = os.path.join(
                shard_dir, f"docs-{row['seq']:05d}-{ci:03d}.parquet")
            hi = min(lo + chunk, len(ids))
            pq.write_table(
                pa.table({"_id": pa.array(ids[lo:hi], pa.string()),
                          "json": pa.array(docs[lo:hi], pa.string())}),
                out + ".tmp")
            os.replace(out + ".tmp", out)
            outs.append({"path": out})
        return outs

    items = [{"path": p, "seq": i} for i, p in enumerate(paths)]
    shard_paths = [r["path"] for r in ray.data.from_items(items)
                   .flat_map(pack_file).take_all()]
    shard_paths.sort()

    from ..build.json_pipeline import build_json_index

    # ingest-task sizing is adaptive in build_json_index: the task count
    # bounds the sort-input block count, whose shuffle overhead was the
    # 22M-scale wall when it tracked the fixed 1024-doc shard size
    build_json_index(shard_paths, idx_dir, local=False)
    return JsonIndexReader(idx_dir)


def nested_conv_search(sf_dir: str) -> pa.Table:
    """Array-context search over nested conversations: convs where ONE
    turn is an assistant turn matching a phrase, scored.  Exact oracle:
    the nested TF-IDF score (first matching instance per doc) is
    replicated in SQL over the flat turn corpus
    (ops/score_oracle.nested_conv_phrase_sql); rounded to 4dp on both
    sides."""
    from ..query.json_executor import run_json_query

    r = nested_transcripts_index(sf_dir)
    # phrase chosen to match ~45 convs at the driver's sf0.01 — enough
    # rows to exercise per-instance scoring, but under the limit so the
    # 4dp-rounded oracle never has to break a tie at the cutoff
    rows = run_json_query(
        r,
        'find {turns: [{role: =="assistant", text: ~="of your"}]} '
        "order score() desc, ._id asc return [._id, score()] limit 50 ;")
    return pa.table({
        "_id": pa.array([x[0] for x in rows], pa.string()),
        "score": pa.array([round(float(x[1]), 4) for x in rows],
                          pa.float64()),
    })


def _rows_table(rows: list, cols: dict) -> pa.Table:
    """rows of dicts → table with the given (name → pa type) columns."""
    return pa.table({
        name: pa.array([r[name] for r in rows], typ)
        for name, typ in cols.items()
    })


def nested_kp_range(sf_dir: str) -> pa.Table:
    """Orders with ANY lineitem quantity >= 49 — keypath range inside an
    array context (``find {lines: [{qty: >= 49}]}``)."""
    from ..query.json_executor import run_json_query
    from ..query.json_reader import JsonIndexReader

    r = JsonIndexReader(_orders_index(sf_dir))
    ids = run_json_query(r, "find {lines: [{qty: >= 49}]} return ._id ;")
    return pa.table({"_id": pa.array(ids, pa.string())})


def nested_kp_exact_arrayctx(sf_dir: str) -> pa.Table:
    """Orders with a SINGLE lineitem that both has returnflag "R" AND
    quantity >= 48: the array-element-scoped AND that a flat engine
    cannot express (the two clauses must match the same array element,
    like SQL EXISTS over the child table)."""
    from ..query.json_executor import run_json_query
    from ..query.json_reader import JsonIndexReader

    r = JsonIndexReader(_orders_index(sf_dir))
    ids = run_json_query(
        r, 'find {lines: [{flag: =="R", qty: >= 48}]} return ._id ;')
    return pa.table({"_id": pa.array(ids, pa.string())})


def nested_return_path(sf_dir: str) -> pa.Table:
    """Nested return paths: for matched orders return the FIRST
    lineitem's quantity (``.lines[0].qty``) and every flag (``[]``
    fan-out, ``.lines[].flag``)."""
    from ..query.json_executor import run_json_query
    from ..query.json_reader import JsonIndexReader

    r = JsonIndexReader(_orders_index(sf_dir))
    rows = run_json_query(
        r,
        "find {lines: [{qty: >= 49}]} "
        "return {id: ._id, first_qty: .lines[0].qty, "
        "flags: .lines[].flag} ;")
    for row in rows:
        row["flags"] = "|".join(row["flags"])
    return _rows_table(rows, {"id": pa.string(),
                              "first_qty": pa.float64(),
                              "flags": pa.string()})
