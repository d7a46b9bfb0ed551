"""Term-dictionary artifact: raw (pre-stem) surface forms + statistics.

The inverted index stores STEMS only, mirroring the reference's analysis
chain (/root/reference/src/stems.rs:23-64) — enough for every reference
query surface, but prefix/wildcard expansion, fuzzy (edit-distance)
matching and did-you-mean suggestion need the raw surface forms users
actually typed, which neither engine keeps in its postings.  This module
builds ``<index_dir>/dictionary/``: one parquet row per distinct
``(field, raw token)`` with its stem (== the indexed term), token length,
document frequency and collection frequency.

100 TB shape: a separate OPTIONAL streaming pass, built lazily on first
use and never part of the headline index build.  The per-batch stage
collapses each batch to its local ``(field, token) -> (stem, df, cf)``
partials (bounded by per-batch vocabulary — the same map-side-combiner
pattern as ops/text.py's term folds), ONE groupby folds the partials
(vocabulary-sized shuffle, never a token stream), and the result is
range-sorted by ``(field, token)`` before the write so parquet footer
statistics prune prefix lookups to the row groups that can match.
Lookups (build/dictionary.py readers below) are therefore:

- prefix: a filtered driver read touching only matching row groups —
  the same "small side stays small" discipline as the broadcast joins;
- fuzzy: a distributed ``map_batches`` scan with ``tlen`` pushdown
  (``|len(t) - len(w)| <= d`` is a necessary Levenshtein condition) and a
  batch-vectorized numpy edit-distance kernel, collecting only matches.
"""

from __future__ import annotations

import os
import threading

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..analysis.tokenizer import raw_grouped

_LOCK = threading.Lock()


# ------------------------------------------------------------------ build

def _dict_partial(fields: tuple):
    """Per-batch combiner: (field, token) -> [stem, df, cf] partials."""

    def partial(batch: pa.Table) -> pa.Table:
        acc: dict[tuple[int, str], list] = {}
        for fi, fname in enumerate(fields):
            if fname not in batch.column_names:
                continue
            for v in batch.column(fname).to_pylist():
                if v is None:
                    continue
                raws, stems, counts = raw_grouped(v)
                for r, s, c in zip(raws, stems, counts):
                    e = acc.get((fi, r))
                    if e is None:
                        acc[(fi, r)] = [s, 1, c]
                    else:
                        e[1] += 1
                        e[2] += c
        keys = list(acc.keys())
        vals = [acc[k] for k in keys]
        return pa.table({
            "field": pa.array([k[0] for k in keys], pa.int32()),
            "token": pa.array([k[1] for k in keys], pa.string()),
            "stem": pa.array([v[0] for v in vals], pa.string()),
            "df": pa.array([v[1] for v in vals], pa.int64()),
            "cf": pa.array([v[2] for v in vals], pa.int64()),
        })

    return partial


def build_term_dictionary(paths: list[str], dict_dir: str,
                          fields: tuple) -> str:
    """Build (idempotently) the term dictionary for ``paths`` into
    ``dict_dir``; returns ``dict_dir``.  Marker-gated like the index
    caches; the marker file starts with '.' so parquet dataset discovery
    ignores it."""
    marker = os.path.join(dict_dir, ".done")
    with _LOCK:
        if os.path.exists(marker):
            return dict_dir
        import ray
        from ray.data.aggregate import Sum

        cols = [f for f in fields]

        def finish(t: pa.Table) -> pa.Table:
            # groupby output occasionally carries odd column order /
            # empty blocks — normalize (see ops/ conventions)
            if t.num_rows == 0:
                return pa.table({
                    "field": pa.array([], pa.int32()),
                    "token": pa.array([], pa.string()),
                    "stem": pa.array([], pa.string()),
                    "tlen": pa.array([], pa.int32()),
                    "df": pa.array([], pa.int64()),
                    "cf": pa.array([], pa.int64()),
                })
            import pyarrow.compute as pc

            t = t.select(["field", "token", "stem", "df", "cf"])
            tlen = pc.cast(pc.utf8_length(t.column("token")), pa.int32())
            return t.append_column("tlen", tlen).select(
                ["field", "token", "stem", "tlen", "df", "cf"])

        ds = (
            ray.data.read_parquet(list(paths), columns=cols)
            .map_batches(_dict_partial(tuple(fields)),
                         batch_format="pyarrow", batch_size=16384)
            # stem is functionally dependent on token; keying on it too
            # avoids a string aggregate while changing nothing
            .groupby(["field", "token", "stem"])
            .aggregate(Sum("df", alias_name="df"),
                       Sum("cf", alias_name="cf"))
            .map_batches(finish, batch_format="pyarrow")
            .sort(["field", "token"])
        )
        os.makedirs(dict_dir, exist_ok=True)
        ds.write_parquet(dict_dir)
        with open(marker, "w") as f:
            f.write("ok")
        return dict_dir


# ----------------------------------------------------------------- lookup

_COLS = ["token", "stem", "df", "cf"]


def prefix_terms(dict_dir: str, field_id: int, prefix: str) -> pa.Table:
    """All dictionary entries of ``field_id`` whose RAW token starts with
    ``prefix`` — a driver read pruned by parquet footer (field, token)
    statistics; the result is vocabulary-bounded (the matching terms),
    never corpus-sized."""
    filters = [("field", "==", field_id), ("token", ">=", prefix)]
    # upper bound: bump the last char (prefix is lowercase text in practice;
    # chr(+1) is a correct exclusive bound for any unicode scalar < U+10FFFF)
    if prefix and ord(prefix[-1]) < 0x10FFFF:
        filters.append(("token", "<", prefix[:-1] + chr(ord(prefix[-1]) + 1)))
    t = pq.read_table(dict_dir, columns=_COLS, filters=filters)
    return t.sort_by("token")


def levenshtein_batch(tokens: list[str], word: str) -> np.ndarray:
    """Levenshtein distance from ``word`` to every token, vectorized over
    the batch: one DP column per char of ``word`` with the insertion
    prefix-min computed as ``min.accumulate(x - j) + j`` (unit-cost edits,
    same semantics as DuckDB's ``levenshtein``)."""
    n = len(tokens)
    if n == 0:
        return np.zeros(0, np.int64)
    lens = np.fromiter((len(t) for t in tokens), np.int64, n)
    maxlen = int(lens.max())
    arr = np.zeros((n, max(maxlen, 1)), np.uint32)
    for i, t in enumerate(tokens):
        if t:
            arr[i, :len(t)] = np.frombuffer(t.encode("utf-32-le"), np.uint32)
    # dp[i, j] = distance(word[:step], tokens[i][:j])
    dp = np.broadcast_to(np.arange(maxlen + 1, dtype=np.int64),
                         (n, maxlen + 1)).copy()
    j_idx = np.arange(maxlen + 1, dtype=np.int64)
    for step, wc in enumerate(np.frombuffer(word.encode("utf-32-le"),
                                            np.uint32), 1):
        base = np.empty_like(dp)
        base[:, 0] = step
        # deletion (dp[j]+1) vs substitution/match (dp[j-1]+cost)
        base[:, 1:] = np.minimum(dp[:, 1:] + 1,
                                 dp[:, :-1] + (arr != wc))
        # insertion closure: dp'[j] = min_{k<=j}(base[k] + (j-k))
        dp = np.minimum.accumulate(base - j_idx, axis=1) + j_idx
    return dp[np.arange(n), lens]


def regex_terms(dict_dir: str, field_id: int, pattern: str) -> pa.Table:
    """Dictionary entries of ``field_id`` whose RAW token fully matches
    ``pattern`` — Lucene's RegexpQuery shape.  Distributed Ray scan with a
    vectorized RE2 filter per batch (pyarrow and DuckDB both compile RE2,
    so the ``regexp_full_match`` oracle is engine-identical); only the
    vocabulary-bounded matches are collected."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    import ray

    from ..ops.collect import arrow_blocks

    anchored = f"^(?:{pattern})$"

    def match(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch.column("field"), field_id))
        keep = pc.match_substring_regex(batch.column("token"), anchored)
        return batch.filter(keep)

    ds = (
        ray.data.read_parquet(dict_dir, columns=["field"] + _COLS,
                              filter=pads.field("field") == field_id)
        .map_batches(match, batch_format="pyarrow")
    )
    blocks = [b for b in arrow_blocks(ds) if b.num_rows]
    if not blocks:
        return pa.table({c: pa.array([], pa.string() if c in ("token", "stem")
                                     else pa.int64())
                         for c in _COLS})
    return pa.concat_tables(
        [b.select(_COLS) for b in blocks]).sort_by("token")


def fuzzy_terms(dict_dir: str, field_id: int, word: str,
                max_dist: int) -> pa.Table:
    """Dictionary entries of ``field_id`` within Levenshtein distance
    ``max_dist`` of ``word`` (raw surface forms), with a ``dist`` column.
    Distributed: a pruned Ray scan (``tlen`` within ±max_dist is pushed
    into the parquet read) and a per-batch vectorized DP; only matches
    (vocabulary-bounded) are collected."""
    import glob as _glob

    import pyarrow.dataset as pads
    import ray

    from ..ops.collect import arrow_blocks

    lo, hi = len(word) - max_dist, len(word) + max_dist

    # small dictionaries (closed vocabularies): the Ray scan's fixed
    # per-job overhead dwarfs the work — read + DP in-process instead
    files = sorted(_glob.glob(os.path.join(dict_dir, "*.parquet")))
    total = sum(pq.read_metadata(p).num_rows for p in files)
    if total <= 100_000:
        t = pq.read_table(files, columns=["field", "tlen"] + _COLS,
                          filters=[("field", "==", field_id),
                                   ("tlen", ">=", lo),
                                   ("tlen", "<=", hi)])
        toks = t.column("token").to_pylist()
        dist = levenshtein_batch(toks, word)
        keep = dist <= max_dist
        t = (t.filter(pa.array(keep))
             .append_column("dist",
                            pa.array(dist[keep], pa.int64())))
        return t.select(_COLS + ["dist"]).sort_by("token")

    def score(batch: pa.Table) -> pa.Table:
        # exact residue of the pushdown, in case it pruned at row-group
        # granularity only
        batch = batch.filter(
            pa.compute.equal(batch.column("field"), field_id))
        toks = batch.column("token").to_pylist()
        dist = levenshtein_batch(toks, word)
        keep = dist <= max_dist
        out = batch.filter(pa.array(keep))
        return out.append_column("dist", pa.array(dist[keep], pa.int64()))

    ds = (
        ray.data.read_parquet(
            dict_dir, columns=["field", "tlen"] + _COLS,
            filter=((pads.field("field") == field_id)
                    & (pads.field("tlen") >= lo)
                    & (pads.field("tlen") <= hi)))
        .map_batches(score, batch_format="pyarrow")
    )
    blocks = [b for b in arrow_blocks(ds) if b.num_rows]
    if not blocks:
        return pa.table({c: pa.array([], pa.string() if c in ("token", "stem")
                                     else pa.int64())
                         for c in _COLS + ["dist"]})
    t = pa.concat_tables([b.select(_COLS + ["dist"]) for b in blocks])
    # exact residue of the field/tlen pushdown (row-group granularity)
    t = t.filter(pa.compute.less_equal(t.column("dist"), max_dist))
    return t.sort_by("token")
