"""JSONL transcript source.

The reference ingests JSON documents (``Index::add``,
/root/reference/src/index.rs:131-161); our native storage is Parquet.
This adapter streams JSONL through Ray Data into schema-normalized,
key-sorted Parquet shards that ``build_index`` (and the REPL's ``add``)
accept — one ``read_json`` → normalize ``map_batches`` → ``write_parquet``
pipeline, no driver-side materialization.
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])


def _normalize(batch: pa.Table) -> pa.Table:
    cols = {}
    names = set(batch.column_names)
    for f in _SCHEMA:
        if f.name in names:
            col = batch.column(f.name)
            if not col.type.equals(f.type):
                col = pc.cast(col, f.type)
        elif f.name == "tool":
            col = pa.nulls(batch.num_rows, pa.string())
        elif f.name == "ts":
            col = pa.nulls(batch.num_rows, pa.timestamp("us"))
        else:
            raise ValueError(f"jsonl input missing required field {f.name!r}")
        cols[f.name] = col
    return pa.table(cols)


def _convert(ds: "ray.data.Dataset", out_dir: str) -> list[str]:
    """Normalize → global (conv_id, turn_idx) sort → Parquet shards.

    The sort makes the output range-partitioned for the metadata-only
    doc_id plan (unsorted input would otherwise trigger the build's own
    repartition fallback and sort twice)."""
    import shutil

    tmp = f"{out_dir}.tmp-{uuid.uuid4().hex[:8]}"
    (
        ds.map_batches(_normalize, batch_format="pyarrow")
        .sort(["conv_id", "turn_idx"])
        .write_parquet(tmp)
    )
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)  # stale partial conversion
    os.replace(tmp, out_dir)
    return sorted(os.path.join(out_dir, f) for f in os.listdir(out_dir)
                  if f.endswith(".parquet"))


def jsonl_to_parquet(in_paths: list[str], out_dir: str) -> list[str]:
    """Convert JSONL transcript files to build-ready Parquet shards."""
    return _convert(ray.data.read_json(in_paths), out_dir)


def csv_to_parquet(in_paths: list[str], out_dir: str) -> list[str]:
    """Convert CSV transcript files to build-ready Parquet shards."""
    return _convert(ray.data.read_csv(in_paths), out_dir)
