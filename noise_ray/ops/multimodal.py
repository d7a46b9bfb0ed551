"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decoding libraries are not available in this environment,
so the decode step is a clearly-marked stub — but the Ray-side plumbing is
real and tested: binary columns flow through the object store zero-copy,
the decoder is an actor-pool ``map_batches`` stage with setup in
``__init__``, batch sizes are kept small for large payloads, and the output
layout is a typed metadata table.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import ray.data


def synthesize_payloads(sf_dir: str):
    """Deterministic fake binary payloads: each document's text encoded as
    bytes stands in for an image blob (schema: doc_id, payload:binary,
    mime:string)."""
    def make(batch: pa.Table) -> pa.Table:
        payloads = [t.encode("utf-8") for t in batch.column("text").to_pylist()]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["application/octet-stream"] * len(payloads)),
        })

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(make, batch_format="pyarrow")


class PayloadDecoder:
    """Actor-pool decode stage.  A real deployment loads the codec/model
    here once per actor; this stub extracts byte-level metadata only."""

    def __init__(self, decode: bool = False):
        self.decode = decode
        if decode:
            raise NotImplementedError(
                "real image/audio decoding is stubbed in this environment; "
                "plug a codec in here (loaded once per actor)"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = []
        digests = []
        for buf in batch.column("payload"):
            b = buf.as_py()
            metas.append(len(b))
            digests.append(hashlib.md5(b).hexdigest())
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_bytes": pa.array(metas, pa.int64()),
            "digest": pa.array(digests, pa.string()),
        })


def payload_metadata(sf_dir: str):
    """doc_id → payload byte size + digest via the actor-pool decoder
    (small batch_size: binary payloads are memory-heavy at scale)."""
    return synthesize_payloads(sf_dir).map_batches(
        PayloadDecoder, batch_format="pyarrow", batch_size=256,
        concurrency=(1, 4),
    )
