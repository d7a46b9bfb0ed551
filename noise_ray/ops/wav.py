"""Pure-numpy WAV codec (RIFF / PCM16), the audio twin of ops/png.py.

No audio library ships in this environment, so the audio decode stage
carries its own real codec for the canonical uncompressed format: a
spec-compliant WAVE subset on stdlib ``struct`` + numpy (RIFF-1991 /
WAVE PCM, public format documents).  The encoder writes genuine .wav
files (RIFF header, fmt chunk, data chunk, even-byte padding rule) and
the decoder is a real chunk walk — it verifies the RIFF/WAVE magic,
tolerates unknown chunks (LIST, fact, …) by skipping them per the RIFF
contract, validates fmt (PCM, 16-bit) against the data payload, and
raises ValueError on truncation or malformed sizes — any 16-bit PCM
WAV from any writer decodes, not just ours.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Encode (n,) or (n, channels) int16 samples at ``rate`` Hz."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    block = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block, block, 16)
    pad = b"\x00" if len(data) % 2 else b""
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data + pad)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """Decode a 16-bit PCM WAV to ((n, channels) int16, rate).

    Walks RIFF chunks, skipping unknown ones (word-aligned per the RIFF
    rule); raises ValueError on bad magic, truncation, or non-PCM-16
    formats — the real failure surface of an audio ingest stage."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    (riff_size,) = struct.unpack("<I", buf[4:8])
    if riff_size + 8 > len(buf):
        raise ValueError("truncated RIFF payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(buf):
        tag = buf[pos:pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4:pos + 8])
        payload = buf[pos + 8:pos + 8 + size]
        if len(payload) != size:
            raise ValueError(f"truncated {tag!r} chunk")
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", payload[:16])
        elif tag == b"data":
            data = payload
        # unknown chunks (LIST, fact, cue, …) skip; chunks are word-aligned
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_fmt, ch, rate, byte_rate, block, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"unsupported WAV (fmt={audio_fmt}, bits={bits})")
    if block != ch * 2 or byte_rate != rate * block:
        raise ValueError("inconsistent fmt block/byte rate")
    if len(data) % block:
        raise ValueError("data chunk not frame-aligned")
    return np.frombuffer(data, "<i2").reshape(-1, ch), rate


def synth_audio(doc_id: int) -> tuple[np.ndarray, int]:
    """Deterministic synthetic mono PCM16 clip for one doc: length,
    rate and samples are closed-form in (doc_id, i) so a SQL oracle can
    recompute every statistic exactly."""
    n = 256 + (doc_id * 13) % 256
    rate = 8000 + (doc_id % 4) * 4000
    i = np.arange(n, dtype=np.int64)
    samples = ((doc_id * 37 + i * 71) % 4096 - 2048).astype(np.int16)
    return samples, rate
