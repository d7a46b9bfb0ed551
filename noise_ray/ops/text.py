"""Text-analysis operators over the ``documents`` table: token stats,
document fingerprinting, n-gram language ID, quality bucketing.

All are stateless vectorized ``map_batches`` stages; the regex/profile
setup happens once per actor via class stages where it matters.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import ray.data

_TOKEN_RE = re.compile(r"[a-z0-9]+")
# explicit ASCII whitespace class: must match the DuckDB (RE2) oracle regex
_WS_RE = re.compile(r"[ \t\n\x0b\x0c\r]+")


def _read_docs(sf_dir: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def token_stats(sf_dir: str):
    """(doc_id, n_tokens, n_distinct) with the same [a-z0-9]+ tokenization
    the DuckDB oracle uses — integer outputs, exact comparison."""
    def stats(batch: pa.Table) -> pa.Table:
        n_tok, n_dis = [], []
        for text in batch.column("text").to_pylist():
            toks = _TOKEN_RE.findall(text.lower())
            n_tok.append(len(toks))
            n_dis.append(len(set(toks)))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_distinct": pa.array(n_dis, pa.int64()),
        })

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow")


def fingerprint(sf_dir: str):
    """Content fingerprint: md5 of whitespace-collapsed lowercase text."""
    def fp(batch: pa.Table) -> pa.Table:
        out = [
            hashlib.md5(_WS_RE.sub(" ", t.lower()).encode("utf-8")).hexdigest()
            for t in batch.column("text").to_pylist()
        ]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "fp": pa.array(out, pa.string())})

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        fp, batch_format="pyarrow")


def quality_bucket(sf_dir: str):
    """Quality scoring reduced to deterministic integer buckets:
    bucket = (n_chars >= 200) + (n_tokens >= 40)."""
    def qb(batch: pa.Table) -> pa.Table:
        buckets = []
        for text, nc in zip(batch.column("text").to_pylist(),
                            batch.column("n_chars").to_pylist()):
            ntok = len(_TOKEN_RE.findall(text.lower()))
            buckets.append(int(nc >= 200) + int(ntok >= 40))
        return pa.table({"doc_id": batch.column("doc_id"),
                         "bucket": pa.array(buckets, pa.int64())})

    return _read_docs(sf_dir, ["doc_id", "text", "n_chars"]).map_batches(
        qb, batch_format="pyarrow")


# character n-gram profiles per language (tiny static profiles; a real
# deployment would train these — here they only need to be deterministic)
_LANG_PROFILES = {
    "en": ["the", "and", "ing", "ion", "ent", " th", "he ", "er "],
    "de": ["der", "die", "und", "ein", "sch", "en ", "ch ", "ge "],
    "fr": ["les", "des", "ent", "que", "ion", "le ", "de ", "es "],
    "es": ["los", "las", "que", "ión", "ent", "de ", "la ", "os "],
    "zh": [],  # CJK detected by codepoint range instead
}


class LangId:
    """Actor-pool language-ID stage: profiles compiled once per actor."""

    def __init__(self):
        self.profiles = {
            lang: set(grams) for lang, grams in _LANG_PROFILES.items()
        }

    def _predict(self, text: str) -> str:
        if any("一" <= ch <= "鿿" for ch in text[:400]):
            return "zh"
        t = text.lower()
        grams = {t[i : i + 3] for i in range(min(len(t), 2000) - 2)}
        best, best_score = "en", -1
        for lang, prof in self.profiles.items():
            if not prof:
                continue
            score = len(grams & prof)
            if score > best_score:
                best, best_score = lang, score
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self._predict(t) for t in batch.column("text").to_pylist()]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "pred_lang": pa.array(preds, pa.string())})


def langid(sf_dir: str):
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        LangId, batch_format="pyarrow", concurrency=(1, 4))
