"""Text-analysis operators over the ``documents`` table: token stats,
document fingerprinting, n-gram language ID, quality bucketing.

All are stateless vectorized ``map_batches`` stages; the regex/profile
setup happens once per actor via class stages where it matters.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data


def _read_docs(sf_dir: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def token_stats(sf_dir: str):
    """(doc_id, n_tokens, n_distinct) with the same [a-z0-9]+ tokenization
    the DuckDB oracle uses — integer outputs, exact comparison.

    Vectorized end to end: Arrow lower+split tokenization, per-doc token
    counts from list offsets, distinct counts by sorting (doc, token-hash)
    pairs and diffing a cumulative new-run counter (ops/hashing.py's
    64-bit token hashes; a within-doc collision is the only way this can
    undercount, vanishingly unlikely on natural text)."""
    from .hashing import tokenize_hashes

    def stats(batch: pa.Table) -> pa.Table:
        hashes, doc_offs = tokenize_hashes(batch.column("text"))
        counts = np.diff(doc_offs)
        n = len(counts)
        row_ids = np.repeat(np.arange(n, dtype=np.int64), counts)
        order = np.lexsort((hashes, row_ids))
        sh, sr = hashes[order], row_ids[order]
        new = np.ones(sh.size, dtype=np.int64)
        if sh.size > 1:
            new[1:] = (sh[1:] != sh[:-1]) | (sr[1:] != sr[:-1])
        csum = np.zeros(sh.size + 1, dtype=np.int64)
        np.cumsum(new, out=csum[1:])
        n_dis = csum[doc_offs[1:]] - csum[doc_offs[:-1]]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(counts, pa.int64()),
            "n_distinct": pa.array(n_dis, pa.int64()),
        })

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow")


def chunk_documents(sf_dir: str, size: int = 64, stride: int = 48):
    """RAG-prep chunking: split each document into token windows of
    ``size`` tokens starting every ``stride`` tokens (overlap =
    size - stride).  Output (doc_id, chunk_idx, chunk_text, n_tokens),
    chunk_text the lowercase tokens joined by single spaces — the
    embedding-input normalization.  A start is emitted while it is
    inside the doc AND the previous window did not already reach the
    end (``start == 0 or start + size - stride < n``), so short docs
    yield exactly one chunk and no redundant tail sub-windows.

    One streaming ``map_batches`` pass, fan-out rows (a flat_map shape
    expressed batch-wise); at 100 TB chunking is embarrassingly
    parallel and the output is written per input shard.  The token
    split is per-row (string assembly dominates regardless — every
    output byte is a new string); window arithmetic is numpy."""
    import re

    pattern = re.compile(r"[a-z0-9]+")

    def chunks(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_d, out_i, out_t, out_n = [], [], [], []
        for d, s in zip(ids, batch.column("text").to_pylist()):
            toks = pattern.findall(s.lower())
            n = len(toks)
            for ci, start in enumerate(range(0, n, stride)):
                if start and start + size - stride >= n:
                    break
                ck = toks[start:start + size]
                out_d.append(d)
                out_i.append(ci)
                out_t.append(" ".join(ck))
                out_n.append(len(ck))
        return pa.table({
            "doc_id": pa.array(out_d, pa.int64()),
            "chunk_idx": pa.array(out_i, pa.int64()),
            "chunk_text": pa.array(out_t, pa.string()),
            "n_tokens": pa.array(out_n, pa.int64()),
        })

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        chunks, batch_format="pyarrow")


def fingerprint(sf_dir: str):
    """Content fingerprint: md5 of whitespace-collapsed lowercase text.

    The collapse (lower + whitespace-run substitution) runs as Arrow
    kernels over the whole batch; only the md5 itself stays per-row —
    the hex digest IS the output column the DuckDB oracle compares, so
    the hash function cannot be swapped for a vectorizable one."""
    import pyarrow.compute as pc

    def fp(batch: pa.Table) -> pa.Table:
        collapsed = pc.replace_substring_regex(
            pc.utf8_lower(batch.column("text")),
            r"[ \t\n\x0b\x0c\r]+", " ")
        out = [hashlib.md5(t.encode("utf-8")).hexdigest()
               for t in collapsed.to_pylist()]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "fp": pa.array(out, pa.string())})

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        fp, batch_format="pyarrow")


def quality_bucket(sf_dir: str):
    """Quality scoring reduced to deterministic integer buckets:
    bucket = (n_chars >= 200) + (n_tokens >= 40)."""
    def qb(batch: pa.Table) -> pa.Table:
        from .hashing import tokenize_hashes

        _, doc_offs = tokenize_hashes(batch.column("text"))
        ntok = np.diff(doc_offs)
        nc = batch.column("n_chars").to_numpy()
        buckets = (nc >= 200).astype(np.int64) + (ntok >= 40)
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


def top_terms(sf_dir: str, k: int = 25):
    """Corpus-wide heavy hitters: the k most frequent [a-z0-9]+ tokens
    and their counts, ordered by (count desc, term asc).

    100 TB shape: the per-batch stage collapses each batch to its LOCAL
    (term, n) counts (Arrow lower/split/value_counts — a map-side
    combiner bounded by per-batch vocabulary), so the one groupby
    shuffles vocabulary-sized partials, never token streams; the final
    sort+limit moves only unique terms."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern_regex(
            pc.utf8_lower(batch.column("text")), "[^a-z0-9]+"))
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = pc.value_counts(
            toks.combine_chunks() if isinstance(toks, pa.ChunkedArray)
            else toks)
        return pa.table({"term": vc.field("values"),
                         "n": vc.field("counts")})

    from ray.data.aggregate import Sum

    return (
        _read_docs(sf_dir, ["text"])
        .map_batches(partial, batch_format="pyarrow", batch_size=16384)
        .groupby("term")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "term"], descending=[True, False])
        .limit(k)
    )


def grouped_topk(sf_dir: str, per: int = 3):
    """Top ``per`` documents by n_chars within every source (ties to the
    smaller doc_id): per-batch partial top-k per source first (bounds the
    shuffle to per*sources rows per batch), then one groupby finalizes.
    The same two-phase shape handles any per-key top-k at corpus scale."""

    def _local_topk(t: pa.Table) -> pa.Table:
        src = t.column("source").to_numpy(zero_copy_only=False)
        nch = t.column("n_chars").to_numpy()
        did = t.column("doc_id").to_numpy()
        # sort (source asc, n_chars desc, doc_id asc), keep first `per`
        # rows of each source run
        order = np.lexsort((did, -nch, src))
        src, nch, did = src[order], nch[order], did[order]
        starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        rank = np.arange(src.size) - np.repeat(starts,
                                               np.diff(np.r_[starts, src.size]))
        keep = rank < per
        return pa.table({
            "source": pa.array(src[keep], pa.string()),
            "doc_id": pa.array(did[keep], pa.int64()),
            "n_chars": pa.array(nch[keep], pa.int64()),
            "rank": pa.array(rank[keep] + 1, pa.int64()),
        })

    return (
        _read_docs(sf_dir, ["doc_id", "source", "n_chars"])
        .map_batches(lambda t: _local_topk(t).drop_columns(["rank"]),
                     batch_format="pyarrow")
        .groupby("source")
        .map_groups(_local_topk, batch_format="pyarrow")
        .sort(["source", "rank"])
    )


def char_percentiles(sf_dir: str):
    """Exact p50/p90/p99 of n_chars per lang — the histogram-quantile
    scale pattern: each batch collapses to (lang, value, count) partials
    (bounded by the value domain, not the row count), one groupby sums
    them, and the per-lang finalize walks the tiny cumulative histogram.
    No global sort touches the corpus.  Rank semantics are pure integer
    (smallest k with 100*k >= pct*n), shared verbatim with the SQL
    oracle, so the comparison is exact."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        lang = t.column("lang").to_numpy(zero_copy_only=False)
        v = t.column("n_chars").to_numpy().astype(np.int64)
        u, counts = np.unique(np.rec.fromarrays([lang, v]), return_counts=True)
        return pa.table({
            "lang": pa.array(u.f0, pa.string()),
            "v": pa.array(u.f1, pa.int64()),
            "cnt": pa.array(counts, pa.int64()),
        })

    def finalize(g: pa.Table) -> pa.Table:
        v = g.column("v").to_numpy()
        c = g.column("cnt").to_numpy()
        order = np.argsort(v)
        v, c = v[order], c[order]
        cum = np.cumsum(c)
        n = int(cum[-1])
        out = {"lang": pa.array([g.column("lang")[0].as_py()], pa.string())}
        for pct in (50, 90, 99):
            k = -(-pct * n // 100)  # smallest k with 100*k >= pct*n
            out[f"p{pct}"] = pa.array(
                [int(v[np.searchsorted(cum, k)])], pa.int64())
        return pa.table(out)

    return (
        _read_docs(sf_dir, ["lang", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "v"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .groupby("lang")
        .map_groups(finalize, batch_format="pyarrow")
        .sort("lang")
    )


def sample_stratified(sf_dir: str, pct: int = 10):
    """Deterministic, reproducible stratified sample: keep every doc
    whose splitmix64(doc_id) lands in the lowest ``pct`` percent of hash
    space, with per-lang counts attached — the subsampling primitive of
    a training-data pipeline (same rows on every run, every cluster
    size, any partitioning; no RNG state to coordinate).  Pure
    map_batches filter plus a tiny per-lang count groupby; the SQL
    oracle inlines the identical splitmix64 arithmetic."""
    from .hashing import splitmix64

    threshold = np.uint64((2**64 // 100) * pct)

    def pick(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.uint64)
        keep = splitmix64(ids) < threshold
        return t.filter(pa.array(keep))

    return (
        _read_docs(sf_dir, ["doc_id", "lang"])
        .map_batches(pick, batch_format="pyarrow")
        .sort("doc_id")
    )


# PII presets: RE2 syntax, which BOTH pyarrow.compute's re2-backed
# kernels and DuckDB's regexp_* functions share — the same pattern
# string gives byte-identical replacement on either engine.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+?\d[\d\- ]{7,14}\d",
}


def regex_redact(sf_dir: str, pattern: str = r"\bcustomer\b",
                 replacement: str = "[REDACTED]"):
    """Regex redaction over the corpus — the PII-scrubbing primitive of
    a training-data pipeline: replace every match with a placeholder and
    count the hits per doc.  Pure zero-copy Arrow: one streaming
    ``map_batches`` of `pc.replace_substring_regex` +
    `pc.count_substring_regex` (both re2, the same engine DuckDB's
    `regexp_replace(..., 'g')` uses, so the oracle compares the full
    redacted strings exactly).  The default pattern hits the synthetic
    corpus; real PII presets are in ``PII_PATTERNS`` (unioned by
    ``pii_redact``) and unit-tested on strings that contain PII."""
    import pyarrow.compute as pc

    def redact(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        return pa.table({
            "doc_id": t.column("doc_id"),
            "redacted": pc.replace_substring_regex(
                txt, pattern, replacement),
            "n_hits": pc.cast(
                pc.count_substring_regex(txt, pattern), pa.int64()),
        })

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        redact, batch_format="pyarrow")


def pii_redact(sf_dir: str):
    """All PII presets unioned into one redaction pass (see
    ``regex_redact``).  The synthetic corpus is PII-free so this is a
    verified no-op there; the presets themselves are exercised in
    tests/test_ops_analytics.py on strings with real-shaped PII."""
    union = "|".join(f"(?:{p})" for p in PII_PATTERNS.values())
    return regex_redact(sf_dir, pattern=union, replacement="[PII]")


def repetition_stats(sf_dir: str):
    """Gopher-style within-document repetition signals: per doc the
    total word-bigram count, the distinct-bigram count, and the
    most-frequent bigram's occurrence count (all int64 — exact oracle
    comparison; the duplicate- and top-fraction quality filters are
    ratios of these).  Docs with < 2 tokens emit no row (no bigrams),
    matching the oracle's UNNEST semantics.

    Vectorized: rolling 64-bit bigram hashes (ops/dedup._window_hashes),
    one lexsort per batch, run-length segmented reduce for distinct and
    max counts — the same kernel family as token_stats, same
    cross-gram-collision caveat."""
    from .dedup import _window_hashes

    def stats(t: pa.Table) -> pa.Table:
        wh, offs = _window_hashes(t.column("text"), 2)
        counts = offs[1:] - offs[:-1]
        n_docs = counts.size
        row_ids = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        order = np.lexsort((wh, row_ids))
        sh, sr = wh[order], row_ids[order]
        new = np.ones(sh.size, dtype=bool)
        if sh.size > 1:
            new[1:] = (sh[1:] != sh[:-1]) | (sr[1:] != sr[:-1])
        starts = np.flatnonzero(new)
        run_len = np.diff(np.append(starts, sh.size))
        run_row = sr[starts]
        n_dis = np.zeros(n_docs, dtype=np.int64)
        np.add.at(n_dis, run_row, 1)
        top = np.zeros(n_docs, dtype=np.int64)
        np.maximum.at(top, run_row, run_len)
        keep = np.flatnonzero(counts > 0)
        return pa.table({
            "doc_id": t.column("doc_id").take(pa.array(keep)),
            "n_bigrams": pa.array(counts[keep], pa.int64()),
            "n_distinct_bigrams": pa.array(n_dis[keep], pa.int64()),
            "top_bigram_count": pa.array(top[keep], pa.int64()),
        })

    return (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(stats, batch_format="pyarrow")
        .sort("doc_id")
    )


def benchmark_contamination(sf_dir: str, n: int = 5,
                            bench_max_doc: int = 20):
    """Benchmark-contamination detection: corpus docs sharing any word
    ``n``-gram with a held-out benchmark set (here: ``doc_id <
    bench_max_doc``), with the count of DISTINCT shared n-grams per doc
    — the decontamination primitive of a training-data pipeline (strip
    eval-set overlap before training).

    Scale shape: the benchmark side is tiny by construction (eval sets
    are MBs, the corpus is TBs), so its distinct n-gram hash set is
    computed once and broadcast via ``ray.put``; the corpus side is one
    streaming ``map_batches`` pass — vectorized rolling window hashes
    (ops/dedup._window_hashes), a searchsorted membership mask against
    the broadcast set, and a sort-diff distinct count per doc (same
    kernel as token_stats).  Output is sparse (contaminated docs only).
    64-bit n-gram hashes stand in for the strings; a cross-gram
    collision is the only way the count can differ from the exact-string
    oracle (vanishingly unlikely, same argument as token_stats)."""
    import pyarrow.parquet as pq
    import ray

    from ..nputil import sorted_member_mask
    from .dedup import _window_hashes

    bench = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        filters=[("doc_id", "<", bench_max_doc)])
    bh, _ = _window_hashes(bench.column("text"), n)
    bench_ref = ray.put(np.unique(bh))

    def scan(t: pa.Table) -> pa.Table:
        bset = ray.get(bench_ref)
        wh, offs = _window_hashes(t.column("text"), n)
        n_docs = offs.size - 1
        row_ids = np.repeat(np.arange(n_docs, dtype=np.int64),
                            offs[1:] - offs[:-1])
        hit = sorted_member_mask(bset, wh)
        sh, sr = wh[hit], row_ids[hit]
        order = np.lexsort((sh, sr))
        sh, sr = sh[order], sr[order]
        new = np.ones(sh.size, dtype=np.int64)
        if sh.size > 1:
            new[1:] = (sh[1:] != sh[:-1]) | (sr[1:] != sr[:-1])
        n_shared = np.zeros(n_docs, dtype=np.int64)
        np.add.at(n_shared, sr, new)
        rows = np.flatnonzero(n_shared)
        return pa.table({
            "doc_id": t.column("doc_id").take(pa.array(rows)),
            "n_shared": pa.array(n_shared[rows], pa.int64()),
        })

    return (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
            filter=(pq.filters_to_expression(
                [("doc_id", ">=", bench_max_doc)])))
        .map_batches(scan, batch_format="pyarrow")
        .sort("doc_id")
    )


def bpe_pair_counts(sf_dir: str, k: int = 20):
    """Adjacent symbol-pair frequencies within tokens — the statistic a
    byte-pair-encoding tokenizer trainer computes at every merge step
    (the top pair IS the next merge rule).

    Fully vectorized: one numpy pass over the flat token byte buffer
    counts all 2-byte windows that do not cross a token boundary via a
    single ``bincount`` over the 65536 possible pairs, so each batch
    collapses to at most 65536 (pair, n) partials — a map-side combiner
    bounded by the symbol-pair domain, never the token stream — and the
    one groupby shuffles those tiny partials.  Iterating merges (apply
    top pair, recount) re-runs this operator on the rewritten corpus;
    the single-step statistics are what the oracle pins."""
    from .hashing import _string_offsets_data, tokenize_values

    empty = pa.table({"pair": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})

    def partial(batch: pa.Table) -> pa.Table:
        values, _ = tokenize_values(batch.column("text"))
        if len(values) == 0:
            return empty
        offs, data = _string_offsets_data(values)
        lo, hi = int(offs[0]), int(offs[-1])
        data = data[lo:hi]
        offs = offs - lo
        if data.size < 2:
            return empty
        pairs = data[:-1].astype(np.uint32) * 256 + data[1:]
        # a window starting at a token's last byte crosses the boundary;
        # token ends are offs[1:]-1 (all tokens non-empty post-filter)
        valid = np.ones(pairs.size, bool)
        ends = offs[1:] - 1
        valid[ends[ends < pairs.size]] = False
        counts = np.bincount(pairs[valid], minlength=65536)
        nz = np.flatnonzero(counts)
        chars = np.stack([nz // 256, nz % 256], axis=1).astype(np.uint8)
        return pa.table({
            "pair": pa.array([bytes(c).decode("ascii") for c in chars],
                             pa.string()),
            "n": pa.array(counts[nz], pa.int64()),
        })

    from ray.data.aggregate import Sum

    return (
        _read_docs(sf_dir, ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "pair"], descending=[True, False])
        .limit(k)
    )


# Gopher-style quality rules (Rae et al. 2021 §A1.1, reduced to
# integer-exact predicates over the [a-z0-9]+ tokenization):
#   R1  5 <= n_tokens <= 10000
#   R2  mean token length in [2, 12]   (2*n <= chars <= 12*n)
#   R3  >= 70% of tokens contain an alphabetic character
#   R4  at least 2 stopword occurrences
_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_counters(texts) -> tuple[np.ndarray, ...]:
    """The Gopher rule counters for a batch of texts:
    (n_tokens, n_chars, n_alpha, n_stop, keep) int64 arrays — shared by
    :func:`quality_filter_gopher` and the composite corpus-prep
    pipeline.  Vectorized over the flat token byte buffer."""
    from .hashing import (_string_offsets_data, hash_string_array,
                          tokenize_values)

    stop_h = np.sort(hash_string_array(
        pa.array(list(_GOPHER_STOPWORDS), pa.string())))
    values, doc_offs = tokenize_values(texts)
    n_docs = doc_offs.size - 1
    n_tokens = np.diff(doc_offs)
    if len(values) == 0:
        z = np.zeros(n_docs, np.int64)
        return n_tokens, z, z, z, z
    offs, data = _string_offsets_data(values)
    lo = int(offs[0])
    offs = offs - lo
    tok_len = np.diff(offs)
    is_alpha = ((data >= 0x61) & (data <= 0x7A))[lo:]
    acs = np.zeros(is_alpha.size + 1, np.int64)
    np.cumsum(is_alpha, out=acs[1:])
    has_alpha = (acs[offs[1:]] > acs[offs[:-1]]).astype(np.int64)
    is_stop = np.isin(hash_string_array(values), stop_h).astype(np.int64)

    def per_doc(x):
        cs = np.zeros(x.size + 1, np.int64)
        np.cumsum(x, out=cs[1:])
        return cs[doc_offs[1:]] - cs[doc_offs[:-1]]

    n_chars = per_doc(tok_len)
    n_alpha = per_doc(has_alpha)
    n_stop = per_doc(is_stop)
    keep = ((n_tokens >= 5) & (n_tokens <= 10000)
            & (2 * n_tokens <= n_chars) & (n_chars <= 12 * n_tokens)
            & (10 * n_alpha >= 7 * n_tokens)
            & (n_stop >= 2)).astype(np.int64)
    return n_tokens, n_chars, n_alpha, n_stop, keep


def quality_filter_gopher(sf_dir: str):
    """Per-document Gopher-style quality rule evaluation: the four rule
    counters plus the combined keep flag, all integers so the DuckDB
    comparison is exact.  One streaming ``map_batches`` pass — counters
    come from the flat token byte buffer (lengths from offsets,
    alphabetic flags from one byte-range mask, stopword hits from an
    8-entry hash membership), per-doc sums via cumsum diffs at doc
    boundaries; no shuffle at all."""
    def rules(batch: pa.Table) -> pa.Table:
        n_tokens, n_chars, n_alpha, n_stop, keep = gopher_counters(
            batch.column("text"))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "n_tok_chars": pa.array(n_chars, pa.int64()),
            "n_alpha": pa.array(n_alpha, pa.int64()),
            "n_stop": pa.array(n_stop, pa.int64()),
            "keep": pa.array(keep, pa.int64()),
        })

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        rules, batch_format="pyarrow")


def tfidf_keywords(sf_dir: str, k: int = 5):
    """Per-document keyword extraction: the top ``k`` terms of every doc
    by tf/df weight (rarer-in-corpus terms win at equal tf — the
    monotone core of tf-idf, kept as one exact IEEE division so the
    DuckDB oracle ranks identically; ties break on the term string).

    Two corpus passes, both streaming: (1) document frequencies — each
    batch emits its per-term distinct-doc partials (vocabulary-bounded,
    a map-side combiner) into one ``groupby(term)`` fold, and the
    resulting vocabulary-sized (hash, df) table is broadcast once with
    ``ray.put``; (2) per-doc (term, tf) runs from one lexsort, df lookup
    by searchsorted into the broadcast, then a vectorized per-doc top-k
    (global lexsort on (doc, -score, term-rank) + run-length rank) —
    no per-row Python, no second shuffle.  At 100 TB the broadcast is
    bounded by vocabulary, not corpus; shard the df table by hash range
    if vocabulary itself outgrows a worker heap."""
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    from .hashing import hash_string_array, tokenize_values

    df_empty = pa.table({"h": pa.array([], pa.int64()),
                         "df": pa.array([], pa.int64())})

    def df_partial(batch: pa.Table) -> pa.Table:
        values, doc_offs = tokenize_values(batch.column("text"))
        # int64 bit view: Ray groupby keys round-trip through Python ints
        h = hash_string_array(values).view(np.int64)
        if h.size == 0:
            return df_empty
        n_docs = doc_offs.size - 1
        row_ids = np.repeat(np.arange(n_docs, dtype=np.int64),
                            np.diff(doc_offs))
        # distinct (term, doc) runs, then per-term run counts — one lexsort
        so = np.lexsort((row_ids, h))
        sh, sr = h[so], row_ids[so]
        firsts = np.r_[True, (sh[1:] != sh[:-1]) | (sr[1:] != sr[:-1])]
        sh_f = sh[firsts]
        starts = np.flatnonzero(np.r_[True, sh_f[1:] != sh_f[:-1]])
        return pa.table({
            "h": pa.array(sh_f[starts], pa.int64()),
            "df": pa.array(np.diff(np.r_[starts, sh_f.size]), pa.int64()),
        })

    from .collect import collect_table

    df_t = collect_table(
        _read_docs(sf_dir, ["text"])
        .map_batches(df_partial, batch_format="pyarrow",
                     batch_size=16384)
        .groupby("h")
        .aggregate(Sum("df", alias_name="df")), ["h", "df"])
    if df_t is None:
        df_t = df_empty
    dfh = df_t.column("h").to_numpy()
    dfv = df_t.column("df").to_numpy()
    order = np.argsort(dfh)
    df_ref = ray.put((dfh[order], dfv[order]))

    def topk(batch: pa.Table) -> pa.Table:
        dfh, dfv = ray.get(df_ref)
        values, doc_offs = tokenize_values(batch.column("text"))
        h = hash_string_array(values).view(np.int64)
        if h.size == 0:
            return pa.table({
                "doc_id": batch.column("doc_id").slice(0, 0),
                "rank": pa.array([], pa.int64()),
                "term": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
                "df": pa.array([], pa.int64())})
        n_docs = doc_offs.size - 1
        row_ids = np.repeat(np.arange(n_docs, dtype=np.int64),
                            np.diff(doc_offs))
        # per-(doc, term) tf from one lexsort + run lengths
        so = np.lexsort((h, row_ids))
        sh, sr = h[so], row_ids[so]
        starts = np.flatnonzero(
            np.r_[True, (sh[1:] != sh[:-1]) | (sr[1:] != sr[:-1])])
        tf = np.diff(np.r_[starts, sh.size])
        gh, gr = sh[starts], sr[starts]
        first_idx = so[starts]  # a representative token index per run
        df = dfv[np.searchsorted(dfh, gh)]
        score = tf.astype(np.float64) / df
        # term tie-break rank via one Arrow string sort of the uniques
        terms = values.take(pa.array(first_idx))
        trank = np.empty(len(terms), np.int64)
        trank[pc.sort_indices(terms).to_numpy()] = np.arange(len(terms))
        oo = np.lexsort((trank, -score, gr))
        rr = gr[oo]
        rstarts = np.flatnonzero(np.r_[True, rr[1:] != rr[:-1]])
        rank = np.arange(rr.size) - np.repeat(
            rstarts, np.diff(np.r_[rstarts, rr.size]))
        kept = rank < k
        oo = oo[kept]
        return pa.table({
            "doc_id": batch.column("doc_id").take(pa.array(gr[oo])),
            "rank": pa.array(rank[kept] + 1, pa.int64()),
            "term": terms.take(pa.array(oo)),
            "tf": pa.array(tf[oo], pa.int64()),
            "df": pa.array(df[oo], pa.int64()),
        })

    return (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(topk, batch_format="pyarrow")
        .sort(["doc_id", "rank"])
    )


def vocab_growth(sf_dir: str):
    """Vocabulary statistics per source: token occurrences, distinct
    terms, and hapax legomena (terms seen exactly once in that source) —
    the Heaps-law counters a corpus survey reports.

    Scale shape: batches collapse to (source, term-hash, n) partials,
    ONE groupby folds them to true per-(source, term) counts, and a
    second vocabulary-sized aggregation reduces to the per-source
    triple.  Nothing token-stream-sized ever shuffles."""
    import ray
    from ray.data.aggregate import Sum

    from .hashing import tokenize_hashes

    vg_empty = pa.table({"source": pa.array([], pa.string()),
                         "h": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64())})

    def partial(batch: pa.Table) -> pa.Table:
        h, doc_offs = tokenize_hashes(batch.column("text"))
        h = h.view(np.int64)  # Ray groupby keys round-trip as Python ints
        if h.size == 0:
            return vg_empty
        src = batch.column("source").to_numpy(zero_copy_only=False)
        u_src, src_code = np.unique(src, return_inverse=True)
        row_code = np.repeat(src_code.astype(np.int64), np.diff(doc_offs))
        # distinct (source, term) runs via one lexsort over the token stream
        so = np.lexsort((h, row_code))
        sh, sc = h[so], row_code[so]
        starts = np.flatnonzero(
            np.r_[True, (sh[1:] != sh[:-1]) | (sc[1:] != sc[:-1])])
        counts = np.diff(np.r_[starts, sh.size])
        return pa.table({
            "source": pa.array(u_src[sc[starts]], pa.string()),
            "h": pa.array(sh[starts], pa.int64()),
            "n": pa.array(counts, pa.int64()),
        })

    def fold(batch: pa.Table) -> pa.Table:
        src = batch.column("source").to_numpy(zero_copy_only=False)
        n = batch.column("n").to_numpy()
        u, inv = np.unique(src, return_inverse=True)
        tok = np.zeros(u.size, np.int64)
        np.add.at(tok, inv, n)
        terms = np.bincount(inv, minlength=u.size)
        hapax = np.zeros(u.size, np.int64)
        np.add.at(hapax, inv, (n == 1).astype(np.int64))
        return pa.table({
            "source": pa.array(u, pa.string()),
            "n_tokens": pa.array(tok, pa.int64()),
            "n_terms": pa.array(terms, pa.int64()),
            "n_hapax": pa.array(hapax, pa.int64()),
        })

    return (
        _read_docs(sf_dir, ["source", "text"])
        .map_batches(partial, batch_format="pyarrow", batch_size=16384)
        .groupby(["source", "h"])
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(fold, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n_tokens", alias_name="n_tokens"),
                   Sum("n_terms", alias_name="n_terms"),
                   Sum("n_hapax", alias_name="n_hapax"))
        .sort("source")
    )


def quality_filter_c4(sf_dir: str):
    """C4-style heuristic quality flags (Raffel et al. 2020 §2.2,
    reduced to document-level integer-exact predicates):
      R1  at least 3 sentence terminators ``[.!?]``
      R2  no ``{`` (code smell)
      R3  no "lorem ipsum" placeholder text
      R4  document ends with terminal punctuation (``. ! ? "``,
          trailing whitespace allowed)
    One streaming ``map_batches`` pass of four re2 kernels over the raw
    text — DuckDB's regexp_* is re2 too, so every flag compares exactly.
    No shuffle at all."""
    import pyarrow.compute as pc

    def rules(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n_sent = pc.cast(pc.count_substring_regex(text, "[.!?]"), pa.int64())
        has_brace = pc.cast(pc.match_substring(text, "{"), pa.int64())
        has_lorem = pc.cast(
            pc.match_substring(pc.utf8_lower(text), "lorem ipsum"),
            pa.int64())
        ends_punct = pc.cast(
            pc.match_substring_regex(text, '[.!?"][ \t\r\n]*$'), pa.int64())
        keep = pc.cast(
            pc.and_(pc.and_(pc.greater_equal(n_sent, 3),
                            pc.equal(has_brace, 0)),
                    pc.and_(pc.equal(has_lorem, 0),
                            pc.equal(ends_punct, 1))), pa.int64())
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_sentences": n_sent,
            "has_brace": has_brace,
            "has_lorem": has_lorem,
            "ends_punct": ends_punct,
            "keep": keep,
        })

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        rules, batch_format="pyarrow")


def _mix_bigram(h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    from .hashing import _B2, splitmix64

    with np.errstate(over="ignore"):
        return splitmix64(h1 * _B2 + h2)


_BG_EMPTY = pa.table({"hb": pa.array([], pa.int64()),
                      "h1": pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64())})


def _doc_bigram_arrays(batch: pa.Table):
    """(token values, first-token index of each bigram, bigram hash hb,
    first-token hash h1, per-token doc row ids)."""
    from .hashing import hash_string_array, tokenize_values

    values, doc_offs = tokenize_values(batch.column("text"))
    h = hash_string_array(values)
    if h.size < 2:
        return values, None, None, None, None
    n_docs = doc_offs.size - 1
    row_ids = np.repeat(np.arange(n_docs, dtype=np.int64),
                        np.diff(doc_offs))
    j = np.flatnonzero(row_ids[:-1] == row_ids[1:])  # within-doc pairs
    if j.size == 0:
        return values, None, None, None, None
    hb = _mix_bigram(h[j], h[j + 1]).view(np.int64)
    return values, j, hb, h[j].view(np.int64), row_ids


def _bigram_count_partial(batch: pa.Table) -> pa.Table:
    _values, j, hb, h1, _ = _doc_bigram_arrays(batch)
    if j is None:
        return _BG_EMPTY
    so = np.argsort(hb, kind="stable")
    sh = hb[so]
    starts = np.flatnonzero(np.r_[True, sh[1:] != sh[:-1]])
    return pa.table({
        "hb": pa.array(sh[starts], pa.int64()),
        "h1": pa.array(h1[so][starts], pa.int64()),
        "n": pa.array(np.diff(np.r_[starts, sh.size]), pa.int64()),
    })


def _bigram_model(sf_dir: str):
    """Corpus maximum-likelihood bigram LM: per-batch count partials
    folded in ONE groupby (keys are 64-bit mixed hashes, int64 bit
    views), prefix counts derived from the (already vocabulary-sized)
    folded table.  Returns (hb_sorted, cb_sorted, u1, cp1) — broadcast
    it once with ``ray.put``; shard by hash range if the vocabulary
    outgrows a worker heap."""
    from ray.data.aggregate import Min, Sum

    from .collect import collect_table

    bg_t = collect_table(
        _read_docs(sf_dir, ["text"])
        # big batches: bigram partials dedupe ~quadratically better with
        # batch size, shrinking what the fold shuffles
        .map_batches(_bigram_count_partial, batch_format="pyarrow",
                     batch_size=16384)
        .groupby("hb")  # h1 is functionally dependent on hb: Min = the value
        .aggregate(Min("h1", alias_name="h1"), Sum("n", alias_name="n")),
        ["hb", "h1", "n"])
    if bg_t is None:
        bg_t = _BG_EMPTY
    hb_all = bg_t.column("hb").to_numpy()
    h1_all = bg_t.column("h1").to_numpy()
    n_all = bg_t.column("n").to_numpy()
    bo = np.argsort(hb_all)
    u1, inv1 = np.unique(h1_all, return_inverse=True)
    cp1 = np.zeros(u1.size, np.int64)
    np.add.at(cp1, inv1, n_all)
    return hb_all[bo], n_all[bo], u1, cp1


def surprising_bigrams(sf_dir: str, k: int = 3):
    """Bigram-LM surprise scoring: each document's ``k`` most surprising
    word bigrams under the corpus's own maximum-likelihood bigram model
    — surprise = conditional probability c(w1 w2) / c(w1 ·), the lower
    the more anomalous.  The statistic behind n-gram-LM quality filters,
    kept as one exact IEEE division so DuckDB ranks identically (ties
    break on the bigram string; the space separator sorts below
    ``[a-z0-9]`` so string order equals (w1, w2) pair order).

    Scale shape mirrors :func:`tfidf_keywords`: pass 1 is the shared
    :func:`_bigram_model` fold broadcast via ``ray.put``; pass 2 ranks
    per-doc distinct bigrams with a vectorized top-k (lexsort +
    run-length rank)."""
    import pyarrow.compute as pc
    import ray

    _doc_bigrams = _doc_bigram_arrays
    model_ref = ray.put(_bigram_model(sf_dir))

    out_empty = pa.table({
        "doc_id": pa.array([], pa.int64()),
        "rank": pa.array([], pa.int64()),
        "bigram": pa.array([], pa.string()),
        "c_bigram": pa.array([], pa.int64()),
        "c_prefix": pa.array([], pa.int64())})

    def topk(batch: pa.Table) -> pa.Table:
        hb_s, cb_s, u1_s, cp_s = ray.get(model_ref)
        values, j, hb, h1, row_ids = _doc_bigrams(batch)
        if j is None:
            return out_empty
        gr_all = row_ids[j]
        # per-doc DISTINCT bigrams: runs of (doc, hb)
        so = np.lexsort((hb, gr_all))
        sh, sr = hb[so], gr_all[so]
        starts = np.flatnonzero(
            np.r_[True, (sh[1:] != sh[:-1]) | (sr[1:] != sr[:-1])])
        gh, gr = sh[starts], sr[starts]
        first_j = j[so[starts]]
        cb = cb_s[np.searchsorted(hb_s, gh)]
        cp = cp_s[np.searchsorted(u1_s, h1[so[starts]])]
        score = cb.astype(np.float64) / cp
        bigrams = pc.binary_join_element_wise(
            values.take(pa.array(first_j)),
            values.take(pa.array(first_j + 1)), " ")
        trank = np.empty(len(bigrams), np.int64)
        trank[pc.sort_indices(bigrams).to_numpy()] = np.arange(len(bigrams))
        oo = np.lexsort((trank, score, gr))  # surprise ASC
        rr = gr[oo]
        rstarts = np.flatnonzero(np.r_[True, rr[1:] != rr[:-1]])
        rank = np.arange(rr.size) - np.repeat(
            rstarts, np.diff(np.r_[rstarts, rr.size]))
        kept = rank < k
        oo = oo[kept]
        return pa.table({
            "doc_id": batch.column("doc_id").take(pa.array(gr[oo])),
            "rank": pa.array(rank[kept] + 1, pa.int64()),
            "bigram": bigrams.take(pa.array(oo)),
            "c_bigram": pa.array(cb[oo], pa.int64()),
            "c_prefix": pa.array(cp[oo], pa.int64()),
        })

    return (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(topk, batch_format="pyarrow")
        .sort(["doc_id", "rank"])
    )


def lm_perplexity(sf_dir: str, threshold: float = 4.885):
    """CCNet-style n-gram-LM perplexity quality filter: score every
    document by the mean negative log2 conditional probability of its
    word-bigram INSTANCES under the corpus's own maximum-likelihood
    bigram model — ``bits = (1/N) Σ (log2 c(w1·) − log2 c(w1 w2))`` —
    and keep docs at or below ``threshold`` bits (low perplexity =
    fluent, in-distribution text; CCNet runs this with a pretrained
    5-gram KenLM, here the LM is corpus-trained so the oracle is
    self-contained).  Every in-document bigram is in the training
    counts, so MLE needs no smoothing (c ≥ 1).

    Scale shape: pass 1 is the shared :func:`_bigram_model` fold (ONE
    groupby, vocabulary-sized, broadcast once via ``ray.put``); pass 2
    is one streaming map_batches — two searchsorted lookups + one
    segmented reduceat per batch, log terms summed in document bigram
    order.  Determinism: counts are exact integers (hash-collision
    caveat as token_stats); the per-doc mean is rounded once to 4dp —
    the same contract as the score oracles — and ``keep`` compares the
    ROUNDED value on both sides.  Docs with < 2 tokens have no bigrams
    and emit no row, matching the oracle's UNNEST semantics."""
    import ray

    model_ref = ray.put(_bigram_model(sf_dir))
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "n_bigrams": pa.array([], pa.int64()),
                      "bits": pa.array([], pa.float64()),
                      "keep": pa.array([], pa.int64())})

    def score(batch: pa.Table) -> pa.Table:
        hb_s, cb_s, u1_s, cp_s = ray.get(model_ref)
        _values, j, hb, h1, row_ids = _doc_bigram_arrays(batch)
        if j is None:
            return empty
        cb = cb_s[np.searchsorted(hb_s, hb)].astype(np.float64)
        cp = cp_s[np.searchsorted(u1_s, h1)].astype(np.float64)
        nll = np.log2(cp) - np.log2(cb)
        gr = row_ids[j]  # doc row per bigram instance, nondecreasing
        starts = np.flatnonzero(np.r_[True, gr[1:] != gr[:-1]])
        n_bg = np.diff(np.append(starts, gr.size)).astype(np.int64)
        bits = np.round(np.add.reduceat(nll, starts) / n_bg, 4)
        rows = gr[starts]
        return pa.table({
            "doc_id": batch.column("doc_id").take(pa.array(rows)),
            "n_bigrams": pa.array(n_bg, pa.int64()),
            "bits": pa.array(bits, pa.float64()),
            "keep": pa.array((bits <= threshold).astype(np.int64),
                             pa.int64()),
        })

    return (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(score, batch_format="pyarrow")
        .sort("doc_id")
    )


def kmv_distinct(sf_dir: str, k: int = 16):
    """KMV (k-minimum-values) distinct-words sketch per source: the k
    smallest distinct 64-bit token hashes of each source, plus the
    classic estimate (k-1)/max_kmv normalized to the hash space.  The
    mergeable sketch behind approximate COUNT DISTINCT at corpus scale —
    unions of sketches are just re-minimized k-sets, so per-batch
    partials combine associatively.

    Scale shape: each batch collapses to its local k-min set per source
    (a few k×sources rows — a map-side combiner), ONE groupby(source)
    re-minimizes, and nothing vocabulary- or corpus-sized shuffles.  The
    sketch rows are integers, so the DuckDB oracle (same splitmix64
    inlined as HUGEINT SQL) compares exactly; the estimate column is one
    IEEE division of those integers."""
    from .hashing import tokenize_hashes

    def partial(batch: pa.Table) -> pa.Table:
        h, doc_offs = tokenize_hashes(batch.column("text"))
        if h.size == 0:
            return pa.table({"source": pa.array([], pa.string()),
                             "h": pa.array([], pa.int64())})
        src = batch.column("source").to_numpy(zero_copy_only=False)
        u_src, src_code = np.unique(src, return_inverse=True)
        row_code = np.repeat(src_code.astype(np.int64), np.diff(doc_offs))
        so = np.lexsort((h, row_code))
        sh, sc = h[so], row_code[so]
        firsts = np.r_[True, (sh[1:] != sh[:-1]) | (sc[1:] != sc[:-1])]
        sh, sc = sh[firsts], sc[firsts]
        starts = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
        rank = np.arange(sc.size) - np.repeat(
            starts, np.diff(np.r_[starts, sc.size]))
        keep = rank < k  # per-source local k-min (sh ascending within src)
        return pa.table({
            "source": pa.array(u_src[sc[keep]], pa.string()),
            "h": pa.array(sh[keep], pa.uint64()),
        })

    def finalize(group: pa.Table) -> pa.Table:
        h = np.unique(group.column("h").to_numpy())[:k]
        est = (k - 1) / (h[-1] / np.float64(2**64)) if h.size == k else float(h.size)
        src = group.column("source")[0].as_py()
        return pa.table({
            "source": pa.array([src] * h.size, pa.string()),
            "rank": pa.array(np.arange(1, h.size + 1), pa.int64()),
            "h": pa.array(h.view(np.int64), pa.int64()),
            "est_distinct": pa.array(np.full(h.size, est), pa.float64()),
        })

    return (
        _read_docs(sf_dir, ["source", "text"])
        .map_batches(partial, batch_format="pyarrow", batch_size=16384)
        .groupby("source")
        .map_groups(finalize, batch_format="pyarrow")
        .sort(["source", "rank"])
    )


def winnow_fingerprints(sf_dir: str, window: int = 4) -> "ray.data.Dataset":
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003,
    the MOSS scheme): over each doc's 3-gram shingle-hash sequence
    (ops/hashing — the SAME position-weighted combine + splitmix64 the
    MinHash path uses, so the SQL replication is shared), keep the MIN
    hash of every ``window`` consecutive shingles, distinct per doc.
    Guarantees every match of length >= window+2 tokens shares a
    fingerprint while storing ~2/(window+1) of the shingles — the
    standard local-sampling dedup/plagiarism sketch.  Docs with fewer
    than ``window`` shingles keep their single minimum; empty docs emit
    nothing.  One streaming map_batches, doc-local, no shuffle.
    Returns (doc_id, fp[uint64]) distinct per doc."""
    from .dedup import _shingle_hashes

    def fp(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        sh, offs = _shingle_hashes(batch.column("text"))
        counts = offs[1:] - offs[:-1]
        out_d, out_f = [], []
        # long docs: sliding-window minima, vectorized across the batch
        m = sh.copy()
        for k in range(1, window):
            np.minimum(m[k:], sh[:-k], out=m[k:])
        pos = np.arange(sh.size) - np.repeat(offs[:-1], counts)
        valid = pos >= window - 1  # window fully inside the doc
        doc_of = np.repeat(np.arange(counts.size), counts)
        long_mask = np.repeat(counts >= window, counts) & valid
        if long_mask.any():
            out_d.append(ids[doc_of[long_mask]])
            out_f.append(m[long_mask])
        # short docs (1 <= s < window): one fingerprint, the min shingle
        short = np.flatnonzero((counts > 0) & (counts < window))
        if short.size:
            mins = np.minimum.reduceat(sh, offs[:-1][short])
            out_d.append(ids[short])
            out_f.append(mins)
        if not out_d:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "fp": pa.array([], pa.uint64())})
        d = np.concatenate(out_d)
        f = np.concatenate(out_f)
        key = np.stack([d.astype(np.uint64), f], axis=1)
        uniq = np.unique(key, axis=0)
        return pa.table({"doc_id": pa.array(uniq[:, 0].astype(np.int64),
                                            pa.int64()),
                         "fp": pa.array(uniq[:, 1], pa.uint64())})

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        fp, batch_format="pyarrow")


def winnow_dup_pairs(sf_dir: str, window: int = 4, min_shared: int = 2,
                     max_bucket: int = 256) -> "ray.data.Dataset":
    """Near-duplicate candidates from the winnowing sketch: doc pairs
    sharing >= ``min_shared`` fingerprints, counted only through
    fingerprint buckets of 2..``max_bucket`` docs (hub fingerprints —
    minima of ubiquitous trigrams — generate quadratic candidate noise
    and are EXCLUDED deterministically; the cap is part of the operator
    contract and is replicated verbatim in the SQL oracle, so nothing is
    silently dropped).  Shape: one fp groupby emits per-bucket pairs,
    one (a, b) groupby sums shared counts, and the ``min_shared``
    filter runs INSIDE the dataset before anything leaves the workers —
    the pre-filter candidate-pair table (orders of magnitude larger
    than the answer on near-dup-heavy corpora) never reaches the
    driver.  Returns a streaming Dataset of (a_id, b_id, shared)
    ordered (a_id, b_id)."""
    from ray.data.aggregate import Count

    fps = winnow_fingerprints(sf_dir, window=window)

    def bucket_pairs(g: pa.Table) -> pa.Table:
        ids = np.sort(g.column("doc_id").to_numpy())
        if not 2 <= ids.size <= max_bucket:
            return pa.table({"a_id": pa.array([], pa.int64()),
                             "b_id": pa.array([], pa.int64())})
        i, j = np.triu_indices(ids.size, k=1)
        return pa.table({"a_id": pa.array(ids[i], pa.int64()),
                         "b_id": pa.array(ids[j], pa.int64())})

    def keep_shared(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pa.compute.greater_equal(
            batch.column("shared"), min_shared))
        return batch.set_column(
            batch.schema.get_field_index("shared"), "shared",
            batch.column("shared").cast(pa.int64()))

    pairs = fps.groupby("fp").map_groups(bucket_pairs,
                                         batch_format="pyarrow")
    return (pairs.groupby(["a_id", "b_id"])
            .aggregate(Count(alias_name="shared"))
            .map_batches(keep_shared, batch_format="pyarrow")
            .sort(["a_id", "b_id"]))


def _dsir_features(batch: pa.Table, n_buckets: int):
    """Hashed unigram+bigram feature-bucket instances per doc:
    (bucket[int64], doc-row per instance, n_docs).  Unigrams first,
    then within-doc bigrams — the order the per-doc log-ratio sum
    folds in."""
    from .hashing import _B2, splitmix64, tokenize_hashes

    h, offs = tokenize_hashes(batch.column("text"))
    n_docs = offs.size - 1
    row_ids = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(offs))
    if h.size >= 2:
        j = np.flatnonzero(row_ids[:-1] == row_ids[1:])
        with np.errstate(over="ignore"):
            hb = splitmix64(h[j] * _B2 + h[j + 1])
    else:
        j = np.zeros(0, np.int64)
        hb = np.zeros(0, np.uint64)
    nb = np.uint64(n_buckets)
    fb = np.concatenate([(h % nb).astype(np.int64),
                         (hb % nb).astype(np.int64)])
    fr = np.concatenate([row_ids, row_ids[j]])
    return fb, fr, n_docs


def dsir_select(sf_dir: str, target_source: str = "src0", k: int = 50,
                n_buckets: int = 256):
    """DSIR data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): rank raw-corpus docs
    by importance weight under hashed n-gram feature distributions —
    ``log w(x) = Σ_instances [ln p̂(b) − ln q̂(b)]`` with p̂ the target
    distribution (here: docs from ``target_source``), q̂ the raw
    distribution (the whole corpus), features = unigram+bigram hashes
    into ``n_buckets`` buckets, add-one smoothing.  Returns the top
    ``k`` docs by (logw desc, doc_id asc) — the selection DSIR keeps
    for training.

    Scale shape: pass 1 folds dense ``n_buckets``-sized per-batch count
    partials (a map-side combiner: each batch emits exactly n_buckets
    rows) in ONE groupby, and broadcasts the n_buckets log-ratio floats
    via ``ray.put``; pass 2 is one streaming map_batches with a gather
    + segmented reduceat per doc and a LOCAL top-k — only k rows per
    batch reach the driver merge.  Determinism: counts are exact
    integers; log-ratio terms fold per doc in (unigrams, bigrams)
    order, rounded once to 4dp BEFORE ranking (both sides rank the
    rounded value — the score-oracle contract)."""
    import ray
    from ray.data.aggregate import Sum

    from .collect import collect_table

    B = n_buckets
    arange_b = np.arange(B, dtype=np.int64)

    def count_partial(batch: pa.Table) -> pa.Table:
        fb, fr, _n = _dsir_features(batch, B)
        src = batch.column("source").to_numpy(zero_copy_only=False)
        is_t = (src == target_source)[fr]
        return pa.table({
            "b": pa.array(arange_b, pa.int64()),
            "tn": pa.array(np.bincount(fb[is_t], minlength=B)
                           .astype(np.int64), pa.int64()),
            "rn": pa.array(np.bincount(fb, minlength=B).astype(np.int64),
                           pa.int64()),
        })

    ct = collect_table(
        _read_docs(sf_dir, ["text", "source"])
        .map_batches(count_partial, batch_format="pyarrow")
        .groupby("b")
        .aggregate(Sum("tn", alias_name="tn"), Sum("rn", alias_name="rn")),
        ["b", "tn", "rn"])
    tgt = np.zeros(B, np.int64)
    raw = np.zeros(B, np.int64)
    if ct is not None:
        bb = ct.column("b").to_numpy()
        tgt[bb] = ct.column("tn").to_numpy()
        raw[bb] = ct.column("rn").to_numpy()
    tgt_tot, raw_tot = int(tgt.sum()), int(raw.sum())
    ratio = (np.log((tgt + 1.0) / (tgt_tot + float(B)))
             - np.log((raw + 1.0) / (raw_tot + float(B))))
    ratio_ref = ray.put(ratio)

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "n_feats": pa.array([], pa.int64()),
                      "logw": pa.array([], pa.float64())})

    def score_partial(batch: pa.Table) -> pa.Table:
        r = ray.get(ratio_ref)
        fb, fr, _n = _dsir_features(batch, B)
        if not fb.size:
            return empty
        order = np.argsort(fr, kind="stable")
        sfb, sfr = fb[order], fr[order]
        starts = np.flatnonzero(np.r_[True, sfr[1:] != sfr[:-1]])
        nf = np.diff(np.append(starts, sfr.size)).astype(np.int64)
        logw = np.round(np.add.reduceat(r[sfb], starts), 4)
        doc_ids = (batch.column("doc_id").to_numpy(zero_copy_only=False)
                   [sfr[starts]])
        oo = np.lexsort((doc_ids, -logw))[:k]
        return pa.table({"doc_id": pa.array(doc_ids[oo], pa.int64()),
                         "n_feats": pa.array(nf[oo], pa.int64()),
                         "logw": pa.array(logw[oo], pa.float64())})

    parts = collect_table(
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(score_partial, batch_format="pyarrow"),
        ["doc_id", "n_feats", "logw"])
    if parts is None:
        return empty
    doc_ids = parts.column("doc_id").to_numpy()
    logw = parts.column("logw").to_numpy()
    oo = np.lexsort((doc_ids, -logw))[:k]
    return parts.take(pa.array(oo))


def nb_classify(sf_dir: str, pos_source: str = "src0",
                neg_source: str = "src1"):
    """Naive-Bayes quality classifier (the GPT-3/CCNet-style linear
    filter: score unlabeled text against a small labeled seed): train
    multinomial NB with add-one smoothing on seed classes — positive =
    docs from ``pos_source``, negative = ``neg_source`` — and score
    EVERY doc with the log-odds ``ln(Dpos/Dneg) + Σ_tokens
    [ln((cpos_t+1)/(Tpos+V)) − ln((cneg_t+1)/(Tneg+V))]`` (V = corpus
    distinct-token vocabulary, so unseen tokens smooth identically on
    both sides).  Returns (doc_id, n_tokens, logodds 4dp, pred) for all
    docs; ``pred`` thresholds the ROUNDED log-odds at 0.

    Scale shape: pass 1 folds per-batch (token-hash, pos_n, neg_n)
    vocabulary partials in ONE groupby plus a source-cardinality doc
    count; the per-token log-ratio array broadcasts via ``ray.put``
    (vocabulary-bounded); pass 2 is one streaming map_batches —
    searchsorted gather + offsets-cumsum per-doc sums (empty docs score
    the prior alone).  Same determinism contract as dsir_select."""
    import ray
    from ray.data.aggregate import Sum

    from .collect import collect_table
    from .hashing import tokenize_hashes

    vempty = pa.table({"h": pa.array([], pa.int64()),
                       "pn": pa.array([], pa.int64()),
                       "nn": pa.array([], pa.int64())})

    def count_partial(batch: pa.Table) -> pa.Table:
        h, offs = tokenize_hashes(batch.column("text"))
        if not h.size:
            return vempty
        src = batch.column("source").to_numpy(zero_copy_only=False)
        row_src = np.repeat(src, np.diff(offs))
        hi = h.view(np.int64)
        so = np.argsort(hi, kind="stable")
        sh = hi[so]
        starts = np.flatnonzero(np.r_[True, sh[1:] != sh[:-1]])
        seg = np.zeros(sh.size, np.int64)
        seg[starts] = 1
        seg = np.cumsum(seg) - 1
        pn = np.zeros(starts.size, np.int64)
        nn = np.zeros(starts.size, np.int64)
        np.add.at(pn, seg, (row_src[so] == pos_source).astype(np.int64))
        np.add.at(nn, seg, (row_src[so] == neg_source).astype(np.int64))
        return pa.table({"h": pa.array(sh[starts], pa.int64()),
                         "pn": pa.array(pn, pa.int64()),
                         "nn": pa.array(nn, pa.int64())})

    vt = collect_table(
        _read_docs(sf_dir, ["text", "source"])
        .map_batches(count_partial, batch_format="pyarrow",
                     batch_size=16384)
        .groupby("h")
        .aggregate(Sum("pn", alias_name="pn"), Sum("nn", alias_name="nn")),
        ["h", "pn", "nn"])
    if vt is None:
        vt = vempty
    hs = vt.column("h").to_numpy()
    pn = vt.column("pn").to_numpy()
    nn = vt.column("nn").to_numpy()
    so = np.argsort(hs)
    hs, pn, nn = hs[so], pn[so], nn[so]
    v_size = hs.size
    t_pos, t_neg = int(pn.sum()), int(nn.sum())

    def src_partial(batch: pa.Table) -> pa.Table:
        src = batch.column("source").to_numpy(zero_copy_only=False)
        u, c = np.unique(src, return_counts=True)
        return pa.table({"s": pa.array(u.tolist(), pa.string()),
                         "n": pa.array(c.astype(np.int64), pa.int64())})

    st = collect_table(
        _read_docs(sf_dir, ["source"])
        .map_batches(src_partial, batch_format="pyarrow")
        .groupby("s").aggregate(Sum("n", alias_name="n")), ["s", "n"])
    d_cnt = dict(zip(st.column("s").to_pylist(),
                     st.column("n").to_pylist()))
    prior = np.log(float(d_cnt[pos_source]) / float(d_cnt[neg_source]))

    lr = (np.log((pn + 1.0) / (t_pos + float(v_size)))
          - np.log((nn + 1.0) / (t_neg + float(v_size))))
    model_ref = ray.put((hs, lr))

    def score(batch: pa.Table) -> pa.Table:
        hs_s, lr_s = ray.get(model_ref)
        h, offs = tokenize_hashes(batch.column("text"))
        terms = lr_s[np.searchsorted(hs_s, h.view(np.int64))]
        # per-doc direct sums (reduceat), not a batch-wide cumsum diff —
        # the oracle's per-group sum has no cross-doc rounding carry
        lens = np.diff(offs)
        tok_sum = np.zeros(lens.size, np.float64)
        nz = np.flatnonzero(lens)
        if nz.size:
            tok_sum[nz] = np.add.reduceat(terms, offs[:-1][nz])
        logodds = np.round(prior + tok_sum, 4)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(np.diff(offs), pa.int64()),
            "logodds": pa.array(logodds, pa.float64()),
            "pred": pa.array((logodds > 0).astype(np.int64), pa.int64()),
        })

    return (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(score, batch_format="pyarrow")
        .sort("doc_id")
    )
