"""Byte-pair-encoding tokenizer TRAINING over the documents corpus.

The industrial-strength shape (what SentencePiece/HF trainers do, made
distributed): BPE statistics are a function of the corpus's WORD
FREQUENCY table, not the token stream — so pass 1 collapses the corpus
to (word, count) in ONE vocabulary-bounded groupby, and every merge
round after that runs over the vocabulary table, never touching the
corpus again.  At 100 TB the corpus pass is the only wide step; the
merge loop is O(vocab) per round (a 10M-word vocabulary is ~200 MB —
driver-resident here, hash-range-sharded actors if it ever outgrows
that).  This is why a 100 TB BPE train is NOT "n_merges corpus passes".

Merge semantics (matching the published BPE algorithm): each round
counts all adjacent symbol pairs (overlapping, weighted by word count),
merges the single most frequent pair (ties: lexicographically smaller
pair string) everywhere it occurs, leftmost-non-overlapping within each
word, and records the rule.  The DuckDB oracle replicates the exact
loop as chained CTEs (``oracle_sqlgen.bpe_train_sql``): words as
space-separated symbol strings, the rewrite as a global re2
``\\bx y\\b`` replace — zero-width boundaries make leftmost
non-overlapping replacement identical to the vectorized run-parity
merge here.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _word_counts(sf_dir: str) -> tuple[list[str], np.ndarray]:
    """Corpus word-frequency table: per-batch ``value_counts`` partials
    (a map-side combiner bounded by per-batch vocabulary) folded in one
    ``groupby(word)``; the result is vocabulary-sized."""
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern_regex(
            pc.utf8_lower(batch.column("text")), "[^a-z0-9]+"))
        toks = toks.filter(pc.not_equal(toks, ""))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        vc = pc.value_counts(toks)
        return pa.table({"word": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    empty = pa.table({"word": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})
    blocks = [t.select(["word", "n"]) for t in ray.get(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                              columns=["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
        .to_arrow_refs()) if t.num_rows]
    t = pa.concat_tables(blocks) if blocks else empty
    return t.column("word").to_pylist(), t.column("n").to_numpy()


def bpe_train(sf_dir: str, n_merges: int = 6):
    """Learn the first ``n_merges`` BPE merge rules; returns
    (step, pair, n) — the rule sequence a tokenizer trainer emits."""
    words, counts = _word_counts(sf_dir)

    # flat symbol array over the vocabulary: word i owns
    # syms[offs[i]:offs[i+1]], weight counts[i]
    syms = np.array([c for w in words for c in w], dtype=object)
    lens = np.fromiter((len(w) for w in words), np.int64, len(words))
    offs = np.zeros(len(words) + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    word_of = np.repeat(np.arange(len(words), dtype=np.int64), lens)

    steps, pairs, ns = [], [], []
    for step in range(1, n_merges + 1):
        if syms.size < 2:
            break
        adj = word_of[:-1] == word_of[1:]  # within-word adjacency
        j = np.flatnonzero(adj)
        if j.size == 0:
            break
        # weighted pair counts (overlapping adjacency, the BPE statistic)
        pair_str = np.frompyfunc(lambda a, b: a + " " + b, 2, 1)(
            syms[j], syms[j + 1])
        u, inv = np.unique(pair_str, return_inverse=True)
        wsum = np.zeros(u.size, np.int64)
        np.add.at(wsum, inv, counts[word_of[j]])
        # top pair: count desc, pair-string asc (ties are few)
        tied = np.flatnonzero(wsum == wsum.max())
        top_pair = min(u[tied].tolist())
        best = tied[u[tied].tolist().index(top_pair)]
        top_n = int(wsum[best])
        steps.append(step)
        pairs.append(top_pair)
        ns.append(top_n)
        # leftmost-non-overlapping merge: among candidate positions,
        # keep even offsets within each run of consecutive candidates
        cand = j[inv == best]
        if cand.size:
            runs = np.flatnonzero(np.r_[True, np.diff(cand) != 1])
            run_id = np.cumsum(np.r_[True, np.diff(cand) != 1]) - 1
            off_in_run = np.arange(cand.size) - runs[run_id]
            keep = cand[off_in_run % 2 == 0]
            a, b = top_pair.split(" ")
            syms[keep] = a + b
            dead = np.ones(syms.size, bool)
            dead[keep + 1] = False
            syms = syms[dead]
            word_of = word_of[dead]

    return ray.data.from_arrow(pa.table({
        "step": pa.array(steps, pa.int64()),
        "pair": pa.array(pairs, pa.string()),
        "n": pa.array(ns, pa.int64()),
    }))
