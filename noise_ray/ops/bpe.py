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

    from .collect import collect_table

    t = collect_table(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                              columns=["text"])
        .map_batches(partial, batch_format="pyarrow", batch_size=16384)
        .groupby("word")
        .aggregate(Sum("n", alias_name="n")), ["word", "n"])
    if t is None:
        t = pa.table({"word": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})
    return t.column("word").to_pylist(), t.column("n").to_numpy()


def learn_merges(sf_dir: str, n_merges: int = 6) -> list[tuple[str, int]]:
    """The trainer loop: returns the ``[(pair, weighted_count), ...]``
    merge-rule sequence.  One corpus pass, then vocabulary-local."""
    words, counts = _word_counts(sf_dir)

    # flat symbol array over the vocabulary: word i owns
    # syms[offs[i]:offs[i+1]], weight counts[i]
    syms = np.array([c for w in words for c in w], dtype=object)
    lens = np.fromiter((len(w) for w in words), np.int64, len(words))
    offs = np.zeros(len(words) + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    word_of = np.repeat(np.arange(len(words), dtype=np.int64), lens)

    merges: list[tuple[str, int]] = []
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
        merges.append((top_pair, int(wsum[best])))
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

    return merges


def bpe_train(sf_dir: str, n_merges: int = 6):
    """Learn the first ``n_merges`` BPE merge rules; returns
    (step, pair, n) — the rule sequence a tokenizer trainer emits."""
    merges = learn_merges(sf_dir, n_merges)
    return ray.data.from_arrow(pa.table({
        "step": pa.array(range(1, len(merges) + 1), pa.int64()),
        "pair": pa.array([p for p, _ in merges], pa.string()),
        "n": pa.array([n for _, n in merges], pa.int64()),
    }))


def _apply_merges(word: str, rules: list[tuple[str, str]]) -> int:
    """Segment length of one word under the rule sequence (leftmost
    non-overlapping, textbook order)."""
    syms = list(word)
    for a, b in rules:
        if len(syms) < 2:
            break
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return len(syms)


def bpe_encode_counts(sf_dir: str, n_merges: int = 6):
    """Apply the learned merges back over the corpus: per-document word
    and BPE-token counts — the tokenize-and-count stage a training-data
    budget estimate runs after training a tokenizer.

    Scale shape: the rule list is broadcast once with ``ray.put``; each
    batch dictionary-encodes its tokens so the (Python) merge walk runs
    once per DISTINCT word in the batch — bounded by batch vocabulary,
    not token count — and per-doc sums come from one cumsum.  The
    DuckDB oracle reuses the trainer's CTE chain with the word column
    carried through, so the final segmentation is joined back by word
    (``oracle_sqlgen.bpe_encode_counts_sql``)."""
    import pyarrow.compute as pc
    import ray

    from .hashing import tokenize_values

    rules_ref = ray.put([tuple(p.split(" "))
                         for p, _ in learn_merges(sf_dir, n_merges)])

    def enc(batch: pa.Table) -> pa.Table:
        rules = ray.get(rules_ref)
        values, doc_offs = tokenize_values(batch.column("text"))
        n_words = np.diff(doc_offs)
        if len(values) == 0:
            z = pa.array(np.zeros(n_words.size, np.int64))
            return pa.table({"doc_id": batch.column("doc_id"),
                             "n_words": pa.array(n_words, pa.int64()),
                             "n_bpe_tokens": z})
        d = pc.dictionary_encode(values)
        idx = d.indices.to_numpy()
        uniq = d.dictionary.to_pylist()
        ulen = np.fromiter((_apply_merges(w, rules) for w in uniq),
                           np.int64, len(uniq))
        tok_lens = ulen[idx]
        csum = np.zeros(tok_lens.size + 1, np.int64)
        np.cumsum(tok_lens, out=csum[1:])
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_words": pa.array(n_words, pa.int64()),
            "n_bpe_tokens": pa.array(csum[doc_offs[1:]] - csum[doc_offs[:-1]],
                                     pa.int64()),
        })

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"]).map_batches(
        enc, batch_format="pyarrow")
