"""BPE trainer: semantics pinned against a textbook while-loop reference
(overlapping pair counts, leftmost-non-overlapping merge); the oracle
gate re-checks the chained-CTE SQL replica."""

import collections
import re

import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
_WORD = re.compile(r"[a-z0-9]+")


def _ref_bpe(word_counts: dict, n_merges: int):
    vocab = collections.Counter()
    for w, c in word_counts.items():
        vocab[tuple(w)] += c
    merges = []
    for _ in range(n_merges):
        pc = collections.Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        (a, b), cnt = min(pc.items(),
                          key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
        merges.append((f"{a} {b}", cnt))
        new = collections.Counter()
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] += c
        vocab = new
    return merges


def _want(texts, n_merges):
    wc = collections.Counter()
    for txt in texts:
        wc.update(_WORD.findall(txt.lower()))
    return [(i + 1, p, n)
            for i, (p, n) in enumerate(_ref_bpe(wc, n_merges))]


def test_bpe_train_matches_reference(ray_session):
    from noise_ray.ops.bpe import bpe_train

    texts = pq.read_table(f"{SF}/documents.parquet",
                          columns=["text"]).column("text").to_pylist()
    want = _want(texts, 10)
    got = [(r["step"], r["pair"], r["n"])
           for r in bpe_train(SF, n_merges=10).take_all()]
    assert got == want
    # deeper rounds must chain onto merged symbols, or the test is weak
    assert any(len(p.replace(" ", "")) > 2 for _, p, _ in want)


def test_bpe_train_overlap_runs(ray_session, tmp_path):
    """Repeated-symbol runs: 'aaaa'→(aa)(aa), 'aaa'→(aa)a — the
    leftmost-non-overlapping run-parity merge, textbook semantics."""
    from noise_ray.ops.bpe import bpe_train

    texts = ["aaaa aaa aa baab", "aaaa aab"] * 3
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({"doc_id": pa.array(range(len(texts))),
                             "text": pa.array(texts)}),
                   str(d / "documents.parquet"))
    want = _want(texts, 4)
    got = [(r["step"], r["pair"], r["n"])
           for r in bpe_train(str(d), n_merges=4).take_all()]
    assert got == want
    assert want[0][1] == "a a"


def test_bpe_encode_counts_matches_reference(ray_session):
    from noise_ray.ops.bpe import bpe_encode_counts

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    texts = t.column("text").to_pylist()
    wc = collections.Counter()
    for txt in texts:
        wc.update(_WORD.findall(txt.lower()))
    merges = _ref_bpe(wc, 6)

    def seg_len(word):
        syms = list(word)
        for p, _ in merges:
            a, b = p.split(" ")
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

    want = {}
    for did, txt in zip(t.column("doc_id").to_pylist(), texts):
        ws = _WORD.findall(txt.lower())
        want[did] = (len(ws), sum(seg_len(w) for w in ws))
    out = bpe_encode_counts(SF, n_merges=6).take_all()
    assert len(out) == len(want)
    for r in out:
        assert want[r["doc_id"]] == (r["n_words"], r["n_bpe_tokens"])
    # merges must actually shorten something
    assert all(r["n_bpe_tokens"] < sum(map(len, _WORD.findall(t.lower())))
               for r, t in [(out[0], texts[0])])
