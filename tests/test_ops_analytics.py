"""Analytics operators (top_terms heavy hitters, grouped per-key top-k,
Lloyd k-means): semantics pinned against plain-Python references on the
sf0.001 fixture — the oracle gate re-checks them against DuckDB SQL."""

import collections
import re

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"
_WORD = re.compile(r"[a-z0-9]+")


def test_top_terms_matches_counter(ray_session):
    from noise_ray.ops.text import top_terms

    t = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    counts = collections.Counter()
    for txt in t.column("text").to_pylist():
        counts.update(_WORD.findall(txt.lower()))
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    got = [(r["term"], r["n"]) for r in top_terms(SF).take_all()]
    assert got == want


def test_grouped_topk_matches_reference(ray_session):
    from noise_ray.ops.text import grouped_topk

    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "source", "n_chars"])
    rows = sorted(zip(t.column("source").to_pylist(),
                      t.column("n_chars").to_pylist(),
                      t.column("doc_id").to_pylist()),
                  key=lambda r: (r[0], -r[1], r[2]))
    want, seen = [], collections.Counter()
    for src, nch, did in rows:
        seen[src] += 1
        if seen[src] <= 3:
            want.append((src, did, nch, seen[src]))
    got = [(r["source"], r["doc_id"], r["n_chars"], r["rank"])
           for r in grouped_topk(SF).take_all()]
    assert got == want
    # the partial top-k combiner is exact: rank-4 rows of one batch can
    # never enter another batch's top-3, asserted by the equality above


def _ref_kmeans(emb: np.ndarray, k: int, iters: int):
    cen = emb[:k].astype(np.float64).copy()
    for _ in range(iters):
        d2 = ((emb[:, None, :] - cen[None]) ** 2).sum(-1)
        a = np.argmin(d2, axis=1)
        for c in range(k):
            if (a == c).any():
                cen[c] = emb[a == c].mean(axis=0)
    d2 = ((emb[:, None, :] - cen[None]) ** 2).sum(-1)
    return np.argmin(d2, axis=1)


def test_kmeans_matches_reference(ray_session):
    from noise_ray.ops.similarity import embed_matrix, kmeans_embeddings

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    emb = embed_matrix(t.column("embedding"))
    want = _ref_kmeans(emb, 8, 3)
    out = kmeans_embeddings(SF).take_all()
    got = np.array([r["cluster"] for r in sorted(out, key=lambda r: r["vec_id"])])
    assert (got == want).all()
    assert len({r["cluster"] for r in out}) > 1  # nondegenerate clustering


def test_char_percentiles_matches_numpy(ray_session):
    from noise_ray.ops.text import char_percentiles

    t = pq.read_table(f"{SF}/documents.parquet", columns=["lang", "n_chars"])
    by_lang = collections.defaultdict(list)
    for lang, nc in zip(t.column("lang").to_pylist(),
                        t.column("n_chars").to_pylist()):
        by_lang[lang].append(nc)
    want = []
    for lang in sorted(by_lang):
        vs = sorted(by_lang[lang])
        n = len(vs)
        row = [lang]
        for pct in (50, 90, 99):
            k = -(-pct * n // 100)
            row.append(vs[k - 1])
        want.append(tuple(row))
    got = [(r["lang"], r["p50"], r["p90"], r["p99"])
           for r in char_percentiles(SF).take_all()]
    assert got == want


def test_sample_stratified_deterministic(ray_session):
    from noise_ray.ops.hashing import splitmix64
    from noise_ray.ops.text import sample_stratified

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
    ids = t.column("doc_id").to_numpy().astype(np.uint64)
    want = sorted(int(i) for i in ids[
        splitmix64(ids) < np.uint64((2**64 // 100) * 10)])
    got1 = [r["doc_id"] for r in sample_stratified(SF).take_all()]
    got2 = [r["doc_id"] for r in sample_stratified(SF).take_all()]
    assert got1 == want
    assert got2 == want  # reproducible across runs
    assert 0 < len(want) < len(ids)


def test_benchmark_contamination_matches_reference(ray_session):
    """Pure-Python 5-gram set reference on the sf0.001 fixture; the
    oracle gate re-checks the identical semantics against exact-string
    DuckDB SQL at sf0.01."""
    from noise_ray.ops.text import benchmark_contamination

    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"])

    def grams(txt):
        toks = _WORD.findall(txt.lower())
        return {" ".join(toks[i : i + 5])
                for i in range(len(toks) - 4)}

    docs = dict(zip(t.column("doc_id").to_pylist(),
                    t.column("text").to_pylist()))
    bench = set()
    for did, txt in docs.items():
        if did < 20:
            bench |= grams(txt)
    want = []
    for did in sorted(docs):
        if did < 20:
            continue
        n = len(grams(docs[did]) & bench)
        if n:
            want.append((did, n))
    got = [(r["doc_id"], r["n_shared"])
           for r in benchmark_contamination(SF).take_all()]
    assert got == want
    assert want, "fixture should contain at least one contaminated doc"


def test_pii_presets_catch_real_shaped_pii(ray_session):
    """The synthetic corpus is PII-free, so the presets are exercised
    here on strings with real-shaped PII, against Python re (re2 and re
    agree on these patterns — no backrefs/lookarounds)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from noise_ray.ops.text import PII_PATTERNS

    samples = [
        "mail me at jane.doe+spam@example.co.uk today",
        "server 10.0.255.3 and 192.168.1.1 are up",
        "call +1 555-123-4567 or 020 7946 0958 now",
        "no pii here at all",
        "mixed: bob@x.io from 8.8.8.8 dial 5551234567",
    ]
    union = "|".join(f"(?:{p})" for p in PII_PATTERNS.values())
    got = pc.replace_substring_regex(
        pa.array(samples), union, "[PII]").to_pylist()
    want = [re.sub(union, "[PII]", s) for s in samples]
    assert got == want
    assert got[0] == "mail me at [PII] today"
    assert got[1] == "server [PII] and [PII] are up"
    assert got[2] == "call [PII] or [PII] now"
    assert got[3] == samples[3]


def test_repetition_stats_matches_reference(ray_session):
    from noise_ray.ops.text import repetition_stats

    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"])
    want = []
    for did, txt in sorted(zip(t.column("doc_id").to_pylist(),
                               t.column("text").to_pylist())):
        toks = _WORD.findall(txt.lower())
        if len(toks) < 2:
            continue
        c = collections.Counter(zip(toks, toks[1:]))
        want.append((did, sum(c.values()), len(c), max(c.values())))
    got = [(r["doc_id"], r["n_bigrams"], r["n_distinct_bigrams"],
            r["top_bigram_count"])
           for r in repetition_stats(SF).take_all()]
    assert got == want


def test_pack_sequences_matches_prefix_sum(ray_session):
    from noise_ray.ops.mixing import pack_sequences

    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"])
    budget = 64
    want, cum = [], 0
    for did, txt in sorted(zip(t.column("doc_id").to_pylist(),
                               t.column("text").to_pylist())):
        n = len(_WORD.findall(txt.lower()))
        want.append((did, n, cum // budget))
        cum += n
    # tiny bucket size forces multiple buckets through the two-level
    # prefix sum even on the 50-doc fixture
    got = [(r["doc_id"], r["n_tokens"], r["pack_id"])
           for r in pack_sequences(SF, budget=budget,
                                   bucket_docs=8).take_all()]
    assert got == want
    assert want[-1][2] > 0, "fixture should span multiple packs"


def test_domain_mix_split_deterministic(ray_session):
    from noise_ray.ops.mixing import domain_mix_split

    got1 = [(r["doc_id"], r["source"], r["split"])
            for r in domain_mix_split(SF).take_all()]
    got2 = [(r["doc_id"], r["source"], r["split"])
            for r in domain_mix_split(SF).take_all()]
    assert got1 == got2
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
    assert 0 < len(got1) < t.num_rows
    assert {s for _, _, s in got1} <= {0, 1, 2}
    # keep-everything rates reproduce the full table
    full = domain_mix_split(
        SF, rates={f"src{i}": 100 for i in range(20)}).take_all()
    assert len(full) == t.num_rows
