"""Dedup-operator quality tests: the LSH paths are rows-only at the
oracle gate (banding isn't SQL-expressible), so this suite pins their
semantics against brute force on the sf0.001 fixture instead."""

import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"
_WORD = re.compile(r"[a-z0-9]+")


def test_tokenize_hashes_matches_regex_tokenizer():
    from noise_ray.ops.hashing import tokenize_hashes

    texts = ["The quick brown fox!", "", "  !!  ", "a b", "héllo wörld 123",
             "x" * 5000 + " yy", "a!a!a", "ONE two THREE"]
    h, offs = tokenize_hashes(pa.array(texts))
    toks = [_WORD.findall(t.lower()) for t in texts]
    assert [len(t) for t in toks] == list(offs[1:] - offs[:-1])
    # same token <-> same hash (and no collisions on this vocabulary)
    flat = [t for ts in toks for t in ts]
    by_tok = {}
    for t, hv in zip(flat, h):
        assert by_tok.setdefault(t, hv) == hv
    assert len(set(by_tok.values())) == len(by_tok)


def test_hash_string_array_slice_invariant():
    from noise_ray.ops.hashing import hash_string_array

    arr = pa.array(["abc", "de", "", "fgh", "abc"])
    full = hash_string_array(arr)
    sliced = hash_string_array(arr.slice(1, 3))
    assert (full[1:4] == sliced).all()
    assert full[0] == full[4]


def _true_jaccard_pairs(threshold: float) -> set:
    from noise_ray.ops.dedup import _shingles

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ids = t.column("doc_id").to_numpy()
    sh = [_shingles(x) for x in t.column("text").to_pylist()]
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = sh[i], sh[j]
            if not a and not b:
                continue
            u = len(a | b)
            if u and len(a & b) / u >= threshold:
                out.add((int(ids[i]), int(ids[j])))
    return out


def test_minhash_lsh_pairs_quality(ray_session):
    from noise_ray.ops import dedup

    got = dedup.minhash_lsh_pairs(SF).to_pandas()
    pairs = set(zip(got.a_id.astype(int), got.b_id.astype(int)))
    # fixture near-dups are all J >= 0.89: banding must find every one
    hi = _true_jaccard_pairs(0.7)
    assert hi <= pairs, f"missed true near-dups: {hi - pairs}"
    # and candidate banding should not hallucinate dissimilar pairs
    lo = _true_jaccard_pairs(0.3)
    assert pairs <= lo, f"false positives below J=0.3: {pairs - lo}"
    # output is a distinct, sorted pair set
    assert len(pairs) == len(got)
    assert got.sort_values(["a_id", "b_id"]).reset_index(drop=True).equals(
        got.reset_index(drop=True))


def test_simhash_pairs_quality(ray_session):
    from noise_ray.ops import dedup

    got = dedup.simhash_pairs(SF).to_pandas()
    pairs = set(zip(got.a_id.astype(int), got.b_id.astype(int)))
    assert len(pairs) == len(got)
    # the 4-quarter banding is EXACT for hamming <= 3 (pigeonhole): the
    # output must equal the brute-force hamming pair set, both directions
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    sigs, counts = dedup._simhash_sigs(t.column("text"))
    ids = t.column("doc_id").to_numpy()
    keep = counts > 0  # empty docs carry no signal and are skipped
    ids, sigs = ids[keep], sigs[keep]
    want = set()
    for i in range(len(ids)):
        x = sigs[i] ^ sigs[i + 1 :]
        if x.size == 0:
            continue
        for j in np.flatnonzero(
                np.unpackbits(x.view(np.uint8)).reshape(x.size, -1)
                .sum(axis=1) <= 3):
            a, b = int(ids[i]), int(ids[i + 1 + j])
            want.add((min(a, b), max(a, b)))
    assert pairs == want


def test_simhash_sig_batch_invariance():
    """Signatures don't depend on batch boundaries."""
    from noise_ray.ops.dedup import _simhash_sigs

    t = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    whole, _ = _simhash_sigs(t.column("text"))
    parts = [
        _simhash_sigs(t.column("text").slice(i, 100))[0]
        for i in range(0, t.num_rows, 100)
    ]
    assert (whole == np.concatenate(parts)).all()


def test_embedding_dup_pairs_bucketed(ray_session):
    """Bucketed path: exact precision (in-bucket cosine verify), full
    recall on the fixture pairs with the default 48 tables."""
    from noise_ray.ops import dedup

    brute = dedup.embedding_dup_pairs(SF)
    want = set(zip(brute.column("a_id").to_pylist(),
                   brute.column("b_id").to_pylist()))
    got = dedup.embedding_dup_pairs_bucketed(SF).to_pandas()
    pairs = set(zip(got.a_id.astype(int), got.b_id.astype(int)))
    assert pairs <= want          # never a sub-threshold pair
    assert len(want & pairs) / max(len(want), 1) >= 0.9, (want, pairs)


def test_bucket_index_pairs_star_cap():
    from noise_ray.ops.dedup import _MAX_BUCKET, _bucket_index_pairs

    ii, jj = _bucket_index_pairs(4)
    assert list(zip(ii, jj)) == [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3),
                                 (2, 3)]
    n = _MAX_BUCKET + 5
    ii, jj = _bucket_index_pairs(n)
    # degenerate bucket: linear star pairs, still one connected component
    assert ii.size == n - 1 and (ii == 0).all()
    assert (jj == np.arange(1, n)).all()


def test_winnow_fingerprints_matches_oracle(ray_session):
    """Winnowing minima equal the SQL window-MIN recomputation over the
    shared shingle hashes, and the guarantee holds: every doc with >=
    window shingles emits at least one fingerprint."""
    import duckdb
    import pyarrow.parquet as pq

    from noise_ray.ops.oracle_sqlgen import winnow_fingerprints_sql
    from noise_ray.ops.text import winnow_fingerprints

    sf = "/root/testdata/sf0.001"
    got = (winnow_fingerprints(sf).to_pandas()
           .sort_values(["doc_id", "fp"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * "
                f"FROM read_parquet('{sf}/documents.parquet')")
    want = con.execute(winnow_fingerprints_sql()).fetchdf()
    assert len(got) == len(want)
    assert (got["doc_id"].to_numpy() == want["doc_id"].to_numpy()).all()
    assert (got["fp"].to_numpy().astype("uint64")
            == want["fp"].to_numpy().astype("uint64")).all()
    n_docs = pq.read_metadata(f"{sf}/documents.parquet").num_rows
    assert got["doc_id"].nunique() == n_docs  # every doc has text here


def test_winnow_shared_fingerprint_for_common_window(ray_session):
    """Two docs sharing a long-enough token run share >= 1 fingerprint
    (the winnowing guarantee for matches of length >= window + 2)."""
    import numpy as np
    import pyarrow as pa

    from noise_ray.ops.dedup import _shingle_hashes

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    texts = pa.array([f"one two {shared} three",
                      f"four {shared} five six"])
    sh, offs = _shingle_hashes(texts)
    window = 4
    fps = []
    for d in range(2):
        s = sh[offs[d]:offs[d + 1]]
        m = {min(s[i - window + 1:i + 1]) for i in range(window - 1,
                                                         s.size)}
        fps.append(m)
    assert fps[0] & fps[1]


def test_winnow_dup_pairs_matches_oracle(ray_session):
    import duckdb

    from noise_ray.ops.oracle_sqlgen import winnow_dup_pairs_sql
    from noise_ray.ops.text import winnow_dup_pairs

    sf = "/root/testdata/sf0.001"
    got = winnow_dup_pairs(sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * "
                f"FROM read_parquet('{sf}/documents.parquet')")
    want = con.execute(winnow_dup_pairs_sql()).fetchdf()
    assert len(got) > 0
    assert got.astype(want.dtypes.to_dict()).equals(want)


def test_winnow_dup_pairs_streams(ray_session):
    """Scale contract: the pre-filter candidate-pair table never
    reaches the driver — the op returns a lazy Dataset and its body
    contains no driver-side collect."""
    import inspect

    import ray.data

    from noise_ray.ops import text

    ds = text.winnow_dup_pairs("/root/testdata/sf0.001")
    assert isinstance(ds, ray.data.Dataset)
    src = inspect.getsource(text.winnow_dup_pairs)
    assert "to_pandas" not in src and "take_all" not in src


def test_duplicate_spans_matches_bruteforce(ray_session):
    """Span merge vs a pure-python recomputation on the raw corpus:
    windows shared across >=2 docs, covered intervals unioned."""
    import re

    import pyarrow.parquet as pq

    from noise_ray.ops.dedup import duplicate_spans

    sf = "/root/testdata/sf0.001"
    L = 12
    t = pq.read_table(f"{sf}/documents.parquet",
                      columns=["doc_id", "text"])
    toks = {d: re.findall(r"[a-z0-9]+", s.lower())
            for d, s in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist())}
    owners = {}
    for d, tk in toks.items():
        for i in range(len(tk) - L + 1):
            owners.setdefault(" ".join(tk[i:i + L]), set()).add(d)
    want = []
    for d, tk in sorted(toks.items()):
        starts = [i for i in range(len(tk) - L + 1)
                  if len(owners[" ".join(tk[i:i + L])]) >= 2]
        run = []
        for s in starts:
            if run and s <= run[-1][-1] + L:
                run[-1].append(s)
            else:
                run.append([s])
        for r in run:
            want.append((d, r[0], r[-1] + L - 1, len(r)))
    got = duplicate_spans(sf).to_pandas()
    assert list(map(tuple, got.itertuples(index=False))) == want
    assert len(want) > 0


def test_remove_duplicate_spans_consistency(ray_session):
    """Removal agrees with the spans op: per-doc removed-token count ==
    covered interval length sum; surviving text contains no window that
    still duplicates across docs at the original positions."""
    from noise_ray.ops.dedup import duplicate_spans, remove_duplicate_spans

    sf = "/root/testdata/sf0.001"
    spans = duplicate_spans(sf).to_pandas()
    cleaned = remove_duplicate_spans(sf).to_pandas()
    want = spans.assign(n=spans.end_tok - spans.start_tok + 1) \
        .groupby("doc_id")["n"].sum()
    got = cleaned.set_index("doc_id")["n_removed"]
    for d, n in want.items():
        assert got[d] == n, d
    assert (got.drop(want.index).to_numpy() == 0).all()
    assert (cleaned.n_removed > 0).any()


from hypothesis import given, settings
from hypothesis import strategies as st

_words = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps",
                          "zeta", "eta", "theta"])


@settings(max_examples=25, deadline=None)
@given(st.lists(st.lists(_words, min_size=0, max_size=40),
                min_size=2, max_size=8),
       st.integers(min_value=2, max_value=5))
def test_duplicate_spans_property(ray_session, tmp_path_factory, docs,
                                  window):
    """Random small corpora: engine spans == brute-force recomputation
    (shared windows across >=2 docs, covered intervals unioned)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from noise_ray.ops.dedup import duplicate_spans

    sf = str(tmp_path_factory.mktemp("spans"))
    texts = [" ".join(d) for d in docs]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), f"{sf}/documents.parquet")

    L = window
    owners = {}
    for d, tk in enumerate(docs):
        for i in range(len(tk) - L + 1):
            owners.setdefault(tuple(tk[i:i + L]), set()).add(d)
    want = []
    for d, tk in enumerate(docs):
        starts = [i for i in range(len(tk) - L + 1)
                  if len(owners[tuple(tk[i:i + L])]) >= 2]
        run = []
        for s in starts:
            if run and s <= run[-1][-1] + L:
                run[-1].append(s)
            else:
                run.append([s])
        for r in run:
            want.append((d, r[0], r[-1] + L - 1, len(r)))
    got = duplicate_spans(sf, window=L).to_pandas()
    assert list(map(tuple, got.itertuples(index=False))) == want


def test_window_and_shingle_hashes_tiny_batches():
    """Regression (hypothesis-found): a batch whose TOTAL token count is
    below the window/shingle width must yield zero hashes, not a
    wrapped negative slice."""
    import pyarrow as pa

    from noise_ray.ops.dedup import _shingle_hashes, _window_hashes

    for texts in (["theta gamma delta"], ["a"], [""], ["x y", ""]):
        wh, offs = _window_hashes(pa.array(texts), 5)
        assert wh.size == 0 and offs[-1] == 0
    sh, offs = _shingle_hashes(pa.array(["ab"]), 3)
    assert sh.size == 1  # short-doc fallback: one shingle over all toks
    sh, offs = _shingle_hashes(pa.array([""]), 3)
    assert sh.size == 0


@settings(max_examples=15, deadline=None)
@given(st.lists(st.lists(_words, min_size=0, max_size=30),
                min_size=2, max_size=6),
       st.integers(min_value=2, max_value=4))
def test_remove_duplicate_spans_property(ray_session, tmp_path_factory,
                                         docs, window):
    """Random corpora: cleaned text == tokens outside the brute-force
    span union, joined by single spaces."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from noise_ray.ops.dedup import remove_duplicate_spans

    sf = str(tmp_path_factory.mktemp("rm"))
    texts = [" ".join(d) for d in docs]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), f"{sf}/documents.parquet")

    L = window
    owners = {}
    for d, tk in enumerate(docs):
        for i in range(len(tk) - L + 1):
            owners.setdefault(tuple(tk[i:i + L]), set()).add(d)
    want = []
    for d, tk in enumerate(docs):
        covered = [False] * len(tk)
        for i in range(len(tk) - L + 1):
            if len(owners[tuple(tk[i:i + L])]) >= 2:
                for j in range(i, i + L):
                    covered[j] = True
        want.append((" ".join(t for t, c in zip(tk, covered) if not c),
                     sum(covered)))
    got = remove_duplicate_spans(sf, window=L).to_pandas()
    assert [(r.clean_text, r.n_removed)
            for r in got.itertuples(index=False)] == want


def test_remove_duplicate_spans_partitioned_path(ray_session):
    """broadcast_limit=0 forces the doc_id-range-partitioned span
    sidecar (the above-limit scale path): results must be bit-identical
    to the broadcast path, and no left-outer corpus join appears in the
    plan (the round-4 fallback this replaced)."""
    import pandas as pd

    from noise_ray.ops.dedup import remove_duplicate_spans

    sf = "/root/testdata/sf0.001"
    a = remove_duplicate_spans(sf).to_pandas().reset_index(drop=True)
    ds = remove_duplicate_spans(sf, broadcast_limit=0)
    assert "Join" not in str(ds._logical_plan.dag)
    b = ds.to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_clean_batch_vectorized_edge_cases():
    """The batch-wide cleaning kernel on the shapes the per-doc loop
    handled implicitly: empty batch, empty/whitespace-only docs, docs
    with no spans mixed with fully-covered docs, uppercase+punctuation
    normalization."""
    import pyarrow as pa

    from noise_ray.ops.dedup import _clean_batch

    out = _clean_batch(pa.table({"doc_id": pa.array([], pa.int64()),
                                 "text": pa.array([], pa.string())}),
                       lambda i, d: None)
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "clean_text", "n_removed"]

    batch = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": pa.array(["", "  ...  ", "Alpha, BETA gamma!",
                          "one two three four", "keep me safe"],
                         pa.string()),
    })
    spans = {2: "0:1", 3: "0:3"}
    out = _clean_batch(batch, lambda i, did: spans.get(did)).to_pylist()
    assert [(r["clean_text"], r["n_removed"]) for r in out] == [
        ("", 0), ("", 0), ("gamma", 2), ("", 4), ("keep me safe", 0)]
