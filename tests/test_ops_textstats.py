"""Text-statistics operators (BPE pair counts, Gopher quality rules,
tf-idf keywords, vocabulary growth): semantics pinned against plain-Python
references on the sf0.001 fixture — the oracle gate re-checks them against
DuckDB SQL."""

import collections
import re

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
_WORD = re.compile(r"[a-z0-9]+")


def _docs(columns):
    return pq.read_table(f"{SF}/documents.parquet", columns=columns)


def test_bpe_pair_counts_matches_counter(ray_session):
    from noise_ray.ops.text import bpe_pair_counts

    counts = collections.Counter()
    for txt in _docs(["text"]).column("text").to_pylist():
        for tok in _WORD.findall(txt.lower()):
            counts.update(tok[i:i + 2] for i in range(len(tok) - 1))
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [(r["pair"], r["n"]) for r in bpe_pair_counts(SF).take_all()]
    assert got == want


def test_quality_filter_gopher_matches_reference(ray_session):
    from noise_ray.ops.text import _GOPHER_STOPWORDS, quality_filter_gopher

    t = _docs(["doc_id", "text"])
    want = {}
    for did, txt in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
        toks = _WORD.findall(txt.lower())
        nt = len(toks)
        nc = sum(len(w) for w in toks)
        na = sum(1 for w in toks if any(c.isalpha() for c in w))
        ns = sum(1 for w in toks if w in _GOPHER_STOPWORDS)
        keep = int(5 <= nt <= 10000 and 2 * nt <= nc <= 12 * nt
                   and 10 * na >= 7 * nt and ns >= 2)
        want[did] = (nt, nc, na, ns, keep)
    out = quality_filter_gopher(SF).take_all()
    assert len(out) == len(want)
    for r in out:
        assert want[r["doc_id"]] == (r["n_tokens"], r["n_tok_chars"],
                                     r["n_alpha"], r["n_stop"], r["keep"])
    assert 0 < sum(v[4] for v in want.values()) < len(want)  # both outcomes


def test_tfidf_keywords_matches_reference(ray_session):
    from noise_ray.ops.text import tfidf_keywords

    t = _docs(["doc_id", "text"])
    df = collections.Counter()
    tfs = {}
    for did, txt in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
        tf = collections.Counter(_WORD.findall(txt.lower()))
        tfs[did] = tf
        df.update(tf.keys())
    want = []
    for did in sorted(tfs):
        ranked = sorted(tfs[did].items(),
                        key=lambda kv: (-(kv[1] / df[kv[0]]), kv[0]))[:5]
        for i, (term, tf) in enumerate(ranked):
            want.append((did, i + 1, term, tf, df[term]))
    got = [(r["doc_id"], r["rank"], r["term"], r["tf"], r["df"])
           for r in tfidf_keywords(SF).take_all()]
    assert got == want


def test_vocab_growth_matches_reference(ray_session):
    from noise_ray.ops.text import vocab_growth

    t = _docs(["source", "text"])
    per_src = collections.defaultdict(collections.Counter)
    for src, txt in zip(t.column("source").to_pylist(),
                        t.column("text").to_pylist()):
        per_src[src].update(_WORD.findall(txt.lower()))
    want = [(s, sum(c.values()), len(c),
             sum(1 for n in c.values() if n == 1))
            for s, c in sorted(per_src.items())]
    got = [(r["source"], r["n_tokens"], r["n_terms"], r["n_hapax"])
           for r in vocab_growth(SF).take_all()]
    assert got == want


def test_quality_filter_c4_matches_reference(ray_session):
    from noise_ray.ops.text import quality_filter_c4

    t = _docs(["doc_id", "text"])
    want = {}
    for did, txt in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
        ns = sum(txt.count(c) for c in ".!?")
        hb = int("{" in txt)
        hl = int("lorem ipsum" in txt.lower())
        ep = int(bool(re.search(r'[.!?"][ \t\r\n]*$', txt)))
        keep = int(ns >= 3 and not hb and not hl and ep)
        want[did] = (ns, hb, hl, ep, keep)
    out = quality_filter_c4(SF).take_all()
    assert len(out) == len(want)
    for r in out:
        assert want[r["doc_id"]] == (r["n_sentences"], r["has_brace"],
                                     r["has_lorem"], r["ends_punct"],
                                     r["keep"])


def test_surprising_bigrams_matches_reference(ray_session):
    from noise_ray.ops.text import surprising_bigrams

    t = _docs(["doc_id", "text"])
    bc = collections.Counter()
    per_doc = {}
    for did, txt in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
        toks = _WORD.findall(txt.lower())
        bgs = list(zip(toks, toks[1:]))
        per_doc[did] = set(bgs)
        bc.update(bgs)
    cp = collections.Counter()
    for (w1, _), n in bc.items():
        cp[w1] += n
    want = []
    for did in sorted(per_doc):
        ranked = sorted(per_doc[did],
                        key=lambda b: (bc[b] / cp[b[0]], f"{b[0]} {b[1]}"))
        for i, b in enumerate(ranked[:3]):
            want.append((did, i + 1, f"{b[0]} {b[1]}", bc[b], cp[b[0]]))
    got = [(r["doc_id"], r["rank"], r["bigram"], r["c_bigram"], r["c_prefix"])
           for r in surprising_bigrams(SF).take_all()]
    assert got == want


def test_sliding_window_stats_matches_reference(ray_session):
    import pyarrow.parquet as pq

    from noise_ray.ops.relational import sliding_window_stats

    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["event_id", "ts", "user_id", "value"])
    import math
    rows = list(zip(t.column("event_id").to_pylist(),
                    t.column("ts").to_pylist(),
                    t.column("user_id").to_pylist(),
                    t.column("value").to_pylist()))
    want = {}
    by_user = collections.defaultdict(list)
    for ev, ts, uid, val in rows:
        by_user[uid].append((ts, ev, int(math.floor(val * 100 + 0.5))))
    for uid, evs in by_user.items():
        for ts, ev, _ in evs:
            in_win = [(c,) for t2, _, c in evs
                      if ts - t2 <= __import__("datetime").timedelta(hours=1)
                      and t2 <= ts]
            want[ev] = (len(in_win), sum(c for (c,) in in_win))
    out = sliding_window_stats(SF).take_all()
    assert len(out) == len(want)
    for r in out:
        assert want[r["event_id"]] == (r["n_window"], r["sum_cents_window"])
    assert any(r["n_window"] > 1 for r in out)  # windows really overlap


def test_kmv_distinct_matches_reference(ray_session):
    from noise_ray.ops.hashing import hash_string_array
    from noise_ray.ops.text import kmv_distinct

    import pyarrow as pa

    t = _docs(["source", "text"])
    per_src = collections.defaultdict(set)
    for src, txt in zip(t.column("source").to_pylist(),
                        t.column("text").to_pylist()):
        per_src[src].update(_WORD.findall(txt.lower()))
    want = []
    k = 16
    for src in sorted(per_src):
        hs = sorted(hash_string_array(
            pa.array(sorted(per_src[src]), pa.string())).tolist())[:k]
        est = ((k - 1) / (hs[-1] / float(2**64)) if len(hs) == k
               else float(len(hs)))
        import numpy as np
        for i, h in enumerate(hs):
            want.append((src, i + 1, int(np.uint64(h).astype(np.int64)),
                         est))
    got = [(r["source"], r["rank"], r["h"], r["est_distinct"])
           for r in kmv_distinct(SF).take_all()]
    assert got == want
    # the estimate should land near the true distinct count
    for src in per_src:
        true = len(per_src[src])
        est = dict((s, e) for s, _, _, e in got)[src]
        assert 0.3 * true <= est <= 3 * true


def test_hopping_window_stats_matches_reference(ray_session):
    import datetime
    import math

    import pyarrow.parquet as pq

    from noise_ray.ops.relational import hopping_window_stats

    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["ts", "event_type", "value"])
    want = collections.defaultdict(lambda: [0, 0])
    hop = datetime.timedelta(seconds=900)
    epoch = datetime.datetime(1970, 1, 1)
    for ts, et, val in zip(t.column("ts").to_pylist(),
                           t.column("event_type").to_pylist(),
                           t.column("value").to_pylist()):
        cents = int(math.floor(val * 100 + 0.5))
        last = epoch + ((ts - epoch) // hop) * hop
        for i in range(4):
            w = want[(last - i * hop, et)]
            w[0] += 1
            w[1] += cents
    out = hopping_window_stats(SF).take_all()
    assert len(out) == len(want)
    for r in out:
        k = (r["window_start"], r["event_type"])
        assert want[k] == [r["n_events"], r["sum_cents"]]
    # overlapping windows: total exploded rows = 4x events
    assert sum(r["n_events"] for r in out) == 4 * t.num_rows


def test_chunk_documents_windows(ray_session):
    """64/48 token windows: starts at multiples of 48, stop once the
    previous window reached the doc end; chunk text is the joined
    lowercase tokens; short docs yield exactly one chunk."""
    import re

    import pyarrow.parquet as pq

    from noise_ray.ops.text import chunk_documents

    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"])
    want = []
    for d, s in zip(t.column("doc_id").to_pylist(),
                    t.column("text").to_pylist()):
        toks = re.findall(r"[a-z0-9]+", s.lower())
        n = len(toks)
        for ci, start in enumerate(range(0, n, 48)):
            if start and start + 64 - 48 >= n:
                break
            ck = toks[start:start + 64]
            want.append((d, ci, " ".join(ck), len(ck)))
    got = chunk_documents(SF).take_all()
    rows = sorted((r["doc_id"], r["chunk_idx"], r["chunk_text"],
                   r["n_tokens"]) for r in got)
    assert rows == sorted(want)
    # overlap property: consecutive chunks share their boundary tokens
    by_doc = {}
    for d, ci, text, nt in rows:
        by_doc.setdefault(d, []).append((ci, text.split()))
    multi = 0
    for chunks in by_doc.values():
        for (_, a), (_, b) in zip(chunks, chunks[1:]):
            assert a[48:] == b[:len(a) - 48]
            multi += 1
    assert multi > 0


def test_did_you_mean_phrase_matches_oracle(ray_session):
    import duckdb

    from noise_ray.ops.score_oracle import did_you_mean_phrase_sql
    from noise_ray.ops.termdict import did_you_mean_phrase

    sf = "/root/testdata/sf0.001"
    got = did_you_mean_phrase(sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * "
                f"FROM read_parquet('{sf}/documents.parquet')")
    want = con.execute(did_you_mean_phrase_sql(("mrge", "scn"))).fetchdf()
    assert len(got) >= 1
    assert got["phrase"].iloc[0] == "merge scan"
    assert got.astype(want.dtypes.to_dict()).equals(want)


def test_lm_perplexity_matches_reference(ray_session):
    import math

    from noise_ray.ops.text import lm_perplexity

    t = _docs(["doc_id", "text"])
    bc = collections.Counter()
    per_doc = {}
    for did, txt in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
        toks = _WORD.findall(txt.lower())
        per_doc[did] = list(zip(toks, toks[1:]))
        bc.update(per_doc[did])
    cp = collections.Counter()
    for (w1, _), n in bc.items():
        cp[w1] += n
    want = []
    for did in sorted(per_doc):
        bgs = per_doc[did]
        if not bgs:
            continue
        tot = 0.0
        for b in bgs:  # document bigram order, like the op's reduceat
            tot += math.log2(cp[b[0]]) - math.log2(bc[b])
        bits = round(tot / len(bgs), 4)
        want.append((did, len(bgs), bits, int(bits <= 4.885)))
    got = [(r["doc_id"], r["n_bigrams"], r["bits"], r["keep"])
           for r in lm_perplexity(SF).take_all()]
    assert got == want
    # the threshold splits the corpus (filter is non-degenerate)
    keeps = {k for _, _, _, k in got}
    assert keeps == {0, 1}


def test_dsir_select_matches_reference(ray_session):
    import math

    from noise_ray.ops.hashing import _B2, hash_string_array, splitmix64
    from noise_ray.ops.text import dsir_select

    t = _docs(["doc_id", "text", "source"])
    B = 256

    def feats(txt):
        toks = _WORD.findall(txt.lower())
        import numpy as np
        h = hash_string_array(__import__("pyarrow").array(toks))
        out = [int(x % np.uint64(B)) for x in h]  # uint64 % int -> f64!
        import numpy as np
        for a, b in zip(h, h[1:]):
            with np.errstate(over="ignore"):
                out.append(int(splitmix64(
                    np.uint64(a) * _B2 + np.uint64(b)) % np.uint64(B)))
        return out

    per_doc = {}
    tgt = collections.Counter()
    raw = collections.Counter()
    for did, txt, src in zip(t.column("doc_id").to_pylist(),
                             t.column("text").to_pylist(),
                             t.column("source").to_pylist()):
        f = feats(txt)
        per_doc[did] = f
        raw.update(f)
        if src == "src0":
            tgt.update(f)
    tt, rt = sum(tgt.values()), sum(raw.values())
    ratio = {b: math.log((tgt.get(b, 0) + 1.0) / (tt + float(B)))
             - math.log((raw.get(b, 0) + 1.0) / (rt + float(B)))
             for b in range(B)}
    want = []
    for did in sorted(per_doc):
        f = per_doc[did]
        if not f:
            continue
        import numpy as np
        logw = round(float(np.add.reduce(
            np.array([ratio[b] for b in f], np.float64))), 4)
        want.append((did, len(f), logw))
    want.sort(key=lambda r: (-r[2], r[0]))
    want = want[:50]

    gt = dsir_select(SF)
    got = list(zip(gt.column("doc_id").to_pylist(),
                   gt.column("n_feats").to_pylist(),
                   gt.column("logw").to_pylist()))
    assert got == want
    # target-source docs dominate the selection (the filter selects)
    srcs = dict(zip(t.column("doc_id").to_pylist(),
                    t.column("source").to_pylist()))
    n_tgt = sum(1 for d, _, _ in got if srcs[d] == "src0")
    base = 50 * sum(1 for s in srcs.values() if s == "src0") / len(srcs)
    assert n_tgt > 4 * base  # 5% base rate -> far overrepresented


def test_nb_classify_matches_reference(ray_session):
    import math

    from noise_ray.ops.text import nb_classify

    t = _docs(["doc_id", "text", "source"])
    docs = list(zip(t.column("doc_id").to_pylist(),
                    t.column("text").to_pylist(),
                    t.column("source").to_pylist()))
    toks = {d: _WORD.findall(txt.lower()) for d, txt, _ in docs}
    vocab = set()
    pc = collections.Counter()
    nc = collections.Counter()
    dp = dn = 0
    for d, _txt, src in docs:
        vocab.update(toks[d])
        if src == "src0":
            pc.update(toks[d])
            dp += 1
        elif src == "src1":
            nc.update(toks[d])
            dn += 1
    v = len(vocab)
    tp, tn = sum(pc.values()), sum(nc.values())
    prior = math.log(float(dp) / float(dn))
    want = []
    for d, _txt, _src in sorted(docs):
        import numpy as np
        terms = np.array([
            math.log((pc.get(w, 0) + 1.0) / (tp + float(v)))
            - math.log((nc.get(w, 0) + 1.0) / (tn + float(v)))
            for w in toks[d]], np.float64)
        lo = round(prior + (float(np.add.reduce(terms))
                            if terms.size else 0.0), 4)
        want.append((d, len(toks[d]), lo, int(lo > 0)))
    got = [(r["doc_id"], r["n_tokens"], r["logodds"], r["pred"])
           for r in nb_classify(SF).take_all()]
    assert got == want
    # both classes predicted somewhere (the classifier separates)
    assert {p for _, _, _, p in got} == {0, 1}
