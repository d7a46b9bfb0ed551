"""Term dictionary (build/dictionary.py) and the dictionary-expanded
search surfaces (ops/termdict.py): prefix, fuzzy, did-you-mean."""

import re

import duckdb
import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _con(sf):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * "
        f"FROM read_parquet('{sf}/documents.parquet')")
    return con


def _norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


# ------------------------------------------------------------ raw_grouped

def test_raw_grouped_groups_and_stems():
    from noise_ray.analysis.tokenizer import raw_grouped, tokenize

    text = "Merge the tables; merge the queries"
    raws, stems, counts = raw_grouped(text)
    # first-occurrence order, counts grouped by RAW form
    assert raws == ["merge", "the", "tables", "queries"]
    assert counts == [2, 2, 1, 1]
    assert stems == ["merg", "the", "tabl", "queri"]
    # stems agree with the index tokenizer
    assert set(stems) == {t for _, t in tokenize(text)}


def test_raw_grouped_fallback_matches_index_term():
    from noise_ray.analysis.tokenizer import raw_grouped, tokenize

    for text in ("123 456", "", "!!!"):
        raws, stems, counts = raw_grouped(text)
        assert raws == stems and counts == [1]
        assert stems[0] == tokenize(text)[0][1]


def test_documents_raw_forms_equal_regex_tokens():
    """Oracle premise: the engine's RAW surface forms are exactly the
    [a-z0-9]+ tokens of the lowercased text, doc by doc (the stem-level
    analogue is asserted in test_score_oracle.py)."""
    from noise_ray.analysis.tokenizer import raw_grouped

    t = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    for s in t.column("text").to_pylist():
        raws, _, counts = raw_grouped(s)
        from collections import Counter

        assert Counter(dict(zip(raws, counts))) == Counter(
            re.findall(r"[a-z0-9]+", s.lower()))


# ------------------------------------------------------------ levenshtein

def _lev_ref(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                     prev + (ca != cb))
    return dp[len(b)]


def test_levenshtein_batch_matches_reference_and_duckdb():
    from noise_ray.build.dictionary import levenshtein_batch

    rng = np.random.default_rng(7)
    alpha = "abcd"
    words = ["".join(rng.choice(list(alpha), size=rng.integers(0, 8)))
             for _ in range(200)] + ["", "a", "abcdabcd"]
    for q in ["", "b", "sart", "abca", "dcba"]:
        got = levenshtein_batch(words, q)
        exp = [_lev_ref(q, w) for w in words]
        assert got.tolist() == exp
    con = duckdb.connect()
    for q in ["sart", "qery"]:
        for w in ["sort", "part", "query", "key", "the", ""]:
            if w == "" or q == "":
                continue  # duckdb errors on empty-string levenshtein args
            d = con.execute(
                f"SELECT levenshtein('{w}', '{q}')").fetchone()[0]
            assert levenshtein_batch([w], q)[0] == d


# ------------------------------------------------------- dictionary build

def test_dictionary_stats_match_sql(ray_session):
    from noise_ray.ops.termdict import _reader_and_dict

    reader, ddir = _reader_and_dict(SF)
    t = pq.read_table(ddir).to_pandas()
    text_fid = reader.field_id["text"]
    mine = t[t["field"] == text_fid].sort_values("token").reset_index(
        drop=True)
    sql = _con(SF).execute("""
        WITH toks AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
          FROM documents)
        SELECT tok AS token, count(DISTINCT doc_id) AS df, count(*) AS cf
        FROM toks GROUP BY tok ORDER BY tok""").fetchdf()
    assert mine["token"].tolist() == sql["token"].tolist()
    assert mine["df"].tolist() == sql["df"].tolist()
    assert mine["cf"].tolist() == sql["cf"].tolist()
    # stems equal the index's terms for these tokens
    from noise_ray.analysis.porter2 import stem

    assert mine["stem"].tolist() == [stem(w) for w in mine["token"]]
    # global (field, token) sort order held across files -> prunable reads
    pairs = list(zip(t["field"], t["token"]))
    assert pairs == sorted(pairs)


def test_prefix_and_fuzzy_expansion(ray_session):
    from noise_ray.build.dictionary import fuzzy_terms, prefix_terms
    from noise_ray.ops.termdict import _reader_and_dict

    reader, ddir = _reader_and_dict(SF)
    fid = reader.field_id["text"]
    toks = prefix_terms(ddir, fid, "s").column("token").to_pylist()
    assert toks == ["scan", "slow", "small", "sort", "spark", "stream"]
    assert prefix_terms(ddir, fid, "zz").num_rows == 0
    f = fuzzy_terms(ddir, fid, "sart", 1)
    assert f.column("token").to_pylist() == ["part", "sort"]
    assert f.column("dist").to_pylist() == [1, 1]


def test_regex_expansion(ray_session):
    from noise_ray.build.dictionary import regex_terms
    from noise_ray.ops.termdict import _reader_and_dict

    reader, ddir = _reader_and_dict(SF)
    fid = reader.field_id["text"]
    t = regex_terms(ddir, fid, "[a-z]{3}")
    assert t.column("token").to_pylist() == [
        "agg", "big", "dup", "key", "row", "the"]
    assert regex_terms(ddir, fid, "zz+").num_rows == 0


# --------------------------------------------------- end-to-end vs oracle

@pytest.mark.parametrize(
    "name", ["search_prefix", "search_fuzzy", "search_regex",
             "did_you_mean", "search_facets"])
def test_termdict_ops_match_oracle(ray_session, name):
    import __ray_entry__ as entry

    r = entry.queries()[name](SF).to_pandas()
    o = _con(SF).execute(entry.oracle_sql()[name]).fetchdf()
    rn, on = _norm(r), _norm(o)
    assert list(rn.columns) == list(on.columns)
    assert len(rn) > 0
    assert rn.astype(on.dtypes.to_dict()).equals(on)


def test_fuzzy_zero_matches_is_empty(ray_session):
    from noise_ray.ops.termdict import search_fuzzy

    t = search_fuzzy(SF, word="zzzzzzzz", max_dist=1)
    assert t.num_rows == 0 and t.column_names == ["doc_id", "score"]


def test_suggest_complete_df_weighted(ray_session):
    """Top-n prefix completions ordered by (df desc, token asc), df =
    docs containing the raw token."""
    import collections
    import re

    import pyarrow.parquet as pq

    from noise_ray.ops.termdict import suggest_complete

    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"])
    df = collections.Counter()
    for s in t.column("text").to_pylist():
        for tok in set(re.findall(r"[a-z0-9]+", s.lower())):
            if tok.startswith("s"):
                df[tok] += 1
    want = sorted(df.items(), key=lambda p: (-p[1], p[0]))[:10]

    got = suggest_complete(SF, "s", 10)
    rows = list(zip(got.column("token").to_pylist(),
                    got.column("df").to_pylist()))
    assert rows == want
