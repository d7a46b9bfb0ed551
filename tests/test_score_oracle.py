"""The scored queries' DuckDB oracles (ops/score_oracle.py) reproduce the
engine's TF-IDF scores exactly after 4dp rounding — plus the corpus
preconditions the SQL tokenization relies on."""

import re

import duckdb
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.01"


def _con(sf):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * "
        f"FROM read_parquet('{sf}/documents.parquet')")
    return con


def _norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_documents_vocab_is_regex_and_stem_safe():
    """The oracle tokenizes with lower() + [a-z0-9]+ and equates token and
    stem statistics; both hold corpus-wide for the documents table."""
    from noise_ray.analysis.porter2 import stem
    from noise_ray.analysis.tokenizer import tokenize

    t = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    stems_of = {}
    for s in t.column("text").to_pylist():
        engine_toks = [w for _, w in tokenize(s)]
        regex_toks = re.findall(r"[a-z0-9]+", s.lower())
        assert engine_toks == [stem(w) for w in regex_toks]
        for w in regex_toks:
            prev = stems_of.setdefault(stem(w), w)
            assert prev == w, f"stem collision: {prev} vs {w}"


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", SF])
@pytest.mark.parametrize(
    "name", ["search_term_topk", "search_phrase_topk"])
def test_scored_search_matches_oracle(ray_session, sf_dir, name):
    import __ray_entry__ as entry

    r = entry.queries()[name](sf_dir).to_pandas()
    o = _con(sf_dir).execute(entry.oracle_sql()[name]).fetchdf()
    rn, on = _norm(r), _norm(o)
    assert list(rn.columns) == list(on.columns)
    assert rn.astype(on.dtypes.to_dict()).equals(on)


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", SF])
def test_flagship_or_topk_matches_oracle(ray_session, sf_dir):
    """The flagship scored OR query (3-slot TF-IDF with fixture-strata
    corrections) hash-matches its generated DuckDB oracle."""
    import __ray_entry__ as entry
    from noise_ray.ops import score_oracle

    r = entry.queries()["flagship_or_topk"](sf_dir).to_pandas()
    sql = score_oracle.flagship_or_topk_sql(sf_dir=sf_dir)
    o = duckdb.connect().execute(sql).fetchdf()
    rn, on = _norm(r), _norm(o)
    assert list(rn.columns) == list(on.columns)
    assert rn.astype(on.dtypes.to_dict()).equals(on)


@pytest.mark.parametrize(
    "name", ["incremental_upsert", "lifecycle_compact"])
def test_lifecycle_matches_values_oracle(ray_session, name):
    import __ray_entry__ as entry

    r = entry.queries()[name](SF).to_pandas()
    o = duckdb.connect().execute(entry.oracle_sql()[name]).fetchdf()
    rn, on = _norm(r), _norm(o)
    assert list(rn.columns) == list(on.columns)
    assert rn.astype(on.dtypes.to_dict()).equals(on)
