"""The generated DuckDB oracles (noise_ray/ops/oracle_sqlgen.py) must
reproduce the Python LSH/langid operators EXACTLY — same token hashes,
same signatures, same pair sets — on the sf0.001 fixture.  This is the
local counterpart of the driver's oracle gate for the formerly rows-only
entries."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    return c


def _pairs(df):
    return set(zip(df["a_id"], df["b_id"]))


def test_simhash_sql_exact(ray_session, con):
    from noise_ray.ops import dedup, oracle_sqlgen

    mine = dedup.simhash_pairs(SF).to_pandas()
    want = con.sql(oracle_sqlgen.simhash_pairs_sql()).df()
    assert _pairs(mine) == _pairs(want)
    assert len(mine) == len(want)


def test_minhash_sql_exact(ray_session, con):
    from noise_ray.ops import dedup, oracle_sqlgen

    mine = dedup.minhash_lsh_pairs(SF).to_pandas()
    want = con.sql(oracle_sqlgen.minhash_lsh_pairs_sql()).df()
    assert _pairs(mine) == _pairs(want)
    assert len(mine) == len(want)


def test_langid_sql_exact(ray_session, con):
    from noise_ray.ops import oracle_sqlgen, text

    mine = (text.langid(SF).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    want = (con.sql(oracle_sqlgen.langid_sql()).df()
            .sort_values("doc_id").reset_index(drop=True))
    assert (mine["doc_id"].values == want["doc_id"].values).all()
    assert (mine["pred_lang"].values == want["pred_lang"].values).all()


def test_no_degenerate_buckets_on_fixture(ray_session):
    """The SQL oracle does plain all-pairs per bucket; the Python path
    switches to hub-round peeling only above _MAX_BUCKET members.  Assert
    the fixture never reaches that regime, so the two are comparable."""
    import pyarrow.parquet as pq

    from noise_ray.ops import dedup

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    sizes = (
        __import__("ray").data.from_arrow(t)
        .map_batches(dedup._MinHashBatch, batch_format="pyarrow",
                     fn_constructor_kwargs={"num_hashes": 64, "bands": 16},
                     concurrency=1)
        .groupby(["band", "key"]).count()
        .to_pandas()["count()"].max()
    )
    assert sizes < dedup._MAX_BUCKET


def test_bucketed_embedding_pairs_equal_brute(ray_session):
    """The oracle for embedding_dup_pairs_bucketed is the brute-force SQL:
    valid because the 48-table verified-LSH pair set EQUALS brute force on
    the fixtures (precision 1.0 by construction, recall 1.0 measured)."""
    from noise_ray.ops import dedup

    brute = dedup.embedding_dup_pairs(SF)
    buck = dedup.embedding_dup_pairs_bucketed(SF).to_pandas()
    bset = set(zip(brute.column("a_id").to_pylist(),
                   brute.column("b_id").to_pylist()))
    assert _pairs(buck) == bset
