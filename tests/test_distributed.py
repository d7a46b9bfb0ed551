"""Distributed (range-partitioned) query execution must be bit-identical
to local evaluation for every query shape — filters, scoring, ordering,
ties, aggregates, params."""

import pytest

from noise_ray.query import IndexReader, run_query, run_query_distributed


@pytest.fixture(scope="module")
def idx(small_transcripts):
    return small_transcripts["index"]


QUERIES = [
    'find {text: ~="fox"} order score() desc return score() limit 10 ;',
    'find {text: ~="the"} order score() desc return score() limit 25 ;',
    'find {text: ~="quick" || text: ~="brown" || text: ~="fox"} '
    "order score() desc return score() limit 15 ;",
    'find {text: ~="quick fox"} order score() desc return score() ;',
    'find {text: ~2="quick fox"} limit 40 ;',
    'find {role: =="assistant", text: ~="time"} limit 30 ;',
    'find {text: ~="work"} && !{role: =="system"} limit 50 ;',
    'find {turn_idx: >= 3, turn_idx: < 6} limit 100 ;',
    'find {text: ~="time"} order .conv_id desc, .turn_idx asc limit 20 ;',
    'find {role: =="user"} return {r: group(.role), n: count()} ;',
    'find {text: ~="the"} return {t: group(.tool), n: count(), '
    "mx: max(.turn_idx)} ;",
    # partial-aggregation path: every aggregate, incl. the reversed
    # accumulation order observable in array()/concat()
    'find {text: ~="the"} return {g: group(.role), n: count(), '
    "s: sum(.turn_idx), lo: min(.turn_idx), hi: max(.turn_idx)} ;",
    'find {role: =="user"} return {g: group(.tool), ids: array(.turn_idx), '
    'c: concat(.conv_id sep="|")} ;',
    'find {role: =="user"} return {g: group(.tool), '
    "f: array_flat(.turn_idx), mn: min_array(.turn_idx), "
    "mx: max_array(.turn_idx)} ;",
    'find {role: =="user"} return {g: group(.role order=desc), '
    "n: count()} limit 1 ;",
]


@pytest.mark.parametrize("parts", [1, 3, 7])
@pytest.mark.parametrize("q", QUERIES)
def test_distributed_identical(idx, q, parts):
    local = run_query(IndexReader(idx), q).to_pylist()
    dist = run_query_distributed(idx, q, num_partitions=parts).to_pylist()
    assert dist == local


def test_distributed_avg_reassociates_within_ulp(idx):
    """avg() merges per-range (mean, n) partials: float addition
    reassociates across ranges, so the distributed result may differ from
    the sequential incremental mean in the last ulp — and no more."""
    import math

    q = ('find {text: ~="the"} return {g: group(.role), '
         "m: avg(.turn_idx)} ;")
    local = run_query(IndexReader(idx), q).to_pylist()
    dist = run_query_distributed(idx, q, num_partitions=3).to_pylist()
    assert [r["g"] for r in dist] == [r["g"] for r in local]
    for a, b in zip(local, dist):
        assert math.isclose(a["m"], b["m"], rel_tol=1e-12)


def test_search_plan_switch_is_transparent(idx):
    """search() picks in-process vs distributed by index size; forcing the
    switch with a tiny threshold must not change any result."""
    from noise_ray.pipelines import search

    r = IndexReader(idx)
    for q in ['find {text: ~="fox"} order score() desc return score() '
              "limit 20 ;",
              'find {role: =="user"} return {r: group(.role), n: count()} ;']:
        local = search(r, q, distributed_threshold=10**12).to_pylist()
        dist = search(r, q, distributed_threshold=1).to_pylist()
        assert dist == local


def test_distributed_params(idx):
    q = 'find {role: ==@r} return {n: count()} ;'
    local = run_query(IndexReader(idx), q, {"r": "user"}).to_pylist()
    dist = run_query_distributed(idx, q, {"r": "user"},
                                 num_partitions=4).to_pylist()
    assert dist == local
