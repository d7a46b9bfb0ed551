"""Relational operators with map-side combiners: semantics pinned
against plain-Python references on the sf0.001 fixture — the oracle
gate re-checks them against DuckDB SQL.  These exist so a combiner bug
cannot hide behind an oracle-runner change."""

import collections
import math

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_pricing_summary_matches_reference(ray_session):
    from noise_ray.ops.relational import pricing_summary

    t = pq.read_table(f"{SF}/lineitem.parquet",
                      columns=["l_returnflag", "l_linestatus",
                               "l_quantity", "l_extendedprice"])
    want = collections.defaultdict(lambda: [0, 0, 0])
    for rf, ls, q, p in zip(t.column("l_returnflag").to_pylist(),
                            t.column("l_linestatus").to_pylist(),
                            t.column("l_quantity").to_pylist(),
                            t.column("l_extendedprice").to_pylist()):
        w = want[(rf, ls)]
        w[0] += int(math.floor(q + 0.5))
        w[1] += int(math.floor(p * 100 + 0.5))
        w[2] += 1
    out = pricing_summary(SF).take_all()
    assert len(out) == len(want)
    for r in out:
        assert want[(r["l_returnflag"], r["l_linestatus"])] == [
            r["sum_qty"], r["sum_price_cents"], r["count_order"]]


def test_orders_topk_matches_reference(ray_session):
    from noise_ray.ops.relational import orders_topk

    t = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_orderkey", "o_totalprice"])
    rows = sorted(zip(t.column("o_totalprice").to_pylist(),
                      t.column("o_orderkey").to_pylist()),
                  key=lambda r: (-r[0], r[1]))[:10]
    got = [(r["o_totalprice"], r["o_orderkey"])
           for r in orders_topk(SF).take_all()]
    assert got == rows


def test_order_priority_revenue_matches_reference(ray_session):
    from noise_ray.ops.relational import order_priority_revenue

    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_extendedprice"])
    od = pq.read_table(f"{SF}/orders.parquet",
                       columns=["o_orderkey", "o_orderpriority"])
    prio = dict(zip(od.column("o_orderkey").to_pylist(),
                    od.column("o_orderpriority").to_pylist()))
    want = collections.defaultdict(lambda: [0, 0])
    for ok, p in zip(li.column("l_orderkey").to_pylist(),
                     li.column("l_extendedprice").to_pylist()):
        if ok in prio:
            w = want[prio[ok]]
            w[0] += 1
            w[1] += int(math.floor(p * 100 + 0.5))
    out = order_priority_revenue(SF).take_all()
    assert [r["o_orderpriority"] for r in out] == sorted(want)
    for r in out:
        assert want[r["o_orderpriority"]] == [r["n_items"],
                                              r["revenue_cents"]]


def test_corpus_prep_matches_composition(ray_session):
    """corpus_prep ≡ composing its stages naively in Python."""
    import re

    from noise_ray.ops.mixing import corpus_prep
    from noise_ray.ops.text import PII_PATTERNS, _GOPHER_STOPWORDS

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    word = re.compile(r"[a-z0-9]+")
    pii = re.compile("|".join(f"(?:{p})" for p in PII_PATTERNS.values()))
    survivors = []
    seen = {}
    for did, txt in sorted(zip(t.column("doc_id").to_pylist(),
                               t.column("text").to_pylist())):
        toks = word.findall(txt.lower())
        nt, nc = len(toks), sum(map(len, toks))
        na = sum(1 for w in toks if any(c.isalpha() for c in w))
        ns = sum(1 for w in toks if w in _GOPHER_STOPWORDS)
        if not (5 <= nt <= 10000 and 2 * nt <= nc <= 12 * nt
                and 10 * na >= 7 * nt and ns >= 2):
            continue
        red = pii.sub("[PII]", txt)
        if red in seen:
            continue
        seen[red] = did
        survivors.append((did, len(word.findall(red.lower()))))
    want, before = [], 0
    for did, n in survivors:  # already doc_id-ordered
        want.append((did, n, before // 256))
        before += n
    got = [(r["doc_id"], r["n_tokens"], r["pack_id"])
           for r in corpus_prep(SF).take_all()]
    assert got == want
    assert 0 < len(want) < t.num_rows  # filter and dedup both fired


def test_events_hourly_ma_matches_window_oracle(ray_session):
    """Pipeline agg: trailing 3-existing-bucket moving average equals
    the SQL window-function recomputation."""
    import duckdb

    import __ray_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = entry.queries()["events_hourly_ma"](sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * "
                f"FROM read_parquet('{sf}/events.parquet')")
    want = con.execute(entry.oracle_sql()["events_hourly_ma"]).fetchdf()
    g = got.sort_values(["event_type", "hour"]).reset_index(drop=True)
    w = want.sort_values(["event_type", "hour"]).reset_index(drop=True)
    assert (g["ma"].to_numpy() == w["ma"].to_numpy()).all()
    assert (g["n_events"].to_numpy() == w["n_events"].to_numpy()).all()


def test_events_hourly_pipeline_derivative_and_cum(ray_session):
    """Derivative nulls at each type's first bucket; cum is the running
    per-type sum — recomputed from events_hourly's own buckets."""
    from noise_ray.ops.relational import (events_hourly,
                                          events_hourly_pipeline)

    sf = "/root/testdata/sf0.001"
    base = (events_hourly(sf).to_pandas()
            .sort_values(["event_type", "hour"]).reset_index(drop=True))
    got = events_hourly_pipeline(sf).to_pandas()
    assert len(got) == len(base)
    run_type, run_cum, prev_n = None, 0, None
    for r, b in zip(got.itertuples(index=False),
                    base.itertuples(index=False)):
        assert (r.hour, r.event_type, r.n_events) == \
            (b.hour, b.event_type, b.n_events)
        if r.event_type != run_type:
            run_type, run_cum, prev_n = r.event_type, 0, None
        run_cum += r.n_events
        assert r.cum == run_cum
        if prev_n is None:
            assert r.deriv != r.deriv  # NaN/null
        else:
            assert r.deriv == r.n_events - prev_n
        prev_n = r.n_events
