"""Relational operators over the testdata tables (Ray Data).

These mirror noise's return-clause grouping/aggregation surface
(/root/reference/src/aggregates.rs: sum/avg/min/max/count/concat/group —
SURVEY §2.7) re-expressed as ``Dataset.groupby().aggregate`` /
``map_groups``, plus the join/window patterns a data-processing engine
needs.  Every function takes ``sf_dir`` and returns a Dataset or Arrow
table whose column names match the oracle SQL in ``__ray_entry__``.

Scale notes: aggregates use Ray Data's partial+final combine (the analogue
of the reference's RocksDB sum_merge operator, src/index.rs:301-322); money
sums are computed in integer cents so distributed summation order cannot
perturb values; small dimension tables are broadcast via ``ray.put`` and
looked up inside ``map_batches`` instead of shuffling the fact table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Sum


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def pricing_summary(sf_dir: str):
    """TPC-H Q1-flavoured groupby; integer-cents sums for exact parity.
    Map-side combined: each batch collapses to its (returnflag,
    linestatus) partials — 6 keys — so the fold shuffles a handful of
    rows per batch, never the lineitem stream."""
    def cents(batch: pa.Table) -> pa.Table:
        # floor(x*100 + 0.5): identical double math to the DuckDB oracle
        # (avoids round-half-to-even vs half-away-from-zero mismatches)
        qty = pc.cast(pc.floor(pc.add(batch.column("l_quantity"), 0.5)),
                      pa.int64()).to_numpy()
        price_c = pc.cast(
            pc.floor(pc.add(pc.multiply(batch.column("l_extendedprice"),
                                        100.0), 0.5)),
            pa.int64()).to_numpy()
        rf = batch.column("l_returnflag").to_numpy(zero_copy_only=False)
        ls = batch.column("l_linestatus").to_numpy(zero_copy_only=False)
        key = np.char.add(np.char.add(rf.astype(str), "|"), ls.astype(str))
        u, inv = np.unique(key, return_inverse=True)
        sq = np.zeros(u.size, np.int64)
        np.add.at(sq, inv, qty)
        sp = np.zeros(u.size, np.int64)
        np.add.at(sp, inv, price_c)
        n = np.bincount(inv, minlength=u.size)
        parts = np.char.partition(u, "|")
        return pa.table({
            "l_returnflag": pa.array(parts[:, 0], pa.string()),
            "l_linestatus": pa.array(parts[:, 2], pa.string()),
            "qty": pa.array(sq, pa.int64()),
            "price_cents": pa.array(sp, pa.int64()),
            "n": pa.array(n, pa.int64()),
        })

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"])
    return (
        ds.map_batches(cents, batch_format="pyarrow", batch_size=16384)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty", alias_name="sum_qty"),
            Sum("price_cents", alias_name="sum_price_cents"),
            Sum("n", alias_name="count_order"),
        )
    )


def orders_topk(sf_dir: str, k: int = 10):
    """Top-k by total price; deterministic tie-break on the key column.
    Per-batch partial top-k first (exact: a row outside its batch's
    top-k can never enter the global top-k), so the final sort ranks
    k×n_batches rows instead of the table."""
    def local_topk(b: pa.Table) -> pa.Table:
        tp = b.column("o_totalprice").to_numpy()
        ok = b.column("o_orderkey").to_numpy()
        order = np.lexsort((ok, -tp))[:k]
        return pa.table({"o_orderkey": pa.array(ok[order], pa.int64()),
                         "o_totalprice": pa.array(tp[order])})

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return (ds.map_batches(local_topk, batch_format="pyarrow",
                           batch_size=16384)
            .sort(["o_totalprice", "o_orderkey"],
                  descending=[True, False]).limit(k))


def region_nations_concat(sf_dir: str):
    """noise's concat() aggregate: nation names per region, ordered."""
    nation = _read(sf_dir, "nation", ["n_name", "n_regionkey"])
    from .collect import arrow_blocks

    region_t = pa.concat_tables(
        arrow_blocks(_read(sf_dir, "region", ["r_regionkey", "r_name"])))
    rmap = dict(zip(region_t.column("r_regionkey").to_pylist(),
                    region_t.column("r_name").to_pylist()))
    rmap_ref = ray.put(rmap)

    def add_region(batch: pa.Table) -> pa.Table:
        m = ray.get(rmap_ref)
        names = [m[k] for k in batch.column("n_regionkey").to_pylist()]
        return batch.append_column("r_name", pa.array(names, pa.string()))

    def concat_group(group: pa.Table) -> pa.Table:
        names = sorted(group.column("n_name").to_pylist())
        return pa.table({
            "r_name": pa.array([group.column("r_name")[0].as_py()]),
            "nations": pa.array([",".join(names)]),
        })

    return (
        nation.map_batches(add_region, batch_format="pyarrow")
        .groupby("r_name")
        .map_groups(concat_group, batch_format="pyarrow")
    )


def _window_combine(keys_us: np.ndarray, et: np.ndarray,
                    cents: np.ndarray) -> pa.Table:
    """Map-side combiner shared by the window aggregates: per-batch
    (window, event_type) counts + cents sums from one lexsort, so the
    groupby shuffles window-cardinality partials instead of event rows."""
    u_et, et_code = np.unique(et, return_inverse=True)
    order = np.lexsort((et_code, keys_us))
    k_s, e_s, c_s = keys_us[order], et_code[order], cents[order]
    starts = np.flatnonzero(
        np.r_[True, (k_s[1:] != k_s[:-1]) | (e_s[1:] != e_s[:-1])])
    counts = np.diff(np.r_[starts, k_s.size])
    csum = np.zeros(k_s.size + 1, np.int64)
    np.cumsum(c_s, out=csum[1:])
    ends = np.r_[starts[1:], k_s.size]
    return pa.table({
        "w": pa.array(k_s[starts].astype("datetime64[us]")),
        "event_type": pa.array(u_et[e_s[starts]], pa.string()),
        "n": pa.array(counts, pa.int64()),
        "cents": pa.array(csum[ends] - csum[starts], pa.int64()),
    })


def events_hourly(sf_dir: str):
    """Windowed (hourly-bucket) aggregate over the event stream:
    per-batch (hour, event_type) partials via the shared combiner, one
    groupby folds them — window-cardinality rows shuffle, never the
    event stream."""
    hour_us = np.int64(3600) * 1_000_000

    def bucket(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy().astype(
            "datetime64[us]").astype(np.int64)
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(batch.column("value"), 100.0), 0.5)),
            pa.int64()).to_numpy()
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        t = _window_combine((ts // hour_us) * hour_us, et, cents)
        return t.rename_columns(["hour", "event_type", "n", "cents"])

    return (
        _read(sf_dir, "events", ["ts", "event_type", "value"])
        .map_batches(bucket, batch_format="pyarrow", batch_size=16384)
        .groupby(["hour", "event_type"])
        .aggregate(
            Sum("n", alias_name="n_events"),
            Sum("cents", alias_name="sum_value_cents"),
        )
    )


def orders_by_segment(sf_dir: str):
    """Broadcast join: customer (small) is ray.put once and looked up inside
    map_batches over orders — no shuffle of the fact table."""
    from .collect import arrow_blocks

    cust = pa.concat_tables(
        arrow_blocks(_read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])))
    # broadcast the Arrow table itself (zero-copy in the object store) and
    # hash-join each batch against it in C++ — no Python per-row lookups
    cust_ref = ray.put(cust)

    def add_segment(batch: pa.Table) -> pa.Table:
        c = ray.get(cust_ref)
        joined = batch.join(c, keys=["o_custkey"], right_keys=["c_custkey"],
                            join_type="left outer")
        return joined.select(["c_mktsegment"])

    return (
        _read(sf_dir, "orders", ["o_custkey"])
        .map_batches(add_segment, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Count(alias_name="n_orders"))
    )


def shipdate_range_counts(sf_dir: str):
    """Predicate-pushdown range filter + small aggregate."""
    import datetime

    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1997, 1, 1)
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_shipdate"],
        filter=(pc.field("l_shipdate") >= lo) & (pc.field("l_shipdate") < hi),
    )

    def combine(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch.column("l_returnflag").combine_chunks())
        return pa.table({"l_returnflag": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    return (ds.map_batches(combine, batch_format="pyarrow",
                           batch_size=16384)
            .groupby("l_returnflag")
            .aggregate(Sum("n", alias_name="n_rows")))


_N_USER_BUCKETS = 4096


def _add_ubucket(b: pa.Table) -> pa.Table:
    """Coarse per-user shuffle key.  Grouping by the raw user_id makes
    Ray call Python once per USER — millions of tiny group calls at
    corpus scale; grouping by ``user_id % 4096`` bounds the group count
    and the group body vectorizes over all of its users at once (lexsort
    + run boundaries).  Same co-location guarantee: every row of a user
    lands in exactly one group."""
    u = b.column("user_id").to_numpy()
    return b.append_column(
        "ubucket", pa.array(u % _N_USER_BUCKETS, pa.int64()))


def sessionize(sf_dir: str, gap_seconds: int = 1800):
    """Stateful gap-based sessionization per user (the kind of streaming
    window op the reference lacks entirely — SURVEY §1.3): ONE shuffle by
    the coarse user bucket, then each group sessionizes ALL of its users
    vectorized — lexsort by (user, ts), a session starts at a user
    change or a gap > ``gap_seconds``, per-user session counts from
    cumsum diffs at user run boundaries."""
    gap_us = gap_seconds * 1_000_000

    def sessions(group: pa.Table) -> pa.Table:
        u = group.column("user_id").to_numpy()
        ts = group.column("ts").to_numpy().astype(
            "datetime64[us]").astype(np.int64)
        order = np.lexsort((ts, u))
        u_s, ts_s = u[order], ts[order]
        new_user = np.r_[True, u_s[1:] != u_s[:-1]]
        start = new_user | np.r_[False, np.diff(ts_s) > gap_us]
        cs = np.zeros(start.size + 1, np.int64)
        np.cumsum(start, out=cs[1:])
        ub = np.flatnonzero(new_user)
        ue = np.r_[ub[1:], u_s.size]
        return pa.table({
            "user_id": pa.array(u_s[ub], pa.int64()),
            "n_sessions": pa.array(cs[ue] - cs[ub], pa.int64()),
        })

    return (
        _read(sf_dir, "events", ["user_id", "ts"])
        .map_batches(_add_ubucket, batch_format="pyarrow",
                     batch_size=16384)
        .groupby("ubucket")
        .map_groups(sessions, batch_format="pyarrow")
    )


def asof_latest_order(sf_dir: str):
    """As-of join: for each event, the o_orderdate of the user's latest
    order at or before the event timestamp.

    Ray-native two-dataset as-of: both sides are tagged, unioned, and
    co-shuffled by the join key in ONE ``groupby(key)``; each group sorts
    its order rows once and resolves every event with a vectorized
    searchsorted — no driver-side join, no per-event lookups.  At 100 TB
    the shuffle moves each row exactly once, partitioned by key.
    """
    events = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def tag_events(b: pa.Table) -> pa.Table:
        return pa.table({
            "key": b.column("user_id"),
            "t": b.column("ts"),
            "event_id": b.column("event_id"),
            "side": pa.array(np.zeros(b.num_rows, dtype=np.int8)),
        })

    def tag_orders(b: pa.Table) -> pa.Table:
        return pa.table({
            "key": b.column("o_custkey"),
            "t": b.column("o_orderdate"),
            "event_id": pa.array(np.full(b.num_rows, -1, dtype=np.int64)),
            "side": pa.array(np.ones(b.num_rows, dtype=np.int8)),
        })

    def asof_group(g: pa.Table) -> pa.Table:
        side = g.column("side").to_numpy()
        ts = g.column("t").to_numpy().astype("datetime64[us]").astype(np.int64)
        ev_mask = side == 0
        ev_ts = ts[ev_mask]
        ev_id = g.column("event_id").to_numpy()[ev_mask]
        od_ts = np.sort(ts[~ev_mask])
        if ev_id.size == 0:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "asof_date": pa.array([], pa.timestamp("us"))})
        idx = np.searchsorted(od_ts, ev_ts, side="right") - 1
        matched = np.where(idx >= 0, od_ts[np.maximum(idx, 0)], -1)
        keep = idx >= 0  # events with no prior order are dropped (inner asof)
        return pa.table({
            "event_id": pa.array(ev_id[keep], pa.int64()),
            "asof_date": pa.array(matched[keep].astype("datetime64[us]")),
        })

    return (
        events.map_batches(tag_events, batch_format="pyarrow")
        .union(orders.map_batches(tag_orders, batch_format="pyarrow"))
        .groupby("key")
        .map_groups(asof_group, batch_format="pyarrow")
        .sort("event_id")
    )


def prev_event(sf_dir: str):
    """Windowed as-of within one stream: each event's predecessor in its
    user's timeline (lag over (user_id, ts)).  One coarse-bucket shuffle;
    the group body lexsorts (user, ts, event_id) and shifts — user-run
    first rows get -1."""
    def lag_group(g: pa.Table) -> pa.Table:
        u = g.column("user_id").to_numpy()
        ts = g.column("ts").to_numpy().astype(
            "datetime64[us]").astype(np.int64)
        ev = g.column("event_id").to_numpy()
        order = np.lexsort((ev, ts, u))
        u_s, ev_s = u[order], ev[order]
        prev = np.empty_like(ev_s)
        prev[0] = -1
        prev[1:] = ev_s[:-1]
        prev[np.r_[True, u_s[1:] != u_s[:-1]]] = -1
        return pa.table({"event_id": pa.array(ev_s, pa.int64()),
                         "prev_event_id": pa.array(prev, pa.int64())})

    return (
        _read(sf_dir, "events", ["event_id", "ts", "user_id"])
        .map_batches(_add_ubucket, batch_format="pyarrow",
                     batch_size=16384)
        .groupby("ubucket")
        .map_groups(lag_group, batch_format="pyarrow")
        .sort("event_id")
    )


def sliding_window_stats(sf_dir: str, window_seconds: int = 3600):
    """Sliding RANGE-window aggregate: for every event, the count and
    cents-sum of the same user's events in the preceding hour (inclusive
    both ends — SQL ``RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND
    CURRENT ROW``, so equal-timestamp peers are always included).

    One shuffle by user_id, then each group sorts by ts once and
    resolves every event's window with two vectorized ``searchsorted``
    cursors + a cumsum diff — O(n log n) per user, no per-row Python.
    Sums are integer cents so the DuckDB comparison is exact.  At 100 TB
    a pathologically hot user would need day-range subgroups with a
    one-window overlap replicated to the successor range; event streams
    keyed by real users don't hit that."""
    win_us = window_seconds * 1_000_000

    def prep(b: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(b.column("value"), 100.0), 0.5)),
            pa.int64())
        return pa.table({
            "user_id": b.column("user_id"),
            "ts": b.column("ts"),
            "event_id": b.column("event_id"),
            "cents": cents,
        })

    def win_group(g: pa.Table) -> pa.Table:
        ts = g.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
        ev = g.column("event_id").to_numpy()
        cents = g.column("cents").to_numpy()
        order = np.argsort(ts, kind="stable")
        ts_s, ev_s, c_s = ts[order], ev[order], cents[order]
        lo = np.searchsorted(ts_s, ts_s - win_us, side="left")
        hi = np.searchsorted(ts_s, ts_s, side="right")
        csum = np.zeros(ts_s.size + 1, np.int64)
        np.cumsum(c_s, out=csum[1:])
        return pa.table({
            "event_id": pa.array(ev_s, pa.int64()),
            "n_window": pa.array(hi - lo, pa.int64()),
            "sum_cents_window": pa.array(csum[hi] - csum[lo], pa.int64()),
        })

    return (
        _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(win_group, batch_format="pyarrow")
        .sort("event_id")
    )


def hopping_window_stats(sf_dir: str, window_seconds: int = 3600,
                         hop_seconds: int = 900):
    """Hopping-window aggregate over the event stream: count and
    cents-sum per (window_start, event_type) for 1-hour windows hopping
    every 15 minutes (each event belongs to window/hop = 4 overlapping
    windows).

    The streaming-system shape: a stateless ``map_batches`` explodes
    each event into its covering window starts — a bounded ×4 fan-out,
    vectorized with one ``np.repeat`` — and ONE groupby aggregates;
    no per-group sort, no window state.  Empty windows are absent (as
    in every streaming engine); sums are integer cents so the DuckDB
    comparison is exact."""
    n_win = window_seconds // hop_seconds
    win_us = np.int64(window_seconds * 1_000_000)
    hop_us = np.int64(hop_seconds * 1_000_000)

    def explode(b: pa.Table) -> pa.Table:
        ts = b.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(b.column("value"), 100.0), 0.5)),
            pa.int64()).to_numpy()
        et = b.column("event_type").to_numpy(zero_copy_only=False)
        # covering window starts: the n_win hops ending at the event's hop
        last = (ts // hop_us) * hop_us          # latest window containing ts
        first = last - win_us + hop_us
        starts = (np.repeat(first, n_win)
                  + np.tile(np.arange(n_win, dtype=np.int64) * hop_us,
                            ts.size))
        t = _window_combine(starts, np.repeat(et, n_win),
                            np.repeat(cents, n_win))
        return t.rename_columns(["window_start", "event_type", "n", "cents"])

    return (
        _read(sf_dir, "events", ["ts", "event_type", "value"])
        .map_batches(explode, batch_format="pyarrow", batch_size=16384)
        .groupby(["window_start", "event_type"])
        .aggregate(Sum("n", alias_name="n_events"),
                   Sum("cents", alias_name="sum_cents"))
        .sort(["window_start", "event_type"])
    )


def order_priority_revenue(sf_dir: str, num_partitions: int | None = None):
    """Large×large equi-join: lineitem ⋈ orders on orderkey, revenue
    cents per order priority — the join shape where neither side fits a
    broadcast, exercising Ray Data's native partitioned hash join.

    Scale hygiene around the join: lineitem first collapses per batch
    to (orderkey, n, cents) partials (same-order items in a batch merge),
    so the join's probe side carries one row per distinct orderkey per
    batch; after the join another map-side combine reduces each block to
    priority-cardinality partials before the final 5-key groupby.
    ``num_partitions`` sizes the hash join's parallelism — at 100 TB set
    it so a partition of both sides fits a worker's heap.  Default is
    half the cluster's CPUs: the join spawns that many aggregator
    ACTORS, and asking for more actors than free CPU slots deadlocks a
    small cluster (observed under the 4-CPU test session)."""
    if num_partitions is None:
        num_partitions = max(2, int(ray.cluster_resources()
                                    .get("CPU", 8)) // 2)
    def combine_line(b: pa.Table) -> pa.Table:
        ok = b.column("l_orderkey").to_numpy()
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(b.column("l_extendedprice"), 100.0),
                            0.5)), pa.int64()).to_numpy()
        u, inv = np.unique(ok, return_inverse=True)
        sc = np.zeros(u.size, np.int64)
        np.add.at(sc, inv, cents)
        n = np.bincount(inv, minlength=u.size)
        return pa.table({"l_orderkey": pa.array(u, pa.int64()),
                         "n": pa.array(n, pa.int64()),
                         "cents": pa.array(sc, pa.int64())})

    def combine_priority(b: pa.Table) -> pa.Table:
        pr = b.column("o_orderpriority").to_numpy(zero_copy_only=False)
        u, inv = np.unique(pr, return_inverse=True)
        sn = np.zeros(u.size, np.int64)
        np.add.at(sn, inv, b.column("n").to_numpy())
        sc = np.zeros(u.size, np.int64)
        np.add.at(sc, inv, b.column("cents").to_numpy())
        return pa.table({"o_orderpriority": pa.array(u, pa.string()),
                         "n": pa.array(sn, pa.int64()),
                         "cents": pa.array(sc, pa.int64())})

    line = (_read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"])
            .map_batches(combine_line, batch_format="pyarrow",
                         batch_size=16384))
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    return (
        line.join(orders, "inner", num_partitions,
                  on=("l_orderkey",), right_on=("o_orderkey",))
        .map_batches(combine_priority, batch_format="pyarrow",
                     batch_size=16384)
        .groupby("o_orderpriority")
        .aggregate(Sum("n", alias_name="n_items"),
                   Sum("cents", alias_name="revenue_cents"))
        .sort("o_orderpriority")
    )


def events_hourly_ma(sf_dir: str, window: int = 3) -> pa.Table:
    """Pipeline aggregation (cf. Elasticsearch ``moving_fn`` /
    ``derivative`` over a date_histogram): the trailing ``window``-bucket
    moving average of hourly event counts per event_type, computed over
    the EXISTING buckets in hour order (the ES pipeline-agg contract —
    sibling buckets, not wall-clock gaps).  The heavy work is
    events_hourly's one windowed groupby; the pipeline pass runs over
    the window-cardinality bucket table, never the event stream.
    Returns (hour, event_type, n_events, ma) ordered (event_type, hour),
    ma rounded 4dp."""
    t = events_hourly(sf_dir).to_pandas()
    t = t.sort_values(["event_type", "hour"]).reset_index(drop=True)
    hours = t["hour"].to_numpy()
    ets = t["event_type"].to_numpy()
    ns = t["n_events"].to_numpy().astype(np.float64)
    ma = np.empty(len(t), np.float64)
    start = 0
    for i in range(len(t)):
        if i and ets[i] != ets[i - 1]:
            start = i
        lo = max(start, i - window + 1)
        ma[i] = ns[lo:i + 1].sum() / (i + 1 - lo)
    return pa.table({
        "hour": pa.array(hours),
        "event_type": pa.array(ets.tolist(), pa.string()),
        "n_events": pa.array(t["n_events"].to_numpy(), pa.int64()),
        "ma": pa.array(np.round(ma, 4), pa.float64()),
    })


def events_hourly_pipeline(sf_dir: str) -> pa.Table:
    """Derivative + cumulative-sum pipeline aggregations (cf.
    Elasticsearch ``derivative`` / ``cumulative_sum`` over a
    date_histogram): per-type hour buckets from events_hourly's one
    windowed groupby, then bucket-table passes — the derivative of
    n_events vs the PREVIOUS EXISTING bucket (null for each type's
    first bucket, the ES sibling-bucket contract) and the running
    cumulative sum.  All post-groupby work runs over the
    window-cardinality bucket table, never the event stream.  Returns
    (hour, event_type, n_events, deriv, cum) ordered (event_type,
    hour)."""
    t = events_hourly(sf_dir).to_pandas()
    t = t.sort_values(["event_type", "hour"]).reset_index(drop=True)
    ns = t["n_events"].to_numpy().astype(np.int64)
    ets = t["event_type"].to_numpy()
    new_et = np.r_[True, ets[1:] != ets[:-1]]
    deriv = np.empty(len(t), np.float64)
    deriv[0] = np.nan
    deriv[1:] = (ns[1:] - ns[:-1]).astype(np.float64)
    deriv[new_et] = np.nan
    grp = np.cumsum(new_et) - 1
    cum = np.cumsum(ns)
    base = np.zeros(len(t), np.int64)
    firsts = np.flatnonzero(new_et)
    base = np.repeat(cum[firsts] - ns[firsts], np.diff(np.r_[firsts, len(t)]))
    return pa.table({
        "hour": pa.array(t["hour"].to_numpy()),
        "event_type": pa.array(ets.tolist(), pa.string()),
        "n_events": pa.array(ns, pa.int64()),
        "deriv": pa.array([None if np.isnan(d) else float(d)
                           for d in deriv], pa.float64()),
        "cum": pa.array(cum - base, pa.int64()),
    })
