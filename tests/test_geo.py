"""Geospatial oracle entries (ops/geo.py): bbox through the
reference's && query end to end, radius search over the grid sidecar,
and pruning soundness vs a brute-force recomputation."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_geo_bbox_matches_closed_form(ray_session):
    import pyarrow.parquet as pq

    from noise_ray.ops.geo import _lonlat, geo_bbox

    ids = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id"]).column("doc_id").to_numpy()
    lon, lat = _lonlat(ids)
    for (w, e, s, n) in ((-60, 40, -25, 35), (100, 179, -80, -10)):
        got = geo_bbox(SF, west=w, east=e, south=s, north=n)
        want = sorted(f"p{int(d)}" for d, x, y in zip(ids, lon, lat)
                      if w <= x <= e and s <= y <= n)
        assert got.column("_id").to_pylist() == want


def test_geo_distance_matches_bruteforce(ray_session):
    import pyarrow.parquet as pq

    from noise_ray.ops.geo import _lonlat, geo_distance

    ids = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id"]).column("doc_id").to_numpy()
    lon, lat = _lonlat(ids)
    for (x0, y0, r) in ((10.0, 5.0, 40.0), (-170.0, 80.0, 25.0)):
        got = geo_distance(SF, lon0=x0, lat0=y0, radius=r)
        d2 = (lon - x0) ** 2 + (lat - y0) ** 2
        keep = d2 <= r * r
        dist = np.round(np.sqrt(d2[keep]), 6)
        names = np.asarray([f"p{int(d)}" for d in ids[keep]], dtype=object)
        top = np.lexsort((names, dist))[:50]
        assert got.column("_id").to_pylist() == names[top].tolist()
        assert got.column("dist").to_pylist() == dist[top].tolist()


def test_geo_grid_and_centroid_match_bruteforce(ray_session):
    import collections

    import pyarrow.parquet as pq

    from noise_ray.ops.geo import (_lonlat, geo_centroid, geo_grid_agg)

    ids = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id"]).column("doc_id").to_numpy()
    lon, lat = _lonlat(ids)
    cnt = collections.Counter(
        (int(np.floor((x + 180.0) / 10.0)), int(np.floor((y + 90.0) / 10.0)))
        for x, y in zip(lon, lat))
    want = sorted(((n, tx, ty) for (tx, ty), n in cnt.items()),
                  key=lambda r: (-r[0], r[1], r[2]))[:30]
    got = geo_grid_agg(SF)
    assert [(r["n"], r["tile_x"], r["tile_y"])
            for r in got.to_pylist()] == want

    keep = (lon >= -60) & (lon <= 40) & (lat >= -25) & (lat <= 35)
    klon = np.rint((lon[keep] + 180.0) * 100.0).astype(np.int64)
    klat = np.rint((lat[keep] + 90.0) * 100.0).astype(np.int64)
    n = int(keep.sum())
    c = geo_centroid(SF).to_pylist()[0]
    assert c["n"] == n
    assert c["lon"] == round(float(klon.sum()) / (100.0 * n) - 180.0, 6)
    assert c["lat"] == round(float(klat.sum()) / (100.0 * n) - 90.0, 6)


def test_geo_partials_are_bounded(ray_session, monkeypatch):
    """The per-range fold never gives the driver more than k rows per
    range (distance) / three scalars per range (centroid) — the scale
    property the round-4 driver-side candidate collection lacked."""
    import noise_ray.ops.geo as geo

    sizes = []
    real = geo.geo_distance_range

    def spy(idx, lon0, lat0, radius, k, lo, hi):
        out = real(idx, lon0, lat0, radius, k, lo, hi)
        sizes.append(len(out[0]))
        return out

    monkeypatch.setattr(geo, "geo_distance_range", spy)
    k = 7
    got = geo.geo_distance(SF, radius=200.0, k=k)  # corpus-sized box
    assert sizes and all(s <= k for s in sizes)
    assert got.num_rows == k

    csizes = []
    creal = geo.geo_centroid_range

    def cspy(idx, w, e, s, n, lo, hi):
        out = creal(idx, w, e, s, n, lo, hi)
        csizes.append(out)
        return out

    monkeypatch.setattr(geo, "geo_centroid_range", cspy)
    c = geo.geo_centroid(SF, west=-180, east=180, south=-90, north=90)
    assert csizes and all(len(t) == 3 for t in csizes)
    assert c.column("n").to_pylist()[0] == sum(t[0] for t in csizes)


def test_geo_dist_dispatch_matches_inprocess(ray_session, monkeypatch):
    """Forcing the pool dispatch (dist_min_docs=1) returns bit-identical
    tables to the in-process per-range fold."""
    from noise_ray.ops.geo import geo_centroid, geo_distance

    plain_d = geo_distance(SF)
    plain_c = geo_centroid(SF)
    monkeypatch.setenv("NOISE_RAY_DIST_MIN_DOCS", "1")
    assert geo_distance(SF).equals(plain_d)
    assert geo_centroid(SF).equals(plain_c)
