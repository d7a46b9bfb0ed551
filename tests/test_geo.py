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
