"""Vector stages (simplify/segmentize/clip/centroid/hilbert/dissolve) and
raster ops (as-features, band stats, pixel-info, hillshade) vs oracles."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.core import codecs, fixtures, geom, wkb
from gdal_ray.core import geotransform as gtm
from gdal_ray.pipelines import raster_ops as RO
from gdal_ray.stages import vector as V
from gdal_ray.stages.raster import hillshade


def square(x0=0.0, y0=0.0, s=10.0):
    return np.array([[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s], [x0, y0]])


def poly_table(rings_list):
    return pa.table({
        "poly_id": pa.array([f"p{i}" for i in range(len(rings_list))]),
        "wkb": pa.array([wkb.polygon(r[0], r[1:]) for r in rings_list], pa.binary()),
    })


def test_clip_to_bbox_exact():
    t = poly_table([[square(0, 0, 10)], [square(20, 20, 5)], [square(-8, -8, 4)]])
    out = V.clip_to_bbox(t, 2.0, 2.0, 22.0, 22.0)
    assert out.num_rows == 2  # the (-8,-8) square drops out
    g0 = wkb.as_polygons(wkb.loads(out.column("wkb")[0].as_py()))[0]
    # square(0,0,10) ∩ [2,22]² = [2,10]²
    assert abs(geom.polygon_area(g0) - 64.0) < 1e-9
    bb = geom.rings_bbox(g0)
    assert bb == (2.0, 2.0, 10.0, 10.0)
    g1 = wkb.as_polygons(wkb.loads(out.column("wkb")[1].as_py()))[0]
    # square spanning 20..25 clipped at 22 -> 2×2
    assert abs(geom.polygon_area(g1) - 4.0) < 1e-9


def test_clip_concave():
    # C-shape clipped to a window crossing its notch
    ring = np.array([[0, 0], [10, 0], [10, 2], [2, 2], [2, 8], [10, 8],
                     [10, 10], [0, 10], [0, 0]], dtype=np.float64)
    t = poly_table([[ring]])
    out = V.clip_to_bbox(t, -1.0, 1.0, 11.0, 9.0)
    g = wkb.as_polygons(wkb.loads(out.column("wkb")[0].as_py()))[0]
    # area oracle: original area 2*10+2*... compute via brute grid
    xs, ys = np.meshgrid(np.linspace(-1, 11, 600), np.linspace(1, 9, 400))
    inside_orig = geom.points_in_ring(xs.ravel(), ys.ravel(), ring)
    frac = inside_orig.mean() * (12.0 * 8.0)
    assert abs(abs(geom.polygon_area(g)) - frac) < 0.5


def test_simplify_segmentize_roundtrip():
    t = np.linspace(0, 2 * np.pi, 100, endpoint=False)
    ring = np.column_stack([10 * np.cos(t), 10 * np.sin(t)])
    ring = np.vstack([ring, ring[:1]])
    tbl = poly_table([[ring]])
    simp = V.simplify(tbl, tolerance=0.5)
    g = wkb.as_polygons(wkb.loads(simp.column("wkb")[0].as_py()))[0]
    assert len(g[0]) < 40
    seg = V.segmentize(simp, max_len=0.5)
    g2 = wkb.as_polygons(wkb.loads(seg.column("wkb")[0].as_py()))[0]
    d = np.hypot(*np.diff(g2[0], axis=0).T)
    assert d.max() <= 0.5 + 1e-9


def test_swap_xy_involution():
    tbl = poly_table([[square(1, 2, 3)]])
    out = V.swap_xy(V.swap_xy(tbl))
    np.testing.assert_allclose(
        wkb.as_polygons(wkb.loads(out.column("wkb")[0].as_py()))[0][0],
        square(1, 2, 3))


def test_centroid_and_area():
    tbl = poly_table([[square(0, 0, 10)], [square(4, 4, 2)]])
    out = V.centroids(V.area_col(tbl))
    assert out.column("area").to_pylist() == [100.0, 4.0]
    assert out.column("cx").to_pylist() == [5.0, 5.0]
    assert out.column("cy").to_pylist() == [5.0, 5.0]


def test_hilbert_sort_locality():
    polys = fixtures.polygons_table(100)
    keyed = V.hilbert_key(polys)
    keys = np.asarray(keyed.column("hilbert"))
    assert len(np.unique(keys)) > 50
    # locality: two nearby squares have closer keys than a far one
    t2 = poly_table([[square(0, 0, 1)], [square(1.5, 0, 1)], [square(120, 60, 1)]])
    k = np.asarray(V.hilbert_key(t2).column("hilbert"))
    assert abs(k[0] - k[1]) < abs(k[0] - k[2])


def test_dissolve_collect(ray_session):
    import ray
    polys = ray.data.from_arrow(fixtures.polygons_table(40))
    out = polys.groupby("category").map_groups(V.dissolve_collect,
                                               batch_format="pyarrow").take_all()
    assert 0 < len(out) <= 8
    total_parts = sum(r["n_parts"] for r in out)
    assert total_parts >= 40
    for r in out:
        g = wkb.loads(r["wkb"])
        assert g["type"] == "MultiPolygon"
        assert len(g["polys"]) == r["n_parts"]


def test_as_features_matches_pixels():
    tbl = fixtures.images_table(3)
    out = RO.as_features(tbl)
    # total rows = sum of w*h
    expect = sum(tbl.column("w")[i].as_py() * tbl.column("h")[i].as_py()
                 for i in range(3))
    assert out.num_rows == expect
    # value of first pixel of image 0 equals decoded band value
    img = codecs.decode(tbl.column("bytes")[0].as_py(), tbl.column("fmt")[0].as_py())
    band = img if img.ndim == 2 else img[:, :, 0]
    first = out.column("value")[0].as_py()
    assert first == float(band[0, 0])


def test_band_statistics(ray_session):
    import ray
    tbl = fixtures.images_table(10)
    out = RO.band_statistics(ray.data.from_arrow(tbl)).take_all()
    assert len(out) == 1
    r = out[0]
    # oracle: accumulate over all decoded pixels (all bands)
    alls = []
    for i in range(10):
        img = codecs.decode(tbl.column("bytes")[i].as_py(), tbl.column("fmt")[i].as_py())
        alls.append(np.asarray(img, dtype=np.float64).ravel())
    v = np.concatenate(alls)
    assert r["n_pixels"] == v.size
    assert r["vmin"] == v.min() and r["vmax"] == v.max()
    assert abs(r["mean"] - v.mean()) < 1e-9
    assert abs(r["std"] - v.std()) < 1e-6


def test_pixel_info_sampling(ray_session):
    import ray
    # one raw EPSG:4326 image with known geotransform
    band = np.arange(100, dtype=np.uint8).reshape(10, 10)
    gt = gtm.north_up(10.0, 50.0, 0.1, 0.1)
    tbl = pa.table({
        "image_id": ["img0"],
        "bytes": pa.array([codecs.encode_raw(band)], pa.binary()),
        "fmt": ["raw"], "w": pa.array([10], pa.int32()), "h": pa.array([10], pa.int32()),
        "geotransform": pa.array([list(gt)], pa.list_(pa.float64(), 6)),
        "crs": ["EPSG:4326"],
    })
    # query at center of pixel (3, 2): lon = 10 + 3.5*0.1, lat = 50 - 2.5*0.1
    out = RO.pixel_info(ray.data.from_arrow(tbl), lon=[10.35, 0.0],
                        lat=[49.75, 0.0], point_ids=["a", "b"],
                        method="near", concurrency=1).take_all()
    assert len(out) == 1
    assert out[0]["point_id"] == "a"
    assert out[0]["value"] == float(band[2, 3])


def test_hillshade_flat_constant():
    """Flat DEM → slope 0 → shade = sin(altitude) everywhere
    (gdaldem Horn formula)."""
    band = np.full((12, 12), 100, dtype=np.uint8)
    gt = gtm.north_up(0.0, 10.0, 1.0, 1.0)
    tbl = pa.table({
        "image_id": ["x"], "bytes": pa.array([codecs.encode_raw(band)], pa.binary()),
        "fmt": ["raw"],
        "geotransform": pa.array([list(gt)], pa.list_(pa.float64(), 6)),
    })
    out = hillshade(tbl, altitude=45.0)
    img = codecs.decode(out.column("bytes")[0].as_py(), "png")
    expect = int(np.clip(1.0 + 254.0 * np.sin(np.deg2rad(45.0)), 1, 255))
    assert (img == expect).all()


def test_events_hourly_matches_duckdb(ray_session):
    import duckdb
    got = RO.events_hourly("/root/testdata/sf0.001").to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM read_parquet('/root/testdata/sf0.001/events.parquet')")
    exp = con.execute(RO.SQL_EVENTS_HOURLY).df()
    got = got.sort_values(["window_start", "event_type"]).reset_index(drop=True)
    exp = exp.sort_values(["window_start", "event_type"]).reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["n_events"].values == exp["n_events"].values).all()
    np.testing.assert_allclose(got["sum_value"].values, exp["sum_value"].values, atol=1e-9)


def test_events_funnel_path_parity_and_oracle(ray_session):
    """events_funnel: distributed grouped_map_groups branch == driver
    branch, and both == a brute-force per-user scan at sf0.001."""
    import pandas as pd
    import pyarrow.parquet as pq
    from gdal_ray.pipelines import shuffle_utils as SU
    from gdal_ray.pipelines.raster_ops import events_funnel

    sf = "/root/testdata/sf0.001"
    base = events_funnel(sf).to_pandas().sort_values("user_id") \
        .reset_index(drop=True)

    orig = SU.grouped_map_groups

    def forced(ds, key, fn, driver_limit=200_000):
        return orig(ds, key, fn, driver_limit=0)

    SU.grouped_map_groups = forced
    try:
        dist = events_funnel(sf).to_pandas().sort_values("user_id") \
            .reset_index(drop=True)
    finally:
        SU.grouped_map_groups = orig
    pd.testing.assert_frame_equal(base, dist)

    # brute force
    t = pq.read_table(f"{sf}/events.parquet",
                      columns=["user_id", "ts", "event_type"]).to_pandas()
    t["us"] = t["ts"].astype("int64")
    W = 60 * 60_000_000
    rows = {}
    for uid, grp in t.groupby("user_id"):
        s = grp[grp.event_type == "signup"]["us"].to_numpy()
        p = np.sort(grp[grp.event_type == "purchase"]["us"].to_numpy())
        if s.size == 0:
            continue
        conv = sum(bool(((p > x) & (p <= x + W)).any()) for x in s)
        rows[uid] = (len(s), conv)
    assert dict(zip(base["user_id"],
                    zip(base["n_signups"], base["n_conversions"]))) == rows


def test_events_transitions_retention_brute(ray_session):
    """Transitions and retention vs straight pandas oracles at sf0.001."""
    import collections

    import pandas as pd
    import pyarrow.parquet as pq
    from gdal_ray.pipelines.raster_ops import events_retention, \
        events_transitions

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/events.parquet").to_pandas()
    t["us"] = t["ts"].astype("int64")

    got = events_transitions(sf).to_pandas()
    gmap = {(a, b): n for a, b, n in
            zip(got["type_a"], got["type_b"], got["n"])}
    exp = collections.Counter()
    for _, grp in t.sort_values(["user_id", "us", "event_id"]) \
                   .groupby("user_id"):
        et = grp["event_type"].tolist()
        for a, b in zip(et, et[1:]):
            exp[(a, b)] += 1
    assert gmap == dict(exp)

    got_r = events_retention(sf).to_pandas()
    rmap = {(c, o): n for c, o, n in
            zip(got_r["cohort_day"], got_r["day_offset"], got_r["n_active"])}
    t["day"] = t["us"] // 86_400_000_000
    ud = t[["user_id", "day"]].drop_duplicates()
    cohort = ud.groupby("user_id")["day"].min()
    expr = collections.Counter()
    for uid, day in zip(ud["user_id"], ud["day"]):
        c = cohort[uid]
        expr[(c, day - c)] += 1
    assert rmap == dict(expr)
