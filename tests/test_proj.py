"""Projection engine: UTM (Karney series) and web-mercator transforms."""

import numpy as np

from gdal_ray.core import proj


def test_utm_known_point():
    # Public control point: lat 0, lon at central meridian of zone 11 (-117)
    e, n = proj.tmerc_forward(np.array([-117.0]), np.array([0.0]), -117.0)
    assert abs(float(e) - 500000.0) < 1e-6
    assert abs(float(n)) < 1e-6
    # scale at central meridian: 1 deg north ≈ 110574.4 m * 0.9996 at equator
    e2, n2 = proj.tmerc_forward(np.array([-117.0]), np.array([1.0]), -117.0)
    assert abs(float(n2) - 110574.389 * 0.9996) < 5.0


def test_utm_roundtrip_accuracy():
    rng = np.random.default_rng(3)
    lon = rng.uniform(-120, -114, 200)
    lat = rng.uniform(-80, 84, 200)
    e, n = proj.tmerc_forward(lon, lat, -117.0)
    lon2, lat2 = proj.tmerc_inverse(e, n, -117.0)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_transformer_chain():
    t = proj.get_transformer("EPSG:32611", "EPSG:3857")
    # UTM 11N false easting -> lon -117 -> mercator x
    x, y = t.transform(np.array([500000.0]), np.array([3751320.0]))
    lon_expect = -117.0
    from gdal_ray.core import mercator
    lat_back, lon_back = mercator.meters_to_latlon(x, y)
    assert abs(float(lon_back) - lon_expect) < 1e-9
    # cache returns the same object
    assert proj.get_transformer("EPSG:32611", "EPSG:3857") is t


def test_identity():
    t = proj.get_transformer("EPSG:4326", "EPSG:4326")
    x, y = t.transform([1.0, 2.0], [3.0, 4.0])
    np.testing.assert_array_equal(x, [1.0, 2.0])


def test_utm_south():
    d = proj.parse_crs("EPSG:32733")
    assert d["south"] and d["zone"] == 33
    e, n = proj.tmerc_forward(np.array([15.0]), np.array([-30.0]), 15.0, fn=10000000.0)
    assert float(n) < 10000000.0  # south of equator => northing below FN
    lon2, lat2 = proj.tmerc_inverse(e, n, 15.0, fn=10000000.0)
    assert abs(float(lat2) + 30.0) < 1e-9


# ---------- conic + polar projections (round-4 CRS breadth) ----------

import numpy as np
import pytest

from gdal_ray.core import proj as P


def _ell_of(desc):
    a, f = desc.get("ellps", P.ELLIPSOIDS["WGS84"])
    return a, f * (2 - f)


def _scale_factors(crs, lon, lat, d=1e-7):
    """Numerical along-parallel (k) and along-meridian (h) scale factors."""
    desc = P.parse_crs(crs)
    a, e2 = _ell_of(desc)
    phi = np.deg2rad(lat)
    nu = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)          # prime vertical
    M = a * (1 - e2) / (1 - e2 * np.sin(phi) ** 2) ** 1.5  # meridian radius
    t = P.Transformer("EPSG:4326", crs)
    x0, y0 = t.transform(lon, lat)
    xe, ye = t.transform(lon + d, lat)
    xn, yn = t.transform(lon, lat + d)
    k = np.hypot(xe - x0, ye - y0) / (nu * np.cos(phi) * np.deg2rad(d))
    h = np.hypot(xn - x0, yn - y0) / (M * np.deg2rad(d))
    return float(k), float(h)


@pytest.mark.parametrize("crs,pts", [
    ("EPSG:2154", [(2.35, 48.85), (3.0, 46.5), (-1.5, 43.4), (7.7, 48.6)]),
    ("EPSG:5070", [(-96.0, 23.0), (-120.3, 38.5), (-75.1, 40.0)]),
    ("EPSG:3413", [(-45.0, 90.0), (-30.0, 75.0), (120.0, 70.0)]),
    ("EPSG:3031", [(0.0, -90.0), (166.7, -77.8), (-60.0, -71.0)]),
    ("+proj=lcc +lat_1=33 +lat_0=33 +lon_0=-95 +k_0=0.9994 +x_0=100000",
     [(-95.0, 33.0), (-98.0, 35.0)]),
    ("+proj=aea +lat_1=40 +lat_0=40 +lon_0=10", [(10.0, 40.0), (14.0, 44.0)]),
    ("+proj=stere +lat_0=90 +lat_ts=90 +k_0=0.994 +lon_0=0",
     [(0.0, 90.0), (10.0, 80.0)]),
], ids=["lcc93", "conus_albers", "ps_north", "ps_south", "lcc_1sp",
        "aea_1sp", "ps_variant_a"])
def test_conic_polar_roundtrip(crs, pts):
    t_fwd = P.Transformer("EPSG:4326", crs)
    t_inv = P.Transformer(crs, "EPSG:4326")
    lon = np.array([p[0] for p in pts])
    lat = np.array([p[1] for p in pts])
    x, y = t_fwd.transform(lon, lat)
    lon2, lat2 = t_inv.transform(x, y)
    # sub-micrometer-equivalent roundtrip (1e-9 deg ≈ 0.1 mm)
    np.testing.assert_allclose(lon2[lat < 89.999], lon[lat < 89.999], atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_lcc_unit_scale_on_standard_parallels():
    # 2SP Lambert: k = h = 1 exactly on both standard parallels (Snyder §15)
    for lat_sp in (49.0, 44.0):
        k, h = _scale_factors("EPSG:2154", 2.0, lat_sp)
        assert abs(k - 1) < 1e-6 and abs(h - 1) < 1e-6
    # conformal: k == h everywhere (but != 1 off the parallels)
    k, h = _scale_factors("EPSG:2154", 2.0, 46.5)
    assert abs(k - h) < 1e-6 and k < 1.0


def test_albers_equal_area_jacobian():
    # k·h == 1 everywhere (area preserved), and k = 1 on standard parallels
    for lon, lat in [(-96.0, 29.5), (-96.0, 45.5), (-110.0, 40.0), (-80.0, 30.0)]:
        k, h = _scale_factors("EPSG:5070", lon, lat)
        assert abs(k * h - 1) < 1e-6
    k, _ = _scale_factors("EPSG:5070", -100.0, 29.5)
    assert abs(k - 1) < 1e-6


def test_polar_stereographic_properties():
    # k = 1 on the standard parallel, conformal off it
    k, h = _scale_factors("EPSG:3413", 10.0, 70.0)
    assert abs(k - 1) < 1e-6 and abs(h - 1) < 1e-6
    k, h = _scale_factors("EPSG:3031", 45.0, -71.0)
    assert abs(k - 1) < 1e-6 and abs(h - 1) < 1e-6
    k, h = _scale_factors("EPSG:3413", 30.0, 80.0)
    assert abs(k - h) < 1e-6 and k < 1.0
    # north pole maps to the false origin for EPSG:3413 (lon_0 irrelevant)
    x, y = P.Transformer("EPSG:4326", "EPSG:3413").transform(17.0, 90.0)
    assert abs(x) < 1e-6 and abs(y) < 1e-6


def test_lambert93_absolute_geometry():
    # Independent absolute checks (not self-pins):
    # 1. the projection origin maps to the false origin by definition
    t = P.Transformer("EPSG:4326", "EPSG:2154")
    x0, y0 = t.transform(3.0, 46.5)
    assert abs(x0 - 700000) < 1e-6 and abs(y0 - 6600000) < 1e-6
    # 2. on a standard parallel (k=1) the projected arc length of a small
    #    lon step equals the ellipsoidal parallel arc to sub-mm relative
    a, f = P.ELLIPSOIDS["GRS80"]
    e2 = f * (2 - f)
    phi = np.deg2rad(49.0)
    nu = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
    dlon = 0.01
    x1, y1 = t.transform(2.0, 49.0)
    x2, y2 = t.transform(2.0 + dlon, 49.0)
    arc = nu * np.cos(phi) * np.deg2rad(dlon)
    assert abs(np.hypot(x2 - x1, y2 - y1) / arc - 1) < 1e-7
    # 3. meridian distance: projected length 46.5N->49N along lon_0 is
    #    slightly SHORTER than the ellipsoidal meridian arc (scale < 1
    #    strictly between the parallels, min k ≈ 1-(Δ/2)²/2 ≈ 0.99905 for
    #    5°-apart parallels → mean ≈ 0.9994)
    lats = np.linspace(46.5, 49.0, 2001)
    xs, ys = t.transform(np.full_like(lats, 3.0), lats)
    proj_len = np.hypot(np.diff(xs), np.diff(ys)).sum()
    p = np.deg2rad(lats)
    M = a * (1 - e2) / (1 - e2 * np.sin(p) ** 2) ** 1.5
    arc_len = np.trapz(M, p)
    assert 0.999 < proj_len / arc_len < 1.0


def test_cross_projection_transform():
    # LCC -> Albers directly (through geographic internally)
    t = P.Transformer("EPSG:2154", "+proj=aea +lat_1=44 +lat_2=49 +lat_0=46 +lon_0=3")
    x, y = t.transform(700000.0, 6600000.0)   # Lambert-93 false origin
    lon, lat = P.Transformer("+proj=aea +lat_1=44 +lat_2=49 +lat_0=46 +lon_0=3",
                             "EPSG:4326").transform(x, y)
    assert abs(lon - 3.0) < 1e-9 and abs(lat - 46.5) < 1e-9
