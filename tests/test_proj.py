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
