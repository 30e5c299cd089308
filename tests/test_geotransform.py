import numpy as np

from gdal_ray.core import geotransform as G


def test_apply_north_up():
    gt = G.north_up(440720.0, 3751320.0, 60.0, 60.0)
    x, y = G.apply(gt, 0, 0)
    assert (x, y) == (440720.0, 3751320.0)
    x, y = G.apply(gt, 20, 20)
    assert (x, y) == (440720.0 + 1200.0, 3751320.0 - 1200.0)


def test_invert_roundtrip_rotated():
    gt = (1000.0, 2.0, 0.3, 500.0, -0.1, -2.5)
    inv = G.invert(gt)
    px = np.array([0.0, 3.7, 100.2])
    py = np.array([0.0, 8.1, 55.5])
    x, y = G.apply(gt, px, py)
    px2, py2 = G.apply(inv, x, y)
    np.testing.assert_allclose(px2, px, atol=1e-9)
    np.testing.assert_allclose(py2, py, atol=1e-9)


def test_bounds():
    gt = G.north_up(10.0, 50.0, 0.1, 0.1)
    b = G.bounds(gt, 100, 200)
    assert b == (10.0, 30.0, 20.0, 50.0)
