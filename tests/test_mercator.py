"""Pin the tile math to the reference's closed-form values
(gdal2tiles.py:316-533 GlobalMercator)."""

import numpy as np

from gdal_ray.core import mercator as M


def test_constants():
    assert M.ORIGIN_SHIFT == 20037508.342789244
    assert M.initial_resolution() == 156543.03392804097 or abs(M.initial_resolution() - 156543.03392804062) < 1e-6


def test_latlon_meters_roundtrip():
    lat = np.array([0.0, 45.0, -60.0, 85.0511287798066])
    lon = np.array([0.0, 120.5, -179.9, 13.37])
    mx, my = M.latlon_to_meters(lat, lon)
    lat2, lon2 = M.meters_to_latlon(mx, my)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    # known value: lon 180 -> originShift
    mx, _ = M.latlon_to_meters(0.0, 180.0)
    assert abs(float(mx) - M.ORIGIN_SHIFT) < 1e-6


def test_pixels_to_tile_ceil_rule():
    # ceil(p/256)-1: pixel 0..256 -> tile -1? py=0 -> ceil(0)-1 = -1 per reference
    tx, ty = M.pixels_to_tile(np.array([0.0, 1.0, 256.0, 256.5, 512.0]),
                              np.array([0.0, 255.9, 256.0, 300.0, 513.0]))
    assert tx.tolist() == [-1, 0, 0, 1, 1]
    assert ty.tolist() == [-1, 0, 0, 1, 2]


def test_tile_bounds_inverse():
    minx, miny, maxx, maxy = M.tile_bounds(0, 0, 0)
    assert abs(float(minx) + M.ORIGIN_SHIFT) < 1e-6
    assert abs(float(maxx) - M.ORIGIN_SHIFT) < 1e-6
    # zoom 1 quadrants
    minx, miny, maxx, maxy = M.tile_bounds(1, 1, 1)
    assert abs(float(minx)) < 1e-6 and abs(float(miny)) < 1e-6


def test_zoom_for_pixel_size():
    assert M.zoom_for_pixel_size(200000.0) == 0
    r5 = float(M.resolution(5))
    assert M.zoom_for_pixel_size(r5 * 1.001) == 4
    assert M.zoom_for_pixel_size(r5 * 0.999) == 5


def test_xyz_flip_involution():
    tx, ty = M.tms_to_xyz(3, 5, 4)
    assert (int(tx), int(ty)) == (3, 2**4 - 1 - 5)
    _, ty2 = M.tms_to_xyz(tx, ty, 4)
    assert int(ty2) == 5


def test_quadkey():
    # quadkey of google tile (0,0) zoom1 == "0" region; spot values
    assert M.quadkey(0, 1, 1) == "0"   # TMS (0,1) -> google (0,0)
    assert M.quadkey(1, 1, 1) == "1"
    assert M.quadkey(0, 0, 1) == "2"
    assert M.quadkey(1, 0, 1) == "3"
    assert len(M.quadkey(35210, 21493, 16)) == 16


def test_tile_key_roundtrip():
    z = np.array([0, 7, 18])
    x = np.array([0, 100, 200000])
    y = np.array([0, 5, 150000])
    k = M.tile_key(z, x, y)
    z2, x2, y2 = M.tile_unkey(k)
    np.testing.assert_array_equal(z2, z)
    np.testing.assert_array_equal(x2, x)
    np.testing.assert_array_equal(y2, y)
