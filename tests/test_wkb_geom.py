"""WKB codec + geometry predicates vs brute-force/closed-form oracles
(semantics per ogr/ogrgeometry.cpp Intersects/Within/Contains)."""

import numpy as np
import pytest

from gdal_ray.core import geom, wkb


def square(x0=0.0, y0=0.0, s=10.0):
    return np.array([[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s], [x0, y0]])


def test_wkb_roundtrip_polygon():
    g = {"type": "Polygon", "rings": [square(), square(2, 2, 3)]}
    data = wkb.dumps(g)
    g2 = wkb.loads(data)
    assert g2["type"] == "Polygon"
    assert len(g2["rings"]) == 2
    np.testing.assert_allclose(g2["rings"][0], g["rings"][0])


def test_wkb_point_multipolygon():
    p = wkb.loads(wkb.point(1.5, -2.5))
    assert p["type"] == "Point"
    np.testing.assert_allclose(p["xy"], [1.5, -2.5])
    mp = {"type": "MultiPolygon", "polys": [[square()], [square(20, 20)]]}
    g2 = wkb.loads(wkb.dumps(mp))
    assert len(g2["polys"]) == 2
    assert wkb.as_polygons(g2)[1][0][0, 0] == 20.0


def test_wkb_big_endian_parse():
    import struct
    # hand-build big-endian point
    be = struct.pack(">BI", 0, 1) + struct.pack(">dd", 3.0, 4.0)
    g = wkb.loads(be)
    np.testing.assert_allclose(g["xy"], [3.0, 4.0])


def test_point_location_square():
    rings = [square()]
    px = np.array([5.0, 0.0, -1.0, 10.0, 5.0])
    py = np.array([5.0, 5.0, 5.0, 10.0, 0.0])
    loc = geom.locate_points(px, py, rings)
    assert loc.tolist() == [2, 1, 0, 1, 1]


def test_point_in_polygon_with_hole():
    rings = [square(), square(3, 3, 4)]  # hole 3..7
    px = np.array([1.0, 5.0, 3.0])
    py = np.array([1.0, 5.0, 5.0])
    loc = geom.locate_points(px, py, rings)
    assert loc.tolist() == [2, 0, 1]  # inside, in-hole, on hole boundary


def test_within_vs_intersects_boundary_semantics():
    rings = [square()]
    # boundary point: intersects yes, within no (SFS)
    assert geom.points_intersect_polygon(np.array([0.0]), np.array([4.0]), rings)[0]
    assert not geom.points_within_polygon(np.array([0.0]), np.array([4.0]), rings)[0]


def test_concave_pip_bruteforce():
    rng = np.random.default_rng(5)
    t = np.linspace(0, 2 * np.pi, 14, endpoint=False)
    rad = np.where(np.arange(14) % 2 == 0, 10.0, 4.0)
    ring = np.column_stack([rad * np.cos(t), rad * np.sin(t)])
    ring = np.vstack([ring, ring[:1]])
    pts = rng.uniform(-12, 12, size=(500, 2))

    def slow_pip(p):
        x, y = p
        c = False
        for i in range(len(ring) - 1):
            x1, y1 = ring[i]; x2, y2 = ring[i + 1]
            if (y1 > y) != (y2 > y):
                xin = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
                if x < xin:
                    c = not c
        return c

    got = geom.points_in_ring(pts[:, 0], pts[:, 1], ring)
    expect = np.array([slow_pip(p) for p in pts])
    np.testing.assert_array_equal(got, expect)


def test_polygons_intersect_cases():
    a = [square(0, 0, 10)]
    assert geom.polygons_intersect(a, [square(5, 5, 10)])      # overlap
    assert geom.polygons_intersect(a, [square(10, 0, 5)])      # edge touch
    assert geom.polygons_intersect(a, [square(2, 2, 3)])       # containment
    assert geom.polygons_intersect([square(2, 2, 3)], a)       # reversed
    assert not geom.polygons_intersect(a, [square(20, 20, 3)])  # disjoint
    # hole: B inside A's hole -> disjoint
    holed = [square(0, 0, 10), square(2, 2, 6)]
    assert not geom.polygons_intersect(holed, [square(4, 4, 1)])


def test_polygon_contains():
    a = [square(0, 0, 10)]
    assert geom.polygon_contains_polygon(a, [square(2, 2, 3)])
    assert not geom.polygon_contains_polygon(a, [square(8, 8, 5)])   # partial
    assert not geom.polygon_contains_polygon(a, [square(20, 0, 2)])  # outside
    # shares edge but inside: contains per closure semantics
    assert geom.polygon_contains_polygon(a, [square(0, 0, 5)])


def test_area_centroid():
    rings = [square(0, 0, 10), square(2, 2, 2)]
    assert abs(geom.polygon_area(rings) - (100 - 4)) < 1e-12
    cx, cy = geom.polygon_centroid([square(0, 0, 10)])
    assert abs(cx - 5) < 1e-12 and abs(cy - 5) < 1e-12


def test_distance():
    d = geom.distance_point_polygon(np.array([15.0, 5.0]), np.array([5.0, 5.0]), [square()])
    np.testing.assert_allclose(d, [5.0, 0.0])


def test_simplify_keeps_extremes():
    t = np.linspace(0, np.pi, 50)
    line = np.column_stack([t * 10, np.sin(t)])
    out = geom.simplify_line(line, 0.5)
    assert len(out) < 10
    np.testing.assert_allclose(out[0], line[0])
    np.testing.assert_allclose(out[-1], line[-1])


def test_segmentize():
    line = np.array([[0.0, 0.0], [10.0, 0.0]])
    out = geom.segmentize_line(line, 3.0)
    assert len(out) == 5  # 0, 2.5, 5, 7.5, 10
    assert np.all(np.diff(out[:, 0]) <= 3.0 + 1e-12)


def test_convex_hull():
    rng = np.random.default_rng(9)
    pts = rng.uniform(0, 10, size=(100, 2))
    pts = np.vstack([pts, [[0, 0], [10, 0], [10, 10], [0, 10]]])
    hull = geom.convex_hull(pts)
    # all points inside or on hull
    loc = geom.locate_points(pts[:, 0], pts[:, 1], [hull])
    assert (loc >= 1).all()
    assert abs(geom.ring_area(hull)) <= 100.0 + 1e-9


def test_representative_point_concave():
    # C-shape whose centroid is outside
    ring = np.array([[0, 0], [10, 0], [10, 2], [2, 2], [2, 8], [10, 8],
                     [10, 10], [0, 10], [0, 0]], dtype=np.float64)
    rx, ry = geom.representative_point([ring])
    assert geom.locate_points(np.array([rx]), np.array([ry]), [ring])[0] == 2


def test_buffer_point():
    ring = geom.buffer_point(0, 0, 5.0)
    assert abs(abs(geom.ring_area(ring)) - np.pi * 25) / (np.pi * 25) < 0.01


def test_buffer_polygon_round_joins():
    """Round-join buffer via the overlay engine: square dilation area
    s² + 4sd + πd² (round corners), erosion (s-2d)² exact, concave-safe."""
    from gdal_ray.core import overlay as OV
    from gdal_ray.core.geom import buffer_polygon
    sq = [np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)]
    out = buffer_polygon(sq, 1.0, quadsegs=16)
    a = OV.area_of(out)
    expect = 100 + 40 + np.pi
    assert abs(a - expect) / expect < 0.01
    ero = buffer_polygon(sq, -2.0, quadsegs=16)
    assert abs(OV.area_of(ero) - 36.0) < 0.4
    # concave L: buffer area strictly grows, erosion strictly shrinks
    L = [np.array([[0, 0], [10, 0], [10, 4], [4, 4], [4, 10], [0, 10],
                   [0, 0]], float)]
    grown = OV.area_of(buffer_polygon(L, 1.0, quadsegs=8))
    base = OV.area_of([L])
    shrunk = OV.area_of(buffer_polygon(L, -0.5, quadsegs=8))
    assert grown > base > shrunk > 0


def test_buffer_polygons_stage():
    import pyarrow as pa

    from gdal_ray.core import wkb as W
    from gdal_ray.stages.vector import buffer_polygons
    ring = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float)
    t = pa.table({"fid": ["a"],
                  "wkb": pa.array([W.dumps({"type": "Polygon",
                                            "rings": [ring]})], pa.binary())})
    out = buffer_polygons(t, 0.5)
    polys = W.as_polygons(W.loads(out.column("wkb")[0].as_py()))
    from gdal_ray.core import overlay as OV
    a = OV.area_of(polys)
    expect = 16 + 4 * 4 * 0.5 + np.pi * 0.25
    assert abs(a - expect) / expect < 0.02
