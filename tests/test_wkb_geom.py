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


# ---------- ISO WKB breadth: Z/M, EWKB SRID, curved + surface types ----------

def _wkb(code, body, bo="<"):
    import struct
    return struct.pack(bo + "BI" if bo == "<" else ">BI", 1 if bo == "<" else 0, code) + body


def test_wkb_z_roundtrip_point_line():
    g = {"type": "Point", "xy": np.array([1.5, 2.5]), "z": 7.25}
    b = wkb.dumps(g)
    # ISO code 1001 = PointZ
    import struct
    assert struct.unpack_from("<I", b, 1)[0] == 1001
    p = wkb.loads(b)
    assert p["z"] == 7.25 and tuple(p["xy"]) == (1.5, 2.5)

    xy = np.array([[0, 0], [1, 1], [2, 0]], float)
    z = np.array([10.0, 11.0, 12.0])
    ln = wkb.loads(wkb.dumps({"type": "LineString", "xy": xy, "z": z}))
    assert np.array_equal(ln["xy"], xy) and np.array_equal(ln["z"], z)


def test_wkb_zm_and_m_roundtrip():
    import struct
    xy = np.array([[0, 0], [3, 4]], float)
    g = {"type": "LineString", "xy": xy,
         "z": np.array([1.0, 2.0]), "m": np.array([5.0, 6.0])}
    b = wkb.dumps(g)
    assert struct.unpack_from("<I", b, 1)[0] == 3002  # LineStringZM
    p = wkb.loads(b)
    assert np.array_equal(p["z"], g["z"]) and np.array_equal(p["m"], g["m"])
    # M-only
    bm = wkb.dumps({"type": "Point", "xy": np.array([9.0, 8.0]), "m": 0.5})
    assert struct.unpack_from("<I", bm, 1)[0] == 2001
    assert wkb.loads(bm)["m"] == 0.5 and "z" not in wkb.loads(bm)


def test_wkb_polygon_z_roundtrip():
    ring = np.array([[0, 0], [4, 0], [4, 4], [0, 0]], float)
    z = [np.array([1.0, 2.0, 3.0, 1.0])]
    p = wkb.loads(wkb.dumps({"type": "Polygon", "rings": [ring], "z": z}))
    assert np.array_equal(p["rings"][0], ring)
    assert np.array_equal(p["z"][0], z[0])


def test_wkb_25d_flag_and_ewkb_srid():
    """PostGIS-style 2.5D flag (0x80000000) and EWKB SRID flag (0x20000000)."""
    import struct
    body = struct.pack("<3d", 1.0, 2.0, 3.0)
    g = wkb.loads(_wkb(0x80000001, body))
    assert g["z"] == 3.0 and tuple(g["xy"]) == (1.0, 2.0)
    # EWKB with SRID: flag + 4-byte srid before the coords
    b = struct.pack("<BI", 1, 0x20000001) + struct.pack("<I", 4326) + struct.pack("<2d", 5.0, 6.0)
    g2 = wkb.loads(b)
    assert tuple(g2["xy"]) == (5.0, 6.0)


def test_circularstring_semicircle_linearized():
    import struct
    # semicircle (0,0) -> (1,1) -> (2,0): center (1,0), r=1
    pts = [(0.0, 0.0), (1.0, 1.0), (2.0, 0.0)]
    body = struct.pack("<I", 3) + b"".join(struct.pack("<2d", *p) for p in pts)
    g = wkb.loads(_wkb(8, body))
    assert g["type"] == "LineString"
    xy = g["xy"]
    # endpoints exact, all points on the circle, enough segments for 4 deg step
    assert tuple(xy[0]) == pts[0] and tuple(xy[-1]) == pts[2]
    r = np.hypot(xy[:, 0] - 1.0, xy[:, 1])
    assert np.allclose(r, 1.0, atol=1e-9)
    assert len(xy) >= 180 // 4  # 45+ points for a 180-degree sweep
    # passes through the intermediate point's side (top half)
    assert xy[:, 1].max() > 0.99


def test_circularstring_collinear_and_cw():
    import struct
    # collinear -> straight polyline through the 3 points
    pts = [(0.0, 0.0), (1.0, 0.0), (2.0, 0.0)]
    body = struct.pack("<I", 3) + b"".join(struct.pack("<2d", *p) for p in pts)
    g = wkb.loads(_wkb(8, body))
    assert np.array_equal(g["xy"], np.array(pts))
    # clockwise arc (through the BOTTOM): (0,0)->(1,-1)->(2,0)
    pts = [(0.0, 0.0), (1.0, -1.0), (2.0, 0.0)]
    body = struct.pack("<I", 3) + b"".join(struct.pack("<2d", *p) for p in pts)
    xy = wkb.loads(_wkb(8, body))["xy"]
    assert xy[:, 1].min() < -0.99 and xy[:, 1].max() <= 1e-9


def test_compoundcurve_joint_dedup():
    import struct
    # CompoundCurve = LineString((0,0)->(2,0)) + arc (2,0)->(3,1)->(4,0)
    ls = _wkb(2, struct.pack("<I", 2) + struct.pack("<4d", 0, 0, 2, 0))
    arc = _wkb(8, struct.pack("<I", 3) + struct.pack("<6d", 2, 0, 3, 1, 4, 0))
    cc = _wkb(9, struct.pack("<I", 2) + ls + arc)
    g = wkb.loads(cc)
    assert g["type"] == "LineString"
    xy = g["xy"]
    # no duplicated joint vertex at (2,0)
    d = np.hypot(np.diff(xy[:, 0]), np.diff(xy[:, 1]))
    assert (d > 1e-12).all()
    assert tuple(xy[0]) == (0.0, 0.0) and tuple(xy[-1]) == (4.0, 0.0)


def test_curvepolygon_full_circle_area():
    import struct
    # CurvePolygon with one full-circle CircularString ring r=2 @ (5,5)
    pts = [(3.0, 5.0), (7.0, 5.0), (3.0, 5.0)]
    ring = _wkb(8, struct.pack("<I", 3) + b"".join(struct.pack("<2d", *p) for p in pts))
    cp = _wkb(10, struct.pack("<I", 1) + ring)
    g = wkb.loads(cp)
    assert g["type"] == "Polygon" and len(g["rings"]) == 1
    r0 = g["rings"][0]
    assert np.array_equal(r0[0], r0[-1])  # closed
    area = abs(geom.ring_area(r0)) if hasattr(geom, "ring_area") else None
    if area is None:
        x, y = r0[:, 0], r0[:, 1]
        area = 0.5 * abs(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))
    assert abs(area - np.pi * 4.0) / (np.pi * 4.0) < 0.005  # 4 deg step error


def test_triangle_tin_polyhedral_normalize():
    import struct
    def tri(x0):
        ring = struct.pack("<I", 4) + struct.pack(
            "<8d", x0, 0, x0 + 1, 0, x0, 1, x0, 0)
        return _wkb(17, struct.pack("<I", 1) + ring)
    # Triangle -> Polygon
    g = wkb.loads(tri(0))
    assert g["type"] == "Polygon" and len(g["rings"][0]) == 4
    # TIN(16) / PolyhedralSurface(15) -> MultiPolygon
    for code in (15, 16):
        ms = _wkb(code, struct.pack("<I", 2) + tri(0) + tri(5))
        m = wkb.loads(ms)
        assert m["type"] == "MultiPolygon" and len(m["polys"]) == 2


def test_multicurve_multisurface_normalize():
    import struct
    ls = _wkb(2, struct.pack("<I", 2) + struct.pack("<4d", 0, 0, 1, 1))
    arc = _wkb(8, struct.pack("<I", 3) + struct.pack("<6d", 0, 0, 1, 1, 2, 0))
    mc = wkb.loads(_wkb(11, struct.pack("<I", 2) + ls + arc))
    assert mc["type"] == "MultiLineString" and len(mc["lines"]) == 2
    ring = _wkb(8, struct.pack("<I", 3) + struct.pack("<6d", 0., 0., 2., 0., 0., 0.))
    cp = _wkb(10, struct.pack("<I", 1) + ring)
    msf = wkb.loads(_wkb(12, struct.pack("<I", 1) + cp))
    assert msf["type"] == "MultiPolygon" and len(msf["polys"]) == 1


def test_wkb_z_big_endian():
    import struct
    body = struct.pack(">I", 2) + struct.pack(">6d", 0, 0, 9, 1, 1, 10)
    b = struct.pack(">BI", 0, 1002) + body  # big-endian LineStringZ
    g = wkb.loads(b)
    assert np.array_equal(g["xy"], [[0, 0], [1, 1]])
    assert np.array_equal(g["z"], [9.0, 10.0])
