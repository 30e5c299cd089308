"""WKB geometry codec — the engine's wire format for geometry columns.

Matches the reference's choice of encoding geometry as WKB binary columns in
Arrow batches (``ogr/ogrsf_frmts/generic/ogrlayerarrow.cpp``; import/export at
``ogr/ogrgeometry.cpp:1501,1596``).  Parses the full ISO/EWKB type set
(``ogr/ogr_core.h:426-533``): the 7 flat types plus CircularString,
CompoundCurve, CurvePolygon, MultiCurve, MultiSurface, PolyhedralSurface,
TIN and Triangle, with 2.5D / ISO Z / M / ZM variants and the PostGIS EWKB
SRID flag.  Curved types are linearized on parse with OGR's default arc
step (4 degrees — ``ogr/ogrgeometryfactory.cpp`` curveToLineString /
OGR_ARC_STEPSIZE), so downstream operators always see the flat 7; surface
types (PolyhedralSurface/TIN) normalize to MultiPolygon, Triangle to
Polygon.  Z/M ordinates of the flat types are preserved on parse (extra
``z`` / ``m`` arrays alongside the 2-D ``xy``) and round-trip through
``dumps`` with ISO type codes; engine operators ignore them (the planar
engine is 2-D, like the WKB columns GDAL's GetArrowStream emits by
default).

Parsed representation (plain dicts/ndarrays, cheap to ship in batches):
  {"type": "Point",            "xy": (2,) float64 [, "z": scalar, "m": scalar]}
  {"type": "LineString",       "xy": (N,2) float64 [, "z": (N,), "m": (N,)]}
  {"type": "Polygon",          "rings": [ (N,2) float64, ... ]      # ring 0 = shell
                               [, "z": [ (N,), ... ], "m": ...]}
  {"type": "MultiPolygon",     "polys": [ [rings], ... ]}
  {"type": "MultiPoint",       "xy": (N,2)}
  {"type": "MultiLineString",  "lines": [ (N,2), ... ]}
  {"type": "GeometryCollection", "geoms": [ parsed, ... ]}
"""

from __future__ import annotations

import math
import struct

import numpy as np

_TYPES = {1: "Point", 2: "LineString", 3: "Polygon", 4: "MultiPoint",
          5: "MultiLineString", 6: "MultiPolygon", 7: "GeometryCollection"}
_CODES = {v: k for k, v in _TYPES.items()}
# ISO curved / surface types, linearized or normalized on parse
# (ogr/ogr_core.h: wkbCircularString=8 ... wkbTriangle=17).
_CURVED = {8: "CircularString", 9: "CompoundCurve", 10: "CurvePolygon",
           11: "MultiCurve", 12: "MultiSurface", 13: "Curve", 14: "Surface",
           15: "PolyhedralSurface", 16: "TIN", 17: "Triangle"}

# OGR's default max angle step when stroking arcs (degrees).
ARC_STEP_DEG = 4.0


def _stroke_arc(p0, p1, p2, step_deg: float = ARC_STEP_DEG) -> np.ndarray:
    """Linearize one 3-point circular arc (start, intermediate, end) to a
    polyline INCLUDING both endpoints, per SQL/MM CircularString semantics.
    Collinear points degrade to the two straight segments."""
    (x0, y0), (x1, y1), (x2, y2) = p0, p1, p2
    if x0 == x2 and y0 == y2:
        # SQL/MM full circle: p0 == p2, p1 diametrically opposed
        # (ogr/ogrcircularstring.cpp full-circle convention)
        cx, cy = (x0 + x1) / 2.0, (y0 + y1) / 2.0
    else:
        # circumcenter via perpendicular bisector solve
        d = 2.0 * (x0 * (y1 - y2) + x1 * (y2 - y0) + x2 * (y0 - y1))
        if abs(d) < 1e-12 * max(1.0, abs(x0) + abs(y0) + abs(x2) + abs(y2)):
            return np.array([p0, p1, p2], dtype=np.float64)
        s0, s1, s2 = x0 * x0 + y0 * y0, x1 * x1 + y1 * y1, x2 * x2 + y2 * y2
        cx = (s0 * (y1 - y2) + s1 * (y2 - y0) + s2 * (y0 - y1)) / d
        cy = (s0 * (x2 - x1) + s1 * (x0 - x2) + s2 * (x1 - x0)) / d
    r = math.hypot(x0 - cx, y0 - cy)
    a0 = math.atan2(y0 - cy, x0 - cx)
    a1 = math.atan2(y1 - cy, x1 - cx)
    a2 = math.atan2(y2 - cy, x2 - cx)
    # sweep direction: the arc runs a0 -> a2 passing through a1
    if x0 == x2 and y0 == y2:
        sweep = 2 * math.pi  # SQL/MM full circle (p0 == p2); CCW by convention
    else:
        ccw = (a1 - a0) % (2 * math.pi) <= (a2 - a0) % (2 * math.pi)
        if ccw:
            sweep = (a2 - a0) % (2 * math.pi)
        else:
            sweep = -((a0 - a2) % (2 * math.pi))
    nseg = max(2, int(math.ceil(abs(sweep) / math.radians(step_deg))))
    ang = a0 + sweep * np.arange(nseg + 1) / nseg
    pts = np.column_stack([cx + r * np.cos(ang), cy + r * np.sin(ang)])
    pts[0] = p0
    pts[-1] = p2
    return pts


def _linearize_circular(xy: np.ndarray) -> np.ndarray:
    """CircularString: odd point count, consecutive overlapping arc triples."""
    if len(xy) < 3:
        return np.asarray(xy, dtype=np.float64)
    out = [np.asarray(xy[:1], dtype=np.float64)]
    for i in range(0, len(xy) - 2, 2):
        out.append(_stroke_arc(xy[i], xy[i + 1], xy[i + 2])[1:])
    return np.vstack(out)


def _as_line(g) -> np.ndarray:
    """Any parsed curve component -> (N,2) polyline."""
    if g["type"] == "LineString":
        return g["xy"]
    raise ValueError(f"not a curve component: {g['type']}")


def _read_geom(buf: memoryview, off: int):
    byte_order = buf[off]
    bo = "<" if byte_order == 1 else ">"
    (gtype,) = struct.unpack_from(bo + "I", buf, off + 1)
    off += 5
    # PostGIS EWKB: SRID flag 0x20000000 inserts a 4-byte SRID after the type
    if gtype & 0x20000000:
        off += 4
    # strip 2.5D flag (0x80000000) and ISO Z/M/ZM offsets (1000/2000/3000)
    base = gtype & 0x1FFFFFFF
    has_z = bool(gtype & 0x80000000)
    has_m = False
    iso = base // 1000
    if iso == 1:
        has_z = True
    elif iso == 2:
        has_m = True
    elif iso == 3:
        has_z = has_m = True
    base = base % 1000
    ndim = 2 + int(has_z) + int(has_m)
    name = _TYPES.get(base) or _CURVED.get(base)
    if name is None:
        raise ValueError(f"unsupported wkb geometry type {gtype}")
    dt = np.dtype(bo + "f8")

    def read_pts(o, n):
        arr = np.frombuffer(buf, dtype=dt, count=n * ndim, offset=o).reshape(n, ndim)
        xy = np.ascontiguousarray(arr[:, :2], dtype=np.float64)
        z = np.ascontiguousarray(arr[:, 2], dtype=np.float64) if has_z else None
        m = np.ascontiguousarray(arr[:, 2 + int(has_z)], dtype=np.float64) if has_m else None
        return xy, z, m, o + n * ndim * 8

    def with_zm(d, z, m):
        if z is not None:
            d["z"] = z
        if m is not None:
            d["m"] = m
        return d

    if name == "Point":
        xy, z, m, off = read_pts(off, 1)
        return with_zm({"type": name, "xy": xy[0]},
                       z[0] if z is not None else None,
                       m[0] if m is not None else None), off
    if name in ("LineString", "CircularString"):
        (n,) = struct.unpack_from(bo + "I", buf, off)
        xy, z, m, off = read_pts(off + 4, n)
        if name == "CircularString":
            # linearized -> flat LineString; Z/M dropped (resampled points
            # have no well-defined source ordinate)
            return {"type": "LineString", "xy": _linearize_circular(xy)}, off
        return with_zm({"type": name, "xy": xy}, z, m), off
    if name in ("Polygon", "Triangle"):
        (nr,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        rings, zs, ms = [], [], []
        for _ in range(nr):
            (n,) = struct.unpack_from(bo + "I", buf, off)
            xy, z, m, off = read_pts(off + 4, n)
            rings.append(xy)
            zs.append(z)
            ms.append(m)
        d = {"type": "Polygon", "rings": rings}
        if has_z:
            d["z"] = zs
        if has_m:
            d["m"] = ms
        return d, off
    if name in ("CompoundCurve", "CurvePolygon"):
        # count, then nested full-WKB curve components / rings
        (nc,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        comps = []
        for _ in range(nc):
            g, off = _read_geom(buf, off)
            comps.append(g)
        if name == "CompoundCurve":
            pts = []
            for i, c in enumerate(comps):
                ln = _as_line(c)
                pts.append(ln if i == 0 else ln[1:])  # joints share a vertex
            xy = np.vstack(pts) if pts else np.empty((0, 2))
            return {"type": "LineString", "xy": xy}, off
        rings = []
        for c in comps:
            ln = np.asarray(_as_line(c), dtype=np.float64)
            if len(ln) and not np.array_equal(ln[0], ln[-1]):
                ln = np.vstack([ln, ln[:1]])  # close linearized ring
            rings.append(ln)
        return {"type": "Polygon", "rings": rings}, off
    # multi-geometries / surfaces: count then nested full WKB geoms
    (ng,) = struct.unpack_from(bo + "I", buf, off)
    off += 4
    parts = []
    for _ in range(ng):
        g, off = _read_geom(buf, off)
        parts.append(g)
    if name == "MultiPoint":
        return {"type": name, "xy": np.array([p["xy"] for p in parts], dtype=np.float64).reshape(-1, 2)}, off
    if name in ("MultiLineString", "MultiCurve"):
        return {"type": "MultiLineString", "lines": [_as_line(p) for p in parts]}, off
    if name in ("MultiPolygon", "MultiSurface", "PolyhedralSurface", "TIN"):
        return {"type": "MultiPolygon", "polys": [p["rings"] for p in parts]}, off
    return {"type": "GeometryCollection", "geoms": parts}, off


def loads(wkb: bytes):
    g, _ = _read_geom(memoryview(wkb), 0)
    return g


def _w_pts(out: list, xy: np.ndarray, z=None, m=None):
    xy = np.asarray(xy, dtype=np.float64).reshape(-1, 2)
    cols = [xy]
    if z is not None:
        cols.append(np.asarray(z, dtype=np.float64).reshape(-1, 1))
    if m is not None:
        cols.append(np.asarray(m, dtype=np.float64).reshape(-1, 1))
    arr = xy if len(cols) == 1 else np.hstack(cols)
    out.append(np.ascontiguousarray(arr, dtype="<f8").tobytes())


def _dump_geom(g, out: list):
    t = g["type"]
    has_z, has_m = "z" in g, "m" in g
    code = _CODES[t] + 1000 * int(has_z) + 2000 * int(has_m)  # ISO offsets
    out.append(struct.pack("<BI", 1, code))
    if t == "Point":
        _w_pts(out, np.asarray(g["xy"], dtype=np.float64).reshape(1, 2),
               g.get("z"), g.get("m"))
    elif t == "LineString":
        xy = np.asarray(g["xy"], dtype=np.float64)
        out.append(struct.pack("<I", len(xy)))
        _w_pts(out, xy, g.get("z"), g.get("m"))
    elif t == "Polygon":
        out.append(struct.pack("<I", len(g["rings"])))
        zs = g.get("z") or [None] * len(g["rings"])
        ms = g.get("m") or [None] * len(g["rings"])
        for r, z, m in zip(g["rings"], zs, ms):
            r = np.asarray(r, dtype=np.float64)
            out.append(struct.pack("<I", len(r)))
            _w_pts(out, r, z, m)
    elif t == "MultiPoint":
        xy = np.asarray(g["xy"], dtype=np.float64).reshape(-1, 2)
        out.append(struct.pack("<I", len(xy)))
        for p in xy:
            _dump_geom({"type": "Point", "xy": p}, out)
    elif t == "MultiLineString":
        out.append(struct.pack("<I", len(g["lines"])))
        for ln in g["lines"]:
            _dump_geom({"type": "LineString", "xy": ln}, out)
    elif t == "MultiPolygon":
        out.append(struct.pack("<I", len(g["polys"])))
        for rings in g["polys"]:
            _dump_geom({"type": "Polygon", "rings": rings}, out)
    elif t == "GeometryCollection":
        out.append(struct.pack("<I", len(g["geoms"])))
        for sub in g["geoms"]:
            _dump_geom(sub, out)
    else:
        raise ValueError(t)


def dumps(g) -> bytes:
    out: list = []
    _dump_geom(g, out)
    return b"".join(out)


def point(x: float, y: float) -> bytes:
    return dumps({"type": "Point", "xy": np.array([x, y])})


def polygon(shell, holes=()) -> bytes:
    rings = [np.asarray(shell, dtype=np.float64)]
    rings += [np.asarray(h, dtype=np.float64) for h in holes]
    return dumps({"type": "Polygon", "rings": rings})


def box(minx: float, miny: float, maxx: float, maxy: float) -> bytes:
    """Closed CCW rectangle polygon."""
    return polygon([(minx, miny), (maxx, miny), (maxx, maxy), (minx, maxy), (minx, miny)])


def as_polygons(g) -> list:
    """Normalize any parsed geometry to a list of polygon ring-lists."""
    t = g["type"]
    if t == "Polygon":
        return [g["rings"]]
    if t == "MultiPolygon":
        return list(g["polys"])
    if t == "GeometryCollection":
        out = []
        for sub in g["geoms"]:
            out.extend(as_polygons(sub))
        return out
    return []
