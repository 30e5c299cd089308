"""WKB geometry codec — the engine's wire format for geometry columns.

Matches the reference's choice of encoding geometry as WKB binary columns in
Arrow batches (``ogr/ogrsf_frmts/generic/ogrlayerarrow.cpp``; import/export at
``ogr/ogrgeometry.cpp:1501,1596``).  Supports the 2-D subset this engine
needs: Point, LineString, Polygon, MultiPoint, MultiLineString, MultiPolygon,
GeometryCollection; little- and big-endian parse, little-endian write.

Parsed representation (plain dicts/ndarrays, cheap to ship in batches):
  {"type": "Point",            "xy": (2,) float64}
  {"type": "LineString",       "xy": (N,2) float64}
  {"type": "Polygon",          "rings": [ (N,2) float64, ... ]}   # ring 0 = shell
  {"type": "MultiPolygon",     "polys": [ [rings], ... ]}
  {"type": "MultiPoint",       "xy": (N,2)}
  {"type": "MultiLineString",  "lines": [ (N,2), ... ]}
  {"type": "GeometryCollection", "geoms": [ parsed, ... ]}
"""

from __future__ import annotations

import struct

import numpy as np

_TYPES = {1: "Point", 2: "LineString", 3: "Polygon", 4: "MultiPoint",
          5: "MultiLineString", 6: "MultiPolygon", 7: "GeometryCollection"}
_CODES = {v: k for k, v in _TYPES.items()}


def _read_geom(buf: memoryview, off: int):
    byte_order = buf[off]
    bo = "<" if byte_order == 1 else ">"
    (gtype,) = struct.unpack_from(bo + "I", buf, off + 1)
    # strip 2.5D flag (0x80000000) and ISO Z/M/ZM offsets (1000/2000/3000);
    # Z/M ordinates are parsed but dropped (engine is 2-D, like the WKB
    # columns GDAL's GetArrowStream emits by default)
    base = gtype & 0x1FFFFFFF
    ndim = 2 + (1 if (gtype & 0x80000000) else 0)
    iso = base // 1000
    if iso in (1, 2):
        ndim = 3
    elif iso == 3:
        ndim = 4
    base = base % 1000
    name = _TYPES.get(base)
    if name is None:
        raise ValueError(f"unsupported wkb geometry type {gtype}")
    off += 5
    dt = np.dtype(bo + "f8")

    def read_pts(o, n):
        arr = np.frombuffer(buf, dtype=dt, count=n * ndim, offset=o).reshape(n, ndim)
        return np.ascontiguousarray(arr[:, :2], dtype=np.float64), o + n * ndim * 8

    if name == "Point":
        xy, off = read_pts(off, 1)
        return {"type": name, "xy": xy[0]}, off
    if name == "LineString":
        (n,) = struct.unpack_from(bo + "I", buf, off)
        xy, off = read_pts(off + 4, n)
        return {"type": name, "xy": xy}, off
    if name == "Polygon":
        (nr,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        rings = []
        for _ in range(nr):
            (n,) = struct.unpack_from(bo + "I", buf, off)
            xy, off = read_pts(off + 4, n)
            rings.append(xy)
        return {"type": name, "rings": rings}, off
    # multi-geometries: count then nested full WKB geoms
    (ng,) = struct.unpack_from(bo + "I", buf, off)
    off += 4
    parts = []
    for _ in range(ng):
        g, off = _read_geom(buf, off)
        parts.append(g)
    if name == "MultiPoint":
        return {"type": name, "xy": np.array([p["xy"] for p in parts], dtype=np.float64).reshape(-1, 2)}, off
    if name == "MultiLineString":
        return {"type": name, "lines": [p["xy"] for p in parts]}, off
    if name == "MultiPolygon":
        return {"type": name, "polys": [p["rings"] for p in parts]}, off
    return {"type": "GeometryCollection", "geoms": parts}, off


def loads(wkb: bytes):
    g, _ = _read_geom(memoryview(wkb), 0)
    return g


def _w_pts(out: list, xy: np.ndarray):
    out.append(np.ascontiguousarray(xy, dtype="<f8").tobytes())


def _dump_geom(g, out: list):
    t = g["type"]
    out.append(struct.pack("<BI", 1, _CODES[t]))
    if t == "Point":
        _w_pts(out, np.asarray(g["xy"], dtype=np.float64).reshape(1, 2))
    elif t == "LineString":
        xy = np.asarray(g["xy"], dtype=np.float64)
        out.append(struct.pack("<I", len(xy)))
        _w_pts(out, xy)
    elif t == "Polygon":
        out.append(struct.pack("<I", len(g["rings"])))
        for r in g["rings"]:
            r = np.asarray(r, dtype=np.float64)
            out.append(struct.pack("<I", len(r)))
            _w_pts(out, r)
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
