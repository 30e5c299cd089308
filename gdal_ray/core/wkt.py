"""WKT geometry codec — OGR ``exportToWkt`` / ``importFromWkt`` analog.

Round-trips the same parsed-dict model as :mod:`gdal_ray.core.wkb`
(``ogr/ogrgeometry.cpp:exportToWkt,importFromWkt``): the 7 flat types with
ISO Z / M / ZM ordinate variants and EMPTY, plus TRIANGLE (normalized to
Polygon), POLYHEDRALSURFACE / TIN (normalized to MultiPolygon) and
CIRCULARSTRING (linearized with the same 4-degree arc step the WKB parser
uses).  Output follows OGR's ISO WKT formatting: ``POINT Z (1 2 3)``,
``LINESTRING EMPTY``, shortest-roundtrip float formatting (OGR's
OGRFormatDouble trims trailing zeros)."""

from __future__ import annotations

import math
import re

import numpy as np

from . import wkb as _wkb

__all__ = ["dumps_wkt", "loads_wkt", "format_double"]


# ---------- formatting ----------

def format_double(v: float) -> str:
    """Shortest decimal that round-trips (repr), integers without '.0' —
    matches OGR's trimmed OGRFormatDouble output for exact values.
    Non-finite values print as nan/inf/-inf (float() parses them back)."""
    f = float(v)
    if not math.isfinite(f):
        return repr(f)          # 'nan' / 'inf' / '-inf'
    if f == int(f) and abs(f) < 1e15:
        return str(int(f))
    return repr(f)


_num = format_double


def _coords(xy, z=None, m=None) -> str:
    xy = np.asarray(xy, dtype=np.float64).reshape(-1, 2)
    zs = None if z is None else np.asarray(z, dtype=np.float64).reshape(-1)
    ms = None if m is None else np.asarray(m, dtype=np.float64).reshape(-1)
    parts = []
    for i in range(len(xy)):
        p = [_num(xy[i, 0]), _num(xy[i, 1])]
        if zs is not None:
            p.append(_num(zs[i]))
        if ms is not None:
            p.append(_num(ms[i]))
        parts.append(" ".join(p))
    return ", ".join(parts)


def _zm_tag(g) -> str:
    has_z, has_m = "z" in g, "m" in g
    if has_z and has_m:
        return " ZM"
    if has_z:
        return " Z"
    if has_m:
        return " M"
    return ""


def dumps_wkt(g) -> str:
    """Parsed geometry dict -> ISO WKT string."""
    t = g["type"]
    tag = _zm_tag(g)
    if t == "Point":
        xy = np.asarray(g["xy"], dtype=np.float64).reshape(2)
        if not np.isfinite(xy).all():
            # the wkb-model EMPTY-point convention (NaN ordinates) —
            # OGR exports it as POINT EMPTY
            return "POINT EMPTY"
        return ("POINT" + tag + " (" +
                _coords(np.asarray(g["xy"]).reshape(1, 2),
                        None if "z" not in g else [g["z"]],
                        None if "m" not in g else [g["m"]]) + ")")
    if t == "LineString":
        xy = np.asarray(g["xy"], dtype=np.float64).reshape(-1, 2)
        if len(xy) == 0:
            return "LINESTRING EMPTY"
        return ("LINESTRING" + tag + " (" +
                _coords(xy, g.get("z"), g.get("m")) + ")")
    if t == "Polygon":
        if not g["rings"]:
            return "POLYGON EMPTY"
        zs = g.get("z") or [None] * len(g["rings"])
        ms = g.get("m") or [None] * len(g["rings"])
        rr = ", ".join("(" + _coords(r, z, m) + ")"
                       for r, z, m in zip(g["rings"], zs, ms))
        return "POLYGON" + tag + " (" + rr + ")"
    if t == "MultiPoint":
        xy = np.asarray(g["xy"], dtype=np.float64).reshape(-1, 2)
        if len(xy) == 0:
            return "MULTIPOINT EMPTY"
        # OGR ISO style: each member point parenthesized
        return ("MULTIPOINT (" +
                ", ".join("(" + _coords(p.reshape(1, 2)) + ")" for p in xy)
                + ")")
    if t == "MultiLineString":
        if not g["lines"]:
            return "MULTILINESTRING EMPTY"
        return ("MULTILINESTRING (" +
                ", ".join("(" + _coords(ln) + ")" for ln in g["lines"]) + ")")
    if t == "MultiPolygon":
        if not g["polys"]:
            return "MULTIPOLYGON EMPTY"
        pp = ", ".join(
            "(" + ", ".join("(" + _coords(r) + ")" for r in rings) + ")"
            for rings in g["polys"])
        return "MULTIPOLYGON (" + pp + ")"
    if t == "GeometryCollection":
        if not g["geoms"]:
            return "GEOMETRYCOLLECTION EMPTY"
        return ("GEOMETRYCOLLECTION (" +
                ", ".join(dumps_wkt(s) for s in g["geoms"]) + ")")
    raise ValueError(f"cannot export geometry type {t!r} to WKT")


# ---------- parsing ----------

_TOKEN = re.compile(r"\s*([A-Za-z]+|\(|\)|,|[-+0-9.eE]+)")


class _Tok:
    def __init__(self, s: str):
        self.s = s
        self.pos = 0

    def peek(self) -> str | None:
        m = _TOKEN.match(self.s, self.pos)
        return m.group(1) if m else None

    def next(self) -> str:
        m = _TOKEN.match(self.s, self.pos)
        if not m:
            raise ValueError(f"unexpected end of WKT at {self.pos}")
        self.pos = m.end()
        return m.group(1)

    def expect(self, tok: str):
        got = self.next()
        if got != tok:
            raise ValueError(f"expected {tok!r}, got {got!r} at {self.pos}")


def _read_pos_list(tk: _Tok, ndim: int) -> np.ndarray:
    """'(' x y [z] [m] (',' ...)* ')' -> (N, ndim) array."""
    tk.expect("(")
    vals: list[float] = []
    n = 0
    while True:
        row = []
        while True:
            t = tk.peek()
            if t in (",", ")"):
                break
            row.append(float(tk.next()))
        if ndim and len(row) != ndim:
            raise ValueError(f"expected {ndim} ordinates, got {len(row)}")
        vals.extend(row)
        n += 1
        if tk.next() == ")":
            break
    return np.asarray(vals, dtype=np.float64).reshape(n, ndim or len(row))


def _split_pts(arr: np.ndarray, has_z: bool, has_m: bool):
    xy = np.ascontiguousarray(arr[:, :2])
    z = np.ascontiguousarray(arr[:, 2]) if has_z else None
    m = np.ascontiguousarray(arr[:, 2 + int(has_z)]) if has_m else None
    return xy, z, m


def _with_zm(d: dict, z, m) -> dict:
    if z is not None:
        d["z"] = z
    if m is not None:
        d["m"] = m
    return d


_EMPTIES = {
    "POINT": lambda: {"type": "Point",
                      "xy": np.array([np.nan, np.nan])},
    "LINESTRING": lambda: {"type": "LineString",
                           "xy": np.empty((0, 2), dtype=np.float64)},
    "POLYGON": lambda: {"type": "Polygon", "rings": []},
    "MULTIPOINT": lambda: {"type": "MultiPoint",
                           "xy": np.empty((0, 2), dtype=np.float64)},
    "MULTILINESTRING": lambda: {"type": "MultiLineString", "lines": []},
    "MULTIPOLYGON": lambda: {"type": "MultiPolygon", "polys": []},
    "GEOMETRYCOLLECTION": lambda: {"type": "GeometryCollection",
                                   "geoms": []},
    "TRIANGLE": lambda: {"type": "Polygon", "rings": []},
    "CIRCULARSTRING": lambda: {"type": "LineString",
                               "xy": np.empty((0, 2), dtype=np.float64)},
    "POLYHEDRALSURFACE": lambda: {"type": "MultiPolygon", "polys": []},
    "TIN": lambda: {"type": "MultiPolygon", "polys": []},
}


def _parse_geom(tk: _Tok) -> dict:
    name = tk.next().upper()
    has_z = has_m = False
    t = tk.peek()
    # ISO dimension tag: Z / M / ZM as separate word(s)
    if t is not None and t.upper() in ("Z", "M", "ZM"):
        word = tk.next().upper()
        has_z = "Z" in word
        has_m = "M" in word
        t = tk.peek()
    if t is not None and t.upper() == "EMPTY":
        tk.next()
        if name not in _EMPTIES:
            raise ValueError(f"unsupported WKT type {name}")
        return _EMPTIES[name]()
    ndim = 2 + int(has_z) + int(has_m)

    if name == "POINT":
        arr = _read_pos_list(tk, ndim)
        xy, z, m = _split_pts(arr, has_z, has_m)
        return _with_zm({"type": "Point", "xy": xy[0]},
                        None if z is None else float(z[0]),
                        None if m is None else float(m[0]))
    if name in ("LINESTRING", "CIRCULARSTRING"):
        arr = _read_pos_list(tk, ndim)
        xy, z, m = _split_pts(arr, has_z, has_m)
        if name == "CIRCULARSTRING":
            return {"type": "LineString",
                    "xy": _wkb._linearize_circular(xy)}
        return _with_zm({"type": "LineString", "xy": xy}, z, m)
    if name in ("POLYGON", "TRIANGLE"):
        tk.expect("(")
        rings, zs, ms = [], [], []
        while True:
            arr = _read_pos_list(tk, ndim)
            xy, z, m = _split_pts(arr, has_z, has_m)
            rings.append(xy)
            zs.append(z)
            ms.append(m)
            if tk.next() == ")":
                break
        d = {"type": "Polygon", "rings": rings}
        if has_z:
            d["z"] = zs
        if has_m:
            d["m"] = ms
        return d
    if name == "MULTIPOINT":
        # both '(1 2, 3 4)' and '((1 2), (3 4))' forms occur in the wild
        tk.expect("(")
        pts = []
        while True:
            if tk.peek() == "(":
                arr = _read_pos_list(tk, ndim)
                pts.append(arr[0])
            else:
                row = []
                while tk.peek() not in (",", ")"):
                    row.append(float(tk.next()))
                pts.append(np.asarray(row, dtype=np.float64))
            if tk.next() == ")":
                break
        xy = np.asarray([p[:2] for p in pts], dtype=np.float64).reshape(-1, 2)
        return {"type": "MultiPoint", "xy": xy}
    if name == "MULTILINESTRING":
        tk.expect("(")
        lines = []
        while True:
            arr = _read_pos_list(tk, ndim)
            lines.append(np.ascontiguousarray(arr[:, :2]))
            if tk.next() == ")":
                break
        return {"type": "MultiLineString", "lines": lines}
    if name in ("MULTIPOLYGON", "POLYHEDRALSURFACE", "TIN"):
        tk.expect("(")
        polys = []
        while True:
            tk.expect("(")
            rings = []
            while True:
                arr = _read_pos_list(tk, ndim)
                rings.append(np.ascontiguousarray(arr[:, :2]))
                if tk.next() == ")":
                    break
            polys.append(rings)
            if tk.next() == ")":
                break
        return {"type": "MultiPolygon", "polys": polys}
    if name == "GEOMETRYCOLLECTION":
        tk.expect("(")
        geoms = []
        while True:
            geoms.append(_parse_geom(tk))
            if tk.next() == ")":
                break
        return {"type": "GeometryCollection", "geoms": geoms}
    raise ValueError(f"unsupported WKT type {name}")


def loads_wkt(s: str) -> dict:
    """ISO WKT string -> parsed geometry dict (wkb.py model)."""
    tk = _Tok(s)
    g = _parse_geom(tk)
    return g
