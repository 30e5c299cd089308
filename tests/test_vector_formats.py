"""Format-reader oracles: the test files are hand-crafted byte-by-byte from
the PUBLIC specs (RFC 7946, ESRI Shapefile TD 1998, OGC 12-128r14), so the
readers are checked for spec conformance, not self-consistency."""

import json
import sqlite3
import struct

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.core import geom, wkb
from gdal_ray.sources.vector_formats import (read_geojson, read_gpkg,
                                             read_shapefile)


def test_geojson_reader(tmp_path, ray_session):
    doc = {
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature",
             "properties": {"name": "sq", "pop": 7},
             "geometry": {"type": "Polygon", "coordinates":
                          [[[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]]]}},
            {"type": "Feature",
             "properties": {"name": "pt", "pop": 3},
             "geometry": {"type": "Point", "coordinates": [5.5, -1.25]}},
            {"type": "Feature",
             "properties": {"name": "mp", "pop": 1},
             "geometry": {"type": "MultiPolygon", "coordinates":
                          [[[[10, 10], [11, 10], [11, 11], [10, 10]]],
                           [[[20, 20], [21, 20], [21, 21], [20, 20]]]]}},
        ],
    }
    p = tmp_path / "layer.geojson"
    p.write_text(json.dumps(doc))
    rows = read_geojson(str(p)).take_all()
    assert [r["name"] for r in rows] == ["sq", "pt", "mp"]
    assert [r["pop"] for r in rows] == [7, 3, 1]
    g0 = wkb.loads(rows[0]["wkb"])
    assert g0["type"] == "Polygon"
    assert geom.polygon_area(g0["rings"]) == pytest.approx(4.0)
    g1 = wkb.loads(rows[1]["wkb"])
    assert tuple(g1["xy"]) == (5.5, -1.25)
    g2 = wkb.loads(rows[2]["wkb"])
    assert g2["type"] == "MultiPolygon" and len(g2["polys"]) == 2


def _write_shp(path, shapes):
    """Minimal spec-conformant .shp writer (test oracle only)."""
    recs = []
    for i, (stype, payload) in enumerate(shapes):
        content = struct.pack("<i", stype) + payload
        recs.append(struct.pack(">ii", i + 1, len(content) // 2) + content)
    body = b"".join(recs)
    flen_words = (100 + len(body)) // 2
    header = struct.pack(">i5ii", 9994, 0, 0, 0, 0, 0, flen_words)
    header += struct.pack("<ii", 1000, shapes[0][0] if shapes else 0)
    header += struct.pack("<8d", 0, 0, 100, 100, 0, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(header + body)


def _write_dbf(path, names, rows):
    fields = b""
    for n in names:
        fields += n.encode().ljust(11, b"\x00") + b"N" + b"\x00" * 4 \
            + bytes([10, 0]) + b"\x00" * 14
    hsize = 32 + 32 * len(names) + 1
    rsize = 1 + 10 * len(names)
    header = struct.pack("<B3BiHH20x", 3, 24, 1, 1, len(rows), hsize, rsize)
    body = b""
    for row in rows:
        body += b" " + b"".join(str(v).rjust(10).encode() for v in row)
    with open(path, "wb") as f:
        f.write(header + fields + b"\x0d" + body + b"\x1a")


def test_shapefile_reader(tmp_path, ray_session):
    # polygon with hole: outer CW (spec), hole CCW
    outer = [(0, 0), (0, 10), (10, 10), (10, 0), (0, 0)]        # CW (y-up)
    hole = [(2, 2), (8, 2), (8, 8), (2, 8), (2, 2)]             # CCW
    pts = outer + hole
    payload = struct.pack("<4d", 0, 0, 10, 10)
    payload += struct.pack("<ii", 2, len(pts))
    payload += struct.pack("<ii", 0, len(outer))
    payload += b"".join(struct.pack("<dd", x, y) for x, y in pts)
    point_payload = struct.pack("<dd", 42.5, -7.0)
    shp = tmp_path / "layer.shp"
    _write_shp(str(shp), [(5, payload)])
    _write_dbf(str(tmp_path / "layer.dbf"), ["CODE"], [[99]])
    rows = read_shapefile(str(shp)).take_all()
    assert len(rows) == 1
    assert rows[0]["CODE"] == 99
    g = wkb.loads(rows[0]["wkb"])
    assert g["type"] == "Polygon" and len(g["rings"]) == 2
    assert geom.polygon_area(g["rings"]) == pytest.approx(100 - 36)

    shp2 = tmp_path / "pts.shp"
    _write_shp(str(shp2), [(1, point_payload)])
    rows = read_shapefile(str(shp2)).take_all()
    g = wkb.loads(rows[0]["wkb"])
    assert tuple(g["xy"]) == (42.5, -7.0)


def test_gpkg_reader(tmp_path, ray_session):
    path = str(tmp_path / "layer.gpkg")
    con = sqlite3.connect(path)
    con.executescript("""
      CREATE TABLE gpkg_contents (table_name TEXT, data_type TEXT);
      CREATE TABLE gpkg_geometry_columns (table_name TEXT, column_name TEXT);
      CREATE TABLE zones (fid INTEGER PRIMARY KEY, label TEXT, geom BLOB);
      INSERT INTO gpkg_contents VALUES ('zones', 'features');
      INSERT INTO gpkg_geometry_columns VALUES ('zones', 'geom');
    """)
    raw = wkb.box(1, 1, 4, 3)
    # GPKG binary header: magic GP, version 0, flags=0x01 (LE, no envelope),
    # srs_id little-endian
    header = b"GP" + bytes([0, 0x01]) + struct.pack("<i", 4326)
    con.execute("INSERT INTO zones VALUES (1, 'a', ?)", (header + raw,))
    # with envelope (flags envelope code 1 -> 32 bytes)
    header2 = b"GP" + bytes([0, 0x03]) + struct.pack("<i", 4326) \
        + struct.pack("<4d", 1, 4, 1, 3)
    con.execute("INSERT INTO zones VALUES (2, 'b', ?)", (header2 + raw,))
    con.commit()
    con.close()
    rows = read_gpkg(path).take_all()
    assert len(rows) == 2
    assert sorted(r["label"] for r in rows) == ["a", "b"]
    for r in rows:
        g = wkb.loads(r["wkb"])
        assert geom.polygon_area(g["rings"]) == pytest.approx(6.0)


# ---------- FlatGeobuf ----------

class _FgbBuf:
    """Hand-built little-endian flatbuffer: parents are written at LOW
    addresses, children after them, and every uoffset is patched to point
    forward (the only direction uoffsets can encode)."""

    def __init__(self):
        self.b = bytearray()
        self._pend = {}

    def tell(self):
        return len(self.b)

    def raw(self, data: bytes):
        self.b += data

    def pack(self, fmt, *v):
        import struct
        self.b += struct.pack(fmt, *v)

    def pad(self, align):
        while len(self.b) % align:
            self.b += b"\x00"

    def uoff(self, key):
        """Reserve a u32 uoffset slot to be patched later."""
        self._pend[key] = self.tell()
        self.pack("<I", 0)

    def patch(self, key):
        """Point the reserved slot at the current position."""
        import struct
        pos = self._pend.pop(key)
        self.b[pos:pos + 4] = struct.pack("<I", self.tell() - pos)


def _fgb_column(buf, name, ctype):
    """Column table + vtable + name string; returns table position."""
    tpos = buf.tell()
    buf.pack("<i", -12)          # soffset: vtable sits 12 bytes after
    buf.uoff(("cname", tpos))    # +4 VT_NAME
    buf.pack("<B", ctype)        # +8 VT_TYPE
    buf.pad(4)                   # table occupies 12 bytes
    assert buf.tell() == tpos + 12
    buf.pack("<4H", 8, 12, 4, 8)  # vtable: size 8, tsize 12, name@4, type@8
    buf.patch(("cname", tpos))
    buf.pack("<I", len(name))
    buf.raw(name.encode())
    buf.pad(4)
    return tpos


def _build_fgb(features):
    """features: list of (x, y, name, pop) → a valid single-layer Point
    FlatGeobuf payload with columns name:string, pop:long."""
    import struct

    from gdal_ray.sources.vector_formats import FGB_MAGIC

    hdr = _FgbBuf()
    hdr.pack("<I", 4)                      # root uoffset → table at 4
    assert hdr.tell() == 4
    hdr.pack("<i", -20)                    # soffset (vtable at 24)
    hdr.pack("<Q", len(features))          # +4 VT_FEATURES_COUNT
    hdr.uoff("cols")                       # +12 VT_COLUMNS
    hdr.pack("<H", 0)                      # +16 VT_INDEX_NODE_SIZE
    hdr.pack("<B", 1)                      # +18 VT_GEOMETRY_TYPE = Point
    hdr.pad(4)                             # table size 20
    assert hdr.tell() == 24
    # vtable: slots 4..22 → size 24, table 20
    hdr.pack("<12H", 24, 20, 0, 0, 18, 0, 0, 0, 0, 12, 4, 16)
    hdr.patch("cols")
    hdr.pack("<I", 2)                      # 2 columns
    hdr.uoff("c0")
    hdr.uoff("c1")
    hdr.patch("c0")
    _fgb_column(hdr, "name", 11)           # String
    hdr.patch("c1")
    _fgb_column(hdr, "pop", 7)             # Long
    # NOTE: patch("c1") happens before writing col1 — patch both in order
    header = bytes(hdr.b)

    out = bytearray(FGB_MAGIC)
    out += struct.pack("<I", len(header)) + header
    for (x, y, name, pop) in features:
        f = _FgbBuf()
        f.pack("<I", 4)                    # root → Feature table at 4
        f.pack("<i", -12)                  # soffset (vtable at 16)
        f.uoff("geom")                     # +4 VT_GEOMETRY
        f.uoff("props")                    # +8 VT_PROPERTIES
        f.pad(4)
        assert f.tell() == 16
        f.pack("<4H", 8, 12, 4, 8)         # vtable
        f.patch("geom")
        gpos = f.tell()
        f.pack("<i", -12)                  # Geometry soffset (vtable right after)
        f.uoff("xy")                       # +4 VT_XY
        f.pack("<B", 1)                    # +8 VT_TYPE = Point
        f.pad(4)
        assert f.tell() == gpos + 12
        # Geometry vtable: slots 4..16 (ends,xy,z,m,t,tm,type)
        f.pack("<9H", 18, 12, 0, 4, 0, 0, 0, 0, 8)
        f.pad(4)
        # xy vector: length word then 8-aligned doubles
        while (f.tell() + 4) % 8:
            f.raw(b"\x00")
        f.patch("xy")
        f.pack("<I", 2)
        f.pack("<dd", x, y)
        f.patch("props")
        props = struct.pack("<HI", 0, len(name)) + name.encode() \
            + struct.pack("<Hq", 1, pop)
        f.pack("<I", len(props))
        f.raw(props)
        f.pad(4)
        out += struct.pack("<I", len(f.b)) + bytes(f.b)
    return bytes(out)


def _fgb_geom_table(f, xy, ends, gtype_byte=0, parts=None):
    """Write one Geometry table (ends/xy/type/parts) at the current position;
    returns its position. `ends` follows reference semantics: cumulative
    POINT counts per ring/part (geometrywriter.cpp e += numPoints)."""
    import struct
    gpos = f.tell()
    f.pack("<i", -20)                  # soffset (vtable at gpos+20)
    f.uoff(("ends", gpos))             # +4  VT_ENDS
    f.uoff(("xy", gpos))               # +8  VT_XY
    f.uoff(("parts", gpos))            # +12 VT_PARTS
    f.pack("<B", gtype_byte)           # +16 VT_TYPE
    f.pad(4)
    assert f.tell() == gpos + 20
    # vtable slots 4..18: ends@4, xy@8, type@16 (when present), parts@12
    f.pack("<10H", 20, 20, 4, 8, 0, 0, 0, 0, 16 if gtype_byte else 0, 12)
    if parts:
        f.patch(("parts", gpos))
        f.pack("<I", len(parts))
        ppos = []
        for i in range(len(parts)):
            ppos.append(f.tell())
            f.pack("<I", 0)            # placeholder uoffset
        sub = []
        for i, (pxy, pends) in enumerate(parts):
            loc = _fgb_geom_table(f, pxy, pends)
            sub.append(loc)
        for i, loc in enumerate(sub):
            f.b[ppos[i]:ppos[i] + 4] = struct.pack("<I", loc - ppos[i])
        f._pend.pop(("ends", gpos)); f._pend.pop(("xy", gpos))
        # zero out unused ends/xy field slots in the vtable
        f.b[gpos + 20 + 4:gpos + 20 + 8] = b"\x00\x00\x00\x00"
        return gpos
    f._pend.pop(("parts", gpos))
    f.b[gpos + 20 + 18:gpos + 20 + 20] = b"\x00\x00"   # no parts slot
    f.patch(("ends", gpos))
    f.pack("<I", len(ends))
    f.pack("<%dI" % len(ends), *ends)
    while (f.tell() + 4) % 8:
        f.raw(b"\x00")
    f.patch(("xy", gpos))
    flat = [c for pt in xy for c in pt]
    f.pack("<I", len(flat))
    f.pack("<%dd" % len(flat), *flat)
    return gpos


def _build_fgb_geoms(gtype, feats):
    """Minimal no-column FGB: feats = list of (xy_points, ends) or, for
    MultiPolygon, list of list-of-(xy, ends) parts."""
    import struct

    from gdal_ray.sources.vector_formats import FGB_MAGIC
    hdr = _FgbBuf()
    hdr.pack("<I", 4)
    hdr.pack("<i", -20)
    hdr.pack("<Q", len(feats))             # +4 VT_FEATURES_COUNT
    hdr.pack("<I", 0)                      # +12 (no columns uoff — slot zeroed)
    hdr.pack("<H", 0)                      # +16 VT_INDEX_NODE_SIZE
    hdr.pack("<B", gtype)                  # +18 VT_GEOMETRY_TYPE
    hdr.pad(4)
    hdr.pack("<12H", 24, 20, 0, 0, 18, 0, 0, 0, 0, 0, 4, 16)
    header = bytes(hdr.b)
    out = bytearray(FGB_MAGIC)
    out += struct.pack("<I", len(header)) + header
    for feat in feats:
        f = _FgbBuf()
        f.pack("<I", 4)
        f.pack("<i", -8)                   # Feature: soffset + geom uoff
        f.uoff("geom")
        f.pack("<3H", 8, 8, 4)             # vtable: geometry@4
        f.pad(4)
        f.patch("geom")
        if gtype == 6:
            _fgb_geom_table(f, None, None, gtype_byte=0, parts=feat)
        else:
            xy, ends = feat
            _fgb_geom_table(f, xy, ends)
        f.pad(4)
        out += struct.pack("<I", len(f.b)) + bytes(f.b)
    return bytes(out)


def test_flatgeobuf_polygon_with_hole():
    """ends are cumulative point counts (reference geometrywriter.cpp), not
    doubled coordinate indices — a 5+5 two-ring polygon keeps its hole."""
    from gdal_ray.core import wkb
    from gdal_ray.sources.vector_formats import parse_flatgeobuf_bytes
    shell = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]
    hole = [(2, 2), (4, 2), (4, 4), (2, 4), (2, 2)]
    payload = _build_fgb_geoms(3, [(shell + hole, [5, 10])])
    t = parse_flatgeobuf_bytes(payload)
    g = wkb.loads(t.column("wkb")[0].as_py())
    assert g["type"] == "Polygon"
    assert len(g["rings"]) == 2
    assert np.asarray(g["rings"][0]).shape == (5, 2)
    assert np.allclose(np.asarray(g["rings"][0]), shell)
    assert np.allclose(np.asarray(g["rings"][1]), hole)


def test_flatgeobuf_multilinestring():
    from gdal_ray.core import wkb
    from gdal_ray.sources.vector_formats import parse_flatgeobuf_bytes
    a = [(0, 0), (1, 1), (2, 0)]
    b = [(5, 5), (6, 6)]
    payload = _build_fgb_geoms(5, [(a + b, [3, 5])])
    t = parse_flatgeobuf_bytes(payload)
    g = wkb.loads(t.column("wkb")[0].as_py())
    assert g["type"] == "MultiLineString"
    assert len(g["lines"]) == 2
    assert np.allclose(np.asarray(g["lines"][0]), a)
    assert np.allclose(np.asarray(g["lines"][1]), b)


def test_flatgeobuf_multipolygon():
    from gdal_ray.core import wkb
    from gdal_ray.sources.vector_formats import parse_flatgeobuf_bytes
    p1 = [(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]
    p2shell = [(10, 10), (20, 10), (20, 20), (10, 20), (10, 10)]
    p2hole = [(12, 12), (14, 12), (14, 14), (12, 14), (12, 12)]
    payload = _build_fgb_geoms(6, [[(p1, [5]), (p2shell + p2hole, [5, 10])]])
    t = parse_flatgeobuf_bytes(payload)
    g = wkb.loads(t.column("wkb")[0].as_py())
    assert g["type"] == "MultiPolygon"
    assert len(g["polys"]) == 2
    assert len(g["polys"][0]) == 1 and len(g["polys"][1]) == 2
    assert np.allclose(np.asarray(g["polys"][1][1]), p2hole)


def test_flatgeobuf_parse_bytes():
    from gdal_ray.core import wkb
    from gdal_ray.sources.vector_formats import parse_flatgeobuf_bytes
    payload = _build_fgb([(1.5, 2.5, "alpha", 42), (-3.0, 7.25, "beta", -7)])
    t = parse_flatgeobuf_bytes(payload)
    assert t.column_names == ["name", "pop", "wkb"]
    assert t.column("name").to_pylist() == ["alpha", "beta"]
    assert t.column("pop").to_pylist() == [42, -7]
    g0 = wkb.loads(t.column("wkb")[0].as_py())
    assert g0["type"] == "Point"
    assert tuple(np.asarray(g0["xy"]).ravel()[:2]) == (1.5, 2.5)


def test_flatgeobuf_reader_pipeline(ray_session, tmp_path):
    from gdal_ray.sources.vector_formats import read_flatgeobuf
    p = tmp_path / "pts.fgb"
    p.write_bytes(_build_fgb([(10.0, 20.0, "a", 1), (30.0, 40.0, "b", 2)]))
    rows = read_flatgeobuf(str(p)).take_all()
    assert len(rows) == 2
    assert sorted(r["name"] for r in rows) == ["a", "b"]
