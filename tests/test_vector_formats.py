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
