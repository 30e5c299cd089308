"""Vector format writers: GeoJSON + GeoPackage — the export half of the
reference's OGR drivers (``ogr/ogrsf_frmts/geojson/ogrgeojsonwriter.cpp``,
``ogr/ogrsf_frmts/gpkg/ogrgeopackagetablelayer.cpp``), paired with the
readers in ``vector_formats.py`` so ogr2ogr-style round trips work.

Ray shape: file-per-block sinks — each ``map_batches`` task serializes its
batch to ONE self-contained file (a GeoJSON FeatureCollection / a complete
.gpkg database) named by a content hash, and emits a manifest row
(path, n_features, n_bytes).  Content-hash names make re-runs idempotent
(same data → same file, atomically replaced) and nothing funnels through the
driver.  All serialization is pure stdlib (json / sqlite3) against the
public specs: RFC 7946 and OGC 12-128r14.
"""

from __future__ import annotations

import hashlib
import json
import os
import sqlite3
import struct

import numpy as np
import pyarrow as pa

from ..core import wkb


# ---------- GeoJSON ----------

def geom_to_geojson(g: dict) -> dict:
    """Parsed geometry (the ``wkb.loads`` form) → RFC 7946 geometry dict.
    Z is kept as the third position element; M has no GeoJSON
    representation and is dropped (OGR's writer does the same)."""
    t = g["type"]

    def pos(xy, z=None):
        xy = np.asarray(xy, dtype=np.float64).reshape(-1, 2)
        if z is None:
            return xy.tolist()
        z = np.asarray(z, dtype=np.float64).reshape(-1)
        return np.hstack([xy, z[:, None]]).tolist()

    if t == "Point":
        p = pos(g["xy"], g.get("z"))[0]
        return {"type": "Point", "coordinates": p}
    if t == "LineString":
        return {"type": "LineString", "coordinates": pos(g["xy"], g.get("z"))}
    if t == "Polygon":
        zs = g.get("z") or [None] * len(g["rings"])
        return {"type": "Polygon",
                "coordinates": [pos(r, z) for r, z in zip(g["rings"], zs)]}
    if t == "MultiPoint":
        return {"type": "MultiPoint", "coordinates": pos(g["xy"])}
    if t == "MultiLineString":
        return {"type": "MultiLineString",
                "coordinates": [pos(ln) for ln in g["lines"]]}
    if t == "MultiPolygon":
        return {"type": "MultiPolygon",
                "coordinates": [[pos(r) for r in rings]
                                for rings in g["polys"]]}
    if t == "GeometryCollection":
        return {"type": "GeometryCollection",
                "geometries": [geom_to_geojson(s) for s in g["geoms"]]}
    raise ValueError(f"cannot express {t} in GeoJSON")


def geojson_bytes(tab: pa.Table, *, wkb_col: str = "wkb") -> bytes:
    """Serialize a (attributes…, wkb) table to an RFC 7946
    FeatureCollection.  Inverse of ``vector_formats.parse_geojson_bytes``."""
    names = [c for c in tab.column_names if c != wkb_col]
    feats = []
    wkbs = tab.column(wkb_col).to_pylist()
    cols = {c: tab.column(c).to_pylist() for c in names}
    for i in range(tab.num_rows):
        geometry = None if wkbs[i] is None \
            else geom_to_geojson(wkb.loads(wkbs[i]))
        feats.append({"type": "Feature",
                      "properties": {c: cols[c][i] for c in names},
                      "geometry": geometry})
    return json.dumps({"type": "FeatureCollection", "features": feats},
                      default=str, separators=(",", ":")).encode()


# ---------- GeoPackage ----------

_GPKG_LAST_CHANGE = "2000-01-01T00:00:00.000Z"  # fixed → deterministic bytes


def wkb_to_gpkg_blob(data: bytes | None, *, srs_id: int = 4326) -> bytes | None:
    """Standard WKB → GeoPackage binary blob (OGC 12-128r14 §2.1.3):
    magic 'GP', version 0, flags 0x01 (little-endian header, envelope
    indicator 0 — legal per the spec, and what the paired reader expects
    when the envelope bits are 0)."""
    if data is None:
        return None
    return b"GP\x00\x01" + struct.pack("<i", srs_id) + data


def _sqlite_type(t: pa.DataType) -> str:
    if pa.types.is_boolean(t):
        return "BOOLEAN"
    if pa.types.is_integer(t):
        return "INTEGER"
    if pa.types.is_floating(t):
        return "REAL"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "BLOB"
    if pa.types.is_timestamp(t):
        return "DATETIME"
    if pa.types.is_date(t):
        return "DATE"
    return "TEXT"


def _sqlite_value(v):
    if v is None or isinstance(v, (int, float, str, bytes)):
        return v
    if isinstance(v, bool):
        return int(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def gpkg_bytes(tables: dict[str, pa.Table], *, srs_id: int = 4326,
               wkb_col: str = "wkb") -> bytes:
    """Serialize feature tables into a complete GeoPackage database
    (stdlib sqlite3, ``Connection.serialize`` — no file needed).  Writes
    the spec-required gpkg_spatial_ref_sys / gpkg_contents /
    gpkg_geometry_columns metadata, application_id 'GPKG' and a ``fid``
    INTEGER PRIMARY KEY per feature table (requirement 29).  Readable by
    ``vector_formats.read_gpkg`` and any conformant implementation."""
    con = sqlite3.connect(":memory:")
    con.execute("PRAGMA application_id = 1196444487")   # 'GPKG'
    con.execute("PRAGMA user_version = 10301")          # GeoPackage 1.3.1
    con.execute("""CREATE TABLE gpkg_spatial_ref_sys (
        srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
        organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,
        definition TEXT NOT NULL, description TEXT)""")
    con.executemany(
        "INSERT INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,NULL)",
        [("Undefined Cartesian SRS", -1, "NONE", -1, "undefined"),
         ("Undefined geographic SRS", 0, "NONE", 0, "undefined"),
         ("WGS 84 geodetic", 4326, "EPSG", 4326,
          'GEOGCS["WGS 84",DATUM["WGS_1984",'
          'SPHEROID["WGS 84",6378137,298.257223563]],'
          'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]')])
    con.execute("""CREATE TABLE gpkg_contents (
        table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL,
        identifier TEXT UNIQUE, description TEXT DEFAULT '',
        last_change DATETIME NOT NULL,
        min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,
        srs_id INTEGER)""")
    con.execute("""CREATE TABLE gpkg_geometry_columns (
        table_name TEXT NOT NULL, column_name TEXT NOT NULL,
        geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
        z TINYINT NOT NULL, m TINYINT NOT NULL,
        CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))""")
    for name, tab in tables.items():
        attr = [c for c in tab.column_names if c not in (wkb_col, "fid")]
        coldefs = ['"fid" INTEGER PRIMARY KEY', '"geom" BLOB']
        for c in attr:
            coldefs.append(f'"{c}" {_sqlite_type(tab.schema.field(c).type)}')
        con.execute(f'CREATE TABLE "{name}" ({", ".join(coldefs)})')
        fids = tab.column("fid").to_pylist() if "fid" in tab.column_names \
            else list(range(1, tab.num_rows + 1))
        wkbs = tab.column(wkb_col).to_pylist()
        cols = {c: tab.column(c).to_pylist() for c in attr}
        rows = [(fids[i], wkb_to_gpkg_blob(wkbs[i], srs_id=srs_id),
                 *[_sqlite_value(cols[c][i]) for c in attr])
                for i in range(tab.num_rows)]
        ph = ",".join("?" * (2 + len(attr)))
        con.executemany(f'INSERT INTO "{name}" VALUES ({ph})', rows)
        # content bbox from the geometry envelopes (nullable per spec)
        pts = [p for d in wkbs if d is not None
               for rings in [_all_points(wkb.loads(d))] for p in rings]
        if pts:
            allp = np.vstack(pts)
            bbox = (float(allp[:, 0].min()), float(allp[:, 1].min()),
                    float(allp[:, 0].max()), float(allp[:, 1].max()))
        else:
            bbox = (None, None, None, None)
        con.execute("INSERT INTO gpkg_contents VALUES (?,?,?,?,?,?,?,?,?,?)",
                    (name, "features", name, "", _GPKG_LAST_CHANGE,
                     bbox[0], bbox[1], bbox[2], bbox[3], srs_id))
        con.execute("INSERT INTO gpkg_geometry_columns VALUES (?,?,?,?,2,2)",
                    (name, "geom", "GEOMETRY", srs_id))
    con.commit()
    payload = con.serialize()
    con.close()
    return payload


def _all_points(g: dict) -> list:
    t = g["type"]
    if t == "Point":
        return [np.asarray(g["xy"], dtype=np.float64).reshape(1, 2)]
    if t in ("LineString", "MultiPoint"):
        return [np.asarray(g["xy"], dtype=np.float64).reshape(-1, 2)]
    if t == "Polygon":
        return [np.asarray(r, dtype=np.float64) for r in g["rings"]]
    if t == "MultiLineString":
        return [np.asarray(ln, dtype=np.float64) for ln in g["lines"]]
    if t == "MultiPolygon":
        return [np.asarray(r, dtype=np.float64)
                for rings in g["polys"] for r in rings]
    return [p for s in g["geoms"] for p in _all_points(s)]


# ---------- Ray sinks ----------

def _file_sink(ds: "ray.data.Dataset", out_dir: str, ext: str,
               serialize) -> "ray.data.Dataset":
    """File-per-block sink: serialize(batch) → bytes, write atomically under
    a content-hash name, emit one manifest row per file."""
    os.makedirs(out_dir, exist_ok=True)

    def fn(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_features": pa.array([], pa.int64()),
                             "n_bytes": pa.array([], pa.int64())})
        payload = serialize(b)
        name = hashlib.md5(payload).hexdigest()[:16]
        path = os.path.join(out_dir, f"part-{name}{ext}")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)
        return pa.table({"path": pa.array([path], pa.string()),
                         "n_features": pa.array([b.num_rows], pa.int64()),
                         "n_bytes": pa.array([len(payload)], pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow")


def write_geojson(ds: "ray.data.Dataset", out_dir: str, *,
                  wkb_col: str = "wkb") -> "ray.data.Dataset":
    """GeoJSON sink: one FeatureCollection file per block; returns the
    manifest Dataset (path, n_features, n_bytes)."""
    return _file_sink(ds, out_dir, ".geojson",
                      lambda b: geojson_bytes(b, wkb_col=wkb_col))


def write_gpkg(ds: "ray.data.Dataset", out_dir: str, *,
               table: str = "layer", srs_id: int = 4326,
               wkb_col: str = "wkb") -> "ray.data.Dataset":
    """GeoPackage sink: one complete .gpkg per block (feature table
    ``table``); returns the manifest Dataset (path, n_features, n_bytes)."""
    return _file_sink(ds, out_dir, ".gpkg",
                      lambda b: gpkg_bytes({table: b}, srs_id=srs_id,
                                           wkb_col=wkb_col))


# ---------- Shapefile (.shp/.shx/.dbf triple) ----------
# ESRI Shapefile Technical Description (July 1998) — the same contract
# ogr/ogrsf_frmts/shape/shpopen.c + dbfopen.c implement.  2D only (Z/M
# dropped, like the GeoJSON writer drops M); one shape type per file per
# the spec (mixed non-null geometry classes raise).

_SHP_POINT, _SHP_LINE, _SHP_POLY = 1, 3, 5


def _closed(r: np.ndarray) -> np.ndarray:
    r = np.asarray(r, dtype=np.float64).reshape(-1, 2)
    if len(r) and not np.array_equal(r[0], r[-1]):
        r = np.vstack([r, r[:1]])
    return r


def _shp_rings(g: dict) -> list[np.ndarray]:
    """Polygon/MultiPolygon → ESRI ring soup: shells CW (negative shoelace),
    holes CCW — the orientation rule parse_shp_bytes reassembles by."""
    from ..core.geom import ring_area
    out = []
    polys = g["polys"] if g["type"] == "MultiPolygon" else [g["rings"]]
    for rings in polys:
        for k, r in enumerate(rings):
            r = _closed(r)
            want_shell = k == 0
            is_ccw = ring_area(r) > 0
            if (want_shell and is_ccw) or (not want_shell and not is_ccw):
                r = r[::-1]
            out.append(r)
    return out


def _shp_record(g: dict | None) -> tuple[int, bytes]:
    """→ (shape_type, record content bytes) for one geometry."""
    if g is None:
        return 0, struct.pack("<i", 0)
    t = g["type"]
    if t == "Point":
        xy = np.asarray(g["xy"], dtype=np.float64).reshape(-1)
        return _SHP_POINT, struct.pack("<idd", 1, xy[0], xy[1])
    if t in ("LineString", "MultiLineString"):
        parts = ([np.asarray(g["xy"], dtype=np.float64).reshape(-1, 2)]
                 if t == "LineString" else
                 [np.asarray(ln, dtype=np.float64).reshape(-1, 2)
                  for ln in g["lines"]])
        stype = _SHP_LINE
    elif t in ("Polygon", "MultiPolygon"):
        parts = _shp_rings(g)
        stype = _SHP_POLY
    else:
        raise NotImplementedError(
            f"shapefile writer: {t} has no 2D shape-type mapping "
            "(GeometryCollection/MultiPoint → use GeoJSON/GPKG sinks)")
    pts = np.vstack(parts)
    starts = np.cumsum([0] + [len(p) for p in parts[:-1]]).astype("<i4")
    body = struct.pack("<idddd", stype,
                       float(pts[:, 0].min()), float(pts[:, 1].min()),
                       float(pts[:, 0].max()), float(pts[:, 1].max()))
    body += struct.pack("<ii", len(parts), len(pts))
    body += starts.tobytes()
    body += np.ascontiguousarray(pts, dtype="<f8").tobytes()
    return stype, body


def _dbf_bytes(tab: pa.Table, cols: list[str]) -> bytes:
    """dBASE III attribute table for the given columns."""
    nrec = tab.num_rows
    fields = []                            # (name, ftype, flen, fdec, vals)
    for c in cols:
        col = tab.column(c)
        t = col.type
        vals = col.to_pylist()
        name = c[:10].encode("ascii", "replace")
        if pa.types.is_boolean(t):
            fields.append((name, b"L", 1, 0,
                           [("T" if v else "F") if v is not None else "?"
                            for v in vals]))
        elif pa.types.is_integer(t):
            fields.append((name, b"N", 18, 0,
                           ["" if v is None else str(int(v))[:18]
                            for v in vals]))
        elif pa.types.is_floating(t):
            fields.append((name, b"N", 24, 6,
                           ["" if v is None else f"{float(v):.6f}"[:24]
                            for v in vals]))
        else:
            w = max([1] + [len(str(v).encode("ascii", "replace"))
                           for v in vals if v is not None])
            w = min(w, 254)
            fields.append((name, b"C", w, 0,
                           ["" if v is None else str(v)[:w] for v in vals]))
    rsize = 1 + sum(f[2] for f in fields)
    hsize = 32 + 32 * len(fields) + 1
    out = bytearray(struct.pack("<BBBBiHH20x", 0x03, 126, 1, 1,
                                nrec, hsize, rsize))
    for name, ftype, flen, fdec, _ in fields:
        out += struct.pack("<11s1s4xBB14x", name, ftype, flen, fdec)
    out += b"\x0d"
    for r in range(nrec):
        out += b" "
        for name, ftype, flen, fdec, vals in fields:
            s = vals[r].encode("ascii", "replace")
            if ftype == b"N":              # numbers right-justified
                out += s.rjust(flen)[:flen]
            else:
                out += s.ljust(flen)[:flen]
    out += b"\x1a"
    return bytes(out)


def shapefile_bytes(tab: pa.Table, *, wkb_col: str = "wkb") -> dict[str, bytes]:
    """pa.Table with a WKB column → {"shp": ..., "shx": ..., "dbf": ...}."""
    geoms = [wkb.loads(v) if v is not None else None
             for v in tab.column(wkb_col).to_pylist()]
    recs = [_shp_record(g) for g in geoms]
    stypes = {st for st, _ in recs if st != 0}
    if len(stypes) > 1:
        raise ValueError(f"mixed shape types in one shapefile: {stypes}")
    layer_type = stypes.pop() if stypes else _SHP_POINT

    bbox = [0.0, 0.0, 0.0, 0.0]
    pts = [p for g in geoms if g is not None for p in _all_points(g)]
    if pts:
        allp = np.vstack(pts)
        bbox = [float(allp[:, 0].min()), float(allp[:, 1].min()),
                float(allp[:, 0].max()), float(allp[:, 1].max())]

    shp = bytearray()
    shx = bytearray()
    off_words = 50                          # header = 100 bytes
    for i, (st, body) in enumerate(recs):
        clen = len(body) // 2
        shx += struct.pack(">ii", off_words, clen)
        shp += struct.pack(">ii", i + 1, clen) + body
        off_words += 4 + clen

    def header(file_words: int) -> bytes:
        return (struct.pack(">i20xi", 9994, file_words)
                + struct.pack("<ii4d4d", 1000, layer_type, *bbox,
                              0.0, 0.0, 0.0, 0.0))

    shp_bytes = header(50 + len(shp) // 2) + bytes(shp)
    shx_bytes = header(50 + len(shx) // 2) + bytes(shx)
    attr_cols = [c for c in tab.column_names if c != wkb_col]
    if not attr_cols:
        tab = tab.append_column("fid", pa.array(range(tab.num_rows), pa.int64()))
        attr_cols = ["fid"]
    return {"shp": shp_bytes, "shx": shx_bytes,
            "dbf": _dbf_bytes(tab, attr_cols)}


def write_shapefile(ds: "ray.data.Dataset", out_dir: str, *,
                    wkb_col: str = "wkb") -> "ray.data.Dataset":
    """Shapefile sink: one .shp/.shx/.dbf triple per block under a
    content-hash basename; manifest rows point at the .shp."""
    os.makedirs(out_dir, exist_ok=True)

    def fn(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_features": pa.array([], pa.int64()),
                             "n_bytes": pa.array([], pa.int64())})
        parts = shapefile_bytes(b)
        name = hashlib.md5(parts["shp"]).hexdigest()[:16]
        tot = 0
        for ext, payload in parts.items():
            path = os.path.join(out_dir, f"part-{name}.{ext}")
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(payload)
            os.replace(tmp, path)
            tot += len(payload)
        return pa.table({
            "path": pa.array([os.path.join(out_dir, f"part-{name}.shp")],
                             pa.string()),
            "n_features": pa.array([b.num_rows], pa.int64()),
            "n_bytes": pa.array([tot], pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------- FlatGeobuf ----------
# Hand-built little-endian flatbuffers against the public FlatGeobuf 3.x
# spec (the same header/feature schema ogr/ogrsf_frmts/flatgeobuf's
# geometrywriter.cpp emits): magic, size-prefixed Header table
# (geometry_type / columns / features_count / index_node_size=0 → no
# R-tree), then size-prefixed Feature tables (Geometry xy+ends+type(+parts),
# properties = column-index-tagged packed values).  Round-trips through
# vector_formats.parse_flatgeobuf_bytes.

_FGB_GTYPE = {"Point": 1, "LineString": 2, "Polygon": 3,
              "MultiPoint": 4, "MultiLineString": 5, "MultiPolygon": 6}


def _fb_table(slots: list) -> tuple[bytes, int]:
    """slots: [(vt_slot, ("scalar", fmt, value) | ("offset", blob, entry))]
    → (blob, table_entry).  Blob layout: [vtable][table inline][heap];
    every internal offset is blob-relative, so blobs compose freely."""
    slots = sorted(slots, key=lambda s: s[0])
    nslots = (max(s[0] for s in slots) - 4) // 2 + 1 if slots else 0
    vtlen = 4 + 2 * nslots
    # inline layout
    sizes = []
    for _slot, spec in slots:
        sizes.append(struct.calcsize("<" + spec[1]) if spec[0] == "scalar"
                     else 4)
    inline = 4 + sum(sizes)
    rel = {}
    p = 4
    for (slot, _spec), sz in zip(slots, sizes):
        rel[slot] = p
        p += sz
    vt = struct.pack("<HH", vtlen, inline)
    for j in range(nslots):
        vt += struct.pack("<H", rel.get(4 + 2 * j, 0))
    body = bytearray(struct.pack("<i", vtlen))       # soffset → vtable at 0
    heap = bytearray()
    heap_base = vtlen + inline
    for (slot, spec), sz in zip(slots, sizes):
        if spec[0] == "scalar":
            body += struct.pack("<" + spec[1], spec[2])
        else:
            _, blob, entry = spec
            if len(heap) % 8:
                heap += b"\x00" * (8 - len(heap) % 8)
            target = heap_base + len(heap) + entry
            body += struct.pack("<I", target - (vtlen + rel[slot]))
            heap += blob
    return vt + bytes(body) + bytes(heap), vtlen


def _fb_vec(fmt: str, vals) -> tuple[bytes, int]:
    a = np.asarray(vals)
    return struct.pack("<I", len(a)) + a.astype(fmt).tobytes(), 0


def _fb_str(s: str) -> tuple[bytes, int]:
    b = s.encode("utf-8")
    return struct.pack("<I", len(b)) + b + b"\x00", 0


def _fb_table_vec(items: list) -> tuple[bytes, int]:
    """items: [(blob, entry)] → vector-of-tables blob."""
    n = len(items)
    head = bytearray(struct.pack("<I", n))
    tails = bytearray()
    base = 4 + 4 * n
    for i, (blob, entry) in enumerate(items):
        if len(tails) % 8:
            tails += b"\x00" * (8 - len(tails) % 8)
        head += struct.pack("<I", (base + len(tails) + entry) - (4 + 4 * i))
        tails += blob
    return bytes(head) + bytes(tails), 0


def _fgb_zm_flat(g: dict, key: str):
    """Flatten the engine's per-type z/m layout (Point scalar, LineString
    (N,), Polygon list-per-ring) into FlatGeobuf's single parallel vector.
    Multi* never carry z/m in loaded dicts (core.wkb drops them there —
    the engine-wide boundary), so they need no handling here."""
    v = g.get(key)
    if v is None:
        return None
    t = g["type"]
    if t == "Point":
        return np.asarray([v], np.float64).reshape(-1)[:1]
    if t == "LineString":
        return np.asarray(v, np.float64).reshape(-1)
    if t == "Polygon":
        parts = [np.asarray(r, np.float64).reshape(-1)
                 for r in v if r is not None]
        return np.concatenate(parts) if parts else None
    return None


def _fgb_geom_table(g: dict) -> tuple[bytes, int]:
    """Parsed geometry → FlatGeobuf Geometry table (VT_ENDS=4, VT_XY=6,
    VT_Z=8, VT_M=10, VT_TYPE=16, VT_PARTS=18)."""
    t = g["type"]
    if t not in _FGB_GTYPE:
        raise NotImplementedError(
            f"FlatGeobuf writer: {t} not representable "
            "(GeometryCollection → use GeoJSON/GPKG sinks)")
    code = _FGB_GTYPE[t]
    slots = [(16, ("scalar", "B", code))]
    if t == "Point":
        xy = np.asarray(g["xy"], dtype=np.float64).reshape(-1)[:2]
        slots.append((6, ("offset",) + _fb_vec("<f8", xy)))
    elif t in ("LineString", "MultiPoint"):
        xy = np.asarray(g["xy"], dtype=np.float64).reshape(-1, 2)
        slots.append((6, ("offset",) + _fb_vec("<f8", xy.ravel())))
    elif t in ("Polygon", "MultiLineString"):
        parts = g["rings"] if t == "Polygon" else g["lines"]
        parts = [np.asarray(p, dtype=np.float64).reshape(-1, 2)
                 for p in parts]
        ends = np.cumsum([len(p) for p in parts]).astype(np.uint32)
        slots.append((6, ("offset",) + _fb_vec(
            "<f8", np.vstack(parts).ravel())))
        if len(parts) > 1:
            slots.append((4, ("offset",) + _fb_vec("<u4", ends)))
    elif t == "MultiPolygon":
        subs = []
        for rings in g["polys"]:
            rr = [np.asarray(r, dtype=np.float64).reshape(-1, 2)
                  for r in rings]
            ends = np.cumsum([len(r) for r in rr]).astype(np.uint32)
            sub_slots = [(6, ("offset",) + _fb_vec(
                "<f8", np.vstack(rr).ravel()))]
            if len(rr) > 1:
                sub_slots.append((4, ("offset",) + _fb_vec("<u4", ends)))
            subs.append(_fb_table(sub_slots))
        slots.append((18, ("offset",) + _fb_table_vec(subs)))
    else:
        raise NotImplementedError(
            f"FlatGeobuf writer: {t} not representable "
            "(GeometryCollection → use GeoJSON/GPKG sinks)")
    z = _fgb_zm_flat(g, "z")
    if z is not None:
        slots.append((8, ("offset",) + _fb_vec("<f8", z)))
    m = _fgb_zm_flat(g, "m")
    if m is not None:
        slots.append((10, ("offset",) + _fb_vec("<f8", m)))
    return _fb_table(slots)


def _fgb_column_meta(tab: pa.Table, cols: list[str]) -> list[tuple]:
    """→ [(name, fgb_type_code, packer)] per attribute column."""
    metas = []
    for c in cols:
        t = tab.column(c).type
        if pa.types.is_boolean(t):
            metas.append((c, 2, lambda v: struct.pack("<B", int(v))))
        elif pa.types.is_integer(t):
            metas.append((c, 7, lambda v: struct.pack("<q", int(v))))
        elif pa.types.is_floating(t):
            metas.append((c, 10, lambda v: struct.pack("<d", float(v))))
        elif pa.types.is_binary(t):
            metas.append((c, 14, lambda v: struct.pack("<I", len(v)) + v))
        else:
            metas.append((c, 11, lambda v: (lambda b: struct.pack(
                "<I", len(b)) + b)(str(v).encode("utf-8"))))
    return metas


FGB_MAGIC_W = bytes([0x66, 0x67, 0x62, 0x03, 0x66, 0x67, 0x62, 0x01])


def flatgeobuf_bytes(tab: pa.Table, *, wkb_col: str = "wkb",
                     name: str = "layer") -> bytes:
    geoms = [wkb.loads(v) if v is not None else None
             for v in tab.column(wkb_col).to_pylist()]
    gtypes = {_FGB_GTYPE.get(g["type"], 0) for g in geoms if g is not None}
    layer_gtype = gtypes.pop() if len(gtypes) == 1 else 0

    attr_cols = [c for c in tab.column_names if c != wkb_col]
    metas = _fgb_column_meta(tab, attr_cols)
    col_tabs = [_fb_table([(4, ("offset",) + _fb_str(n)),
                           (6, ("scalar", "B", code))])
                for n, code, _ in metas]
    header_slots = [
        (4, ("offset",) + _fb_str(name)),          # VT_NAME
        (8, ("scalar", "B", layer_gtype)),         # VT_GEOMETRY_TYPE
        (20, ("scalar", "Q", len(geoms))),         # VT_FEATURES_COUNT
        (22, ("scalar", "H", 0)),                  # VT_INDEX_NODE_SIZE: none
    ]
    if col_tabs:
        header_slots.append((18, ("offset",) + _fb_table_vec(col_tabs)))
    hblob, hentry = _fb_table(header_slots)
    header = struct.pack("<I", 4 + hentry) + hblob

    out = bytearray(FGB_MAGIC_W)
    out += struct.pack("<I", len(header)) + header
    for i, g in enumerate(geoms):
        fslots = []
        if g is not None:
            gblob, gentry = _fgb_geom_table(g)
            fslots.append((4, ("offset", gblob, gentry)))   # VT_GEOMETRY
        props = bytearray()
        for ci, (cname, _code, pack) in enumerate(metas):
            v = tab.column(cname)[i].as_py()
            if v is None:
                continue
            props += struct.pack("<H", ci) + pack(v)
        if props:
            fslots.append((6, ("offset",) + _fb_vec(
                "<u1", np.frombuffer(bytes(props), np.uint8))))
        if not fslots:                       # null geometry, all-null props:
            fslots = [(6, ("offset",) + _fb_vec("<u1", []))]
        blob, entry = _fb_table(fslots)
        feat = struct.pack("<I", 4 + entry) + blob
        out += struct.pack("<I", len(feat)) + feat
    return bytes(out)


def write_flatgeobuf(ds: "ray.data.Dataset", out_dir: str, *,
                     wkb_col: str = "wkb") -> "ray.data.Dataset":
    """FlatGeobuf sink: one .fgb per block (no spatial index — stream
    order); returns the manifest Dataset."""
    return _file_sink(ds, out_dir, ".fgb",
                      lambda b: flatgeobuf_bytes(b, wkb_col=wkb_col))


# ---------- CSV (OGR CSV driver analog) ----------
# ogr/ogrsf_frmts/csv/ogrcsvdatasource.cpp + ogrcsvlayer.cpp: RFC 4180
# quoting, geometry as a WKT column named "WKT" (GEOMETRY=AS_WKT), NULL as
# the empty field.  Serialization is the stdlib csv module (C-accelerated,
# RFC 4180 conformant).

def csv_bytes(tab: pa.Table, *, wkb_col: str = "wkb") -> bytes:
    """Arrow table -> CSV bytes.  A binary ``wkb_col`` column (if present)
    is exported as a WKT text column named ``WKT`` (OGR AS_WKT layout);
    floats print shortest-roundtrip, NULLs print as empty fields."""
    import csv as _csv
    import io

    from ..core import wkt as _wkt

    cols, names = [], []
    for name in tab.column_names:
        if name == wkb_col and pa.types.is_binary(tab.schema.field(name).type):
            names.append("WKT")
            cols.append([None if v is None else _wkt.dumps_wkt(wkb.loads(v))
                         for v in tab.column(name).to_pylist()])
        else:
            names.append(name)
            cols.append(tab.column(name).to_pylist())

    def fmt(v):
        if v is None:
            return ""
        if isinstance(v, float):
            return _wkt.format_double(v)   # NaN/inf-safe shortest repr
        if isinstance(v, bytes):
            return v.hex()
        return str(v)

    buf = io.StringIO()
    w = _csv.writer(buf, lineterminator="\n", quoting=_csv.QUOTE_MINIMAL)
    w.writerow(names)
    for row in zip(*cols) if cols else ():
        w.writerow([fmt(v) for v in row])
    return buf.getvalue().encode("utf-8")


def write_csv(ds: "ray.data.Dataset", out_dir: str, *,
              wkb_col: str = "wkb") -> "ray.data.Dataset":
    """CSV sink: one .csv per block; returns the manifest Dataset."""
    return _file_sink(ds, out_dir, ".csv",
                      lambda b: csv_bytes(b, wkb_col=wkb_col))


# ---------- GPX (ogr/ogrsf_frmts/gpx/ogrgpxwriter analog) ----------

def gpx_bytes(tab: pa.Table, *, wkb_col: str = "wkb",
              name_col: str | None = None) -> bytes:
    """Points -> GPX 1.1 waypoints, LineStrings -> tracks (one trkseg).
    GPX stores lat/lon as ATTRIBUTES in that order (Topografix schema),
    optional <name> child from ``name_col``."""
    from xml.sax.saxutils import escape

    names = (tab.column(name_col).to_pylist()
             if name_col and name_col in tab.column_names
             else [None] * tab.num_rows)
    out = ['<?xml version="1.0" encoding="UTF-8"?>',
           '<gpx version="1.1" creator="gdal_ray" '
           'xmlns="http://www.topografix.com/GPX/1/1">']
    for blob, nm in zip(tab.column(wkb_col).to_pylist(), names):
        if blob is None:
            continue
        g = wkb.loads(blob)
        tag = f"<name>{escape(str(nm))}</name>" if nm is not None else ""
        if g["type"] == "Point":
            x, y = (float(v) for v in np.asarray(g["xy"]).reshape(2))
            out.append(f'<wpt lat="{y!r}" lon="{x!r}">{tag}</wpt>')
        elif g["type"] == "LineString":
            pts = "".join(
                f'<trkpt lat="{float(p[1])!r}" lon="{float(p[0])!r}"/>'
                for p in np.asarray(g["xy"], dtype=np.float64))
            out.append(f"<trk>{tag}<trkseg>{pts}</trkseg></trk>")
        else:
            raise ValueError(f"GPX cannot store {g['type']}")
    out.append("</gpx>")
    return "\n".join(out).encode("utf-8")


def write_gpx(ds: "ray.data.Dataset", out_dir: str, *,
              wkb_col: str = "wkb") -> "ray.data.Dataset":
    """GPX sink: one .gpx per block; returns the manifest Dataset."""
    return _file_sink(ds, out_dir, ".gpx",
                      lambda b: gpx_bytes(b, wkb_col=wkb_col))


# ---------- KML (ogr/ogrsf_frmts/kml/kmlvector analog) ----------

def _kml_coords(xy: np.ndarray) -> str:
    xy = np.asarray(xy, dtype=np.float64).reshape(-1, 2)
    return " ".join(f"{p[0]!r},{p[1]!r}" for p in xy)


def kml_bytes(tab: pa.Table, *, wkb_col: str = "wkb",
              name_col: str | None = None) -> bytes:
    """Features -> KML 2.2 Placemarks (Point / LineString / Polygon with
    holes).  KML coordinates are lon,lat[,alt] comma-tuples."""
    from xml.sax.saxutils import escape

    names = (tab.column(name_col).to_pylist()
             if name_col and name_col in tab.column_names
             else [None] * tab.num_rows)
    out = ['<?xml version="1.0" encoding="UTF-8"?>',
           '<kml xmlns="http://www.opengis.net/kml/2.2"><Document>']
    for blob, nm in zip(tab.column(wkb_col).to_pylist(), names):
        if blob is None:
            continue
        g = wkb.loads(blob)
        t = g["type"]
        if t == "Point":
            geo = (f"<Point><coordinates>{_kml_coords(g['xy'])}"
                   "</coordinates></Point>")
        elif t == "LineString":
            geo = (f"<LineString><coordinates>{_kml_coords(g['xy'])}"
                   "</coordinates></LineString>")
        elif t == "Polygon":
            rings = [f"<outerBoundaryIs><LinearRing><coordinates>"
                     f"{_kml_coords(g['rings'][0])}"
                     "</coordinates></LinearRing></outerBoundaryIs>"]
            rings += [f"<innerBoundaryIs><LinearRing><coordinates>"
                      f"{_kml_coords(r)}"
                      "</coordinates></LinearRing></innerBoundaryIs>"
                      for r in g["rings"][1:]]
            geo = "<Polygon>" + "".join(rings) + "</Polygon>"
        else:
            raise ValueError(f"KML writer does not handle {t}")
        tag = f"<name>{escape(str(nm))}</name>" if nm is not None else ""
        out.append(f"<Placemark>{tag}{geo}</Placemark>")
    out.append("</Document></kml>")
    return "\n".join(out).encode("utf-8")


def write_kml(ds: "ray.data.Dataset", out_dir: str, *,
              wkb_col: str = "wkb") -> "ray.data.Dataset":
    """KML sink: one .kml per block; returns the manifest Dataset."""
    return _file_sink(ds, out_dir, ".kml",
                      lambda b: kml_bytes(b, wkb_col=wkb_col))


# ---------- Arrow IPC / Feather (ogr/ogrsf_frmts/arrow) ----------

def arrow_ipc_bytes(tab: pa.Table, *, file_format: bool = True) -> bytes:
    """Table -> Arrow IPC bytes (file framing = Feather V2 when
    ``file_format``, else stream framing)."""
    import io

    import pyarrow.ipc as ipc
    sink = io.BytesIO()
    opener = ipc.new_file if file_format else ipc.new_stream
    with opener(sink, tab.schema) as w:
        w.write_table(tab)
    return sink.getvalue()


def write_arrow_ipc(ds: "ray.data.Dataset", out_dir: str, *,
                    file_format: bool = True) -> "ray.data.Dataset":
    """Arrow IPC sink: one .arrow per block; returns the manifest."""
    return _file_sink(ds, out_dir, ".arrow",
                      lambda b: arrow_ipc_bytes(b, file_format=file_format))


# ---------- GeoJSONSeq (ogr/ogrsf_frmts/geojson GeoJSONSeq driver) ----------

def geojsonseq_bytes(tab: pa.Table, *, wkb_col: str = "wkb",
                     rs: bool = False) -> bytes:
    """Newline-delimited GeoJSON features (one Feature per line), the
    streaming-friendly variant the reference writes for large layers;
    ``rs=True`` prepends RFC 8142 record separators (0x1E)."""
    names = [c for c in tab.column_names if c != wkb_col]
    wkbs = tab.column(wkb_col).to_pylist()
    cols = {c: tab.column(c).to_pylist() for c in names}
    lines = []
    sep = "\x1e" if rs else ""
    for i in range(tab.num_rows):
        geometry = None if wkbs[i] is None \
            else geom_to_geojson(wkb.loads(wkbs[i]))
        lines.append(sep + json.dumps(
            {"type": "Feature",
             "properties": {c: cols[c][i] for c in names},
             "geometry": geometry},
            default=str, separators=(",", ":")))
    return ("\n".join(lines) + "\n").encode()


def write_geojsonseq(ds: "ray.data.Dataset", out_dir: str, *,
                     wkb_col: str = "wkb") -> "ray.data.Dataset":
    """GeoJSONSeq sink: one .geojsonl per block; returns the manifest."""
    return _file_sink(ds, out_dir, ".geojsonl",
                      lambda b: geojsonseq_bytes(b, wkb_col=wkb_col))


# ---------- GML (ogr/ogrsf_frmts/gml) ----------

def _gml_poslist(xy: np.ndarray) -> str:
    xy = np.asarray(xy, dtype=np.float64).reshape(-1, 2)
    return " ".join(f"{p[0]!r} {p[1]!r}" for p in xy)


def gml_bytes(tab: pa.Table, *, wkb_col: str = "wkb",
              layer: str = "layer") -> bytes:
    """Features -> GML 3.2 FeatureCollection (gml:Point pos /
    LineString posList / Polygon exterior+interior LinearRings; x y
    axis order as written, srsDimension 2)."""
    out = ['<?xml version="1.0" encoding="UTF-8"?>',
           '<gml:FeatureCollection xmlns:gml='
           '"http://www.opengis.net/gml/3.2">']
    names = [c for c in tab.column_names if c != wkb_col]
    cols = {c: tab.column(c).to_pylist() for c in names}
    for i, blob in enumerate(tab.column(wkb_col).to_pylist()):
        if blob is None:
            continue
        g = wkb.loads(blob)
        t = g["type"]
        if t == "Point":
            geo = (f"<gml:Point><gml:pos>{_gml_poslist(g['xy'])}"
                   "</gml:pos></gml:Point>")
        elif t == "LineString":
            geo = (f"<gml:LineString><gml:posList>"
                   f"{_gml_poslist(g['xy'])}</gml:posList>"
                   "</gml:LineString>")
        elif t == "Polygon":
            rr = [f"<gml:exterior><gml:LinearRing><gml:posList>"
                  f"{_gml_poslist(g['rings'][0])}</gml:posList>"
                  "</gml:LinearRing></gml:exterior>"]
            rr += [f"<gml:interior><gml:LinearRing><gml:posList>"
                   f"{_gml_poslist(r)}</gml:posList>"
                   "</gml:LinearRing></gml:interior>"
                   for r in g["rings"][1:]]
            geo = "<gml:Polygon>" + "".join(rr) + "</gml:Polygon>"
        else:
            raise ValueError(f"GML writer does not handle {t}")
        from xml.sax.saxutils import escape
        props = "".join(
            f"<{c}>{escape(str(cols[c][i]))}</{c}>"
            for c in names if cols[c][i] is not None)
        out.append(f"<gml:featureMember><{layer}>{props}{geo}"
                   f"</{layer}></gml:featureMember>")
    out.append("</gml:FeatureCollection>")
    return "\n".join(out).encode("utf-8")


def write_gml(ds: "ray.data.Dataset", out_dir: str, *,
              wkb_col: str = "wkb") -> "ray.data.Dataset":
    """GML sink: one .gml per block; returns the manifest Dataset."""
    return _file_sink(ds, out_dir, ".gml",
                      lambda b: gml_bytes(b, wkb_col=wkb_col))


# ---------- MapInfo MIF/MID (ogr/ogrsf_frmts/mitab) ----------

def mif_bytes(tab: pa.Table, *, wkb_col: str = "wkb"
              ) -> dict[str, bytes]:
    """Features -> MapInfo Interchange pair {'mif': …, 'mid': …}:
    the MIF file carries the header + geometry section (POINT / PLINE /
    REGION / NONE), the MID file the delimited attribute rows, row-
    aligned (the reference's mitab MIF driver layout)."""
    import csv as _csv
    import io

    from ..core import wkt as _wkt

    names = [c for c in tab.column_names if c != wkb_col]
    cols = {c: tab.column(c).to_pylist() for c in names}

    def mif_type(t: pa.DataType) -> str:
        if pa.types.is_integer(t):
            return "Integer"
        if pa.types.is_floating(t):
            return "Float"
        return "Char(254)"

    head = ["Version 300", 'Charset "Neutral"', 'Delimiter ","',
            "Columns " + str(len(names))]
    for c in names:
        head.append(f"  {c} {mif_type(tab.schema.field(c).type)}")
    head.append("Data")
    head.append("")
    geo = []
    for blob in tab.column(wkb_col).to_pylist():
        if blob is None:
            geo.append("NONE")
            continue
        g = wkb.loads(blob)
        t = g["type"]
        if t == "Point":
            x, y = (float(v) for v in np.asarray(g["xy"]).reshape(2))
            geo.append(f"POINT {_wkt.format_double(x)} "
                       f"{_wkt.format_double(y)}")
        elif t == "LineString":
            xy = np.asarray(g["xy"], dtype=np.float64)
            lines = [f"PLINE {len(xy)}"]
            lines += [f"{_wkt.format_double(p[0])} "
                      f"{_wkt.format_double(p[1])}" for p in xy]
            geo.append("\n".join(lines))
        elif t == "Polygon":
            lines = [f"REGION {len(g['rings'])}"]
            for r in g["rings"]:
                r = np.asarray(r, dtype=np.float64)
                lines.append(f"  {len(r)}")
                lines += [f"{_wkt.format_double(p[0])} "
                          f"{_wkt.format_double(p[1])}" for p in r]
            geo.append("\n".join(lines))
        else:
            raise ValueError(f"MIF writer does not handle {t}")
    mif = ("\n".join(head) + "\n".join(geo) + "\n").encode("ascii")
    buf = io.StringIO()
    w = _csv.writer(buf, lineterminator="\n")
    for i in range(tab.num_rows):
        w.writerow(["" if cols[c][i] is None else cols[c][i]
                    for c in names])
    return {"mif": mif, "mid": buf.getvalue().encode("utf-8")}


def write_mif(ds: "ray.data.Dataset", out_dir: str, *,
              wkb_col: str = "wkb") -> "ray.data.Dataset":
    """MIF/MID sink: one .mif + .mid pair per block (content-hash name);
    returns the manifest Dataset (path, n_features, n_bytes)."""
    os.makedirs(out_dir, exist_ok=True)

    def fn(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_features": pa.array([], pa.int64()),
                             "n_bytes": pa.array([], pa.int64())})
        pair = mif_bytes(b, wkb_col=wkb_col)
        name = hashlib.md5(pair["mif"] + pair["mid"]).hexdigest()[:16]
        base = os.path.join(out_dir, f"part-{name}")
        for ext in ("mif", "mid"):
            tmp = f"{base}.{ext}.tmp"
            with open(tmp, "wb") as f:
                f.write(pair[ext])
            os.replace(tmp, f"{base}.{ext}")
        total = len(pair["mif"]) + len(pair["mid"])
        return pa.table({"path": pa.array([base + ".mif"], pa.string()),
                         "n_features": pa.array([b.num_rows], pa.int64()),
                         "n_bytes": pa.array([total], pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------- AutoCAD DXF (ogr/ogrsf_frmts/dxf) ----------

def dxf_bytes(tab: pa.Table, *, wkb_col: str = "wkb",
              layer_col: str | None = None) -> bytes:
    """Features -> minimal ASCII DXF (R12-compatible ENTITIES section):
    Point -> POINT, LineString -> LWPOLYLINE (open), Polygon shell ->
    LWPOLYLINE (closed flag 70=1; holes are separate closed polylines,
    the flattening the reference's DXF writer applies)."""
    from ..core import wkt as _wkt

    fd = _wkt.format_double
    layers = (tab.column(layer_col).to_pylist()
              if layer_col and layer_col in tab.column_names
              else ["0"] * tab.num_rows)
    out = ["0", "SECTION", "2", "ENTITIES"]

    def lwpolyline(xy, layer, closed):
        xy = np.asarray(xy, dtype=np.float64).reshape(-1, 2)
        # drop the duplicate closing vertex only when the ring actually
        # repeats it (unclosed producer rings keep every vertex)
        dup = closed and len(xy) > 1 and bool((xy[0] == xy[-1]).all())
        n = len(xy) - (1 if dup else 0)
        out.extend(["0", "LWPOLYLINE", "8", str(layer),
                    "90", str(n), "70", "1" if closed else "0"])
        for p in xy[:n]:
            out.extend(["10", fd(p[0]), "20", fd(p[1])])

    for blob, layer in zip(tab.column(wkb_col).to_pylist(), layers):
        if blob is None:
            continue
        g = wkb.loads(blob)
        t = g["type"]
        if t == "Point":
            x, y = (float(v) for v in np.asarray(g["xy"]).reshape(2))
            out.extend(["0", "POINT", "8", str(layer),
                        "10", fd(x), "20", fd(y)])
        elif t == "LineString":
            lwpolyline(g["xy"], layer, closed=False)
        elif t == "Polygon":
            for r in g["rings"]:
                lwpolyline(r, layer, closed=True)
        else:
            raise ValueError(f"DXF writer does not handle {t}")
    out.extend(["0", "ENDSEC", "0", "EOF"])
    return ("\n".join(out) + "\n").encode("ascii")


def write_dxf(ds: "ray.data.Dataset", out_dir: str, *,
              wkb_col: str = "wkb") -> "ray.data.Dataset":
    """DXF sink: one .dxf per block; returns the manifest Dataset."""
    return _file_sink(ds, out_dir, ".dxf",
                      lambda b: dxf_bytes(b, wkb_col=wkb_col))


# ---------- SpatiaLite (ogr/ogrsf_frmts/sqlite) ----------

_GAIA_CODES = {"Point": 1, "LineString": 2, "Polygon": 3,
               "MultiPoint": 4, "MultiLineString": 5, "MultiPolygon": 6,
               "GeometryCollection": 7}


def _gaia_pts(out: list, xy, z=None, m=None):
    xy = np.asarray(xy, dtype=np.float64).reshape(-1, 2)
    cols = [xy]
    if z is not None:
        cols.append(np.asarray(z, dtype=np.float64).reshape(-1, 1))
    if m is not None:
        cols.append(np.asarray(m, dtype=np.float64).reshape(-1, 1))
    arr = xy if len(cols) == 1 else np.hstack(cols)
    out.append(np.ascontiguousarray(arr, dtype="<f8").tobytes())


def _gaia_body(g: dict, out: list):
    """Geometry coordinate body, WITHOUT the class int (gaia entities in
    collections repeat 0x69 + class + body with no per-entity header)."""
    t = g["type"]
    if t == "Point":
        _gaia_pts(out, np.asarray(g["xy"], dtype=np.float64).reshape(1, 2),
                  g.get("z"), g.get("m"))
    elif t == "LineString":
        xy = np.asarray(g["xy"], dtype=np.float64)
        out.append(struct.pack("<i", len(xy)))
        _gaia_pts(out, xy, g.get("z"), g.get("m"))
    elif t == "Polygon":
        out.append(struct.pack("<i", len(g["rings"])))
        zs = g.get("z") or [None] * len(g["rings"])
        ms = g.get("m") or [None] * len(g["rings"])
        for r, z, m in zip(g["rings"], zs, ms):
            r = np.asarray(r, dtype=np.float64)
            out.append(struct.pack("<i", len(r)))
            _gaia_pts(out, r, z, m)
    else:
        if t == "MultiPoint":
            subs = [{"type": "Point", "xy": p}
                    for p in np.asarray(g["xy"], np.float64).reshape(-1, 2)]
        elif t == "MultiLineString":
            subs = [{"type": "LineString", "xy": ln} for ln in g["lines"]]
        elif t == "MultiPolygon":
            subs = [{"type": "Polygon", "rings": r} for r in g["polys"]]
        elif t == "GeometryCollection":
            subs = g["geoms"]
        else:
            raise ValueError(f"gaia writer does not handle {t}")
        out.append(struct.pack("<i", len(subs)))
        for s in subs:
            zm = 1000 * int("z" in s) + 2000 * int("m" in s)
            out.append(struct.pack("<Bi", 0x69, _GAIA_CODES[s["type"]] + zm))
            _gaia_body(s, out)


def wkb_to_gaia_blob(data: bytes | None, *, srid: int = 4326) -> bytes | None:
    """Standard WKB → SpatiaLite internal BLOB geometry (the gaia format
    the reference reads in ogr/ogrsf_frmts/sqlite/ogrsqlitelayer.cpp):
    0x00, endian 0x01 (little), SRID int32, MBR 4 doubles, 0x7C, class
    int (+1000 Z / +2000 M / +3000 ZM), coordinate body, 0xFE."""
    if data is None:
        return None
    g = wkb.loads(data)
    pts = np.vstack(_all_points(g)) if _all_points(g) else \
        np.zeros((1, 2), dtype=np.float64)
    body: list = []
    _gaia_body(g, body)
    zm = 1000 * int("z" in g) + 2000 * int("m" in g)
    return (b"\x00\x01" + struct.pack("<i", srid)
            + struct.pack("<4d", float(pts[:, 0].min()),
                          float(pts[:, 1].min()), float(pts[:, 0].max()),
                          float(pts[:, 1].max()))
            + b"\x7c" + struct.pack("<i", _GAIA_CODES[g["type"]] + zm)
            + b"".join(body) + b"\xfe")


def spatialite_bytes(tables: dict[str, pa.Table], *, srid: int = 4326,
                     wkb_col: str = "wkb") -> bytes:
    """Serialize feature tables into a SpatiaLite database (stdlib
    sqlite3).  Writes the v4-layout ``geometry_columns`` (integer
    geometry_type / coord_dimension) and ``spatial_ref_sys`` metadata the
    reference driver sniffs to detect SpatiaLite
    (ogr/ogrsf_frmts/sqlite/ogrsqlitedatasource.cpp); geometries are gaia
    BLOBs.  Readable by ``vector_formats.read_spatialite``."""
    con = sqlite3.connect(":memory:")
    con.execute("""CREATE TABLE spatial_ref_sys (
        srid INTEGER NOT NULL PRIMARY KEY, auth_name TEXT NOT NULL,
        auth_srid INTEGER NOT NULL, ref_sys_name TEXT NOT NULL DEFAULT '',
        proj4text TEXT NOT NULL, srtext TEXT NOT NULL DEFAULT '')""")
    con.execute(
        "INSERT INTO spatial_ref_sys VALUES (4326,'epsg',4326,'WGS 84',"
        "'+proj=longlat +datum=WGS84 +no_defs','')")
    con.execute("""CREATE TABLE geometry_columns (
        f_table_name TEXT NOT NULL, f_geometry_column TEXT NOT NULL,
        geometry_type INTEGER NOT NULL, coord_dimension INTEGER NOT NULL,
        srid INTEGER NOT NULL, spatial_index_enabled INTEGER NOT NULL,
        CONSTRAINT pk_geom_cols PRIMARY KEY (f_table_name, f_geometry_column))""")
    for name, tab in tables.items():
        attr = [c for c in tab.column_names if c not in (wkb_col, "fid")]
        coldefs = ['"fid" INTEGER PRIMARY KEY', '"geometry" BLOB']
        for c in attr:
            coldefs.append(f'"{c}" {_sqlite_type(tab.schema.field(c).type)}')
        con.execute(f'CREATE TABLE "{name}" ({", ".join(coldefs)})')
        fids = tab.column("fid").to_pylist() if "fid" in tab.column_names \
            else list(range(1, tab.num_rows + 1))
        wkbs = tab.column(wkb_col).to_pylist()
        cols = {c: tab.column(c).to_pylist() for c in attr}
        gtypes = set()
        rows = []
        for i in range(tab.num_rows):
            blob = wkb_to_gaia_blob(wkbs[i], srid=srid)
            if blob is not None:
                gtypes.add(struct.unpack_from("<i", blob, 39)[0])
            rows.append((fids[i], blob,
                         *[_sqlite_value(cols[c][i]) for c in attr]))
        ph = ",".join("?" * (2 + len(attr)))
        con.executemany(f'INSERT INTO "{name}" VALUES ({ph})', rows)
        gt = gtypes.pop() if len(gtypes) == 1 else 0   # 0 = GEOMETRY
        con.execute("INSERT INTO geometry_columns VALUES (?,?,?,?,?,0)",
                    (name, "geometry", gt, 3 if gt >= 1000 else 2, srid))
    con.commit()
    payload = con.serialize()
    con.close()
    return payload


def write_spatialite(ds: "ray.data.Dataset", out_dir: str, *,
                     table: str = "layer", srid: int = 4326,
                     wkb_col: str = "wkb") -> "ray.data.Dataset":
    """SpatiaLite sink: one .sqlite per block; returns the manifest."""
    return _file_sink(ds, out_dir, ".sqlite",
                      lambda b: spatialite_bytes({table: b},
                                                 srid=srid,
                                                 wkb_col=wkb_col))


# ---------- GeoRSS (ogr/ogrsf_frmts/georss) ----------

def georss_bytes(tab: pa.Table, *, title_col: str = "title",
                 wkb_col: str = "wkb") -> bytes:
    """Feature rows → GeoRSS-Simple Atom feed (the reference's default
    FORMAT=ATOM GEOMETRY_DIALECT=SIMPLE).  Simple coordinates are written
    **lat lon** (ogrgeorsslayer.cpp swaps on write); Point/LineString/
    Polygon(shell-only) map to georss:point/line/polygon."""
    from xml.sax.saxutils import escape

    from ..core.wkt import format_double as fd

    def pairs(xy) -> str:
        xy = np.asarray(xy, dtype=np.float64).reshape(-1, 2)
        return " ".join(f"{fd(p[1])} {fd(p[0])}" for p in xy)   # lat lon

    out = ['<?xml version="1.0" encoding="UTF-8"?>',
           '<feed xmlns="http://www.w3.org/2005/Atom" '
           'xmlns:georss="http://www.georss.org/georss">']
    titles = tab.column(title_col).to_pylist() \
        if title_col in tab.column_names else [None] * tab.num_rows
    for blob, title in zip(tab.column(wkb_col).to_pylist(), titles):
        out.append("<entry>")
        if title is not None:
            out.append(f"<title>{escape(str(title))}</title>")
        if blob is not None:
            g = wkb.loads(blob)
            t = g["type"]
            if t == "Point":
                out.append(f"<georss:point>{pairs(g['xy'])}</georss:point>")
            elif t == "LineString":
                out.append(f"<georss:line>{pairs(g['xy'])}</georss:line>")
            elif t == "Polygon":
                if len(g["rings"]) > 1:
                    raise ValueError("GeoRSS-Simple polygons carry the "
                                     "exterior ring only")
                out.append(
                    f"<georss:polygon>{pairs(g['rings'][0])}</georss:polygon>")
            else:
                raise ValueError(f"GeoRSS-Simple does not handle {t}")
        out.append("</entry>")
    out.append("</feed>")
    return "\n".join(out).encode("utf-8")


def write_georss(ds: "ray.data.Dataset", out_dir: str, *,
                 title_col: str = "title",
                 wkb_col: str = "wkb") -> "ray.data.Dataset":
    """GeoRSS Atom sink: one .xml per block; returns the manifest."""
    return _file_sink(ds, out_dir, ".xml",
                      lambda b: georss_bytes(b, title_col=title_col,
                                             wkb_col=wkb_col))


def _xml_text(s: str) -> str:
    """XML-escape a cell/attribute string.  Bare CR must travel as
    &#xD; (XML 1.0 line-ending normalization folds literal \r to \n on
    parse); control characters outside tab/LF/CR are UNREPRESENTABLE in
    XML 1.0 and raise rather than silently corrupting the document."""
    from xml.sax.saxutils import escape
    for ch in s:
        o = ord(ch)
        if o < 0x20 and ch not in "\t\n\r":
            raise ValueError(f"control character {o:#x} cannot be "
                             "represented in XML 1.0 text")
    return escape(s).replace("\r", "&#xD;")


# ---------- XLSX (ogr/ogrsf_frmts/xlsx) ----------

def _xlsx_col_letter(ci: int) -> str:
    s = ""
    ci += 1
    while ci:
        ci, r = divmod(ci - 1, 26)
        s = chr(65 + r) + s
    return s


def xlsx_bytes(tab: pa.Table, *, sheet: str = "Sheet1") -> bytes:
    """Attribute table -> OOXML spreadsheet bytes (one sheet, row 1 =
    field names).  Strings are written as inline strings (``inlineStr``,
    valid OOXML that needs no sharedStrings part), numbers/booleans as
    native cells; the zip timestamps are fixed so identical tables give
    identical bytes."""
    import io
    import zipfile
    from xml.sax.saxutils import escape

    names = list(tab.column_names)
    cols = {c: tab.column(c).to_pylist() for c in names}

    def cell(ref: str, v) -> str:
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
        if isinstance(v, (int, float)):
            from ..core.wkt import format_double as fd
            num = str(v) if isinstance(v, int) else fd(float(v))
            return f'<c r="{ref}"><v>{num}</v></c>'
        return (f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                f'{_xml_text(str(v))}</t></is></c>')

    rows_xml = []
    hdr = "".join(cell(f"{_xlsx_col_letter(ci)}1", n)
                  for ci, n in enumerate(names))
    rows_xml.append(f'<row r="1">{hdr}</row>')
    for ri in range(tab.num_rows):
        body = "".join(cell(f"{_xlsx_col_letter(ci)}{ri + 2}", cols[n][ri])
                       for ci, n in enumerate(names))
        rows_xml.append(f'<row r="{ri + 2}">{body}</row>')
    ws = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
          '<worksheet xmlns="http://schemas.openxmlformats.org/'
          'spreadsheetml/2006/main"><sheetData>'
          + "".join(rows_xml) + "</sheetData></worksheet>")
    wb = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
          '<workbook xmlns="http://schemas.openxmlformats.org/'
          'spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats'
          '.org/officeDocument/2006/relationships"><sheets>'
          f'<sheet name="{escape(sheet)}" sheetId="1" r:id="rId1"/>'
          '</sheets></workbook>')
    wb_rels = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
               '<Relationships xmlns="http://schemas.openxmlformats.org/'
               'package/2006/relationships">'
               '<Relationship Id="rId1" Type="http://schemas.openxml'
               'formats.org/officeDocument/2006/relationships/worksheet" '
               'Target="worksheets/sheet1.xml"/></Relationships>')
    root_rels = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                 '<Relationships xmlns="http://schemas.openxmlformats.org/'
                 'package/2006/relationships">'
                 '<Relationship Id="rId1" Type="http://schemas.openxml'
                 'formats.org/officeDocument/2006/relationships/office'
                 'Document" Target="xl/workbook.xml"/></Relationships>')
    ctypes = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
              '<Types xmlns="http://schemas.openxmlformats.org/package/'
              '2006/content-types">'
              '<Default Extension="rels" ContentType="application/vnd.'
              'openxmlformats-package.relationships+xml"/>'
              '<Default Extension="xml" ContentType="application/xml"/>'
              '<Override PartName="/xl/workbook.xml" ContentType='
              '"application/vnd.openxmlformats-officedocument.'
              'spreadsheetml.sheet.main+xml"/>'
              '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
              '"application/vnd.openxmlformats-officedocument.'
              'spreadsheetml.worksheet+xml"/></Types>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, payload in (("[Content_Types].xml", ctypes),
                              ("_rels/.rels", root_rels),
                              ("xl/workbook.xml", wb),
                              ("xl/_rels/workbook.xml.rels", wb_rels),
                              ("xl/worksheets/sheet1.xml", ws)):
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, payload)
    return buf.getvalue()


def write_xlsx(ds: "ray.data.Dataset", out_dir: str, *,
               sheet: str = "Sheet1") -> "ray.data.Dataset":
    """XLSX sink: one .xlsx per block; returns the manifest."""
    return _file_sink(ds, out_dir, ".xlsx",
                      lambda b: xlsx_bytes(b, sheet=sheet))


# ---------- JSON-FG (ogr/ogrsf_frmts/jsonfg) ----------

def jsonfg_bytes(tab: pa.Table, *, wkb_col: str = "wkb",
                 time_start_col: str = "time_start",
                 time_end_col: str = "time_end") -> bytes:
    """Feature rows -> OGC JSON-FG FeatureCollection: core conformance,
    WGS84 geometry in ``geometry`` with ``place: null`` (the reference
    writer's layout when no non-WGS84 CRS is set), feature ``time`` from
    the ``time_start``/``time_end`` string columns (equal -> timestamp or
    date instant, else interval)."""
    from ..sources.vector_formats import parse_jsonfg_bytes  # noqa: F401
    names = [c for c in tab.column_names
             if c not in (wkb_col, time_start_col, time_end_col)]
    cols = {c: tab.column(c).to_pylist() for c in names}
    wkbs = tab.column(wkb_col).to_pylist() \
        if wkb_col in tab.column_names else [None] * tab.num_rows
    t0s = tab.column(time_start_col).to_pylist() \
        if time_start_col in tab.column_names else [None] * tab.num_rows
    t1s = tab.column(time_end_col).to_pylist() \
        if time_end_col in tab.column_names else [None] * tab.num_rows
    feats = []
    for i in range(tab.num_rows):
        t0, t1 = t0s[i], t1s[i]
        if t0 is None and t1 is None:
            time = None
        elif t0 == t1:
            key = "date" if t0 is not None and len(t0) == 10 \
                else "timestamp"
            time = {key: t0}
        else:
            time = {"interval": [t0 if t0 is not None else "..",
                                 t1 if t1 is not None else ".."]}
        feats.append({
            "type": "Feature",
            "properties": {c: cols[c][i] for c in names},
            "time": time,
            "place": None,
            "geometry": None if wkbs[i] is None
            else geom_to_geojson(wkb.loads(wkbs[i]))})
    doc = {"type": "FeatureCollection",
           "conformsTo": ["http://www.opengis.net/spec/json-fg-1/0.2/"
                          "conf/core"],
           "features": feats}
    return json.dumps(doc, default=str, separators=(",", ":")).encode()


def write_jsonfg(ds: "ray.data.Dataset", out_dir: str, *,
                 wkb_col: str = "wkb") -> "ray.data.Dataset":
    """JSON-FG sink: one FeatureCollection per block; returns the
    manifest."""
    return _file_sink(ds, out_dir, ".json",
                      lambda b: jsonfg_bytes(b, wkb_col=wkb_col))


# ---------- GeoParquet (ogr/ogrsf_frmts/parquet/ogrparquetwriterlayer.cpp) --

def _geom_bbox(g) -> tuple[float, float, float, float]:
    t = g["type"]
    if t == "Point":
        x, y = (float(v) for v in np.asarray(g["xy"]).reshape(-1)[:2])
        return x, y, x, y
    if t in ("LineString", "MultiPoint"):
        xy = np.asarray(g["xy"], dtype=np.float64).reshape(-1, 2)
        return (float(xy[:, 0].min()), float(xy[:, 1].min()),
                float(xy[:, 0].max()), float(xy[:, 1].max()))
    if t == "Polygon":
        sub = [np.asarray(r, dtype=np.float64) for r in g["rings"][:1]]
    elif t == "MultiLineString":
        sub = [np.asarray(l, dtype=np.float64) for l in g["lines"]]
    elif t == "MultiPolygon":
        sub = [np.asarray(p[0], dtype=np.float64) for p in g["polys"]]
    else:                                       # GeometryCollection
        bs = np.asarray([_geom_bbox(s) for s in g["geoms"]], np.float64)
        return (float(bs[:, 0].min()), float(bs[:, 1].min()),
                float(bs[:, 2].max()), float(bs[:, 3].max()))
    xs = np.concatenate([a[:, 0] for a in sub])
    ys = np.concatenate([a[:, 1] for a in sub])
    return (float(xs.min()), float(ys.min()),
            float(xs.max()), float(ys.max()))


def geoparquet_bytes(tab: pa.Table, *, wkb_col: str = "wkb") -> bytes:
    """Feature table -> GeoParquet 1.1 bytes: standard parquet whose
    file metadata carries the ``geo`` JSON (primary_column, WKB encoding,
    per-file geometry_types + bbox) — the layout the reference's Parquet
    writer emits (ogrparquetwriterdataset.cpp GetGeoMetadata)."""
    import io

    import pyarrow.parquet as pq

    gtypes: set[str] = set()
    minx = miny = float("inf")
    maxx = maxy = float("-inf")
    for blob in tab.column(wkb_col).to_pylist():
        if blob is None:
            continue
        g = wkb.loads(blob)
        gtypes.add(g["type"] + (" Z" if g.get("z") is not None else ""))
        x0, y0, x1, y1 = _geom_bbox(g)
        minx, miny = min(minx, x0), min(miny, y0)
        maxx, maxy = max(maxx, x1), max(maxy, y1)
    col_meta: dict = {"encoding": "WKB",
                      "geometry_types": sorted(gtypes)}
    if minx <= maxx:
        col_meta["bbox"] = [minx, miny, maxx, maxy]
    geo = {"version": "1.1.0", "primary_column": wkb_col,
           "columns": {wkb_col: col_meta}}
    meta = dict(tab.schema.metadata or {})
    meta[b"geo"] = json.dumps(geo, separators=(",", ":")).encode()
    buf = io.BytesIO()
    pq.write_table(tab.replace_schema_metadata(meta), buf)
    return buf.getvalue()


def write_geoparquet(ds: "ray.data.Dataset", out_dir: str, *,
                     wkb_col: str = "wkb") -> "ray.data.Dataset":
    """GeoParquet sink: one .parquet per block with ``geo`` file
    metadata; returns the manifest."""
    return _file_sink(ds, out_dir, ".parquet",
                      lambda b: geoparquet_bytes(b, wkb_col=wkb_col))


# ---------- ODS (ogr/ogrsf_frmts/ods) ----------

_ODS_NS = ('xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
           'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" '
           'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"')


def ods_bytes(tab: pa.Table, *, sheet: str = "Sheet1") -> bytes:
    """Attribute table -> OpenDocument spreadsheet bytes (one sheet,
    row 1 = field names).  The ``mimetype`` member is written FIRST and
    STORED (uncompressed), as the OpenDocument package spec requires;
    zip timestamps are fixed for deterministic bytes."""
    import io
    import zipfile
    from xml.sax.saxutils import escape

    from ..core.wkt import format_double as fd

    def cell(v) -> str:
        if v is None:
            return "<table:table-cell/>"
        if isinstance(v, bool):
            b = "true" if v else "false"
            return (f'<table:table-cell office:value-type="boolean" '
                    f'office:boolean-value="{b}">'
                    f"<text:p>{b}</text:p></table:table-cell>")
        if isinstance(v, (int, float)):
            num = str(v) if isinstance(v, int) else fd(float(v))
            return (f'<table:table-cell office:value-type="float" '
                    f'office:value="{num}">'
                    f"<text:p>{escape(num)}</text:p></table:table-cell>")
        return (f'<table:table-cell office:value-type="string">'
                f"<text:p>{_xml_text(str(v))}</text:p></table:table-cell>")

    names = list(tab.column_names)
    cols = {c: tab.column(c).to_pylist() for c in names}
    rows = ["<table:table-row>"
            + "".join(cell(n) for n in names) + "</table:table-row>"]
    for ri in range(tab.num_rows):
        rows.append("<table:table-row>"
                    + "".join(cell(cols[n][ri]) for n in names)
                    + "</table:table-row>")
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<office:document-content {_ODS_NS} office:version="1.2">'
        '<office:body><office:spreadsheet>'
        f'<table:table table:name="{escape(sheet)}">'
        + "".join(rows) +
        '</table:table></office:spreadsheet></office:body>'
        '</office:document-content>')
    manifest = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<manifest:manifest xmlns:manifest="urn:oasis:names:tc:'
        'opendocument:xmlns:manifest:1.0" manifest:version="1.2">'
        '<manifest:file-entry manifest:full-path="/" manifest:media-type='
        '"application/vnd.oasis.opendocument.spreadsheet"/>'
        '<manifest:file-entry manifest:full-path="content.xml" '
        'manifest:media-type="text/xml"/></manifest:manifest>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zi = zipfile.ZipInfo("mimetype", date_time=(1980, 1, 1, 0, 0, 0))
        zi.compress_type = zipfile.ZIP_STORED
        zf.writestr(zi, "application/vnd.oasis.opendocument.spreadsheet")
        for name, payload in (("content.xml", content),
                              ("META-INF/manifest.xml", manifest)):
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, payload)
    return buf.getvalue()


def write_ods(ds: "ray.data.Dataset", out_dir: str, *,
              sheet: str = "Sheet1") -> "ray.data.Dataset":
    """ODS sink: one .ods per block; returns the manifest."""
    return _file_sink(ds, out_dir, ".ods",
                      lambda b: ods_bytes(b, sheet=sheet))


# ---------- GMT ASCII (ogr/ogrsf_frmts/gmt/ogrgmtlayer.cpp) ----------

_GMT_GEOM = {"Point": "POINT", "LineString": "LINESTRING",
             "Polygon": "POLYGON", "MultiPoint": "MULTIPOINT",
             "MultiLineString": "MULTILINESTRING",
             "MultiPolygon": "MULTIPOLYGON"}


def gmt_bytes(tab: pa.Table, *, wkb_col: str = "wkb") -> bytes:
    """Feature rows -> OGR GMT ASCII: ``# @VGMT1.0 @G<TYPE>`` header,
    ``@N``/``@T`` field declarations, ``>`` segment separators with
    ``# @D`` attribute records, ``@P``/``@H`` shell/hole markers
    (ogrgmtlayer.cpp WriteFeature layout).  One geometry class per file,
    like the reference."""
    from ..core.wkt import format_double as fd

    names = [c for c in tab.column_names if c != wkb_col]
    cols = {c: tab.column(c).to_pylist() for c in names}
    wkbs = tab.column(wkb_col).to_pylist()
    gtypes = {wkb.loads(v)["type"] for v in wkbs if v is not None}
    if len(gtypes) != 1:
        raise ValueError("GMT files carry ONE geometry class; got "
                         f"{sorted(gtypes)}")
    gtype = gtypes.pop()
    if gtype not in _GMT_GEOM:
        raise ValueError(f"GMT cannot store {gtype}")

    types = []
    for c in names:
        t = tab.schema.field(c).type
        types.append("integer" if pa.types.is_integer(t)
                     else "double" if pa.types.is_floating(t)
                     else "string")
    out = [f"# @VGMT1.0 @G{_GMT_GEOM[gtype]}"]
    if names:
        out.append("# @N" + "|".join(names))
        out.append("# @T" + "|".join(types))
    out.append("# FEATURE_DATA")

    def coords(xy):
        xy = np.asarray(xy, dtype=np.float64).reshape(-1, 2)
        return [f"{fd(x)} {fd(y)}" for x, y in xy]

    def dval(c, i):
        v = cols[c][i]
        if v is None:
            return ""
        if isinstance(v, str):
            if "\n" in v or "\r" in v:
                raise ValueError("GMT @D records are line-framed; "
                                 "newlines in attribute values cannot "
                                 "be represented")
            return '"' + v.replace('"', '""') + '"'
        if isinstance(v, float):
            return fd(v)
        return str(v)

    for i, blob in enumerate(wkbs):
        if gtype != "Point":
            out.append(">")
        if names:
            out.append("# @D" + "|".join(dval(c, i) for c in names))
        if blob is None:
            continue
        g = wkb.loads(blob)
        if gtype == "Point":
            out.extend(coords(g["xy"]))
        elif gtype in ("LineString", "MultiPoint"):
            out.extend(coords(g["xy"]))
        elif gtype == "Polygon":
            for ri, r in enumerate(g["rings"]):
                if ri:
                    out.append(">")
                out.append("# @P" if ri == 0 else "# @H")
                out.extend(coords(r))
        elif gtype == "MultiLineString":
            for li, ln in enumerate(g["lines"]):
                if li:
                    out.append(">")
                out.extend(coords(ln))
        else:                                        # MultiPolygon
            first = True
            for rings in g["polys"]:
                for ri, r in enumerate(rings):
                    if not first:
                        out.append(">")
                    first = False
                    out.append("# @P" if ri == 0 else "# @H")
                    out.extend(coords(r))
    return ("\n".join(out) + "\n").encode("utf-8")


def write_gmt(ds: "ray.data.Dataset", out_dir: str, *,
              wkb_col: str = "wkb") -> "ray.data.Dataset":
    """GMT ASCII sink: one .gmt per block; returns the manifest."""
    return _file_sink(ds, out_dir, ".gmt",
                      lambda b: gmt_bytes(b, wkb_col=wkb_col))


# ---------- DGN v7 (ogr/ogrsf_frmts/dgn) ----------

def dgn_bytes(tab: pa.Table, *, wkb_col: str = "wkb",
              level_col: str = "level") -> bytes:
    """Feature rows -> DGN v7 2-D bytes (see core/dgn.py for the element
    subset and the no-seed-file TCB construction)."""
    from ..core.dgn import encode_dgn
    geoms = [wkb.loads(v) for v in tab.column(wkb_col).to_pylist()
             if v is not None]
    levels = None
    if level_col in tab.column_names:
        levels = [int(v) for v, w in
                  zip(tab.column(level_col).to_pylist(),
                      tab.column(wkb_col).to_pylist()) if w is not None]
    return encode_dgn(geoms, levels=levels)


def write_dgn(ds: "ray.data.Dataset", out_dir: str, *,
              wkb_col: str = "wkb") -> "ray.data.Dataset":
    """DGN sink: one .dgn per block; returns the manifest."""
    return _file_sink(ds, out_dir, ".dgn",
                      lambda b: dgn_bytes(b, wkb_col=wkb_col))


# ---------- S-57 (ogr/ogrsf_frmts/s57 + frmts/iso8211) ----------

def s57_bytes(tab: pa.Table, *, wkb_col: str = "wkb",
              objl_col: str = "objl") -> bytes:
    """Feature rows -> S-57 base-cell bytes (Point/LineString subset,
    core/s57.py)."""
    from ..core.s57 import encode_s57
    objls = tab.column(objl_col).to_pylist() \
        if objl_col in tab.column_names else [0] * tab.num_rows
    feats = []
    for blob, objl in zip(tab.column(wkb_col).to_pylist(), objls):
        if blob is None:
            continue
        feats.append({"objl": int(objl or 0), "attrs": {},
                      "geom": wkb.loads(blob)})
    return encode_s57(feats)


def write_s57(ds: "ray.data.Dataset", out_dir: str, *,
              wkb_col: str = "wkb") -> "ray.data.Dataset":
    """S-57 sink: one .000 base cell per block; returns the manifest."""
    return _file_sink(ds, out_dir, ".000",
                      lambda b: s57_bytes(b, wkb_col=wkb_col))


# ---------- VDV-452 (ogr/ogrsf_frmts/vdv) ----------

def vdv_bytes(tab: pa.Table, *, table: str = "layer") -> bytes:
    """Attribute table -> VDV-452 text: tbl/atr/frm/rec/end/eof framing,
    semicolon separators, NULL for nulls, double-quote escaping
    (ogrvdvdatasource.cpp writer layout).  Attribute-only, like the
    reference's non-geometry VDV layers."""
    def esc(s: str) -> str:
        if "\n" in s or "\r" in s:
            raise ValueError("VDV records are line-framed; newlines in "
                             "values cannot be represented")
        return '"' + s.replace('"', '""') + '"'

    names = list(tab.column_names)
    frm = []
    for c in names:
        t = tab.schema.field(c).type
        if pa.types.is_integer(t):
            frm.append("num[10.0]")
        elif pa.types.is_floating(t):
            frm.append("num[20.5]")
        else:
            frm.append("char[80]")
    out = ["mod; DD; MM; 1", "chs; ISO8859-1",
           f"tbl; {table}",
           "atr; " + "; ".join(names),
           "frm; " + "; ".join(frm)]
    cols = {c: tab.column(c).to_pylist() for c in names}
    from ..core.wkt import format_double as fd
    for i in range(tab.num_rows):
        vals = []
        for c in names:
            v = cols[c][i]
            if v is None:
                vals.append("NULL")
            elif isinstance(v, bool):
                vals.append(str(int(v)))
            elif isinstance(v, float):
                vals.append(fd(v))
            elif isinstance(v, int):
                vals.append(str(v))
            else:
                vals.append(esc(str(v)))
        out.append("rec; " + "; ".join(vals))
    out.append(f"end; {tab.num_rows}")
    out.append("eof; 1")
    return ("\n".join(out) + "\n").encode("latin-1")


def write_vdv(ds: "ray.data.Dataset", out_dir: str, *,
              table: str = "layer") -> "ray.data.Dataset":
    """VDV-452 sink: one .x10 per block; returns the manifest."""
    return _file_sink(ds, out_dir, ".x10",
                      lambda b: vdv_bytes(b, table=table))


# ---------- WAsP .map (ogr/ogrsf_frmts/wasp) ----------

def wasp_bytes(tab: pa.Table, *, wkb_col: str = "wkb") -> bytes:
    """LineString features -> WAsP .map text: 4 header lines, then per
    feature '<z>|<z_left> <z_right> <npairs>' followed by the
    coordinate pairs (ogrwasplayer.cpp WriteElevation/WriteRoughness).
    Elevation layout when a ``z`` column exists; roughness-change
    layout when ``z_left``/``z_right`` exist."""
    from ..core.wkt import format_double as fd

    names = tab.column_names
    if "z" in names:
        fields = ["z"]
    elif "z_left" in names and "z_right" in names:
        fields = ["z_left", "z_right"]
    else:
        raise ValueError("WAsP needs a 'z' column (elevation) or "
                         "'z_left'+'z_right' (roughness change)")
    cols = {c: tab.column(c).to_pylist() for c in fields}
    out = ["+ gdal_ray WAsP export", "+ projection 0", "+ 1.0 0.0 1.0 0.0",
           "+ 0.0 0.0"]
    for i, blob in enumerate(tab.column(wkb_col).to_pylist()):
        if blob is None:
            continue
        g = wkb.loads(blob)
        if g["type"] != "LineString":
            raise ValueError("WAsP stores LineString features")
        xy = np.asarray(g["xy"], np.float64)
        head = " ".join(fd(float(cols[f][i])) for f in fields)
        out.append(f"{head} {len(xy)}")
        out.append(" ".join(f"{fd(x)} {fd(y)}" for x, y in xy))
    return ("\n".join(out) + "\n").encode("ascii")


def write_wasp(ds: "ray.data.Dataset", out_dir: str, *,
               wkb_col: str = "wkb") -> "ray.data.Dataset":
    """WAsP sink: one .map per block; returns the manifest."""
    return _file_sink(ds, out_dir, ".map",
                      lambda b: wasp_bytes(b, wkb_col=wkb_col))
