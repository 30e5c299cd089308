"""WKT codec, CSV driver, AAIGrid driver, warp cutline — round-trip and
brute-force oracles (reference: ogr/ogrgeometry.cpp importFromWkt/
exportToWkt, ogr/ogrsf_frmts/csv, frmts/aaigrid, alg/gdalwarper.cpp)."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.core import wkb
from gdal_ray.core import wkt as W
from gdal_ray.core.aaigrid import decode_aaigrid, encode_aaigrid
from gdal_ray.sources import vector_formats as VF
from gdal_ray.sources import vector_writers as VW
from gdal_ray.stages.raster2 import cutline_mask


# ---------- WKT ----------

CASES = [
    {"type": "Point", "xy": np.array([1.5, -2.0])},
    {"type": "Point", "xy": np.array([1.0, 2.0]), "z": 3.0},
    {"type": "Point", "xy": np.array([1.0, 2.0]), "z": 3.0, "m": 4.5},
    {"type": "LineString",
     "xy": np.array([[0, 0], [1.25, 2], [3, 4]], float)},
    {"type": "Polygon",
     "rings": [np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float),
               np.array([[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]], float)]},
    {"type": "MultiPoint", "xy": np.array([[1, 2], [3, 4]], float)},
    {"type": "MultiLineString",
     "lines": [np.array([[0, 0], [1, 1]], float),
               np.array([[2, 2], [3, 3]], float)]},
    {"type": "MultiPolygon",
     "polys": [[np.array([[0, 0], [1, 0], [1, 1], [0, 0]], float)],
               [np.array([[5, 5], [6, 5], [6, 6], [5, 5]], float)]]},
    {"type": "GeometryCollection",
     "geoms": [{"type": "Point", "xy": np.array([9.0, 9.0])},
               {"type": "LineString",
                "xy": np.array([[0, 0], [1, 1]], float)}]},
]


@pytest.mark.parametrize("g", CASES, ids=lambda g: g["type"])
def test_wkt_roundtrip(g):
    s = W.dumps_wkt(g)
    g2 = W.loads_wkt(s)
    assert W.dumps_wkt(g2) == s
    # and the parsed dict round-trips through WKB identically
    assert W.dumps_wkt(wkb.loads(wkb.dumps(g2))) == s


def test_wkt_matches_wkb_parse():
    # the WKT parse of an exported geometry equals the WKB parse bit-wise
    g = CASES[4]
    g2 = W.loads_wkt(W.dumps_wkt(g))
    for r, r2 in zip(g["rings"], g2["rings"]):
        np.testing.assert_array_equal(r, r2)


def test_wkt_empty_and_foreign_forms():
    assert W.dumps_wkt(W.loads_wkt("POLYGON EMPTY")) == "POLYGON EMPTY"
    assert W.dumps_wkt(W.loads_wkt("LINESTRING EMPTY")) == "LINESTRING EMPTY"
    assert W.loads_wkt("POINT(1 2)")["xy"][0] == 1.0       # no-space form
    a = W.loads_wkt("MULTIPOINT(1 2, 3 4)")
    b = W.loads_wkt("MULTIPOINT((1 2), (3 4))")
    np.testing.assert_array_equal(a["xy"], b["xy"])
    zm = W.loads_wkt("POINT ZM (1 2 3 4)")
    assert zm["z"] == 3.0 and zm["m"] == 4.5 - 0.5
    tri = W.loads_wkt("TRIANGLE ((0 0, 1 0, 0 1, 0 0))")
    assert tri["type"] == "Polygon" and len(tri["rings"]) == 1
    tin = W.loads_wkt("TIN (((0 0, 1 0, 0 1, 0 0)), ((1 1, 2 1, 1 2, 1 1)))")
    assert tin["type"] == "MultiPolygon" and len(tin["polys"]) == 2


def test_wkt_circularstring_linearizes_like_wkb():
    # same arc through WKT and through WKB must linearize identically
    import struct
    pts = [(0.0, 0.0), (1.0, 1.0), (2.0, 0.0)]
    blob = struct.pack("<BII", 1, 8, 3) + b"".join(
        struct.pack("<dd", x, y) for x, y in pts)
    g_wkb = wkb.loads(blob)
    g_wkt = W.loads_wkt("CIRCULARSTRING (0 0, 1 1, 2 0)")
    np.testing.assert_allclose(g_wkb["xy"], g_wkt["xy"])


def test_wkt_duckdb_cross_check():
    # DuckDB parses our exports and agrees on the type + point count
    import duckdb
    con = duckdb.connect()
    try:
        con.execute("LOAD spatial")
    except Exception:
        pytest.skip("duckdb spatial extension unavailable offline")
    for g in CASES[:5]:
        s = W.dumps_wkt(g)
        t = con.execute(
            "SELECT ST_GeometryType(ST_GeomFromText(?))", [s]).fetchone()[0]
        assert g["type"].upper() in t.upper()


# ---------- CSV ----------

def _hostile_table():
    return pa.table({
        "fid": pa.array([1, 2, 3], pa.int64()),
        "name": pa.array(["plain", "has,comma", 'has "quote"\nand newline']),
        "score": pa.array([1.5, None, -2.25], pa.float64()),
        "wkb": pa.array([wkb.point(1.25, 2.5), None,
                         wkb.polygon([(0, 0), (2, 0), (2, 2), (0, 0)])],
                        pa.binary()),
    })


def test_csv_roundtrip_hostile():
    tab = _hostile_table()
    t2 = VF.parse_csv_bytes(VW.csv_bytes(tab))
    assert t2.column_names == ["fid", "name", "score", "wkb"]
    assert t2.schema.field("fid").type == pa.int64()
    assert t2.schema.field("score").type == pa.float64()
    assert t2.column("name").to_pylist() == tab.column("name").to_pylist()
    assert t2.column("score").to_pylist() == [1.5, None, -2.25]
    g = wkb.loads(t2.column("wkb").to_pylist()[0])
    assert tuple(g["xy"]) == (1.25, 2.5)
    assert t2.column("wkb").to_pylist()[1] is None
    g3 = wkb.loads(t2.column("wkb").to_pylist()[2])
    assert g3["type"] == "Polygon"


def test_csv_autodetect_and_string_fallback():
    b = b"a,b,c\n1,1.5,x\n2,2,y\n,,\n"
    t = VF.parse_csv_bytes(b)
    assert t.schema.field("a").type == pa.int64()
    assert t.schema.field("b").type == pa.float64()
    assert t.schema.field("c").type == pa.string()
    assert t.column("a").to_pylist() == [1, 2, None]
    # mixed numeric/text falls back to string
    t2 = VF.parse_csv_bytes(b"a\n1\nx\n")
    assert t2.schema.field("a").type == pa.string()


def test_csv_reader_pipeline(ray_session, tmp_path):
    tab = _hostile_table()
    p = tmp_path / "layer.csv"
    p.write_bytes(VW.csv_bytes(tab))
    ds = VF.read_csv(str(p))
    out = ds.take_all()
    assert len(out) == 3
    assert sorted(r["fid"] for r in out) == [1, 2, 3]


def test_csv_sink(ray_session, tmp_path):
    import ray
    tab = _hostile_table()
    ds = ray.data.from_arrow(tab)
    man = VW.write_csv(ds, str(tmp_path / "out")).take_all()
    assert sum(r["n_features"] for r in man) == 3
    back = VF.read_csv([r["path"] for r in man]).take_all()
    assert sorted(r["fid"] for r in back) == [1, 2, 3]


# ---------- AAIGrid ----------

def test_aaigrid_int_roundtrip():
    a = ((np.arange(48).reshape(6, 8) * 7) % 251).astype(np.int32)
    blob = encode_aaigrid(a, xll=100.0, yll=200.0, cellsize=2.5,
                          nodata=-9999)
    a2, gt, nd = decode_aaigrid(blob)
    np.testing.assert_array_equal(a, a2)
    assert a2.dtype == np.int32
    assert gt == (100.0, 2.5, 0.0, 215.0, 0.0, -2.5)
    assert nd == -9999.0


def test_aaigrid_float_roundtrip_exact():
    f = np.arange(12, dtype=np.float64).reshape(3, 4) * 0.25 + 0.125
    a2, gt, nd = decode_aaigrid(encode_aaigrid(f))
    np.testing.assert_array_equal(f, a2)
    assert nd is None


def test_aaigrid_llcenter_and_dxdy():
    b = b"ncols 2\nnrows 2\nxllcenter 10\nyllcenter 20\ncellsize 4\n1 2\n3 4\n"
    a, gt, _ = decode_aaigrid(b)
    assert gt == (8.0, 4.0, 0.0, 26.0, 0.0, -4.0)
    np.testing.assert_array_equal(a, [[1, 2], [3, 4]])
    b2 = b"ncols 2\nnrows 1\nxllcorner 0\nyllcorner 0\ndx 2\ndy 3\n5 6\n"
    _, gt2, _ = decode_aaigrid(b2)
    assert gt2 == (0.0, 2.0, 0.0, 3.0, 0.0, -3.0)


def test_aaigrid_value_count_mismatch_raises():
    with pytest.raises(ValueError):
        decode_aaigrid(b"ncols 2\nnrows 2\nxllcorner 0\nyllcorner 0\n"
                       b"cellsize 1\n1 2 3\n")


# ---------- cutline ----------

def _brute_cutline(arr, gt, polys, nodata, invert=False):
    h, w = arr.shape[:2]
    out = arr.copy()
    for i in range(h):
        for j in range(w):
            x = gt[0] + (j + 0.5) * gt[1]
            y = gt[3] + (i + 0.5) * gt[5]
            inside = False
            for rings in polys:
                par = 0
                for ring in rings:
                    # even-odd ray cast to +x
                    for k in range(len(ring) - 1):
                        (x1, y1), (x2, y2) = ring[k], ring[k + 1]
                        if (y1 > y) != (y2 > y):
                            if x < x1 + (y - y1) * (x2 - x1) / (y2 - y1):
                                par += 1
                inside |= bool(par % 2)
            keep = (not inside) if invert else inside
            if not keep:
                out[i, j] = nodata
    return out


def test_cutline_matches_brute_force():
    rng = np.random.default_rng(7)
    arr = rng.integers(1, 100, size=(12, 12)).astype(np.int32)
    gt = (0.0, 1.0, 0.0, 12.0, 0.0, -1.0)
    # polygon with a hole + a second disjoint polygon
    polys = [
        [np.array([[0.2, 0.2], [8.3, 0.2], [8.3, 8.3], [0.2, 8.3],
                   [0.2, 0.2]]),
         np.array([[2.2, 2.2], [5.3, 2.2], [5.3, 5.3], [2.2, 5.3],
                   [2.2, 2.2]])],
        [np.array([[9.2, 9.2], [11.3, 9.2], [11.3, 11.3], [9.2, 9.2]])],
    ]
    got = cutline_mask(arr, gt, polys, nodata=0)
    exp = _brute_cutline(arr, gt, polys, 0)
    np.testing.assert_array_equal(got, exp)
    inv = cutline_mask(arr, gt, polys, nodata=0, invert=True)
    np.testing.assert_array_equal(inv, _brute_cutline(arr, gt, polys, 0,
                                                      invert=True))
    # hole really subtracts: row 8 center y=3.5 is inside the hole band
    # (2.2..5.3), row 4 center y=7.5 is in the shell but not the hole
    assert got[8, 3] == 0 and got[4, 3] != 0


def test_cutline_wkb_and_multiband():
    arr = np.ones((6, 6, 3), dtype=np.uint8) * 9
    blob = wkb.polygon([(0, 0), (3.5, 0), (0, 3.5), (0, 0)])
    out = cutline_mask(arr, (0, 1, 0, 6, 0, -1), blob, nodata=0)
    # center (j+0.5, 5.5-i) inside x+y<=3.5 <=> j - i <= -2.5 (ints: j<=i-3)
    kept = (out[..., 0] != 0)
    ii, jj = np.meshgrid(np.arange(6), np.arange(6), indexing="ij")
    np.testing.assert_array_equal(kept, jj <= ii - 3)
    assert (out[kept] == 9).all() and (out[~kept] == 0).all()


# ---------- GPX / KML ----------

def test_gpx_roundtrip():
    tab = pa.table({
        "name": pa.array(["wp & <x>", "trk"]),
        "wkb": pa.array([wkb.point(1.25, 2.5),
                         wkb.dumps({"type": "LineString",
                                    "xy": np.array([[0, 0], [1.5, 2],
                                                    [3, 4]], float)})],
                        pa.binary())})
    t = VF.parse_gpx_bytes(VW.gpx_bytes(tab, name_col="name"))
    assert t.column("layer").to_pylist() == ["waypoints", "tracks"]
    assert t.column("name").to_pylist() == ["wp & <x>", "trk"]
    p = wkb.loads(t.column("wkb").to_pylist()[0])
    assert tuple(p["xy"]) == (1.25, 2.5)
    ln = wkb.loads(t.column("wkb").to_pylist()[1])
    np.testing.assert_array_equal(ln["xy"], [[0, 0], [1.5, 2], [3, 4]])


def test_gpx_route_parse():
    g = (b'<?xml version="1.0"?><gpx version="1.1" '
         b'xmlns="http://www.topografix.com/GPX/1/1">'
         b'<rte><name>r</name><rtept lat="1" lon="2"/>'
         b'<rtept lat="3" lon="4"/></rte></gpx>')
    t = VF.parse_gpx_bytes(g)
    assert t.column("layer").to_pylist() == ["routes"]
    ln = wkb.loads(t.column("wkb").to_pylist()[0])
    np.testing.assert_array_equal(ln["xy"], [[2, 1], [4, 3]])


def test_kml_roundtrip_polygon_with_hole():
    tab = pa.table({
        "name": pa.array(["poly"]),
        "wkb": pa.array([wkb.polygon(
            [(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)],
            holes=[[(1, 1), (2, 1), (2, 2), (1, 2), (1, 1)]])],
            pa.binary())})
    t = VF.parse_kml_bytes(VW.kml_bytes(tab, name_col="name"))
    g = wkb.loads(t.column("wkb").to_pylist()[0])
    assert g["type"] == "Polygon" and len(g["rings"]) == 2
    np.testing.assert_array_equal(
        g["rings"][1], [[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]])


def test_kml_multigeometry_flattens():
    k = (b'<?xml version="1.0"?>'
         b'<kml xmlns="http://www.opengis.net/kml/2.2"><Document>'
         b'<Placemark><name>m</name><MultiGeometry>'
         b'<Point><coordinates>1,2</coordinates></Point>'
         b'<LineString><coordinates>0,0 1,1</coordinates></LineString>'
         b'</MultiGeometry></Placemark></Document></kml>')
    t = VF.parse_kml_bytes(k)
    assert t.num_rows == 2
    assert t.column("name").to_pylist() == ["m", "m"]


def test_gpx_kml_ray_readers(ray_session, tmp_path):
    tab = pa.table({
        "name": pa.array(["a", "b"]),
        "wkb": pa.array([wkb.point(1.0, 2.0), wkb.point(3.0, 4.0)],
                        pa.binary())})
    (tmp_path / "a.gpx").write_bytes(VW.gpx_bytes(tab, name_col="name"))
    (tmp_path / "a.kml").write_bytes(VW.kml_bytes(tab, name_col="name"))
    assert len(VF.read_gpx(str(tmp_path / "a.gpx")).take_all()) == 2
    assert len(VF.read_kml(str(tmp_path / "a.kml")).take_all()) == 2


# ---------- Arrow IPC ----------

def test_arrow_ipc_both_framings():
    t = pa.table({"a": pa.array([1, 2, 3], pa.int64()),
                  "b": pa.array([b"x", None, b"z"], pa.binary())})
    for ff in (True, False):
        t2 = VF.parse_arrow_ipc_bytes(VW.arrow_ipc_bytes(t, file_format=ff))
        assert t2.equals(t)
    assert VW.arrow_ipc_bytes(t, file_format=True)[:6] == b"ARROW1"


def test_arrow_ipc_ray_reader(ray_session, tmp_path):
    t = pa.table({"a": pa.array([1, 2], pa.int64())})
    p = tmp_path / "x.arrow"
    p.write_bytes(VW.arrow_ipc_bytes(t))
    assert sorted(r["a"] for r in VF.read_arrow_ipc(str(p)).take_all()) \
        == [1, 2]


# ---------- ENVI ----------

def test_envi_all_interleaves_dtypes_byteorders():
    from gdal_ray.core.envi import decode_envi, encode_envi
    rng = np.random.default_rng(1)
    for dt in (np.uint8, np.int16, np.uint16, np.int32,
               np.float32, np.float64):
        a = rng.integers(0, 200, size=(5, 7, 3)).astype(dt)
        for il in ("bsq", "bil", "bip"):
            for bo in (0, 1):
                hdr, raw = encode_envi(a, interleave=il, byte_order=bo)
                a2 = decode_envi(hdr, raw)
                assert np.array_equal(a, a2), (dt, il, bo)
                assert a2.dtype == np.dtype(dt)


def test_envi_single_band_and_header_offset():
    from gdal_ray.core.envi import decode_envi, encode_envi
    a = np.arange(12, dtype=np.uint8).reshape(3, 4)
    hdr, raw = encode_envi(a)
    a2 = decode_envi(hdr, raw)
    assert a2.shape == (3, 4, 1)
    np.testing.assert_array_equal(a2[:, :, 0], a)
    # foreign header with offset + MSB order
    hdr2 = (b"ENVI\nsamples = 2\nlines = 1\nbands = 1\n"
            b"header offset = 3\ndata type = 12\ninterleave = bip\n"
            b"byte order = 1\n")
    raw2 = b"\0\0\0" + (258).to_bytes(2, "big") + (772).to_bytes(2, "big")
    out = decode_envi(hdr2, raw2)
    assert out[0, 0, 0] == 258 and out[0, 1, 0] == 772


# ---------- layer_info (ogrinfo -so analog) ----------

def test_layer_info(ray_session):
    import ray

    from gdal_ray.stages.vector import layer_info
    tab = pa.table({"wkb": pa.array([
        wkb.point(1.0, 2.0),
        wkb.point(-3.0, 7.0),
        wkb.polygon([(0, 0), (10, 0), (10, 5), (0, 5), (0, 0)]),
        wkb.dumps({"type": "LineString",
                   "xy": np.array([[-5, -5], [4, 4]], float)}),
        None,
    ], pa.binary())})
    info = layer_info(ray.data.from_arrow(tab)).to_pylist()[0]
    assert info["n_features"] == 4
    assert info["n_point"] == 2 and info["n_polygon"] == 1
    assert info["n_linestring"] == 1
    assert (info["minx"], info["miny"]) == (-5.0, -5.0)
    assert (info["maxx"], info["maxy"]) == (10.0, 7.0)


# ---------- GeoJSONSeq ----------

def test_geojsonseq_both_framings():
    tab = pa.table({"fid": pa.array([1, 2], pa.int64()),
                    "wkb": pa.array([wkb.point(1.25, 2.5), None],
                                    pa.binary())})
    for rs in (False, True):
        t2 = VF.parse_geojsonseq_bytes(VW.geojsonseq_bytes(tab, rs=rs))
        assert t2.column("fid").to_pylist() == [1, 2]
        assert wkb.loads(t2.column("wkb").to_pylist()[0])["xy"][0] == 1.25
        assert t2.column("wkb").to_pylist()[1] is None


def test_geojsonseq_ray_reader(ray_session, tmp_path):
    tab = pa.table({"fid": pa.array([1, 2, 3], pa.int64()),
                    "wkb": pa.array([wkb.point(float(i), 0.0)
                                     for i in range(3)], pa.binary())})
    p = tmp_path / "x.geojsonl"
    p.write_bytes(VW.geojsonseq_bytes(tab))
    assert sorted(r["fid"] for r in
                  VF.read_geojsonseq(str(p)).take_all()) == [1, 2, 3]


# ---------- netCDF-3 ----------

def test_netcdf3_multivar_roundtrip():
    from gdal_ray.core.netcdf3 import decode_netcdf, encode_netcdf
    z = (np.arange(48).reshape(6, 8) * 3 % 251).astype(np.int16)
    t = np.linspace(0, 1, 48).reshape(6, 8)
    blob = encode_netcdf(
        {"y": 6, "x": 8},
        {"elev": {"dims": ("y", "x"), "data": z,
                  "attrs": {"units": "m", "scale_factor": 0.5,
                            "_FillValue": np.int16(-32768)}},
         "temp": {"dims": ("y", "x"), "data": t, "attrs": {}}},
        {"title": "test grid", "version": 3})
    assert blob[:4] == b"CDF\x01"
    dims, vs, g = decode_netcdf(blob)
    assert dims == {"y": 6, "x": 8}
    assert g["title"] == "test grid"
    np.testing.assert_array_equal(vs["elev"]["data"], z)
    assert vs["elev"]["data"].dtype == np.int16
    assert float(vs["elev"]["attrs"]["scale_factor"]) == 0.5
    assert int(vs["elev"]["attrs"]["_FillValue"]) == -32768
    np.testing.assert_array_equal(vs["temp"]["data"], t)
    assert vs["temp"]["data"].dtype == np.float64


def test_netcdf3_dtype_matrix_and_1d():
    from gdal_ray.core.netcdf3 import decode_netcdf, encode_netcdf
    for dt in (np.int8, np.int16, np.int32, np.float32, np.float64):
        a = (np.arange(10) % 100).astype(dt).reshape(2, 5)
        _, vs, _ = decode_netcdf(encode_netcdf(
            {"a": 2, "b": 5}, {"v": {"dims": ("a", "b"), "data": a}}, {}))
        np.testing.assert_array_equal(vs["v"]["data"], a)
    _, vs, _ = decode_netcdf(encode_netcdf(
        {"x": 3}, {"v": {"dims": ("x",),
                         "data": np.array([1.5, 2.5, -1], np.float32)}}, {}))
    np.testing.assert_array_equal(vs["v"]["data"], [1.5, 2.5, -1])


def test_netcdf3_record_dim_raises():
    from gdal_ray.core.netcdf3 import decode_netcdf
    import struct
    # a record dim (length 0) must raise the honest boundary
    hdr = (b"CDF\x01" + struct.pack(">i", 1) +
           struct.pack(">ii", 0x0A, 1) + struct.pack(">i", 4) + b"time" +
           struct.pack(">i", 0) + struct.pack(">ii", 0, 0) +
           struct.pack(">ii", 0, 0))
    with pytest.raises(NotImplementedError):
        decode_netcdf(hdr)


# ---------- histogram equalization (gdalenhance analog) ----------

def test_equalize_matches_brute_force():
    from gdal_ray.stages.raster2 import equalize_array
    rng = np.random.default_rng(11)
    a = rng.integers(0, 256, size=(20, 20)).astype(np.uint8)
    e = equalize_array(a)
    flat = a.ravel()
    counts = np.bincount(flat, minlength=256)
    cdf = np.cumsum(counts)
    cmin = cdf[np.nonzero(counts)[0][0]]
    exp = np.floor((cdf[flat].astype(float) - cmin) * 255.0
                   / (flat.size - cmin) + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(e.ravel(), exp)
    # full-range output on non-constant input; constant maps to zero
    assert e.max() == 255
    assert equalize_array(np.full((4, 4), 9, np.uint8)).max() == 0


def test_equalize_batch_stage():
    from gdal_ray.core import codecs
    from gdal_ray.stages.raster2 import equalize, equalize_array
    img = (np.arange(64).reshape(8, 8) % 11 * 20).astype(np.uint8)
    b = pa.table({"image_id": [1],
                  "bytes": [codecs.encode(img, "png")],
                  "fmt": ["png"]})
    out = equalize(b)
    dec = codecs.decode(out.column("bytes")[0].as_py(), "png")
    np.testing.assert_array_equal(dec, equalize_array(img))


# ---------- XYZ ASCII driver ----------

def test_xyz_roundtrip_and_foreign_forms():
    from gdal_ray.core.aaigrid import decode_xyz, encode_xyz
    a = ((np.arange(20).reshape(4, 5) * 13) % 97).astype(np.int32)
    a2, gt = decode_xyz(encode_xyz(a, xll=10.0, yll=20.0, cellsize=2.0))
    np.testing.assert_array_equal(a, a2)
    assert a2.dtype == np.int32
    assert gt == (10.0, 2.0, 0.0, 28.0, 0.0, -2.0)
    # comma-separated, headerless, south-to-north scan order
    f = np.array([[1.5, 2.5], [3.5, 4.5]])
    lines = [f"{j + 0.5},{0.5 + (1 - i)},{f[i, j]!r}"
             for i in range(2) for j in range(2)]
    f2, _ = decode_xyz("\n".join(lines[2:] + lines[:2]).encode())
    np.testing.assert_array_equal(f, f2)
    with pytest.raises(ValueError):
        decode_xyz(b"0.5 0.5 1\n1.5 0.5 2\n1.5 1.5 3\n")  # irregular


def test_csv_wkt_misfire_and_bad_wkt_fallbacks():
    # heuristic misfire ("point of sale") stays a string column; an
    # explicit WKT column nulls unparseable values (reference behavior)
    t = VF.parse_csv_bytes(b"a\npoint of sale\ntin roof\n")
    assert t.schema.field("a").type == pa.string()
    assert t.column("a").to_pylist() == ["point of sale", "tin roof"]
    t2 = VF.parse_csv_bytes(b"WKT\nPOINT (1 2)\ngarbage\n")
    vals = t2.column("wkb").to_pylist()
    assert vals[0] is not None and vals[1] is None


def test_codecs_dispatch_aaigrid_xyz():
    from gdal_ray.core import codecs
    a = ((np.arange(24).reshape(4, 6) * 5) % 97).astype(np.int32)
    for fmt in ("aaigrid", "xyz"):
        np.testing.assert_array_equal(codecs.decode(codecs.encode(a, fmt),
                                                    fmt), a)


# ---------- code-review regression pins ----------

def test_netcdf3_uint8_unsigned_convention():
    from gdal_ray.core.netcdf3 import decode_netcdf, encode_netcdf
    a = np.array([[200, 10], [255, 0]], np.uint8)
    _, vs, _ = decode_netcdf(encode_netcdf(
        {"y": 2, "x": 2}, {"v": {"dims": ("y", "x"), "data": a}}, {}))
    assert vs["v"]["data"].dtype == np.uint8
    np.testing.assert_array_equal(vs["v"]["data"], a)
    assert str(vs["v"]["attrs"]["_Unsigned"]).lower() == "true"


def test_netcdf3_int_attrs_stay_integral():
    from gdal_ray.core.netcdf3 import decode_netcdf, encode_netcdf
    _, vs, g = decode_netcdf(encode_netcdf(
        {"x": 1}, {"v": {"dims": ("x",), "data": np.array([1], np.int16),
                         "attrs": {"flag": 7}}}, {"version": 3}))
    assert np.atleast_1d(g["version"]).dtype == np.int32
    assert np.atleast_1d(vs["v"]["attrs"]["flag"]).dtype == np.int32
    # out-of-NC_INT-range ints fall back to double (netCDF-3 has no int64)
    _, _, g2 = decode_netcdf(encode_netcdf(
        {"x": 1}, {"v": {"dims": ("x",), "data": np.array([1], np.int16)}},
        {"big": 2**40}))
    assert float(np.atleast_1d(g2["big"])[0]) == 2.0**40


def test_wkt_point_empty_export_and_nonfinite():
    assert W.dumps_wkt(W.loads_wkt("POINT EMPTY")) == "POINT EMPTY"
    assert W.format_double(float("nan")) == "nan"
    assert W.format_double(float("-inf")) == "-inf"


def test_csv_nan_inf_roundtrip():
    tab = pa.table({"f": pa.array([float("nan"), float("inf"), 1.5],
                                  pa.float64())})
    t2 = VF.parse_csv_bytes(VW.csv_bytes(tab))
    vals = t2.column("f").to_pylist()
    assert np.isnan(vals[0]) and vals[1] == float("inf") and vals[2] == 1.5
    assert t2.schema.field("f").type == pa.float64()


def test_csv_duplicate_headers_uniquified():
    t = VF.parse_csv_bytes(b"a,a\n1,2\n")
    assert t.column_names == ["a", "a_1"]
    assert t.column("a").to_pylist() == [1]
    assert t.column("a_1").to_pylist() == [2]


def test_aaigrid_xyz_nan_cells():
    from gdal_ray.core.aaigrid import (decode_aaigrid, decode_xyz,
                                       encode_aaigrid, encode_xyz)
    f = np.array([[1.5, float("nan")]])
    f2, _, _ = decode_aaigrid(encode_aaigrid(f))
    assert f2[0, 0] == 1.5 and np.isnan(f2[0, 1])
    f3, _ = decode_xyz(encode_xyz(f))
    assert f3[0, 0] == 1.5 and np.isnan(f3[0, 1])


def test_xyz_duplicate_and_gap_detection():
    from gdal_ray.core.aaigrid import decode_xyz
    with pytest.raises(ValueError):   # duplicate point + missing cell
        decode_xyz(b"0.5 0.5 1\n0.5 0.5 2\n1.5 0.5 3\n1.5 1.5 4\n")
    with pytest.raises(ValueError):   # irregular column spacing
        decode_xyz(b"0.5 0.5 1\n1.5 0.5 2\n3.5 0.5 3\n")


def test_kml_inner_before_outer_ring_order():
    k = (b'<kml xmlns="http://www.opengis.net/kml/2.2"><Document>'
         b'<Placemark><Polygon>'
         b'<innerBoundaryIs><LinearRing><coordinates>1,1 2,1 2,2 1,1'
         b'</coordinates></LinearRing></innerBoundaryIs>'
         b'<outerBoundaryIs><LinearRing><coordinates>0,0 4,0 4,4 0,0'
         b'</coordinates></LinearRing></outerBoundaryIs>'
         b'</Polygon></Placemark></Document></kml>')
    g = wkb.loads(VF.parse_kml_bytes(k).column("wkb").to_pylist()[0])
    assert g["rings"][0][:, 0].max() == 4.0    # outer shell first


# ---------- Zarr v2 ----------

def test_zarr_roundtrip_and_sparse(tmp_path):
    from gdal_ray.core.zarr2 import (chunk_grid, read_zarr,
                                     read_zarr_chunk, read_zarr_meta,
                                     write_zarr)
    d = str(tmp_path / "z")
    a = ((np.arange(35 * 29).reshape(35, 29) * 7) % 251).astype(np.int32)
    paths = write_zarr(d, a, chunks=(16, 16), attrs={"units": "m"})
    assert len(paths) == 6                      # ceil(35/16)*ceil(29/16)
    np.testing.assert_array_equal(read_zarr(d), a)
    meta = read_zarr_meta(d)
    assert len(chunk_grid(meta)) == 6
    import os
    os.remove(str(tmp_path / "z" / "1.1"))      # sparse: missing chunk
    assert (read_zarr_chunk(d, meta, 1, 1) == 0).all()


def test_zarr_null_compressor_float(tmp_path):
    from gdal_ray.core.zarr2 import read_zarr, write_zarr
    d = str(tmp_path / "z2")
    f = np.linspace(0, 1, 24).reshape(4, 6)
    write_zarr(d, f, chunks=(3, 4), compressor=None)
    np.testing.assert_array_equal(read_zarr(d), f)


def test_zarr_chunk_parallel_reader(ray_session, tmp_path):
    from gdal_ray.core.zarr2 import write_zarr
    from gdal_ray.pipelines.catalog import read_zarr_chunks
    d = str(tmp_path / "z3")
    a = np.arange(100, dtype=np.int32).reshape(10, 10)
    write_zarr(d, a, chunks=(4, 4))
    rows = read_zarr_chunks(d).take_all()
    assert len(rows) == 9
    tot = 0
    for r in rows:
        blk = np.frombuffer(r["data"], dtype=r["dtype"]).reshape(4, 4)
        tot += int(blk[:r["valid_h"], :r["valid_w"]].sum())
    assert tot == int(a.sum())


# ---------- GML ----------

def test_gml_roundtrip_with_hole_and_escapes():
    tab = pa.table({
        "name": pa.array(["pt & <x>", "ln", "pg"]),
        "wkb": pa.array([
            wkb.point(1.25, 2.5),
            wkb.dumps({"type": "LineString",
                       "xy": np.array([[0, 0], [1.5, 2]], float)}),
            wkb.polygon([(0, 0), (4, 0), (4, 4), (0, 0)],
                        holes=[[(1, 1), (2, 1), (2, 2), (1, 1)]])],
            pa.binary())})
    t = VF.parse_gml_bytes(VW.gml_bytes(tab, layer="roads"))
    assert t.num_rows == 3
    assert t.column("name").to_pylist() == ["pt & <x>", "ln", "pg"]
    assert tuple(wkb.loads(t.column("wkb").to_pylist()[0])["xy"]) \
        == (1.25, 2.5)
    assert len(wkb.loads(t.column("wkb").to_pylist()[2])["rings"]) == 2


def test_gml2_coordinates_form():
    g2 = (b'<gml:FeatureCollection xmlns:gml='
          b'"http://www.opengis.net/gml"><gml:featureMember><f>'
          b'<gml:Point><gml:coordinates>3,4</gml:coordinates></gml:Point>'
          b'</f></gml:featureMember></gml:FeatureCollection>')
    t = VF.parse_gml_bytes(g2)
    assert tuple(wkb.loads(t.column("wkb").to_pylist()[0])["xy"]) \
        == (3.0, 4.0)


# ---------- GPKG tile pyramid ----------

def test_gpkg_tiles_roundtrip_topdown_rows():
    import sqlite3

    from gdal_ray.pipelines.catalog import (gpkg_tiles_bytes,
                                            parse_gpkg_tiles_bytes)
    tiles = [(3, 1, 2, b"pay-a"), (5, 31, 0, b"edge")]
    blob = gpkg_tiles_bytes(tiles)
    out, zooms = parse_gpkg_tiles_bytes(blob)
    assert sorted(out) == sorted(tiles) and zooms == [3, 5]
    con = sqlite3.connect(":memory:")
    con.deserialize(blob)
    # GPKG rows are TOP-DOWN (not TMS): y stays 2 at z=3
    assert con.execute("SELECT tile_row FROM tiles WHERE zoom_level=3") \
        .fetchone()[0] == 2
    assert con.execute("SELECT matrix_width FROM gpkg_tile_matrix "
                       "WHERE zoom_level=5").fetchone()[0] == 32


# ---------- OSM PBF ----------

def test_osm_pbf_roundtrip_both_compressions():
    from gdal_ray.core.osmpbf import decode_osm_pbf, encode_osm_pbf
    nodes = [(101, 13.25, 52.5, {"amenity": "cafe", "name": "A"}),
             (102, -0.125, 51.5, {}),
             (205, 139.75, -35.25, {"highway": "stop"})]
    ways = [(9001, [101, 102, 205], {"highway": "residential"}),
            (9002, [205, 101], {})]
    for comp in (True, False):
        n2, w2 = decode_osm_pbf(encode_osm_pbf(nodes, ways, compress=comp))
        assert len(n2) == 3 and len(w2) == 2
        for (i1, lo1, la1, t1), (i2, lo2, la2, t2) in zip(nodes, n2):
            assert i1 == i2 and t1 == t2
            assert abs(lo1 - lo2) < 1e-7 and abs(la1 - la2) < 1e-7
        assert w2[0] == (9001, [101, 102, 205],
                         {"highway": "residential"})
        assert w2[1] == (9002, [205, 101], {})


def test_osm_pbf_blob_scan_and_ray_reader(ray_session, tmp_path):
    from gdal_ray.core.osmpbf import encode_osm_pbf
    from gdal_ray.sources.vector_formats import read_osm_pbf, scan_osm_blobs
    nodes = [(i, i * 0.1, -i * 0.1, {}) for i in range(1, 6)]
    p = tmp_path / "x.osm.pbf"
    p.write_bytes(encode_osm_pbf(nodes, [(99, [1, 2, 3], {})]))
    ranges = scan_osm_blobs(str(p))
    assert len(ranges) == 1          # one data blob (header blob skipped)
    rows = read_osm_pbf(str(p)).take_all()
    kinds = sorted(r["kind"] for r in rows)
    assert kinds.count("node") == 5 and kinds.count("way") == 1
    way = [r for r in rows if r["kind"] == "way"][0]
    assert way["refs"] == [1, 2, 3]


# ---------- MapInfo MIF/MID ----------

def test_mif_mid_roundtrip_all_types():
    tab = pa.table({
        "fid": pa.array([1, 2, 3, 4], pa.int64()),
        "name": pa.array(["a", "b,c", None, "d"]),
        "score": pa.array([1.5, None, -2.0, 0.25], pa.float64()),
        "wkb": pa.array([
            wkb.point(1.25, 2.5),
            wkb.dumps({"type": "LineString",
                       "xy": np.array([[0, 0], [1, 2], [3, 4]], float)}),
            wkb.polygon([(0, 0), (4, 0), (4, 4), (0, 0)],
                        holes=[[(1, 1), (2, 1), (2, 2), (1, 1)]]),
            None], pa.binary())})
    pair = VW.mif_bytes(tab)
    t2 = VF.parse_mif_bytes(pair["mif"], pair["mid"])
    assert t2.column("fid").to_pylist() == [1, 2, 3, 4]
    assert t2.column("name").to_pylist() == ["a", "b,c", None, "d"]
    assert t2.column("score").to_pylist() == [1.5, None, -2.0, 0.25]
    assert tuple(wkb.loads(t2.column("wkb").to_pylist()[0])["xy"]) \
        == (1.25, 2.5)
    assert len(wkb.loads(t2.column("wkb").to_pylist()[2])["rings"]) == 2
    assert t2.column("wkb").to_pylist()[3] is None


def test_mif_foreign_line_and_styling_skipped():
    mif = (b"Version 300\nColumns 1\n  a Integer\nData\n\n"
           b"LINE 0 0 5 5\nPen (1,2,0)\nPOINT 1 2\nSymbol (34,0,12)\n")
    t = VF.parse_mif_bytes(mif, b"7\n8\n")
    assert t.num_rows == 2
    g = wkb.loads(t.column("wkb").to_pylist()[0])
    np.testing.assert_array_equal(g["xy"], [[0, 0], [5, 5]])
    assert t.column("a").to_pylist() == [7, 8]


def test_mif_sink_and_reader(ray_session, tmp_path):
    import ray
    tab = pa.table({"fid": pa.array([1, 2], pa.int64()),
                    "wkb": pa.array([wkb.point(1.0, 2.0),
                                     wkb.point(3.0, 4.0)], pa.binary())})
    man = VW.write_mif(ray.data.from_arrow(tab),
                       str(tmp_path / "o")).take_all()
    assert sum(r["n_features"] for r in man) == 2
    back = VF.read_mif([r["path"] for r in man]).take_all()
    assert sorted(r["fid"] for r in back) == [1, 2]


# ---------- DXF ----------

def test_dxf_roundtrip_entities():
    tab = pa.table({
        "layer": pa.array(["roads", "b", "parks"]),
        "wkb": pa.array([
            wkb.point(1.25, 2.5),
            wkb.dumps({"type": "LineString",
                       "xy": np.array([[0, 0], [1, 2], [3, 4]], float)}),
            wkb.polygon([(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)])],
            pa.binary())})
    t = VF.parse_dxf_bytes(VW.dxf_bytes(tab, layer_col="layer"))
    assert t.column("layer").to_pylist() == ["roads", "b", "parks"]
    g2 = wkb.loads(t.column("wkb").to_pylist()[2])
    assert g2["type"] == "Polygon"
    np.testing.assert_array_equal(
        g2["rings"][0], [[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]])


def test_dxf_foreign_line_and_polyline_vertex_seqend():
    foreign = "\n".join([
        "0", "SECTION", "2", "ENTITIES",
        "0", "LINE", "8", "L1", "10", "0", "20", "0",
        "11", "5", "21", "5",
        "0", "POLYLINE", "8", "L2", "70", "1",
        "0", "VERTEX", "10", "0", "20", "0",
        "0", "VERTEX", "10", "2", "20", "0",
        "0", "VERTEX", "10", "2", "20", "2",
        "0", "SEQEND", "0", "ENDSEC", "0", "EOF"]).encode()
    t = VF.parse_dxf_bytes(foreign)
    assert t.num_rows == 2
    ln = wkb.loads(t.column("wkb").to_pylist()[0])
    np.testing.assert_array_equal(ln["xy"], [[0, 0], [5, 5]])
    pg = wkb.loads(t.column("wkb").to_pylist()[1])
    assert pg["type"] == "Polygon" and len(pg["rings"][0]) == 4


# ---------- second code-review regression pins ----------

def test_pmtiles_leaf_directories_raise():
    import struct

    from gdal_ray.core.pmtiles import decode_pmtiles, encode_pmtiles
    blob = bytearray(encode_pmtiles([(3, 1, 2, b"a")]))
    struct.pack_into("<Q", blob, 48, 10)    # fake leaf_dirs_length
    with pytest.raises(NotImplementedError):
        decode_pmtiles(bytes(blob))


def test_mif_pline_multiple_and_default_tab_delimiter():
    mif = (b"Version 300\nColumns 1\n  a Integer\nData\n\n"
           b"Pline Multiple 2\n2\n0 0\n1 1\n3\n5 5\n6 6\n7 7\n")
    t = VF.parse_mif_bytes(mif, b"7\n")
    g = wkb.loads(t.column("wkb").to_pylist()[0])
    assert g["type"] == "MultiLineString" and len(g["lines"]) == 2
    # no Delimiter clause -> TAB (MapInfo default)
    mif2 = (b"Version 300\nColumns 2\n  a Integer\n  b Char(10)\n"
            b"Data\n\nPOINT 1 2\n")
    t2 = VF.parse_mif_bytes(mif2, b"7\tx\n")
    assert t2.column("a").to_pylist() == [7]
    assert t2.column("b").to_pylist() == ["x"]


def test_gml_property_wrapped_geometry():
    g = (b'<gml:FeatureCollection xmlns:gml="http://www.opengis.net/gml">'
         b"<gml:featureMember><f><name>n1</name>"
         b"<geometryProperty><gml:Point><gml:pos>3 4</gml:pos>"
         b"</gml:Point></geometryProperty></f></gml:featureMember>"
         b"</gml:FeatureCollection>")
    t = VF.parse_gml_bytes(g)
    assert t.num_rows == 1
    assert tuple(wkb.loads(t.column("wkb").to_pylist()[0])["xy"]) \
        == (3.0, 4.0)
    assert t.column("name").to_pylist() == ["n1"]


def test_dxf_unclosed_ring_keeps_all_vertices():
    ring = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], float)  # not closed
    tab = pa.table({"wkb": pa.array(
        [wkb.dumps({"type": "Polygon", "rings": [ring]})], pa.binary())})
    g = wkb.loads(VF.parse_dxf_bytes(VW.dxf_bytes(tab))
                  .column("wkb").to_pylist()[0])
    np.testing.assert_array_equal(
        g["rings"][0], [[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]])


def test_osm_negative_offsets_signed():
    import zlib as _zlib

    from gdal_ray.core.mvt import _ld, _tag, _varint
    from gdal_ray.core.osmpbf import decode_osm_pbf, encode_osm_pbf
    # rewrite the single data blob with lat_offset=-1e9 (-1 degree) and
    # a compensating +1-degree lat value
    blob = encode_osm_pbf([(1, 10.0, 21.0, {})], compress=False)
    nodes, _ = decode_osm_pbf(blob)
    assert abs(nodes[0][2] - 21.0) < 1e-7
    # craft a block manually: same node lat 22 deg, lat_offset -1 deg
    st = _ld(1, _ld(1, b""))
    import struct as _struct
    dense = (_ld(1, _varint(2)) +            # id 1 (zigzag 2)
             _ld(8, _varint((220000000 << 1))) +   # lat val (gran 100)
             _ld(9, _varint((100000000 << 1))))    # lon 10 deg
    grp = _ld(2, dense)
    neg = (-1000000000) & ((1 << 64) - 1)
    block = st + _ld(2, grp) + _tag(17, 0) + _varint(100) \
        + _tag(19, 0) + _varint(neg)
    body = _ld(1, block)
    bh = _ld(1, b"OSMData") + _tag(3, 0) + _varint(len(body))
    raw = _struct.pack(">i", len(bh)) + bh + body
    n2, _ = decode_osm_pbf(raw)
    assert abs(n2[0][2] - 21.0) < 1e-7      # 22 + (-1) = 21


def test_cutline_crop_window_and_mask():
    from gdal_ray.stages.raster2 import cutline_crop, cutline_mask
    a = np.arange(100, dtype=np.int32).reshape(10, 10) + 1
    gt = (0, 1, 0, 10, 0, -1)
    tri = [[np.array([[2.0, 2.0], [6.5, 2.0], [2.0, 6.5], [2.0, 2.0]])]]
    out, gt2 = cutline_crop(a, gt, tri, nodata=0)
    assert out.shape == (5, 5)
    assert gt2 == (2.0, 1, 0.0, 7.0, 0.0, -1)
    np.testing.assert_array_equal(out, cutline_mask(a, gt, tri,
                                                    nodata=0)[3:8, 2:7])
