"""Vector writer round trips — write → read back through the paired
reader → WKB equality, over the hole / multipart / Z-M / curve fixture
set (the reference's ogr2ogr export semantics: GeoJSON per RFC 7946
keeps Z and drops M; GPKG stores the WKB verbatim behind a GP header)."""
import struct

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.core import wkb as W
from gdal_ray.sources import vector_formats as VF
from gdal_ray.sources import vector_writers as VW


def _fixture_geoms():
    sq = np.array([(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)], dtype=np.float64)
    hole = np.array([(1, 1), (1, 2), (2, 2), (2, 1), (1, 1)], dtype=np.float64)
    return {
        "point": {"type": "Point", "xy": np.array([1.5, -2.25])},
        "line": {"type": "LineString",
                 "xy": np.array([(0, 0), (1, 1), (2, 0.5)], dtype=np.float64)},
        "poly_hole": {"type": "Polygon", "rings": [sq, hole]},
        "mpoint": {"type": "MultiPoint",
                   "xy": np.array([(0, 0), (3, 4)], dtype=np.float64)},
        "mline": {"type": "MultiLineString",
                  "lines": [np.array([(0, 0), (1, 0)], dtype=np.float64),
                            np.array([(0, 1), (1, 1)], dtype=np.float64)]},
        "mpoly": {"type": "MultiPolygon", "polys": [[sq], [hole]]},
        "collection": {"type": "GeometryCollection",
                       "geoms": [{"type": "Point", "xy": np.array([9.0, 9.0])},
                                 {"type": "LineString",
                                  "xy": np.array([(0, 0), (2, 2)],
                                                 dtype=np.float64)}]},
    }


def _fixture_table() -> pa.Table:
    geoms = _fixture_geoms()
    names = sorted(geoms)
    return pa.table({
        "name": pa.array(names),
        "rank": pa.array(list(range(len(names))), pa.int64()),
        "score": pa.array([i * 0.5 for i in range(len(names))], pa.float64()),
        "wkb": pa.array([W.dumps(geoms[n]) for n in names], pa.binary()),
    })


def test_geojson_roundtrip_bytes():
    tab = _fixture_table()
    back = VF.parse_geojson_bytes(VW.geojson_bytes(tab))
    assert back.column_names == ["name", "rank", "score", "wkb"]
    assert back.column("name").to_pylist() == tab.column("name").to_pylist()
    assert back.column("rank").to_pylist() == tab.column("rank").to_pylist()
    assert back.column("wkb").to_pylist() == tab.column("wkb").to_pylist()


def test_geojson_z_kept_m_dropped():
    zline = {"type": "LineString",
             "xy": np.array([(0, 0), (1, 1)], dtype=np.float64),
             "z": np.array([10.0, 20.0])}
    g = VW.geom_to_geojson(zline)
    assert g["coordinates"] == [[0.0, 0.0, 10.0], [1.0, 1.0, 20.0]]
    back = W.loads(W.dumps(zline))
    assert np.allclose(back["z"], [10.0, 20.0])
    mline = dict(zline)
    mline["m"] = np.array([1.0, 2.0])
    g2 = VW.geom_to_geojson({k: v for k, v in mline.items() if k != "m"})
    assert g2 == g   # M has no RFC 7946 representation


def test_geojson_null_geometry():
    tab = pa.table({"a": pa.array([1, 2]),
                    "wkb": pa.array([W.point(1, 2), None], pa.binary())})
    back = VF.parse_geojson_bytes(VW.geojson_bytes(tab))
    got = back.column("wkb").to_pylist()
    assert got[0] == W.point(1, 2) and got[1] is None


def test_gpkg_roundtrip_bytes_exact_wkb():
    """GPKG keeps the WKB verbatim — Z/M and curved types survive exactly
    (curves linearize only on load, not in the container)."""
    zsq = np.array([(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)], dtype=np.float64)
    zm_poly = W.dumps({"type": "Polygon", "rings": [zsq],
                       "z": [np.arange(5, dtype=np.float64)],
                       "m": [np.arange(5, dtype=np.float64) * 2]})
    # hand-built CircularString WKB (type 8): stored untouched by GPKG
    pts = [(0, 0), (1, 1), (2, 0)]
    circ = struct.pack("<BII", 1, 8, 3) + b"".join(
        struct.pack("<dd", *p) for p in pts)
    tab = pa.table({
        "label": pa.array(["zm", "curve", "none"]),
        "wkb": pa.array([zm_poly, circ, None], pa.binary())})
    payload = VW.gpkg_bytes({"roads": tab})
    import sqlite3
    con = sqlite3.connect(":memory:")
    con.deserialize(payload)
    assert con.execute("PRAGMA application_id").fetchone()[0] == 1196444487
    rows = con.execute("SELECT label, geom FROM roads ORDER BY fid").fetchall()
    got = [VF.gpkg_geom_to_wkb(r[1]) for r in rows]
    assert got == [zm_poly, circ, None]
    # loading the curve out of the container linearizes it like any WKB
    assert W.loads(got[1])["type"] == "LineString"
    con.close()


def test_gpkg_reader_roundtrip(tmp_path, ray_session):
    tab = _fixture_table()
    path = tmp_path / "out.gpkg"
    path.write_bytes(VW.gpkg_bytes({"features": tab}))
    back = VF.read_gpkg(str(path)).to_pandas().sort_values("rank")
    assert list(back["name"]) == tab.column("name").to_pylist()
    assert list(back["wkb"]) == tab.column("wkb").to_pylist()
    assert list(back["fid"]) == [1, 2, 3, 4, 5, 6, 7]


def test_write_sinks_manifest_and_readback(tmp_path, ray_session):
    import ray.data

    tab = _fixture_table()
    ds = ray.data.from_arrow(tab)
    mj = VW.write_geojson(ds, str(tmp_path / "gj")).to_pandas()
    assert mj["n_features"].sum() == 7
    back = VF.read_geojson([p for p in mj["path"]]).to_pandas() \
        .sort_values("rank")
    assert list(back["wkb"]) == tab.column("wkb").to_pylist()

    mg = VW.write_gpkg(ds, str(tmp_path / "gp"), table="t").to_pandas()
    assert mg["n_features"].sum() == 7
    backg = VF.read_gpkg([p for p in mg["path"]]).to_pandas() \
        .sort_values("rank")
    assert list(backg["wkb"]) == tab.column("wkb").to_pylist()

    # idempotent re-run: content-hash names → same files, no duplicates
    VW.write_gpkg(ds, str(tmp_path / "gp"), table="t").materialize()
    import os
    assert sorted(os.listdir(tmp_path / "gp")) == sorted(
        os.path.basename(p) for p in mg["path"])


def test_pipeline_stage_registration(ray_session, tmp_path):
    from gdal_ray.pipelines.pipeline_spec import run_pipeline

    tab = _fixture_table()
    import ray.data
    ds = ray.data.from_arrow(tab)
    out = run_pipeline([{"op": "write_geojson",
                         "out_dir": str(tmp_path / "pj")}], source=ds)
    assert out.to_pandas()["n_features"].sum() == 7


# ---------- Shapefile writer ----------

def _same_ring(a, b):
    a = np.asarray(a); b = np.asarray(b)
    return a.shape == b.shape and (np.allclose(a, b) or np.allclose(a, b[::-1]))


def test_shapefile_roundtrip_bytes():
    """write → parse_shp_bytes/parse_dbf_bytes → geometry + attribute
    equality (rings may flip orientation to the ESRI rule; vertex chains
    must survive exactly)."""
    sq = np.array([(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)], dtype=np.float64)
    hole = np.array([(1, 1), (1, 2), (2, 2), (2, 1), (1, 1)], dtype=np.float64)
    geoms = [
        {"type": "Polygon", "rings": [sq, hole]},
        {"type": "MultiPolygon",
         "polys": [[sq + 10.0], [sq + 30.0]]},
        None,
    ]
    tab = pa.table({
        "name": pa.array(["holed", "multi", "null"]),
        "rank": pa.array([7, -3, 0], pa.int64()),
        "score": pa.array([1.25, None, 0.5], pa.float64()),
        "wkb": pa.array([W.dumps(g) if g else None for g in geoms],
                        pa.binary()),
    })
    parts = VW.shapefile_bytes(tab)
    back = VF.parse_shp_bytes(parts["shp"])
    attrs = VF.parse_dbf_bytes(parts["dbf"])
    assert attrs.column("name").to_pylist() == ["holed", "multi", "null"]
    assert attrs.column("rank").to_pylist() == [7, -3, 0]
    assert attrs.column("score").to_pylist() == pytest.approx(
        [1.25, None, 0.5])
    g0 = W.loads(back[0])
    assert g0["type"] == "Polygon" and len(g0["rings"]) == 2
    assert _same_ring(g0["rings"][0], sq) and _same_ring(g0["rings"][1], hole)
    g1 = W.loads(back[1])
    assert g1["type"] == "MultiPolygon" and len(g1["polys"]) == 2
    shells = sorted((p[0] for p in g1["polys"]),
                    key=lambda r: float(np.asarray(r)[:, 0].min()))
    assert _same_ring(shells[0], sq + 10.0)
    assert _same_ring(shells[1], sq + 30.0)
    assert back[2] is None
    # .shx indexes every record
    n_recs = (len(parts["shx"]) - 100) // 8
    assert n_recs == 3


def test_shapefile_lines_points_exact_wkb():
    geoms = {
        "line": {"type": "LineString",
                 "xy": np.array([(0, 0), (1, 1), (2, 0.5)], dtype=np.float64)},
        "mline": {"type": "MultiLineString",
                  "lines": [np.array([(0, 0), (1, 0)], dtype=np.float64),
                            np.array([(0, 1), (1, 1)], dtype=np.float64)]},
    }
    for name, g in geoms.items():
        tab = pa.table({"n": pa.array([name]),
                        "wkb": pa.array([W.dumps(g)], pa.binary())})
        back = VF.parse_shp_bytes(VW.shapefile_bytes(tab)["shp"])
        assert back[0] == W.dumps(g), name      # byte-exact for open chains
    ptab = pa.table({"n": pa.array(["p"]),
                     "wkb": pa.array([W.point(1.5, -2.25)], pa.binary())})
    assert VF.parse_shp_bytes(VW.shapefile_bytes(ptab)["shp"])[0] == \
        W.point(1.5, -2.25)


def test_shapefile_rejects_mixed_and_unmappable():
    tab = pa.table({"wkb": pa.array(
        [W.point(0, 0),
         W.dumps({"type": "LineString",
                  "xy": np.array([(0, 0), (1, 1)], dtype=np.float64)})],
        pa.binary())})
    with pytest.raises(ValueError, match="mixed"):
        VW.shapefile_bytes(tab)
    mp = pa.table({"wkb": pa.array([W.dumps(
        {"type": "MultiPoint",
         "xy": np.array([(0, 0), (1, 1)], dtype=np.float64)})], pa.binary())})
    with pytest.raises(NotImplementedError):
        VW.shapefile_bytes(mp)


def test_shapefile_sink_readback(tmp_path, ray_session):
    import ray.data

    sq = np.array([(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)], dtype=np.float64)
    tab = pa.table({
        "name": pa.array([f"f{i}" for i in range(6)]),
        "rank": pa.array(list(range(6)), pa.int64()),
        "wkb": pa.array([W.dumps({"type": "Polygon", "rings": [sq + 3.0 * i]})
                         for i in range(6)], pa.binary()),
    })
    ds = ray.data.from_arrow(tab).repartition(2)
    man = VW.write_shapefile(ds, str(tmp_path / "shp")).to_pandas()
    assert man["n_features"].sum() == 6
    assert all(p.endswith(".shp") for p in man["path"])
    back = VF.read_shapefile(sorted(man["path"])).to_pandas()
    assert sorted(back["name"]) == [f"f{i}" for i in range(6)]
    got = {r["name"]: W.loads(r["wkb"])["rings"][0]
           for _, r in back.iterrows()}
    for i in range(6):
        assert _same_ring(got[f"f{i}"], sq + 3.0 * i)


# ---------- FlatGeobuf ----------

def _fgb_fixture_table() -> pa.Table:
    geoms = {k: v for k, v in _fixture_geoms().items() if k != "collection"}
    names = sorted(geoms)
    return pa.table({
        "name": pa.array(names),
        "rank": pa.array(list(range(len(names))), pa.int64()),
        "score": pa.array([i * 0.5 for i in range(len(names))], pa.float64()),
        "flag": pa.array([i % 2 == 0 for i in range(len(names))]),
        "wkb": pa.array([W.dumps(geoms[n]) for n in names], pa.binary()),
    })


def test_flatgeobuf_roundtrip_bytes():
    tab = _fgb_fixture_table()
    back = VF.parse_flatgeobuf_bytes(VW.flatgeobuf_bytes(tab))
    assert back.column_names == ["name", "rank", "score", "flag", "wkb"]
    for c in ("name", "rank", "score", "flag", "wkb"):
        assert back.column(c).to_pylist() == tab.column(c).to_pylist(), c


def test_flatgeobuf_null_geometry_and_props():
    tab = pa.table({"name": pa.array(["a", None]),
                    "wkb": pa.array([W.point(1, 2), None], pa.binary())})
    back = VF.parse_flatgeobuf_bytes(VW.flatgeobuf_bytes(tab)).to_pydict()
    assert back["name"] == ["a", None]
    assert back["wkb"][0] == W.point(1, 2) and back["wkb"][1] is None


def test_flatgeobuf_collection_unrepresentable():
    g = _fixture_geoms()["collection"]
    tab = pa.table({"wkb": pa.array([W.dumps(g)], pa.binary())})
    with pytest.raises(NotImplementedError, match="GeometryCollection"):
        VW.flatgeobuf_bytes(tab)


def test_flatgeobuf_sink_readback(tmp_path, ray_session):
    import ray.data

    sq = np.array([(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)], dtype=np.float64)
    tab = pa.table({
        "name": pa.array([f"f{i}" for i in range(6)]),
        "wkb": pa.array([W.dumps({"type": "Polygon", "rings": [sq + 3.0 * i]})
                         for i in range(6)], pa.binary()),
    })
    ds = ray.data.from_arrow(tab).repartition(2)
    man = VW.write_flatgeobuf(ds, str(tmp_path / "fgb")).to_pandas()
    assert man["n_features"].sum() == 6
    assert all(p.endswith(".fgb") for p in man["path"])
    back = VF.read_flatgeobuf(sorted(man["path"])).to_pandas()
    got = {r["name"]: W.loads(r["wkb"]) for _, r in back.iterrows()}
    for i in range(6):
        assert np.allclose(got[f"f{i}"]["rings"][0], sq + 3.0 * i)


def test_flatgeobuf_z_m_roundtrip():
    """FGB VT_Z/VT_M vectors: exact WKB round-trip for the types whose
    loaded dicts carry z/m (Point scalar, LineString (N,), Polygon
    list-per-ring — core.wkb drops z/m on Multi*, the engine-wide
    boundary)."""
    geoms = [
        {"type": "Point", "xy": np.array([1.0, 2.0]), "z": 5.0},
        {"type": "Point", "xy": np.array([1.0, 2.0]), "z": 5.0, "m": 9.0},
        {"type": "LineString",
         "xy": np.array([(0, 0), (1, 1)], dtype=np.float64),
         "z": np.array([5., 6.]), "m": np.array([7., 8.])},
        {"type": "Polygon",
         "rings": [np.array([(0, 0), (4, 0), (4, 4), (0, 0)],
                            dtype=np.float64),
                   np.array([(1, 1), (1, 2), (2, 2), (1, 1)],
                            dtype=np.float64)],
         "z": [np.array([1., 2., 3., 1.]), np.array([4., 5., 6., 4.])]},
        {"type": "Point", "xy": np.array([3.0, 4.0])},   # plain XY
    ]
    tab = pa.table({"wkb": pa.array([W.dumps(g) for g in geoms],
                                    pa.binary())})
    back = VF.parse_flatgeobuf_bytes(VW.flatgeobuf_bytes(tab)).to_pydict()
    for i, g in enumerate(geoms):
        assert back["wkb"][i] == W.dumps(g), (i, g["type"])
