"""TopoJSON reader + GeoRSS driver tests (ogrtopojsonreader.cpp,
ogr/ogrsf_frmts/georss analogs)."""

import json

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.core import wkb as W
from gdal_ray.sources import vector_formats as VF
from gdal_ray.sources import vector_writers as VW


def _topology():
    # two arcs, quantized: arc0 = (0,0)->(10,0)->(10,10); arc1 closes
    # back (10,10)->(0,10)->(0,0); scale 0.1 -> unit-square-ish ring
    return {
        "type": "Topology",
        "transform": {"scale": [0.1, 0.1], "translate": [100.0, 200.0]},
        "arcs": [
            [[0, 0], [10, 0], [0, 10]],          # delta-encoded
            [[10, 10], [-10, 0], [0, -10]],
        ],
        "objects": {
            "shapes": {"type": "GeometryCollection", "geometries": [
                {"type": "Polygon", "arcs": [[0, 1]], "id": 7,
                 "properties": {"name": "sq"}},
                {"type": "LineString", "arcs": [-1],
                 "properties": {"name": "rev"}},
                {"type": "Point", "coordinates": [5, 5],
                 "properties": {"name": "pt"}},
            ]},
            "lonely": {"type": "MultiPoint",
                       "coordinates": [[0, 0], [10, 10]]},
        },
    }


def test_topojson_quantized_decode():
    t = VF.parse_topojson_bytes(json.dumps(_topology()).encode())
    rows = {(r["layer"], r["name"]): r["wkb"]
            for r in t.to_pylist() if r["layer"] == "shapes"}
    ring = W.loads(rows[("shapes", "sq")])
    assert ring["type"] == "Polygon"
    exp = np.array([(100, 200), (101, 200), (101, 201), (100, 201),
                    (100, 200)], dtype=np.float64)
    np.testing.assert_allclose(ring["rings"][0], exp, atol=1e-12)
    # negative index -1 == ~0 walks arc 0 reversed
    rev = W.loads(rows[("shapes", "rev")])
    np.testing.assert_allclose(
        rev["xy"], [(101, 201), (101, 200), (100, 200)], atol=1e-12)
    # point coordinates are transformed, not delta-decoded
    pt = W.loads(rows[("shapes", "pt")])
    np.testing.assert_allclose(pt["xy"], [100.5, 200.5], atol=1e-12)
    # id surfaces as a string column; bare (non-collection) object = layer
    ids = {r["layer"]: r["id"] for r in t.to_pylist()}
    assert ids["lonely"] is None
    assert {r["id"] for r in t.to_pylist()
            if r["layer"] == "shapes"} == {"7", None}
    mp = [r for r in t.to_pylist() if r["layer"] == "lonely"][0]
    g = W.loads(mp["wkb"])
    assert g["type"] == "MultiPoint"
    np.testing.assert_allclose(g["xy"], [(100, 200), (101, 201)])


def test_topojson_unquantized():
    topo = {"type": "Topology",
            "arcs": [[[1.5, 2.5], [3.5, 4.5]]],
            "objects": {"l": {"type": "LineString", "arcs": [0]}}}
    t = VF.parse_topojson_bytes(json.dumps(topo).encode())
    g = W.loads(t.column("wkb")[0].as_py())
    np.testing.assert_allclose(g["xy"], [(1.5, 2.5), (3.5, 4.5)])


def test_topojson_rejects_non_topology():
    with pytest.raises(ValueError):
        VF.parse_topojson_bytes(b'{"type":"FeatureCollection"}')


def test_topojson_reader(tmp_path, ray_session):
    p = tmp_path / "a.topojson"
    p.write_text(json.dumps(_topology()))
    df = VF.read_topojson(str(p)).to_pandas()
    assert len(df) == 4
    assert sorted(df["layer"].unique()) == ["lonely", "shapes"]


def _georss_table():
    geoms = [
        W.point(12.5, -3.25),
        W.dumps({"type": "LineString",
                 "xy": np.array([(0, 0), (1, 2), (3, 1)], np.float64)}),
        W.dumps({"type": "Polygon",
                 "rings": [np.array([(0, 0), (2, 0), (2, 2), (0, 0)],
                                    np.float64)]}),
        None,
    ]
    return pa.table({"title": pa.array(["a", "b & c", "d", "empty"]),
                     "wkb": pa.array(geoms, pa.binary())})


def test_georss_roundtrip_and_latlon_order():
    tab = _georss_table()
    blob = VW.georss_bytes(tab)
    # Simple encoding is LAT LON: point (12.5, -3.25) -> "-3.25 12.5"
    assert b"<georss:point>-3.25 12.5</georss:point>" in blob
    assert b"b &amp; c" in blob
    back = VF.parse_georss_bytes(blob)
    assert back.column("title").to_pylist() == tab.column("title").to_pylist()
    assert back.column("wkb").to_pylist() == tab.column("wkb").to_pylist()


def test_georss_box_and_open_polygon():
    xml = b"""<?xml version="1.0"?>
    <feed xmlns="http://www.w3.org/2005/Atom"
          xmlns:georss="http://www.georss.org/georss">
      <entry><title>bx</title><georss:box>1 2 3 4</georss:box></entry>
      <entry><title>op</title>
        <georss:polygon>0 0 0 2 2 2</georss:polygon></entry>
    </feed>"""
    t = VF.parse_georss_bytes(xml)
    box = W.loads(t.column("wkb")[0].as_py())
    # box corners (lat,lon)=(1,2),(3,4) -> x in [2,4], y in [1,3]
    np.testing.assert_allclose(
        box["rings"][0], [(2, 1), (4, 1), (4, 3), (2, 3), (2, 1)])
    op = W.loads(t.column("wkb")[1].as_py())
    assert np.array_equal(op["rings"][0][0], op["rings"][0][-1])  # closed


def test_georss_rss_item_variant():
    xml = b"""<rss version="2.0"
        xmlns:georss="http://www.georss.org/georss"><channel>
      <item><title>t</title><georss:point>5 6</georss:point></item>
    </channel></rss>"""
    t = VF.parse_georss_bytes(xml)
    g = W.loads(t.column("wkb")[0].as_py())
    assert tuple(g["xy"]) == (6.0, 5.0)


def test_georss_writer_rejects_holes_and_multis():
    hole = {"type": "Polygon", "rings": [
        np.array([(0, 0), (9, 0), (9, 9), (0, 0)], np.float64),
        np.array([(1, 1), (2, 1), (2, 2), (1, 1)], np.float64)]}
    with pytest.raises(ValueError):
        VW.georss_bytes(pa.table({"wkb": pa.array([W.dumps(hole)],
                                                  pa.binary())}))


def test_georss_sink_readback(tmp_path, ray_session):
    import ray

    tab = _georss_table()
    man = VW.write_georss(ray.data.from_arrow(tab),
                          str(tmp_path / "rss")).to_pandas()
    back = VF.read_georss(sorted(man["path"])).to_pandas()
    assert sorted(back["title"]) == sorted(tab.column("title").to_pylist())
