"""XLSX, GTFS and JSON-FG driver tests (ogr/ogrsf_frmts/{xlsx,gtfs,jsonfg}
analogs)."""

import json
import os
import zipfile

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.core import wkb as W
from gdal_ray.sources import vector_formats as VF
from gdal_ray.sources import vector_writers as VW


# ---------- XLSX ----------

def _attr_table():
    return pa.table({
        "name": pa.array(["alpha", "b <&> c", None, "delta"]),
        "count": pa.array([3, None, 12, -7], pa.int64()),
        "score": pa.array([1.5, 2.25, None, -0.125], pa.float64()),
        "flag": pa.array([True, False, None, True], pa.bool_()),
    })


def test_xlsx_roundtrip_types_and_escaping():
    tab = _attr_table()
    blob = VW.xlsx_bytes(tab)
    back = VF.parse_xlsx_bytes(blob)
    assert back.column_names == tab.column_names
    assert back.column("name").to_pylist() == tab.column("name").to_pylist()
    assert back.column("count").to_pylist() == \
        tab.column("count").to_pylist()
    assert back.column("score").to_pylist() == \
        tab.column("score").to_pylist()
    assert back.column("flag").to_pylist() == tab.column("flag").to_pylist()
    assert back.schema.field("count").type == pa.int64()
    assert back.schema.field("score").type == pa.float64()
    assert back.schema.field("flag").type == pa.bool_()


def test_xlsx_is_valid_ooxml_package():
    import io
    blob = VW.xlsx_bytes(_attr_table())
    zf = zipfile.ZipFile(io.BytesIO(blob))
    assert {"[Content_Types].xml", "xl/workbook.xml",
            "xl/worksheets/sheet1.xml"} <= set(zf.namelist())
    # deterministic bytes
    assert blob == VW.xlsx_bytes(_attr_table())


def test_xlsx_shared_strings_read():
    """Hand-built package using the sharedStrings layout Excel itself
    emits (t="s" indices) — the writer uses inlineStr, the reader must
    handle both."""
    import io
    ws = ('<?xml version="1.0"?><worksheet xmlns="http://schemas.openxml'
          'formats.org/spreadsheetml/2006/main"><sheetData>'
          '<row r="1"><c r="A1" t="s"><v>0</v></c>'
          '<c r="B1" t="s"><v>1</v></c></row>'
          '<row r="2"><c r="A2" t="s"><v>2</v></c>'
          '<c r="B2"><v>41.5</v></c></row>'
          '</sheetData></worksheet>')
    sst = ('<?xml version="1.0"?><sst xmlns="http://schemas.openxml'
           'formats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">'
           '<si><t>city</t></si><si><t>temp</t></si>'
           '<si><r><t>Os</t></r><r><t>lo</t></r></si></sst>')
    base = VW.xlsx_bytes(pa.table({"a": pa.array([1])}))
    zin = zipfile.ZipFile(io.BytesIO(base))
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zout:
        for n in zin.namelist():
            if n == "xl/worksheets/sheet1.xml":
                zout.writestr(n, ws)
            else:
                zout.writestr(n, zin.read(n))
        zout.writestr("xl/sharedStrings.xml", sst)
    t = VF.parse_xlsx_bytes(buf.getvalue())
    assert t.column_names == ["city", "temp"]
    assert t.column("city").to_pylist() == ["Oslo"]   # multi-run si
    assert t.column("temp").to_pylist() == [41.5]


def test_xlsx_sheet_selection_and_missing():
    blob = VW.xlsx_bytes(_attr_table(), sheet="mydata")
    t = VF.parse_xlsx_bytes(blob, sheet="mydata")
    assert t.num_rows == 4
    with pytest.raises(ValueError, match="no sheet"):
        VF.parse_xlsx_bytes(blob, sheet="nope")


def test_xlsx_sink_readback(tmp_path, ray_session):
    import ray

    tab = _attr_table()
    man = VW.write_xlsx(ray.data.from_arrow(tab),
                        str(tmp_path / "xl")).to_pandas()
    assert man["n_features"].sum() == 4
    back = VF.read_xlsx(sorted(man["path"])).to_pandas()
    assert sorted(back["count"].dropna()) == [-7, 3, 12]


# ---------- GTFS ----------

def _gtfs_feed(root):
    os.makedirs(root, exist_ok=True)
    files = {
        "agency.txt": "agency_id,agency_name\n1,Metro\n",
        "routes.txt": "route_id,route_type\nR1,3\n",
        "trips.txt": "trip_id,route_id,shape_id\nT1,R1,S1\n",
        "stop_times.txt": ("trip_id,stop_id,stop_sequence\n"
                           "T1,A,1\nT1,B,2\n"),
        "calendar.txt": "service_id,monday\nWK,1\n",
        "stops.txt": ("stop_id,stop_name,stop_lat,stop_lon\n"
                      "A,Alpha,59.91,10.75\nB,Beta,59.93,10.72\n"),
        "shapes.txt": ("shape_id,shape_pt_lat,shape_pt_lon,"
                       "shape_pt_sequence\n"
                       "S1,59.91,10.75,2\nS1,59.90,10.70,1\n"
                       "S2,1.0,2.0,1\nS2,3.0,4.0,2\n"),
    }
    for name, content in files.items():
        with open(os.path.join(root, name), "w") as f:
            f.write(content)


def test_gtfs_stops_points(tmp_path):
    _gtfs_feed(tmp_path / "feed")
    t = VF.gtfs_table(str(tmp_path / "feed"), "stops")
    assert t.column("stop_id").to_pylist() == ["A", "B"]
    g = W.loads(t.column("wkb")[0].as_py())
    assert tuple(g["xy"]) == (10.75, 59.91)           # x=lon, y=lat


def test_gtfs_shapes_geom_orders_by_sequence(tmp_path):
    _gtfs_feed(tmp_path / "feed")
    t = VF.gtfs_table(str(tmp_path / "feed"), "shapes_geom")
    rows = {r["shape_id"]: W.loads(r["wkb"]) for r in t.to_pylist()}
    np.testing.assert_allclose(rows["S1"]["xy"],
                               [(10.70, 59.90), (10.75, 59.91)])
    np.testing.assert_allclose(rows["S2"]["xy"], [(2, 1), (4, 3)])


def test_gtfs_attribute_layer_and_zip(tmp_path):
    _gtfs_feed(tmp_path / "feed")
    zpath = str(tmp_path / "feed.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        for name in os.listdir(tmp_path / "feed"):
            zf.write(os.path.join(tmp_path / "feed", name), name)
    t = VF.gtfs_table(zpath, "routes")
    assert t.column("route_id").to_pylist() == ["R1"]
    assert "wkb" not in t.column_names
    t2 = VF.gtfs_table(zpath, "stops")
    assert t2.num_rows == 2
    with pytest.raises(ValueError, match="no fares"):
        VF.gtfs_table(zpath, "fares")


def test_gtfs_reader_dataset(tmp_path, ray_session):
    _gtfs_feed(tmp_path / "feed")
    df = VF.read_gtfs(str(tmp_path / "feed"), table="stops").to_pandas()
    assert sorted(df["stop_name"]) == ["Alpha", "Beta"]


# ---------- JSON-FG ----------

def _fg_table():
    return pa.table({
        "name": pa.array(["a", "b", "c"]),
        "time_start": pa.array(["2024-01-02", "2024-03-04T05:06:07Z",
                                None]),
        "time_end": pa.array(["2024-01-02", "2024-03-05T00:00:00Z", None]),
        "wkb": pa.array([W.point(1.5, 2.5),
                         W.dumps({"type": "LineString",
                                  "xy": np.array([(0, 0), (1, 1)],
                                                 np.float64)}),
                         None], pa.binary()),
    })


def test_jsonfg_roundtrip():
    tab = _fg_table()
    blob = VW.jsonfg_bytes(tab)
    doc = json.loads(blob)
    assert doc["type"] == "FeatureCollection"
    assert any("json-fg" in c for c in doc["conformsTo"])
    assert doc["features"][0]["time"] == {"date": "2024-01-02"}
    assert doc["features"][1]["time"]["interval"] == \
        ["2024-03-04T05:06:07Z", "2024-03-05T00:00:00Z"]
    assert doc["features"][2]["time"] is None
    assert doc["features"][0]["place"] is None
    back = VF.parse_jsonfg_bytes(blob)
    assert back.column("name").to_pylist() == ["a", "b", "c"]
    assert back.column("wkb").to_pylist() == tab.column("wkb").to_pylist()
    assert back.column("time_start").to_pylist() == \
        ["2024-01-02", "2024-03-04T05:06:07Z", None]


def test_jsonfg_place_precedence():
    doc = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "properties": {"n": 1},
         "place": {"type": "Point", "coordinates": [500000.0, 4100000.0]},
         "geometry": {"type": "Point", "coordinates": [10.0, 37.0]},
         "time": {"timestamp": "2020-05-06T07:08:09Z"}},
        {"type": "Feature", "properties": {"n": 2}, "place": None,
         "geometry": {"type": "Point", "coordinates": [1.0, 2.0]},
         "time": {"interval": ["2020-01-01", ".."]}},
    ]}
    t = VF.parse_jsonfg_bytes(json.dumps(doc).encode())
    g0 = W.loads(t.column("wkb")[0].as_py())
    assert tuple(g0["xy"]) == (500000.0, 4100000.0)   # place wins
    g1 = W.loads(t.column("wkb")[1].as_py())
    assert tuple(g1["xy"]) == (1.0, 2.0)              # geometry fallback
    assert t.column("time_end").to_pylist()[1] is None   # open interval


def test_jsonfg_sink_readback(tmp_path, ray_session):
    import ray

    tab = _fg_table()
    man = VW.write_jsonfg(ray.data.from_arrow(tab),
                          str(tmp_path / "fg")).to_pandas()
    back = VF.read_jsonfg(sorted(man["path"])).to_pandas()
    assert sorted(back["name"]) == ["a", "b", "c"]


def test_xlsx_duplicate_headers_uniquified():
    blob = VW.xlsx_bytes(pa.table({"a": pa.array([1]),
                                   "b": pa.array([2])}))
    # hand-edit the header cells to collide
    import io
    zin = zipfile.ZipFile(io.BytesIO(blob))
    ws = zin.read("xl/worksheets/sheet1.xml").decode()
    ws = ws.replace(">b<", ">a<")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zout:
        for n in zin.namelist():
            zout.writestr(n, ws if n == "xl/worksheets/sheet1.xml"
                          else zin.read(n))
    t = VF.parse_xlsx_bytes(buf.getvalue())
    assert t.column_names == ["a", "a_1"]
    assert t.column("a").to_pylist() == [1]
    assert t.column("a_1").to_pylist() == [2]
