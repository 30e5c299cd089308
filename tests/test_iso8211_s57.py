"""ISO 8211 + S-57 subset tests (frmts/iso8211 + ogr/ogrsf_frmts/s57
analogs)."""

import numpy as np
import pytest

from gdal_ray.core import iso8211 as I8
from gdal_ray.core import s57 as S57
from gdal_ray.core import wkb as W


def test_iso8211_roundtrip_mixed_formats():
    defns = [
        I8.FieldDefn("TSTA", "test field A", [
            ("U1", "b11"), ("U4", "b14"), ("S2", "b22"),
            ("TXT", "A"), ("FIX", "A(4)"), ("NUM", "I(5)")]),
        I8.FieldDefn("TSTB", "repeating field", [
            ("K", "b12"), ("V", "A")], repeating=True),
    ]
    records = [
        [("TSTA", {"U1": 7, "U4": 4000000000, "S2": -1234,
                   "TXT": "hello world", "FIX": "ab", "NUM": 42})],
        [("TSTA", {"U1": 255, "U4": 1, "S2": 32767,
                   "TXT": "", "FIX": "wxyz", "NUM": -7}),
         ("TSTB", [{"K": 1, "V": "one"}, {"K": 2, "V": "two"},
                   {"K": 3, "V": ""}])],
    ]
    blob = I8.encode_module(defns, records)
    assert blob[6:7] == b"L"                 # DDR leader id
    back_defns, back = I8.decode_module(blob)
    assert set(back_defns) == {"TSTA", "TSTB"}
    assert back_defns["TSTB"].repeating
    a0 = dict(back[0])["TSTA"]
    assert a0["U4"] == 4000000000 and a0["S2"] == -1234
    assert a0["TXT"] == "hello world" and a0["FIX"] == "ab"
    assert a0["NUM"] == 42
    b1 = dict(back[1])["TSTB"]
    assert [r["K"] for r in b1] == [1, 2, 3]
    assert [r["V"] for r in b1] == ["one", "two", ""]


def test_iso8211_rejects_non_ddr():
    blob = I8.encode_module([I8.FieldDefn("TAGX", "x", [("A", "b11")])],
                            [[("TAGX", {"A": 1})]])
    # chop off the DDR: first record length is in bytes 0:5
    ddr_len = int(blob[:5])
    with pytest.raises(ValueError, match="DDR"):
        I8.decode_module(blob[ddr_len:])


def _features():
    return [
        {"objl": 42, "attrs": {95: "5.5", 113: "name one"},
         "geom": {"type": "Point", "xy": np.array([10.1234567, -3.5])}},
        {"objl": 30, "attrs": {},
         "geom": {"type": "LineString",
                  "xy": np.array([(0, 0), (0.25, 0.5), (1, 1)],
                                 np.float64)}},
        {"objl": 71, "attrs": {75: "x"},
         "geom": {"type": "Point", "xy": np.array([-179.9999999, 89.0])}},
    ]


def test_s57_roundtrip():
    feats = _features()
    blob = S57.encode_s57(feats)
    back = S57.decode_s57(blob)
    assert [f["objl"] for f in back] == [42, 30, 71]
    assert [f["prim"] for f in back] == [1, 2, 1]
    g0 = W.loads(back[0]["wkb"])
    np.testing.assert_allclose(g0["xy"], [10.1234567, -3.5], atol=1e-7)
    assert back[0]["attrs"] == {95: "5.5", 113: "name one"}
    g1 = W.loads(back[1]["wkb"])
    np.testing.assert_allclose(g1["xy"], feats[1]["geom"]["xy"],
                               atol=1e-7)
    g2 = W.loads(back[2]["wkb"])
    np.testing.assert_allclose(g2["xy"], [-179.9999999, 89.0], atol=1e-7)


def test_s57_orientation_reverse():
    blob = S57.encode_s57([{"objl": 1, "attrs": {}, "geom": {
        "type": "LineString",
        "xy": np.array([(0, 0), (1, 0), (2, 1)], np.float64)}}])
    # flip ORNT to reverse: decode must reverse the vertex chain
    import gdal_ray.core.iso8211 as I8m
    defns, records = I8m.decode_module(blob)
    for rec in records:
        for tag, vals in rec:
            if tag == "FSPT":
                vals[0]["ORNT"] = 2
    blob2 = I8m.encode_module(list(defns.values()), records)
    back = S57.decode_s57(blob2)
    g = W.loads(back[0]["wkb"])
    np.testing.assert_allclose(g["xy"], [(2, 1), (1, 0), (0, 0)],
                               atol=1e-7)


def test_s57_area_raises_honestly():
    blob = S57.encode_s57([{"objl": 1, "attrs": {}, "geom": {
        "type": "LineString", "xy": np.array([(0, 0), (1, 1)],
                                             np.float64)}}])
    import gdal_ray.core.iso8211 as I8m
    defns, records = I8m.decode_module(blob)
    for rec in records:
        for tag, vals in rec:
            if tag == "FRID":
                vals["PRIM"] = 3
    blob2 = I8m.encode_module(list(defns.values()), records)
    with pytest.raises(NotImplementedError, match="PRIM=3"):
        S57.decode_s57(blob2)


def test_s57_sink_readback(tmp_path, ray_session):
    import pyarrow as pa
    import ray

    from gdal_ray.sources import vector_formats as VF
    from gdal_ray.sources import vector_writers as VW

    tab = pa.table({
        "objl": pa.array([5, 9], pa.int64()),
        "wkb": pa.array([W.point(1.25, 2.5),
                         W.dumps({"type": "LineString",
                                  "xy": np.array([(0, 0), (3, 4)],
                                                 np.float64)})],
                        pa.binary())})
    man = VW.write_s57(ray.data.from_arrow(tab),
                       str(tmp_path / "enc")).to_pandas()
    assert man["path"].iloc[0].endswith(".000")
    back = VF.read_s57(sorted(man["path"])).to_pandas()
    assert sorted(back["objl"]) == [5, 9]
    assert sorted(back["prim"]) == [1, 2]
