"""DGN v7 codec tests (ogr/ogrsf_frmts/dgn analog)."""

import numpy as np
import pytest

from gdal_ray.core import dgn as DGN
from gdal_ray.core import wkb as W


def test_vax_double_roundtrip():
    for v in (0.0, 1.0, -1.0, 123456.789, -0.0001220703125, 2.0**60,
              3.141592653589793):
        back = DGN._vax_to_ieee(DGN._ieee_to_vax(v), 0)
        assert back == pytest.approx(v, rel=1e-15), v


def test_int32_word_swap():
    for v in (0, 1, -1, 0x12345678, -0x12345678, 2**31 - 1, -2**31):
        assert DGN._int32_unpack(DGN._int32_pack(v), 0) == v


def test_dgn_roundtrip_geometries():
    geoms = [
        {"type": "Point", "xy": np.array([12.5, -3.25])},
        {"type": "LineString",
         "xy": np.array([(0, 0), (10, 5)], np.float64)},
        {"type": "LineString",
         "xy": np.array([(0, 0), (1, 2), (3, 1), (4, 4)], np.float64)},
        {"type": "Polygon", "rings": [np.array(
            [(0, 0), (8, 0), (8, 8), (0, 8), (0, 0)], np.float64)]},
    ]
    blob = DGN.encode_dgn(geoms, levels=[1, 2, 3, 4])
    assert blob[:2] == bytes([0x08, 0x09])        # 2-D TCB magic
    assert blob[-2:] == b"\xff\xff"
    rows, skipped = DGN.decode_dgn(blob)
    assert skipped == {}
    assert [r[1] for r in rows] == [1, 2, 3, 4]   # levels survive
    back = [W.loads(r[2]) for r in rows]
    assert back[0]["type"] == "Point"
    np.testing.assert_allclose(back[0]["xy"], [12.5, -3.25])
    assert back[1]["type"] == "LineString"
    np.testing.assert_allclose(back[2]["xy"], geoms[2]["xy"])
    assert back[3]["type"] == "Polygon"
    np.testing.assert_allclose(back[3]["rings"][0], geoms[3]["rings"][0])
    # element types: 2-vertex -> LINE, ring -> SHAPE
    assert [r[0] for r in rows] == [3, 3, 4, 6]


def test_dgn_coordinate_resolution_and_range():
    g = [{"type": "Point", "xy": np.array([1.23456789, 0.0])}]
    rows, _ = DGN.decode_dgn(DGN.encode_dgn(g))
    x = W.loads(rows[0][2])["xy"][0]
    assert x == pytest.approx(1.2346, abs=1e-9)   # 1e-4 UOR resolution
    with pytest.raises(ValueError, match="UOR"):
        DGN.encode_dgn([{"type": "Point",
                         "xy": np.array([1e7, 0.0])}])


def test_dgn_skips_unknown_and_deleted():
    geoms = [{"type": "LineString",
              "xy": np.array([(0, 0), (5, 5)], np.float64)}]
    blob = bytearray(DGN.encode_dgn(geoms + geoms))
    # second element: mark deleted (header: TCB is 1536 bytes, then 52)
    second = 1536 + 52
    blob[second + 1] |= 0x80
    rows, _ = DGN.decode_dgn(bytes(blob))
    assert len(rows) == 1
    # splice an unknown element type (17 = TEXT)
    blob = bytearray(DGN.encode_dgn(geoms))
    text_el = bytes([0, 17, 2, 0, 0, 0, 0, 0])    # 2-word dummy TEXT
    blob = blob[:-2] + text_el + b"\xff\xff"
    rows, skipped = DGN.decode_dgn(bytes(blob))
    assert len(rows) == 1 and skipped == {17: 1}


def test_dgn_rejects_bogus_header():
    with pytest.raises(ValueError, match="TCB"):
        DGN.decode_dgn(b"\x01\x02\x03\x04" + b"\0" * 100)
