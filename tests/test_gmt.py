"""GMT ASCII vector driver tests (ogr/ogrsf_frmts/gmt analog)."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.core import wkb as W
from gdal_ray.sources import vector_formats as VF
from gdal_ray.sources import vector_writers as VW


def _roundtrip(tab):
    return VF.parse_gmt_bytes(VW.gmt_bytes(tab))


def test_gmt_points_with_attrs():
    tab = pa.table({
        "name": pa.array(["a", 'has "quote" and |pipe|', None]),
        "k": pa.array([1, 2, None], pa.int64()),
        "v": pa.array([0.5, -1.25, 3.0], pa.float64()),
        "wkb": pa.array([W.point(1, 2), W.point(-3.5, 4.25),
                         W.point(0, 0)], pa.binary())})
    back = _roundtrip(tab)
    for c in tab.column_names:
        assert back.column(c).to_pylist() == tab.column(c).to_pylist(), c
    assert back.schema.field("k").type == pa.int64()
    blob = VW.gmt_bytes(tab)
    assert blob.startswith(b"# @VGMT1.0 @GPOINT")
    assert b"# @Nname|k|v" in blob
    assert b"# @Tstring|integer|double" in blob


def test_gmt_polygon_holes():
    hole_poly = {"type": "Polygon", "rings": [
        np.array([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)], np.float64),
        np.array([(2, 2), (4, 2), (4, 4), (2, 4), (2, 2)], np.float64)]}
    tab = pa.table({"id": pa.array([7], pa.int64()),
                    "wkb": pa.array([W.dumps(hole_poly)], pa.binary())})
    blob = VW.gmt_bytes(tab)
    assert b"# @P" in blob and b"# @H" in blob
    back = _roundtrip(tab)
    g = W.loads(back.column("wkb")[0].as_py())
    assert g["type"] == "Polygon" and len(g["rings"]) == 2
    np.testing.assert_allclose(g["rings"][1], hole_poly["rings"][1])


def test_gmt_multipolygon_and_multilinestring():
    mp = {"type": "MultiPolygon", "polys": [
        [np.array([(0, 0), (2, 0), (2, 2), (0, 0)], np.float64)],
        [np.array([(5, 5), (9, 5), (9, 9), (5, 5)], np.float64),
         np.array([(6, 6), (7, 6), (7, 7), (6, 6)], np.float64)]]}
    tab = pa.table({"wkb": pa.array([W.dumps(mp)], pa.binary())})
    g = W.loads(_roundtrip(tab).column("wkb")[0].as_py())
    assert g["type"] == "MultiPolygon"
    assert [len(r) for r in g["polys"]] == [1, 2]
    ml = {"type": "MultiLineString", "lines": [
        np.array([(0, 0), (1, 1)], np.float64),
        np.array([(2, 2), (3, 3), (4, 2)], np.float64)]}
    tab = pa.table({"n": pa.array([1, 2], pa.int64()),
                    "wkb": pa.array([W.dumps(ml),
                                     W.dumps(ml)], pa.binary())})
    back = _roundtrip(tab)
    assert back.num_rows == 2
    g = W.loads(back.column("wkb")[1].as_py())
    assert g["type"] == "MultiLineString" and len(g["lines"]) == 2


def test_gmt_rejects_mixed_classes():
    line = {"type": "LineString",
            "xy": np.array([(0, 0), (1, 1)], np.float64)}
    tab = pa.table({"wkb": pa.array([W.point(0, 0), W.dumps(line)],
                                    pa.binary())})
    with pytest.raises(ValueError, match="ONE geometry class"):
        VW.gmt_bytes(tab)


def test_gmt_sink_readback(tmp_path, ray_session):
    import ray

    tab = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                    "wkb": pa.array([W.point(i, -i) for i in range(3)],
                                    pa.binary())})
    man = VW.write_gmt(ray.data.from_arrow(tab),
                       str(tmp_path / "gmt")).to_pandas()
    back = VF.read_gmt(sorted(man["path"])).to_pandas()
    assert sorted(back["k"]) == [1, 2, 3]
