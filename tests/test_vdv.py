"""VDV-452 driver tests (ogr/ogrsf_frmts/vdv analog)."""

import pyarrow as pa
import pytest

from gdal_ray.sources import vector_formats as VF
from gdal_ray.sources import vector_writers as VW


def _tab():
    return pa.table({
        "stop_id": pa.array([1, 2, None], pa.int64()),
        "name": pa.array(['Hbf "Nord"', "a;b", None]),
        "dist": pa.array([1.5, None, -0.25], pa.float64())})


def test_vdv_roundtrip_types_and_escaping():
    tab = _tab()
    blob = VW.vdv_bytes(tab, table="Stop")
    assert blob.startswith(b"mod;")
    assert b"tbl; Stop" in blob and b"atr; stop_id; name; dist" in blob
    assert b'"Hbf ""Nord"""' in blob
    back = VF.parse_vdv_bytes(blob)
    for c in tab.column_names:
        assert back.column(c).to_pylist() == tab.column(c).to_pylist(), c
    assert back.schema.field("stop_id").type == pa.int64()
    assert back.schema.field("dist").type == pa.float64()


def test_vdv_multi_table_selection():
    blob = (VW.vdv_bytes(pa.table({"a": pa.array([1], pa.int64())}),
                         table="T1").rstrip(b"eof; 1\n")
            + VW.vdv_bytes(pa.table({"b": pa.array([2], pa.int64())}),
                           table="T2"))
    t1 = VF.parse_vdv_bytes(blob, table="T1")
    t2 = VF.parse_vdv_bytes(blob, table="T2")
    assert t1.column_names == ["a"] and t1.column("a").to_pylist() == [1]
    assert t2.column_names == ["b"] and t2.column("b").to_pylist() == [2]
    with pytest.raises(ValueError, match="no table"):
        VF.parse_vdv_bytes(blob, table="T3")


def test_vdv_rejects_newlines():
    with pytest.raises(ValueError, match="line-framed"):
        VW.vdv_bytes(pa.table({"s": pa.array(["a\nb"])}))


def test_vdv_sink_readback(tmp_path, ray_session):
    import ray

    man = VW.write_vdv(ray.data.from_arrow(_tab()),
                       str(tmp_path / "vdv")).to_pandas()
    assert man["path"].iloc[0].endswith(".x10")
    back = VF.read_vdv(sorted(man["path"])).to_pandas()
    assert sorted(back["stop_id"].dropna()) == [1, 2]
