"""GeoParquet 1.1 driver tests (ogr/ogrsf_frmts/parquet analog)."""

import json

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.core import wkb as W
from gdal_ray.sources import vector_formats as VF
from gdal_ray.sources import vector_writers as VW


def _feature_table():
    geoms = [
        W.point(10.5, -3.0),
        W.dumps({"type": "LineString",
                 "xy": np.array([(-20, 1), (5, 40)], np.float64)}),
        W.dumps({"type": "Polygon",
                 "rings": [np.array([(0, 0), (4, 0), (4, 4), (0, 0)],
                                    np.float64)]}),
        None,
    ]
    return pa.table({"name": pa.array(["a", "b", "c", "d"]),
                     "v": pa.array([1, 2, 3, 4], pa.int64()),
                     "wkb": pa.array(geoms, pa.binary())})


def test_geoparquet_metadata_and_roundtrip():
    tab = _feature_table()
    blob = VW.geoparquet_bytes(tab)
    geo = VF.geoparquet_meta(blob)
    assert geo["version"] == "1.1.0"
    assert geo["primary_column"] == "wkb"
    col = geo["columns"]["wkb"]
    assert col["encoding"] == "WKB"
    assert col["geometry_types"] == ["LineString", "Point", "Polygon"]
    assert col["bbox"] == [-20.0, -3.0, 10.5, 40.0]
    back = VF.parse_geoparquet_bytes(blob)
    assert back.column("wkb").to_pylist() == tab.column("wkb").to_pylist()
    assert back.column("name").to_pylist() == ["a", "b", "c", "d"]


def test_geoparquet_foreign_column_name_normalized():
    """A file written by another tool with primary column 'geometry'
    reads back with the engine's 'wkb' convention."""
    import io

    import pyarrow.parquet as pq

    tab = pa.table({"geometry": pa.array([W.point(1, 2)], pa.binary()),
                    "k": pa.array([9], pa.int64())})
    geo = {"version": "1.1.0", "primary_column": "geometry",
           "columns": {"geometry": {"encoding": "WKB",
                                    "geometry_types": ["Point"]}}}
    buf = io.BytesIO()
    pq.write_table(tab.replace_schema_metadata(
        {b"geo": json.dumps(geo).encode()}), buf)
    back = VF.parse_geoparquet_bytes(buf.getvalue())
    assert "wkb" in back.column_names and "geometry" not in back.column_names
    g = W.loads(back.column("wkb")[0].as_py())
    assert tuple(g["xy"]) == (1.0, 2.0)


def test_geoparquet_rejects_plain_and_foreign_encoding():
    import io

    import pyarrow.parquet as pq

    buf = io.BytesIO()
    pq.write_table(pa.table({"a": pa.array([1])}), buf)
    with pytest.raises(ValueError, match="no 'geo'"):
        VF.parse_geoparquet_bytes(buf.getvalue())
    tab = pa.table({"g": pa.array(["POINT(1 2)"])})
    geo = {"version": "1.1.0", "primary_column": "g",
           "columns": {"g": {"encoding": "WKT"}}}
    buf = io.BytesIO()
    pq.write_table(tab.replace_schema_metadata(
        {b"geo": json.dumps(geo).encode()}), buf)
    with pytest.raises(ValueError, match="encoding"):
        VF.parse_geoparquet_bytes(buf.getvalue())


def test_geoparquet_sink_readback(tmp_path, ray_session):
    import ray

    tab = _feature_table()
    man = VW.write_geoparquet(ray.data.from_arrow(tab),
                              str(tmp_path / "gpq")).to_pandas()
    assert man["n_features"].sum() == 4
    back = VF.read_geoparquet(sorted(man["path"])).to_pandas()
    assert sorted(back["v"]) == [1, 2, 3, 4]


def test_geoparquet_all_null_geometry_omits_bbox():
    tab = pa.table({"k": pa.array([1]),
                    "wkb": pa.array([None], pa.binary())})
    geo = VF.geoparquet_meta(VW.geoparquet_bytes(tab))
    assert "bbox" not in geo["columns"]["wkb"]
    assert geo["columns"]["wkb"]["geometry_types"] == []
