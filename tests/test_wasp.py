"""WAsP .map driver tests (ogr/ogrsf_frmts/wasp analog)."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.core import wkb as W
from gdal_ray.sources import vector_formats as VF
from gdal_ray.sources import vector_writers as VW


def _lines(n=3):
    rng = np.random.default_rng(5)
    return [W.dumps({"type": "LineString",
                     "xy": rng.integers(-1000, 1000, (k + 2, 2))
                     .astype(np.float64) / 4})
            for k in range(n)]


def test_wasp_elevation_roundtrip():
    tab = pa.table({"z": pa.array([10.5, -3.25, 0.0], pa.float64()),
                    "wkb": pa.array(_lines(), pa.binary())})
    blob = VW.wasp_bytes(tab)
    assert blob.startswith(b"+ ")
    back = VF.parse_wasp_bytes(blob)
    assert back.column("z").to_pylist() == tab.column("z").to_pylist()
    assert back.column("wkb").to_pylist() == tab.column("wkb").to_pylist()


def test_wasp_roughness_roundtrip():
    tab = pa.table({"z_left": pa.array([0.03, 0.1], pa.float64()),
                    "z_right": pa.array([0.4, 0.0], pa.float64()),
                    "wkb": pa.array(_lines(2), pa.binary())})
    back = VF.parse_wasp_bytes(VW.wasp_bytes(tab))
    assert back.column_names == ["z_left", "z_right", "wkb"]
    assert back.column("z_left").to_pylist() == [0.03, 0.1]
    assert back.column("wkb").to_pylist() == tab.column("wkb").to_pylist()


def test_wasp_rejects_non_lines():
    tab = pa.table({"z": pa.array([1.0]),
                    "wkb": pa.array([W.point(0, 0)], pa.binary())})
    with pytest.raises(ValueError, match="LineString"):
        VW.wasp_bytes(tab)
    with pytest.raises(ValueError, match="'z'"):
        VW.wasp_bytes(pa.table({"wkb": pa.array(_lines(1), pa.binary())}))


def test_wasp_sink_readback(tmp_path, ray_session):
    import ray

    tab = pa.table({"z": pa.array([5.0, 7.5], pa.float64()),
                    "wkb": pa.array(_lines(2), pa.binary())})
    man = VW.write_wasp(ray.data.from_arrow(tab),
                        str(tmp_path / "wasp")).to_pandas()
    back = VF.read_wasp(sorted(man["path"])).to_pandas()
    assert sorted(back["z"]) == [5.0, 7.5]
