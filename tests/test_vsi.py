"""sources.vsi: VSI-style path resolution over Arrow filesystems.

The /vsimem/ handler is a REAL non-local filesystem (fsspec memory store
behind pyarrow's PyFileSystem bridge) — reads/writes cross the same
FileSystem interface an S3/GCS URI would, so these tests exercise the
cloud code path offline (reference: port/cpl_vsi_mem.cpp,
cpl_vsil_s3.cpp)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gdal_ray.sources import vsi


def test_resolve_local_and_schemes(tmp_path):
    import pyarrow.fs as pafs
    fs, rel = vsi.resolve(str(tmp_path / "x.parquet"))
    assert isinstance(fs, pafs.LocalFileSystem)
    fs2, rel2 = vsi.resolve("/vsimem/a/b.bin")
    assert rel2 == "/a/b.bin" and not isinstance(fs2, pafs.LocalFileSystem)


def test_vsimem_roundtrip_bytes():
    payload = bytes(np.random.default_rng(7).integers(0, 256, 4096, dtype=np.uint8))
    with vsi.open_output("/vsimem/raster/tile_0_0.png") as f:
        f.write(payload)
    with vsi.open_input("/vsimem/raster/tile_0_0.png") as f:
        assert f.read() == payload
    # ranged read — the access pattern cloud rasters rely on
    with vsi.open_input("/vsimem/raster/tile_0_0.png") as f:
        f.seek(100)
        assert f.read(16) == payload[100:116]


def test_vsimem_parquet_via_arrow():
    t = pa.table({"a": pa.array([1, 2, 3], pa.int64()),
                  "b": pa.array(["x", "y", "z"])})
    with vsi.open_output("/vsimem/tbl/part-0.parquet") as f:
        pq.write_table(t, f)
    fs, rel = vsi.resolve("/vsimem/tbl/part-0.parquet")
    got = pq.read_table(rel, filesystem=fs)
    assert got.equals(t)


def test_ray_read_parquet_over_vsimem(ray_session):
    """End-to-end: ray.data.read_parquet through the VSI filesystem with
    column pruning — the exact shape a /vsis3/ read takes."""
    t = pa.table({"k": pa.array(range(100), pa.int64()),
                  "v": pa.array([i * 0.5 for i in range(100)], pa.float64()),
                  "w": pa.array(["pad"] * 100)})
    with vsi.open_output("/vsimem/ds/part-0.parquet") as f:
        pq.write_table(t, f)
    ds = vsi.read_parquet("/vsimem/ds/part-0.parquet", columns=["k", "v"])
    out = ds.take_all()
    assert len(out) == 100
    assert set(out[0].keys()) == {"k", "v"}
    assert sum(r["k"] for r in out) == 4950


def test_ray_write_parquet_over_vsimem(ray_session):
    import ray.data
    ds = ray.data.range(50).map_batches(
        lambda b: {"id": b["id"], "sq": b["id"] ** 2}, batch_format="numpy")
    vsi.write_parquet(ds, "/vsimem/out_ds")
    back = vsi.read_parquet("/vsimem/out_ds")
    rows = back.take_all()
    assert len(rows) == 50
    assert {r["id"]: r["sq"] for r in rows}[7] == 49


def test_vsiaz_requires_account(monkeypatch):
    monkeypatch.delenv("AZURE_STORAGE_ACCOUNT", raising=False)
    with pytest.raises(ValueError, match="AZURE_STORAGE_ACCOUNT"):
        vsi.resolve("/vsiaz/container/blob.parquet")


def test_pipeline_spec_vsi_read_write(ray_session):
    """Serialized pipeline over VSI paths: read ! filter ! write, all in
    the memory filesystem (the gdalg analog speaking cloud URIs)."""
    t = pa.table({"k": pa.array(range(20), pa.int64())})
    with vsi.open_output("/vsimem/spec_in/p0.parquet") as f:
        pq.write_table(t, f)
    from gdal_ray.pipelines.pipeline_spec import run_pipeline
    run_pipeline({"steps": [
        {"op": "read_parquet", "path": "/vsimem/spec_in/p0.parquet"},
        {"op": "filter", "where": "k >= 10"},
        {"op": "write_parquet", "path": "/vsimem/spec_out"},
    ]})
    back = vsi.read_parquet("/vsimem/spec_out").take_all()
    assert sorted(r["k"] for r in back) == list(range(10, 20))
