"""calc / sieve / fill-nodata / clean-collar / pansharpen / color-map +
standalone reproject stage + pipeline determinism."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.core import codecs, fixtures
from gdal_ray.core import geotransform as gtm
from gdal_ray.stages import raster2 as R2
from gdal_ray.stages.warp import ReprojectImageStage


def img_table(bands_list, gts=None, nodata=None):
    rows = []
    for i, a in enumerate(bands_list):
        rows.append({
            "image_id": f"t{i}", "bytes": codecs.encode_raw(a.astype(np.uint8)),
            "fmt": "raw",
        })
    t = pa.table({
        "image_id": [r["image_id"] for r in rows],
        "bytes": pa.array([r["bytes"] for r in rows], pa.binary()),
        "fmt": [r["fmt"] for r in rows],
    })
    if gts is not None:
        t = t.append_column("geotransform", pa.array(gts, pa.list_(pa.float64(), 6)))
    if nodata is not None:
        t = t.append_column("nodata", pa.array(nodata, pa.float64()))
    return t


def test_calc_band_algebra():
    a = np.full((8, 8, 3), 100, dtype=np.uint8)
    a[:, :, 1] = 50
    t = img_table([a])
    out = R2.calc(t, "(A + B) / 2")
    got = codecs.decode(out.column("bytes")[0].as_py(), "png")
    assert (got == 75).all()
    out2 = R2.calc(t, "where(A > 99, 255, 0)")
    got2 = codecs.decode(out2.column("bytes")[0].as_py(), "png")
    assert (got2 == 255).all()


def test_calc_rejects_builtins():
    t = img_table([np.zeros((4, 4))])
    with pytest.raises(Exception):
        R2.calc(t, "__import__('os').system('true')")


def test_sieve_removes_small_blobs():
    band = np.zeros((16, 16), dtype=np.uint8)
    band[4:12, 4:12] = 7     # big blob (64 px)
    band[0, 0] = 9           # 1-px speck
    band[14, 14] = 3         # 1-px speck
    out = R2.sieve(img_table([band]), threshold=4)
    got = codecs.decode(out.column("bytes")[0].as_py(), "png")
    assert got[0, 0] == 0 and got[14, 14] == 0  # specks absorbed
    assert (got[4:12, 4:12] == 7).all()         # big blob survives


def test_fill_nodata_constant_and_gradient():
    band = np.full((10, 10), 80, dtype=np.uint8)
    band[4:6, 4:6] = 0  # nodata hole
    t = img_table([band], nodata=[0.0])
    out = R2.fill_nodata(t)
    got = codecs.decode(out.column("bytes")[0].as_py(), "png")
    assert (got == 80).all()  # constant fill is exact


def test_clean_collar():
    band = np.full((12, 12), 200, dtype=np.uint8)
    band[:2, :] = 5     # near-black top collar
    band[6, 6] = 5      # interior near-black pixel — NOT part of collar
    out = R2.clean_collar(img_table([band]), threshold=10)
    got = codecs.decode(out.column("bytes")[0].as_py(), "png")
    assert (got[:2, :] == 0).all()
    assert got[6, 6] == 5  # untouched: not edge-connected
    assert out.column("collar_px")[0].as_py() == 24


def test_pansharpen_brovey():
    rgb = np.full((8, 8, 3), 90, dtype=np.uint8)
    pan = np.full((8, 8), 180, dtype=np.uint8)
    t = img_table([rgb]).append_column("pan_bytes",
                                       pa.array([codecs.encode_raw(pan)], pa.binary()))
    out = R2.pansharpen(t)
    got = codecs.decode(out.column("bytes")[0].as_py(), "png")
    assert (got == 180).all()  # ratio 2 doubles every band


def test_color_map_ramp():
    band = np.array([[0, 128, 255]], dtype=np.uint8)
    out = R2.color_map(img_table([band]))
    got = codecs.decode(out.column("bytes")[0].as_py(), "png")
    assert got.shape == (1, 3, 3)
    np.testing.assert_array_equal(got[0, 0], [0, 0, 255])
    np.testing.assert_array_equal(got[0, 1], [0, 255, 0])
    np.testing.assert_array_equal(got[0, 2], [255, 0, 0])


def test_reproject_stage_roundtrip_identity():
    """4326→3857 of a north-up image preserves content (near-resampling of
    the warped result sampled back ≈ original interior)."""
    tbl = fixtures.images_batch(np.array([0, 3]))  # EPSG:4326 images
    tbl = tbl.filter(pa.compute.equal(tbl.column("crs"), pa.scalar("EPSG:4326")))
    assert tbl.num_rows >= 1
    stage = ReprojectImageStage("EPSG:3857", method="bilinear")
    out = stage(tbl)
    assert out.num_rows == tbl.num_rows
    assert out.column("crs")[0].as_py() == "EPSG:3857"
    src = codecs.decode(tbl.column("bytes")[0].as_py(), tbl.column("fmt")[0].as_py())
    dst = codecs.decode(out.column("bytes")[0].as_py(), "png")
    s = src if src.ndim == 2 else src[:, :, 0]
    d = dst if dst.ndim == 2 else dst[:, :, 0]
    # interior means match closely (warp is content-preserving)
    assert abs(float(s[2:-2, 2:-2].mean()) - float(d[2:-2, 2:-2].mean())) < 6.0


@pytest.mark.usefixtures("ray_session")
def test_tile_pipeline_deterministic_across_partitionings():
    """Same catalog, different block layouts → bit-identical tile set
    (checksum multiset equality) — the distributed-determinism pin."""
    import ray

    from gdal_ray.pipelines import tiling
    tbl = fixtures.images_table(16)
    a = ray.data.from_arrow(tbl).repartition(2)
    b = ray.data.from_arrow(tbl).repartition(7)
    ta = {(r["tile_key"], r["checksum"]) for r in
          tiling.base_tiles(a, zoom=9).take_all()}
    tb = {(r["tile_key"], r["checksum"]) for r in
          tiling.base_tiles(b, zoom=9).take_all()}
    assert ta == tb
    assert len(ta) > 0


def test_fill_nodata_idw_edge_semantics():
    """Edge-IDW fill (alg/rasterfill.cpp shape): constant fields fill
    exactly; a symmetric interior gap on a linear ramp recovers the ramp;
    pixels beyond max_distance stay nodata."""
    from gdal_ray.core import codecs
    from gdal_ray.stages import raster2 as R2

    # constant field with a hole
    a = np.full((16, 16), 120, np.uint8)
    a[5:9, 6:10] = 0
    t = pa.table({"image_id": ["c"], "bytes": [codecs.encode_raw(a)],
                  "fmt": ["raw"], "nodata": pa.array([0.0], pa.float64())})
    out = codecs.decode(R2.fill_nodata_idw(t).column("bytes")[0].as_py(), "png")
    assert (out == 120).all()

    # horizontal ramp, one-column gap: IDW of left/right at equal distance
    # reproduces the midpoint exactly; up/down also lie on the ramp
    ramp = np.tile(np.arange(10, 10 + 32, dtype=np.uint8), (8, 1))
    b = ramp.copy()
    b[:, 16] = 0
    t2 = pa.table({"image_id": ["r"], "bytes": [codecs.encode_raw(b)],
                   "fmt": ["raw"], "nodata": pa.array([0.0], pa.float64())})
    out2 = codecs.decode(R2.fill_nodata_idw(t2).column("bytes")[0].as_py(), "png")
    assert (out2 == ramp).all()

    # max_distance: far pixels stay unfilled (nodata)
    c = np.full((8, 40), 200, np.uint8)
    c[:, 5:35] = 0
    t3 = pa.table({"image_id": ["m"], "bytes": [codecs.encode_raw(c)],
                   "fmt": ["raw"], "nodata": pa.array([0.0], pa.float64())})
    out3 = codecs.decode(R2.fill_nodata_idw(
        t3, max_distance=3).column("bytes")[0].as_py(), "png")
    assert (out3[:, 18:22] == 0).all()       # deep interior untouched
    assert (out3[:, 5:8] == 200).all()       # near-edge filled
