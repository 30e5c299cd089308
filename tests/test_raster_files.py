"""read_raster_files / identify_raster tests (gdalmanage identify +
GDALOpen driver-probe analog)."""

import numpy as np
import pytest

from gdal_ray.core import codecs
from gdal_ray.core import demgrids as DG
from gdal_ray.core import rawgrids as RG
from gdal_ray.sources import raster_files as RF


def test_identify_by_magic():
    a = (np.arange(64) % 251).astype(np.uint8).reshape(8, 8)
    cases = {
        "png": codecs.encode(a, "png"),
        "gif": codecs.encode(a % 7, "gif"),
        "bmp": codecs.encode(a, "bmp"),
        "gsag": DG.encode_gsag(a.astype(np.float64)),
        "gsbg": DG.encode_gsbg(a.astype(np.float32)),
        "gs7bg": DG.encode_gs7bg(a.astype(np.float64)),
        "bt": RG.encode_bt(a.astype(np.int16)),
        "lan": RG.encode_lan(a),
        "tiff": codecs.encode(a, "tiff"),
        "dted": DG.encode_dted(((np.arange(961) % 100)
                                .astype(np.int16)).reshape(31, 31)),
        "pnm": codecs.encode(a, "pnm"),
        "webp": codecs.encode(np.dstack([a, a, a]), "webp"),
    }
    for fmt, blob in cases.items():
        assert RF.identify_raster(blob) == fmt, fmt


def test_identify_by_extension_and_grd_sniff():
    a = (np.arange(16, dtype=np.int16)).reshape(4, 4)
    assert RF.identify_raster(DG.encode_srtmhgt(a), "N10E020.hgt") \
        == "srtmhgt"
    assert RF.identify_raster(RG.encode_gtx(a.astype(np.float32)),
                              "g2012.gtx") == "gtx"
    grd, _ = RG.encode_rraster(a.astype(np.int32))
    assert RF.identify_raster(grd, "x.grd") == "rraster"
    with pytest.raises(ValueError, match="not recognized"):
        RF.identify_raster(b"\x00\x01\x02\x03garbage", "x.bin")


def test_read_raster_files_mixed_formats(tmp_path, ray_session):
    gt = (-71.0, 1.0 / 24, 0.0, -33.0, 0.0, -1.0 / 24)
    dem = (np.arange(625) % 1000).astype(np.int16).reshape(25, 25)
    (tmp_path / "S34W071.hgt").write_bytes(DG.encode_srtmhgt(dem))
    (tmp_path / "t.bt").write_bytes(RG.encode_bt(dem, gt=gt))
    hdr, raw = RG.encode_ehdr(dem, gt=gt)
    (tmp_path / "e.bil").write_bytes(raw)
    (tmp_path / "e.hdr").write_bytes(hdr)
    sgrd, sdat = DG.encode_saga(dem, gt=gt)
    (tmp_path / "s.sdat").write_bytes(sdat)
    (tmp_path / "s.sgrd").write_bytes(sgrd)
    rgb = (np.arange(192) % 251).astype(np.uint8).reshape(8, 8, 3)
    (tmp_path / "p.png").write_bytes(codecs.encode(rgb, "png"))

    import pandas as pd
    df = RF.read_raster_files(
        sorted(str(p) for p in tmp_path.iterdir()
               if p.suffix not in (".hdr", ".sgrd"))).to_pandas()
    assert len(df) == 5
    rows = {r.image_id: r for r in df.itertuples()}
    assert rows["S34W071"].fmt == "srtmhgt"
    assert (rows["S34W071"].w, rows["S34W071"].h) == (25, 25)
    np.testing.assert_allclose(rows["t"].geotransform, gt)
    np.testing.assert_allclose(rows["e"].geotransform, gt)
    np.testing.assert_allclose(rows["s"].geotransform, gt)
    assert rows["p"].fmt == "png" and rows["p"].w == 8
    # payloads are the ORIGINAL bytes (zero re-encode)
    assert bytes(rows["t"].bytes)[:10] == b"binterr1.3"


def test_edit_geotransform_stage():
    import pyarrow as pa

    from gdal_ray.stages.raster2 import edit_geotransform

    b = pa.table({"image_id": pa.array(["a"]),
                  "geotransform": pa.array([[10.0, 1.0, 0.0, 20.0,
                                             0.0, -1.0]],
                                           pa.list_(pa.float64())),
                  "nodata": pa.array([0.0], pa.float64())})
    out = edit_geotransform(b, offset=(5, -2), scale=(2, 3), nodata=-9999)
    gt = out.column("geotransform")[0].as_py()
    assert gt == [15.0, 2.0, 0.0, 18.0, 0.0, -3.0]
    assert out.column("nodata")[0].as_py() == -9999.0
    out2 = edit_geotransform(b, gt=(0, 1, 0, 0, 0, -1))
    assert out2.column("geotransform")[0].as_py() == [0, 1, 0, 0, 0, -1]


def test_gcps_to_affine_exact_and_lsq():
    import numpy as np

    from gdal_ray.stages.raster2 import gcps_to_affine

    true_gt = (500000.0, 30.0, 1.5, 4100000.0, -0.5, -30.0)
    rng = np.random.default_rng(3)
    px = rng.uniform(0, 100, 12)
    ln = rng.uniform(0, 80, 12)
    x = true_gt[0] + true_gt[1] * px + true_gt[2] * ln
    y = true_gt[3] + true_gt[4] * px + true_gt[5] * ln
    fit = gcps_to_affine(np.stack([px, ln, x, y], axis=1))
    np.testing.assert_allclose(fit, true_gt, rtol=1e-9)
    import pytest as _pytest
    with _pytest.raises(ValueError, match=">= 3"):
        gcps_to_affine([[0, 0, 0, 0], [1, 0, 1, 0]])
