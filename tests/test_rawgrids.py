"""BT / GTX / EHdr / Idrisi RST / ERS raw-grid codec tests."""

import struct

import numpy as np
import pytest

from gdal_ray.core import rawgrids as RG

GT = (500000.0, 30.0, 0.0, 4100000.0, 0.0, -30.0)


def _grid(ny=6, nx=9, seed=3, dt=np.int16):
    rng = np.random.default_rng(seed)
    return rng.integers(-500, 4000, size=(ny, nx)).astype(dt)


# ---------- BT ----------

@pytest.mark.parametrize("dt", [np.int16, np.int32, np.float32])
def test_bt_roundtrip(dt):
    a = _grid(dt=dt)
    back, gt, _ = RG.decode_bt(RG.encode_bt(a, gt=GT))
    assert back.dtype == dt and np.array_equal(back, a)
    np.testing.assert_allclose(gt, GT)


def test_bt_column_major_south_first():
    a = np.arange(6, dtype=np.int16).reshape(2, 3)   # rows: [0 1 2],[3 4 5]
    blob = RG.encode_bt(a)
    # first sample after the 256-byte header is column 0 SOUTH cell = 3
    v, = struct.unpack_from("<h", blob, 256)
    assert v == 3
    assert blob[:10] == b"binterr1.3"
    assert RG.decode_bt(blob)[0].tolist() == a.tolist()


def test_bt_rejects_bad_dtype_and_signature():
    with pytest.raises(ValueError):
        RG.encode_bt(_grid(dt=np.float64))
    with pytest.raises(ValueError):
        RG.decode_bt(b"notaterr" + b"\0" * 300)


# ---------- GTX ----------

def test_gtx_roundtrip_and_header():
    a = _grid(dt=np.int16).astype(np.float32)
    blob = RG.encode_gtx(a, gt=GT)
    yll, xll, dlat, dlon, nrows, ncols = struct.unpack_from(">4d2i", blob)
    assert (nrows, ncols) == (6, 9)
    assert xll == GT[0] + 15.0                     # SW sample center
    assert yll == GT[3] - 30.0 * 5.5
    back, gt, nodata = RG.decode_gtx(blob)
    assert np.array_equal(back, a)
    np.testing.assert_allclose(gt, GT)
    assert nodata == -88.8888


def test_gtx_float64_variant():
    a = (_grid(dt=np.int16).astype(np.float64)) / 8
    back, gt, _ = RG.decode_gtx(RG.encode_gtx(a, gt=GT))
    assert back.dtype == np.float64 and np.array_equal(back, a)


# ---------- EHdr ----------

@pytest.mark.parametrize("layout", ["BIL", "BIP", "BSQ"])
def test_ehdr_multiband_layouts(layout):
    rng = np.random.default_rng(9)
    cube = rng.integers(0, 255, size=(3, 5, 7)).astype(np.uint8)
    hdr, raw = RG.encode_ehdr(cube, gt=GT, layout=layout, nodata=0)
    back, gt, nodata = RG.decode_ehdr(hdr, raw)
    assert np.array_equal(back, cube)
    np.testing.assert_allclose(gt, GT)
    assert nodata == 0.0


@pytest.mark.parametrize("dt", [np.uint8, np.int16, np.int32, np.float32])
def test_ehdr_singleband_dtypes(dt):
    a = _grid(dt=dt)
    hdr, raw = RG.encode_ehdr(a, gt=GT)
    back, gt, _ = RG.decode_ehdr(hdr, raw)
    assert back.dtype == dt and np.array_equal(back, a)
    assert b"ULXMAP         500015" in hdr          # cell-center convention


def test_ehdr_xllcorner_variant():
    hdr = (b"NROWS 2\nNCOLS 2\nNBITS 8\nXLLCORNER 10\nYLLCORNER 20\n"
           b"CELLSIZE 5\n")
    raw = bytes([1, 2, 3, 4])
    back, gt, _ = RG.decode_ehdr(hdr, raw)
    assert back.tolist() == [[1, 2], [3, 4]]
    np.testing.assert_allclose(gt, (10, 5, 0, 30, 0, -5))


# ---------- Idrisi ----------

@pytest.mark.parametrize("dt", [np.uint8, np.int16, np.float32])
def test_idrisi_roundtrip(dt):
    a = _grid(dt=dt) if dt != np.uint8 else \
        (_grid() % 250).astype(np.uint8)
    rdc, rst = RG.encode_idrisi(a, gt=GT, nodata=None)
    back, gt, nodata = RG.decode_idrisi(rdc, rst)
    assert back.dtype == dt and np.array_equal(back, a)
    np.testing.assert_allclose(gt, GT)
    assert nodata is None
    assert b"file format : IDRISI Raster A.1" in rdc


def test_idrisi_flag_value():
    a = _grid(dt=np.int16)
    rdc, rst = RG.encode_idrisi(a, gt=GT, nodata=-9999)
    _, _, nodata = RG.decode_idrisi(rdc, rst)
    assert nodata == -9999.0


# ---------- ERS ----------

@pytest.mark.parametrize("dt", [np.uint8, np.int16, np.uint32, np.float32,
                                np.float64])
def test_ers_roundtrip_dtypes(dt):
    a = _grid(dt=dt)
    ers, raw = RG.encode_ers(a, gt=GT, nodata=-1)
    back, gt, nodata = RG.decode_ers(ers, raw)
    assert back.dtype == dt and np.array_equal(back, a)
    np.testing.assert_allclose(gt, GT)
    assert nodata == -1.0
    assert b"DatasetHeader Begin" in ers


def test_ers_multiband_bil():
    rng = np.random.default_rng(4)
    cube = (rng.normal(size=(2, 4, 5)) * 100).astype(np.float32)
    ers, raw = RG.encode_ers(cube, gt=GT)
    back, _, _ = RG.decode_ers(ers, raw)
    assert np.array_equal(back, cube)
    # BIL: first row of band 0 then first row of band 1
    flat = np.frombuffer(raw, "<f4")
    np.testing.assert_allclose(flat[:5], cube[0, 0])
    np.testing.assert_allclose(flat[5:10], cube[1, 0])
