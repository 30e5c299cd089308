"""NTv2 / LAN / RRaster codec tests (frmts/raw/{ntv2,lan,rraster})."""

import struct

import numpy as np
import pytest

from gdal_ray.core import rawgrids as RG

GT_DEG = (-72.0, 0.25, 0.0, 46.0, 0.0, -0.125)


def _shift_grid(ny=5, nx=7, seed=2):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=(ny, nx, 4)) * 3).astype(np.float32)


# ---------- NTv2 ----------

def test_ntv2_roundtrip_orientation_and_gt():
    a = _shift_grid()
    blob = RG.encode_ntv2(a, gt=GT_DEG)
    back, gt, _ = RG.decode_ntv2(blob)
    assert np.array_equal(back, a)
    np.testing.assert_allclose(gt, GT_DEG, atol=1e-12)


def test_ntv2_file_layout_se_first():
    """First data record in the FILE is the SOUTH-EAST sample."""
    a = np.zeros((2, 3, 4), np.float32)
    a[1, 2, 0] = 42.0                      # south-east lat-shift
    blob = RG.encode_ntv2(a, gt=GT_DEG)
    # header: 11 + 11 records of 16 bytes
    v, = struct.unpack_from("<f", blob, 22 * 16)
    assert v == 42.0


def test_ntv2_count_mismatch_raises():
    a = _shift_grid(3, 3)
    blob = bytearray(RG.encode_ntv2(a, gt=GT_DEG))
    # corrupt GS_COUNT (record index 21, payload at +8)
    struct.pack_into("<i", blob, 21 * 16 + 8, 5)
    with pytest.raises(ValueError, match="GS_COUNT"):
        RG.decode_ntv2(bytes(blob))


def test_ntv2_rejects_wrong_shape():
    with pytest.raises(ValueError):
        RG.encode_ntv2(np.zeros((4, 4), np.float32))


# ---------- LAN ----------

@pytest.mark.parametrize("dt,nb", [(np.uint8, 1), (np.uint8, 3),
                                   (np.int16, 2)])
def test_lan_roundtrip(dt, nb):
    rng = np.random.default_rng(7)
    cube = rng.integers(0, 120, size=(nb, 6, 9)).astype(dt)
    arr = cube[0] if nb == 1 else cube
    gt = (500000.0, 30.0, 0.0, 4100000.0, 0.0, -30.0)
    back, bgt, _ = RG.decode_lan(RG.encode_lan(arr, gt=gt))
    assert np.array_equal(back, arr)
    # float32 header coords: compare at float32 precision
    np.testing.assert_allclose(bgt, gt, rtol=1e-6)


def test_lan_header_fields():
    a = np.zeros((3, 4), np.uint8)
    blob = RG.encode_lan(a)
    assert blob[:6] == b"HEAD74"
    assert struct.unpack_from("<i", blob, 16)[0] == 4   # ncols
    assert struct.unpack_from("<i", blob, 20)[0] == 3   # nrows
    with pytest.raises(ValueError):
        RG.decode_lan(b"BOGUS!" + blob[6:])


# ---------- RRaster ----------

@pytest.mark.parametrize("dt", [np.uint8, np.int16, np.int32, np.float32,
                                np.float64])
def test_rraster_roundtrip_dtypes(dt):
    rng = np.random.default_rng(5)
    a = rng.integers(-100, 100, size=(5, 8)).astype(dt)
    gt = (10.0, 0.5, 0.0, 20.0, 0.0, -0.25)
    grd, gri = RG.encode_rraster(a, gt=gt, nodata=-9999)
    back, bgt, nodata = RG.decode_rraster(grd, gri)
    assert back.dtype == dt and np.array_equal(back, a)
    np.testing.assert_allclose(bgt, gt)
    assert nodata == -9999.0
    assert b"[georeference]" in grd and b"bandorder=BIL" in grd


def test_rraster_multiband_bil():
    rng = np.random.default_rng(6)
    cube = rng.integers(0, 255, size=(3, 4, 6)).astype(np.uint8)
    grd, gri = RG.encode_rraster(cube)
    back, _, _ = RG.decode_rraster(grd, gri)
    assert np.array_equal(back, cube)
    flat = np.frombuffer(gri, np.uint8)
    np.testing.assert_array_equal(flat[:6], cube[0, 0])   # BIL row0 band0
    np.testing.assert_array_equal(flat[6:12], cube[1, 0])


def test_rraster_bsq_read():
    cube = np.arange(24, dtype=np.uint8).reshape(2, 3, 4)
    grd, _ = RG.encode_rraster(cube)
    grd = grd.replace(b"bandorder=BIL", b"bandorder=BSQ")
    back, _, _ = RG.decode_rraster(grd, cube.tobytes())
    assert np.array_equal(back, cube)


# ---------- USGS DEM ----------

def test_usgsdem_roundtrip():
    rng = np.random.default_rng(11)
    a = rng.integers(-400, 3000, size=(21, 17)).astype(np.int16)
    a[3, 4] = -32767                                 # nodata survives
    gt = (-106.0, 1.0 / 1200, 0.0, 40.0, 0.0, -1.0 / 1200)
    blob = RG.encode_usgsdem(a, gt=gt)
    assert len(blob) % 1024 == 0
    back, bgt, nodata = RG.decode_usgsdem(blob)
    assert np.array_equal(back, a)
    np.testing.assert_allclose(bgt, gt, atol=1e-12)
    assert nodata == -32767.0


def test_usgsdem_a_record_fields():
    a = np.zeros((4, 3), np.int16)
    blob = RG.encode_usgsdem(a)
    text = blob[:1024].decode()
    assert int(text[156:162]) == 0                   # geographic
    assert int(text[858:864]) == 3                   # profile count
    assert "D+" in text[546:570] or "D-" in text[546:570] or \
        "D" in text[546:570]                         # D-exponent corners


def test_usgsdem_rejects_utm():
    a = np.zeros((2, 2), np.int16)
    blob = bytearray(RG.encode_usgsdem(a))
    blob[156:162] = b"     1"                        # claim UTM
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        RG.decode_usgsdem(bytes(blob))


# ---------- Terragen ----------

def test_terragen_roundtrip():
    rng = np.random.default_rng(13)
    a = rng.integers(-2000, 8000, (9, 14)).astype(np.int16)
    blob = RG.encode_terragen(a, scal=25.0, height_scale=512,
                              base_height=-3)
    assert blob[:16] == b"TERRAGENTERRAIN "
    back, gt, (hs, base, scal) = RG.decode_terragen(blob)
    assert np.array_equal(back, a)
    assert (hs, base, scal) == (512, -3, 25.0)
    np.testing.assert_allclose(gt, (0, 25, 0, 9 * 25, 0, -25))
    # bottom-up storage: first sample after ALTW header is the SW cell
    altw = blob.index(b"ALTW") + 8
    assert np.frombuffer(blob, "<i2", 1, altw)[0] == a[-1, 0]


def test_terragen_rejects_foreign():
    import pytest as _pytest
    with _pytest.raises(ValueError, match="magic"):
        RG.decode_terragen(b"NOTTERRAGEN" + b"\0" * 30)


# ---------- KRO + FITS ----------

def test_kro_roundtrip():
    rng = np.random.default_rng(17)
    rgb = rng.integers(0, 255, (5, 7, 3)).astype(np.uint8)
    back, _, _ = RG.decode_kro(RG.encode_kro(rgb))
    assert np.array_equal(back, rgb)
    g16 = rng.integers(0, 60000, (4, 6)).astype(np.uint16)
    back, _, _ = RG.decode_kro(RG.encode_kro(g16))
    assert back.dtype == np.uint16 and np.array_equal(back, g16)
    f = rng.normal(size=(3, 3)).astype(np.float32)
    back, _, _ = RG.decode_kro(RG.encode_kro(f))
    assert np.array_equal(back, f)
    blob = RG.encode_kro(rgb)
    assert blob[:4] == b"KRO\x01"
    import struct
    assert struct.unpack_from(">4i", blob, 4) == (7, 5, 8, 3)


@pytest.mark.parametrize("dt", [np.uint8, np.int16, np.int32,
                                np.float32, np.float64])
def test_fits_roundtrip(dt):
    rng = np.random.default_rng(19)
    a = rng.integers(-100, 100, (6, 9)).astype(dt)
    blob = RG.encode_fits(a)
    assert len(blob) % 2880 == 0
    assert blob.startswith(b"SIMPLE  =")
    back, _, blank = RG.decode_fits(blob)
    assert back.dtype == dt and np.array_equal(back, a)
    assert blank is None


def test_fits_bottom_up_and_bscale():
    a = np.arange(6, dtype=np.int16).reshape(2, 3)
    blob = RG.encode_fits(a)
    # first data sample (offset 2880) is the BOTTOM-left cell
    assert np.frombuffer(blob, ">i2", 1, 2880)[0] == a[-1, 0]
    # splice BSCALE/BZERO cards before END
    hdr = blob[:2880]
    end_at = hdr.index(b"END")
    cards = (f"{'BSCALE':<8}= {'2.0':>20}".ljust(80)
             + f"{'BZERO':<8}= {'10.0':>20}".ljust(80)).encode()
    newhdr = (hdr[:end_at] + cards + b"END".ljust(80))
    newhdr += b" " * (-len(newhdr) % 2880)
    back, _, _ = RG.decode_fits(newhdr + blob[2880:])
    np.testing.assert_allclose(back, a * 2.0 + 10.0)


# ---------- GXF ----------

def test_gxf_roundtrip():
    gt = (500000.0, 30.0, 0.0, 4100000.0, 0.0, -30.0)
    rng = np.random.default_rng(23)
    a = rng.integers(-500, 4000, (5, 8)).astype(np.float64) / 4
    blob = RG.encode_gxf(a, gt=gt, nodata=-9999.0)
    assert blob.startswith(b"#TITLE")
    back, bgt, nodata = RG.decode_gxf(blob)
    np.testing.assert_allclose(back, a)
    np.testing.assert_allclose(bgt, gt)
    assert nodata == -9999.0
    # SENSE 1: first #GRID line is the BOTTOM row
    grid = blob.split(b"#GRID\n")[1].splitlines()[0].split()
    assert float(grid[0]) == a[-1, 0]


def test_gxf_foreign_sense_raises():
    blob = RG.encode_gxf(np.zeros((2, 2)))
    blob = blob.replace(b"#SENSE\n1\n", b"#SENSE\n-2\n")
    import pytest as _pytest
    with _pytest.raises(NotImplementedError, match="SENSE"):
        RG.decode_gxf(blob)


# ---------- SIGDEM ----------

def test_sigdem_roundtrip_with_nodata():
    gt = (500000.0, 30.0, 0.0, 4100000.0, 0.0, -30.0)
    rng = np.random.default_rng(29)
    a = rng.integers(-4000, 8000, (6, 9)).astype(np.float64) / 8
    a[2, 3] = np.nan
    blob = RG.encode_sigdem(a, gt=gt, scale_z=1024.0)  # dyadic: exact
    assert blob[:6] == b"SIGDEM"
    back, bgt, _ = RG.decode_sigdem(blob)
    np.testing.assert_array_equal(np.isnan(back), np.isnan(a))
    np.testing.assert_allclose(back[~np.isnan(a)], a[~np.isnan(a)])
    np.testing.assert_allclose(bgt, gt)
    # bottom-up: first sample after the 132-byte header is the SW cell
    import struct
    v, = struct.unpack_from(">i", blob, 132)
    assert v == int(round(a[-1, 0] * 1024))


# ---------- JDEM ----------

def test_jdem_roundtrip():
    rng = np.random.default_rng(31)
    a = rng.integers(-999, 9999, (5, 8)).astype(np.float64) / 10
    gt = (135.0, 2.0 / 3600, 0.0, 36.0, 0.0, -1.0 / 3600)  # sec-aligned
    blob = RG.encode_jdem(a, gt=gt)
    assert len(blob) == 1011 + 5 * (9 + 5 * 8)
    back, bgt, _ = RG.decode_jdem(blob)
    np.testing.assert_allclose(back, a)
    np.testing.assert_allclose(bgt, gt, atol=1e-12)


def test_jdem_detects_ascii_corruption():
    a = np.zeros((2, 3), np.float64)
    blob = bytearray(RG.encode_jdem(a))
    blob[1011] ^= 0x01                      # corrupt row 0 mesh code
    import pytest as _pytest
    with _pytest.raises(ValueError, match="mesh code"):
        RG.decode_jdem(bytes(blob))


# ---------- NGSGEOID ----------

def test_ngsgeoid_roundtrip_and_endianness():
    rng = np.random.default_rng(37)
    a = (rng.normal(size=(6, 9)) * 30).astype(np.float32)
    gt = (-100.0, 1.0 / 60, 0.0, 42.0, 0.0, -1.0 / 60)
    blob = RG.encode_ngsgeoid(a, gt=gt)
    back, bgt, _ = RG.decode_ngsgeoid(blob)
    assert np.array_equal(back, a)
    np.testing.assert_allclose(bgt, gt, atol=1e-12)
    # south-first storage
    import struct
    v, = struct.unpack_from("<f", blob, 44)
    assert v == a[-1, 0]
    # big-endian variant reads via the IKIND marker
    be = struct.pack(">4d3i", *struct.unpack_from("<4d3i", blob, 0)) \
        + a[::-1, :].astype(">f4").tobytes()
    back2, _, _ = RG.decode_ngsgeoid(be)
    assert np.array_equal(back2, a)
    with pytest.raises(ValueError, match="IKIND"):
        RG.decode_ngsgeoid(b"\0" * 64)
