"""DEM grid codecs (SRTMHGT/DTED/SAGA/Surfer/ZMap) + TGA tests."""

import numpy as np
import pytest

from gdal_ray.core import demgrids as DG
from gdal_ray.core import tga as TGA


def _dem(ny, nx, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(-500, 4000, size=(ny, nx)).astype(np.int16)


# ---------- SRTMHGT ----------

def test_srtmhgt_roundtrip_and_geotransform():
    a = _dem(25, 25)
    blob = DG.encode_srtmhgt(a)
    assert len(blob) == 25 * 25 * 2
    back, gt, nodata = DG.decode_srtmhgt(blob, "S34W071.hgt")
    assert np.array_equal(back, a)
    assert nodata == -32768.0
    px = 1.0 / 24
    np.testing.assert_allclose(gt, (-71 - px / 2, px, 0,
                                    -33 + px / 2, 0, -px))


def test_srtmhgt_float_and_byte_variants():
    f = np.linspace(0, 100, 16, dtype=np.float32).reshape(4, 4)
    back, _, _ = DG.decode_srtmhgt(DG.encode_srtmhgt(f), "N00E000.hgts")
    assert back.dtype == np.float32 and np.array_equal(back, f)
    b = np.arange(16, dtype=np.uint8).reshape(4, 4)
    back, _, _ = DG.decode_srtmhgt(DG.encode_srtmhgt(b), "N10E020.hgt")
    assert back.dtype == np.uint8 and np.array_equal(back, b)


def test_srtmhgt_rejects_nonsquare():
    with pytest.raises(ValueError):
        DG.encode_srtmhgt(np.zeros((3, 4), np.int16))


# ---------- DTED ----------

def test_dted_roundtrip_negatives_and_nodata():
    a = _dem(121, 121)
    a[0, 0] = -32767                       # nodata survives signed magnitude
    a[5, 7] = -1
    blob = DG.encode_dted(a, ll_lat=-34, ll_lon=-71)
    assert blob[:4] == b"UHL1"
    back, gt, nodata = DG.decode_dted(blob)
    assert np.array_equal(back, a)
    assert nodata == -32767.0
    px = 1.0 / 120
    np.testing.assert_allclose(gt, (-71 - px / 2, px, 0,
                                    -33 + px / 2, 0, -px), atol=1e-9)


def test_dted_checksum_detects_corruption():
    a = _dem(121, 121, seed=5)
    blob = bytearray(DG.encode_dted(a))
    blob[80 + 648 + 2700 + 20] ^= 0x01     # flip a sample byte in column 0
    with pytest.raises(ValueError, match="checksum"):
        DG.decode_dted(bytes(blob))


def test_dted_positive_hemisphere():
    a = _dem(61, 61, seed=7)
    back, gt, _ = DG.decode_dted(DG.encode_dted(a, ll_lat=27, ll_lon=86))
    assert np.array_equal(back, a)
    px = 1.0 / 60
    np.testing.assert_allclose(gt[0], 86 - px / 2, atol=1e-9)
    np.testing.assert_allclose(gt[3], 28 + px / 2, atol=1e-9)


# ---------- SAGA ----------

def test_saga_roundtrip_dtypes():
    gt = (500000.0, 30.0, 0.0, 4100000.0, 0.0, -30.0)
    for dt in (np.uint8, np.int16, np.uint16, np.int32, np.float32,
               np.float64):
        a = _dem(6, 9).astype(dt)
        sgrd, sdat = DG.encode_saga(a, gt=gt, nodata=-99999.0)
        back, bgt, nodata = DG.decode_saga(sgrd, sdat)
        assert back.dtype == dt and np.array_equal(back, a)
        np.testing.assert_allclose(bgt, gt)
        assert nodata == -99999.0


def test_saga_toptobottom_flag():
    a = _dem(4, 3)
    sgrd, sdat = DG.encode_saga(a.astype(np.int16))
    # flip the flag and the rows: decoder must honor TOPTOBOTTOM=TRUE
    sgrd2 = sgrd.replace(b"TOPTOBOTTOM\t= FALSE", b"TOPTOBOTTOM\t= TRUE")
    sdat2 = a.astype("<i2").tobytes()
    back, _, _ = DG.decode_saga(sgrd2, sdat2)
    assert np.array_equal(back, a)


# ---------- Surfer grids ----------

@pytest.mark.parametrize("enc,dec", [
    (DG.encode_gsag, DG.decode_gsag),
    (DG.encode_gsbg, DG.decode_gsbg),
    (DG.encode_gs7bg, DG.decode_gs7bg),
])
def test_surfer_roundtrip(enc, dec):
    gt = (-10.0, 0.5, 0.0, 42.0, 0.0, -0.25)
    a = (_dem(7, 5).astype(np.float32) / 4).astype(np.float32)
    back, bgt, nodata = dec(enc(a, gt=gt))
    np.testing.assert_allclose(back, a, rtol=1e-6)
    np.testing.assert_allclose(bgt, gt, atol=1e-9)
    assert nodata > 1e37                       # Surfer blank value


def test_gsbg_header_layout():
    a = np.zeros((2, 3), np.float32)
    blob = DG.encode_gsbg(a)
    assert blob[:4] == b"DSBB"
    import struct
    nx, ny = struct.unpack_from("<hh", blob, 4)
    assert (nx, ny) == (3, 2)
    assert len(blob) == 56 + 6 * 4


def test_gs7bg_skips_unknown_sections():
    import struct
    a = np.arange(6, dtype=np.float64).reshape(2, 3)
    blob = DG.encode_gs7bg(a)
    # splice a FAULT section between GRID and DATA
    grid_end = 12 + 8 + 72
    fault = struct.unpack("<i", b"FLTI")[0] if False else 0x49544c46
    spliced = blob[:grid_end] + struct.pack("<2i", fault, 4) + b"\0" * 4 \
        + blob[grid_end:]
    back, _, _ = DG.decode_gs7bg(spliced)
    assert np.array_equal(back, a)


# ---------- ZMap ----------

def test_zmap_roundtrip_and_column_major():
    gt = (100.0, 2.0, 0.0, 60.0, 0.0, -1.5)
    a = (_dem(5, 3).astype(np.float64) / 8)
    blob = DG.encode_zmap(a, gt=gt)
    back, bgt, nodata = DG.decode_zmap(blob)
    np.testing.assert_allclose(back, a, atol=1e-6)
    np.testing.assert_allclose(bgt, gt, atol=1e-6)
    assert nodata == 1e30
    # column-major: the first data value is the NW cell
    body = blob.decode().split("@")[2].split()
    assert float(body[0]) == pytest.approx(a[0, 0], abs=1e-6)
    assert float(body[1]) == pytest.approx(a[1, 0], abs=1e-6)


def test_zmap_comments_and_signature():
    with pytest.raises(ValueError):
        DG.decode_zmap(b"! only comments\n! no header\n")


# ---------- TGA ----------

def test_tga_gray_and_truecolor_roundtrip():
    g = np.arange(48, dtype=np.uint8).reshape(6, 8)
    back, pal = TGA.decode_tga(TGA.encode_tga(g))
    assert pal is None and np.array_equal(back, g)
    rgb = np.random.default_rng(1).integers(0, 256, (5, 7, 3), np.uint8)
    back, _ = TGA.decode_tga(TGA.encode_tga(rgb))
    assert np.array_equal(back, rgb)
    rgba = np.random.default_rng(2).integers(0, 256, (4, 4, 4), np.uint8)
    back, _ = TGA.decode_tga(TGA.encode_tga(rgba))
    assert np.array_equal(back, rgba)


def test_tga_rle_roundtrip_runs_and_literals():
    a = np.zeros((3, 300), np.uint8)       # long runs: count-byte cap path
    a[1, :] = np.arange(300) % 256         # literal-heavy row
    a[2, ::2] = 9                          # alternating: literal path
    blob = TGA.encode_tga(a, rle=True)
    back, _ = TGA.decode_tga(blob)
    assert np.array_equal(back, a)
    assert len(blob) < a.size + 18         # runs actually compressed
    rgb = np.repeat(np.arange(12, dtype=np.uint8).reshape(3, 4), 5,
                    axis=1)[:, :, None].repeat(3, axis=2)
    back, _ = TGA.decode_tga(TGA.encode_tga(rgb, rle=True))
    assert np.array_equal(back, rgb)


def test_tga_colormapped_roundtrip():
    idx = np.random.default_rng(3).integers(0, 5, (6, 6), np.uint8)
    pal = np.random.default_rng(4).integers(0, 256, (5, 3), np.uint8)
    back, bpal = TGA.decode_tga(TGA.encode_tga(idx, palette=pal))
    assert np.array_equal(back, idx)
    assert np.array_equal(bpal, pal)


def test_tga_bottom_up_origin():
    g = np.arange(12, dtype=np.uint8).reshape(3, 4)
    blob = bytearray(TGA.encode_tga(g[::-1]))
    blob[17] &= ~0x20                      # clear top-down bit
    back, _ = TGA.decode_tga(bytes(blob))
    assert np.array_equal(back, g)         # decoder flips to row0=top


def test_codecs_dispatch_dem_formats():
    from gdal_ray.core import codecs
    g16 = _dem(16, 16)
    for fmt in ("srtmhgt", "dted"):
        assert np.array_equal(codecs.decode(codecs.encode(g16, fmt), fmt),
                              g16)
    gf = (g16.astype(np.float64) / 4)
    for fmt in ("gsag", "gs7bg", "zmap"):
        np.testing.assert_allclose(
            codecs.decode(codecs.encode(gf, fmt), fmt), gf, atol=1e-6)
    np.testing.assert_allclose(
        codecs.decode(codecs.encode(gf.astype(np.float32), "gsbg"), "gsbg"),
        gf.astype(np.float32), rtol=1e-6)
    gb = (g16 % 251).astype(np.uint8)
    assert np.array_equal(codecs.decode(codecs.encode(gb, "tga"), "tga"), gb)
    # bandwidth profile selects TGA RLE
    runs = np.zeros((16, 16), np.uint8)
    assert len(codecs.encode(runs, "tga", profile="bandwidth")) < \
        len(codecs.encode(runs, "tga"))
