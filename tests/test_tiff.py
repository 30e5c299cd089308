"""GeoTIFF codec tests — roundtrips, foreign-stream decode paths, and the
synthetic byte.tif recipe (autotest/gcore/tiff_read.py:45 contract:
20×20 uint8, GDAL checksum 4672)."""
import struct
import zlib

import numpy as np
import pytest

from gdal_ray.core import codecs, tiff
from gdal_ray.core.checksum import checksum


@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.uint16,
                                   np.int32, np.float32, np.float64])
@pytest.mark.parametrize("compression", ["none", "deflate", "lzw"])
def test_roundtrip_dtypes(dtype, compression):
    rng = np.random.default_rng(3)
    if np.issubdtype(dtype, np.floating):
        img = rng.normal(scale=100, size=(45, 37)).astype(dtype)
    else:
        info = np.iinfo(dtype)
        img = rng.integers(info.min, info.max, (45, 37)).astype(dtype)
    data = tiff.encode_tiff(img, compression=compression)
    out, meta = tiff.decode_tiff_full(data)
    assert out.dtype == np.dtype(dtype)
    assert np.array_equal(out, img)
    assert meta["bands"] == 1


@pytest.mark.parametrize("bands", [1, 2, 3, 4])
def test_roundtrip_bands_tiled(bands):
    rng = np.random.default_rng(bands)
    img = rng.integers(0, 256, (300, 210, bands), dtype=np.uint8)
    if bands == 1:
        img = img[:, :, 0]
    data = tiff.encode_tiff(img, tiled=True, tile_size=128, predictor=2)
    out = tiff.decode_tiff(data)
    assert np.array_equal(out, img)


def test_float_predictor3_roundtrip():
    rng = np.random.default_rng(9)
    img = rng.normal(size=(70, 90)).astype(np.float32)
    data = tiff.encode_tiff(img, tiled=True, tile_size=64, predictor=3)
    assert np.array_equal(tiff.decode_tiff(data), img)
    img64 = rng.normal(size=(33, 41))
    data = tiff.encode_tiff(img64, predictor=3)
    assert np.array_equal(tiff.decode_tiff(data), img64)


def test_multistrip_odd_sizes():
    rng = np.random.default_rng(11)
    # wide image → several strips incl. a short final strip
    img = rng.integers(0, 256, (1030, 700, 3), dtype=np.uint8)
    data = tiff.encode_tiff(img, compression="deflate", predictor=2)
    assert np.array_equal(tiff.decode_tiff(data), img)


def test_geotransform_epsg_roundtrip():
    img = np.arange(400, dtype=np.uint8).reshape(20, 20)
    gt = (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    data = tiff.encode_tiff(img, geotransform=gt, epsg=26711)
    out, meta = tiff.decode_tiff_full(data)
    assert np.array_equal(out, img)
    assert meta["geotransform"] == gt
    assert meta["epsg"] == 26711
    assert meta["model_type"] == 1          # projected
    # geographic CS flows through GeographicTypeGeoKey
    data = tiff.encode_tiff(img, geotransform=(10.0, 0.01, 0, 45.0, 0, -0.01),
                            epsg=4326)
    _, meta = tiff.decode_tiff_full(data)
    assert meta["epsg"] == 4326 and meta["model_type"] == 2


def test_synthetic_byte_tif():
    """The canonical fixture contract: 20×20 uint8, checksum 4672."""
    payload, img = tiff.synthetic_byte_tif()
    assert checksum(img) == 4672
    out, meta = tiff.decode_tiff_full(payload)
    assert np.array_equal(out, img)
    assert checksum(out) == 4672
    assert meta["geotransform"] == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    assert meta["epsg"] == 26711


def test_lzw_stress():
    rng = np.random.default_rng(1)
    incompressible = rng.integers(0, 256, 150000, dtype=np.uint8).tobytes()
    assert tiff.lzw_decode(tiff.lzw_encode(incompressible)) == incompressible
    repetitive = b"the quick brown fox jumps over the lazy dog " * 6000
    enc = tiff.lzw_encode(repetitive)
    assert len(enc) < len(repetitive) // 3
    assert tiff.lzw_decode(enc) == repetitive
    assert tiff.lzw_decode(tiff.lzw_encode(b"")) == b""
    assert tiff.lzw_decode(tiff.lzw_encode(b"a")) == b"a"
    assert tiff.lzw_decode(tiff.lzw_encode(b"aaaaaaa")) == b"aaaaaaa"


def _foreign_tiff(img: np.ndarray, bo: str, comp: int = 1,
                  planar: int = 1) -> bytes:
    """Hand-built single-strip (per plane) TIFF in either byte order —
    exercises decode paths our encoder never emits (MM, planar=2, packbits)."""
    h, w = img.shape[:2]
    spp = img.shape[2] if img.ndim == 3 else 1
    a = img.reshape(h, w, spp)
    chunks = []
    if planar == 2:
        for s in range(spp):
            chunks.append(np.ascontiguousarray(
                a[:, :, s].astype(a.dtype.newbyteorder(bo))).tobytes())
    else:
        chunks.append(np.ascontiguousarray(
            a.astype(a.dtype.newbyteorder(bo))).tobytes())
    if comp == 8:
        chunks = [zlib.compress(c) for c in chunks]
    elif comp == 32773:
        def packbits(raw):
            out = bytearray()
            i = 0
            while i < len(raw):
                run = 1
                while (i + run < len(raw) and run < 128
                       and raw[i + run] == raw[i]):
                    run += 1
                if run >= 2:
                    out += bytes([257 - run, raw[i]])
                    i += run
                else:
                    j = i + 1
                    while (j < len(raw) and j - i < 128
                           and (j + 1 >= len(raw) or raw[j] != raw[j + 1])):
                        j += 1
                    out += bytes([j - i - 1]) + raw[i:j]
                    i = j
            return bytes(out)
        chunks = [packbits(c) for c in chunks]
    offsets = []
    pos = 8
    for c in chunks:
        offsets.append(pos)
        pos += len(c)
    ifd_pos = pos + (pos % 2)
    sf = 3 if np.issubdtype(img.dtype, np.floating) else (
        2 if np.issubdtype(img.dtype, np.signedinteger) else 1)
    bps = img.dtype.itemsize * 8
    ents = [
        (256, 4, 1, [w]), (257, 4, 1, [h]),
        (258, 3, spp, [bps] * spp), (259, 3, 1, [comp]),
        (262, 3, 1, [2 if spp >= 3 else 1]),
        (273, 4, len(chunks), offsets), (277, 3, 1, [spp]),
        (278, 4, 1, [h]), (279, 4, len(chunks), [len(c) for c in chunks]),
        (284, 3, 1, [planar]), (339, 3, spp, [sf] * spp),
    ]
    tsz = {3: 2, 4: 4}
    tfmt = {3: "H", 4: "I"}
    oov = bytearray()
    oovpos = {}
    for i, (t, ty, cnt, vals) in enumerate(ents):
        if tsz[ty] * cnt > 4:
            oovpos[i] = ifd_pos + 2 + 12 * len(ents) + 4 + len(oov)
            oov += struct.pack(bo + "%d%s" % (cnt, tfmt[ty]), *vals)
    out = bytearray(struct.pack(bo + "2sHI",
                                b"II" if bo == "<" else b"MM", 42, ifd_pos))
    for c in chunks:
        out += c
    out += b"\x00" * (ifd_pos - len(out))
    out += struct.pack(bo + "H", len(ents))
    for i, (t, ty, cnt, vals) in enumerate(ents):
        if tsz[ty] * cnt > 4:
            field = struct.pack(bo + "I", oovpos[i])
        else:
            field = struct.pack(bo + "%d%s" % (cnt, tfmt[ty]), *vals)
            field += b"\x00" * (4 - len(field))
        out += struct.pack(bo + "HHI", t, ty, cnt) + field
    out += struct.pack(bo + "I", 0)
    out += oov
    return bytes(out)


def test_foreign_bigendian():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 65535, (30, 40), dtype=np.uint16)
    out = tiff.decode_tiff(_foreign_tiff(img, ">"))
    assert np.array_equal(out, img)
    img8 = rng.integers(0, 256, (25, 25, 3), dtype=np.uint8)
    assert np.array_equal(tiff.decode_tiff(_foreign_tiff(img8, ">", comp=8)),
                          img8)


def test_foreign_planar_separate():
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (40, 30, 3), dtype=np.uint8)
    for bo in ("<", ">"):
        out = tiff.decode_tiff(_foreign_tiff(img, bo, planar=2))
        assert np.array_equal(out, img)


def test_foreign_packbits():
    img = np.zeros((20, 50), dtype=np.uint8)
    img[5:15, 10:40] = 200
    img[0, :10] = np.arange(10)
    out = tiff.decode_tiff(_foreign_tiff(img, "<", comp=32773))
    assert np.array_equal(out, img)


def test_codecs_dispatch():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (64, 48, 3), dtype=np.uint8)
    data = codecs.encode(img, "tif")
    assert data[:2] == b"II"
    assert np.array_equal(codecs.decode(data, "tif"), img)
    dem = rng.integers(-100, 3000, (50, 50), dtype=np.int16)
    assert np.array_equal(codecs.decode(codecs.encode(dem, "tiff"), "tiff"),
                          dem)


def test_bigtiff_rejected():
    data = struct.pack("<2sHHHQ", b"II", 43, 8, 0, 16)
    with pytest.raises(NotImplementedError):
        tiff.decode_tiff(data)
    with pytest.raises(ValueError):
        tiff.decode_tiff(b"PK\x03\x04junk")
