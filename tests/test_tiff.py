"""GeoTIFF codec tests — roundtrips, foreign-stream decode paths, and the
synthetic byte.tif recipe (autotest/gcore/tiff_read.py:45 contract:
20×20 uint8, GDAL checksum 4672)."""
import os
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


def test_not_a_tiff_rejected():
    with pytest.raises(ValueError):
        tiff.decode_tiff(b"PK\x03\x04junk")
    # corrupt BigTIFF header (offset size != 8) is rejected, not misparsed
    with pytest.raises(ValueError):
        tiff.decode_tiff(struct.pack("<2sHHHQ", b"II", 43, 4, 0, 16))


@pytest.mark.parametrize("shape,dtype,tiled,pred", [
    ((37, 23), np.uint8, False, None),
    ((20, 20, 3), np.uint8, True, 2),
    ((15, 31), np.uint16, False, 2),
    ((9, 9), np.float32, True, 3),
])
def test_bigtiff_roundtrip(shape, dtype, tiled, pred):
    rng = np.random.default_rng(int(np.prod(shape)))
    img = (rng.random(shape) * 100).astype(dtype)
    b = tiff.encode_tiff(img, bigtiff=True, tiled=tiled, tile_size=16,
                         predictor=pred,
                         geotransform=(1.0, 0.5, 0, 2.0, 0, -0.5),
                         epsg=32611)
    assert struct.unpack_from("<H", b, 2)[0] == 43      # BigTIFF magic
    out, meta = tiff.decode_tiff_full(b)
    assert meta["bigtiff"] and meta["epsg"] == 32611
    assert meta["geotransform"] == (1.0, 0.5, 0.0, 2.0, 0.0, -0.5)
    np.testing.assert_array_equal(out, img)


def test_bigtiff_sparse_over_4gib(tmp_path):
    """>4 GiB BigTIFF written strip-by-strip with all-zero strips left as
    filesystem HOLES; strip offsets genuinely exceed 2^32 and row-window
    reads come back exact without scanning the file."""
    path = str(tmp_path / "big.tif")
    H, W = 66560, 65536                    # 4.16 GiB of uint8 pixels
    RPS = 256

    def provider(y0, nrows):
        if y0 == 3 * RPS:                  # one early strip
            return ((np.arange(W, dtype=np.int64)[None, :] * 31 + y0) % 251
                    ).astype(np.uint8).repeat(nrows, axis=0)
        if y0 + nrows == H:                # the LAST strip: offset > 4 GiB
            a = np.zeros((nrows, W), np.uint8)
            a[::7, ::13] = 200
            return a
        return None

    total = tiff.write_tiff_file(path, (H, W), np.uint8, provider,
                                 rows_per_strip=RPS,
                                 geotransform=(0.0, 1.0, 0.0, 0.0, 0.0, -1.0))
    assert total > (1 << 32)
    assert os.stat(path).st_size == total
    # sparse: hole strips cost no disk (two written strips ≈ 32 MiB)
    assert os.stat(path).st_blocks * 512 < total // 16

    with open(path, "rb") as f:
        fb = tiff._FileBytes(f, total)
        bo, ifd0, big = tiff._tiff_header(fb)
        tags, _ = tiff._read_ifd(fb, bo, ifd0, big)
        assert big and max(tags[273]) > (1 << 32)
        # targeted row windows: written strips exact, holes read as zeros
        got = tiff.decode_tiff_rows(fb, 3 * RPS + 5, 3 * RPS + 7)
        exp = ((np.arange(W, dtype=np.int64) * 31 + 3 * RPS) % 251
               ).astype(np.uint8)
        np.testing.assert_array_equal(got, np.broadcast_to(exp, (2, W)))
        last0 = ((H - 1) // RPS) * RPS
        tail = tiff.decode_tiff_rows(fb, last0, last0 + 1)
        assert tail[0, 0] == 200 and tail[0, 13] == 200 and tail[0, 1] == 0
        hole = tiff.decode_tiff_rows(fb, RPS * 10, RPS * 10 + 3)
        assert hole.max() == 0


def test_write_tiff_file_classic_roundtrip(tmp_path):
    """Small dense file through the streaming writer + full-file decode."""
    path = str(tmp_path / "small.tif")
    rng = np.random.default_rng(8)
    img = rng.integers(0, 255, size=(300, 190, 3), dtype=np.uint8)

    def provider(y0, nrows):
        return img[y0:y0 + nrows]

    tiff.write_tiff_file(path, img.shape, np.uint8, provider,
                         rows_per_strip=64, bigtiff=False)
    out, meta = tiff.decode_tiff_file(path)
    assert not meta["bigtiff"]
    np.testing.assert_array_equal(out, img)
    np.testing.assert_array_equal(tiff.decode_tiff_rows(
        open(path, "rb").read(), 10, 100), img[10:100])
