import numpy as np
import pytest

from gdal_ray.core import codecs
from gdal_ray.core.resample import psnr


@pytest.mark.parametrize("shape", [(20, 20), (13, 7), (20, 20, 3), (8, 9, 4), (5, 5, 2)])
def test_png_roundtrip(shape):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    data = codecs.encode_png(img)
    out = codecs.decode_png(data)
    np.testing.assert_array_equal(out, img)


def test_png_up_filter_roundtrip():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    data = codecs.encode_png(img, filter_type=2)
    np.testing.assert_array_equal(codecs.decode_png(data), img)


def test_png_all_filters_decode():
    """Exercise sub/avg/paeth unfiltering by hand-building filtered rows."""
    import struct, zlib
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    for f in (1, 3, 4):
        # build rows with declared filter f by forward-filtering
        rows = []
        prev = np.zeros(8, dtype=np.int32)
        for y in range(8):
            cur = img[y].astype(np.int32)
            enc = cur.copy()
            for x in range(8):
                a = int(cur[x - 1]) if x >= 1 else 0
                b = int(prev[x])
                c = int(prev[x - 1]) if x >= 1 else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[x] = (cur[x] - pred) & 0xFF
            rows.append(bytes([f]) + enc.astype(np.uint8).tobytes())
            prev = cur
        ihdr = struct.pack(">IIBBBBB", 8, 8, 8, 0, 0, 0, 0)
        data = (b"\x89PNG\r\n\x1a\n" + codecs._chunk(b"IHDR", ihdr)
                + codecs._chunk(b"IDAT", zlib.compress(b"".join(rows)))
                + codecs._chunk(b"IEND", b""))
        np.testing.assert_array_equal(codecs.decode_png(data), img)


def test_raw_roundtrip():
    img = np.random.default_rng(0).integers(0, 256, size=(11, 13, 3), dtype=np.uint8)
    np.testing.assert_array_equal(codecs.decode_raw(codecs.encode_raw(img)), img)


@pytest.mark.parametrize("fmt", ["jpeg", "webp"])
def test_lossy_stub_psnr_pin(fmt):
    """The lossy stub must actually lose information but stay >= 40 dB —
    the BASELINE.md lossy re-encode pin."""
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    out = codecs.decode(codecs.encode(img, fmt), fmt)
    assert out.shape == img.shape
    assert not np.array_equal(out, img)  # genuinely lossy
    assert psnr(img, out) >= 40.0
    # deterministic
    assert codecs.encode(img, fmt) == codecs.encode(img, fmt)


def test_dispatch_matches():
    img = np.zeros((4, 4), dtype=np.uint8)
    for fmt in ("raw", "png", "jpeg", "webp"):
        np.testing.assert_array_equal(
            codecs.decode(codecs.encode(img, fmt), fmt).shape, img.shape)
