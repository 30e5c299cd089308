"""BMP / PNM / GIF codec tests (frmts/bmp, frmts/pnm, frmts/gif analogs)."""

import numpy as np
import pytest

from gdal_ray.core import codecs
from gdal_ray.core.bmp import decode_bmp, encode_bmp
from gdal_ray.core.gif import decode_gif, encode_gif
from gdal_ray.core.pnm import decode_pnm, encode_pnm

RNG = np.random.default_rng(42)


# ---------- BMP ----------

def test_bmp_gray_roundtrip():
    g = RNG.integers(0, 256, (13, 17), dtype=np.uint8)
    a, pal = decode_bmp(encode_bmp(g))
    assert np.array_equal(a, g)
    # identity grayscale palette
    assert np.array_equal(pal, np.repeat(
        np.arange(256, dtype=np.uint8)[:, None], 3, 1))


def test_bmp_rgb_roundtrip_padding():
    # widths 1..8 exercise every 4-byte row-padding remainder
    for w in range(1, 9):
        c = RNG.integers(0, 256, (5, w, 3), dtype=np.uint8)
        a, pal = decode_bmp(encode_bmp(c))
        assert np.array_equal(a, c) and pal is None


def test_bmp_custom_palette():
    pal = RNG.integers(0, 256, (7, 3), dtype=np.uint8)
    ind = RNG.integers(0, 7, (6, 11), dtype=np.uint8)
    a, pal2 = decode_bmp(encode_bmp(ind, pal))
    assert np.array_equal(a, ind) and np.array_equal(pal2, pal)


def test_bmp_header_fields():
    import struct
    blob = encode_bmp(np.zeros((3, 5, 3), np.uint8))
    assert blob[:2] == b"BM"
    assert struct.unpack_from("<I", blob, 2)[0] == len(blob)  # file size
    w, h = struct.unpack_from("<ii", blob, 18)
    assert (w, h) == (5, 3)                 # positive h = bottom-up
    assert struct.unpack_from("<H", blob, 28)[0] == 24       # bit count


def test_bmp_1bit_4bit_topdown_decode():
    import struct
    # hand-build a 4-bit top-down 3x2 file: rows not flipped
    pal = bytes([0, 0, 0, 0, 255, 255, 255, 0])  # BGRA x2
    rows = bytes([0x01, 0x10, 0, 0]) + bytes([0x10, 0x00, 0, 0])
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + 8 + 8, 0, 0, 14 + 40 + 8)
    info = struct.pack("<IiiHHIIiiII", 40, 3, -2, 1, 4, 0, 8, 0, 0, 2, 0)
    a, p = decode_bmp(hdr + info + pal + rows)
    assert np.array_equal(a, [[0, 1, 1], [1, 0, 0]])
    assert np.array_equal(p, [[0, 0, 0], [255, 255, 255]])
    # 1-bit: 10110000 -> pixels 1,0,1
    rows1 = bytes([0b10100000, 0, 0, 0]) + bytes([0b01000000, 0, 0, 0])
    info1 = struct.pack("<IiiHHIIiiII", 40, 3, -2, 1, 1, 0, 8, 0, 0, 2, 0)
    a1, _ = decode_bmp(hdr[:2] + hdr[2:] and
                       struct.pack("<2sIHHI", b"BM", 0, 0, 0, 14 + 40 + 8)
                       + info1 + pal + rows1)
    assert np.array_equal(a1, [[1, 0, 1], [0, 1, 0]])


def test_bmp_rejects():
    with pytest.raises(ValueError):
        decode_bmp(b"XX" + b"\0" * 60)
    with pytest.raises(ValueError):
        encode_bmp(np.zeros((3, 3), np.int32))


# ---------- PNM ----------

@pytest.mark.parametrize("shape,dtype", [
    ((9, 7), np.uint8), ((9, 7), np.uint16),
    ((4, 6, 3), np.uint8), ((4, 6, 3), np.uint16)])
def test_pnm_roundtrip(shape, dtype):
    a = RNG.integers(0, np.iinfo(dtype).max + 1, shape, dtype=dtype)
    b = decode_pnm(encode_pnm(a))
    assert b.dtype == dtype and np.array_equal(a, b)


def test_pnm_16bit_is_big_endian():
    a = np.array([[0x0102]], dtype=np.uint16)
    blob = encode_pnm(a)
    assert blob.endswith(b"\x01\x02")


def test_pnm_ascii_and_comments():
    txt = b"P2\n# c1\n3 2 # inline\n255\n0 1 2 3 4 5\n"
    assert np.array_equal(decode_pnm(txt),
                          np.arange(6, dtype=np.uint8).reshape(2, 3))
    txt3 = b"P3 2 1 65535 " + b" ".join(
        str(v).encode() for v in range(300, 306))
    a = decode_pnm(txt3)
    assert a.dtype == np.uint16
    assert np.array_equal(a, np.arange(300, 306).reshape(1, 2, 3))


def test_pnm_binary_body_after_single_whitespace():
    # maxval terminated by exactly one byte; body may START with
    # whitespace-valued bytes (0x20 = 32 is a legal sample)
    a = np.full((2, 2), 32, dtype=np.uint8)
    assert np.array_equal(decode_pnm(encode_pnm(a)), a)


def test_pnm_rejects():
    with pytest.raises(ValueError):
        decode_pnm(b"P7\n1 1\n255\n\x00")
    with pytest.raises(ValueError):
        decode_pnm(b"P5\n4 4\n255\n\x00\x01")     # truncated body


# ---------- GIF ----------

def test_gif_roundtrip_random_full_palette():
    # random 256-colour data: forces width growth up to 12 bits and at
    # least one 4096-entry dictionary reset
    ind = RNG.integers(0, 256, (128, 128), dtype=np.uint8)
    pal = RNG.integers(0, 256, (256, 3), dtype=np.uint8)
    a, p = decode_gif(encode_gif(ind, pal))
    assert np.array_equal(a, ind) and np.array_equal(p, pal)


def test_gif_roundtrip_structured():
    # long runs exercise the KwKwK case and deep prefix chains
    ind = (np.indices((60, 200)).sum(0) % 5).astype(np.uint8)
    pal = RNG.integers(0, 256, (5, 3), dtype=np.uint8)
    a, p = decode_gif(encode_gif(ind, pal))
    assert np.array_equal(a, ind)
    assert np.array_equal(p[:5], pal)


def test_gif_constant_and_tiny():
    a, _ = decode_gif(encode_gif(np.zeros((7, 9), np.uint8),
                                 np.array([[9, 8, 7]], np.uint8)))
    assert np.array_equal(a, np.zeros((7, 9)))
    a, _ = decode_gif(encode_gif(np.array([[3]], np.uint8),
                                 RNG.integers(0, 256, (4, 3), np.uint8)))
    assert a.shape == (1, 1) and a[0, 0] == 3


def _descriptor_at(blob) -> int:
    """Offset of the image descriptor: header + screen + GCT."""
    return 13 + 3 * (2 << (blob[10] & 0x07))


def test_gif_extension_blocks_skipped():
    ind = RNG.integers(0, 4, (8, 8), dtype=np.uint8)
    pal = RNG.integers(0, 256, (4, 3), dtype=np.uint8)
    blob = bytearray(encode_gif(ind, pal))
    # splice a Graphic Control Extension before the image descriptor
    at = _descriptor_at(blob)
    gce = bytes([0x21, 0xF9, 0x04, 0, 0, 0, 0, 0x00])
    blob[at:at] = gce
    a, _ = decode_gif(bytes(blob))
    assert np.array_equal(a, ind)


def test_gif_interlaced_decode():
    # re-encode, then hand-interlace the pixel data: rows permuted into
    # pass order, interlace flag set
    ind = (np.arange(17 * 6, dtype=np.uint8) % 7).reshape(17, 6)
    pal = RNG.integers(0, 256, (7, 3), dtype=np.uint8)
    rows = np.concatenate([np.arange(s, 17, st)
                           for s, st in ((0, 8), (4, 8), (2, 4), (1, 2))])
    blob = bytearray(encode_gif(ind[rows], pal))
    at = _descriptor_at(blob)
    assert blob[at] == 0x2C
    blob[at + 9] |= 0x40                       # set interlace bit
    a, _ = decode_gif(bytes(blob))
    assert np.array_equal(a, ind)


def test_gif_truncation_rejected():
    blob = encode_gif(RNG.integers(0, 4, (8, 8), np.uint8),
                      RNG.integers(0, 256, (4, 3), np.uint8))
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF" + blob)


def test_codecs_dispatch():
    g = RNG.integers(0, 256, (12, 12), dtype=np.uint8)
    c = RNG.integers(0, 256, (5, 6, 3), dtype=np.uint8)
    assert np.array_equal(codecs.decode(codecs.encode(g, "bmp"), "bmp"), g)
    assert np.array_equal(codecs.decode(codecs.encode(c, "bmp"), "bmp"), c)
    assert np.array_equal(codecs.decode(codecs.encode(c, "pnm"), "pnm"), c)
    assert np.array_equal(codecs.decode(codecs.encode(g, "gif"), "gif"), g)
    with pytest.raises(ValueError):
        codecs.encode(c, "gif")           # RGB needs palette stage first
