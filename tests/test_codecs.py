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


@pytest.mark.parametrize("shape", [(20, 20), (13, 7, 3), (8, 9, 2), (5, 6, 4)])
@pytest.mark.parametrize("filter_type", [0, 2])
def test_png16_roundtrip(shape, filter_type):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 65536, size=shape, dtype=np.uint16)
    data = codecs.encode_png(img, filter_type=filter_type)
    out = codecs.decode_png(data)
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, img)


def _adam7_png(img: np.ndarray, pass_filter: int = 0) -> bytes:
    """Hand-build an Adam7-interlaced PNG (the spec's §8.2 pass grid),
    forward-filtering each pass independently — fixture for decode."""
    import struct, zlib
    a = img if img.ndim == 3 else img[:, :, None]
    h, w, nb = a.shape
    bitdepth = 16 if a.dtype == np.uint16 else 8
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[nb]
    stream = bytearray()
    for x0, y0, dx, dy in codecs._ADAM7:
        sub = a[y0::dy, x0::dx, :]
        ph, pw = sub.shape[:2]
        if ph == 0 or pw == 0:
            continue
        if bitdepth == 16:
            rows = np.frombuffer(sub.astype(">u2").tobytes(),
                                 np.uint8).reshape(ph, pw * nb * 2)
        else:
            rows = np.ascontiguousarray(sub).reshape(ph, pw * nb)
        if pass_filter == 2:
            enc = np.empty_like(rows)
            enc[0] = rows[0]
            enc[1:] = rows[1:] - rows[:-1]
            stream += np.concatenate(
                [np.full((ph, 1), 2, np.uint8), enc], axis=1).tobytes()
        else:
            stream += np.concatenate(
                [np.zeros((ph, 1), np.uint8), rows], axis=1).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, bitdepth, color_type, 0, 0, 1)
    return (b"\x89PNG\r\n\x1a\n" + codecs._chunk(b"IHDR", ihdr)
            + codecs._chunk(b"IDAT", zlib.compress(bytes(stream)))
            + codecs._chunk(b"IEND", b""))


@pytest.mark.parametrize("shape,dtype", [
    ((16, 16), np.uint8), ((13, 7, 3), np.uint8), ((9, 10), np.uint16),
    ((3, 3, 4), np.uint8), ((1, 1), np.uint8), ((2, 9, 2), np.uint16),
])
@pytest.mark.parametrize("pass_filter", [0, 2])
def test_png_adam7_decode(shape, dtype, pass_filter):
    rng = np.random.default_rng(int(np.prod(shape)))
    hi = 65536 if dtype == np.uint16 else 256
    img = rng.integers(0, hi, size=shape, dtype=dtype)
    np.testing.assert_array_equal(
        codecs.decode_png(_adam7_png(img, pass_filter)), img)


def test_raw_roundtrip():
    img = np.random.default_rng(0).integers(0, 256, size=(11, 13, 3), dtype=np.uint8)
    np.testing.assert_array_equal(codecs.decode_raw(codecs.encode_raw(img)), img)


@pytest.mark.parametrize("fmt", ["jpeg", "webp"])
def test_lossy_psnr_pin(fmt):
    """BASELINE.md re-encode pin: jpeg (real T.81, genuinely lossy) stays
    >= 40 dB; webp (real VP8L) is LOSSLESS by construction."""
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    out = codecs.decode(codecs.encode(img, fmt), fmt)
    assert out.shape == img.shape
    if fmt == "jpeg":
        assert not np.array_equal(out, img)  # genuinely lossy
        assert psnr(img, out) >= 40.0
    else:
        assert np.array_equal(out, img)      # VP8L is lossless
    # deterministic
    assert codecs.encode(img, fmt) == codecs.encode(img, fmt)


def test_dispatch_matches():
    img = np.zeros((4, 4), dtype=np.uint8)
    for fmt in ("raw", "png", "jpeg", "webp"):
        np.testing.assert_array_equal(
            codecs.decode(codecs.encode(img, fmt), fmt).shape, img.shape)


# ---------- real baseline JPEG (core/jpeg.py) ----------

def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 10 * np.log10(255 ** 2 / mse) if mse else np.inf


def _fixture_img(h, w, bands, seed=1):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    g = np.clip(((xx * 255 // max(w - 1, 1)) + (yy * 255 // max(h - 1, 1))) // 2
                + ((xx // 8 + yy // 8) % 2) * 40
                + rng.integers(0, 25, (h, w)), 0, 255).astype(np.uint8)
    if bands == 1:
        return g
    return np.stack([g, np.roll(g, w // 3, axis=1), 255 - g], axis=-1)


def test_jpeg_is_real_jfif():
    from gdal_ray.core.jpeg import encode_jpeg
    payload = encode_jpeg(_fixture_img(64, 64, 3), 90)
    assert payload[:2] == b"\xff\xd8"          # SOI
    assert payload[2:4] == b"\xff\xe0"         # APP0
    assert payload[6:11] == b"JFIF\x00"
    assert payload[-2:] == b"\xff\xd9"         # EOI
    assert b"\xff\xc0" in payload              # SOF0 baseline
    assert b"\xff\xc4" in payload              # DHT
    assert b"\xff\xdb" in payload              # DQT


def test_jpeg_roundtrip_psnr_pin():
    """The BASELINE lossy pin: PSNR >= 40 dB at catalog quality (98) on the
    adversarial gradient+checker+noise fixture pattern."""
    from gdal_ray.core.jpeg import decode_jpeg, encode_jpeg
    for bands in (1, 3):
        img = _fixture_img(120, 200, bands)
        dec = decode_jpeg(encode_jpeg(img, 98))
        assert dec.shape == img.shape
        assert _psnr(img, dec) >= 40.0, (bands, _psnr(img, dec))


def test_jpeg_odd_and_tiny_sizes():
    from gdal_ray.core.jpeg import decode_jpeg, encode_jpeg
    for (h, w, b) in ((121, 203, 3), (8, 8, 1), (5, 7, 3), (16, 9, 1)):
        img = _fixture_img(h, w, b, seed=h * w)
        dec = decode_jpeg(encode_jpeg(img, 95))
        assert dec.shape == img.shape
        assert _psnr(img, dec) >= 30.0


def test_jpeg_420_subsampled_decode():
    """4:2:0 (luma 2x2) exercises the decoder's sampling-factor path."""
    from gdal_ray.core.jpeg import decode_jpeg, encode_jpeg
    img = _fixture_img(121, 203, 3)
    payload = encode_jpeg(img, 98, subsample=True)
    dec = decode_jpeg(payload)
    assert dec.shape == img.shape
    assert _psnr(img, dec) >= 28.0
    # smaller than 4:4:4 at the same quality
    assert len(payload) < len(encode_jpeg(img, 98))


def test_jpeg_codec_dispatch_and_legacy_stub():
    from gdal_ray.core import codecs
    img = _fixture_img(40, 40, 3)
    payload = codecs.encode(img, "jpeg")
    assert payload[:2] == b"\xff\xd8"          # dispatch produces real JFIF
    dec = codecs.decode(payload, "jpeg")
    assert _psnr(img, dec) >= 40.0
    legacy = codecs._lossy_encode(img, "jpeg")  # old GJPG payloads
    assert np.array_equal(codecs.decode(legacy, "jpeg"),
                          codecs._lossy_decode(legacy, "jpeg"))


def test_jpeg_catalog_fmt_path():
    """The catalog's fmt='jpeg' rows flow through the real codec."""
    from gdal_ray.core import codecs, fixtures
    t = fixtures.images_table(24)
    fmts = t.column("fmt").to_pylist()
    i = fmts.index("jpeg")
    data = t.column("bytes")[i].as_py()
    assert data[:2] == b"\xff\xd8"
    img = codecs.decode(data, "jpeg")
    assert img.shape[0] == t.column("h")[i].as_py()
    assert img.shape[1] == t.column("w")[i].as_py()


# ---------- real lossless WebP / VP8L (core/vp8l.py) ----------

def test_vp8l_riff_structure():
    import struct

    from gdal_ray.core.vp8l import encode_vp8l
    p = encode_vp8l(_fixture_img(32, 48, 3))
    assert p[:4] == b"RIFF" and p[8:12] == b"WEBP" and p[12:16] == b"VP8L"
    (riff_size,) = struct.unpack_from("<I", p, 4)
    assert riff_size == len(p) - 8
    assert p[20] == 0x2F                      # VP8L signature byte


def test_vp8l_lossless_roundtrip():
    from gdal_ray.core.vp8l import decode_vp8l, encode_vp8l
    for shape in ((64, 64), (33, 47), (5, 7), (1, 9), (120, 200)):
        for bands in (1, 3):
            img = _fixture_img(*shape, bands, seed=shape[0] * 7 + bands)
            dec = decode_vp8l(encode_vp8l(img))
            assert np.array_equal(dec, img), (shape, bands)


def test_vp8l_alpha_and_constant():
    from gdal_ray.core.vp8l import decode_vp8l, encode_vp8l
    rgb = _fixture_img(20, 30, 3)
    rgba = np.dstack([rgb, (rgb[:, :, 0] // 2 + 10).astype(np.uint8)])
    assert np.array_equal(decode_vp8l(encode_vp8l(rgba)), rgba)
    const = np.full((16, 16), 42, np.uint8)
    p = encode_vp8l(const)
    assert len(p) < 64                        # 1-symbol codes: ~0 bits/px
    assert np.array_equal(decode_vp8l(p), const)


def test_vp8l_lz77_decode_path():
    """The decoder's backreference path: hand-emit a stream with one
    literal pixel then a length-4 distance-1 copy (spec LZ77 semantics)."""
    from gdal_ray.core.vp8l import (_LsbWriter, _write_code, decode_vp8l)
    import struct
    bw = _LsbWriter()
    bw.write(0x2F, 8)
    bw.write(5 - 1, 14)
    bw.write(1 - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(0, 1)      # no transforms
    bw.write(0, 1)      # no cache
    bw.write(0, 1)      # no meta huffman
    # green code: two symbols {7, 259=256+3 → length prefix 3 (value 4)}
    glens = [0] * 280
    glens[7] = 1
    glens[259] = 1
    _write_code(bw, glens)
    for v in (30, 90, 255):                   # r, b, a single-symbol codes
        lens = [0] * 256
        lens[v] = 1
        _write_code(bw, lens)
    dlens = [0] * 40
    # distance prefix 1 → value 2 → neighbor-map[1] = (1, 0) → distance 1
    dlens[1] = 1
    _write_code(bw, dlens)
    # pixel 0: literal green=7 (code '0'), r/b/a zero-bit singles
    bw.write(0, 1)
    # then symbol 259 (code '1'): prefix 3 → length 4, dist code single → 1
    bw.write(1, 1)
    payload = bw.flush()
    data = (b"RIFF" + struct.pack("<I", 4 + 8 + len(payload)) + b"WEBP"
            + b"VP8L" + struct.pack("<I", len(payload)) + payload)
    out = decode_vp8l(data)
    assert out.shape == (1, 5, 3)
    assert (out[0, :, 0] == 30).all()         # red
    assert (out[0, :, 1] == 7).all()          # green copied by the backref
    assert (out[0, :, 2] == 90).all()


def test_webp_codec_dispatch_and_legacy_stub():
    from gdal_ray.core import codecs
    img = _fixture_img(40, 40, 3)
    payload = codecs.encode(img, "webp")
    assert payload[:4] == b"RIFF"             # real WebP container
    assert np.array_equal(codecs.decode(payload, "webp"), img)  # lossless
    legacy = codecs._lossy_encode(img, "webp")
    assert np.array_equal(codecs.decode(legacy, "webp"),
                          codecs._lossy_decode(legacy, "webp"))


def test_webp_catalog_fmt_path():
    from gdal_ray.core import codecs, fixtures
    t = fixtures.images_table(24)
    fmts = t.column("fmt").to_pylist()
    i = fmts.index("webp")
    data = t.column("bytes")[i].as_py()
    assert data[:4] == b"RIFF"
    img = codecs.decode(data, "webp")
    assert img.shape[0] == t.column("h")[i].as_py()
    assert img.shape[1] == t.column("w")[i].as_py()


# ---------- VP8L foreign-stream decode completeness (round 4) ----------
# Hand-built spec-conformant streams exercising the transforms / color
# cache / meta-huffman paths our own encoder never emits.

def _vp8l_header(bw, w, h):
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)


def _package(bw):
    import struct
    payload = bw.flush()
    if len(payload) % 2:
        payload += b"\x00"
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _avg2(a, b):
    return (a + b) >> 1


def _predict(out, y, x, w, mode):
    """Forward predictor (mirrors spec inverse; neighbors = original px)."""
    black = np.array([0, 0, 0, 255], np.int32)
    if y == 0 and x == 0:
        return black
    if y == 0:
        return out[0, x - 1]
    if x == 0:
        return out[y - 1, 0]
    L = out[y, x - 1].astype(np.int32)
    T = out[y - 1, x].astype(np.int32)
    TL = out[y - 1, x - 1].astype(np.int32)
    TR = (out[y, 0] if x == w - 1 else out[y - 1, x + 1]).astype(np.int32)
    if mode == 0:
        return black
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:
        est = L + T - TL
        return L if np.abs(est - L).sum() < np.abs(est - T).sum() else T
    if mode == 12:
        return np.clip(L + T - TL, 0, 255)
    if mode == 13:
        a = _avg2(L, T)
        d = a - TL
        return np.clip(a + np.sign(d) * (np.abs(d) >> 1), 0, 255)
    raise AssertionError(mode)


def test_vp8l_predictor_transform_decode():
    from gdal_ray.core import vp8l as V
    rng = np.random.default_rng(11)
    w, h, bits = 16, 13, 2
    img = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    img[:, :, 3] = rng.integers(200, 256, (h, w), dtype=np.uint8)
    tw, th = (w + 3) // 4, (h + 3) // 4
    modes = (np.arange(tw * th, dtype=np.uint8) % 14).reshape(th, tw)
    res = np.empty_like(img)
    for y in range(h):
        for x in range(w):
            p = _predict(img, y, x, w, int(modes[y >> bits, x >> bits]))
            res[y, x] = (img[y, x].astype(np.int32) - p) & 0xFF
    bw = V._LsbWriter()
    _vp8l_header(bw, w, h)
    bw.write(1, 1); bw.write(0, 2)           # PREDICTOR transform
    bw.write(bits - 2, 3)
    z = np.zeros_like(modes)
    a255 = np.full_like(modes, 255)
    V._write_literal_stream(bw, z, modes, z, a255)   # predictor image
    bw.write(0, 1)                           # no more transforms
    V._write_literal_stream(bw, res[:, :, 0], res[:, :, 1],
                            res[:, :, 2], res[:, :, 3], level0=True)
    out = V.decode_vp8l(_package(bw))
    assert np.array_equal(out, img)


def test_vp8l_color_transform_decode():
    from gdal_ray.core import vp8l as V
    rng = np.random.default_rng(12)
    w, h, bits = 12, 9, 2
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    tw, th = (w + 3) // 4, (h + 3) // 4
    g2r = rng.integers(0, 256, (th, tw), dtype=np.uint8)
    g2b = rng.integers(0, 256, (th, tw), dtype=np.uint8)
    r2b = rng.integers(0, 256, (th, tw), dtype=np.uint8)

    def delta(t, c):
        return (int(np.int8(t)) * int(np.int8(c))) >> 5

    res = img.copy()
    for y in range(h):
        for x in range(w):
            ty, tx = y >> bits, x >> bits
            r, g, b = (int(v) for v in img[y, x])
            rr = (r - delta(g2r[ty, tx], g)) & 0xFF
            bb = (b - delta(g2b[ty, tx], g) - delta(r2b[ty, tx], r)) & 0xFF
            res[y, x] = (rr, g, bb)
    bw = V._LsbWriter()
    _vp8l_header(bw, w, h)
    bw.write(1, 1); bw.write(1, 2)           # cross-color transform
    bw.write(bits - 2, 3)
    a255 = np.full_like(g2r, 255)
    # element packing: red ch = r2b, green = g2b, blue = g2r
    V._write_literal_stream(bw, r2b, g2b, g2r, a255)
    bw.write(0, 1)
    a_img = np.full((h, w), 255, np.uint8)
    V._write_literal_stream(bw, res[:, :, 0], res[:, :, 1], res[:, :, 2], a_img, level0=True)
    out = V.decode_vp8l(_package(bw))
    assert np.array_equal(out, img)


def test_vp8l_palette_decode():
    from gdal_ray.core import vp8l as V
    rng = np.random.default_rng(13)
    w, h = 23, 7
    psize = 13                                # -> wbits=1, 2 px/byte
    pal = rng.integers(0, 256, (psize, 4), dtype=np.uint8)
    pal[:, 3] = 255
    idx = rng.integers(0, psize, (h, w), dtype=np.uint8)
    packed_w = (w + 1) // 2
    packed = np.zeros((h, packed_w), np.uint8)
    for y in range(h):
        for x in range(w):
            packed[y, x >> 1] |= idx[y, x] << ((x & 1) * 4)
    deltas = np.diff(np.vstack([np.zeros((1, 4), np.int32),
                                pal.astype(np.int32)]), axis=0).astype(np.uint8)
    bw = V._LsbWriter()
    _vp8l_header(bw, w, h)
    bw.write(1, 1); bw.write(3, 2)           # COLOR_INDEXING
    bw.write(psize - 1, 8)
    V._write_literal_stream(bw, deltas[None, :, 0], deltas[None, :, 1],
                            deltas[None, :, 2], deltas[None, :, 3])
    bw.write(0, 1)
    z = np.zeros_like(packed)
    a255 = np.full_like(packed, 255)
    V._write_literal_stream(bw, z, packed, z, a255, level0=True)
    out = V.decode_vp8l(_package(bw))
    expect = pal[idx][:, :, :3] if (pal[:, 3] == 255).all() else pal[idx]
    got = out if out.ndim == 3 else np.stack([out] * 3, axis=-1)
    assert np.array_equal(got, expect)


def test_vp8l_color_cache_decode():
    from gdal_ray.core import vp8l as V
    cb = 4
    # pixels: A, B, A(cache hit), B(cache hit), A
    A = (250, 10, 99, 255)                   # (r, g, b, a)
    B = (1, 200, 42, 255)

    def hash_(p):
        argb = (p[3] << 24) | (p[0] << 16) | (p[1] << 8) | p[2]
        return (0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - cb)

    assert hash_(A) != hash_(B)
    seq = ["litA", "litB", 280 + hash_(A), 280 + hash_(B), "litA"]
    w, h = 5, 1
    bw = V._LsbWriter()
    _vp8l_header(bw, w, h)
    bw.write(0, 1)                           # no transforms
    bw.write(1, 1); bw.write(cb, 4)          # color cache
    bw.write(0, 1)                           # no meta
    gsize = 280 + (1 << cb)
    gfreq = np.zeros(gsize, np.int64)
    gfreq[A[1]] += 2; gfreq[B[1]] += 1
    gfreq[280 + hash_(A)] += 1; gfreq[280 + hash_(B)] += 1
    glens = V._huff_lengths(gfreq)
    rfreq = np.zeros(256, np.int64); rfreq[A[0]] += 2; rfreq[B[0]] += 1
    bfreq = np.zeros(256, np.int64); bfreq[A[2]] += 2; bfreq[B[2]] += 1
    afreq = np.zeros(256, np.int64); afreq[255] = 1
    dfreq = np.zeros(40, np.int64); dfreq[0] = 1
    treecodes = []
    for fr in (gfreq, rfreq, bfreq, afreq, dfreq):
        lens = V._huff_lengths(fr)
        V._write_code(bw, lens)
        nz = [s for s, l in enumerate(lens) if l]
        # spec: a 1-symbol prefix code consumes ZERO bits per read
        treecodes.append({} if len(nz) == 1 else V._canonical_codes(lens))
    gcode, rcode, bcode, acode, _ = treecodes

    def emit(codes, s):
        if s in codes:
            c, l = codes[s]
            bw.write_code(c, l)

    for item in seq:
        if item == "litA" or item == "litB":
            p = A if item == "litA" else B
            emit(gcode, p[1]); emit(rcode, p[0]); emit(bcode, p[2])
            emit(acode, p[3])
        else:
            emit(gcode, item)
    out = V.decode_vp8l(_package(bw))
    expect = np.array([[A[:3], B[:3], A[:3], B[:3], A[:3]]], np.uint8)
    assert np.array_equal(out, expect)


def test_vp8l_meta_huffman_decode():
    from gdal_ray.core import vp8l as V
    w, h, gbits = 8, 4, 2
    img = np.zeros((h, w, 4), np.uint8)
    img[:, :4] = (200, 30, 40, 255)          # group 0 region
    img[:, 4:] = (7, 77, 177, 255)           # group 1 region
    bw = V._LsbWriter()
    _vp8l_header(bw, w, h)
    bw.write(0, 1)                           # no transforms
    bw.write(0, 1)                           # no cache
    bw.write(1, 1)                           # meta huffman present
    bw.write(gbits - 2, 3)
    ew, eh = (w + 3) // 4, (h + 3) // 4      # 2 x 1 entropy image
    g_ent = np.array([[0, 1]], np.uint8)
    z = np.zeros_like(g_ent)
    a255 = np.full_like(g_ent, 255)
    V._write_literal_stream(bw, z, g_ent, z, a255)
    # two groups, each with single-symbol trees for its constant pixel
    for px in ((200, 30, 40, 255), (7, 77, 177, 255)):
        for size, sym in ((280, px[1]), (256, px[0]), (256, px[2]),
                          (256, px[3]), (40, 0)):
            fr = np.zeros(size, np.int64)
            fr[sym] = 1
            V._write_code(bw, V._huff_lengths(fr))
    # single-symbol codes read zero bits -> no pixel payload at all
    out = V.decode_vp8l(_package(bw))
    assert np.array_equal(out, img[:, :, :3])


def test_vp8l_combined_subgreen_predictor():
    from gdal_ray.core import vp8l as V
    rng = np.random.default_rng(14)
    w, h, bits = 8, 8, 3                     # one tile, mode 7 everywhere
    img = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    img[:, :, 3] = 255
    # forward: subtract-green first, then predictor (stream order)
    sg = img.copy()
    sg[:, :, 0] = (img[:, :, 0].astype(np.int16) - img[:, :, 1]) & 0xFF
    sg[:, :, 2] = (img[:, :, 2].astype(np.int16) - img[:, :, 1]) & 0xFF
    res = np.empty_like(sg)
    for y in range(h):
        for x in range(w):
            p = _predict(sg, y, x, w, 7)
            res[y, x] = (sg[y, x].astype(np.int32) - p) & 0xFF
    bw = V._LsbWriter()
    _vp8l_header(bw, w, h)
    bw.write(1, 1); bw.write(2, 2)           # SUBTRACT_GREEN
    bw.write(1, 1); bw.write(0, 2)           # PREDICTOR
    bw.write(bits - 2, 3)
    m7 = np.full((1, 1), 7, np.uint8)
    z1 = np.zeros((1, 1), np.uint8)
    V._write_literal_stream(bw, z1, m7, z1, np.full((1, 1), 255, np.uint8))
    bw.write(0, 1)
    V._write_literal_stream(bw, res[:, :, 0], res[:, :, 1],
                            res[:, :, 2], res[:, :, 3], level0=True)
    out = V.decode_vp8l(_package(bw))
    assert np.array_equal(out, img[:, :, :3])


# ---------- progressive JPEG (round 4) ----------

def test_progressive_jpeg_equals_baseline():
    """Progressive stream carries the SAME quantized coefficients as the
    baseline encoder → decode output must be bit-identical."""
    from gdal_ray.core import jpeg as J
    rng = np.random.default_rng(3)
    for shape in [(16, 16), (24, 33), (40, 56, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        base = J.decode_jpeg(J.encode_jpeg(img, quality=85))
        prog_bytes = J.encode_jpeg_progressive(img, quality=85)
        assert prog_bytes[2:4] != b"\xff\xc0" and b"\xff\xc2" in prog_bytes
        assert np.array_equal(J.decode_jpeg(prog_bytes), base)


def test_progressive_jpeg_psnr_and_smooth():
    from gdal_ray.core import jpeg as J
    x = np.linspace(0, 4 * np.pi, 96)
    img = ((np.sin(x)[None, :] * np.cos(x)[:, None]) * 100 + 128).astype(np.uint8)
    out = J.decode_jpeg(J.encode_jpeg_progressive(img, quality=92))
    mse = np.mean((out.astype(np.float64) - img) ** 2)
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
    assert psnr >= 40
    # rgb smooth gradient
    g = np.linspace(0, 255, 48).astype(np.uint8)
    rgb = np.stack([np.tile(g, (32, 1))] * 3, axis=-1)
    out2 = J.decode_jpeg(J.encode_jpeg_progressive(rgb, quality=92))
    assert out2.shape == rgb.shape
    assert np.mean(np.abs(out2.astype(float) - rgb)) < 4


# ---------- lossy VP8-toolset intra codec (core/vp8i.py, round 4) ----------

def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))


def test_vp8i_bool_coder_roundtrip():
    """RFC 6386 §7 boolean coder: encode→decode identity over random
    (bit, prob) sequences, including extreme probabilities."""
    from gdal_ray.core.vp8i import BoolDecoder, BoolEncoder
    rng = np.random.default_rng(11)
    bits = rng.integers(0, 2, 4000).tolist()
    probs = rng.integers(1, 255, 4000).tolist()
    probs[:20] = [1, 254] * 10
    be = BoolEncoder()
    for b, p in zip(bits, probs):
        be.put(b, p)
    bd = BoolDecoder(be.flush())
    assert [bd.get(p) for p in probs] == bits


def test_vp8i_gray_psnr_and_rate():
    """Quality knob is monotone in both size and PSNR; catalog quality
    (90+) clears the 40 dB bar on luma content."""
    from gdal_ray.core.vp8i import decode_vp8i, encode_vp8i
    rng = np.random.default_rng(1)
    img = np.clip(rng.integers(0, 25, (64, 64))
                  + np.add.outer(np.arange(64), np.arange(64)),
                  0, 255).astype(np.uint8)
    prev_size, prev_psnr = 0, 0.0
    for q in (50, 90, 98):
        enc = encode_vp8i(img, quality=q)
        dec = decode_vp8i(enc)
        assert dec.shape == img.shape and dec.dtype == np.uint8
        p = _psnr(dec, img)
        assert len(enc) > prev_size and p > prev_psnr
        prev_size, prev_psnr = len(enc), p
    assert prev_psnr >= 40.0


def test_vp8i_prediction_modes_exact():
    """V/H prediction reproduces axis-constant images exactly; TM handles
    ramps; DC handles flats (→ all-skip MBs, tiny payload)."""
    from gdal_ray.core.vp8i import decode_vp8i, encode_vp8i
    stripes = np.tile((np.arange(64) % 16 * 16).astype(np.uint8), (64, 1))
    for im in (stripes, stripes.T.copy()):
        assert np.array_equal(decode_vp8i(encode_vp8i(im, 90)), im)
    flat = np.full((48, 48), 77, np.uint8)
    enc = encode_vp8i(flat, 90)
    assert np.array_equal(decode_vp8i(enc), flat)
    assert len(enc) < 600
    ramp = np.add.outer(np.arange(64) * 2, np.arange(64) * 2) \
        .astype(np.uint8)
    assert _psnr(decode_vp8i(encode_vp8i(ramp, 90)), ramp) >= 40


def test_vp8i_color_and_odd_sizes():
    """4:2:0 color roundtrip on odd dimensions; luma PSNR ≥ 40 at catalog
    quality (full-RGB PSNR is chroma-subsampling-bound by design)."""
    from gdal_ray.core.vp8i import decode_vp8i, encode_vp8i
    rng = np.random.default_rng(5)
    base = np.clip(rng.integers(0, 25, (37, 53))
                   + np.add.outer(np.arange(37), np.arange(53)),
                   0, 255).astype(np.uint8)
    img = np.stack([base, np.roll(base, 5, axis=1), 255 - base], axis=-1)
    dec = decode_vp8i(encode_vp8i(img, quality=95))
    assert dec.shape == img.shape
    luma = lambda a: (0.299 * a[:, :, 0] + 0.587 * a[:, :, 1]
                      + 0.114 * a[:, :, 2])
    assert _psnr(luma(dec), luma(img)) >= 40


def test_vp8i_container_and_dispatch():
    """RIFF/WEBP container with the private VP8i fourcc; codecs.decode
    routes by fourcc and refuses foreign interchange VP8 with a clear
    capability error (see core/vp8i.py docstring for why)."""
    import struct

    from gdal_ray.core import codecs
    img = np.clip(np.add.outer(np.arange(32), np.arange(48)), 0,
                  255).astype(np.uint8)
    enc = codecs.encode(img, "webp_lossy")
    assert enc[:4] == b"RIFF" and enc[8:12] == b"WEBP"
    assert enc[12:16] == b"VP8i"
    assert np.array_equal(codecs.decode(enc, "webp"),
                          codecs.decode(enc, "webp_lossy"))
    fake = b"RIFF" + struct.pack("<I", 12) + b"WEBP" + b"VP8 " \
        + struct.pack("<I", 0)
    with pytest.raises(NotImplementedError):
        codecs.decode(fake, "webp")


def test_vp8i_mb_constant_exact_class():
    """The oracle-pinned exact-representability class: ANY gray image that
    is constant per 16×16 macroblock decodes bit-exactly at quality 100
    (constant residual → DC-only DCT; q_dc = 4 divides the DC gain; Y2
    WHT path is exact integer arithmetic).  Backs the raster_webp_lossy
    driver query."""
    from gdal_ray.core.vp8i import decode_vp8i, encode_vp8i
    for n in range(0, 60, 7):
        img = np.zeros((32, 48), np.uint8)
        for i in range(2):
            for j in range(3):
                img[i * 16:(i + 1) * 16, j * 16:(j + 1) * 16] = \
                    (n * 31 + i * 7 + j * 13) % 256
        assert np.array_equal(decode_vp8i(encode_vp8i(img, quality=100)),
                              img)


def test_vp8l_encoder_predictor_transform():
    """Encoder-side spatial-prediction transform (opt-in): per-tile mode
    selection among the L-independent predictors, lossless roundtrip
    through the decoder's transform path, and a real compression win on
    smooth content."""
    from gdal_ray.core.vp8l import decode_vp8l, encode_vp8l
    rng = np.random.default_rng(3)
    grad = np.clip(np.add.outer(np.arange(100), np.arange(130)), 0,
                   255).astype(np.uint8)
    cases = [grad,
             np.stack([grad, (grad * 0.7).astype(np.uint8), 255 - grad],
                      axis=-1),
             rng.integers(0, 256, (33, 47, 4)).astype(np.uint8),
             rng.integers(0, 256, (3, 5)).astype(np.uint8),
             np.array([[7]], np.uint8),
             rng.integers(0, 256, (16, 16)).astype(np.uint8),  # one tile
             rng.integers(0, 256, (17, 33)).astype(np.uint8)]  # ragged
    for im in cases:
        enc = encode_vp8l(im, predictor=True)
        assert np.array_equal(decode_vp8l(enc), im)
    # predictor still beats plain, but the margin shrank when general
    # LZ77 matching landed (plain now captures the gradient's row-shift
    # periodicity as distance w±1 backrefs)
    plain = len(encode_vp8l(grad))
    assert len(encode_vp8l(grad, predictor=True)) < plain
    assert plain < 600          # general-LZ77 pin: was 1571B literal-only


def test_vectorized_bit_packers_match_scalar_writers():
    """jpeg._pack_entropy and vp8l._LsbWriter.write_many must be
    bit-identical to the scalar writers — including word-aligned totals
    (the reduceat boundary-clamp bug class) and pending-bit prefixes."""
    from gdal_ray.core.jpeg import _BitWriter, _pack_entropy
    from gdal_ray.core.vp8l import _LsbWriter
    rng = np.random.default_rng(0)
    for trial in range(60):
        n = int(rng.integers(1, 60))
        lens = rng.integers(0, 17, n)
        codes = [int(rng.integers(0, 1 << max(l, 1))) for l in lens]
        w1 = _BitWriter()
        for c, l in zip(codes, lens):
            if l:
                w1.put(c, int(l))
        w1.flush()
        assert bytes(w1.out) == _pack_entropy(codes, lens.tolist())
        w1 = _LsbWriter()
        w2 = _LsbWriter()
        pre = int(rng.integers(0, 8))
        if pre:
            v = int(rng.integers(0, 1 << pre))
            w1.write(v, pre)
            w2.write(v, pre)
        for c, l in zip(codes, lens):
            w1.write(int(c), int(l))
        w2.write_many(np.asarray(codes, np.uint64), lens)
        assert w1.flush() == w2.flush()
    # exact multiple-of-64-bit totals
    lens64 = np.full(16, 8)
    codes64 = rng.integers(0, 256, 16).astype(np.uint64)
    w1 = _LsbWriter()
    for c in codes64:
        w1.write(int(c), 8)
    w2 = _LsbWriter()
    w2.write_many(codes64, lens64)
    assert w1.flush() == w2.flush()


def test_decoder_fuzz_no_hangs():
    """Truncated / bit-flipped streams must either decode to garbage or
    raise a clean error — never hang or die with an unexpected exception
    class (positional decoders bound every walk by entry/array length)."""
    import struct as _struct
    import zlib as _zlib

    from gdal_ray.core import codecs, fixtures, vp8i
    allowed = (ValueError, AssertionError, NotImplementedError, IndexError,
               KeyError, _struct.error, OverflowError, _zlib.error)
    rng = np.random.default_rng(9)
    src = fixtures.image_pixels(7, 64, 64, 3)
    for fmt in ("png", "jpeg", "webp", "tif"):
        enc = codecs.encode(src, fmt)
        for trial in range(12):
            if trial % 2 == 0:
                data = enc[:int(rng.integers(20, len(enc)))]
            else:
                d = bytearray(enc)
                for _ in range(3):
                    d[int(rng.integers(20, len(enc)))] = \
                        int(rng.integers(0, 256))
                data = bytes(d)
            try:
                codecs.decode(data, fmt)
            except allowed:
                pass
    enc = vp8i.encode_vp8i(src[:, :, 0], 90)
    for _ in range(8):
        d = bytearray(enc)
        for _ in range(3):
            d[int(rng.integers(10, len(enc)))] = int(rng.integers(0, 256))
        try:
            vp8i.decode_vp8i(bytes(d))
        except allowed:
            pass


def test_vp8l_palette_encode():
    """COLOR_INDEXING encode: lossless through the decoder's palette
    inverse at every bundling width, auto-fires only for genuinely
    multi-channel low-color images (~3× smaller), and leaves gray /
    continuous-tone streams byte-identical to the non-palette path."""
    from gdal_ray.core.vp8l import decode_vp8l, encode_vp8l
    rng = np.random.default_rng(2)
    vals = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    im = vals[rng.integers(0, 16, (128, 128))]
    e_auto = encode_vp8l(im)
    assert np.array_equal(decode_vp8l(e_auto), im)
    assert len(e_auto) < len(encode_vp8l(im, palette=False)) // 2
    for ncol, w in ((2, 17), (4, 33), (16, 63), (200, 31)):
        img = (rng.integers(0, ncol, (21, w))
               * (255 // max(ncol - 1, 1))).astype(np.uint8)
        enc = encode_vp8l(img, palette=True)
        assert np.array_equal(decode_vp8l(enc), img)
    rgba = np.zeros((33, 47, 4), np.uint8)
    rgba[..., 0] = rng.integers(0, 2, (33, 47)) * 200
    rgba[..., 3] = np.where(rgba[..., 0] > 0, 255, 0)
    rgba[..., 1] = 100
    assert np.array_equal(decode_vp8l(encode_vp8l(rgba)), rgba)
    gray = (rng.integers(0, 16, (64, 64)) * 17).astype(np.uint8)
    assert encode_vp8l(gray) == encode_vp8l(gray, palette=False)
    from gdal_ray.core import fixtures
    fx = fixtures.image_pixels(4, 64, 64, 3)
    assert encode_vp8l(fx) == encode_vp8l(fx, palette=False)


def test_vp8l_color_transform_encode():
    """Cross-color encode (opt-in): per-tile 2-var LSQ fit on int8 deltas,
    lossless through the decoder's inverse, and combined with the
    predictor it captures inter-channel residual correlation (fixture RGB
    shrinks to ~56% of plain)."""
    from gdal_ray.core import fixtures
    from gdal_ray.core.vp8l import decode_vp8l, encode_vp8l
    rng = np.random.default_rng(3)
    for shape in ((33, 47, 4), (5, 7, 3), (1, 9, 3), (64, 64)):
        im = rng.integers(0, 256, shape, dtype=np.uint8)
        assert np.array_equal(decode_vp8l(encode_vp8l(im, color=True)), im)
    fx = fixtures.image_pixels(4, 128, 128, 3)
    e2 = encode_vp8l(fx, predictor=True, color=True)
    assert np.array_equal(decode_vp8l(e2), fx)
    assert len(e2) < len(encode_vp8l(fx)) * 0.75


def test_jpeg_420_dispatch_fmt():
    """fmt='jpeg_420' encodes 4:2:0 through the dispatch (smaller than
    4:4:4 at the same quality) and decodes via the plain jpeg path."""
    from gdal_ray.core import codecs
    img = _fixture_img(64, 96, 3)
    e420 = codecs.encode(img, "jpeg_420")
    e444 = codecs.encode(img, "jpeg")
    assert len(e420) < len(e444)
    out = codecs.decode(e420, "jpeg_420")
    assert out.shape == img.shape
    assert np.array_equal(out, codecs.decode(e420, "jpeg"))
    # translate flows the new fmt through out_fmt
    import pyarrow as pa

    from gdal_ray.stages.raster import translate
    t = pa.table({"image_id": ["a"], "bytes": [e444],
                  "w": [96], "h": [64], "fmt": ["jpeg"]})
    out_t = translate(t, out_fmt="jpeg_420")
    assert codecs.decode(out_t["bytes"][0].as_py(), "jpeg_420").shape \
        == img.shape


def test_vp8l_rle_backreferences():
    """Distance-1 LZ77 run encoding (on by default for main streams):
    identical-pixel runs become backreferences through the decoder's LZ77
    path — flat images collapse to tens of bytes, the 4096 length cap
    splits long runs, and no-run images stay byte-identical to the
    literal-only stream."""
    from gdal_ray.core import fixtures
    from gdal_ray.core.vp8l import (_rle_runs, decode_vp8l, encode_vp8l)
    flat = np.zeros((100, 130), np.uint8)
    flat[:50] = 200
    flat[60:70, 20:90] = 55
    e = encode_vp8l(flat, palette=False)
    assert np.array_equal(decode_vp8l(e), flat)
    assert len(e) < 200
    big = np.full((80, 80), 9, np.uint8)          # 6400-px run > 4096 cap
    eb = encode_vp8l(big, palette=False)
    assert np.array_equal(decode_vp8l(eb), big)
    assert len(eb) < 100
    s1, l1, sw, lw, covered = _rle_runs(
        big, big, big, np.full_like(big, 255))
    assert l1.max() <= 4096 and int(l1.sum()) == covered.sum() == 6399
    rgba = np.full((33, 47, 4), 128, np.uint8)
    rgba[5] = (1, 2, 3, 4)
    assert np.array_equal(decode_vp8l(encode_vp8l(rgba, palette=False)),
                          rgba)
    # predictor residual runs compound with the transform
    grad = np.clip(np.add.outer(np.arange(64), np.arange(96)), 0,
                   255).astype(np.uint8)
    ep = encode_vp8l(grad, predictor=True)
    assert np.array_equal(decode_vp8l(ep), grad)
    assert len(ep) < 400
    # no runs → byte-identical to the literal-only form (freqs unchanged)
    noisy = fixtures.image_pixels(4, 48, 48, 3)
    s1n, _, swn, _, cov = _rle_runs(
        noisy[:, :, 0], noisy[:, :, 1], noisy[:, :, 2],
        np.full((48, 48), 255, np.uint8))
    assert s1n.size == 0 and swn.size == 0 and not cov.any()
    assert np.array_equal(decode_vp8l(encode_vp8l(noisy)), noisy)
    # distance-w (row-above) runs: vertically-striped content
    stripes = np.tile((np.arange(64) % 16 * 16).astype(np.uint8), (64, 1))
    es = encode_vp8l(stripes, palette=False)
    assert np.array_equal(decode_vp8l(es), stripes)
    assert len(es) < 250


def test_encode_profile_bandwidth_shrinks_bytes():
    """profile='bandwidth' must produce smaller payloads than 'cpu' on
    smooth imagery (the cluster bytes-vs-CPU trade, selectable per sink)
    and stay losslessly decodable for lossless formats."""
    yy, xx = np.mgrid[0:96, 0:96]
    img = np.stack([(yy + xx) % 256, (yy * 2) % 256, (xx * 2) % 256],
                   axis=2).astype(np.uint8)
    for fmt in ("webp", "png"):
        b_cpu = codecs.encode(img, fmt, profile="cpu")
        b_bw = codecs.encode(img, fmt, profile="bandwidth")
        assert len(b_bw) < len(b_cpu), (fmt, len(b_bw), len(b_cpu))
        np.testing.assert_array_equal(codecs.decode(b_bw, fmt), img)
        np.testing.assert_array_equal(codecs.decode(b_cpu, fmt), img)
    j_cpu = codecs.encode(img, "jpeg", profile="cpu")
    j_bw = codecs.encode(img, "jpeg", profile="bandwidth")   # 4:2:0
    assert len(j_bw) < len(j_cpu)
    assert psnr(codecs.decode(j_bw, "jpeg").astype(float), img.astype(float)) > 30
    with pytest.raises(ValueError):
        codecs.encode(img, "png", profile="extreme")


def test_png_adaptive_and_best_filters():
    """Per-row adaptive filtering (spec MSAD best-of-5) and the
    bandwidth-profile 'best' mode (pick by ACTUAL compressed size across
    None/Up/adaptive — MSAD alone loses to plain filters on low-entropy
    or row-repetitive content).  All modes bit-exact through decode;
    'best' is never larger than any single strategy."""
    from gdal_ray.core.codecs import decode_png, encode_png
    rng = np.random.default_rng(5)
    cases = [
        np.linspace(0, 255, 128 * 128).reshape(128, 128).astype(np.uint8),
        np.stack([np.linspace(0, 255, 96 * 96).reshape(96, 96),
                  np.linspace(255, 0, 96 * 96).reshape(96, 96),
                  np.tile(np.linspace(0, 255, 96), (96, 1))],
                 axis=2).astype(np.uint8),
        rng.integers(0, 256, (64, 64, 4), dtype=np.uint8),
        (np.linspace(0, 60000, 64 * 64).reshape(64, 64)
         + rng.integers(0, 9, (64, 64))).astype(np.uint16),   # 16-bit DEM
        rng.integers(0, 3, (33, 47, 2)).astype(np.uint8) * 120,
        np.array([[7]], np.uint8),
    ]
    for im in cases:
        sizes = {}
        for ft in (0, 2, "adaptive", "best"):
            e = encode_png(im, filter_type=ft)
            np.testing.assert_array_equal(decode_png(e), im)
            sizes[ft] = len(e)
        assert sizes["best"] <= min(sizes[0], sizes[2], sizes["adaptive"])


def test_vp8l_general_lz77_matches():
    """General (any-distance) LZ77: repeated tiles and off-w periodic rows
    collapse to backreferences the d=1/d=w passes cannot reach; noise
    stays match-free and bit-exact."""
    from gdal_ray.core.vp8l import decode_vp8l, encode_vp8l
    rng = np.random.default_rng(11)
    tile = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    img = np.tile(tile, (16, 16, 1))          # 256² of repeated 16×16 tiles
    enc = encode_vp8l(img)
    assert np.array_equal(decode_vp8l(enc)[:, :, :3], img)
    assert len(enc) < 5000                    # literal-only was ~190 KB
    row = rng.integers(0, 255, (1, 17, 3), dtype=np.uint8)
    img2 = np.tile(row, (64, 16, 1))[:, :256, :]   # period 17 ≠ 1, ≠ w
    enc2 = encode_vp8l(img2)
    assert np.array_equal(decode_vp8l(enc2)[:, :, :3], img2)
    assert len(enc2) < 1000
    noise = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    assert np.array_equal(decode_vp8l(encode_vp8l(noise))[:, :, :3], noise)


def test_vp8l_cost_based_backref_decision():
    """Two-pass exact-cost backref pruning: on low-bits-per-literal
    residual streams (dithered gradient under the predictor) short runs
    cost more than the literals they cover and must be dropped — the
    stream shrinks vs the take-anything-≥4 greedy (which measured 17274
    bytes on this exact fixture) while staying bit-exact; backref-dominated
    streams (repeated tiles) keep their matches."""
    from gdal_ray.core.vp8l import decode_vp8l, encode_vp8l
    rng = np.random.default_rng(3)
    g = (np.linspace(0, 255, 256 * 256).reshape(256, 256)
         + rng.integers(0, 2, (256, 256))).clip(0, 255).astype(np.uint8)
    enc = encode_vp8l(np.stack([g, g, g], axis=2), predictor=True)
    assert np.array_equal(decode_vp8l(enc), g)   # gray collapse, bit-exact
    assert len(enc) < 15500                      # greedy baseline: 17274
    # sparse strokes on white: long background runs must SURVIVE pruning
    tx = np.full((128, 128), 255, np.uint8)
    for i in range(0, 128, 7):
        for j in range(0, 120, 11):
            tx[i, j:j + int(rng.integers(2, 6))] = 0
    enc2 = encode_vp8l(np.stack([tx, tx, tx], axis=2))
    assert np.array_equal(decode_vp8l(enc2), tx)
    assert len(enc2) < 700                       # backrefs still carry it


def test_vp8i_bpred_intra_modes():
    """B_PRED (RFC 6386 §12.3 4×4 submodes DC/TM/VE/HE/LD/RD/VR/VL/HD/HU):
    adopted only when it wins the SSE+λ·rate comparison against the
    16×16+Y2 path, so quality never regresses; directional texture gains
    bytes at equal-or-better PSNR; the q100 MB-constant exactness class
    (the driver oracle) stays on the provable 16×16 path."""
    from gdal_ray.core.vp8i import decode_vp8i, encode_vp8i
    rng = np.random.default_rng(5)
    # q100 exactness class untouched
    g = np.repeat(np.repeat(rng.integers(0, 256, (4, 4), np.uint8), 16, 0),
                  16, 1)
    assert np.array_equal(decode_vp8i(encode_vp8i(g, 100)), g)
    # diagonal texture: B_PRED engages; roundtrip + quality/byte sanity
    yy, xx = np.mgrid[0:96, 0:96]
    diag = ((xx * 7 + yy * 13) % 251).astype(np.uint8)
    enc = encode_vp8i(diag, 85)
    dec = decode_vp8i(enc)
    assert dec.shape == diag.shape
    mse = np.mean((dec.astype(float) - diag.astype(float)) ** 2)
    assert 10 * np.log10(255 ** 2 / mse) >= 40.0
    # hard-edge checkerboard: V/H 16×16 modes reconstruct exactly, and the
    # RD gate must keep them (B_PRED correctly rejected)
    edges = (((xx // 16 + yy // 16) % 2) * 255).astype(np.uint8)
    assert np.array_equal(decode_vp8i(encode_vp8i(edges, 85)), edges)


@pytest.mark.parametrize("fmt", ["png", "jpeg", "webp", "raw"])
def test_decode_normalizes_corrupt_input_errors(fmt):
    """Truncated / bit-flipped streams raise ValueError from
    codecs.decode regardless of the failing layer (struct/zlib/index) —
    uniform catchability for catalog stages; CapabilityError still
    passes through for the quarantine path."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    blob = codecs.encode(img, fmt)
    for frac in (0.3, 0.7, 0.95):
        cut = blob[:int(len(blob) * frac)]
        try:
            codecs.decode(cut, fmt)
        except ValueError:
            pass                      # the required behavior
    bb = bytearray(blob)
    bb[len(bb) // 2] ^= 0xFF
    try:
        codecs.decode(bytes(bb), fmt)
    except ValueError:
        pass


def test_decode_capability_error_passes_through():
    fake_vp8 = (b"RIFF" + b"\x20\x00\x00\x00" + b"WEBP" + b"VP8 "
                + b"\x00" * 24)
    with pytest.raises(codecs.CapabilityError):
        codecs.decode(fake_vp8, "webp")
