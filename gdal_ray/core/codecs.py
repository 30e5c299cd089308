"""Image codecs for the ``bytes`` column — pure stdlib/numpy.

The reference delegates to libpng/libjpeg/libwebp drivers (``frmts/png``,
``frmts/jpeg``, ``frmts/webp``).  This container has none of those libs, so:

  - ``raw``  — self-describing uncompressed C-order pixels (exactness tests).
  - ``png``  — a REAL, spec-conformant PNG codec built on stdlib zlib:
    8-bit AND 16-bit gray / gray+alpha / RGB / RGBA, all five scanline
    filters on decode, filter-0 or Up on encode; decode also handles
    Adam7-interlaced streams (both depths).  Output opens in any PNG
    reader; lossless round-trip is bit-exact.
  - ``jpeg`` — a REAL baseline JFIF codec (``core/jpeg.py``, pure-numpy
    ITU-T T.81: Annex-K tables, 4:4:4 / 4:2:0, restart markers).  Catalog
    quality 98 keeps the adversarial fixtures at PSNR ≥ 40 dB (the
    BASELINE lossy pin).  Output opens in any viewer.
  - ``webp`` — a REAL lossless WebP (VP8L) codec (``core/vp8l.py``,
    spec-conformant RIFF/VP8L bitstream, canonical prefix codes,
    literal-only encoder / full LZ77 decoder).  Lossless, so the PSNR pin
    is trivially met; lossy VP8 would need libvpx-class machinery.
  - Legacy quantize-stub payloads (GJPG/GWBP magics) from older catalogs
    still decode via `_lossy_decode` (decode sniffs the real magics).

All functions take/return ``(h, w)`` or ``(h, w, bands)`` uint8 arrays.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

class CapabilityError(NotImplementedError):
    """A payload is structurally valid but outside this engine's codec
    capability (e.g. interchange lossy `VP8 ` WebP).  The reference's
    driver layer reports these as per-file "cannot open" failures rather
    than aborting the dataset (gcore GDALOpen error path); catalog stages
    catch THIS type to quarantine the row and keep the batch alive, while
    genuinely corrupt payloads still raise and fail loudly."""

    def __init__(self, message: str, *, fmt: str = "", reason: str = ""):
        super().__init__(message)
        self.fmt = fmt
        self.reason = reason


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_RAW_MAGIC = b"GRW1"
_LOSSY_MAGIC = {"jpeg": b"GJPG", "webp": b"GWBP"}
_LOSSY_Q = {"jpeg": 4, "webp": 3}  # quant step: max err q/2 → PSNR ≈ 47/49 dB


# ---------- raw ----------

# GDAL pixel-type lattice (gcore/gdal.h:47-67 GDALDataType), the subset
# numpy can hold; GRW2 payloads carry the dtype code so int16/float32 DEMs
# flow through the same bytes column as uint8 imagery.
_DTYPE_CODES = {
    np.dtype(np.uint8): 1, np.dtype(np.int8): 2,
    np.dtype(np.uint16): 3, np.dtype(np.int16): 4,
    np.dtype(np.uint32): 5, np.dtype(np.int32): 6,
    np.dtype(np.float32): 7, np.dtype(np.float64): 8,
}
_CODE_DTYPES = {v: k for k, v in _DTYPE_CODES.items()}
_RAW2_MAGIC = b"GRW2"


def encode_raw(img: np.ndarray) -> bytes:
    a = np.ascontiguousarray(img)
    h, w = a.shape[:2]
    b = a.shape[2] if a.ndim == 3 else 1
    if a.dtype == np.uint8:
        return _RAW_MAGIC + struct.pack("<III", h, w, b) + a.tobytes()
    code = _DTYPE_CODES.get(a.dtype)
    if code is None:
        raise ValueError(f"unsupported raster dtype {a.dtype}")
    return _RAW2_MAGIC + struct.pack("<IIII", h, w, b, code) + a.tobytes()


def decode_raw(data: bytes) -> np.ndarray:
    if data[:4] == _RAW2_MAGIC:
        h, w, b, code = struct.unpack_from("<IIII", data, 4)
        a = np.frombuffer(data, dtype=_CODE_DTYPES[code],
                          offset=20).reshape(h, w, b)
        return a[:, :, 0] if b == 1 else a
    assert data[:4] == _RAW_MAGIC, "not a raw payload"
    h, w, b = struct.unpack_from("<III", data, 4)
    a = np.frombuffer(data, dtype=np.uint8, offset=16).reshape(h, w, b)
    return a[:, :, 0] if b == 1 else a


# ---------- png ----------

def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def _filter_adaptive(rows: np.ndarray, bpp: int) -> bytes:
    """Per-row adaptive PNG filtering (spec heuristic: pick the filter
    with the minimum sum of signed-absolute filtered bytes).  All five
    candidates are computed vectorized per row-block; a block carries only
    the previous raw row, so memory stays bounded on huge images."""
    h, stride = rows.shape
    out = np.empty((h, stride + 1), np.uint8)
    block = max(1, (1 << 22) // max(stride, 1))   # ~4 MB of rows per block
    prev = np.zeros((1, stride), np.uint8)
    for y0 in range(0, h, block):
        r = rows[y0:y0 + block]
        n = r.shape[0]
        R = r.astype(np.int16)
        A = np.zeros_like(R)
        A[:, bpp:] = R[:, :-bpp]
        P = np.concatenate([prev, r[:-1]], axis=0).astype(np.int16)
        C = np.zeros_like(R)
        C[:, bpp:] = P[:, :-bpp]
        p = A + P - C
        pa, pb, pc = np.abs(p - A), np.abs(p - P), np.abs(p - C)
        paeth = np.where((pa <= pb) & (pa <= pc), A, np.where(pb <= pc, P, C))
        cands = np.stack([R,
                          R - A,                       # 1 = Sub
                          R - P,                       # 2 = Up
                          R - ((A + P) >> 1),          # 3 = Average
                          R - paeth]).astype(np.uint8) # 4 = Paeth
        s = cands.astype(np.int16)
        scores = np.minimum(s, 256 - s).sum(axis=2)    # (5, n)
        pick = np.argmin(scores, axis=0)
        out[y0:y0 + n, 0] = pick.astype(np.uint8)
        out[y0:y0 + n, 1:] = cands[pick, np.arange(n)]
        prev = r[-1:].copy()
    return out.tobytes()


def encode_png(img: np.ndarray, level: int = 6, filter_type=0) -> bytes:
    """8-bit (uint8) or 16-bit (uint16 → big-endian samples, per the PNG
    spec) gray / gray+alpha / RGB / RGBA, non-interlaced.  16-bit covers
    the DEM-PNG case the reference reads via frmts/png/pngdataset.cpp."""
    a = np.ascontiguousarray(img)
    if a.dtype == np.uint16:
        bitdepth = 16
    else:
        a = np.ascontiguousarray(a, dtype=np.uint8)
        bitdepth = 8
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, nb = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[nb]
    ihdr = struct.pack(">IIBBBBB", w, h, bitdepth, color_type, 0, 0, 0)
    if bitdepth == 16:
        rows = np.frombuffer(a.astype(">u2").tobytes(),
                             np.uint8).reshape(h, w * nb * 2)
    else:
        rows = a.reshape(h, w * nb)
    def _raw(ft):
        if ft == "adaptive":
            # per-row best-of-5 (spec MSAD heuristic)
            return _filter_adaptive(rows, nb * (bitdepth // 8))
        if ft == 0:
            return np.concatenate([np.zeros((h, 1), dtype=np.uint8),
                                   rows], axis=1).tobytes()
        # filter 2 (Up) — byte-domain per spec; cheap, compresses better
        up = np.empty_like(rows)
        up[0] = rows[0]
        up[1:] = rows[1:] - rows[:-1]
        return np.concatenate([np.full((h, 1), 2, dtype=np.uint8),
                               up], axis=1).tobytes()

    if filter_type == "best":
        # bandwidth-profile choice: MSAD is a local heuristic that loses to
        # plain None/Up on low-entropy or row-repetitive content (zlib sees
        # cross-row matches MSAD can't) — so spend the CPU and pick by the
        # ACTUAL compressed size across the three strategies
        idat = min((zlib.compress(_raw(ft), level)
                    for ft in (0, 2, "adaptive")), key=len)
    else:
        idat = zlib.compress(_raw(filter_type), level)
    return (_PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    rows = raw.reshape(h, stride + 1)
    ftypes = rows[:, 0]
    # fast paths for the filters our own encoder emits (0 = None, 2 = Up):
    # the generic path below is a per-row Python loop — milliseconds per
    # image, and decode sits on the warp hot path
    if not ftypes.any():
        return rows[:, 1:].copy()
    if (ftypes == 2).all():
        return np.cumsum(rows[:, 1:], axis=0, dtype=np.uint32).astype(np.uint8)
    data = rows[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.int32)
    for y in range(h):
        f = ftypes[y]
        cur = data[y]
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.int32)
        if f == 0:
            out[y] = cur
        elif f == 2:
            out[y] = (cur + prev) & 0xFF
        elif f == 1:
            row = cur.copy()
            for x in range(bpp, stride):
                row[x] = (row[x] + row[x - bpp]) & 0xFF
            out[y] = row
        elif f == 3:
            row = cur.copy()
            for x in range(stride):
                left = row[x - bpp] if x >= bpp else 0
                row[x] = (row[x] + ((left + prev[x]) >> 1)) & 0xFF
            out[y] = row
        elif f == 4:
            row = cur.copy()
            for x in range(stride):
                a_ = row[x - bpp] if x >= bpp else 0
                b_ = prev[x]
                c_ = prev[x - bpp] if x >= bpp else 0
                p = a_ + b_ - c_
                pa, pb, pc = abs(p - a_), abs(p - b_), abs(p - c_)
                pred = a_ if (pa <= pb and pa <= pc) else (b_ if pb <= pc else c_)
                row[x] = (row[x] + pred) & 0xFF
            out[y] = row
        else:
            raise ValueError(f"bad png filter {f}")
    return out.astype(np.uint8)


# Adam7 pass grid: (x0, y0, dx, dy) per the PNG spec §8.2
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def decode_png(data: bytes) -> np.ndarray:
    assert data[:8] == _PNG_SIG, "not a png"
    off = 8
    w = h = bitdepth = color = interlace = None
    idat = []
    n = len(data)
    while off < n:
        (ln,) = struct.unpack_from(">I", data, off)
        tag = data[off + 4: off + 8]
        body = data[off + 8: off + 8 + ln]
        off += 12 + ln
        if tag == b"IHDR":
            w, h, bitdepth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if bitdepth not in (8, 16):
                raise NotImplementedError("8/16-bit PNG only (no sub-byte packing)")
            if interlace not in (0, 1):
                raise ValueError(f"bad PNG interlace {interlace}")
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    nb = {0: 1, 2: 3, 4: 2, 6: 4}[color]
    bpp = nb * (bitdepth // 8)              # filter offset is in BYTES
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)

    def to_pixels(byts: np.ndarray, ph: int, pw: int) -> np.ndarray:
        if bitdepth == 16:
            a16 = np.frombuffer(np.ascontiguousarray(byts).tobytes(),
                                dtype=">u2").reshape(ph, pw, nb)
            return a16.astype(np.uint16)
        return byts.reshape(ph, pw, nb)

    if interlace == 0:
        out = to_pixels(_unfilter(raw, h, w * bpp, bpp), h, w)
    else:                                    # Adam7: 7 sub-images, each
        out = np.zeros((h, w, nb),           # independently filtered
                       dtype=np.uint16 if bitdepth == 16 else np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            span = ph * (1 + pw * bpp)
            sub = to_pixels(_unfilter(raw[pos:pos + span], ph, pw * bpp, bpp),
                            ph, pw)
            out[y0::dy, x0::dx, :] = sub
            pos += span
    return out[:, :, 0] if nb == 1 else out


# ---------- legacy lossy stubs (decode-compat only) ----------

def _lossy_encode(img: np.ndarray, fmt: str) -> bytes:
    q = _LOSSY_Q[fmt]
    a = np.ascontiguousarray(img, dtype=np.uint8)
    shape = a.shape
    # deterministic mid-tread quantization: the information actually lost
    quant = ((a.astype(np.int32) + q // 2) // q).astype(np.uint8)
    h, w = shape[:2]
    nb = shape[2] if a.ndim == 3 else 1
    payload = zlib.compress(quant.tobytes(), 6)
    return _LOSSY_MAGIC[fmt] + struct.pack("<IIIB", h, w, nb, q) + payload


def _lossy_decode(data: bytes, fmt: str) -> np.ndarray:
    assert data[:4] == _LOSSY_MAGIC[fmt], f"not a {fmt} stub payload"
    h, w, nb, q = struct.unpack_from("<IIIB", data, 4)
    quant = np.frombuffer(zlib.decompress(data[17:]), dtype=np.uint8)
    a = np.minimum(quant.astype(np.int32) * q, 255).astype(np.uint8).reshape(h, w, nb)
    return a[:, :, 0] if nb == 1 else a


# ---------- dispatch ----------

def encode(img: np.ndarray, fmt: str, *, profile: str = "cpu") -> bytes:
    """``profile`` selects the bytes-vs-CPU trade ONCE per pipeline/sink
    instead of per call-site:

      - ``"cpu"`` (default): cheapest encode — right when the cluster is
        CPU-bound and the object store / network is not the bottleneck
        (measured single-node: VP8L inverse-predictor decode CPU outweighs
        its byte savings).
      - ``"bandwidth"``: spend encode CPU to shrink payloads — VP8L gets
        the spatial-prediction + cross-color transforms (measured ~56% of
        plain on fixture RGB), JPEG goes 4:2:0, PNG picks the best of all
        five spec filters per row (MSAD heuristic).
        Right for multi-node clusters where shuffle/object-store bandwidth
        dominates (the flip documented in core/vp8l.py).
    """
    if profile not in ("cpu", "bandwidth"):
        raise ValueError(f"unknown encode profile {profile!r}")
    bw = profile == "bandwidth"
    if fmt == "raw":
        return encode_raw(img)
    if fmt == "png":
        return encode_png(img, filter_type="best" if bw else 0)
    if fmt == "jpeg":
        from . import jpeg as _jpeg
        return _jpeg.encode_jpeg(img, quality=98, subsample=bw)
    if fmt == "jpeg_420":
        # 4:2:0 chroma-subsampled catalog option (decodes as fmt="jpeg")
        from . import jpeg as _jpeg
        return _jpeg.encode_jpeg(img, quality=98, subsample=True)
    if fmt == "webp":
        from . import vp8l as _vp8l
        return _vp8l.encode_vp8l(img, predictor=bw, color=bw)
    if fmt == "webp_lossy":
        from . import vp8i as _vp8i
        return _vp8i.encode_vp8i(img, quality=90)
    if fmt in ("tif", "tiff"):
        from . import tiff as _tiff
        pred = None
        if bw:   # horizontal differencing for ints, byte-split for floats
            pred = 3 if np.issubdtype(np.asarray(img).dtype, np.floating) else 2
        return _tiff.encode_tiff(img, predictor=pred)
    if fmt == "aaigrid":
        from . import aaigrid as _aai
        return _aai.encode_aaigrid(np.asarray(img))
    if fmt == "xyz":
        from . import aaigrid as _aai
        return _aai.encode_xyz(np.asarray(img))
    if fmt == "bmp":
        from . import bmp as _bmp
        return _bmp.encode_bmp(np.asarray(img))
    if fmt == "pnm":
        from . import pnm as _pnm
        return _pnm.encode_pnm(np.asarray(img))
    if fmt == "gif":
        from . import gif as _gif
        img = np.asarray(img)
        if img.ndim != 2 or img.dtype != np.uint8:
            raise ValueError("GIF needs a uint8 index/gray band; use "
                             "stages.palette for RGB quantization")
        return _gif.encode_gif(
            img, np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, 1))
    if fmt == "srtmhgt":
        from . import demgrids as _dg
        img = np.asarray(img)
        if img.dtype == np.float32:
            raise ValueError("float32 SRTM tiles are the '.hgts' variant "
                             "— use fmt='hgts' (raw sizes alone are "
                             "ambiguous: N^2 float32 == (2N)^2 uint8)")
        return _dg.encode_srtmhgt(img)
    if fmt == "hgts":
        from . import demgrids as _dg
        return _dg.encode_srtmhgt(np.asarray(img, dtype=np.float32))
    if fmt == "dted":
        from . import demgrids as _dg
        return _dg.encode_dted(np.asarray(img))
    if fmt == "gsag":
        from . import demgrids as _dg
        return _dg.encode_gsag(np.asarray(img))
    if fmt == "gsbg":
        from . import demgrids as _dg
        return _dg.encode_gsbg(np.asarray(img))
    if fmt == "gs7bg":
        from . import demgrids as _dg
        return _dg.encode_gs7bg(np.asarray(img))
    if fmt == "zmap":
        from . import demgrids as _dg
        return _dg.encode_zmap(np.asarray(img))
    if fmt == "tga":
        from . import tga as _tga
        return _tga.encode_tga(np.asarray(img), rle=bw)
    if fmt == "bt":
        from . import rawgrids as _rg
        return _rg.encode_bt(np.asarray(img))
    if fmt == "gtx":
        from . import rawgrids as _rg
        return _rg.encode_gtx(np.asarray(img))
    if fmt == "usgsdem":
        from . import rawgrids as _rg
        return _rg.encode_usgsdem(np.asarray(img))
    if fmt == "pds":
        from . import pds as _pds
        return _pds.encode_pds(np.asarray(img))
    if fmt == "lcp":
        from . import rawgrids as _rg
        return _rg.encode_lcp(np.asarray(img))
    if fmt == "terragen":
        from . import rawgrids as _rg
        return _rg.encode_terragen(np.asarray(img))
    if fmt == "kro":
        from . import rawgrids as _rg
        return _rg.encode_kro(np.asarray(img))
    if fmt == "fits":
        from . import rawgrids as _rg
        return _rg.encode_fits(np.asarray(img))
    if fmt == "gxf":
        from . import rawgrids as _rg
        return _rg.encode_gxf(np.asarray(img))
    if fmt == "sigdem":
        from . import rawgrids as _rg
        return _rg.encode_sigdem(np.asarray(img))
    if fmt == "jdem":
        from . import rawgrids as _rg
        return _rg.encode_jdem(np.asarray(img))
    if fmt == "ngsgeoid":
        from . import rawgrids as _rg
        return _rg.encode_ngsgeoid(np.asarray(img))
    if fmt == "bsb":
        from . import bsb as _bsb
        img = np.asarray(img)
        return _bsb.encode_bsb(
            img, np.repeat(np.arange(1, 128, dtype=np.uint8)[:, None],
                           3, 1))
    if fmt in _LOSSY_MAGIC:
        return _lossy_encode(img, fmt)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode(data: bytes, fmt: str) -> np.ndarray:
    """Format dispatch with NORMALIZED errors: undecodable bytes raise
    ValueError (whatever the low-level failure — short buffer, bad zlib
    stream, table overrun), and CapabilityError passes through untouched
    so catalog stages can route known-unsupported rows to quarantine."""
    try:
        return _decode_impl(data, fmt)
    except (CapabilityError, ValueError):
        raise
    except (struct.error, zlib.error, IndexError, EOFError, KeyError,
            OverflowError) as e:
        raise ValueError(f"corrupt {fmt} stream: {e}") from e


def _decode_impl(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "raw":
        return decode_raw(data)
    if fmt == "png":
        return decode_png(data)
    if fmt in ("jpeg", "jpeg_420"):
        if data[:2] == b"\xff\xd8":
            from . import jpeg as _jpeg
            return _jpeg.decode_jpeg(data)
        return _lossy_decode(data, "jpeg")   # legacy GJPG stub payloads
    if fmt in ("webp", "webp_lossy"):
        if data[:4] == b"RIFF":
            fourcc = data[12:16]
            if fourcc == b"VP8L":
                from . import vp8l as _vp8l
                return _vp8l.decode_vp8l(data)
            if fourcc == b"VP8i":
                from . import vp8i as _vp8i
                return _vp8i.decode_vp8i(data)
            if fourcc == b"VP8 ":
                raise CapabilityError(
                    "interchange lossy VP8 needs RFC 6386's default "
                    "probability/quantizer tables (unavailable offline); "
                    "this engine decodes VP8L (lossless) and its own VP8i "
                    "lossy streams — see core/vp8i.py docstring",
                    fmt="webp", reason="vp8_interchange_lossy")
            raise ValueError(f"unknown WEBP chunk {fourcc!r}")
        return _lossy_decode(data, "webp")   # legacy GWBP stub payloads
    if fmt in ("tif", "tiff"):
        from . import tiff as _tiff
        return _tiff.decode_tiff(data)
    if fmt == "aaigrid":
        from . import aaigrid as _aai
        return _aai.decode_aaigrid(data)[0]
    if fmt == "xyz":
        from . import aaigrid as _aai
        return _aai.decode_xyz(data)[0]
    if fmt == "bmp":
        from . import bmp as _bmp
        return _bmp.decode_bmp(data)[0]
    if fmt == "pnm":
        from . import pnm as _pnm
        return _pnm.decode_pnm(data)
    if fmt == "gif":
        from . import gif as _gif
        return _gif.decode_gif(data)[0]
    if fmt == "srtmhgt":
        from . import demgrids as _dg
        return _dg.decode_srtmhgt(data)[0]
    if fmt == "hgts":
        from . import demgrids as _dg
        return _dg.decode_srtmhgt(data, "N00E000.hgts")[0]
    if fmt == "dted":
        from . import demgrids as _dg
        return _dg.decode_dted(data)[0]
    if fmt == "gsag":
        from . import demgrids as _dg
        return _dg.decode_gsag(data)[0]
    if fmt == "gsbg":
        from . import demgrids as _dg
        return _dg.decode_gsbg(data)[0]
    if fmt == "gs7bg":
        from . import demgrids as _dg
        return _dg.decode_gs7bg(data)[0]
    if fmt == "zmap":
        from . import demgrids as _dg
        return _dg.decode_zmap(data)[0]
    if fmt == "tga":
        from . import tga as _tga
        return _tga.decode_tga(data)[0]
    if fmt == "bt":
        from . import rawgrids as _rg
        return _rg.decode_bt(data)[0]
    if fmt == "gtx":
        from . import rawgrids as _rg
        return _rg.decode_gtx(data)[0]
    if fmt == "usgsdem":
        from . import rawgrids as _rg
        return _rg.decode_usgsdem(data)[0]
    if fmt == "pds":
        from . import pds as _pds
        return _pds.decode_pds(data)[0]
    if fmt == "lcp":
        from . import rawgrids as _rg
        return _rg.decode_lcp(data)[0]
    if fmt == "terragen":
        from . import rawgrids as _rg
        return _rg.decode_terragen(data)[0]
    if fmt == "kro":
        from . import rawgrids as _rg
        return _rg.decode_kro(data)[0]
    if fmt == "fits":
        from . import rawgrids as _rg
        return _rg.decode_fits(data)[0]
    if fmt == "gxf":
        from . import rawgrids as _rg
        return _rg.decode_gxf(data)[0]
    if fmt == "sigdem":
        from . import rawgrids as _rg
        return _rg.decode_sigdem(data)[0]
    if fmt == "jdem":
        from . import rawgrids as _rg
        return _rg.decode_jdem(data)[0]
    if fmt == "ngsgeoid":
        from . import rawgrids as _rg
        return _rg.decode_ngsgeoid(data)[0]
    if fmt == "bsb":
        from . import bsb as _bsb
        return _bsb.decode_bsb(data)[0]
    if fmt in _LOSSY_MAGIC:
        return _lossy_decode(data, fmt)
    raise ValueError(f"unknown fmt {fmt!r}")


def is_lossy(fmt: str) -> bool:
    return fmt in _LOSSY_MAGIC
