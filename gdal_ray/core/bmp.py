"""Windows BMP codec — ``frmts/bmp/bmpdataset.cpp`` analog.

Scope (matches the reference driver's practical surface): uncompressed
``BI_RGB`` BITMAPINFOHEADER files — 1/4/8-bit paletted and 24/32-bit
true-colour, bottom-up (positive height) and top-down (negative height)
row orders, 4-byte-padded rows.  The writer emits 8-bit paletted (with a
caller palette or an identity grayscale one) or 24-bit BGR, always
bottom-up like the reference (``BMPDataset::Create``).  RLE4/RLE8
compression is read-only in the reference and rare; it raises here.

Decode returns ``(array, palette)``: ``array`` is ``(h, w)`` uint8 index
data for paletted files or ``(h, w, 3|4)`` RGB(A) for true-colour,
``palette`` is an ``(n, 3)`` uint8 RGB table or ``None``.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_bmp", "decode_bmp"]

_FILEHDR = struct.Struct("<2sIHHI")
_INFOHDR = struct.Struct("<IiiHHIIiiII")


def encode_bmp(arr: np.ndarray, palette: np.ndarray | None = None) -> bytes:
    """(h,w) uint8 [+ palette] -> 8-bit paletted BMP; (h,w,3) uint8 ->
    24-bit BGR BMP.  Rows stored bottom-up, padded to 4 bytes."""
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        raise ValueError("BMP writer: uint8 only")
    if arr.ndim == 2:
        h, w = arr.shape
        bits = 8
        if palette is None:
            pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, 1)
        else:
            pal = np.asarray(palette, dtype=np.uint8).reshape(-1, 3)
            if len(pal) > 256:
                raise ValueError("BMP palette: max 256 entries")
        quad = np.zeros((len(pal), 4), dtype=np.uint8)
        quad[:, 0] = pal[:, 2]          # stored BGRA
        quad[:, 1] = pal[:, 1]
        quad[:, 2] = pal[:, 0]
        paldata = quad.tobytes()
        rowbytes = w
        rows = arr
    elif arr.ndim == 3 and arr.shape[2] == 3:
        h, w = arr.shape[:2]
        bits = 24
        paldata = b""
        pal = None
        rowbytes = w * 3
        rows = arr[:, :, ::-1].reshape(h, rowbytes)      # RGB -> BGR
    else:
        raise ValueError("BMP writer: (h,w) paletted or (h,w,3) RGB")
    stride = (rowbytes + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, :rowbytes] = rows
    body = body[::-1]                                    # bottom-up
    offset = _FILEHDR.size + _INFOHDR.size + len(paldata)
    info = _INFOHDR.pack(40, w, h, 1, bits, 0, h * stride, 2835, 2835,
                         len(paldata) // 4, 0)
    filehdr = _FILEHDR.pack(b"BM", offset + h * stride, 0, 0, offset)
    return filehdr + info + paldata + body.tobytes()


def decode_bmp(data: bytes):
    """BMP bytes -> (array, palette).  See module docstring for shapes."""
    if data[:2] != b"BM":
        raise ValueError("BMP: bad magic")
    _, _, _, _, offset = _FILEHDR.unpack_from(data, 0)
    hdrsize = struct.unpack_from("<I", data, 14)[0]
    if hdrsize < 40:
        raise ValueError("BMP: BITMAPCOREHEADER not supported")
    (_, w, h, planes, bits, comp, _, _, _, clrused,
     _) = _INFOHDR.unpack_from(data, 14)
    if comp != 0:
        raise NotImplementedError(f"BMP: compression {comp} not supported")
    topdown = h < 0
    h = abs(h)
    palette = None
    if bits <= 8:
        n = clrused or (1 << bits)
        quads = np.frombuffer(data, np.uint8, n * 4,
                              14 + hdrsize).reshape(n, 4)
        palette = quads[:, [2, 1, 0]].copy()             # BGRA -> RGB
    rowbytes = (w * bits + 7) // 8
    stride = (rowbytes + 3) & ~3
    raw = np.frombuffer(data, np.uint8, stride * h, offset) \
        .reshape(h, stride)[:, :rowbytes]
    if not topdown:
        raw = raw[::-1]
    if bits == 8:
        return raw.copy(), palette
    if bits == 4:
        hi = raw >> 4
        lo = raw & 0x0F
        out = np.empty((h, rowbytes * 2), dtype=np.uint8)
        out[:, 0::2] = hi
        out[:, 1::2] = lo
        return out[:, :w].copy(), palette
    if bits == 1:
        out = np.unpackbits(raw, axis=1)
        return out[:, :w].copy(), palette
    if bits == 24:
        px = raw.reshape(h, rowbytes // 3, 3)[:, :w]
        return px[:, :, ::-1].copy(), palette            # BGR -> RGB
    if bits == 32:
        px = raw.reshape(h, rowbytes // 4, 4)[:, :w]
        return px[:, :, [2, 1, 0, 3]].copy(), palette    # BGRA -> RGBA
    raise NotImplementedError(f"BMP: {bits}-bit not supported")
