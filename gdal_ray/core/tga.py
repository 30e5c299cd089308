"""TGA (Targa) raster codec — ``frmts/tga/tgadataset.cpp`` analog.

The reference driver is READ-ONLY; :func:`encode_tga` exists so pipelines
can also export and so roundtrips are testable.  Supported on read (same
set as the reference): image types 1/2/3 and their RLE variants 9/10/11,
8-bit grayscale, 8-bit color-mapped (24/32-bit palette entries), 24/32-bit
truecolor, both bottom-up (default) and top-down row order.  Pixel byte
order in the file is BGR(A); arrays here are RGB(A), row 0 = top.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_tga", "decode_tga"]


def encode_tga(arr: np.ndarray, *, rle: bool = False,
               palette: np.ndarray | None = None) -> bytes:
    """uint8 array -> TGA bytes.  (H,W) -> grayscale type 3, or with
    ``palette`` (N,3|4) -> color-mapped type 1; (H,W,3|4) -> truecolor
    type 2.  ``rle=True`` emits the RLE variants (types 9/10/11).
    Rows are written top-down (descriptor bit 5 set)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        h, w = arr.shape
        if palette is not None:
            pal = np.asarray(palette, dtype=np.uint8)
            nent, pdepth = pal.shape[0], pal.shape[1] * 8
            img_type, depth, cmap = 1, 8, 1
            pix = arr[:, :, None]
            # palette entries are stored BGR(A)
            pal_bytes = pal[:, [2, 1, 0] + ([3] if pal.shape[1] == 4 else [])]
            pal_bytes = pal_bytes.tobytes()
        else:
            img_type, depth, cmap = 3, 8, 0
            nent = pdepth = 0
            pal_bytes = b""
            pix = arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] in (3, 4):
        h, w = arr.shape[:2]
        img_type, depth, cmap = 2, arr.shape[2] * 8, 0
        nent = pdepth = 0
        pal_bytes = b""
        pix = arr[:, :, [2, 1, 0] + ([3] if arr.shape[2] == 4 else [])]
    else:
        raise ValueError("TGA: expected (H,W)[,3|4] uint8")
    nb = pix.shape[2]
    alpha_bits = 8 if (arr.ndim == 3 and arr.shape[2] == 4) else 0
    desc = 0x20 | alpha_bits                       # top-down origin
    if rle:
        img_type += 8
        body = _rle_encode(pix.reshape(h, w * nb), nb)
    else:
        body = pix.tobytes()
    hdr = struct.pack("<BBBHHBHHHHBB", 0, cmap, img_type,
                      0, nent, pdepth, 0, 0, w, h, depth, desc)
    return hdr + pal_bytes + body


def _rle_encode(rows: np.ndarray, nb: int) -> bytes:
    """Per-row TGA RLE: runs of equal pixels -> 0x80|n-1 + pixel; literal
    spans -> n-1 + pixels.  Packets never cross row boundaries (the
    reference decodes per-scanline)."""
    out = bytearray()
    for row in rows:
        px = row.reshape(-1, nb)
        n = len(px)
        same = np.concatenate([[False], (px[1:] == px[:-1]).all(axis=1)])
        i = 0
        while i < n:
            if i + 1 < n and same[i + 1]:
                j = i + 1
                while j < n and same[j] and j - i < 128:
                    j += 1
                out.append(0x80 | (j - i - 1))
                out += px[i].tobytes()
                i = j
            else:
                j = i + 1
                while j < n and not (j + 1 < n and same[j + 1]) \
                        and j - i < 128:
                    j += 1
                out.append(j - i - 1)
                out += px[i:j].tobytes()
                i = j
    return bytes(out)


def decode_tga(data: bytes):
    """TGA bytes -> (array, palette-or-None).  Grayscale -> (H,W);
    color-mapped -> ((H,W) indices, (N,3|4) RGB palette); truecolor ->
    (H,W,3|4) RGB(A).  Row 0 = top regardless of file origin."""
    (idlen, cmap_type, img_type, cm_first, cm_len, cm_depth,
     _x0, _y0, w, h, depth, desc) = struct.unpack_from("<BBBHHBHHHHBB",
                                                       data, 0)
    pos = 18 + idlen
    palette = None
    if cmap_type == 1:
        pb = cm_depth // 8
        raw = np.frombuffer(data, dtype=np.uint8, count=cm_len * pb,
                            offset=pos).reshape(cm_len, pb)
        if pb == 3:
            palette = raw[:, [2, 1, 0]].copy()
        elif pb == 4:
            palette = raw[:, [2, 1, 0, 3]].copy()
        else:
            raise ValueError(f"TGA: palette entry depth {cm_depth}")
        pos += cm_len * pb
    base = img_type & 0x07
    if base not in (1, 2, 3):
        raise ValueError(f"TGA: image type {img_type} not supported")
    nb = depth // 8
    if nb not in (1, 3, 4):
        raise ValueError(f"TGA: pixel depth {depth} not supported")
    npix = h * w
    if img_type & 0x08:                                  # RLE
        flat = _rle_decode(data, pos, npix, nb)
    else:
        flat = np.frombuffer(data, dtype=np.uint8, count=npix * nb,
                             offset=pos).reshape(npix, nb)
    img = flat.reshape(h, w, nb)
    if not (desc & 0x20):                                # bottom-up file
        img = img[::-1, :, :]
    if nb == 1:
        arr = img[:, :, 0].copy()
    else:
        order = [2, 1, 0] + ([3] if nb == 4 else [])
        arr = img[:, :, order].copy()
    return arr, palette


def _rle_decode(data: bytes, pos: int, npix: int, nb: int) -> np.ndarray:
    out = np.empty((npix, nb), dtype=np.uint8)
    buf = np.frombuffer(data, dtype=np.uint8)
    filled = 0
    while filled < npix:
        hdrb = int(buf[pos])
        pos += 1
        count = (hdrb & 0x7F) + 1
        count = min(count, npix - filled)
        if hdrb & 0x80:                                  # run packet
            out[filled:filled + count] = buf[pos:pos + nb]
            pos += nb
        else:                                            # literal packet
            out[filled:filled + count] = \
                buf[pos:pos + count * nb].reshape(count, nb)
            pos += count * nb
        filled += count
    return out
