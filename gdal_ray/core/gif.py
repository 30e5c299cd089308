"""GIF codec — ``frmts/gif/gifdataset.cpp`` analog (giflib semantics).

Single-image GIF87a/89a: logical screen + global color table, optional
extension blocks (skipped on read; writer emits none), one image
descriptor with variable-width LSB-first LZW data in ≤255-byte
sub-blocks.  Width growth follows the interoperable (non-early-change)
rule giflib uses: the encoder grows the code width when the next free
code reaches ``2^width`` *before* the entry is added, the decoder when
its next free code reaches ``2^width`` *after* its add — both sides see
each emitted code at the same width.  The dictionary caps at 4096; the
encoder emits CLEAR and resets there (egif_lib.c ``LZ_MAX_CODE``), the
decoder also tolerates deferred-clear streams by simply not adding.

Decode returns ``(indices (h,w) uint8, palette (n,3) uint8)`` with
interlaced images de-interlaced (the 8/8/4/2 four-pass order).  Encode
writes a non-interlaced GIF89a from the same pair.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_gif", "decode_gif"]


# ---------- LZW ----------

def _lzw_encode(ind: np.ndarray, min_code: int) -> bytes:
    clear = 1 << min_code
    eoi = clear + 1
    first_free = eoi + 1
    width = min_code + 1
    next_code = first_free
    d: dict[int, int] = {}
    acc = 0
    nbits = 0
    out = bytearray()

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    flat = ind.ravel().tolist()
    cur = flat[0]
    for px in flat[1:]:
        key = (cur << 8) | px
        code = d.get(key)
        if code is not None:
            cur = code
            continue
        emit(cur)
        if next_code == (1 << width) and width < 12:
            width += 1
        d[key] = next_code
        next_code += 1
        if next_code == 4096:
            emit(clear)
            d.clear()
            width = min_code + 1
            next_code = first_free
        cur = px
    emit(cur)
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code: int, npix: int) -> np.ndarray:
    clear = 1 << min_code
    eoi = clear + 1
    first_free = eoi + 1
    bits = np.unpackbits(np.frombuffer(data, np.uint8),
                         bitorder="little")
    pos = 0
    total = len(bits)
    pows = 1 << np.arange(12)

    out = np.empty(npix, dtype=np.uint8)
    no = 0
    # dict as parallel arrays: prefix code, last byte, sequence length
    prefix = np.zeros(4096, dtype=np.int32)
    last = np.zeros(4096, dtype=np.uint8)
    seqlen = np.zeros(4096, dtype=np.int32)
    last[:clear] = np.arange(clear, dtype=np.uint8)
    seqlen[:clear] = 1

    width = min_code + 1
    next_code = first_free
    prev = -1
    while no < npix:
        if pos + width > total:
            raise ValueError("GIF: truncated LZW stream")
        c = int(bits[pos:pos + width] @ pows[:width])
        pos += width
        if c == clear:
            width = min_code + 1
            next_code = first_free
            prev = -1
            continue
        if c == eoi:
            break
        if prev < 0:                      # first code after clear
            if c >= clear:
                raise ValueError("GIF: bad first LZW code")
            out[no] = c
            no += 1
            prev = c
            continue
        if c < next_code:
            entry = c
        elif c == next_code:              # KwKwK case
            entry = -1
        else:
            raise ValueError("GIF: LZW code out of range")
        # materialize the entry (walk the prefix chain backwards)
        if entry >= 0:
            ln = int(seqlen[entry])
            end = no + ln
            if end > npix:
                raise ValueError("GIF: LZW output overrun")
            e = entry
            for i in range(ln - 1, -1, -1):
                out[no + i] = last[e]
                e = prefix[e]
            first_byte = out[no]
            no = end
        else:
            ln = int(seqlen[prev]) + 1
            end = no + ln
            if end > npix:
                raise ValueError("GIF: LZW output overrun")
            e = prev
            for i in range(ln - 2, -1, -1):
                out[no + i] = last[e]
                e = prefix[e]
            first_byte = out[no]
            out[no + ln - 1] = first_byte
            no = end
        if next_code < 4096:
            prefix[next_code] = prev
            last[next_code] = first_byte
            seqlen[next_code] = seqlen[prev] + 1
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = c if entry >= 0 else next_code - 1
    return out


# ---------- container ----------

def encode_gif(ind: np.ndarray, palette: np.ndarray) -> bytes:
    """(h,w) uint8 index array + (n,3) uint8 palette -> GIF89a bytes."""
    ind = np.asarray(ind, dtype=np.uint8)
    if ind.ndim != 2:
        raise ValueError("GIF writer: (h,w) index array required")
    pal = np.asarray(palette, dtype=np.uint8).reshape(-1, 3)
    n = len(pal)
    if n > 256:
        raise ValueError("GIF palette: max 256 entries")
    if ind.max(initial=0) >= n:
        raise ValueError("GIF: index exceeds palette")
    gct_bits = max(1, int(np.ceil(np.log2(max(n, 2)))))
    gct = np.zeros((1 << gct_bits, 3), dtype=np.uint8)
    gct[:n] = pal
    h, w = ind.shape
    min_code = max(2, gct_bits)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((gct_bits - 1) << 4)
                       | (gct_bits - 1), 0, 0)
    out += gct.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)   # image descriptor
    out.append(min_code)
    lzw = _lzw_encode(ind, min_code)
    for i in range(0, len(lzw), 255):
        blk = lzw[i:i + 255]
        out.append(len(blk))
        out += blk
    out += b"\x00\x3B"
    return bytes(out)


_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(data: bytes):
    """GIF bytes -> (indices (h,w) uint8, palette (n,3) uint8).  Reads
    the FIRST image block (the reference exposes animation frames as
    subdatasets; one band here)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("GIF: bad magic")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    palette = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        palette = np.frombuffer(data, np.uint8, n * 3,
                                pos).reshape(n, 3).copy()
        pos += n * 3
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x3B:                                   # trailer
            break
        if b0 == 0x21:                                   # extension
            pos += 2
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{b0:02x}")
        _l, _t, w, h, ip = struct.unpack_from("<HHHHB", data, pos + 1)
        pos += 10
        if ip & 0x80:                                    # local color table
            n = 2 << (ip & 0x07)
            palette = np.frombuffer(data, np.uint8, n * 3,
                                    pos).reshape(n, 3).copy()
            pos += n * 3
        min_code = data[pos]
        pos += 1
        chunks = []
        while data[pos]:
            ln = data[pos]
            chunks.append(data[pos + 1:pos + 1 + ln])
            pos += 1 + ln
        flat = _lzw_decode(b"".join(chunks), min_code, w * h)
        img = flat.reshape(h, w)
        if ip & 0x40:                                    # interlaced
            rows = np.concatenate([np.arange(s, h, step)
                                   for s, step in _INTERLACE])
            out = np.empty_like(img)
            out[rows] = img
            img = out
        if palette is None:
            raise ValueError("GIF: no color table")
        return img.copy(), palette
    raise ValueError("GIF: no image block")
