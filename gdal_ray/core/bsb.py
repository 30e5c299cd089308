"""BSB/KAP nautical raster chart codec — ``frmts/bsb/bsb_read.c`` analog.

ASCII header (``BSB/…RA=w,h``, ``RGB/i,r,g,b`` palette lines) terminated
by ``0x1A 0x00`` + a depth byte, then run-length-coded scanlines: each
line is a base-128 line-number varint, run bytes packing the pixel value
(bits below the 0x80 extension flag) and a mixed-radix run count (first
digit in the low count bits, base-128 extension bytes), and a 0x00
terminator.  Palette index 0 is illegal in the format, so this codec
maps array value v to stored value v+1.  This writer emits REAL runs
(the reference writes one byte per pixel, bsb_read.c:1100 — its comment
cites a long-expired patent); both decode identically.  Georeferencing
(KNP/REF points) is not interpreted.  BSB dialect only (no NOS/NO1 XOR
variant).
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode_bsb", "decode_bsb"]


def _varint(n: int) -> bytes:
    out = []
    if n >= 128 * 128:
        out.append(0x80 | ((n >> 14) & 0x7F))
    if n >= 128:
        out.append(0x80 | ((n >> 7) & 0x7F))
    out.append(n & 0x7F)
    return bytes(out)


def encode_bsb(arr: np.ndarray, palette: np.ndarray) -> bytes:
    """(h, w) uint8 palette indices (< 127) + (n, 3) palette -> .kap
    bytes."""
    arr = np.asarray(arr, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    n = len(pal)
    if n > 127 or int(arr.max(initial=0)) >= n:
        raise ValueError("BSB palettes hold at most 127 usable entries "
                         "(index 0 is reserved by the format)")
    h, w = arr.shape
    depth = 1
    while (1 << depth) < n + 1:
        depth += 1
    shift = 7 - depth
    cmask = (1 << shift) - 1
    hdr = ["! gdal_ray BSB writer", "VER/3.0",
           f"BSB/NA=UNKNOWN,NU=999502,RA={w},{h},DU=254",
           "KNP/SC=25000,GD=WGS84,PR=Mercator"]
    for i in range(n):
        hdr.append(f"RGB/{i + 1},{pal[i, 0]},{pal[i, 1]},{pal[i, 2]}")
    out = bytearray(("\r\n".join(hdr) + "\r\n").encode("ascii"))
    out += bytes([0x1A, 0x00, depth])
    for y in range(h):
        out += _varint(y + 1)                     # VER>=2: 1-based
        row = arr[y].astype(np.int64) + 1
        # run-length: boundaries where value changes
        change = np.flatnonzero(np.diff(row))
        starts = np.concatenate([[0], change + 1])
        lens = np.diff(np.concatenate([starts, [w]]))
        for s, ln in zip(starts, lens):
            v = int(row[s])
            c = int(ln) - 1
            # mixed radix: first digit in the count bits (base cmask+1),
            # extension digits base 128; decode folds nRun = nRun*128+d
            k = 0
            while c >= (cmask + 1) * (128 ** k):
                k += 1
            first_digit = c // (128 ** k)
            rem = c % (128 ** k)
            first = (v << shift) | first_digit
            if k:
                first |= 0x80
            out.append(first)
            for i in range(k - 1, -1, -1):
                d = (rem >> (7 * i)) & 0x7F
                if i != 0:
                    d |= 0x80
                out.append(d)
        out.append(0x00)
    out += bytes([0x1A, 0x00])
    return bytes(out)


def decode_bsb(data: bytes):
    """.kap bytes -> ((h, w) uint8 palette indices, (n, 3) palette)."""
    # header: text until 0x1A 0x00
    end = data.find(b"\x1a\x00")
    if end < 0:
        raise ValueError("BSB: missing 0x1A 0x00 header terminator")
    text = data[:end].decode("ascii", errors="replace")
    w = h = None
    pal_entries: dict[int, tuple[int, int, int]] = {}
    version = 1.0
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("VER/"):
            version = float(line[4:])
        elif line.startswith(("BSB/", "NOS/")) or line.startswith("    "):
            for part in line.split("/", 1)[-1].split(","):
                if part.strip().startswith("RA="):
                    w = int(part.split("=")[1])
                elif w is not None and h is None and "=" not in part:
                    h = int(part)
        elif line.startswith("RGB/"):
            i, r, g, b = (int(v) for v in line[4:].split(","))
            pal_entries[i] = (r, g, b)
    if w is None or h is None:
        raise ValueError("BSB: missing RA=width,height")
    nmax = max(pal_entries) if pal_entries else 1
    pal = np.zeros((nmax, 3), np.uint8)
    for i, rgb in pal_entries.items():
        pal[i - 1] = rgb
    pos = end + 2
    depth = data[pos]
    pos += 1
    shift = 7 - depth
    vmask = ((1 << depth) - 1) << shift
    cmask = (1 << shift) - 1
    arr = np.zeros((h, w), np.uint8)
    row_idx = 0
    while pos < len(data) and row_idx < h:
        if data[pos] == 0x1A:
            break
        # line-number varint
        ln = 0
        while data[pos] & 0x80:
            ln = ln * 128 + (data[pos] & 0x7F)
            pos += 1
        ln = ln * 128 + data[pos]
        pos += 1
        y = ln - 1 if version >= 2.0 else ln
        x = 0
        while pos < len(data) and data[pos] != 0x00:
            b = data[pos]
            pos += 1
            v = (b & vmask) >> shift
            c = b & cmask
            while b & 0x80 and pos < len(data):
                b = data[pos]
                pos += 1
                c = c * 128 + (b & 0x7F)
            cnt = min(c + 1, w - x)
            if 0 <= y < h and v:
                arr[y, x:x + cnt] = v - 1
            x += cnt
        pos += 1                                   # line terminator
        row_idx += 1
    return arr, pal
