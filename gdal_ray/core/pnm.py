"""NetPBM PGM/PPM codec — ``frmts/pnm/pnmdataset.cpp`` analog.

The reference driver reads/writes binary ``P5`` (grayscale) and ``P6``
(RGB) with maxval up to 65535 (16-bit samples stored BIG-endian per the
spec); the ASCII variants ``P2``/``P3`` are read-only here for breadth.
Header tokens may be separated by any whitespace and ``#`` comments run
to end-of-line (pnmdataset.cpp header scan).

Decode returns ``(h, w)`` or ``(h, w, 3)`` uint8 (maxval ≤ 255) or
uint16 arrays; encode accepts the same shapes/dtypes.
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode_pnm", "decode_pnm"]


def encode_pnm(arr: np.ndarray) -> bytes:
    """uint8/uint16 (h,w) -> P5, (h,w,3) -> P6.  16-bit is big-endian."""
    arr = np.asarray(arr)
    if arr.dtype == np.uint8:
        maxval = 255
    elif arr.dtype == np.uint16:
        maxval = 65535
        arr = arr.astype(">u2")
    else:
        raise ValueError("PNM writer: uint8/uint16 only")
    if arr.ndim == 2:
        magic = b"P5"
        h, w = arr.shape
    elif arr.ndim == 3 and arr.shape[2] == 3:
        magic = b"P6"
        h, w = arr.shape[:2]
    else:
        raise ValueError("PNM writer: (h,w) gray or (h,w,3) RGB")
    return magic + f"\n{w} {h}\n{maxval}\n".encode("ascii") + arr.tobytes()


def _header_tokens(data: bytes, count: int):
    """Scan `count` whitespace-separated tokens after the magic,
    skipping # comments; returns (tokens, offset_past_last_whitespace)."""
    toks = []
    i = 2
    n = len(data)
    while len(toks) < count and i < n:
        c = data[i]
        if c in b"#":
            while i < n and data[i] not in b"\r\n":
                i += 1
        elif c in b" \t\r\n":
            i += 1
        else:
            j = i
            while j < n and data[j] not in b" \t\r\n#":
                j += 1
            toks.append(data[i:j])
            i = j
    if len(toks) < count:
        raise ValueError("PNM: truncated header")
    return toks, i + 1          # exactly ONE whitespace byte after maxval


def decode_pnm(data: bytes) -> np.ndarray:
    magic = data[:2]
    if magic not in (b"P2", b"P3", b"P5", b"P6"):
        raise ValueError("PNM: only P2/P3/P5/P6 supported")
    toks, pos = _header_tokens(data, 3)
    w, h, maxval = (int(t) for t in toks)
    bands = 3 if magic in (b"P3", b"P6") else 1
    count = w * h * bands
    if magic in (b"P2", b"P3"):
        vals = np.array(data[pos - 1:].split()[:count], dtype=np.int64)
        if len(vals) != count:
            raise ValueError("PNM: truncated ASCII body")
        arr = vals.astype(np.uint8 if maxval <= 255 else np.uint16)
    else:
        dt = np.uint8 if maxval <= 255 else np.dtype(">u2")
        arr = np.frombuffer(data, dt, count, pos).astype(
            np.uint8 if maxval <= 255 else np.uint16)
    return arr.reshape(h, w) if bands == 1 else arr.reshape(h, w, 3)
