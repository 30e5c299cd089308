"""ENVI raw-binary raster codec — ``frmts/raw/envidataset.cpp`` analog.

An ENVI dataset is a flat binary file plus a small ``.hdr`` text sidecar:
``samples`` (width), ``lines`` (height), ``bands``, ``data type`` (ENVI
code), ``interleave`` (bsq / bil / bip), ``byte order`` (0 = LSB,
1 = MSB), optional ``header offset`` and ``map info``.  The three
interleaves are exactly numpy axis orders of the (bands, lines, samples)
cube: BSQ = (b, l, s), BIL = (l, b, s), BIP = (l, s, b) — encode/decode
are pure transposes + tobytes/frombuffer, zero per-pixel work."""

from __future__ import annotations

import numpy as np

__all__ = ["encode_envi", "decode_envi", "ENVI_DTYPES"]

# envidataset.cpp data-type mapping
ENVI_DTYPES = {1: np.uint8, 2: np.int16, 3: np.int32, 4: np.float32,
               5: np.float64, 12: np.uint16, 13: np.uint32,
               14: np.int64, 15: np.uint64}
_CODES = {np.dtype(v): k for k, v in ENVI_DTYPES.items()}


def encode_envi(arr: np.ndarray, *, interleave: str = "bsq",
                byte_order: int = 0, map_info: str | None = None
                ) -> tuple[bytes, bytes]:
    """(H, W) or (H, W, B) array -> (hdr_bytes, raw_bytes)."""
    a = np.asarray(arr)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, b = a.shape
    code = _CODES.get(a.dtype)
    if code is None:
        raise ValueError(f"ENVI cannot store dtype {a.dtype}")
    cube = np.ascontiguousarray(np.moveaxis(a, 2, 0))  # (b, l, s) = BSQ
    il = interleave.lower()
    if il == "bsq":
        out = cube
    elif il == "bil":
        out = np.ascontiguousarray(cube.transpose(1, 0, 2))  # (l, b, s)
    elif il == "bip":
        out = np.ascontiguousarray(cube.transpose(1, 2, 0))  # (l, s, b)
    else:
        raise ValueError(f"unknown interleave {interleave!r}")
    if byte_order == 1:
        out = out.astype(out.dtype.newbyteorder(">"))
    hdr = ["ENVI",
           f"samples = {w}",
           f"lines = {h}",
           f"bands = {b}",
           "header offset = 0",
           "file type = ENVI Standard",
           f"data type = {code}",
           f"interleave = {il}",
           f"byte order = {int(byte_order)}"]
    if map_info:
        hdr.append(f"map info = {{{map_info}}}")
    return ("\n".join(hdr) + "\n").encode("ascii"), out.tobytes()


def decode_envi(hdr_bytes: bytes, raw: bytes) -> np.ndarray:
    """(.hdr text, raw binary) -> (H, W, B) array (native byte order)."""
    fields: dict[str, str] = {}
    for line in hdr_bytes.decode("ascii", errors="replace").splitlines():
        if "=" in line:
            k, v = line.split("=", 1)
            fields[k.strip().lower()] = v.strip()
    w = int(fields["samples"])
    h = int(fields["lines"])
    b = int(fields.get("bands", "1"))
    code = int(fields["data type"])
    il = fields.get("interleave", "bsq").lower()
    off = int(fields.get("header offset", "0"))
    order = ">" if fields.get("byte order", "0").strip() == "1" else "<"
    dt = np.dtype(ENVI_DTYPES[code]).newbyteorder(order)
    n = w * h * b
    a = np.frombuffer(raw, dtype=dt, count=n, offset=off)
    if il == "bsq":
        cube = a.reshape(b, h, w)
    elif il == "bil":
        cube = a.reshape(h, b, w).transpose(1, 0, 2)
    elif il == "bip":
        cube = a.reshape(h, w, b).transpose(2, 0, 1)
    else:
        raise ValueError(f"unknown interleave {il!r}")
    out = np.moveaxis(cube, 0, 2)
    return np.ascontiguousarray(out).astype(dt.newbyteorder("="))
