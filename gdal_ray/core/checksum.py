"""GDAL-compatible deterministic image checksum.

Behavior pinned to ``alg/gdalchecksum.cpp:48-231`` of the reference:
  - 11-prime rotation {7,11,13,17,19,23,29,31,37,41,43}, prime index advances
    per value scanned in row-major order;
  - value converted to int32 first (floats: +0.5, clamp to ±2147483647,
    floor — GDALCopyWords semantics; non-finite -> INT_MIN);
  - C-style truncated modulo (sign follows dividend);
  - running sum masked & 0xffff (i.e. the result is the sum mod 65536,
    since masking distributes over addition mod 2^16).

Used throughout the reference's autotest as the cheap invariant
(e.g. autotest/utilities/test_gdalalg_raster_tile.py:69).
"""

from __future__ import annotations

import numpy as np

_PRIMES = np.array([7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43], dtype=np.int64)
_INT_MIN = -2147483648


def _to_int32_values(arr: np.ndarray) -> np.ndarray:
    a = np.asarray(arr)
    if np.issubdtype(a.dtype, np.floating):
        v = a.astype(np.float64).ravel()
        out = np.empty(v.shape, dtype=np.int64)
        finite = np.isfinite(v)
        vv = v[finite] + 0.5
        r = np.floor(vv)
        r = np.where(vv < -2147483647.0, -2147483647.0, r)
        r = np.where(vv > 2147483647.0, 2147483647.0, r)
        out[finite] = r.astype(np.int64)
        out[~finite] = _INT_MIN
        return out
    return a.astype(np.int64).ravel()


def checksum(arr: np.ndarray) -> int:
    """Checksum of one band (2-D array), row-major scan. Matches
    GDALChecksumImage(band, 0, 0, w, h)."""
    vals = _to_int32_values(arr)
    idx = np.arange(vals.size, dtype=np.int64) % 11
    # C-truncated modulo: numpy's fmod keeps the dividend's sign.
    mods = np.fmod(vals, _PRIMES[idx])
    return int(np.sum(mods, dtype=np.int64)) % 65536
