"""Hilbert-curve index for spatial write locality.

Semantics of the reference's ``alg/hilbert.cpp:80`` (GDALHilbertCode, used by
``gdal vector sort``, apps/gdalalg_vector_sort.cpp:362): map (x, y) on a
2^order × 2^order grid to the distance along the Hilbert curve.  Standard
public xy->d algorithm (Hamilton's / Wikipedia formulation), vectorized.
"""

from __future__ import annotations

import numpy as np


def hilbert_d(x, y, order: int = 16) -> np.ndarray:
    """Vectorized (x, y) -> Hilbert distance on a 2^order grid."""
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    d = np.zeros_like(x)
    s = np.int64(1) << (order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = x[flip]
        y_f = y[flip]
        x[flip] = s - 1 - x_f
        y[flip] = s - 1 - y_f
        xs = x[swap].copy()
        x[swap] = y[swap]
        y[swap] = xs
        s >>= 1
    return d


def hilbert_key_lonlat(lon, lat, order: int = 16) -> np.ndarray:
    """Lon/lat -> Hilbert key (for ordered tile/feature sinks)."""
    n = np.int64(1) << order
    gx = np.clip(((np.asarray(lon) + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
    gy = np.clip(((np.asarray(lat) + 90.0) / 180.0 * n).astype(np.int64), 0, n - 1)
    return hilbert_d(gx, gy, order)
