"""Affine geotransform — semantics of ``gcore/gdal_geotransform.h:47-62``.

GDAL order: gt = (xorig, xscale, xrot, yorig, yrot, yscale);
(pixel, line) -> (geoX, geoY):
    X = gt[0] + pixel*gt[1] + line*gt[2]
    Y = gt[3] + pixel*gt[4] + line*gt[5]
(``GDALGeoTransform::Apply`` at gdal_geotransform.h:150-153).
"""

from __future__ import annotations

import numpy as np


def apply(gt, px, py):
    """(pixel, line) -> (geoX, geoY). Vectorized."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    x = gt[0] + px * gt[1] + py * gt[2]
    y = gt[3] + px * gt[4] + py * gt[5]
    return x, y


def invert(gt):
    """Inverse geotransform (semantics of GDALInvGeoTransform,
    alg/gdaltransformer.cpp). Returns gt' with apply(gt', X, Y) = (px, py)."""
    det = gt[1] * gt[5] - gt[2] * gt[4]
    if det == 0.0:
        raise ValueError("non-invertible geotransform")
    inv_det = 1.0 / det
    # 2x2 inverse of [[g1, g2], [g4, g5]]
    i1 = gt[5] * inv_det
    i2 = -gt[2] * inv_det
    i4 = -gt[4] * inv_det
    i5 = gt[1] * inv_det
    i0 = -gt[0] * i1 - gt[3] * i2
    i3 = -gt[0] * i4 - gt[3] * i5
    return (i0, i1, i2, i3, i4, i5)


def pixel_to_geo(gt, px, py):
    return apply(gt, px, py)


def geo_to_pixel(gt, x, y):
    return apply(invert(gt), x, y)


def bounds(gt, w: int, h: int):
    """Geo bbox of a w×h raster: transform the 4 corners (handles rotation)."""
    cx = np.array([0.0, w, 0.0, w])
    cy = np.array([0.0, 0.0, h, h])
    x, y = apply(gt, cx, cy)
    return float(x.min()), float(y.min()), float(x.max()), float(y.max())


def north_up(x0: float, y0: float, xres: float, yres: float):
    """Standard north-up gt: origin top-left, yres negative."""
    return (x0, xres, 0.0, y0, 0.0, -abs(yres))
