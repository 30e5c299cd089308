"""GCP-based georeferencing transforms (pure numpy).

  - ``GCPPolynomialTransform`` — order-1/2/3 2D polynomial fitted to ground
    control points by least squares, forward (pixel→geo) and inverse
    (geo→pixel) fitted independently, matching GDALCreateGCPTransformer
    (alg/gdal_crs.cpp:358 CRS_georef; order selection :383).
  - ``TPSTransform`` — thin-plate spline with kernel U(r) = r²·log(r²) and
    an affine part, one radial system per output coordinate, matching
    GDALCreateTPSTransformer (alg/gdal_tps.cpp:128 / VizGeorefSpline2D).

Both expose ``forward(px, py)`` and ``inverse(gx, gy)`` vectorized over
numpy arrays, so either direction can serve as the ``dst_to_src`` provider
of the mesh warp (stages/warp.py, GDALCreateApproxTransformer shape).
"""

from __future__ import annotations

import numpy as np

_N_TERMS = {1: 3, 2: 6, 3: 10}


def _poly_design(x: np.ndarray, y: np.ndarray, order: int) -> np.ndarray:
    cols = [np.ones_like(x), x, y]
    if order >= 2:
        cols += [x * y, x * x, y * y]
    if order >= 3:
        cols += [x * x * y, x * y * y, x ** 3, y ** 3]
    return np.column_stack(cols)


class GCPPolynomialTransform:
    """gcps: (n, 4) array of (pixel, line, geo_x, geo_y) rows."""

    def __init__(self, gcps: np.ndarray, order: int = 1):
        g = np.asarray(gcps, dtype=np.float64)
        if order not in _N_TERMS:
            raise ValueError("order must be 1, 2 or 3")
        need = _N_TERMS[order]
        if len(g) < need:
            raise ValueError(f"order-{order} needs >= {need} GCPs, got {len(g)}")
        self.order = order
        A = _poly_design(g[:, 0], g[:, 1], order)
        self.fwd_x, *_ = np.linalg.lstsq(A, g[:, 2], rcond=None)
        self.fwd_y, *_ = np.linalg.lstsq(A, g[:, 3], rcond=None)
        B = _poly_design(g[:, 2], g[:, 3], order)
        self.inv_x, *_ = np.linalg.lstsq(B, g[:, 0], rcond=None)
        self.inv_y, *_ = np.linalg.lstsq(B, g[:, 1], rcond=None)

    def forward(self, px, py):
        A = _poly_design(np.asarray(px, np.float64).ravel(),
                         np.asarray(py, np.float64).ravel(), self.order)
        shape = np.asarray(px).shape
        return (A @ self.fwd_x).reshape(shape), (A @ self.fwd_y).reshape(shape)

    def inverse(self, gx, gy):
        B = _poly_design(np.asarray(gx, np.float64).ravel(),
                         np.asarray(gy, np.float64).ravel(), self.order)
        shape = np.asarray(gx).shape
        return (B @ self.inv_x).reshape(shape), (B @ self.inv_y).reshape(shape)


def _tps_kernel(r2: np.ndarray) -> np.ndarray:
    out = np.zeros_like(r2)
    m = r2 > 0
    out[m] = r2[m] * np.log(r2[m])
    return out


class _TpsDirection:
    def __init__(self, src: np.ndarray, dst: np.ndarray):
        n = len(src)
        d2 = ((src[:, None, :] - src[None, :, :]) ** 2).sum(axis=2)
        K = _tps_kernel(d2)
        P = np.column_stack([np.ones(n), src])
        A = np.zeros((n + 3, n + 3))
        A[:n, :n] = K
        A[:n, n:] = P
        A[n:, :n] = P.T
        rhs = np.zeros((n + 3, 2))
        rhs[:n] = dst
        sol = np.linalg.solve(A, rhs)
        self.src = src
        self.w = sol[:n]        # (n, 2) radial weights
        self.a = sol[n:]        # (3, 2) affine part

    def __call__(self, x, y):
        pts = np.column_stack([np.asarray(x, np.float64).ravel(),
                               np.asarray(y, np.float64).ravel()])
        d2 = ((pts[:, None, :] - self.src[None, :, :]) ** 2).sum(axis=2)
        U = _tps_kernel(d2)                     # (m, n)
        aff = np.column_stack([np.ones(len(pts)), pts]) @ self.a  # (m, 2)
        out = aff + U @ self.w
        shape = np.asarray(x).shape
        return out[:, 0].reshape(shape), out[:, 1].reshape(shape)


class TPSTransform:
    """Thin-plate spline GCP transform: exact at every GCP, affine+radial
    elsewhere (alg/gdal_tps.cpp VizGeorefSpline2D semantics)."""

    def __init__(self, gcps: np.ndarray):
        g = np.asarray(gcps, dtype=np.float64)
        if len(g) < 3:
            raise ValueError("TPS needs >= 3 GCPs")
        self._fwd = _TpsDirection(g[:, 0:2], g[:, 2:4])
        self._inv = _TpsDirection(g[:, 2:4], g[:, 0:2])

    def forward(self, px, py):
        return self._fwd(px, py)

    def inverse(self, gx, gy):
        return self._inv(gx, gy)


def gcps_from_affine(gt, w: int, h: int, n: int = 3) -> np.ndarray:
    """n×n grid of synthetic GCPs sampled from an affine geotransform —
    the test/driver harness for warp-by-GCP vs warp-by-gt equivalence."""
    px, py = np.meshgrid(np.linspace(0, w, n), np.linspace(0, h, n))
    gx = gt[0] + px * gt[1] + py * gt[2]
    gy = gt[3] + px * gt[4] + py * gt[5]
    return np.column_stack([px.ravel(), py.ravel(), gx.ravel(), gy.ravel()])
