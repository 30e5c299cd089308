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


class RPCTransform:
    """Rational Polynomial Coefficient transform (GDALCreateRPCTransformer,
    alg/gdaltransformer.cpp:2527 / gdal_rpc.cpp): the published RPC00B
    model — normalized (lat, lon, height) through four 20-term cubic
    polynomials gives normalized (line, sample); the inverse
    (pixel → ground) iterates an affine-seeded Newton refinement exactly
    like GDALRPCTransform's reverse mode.

    ``coef`` keys: LINE_OFF/SCALE, SAMP_OFF/SCALE, LAT_OFF/SCALE,
    LONG_OFF/SCALE, HEIGHT_OFF/SCALE, LINE_NUM_COEFF (20), LINE_DEN_COEFF,
    SAMP_NUM_COEFF, SAMP_DEN_COEFF — the RPC00B field set."""

    def __init__(self, coef: dict, height: float = 0.0):
        self.c = coef
        self.height = height

    @staticmethod
    def _terms(P, L, H):
        """The 20 RPC00B polynomial terms in specification order."""
        return np.stack([
            np.ones_like(P), L, P, H, L * P, L * H, P * H, L * L, P * P,
            H * H, P * L * H, L ** 3, L * P * P, L * H * H, L * L * P,
            P ** 3, P * H * H, L * L * H, P * P * H, H ** 3], axis=-1)

    def forward(self, lon, lat, height=None):
        """(lon, lat[, h]) → (pixel, line)."""
        c = self.c
        h = self.height if height is None else height
        P = (np.asarray(lat, np.float64) - c["LAT_OFF"]) / c["LAT_SCALE"]
        L = (np.asarray(lon, np.float64) - c["LONG_OFF"]) / c["LONG_SCALE"]
        H = (np.asarray(h, np.float64) - c["HEIGHT_OFF"]) / c["HEIGHT_SCALE"]
        H = np.broadcast_to(H, P.shape)
        t = self._terms(P, L, H)
        line = (t @ np.asarray(c["LINE_NUM_COEFF"])) \
            / (t @ np.asarray(c["LINE_DEN_COEFF"]))
        samp = (t @ np.asarray(c["SAMP_NUM_COEFF"])) \
            / (t @ np.asarray(c["SAMP_DEN_COEFF"]))
        return (samp * c["SAMP_SCALE"] + c["SAMP_OFF"],
                line * c["LINE_SCALE"] + c["LINE_OFF"])

    def inverse(self, px, py, iters: int = 10):
        """(pixel, line) → (lon, lat) at the fixed height — iterative
        refinement with a numerically-differenced local affine, the
        reverse-mode shape of gdal_rpc.cpp."""
        c = self.c
        lon = np.full(np.shape(px), float(c["LONG_OFF"]), np.float64)
        lat = np.full(np.shape(py), float(c["LAT_OFF"]), np.float64)
        px = np.asarray(px, np.float64)
        py = np.asarray(py, np.float64)
        d = 1e-7
        for _ in range(iters):
            fx, fy = self.forward(lon, lat)
            ex, ey = px - fx, py - fy
            if max(np.abs(ex).max(initial=0), np.abs(ey).max(initial=0)) < 1e-9:
                break
            fx1, fy1 = self.forward(lon + d, lat)
            fx2, fy2 = self.forward(lon, lat + d)
            a11, a21 = (fx1 - fx) / d, (fy1 - fy) / d
            a12, a22 = (fx2 - fx) / d, (fy2 - fy) / d
            det = a11 * a22 - a12 * a21
            det = np.where(np.abs(det) < 1e-300, 1e-300, det)
            lon = lon + (a22 * ex - a12 * ey) / det
            lat = lat + (-a21 * ex + a11 * ey) / det
        return lon, lat


def rpc_from_affine(gt, *, lat0: float = 0.0, lon0: float = 0.0) -> dict:
    """Degenerate RPC whose polynomials encode an affine pixel↔geo map —
    the test harness for RPC-vs-affine equivalence (a real RPC00B set from
    a vendor slots straight in)."""
    inv_det = gt[1] * gt[5] - gt[2] * gt[4]
    # pixel = inv(gt) applied to (lon, lat)
    ia = (gt[5] / inv_det, -gt[2] / inv_det,
          -gt[4] / inv_det, gt[1] / inv_det)
    lon_s, lat_s = 10.0, 10.0
    num_s = [0.0] * 20
    num_l = [0.0] * 20
    # samp = ia0*(lon-gt0) + ia1*(lat-gt3); normalized terms: 1, L, P
    num_s[0] = ia[0] * (lon0 + 0 - gt[0]) + ia[1] * (lat0 - gt[3])
    num_s[1] = ia[0] * lon_s
    num_s[2] = ia[1] * lat_s
    num_l[0] = ia[2] * (lon0 - gt[0]) + ia[3] * (lat0 - gt[3])
    num_l[1] = ia[2] * lon_s
    num_l[2] = ia[3] * lat_s
    den = [1.0] + [0.0] * 19
    return {
        "LINE_OFF": 0.0, "LINE_SCALE": 1.0, "SAMP_OFF": 0.0,
        "SAMP_SCALE": 1.0, "LAT_OFF": lat0, "LAT_SCALE": lat_s,
        "LONG_OFF": lon0, "LONG_SCALE": lon_s, "HEIGHT_OFF": 0.0,
        "HEIGHT_SCALE": 1.0, "LINE_NUM_COEFF": num_l,
        "LINE_DEN_COEFF": den, "SAMP_NUM_COEFF": num_s,
        "SAMP_DEN_COEFF": den,
    }
