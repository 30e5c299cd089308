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


class GeolocTransform:
    """Geolocation-array transform (alg/gdaltransformer.cpp:2569
    GDALCreateGeoLocTransformer / alg/gdalgeoloc.cpp): a (gh, gw) pair of
    arrays gives the geo (x, y) of sample nodes; node j maps to source
    pixel ``pixel_offset + pixel_step * j`` (GEOLOCATION metadata domain).

      forward(px, py): bilinear interpolation in the geoloc arrays;
      inverse(gx, gy): nearest-node seed + Newton iteration on the local
        bilinear Jacobian (the numpy analog of the reference's backmap +
        refinement).
    """

    def __init__(self, geo_x: np.ndarray, geo_y: np.ndarray, *,
                 pixel_offset: float = 0.5, line_offset: float = 0.5,
                 pixel_step: float = 1.0, line_step: float = 1.0):
        self.gx = np.asarray(geo_x, dtype=np.float64)
        self.gy = np.asarray(geo_y, dtype=np.float64)
        assert self.gx.shape == self.gy.shape and self.gx.ndim == 2
        self.px_off = float(pixel_offset)
        self.ln_off = float(line_offset)
        self.px_step = float(pixel_step)
        self.ln_step = float(line_step)

    def _sample(self, fj: np.ndarray, fi: np.ndarray):
        """Bilinear sample of (gx, gy) at fractional node coords (fj, fi)."""
        gh, gw = self.gx.shape
        fj = np.clip(fj, 0.0, gw - 1.0)
        fi = np.clip(fi, 0.0, gh - 1.0)
        j0 = np.clip(np.floor(fj).astype(np.int64), 0, gw - 2) if gw > 1 \
            else np.zeros_like(fj, np.int64)
        i0 = np.clip(np.floor(fi).astype(np.int64), 0, gh - 2) if gh > 1 \
            else np.zeros_like(fi, np.int64)
        tx = fj - j0
        ty = fi - i0
        j1 = np.minimum(j0 + 1, gw - 1)
        i1 = np.minimum(i0 + 1, gh - 1)

        def bil(a):
            return (a[i0, j0] * (1 - tx) * (1 - ty) + a[i0, j1] * tx * (1 - ty)
                    + a[i1, j0] * (1 - tx) * ty + a[i1, j1] * tx * ty)
        return bil(self.gx), bil(self.gy)

    def _node_coords(self, px, py):
        fj = (np.asarray(px, np.float64) - self.px_off) / self.px_step
        fi = (np.asarray(py, np.float64) - self.ln_off) / self.ln_step
        return fj, fi

    def forward(self, px, py):
        fj, fi = self._node_coords(px, py)
        return self._sample(fj, fi)

    def inverse(self, gx, gy, *, iters: int = 12, node_chunk: int = 4096):
        """Geo → pixel/line.  Seed: nearest geoloc node (chunked vectorized
        scan — the backmap analog); refine: Newton on the bilinear surface
        with a finite-difference Jacobian per iteration."""
        shape = np.asarray(gx).shape
        gx = np.asarray(gx, np.float64).ravel()
        gy = np.asarray(gy, np.float64).ravel()
        gh, gw = self.gx.shape
        nodes_x = self.gx.ravel()
        nodes_y = self.gy.ravel()
        best = np.zeros(gx.size, np.int64)
        bestd = np.full(gx.size, np.inf)
        for s in range(0, nodes_x.size, node_chunk):
            e = min(nodes_x.size, s + node_chunk)
            d = (gx[:, None] - nodes_x[None, s:e]) ** 2 \
                + (gy[:, None] - nodes_y[None, s:e]) ** 2
            am = d.argmin(axis=1)
            dv = d[np.arange(gx.size), am]
            upd = dv < bestd
            best[upd] = am[upd] + s
            bestd[upd] = dv[upd]
        fi = (best // gw).astype(np.float64)
        fj = (best % gw).astype(np.float64)
        h = 1e-4
        for _ in range(iters):
            x0, y0 = self._sample(fj, fi)
            rx = gx - x0
            ry = gy - y0
            # finite-difference steps flip to backward at the clip boundary
            # (a clipped forward step would zero the Jacobian there)
            hj = np.where(fj + h > gw - 1.0, -h, h)
            hi = np.where(fi + h > gh - 1.0, -h, h)
            xj, yj = self._sample(fj + hj, fi)
            xi, yi = self._sample(fj, fi + hi)
            a = (xj - x0) / hj
            b = (xi - x0) / hi
            c = (yj - y0) / hj
            d2 = (yi - y0) / hi
            det = a * d2 - b * c
            det = np.where(np.abs(det) < 1e-30, 1e-30, det)
            fj = fj + (d2 * rx - b * ry) / det
            fi = fi + (-c * rx + a * ry) / det
            fj = np.clip(fj, 0.0, gw - 1.0)
            fi = np.clip(fi, 0.0, gh - 1.0)
        return ((self.px_off + fj * self.px_step).reshape(shape),
                (self.ln_off + fi * self.ln_step).reshape(shape))


def geoloc_from_affine(gt, w: int, h: int, step: int = 4):
    """Synthetic geoloc arrays sampling an affine transform at pixel centers
    every `step` pixels (test/fixture helper)."""
    from . import geotransform as gtm
    # node lattice must COVER every pixel center (clipped bilinear would
    # extrapolate as constant past the last node) — overshoot the edge
    nj = int(np.ceil((w - 1.0) / step)) + 1
    ni = int(np.ceil((h - 1.0) / step)) + 1
    js = 0.5 + step * np.arange(nj, dtype=np.float64)
    is_ = 0.5 + step * np.arange(ni, dtype=np.float64)
    JJ, II = np.meshgrid(js, is_)
    gx, gy = gtm.apply(tuple(gt), JJ.ravel(), II.ravel())
    shape = II.shape
    return (np.asarray(gx).reshape(shape), np.asarray(gy).reshape(shape),
            dict(pixel_offset=0.5, line_offset=0.5, pixel_step=float(step),
                 line_step=float(step)))
