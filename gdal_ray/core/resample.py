"""Resampling kernels + generic image warp, pure numpy.

Kernel formulas pinned to the reference's ``alg/gdalwarpkernel.cpp``:
  - filter radii {bilinear:1, cubic:2, cubicspline:2, lanczos:3}
    (gdalwarpkernel.cpp:84-100)
  - GWKBilinear :3723 (triangle), GWKCubic :3761 (Catmull-Rom, a=-0.5),
    GWKBSpline :3817 (cubic B-spline), GWKLanczosSinc :3677 (3-lobed sinc)
  - nodata handling: invalid source pixels drop out of the kernel sum and
    the remaining weights renormalize (density weighting); a destination
    pixel with zero valid support gets dst nodata.
  - 'average' is area-weighted, not kernel-based (GWKAverageOrMode :194) —
    separate code path, used for overview/pyramid reduction
    (gcore/overview.cpp average resampler semantics).

The warp driver mirrors the reference's approx-transformer trick
(``GDALCreateApproxTransformer``, alg/gdaltransformer.cpp:4024): transform a
coarse mesh of destination pixel centers through the CRS chain, then
bilinearly interpolate source coordinates for every pixel — O(mesh) expensive
transforms instead of O(pixels).

Pixel coordinate convention: pixel (row i, col j) covers [j, j+1) × [i, i+1)
in pixel space; its center is (j+0.5, i+0.5) — GDAL's convention.
"""

from __future__ import annotations

import numpy as np

RADIUS = {"near": 0, "bilinear": 1, "cubic": 2, "cubicspline": 2, "lanczos": 3}


def kernel_weight(method: str, x: np.ndarray) -> np.ndarray:
    """Filter weight at signed distance x (pixels). Vectorized."""
    ax = np.abs(np.asarray(x, dtype=np.float64))
    if method == "bilinear":
        return np.maximum(0.0, 1.0 - ax)
    if method == "cubic":
        # Catmull-Rom (a = -0.5), GWKCubic
        w = np.where(
            ax <= 1.0,
            ((1.5 * ax - 2.5) * ax) * ax + 1.0,
            np.where(ax < 2.0, ((-0.5 * ax + 2.5) * ax - 4.0) * ax + 2.0, 0.0),
        )
        return w
    if method == "cubicspline":
        # cubic B-spline, GWKBSpline
        return np.where(
            ax <= 1.0,
            (4.0 + ax * ax * (-6.0 + 3.0 * ax)) / 6.0,
            np.where(ax < 2.0, ((2.0 - ax) ** 3) / 6.0, 0.0),
        )
    if method == "lanczos":
        # 3-lobed Lanczos, GWKLanczosSinc
        out = np.zeros_like(ax)
        nz = (ax < 3.0) & (ax > 1e-12)
        pix = np.pi * ax[nz]
        out[nz] = 3.0 * np.sin(pix) * np.sin(pix / 3.0) / (pix * pix)
        out[ax <= 1e-12] = 1.0
        return out
    raise ValueError(f"unknown kernel {method!r}")


def _as_3d(src: np.ndarray) -> np.ndarray:
    return src[:, :, None] if src.ndim == 2 else src


def sample(src: np.ndarray, sx: np.ndarray, sy: np.ndarray, method: str = "bilinear",
           nodata: float | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Sample src (h, w[, bands]) at continuous source coords (sx, sy).

    Returns (values float64 shaped like sx[, bands], valid bool mask).
    Out-of-source coords and all-nodata support -> invalid.
    """
    a = _as_3d(np.asarray(src))
    h, w, nb = a.shape
    shape = np.asarray(sx).shape
    sx = np.asarray(sx, dtype=np.float64).ravel()
    sy = np.asarray(sy, dtype=np.float64).ravel()
    npix = sx.size

    if method == "near":
        ix = np.floor(sx).astype(np.int64)
        iy = np.floor(sy).astype(np.int64)
        valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        ixc = np.clip(ix, 0, w - 1)
        iyc = np.clip(iy, 0, h - 1)
        vals = a[iyc, ixc, :].astype(np.float64)
        if nodata is not None:
            valid &= ~np.all(vals == nodata, axis=-1)
        out = vals.reshape(shape + (nb,))
        return (out[..., 0] if src.ndim == 2 else out), valid.reshape(shape)

    r = RADIUS[method]
    # kernel taps: offsets relative to floor(s - 0.5) cover the 2r pixels
    # whose centers bracket the sample point
    bx = np.floor(sx - 0.5).astype(np.int64)
    by = np.floor(sy - 0.5).astype(np.int64)
    offs = np.arange(-r + 1, r + 1, dtype=np.int64)  # length 2r
    # x taps: (npix, 2r)
    tx = bx[:, None] + offs[None, :]
    ty = by[:, None] + offs[None, :]
    wx = kernel_weight(method, sx[:, None] - (tx.astype(np.float64) + 0.5))
    wy = kernel_weight(method, sy[:, None] - (ty.astype(np.float64) + 0.5))
    in_x = (tx >= 0) & (tx < w)
    in_y = (ty >= 0) & (ty < h)
    txc = np.clip(tx, 0, w - 1)
    tyc = np.clip(ty, 0, h - 1)

    acc = np.zeros((npix, nb), dtype=np.float64)
    wsum = np.zeros(npix, dtype=np.float64)
    for j in range(2 * r):  # rows of the kernel window: 2r gathers of (npix, 2r)
        row_pix = a[tyc[:, j][:, None], txc, :].astype(np.float64)  # (npix, 2r, nb)
        wj = (wy[:, j][:, None] * wx) * (in_y[:, j][:, None] & in_x)
        if nodata is not None:
            pvalid = ~np.all(row_pix == nodata, axis=-1)
            wj = wj * pvalid
        acc += np.einsum("pk,pkb->pb", wj, row_pix)
        wsum += wj.sum(axis=1)
    valid = wsum > 1e-10
    vals = np.zeros((npix, nb), dtype=np.float64)
    vals[valid] = acc[valid] / wsum[valid, None]
    out = vals.reshape(shape + (nb,))
    return (out[..., 0] if src.ndim == 2 else out), valid.reshape(shape)


def dst_to_src_mesh(dst_w: int, dst_h: int, dst_to_src_xy, mesh_step: int = 16):
    """Source pixel coords for every dst pixel center via a coarse mesh.

    ``dst_to_src_xy(px, py) -> (sx, sy)`` transforms arrays of dst pixel
    coords to src pixel coords (the full inverse chain: dst gt -> dst CRS ->
    src CRS -> src gt⁻¹).  With mesh_step > 1, only a (⌈h/step⌉+1)×(⌈w/step⌉+1)
    grid is transformed exactly and the rest is bilinear interpolation —
    the GDALCreateApproxTransformer idea.
    """
    if mesh_step <= 1:
        px, py = np.meshgrid(np.arange(dst_w) + 0.5, np.arange(dst_h) + 0.5)
        return dst_to_src_xy(px, py)
    gx = np.unique(np.concatenate([np.arange(0, dst_w, mesh_step), [dst_w]])).astype(np.float64)
    gy = np.unique(np.concatenate([np.arange(0, dst_h, mesh_step), [dst_h]])).astype(np.float64)
    mx, my = np.meshgrid(gx + 0.5, gy + 0.5)
    msx, msy = dst_to_src_xy(mx, my)
    # bilinear interpolation of the mesh onto all pixel centers
    fx = np.interp(np.arange(dst_w) + 0.5, gx + 0.5, np.arange(gx.size, dtype=np.float64))
    fy = np.interp(np.arange(dst_h) + 0.5, gy + 0.5, np.arange(gy.size, dtype=np.float64))
    ix = np.clip(np.floor(fx).astype(np.int64), 0, gx.size - 2)
    iy = np.clip(np.floor(fy).astype(np.int64), 0, gy.size - 2)
    tx = (fx - ix)[None, :]
    ty = (fy - iy)[:, None]
    def _interp(m):
        m00 = m[np.ix_(iy, ix)]
        m01 = m[np.ix_(iy, ix + 1)]
        m10 = m[np.ix_(iy + 1, ix)]
        m11 = m[np.ix_(iy + 1, ix + 1)]
        return (m00 * (1 - tx) * (1 - ty) + m01 * tx * (1 - ty)
                + m10 * (1 - tx) * ty + m11 * tx * ty)
    return _interp(msx), _interp(msy)


def warp(src: np.ndarray, dst_w: int, dst_h: int, dst_to_src_xy,
         method: str = "bilinear", nodata: float | None = None,
         dst_nodata: float = 0.0, mesh_step: int = 16,
         out_dtype=None) -> np.ndarray:
    """Generic warp: fill a (dst_h, dst_w[, bands]) image by pulling from src.

    Mirrors GDALWarpOperation semantics at per-image granularity (the
    chunking of alg/gdalwarpoperation.cpp:955 is unnecessary — Ray Data block
    sizing plays that role; oversized images are flat_map'd into sub-window
    rows *before* this runs).
    """
    sx, sy = dst_to_src_mesh(dst_w, dst_h, dst_to_src_xy, mesh_step)
    vals, valid = sample(src, sx, sy, method=method, nodata=nodata)
    if out_dtype is None:
        out_dtype = np.asarray(src).dtype
    if np.issubdtype(np.dtype(out_dtype), np.integer):
        info = np.iinfo(out_dtype)
        vals = np.clip(np.floor(vals + 0.5), info.min, info.max)
    out = vals.astype(out_dtype)
    out[~valid] = dst_nodata
    return out


def resize(src: np.ndarray, out_w: int, out_h: int, method: str = "bilinear",
           nodata: float | None = None) -> np.ndarray:
    """Axis-aligned rescale (gdal_translate -outsize / scale_query_to_tile).

    Maps dst pixel centers linearly into src pixel space.
    """
    a = np.asarray(src)
    h, w = a.shape[:2]
    fx = w / float(out_w)
    fy = h / float(out_h)
    if method == "average":
        return _resize_average(a, out_w, out_h, nodata)
    if method in _REDUCE_STATS:
        return resize_reduce(a, out_w, out_h, method, nodata)
    px = (np.arange(out_w) + 0.5) * fx
    py = (np.arange(out_h) + 0.5) * fy
    sx, sy = np.meshgrid(px, py)
    vals, valid = sample(a, sx, sy, method=method, nodata=nodata)
    if np.issubdtype(a.dtype, np.integer):
        info = np.iinfo(a.dtype)
        vals = np.clip(np.floor(vals + 0.5), info.min, info.max)
    out = vals.astype(a.dtype)
    if nodata is not None:
        out[~valid] = nodata
    return out


def _resize_average(a: np.ndarray, out_w: int, out_h: int,
                    nodata: float | None) -> np.ndarray:
    """Area-weighted average resize (GWKAverageOrMode / overview 'average').

    Exact for integer decimation factors; general case uses fractional
    row/col coverage weights (matches GDALResampleChunk_Average semantics).
    """
    x3 = _as_3d(a).astype(np.float64)
    h, w, nb = x3.shape
    # coverage weight matrices Wy (out_h, h), Wx (w, out_w)
    def cover(n_in, n_out):
        f = n_in / n_out
        lo = np.arange(n_out) * f
        hi = lo + f
        i = np.arange(n_in, dtype=np.float64)
        # overlap of [i, i+1) with [lo_k, hi_k)
        ov = np.clip(np.minimum(hi[:, None], i[None, :] + 1.0)
                     - np.maximum(lo[:, None], i[None, :]), 0.0, 1.0)
        return ov  # (n_out, n_in)
    wy = cover(h, out_h)
    wx = cover(w, out_w)
    if nodata is None:
        num = np.einsum("oh,hwb,wx->oxb", wy, x3, wx.T)
        den = np.outer(wy.sum(1), wx.sum(1))
        out = num / den[:, :, None]
    else:
        m = ~np.all(x3 == nodata, axis=-1)
        num = np.einsum("oh,hwb,wx->oxb", wy, x3 * m[:, :, None], wx.T)
        den = np.einsum("oh,hw,wx->ox", wy, m.astype(np.float64), wx.T)
        out = np.full((out_h, out_w, nb), float(nodata), dtype=np.float64)
        ok = den > 1e-10
        out[ok] = num[ok] / den[ok][:, None]
    if np.issubdtype(a.dtype, np.integer):
        info = np.iinfo(a.dtype)
        out = np.clip(np.floor(out + 0.5), info.min, info.max)
    out = out.astype(a.dtype)
    return out[:, :, 0] if a.ndim == 2 else out


def downsample2x(a: np.ndarray, nodata: float | None = None,
                 method: str = "average") -> np.ndarray:
    """2× reduction used by the pyramid overview loop (gcore/overview.cpp)."""
    h, w = a.shape[:2]
    return resize(a, w // 2, h // 2, method=method, nodata=nodata)


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    """PSNR in dB — the lossy re-encode pin (BASELINE: ≥40 dB)."""
    d = np.asarray(a, dtype=np.float64) - np.asarray(b, dtype=np.float64)
    mse = float(np.mean(d * d))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)


_REDUCE_STATS = ("mode", "min", "max", "median", "q1", "q3", "sum", "rms")


def resize_reduce(a: np.ndarray, out_w: int, out_h: int, stat: str,
                  nodata: float | None = None) -> np.ndarray:
    """Non-kernel reduce resamplers (alg/gdalwarper.h:35-69 GRA_Mode/Min/
    Max/Med/Q1/Q3/Sum/RMS; gdalwarpkernel.cpp:194-195 GWKAverageOrMode and
    the sum-preserving GWKSumPreserving):

      - order statistics (min/max/median/q1/q3) and mode are computed over
        every source pixel with positive area overlap of the output cell;
        mode ties break to the SMALLEST value (deterministic, matching the
        first-seen rule under value-sorted scan);
      - ``sum`` is area-weighted and SUM-PRESERVING: the total of the
        output equals the total of the input for any factor;
      - ``rms`` is sqrt of the area-weighted mean of squares.

    Quartiles use the linear-interpolation definition (numpy default), and
    integer outputs round half-up like the kernel path.
    """
    assert stat in _REDUCE_STATS, stat
    x3 = _as_3d(a).astype(np.float64)
    h, w, nb = x3.shape
    fy, fx = h / out_h, w / out_w

    def spans(n_in, n_out, f):
        lo = np.arange(n_out) * f
        hi = lo + f
        i0 = np.floor(lo + 1e-12).astype(np.int64)
        i1 = np.minimum(np.ceil(hi - 1e-12).astype(np.int64), n_in)
        return lo, hi, i0, i1

    ylo, yhi, y0, y1 = spans(h, out_h, fy)
    xlo, xhi, x0, x1 = spans(w, out_w, fx)
    out = np.empty((out_h, out_w, nb), dtype=np.float64)
    for oy in range(out_h):
        rows = slice(y0[oy], y1[oy])
        wy = np.clip(np.minimum(yhi[oy], np.arange(y0[oy], y1[oy]) + 1.0)
                     - np.maximum(ylo[oy], np.arange(y0[oy], y1[oy])), 0.0, None)
        for ox in range(out_w):
            cols = slice(x0[ox], x1[ox])
            wx = np.clip(np.minimum(xhi[ox], np.arange(x0[ox], x1[ox]) + 1.0)
                         - np.maximum(xlo[ox], np.arange(x0[ox], x1[ox])), 0.0, None)
            wgt = np.outer(wy, wx)
            blk = x3[rows, cols]          # (by, bx, nb)
            for b in range(nb):
                v = blk[:, :, b]
                m = wgt > 0
                if nodata is not None:
                    m = m & (v != nodata)
                if not m.any():
                    out[oy, ox, b] = nodata if nodata is not None else 0.0
                    continue
                vv = v[m]
                ww = wgt[m]
                if stat == "min":
                    out[oy, ox, b] = vv.min()
                elif stat == "max":
                    out[oy, ox, b] = vv.max()
                elif stat == "median":
                    out[oy, ox, b] = np.median(vv)
                elif stat == "q1":
                    out[oy, ox, b] = np.percentile(vv, 25)
                elif stat == "q3":
                    out[oy, ox, b] = np.percentile(vv, 75)
                elif stat == "mode":
                    uniq, cnt = np.unique(vv, return_counts=True)
                    out[oy, ox, b] = uniq[np.argmax(cnt)]  # ties → smallest
                elif stat == "sum":
                    out[oy, ox, b] = float((vv * ww).sum())
                else:  # rms
                    out[oy, ox, b] = float(np.sqrt((vv * vv * ww).sum()
                                                   / ww.sum()))
    if np.issubdtype(a.dtype, np.integer):
        info = np.iinfo(a.dtype)
        out = np.clip(np.floor(out + 0.5), info.min, info.max)
    out = out.astype(a.dtype)
    return out[:, :, 0] if a.ndim == 2 else out
