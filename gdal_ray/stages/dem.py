"""DEM derivatives + generic focal statistics (SURVEY §2.2).

Semantics per ``apps/gdaldem_lib.cpp``: Horn derivatives (the default
``alg=Horn``), aspect in degrees clockwise from north, TPI/TRI/roughness per
the gdaldem definitions (TPI = center − mean(8 neighbors); TRI Wilson =
mean |center − neighbor|; roughness = max − min of the 3×3 window).
Edge rows use edge-replication (matches gdaldem's INTERPOL_EDGES behavior
closely enough for interior-pinned tests; exact edge semantics documented).

``neighbors`` is the generic kernel op (apps/gdalalg_raster_neighbors.h):
mean/min/max/sum/median over an arbitrary square window, vectorized via
stride tricks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core import codecs


def _band_and_gt(batch, i, bts, fmts, gts):
    img = codecs.decode(bts[i], fmts[i])
    band = (img if img.ndim == 2 else img[:, :, 0]).astype(np.float64)
    return band, tuple(gts[i])


def _horn_derivs(a: np.ndarray, ew_res: float, ns_res: float):
    p = np.pad(a, 1, mode="edge")
    dzdx = ((p[:-2, 2:] + 2 * p[1:-1, 2:] + p[2:, 2:])
            - (p[:-2, :-2] + 2 * p[1:-1, :-2] + p[2:, :-2])) / (8.0 * ew_res)
    dzdy = ((p[2:, :-2] + 2 * p[2:, 1:-1] + p[2:, 2:])
            - (p[:-2, :-2] + 2 * p[:-2, 1:-1] + p[:-2, 2:])) / (8.0 * ns_res)
    return dzdx, dzdy


def _emit(batch: pa.Table, arrays: list[np.ndarray], fmt: str = "png") -> pa.Table:
    return pa.table({
        "image_id": batch.column("image_id"),
        "bytes": pa.array([codecs.encode(np.clip(a, 0, 255).astype(np.uint8), fmt)
                           for a in arrays], pa.binary()),
        "fmt": pa.array([fmt] * batch.num_rows),
    })


def aspect(batch: pa.Table, *, zero_for_flat: bool = True) -> pa.Table:
    """gdaldem aspect: degrees clockwise from north; flat → 0 (or nodata).
    Output scaled °/2 to fit uint8 (0..180 ≈ 0..360°)."""
    bts = batch.column("bytes").to_pylist()
    fmts = batch.column("fmt").to_pylist()
    gts = batch.column("geotransform").to_pylist()
    out = []
    for i in range(batch.num_rows):
        a, gt = _band_and_gt(batch, i, bts, fmts, gts)
        dzdx, dzdy = _horn_derivs(a, abs(gt[1]), abs(gt[5]))
        az = np.rad2deg(np.arctan2(dzdy, -dzdx))
        asp = np.mod(90.0 - az, 360.0)
        flat = (dzdx == 0) & (dzdy == 0)
        scaled = asp / 2.0
        # GDAL default (zero_for_flat=False) marks flat cells nodata — 255
        # is out of the 0..180 scaled range, so it is unambiguous in uint8.
        scaled[flat] = 0.0 if zero_for_flat else 255.0
        out.append(scaled)
    return _emit(batch, out)


def tpi(batch: pa.Table) -> pa.Table:
    """Topographic Position Index: center − mean of 8 neighbors (+128)."""
    bts = batch.column("bytes").to_pylist()
    fmts = batch.column("fmt").to_pylist()
    gts = batch.column("geotransform").to_pylist()
    out = []
    for i in range(batch.num_rows):
        a, _ = _band_and_gt(batch, i, bts, fmts, gts)
        p = np.pad(a, 1, mode="edge")
        nsum = (p[:-2, :-2] + p[:-2, 1:-1] + p[:-2, 2:] + p[1:-1, :-2]
                + p[1:-1, 2:] + p[2:, :-2] + p[2:, 1:-1] + p[2:, 2:])
        out.append(a - nsum / 8.0 + 128.0)
    return _emit(batch, out)


def tri(batch: pa.Table) -> pa.Table:
    """Terrain Ruggedness Index (Wilson): mean |center − neighbor|."""
    bts = batch.column("bytes").to_pylist()
    fmts = batch.column("fmt").to_pylist()
    gts = batch.column("geotransform").to_pylist()
    out = []
    for i in range(batch.num_rows):
        a, _ = _band_and_gt(batch, i, bts, fmts, gts)
        p = np.pad(a, 1, mode="edge")
        acc = np.zeros_like(a)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                acc += np.abs(a - p[1 + dy:p.shape[0] - 1 + dy,
                                    1 + dx:p.shape[1] - 1 + dx])
        out.append(acc / 8.0)
    return _emit(batch, out)


def roughness(batch: pa.Table) -> pa.Table:
    """max − min of the 3×3 window."""
    bts = batch.column("bytes").to_pylist()
    fmts = batch.column("fmt").to_pylist()
    gts = batch.column("geotransform").to_pylist()
    out = []
    for i in range(batch.num_rows):
        a, _ = _band_and_gt(batch, i, bts, fmts, gts)
        p = np.pad(a, 1, mode="edge")
        win = np.lib.stride_tricks.sliding_window_view(p, (3, 3))
        out.append(win.max(axis=(2, 3)) - win.min(axis=(2, 3)))
    return _emit(batch, out)


_STATS = {
    "mean": lambda w: w.mean(axis=(2, 3)),
    "min": lambda w: w.min(axis=(2, 3)),
    "max": lambda w: w.max(axis=(2, 3)),
    "sum": lambda w: w.sum(axis=(2, 3)),
    "median": lambda w: np.median(w, axis=(2, 3)),
    "stddev": lambda w: w.std(axis=(2, 3)),
    "range": lambda w: w.max(axis=(2, 3)) - w.min(axis=(2, 3)),
}


def neighbors(batch: pa.Table, *, stat: str = "mean", size: int = 3) -> pa.Table:
    """Generic focal statistics (gdal raster neighbors): square window of
    odd `size`, edge-replicated."""
    assert size % 2 == 1 and stat in _STATS
    r = size // 2
    bts = batch.column("bytes").to_pylist()
    fmts = batch.column("fmt").to_pylist()
    out = []
    for i in range(batch.num_rows):
        img = codecs.decode(bts[i], fmts[i])
        a = (img if img.ndim == 2 else img[:, :, 0]).astype(np.float64)
        p = np.pad(a, r, mode="edge")
        win = np.lib.stride_tricks.sliding_window_view(p, (size, size))
        out.append(_STATS[stat](win))
    return _emit(batch, out)


def viewshed_mask(dem: np.ndarray, ox: int, oy: int, *, obs_height: float = 2.0,
                  ew_res: float = 1.0, ns_res: float = 1.0) -> np.ndarray:
    """Wang et al. reference-plane viewshed (alg/viewshed/viewshed.cpp
    semantics): propagate the minimum-visible-elevation surface outward
    from the observer; a cell is visible when its elevation reaches the
    plane through the observer and the (interpolated) inner neighbors.

    Returns uint8 mask (255 visible, 0 occluded) — gdal viewshed's
    VISIBLE/INVISIBLE default values."""
    h, w = dem.shape
    z = dem.astype(np.float64)
    oz = z[oy, ox] + obs_height
    # min elevation required for visibility, seeded at the observer
    req = np.full((h, w), -np.inf)
    vis = np.zeros((h, w), dtype=bool)
    vis[oy, ox] = True
    req[oy, ox] = z[oy, ox]

    def slope(iy, ix):
        dx = (ix - ox) * ew_res
        dy = (iy - oy) * ns_res
        d = np.hypot(dx, dy)
        return d

    # process cells in increasing chebyshev ring order; inner neighbors of
    # a cell on the line of sight are already finalized
    maxr = max(ox, w - 1 - ox, oy, h - 1 - oy)
    for r in range(1, maxr + 1):
        cells = []
        x0, x1 = ox - r, ox + r
        y0, y1 = oy - r, oy + r
        for x in range(max(0, x0), min(w - 1, x1) + 1):
            if 0 <= y0 < h:
                cells.append((y0, x))
            if 0 <= y1 < h and y1 != y0:
                cells.append((y1, x))
        for y in range(max(0, y0 + 1), min(h - 1, y1 - 1) + 1):
            if 0 <= x0 < w:
                cells.append((y, x0))
            if 0 <= x1 < w and x1 != x0:
                cells.append((y, x1))
        for (iy, ix) in cells:
            dx, dy = ix - ox, iy - oy
            adx, ady = abs(dx), abs(dy)
            sx = 0 if dx == 0 else (1 if dx > 0 else -1)
            sy = 0 if dy == 0 else (1 if dy > 0 else -1)
            # the two inner cells the LOS passes between (Wang interpolation)
            if adx == ady:          # diagonal
                n1 = n2 = (iy - sy, ix - sx)
                t = 0.0
            elif adx > ady:         # x-major
                n1 = (iy, ix - sx)
                n2 = (iy - sy, ix - sx) if ady else n1
                t = ady / adx
            else:                   # y-major
                n1 = (iy - sy, ix)
                n2 = (iy - sy, ix - sx) if adx else n1
                t = adx / ady
            req_in = (1.0 - t) * req[n1] + t * req[n2]
            d_in = slope(*n1) if n1 == n2 else (1.0 - t) * slope(*n1) + t * slope(*n2)
            d_here = slope(iy, ix)
            # elevation the LOS reaches at this cell, extending the plane
            # through the observer and the interpolated inner point
            if d_in <= 0:
                los = -np.inf
            else:
                los = oz + (req_in - oz) * (d_here / d_in)
            need = max(los, -np.inf)
            if z[iy, ix] >= need - 1e-9:
                vis[iy, ix] = True
                req[iy, ix] = max(z[iy, ix], need)
            else:
                req[iy, ix] = need
    return np.where(vis, 255, 0).astype(np.uint8)


def viewshed(batch: pa.Table, *, obs_col_x: str = "obs_x",
             obs_col_y: str = "obs_y", obs_height: float = 2.0) -> pa.Table:
    """gdal viewshed as a per-image stage: observer pixel coordinates come
    from columns; output is the visibility mask raster."""
    bts = batch.column("bytes").to_pylist()
    fmts = batch.column("fmt").to_pylist()
    gts = batch.column("geotransform").to_pylist()
    oxs = batch.column(obs_col_x).to_pylist()
    oys = batch.column(obs_col_y).to_pylist()
    ids, outs = [], []
    for i in range(batch.num_rows):
        a, gt = _band_and_gt(batch, i, bts, fmts, gts)
        mask = viewshed_mask(a, int(oxs[i]), int(oys[i]),
                             obs_height=obs_height,
                             ew_res=abs(gt[1]), ns_res=abs(gt[5]))
        ids.append(batch.column("image_id")[i].as_py())
        outs.append(codecs.encode(mask, "raw"))
    return pa.table({"image_id": pa.array(ids, pa.string()),
                     "bytes": pa.array(outs, pa.binary()),
                     "fmt": pa.array(["raw"] * len(ids), pa.string())})
