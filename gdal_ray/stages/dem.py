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
