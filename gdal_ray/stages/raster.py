"""Stateless per-image raster stages (SURVEY §2.2).

Each function is a ``map_batches`` UDF over pyarrow batches of the images
table.  Per-image pixel work is a numpy kernel; the loop over rows in a batch
is unavoidable (images are variable-shaped) but every per-pixel op inside is
vectorized — mirroring the reference where the unit of work is one raster
(apps/gdal_translate_lib.cpp, apps/gdaldem_lib.cpp) and pixel loops are C.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core import codecs
from ..core.checksum import checksum as gdal_checksum
from ..core.resample import resize as resample_resize


def _iter_images(batch: pa.Table):
    bts = batch.column("bytes").to_pylist()
    fmts = batch.column("fmt").to_pylist()
    for i in range(batch.num_rows):
        yield i, codecs.decode(bts[i], fmts[i]), fmts[i]


def decode_stats(batch: pa.Table) -> pa.Table:
    """Per-image band statistics *partials* (count/min/max/sum/sumsq) for the
    classic partial+final pattern (gcore/gdalrasterband.cpp:7126
    ComputeStatistics): final merge is a tiny groupby downstream."""
    out = {"image_id": batch.column("image_id").to_pylist(), "count": [], "vmin": [],
           "vmax": [], "vsum": [], "vsumsq": [], "checksum": []}
    for i, img, _ in _iter_images(batch):
        a = img.astype(np.float64)
        out["count"].append(int(a.size))
        out["vmin"].append(float(a.min()))
        out["vmax"].append(float(a.max()))
        out["vsum"].append(float(a.sum()))
        out["vsumsq"].append(float((a * a).sum()))
        out["checksum"].append(gdal_checksum(img if img.ndim == 2 else img[:, :, 0]))
    return pa.table(out)


def translate(batch: pa.Table, *, scale: tuple | None = None,
              out_size: tuple | None = None, resample: str = "bilinear",
              band: int | None = None, out_fmt: str | None = None,
              srcwin: tuple | None = None,
              profile: str = "cpu") -> pa.Table:
    """gdal_translate semantics (apps/gdal_translate_lib.cpp): band select
    (-b), window crop (-srcwin), resize (-outsize), linear rescale (-scale),
    format convert.  Stateless map_batches.  ``profile="bandwidth"``
    selects the smaller-bytes encode variants (see codecs.encode) — the
    per-sink knob for bandwidth-bound multi-node clusters."""
    ids, outs, ws, hs, fmts = [], [], [], [], []
    caps = batch.column("caption").to_pylist() if "caption" in batch.column_names else None
    for i, img, fmt in _iter_images(batch):
        a = img
        if srcwin is not None:
            x0, y0, xs, ys = srcwin
            a = a[y0:y0 + ys, x0:x0 + xs]
        if band is not None and a.ndim == 3:
            a = a[:, :, band]
        if scale is not None:
            src_min, src_max, dst_min, dst_max = scale
            f = (a.astype(np.float64) - src_min) / max(src_max - src_min, 1e-300)
            a = np.clip(dst_min + f * (dst_max - dst_min), 0, 255).astype(np.uint8)
        if out_size is not None:
            a = resample_resize(a, out_size[0], out_size[1], method=resample)
        nfmt = out_fmt or fmt
        outs.append(codecs.encode(a, nfmt, profile=profile))
        ws.append(a.shape[1]); hs.append(a.shape[0]); fmts.append(nfmt)
        ids.append(batch.column("image_id")[i].as_py())
    cols = {"image_id": ids, "bytes": pa.array(outs, pa.binary()),
            "w": pa.array(ws, pa.int32()), "h": pa.array(hs, pa.int32()),
            "fmt": fmts}
    if caps is not None:
        cols["caption"] = caps  # byte-identical passthrough pin
    return pa.table(cols)


def reclassify_fn(mapping: dict[int, int], default: int | None = None):
    """gdal raster reclassify (apps/gdalalg_raster_reclassify.h): LUT remap."""
    lut = np.arange(256, dtype=np.uint8) if default is None else np.full(256, default, np.uint8)
    for k, v in mapping.items():
        lut[k] = v

    def fn(batch: pa.Table) -> pa.Table:
        outs = []
        for _, img, fmt in _iter_images(batch):
            outs.append(codecs.encode(lut[img], fmt))
        return batch.set_column(batch.column_names.index("bytes"), "bytes",
                                pa.array(outs, pa.binary()))
    return fn


def hillshade(batch: pa.Table, *, z_factor: float = 1.0, azimuth: float = 315.0,
              altitude: float = 45.0) -> pa.Table:
    """Horn-formula hillshade (apps/gdaldem_lib.cpp GDALHillshadeAlg :1016).

    3×3 focal op; images are whole rows so no halo exchange is needed
    (SURVEY §2.2 — one image = one row).  Returns gray images."""
    az = np.deg2rad(azimuth)
    alt = np.deg2rad(altitude)
    ids, outs = [], []
    gts = batch.column("geotransform").to_pylist()
    for i, img, fmt in _iter_images(batch):
        a = (img if img.ndim == 2 else img[:, :, 0]).astype(np.float64)
        gt = gts[i]
        ew_res, ns_res = abs(gt[1]), abs(gt[5])
        p = np.pad(a, 1, mode="edge")
        # Horn derivatives
        dzdx = ((p[:-2, 2:] + 2 * p[1:-1, 2:] + p[2:, 2:])
                - (p[:-2, :-2] + 2 * p[1:-1, :-2] + p[2:, :-2])) / (8.0 * ew_res)
        dzdy = ((p[2:, :-2] + 2 * p[2:, 1:-1] + p[2:, 2:])
                - (p[:-2, :-2] + 2 * p[:-2, 1:-1] + p[:-2, 2:])) / (8.0 * ns_res)
        slope = np.arctan(z_factor * np.hypot(dzdx, dzdy))
        aspect = np.arctan2(dzdy, -dzdx)
        shade = (np.sin(alt) * np.cos(slope)
                 + np.cos(alt) * np.sin(slope) * np.cos(az - np.pi / 2.0 - aspect))
        out = np.clip(1.0 + 254.0 * shade, 1, 255).astype(np.uint8)
        outs.append(codecs.encode(out, "png"))
        ids.append(batch.column("image_id")[i].as_py())
    return pa.table({"image_id": ids, "bytes": pa.array(outs, pa.binary()),
                     "fmt": pa.array(["png"] * len(ids))})


def slope_deg(batch: pa.Table) -> pa.Table:
    """gdaldem slope (Horn) in degrees; emits mean slope per image as a
    cheap numeric signature + full raster bytes."""
    ids, outs, means = [], [], []
    gts = batch.column("geotransform").to_pylist()
    for i, img, fmt in _iter_images(batch):
        a = (img if img.ndim == 2 else img[:, :, 0]).astype(np.float64)
        gt = gts[i]
        p = np.pad(a, 1, mode="edge")
        dzdx = ((p[:-2, 2:] + 2 * p[1:-1, 2:] + p[2:, 2:])
                - (p[:-2, :-2] + 2 * p[1:-1, :-2] + p[2:, :-2])) / (8.0 * abs(gt[1]))
        dzdy = ((p[2:, :-2] + 2 * p[2:, 1:-1] + p[2:, 2:])
                - (p[:-2, :-2] + 2 * p[:-2, 1:-1] + p[:-2, 2:])) / (8.0 * abs(gt[5]))
        sl = np.rad2deg(np.arctan(np.hypot(dzdx, dzdy)))
        outs.append(codecs.encode(np.clip(sl, 0, 255).astype(np.uint8), "png"))
        means.append(float(sl.mean()))
        ids.append(batch.column("image_id")[i].as_py())
    return pa.table({"image_id": ids, "bytes": pa.array(outs, pa.binary()),
                     "mean_slope": pa.array(means, pa.float64())})


def exact_edt(target: np.ndarray, *, max_chunk_px: int = 1 << 22) -> np.ndarray:
    """EXACT Euclidean distance transform of a boolean target mask
    (GDALComputeProximity semantics, alg/gdalproximity.cpp — which
    propagates nearest-target coordinates, i.e. true Euclidean distance).

    Two stages, both vectorized:
      1. per-column 1D distance g[y,x] = min over target rows t in column x
         of |y - t|  (two minimum.accumulate passes);
      2. per-row lower envelope D[y,x] = min_j sqrt((x-j)^2 + g[y,j]^2),
         evaluated as a broadcast min over j, chunked so the (rows, w, w)
         intermediate stays under ``max_chunk_px`` floats.
    O(h·w²) ops — exact, and fast for tile-sized rasters; feed tiles (the
    engine's unit of work), not whole mosaics."""
    t = np.asarray(target, dtype=bool)
    h, w = t.shape
    BIG = np.float64(1e12)
    # stage 1: vertical 1D distances via the run-min trick per column
    idx = np.arange(h, dtype=np.float64)[:, None]
    col = np.where(t, 0.0, BIG)
    # fwd[y] = min_{t<=y} col[t] + (y-t);  bwd[y] = min_{t>=y} col[t] + (t-y)
    fwd = idx + np.minimum.accumulate(col - idx, axis=0)
    bwd = np.minimum.accumulate((col + idx)[::-1], axis=0)[::-1] - idx
    g = np.minimum(fwd, bwd)          # (h, w) vertical distances (or BIG)
    g2 = g * g
    xs = np.arange(w, dtype=np.float64)
    dx2 = (xs[:, None] - xs[None, :]) ** 2          # (w_out, w_src)
    rows_per_chunk = max(1, max_chunk_px // (w * w))
    out = np.empty((h, w), dtype=np.float64)
    for y0 in range(0, h, rows_per_chunk):
        y1 = min(h, y0 + rows_per_chunk)
        # (rows, w_out, w_src) -> min over source column j
        out[y0:y1] = (g2[y0:y1, None, :] + dx2[None, :, :]).min(axis=2)
    return np.sqrt(out)


def proximity_rows(batch: pa.Table, *, target_value: int = 255) -> pa.Table:
    """Per-pixel EXACT proximity rows (image_id, k, dist_mm) —
    dist_mm = floor(euclidean_distance_px * 1000), closed-form checkable."""
    ids, ks, ds = [], [], []
    for i, img, _ in _iter_images(batch):
        a = img if img.ndim == 2 else img[:, :, 0]
        d = exact_edt(a == target_value)
        n = d.size
        ids.extend([batch.column("image_id")[i].as_py()] * n)
        ks.append(np.arange(n, dtype=np.int64))
        ds.append(np.floor(d.ravel() * 1000.0).astype(np.int64))
    return pa.table({"image_id": pa.array(ids, pa.string()),
                     "k": pa.array(np.concatenate(ks) if ks else
                                   np.array([], np.int64)),
                     "dist_mm": pa.array(np.concatenate(ds) if ds else
                                         np.array([], np.int64))})


def proximity(batch: pa.Table, *, target_value: int = 255,
              exact: bool = True) -> pa.Table:
    """GDALComputeProximity (alg/gdalproximity.cpp): per-pixel distance to
    nearest target pixel.  ``exact=True`` (default) computes the true
    Euclidean distance (``exact_edt``); ``exact=False`` keeps the cheaper
    two-pass 3-4 chamfer approximation for very wide rasters."""
    if exact:
        ids, outs = [], []
        for i, img, _ in _iter_images(batch):
            a = img if img.ndim == 2 else img[:, :, 0]
            d = exact_edt(a == target_value)
            outs.append(codecs.encode(np.clip(d, 0, 255).astype(np.uint8), "png"))
            ids.append(batch.column("image_id")[i].as_py())
        return pa.table({"image_id": ids, "bytes": pa.array(outs, pa.binary())})
    ids, outs = [], []
    for i, img, fmt in _iter_images(batch):
        a = img if img.ndim == 2 else img[:, :, 0]
        h, w = a.shape
        INF = 1e9
        SQ2 = np.sqrt(2.0)
        idx = np.arange(w, dtype=np.float64)
        d = np.where(a == target_value, 0.0, INF)

        def _run_min(row):
            # min over j of row_j + |x-j| via two minimum.accumulate passes:
            # fwd_x = min_{j<=x}(row_j + (x-j)); bwd_x = min_{j>=x}(row_j + (j-x))
            fwd = idx + np.minimum.accumulate(row - idx)
            bwd = np.minimum.accumulate((row + idx)[::-1])[::-1] - idx
            return np.minimum(fwd, bwd)

        for y in range(h):  # forward raster pass (rows vectorized)
            if y > 0:
                up = d[y - 1]
                diag = np.minimum(np.r_[INF, up[:-1]], np.r_[up[1:], INF]) + SQ2
                d[y] = np.minimum(d[y], np.minimum(up + 1.0, diag))
            d[y] = _run_min(d[y])
        for y in range(h - 2, -1, -1):  # backward pass
            dn = d[y + 1]
            diag = np.minimum(np.r_[INF, dn[:-1]], np.r_[dn[1:], INF]) + SQ2
            d[y] = _run_min(np.minimum(d[y], np.minimum(dn + 1.0, diag)))
        outs.append(codecs.encode(np.clip(d, 0, 255).astype(np.uint8), "png"))
        ids.append(batch.column("image_id")[i].as_py())
    return pa.table({"image_id": ids, "bytes": pa.array(outs, pa.binary())})
