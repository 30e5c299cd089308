"""Second batch of per-image raster stages (SURVEY §2.2/§2.14):
calc, sieve, fill-nodata, clean-collar (nearblack), pansharpen, color-map.

All stateless ``map_batches`` UDFs over the images table; per-pixel work is
vectorized numpy.  Reference semantics cited per function.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core import codecs

# safe expression namespace for `raster calc` (the reference evaluates
# muparser / numpy expressions: apps/gdalalg_raster_calc.cpp, gdal_calc.py
# :627 — same contract: the expression IS the UDF)
_CALC_NS = {
    "abs": np.abs, "sqrt": np.sqrt, "log": np.log, "log10": np.log10,
    "exp": np.exp, "sin": np.sin, "cos": np.cos, "tan": np.tan,
    "minimum": np.minimum, "maximum": np.maximum, "where": np.where,
    "clip": np.clip, "floor": np.floor, "ceil": np.ceil, "pi": np.pi,
}


def calc(batch: pa.Table, expr: str, out_fmt: str = "png") -> pa.Table:
    """Band algebra: evaluate `expr` over bands A, B, C (float64), clip to
    uint8.  E.g. ``"(A + B) / 2"`` or ``"where(A > 128, 255, 0)"``."""
    code = compile(expr, "<calc>", "eval")
    ids, outs = [], []
    bts = batch.column("bytes").to_pylist()
    fmts = batch.column("fmt").to_pylist()
    for i in range(batch.num_rows):
        img = codecs.decode(bts[i], fmts[i])
        if img.ndim == 2:
            bands = {"A": img.astype(np.float64)}
            bands["B"] = bands["C"] = bands["A"]
        else:
            bands = {n: img[:, :, j].astype(np.float64)
                     for j, n in enumerate("ABC"[:img.shape[2]])}
            for n in "ABC":
                bands.setdefault(n, bands["A"])
        res = eval(code, {"__builtins__": {}}, {**_CALC_NS, **bands})
        outs.append(codecs.encode(np.clip(res, 0, 255).astype(np.uint8), out_fmt))
        ids.append(batch.column("image_id")[i].as_py())
    return pa.table({"image_id": ids, "bytes": pa.array(outs, pa.binary()),
                     "fmt": [out_fmt] * len(ids)})


def sieve(batch: pa.Table, threshold: int = 4, connect8: bool = False) -> pa.Table:
    """GDALSieveFilter (alg/gdalsievefilter.cpp): components smaller than
    `threshold` pixels are merged into their largest neighboring component
    (reference merges into the neighbor with the longest shared boundary;
    we use the largest-by-area 4-neighbor — same fixture outcomes for
    blob-like noise)."""
    from ..pipelines.polygonize import label_components
    ids, outs = [], []
    bts = batch.column("bytes").to_pylist()
    fmts = batch.column("fmt").to_pylist()
    for i in range(batch.num_rows):
        img = codecs.decode(bts[i], fmts[i])
        band = (img if img.ndim == 2 else img[:, :, 0]).copy()
        lab = label_components(band.astype(np.int32), connect8)
        flat = lab.ravel()
        uniq, counts = np.unique(flat, return_counts=True)
        sizes = dict(zip(uniq.tolist(), counts.tolist()))
        small = [u for u, c in zip(uniq, counts) if c < threshold]
        for root in small:
            mask = lab == root
            # neighbor labels via dilation difference
            ny, nx = np.nonzero(mask)
            neigh = set()
            h, w = band.shape
            for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                yy = np.clip(ny + dy, 0, h - 1)
                xx = np.clip(nx + dx, 0, w - 1)
                neigh.update(lab[yy, xx].tolist())
            neigh.discard(int(root))
            if not neigh:
                continue
            target = max(neigh, key=lambda u: sizes.get(u, 0))
            ty, tx = np.nonzero(lab == target)
            band[mask] = band[ty[0], tx[0]]
        outs.append(codecs.encode(band, "png"))
        ids.append(batch.column("image_id")[i].as_py())
    return pa.table({"image_id": ids, "bytes": pa.array(outs, pa.binary()),
                     "fmt": ["png"] * len(ids)})


def fill_nodata(batch: pa.Table, max_iter: int = 64) -> pa.Table:
    """GDALFillNodata (alg/rasterfill.cpp): inpaint nodata regions from the
    valid edge inward.  Iterative neighbor-mean diffusion from valid pixels
    (the reference uses inverse-distance from edges; both converge to
    smooth interpolants, tests pin the constant/gradient cases exactly)."""
    ids, outs = [], []
    bts = batch.column("bytes").to_pylist()
    fmts = batch.column("fmt").to_pylist()
    nods = (batch.column("nodata").to_pylist() if "nodata" in batch.column_names
            else [0.0] * batch.num_rows)
    for i in range(batch.num_rows):
        img = codecs.decode(bts[i], fmts[i])
        band = (img if img.ndim == 2 else img[:, :, 0]).astype(np.float64)
        nod = nods[i] if nods[i] is not None else 0.0
        invalid = band == nod
        a = band.copy()
        a[invalid] = np.nan
        it = 0
        while np.isnan(a).any() and it < max_iter:
            p = np.pad(a, 1, mode="edge")
            stack = np.stack([p[:-2, 1:-1], p[2:, 1:-1], p[1:-1, :-2], p[1:-1, 2:]])
            with np.errstate(invalid="ignore"):
                m = np.nanmean(stack, axis=0)
            fill = np.isnan(a) & ~np.isnan(m)
            a[fill] = m[fill]
            it += 1
        a = np.nan_to_num(a, nan=nod)
        outs.append(codecs.encode(np.clip(a, 0, 255).astype(np.uint8), "png"))
        ids.append(batch.column("image_id")[i].as_py())
    return pa.table({"image_id": ids, "bytes": pa.array(outs, pa.binary()),
                     "fmt": ["png"] * len(ids)})


def clean_collar(batch: pa.Table, threshold: int = 15, color: str = "black") -> pa.Table:
    """nearblack / gdal raster clean-collar (apps/nearblack_lib.cpp):
    flood-fill near-black (or near-white) collars from the image edges and
    set them to exact black/white.  Vectorized BFS frontier propagation."""
    near_val = 0 if color == "black" else 255
    ids, outs, cleaned = [], [], []
    bts = batch.column("bytes").to_pylist()
    fmts = batch.column("fmt").to_pylist()
    for i in range(batch.num_rows):
        img = codecs.decode(bts[i], fmts[i])
        band = (img if img.ndim == 2 else img[:, :, 0]).copy()
        near = np.abs(band.astype(np.int32) - near_val) <= threshold
        collar = np.zeros_like(near)
        collar[0, :] = near[0, :]; collar[-1, :] = near[-1, :]
        collar[:, 0] |= near[:, 0]; collar[:, -1] |= near[:, -1]
        while True:
            p = np.pad(collar, 1)
            grown = (p[:-2, 1:-1] | p[2:, 1:-1] | p[1:-1, :-2] | p[1:-1, 2:]) & near
            new = grown | collar
            if np.array_equal(new, collar):
                break
            collar = new
        band[collar] = near_val
        outs.append(codecs.encode(band, "png"))
        cleaned.append(int(collar.sum()))
        ids.append(batch.column("image_id")[i].as_py())
    return pa.table({"image_id": ids, "bytes": pa.array(outs, pa.binary()),
                     "collar_px": pa.array(cleaned, pa.int64())})


def pansharpen(batch: pa.Table, pan_col: str = "pan_bytes",
               weights=(1 / 3, 1 / 3, 1 / 3)) -> pa.Table:
    """Weighted-Brovey pansharpening (alg/gdalpansharpen.cpp):
    out_b = rgb_b * pan / pseudo_pan, pseudo_pan = Σ w_b · rgb_b.
    Expects rows carrying both an RGB payload (`bytes`) and an upsampled
    pan band (`pan_bytes`, raw, same size)."""
    ids, outs = [], []
    bts = batch.column("bytes").to_pylist()
    fmts = batch.column("fmt").to_pylist()
    pans = batch.column(pan_col).to_pylist()
    w = np.asarray(weights, dtype=np.float64)
    for i in range(batch.num_rows):
        rgb = codecs.decode(bts[i], fmts[i]).astype(np.float64)
        if rgb.ndim == 2:
            rgb = np.stack([rgb] * 3, axis=-1)
        pan = codecs.decode_raw(pans[i]).astype(np.float64)
        pseudo = (rgb * w[None, None, :]).sum(axis=2)
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = np.where(pseudo > 0, pan / pseudo, 0.0)
        out = np.clip(rgb * ratio[:, :, None], 0, 255).astype(np.uint8)
        outs.append(codecs.encode(out, "png"))
        ids.append(batch.column("image_id")[i].as_py())
    return pa.table({"image_id": ids, "bytes": pa.array(outs, pa.binary()),
                     "fmt": ["png"] * len(ids)})


def color_map(batch: pa.Table, ramp=((0, (0, 0, 255)), (128, (0, 255, 0)),
                                     (255, (255, 0, 0)))) -> pa.Table:
    """gdal raster color-map / color-relief (apps/gdaldem_lib.cpp
    color-relief): gray value → interpolated RGB ramp (a 256-entry LUT,
    applied vectorized)."""
    xs = np.array([r[0] for r in ramp], dtype=np.float64)
    cs = np.array([r[1] for r in ramp], dtype=np.float64)
    lut = np.stack([np.interp(np.arange(256), xs, cs[:, c]) for c in range(3)],
                   axis=1).astype(np.uint8)
    ids, outs = [], []
    bts = batch.column("bytes").to_pylist()
    fmts = batch.column("fmt").to_pylist()
    for i in range(batch.num_rows):
        img = codecs.decode(bts[i], fmts[i])
        band = img if img.ndim == 2 else img[:, :, 0]
        outs.append(codecs.encode(lut[band], "png"))
        ids.append(batch.column("image_id")[i].as_py())
    return pa.table({"image_id": ids, "bytes": pa.array(outs, pa.binary()),
                     "fmt": ["png"] * len(ids)})


def nodata_to_alpha(batch: pa.Table) -> pa.Table:
    """gdal raster nodata-to-alpha (apps/gdalalg_raster_blend.h area):
    nodata pixels become alpha=0, everything else alpha=255; output RGBA
    raw/png."""
    ids, outs, fmts_o = [], [], []
    bts = batch.column("bytes").to_pylist()
    fmts = batch.column("fmt").to_pylist()
    nods = (batch.column("nodata").to_pylist()
            if "nodata" in batch.column_names else [None] * batch.num_rows)
    for i in range(batch.num_rows):
        img = codecs.decode(bts[i], fmts[i])
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        rgb = img[:, :, :3]
        nd = nods[i]
        if nd is None:
            alpha = np.full(rgb.shape[:2], 255, np.uint8)
        else:
            alpha = np.where((rgb == nd).all(axis=2), 0, 255).astype(np.uint8)
        rgba = np.concatenate([rgb, alpha[:, :, None]], axis=2)
        ids.append(batch.column("image_id")[i].as_py())
        outs.append(codecs.encode_png(rgba))
        fmts_o.append("png")
    return pa.table({"image_id": ids, "bytes": pa.array(outs, pa.binary()),
                     "fmt": pa.array(fmts_o, pa.string())})


def blend(batch: pa.Table, overlay_col: str = "overlay_bytes",
          overlay_fmt_col: str = "overlay_fmt",
          opacity: float = 0.5) -> pa.Table:
    """gdal raster blend (apps/gdalalg_raster_blend.h:77): alpha-composite
    an overlay onto each base image (source-over with constant opacity;
    per-pixel overlay alpha honored when present)."""
    ids, outs = [], []
    bts = batch.column("bytes").to_pylist()
    fmts = batch.column("fmt").to_pylist()
    obts = batch.column(overlay_col).to_pylist()
    ofmts = batch.column(overlay_fmt_col).to_pylist()
    for i in range(batch.num_rows):
        base = codecs.decode(bts[i], fmts[i])
        over = codecs.decode(obts[i], ofmts[i])
        if base.ndim == 2:
            base = np.stack([base] * 3, axis=-1)
        base = base[:, :, :3].astype(np.float64)
        if over.ndim == 2:
            over = np.stack([over] * 3, axis=-1)
        if over.shape[2] == 4:
            oa = over[:, :, 3:4].astype(np.float64) / 255.0 * opacity
        else:
            oa = np.full(over.shape[:2] + (1,), opacity)
        orgb = over[:, :, :3].astype(np.float64)
        out = orgb * oa + base * (1.0 - oa)
        ids.append(batch.column("image_id")[i].as_py())
        outs.append(codecs.encode_png(
            np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)))
    return pa.table({"image_id": ids, "bytes": pa.array(outs, pa.binary()),
                     "fmt": pa.array(["png"] * len(ids), pa.string())})


def raster_update(batch: pa.Table, patch_col: str = "patch_bytes",
                  patch_fmt_col: str = "patch_fmt",
                  patch_x_col: str = "patch_x", patch_y_col: str = "patch_y",
                  ) -> pa.Table:
    """gdal raster update (apps/gdalalg_raster_update.cpp): write a patch
    raster into the base at a pixel offset (last-write-wins in-place
    update, the existing-dataset mosaic path)."""
    ids, outs, fmts_o = [], [], []
    bts = batch.column("bytes").to_pylist()
    fmts = batch.column("fmt").to_pylist()
    pbts = batch.column(patch_col).to_pylist()
    pfmts = batch.column(patch_fmt_col).to_pylist()
    pxs = batch.column(patch_x_col).to_pylist()
    pys = batch.column(patch_y_col).to_pylist()
    for i in range(batch.num_rows):
        base = codecs.decode(bts[i], fmts[i]).copy()
        patch = codecs.decode(pbts[i], pfmts[i])
        if base.ndim != patch.ndim:
            if base.ndim == 2:
                base = np.stack([base] * 3, axis=-1)
            if patch.ndim == 2:
                patch = np.stack([patch] * base.shape[2], axis=-1)
        x0, y0 = int(pxs[i]), int(pys[i])
        h, w = base.shape[:2]
        ph, pw = patch.shape[:2]
        sx0, sy0 = max(0, -x0), max(0, -y0)
        dx0, dy0 = max(0, x0), max(0, y0)
        cw = min(pw - sx0, w - dx0)
        ch = min(ph - sy0, h - dy0)
        if cw > 0 and ch > 0:
            base[dy0:dy0 + ch, dx0:dx0 + cw] = patch[sy0:sy0 + ch, sx0:sx0 + cw]
        ids.append(batch.column("image_id")[i].as_py())
        outs.append(codecs.encode(np.ascontiguousarray(base), "raw"))
        fmts_o.append("raw")
    return pa.table({"image_id": ids, "bytes": pa.array(outs, pa.binary()),
                     "fmt": pa.array(fmts_o, pa.string())})


def fill_nodata_idw(batch: pa.Table, *, max_distance: int = 100,
                    smoothing_iterations: int = 0) -> pa.Table:
    """GDALFillNodata edge-IDW semantics (alg/rasterfill.cpp): for every
    nodata pixel, find the nearest valid pixel along each of the four
    raster directions (left/right/up/down, the reference's directional
    search) within ``max_distance``, combine them inverse-distance
    weighted (w = 1/d²), then run optional 3×3 smoothing passes over the
    FILLED pixels only.  Fully vectorized — the directional scans are
    running last-valid-index accumulations, no per-pixel loop."""
    def _dir_scan(a: np.ndarray, valid: np.ndarray):
        """Distance to and value of the nearest valid pixel to the LEFT."""
        h, w = a.shape
        cols = np.arange(w)[None, :]
        idx = np.where(valid, cols, -1)
        last = np.maximum.accumulate(idx, axis=1)
        dist = np.where(last >= 0, cols - last, 1 << 30).astype(np.float64)
        vals = a[np.arange(h)[:, None], np.clip(last, 0, w - 1)]
        return dist, vals

    ids, outs = [], []
    bts = batch.column("bytes").to_pylist()
    fmts = batch.column("fmt").to_pylist()
    nods = (batch.column("nodata").to_pylist() if "nodata" in batch.column_names
            else [0.0] * batch.num_rows)
    for i in range(batch.num_rows):
        img = codecs.decode(bts[i], fmts[i])
        band = (img if img.ndim == 2 else img[:, :, 0]).astype(np.float64)
        nod = nods[i] if nods[i] is not None else 0.0
        valid = band != nod
        ws = np.zeros_like(band)
        acc = np.zeros_like(band)
        views = [
            (band, valid, lambda d, v: (d, v)),                          # left
            (band[:, ::-1], valid[:, ::-1],
             lambda d, v: (d[:, ::-1], v[:, ::-1])),                     # right
            (band.T, valid.T, lambda d, v: (d.T, v.T)),                  # up
            (band.T[:, ::-1], valid.T[:, ::-1],
             lambda d, v: (d[:, ::-1].T, v[:, ::-1].T)),                 # down
        ]
        for a_v, m_v, undo in views:
            d, v = _dir_scan(np.ascontiguousarray(a_v),
                             np.ascontiguousarray(m_v))
            d, v = undo(d, v)
            ok = (d > 0) & (d <= max_distance)
            w_ = np.where(ok, 1.0 / np.maximum(d, 1) ** 2, 0.0)
            ws += w_
            acc += w_ * np.where(ok, v, 0.0)
        filled = band.copy()
        fill_mask = ~valid & (ws > 0)
        filled[fill_mask] = acc[fill_mask] / ws[fill_mask]
        for _ in range(smoothing_iterations):
            p = np.pad(filled, 1, mode="edge")
            mean9 = (p[:-2, :-2] + p[:-2, 1:-1] + p[:-2, 2:]
                     + p[1:-1, :-2] + p[1:-1, 1:-1] + p[1:-1, 2:]
                     + p[2:, :-2] + p[2:, 1:-1] + p[2:, 2:]) / 9.0
            filled[fill_mask] = mean9[fill_mask]
        outs.append(codecs.encode(
            np.clip(np.round(filled), 0, 255).astype(np.uint8), "png"))
        ids.append(batch.column("image_id")[i].as_py())
    return pa.table({"image_id": ids, "bytes": pa.array(outs, pa.binary()),
                     "fmt": ["png"] * len(ids)})


def compare_images(batch: pa.Table) -> pa.Table:
    """gdalcompare analog (autotest/gdalcompare.py, `gdal raster compare`):
    golden vs test payload per row → structural checks (dims/bands/dtype),
    per-image GDAL 11-prime checksum of band 1 on both sides, count of
    differing pixels, max absolute difference and PSNR (None when
    identical — gdalcompare reports 'Images are identical').

    Batch contract: image_id, bytes_golden/fmt_golden, bytes_test/fmt_test.
    Stateless map_batches; per-pixel work is vectorized numpy.
    """
    from ..core.checksum import checksum as gdal_checksum
    from ..core.resample import psnr as _psnr

    out = {"image_id": batch.column("image_id").to_pylist(),
           "same_dims": [], "same_bands": [], "same_dtype": [],
           "checksum_golden": [], "checksum_test": [],
           "n_diff_pixels": [], "max_abs_diff": [], "psnr": []}
    bg = batch.column("bytes_golden").to_pylist()
    fg = batch.column("fmt_golden").to_pylist()
    bt = batch.column("bytes_test").to_pylist()
    ft = batch.column("fmt_test").to_pylist()
    for i in range(batch.num_rows):
        g = codecs.decode(bg[i], fg[i])
        t = codecs.decode(bt[i], ft[i])
        gb = 1 if g.ndim == 2 else g.shape[2]
        tb = 1 if t.ndim == 2 else t.shape[2]
        out["same_dims"].append(g.shape[:2] == t.shape[:2])
        out["same_bands"].append(gb == tb)
        out["same_dtype"].append(g.dtype == t.dtype)
        out["checksum_golden"].append(
            gdal_checksum(g if g.ndim == 2 else g[:, :, 0]))
        out["checksum_test"].append(
            gdal_checksum(t if t.ndim == 2 else t[:, :, 0]))
        if g.shape != t.shape:
            out["n_diff_pixels"].append(-1)      # not comparable pixel-wise
            out["max_abs_diff"].append(None)
            out["psnr"].append(None)
            continue
        d = np.abs(g.astype(np.float64) - t.astype(np.float64))
        nd = int(np.count_nonzero(d.reshape(d.shape[0], d.shape[1], -1)
                                  .max(axis=2)))
        out["n_diff_pixels"].append(nd)
        out["max_abs_diff"].append(float(d.max()))
        out["psnr"].append(None if nd == 0 else float(_psnr(
            g.astype(np.float64), t.astype(np.float64),
            peak=65535.0 if g.dtype == np.uint16 else 255.0)))
    return pa.table({
        "image_id": out["image_id"],
        "same_dims": pa.array(out["same_dims"], pa.bool_()),
        "same_bands": pa.array(out["same_bands"], pa.bool_()),
        "same_dtype": pa.array(out["same_dtype"], pa.bool_()),
        "checksum_golden": pa.array(out["checksum_golden"], pa.int64()),
        "checksum_test": pa.array(out["checksum_test"], pa.int64()),
        "n_diff_pixels": pa.array(out["n_diff_pixels"], pa.int64()),
        "max_abs_diff": pa.array(out["max_abs_diff"], pa.float64()),
        "psnr": pa.array(out["psnr"], pa.float64()),
    })


def cutline_mask(arr: np.ndarray, gt, polygons, *, nodata=0,
                 invert: bool = False) -> np.ndarray:
    """gdalwarp ``-cutline`` analog (``alg/gdalwarper.cpp``
    GDALWarpCutlineMasker): pixels whose CENTERS fall outside the cutline
    polygon set are replaced with ``nodata`` (``invert=True`` blanks the
    inside instead — gdal_rasterize -i convention).  Even-odd ring parity,
    the same rule the rasterize center path uses, so holes subtract.

    ``arr`` is (H, W) or (H, W, bands), row 0 = north; ``gt`` the 6-tuple
    geotransform (axis-aligned: gt[2] == gt[4] == 0); ``polygons`` a list
    of ring-lists (each ring an (N,2) closed array in georef coords), or a
    parsed geometry dict / WKB bytes."""
    from ..core import geom as _geom
    from ..core import wkb as _wkb

    if isinstance(polygons, (bytes, bytearray)):
        polygons = _wkb.as_polygons(_wkb.loads(bytes(polygons)))
    elif isinstance(polygons, dict):
        polygons = _wkb.as_polygons(polygons)
    a = np.asarray(arr)
    h, w = a.shape[:2]
    if gt[2] != 0 or gt[4] != 0:
        raise ValueError("cutline_mask requires an axis-aligned geotransform")
    cx = gt[0] + (np.arange(w, dtype=np.float64) + 0.5) * gt[1]
    cy = gt[3] + (np.arange(h, dtype=np.float64) + 0.5) * gt[5]
    gx, gy = np.meshgrid(cx, cy)
    px, py = gx.ravel(), gy.ravel()
    inside = np.zeros(px.shape[0], dtype=bool)
    for rings in polygons:
        parity = np.zeros(px.shape[0], dtype=np.int64)
        for ring in rings:
            ring = np.asarray(ring, dtype=np.float64)
            parity += _geom.points_in_ring(px, py, ring).astype(np.int64)
        inside |= (parity % 2).astype(bool)
    keep = ~inside if invert else inside
    out = a.copy()
    out[~keep.reshape(h, w)] = nodata
    return out


def cutline_crop(arr: np.ndarray, gt, polygons, *, nodata=0
                 ) -> tuple[np.ndarray, tuple]:
    """gdalwarp ``-cutline … -crop_to_cutline``: mask outside the cutline
    AND shrink the raster to the cutline's bounding pixel window,
    returning (cropped array, adjusted geotransform)."""
    from ..core import wkb as _wkb

    if isinstance(polygons, (bytes, bytearray)):
        polygons = _wkb.as_polygons(_wkb.loads(bytes(polygons)))
    elif isinstance(polygons, dict):
        polygons = _wkb.as_polygons(polygons)
    masked = cutline_mask(arr, gt, polygons, nodata=nodata)
    pts = np.vstack([np.asarray(r, dtype=np.float64)
                     for rings in polygons for r in rings])
    minx, maxx = float(pts[:, 0].min()), float(pts[:, 0].max())
    miny, maxy = float(pts[:, 1].min()), float(pts[:, 1].max())
    h, w = masked.shape[:2]
    # pixel window covering the cutline bbox (north-up gt)
    j0 = max(0, int(np.floor((minx - gt[0]) / gt[1])))
    j1 = min(w, int(np.ceil((maxx - gt[0]) / gt[1])))
    i0 = max(0, int(np.floor((maxy - gt[3]) / gt[5])))
    i1 = min(h, int(np.ceil((miny - gt[3]) / gt[5])))
    j1, i1 = max(j1, j0 + 1), max(i1, i0 + 1)
    out = masked[i0:i1, j0:j1]
    gt2 = (gt[0] + j0 * gt[1], gt[1], 0.0,
           gt[3] + i0 * gt[5], 0.0, gt[5])
    return out, gt2


def cutline(batch: pa.Table, cut_wkt: str, *, nodata: int = 0,
            invert: bool = False, out_fmt: str = "png") -> pa.Table:
    """Batch stage over (image_id, bytes, fmt) rows: apply one WKT cutline
    polygon to every image (gdalwarp -cutline / -dstnodata).  Images carry
    no georeferencing in this layout, so the cutline is in PIXEL space
    with the conventional north-up unit geotransform (0,1,0,H,0,-1) —
    x = column, y = H - row."""
    from ..core import wkt as _wkt
    from ..core import wkb as _wkb

    polys = _wkb.as_polygons(_wkt.loads_wkt(cut_wkt))
    ids, outs = [], []
    bts = batch.column("bytes").to_pylist()
    fmts = batch.column("fmt").to_pylist()
    for i in range(batch.num_rows):
        img = codecs.decode(bts[i], fmts[i])
        h = img.shape[0]
        out = cutline_mask(img, (0.0, 1.0, 0.0, float(h), 0.0, -1.0),
                           polys, nodata=nodata, invert=invert)
        outs.append(codecs.encode(out.astype(img.dtype), out_fmt))
        ids.append(batch.column("image_id")[i].as_py())
    return pa.table({"image_id": ids, "bytes": pa.array(outs, pa.binary()),
                     "fmt": [out_fmt] * len(ids)})


def equalize_array(img: np.ndarray) -> np.ndarray:
    """Histogram equalization of one uint8 band — ``apps/gdalenhance.cpp``
    equalize mode: LUT[v] = round((cdf(v) - cdf_min) / (N - cdf_min) * 255)
    where cdf_min is the CDF at the smallest PRESENT value (the standard
    rule; constant images map to 0).  Vectorized: one bincount + cumsum +
    LUT gather; HALF-UP rounding so the DuckDB replay (floor(x+0.5))
    matches bit-for-bit."""
    a = np.asarray(img)
    if a.dtype != np.uint8:
        raise ValueError("equalize_array expects uint8")
    flat = a.reshape(-1)
    counts = np.bincount(flat, minlength=256).astype(np.int64)
    cdf = np.cumsum(counts)
    n = flat.size
    cmin = int(cdf[np.nonzero(counts)[0][0]]) if n else 0
    denom = n - cmin
    if denom <= 0:
        return np.zeros_like(a)
    lut = np.floor((cdf - cmin) * 255.0 / denom + 0.5).astype(np.uint8)
    return lut[flat].reshape(a.shape)


def equalize(batch: pa.Table, out_fmt: str = "png") -> pa.Table:
    """Batch stage over (image_id, bytes, fmt): per-image histogram
    equalization of every band independently."""
    ids, outs = [], []
    bts = batch.column("bytes").to_pylist()
    fmts = batch.column("fmt").to_pylist()
    for i in range(batch.num_rows):
        img = codecs.decode(bts[i], fmts[i])
        if img.ndim == 2:
            out = equalize_array(img)
        else:
            out = np.stack([equalize_array(img[:, :, b])
                            for b in range(img.shape[2])], axis=2)
        outs.append(codecs.encode(out, out_fmt))
        ids.append(batch.column("image_id")[i].as_py())
    return pa.table({"image_id": ids, "bytes": pa.array(outs, pa.binary()),
                     "fmt": [out_fmt] * len(ids)})


def edit_geotransform(batch: "pa.Table", *, gt=None, offset=None,
                      scale=None, nodata="keep") -> "pa.Table":
    """gdal_edit.py analog (apps/gdal_edit.py): rewrite georeferencing
    metadata WITHOUT touching pixels — set an explicit geotransform,
    or shift (``offset=(dx, dy)``) / rescale (``scale=(sx, sy)``) the
    existing one; ``nodata`` replaces the nodata value when not
    'keep'."""
    import pyarrow as pa

    gts = batch.column("geotransform").to_pylist()
    out = []
    for g in gts:
        g = list(gt) if gt is not None else list(g)
        if offset is not None:
            g[0] += float(offset[0])
            g[3] += float(offset[1])
        if scale is not None:
            g[1] *= float(scale[0])
            g[5] *= float(scale[1])
        out.append([float(v) for v in g])
    cols = {c: batch.column(c) for c in batch.column_names}
    cols["geotransform"] = pa.array(out, pa.list_(pa.float64()))
    if nodata != "keep" and "nodata" in batch.column_names:
        cols["nodata"] = pa.array(
            [None if nodata is None else float(nodata)] * batch.num_rows,
            pa.float64())
    return pa.table(cols)


def gcps_to_affine(gcps) -> tuple:
    """gdalmove/gdal_translate -a_* analog: least-squares order-1
    (affine) fit of GCPs -> geotransform (alg/gdaltransformer.cpp
    GDALGCPTransform order 1).  ``gcps`` rows are (pixel, line, x, y)."""
    import numpy as np

    from ..core.gcp import GCPPolynomialTransform
    g = np.asarray(gcps, dtype=np.float64).reshape(-1, 4)
    if len(g) < 3:
        raise ValueError("affine fit needs >= 3 GCPs")
    t = GCPPolynomialTransform(g, order=1)
    # evaluate the fitted polynomial at pixel-space basis points
    px = np.array([0.0, 1.0, 0.0])
    ln = np.array([0.0, 0.0, 1.0])
    X, Y = t.forward(px, ln)
    return (float(X[0]), float(X[1] - X[0]), float(X[2] - X[0]),
            float(Y[0]), float(Y[1] - Y[0]), float(Y[2] - Y[0]))
