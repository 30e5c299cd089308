"""Stateful warp / tile-cut stages (SURVEY §2.4, §2.11).

``WarpTileStage`` is the engine's core actor: for each image row it decodes
the pixels, computes which WebMercator XYZ tiles at the target zoom the image
touches (bit-exact ``PixelsToTile`` rule, gdal2tiles.py:461-466), and warps
the image into each touched 256×256 tile grid, emitting one *contribution*
row per (tile, image).  The transformer chain mirrors
``GDALGenImgProjTransform`` (alg/gdaltransformer.cpp:3084):

    dst(tile px) → tile geotransform → EPSG:3857 → src CRS → src gt⁻¹ → src px

with the coarse-mesh approximation of ``GDALCreateApproxTransformer``
(:4024) so only O(mesh) points go through the CRS math per tile.

State held per actor (once, in __init__ / lazily cached): pyproj-style
Transformer objects per (src, dst) CRS pair (ogr/ogrct.cpp:665 OGRProjCT
caching) — pass the CLASS to ``map_batches(WarpTileStage, concurrency=N)``.

Scale notes (100 TB design):
  - contributions are emitted with an int64 ``tile_key`` so the downstream
    composite groupby shuffles a single integer key;
  - per-contribution payload is the warped 256×256×(bands) raw array +
    validity bitmask, ~256 KB max — bounded regardless of source image size;
  - oversized sources (>32 MP) should be flat_mapped into sub-window rows
    upstream (explicit partition sizing, SURVEY §7 hard parts).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core import codecs, mercator, proj, resample
from ..core import geotransform as gtm

TILE = 256


def image_lonlat_bbox(gt, crs: str, w: int, h: int, densify: int = 11):
    """Lon/lat bbox of an image footprint: transform a densified edge ring
    (GDALSuggestedWarpOutput2 samples a 21×21 edge grid, gdaltransformer
    .cpp:342 — we use the 4 edges at `densify` points each)."""
    t = np.linspace(0.0, 1.0, densify)
    ex = np.concatenate([t * w, np.full(densify, w), t[::-1] * w, np.zeros(densify)])
    ey = np.concatenate([np.zeros(densify), t * h, np.full(densify, h), t[::-1] * h])
    gx, gy = gtm.apply(gt, ex, ey)
    tr = proj.get_transformer(crs, "EPSG:4326")
    lon, lat = tr.transform(gx, gy)
    return float(lon.min()), float(lat.min()), float(lon.max()), float(lat.max())


def tile_range_for_bbox(lon_min, lat_min, lon_max, lat_max, zoom: int):
    """TMS tile index range covering a lon/lat bbox at `zoom` — the
    gdal2tiles plan step (generate_base_tiles :2801): PixelsToTile of the
    mercator-pixel extent corners."""
    lat_min = max(lat_min, -85.05112878)
    lat_max = min(lat_max, 85.05112878)
    mx0, my0 = mercator.latlon_to_meters(lat_min, lon_min)
    mx1, my1 = mercator.latlon_to_meters(lat_max, lon_max)
    px0, py0 = mercator.meters_to_pixels(mx0, my0, zoom)
    px1, py1 = mercator.meters_to_pixels(mx1, my1, zoom)
    tminx, tminy = mercator.pixels_to_tile(px0, py0)
    tmaxx, tmaxy = mercator.pixels_to_tile(px1, py1)
    n = (1 << zoom) - 1
    return (int(np.clip(tminx, 0, n)), int(np.clip(tminy, 0, n)),
            int(np.clip(tmaxx, 0, n)), int(np.clip(tmaxy, 0, n)))


class WarpTileStage:
    """Actor-pool stage: images → per-tile warped contributions.

    Output columns: tile_key:int64, z/x/y:int32 (TMS), image_id:string,
    rgb:binary (256*256*3 raw), mask:binary (256*256 validity 0/255),
    caption passthrough.
    """

    def __init__(self, zoom: int, method: str = "bilinear", mesh_step: int = 16):
        self.zoom = zoom
        self.method = method
        self.mesh_step = mesh_step
        # proj.get_transformer caches per-process; touching it here makes the
        # cost explicit per actor, not per batch
        proj.get_transformer("EPSG:3857", "EPSG:4326")

    def __call__(self, batch: pa.Table) -> pa.Table:
        z = self.zoom
        out = {"tile_key": [], "z": [], "x": [], "y": [], "image_id": [],
               "wx0": [], "wy0": [], "ww": [], "wh": [],
               "rgb": [], "mask": [], "caption": []}
        bts = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        gts = batch.column("geotransform").to_pylist()
        crss = batch.column("crs").to_pylist()
        ids = batch.column("image_id").to_pylist()
        caps = (batch.column("caption").to_pylist()
                if "caption" in batch.column_names else [""] * batch.num_rows)
        nods = (batch.column("nodata").to_pylist()
                if "nodata" in batch.column_names else [None] * batch.num_rows)
        res = float(mercator.resolution(z))
        for i in range(batch.num_rows):
            img = codecs.decode(bts[i], fmts[i])
            if img.ndim == 2:
                img = np.stack([img] * 3, axis=-1)
            elif img.shape[2] > 3:
                img = img[:, :, :3]
            gt = tuple(gts[i])
            crs = crss[i]
            h, w = img.shape[:2]
            bbox = image_lonlat_bbox(gt, crs, w, h)
            tminx, tminy, tmaxx, tmaxy = tile_range_for_bbox(*bbox, z)
            inv_gt = gtm.invert(gt)
            tr = proj.get_transformer("EPSG:3857", crs)
            # image bbox in mercator meters — the footprint window inside
            # each tile; warping the full 256² when the image covers a few
            # percent of the tile would waste ~50× the kernel work
            lat0 = max(bbox[1], -85.05112878)
            lat1 = min(bbox[3], 85.05112878)
            imx0, imy0 = (float(v) for v in mercator.latlon_to_meters(lat0, bbox[0]))
            imx1, imy1 = (float(v) for v in mercator.latlon_to_meters(lat1, bbox[2]))
            MARGIN = 3  # kernel radius (≤3) + rounding slack

            for ty in range(tminy, tmaxy + 1):
                for tx in range(tminx, tmaxx + 1):
                    bminx, bminy, bmaxx, bmaxy = (float(v) for v in
                                                  mercator.tile_bounds(tx, ty, z))
                    wx0 = max(0, int(np.floor((imx0 - bminx) / res)) - MARGIN)
                    wx1 = min(TILE, int(np.ceil((imx1 - bminx) / res)) + MARGIN)
                    wy0 = max(0, int(np.floor((bmaxy - imy1) / res)) - MARGIN)
                    wy1 = min(TILE, int(np.ceil((bmaxy - imy0) / res)) + MARGIN)
                    ww = wx1 - wx0
                    wh = wy1 - wy0
                    if ww <= 0 or wh <= 0:
                        continue

                    def dst_to_src(px, py, _ox=float(wx0), _oy=float(wy0),
                                   _bminx=bminx, _bmaxy=bmaxy, _tr=tr, _inv=inv_gt):
                        mx = _bminx + (px + _ox) * res
                        my = _bmaxy - (py + _oy) * res
                        sx_geo, sy_geo = _tr.transform(mx, my)
                        return gtm.apply(_inv, sx_geo, sy_geo)

                    sx, sy = resample.dst_to_src_mesh(ww, wh, dst_to_src,
                                                      self.mesh_step)
                    vals, valid = resample.sample(img, sx, sy, method=self.method,
                                                  nodata=nods[i])
                    if not valid.any():
                        continue
                    rgb = np.clip(np.floor(vals + 0.5), 0, 255).astype(np.uint8)
                    rgb[~valid] = 0
                    out["tile_key"].append(int(mercator.tile_key(z, tx, ty)))
                    out["z"].append(z); out["x"].append(tx); out["y"].append(ty)
                    out["image_id"].append(ids[i])
                    out["wx0"].append(wx0); out["wy0"].append(wy0)
                    out["ww"].append(ww); out["wh"].append(wh)
                    out["rgb"].append(np.ascontiguousarray(rgb).tobytes())
                    out["mask"].append((valid.astype(np.uint8) * 255).tobytes())
                    out["caption"].append(caps[i])
        return pa.table({
            "tile_key": pa.array(out["tile_key"], pa.int64()),
            "z": pa.array(out["z"], pa.int32()),
            "x": pa.array(out["x"], pa.int32()),
            "y": pa.array(out["y"], pa.int32()),
            "image_id": pa.array(out["image_id"], pa.string()),
            "wx0": pa.array(out["wx0"], pa.int32()),
            "wy0": pa.array(out["wy0"], pa.int32()),
            "ww": pa.array(out["ww"], pa.int32()),
            "wh": pa.array(out["wh"], pa.int32()),
            "rgb": pa.array(out["rgb"], pa.binary()),
            "mask": pa.array(out["mask"], pa.binary()),
            "caption": pa.array(out["caption"], pa.string()),
        })


def split_large_images(batch: pa.Table, max_pixels: int = 1 << 22,
                       tile_px: int = 1024) -> pa.Table:
    """flat_map oversized images into sub-window rows BEFORE warp (SURVEY §7
    'very wide records': 100 MP rows blow block targets).  Each sub-window
    gets an offset geotransform (pure affine shift — gt offset at (x0, y0)),
    so downstream tile contributions compose identically to the unsplit
    image; payloads stay ≤ tile_px² per row.  Rows under max_pixels pass
    through untouched."""
    out = {c: [] for c in batch.column_names}
    bts = batch.column("bytes").to_pylist()
    fmts = batch.column("fmt").to_pylist()
    gts = batch.column("geotransform").to_pylist()
    for i in range(batch.num_rows):
        w = batch.column("w")[i].as_py()
        h = batch.column("h")[i].as_py()
        if w * h <= max_pixels:
            for c in batch.column_names:
                out[c].append(batch.column(c)[i].as_py())
            continue
        img = codecs.decode(bts[i], fmts[i])
        gt = tuple(gts[i])
        for y0 in range(0, h, tile_px):
            for x0 in range(0, w, tile_px):
                sub = img[y0:y0 + tile_px, x0:x0 + tile_px]
                sh, sw = sub.shape[:2]
                ox, oy = gtm.apply(gt, x0, y0)
                sub_gt = (float(ox), gt[1], gt[2], float(oy), gt[4], gt[5])
                for c in batch.column_names:
                    if c == "bytes":
                        out[c].append(codecs.encode(np.ascontiguousarray(sub), "raw"))
                    elif c == "fmt":
                        out[c].append("raw")
                    elif c == "w":
                        out[c].append(sw)
                    elif c == "h":
                        out[c].append(sh)
                    elif c == "geotransform":
                        out[c].append(list(sub_gt))
                    elif c == "image_id":
                        out[c].append(f"{batch.column(c)[i].as_py()}#w{x0}_{y0}")
                    else:
                        out[c].append(batch.column(c)[i].as_py())
    arrays = {}
    for c in batch.column_names:
        typ = batch.schema.field(c).type
        arrays[c] = pa.array(out[c], typ)
    return pa.table(arrays)


class ReprojectImageStage:
    """gdalwarp as a standalone stage: reproject each image to dst_crs on a
    north-up grid sized by the suggested-output rule (GDALSuggestedWarpOutput2
    semantics: keep pixel count comparable, square pixels)."""

    def __init__(self, dst_crs: str, method: str = "bilinear", mesh_step: int = 16):
        self.dst_crs = dst_crs
        self.method = method
        self.mesh_step = mesh_step

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, outs, ws, hs, gts_out = [], [], [], [], []
        bts = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        gts = batch.column("geotransform").to_pylist()
        crss = batch.column("crs").to_pylist()
        for i in range(batch.num_rows):
            img = codecs.decode(bts[i], fmts[i])
            gt = tuple(gts[i])
            h, w = img.shape[:2]
            # densified edge ring -> dst bbox
            t = np.linspace(0.0, 1.0, 11)
            ex = np.concatenate([t * w, np.full(11, w), t[::-1] * w, np.zeros(11)])
            ey = np.concatenate([np.zeros(11), t * h, np.full(11, h), t[::-1] * h])
            gx, gy = gtm.apply(gt, ex, ey)
            tr_fwd = proj.get_transformer(crss[i], self.dst_crs)
            dx, dy = tr_fwd.transform(gx, gy)
            minx, maxx = float(dx.min()), float(dx.max())
            miny, maxy = float(dy.min()), float(dy.max())
            dst_w = w
            dst_h = max(1, int(round(dst_w * (maxy - miny) / max(maxx - minx, 1e-300))))
            res_x = (maxx - minx) / dst_w
            res_y = (maxy - miny) / dst_h
            dst_gt = (minx, res_x, 0.0, maxy, 0.0, -res_y)
            inv_gt = gtm.invert(gt)
            tr_back = proj.get_transformer(self.dst_crs, crss[i])

            def dst_to_src(px, py):
                mx, my = gtm.apply(dst_gt, px, py)
                sxg, syg = tr_back.transform(mx, my)
                return gtm.apply(inv_gt, sxg, syg)

            out = resample.warp(img, dst_w, dst_h, dst_to_src, method=self.method,
                                mesh_step=self.mesh_step)
            ids.append(batch.column("image_id")[i].as_py())
            outs.append(codecs.encode(out, "png"))
            ws.append(dst_w); hs.append(dst_h)
            gts_out.append(list(dst_gt))
        return pa.table({
            "image_id": ids, "bytes": pa.array(outs, pa.binary()),
            "w": pa.array(ws, pa.int32()), "h": pa.array(hs, pa.int32()),
            "fmt": pa.array(["png"] * len(ids)),
            "geotransform": pa.array(gts_out, pa.list_(pa.float64(), 6)),
            "crs": pa.array([self.dst_crs] * len(ids)),
        })


class GcpWarpStage:
    """gdalwarp for UNGEOREFERENCED imagery: each row carries ground control
    points (``gcps`` list column, flattened (pixel, line, geo_x, geo_y)
    quadruples) instead of a geotransform; the stage fits an order-n
    polynomial (or TPS with method='tps') per image
    (alg/gdal_crs.cpp:358 / alg/gdal_tps.cpp:128) and warps to a north-up
    grid sized by the suggested-output rule.  The fitted ``inverse`` is the
    dst_to_src provider for the same mesh-approximated kernel path as the
    CRS warp."""

    def __init__(self, order: int = 1, method: str = "bilinear",
                 transform: str = "polynomial", mesh_step: int = 16):
        self.order = order
        self.method = method
        self.transform = transform
        self.mesh_step = mesh_step

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..core.gcp import GCPPolynomialTransform, TPSTransform
        ids, outs, ws, hs, gts_out = [], [], [], [], []
        bts = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        gcps_col = batch.column("gcps").to_pylist()
        for i in range(batch.num_rows):
            img = codecs.decode(bts[i], fmts[i])
            h, w = img.shape[:2]
            g = np.asarray(gcps_col[i], dtype=np.float64).reshape(-1, 4)
            tr = (TPSTransform(g) if self.transform == "tps"
                  else GCPPolynomialTransform(g, order=self.order))
            # densified edge ring -> dst bbox (suggested-output rule)
            t = np.linspace(0.0, 1.0, 11)
            ex = np.concatenate([t * w, np.full(11, w), t[::-1] * w, np.zeros(11)])
            ey = np.concatenate([np.zeros(11), t * h, np.full(11, h), t[::-1] * h])
            dx, dy = tr.forward(ex, ey)
            minx, maxx = float(dx.min()), float(dx.max())
            miny, maxy = float(dy.min()), float(dy.max())
            dst_w = w
            dst_h = max(1, int(round(dst_w * (maxy - miny) / max(maxx - minx, 1e-300))))
            res_x = (maxx - minx) / dst_w
            res_y = (maxy - miny) / dst_h
            dst_gt = (minx, res_x, 0.0, maxy, 0.0, -res_y)

            def dst_to_src(px, py, _gt=dst_gt, _tr=tr):
                from ..core import geotransform as _g
                mx, my = _g.apply(_gt, px, py)
                return _tr.inverse(mx, my)

            out = resample.warp(img, dst_w, dst_h, dst_to_src,
                                method=self.method, mesh_step=self.mesh_step)
            ids.append(batch.column("image_id")[i].as_py())
            outs.append(codecs.encode(np.ascontiguousarray(out), "raw"))
            ws.append(dst_w); hs.append(dst_h)
            gts_out.append(list(dst_gt))
        return pa.table({
            "image_id": ids, "bytes": pa.array(outs, pa.binary()),
            "w": pa.array(ws, pa.int32()), "h": pa.array(hs, pa.int32()),
            "fmt": pa.array(["raw"] * len(ids)),
            "geotransform": pa.array(gts_out, pa.list_(pa.float64(), 6)),
            "crs": pa.array(["EPSG:4326"] * len(ids)),
        })


class GeolocWarpStage:
    """gdalwarp via GEOLOCATION arrays (alg/gdaltransformer.cpp:2569,
    alg/gdalgeoloc.cpp): each row carries per-image geolocation arrays
    (``geoloc_x`` / ``geoloc_y`` float64 binary payloads of shape
    (geoloc_gh, geoloc_gw), node step ``geoloc_step`` pixels) instead of a
    geotransform.  Forward is bilinear in the arrays; the warp's dst→src
    provider is the Newton inverse — the 4th georeferencing alternative
    next to GCP polynomial / TPS / RPC."""

    def __init__(self, method: str = "bilinear", mesh_step: int = 16):
        self.method = method
        self.mesh_step = mesh_step

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..core.gcp import GeolocTransform
        ids, outs, ws, hs, gts_out = [], [], [], [], []
        bts = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        gxs = batch.column("geoloc_x").to_pylist()
        gys = batch.column("geoloc_y").to_pylist()
        ghs = batch.column("geoloc_gh").to_pylist()
        gws = batch.column("geoloc_gw").to_pylist()
        steps = batch.column("geoloc_step").to_pylist()
        for i in range(batch.num_rows):
            img = codecs.decode(bts[i], fmts[i])
            h, w = img.shape[:2]
            gh, gw = int(ghs[i]), int(gws[i])
            gx = np.frombuffer(gxs[i], dtype=np.float64).reshape(gh, gw)
            gy = np.frombuffer(gys[i], dtype=np.float64).reshape(gh, gw)
            tr = GeolocTransform(gx, gy, pixel_step=float(steps[i]),
                                 line_step=float(steps[i]))
            t = np.linspace(0.0, 1.0, 11)
            ex = np.concatenate([t * w, np.full(11, w), t[::-1] * w, np.zeros(11)])
            ey = np.concatenate([np.zeros(11), t * h, np.full(11, h), t[::-1] * h])
            dx, dy = tr.forward(ex, ey)
            minx, maxx = float(dx.min()), float(dx.max())
            miny, maxy = float(dy.min()), float(dy.max())
            dst_w = w
            dst_h = max(1, int(round(dst_w * (maxy - miny) / max(maxx - minx, 1e-300))))
            res_x = (maxx - minx) / dst_w
            res_y = (maxy - miny) / dst_h
            dst_gt = (minx, res_x, 0.0, maxy, 0.0, -res_y)

            def dst_to_src(px, py, _gt=dst_gt, _tr=tr):
                from ..core import geotransform as _g
                mx, my = _g.apply(_gt, px, py)
                return _tr.inverse(mx, my)

            out = resample.warp(img, dst_w, dst_h, dst_to_src,
                                method=self.method, mesh_step=self.mesh_step)
            ids.append(batch.column("image_id")[i].as_py())
            outs.append(codecs.encode(np.ascontiguousarray(out), "raw"))
            ws.append(dst_w); hs.append(dst_h)
            gts_out.append(list(dst_gt))
        return pa.table({
            "image_id": ids, "bytes": pa.array(outs, pa.binary()),
            "w": pa.array(ws, pa.int32()), "h": pa.array(hs, pa.int32()),
            "fmt": pa.array(["raw"] * len(ids)),
            "geotransform": pa.array(gts_out, pa.list_(pa.float64(), 6)),
            "crs": pa.array(["EPSG:4326"] * len(ids)),
        })
