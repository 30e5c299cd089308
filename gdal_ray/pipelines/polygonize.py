"""Polygonize: raster → polygons of connected equal-valued pixels
(GDALPolygonize, alg/polygonize.cpp; 4-connected default, 8CONNECTED option
:86-87; ring assembly alg/polygonize_polygonizer.cpp).

Per-image ``map_batches`` (one image = one row, so the cross-tile
border-stitch shuffle the reference needs in-memory state for simply never
arises at this granularity; images split into sub-window rows would add a
border-segment groupby — documented future work, SURVEY §2.12).

Output per component: image_id, value, pixel count, and the exact pixel-edge
boundary polygon (outer ring + hole rings) in pixel coordinates converted
through the image geotransform — matching GDALPolygonize's polygon set for
center-sampled grids.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core import codecs, wkb
from ..core import geotransform as gtm


def label_components(band: np.ndarray, connect8: bool = False) -> np.ndarray:
    """Connected-component labels of equal-valued pixels, vectorized
    min-label propagation to fixpoint (O(diameter) sweeps)."""
    h, w = band.shape
    lab = np.arange(h * w, dtype=np.int64).reshape(h, w)

    def relax(sa, sb, eq):
        """Monotone minimum-relaxation of two aliased slices — only ever
        lowers labels, so the fixpoint is the true component labeling."""
        m = np.where(eq, np.minimum(sa, sb), sa)
        np.copyto(sa, np.minimum(sa, m))
        m2 = np.where(eq, np.minimum(sa, sb), sb)
        np.copyto(sb, np.minimum(sb, m2))

    pairs = [
        (lambda: (lab[:, 1:], lab[:, :-1], band[:, 1:] == band[:, :-1])),
        (lambda: (lab[1:, :], lab[:-1, :], band[1:, :] == band[:-1, :])),
    ]
    if connect8:
        pairs += [
            (lambda: (lab[1:, 1:], lab[:-1, :-1], band[1:, 1:] == band[:-1, :-1])),
            (lambda: (lab[1:, :-1], lab[:-1, 1:], band[1:, :-1] == band[:-1, 1:])),
        ]
    while True:
        old = lab.copy()
        for get in pairs:
            sa, sb, eq = get()
            relax(sa, sb, eq)
        if np.array_equal(lab, old):
            break
    return lab


def boundary_rings(mask: np.ndarray) -> list[np.ndarray]:
    """Exact pixel-edge boundary rings of a boolean component mask.

    Pixel (row i, col j) covers [j, j+1)×[i, i+1) (x=col, y=row).  Directed
    boundary edges are collected with a consistent orientation (single pixel
    → closed 4-edge ring), then stitched into cycles; saddle vertices (two
    outgoing edges) are resolved by preferring the sharpest turn relative to
    the incoming direction, which keeps rings from crossing — the same
    disambiguation GDAL's polygonizer applies at corner touches
    (alg/polygonize_polygonizer.cpp)."""
    h, w = mask.shape
    p = np.zeros((h + 2, w + 2), dtype=bool)
    p[1:-1, 1:-1] = mask
    core = p[1:-1, 1:-1]
    edges: dict[tuple, list] = {}

    def add(s, e):
        edges.setdefault(s, []).append(e)

    ti, tj = np.nonzero(core & ~p[:-2, 1:-1])   # top edges: (j+1,i) -> (j,i)
    for i, j in zip(ti, tj):
        add((j + 1, i), (j, i))
    bi, bj = np.nonzero(core & ~p[2:, 1:-1])    # bottom: (j,i+1) -> (j+1,i+1)
    for i, j in zip(bi, bj):
        add((j, i + 1), (j + 1, i + 1))
    li, lj = np.nonzero(core & ~p[1:-1, :-2])   # left: (j,i) -> (j,i+1)
    for i, j in zip(li, lj):
        add((j, i), (j, i + 1))
    ri, rj = np.nonzero(core & ~p[1:-1, 2:])    # right: (j+1,i+1) -> (j+1,i)
    for i, j in zip(ri, rj):
        add((j + 1, i + 1), (j + 1, i))

    rings = []
    while edges:
        start = next(iter(edges))
        ring = [start]
        prev = start
        cur = edges[start].pop()
        if not edges[start]:
            del edges[start]
        while cur != start:
            ring.append(cur)
            outs = edges[cur]
            if len(outs) == 1:
                nxt = outs.pop()
            else:
                # saddle: prefer sharpest turn (cross product of in/out dirs)
                din = (cur[0] - prev[0], cur[1] - prev[1])
                def turn(e):
                    return din[0] * (e[1] - cur[1]) - din[1] * (e[0] - cur[0])
                outs.sort(key=turn)
                nxt = outs.pop(0)
            if not edges[cur]:
                del edges[cur]
            prev = cur
            cur = nxt
        ring.append(start)
        rings.append(np.asarray(ring, dtype=np.float64))
    return rings


def polygonize_band(band: np.ndarray, gt, *, connect8: bool = False,
                    mask_value=None):
    """One image → list of components: (value, count, rings_in_geo_coords).
    ``mask_value`` pixels (nodata) produce no polygons (GDALPolygonize mask
    band semantics)."""
    lab = label_components(band, connect8)
    flat_lab = lab.ravel()
    flat_val = band.ravel()
    uniq, inv, counts = np.unique(flat_lab, return_inverse=True, return_counts=True)
    out = []
    for ci, root in enumerate(uniq):
        val = flat_val[flat_lab == root][0]
        if mask_value is not None and val == mask_value:
            continue
        mask = lab == root
        rings = boundary_rings(mask)
        # split outer/holes by area sign not needed (even-odd), convert to geo
        geo_rings = []
        for r in rings:
            gx, gy = gtm.apply(gt, r[:, 0], r[:, 1])
            geo_rings.append(np.column_stack([gx, gy]))
        # largest-|area| ring first as shell
        areas = [abs(float(np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1]))) for r in geo_rings]
        order = np.argsort(areas)[::-1]
        geo_rings = [geo_rings[k] for k in order]
        out.append((val, int(counts[ci]), geo_rings))
    return out


def polygonize(batch: pa.Table, *, connect8: bool = False,
               use_nodata_mask: bool = True) -> pa.Table:
    """map_batches UDF: images → component polygon rows."""
    out = {"image_id": [], "value": [], "pix_count": [], "wkb": []}
    bts = batch.column("bytes").to_pylist()
    fmts = batch.column("fmt").to_pylist()
    gts = batch.column("geotransform").to_pylist()
    nods = (batch.column("nodata").to_pylist() if "nodata" in batch.column_names
            else [None] * batch.num_rows)
    ids = batch.column("image_id").to_pylist()
    for i in range(batch.num_rows):
        img = codecs.decode(bts[i], fmts[i])
        band = img if img.ndim == 2 else img[:, :, 0]
        mv = nods[i] if use_nodata_mask else None
        for val, cnt, rings in polygonize_band(band, tuple(gts[i]),
                                               connect8=connect8, mask_value=mv):
            out["image_id"].append(ids[i])
            out["value"].append(float(val))
            out["pix_count"].append(cnt)
            out["wkb"].append(wkb.polygon(rings[0], rings[1:]))
    return pa.table({"image_id": pa.array(out["image_id"], pa.string()),
                     "value": pa.array(out["value"], pa.float64()),
                     "pix_count": pa.array(out["pix_count"], pa.int64()),
                     "wkb": pa.array(out["wkb"], pa.binary())})


def contour_lines(band: np.ndarray, gt, levels, *, tol: float = 1e-9
                  ) -> list[tuple[float, np.ndarray]]:
    """Merged iso-lines: marching-squares segments stitched into polylines
    (the line-merge step of alg/contour.cpp's segment merger).  Endpoints
    are matched on a quantized grid; open lines and closed rings both come
    out as (level, (N,2) polyline) with rings closed explicitly."""
    segs = contour_band(band, gt, levels)
    out = []
    by_level: dict = {}
    for lv, xy in segs:
        by_level.setdefault(lv, []).append(xy)
    for lv, seglist in by_level.items():
        def key(p):
            return (round(float(p[0]) / tol), round(float(p[1]) / tol))
        adj: dict = {}
        for si, xy in enumerate(seglist):
            adj.setdefault(key(xy[0]), []).append((si, 0))
            adj.setdefault(key(xy[1]), []).append((si, 1))
        used = [False] * len(seglist)
        for start_si in range(len(seglist)):
            if used[start_si]:
                continue
            # walk both directions from this segment
            line = [seglist[start_si][0], seglist[start_si][1]]
            used[start_si] = True
            for end in (1, 0):
                while True:
                    k = key(line[-1 if end == 1 else 0])
                    nxt = [(si, e) for si, e in adj.get(k, []) if not used[si]]
                    if not nxt:
                        break
                    si, e = nxt[0]
                    used[si] = True
                    seg = seglist[si]
                    new_pt = seg[1 - e]
                    if end == 1:
                        line.append(new_pt)
                    else:
                        line.insert(0, new_pt)
            out.append((lv, np.asarray(line, dtype=np.float64)))
    return out


def contour_band(band: np.ndarray, gt, levels) -> list[tuple[float, np.ndarray]]:
    """Marching-squares iso-lines (GDALContourGenerateEx, alg/contour.cpp,
    alg/marching_squares/): returns (level, polyline) segments joined
    per-cell; adjacent cell segments are emitted unjoined (line merging is a
    presentation concern; length/topology is testable)."""
    h, w = band.shape
    segs_out = []
    for lv in levels:
        b = band.astype(np.float64)
        # cell corners: tl, tr, br, bl
        tl = b[:-1, :-1]; tr = b[:-1, 1:]; br = b[1:, 1:]; bl = b[1:, :-1]
        def interp(a, c):
            with np.errstate(divide="ignore", invalid="ignore"):
                t = (lv - a) / (c - a)
            return np.clip(t, 0.0, 1.0)
        above = [tl >= lv, tr >= lv, br >= lv, bl >= lv]
        case = (above[0].astype(int) | (above[1].astype(int) << 1)
                | (above[2].astype(int) << 2) | (above[3].astype(int) << 3))
        ys, xs = np.nonzero((case != 0) & (case != 15))
        for y, x in zip(ys, xs):
            corners = np.array([b[y, x], b[y, x + 1], b[y + 1, x + 1], b[y + 1, x]])
            pts = []
            edges_def = [((0, 0), (1, 0), corners[0], corners[1]),   # top
                         ((1, 0), (1, 1), corners[1], corners[2]),   # right
                         ((1, 1), (0, 1), corners[2], corners[3]),   # bottom
                         ((0, 1), (0, 0), corners[3], corners[0])]   # left
            for (x0, y0), (x1, y1), v0, v1 in edges_def:
                if (v0 >= lv) != (v1 >= lv):
                    t = (lv - v0) / (v1 - v0)
                    pts.append((x + 0.5 + x0 + t * (x1 - x0),
                                y + 0.5 + y0 + t * (y1 - y0)))
            if len(pts) >= 2:
                p = np.asarray(pts[:2], dtype=np.float64)
                if np.hypot(*(p[1] - p[0])) < 1e-12:
                    continue  # level exactly through a cell corner
                gx, gy = gtm.apply(gt, p[:, 0], p[:, 1])
                segs_out.append((float(lv), np.column_stack([gx, gy])))
    return segs_out


def polygonize_stitched(images, *, connect8: bool = False,
                        use_nodata_mask: bool = True,
                        max_pixels: int = 1 << 22, tile_px: int = 1024):
    """Cross-tile polygonize: ``split_large_images ∘ polygonize ∘ stitch``
    equals whole-image polygonize (alg/polygonize_polygonizer.cpp's
    whole-raster ring assembly, re-expressed as a shuffle).

    Shape: oversized images flat_map into sub-window rows (bounded
    payloads), each row polygonizes independently, then ONE groupby on
    (base image, value) unions the per-tile pieces with the boolean
    overlay engine — pieces that share a cut edge merge back into the
    whole-raster component set, and per-component pixel counts are
    recovered exactly from the rectilinear area / pixel area.

    4-connectivity is exact.  (8-connected components that touch only at
    a corner ON a tile cut line would stay split — documented limit.)
    """
    import ray.data

    from ..core import geom, overlay as OV
    from ..stages.warp import split_large_images

    OUT_SPEC = [("group_key", pa.string()), ("image_id", pa.string()),
                ("value", pa.float64()), ("pix_count", pa.int64()),
                ("wkb", pa.binary()), ("pixel_area", pa.float64()),
                ("is_border", pa.bool_())]

    def split(b: pa.Table) -> pa.Table:
        return split_large_images(b, max_pixels=max_pixels, tile_px=tile_px)

    def polys_with_area(b: pa.Table) -> pa.Table:
        """Pieces tagged border/interior: only pieces whose bbox reaches
        their tile's cut line can merge with a neighbor tile's piece, so
        the interior majority NEVER enters the stitch shuffle."""
        t = polygonize(b, connect8=connect8, use_nodata_mask=use_nodata_mask)
        meta = {}
        for i in range(b.num_rows):
            gt = b.column("geotransform")[i].as_py()
            w = b.column("w")[i].as_py()
            h = b.column("h")[i].as_py()
            xs = [gt[0], gt[0] + w * gt[1]]
            ys = [gt[3], gt[3] + h * gt[5]]
            meta[b.column("image_id")[i].as_py()] = (
                gt, min(xs), min(ys), max(xs), max(ys))
        cols = {n: [] for n, _ in OUT_SPEC}
        for i in range(t.num_rows):
            iid = t.column("image_id")[i].as_py()
            gt, txmin, tymin, txmax, tymax = meta[iid]
            bid = iid.split("#w")[0]
            rings = wkb.as_polygons(wkb.loads(t.column("wkb")[i].as_py()))[0]
            bb = geom.rings_bbox(rings)
            eps = 0.25 * min(abs(gt[1]), abs(gt[5]))
            border = (bb[0] <= txmin + eps or bb[1] <= tymin + eps
                      or bb[2] >= txmax - eps or bb[3] >= tymax - eps)
            cols["group_key"].append(f"{bid}|{t.column('value')[i].as_py()}")
            cols["image_id"].append(bid)
            cols["value"].append(float(t.column("value")[i].as_py()))
            cols["pix_count"].append(int(t.column("pix_count")[i].as_py()))
            cols["wkb"].append(t.column("wkb")[i].as_py())
            cols["pixel_area"].append(abs(gt[1] * gt[5]))
            cols["is_border"].append(bool(border))
        return pa.table({n: pa.array(cols[n], typ) for n, typ in OUT_SPEC})

    pieces = images.map_batches(split, batch_format="pyarrow") \
        .map_batches(polys_with_area, batch_format="pyarrow").materialize()

    import pyarrow.compute as pc2

    def passthrough(b: pa.Table) -> pa.Table:
        keep = b.filter(pc2.invert(b.column("is_border")))
        return keep.select(["image_id", "value", "pix_count", "wkb"])

    def stitch(g: pa.Table) -> pa.Table:
        """Union ONLY bbox-connected clusters of border pieces — merges
        happen along shared cut edges, so union-find on bbox contact keeps
        each overlay invocation small."""
        polys = [wkb.as_polygons(wkb.loads(x))
                 for x in g.column("wkb").to_pylist()]
        n = len(polys)
        bbs = np.array([geom.rings_bbox(p[0]) for p in polys])
        parent = np.arange(n)

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        eps = 1e-9
        for i in range(n):
            touch = ~((bbs[i, 2] < bbs[:, 0] - eps) | (bbs[:, 2] < bbs[i, 0] - eps)
                      | (bbs[i, 3] < bbs[:, 1] - eps) | (bbs[:, 3] < bbs[i, 1] - eps))
            for j in np.nonzero(touch)[0]:
                if j > i:
                    ri, rj = find(i), find(j)
                    if ri != rj:
                        parent[rj] = ri
        clusters: dict[int, list[int]] = {}
        for i in range(n):
            clusters.setdefault(find(i), []).append(i)
        pxa = float(g.column("pixel_area")[0].as_py())
        iid = g.column("image_id")[0].as_py()
        val = float(g.column("value")[0].as_py())
        out = {"image_id": [], "value": [], "pix_count": [], "wkb": []}
        for members in clusters.values():
            if len(members) == 1:
                i = members[0]
                out["image_id"].append(iid)
                out["value"].append(val)
                out["pix_count"].append(int(g.column("pix_count")[i].as_py()))
                out["wkb"].append(g.column("wkb")[i].as_py())
                continue
            flat = [p for i in members for p in polys[i]]
            for rings in OV.union_all(flat):
                area = geom.polygon_area(rings)
                out["image_id"].append(iid)
                out["value"].append(val)
                out["pix_count"].append(int(round(area / pxa)))
                out["wkb"].append(wkb.polygon(rings[0], rings[1:]))
        return pa.table({"image_id": pa.array(out["image_id"], pa.string()),
                         "value": pa.array(out["value"], pa.float64()),
                         "pix_count": pa.array(out["pix_count"], pa.int64()),
                         "wkb": pa.array(out["wkb"], pa.binary())})

    border = pieces.map_batches(
        lambda b: b.filter(b.column("is_border"))
                   .select(["group_key", "image_id", "value", "pix_count",
                            "wkb", "pixel_area"]),
        batch_format="pyarrow") \
        .groupby("group_key").map_groups(stitch, batch_format="pyarrow")
    return pieces.map_batches(passthrough, batch_format="pyarrow").union(border)
