"""Vector geometry stages (SURVEY §2.2 vector maps, §2.14 vector list).

Per-feature GEOS ops re-expressed as stateless ``map_batches`` over WKB
binary columns, mirroring the reference's per-feature loops
(``apps/gdalalg_vector_buffer.cpp`` etc., ``ogr/ogrgeometry.cpp``
Buffer :4946 / Simplify :6775 / Centroid :6523 / ConvexHull :4446):

  - geometry engine is gdal_ray.core.geom (pure numpy);
  - each stage returns the input table with the geometry column replaced /
    augmented — schema-stable so stages chain like `gdal vector pipeline`
    steps;
  - clip is exact Sutherland-Hodgman against a rect window (= ogr2ogr
    -clipsrc with a bbox, the overwhelmingly common case); general
    polygon×polygon boolean ops are the documented round-2 gap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core import geom, hilbert, wkb


def _map_polys(batch: pa.Table, fn, wkb_col: str = "wkb") -> pa.Table:
    """Apply fn(rings_list)->rings_list to every polygon of every row."""
    out = []
    for data in batch.column(wkb_col).to_pylist():
        g = wkb.loads(data)
        polys = wkb.as_polygons(g)
        new = [fn(rings) for rings in polys]
        new = [r for r in new if r is not None]
        if not new:
            out.append(None)
        elif len(new) == 1:
            out.append(wkb.dumps({"type": "Polygon", "rings": new[0]}))
        else:
            out.append(wkb.dumps({"type": "MultiPolygon", "polys": new}))
    i = batch.column_names.index(wkb_col)
    return batch.set_column(i, wkb_col, pa.array(out, pa.binary()))


def simplify(batch: pa.Table, tolerance: float, wkb_col: str = "wkb") -> pa.Table:
    """Douglas-Peucker per ring (OGRGeometry::Simplify semantics)."""
    return _map_polys(batch, lambda rings: [geom.simplify_ring(r, tolerance) for r in rings],
                      wkb_col)


def segmentize(batch: pa.Table, max_len: float, wkb_col: str = "wkb") -> pa.Table:
    """Insert vertices so no segment exceeds max_len (gdal vector segmentize)."""
    return _map_polys(batch, lambda rings: [geom.segmentize_line(r, max_len) for r in rings],
                      wkb_col)


def swap_xy(batch: pa.Table, wkb_col: str = "wkb") -> pa.Table:
    return _map_polys(batch, lambda rings: [r[:, ::-1].copy() for r in rings], wkb_col)


def convex_hull(batch: pa.Table, wkb_col: str = "wkb") -> pa.Table:
    """Hull of all vertices of each feature (OGRGeometry::ConvexHull)."""
    out = []
    for data in batch.column(wkb_col).to_pylist():
        polys = wkb.as_polygons(wkb.loads(data))
        pts = np.concatenate([r for rings in polys for r in rings], axis=0)
        out.append(wkb.dumps({"type": "Polygon", "rings": [geom.convex_hull(pts)]}))
    i = batch.column_names.index(wkb_col)
    return batch.set_column(i, wkb_col, pa.array(out, pa.binary()))


def buffer_points(batch: pa.Table, dist: float, quadsegs: int = 8,
                  x_col: str = "x", y_col: str = "y") -> pa.Table:
    """Point buffer → circle polygons (OGRGeometry::Buffer on points)."""
    xs = np.asarray(batch.column(x_col), dtype=np.float64)
    ys = np.asarray(batch.column(y_col), dtype=np.float64)
    out = [wkb.dumps({"type": "Polygon",
                      "rings": [geom.buffer_point(x, y, dist, quadsegs)]})
           for x, y in zip(xs, ys)]
    return batch.append_column("wkb", pa.array(out, pa.binary()))


def centroids(batch: pa.Table, wkb_col: str = "wkb") -> pa.Table:
    """Per-feature area-weighted centroid (ogrgeometry.cpp:6523); appends
    cx, cy columns."""
    cx, cy = [], []
    for data in batch.column(wkb_col).to_pylist():
        polys = wkb.as_polygons(wkb.loads(data))
        # multipolygon: area-weighted combination of part centroids
        sa = sx = sy = 0.0
        for rings in polys:
            a = geom.polygon_area(rings)
            x, y = geom.polygon_centroid(rings)
            sx += x * a; sy += y * a; sa += a
        if sa > 0:
            cx.append(sx / sa); cy.append(sy / sa)
        else:
            cx.append(float("nan")); cy.append(float("nan"))
    t = batch.append_column("cx", pa.array(cx, pa.float64()))
    return t.append_column("cy", pa.array(cy, pa.float64()))


def area_col(batch: pa.Table, wkb_col: str = "wkb") -> pa.Table:
    out = []
    for data in batch.column(wkb_col).to_pylist():
        polys = wkb.as_polygons(wkb.loads(data))
        out.append(sum(geom.polygon_area(rings) for rings in polys))
    return batch.append_column("area", pa.array(out, pa.float64()))


def _clip_ring_halfplane(ring: np.ndarray, axis: int, bound: float, keep_leq: bool):
    """Sutherland-Hodgman clip of one closed ring against one half-plane."""
    pts = ring[:-1]
    n = len(pts)
    out = []
    for i in range(n):
        cur = pts[i]
        nxt = pts[(i + 1) % n]
        cin = (cur[axis] <= bound) if keep_leq else (cur[axis] >= bound)
        nin = (nxt[axis] <= bound) if keep_leq else (nxt[axis] >= bound)
        if cin:
            out.append(cur)
        if cin != nin:
            t = (bound - cur[axis]) / (nxt[axis] - cur[axis])
            out.append(cur + t * (nxt - cur))
    if len(out) < 3:
        return None
    out.append(out[0])
    return np.asarray(out, dtype=np.float64)


def clip_ring_bbox(ring: np.ndarray, minx, miny, maxx, maxy):
    """Exact polygon ∩ rectangle (Sutherland-Hodgman; ring must be a shell —
    holes are clipped independently by callers)."""
    r = ring
    for axis, bound, keep_leq in ((0, maxx, True), (0, minx, False),
                                  (1, maxy, True), (1, miny, False)):
        r = _clip_ring_halfplane(r, axis, bound, keep_leq)
        if r is None:
            return None
    return r


def _clip_ring_halfplane_general(ring: np.ndarray, p: np.ndarray, q: np.ndarray):
    """Sutherland-Hodgman clip of one closed ring against the half-plane on
    the LEFT of directed edge p→q (CCW convex clipper interiors)."""
    pts = ring[:-1]
    n = len(pts)
    d = q - p
    out = []
    def side(v):
        return d[0] * (v[1] - p[1]) - d[1] * (v[0] - p[0])
    for i in range(n):
        cur = pts[i]
        nxt = pts[(i + 1) % n]
        cin = side(cur) >= 0
        nin = side(nxt) >= 0
        if cin:
            out.append(cur)
        if cin != nin:
            sc, sn = side(cur), side(nxt)
            t = sc / (sc - sn)
            out.append(cur + t * (nxt - cur))
    if len(out) < 3:
        return None
    out.append(out[0])
    return np.asarray(out, dtype=np.float64)


def clip_to_convex(rings, clip_ring: np.ndarray):
    """Polygon (shell+holes) ∩ convex polygon — exact Sutherland-Hodgman
    against each clipper edge.  Clipper ring may be CW or CCW (normalized
    internally).  Returns a rings-list or None."""
    cr = clip_ring
    area2 = float(np.sum(cr[:-1, 0] * cr[1:, 1] - cr[1:, 0] * cr[:-1, 1]))
    if area2 < 0:
        cr = cr[::-1].copy()
    shell = rings[0]
    for i in range(len(cr) - 1):
        shell = _clip_ring_halfplane_general(shell, cr[i], cr[i + 1])
        if shell is None:
            return None
    holes = []
    for h in rings[1:]:
        hc = h
        for i in range(len(cr) - 1):
            hc = _clip_ring_halfplane_general(hc, cr[i], cr[i + 1])
            if hc is None:
                break
        if hc is not None:
            holes.append(hc)
    return [shell] + holes


def clip_to_bbox(batch: pa.Table, minx: float, miny: float, maxx: float,
                 maxy: float, wkb_col: str = "wkb") -> pa.Table:
    """gdal vector clip with a bbox window (ogr2ogr -spat/-clipsrc rect):
    exact Sutherland-Hodgman on shells; holes clipped the same way.
    Features fully outside drop out (row filter)."""
    keep_idx, out = [], []
    for i, data in enumerate(batch.column(wkb_col).to_pylist()):
        polys = wkb.as_polygons(wkb.loads(data))
        new_polys = []
        for rings in polys:
            shell = clip_ring_bbox(rings[0], minx, miny, maxx, maxy)
            if shell is None:
                continue
            holes = []
            for h in rings[1:]:
                hc = clip_ring_bbox(h, minx, miny, maxx, maxy)
                if hc is not None:
                    holes.append(hc)
            new_polys.append([shell] + holes)
        if new_polys:
            keep_idx.append(i)
            if len(new_polys) == 1:
                out.append(wkb.dumps({"type": "Polygon", "rings": new_polys[0]}))
            else:
                out.append(wkb.dumps({"type": "MultiPolygon", "polys": new_polys}))
    kept = batch.take(pa.array(keep_idx, pa.int64()))
    i = kept.column_names.index(wkb_col)
    return kept.set_column(i, wkb_col, pa.array(out, pa.binary()))


def hilbert_key(batch: pa.Table, wkb_col: str = "wkb", order: int = 16) -> pa.Table:
    """gdal vector sort: Hilbert code of feature centroid
    (apps/gdalalg_vector_sort.cpp:362, alg/hilbert.cpp:80) — downstream
    ``ds.sort('hilbert')`` gives the spatial write order."""
    t = centroids(batch, wkb_col)
    key = hilbert.hilbert_key_lonlat(np.asarray(t.column("cx")),
                                     np.asarray(t.column("cy")), order)
    return t.append_column("hilbert", pa.array(key, pa.int64()))


def check_geometry(batch: pa.Table, wkb_col: str = "wkb") -> pa.Table:
    """gdal vector check-geometry: validity report per feature.
    Checks: parseable WKB, ring closure, ≥4 points per ring, no duplicate
    consecutive vertices, no self-intersection of the shell (proper
    crossings only — shared endpoints of adjacent segments are legal)."""
    ok, reasons = [], []
    for data in batch.column(wkb_col).to_pylist():
        reason = ""
        try:
            polys = wkb.as_polygons(wkb.loads(data))
            for rings in polys:
                for ring in rings:
                    if len(ring) < 4:
                        reason = "ring has < 4 points"
                        break
                    if not np.allclose(ring[0], ring[-1]):
                        reason = "ring not closed"
                        break
                    d = np.abs(np.diff(ring, axis=0)).sum(axis=1)
                    if (d == 0).any():
                        reason = "duplicate consecutive vertices"
                        break
                if reason:
                    break
                shell = rings[0]
                a1, a2 = shell[:-1], shell[1:]
                n = len(a1)
                if n > 3:
                    cross = geom._segments_cross(a1, a2, a1, a2)
                    # mask self and adjacent (incl. wraparound) pairs
                    i = np.arange(n)
                    adj = (np.abs(i[:, None] - i[None, :]) <= 1) | \
                          (np.abs(i[:, None] - i[None, :]) == n - 1)
                    if (cross & ~adj).any():
                        reason = "self-intersection"
        except Exception:
            reason = "unparseable wkb"
        ok.append(reason == "")
        reasons.append(reason)
    t = batch.append_column("is_valid", pa.array(ok, pa.bool_()))
    return t.append_column("invalid_reason", pa.array(reasons, pa.string()))


def make_valid_lite(batch: pa.Table, wkb_col: str = "wkb") -> pa.Table:
    """gdal vector make-valid (lite): close unclosed rings, drop duplicate
    consecutive vertices, drop degenerate (<4 pt) rings.  Full GEOS
    MakeValid node-splitting is the documented gap."""
    def fix(rings):
        out = []
        for ring in rings:
            r = ring
            if not np.allclose(r[0], r[-1]):
                r = np.vstack([r, r[:1]])
            keep = np.ones(len(r), dtype=bool)
            keep[1:] = np.abs(np.diff(r, axis=0)).sum(axis=1) > 0
            r = r[keep]
            if len(r) >= 4:
                out.append(r)
        return out if out else None

    return _map_polys(batch, fix, wkb_col)


def dissolve_collect(group: pa.Table, wkb_col: str = "wkb") -> pa.Table:
    """gdal vector dissolve (apps/gdalalg_vector_dissolve.h): merge all
    features of one group key into one multi-part feature.

    ROUND-1 SEMANTICS: parts are COLLECTED into a MultiPolygon (the
    reference's multipart-merge path); boolean UnaryUnion of overlapping
    parts is the documented gap (needs the polygon-clipping engine).
    Emits summed |area| of parts and the part count."""
    polys = []
    for data in group.column(wkb_col).to_pylist():
        polys.extend(wkb.as_polygons(wkb.loads(data)))
    area = sum(geom.polygon_area(rings) for rings in polys)
    key_cols = [c for c in group.column_names if c not in (wkb_col,)]
    first = {c: [group.column(c)[0].as_py()] for c in key_cols if c in ("category",)}
    first["wkb"] = [wkb.dumps({"type": "MultiPolygon", "polys": polys})]
    first["n_parts"] = [len(polys)]
    first["total_area"] = [area]
    return pa.table(first)


def dissolve_union(group: pa.Table, wkb_col: str = "wkb") -> pa.Table:
    """gdal vector dissolve with TRUE boolean union
    (apps/gdalalg_vector_dissolve.h + OGRGeometry::UnaryUnion,
    ogr/ogrgeometry.cpp:5648): all features of one group key are unioned
    into one (multi)polygon — overlaps merged, shared borders removed.
    Emits the union geometry, its exact area, and the part count."""
    from ..core import overlay as OV
    polys = []
    for data in group.column(wkb_col).to_pylist():
        polys.extend(wkb.as_polygons(wkb.loads(data)))
    merged = OV.union_all(polys)
    area = OV.area_of(merged)
    key_cols = [c for c in group.column_names if c not in (wkb_col,)]
    first = {c: [group.column(c)[0].as_py()] for c in key_cols if c in ("category",)}
    if len(merged) == 1:
        first["wkb"] = [wkb.dumps({"type": "Polygon", "rings": merged[0]})]
    else:
        first["wkb"] = [wkb.dumps({"type": "MultiPolygon", "polys": merged})]
    first["n_parts"] = [len(merged)]
    first["total_area"] = [area]
    return pa.table(first)


def make_valid_full(batch: pa.Table, wkb_col: str = "wkb") -> pa.Table:
    """gdal vector make-valid (full): GEOS-MakeValid 'linework' semantics
    (ogr/ogrgeometry.cpp:4180) — self-intersecting rings are noded at
    crossings and reassembled even-odd, so a bowtie becomes two polygons.
    Runs the structural fixes of make_valid_lite first, then the overlay
    engine on any feature check_geometry flags as self-intersecting."""
    from ..core import overlay as OV
    lite = make_valid_lite(batch, wkb_col)
    out = []
    for data in lite.column(wkb_col).to_pylist():
        if data is None:
            out.append(None)
            continue
        polys = wkb.as_polygons(wkb.loads(data))
        fixed = OV.union_all(polys)
        if not fixed:
            out.append(None)
        elif len(fixed) == 1:
            out.append(wkb.dumps({"type": "Polygon", "rings": fixed[0]}))
        else:
            out.append(wkb.dumps({"type": "MultiPolygon", "polys": fixed}))
    i = lite.column_names.index(wkb_col)
    return lite.set_column(i, wkb_col, pa.array(out, pa.binary()))


def explode_collections(batch: pa.Table, wkb_col: str = "wkb") -> pa.Table:
    """gdal vector explode-collections
    (apps/gdalalg_vector_explode_collections.cpp): one output row per
    geometry part; single-part rows pass through; attributes replicate."""
    idx, parts = [], []
    for i, data in enumerate(batch.column(wkb_col).to_pylist()):
        polys = wkb.as_polygons(wkb.loads(data))
        if not polys:
            continue
        for rings in polys:
            idx.append(i)
            parts.append(wkb.dumps({"type": "Polygon", "rings": rings}))
    taken = batch.take(pa.array(idx, pa.int64())) if idx else batch.slice(0, 0)
    j = taken.column_names.index(wkb_col)
    return taken.set_column(j, wkb_col, pa.array(parts, pa.binary()))


def make_point(batch: pa.Table, x_col: str = "x", y_col: str = "y",
               wkb_col: str = "wkb") -> pa.Table:
    """gdal vector geom make-point: build point geometries from coordinate
    columns (apps/gdalalg_vector_make_point semantics)."""
    x = np.asarray(batch.column(x_col), dtype=np.float64)
    y = np.asarray(batch.column(y_col), dtype=np.float64)
    pts = [wkb.point(float(a), float(b)) for a, b in zip(x, y)]
    return batch.append_column(wkb_col, pa.array(pts, pa.binary()))


def collect_multipart(group: pa.Table, wkb_col: str = "wkb") -> pa.Table:
    """Inverse of explode: collect a group's parts into one MultiPolygon
    (the 'combine' of ogr2ogr -dialect collect; no boolean union — see
    dissolve_union for that)."""
    polys = []
    for data in group.column(wkb_col).to_pylist():
        polys.extend(wkb.as_polygons(wkb.loads(data)))
    key_cols = [c for c in group.column_names if c != wkb_col]
    first = {c: [group.column(c)[0].as_py()] for c in key_cols}
    first[wkb_col] = [wkb.dumps({"type": "MultiPolygon", "polys": polys})]
    first["n_parts"] = [len(polys)]
    return pa.table(first)


def concave_hull(batch: pa.Table, ratio: float = 0.3,
                 wkb_col: str = "wkb") -> pa.Table:
    """ConcaveHull (ogr/ogrgeometry.cpp:4566, GEOS concave_hull
    semantics): start from the convex hull and iteratively 'dig' the
    longest hull edge toward the nearest interior vertex until every hull
    edge is shorter than ratio × longest-diagonal.  Pure-numpy
    chi-shape-style approximation; hull is guaranteed simple (a dig is
    rejected if it would cross the current hull)."""
    out = []
    for data in batch.column(wkb_col).to_pylist():
        polys = wkb.as_polygons(wkb.loads(data))
        pts = np.vstack([r for rings in polys for r in rings[:1]])
        pts = np.unique(pts, axis=0)
        hull = geom.convex_hull(pts)
        if len(hull) < 4:
            out.append(data)
            continue
        diag = np.hypot(np.ptp(pts[:, 0]), np.ptp(pts[:, 1]))
        max_len = max(ratio * diag, 1e-12)
        hull = hull[:-1]  # open ring
        interior = {tuple(p) for p in pts} - {tuple(p) for p in hull}

        def ring_is_simple(h):
            r = np.vstack([h, h[:1]])
            a1, a2 = r[:-1], r[1:]
            n = len(a1)
            cross = geom._segments_cross(a1, a2, a1, a2)
            i = np.arange(n)
            adj = (np.abs(i[:, None] - i[None, :]) <= 1) | \
                  (np.abs(i[:, None] - i[None, :]) == n - 1)
            return not (cross & ~adj).any()

        while interior:
            n = len(hull)
            lens = np.hypot(*(np.roll(hull, -1, axis=0) - hull).T)
            cand = np.array(sorted(interior))
            dug = False
            for ei in np.argsort(lens)[::-1]:
                if lens[ei] <= max_len:
                    break
                a = hull[ei]
                b = hull[(ei + 1) % n]
                # candidates ordered by distance TO the edge; chi locality:
                # only dig a point closer to the edge than the edge is long
                d = geom.point_segment_distance(
                    cand[:, 0], cand[:, 1], a[None, :], b[None, :])[:, 0]
                for ci in np.argsort(d)[:5]:
                    if d[ci] >= lens[ei]:
                        break
                    c = cand[ci]
                    trial = np.insert(hull, (ei + 1) % n, c, axis=0)
                    if ring_is_simple(trial):
                        hull = trial
                        interior.discard(tuple(c))
                        dug = True
                        break
                if dug:
                    break
            if not dug:
                break
        ring = np.vstack([hull, hull[:1]])
        out.append(wkb.dumps({"type": "Polygon", "rings": [ring]}))
    i = batch.column_names.index(wkb_col)
    return batch.set_column(i, wkb_col, pa.array(out, pa.binary()))


def buffer_polygons(batch: pa.Table, dist: float, quadsegs: int = 8,
                    wkb_col: str = "wkb") -> pa.Table:
    """Full round-join polygon buffer (OGRGeometry::Buffer,
    ogr/ogrgeometry.cpp:4946): positive = dilation with round corners,
    negative = erosion — exact up to arc discretization via the boolean
    overlay engine (core.geom.buffer_polygon)."""
    out = []
    for data in batch.column(wkb_col).to_pylist():
        polys = wkb.as_polygons(wkb.loads(data))
        pieces = []
        for rings in polys:
            pieces.extend(geom.buffer_polygon(rings, dist, quadsegs))
        if not pieces:
            out.append(None)
        elif len(pieces) == 1:
            out.append(wkb.dumps({"type": "Polygon", "rings": pieces[0]}))
        else:
            out.append(wkb.dumps({"type": "MultiPolygon", "polys": pieces}))
    i = batch.column_names.index(wkb_col)
    return batch.set_column(i, wkb_col, pa.array(out, pa.binary()))


def layer_info(ds, wkb_col: str = "wkb"):
    """ogrinfo -so analog (apps/ogrinfo_lib.cpp summary mode): one row of
    layer metadata — feature count, per-geometry-type counts and the
    layer extent — computed distributedly: a per-batch combiner emits ONE
    partial row per block (counts + bbox), the bounded ≤n_blocks partial
    set folds on the driver (the same measured-size discipline the band-
    stats / profile operators use)."""
    import pyarrow as pa

    from ..core import wkb as _wkb

    TYPES = ("Point", "LineString", "Polygon", "MultiPoint",
             "MultiLineString", "MultiPolygon", "GeometryCollection")

    def _gbbox(g):
        t = g["type"]
        if t == "Point":
            x, y = (float(v) for v in np.asarray(g["xy"]).reshape(2))
            return x, y, x, y
        if t in ("LineString", "MultiPoint"):
            xy = np.asarray(g["xy"], dtype=np.float64).reshape(-1, 2)
            return (float(xy[:, 0].min()), float(xy[:, 1].min()),
                    float(xy[:, 0].max()), float(xy[:, 1].max()))
        if t == "Polygon":
            return geom.rings_bbox(g["rings"])
        if t == "MultiLineString":
            bs = [(_gbbox({"type": "LineString", "xy": ln}))
                  for ln in g["lines"]]
        elif t == "MultiPolygon":
            bs = [geom.rings_bbox(r) for r in g["polys"]]
        else:
            bs = [_gbbox(s) for s in g["geoms"]]
        bs = np.asarray(bs, dtype=np.float64)
        return (float(bs[:, 0].min()), float(bs[:, 1].min()),
                float(bs[:, 2].max()), float(bs[:, 3].max()))

    def partial(b: pa.Table) -> pa.Table:
        counts = dict.fromkeys(TYPES, 0)
        minx = miny = np.inf
        maxx = maxy = -np.inf
        n = 0
        for blob in b.column(wkb_col).to_pylist():
            if blob is None:
                continue
            g = _wkb.loads(blob)
            counts[g["type"]] = counts.get(g["type"], 0) + 1
            x0, y0, x1, y1 = _gbbox(g)
            minx, miny = min(minx, x0), min(miny, y0)
            maxx, maxy = max(maxx, x1), max(maxy, y1)
            n += 1
        cols = {"n_features": pa.array([n], pa.int64())}
        for t in TYPES:
            cols["n_" + t.lower()] = pa.array([counts[t]], pa.int64())
        cols.update({
            "minx": pa.array([minx], pa.float64()),
            "miny": pa.array([miny], pa.float64()),
            "maxx": pa.array([maxx], pa.float64()),
            "maxy": pa.array([maxy], pa.float64())})
        return pa.table(cols)

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    out = {"n_features": sum(p["n_features"] for p in parts)}
    for t in TYPES:
        out["n_" + t.lower()] = sum(p["n_" + t.lower()] for p in parts)
    live = [p for p in parts if p["n_features"] > 0]
    out["minx"] = min((p["minx"] for p in live), default=float("nan"))
    out["miny"] = min((p["miny"] for p in live), default=float("nan"))
    out["maxx"] = max((p["maxx"] for p in live), default=float("nan"))
    out["maxy"] = max((p["maxy"] for p in live), default=float("nan"))
    return pa.table({k: [v] for k, v in out.items()})
