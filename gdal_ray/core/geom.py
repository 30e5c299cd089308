"""Vectorized computational geometry — the GEOS replacement.

Predicate semantics pinned to the reference's OGR/GEOS surface
(``ogr/ogrgeometry.cpp``: Intersects :575, Within :6259, Contains :6332,
Distance :3815, Centroid :6523, Simplify :6775, area/boundary helpers), and
OGC SFS definitions:

  - ``intersects(A, B)``  — interiors OR boundaries share any point.
  - ``contains(A, B)``    — B entirely in A's closure AND interiors touch
                            (a point on A's boundary is NOT contained).
  - ``within(A, B)``      == contains(B, A).

Representation: polygons are ring-lists from :mod:`gdal_ray.core.wkb`
(shell first; holes in any orientation — even-odd counting makes orientation
irrelevant for point location, the same robustness choice GDAL's scanline
rasterizer makes in alg/llrasterize.cpp).

Everything hot is vectorized over *many points × one geometry* or chunked
edge-pair tests; per-group loops in map_groups stay short because cell
co-partitioning (gdal_ray.core.cells) bounds candidate sets first.
"""

from __future__ import annotations

import numpy as np


# ---------- point location ----------

def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd crossing parity of points vs one closed ring. Returns bool
    (odd number of crossings). Points exactly on edges are resolved by
    on-boundary tests in callers."""
    x1 = ring[:-1, 0]; y1 = ring[:-1, 1]
    x2 = ring[1:, 0]; y2 = ring[1:, 1]
    px = px[:, None]; py = py[:, None]
    cond = (y1[None, :] > py) != (y2[None, :] > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1[None, :] + (py - y1[None, :]) * (x2 - x1)[None, :] / (y2 - y1)[None, :]
    crossed = cond & (px < xint)
    return (crossed.sum(axis=1) % 2).astype(bool)


def points_on_rings(px: np.ndarray, py: np.ndarray, rings, eps: float = 0.0) -> np.ndarray:
    """True where a point lies exactly on any ring segment (within eps)."""
    on = np.zeros(px.shape[0], dtype=bool)
    for ring in rings:
        x1 = ring[:-1, 0]; y1 = ring[:-1, 1]
        x2 = ring[1:, 0]; y2 = ring[1:, 1]
        dx = (x2 - x1)[None, :]; dy = (y2 - y1)[None, :]
        rx = px[:, None] - x1[None, :]; ry = py[:, None] - y1[None, :]
        cross = np.abs(rx * dy - ry * dx)
        dot = rx * dx + ry * dy
        L2 = dx * dx + dy * dy
        seg_ok = (cross <= eps * np.sqrt(np.maximum(L2, 1e-300)) + 1e-300) if eps > 0 else (cross == 0.0)
        within = (dot >= 0) & (dot <= L2)
        on |= np.any(seg_ok & within, axis=1)
    return on


def locate_points(px, py, rings) -> np.ndarray:
    """0 = exterior, 1 = boundary, 2 = interior (even-odd across all rings,
    so holes subtract)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    parity = np.zeros(px.shape[0], dtype=np.int64)
    for ring in rings:
        parity += points_in_ring(px, py, ring).astype(np.int64)
    inside = (parity % 2).astype(bool)
    boundary = points_on_rings(px, py, rings)
    out = np.zeros(px.shape[0], dtype=np.int8)
    out[inside] = 2
    out[boundary] = 1
    return out


def points_intersect_polygon(px, py, rings) -> np.ndarray:
    """ST_Intersects(point, polygon): interior OR boundary."""
    return locate_points(px, py, rings) >= 1


def points_within_polygon(px, py, rings) -> np.ndarray:
    """ST_Within(point, polygon): strict interior (boundary excluded),
    per ogrgeometry.cpp:6259 / SFS."""
    return locate_points(px, py, rings) == 2


# ---------- bbox ----------

def rings_bbox(rings) -> tuple[float, float, float, float]:
    shell = rings[0]
    return (float(shell[:, 0].min()), float(shell[:, 1].min()),
            float(shell[:, 0].max()), float(shell[:, 1].max()))


def bbox_intersects(b1, b2) -> bool:
    return not (b1[2] < b2[0] or b2[2] < b1[0] or b1[3] < b2[1] or b2[3] < b1[1])


# ---------- segment intersection (for polygon×polygon predicates) ----------

def _segments_cross(a1, a2, b1, b2) -> np.ndarray:
    """Pairwise-broadcast proper-or-touching segment intersection test.
    a*: (Na,2) segment endpoints; b*: (Nb,2). Returns (Na, Nb) bool."""
    d1 = a2 - a1  # (Na,2)
    d2 = b2 - b1  # (Nb,2)
    r = d1[:, None, :]          # (Na,1,2)
    s = d2[None, :, :]          # (1,Nb,2)
    qp = b1[None, :, :] - a1[:, None, :]   # (Na,Nb,2)
    rxs = r[..., 0] * s[..., 1] - r[..., 1] * s[..., 0]
    qpxr = qp[..., 0] * r[..., 1] - qp[..., 1] * r[..., 0]
    qpxs = qp[..., 0] * s[..., 1] - qp[..., 1] * s[..., 0]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = qpxs / rxs
        u = qpxr / rxs
    general = (rxs != 0) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    # collinear overlapping case
    col = (rxs == 0) & (qpxr == 0)
    if col.any():
        rr = np.sum(r * r, axis=-1)  # (Na,1)
        t0 = np.sum(qp * r, axis=-1) / np.where(rr == 0, 1, rr)
        t1 = t0 + np.sum(s * r, axis=-1) / np.where(rr == 0, 1, rr)
        lo = np.minimum(t0, t1)
        hi = np.maximum(t0, t1)
        col &= (hi >= 0) & (lo <= 1)
    return general | col


def _ring_edges(rings):
    a1 = np.concatenate([r[:-1] for r in rings], axis=0)
    a2 = np.concatenate([r[1:] for r in rings], axis=0)
    return a1, a2


def polygons_intersect(rings_a, rings_b, chunk: int = 4096) -> bool:
    """ST_Intersects for two (valid) polygons-with-holes:
    any edge pair touches/crosses, or one contains a vertex of the other."""
    if not bbox_intersects(rings_bbox(rings_a), rings_bbox(rings_b)):
        return False
    # vertex containment (covers containment without edge crossings)
    pa = rings_a[0]
    pb = rings_b[0]
    if locate_points(pb[:, 0], pb[:, 1], rings_a).max(initial=0) >= 1:
        return True
    if locate_points(pa[:, 0], pa[:, 1], rings_b).max(initial=0) >= 1:
        return True
    a1, a2 = _ring_edges(rings_a)
    b1, b2 = _ring_edges(rings_b)
    for i in range(0, len(a1), chunk):
        if _segments_cross(a1[i:i + chunk], a2[i:i + chunk], b1, b2).any():
            return True
    return False


def polygon_contains_polygon(rings_a, rings_b) -> bool:
    """A contains B: every B vertex inside/on A, and no B edge crosses an A
    edge into A's exterior. Sufficient for valid polygons: all B vertices in
    closure(A) and no proper edge crossings and a B interior point in
    interior(A)."""
    loc = locate_points(rings_b[0][:, 0], rings_b[0][:, 1], rings_a)
    if (loc == 0).any():
        return False
    a1, a2 = _ring_edges(rings_a)
    b1, b2 = _ring_edges(rings_b)
    # proper crossings (exclude endpoint touches) would put part of B outside
    d1 = a2 - a1
    r = d1[:, None, :]
    s = (b2 - b1)[None, :, :]
    qp = b1[None, :, :] - a1[:, None, :]
    rxs = r[..., 0] * s[..., 1] - r[..., 1] * s[..., 0]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (qp[..., 0] * s[..., 1] - qp[..., 1] * s[..., 0]) / rxs
        u = (qp[..., 0] * r[..., 1] - qp[..., 1] * r[..., 0]) / rxs
    proper = (rxs != 0) & (t > 1e-12) & (t < 1 - 1e-12) & (u > 1e-12) & (u < 1 - 1e-12)
    if proper.any():
        return False
    # need an interior point of B strictly interior to A (SFS: interiors meet)
    cx, cy = representative_point(rings_b)
    return locate_points(np.array([cx]), np.array([cy]), rings_a)[0] == 2


# ---------- measures ----------

def ring_area(ring: np.ndarray) -> float:
    """Signed shoelace area (CCW positive)."""
    x = ring[:, 0]; y = ring[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def polygon_area(rings) -> float:
    """Absolute area, holes subtracted (even-odd): |shell| - sum |holes|."""
    a = abs(ring_area(rings[0]))
    for h in rings[1:]:
        a -= abs(ring_area(h))
    return a


def polygon_centroid(rings) -> tuple[float, float]:
    """Area-weighted centroid with holes (ogrgeometry.cpp:6523 semantics):
    per-ring centroid × |area|, holes entering with negative weight
    regardless of stored ring orientation."""
    sa = sx = sy = 0.0
    for i, ring in enumerate(rings):
        x = ring[:-1, 0]; y = ring[:-1, 1]
        x2 = ring[1:, 0]; y2 = ring[1:, 1]
        cross = x * y2 - x2 * y
        a = float(np.sum(cross)) / 2.0
        sign = 1.0 if i == 0 else -1.0
        mag = abs(a) * sign
        if a != 0:
            cx = float(np.sum((x + x2) * cross)) / (6.0 * a)
            cy = float(np.sum((y + y2) * cross)) / (6.0 * a)
        else:
            cx = float(ring[:, 0].mean()); cy = float(ring[:, 1].mean())
        sx += cx * mag
        sy += cy * mag
        sa += mag
    if sa == 0.0:
        return float(rings[0][:, 0].mean()), float(rings[0][:, 1].mean())
    return sx / sa, sy / sa


def representative_point(rings) -> tuple[float, float]:
    """A point guaranteed interior: centroid if interior, else scanline
    midpoint at the shell bbox's vertical middle."""
    cx, cy = polygon_centroid(rings)
    if locate_points(np.array([cx]), np.array([cy]), rings)[0] == 2:
        return cx, cy
    minx, miny, maxx, maxy = rings_bbox(rings)
    y = (miny + maxy) / 2.0
    # find x-intersections of the horizontal line with all edges
    xs = []
    for ring in rings:
        y1 = ring[:-1, 1]; y2 = ring[1:, 1]
        x1 = ring[:-1, 0]; x2 = ring[1:, 0]
        m = (y1 > y) != (y2 > y)
        if m.any():
            xi = x1[m] + (y - y1[m]) * (x2[m] - x1[m]) / (y2[m] - y1[m])
            xs.extend(xi.tolist())
    xs = sorted(xs)
    for i in range(0, len(xs) - 1, 2):
        mid = (xs[i] + xs[i + 1]) / 2.0
        if locate_points(np.array([mid]), np.array([y]), rings)[0] == 2:
            return mid, y
    return cx, cy


def point_segment_distance(px, py, a1, a2) -> np.ndarray:
    """Distances from points (n,) to segments (m,2)-(m,2): (n, m)."""
    px = np.asarray(px, dtype=np.float64)[:, None]
    py = np.asarray(py, dtype=np.float64)[:, None]
    dx = (a2[:, 0] - a1[:, 0])[None, :]
    dy = (a2[:, 1] - a1[:, 1])[None, :]
    L2 = dx * dx + dy * dy
    t = ((px - a1[None, :, 0]) * dx + (py - a1[None, :, 1]) * dy) / np.where(L2 == 0, 1, L2)
    t = np.clip(t, 0.0, 1.0)
    cx = a1[None, :, 0] + t * dx
    cy = a1[None, :, 1] + t * dy
    return np.hypot(px - cx, py - cy)


def distance_point_polygon(px, py, rings) -> np.ndarray:
    """ST_Distance(point, polygon): 0 inside/boundary, else min edge dist."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    a1, a2 = _ring_edges(rings)
    d = point_segment_distance(px, py, a1, a2).min(axis=1)
    loc = locate_points(px, py, rings)
    d[loc >= 1] = 0.0
    return d


# ---------- simplify (Douglas-Peucker, ogrgeometry.cpp:6775 Simplify) ----------

def simplify_line(xy: np.ndarray, tol: float) -> np.ndarray:
    n = len(xy)
    if n <= 2:
        return xy
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = xy[[i, j]]
        d = point_segment_distance(xy[i + 1:j, 0], xy[i + 1:j, 1], seg[:1], seg[1:]).ravel()
        k = int(np.argmax(d))
        if d[k] > tol:
            m = i + 1 + k
            keep[m] = True
            stack.append((i, m))
            stack.append((m, j))
    return xy[keep]


def simplify_ring(ring: np.ndarray, tol: float) -> np.ndarray:
    out = simplify_line(ring, tol)
    if len(out) < 4:  # degenerate; keep original closed triangle minimum
        return ring
    return out


# ---------- segmentize (gdalalg_vector_segmentize) ----------

def segmentize_line(xy: np.ndarray, max_len: float) -> np.ndarray:
    segs = [xy[:1]]
    for i in range(len(xy) - 1):
        p, q = xy[i], xy[i + 1]
        d = float(np.hypot(*(q - p)))
        n = max(1, int(np.ceil(d / max_len)))
        ts = np.linspace(0.0, 1.0, n + 1)[1:]
        segs.append(p[None, :] + ts[:, None] * (q - p)[None, :])
    return np.concatenate(segs, axis=0)


# ---------- convex hull (ogrgeometry.cpp:4446 ConvexHull) ----------

def convex_hull(xy: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain; returns closed CCW ring."""
    pts = np.unique(np.asarray(xy, dtype=np.float64), axis=0)
    if len(pts) < 3:
        return np.vstack([pts, pts[::-1], pts[:1]])
    # lexicographic sort
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]

    def half(points):
        out = []
        for p in points:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    ring = np.array(lower[:-1] + upper[:-1] + [lower[0]])
    return ring


# ---------- buffer (ogrgeometry.cpp:4946 Buffer; round joins) ----------

def buffer_point(x: float, y: float, dist: float, quadsegs: int = 30) -> np.ndarray:
    """Point buffer = regular polygon circle, closed ring (GEOS default
    quadrant segmentation is 8; we default finer)."""
    t = np.linspace(0.0, 2.0 * np.pi, 4 * quadsegs, endpoint=False)
    ring = np.column_stack([x + dist * np.cos(t), y + dist * np.sin(t)])
    return np.vstack([ring, ring[:1]])


def buffer_polygon_convex(rings, dist: float, quadsegs: int = 8) -> np.ndarray:
    """Positive buffer of a polygon via hull-of-vertex-circles — EXACT for
    convex inputs, a convex over-approximation for concave ones (documented
    limitation; full GEOS offsetting is out of scope for round 1)."""
    shell = rings[0]
    pts = []
    for vx, vy in shell[:-1]:
        pts.append(buffer_point(vx, vy, dist, quadsegs)[:-1])
    return convex_hull(np.concatenate(pts, axis=0))


# ---------- full binary predicate set (ogr/ogrgeometry.cpp:6006-6406) ----------
#
# Touches/Overlaps/Disjoint/Equals complete the GEOS predicate set beyond
# intersects/within/contains.  Area predicates are decided from boundary
# contact (polygons_intersect, which counts boundaries) plus the EXACT
# interior intersection area from the boolean overlay engine — degenerate
# (zero-area) intersections are dropped by the overlay, which is precisely
# the interiors-do-not-intersect test DE-9IM needs.

def _inter_area(rings_a, rings_b) -> float:
    from . import overlay as _OV
    return _OV.area_of(_OV.overlay([rings_a], [rings_b], "intersection"))


def polygons_touch(rings_a, rings_b) -> bool:
    """Boundaries meet but interiors do not (DE-9IM F***T****-family)."""
    if not polygons_intersect(rings_a, rings_b):
        return False
    return _inter_area(rings_a, rings_b) <= 1e-12


def polygons_disjoint(rings_a, rings_b) -> bool:
    return not polygons_intersect(rings_a, rings_b)


def polygons_overlap(rings_a, rings_b) -> bool:
    """Interiors intersect, neither covers the other (same dimension)."""
    ia = _inter_area(rings_a, rings_b)
    if ia <= 1e-12:
        return False
    aa, ab = polygon_area(rings_a), polygon_area(rings_b)
    rel = 1e-9 * max(aa, ab, 1e-12)
    return ia < aa - rel and ia < ab - rel


def polygons_equal(rings_a, rings_b) -> bool:
    ia = _inter_area(rings_a, rings_b)
    aa, ab = polygon_area(rings_a), polygon_area(rings_b)
    rel = 1e-9 * max(aa, ab, 1e-12)
    return abs(ia - aa) <= rel and abs(ia - ab) <= rel


def polygon_relate(rings_a, rings_b) -> str:
    """Named spatial relation of two polygons: one of disjoint / touches /
    equals / contains / within / overlaps."""
    if not polygons_intersect(rings_a, rings_b):
        return "disjoint"
    ia = _inter_area(rings_a, rings_b)
    if ia <= 1e-12:
        return "touches"
    aa, ab = polygon_area(rings_a), polygon_area(rings_b)
    rel = 1e-9 * max(aa, ab, 1e-12)
    eq_a = abs(ia - aa) <= rel
    eq_b = abs(ia - ab) <= rel
    if eq_a and eq_b:
        return "equals"
    if eq_b:
        return "contains"   # A covers B
    if eq_a:
        return "within"     # B covers A
    return "overlaps"


def _edge_strip(p0, p1, dist: float) -> np.ndarray:
    """Closed rectangle ring offset ±dist around segment p0→p1."""
    p0 = np.asarray(p0, np.float64)
    p1 = np.asarray(p1, np.float64)
    d = p1 - p0
    L = float(np.hypot(d[0], d[1]))
    if L == 0.0:
        return None
    n = np.array([-d[1], d[0]]) / L * dist
    ring = np.array([p0 + n, p1 + n, p1 - n, p0 - n, p0 + n])
    return ring


def buffer_polygon(rings, dist: float, quadsegs: int = 8):
    """Round-join polygon buffer via the boolean overlay engine
    (OGRGeometry::Buffer / GEOS OffsetCurve semantics,
    ogr/ogrgeometry.cpp:4946): positive dist = union of the polygon with
    per-edge strips and per-vertex discs over EVERY ring; negative dist =
    the polygon minus the boundary's strip/disc union (erosion).  Exact up
    to arc discretization (4·quadsegs points per circle), valid for concave
    inputs and holes — superseding buffer_polygon_convex.

    Returns a list of polygons ([rings] each) — buffers can split/merge."""
    from . import overlay as _OV
    r = abs(float(dist))
    if r == 0.0:
        return [list(rings)]
    pieces = []
    for ring in rings:
        ring = np.asarray(ring, np.float64)
        for i in range(len(ring) - 1):
            strip = _edge_strip(ring[i], ring[i + 1], r)
            if strip is not None:
                pieces.append([strip])
            pieces.append([buffer_point(ring[i, 0], ring[i, 1], r, quadsegs)])
    boundary_buf = _OV.union_all(pieces)
    if dist > 0:
        return _OV.union_all([[np.asarray(rg, np.float64) for rg in rings]]
                             + boundary_buf)
    return _OV.overlay([list(rings)], boundary_buf, "difference")
