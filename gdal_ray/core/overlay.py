"""Polygon boolean overlay engine (pure numpy) — the distributed engine's
replacement for the GEOS-backed ``OGRGeometry::Union`` (ogr/ogrgeometry.cpp
:3926), ``UnaryUnion`` (:5648), ``Difference`` (:6109), ``SymDifference``
(:6341) and ``MakeValid`` (:4180) used by the reference's layer algebra
(ogr/ogrlayer.cpp:5804-7847) and dissolve paths.

Method: planar-arrangement overlay with face classification —
  1. gather every ring segment of both operands;
  2. split all segments at every pairwise intersection (proper crossings,
     T-junctions, and collinear overlaps) so the segment set is a planar
     subdivision; snap endpoints to a fixed grid (SNAP) to merge
     near-coincident nodes;
  3. classify the face on each side of every edge by sampling a point
     offset from the edge midpoint and testing even-odd containment
     against each operand (a side is "inside" an operand when ANY of its
     polygons contains the sample — union semantics across an operand's
     own features);
  4. keep the directed edges whose left face is kept and right face is
     not (per the boolean op), then walk rings with the leftmost-turn
     rule; CCW rings are shells, CW rings are holes, holes nest into the
     smallest containing shell.

Robustness contract (documented, not hidden): coordinates are snapped to
``SNAP`` (1e-9°); faces narrower than the sampling offset (~1e-7 of the
local edge length, ≥1e-8 absolute) may be misclassified.  This covers the
engine's workloads (zone/footprint layers with ≥1e-6° features); it is not
a general-purpose exact-arithmetic CAD kernel.
"""

from __future__ import annotations

import numpy as np

from . import geom

SNAP = 1e-9
_EPS = 1e-12


# ---------- segment gathering / splitting ----------

def _close(ring: np.ndarray) -> np.ndarray:
    ring = np.asarray(ring, dtype=np.float64)
    if len(ring) and (ring[0] != ring[-1]).any():
        ring = np.vstack([ring, ring[:1]])
    return ring


def _gather_segments(operands) -> np.ndarray:
    """All ring edges of all polygons of all operands → (M, 4) array."""
    segs = []
    for polys in operands:
        for rings in polys:
            for ring in rings:
                r = _close(ring)
                if len(r) < 2:
                    continue
                segs.append(np.hstack([r[:-1], r[1:]]))
    if not segs:
        return np.empty((0, 4), dtype=np.float64)
    s = np.vstack(segs)
    # snap endpoints up front so identical borders share exact coordinates
    return np.round(s / SNAP) * SNAP


def _cross(ax, ay, bx, by):
    return ax * by - ay * bx


def _split_segments(segs: np.ndarray, chunk: int = 1024) -> np.ndarray:
    """Split every segment at every intersection with every other segment
    (proper crossings, T-junctions, collinear overlaps).  Returns the split
    (K, 4) segment set with all endpoints snapped — a planar subdivision up
    to SNAP."""
    n = len(segs)
    if n == 0:
        return segs
    p = segs[:, 0:2]
    q = segs[:, 2:4]
    r = q - p
    seg_len2 = (r * r).sum(axis=1)
    tsplit: list[list[float]] = [[] for _ in range(n)]

    for s0 in range(0, n, chunk):
        s1 = min(s0 + chunk, n)
        # pair block (i in [s0,s1), j in [0,n)) — j > i handled by symmetry
        pi = p[s0:s1, None, :]
        ri = r[s0:s1, None, :]
        pj = p[None, :, :]
        rj = r[None, :, :]
        d = pj - pi                                       # (ci, n, 2)
        denom = _cross(ri[..., 0], ri[..., 1], rj[..., 0], rj[..., 1])
        cross_d_rj = _cross(d[..., 0], d[..., 1], rj[..., 0], rj[..., 1])
        cross_d_ri = _cross(d[..., 0], d[..., 1], ri[..., 0], ri[..., 1])
        scale = np.maximum(np.abs(ri).sum(axis=2) * np.abs(rj).sum(axis=2),
                           _EPS)
        nonpar = np.abs(denom) > 1e-9 * scale
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.where(nonpar, cross_d_rj / denom, np.nan)   # param on i
            u = np.where(nonpar, cross_d_ri / denom, np.nan)   # param on j
        tol = 1e-9
        hit = nonpar & (t > tol) & (t < 1 - tol) \
            & (u >= -tol) & (u <= 1 + tol)
        ii, jj = np.nonzero(hit)
        for k in range(ii.size):
            tsplit[s0 + ii[k]].append(float(t[ii[k], jj[k]]))
        # collinear overlaps: parallel AND d parallel to ri → project j's
        # endpoints onto i's parameter
        par = ~nonpar
        col = par & (np.abs(cross_d_ri) <= 1e-9 * np.maximum(
            np.abs(d).sum(axis=2) * np.abs(ri).sum(axis=2), _EPS))
        ci, cj = np.nonzero(col)
        if ci.size:
            li = seg_len2[s0 + ci]
            ok = li > 0
            ci, cj = ci[ok], cj[ok]
            for a_end in (p, q):
                tt = ((a_end[cj] - p[s0 + ci]) * r[s0 + ci]).sum(axis=1) \
                    / seg_len2[s0 + ci]
                for k in range(ci.size):
                    v = float(tt[k])
                    if 1e-12 < v < 1 - 1e-12:
                        tsplit[s0 + ci[k]].append(v)

    out = []
    for i in range(n):
        if seg_len2[i] == 0:
            continue
        if tsplit[i]:
            ts = np.unique(np.concatenate([[0.0, 1.0], tsplit[i]]))
            pts = p[i][None, :] + ts[:, None] * r[i][None, :]
            pts = np.round(pts / SNAP) * SNAP
            seg = np.hstack([pts[:-1], pts[1:]])
            keep = (seg[:, 0:2] != seg[:, 2:4]).any(axis=1)
            out.append(seg[keep])
        else:
            out.append(segs[i:i + 1])
    return np.vstack(out) if out else segs[:0]


def _dedupe_edges(segs: np.ndarray) -> np.ndarray:
    """Unique UNDIRECTED edges (shared borders collapse to one edge)."""
    if len(segs) == 0:
        return segs
    a = np.round(segs[:, 0:2] / SNAP).astype(np.int64)
    b = np.round(segs[:, 2:4] / SNAP).astype(np.int64)
    # canonical direction: lexicographically smaller endpoint first
    swap = (a[:, 0] > b[:, 0]) | ((a[:, 0] == b[:, 0]) & (a[:, 1] > b[:, 1]))
    lo = np.where(swap[:, None], b, a)
    hi = np.where(swap[:, None], a, b)
    key = np.concatenate([lo, hi], axis=1)
    _, idx = np.unique(key, axis=0, return_index=True)
    lo, hi = lo[idx], hi[idx]
    return np.concatenate([lo, hi], axis=1).astype(np.float64) * SNAP


# ---------- classification ----------

def _inside_operand(px: np.ndarray, py: np.ndarray, polys) -> np.ndarray:
    """Even-odd containment per polygon, OR-ed across the operand's
    polygons (union semantics across its own features)."""
    out = np.zeros(px.size, dtype=bool)
    for rings in polys:
        todo = ~out
        if not todo.any():
            break
        idx = np.nonzero(todo)[0]
        parity = np.zeros(idx.size, dtype=np.int64)
        for ring in rings:
            parity += geom.points_in_ring(px[idx], py[idx],
                                          _close(ring)).astype(np.int64)
        out[idx[(parity % 2).astype(bool)]] = True
    return out


_OPS = {
    "union": lambda a, b: a | b,
    "intersection": lambda a, b: a & b,
    "difference": lambda a, b: a & ~b,
    "symdifference": lambda a, b: a ^ b,
}


# ---------- ring assembly ----------

def _walk_rings(dir_edges: np.ndarray) -> list[np.ndarray]:
    """Assemble directed boundary edges (kept face strictly left) into
    closed rings with the leftmost-turn rule."""
    if len(dir_edges) == 0:
        return []
    a = np.round(dir_edges[:, 0:2] / SNAP).astype(np.int64)
    b = np.round(dir_edges[:, 2:4] / SNAP).astype(np.int64)
    ang = np.arctan2((dir_edges[:, 3] - dir_edges[:, 1]),
                     (dir_edges[:, 2] - dir_edges[:, 0]))
    out_at: dict[tuple, list[int]] = {}
    for i in range(len(dir_edges)):
        out_at.setdefault((int(a[i, 0]), int(a[i, 1])), []).append(i)
    used = np.zeros(len(dir_edges), dtype=bool)
    rings = []
    TWO_PI = 2.0 * np.pi
    for start in range(len(dir_edges)):
        if used[start]:
            continue
        ring_pts = [dir_edges[start, 0:2]]
        cur = start
        for _ in range(len(dir_edges) + 1):
            used[cur] = True
            ring_pts.append(dir_edges[cur, 2:4])
            head = (int(b[cur, 0]), int(b[cur, 1]))
            cands = out_at.get(head, [])
            rev = ang[cur] + np.pi  # direction back along cur
            best, best_d = -1, None
            for e in cands:
                if used[e] and e != start:
                    continue
                d = (rev - ang[e]) % TWO_PI
                if d < 1e-12:
                    d = TWO_PI  # exact U-turn is the last resort
                if best_d is None or d < best_d:
                    best, best_d = e, d
            if best < 0:
                break  # dangling — drop this walk
            if best == start:
                rings.append(np.vstack(ring_pts))
                break
            cur = best
    return rings


def _ring_interior_sample(ring: np.ndarray, ccw: bool):
    """A point just inside the region BOUNDED by the ring loop."""
    best = np.argmax(np.hypot(ring[1:, 0] - ring[:-1, 0],
                              ring[1:, 1] - ring[:-1, 1]))
    p0, p1 = ring[best], ring[best + 1]
    dx, dy = p1 - p0
    ln = max(np.hypot(dx, dy), _EPS)
    delta = max(1e-8, 1e-7 * ln)
    nx, ny = -dy / ln, dx / ln  # left normal
    sgn = 1.0 if ccw else -1.0  # bounded region is left of a CCW ring
    return (p0[0] + p1[0]) / 2 + sgn * delta * nx, \
        (p0[1] + p1[1]) / 2 + sgn * delta * ny


def overlay(polys_a, polys_b, op: str) -> list[list[np.ndarray]]:
    """Boolean overlay of two operands.

    Each operand is a list of polygons; a polygon is a list of rings
    ((N, 2) float arrays, ring[0] = shell).  ``op`` ∈ union / intersection /
    difference / symdifference.  Returns a list of polygons (shell + holes,
    shells CCW, holes CW) — the regions where ``op(inA, inB)`` holds.
    """
    keep_fn = _OPS[op]
    segs = _gather_segments([polys_a, polys_b])
    if len(segs) == 0:
        return []
    edges = _dedupe_edges(_split_segments(segs))
    if len(edges) == 0:
        return []

    mid = (edges[:, 0:2] + edges[:, 2:4]) / 2.0
    d = edges[:, 2:4] - edges[:, 0:2]
    ln = np.maximum(np.hypot(d[:, 0], d[:, 1]), _EPS)
    delta = np.maximum(1e-8, 1e-7 * ln)
    nx, ny = -d[:, 1] / ln, d[:, 0] / ln  # left normal
    lx, ly = mid[:, 0] + delta * nx, mid[:, 1] + delta * ny
    rx, ry = mid[:, 0] - delta * nx, mid[:, 1] - delta * ny

    in_a = _inside_operand(np.concatenate([lx, rx]),
                           np.concatenate([ly, ry]), polys_a)
    in_b = _inside_operand(np.concatenate([lx, rx]),
                           np.concatenate([ly, ry]), polys_b)
    keep = keep_fn(in_a, in_b)
    keep_l, keep_r = keep[:len(edges)], keep[len(edges):]

    fwd = edges[keep_l & ~keep_r]
    rev = edges[keep_r & ~keep_l][:, [2, 3, 0, 1]]
    dir_edges = np.vstack([fwd, rev])
    rings = _walk_rings(dir_edges)

    shells, holes = [], []
    for ring in rings:
        area = geom.ring_area(ring)
        if abs(area) < SNAP * SNAP:
            continue
        (shells if area > 0 else holes).append(ring)
    # nest holes into the smallest containing shell
    polys = [[s] for s in sorted(shells, key=lambda s: abs(geom.ring_area(s)))]
    for hole in holes:
        hx, hy = _ring_interior_sample(hole, ccw=False)
        for poly in polys:  # smallest-area shells first
            if geom.points_in_ring(np.array([hx]), np.array([hy]),
                                   poly[0])[0]:
                poly.append(hole)
                break
    return polys


def union_all(polys) -> list[list[np.ndarray]]:
    """UnaryUnion of a polygon collection (ogrgeometry.cpp:5648) — the
    dissolve kernel."""
    return overlay(polys, [], "union")


def make_valid(rings) -> list[list[np.ndarray]]:
    """MakeValid (ogrgeometry.cpp:4180, GEOS 'linework' even-odd
    semantics): self-intersecting rings are noded and reassembled; a
    bowtie becomes two polygons."""
    return overlay([rings], [], "union")


def area_of(polys) -> float:
    return float(sum(geom.polygon_area(rings) for rings in polys))
