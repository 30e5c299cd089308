"""Delaunay triangulation (Bowyer-Watson) + barycentric point location —
pure numpy, no scipy.  The reference's ``gdal_grid linear`` algorithm
(alg/gdalgrid.cpp GGA_Linear, alg/delaunay.c) triangulates the scattered
reference points once, then interpolates each query barycentrically inside
its containing triangle.

The triangulation runs ONCE on the (small, broadcast) reference side; the
per-batch work is vectorized triangle location."""

from __future__ import annotations

import numpy as np


def delaunay_triangulation(pts: np.ndarray) -> np.ndarray:
    """(n, 2) points → (T, 3) int32 triangle vertex indices (Bowyer-Watson
    incremental insertion; cocircular ties resolved by strict-interior
    circumcircle tests — any valid Delaunay variant reproduces linear
    functions exactly, which is what the grid oracle pins)."""
    pts = np.asarray(pts, dtype=np.float64)
    n = len(pts)
    if n < 3:
        return np.zeros((0, 3), np.int32)
    cx, cy = pts.mean(axis=0)
    span = max(float(np.ptp(pts[:, 0])), float(np.ptp(pts[:, 1])), 1.0)
    sup = np.array([[cx - 30 * span, cy - 20 * span],
                    [cx + 30 * span, cy - 20 * span],
                    [cx, cy + 30 * span]])
    P = np.vstack([pts, sup])
    tris = np.array([[n, n + 1, n + 2]], dtype=np.int64)
    for i in range(n):
        A, B, C = P[tris[:, 0]], P[tris[:, 1]], P[tris[:, 2]]
        # circumcircle containment, vectorized over all current triangles
        d = 2.0 * (A[:, 0] * (B[:, 1] - C[:, 1]) + B[:, 0] * (C[:, 1] - A[:, 1])
                   + C[:, 0] * (A[:, 1] - B[:, 1]))
        ok = np.abs(d) > 1e-30
        a2 = (A ** 2).sum(axis=1)
        b2 = (B ** 2).sum(axis=1)
        c2 = (C ** 2).sum(axis=1)
        ux = (a2 * (B[:, 1] - C[:, 1]) + b2 * (C[:, 1] - A[:, 1])
              + c2 * (A[:, 1] - B[:, 1])) / np.where(ok, d, 1.0)
        uy = (a2 * (C[:, 0] - B[:, 0]) + b2 * (A[:, 0] - C[:, 0])
              + c2 * (B[:, 0] - A[:, 0])) / np.where(ok, d, 1.0)
        r2 = (ux - A[:, 0]) ** 2 + (uy - A[:, 1]) ** 2
        px, py = P[i]
        # tolerant containment: cocircular configurations (lattices) count
        # as bad — retriangulating the whole cocircular cavity is Delaunay-
        # valid and keeps the cavity star-shaped around the new point
        bad = ok & ((px - ux) ** 2 + (py - uy) ** 2 < r2 * (1.0 + 1e-9))
        if not bad.any():
            # numerically on a circumcircle boundary everywhere — attach to
            # the triangle whose centroid is nearest (degenerate fallback)
            cen = (A + B + C) / 3.0
            bad = np.zeros(len(tris), bool)
            bad[np.argmin((cen[:, 0] - px) ** 2 + (cen[:, 1] - py) ** 2)] = True
        # boundary = edges belonging to exactly one bad triangle
        bt = tris[bad]
        edges = np.concatenate([bt[:, [0, 1]], bt[:, [1, 2]], bt[:, [2, 0]]])
        ekey = np.sort(edges, axis=1)
        uniq, inv, cnt = np.unique(ekey, axis=0, return_inverse=True,
                                   return_counts=True)
        keep_edge = edges[cnt[inv] == 1]
        new = np.column_stack([keep_edge,
                               np.full(len(keep_edge), i, np.int64)])
        tris = np.vstack([tris[~bad], new])
    # drop triangles touching the super-triangle, degenerate slivers
    tris = tris[(tris < n).all(axis=1)]
    A, B, C = P[tris[:, 0]], P[tris[:, 1]], P[tris[:, 2]]
    area2 = np.abs((B[:, 0] - A[:, 0]) * (C[:, 1] - A[:, 1])
                   - (C[:, 0] - A[:, 0]) * (B[:, 1] - A[:, 1]))
    return tris[area2 > 1e-30].astype(np.int32)


def barycentric_interpolate(tris: np.ndarray, ref_xy: np.ndarray,
                            ref_v: np.ndarray, qx: np.ndarray,
                            qy: np.ndarray, *, tri_chunk: int = 512):
    """Interpolate query points inside the triangulation.

    Returns (values float64, inside bool).  Queries outside every triangle
    get inside=False (callers apply GGA_Linear's fallback: nearest point or
    nodata).  Vectorized (queries × triangle-chunk) location with bbox
    prefilter, so memory stays bounded on big query batches."""
    qx = np.asarray(qx, np.float64)
    qy = np.asarray(qy, np.float64)
    m = qx.size
    val = np.zeros(m, np.float64)
    inside = np.zeros(m, bool)
    if len(tris) == 0 or m == 0:
        return val, inside
    A = ref_xy[tris[:, 0]]
    B = ref_xy[tris[:, 1]]
    C = ref_xy[tris[:, 2]]
    det = (B[:, 1] - C[:, 1]) * (A[:, 0] - C[:, 0]) \
        + (C[:, 0] - B[:, 0]) * (A[:, 1] - C[:, 1])
    eps = 1e-12
    for t0 in range(0, len(tris), tri_chunk):
        t1 = min(len(tris), t0 + tri_chunk)
        todo = np.nonzero(~inside)[0]
        if todo.size == 0:
            break
        a, b, c, dt = A[t0:t1], B[t0:t1], C[t0:t1], det[t0:t1]
        x = qx[todo][:, None]
        y = qy[todo][:, None]
        w0 = ((b[:, 1] - c[:, 1])[None, :] * (x - c[:, 0][None, :])
              + (c[:, 0] - b[:, 0])[None, :] * (y - c[:, 1][None, :])) / dt[None, :]
        w1 = ((c[:, 1] - a[:, 1])[None, :] * (x - c[:, 0][None, :])
              + (a[:, 0] - c[:, 0])[None, :] * (y - c[:, 1][None, :])) / dt[None, :]
        w2 = 1.0 - w0 - w1
        hit = (w0 >= -eps) & (w1 >= -eps) & (w2 >= -eps)
        qi, ti = np.nonzero(hit)
        if qi.size == 0:
            continue
        first = np.unique(qi, return_index=True)[1]
        qi, ti = qi[first], ti[first]
        rows = todo[qi]
        tsel = t0 + ti
        v = w0[qi, ti] * ref_v[tris[tsel, 0]] \
            + w1[qi, ti] * ref_v[tris[tsel, 1]] \
            + w2[qi, ti] * ref_v[tris[tsel, 2]]
        val[rows] = v
        inside[rows] = True
    return val, inside
