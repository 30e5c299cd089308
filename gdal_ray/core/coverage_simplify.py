"""Topology-preserving coverage simplification — the engine's analog of
``gdal vector simplify-coverage`` (apps/gdalalg_vector_simplify_coverage.cpp,
GEOS CoverageSimplifier semantics).

Method (pure numpy, per coverage group):
  1. snap vertices to the overlay grid (SNAP=1e-9°) and build the undirected
     segment graph of ALL rings;
  2. nodes = vertices of degree ≠ 2 (junctions where ≥3 faces meet, or
     chain endpoints); every non-node vertex lies on exactly one node-to-
     node CHAIN;
  3. simplify each chain once with Douglas-Peucker (endpoints pinned;
     isolated rings pin vertex 0 + the farthest vertex);
  4. rebuild every ring by FILTERING its original vertex sequence to the
     global kept set — the two faces sharing a chain keep the identical
     vertex subset, so shared boundaries remain vertex-identical and the
     coverage stays overlap/gap-free by construction.
"""

from __future__ import annotations

import numpy as np

SNAP = 1e-9


def _key(pt) -> tuple[int, int]:
    return (int(round(pt[0] / SNAP)), int(round(pt[1] / SNAP)))


def _dp_keep(pts: np.ndarray, tol: float) -> np.ndarray:
    """Douglas-Peucker on an open chain: boolean keep mask (endpoints True).
    Iterative stack — no recursion limits on long chains."""
    n = len(pts)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = pts[j] - pts[i]
        L2 = float(seg @ seg)
        mid = pts[i + 1:j] - pts[i]
        if L2 == 0.0:
            d = np.sqrt((mid ** 2).sum(axis=1))
        else:
            t = np.clip((mid @ seg) / L2, 0.0, 1.0)
            d = np.sqrt(((mid - t[:, None] * seg[None, :]) ** 2).sum(axis=1))
        k = int(np.argmax(d))
        if d[k] > tol:
            keep[i + 1 + k] = True
            stack.append((i, i + 1 + k))
            stack.append((i + 1 + k, j))
    return keep


def simplify_coverage(faces: dict, tolerance: float,
                      pinned: set | None = None) -> dict:
    """faces: {fid: [polys]} where each poly is a list of (n, 2) rings
    (first = shell, rest = holes; rings closed: first == last vertex).
    Returns the same structure with shared-edge-consistent simplification.

    ``pinned`` fids keep EVERY vertex (used by the cell-partitioned scale
    path for faces spanning more than a 2×2 cell block: a pinned face
    simplifies identically — i.e. not at all — in every group that sees it,
    so chains it shares stay consistent across groups).

    Determinism contract (load-bearing for the bbox-halo scale path): the
    kept-vertex decision for any chain is a pure function of the chain's
    geometry and the SET of faces incident to it — faces are walked in
    sorted-fid order and every chain is Douglas-Peucker'd in a canonical
    orientation, so two different cell groups that both contain a chain's
    incident faces compute the identical kept subset."""
    pinned = pinned or set()
    # ---- pass 1: degree of every snapped vertex in the segment graph ----
    seg_count: dict = {}
    for polys in faces.values():
        for rings in polys:
            for ring in rings:
                r = np.asarray(ring, dtype=np.float64)
                keys = [_key(p) for p in r[:-1]]
                m = len(keys)
                for a in range(m):
                    s = (keys[a], keys[(a + 1) % m])
                    if s[0] > s[1]:
                        s = (s[1], s[0])
                    seg_count[s] = seg_count.get(s, 0) + 1
    degree: dict = {}
    for (a, b) in seg_count:
        degree[a] = degree.get(a, 0) + 1
        degree[b] = degree.get(b, 0) + 1
    nodes = {v for v, d in degree.items() if d != 2}

    # ---- pass 2: walk chains once, decide the kept vertex set ----
    # sorted-fid iteration: the first face to visit a chain wins the DP, and
    # that winner must be identical in every cell group that sees the chain
    kept: set = set(nodes)
    visited: set = set()
    for _fid in sorted(faces):
        polys = faces[_fid]
        for rings in polys:
            for ring in rings:
                r = np.asarray(ring, dtype=np.float64)[:-1]
                m = len(r)
                keys = [_key(p) for p in r]
                node_pos = [i for i in range(m) if keys[i] in nodes]
                if not node_pos:
                    # isolated ring: closed chain — pin vertex 0 and the
                    # farthest vertex so the ring cannot collapse
                    ck = ("ring", min(keys))
                    if ck in visited:
                        continue
                    visited.add(ck)
                    far = int(np.argmax(((r - r[0]) ** 2).sum(axis=1)))
                    far = max(far, 1)
                    for seg in ((np.vstack([r[:far + 1]]), 0),
                                (np.vstack([r[far:], r[:1]]), far)):
                        pts, off = seg
                        mask = _dp_keep(pts, tolerance)
                        for idx in np.nonzero(mask)[0]:
                            kept.add(keys[(off + int(idx)) % m])
                    continue
                # open chains between consecutive nodes along this ring
                np_ = len(node_pos)
                for ni in range(np_):
                    i0 = node_pos[ni]
                    i1 = node_pos[(ni + 1) % np_]
                    idxs = []
                    i = i0
                    while True:
                        idxs.append(i)
                        if i == i1 and idxs[1:]:
                            break
                        i = (i + 1) % m
                        if i == i0:
                            idxs.append(i)
                            break
                    ck = (keys[i0], keys[i1],
                          keys[idxs[1]] if len(idxs) > 1 else keys[i0],
                          keys[idxs[-2]] if len(idxs) > 1 else keys[i1])
                    rk = (ck[1], ck[0], ck[3], ck[2])
                    if ck in visited or rk in visited:
                        continue
                    visited.add(ck)
                    pts = r[[i % m for i in idxs]]
                    # canonical orientation: DP argmax tie-breaks depend on
                    # point order, so walk every chain the same way in every
                    # group (key-lexicographic direction)
                    ch_keys = [keys[i % m] for i in idxs]
                    if ch_keys[::-1] < ch_keys:
                        mask = _dp_keep(pts[::-1].copy(), tolerance)[::-1]
                    else:
                        mask = _dp_keep(pts, tolerance)
                    for k_i in np.nonzero(mask)[0]:
                        kept.add(keys[idxs[int(k_i)] % m])

    # pinned faces force-keep all their vertices (scale-partition contract)
    for fid in pinned:
        for rings in faces.get(fid, []):
            for ring in rings:
                for p in np.asarray(ring, dtype=np.float64)[:-1]:
                    kept.add(_key(p))

    # ---- pass 3: rebuild rings by filtering to the kept set ----
    out: dict = {}
    for fid, polys in faces.items():
        new_polys = []
        for rings in polys:
            new_rings = []
            for ring in rings:
                r = np.asarray(ring, dtype=np.float64)[:-1]
                mask = [(_key(p) in kept) for p in r]
                fr = r[np.asarray(mask, bool)]
                if len(fr) < 3:
                    fr = r            # refuse to collapse a ring
                new_rings.append(np.vstack([fr, fr[:1]]))
            new_polys.append(new_rings)
        out[fid] = new_polys
    return out
