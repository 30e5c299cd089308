"""Spatial cell index — the engine's H3/S2 replacement.

The reference answers spatial predicates with per-layer R-tree / quadtree
indexes built in one process (GPKG RTree at
``ogr/ogrsf_frmts/gpkg/ogrgeopackagetablelayer.cpp:4471``, shapefile .qix
quadtree, ``port/cpl_quad_tree.cpp``).  A single shared index does not
distribute, so this engine replaces it with **cell-keyed co-partitioning**
(SURVEY §2.5): both sides of a spatial join get int64 cell keys from a fixed
world grid, a salted ``groupby(cell)`` co-locates candidates, and the exact
predicate runs vectorized inside ``map_groups``.

The grid is the WebMercator-style lon/lat quadtree at a chosen level L
(cell = (L, x, y) packed into int64; x = floor((lon+180)/360 * 2^L),
y = floor((90-lat)/180 * 2^L)).  It is deterministic pure arithmetic, so the
same keys are reproducible in DuckDB SQL for the correctness oracle — which
a real H3 dependency would not be.

Skew: world-scale data piles into few cells at coarse levels.  Callers salt
hot cells (``salt_cells``) and/or pick L so the expected per-cell candidate
count stays bounded; both sides must use the SAME L.
"""

from __future__ import annotations

import numpy as np

DEFAULT_LEVEL = 7  # 128×128 world grid ≈ 2.8° cells


def cell_xy(lon, lat, level: int = DEFAULT_LEVEL):
    n = np.int64(1) << level
    cx = np.clip(np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / 360.0 * n), 0, n - 1).astype(np.int64)
    cy = np.clip(np.floor((90.0 - np.asarray(lat, dtype=np.float64)) / 180.0 * n), 0, n - 1).astype(np.int64)
    return cx, cy


def pack(cx, cy, level: int = DEFAULT_LEVEL) -> np.ndarray:
    return (np.int64(level) << 58) | (np.asarray(cx, dtype=np.int64) << 29) | np.asarray(cy, dtype=np.int64)


def cell_of(lon, lat, level: int = DEFAULT_LEVEL) -> np.ndarray:
    cx, cy = cell_xy(lon, lat, level)
    return pack(cx, cy, level)


def cells_for_bbox(minx: float, miny: float, maxx: float, maxy: float,
                   level: int = DEFAULT_LEVEL) -> np.ndarray:
    """All cells a lon/lat bbox touches (for the polygon/footprint side of a
    join: one row is emitted per covering cell, then exact-tested in-group)."""
    cx0, cy1 = cell_xy(minx, miny, level)  # note y inverts
    cx1, cy0 = cell_xy(maxx, maxy, level)
    xs = np.arange(int(cx0), int(cx1) + 1, dtype=np.int64)
    ys = np.arange(int(cy0), int(cy1) + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys)
    return pack(gx.ravel(), gy.ravel(), level)


def cell_bounds(cell: int):
    level = int(cell) >> 58
    cx = (int(cell) >> 29) & ((1 << 29) - 1)
    cy = int(cell) & ((1 << 29) - 1)
    n = 1 << level
    minx = cx / n * 360.0 - 180.0
    maxx = (cx + 1) / n * 360.0 - 180.0
    maxy = 90.0 - cy / n * 180.0
    miny = 90.0 - (cy + 1) / n * 180.0
    return minx, miny, maxx, maxy


def salt_cells(cells: np.ndarray, ids: np.ndarray, hot: dict | None,
               num_salts: int = 8) -> np.ndarray:
    """Append a salt to keys of hot cells: key' = key*num_salts + (hash(id) %
    num_salts).  ``hot`` maps cell -> True for cells whose row count exceeds
    the skew threshold (computed by a cheap pre-aggregation pass); non-hot
    cells get salt 0 so the broadcast side only replicates into hot cells."""
    cells = np.asarray(cells, dtype=np.int64)
    out = cells * np.int64(num_salts)
    if hot:
        hotmask = np.isin(cells, np.fromiter(hot.keys(), dtype=np.int64))
        h = (np.asarray(ids)[hotmask].astype(np.int64) * np.int64(2654435761)) % num_salts
        out[hotmask] += h
    return out
