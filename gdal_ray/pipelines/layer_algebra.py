"""Layer algebra (SURVEY §2.5): pairwise overlay of two polygon layers.

Reference semantics: ``OGRLayer::Intersection`` (ogrlayer.cpp:5386) /
``Clip`` (:7538) — for each input-layer feature, find the method-layer
features it overlaps and emit the geometric intersection pieces, carrying
both ids.

Distributed shape = the cell-join pattern (spatial_join): both layers
flat_map to covering cells, one ``groupby(cell)`` co-partitions candidates,
the canonical-cell rule keeps each (a, b) pair exactly-once, and the clip
runs in-group.

ROUND-1 SCOPE: the method (clip) layer must be CONVEX polygons — the clip
is exact Sutherland-Hodgman (stages/vector.clip_to_convex).  Concave method
layers need the general polygon-boolean engine (round-2, see CLAUDE.md).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..core import cells as C
from ..core import geom, wkb
from ..stages.vector import clip_to_convex
from .spatial_join import _pad_to_schema, polygons_expand_cells


def _overlay_group(group: pa.Table, a_id_col: str, b_id_col: str,
                   level: int) -> pa.Table:
    side = np.asarray(group.column("side"))
    A = group.filter(pa.array(side == 0))
    B = group.filter(pa.array(side == 1))
    out = {a_id_col: [], b_id_col: [], "wkb": [], "piece_area": []}
    if A.num_rows and B.num_rows:
        cell = int(group.column("cell")[0].as_py())
        abb = np.column_stack([np.asarray(A.column(c), dtype=np.float64)
                               for c in ("bxmin", "bymin", "bxmax", "bymax")])
        bbb = np.column_stack([np.asarray(B.column(c), dtype=np.float64)
                               for c in ("bxmin", "bymin", "bxmax", "bymax")])
        a_geoms = [wkb.as_polygons(wkb.loads(x)) for x in A.column("wkb").to_pylist()]
        b_geoms = [wkb.as_polygons(wkb.loads(x)) for x in B.column("wkb").to_pylist()]
        a_ids = A.column(a_id_col).to_pylist()
        b_ids = B.column(b_id_col).to_pylist()
        for ia in range(A.num_rows):
            ok = ~((abb[ia, 2] < bbb[:, 0]) | (bbb[:, 2] < abb[ia, 0])
                   | (abb[ia, 3] < bbb[:, 1]) | (bbb[:, 3] < abb[ia, 1]))
            for ib in np.nonzero(ok)[0]:
                ccx = max(abb[ia, 0], bbb[ib, 0])
                ccy = max(abb[ia, 1], bbb[ib, 1])
                if int(C.cell_of(np.array([ccx]), np.array([ccy]), level)[0]) != cell:
                    continue
                pieces = []
                for ra in a_geoms[ia]:
                    for rb in b_geoms[ib]:
                        clipped = clip_to_convex(ra, rb[0])
                        if clipped is not None:
                            pieces.append(clipped)
                if pieces:
                    area = sum(geom.polygon_area(p) for p in pieces)
                    if area <= 0:
                        continue
                    g = ({"type": "Polygon", "rings": pieces[0]}
                         if len(pieces) == 1 else
                         {"type": "MultiPolygon", "polys": pieces})
                    out[a_id_col].append(a_ids[ia])
                    out[b_id_col].append(b_ids[ib])
                    out["wkb"].append(wkb.dumps(g))
                    out["piece_area"].append(area)
    return pa.table({a_id_col: pa.array(out[a_id_col], pa.string()),
                     b_id_col: pa.array(out[b_id_col], pa.string()),
                     "wkb": pa.array(out["wkb"], pa.binary()),
                     "piece_area": pa.array(out["piece_area"], pa.float64())})


def layer_intersection(a: "ray.data.Dataset", b: "ray.data.Dataset", *,
                       level: int = C.DEFAULT_LEVEL,
                       a_id_col: str = "a_id", b_id_col: str = "b_id",
                       ) -> "ray.data.Dataset":
    """Pairwise intersection pieces of layer a × CONVEX layer b:
    (a_id, b_id, wkb piece, piece_area)."""
    spec = [(a_id_col, pa.string()), (b_id_col, pa.string()), ("wkb", pa.binary()),
            ("bxmin", pa.float64()), ("bymin", pa.float64()),
            ("bxmax", pa.float64()), ("bymax", pa.float64()),
            ("cell", pa.int64()), ("side", pa.int8())]

    def prep(side_val):
        def fn(batch: pa.Table) -> pa.Table:
            t = polygons_expand_cells(batch, level)
            t = t.append_column("side", pa.array(np.full(t.num_rows, side_val, np.int8)))
            return _pad_to_schema(t, spec)
        return fn

    both = a.map_batches(prep(0), batch_format="pyarrow").union(
        b.map_batches(prep(1), batch_format="pyarrow"))
    return both.groupby("cell").map_groups(
        lambda g: _overlay_group(g, a_id_col, b_id_col, level),
        batch_format="pyarrow")
