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


# ---------- general boolean layer algebra (round 2) ----------
#
# OGRLayer::Union (ogrlayer.cpp:5804), SymDifference (:6341), Identity
# (:6771), Update (:7189), Erase (:7847) — re-expressed on the boolean
# overlay engine (core/overlay.py), with the reference's per-feature
# loop-over-intersecting-method-features replaced by two exchanges:
#
#   1. the cell join (exactly-once canonical-cell rule) emits candidate
#      (a, b) pair rows carrying both WKBs;
#   2. a groupby(a_id) co-locates each input feature with ALL the method
#      features it bbox-intersects (plus one bare row so features with no
#      candidates still emit), and the in-group overlay computes
#      A − union(B…) / A∩B pieces.
#
# Piece rows: (a_id, b_id, wkb, piece_area); the id of the absent side is
# the sentinel "-" (never NULL — empty result sets must keep their schema
# for the driver's hash compare).

from ..core import overlay as OV


def _poly_to_wkb(pieces) -> bytes | None:
    if not pieces:
        return None
    if len(pieces) == 1:
        return wkb.dumps({"type": "Polygon", "rings": pieces[0]})
    return wkb.dumps({"type": "MultiPolygon", "polys": pieces})


def _candidate_pairs(a: "ray.data.Dataset", b: "ray.data.Dataset", *,
                     level: int, a_id_col: str, b_id_col: str
                     ) -> "ray.data.Dataset":
    """Exactly-once (a_id, b_id, a_wkb, b_wkb) rows for every bbox-
    intersecting cross-layer pair (canonical-cell rule)."""
    spec = [("fid", pa.string()), ("wkb", pa.binary()),
            ("bxmin", pa.float64()), ("bymin", pa.float64()),
            ("bxmax", pa.float64()), ("bymax", pa.float64()),
            ("cell", pa.int64()), ("side", pa.int8())]

    def prep(side_val, id_col):
        def fn(batch: pa.Table) -> pa.Table:
            t = polygons_expand_cells(batch, level)
            cols = {"fid": t.column(id_col).cast(pa.string())}
            for name in ("wkb", "bxmin", "bymin", "bxmax", "bymax", "cell"):
                cols[name] = t.column(name)
            t = pa.table(cols)
            t = t.append_column("side", pa.array(np.full(t.num_rows, side_val, np.int8)))
            return _pad_to_schema(t, spec)
        return fn

    both = a.map_batches(prep(0, a_id_col), batch_format="pyarrow").union(
        b.map_batches(prep(1, b_id_col), batch_format="pyarrow"))

    def pair_group(group: pa.Table) -> pa.Table:
        side = np.asarray(group.column("side"))
        A = group.filter(pa.array(side == 0))
        B = group.filter(pa.array(side == 1))
        out = {"a_id": [], "b_id": [], "a_wkb": [], "b_wkb": []}
        if A.num_rows and B.num_rows:
            cell = int(group.column("cell")[0].as_py())
            abb = np.column_stack([np.asarray(A.column(c), dtype=np.float64)
                                   for c in ("bxmin", "bymin", "bxmax", "bymax")])
            bbb = np.column_stack([np.asarray(B.column(c), dtype=np.float64)
                                   for c in ("bxmin", "bymin", "bxmax", "bymax")])
            a_ids = A.column("fid").to_pylist()
            b_ids = B.column("fid").to_pylist()
            a_wkbs = A.column("wkb").to_pylist()
            b_wkbs = B.column("wkb").to_pylist()
            for ia in range(A.num_rows):
                ok = ~((abb[ia, 2] < bbb[:, 0]) | (bbb[:, 2] < abb[ia, 0])
                       | (abb[ia, 3] < bbb[:, 1]) | (bbb[:, 3] < abb[ia, 1]))
                for ib in np.nonzero(ok)[0]:
                    ccx = max(abb[ia, 0], bbb[ib, 0])
                    ccy = max(abb[ia, 1], bbb[ib, 1])
                    if int(C.cell_of(np.array([ccx]), np.array([ccy]),
                                     level)[0]) != cell:
                        continue
                    out["a_id"].append(a_ids[ia])
                    out["b_id"].append(b_ids[ib])
                    out["a_wkb"].append(a_wkbs[ia])
                    out["b_wkb"].append(b_wkbs[ib])
        return pa.table({"a_id": pa.array(out["a_id"], pa.string()),
                         "b_id": pa.array(out["b_id"], pa.string()),
                         "a_wkb": pa.array(out["a_wkb"], pa.binary()),
                         "b_wkb": pa.array(out["b_wkb"], pa.binary())})

    return both.groupby("cell").map_groups(pair_group, batch_format="pyarrow")


_PIECES_SCHEMA = pa.schema([("a_id", pa.string()), ("b_id", pa.string()),
                            ("wkb", pa.binary()),
                            ("piece_area", pa.float64())])


def _empty_pieces() -> pa.Table:
    return _PIECES_SCHEMA.empty_table()


def layer_erase(a: "ray.data.Dataset", b: "ray.data.Dataset", *,
                level: int = C.DEFAULT_LEVEL,
                a_id_col: str = "a_id", b_id_col: str = "b_id",
                out_a_id: str | None = None) -> "ray.data.Dataset":
    """OGRLayer::Erase (ogrlayer.cpp:7847): for every feature of ``a``,
    the part NOT covered by any feature of ``b``.  Features of ``a`` with
    no intersecting method feature pass through whole."""
    pairs = _candidate_pairs(a, b, level=level, a_id_col=a_id_col,
                             b_id_col=b_id_col)

    def bare(batch: pa.Table) -> pa.Table:
        return pa.table({
            "a_id": batch.column(a_id_col).cast(pa.string()),
            "b_id": pa.nulls(batch.num_rows, pa.string()),
            "a_wkb": batch.column("wkb"),
            "b_wkb": pa.nulls(batch.num_rows, pa.binary())})

    all_rows = pairs.union(a.map_batches(bare, batch_format="pyarrow"))

    def erase_group(g: pa.Table) -> pa.Table:
        a_id = g.column("a_id")[0].as_py()
        a_wkb_v = next(x for x in g.column("a_wkb").to_pylist() if x is not None)
        b_list = [x for x in g.column("b_wkb").to_pylist() if x is not None]
        a_polys = wkb.as_polygons(wkb.loads(a_wkb_v))
        b_polys = [p for x in b_list for p in wkb.as_polygons(wkb.loads(x))]
        pieces = OV.overlay(a_polys, b_polys, "difference") if b_polys \
            else a_polys
        area = OV.area_of(pieces)
        data = _poly_to_wkb(pieces)
        if data is None or area <= 0:
            return _empty_pieces()
        return pa.table({"a_id": pa.array([a_id], pa.string()),
                         "b_id": pa.array(["-"], pa.string()),
                         "wkb": pa.array([data], pa.binary()),
                         "piece_area": pa.array([area], pa.float64())})

    return all_rows.groupby("a_id").map_groups(erase_group,
                                               batch_format="pyarrow")


def layer_intersection_pieces(a: "ray.data.Dataset", b: "ray.data.Dataset", *,
                              level: int = C.DEFAULT_LEVEL,
                              a_id_col: str = "a_id", b_id_col: str = "b_id",
                              ) -> "ray.data.Dataset":
    """Pairwise A∩B pieces via the boolean engine (concave + holes OK) —
    the general form of layer_intersection (OGRLayer::Intersection,
    ogrlayer.cpp:5386)."""
    pairs = _candidate_pairs(a, b, level=level, a_id_col=a_id_col,
                             b_id_col=b_id_col)

    def inter_batch(batch: pa.Table) -> pa.Table:
        out = {"a_id": [], "b_id": [], "wkb": [], "piece_area": []}
        for i in range(batch.num_rows):
            a_polys = wkb.as_polygons(wkb.loads(batch.column("a_wkb")[i].as_py()))
            b_polys = wkb.as_polygons(wkb.loads(batch.column("b_wkb")[i].as_py()))
            pieces = OV.overlay(a_polys, b_polys, "intersection")
            area = OV.area_of(pieces)
            data = _poly_to_wkb(pieces)
            if data is None or area <= 0:
                continue
            out["a_id"].append(batch.column("a_id")[i].as_py())
            out["b_id"].append(batch.column("b_id")[i].as_py())
            out["wkb"].append(data)
            out["piece_area"].append(area)
        return pa.table({"a_id": pa.array(out["a_id"], pa.string()),
                         "b_id": pa.array(out["b_id"], pa.string()),
                         "wkb": pa.array(out["wkb"], pa.binary()),
                         "piece_area": pa.array(out["piece_area"], pa.float64())})

    return pairs.map_batches(inter_batch, batch_format="pyarrow")


def layer_union(a: "ray.data.Dataset", b: "ray.data.Dataset", *,
                level: int = C.DEFAULT_LEVEL,
                a_id_col: str = "a_id", b_id_col: str = "b_id",
                ) -> "ray.data.Dataset":
    """OGRLayer::Union (ogrlayer.cpp:5804): A∩B pieces + A-not-B pieces +
    B-not-A pieces (absent side id = '-')."""
    inter = layer_intersection_pieces(a, b, level=level, a_id_col=a_id_col,
                                      b_id_col=b_id_col)
    a_rem = layer_erase(a, b, level=level, a_id_col=a_id_col, b_id_col=b_id_col)
    b_rem = layer_erase(b, a, level=level, a_id_col=b_id_col, b_id_col=a_id_col)

    def swap(batch: pa.Table) -> pa.Table:
        return pa.table({"a_id": batch.column("b_id"),
                         "b_id": batch.column("a_id"),
                         "wkb": batch.column("wkb"),
                         "piece_area": batch.column("piece_area")})

    return inter.union(a_rem).union(
        b_rem.map_batches(swap, batch_format="pyarrow"))


def layer_identity(a: "ray.data.Dataset", b: "ray.data.Dataset", *,
                   level: int = C.DEFAULT_LEVEL,
                   a_id_col: str = "a_id", b_id_col: str = "b_id",
                   ) -> "ray.data.Dataset":
    """OGRLayer::Identity (ogrlayer.cpp:6771): A∩B pieces + A-not-B pieces
    (input layer split by the method layer; method-only area excluded)."""
    inter = layer_intersection_pieces(a, b, level=level, a_id_col=a_id_col,
                                      b_id_col=b_id_col)
    a_rem = layer_erase(a, b, level=level, a_id_col=a_id_col, b_id_col=b_id_col)
    return inter.union(a_rem)


def layer_symdifference(a: "ray.data.Dataset", b: "ray.data.Dataset", *,
                        level: int = C.DEFAULT_LEVEL,
                        a_id_col: str = "a_id", b_id_col: str = "b_id",
                        ) -> "ray.data.Dataset":
    """OGRLayer::SymDifference (ogrlayer.cpp:6341): A-not-B + B-not-A."""
    a_rem = layer_erase(a, b, level=level, a_id_col=a_id_col, b_id_col=b_id_col)
    b_rem = layer_erase(b, a, level=level, a_id_col=b_id_col, b_id_col=a_id_col)

    def swap(batch: pa.Table) -> pa.Table:
        return pa.table({"a_id": batch.column("b_id"),
                         "b_id": batch.column("a_id"),
                         "wkb": batch.column("wkb"),
                         "piece_area": batch.column("piece_area")})

    return a_rem.union(b_rem.map_batches(swap, batch_format="pyarrow"))


def layer_update(a: "ray.data.Dataset", b: "ray.data.Dataset", *,
                 level: int = C.DEFAULT_LEVEL,
                 a_id_col: str = "a_id", b_id_col: str = "b_id",
                 ) -> "ray.data.Dataset":
    """OGRLayer::Update (ogrlayer.cpp:7189): A-not-B pieces + every B
    feature unchanged (B overwrites A where they overlap)."""
    a_rem = layer_erase(a, b, level=level, a_id_col=a_id_col, b_id_col=b_id_col)

    def b_pass(batch: pa.Table) -> pa.Table:
        areas = [sum(geom.polygon_area(r) for r in
                     wkb.as_polygons(wkb.loads(x)))
                 for x in batch.column("wkb").to_pylist()]
        return pa.table({
            "a_id": pa.array(["-"] * batch.num_rows, pa.string()),
            "b_id": batch.column(b_id_col).cast(pa.string()),
            "wkb": batch.column("wkb"),
            "piece_area": pa.array(areas, pa.float64())})

    return a_rem.union(b.map_batches(b_pass, batch_format="pyarrow"))


# ---------- coverage ops (apps/gdalalg_vector_clean_coverage.cpp area) ----------

def check_coverage(layer: "ray.data.Dataset", *,
                   level: int = C.DEFAULT_LEVEL,
                   id_col: str = "fid") -> "ray.data.Dataset":
    """gdal vector check-coverage: report pairwise OVERLAPS within one
    polygon layer (a clean coverage has none — features only touch).
    Output: (a_id, b_id, overlap_area) for every overlapping pair,
    exactly-once via the canonical-cell rule."""
    pairs = _candidate_pairs(layer, layer, level=level, a_id_col=id_col,
                             b_id_col=id_col)

    def verify(batch: pa.Table) -> pa.Table:
        out = {"a_id": [], "b_id": [], "overlap_area": []}
        for i in range(batch.num_rows):
            a_id = batch.column("a_id")[i].as_py()
            b_id = batch.column("b_id")[i].as_py()
            if a_id >= b_id:     # self + symmetric dupes (same layer twice)
                continue
            a_polys = wkb.as_polygons(wkb.loads(batch.column("a_wkb")[i].as_py()))
            b_polys = wkb.as_polygons(wkb.loads(batch.column("b_wkb")[i].as_py()))
            area = OV.area_of(OV.overlay(a_polys, b_polys, "intersection"))
            if area > 1e-12:
                out["a_id"].append(a_id)
                out["b_id"].append(b_id)
                out["overlap_area"].append(area)
        return pa.table({"a_id": pa.array(out["a_id"], pa.string()),
                         "b_id": pa.array(out["b_id"], pa.string()),
                         "overlap_area": pa.array(out["overlap_area"],
                                                  pa.float64())})

    return pairs.map_batches(verify, batch_format="pyarrow")


def clean_coverage(layer: "ray.data.Dataset", *,
                   level: int = C.DEFAULT_LEVEL,
                   id_col: str = "fid") -> "ray.data.Dataset":
    """gdal vector clean-coverage: remove overlaps so features only touch —
    each overlap region is assigned to the feature with the SMALLER id
    (deterministic priority rule; the reference's merge-longest-border
    strategy needs identical adjacency information and slots in here).
    Output: (fid, wkb, area) with every pairwise overlap removed."""
    pairs = _candidate_pairs(layer, layer, level=level, a_id_col=id_col,
                             b_id_col=id_col)

    def bare(batch: pa.Table) -> pa.Table:
        return pa.table({
            "a_id": batch.column(id_col).cast(pa.string()),
            "b_id": pa.nulls(batch.num_rows, pa.string()),
            "a_wkb": batch.column("wkb"),
            "b_wkb": pa.nulls(batch.num_rows, pa.binary())})

    def keep_lower_priority(batch: pa.Table) -> pa.Table:
        """Keep only pairs where the OTHER feature wins the overlap (its id
        is smaller) — those are subtracted from this feature."""
        mask = []
        for i in range(batch.num_rows):
            a_id = batch.column("a_id")[i].as_py()
            b_id = batch.column("b_id")[i].as_py()
            mask.append(b_id < a_id)
        return batch.filter(pa.array(mask))

    all_rows = pairs.map_batches(keep_lower_priority, batch_format="pyarrow") \
        .union(layer.map_batches(bare, batch_format="pyarrow"))

    def clean_group(g: pa.Table) -> pa.Table:
        fid = g.column("a_id")[0].as_py()
        a_wkb_v = next(x for x in g.column("a_wkb").to_pylist() if x is not None)
        winners = [x for x in g.column("b_wkb").to_pylist() if x is not None]
        a_polys = wkb.as_polygons(wkb.loads(a_wkb_v))
        w_polys = [p for x in winners for p in wkb.as_polygons(wkb.loads(x))]
        pieces = OV.overlay(a_polys, w_polys, "difference") if w_polys \
            else a_polys
        area = OV.area_of(pieces)
        data = _poly_to_wkb(pieces)
        if data is None:
            return pa.table({"fid": pa.array([], pa.string()),
                             "wkb": pa.array([], pa.binary()),
                             "area": pa.array([], pa.float64())})
        return pa.table({"fid": pa.array([fid], pa.string()),
                         "wkb": pa.array([data], pa.binary()),
                         "area": pa.array([area], pa.float64())})

    return all_rows.groupby("a_id").map_groups(clean_group,
                                               batch_format="pyarrow")


def simplify_coverage(layer: "ray.data.Dataset", tolerance: float, *,
                      id_col: str = "fid",
                      partition_col: str | None = None,
                      level: int | None = None) -> "ray.data.Dataset":
    """gdal vector simplify-coverage (apps/gdalalg_vector_simplify_coverage
    .cpp, GEOS CoverageSimplifier semantics): simplify shared boundaries
    consistently on both sides so the coverage stays overlap/gap-free.

    Three partitioning modes (topology is global — faces sharing an edge
    must see each other while deciding a chain):
      - partition_col: a user column already grouping edge-connected faces
        (admin region, tile id) — one group per value;
      - level: BBOX-HALO CELL-PARTITIONED SCALE PATH — each face is OWNED
        by the min-corner cell of its (ε-expanded) bbox cover and
        replicated as a read-only HALO copy to every cell in
        [cx0-1..cx1] × [cy0-1..cy1], so a group holds every face that can
        touch any face it owns.  A face whose cover fits a 2×2 cell block
        therefore simplifies EXACTLY like the global pass (all incident
        faces provably co-present; the core walks chains in sorted-fid
        order with orientation-canonical DP, so every group computes the
        identical kept set for a shared chain).  Only faces spanning more
        than a 2×2 block are PINNED (all vertices kept — conservative but
        cross-group consistent).  Pick ``level`` so typical faces are a
        fraction of a cell and the output equals the global mode while no
        group ever holds more than a 2×2-blocks-plus-halo neighbourhood.
      - neither: one global group (the reference's in-memory GEOS
        envelope)."""
    import pyarrow as pa

    from ..core import wkb as W
    from ..core.coverage_simplify import simplify_coverage as _simp

    def _emit(out: dict) -> pa.Table:
        ids, wkbs = [], []
        for fid, polys in out.items():
            ids.append(fid)
            if len(polys) == 1:
                wkbs.append(W.dumps({"type": "Polygon", "rings": polys[0]}))
            else:
                wkbs.append(W.dumps({"type": "MultiPolygon", "polys": polys}))
        return pa.table({id_col: pa.array(ids), "wkb": pa.array(wkbs, pa.binary())})

    if level is not None:
        from ..core import cells as C

        def expand(b: pa.Table) -> pa.Table:
            eps = 1e-7    # catches SNAP-coincident vertices across faces
            n = 1 << level
            out = {"cell": [], id_col: [], "wkb": [], "owner": [], "pinned": []}
            for i in range(b.num_rows):
                data = b.column("wkb")[i].as_py()
                pts = np.concatenate([r for rings in
                                      W.as_polygons(W.loads(data))
                                      for r in rings])
                # ε-expanded bbox cover (exactness + ownership) …
                cx0, cy1 = C.cell_xy(float(pts[:, 0].min()) - eps,
                                     float(pts[:, 1].min()) - eps, level)
                cx1, cy0 = C.cell_xy(float(pts[:, 0].max()) + eps,
                                     float(pts[:, 1].max()) + eps, level)
                cx0, cx1, cy0, cy1 = int(cx0), int(cx1), int(cy0), int(cy1)
                owner = int(C.pack(cx0, cy0, level))
                # … exact iff it fits the 2×2 block at the owner corner:
                # then bbox(F) ⊆ 3×3(owner) and every face touching F (its
                # bbox meets F's ⊆ the block) lands in owner's halo range
                pin = (cx1 - cx0 > 1) or (cy1 - cy0 > 1)
                # halo: one extra cell toward the min corner only — group c
                # owns faces whose 2×2 block starts at c, so a face must be
                # visible from cx0-1 / cy0-1 but never from beyond cx1/cy1
                for cx in range(max(cx0 - 1, 0), cx1 + 1):
                    for cy in range(max(cy0 - 1, 0), cy1 + 1):
                        c = int(C.pack(cx, cy, level))
                        out["cell"].append(c)
                        out[id_col].append(b.column(id_col)[i].as_py())
                        out["wkb"].append(data)
                        out["owner"].append(c == owner)
                        out["pinned"].append(pin)
            return pa.table({
                "cell": pa.array(out["cell"], pa.int64()),
                id_col: pa.array(out[id_col]),
                "wkb": pa.array(out["wkb"], pa.binary()),
                "owner": pa.array(out["owner"]),
                "pinned": pa.array(out["pinned"])})

        def simp_cell(g: pa.Table) -> pa.Table:
            faces, pinned, owners = {}, set(), set()
            for i in range(g.num_rows):
                fid = g.column(id_col)[i].as_py()
                faces[fid] = W.as_polygons(W.loads(g.column("wkb")[i].as_py()))
                if g.column("pinned")[i].as_py():
                    pinned.add(fid)
                if g.column("owner")[i].as_py():
                    owners.add(fid)
            out = _simp(faces, tolerance, pinned=pinned)
            return _emit({f: p for f, p in out.items() if f in owners})

        return layer.map_batches(expand, batch_format="pyarrow") \
            .groupby("cell").map_groups(simp_cell, batch_format="pyarrow")

    def simp_group(g: pa.Table) -> pa.Table:
        faces = {}
        for i in range(g.num_rows):
            fid = g.column(id_col)[i].as_py()
            faces[fid] = W.as_polygons(W.loads(g.column("wkb")[i].as_py()))
        return _emit(_simp(faces, tolerance))

    if partition_col is None:
        key = "__cov_part"
        work = layer.map_batches(
            lambda b: b.append_column(key, pa.array([0] * b.num_rows, pa.int64())),
            batch_format="pyarrow")
    else:
        key = partition_col
        work = layer
    return work.groupby(key).map_groups(simp_group, batch_format="pyarrow")
