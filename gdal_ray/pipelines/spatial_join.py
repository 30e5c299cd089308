"""Cell-keyed spatial joins (SURVEY §2.5) — the distributed replacement for
the reference's per-layer R-tree spatial filter
(``OGRLayer::SetSpatialFilter``, ogrlayer.cpp:3493; prepared-geometry exact
test :3920-4005).

Pattern (both joins below):
  1. each side gets int64 cell keys from the fixed world grid
     (gdal_ray.core.cells) — the big side one cell per row, the polygon side
     one row per covering cell (flat_map);
  2. a single ``groupby(cell).map_groups`` co-partitions candidates; the
     exact predicate runs vectorized inside the group;
  3. **exactly-once without a dedup shuffle**: a candidate pair is emitted
     only in its *canonical cell* — the cell containing the lower-left
     corner of the two bboxes' intersection, which both sides' covering
     sets are guaranteed to include;
  4. skew: a pre-pass counts rows per cell (cheap partial count per batch +
     driver-side merge of the ≤4^level cell histogram) and hot cells are
     salted — point rows hash into ``num_salts`` sub-keys, polygon rows
     replicate into all of them (core/cells.salt_cells).

Predicates follow ogr/ogrgeometry.cpp semantics: intersects :575 (boundary
counts), within :6259 (strict interior), contains :6332.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..core import cells as C
from ..core import geom, wkb

_PREDICATES = ("intersects", "within", "contains", "touches",
               "overlaps", "equals")


def _pad_to_schema(t: pa.Table, spec: list[tuple[str, pa.DataType]]) -> pa.Table:
    """Union requires both sides block-compatible: add missing columns as
    typed nulls and order columns identically."""
    cols = []
    for name, typ in spec:
        if name in t.column_names:
            cols.append(t.column(name).cast(typ))
        else:
            cols.append(pa.nulls(t.num_rows, typ))
    return pa.table(dict(zip([n for n, _ in spec], cols)))


# ---------- side preparation ----------

def points_with_cells(batch: pa.Table, level: int, x_col="x", y_col="y") -> pa.Table:
    x = np.asarray(batch.column(x_col), dtype=np.float64)
    y = np.asarray(batch.column(y_col), dtype=np.float64)
    return batch.append_column("cell", pa.array(C.cell_of(x, y, level), pa.int64()))


def polygons_expand_cells(batch: pa.Table, level: int, wkb_col="wkb") -> pa.Table:
    """One output row per (polygon, covering cell); carries the parsed bbox
    so group-side prefilters don't re-parse WKB."""
    out_idx, out_cell, bxmin, bymin, bxmax, bymax = [], [], [], [], [], []
    wkbs = batch.column(wkb_col).to_pylist()
    for i, data in enumerate(wkbs):
        g = wkb.loads(data)
        polys = wkb.as_polygons(g)
        if not polys:
            continue
        xs = np.concatenate([r[:, 0] for rings in polys for r in rings[:1]])
        ys = np.concatenate([r[:, 1] for rings in polys for r in rings[:1]])
        bb = (float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max()))
        for cell in C.cells_for_bbox(*bb, level):
            out_idx.append(i)
            out_cell.append(int(cell))
            bxmin.append(bb[0]); bymin.append(bb[1]); bxmax.append(bb[2]); bymax.append(bb[3])
    taken = batch.take(pa.array(out_idx, pa.int64())) if out_idx else batch.slice(0, 0)
    cols = {name: taken.column(name) for name in taken.column_names}
    cols["cell"] = pa.array(out_cell, pa.int64())
    cols["bxmin"] = pa.array(bxmin, pa.float64())
    cols["bymin"] = pa.array(bymin, pa.float64())
    cols["bxmax"] = pa.array(bxmax, pa.float64())
    cols["bymax"] = pa.array(bymax, pa.float64())
    return pa.table(cols)


# ---------- point-in-polygon join ----------

def _match_points(px: np.ndarray, py: np.ndarray, poly_parts: list,
                  predicate: str) -> np.ndarray:
    """Hit mask of points matching one (Multi)Polygon's part list.

    OR hits across MultiPolygon parts so a point on a boundary shared by
    two parts still matches this polygon exactly once.  Shared by the
    cell-join group evaluator and the broadcast fast path (one semantic)."""
    hitmask = np.zeros(px.size, dtype=bool)
    for poly_rings in poly_parts:
        bb = geom.rings_bbox(poly_rings)
        cand = (px >= bb[0]) & (px <= bb[2]) & (py >= bb[1]) & (py <= bb[3])
        cand &= ~hitmask
        if not cand.any():
            continue
        idx = np.nonzero(cand)[0]
        if predicate == "within":
            hit = geom.points_within_polygon(px[idx], py[idx], poly_rings)
        else:
            hit = geom.points_intersect_polygon(px[idx], py[idx], poly_rings)
        hitmask[idx[hit]] = True
    return hitmask


def _pip_group(group: pa.Table, predicate: str, level: int,
               point_id_col: str, poly_id_col: str,
               carry_cols: tuple = ()) -> pa.Table:
    side = np.asarray(group.column("side"))
    pts = group.filter(pa.array(side == 0))
    pls = group.filter(pa.array(side == 1))
    out_pid, out_gid, out_rows = [], [], []
    if pts.num_rows and pls.num_rows:
        px = np.asarray(pts.column("x"), dtype=np.float64)
        py = np.asarray(pts.column("y"), dtype=np.float64)
        pids = pts.column(point_id_col).to_pylist()
        for j in range(pls.num_rows):
            # canonical cell for a point-poly pair: the point's own cell
            # == this cell by construction (points carry one cell), so
            # no dedup is needed across cells for the point side.
            parts = wkb.as_polygons(wkb.loads(pls.column("wkb")[j].as_py()))
            hitmask = _match_points(px, py, parts, predicate)
            gid = pls.column(poly_id_col)[j].as_py()
            for k in np.nonzero(hitmask)[0]:
                out_pid.append(pids[k])
                out_gid.append(gid)
                out_rows.append(int(k))
    cols = {point_id_col: pa.array(out_pid, pa.string()),
            poly_id_col: pa.array(out_gid, pa.string())}
    # carry point-side columns through the join (avoids re-joining values
    # back by key — keys need not be unique, a row is a row)
    for c in carry_cols:
        cols[c] = pts.column(c).take(pa.array(out_rows, pa.int64())) \
            if out_rows else pts.column(c).slice(0, 0)
    return pa.table(cols)


def _pip_broadcast(points: "ray.data.Dataset", pl_mat: "ray.data.Dataset",
                   predicate: str, point_id_col: str, poly_id_col: str,
                   carry: dict) -> "ray.data.Dataset":
    """Broadcast-side PIP join: the (measured-small) polygon side is parsed
    ONCE on the driver, ``ray.put`` once, and every point batch evaluates
    the predicate locally — zero shuffle, the classic broadcast join."""
    rows = []
    for t in pl_mat.iter_batches(batch_format="pyarrow"):
        ids = t.column(poly_id_col).to_pylist()
        for i, data in enumerate(t.column("wkb").to_pylist()):
            parts = wkb.as_polygons(wkb.loads(data))
            if parts:
                rows.append((ids[i], parts))
    ref = ray.put(rows)

    def fn(b: pa.Table) -> pa.Table:
        polys = ray.get(ref)
        px = np.asarray(b.column("x"), dtype=np.float64)
        py = np.asarray(b.column("y"), dtype=np.float64)
        pids = b.column(point_id_col).to_pylist()
        out_pid, out_gid, out_rows = [], [], []
        for gid, parts in polys:
            idx = np.nonzero(_match_points(px, py, parts, predicate))[0]
            for k in idx:
                out_pid.append(pids[k])
                out_gid.append(gid)
                out_rows.append(int(k))
        cols = {point_id_col: pa.array(out_pid, pa.string()),
                poly_id_col: pa.array(out_gid, pa.string())}
        for c, typ in carry.items():
            cols[c] = b.column(c).take(pa.array(out_rows, pa.int64())) \
                if out_rows else pa.array([], typ)
        return pa.table(cols)

    return points.map_batches(fn, batch_format="pyarrow")


def point_in_polygon_join(points: "ray.data.Dataset", polygons: "ray.data.Dataset",
                          *, predicate: str = "intersects",
                          level: int = C.DEFAULT_LEVEL,
                          point_id_col: str = "point_id",
                          poly_id_col: str = "poly_id",
                          carry_cols: tuple = (),
                          salt: int = 0,
                          hot_threshold: int | None = None,
                          broadcast_limit_bytes: int = 32 << 20) -> "ray.data.Dataset":
    """(point_id, poly_id) pairs where predicate(point, polygon) holds.

    MultiPolygon parts are OR-ed (a point in any part matches once — pairs
    are deduped per (point, polygon) by construction since a point lives in
    exactly one cell).

    Skew handling (``salt`` > 1): a cheap count pre-pass flags hot cells
    (> ``hot_threshold`` points, default 8× the mean); point rows in hot
    cells hash into `salt` sub-keys while polygon rows replicate into all of
    them — each (point, polygon) pair still meets in exactly one group, so
    exactness is untouched while the hottest group shrinks by `salt`×."""
    assert predicate in ("intersects", "within")
    carry = dict(carry_cols) if isinstance(carry_cols, dict) else {c: pa.float64() for c in carry_cols}

    # measured-size broadcast fast path (the "broadcast small sides"
    # doctrine): materialize the polygon side — the cell path shuffles it
    # anyway — and if it fits the broadcast budget, skip the whole
    # union→repartition→sort exchange.  Skew handling is moot here (no
    # groups exist), and the big×big cell join below is untouched.
    if broadcast_limit_bytes > 0:
        pl_mat = polygons.materialize()
        if (pl_mat.size_bytes() or 0) <= broadcast_limit_bytes:
            return _pip_broadcast(points, pl_mat, predicate,
                                  point_id_col, poly_id_col, carry)
        polygons = pl_mat

    hot_ref = None
    if salt > 1:
        hot = hot_cells_distributed(points, level, hot_threshold)
        hot_ref = ray.put(hot)

    def _apply_salt(t: pa.Table, replicate: bool) -> pa.Table:
        """Point side: one salted key per row.  Polygon side: replicate hot-
        cell rows across all salts."""
        cells = np.asarray(t.column("cell"), dtype=np.int64)
        hot = ray.get(hot_ref)
        pos = np.clip(np.searchsorted(hot, cells), 0, max(0, hot.size - 1))
        is_hot = (hot[pos] == cells) if hot.size else np.zeros(cells.size, bool)
        base = cells * np.int64(salt)
        if not replicate:
            # deterministic row hash (cell + stable row index within batch)
            h = (cells + np.arange(cells.size, dtype=np.int64) * np.int64(2654435761)) % salt
            key = base + np.where(is_hot, h, 0)
            return t.set_column(t.column_names.index("cell"), "cell", pa.array(key))
        # replicate hot rows across salts (vectorized np.repeat, no row loop)
        reps = np.where(is_hot, salt, 1).astype(np.int64)
        idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), reps)
        offsets = np.zeros(idx.size, dtype=np.int64)
        starts = np.cumsum(reps) - reps  # first output slot of each input row
        hot_rows = np.nonzero(is_hot)[0]
        for s in range(salt):
            offsets[starts[hot_rows] + s] = s
        keys = base[idx] + offsets
        out = t.take(pa.array(idx, pa.int64()))
        return out.set_column(out.column_names.index("cell"), "cell",
                              pa.array(keys))
    spec = [(point_id_col, pa.string()), ("x", pa.float64()), ("y", pa.float64()),
            (poly_id_col, pa.string()), ("wkb", pa.binary()),
            ("cell", pa.int64()), ("side", pa.int8())] \
        + [(c, t) for c, t in carry.items()]

    def prep_points(b: pa.Table) -> pa.Table:
        t = points_with_cells(b, level)
        if hot_ref is not None:
            t = _apply_salt(t, replicate=False)
        t = t.append_column("side", pa.array(np.zeros(t.num_rows, dtype=np.int8)))
        return _pad_to_schema(t, spec)

    def prep_polys(b: pa.Table) -> pa.Table:
        t = polygons_expand_cells(b, level)
        if hot_ref is not None:
            t = _apply_salt(t, replicate=True)
        t = t.append_column("side", pa.array(np.ones(t.num_rows, dtype=np.int8)))
        return _pad_to_schema(t, spec)

    pts = points.map_batches(prep_points, batch_format="pyarrow")
    pls = polygons.map_batches(prep_polys, batch_format="pyarrow")
    both = pts.union(pls)
    # sort fan-in sized to the cluster (reduce-side fragment traffic grows
    # with P_in × P_out per node, so the count tracks CPUs, not a constant)
    from .shuffle_utils import shuffle_partitions
    both = both.repartition(shuffle_partitions())
    return both.groupby("cell").map_groups(
        lambda g: _pip_group(g, predicate, level, point_id_col, poly_id_col,
                             tuple(carry.keys())),
        batch_format="pyarrow")


# ---------- polygon-polygon (footprint×layer) join ----------

def _poly_pair_hit(a_parts: list, b_parts: list, predicate: str) -> bool:
    """Predicate over two (Multi)Polygon part lists: a hit on ANY part pair
    counts (the engine's documented Multi* OR semantics).  Shared by the
    cell-join group evaluator and the broadcast fast path."""
    for ra in a_parts:
        for rb in b_parts:
            if predicate == "intersects":
                hit = geom.polygons_intersect(ra, rb)
            elif predicate == "contains":
                hit = geom.polygon_contains_polygon(ra, rb)
            elif predicate == "within":
                hit = geom.polygon_contains_polygon(rb, ra)
            elif predicate == "touches":
                hit = geom.polygons_touch(ra, rb)
            elif predicate == "overlaps":
                hit = geom.polygons_overlap(ra, rb)
            else:  # equals
                hit = geom.polygons_equal(ra, rb)
            if hit:
                return True
    return False


def _outer_bbox(parts: list) -> tuple:
    xs = np.concatenate([r[:, 0] for rings in parts for r in rings[:1]])
    ys = np.concatenate([r[:, 1] for rings in parts for r in rings[:1]])
    return (float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max()))


def _poly_poly_broadcast(a: "ray.data.Dataset", b_mat: "ray.data.Dataset",
                         predicate: str, a_id_col: str,
                         b_id_col: str) -> "ray.data.Dataset":
    """Broadcast-side polygon join: the (measured-small) B side is parsed
    once, ``ray.put`` once; every A batch prefilters by bbox against the
    whole B set and runs the exact predicate on survivors — zero shuffle,
    no canonical-cell bookkeeping (each A row is seen exactly once)."""
    ids, geoms, bbs = [], [], []
    for t in b_mat.iter_batches(batch_format="pyarrow"):
        bid = t.column(b_id_col).to_pylist()
        for i, data in enumerate(t.column("wkb").to_pylist()):
            parts = wkb.as_polygons(wkb.loads(data))
            if not parts:
                continue
            ids.append(bid[i])
            geoms.append(parts)
            bbs.append(_outer_bbox(parts))
    bb_arr = (np.asarray(bbs, dtype=np.float64).reshape(-1, 4)
              if bbs else np.empty((0, 4)))
    ref = ray.put({"ids": ids, "geoms": geoms, "bb": bb_arr})

    def fn(t: pa.Table) -> pa.Table:
        B = ray.get(ref)
        out_a, out_b = [], []
        a_ids = t.column(a_id_col).to_pylist()
        for i, data in enumerate(t.column("wkb").to_pylist()):
            parts = wkb.as_polygons(wkb.loads(data))
            if not parts or not B["ids"]:
                continue
            bb = _outer_bbox(parts)
            ok = ~((bb[2] < B["bb"][:, 0]) | (B["bb"][:, 2] < bb[0])
                   | (bb[3] < B["bb"][:, 1]) | (B["bb"][:, 3] < bb[1]))
            for ib in np.nonzero(ok)[0]:
                if _poly_pair_hit(parts, B["geoms"][ib], predicate):
                    out_a.append(a_ids[i])
                    out_b.append(B["ids"][ib])
        return pa.table({a_id_col: pa.array(out_a, pa.string()),
                         b_id_col: pa.array(out_b, pa.string())})

    return a.map_batches(fn, batch_format="pyarrow")


def _poly_poly_group(group: pa.Table, predicate: str, level: int,
                     a_id_col: str, b_id_col: str) -> pa.Table:
    side = np.asarray(group.column("side"))
    A = group.filter(pa.array(side == 0))
    B = group.filter(pa.array(side == 1))
    out_a, out_b = [], []
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
            # vectorized bbox prefilter
            ok = ~((abb[ia, 2] < bbb[:, 0]) | (bbb[:, 2] < abb[ia, 0])
                   | (abb[ia, 3] < bbb[:, 1]) | (bbb[:, 3] < abb[ia, 1]))
            for ib in np.nonzero(ok)[0]:
                # canonical-cell exactly-once rule
                ccx = max(abb[ia, 0], bbb[ib, 0])
                ccy = max(abb[ia, 1], bbb[ib, 1])
                if int(C.cell_of(np.array([ccx]), np.array([ccy]), level)[0]) != cell:
                    continue
                if _poly_pair_hit(a_geoms[ia], b_geoms[ib], predicate):
                    out_a.append(a_ids[ia])
                    out_b.append(b_ids[ib])
    return pa.table({a_id_col: pa.array(out_a, pa.string()),
                     b_id_col: pa.array(out_b, pa.string())})


def polygon_polygon_join(a: "ray.data.Dataset", b: "ray.data.Dataset", *,
                         predicate: str = "intersects",
                         level: int = C.DEFAULT_LEVEL,
                         a_id_col: str = "image_id", b_id_col: str = "poly_id",
                         salt: int = 0,
                         hot_threshold: int | None = None,
                         broadcast_limit_bytes: int = 32 << 20) -> "ray.data.Dataset":
    """(a_id, b_id) pairs for polygon×polygon predicates — the image-
    footprint × vector-layer join of the north star.  Exactly-once via the
    canonical-cell rule (no dedup shuffle).

    Skew (``salt`` > 1): a distributed count flags hot cells on the A
    side; A rows of a hot cell hash into `salt` sub-keys, B rows of that
    cell replicate into all of them — each (a, b) pair still meets in
    exactly one group (A is in one sub-key), so the canonical-cell test
    (which keeps reading the ORIGINAL cell column) is untouched while the
    hottest group shrinks by `salt`×."""
    assert predicate in _PREDICATES

    # measured-size broadcast fast path: materialize B (the cell path
    # shuffles it anyway) and skip the exchange when it fits the budget;
    # skew salting is moot with no groups.  Big×big keeps the cell join.
    if broadcast_limit_bytes > 0:
        b_mat = b.materialize()
        if (b_mat.size_bytes() or 0) <= broadcast_limit_bytes:
            return _poly_poly_broadcast(a, b_mat, predicate, a_id_col, b_id_col)
        b = b_mat

    spec = [(a_id_col, pa.string()), (b_id_col, pa.string()), ("wkb", pa.binary()),
            ("bxmin", pa.float64()), ("bymin", pa.float64()),
            ("bxmax", pa.float64()), ("bymax", pa.float64()),
            ("cell", pa.int64()), ("side", pa.int8()), ("skey", pa.int64())]

    hot_ref = None
    if salt > 1:
        from .shuffle_utils import hot_keys_distributed
        a_cells = a.map_batches(
            lambda batch: polygons_expand_cells(batch, level).select(["cell"]),
            batch_format="pyarrow")
        hot_ref = ray.put(hot_keys_distributed(a_cells, "cell", hot_threshold))

    def prep(side_val):
        def fn(batch: pa.Table) -> pa.Table:
            from .shuffle_utils import salt_keys_batch
            t = polygons_expand_cells(batch, level)
            if hot_ref is not None:
                t = salt_keys_batch(t, "cell", "skey", ray.get(hot_ref),
                                    salt, replicate=(side_val == 1))
            else:
                t = t.append_column("skey", t.column("cell"))
            t = t.append_column("side", pa.array(np.full(t.num_rows, side_val, np.int8)))
            return _pad_to_schema(t, spec)
        return fn

    both = a.map_batches(prep(0), batch_format="pyarrow").union(
        b.map_batches(prep(1), batch_format="pyarrow"))
    from .shuffle_utils import shuffle_partitions
    both = both.repartition(shuffle_partitions())
    return both.groupby("skey").map_groups(
        lambda g: _poly_poly_group(g, predicate, level, a_id_col, b_id_col),
        batch_format="pyarrow")


# ---------- skew pre-pass ----------

def cell_histogram(ds: "ray.data.Dataset", level: int, x_col="x", y_col="y") -> dict[int, int]:
    """Per-cell row counts via in-batch partial counting + tiny driver merge
    (the histogram is bounded by 4^level cells, not by data size)."""
    def partial(batch: pa.Table) -> pa.Table:
        x = np.asarray(batch.column(x_col), dtype=np.float64)
        y = np.asarray(batch.column(y_col), dtype=np.float64)
        cells, counts = np.unique(C.cell_of(x, y, level), return_counts=True)
        return pa.table({"cell": pa.array(cells, pa.int64()),
                         "n": pa.array(counts, pa.int64())})
    hist: dict[int, int] = {}
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        for cell, n in zip(b.column("cell").to_pylist(), b.column("n").to_pylist()):
            hist[cell] = hist.get(cell, 0) + n
    return hist


def hot_cells(hist: dict[int, int], threshold: int) -> dict[int, bool]:
    return {c: True for c, n in hist.items() if n > threshold}


def hot_cells_distributed(ds: "ray.data.Dataset", level: int,
                          hot_threshold: int | None = None,
                          x_col="x", y_col="y") -> np.ndarray:
    """Hot-cell set without a driver-side histogram: per-block partial
    counts feed a distributed groupby-sum; the threshold (8× the mean
    count, min 64) comes from two scalar aggregates; only the SMALL hot
    set reaches the driver."""
    def partial(batch: pa.Table) -> pa.Table:
        x = np.asarray(batch.column(x_col), dtype=np.float64)
        y = np.asarray(batch.column(y_col), dtype=np.float64)
        cells, counts = np.unique(C.cell_of(x, y, level), return_counts=True)
        return pa.table({"cell": pa.array(cells, pa.int64()),
                         "n": pa.array(counts, pa.int64())})

    counted = ds.map_batches(partial, batch_format="pyarrow")                 .groupby("cell").sum("n").materialize()
    if hot_threshold is None:
        total = counted.sum("sum(n)")
        ncells = max(1, counted.count())
        hot_threshold = max(64, int(8 * (total / ncells)))
    thr = hot_threshold

    def keep_hot(b: pa.Table) -> pa.Table:
        mask = np.asarray(b.column("sum(n)"), dtype=np.int64) > thr
        return pa.table({"cell": b.column("cell").filter(pa.array(mask))})

    hs = [np.asarray(b.column("cell"), dtype=np.int64)
          for b in counted.map_batches(keep_hot, batch_format="pyarrow")
                          .iter_batches(batch_format="pyarrow")]
    if not hs:
        return np.array([], dtype=np.int64)
    return np.sort(np.concatenate(hs))
