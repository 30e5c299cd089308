"""kNN / radius lookups (SURVEY §2.5; gdal_grid neighbor-search semantics,
alg/gdalgrid.cpp:261-427 quadtree + per-point nearest searches).

The reference holds one process-local quadtree of ALL points.  Distributed
re-expression: the small side is **broadcast once** (``ray.put`` — Ray Data
ships the object ref, each task reads it zero-copy from the local object
store) and each batch of the big side does a vectorized distance computation
against it — no shuffle at all.  For big×big kNN, co-partition by cell keys
(spatial_join pattern) and run the same kernel per cell with neighbor-cell
halo; round-1 ships the broadcast variant (covers gdal_grid: grid nodes
stream, scattered points broadcast).

Determinism: ties broken by reference-point index (stable argsort), so
output is reproducible across partitionings.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


class _GridIndex:
    """Uniform-bucket spatial index over the broadcast point set — numpy
    stand-in for cKDTree/CPLQuadTree.  Query = gather candidate buckets in
    expanding rings, exact distances, top-k."""

    def __init__(self, xy: np.ndarray, ids: np.ndarray, nbuckets: int = 64):
        self.xy = np.asarray(xy, dtype=np.float64)
        self.ids = ids
        self.minx, self.miny = self.xy.min(axis=0)
        self.maxx, self.maxy = self.xy.max(axis=0)
        self.n = max(1, int(np.sqrt(len(xy) / 4)))
        self.n = min(self.n, nbuckets)
        sx = (self.maxx - self.minx) or 1.0
        sy = (self.maxy - self.miny) or 1.0
        bx = np.clip(((self.xy[:, 0] - self.minx) / sx * self.n).astype(np.int64), 0, self.n - 1)
        by = np.clip(((self.xy[:, 1] - self.miny) / sy * self.n).astype(np.int64), 0, self.n - 1)
        self.bucket_of = bx * self.n + by
        order = np.argsort(self.bucket_of, kind="stable")
        self.sorted_idx = order
        self.bucket_sorted = self.bucket_of[order]
        self.starts = np.searchsorted(self.bucket_sorted, np.arange(self.n * self.n))
        self.ends = np.searchsorted(self.bucket_sorted, np.arange(self.n * self.n), side="right")


def knn_batch_kernel(qx: np.ndarray, qy: np.ndarray, ref_xy: np.ndarray,
                     k: int, chunk: int = 2048):
    """Exact brute-force kNN of queries against ref_xy, chunked so the
    (chunk × n_ref) distance matrix stays bounded.  Returns (idx (nq,k),
    dist (nq,k)) with stable tie-breaking by reference index."""
    nq = qx.shape[0]
    nref = ref_xy.shape[0]
    k = min(k, nref)
    out_idx = np.empty((nq, k), dtype=np.int64)
    out_d = np.empty((nq, k), dtype=np.float64)
    for s in range(0, nq, chunk):
        e = min(s + chunk, nq)
        dx = qx[s:e, None] - ref_xy[None, :, 0]
        dy = qy[s:e, None] - ref_xy[None, :, 1]
        d2 = dx * dx + dy * dy
        if k < nref:
            part = np.argpartition(d2, k - 1, axis=1)[:, :k]
        else:
            part = np.broadcast_to(np.arange(nref), (e - s, nref)).copy()
        pd = np.take_along_axis(d2, part, axis=1)
        # sort by (distance, ref index) for deterministic ties
        order = np.lexsort((part, pd), axis=1)
        out_idx[s:e] = np.take_along_axis(part, order, axis=1)
        out_d[s:e] = np.sqrt(np.take_along_axis(pd, order, axis=1))
    return out_idx, out_d


class KnnStage:
    """Actor-pool stage: batches of query points → k nearest broadcast
    reference points.  Reference set is fetched from the object store ONCE
    per actor in __init__ (not per batch)."""

    def __init__(self, ref_ref, k: int, query_id_col: str = "point_id",
                 x_col: str = "x", y_col: str = "y"):
        ref = ray.get(ref_ref) if isinstance(ref_ref, ray.ObjectRef) else ref_ref
        self.ref_xy = np.asarray(ref["xy"], dtype=np.float64)
        self.ref_ids = list(ref["ids"])
        self.k = k
        self.query_id_col = query_id_col
        self.x_col = x_col
        self.y_col = y_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        qx = np.asarray(batch.column(self.x_col), dtype=np.float64)
        qy = np.asarray(batch.column(self.y_col), dtype=np.float64)
        idx, dist = knn_batch_kernel(qx, qy, self.ref_xy, self.k)
        nq, k = idx.shape
        qids = batch.column(self.query_id_col).to_pylist()
        return pa.table({
            self.query_id_col: pa.array(np.repeat(qids, k)),
            "neighbor_id": pa.array([self.ref_ids[j] for j in idx.ravel()]),
            "rank": pa.array(np.tile(np.arange(1, k + 1), nq), pa.int32()),
            "distance": pa.array(dist.ravel(), pa.float64()),
        })


_STAGE_CACHE: dict = {}     # ref hex → KnnStage; worker-process-level state


def knn_join(queries: "ray.data.Dataset", ref_xy: np.ndarray, ref_ids,
             k: int, *, query_id_col: str = "point_id", x_col: str = "x",
             y_col: str = "y", concurrency: int | tuple = 4,
             use_actors: bool = False) -> "ray.data.Dataset":
    """(query_id, neighbor_id, rank, distance) — exact kNN, broadcast side.
    ref_xy is ray.put ONCE; workers read it from the local object store on
    first touch.  Default is task mode with a process-level stage cache —
    identical state reuse to the actor pool (long-lived Ray workers) minus
    the multi-second pool spin-up each execution pays; ``use_actors=True``
    keeps the explicit pool for long-lived cluster deployments."""
    ref_ref = ray.put({"xy": np.asarray(ref_xy, dtype=np.float64), "ids": list(ref_ids)})
    if use_actors:
        return queries.map_batches(
            KnnStage,
            fn_constructor_kwargs={"ref_ref": ref_ref, "k": k,
                                   "query_id_col": query_id_col,
                                   "x_col": x_col, "y_col": y_col},
            batch_format="pyarrow",
            concurrency=concurrency,
        )
    key = (ref_ref.hex(), k, query_id_col, x_col, y_col)

    def fn(batch: pa.Table) -> pa.Table:
        st = _STAGE_CACHE.get(key)
        if st is None:
            if len(_STAGE_CACHE) > 4:       # bound per-worker state
                _STAGE_CACHE.clear()
            st = KnnStage(ref_ref, k, query_id_col, x_col, y_col)
            _STAGE_CACHE[key] = st
        return st(batch)

    return queries.map_batches(fn, batch_format="pyarrow")


def knn_radius_cell_join(queries: "ray.data.Dataset", points: "ray.data.Dataset",
                         *, radius: float, k: int,
                         level: int | None = None,
                         query_id_col: str = "point_id",
                         point_id_col: str = "point_id",
                         concurrency_unused=None) -> "ray.data.Dataset":
    """BIG×BIG radius-bounded kNN — the scale path when neither side fits a
    broadcast (SURVEY §2.5 'cell-join + local KDTree for big-big kNN').

    Exactness argument: with cell size ≥ `radius` (level chosen so), every
    point within `radius` of a query lies in the query's cell or one of its
    8 neighbors.  The point side is replicated into its 3×3 neighborhood
    (flat_map ×9 — bounded, and only the point side), queries carry one
    cell, and a single ``groupby(cell)`` co-partitions; the in-group kernel
    is the exact vectorized knn_batch_kernel filtered to ≤ radius.
    Output: (query_id, neighbor_id, rank, distance ≤ radius), up to k rows
    per query (fewer when the neighborhood is sparse)."""
    import math

    from ..core import cells as C
    if radius > 90.0:
        # level-1 cells are 90° tall — beyond that the 3×3-halo exactness
        # argument fails silently; the caller should broadcast instead.
        raise ValueError(
            f"radius={radius} exceeds the level-1 cell height (90°); "
            "use the broadcast knn_join for unbounded searches")
    if level is None:
        # largest level whose cell height (180/2^L degrees) still ≥ radius
        level = max(1, min(12, int(math.floor(math.log2(180.0 / radius)))))

    def prep_queries(b: pa.Table) -> pa.Table:
        x = np.asarray(b.column("x"), dtype=np.float64)
        y = np.asarray(b.column("y"), dtype=np.float64)
        return pa.table({
            "qid": b.column(query_id_col).cast(pa.string()),
            "x": pa.array(x), "y": pa.array(y),
            "cell": pa.array(C.cell_of(x, y, level), pa.int64()),
            "side": pa.array(np.zeros(b.num_rows, np.int8)),
            "pid": pa.nulls(b.num_rows, pa.string()),
        })

    def prep_points(b: pa.Table) -> pa.Table:
        x = np.asarray(b.column("x"), dtype=np.float64)
        y = np.asarray(b.column("y"), dtype=np.float64)
        cx, cy = C.cell_xy(x, y, level)
        n = np.int64(1) << level
        nr = x.size
        # fully vectorized 3×3 replication: (9, nr) grids of cell keys
        offs = np.array([(dx, dy) for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
                        dtype=np.int64)
        nx = np.clip(cx[None, :] + offs[:, 0:1], 0, n - 1)
        ny = np.clip(cy[None, :] + offs[:, 1:2], 0, n - 1)
        nxr, nyr = nx.ravel(), ny.ravel()
        keys = C.pack(nxr, nyr, level)
        row_idx = np.tile(np.arange(nr, dtype=np.int64), 9)
        # border clipping duplicates (row, cell) — dedupe on (row, nx, ny)
        pair = (row_idx * n + nxr) * n + nyr
        _, first = np.unique(pair, return_index=True)
        keep = np.sort(first)
        taken = b.take(pa.array(row_idx[keep], pa.int64()))
        return pa.table({
            "qid": pa.nulls(keep.size, pa.string()),
            "x": pa.array(x[row_idx[keep]], pa.float64()),
            "y": pa.array(y[row_idx[keep]], pa.float64()),
            "cell": pa.array(keys[keep], pa.int64()),
            "side": pa.array(np.ones(keep.size, np.int8)),
            "pid": taken.column(point_id_col).cast(pa.string()),
        })

    def group_knn(g: pa.Table) -> pa.Table:
        side = np.asarray(g.column("side"))
        q = g.filter(pa.array(side == 0))
        p = g.filter(pa.array(side == 1))
        if q.num_rows == 0 or p.num_rows == 0:
            return pa.table({query_id_col: pa.array([], pa.string()),
                             "neighbor_id": pa.array([], pa.string()),
                             "rank": pa.array([], pa.int32()),
                             "distance": pa.array([], pa.float64())})
        ref_ids = p.column("pid").to_pylist()
        order = np.argsort(np.asarray(ref_ids, dtype=object), kind="stable")
        ref_xy = np.column_stack([np.asarray(p.column("x"), dtype=np.float64)[order],
                                  np.asarray(p.column("y"), dtype=np.float64)[order]])
        ref_ids = [ref_ids[i] for i in order]
        qx = np.asarray(q.column("x"), dtype=np.float64)
        qy = np.asarray(q.column("y"), dtype=np.float64)
        idx, dist = knn_batch_kernel(qx, qy, ref_xy, min(k, len(ref_ids)))
        out = {query_id_col: [], "neighbor_id": [], "rank": [], "distance": []}
        qids = q.column("qid").to_pylist()
        for qi in range(len(qids)):
            rank = 0
            for j in range(idx.shape[1]):
                if dist[qi, j] > radius:
                    break
                rank += 1
                out[query_id_col].append(qids[qi])
                out["neighbor_id"].append(ref_ids[idx[qi, j]])
                out["rank"].append(rank)
                out["distance"].append(float(dist[qi, j]))
        return pa.table({query_id_col: pa.array(out[query_id_col], pa.string()),
                         "neighbor_id": pa.array(out["neighbor_id"], pa.string()),
                         "rank": pa.array(out["rank"], pa.int32()),
                         "distance": pa.array(out["distance"], pa.float64())})

    both = queries.map_batches(prep_queries, batch_format="pyarrow").union(
        points.map_batches(prep_points, batch_format="pyarrow"))
    return both.groupby("cell").map_groups(group_knn, batch_format="pyarrow")


def grid_metrics(queries: "ray.data.Dataset", ref_xy: np.ndarray,
                 ref_vals: np.ndarray, *, radius: float,
                 metrics: tuple = ("count", "minimum", "maximum", "range",
                                   "average", "average_distance"),
                 query_id_col: str = "point_id",
                 concurrency: int | tuple = 2) -> "ray.data.Dataset":
    """gdal_grid data-metrics + moving-average + nearest in one pass
    (GDALGridAlgorithm set, alg/gdal_alg.h:402-417): per query node, the
    scattered points within `radius` feed count/min/max/range/average/
    average-distance; `nearest` is the value of the closest point
    (unbounded).  Broadcast point set; vectorized per batch."""
    ref = ray.put({"xy": np.asarray(ref_xy, dtype=np.float64),
                   "vals": np.asarray(ref_vals, dtype=np.float64)})

    class MetricsStage:
        def __init__(self):
            d = ray.get(ref)
            self.xy = d["xy"]
            self.vals = d["vals"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            qx = np.asarray(batch.column("x"), dtype=np.float64)
            qy = np.asarray(batch.column("y"), dtype=np.float64)
            out = {query_id_col: batch.column(query_id_col)}
            nq = qx.size
            res = {m: np.full(nq, np.nan) for m in metrics}
            nearest = np.full(nq, np.nan)
            for s in range(0, nq, 1024):
                e = min(s + 1024, nq)
                dx = qx[s:e, None] - self.xy[None, :, 0]
                dy = qy[s:e, None] - self.xy[None, :, 1]
                d = np.hypot(dx, dy)
                within = d <= radius
                cnt = within.sum(axis=1)
                vals = np.where(within, self.vals[None, :], np.nan)
                with np.errstate(invalid="ignore"):
                    if "count" in res:
                        res["count"][s:e] = cnt
                    if "minimum" in res:
                        res["minimum"][s:e] = np.where(cnt > 0, np.nanmin(vals, axis=1), np.nan)
                    if "maximum" in res:
                        res["maximum"][s:e] = np.where(cnt > 0, np.nanmax(vals, axis=1), np.nan)
                    if "range" in res:
                        res["range"][s:e] = np.where(cnt > 0, np.nanmax(vals, axis=1) - np.nanmin(vals, axis=1), np.nan)
                    if "average" in res:
                        res["average"][s:e] = np.where(cnt > 0, np.nansum(vals, axis=1) / np.maximum(cnt, 1), np.nan)
                    if "average_distance" in res:
                        dd = np.where(within, d, np.nan)
                        res["average_distance"][s:e] = np.where(cnt > 0, np.nansum(dd, axis=1) / np.maximum(cnt, 1), np.nan)
                nearest[s:e] = self.vals[d.argmin(axis=1)]
            for m in metrics:
                out[m] = pa.array(res[m], pa.float64())
            out["nearest"] = pa.array(nearest, pa.float64())
            return pa.table(out)

    return queries.map_batches(MetricsStage, batch_format="pyarrow",
                               concurrency=concurrency)


def idw_interpolate(queries: "ray.data.Dataset", ref_xy: np.ndarray,
                    ref_vals: np.ndarray, *, power: float = 2.0,
                    smoothing: float = 0.0, max_points: int = 12,
                    query_id_col: str = "point_id",
                    concurrency: int | tuple = 4) -> "ray.data.Dataset":
    """gdal_grid invdistnn (GGA_InverseDistanceToAPowerNearestNeighbor,
    alg/gdal_alg.h:416): IDW over the `max_points` nearest neighbors.
    w_i = 1 / (d_i^power + smoothing); exact-hit (d=0) returns the point
    value (gdalgrid.cpp exact-match semantics)."""
    ref = ray.put({"xy": np.asarray(ref_xy, dtype=np.float64),
                   "vals": np.asarray(ref_vals, dtype=np.float64)})

    class IdwStage:
        def __init__(self):
            d = ray.get(ref)
            self.xy = d["xy"]
            self.vals = d["vals"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            qx = np.asarray(batch.column("x"), dtype=np.float64)
            qy = np.asarray(batch.column("y"), dtype=np.float64)
            idx, dist = knn_batch_kernel(qx, qy, self.xy, max_points)
            vals = self.vals[idx]
            with np.errstate(divide="ignore"):
                w = 1.0 / (dist ** power + smoothing)
            exact = dist[:, 0] == 0.0
            wsum = np.where(np.isinf(w).any(axis=1), 1.0, w.sum(axis=1))
            est = np.where(exact, vals[:, 0], (w * vals).sum(axis=1) / wsum)
            return pa.table({
                query_id_col: batch.column(query_id_col),
                "idw_value": pa.array(est, pa.float64()),
            })

    from ..stages.taskmode import stage_fn
    return queries.map_batches(stage_fn(IdwStage), batch_format="pyarrow")


def grid_linear(queries: "ray.data.Dataset", ref_xy: np.ndarray,
                ref_vals: np.ndarray, *, query_id_col: str = "point_id",
                concurrency: int | tuple = 4) -> "ray.data.Dataset":
    """gdal_grid linear (GGA_Linear, alg/gdalgrid.cpp / alg/delaunay.c):
    Delaunay-triangulate the reference points ONCE (driver side — the
    reference set is the broadcast small side, like the IDW/kNN stages),
    then barycentrically interpolate each query inside its triangle.
    Queries outside the triangulation fall back to the nearest reference
    value (GGA_Linear's nearest-neighbour fallback when a search radius is
    set)."""
    from ..core.delaunay import barycentric_interpolate, delaunay_triangulation
    xy = np.asarray(ref_xy, dtype=np.float64)
    tris = delaunay_triangulation(xy)
    ref = ray.put({"xy": xy, "vals": np.asarray(ref_vals, dtype=np.float64),
                   "tris": tris})

    class LinearStage:
        def __init__(self):
            d = ray.get(ref)
            self.xy = d["xy"]
            self.vals = d["vals"]
            self.tris = d["tris"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            qx = np.asarray(batch.column("x"), dtype=np.float64)
            qy = np.asarray(batch.column("y"), dtype=np.float64)
            val, inside = barycentric_interpolate(self.tris, self.xy,
                                                  self.vals, qx, qy)
            if (~inside).any():
                idx, _ = knn_batch_kernel(qx[~inside], qy[~inside], self.xy, 1)
                val[~inside] = self.vals[idx[:, 0]]
            return pa.table({
                query_id_col: batch.column(query_id_col),
                "linear_value": pa.array(val, pa.float64()),
                "inside_tin": pa.array(inside),
            })

    from ..stages.taskmode import stage_fn
    return queries.map_batches(stage_fn(LinearStage), batch_format="pyarrow")
