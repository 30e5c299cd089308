"""As-of join — the time-series custom operator Ray Data lacks (named in
the engine's charter next to range joins and windowed aggregates): for
every left row, the single most recent right row of the same key with
``right.ts <= left.ts`` (backward direction; ties broken toward the
largest right id so the result is total-order deterministic).

Scale shape (the events_sessions doctrine): both sides are tagged and
routed to splitmix-hashed key buckets — ONE shuffle co-locates a key's
rows from both sides — and each bucket group is resolved with per-key
``np.searchsorted`` over the right side sorted once per bucket.  The
measured-size ``grouped_map_groups`` skips the shuffle entirely when the
combined stream is small.  No driver materialization anywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def asof_join(left: "ray.data.Dataset", right: "ray.data.Dataset", *,
              by: str, on: str, left_id: str, right_id: str,
              num_buckets: int = 64) -> "ray.data.Dataset":
    """(left_id, right_id, gap) rows: for each left row the most recent
    right row of the same ``by`` key with ``right.on <= left.on`` (inner:
    left rows with no prior right row are dropped).  ``on`` must be an
    int64-comparable column (timestamps are compared in µs);
    ``gap = left.on - right.on`` in the same unit."""
    from .dedup import _splitmix
    from .shuffle_utils import grouped_map_groups

    def tag(side: int):
        def fn(b: pa.Table) -> pa.Table:
            k = np.asarray(b.column(by), np.int64)
            ts_col = b.column(on)
            if pa.types.is_timestamp(ts_col.type):
                ts_col = ts_col.cast(pa.int64())
            return pa.table({
                "k": pa.array(k, pa.int64()),
                "ts": pa.array(np.asarray(ts_col, np.int64), pa.int64()),
                "rid": b.column(left_id if side == 0 else right_id)
                        .cast(pa.int64()),
                "side": pa.array(np.full(k.size, side, np.int8)),
                "bucket": pa.array(
                    (_splitmix(k.astype(np.uint64))
                     % np.uint64(num_buckets)).astype(np.int64)),
            })
        return fn

    both = left.map_batches(tag(0), batch_format="pyarrow") \
        .union(right.map_batches(tag(1), batch_format="pyarrow"))

    def resolve(g: pa.Table) -> pa.Table:
        side = np.asarray(g.column("side"), np.int8)
        k = np.asarray(g.column("k"), np.int64)
        ts = np.asarray(g.column("ts"), np.int64)
        rid = np.asarray(g.column("rid"), np.int64)
        L, R = side == 0, side == 1
        empty = pa.table({left_id: pa.array([], pa.int64()),
                          right_id: pa.array([], pa.int64()),
                          "gap": pa.array([], pa.int64())})
        if not L.any() or not R.any():
            return empty
        # right side sorted once: (key, ts, id) — searchsorted 'right' on
        # ts then idx-1 lands on the largest (ts, id) ≤ the probe
        ro = np.lexsort((rid[R], ts[R], k[R]))
        rk, rts, rids = k[R][ro], ts[R][ro], rid[R][ro]
        lk, lts, lids = k[L], ts[L], rid[L]
        uk, rstart = np.unique(rk, return_index=True)
        rend = np.append(rstart[1:], rk.size)
        out_l, out_r, out_g = [], [], []
        for i, key in enumerate(uk):
            m = lk == key
            if not m.any():
                continue
            s, e = rstart[i], rend[i]
            pos = np.searchsorted(rts[s:e], lts[m], side="right") - 1
            hit = pos >= 0
            out_l.append(lids[m][hit])
            out_r.append(rids[s:e][pos[hit]])
            out_g.append(lts[m][hit] - rts[s:e][pos[hit]])
        if not out_l:
            return empty
        return pa.table({
            left_id: pa.array(np.concatenate(out_l), pa.int64()),
            right_id: pa.array(np.concatenate(out_r), pa.int64()),
            "gap": pa.array(np.concatenate(out_g), pa.int64())})

    return grouped_map_groups(both, "bucket", resolve)


def interval_join_broadcast(points: "ray.data.Dataset", intervals: pa.Table,
                            *, value_col: str, lo_col: str = "lo",
                            hi_col: str = "hi", band_col: str = "band"
                            ) -> "ray.data.Dataset":
    """Range join against a small interval table (overlapping intervals
    allowed — a point matches EVERY [lo, hi) containing it): the interval
    side ships once via ``ray.put`` and every point batch evaluates the
    containment vectorized per interval — zero shuffle, the broadcast
    analog of the spatial PIP join.  Big×big range joins would instead
    range-partition both sides on the value domain (the cell-join
    doctrine); this operator covers the ubiquitous small-bands case."""
    ref = ray.put({
        "lo": np.asarray(intervals.column(lo_col), np.float64),
        "hi": np.asarray(intervals.column(hi_col), np.float64),
        "band": np.asarray(intervals.column(band_col), np.int64)})

    def fn(b: pa.Table) -> pa.Table:
        iv = ray.get(ref)
        v = np.asarray(b.column(value_col), np.float64)
        idx_parts, band_parts = [], []
        for j in range(iv["band"].size):
            m = (v >= iv["lo"][j]) & (v < iv["hi"][j])
            nz = np.flatnonzero(m)
            idx_parts.append(nz)
            band_parts.append(np.full(nz.size, iv["band"][j], np.int64))
        if not idx_parts:
            return b.slice(0, 0).append_column(band_col,
                                               pa.array([], pa.int64()))
        idx = np.concatenate(idx_parts)
        out = b.take(pa.array(idx, pa.int64()))
        return out.append_column(band_col,
                                 pa.array(np.concatenate(band_parts),
                                          pa.int64()))

    return points.map_batches(fn, batch_format="pyarrow")
