"""Skew-aware hybrid hash join: broadcast the heavy keys, shuffle the rest.

A plain hash join routes every probe row through the all-to-all exchange;
one hot key (a default value, a null sentinel, a mega-customer) lands its
entire row mass on a single aggregator and the join runs at the speed of
that one straggler.  The hybrid plan measures the probe side's key
histogram first (per-batch distinct-key combiner — bounded by block
vocabulary, not block length — then the measured-size grouped merge),
promotes keys holding at least ``hot_num/hot_den`` of the rows to a HOT
set, and splits the plan:

- HOT rows join MAP-SIDE against the broadcast build rows of those keys
  (``ray.put`` once, searchsorted + run-length expansion per batch —
  duplicate build keys replicate correctly), touching no shuffle at all;
- COLD rows go through the ordinary capped hash join.

The two branches union.  The broadcast set is bounded twice: at most
``max_hot`` keys, and at most ``max_broadcast_rows`` build rows (hottest
keys first; anything over the budget falls back to the cold path, so the
plan degrades to a plain hash join, never to an OOM).  This is the
relational counterpart of the spatial cell-salt machinery
(spatial_join.py) — same contract the reference's tile/feature skew
handling needs at 100-TB catalog scale.

Inner join, int64 keys.  The probe side is scanned twice (once per
branch) — two cheap filtered column scans instead of shuffling the hot
mass, the standard adaptive-skew trade.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from .shuffle_utils import grouped_sum_int64


def _probe_histogram(big: "ray.data.Dataset", key: str):
    """(per-key row counts, total rows) in one streaming pass + merge."""

    def part(b: pa.Table) -> pa.Table:
        k = np.asarray(b.column(key), np.int64)
        u, c = np.unique(k, return_counts=True)
        return pa.table({"k": pa.array(u), "cnt": pa.array(
            c.astype(np.int64))})

    merged = grouped_sum_int64(
        big.map_batches(part, batch_format="pyarrow"), "k", "cnt")
    if not isinstance(merged, pa.Table):
        # distributed merge path: every key is one row now; only the
        # heavy candidates (cnt above any plausible threshold) need to
        # reach the driver, and there are at most den of those per 1/den
        # threshold — ship each block's top slice.
        def head(b: pa.Table) -> pa.Table:
            c = np.asarray(b.column("cnt"), np.int64)
            keep = np.argsort(-c)[:256]
            return b.take(pa.array(np.sort(keep), pa.int64()))

        parts = [t if isinstance(t, pa.Table) else pa.Table.from_batches([t])
                 for t in merged.map_batches(head, batch_format="pyarrow")
                 .iter_batches(batch_format="pyarrow")]
        merged = pa.concat_tables(parts)
        total = None  # caller computes via big.count()
    else:
        total = int(np.asarray(merged.column("cnt"), np.int64).sum())
    return merged, total


def skew_hybrid_join(big: "ray.data.Dataset", small: "ray.data.Dataset",
                     on: str, right_on: str, *,
                     hot_num: int = 1, hot_den: int = 100,
                     max_hot: int = 64,
                     max_broadcast_rows: int = 1_000_000,
                     num_partitions: int | None = None
                     ) -> "ray.data.Dataset":
    """Inner-join ``big ⋈ small`` on int64 keys with heavy-key splitting.

    Output schema = big's columns + small's non-key columns (the build
    key is dropped — it equals ``on``), identical on both branches.
    """
    hist, total = _probe_histogram(big, on)
    if total is None:
        total = big.count()
    hk = np.asarray(hist.column("k"), np.int64)
    hc = np.asarray(hist.column("cnt"), np.int64)
    thresh = max(1, (total * hot_num) // hot_den)
    cand = np.argsort(-hc)[:max_hot]
    cand = cand[hc[cand] >= thresh]
    hot_keys = hk[cand]

    if num_partitions is None:
        from .relational import _join_partitions
        num_partitions = _join_partitions()

    small_cols = [c for c in small.schema().base_schema.names
                  if c != right_on]

    if hot_keys.size:
        # bounded build-side collect, hottest keys first under the budget
        hot_set = set(int(x) for x in hot_keys)

        def build_filter(b: pa.Table) -> pa.Table:
            k = np.asarray(b.column(right_on), np.int64)
            return b.filter(pa.array(np.isin(k, hot_keys)))

        parts = [t if isinstance(t, pa.Table) else pa.Table.from_batches([t])
                 for t in small.map_batches(build_filter,
                                            batch_format="pyarrow")
                 .iter_batches(batch_format="pyarrow")]
        if parts:
            build = pa.concat_tables(parts)
        else:  # hot probe keys with NO build rows: empty build table —
            # the searchsorted ranges all come back empty, so hot probe
            # rows correctly produce zero output
            sch = small.schema().base_schema
            build = pa.table({f.name: pa.array([], f.type) for f in sch})
        if build.num_rows > max_broadcast_rows:
            # demote coldest hot keys until the broadcast fits
            order = np.argsort(-hc[cand])  # hottest first
            keep, rows = [], 0
            bk = np.asarray(build.column(right_on), np.int64)
            per_key = {int(k): int(n) for k, n in
                       zip(*np.unique(bk, return_counts=True))}
            for i in order:
                k = int(hk[cand[i]])
                r = per_key.get(k, 0)
                if rows + r > max_broadcast_rows:
                    continue
                keep.append(k)
                rows += r
            hot_keys = np.array(sorted(keep), np.int64)
            hot_set = set(keep)
            build = build.filter(pa.array(np.isin(bk, hot_keys)))

        if hot_keys.size:
            bk = np.asarray(build.column(right_on), np.int64)
            order = np.argsort(bk, kind="stable")
            build = build.take(pa.array(order, pa.int64()))
            bk = bk[order]
            build_ref = ray.put((bk, build.drop_columns([right_on])))

            def hot_branch(b: pa.Table, _keys=hot_keys) -> pa.Table:
                k = np.asarray(b.column(on), np.int64)
                t = b.filter(pa.array(np.isin(k, _keys)))
                if t.num_rows == 0:
                    return None  # replaced below — schema-stable empty
                kk = np.asarray(t.column(on), np.int64)
                sbk, stbl = ray.get(build_ref)
                lo = np.searchsorted(sbk, kk, side="left")
                hi = np.searchsorted(sbk, kk, side="right")
                reps = (hi - lo).astype(np.int64)
                probe_idx = np.repeat(np.arange(kk.size), reps)
                # build indices: for each probe row, lo[i]..hi[i]-1
                cum = np.concatenate(([0], np.cumsum(reps)))
                bidx = (np.arange(cum[-1]) - np.repeat(cum[:-1], reps)
                        + np.repeat(lo, reps))
                out = t.take(pa.array(probe_idx, pa.int64()))
                srows = stbl.take(pa.array(bidx, pa.int64()))
                for c in srows.column_names:
                    out = out.append_column(c, srows.column(c))
                return out

            def hot_branch_safe(b: pa.Table) -> pa.Table:
                r = hot_branch(b)
                if r is not None:
                    return r
                cols = {c: b.column(c).slice(0, 0)
                        for c in b.column_names}
                sch = build.schema
                for c in small_cols:
                    cols[c] = pa.array([], sch.field(c).type)
                return pa.table(cols)

            hot_ds = big.map_batches(hot_branch_safe, batch_format="pyarrow")

            def cold_filter(b: pa.Table, _keys=hot_keys) -> pa.Table:
                k = np.asarray(b.column(on), np.int64)
                return b.filter(pa.array(~np.isin(k, _keys)))

            cold_in = big.map_batches(cold_filter, batch_format="pyarrow")
            cold_ds = cold_in.join(small, join_type="inner",
                                   num_partitions=num_partitions,
                                   on=(on,), right_on=(right_on,))
            # identical column ORDER on both branches (union contract)
            out_cols = list(big.schema().base_schema.names) + small_cols
            return hot_ds.select_columns(out_cols).union(
                cold_ds.select_columns(out_cols))

    out = big.join(small, join_type="inner",
                   num_partitions=num_partitions,
                   on=(on,), right_on=(right_on,))
    return out.drop_columns([right_on]) \
        if right_on in out.schema().base_schema.names else out
