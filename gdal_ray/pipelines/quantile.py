"""Exact distributed quantiles by iterative histogram refinement.

Selection (k-th smallest) WITHOUT a global sort: each round runs ONE
map_batches pass that histograms every still-active quantile's candidate
value range into at most ``B`` buckets (counts only — no values move off
their blocks), the driver walks the tiny cumulative-count tables to
shrink each range, and a quantile finishes when its range collapses to a
single value or its surviving population fits ``collect_cap`` (then one
bounded filtered collect + ``np.partition`` selects locally).

Scale shape: log_B(domain) streaming passes over the column, O(B ×
quantiles) driver state per round, zero all-to-all shuffle — the same
refinement scheme GDAL's ComputeRasterMinMax / GetHistogram statistics
path applies per-band (reference gcore/rasterband.cpp histogram
machinery), lifted to a cluster-wide selection operator.  Bucketing uses
``(v - lo) // step`` (division, not multiplication) so any int64 domain
is overflow-free.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from .shuffle_utils import grouped_sum_int64

_B = 4096          # buckets per active range per round
_MAX_ROUNDS = 8    # step shrinks ×B per round: 4096^6 > 2^63 — 8 is slack


def _stats(ds: "ray.data.Dataset", col: str) -> tuple[int, int, int]:
    """One streaming pass → (n, min, max) of an int64 column."""

    def part(b: pa.Table) -> pa.Table:
        v = np.asarray(b.column(col), np.int64)
        if v.size == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        return pa.table({"n": pa.array([v.size], pa.int64()),
                         "lo": pa.array([int(v.min())], pa.int64()),
                         "hi": pa.array([int(v.max())], pa.int64())})

    rows = ds.map_batches(part, batch_format="pyarrow").take_all()
    if not rows:
        return 0, 0, 0
    return (sum(r["n"] for r in rows),
            min(r["lo"] for r in rows),
            max(r["hi"] for r in rows))


def exact_quantiles(ds: "ray.data.Dataset", col: str,
                    pcts: list[int],
                    collect_cap: int = 262_144) -> pa.Table:
    """Exact percentile values of int64 column ``col``.

    Returns one row per requested integer percent: ``q_pct``, total row
    count ``n``, 1-based order-statistic position ``pos = ceil(n·q/100)``
    (computed as ``(n·q + 99) // 100`` — truncating division on positive
    ints == ceil, matching DuckDB ``//``), and the exact k-th smallest
    ``value_q``.  Ties need no special casing: selection is rank-based.
    """
    n, glo, ghi = _stats(ds, col)
    if n == 0:
        return pa.table({"q_pct": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64()),
                         "pos": pa.array([], pa.int64()),
                         "value_q": pa.array([], pa.int64())})

    # active[i] = (pct, lo, hi, k): find k-th smallest among values in
    # [lo, hi] (k is the LOCAL rank — counts below lo already subtracted).
    active = [(p, glo, ghi, (n * p + 99) // 100) for p in pcts]
    resolved: dict[int, int] = {}

    for _ in range(_MAX_ROUNDS):
        live = [(p, lo, hi, k) for (p, lo, hi, k) in active
                if p not in resolved]
        if not live:
            break
        steps = [max(1, ((hi - lo + 1) + _B - 1) // _B)
                 for (_, lo, hi, _) in live]
        los = [lo for (_, lo, _, _) in live]
        his = [hi for (_, _, hi, _) in live]

        def hist(b: pa.Table, _los=los, _his=his, _steps=steps) -> pa.Table:
            v = np.asarray(b.column(col), np.int64)
            keys, cnts = [], []
            for i, (lo, hi, st) in enumerate(zip(_los, _his, _steps)):
                w = v[(v >= lo) & (v <= hi)]
                if w.size == 0:
                    continue
                bk = (w - lo) // st
                c = np.bincount(bk, minlength=1).astype(np.int64)
                nz = np.flatnonzero(c)
                keys.append(i * _B + nz)
                cnts.append(c[nz])
            if not keys:
                return pa.table({"key": pa.array([], pa.int64()),
                                 "cnt": pa.array([], pa.int64())})
            return pa.table({"key": pa.array(np.concatenate(keys)),
                             "cnt": pa.array(np.concatenate(cnts))})

        merged = grouped_sum_int64(
            ds.map_batches(hist, batch_format="pyarrow"), "key", "cnt")
        if not isinstance(merged, pa.Table):
            merged = pa.concat_tables(
                t if isinstance(t, pa.Table) else pa.Table.from_batches([t])
                for t in merged.iter_batches(batch_format="pyarrow"))
        mk = np.asarray(merged.column("key"), np.int64)
        mc = np.asarray(merged.column("cnt"), np.int64)

        nxt = []
        collect = []  # (pct, lo, hi, k) small enough to gather
        for i, (p, lo, hi, k) in enumerate(live):
            sel = (mk // _B) == i
            bks, cs = mk[sel] % _B, mc[sel]
            order = np.argsort(bks)
            bks, cs = bks[order], cs[order]
            cum = np.cumsum(cs)
            j = int(np.searchsorted(cum, k))
            st = steps[i]
            nlo = lo + int(bks[j]) * st
            nhi = min(hi, nlo + st - 1)
            nk = int(k - (cum[j - 1] if j else 0))
            cnt_in = int(cs[j])
            if nlo == nhi:
                resolved[p] = nlo
            elif cnt_in <= collect_cap:
                collect.append((p, nlo, nhi, nk))
            else:
                nxt.append((p, nlo, nhi, nk))

        if collect:
            clos = [lo for (_, lo, _, _) in collect]
            chis = [hi for (_, _, hi, _) in collect]

            def gather(b: pa.Table, _los=clos, _his=chis) -> pa.Table:
                v = np.asarray(b.column(col), np.int64)
                idx, val = [], []
                for i, (lo, hi) in enumerate(zip(_los, _his)):
                    w = v[(v >= lo) & (v <= hi)]
                    idx.append(np.full(w.size, i, np.int64))
                    val.append(w)
                return pa.table({"qi": pa.array(np.concatenate(idx)),
                                 "val": pa.array(np.concatenate(val))})

            rows = ds.map_batches(gather, batch_format="pyarrow").take_all()
            qi = np.array([r["qi"] for r in rows], np.int64)
            vv = np.array([r["val"] for r in rows], np.int64)
            for i, (p, lo, hi, k) in enumerate(collect):
                w = vv[qi == i]
                resolved[p] = int(np.partition(w, k - 1)[k - 1])

        active = nxt + [(p, 0, 0, 0) for p in resolved]
        if not nxt:
            break

    return pa.table({
        "q_pct": pa.array([p for p in pcts], pa.int64()),
        "n": pa.array([n] * len(pcts), pa.int64()),
        "pos": pa.array([(n * p + 99) // 100 for p in pcts], pa.int64()),
        "value_q": pa.array([resolved[p] for p in pcts], pa.int64()),
    })
