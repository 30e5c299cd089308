"""Iterative graph algorithms over edge Datasets.

PageRank here is the second member (next to ``dedup.connected_components``)
of the iterative-join operator class: per round, scores join edges on src,
contributions aggregate per dst, and a closed-form update produces the next
score vector.  All arithmetic is INTEGER (scaled by ``scale``, truncating
division) so a DuckDB unrolled-CTE oracle replays it bit-exactly — the same
discipline as ``ann.kmeans_assign`` (CLAUDE.md: DuckDB ``//`` truncates,
numpy ``//`` floors; all quantities here are non-negative so they agree).

Reference analog: link-analysis / graph-centrality steps of web-corpus
curation pipelines (PageRank-weighted sampling of crawled documents).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .dedup import _splitmix


_PACK = np.int64(1) << np.int64(31)


def _triangles_driver(u: np.ndarray, v: np.ndarray) -> pa.Table:
    """Exact driver-side triangle counting (edge set fits the measured-size
    budget): canonical dedup, degree-ordered orientation, vectorized
    run-length wedge generation, one searchsorted membership pass."""
    lo = np.minimum(u, v)
    hi = np.maximum(u, v)
    keep = lo != hi
    lo, hi = lo[keep], hi[keep]
    empty = pa.table({"node": pa.array([], pa.int64()),
                      "tri": pa.array([], pa.int64())})
    if lo.size == 0:
        return empty
    if int(hi.max()) >= int(_PACK) or int(lo.min()) < 0:
        raise ValueError("triangles: node ids must fit [0, 2^31)")
    k = np.unique(lo * _PACK + hi)
    lo, hi = k // _PACK, k % _PACK
    nodes = np.unique(np.concatenate([lo, hi]))
    il = np.searchsorted(nodes, lo)
    ih = np.searchsorted(nodes, hi)
    deg = (np.bincount(il, minlength=nodes.size)
           + np.bincount(ih, minlength=nodes.size)).astype(np.int64)
    # orient from smaller (deg, node) to larger — caps out-degree at
    # O(sqrt(m)), the classic wedge-explosion bound
    dl, dh = deg[il], deg[ih]
    a_first = (dl < dh) | ((dl == dh) & (lo < hi))
    s = np.where(a_first, lo, hi)
    d = np.where(a_first, hi, lo)
    dd = np.where(a_first, dh, dl)  # degree of the dst endpoint
    order = np.lexsort((d, s))
    s, d, dd = s[order], d[order], dd[order]
    # all neighbor pairs within each src run, fully vectorized
    _, starts = np.unique(s, return_index=True)
    ends = np.append(starts[1:], s.size)
    idx = np.arange(s.size, dtype=np.int64)
    run_end = np.repeat(ends, ends - starts)
    reps = run_end - idx - 1
    first = np.repeat(idx, reps)
    if first.size == 0:
        return empty
    grp_start = np.cumsum(reps) - reps
    second = (np.arange(first.size, dtype=np.int64)
              - np.repeat(grp_start, reps) + first + 1)
    va, vb = d[first], d[second]
    da, db = dd[first], dd[second]
    af = (da < db) | ((da == db) & (va < vb))
    wl = np.where(af, va, vb)
    wh = np.where(af, vb, va)
    ekey = s * _PACK + d  # ascending by construction of the lexsort
    wkey = wl * _PACK + wh
    pos = np.searchsorted(ekey, wkey)
    hit = pos < ekey.size
    hit[hit] &= ekey[pos[hit]] == wkey[hit]
    allv = np.concatenate([s[first][hit], wl[hit], wh[hit]])
    cnt = np.bincount(np.searchsorted(nodes, allv), minlength=nodes.size)
    mz = cnt > 0
    return pa.table({"node": pa.array(nodes[mz], pa.int64()),
                     "tri": pa.array(cnt[mz].astype(np.int64), pa.int64())})


def triangles(edges: "ray.data.Dataset", *, src_col: str = "src",
              dst_col: str = "dst",
              driver_limit: int = 2_000_000) -> "ray.data.Dataset":
    """Per-vertex triangle counts over an undirected graph (third member of
    the graph operator class, next to PageRank and connected components —
    the clustering-coefficient / spam-farm-signal step of web-corpus
    curation).  Output: (node, tri) for every vertex in ≥1 triangle.

    Algorithm (both paths identical semantics): canonicalize u<v and
    dedup; orient every edge from the smaller to the larger (degree, node)
    pair — the standard orientation that bounds out-degree by O(sqrt(m))
    and hence total wedges by O(m^1.5) even on power-law graphs; generate
    wedges per src; a wedge (u→v, u→w) closes iff the oriented edge
    (v,w) exists.  Each triangle is found exactly once.

    Scale shape — measured-size contract: edge sets fitting
    ``driver_limit`` resolve with one exact vectorized driver pass.
    Larger graphs run distributed: pair-keyed dedup + degree join +
    wedge generation + closure matching are each ONE hashed-bucket
    shuffle through ``grouped_map_groups``/``grouped_agg`` — no all-pairs,
    no driver materialization.  Node ids must fit [0, 2^31) (packed-pair
    int64 keys)."""
    from .shuffle_utils import grouped_agg, grouped_map_groups

    def canon(b: pa.Table) -> pa.Table:
        u = np.asarray(b.column(src_col), np.int64)
        v = np.asarray(b.column(dst_col), np.int64)
        lo = np.minimum(u, v)
        hi = np.maximum(u, v)
        keep = lo != hi
        lo, hi = lo[keep], hi[keep]
        if lo.size and (int(hi.max()) >= int(_PACK) or int(lo.min()) < 0):
            raise ValueError("triangles: node ids must fit [0, 2^31)")
        k = np.unique(lo * _PACK + hi)  # per-batch combiner
        return pa.table({"pk": pa.array(k, pa.int64())})

    eds = edges.map_batches(canon, batch_format="pyarrow").materialize()
    n_edges = eds.count()
    empty = pa.table({"node": pa.array([], pa.int64()),
                      "tri": pa.array([], pa.int64())})
    if n_edges == 0:
        return ray.data.from_arrow(empty)
    if n_edges <= driver_limit:
        tbl = pa.concat_tables(
            b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
            for b in eds.iter_batches(batch_format="pyarrow"))
        k = np.asarray(tbl.column("pk"), np.int64)
        return ray.data.from_arrow(_triangles_driver(k // _PACK, k % _PACK))

    # ---- distributed ----
    def first_row(g: pa.Table) -> pa.Table:
        return g.slice(0, 1)

    uniq = grouped_map_groups(eds, "pk", first_row, driver_limit=0)

    def unpack(b: pa.Table) -> pa.Table:
        k = np.asarray(b.column("pk"), np.int64)
        return pa.table({"lo": pa.array(k // _PACK),
                         "hi": pa.array(k % _PACK)})

    ue = uniq.map_batches(unpack, batch_format="pyarrow").materialize()

    def deg_rows(b: pa.Table) -> pa.Table:
        lo = np.asarray(b.column("lo"), np.int64)
        hi = np.asarray(b.column("hi"), np.int64)
        return pa.table({"node": pa.array(np.concatenate([lo, hi])),
                         "dg": pa.array(np.ones(2 * lo.size, np.int64))})

    deg = grouped_agg(ue.map_batches(deg_rows, batch_format="pyarrow"),
                      ["node"], [("dg", "sum")], driver_limit=0)

    # attach the degree of one endpoint per co-shuffle round
    def attach(ds, end_col, out_col):
        def edge_rows(b: pa.Table) -> pa.Table:
            cols = {"k": b.column(end_col), "lo": b.column("lo"),
                    "hi": b.column("hi"),
                    "dv": pa.array(np.full(b.num_rows, -1, np.int64)),
                    "tag": pa.array(np.zeros(b.num_rows, np.int64))}
            for extra in ("dlo",):
                if extra in b.column_names:
                    cols[extra] = b.column(extra)
            return pa.table(cols)

        def deg_row(b: pa.Table) -> pa.Table:
            n = np.asarray(b.column("node"), np.int64)
            cols = {"k": pa.array(n), "lo": pa.array(n), "hi": pa.array(n),
                    "dv": b.column("dg"),
                    "tag": pa.array(np.ones(n.size, np.int64))}
            if out_col == "dhi":
                cols["dlo"] = pa.array(np.zeros(n.size, np.int64))
            return pa.table(cols)

        mixed = ds.map_batches(edge_rows, batch_format="pyarrow").union(
            deg.map_batches(deg_row, batch_format="pyarrow"))

        def fill(g: pa.Table) -> pa.Table:
            tag = np.asarray(g.column("tag"), np.int64)
            dv = np.asarray(g.column("dv"), np.int64)
            dval = int(dv[tag == 1][0]) if (tag == 1).any() else 0
            e = g.filter(pa.array(tag == 0)).drop_columns(["k", "dv", "tag"])
            return e.append_column(
                out_col, pa.array(np.full(e.num_rows, dval, np.int64)))

        return grouped_map_groups(mixed, "k", fill, driver_limit=0)

    ue2 = attach(ue, "lo", "dlo")
    ue3 = attach(ue2, "hi", "dhi").materialize()

    def orient(b: pa.Table) -> pa.Table:
        lo = np.asarray(b.column("lo"), np.int64)
        hi = np.asarray(b.column("hi"), np.int64)
        dl = np.asarray(b.column("dlo"), np.int64)
        dh = np.asarray(b.column("dhi"), np.int64)
        af = (dl < dh) | ((dl == dh) & (lo < hi))
        return pa.table({"src": pa.array(np.where(af, lo, hi)),
                         "dst": pa.array(np.where(af, hi, lo)),
                         "ddst": pa.array(np.where(af, dh, dl))})

    oe = ue3.map_batches(orient, batch_format="pyarrow").materialize()

    def wedges(g: pa.Table) -> pa.Table:
        d = np.asarray(g.column("dst"), np.int64)
        dd = np.asarray(g.column("ddst"), np.int64)
        u = int(np.asarray(g.column("src"), np.int64)[0])
        i, j = np.triu_indices(d.size, 1)
        va, vb, da, db = d[i], d[j], dd[i], dd[j]
        af = (da < db) | ((da == db) & (va < vb))
        wl = np.where(af, va, vb)
        wh = np.where(af, vb, va)
        return pa.table({"pk": pa.array(wl * _PACK + wh),
                         "u": pa.array(np.full(wl.size, u, np.int64)),
                         "tag": pa.array(np.zeros(wl.size, np.int64))})

    wds = grouped_map_groups(oe, "src", wedges, driver_limit=0)

    def edge_keys(b: pa.Table) -> pa.Table:
        s = np.asarray(b.column("src"), np.int64)
        d = np.asarray(b.column("dst"), np.int64)
        return pa.table({"pk": pa.array(s * _PACK + d),
                         "u": pa.array(np.full(s.size, -1, np.int64)),
                         "tag": pa.array(np.ones(s.size, np.int64))})

    mixed = wds.union(oe.map_batches(edge_keys, batch_format="pyarrow"))

    def close(g: pa.Table) -> pa.Table:
        tag = np.asarray(g.column("tag"), np.int64)
        out = pa.table({"node": pa.array([], pa.int64()),
                        "c": pa.array([], pa.int64())})
        if not (tag == 1).any():
            return out
        w = np.asarray(g.column("u"), np.int64)[tag == 0]
        if w.size == 0:
            return out
        pk = int(np.asarray(g.column("pk"), np.int64)[0])
        v, x = pk // int(_PACK), pk % int(_PACK)
        return pa.table({
            "node": pa.array(np.concatenate([w, [v, x]]), pa.int64()),
            "c": pa.array(np.concatenate(
                [np.ones(w.size, np.int64), [w.size, w.size]]), pa.int64())})

    part = grouped_map_groups(mixed, "pk", close, driver_limit=0)
    agg = grouped_agg(part, ["node"], [("c", "sum")], driver_limit=0)

    def finish(b: pa.Table) -> pa.Table:
        c = np.asarray(b.column("c"), np.int64)
        m = c > 0
        return pa.table({"node": b.column("node").filter(pa.array(m)),
                         "tri": pa.array(c[m], pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def _pagerank_driver(src: np.ndarray, dst: np.ndarray, *, iters: int,
                     scale: int) -> pa.Table:
    """Exact driver-side reference path (edge set fits the measured-size
    budget): one searchsorted id→index map + bincount per round."""
    nodes = np.unique(np.concatenate([src, dst]))
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    outdeg = np.bincount(si, minlength=nodes.size).astype(np.int64)
    r = np.full(nodes.size, scale, dtype=np.int64)
    base = (15 * scale) // 100
    for _ in range(iters):
        contrib = r[si] // outdeg[si]
        s = np.zeros(nodes.size, dtype=np.int64)
        np.add.at(s, di, contrib)
        r = base + (85 * s) // 100
    return pa.table({"node": pa.array(nodes, pa.int64()),
                     "score_q": pa.array(r, pa.int64())})


def pagerank(edges: "ray.data.Dataset", *, iters: int = 3,
             scale: int = 10 ** 9, src_col: str = "src",
             dst_col: str = "dst",
             driver_limit: int = 2_000_000) -> "ray.data.Dataset":
    """Damped PageRank (d = 0.85) in exact scaled-int64 arithmetic.

    Update rule (truncating integer division, replayed verbatim in SQL):
        r0[v]   = scale
        r'[v]   = (15·scale)//100 + (85·Σ_{u→v} r[u]//outdeg[u])//100
    Nodes are the distinct endpoints of ``edges``; dangling nodes (no
    out-edges) simply contribute nothing.

    Scale shape — measured-size contract: an edge set that fits
    ``driver_limit`` rows resolves with the exact vectorized driver pass
    (bincount per round).  Larger sets run the distributed rounds: edges
    are hash-bucketed by src ONCE (splitmix — raw ids stripe); each round
    co-shuffles only the (node, r, outdeg) score rows into those buckets,
    joins in-group via searchsorted (no per-group dispatch), and the
    per-dst contribution sum goes through ``grouped_agg`` partials.  Per
    round that is one bucket shuffle of the score vector plus one
    aggregate — no all-pairs, no driver materialization of edges."""
    from .shuffle_utils import bucket_count, grouped_agg, grouped_map_groups

    def canon(b: pa.Table) -> pa.Table:
        return pa.table({
            "src": pa.array(np.asarray(b.column(src_col), np.int64)),
            "dst": pa.array(np.asarray(b.column(dst_col), np.int64))})

    eds = edges.map_batches(canon, batch_format="pyarrow").materialize()
    n_edges = eds.count()
    empty = pa.table({"node": pa.array([], pa.int64()),
                      "score_q": pa.array([], pa.int64())})
    if n_edges == 0:
        return ray.data.from_arrow(empty)

    if n_edges <= driver_limit:
        tbl = pa.concat_tables(
            b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
            for b in eds.iter_batches(batch_format="pyarrow"))
        return ray.data.from_arrow(_pagerank_driver(
            np.asarray(tbl.column("src"), np.int64),
            np.asarray(tbl.column("dst"), np.int64),
            iters=iters, scale=scale))

    # ---- distributed rounds ----
    nb = bucket_count()

    def bucket_edges(b: pa.Table) -> pa.Table:
        s = np.asarray(b.column("src"), np.int64)
        bkt = (_splitmix(s.astype(np.uint64)) % np.uint64(nb)).astype(np.int64)
        return pa.table({"bkt": pa.array(bkt), "src": b.column("src"),
                         "dst": b.column("dst"),
                         "r": pa.array(np.full(s.size, -1, np.int64)),
                         "od": pa.array(np.zeros(s.size, np.int64))})

    ebkt = eds.map_batches(bucket_edges, batch_format="pyarrow").materialize()

    # node set + outdeg: one aggregate over edge endpoints (outdeg of a
    # dst-only node is 0 — it never appears as a join src)
    def deg_rows(b: pa.Table) -> pa.Table:
        s = np.asarray(b.column("src"), np.int64)
        d = np.asarray(b.column("dst"), np.int64)
        return pa.table({
            "node": pa.array(np.concatenate([s, d])),
            "od": pa.array(np.concatenate([np.ones(s.size, np.int64),
                                           np.zeros(d.size, np.int64)]))})

    deg = grouped_agg(eds.map_batches(deg_rows, batch_format="pyarrow"),
                      ["node"], [("od", "sum")], driver_limit=0)

    def init_scores(b: pa.Table) -> pa.Table:
        n = np.asarray(b.column("node"), np.int64)
        return pa.table({"node": pa.array(n),
                         "r": pa.array(np.full(n.size, scale, np.int64)),
                         "od": pa.array(np.asarray(b.column("od"), np.int64))})

    scores = deg.map_batches(init_scores, batch_format="pyarrow").materialize()
    base = (15 * scale) // 100

    for _ in range(iters):
        def bucket_scores(b: pa.Table) -> pa.Table:
            n = np.asarray(b.column("node"), np.int64)
            bkt = (_splitmix(n.astype(np.uint64)) % np.uint64(nb)) \
                .astype(np.int64)
            return pa.table({"bkt": pa.array(bkt), "src": pa.array(n),
                             "dst": pa.array(np.full(n.size, -1, np.int64)),
                             "r": b.column("r"), "od": b.column("od")})

        mixed = ebkt.union(
            scores.map_batches(bucket_scores, batch_format="pyarrow"))

        def join_emit(g: pa.Table) -> pa.Table:
            src = np.asarray(g.column("src"), np.int64)
            dst = np.asarray(g.column("dst"), np.int64)
            rr = np.asarray(g.column("r"), np.int64)
            od = np.asarray(g.column("od"), np.int64)
            is_score = rr >= 0
            sn = src[is_score]
            order = np.argsort(sn)
            sn_s, r_s, od_s = sn[order], rr[is_score][order], od[is_score][order]
            e = ~is_score
            es, ed = src[e], dst[e]
            pos = np.searchsorted(sn_s, es)
            # every edge src has a score row in this bucket by construction
            contrib = r_s[pos] // np.maximum(od_s[pos], 1)
            # zero self-rows keep dst-only / isolated-in nodes in the agg
            # and carry outdeg forward to the next round's score vector
            return pa.table({
                "node": pa.array(np.concatenate([ed, sn_s])),
                "c": pa.array(np.concatenate([contrib,
                                              np.zeros(sn_s.size, np.int64)])),
                "od2": pa.array(np.concatenate([np.zeros(ed.size, np.int64),
                                                od_s]))})

        part = grouped_map_groups(mixed, "bkt", join_emit, driver_limit=0)
        agg = grouped_agg(part, ["node"], [("c", "sum"), ("od2", "max")],
                          driver_limit=0)

        def update(b: pa.Table) -> pa.Table:
            s = np.asarray(b.column("c"), np.int64)
            return pa.table({
                "node": b.column("node"),
                "r": pa.array(base + (85 * s) // 100),
                "od": pa.array(np.asarray(b.column("od2"), np.int64))})

        scores = agg.map_batches(update, batch_format="pyarrow").materialize()

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column("node"),
                         "score_q": b.column("r")})

    return scores.map_batches(finish, batch_format="pyarrow")
