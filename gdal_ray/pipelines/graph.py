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
