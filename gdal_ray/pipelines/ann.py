"""Similarity search over an embedding column (``list<float>``).

  - brute_force_topk: exact cosine top-k — query matrix broadcast via
    ``ray.put`` once; each batch does one matmul against it (numpy BLAS),
    emits per-batch partial top-k; final per-query merge is a tiny groupby.
  - ivf_topk: IVF-style scale path — vectors bucketed to nearest of C
    centroids (computed from a deterministic sample); queries probe only
    nprobe buckets, turning the scan into a partition-pruned read.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from gdal_ray.core.arrow_utils import list_column_to_ndarray


def _normalize(V: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(V, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return V / n


class _TopkStage:
    """Per-batch partial top-k: (batch vectors) @ (broadcast queries)."""

    def __init__(self, q_ref, k: int, id_col: str, vec_col: str):
        q = ray.get(q_ref) if isinstance(q_ref, ray.ObjectRef) else q_ref
        self.Q = _normalize(np.asarray(q["vecs"], dtype=np.float64))
        self.q_ids = pa.array(list(q["ids"]))
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        V = _normalize(list_column_to_ndarray(batch.column(self.vec_col)))
        n = V.shape[0]
        nq = len(self.q_ids)
        S = V @ self.Q.T  # (n, q)
        k = min(self.k, n)
        if k < n:
            idx = np.argpartition(-S, k - 1, axis=0)[:k]      # (k, q)
        else:
            idx = np.tile(np.arange(n)[:, None], (1, nq))
        rows = idx.T.ravel()                                  # query-major
        qidx = np.repeat(np.arange(nq, dtype=np.int64), k)
        cos = S[rows, qidx]
        return pa.table({"query_id": self.q_ids.take(pa.array(qidx)),
                         self.id_col: batch.column(self.id_col).take(
                             pa.array(rows, pa.int64())),
                         "cosine": pa.array(cos, pa.float64())})


def _merge_topk_per_query(partials: "ray.data.Dataset", k: int,
                          id_col: str,
                          driver_limit: int = 4_000_000) -> "ray.data.Dataset":
    """Final per-query top-k merge over per-block partials.  Partial volume
    is k × queries × blocks rows — MEASURED: small sets merge driver-side
    (no sort-shuffle round, whose fixed cost dwarfs a few thousand rows);
    big fan-ins keep the distributed ``groupby(query_id).map_groups``."""
    def merge(g: pa.Table) -> pa.Table:
        cos = np.asarray(g.column("cosine"), dtype=np.float64)
        ids = g.column(id_col).to_pylist()
        # deterministic: sort by (-cosine, id)
        order = sorted(range(len(ids)), key=lambda i: (-cos[i], ids[i]))[:k]
        qid = g.column("query_id")[0].as_py()
        return pa.table({"query_id": pa.array([qid] * len(order)),
                         id_col: pa.array([ids[i] for i in order]),
                         "rank": pa.array(np.arange(1, len(order) + 1), pa.int32()),
                         "cosine": pa.array([float(cos[i]) for i in order], pa.float64())})

    partials = partials.materialize()
    if partials.count() > driver_limit:
        return partials.groupby("query_id").map_groups(merge, batch_format="pyarrow")
    batches = [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
               for b in partials.iter_batches(batch_format="pyarrow")]
    sch = partials.schema(fetch_if_missing=False)
    # empty scan (no embeddings / no probed partitions): an empty dataset
    # may have no schema at all — fall back to the canonical output types
    qid_t = (sch.base_schema.field("query_id").type
             if sch is not None else pa.int64())
    id_t = (sch.base_schema.field(id_col).type
            if sch is not None else pa.int64())
    empty = pa.table({
        "query_id": pa.array([], qid_t),
        id_col: pa.array([], id_t),
        "rank": pa.array([], pa.int32()),
        "cosine": pa.array([], pa.float64())})
    if not batches:
        return ray.data.from_arrow(empty)
    tbl = pa.concat_tables(batches)
    groups: dict = {}
    for i, q in enumerate(tbl.column("query_id").to_pylist()):
        groups.setdefault(q, []).append(i)
    out = [merge(tbl.take(pa.array(groups[q], pa.int64())))
           for q in sorted(groups)]
    return ray.data.from_arrow(pa.concat_tables(out) if out else empty)


def brute_force_topk(emb: "ray.data.Dataset", query_vecs: np.ndarray,
                     query_ids, k: int, *, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     concurrency: int | tuple = 4) -> "ray.data.Dataset":
    """Exact cosine top-k per query.  Partial top-k per batch, final merge
    per query (groups are ≤ k × num_batches rows — tiny)."""
    q_ref = ray.put({"vecs": np.asarray(query_vecs, dtype=np.float64),
                     "ids": list(query_ids)})
    from ..stages.taskmode import stage_fn
    partials = emb.map_batches(
        stage_fn(_TopkStage, {"q_ref": q_ref, "k": k,
                              "id_col": id_col, "vec_col": vec_col}),
        batch_format="pyarrow")

    return _merge_topk_per_query(partials, k, id_col)


def _row_hash_from_vecs(V: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit hash per row from the vector CONTENTS (not the
    row position), so sampling is insensitive to input sort order."""
    from .dedup import _splitmix
    U = np.ascontiguousarray(V, dtype=np.float64).view(np.uint64)
    h = np.full(U.shape[0], np.uint64(0x9E3779B97F4A7C15))
    for j in range(U.shape[1]):
        h = _splitmix(h ^ U[:, j])
    return h


def train_centroids(emb: "ray.data.Dataset", n_centroids: int, *,
                    vec_col: str = "embedding", sample_rows: int = 2048,
                    iters: int = 10) -> np.ndarray:
    """Deterministic k-means on a driver-side sample (the IVF 'train' step —
    small by design; at 100 TB you train on a fixed-size sample the same
    way).

    The sample is CONTENT-HASHED, not ``limit()`` (VERDICT r3 #3): rows
    whose vector-content hash falls below a threshold sized from
    ``count()`` (parquet metadata — cheap) are kept distributed-side
    (expected ~4×sample_rows survivors reach the driver), then trimmed to
    the globally smallest ``sample_rows`` hashes — a uniform deterministic
    sample independent of block order and of how the table is sorted or
    clustered on disk."""
    n_total = max(1, emb.count())
    frac = min(1.0, (4.0 * sample_rows) / n_total)
    thresh = np.uint64(min(2**64 - 1, int(frac * float(2**64 - 1))))

    def local_sample(b: pa.Table) -> pa.Table:
        V = list_column_to_ndarray(b.column(vec_col))
        h = _row_hash_from_vecs(V)
        keep = np.flatnonzero(h <= thresh)
        return pa.table({
            "h": pa.array(h[keep].astype(np.int64)),
            vec_col: pa.array(list(np.asarray(V)[keep]),
                              pa.list_(pa.float64())),
        })

    parts = emb.map_batches(local_sample, batch_format="pyarrow").take_all()
    hs = np.array([r["h"] for r in parts], dtype=np.int64).astype(np.uint64)
    order = np.argsort(hs, kind="stable")[:sample_rows]
    X = _normalize(np.array([parts[i][vec_col] for i in order],
                            dtype=np.float64))
    rng = np.random.default_rng(42)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        S = X @ C.T
        assign = S.argmax(axis=1)
        for c in range(C.shape[0]):
            m = assign == c
            if m.any():
                v = X[m].mean(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    C[c] = v / nv
    return C


def build_ivf_index(emb: "ray.data.Dataset", n_centroids: int, index_dir: str,
                    *, vec_col: str = "embedding") -> np.ndarray:
    """One-time IVF build: assign every vector to its nearest centroid and
    shuffle-write a hive-partitioned parquet table (one directory per
    centroid_id).  Queries then PHYSICALLY prune the read to probed
    partitions — the scan is O(N · nprobe / C), not O(N).  Returns the
    centroid matrix (also saved next to the index for reuse)."""
    C = train_centroids(emb, n_centroids, vec_col=vec_col)
    c_ref = ray.put(C)

    def assign(b: pa.Table) -> pa.Table:
        V = _normalize(list_column_to_ndarray(b.column(vec_col)))
        cid = (V @ ray.get(c_ref).T).argmax(axis=1)
        return b.append_column("centroid_id", pa.array(cid.astype(np.int64)))

    emb.map_batches(assign, batch_format="pyarrow") \
       .write_parquet(index_dir, partition_cols=["centroid_id"])
    np.save(index_dir.rstrip("/") + ".centroids.npy", C)
    return C


def ivf_topk(emb: "ray.data.Dataset", query_vecs: np.ndarray, query_ids,
             k: int, *, n_centroids: int = 16, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             concurrency: int | tuple = 4,
             index_dir: str | None = None) -> "ray.data.Dataset":
    """IVF-bucketed approximate top-k: only vectors whose centroid is among
    each query's nprobe closest are scanned for that query.

    The pruning is physical: the vector table is bucketed once into
    hive-partitioned parquet (``build_ivf_index``) and the query pass reads
    ONLY the probed partitions (partition-filter pushdown).  Scanned-row
    count is logged so the prune factor is observable.  Pass ``index_dir``
    to reuse a prebuilt index across query batches (the 100 TB shape:
    build once, query many)."""
    import sys
    import tempfile

    if index_dir is None:
        # ad-hoc index; the returned Dataset reads from it lazily, so it
        # cannot be deleted here — it lives under /tmp for the session.
        # Pass index_dir explicitly to own (and reuse) the index.
        index_dir = tempfile.mkdtemp(prefix="ivf_index_")
        C = build_ivf_index(emb, n_centroids, index_dir, vec_col=vec_col)
    else:
        C = np.load(index_dir.rstrip("/") + ".centroids.npy")

    Qn = _normalize(np.asarray(query_vecs, dtype=np.float64))
    probe = np.argsort(-(Qn @ C.T), axis=1)[:, :nprobe]  # (q, nprobe)
    probed = [int(v) for v in np.unique(probe)]

    import pyarrow.dataset as pads
    filt = pads.field("centroid_id").isin(probed)
    # observable prune factor, from parquet metadata only (no data read)
    d = pads.dataset(index_dir, partitioning="hive")
    total = sum(f.count_rows() for f in d.get_fragments())
    scanned = sum(f.count_rows() for f in d.get_fragments(filt))
    print(f"[ivf_topk] scanning {scanned}/{total} rows "
          f"({len(probed)}/{C.shape[0]} partitions)", file=sys.stderr)

    # physical prune: list ONLY the probed partition directories — files in
    # unprobed buckets are never opened (path-level pushdown; Ray's filter=
    # can't see hive fields at sampling time)
    import os
    from ray.data.datasource.partitioning import Partitioning
    import glob
    probe_paths = [f for c in probed for f in
                   sorted(glob.glob(os.path.join(index_dir,
                                                 f"centroid_id={c}", "*.parquet")))]
    if not probe_paths:
        # every probed centroid partition is empty (k-means can yield empty
        # clusters) — read_parquet([]) raises, so short-circuit
        return ray.data.from_arrow(pa.table({
            "query_id": pa.array(list(query_ids)).take(pa.array([], pa.int64())),
            id_col: pa.array([], pa.int64()),
            "rank": pa.array([], pa.int32()),
            "cosine": pa.array([], pa.float64())}))
    pruned = ray.data.read_parquet(probe_paths,
                                   partitioning=Partitioning("hive", base_dir=index_dir))
    q_ref = ray.put({"vecs": Qn, "ids": list(query_ids), "probe": probe})

    # task mode (not an actor pool): the only state is the broadcast query
    # matrix, a zero-copy local object-store read per task — and a fused
    # ReadParquet->actor-pool stage can deadlock the streaming executor
    # when the pool consumes the whole CPU budget
    def ivf_scan(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        Q, q_ids, probe_q = q["vecs"], q["ids"], q["probe"]
        V = _normalize(list_column_to_ndarray(batch.column(vec_col)))
        # assignment comes from the stored partition column — computed
        # once at build time, never re-derived per batch
        assign = np.asarray(batch.column("centroid_id").cast(pa.int64()))
        qid_take, row_take, cos_parts = [], [], []
        for qi, qid in enumerate(q_ids):
            m = np.isin(assign, probe_q[qi])
            if not m.any():
                continue
            col = V[m] @ Q[qi]
            sub = np.nonzero(m)[0]
            kk = min(k, col.shape[0])
            part = np.argpartition(-col, kk - 1)[:kk] if kk < col.shape[0] else np.arange(col.shape[0])
            qid_take.append(np.full(part.size, qi, dtype=np.int64))
            row_take.append(sub[part])
            cos_parts.append(col[part])
        if not row_take:
            return pa.table({"query_id": pa.array([], pa.array(list(q_ids)).type),
                             id_col: batch.column(id_col).take(pa.array([], pa.int64())),
                             "cosine": pa.array([], pa.float64())})
        qidx = np.concatenate(qid_take)
        return pa.table({"query_id": pa.array(list(q_ids)).take(pa.array(qidx)),
                         id_col: batch.column(id_col).take(
                             pa.array(np.concatenate(row_take), pa.int64())),
                         "cosine": pa.array(np.concatenate(cos_parts), pa.float64())})

    partials = pruned.map_batches(ivf_scan, batch_format="pyarrow")
    return _merge_topk_per_query(partials, k, id_col)


def kmeans_assign(emb: "ray.data.Dataset", *, k: int = 4, iters: int = 3,
                  scale: int = 1 << 20, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> "ray.data.Dataset":
    """Distributed Lloyd k-means over an embedding column — the iterative-
    algorithm operator class, made ORACLE-EXACT by working in quantized
    integer arithmetic: coordinates are floor(x·2^20) int64 (no float
    accumulation order anywhere), distances are exact int64 sums (64 dims
    × (2·2^19)² < 2^47), centroid updates use TRUNCATING integer division
    (matches DuckDB's `//`; numpy's `//` floors — converted explicitly).
    Init = the k smallest ids' vectors; empty clusters keep their centroid.

    Scale shape: the quantized vectors materialize once; each iteration is
    ONE map_batches pass emitting ≤ k rows per block (per-cluster integer
    sum + count) whose merge is driver-side by BOUND (k × blocks ints, a
    cluster-size quantity, not a data quantity); centroids broadcast back
    via closure capture (k × dim ints).  The final pass emits assignments
    and exact squared distances.
    """
    def quantize(b: pa.Table) -> pa.Table:
        V = list_column_to_ndarray(b.column(vec_col)).astype(np.float64)
        Q = np.floor(V * float(scale)).astype(np.int64)
        return pa.table({id_col: b.column(id_col),
                         "q": pa.array(list(Q), pa.list_(pa.int64()))})

    qds = emb.map_batches(quantize, batch_format="pyarrow").materialize()

    # init = the k smallest ids' vectors WITHOUT a full sort: each block
    # keeps its k smallest (combiner), the driver merges ≤ k×blocks rows
    def _head_k(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column(id_col), np.int64)
        take = np.argsort(ids, kind="stable")[:k]
        return b.take(pa.array(take, pa.int64()))

    head = pa.concat_tables(list(
        qds.map_batches(_head_k, batch_format="pyarrow")
           .iter_batches(batch_format="pyarrow")))
    order = np.argsort(np.asarray(head.column(id_col), np.int64),
                       kind="stable")[:k]
    C = np.stack(head.take(pa.array(order, pa.int64()))
                 .column("q").to_numpy(zero_copy_only=False)).astype(np.int64)
    dim = C.shape[1]

    def _assign(Q: np.ndarray, cent: np.ndarray) -> np.ndarray:
        # exact int64 distances; argmin ties → smallest cluster index
        d2 = ((Q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        return d2, d2.argmin(axis=1)

    for _ in range(iters):
        cent = C.copy()

        def partial(b: pa.Table, cent=cent) -> pa.Table:
            Q = np.stack(b.column("q").to_numpy(zero_copy_only=False))
            _, cl = _assign(Q, cent)
            rows_c, rows_n, rows_s = [], [], []
            for c in np.unique(cl):
                sel = Q[cl == c]
                rows_c.append(int(c))
                rows_n.append(sel.shape[0])
                rows_s.append(sel.sum(axis=0, dtype=np.int64))
            return pa.table({
                "cluster": pa.array(rows_c, pa.int64()),
                "n": pa.array(rows_n, pa.int64()),
                "s": pa.array([list(map(int, s)) for s in rows_s],
                              pa.list_(pa.int64()))})

        # ≤ k×blocks rows reach the driver — bounded by cluster size
        parts = pa.concat_tables(list(
            qds.map_batches(partial, batch_format="pyarrow")
               .iter_batches(batch_format="pyarrow")))
        cl_ids = np.asarray(parts.column("cluster"), np.int64)
        ns = np.asarray(parts.column("n"), np.int64)
        ss = np.stack(parts.column("s").to_numpy(zero_copy_only=False))
        newC = C.copy()
        for c in range(k):
            m = cl_ids == c
            if m.any():
                n = ns[m].sum()
                s = ss[m].sum(axis=0)
                # TRUNCATING division — DuckDB `//`; numpy floors
                newC[c] = np.sign(s) * (np.abs(s) // n)
        C = newC

    cent = C

    def final(b: pa.Table, cent=cent) -> pa.Table:
        Q = np.stack(b.column("q").to_numpy(zero_copy_only=False))
        d2, cl = _assign(Q, cent)
        return pa.table({id_col: b.column(id_col),
                         "cluster": pa.array(cl.astype(np.int64)),
                         "dist2": pa.array(
                             d2[np.arange(len(cl)), cl].astype(np.int64))})

    return qds.map_batches(final, batch_format="pyarrow")


def covariance(emb: "ray.data.Dataset", *, dim: int = 64,
               scale: int = 1 << 20,
               vec_col: str = "embedding") -> "ray.data.Dataset":
    """Exact distributed covariance moments over an embedding column —
    the PCA/whitening prep pass of embedding pipelines, oracle-EXACT via
    quantized int64 second moments (same floor(x·2^20) convention as
    ``kmeans_assign``).

    Scale shape: one map_batches pass emits per-block COMBINED partials —
    the dim×dim upper triangle of QᵀQ (integer matmul) plus per-dim sums
    and counts, ≤ dim·(dim+3)/2 rows per block REGARDLESS of block row
    count — then a measured-size ``grouped_agg`` merge.  The final table
    is bounded by dim² (2 080 rows at dim 64), so the finish stage is
    driver-safe at any input scale; the n·Sxy − Sx·Sy numerator exceeds
    int64 there and is computed in Python big-int (DuckDB replays it in
    HUGEINT).  Partial Sxy magnitude: (2^20)² per element × rows — int64-
    safe to ~8e6 rows per BLOCK and ~8e6 total per (d1,d2) cell at unit-
    normalized inputs; larger corpora should drop ``scale`` a few bits."""
    from .shuffle_utils import grouped_agg

    def partial(b: pa.Table) -> pa.Table:
        V = list_column_to_ndarray(b.column(vec_col)).astype(np.float64)
        Q = np.floor(V * float(scale)).astype(np.int64)
        n = Q.shape[0]
        P = Q.T @ Q                                   # (dim, dim) int64
        iu, ju = np.triu_indices(dim)
        s = Q.sum(axis=0)
        d = np.arange(dim, dtype=np.int64)
        return pa.table({
            "d1": pa.array(np.concatenate([iu.astype(np.int64), d])),
            "d2": pa.array(np.concatenate([ju.astype(np.int64),
                                           np.full(dim, -1, np.int64)])),
            "sxy": pa.array(np.concatenate([P[iu, ju],
                                            np.zeros(dim, np.int64)])),
            "s": pa.array(np.concatenate([np.zeros(iu.size, np.int64), s])),
            "n": pa.array(np.concatenate([np.zeros(iu.size, np.int64),
                                          np.full(dim, n, np.int64)])),
        })

    agg = grouped_agg(emb.map_batches(partial, batch_format="pyarrow"),
                      ["d1", "d2"],
                      [("sxy", "sum"), ("s", "sum"), ("n", "sum")])
    if not isinstance(agg, pa.Table):
        # ≤ dim·(dim+3)/2 final rows by construction — bounded take
        agg = pa.concat_tables(
            t if isinstance(t, pa.Table) else pa.Table.from_batches([t])
            for t in agg.iter_batches(batch_format="pyarrow"))

    d1 = np.asarray(agg.column("d1"), np.int64)
    d2 = np.asarray(agg.column("d2"), np.int64)
    is_dim = d2 == -1
    sums = {int(a): int(b) for a, b in
            zip(d1[is_dim], np.asarray(agg.column("s"), np.int64)[is_dim])}
    ns = {int(a): int(b) for a, b in
          zip(d1[is_dim], np.asarray(agg.column("n"), np.int64)[is_dim])}
    pr = agg.filter(pa.array(~is_dim))
    p1 = np.asarray(pr.column("d1"), np.int64)
    p2 = np.asarray(pr.column("d2"), np.int64)
    sxy = np.asarray(pr.column("sxy"), np.int64)
    rows = {"d1": [], "d2": [], "n": [], "sx_q": [], "sy_q": [],
            "sxy_q": [], "cov": []}
    for a, b2, xy in zip(p1.tolist(), p2.tolist(), sxy.tolist()):
        n = ns.get(a, 0)
        sx, sy = sums.get(a, 0), sums.get(b2, 0)
        num = n * xy - sx * sy                        # Python big-int
        den = float(n) * float(n) * float(scale) * float(scale)
        rows["d1"].append(a)
        rows["d2"].append(b2)
        rows["n"].append(n)
        rows["sx_q"].append(sx)
        rows["sy_q"].append(sy)
        rows["sxy_q"].append(xy)
        rows["cov"].append(float(num) / den if n > 0 else 0.0)
    import ray.data as _rd
    return _rd.from_arrow(pa.table({
        "d1": pa.array(rows["d1"], pa.int64()),
        "d2": pa.array(rows["d2"], pa.int64()),
        "n": pa.array(rows["n"], pa.int64()),
        "sx_q": pa.array(rows["sx_q"], pa.int64()),
        "sy_q": pa.array(rows["sy_q"], pa.int64()),
        "sxy_q": pa.array(rows["sxy_q"], pa.int64()),
        "cov": pa.array(rows["cov"], pa.float64())}))


def pca_top_component(emb: "ray.data.Dataset", *, dim: int = 64,
                      scale: int = 1 << 20, iters: int = 4,
                      vec_col: str = "embedding") -> "pa.Table":
    """Top principal component via EXACT integer power iteration — the
    iterative-linear-algebra operator class (PCA step of embedding
    whitening / spectral dedup pipelines).

    Distributed part: the ``covariance`` moment pass (per-block integer
    QᵀQ combiners, ≤ dim² merged rows at any input scale).  The power
    iteration itself runs on the driver over the dim×dim matrix in
    arbitrary-precision Python ints (a few thousand multiplies), with a
    DuckDB HUGEINT unrolled-CTE replay: M[d,e] = n·Sxy − Sx·Sy, v₀ = 1,
    then per round y = M·v and v' = sign(y)·((|y|·2^20) // max|y|) — the
    abs-first formulation makes Python floor-division and DuckDB's
    truncating ``//`` agree on negatives (CLAUDE.md parity rule).
    Output is exact int64 loadings (hash-stable) plus their floats."""
    cov = covariance(emb, dim=dim, scale=scale, vec_col=vec_col)
    tbl = pa.concat_tables(
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in cov.iter_batches(batch_format="pyarrow"))  # ≤ dim² rows
    d1 = np.asarray(tbl.column("d1"), np.int64)
    d2 = np.asarray(tbl.column("d2"), np.int64)
    n = np.asarray(tbl.column("n"), np.int64)
    sx = np.asarray(tbl.column("sx_q"), np.int64)
    sy = np.asarray(tbl.column("sy_q"), np.int64)
    sxy = np.asarray(tbl.column("sxy_q"), np.int64)
    M = [[0] * dim for _ in range(dim)]
    for a, b, nn, x, y, p in zip(d1, d2, n, sx, sy, sxy):
        val = int(nn) * int(p) - int(x) * int(y)   # exact big-int
        M[int(a)][int(b)] = val
        M[int(b)][int(a)] = val
    v = [1] * dim
    one = int(scale)
    for _ in range(iters):
        yv = [sum(M[d][e] * v[e] for e in range(dim)) for d in range(dim)]
        m = max(max(abs(x) for x in yv), 1)
        v = [(-((-x * one) // m) if x < 0 else (x * one) // m) for x in yv]
    return pa.table({"d": pa.array(np.arange(dim, dtype=np.int64)),
                     "v_q": pa.array([int(x) for x in v], pa.int64()),
                     "loading": pa.array([x / one for x in v],
                                         pa.float64())})
