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


def _normalize(V: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(V, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return V / n


class _TopkStage:
    """Per-batch partial top-k: (batch vectors) @ (broadcast queries)."""

    def __init__(self, q_ref, k: int, id_col: str, vec_col: str):
        q = ray.get(q_ref) if isinstance(q_ref, ray.ObjectRef) else q_ref
        self.Q = _normalize(np.asarray(q["vecs"], dtype=np.float64))
        self.q_ids = list(q["ids"])
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        V = _normalize(np.array(batch.column(self.vec_col).to_pylist(), dtype=np.float64))
        ids = batch.column(self.id_col).to_pylist()
        S = V @ self.Q.T  # (n, q)
        k = min(self.k, S.shape[0])
        out = {"query_id": [], self.id_col: [], "cosine": []}
        for qi, qid in enumerate(self.q_ids):
            col = S[:, qi]
            if k < col.shape[0]:
                part = np.argpartition(-col, k - 1)[:k]
            else:
                part = np.arange(col.shape[0])
            for j in part:
                out["query_id"].append(qid)
                out[self.id_col].append(ids[j])
                out["cosine"].append(float(col[j]))
        return pa.table({"query_id": pa.array(out["query_id"]),
                         self.id_col: pa.array(out[self.id_col]),
                         "cosine": pa.array(out["cosine"], pa.float64())})


def brute_force_topk(emb: "ray.data.Dataset", query_vecs: np.ndarray,
                     query_ids, k: int, *, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     concurrency: int | tuple = 4) -> "ray.data.Dataset":
    """Exact cosine top-k per query.  Partial top-k per batch, final merge
    per query (groups are ≤ k × num_batches rows — tiny)."""
    q_ref = ray.put({"vecs": np.asarray(query_vecs, dtype=np.float64),
                     "ids": list(query_ids)})
    partials = emb.map_batches(
        _TopkStage, fn_constructor_kwargs={"q_ref": q_ref, "k": k,
                                           "id_col": id_col, "vec_col": vec_col},
        batch_format="pyarrow", concurrency=concurrency)

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

    return partials.groupby("query_id").map_groups(merge, batch_format="pyarrow")


def train_centroids(emb: "ray.data.Dataset", n_centroids: int, *,
                    vec_col: str = "embedding", sample_rows: int = 2048,
                    iters: int = 10) -> np.ndarray:
    """Deterministic k-means on a driver-side sample (the IVF 'train' step —
    small by design; at 100 TB you train on a fixed-size sample the same
    way)."""
    sample = emb.limit(sample_rows).take_all()
    X = _normalize(np.array([r[vec_col] for r in sample], dtype=np.float64))
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


def ivf_topk(emb: "ray.data.Dataset", query_vecs: np.ndarray, query_ids,
             k: int, *, n_centroids: int = 16, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             concurrency: int | tuple = 4) -> "ray.data.Dataset":
    """IVF-bucketed approximate top-k: only vectors whose centroid is among
    each query's nprobe closest are scanned for that query."""
    C = train_centroids(emb, n_centroids, vec_col=vec_col)
    Qn = _normalize(np.asarray(query_vecs, dtype=np.float64))
    probe = np.argsort(-(Qn @ C.T), axis=1)[:, :nprobe]  # (q, nprobe)
    q_ref = ray.put({"vecs": Qn, "ids": list(query_ids), "C": C, "probe": probe})

    class IvfStage:
        def __init__(self):
            q = ray.get(q_ref)
            self.Q = q["vecs"]; self.q_ids = q["ids"]
            self.C = q["C"]; self.probe = q["probe"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            V = _normalize(np.array(batch.column(vec_col).to_pylist(), dtype=np.float64))
            ids = batch.column(id_col).to_pylist()
            assign = (V @ self.C.T).argmax(axis=1)
            out = {"query_id": [], id_col: [], "cosine": []}
            for qi, qid in enumerate(self.q_ids):
                m = np.isin(assign, self.probe[qi])
                if not m.any():
                    continue
                col = V[m] @ self.Q[qi]
                sub = np.nonzero(m)[0]
                kk = min(k, col.shape[0])
                part = np.argpartition(-col, kk - 1)[:kk] if kk < col.shape[0] else np.arange(col.shape[0])
                for j in part:
                    out["query_id"].append(qid)
                    out[id_col].append(ids[sub[j]])
                    out["cosine"].append(float(col[j]))
            return pa.table({"query_id": pa.array(out["query_id"]),
                             id_col: pa.array(out[id_col]),
                             "cosine": pa.array(out["cosine"], pa.float64())})

    partials = emb.map_batches(IvfStage, batch_format="pyarrow", concurrency=concurrency)

    def merge(g: pa.Table) -> pa.Table:
        cos = np.asarray(g.column("cosine"), dtype=np.float64)
        ids = g.column(id_col).to_pylist()
        order = sorted(range(len(ids)), key=lambda i: (-cos[i], ids[i]))[:k]
        qid = g.column("query_id")[0].as_py()
        return pa.table({"query_id": pa.array([qid] * len(order)),
                         id_col: pa.array([ids[i] for i in order]),
                         "rank": pa.array(np.arange(1, len(order) + 1), pa.int32()),
                         "cosine": pa.array([float(cos[i]) for i in order], pa.float64())})

    return partials.groupby("query_id").map_groups(merge, batch_format="pyarrow")
