"""As-of join + interval join: brute-force oracles and partitioning
invariance (the shuffle-shape guarantees)."""

import numpy as np
import pyarrow as pa


def _pairs(ds):
    return sorted((r["lid"], r["rid2"], r["gap"]) for r in ds.take_all())


def test_asof_join_matches_brute_force(ray_session):
    import ray.data

    from gdal_ray.pipelines.asof import asof_join

    rng = np.random.default_rng(8)
    nl, nr = 800, 300
    lt = pa.table({"lid": pa.array(np.arange(nl, dtype=np.int64)),
                   "u": pa.array(rng.integers(0, 40, nl).astype(np.int64)),
                   "t": pa.array(rng.integers(0, 10_000, nl).astype(np.int64))})
    rt = pa.table({"rid2": pa.array(np.arange(nr, dtype=np.int64)),
                   "u": pa.array(rng.integers(0, 40, nr).astype(np.int64)),
                   "t": pa.array(rng.integers(0, 10_000, nr).astype(np.int64))})

    def run(lparts, rparts):
        l = ray.data.from_arrow(lt).repartition(lparts)
        r = ray.data.from_arrow(rt).repartition(rparts)
        return _pairs(asof_join(l, r, by="u", on="t",
                                left_id="lid", right_id="rid2"))

    got = run(5, 3)
    assert got == run(1, 1)                    # partitioning-invariant
    # brute force: most recent right with t<=lt, ties to largest rid
    ru, rts, rid = (np.asarray(rt.column(c)) for c in ("u", "t", "rid2"))
    exp = []
    for i in range(nl):
        u, t = int(lt.column("u")[i].as_py()), int(lt.column("t")[i].as_py())
        cand = [(int(rts[j]), int(rid[j])) for j in range(nr)
                if int(ru[j]) == u and int(rts[j]) <= t]
        if cand:
            bt, bid = max(cand)
            exp.append((i, bid, t - bt))
    assert got == sorted(exp)


def test_interval_join_overlapping_bands(ray_session):
    import ray.data

    from gdal_ray.pipelines.asof import interval_join_broadcast

    rng = np.random.default_rng(3)
    v = rng.uniform(0, 100, 2000)
    pts = pa.table({"i": pa.array(np.arange(2000, dtype=np.int64)),
                    "v": pa.array(v)})
    bands = pa.table({"lo": pa.array([0.0, 20.0, 50.0, 45.0]),
                      "hi": pa.array([30.0, 60.0, 90.0, 55.0]),
                      "band": pa.array(np.arange(4, dtype=np.int64))})
    out = interval_join_broadcast(
        ray.data.from_arrow(pts).repartition(4), bands, value_col="v")
    got = sorted((r["i"], r["band"]) for r in out.take_all())
    exp = sorted((i, b) for i in range(2000) for b in range(4)
                 if bands.column("lo")[b].as_py() <= v[i]
                 < bands.column("hi")[b].as_py())
    assert got == exp                          # overlaps produce multi-match
