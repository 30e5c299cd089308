"""HyperLogLog sketch: exact register semantics, partitioning invariance
(mergeability), and estimate accuracy against known distinct counts."""

import numpy as np
import pyarrow as pa


def _regs(ds_out):
    return sorted((r["register"], r["rho"]) for r in ds_out.take_all())


def test_hll_registers_partition_invariant(ray_session):
    import ray.data

    from gdal_ray.pipelines.sketches import hll_registers

    rng = np.random.default_rng(5)
    vals = rng.integers(0, 5000, 20000).astype(np.int64)
    tbl = pa.table({"v": pa.array(vals)})
    outs = []
    for parts in (1, 3, 16):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        outs.append(_regs(hll_registers(ds, "v", b=8)))
    assert outs[0] == outs[1] == outs[2]       # mergeable: order/blocking-free
    # duplicates are idempotent: distinct-only input gives the same sketch
    ds_d = ray.data.from_arrow(pa.table({"v": pa.array(
        np.unique(vals))}))
    assert _regs(hll_registers(ds_d, "v", b=8)) == outs[0]


def test_hll_estimate_accuracy(ray_session):
    import ray.data

    from gdal_ray.pipelines.sketches import hll_estimate

    rng = np.random.default_rng(9)
    for n_distinct, tol in ((80, 0.05), (5000, 0.10), (60000, 0.10)):
        vals = rng.integers(0, n_distinct, n_distinct * 3).astype(np.int64)
        exact = len(np.unique(vals))
        ds = ray.data.from_arrow(pa.table({"v": pa.array(vals)})) \
            .repartition(4)
        est = hll_estimate(ds, "v", b=10)
        assert abs(est - exact) / exact < tol, (n_distinct, est, exact)


def test_hll_bitlen_exact_near_powers():
    from gdal_ray.pipelines.sketches import _bitlen_u64

    # float log2/frexp round these; the shift reduction must not
    vals = []
    for k in (1, 2, 31, 52, 53, 54, 63):
        vals += [(1 << k) - 1, 1 << k, (1 << k) + 1]
    vals.append(0)
    arr = np.array(vals, np.uint64)
    got = _bitlen_u64(arr)
    exp = np.array([int(v).bit_length() for v in vals], np.int64)
    assert np.array_equal(got, exp)


def test_bloom_semi_join_no_false_negatives(ray_session):
    import ray.data

    from gdal_ray.pipelines.sketches import bloom_bits, bloom_semi_join

    rng = np.random.default_rng(4)
    build_keys = rng.choice(100_000, 3000, replace=False).astype(np.int64)
    build = ray.data.from_arrow(pa.table({"k": pa.array(build_keys)}))
    probe_keys = rng.integers(0, 100_000, 20_000).astype(np.int64)
    probe = ray.data.from_arrow(pa.table({
        "k": pa.array(probe_keys),
        "i": pa.array(np.arange(20_000))})).repartition(4)
    kept = set(r["i"] for r in bloom_semi_join(
        probe, build, probe_col="k", build_col="k").take_all())
    bset = set(int(x) for x in build_keys)
    exact = set(i for i, kk in enumerate(probe_keys) if int(kk) in bset)
    assert exact <= kept                       # NO false negatives, ever
    fp = (len(kept) - len(exact)) / max(len(probe_keys) - len(exact), 1)
    assert fp < 0.01                           # (1-e^(-kn/m))^k ~ 4e-6 here
    # bit table is partition-invariant (mergeable build side)
    a = sorted(r["bit"] for r in bloom_bits(build, "k").take_all())
    b = sorted(r["bit"] for r in
               bloom_bits(build.repartition(7), "k").take_all())
    assert a == b


def test_countmin_never_underestimates(ray_session):
    import ray.data

    from gdal_ray.pipelines.sketches import (countmin_counters,
                                             countmin_estimate)

    rng = np.random.default_rng(6)
    # skewed: a few heavy hitters over a long tail
    keys = np.concatenate([
        np.repeat(np.array([7, 13, 42], np.int64), 2000),
        rng.integers(100, 50_000, 30_000).astype(np.int64)])
    rng.shuffle(keys)
    ds = ray.data.from_arrow(pa.table({"k": pa.array(keys)})).repartition(6)
    counters = countmin_counters(ds, "k")
    uniq, true = np.unique(keys, return_counts=True)
    est = countmin_estimate(counters, uniq)
    assert (est >= true).all()                 # CM invariant
    # heavy hitters: overestimate bounded by the collision mass
    # (eps*N = 2N/w ~ 4.4 expected here; allow a small multiple)
    for hh in (7, 13, 42):
        i = np.searchsorted(uniq, hh)
        assert 0 <= est[i] - true[i] <= 20, (hh, est[i], true[i])
    # mergeable: counters are partition-invariant
    def rows(d):
        return sorted((r["row"], r["bucket"], r["n"]) for r in d.take_all())
    assert rows(counters) == rows(countmin_counters(
        ds.repartition(13), "k"))


def test_top_tokens_paths_agree(ray_session):
    import functools

    import ray.data

    import gdal_ray.pipelines.shuffle_utils as SU
    from gdal_ray.pipelines.text import top_tokens

    rng = np.random.default_rng(2)
    vocab = np.array([f"tok{i}" for i in range(200)], dtype=object)
    docs = [" ".join(vocab[rng.integers(0, 200, 40)]) for _ in range(400)]
    tbl = pa.table({"text": pa.array(docs)})
    ds = ray.data.from_arrow(tbl).repartition(6)
    a = top_tokens(ds, k=10)
    # force the distributed merge branch via a tiny driver limit
    real = SU.grouped_agg
    try:
        SU.grouped_agg = functools.partial(real, driver_limit=0)
        b = top_tokens(ray.data.from_arrow(tbl).repartition(6), k=10)
    finally:
        SU.grouped_agg = real
    assert a.to_pydict() == b.to_pydict()
    # brute-force oracle
    from collections import Counter
    cnt = Counter(t for d in docs for t in d.split())
    exp = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = list(zip(a.column("token").to_pylist(), a.column("n").to_pylist()))
    assert got == [(t, c) for t, c in exp]
