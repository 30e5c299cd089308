"""exact_quantiles: rank-based selection must equal the sorted-array
order statistic on every distribution shape the histogram refinement has
to survive — duplicates, heavy skew, huge dynamic range (multi-round
refinement), tiny domains (single-value collapse), negatives."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.pipelines.quantile import exact_quantiles


def _check(ray, vals: np.ndarray, pcts=(25, 50, 75, 90, 100)):
    import ray.data
    tbl = pa.table({"v": pa.array(vals.astype(np.int64))})
    ds = ray.data.from_arrow(tbl).repartition(5)
    out = exact_quantiles(ds, "v", list(pcts), collect_cap=64)
    s = np.sort(vals.astype(np.int64))
    n = s.size
    got = dict(zip(out.column("q_pct").to_pylist(),
                   out.column("value_q").to_pylist()))
    for p in pcts:
        k = (n * p + 99) // 100
        assert got[p] == int(s[k - 1]), (p, got[p], int(s[k - 1]))
    assert out.column("n").to_pylist() == [n] * len(pcts)


def test_uniform(ray_session):
    rng = np.random.default_rng(7)
    _check(ray_session, rng.integers(-1000, 1000, size=5000))


def test_duplicate_heavy(ray_session):
    rng = np.random.default_rng(8)
    _check(ray_session, rng.integers(0, 5, size=3000))


def test_huge_range_multi_round(ray_session):
    rng = np.random.default_rng(9)
    v = rng.integers(-(2 ** 62), 2 ** 62, size=4000)
    v[::7] = 3  # a heavy point mass far from the spread
    _check(ray_session, v)


def test_skewed_power_law(ray_session):
    rng = np.random.default_rng(10)
    v = (10.0 ** rng.uniform(0, 12, size=4000)).astype(np.int64)
    _check(ray_session, v)


def test_single_value(ray_session):
    _check(ray_session, np.full(100, 42))


def test_empty(ray_session):
    import ray.data
    ds = ray.data.from_arrow(pa.table({"v": pa.array([], pa.int64())}))
    out = exact_quantiles(ds, "v", [50])
    assert out.num_rows == 0
