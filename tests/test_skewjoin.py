"""skew_hybrid_join: the hybrid plan must be INVISIBLE semantically —
identical rows to a plain hash join whatever the threshold, the broadcast
budget, or duplicate build keys do to the plan shape."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gdal_ray.pipelines.skewjoin import skew_hybrid_join


def _mk(ray, seed=11, n=20_000, nkeys=200, hot_frac=0.3):
    import ray.data
    rng = np.random.default_rng(seed)
    k = rng.integers(0, nkeys, size=n).astype(np.int64)
    k[rng.random(n) < hot_frac] = 5
    v = rng.integers(0, 100, size=n).astype(np.int64)
    big = ray.data.from_arrow(pa.table({"k": k, "v": v})).repartition(6)
    bk = np.concatenate([np.arange(nkeys, dtype=np.int64), [7, 5]])
    attr = bk * 10 + 1
    small = ray.data.from_arrow(
        pa.table({"bk": bk, "attr": attr})).repartition(2)
    exp = pd.DataFrame({"k": k, "v": v}).merge(
        pd.DataFrame({"bk": bk, "attr": attr}),
        left_on="k", right_on="bk").drop(columns="bk")
    return big, small, exp


def _canon(df):
    return df[["k", "v", "attr"]].sort_values(["k", "v", "attr"]) \
        .reset_index(drop=True)


@pytest.mark.parametrize("hot_den,max_rows", [
    (10, 1_000_000),   # hot branch active (keys 5 qualifies)
    (10 ** 9, 1_000_000),  # nothing hot → pure hash-join fallback
    (10, 1),           # budget of 1 row demotes every hot key → fallback
    (2, 1_000_000),    # 50% threshold: not even key 5 qualifies
])
def test_hybrid_equals_plain(ray_session, hot_den, max_rows):
    big, small, exp = _mk(ray_session)
    out = skew_hybrid_join(big, small, "k", "bk",
                           hot_num=1, hot_den=hot_den,
                           max_broadcast_rows=max_rows)
    got = out.to_pandas()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp),
                                  check_dtype=False)


def test_duplicate_build_keys_replicate(ray_session):
    # key 5 (hot) and key 7 (cold) both appear twice on the build side;
    # every probe row of those keys must emit two output rows
    big, small, exp = _mk(ray_session)
    out = skew_hybrid_join(big, small, "k", "bk", hot_num=1, hot_den=10)
    got = out.to_pandas()
    for key in (5, 7):
        n_probe = int((np.asarray(exp["k"]) == key).sum())
        assert (got["k"] == key).sum() == n_probe
    pd.testing.assert_frame_equal(_canon(got), _canon(exp),
                                  check_dtype=False)


def test_no_match_hot_key(ray_session):
    # a hot probe key absent from the build side must vanish, not crash
    import ray.data
    k = np.zeros(5000, np.int64)
    k[:100] = np.arange(100)
    big = ray.data.from_arrow(pa.table(
        {"k": k, "v": np.ones(5000, np.int64)})).repartition(4)
    small = ray.data.from_arrow(pa.table(
        {"bk": np.arange(1, 100, dtype=np.int64),
         "attr": np.arange(1, 100, dtype=np.int64) * 2}))
    out = skew_hybrid_join(big, small, "k", "bk", hot_num=1, hot_den=10)
    got = out.to_pandas()
    assert (got["k"] == 0).sum() == 0
    assert len(got) == 99
