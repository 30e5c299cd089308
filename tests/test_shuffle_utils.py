"""Path-parity pins for the measured-size merge helpers: every helper has
a driver-side fast path (small measured volume) and a distributed path
(above the limit).  Small-scale queries exercise only the driver path, so
these tests force BOTH via ``driver_limit`` and assert identical results —
the guarantee the 100 TB shape rests on."""

import numpy as np
import pyarrow as pa
import pytest


def _rows(ds_or_tbl):
    import ray.data
    if isinstance(ds_or_tbl, ray.data.Dataset):
        t = pa.concat_tables(
            [b for b in ds_or_tbl.iter_batches(batch_format="pyarrow")]
        ) if ds_or_tbl.count() else None
        if t is None:
            return []
    else:
        t = ds_or_tbl
    cols = sorted(t.column_names)
    return sorted(tuple(str(t.column(c)[i].as_py()) for c in cols)
                  for i in range(t.num_rows))


def test_grouped_map_groups_paths_agree(ray_session):
    import ray.data

    from gdal_ray.pipelines.shuffle_utils import grouped_map_groups

    rng = np.random.default_rng(7)
    keys = rng.integers(0, 37, 5000).astype(np.int64)
    vals = rng.integers(0, 1000, 5000).astype(np.int64)
    tbl = pa.table({"k": pa.array(keys), "v": pa.array(vals)})

    def per_group(g: pa.Table) -> pa.Table:
        v = np.sort(np.asarray(g.column("v"), np.int64))
        k = g.column("k")[0].as_py()
        return pa.table({"k": pa.array([k], pa.int64()),
                         "n": pa.array([len(v)], pa.int64()),
                         "lo": pa.array([int(v[0])], pa.int64()),
                         "hi": pa.array([int(v[-1])], pa.int64()),
                         "sum": pa.array([int(v.sum())], pa.int64())})

    def run(limit):
        ds = ray.data.from_arrow(tbl).repartition(8)
        return _rows(grouped_map_groups(ds, "k", per_group,
                                        driver_limit=limit))

    assert run(10_000_000) == run(0)           # driver == distributed
    # empty input keeps a usable (empty) result on the driver path
    empty = ray.data.from_arrow(tbl.slice(0, 0))
    from gdal_ray.pipelines.shuffle_utils import grouped_map_groups as G
    assert _rows(G(empty, "k", per_group)) == []


def test_grouped_agg_paths_agree(ray_session):
    import ray.data

    from gdal_ray.pipelines.shuffle_utils import grouped_agg

    rng = np.random.default_rng(11)
    tbl = pa.table({
        "g": pa.array(rng.integers(0, 9, 4000).astype(np.int64)),
        "s": pa.array(rng.integers(-50, 50, 4000).astype(np.int64)),
        "m": pa.array(rng.integers(0, 10**6, 4000).astype(np.int64)),
    })

    def run(limit):
        ds = ray.data.from_arrow(tbl).repartition(8)
        return _rows(grouped_agg(ds, ["g"],
                                 [("s", "sum"), ("m", "min")],
                                 driver_limit=limit))

    assert run(10_000_000) == run(0)


def test_merge_topk_paths_agree(ray_session):
    import ray.data

    from gdal_ray.pipelines.ann import _merge_topk_per_query

    rng = np.random.default_rng(3)
    n = 3000
    tbl = pa.table({
        "query_id": pa.array(rng.integers(0, 5, n).astype(np.int64)),
        "vec_id": pa.array(rng.permutation(n).astype(np.int64)),
        "cosine": pa.array(np.round(rng.random(n), 6)),
    })

    def run(limit):
        ds = ray.data.from_arrow(tbl).repartition(6)
        return _rows(_merge_topk_per_query(ds, 7, "vec_id",
                                           driver_limit=limit))

    assert run(10_000_000) == run(0)
    # schema-less empty partials survive (falls back to canonical types)
    empty = ray.data.from_arrow(tbl.slice(0, 0))
    out = _merge_topk_per_query(empty, 7, "vec_id")
    assert out.count() == 0
