"""TPC-H-shape unit pins (the full oracle parity runs in
test_oracle_parity.py; these pin the tricky kernels and the read-layer
regression directly)."""

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def test_q21_resolve_matches_bruteforce():
    """Vectorized per-order reduceat resolve == per-order Python scan."""
    from gdal_ray.pipelines.tpch import q21_waiting_suppliers  # noqa: F401
    # re-create the kernel body on a synthetic flag table
    rng = np.random.RandomState(7)
    n = 500
    okey = rng.randint(0, 80, n).astype(np.int64)
    sk = rng.randint(0, 12, n).astype(np.int64)
    # distinct (okey, sk)
    key = okey * 1000 + sk
    _, idx = np.unique(key, return_index=True)
    okey, sk = okey[idx], sk[idx]
    late = rng.randint(0, 2, okey.size).astype(np.int64)

    t = pa.table({"okey": pa.array(okey), "sk": pa.array(sk),
                  "late": pa.array(late)})

    # the same segment logic as tpch.q21's resolve
    order = np.argsort(okey, kind="stable")
    ok2, sk2, lt2 = okey[order], sk[order], late[order]
    uniq, start = np.unique(ok2, return_index=True)
    nsupp = np.diff(np.append(start, ok2.size))
    nlate = np.add.reduceat(lt2, start)
    seg = np.repeat(np.arange(uniq.size), nsupp)
    keep = (lt2 == 1) & (nsupp[seg] >= 2) & (nlate[seg] == 1)
    got = sorted(zip(ok2[keep].tolist(), sk2[keep].tolist()))

    expect = []
    for o in np.unique(okey):
        m = okey == o
        if m.sum() >= 2 and late[m].sum() == 1:
            s = sk[m][late[m] == 1][0]
            expect.append((int(o), int(s)))
    assert got == sorted(expect)


@pytest.mark.usefixtures("ray_session")
def test_read_small_file_no_schemaless_blocks():
    """Regression: tiny parquet reads must not over-fan into empty read
    tasks — a 0-row block that passes through map_batches loses its
    schema and poisons hash-join schema broadcast ('No match for key
    field on right side')."""
    import ray
    from gdal_ray.pipelines.relational import _read

    ds = _read(SF, "supplier", ["s_suppkey", "s_nationkey"])
    m = ds.map_batches(
        lambda b: pa.table({"s_suppkey": b.column("s_suppkey")}).filter(
            pa.array(np.asarray(b.column("s_nationkey"), np.int64) == 3)),
        batch_format="pyarrow").materialize()
    for bundle in m.iter_internal_ref_bundles():
        for ref, _ in bundle.blocks:
            blk = ray.get(ref)
            assert blk.schema.names == ["s_suppkey"], blk.schema


@pytest.mark.usefixtures("ray_session")
def test_filtered_tiny_side_join_survives():
    """The exact failing shape from the q2/q7 build: a dimension side
    filtered to ~2 rows joined at a partition count larger than the key
    count."""
    from gdal_ray.pipelines.relational import _read, _join_partitions

    supp = _read(SF, "supplier", ["s_suppkey", "s_nationkey"]) \
        .map_batches(lambda b: pa.table(
            {"s_suppkey": b.column("s_suppkey")}).filter(
                pa.array(np.isin(np.asarray(b.column("s_nationkey"),
                                            np.int64), [3, 8]))),
            batch_format="pyarrow")
    li = _read(SF, "lineitem", ["l_orderkey", "l_suppkey"])
    j = li.join(supp, join_type="inner",
                num_partitions=max(4, _join_partitions()),
                on=("l_suppkey",), right_on=("s_suppkey",))
    assert j.count() > 0
