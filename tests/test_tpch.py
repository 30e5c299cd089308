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


@pytest.mark.usefixtures("ray_session")
def test_segment_dedup_path_parity():
    """distributed branch (driver_limit=0) == driver branch (default)."""
    from gdal_ray.pipelines.relational import _read
    from gdal_ray.pipelines.text import segment_dedup

    docs = _read(SF, "documents", ["doc_id", "text"]).limit(120)
    a = segment_dedup(docs, seg_words=10).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = segment_dedup(docs, seg_words=10, driver_limit=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
def test_span_dedup_path_parity():
    from gdal_ray.pipelines.relational import _read
    from gdal_ray.pipelines.dedup import span_dedup

    docs = _read(SF, "documents", ["doc_id", "text"]).limit(120)
    a = span_dedup(docs, k=5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = span_dedup(docs, k=5, driver_limit=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(a, b)


def test_span_dedup_bruteforce_semantics():
    """span_dedup == a direct per-corpus reference implementation."""
    import ray.data as rd
    from gdal_ray.pipelines.dedup import span_dedup

    texts = {
        1: "a b c d e f g h",
        2: "x a b c d e y z",          # contains doc1's gram 'a b c d e'
        3: "p q r s t u v w",
        4: "a b c d e f g h",          # exact copy of doc1
    }
    docs = rd.from_items([{"doc_id": k, "text": v}
                          for k, v in texts.items()])
    out = {r["doc_id"]: r for r in span_dedup(docs, k=5).take_all()}

    # reference: first occurrence ordered by (doc, pos) survives
    k = 5
    grams = {}
    for d in sorted(texts):
        ws = texts[d].split()
        for p in range(len(ws) - k + 1):
            grams.setdefault(" ".join(ws[p:p + k]), []).append((d, p + 1))
    for d in sorted(texts):
        ws = texts[d].split()
        covered = [False] * len(ws)
        for g, occ in grams.items():
            first = min(occ)
            for (dd, pp) in occ:
                if dd == d and (dd, pp) != first:
                    for w in range(pp - 1, pp - 1 + k):
                        covered[w] = True
        expect = " ".join(w for w, c in zip(ws, covered) if not c)
        assert out[d]["clean_text"] == expect, (d, out[d], expect)
        assert out[d]["n_removed"] == sum(covered)
