"""Property-based robustness tests (hypothesis) for the round-3 surfaces:
the two real codecs, the expression engine (vs DuckDB on the same data),
and the exact EDT — randomized inputs, invariant assertions."""

import duckdb
import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

# derandomize: the driver's gate reruns this suite fresh — example
# generation must be deterministic, not seeded per-run
SET = settings(max_examples=25, deadline=None, derandomize=True)


@SET
@given(h=st.integers(1, 40), w=st.integers(1, 40),
       bands=st.sampled_from([1, 3, 4]), seed=st.integers(0, 2**31))
def test_vp8l_lossless_any_image(h, w, bands, seed):
    from gdal_ray.core.vp8l import decode_vp8l, encode_vp8l
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, bands), dtype=np.uint8)
    if bands == 1:
        img = img[:, :, 0]
    dec = decode_vp8l(encode_vp8l(img))
    # gray collapses to 2-D; RGBA with opaque alpha collapses to RGB —
    # content must survive exactly either way
    if dec.ndim == 2 and img.ndim == 3:
        assert (img[:, :, 0] == img[:, :, 1]).all()
        np.testing.assert_array_equal(dec, img[:, :, 0])
    elif img.ndim == 3 and img.shape[2] == 4 and dec.shape[-1] == 3:
        assert (img[:, :, 3] == 255).all()
        np.testing.assert_array_equal(dec, img[:, :, :3])
    else:
        np.testing.assert_array_equal(dec, img)


@SET
@given(h=st.integers(8, 48), w=st.integers(8, 48),
       bands=st.sampled_from([1, 3]), seed=st.integers(0, 2**31))
def test_jpeg_decodes_to_right_shape_and_range(h, w, bands, seed):
    from gdal_ray.core.jpeg import decode_jpeg, encode_jpeg
    rng = np.random.default_rng(seed)
    # smooth-ish content (pure noise is the worst case for any DCT codec)
    base = rng.integers(0, 200, (h, w))
    img = (base + rng.integers(0, 30, (h, w))).clip(0, 255).astype(np.uint8)
    if bands == 3:
        img = np.stack([img, 255 - img, np.roll(img, 1, axis=0)], axis=-1)
    dec = decode_jpeg(encode_jpeg(img, 95))
    assert dec.shape == img.shape
    assert dec.dtype == np.uint8
    # quality-95 reconstruction must stay correlated with the source
    err = np.abs(dec.astype(int) - img.astype(int)).mean()
    assert err < 12.0


@SET
@given(seed=st.integers(0, 2**31), thresh=st.integers(0, 2000))
def test_expr_filter_matches_duckdb_random_tables(seed, thresh):
    from gdal_ray.functions.expr import filter_table
    rng = np.random.default_rng(seed)
    n = 40
    tbl = pa.table({
        "fid": pa.array(range(n), pa.int64()),
        "a": pa.array(rng.integers(-100, 2100, n), pa.int64()),
        "b": pa.array(np.round(rng.random(n) * 10, 3), pa.float64()),
        "s": pa.array([f"v{int(x):03d}" for x in rng.integers(0, 50, n)]),
    })
    where = (f"(a > {thresh} OR b < 2.5) AND s NOT LIKE 'v00%' "
             f"AND a % 7 != 3")
    got = sorted(filter_table(tbl, where).column("fid").to_pylist())
    con = duckdb.connect()
    con.register("t", tbl)
    exp = con.execute(f"SELECT fid FROM t WHERE {where} ORDER BY fid") \
        .df()["fid"].tolist()
    assert got == exp


@SET
@given(h=st.integers(3, 30), w=st.integers(3, 30), seed=st.integers(0, 2**31))
def test_exact_edt_matches_brute_force(h, w, seed):
    from gdal_ray.stages.raster import exact_edt
    rng = np.random.default_rng(seed)
    t = rng.random((h, w)) < 0.1
    if not t.any():
        t[h // 2, w // 2] = True
    d = exact_edt(t)
    ty, tx = np.nonzero(t)
    yy, xx = np.mgrid[0:h, 0:w]
    brute = np.sqrt(((yy.ravel()[:, None] - ty[None, :]) ** 2
                     + (xx.ravel()[:, None] - tx[None, :]) ** 2)
                    .min(axis=1)).reshape(h, w)
    np.testing.assert_allclose(d, brute, atol=0)


@SET
@given(n=st.integers(4, 60), seed=st.integers(0, 2**31))
def test_delaunay_reproduces_linear_fields(n, seed):
    from gdal_ray.core.delaunay import (barycentric_interpolate,
                                        delaunay_triangulation)
    rng = np.random.default_rng(seed)
    pts = rng.random((n, 2)) * 10
    tris = delaunay_triangulation(pts)
    if len(tris) == 0:      # (near-)collinear draws are legal inputs
        return
    v = 3.0 * pts[:, 0] - 2.0 * pts[:, 1] + 1.0
    w3 = rng.dirichlet(np.ones(3), size=50)
    sel = rng.integers(0, n, (50, 3))
    q = np.einsum("ij,ijk->ik", w3, pts[sel])
    val, inside = barycentric_interpolate(tris, pts, v, q[:, 0], q[:, 1])
    ok = inside
    assert np.abs(val[ok] - (3 * q[ok, 0] - 2 * q[ok, 1] + 1)).max() < 1e-6


@SET
@given(st.lists(st.text(alphabet="abcdef gh", min_size=0, max_size=60),
                min_size=5, max_size=40))
def test_sequence_pack_properties(ray_session, texts):
    """Pack invariants under random corpora: offsets strictly increase by
    n_tokens in id order, start at 0, bins are consistent with capacity."""
    import ray.data as rd

    from gdal_ray.pipelines.text import sequence_pack
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = sequence_pack(rd.from_arrow(tbl), capacity=7).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    w = out["n_tokens"].to_numpy()
    s = out["start_off"].to_numpy()
    assert s[0] == 0
    assert (s[1:] == s[:-1] + w[:-1]).all()
    assert (w >= 1).all()
    assert (out["bin_first"] == s // 7).all()
    assert (out["bin_last"] == (s + w - 1) // 7).all()


@SET
@given(st.lists(st.text(alphabet="xyz uvw", min_size=0, max_size=40),
                min_size=10, max_size=30), st.integers(0, 1 << 30))
def test_contamination_bounds(ray_session, texts, salt):
    """0 ≤ matched ≤ total for every test doc; every test doc present."""
    import ray.data as rd

    from gdal_ray.pipelines.dedup import _splitmix, contamination
    ids = np.arange(len(texts), dtype=np.int64) + salt
    tbl = pa.table({"doc_id": pa.array(ids),
                    "text": pa.array(texts, pa.string())})
    out = contamination(rd.from_arrow(tbl), k=4)
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    thr = np.uint64((1 << 64) // 10 - 1)
    expect = set(ids[_splitmix(ids.astype(np.uint64)) <= thr].tolist())
    if not expect:
        # Ray drops the schema of empty datasets (documented gotcha);
        # only the row count is checkable here
        assert len(df) == 0
        return
    assert set(df["doc_id"]) == expect
    assert (df["n_matched"] >= 0).all()
    assert (df["n_matched"] <= df["n_shingles"]).all()
    assert (df["n_shingles"] >= 1).all()
