"""Property-based robustness for the seventh-sitting format drivers:
WKT, CSV, MVT, ENVI, netCDF-3, AAIGrid, XYZ — randomized round trips
with deterministic example generation (derandomize, same convention as
test_property_based.py)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from gdal_ray.core import wkb
from gdal_ray.core import wkt as W

SET = settings(max_examples=25, deadline=None, derandomize=True)

_coord = st.integers(-10**6, 10**6).map(lambda v: v / 16.0)  # dyadic


@SET
@given(n=st.integers(2, 12), seed=st.integers(0, 2**31))
def test_wkt_linestring_any(n, seed):
    rng = np.random.default_rng(seed)
    xy = (rng.integers(-10**7, 10**7, (n, 2)) / 16.0)
    g = {"type": "LineString", "xy": xy}
    g2 = W.loads_wkt(W.dumps_wkt(g))
    np.testing.assert_array_equal(g2["xy"], xy)


@SET
@given(x=_coord, y=_coord, z=_coord, m=_coord)
def test_wkt_point_zm_any(x, y, z, m):
    g = {"type": "Point", "xy": np.array([x, y]), "z": z, "m": m}
    g2 = W.loads_wkt(W.dumps_wkt(g))
    assert tuple(g2["xy"]) == (x, y)
    assert g2["z"] == z and g2["m"] == m


@SET
@given(rows=st.lists(
    st.tuples(st.integers(-2**62, 2**62),
              st.text(max_size=20),
              st.one_of(st.none(),
                        st.integers(-10**9, 10**9).map(lambda v: v / 4.0))),
    min_size=0, max_size=12))
def test_csv_any_table(rows):
    from gdal_ray.sources import vector_formats as VF
    from gdal_ray.sources import vector_writers as VW
    # prefix keeps the column out of AUTODETECT's numeric coercion ("0"
    # the string is indistinguishable from 0 the int in CSV — inherent
    # to the format, same as the reference's AUTODETECT_TYPE)
    svals = ["s_" + r[1] for r in rows]
    tab = pa.table({
        "i": pa.array([r[0] for r in rows], pa.int64()),
        "s": pa.array(svals, pa.string()),
        "f": pa.array([r[2] for r in rows], pa.float64())})
    t2 = VF.parse_csv_bytes(VW.csv_bytes(tab))
    if not rows:
        return
    assert t2.column("i").to_pylist() == [r[0] for r in rows]
    assert t2.column("s").to_pylist() == svals
    assert t2.column("f").to_pylist() == [r[2] for r in rows]


@SET
@given(pts=st.lists(st.tuples(st.integers(0, 4095), st.integers(0, 4095),
                              st.integers(0, 2**31)),
                    min_size=1, max_size=20))
def test_mvt_points_any(pts):
    from gdal_ray.core.mvt import decode_tile, encode_tile
    feats = [{"type": "Point", "xy": np.array([[x, y]]), "id": i}
             for x, y, i in pts]
    out = decode_tile(encode_tile({"l": feats}))["l"]["features"]
    got = [(int(f["xy"][0, 0]), int(f["xy"][0, 1]), f["id"]) for f in out]
    assert got == list(pts)


@SET
@given(h=st.integers(1, 16), w=st.integers(1, 16), b=st.integers(1, 4),
       il=st.sampled_from(["bsq", "bil", "bip"]),
       bo=st.sampled_from([0, 1]), seed=st.integers(0, 2**31))
def test_envi_any_cube(h, w, b, il, bo, seed):
    from gdal_ray.core.envi import decode_envi, encode_envi
    rng = np.random.default_rng(seed)
    a = rng.integers(-30000, 30000, (h, w, b)).astype(np.int16)
    hdr, raw = encode_envi(a, interleave=il, byte_order=bo)
    np.testing.assert_array_equal(decode_envi(hdr, raw), a)


@SET
@given(h=st.integers(1, 12), w=st.integers(1, 12), seed=st.integers(0, 2**31),
       dt=st.sampled_from(["int16", "int32", "float64"]))
def test_netcdf3_any_grid(h, w, seed, dt):
    from gdal_ray.core.netcdf3 import decode_netcdf, encode_netcdf
    rng = np.random.default_rng(seed)
    a = rng.integers(-1000, 1000, (h, w)).astype(dt)
    blob = encode_netcdf({"y": h, "x": w},
                         {"v": {"dims": ("y", "x"), "data": a,
                                "attrs": {"u": "m"}}}, {"t": "p"})
    dims, vs, g = decode_netcdf(blob)
    assert dims == {"y": h, "x": w} and g["t"] == "p"
    np.testing.assert_array_equal(vs["v"]["data"], a)
    assert vs["v"]["data"].dtype == np.dtype(dt)


@SET
@given(h=st.integers(1, 10), w=st.integers(1, 10), seed=st.integers(0, 2**31))
def test_aaigrid_xyz_any_grid(h, w, seed):
    from gdal_ray.core.aaigrid import (decode_aaigrid, decode_xyz,
                                       encode_aaigrid, encode_xyz)
    rng = np.random.default_rng(seed)
    a = rng.integers(-9998, 10**6, (h, w)).astype(np.int32)
    a2, gt, nd = decode_aaigrid(encode_aaigrid(a, nodata=-9999))
    np.testing.assert_array_equal(a, a2)
    a3, gt3 = decode_xyz(encode_xyz(a))
    np.testing.assert_array_equal(a, a3)


_geom_strategy = st.one_of(
    st.tuples(_coord, _coord).map(
        lambda p: {"type": "Point", "xy": np.array(p)}),
    st.lists(st.tuples(_coord, _coord), min_size=2, max_size=8).map(
        lambda ps: {"type": "LineString",
                    "xy": np.asarray(ps, dtype=np.float64)}),
)


@SET
@given(gs=st.lists(_geom_strategy, min_size=1, max_size=8))
def test_gml_any_features(gs):
    from gdal_ray.sources import vector_formats as VF
    from gdal_ray.sources import vector_writers as VW
    tab = pa.table({"wkb": pa.array([wkb.dumps(g) for g in gs],
                                    pa.binary())})
    t2 = VF.parse_gml_bytes(VW.gml_bytes(tab))
    assert t2.num_rows == len(gs)
    for blob, g in zip(t2.column("wkb").to_pylist(), gs):
        g2 = wkb.loads(blob)
        assert g2["type"] == g["type"]
        np.testing.assert_array_equal(np.atleast_2d(g2["xy"]),
                                      np.atleast_2d(g["xy"]))


@SET
@given(gs=st.lists(_geom_strategy, min_size=1, max_size=8))
def test_dxf_any_features(gs):
    from gdal_ray.sources import vector_formats as VF
    from gdal_ray.sources import vector_writers as VW
    tab = pa.table({"wkb": pa.array([wkb.dumps(g) for g in gs],
                                    pa.binary())})
    t2 = VF.parse_dxf_bytes(VW.dxf_bytes(tab))
    assert t2.num_rows == len(gs)
    for blob, g in zip(t2.column("wkb").to_pylist(), gs):
        g2 = wkb.loads(blob)
        assert g2["type"] == g["type"]


@SET
@given(nodes=st.lists(
    st.tuples(st.integers(1, 2**40),
              st.integers(-1799, 1799),
              st.integers(-849, 849)),
    min_size=1, max_size=12, unique_by=lambda t: t[0]))
def test_osm_any_nodes(nodes):
    from gdal_ray.core.osmpbf import decode_osm_pbf, encode_osm_pbf
    src = [(i, x / 10.0, y / 10.0, {}) for i, x, y in nodes]
    n2, _ = decode_osm_pbf(encode_osm_pbf(src))
    assert [n[0] for n in n2] == [s[0] for s in src]
    for (_, lo1, la1, _t), (_, lo2, la2, _t2) in zip(src, n2):
        assert abs(lo1 - lo2) < 1e-7 and abs(la1 - la2) < 1e-7


@SET
@given(tiles=st.lists(
    st.tuples(st.integers(0, 8), st.integers(0, 255), st.integers(0, 255),
              st.binary(min_size=0, max_size=30)),
    min_size=1, max_size=16))
def test_pmtiles_any_tiles(tiles):
    from gdal_ray.core.pmtiles import decode_pmtiles, encode_pmtiles
    # clamp x/y into the zoom's range and dedupe addresses
    seen = set()
    norm = []
    for z, x, y, p in tiles:
        x &= (1 << z) - 1 if z else 0
        y &= (1 << z) - 1 if z else 0
        if (z, x, y) not in seen:
            seen.add((z, x, y))
            norm.append((z, x, y, p))
    out, _ = decode_pmtiles(encode_pmtiles(norm))
    assert sorted(out) == sorted(norm)
