"""Property-based robustness for the eighth-sitting format drivers:
XLSX, ODS, GMT, DGN, S-57, BSB, TGA, DEM/raw grids — randomized round
trips with deterministic example generation (derandomize, same
convention as test_property_based.py)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from gdal_ray.core import wkb as W

SET = settings(max_examples=25, deadline=None, derandomize=True)

_dyadic = st.integers(-10**6, 10**6).map(lambda v: v / 16.0)


def _attr_rows():
    return st.lists(
        st.tuples(st.integers(-2**62, 2**62),
                  st.text(st.characters(blacklist_categories=('Cs', 'Cc')),
                          max_size=18),
                  st.one_of(st.none(),
                            st.integers(-10**9, 10**9)
                            .map(lambda v: v / 4.0)),
                  st.booleans()),
        min_size=0, max_size=10)


def _attr_table(rows):
    return pa.table({
        "i": pa.array([r[0] for r in rows], pa.int64()),
        "s": pa.array(["s_" + r[1] for r in rows], pa.string()),
        "f": pa.array([r[2] for r in rows], pa.float64()),
        "b": pa.array([r[3] for r in rows], pa.bool_())})


@SET
@given(rows=_attr_rows())
def test_xlsx_any_table(rows):
    from gdal_ray.sources import vector_formats as VF
    from gdal_ray.sources import vector_writers as VW
    tab = _attr_table(rows)
    t2 = VF.parse_xlsx_bytes(VW.xlsx_bytes(tab))
    if not rows:
        return
    for c in tab.column_names:
        assert t2.column(c).to_pylist() == tab.column(c).to_pylist(), c


@SET
@given(rows=_attr_rows())
def test_ods_any_table(rows):
    from gdal_ray.sources import vector_formats as VF
    from gdal_ray.sources import vector_writers as VW
    tab = _attr_table(rows)
    t2 = VF.parse_ods_bytes(VW.ods_bytes(tab))
    if not rows:
        return
    for c in tab.column_names:
        assert t2.column(c).to_pylist() == tab.column(c).to_pylist(), c


@SET
@given(pts=st.lists(st.tuples(_dyadic, _dyadic), min_size=1, max_size=8),
       names=st.lists(st.text(st.characters(blacklist_categories=('Cs', 'Cc')),
                              max_size=12), min_size=1, max_size=8))
def test_gmt_any_points(pts, names):
    from gdal_ray.sources import vector_formats as VF
    from gdal_ray.sources import vector_writers as VW
    n = min(len(pts), len(names))
    tab = pa.table({
        "name": pa.array(["n_" + s for s in names[:n]], pa.string()),
        "wkb": pa.array([W.point(x, y) for x, y in pts[:n]],
                        pa.binary())})
    t2 = VF.parse_gmt_bytes(VW.gmt_bytes(tab))
    assert t2.column("name").to_pylist() == tab.column("name").to_pylist()
    assert t2.column("wkb").to_pylist() == tab.column("wkb").to_pylist()


@SET
@given(n=st.integers(2, 30), seed=st.integers(0, 2**31))
def test_dgn_any_linestring(n, seed):
    from gdal_ray.core import dgn as DGN
    rng = np.random.default_rng(seed)
    xy = rng.integers(-10**7, 10**7, (n, 2)) / 10**4   # UOR-exact
    rows, skipped = DGN.decode_dgn(DGN.encode_dgn(
        [{"type": "LineString", "xy": xy}]))
    assert skipped == {}
    g = W.loads(rows[0][2])
    np.testing.assert_allclose(
        g["xy"] if g["type"] == "LineString" else
        np.vstack([g["xy"], g["xy"]]), xy, atol=1e-9)


@SET
@given(n=st.integers(2, 20), seed=st.integers(0, 2**31),
       objl=st.integers(0, 65535))
def test_s57_any_line(n, seed, objl):
    from gdal_ray.core.s57 import decode_s57, encode_s57
    rng = np.random.default_rng(seed)
    xy = rng.integers(-1_700_000_000, 1_700_000_000, (n, 2)) / 10**7
    back = decode_s57(encode_s57(
        [{"objl": objl, "attrs": {1: "v"},
          "geom": {"type": "LineString", "xy": xy}}]))
    assert back[0]["objl"] == objl
    g = W.loads(back[0]["wkb"])
    np.testing.assert_allclose(g["xy"], xy, atol=1e-9)


@SET
@given(h=st.integers(1, 12), w=st.integers(1, 60),
       npal=st.integers(1, 127), seed=st.integers(0, 2**31))
def test_bsb_any_grid(h, w, npal, seed):
    from gdal_ray.core import bsb as BSB
    rng = np.random.default_rng(seed)
    a = rng.integers(0, npal, (h, w), np.uint8)
    pal = rng.integers(0, 256, (npal, 3), np.uint8)
    back, bpal = BSB.decode_bsb(BSB.encode_bsb(a, pal))
    assert np.array_equal(back, a)
    assert np.array_equal(bpal, pal)


@SET
@given(h=st.integers(1, 16), w=st.integers(1, 16),
       seed=st.integers(0, 2**31), rle=st.booleans())
def test_tga_any_rgb(h, w, seed, rle):
    from gdal_ray.core import tga as TGA
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, (h, w, 3), np.uint8)
    back, _ = TGA.decode_tga(TGA.encode_tga(a, rle=rle))
    assert np.array_equal(back, a)


@SET
@given(h=st.integers(2, 20), w=st.integers(2, 20),
       seed=st.integers(0, 2**31))
def test_rawgrid_family_any(h, w, seed):
    from gdal_ray.core import rawgrids as RG
    rng = np.random.default_rng(seed)
    a16 = rng.integers(-30000, 30000, (h, w)).astype(np.int16)
    assert np.array_equal(RG.decode_bt(RG.encode_bt(a16))[0], a16)
    af = a16.astype(np.float32)
    assert np.array_equal(RG.decode_gtx(RG.encode_gtx(af))[0], af)
    assert np.array_equal(
        RG.decode_ehdr(*RG.encode_ehdr(a16))[0], a16)
    assert np.array_equal(
        RG.decode_idrisi(*RG.encode_idrisi(a16))[0], a16)
    assert np.array_equal(RG.decode_ers(*RG.encode_ers(a16))[0], a16)
    assert np.array_equal(
        RG.decode_rraster(*RG.encode_rraster(a16))[0], a16)


@SET
@given(n=st.integers(2, 16), seed=st.integers(0, 2**31))
def test_demgrid_family_any(n, seed):
    from gdal_ray.core import demgrids as DG
    rng = np.random.default_rng(seed)
    a = rng.integers(-1000, 4000, (n, n)).astype(np.int16)
    assert np.array_equal(
        DG.decode_srtmhgt(DG.encode_srtmhgt(a))[0], a)
    af = a.astype(np.float64)
    assert np.array_equal(DG.decode_gsag(DG.encode_gsag(af))[0], af)
    assert np.array_equal(DG.decode_gs7bg(DG.encode_gs7bg(af))[0], af)
    assert np.array_equal(DG.decode_zmap(DG.encode_zmap(af))[0], af)
    if n >= 5 and 36000 % (n - 1) == 0:
        assert np.array_equal(DG.decode_dted(DG.encode_dted(a))[0], a)


def test_xml_writers_handle_cr_and_reject_control_chars():
    """\\r must survive XLSX/ODS roundtrips (XML folds literal CR to LF
    on parse — writers emit &#xD;); other control chars are
    unrepresentable in XML 1.0 and raise."""
    import pytest

    from gdal_ray.sources import vector_formats as VF
    from gdal_ray.sources import vector_writers as VW
    tab = pa.table({"s": pa.array(["a\rb", "c\nd", "e\tf"])})
    assert VF.parse_xlsx_bytes(VW.xlsx_bytes(tab)) \
        .column("s").to_pylist() == ["a\rb", "c\nd", "e\tf"]
    assert VF.parse_ods_bytes(VW.ods_bytes(tab)) \
        .column("s").to_pylist() == ["a\rb", "c\nd", "e\tf"]
    bad = pa.table({"s": pa.array(["x\x00y"])})
    with pytest.raises(ValueError, match="control"):
        VW.xlsx_bytes(bad)
    with pytest.raises(ValueError, match="control"):
        VW.ods_bytes(bad)
    gmt_bad = pa.table({"s": pa.array(["a\nb"]),
                        "wkb": pa.array([W.point(0, 0)], pa.binary())})
    with pytest.raises(ValueError, match="line-framed"):
        VW.gmt_bytes(gmt_bad)
