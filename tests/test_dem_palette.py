"""DEM derivatives, focal neighbors, global palette, ALL_TOUCHED rasterize,
geometry validators."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.core import codecs, geom, wkb
from gdal_ray.core import geotransform as gtm
from gdal_ray.stages import dem as D
from gdal_ray.stages import vector as V


def img_table(bands, gts=None):
    rows = [codecs.encode_raw(a.astype(np.uint8)) for a in bands]
    t = pa.table({
        "image_id": [f"i{j}" for j in range(len(rows))],
        "bytes": pa.array(rows, pa.binary()),
        "fmt": ["raw"] * len(rows),
    })
    gts = gts or [list(gtm.north_up(0, 10, 1, 1))] * len(rows)
    return t.append_column("geotransform", pa.array(gts, pa.list_(pa.float64(), 6)))


def test_aspect_east_slope():
    """Plane rising to the east → aspect = west (270°) → encoded 135."""
    xx = np.tile(np.arange(16, dtype=np.float64), (16, 1))
    out = D.aspect(img_table([xx * 4]))
    got = codecs.decode(out.column("bytes")[0].as_py(), "png")
    interior = got[4:-4, 4:-4]
    assert (interior == 135).all()


def test_tpi_flat_and_peak():
    flat = np.full((10, 10), 50.0)
    out = D.tpi(img_table([flat]))
    got = codecs.decode(out.column("bytes")[0].as_py(), "png")
    assert (got == 128).all()  # flat → TPI 0 → +128
    peak = flat.copy(); peak[5, 5] = 58.0
    got2 = codecs.decode(D.tpi(img_table([peak])).column("bytes")[0].as_py(), "png")
    assert got2[5, 5] == 136  # center − mean(neighbors)=8 → 136


def test_tri_roughness():
    a = np.zeros((8, 8)); a[:, 4:] = 10.0
    tri = codecs.decode(D.tri(img_table([a])).column("bytes")[0].as_py(), "png")
    rough = codecs.decode(D.roughness(img_table([a])).column("bytes")[0].as_py(), "png")
    assert tri[4, 0] == 0 and tri[4, 4] > 0
    assert rough[4, 3] == 10 and rough[4, 0] == 0


def test_neighbors_stats():
    a = np.zeros((6, 6)); a[3, 3] = 90.0
    mean = codecs.decode(D.neighbors(img_table([a]), stat="mean").column("bytes")[0].as_py(), "png")
    assert mean[3, 3] == 10  # 90/9
    mx = codecs.decode(D.neighbors(img_table([a]), stat="max", size=3).column("bytes")[0].as_py(), "png")
    assert mx[2, 2] == 90 and mx[0, 0] == 0


@pytest.mark.usefixtures("ray_session")
def test_global_palette_two_pass():
    import ray

    from gdal_ray.stages import palette as P
    # two-color world: palette must contain both colors
    red = np.zeros((16, 16, 3), np.uint8); red[:, :, 0] = 200
    blue = np.zeros((16, 16, 3), np.uint8); blue[:, :, 2] = 220
    t = pa.table({
        "image_id": ["r", "b"],
        "bytes": pa.array([codecs.encode_raw(red), codecs.encode_raw(blue)], pa.binary()),
        "fmt": ["raw", "raw"],
    })
    ds = ray.data.from_arrow(t)
    indexed, pal = P.rgb_to_palette(ds, n_colors=8)
    assert pal.shape[1] == 3
    # nearest palette entries to the two colors are distinct
    d_red = ((pal.astype(float) - [200, 0, 0]) ** 2).sum(axis=1)
    d_blue = ((pal.astype(float) - [0, 0, 220]) ** 2).sum(axis=1)
    assert d_red.min() < 600 and d_blue.min() < 600
    out = {r["image_id"]: r for r in indexed.take_all()}
    ir = codecs.decode_raw(out["r"]["bytes"])
    ib = codecs.decode_raw(out["b"]["bytes"])
    assert len(np.unique(ir)) == 1 and len(np.unique(ib)) == 1
    assert ir[0, 0] != ib[0, 0]


@pytest.mark.usefixtures("ray_session")
def test_rasterize_all_touched_superset():
    import ray

    from gdal_ray.pipelines.rasterize import rasterize
    polys = pa.table({
        "poly_id": ["p"],
        "wkb": pa.array([wkb.box(-30.0, -20.0, 31.0, 22.0)], pa.binary()),
    })
    ds = ray.data.from_arrow(polys)
    center = rasterize(ds, 3, burn_value=1.0, id_col="poly_id").take_all()
    at = rasterize(ds, 3, burn_value=1.0, id_col="poly_id", all_touched=True).take_all()
    n_center = sum(r["burned_px"] for r in center)
    n_at = sum(r["burned_px"] for r in at)
    assert n_at > n_center  # edge-touched pixels added
    # all center-burned pixels are also all_touched-burned
    cen = {(r["z"], r["x"], r["y"]): np.frombuffer(r["data"], np.uint8) for r in center}
    att = {(r["z"], r["x"], r["y"]): np.frombuffer(r["data"], np.uint8) for r in at}
    for k, c in cen.items():
        assert (att[k] >= c).all()


def test_check_geometry():
    good = wkb.box(0, 0, 10, 10)
    bowtie = wkb.polygon(np.array([[0, 0], [10, 10], [10, 0], [0, 10], [0, 0]], dtype=float))
    unclosed_rings = {"type": "Polygon",
                      "rings": [np.array([[0, 0], [5, 0], [5, 5]], dtype=float)]}
    t = pa.table({"poly_id": ["a", "b", "c"],
                  "wkb": pa.array([good, bowtie, wkb.dumps(unclosed_rings)], pa.binary())})
    out = V.check_geometry(t)
    assert out.column("is_valid").to_pylist() == [True, False, False]
    assert out.column("invalid_reason")[1].as_py() == "self-intersection"


def test_make_valid_lite():
    ring = np.array([[0, 0], [5, 0], [5, 0], [5, 5], [0, 5]], dtype=float)  # dup + unclosed
    t = pa.table({"poly_id": ["a"],
                  "wkb": pa.array([wkb.dumps({"type": "Polygon", "rings": [ring]})], pa.binary())})
    out = V.make_valid_lite(t)
    g = wkb.as_polygons(wkb.loads(out.column("wkb")[0].as_py()))[0][0]
    assert np.allclose(g[0], g[-1])
    assert (np.abs(np.diff(g, axis=0)).sum(axis=1) > 0).all()
    assert V.check_geometry(out).column("is_valid")[0].as_py()
