"""Spatial joins vs brute-force all-pairs oracles (FIXTURES.md F4
join_expected; predicate semantics per ogr/ogrgeometry.cpp)."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.core import fixtures, geom, wkb
from gdal_ray.pipelines import spatial_join as SJ
from gdal_ray.stages.footprint import footprints

N_POINTS = 400
N_POLYS = 60


def brute_force_pip(points_tbl, polys_tbl, predicate):
    px = np.asarray(points_tbl.column("x"), dtype=np.float64)
    py = np.asarray(points_tbl.column("y"), dtype=np.float64)
    pids = points_tbl.column("point_id").to_pylist()
    expect = set()
    for j in range(polys_tbl.num_rows):
        g = wkb.loads(polys_tbl.column("wkb")[j].as_py())
        gid = polys_tbl.column("poly_id")[j].as_py()
        for rings in wkb.as_polygons(g):
            if predicate == "within":
                hit = geom.points_within_polygon(px, py, rings)
            else:
                hit = geom.points_intersect_polygon(px, py, rings)
            for k in np.nonzero(hit)[0]:
                expect.add((pids[k], gid))
    return expect


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("predicate", ["intersects", "within"])
@pytest.mark.parametrize("bcast", [0, 32 << 20])  # cell path / broadcast path
def test_pip_join_matches_bruteforce(predicate, bcast):
    import ray
    pts = fixtures.points_table(N_POINTS)
    pls = fixtures.polygons_table(N_POLYS)
    got = SJ.point_in_polygon_join(
        ray.data.from_arrow(pts), ray.data.from_arrow(pls), predicate=predicate,
        broadcast_limit_bytes=bcast)
    got_pairs = {(r["point_id"], r["poly_id"]) for r in got.take_all()}
    expect = brute_force_pip(pts, pls, predicate)
    assert got_pairs == expect
    assert len(expect) > 20  # fixture sanity: join is non-trivial


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("bcast", [0, 32 << 20])  # cell path / broadcast path
def test_footprint_polygon_join_matches_bruteforce(bcast):
    import ray
    imgs_meta = pa.table({
        "image_id": [fixtures.image_meta(i)["image_id"] for i in range(80)],
        "geotransform": pa.array([fixtures.image_meta(i)["geotransform"] for i in range(80)],
                                 pa.list_(pa.float64(), 6)),
        "crs": [fixtures.image_meta(i)["crs"] for i in range(80)],
        "w": pa.array([fixtures.image_meta(i)["w"] for i in range(80)], pa.int32()),
        "h": pa.array([fixtures.image_meta(i)["h"] for i in range(80)], pa.int32()),
    })
    fps = footprints(imgs_meta)
    pls = fixtures.polygons_table(N_POLYS)

    got = SJ.polygon_polygon_join(
        ray.data.from_arrow(fps), ray.data.from_arrow(pls),
        predicate="intersects", a_id_col="image_id", b_id_col="poly_id",
        broadcast_limit_bytes=bcast)
    got_pairs = {(r["image_id"], r["poly_id"]) for r in got.take_all()}

    expect = set()
    for i in range(fps.num_rows):
        ga = wkb.as_polygons(wkb.loads(fps.column("wkb")[i].as_py()))
        for j in range(pls.num_rows):
            gb = wkb.as_polygons(wkb.loads(pls.column("wkb")[j].as_py()))
            hit = any(geom.polygons_intersect(ra, rb) for ra in ga for rb in gb)
            if hit:
                expect.add((fps.column("image_id")[i].as_py(),
                            pls.column("poly_id")[j].as_py()))
    assert got_pairs == expect
    assert len(expect) > 0


def test_polygons_expand_cells_covering():
    """Every polygon bbox cell is covered; canonical corner cell included."""
    pls = fixtures.polygons_table(10)
    out = SJ.polygons_expand_cells(pls, level=7)
    assert out.num_rows >= 10
    # bbox columns consistent with wkb
    for j in range(out.num_rows):
        rings = wkb.as_polygons(wkb.loads(out.column("wkb")[j].as_py()))[0]
        bb = geom.rings_bbox(rings)
        assert abs(bb[0] - out.column("bxmin")[j].as_py()) < 1e-12


def test_cell_histogram_and_hot(ray_session):
    import ray
    pts = fixtures.points_table(2000)
    ds = ray.data.from_arrow(pts)
    hist = SJ.cell_histogram(ds, level=5)
    assert sum(hist.values()) == 2000
    hot = SJ.hot_cells(hist, threshold=100)
    # clustered fixture points guarantee hotspots at level 5
    assert len(hot) >= 1
    assert all(hist[c] > 100 for c in hot)
