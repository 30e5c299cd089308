"""kNN + IDW vs O(n²) oracle; zonal stats vs brute-force pixel accumulation."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.core import codecs, fixtures, geom, proj, wkb
from gdal_ray.core import geotransform as gtm
from gdal_ray.pipelines import knn as KNN
from gdal_ray.pipelines import zonal as Z


def test_knn_kernel_matches_oracle():
    rng = np.random.default_rng(2)
    q = rng.uniform(-10, 10, size=(50, 2))
    ref = rng.uniform(-10, 10, size=(200, 2))
    idx, dist = KNN.knn_batch_kernel(q[:, 0], q[:, 1], ref, k=5, chunk=16)
    for i in range(50):
        d2 = ((ref - q[i]) ** 2).sum(axis=1)
        expect = np.lexsort((np.arange(200), d2))[:5]
        np.testing.assert_array_equal(idx[i], expect)
        np.testing.assert_allclose(dist[i], np.sqrt(d2[expect]), atol=1e-12)


@pytest.mark.usefixtures("ray_session")
def test_knn_join_distributed():
    import ray
    pts = fixtures.points_table(300)
    ref = fixtures.points_table(80)
    ref_xy = np.column_stack([np.asarray(ref.column("x")), np.asarray(ref.column("y"))])
    ref_ids = ref.column("point_id").to_pylist()
    out = KNN.knn_join(ray.data.from_arrow(pts), ref_xy, ref_ids, k=3,
                       concurrency=2).take_all()
    assert len(out) == 300 * 3
    # oracle spot check for 10 queries
    qx = np.asarray(pts.column("x")); qy = np.asarray(pts.column("y"))
    by_q = {}
    for r in out:
        by_q.setdefault(r["point_id"], []).append((r["rank"], r["neighbor_id"], r["distance"]))
    for i in range(10):
        qid = pts.column("point_id")[i].as_py()
        d2 = (ref_xy[:, 0] - qx[i]) ** 2 + (ref_xy[:, 1] - qy[i]) ** 2
        expect = np.lexsort((np.arange(80), d2))[:3]
        got = sorted(by_q[qid])
        assert [g[1] for g in got] == [ref_ids[j] for j in expect]


@pytest.mark.usefixtures("ray_session")
def test_idw_exact_hit_and_weighting():
    import ray
    ref_xy = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0], [10.0, 10.0]])
    ref_v = np.array([10.0, 20.0, 30.0, 40.0])
    q = pa.table({"point_id": ["a", "b"], "x": [0.0, 5.0], "y": [0.0, 5.0]})
    out = {r["point_id"]: r["idw_value"]
           for r in KNN.idw_interpolate(ray.data.from_arrow(q), ref_xy, ref_v,
                                        max_points=4, concurrency=1).take_all()}
    assert out["a"] == 10.0  # exact hit
    assert abs(out["b"] - 25.0) < 1e-9  # symmetric -> mean


def _zone_images_table(n):
    t = fixtures.images_table(n)
    return t


@pytest.mark.usefixtures("ray_session")
def test_zonal_stats_matches_bruteforce():
    import ray
    imgs = _zone_images_table(20)
    zones = fixtures.polygons_table(15)
    zone_wkbs = zones.column("wkb").to_pylist()
    zone_ids = zones.column("poly_id").to_pylist()
    got = {r["zone_id"]: r for r in Z.zonal_stats(
        ray.data.from_arrow(imgs), zone_wkbs, zone_ids, concurrency=2).take_all()}

    # brute force: every pixel of every image against every zone
    expect = {}
    for i in range(imgs.num_rows):
        img = codecs.decode(imgs.column("bytes")[i].as_py(), imgs.column("fmt")[i].as_py())
        band = (img if img.ndim == 2 else img[:, :, 0]).astype(np.float64)
        h, w = band.shape
        px, py = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
        gt = tuple(imgs.column("geotransform")[i].as_py())
        gx, gy = gtm.apply(gt, px.ravel(), py.ravel())
        tr = proj.get_transformer(imgs.column("crs")[i].as_py(), "EPSG:4326")
        lon, lat = tr.transform(gx, gy)
        for j, zid in enumerate(zone_ids):
            inside = np.zeros(lon.shape[0], dtype=bool)
            for rings in wkb.as_polygons(wkb.loads(zone_wkbs[j])):
                inside |= geom.points_intersect_polygon(lon, lat, rings)
            if inside.any():
                v = band.ravel()[inside]
                e = expect.setdefault(zid, [0, 0.0, np.inf, -np.inf])
                e[0] += int(inside.sum()); e[1] += float(v.sum())
                e[2] = min(e[2], float(v.min())); e[3] = max(e[3], float(v.max()))

    assert set(got) == set(expect)
    for zid, e in expect.items():
        g = got[zid]
        assert g["pix_count"] == e[0]
        assert abs(g["vsum"] - e[1]) < 1e-6
        assert g["vmin"] == e[2] and g["vmax"] == e[3]
        assert abs(g["vmean"] - e[1] / e[0]) < 1e-9
    assert len(expect) >= 1
