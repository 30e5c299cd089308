"""Big×big cell-join kNN vs brute force; oversized-image splitter
tile-equivalence."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.core import codecs, fixtures
from gdal_ray.core import geotransform as gtm
from gdal_ray.pipelines import knn as KNN
from gdal_ray.stages.warp import WarpTileStage, split_large_images


@pytest.mark.usefixtures("ray_session")
def test_knn_radius_cell_join_matches_bruteforce():
    import ray
    q_tbl = fixtures.points_table(150)
    p_tbl = fixtures.points_batch(np.arange(1000, 1800))
    RADIUS, K = 1.5, 4
    out = KNN.knn_radius_cell_join(
        ray.data.from_arrow(q_tbl), ray.data.from_arrow(p_tbl),
        radius=RADIUS, k=K).take_all()
    got = {}
    for r in out:
        got.setdefault(r["point_id"], []).append((r["rank"], r["neighbor_id"], r["distance"]))
    # brute force
    qx = np.asarray(q_tbl.column("x")); qy = np.asarray(q_tbl.column("y"))
    px = np.asarray(p_tbl.column("x")); py = np.asarray(p_tbl.column("y"))
    pids = p_tbl.column("point_id").to_pylist()
    n_checked = 0
    for i in range(150):
        d = np.hypot(px - qx[i], py - qy[i])
        within = np.nonzero(d <= RADIUS)[0]
        order = sorted(within, key=lambda j: (d[j], pids[j]))[:K]
        qid = q_tbl.column("point_id")[i].as_py()
        expect = [(r + 1, pids[j]) for r, j in enumerate(order)]
        got_i = [(r, n) for r, n, _ in sorted(got.get(qid, []))]
        assert got_i == expect, f"query {qid}"
        if expect:
            n_checked += 1
    assert n_checked > 10  # fixture yields real matches


def test_split_large_images_tile_equivalence():
    """A 640×640 image split into 256-px windows produces the SAME tile
    contributions (composited) as the unsplit image."""
    big = fixtures.image_pixels(0, 640, 640, 1)
    gt = gtm.north_up(-10.0, 20.0, 0.05 / 640 * 40, 0.05 / 640 * 40)
    tbl = pa.table({
        "image_id": ["big"],
        "bytes": pa.array([codecs.encode_raw(big)], pa.binary()),
        "w": pa.array([640], pa.int32()), "h": pa.array([640], pa.int32()),
        "fmt": ["raw"], "caption": ["c"], "phash": pa.array([0], pa.int64()),
        "geotransform": pa.array([list(gt)], pa.list_(pa.float64(), 6)),
        "crs": ["EPSG:4326"],
        "nodata": pa.array([None], pa.float64()),
    })
    split = split_large_images(tbl, max_pixels=256 * 256, tile_px=256)
    assert split.num_rows == 9  # 3×3 windows
    # window geotransforms tile the original exactly
    g0 = split.column("geotransform")[0].as_py()
    assert g0 == list(gt)
    stage = WarpTileStage(zoom=10, mesh_step=1)
    whole = stage(tbl)
    parts = stage(split)

    def composite(contribs):
        acc = {}
        for j in range(contribs.num_rows):
            key = (contribs.column("z")[j].as_py(), contribs.column("x")[j].as_py(),
                   contribs.column("y")[j].as_py())
            canvas, mask = acc.setdefault(key, (np.zeros((256, 256, 3), np.uint8),
                                                np.zeros((256, 256), bool)))
            x0 = contribs.column("wx0")[j].as_py(); y0 = contribs.column("wy0")[j].as_py()
            ww = contribs.column("ww")[j].as_py(); wh = contribs.column("wh")[j].as_py()
            m = np.frombuffer(contribs.column("mask")[j].as_py(), np.uint8).reshape(wh, ww) > 0
            rgb = np.frombuffer(contribs.column("rgb")[j].as_py(), np.uint8).reshape(wh, ww, 3)
            sub_c = canvas[y0:y0 + wh, x0:x0 + ww]
            sub_m = mask[y0:y0 + wh, x0:x0 + ww]
            take = m & ~sub_m
            sub_c[take] = rgb[take]
            sub_m |= m
        return acc

    a = composite(whole)
    b = composite(parts)
    assert set(a) == set(b)
    for key in a:
        ca, ma = a[key]
        cb, mb = b[key]
        # masks equal; pixels equal except at window seams where bilinear
        # support is clipped — allow a thin seam tolerance
        assert (ma == mb).mean() > 0.999
        both = ma & mb
        diff = (ca.astype(int) - cb.astype(int))[both]
        assert np.abs(diff).mean() < 1.0
        assert (np.abs(diff) <= 255).all()
        # overwhelming majority of pixels bit-identical
        assert (np.abs(diff) == 0).mean() > 0.97


def test_polygonize_stitched_equals_unsplit(ray_session):
    """split_large_images ∘ polygonize ∘ stitch == whole-image polygonize
    (component multiset AND exact region equality per value)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from gdal_ray.core import codecs, geom, overlay as OV, wkb
    from gdal_ray.pipelines.polygonize import polygonize, polygonize_stitched

    rng = np.random.default_rng(21)
    # blobby label image: threshold smooth noise into 3 values
    f = rng.normal(0, 1, (48, 40))
    for _ in range(6):  # cheap smoothing
        f = (f + np.roll(f, 1, 0) + np.roll(f, -1, 0)
             + np.roll(f, 1, 1) + np.roll(f, -1, 1)) / 5.0
    band = np.digitize(f, [-0.1, 0.1]).astype(np.uint8)
    gt = [2.0, 0.5, 0.0, 9.0, 0.0, -0.5]
    t = pa.table({
        "image_id": pa.array(["img"]),
        "bytes": pa.array([codecs.encode_raw(band)], pa.binary()),
        "w": pa.array([40], pa.int32()), "h": pa.array([48], pa.int32()),
        "fmt": pa.array(["raw"]),
        "geotransform": pa.array([gt], pa.list_(pa.float64(), 6)),
        "crs": pa.array(["EPSG:4326"]),
        "nodata": pa.nulls(1, pa.float64()),
    })
    whole = polygonize(t)
    ds = ray.data.from_arrow(t)
    stitched = pa.concat_tables([b for b in
        polygonize_stitched(ds, max_pixels=256, tile_px=16)
        .iter_batches(batch_format="pyarrow")])

    def comp_multiset(tbl):
        return sorted((tbl.column("value")[i].as_py(),
                       tbl.column("pix_count")[i].as_py())
                      for i in range(tbl.num_rows))

    assert comp_multiset(whole) == comp_multiset(stitched)

    # exact region equality per value: symdifference area == 0
    def regions(tbl):
        out = {}
        for i in range(tbl.num_rows):
            v = tbl.column("value")[i].as_py()
            out.setdefault(v, []).extend(
                wkb.as_polygons(wkb.loads(tbl.column("wkb")[i].as_py())))
        return out
    rw, rs = regions(whole), regions(stitched)
    assert set(rw) == set(rs)
    for v in rw:
        sym = OV.overlay(rw[v], rs[v], "symdifference")
        assert OV.area_of(sym) < 1e-9
