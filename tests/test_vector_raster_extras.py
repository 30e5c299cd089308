"""explode-collections / make-point / collect / concave-hull and the
blend / nodata-to-alpha / raster-update stages (SURVEY §2.14 gaps)."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.core import codecs, geom, wkb
from gdal_ray.stages.raster2 import blend, nodata_to_alpha, raster_update
from gdal_ray.stages.vector import (collect_multipart, concave_hull,
                                    explode_collections, make_point)


def sq(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]],
                    dtype=np.float64)


def test_explode_and_collect_roundtrip():
    multi = wkb.dumps({"type": "MultiPolygon",
                       "polys": [[sq(0, 0, 1, 1)], [sq(2, 2, 3, 3)]]})
    single = wkb.dumps({"type": "Polygon", "rings": [sq(5, 5, 6, 6)]})
    t = pa.table({"fid": pa.array(["a", "b"]),
                  "wkb": pa.array([multi, single], pa.binary())})
    ex = explode_collections(t)
    assert ex.num_rows == 3
    assert ex.column("fid").to_pylist() == ["a", "a", "b"]
    for data in ex.column("wkb").to_pylist():
        assert len(wkb.as_polygons(wkb.loads(data))) == 1
    # collect back per fid
    back = collect_multipart(ex.filter(pa.array([True, True, False])))
    assert back.column("n_parts")[0].as_py() == 2


def test_make_point():
    t = pa.table({"x": pa.array([1.5, -2.0]), "y": pa.array([3.0, 4.5])})
    out = make_point(t)
    g = wkb.loads(out.column("wkb")[0].as_py())
    assert g["type"] == "Point"
    assert tuple(np.asarray(g["xy"]).ravel()[:2]) == (1.5, 3.0)


def test_concave_hull_tighter_than_convex():
    # C-shaped point cloud: concave hull should have smaller area
    rng = np.random.default_rng(4)
    t = rng.uniform(0, np.pi * 1.5, 300)
    r = rng.uniform(2.0, 3.0, 300)
    pts = np.column_stack([r * np.cos(t), r * np.sin(t)])
    ring = np.vstack([pts, pts[:1]])
    data = wkb.dumps({"type": "Polygon", "rings": [ring]})
    tbl = pa.table({"wkb": pa.array([data], pa.binary())})
    out = concave_hull(tbl, ratio=0.2)
    hull = wkb.as_polygons(wkb.loads(out.column("wkb")[0].as_py()))[0][0]
    convex = geom.convex_hull(pts)
    a_concave = abs(geom.ring_area(hull))
    a_convex = abs(geom.ring_area(convex))
    assert a_concave < 0.8 * a_convex
    # simple ring: no self-crossings
    a1, a2 = hull[:-1], hull[1:]
    n = len(a1)
    crossings = geom._segments_cross(a1, a2, a1, a2)
    i = np.arange(n)
    adj = (np.abs(i[:, None] - i[None, :]) <= 1) | \
          (np.abs(i[:, None] - i[None, :]) == n - 1)
    assert not (crossings & ~adj).any()


def _img_row(img, image_id="i0", nodata=None, extra=None):
    cols = {
        "image_id": pa.array([image_id]),
        "bytes": pa.array([codecs.encode_raw(img)], pa.binary()),
        "fmt": pa.array(["raw"]),
        "nodata": pa.array([nodata], pa.float64()),
    }
    if extra:
        cols.update(extra)
    return pa.table(cols)


def test_nodata_to_alpha():
    img = np.zeros((4, 4, 3), np.uint8)
    img[1, 1] = (7, 7, 7)
    t = _img_row(img, nodata=0.0)
    out = nodata_to_alpha(t)
    rgba = codecs.decode(out.column("bytes")[0].as_py(), "png")
    assert rgba.shape[2] == 4
    assert rgba[0, 0, 3] == 0      # nodata pixel transparent
    assert rgba[1, 1, 3] == 255


def test_blend_constant_opacity():
    base = np.full((2, 2, 3), 100, np.uint8)
    over = np.full((2, 2, 3), 200, np.uint8)
    t = _img_row(base, extra={
        "overlay_bytes": pa.array([codecs.encode_raw(over)], pa.binary()),
        "overlay_fmt": pa.array(["raw"])})
    out = blend(t, opacity=0.25)
    got = codecs.decode(out.column("bytes")[0].as_py(), "png")
    assert got[0, 0, 0] == 125  # 200*0.25 + 100*0.75


def test_raster_update_patch():
    base = np.zeros((6, 6), np.uint8)
    patch = np.full((2, 3), 9, np.uint8)
    t = _img_row(base, extra={
        "patch_bytes": pa.array([codecs.encode_raw(patch)], pa.binary()),
        "patch_fmt": pa.array(["raw"]),
        "patch_x": pa.array([4], pa.int32()),   # clips at right edge
        "patch_y": pa.array([1], pa.int32())})
    out = raster_update(t)
    got = codecs.decode(out.column("bytes")[0].as_py(), "raw")
    assert got[1, 4] == 9 and got[2, 5] == 9
    assert got[1, 3] == 0 and got[3, 4] == 0
    assert (got == 9).sum() == 4  # 2x3 patch clipped to 2x2


def test_compare_images_gdalcompare_semantics():
    """gdalcompare analog: identical copy → 0 diffs / None PSNR; perturbed
    copy → exact diff count + max abs diff; shape mismatch → flagged."""
    from gdal_ray.core.checksum import checksum as gdal_checksum
    from gdal_ray.stages.raster2 import compare_images

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
    pert = img.copy()
    pert[3, 4] = (int(pert[3, 4]) + 40) % 256
    pert[10, 20] = (int(pert[10, 20]) + 7) % 256
    resized = img[:16, :16]
    batch = pa.table({
        "image_id": ["same", "pert", "shape"],
        "bytes_golden": pa.array([codecs.encode_png(img)] * 3, pa.binary()),
        "fmt_golden": ["png"] * 3,
        "bytes_test": pa.array([codecs.encode_png(img),
                                codecs.encode_png(pert),
                                codecs.encode_png(resized)], pa.binary()),
        "fmt_test": ["png"] * 3,
    })
    out = {r["image_id"]: r for r in compare_images(batch).to_pylist()}
    same = out["same"]
    assert same["n_diff_pixels"] == 0 and same["psnr"] is None
    assert same["checksum_golden"] == same["checksum_test"] == gdal_checksum(img)
    p = out["pert"]
    assert p["n_diff_pixels"] == 2
    exp_max = float(np.abs(img.astype(int) - pert.astype(int)).max())
    assert p["max_abs_diff"] == exp_max
    assert p["psnr"] is not None and p["psnr"] > 30
    assert p["checksum_golden"] != p["checksum_test"]
    s = out["shape"]
    assert not s["same_dims"] and s["n_diff_pixels"] == -1


def test_compare_stage_registered(ray_session):
    import ray

    from gdal_ray.pipelines.pipeline_spec import run_pipeline

    img = np.full((8, 8), 7, dtype=np.uint8)
    t = pa.table({
        "image_id": ["a"],
        "bytes_golden": pa.array([codecs.encode_png(img)], pa.binary()),
        "fmt_golden": ["png"],
        "bytes_test": pa.array([codecs.encode_png(img)], pa.binary()),
        "fmt_test": ["png"],
    })
    out = run_pipeline({"steps": [{"op": "compare"}]},
                       source=ray.data.from_arrow(t)).take_all()
    assert out[0]["n_diff_pixels"] == 0
