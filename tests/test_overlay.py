"""Boolean overlay engine + layer algebra oracles.

Oracles are exact closed-form areas (rect inclusion-exclusion via the
coordinate-compression grid) and fine-grid rasterization for concave
cases — independent of the engine's own math.
"""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.core import geom, overlay as OV, wkb


def sq(x0, y0, x1, y1):
    return [np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]],
                     dtype=np.float64)]


def rect_union_area(rects):
    """Exact union area of axis-aligned rects via coordinate compression."""
    xs = np.unique(np.concatenate([[r[0], r[2]] for r in rects]))
    ys = np.unique(np.concatenate([[r[1], r[3]] for r in rects]))
    area = 0.0
    for i in range(len(xs) - 1):
        for j in range(len(ys) - 1):
            cx, cy = (xs[i] + xs[i + 1]) / 2, (ys[j] + ys[j + 1]) / 2
            if any(r[0] < cx < r[2] and r[1] < cy < r[3] for r in rects):
                area += (xs[i + 1] - xs[i]) * (ys[j + 1] - ys[j])
    return area


def test_union_shared_edge_merges():
    r = OV.union_all([sq(0, 0, 1, 1), sq(1, 0, 2, 1)])
    assert len(r) == 1
    assert OV.area_of(r) == pytest.approx(2.0, abs=1e-9)


def test_union_overlap_area():
    r = OV.union_all([sq(0, 0, 1, 1), sq(0.5, 0.5, 1.5, 1.5)])
    assert len(r) == 1
    assert OV.area_of(r) == pytest.approx(1.75, abs=1e-9)


def test_intersection_difference_symdifference():
    A, B = [sq(0, 0, 1, 1)], [sq(0.5, 0.5, 1.5, 1.5)]
    assert OV.area_of(OV.overlay(A, B, "intersection")) == pytest.approx(0.25, abs=1e-9)
    assert OV.area_of(OV.overlay(A, B, "difference")) == pytest.approx(0.75, abs=1e-9)
    assert OV.area_of(OV.overlay(A, B, "symdifference")) == pytest.approx(1.5, abs=1e-9)


def test_union_forms_hole():
    frame = [sq(0, 0, 3, 1), sq(0, 2, 3, 3), sq(0, 1, 1, 2), sq(2, 1, 3, 2)]
    r = OV.union_all(frame)
    assert len(r) == 1 and len(r[0]) == 2  # shell + hole
    assert OV.area_of(r) == pytest.approx(8.0, abs=1e-9)


def test_difference_punches_hole():
    r = OV.overlay([sq(0, 0, 3, 3)], [sq(1, 1, 2, 2)], "difference")
    assert len(r) == 1 and len(r[0]) == 2
    assert OV.area_of(r) == pytest.approx(8.0, abs=1e-9)


def test_island_in_lake():
    lake = OV.overlay([sq(0, 0, 5, 5)], [sq(1, 1, 4, 4)], "difference")
    r = OV.overlay(lake, [sq(2, 2, 3, 3)], "union")
    assert len(r) == 2
    assert OV.area_of(r) == pytest.approx(17.0, abs=1e-9)


def test_make_valid_bowtie():
    bow = [np.array([[0, 0], [2, 2], [2, 0], [0, 2], [0, 0]], float)]
    r = OV.make_valid(bow)
    assert len(r) == 2
    assert OV.area_of(r) == pytest.approx(2.0, abs=1e-9)


def test_random_rect_unions_match_exact_oracle():
    rng = np.random.default_rng(123)
    for _ in range(8):
        n = int(rng.integers(3, 14))
        rects = []
        for _ in range(n):
            x0, y0 = rng.uniform(0, 8, 2)
            w, h = rng.uniform(0.5, 3, 2)
            rects.append((round(x0, 2), round(y0, 2),
                          round(x0 + w, 2), round(y0 + h, 2)))
        got = OV.area_of(OV.union_all([sq(*r) for r in rects]))
        assert got == pytest.approx(rect_union_area(rects), abs=1e-6)


def test_concave_union_matches_raster_oracle():
    L = [np.array([[0, 0], [3, 0], [3, 1], [1, 1], [1, 3], [0, 3], [0, 0]],
                  float)]
    got = OV.area_of(OV.union_all([L, sq(0.5, 0.5, 2, 2)]))
    assert got == pytest.approx(6.0, abs=1e-9)


def test_difference_of_concave_against_many():
    A = [sq(0, 0, 4, 4)]
    Bs = [sq(1, 1, 2, 2), sq(2.5, 2.5, 3.5, 3.5), sq(3, 0.5, 5, 1.5)]
    got = OV.area_of(OV.overlay(A, Bs, "difference"))
    # 16 - 1 - 1 - area((3,0.5)-(4,1.5)) = 16 - 1 - 1 - 1 = 13
    assert got == pytest.approx(13.0, abs=1e-9)


# ---------- pipeline level ----------

def _poly_tbl(rows):
    return pa.table({
        "fid": pa.array([r[0] for r in rows], pa.string()),
        "wkb": pa.array([wkb.dumps({"type": "Polygon", "rings": sq(*r[1])})
                         for r in rows], pa.binary()),
    })


def test_dissolve_union_groups(ray_session):
    import ray.data

    from gdal_ray.stages.vector import dissolve_union
    rows = []
    for g, rects in {"a": [(0, 0, 1, 1), (0.5, 0, 1.5, 1)],
                     "b": [(10, 10, 11, 11), (12, 12, 13, 13)]}.items():
        for i, r in enumerate(rects):
            rows.append({"category": g,
                         "wkb": wkb.dumps({"type": "Polygon",
                                           "rings": sq(*r)})})
    ds = ray.data.from_items(rows)
    out = {r["category"]: r for r in
           ds.groupby("category").map_groups(dissolve_union,
                                             batch_format="pyarrow").take_all()}
    assert out["a"]["n_parts"] == 1
    assert out["a"]["total_area"] == pytest.approx(1.5, abs=1e-9)
    assert out["b"]["n_parts"] == 2
    assert out["b"]["total_area"] == pytest.approx(2.0, abs=1e-9)


def test_layer_erase_union_identity(ray_session):
    import ray.data

    from gdal_ray.pipelines import layer_algebra as LA
    # A: two rects; B: one rect overlapping the first only
    A = ray.data.from_arrow(_poly_tbl([("a1", (0, 0, 2, 2)),
                                       ("a2", (5, 5, 6, 6))]))
    B = ray.data.from_arrow(_poly_tbl([("b1", (1, 1, 3, 3))]))
    er = LA.layer_erase(A, B, a_id_col="fid", b_id_col="fid").take_all()
    er = {r["a_id"]: r for r in er}
    assert er["a1"]["piece_area"] == pytest.approx(3.0, abs=1e-9)  # 4 - 1
    assert er["a2"]["piece_area"] == pytest.approx(1.0, abs=1e-9)  # untouched

    un = LA.layer_union(A, B, a_id_col="fid", b_id_col="fid").take_all()
    total = sum(r["piece_area"] for r in un)
    # union coverage = rect_union(A ∪ B) = 4 + 1 + (4-1) ... exact: A1∪B1∪A2
    assert total == pytest.approx(rect_union_area(
        [(0, 0, 2, 2), (5, 5, 6, 6), (1, 1, 3, 3)]), abs=1e-9)
    kinds = {(r["a_id"] != "-", r["b_id"] != "-") for r in un}
    assert kinds == {(True, True), (True, False), (False, True)}

    ident = LA.layer_identity(A, B, a_id_col="fid", b_id_col="fid").take_all()
    total = sum(r["piece_area"] for r in ident)
    assert total == pytest.approx(5.0, abs=1e-9)  # area of A only

    sym = LA.layer_symdifference(A, B, a_id_col="fid", b_id_col="fid").take_all()
    assert sum(r["piece_area"] for r in sym) == pytest.approx(
        3.0 + 1.0 + 3.0, abs=1e-9)  # a1-rem + a2 + b1-rem

    upd = LA.layer_update(A, B, a_id_col="fid", b_id_col="fid").take_all()
    assert sum(r["piece_area"] for r in upd) == pytest.approx(
        3.0 + 1.0 + 4.0, abs=1e-9)  # a-rem pieces + whole B


def test_make_valid_full_pipeline(ray_session):
    from gdal_ray.stages.vector import make_valid_full
    bow = wkb.dumps({"type": "Polygon", "rings": [np.array(
        [[0, 0], [2, 2], [2, 0], [0, 2], [0, 0]], float)]})
    good = wkb.dumps({"type": "Polygon", "rings": sq(0, 0, 1, 1)})
    t = pa.table({"wkb": pa.array([bow, good], pa.binary())})
    out = make_valid_full(t)
    fixed = wkb.as_polygons(wkb.loads(out.column("wkb")[0].as_py()))
    assert len(fixed) == 2  # bowtie split into two triangles
    assert sum(geom.polygon_area(r) for r in fixed) == pytest.approx(2.0, abs=1e-9)
    keep = wkb.as_polygons(wkb.loads(out.column("wkb")[1].as_py()))
    assert len(keep) == 1
    assert geom.polygon_area(keep[0]) == pytest.approx(1.0, abs=1e-9)


def test_check_and_clean_coverage(ray_session):
    import ray.data

    from gdal_ray.pipelines import layer_algebra as LA
    # three rects: 1 overlaps 2; 3 disjoint
    layer = ray.data.from_arrow(_poly_tbl([
        ("f1", (0, 0, 2, 2)), ("f2", (1, 1, 3, 3)), ("f3", (10, 10, 11, 11))]))
    bad = LA.check_coverage(layer).take_all()
    assert len(bad) == 1
    assert (bad[0]["a_id"], bad[0]["b_id"]) == ("f1", "f2")
    assert bad[0]["overlap_area"] == pytest.approx(1.0, abs=1e-9)

    cleaned = {r["fid"]: r for r in LA.clean_coverage(layer).take_all()}
    assert cleaned["f1"]["area"] == pytest.approx(4.0, abs=1e-9)  # keeps overlap
    assert cleaned["f2"]["area"] == pytest.approx(3.0, abs=1e-9)  # loses it
    assert cleaned["f3"]["area"] == pytest.approx(1.0, abs=1e-9)
    # post-clean: coverage is overlap-free
    cleaned_ds = ray.data.from_items(
        [{"fid": r["fid"], "wkb": r["wkb"]} for r in cleaned.values()])
    assert LA.check_coverage(cleaned_ds).count() == 0
