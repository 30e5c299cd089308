"""Layer intersection vs closed-form / brute-force oracles."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.core import fixtures, geom, wkb
from gdal_ray.pipelines.layer_algebra import layer_intersection
from gdal_ray.stages.vector import clip_to_convex


def test_clip_to_convex_triangle():
    square = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=float)
    tri = np.array([[5, -5], [15, 5], [5, 15], [5, -5]], dtype=float)
    out = clip_to_convex([square], tri)
    assert out is not None
    # intersection of square with the right-pointing triangle: area by grid
    xs, ys = np.meshgrid(np.linspace(0, 10, 400), np.linspace(0, 10, 400))
    in_tri = geom.points_in_ring(xs.ravel(), ys.ravel(), tri)
    expect = in_tri.mean() * 100.0
    assert abs(geom.polygon_area(out) - expect) < 0.3
    # clipper orientation independence
    out2 = clip_to_convex([square], tri[::-1].copy())
    assert abs(geom.polygon_area(out2) - geom.polygon_area(out)) < 1e-9


def test_clip_to_convex_with_hole():
    outer = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=float)
    hole = np.array([[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]], dtype=float)
    clip = np.array([[2, 2], [12, 2], [12, 8], [2, 8], [2, 2]], dtype=float)
    out = clip_to_convex([outer, hole], clip)
    # area = (8×6) − (2×2 hole fully inside clip) = 48 − 4
    assert abs(geom.polygon_area(out) - 44.0) < 1e-9


@pytest.mark.usefixtures("ray_session")
def test_layer_intersection_rect_oracle():
    import ray
    # layer a: 6 rects; layer b: 3 overlapping rects (convex)
    def rect_tbl(specs, idc):
        return pa.table({
            idc: pa.array([s[0] for s in specs]),
            "wkb": pa.array([wkb.box(*s[1]) for s in specs], pa.binary()),
        })
    a = rect_tbl([("a0", (0, 0, 10, 10)), ("a1", (20, 0, 30, 10)),
                  ("a2", (-50, -50, -40, -40)), ("a3", (5, 5, 25, 8)),
                  ("a4", (100, 60, 110, 70)), ("a5", (0.5, 0.5, 1.5, 1.5))], "a_id")
    b = rect_tbl([("b0", (5, 5, 22, 22)), ("b1", (-45, -45, -42, -41)),
                  ("b2", (105, 65, 120, 80))], "b_id")
    out = layer_intersection(ray.data.from_arrow(a), ray.data.from_arrow(b)).take_all()
    got = {(r["a_id"], r["b_id"]): r["piece_area"] for r in out}
    # rect∩rect closed-form oracle
    specs_a = dict(a0=(0, 0, 10, 10), a1=(20, 0, 30, 10), a2=(-50, -50, -40, -40),
                   a3=(5, 5, 25, 8), a4=(100, 60, 110, 70), a5=(0.5, 0.5, 1.5, 1.5))
    specs_b = dict(b0=(5, 5, 22, 22), b1=(-45, -45, -42, -41), b2=(105, 65, 120, 80))
    expect = {}
    for ak, (ax0, ay0, ax1, ay1) in specs_a.items():
        for bk, (bx0, by0, bx1, by1) in specs_b.items():
            w = min(ax1, bx1) - max(ax0, bx0)
            h = min(ay1, by1) - max(ay0, by0)
            if w > 0 and h > 0:
                expect[(ak, bk)] = w * h
    assert set(got) == set(expect)
    for k in expect:
        assert abs(got[k] - expect[k]) < 1e-9
    # exactly-once even for pairs spanning many cells
    assert len(out) == len(got)


@pytest.mark.usefixtures("ray_session")
def test_layer_intersection_concave_subject():
    """Subject layer may be concave (stars from fixtures); clip layer convex
    rect — piece areas match a Monte-Carlo oracle."""
    import ray
    polys = fixtures.polygons_table(9)  # includes concave stars
    rect = pa.table({"b_id": ["w"], "wkb": pa.array([wkb.box(-180, -70, 180, 70)], pa.binary())})
    out = layer_intersection(
        ray.data.from_arrow(pa.table({"a_id": polys.column("poly_id"),
                                      "wkb": polys.column("wkb")})),
        ray.data.from_arrow(rect)).take_all()
    assert len(out) >= 7  # nearly all polygons intersect the big window
    for r in out:
        rings = wkb.as_polygons(wkb.loads(polys.column("wkb")[
            polys.column("poly_id").to_pylist().index(r["a_id"])].as_py()))[0]
        full = geom.polygon_area(rings)
        assert r["piece_area"] <= full + 1e-9


# ---------- simplify-coverage ----------

def _densify_ring(ring, k=6):
    out = []
    for i in range(len(ring) - 1):
        a = np.array(ring[i], float)
        b = np.array(ring[i + 1], float)
        for t in np.linspace(0, 1, k, endpoint=False):
            out.append(a + t * (b - a))
    out.append(np.array(ring[-1], float))
    return np.array(out)


def test_simplify_coverage_core_exact_on_collinear():
    from gdal_ray.core.coverage_simplify import simplify_coverage
    faces = {}
    for gy in range(3):
        for gx in range(3):
            ring = [(gx, gy), (gx + 1, gy), (gx + 1, gy + 1), (gx, gy + 1),
                    (gx, gy)]
            faces[f"f{gx}{gy}"] = [[_densify_ring(ring)]]
    out = simplify_coverage(faces, tolerance=1e-6)
    for fid, polys in out.items():
        assert len(polys[0][0]) == 5          # back to a plain square
        a = polys[0][0]
        s = 0.5 * abs(np.sum(a[:-1, 0] * a[1:, 1] - a[1:, 0] * a[:-1, 1]))
        assert abs(s - 1.0) < 1e-12           # area exactly preserved


def test_simplify_coverage_op_stays_clean(ray_session):
    """Post-simplify coverage passes check-coverage with zero overlaps and
    loses no area (the VERDICT 'done' criterion)."""
    import ray.data

    from gdal_ray.core import wkb as W
    from gdal_ray.pipelines.layer_algebra import check_coverage, simplify_coverage
    rows = {"fid": [], "wkb": []}
    for gy in range(2):
        for gx in range(4):
            ring = [(gx, gy), (gx + 1, gy), (gx + 1, gy + 1), (gx, gy + 1),
                    (gx, gy)]
            rows["fid"].append(f"c{gx}{gy}")
            rows["wkb"].append(W.dumps({"type": "Polygon",
                                        "rings": [_densify_ring(ring)]}))
    layer = ray.data.from_arrow(pa.table({
        "fid": pa.array(rows["fid"]), "wkb": pa.array(rows["wkb"], pa.binary())}))
    simp = simplify_coverage(layer, tolerance=1e-6).materialize()
    got = simp.take_all()
    assert len(got) == 8
    area = 0.0
    for r in got:
        for rings in W.as_polygons(W.loads(r["wkb"])):
            a = rings[0]
            area += 0.5 * abs(np.sum(a[:-1, 0] * a[1:, 1] - a[1:, 0] * a[:-1, 1]))
    assert abs(area - 8.0) < 1e-9
    overlaps = check_coverage(simp).take_all()
    assert overlaps == []


def test_simplify_coverage_cell_partitioned(ray_session):
    """Bbox-halo cell-partitioned scale path: faces fitting a 2×2 cell
    block simplify EXACTLY like the global pass — including faces that
    straddle cell borders — and the result is a clean full-area coverage.
    Fixture spans ≥4 owner cells (the multi-group 'done' criterion)."""
    import ray.data

    from gdal_ray.core import cells as C
    from gdal_ray.core import wkb as W
    from gdal_ray.pipelines.layer_algebra import check_coverage, simplify_coverage
    # 12×2 grid of unit squares from x=3..15, y=2..4: crosses the level-7
    # x-cell borders at 5.625, 8.4375, 11.25 and 14.0625 and the y-border
    # at 2.8125, so faces span multiple owner cells (but all fit 2×2)
    rows = {"fid": [], "wkb": []}
    owners = set()
    for gy0 in range(2):
        for gx0 in range(12):
            gx, gy = gx0 + 3, gy0 + 2
            ring = [(gx, gy), (gx + 1, gy), (gx + 1, gy + 1), (gx, gy + 1),
                    (gx, gy)]
            rows["fid"].append(f"c{gx:02d}{gy}")
            rows["wkb"].append(W.dumps({"type": "Polygon",
                                        "rings": [_densify_ring(ring)]}))
            cx, cy = C.cell_xy(gx - 1e-7, gy + 1 + 1e-7, 7)  # bbox min corner
            owners.add((int(cx), int(cy)))
    assert len(owners) >= 4                   # genuinely multi-group fixture
    layer = ray.data.from_arrow(pa.table({
        "fid": pa.array(rows["fid"]), "wkb": pa.array(rows["wkb"], pa.binary())}))
    simp = simplify_coverage(layer, tolerance=1e-6, level=7).materialize()
    got = {r["fid"]: r["wkb"] for r in simp.take_all()}
    assert len(got) == 24                     # every face emitted exactly once
    # global==cell-mode equality, byte-for-byte per face
    ref = {r["fid"]: r["wkb"]
           for r in simplify_coverage(layer, tolerance=1e-6).take_all()}
    assert got == ref
    area = 0.0
    for fid, data in got.items():
        for rings in W.as_polygons(W.loads(data)):
            a = rings[0]
            area += 0.5 * abs(np.sum(a[:-1, 0] * a[1:, 1] - a[1:, 0] * a[:-1, 1]))
            assert len(a) == 5                # fully simplified everywhere
    assert abs(area - 24.0) < 1e-9
    overlaps = check_coverage(simp).take_all()
    assert overlaps == []


def test_simplify_coverage_oversized_face_pinned(ray_session):
    """A face spanning more than a 2×2 cell block is pinned (all vertices
    kept) and its small neighbours still simplify consistently — the
    coverage stays clean."""
    import ray.data

    from gdal_ray.core import wkb as W
    from gdal_ray.pipelines.layer_algebra import check_coverage, simplify_coverage
    # big face 0..12 in x (> 2 cells of 2.8125°) + one small neighbour on top
    big = [(0.0, 0.0), (12.0, 0.0), (12.0, 1.0), (0.0, 1.0), (0.0, 0.0)]
    small = [(0.0, 1.0), (1.0, 1.0), (1.0, 2.0), (0.0, 2.0), (0.0, 1.0)]
    layer = ray.data.from_arrow(pa.table({
        "fid": pa.array(["big", "small"]),
        "wkb": pa.array([W.dumps({"type": "Polygon",
                                  "rings": [_densify_ring(big)]}),
                         W.dumps({"type": "Polygon",
                                  "rings": [_densify_ring(small)]})],
                        pa.binary())}))
    simp = simplify_coverage(layer, tolerance=1e-6, level=7).materialize()
    got = {r["fid"]: r["wkb"] for r in simp.take_all()}
    assert len(got) == 2
    big_ring = W.as_polygons(W.loads(got["big"]))[0][0]
    assert len(big_ring) == len(_densify_ring(big))   # pinned: all kept
    # small face keeps the shared-chain vertices (consistency with the
    # pinned side) but the coverage is still overlap-free and full-area
    area = 0.0
    for data in got.values():
        for rings in W.as_polygons(W.loads(data)):
            a = rings[0]
            area += 0.5 * abs(np.sum(a[:-1, 0] * a[1:, 1] - a[1:, 0] * a[:-1, 1]))
    assert abs(area - 13.0) < 1e-9
    overlaps = check_coverage(simp).take_all()
    assert overlaps == []
