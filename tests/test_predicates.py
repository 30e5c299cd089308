"""DE-9IM-style corner cases for the full binary predicate set
(ogr/ogrgeometry.cpp:6006-6406 Touches/Overlaps/Disjoint/Equals)."""

import numpy as np
import pytest

from gdal_ray.core import geom


def sq(x0, y0, x1, y1):
    return [np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]],
                     dtype=np.float64)]


CASES = [
    (sq(0, 0, 1, 1), sq(2, 2, 3, 3), "disjoint"),
    (sq(0, 0, 1, 1), sq(1, 0, 2, 1), "touches"),      # shared edge
    (sq(0, 0, 1, 1), sq(1, 1, 2, 2), "touches"),      # shared corner
    (sq(0, 0, 1, 1), sq(1, 0.25, 2, 0.75), "touches"),  # partial shared edge
    (sq(0, 0, 2, 2), sq(1, 1, 3, 3), "overlaps"),
    (sq(0, 0, 4, 4), sq(1, 1, 2, 2), "contains"),
    (sq(1, 1, 2, 2), sq(0, 0, 4, 4), "within"),
    (sq(0, 0, 2, 2), sq(0, 0, 2, 2), "equals"),
    # B inside the hole of A -> boundaries don't meet, interiors don't meet
    (sq(0, 0, 5, 5) + [np.array([[1, 1], [1, 4], [4, 4], [4, 1], [1, 1]],
                                float)],
     sq(2, 2, 3, 3), "disjoint"),
    # B exactly fills the hole of A -> touches along the hole ring
    (sq(0, 0, 5, 5) + [np.array([[1, 1], [1, 4], [4, 4], [4, 1], [1, 1]],
                                float)],
     sq(1, 1, 4, 4), "touches"),
]


@pytest.mark.parametrize("a,b,expect", CASES)
def test_polygon_relate_matrix(a, b, expect):
    assert geom.polygon_relate(a, b) == expect
    # symmetry of the symmetric relations
    if expect in ("disjoint", "touches", "overlaps", "equals"):
        assert geom.polygon_relate(b, a) == expect
    elif expect == "contains":
        assert geom.polygon_relate(b, a) == "within"


def test_named_predicates_consistent():
    a, b = sq(0, 0, 1, 1), sq(1, 0, 2, 1)
    assert geom.polygons_touch(a, b)
    assert not geom.polygons_overlap(a, b)
    assert not geom.polygons_disjoint(a, b)
    assert not geom.polygons_equal(a, b)


def test_poly_poly_join_touches_predicate(ray_session):
    import pyarrow as pa
    import ray.data

    from gdal_ray.core import wkb
    from gdal_ray.pipelines.spatial_join import polygon_polygon_join
    A = ray.data.from_arrow(pa.table({
        "image_id": pa.array(["a0", "a1"]),
        "wkb": pa.array([wkb.box(0, 0, 1, 1), wkb.box(10, 10, 11, 11)],
                        pa.binary())}))
    B = ray.data.from_arrow(pa.table({
        "poly_id": pa.array(["b0", "b1"]),
        "wkb": pa.array([wkb.box(1, 0, 2, 1),      # touches a0
                         wkb.box(10.5, 10.5, 12, 12)],  # overlaps a1
                        pa.binary())}))
    touch = {(r["image_id"], r["poly_id"]) for r in
             polygon_polygon_join(A, B, predicate="touches").take_all()}
    assert touch == {("a0", "b0")}
    over = {(r["image_id"], r["poly_id"]) for r in
            polygon_polygon_join(A, B, predicate="overlaps").take_all()}
    assert over == {("a1", "b1")}
