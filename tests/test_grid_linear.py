"""gdal_grid linear (TIN barycentric) — closed-form oracles.

Reference semantics: alg/gdalgrid.cpp GGA_Linear + alg/delaunay.c (the
triangulation-then-barycentric pipeline); linear fields are reproduced
exactly by ANY Delaunay triangulation, which is what these pins use."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.core.delaunay import barycentric_interpolate, delaunay_triangulation


def test_lattice_triangulation_covers_hull():
    xx, yy = np.meshgrid(np.arange(6.0), np.arange(5.0))
    pts = np.column_stack([xx.ravel(), yy.ravel()])
    tris = delaunay_triangulation(pts)
    assert len(tris) == 5 * 4 * 2  # two triangles per lattice cell
    rng = np.random.default_rng(1)
    qx = rng.random(300) * 5
    qy = rng.random(300) * 4
    v = 2 * pts[:, 0] + 3 * pts[:, 1] + 7
    val, inside = barycentric_interpolate(tris, pts, v, qx, qy)
    assert inside.all()
    assert np.abs(val - (2 * qx + 3 * qy + 7)).max() < 1e-9


def test_random_cloud_linear_reproduction():
    rng = np.random.default_rng(9)
    pts = rng.random((60, 2)) * 20
    v = -1.5 * pts[:, 0] + 0.25 * pts[:, 1] + 3
    tris = delaunay_triangulation(pts)
    # queries strictly inside: convex combinations of point triples
    w = rng.dirichlet(np.ones(3), size=200)
    sel = rng.integers(0, 60, (200, 3))
    q = np.einsum("ij,ijk->ik", w, pts[sel])
    val, inside = barycentric_interpolate(tris, pts, v, q[:, 0], q[:, 1])
    assert inside.all()
    assert np.abs(val - (-1.5 * q[:, 0] + 0.25 * q[:, 1] + 3)).max() < 1e-9


def test_grid_linear_stage_with_fallback(ray_session):
    import ray.data

    from gdal_ray.pipelines.knn import grid_linear
    xx, yy = np.meshgrid(np.arange(4.0), np.arange(4.0))
    ref = np.column_stack([xx.ravel(), yy.ravel()])
    v = ref[:, 0] + 10 * ref[:, 1]
    q = pa.table({"point_id": pa.array(["in", "out"]),
                  "x": pa.array([1.5, 100.0]),
                  "y": pa.array([2.5, 100.0])})
    out = {r["point_id"]: r for r in
           grid_linear(ray.data.from_arrow(q), ref, v,
                       concurrency=1).take_all()}
    assert out["in"]["inside_tin"] is True or out["in"]["inside_tin"] == 1
    assert abs(out["in"]["linear_value"] - (1.5 + 25.0)) < 1e-9
    # outside the hull: nearest reference value (corner (3,3) -> 33)
    assert not out["out"]["inside_tin"]
    assert out["out"]["linear_value"] == 33.0


def test_grid_linear_driver_oracle(ray_session):
    import duckdb

    from gdal_ray.pipelines import relational as R
    sf = "/root/testdata/sf0.001"
    got = R.grid_linear_q(sf).to_pandas().sort_values("point_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW customer AS SELECT * FROM read_parquet('{sf}/customer.parquet')")
    exp = con.execute(R.SQL_GRID_LINEAR).df().sort_values("point_id").reset_index(drop=True)
    assert got["point_id"].tolist() == exp["point_id"].tolist()
    assert got["linear_value"].tolist() == exp["linear_value"].tolist()
    assert got["inside_tin"].all()
