"""GCP polynomial / TPS transform oracles (alg/gdal_crs.cpp:358,
alg/gdal_tps.cpp:128): order-1 fits reproduce an affine exactly, TPS is
exact at every GCP, and warp-by-GCP equals warp-by-geotransform."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.core import codecs
from gdal_ray.core.gcp import (GCPPolynomialTransform, TPSTransform,
                               gcps_from_affine)


GT = (500.0, 2.0, 0.3, 800.0, -0.1, -1.5)


def _affine(gt, px, py):
    return gt[0] + px * gt[1] + py * gt[2], gt[3] + px * gt[4] + py * gt[5]


def test_order1_reproduces_affine_exactly():
    g = gcps_from_affine(GT, 64, 48, n=3)
    tr = GCPPolynomialTransform(g, order=1)
    px, py = np.meshgrid(np.linspace(0, 64, 7), np.linspace(0, 48, 5))
    gx, gy = tr.forward(px, py)
    ex, ey = _affine(GT, px, py)
    np.testing.assert_allclose(gx, ex, rtol=0, atol=1e-9)
    np.testing.assert_allclose(gy, ey, rtol=0, atol=1e-9)
    bx, by = tr.inverse(ex, ey)
    np.testing.assert_allclose(bx, px, rtol=0, atol=1e-9)
    np.testing.assert_allclose(by, py, rtol=0, atol=1e-9)


def test_order2_fits_quadratic_field():
    rng = np.random.default_rng(5)
    px = rng.uniform(0, 100, 40)
    py = rng.uniform(0, 100, 40)
    gx = 3.0 + 0.5 * px - 0.2 * py + 0.01 * px * py + 0.002 * px * px
    gy = -7.0 + 0.1 * px + 0.9 * py - 0.003 * py * py
    tr = GCPPolynomialTransform(np.column_stack([px, py, gx, gy]), order=2)
    fx, fy = tr.forward(px, py)
    np.testing.assert_allclose(fx, gx, rtol=1e-9)
    np.testing.assert_allclose(fy, gy, rtol=1e-9)


def test_order3_needs_ten_points():
    with pytest.raises(ValueError):
        GCPPolynomialTransform(np.zeros((9, 4)), order=3)


def test_tps_exact_at_gcps_and_affine_reproduction():
    rng = np.random.default_rng(9)
    px = rng.uniform(0, 50, 12)
    py = rng.uniform(0, 50, 12)
    gx, gy = _affine(GT, px, py)
    tr = TPSTransform(np.column_stack([px, py, gx, gy]))
    fx, fy = tr.forward(px, py)
    np.testing.assert_allclose(fx, gx, rtol=0, atol=1e-6)
    np.testing.assert_allclose(fy, gy, rtol=0, atol=1e-6)
    # affine data -> radial weights vanish -> exact everywhere
    qx, qy = np.meshgrid(np.linspace(5, 45, 4), np.linspace(5, 45, 4))
    ex, ey = _affine(GT, qx, qy)
    fx, fy = tr.forward(qx, qy)
    np.testing.assert_allclose(fx, ex, rtol=0, atol=1e-6)


def test_tps_bends_for_nonaffine_data():
    px = np.array([0.0, 10.0, 0.0, 10.0, 5.0])
    py = np.array([0.0, 0.0, 10.0, 10.0, 5.0])
    gx = px.copy()
    gy = py.copy()
    gx[4] = 7.0  # displaced center pin
    tr = TPSTransform(np.column_stack([px, py, gx, gy]))
    fx, _ = tr.forward(np.array([5.0]), np.array([5.0]))
    assert fx[0] == pytest.approx(7.0, abs=1e-6)
    fx, _ = tr.forward(np.array([0.0]), np.array([0.0]))
    assert fx[0] == pytest.approx(0.0, abs=1e-6)


def test_gcp_warp_stage_matches_identity(ray_session):
    from gdal_ray.stages.warp import GcpWarpStage
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (32, 32), dtype=np.uint8)
    gt = (10.0, 0.01, 0.0, 20.0, 0.0, -0.01)
    g = gcps_from_affine(gt, 32, 32, n=3)
    t = pa.table({
        "image_id": pa.array(["i0"]),
        "bytes": pa.array([codecs.encode_raw(img)], pa.binary()),
        "fmt": pa.array(["raw"]),
        "gcps": pa.array([g.ravel().tolist()], pa.list_(pa.float64())),
    })
    out = GcpWarpStage(order=1, method="bilinear")(t)
    warped = codecs.decode(out.column("bytes")[0].as_py(), "raw")
    assert warped.shape == (32, 32)
    # identity-grid warp: output equals input
    np.testing.assert_array_equal(warped, img)
    gt_out = out.column("geotransform")[0].as_py()
    assert gt_out[0] == pytest.approx(10.0, abs=1e-9)
    assert gt_out[3] == pytest.approx(20.0, abs=1e-9)


def test_gcp_warp_stage_tps(ray_session):
    from gdal_ray.stages.warp import GcpWarpStage
    img = np.arange(256, dtype=np.uint8).reshape(16, 16)
    gt = (0.0, 1.0, 0.0, 16.0, 0.0, -1.0)
    g = gcps_from_affine(gt, 16, 16, n=3)
    t = pa.table({
        "image_id": pa.array(["i0"]),
        "bytes": pa.array([codecs.encode_raw(img)], pa.binary()),
        "fmt": pa.array(["raw"]),
        "gcps": pa.array([g.ravel().tolist()], pa.list_(pa.float64())),
    })
    out = GcpWarpStage(transform="tps", method="near")(t)
    warped = codecs.decode(out.column("bytes")[0].as_py(), "raw")
    np.testing.assert_array_equal(warped, img)


def test_rpc_affine_equivalence_and_inverse():
    from gdal_ray.core.gcp import RPCTransform, rpc_from_affine
    gt = (10.0, 0.01, 0.0, 50.0, 0.0, -0.01)
    rpc = RPCTransform(rpc_from_affine(gt, lat0=50.0, lon0=10.0))
    lon = np.array([10.05, 10.2, 10.31])
    lat = np.array([49.9, 49.82, 49.75])
    px, py = rpc.forward(lon, lat)
    np.testing.assert_allclose(px, (lon - gt[0]) / gt[1], atol=1e-9)
    np.testing.assert_allclose(py, (lat - gt[3]) / gt[5], atol=1e-9)
    blon, blat = rpc.inverse(px, py)
    np.testing.assert_allclose(blon, lon, atol=1e-9)
    np.testing.assert_allclose(blat, lat, atol=1e-9)


def test_rpc_nonlinear_inverse_converges():
    from gdal_ray.core.gcp import RPCTransform, rpc_from_affine
    c = rpc_from_affine((10.0, 0.01, 0.0, 50.0, 0.0, -0.01),
                        lat0=50.0, lon0=10.0)
    c["SAMP_NUM_COEFF"][7] = 0.05   # L² distortion term
    c["LINE_NUM_COEFF"][8] = -0.03  # P² distortion term
    rpc = RPCTransform(c)
    lon = np.array([10.05, 10.2, 10.31])
    lat = np.array([49.9, 49.82, 49.75])
    px, py = rpc.forward(lon, lat)
    blon, blat = rpc.inverse(px, py)
    np.testing.assert_allclose(blon, lon, atol=1e-8)
    np.testing.assert_allclose(blat, lat, atol=1e-8)


# ---------- geolocation arrays (alg/gdaltransformer.cpp:2569) ----------

def test_geoloc_forward_exact_on_affine():
    """Bilinear interpolation of an affine field is exact everywhere."""
    import numpy as np

    from gdal_ray.core.gcp import GeolocTransform, geoloc_from_affine
    from gdal_ray.core import geotransform as gtm
    gt = (10.0, 0.25, 0.05, 50.0, -0.02, -0.5)
    gx, gy, kw = geoloc_from_affine(gt, 64, 48, step=4)
    tr = GeolocTransform(gx, gy, **kw)
    rng = np.random.default_rng(2)
    # stay inside the geoloc node hull: [0.5, 0.5+step*(n-1)]
    px = 0.5 + rng.random(200) * (4 * (gx.shape[1] - 1))
    py = 0.5 + rng.random(200) * (4 * (gx.shape[0] - 1))
    ex, ey = gtm.apply(gt, px, py)
    fx, fy = tr.forward(px, py)
    assert np.abs(fx - ex).max() < 1e-9
    assert np.abs(fy - ey).max() < 1e-9


def test_geoloc_inverse_roundtrip_affine_and_curved():
    import numpy as np

    from gdal_ray.core.gcp import GeolocTransform, geoloc_from_affine
    gt = (-5.0, 0.1, 0.0, 8.0, 0.0, -0.1)
    gx, gy, kw = geoloc_from_affine(gt, 40, 40, step=4)
    tr = GeolocTransform(gx, gy, **kw)
    rng = np.random.default_rng(3)
    px = 0.5 + rng.random(100) * 36
    py = 0.5 + rng.random(100) * 36
    fx, fy = tr.forward(px, py)
    ix, iy = tr.inverse(fx, fy)
    assert np.abs(ix - px).max() < 1e-6
    assert np.abs(iy - py).max() < 1e-6
    # curved grid (quadratic warp): roundtrip through Newton still converges
    jj, ii = np.meshgrid(np.arange(10.0), np.arange(10.0))
    cgx = jj + 0.002 * ii * ii
    cgy = ii - 0.001 * jj * jj
    ctr = GeolocTransform(cgx, cgy, pixel_step=4.0, line_step=4.0)
    px = 0.5 + rng.random(50) * 34
    py = 0.5 + rng.random(50) * 34
    fx, fy = ctr.forward(px, py)
    ix, iy = ctr.inverse(fx, fy)
    fx2, fy2 = ctr.forward(ix, iy)
    assert np.abs(fx2 - fx).max() < 1e-8
    assert np.abs(fy2 - fy).max() < 1e-8


def test_geoloc_warp_stage_matches_affine_warp(ray_session):
    """GeolocWarpStage over geoloc arrays sampled from an affine transform
    must reproduce the north-up warp of the same affine (same suggested
    grid, allclose pixels)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from gdal_ray.core import codecs
    from gdal_ray.core.gcp import geoloc_from_affine
    from gdal_ray.stages.warp import GeolocWarpStage
    rng = np.random.default_rng(11)
    img = rng.integers(0, 255, (40, 56), dtype=np.uint8)
    gt = (100.0, 0.01, 0.0, 20.0, 0.0, -0.01)
    gx, gy, kw = geoloc_from_affine(gt, 56, 40, step=4)
    row = pa.table({
        "image_id": ["g0"], "bytes": [codecs.encode_raw(img)], "fmt": ["raw"],
        "geoloc_x": [gx.tobytes()], "geoloc_y": [gy.tobytes()],
        "geoloc_gh": pa.array([gx.shape[0]], pa.int32()),
        "geoloc_gw": pa.array([gx.shape[1]], pa.int32()),
        "geoloc_step": pa.array([4.0], pa.float64()),
    })
    out = ray.data.from_arrow(row).map_batches(
        GeolocWarpStage, batch_format="pyarrow", concurrency=1).take_all()[0]
    assert out["w"] == 56
    got = codecs.decode(out["bytes"], "raw")
    # oracle: direct affine warp to the same grid
    from gdal_ray.core import geotransform as gtm
    from gdal_ray.core import resample
    inv = gtm.invert(gt)
    dst_gt = tuple(out["geotransform"])

    def dst_to_src(px, py):
        mx, my = gtm.apply(dst_gt, px, py)
        return gtm.apply(inv, mx, my)

    expect = resample.warp(img, out["w"], out["h"], dst_to_src,
                           method="bilinear", mesh_step=16)
    valid = (got > 0) & (expect > 0)
    diff = np.abs(got.astype(float) - expect.astype(float))[valid]
    assert diff.mean() < 1.0 and np.percentile(diff, 99) <= 2.0
