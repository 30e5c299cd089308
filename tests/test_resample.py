"""Resampling kernels vs closed-form identities (the reference's own test
style: golden arrays + max-diff pins, autotest/alg/warp.py:55-70)."""

import numpy as np
import pytest

from gdal_ray.core import resample as R


@pytest.mark.parametrize("method", ["near", "bilinear", "cubic", "lanczos", "cubicspline"])
def test_identity_sampling(method):
    """Sampling exactly at pixel centers reproduces the image (except
    cubicspline, which is a smoothing B-spline, and edges for wide kernels)."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, size=(12, 15)).astype(np.float64)
    sx, sy = np.meshgrid(np.arange(15) + 0.5, np.arange(12) + 0.5)
    vals, valid = R.sample(img, sx, sy, method=method)
    assert valid.all()
    if method == "cubicspline":
        # smoothing (non-interpolating) kernel: bounded deviation on noise,
        # and exact partition-of-unity on a constant image
        assert np.abs(vals - img).mean() < 64
        const, cvalid = R.sample(np.full_like(img, 7.0), sx, sy, method=method)
        np.testing.assert_allclose(const, 7.0, atol=1e-9)
    elif method in ("near", "bilinear"):
        np.testing.assert_allclose(vals, img, atol=1e-9)
    else:
        # interpolating kernels are exact at nodes away from the border
        np.testing.assert_allclose(vals[3:-3, 3:-3], img[3:-3, 3:-3], atol=1e-9)


def test_kernel_weights_pinned():
    # GWKCubic (Catmull-Rom): w(0)=1, w(1)=0, w(0.5)=0.5625
    assert R.kernel_weight("cubic", np.array([0.0]))[0] == 1.0
    assert abs(R.kernel_weight("cubic", np.array([0.5]))[0] - 0.5625) < 1e-12
    assert R.kernel_weight("cubic", np.array([1.0]))[0] == 0.0
    assert abs(R.kernel_weight("cubic", np.array([1.5]))[0] + 0.0625) < 1e-12
    # bilinear triangle
    assert R.kernel_weight("bilinear", np.array([0.25]))[0] == 0.75
    # lanczos at 0 and integer zeros
    assert R.kernel_weight("lanczos", np.array([0.0]))[0] == 1.0
    assert abs(R.kernel_weight("lanczos", np.array([1.0]))[0]) < 1e-12
    assert abs(R.kernel_weight("lanczos", np.array([2.0]))[0]) < 1e-12
    # bspline partition: w(-1)+w(0)+w(1) = 1/6+4/6+1/6 = 1
    w = R.kernel_weight("cubicspline", np.array([-1.0, 0.0, 1.0]))
    assert abs(w.sum() - 1.0) < 1e-12


@pytest.mark.parametrize("method,atol", [("bilinear", 1e-8), ("cubic", 1e-8), ("lanczos", 0.5)])
def test_linear_ramp_preserved(method, atol):
    """Bilinear/cubic (Catmull-Rom) have linear precision — exact on a ramp.
    Lanczos is interpolating at nodes but not linear-exact between them
    (GDAL's GWKLanczosSinc behaves the same); bounded small deviation."""
    xx = np.arange(20, dtype=np.float64)
    img = np.tile(xx * 10.0, (20, 1))
    sx, sy = np.meshgrid(np.linspace(4.0, 16.0, 33), np.linspace(4.0, 16.0, 33))
    vals, valid = R.sample(img, sx, sy, method=method)
    expect = (sx - 0.5) * 10.0
    np.testing.assert_allclose(vals, expect, atol=atol)


def test_nodata_renormalization():
    img = np.full((8, 8), 100.0)
    img[4, 4] = -1.0  # nodata
    vals, valid = R.sample(img, np.array([[4.5]]), np.array([[4.5]]),
                           method="bilinear", nodata=-1.0)
    assert not valid[0, 0] or vals[0, 0] != -1.0
    # neighborhood sample: half-covered by nodata still returns 100
    vals, valid = R.sample(img, np.array([[4.0]]), np.array([[4.0]]),
                           method="bilinear", nodata=-1.0)
    assert valid[0, 0]
    assert abs(vals[0, 0] - 100.0) < 1e-9


def test_out_of_bounds_invalid():
    img = np.ones((4, 4))
    vals, valid = R.sample(img, np.array([-3.0, 2.0]), np.array([2.0, 2.0]), method="bilinear")
    assert not valid[0] and valid[1]


def test_resize_average_integer_factor():
    img = np.arange(16, dtype=np.float64).reshape(4, 4)
    out = R.resize(img, 2, 2, method="average")
    expect = np.array([[img[:2, :2].mean(), img[:2, 2:].mean()],
                       [img[2:, :2].mean(), img[2:, 2:].mean()]])
    np.testing.assert_allclose(out, expect)


def test_resize_average_nodata():
    img = np.array([[10.0, -1.0], [10.0, 10.0]])
    out = R.resize(img, 1, 1, method="average", nodata=-1.0)
    np.testing.assert_allclose(out, [[10.0]])


def test_downsample2x_uint8_rounding():
    img = np.array([[1, 2], [2, 2]], dtype=np.uint8)
    out = R.downsample2x(img)
    assert out.shape == (1, 1)
    assert out[0, 0] == 2  # 1.75 rounds to 2


def test_warp_identity_transform():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 255, size=(30, 40), dtype=np.uint8)
    out = R.warp(img, 40, 30, lambda px, py: (px, py), method="near", mesh_step=8)
    np.testing.assert_array_equal(out, img)
    out2 = R.warp(img, 40, 30, lambda px, py: (px, py), method="bilinear", mesh_step=1)
    np.testing.assert_array_equal(out2, img)


def test_warp_shift_affine_via_mesh():
    """Affine shift through the coarse mesh is exact (mesh interp of an
    affine map is the map itself)."""
    img = np.zeros((20, 20))
    img[10, 10] = 255.0
    out = R.warp(img, 20, 20, lambda px, py: (px - 3.0, py + 2.0),
                 method="near", mesh_step=6, out_dtype=np.float64)
    assert out[8, 13] == 255.0


def test_psnr():
    a = np.zeros((10, 10)); b = np.zeros((10, 10))
    assert R.psnr(a, b) == float("inf")
    b[0, 0] = 10.0
    assert 35 < R.psnr(a, b) < 60
