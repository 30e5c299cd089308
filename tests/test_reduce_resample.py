"""Closed-form pins for the non-kernel reduce resamplers
(alg/gdalwarper.h:35-69 GRA_Mode/Min/Max/Med/Q1/Q3/Sum/RMS) and the
multi-dtype GRW2 raw payloads (gcore/gdal.h type lattice)."""

import numpy as np
import pytest

from gdal_ray.core import codecs
from gdal_ray.core.resample import resize, resize_reduce


A4 = np.array([[1, 2, 3, 4],
               [5, 6, 7, 8],
               [9, 10, 11, 12],
               [13, 14, 15, 16]], dtype=np.uint8)


def test_order_stats_integer_factor():
    assert resize_reduce(A4, 2, 2, "min").tolist() == [[1, 3], [9, 11]]
    assert resize_reduce(A4, 2, 2, "max").tolist() == [[6, 8], [14, 16]]
    assert resize_reduce(A4, 2, 2, "median").tolist() == [[4, 6], [12, 14]]
    # q1/q3 of {1,2,5,6}: linear-interp 1.75 -> round 2; 5.25 -> 5
    assert resize_reduce(A4, 2, 2, "q1")[0, 0] == 2
    assert resize_reduce(A4, 2, 2, "q3")[0, 0] == 5


def test_mode_ties_break_to_smallest():
    b = np.array([[1, 1, 2], [1, 3, 3], [4, 4, 4]], dtype=np.uint8)
    assert resize_reduce(b, 1, 1, "mode")[0, 0] == 1  # 1 and 4 both 3x


def test_sum_is_sum_preserving_any_factor():
    rng = np.random.default_rng(3)
    a = rng.uniform(0, 50, (7, 5)).astype(np.float64)
    for ow, oh in ((2, 3), (3, 2), (5, 7), (1, 1)):
        out = resize_reduce(a, ow, oh, "sum")
        assert out.sum() == pytest.approx(a.sum(), rel=1e-12)


def test_rms_closed_form():
    a = np.array([[3.0, 4.0], [0.0, 0.0]])
    assert resize_reduce(a, 1, 1, "rms")[0, 0] == pytest.approx(2.5)


def test_nodata_excluded():
    a = np.array([[255, 2], [4, 6]], dtype=np.uint8)
    assert resize_reduce(a, 1, 1, "min", nodata=255)[0, 0] == 2
    assert resize_reduce(a, 1, 1, "max", nodata=255)[0, 0] == 6


def test_resize_dispatches_reduce_stats():
    assert resize(A4, 2, 2, method="min").tolist() == [[1, 3], [9, 11]]


@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.uint16, np.int32,
                                   np.float32, np.float64])
def test_grw2_roundtrip(dtype):
    rng = np.random.default_rng(11)
    a = (rng.uniform(-1000, 1000, (9, 7))).astype(dtype)
    back = codecs.decode(codecs.encode(a, "raw"), "raw")
    assert back.dtype == a.dtype
    np.testing.assert_array_equal(back, a)


def test_grw2_multiband_float():
    a = np.arange(24, dtype=np.float32).reshape(2, 4, 3) / 7.0
    back = codecs.decode_raw(codecs.encode_raw(a))
    np.testing.assert_array_equal(back, a)


def test_uint8_stays_grw1():
    a = np.arange(12, dtype=np.uint8).reshape(3, 4)
    assert codecs.encode_raw(a)[:4] == b"GRW1"
