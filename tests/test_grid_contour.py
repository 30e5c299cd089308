"""gdal_grid metrics variants + merged contour lines."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.core import geotransform as gtm
from gdal_ray.pipelines import knn as KNN
from gdal_ray.pipelines.polygonize import contour_lines


@pytest.mark.usefixtures("ray_session")
def test_grid_metrics_oracle():
    import ray
    ref_xy = np.array([[0.0, 0.0], [1.0, 0.0], [4.0, 0.0], [10.0, 10.0]])
    ref_v = np.array([10.0, 20.0, 50.0, 99.0])
    q = pa.table({"point_id": ["a", "b"], "x": [0.5, 8.0], "y": [0.0, 8.0]})
    out = {r["point_id"]: r for r in KNN.grid_metrics(
        ray.data.from_arrow(q), ref_xy, ref_v, radius=2.0, concurrency=1).take_all()}
    a = out["a"]
    # within radius 2 of (0.5, 0): points 0 and 1
    assert a["count"] == 2
    assert a["minimum"] == 10.0 and a["maximum"] == 20.0 and a["range"] == 10.0
    assert abs(a["average"] - 15.0) < 1e-12
    assert abs(a["average_distance"] - 0.5) < 1e-12
    assert a["nearest"] in (10.0, 20.0)  # both at distance 0.5; argmin picks first
    b = out["b"]
    assert b["count"] == 0 and np.isnan(b["average"])
    assert b["nearest"] == 99.0  # nearest unbounded


def test_contour_lines_circle_merges_to_ring():
    """Radial field: the iso-line at r=5 merges into one closed ring of
    length ≈ 2πr."""
    yy, xx = np.mgrid[0:32, 0:32]
    r = np.hypot(xx - 16, yy - 16)
    gt = gtm.north_up(0.0, 32.0, 1.0, 1.0)
    lines = contour_lines(r, gt, levels=[5.0])
    assert len(lines) == 1  # one merged ring (segments were ~40 pieces)
    lv, xy = lines[0]
    assert lv == 5.0
    seglen = np.hypot(*np.diff(xy, axis=0).T).sum()
    assert abs(seglen - 2 * np.pi * 5) / (2 * np.pi * 5) < 0.05
    # closed: endpoints meet
    assert np.allclose(xy[0], xy[-1], atol=1e-6)


def test_contour_lines_open_line():
    """Linear ramp: iso-line is one open straight line across the image."""
    xx = np.tile(np.arange(16, dtype=np.float64), (16, 1))
    gt = gtm.north_up(0.0, 16.0, 1.0, 1.0)
    lines = contour_lines(xx, gt, levels=[7.5])
    assert len(lines) == 1
    _, xy = lines[0]
    # level 7.5 crosses midway between pixel centers 7 and 8 → geo x = 8.0
    assert np.allclose(xy[:, 0], 8.0, atol=1e-9)
    assert xy[:, 1].max() - xy[:, 1].min() >= 14.0
