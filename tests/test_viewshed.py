"""Viewshed (Wang reference-plane, alg/viewshed/viewshed.cpp semantics)
against exact line-of-sight oracles on axis rays."""

import numpy as np
import pyarrow as pa

from gdal_ray.core import codecs
from gdal_ray.stages.dem import viewshed, viewshed_mask


def test_wall_shadow():
    dem = np.zeros((21, 21))
    dem[:, 12] = 10.0
    m = viewshed_mask(dem, 5, 10, obs_height=2.0)
    assert m[10, 11] == 255 and m[10, 12] == 255   # front + wall top visible
    assert (m[10, 13:] == 0).all()                 # everything behind hidden


def test_monotone_slopes_fully_visible():
    dem = np.tile(np.arange(21.0), (21, 1))
    assert (viewshed_mask(dem, 0, 10, obs_height=2.0) == 255).all()
    assert (viewshed_mask(dem[:, ::-1].copy(), 0, 10, obs_height=2.0) == 255).all()


def test_peak_shadow_along_ray():
    dem = np.zeros((15, 15))
    dem[7, 7] = 8.0
    m = viewshed_mask(dem, 7, 0, obs_height=1.0)
    assert m[7, 7] == 255
    assert m[10, 7] == 0 and m[14, 7] == 0   # occluded behind the peak
    assert m[10, 10] == 255                  # off-ray unaffected


def test_axis_ray_matches_exact_los():
    rng = np.random.default_rng(3)
    f = rng.normal(0, 1, (31,)).cumsum()
    dem = np.tile(f, (5, 1))
    m = viewshed_mask(dem, 0, 2, obs_height=2.0)
    oz = dem[2, 0] + 2.0
    for x in range(1, 31):
        prior = max(((dem[2, k] - oz) / k for k in range(1, x)),
                    default=-np.inf)
        exact = (dem[2, x] - oz) / x >= prior - 1e-12
        assert (m[2, x] == 255) == exact


def test_viewshed_stage(ray_session):
    dem = np.zeros((16, 16), dtype=np.float32)
    dem[:, 10] = 5.0
    t = pa.table({
        "image_id": pa.array(["d0"]),
        "bytes": pa.array([codecs.encode_raw(dem)], pa.binary()),
        "fmt": pa.array(["raw"]),
        "geotransform": pa.array([[0.0, 1.0, 0.0, 0.0, 0.0, -1.0]],
                                 pa.list_(pa.float64(), 6)),
        "obs_x": pa.array([2], pa.int32()),
        "obs_y": pa.array([8], pa.int32()),
    })
    out = viewshed(t, obs_height=2.0)
    mask = codecs.decode(out.column("bytes")[0].as_py(), "raw")
    assert mask[8, 2] == 255 and mask[8, 10] == 255
    assert (mask[8, 11:] == 0).all()
