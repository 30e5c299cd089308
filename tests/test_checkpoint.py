"""Checkpoint/resume: manifest store semantics + resumable tile sink."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from gdal_ray.state.checkpoint import CheckpointStore


def test_manifest_roundtrip(tmp_path):
    s = CheckpointStore(str(tmp_path))
    assert s.finished_partitions() == set()
    s.commit_partition("p1", 10, 20, 5, "runA")
    s.commit_partition("p2", 30, 40, 7, "runA")
    assert s.finished_partitions() == {"p1", "p2"}
    m = s.metrics()
    assert m.num_rows == 2
    assert sorted(m.column("row_count").to_pylist()) == [5, 7]
    # idempotent overwrite of the same partition id
    s.commit_partition("p1", 10, 20, 5, "runB")
    assert s.finished_partitions() == {"p1", "p2"}


@pytest.mark.usefixtures("ray_session")
def test_resumable_tile_sink(tmp_path):
    import ray

    from gdal_ray.core import fixtures
    from gdal_ray.pipelines import tiling

    images = ray.data.from_arrow(fixtures.images_table(10))
    tiles = tiling.base_tiles(images, zoom=8, concurrency=2).materialize()
    n_total = tiles.count()
    out = str(tmp_path / "tiles")

    n1 = tiling.write_tiles_resumable(tiles, out, run_id="r1")
    assert n1 == n_total
    # second run: everything skipped
    n2 = tiling.write_tiles_resumable(tiles, out, run_id="r2")
    assert n2 == 0
    # data on disk complete and readable
    import glob
    files = glob.glob(out + "/tiles-*.parquet")
    got = sum(pq.read_table(f).num_rows for f in files)
    assert got == n_total
    # partial-failure simulation: delete one manifest entry -> only that
    # partition is rewritten
    s = CheckpointStore(out)
    done = sorted(s.finished_partitions())
    import os
    os.remove(os.path.join(out, "manifest", f"part-{done[0]}.parquet"))
    n3 = tiling.write_tiles_resumable(tiles, out, run_id="r3")
    assert 0 < n3 < n_total
