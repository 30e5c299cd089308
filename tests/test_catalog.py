"""Tile index, hive partition write, Hilbert-ordered sink, phash near-dup."""

import glob

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gdal_ray.core import fixtures
from gdal_ray.pipelines import catalog as C


@pytest.mark.usefixtures("ray_session")
def test_tile_index(ray_session):
    import ray
    ds = ray.data.from_arrow(fixtures.images_table(12))
    idx = C.build_tile_index(ds).take_all()
    assert len(idx) == 12
    for r in idx:
        assert r["minx"] < r["maxx"] and r["miny"] < r["maxy"]
        assert len(r["wkb"]) > 20


@pytest.mark.usefixtures("ray_session")
def test_write_partitioned_hive(tmp_path):
    import ray
    t = pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "cat": pa.array(["a", "b", None, "a"]),
    })
    C.write_partitioned(ray.data.from_arrow(t), str(tmp_path / "out"), ["cat"])
    dirs = sorted(p.split("/")[-1] for p in glob.glob(str(tmp_path / "out" / "*")))
    assert "cat=a" in dirs and "cat=b" in dirs
    assert any("__HIVE_DEFAULT_PARTITION__" in d for d in dirs)
    back = pq.read_table(str(tmp_path / "out"))
    assert back.num_rows == 4


@pytest.mark.usefixtures("ray_session")
def test_write_tiles_hilbert_ordering(tmp_path):
    import ray

    from gdal_ray.pipelines import tiling
    images = ray.data.from_arrow(fixtures.images_table(10))
    tiles = tiling.base_tiles(images, zoom=8)
    C.write_tiles_hilbert(tiles, str(tmp_path / "tiles"))
    back = pq.read_table(str(tmp_path / "tiles"))
    k = np.asarray(back.column("hkey"))
    assert (np.diff(k) >= 0).all()  # globally sorted layout
    assert back.num_rows == tiles.count()


@pytest.mark.usefixtures("ray_session")
def test_phash_neardup(ray_session):
    import ray
    tbl = fixtures.images_table(30)
    # plant two near-dup phashes of image 0 (flip ≤3 bits)
    ph0 = tbl.column("phash")[0].as_py()
    extra = pa.table({
        "image_id": ["dupA", "dupB"],
        "phash": pa.array([ph0 ^ 0b101, ph0 ^ (1 << 40)], pa.int64()),
    })
    base = tbl.select(["image_id", "phash"])
    both = pa.concat_tables([base, extra])
    out = C.phash_neardup_pairs(ray.data.from_arrow(both), max_hamming=3).take_all()
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in out}
    assert len(pairs) == len(out)  # exactly-once
    img0 = tbl.column("image_id")[0].as_py()
    assert pairs[tuple(sorted((img0, "dupA")))] == 2
    assert pairs[tuple(sorted((img0, "dupB")))] == 1
    # brute-force oracle
    ids = both.column("image_id").to_pylist()
    phs = both.column("phash").to_pylist()
    expect = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d = bin((phs[i] ^ phs[j]) & ((1 << 64) - 1)).count("1")
            if d <= 3 and ids[i] != ids[j]:
                expect[tuple(sorted((ids[i], ids[j])))] = d
    assert pairs == expect
