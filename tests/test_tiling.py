"""Tiling pipeline: tile assignment vs brute-force GlobalMercator oracle,
composite/overview semantics, and a small end-to-end Ray run."""

import math

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.core import codecs, fixtures, mercator, proj
from gdal_ray.core import geotransform as gtm
from gdal_ray.pipelines import tiling
from gdal_ray.stages.warp import TILE, WarpTileStage, image_lonlat_bbox, tile_range_for_bbox

ZOOM = 9


def oracle_tiles_for_image(i, zoom=ZOOM):
    """Independent scalar-math implementation of the reference formulas
    (gdal2tiles.py:423-466) — FIXTURES.md F4 'tiles_expected'."""
    m = fixtures.image_meta(i)
    gt = m["geotransform"]
    # corner ring in source CRS -> lon/lat
    cx = [0, m["w"], m["w"], 0]
    cy = [0, 0, m["h"], m["h"]]
    t = proj.get_transformer(m["crs"], "EPSG:4326")
    lons, lats = [], []
    for px, py in zip(cx, cy):
        gx = gt[0] + px * gt[1] + py * gt[2]
        gy = gt[3] + px * gt[4] + py * gt[5]
        lon, lat = t.transform(np.array([gx]), np.array([gy]))
        lons.append(float(lon[0])); lats.append(float(lat[0]))
    lon_min, lon_max = min(lons), max(lons)
    lat_min, lat_max = max(min(lats), -85.05112878), min(max(lats), 85.05112878)
    out = set()
    def tile_of(lat, lon):
        mx = lon * mercator.ORIGIN_SHIFT / 180.0
        my = math.log(math.tan((90 + lat) * math.pi / 360.0)) / (math.pi / 180.0)
        my = my * mercator.ORIGIN_SHIFT / 180.0
        res = 2 * math.pi * 6378137 / 256 / (2 ** zoom)
        px = (mx + mercator.ORIGIN_SHIFT) / res
        py = (my + mercator.ORIGIN_SHIFT) / res
        return (int(math.ceil(px / 256.0) - 1), int(math.ceil(py / 256.0) - 1))
    tx0, ty0 = tile_of(lat_min, lon_min)
    tx1, ty1 = tile_of(lat_max, lon_max)
    n = (1 << zoom) - 1
    for tx in range(max(tx0, 0), min(tx1, n) + 1):
        for ty in range(max(ty0, 0), min(ty1, n) + 1):
            out.add((zoom, tx, ty))
    return out


def test_tile_range_matches_oracle_rectilinear():
    """Exact tile-range match for non-rotated images (the oracle's corner
    bbox equals the densified-edge bbox when the transform is monotonic)."""
    checked = 0
    for i in range(0, 60):
        m = fixtures.image_meta(i)
        if i % 7 == 0:  # rotated gt: oracle corner-bbox method still valid
            pass
        bbox = image_lonlat_bbox(tuple(m["geotransform"]), m["crs"], m["w"], m["h"])
        tminx, tminy, tmaxx, tmaxy = tile_range_for_bbox(*bbox, ZOOM)
        got = {(ZOOM, tx, ty) for tx in range(tminx, tmaxx + 1)
               for ty in range(tminy, tmaxy + 1)}
        assert got == oracle_tiles_for_image(i), f"image {i}"
        checked += 1
    assert checked == 60


def _mini_batch(indices):
    return fixtures.images_batch(np.asarray(indices))


def test_warp_stage_emits_valid_contributions():
    stage = WarpTileStage(zoom=ZOOM)
    out = stage(_mini_batch([0, 1, 2, 3, 4]))
    assert out.num_rows >= 5  # every image covers ≥1 tile
    ids = set(out.column("image_id").to_pylist())
    assert ids == {f"img0000000{j}" for j in range(5)}
    # contribution payloads are sub-windows sized (ww × wh)
    for j in range(out.num_rows):
        ww = out.column("ww")[j].as_py()
        wh = out.column("wh")[j].as_py()
        assert 0 < ww <= TILE and 0 < wh <= TILE
        assert len(out.column("rgb")[j].as_py()) == ww * wh * 3
        assert len(out.column("mask")[j].as_py()) == ww * wh
    # tile ids match the oracle set
    for i in range(5):
        rows = [(out.column("z")[j].as_py(), out.column("x")[j].as_py(), out.column("y")[j].as_py())
                for j in range(out.num_rows)
                if out.column("image_id")[j].as_py() == f"img0000000{i}"]
        assert set(rows) <= oracle_tiles_for_image(i)


def test_warp_pixels_match_direct_sample():
    """Warped tile pixels equal direct (mesh_step=1) sampling within 1 LSB
    at mesh_step=16 — the approx-transformer error pin (reference uses
    max-diff ≤1 goldens, autotest/alg/warp.py:55-70)."""
    stage_fast = WarpTileStage(zoom=ZOOM, mesh_step=16)
    stage_exact = WarpTileStage(zoom=ZOOM, mesh_step=1)
    b = _mini_batch([1])
    t_fast = stage_fast(b)
    t_exact = stage_exact(b)
    assert t_fast.num_rows == t_exact.num_rows
    for j in range(t_fast.num_rows):
        a = np.frombuffer(t_fast.column("rgb")[j].as_py(), dtype=np.uint8).astype(np.int16)
        e = np.frombuffer(t_exact.column("rgb")[j].as_py(), dtype=np.uint8).astype(np.int16)
        assert np.abs(a - e).max() <= 1


def test_composite_first_wins_deterministic():
    rgb1 = np.full((TILE * TILE, 3), 100, np.uint8)
    rgb2 = np.full((TILE * TILE, 3), 200, np.uint8)
    m1 = np.zeros(TILE * TILE, np.uint8); m1[:100] = 255
    m2 = np.full(TILE * TILE, 255, np.uint8)
    g = pa.table({
        "tile_key": pa.array([5, 5], pa.int64()),
        "z": pa.array([3, 3], pa.int32()),
        "x": pa.array([1, 1], pa.int32()),
        "y": pa.array([2, 2], pa.int32()),
        "image_id": ["b", "a"],  # 'a' sorts first -> wins where valid
        "wx0": pa.array([0, 0], pa.int32()),
        "wy0": pa.array([0, 0], pa.int32()),
        "ww": pa.array([TILE, TILE], pa.int32()),
        "wh": pa.array([TILE, TILE], pa.int32()),
        "rgb": pa.array([rgb1.tobytes(), rgb2.tobytes()], pa.binary()),
        "mask": pa.array([m1.tobytes(), m2.tobytes()], pa.binary()),
        "caption": ["", ""],
    })
    out = tiling.composite_group(g)
    img = codecs.decode_png(out.column("png")[0].as_py())
    assert img.shape == (TILE, TILE, 4)
    flat = img.reshape(-1, 4)
    assert (flat[:, :3] == 200).all()  # image 'a' everywhere (valid everywhere)
    assert (flat[:, 3] == 255).all()


def test_overview_group_placement():
    """Child (x, y%2==1) goes to top half (TMS y grows north)."""
    def tile_png(val):
        rgba = np.zeros((TILE, TILE, 4), np.uint8)
        rgba[:, :, 0] = val
        rgba[:, :, 3] = 255
        return codecs.encode_png(rgba)
    g = pa.table({
        "tile_key": pa.array([0, 1], pa.int64()),
        "z": pa.array([5, 5], pa.int32()),
        "x": pa.array([4, 4], pa.int32()),
        "y": pa.array([7, 6], pa.int32()),  # y=7 odd -> north/top
        "png": pa.array([tile_png(10), tile_png(250)], pa.binary()),
        "checksum": pa.array([0, 0], pa.int32()),
        "n_contrib": pa.array([1, 1], pa.int32()),
    })
    out = tiling.overview_group(g)
    assert out.column("z")[0].as_py() == 4
    assert out.column("x")[0].as_py() == 2
    assert out.column("y")[0].as_py() == 3
    img = codecs.decode_png(out.column("png")[0].as_py())
    # top-left quadrant from child y=7 (val 10), bottom-left from y=6 (250)
    assert img[10, 10, 0] == 10
    assert img[200, 10, 0] == 250
    # right half: no children -> alpha 0
    assert (img[:, 200, 3] == 0).all()


@pytest.mark.usefixtures("ray_session")
def test_end_to_end_small_pyramid(tmp_path):
    import ray

    tbl = fixtures.images_table(12)
    ds = ray.data.from_arrow(tbl)
    levels = tiling.tile_pyramid(ds, max_zoom=ZOOM, min_zoom=ZOOM - 2, concurrency=2)
    base = levels[0]
    n_base = base.count()
    assert n_base > 0
    # every base tile key is unique
    keys = [r["tile_key"] for r in base.take_all()]
    assert len(keys) == len(set(keys))
    # overview levels shrink (or stay equal for sparse data)
    counts = [lv.count() for lv in levels]
    assert all(c > 0 for c in counts)
    assert counts[-1] <= counts[0]
    # write + manifest round trip
    tiling.write_tiles(levels[0], str(tmp_path / "tiles"))
    import pyarrow.parquet as pq
    got = pq.read_table(str(tmp_path / "tiles"))
    assert got.num_rows == n_base


def test_mosaic_images_first_wins(ray_session):
    """Standalone mosaic: two overlapping images on a common grid,
    first-non-nodata by image_id order, seams composited correctly."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from gdal_ray.core import codecs
    from gdal_ray.pipelines.tiling import mosaic_images

    res = 0.01
    def row(iid, x0, val):
        img = np.full((128, 128, 3), val, np.uint8)
        return {"image_id": iid, "bytes": codecs.encode_raw(img),
                "fmt": "raw", "w": 128, "h": 128,
                "geotransform": [x0, res, 0.0, 1.28, 0.0, -res],
                "crs": "EPSG:4326", "caption": "", "nodata": None,
                "phash": 0}
    # a overlaps b on x in [0.64, 1.28); a (id "a") wins there
    ds = ray.data.from_items([row("a", 0.0, 100), row("b", 0.64, 200)])
    tiles = {(r["x"], r["y"]): r for r in
             mosaic_images(ds, resolution=res).take_all()}
    assert len(tiles) >= 1
    t0 = tiles[(0, 0)]
    img = codecs.decode_png(t0["png"])
    # chunk (0,0) spans lat [0, 2.56); the 1.28-tall images fill rows 128+
    assert img[200, 10, 0] == 100           # a-only region
    assert img[200, 100, 0] == 100          # overlap: a (smaller id) wins
    assert img[200, 150, 0] == 200          # b-only region
    assert img[10, 10, 3] == 0              # empty top half transparent
    assert t0["n_contrib"] == 2


def test_partial_composite_equals_plain_shuffle(ray_session):
    """The map-side partial-compositing path (default) must be BIT-IDENTICAL
    to the plain one-shuffle composite (split_singles=False): same tiles,
    same checksums, same n_contrib — per-pixel min-image_id is associative."""
    import numpy as np
    import ray.data

    from gdal_ray.core import fixtures
    from gdal_ray.pipelines.tiling import base_tiles

    images = ray.data.from_arrow(fixtures.images_table(48)).repartition(6)
    fast = {r["tile_key"]: (r["checksum"], r["n_contrib"])
            for r in base_tiles(images, zoom=7, batch_size=8).take_all()}
    plain = {r["tile_key"]: (r["checksum"], r["n_contrib"])
             for r in base_tiles(images, zoom=7, batch_size=8,
                                 split_singles=False).take_all()}
    assert fast == plain
    assert len(fast) > 0


def test_partial_compositing_chunking_over_254_sources(ray_session):
    """A tile receiving >254 contributions in ONE warp batch must split
    into <=254-source partial chunks (uint8 widx limit) and still composite
    bit-identically to the plain groupby path (per-pixel min-image_id is
    associative across chunks)."""
    import ray.data

    from gdal_ray.core import codecs
    from gdal_ray.pipelines import tiling

    # 300 tiny images stacked on the SAME spot -> one contested tile with
    # 300 contributions, all inside a single 300-row batch
    n = 300
    rows = {"image_id": [], "bytes": [], "w": [], "h": [], "fmt": [],
            "caption": [], "phash": [], "geotransform": [], "crs": [],
            "nodata": []}
    for i in range(n):
        px = np.full((8, 8), 40 + (i % 200), np.uint8)
        rows["image_id"].append(f"ovr{i:04d}")
        rows["bytes"].append(codecs.encode_raw(px))
        rows["w"].append(8)
        rows["h"].append(8)
        rows["fmt"].append("raw")
        rows["caption"].append("")
        rows["phash"].append(i)
        rows["geotransform"].append([10.0, 0.01, 0.0, 10.0, 0.0, -0.01])
        rows["crs"].append("EPSG:4326")
        rows["nodata"].append(None)
    tbl = pa.table({
        "image_id": pa.array(rows["image_id"]),
        "bytes": pa.array(rows["bytes"], pa.binary()),
        "w": pa.array(rows["w"], pa.int32()),
        "h": pa.array(rows["h"], pa.int32()),
        "fmt": pa.array(rows["fmt"]),
        "caption": pa.array(rows["caption"]),
        "phash": pa.array(rows["phash"], pa.int64()),
        "geotransform": pa.array(rows["geotransform"], pa.list_(pa.float64(), 6)),
        "crs": pa.array(rows["crs"]),
        "nodata": pa.array(rows["nodata"], pa.float64()),
    })
    images = ray.data.from_arrow(tbl)
    fast = {(r["z"], r["x"], r["y"]): (r["checksum"], r["png"], r["n_contrib"])
            for r in tiling.base_tiles(images, zoom=9,
                                       batch_size=n).take_all()}
    plain = {(r["z"], r["x"], r["y"]): (r["checksum"], r["png"], r["n_contrib"])
             for r in tiling.base_tiles(images, zoom=9, batch_size=n,
                                        split_singles=False).take_all()}
    assert set(fast) == set(plain) and len(fast) >= 1
    for k in fast:
        assert fast[k][2] == plain[k][2] == n     # every source counted
        assert fast[k][0] == plain[k][0]          # checksum identical
        assert fast[k][1] == plain[k][1]          # PNG bit-identical
