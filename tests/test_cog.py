"""Cloud-optimized GeoTIFF tests — layout pins per the reference COG driver
(frmts/gtiff/cogdriver.cpp): all IFDs at the file head, overview chain via
NewSubfileType=1, tile data ordered smallest-overview-first with strictly
ascending offsets; overview pixel math per gcore/overview.cpp AVERAGE."""
import numpy as np
import pytest

from gdal_ray.core import tiff
from gdal_ray.core.checksum import checksum


def _layout_asserts(data: bytes, levels):
    offs = [m["tile_offsets"] for _, m in levels]
    min_data = min(min(o) for o in offs)
    # every IFD (and, transitively, its inline value area) precedes tile data
    assert all(m["ifd_offset"] < min_data for _, m in levels)
    # smallest overview's tiles first ... full-res last, ascending throughout
    flat = [o for lv in reversed(offs) for o in lv]
    assert flat == sorted(flat)
    assert levels[0][1]["subfile_type"] == 0
    assert all(m["subfile_type"] == 1 for _, m in levels[1:])


def test_reduce2x_average_half_up():
    a = np.array([[0, 1], [2, 3]], dtype=np.uint8)[:, :, None]
    # sum=6, (6+2)//4 = 2
    assert tiff.reduce2x(a)[0, 0, 0] == 2
    b = np.array([[1, 1], [1, 2]], dtype=np.uint8)[:, :, None]
    # sum=5, (5+2)//4 = 1  (half-up at .25 stays down; (7+2)//4=2 rounds .75 up)
    assert tiff.reduce2x(b)[0, 0, 0] == 1
    c = np.array([[1, 2], [2, 2]], dtype=np.uint8)[:, :, None]
    assert tiff.reduce2x(c)[0, 0, 0] == 2
    # odd edges use the true contributing count
    d = np.arange(9, dtype=np.uint8).reshape(3, 3)[:, :, None]
    r = tiff.reduce2x(d)
    assert r.shape == (2, 2, 1)
    assert r[0, 0, 0] == (0 + 1 + 3 + 4 + 2) // 4
    assert r[0, 1, 0] == (2 + 5 + 1) // 2
    assert r[1, 1, 0] == 8
    # floats: plain mean
    f = np.array([[1.0, 2.0], [3.0, 4.0]], dtype=np.float32)[:, :, None]
    assert tiff.reduce2x(f)[0, 0, 0] == pytest.approx(2.5)


@pytest.mark.parametrize("compression,predictor", [("deflate", 2),
                                                   ("lzw", None),
                                                   ("none", None)])
def test_cog_roundtrip_and_layout(compression, predictor):
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (100, 75), dtype=np.uint8)
    data = tiff.encode_cog(img, tile_size=16, compression=compression,
                           predictor=predictor,
                           geotransform=(10.0, 0.5, 0, 20.0, 0, -0.5),
                           epsg=32633)
    levels = tiff.decode_tiff_all(data)
    assert [a.shape for a, _ in levels] == [(100, 75), (50, 38),
                                            (25, 19), (13, 10)]
    assert np.array_equal(levels[0][0], img)
    cur = img[:, :, None]
    for a, _ in levels[1:]:
        cur = tiff.reduce2x(cur)
        assert np.array_equal(a, cur[:, :, 0])
    _layout_asserts(data, levels)
    meta0 = levels[0][1]
    assert meta0["geotransform"] == (10.0, 0.5, 0.0, 20.0, 0.0, -0.5)
    assert meta0["epsg"] == 32633
    # decode_tiff_full still sees only the full-res grid
    full, _ = tiff.decode_tiff_full(data)
    assert np.array_equal(full, img)


def test_cog_rgb_float_and_single_level():
    rng = np.random.default_rng(8)
    rgb = rng.integers(0, 256, (40, 52, 3), dtype=np.uint8)
    levels = tiff.decode_tiff_all(tiff.encode_cog(rgb, tile_size=32))
    assert len(levels) == 2 and np.array_equal(levels[0][0], rgb)
    f = rng.normal(size=(33, 20)).astype(np.float32)
    lf = tiff.decode_tiff_all(
        tiff.encode_cog(f, tile_size=16, predictor=3))
    assert np.array_equal(lf[0][0], f)
    assert np.allclose(lf[1][0], tiff.reduce2x(f[:, :, None])[:, :, 0])
    # image that already fits one tile → no overview IFD
    small = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    assert len(tiff.decode_tiff_all(tiff.encode_cog(small, tile_size=16))) == 1


def test_cog_nearest_resampling():
    img = np.arange(32 * 32, dtype=np.uint8).reshape(32, 32)
    levels = tiff.decode_tiff_all(
        tiff.encode_cog(img, tile_size=16, resampling="nearest"))
    assert np.array_equal(levels[1][0], img[::2, ::2])


def test_write_cog_sink(ray_session, tmp_path):
    import ray.data

    from gdal_ray.core import codecs
    from gdal_ray.pipelines.catalog import write_cog

    rng = np.random.default_rng(9)
    rows = []
    for i in range(4):
        img = rng.integers(0, 256, (48, 48), dtype=np.uint8)
        rows.append({"image_id": f"img{i:02d}",
                     "bytes": codecs.encode_raw(img),
                     "fmt": "raw",
                     "geotransform": [float(i), 0.01, 0.0, 1.0, 0.0, -0.01]})
    ds = ray.data.from_items(rows)
    out = str(tmp_path / "cogs")
    manifest = write_cog(ds, out, tile_size=16).to_pandas() \
        .sort_values("image_id").reset_index(drop=True)
    assert len(manifest) == 4
    assert (manifest["n_levels"] == 3).all()   # 48 → 24 → 12
    for _, r in manifest.iterrows():
        payload = open(r["path"], "rb").read()
        assert len(payload) == r["n_bytes"]
        levels = tiff.decode_tiff_all(payload)
        _layout_asserts(payload, levels)
        assert checksum(levels[0][0]) == checksum(
            codecs.decode(
                [x["bytes"] for x in rows
                 if x["image_id"] == r["image_id"]][0], "raw"))
