"""MVT codec + vector-tile pipeline (reference: ogr/ogrsf_frmts/mvt;
spec: Mapbox Vector Tile 2.1)."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.core.mvt import EXTENT, decode_tile, encode_tile


def test_mvt_point_props_roundtrip():
    feats = [{"type": "Point", "xy": np.array([[100, 200]]), "id": 7,
              "props": {"name": "a", "rank": 3, "score": 1.5,
                        "neg": -4, "ok": True}}]
    d = decode_tile(encode_tile({"roads": feats}))
    L = d["roads"]
    assert L["version"] == 2 and L["extent"] == EXTENT
    f = L["features"][0]
    assert f["id"] == 7 and tuple(f["xy"][0]) == (100, 200)
    assert f["props"] == {"name": "a", "rank": 3, "score": 1.5,
                          "neg": -4, "ok": True}


def test_mvt_geometry_roundtrip():
    feats = [
        {"type": "LineString",
         "xy": np.array([[4000, 0], [10, 5], [20, 4090]])},  # neg deltas
        {"type": "Polygon",
         "rings": [np.array([[0, 0], [100, 0], [100, 100], [0, 100],
                             [0, 0]]),
                   np.array([[20, 20], [20, 40], [40, 40], [40, 20],
                             [20, 20]])]},
        {"type": "Point", "xy": np.array([[1, 2], [3, 4]])},  # multipoint
    ]
    d = decode_tile(encode_tile({"g": feats}))
    f0, f1, f2 = d["g"]["features"]
    np.testing.assert_array_equal(f0["xy"], feats[0]["xy"])
    np.testing.assert_array_equal(f1["rings"][0], feats[1]["rings"][0])
    np.testing.assert_array_equal(f1["rings"][1], feats[1]["rings"][1])
    np.testing.assert_array_equal(f2["xy"], feats[2]["xy"])


def test_mvt_value_dedup_and_multilayer():
    feats = [{"type": "Point", "xy": np.array([[i, i]]),
              "props": {"rank": 3}} for i in range(5)]
    blob = encode_tile({"a": feats, "b": []})
    # 5 features sharing one key + one value: the pools are deduplicated,
    # so the tile stays small (spec 4.4)
    assert len(blob) < 150
    d = decode_tile(blob)
    assert set(d) == {"a", "b"}
    assert d["b"]["features"] == []
    assert all(f["props"] == {"rank": 3} for f in d["a"]["features"])


def test_mvt_varint_boundaries():
    # ids and coords exercising multi-byte varints / large zigzags
    feats = [{"type": "Point", "xy": np.array([[4095, 0]]),
              "id": 2**40 + 3, "props": {"big": 2**50, "neg": -(2**40)}}]
    f = decode_tile(encode_tile({"l": feats}))["l"]["features"][0]
    assert f["id"] == 2**40 + 3
    assert f["props"] == {"big": 2**50, "neg": -(2**40)}


def test_point_vector_tiles_pipeline(ray_session):
    import ray

    from gdal_ray.core import mercator
    from gdal_ray.core.mvt import decode_tile as dec
    from gdal_ray.pipelines.vectortiles import point_vector_tiles

    rng = np.random.default_rng(3)
    n = 400
    lon = rng.uniform(-179, 179, n)
    lat = rng.uniform(-80, 80, n)
    ds = ray.data.from_arrow(pa.table({
        "fid": pa.array(np.arange(n), pa.int64()),
        "lon": pa.array(lon, pa.float64()),
        "lat": pa.array(lat, pa.float64())}))
    Z = 3
    tiles = point_vector_tiles(ds, Z).take_all()
    # every feature lands in exactly one tile
    assert sum(t["n_features"] for t in tiles) == n
    # brute-force oracle: recompute each point's tile + local coords
    mx, my = mercator.latlon_to_meters(lat, lon)
    px, py = mercator.meters_to_pixels(mx, my, Z)
    tx, ty_tms = mercator.pixels_to_tile(px, py)
    ty = (1 << Z) - 1 - ty_tms
    lx = np.floor((px - tx * 256.0) * 16.0 + 0.5).astype(np.int64)
    ly = np.floor(((ty_tms + 1) * 256.0 - py) * 16.0 + 0.5).astype(np.int64)
    exp: dict = {}
    for i in range(n):
        exp.setdefault((int(tx[i]), int(ty[i])), []).append(
            (i, int(lx[i]), int(ly[i])))
    for t in tiles:
        feats = dec(t["mvt"])["points"]["features"]
        got = sorted((f["id"], int(f["xy"][0, 0]), int(f["xy"][0, 1]))
                     for f in feats)
        assert got == sorted(exp[(t["x"], t["y"])])


# ---------- PMTiles ----------

def test_pmtiles_tile_id_inverse():
    from gdal_ray.core.pmtiles import _id_to_zxy, tile_id
    rng = np.random.default_rng(5)
    for z in range(0, 10):
        for _ in range(15):
            x = int(rng.integers(0, 1 << z)) if z else 0
            y = int(rng.integers(0, 1 << z)) if z else 0
            assert _id_to_zxy(tile_id(z, x, y)) == (z, x, y)


def test_pmtiles_archive_roundtrip_and_dedup():
    import struct

    from gdal_ray.core.pmtiles import (decode_pmtiles, encode_pmtiles,
                                       get_tile)
    tiles = [(3, 1, 2, b"payload-a"), (3, 5, 5, b"payload-b"),
             (4, 9, 9, b"payload-a"), (0, 0, 0, b"root")]
    blob = encode_pmtiles(tiles, tile_type="mvt", metadata={"name": "t"})
    assert blob[:7] == b"PMTiles" and blob[7] == 3
    out, meta = decode_pmtiles(blob)
    assert meta == {"name": "t"}
    assert sorted(out) == sorted(tiles)
    assert get_tile(blob, 3, 5, 5) == b"payload-b"
    assert get_tile(blob, 3, 0, 0) is None
    # identical payloads share one tile content (header word 88)
    assert struct.unpack_from("<Q", blob, 88)[0] == 3
    # deterministic bytes (gzip mtime=0)
    assert encode_pmtiles(tiles, tile_type="mvt",
                          metadata={"name": "t"}) == blob


def test_pmtiles_sink_and_reader(ray_session, tmp_path):
    import ray

    from gdal_ray.pipelines.catalog import read_pmtiles, write_pmtiles
    tab = pa.table({"z": pa.array([2, 2, 3], pa.int64()),
                    "x": pa.array([1, 3, 7], pa.int64()),
                    "y": pa.array([1, 2, 5], pa.int64()),
                    "mvt": pa.array([b"a", b"b", b"c"], pa.binary())})
    man = write_pmtiles(ray.data.from_arrow(tab), str(tmp_path / "o")) \
        .take_all()
    assert sum(r["n_tiles"] for r in man) == 3
    back = read_pmtiles([r["path"] for r in man]).take_all()
    got = sorted((r["z"], r["x"], r["y"], r["payload"]) for r in back)
    assert got == [(2, 1, 1, b"a"), (2, 3, 2, b"b"), (3, 7, 5, b"c")]


# ---------- MBTiles ----------

def test_mbtiles_roundtrip_and_tms_flip():
    from gdal_ray.pipelines.catalog import mbtiles_bytes, parse_mbtiles_bytes
    tiles = [(3, 1, 2, b"pay-a"), (0, 0, 0, b"root"), (5, 31, 31, b"edge")]
    blob = mbtiles_bytes(tiles, metadata={"minzoom": "0"})
    assert blob[:16] == b"SQLite format 3\x00"
    out, meta = parse_mbtiles_bytes(blob)
    assert sorted(out) == sorted(tiles)
    assert meta["format"] == "pbf" and meta["minzoom"] == "0"
    # the stored row really is TMS-flipped (spec): z=3, y=2 -> row 5
    import sqlite3
    con = sqlite3.connect(":memory:")
    con.deserialize(blob)
    assert con.execute("SELECT tile_row FROM tiles WHERE zoom_level=3")\
        .fetchone()[0] == 5


def test_mbtiles_sink_and_reader(ray_session, tmp_path):
    import ray

    from gdal_ray.pipelines.catalog import read_mbtiles, write_mbtiles
    tab = pa.table({"z": pa.array([2, 3], pa.int64()),
                    "x": pa.array([1, 7], pa.int64()),
                    "y": pa.array([1, 5], pa.int64()),
                    "mvt": pa.array([b"a", b"b"], pa.binary())})
    man = write_mbtiles(ray.data.from_arrow(tab), str(tmp_path / "o")) \
        .take_all()
    assert sum(r["n_tiles"] for r in man) == 2
    back = read_mbtiles([r["path"] for r in man]).take_all()
    assert sorted((r["z"], r["x"], r["y"], r["payload"]) for r in back) \
        == [(2, 1, 1, b"a"), (3, 7, 5, b"b")]
