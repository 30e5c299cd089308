"""Vector-tile pyramid: point features -> Mapbox Vector Tiles.

The write half of the reference's MVT driver
(``ogr/ogrsf_frmts/mvt/mvtwriterlayer.cpp``: per-feature tile assignment
with the same web-mercator pyramid gdal2tiles uses, coordinates quantized
to integer tile units at ``extent`` resolution), re-expressed Ray-Data-
first:

  stage 1 (map_batches, vectorized): lon/lat -> mercator pixels at the
     target zoom -> XYZ tile via the normative ceil rule
     (core/mercator.pixels_to_tile) -> tile-LOCAL integer units
     lx = floor(local_px * extent/256 + 0.5) (half-up, matching the
     closed-form oracle), packed (tile_key, fid, lx, ly) rows;
  stage 2 (splitmix-bucketed groupby): tiles are numerous and mostly
     tiny, so grouping by a HASHED bucket and iterating tiles in-process
     (np.unique slices on a per-bucket lexsort) avoids the per-GROUP
     map_groups dispatch cost — the same shape tiling.composite_bucket
     uses; each tile serializes one MVT blob with core/mvt.encode_tile.

Scale shape: one shuffle (the bucket groupby), payload = 4 int64 columns
per feature, blobs produced where the groups live; no driver
materialization.  Skew bound: a bucket holds ~n_tiles/n_buckets tiles;
hot TILES (a dense city tile) are bounded by the per-tile feature count,
which MVT itself caps in practice via zoom choice."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core import mercator, mvt

from .dedup import _splitmix   # the one shared splitmix64 (CLAUDE.md rule)

_NBUCKETS = 64


def point_vector_tiles(pts, zoom: int, *, layer: str = "points",
                       extent: int = mvt.EXTENT,
                       lon_col: str = "lon", lat_col: str = "lat",
                       id_col: str = "fid") -> "ray.data.Dataset":
    """(fid, lon, lat) Dataset -> (z, x, y, mvt, n_features) MVT tiles."""
    scale = extent / float(mercator.TILE_SIZE)

    def assign(b: pa.Table) -> pa.Table:
        fid = np.asarray(b.column(id_col), dtype=np.int64)
        lon = np.asarray(b.column(lon_col), dtype=np.float64)
        lat = np.asarray(b.column(lat_col), dtype=np.float64)
        mx, my = mercator.latlon_to_meters(lat, lon)
        px, py = mercator.meters_to_pixels(mx, my, zoom)
        tx, ty_tms = mercator.pixels_to_tile(px, py)
        ty = (1 << zoom) - 1 - ty_tms                  # XYZ (top-down) row
        # tile-local integer units; MVT y grows DOWN (screen space):
        # top-down local pixel row = (ty_tms+1)*256 - py
        lx = np.floor((px - tx * 256.0) * scale + 0.5).astype(np.int64)
        ly = np.floor(((ty_tms + 1) * 256.0 - py) * scale + 0.5).astype(np.int64)
        key = (tx.astype(np.int64) << 32) | ty.astype(np.int64)
        return pa.table({
            # NB: _splitmix needs uint64 input (int64 + uint64 promotes to
            # float64 in numpy, collapsing nearby keys to one hash)
            "bucket": pa.array(
                (_splitmix(key.astype(np.uint64))
                 & np.uint64(_NBUCKETS - 1)).astype(np.int64),
                pa.int64()),
            "tile_key": pa.array(key, pa.int64()),
            "fid": pa.array(fid, pa.int64()),
            "lx": pa.array(lx, pa.int64()),
            "ly": pa.array(ly, pa.int64())})

    def encode_bucket(g: pa.Table) -> pa.Table:
        key = np.asarray(g.column("tile_key"), dtype=np.int64)
        fid = np.asarray(g.column("fid"), dtype=np.int64)
        lx = np.asarray(g.column("lx"), dtype=np.int64)
        ly = np.asarray(g.column("ly"), dtype=np.int64)
        order = np.lexsort((fid, key))
        key, fid, lx, ly = key[order], fid[order], lx[order], ly[order]
        uk, starts = np.unique(key, return_index=True)
        ends = np.append(starts[1:], key.size)
        zs, xs, ys, blobs, counts = [], [], [], [], []
        for u, s, e in zip(uk, starts, ends):
            feats = [{"type": "Point",
                      "xy": np.array([[lx[i], ly[i]]], dtype=np.int64),
                      "id": int(fid[i])} for i in range(s, e)]
            blobs.append(mvt.encode_tile({layer: feats}))
            zs.append(zoom)
            xs.append(int(u >> 32))
            ys.append(int(u & 0xFFFFFFFF))
            counts.append(e - s)
        return pa.table({"z": pa.array(zs, pa.int64()),
                         "x": pa.array(xs, pa.int64()),
                         "y": pa.array(ys, pa.int64()),
                         "mvt": pa.array(blobs, pa.binary()),
                         "n_features": pa.array(counts, pa.int64())})

    rows = pts.map_batches(assign, batch_format="pyarrow")
    return rows.groupby("bucket").map_groups(encode_bucket,
                                             batch_format="pyarrow")
