"""Global tile-pyramid math, bit-exact to the reference's gdal2tiles.

Semantics pinned to ``swig/python/gdal-utils/osgeo_utils/gdal2tiles.py``
(reference @ /root/reference): ``GlobalMercator`` at :316-533 and
``GlobalGeodetic`` at :535+.  All functions here are vectorized numpy
re-derivations of those published formulas (spherical web-mercator,
EPSG:3857) — the normative tile-assignment rule is the Python one
(``PixelsToTile = ceil(p/tile) - 1``, gdal2tiles.py:461-466), per SURVEY §7.

No Ray, no I/O — everything is a pure function usable inside map_batches.
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS = 6378137.0
ORIGIN_SHIFT = 2 * np.pi * EARTH_RADIUS / 2.0  # 20037508.342789244
MAXZOOMLEVEL = 32
TILE_SIZE = 256


def initial_resolution(tile_size: int = TILE_SIZE) -> float:
    # gdal2tiles.py:418 — 156543.03392804062 for 256px tiles
    return 2 * np.pi * EARTH_RADIUS / tile_size


def resolution(zoom, tile_size: int = TILE_SIZE):
    """Meters/pixel at given zoom (gdal2tiles.py:498-502)."""
    return initial_resolution(tile_size) / (2.0 ** np.asarray(zoom))


def latlon_to_meters(lat, lon):
    """WGS84 lat/lon -> spherical-mercator meters (gdal2tiles.py:423-431)."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    mx = lon * ORIGIN_SHIFT / 180.0
    my = np.log(np.tan((90.0 + lat) * np.pi / 360.0)) / (np.pi / 180.0)
    my = my * ORIGIN_SHIFT / 180.0
    return mx, my


def meters_to_latlon(mx, my):
    """Spherical-mercator meters -> WGS84 lat/lon (gdal2tiles.py:433-444)."""
    mx = np.asarray(mx, dtype=np.float64)
    my = np.asarray(my, dtype=np.float64)
    lon = (mx / ORIGIN_SHIFT) * 180.0
    lat = (my / ORIGIN_SHIFT) * 180.0
    lat = 180.0 / np.pi * (2.0 * np.arctan(np.exp(lat * np.pi / 180.0)) - np.pi / 2.0)
    return lat, lon


def meters_to_pixels(mx, my, zoom, tile_size: int = TILE_SIZE):
    """EPSG:3857 -> pyramid pixels at zoom (gdal2tiles.py:453-459)."""
    res = resolution(zoom, tile_size)
    px = (np.asarray(mx, dtype=np.float64) + ORIGIN_SHIFT) / res
    py = (np.asarray(my, dtype=np.float64) + ORIGIN_SHIFT) / res
    return px, py


def pixels_to_meters(px, py, zoom, tile_size: int = TILE_SIZE):
    """Pyramid pixels at zoom -> EPSG:3857 (gdal2tiles.py:446-451)."""
    res = resolution(zoom, tile_size)
    mx = np.asarray(px, dtype=np.float64) * res - ORIGIN_SHIFT
    my = np.asarray(py, dtype=np.float64) * res - ORIGIN_SHIFT
    return mx, my


def pixels_to_tile(px, py, tile_size: int = TILE_SIZE):
    """The NORMATIVE tile rule: ``ceil(p/tile) - 1`` (gdal2tiles.py:461-466).

    A pixel coordinate exactly on a tile's left/bottom edge belongs to the
    tile *below/left* of it (ceil semantics), matching the reference.
    """
    tx = np.ceil(np.asarray(px, dtype=np.float64) / float(tile_size)).astype(np.int64) - 1
    ty = np.ceil(np.asarray(py, dtype=np.float64) / float(tile_size)).astype(np.int64) - 1
    return tx, ty


def meters_to_tile(mx, my, zoom, tile_size: int = TILE_SIZE):
    """gdal2tiles.py:474-478."""
    px, py = meters_to_pixels(mx, my, zoom, tile_size)
    return pixels_to_tile(px, py, tile_size)


def tile_bounds(tx, ty, zoom, tile_size: int = TILE_SIZE):
    """TMS tile -> (minx, miny, maxx, maxy) EPSG:3857 (gdal2tiles.py:480-487)."""
    tx = np.asarray(tx, dtype=np.float64)
    ty = np.asarray(ty, dtype=np.float64)
    minx, miny = pixels_to_meters(tx * tile_size, ty * tile_size, zoom, tile_size)
    maxx, maxy = pixels_to_meters((tx + 1) * tile_size, (ty + 1) * tile_size, zoom, tile_size)
    return minx, miny, maxx, maxy


def zoom_for_pixel_size(pixel_size: float, tile_size: int = TILE_SIZE) -> int:
    """Max zoom whose resolution <= pixel size, minus-one rule
    (gdal2tiles.py:504-510)."""
    for i in range(MAXZOOMLEVEL):
        if pixel_size > resolution(i, tile_size):
            return max(0, i - 1)  # don't scale up
    return MAXZOOMLEVEL - 1


def tms_to_xyz(tx, ty, zoom):
    """TMS -> Google/XYZ row flip: ty' = 2^z - 1 - ty (gdal2tiles.py:512-516).

    Involution — also converts XYZ -> TMS.
    """
    return tx, (np.int64(1) << np.asarray(zoom, dtype=np.int64)) - 1 - np.asarray(ty, dtype=np.int64)


def quadkey(tx, ty, zoom: int) -> str:
    """TMS tile -> Microsoft quadkey (gdal2tiles.py:518-532). Scalar only."""
    ty = (2**zoom - 1) - int(ty)
    tx = int(tx)
    key = []
    for i in range(zoom, 0, -1):
        digit = 0
        mask = 1 << (i - 1)
        if tx & mask:
            digit += 1
        if ty & mask:
            digit += 2
        key.append(str(digit))
    return "".join(key)


# --- GlobalGeodetic (EPSG:4326 profile), gdal2tiles.py:535-628 ---

def geodetic_lonlat_to_pixels(lon, lat, zoom, tile_size: int = TILE_SIZE):
    res = 180.0 / tile_size / (2.0 ** np.asarray(zoom))
    px = (180.0 + np.asarray(lon, dtype=np.float64)) / res
    py = (90.0 + np.asarray(lat, dtype=np.float64)) / res
    return px, py


def geodetic_tile_bounds(tx, ty, zoom, tile_size: int = TILE_SIZE):
    res = 180.0 / tile_size / (2.0 ** np.asarray(zoom))
    tx = np.asarray(tx, dtype=np.float64)
    ty = np.asarray(ty, dtype=np.float64)
    return (
        tx * tile_size * res - 180.0,
        ty * tile_size * res - 90.0,
        (tx + 1) * tile_size * res - 180.0,
        (ty + 1) * tile_size * res - 90.0,
    )


def tile_key(z, tx, ty) -> np.ndarray:
    """Pack (z, x, y) into one int64 sortable key: z in high bits, then
    interleave-free (x, y) — used as groupby/shuffle key so a single int64
    column (not a 3-tuple) moves through the exchange."""
    z = np.asarray(z, dtype=np.int64)
    tx = np.asarray(tx, dtype=np.int64)
    ty = np.asarray(ty, dtype=np.int64)
    return (z << 58) | (tx << 29) | ty


def tile_unkey(key):
    key = np.asarray(key, dtype=np.int64)
    z = key >> 58
    tx = (key >> 29) & ((1 << 29) - 1)
    ty = key & ((1 << 29) - 1)
    return z, tx, ty
