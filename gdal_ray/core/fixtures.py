"""Deterministic synthetic fixtures (FIXTURES.md F1-F4). Seed-fixed, no I/O.

Everything is a pure function of the row index, so bench-scale tables are
generated *inside* Ray tasks (``ray.data.range(n).map_batches(make_images)``)
instead of materializing on the driver — the generator itself streams.

The images table matches BASELINE.json input_hint:
  (image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
   caption:string, phash:int64) + georeferencing columns
  (geotransform: list<double>[6], crs: string, nodata: double nullable).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import codecs, proj
from . import geotransform as gt_mod

SEED = 42
_SIZES = [(16, 16), (20, 20), (64, 64), (256, 256), (400, 200)]  # (w, h)
_FMTS = ["raw", "png", "jpeg", "webp"]
_CRS = ["EPSG:4326", "EPSG:32611", "EPSG:3857"]
_WORDS = ["tile", "mosaic", "raster", "warp", "café", "zürich", "データ", "Ω",
          "piñata", "naïve", "tile—dash", "", "ciudad", "🌍"]


def image_pixels(i: int, w: int, h: int, bands: int) -> np.ndarray:
    """Per-image deterministic pattern: gradient + checkerboard + noise."""
    rng = np.random.default_rng(SEED + i)
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 255 // max(w - 1, 1)) + (yy * 255 // max(h - 1, 1))) // 2
    checker = ((xx // 8 + yy // 8) % 2) * 40
    noise = rng.integers(0, 25, size=(h, w))
    g = np.clip(base + checker + noise, 0, 255).astype(np.uint8)
    if bands == 1:
        return g
    out = np.stack([g, np.roll(g, w // 3, axis=1), 255 - g], axis=-1)
    return out.astype(np.uint8)


def image_meta(i: int):
    """Deterministic metadata for image i (no pixel work)."""
    rng = np.random.default_rng(SEED * 1000003 + i)
    w, h = _SIZES[i % len(_SIZES)]
    fmt = _FMTS[(i // len(_SIZES)) % len(_FMTS)]
    bands = 1 if i % 3 == 0 else 3
    crs = _CRS[i % len(_CRS)]
    # world placement; UTM images constrained to zone 11 validity
    if crs == "EPSG:32611":
        lon = float(rng.uniform(-119.5, -114.5))
        lat = float(rng.uniform(30.0, 45.0))
    else:
        # clustered hotspots (skew!) + uniform tail
        if i % 4 != 3:
            hot = [(-118.0, 34.0), (2.35, 48.85), (139.7, 35.7)][i % 3]
            lon = float(np.clip(hot[0] + rng.normal(0, 2.0), -179, 179))
            lat = float(np.clip(hot[1] + rng.normal(0, 1.5), -70, 70))
        else:
            lon = float(rng.uniform(-179, 179))
            lat = float(rng.uniform(-70, 70))
    # ground size 0.02-0.2 degrees-equivalent
    deg_span = float(rng.uniform(0.02, 0.2))
    if crs == "EPSG:4326":
        x0, y0 = lon, lat
        xres = deg_span / w
    elif crs == "EPSG:3857":
        from . import mercator
        mx, my = mercator.latlon_to_meters(lat, lon)
        x0, y0 = float(mx), float(my)
        xres = deg_span * 111320.0 / w
    else:
        e, n = proj.tmerc_forward(lon, lat, lon0_deg=-117.0)
        x0, y0 = float(e), float(n)
        xres = deg_span * 111320.0 / w
    if i % 7 == 0:  # rotated geotransform case
        rot = xres * 0.15
        gt = (x0, xres, rot, y0, rot * 0.5, -xres)
    else:
        gt = gt_mod.north_up(x0, y0, xres, xres)
    nodata = None if i % 5 else 0.0
    caption = " ".join(_WORDS[int(j)] for j in rng.integers(0, len(_WORDS), size=int(rng.integers(0, 6))))
    phash = int(rng.integers(-(2**62), 2**62))
    return dict(image_id=f"img{i:08d}", w=w, h=h, fmt=fmt, bands=bands, crs=crs,
                geotransform=list(gt), nodata=nodata, caption=caption, phash=phash)


def make_image_row(i: int) -> dict:
    m = image_meta(i)
    px = image_pixels(i, m["w"], m["h"], m.pop("bands"))
    m["bytes"] = codecs.encode(px, m["fmt"])
    return m


def images_batch(indices: np.ndarray) -> pa.Table:
    """Batch generator usable directly in map_batches over ray.data.range."""
    rows = [make_image_row(int(i)) for i in indices]
    return pa.table({
        "image_id": pa.array([r["image_id"] for r in rows], pa.string()),
        "bytes": pa.array([r["bytes"] for r in rows], pa.binary()),
        "w": pa.array([r["w"] for r in rows], pa.int32()),
        "h": pa.array([r["h"] for r in rows], pa.int32()),
        "fmt": pa.array([r["fmt"] for r in rows], pa.string()),
        "caption": pa.array([r["caption"] for r in rows], pa.string()),
        "phash": pa.array([r["phash"] for r in rows], pa.int64()),
        "geotransform": pa.array([r["geotransform"] for r in rows], pa.list_(pa.float64(), 6)),
        "crs": pa.array([r["crs"] for r in rows], pa.string()),
        "nodata": pa.array([r["nodata"] for r in rows], pa.float64()),
    })


def images_table(n: int) -> pa.Table:
    return images_batch(np.arange(n))


# ---------- F2 polygons ----------

def polygon_ring(i: int, rng) -> np.ndarray:
    """Seeded polygon shapes: convex, concave (star), rectangles."""
    if i % 2 == 0:  # half the polygons overlap the point/image hotspots
        hx, hy = [(-118.0, 34.0), (2.35, 48.85), (139.7, 35.7)][(i // 2) % 3]
        cx = float(np.clip(hx + rng.normal(0, 3.0), -170, 170))
        cy = float(np.clip(hy + rng.normal(0, 2.5), -65, 65))
    else:
        cx = float(rng.uniform(-170, 170))
        cy = float(rng.uniform(-65, 65))
    r = float(rng.uniform(0.5, 8.0))
    kind = i % 3
    if kind == 0:  # rectangle
        w = r; h = r * float(rng.uniform(0.4, 1.2))
        ring = np.array([[cx - w, cy - h], [cx + w, cy - h], [cx + w, cy + h],
                         [cx - w, cy + h], [cx - w, cy - h]])
    elif kind == 1:  # convex n-gon
        n = int(rng.integers(5, 10))
        t = np.sort(rng.uniform(0, 2 * np.pi, n))
        ring = np.column_stack([cx + r * np.cos(t), cy + r * 0.7 * np.sin(t)])
        ring = np.vstack([ring, ring[:1]])
    else:  # concave star
        n = int(rng.integers(5, 8))
        t = np.linspace(0, 2 * np.pi, 2 * n, endpoint=False)
        rad = np.where(np.arange(2 * n) % 2 == 0, r, r * 0.45)
        ring = np.column_stack([cx + rad * np.cos(t), cy + rad * 0.8 * np.sin(t)])
        ring = np.vstack([ring, ring[:1]])
    return ring


def make_polygon_row(i: int) -> dict:
    from . import wkb
    rng = np.random.default_rng(SEED * 7 + i)
    shell = polygon_ring(i, rng)
    holes = []
    if i % 5 == 0 and i % 3 != 0:  # holed case (not for rectangles' edge tests)
        cx = shell[:-1, 0].mean(); cy = shell[:-1, 1].mean()
        hr = 0.15 * (shell[:-1, 0].max() - shell[:-1, 0].min())
        t = np.linspace(0, 2 * np.pi, 9)
        holes.append(np.column_stack([cx + hr * np.cos(t), cy + hr * np.sin(t)]))
    return dict(poly_id=f"poly{i:06d}",
                wkb=wkb.polygon(shell, holes),
                category="abcdefgh"[i % 8],
                zone_val=float(np.round(rng.uniform(0, 100), 3)))


def polygons_table(n: int) -> pa.Table:
    rows = [make_polygon_row(i) for i in range(n)]
    return pa.table({
        "poly_id": pa.array([r["poly_id"] for r in rows]),
        "wkb": pa.array([r["wkb"] for r in rows], pa.binary()),
        "category": pa.array([r["category"] for r in rows]),
        "zone_val": pa.array([r["zone_val"] for r in rows], pa.float64()),
    })


# ---------- F3 points ----------

def points_batch(indices: np.ndarray) -> pa.Table:
    idx = np.asarray(indices, dtype=np.int64)
    # vectorized seeded values: splitmix-style hashing for determinism
    def h(k):
        z = (idx + np.int64(k)) * np.int64(-7046029254386353131)
        z ^= z >> 31
        z *= np.int64(-4658895280553007687)
        z ^= z >> 29
        return (z & np.int64(0x7FFFFFFFFFFFFFFF)).astype(np.float64) / float(2**63)
    u1, u2, u3, u4 = h(1), h(2), h(3), h(4)
    clustered = (idx % 4) != 3
    hot_lon = np.array([-118.0, 2.35, 139.7])[idx % 3]
    hot_lat = np.array([34.0, 48.85, 35.7])[idx % 3]
    x = np.where(clustered, np.clip(hot_lon + (u1 - 0.5) * 8.0, -179, 179),
                 u1 * 358.0 - 179.0)
    y = np.where(clustered, np.clip(hot_lat + (u2 - 0.5) * 6.0, -70, 70),
                 u2 * 140.0 - 70.0)
    return pa.table({
        "point_id": pa.array([f"pt{int(i):07d}" for i in idx]),
        "x": pa.array(x, pa.float64()),
        "y": pa.array(y, pa.float64()),
        "value": pa.array(np.round(u3 * 100.0, 4), pa.float64()),
    })


def points_table(n: int) -> pa.Table:
    return points_batch(np.arange(n))
