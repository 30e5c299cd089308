"""Image footprint extraction (GDALFootprint, apps/gdal_footprint_lib.cpp).

Emits one lon/lat WKB polygon per image: the image boundary ring densified
(`-densify` :184 semantics) and reprojected to EPSG:4326 — the image side of
the footprint × vector-layer spatial join (north star).  Stateless
map_batches (transformers cached per process by core.proj).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core import proj, wkb
from ..core import geotransform as gtm


def footprints(batch: pa.Table, densify: int = 5) -> pa.Table:
    ids = batch.column("image_id").to_pylist()
    gts = batch.column("geotransform").to_pylist()
    crss = batch.column("crs").to_pylist()
    ws = batch.column("w").to_pylist()
    hs = batch.column("h").to_pylist()
    out = []
    for i in range(batch.num_rows):
        w, h = ws[i], hs[i]
        t = np.linspace(0.0, 1.0, densify)
        ex = np.concatenate([t * w, np.full(densify, w), t[::-1] * w, np.zeros(densify)])
        ey = np.concatenate([np.zeros(densify), t * h, np.full(densify, h), t[::-1] * h])
        gx, gy = gtm.apply(tuple(gts[i]), ex, ey)
        tr = proj.get_transformer(crss[i], "EPSG:4326")
        lon, lat = tr.transform(gx, gy)
        ring = np.column_stack([lon, lat])
        ring = np.vstack([ring, ring[:1]])
        out.append(wkb.polygon(ring))
    return pa.table({"image_id": ids, "wkb": pa.array(out, pa.binary())})
