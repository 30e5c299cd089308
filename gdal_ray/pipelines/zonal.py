"""Zonal statistics (GDALZonalStats, alg/zonal.cpp; stats list :281-301).

Raster × vector groupby: per-zone COUNT/MIN/MAX/MEAN/SUM of the pixels whose
centers fall in each zone polygon (the reference's default center-sampling
STRATEGY; GEOS-weighted fractional coverage is its WEIGHTED variant, not
implemented round 1).

Ray shape — the classic partial+final pattern (SURVEY §2.6):
  1. zones are broadcast once (``ray.put``) — the vector side of zonal runs
     is small relative to imagery;
  2. an actor-pool ``map_batches`` decodes each image, computes pixel-center
     lon/lat via geotransform+CRS, PIP-tests against candidate zones (bbox
     prefilter) and emits ONE partial row per (zone, image);
  3. a tiny ``groupby(zone).aggregate`` merges partials —
     count/sum/min/max combine associatively, mean = sum/count at the end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..core import codecs, geom, proj, wkb
from ..core import geotransform as gtm


class ZonalPartialStage:
    def __init__(self, zones_ref):
        z = ray.get(zones_ref) if isinstance(zones_ref, ray.ObjectRef) else zones_ref
        self.zone_ids = z["ids"]
        self.zone_rings = [wkb.as_polygons(wkb.loads(w)) for w in z["wkbs"]]
        self.zone_bbox = np.array([geom.rings_bbox(polys[0]) for polys in self.zone_rings])

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"zone_id": [], "count": [], "vsum": [], "vmin": [], "vmax": []}
        bts = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        gts = batch.column("geotransform").to_pylist()
        crss = batch.column("crs").to_pylist()
        for i in range(batch.num_rows):
            img = codecs.decode(bts[i], fmts[i])
            band = (img if img.ndim == 2 else img[:, :, 0]).astype(np.float64)
            h, w = band.shape
            px, py = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
            gx, gy = gtm.apply(tuple(gts[i]), px.ravel(), py.ravel())
            tr = proj.get_transformer(crss[i], "EPSG:4326")
            lon, lat = tr.transform(gx, gy)
            ibb = (lon.min(), lat.min(), lon.max(), lat.max())
            vals = band.ravel()
            cand = np.nonzero(~((self.zone_bbox[:, 2] < ibb[0]) | (ibb[2] < self.zone_bbox[:, 0])
                                | (self.zone_bbox[:, 3] < ibb[1]) | (ibb[3] < self.zone_bbox[:, 1])))[0]
            for zi in cand:
                inside = np.zeros(lon.shape[0], dtype=bool)
                for rings in self.zone_rings[zi]:
                    inside |= geom.points_intersect_polygon(lon, lat, rings)
                if inside.any():
                    v = vals[inside]
                    out["zone_id"].append(self.zone_ids[zi])
                    out["count"].append(int(inside.sum()))
                    out["vsum"].append(float(v.sum()))
                    out["vmin"].append(float(v.min()))
                    out["vmax"].append(float(v.max()))
        return pa.table({"zone_id": pa.array(out["zone_id"], pa.string()),
                         "count": pa.array(out["count"], pa.int64()),
                         "vsum": pa.array(out["vsum"], pa.float64()),
                         "vmin": pa.array(out["vmin"], pa.float64()),
                         "vmax": pa.array(out["vmax"], pa.float64())})


def _final_merge(group: pa.Table) -> pa.Table:
    cnt = int(np.sum(np.asarray(group.column("count"))))
    vsum = float(np.sum(np.asarray(group.column("vsum"))))
    return pa.table({
        "zone_id": [group.column("zone_id")[0].as_py()],
        "pix_count": pa.array([cnt], pa.int64()),
        "vsum": pa.array([vsum], pa.float64()),
        "vmin": pa.array([float(np.min(np.asarray(group.column("vmin"))))], pa.float64()),
        "vmax": pa.array([float(np.max(np.asarray(group.column("vmax"))))], pa.float64()),
        "vmean": pa.array([vsum / cnt], pa.float64()),
    })


def zonal_stats(images: "ray.data.Dataset", zones_wkb: list[bytes],
                zone_ids: list[str], *, concurrency: int | tuple = 4,
                ) -> "ray.data.Dataset":
    """Per-zone pixel statistics over the whole image catalog."""
    zones_ref = ray.put({"ids": list(zone_ids), "wkbs": list(zones_wkb)})
    partials = images.map_batches(
        ZonalPartialStage, fn_constructor_kwargs={"zones_ref": zones_ref},
        batch_format="pyarrow", concurrency=concurrency)
    return partials.groupby("zone_id").map_groups(_final_merge, batch_format="pyarrow")
