"""Raster file ingest + format identification — the ``gdalmanage
identify`` / GDALOpen driver-probe analog (``gcore/gdaldrivermanager.cpp``
Identify loop).

``identify_raster`` sniffs content magics first (the reference's
Identify() methods), falling back to extension; ``read_raster_files``
turns a list of raster files into the engine's standard catalog rows
``(image_id, bytes, fmt, geotransform, nodata)`` with one task per file —
sidecar-based formats (EHdr/SAGA/Idrisi/ERS/RRaster) fetch their paired
file inside the same task, like the Shapefile reader does.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray.data

from ..core import codecs

# content magics, checked in order (reference driver Identify() methods)
_MAGICS: list[tuple[bytes, str]] = [
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"\xff\xd8", "jpeg"),
    (b"GIF8", "gif"),
    (b"BM", "bmp"),
    (b"DSAA", "gsag"),
    (b"DSBB", "gsbg"),
    (b"DSRB", "gs7bg"),
    (b"binterr", "bt"),
    (b"HEAD74", "lan"),
    (b"HEADER", "lan"),
    (b"NUM_OREC", "ntv2"),
    (b"II*\x00", "tiff"),
    (b"MM\x00*", "tiff"),
    (b"II+\x00", "tiff"),          # BigTIFF
    (b"MM\x00+", "tiff"),
    (b"UHL", "dted"),
    (b"PDS_VERSION_ID", "pds"),
    (b"TERRAGENTERRAIN ", "terragen"),
    (b"KRO\x01", "kro"),
    (b"SIMPLE  =", "fits"),
    (b"#TITLE", "gxf"),
    (b"SIGDEM", "sigdem"),
    (b"!", "bsb"), (b"VER/", "bsb"), (b"BSB/", "bsb"), (b"NOS/", "bsb"),
    (b"P5", "pnm"), (b"P6", "pnm"), (b"P2", "pnm"), (b"P3", "pnm"),
]

_EXT_FMT = {
    ".hgt": "srtmhgt", ".hgts": "srtmhgt",
    ".dt0": "dted", ".dt1": "dted", ".dt2": "dted",
    ".asc": "aaigrid", ".xyz": "xyz",
    ".tga": "tga", ".gtx": "gtx", ".dem": "usgsdem",
    ".zmap": "zmap", ".zycor": "zmap",
    ".webp": "webp",
    ".lcp": "lcp", ".img": "pds", ".mem": "jdem", ".kro": "kro",
    ".ter": "terragen", ".fits": "fits", ".gxf": "gxf",
    ".bil": "ehdr", ".sdat": "saga", ".rst": "idrisi", ".gri": "rraster",
}

# sidecar-based two-file formats: data extension -> header extension
_SIDECAR = {".bil": ".hdr", ".sdat": ".sgrd", ".rst": ".rdc",
            ".gri": ".grd"}


def identify_raster(data: bytes, filename: str = "") -> str:
    """Sniff the raster format of ``data``: content magics first, then
    the filename extension.  Raises ValueError when nothing matches
    (the reference's 'not recognized as being in a supported format')."""
    head = data[:16]
    for magic, fmt in _MAGICS:
        if head.startswith(magic):
            return fmt
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "webp"
    ext = os.path.splitext(filename)[1].lower()
    if ext in _EXT_FMT:
        return _EXT_FMT[ext]
    if ext == ".grd":
        # Surfer grids share .grd with RRaster INI headers
        if data[:9].lower().startswith(b"[general]") or b"ncols=" in data[:512]:
            return "rraster"
        raise ValueError("unidentified .grd variant")
    if data[:1] == b"@":
        return "zmap"
    raise ValueError(f"{filename or 'payload'}: not recognized as a "
                     "supported raster format")


def _decode_with_gt(data: bytes, fmt: str, path: str):
    """(array, geotransform, nodata) for any single/two-file format."""
    from ..core import aaigrid as AAI
    from ..core import demgrids as DG
    from ..core import rawgrids as RG
    if fmt == "srtmhgt":
        return DG.decode_srtmhgt(data, os.path.basename(path))
    if fmt == "dted":
        return DG.decode_dted(data)
    if fmt == "gsag":
        return DG.decode_gsag(data)
    if fmt == "gsbg":
        return DG.decode_gsbg(data)
    if fmt == "gs7bg":
        return DG.decode_gs7bg(data)
    if fmt == "zmap":
        return DG.decode_zmap(data)
    if fmt == "bt":
        return RG.decode_bt(data)
    if fmt == "gtx":
        return RG.decode_gtx(data)
    if fmt == "usgsdem":
        return RG.decode_usgsdem(data)
    if fmt == "lan":
        return RG.decode_lan(data)
    if fmt == "ntv2":
        return RG.decode_ntv2(data)
    if fmt == "lcp":
        return RG.decode_lcp(data)
    if fmt == "terragen":
        a, gt, _ = RG.decode_terragen(data)
        return a, gt, None
    if fmt == "kro":
        return RG.decode_kro(data)
    if fmt == "fits":
        return RG.decode_fits(data)
    if fmt == "gxf":
        return RG.decode_gxf(data)
    if fmt == "sigdem":
        return RG.decode_sigdem(data)
    if fmt == "jdem":
        return RG.decode_jdem(data)
    if fmt == "ngsgeoid":
        return RG.decode_ngsgeoid(data)
    if fmt == "pds":
        from ..core import pds as PDSC
        return PDSC.decode_pds(data)
    if fmt == "aaigrid":
        return AAI.decode_aaigrid(data)
    if fmt == "xyz":
        arr, gt = AAI.decode_xyz(data)
        return arr, gt, None
    if fmt in ("ehdr", "saga", "idrisi", "rraster"):
        ext = os.path.splitext(path)[1].lower()
        side = os.path.splitext(path)[0] + _SIDECAR[ext]
        with open(side, "rb") as f:
            hdr = f.read()
        dec = {"ehdr": RG.decode_ehdr, "saga": DG.decode_saga,
               "idrisi": RG.decode_idrisi, "rraster": RG.decode_rraster}
        return dec[fmt](hdr, data)
    # pixel formats with no georeferencing: identity geotransform
    arr = codecs.decode(data, fmt)
    return arr, (0.0, 1.0, 0.0, 0.0, 0.0, -1.0), None


def read_raster_files(paths, *, fmt: str | None = None) -> "ray.data.Dataset":
    """One task per raster file → catalog rows (image_id, bytes, fmt,
    w, h, geotransform, nodata).  ``bytes`` keeps the ORIGINAL encoded
    payload (zero re-encode); headers are decoded once for dimensions +
    geotransform.  ``fmt=None`` sniffs per file via identify_raster."""
    if isinstance(paths, str):
        paths = [paths]
    ds = ray.data.from_items([{"path": p} for p in paths])

    def load(b: pa.Table) -> pa.Table:
        out = {"image_id": [], "bytes": [], "fmt": [], "w": [], "h": [],
               "geotransform": [], "nodata": []}
        for p in b.column("path").to_pylist():
            with open(p, "rb") as f:
                data = f.read()
            f_ = fmt or identify_raster(data, p)
            arr, gt, nodata = _decode_with_gt(data, f_, p)
            out["image_id"].append(os.path.splitext(
                os.path.basename(p))[0])
            out["bytes"].append(data)
            out["fmt"].append(f_)
            if arr.ndim == 2:
                hh, ww = arr.shape
            elif f_ in ("ehdr", "saga", "idrisi", "rraster", "lan",
                        "lcp", "pds"):
                hh, ww = arr.shape[1], arr.shape[2]   # (bands, rows, cols)
            else:
                hh, ww = arr.shape[0], arr.shape[1]   # (rows, cols, ch)
            out["h"].append(int(hh))
            out["w"].append(int(ww))
            out["geotransform"].append([float(v) for v in gt])
            out["nodata"].append(None if nodata is None else float(nodata))
        return pa.table({
            "image_id": pa.array(out["image_id"], pa.string()),
            "bytes": pa.array(out["bytes"], pa.binary()),
            "fmt": pa.array(out["fmt"], pa.string()),
            "w": pa.array(out["w"], pa.int32()),
            "h": pa.array(out["h"], pa.int32()),
            "geotransform": pa.array(out["geotransform"],
                                     pa.list_(pa.float64())),
            "nodata": pa.array(out["nodata"], pa.float64())})

    return ds.map_batches(load, batch_format="pyarrow", batch_size=1)
