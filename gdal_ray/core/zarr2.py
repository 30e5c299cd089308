"""Zarr v2 directory-store codec — ``frmts/zarr`` analog against the
public Zarr v2 spec (zarr.readthedocs.io/en/stable/spec/v2.html).

A Zarr v2 array is a directory: ``.zarray`` JSON (shape, chunks, dtype
in numpy typestr form, compressor, fill_value, C order), optional
``.zattrs``, and one file per chunk named ``i.j`` (C-order raw bytes,
optionally zlib-compressed).  Chunks are ALWAYS full-size — edge chunks
pad past the array bounds and readers crop.  Missing chunk files read as
``fill_value`` (the spec's sparse-store rule).

The chunk grid is what makes the format Ray-native: each chunk is an
independent task — see ``read_zarr_chunks`` / ``write_zarr_chunks``
users in pipelines.  Compressor support: ``zlib`` and ``null``
(numcodecs' blosc is not in this container — honest boundary, raises)."""

from __future__ import annotations

import json
import os
import zlib

import numpy as np

__all__ = ["write_zarr", "read_zarr", "read_zarr_meta", "read_zarr_chunk",
           "chunk_grid"]


def write_zarr(path: str, arr: np.ndarray, *, chunks=None,
               compressor: str | None = "zlib", level: int = 1,
               fill_value=0, attrs: dict | None = None) -> list[str]:
    """Write a 2-D array as a Zarr v2 store; returns chunk file paths."""
    a = np.ascontiguousarray(arr)
    if a.ndim != 2:
        raise ValueError("this writer is 2-D (raster) only")
    if chunks is None:
        chunks = (min(a.shape[0], 256), min(a.shape[1], 256))
    ch, cw = int(chunks[0]), int(chunks[1])
    os.makedirs(path, exist_ok=True)
    comp = None if compressor in (None, "null") else \
        {"id": "zlib", "level": int(level)}
    if compressor not in (None, "null", "zlib"):
        raise ValueError(f"unsupported compressor {compressor!r} "
                         "(zlib/null only in this container)")
    meta = {"zarr_format": 2, "shape": list(a.shape),
            "chunks": [ch, cw], "dtype": a.dtype.str,
            "compressor": comp, "fill_value": fill_value,
            "order": "C", "filters": None}
    with open(os.path.join(path, ".zarray"), "w") as f:
        json.dump(meta, f, sort_keys=True)
    if attrs:
        with open(os.path.join(path, ".zattrs"), "w") as f:
            json.dump(attrs, f, sort_keys=True)
    out = []
    nci = -(-a.shape[0] // ch)
    ncj = -(-a.shape[1] // cw)
    for ci in range(nci):
        for cj in range(ncj):
            block = np.full((ch, cw), fill_value, dtype=a.dtype)
            ys = a[ci * ch:(ci + 1) * ch, cj * cw:(cj + 1) * cw]
            block[:ys.shape[0], :ys.shape[1]] = ys
            raw = block.tobytes()
            if comp:
                raw = zlib.compress(raw, comp["level"])
            p = os.path.join(path, f"{ci}.{cj}")
            with open(p, "wb") as f:
                f.write(raw)
            out.append(p)
    return out


def read_zarr_meta(path: str) -> dict:
    with open(os.path.join(path, ".zarray")) as f:
        meta = json.load(f)
    if meta.get("zarr_format") != 2:
        raise ValueError("not a Zarr v2 array")
    if meta.get("order", "C") != "C":
        raise NotImplementedError("F-order Zarr chunks not supported")
    comp = meta.get("compressor")
    if comp is not None and comp.get("id") != "zlib":
        raise NotImplementedError(
            f"compressor {comp.get('id')!r} needs numcodecs "
            "(unavailable in this container); zlib/null supported")
    return meta


def chunk_grid(meta: dict) -> list[tuple[int, int]]:
    sh, ch = meta["shape"], meta["chunks"]
    return [(ci, cj)
            for ci in range(-(-sh[0] // ch[0]))
            for cj in range(-(-sh[1] // ch[1]))]


def read_zarr_chunk(path: str, meta: dict, ci: int, cj: int) -> np.ndarray:
    """One chunk -> full-size (chunks) array (fill_value when absent)."""
    ch, cw = meta["chunks"]
    dt = np.dtype(meta["dtype"])
    p = os.path.join(path, f"{ci}.{cj}")
    if not os.path.exists(p):
        return np.full((ch, cw), meta.get("fill_value") or 0, dtype=dt)
    with open(p, "rb") as f:
        raw = f.read()
    if meta.get("compressor"):
        raw = zlib.decompress(raw)
    return np.frombuffer(raw, dtype=dt).reshape(ch, cw).copy()


def read_zarr(path: str) -> np.ndarray:
    """Whole-array convenience read (crops edge-chunk padding)."""
    meta = read_zarr_meta(path)
    h, w = meta["shape"]
    ch, cw = meta["chunks"]
    out = np.empty((h, w), dtype=np.dtype(meta["dtype"]))
    for ci, cj in chunk_grid(meta):
        blk = read_zarr_chunk(path, meta, ci, cj)
        ys = out[ci * ch:(ci + 1) * ch, cj * cw:(cj + 1) * cw]
        ys[:, :] = blk[:ys.shape[0], :ys.shape[1]]
    return out
