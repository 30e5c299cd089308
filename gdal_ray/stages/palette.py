"""rgb-to-palette: global median-cut quantization + optional dithering.

Reference: ``alg/gdalmediancut.cpp`` (median-cut palette) and
``alg/gdaldither.cpp`` (Floyd-Steinberg).  The distributed shape is the
classic TWO-PASS global aggregation (SURVEY §2.2 color-map row):

  pass 1: per-batch partial 5-bit RGB histograms (32³ int64 = 256 KB each)
          → merged on the driver (bounded size, independent of data);
  pass 2: the palette is broadcast and every image maps/dithers locally.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..core import codecs

_BITS = 5
_SIDE = 1 << _BITS


def _partial_hist(batch: pa.Table) -> pa.Table:
    h = np.zeros(_SIDE ** 3, dtype=np.int64)
    bts = batch.column("bytes").to_pylist()
    fmts = batch.column("fmt").to_pylist()
    for i in range(batch.num_rows):
        img = codecs.decode(bts[i], fmts[i])
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        q = (img[:, :, :3] >> (8 - _BITS)).astype(np.int64)
        code = (q[:, :, 0] << (2 * _BITS)) | (q[:, :, 1] << _BITS) | q[:, :, 2]
        h += np.bincount(code.ravel(), minlength=_SIDE ** 3)
    nz = np.nonzero(h)[0]
    return pa.table({"code": pa.array(nz, pa.int64()),
                     "count": pa.array(h[nz], pa.int64())})


def median_cut_palette(hist_codes: np.ndarray, hist_counts: np.ndarray,
                       n_colors: int = 256) -> np.ndarray:
    """Median-cut on the 5-bit histogram (gdalmediancut.cpp algorithm):
    repeatedly split the box with the largest pixel count along its longest
    axis at the weighted median.  Returns (n, 3) uint8 palette."""
    r = (hist_codes >> (2 * _BITS)) & (_SIDE - 1)
    g = (hist_codes >> _BITS) & (_SIDE - 1)
    b = hist_codes & (_SIDE - 1)
    pts = np.column_stack([r, g, b]).astype(np.int64)
    boxes = [(np.arange(len(pts)), int(hist_counts.sum()))]
    while len(boxes) < n_colors:
        boxes.sort(key=lambda bx: -bx[1])
        idx, cnt = boxes[0]
        if len(idx) <= 1:
            break
        sub = pts[idx]
        spans = sub.max(axis=0) - sub.min(axis=0)
        ax = int(np.argmax(spans))
        if spans[ax] == 0:
            break
        order = np.argsort(sub[:, ax], kind="stable")
        w = hist_counts[idx][order]
        cum = np.cumsum(w)
        split = int(np.searchsorted(cum, cum[-1] / 2.0)) + 1
        split = min(max(split, 1), len(order) - 1)
        left = idx[order[:split]]
        right = idx[order[split:]]
        boxes = boxes[1:] + [(left, int(hist_counts[left].sum())),
                             (right, int(hist_counts[right].sum()))]
    pal = []
    for idx, cnt in boxes:
        w = hist_counts[idx].astype(np.float64)
        c = (pts[idx] * w[:, None]).sum(axis=0) / w.sum()
        pal.append(((c + 0.5) * (256 // _SIDE)).clip(0, 255))
    return np.asarray(pal, dtype=np.uint8)


def compute_global_palette(images: "ray.data.Dataset", n_colors: int = 256) -> np.ndarray:
    """Pass 1: distributed partial histograms, driver-side merge + cut."""
    codes_all, counts_all = [], []
    for b in images.map_batches(_partial_hist, batch_format="pyarrow") \
                   .iter_batches(batch_format="pyarrow"):
        codes_all.append(np.asarray(b.column("code"), dtype=np.int64))
        counts_all.append(np.asarray(b.column("count"), dtype=np.int64))
    code = np.concatenate(codes_all)
    cnt = np.concatenate(counts_all)
    order = np.argsort(code, kind="stable")
    code, cnt = code[order], cnt[order]
    uniq, start = np.unique(code, return_index=True)
    total = np.add.reduceat(cnt, start)
    return median_cut_palette(uniq, total, n_colors)


def apply_palette(images: "ray.data.Dataset", palette: np.ndarray,
                  dither: bool = False) -> "ray.data.Dataset":
    """Pass 2: broadcast palette; nearest-color map (or Floyd-Steinberg)."""
    pal_ref = ray.put(np.asarray(palette, dtype=np.float64))

    def fn(batch: pa.Table) -> pa.Table:
        pal = ray.get(pal_ref)
        ids, outs = [], []
        bts = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        for i in range(batch.num_rows):
            img = codecs.decode(bts[i], fmts[i])
            if img.ndim == 2:
                img = np.stack([img] * 3, axis=-1)
            rgb = img[:, :, :3].astype(np.float64)
            h, w = rgb.shape[:2]
            if not dither:
                d = ((rgb.reshape(-1, 1, 3) - pal[None, :, :]) ** 2).sum(axis=2)
                idx = d.argmin(axis=1).astype(np.uint8).reshape(h, w)
            else:  # Floyd-Steinberg (gdaldither.cpp serpentine-free variant)
                work = rgb.copy()
                idx = np.zeros((h, w), dtype=np.uint8)
                for y in range(h):
                    for x in range(w):
                        px = work[y, x]
                        j = int(((pal - px) ** 2).sum(axis=1).argmin())
                        idx[y, x] = j
                        err = px - pal[j]
                        if x + 1 < w:
                            work[y, x + 1] += err * 7 / 16
                        if y + 1 < h:
                            if x > 0:
                                work[y + 1, x - 1] += err * 3 / 16
                            work[y + 1, x] += err * 5 / 16
                            if x + 1 < w:
                                work[y + 1, x + 1] += err * 1 / 16
            outs.append(codecs.encode_raw(idx))
            ids.append(batch.column("image_id")[i].as_py())
        return pa.table({"image_id": ids,
                         "bytes": pa.array(outs, pa.binary()),
                         "fmt": pa.array(["raw"] * len(ids))})

    return images.map_batches(fn, batch_format="pyarrow")


def rgb_to_palette(images: "ray.data.Dataset", n_colors: int = 256,
                   dither: bool = False):
    """Full two-pass operator; returns (indexed dataset, palette)."""
    pal = compute_global_palette(images, n_colors)
    return apply_palette(images, pal, dither), pal
