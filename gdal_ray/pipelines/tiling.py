"""The flagship pipeline: decode → warp → XYZ tile pyramid (SURVEY §2.11).

Ray-Data shape (the reference's gdal2tiles/`gdal raster tile` re-expressed):

  1. base tiles:  ``map_batches(WarpTileStage, concurrency=N)`` emits per-
     (tile, image) contributions — the gdal2tiles "plan + create_base_tile"
     steps fused into one streaming stage (no driver-side tile-job list);
  2. composite:   ``groupby(tile_key).map_groups(composite)`` — first-valid-
     pixel-wins mosaic by deterministic image order (gdalalg_raster_mosaic
     first-non-nodata semantics), then PNG-encode;
  3. overviews:   for z-1 … minzoom, ``groupby(parent_key).map_groups``
     mosaics ≤4 children and 2×-downsamples with the area-average reducer
     (gcore/overview.cpp average semantics) — the per-level synchronous
     reduction of gdal2tiles.py:1661-1751, with the object store playing the
     role its filesystem plays;
  4. sink:        partitioned parquet keyed by (z, x-superblock) so a failed
     run resumes per partition (state/checkpoint.py), rows Hilbert-ordered
     within partitions for COG-style locality.

Scale: contributions shuffle once on an int64 key; composite groups are
bounded by overlap count (pre-merge partial compositing inside map_batches
would bound worst-case hot tiles — applied when a skew pre-pass flags cells);
overview groups are ≤4 rows by construction.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..core import codecs, mercator
from ..core.checksum import checksum as gdal_checksum
from ..core.resample import downsample2x
from ..stages.warp import TILE, WarpTileStage

# tile PNGs use fast deflate: level 1 costs ~2ms/tile vs ~11ms at level 6
# for ~40% larger output - the right trade when encode CPU, not storage,
# bounds pipeline throughput (gdal2tiles' default PNG writer is also
# speed-biased)
PNG_LEVEL = 1


def _maybe_decompress(buf: bytes, comp) -> bytes:
    return zlib.decompress(buf) if comp else buf


def composite_bucket(group: pa.Table) -> pa.Table:
    """Composite EVERY tile of one hash bucket in a single call.

    ``groupby().map_groups`` costs ~1-5 ms of dispatch per GROUP; at a
    realistic overlap density most tiles are contested, so grouping by a
    bucket key (tile_key % NB) keeps the exchange co-located per tile
    while amortizing the dispatch over ~hundreds of tiles per call — the
    in-process per-tile loop below is the same work without the per-group
    scheduling tax."""
    keys = np.asarray(group.column("tile_key"), dtype=np.int64)
    order = np.argsort(keys, kind="stable")
    sorted_tbl = group.take(pa.array(order, pa.int64()))
    skeys = keys[order]
    bounds = np.flatnonzero(np.diff(skeys)) + 1
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [len(skeys)]])
    outs = [composite_group(sorted_tbl.slice(s, e - s))
            for s, e in zip(starts, ends)]
    return pa.concat_tables(outs) if outs else _EMPTY_TILES


def composite_group(group: pa.Table) -> pa.Table:
    """First-valid-wins composite of contributions for ONE tile (tie-broken
    by image_id order so output is deterministic regardless of arrival
    order), then PNG encode.  Contributions are sub-windows (wx0, wy0, ww,
    wh) — only the tile region each image touches ships through the
    shuffle.  Runs inside groupby().map_groups.

    Rows may be PLAIN contributions (one source image) or map-side PARTIAL
    composites (``widx`` per-pixel winner index into ``src_ids``).  The
    merge rule is per-pixel MIN source image_id — identical to sequential
    first-valid-wins in id order, but associative, which is what makes the
    map-side combine sound."""
    rgbs = group.column("rgb").to_pylist()
    masks = group.column("mask").to_pylist()
    wx0s = group.column("wx0").to_pylist()
    wy0s = group.column("wy0").to_pylist()
    wws = group.column("ww").to_pylist()
    whs = group.column("wh").to_pylist()
    iids = group.column("image_id").to_pylist()
    comps = (group.column("comp").to_pylist()
             if "comp" in group.column_names else [0] * group.num_rows)
    widxs = (group.column("widx").to_pylist()
             if "widx" in group.column_names else [None] * group.num_rows)
    srcs = (group.column("src_ids").to_pylist()
            if "src_ids" in group.column_names else [None] * group.num_rows)
    nsrcs = (group.column("n_src").to_pylist()
             if "n_src" in group.column_names else [None] * group.num_rows)
    maxlen = 1
    for j in range(group.num_rows):
        for s in (srcs[j] or [iids[j]]):
            maxlen = max(maxlen, len(s))
    rgb_acc = np.zeros((TILE, TILE, 3), dtype=np.uint8)
    mask_acc = np.zeros((TILE, TILE), dtype=bool)
    best_ids = np.full((TILE, TILE), "", dtype=f"<U{maxlen}")
    n_contrib = 0
    for j in range(group.num_rows):
        x0, y0, ww, wh = wx0s[j], wy0s[j], wws[j], whs[j]
        m = np.frombuffer(_maybe_decompress(masks[j], comps[j]),
                          dtype=np.uint8).reshape(wh, ww) > 0
        rgb = np.frombuffer(_maybe_decompress(rgbs[j], comps[j]),
                            dtype=np.uint8).reshape(wh, ww, 3)
        if widxs[j] is not None:
            w = np.frombuffer(_maybe_decompress(widxs[j], comps[j]),
                              dtype=np.uint8).reshape(wh, ww)
            ids_row = np.array(srcs[j], dtype=f"<U{maxlen}")
            cand = ids_row[np.clip(w, 0, len(ids_row) - 1)]
            n_contrib += int(nsrcs[j])
        else:
            cand = np.full((wh, ww), iids[j], dtype=f"<U{maxlen}")
            n_contrib += 1
        sub_mask = mask_acc[y0:y0 + wh, x0:x0 + ww]
        sub_best = best_ids[y0:y0 + wh, x0:x0 + ww]
        better = m & (~sub_mask | (cand < sub_best))
        if better.any():
            rgb_acc[y0:y0 + wh, x0:x0 + ww][better] = rgb[better]
            sub_best[better] = cand[better]
            mask_acc[y0:y0 + wh, x0:x0 + ww] |= better
    rgba = np.concatenate([rgb_acc, (mask_acc.astype(np.uint8) * 255)[:, :, None]],
                          axis=2)
    png = codecs.encode_png(rgba, level=PNG_LEVEL)
    z = group.column("z")[0].as_py()
    x = group.column("x")[0].as_py()
    y = group.column("y")[0].as_py()
    return pa.table({
        "tile_key": pa.array([group.column("tile_key")[0].as_py()], pa.int64()),
        "z": pa.array([z], pa.int32()),
        "x": pa.array([x], pa.int32()),
        "y": pa.array([y], pa.int32()),
        "png": pa.array([png], pa.binary()),
        "checksum": pa.array([gdal_checksum(rgba[:, :, 0])], pa.int32()),
        "n_contrib": pa.array([n_contrib], pa.int32()),
    })


def overview_group(group: pa.Table) -> pa.Table:
    """Mosaic ≤4 child tiles of one parent and 2×-downsample (average).

    Child (x, y) → quadrant ((x%2), (y%2)); TMS y grows northward so child
    y%2==1 is the TOP half of the parent mosaic (gdal2tiles
    create_overview_tile :1466 places children the same way)."""
    canvas = np.zeros((2 * TILE, 2 * TILE, 4), dtype=np.uint8)
    zs = group.column("z").to_pylist()
    xs = group.column("x").to_pylist()
    ys = group.column("y").to_pylist()
    pngs = group.column("png").to_pylist()
    for j in range(group.num_rows):
        img = codecs.decode_png(pngs[j])
        qx = xs[j] % 2
        qy = 1 - (ys[j] % 2)  # TMS: odd child y = northern half = top
        canvas[qy * TILE:(qy + 1) * TILE, qx * TILE:(qx + 1) * TILE] = img
    # average-downsample RGB weighted implicitly by alpha-0 children being
    # transparent; use alpha-aware average: treat alpha==0 as nodata
    rgba = canvas.astype(np.float64)
    alpha = rgba[:, :, 3]
    small = np.zeros((TILE, TILE, 4), dtype=np.uint8)
    a2 = (alpha.reshape(TILE, 2, TILE, 2).mean(axis=(1, 3)))
    wsum = alpha.reshape(TILE, 2, TILE, 2)
    for c in range(3):
        num = (rgba[:, :, c] * alpha).reshape(TILE, 2, TILE, 2).sum(axis=(1, 3))
        den = wsum.sum(axis=(1, 3))
        with np.errstate(invalid="ignore", divide="ignore"):
            v = np.where(den > 0, num / den, 0.0)
        small[:, :, c] = np.clip(np.floor(v + 0.5), 0, 255).astype(np.uint8)
    small[:, :, 3] = np.clip(np.floor(a2 + 0.5), 0, 255).astype(np.uint8)
    pz = zs[0] - 1
    px = xs[0] // 2
    py = ys[0] // 2
    return pa.table({
        "tile_key": pa.array([int(mercator.tile_key(pz, px, py))], pa.int64()),
        "z": pa.array([pz], pa.int32()),
        "x": pa.array([px], pa.int32()),
        "y": pa.array([py], pa.int32()),
        "png": pa.array([codecs.encode_png(small, level=PNG_LEVEL)], pa.binary()),
        "checksum": pa.array([gdal_checksum(small[:, :, 0])], pa.int32()),
        "n_contrib": pa.array([group.num_rows], pa.int32()),
    })


def _parent_key(batch: pa.Table) -> pa.Table:
    z = np.asarray(batch.column("z"))
    x = np.asarray(batch.column("x"))
    y = np.asarray(batch.column("y"))
    pk = mercator.tile_key(z - 1, x // 2, y // 2)
    return batch.append_column("parent_key", pa.array(pk, pa.int64()))


_EMPTY_TILES = pa.table({
    "tile_key": pa.array([], pa.int64()), "z": pa.array([], pa.int32()),
    "x": pa.array([], pa.int32()), "y": pa.array([], pa.int32()),
    "png": pa.array([], pa.binary()), "checksum": pa.array([], pa.int32()),
    "n_contrib": pa.array([], pa.int32())})


def composite_singles(batch: pa.Table) -> pa.Table:
    """Composite rows whose tile has exactly ONE contribution — no shuffle
    needed, each row becomes a finished tile in place.  Vectorized: one
    output table per input block, not per row."""
    if batch.num_rows == 0:
        return _EMPTY_TILES
    rgbs = batch.column("rgb").to_pylist()
    masks = batch.column("mask").to_pylist()
    wx0s = batch.column("wx0").to_pylist()
    wy0s = batch.column("wy0").to_pylist()
    wws = batch.column("ww").to_pylist()
    whs = batch.column("wh").to_pylist()
    comps = (batch.column("comp").to_pylist()
             if "comp" in batch.column_names else [0] * batch.num_rows)
    pngs, sums = [], []
    for j in range(batch.num_rows):
        x0, y0, ww, wh = wx0s[j], wy0s[j], wws[j], whs[j]
        rgba = np.zeros((TILE, TILE, 4), dtype=np.uint8)
        m = np.frombuffer(_maybe_decompress(masks[j], comps[j]),
                          dtype=np.uint8).reshape(wh, ww) > 0
        rgb = np.frombuffer(_maybe_decompress(rgbs[j], comps[j]),
                            dtype=np.uint8).reshape(wh, ww, 3)
        sub = rgba[y0:y0 + wh, x0:x0 + ww]
        sub[:, :, :3][m] = rgb[m]
        sub[:, :, 3][m] = 255
        pngs.append(codecs.encode_png(rgba, level=PNG_LEVEL))
        sums.append(gdal_checksum(rgba[:, :, 0]))
    return pa.table({
        "tile_key": batch.column("tile_key"),
        "z": batch.column("z"),
        "x": batch.column("x"),
        "y": batch.column("y"),
        "png": pa.array(pngs, pa.binary()),
        "checksum": pa.array(sums, pa.int32()),
        "n_contrib": pa.array(
            np.asarray(batch.column("n_src"), dtype=np.int32)
            if "n_src" in batch.column_names
            else np.ones(batch.num_rows, np.int32)),
    })


def base_tiles(images: "ray.data.Dataset", zoom: int, method: str = "bilinear",
               concurrency: int | tuple | None = None, batch_size: int = 16,
               use_actors: bool = False,
               split_singles: bool = True) -> "ray.data.Dataset":
    """images dataset → composited base tiles at `zoom`.

    Scale design (the "minimize shuffles" rule, SURVEY §7):
      - warp emits sub-window contributions (bounded payload);
      - a key-only pre-pass counts contributions per tile (the shuffle moves
        ONLY int64 keys — partial counts combine map-side);
      - tiles with a single contributor (the vast majority on sparse data)
        are composited IN PLACE by a map_batches — no data shuffle at all;
      - only contested tiles go through the sort-shuffle + map_groups
        composite, over a partition count sized to the cluster (each sort
        reduce fetches P fragments, so P² fragment traffic is kept small).

    ``use_actors=True`` runs the warp as an actor pool (the long-lived
    cluster configuration); the default task mode relies on the same
    per-process transformer cache (core.proj.get_transformer) that the
    actor holds — state reuse is identical, but short-lived local runs skip
    the pool spin-up cost.
    """
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    warp_kwargs = dict(batch_format="pyarrow", batch_size=batch_size)
    if use_actors:
        conc = concurrency if concurrency is not None else (max(2, cpus // 2),) * 2
        contribs = images.map_batches(
            WarpTileStage, fn_constructor_kwargs={"zoom": zoom, "method": method},
            concurrency=conc, **warp_kwargs)
    else:
        def warp_fn(batch: pa.Table) -> pa.Table:
            return WarpTileStage(zoom=zoom, method=method)(batch)
        contribs = images.map_batches(warp_fn, **warp_kwargs)

    if not split_singles:
        return contribs.groupby("tile_key").map_groups(composite_group,
                                                       batch_format="pyarrow")

    # ---- multi-contributor tile set from a METADATA-ONLY pre-pass ----
    # Cover keys come from each image's geotransform bbox (no pixel decode),
    # so this pass is ~free, and the count itself is a DISTRIBUTED
    # groupby-sum of int64 keys (shuffle_utils.multi_key_array): neither the
    # full contribution set nor the full histogram ever touches the driver —
    # only the small multi-key set is pulled and broadcast.  The cover set
    # is a superset of the warp's actual contributions (warp drops
    # no-valid-pixel tiles), which only OVER-classifies some tiles as
    # contested — composite_group handles 1-contribution groups exactly.
    from ..stages.warp import image_lonlat_bbox, tile_range_for_bbox
    from .shuffle_utils import multi_key_array

    def cover_keys(b: pa.Table) -> pa.Table:
        gts = b.column("geotransform").to_pylist()
        crss = b.column("crs").to_pylist()
        ws = b.column("w").to_pylist()
        hs = b.column("h").to_pylist()
        keys = []
        for i in range(b.num_rows):
            bbox = image_lonlat_bbox(tuple(gts[i]), crss[i], ws[i], hs[i])
            tminx, tminy, tmaxx, tmaxy = tile_range_for_bbox(*bbox, zoom)
            xs = np.arange(tminx, tmaxx + 1, dtype=np.int64)
            ys = np.arange(tminy, tmaxy + 1, dtype=np.int64)
            gx, gy = np.meshgrid(xs, ys)
            keys.append(mercator.tile_key(zoom, gx.ravel(), gy.ravel()))
        k = np.concatenate(keys) if keys else np.array([], dtype=np.int64)
        return pa.table({"tile_key": pa.array(k.astype(np.int64), pa.int64())})

    meta_cols = [c for c in ("geotransform", "crs", "w", "h")
                 if c in images.schema().names]
    covers = images.select_columns(meta_cols) \
                   .map_batches(cover_keys, batch_format="pyarrow")
    multi = multi_key_array(covers, "tile_key")
    multi_ref = ray.put(multi)

    # ---- fused warp → route: singles composite IN the warp task ----
    # The only materialization holds PNG-compressed finished tiles plus the
    # contested minority's raw contributions — never the full raw
    # contribution set.  (Two consumers need the routed rows, hence the one
    # materialize; both read it without recompute.)
    tile_cols = ["tile_key", "z", "x", "y", "png", "checksum", "n_contrib"]
    contrib_cols = ["tile_key", "z", "x", "y", "image_id", "wx0", "wy0",
                    "ww", "wh", "rgb", "mask", "caption", "comp",
                    "widx", "src_ids", "n_src"]
    unified = [("tile_key", pa.int64()), ("z", pa.int32()), ("x", pa.int32()),
               ("y", pa.int32()), ("is_done", pa.bool_()),
               ("png", pa.binary()), ("checksum", pa.int32()),
               ("n_contrib", pa.int32()), ("image_id", pa.string()),
               ("wx0", pa.int32()), ("wy0", pa.int32()), ("ww", pa.int32()),
               ("wh", pa.int32()), ("rgb", pa.binary()), ("mask", pa.binary()),
               ("caption", pa.string()), ("comp", pa.int8()),
               ("widx", pa.binary()), ("src_ids", pa.list_(pa.string())),
               ("n_src", pa.int32())]

    def _pad(t: pa.Table, done: bool) -> pa.Table:
        cols = []
        for name, typ in unified:
            if name == "is_done":
                cols.append(pa.array(np.full(t.num_rows, done)))
            elif name in t.column_names:
                cols.append(t.column(name).cast(typ))
            else:
                cols.append(pa.nulls(t.num_rows, typ))
        return pa.table(dict(zip([n for n, _ in unified], cols)))

    def route(batch: pa.Table) -> pa.Table:
        m = ray.get(multi_ref)
        keys = np.asarray(batch.column("tile_key"), dtype=np.int64)
        if m.size == 0:
            is_multi = np.zeros(keys.size, dtype=bool)
        else:
            pos = np.clip(np.searchsorted(m, keys), 0, m.size - 1)
            is_multi = m[pos] == keys
        done = composite_singles(batch.filter(pa.array(~is_multi)))
        contested = batch.filter(pa.array(is_multi))
        # MAP-SIDE PARTIAL COMPOSITING (the combiner): same-tile
        # contributions within this batch merge into ONE partial row
        # carrying a per-pixel winner index (first-valid-wins is per-pixel
        # MIN image_id, which is associative, so partials merge exactly in
        # the reduce).  Payloads ship zlib-1 compressed — trading
        # shared-bandwidth bytes for CPU, the resource that scales.
        keys = np.asarray(contested.column("tile_key"), dtype=np.int64)
        if np.unique(keys).size == keys.size:
            # nothing to combine in this batch (spatially-shuffled input):
            # skip the merge machinery, just compress the payloads
            rgb_c = [zlib.compress(v, 1)
                     for v in contested.column("rgb").to_pylist()]
            msk_c = [zlib.compress(v, 1)
                     for v in contested.column("mask").to_pylist()]
            contested = contested.set_column(
                contested.column_names.index("rgb"), "rgb",
                pa.array(rgb_c, pa.binary()))
            contested = contested.set_column(
                contested.column_names.index("mask"), "mask",
                pa.array(msk_c, pa.binary()))
            contested = contested.append_column(
                "comp", pa.array(np.ones(contested.num_rows, np.int8)))
            contested = contested.append_column(
                "n_src", pa.array(np.ones(contested.num_rows, np.int32)))
            return pa.concat_tables([_pad(done, True), _pad(contested, False)])
        iid_arr = np.asarray(contested.column("image_id").to_pylist(),
                             dtype=object)
        order = np.lexsort((iid_arr, keys))
        ct = contested.take(pa.array(order, pa.int64()))
        skeys = keys[order]
        cuts = np.flatnonzero(np.diff(skeys)) + 1
        starts = np.concatenate([[0], cuts]).astype(np.int64)
        ends = np.concatenate([cuts, [len(skeys)]]).astype(np.int64)
        out = {c: [] for c in contrib_cols}
        g_rgb = ct.column("rgb").to_pylist()
        g_msk = ct.column("mask").to_pylist()
        g_iid = ct.column("image_id").to_pylist()
        g_x0 = ct.column("wx0").to_pylist()
        g_y0 = ct.column("wy0").to_pylist()
        g_ww = ct.column("ww").to_pylist()
        g_wh = ct.column("wh").to_pylist()
        g_cap = ct.column("caption").to_pylist()
        # per-pixel min-image_id merge is associative, so a tile with more
        # contributions than widx's uint8 range splits into ≤254-source
        # partial chunks that the reduce merges exactly
        chunked = []
        for s0, e0 in zip(starts, ends):
            while e0 - s0 > 254:
                chunked.append((s0, s0 + 254))
                s0 += 254
            chunked.append((s0, e0))
        for s0, e0 in chunked:
            rows = range(s0, e0)
            if e0 - s0 == 1:
                j = s0
                out["wx0"].append(g_x0[j]); out["wy0"].append(g_y0[j])
                out["ww"].append(g_ww[j]); out["wh"].append(g_wh[j])
                out["rgb"].append(zlib.compress(g_rgb[j], 1))
                out["mask"].append(zlib.compress(g_msk[j], 1))
                out["widx"].append(None)
                out["src_ids"].append(None)
                out["n_src"].append(1)
                out["image_id"].append(g_iid[j])
            else:
                x0 = min(g_x0[j] for j in rows)
                y0 = min(g_y0[j] for j in rows)
                x1 = max(g_x0[j] + g_ww[j] for j in rows)
                y1 = max(g_y0[j] + g_wh[j] for j in rows)
                W, H = x1 - x0, y1 - y0
                rgbM = np.zeros((H, W, 3), np.uint8)
                widxM = np.full((H, W), 255, np.uint8)
                validM = np.zeros((H, W), bool)
                for k, j in enumerate(rows):   # rows sorted by id: first wins
                    ox, oy = g_x0[j] - x0, g_y0[j] - y0
                    m = np.frombuffer(g_msk[j], dtype=np.uint8) \
                        .reshape(g_wh[j], g_ww[j]) > 0
                    rgb = np.frombuffer(g_rgb[j], dtype=np.uint8) \
                        .reshape(g_wh[j], g_ww[j], 3)
                    subv = validM[oy:oy + g_wh[j], ox:ox + g_ww[j]]
                    place = m & ~subv
                    rgbM[oy:oy + g_wh[j], ox:ox + g_ww[j]][place] = rgb[place]
                    widxM[oy:oy + g_wh[j], ox:ox + g_ww[j]][place] = k
                    validM[oy:oy + g_wh[j], ox:ox + g_ww[j]] |= place
                out["wx0"].append(x0); out["wy0"].append(y0)
                out["ww"].append(W); out["wh"].append(H)
                out["rgb"].append(zlib.compress(rgbM.tobytes(), 1))
                out["mask"].append(zlib.compress(
                    (validM.astype(np.uint8) * 255).tobytes(), 1))
                out["widx"].append(zlib.compress(widxM.tobytes(), 1))
                out["src_ids"].append([g_iid[j] for j in rows])
                out["n_src"].append(e0 - s0)
                out["image_id"].append(g_iid[s0])
            out["tile_key"].append(int(skeys[s0]))
            out["z"].append(ct.column("z")[s0].as_py())
            out["x"].append(ct.column("x")[s0].as_py())
            out["y"].append(ct.column("y")[s0].as_py())
            out["caption"].append(g_cap[s0])
            out["comp"].append(1)
        merged = pa.table({
            "tile_key": pa.array(out["tile_key"], pa.int64()),
            "z": pa.array(out["z"], pa.int32()),
            "x": pa.array(out["x"], pa.int32()),
            "y": pa.array(out["y"], pa.int32()),
            "image_id": pa.array(out["image_id"], pa.string()),
            "wx0": pa.array(out["wx0"], pa.int32()),
            "wy0": pa.array(out["wy0"], pa.int32()),
            "ww": pa.array(out["ww"], pa.int32()),
            "wh": pa.array(out["wh"], pa.int32()),
            "rgb": pa.array(out["rgb"], pa.binary()),
            "mask": pa.array(out["mask"], pa.binary()),
            "caption": pa.array(out["caption"], pa.string()),
            "comp": pa.array(out["comp"], pa.int8()),
            "widx": pa.array(out["widx"], pa.binary()),
            "src_ids": pa.array(out["src_ids"], pa.list_(pa.string())),
            "n_src": pa.array(out["n_src"], pa.int32()),
        })
        return pa.concat_tables([_pad(done, True), _pad(merged, False)])

    routed = contribs.map_batches(route, batch_format="pyarrow").materialize()
    finished = routed.map_batches(
        lambda b: b.filter(b.column("is_done")).select(tile_cols),
        batch_format="pyarrow")
    contested_rows = routed.map_batches(
        lambda b: b.filter(pc.invert(b.column("is_done"))).select(contrib_cols),
        batch_format="pyarrow")
    # The metadata cover OVERESTIMATES contested tiles (warp drops
    # no-valid-pixel tiles), and ``map_groups`` costs ~1-5 ms per GROUP —
    # so an exact key-only second count over the contested MINORITY splits
    # out the tiles that truly have one contribution and composites them in
    # place; only genuinely multi-contributor tiles reach the shuffle.
    from .shuffle_utils import multi_key_array as _mka
    true_multi = _mka(contested_rows, "tile_key")
    tm_ref = ray.put(true_multi)

    def _truly(batch: pa.Table, want_multi: bool) -> pa.Table:
        m = ray.get(tm_ref)
        keys = np.asarray(batch.column("tile_key"), dtype=np.int64)
        if m.size == 0:
            mask = np.zeros(keys.size, dtype=bool)
        else:
            pos = np.clip(np.searchsorted(m, keys), 0, m.size - 1)
            mask = m[pos] == keys
        return batch.filter(pa.array(mask if want_multi else ~mask))

    late_singles = contested_rows.map_batches(
        lambda b: composite_singles(_truly(b, False)), batch_format="pyarrow")
    # bucket + partition counts derived from the cluster AND the measured
    # contested-tile count (true_multi) — ~128 KB/contested tile of zlib-1
    # payload is the size estimate for the exchange
    from .shuffle_utils import bucket_count, shuffle_partitions
    nb = np.int64(bucket_count(est_groups=int(true_multi.size)))
    nparts = shuffle_partitions(est_bytes=int(true_multi.size) * (128 << 10))

    def _bucket(batch: pa.Table) -> pa.Table:
        t = _truly(batch, True)
        keys = np.asarray(t.column("tile_key"), dtype=np.int64)
        return t.append_column("bucket", pa.array(keys % nb, pa.int64()))

    contested = contested_rows.map_batches(_bucket, batch_format="pyarrow") \
        .repartition(nparts) \
        .groupby("bucket").map_groups(composite_bucket, batch_format="pyarrow")
    return finished.union(late_singles).union(contested)


def overview_bucket(group: pa.Table) -> pa.Table:
    """All parents of one hash bucket in a single map_groups call (≤4-row
    parent groups pay ~ms-level dispatch each otherwise)."""
    keys = np.asarray(group.column("parent_key"), dtype=np.int64)
    order = np.argsort(keys, kind="stable")
    sorted_tbl = group.take(pa.array(order, pa.int64()))
    skeys = keys[order]
    bounds = np.flatnonzero(np.diff(skeys)) + 1
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [len(skeys)]])
    outs = [overview_group(sorted_tbl.slice(s, e - s))
            for s, e in zip(starts, ends)]
    return pa.concat_tables(outs) if outs else _EMPTY_TILES


def overview_level(tiles: "ray.data.Dataset") -> "ray.data.Dataset":
    """One pyramid reduction step: tiles at z → tiles at z-1 (bucketed
    groupby — see overview_bucket)."""
    from .shuffle_utils import bucket_count
    nb = np.int64(bucket_count())

    def keyed(batch: pa.Table) -> pa.Table:
        t = _parent_key(batch)
        pk = np.asarray(t.column("parent_key"), dtype=np.int64)
        return t.append_column("bucket", pa.array(pk % nb, pa.int64()))

    return (tiles
            .map_batches(keyed, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(overview_bucket, batch_format="pyarrow"))


def tile_pyramid(images: "ray.data.Dataset", max_zoom: int, min_zoom: int,
                 method: str = "bilinear", concurrency: int | tuple = 4,
                 ) -> list["ray.data.Dataset"]:
    """Full pyramid: returns [tiles@max_zoom, ..., tiles@min_zoom].

    Each level is materialized before reducing to the next (the per-level
    barrier is inherent — gdal2tiles has the same synchronous level loop,
    :4547-4563; levels shrink 4× per step so the barrier cost decays
    geometrically)."""
    levels = [base_tiles(images, max_zoom, method=method, concurrency=concurrency).materialize()]
    for z in range(max_zoom - 1, min_zoom - 1, -1):
        levels.append(overview_level(levels[-1]).materialize())
    return levels


def write_tiles(tiles: "ray.data.Dataset", out_dir: str) -> None:
    """Partitioned parquet sink: hive-partitioned by z (resumable units);
    (z,x,y,png,checksum) rows — the MBTiles-style (z,x,y)->blob table."""
    tiles.write_parquet(out_dir, partition_cols=["z"])


def write_tiles_resumable(tiles: "ray.data.Dataset", out_dir: str,
                          run_id: str = "run0", superblock_bits: int = 4) -> int:
    """Checkpointed sink (north_rule): tiles are partitioned by
    (z, x >> superblock_bits) — spatially-local superblocks — and each
    partition writes one parquet file THEN commits a manifest row
    (partition id, tile-key range, row count, lineage id).

    A restarted run reads the manifest and skips finished partitions
    (the anti-join replacement for gdal2tiles' file-stat --resume,
    gdal2tiles.py:1492).  Returns the number of rows written this run.
    """
    import os

    import pyarrow.parquet as pq

    from ..state.checkpoint import CheckpointStore

    store = CheckpointStore(out_dir)
    done = store.finished_partitions()

    def part_key(batch: pa.Table) -> pa.Table:
        z = np.asarray(batch.column("z"), dtype=np.int64)
        x = np.asarray(batch.column("x"), dtype=np.int64)
        return batch.append_column(
            "part_id", pa.array((z << 32) | (x >> superblock_bits), pa.int64()))

    def write_group(group: pa.Table) -> pa.Table:
        pid = f"{group.column('part_id')[0].as_py():016x}"
        if pid in done:
            return pa.table({"part_id": pa.array([pid]),
                             "rows_written": pa.array([0], pa.int64()),
                             "skipped": pa.array([True])})
        data = group.drop_columns(["part_id"])
        path = os.path.join(out_dir, f"tiles-{pid}.parquet")
        tmp = path + f".tmp-{run_id}"
        pq.write_table(data, tmp)
        os.replace(tmp, path)
        keys = np.asarray(group.column("tile_key"), dtype=np.int64)
        store.commit_partition(pid, int(keys.min()), int(keys.max()),
                               group.num_rows, run_id)
        return pa.table({"part_id": pa.array([pid]),
                         "rows_written": pa.array([group.num_rows], pa.int64()),
                         "skipped": pa.array([False])})

    os.makedirs(out_dir, exist_ok=True)
    report = tiles.map_batches(part_key, batch_format="pyarrow") \
                  .groupby("part_id").map_groups(write_group, batch_format="pyarrow")
    total = 0
    for b in report.iter_batches(batch_format="pyarrow"):
        total += int(np.sum(np.asarray(b.column("rows_written"))))
    return total


def mosaic_images(images: "ray.data.Dataset", *, resolution: float,
                  nodata: float | None = None) -> "ray.data.Dataset":
    """Standalone mosaic/stack op (gdalalg_raster_mosaic semantics:
    first-non-nodata wins in deterministic image_id order) — the composite
    of base_tiles exposed without the pyramid: images resample onto a
    common north-up grid of cell size ``resolution`` (degrees), partitioned
    into 256² output chunks keyed like tiles.

    Output rows: (chunk_x, chunk_y, png, checksum, n_contrib) where chunk
    (cx, cy) covers lon ∈ [cx·256·res, …), lat ∈ (…, cy·256·res] on the
    global grid — a resumable, bounded-payload mosaic."""
    import ray

    from ..core import geotransform as gtm
    from ..core.resample import sample as resample_sample

    res = float(resolution)

    def contribs(batch: pa.Table) -> pa.Table:
        out = {"tile_key": [], "z": [], "x": [], "y": [], "image_id": [],
               "wx0": [], "wy0": [], "ww": [], "wh": [],
               "rgb": [], "mask": [], "caption": []}
        bts = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        gts = batch.column("geotransform").to_pylist()
        ids = batch.column("image_id").to_pylist()
        for i in range(batch.num_rows):
            img = codecs.decode(bts[i], fmts[i])
            if img.ndim == 2:
                img = np.stack([img] * 3, axis=-1)
            img = img[:, :, :3]
            gt = tuple(gts[i])
            h, w = img.shape[:2]
            xs = [gt[0], gt[0] + w * gt[1]]
            ys = [gt[3], gt[3] + h * gt[5]]
            minx, maxx = min(xs), max(xs)
            miny, maxy = min(ys), max(ys)
            c0 = int(np.floor(minx / (256 * res)))
            c1 = int(np.floor(maxx / (256 * res)))
            r0 = int(np.floor(miny / (256 * res)))
            r1 = int(np.floor(maxy / (256 * res)))
            inv = gtm.invert(gt)
            for cy in range(r0, r1 + 1):
                for cx in range(c0, c1 + 1):
                    ox = cx * 256 * res
                    oy = (cy + 1) * 256 * res  # top of chunk
                    px = ox + (np.arange(256) + 0.5) * res
                    py = oy - (np.arange(256) + 0.5) * res
                    gx, gy = np.meshgrid(px, py)
                    sx, sy = gtm.apply(inv, gx.ravel(), gy.ravel())
                    vals, valid = resample_sample(
                        img, sx.reshape(256, 256), sy.reshape(256, 256),
                        method="bilinear", nodata=nodata)
                    if not valid.any():
                        continue
                    rgb = np.clip(np.floor(vals + 0.5), 0, 255).astype(np.uint8)
                    rgb[~valid] = 0
                    out["tile_key"].append((int(cx) << 32) | (int(cy) & 0xFFFFFFFF))
                    out["z"].append(0)
                    out["x"].append(int(cx)); out["y"].append(int(cy))
                    out["image_id"].append(ids[i])
                    out["wx0"].append(0); out["wy0"].append(0)
                    out["ww"].append(256); out["wh"].append(256)
                    out["rgb"].append(np.ascontiguousarray(rgb).tobytes())
                    out["mask"].append((valid.astype(np.uint8) * 255).tobytes())
                    out["caption"].append("")
        return pa.table({
            "tile_key": pa.array(out["tile_key"], pa.int64()),
            "z": pa.array(out["z"], pa.int32()),
            "x": pa.array(out["x"], pa.int32()),
            "y": pa.array(out["y"], pa.int32()),
            "image_id": pa.array(out["image_id"], pa.string()),
            "wx0": pa.array(out["wx0"], pa.int32()),
            "wy0": pa.array(out["wy0"], pa.int32()),
            "ww": pa.array(out["ww"], pa.int32()),
            "wh": pa.array(out["wh"], pa.int32()),
            "rgb": pa.array(out["rgb"], pa.binary()),
            "mask": pa.array(out["mask"], pa.binary()),
            "caption": pa.array(out["caption"], pa.string()),
        })

    # Same singles/bucket routing as base_tiles (VERDICT r3 #2): tiles with
    # ONE contribution composite in place with zero shuffle; only genuinely
    # multi-contributor tiles shuffle, grouped by a hash bucket so the
    # ~1-5 ms map_groups dispatch amortizes over many tiles per call.
    from .shuffle_utils import bucket_count, multi_key_array, shuffle_partitions

    def _compress(t: pa.Table) -> pa.Table:
        rgb_c = [zlib.compress(v, 1) for v in t.column("rgb").to_pylist()]
        msk_c = [zlib.compress(v, 1) for v in t.column("mask").to_pylist()]
        t = t.set_column(t.column_names.index("rgb"), "rgb",
                         pa.array(rgb_c, pa.binary()))
        t = t.set_column(t.column_names.index("mask"), "mask",
                         pa.array(msk_c, pa.binary()))
        return t.append_column("comp",
                               pa.array(np.ones(t.num_rows, np.int8)))

    rows = images.map_batches(contribs, batch_format="pyarrow") \
                 .map_batches(_compress, batch_format="pyarrow").materialize()
    multi = multi_key_array(rows, "tile_key")
    m_ref = ray.put(multi)

    def _split(batch: pa.Table, want_multi: bool) -> pa.Table:
        m = ray.get(m_ref)
        keys = np.asarray(batch.column("tile_key"), dtype=np.int64)
        if m.size == 0:
            mask = np.zeros(keys.size, dtype=bool)
        else:
            pos = np.clip(np.searchsorted(m, keys), 0, m.size - 1)
            mask = m[pos] == keys
        return batch.filter(pa.array(mask if want_multi else ~mask))

    singles = rows.map_batches(
        lambda b: composite_singles(_split(b, False)), batch_format="pyarrow")
    nb = np.int64(bucket_count(est_groups=int(multi.size)))
    nparts = shuffle_partitions(est_bytes=int(multi.size) * (128 << 10))

    def _bucket(batch: pa.Table) -> pa.Table:
        t = _split(batch, True)
        keys = np.asarray(t.column("tile_key"), dtype=np.int64)
        return t.append_column("bucket", pa.array(keys % nb, pa.int64()))

    contested = rows.map_batches(_bucket, batch_format="pyarrow") \
        .repartition(nparts) \
        .groupby("bucket").map_groups(composite_bucket, batch_format="pyarrow")
    return singles.union(contested)
