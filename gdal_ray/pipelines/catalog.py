"""Catalog / sink utilities: tile index, hive-partitioned vector write,
Hilbert-ordered tile layout, phash near-dup.

  - build_tile_index: `gdal raster index` / gdaltindex (apps/gdaltindex_lib
    .cpp) — one footprint polygon + metadata row per raster: the "catalog"
    table that drives mosaic reads and PIP joins.
  - write_partitioned: `gdal vector partition` (apps/gdalalg_vector_partition
    .cpp:30-167) — hive-partitioned parquet by field values; nulls land in
    ``__HIVE_DEFAULT_PARTITION__`` exactly like the reference.
  - write_tiles_hilbert: COG-style spatial layout (frmts/gtiff/cogdriver.cpp
    ordered tile writes; alg/hilbert.cpp): sort tiles by Hilbert code of the
    tile center before writing so byte-adjacent rows are map-adjacent.
  - phash_neardup_pairs: near-duplicate images by perceptual-hash hamming
    distance ≤ t (SURVEY §2.8 — the extension the phash column exists for),
    same pigeonhole block-bucket design as simhash.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..core import hilbert, mercator
from ..stages.footprint import footprints
from .shuffle_utils import filter_multi_keys


def build_tile_index(images: "ray.data.Dataset") -> "ray.data.Dataset":
    """images → catalog rows (image_id, wkb footprint, lon/lat bbox)."""
    def fn(b: pa.Table) -> pa.Table:
        fp = footprints(b)
        from ..core import geom, wkb
        bbs = [geom.rings_bbox(wkb.as_polygons(wkb.loads(w))[0])
               for w in fp.column("wkb").to_pylist()]
        return pa.table({
            "image_id": fp.column("image_id"),
            "wkb": fp.column("wkb"),
            "minx": pa.array([b_[0] for b_ in bbs], pa.float64()),
            "miny": pa.array([b_[1] for b_ in bbs], pa.float64()),
            "maxx": pa.array([b_[2] for b_ in bbs], pa.float64()),
            "maxy": pa.array([b_[3] for b_ in bbs], pa.float64()),
        })

    return images.map_batches(fn, batch_format="pyarrow")


def write_partitioned(ds: "ray.data.Dataset", out_dir: str,
                      partition_cols: list[str]) -> None:
    """Hive-partitioned parquet (gdal vector partition field-scheme); Ray's
    writer uses the same `col=value` directory layout, with nulls mapped to
    __HIVE_DEFAULT_PARTITION__ first (reference null marker,
    gdalalg_vector_partition.cpp:98)."""
    import pyarrow.compute as pc

    def fill_nulls(b: pa.Table) -> pa.Table:
        for c in partition_cols:
            col = b.column(c)
            if col.null_count:
                b = b.set_column(b.column_names.index(c), c,
                                 pc.fill_null(col, "__HIVE_DEFAULT_PARTITION__"))
        return b

    ds.map_batches(fill_nulls, batch_format="pyarrow") \
      .write_parquet(out_dir, partition_cols=partition_cols)


def write_tiles_hilbert(tiles: "ray.data.Dataset", out_dir: str,
                        order: int = 14) -> None:
    """Spatially-ordered tile sink: sort by Hilbert code of the tile center
    (the `gdal vector sort` / COG layout rule) then write."""
    def key(b: pa.Table) -> pa.Table:
        z = np.asarray(b.column("z"), dtype=np.int64)
        x = np.asarray(b.column("x"), dtype=np.float64)
        y = np.asarray(b.column("y"), dtype=np.float64)
        mminx, mminy, mmaxx, mmaxy = mercator.tile_bounds(x, y, z)
        cx = (np.asarray(mminx) + np.asarray(mmaxx)) / 2.0
        cy = (np.asarray(mminy) + np.asarray(mmaxy)) / 2.0
        n = np.int64(1) << order
        gx = np.clip(((cx + mercator.ORIGIN_SHIFT) / (2 * mercator.ORIGIN_SHIFT) * n).astype(np.int64), 0, n - 1)
        gy = np.clip(((cy + mercator.ORIGIN_SHIFT) / (2 * mercator.ORIGIN_SHIFT) * n).astype(np.int64), 0, n - 1)
        return b.append_column("hkey", pa.array(hilbert.hilbert_d(gx, gy, order), pa.int64()))

    tiles.map_batches(key, batch_format="pyarrow").sort("hkey") \
        .write_parquet(out_dir)


def write_cog(images: "ray.data.Dataset", out_dir: str, *,
              tile_size: int = 256, compression: str = "deflate",
              resampling: str = "average",
              predictor: int | None = None) -> "ray.data.Dataset":
    """Single-file cloud-optimized GeoTIFF sink (the reference's COG driver,
    frmts/gtiff/cogdriver.cpp): each image becomes ONE .tif with all IFDs at
    the head and tile data ordered smallest-overview-first.

    One file per input row (file-per-task, embarrassingly parallel — no
    shuffle); returns the manifest Dataset (image_id, path, n_bytes,
    n_levels) so callers can checkpoint / verify without re-reading files.
    """
    import os

    from ..core import codecs as CD
    from ..core import tiff as TF

    os.makedirs(out_dir, exist_ok=True)

    def fn(b: pa.Table) -> pa.Table:
        ids, paths, sizes, nlvls = [], [], [], []
        has_gt = "geotransform" in b.column_names
        for i in range(b.num_rows):
            iid = b.column("image_id")[i].as_py()
            img = CD.decode(b.column("bytes")[i].as_py(),
                            b.column("fmt")[i].as_py())
            gt = (list(b.column("geotransform")[i].as_py())
                  if has_gt and b.column("geotransform")[i].is_valid else None)
            payload = TF.encode_cog(img, tile_size=tile_size,
                                    compression=compression,
                                    resampling=resampling, predictor=predictor,
                                    geotransform=gt,
                                    epsg=4326 if gt is not None else None)
            path = os.path.join(out_dir, f"{iid}.tif")
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(payload)
            os.replace(tmp, path)
            ids.append(iid)
            paths.append(path)
            sizes.append(len(payload))
            nlvls.append(len(TF.decode_tiff_all(payload)))
        return pa.table({"image_id": pa.array(ids, pa.string()),
                         "path": pa.array(paths, pa.string()),
                         "n_bytes": pa.array(sizes, pa.int64()),
                         "n_levels": pa.array(nlvls, pa.int64())})

    return images.map_batches(fn, batch_format="pyarrow")


def phash_neardup_pairs(images: "ray.data.Dataset", *, max_hamming: int = 3,
                        id_col: str = "image_id", phash_col: str = "phash",
                        ) -> "ray.data.Dataset":
    """Image pairs whose 64-bit perceptual hashes differ by ≤ max_hamming
    bits.  Pigeonhole bucketing on (max_hamming+1) 16-bit blocks; verify by
    exact popcount; exactly-once by first-matching-block."""
    nblocks = max_hamming + 1
    bits = 64 // nblocks

    def expand(b: pa.Table) -> pa.Table:
        signed = np.asarray(b.column(phash_col), dtype=np.int64)
        ph = signed.view(np.uint64)  # two's-complement reinterpretation
        blocks = np.arange(nblocks, dtype=np.int64)
        vals = ((ph[:, None] >> (blocks * bits).astype(np.uint64)[None, :])
                & np.uint64((1 << bits) - 1)).astype(np.int64)
        bval = (blocks[None, :] << 60) | vals
        ids = b.column(id_col).to_pylist()
        return pa.table({
            id_col: pa.array(np.repeat(ids, nblocks)),
            "bval": pa.array(bval.ravel(), pa.int64()),
            "phash_u": pa.array(np.repeat(signed, nblocks), pa.int64()),
        })

    def pairs(g: pa.Table) -> pa.Table:
        out_a, out_b, out_d = [], [], []
        n = g.num_rows
        if n >= 2:
            ids = g.column(id_col).to_pylist()
            blk = int(g.column("bval")[0].as_py()) >> 60
            ph = np.asarray(g.column("phash_u"), dtype=np.int64).view(np.uint64)
            for i in range(n):
                for j in range(i + 1, n):
                    if ids[i] == ids[j]:
                        continue
                    x = int(ph[i]) ^ int(ph[j])
                    d = bin(x).count("1")
                    if d > max_hamming:
                        continue
                    first = next(pb for pb in range(nblocks)
                                 if (x >> (pb * bits)) & ((1 << bits) - 1) == 0)
                    if first == blk:
                        a, b2 = sorted((ids[i], ids[j]))
                        out_a.append(a); out_b.append(b2); out_d.append(d)
        return pa.table({"id_a": pa.array(out_a, pa.string()),
                         "id_b": pa.array(out_b, pa.string()),
                         "hamming": pa.array(out_d, pa.int32())})

    rows = images.map_batches(expand, batch_format="pyarrow").materialize()
    from .shuffle_utils import grouped_map_groups
    return grouped_map_groups(filter_multi_keys(rows, "bval"),
                              "bval", pairs)


def write_pmtiles(tiles: "ray.data.Dataset", out_dir: str, *,
                  tile_type: str = "mvt", payload_col: str = "mvt",
                  metadata: dict | None = None) -> "ray.data.Dataset":
    """PMTiles v3 sink (ogr/ogrsf_frmts/pmtiles analog): one archive per
    block of (z, x, y, payload) rows — the partitioned-archive shape the
    root-directory-only writer requires and the resumable-output story
    wants (re-runs re-produce identical content-hash names).  Returns the
    manifest Dataset (path, n_tiles, n_bytes)."""
    import hashlib
    import os

    from ..core import pmtiles as PMT

    os.makedirs(out_dir, exist_ok=True)

    def fn(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_tiles": pa.array([], pa.int64()),
                             "n_bytes": pa.array([], pa.int64())})
        rows = list(zip(
            (int(v) for v in b.column("z").to_pylist()),
            (int(v) for v in b.column("x").to_pylist()),
            (int(v) for v in b.column("y").to_pylist()),
            b.column(payload_col).to_pylist()))
        blob = PMT.encode_pmtiles(rows, tile_type=tile_type,
                                  metadata=metadata)
        name = hashlib.md5(blob).hexdigest()[:16]
        path = os.path.join(out_dir, f"part-{name}.pmtiles")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        return pa.table({"path": pa.array([path], pa.string()),
                         "n_tiles": pa.array([b.num_rows], pa.int64()),
                         "n_bytes": pa.array([len(blob)], pa.int64())})

    return tiles.map_batches(fn, batch_format="pyarrow")


def read_pmtiles(paths) -> "ray.data.Dataset":
    """One task per .pmtiles archive → (z, x, y, payload) rows."""
    from ..core import pmtiles as PMT

    if isinstance(paths, str):
        paths = [paths]
    ds = ray.data.from_items([{"path": p} for p in paths])

    def load(b: pa.Table) -> pa.Table:
        zs, xs, ys, ps = [], [], [], []
        for p in b.column("path").to_pylist():
            with open(p, "rb") as f:
                tiles, _meta = PMT.decode_pmtiles(f.read())
            for z, x, y, payload in tiles:
                zs.append(z); xs.append(x); ys.append(y); ps.append(payload)
        return pa.table({"z": pa.array(zs, pa.int64()),
                         "x": pa.array(xs, pa.int64()),
                         "y": pa.array(ys, pa.int64()),
                         "payload": pa.array(ps, pa.binary())})

    return ds.map_batches(load, batch_format="pyarrow", batch_size=1)


def read_zarr_chunks(path: str) -> "ray.data.Dataset":
    """Zarr v2 store -> one row PER CHUNK (ci, cj, data bytes, valid_h,
    valid_w, dtype) — the chunk grid IS the parallelism (frmts/zarr
    analog, Ray-native shape: each chunk file is an independent ranged
    read; edge chunks carry their cropped valid extent)."""
    from ..core import zarr2 as Z

    meta = Z.read_zarr_meta(path)
    h, w = meta["shape"]
    ch, cw = meta["chunks"]
    items = [{"path": path, "ci": ci, "cj": cj} for ci, cj in
             Z.chunk_grid(meta)]
    ds = ray.data.from_items(items)

    def load(b: pa.Table) -> pa.Table:
        cis = b.column("ci").to_pylist()
        cjs = b.column("cj").to_pylist()
        out = {"ci": [], "cj": [], "data": [], "valid_h": [], "valid_w": [],
               "dtype": []}
        for ci, cj in zip(cis, cjs):
            blk = Z.read_zarr_chunk(path, meta, ci, cj)
            out["ci"].append(ci)
            out["cj"].append(cj)
            out["data"].append(blk.tobytes())
            out["valid_h"].append(min(ch, h - ci * ch))
            out["valid_w"].append(min(cw, w - cj * cw))
            out["dtype"].append(str(blk.dtype))
        return pa.table({
            "ci": pa.array(out["ci"], pa.int64()),
            "cj": pa.array(out["cj"], pa.int64()),
            "data": pa.array(out["data"], pa.binary()),
            "valid_h": pa.array(out["valid_h"], pa.int64()),
            "valid_w": pa.array(out["valid_w"], pa.int64()),
            "dtype": pa.array(out["dtype"], pa.string())})

    return ds.map_batches(load, batch_format="pyarrow")


def mbtiles_bytes(rows, *, fmt: str = "pbf",
                  metadata: dict | None = None) -> bytes:
    """(z, x, y XYZ, payload) rows -> a complete MBTiles 1.3 sqlite
    database (frmts/mbtiles analog; spec: github.com/mapbox/mbtiles-spec).
    MBTiles stores TMS rows — tile_row = 2^z - 1 - y — and a metadata
    key/value table.  stdlib sqlite3 Connection.serialize, no file."""
    import sqlite3

    con = sqlite3.connect(":memory:")
    con.execute("CREATE TABLE metadata (name TEXT, value TEXT)")
    con.execute("""CREATE TABLE tiles (zoom_level INTEGER,
        tile_column INTEGER, tile_row INTEGER, tile_data BLOB)""")
    con.execute("""CREATE UNIQUE INDEX tile_index ON tiles
        (zoom_level, tile_column, tile_row)""")
    meta = {"name": "gdal_ray", "format": fmt, **(metadata or {})}
    con.executemany("INSERT INTO metadata VALUES (?,?)",
                    sorted(meta.items()))
    con.executemany(
        "INSERT INTO tiles VALUES (?,?,?,?)",
        [(int(z), int(x), (1 << int(z)) - 1 - int(y),
          sqlite3.Binary(p)) for z, x, y, p in rows])
    con.commit()
    return bytes(con.serialize())


def parse_mbtiles_bytes(data: bytes):
    """MBTiles bytes -> ([(z, x, y XYZ, payload)], metadata dict)."""
    import sqlite3

    con = sqlite3.connect(":memory:")
    con.deserialize(data)
    meta = dict(con.execute("SELECT name, value FROM metadata"))
    tiles = [(z, x, (1 << z) - 1 - r, bytes(p)) for z, x, r, p in
             con.execute("SELECT zoom_level, tile_column, tile_row, "
                         "tile_data FROM tiles")]
    return tiles, meta


def write_mbtiles(tiles: "ray.data.Dataset", out_dir: str, *,
                  fmt: str = "pbf", payload_col: str = "mvt",
                  metadata: dict | None = None) -> "ray.data.Dataset":
    """MBTiles sink: one .mbtiles database per block (partitioned-archive
    shape, content-hash names); returns the manifest Dataset."""
    import hashlib
    import os

    os.makedirs(out_dir, exist_ok=True)

    def fn(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_tiles": pa.array([], pa.int64()),
                             "n_bytes": pa.array([], pa.int64())})
        rows = list(zip(b.column("z").to_pylist(),
                        b.column("x").to_pylist(),
                        b.column("y").to_pylist(),
                        b.column(payload_col).to_pylist()))
        blob = mbtiles_bytes(rows, fmt=fmt, metadata=metadata)
        name = hashlib.md5(blob).hexdigest()[:16]
        path = os.path.join(out_dir, f"part-{name}.mbtiles")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        return pa.table({"path": pa.array([path], pa.string()),
                         "n_tiles": pa.array([b.num_rows], pa.int64()),
                         "n_bytes": pa.array([len(blob)], pa.int64())})

    return tiles.map_batches(fn, batch_format="pyarrow")


def read_mbtiles(paths) -> "ray.data.Dataset":
    """One task per .mbtiles database → (z, x, y, payload) rows."""
    if isinstance(paths, str):
        paths = [paths]
    ds = ray.data.from_items([{"path": p} for p in paths])

    def load(b: pa.Table) -> pa.Table:
        zs, xs, ys, ps = [], [], [], []
        for p in b.column("path").to_pylist():
            with open(p, "rb") as f:
                tiles, _ = parse_mbtiles_bytes(f.read())
            for z, x, y, payload in tiles:
                zs.append(z); xs.append(x); ys.append(y); ps.append(payload)
        return pa.table({"z": pa.array(zs, pa.int64()),
                         "x": pa.array(xs, pa.int64()),
                         "y": pa.array(ys, pa.int64()),
                         "payload": pa.array(ps, pa.binary())})

    return ds.map_batches(load, batch_format="pyarrow", batch_size=1)


def gpkg_tiles_bytes(rows, *, table: str = "tiles",
                     tile_format: str = "pbf") -> bytes:
    """(z, x, y XYZ, payload) rows -> a complete GeoPackage TILE pyramid
    database (OGC 12-128r14 §2.2 — the raster-tiles half of the
    reference's GPKG driver, ogr/ogrsf_frmts/gpkg/gdalgeopackagedataset):
    gpkg_contents data_type='tiles', gpkg_tile_matrix_set over the web-
    mercator extent, one gpkg_tile_matrix row per zoom, tile_row
    TOP-DOWN (XYZ order — unlike MBTiles' TMS flip)."""
    import sqlite3

    from ..core import mercator as M

    OS = 20037508.342789244
    con = sqlite3.connect(":memory:")
    con.execute("PRAGMA application_id = 1196444487")
    con.execute("PRAGMA user_version = 10301")
    con.execute("""CREATE TABLE gpkg_spatial_ref_sys (
        srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
        organization TEXT NOT NULL,
        organization_coordsys_id INTEGER NOT NULL,
        definition TEXT NOT NULL, description TEXT)""")
    con.execute(
        "INSERT INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,NULL)",
        ("WGS 84 / Pseudo-Mercator", 3857, "EPSG", 3857,
         'PROJCS["WGS 84 / Pseudo-Mercator"]'))
    con.execute("""CREATE TABLE gpkg_contents (
        table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL,
        identifier TEXT UNIQUE, description TEXT DEFAULT '',
        last_change DATETIME NOT NULL,
        min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,
        srs_id INTEGER)""")
    con.execute(
        "INSERT INTO gpkg_contents VALUES (?,?,?,?,?,?,?,?,?,?)",
        (table, "tiles", table, f"format={tile_format}",
         "2000-01-01T00:00:00.000Z", -OS, -OS, OS, OS, 3857))
    con.execute("""CREATE TABLE gpkg_tile_matrix_set (
        table_name TEXT NOT NULL PRIMARY KEY, srs_id INTEGER NOT NULL,
        min_x DOUBLE NOT NULL, min_y DOUBLE NOT NULL,
        max_x DOUBLE NOT NULL, max_y DOUBLE NOT NULL)""")
    con.execute("INSERT INTO gpkg_tile_matrix_set VALUES (?,?,?,?,?,?)",
                (table, 3857, -OS, -OS, OS, OS))
    con.execute("""CREATE TABLE gpkg_tile_matrix (
        table_name TEXT NOT NULL, zoom_level INTEGER NOT NULL,
        matrix_width INTEGER NOT NULL, matrix_height INTEGER NOT NULL,
        tile_width INTEGER NOT NULL, tile_height INTEGER NOT NULL,
        pixel_x_size DOUBLE NOT NULL, pixel_y_size DOUBLE NOT NULL,
        CONSTRAINT pk_ttm PRIMARY KEY (table_name, zoom_level))""")
    zooms = sorted({int(z) for z, *_ in rows})
    for z in zooms:
        res = float(M.resolution(z))
        con.execute("INSERT INTO gpkg_tile_matrix VALUES (?,?,?,?,?,?,?,?)",
                    (table, z, 1 << z, 1 << z, 256, 256, res, res))
    con.execute(f"""CREATE TABLE "{table}" (
        id INTEGER PRIMARY KEY AUTOINCREMENT,
        zoom_level INTEGER NOT NULL, tile_column INTEGER NOT NULL,
        tile_row INTEGER NOT NULL, tile_data BLOB NOT NULL,
        UNIQUE (zoom_level, tile_column, tile_row))""")
    con.executemany(
        f'INSERT INTO "{table}" (zoom_level, tile_column, tile_row, '
        "tile_data) VALUES (?,?,?,?)",
        [(int(z), int(x), int(y), sqlite3.Binary(p))
         for z, x, y, p in rows])
    con.commit()
    return bytes(con.serialize())


def parse_gpkg_tiles_bytes(data: bytes, *, table: str | None = None):
    """GPKG tile-pyramid bytes -> ([(z, x, y, payload)], zoom levels)."""
    import sqlite3

    con = sqlite3.connect(":memory:")
    con.deserialize(data)
    if table is None:
        table = con.execute("SELECT table_name FROM gpkg_contents "
                            "WHERE data_type='tiles'").fetchone()[0]
    tiles = [(z, x, y, bytes(p)) for z, x, y, p in
             con.execute(f'SELECT zoom_level, tile_column, tile_row, '
                         f'tile_data FROM "{table}"')]
    zooms = [r[0] for r in con.execute(
        "SELECT zoom_level FROM gpkg_tile_matrix WHERE table_name=? "
        "ORDER BY zoom_level", (table,))]
    return tiles, zooms


def write_gpkg_tiles(tiles: "ray.data.Dataset", out_dir: str, *,
                     table: str = "tiles", tile_format: str = "pbf",
                     payload_col: str = "mvt") -> "ray.data.Dataset":
    """GPKG tile-pyramid sink: one .gpkg per block (partitioned-archive
    shape, content-hash names); returns the manifest Dataset."""
    import hashlib
    import os

    os.makedirs(out_dir, exist_ok=True)

    def fn(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_tiles": pa.array([], pa.int64()),
                             "n_bytes": pa.array([], pa.int64())})
        rows = list(zip(b.column("z").to_pylist(),
                        b.column("x").to_pylist(),
                        b.column("y").to_pylist(),
                        b.column(payload_col).to_pylist()))
        blob = gpkg_tiles_bytes(rows, table=table, tile_format=tile_format)
        name = hashlib.md5(blob).hexdigest()[:16]
        path = os.path.join(out_dir, f"part-{name}.gpkg")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        return pa.table({"path": pa.array([path], pa.string()),
                         "n_tiles": pa.array([b.num_rows], pa.int64()),
                         "n_bytes": pa.array([len(blob)], pa.int64())})

    return tiles.map_batches(fn, batch_format="pyarrow")


def read_gpkg_tiles(paths) -> "ray.data.Dataset":
    """One task per tile-pyramid .gpkg → (z, x, y, payload) rows."""
    if isinstance(paths, str):
        paths = [paths]
    ds = ray.data.from_items([{"path": p} for p in paths])

    def load(b: pa.Table) -> pa.Table:
        zs, xs, ys, ps = [], [], [], []
        for p in b.column("path").to_pylist():
            with open(p, "rb") as f:
                tiles, _ = parse_gpkg_tiles_bytes(f.read())
            for z, x, y, payload in tiles:
                zs.append(z); xs.append(x); ys.append(y); ps.append(payload)
        return pa.table({"z": pa.array(zs, pa.int64()),
                         "x": pa.array(xs, pa.int64()),
                         "y": pa.array(ys, pa.int64()),
                         "payload": pa.array(ps, pa.binary())})

    return ds.map_batches(load, batch_format="pyarrow", batch_size=1)
