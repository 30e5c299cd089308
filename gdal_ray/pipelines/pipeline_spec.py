"""Serialized pipeline spec + named-stage registry — the engine's analog of
the reference's ``gdalg`` serialized-pipeline driver
(frmts/gdalg/gdalgdriver.cpp) and ``gdal pipeline`` app
(apps/gdalalg_pipeline.cpp): a pipeline is data, not code.

A spec is JSON (or the ``"read … ! op … ! write …"`` one-liner the CLI
uses) naming registered stages:

    {"steps": [
        {"op": "read_parquet", "path": "/data/images"},
        {"op": "hillshade", "z_factor": 2.0},
        {"op": "write_parquet", "path": "/out/shaded"}]}

``run_pipeline`` resolves each step against the registry and chains them
over one Ray Dataset.  Users extend the engine by registering their own
stages (``@register("my-op")``) — the user-extension surface of SURVEY
§2.13.  Stage callables take ``(dataset_or_None, **params)`` and return a
Dataset (sources receive None; sinks return the input unchanged after
writing).
"""

from __future__ import annotations

import json
import shlex

import ray.data

_REGISTRY: dict = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


def registered_stages() -> list[str]:
    return sorted(_REGISTRY)


def _batch_stage(fn, **fixed):
    """Adapt a (pa.Table, **kw) -> pa.Table UDF into a pipeline stage."""
    def stage(ds, **params):
        kw = {**fixed, **params}
        return ds.map_batches(lambda b: fn(b, **kw), batch_format="pyarrow")
    return stage


# ---------- sources ----------

@register("read_parquet")
def _read_parquet(ds, path: str, columns=None):
    assert ds is None, "read_parquet must be the first step"
    if path.startswith("/vsi"):
        # VSI-style cloud/memory paths (reference: port/cpl_vsil_*.cpp) —
        # resolve once, pass the Arrow filesystem through
        from ..sources import vsi
        return vsi.read_parquet(path, columns=columns)
    return ray.data.read_parquet(path, columns=columns)


@register("read_geojson")
def _read_geojson(ds, path):
    from ..sources.vector_formats import read_geojson
    assert ds is None
    return read_geojson(path)


@register("read_shapefile")
def _read_shapefile(ds, path):
    from ..sources.vector_formats import read_shapefile
    assert ds is None
    return read_shapefile(path)


@register("read_gpkg")
def _read_gpkg(ds, path, table=None):
    from ..sources.vector_formats import read_gpkg
    assert ds is None
    return read_gpkg(path, table=table)


@register("read_flatgeobuf")
def _read_flatgeobuf(ds, path):
    from ..sources.vector_formats import read_flatgeobuf
    assert ds is None
    return read_flatgeobuf(path)


@register("read_spatialite")
def _read_spatialite(ds, path, table=None):
    from ..sources.vector_formats import read_spatialite
    assert ds is None
    return read_spatialite(path, table=table)


@register("read_topojson")
def _read_topojson(ds, path):
    from ..sources.vector_formats import read_topojson
    assert ds is None
    return read_topojson(path)


@register("read_georss")
def _read_georss(ds, path):
    from ..sources.vector_formats import read_georss
    assert ds is None
    return read_georss(path)


@register("read_raster_files")
def _read_raster_files(ds, path, fmt=None):
    from ..sources.raster_files import read_raster_files
    assert ds is None
    return read_raster_files(path, fmt=fmt)


@register("read_geoparquet")
def _read_geoparquet(ds, path):
    from ..sources.vector_formats import read_geoparquet
    assert ds is None
    return read_geoparquet(path)


@register("read_wasp")
def _read_wasp(ds, path):
    from ..sources.vector_formats import read_wasp
    assert ds is None
    return read_wasp(path)


@register("read_vdv")
def _read_vdv(ds, path, table=None):
    from ..sources.vector_formats import read_vdv
    assert ds is None
    return read_vdv(path, table=table)


@register("read_s57")
def _read_s57(ds, path):
    from ..sources.vector_formats import read_s57
    assert ds is None
    return read_s57(path)


@register("read_dgn")
def _read_dgn(ds, path):
    from ..sources.vector_formats import read_dgn
    assert ds is None
    return read_dgn(path)


@register("read_gmt")
def _read_gmt(ds, path):
    from ..sources.vector_formats import read_gmt
    assert ds is None
    return read_gmt(path)


@register("read_ods")
def _read_ods(ds, path, sheet=None):
    from ..sources.vector_formats import read_ods
    assert ds is None
    return read_ods(path, sheet=sheet)


@register("read_xlsx")
def _read_xlsx(ds, path, sheet=None):
    from ..sources.vector_formats import read_xlsx
    assert ds is None
    return read_xlsx(path, sheet=sheet)


@register("read_gtfs")
def _read_gtfs(ds, path, table: str = "stops"):
    from ..sources.vector_formats import read_gtfs
    assert ds is None
    return read_gtfs(path, table=table)


@register("read_jsonfg")
def _read_jsonfg(ds, path):
    from ..sources.vector_formats import read_jsonfg
    assert ds is None
    return read_jsonfg(path)


@register("read_csv")
def _read_csv(ds, path):
    from ..sources.vector_formats import read_csv
    assert ds is None
    return read_csv(path)


@register("read_gpx")
def _read_gpx(ds, path):
    from ..sources.vector_formats import read_gpx
    assert ds is None
    return read_gpx(path)


@register("read_kml")
def _read_kml(ds, path):
    from ..sources.vector_formats import read_kml
    assert ds is None
    return read_kml(path)


@register("read_geojsonseq")
def _read_geojsonseq(ds, path):
    from ..sources.vector_formats import read_geojsonseq
    assert ds is None
    return read_geojsonseq(path)


@register("read_gml")
def _read_gml(ds, path):
    from ..sources.vector_formats import read_gml
    assert ds is None
    return read_gml(path)


@register("read_osm_pbf")
def _read_osm_pbf(ds, path):
    from ..sources.vector_formats import read_osm_pbf
    assert ds is None
    return read_osm_pbf(path)


@register("read_mif")
def _read_mif(ds, path):
    from ..sources.vector_formats import read_mif
    assert ds is None
    return read_mif(path)


@register("read_dxf")
def _read_dxf(ds, path):
    from ..sources.vector_formats import read_dxf
    assert ds is None
    return read_dxf(path)


@register("read_arrow")
def _read_arrow(ds, path):
    from ..sources.vector_formats import read_arrow_ipc
    assert ds is None
    return read_arrow_ipc(path)


# ---------- sinks ----------

@register("write_geojson")
def _write_geojson(ds, out_dir: str, wkb_col: str = "wkb"):
    from ..sources.vector_writers import write_geojson
    return write_geojson(ds, out_dir, wkb_col=wkb_col)


@register("write_gpkg")
def _write_gpkg(ds, out_dir: str, table: str = "layer", srs_id=4326,
                wkb_col: str = "wkb"):
    from ..sources.vector_writers import write_gpkg
    return write_gpkg(ds, out_dir, table=table, srs_id=int(srs_id),
                      wkb_col=wkb_col)


@register("write_spatialite")
def _write_spatialite(ds, out_dir: str, table: str = "layer", srid=4326,
                      wkb_col: str = "wkb"):
    from ..sources.vector_writers import write_spatialite
    return write_spatialite(ds, out_dir, table=table, srid=int(srid),
                            wkb_col=wkb_col)


@register("write_georss")
def _write_georss(ds, out_dir: str, title_col: str = "title",
                  wkb_col: str = "wkb"):
    from ..sources.vector_writers import write_georss
    return write_georss(ds, out_dir, title_col=title_col, wkb_col=wkb_col)


@register("write_geoparquet")
def _write_geoparquet(ds, out_dir: str, wkb_col: str = "wkb"):
    from ..sources.vector_writers import write_geoparquet
    return write_geoparquet(ds, out_dir, wkb_col=wkb_col)


@register("write_wasp")
def _write_wasp(ds, out_dir: str, wkb_col: str = "wkb"):
    from ..sources.vector_writers import write_wasp
    return write_wasp(ds, out_dir, wkb_col=wkb_col)


@register("write_vdv")
def _write_vdv(ds, out_dir: str, table: str = "layer"):
    from ..sources.vector_writers import write_vdv
    return write_vdv(ds, out_dir, table=table)


@register("write_s57")
def _write_s57(ds, out_dir: str, wkb_col: str = "wkb"):
    from ..sources.vector_writers import write_s57
    return write_s57(ds, out_dir, wkb_col=wkb_col)


@register("write_dgn")
def _write_dgn(ds, out_dir: str, wkb_col: str = "wkb"):
    from ..sources.vector_writers import write_dgn
    return write_dgn(ds, out_dir, wkb_col=wkb_col)


@register("write_gmt")
def _write_gmt(ds, out_dir: str, wkb_col: str = "wkb"):
    from ..sources.vector_writers import write_gmt
    return write_gmt(ds, out_dir, wkb_col=wkb_col)


@register("write_ods")
def _write_ods(ds, out_dir: str, sheet: str = "Sheet1"):
    from ..sources.vector_writers import write_ods
    return write_ods(ds, out_dir, sheet=sheet)


@register("write_xlsx")
def _write_xlsx(ds, out_dir: str, sheet: str = "Sheet1"):
    from ..sources.vector_writers import write_xlsx
    return write_xlsx(ds, out_dir, sheet=sheet)


@register("write_jsonfg")
def _write_jsonfg(ds, out_dir: str, wkb_col: str = "wkb"):
    from ..sources.vector_writers import write_jsonfg
    return write_jsonfg(ds, out_dir, wkb_col=wkb_col)


@register("write_shapefile")
def _write_shapefile(ds, out_dir: str, wkb_col: str = "wkb"):
    from ..sources.vector_writers import write_shapefile
    return write_shapefile(ds, out_dir, wkb_col=wkb_col)


@register("write_flatgeobuf")
def _write_flatgeobuf(ds, out_dir: str, wkb_col: str = "wkb"):
    from ..sources.vector_writers import write_flatgeobuf
    return write_flatgeobuf(ds, out_dir, wkb_col=wkb_col)


@register("write_csv")
def _write_csv(ds, out_dir: str, wkb_col: str = "wkb"):
    from ..sources.vector_writers import write_csv
    return write_csv(ds, out_dir, wkb_col=wkb_col)


@register("write_gpx")
def _write_gpx(ds, out_dir: str, wkb_col: str = "wkb"):
    from ..sources.vector_writers import write_gpx
    return write_gpx(ds, out_dir, wkb_col=wkb_col)


@register("write_kml")
def _write_kml(ds, out_dir: str, wkb_col: str = "wkb"):
    from ..sources.vector_writers import write_kml
    return write_kml(ds, out_dir, wkb_col=wkb_col)


@register("write_geojsonseq")
def _write_geojsonseq(ds, out_dir: str, wkb_col: str = "wkb"):
    from ..sources.vector_writers import write_geojsonseq
    return write_geojsonseq(ds, out_dir, wkb_col=wkb_col)


@register("write_gml")
def _write_gml(ds, out_dir: str, wkb_col: str = "wkb"):
    from ..sources.vector_writers import write_gml
    return write_gml(ds, out_dir, wkb_col=wkb_col)


@register("write_mif")
def _write_mif(ds, out_dir: str, wkb_col: str = "wkb"):
    from ..sources.vector_writers import write_mif
    return write_mif(ds, out_dir, wkb_col=wkb_col)


@register("write_dxf")
def _write_dxf(ds, out_dir: str, wkb_col: str = "wkb"):
    from ..sources.vector_writers import write_dxf
    return write_dxf(ds, out_dir, wkb_col=wkb_col)


@register("write_arrow")
def _write_arrow(ds, out_dir: str):
    from ..sources.vector_writers import write_arrow_ipc
    return write_arrow_ipc(ds, out_dir)


@register("write_pmtiles")
def _write_pmtiles(ds, out_dir: str, tile_type: str = "mvt",
                   payload_col: str = "mvt"):
    from .catalog import write_pmtiles
    return write_pmtiles(ds, out_dir, tile_type=tile_type,
                         payload_col=payload_col)


@register("read_pmtiles")
def _read_pmtiles(ds, path):
    from .catalog import read_pmtiles
    assert ds is None
    return read_pmtiles(path)


@register("write_mbtiles")
def _write_mbtiles(ds, out_dir: str, fmt: str = "pbf",
                   payload_col: str = "mvt"):
    from .catalog import write_mbtiles
    return write_mbtiles(ds, out_dir, fmt=fmt, payload_col=payload_col)


@register("read_mbtiles")
def _read_mbtiles(ds, path):
    from .catalog import read_mbtiles
    assert ds is None
    return read_mbtiles(path)


@register("write_gpkg_tiles")
def _write_gpkg_tiles(ds, out_dir: str, payload_col: str = "mvt"):
    from .catalog import write_gpkg_tiles
    return write_gpkg_tiles(ds, out_dir, payload_col=payload_col)


@register("write_cog")
def _write_cog(ds, out_dir: str, tile_size=256, compression: str = "deflate",
               resampling: str = "average"):
    from .catalog import write_cog
    return write_cog(ds, out_dir, tile_size=int(tile_size),
                     compression=compression, resampling=resampling)


@register("write_parquet")
def _write_parquet(ds, path: str, partition_cols=None):
    kw = {"partition_cols": partition_cols} if partition_cols else {}
    if path.startswith("/vsi"):
        from ..sources import vsi
        fs, rel = vsi.resolve(path)
        ds.write_parquet(rel, filesystem=fs, **kw)
    else:
        ds.write_parquet(path, **kw)
    return ds


@register("tee")
def _tee(ds, path: str):
    """gdal pipeline `tee` (apps/gdalalg_pipeline.cpp): write a snapshot of
    the stream mid-pipeline and keep flowing downstream unchanged."""
    ds = ds.materialize()     # one compute pass feeds both consumers
    ds.write_parquet(path)
    return ds


@register("materialize")
def _materialize(ds):
    """Pin the stream at this point (ray.data materialize): downstream
    steps re-read blocks from the object store instead of recomputing."""
    return ds.materialize()


# ---------- relational ----------

@register("select")
def _select(ds, columns):
    if isinstance(columns, str):
        columns = [c.strip() for c in columns.split(",") if c.strip()]
    return ds.select_columns(list(columns))


@register("filter")
def _filter(ds, where: str):
    """SQL WHERE filter (``-where`` analog, ogr/swq_op_general.cpp
    semantics): parsed ONCE on the driver, evaluated vectorized per batch."""
    from ..functions.expr import filter_table, parse_expr
    ast = parse_expr(where)   # syntax errors fail fast, before execution
    return ds.map_batches(lambda b: filter_table(b, ast),
                          batch_format="pyarrow")


@register("sql_select")
def _sql_select(ds, exprs: str):
    """SQL select list with computed fields: ``exprs="*, pop/area AS dens"``."""
    from ..functions.expr import project_table
    return ds.map_batches(lambda b: project_table(b, exprs),
                          batch_format="pyarrow")


@register("sql")
def _sql(ds, query: str, tables=None):
    """Full single-statement SQL (the ``ogr_gensql.cpp`` surface in one
    stage): SELECT with aggregates / GROUP BY / HAVING / single-key JOIN /
    ORDER BY / LIMIT over the piped dataset (named ``input``) plus any
    extra parquet tables (``tables={"name": path}``)."""
    import ray.data

    from ..functions.sql import run_sql
    tbl = {"input": ds}
    for name, path in (tables or {}).items():
        tbl[name] = ray.data.read_parquet(path)
    return run_sql(tbl, query)


@register("limit")
def _limit(ds, n: int):
    return ds.limit(int(n))


@register("sort")
def _sort(ds, key, descending=False):
    return ds.sort(key, descending=bool(descending))


@register("repartition")
def _repartition(ds, n: int):
    return ds.repartition(int(n))


# ---------- vector stages ----------

def _register_vector():
    from ..stages import vector as V
    _REGISTRY["simplify"] = lambda ds, tolerance=0.0: ds.map_batches(
        lambda b: V.simplify(b, float(tolerance)), batch_format="pyarrow")
    _REGISTRY["segmentize"] = lambda ds, max_len: ds.map_batches(
        lambda b: V.segmentize(b, float(max_len)), batch_format="pyarrow")
    _REGISTRY["swap_xy"] = _batch_stage(V.swap_xy)
    _REGISTRY["convex_hull"] = _batch_stage(V.convex_hull)
    _REGISTRY["concave_hull"] = _batch_stage(V.concave_hull)
    _REGISTRY["centroids"] = _batch_stage(V.centroids)
    _REGISTRY["area"] = _batch_stage(V.area_col)
    _REGISTRY["explode_collections"] = _batch_stage(V.explode_collections)
    _REGISTRY["make_point"] = _batch_stage(V.make_point)
    _REGISTRY["make_valid"] = _batch_stage(V.make_valid_full)
    _REGISTRY["buffer"] = lambda ds, dist, quadsegs=8: ds.map_batches(
        lambda b: V.buffer_polygons(b, float(dist), int(quadsegs)),
        batch_format="pyarrow")
    _REGISTRY["check_geometry"] = _batch_stage(V.check_geometry)
    _REGISTRY["hilbert_key"] = _batch_stage(V.hilbert_key)
    _REGISTRY["clip_bbox"] = lambda ds, minx, miny, maxx, maxy: ds.map_batches(
        lambda b: V.clip_to_bbox(b, float(minx), float(miny), float(maxx),
                                 float(maxy)), batch_format="pyarrow")

    from ..pipelines import layer_algebra as LA
    _REGISTRY["simplify_coverage"] = \
        lambda ds, tolerance, partition_col=None, level=None: \
        LA.simplify_coverage(
            ds, float(tolerance), partition_col=partition_col,
            level=None if level is None else int(level))


# ---------- raster stages ----------

def _register_raster():
    from ..stages import dem as D
    from ..stages import raster as R1
    from ..stages import raster2 as R2
    _REGISTRY["hillshade"] = lambda ds, **kw: ds.map_batches(
        lambda b: R1.hillshade(b, **{k: float(v) for k, v in kw.items()}),
        batch_format="pyarrow")
    _REGISTRY["translate"] = lambda ds, **kw: ds.map_batches(
        lambda b: R1.translate(b, **kw), batch_format="pyarrow")
    _REGISTRY["aspect"] = _batch_stage(D.aspect)
    _REGISTRY["tpi"] = _batch_stage(D.tpi)
    _REGISTRY["tri"] = _batch_stage(D.tri)
    _REGISTRY["calc"] = lambda ds, expr, **kw: ds.map_batches(
        lambda b: R2.calc(b, expr, **kw), batch_format="pyarrow")
    _REGISTRY["sieve"] = lambda ds, threshold=4: ds.map_batches(
        lambda b: R2.sieve(b, threshold=int(threshold)),
        batch_format="pyarrow")
    _REGISTRY["fill_nodata"] = _batch_stage(R2.fill_nodata)
    _REGISTRY["fill_nodata_idw"] = lambda ds, max_distance=100, \
        smoothing_iterations=0: ds.map_batches(
            lambda b: R2.fill_nodata_idw(
                b, max_distance=int(max_distance),
                smoothing_iterations=int(smoothing_iterations)),
            batch_format="pyarrow")
    _REGISTRY["clean_collar"] = _batch_stage(R2.clean_collar)
    _REGISTRY["color_map"] = _batch_stage(R2.color_map)
    _REGISTRY["nodata_to_alpha"] = _batch_stage(R2.nodata_to_alpha)
    _REGISTRY["viewshed"] = lambda ds, obs_height=2.0: ds.map_batches(
        lambda b: D.viewshed(b, obs_height=float(obs_height)),
        batch_format="pyarrow")
    _REGISTRY["blend"] = lambda ds, opacity=0.5: ds.map_batches(
        lambda b: R2.blend(b, opacity=float(opacity)),
        batch_format="pyarrow")
    _REGISTRY["raster_update"] = _batch_stage(R2.raster_update)
    _REGISTRY["edit_geotransform"] = lambda ds, gt=None, offset=None, \
        scale=None, nodata="keep": ds.map_batches(
            lambda b: R2.edit_geotransform(
                b,
                gt=None if gt is None else [float(v) for v in
                                            (gt.split(",") if
                                             isinstance(gt, str) else gt)],
                offset=None if offset is None else
                [float(v) for v in (offset.split(",") if
                                    isinstance(offset, str) else offset)],
                scale=None if scale is None else
                [float(v) for v in (scale.split(",") if
                                    isinstance(scale, str) else scale)],
                nodata=nodata), batch_format="pyarrow")
    _REGISTRY["compare"] = _batch_stage(R2.compare_images)
    _REGISTRY["equalize"] = _batch_stage(R2.equalize)
    from ..stages import vector as V2
    _REGISTRY["layer_info"] = lambda ds, wkb_col="wkb": \
        __import__("ray").data.from_arrow(V2.layer_info(ds, wkb_col=wkb_col))
    _REGISTRY["cutline"] = lambda ds, cut_wkt, nodata=0, invert=False: \
        ds.map_batches(
            lambda b: R2.cutline(b, cut_wkt, nodata=int(nodata),
                                 invert=bool(invert)),
            batch_format="pyarrow")

    from ..pipelines import tiling as T
    _REGISTRY["mosaic"] = lambda ds, resolution, nodata=None: T.mosaic_images(
        ds, resolution=float(resolution), nodata=nodata)
    _REGISTRY["base_tiles"] = lambda ds, zoom: T.base_tiles(ds, int(zoom))
    from ..pipelines import vectortiles as VT
    _REGISTRY["vector_tiles"] = lambda ds, zoom, layer="points": \
        VT.point_vector_tiles(ds, int(zoom), layer=layer)


def _register_trainingdata():
    from ..pipelines import dedup as DD
    from ..pipelines import text as TX
    _REGISTRY["exact_dedup"] = lambda ds, key_col="text", id_col="doc_id": \
        DD.exact_dedup(ds, key_col=key_col, id_col=id_col)
    _REGISTRY["minhash_pairs"] = lambda ds, threshold=0.7, **kw: \
        DD.minhash_lsh_pairs(ds, threshold=float(threshold), **kw)
    _REGISTRY["simhash_pairs"] = lambda ds, max_hamming=3: \
        DD.simhash_pairs(ds, max_hamming=int(max_hamming))
    _REGISTRY["ngram_jaccard_pairs"] = lambda ds, threshold=0.8: \
        DD.ngram_jaccard_pairs(ds, threshold=float(threshold))
    _REGISTRY["embedding_neardup"] = lambda ds, threshold=0.95: \
        DD.embedding_neardup_pairs(ds, threshold=float(threshold))
    _REGISTRY["connected_components"] = \
        lambda ds, id_a="id_a", id_b="id_b": \
        DD.connected_components(ds, id_a=id_a, id_b=id_b)
    _REGISTRY["dedup_keep"] = lambda ds, pairs, id_col="doc_id": \
        DD.dedup_keep(ds, pairs, id_col=id_col)
    from ..pipelines import graph as GR
    _REGISTRY["pagerank"] = lambda ds, iters=3: \
        GR.pagerank(ds, iters=int(iters))
    _REGISTRY["triangles"] = lambda ds, src_col="src", dst_col="dst": \
        GR.triangles(ds, src_col=src_col, dst_col=dst_col)
    _REGISTRY["upsert_latest"] = lambda ds, key_col, version_col: \
        DD.upsert_latest(ds, key_col, version_col)
    _REGISTRY["tfidf_top_term"] = lambda ds, text_col="text", \
        id_col="doc_id": TX.tfidf_top_term(ds, text_col=text_col,
                                           id_col=id_col)
    _REGISTRY["contamination"] = lambda ds, k=7, rate_num=1, rate_den=10: \
        DD.contamination(ds, k=int(k), rate_num=int(rate_num),
                         rate_den=int(rate_den))
    _REGISTRY["sequence_pack"] = lambda ds, capacity=512: \
        TX.sequence_pack(ds, capacity=int(capacity))
    _REGISTRY["bpe_pair_counts"] = lambda ds, top_k=32: \
        TX.bpe_pair_counts(ds, top_k=int(top_k))
    _REGISTRY["source_cap"] = lambda ds, key_col="source", id_col="doc_id", \
        cap=50: TX.source_cap(ds, key_col=key_col, id_col=id_col,
                              cap=int(cap))
    _REGISTRY["unigram_logprob"] = lambda ds, text_col="text", \
        id_col="doc_id": TX.unigram_logprob(ds, text_col=text_col,
                                            id_col=id_col)
    _REGISTRY["bpe_train"] = lambda ds, n_merges=3, text_col="text": \
        __import__("ray").data.from_arrow(
            TX.bpe_train(ds, n_merges=int(n_merges), text_col=text_col))
    _REGISTRY["temperature_mix"] = lambda ds, alpha=0.5, \
        key_col="source", id_col="doc_id": TX.temperature_mix(
            ds, alpha=float(alpha), key_col=key_col, id_col=id_col)
    _REGISTRY["langid"] = _batch_stage(TX.detect_language)
    _REGISTRY["text_quality"] = _batch_stage(TX.quality_score)
    _REGISTRY["token_count"] = _batch_stage(TX.token_count)
    _REGISTRY["fingerprint"] = _batch_stage(TX.fingerprint)
    _REGISTRY["repetition_score"] = _batch_stage(TX.repetition_score)
    _REGISTRY["c4_quality_filter"] = _batch_stage(TX.c4_quality_filter)
    _REGISTRY["pii_scrub"] = _batch_stage(TX.pii_scrub)
    _REGISTRY["segment_dedup"] = lambda ds, seg_words=10: \
        TX.segment_dedup(ds, seg_words=int(seg_words))
    _REGISTRY["span_dedup"] = lambda ds, k=5: \
        DD.span_dedup(ds, k=int(k))
    _REGISTRY["importance_weights"] = lambda ds, target_val="en": \
        TX.importance_weights(ds, target_val=str(target_val))
    from ..pipelines import ann as ANN
    _REGISTRY["pca_top_component"] = lambda ds, dim=64, iters=4: \
        ray.data.from_arrow(ANN.pca_top_component(ds, dim=int(dim),
                                                  iters=int(iters)))
    _REGISTRY["kmeans_assign"] = lambda ds, k=4, iters=3: \
        ANN.kmeans_assign(ds, k=int(k), iters=int(iters))
    _REGISTRY["chunk_tokens"] = lambda ds, window=64, stride=48: \
        ds.map_batches(lambda b: TX.chunk_tokens(
            b, window=int(window), stride=int(stride)),
            batch_format="pyarrow")

    from ..pipelines import sketches as SK
    _REGISTRY["hll_registers"] = lambda ds, col, b=10: \
        SK.hll_registers(ds, col, b=int(b))
    _REGISTRY["bloom_bits"] = lambda ds, col, m_bits=1 << 17, k=4: \
        SK.bloom_bits(ds, col, m_bits=int(m_bits), k=int(k))
    _REGISTRY["countmin"] = lambda ds, col, w_buckets=1 << 14, d=4: \
        SK.countmin_counters(ds, col, w_buckets=int(w_buckets), d=int(d))
    _REGISTRY["hll_grouped"] = lambda ds, col, group_col, b=10: \
        ray.data.from_arrow(SK.hll_grouped_estimates(
            ds, col, group_col, b=int(b)))

    from ..pipelines import quantile as QT
    _REGISTRY["exact_quantiles"] = lambda ds, col, pcts="25,50,75": \
        ray.data.from_arrow(QT.exact_quantiles(
            ds, col, [int(p) for p in str(pcts).split(",")]))

    from ..stages import multimodal as MM
    _REGISTRY["image_features"] = lambda ds, on_error="raise", batch_size=32: \
        ds.map_batches(MM.ImageFeatureStage(on_error=on_error),
                       batch_format="pyarrow", batch_size=int(batch_size))
    _REGISTRY["phash"] = lambda ds, batch_size=32: ds.map_batches(
        MM.perceptual_hash, batch_format="pyarrow",
        batch_size=int(batch_size))
    _REGISTRY["audio_decode"] = lambda ds, batch_size=32: \
        ds.map_batches(MM.AudioDecodeStage(),
                       batch_format="pyarrow", batch_size=int(batch_size))
    _REGISTRY["video_frames"] = lambda ds, every=1.0, batch_size=8: \
        ds.map_batches(MM.VideoFrameSampleStage(every_n_seconds=float(every)),
                       batch_format="pyarrow", batch_size=int(batch_size))


_register_vector()
_register_raster()
_register_trainingdata()


def parse_pipeline(text: str) -> dict:
    """CLI one-liner → spec: steps separated by '!', each 'opname k=v …'
    (the gdal pipeline grammar, apps/gdalalg_pipeline.cpp)."""
    steps = []
    for chunk in text.split("!"):
        toks = shlex.split(chunk.strip())
        if not toks:
            continue
        step: dict = {"op": toks[0]}
        for t in toks[1:]:
            k, _, v = t.partition("=")
            try:
                v = json.loads(v)
            except (ValueError, json.JSONDecodeError):
                # bare comma list: columns=[fid,area] (shell ate the quotes)
                if v.startswith("[") and v.endswith("]"):
                    v = [s.strip() for s in v[1:-1].split(",") if s.strip()]
            step[k] = v
        steps.append(step)
    return {"steps": steps}


def run_pipeline(spec, source: "ray.data.Dataset | None" = None) -> "ray.data.Dataset":
    """Execute a serialized pipeline spec (dict, JSON string, CLI
    one-liner, or bare step list) and return the resulting Dataset.
    ``source`` seeds the stream for specs that start mid-pipeline
    (no read stage) — the programmatic-embedding case."""
    if isinstance(spec, str):
        spec = parse_pipeline(spec) if "!" in spec or not spec.lstrip().startswith("{") \
            else json.loads(spec)
    if isinstance(spec, list):
        spec = {"steps": spec}
    ds = source
    for step in spec["steps"]:
        params = {k: v for k, v in step.items() if k != "op"}
        op = step["op"]
        if op not in _REGISTRY:
            raise ValueError(f"unknown pipeline stage {op!r}; "
                             f"registered: {registered_stages()}")
        ds = _REGISTRY[op](ds, **params)
    return ds
