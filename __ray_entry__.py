"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship decode→warp→tile→PIP-join pipeline on a
deterministic synthetic image catalog sized from sf0.001.  ``queries()``
exposes one callable per implemented operator family (SURVEY.md §2);
``oracle_sql()`` holds the matching DuckDB SQL (same column names — the
driver compares row counts, schemas and order-insensitive value hashes).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on a synthetic catalog: images → warp → base tiles
    at z=9 → composite; returns the tile dataset (z, x, y, png, checksum)."""
    import ray.data

    from gdal_ray.core import fixtures
    from gdal_ray.pipelines import tiling

    images = ray.data.from_arrow(fixtures.images_table(96))
    tiles = tiling.base_tiles(images, zoom=9, concurrency=2, batch_size=16)
    return tiles


def queries() -> dict[str, Callable[[str], Any]]:
    from gdal_ray.pipelines import relational as R

    def _geo_rasterize(sf_dir: str):
        """Rasterize nation-derived rects at z=5; per-tile burned pixel
        counts (rows-only driver check; exact oracle in pytest)."""
        import ray.data

        from gdal_ray.pipelines.rasterize import rasterize
        rects = R._read(sf_dir, "nation").map_batches(R._nation_rects,
                                                      batch_format="pyarrow")
        out = rasterize(rects, zoom=5, burn_value=1.0, merge_alg="add",
                        id_col="poly_id")
        return out.select_columns(["z", "x", "y", "burned_px"])

    def _geo_polygonize(sf_dir: str):
        """Polygonize a deterministic quantized catalog (rows-only check;
        exact component oracle in pytest)."""
        import numpy as np
        import ray.data

        from gdal_ray.core import fixtures
        from gdal_ray.pipelines.polygonize import polygonize
        from gdal_ray.stages.raster import reclassify_fn
        images = ray.data.from_arrow(fixtures.images_table(24))
        # quantize to 4 levels so components are meaty
        lut = {v: (v // 64) * 64 for v in range(256)}
        quant = images.map_batches(reclassify_fn(lut), batch_format="pyarrow")
        return quant.map_batches(polygonize, batch_format="pyarrow") \
                    .select_columns(["image_id", "value", "pix_count"])

    def _minhash_neardup(sf_dir: str):
        import ray.data

        from gdal_ray.pipelines.dedup import minhash_lsh_pairs
        docs = R._read(sf_dir, "documents")
        return minhash_lsh_pairs(docs, threshold=0.7)

    def _simhash_neardup(sf_dir: str):
        from gdal_ray.pipelines.dedup import simhash_pairs
        return simhash_pairs(R._read(sf_dir, "documents"), max_hamming=3)

    def _langid(sf_dir: str):
        from gdal_ray.pipelines.text import detect_language
        ds = R._read(sf_dir, "documents").select_columns(["doc_id", "text"])
        return ds.map_batches(detect_language, batch_format="pyarrow")

    def _band_stats(sf_dir: str):
        import ray.data

        from gdal_ray.core import fixtures
        from gdal_ray.pipelines.raster_ops import band_statistics
        return band_statistics(ray.data.from_arrow(fixtures.images_table(40)))

    def _as_features(sf_dir: str):
        import ray.data

        from gdal_ray.core import fixtures
        from gdal_ray.pipelines.raster_ops import as_features
        ds = ray.data.from_arrow(fixtures.images_table(12))
        return ds.map_batches(lambda b: as_features(b, step=4), batch_format="pyarrow")

    def _pixel_info(sf_dir: str):
        import numpy as np
        import ray.data

        from gdal_ray.core import fixtures
        from gdal_ray.pipelines.raster_ops import pixel_info
        pts = fixtures.points_table(200)
        ds = ray.data.from_arrow(fixtures.images_table(40))
        return pixel_info(ds, lon=np.asarray(pts.column("x")),
                          lat=np.asarray(pts.column("y")),
                          point_ids=pts.column("point_id").to_pylist(),
                          concurrency=2)

    def _hillshade(sf_dir: str):
        import ray.data

        from gdal_ray.core import fixtures
        from gdal_ray.stages.raster import hillshade
        ds = ray.data.from_arrow(fixtures.images_table(24))
        return ds.map_batches(hillshade, batch_format="pyarrow") \
                 .select_columns(["image_id", "fmt"])

    def _translate(sf_dir: str):
        import ray.data

        from gdal_ray.core import fixtures
        from gdal_ray.stages.raster import translate
        ds = ray.data.from_arrow(fixtures.images_table(24))
        out = ds.map_batches(
            lambda b: translate(b, scale=(0, 255, 10, 200), out_size=(32, 32),
                                out_fmt="png"), batch_format="pyarrow")
        return out.select_columns(["image_id", "w", "h", "fmt", "caption"])

    def _vector_sort(sf_dir: str):
        import ray.data

        from gdal_ray.core import fixtures
        from gdal_ray.stages.vector import hilbert_key
        polys = ray.data.from_arrow(fixtures.polygons_table(64))
        return polys.map_batches(hilbert_key, batch_format="pyarrow") \
                    .sort("hilbert").select_columns(["poly_id", "hilbert"])

    def _knn_idw(sf_dir: str):
        import numpy as np
        import ray.data

        from gdal_ray.core import fixtures
        from gdal_ray.pipelines.knn import idw_interpolate
        pts = fixtures.points_table(500)
        ref = fixtures.points_table(100)
        ref_xy = np.column_stack([np.asarray(ref.column("x")), np.asarray(ref.column("y"))])
        ref_v = np.asarray(ref.column("value"))
        return idw_interpolate(ray.data.from_arrow(pts), ref_xy, ref_v,
                               concurrency=2)

    def _ann_ivf(sf_dir: str):
        import numpy as np

        from gdal_ray.pipelines.ann import ivf_topk
        emb = R._read(sf_dir, "embeddings")
        head = emb.sort("vec_id").limit(3).take_all()
        Q = np.array([r["embedding"] for r in head], dtype=np.float64)
        return ivf_topk(emb, Q, [int(r["vec_id"]) for r in head], k=5,
                        n_centroids=8, nprobe=4, concurrency=2)

    def _dedup_embedding(sf_dir: str):
        """Embedding near-dup: the sf tables are random vectors (max pairwise
        cosine ≈ 0.48 — no true near-dups), so the query injects
        deterministic perturbed copies of the first 20 vectors; the operator
        must find exactly those planted pairs (verified in pytest)."""
        import numpy as np
        import pyarrow as pa
        import ray.data

        from gdal_ray.pipelines.dedup import embedding_neardup_pairs
        emb = R._read(sf_dir, "embeddings")
        head = emb.sort("vec_id").limit(20).take_all()
        rng = np.random.default_rng(7)
        vecs = [(np.asarray(r["embedding"], dtype=np.float64)
                 + rng.normal(0, 1e-4, len(r["embedding"]))).tolist() for r in head]
        planted = pa.table({
            "vec_id": pa.array([int(r["vec_id"]) + 1_000_000 for r in head], pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([0] * len(head), pa.int32()),
        })
        both = emb.union(ray.data.from_arrow(planted))
        return embedding_neardup_pairs(both, threshold=0.999)

    def _text_quality(sf_dir: str):
        from gdal_ray.pipelines.text import quality_score
        ds = R._read(sf_dir, "documents").select_columns(["doc_id", "text"])
        return ds.map_batches(quality_score, batch_format="pyarrow")

    def _text_fingerprint(sf_dir: str):
        from gdal_ray.pipelines.text import fingerprint
        ds = R._read(sf_dir, "documents").select_columns(["doc_id", "text"])
        return ds.map_batches(fingerprint, batch_format="pyarrow")

    def _dedup_phash(sf_dir: str):
        """phash hamming near-dup: random 64-bit hashes have ~32-bit pairwise
        distance, so (as with embeddings) the query plants perturbed copies
        of the first 10 hashes (≤3 bit flips) that the operator must find."""
        import pyarrow as pa
        import ray.data

        from gdal_ray.core import fixtures
        from gdal_ray.pipelines.catalog import phash_neardup_pairs
        base = fixtures.images_table(256).select(["image_id", "phash"])
        ph = base.column("phash").to_pylist()[:10]
        planted = pa.table({
            "image_id": pa.array([f"dup{i:02d}" for i in range(10)]),
            "phash": pa.array([p ^ (0b1 << (i % 60)) ^ (0b1 << ((i * 7) % 60))
                               for i, p in enumerate(ph)], pa.int64()),
        })
        ds = ray.data.from_arrow(pa.concat_tables([base, planted]))
        return phash_neardup_pairs(ds, max_hamming=3)

    def _raster_tindex(sf_dir: str):
        import ray.data

        from gdal_ray.core import fixtures
        from gdal_ray.pipelines.catalog import build_tile_index
        ds = ray.data.from_arrow(fixtures.images_table(48))
        return build_tile_index(ds).select_columns(
            ["image_id", "minx", "miny", "maxx", "maxy"])

    def _grid_metrics(sf_dir: str):
        import numpy as np
        import ray.data

        from gdal_ray.core import fixtures
        from gdal_ray.pipelines.knn import grid_metrics
        pts = fixtures.points_table(400)
        ref = fixtures.points_batch(np.arange(5000, 5200))
        ref_xy = np.column_stack([np.asarray(ref.column("x")), np.asarray(ref.column("y"))])
        return grid_metrics(ray.data.from_arrow(pts), ref_xy,
                            np.asarray(ref.column("value")), radius=5.0,
                            concurrency=2)

    def _knn_bigbig(sf_dir: str):
        import numpy as np
        import ray.data

        from gdal_ray.core import fixtures
        from gdal_ray.pipelines.knn import knn_radius_cell_join
        q = fixtures.points_table(200)
        p = fixtures.points_batch(np.arange(3000, 4000))
        return knn_radius_cell_join(ray.data.from_arrow(q),
                                    ray.data.from_arrow(p), radius=2.0, k=3)

    def _raster_aspect(sf_dir: str):
        import ray.data

        from gdal_ray.core import fixtures
        from gdal_ray.stages.dem import aspect
        ds = ray.data.from_arrow(fixtures.images_table(16))
        return ds.map_batches(aspect, batch_format="pyarrow") \
                 .select_columns(["image_id", "fmt"])

    def _rgb_to_palette(sf_dir: str):
        import ray.data

        from gdal_ray.core import fixtures
        from gdal_ray.stages.palette import rgb_to_palette
        ds = ray.data.from_arrow(fixtures.images_table(16))
        indexed, pal = rgb_to_palette(ds, n_colors=32)
        return indexed.select_columns(["image_id", "fmt"])

    def _raster_sieve(sf_dir: str):
        import ray.data

        from gdal_ray.core import fixtures
        from gdal_ray.stages.raster import reclassify_fn
        from gdal_ray.stages.raster2 import sieve
        ds = ray.data.from_arrow(fixtures.images_table(12))
        lut = {v: (v // 64) * 64 for v in range(256)}
        return ds.map_batches(reclassify_fn(lut), batch_format="pyarrow") \
                 .map_batches(lambda b: sieve(b, threshold=3), batch_format="pyarrow") \
                 .select_columns(["image_id"])

    def _raster_proximity(sf_dir: str):
        import ray.data

        from gdal_ray.core import fixtures
        from gdal_ray.stages.raster import proximity
        ds = ray.data.from_arrow(fixtures.images_table(8))
        return ds.map_batches(lambda b: proximity(b, target_value=255),
                              batch_format="pyarrow")

    def _raster_reproject(sf_dir: str):
        import ray.data

        from gdal_ray.core import fixtures
        from gdal_ray.stages.warp import ReprojectImageStage
        ds = ray.data.from_arrow(fixtures.images_table(24))
        return ds.map_batches(ReprojectImageStage,
                              fn_constructor_kwargs={"dst_crs": "EPSG:3857"},
                              batch_format="pyarrow", concurrency=2) \
                 .select_columns(["image_id", "w", "h", "crs"])

    def _image_features(sf_dir: str):
        import ray.data

        from gdal_ray.core import fixtures
        from gdal_ray.stages.multimodal import ImageFeatureStage
        ds = ray.data.from_arrow(fixtures.images_table(24))
        return ds.map_batches(ImageFeatureStage, batch_format="pyarrow",
                              batch_size=8, concurrency=2) \
                 .select_columns(["image_id", "mean", "std", "ahash"])

    return {
        # relational parity (exact SQL oracles)
        "q1_pricing_summary": R.q1_pricing_summary,
        "q_segment_revenue": R.q_segment_revenue,
        "q_topk_orders": R.q_topk_orders,
        "q_distinct_brands": R.q_distinct_brands,
        "q_filter_project": R.q_filter_project,
        "q_nation_revenue": R.q_nation_revenue,
        "q_event_stats": R.q_event_stats,
        "q_union_concat": R.q_union_concat,
        "q_semi_anti": R.q_semi_anti,
        "q_string_funcs": R.q_string_funcs,
        # geospatial engine paths with SQL oracles
        "geo_tile_assign": R.geo_tile_assign,
        "geo_pip_join": R.geo_pip_join,
        "geo_knn": R.geo_knn,
        "geo_zonal_points": R.geo_zonal_points,
        "vector_centroid": R.vector_centroid,
        "vector_clip": R.vector_clip,
        "layer_intersection": R.layer_intersection_rects,
        "layer_union": R.layer_union_rects,
        "vector_dissolve": R.vector_dissolve_union_q,
        "vector_makevalid": R.vector_makevalid_q,
        "knn_idw": R.knn_idw_q,
        "grid_metrics": R.grid_metrics_q,
        "knn_bigbig": R.knn_bigbig_q,
        "dedup_phash": R.dedup_phash_q,
        "raster_band_stats": R.raster_band_stats_q,
        "raster_tindex": R.raster_tindex_q,
        "raster_as_features": R.raster_as_features_q,
        "raster_pixel_info": R.raster_pixel_info_q,
        "raster_hillshade": R.raster_hillshade_q,
        "raster_aspect": R.raster_aspect_q,
        "geo_predicates": R.geo_predicates_q,
        "raster_gcp_warp": R.raster_gcp_warp_q,
        "geo_rasterize_grid": R.geo_rasterize_grid_q,
        "raster_calc": R.raster_calc_q,
        "raster_neighbors": R.raster_neighbors_q,
        "footprint_join": R.footprint_join_q,
        "tile_pyramid_summary": R.tile_pyramid_q,
        "vector_check_geometry": R.vector_check_geometry_q,
        "events_hourly": R.events_hourly_q,
        # training-data ops with SQL oracles
        "dedup_exact_docs": R.dedup_exact_docs,
        "text_token_stats": R.text_token_stats,
        "text_alpha_ratio": R.text_alpha_ratio,
        "ann_topk": R.ann_topk,
        # non-SQL-expressible (rows-only driver check, pytest oracles)
        "geo_rasterize": _geo_rasterize,
        "geo_polygonize": _geo_polygonize,
        "geo_polygonize_stitched": R.geo_polygonize_stitched_q,
        "dedup_minhash": _minhash_neardup,
        "dedup_simhash": _simhash_neardup,
        "dedup_embedding": _dedup_embedding,
        "text_langid": _langid,
        "text_quality": _text_quality,
        "text_fingerprint": _text_fingerprint,
        "raster_translate": _translate,
        "vector_sort_hilbert": _vector_sort,
        "ann_ivf": _ann_ivf,
        "raster_sieve": _raster_sieve,
        "raster_proximity": _raster_proximity,
        "raster_reproject": _raster_reproject,
        "image_features": _image_features,
        "rgb_to_palette": _rgb_to_palette,
    }


def oracle_sql() -> dict[str, str]:
    from gdal_ray.pipelines import relational as R

    return {
        "q1_pricing_summary": R.SQL_Q1,
        "q_segment_revenue": R.SQL_SEGMENT_REVENUE,
        "q_topk_orders": R.SQL_TOPK_ORDERS,
        "q_distinct_brands": R.SQL_DISTINCT_BRANDS,
        "q_filter_project": R.SQL_FILTER_PROJECT,
        "q_nation_revenue": R.SQL_NATION_REVENUE,
        "q_event_stats": R.SQL_EVENT_STATS,
        "q_union_concat": R.SQL_UNION_CONCAT,
        "q_semi_anti": R.SQL_SEMI_ANTI,
        "q_string_funcs": R.SQL_STRING_FUNCS,
        "geo_tile_assign": R.SQL_GEO_TILE_ASSIGN,
        "geo_pip_join": R.SQL_GEO_PIP_JOIN,
        "geo_knn": R.SQL_GEO_KNN,
        "geo_zonal_points": R.SQL_GEO_ZONAL,
        "vector_centroid": R.SQL_VECTOR_CENTROID,
        "vector_clip": R.SQL_VECTOR_CLIP,
        "layer_intersection": R.SQL_LAYER_INTERSECTION,
        "layer_union": R.SQL_LAYER_UNION,
        "vector_dissolve": R.SQL_VECTOR_DISSOLVE_UNION,
        "vector_makevalid": R.SQL_VECTOR_MAKEVALID,
        "knn_idw": R.SQL_KNN_IDW,
        "grid_metrics": R.SQL_GRID_METRICS,
        "knn_bigbig": R.SQL_KNN_BIGBIG,
        "dedup_phash": R.SQL_DEDUP_PHASH,
        "raster_band_stats": R.SQL_RASTER_BAND_STATS,
        "raster_tindex": R.SQL_RASTER_TINDEX,
        "raster_as_features": R.SQL_RASTER_AS_FEATURES,
        "raster_pixel_info": R.SQL_RASTER_PIXEL_INFO,
        "raster_hillshade": R.SQL_RASTER_HILLSHADE,
        "raster_aspect": R.SQL_RASTER_ASPECT,
        "geo_predicates": R.SQL_GEO_PREDICATES,
        "raster_gcp_warp": R.SQL_RASTER_GCP_WARP,
        "geo_polygonize_stitched": R.SQL_GEO_POLYGONIZE_STITCHED,
        "text_langid": R.SQL_TEXT_LANGID,
        "text_quality": R.SQL_TEXT_QUALITY,
        "geo_rasterize_grid": R.SQL_GEO_RASTERIZE_GRID,
        "raster_calc": R.SQL_RASTER_CALC,
        "raster_neighbors": R.SQL_RASTER_NEIGHBORS,
        "footprint_join": R.SQL_FOOTPRINT_JOIN,
        "tile_pyramid_summary": R.SQL_TILE_PYRAMID,
        "vector_check_geometry": R.SQL_VECTOR_CHECK_GEOMETRY,
        "events_hourly": R.SQL_EVENTS_HOURLY_ORACLE,
        "dedup_exact_docs": R.SQL_DEDUP_EXACT,
        "text_token_stats": R.SQL_TEXT_TOKEN,
        "text_alpha_ratio": R.SQL_TEXT_ALPHA,
        "ann_topk": R.SQL_ANN_TOPK,
    }
