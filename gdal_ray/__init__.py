"""gdal_ray — a from-scratch, Ray-Data-native spatial-join + tiling engine.

Re-expresses the query/data-processing capabilities of the GDAL reference
(/root/reference, OSGeo GDAL fork) as idiomatic Ray Data pipelines:
``ray.data.Dataset`` of Arrow blocks, ``map_batches`` transforms (actor pools
for stateful stages), ``groupby``/``sort``/``repartition`` for wide steps.

Layout:
  core/       pure numpy/stdlib kernels (no Ray): projections, tile math,
              resampling, geometry, codecs, checksums, fixtures
  stages/     map_batches-level transforms (stateless fns + actor classes)
  pipelines/  end-to-end Dataset pipelines (tiling, spatial join, kNN, ...)
  state/      checkpoint/lineage manifest store
  sources/    table readers / synthetic-table materialization
"""

__version__ = "0.1.0"
