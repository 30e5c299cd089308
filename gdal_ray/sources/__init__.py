"""Data sources: format readers (vector_formats: GeoJSON / Shapefile / GPKG)."""
