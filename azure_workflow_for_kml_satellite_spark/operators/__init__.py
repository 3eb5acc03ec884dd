"""Spark DataFrame operators: extraction, AOI prep, spatial join, NDVI,
change detection, metrics, clustering, dedup, text analysis, similarity."""
