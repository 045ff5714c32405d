"""housenumbercore_ray — a Ray-Data-native housenumber evaluation engine.

A brand-new engine (NOT a port) with the query/data-processing capabilities of
regio-osm/housenumbercore: ingest Parquet tables of Common-Crawl-style web
pages, extract address/housenumber candidates via stateful actor-pool
``map_batches`` over zero-copy Arrow, spatially validate candidates against
admin boundary polygons and street geometries with a grid-cell-indexed
(H3-style) spatial join, and reproduce the reference's evaluation semantics:
per-municipality found/missing/mismatch (IDENTICAL / LIST_ONLY / OSM_ONLY)
housenumber counts and tile assignments.

Layout:
  geo/        pure-numpy WKB codec, grid cell index, point-in-polygon, distance
  functions/  scalar/vector function library (housenumber, street, tags, refs)
  sources/    synthetic world generator, CSV sniffing reader, page reader
  stages/     Ray Data stages (extract, spatial join, streets, evaluate,
              aggregate, dedup, text analysis, similarity, multimodal)
  pipelines/  end-to-end pipelines (evaluation, theoretical)
  state/      per-partition lineage/metrics + resumable output

See SURVEY.md for the full mapping from the reference's operators
(file:line citations) to the stages here.
"""

__version__ = "0.1.0"
