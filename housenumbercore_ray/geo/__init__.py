"""Pure-numpy geometry primitives.

The reference delegates all geometry to PostGIS (``ST_Covers``, ``ST_Union``,
``ST_Centroid``, ``ST_LineMerge`` — e.g.
/root/reference/src/de/regioosm/theoreticalhousenumbercore/TheoreticalHousenumbers.java:876-899).
This engine carries geometry as WKB ``binary`` Arrow columns and implements the
needed predicates/kernels as vectorized numpy code so the hot path stays inside
``map_batches`` with zero external dependencies.
"""

from .wkb import (  # noqa: F401
    point_wkb,
    linestring_wkb,
    polygon_wkb,
    multipolygon_wkb,
    parse_wkb,
)
from .cells import latlng_to_cell, cell_bounds, polygon_cover, CELL_RES_DEG  # noqa: F401
from .pip import points_in_polygon, points_in_rings, point_segment_distance_m, equirect_distance_m  # noqa: F401
