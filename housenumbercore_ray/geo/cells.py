"""Grid cell index — the H3/S2 analog for the spatial join.

The north rule calls for an H3/S2-indexed spatial join (batched cell encoding,
point-in-polygon against a broadcast index). No H3 library is available in this
environment, so cells are a deterministic fixed-resolution lon/lat grid packed
into one int64:

    ix = floor((lon + 180) / res); iy = floor((lat + 90) / res)
    cell = (ix << 22) | iy

At the default resolution (0.05°, ~5.5 km at the equator, comparable to H3
res 6) ``ix < 7200`` and ``iy < 3600``, far inside the packed ranges; the
encoding supports resolutions down to ~1e-4° (ix < 2^21, iy < 2^22).

Properties that matter at 100 TB scale: encoding is a handful of vectorized
numpy ops per batch (no per-row Python); a polygon's cover is a *small* cell
set computed once per polygon in a pre-pass; the cell id is the shuffle /
salting key for the join, exactly like an H3 cell would be.
"""

from __future__ import annotations

import numpy as np

from .wkb import wkb_bbox

CELL_RES_DEG = 0.05


def latlng_to_cell(lat, lon, res_deg: float = CELL_RES_DEG) -> np.ndarray:
    """Vectorized encode of lat/lon arrays into int64 cell ids."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    ix = np.floor((lon + 180.0) / res_deg).astype(np.int64)
    iy = np.floor((lat + 90.0) / res_deg).astype(np.int64)
    return (ix << 22) | iy


def cell_bounds(cell: int, res_deg: float = CELL_RES_DEG):
    """(minlon, minlat, maxlon, maxlat) of one cell."""
    ix = int(cell) >> 22
    iy = int(cell) & ((1 << 22) - 1)
    minlon = ix * res_deg - 180.0
    minlat = iy * res_deg - 90.0
    return minlon, minlat, minlon + res_deg, minlat + res_deg


def bbox_cover(minlon, minlat, maxlon, maxlat, res_deg: float = CELL_RES_DEG) -> np.ndarray:
    """All cell ids whose square intersects the bbox (inclusive of edges)."""
    ix0 = int(np.floor((minlon + 180.0) / res_deg))
    ix1 = int(np.floor((maxlon + 180.0) / res_deg))
    iy0 = int(np.floor((minlat + 90.0) / res_deg))
    iy1 = int(np.floor((maxlat + 90.0) / res_deg))
    ixs = np.arange(ix0, ix1 + 1, dtype=np.int64)
    iys = np.arange(iy0, iy1 + 1, dtype=np.int64)
    gx, gy = np.meshgrid(ixs, iys, indexing="ij")
    return ((gx << 22) | gy).ravel()


def polygon_cover(polygon_wkb_bytes: bytes, res_deg: float = CELL_RES_DEG) -> np.ndarray:
    """Cell cover of a (multi)polygon WKB.

    Bbox-based over-approximation: every cell intersecting the bbox. The exact
    covers/crosses test (reference semantics ST_Covers at
    TheoreticalHousenumbers.java:876-899) runs afterwards in the actor-pool
    point-in-polygon stage, so an over-approximate cover only costs a few
    extra candidate pairs, never correctness. Municipality-sized polygons at
    the default resolution yield O(10–10k) cells.
    """
    return bbox_cover(*wkb_bbox(polygon_wkb_bytes), res_deg=res_deg)
