"""Vectorized point-in-polygon, segment distance and equirectangular distance.

Replaces the PostGIS predicates the reference pushes to SQL:
  - ``ST_Covers(polygon, point)`` — TheoreticalHousenumbers.java:876-899,
    1195-1204 → :func:`points_in_polygon` (even-odd ray casting, boundary
    counted as inside to match Covers semantics on our synthetic inputs).
  - ``lonlatdistance(lon1,lat1,lon2,lat2)`` equirectangular meters —
    /root/reference/scripts/dbinstallation/dbfunctions.sql:27-50 →
    :func:`equirect_distance_m`.
  - nearest-street assignment distance kernel →
    :func:`point_segment_distance_m`.

All kernels are numpy-vectorized over the *points* axis so they run inside
``map_batches`` with no per-row Python.
"""

from __future__ import annotations

import numpy as np

from .wkb import wkb_rings

EARTH_R = 6371000.785  # meters, matches dbfunctions.sql:27-50 usage of 6371 km


def _ring_crossings(lon, lat, ring):
    """Even-odd crossing counts for points vs one ring. lon/lat: (n,) arrays."""
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    # broadcast: points (n,1) vs edges (m,)
    lat_ = lat[:, None]
    lon_ = lon[:, None]
    cond = (y0 > lat_) != (y1 > lat_)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x0 + (lat_ - y0) * (x1 - x0) / np.where(y1 != y0, y1 - y0, np.inf)
    crossing = cond & (lon_ < xint)
    return crossing.sum(axis=1)


#: Squared-degree tolerance for the on-boundary test. 1e-18 ⇒ a point counts
#: as "on" an edge only within ~1e-9° (≈0.1 mm) — tight enough that only
#: float-exact boundary hits qualify (the ST_Covers edge-inclusion contract),
#: never real-world points that merely sit near a shared admin border. This
#: tolerance is part of :func:`points_in_rings`' contract; the DuckDB oracle
#: (pipelines/oracle.py hnr_subarea_rows) uses NO tolerance, which agrees
#: because both sides compare the identical parquet doubles.
ON_RING_EPS2 = 1e-18


def _on_ring(lon, lat, ring, eps=ON_RING_EPS2):
    """True where a point lies on a ring edge (so Covers counts it inside)."""
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    lon_ = lon[:, None]
    lat_ = lat[:, None]
    dx, dy = x1 - x0, y1 - y0
    # projection parameter clamped to [0,1]
    seg_len2 = dx * dx + dy * dy
    t = np.clip(((lon_ - x0) * dx + (lat_ - y0) * dy) / np.where(seg_len2 > 0, seg_len2, 1.0), 0.0, 1.0)
    px = x0 + t * dx
    py = y0 + t * dy
    d2 = (lon_ - px) ** 2 + (lat_ - py) ** 2
    return (d2 <= eps).any(axis=1)


def points_in_rings(lon, lat, rings) -> np.ndarray:
    """Boolean mask: point inside the polygon defined by ``rings`` —
    list of (ring ndarray, is_exterior). Even-odd rule over all rings
    (handles holes and multipolygon parts uniformly); boundary points inside.
    """
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    total = np.zeros(len(lon), dtype=np.int64)
    boundary = np.zeros(len(lon), dtype=bool)
    for ring, _ in rings:
        total += _ring_crossings(lon, lat, ring)
        boundary |= _on_ring(lon, lat, ring)
    return (total % 2 == 1) | boundary


def points_in_polygon(lon, lat, polygon_wkb_bytes: bytes) -> np.ndarray:
    return points_in_rings(lon, lat, wkb_rings(polygon_wkb_bytes))


def equirect_distance_m(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Equirectangular-approximation distance in meters (dbfunctions.sql:27-50
    semantics: Δlon scaled by cos(mean lat))."""
    lon1 = np.asarray(lon1, dtype=np.float64)
    lat1 = np.asarray(lat1, dtype=np.float64)
    lon2 = np.asarray(lon2, dtype=np.float64)
    lat2 = np.asarray(lat2, dtype=np.float64)
    latm = np.deg2rad((lat1 + lat2) / 2.0)
    dx = np.deg2rad(lon2 - lon1) * np.cos(latm)
    dy = np.deg2rad(lat2 - lat1)
    return EARTH_R * np.sqrt(dx * dx + dy * dy)


def point_segment_distance_m(lon, lat, seg_coords) -> np.ndarray:
    """Min distance (meters, equirect plane) from each point to a polyline.

    lon/lat: (n,) arrays; seg_coords: (m, 2) polyline vertices.
    Vectorized (n × m-1) in degree space scaled by cos(lat) — adequate at
    municipality extents.
    """
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    seg = np.asarray(seg_coords, dtype=np.float64)
    if len(seg) == 0:
        return np.full(len(lon), np.inf)
    if len(seg) == 1:  # degenerate point geometry → zero-length segment
        seg = np.vstack([seg, seg])
    x0, y0 = seg[:-1, 0], seg[:-1, 1]
    x1, y1 = seg[1:, 0], seg[1:, 1]
    coslat = np.cos(np.deg2rad(lat))[:, None]
    # work in locally-scaled degrees
    px = lon[:, None] * coslat
    py = lat[:, None]
    ax = x0[None, :] * coslat
    ay = np.broadcast_to(y0, (len(lon), len(y0)))
    bx = x1[None, :] * coslat
    by = np.broadcast_to(y1, (len(lon), len(y1)))
    dx, dy = bx - ax, by - ay
    L2 = dx * dx + dy * dy
    t = np.clip(((px - ax) * dx + (py - ay) * dy) / np.where(L2 > 0, L2, 1.0), 0.0, 1.0)
    cx = ax + t * dx
    cy = ay + t * dy
    d2 = (px - cx) ** 2 + (py - cy) ** 2
    return np.deg2rad(np.sqrt(d2.min(axis=1))) * EARTH_R
