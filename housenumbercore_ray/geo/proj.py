"""Coordinate transforms (M16) — pure-numpy Transverse Mercator.

The reference leaves reprojection to PostGIS
(``ST_Transform(ST_SetSRID(ST_MakePoint(...), src), 4326)`` —
HousenumberList.storeToDB insert, util/HousenumberList.java:257-263) and
only special-cases the EPSG:25832 zone-prefix false easting in the CSV
reader (CsvReader.java:506-508). No pyproj in this environment, so the
ETRS89/UTM zone 32N (EPSG:25832) case — the one German official lists use —
is implemented directly with the classic Snyder Transverse Mercator series
on GRS80 (sub-millimeter at country scale). Other SRIDs raise, matching the
engine's pre-convert-or-fail contract.
"""

from __future__ import annotations

import numpy as np

# GRS80 ellipsoid
_A = 6378137.0
_F = 1 / 298.257222101
_E2 = _F * (2 - _F)
_E4 = _E2 * _E2
_E6 = _E4 * _E2
_EP2 = _E2 / (1 - _E2)
_K0 = 0.9996
_FE = 500000.0

_M1 = 1 - _E2 / 4 - 3 * _E4 / 64 - 5 * _E6 / 256
_M2 = 3 * _E2 / 8 + 3 * _E4 / 32 + 45 * _E6 / 1024
_M3 = 15 * _E4 / 256 + 45 * _E6 / 1024
_M4 = 35 * _E6 / 3072
_E1 = (1 - np.sqrt(1 - _E2)) / (1 + np.sqrt(1 - _E2))


def _meridian_arc(phi):
    return _A * (_M1 * phi - _M2 * np.sin(2 * phi) + _M3 * np.sin(4 * phi) - _M4 * np.sin(6 * phi))


def utm_to_wgs84(easting, northing, zone: int = 32):
    """Vectorized UTM (northern hemisphere) → (lon, lat) degrees."""
    easting = np.asarray(easting, dtype=np.float64)
    northing = np.asarray(northing, dtype=np.float64)
    lon0 = np.deg2rad(zone * 6 - 183)
    x = easting - _FE
    M = northing / _K0
    mu = M / (_A * _M1)
    phi1 = (mu
            + (3 * _E1 / 2 - 27 * _E1**3 / 32) * np.sin(2 * mu)
            + (21 * _E1**2 / 16 - 55 * _E1**4 / 32) * np.sin(4 * mu)
            + (151 * _E1**3 / 96) * np.sin(6 * mu)
            + (1097 * _E1**4 / 512) * np.sin(8 * mu))
    sin1, cos1, tan1 = np.sin(phi1), np.cos(phi1), np.tan(phi1)
    C1 = _EP2 * cos1 * cos1
    T1 = tan1 * tan1
    N1 = _A / np.sqrt(1 - _E2 * sin1 * sin1)
    R1 = _A * (1 - _E2) / (1 - _E2 * sin1 * sin1) ** 1.5
    D = x / (N1 * _K0)
    lat = phi1 - (N1 * tan1 / R1) * (
        D * D / 2
        - (5 + 3 * T1 + 10 * C1 - 4 * C1 * C1 - 9 * _EP2) * D**4 / 24
        + (61 + 90 * T1 + 298 * C1 + 45 * T1 * T1 - 252 * _EP2 - 3 * C1 * C1) * D**6 / 720
    )
    lon = lon0 + (
        D - (1 + 2 * T1 + C1) * D**3 / 6
        + (5 - 2 * C1 + 28 * T1 - 3 * C1 * C1 + 8 * _EP2 + 24 * T1 * T1) * D**5 / 120
    ) / cos1
    return np.rad2deg(lon), np.rad2deg(lat)


def wgs84_to_utm(lon, lat, zone: int = 32):
    """Vectorized (lon, lat) degrees → UTM easting/northing (northern hem)."""
    lon = np.deg2rad(np.asarray(lon, dtype=np.float64))
    lat = np.deg2rad(np.asarray(lat, dtype=np.float64))
    lon0 = np.deg2rad(zone * 6 - 183)
    sinp, cosp, tanp = np.sin(lat), np.cos(lat), np.tan(lat)
    N = _A / np.sqrt(1 - _E2 * sinp * sinp)
    T = tanp * tanp
    C = _EP2 * cosp * cosp
    Aa = (lon - lon0) * cosp
    M = _meridian_arc(lat)
    easting = _FE + _K0 * N * (
        Aa + (1 - T + C) * Aa**3 / 6
        + (5 - 18 * T + T * T + 72 * C - 58 * _EP2) * Aa**5 / 120
    )
    northing = _K0 * (M + N * tanp * (
        Aa * Aa / 2 + (5 - T + 9 * C + 4 * C * C) * Aa**4 / 24
        + (61 - 58 * T + T * T + 600 * C - 330 * _EP2) * Aa**6 / 720
    ))
    return easting, northing


def transform_to_wgs84(lon, lat, source_srid: str):
    """M16 entry point: source coordinates → WGS84 lon/lat.

    '4326' is identity; '25832' strips the zone-prefix false easting
    (CsvReader.java:506-508 already handled upstream, tolerated here too)
    and inverse-projects; anything else raises (pre-convert the input)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    if source_srid in ("4326", "", None):
        return lon, lat
    if source_srid == "25832":
        e = np.where(lon > 32_000_000, lon - 32_000_000.0, lon)
        return utm_to_wgs84(e, lat, zone=32)
    raise ValueError(f"unsupported source SRID {source_srid}; pre-convert to 4326")
