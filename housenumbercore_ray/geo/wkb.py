"""Minimal WKB (well-known binary) codec — Point / LineString / Polygon /
MultiPolygon, little-endian, 2-D, EPSG:4326.

The reference stores geometry in PostGIS columns and moves WKT/WKB strings
through JDBC (e.g. boundary polygon fetched as WKB text at
/root/reference/src/de/regioosm/theoreticalhousenumbercore/TheoreticalHousenumbers.java:846-869,
street linestrings built from way nodes at
/root/reference/src/de/regioosm/housenumbercore/util/OSMSegment.java:58-71).
Here WKB lives in Arrow ``binary`` columns; only small dimension tables
(boundaries, streets) are ever parsed, so a straightforward struct-based codec
is sufficient — bulk point data stays in float64 lon/lat columns and never
round-trips through WKB.
"""

from __future__ import annotations

import struct

import numpy as np

_WKB_POINT = 1
_WKB_LINESTRING = 2
_WKB_POLYGON = 3
_WKB_MULTIPOLYGON = 6

_HDR = struct.Struct("<BI")
_U32 = struct.Struct("<I")
_PT = struct.Struct("<dd")


def point_wkb(lon: float, lat: float) -> bytes:
    return _HDR.pack(1, _WKB_POINT) + _PT.pack(lon, lat)


def linestring_wkb(coords) -> bytes:
    """coords: iterable of (lon, lat) or an (n, 2) array."""
    arr = np.asarray(coords, dtype=np.float64)
    return _HDR.pack(1, _WKB_LINESTRING) + _U32.pack(len(arr)) + arr.tobytes()


def polygon_wkb(exterior, holes=()) -> bytes:
    """exterior/holes: sequences of (lon, lat); rings are closed automatically."""
    rings = [exterior, *holes]
    out = [_HDR.pack(1, _WKB_POLYGON), _U32.pack(len(rings))]
    for ring in rings:
        arr = np.asarray(ring, dtype=np.float64)
        if not np.array_equal(arr[0], arr[-1]):
            arr = np.vstack([arr, arr[:1]])
        out.append(_U32.pack(len(arr)))
        out.append(arr.tobytes())
    return b"".join(out)


def multipolygon_wkb(polygons) -> bytes:
    """polygons: list of (exterior, holes) tuples or lists of rings."""
    out = [_HDR.pack(1, _WKB_MULTIPOLYGON), _U32.pack(len(polygons))]
    for poly in polygons:
        if isinstance(poly, tuple) and len(poly) == 2:
            ext, holes = poly
            out.append(polygon_wkb(ext, holes))
        else:
            out.append(polygon_wkb(poly))
    return b"".join(out)


def _parse_ring(buf: memoryview, off: int):
    (n,) = _U32.unpack_from(buf, off)
    off += 4
    arr = np.frombuffer(buf, dtype="<f8", count=2 * n, offset=off).reshape(n, 2)
    return arr, off + 16 * n


def _parse_geom(buf: memoryview, off: int):
    byte_order, gtype = _HDR.unpack_from(buf, off)
    if byte_order != 1:
        raise ValueError("only little-endian WKB supported")
    off += _HDR.size
    if gtype == _WKB_POINT:
        lon, lat = _PT.unpack_from(buf, off)
        return ("point", np.array([[lon, lat]])), off + 16
    if gtype == _WKB_LINESTRING:
        arr, off = _parse_ring(buf, off)
        return ("linestring", arr), off
    if gtype == _WKB_POLYGON:
        (nrings,) = _U32.unpack_from(buf, off)
        off += 4
        rings = []
        for _ in range(nrings):
            ring, off = _parse_ring(buf, off)
            rings.append(ring)
        return ("polygon", rings), off
    if gtype == _WKB_MULTIPOLYGON:
        (npolys,) = _U32.unpack_from(buf, off)
        off += 4
        polys = []
        for _ in range(npolys):
            (kind, rings), off = _parse_geom(buf, off)
            assert kind == "polygon"
            polys.append(rings)
        return ("multipolygon", polys), off
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def parse_wkb(data: bytes):
    """→ ("point"|"linestring", ndarray(n,2)) or ("polygon", [rings]) or
    ("multipolygon", [[rings], ...])."""
    geom, _ = _parse_geom(memoryview(data), 0)
    return geom


def wkb_rings(data: bytes):
    """All polygon rings of a (multi)polygon WKB as a flat list of
    (ring ndarray, is_exterior) tuples."""
    kind, body = parse_wkb(data)
    if kind == "polygon":
        return [(r, i == 0) for i, r in enumerate(body)]
    if kind == "multipolygon":
        out = []
        for rings in body:
            out.extend((r, i == 0) for i, r in enumerate(rings))
        return out
    raise ValueError(f"not a polygon WKB: {kind}")


def wkb_bbox(data: bytes):
    """(minlon, minlat, maxlon, maxlat) of any supported geometry."""
    kind, body = parse_wkb(data)
    if kind in ("point", "linestring"):
        arrs = [body]
    elif kind == "polygon":
        arrs = body
    else:
        arrs = [r for rings in body for r in rings]
    allpts = np.vstack(arrs)
    mins = allpts.min(axis=0)
    maxs = allpts.max(axis=0)
    return float(mins[0]), float(mins[1]), float(maxs[0]), float(maxs[1])
