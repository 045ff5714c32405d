"""Independent DuckDB recomputations for the geometry operators.

No spatial extension is available in the sandbox, so these oracles decode
the WKB ``binary`` columns from first principles inside SQL: ``hex()`` the
blob, reassemble each little-endian 8-byte group as a UBIGINT, and evaluate
the IEEE-754 double from sign/exponent/mantissa bit fields — bit-exact for
every normal double (coordinates are never zero/denormal/inf here, and the
decode CASEs u = 0 to 0.0 anyway).  On top of the decoded vertices:

- ``street_vertices_sql`` — the decode itself is the query.
- ``muni_area_sql``       — recursive ring walk over Polygon WKB (rings have
  variable offsets), shoelace per ring, exterior centroid, km² conversion
  with the SAME literal expression shapes as ``geometry.py`` (float adds
  and multiplies associate identically, so values hash equal at the
  driver's 9-dp rounding).
- ``line_simplify_sql``   — the densify arithmetic is pure int64 hashing +
  the identical float expression tree, and Douglas-Peucker itself runs as a
  recursive CTE: each active chord joins its interior points, a window
  ``row_number() OVER (... ORDER BY d DESC, seq)`` picks the split vertex,
  and the chord splits while the max deviation exceeds eps.  Kept vertices
  are the union of all chord endpoints.
"""

from __future__ import annotations

from .geometry import (
    DENSIFY_AMP,
    DENSIFY_D,
    SIMPLIFY_EPS,
    _HASH_M1,
    _HASH_M2,
    _HASH_M3,
)


def _u64le(hx: str, off: str) -> str:
    """UBIGINT from 8 little-endian bytes of hex string ``hx`` at 0-based
    byte offset ``off`` (an SQL expression)."""
    parts = " || ".join(
        f"substr({hx}, 2*(({off})+{k})+1, 2)" for k in (7, 6, 5, 4, 3, 2, 1, 0)
    )
    return f"(('0x' || {parts})::UBIGINT)"


def _u32le(hx: str, off: str) -> str:
    parts = " || ".join(
        f"substr({hx}, 2*(({off})+{k})+1, 2)" for k in (3, 2, 1, 0)
    )
    return f"(('0x' || {parts})::UBIGINT::BIGINT)"


def _f64_from_u(u: str) -> str:
    """IEEE-754 binary64 value of UBIGINT expression ``u``."""
    return (
        f"(CASE WHEN {u} = 0 THEN 0.0 ELSE "
        f"(CASE WHEN ({u} >> 63) = 1 THEN -1.0 ELSE 1.0 END) * "
        f"(1.0 + ({u} & 4503599627370495)::DOUBLE / 4503599627370496.0) * "
        f"pow(2.0, (({u} >> 52) & 2047)::BIGINT - 1023) END)"
    )


def _street_verts_cte(world_dir: str) -> str:
    """CTE body: (osm_id, seq, x, y) — every decoded street vertex."""
    hdr = (
        f"SELECT osm_id, hex(linestring_wkb) AS hx, "
        f"{_u32le('hex(linestring_wkb)', '5')} AS n "
        f"FROM read_parquet('{world_dir}/osm_streets.parquet')"
    )
    return f"""
hdr AS ({hdr}),
idx AS (SELECT osm_id, hx, unnest(range(n)) AS i FROM hdr),
u AS (SELECT osm_id, i,
        {_u64le('hx', '9 + 16*i')} AS ulon,
        {_u64le('hx', '17 + 16*i')} AS ulat
      FROM idx),
verts AS (SELECT osm_id, i AS seq,
        {_f64_from_u('ulon')} AS x, {_f64_from_u('ulat')} AS y
      FROM u)
"""


def street_vertices_sql(world_dir: str) -> str:
    return f"""
WITH {_street_verts_cte(world_dir)}
SELECT osm_id, seq, x AS lon, y AS lat FROM verts
"""


def street_length_sql(world_dir: str) -> str:
    """geo_street_length: equirectangular per-segment length recomputed
    from the same WKB bytes with the same operation order
    (R·sqrt(((Δlat)·π/180)² + ((Δlon)·π/180·cos(mid·π/180))²)); libm
    cos/sqrt ulp differences are absorbed by the round-2 contract."""
    return f"""
WITH {_street_verts_cte(world_dir)},
seg AS (
  SELECT a.osm_id,
         6371000.0 * sqrt(
           pow((b.y - a.y) * pi() / 180, 2) +
           pow((b.x - a.x) * pi() / 180 * cos((a.y + b.y) / 2 * pi() / 180), 2)
         ) AS d
  FROM verts a JOIN verts b ON b.osm_id = a.osm_id AND b.seq = a.seq + 1
),
vc AS (SELECT osm_id, count(*) AS nv FROM verts GROUP BY osm_id),
sl AS (SELECT osm_id, sum(d) AS len FROM seg GROUP BY osm_id)
SELECT vc.osm_id, CAST(vc.nv AS BIGINT) AS n_vertices,
       CAST(greatest(vc.nv - 1, 0) AS BIGINT) AS n_segments,
       round(coalesce(sl.len, 0.0), 2) AS length_m
FROM vc LEFT JOIN sl USING (osm_id)
"""


def muni_area_sql(world_dir: str) -> str:
    return f"""
WITH RECURSIVE
h AS (SELECT area_id, muni_id, name, hex(polygon_wkb) AS hx,
             {_u32le('hex(polygon_wkb)', '1')} AS gtype
      FROM read_parquet('{world_dir}/boundaries.parquet')),
-- normalize Polygon (type 3) / MultiPolygon (type 6): part 0's polygon
-- header starts at byte 0 resp. 9
hn AS (SELECT *, CASE WHEN gtype = 3 THEN 1 ELSE {_u32le('hx', '5')} END AS npolys,
              CASE WHEN gtype = 3 THEN 0 ELSE 9 END AS p0
       FROM h),
-- linear walk over the (part, ring) chain: each ring knows its coord
-- offset and count; the successor is either the next ring of the same
-- part or ring 0 of the next part (whose own WKB header is skipped)
rings(area_id, poly_idx, ring_idx, nrings, off, n) AS (
  SELECT area_id, 0, 0, {_u32le('hx', 'p0 + 5')}, p0 + 13,
         {_u32le('hx', 'p0 + 9')}
  FROM hn
  UNION ALL
  SELECT r.area_id,
    CASE WHEN r.ring_idx + 1 < r.nrings THEN r.poly_idx ELSE r.poly_idx + 1 END,
    CASE WHEN r.ring_idx + 1 < r.nrings THEN r.ring_idx + 1 ELSE 0 END,
    CASE WHEN r.ring_idx + 1 < r.nrings THEN r.nrings
         ELSE {_u32le('hn.hx', 'r.off + 16*r.n + 5')} END,
    CASE WHEN r.ring_idx + 1 < r.nrings THEN r.off + 16*r.n + 4
         ELSE r.off + 16*r.n + 13 END,
    CASE WHEN r.ring_idx + 1 < r.nrings THEN {_u32le('hn.hx', 'r.off + 16*r.n')}
         ELSE {_u32le('hn.hx', 'r.off + 16*r.n + 9')} END
  FROM rings r JOIN hn ON hn.area_id = r.area_id
  WHERE r.ring_idx + 1 < r.nrings OR r.poly_idx + 1 < hn.npolys
),
idx AS (SELECT area_id, poly_idx, ring_idx, off, unnest(range(n)) AS i
        FROM rings),
u AS (SELECT area_id, poly_idx, ring_idx, i,
        {_u64le('hn.hx', 'idx.off + 16*i')} AS ux,
        {_u64le('hn.hx', 'idx.off + 16*i + 8')} AS uy
      FROM idx JOIN hn USING (area_id)),
verts AS (SELECT area_id, poly_idx, ring_idx, i,
        {_f64_from_u('ux')} AS x, {_f64_from_u('uy')} AS y FROM u),
-- rings are closed (last == first): shoelace terms pair i with i+1,
-- RE-CENTERED at the ring's first vertex so the cross products stay small
-- (no catastrophic cancellation → engine/SQL agree far inside the
-- driver's 9-dp rounding regardless of SUM order)
terms AS (
  SELECT a.area_id, a.poly_idx, a.ring_idx, f.x AS fx, f.y AS fy,
         (a.x - f.x) * (b.y - f.y) - (b.x - f.x) * (a.y - f.y) AS cr,
         ((a.x - f.x) + (b.x - f.x))
           * ((a.x - f.x) * (b.y - f.y) - (b.x - f.x) * (a.y - f.y)) AS cxterm,
         ((a.y - f.y) + (b.y - f.y))
           * ((a.x - f.x) * (b.y - f.y) - (b.x - f.x) * (a.y - f.y)) AS cyterm
  FROM verts a
  JOIN verts b ON b.area_id = a.area_id AND b.poly_idx = a.poly_idx
              AND b.ring_idx = a.ring_idx AND b.i = a.i + 1
  JOIN verts f ON f.area_id = a.area_id AND f.poly_idx = a.poly_idx
              AND f.ring_idx = a.ring_idx AND f.i = 0
),
ring_sums AS (
  SELECT area_id, poly_idx, ring_idx, sum(cr) AS scr,
         sum(cxterm) AS scx, sum(cyterm) AS scy,
         max(fx) AS fx, max(fy) AS fy,
         count(*) + 1 AS nverts
  FROM terms GROUP BY area_id, poly_idx, ring_idx
),
agg AS (
  SELECT area_id,
         count(*)::BIGINT AS n_rings,
         sum(nverts)::BIGINT AS n_vertices,
         sum(CASE WHEN ring_idx = 0 THEN abs(0.5 * scr)
                  ELSE -abs(0.5 * scr) END) AS area_deg2,
         max(CASE WHEN poly_idx = 0 AND ring_idx = 0
                  THEN fx + scx / (3.0 * scr) END) AS clon,
         max(CASE WHEN poly_idx = 0 AND ring_idx = 0
                  THEN fy + scy / (3.0 * scr) END) AS clat
  FROM ring_sums GROUP BY area_id
)
SELECT h.area_id, h.muni_id, h.name,
       agg.n_rings, agg.n_vertices, agg.area_deg2,
       agg.area_deg2 * 111.32 * 111.32 * cos(pi() * agg.clat / 180.0) AS area_km2,
       agg.clon AS centroid_lon, agg.clat AS centroid_lat
FROM agg JOIN h USING (area_id)
"""


def line_simplify_sql(world_dir: str, d: int = DENSIFY_D,
                      amp: float = DENSIFY_AMP,
                      eps: float = SIMPLIFY_EPS) -> str:
    return f"""
WITH RECURSIVE {_street_verts_cte(world_dir)},
m AS (SELECT osm_id, max(seq) AS last_s FROM verts GROUP BY osm_id),
seg AS (
  SELECT a.osm_id, a.seq AS s, a.x AS x0, a.y AS y0,
         b.x - a.x AS dx, b.y - a.y AS dy,
         sqrt((b.x - a.x)*(b.x - a.x) + (b.y - a.y)*(b.y - a.y)) AS ln
  FROM verts a JOIN verts b ON b.osm_id = a.osm_id AND b.seq = a.seq + 1
),
dens AS (
  SELECT osm_id, seq * {d} AS seq, x, y FROM verts
  UNION ALL
  SELECT osm_id, s * {d} + k AS seq,
         x0 + (k / {d}.0) * dx
            + ({amp!r} * (((osm_id*{_HASH_M1} + s*{_HASH_M2} + k*{_HASH_M3})
                           % 2048 - 1024) / 1024.0)) * (-dy) / ln AS x,
         y0 + (k / {d}.0) * dy
            + ({amp!r} * (((osm_id*{_HASH_M1} + s*{_HASH_M2} + k*{_HASH_M3})
                           % 2048 - 1024) / 1024.0)) * dx / ln AS y
  FROM seg, (SELECT unnest(range(1, {d})) AS k)
),
chord(osm_id, i, j) AS (
  SELECT osm_id, 0::BIGINT, last_s * {d} FROM m
  UNION ALL
  SELECT q.osm_id,
         CASE WHEN side.w = 0 THEN q.i ELSE q.split END,
         CASE WHEN side.w = 0 THEN q.split ELSE q.j END
  FROM (
    SELECT c.osm_id, c.i, c.j, p.seq AS split,
           CASE WHEN sqrt((pj.x - pi.x)*(pj.x - pi.x)
                          + (pj.y - pi.y)*(pj.y - pi.y)) = 0.0
                THEN sqrt((p.x - pi.x)*(p.x - pi.x)
                          + (p.y - pi.y)*(p.y - pi.y))
                ELSE abs((pj.x - pi.x)*(pi.y - p.y)
                         - (pi.x - p.x)*(pj.y - pi.y))
                     / sqrt((pj.x - pi.x)*(pj.x - pi.x)
                            + (pj.y - pi.y)*(pj.y - pi.y)) END AS dist,
           row_number() OVER (
             PARTITION BY c.osm_id, c.i, c.j
             ORDER BY CASE WHEN sqrt((pj.x - pi.x)*(pj.x - pi.x)
                                     + (pj.y - pi.y)*(pj.y - pi.y)) = 0.0
                           THEN sqrt((p.x - pi.x)*(p.x - pi.x)
                                     + (p.y - pi.y)*(p.y - pi.y))
                           ELSE abs((pj.x - pi.x)*(pi.y - p.y)
                                    - (pi.x - p.x)*(pj.y - pi.y))
                                / sqrt((pj.x - pi.x)*(pj.x - pi.x)
                                       + (pj.y - pi.y)*(pj.y - pi.y)) END DESC,
                      p.seq ASC) AS rn
    FROM chord c
    JOIN dens p  ON p.osm_id = c.osm_id AND p.seq > c.i AND p.seq < c.j
    JOIN dens pi ON pi.osm_id = c.osm_id AND pi.seq = c.i
    JOIN dens pj ON pj.osm_id = c.osm_id AND pj.seq = c.j
  ) q, (SELECT unnest([0, 1]) AS w) side
  WHERE q.rn = 1 AND q.dist > {eps!r}
),
kept AS (
  -- NOTE: inside a WITH RECURSIVE list DuckDB treats a top-level UNION CTE
  -- body as base/step and does not deduplicate across the two selects, so
  -- the dedup happens in an outer DISTINCT over a UNION ALL subquery
  SELECT DISTINCT osm_id, seq FROM (
    SELECT osm_id, i AS seq FROM chord
    UNION ALL
    SELECT osm_id, j AS seq FROM chord
  )
)
SELECT p.osm_id, p.seq, p.x AS lon, p.y AS lat
FROM kept k JOIN dens p ON p.osm_id = k.osm_id AND p.seq = k.seq
"""


def reverse_geocode_sql(world_dir: str) -> str:
    """geo_reverse_geocode: nearest admin-unit center replayed via window
    argmin with the engine's exact literal metric and (d2, area_id)
    tie-break."""
    from .geometry import COS_REF_LAT

    return f"""
WITH c AS (SELECT area_id,
                  (minlon + maxlon) / 2.0 AS cx,
                  (minlat + maxlat) / 2.0 AS cy
           FROM read_parquet('{world_dir}/boundaries.parquet')),
p AS (SELECT osm_id, lon, lat
      FROM read_parquet('{world_dir}/osm_addresses.parquet')),
d AS (SELECT p.osm_id, c.area_id,
             ((p.lon - c.cx) * {COS_REF_LAT!r}) * ((p.lon - c.cx) * {COS_REF_LAT!r})
               + (p.lat - c.cy) * (p.lat - c.cy) AS d2,
             row_number() OVER (PARTITION BY p.osm_id
                                ORDER BY ((p.lon - c.cx) * {COS_REF_LAT!r})
                                           * ((p.lon - c.cx) * {COS_REF_LAT!r})
                                         + (p.lat - c.cy) * (p.lat - c.cy) ASC,
                                         c.area_id ASC) AS rn
      FROM p CROSS JOIN c)
SELECT osm_id, area_id, d2 FROM d WHERE rn = 1
"""


def bbox_pairs_sql(world_dir: str) -> str:
    """geo_bbox_pairs: bboxes recomputed from the raw WKB bytes (same
    decode chain as ``muni_area_sql``), then a plain intersect self-join —
    deliberately grid-free, so it independently validates the engine's
    PBSM cell cover AND its reference-point dedup rule."""
    return f"""
WITH RECURSIVE
h AS (SELECT area_id, muni_id, name, hex(polygon_wkb) AS hx,
             {_u32le('hex(polygon_wkb)', '1')} AS gtype
      FROM read_parquet('{world_dir}/boundaries.parquet')),
hn AS (SELECT *, CASE WHEN gtype = 3 THEN 1 ELSE {_u32le('hx', '5')} END AS npolys,
              CASE WHEN gtype = 3 THEN 0 ELSE 9 END AS p0
       FROM h),
rings(area_id, poly_idx, ring_idx, nrings, off, n) AS (
  SELECT area_id, 0, 0, {_u32le('hx', 'p0 + 5')}, p0 + 13,
         {_u32le('hx', 'p0 + 9')}
  FROM hn
  UNION ALL
  SELECT r.area_id,
    CASE WHEN r.ring_idx + 1 < r.nrings THEN r.poly_idx ELSE r.poly_idx + 1 END,
    CASE WHEN r.ring_idx + 1 < r.nrings THEN r.ring_idx + 1 ELSE 0 END,
    CASE WHEN r.ring_idx + 1 < r.nrings THEN r.nrings
         ELSE {_u32le('hn.hx', 'r.off + 16*r.n + 5')} END,
    CASE WHEN r.ring_idx + 1 < r.nrings THEN r.off + 16*r.n + 4
         ELSE r.off + 16*r.n + 13 END,
    CASE WHEN r.ring_idx + 1 < r.nrings THEN {_u32le('hn.hx', 'r.off + 16*r.n')}
         ELSE {_u32le('hn.hx', 'r.off + 16*r.n + 9')} END
  FROM rings r JOIN hn ON hn.area_id = r.area_id
  WHERE r.ring_idx + 1 < r.nrings OR r.poly_idx + 1 < hn.npolys
),
idx AS (SELECT area_id, poly_idx, ring_idx, off, unnest(range(n)) AS i
        FROM rings),
u AS (SELECT area_id, i,
        {_u64le('hn.hx', 'idx.off + 16*i')} AS ux,
        {_u64le('hn.hx', 'idx.off + 16*i + 8')} AS uy
      FROM idx JOIN hn USING (area_id)),
verts AS (SELECT area_id,
        {_f64_from_u('ux')} AS x, {_f64_from_u('uy')} AS y FROM u),
bb AS MATERIALIZED (
  SELECT area_id, min(x) AS mnx, max(x) AS mxx,
         min(y) AS mny, max(y) AS mxy
  FROM verts GROUP BY area_id)
SELECT a.area_id AS area_id_a, b.area_id AS area_id_b,
       round((least(a.mxx, b.mxx) - greatest(a.mnx, b.mnx))
             * (least(a.mxy, b.mxy) - greatest(a.mny, b.mny)), 9) AS overlap_deg2
FROM bb a JOIN bb b
  ON a.area_id < b.area_id
 AND a.mnx <= b.mxx AND b.mnx <= a.mxx
 AND a.mny <= b.mxy AND b.mny <= a.mxy
"""


def radius_pairs_sql(world_dir: str) -> str:
    """geo_radius_pairs: plain neighbor-predicate self-join — no cell
    replication, no min-corner reference points — so it independently
    validates the engine's 4-cell PBSM cover and its dedup rule. The
    neighbor predicate (|Δix| ≤ 1, |Δiy| ≤ 1) is implied by dist < R at
    the default grid (cell width ≥ R), so it prunes without changing the
    result. Distance mirrors the engine operation-for-operation (same
    left-assoc float64 expression; libm cos/sqrt ≤ 1 ulp divergence is
    absorbed by the round-2 contract and a radius threshold that worldgen
    coordinates never approach within 1e-9 relative)."""
    from .geometry import RADIUS_PAIR_M, RADIUS_PAIR_RES

    return f"""
WITH p AS (
  SELECT osm_id, lon, lat, coalesce(addr_housenumber, '') AS hnr,
         CAST(floor((lon + 180.0) / {RADIUS_PAIR_RES}) AS BIGINT) AS ix,
         CAST(floor((lat + 90.0) / {RADIUS_PAIR_RES}) AS BIGINT) AS iy
  FROM read_parquet('{world_dir}/osm_addresses.parquet'))
SELECT a.osm_id AS osm_id_a, b.osm_id AS osm_id_b,
       round(6371000.0 * sqrt(
         pow((b.lat - a.lat) * pi() / 180, 2)
         + pow((b.lon - a.lon) * pi() / 180
               * cos((a.lat + b.lat) / 2 * pi() / 180), 2)), 2) AS dist_m,
       CAST(a.hnr = b.hnr AS BIGINT) AS same_hnr
FROM p a JOIN p b
  ON a.osm_id < b.osm_id
 AND b.ix BETWEEN a.ix - 1 AND a.ix + 1
 AND b.iy BETWEEN a.iy - 1 AND a.iy + 1
WHERE 6371000.0 * sqrt(
        pow((b.lat - a.lat) * pi() / 180, 2)
        + pow((b.lon - a.lon) * pi() / 180
              * cos((a.lat + b.lat) / 2 * pi() / 180), 2)) < {RADIUS_PAIR_M}
"""


def nearest_address_sql(world_dir: str) -> str:
    """geo_nearest_address: neighbor-predicate bipartite join (the 3×3 cell
    window is implied by dist < R at the default grid, so it prunes
    without changing the result), then rank-1 per probe ordered by the
    EXACT distance with addr_id tie-break — independently validates the
    engine's one-sided 9× replication cover and its per-cell argmin."""
    from .geometry import NN_JOIN_M, NN_JOIN_RES

    dist = ("6371000.0 * sqrt("
            "pow((l.lat - o.lat) * pi() / 180, 2)"
            " + pow((l.lon - o.lon) * pi() / 180"
            " * cos((o.lat + l.lat) / 2 * pi() / 180), 2))")
    return f"""
WITH o AS (
  SELECT osm_id, lon, lat,
         CAST(floor((lon + 180.0) / {NN_JOIN_RES}) AS BIGINT) AS ix,
         CAST(floor((lat + 90.0) / {NN_JOIN_RES}) AS BIGINT) AS iy
  FROM read_parquet('{world_dir}/osm_addresses.parquet')),
l AS (
  SELECT addr_id, lon, lat,
         CAST(floor((lon + 180.0) / {NN_JOIN_RES}) AS BIGINT) AS ix,
         CAST(floor((lat + 90.0) / {NN_JOIN_RES}) AS BIGINT) AS iy
  FROM read_parquet('{world_dir}/list_addresses.parquet')),
cand AS (
  SELECT o.osm_id, l.addr_id, {dist} AS d
  FROM o JOIN l
    ON l.ix BETWEEN o.ix - 1 AND o.ix + 1
   AND l.iy BETWEEN o.iy - 1 AND o.iy + 1
  WHERE {dist} < {NN_JOIN_M}),
ranked AS (
  SELECT osm_id, addr_id, d,
         row_number() OVER (PARTITION BY osm_id ORDER BY d, addr_id) AS rn
  FROM cand)
SELECT CAST(osm_id AS BIGINT) AS osm_id, CAST(addr_id AS BIGINT) AS addr_id,
       round(d, 2) AS dist_m
FROM ranked WHERE rn = 1
"""


def line_cells_sql(world_dir: str) -> str:
    """geo_tile_linetrace: the supercover column-sweep replayed in SQL over
    the same WKB-decoded vertices — identical float64 expression tree
    (same swap-ordering CASE, same greatest/least x-slab, same
    left-associated interpolation ``y0 + (xa-x0)/(x1-x0)*(y1-y0)``) so
    every floor() sees bit-identical doubles; the LATERAL range expansions
    mirror the engine's two ragged repeats."""
    from .tiles import TILE_RES_DEG

    res = TILE_RES_DEG
    return f"""
WITH {_street_verts_cte(world_dir)},
seg0 AS (
  SELECT a.osm_id,
         (a.x + 180.0) / {res} AS gxa, (a.y + 90.0) / {res} AS gya,
         (b.x + 180.0) / {res} AS gxb, (b.y + 90.0) / {res} AS gyb
  FROM verts a JOIN verts b ON b.osm_id = a.osm_id AND b.seq = a.seq + 1
),
seg AS (
  SELECT osm_id,
         CASE WHEN gxa > gxb THEN gxb ELSE gxa END AS x0,
         CASE WHEN gxa > gxb THEN gyb ELSE gya END AS y0,
         CASE WHEN gxa > gxb THEN gxa ELSE gxb END AS x1,
         CASE WHEN gxa > gxb THEN gya ELSE gyb END AS y1
  FROM seg0
),
cols AS (
  SELECT osm_id, x0, y0, x1, y1, CAST(ku.k AS BIGINT) AS k
  FROM seg,
       LATERAL unnest(range(CAST(floor(x0) AS BIGINT),
                            CAST(floor(x1) AS BIGINT) + 1)) AS ku(k)
),
spans AS (
  SELECT osm_id, k,
    CASE WHEN x1 = x0 THEN y0
         ELSE y0 + (greatest(x0, CAST(k AS DOUBLE)) - x0)
                   / (x1 - x0) * (y1 - y0) END AS ya,
    CASE WHEN x1 = x0 THEN y1
         ELSE y0 + (least(x1, CAST(k AS DOUBLE) + 1.0) - x0)
                   / (x1 - x0) * (y1 - y0) END AS yb
  FROM cols
),
cells AS (
  SELECT osm_id, k AS ix, CAST(iyu.iy AS BIGINT) AS iy
  FROM spans,
       LATERAL unnest(range(CAST(floor(least(ya, yb)) AS BIGINT),
                            CAST(floor(greatest(ya, yb)) AS BIGINT) + 1)) AS iyu(iy)
)
SELECT DISTINCT osm_id, ix, iy, (ix << 22) | iy AS cell FROM cells
"""


def dbscan_sql(world_dir: str) -> str:
    """geo_dbscan: the whole composition recomputed independently —
    ε-graph by a direct neighbor-predicate self-join (no PBSM), cores by
    a plain degree count, clusters by a recursive-CTE reachability
    closure with min-label (no star contraction), border/noise by set
    subtraction. Distance expression mirrors the engine
    operation-for-operation."""
    from .geometry import DBSCAN_EPS_M, DBSCAN_MIN_PTS, DBSCAN_RES_DEG

    return f"""
WITH RECURSIVE
p AS (SELECT osm_id, lon, lat,
        CAST(floor((lon + 180.0) / {DBSCAN_RES_DEG}) AS BIGINT) AS ix,
        CAST(floor((lat + 90.0) / {DBSCAN_RES_DEG}) AS BIGINT) AS iy
      FROM read_parquet('{world_dir}/osm_addresses.parquet')),
nb AS (
  SELECT a.osm_id AS u, b.osm_id AS v
  FROM p a JOIN p b
    ON a.osm_id <> b.osm_id
   AND b.ix BETWEEN a.ix - 1 AND a.ix + 1
   AND b.iy BETWEEN a.iy - 1 AND a.iy + 1
  WHERE 6371000.0 * sqrt(
          pow((b.lat - a.lat) * pi() / 180, 2)
          + pow((b.lon - a.lon) * pi() / 180
                * cos((a.lat + b.lat) / 2 * pi() / 180), 2)) < {DBSCAN_EPS_M}
),
deg AS (SELECT u, count(*) AS d FROM nb GROUP BY u),
core AS (SELECT u FROM deg WHERE d + 1 >= {DBSCAN_MIN_PTS}),
cce AS (SELECT nb.u, nb.v FROM nb
        JOIN core c1 ON c1.u = nb.u JOIN core c2 ON c2.u = nb.v),
reach(a, dnode) AS (
  SELECT u, u FROM core
  UNION
  SELECT r.a, e.v FROM reach r JOIN cce e ON e.u = r.dnode
),
lab AS (SELECT a AS u, min(dnode) AS cluster FROM reach GROUP BY a),
border AS (
  SELECT nb.v AS osm_id, min(lab.cluster) AS cluster
  FROM nb JOIN core c ON c.u = nb.u JOIN lab ON lab.u = nb.u
  WHERE nb.v NOT IN (SELECT u FROM core)
  GROUP BY nb.v
)
SELECT u AS osm_id, 'core' AS role, CAST(cluster AS BIGINT) AS cluster_id FROM lab
UNION ALL
SELECT osm_id, 'border' AS role, CAST(cluster AS BIGINT) AS cluster_id FROM border
UNION ALL
SELECT p.osm_id, 'noise' AS role, CAST(-1 AS BIGINT) AS cluster_id
FROM p
WHERE p.osm_id NOT IN (SELECT u FROM lab)
  AND p.osm_id NOT IN (SELECT osm_id FROM border)
"""


def street_bearing_sql(world_dir: str) -> str:
    """geo_street_bearing: segment bearings, axial doubling, resultant and
    halved mean angle recomputed from the same WKB bytes with the same
    expression shapes; libm atan2/sin/cos ulp differences are absorbed by
    the round-6 contract."""
    return f"""
WITH {_street_verts_cte(world_dir)},
seg AS (
  SELECT a.osm_id,
         atan2((b.x - a.x) * cos((a.y + b.y) / 2 * pi() / 180),
               b.y - a.y) AS th
  FROM verts a JOIN verts b ON b.osm_id = a.osm_id AND b.seq = a.seq + 1
),
agg AS (SELECT osm_id, count(*) AS n,
               sum(sin(2 * th)) AS s, sum(cos(2 * th)) AS c
        FROM seg GROUP BY osm_id),
fin AS (SELECT osm_id, n, degrees(atan2(s, c)) / 2 AS half,
               sqrt(s * s + c * c) / n AS r
        FROM agg)
SELECT CAST(osm_id AS BIGINT) AS osm_id, CAST(n AS BIGINT) AS n_segments,
       round(CASE WHEN half < 0 THEN half + 180 ELSE half END, 6) AS bearing_deg,
       round(r, 6) AS resultant
FROM fin
"""


def tile_coverage_sql(world_dir: str, res: float = 0.01) -> str:
    """geo_tile_coverage: the synthetic world's boundary rings are
    axis-aligned rectangles (worldgen construction — no holes), so the
    engine's general Sutherland–Hodgman clip + shoelace reduces to
    interval-intersection products over the decoded per-ring WKB bboxes —
    the engine-general / oracle-special split. The ring walk is the
    muni_area recursive chain; tile bounds use the identical
    ``i*res − 180/90`` float expressions as the engine."""
    return f"""
WITH RECURSIVE
h AS (SELECT area_id, hex(polygon_wkb) AS hx,
             {_u32le('hex(polygon_wkb)', '1')} AS gtype
      FROM read_parquet('{world_dir}/boundaries.parquet')
      WHERE sub_id = '-1'),
hn AS (SELECT *, CASE WHEN gtype = 3 THEN 1 ELSE {_u32le('hx', '5')} END AS npolys,
              CASE WHEN gtype = 3 THEN 0 ELSE 9 END AS p0
       FROM h),
rings(area_id, poly_idx, ring_idx, nrings, off, n) AS (
  SELECT area_id, 0, 0, {_u32le('hx', 'p0 + 5')}, p0 + 13,
         {_u32le('hx', 'p0 + 9')}
  FROM hn
  UNION ALL
  SELECT r.area_id,
    CASE WHEN r.ring_idx + 1 < r.nrings THEN r.poly_idx ELSE r.poly_idx + 1 END,
    CASE WHEN r.ring_idx + 1 < r.nrings THEN r.ring_idx + 1 ELSE 0 END,
    CASE WHEN r.ring_idx + 1 < r.nrings THEN r.nrings
         ELSE {_u32le('hn.hx', 'r.off + 16*r.n + 5')} END,
    CASE WHEN r.ring_idx + 1 < r.nrings THEN r.off + 16*r.n + 4
         ELSE r.off + 16*r.n + 13 END,
    CASE WHEN r.ring_idx + 1 < r.nrings THEN {_u32le('hn.hx', 'r.off + 16*r.n')}
         ELSE {_u32le('hn.hx', 'r.off + 16*r.n + 9')} END
  FROM rings r JOIN hn ON hn.area_id = r.area_id
  WHERE r.ring_idx + 1 < r.nrings OR r.poly_idx + 1 < hn.npolys
),
idx AS (SELECT area_id, poly_idx, ring_idx, off, unnest(range(n)) AS i
        FROM rings),
u AS (SELECT area_id, poly_idx, ring_idx, i,
        {_u64le('hn.hx', 'idx.off + 16*i')} AS ux,
        {_u64le('hn.hx', 'idx.off + 16*i + 8')} AS uy
      FROM idx JOIN hn USING (area_id)),
verts AS (SELECT area_id, poly_idx, ring_idx, i,
        {_f64_from_u('ux')} AS x, {_f64_from_u('uy')} AS y FROM u),
bb AS (SELECT area_id, poly_idx, ring_idx,
              min(x) AS x0, max(x) AS x1, min(y) AS y0, max(y) AS y1
       FROM verts GROUP BY 1, 2, 3),
tx AS (SELECT bb.*, unnest(range(CAST(floor((x0 + 180.0) / {res}) AS BIGINT),
                                 CAST(floor((x1 + 180.0) / {res}) AS BIGINT) + 1)) AS ix
       FROM bb),
txy AS (SELECT tx.*, unnest(range(CAST(floor((y0 + 90.0) / {res}) AS BIGINT),
                                  CAST(floor((y1 + 90.0) / {res}) AS BIGINT) + 1)) AS iy
        FROM tx),
ov AS (SELECT area_id, ix, iy,
              greatest(0.0, least(x1, (ix + 1) * {res} - 180.0)
                            - greatest(x0, ix * {res} - 180.0))
            * greatest(0.0, least(y1, (iy + 1) * {res} - 90.0)
                            - greatest(y0, iy * {res} - 90.0)) AS a
       FROM txy),
agg AS (SELECT area_id, ix, iy, sum(a) AS cov FROM ov GROUP BY 1, 2, 3)
SELECT * FROM (
  SELECT CAST(area_id AS BIGINT) AS area_id, CAST(ix AS BIGINT) AS ix,
         CAST(iy AS BIGINT) AS iy,
         round(cov / (((ix + 1) * {res} - 180.0 - (ix * {res} - 180.0))
                      * ((iy + 1) * {res} - 90.0 - (iy * {res} - 90.0))), 9) AS frac
  FROM agg)
WHERE frac > 0
"""
