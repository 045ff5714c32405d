"""Vector-geometry operators over the world's WKB columns.

The reference moves geometry as PostGIS WKT/WKB through JDBC and leans on
PostGIS for measurement/generalization (e.g. boundary polygon handling in
TheoreticalHousenumbers.java:846-869, street segment assembly in
util/OSMSegment.java:58-71); tile pipelines downstream of it (the regio-osm
map layers) simplify street/boundary geometry per zoom level.  Here the same
capabilities are Ray-Data-native batch kernels over Arrow ``binary`` WKB
columns:

- ``street_vertices``  — WKB linestring → one row per vertex, decoded with a
  SINGLE ``np.frombuffer`` per batch (no per-row struct unpacking on the hot
  axis).  Zero shuffle; scales with pages of the streets table.
- ``muni_area``        — per-boundary shoelace area (deg² and km²) + exterior
  centroid from ``polygon_wkb`` incl. holes.  Stateless map_batches over the
  (small) boundary dimension table.
- ``line_simplify``    — deterministic densify + Douglas-Peucker
  generalization (the tile-zoom primitive).  Stateless map_batches, zero
  shuffle: every geometry is simplified independently, so the operator
  scales embarrassingly with the number of geometries.

Every float expression here is mirrored LITERALLY in
``geometry_oracle.py`` (DuckDB decodes the same WKB bytes via hex →
IEEE-754 bit arithmetic), so the driver's value-hash comparison is exact —
no tolerance, no approximate match.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

# --- shared densify/DP constants (mirrored in geometry_oracle.py) ---------
DENSIFY_D = 8          # densified points per original segment
DENSIFY_AMP = 0.0008   # max |perpendicular offset| in degrees
SIMPLIFY_EPS = 0.0003  # Douglas-Peucker tolerance in degrees
_HASH_M1 = 7349
_HASH_M2 = 2654435761
_HASH_M3 = 97


def _ragged_arange(counts: np.ndarray) -> np.ndarray:
    """[0..c0-1, 0..c1-1, ...] for int64 counts — fully vectorized."""
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    ends = np.cumsum(counts)
    starts = ends - counts
    return np.arange(total, dtype=np.int64) - np.repeat(starts, counts)


def decode_linestrings(bufs: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """Decode a batch of little-endian WKB LineStrings.

    Returns ``(npts, pts)``: per-row vertex counts (int64) and the stacked
    ``(sum(npts), 2)`` float64 coordinate array.  One ``b"".join`` + one
    ``np.frombuffer`` per batch — the vertex axis never touches Python.
    """
    if not bufs:
        return np.zeros(0, dtype=np.int64), np.zeros((0, 2))
    raw = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=len(bufs))
    ends = np.cumsum(lens)
    starts = ends - lens
    if not (raw[starts] == 1).all() or not (raw[starts + 1] == 2).all():
        raise ValueError("expected little-endian WKB LineString (type 2)")
    npts = (lens - 9) // 16
    # header-declared counts must agree with the byte length
    declared = (
        raw[starts + 5].astype(np.int64)
        | (raw[starts + 6].astype(np.int64) << 8)
        | (raw[starts + 7].astype(np.int64) << 16)
        | (raw[starts + 8].astype(np.int64) << 24)
    )
    if not (declared == npts).all():
        raise ValueError("WKB LineString header count mismatch")
    counts = 16 * npts
    idx = np.repeat(starts + 9, counts) + _ragged_arange(counts)
    pts = np.frombuffer(raw[idx].tobytes(), dtype="<f8").reshape(-1, 2)
    return npts, pts


def street_vertices(world_dir: str) -> rd.Dataset:
    """WKB → vertex rows: (osm_id, seq, lon, lat), one row per linestring
    vertex.  The raster↔vector bridge every geometry operator builds on."""
    streets = rd.read_parquet(
        f"{world_dir}/osm_streets.parquet", columns=["osm_id", "linestring_wkb"]
    )

    def decode(b: pd.DataFrame) -> pd.DataFrame:
        npts, pts = decode_linestrings(b["linestring_wkb"].tolist())
        return pd.DataFrame({
            "osm_id": np.repeat(b["osm_id"].to_numpy(np.int64), npts),
            "seq": _ragged_arange(npts),
            "lon": pts[:, 0],
            "lat": pts[:, 1],
        })

    return streets.map_batches(decode, batch_format="pandas")


def street_length(world_dir: str) -> rd.Dataset:
    """Per-street polyline LENGTH (the network-measurement primitive behind
    per-muni road-density stats): equirectangular segment lengths on the
    WGS84 sphere (R = 6 371 000 m, mid-latitude cos correction), summed per
    linestring.

    Output: (osm_id, n_vertices, n_segments, length_m round-2).

    Scale shape: stateless zero-shuffle map_batches — each batch decodes
    its linestrings with one ``np.frombuffer`` and reduces segment lengths
    per street via ``np.bincount``; no per-row Python in the vertex math.
    The ONLY cross-engine float divergence is libm cos/sqrt (≤1 ulp),
    absorbed by the round-2 (cm-granularity) contract; the formula below
    is mirrored operation-for-operation in ``geometry_oracle``."""
    streets = rd.read_parquet(
        f"{world_dir}/osm_streets.parquet", columns=["osm_id", "linestring_wkb"]
    )

    def measure(b: pd.DataFrame) -> pd.DataFrame:
        npts, pts = decode_linestrings(b["linestring_wkb"].tolist())
        lon, lat = pts[:, 0], pts[:, 1]
        n = len(b)
        starts = np.concatenate(([0], np.cumsum(npts)[:-1]))
        if len(pts) > 1:
            dlat = (lat[1:] - lat[:-1]) * np.pi / 180
            dlon = ((lon[1:] - lon[:-1]) * np.pi / 180
                    * np.cos((lat[:-1] + lat[1:]) / 2 * np.pi / 180))
            d = 6371000.0 * np.sqrt(dlat ** 2 + dlon ** 2)
            valid = np.ones(len(pts) - 1, dtype=bool)
            valid[starts[1:] - 1] = False
            seg_street = np.repeat(np.arange(n, dtype=np.int64),
                                   np.maximum(npts - 1, 0))
            lengths = np.bincount(seg_street, weights=d[valid], minlength=n)
        else:
            lengths = np.zeros(n, dtype=np.float64)
        return pd.DataFrame({
            "osm_id": b["osm_id"].to_numpy(np.int64),
            "n_vertices": npts.astype(np.int64),
            "n_segments": np.maximum(npts - 1, 0).astype(np.int64),
            "length_m": np.round(lengths, 2),
        })

    return streets.map_batches(measure, batch_format="pandas")


# --- polygon measurement ---------------------------------------------------

def muni_area(world_dir: str) -> rd.Dataset:
    """Per-boundary (multi)polygon measurement: shoelace area (deg² and
    km², exteriors minus holes across all parts) and the centroid of the
    FIRST exterior ring (the primary part — documented contract).

    Scale shape: the boundary table is a dimension table (SCALING.md bounds
    it at admin-unit cardinality); the per-row ring walk is a short Python
    loop over ≤ a few rings while the vertex math inside each ring is
    vectorized.  Zero shuffle."""
    from ..geo.wkb import wkb_rings
    bounds = rd.read_parquet(
        f"{world_dir}/boundaries.parquet",
        columns=["area_id", "muni_id", "name", "polygon_wkb"],
    )

    def measure(b: pd.DataFrame) -> pd.DataFrame:
        out = {k: [] for k in ("area_id", "muni_id", "name", "n_rings",
                               "n_vertices", "area_deg2", "area_km2",
                               "centroid_lon", "centroid_lat")}
        for area_id, muni_id, name, wkb in zip(
            b["area_id"], b["muni_id"], b["name"], b["polygon_wkb"]
        ):
            rings = wkb_rings(bytes(wkb))
            # signed shoelace sum per ring: sum over k of cross(P_k, P_k+1),
            # RE-CENTERED at the ring's first vertex (small cross products →
            # no cancellation; matches geometry_oracle literally).  Rings
            # are closed (last == first), so k runs 0..n-2.
            area = 0.0
            clon = clat = 0.0
            seen_first_ext = False
            for ring, is_ext in rings:
                fx, fy = ring[0, 0], ring[0, 1]
                x, y = ring[:, 0] - fx, ring[:, 1] - fy
                cr = x[:-1] * y[1:] - x[1:] * y[:-1]
                sum_cr = float(np.sum(cr))
                if is_ext:
                    area = area + abs(0.5 * sum_cr)
                    if not seen_first_ext:
                        seen_first_ext = True
                        sum_cx = float(np.sum((x[:-1] + x[1:]) * cr))
                        sum_cy = float(np.sum((y[:-1] + y[1:]) * cr))
                        clon = fx + sum_cx / (3.0 * sum_cr)
                        clat = fy + sum_cy / (3.0 * sum_cr)
                else:
                    area = area - abs(0.5 * sum_cr)
            km2 = area * 111.32 * 111.32 * float(np.cos(np.pi * clat / 180.0))
            out["area_id"].append(area_id)
            out["muni_id"].append(muni_id)
            out["name"].append(name)
            out["n_rings"].append(len(rings))
            out["n_vertices"].append(int(sum(len(r) for r, _ in rings)))
            out["area_deg2"].append(area)
            out["area_km2"].append(km2)
            out["centroid_lon"].append(clon)
            out["centroid_lat"].append(clat)
        df = pd.DataFrame(out)
        for c in ("area_id", "muni_id", "n_rings", "n_vertices"):
            df[c] = df[c].astype(np.int64)
        return df

    return bounds.map_batches(measure, batch_format="pandas")


# --- densify + Douglas-Peucker --------------------------------------------

def _densify(osm_id: np.ndarray, npts: np.ndarray, pts: np.ndarray,
             d: int = DENSIFY_D, amp: float = DENSIFY_AMP):
    """Deterministically densify each linestring: between every consecutive
    vertex pair insert d-1 points at t = k/d, displaced perpendicular by
    amp · z where z ∈ [-1, 1) comes from integer hashing of
    (osm_id, segment, k) — pure int64 arithmetic, so the DuckDB oracle
    reproduces every coordinate bit-exactly.

    Returns (street_row, seq, x, y) arrays sorted by (street_row, seq);
    seq = segment·d + k, so the final vertex of street with m points is
    (m-1)·d.  Vectorized across ALL segments of the batch at once."""
    n_rows = len(npts)
    ends = np.cumsum(npts)
    starts = ends - npts
    x, y = pts[:, 0], pts[:, 1]

    # originals: every input vertex, seq = s*d
    orig_row = np.repeat(np.arange(n_rows, dtype=np.int64), npts)
    orig_seq = _ragged_arange(npts) * d

    # segments: per street, vertices 0..m-2 pair with their successor
    nseg = npts - 1
    seg_row = np.repeat(np.arange(n_rows, dtype=np.int64), nseg)
    seg_s = _ragged_arange(nseg)                       # segment index in street
    a = np.repeat(starts, nseg) + seg_s                # global idx of segment start
    x0, y0 = x[a], y[a]
    dx, dy = x[a + 1] - x0, y[a + 1] - y0
    ln = np.sqrt(dx * dx + dy * dy)

    # inserted points: each segment × k = 1..d-1
    k = np.tile(np.arange(1, d, dtype=np.int64), len(a))
    rep = np.repeat(np.arange(len(a), dtype=np.int64), d - 1)
    zint = (np.repeat(osm_id[seg_row], d - 1) * _HASH_M1
            + np.repeat(seg_s, d - 1) * _HASH_M2 + k * _HASH_M3) % 2048
    z = (zint - 1024) / 1024.0
    t = k / float(d)
    ins_x = x0[rep] + t * dx[rep] + (amp * z) * (-dy[rep]) / ln[rep]
    ins_y = y0[rep] + t * dy[rep] + (amp * z) * dx[rep] / ln[rep]
    ins_row = seg_row[rep]
    ins_seq = seg_s[rep] * d + k

    row = np.concatenate([orig_row, ins_row])
    seq = np.concatenate([orig_seq, ins_seq])
    xx = np.concatenate([x, ins_x])  # originals are already in global order
    yy = np.concatenate([y, ins_y])
    order = np.lexsort((seq, row))
    return row[order], seq[order], xx[order], yy[order]


def _dp_keep(x: np.ndarray, y: np.ndarray, eps: float) -> np.ndarray:
    """Douglas-Peucker keep mask for one polyline.  The split point is the
    FIRST (lowest-index) point attaining the maximum deviation — mirrored by
    the oracle's ``ORDER BY d DESC, seq ASC`` tie-break.  Perpendicular
    deviation uses the cross-product form; degenerate (zero-length) chords
    fall back to distance-to-endpoint."""
    n = len(x)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        xi, yi, xj, yj = x[i], y[i], x[j], y[j]
        dx, dy = xj - xi, yj - yi
        den = np.sqrt(dx * dx + dy * dy)
        xs, ys = x[i + 1:j], y[i + 1:j]
        if den == 0.0:
            dist = np.sqrt((xs - xi) * (xs - xi) + (ys - yi) * (ys - yi))
        else:
            dist = np.abs(dx * (yi - ys) - (xi - xs) * dy) / den
        kmax = int(np.argmax(dist))
        if dist[kmax] > eps:
            s = i + 1 + kmax
            keep[s] = True
            stack.append((s, j))
            stack.append((i, s))
    return keep


def line_simplify(world_dir: str, d: int = DENSIFY_D, amp: float = DENSIFY_AMP,
                  eps: float = SIMPLIFY_EPS) -> rd.Dataset:
    """Densify-then-generalize: street linestrings are deterministically
    densified (the high-resolution survey rendition) and Douglas-Peucker
    reduces them back to tolerance ``eps`` — the per-zoom generalization
    step of a tile pipeline.  Output: kept vertices (osm_id, seq, lon, lat).

    Scale shape: stateless map_batches, ZERO shuffle — each geometry is
    independent.  The vertex axis (densify + per-chord deviation) is numpy;
    the only Python loop is the per-geometry DP stack, bounded by geometries
    per batch with ~d·m work each."""
    streets = rd.read_parquet(
        f"{world_dir}/osm_streets.parquet", columns=["osm_id", "linestring_wkb"]
    )

    def simplify(b: pd.DataFrame) -> pd.DataFrame:
        osm = b["osm_id"].to_numpy(np.int64)
        npts, pts = decode_linestrings(b["linestring_wkb"].tolist())
        row, seq, x, y = _densify(osm, npts, pts, d=d, amp=amp)
        dcount = (npts - 1) * d + 1
        ends = np.cumsum(dcount)
        starts = ends - dcount
        keep = np.zeros(len(x), dtype=bool)
        for r in range(len(npts)):
            s, e = starts[r], ends[r]
            keep[s:e] = _dp_keep(x[s:e], y[s:e], eps)
        return pd.DataFrame({
            "osm_id": osm[row[keep]],
            "seq": seq[keep],
            "lon": x[keep],
            "lat": y[keep],
        })

    return streets.map_batches(simplify, batch_format="pandas")


#: equirectangular longitude scale at the reference latitude 50°N —
#: a LITERAL shared with the SQL oracle (a runtime cos() could differ in
#: the last ulp between libm builds and flip a near-tie argmin)
COS_REF_LAT = 0.6427876096865393


def reverse_geocode(world_dir: str) -> rd.Dataset:
    """Reverse geocoding: assign every OSM address point to the NEAREST
    admin-unit center (bbox midpoint), with the equirectangular squared
    metric  d2 = ((lon-cx)·COS_REF_LAT)² + (lat-cy)²  and ties broken by
    lowest area_id.  Output: (osm_id, area_id, d2).

    Scale shape: the boundary table is the admin-unit dimension table
    (SCALING.md bounds it); centers are ``ray.put`` ONCE and fetched in
    each actor's ``__init__`` (the ST5 broadcast pattern).  The per-batch
    argmin runs over center CHUNKS of 1024 with a running (best_d2, best_id)
    so memory stays batch×chunk regardless of admin-unit count; chunks are
    scanned in ascending area_id order and updates are strict ``<``, which
    reproduces the oracle's ``ORDER BY d2, area_id`` tie-break exactly.
    Dense deployments beyond ~10⁵ units would switch to the cell-ring kNN
    (geo/index.py J8 path); this operator is the broadcast-dimension
    variant."""
    import pyarrow.parquet as pq
    import ray

    centers_tbl = pq.read_table(
        f"{world_dir}/boundaries.parquet",
        columns=["area_id", "minlon", "minlat", "maxlon", "maxlat"],
    ).to_pandas().sort_values("area_id")
    cx = ((centers_tbl["minlon"].to_numpy() + centers_tbl["maxlon"].to_numpy())
          / 2.0)
    cy = ((centers_tbl["minlat"].to_numpy() + centers_tbl["maxlat"].to_numpy())
          / 2.0)
    ref = ray.put((centers_tbl["area_id"].to_numpy(np.int64), cx, cy))

    class Nearest:
        def __init__(self):
            self.ids, self.cx, self.cy = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            lon = b["lon"].to_numpy(np.float64)[:, None]
            lat = b["lat"].to_numpy(np.float64)[:, None]
            best_d2 = np.full(len(b), np.inf)
            best_id = np.zeros(len(b), dtype=np.int64)
            for s in range(0, len(self.ids), 1024):
                ccx = self.cx[None, s:s + 1024]
                ccy = self.cy[None, s:s + 1024]
                d2 = ((lon - ccx) * COS_REF_LAT) ** 2 + (lat - ccy) ** 2
                j = np.argmin(d2, axis=1)          # first min = lowest id
                dmin = d2[np.arange(len(b)), j]
                upd = dmin < best_d2               # strict → earlier id wins ties
                best_d2[upd] = dmin[upd]
                best_id[upd] = self.ids[s:s + 1024][j[upd]]
            return pd.DataFrame({
                "osm_id": b["osm_id"].to_numpy(np.int64),
                "area_id": best_id,
                "d2": best_d2,
            })

    pts = rd.read_parquet(
        f"{world_dir}/osm_addresses.parquet", columns=["osm_id", "lon", "lat"]
    )
    # autoscaling pool (min 1): a FIXED pool of 4 × num_cpus=1 actors would
    # consume every CPU of a small (e.g. 4-cpu test) session and starve the
    # upstream read — the documented 4-cpu starvation mode
    return pts.map_batches(Nearest, batch_format="pandas",
                           concurrency=(1, 4), num_cpus=1)


BBOX_PAIR_RES = 0.5


def muni_bbox_pairs(world_dir: str, res_deg: float = BBOX_PAIR_RES) -> rd.Dataset:
    """Spatial SELF-join on bbox intersection: all boundary pairs whose
    (multi)polygon bounding boxes intersect, with the overlap area — the
    partition-based spatial-merge (PBSM) pattern every distributed spatial
    engine builds range/intersects joins on.

    Scale shape: one decode pass emits (cell, area_id, bbox) rows for every
    coarse grid cell the bbox covers (res_deg ≫ the join grid: a
    muni-sized bbox covers O(1) cells); ONE shuffle on the cell id; within
    each cell a vectorized triu all-pairs intersect test. Duplicate
    suppression is the textbook REFERENCE-POINT rule — a pair is reported
    only by the cell containing the overlap box's min corner — so no second
    dedup shuffle exists. Skew bound: a cell holds only dimension-table
    rows (boundaries), and res_deg tunes cell occupancy.

    Oracle: bboxes recomputed in SQL from the raw WKB bytes (IEEE-754
    decode), then a plain intersect self-join — no grid, no reference
    points, which independently validates both the cover and the dedup
    rule."""
    from ..geo.cells import bbox_cover, latlng_to_cell
    from ..geo.wkb import wkb_bbox

    bounds = rd.read_parquet(f"{world_dir}/boundaries.parquet",
                             columns=["area_id", "polygon_wkb"])

    def cover(b: pd.DataFrame) -> pd.DataFrame:
        cells, aid, mnx, mny, mxx, mxy = [], [], [], [], [], []
        for area_id, wkb in zip(b["area_id"], b["polygon_wkb"]):
            x0, y0, x1, y1 = wkb_bbox(bytes(wkb))
            for c in bbox_cover(x0, y0, x1, y1, res_deg=res_deg):
                cells.append(int(c)); aid.append(int(area_id))
                mnx.append(x0); mny.append(y0); mxx.append(x1); mxy.append(y1)
        return pd.DataFrame({
            "cell": pd.Series(cells, dtype=np.int64),
            "area_id": pd.Series(aid, dtype=np.int64),
            "mnx": mnx, "mny": mny, "mxx": mxx, "mxy": mxy,
        })

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"area_id_a": pd.Series([], dtype=np.int64),
                              "area_id_b": pd.Series([], dtype=np.int64),
                              "overlap_deg2": pd.Series([], dtype=np.float64)})
        n = len(g)
        if n < 2:
            return empty
        cell = int(g["cell"].iloc[0])
        g = g.sort_values("area_id", kind="mergesort")
        aid = g["area_id"].to_numpy(np.int64)
        mnx = g["mnx"].to_numpy(np.float64); mny = g["mny"].to_numpy(np.float64)
        mxx = g["mxx"].to_numpy(np.float64); mxy = g["mxy"].to_numpy(np.float64)
        ia, ib = np.triu_indices(n, k=1)
        hit = ((mnx[ia] <= mxx[ib]) & (mnx[ib] <= mxx[ia])
               & (mny[ia] <= mxy[ib]) & (mny[ib] <= mxy[ia]))
        ia, ib = ia[hit], ib[hit]
        if not len(ia):
            return empty
        ovx0 = np.maximum(mnx[ia], mnx[ib]); ovy0 = np.maximum(mny[ia], mny[ib])
        ovx1 = np.minimum(mxx[ia], mxx[ib]); ovy1 = np.minimum(mxy[ia], mxy[ib])
        own = latlng_to_cell(ovy0, ovx0, res_deg=res_deg) == cell
        ia, ib = ia[own], ib[own]
        if not len(ia):
            return empty
        return pd.DataFrame({
            "area_id_a": aid[ia], "area_id_b": aid[ib],
            "overlap_deg2": np.round(
                (ovx1[own] - ovx0[own]) * (ovy1[own] - ovy0[own]), 9),
        })

    return (bounds.map_batches(cover, batch_format="pandas")
            .groupby("cell").map_groups(pairs, batch_format="pandas"))


RADIUS_PAIR_M = 50.0
RADIUS_PAIR_RES = 0.002

_CELL_BITS = 22  # iy occupies the low 22 bits of the packed int64 cell key


def _check_lat_band(lat: np.ndarray, radius_m: float, res_deg: float) -> None:
    """The fixed-degree grid's 1-cell neighborhood only covers the full
    ``radius_m`` ball while the longitudinal cell width (res_deg · 111320 ·
    cos lat) stays ≥ radius_m (≈ |lat| ≤ 63° at the defaults). Beyond the
    band the join would silently MISS true neighbors — and the SQL oracle
    applies the identical window, so parity tests can't catch it. Fail
    loudly instead (ADVICE r4)."""
    if len(lat) == 0:
        return
    cell_m = res_deg * 111320.0 * np.cos(np.radians(np.abs(lat).max()))
    if cell_m < radius_m:
        band = float(np.degrees(np.arccos(min(1.0, radius_m / (res_deg * 111320.0)))))
        raise ValueError(
            f"input latitude {float(np.abs(lat).max()):.2f}° outside the grid's "
            f"validity band (|lat| ≤ {band:.1f}° for radius {radius_m} m at "
            f"res {res_deg}°); widen res_deg or the neighbor window")


def _neighbor_cell_mask(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    """Validity mask for SHIFTED neighbor cell indices: negative iy would
    OR all-ones into the packed key ((ix<<22)|iy) and alias unrelated
    cells into one group (ADVICE r4); negative ix likewise collides.
    Out-of-range neighbor cells can never contain a real probe/partner
    (real points always have ix, iy ≥ 0), so dropping them is exact."""
    return (ix >= 0) & (iy >= 0) & (iy < (1 << _CELL_BITS))


def address_radius_pairs(world_dir: str, radius_m: float = RADIUS_PAIR_M,
                         res_deg: float = RADIUS_PAIR_RES) -> rd.Dataset:
    """Within-RADIUS point-pair spatial self-join over the address points —
    the distance-join primitive (duplicate-entry QA: two address nodes
    within ``radius_m`` meters, flagged when they carry the same
    housenumber). Output: (osm_id_a, osm_id_b, dist_m round-2, same_hnr)
    with ``osm_id_a < osm_id_b``, distance equirectangular on the WGS84
    sphere (the exact formula of :func:`street_length`, mirrored
    operation-for-operation in the SQL oracle).

    Scale shape (PBSM distance join): each point is replicated to FOUR
    cells — its own and the -1 neighbors, ``(ix-dx, iy-dy), dx,dy∈{0,1}``
    — then ONE shuffle on the cell id and a vectorized triu all-pairs
    distance test per cell. Correct because the grid width is ≥ radius_m
    in both axes (res_deg·111320·cos(lat) ≥ radius_m for |lat| ≤ 83 at the
    defaults), so a qualifying pair differs by ≤1 cell per axis and BOTH
    members land in the pair's min-corner cell ``(min ix, min iy)``.
    Duplicate suppression is the same reference-point rule as
    :func:`muni_bbox_pairs`: a pair is emitted only by its min-corner
    cell — no second dedup shuffle. 4× replication (not 9×) is the
    half-neighborhood optimization the min-corner rule allows.

    Oracle: plain neighbor-predicate self-join in SQL (no replication, no
    reference points) — independently validates cover + dedup rule."""

    pts = rd.read_parquet(
        f"{world_dir}/osm_addresses.parquet",
        columns=["osm_id", "lon", "lat", "addr_housenumber"])

    def cover(b: pd.DataFrame) -> pd.DataFrame:
        lat = b["lat"].to_numpy(np.float64)
        _check_lat_band(lat, radius_m, res_deg)
        ix = np.floor((b["lon"].to_numpy(np.float64) + 180.0) / res_deg).astype(np.int64)
        iy = np.floor((lat + 90.0) / res_deg).astype(np.int64)
        frames = []
        for dx in (0, 1):
            for dy in (0, 1):
                ok = _neighbor_cell_mask(ix - dx, iy - dy)
                frames.append(pd.DataFrame({
                    "cell": ((ix[ok] - dx) << _CELL_BITS) | (iy[ok] - dy),
                    "osm_id": b["osm_id"].to_numpy(np.int64)[ok],
                    "lon": b["lon"].to_numpy(np.float64)[ok],
                    "lat": lat[ok],
                    "ix": ix[ok], "iy": iy[ok],
                    "hnr": b["addr_housenumber"].fillna("").to_numpy(object)[ok],
                }))
        return pd.concat(frames, ignore_index=True)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"osm_id_a": pd.Series([], dtype=np.int64),
                              "osm_id_b": pd.Series([], dtype=np.int64),
                              "dist_m": pd.Series([], dtype=np.float64),
                              "same_hnr": pd.Series([], dtype=np.int64)})
        n = len(g)
        if n < 2:
            return empty
        cell = int(g["cell"].iloc[0])
        cx, cy = cell >> 22, cell & ((1 << 22) - 1)
        g = g.sort_values("osm_id", kind="mergesort")
        oid = g["osm_id"].to_numpy(np.int64)
        lon = g["lon"].to_numpy(np.float64)
        lat = g["lat"].to_numpy(np.float64)
        ix = g["ix"].to_numpy(np.int64)
        iy = g["iy"].to_numpy(np.int64)
        hnr = g["hnr"].to_numpy(object)
        ia, ib = np.triu_indices(n, k=1)
        # min-corner ownership: this cell reports the pair iff it IS the
        # pair's (min ix, min iy) cell
        own = (np.minimum(ix[ia], ix[ib]) == cx) & (np.minimum(iy[ia], iy[ib]) == cy)
        ia, ib = ia[own], ib[own]
        if not len(ia):
            return empty
        dlat = (lat[ib] - lat[ia]) * np.pi / 180
        dlon = ((lon[ib] - lon[ia]) * np.pi / 180
                * np.cos((lat[ia] + lat[ib]) / 2 * np.pi / 180))
        d = 6371000.0 * np.sqrt(dlat ** 2 + dlon ** 2)
        hit = d < radius_m
        ia, ib, d = ia[hit], ib[hit], d[hit]
        if not len(ia):
            return empty
        return pd.DataFrame({
            "osm_id_a": oid[ia], "osm_id_b": oid[ib],
            "dist_m": np.round(d, 2),
            "same_hnr": (hnr[ia] == hnr[ib]).astype(np.int64),
        })

    return (pts.map_batches(cover, batch_format="pandas")
            .groupby("cell").map_groups(pairs, batch_format="pandas"))


NN_JOIN_M = 100.0
NN_JOIN_RES = 0.002


def nearest_list_address(world_dir: str, radius_m: float = NN_JOIN_M,
                         res_deg: float = NN_JOIN_RES) -> rd.Dataset:
    """Capped-radius nearest-neighbor JOIN between two point datasets —
    for each OSM address the nearest official list address within
    ``radius_m`` meters (the nearest-POI primitive; ties → lower
    addr_id). Output: (osm_id, addr_id, dist_m round-2), one row per OSM
    address that has a qualifying neighbor.

    Scale shape (bipartite PBSM): the PROBE side (osm) lands in exactly
    its own cell; the BUILD side (list) is replicated to the full 3×3
    neighborhood, so every probe's R-ball candidates co-locate in the
    probe's cell (grid width ≥ radius_m at the defaults for |lat| ≤ 63).
    ONE shuffle on the cell id, then a vectorized n_o×n_l distance matrix
    + tie-broken argmin per probe inside each cell. Each probe appears in
    exactly one cell, so no dedup pass exists. Replication cost is 9× the
    SMALL side only — at crawl scale the build side is the bounded
    official list, the probe side streams.

    Distance is the equirectangular formula of :func:`address_radius_pairs`,
    mirrored operation-for-operation in the SQL oracle; the argmin is over
    the EXACT float distance (round-2 is applied to the reported column
    only), with addr_id as the deterministic tie-break in both engines."""

    osm = rd.read_parquet(f"{world_dir}/osm_addresses.parquet",
                          columns=["osm_id", "lon", "lat"])
    lst = rd.read_parquet(f"{world_dir}/list_addresses.parquet",
                          columns=["addr_id", "lon", "lat"])

    def cell_of(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        ix = np.floor((lon + 180.0) / res_deg).astype(np.int64)
        iy = np.floor((lat + 90.0) / res_deg).astype(np.int64)
        return ix, iy

    def probe_rows(b: pd.DataFrame) -> pd.DataFrame:
        lat = b["lat"].to_numpy(np.float64)
        _check_lat_band(lat, radius_m, res_deg)
        ix, iy = cell_of(b["lon"].to_numpy(np.float64), lat)
        return pd.DataFrame({
            "cell": (ix << _CELL_BITS) | iy,
            "pid": b["osm_id"].to_numpy(np.int64),
            "lon": b["lon"].to_numpy(np.float64),
            "lat": lat,
            "side": np.full(len(b), 0, dtype=np.int8),
        })

    def build_rows(b: pd.DataFrame) -> pd.DataFrame:
        lat = b["lat"].to_numpy(np.float64)
        _check_lat_band(lat, radius_m, res_deg)
        ix, iy = cell_of(b["lon"].to_numpy(np.float64), lat)
        frames = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                ok = _neighbor_cell_mask(ix + dx, iy + dy)
                frames.append(pd.DataFrame({
                    "cell": ((ix[ok] + dx) << _CELL_BITS) | (iy[ok] + dy),
                    "pid": b["addr_id"].to_numpy(np.int64)[ok],
                    "lon": b["lon"].to_numpy(np.float64)[ok],
                    "lat": lat[ok],
                    "side": np.full(int(ok.sum()), 1, dtype=np.int8),
                }))
        return pd.concat(frames, ignore_index=True)

    def nearest(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"osm_id": pd.Series([], dtype=np.int64),
                              "addr_id": pd.Series([], dtype=np.int64),
                              "dist_m": pd.Series([], dtype=np.float64)})
        o = g[g["side"] == 0]
        l = g[g["side"] == 1]
        if len(o) == 0 or len(l) == 0:
            return empty
        olat = o["lat"].to_numpy(np.float64)[:, None]
        olon = o["lon"].to_numpy(np.float64)[:, None]
        llat = l["lat"].to_numpy(np.float64)[None, :]
        llon = l["lon"].to_numpy(np.float64)[None, :]
        dlat = (llat - olat) * np.pi / 180
        dlon = (llon - olon) * np.pi / 180 * np.cos((olat + llat) / 2 * np.pi / 180)
        d = 6371000.0 * np.sqrt(dlat ** 2 + dlon ** 2)
        dmin = d.min(axis=1)
        hit = dmin < radius_m
        if not hit.any():
            return empty
        aid = l["pid"].to_numpy(np.int64)
        # tie-break on EXACT distance equality: min addr_id among argmins
        tie = d[hit] == dmin[hit][:, None]
        best = np.where(tie, aid[None, :], np.iinfo(np.int64).max).min(axis=1)
        return pd.DataFrame({
            "osm_id": o["pid"].to_numpy(np.int64)[hit],
            "addr_id": best,
            "dist_m": np.round(dmin[hit], 2),
        })

    union = (osm.map_batches(probe_rows, batch_format="pandas")
             .union(lst.map_batches(build_rows, batch_format="pandas")))
    return union.groupby("cell").map_groups(nearest, batch_format="pandas")


DBSCAN_EPS_M = 400.0
DBSCAN_RES_DEG = 0.008
DBSCAN_MIN_PTS = 4


def dbscan_clusters(world_dir: str, eps_m: float = DBSCAN_EPS_M,
                    res_deg: float = DBSCAN_RES_DEG,
                    min_pts: int = DBSCAN_MIN_PTS) -> rd.Dataset:
    """Distributed DBSCAN (Ester et al. 1996) over the address points —
    density-based spatial clustering: a point is CORE when its ε-ball
    holds ≥ min_pts points (self included); clusters are the connected
    components of the core-core ε-adjacency; non-core points with a core
    neighbor are BORDER (joining their minimum-labeled core neighbor's
    cluster — a deterministic tie rule); everything else is NOISE.
    Output: (osm_id, role ∈ {core, border, noise}, cluster_id = min core
    osm_id of the cluster, −1 for noise).

    Scale shape — composed entirely from the engine's bounded primitives:
    ε-neighbor pairs via the PBSM min-corner radius join
    (:func:`address_radius_pairs` at eps/res — grid width ≥ ε for
    |lat| ≲ 63 at the defaults), degrees by a two-level count reduce,
    core flags by hash-partitioned joins, cluster labels by the
    star-contraction :func:`~.corpus.connected_components` kernel
    (min-label, object-store resident), border assignment by one more
    bucketed join + per-point min reduce. No stage ever materializes the
    point set on the driver.

    Oracle: recursive-CTE reachability closure over the ε-graph in SQL
    (direct neighbor-predicate self-join — no PBSM, no star contraction),
    which independently validates the whole composition."""
    import pyarrow as pa

    from ..stages.join import bucketed_hash_join
    from .corpus import _shard_on, connected_components

    def _blocks() -> int:
        from ..stages.shuffle import shuffle_blocks

        return shuffle_blocks()

    pairs = (address_radius_pairs(world_dir, radius_m=eps_m, res_deg=res_deg)
             .map_batches(lambda b: b[["osm_id_a", "osm_id_b"]],
                          batch_format="pandas")
             .materialize())  # reused: degrees, core-core edges, borders

    def both_dirs(b: pd.DataFrame) -> pd.DataFrame:
        u = b["osm_id_a"].to_numpy(np.int64)
        v = b["osm_id_b"].to_numpy(np.int64)
        return pd.DataFrame({"u": np.concatenate([u, v]),
                             "v": np.concatenate([v, u])})

    both = pairs.map_batches(both_dirs, batch_format="pandas").materialize()

    # degrees → core points (two-level count reduce; deg excludes self)
    def deg_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("u", as_index=False).size().rename(columns={"size": "c"})
        g["c"] = g["c"].astype(np.int64)
        return g

    def core_shard(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("u", as_index=False).agg(deg=("c", "sum"))
        s = s[s["deg"] + 1 >= min_pts]
        return pd.DataFrame({"node": s["u"].to_numpy(np.int64)})

    cores = (both.map_batches(deg_partial, batch_format="pandas")
             .map_batches(_shard_on(["u"]), batch_format="pandas")
             .repartition(_blocks())
             .groupby("_shard")
             .map_groups(lambda g: core_shard(g.drop(columns=["_shard"])),
                         batch_format="pandas")
             .materialize())

    i64 = pa.int64()
    # edges with a core source
    e_cu = bucketed_hash_join(
        both, cores, "u", "node",
        left_schema={"u": i64, "v": i64}, right_schema={"node": i64},
    ).map_batches(lambda b: b[["u", "v"]], batch_format="pandas")
    # split by whether the destination is core too
    cores_v = cores.map_batches(
        lambda b: pd.DataFrame({"vnode": b["node"].to_numpy(np.int64)}),
        batch_format="pandas")
    e_tag = bucketed_hash_join(
        e_cu, cores_v, "v", "vnode", how="left",
        left_schema={"u": i64, "v": i64}, right_schema={"vnode": i64},
    ).materialize()
    core_core = e_tag.map_batches(
        lambda b: b.loc[b["vnode"].notna(), ["u", "v"]]
        .rename(columns={"u": "src", "v": "dst"}).astype(np.int64),
        batch_format="pandas")
    border_cand = e_tag.map_batches(
        lambda b: b.loc[b["vnode"].isna(), ["u", "v"]].astype(np.int64),
        batch_format="pandas")

    labels = connected_components(cores, core_core, max_rounds=16,
                                  metrics_prefix="dbscan").materialize()

    core_out = labels.map_batches(
        lambda b: pd.DataFrame({
            "osm_id": b["node"].to_numpy(np.int64),
            "role": np.full(len(b), "core", dtype=object),
            "cluster_id": b["label"].to_numpy(np.int64)}),
        batch_format="pandas")

    # border: min core-neighbor label per non-core point
    lab_b = bucketed_hash_join(
        border_cand, labels, "u", "node",
        left_schema={"u": i64, "v": i64},
        right_schema={"node": i64, "label": i64},
    )

    def bmin_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("v", as_index=False).agg(lab=("label", "min"))
        g["lab"] = g["lab"].astype(np.int64)
        return g

    def bmin_shard(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("v", as_index=False).agg(lab=("lab", "min"))
        return pd.DataFrame({
            "osm_id": s["v"].to_numpy(np.int64),
            "role": np.full(len(s), "border", dtype=object),
            "cluster_id": s["lab"].to_numpy(np.int64)})

    border_out = (lab_b.map_batches(bmin_partial, batch_format="pandas")
                  .map_batches(_shard_on(["v"]), batch_format="pandas")
                  .repartition(_blocks())
                  .groupby("_shard")
                  .map_groups(lambda g: bmin_shard(g.drop(columns=["_shard"])),
                              batch_format="pandas"))

    assigned = core_out.union(border_out).materialize()
    aid = assigned.map_batches(
        lambda b: pd.DataFrame({"aid": b["osm_id"].to_numpy(np.int64)}),
        batch_format="pandas")
    all_pts = rd.read_parquet(f"{world_dir}/osm_addresses.parquet",
                              columns=["osm_id"])
    tagged = bucketed_hash_join(
        all_pts, aid, "osm_id", "aid", how="left",
        left_schema={"osm_id": i64}, right_schema={"aid": i64},
    )
    noise_out = tagged.map_batches(
        lambda b: pd.DataFrame({
            "osm_id": b.loc[b["aid"].isna(), "osm_id"].to_numpy(np.int64),
            "role": np.full(int(b["aid"].isna().sum()), "noise", dtype=object),
            "cluster_id": np.full(int(b["aid"].isna().sum()), -1,
                                  dtype=np.int64)}),
        batch_format="pandas")

    return assigned.union(noise_out)


def street_bearing(world_dir: str) -> rd.Dataset:
    """Per-street AXIAL mean bearing — circular statistics on doubled
    angles (Mardia's axial-data convention): each segment's bearing from
    north θ = atan2(Δlon·cos(midlat), Δlat) is direction-ambiguous for a
    street, so the mean is taken over 2θ and halved → bearing ∈ [0°, 180°);
    the mean resultant length R ∈ [0, 1] measures alignment (1 = all
    segments parallel) — the street-grid-orientation analytic popularized
    by Boeing 2019 ("Urban spatial order: street network orientation").

    Output (osm_id, n_segments, bearing_deg round-6, resultant round-6);
    single-vertex streets are dropped (no segment → no direction).

    Scale shape: stateless zero-shuffle map_batches — one np.frombuffer
    WKB decode and two bincount reductions per batch (the street_length
    shape); geometry_oracle.street_bearing_sql replays the identical
    expression tree on the same bytes."""
    streets = rd.read_parquet(
        f"{world_dir}/osm_streets.parquet", columns=["osm_id", "linestring_wkb"]
    )

    def bearing(b: pd.DataFrame) -> pd.DataFrame:
        npts, pts = decode_linestrings(b["linestring_wkb"].tolist())
        lon, lat = pts[:, 0], pts[:, 1]
        n = len(b)
        nseg = np.maximum(npts - 1, 0)
        if len(pts) > 1:
            starts = np.concatenate(([0], np.cumsum(npts)[:-1]))
            th = np.arctan2(
                (lon[1:] - lon[:-1]) * np.cos((lat[:-1] + lat[1:]) / 2 * np.pi / 180),
                lat[1:] - lat[:-1],
            )
            valid = np.ones(len(pts) - 1, dtype=bool)
            valid[starts[1:] - 1] = False
            seg_street = np.repeat(np.arange(n, dtype=np.int64), nseg)
            s = np.bincount(seg_street, weights=np.sin(2 * th)[valid], minlength=n)
            c = np.bincount(seg_street, weights=np.cos(2 * th)[valid], minlength=n)
        else:
            s = np.zeros(n)
            c = np.zeros(n)
        keep = nseg > 0
        half = np.degrees(np.arctan2(s[keep], c[keep])) / 2
        half = np.where(half < 0, half + 180, half)
        r = np.sqrt(s[keep] ** 2 + c[keep] ** 2) / np.maximum(nseg[keep], 1)
        return pd.DataFrame({
            "osm_id": b["osm_id"].to_numpy(np.int64)[keep],
            "n_segments": nseg[keep].astype(np.int64),
            "bearing_deg": np.round(half, 6),
            "resultant": np.round(r, 6),
        })

    return streets.map_batches(bearing, batch_format="pandas")
