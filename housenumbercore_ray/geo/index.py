"""Broadcastable spatial indexes.

The reference keeps ONE boundary polygon in memory per sequential job and
ships it into every SQL query (TheoreticalHousenumbers.java:846-869,
MunicipalityJobs.java:269-300). Here ALL admin polygons are packed into one
:class:`BoundaryIndex` — cell-id → candidate polygon ids plus parsed rings —
built once on the driver, put into the object store with ``ray.put``, and
read by every spatial-join actor in ``__init__`` (the north-rule "R-tree of
admin/municipality polygons broadcast to actors"). Lookups are:
bbox reject → exact even-odd point-in-polygon, vectorized per candidate
polygon over the whole batch slice that landed in its cells.

:class:`StreetIndex` plays the same role for street polylines, keyed by
``area_id`` for the kNN street-assignment stage.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from .cells import CELL_RES_DEG, latlng_to_cell, polygon_cover
from .pip import point_segment_distance_m, points_in_rings
from .wkb import parse_wkb, wkb_bbox, wkb_rings


class BoundaryIndex:
    """cell id → candidate boundary rows; exact PIP per candidate."""

    def __init__(self, area_ids, polygon_wkbs, res_deg: float = CELL_RES_DEG, payload=None):
        self.res_deg = res_deg
        self.area_ids = np.asarray(area_ids, dtype=np.int64)
        self.payload = payload  # optional dict area_id -> arbitrary metadata
        self.rings = []
        self.bboxes = np.empty((len(self.area_ids), 4), dtype=np.float64)
        cell_map: dict[int, list[int]] = defaultdict(list)
        for i, wkb in enumerate(polygon_wkbs):
            self.rings.append(wkb_rings(wkb))
            self.bboxes[i] = wkb_bbox(wkb)
            for c in polygon_cover(wkb, res_deg=res_deg):
                cell_map[int(c)].append(i)
        self.cell_map = {c: np.asarray(v, dtype=np.int64) for c, v in cell_map.items()}

    def cover_cells(self) -> np.ndarray:
        return np.fromiter(self.cell_map.keys(), dtype=np.int64)

    def locate(self, lon, lat):
        """Vectorized: for each point return the matching area_id or -1.

        Uses the grid cell as the candidate filter (the 'join on cell'), then
        bbox reject, then exact even-odd PIP. Non-overlapping polygons
        assumed (admin boundaries); first (lowest area_id index) match wins
        deterministically.
        """
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        n = len(lon)
        out = np.full(n, -1, dtype=np.int64)
        if n == 0:
            return out
        cells = latlng_to_cell(lat, lon, self.res_deg)
        order = np.argsort(cells, kind="stable")
        sorted_cells = cells[order]
        # iterate distinct cells present in the batch (few per batch at scale)
        starts = np.flatnonzero(np.r_[True, sorted_cells[1:] != sorted_cells[:-1]])
        bounds = np.r_[starts, n]
        for k, s in enumerate(starts):
            e = bounds[k + 1]
            cand = self.cell_map.get(int(sorted_cells[s]))
            if cand is None:
                continue
            idx = order[s:e]
            plon, plat = lon[idx], lat[idx]
            unresolved = np.ones(len(idx), dtype=bool)
            for ci in cand:
                if not unresolved.any():
                    break
                bb = self.bboxes[ci]
                m = unresolved & (plon >= bb[0]) & (plon <= bb[2]) & (plat >= bb[1]) & (plat <= bb[3])
                if not m.any():
                    continue
                sub = np.flatnonzero(m)
                inside = points_in_rings(plon[sub], plat[sub], self.rings[ci])
                hit = sub[inside]
                out[idx[hit]] = self.area_ids[ci]
                unresolved[hit] = False
        return out

    def locate_polyline_multi(self, linestring_wkbs, max_step: float | None = None):
        """Contains-or-crosses membership (J2): each polyline joins EVERY
        area that any of its sampled points falls in — the reference admits
        a street into a municipality's job when ``ST_Contains(muni, way) OR
        ST_Crosses(muni, way)`` (MunicipalityJobs.java:284-304), i.e. a
        boundary-crossing street belongs to *all* municipalities it crosses,
        and the planet_line extraction uses the same covers-or-crosses rule
        (TheoreticalHousenumbers.java:1056-1071).

        Sampling, not exact intersection: vertices plus per-segment
        subdivision to steps ≤ ``max_step`` (default: the index cell size),
        so any excursion longer than one cell into a polygon is detected;
        slivers narrower than the step are the documented resolution limit
        of this engine (the reference has exact PostGIS predicates).

        Returns ``(row_idx, area_id)`` int64 arrays — unique (polyline,
        area) memberships, area −1 rows dropped.  Cost: one vectorized
        ``locate`` over all sampled points; intended for the bounded street
        metadata side (runs once at context build), not per page batch.
        """
        step = max_step if max_step is not None else self.res_deg
        pts, owner = [], []
        for i, wkb in enumerate(linestring_wkbs):
            kind, coords = parse_wkb(wkb)
            if kind != "linestring":
                raise ValueError(f"expected linestring WKB, got {kind}")
            seg = coords[1:] - coords[:-1]
            # per-segment subdivision counts; each segment contributes its
            # start point + interior samples, final vertex appended once
            nsub = np.maximum(1, np.ceil(
                np.abs(seg).max(axis=1) / step).astype(np.int64))
            parts = [coords[-1:]]
            for s0 in range(len(seg)):
                t = np.arange(nsub[s0], dtype=np.float64)[:, None] / nsub[s0]
                parts.append(coords[s0] + t * seg[s0])
            sampled = np.vstack(parts)
            pts.append(sampled)
            owner.append(np.full(len(sampled), i, dtype=np.int64))
        if not pts:
            return (np.empty(0, dtype=np.int64),) * 2
        allpts = np.vstack(pts)
        own = np.concatenate(owner)
        areas = self.locate(allpts[:, 0], allpts[:, 1])
        keep = areas >= 0
        pairs = np.unique(np.stack([own[keep], areas[keep]], axis=1), axis=0)
        return pairs[:, 0], pairs[:, 1]


class StreetIndex:
    """area_id → street polylines for name-match + kNN assignment.

    The reference resolves street ids per (job, name) via the ``strasse``
    dictionary and assigns by ``addr:street`` name (Workcache match key at
    Workcache.find_entry_in_cache:143-159); distance (dbfunctions.sql:27-50)
    breaks the tie when no name matches. Streets stored as parsed coordinate
    arrays; per-area dict is small and broadcast once.
    """

    #: kNN cell-bucket resolution (degrees). Finer than the boundary-join
    #: cells: a municipality spans a few dozen kNN cells so ring probing
    #: touches O(streets-in-2-rows), not O(all area streets).
    KNN_RES_DEG = 0.01
    #: areas with at most this many streets skip the bucket machinery —
    #: a single vectorized distance matrix is cheaper than ring bookkeeping.
    BRUTE_FORCE_MAX = 6

    def __init__(self, area_ids, names_norm, linestring_wkbs, osm_ids=None):
        self.by_area: dict[int, dict] = {}
        osm_ids = osm_ids if osm_ids is not None else [-1] * len(area_ids)
        for aid, name, wkb, oid in zip(area_ids, names_norm, linestring_wkbs, osm_ids):
            kind, coords = parse_wkb(wkb)
            entry = self.by_area.setdefault(int(aid), {"names": [], "coords": [], "osm_ids": [], "by_name": {}})
            idx = len(entry["names"])
            entry["names"].append(name)
            entry["coords"].append(np.asarray(coords, dtype=np.float64))
            entry["osm_ids"].append(int(oid))
            entry["by_name"].setdefault(name, idx)  # first street with the name wins
        for entry in self.by_area.values():
            self._build_cells(entry)

    def _build_cells(self, entry) -> None:
        """Per-area street-cell map: cell (ix, iy) → sorted street indices
        whose segments' bboxes intersect the cell. Built once (broadcast
        state); probing is ring expansion with an exact stop bound."""
        res = self.KNN_RES_DEG
        cell_streets: dict[tuple[int, int], list[int]] = {}
        max_abs_lat = 0.0
        for j, coords in enumerate(entry["coords"]):
            if len(coords) == 0:
                continue
            max_abs_lat = max(max_abs_lat, float(np.abs(coords[:, 1]).max()))
            cells = set()
            if len(coords) == 1:  # point-degenerate geometry: its own cell
                cells.add((int(np.floor(coords[0, 0] / res)), int(np.floor(coords[0, 1] / res))))
            for s in range(len(coords) - 1):
                x0, x1 = sorted((coords[s, 0], coords[s + 1, 0]))
                y0, y1 = sorted((coords[s, 1], coords[s + 1, 1]))
                for ix in range(int(np.floor(x0 / res)), int(np.floor(x1 / res)) + 1):
                    for iy in range(int(np.floor(y0 / res)), int(np.floor(y1 / res)) + 1):
                        cells.add((ix, iy))
            for c in cells:
                cell_streets.setdefault(c, []).append(j)
        entry["cell_streets"] = {c: np.asarray(v, dtype=np.int64) for c, v in cell_streets.items()}
        # streets' max |lat| — kept for diagnostics; the probe-time ring
        # bound is computed from the QUERY group's latitudes (the distance
        # kernel scales Δlon by cos(query lat), so that is the exact factor)
        entry["max_abs_lat"] = max_abs_lat
        if entry["cell_streets"]:
            ixs = [c[0] for c in entry["cell_streets"]]
            iys = [c[1] for c in entry["cell_streets"]]
            entry["cell_bbox"] = (min(ixs), min(iys), max(ixs), max(iys))
            entry["cell_span"] = max(max(ixs) - min(ixs), max(iys) - min(iys)) + 2
        else:
            entry["cell_bbox"] = (0, 0, 0, 0)
            entry["cell_span"] = 0

    def assign(self, area_id: int, lon, lat, street_names_norm):
        """For points already located in ``area_id``: return (assigned street
        name array, assigned osm_id array, matched-by-name bool array).

        Tier 1: exact normalized-name match within the area.
        Tier 2: nearest street polyline by equirect distance (kNN top-1).
        """
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        n = len(lon)
        out_name = np.array([""] * n, dtype=object)
        out_id = np.full(n, -1, dtype=np.int64)
        by_name_hit = np.zeros(n, dtype=bool)
        entry = self.by_area.get(int(area_id))
        if entry is None or n == 0:
            return out_name, out_id, by_name_hit
        for i, cand in enumerate(street_names_norm):
            j = entry["by_name"].get(cand)
            if j is not None:
                out_name[i] = entry["names"][j]
                out_id[i] = entry["osm_ids"][j]
                by_name_hit[i] = True
        misses = np.flatnonzero(~by_name_hit)
        if len(misses):
            best = self._knn_top1(entry, lon[misses], lat[misses])
            for k, i in enumerate(misses):
                j = int(best[k])
                out_name[i] = entry["names"][j]
                out_id[i] = entry["osm_ids"][j]
        return out_name, out_id, by_name_hit

    def _knn_top1(self, entry, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        """Nearest street index per point — EXACT, via cell-ring expansion:
        points grouped by their kNN cell; candidate streets pulled ring by
        ring; expansion stops once every point's best distance is STRICTLY
        within the proven lower bound of all unseen rings ((k−1)·res_m,
        res_m from the group's own max |lat| — the exact cos factor the
        distance kernel applies to Δlon). Ties break to the LOWEST street
        index across rings (identical to the dense argmin)."""
        from .pip import EARTH_R

        n_streets = len(entry["names"])
        if n_streets <= self.BRUTE_FORCE_MAX or not entry["cell_streets"]:
            dists = np.full((len(lon), n_streets), np.inf)
            for j, coords in enumerate(entry["coords"]):
                dists[:, j] = point_segment_distance_m(lon, lat, coords)
            return dists.argmin(axis=1)
        res = self.KNN_RES_DEG
        cs = entry["cell_streets"]
        bx0, by0, bx1, by1 = entry["cell_bbox"]
        out = np.zeros(len(lon), dtype=np.int64)
        ix_all = np.floor(lon / res).astype(np.int64)
        iy_all = np.floor(lat / res).astype(np.int64)
        cell_key = ix_all * np.int64(1 << 32) + iy_all
        order = np.argsort(cell_key, kind="stable")
        starts = np.flatnonzero(np.r_[True, cell_key[order][1:] != cell_key[order][:-1]])
        bounds = np.r_[starts, len(order)]
        for s, e in zip(starts, bounds[1:]):
            idx = order[s:e]
            ix, iy = int(ix_all[idx[0]]), int(iy_all[idx[0]])
            plon, plat = lon[idx], lat[idx]
            # one cell step in meters, conservative for THIS group: Δlat
            # cells span res·R rad·m; Δlon cells span res·R·cos(query lat)
            res_m = (np.deg2rad(res) * EARTH_R
                     * max(float(np.cos(np.deg2rad(np.abs(plat).max()))), 1e-6))
            d_best = np.full(len(idx), np.inf)
            j_best = np.zeros(len(idx), dtype=np.int64)
            # rings needed to reach the farthest street cell from this group
            max_k = max(bx0 - ix, ix - bx1, 0) + max(by0 - iy, iy - by1, 0) \
                + entry["cell_span"] + 2
            seen: set[int] = set()
            k = 0
            while k <= max_k:
                ring = []
                if k == 0:
                    ring = [(ix, iy)]
                else:
                    for dx in range(-k, k + 1):
                        ring.append((ix + dx, iy - k))
                        ring.append((ix + dx, iy + k))
                    for dy in range(-k + 1, k):
                        ring.append((ix - k, iy + dy))
                        ring.append((ix + k, iy + dy))
                new: set[int] = set()
                for c in ring:
                    arr = cs.get(c)
                    if arr is not None:
                        new.update(int(v) for v in arr)
                new -= seen
                # accept strictly closer, or equal-distance with a LOWER
                # index — exact dense-argmin tie semantics even when the
                # tying street is first seen in a later ring
                for j in sorted(new):
                    d = point_segment_distance_m(plon, plat, entry["coords"][j])
                    better = (d < d_best) | ((d == d_best) & (j < j_best))
                    d_best[better] = d[better]
                    j_best[better] = j
                seen |= new
                k += 1
                # STRICT <: an unseen ring-k street is ≥ (k−1)·res_m away,
                # so at equality it could still tie with a lower index
                if seen and d_best.max() < (k - 1) * res_m:
                    break
            out[idx] = j_best
        return out
