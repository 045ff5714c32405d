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


class StreetIndex:
    """area_id → street polylines for name-match + kNN assignment.

    The reference resolves street ids per (job, name) via the ``strasse``
    dictionary and assigns by ``addr:street`` name (Workcache match key at
    Workcache.find_entry_in_cache:143-159); distance (dbfunctions.sql:27-50)
    breaks the tie when no name matches. Streets stored as parsed coordinate
    arrays; per-area dict is small and broadcast once.
    """

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
            dists = np.full((len(misses), len(entry["names"])), np.inf)
            for j, coords in enumerate(entry["coords"]):
                dists[:, j] = point_segment_distance_m(lon[misses], lat[misses], coords)
            best = dists.argmin(axis=1)
            for k, i in enumerate(misses):
                j = int(best[k])
                out_name[i] = entry["names"][j]
                out_id[i] = entry["osm_ids"][j]
        return out_name, out_id, by_name_hit
