"""World context: the broadcast small-side state for the flagship pipeline.

Built ONCE per world on the driver, shipped to actors via ``ray.put`` — the
north-rule "R-tree of admin/municipality polygons broadcast to actors"; never
re-shipped per batch. Contains:

  - :class:`~housenumbercore_ray.geo.index.BoundaryIndex` over all admin
    polygons (cell map + exact PIP) with per-area metadata payload;
  - :class:`~housenumbercore_ray.geo.index.StreetIndex` of valid named
    streets per area (highway-validity filter M13, blacklist filter M14
    applied at build);
  - the official-list key set (muni_id, street_key, hnr_norm) for the
    per-candidate Treffertyp lookup — the list side is the SMALL side at any
    scale (official registries are bounded), so it broadcasts instead of
    shuffling (SURVEY.md §2.4 J3).

At 100 TB the pages side streams; this context stays O(boundaries+streets+
list) — tens of MB per country — well within worker heap.
"""

from __future__ import annotations

import pandas as pd
import pyarrow.parquet as pq

from ..functions.street import _FOLD_TABLE
from ..geo.index import BoundaryIndex, StreetIndex

# OSMStreet.setDefaultValidHighwayTypes (OSMStreet.java:89-101)
VALID_HIGHWAYS = frozenset(
    {"primary", "secondary", "tertiary", "unclassified", "residential",
     "living_street", "pedestrian", "service", "track"}
)


def street_key_series(names: pd.Series) -> pd.Series:
    """Vectorized street match key: collation fold (M8) of the name —
    the engine's street-dictionary analog (functions.street.match_key)."""
    return names.fillna("").str.lower().str.translate(_FOLD_TABLE).str.strip()


def _within_buffered(sub_rings, parent_rings, buffer_deg: float) -> bool:
    """Is the sub polygon within the parent buffered by ``buffer_deg``
    (planar degrees, like PostGIS ST_Buffer on a 4326 geometry)? Vertex
    test: every exterior vertex inside the parent or within buffer distance
    of a parent edge — exact for convex parents, conservative otherwise."""
    import numpy as np

    from ..geo.pip import points_in_rings

    for ring, is_ext in sub_rings:
        if not is_ext:
            continue
        lon, lat = ring[:, 0], ring[:, 1]
        inside = points_in_rings(lon, lat, parent_rings)
        if inside.all():
            continue
        out_idx = np.flatnonzero(~inside)
        for pi in out_idx:
            d = min(
                _min_dist_deg(lon[pi], lat[pi], pring)
                for pring, _ in parent_rings
            )
            if d > buffer_deg:
                return False
    return True


def _min_dist_deg(px: float, py: float, ring) -> float:
    """Planar min distance (degrees) from a point to a ring's edges."""
    import numpy as np

    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    dx, dy = x1 - x0, y1 - y0
    L2 = dx * dx + dy * dy
    t = np.clip(((px - x0) * dx + (py - y0) * dy) / np.where(L2 > 0, L2, 1.0), 0.0, 1.0)
    cx, cy = x0 + t * dx, y0 + t * dy
    return float(np.sqrt(((px - cx) ** 2 + (py - cy) ** 2).min()))


class WorldContext:
    def __init__(self, world_dir: str):
        self.world_dir = world_dir
        ball = pq.read_table(f"{world_dir}/boundaries.parquet").to_pandas()
        # main municipality areas only; sub rows feed the subarea index (J7)
        b = ball[ball["sub_id"] == "-1"]
        self.boundary_index = BoundaryIndex(
            b["area_id"].to_numpy(), b["polygon_wkb"].tolist(),
            payload={
                int(r.area_id): {
                    "muni_id": int(r.muni_id),
                    "addition_exactly": bool(r.housenumberaddition_exactly),
                    "name": r.name,
                    "plz": r.plz,
                    "population": int(r.population),
                    "area_km2": float(r.area_km2),
                }
                for r in b.itertuples()
            },
        )
        self.area_to_muni = {int(r.area_id): int(r.muni_id) for r in b.itertuples()}
        self.muni_exactly = {int(r.muni_id): bool(r.housenumberaddition_exactly) for r in b.itertuples()}
        self.muni_ref_to_id = {r.official_ref: int(r.muni_id) for r in b.itertuples()}

        # subarea polygons (J7, MunicipalityArea.generateSuburbPolygons
        # :668-1004): admitted only if admin_level > parent's and the sub
        # polygon lies within the parent buffered by 0.03°
        # (ST_Within(way, ST_Buffer(muniPolygon, 0.03)), query :675-686)
        from ..geo.pip import points_in_rings
        from ..geo.wkb import wkb_rings

        self.subareas: dict[int, list] = {}
        parent_level = {int(r.muni_id): int(r.admin_level) for r in b.itertuples()}
        parent_rings = {int(r.muni_id): wkb_rings(r.polygon_wkb) for r in b.itertuples()}
        for r in ball[ball["sub_id"] != "-1"].itertuples():
            muni = int(r.muni_id)
            if int(r.admin_level) <= parent_level.get(muni, 99):
                continue
            rings = wkb_rings(r.polygon_wkb)
            if not _within_buffered(rings, parent_rings[muni], 0.03):
                continue
            self.subareas.setdefault(muni, []).append((r.sub_id, rings))

        # associatedStreet relation dictionary (ST2 analog: member→streetname
        # cache, TheoreticalHousenumbers.hol_strassenname_zur_id:184-289) —
        # broadcast once instead of per-row DB hits
        import os

        self.relations: dict[int, str] = {}
        rel_path = f"{world_dir}/osm_relations.parquet"
        if os.path.exists(rel_path):
            rt = pq.read_table(rel_path)
            self.relations = dict(zip(rt["rel_id"].to_pylist(), rt["name"].to_pylist()))

        s = pq.read_table(f"{world_dir}/osm_streets.parquet").to_pandas()
        # M13 valid-highway + named; M14 blacklist
        s = s[s["highway"].isin(VALID_HIGHWAYS) & ~s["blacklisted"] & (s["name"] != "")]
        # spatial assignment of streets to areas (J2), contains-OR-crosses:
        # the reference admits a street into every municipality it crosses
        # (MunicipalityJobs.java:284-304 ST_Contains(muni, way) OR
        # ST_Crosses(muni, way)), so one street row may fan out to several
        # areas; sampled-geometry locate via the boundary index
        s = s.reset_index(drop=True)
        ridx, areas = self.boundary_index.locate_polyline_multi(
            s["linestring_wkb"].to_numpy())
        s = s.iloc[ridx].assign(area_id=areas)
        keys = street_key_series(s["name"])
        self.street_index = StreetIndex(
            s["area_id"].tolist(), keys.tolist(), s["linestring_wkb"].tolist(), s["osm_id"].tolist()
        )

        # official list → normalized keys (exact dedup happens at key level)
        la = pq.read_table(
            f"{world_dir}/list_addresses.parquet",
            columns=["muni_ref", "street", "housenumber", "subarea", "postcode"],
        ).to_pandas()
        la["muni_id"] = la["muni_ref"].map(self.muni_ref_to_id)
        la = la.dropna(subset=["muni_id"])
        la["muni_id"] = la["muni_id"].astype(int)
        la["street_key"] = street_key_series(la["street"])
        from ..functions.housenumber import normalized_series, sortable_series

        exact = la["muni_id"].map(self.muni_exactly)
        la["hnr_sortable"] = sortable_series(la["housenumber"])
        la["hnr_norm"] = normalized_series(la["housenumber"], exact)
        # only the deduped key frame is broadcast (join_rows' membership
        # probe); the full list STREAMS from parquet in the evaluation
        # pipelines (stages.evaluate.ListSidePartials) — the context no
        # longer carries per-address columns
        self.list_keys = la[["muni_id", "street_key", "hnr_norm"]].drop_duplicates()


_CONTEXT_CACHE: dict[str, "WorldContext"] = {}
_REF_CACHE: dict[str, object] = {}


def get_context(world_dir: str) -> WorldContext:
    ctx = _CONTEXT_CACHE.get(world_dir)
    if ctx is None:
        ctx = WorldContext(world_dir)
        _CONTEXT_CACHE[world_dir] = ctx
    return ctx


def get_context_ref(world_dir: str):
    """Object-store handle for the context — ``ray.put`` once per world per
    process, read by actors in ``__init__``."""
    import ray

    ref = _REF_CACHE.get(world_dir)
    if ref is None:
        ref = ray.put(get_context(world_dir))
        _REF_CACHE[world_dir] = ref
    return ref
