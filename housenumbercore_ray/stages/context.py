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


class WorldContext:
    def __init__(self, world_dir: str):
        self.world_dir = world_dir
        b = pq.read_table(f"{world_dir}/boundaries.parquet").to_pandas()
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
        # spatial assignment of streets to areas (J2): midpoint locate via the
        # boundary index — the reference's ST_Contains/ST_Crosses street query
        mid_area = self.boundary_index.locate(s["mid_lon"].to_numpy(), s["mid_lat"].to_numpy())
        s = s.assign(area_id=mid_area)
        s = s[s["area_id"] >= 0]
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
        self.list_keys = set(
            zip(la["muni_id"].tolist(), la["street_key"].tolist(), la["hnr_norm"].tolist())
        )
        self.list_df = la


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
