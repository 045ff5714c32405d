"""Spatial join + street assignment (stages 2-4 of the flagship pipeline).

Replaces the reference's per-municipality PostGIS round-trips
(``ST_Covers(muni, way)`` at TheoreticalHousenumbers.java:876-899 / 1195-1204,
street query at MunicipalityJobs.java:284-304, distance kernel
dbfunctions.sql:27-50) with one streaming actor-pool pass:

  cell encode (vectorized) → candidate polygons from the broadcast cell map →
  exact point-in-polygon → per-area street assignment
  (normalized-name match ≫ kNN top-1 by segment distance).

The :class:`WorldContext` is fetched from the object store ONCE per actor in
``__init__``. Candidates outside every boundary are dropped (the reference
skips municipalities without polygons, TheoreticalHousenumbers.java:850-855).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..geo.cells import latlng_to_cell
from .context import street_key_series


class SpatialStreetJoin:
    """map_batches actor: candidate rows → located/assigned rows.

    Adds: h3_cell, area_id, muni_id, addition_exactly, street_key (assigned
    street's normalized key), street_osm_id, matched_by_name.
    """

    def __init__(self, ctx_ref) -> None:
        import ray

        self.ctx = ray.get(ctx_ref)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return self._empty()
        lon = batch["lon"].to_numpy()
        lat = batch["lat"].to_numpy()
        batch = batch.assign(
            h3_cell=latlng_to_cell(lat, lon),
            area_id=self.ctx.boundary_index.locate(lon, lat),
        )
        batch = batch[batch["area_id"] >= 0]
        if len(batch) == 0:
            return self._empty()
        batch = batch.assign(
            muni_id=batch["area_id"].map(self.ctx.area_to_muni),
            street_key_raw=street_key_series(batch["street_raw"]),
        )
        batch["addition_exactly"] = batch["muni_id"].map(self.ctx.muni_exactly)
        # per-area street assignment (vectorized inside each area group)
        skey = np.empty(len(batch), dtype=object)
        sid = np.empty(len(batch), dtype=np.int64)
        byname = np.empty(len(batch), dtype=bool)
        pos = np.arange(len(batch))
        area_vals = batch["area_id"].to_numpy()
        for area in np.unique(area_vals):
            m = area_vals == area
            names, ids, hit = self.ctx.street_index.assign(
                int(area),
                batch["lon"].to_numpy()[m],
                batch["lat"].to_numpy()[m],
                batch["street_key_raw"].to_numpy()[m],
            )
            skey[pos[m]] = names
            sid[pos[m]] = ids
            byname[pos[m]] = hit
        batch = batch.assign(street_key=skey, street_osm_id=sid, matched_by_name=byname)
        # a municipality with ZERO valid streets can assign nothing — drop its
        # candidates, matching the reference's skip of street-less jobs
        # (MunicipalityJobs.java:284-304 finds no street rows → no inserts);
        # also keeps the engine aligned with the oracle, whose name/kNN joins
        # produce no row for such candidates
        batch = batch[batch["street_key"] != ""]
        return batch.drop(columns=["street_key_raw"])

    @staticmethod
    def _empty() -> pd.DataFrame:
        return pd.DataFrame(
            {
                "url": pd.Series([], dtype=str),
                "cand_seq": pd.Series([], dtype=np.int64),
                "street_raw": pd.Series([], dtype=str),
                "hnr_raw": pd.Series([], dtype=str),
                "plz": pd.Series([], dtype=str),
                "muni_raw": pd.Series([], dtype=str),
                "lat": pd.Series([], dtype=np.float64),
                "lon": pd.Series([], dtype=np.float64),
                "tags_text": pd.Series([], dtype=str),
                "h3_cell": pd.Series([], dtype=np.int64),
                "area_id": pd.Series([], dtype=np.int64),
                "muni_id": pd.Series([], dtype=np.int64),
                "addition_exactly": pd.Series([], dtype=bool),
                "street_key": pd.Series([], dtype=str),
                "street_osm_id": pd.Series([], dtype=np.int64),
                "matched_by_name": pd.Series([], dtype=bool),
            }
        )
