"""Boundary-relation disambiguation (J6) and snapshot delta (K1).

J6 — ``pick_best_relation``: among candidate admin relations matched by name
variants / official key, the reference scans rows ordered by osm_id and keeps
(TheoreticalHousenumbers.polygon_holen:424-456; same logic in
MunicipalityArea.generateMunicipalityPolygon:268-456):

  1. the first usable relation;
  2. a later relation REPLACES it iff its original official key is LONGER
     (more precise);
  3. on equal key length, a later relation replaces iff its name EXACTLY
     equals the wanted municipality name (and part collection restarts);
  4. otherwise later relations are ignored.

All polygon parts of the winning relation union into one multipolygon
(ST_Union of parts, MunicipalityArea.java:517-538 → here: multipolygon
assembly of the WKB parts).

K1 — ``snapshot_diff``: the Workcache state machine
(dbloaded/new/changed/unchanged/deleted, Workcache.java:37-240, writeback
:243-608) converted a full recomputation into DB insert/update/delete deltas.
Ray-side the same contract is a deterministic diff of two snapshots keyed on
the evaluation key: rows only in new → ``insert``; only in old → ``delete``;
in both with differing payload → ``update``; else ``unchanged``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..geo.wkb import multipolygon_wkb, parse_wkb

__all__ = ["pick_best_relation", "union_parts", "snapshot_diff"]


def pick_best_relation(candidates: pd.DataFrame, wanted_name: str) -> tuple[str, pd.DataFrame]:
    """candidates: rows (relation_id, name, official_key_raw, part WKB …)
    ordered as scanned (the reference's ORDER BY osm_id). Returns
    (winning relation_id, that relation's part rows).

    ``official_key_raw`` is the key as tagged in OSM (spaces allowed); its
    space-stripped ORIGINAL length is the precision measure
    (TheoreticalHousenumbers.java:407-414)."""
    found_id = None
    found_len = -1
    for row in candidates.itertuples():
        key = (row.official_key_raw or "").replace(" ", "")
        klen = len(key) if len(key) <= 8 else 0   # over-long keys rejected (:419-424)
        if found_id is None:
            found_id, found_len = row.relation_id, klen
        elif row.relation_id != found_id:
            if klen > found_len:
                found_id, found_len = row.relation_id, klen
            elif klen == found_len and row.name == wanted_name:
                found_id, found_len = row.relation_id, klen
            # else: ignored
    if found_id is None:
        return "", candidates.iloc[:0]
    return found_id, candidates[candidates["relation_id"] == found_id]


def union_parts(part_wkbs) -> bytes:
    """Union the winning relation's polygon parts into one multipolygon WKB
    (non-overlapping admin parts → assembly, the ST_Union analog)."""
    polys = []
    for wkb in part_wkbs:
        kind, body = parse_wkb(wkb)
        if kind == "polygon":
            polys.append(tuple([body[0], body[1:]]) if len(body) > 1 else (body[0], []))
        elif kind == "multipolygon":
            for rings in body:
                polys.append((rings[0], rings[1:]))
        else:
            raise ValueError(f"not a polygon part: {kind}")
    return multipolygon_wkb(polys)


def snapshot_diff(old: pd.DataFrame, new: pd.DataFrame, key_cols: list[str],
                  payload_cols: list[str] | None = None) -> pd.DataFrame:
    """K1: classify every key into insert / update / delete / unchanged.

    Output: key columns + ``change`` column + payload columns taken from the
    side that survives (new for insert/update/unchanged, old for delete)."""
    if payload_cols is None:
        payload_cols = [c for c in new.columns if c not in key_cols]
    o = old[key_cols + payload_cols].copy()
    n = new[key_cols + payload_cols].copy()
    m = o.merge(n, on=key_cols, how="outer", suffixes=("_old", "_new"), indicator=True)
    both = m["_merge"] == "both"
    differs = pd.Series(False, index=m.index)
    for c in payload_cols:
        a, b = m[f"{c}_old"], m[f"{c}_new"]
        differs |= both & ~((a == b) | (a.isna() & b.isna()))
    change = np.where(m["_merge"] == "right_only", "insert",
                      np.where(m["_merge"] == "left_only", "delete",
                               np.where(differs, "update", "unchanged")))
    out = m[key_cols].copy()
    out["change"] = change
    for c in payload_cols:
        out[c] = m[f"{c}_new"].where(m["_merge"] != "left_only", m[f"{c}_old"])
    return out.reset_index(drop=True)
