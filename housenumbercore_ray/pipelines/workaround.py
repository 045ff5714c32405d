"""associatedStreet write-back workaround — batch-fix surface.

Ray analog of the reference's standalone repair job
(``OSMRelationAssociatedStreetWorkaround.java:69-200``): OSM objects that
carry an address but NO ``addr:street`` tag, while being members of an
``associatedStreet`` relation, get the relation's name written into their
tags (plus a marker tag recording the provenance).

The reference MUTATES the osm2pgsql tables in place (``UPDATE planet_point
SET tags = tags || hstore('addr:street', ?) || hstore(?, 'yes')``,
:164-181). Input mutation is an anti-goal for a streaming engine, so the
Ray surface emits the corrected rows as a NEW table — one row per fixed
object with the resolved street and the post-fix tag text — which a caller
can sink wherever the deployment keeps its corrected snapshot. Evaluation
pipelines here never need the fix (relation names are propagated at read,
pipelines/theoretical.py), but the standalone batch surface has first-class
parity this way.

Known reference limitation mirrored deliberately: nested sub-relations
(``OSMRelationAssociatedStreetWorkaround.java:3-5`` marks them OFFEN/open)
are not recursed into — only direct members with a resolvable relation id
are fixed.

Scale shape: the relations table is small by premise (one row per
associatedStreet relation), so it is broadcast once via ``ray.put`` and
resolved inside ``map_batches``; the addresses table streams with column
pruning and a vectorized mask — zero shuffles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

#: marker appended to fixed rows — the reference's
#: ``___temp___addressstreetfromassociatedrel`` tag, without the dunder
#: prefix (tags_text here is ``k=v;k=v``, not hstore).
MARKER_TAG = "addressstreetfromassociatedrel=yes"


class _AssocFix:
    """Actor-pool stage: broadcast relation dict in __init__, vectorized
    member fix per batch."""

    def __init__(self, relations_ref) -> None:
        self.relations: dict[int, str] = ray.get(relations_ref)

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        rel = b["assoc_rel_id"]
        fixable = b["addr_street"].isna() & rel.notna()
        g = b[fixable]
        if len(g) == 0:
            return pd.DataFrame({
                "osm_id": pd.Series([], dtype=np.int64),
                "osm_type": pd.Series([], dtype=str),
                "rel_id": pd.Series([], dtype=np.int64),
                "street_fixed": pd.Series([], dtype=str),
                "tags_fixed": pd.Series([], dtype=str),
            })
        rel_ids = g["assoc_rel_id"].astype(np.int64)
        names = rel_ids.map(self.relations)
        g = g[names.notna()]
        rel_ids = rel_ids[names.notna()]
        names = names[names.notna()]
        tags = g["tags_text"].fillna("")
        suffix = "addr:street=" + names + ";" + MARKER_TAG
        fixed = np.where(tags == "", suffix, tags + ";" + suffix)
        return pd.DataFrame({
            "osm_id": g["osm_id"].to_numpy(np.int64),
            "osm_type": g["osm_type"].to_numpy(),
            "rel_id": rel_ids.to_numpy(np.int64),
            "street_fixed": names.to_numpy(),
            "tags_fixed": fixed,
        })


def assoc_street_fix(world_dir: str) -> rd.Dataset:
    """Corrected-rows table for addresses fixable via associatedStreet:
    (osm_id, osm_type, rel_id, street_fixed, tags_fixed)."""
    import pyarrow.parquet as pq

    rt = pq.read_table(f"{world_dir}/osm_relations.parquet")
    relations = dict(zip(rt["rel_id"].to_pylist(), rt["name"].to_pylist()))
    ref = ray.put(relations)

    addrs = rd.read_parquet(
        f"{world_dir}/osm_addresses.parquet",
        columns=["osm_id", "osm_type", "addr_street", "assoc_rel_id", "tags_text"],
    )
    return addrs.map_batches(_AssocFix, fn_constructor_args=(ref,),
                             batch_format="pandas", concurrency=(1, 8))


def assoc_street_fix_sql(world_dir: str) -> str:
    """Independent SQL recomputation: the relation join + tag concat."""
    return f"""
SELECT CAST(a.osm_id AS BIGINT) AS osm_id, a.osm_type,
       CAST(a.assoc_rel_id AS BIGINT) AS rel_id,
       r.name AS street_fixed,
       CASE WHEN coalesce(a.tags_text, '') = ''
            THEN 'addr:street=' || r.name || ';{MARKER_TAG}'
            ELSE a.tags_text || ';addr:street=' || r.name || ';{MARKER_TAG}'
       END AS tags_fixed
FROM read_parquet('{world_dir}/osm_addresses.parquet') a
JOIN read_parquet('{world_dir}/osm_relations.parquet') r
  ON r.rel_id = CAST(a.assoc_rel_id AS BIGINT)
WHERE a.addr_street IS NULL AND a.assoc_rel_id IS NOT NULL
"""
