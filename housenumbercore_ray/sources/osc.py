"""OsmChange (.osc) diff application — the osmosis replication step the
reference runs before every evaluation.

The reference's monthly workflow is: osmosis downloads replication diffs,
applies them to the mapnik DB, writes ``last.state.txt`` (whose timestamp
the engine now parses, ``functions/osmosis.py``), THEN
``TheoreticalHousenumbers`` evaluates against the updated tables. This
module supplies the diff-application step itself as an engine operator:
parse a real OsmChange XML document (``<create>`` / ``<modify>`` /
``<delete>`` sections of ``<node>`` elements with ``<tag>`` children) and
apply it to the previous month's address table.

Scale shape: a replication diff is the SMALL side (daily .osc files are
MBs against a planet of 10^9 objects) — the parsed change sets are
broadcast once via ``ray.put`` and the planet-side table STREAMS through
one ``map_batches`` that drops deleted ids and swaps modified rows, with
the created rows unioned in as their own small dataset. No shuffle.

Worldgen derivation (deterministic, so the oracle is independent): the
"previous month" node table is current nodes minus the ``osm_id % 9 == 4``
creations (the snapshot rule every other prev-month query uses), with
``osm_id % 9 == 7`` rows carrying an outdated housenumber (``<hnr>_alt``)
and one extra since-deleted node per municipality (id 980000+i). The
derived ``derived/changes.osc.xml`` contains exactly the create / modify /
delete entries that turn that previous table into the CURRENT one — so the
DuckDB oracle for ``hnr_osc_apply`` is simply the current node table, and
any parse or application bug shows up as a value mismatch.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np
import pandas as pd

#: columns managed by the OSC application (the reference's osmosis apply
#: covers full tag sets; the engine's osc universe is the address-relevant
#: projection of planet_point)
OSC_COLS = ["osm_id", "addr_street", "addr_place", "addr_housenumber", "lon", "lat"]

_TAGS = [("addr_street", "addr:street"), ("addr_place", "addr:place"),
         ("addr_housenumber", "addr:housenumber")]


def prev_nodes(world_dir: str) -> pd.DataFrame:
    """The previous month's node-address table, derived from the current
    parquet by the deterministic snapshot rule (see module docstring)."""
    import pyarrow.parquet as pq

    cur = pq.read_table(
        f"{world_dir}/osm_addresses.parquet",
        columns=OSC_COLS + ["osm_type"]).to_pandas()
    cur = cur[cur["osm_type"] == "node"][OSC_COLS].reset_index(drop=True)
    ids = cur["osm_id"].to_numpy(np.int64)
    prev = cur[ids % 9 != 4].copy()
    mod = prev["osm_id"].to_numpy(np.int64) % 9 == 7
    prev.loc[mod, "addr_housenumber"] = (
        prev.loc[mod, "addr_housenumber"].fillna("") + "_alt")
    # since-deleted nodes: one per municipality, mid-rect, derivable in SQL
    import pyarrow.parquet as pq2

    b = pq2.read_table(f"{world_dir}/boundaries.parquet",
                       columns=["muni_id", "sub_id", "minlon", "minlat",
                                "maxlon", "maxlat"]).to_pandas()
    b = b[b["sub_id"] == "-1"]
    deleted = pd.DataFrame({
        "osm_id": 980000 + b["muni_id"].to_numpy(np.int64),
        "addr_street": "Abrissgasse",
        "addr_place": None,
        "addr_housenumber": "77",
        "lon": ((b["minlon"] + b["maxlon"]) / 2).to_numpy(np.float64),
        "lat": ((b["minlat"] + b["maxlat"]) / 2).to_numpy(np.float64),
    })
    return pd.concat([prev, deleted], ignore_index=True)


def _node_xml(row) -> list[str]:
    out = [f"    <node id='{int(row.osm_id)}' lat='{row.lat!r}' lon='{row.lon!r}' version='2'>"]
    for col, key in _TAGS:
        val = getattr(row, col)
        if val is not None and val == val and val != "":
            out.append(f"      <tag k='{key}' v='{val}'/>")
    out.append("    </node>")
    return out


def ensure_osc_xml(world_dir: str) -> str:
    """Write (cached) ``derived/changes.osc.xml`` — the OsmChange document
    that transforms :func:`prev_nodes` into the current node table."""
    out = os.path.join(world_dir, "derived", "changes.osc.xml")
    if os.path.exists(out):
        return out
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(out), exist_ok=True)
    cur = pq.read_table(
        f"{world_dir}/osm_addresses.parquet",
        columns=OSC_COLS + ["osm_type"]).to_pandas()
    cur = cur[cur["osm_type"] == "node"][OSC_COLS]
    ids = cur["osm_id"].to_numpy(np.int64)
    creates = cur[ids % 9 == 4]
    modifies = cur[ids % 9 == 7]
    prev = prev_nodes(world_dir)
    deleted = prev[prev["osm_id"] >= 980000]

    lines = ["<?xml version='1.0' encoding='UTF-8'?>",
             "<osmChange version='0.6' generator='worldgen'>"]
    lines.append("  <create>")
    for r in creates.itertuples():
        lines.extend(_node_xml(r))
    lines.append("  </create>")
    lines.append("  <modify>")
    for r in modifies.itertuples():
        lines.extend(_node_xml(r))
    lines.append("  </modify>")
    lines.append("  <delete>")
    for r in deleted.itertuples():
        lines.append(f"    <node id='{int(r.osm_id)}' lat='{r.lat!r}' lon='{r.lon!r}' version='3'/>")
    lines.append("  </delete>")
    lines.append("</osmChange>")
    tmp = out + ".tmp"
    with open(tmp, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    os.replace(tmp, out)
    return out


def parse_osc(path: str) -> dict[str, pd.DataFrame]:
    """Parse an OsmChange document → {'create'|'modify'|'delete':
    DataFrame[OSC_COLS]} (delete rows carry only osm_id/lon/lat; tags of
    deleted objects are irrelevant, matching osmosis semantics). Sections
    may repeat and appear in any order; later entries for the same id in
    the same section win (osmosis applies documents in order)."""
    frames: dict[str, list[dict]] = {"create": [], "modify": [], "delete": []}
    root = ET.parse(path).getroot()
    if root.tag != "osmChange":
        raise ValueError(f"not an osmChange document: <{root.tag}>")
    for section in root:
        if section.tag not in frames:
            continue
        for node in section:
            if node.tag != "node":
                continue
            row = {
                "osm_id": np.int64(node.attrib["id"]),
                "addr_street": None, "addr_place": None, "addr_housenumber": None,
                "lon": float(node.attrib["lon"]),
                "lat": float(node.attrib["lat"]),
            }
            for tag in node.findall("tag"):
                for col, key in _TAGS:
                    if tag.attrib.get("k") == key:
                        row[col] = tag.attrib.get("v")
            frames[section.tag].append(row)
    out = {}
    for kind, rows in frames.items():
        df = pd.DataFrame(rows, columns=OSC_COLS)
        df["osm_id"] = df["osm_id"].astype(np.int64)
        out[kind] = df.drop_duplicates("osm_id", keep="last").reset_index(drop=True)
    return out
