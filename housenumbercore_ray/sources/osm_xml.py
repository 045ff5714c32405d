"""OSM XML reader (S3) and writers (K2 OSM-XML node dump, K3 TSV) — the
Osmosis-free re-implementation of util/OsmReader.java:24-469 and
util/Address.printosm:74-102 / printtxt:104-116.

Reader semantics reproduced:
  - nodes buffered by id; ways get ``centroid = MEAN of member node
    lon/lat`` — deliberately the arithmetic mean, not a true centroid
    (OsmReader.java:334-348);
  - relations: only ``associatedStreet`` and ``multipolygon`` accepted
    (:376-383); associatedStreet without a name ignored (:384-388);
    members with role ``street`` skipped (:395-398); the relation NAME is
    propagated to node/way members as a synthetic ``addr:street`` tag when
    processing associatedStreet relations (:400-426);
  - relation centroid = mean over nodes of non-``inner`` member ways
    (:405-421); relations kept only when they carry ``addr:housenumber``
    themselves (multipolygon-with-address case, :428-434);
  - output: one address row per object carrying ``addr:housenumber``.

An OSM XML file is not splittable; the Ray integration is one file per task
(``read_binary_files`` → parse per file inside ``map_batches``), so a
directory of extracts parallelizes per file.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pandas as pd
import pyarrow as pa

ADDRESS_SCHEMA = pa.schema([
    ("osm_id", pa.int64()),
    ("osm_type", pa.string()),
    ("lon", pa.float64()),
    ("lat", pa.float64()),
    ("addr_street", pa.string()),
    ("addr_place", pa.string()),
    ("addr_housenumber", pa.string()),
    ("addr_postcode", pa.string()),
    ("addr_city", pa.string()),
])


def parse_osm_xml(data: bytes) -> pa.Table:
    """One OSM XML document → address rows (objects with addr:housenumber)."""
    root = ET.fromstring(data)
    nodes: dict[int, dict] = {}
    ways: dict[int, dict] = {}
    rows: list[dict] = []

    def tagmap(el) -> dict[str, str]:
        return {t.get("k"): t.get("v") for t in el.findall("tag")}

    for el in root.findall("node"):
        nid = int(el.get("id"))
        nodes[nid] = {
            "lon": float(el.get("lon")), "lat": float(el.get("lat")), "tags": tagmap(el),
        }
    for el in root.findall("way"):
        wid = int(el.get("id"))
        refs = [int(nd.get("ref")) for nd in el.findall("nd")]
        member = [nodes[r] for r in refs if r in nodes]
        n = len(member)
        ways[wid] = {
            "refs": refs,
            "tags": tagmap(el),
            # arithmetic MEAN of member nodes (OsmReader.java:334-348)
            "lon": sum(m["lon"] for m in member) / n if n else None,
            "lat": sum(m["lat"] for m in member) / n if n else None,
        }
    relations: dict[int, dict] = {}
    for el in root.findall("relation"):
        rid = int(el.get("id"))
        tags = tagmap(el)
        rtype = tags.get("type", "")
        name = tags.get("name", "")
        if rtype not in ("associatedStreet", "multipolygon"):
            continue  # warned + skipped in the reference (:376-383)
        if rtype == "associatedStreet" and name == "":
            continue  # nameless associatedStreet ignored (:384-388)
        lon_sum = lat_sum = 0.0
        count = 0
        for mem in el.findall("member"):
            role = mem.get("role", "")
            if role == "street":
                continue  # role=street members ignored (:395-398)
            mtype, mid = mem.get("type"), int(mem.get("ref"))
            if rtype == "associatedStreet":
                # propagate relation name as synthetic addr:street (:400-426)
                if mtype == "node" and mid in nodes:
                    nodes[mid]["tags"].setdefault("addr:street", name)
                elif mtype == "way" and mid in ways:
                    ways[mid]["tags"].setdefault("addr:street", name)
            if mtype == "way" and mid in ways and role != "inner":
                for r in ways[mid]["refs"]:
                    if r in nodes:
                        lon_sum += nodes[r]["lon"]
                        lat_sum += nodes[r]["lat"]
                        count += 1
        if "addr:housenumber" in tags and count:
            relations[rid] = {
                "tags": tags, "lon": lon_sum / count, "lat": lat_sum / count,
            }

    def emit(osm_id: int, osm_type: str, obj: dict) -> None:
        t = obj["tags"]
        if "addr:housenumber" not in t:
            return
        rows.append({
            "osm_id": osm_id, "osm_type": osm_type,
            "lon": obj["lon"], "lat": obj["lat"],
            "addr_street": t.get("addr:street", ""),
            "addr_place": t.get("addr:place", ""),
            "addr_housenumber": t.get("addr:housenumber", ""),
            "addr_postcode": t.get("addr:postcode", ""),
            "addr_city": t.get("addr:city", ""),
        })

    for nid, obj in nodes.items():
        emit(nid, "node", obj)
    for wid, obj in ways.items():
        emit(wid, "way", obj)
    for rid, obj in relations.items():
        emit(rid, "relation", obj)
    if not rows:
        return pa.Table.from_pylist([], schema=ADDRESS_SCHEMA)
    return pa.Table.from_pylist(rows, schema=ADDRESS_SCHEMA)


def read_osm_xml(paths):
    """Ray source: one (unsplittable) OSM XML file per task."""
    import ray.data as rd

    ds = rd.read_binary_files(paths)

    def parse(batch: pa.Table) -> pa.Table:
        tables = [parse_osm_xml(b) for b in batch["bytes"].to_pylist()]
        return pa.concat_tables(tables) if tables else pa.Table.from_pylist([], schema=ADDRESS_SCHEMA)

    return ds.map_batches(parse, batch_format="pyarrow", batch_size=1)


# ---------------------------------------------------------------------------
# K2: OSM XML node writer — Address.printosm:74-102 format, including the
# reference's quirks: node ids counting down from -1, apostrophes replaced by
# &quot; (sic — the reference replaces ' with &quot;).

_TAG_ORDER = [("addr_street", "addr:street"), ("addr_place", "addr:place"),
              ("addr_housenumber", "addr:housenumber"), ("addr_postcode", "addr:postcode"),
              ("addr_city", "addr:city")]


def addresses_to_osm_xml(batch: pd.DataFrame, start_id: int = -1) -> str:
    out = []
    nodeid = start_id + 1
    for row in batch.itertuples():
        nodeid -= 1
        out.append(f"<node id = '{nodeid}' lat='{row.lat}' lon='{row.lon}'>")
        for col, key in _TAG_ORDER:
            val = getattr(row, col, "")
            if val:
                out.append(f"<tag k='{key}' v='{val.replace(chr(39), '&quot;')}' />")
        out.append("</node>")
    return "\n".join(out) + ("\n" if out else "")


# K3: TSV writer — Address.printtxt:104-116: street (or place fallback),
# housenumber, postcode, municipality, subarea, subarea id, EPSG, lon, lat.

def addresses_to_tsv(batch: pd.DataFrame) -> str:
    lines = []
    for row in batch.itertuples():
        street = getattr(row, "addr_street", "") or getattr(row, "addr_place", "")
        lines.append("\t".join([
            "-1", street, getattr(row, "addr_housenumber", ""),
            getattr(row, "addr_postcode", ""), getattr(row, "addr_city", ""),
            getattr(row, "subarea", ""), getattr(row, "subarea_id", ""),
            f"EPSG:{getattr(row, 'sourcesrid', '4326')}",
            str(row.lon), str(row.lat),
        ]))
    return "\n".join(lines) + ("\n" if lines else "")
