"""OSM XML reader/writers (S3/K2/K3), shapefile reader (S2), segment merge."""

import numpy as np
import pandas as pd
import pytest

from housenumbercore_ray.geo.merge import merge_segments
from housenumbercore_ray.sources.osm_xml import (
    addresses_to_osm_xml,
    addresses_to_tsv,
    parse_osm_xml,
)
from housenumbercore_ray.sources.shapefile import read_shapefile, write_shapefile

OSM_XML = b"""<?xml version='1.0' encoding='UTF-8'?>
<osm version="0.6">
  <node id="1" lat="50.0" lon="10.0"><tag k="addr:housenumber" v="1"/><tag k="addr:street" v="Hauptstrasse"/></node>
  <node id="2" lat="50.0" lon="10.2"/>
  <node id="3" lat="50.2" lon="10.2"/>
  <node id="4" lat="50.2" lon="10.0"/>
  <node id="5" lat="50.1" lon="10.1"><tag k="addr:housenumber" v="7"/></node>
  <way id="20"><nd ref="2"/><nd ref="3"/><nd ref="4"/>
    <tag k="addr:housenumber" v="3"/><tag k="addr:street" v="Gartenweg"/></way>
  <way id="21"><nd ref="2"/><nd ref="3"/></way>
  <relation id="30"><tag k="type" v="associatedStreet"/><tag k="name" v="Relationsweg"/>
    <member type="node" ref="5" role="house"/><member type="way" ref="21" role="street"/></relation>
  <relation id="31"><tag k="type" v="multipolygon"/><tag k="addr:housenumber" v="9"/>
    <tag k="addr:street" v="Ringstrasse"/>
    <member type="way" ref="21" role="outer"/></relation>
  <relation id="32"><tag k="type" v="associatedStreet"/>
    <member type="node" ref="5" role="house"/></relation>
  <relation id="33"><tag k="type" v="route"/><tag k="addr:housenumber" v="99"/></relation>
</osm>
"""


class TestOsmXmlReader:
    def test_parse(self):
        t = parse_osm_xml(OSM_XML).to_pandas().set_index("osm_id")
        # node with address
        assert t.loc[1, "addr_street"] == "Hauptstrasse"
        # way centroid = MEAN of member nodes (OsmReader.java:334-348)
        assert t.loc[20, "lon"] == pytest.approx((10.2 + 10.2 + 10.0) / 3)
        assert t.loc[20, "lat"] == pytest.approx((50.0 + 50.2 + 50.2) / 3)
        # associatedStreet name propagated to node member (:400-426)
        assert t.loc[5, "addr_street"] == "Relationsweg"
        # multipolygon relation with housenumber kept, centroid over outer ways
        assert t.loc[31, "addr_housenumber"] == "9"
        assert t.loc[31, "lon"] == pytest.approx((10.2 + 10.2) / 2)
        # nameless associatedStreet (32) and foreign type (33) ignored
        assert 32 not in t.index and 33 not in t.index

    def test_roles(self):
        # role=street member must NOT receive the relation name
        xml = OSM_XML.replace(b'ref="21" role="street"', b'ref="20" role="street"')
        t = parse_osm_xml(xml).to_pandas().set_index("osm_id")
        assert t.loc[20, "addr_street"] == "Gartenweg"  # kept its own tag

    def test_ray_source(self, ray_session, tmp_path):
        from housenumbercore_ray.sources.osm_xml import read_osm_xml

        p = tmp_path / "x.osm"
        p.write_bytes(OSM_XML)
        ds = read_osm_xml([str(p)])
        assert ds.count() == 4  # nodes 1,5 + way 20 + relation 31


class TestWriters:
    DF = pd.DataFrame({
        "lon": [10.5], "lat": [50.25], "addr_street": ["O'Brien-Weg"],
        "addr_place": [""], "addr_housenumber": ["4a"], "addr_postcode": ["86150"],
        "addr_city": ["Teststadt"],
    })

    def test_osm_xml_writer(self):
        out = addresses_to_osm_xml(self.DF)
        assert "<node id = '-1' lat='50.25' lon='10.5'>" in out
        # the reference's quirk: apostrophe replaced by &quot; (printosm:79)
        assert "v='O&quot;Brien-Weg'" in out
        assert "<tag k='addr:housenumber' v='4a' />" in out
        assert "addr:place" not in out  # empty fields omitted

    def test_tsv_writer(self):
        out = addresses_to_tsv(self.DF.assign(sourcesrid="4326"))
        cells = out.strip().split("\t")
        assert cells[0] == "-1" and cells[1] == "O'Brien-Weg" and cells[2] == "4a"
        assert "EPSG:4326" in cells

    def test_tsv_place_fallback(self):
        df = self.DF.assign(addr_street="", addr_place="Dorfplatz")
        out = addresses_to_tsv(df)
        assert out.split("\t")[1] == "Dorfplatz"


class TestShapefile:
    def test_roundtrip(self, tmp_path):
        base = str(tmp_path / "points")
        attrs = pd.DataFrame({
            "strasse": ["Hauptstraße", "Gartenweg"],
            "hnr": ["4a", "12"],
            "plz": ["86150", "86152"],
        })
        write_shapefile(base, [10.5, 10.6], [50.2, 50.3], attrs)
        t = read_shapefile(base, field_mapping={"strasse": "street"}).to_pandas()
        assert t["street"].tolist() == ["Hauptstraße", "Gartenweg"]
        assert t["hnr"].tolist() == ["4a", "12"]
        assert t["lon"].tolist() == [10.5, 10.6]
        assert t["lat"].tolist() == [50.2, 50.3]

    def test_bad_file_rejected(self, tmp_path):
        p = tmp_path / "junk.shp"
        p.write_bytes(b"\x00" * 200)
        from housenumbercore_ray.sources.shapefile import read_shp_points

        with pytest.raises(ValueError):
            read_shp_points(str(p))


class TestSegmentMerge:
    def test_reference_case(self):
        # OSMStreetTest.java:104-127: two segments → LINESTRING(10 40,10.1 40.1,10 40.2)
        m = merge_segments([[(10, 40), (10.1, 40.1)], [(10.1, 40.1), (10, 40.2)]])
        assert len(m) == 1
        assert m[0].tolist() == [[10.0, 40.0], [10.1, 40.1], [10.0, 40.2]]

    def test_orientation_invariance(self):
        m = merge_segments([[(10.1, 40.1), (10, 40)], [(10.1, 40.1), (10, 40.2)]])
        assert len(m) == 1 and len(m[0]) == 3

    def test_branch_splits(self):
        m = merge_segments([[(0, 0), (1, 1)], [(1, 1), (2, 2)], [(1, 1), (1, 2)]])
        assert len(m) == 3

    def test_cycle_and_chain(self):
        m = merge_segments([[(0, 0), (1, 0)], [(1, 0), (1, 1)], [(1, 1), (0, 0)]])
        assert len(m) == 1 and np.array_equal(m[0][0], m[0][-1])
        m2 = merge_segments([[(i, 0), (i + 1, 0)] for i in range(6)])
        assert len(m2) == 1 and len(m2[0]) == 7


class TestJsonlImport:
    def test_roundtrip_md5(self, ray_session):
        import duckdb

        from housenumbercore_ray.pipelines.import_list import jsonl_import
        from housenumbercore_ray.sources.worldgen import ensure_world_scale

        wd = ensure_world_scale("sf0.001")
        out = jsonl_import(wd).to_pandas().sort_values("url").reset_index(drop=True)
        assert len(out) == 2000
        ora = duckdb.sql(f"""
            SELECT url, md5(text) AS text_md5
            FROM read_json_auto('{wd}/derived/pages_sample.jsonl',
                                format='newline_delimited')
        """).df().sort_values("url").reset_index(drop=True)
        assert (out["text_md5"] == ora["text_md5"]).all()
