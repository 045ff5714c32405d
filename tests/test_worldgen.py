import hashlib
import os

import pyarrow.parquet as pq
import pytest

from housenumbercore_ray.sources.worldgen import WORLD_VERSION, ensure_world, generate_world


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("world") / "sf0.001")
    generate_world("sf0.001", out)
    return out


class TestWorldgen:
    def test_deterministic(self, world, tmp_path):
        out2 = str(tmp_path / "again")
        generate_world("sf0.001", out2)
        import glob as _glob

        for t in ["boundaries", "osm_streets", "list_addresses", "osm_addresses"]:
            h1 = hashlib.sha256(open(f"{world}/{t}.parquet", "rb").read()).hexdigest()
            h2 = hashlib.sha256(open(f"{out2}/{t}.parquet", "rb").read()).hexdigest()
            assert h1 == h2, f"{t} not byte-identical"
        for f1 in sorted(_glob.glob(f"{world}/pages/*.parquet")):
            f2 = f"{out2}/pages/{os.path.basename(f1)}"
            h1 = hashlib.sha256(open(f1, "rb").read()).hexdigest()
            h2 = hashlib.sha256(open(f2, "rb").read()).hexdigest()
            assert h1 == h2, f"{f1} not byte-identical"

    def test_pages_schema(self, world):
        s = pq.read_schema(next(iter(sorted(__import__("glob").glob(f"{world}/pages/*.parquet")))))
        assert s.names == ["url", "warc_ts", "html", "text", "lang"]
        assert str(s.field("html").type) == "binary"
        assert str(s.field("warc_ts").type) == "timestamp[us]"

    def test_text_matches_html(self, world):
        from housenumbercore_ray.stages.extract import extract_text

        t = pq.read_table(f"{world}/pages", columns=["html", "text"])
        for html, text in zip(t["html"].to_pylist()[:200], t["text"].to_pylist()[:200]):
            assert extract_text(html) == text  # byte-identical invariant

    def test_edge_forms_present(self, world):
        oa = pq.read_table(f"{world}/osm_addresses.parquet").to_pandas()
        hnrs = oa["addr_housenumber"]
        assert hnrs.str.contains(";").any()       # multi-value
        assert hnrs.str.fullmatch(r"\d+-\d+").any()   # expandable range
        assert hnrs.str.contains(r"\dd-", regex=True).any()  # non-expandable
        la = pq.read_table(f"{world}/list_addresses.parquet").to_pandas()
        # exact content duplicates (fresh addr_id) for the dedup operators
        assert la.duplicated(subset=[c for c in la.columns if c != "addr_id"]).any()
        assert la["addr_id"].is_unique

    def test_boundaries_are_bbox_equivalent(self, world):
        """Oracle precondition: PIP against the polygon == bbox test."""
        import numpy as np

        from housenumbercore_ray.geo.pip import points_in_rings
        from housenumbercore_ray.geo.wkb import wkb_rings

        b = pq.read_table(f"{world}/boundaries.parquet").to_pandas()
        rng = np.random.default_rng(1)
        for r in b.itertuples():
            lon = rng.uniform(r.minlon - 0.01, r.maxlon + 0.01, 500)
            lat = rng.uniform(r.minlat - 0.01, r.maxlat + 0.01, 500)
            inside_poly = points_in_rings(lon, lat, wkb_rings(r.polygon_wkb))
            inside_bbox = (lon >= r.minlon) & (lon <= r.maxlon) & (lat >= r.minlat) & (lat <= r.maxlat)
            assert (inside_poly == inside_bbox).all()

    def test_ensure_world_caches(self, tmp_path, monkeypatch):
        import housenumbercore_ray.sources.worldgen as wg

        monkeypatch.setattr(wg, "WORLD_ROOT", str(tmp_path / "cache"))
        d1 = ensure_world("/root/testdata/sf0.001")
        mtime = os.path.getmtime(f"{d1}/pages/part-00000.parquet")
        d2 = ensure_world("/root/testdata/sf0.001")
        assert d1 == d2
        assert os.path.getmtime(f"{d2}/pages/part-00000.parquet") == mtime


class TestCrossingStreets:
    """Contains-OR-crosses street membership (MunicipalityJobs.java:284-304):
    the planted 'Grenzweg' overshoots from muni i into muni i+1 and must be
    a member of BOTH, while every in-rect street keeps exactly one muni."""

    def test_grenzweg_planted_and_listed(self, world):
        s = pq.read_table(f"{world}/osm_streets.parquet").to_pandas()
        g = s[s["name"] == "Grenzweg"]
        assert len(g) == 1  # sf0.001: M=6 → only i=4 qualifies
        assert (g["lon1"] > g["lon0"]).all()
        la = pq.read_table(f"{world}/list_addresses.parquet").to_pandas()
        gl = la[la["street"] == "Grenzweg"]
        # official address planted in the NEIGHBOUR muni (i+1 = 5)
        assert list(gl["muni_ref"]) == [f"{3150000 + 5 * 4:08d}"]

    def test_polyline_multi_membership(self, world):
        from housenumbercore_ray.stages.context import WorldContext

        ctx = WorldContext(world)
        s = pq.read_table(f"{world}/osm_streets.parquet").to_pandas()
        ridx, areas = ctx.boundary_index.locate_polyline_multi(
            s["linestring_wkb"].to_numpy())
        import pandas as pd

        memb = pd.DataFrame({"row": ridx, "area": areas})
        per_row = memb.groupby("row").size()
        cross_rows = s.index[s["name"] == "Grenzweg"]
        for r in cross_rows:
            munis = sorted(ctx.area_to_muni[a]
                           for a in memb.loc[memb["row"] == r, "area"])
            home = int(s.loc[r, "muni_id"])
            assert munis == [home, home + 1]
        # all non-crossing streets stay single-membership
        normal = per_row.drop(index=[r for r in cross_rows if r in per_row.index])
        assert (normal == 1).all()

    def test_street_index_carries_both_areas(self, world):
        from housenumbercore_ray.stages.context import WorldContext, street_key_series

        ctx = WorldContext(world)
        import pandas as pd

        key = street_key_series(pd.Series(["Grenzweg"]))[0]
        areas_with_grenzweg = [
            a for a, entry in ctx.street_index.by_area.items()
            if key in entry["by_name"]
        ]
        assert len(areas_with_grenzweg) == 2
