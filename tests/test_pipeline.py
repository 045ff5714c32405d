"""End-to-end flagship pipeline vs the independent DuckDB oracle (sf0.001)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from housenumbercore_ray.sources.worldgen import ensure_world


@pytest.fixture(scope="module")
def world(ray_session):
    return ensure_world("/root/testdata/sf0.001")


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(9)
        elif df[c].dtype == bool:
            df[c] = df[c].astype(np.int64)
        elif str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", [
    "hnr_extract_candidates", "hnr_join_rows", "hnr_evaluation",
    "hnr_muni_summary", "hnr_muni_coverage", "hnr_street_summary", "hnr_streets_missing_in_osm",
    "hnr_subarea_rows", "hnr_csv_import", "hnr_evaluation_delta", "hnr_way_memberships",
    "hnr_shape_import", "hnr_osm_import", "hnr_gml_import",
])
def test_query_matches_oracle(world, name):
    from housenumbercore_ray.pipelines import evaluation as ev
    from housenumbercore_ray.pipelines import import_list
    from housenumbercore_ray.pipelines.oracle import queries_sql

    import_list.ensure_list_csv(world)
    ray_fn = {
        "hnr_extract_candidates": ev.candidates,
        "hnr_join_rows": ev.join_rows,
        "hnr_evaluation": ev.evaluation,
        "hnr_muni_summary": ev.muni_summary,
        "hnr_muni_coverage": ev.muni_coverage,
        "hnr_street_summary": ev.street_summary,
        "hnr_streets_missing_in_osm": ev.streets_missing_in_osm,
        "hnr_subarea_rows": ev.subarea_rows,
        "hnr_way_memberships": ev.way_memberships,
        "hnr_csv_import": import_list.csv_import,
        "hnr_evaluation_delta": ev.evaluation_delta,
        "hnr_shape_import": import_list.shape_import,
        "hnr_osm_import": import_list.osm_import,
        "hnr_gml_import": import_list.gml_import,
    }[name]
    res = ray_fn(world)
    got = _normalize(res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res))
    want = _normalize(duckdb.sql(queries_sql(world)[name]).df())
    assert got.shape == want.shape
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_extracted_text_byte_identical(world):
    """Per-row invariant (north rule): extracted text == pages.text per url."""
    import pyarrow.parquet as pq

    from housenumbercore_ray.pipelines import evaluation as ev

    got = ev.extracted_text(world).to_pandas().set_index("url")["extracted_text"]
    want = pq.read_table(f"{world}/pages", columns=["url", "text"]).to_pandas()
    want = want.set_index("url")["text"]
    assert len(got) == len(want)
    joined = pd.DataFrame({"got": got, "want": want})
    assert (joined["got"] == joined["want"]).all()


def test_evaluation_covers_all_treffertypen(world):
    from housenumbercore_ray.pipelines import evaluation as ev

    e = ev.evaluation(world).to_pandas()
    assert set(e["treffertyp"].unique()) == {"i", "l", "o"}
    # LIST_ONLY rows must have cleared OSM fields (Workcache_Entry.update:247-260)
    lonly = e[e["treffertyp"] == "l"]
    assert (lonly["osm_tag"] == "").all()
    assert (lonly["tag_prio"] == 9999).all()
    assert (lonly["n_osm_obs"] == 0).all()


def test_out_of_world_candidates_dropped(world):
    from housenumbercore_ray.pipelines import evaluation as ev

    cand = ev.candidates(world).to_pandas()
    assert (cand["muni_raw"] == "Phantomstadt").any()  # present in extraction
    jr = ev.join_rows(world).to_pandas()
    assert (jr["area_id"] >= 0).all()  # but dropped by the spatial join


def test_crossing_address_way_in_both_munis(world):
    """planet_line covers-or-crosses (TheoreticalHousenumbers.java:1056-1071):
    the planted 'Grenzweg' address way overshoots its home municipality, so
    its LINE membership spans two munis while its centroid sits in one."""
    import pyarrow.parquet as pq

    from housenumbercore_ray.pipelines import evaluation as ev
    from housenumbercore_ray.stages.context import get_context

    m = ev.way_memberships(world).to_pandas()
    aw = pq.read_table(f"{world}/osm_address_ways.parquet").to_pandas()
    crossing = aw[aw["addr_street"] == "Grenzweg"]
    assert len(crossing) > 0, "worldgen planted no crossing address way"
    for _, w in crossing.iterrows():
        munis = sorted(m.loc[m["osm_id"] == w["osm_id"], "muni_id"])
        assert len(munis) == 2, f"crossing way {w['osm_id']} in munis {munis}"
        # centroid-locate sees only ONE of them — the divergence this
        # operator exists to fix
        ctx = get_context(world)
        area = ctx.boundary_index.locate(
            np.asarray([w["lon"]]), np.asarray([w["lat"]]))[0]
        assert ctx.area_to_muni[area] in munis
    # non-crossing ways: exactly one membership each
    inside = aw[aw["addr_street"] != "Grenzweg"]
    counts = m[m["osm_id"].isin(inside["osm_id"])].groupby("osm_id").size()
    assert (counts == 1).all()


def test_theo_summary_counts_crossing_ways_twice(world):
    """planet_line pass in the theoretical counters (r5): total way-street
    counts across municipalities = ways carrying addr:street + one EXTRA
    count per planted boundary-crossing way (covers-or-crosses counts it in
    both munis; centroid semantics would count each way exactly once)."""
    import pyarrow.parquet as pq

    from housenumbercore_ray.pipelines.theoretical import theo_muni_summary

    summ = theo_muni_summary(world).to_pandas()
    aw = pq.read_table(f"{world}/osm_address_ways.parquet").to_pandas()
    n_street_ways = int(aw["addr_street"].notna().sum())
    n_crossing = int((aw["addr_street"] == "Grenzweg").sum())
    assert n_crossing > 0
    got = int(summ["anzahl_ways_addrstreet_treffer"].sum())
    # osm_addresses ways (point pass) also land in the same column — count
    # them too for the exact total
    oa = pq.read_table(f"{world}/osm_addresses.parquet").to_pandas()
    n_point_ways = int(((oa["osm_type"] == "way")
                        & oa["addr_street"].notna()).sum())
    assert got == n_point_ways + n_street_ways + n_crossing
