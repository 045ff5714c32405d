"""OsmChange (.osc) parse + application (r5) — the osmosis diff-import
step preceding every reference evaluation run."""

import numpy as np
import pandas as pd
import pytest

from housenumbercore_ray.sources.osc import OSC_COLS, parse_osc


def _write(tmp_path, body: str) -> str:
    p = tmp_path / "c.osc"
    p.write_text("<?xml version='1.0'?>\n" + body)
    return str(p)


def test_parse_sections_and_tags(tmp_path):
    path = _write(tmp_path, """
<osmChange version='0.6'>
  <create>
    <node id='11' lat='50.1' lon='10.2'>
      <tag k='addr:street' v='Hauptstraße'/>
      <tag k='addr:housenumber' v='4a'/>
      <tag k='building' v='yes'/>
    </node>
  </create>
  <modify>
    <node id='12' lat='50.2' lon='10.3'>
      <tag k='addr:place' v='Dorf'/>
    </node>
  </modify>
  <delete>
    <node id='13' lat='50.3' lon='10.4'/>
  </delete>
</osmChange>""")
    ch = parse_osc(path)
    c = ch["create"]
    assert c.loc[0, "osm_id"] == 11
    assert c.loc[0, "addr_street"] == "Hauptstraße"
    assert c.loc[0, "addr_housenumber"] == "4a"
    assert c.loc[0, "addr_place"] is None  # unknown tags ignored, absent → None
    m = ch["modify"]
    assert m.loc[0, "addr_place"] == "Dorf" and m.loc[0, "addr_street"] is None
    assert ch["delete"]["osm_id"].tolist() == [13]
    assert list(c.columns) == OSC_COLS


def test_parse_repeated_sections_last_wins(tmp_path):
    """osmosis applies documents in order: a later entry for the same id in
    the same kind of section supersedes the earlier one."""
    path = _write(tmp_path, """
<osmChange version='0.6'>
  <modify><node id='5' lat='1.0' lon='2.0'>
    <tag k='addr:housenumber' v='1'/></node></modify>
  <modify><node id='5' lat='1.0' lon='2.0'>
    <tag k='addr:housenumber' v='2'/></node></modify>
</osmChange>""")
    ch = parse_osc(path)
    assert len(ch["modify"]) == 1
    assert ch["modify"].loc[0, "addr_housenumber"] == "2"


def test_parse_rejects_non_osc(tmp_path):
    path = _write(tmp_path, "<osm><node id='1' lat='0' lon='0'/></osm>")
    with pytest.raises(ValueError):
        parse_osc(path)


def test_osc_apply_equals_current(ray_session):
    """The end-to-end invariant (also the DuckDB oracle at sf0.01): applying
    the derived diff to the previous month's node table reproduces the
    current node table exactly — and each change kind is actually present
    in the diff (creates, modifies with planted stale housenumbers,
    deletes absent from the output)."""
    import pyarrow.parquet as pq

    from housenumbercore_ray.pipelines.import_list import osc_apply
    from housenumbercore_ray.sources.osc import ensure_osc_xml, parse_osc, prev_nodes
    from housenumbercore_ray.sources.worldgen import ensure_world_scale

    wd = ensure_world_scale("sf0.001")
    ch = parse_osc(ensure_osc_xml(wd))
    assert len(ch["create"]) > 0 and len(ch["modify"]) > 0 and len(ch["delete"]) > 0
    prev = prev_nodes(wd)
    # the planted stale housenumbers really differ before application
    stale = prev[prev["osm_id"].isin(ch["modify"]["osm_id"])]
    assert stale["addr_housenumber"].str.endswith("_alt").all()

    got = osc_apply(wd).to_pandas()
    cur = pq.read_table(f"{wd}/osm_addresses.parquet").to_pandas()
    cur = cur[cur["osm_type"] == "node"][OSC_COLS]
    assert not got["osm_id"].isin(ch["delete"]["osm_id"]).any()

    def norm(df):
        df = df[OSC_COLS].fillna("").astype({"osm_id": np.int64})
        return df.sort_values("osm_id").reset_index(drop=True)

    pd.testing.assert_frame_equal(norm(got), norm(cur), check_dtype=False)
