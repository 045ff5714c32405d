import io

import pytest

from housenumbercore_ray.config import DEFAULT_CONFIG, PipelineConfig, get_hook, register_hook
from housenumbercore_ray.sources.gml import GmlCountryConfig, parse_gml

GML = b"""<?xml version="1.0"?>
<wfs:FeatureCollection xmlns:wfs="http://www.opengis.net/wfs" xmlns:app="http://example">
  <wfs:member>
    <app:Strasse>
      <app:name>Al. Jerozolimskie</app:name>
      <app:gemeinde>Warszawa</app:gemeinde>
      <app:plz>00001</app:plz>
    </app:Strasse>
  </wfs:member>
  <wfs:member>
    <app:Strasse>
      <app:name>Ulica Marszalkowska</app:name>
      <app:gemeinde>Warszawa</app:gemeinde>
      <app:plz>00002</app:plz>
    </app:Strasse>
  </wfs:member>
  <wfs:member>
    <app:Strasse>
      <app:name>Krotka</app:name>
      <app:gemeinde>Lodz</app:gemeinde>
      <app:plz>90001</app:plz>
    </app:Strasse>
  </wfs:member>
</wfs:FeatureCollection>
"""

CFG = GmlCountryConfig(
    countrycode="PL", feature_tag="Strasse",
    paths={"street": "name", "municipality": "gemeinde", "postcode": "plz"},
)


class TestGml:
    def test_parse_with_corrections(self):
        frames = list(parse_gml(io.BytesIO(GML), CFG))
        df = frames[0]
        # PL corrections applied (import_stadtstrassenGENERICGml.java:931-941)
        assert df["street"].tolist() == ["Aleja Jerozolimskie", "Marszalkowska", "Krotka"]
        assert df["municipality"].tolist() == ["Warszawa", "Warszawa", "Lodz"]

    def test_chunking(self):
        frames = list(parse_gml(io.BytesIO(GML), CFG, chunk_size=2))
        assert [len(f) for f in frames] == [2, 1]

    def test_missing_path_empty(self):
        cfg = GmlCountryConfig(countrycode="PL", feature_tag="Strasse",
                               paths={"street": "name", "x": "does/not/exist"})
        df = list(parse_gml(io.BytesIO(GML), cfg))[0]
        assert df["x"].tolist() == ["", "", ""]

    def test_ray_source(self, ray_session, tmp_path):
        from housenumbercore_ray.sources.gml import read_gml

        p = tmp_path / "a.gml"
        p.write_bytes(GML)
        ds = read_gml([str(p)], CFG)
        assert ds.count() == 3


class TestConfig:
    def test_overrides(self):
        c = DEFAULT_CONFIG.with_overrides(countrycode="PL", cell_res_deg=0.01)
        assert c.countrycode == "PL" and c.cell_res_deg == 0.01
        assert DEFAULT_CONFIG.countrycode == "DE"  # frozen original untouched

    def test_hooks(self):
        register_hook("street_normalize:XX", lambda s: s.upper())
        fn = get_hook("street_normalize:XX")
        assert fn("abc") == "ABC"
        assert get_hook("missing", None) is None

    def test_immutable(self):
        with pytest.raises(Exception):
            DEFAULT_CONFIG.countrycode = "FR"
