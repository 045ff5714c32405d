import pandas as pd
import pytest

from housenumbercore_ray.functions import (
    apply_regex_corrections,
    expand_range,
    format_hstore,
    german_collation_fold,
    housenumber_normalized,
    housenumber_sortable,
    normalize_official_key,
    normalize_street_name,
    normalized_series,
    official_key_variants,
    parse_hstore,
    select_tag_priority,
    sortable_series,
    split_multivalue,
    street_upper_lower,
)
from housenumbercore_ray.functions.housenumber import split_and_expand
from housenumbercore_ray.functions.street import match_key


class TestHousenumber:
    def test_split_multivalue(self):
        assert split_multivalue("1,3") == ["1", "3"]
        assert split_multivalue("5; 7") == ["5", "7"]
        assert split_multivalue("4a") == ["4a"]

    def test_expand_range_step2(self):
        # TheoreticalHousenumbers.java:292-316: a..b step 2 when b > a
        assert expand_range("2-8") == ["2", "4", "6", "8"]
        assert expand_range("1-4") == ["1", "3"]

    def test_expand_range_failures_drop(self):
        # failed int parse → EMPTY (the reference's TODO at :300)
        assert expand_range("28d-30") == []
        assert expand_range("2-2") == []
        assert expand_range("8-2") == []

    def test_expand_no_dash_kept(self):
        assert expand_range("28d") == ["28d"]
        assert expand_range("47 1/2") == ["47 1/2"]

    def test_expand_rejects_python_int_extensions(self):
        # Python int() alone accepts underscores and non-ASCII digits;
        # Integer.parseInt (and the vectorized regex path) rejects them —
        # the scalar path must agree
        assert expand_range("1_0-1_4") == []
        assert expand_range("٢-٨") == []  # arabic-indic digits
        assert expand_range(" 2 - 8 ") == ["2", "4", "6", "8"]

    def test_split_and_expand(self):
        assert split_and_expand("1,3") == ["1", "3"]
        assert split_and_expand("2-6;9") == ["2", "4", "6", "9"]

    def test_sortable(self):
        # Workcache_Entry.setHausnummerNormalisiert:504-528
        assert housenumber_sortable("1") == "0001"
        assert housenumber_sortable("47 1/2") == "0047 1/2"
        assert housenumber_sortable("4a") == "0004a"
        assert housenumber_sortable("12345") == "12345"
        assert housenumber_sortable("") == ""
        assert housenumber_sortable("a") == "0000a"

    def test_normalized_case_flag(self):
        # Workcache_Entry.java:521-525
        assert housenumber_normalized("4A", True) == "0004A"
        assert housenumber_normalized("4A", False) == "0004a"

    def test_series_match_scalar(self):
        values = ["1", "4a", "4A", "47 1/2", "", "12345", "a"]
        s = pd.Series(values)
        assert sortable_series(s).tolist() == [housenumber_sortable(v) for v in values]
        exact = pd.Series([False] * len(values))
        assert normalized_series(s, exact).tolist() == [
            housenumber_normalized(v, False) for v in values
        ]

    def test_sort_order_is_numeric(self):
        nums = ["9", "10", "2", "100"]
        srt = sorted(nums, key=housenumber_sortable)
        assert srt == ["2", "9", "10", "100"]


class TestStreet:
    def test_ro_strada(self):
        assert normalize_street_name("Strada Mare", "RO") == "Mare"
        assert normalize_street_name("Strada Mare", "DE") == "Strada Mare"

    def test_upper_lower_default_titlecase(self):
        assert street_upper_lower("HAUPTSTRASSE") == "Hauptstrasse"
        assert street_upper_lower("VIA ROMA", "IT") == "Via Roma"

    def test_upper_lower_it_lists(self):
        assert street_upper_lower("VIA DEI FIORI", "IT") == "Via dei Fiori"
        assert street_upper_lower("VIA VITTORIO EMANUELE II", "IT") == "Via Vittorio Emanuele II"

    def test_regex_corrections_pl(self):
        assert apply_regex_corrections("Al. Jerozolimskie", "PL") == "Aleja Jerozolimskie"
        assert apply_regex_corrections("Ulica Marszałkowska", "PL") == "Marszałkowska"

    def test_regex_corrections_it(self):
        assert apply_regex_corrections("Grosser Graben", "IT") == "Großer Graben"

    def test_collation_fold(self):
        assert german_collation_fold("Größenmaßstäbe") == "groessenmassstaebe"
        assert german_collation_fold("Ärger") == "aerger"

    def test_match_key(self):
        assert match_key("Hauptstraße") == "hauptstrasse"
        assert match_key("Strada Mare", "RO") == "mare"


class TestRefs:
    def test_normalize(self):
        assert normalize_official_key("03152012") == "03152012"
        assert normalize_official_key("03 1 52 012") == "03152012"
        assert normalize_official_key("031") == "03100000"
        assert normalize_official_key("123456789") == ""
        assert normalize_official_key("") == ""

    def test_variants(self):
        assert official_key_variants("03152000") == ["03152000", "03152", "03 1 52 000"]
        assert official_key_variants("03152012") == ["03152012", "03 1 52 012"]


class TestTags:
    def test_priority(self):
        # Workcache_Entry.set_osm_tag:387-450
        assert select_tag_priority({"building": "entrance"}) == ('"building"=>"entrance"', 1)
        assert select_tag_priority({"entrance": "main"}) == ('"entrance"=>"main"', 1)
        assert select_tag_priority({"building": "yes"}) == ('"building"=>"yes"', 2)
        assert select_tag_priority({"building": "garage"}) == ('"building"=>"garage"', 9)
        assert select_tag_priority({"amenity": "school"}) == ('"amenity"=>"school"', 20)
        assert select_tag_priority({"addr:housenumber": "4"}) == ("", 99)

    def test_priority_best_wins(self):
        tags = [("amenity", "school"), ("building", "yes"), ("entrance", "yes")]
        assert select_tag_priority(tags) == ('"entrance"=>"yes"', 1)

    def test_priority_tie_first_wins(self):
        tags = [("building", "entrance"), ("entrance", "main")]
        assert select_tag_priority(tags) == ('"building"=>"entrance"', 1)

    def test_hstore_roundtrip(self):
        tags = {"addr:street": 'Ro"sen \\ weg', "building": "yes"}
        assert parse_hstore(format_hstore(tags)) == tags

    def test_hstore_null(self):
        assert parse_hstore('"a"=>NULL, "b"=>"1"') == {"b": "1"}


class TestCandidateExtractorPrefilter:
    """ADVICE r2: the raw-bytes prefilter is scoped to the flat-<p> page
    contract; markup that splits the literal across tags must still be
    found when the stage is built with prefilter=False."""

    # no <p> blocks → extract_text takes the _TAG.sub fallback, which
    # strips tags and MERGES the split literal back together
    HTML = b"<html><body><div>Adre<b>sse:</b> Hauptstra\xc3\x9fe 5, 10115 Berlin (52.5,13.4)</div></body></html>"

    def _batch(self):
        import pyarrow as pa
        return pa.table({"url": ["u1"], "html": [self.HTML]})

    def test_tag_split_literal_skipped_with_prefilter(self):
        from housenumbercore_ray.stages.extract import CandidateExtractor, extract_text
        assert "Adresse:" in extract_text(self.HTML)  # tag-strip merges runs
        assert CandidateExtractor.PREFILTER not in self.HTML
        out = CandidateExtractor()(self._batch())
        assert len(out) == 0  # documented prefilter behavior on split markup

    def test_tag_split_literal_found_without_prefilter(self):
        from housenumbercore_ray.stages.extract import CandidateExtractor
        out = CandidateExtractor(prefilter=False)(self._batch())
        assert len(out) == 1
        assert out["street_raw"][0].as_py().strip() == "Hauptstraße"
        assert out["hnr_raw"][0].as_py() == "5"


class TestExtractMalformedBytes:
    """Crawl-dirt robustness: invalid utf-8, truncated markup, and empty
    payloads must never crash the extractor and must be deterministic."""

    CASES = [
        b"",
        b"\xff\xfe\x00garbage",
        b"<html><body><p>Adresse: Hauptstra\xff\x9fe 5, 10115 X (52.5,13.4)</p>",
        b"<p>unclosed",
        b"\x00\x01\x02<p>Adresse: Teststr. 7, 99999 Y (50.0,8.0)</p>\x03",
    ]

    def test_never_raises_and_deterministic(self):
        from housenumbercore_ray.stages.extract import extract_text

        for raw in self.CASES:
            a, b = extract_text(raw), extract_text(raw)
            assert isinstance(a, str) and a == b

    def test_extractor_batch_survives(self):
        import pyarrow as pa

        from housenumbercore_ray.stages.extract import CandidateExtractor

        batch = pa.table({"url": [f"u{i}" for i in range(len(self.CASES))],
                          "html": list(self.CASES)})
        out = CandidateExtractor(prefilter=False)(batch)
        # the one well-formed mention (valid utf-8 case) is still found
        assert "u4" in set(out["url"].to_pylist())


def test_skyline_mask_matches_bruteforce():
    """_skyline_mask == O(n²) dominance definition, incl. duplicate points
    (mutually non-dominating) and equal-size / equal-price ties."""
    import numpy as np

    from housenumbercore_ray.pipelines.relational import _skyline_mask

    rng = np.random.default_rng(7)
    for trial in range(20):
        n = int(rng.integers(1, 60))
        size = rng.integers(1, 8, n)
        price = rng.integers(1, 8, n).astype(np.float64)
        got = _skyline_mask(size, price)
        dom = ((size[:, None] >= size[None, :]) & (price[:, None] <= price[None, :])
               & ((size[:, None] > size[None, :]) | (price[:, None] < price[None, :])))
        want = ~dom.any(axis=0)
        assert (got == want).all(), (trial, size.tolist(), price.tolist())


class TestOsmosisState:
    """Osmosis state-file timestamp parse (TheoreticalHousenumbers.java:
    817-843): \\: unescape, Z→+0000, ISO-8601 (r5)."""

    def test_parse_escaped_timestamp(self):
        from datetime import datetime

        from housenumbercore_ray.functions.osmosis import parse_state_timestamp

        text = ("#Fri Sep 21 07:39:59 CEST 2012\n"
                "sequenceNumber=121\n"
                "timestamp=2012-09-17T08\\:00\\:00Z\n")
        assert parse_state_timestamp(text) == datetime(2012, 9, 17, 8, 0, 0)

    def test_parse_explicit_offset_normalized_to_utc(self):
        from datetime import datetime

        from housenumbercore_ray.functions.osmosis import parse_state_timestamp

        # +0200 zone → stored naive-UTC, like the reference's
        # timestamp-without-time-zone column
        text = "timestamp=2012-09-17T08\\:30\\:00+0200\n"
        assert parse_state_timestamp(text) == datetime(2012, 9, 17, 6, 30, 0)

    def test_last_timestamp_line_wins_and_missing_is_none(self):
        from datetime import datetime

        from housenumbercore_ray.functions.osmosis import parse_state_timestamp

        two = ("timestamp=2012-01-01T00\\:00\\:00Z\n"
               "timestamp=2013-02-02T01\\:02\\:03Z\n")
        assert parse_state_timestamp(two) == datetime(2013, 2, 2, 1, 2, 3)
        assert parse_state_timestamp("sequenceNumber=5\n") is None

    def test_state_file_round_trip_matches_pages(self):
        """ensure_state_txt derives from max(warc_ts)⌊hour⌋; parsing the
        written file recovers exactly that instant (the oracle's SQL twin)."""
        import pyarrow.dataset as pads

        from housenumbercore_ray.functions.osmosis import osmdb_tstamp
        from housenumbercore_ray.sources.worldgen import ensure_world_scale

        wd = ensure_world_scale("sf0.001")
        got = osmdb_tstamp(wd)
        ts = pads.dataset(f"{wd}/pages").to_table(columns=["warc_ts"])["warc_ts"]
        want = ts.to_pandas().max().to_pydatetime().replace(
            minute=0, second=0, microsecond=0)
        assert got == want
