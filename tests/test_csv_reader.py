import numpy as np
import pandas as pd
import pytest

from housenumbercore_ray.sources.csv_reader import (
    LAT_UNSET,
    LON_UNSET,
    analyse_header,
    parse_lines,
    read_csv_addresses,
    sniff_file,
    sniff_separator,
)


class TestSniffing:
    def test_priority_order(self):
        assert sniff_separator("a\tb\tc") == "\t"
        assert sniff_separator("a;b;c") == ";"
        assert sniff_separator("a,b,c") == ","
        # strictly-greater wins in test order TAB > ; > , (CsvReader.java:351-369)
        assert sniff_separator("a\tb;c;d") == ";"
        assert sniff_separator("a\tb\tc;d;e") == "\t"

    def test_no_separator_raises(self):
        with pytest.raises(ValueError):
            sniff_separator("justoneheader")

    def test_bom_and_hash_strip(self):
        d = analyse_header("﻿#Strasse;Hausnummer;PLZ", ";")
        assert d.columns == {"street": 0, "housenumber": 1, "postcode": 2}


class TestHeaderSynonyms:
    def test_german_french(self):
        d = analyse_header("Gemeinde;Rue;Numero;Code_Postal;Localite", ";")
        assert d.columns == {"municipality": 0, "street": 1, "housenumber": 2,
                             "postcode": 3, "subarea": 4}

    def test_first_match_wins(self):
        d = analyse_header("strasse;rue", ";")
        assert d.columns["street"] == 0

    def test_overrides(self):
        d = analyse_header("a;b;c", ";", column_overrides={1: "street", 2: "housenumber"})
        assert d.columns == {"street": 1, "housenumber": 2}
        with pytest.raises(ValueError):
            analyse_header("a;b", ";", column_overrides={0: "nope"})

    def test_aachen_fixture_headers(self):
        # the reference's real fixture headers (test/resources/Aachen_Housenumberlist.csv)
        hdr = "FID,wkb_geometry,strnr,strasse,hnr,zus,adresse,plz,sozraum,hochwert,rechtswert"
        d = analyse_header(hdr, ",")
        assert d.columns["street"] == 3
        assert d.columns["postcode"] == 7
        assert d.columns["lat"] == 9    # hochwert
        assert d.columns["lon"] == 10   # rechtswert


class TestParsing:
    DIALECT = analyse_header("strasse;hausnummer;hausnummerzusatz;plz;lon;lat", ";")

    def test_addition_concat(self):
        df = parse_lines(pd.Series(["Hauptstr.;4;a;86150;10,5;50,25"]), self.DIALECT)
        assert df.iloc[0]["housenumber"] == "4a"
        assert df.iloc[0]["lon"] == 10.5   # ',' → '.'
        assert df.iloc[0]["lat"] == 50.25

    def test_bad_coords_unset_both(self):
        df = parse_lines(pd.Series(["X;1;;86150;abc;50.0"]), self.DIALECT)
        assert df.iloc[0]["lon"] == LON_UNSET
        assert df.iloc[0]["lat"] == LAT_UNSET

    def test_false_easting_fix(self):
        df = parse_lines(pd.Series(["X;1;;86150;32500000;5600000"]), self.DIALECT, source_srid="25832")
        assert df.iloc[0]["lon"] == pytest.approx(500000.0)

    def test_rejects(self):
        df = parse_lines(pd.Series([";1;;86150;;", "X;;;86150;;"]), self.DIALECT)
        assert df["_reject"].tolist() == ["Missing_Street", "Missing_Housenumber"]


class TestEndToEnd:
    def test_read_csv_addresses(self, ray_session, tmp_path):
        p = tmp_path / "list.csv"
        p.write_text(
            "﻿Strasse;Hausnummer;PLZ;lon;lat\n"
            "Hauptstraße;1;86150;10,5;50,2\n"
            "Gartenweg;4a;86150;10.6;50.3\n"
            ";9;86150;10.7;50.4\n"      # missing street → rejected
            "Ringweg;;86150;10.8;50.5\n",  # missing housenumber → rejected
            encoding="utf-8",
        )
        ds, dialect = read_csv_addresses(str(p))
        df = ds.to_pandas().sort_values("street").reset_index(drop=True)
        assert dialect.separator == ";"
        assert df["street"].tolist() == ["Gartenweg", "Hauptstraße"]
        assert df["housenumber"].tolist() == ["4a", "1"]
        assert df["lon"].tolist() == [10.6, 10.5]

    def test_extra_tag_columns(self, ray_session, tmp_path):
        p = tmp_path / "list2.csv"
        p.write_text("strasse,hausnummer,quelle\nA,1,kataster\n", encoding="utf-8")
        ds, _ = read_csv_addresses(str(p), extra_tag_columns={2: "source"})
        df = ds.to_pandas()
        assert df.iloc[0]["tag:source"] == "kataster"


class TestLuxembourgLocality:
    def test_locality_resolves_commune(self):
        """M17 (CsvReader.java:473-478, 683-1237): LU rows with empty
        municipality but a known locality get the commune from the side
        table; unknown localities stay empty."""
        import pandas as pd

        from housenumbercore_ray.sources.csv_reader import analyse_header, parse_lines

        d = analyse_header("strasse;hausnummer;localite;commune", ";")
        lines = pd.Series([
            "Rue Principale;1;Dillingen;",      # locality → Beaufort
            "Rue Neuve;2;Surré;",               # locality → Boulaide
            "Grand-Rue;3;Niemandsland;",        # unknown → ''
            "Rue Haute;4;Bech;Vorhanden",       # municipality already set → kept
        ])
        out = parse_lines(lines, d, countrycode="LU")
        assert out["municipality"].tolist() == ["Beaufort", "Boulaide", "", "Vorhanden"]
        # without the LU hook nothing resolves
        out2 = parse_lines(lines, d)
        assert out2["municipality"].tolist() == ["", "", "", "Vorhanden"]
