"""Kölner Phonetik (Postel 1969) — published vectors, edge rules, and the
digit-for-digit SQL replay used as the hnr_street_phonetik oracle."""

import random

import duckdb
import pandas as pd

from housenumbercore_ray.functions.phonetik import koelner_phonetik
from housenumbercore_ray.pipelines.phonetik_match import (
    street_phonetik,
    street_phonetik_sql,
)


class TestKernel:
    def test_published_vectors(self):
        # de.wikipedia "Kölner Phonetik" worked examples
        assert koelner_phonetik("Müller-Lüdenscheidt") == "65752682"
        assert koelner_phonetik("Breschnew") == "17863"
        assert koelner_phonetik("Wikipedia") == "3412"

    def test_fuzzy_match_property(self):
        # the point of the key: spelling variants collide
        assert (koelner_phonetik("Maier") == koelner_phonetik("Meyer")
                == koelner_phonetik("Mayr") == "67")
        assert koelner_phonetik("Hauptstraße") == koelner_phonetik("Hauptstrasse")

    def test_edge_rules(self):
        # word-final d/t is '2' (empty next is NOT in {c,s,z})
        assert koelner_phonetik("dt") == "2"
        # initial C before L -> 4; inner C after S -> 8
        assert koelner_phonetik("Clown")[0] == "4"
        assert "4" not in koelner_phonetik("eschc")  # inner c, next '' -> 8
        # X not after c/k/q -> 48; after k -> 8
        assert koelner_phonetik("axt") == "0482"
        assert koelner_phonetik("kx") == "48"
        # silent H never codes but stays visible as context
        assert koelner_phonetik("ph") == "3"
        assert koelner_phonetik("hhh") == ""
        assert koelner_phonetik("") == ""
        assert koelner_phonetik("--") == ""

    def test_sql_replay_differential(self):
        rng = random.Random(11)
        tests = ["Müller-Lüdenscheidt", "Breschnew", "Wikipedia", "Xaver",
                 "Campingplatz", "", "-", "hhh", "Achse", "Ochse", "CX",
                 "Szpilman", "pH", "Clown", "Cello"]
        for _ in range(300):
            tests.append("".join(rng.choice("abcdehlmpstxzäöüß -")
                                 for _ in range(rng.randint(0, 12))))
        con = duckdb.connect()
        con.execute("CREATE TABLE t(name VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?)", [(t,) for t in tests])
        sql = street_phonetik_sql("ignored").replace(
            "SELECT DISTINCT CAST(muni_id AS BIGINT) AS muni_id, name\n"
            "  FROM read_parquet('ignored/osm_streets.parquet')",
            "SELECT DISTINCT 0 AS muni_id, name FROM t")
        got = dict(con.execute(sql).df()[["name", "phonetik"]].itertuples(index=False))
        bad = [t for t in set(tests) if got[t] != koelner_phonetik(t)]
        assert bad == []


class TestQuery:
    def test_matches_oracle_on_world(self, ray_session):
        from housenumbercore_ray.sources.worldgen import ensure_world

        wd = ensure_world("/root/testdata/sf0.001")
        eng = (street_phonetik(wd).to_pandas()
               .sort_values(["muni_id", "name"]).reset_index(drop=True))
        ora = (duckdb.connect().execute(street_phonetik_sql(wd)).df()
               .sort_values(["muni_id", "name"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(
            eng.astype({"muni_id": "int64"}), ora.astype({"muni_id": "int64"}))
        assert len(eng) > 0 and (eng["phonetik"].str.len() > 0).all()
