"""Phonetic street-name keys (Kölner Phonetik) over the OSM street table.

The reference's street matching is exact normalized equality
(reference src/de/regioosm/housenumbercore/util/Street.java); the
Kölner-Phonetik key is the standard German-language fuzzy-match
extension — "Maier Weg" / "Meyer Weg" / "Mayr Weg" share one key, so a
list street misspelled in OSM still finds its candidate street without
an edit-distance pass.

Scale shape: per-batch distinct → ONE (muni, name) distinct shuffle —
the encode runs over the DISTINCT name vocabulary (bounded by streets,
not address rows), the per-name Python loop being the documented
contract of `functions/phonetik.py`. Zero state, no broadcast.

The oracle replays the published Postel tables digit-for-digit in SQL
(index-lambda over the char array; adjacent-collapse via the same
compare-to-previous rule) — differential-tested against the Python
kernel on fuzzed inputs in tests/test_phonetik.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from ..functions.phonetik import phonetik_array

_CODE_CASE = """
      CASE
      WHEN cs[i] IN ('a','e','i','j','o','u','y') THEN '0'
      WHEN cs[i] = 'h' THEN ''
      WHEN cs[i] = 'b' THEN '1'
      WHEN cs[i] = 'p' THEN CASE WHEN coalesce(cs[i+1],'') = 'h' THEN '3' ELSE '1' END
      WHEN cs[i] IN ('d','t') THEN CASE WHEN coalesce(cs[i+1],'') IN ('c','s','z') THEN '8' ELSE '2' END
      WHEN cs[i] IN ('f','v','w') THEN '3'
      WHEN cs[i] IN ('g','k','q') THEN '4'
      WHEN cs[i] = 'c' THEN CASE
          WHEN i = 1 THEN CASE WHEN coalesce(cs[i+1],'') IN ('a','h','k','l','o','q','r','u','x') THEN '4' ELSE '8' END
          WHEN coalesce(cs[i-1],'') IN ('s','z') THEN '8'
          WHEN coalesce(cs[i+1],'') IN ('a','h','k','o','q','u','x') THEN '4' ELSE '8' END
      WHEN cs[i] = 'x' THEN CASE WHEN coalesce(cs[i-1],'') IN ('c','k','q') THEN '8' ELSE '48' END
      WHEN cs[i] = 'l' THEN '5'
      WHEN cs[i] IN ('m','n') THEN '6'
      WHEN cs[i] = 'r' THEN '7'
      WHEN cs[i] IN ('s','z') THEN '8'
      ELSE '' END
"""


def street_phonetik(world_dir: str) -> rd.Dataset:
    """(muni_id, name, phonetik) for every distinct OSM street name."""
    streets = rd.read_parquet(f"{world_dir}/osm_streets.parquet",
                              columns=["muni_id", "name"])

    def distinct_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates(["muni_id", "name"])

    def encode(g: pd.DataFrame) -> pd.DataFrame:
        first = g.drop_duplicates(["muni_id", "name"])
        return pd.DataFrame({
            "muni_id": first["muni_id"].to_numpy(np.int64),
            "name": first["name"].to_numpy(object),
            "phonetik": phonetik_array(first["name"].to_numpy(object)),
        })

    return (
        streets.map_batches(distinct_partial, batch_format="pandas")
        .groupby(["muni_id", "name"])
        .map_groups(encode, batch_format="pandas")
    )


def street_phonetik_sql(world_dir: str) -> str:
    return f"""
WITH names AS (
  SELECT DISTINCT CAST(muni_id AS BIGINT) AS muni_id, name
  FROM read_parquet('{world_dir}/osm_streets.parquet')),
cleaned AS (
  SELECT muni_id, name,
         regexp_replace(replace(replace(replace(replace(lower(name),'ä','a'),'ö','o'),'ü','u'),'ß','s'),
                        '[^a-z]', '', 'g') AS s
  FROM names),
chars AS (SELECT muni_id, name, string_split(s, '') AS cs FROM cleaned),
raws AS (
  SELECT muni_id, name,
         list_aggregate(list_transform(range(1, len(cs)+1), i -> {_CODE_CASE}), 'string_agg', '') AS raw
  FROM chars),
coll AS (SELECT muni_id, name, string_split(coalesce(raw,''), '') AS rs FROM raws),
collapsed AS (
  SELECT muni_id, name,
         coalesce(list_aggregate(list_transform(range(1, len(rs)+1),
           i -> CASE WHEN i = 1 OR rs[i] <> rs[i-1] THEN rs[i] ELSE '' END), 'string_agg', ''), '') AS cstr
  FROM coll)
SELECT muni_id, name,
       CASE WHEN cstr = '' THEN ''
            ELSE substr(cstr,1,1) || replace(substr(cstr,2), '0', '') END AS phonetik
FROM collapsed
"""
