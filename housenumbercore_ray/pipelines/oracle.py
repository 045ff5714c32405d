"""DuckDB oracle SQL for the flagship pipeline.

Each query in ``__ray_entry__.oracle_sql()`` is an INDEPENDENT SQL
re-computation of a pipeline stage from the same world Parquet inputs: the
SQL re-extracts candidates from ``pages.text`` with regex, re-does the
spatial join with bbox arithmetic (the synthetic boundaries are rectangles /
bbox-tiling multipolygons by construction — see worldgen), re-assigns
streets by normalized-name match with an ``argmin |Δlat|`` kNN fallback
(streets are horizontal polylines by construction), and re-implements the
normalization / range expansion / Treffertyp semantics in SQL.

The engine runs the fully general code paths (WKB polygons, even-odd PIP,
point-to-segment kNN); the oracle exploits the synthetic world's geometry to
stay expressible in SQL. Agreement is therefore a real end-to-end check, not
a shared implementation.
"""

from __future__ import annotations


def _fold(expr: str) -> str:
    """SQL version of functions.street.german_collation_fold + strip (M8)."""
    inner = f"lower({expr})"
    for a, b in [("ß", "ss"), ("ä", "ae"), ("ö", "oe"), ("ü", "ue"), ("â", "a")]:
        inner = f"replace({inner}, '{a}', '{b}')"
    return f"trim({inner})"


_SORTABLE = "repeat('0', greatest(0, 4 - length(regexp_extract({h}, '^[0-9]*')))) || {h}"

# regex must match stages.extract.MENTION_PATTERN
MENTION_SQL_PATTERN = (
    r"Adresse: ([A-Za-zÄÖÜäöüß .\-]+?) ([0-9][^,]*?), "
    r"([0-9]{5}) ([A-Za-zÄÖÜäöüß .\-]+?) "
    r"\((-?[0-9]+\.[0-9]+),(-?[0-9]+\.[0-9]+)\)(?: \[([^\]]*)\])?"
)

CELL_SQL = ("(CAST(floor(({lon} + 180.0) / 0.05) AS BIGINT) * 4194304 "
            "+ CAST(floor(({lat} + 90.0) / 0.05) AS BIGINT))")

VALID_HIGHWAYS_SQL = ("('primary','secondary','tertiary','unclassified','residential',"
                      "'living_street','pedestrian','service','track')")


def prev_pages_sql(world_dir: str) -> str:
    """SQL recomputation of worldgen.ensure_pages_prev from the CURRENT
    pages table (the oracle must derive the previous snapshot independently,
    not read the engine-written rendition): drop page-id % 7 == 3, append
    the since-removed 'Altstrasse 99' mention (at the page's first mention
    location) for page-id % 13 == 6."""
    pat = MENTION_SQL_PATTERN.replace("'", "''")

    def g(n: int) -> str:
        return f"regexp_extract(text, '{pat}', {n})"

    return f"""
SELECT url, warc_ts, html,
       CASE WHEN pg % 13 = 6 AND {g(3)} <> ''
            THEN text || chr(10) || 'Adresse: Altstrasse 99, '
                 || {g(3)} || ' ' || {g(4)}
                 || ' (' || {g(5)} || ',' || {g(6)} || ')'
            ELSE text END AS text,
       lang
FROM (SELECT *, CAST(regexp_extract(url, '/seite/([0-9]+)', 1) AS BIGINT) AS pg
      FROM read_parquet('{world_dir}/pages/*.parquet'))
WHERE pg % 7 <> 3
"""


def preamble(world_dir: str, pages_sql: str | None = None) -> str:
    """Shared WITH-clause CTEs (candidates → located → assigned → exploded →
    evaluation) over the world parquet files. ``pages_sql`` overrides the
    pages source (used to evaluate the PREVIOUS crawl snapshot)."""
    pat = MENTION_SQL_PATTERN.replace("'", "''")
    sortable_hnr = _SORTABLE.format(h="e.hnr")
    pages_src = pages_sql or f"SELECT * FROM read_parquet('{world_dir}/pages/*.parquet')"
    return f"""
WITH
pages_w AS ({pages_src}),
bounds AS (SELECT * FROM read_parquet('{world_dir}/boundaries.parquet') WHERE sub_id = '-1'),
streets_raw AS (SELECT * FROM read_parquet('{world_dir}/osm_streets.parquet')),
list_raw AS (SELECT * FROM read_parquet('{world_dir}/list_addresses.parquet')),
cand_lists AS (
  SELECT url,
         regexp_extract_all(text, '{pat}', 1) AS l_street,
         regexp_extract_all(text, '{pat}', 2) AS l_hnr,
         regexp_extract_all(text, '{pat}', 3) AS l_plz,
         regexp_extract_all(text, '{pat}', 4) AS l_muni,
         regexp_extract_all(text, '{pat}', 5) AS l_lat,
         regexp_extract_all(text, '{pat}', 6) AS l_lon,
         regexp_extract_all(text, '{pat}', 7) AS l_tags
  FROM pages_w
),
candidates AS (
  SELECT url,
         unnest(generate_series(1, len(l_street))) - 1 AS cand_seq,
         unnest(l_street) AS street_raw,
         unnest(l_hnr) AS hnr_raw,
         unnest(l_plz) AS plz,
         unnest(l_muni) AS muni_raw,
         CAST(unnest(l_lat) AS DOUBLE) AS lat,
         CAST(unnest(l_lon) AS DOUBLE) AS lon,
         coalesce(unnest(l_tags), '') AS tags_text
  FROM cand_lists
),
valid_streets AS (
  -- contains-OR-crosses membership (MunicipalityJobs.java:284-304): a
  -- street joins EVERY municipality its geometry reaches into, so one
  -- street row may appear under several muni_ids. Worldgen streets are
  -- horizontal, so the predicate is the exact 1-D interval × rect overlap
  -- of the polyline extent (lon0..lon1 at street_lat) with the muni rect.
  SELECT s.osm_id, s.name, s.street_lat, s.lon0, s.lon1, s.linestring_wkb,
         {_fold('s.name')} AS skey, b.muni_id
  FROM streets_raw s
  JOIN bounds b
    ON s.lon1 >= b.minlon AND s.lon0 <= b.maxlon
   AND s.street_lat >= b.minlat AND s.street_lat <= b.maxlat
  WHERE s.highway IN {VALID_HIGHWAYS_SQL} AND NOT s.blacklisted AND s.name <> ''
),
located AS (
  SELECT c.*, b.area_id, b.muni_id, b.housenumberaddition_exactly AS addition_exactly,
         {CELL_SQL.format(lon='c.lon', lat='c.lat')} AS h3_cell,
         {_fold('c.street_raw')} AS street_key_raw
  FROM candidates c
  JOIN bounds b
    ON c.lon >= b.minlon AND c.lon <= b.maxlon
   AND c.lat >= b.minlat AND c.lat <= b.maxlat
),
name_matched AS (
  SELECT l.*, s.skey AS nm_key, s.osm_id AS nm_osm_id
  FROM located l
  LEFT JOIN valid_streets s
    ON s.muni_id = l.muni_id AND s.skey = l.street_key_raw
),
knn AS (
  SELECT n.url, n.cand_seq, s.skey AS knn_key, s.osm_id AS knn_osm_id,
         row_number() OVER (PARTITION BY n.url, n.cand_seq
                            ORDER BY abs(n.lat - s.street_lat), s.osm_id) AS rn
  FROM name_matched n
  JOIN valid_streets s ON s.muni_id = n.muni_id
  WHERE n.nm_key IS NULL
),
assigned AS (
  SELECT n.url, n.cand_seq, n.street_raw, n.hnr_raw, n.plz, n.muni_raw,
         n.lat, n.lon, n.tags_text, n.h3_cell, n.area_id, n.muni_id,
         n.addition_exactly,
         coalesce(n.nm_key, k.knn_key) AS street_key,
         coalesce(n.nm_osm_id, k.knn_osm_id) AS street_osm_id,
         (n.nm_key IS NOT NULL) AS matched_by_name
  FROM name_matched n
  LEFT JOIN knn k ON k.url = n.url AND k.cand_seq = n.cand_seq AND k.rn = 1
  -- street-less municipalities assign nothing: candidates dropped, matching
  -- the engine's skip (stages/spatial.py) and the reference's street-less-job
  -- skip (MunicipalityJobs.java:284-304)
  WHERE coalesce(n.nm_key, k.knn_key) IS NOT NULL
),
parts AS (
  SELECT a.*, trim(unnest(string_split(replace(a.hnr_raw, ',', ';'), ';'))) AS part
  FROM assigned a
),
parts_rng AS (
  SELECT p.*,
         CASE WHEN strpos(p.part, '-') = 0 THEN NULL
              ELSE try_cast(trim(substr(p.part, 1, strpos(p.part, '-') - 1)) AS BIGINT) END AS r_a,
         CASE WHEN strpos(p.part, '-') = 0 THEN NULL
              ELSE try_cast(trim(substr(p.part, strpos(p.part, '-') + 1)) AS BIGINT) END AS r_b
  FROM parts p
),
exploded AS (
  SELECT p.* EXCLUDE (part, r_a, r_b),
         unnest(CASE WHEN strpos(p.part, '-') = 0 THEN [p.part]
                     WHEN p.r_a IS NOT NULL AND p.r_b IS NOT NULL AND p.r_b > p.r_a
                       THEN list_transform(range(p.r_a, p.r_b + 1, 2), x -> CAST(x AS VARCHAR))
                     ELSE [] END) AS hnr
  FROM parts_rng p
),
exploded_norm AS (
  SELECT e.*,
         {sortable_hnr} AS hnr_sortable,
         CASE WHEN e.addition_exactly THEN {sortable_hnr}
              ELSE lower({sortable_hnr}) END AS hnr_norm
  FROM exploded e
),
list_keys AS (
  SELECT DISTINCT b.muni_id, {_fold('l.street')} AS street_key,
         CASE WHEN b.housenumberaddition_exactly
              THEN {_SORTABLE.format(h='l.housenumber')}
              ELSE lower({_SORTABLE.format(h='l.housenumber')}) END AS hnr_norm
  FROM list_raw l JOIN bounds b ON b.official_ref = l.muni_ref
),
list_reps AS (
  SELECT muni_id, street_key, hnr_norm, hnr_sortable, housenumber AS hnr_display
  FROM (
    SELECT b.muni_id, {_fold('l.street')} AS street_key,
           CASE WHEN b.housenumberaddition_exactly
                THEN {_SORTABLE.format(h='l.housenumber')}
                ELSE lower({_SORTABLE.format(h='l.housenumber')}) END AS hnr_norm,
           {_SORTABLE.format(h='l.housenumber')} AS hnr_sortable,
           l.housenumber, l.subarea, l.postcode,
           row_number() OVER (
             PARTITION BY b.muni_id, {_fold('l.street')},
                          CASE WHEN b.housenumberaddition_exactly
                               THEN {_SORTABLE.format(h='l.housenumber')}
                               ELSE lower({_SORTABLE.format(h='l.housenumber')}) END
             ORDER BY {_SORTABLE.format(h='l.housenumber')}, l.housenumber, l.subarea, l.postcode
           ) AS rn
    FROM list_raw l JOIN bounds b ON b.official_ref = l.muni_ref
  ) WHERE rn = 1
),
osm_tagged AS (
  SELECT e.*,
         CASE WHEN e.tags_text = '' THEN ''
              ELSE string_split(e.tags_text, ';')[1] END AS tag1,
         CASE WHEN len(string_split(e.tags_text, ';')) > 1
              THEN string_split(e.tags_text, ';')[2] ELSE NULL END AS tag2
  FROM exploded_norm e
),
osm_prio AS (
  SELECT o.*,
         CASE WHEN o.tag1 = '' OR o.tag1 IS NULL THEN 99
              WHEN split_part(o.tag1, '=', 1) = 'amenity' THEN 20
              WHEN split_part(o.tag1, '=', 1) = 'building' AND split_part(o.tag1, '=', 2) = 'entrance' THEN 1
              WHEN split_part(o.tag1, '=', 1) = 'building' AND split_part(o.tag1, '=', 2) IN ('yes','office','apartments') THEN 2
              WHEN split_part(o.tag1, '=', 1) = 'building' THEN 9
              WHEN split_part(o.tag1, '=', 1) = 'entrance' AND split_part(o.tag1, '=', 2) IN ('yes','main','home') THEN 1
              ELSE 99 END AS prio1,
         CASE WHEN o.tag2 IS NULL THEN 99
              WHEN split_part(o.tag2, '=', 1) = 'amenity' THEN 20
              WHEN split_part(o.tag2, '=', 1) = 'building' AND split_part(o.tag2, '=', 2) = 'entrance' THEN 1
              WHEN split_part(o.tag2, '=', 1) = 'building' AND split_part(o.tag2, '=', 2) IN ('yes','office','apartments') THEN 2
              WHEN split_part(o.tag2, '=', 1) = 'building' THEN 9
              WHEN split_part(o.tag2, '=', 1) = 'entrance' AND split_part(o.tag2, '=', 2) IN ('yes','main','home') THEN 1
              ELSE 99 END AS prio2
  FROM osm_tagged o
),
osm_sel AS (
  SELECT o.*,
         least(o.prio1, o.prio2) AS tag_prio_row,
         CASE WHEN least(o.prio1, o.prio2) >= 99 THEN ''
              WHEN o.prio2 < o.prio1
              THEN '"' || split_part(o.tag2, '=', 1) || '"=>"' || split_part(o.tag2, '=', 2) || '"'
              ELSE '"' || split_part(o.tag1, '=', 1) || '"=>"' || split_part(o.tag1, '=', 2) || '"' END AS osm_tag_row
  FROM osm_prio o
),
osm_best AS (
  SELECT muni_id, street_key, hnr_norm,
         hnr_sortable, hnr AS hnr_display, osm_tag_row AS osm_tag,
         tag_prio_row AS tag_prio, n_obs
  FROM (
    SELECT o.*, count(*) OVER (PARTITION BY o.muni_id, o.street_key, o.hnr_norm) AS n_obs,
           row_number() OVER (PARTITION BY o.muni_id, o.street_key, o.hnr_norm
                              ORDER BY o.tag_prio_row, o.url, o.cand_seq) AS rn
    FROM osm_sel o
  ) WHERE rn = 1
),
evaluation AS (
  SELECT coalesce(l.muni_id, o.muni_id) AS muni_id,
         coalesce(l.street_key, o.street_key) AS street_key,
         coalesce(l.hnr_norm, o.hnr_norm) AS hnr_norm,
         CASE WHEN l.hnr_norm IS NOT NULL AND o.hnr_norm IS NOT NULL THEN 'i'
              WHEN l.hnr_norm IS NOT NULL THEN 'l' ELSE 'o' END AS treffertyp,
         CASE WHEN l.hnr_norm IS NOT NULL THEN l.hnr_sortable ELSE o.hnr_sortable END AS hnr_sortable,
         CASE WHEN l.hnr_norm IS NOT NULL THEN l.hnr_display ELSE o.hnr_display END AS hnr_display,
         CASE WHEN o.hnr_norm IS NOT NULL THEN o.osm_tag ELSE '' END AS osm_tag,
         CASE WHEN o.hnr_norm IS NOT NULL THEN o.tag_prio ELSE 9999 END AS tag_prio,
         coalesce(o.n_obs, 0) AS n_osm_obs
  FROM list_reps l
  FULL OUTER JOIN osm_best o
    ON l.muni_id = o.muni_id AND l.street_key = o.street_key AND l.hnr_norm = o.hnr_norm
)
"""


def queries_sql(world_dir: str) -> dict[str, str]:
    pre = preamble(world_dir)
    return {
        "hnr_extract_candidates": pre + """
SELECT url, cand_seq, street_raw, hnr_raw, plz, muni_raw, lat, lon, tags_text
FROM candidates
""",
        "hnr_join_rows": pre + """
SELECT e.url, e.cand_seq, e.area_id, e.h3_cell, e.muni_id, e.street_key,
       e.matched_by_name, e.hnr, e.hnr_sortable, e.hnr_norm,
       CASE WHEN k.hnr_norm IS NOT NULL THEN 'i' ELSE 'o' END AS treffertyp
FROM exploded_norm e
LEFT JOIN list_keys k
  ON k.muni_id = e.muni_id AND k.street_key = e.street_key AND k.hnr_norm = e.hnr_norm
""",
        "hnr_evaluation": pre + """
SELECT muni_id, street_key, hnr_norm, treffertyp, hnr_sortable, hnr_display,
       osm_tag, tag_prio, n_osm_obs
FROM evaluation
""",
        "hnr_street_gaps": pre + """
, nums AS (
  SELECT muni_id, street_key, CAST(hnr_norm AS BIGINT) AS num
  FROM evaluation
  WHERE treffertyp <> 'o' AND regexp_full_match(hnr_norm, '[0-9]+')
),
w AS (
  SELECT muni_id, street_key, num % 2 AS parity, num,
         lead(num) OVER (PARTITION BY muni_id, street_key, num % 2
                         ORDER BY num) AS nxt
  FROM nums
)
SELECT muni_id, street_key, CAST(parity AS BIGINT) AS parity,
       num AS gap_from, nxt AS gap_to,
       CAST((nxt - num) / 2 - 1 AS BIGINT) AS n_missing
FROM w WHERE nxt - num > 2
""",
        # osmdb_tstamp (r5): the engine parses derived/state.txt (osmosis
        # escapes and all); the oracle recomputes the same instant
        # INDEPENDENTLY — worldgen derives the state timestamp from
        # max(warc_ts) truncated to the hour, so a SQL recompute over the
        # pages parquet must agree with the file parse.
        "hnr_muni_summary": pre + f"""
SELECT muni_id,
       CAST(sum(CASE WHEN treffertyp <> 'o' THEN 1 ELSE 0 END) AS BIGINT) AS number_target,
       CAST(sum(CASE WHEN treffertyp = 'i' THEN 1 ELSE 0 END) AS BIGINT) AS number_identical,
       CAST(sum(CASE WHEN treffertyp = 'o' THEN 1 ELSE 0 END) AS BIGINT) AS number_osmonly,
       (SELECT date_trunc('hour', max(warc_ts))
        FROM read_parquet('{world_dir}/pages/*.parquet')) AS osmdb_tstamp
FROM evaluation GROUP BY muni_id
""",
        "hnr_assignment_stats": pre + """
SELECT muni_id, CAST(count(*) AS BIGINT) AS n_candidates,
       CAST(sum(CASE WHEN matched_by_name THEN 1 ELSE 0 END) AS BIGINT) AS n_matched_by_name,
       CAST(sum(CASE WHEN matched_by_name THEN 0 ELSE 1 END) AS BIGINT) AS n_knn_assigned,
       CAST(count(DISTINCT street_key) AS BIGINT) AS n_streets
FROM assigned GROUP BY muni_id
""",
        "hnr_street_memberships": pre + """
SELECT muni_id, osm_id, skey AS street_key FROM valid_streets
""",
        # OSC diff application (r5): worldgen derives changes.osc.xml so
        # that apply(prev_nodes, osc) == the CURRENT node table; the engine
        # really parses the XML and streams the application (broadcast
        # small side), so this oracle — just the current table — catches
        # any parse or apply bug while staying fully independent of both.
        "hnr_osc_apply": f"""
SELECT osm_id, addr_street, addr_place, addr_housenumber, lon, lat
FROM read_parquet('{world_dir}/osm_addresses.parquet')
WHERE osm_type = 'node'
""",
        # planet_line address ways (TheoreticalHousenumbers.java:1056-1071,
        # ST_Covers OR ST_Crosses): worldgen address ways are horizontal, so
        # membership is the exact 1-D interval × rect overlap — same
        # reduction as valid_streets. street←place fallback (M12) before
        # the fold (M8) matches street_key_series(addr_street.fillna(place)).
        "hnr_way_memberships": pre + f"""
SELECT b.muni_id, aw.osm_id,
       {_fold("coalesce(aw.addr_street, aw.addr_place, '')")} AS street_key,
       aw.addr_housenumber AS housenumber
FROM read_parquet('{world_dir}/osm_address_ways.parquet') aw
JOIN bounds b
  ON aw.lon1 >= b.minlon AND aw.lon0 <= b.maxlon
 AND aw.way_lat >= b.minlat AND aw.way_lat <= b.maxlat
""",
        # kNN k=3: worldgen streets are horizontal collinear polylines, so
        # the equirect point-to-segment distance reduces EXACTLY to the
        # clamped-extent form below (cos(lat)-scaled Δlon beyond [lon0,lon1],
        # plus Δlat); squared distance preserves the ordering, osm_id breaks
        # mathematical ties on both sides
        "hnr_knn_streets": pre + """
, knn3 AS (
  SELECT l.url, l.cand_seq, s.osm_id,
         row_number() OVER (
           PARTITION BY l.url, l.cand_seq
           ORDER BY power(greatest(s.lon0 - l.lon, l.lon - s.lon1, 0)
                          * cos(radians(l.lat)), 2)
                    + power(l.lat - s.street_lat, 2),
                    s.osm_id) AS rnk
  FROM located l JOIN valid_streets s ON s.muni_id = l.muni_id
)
SELECT url, cand_seq, osm_id, CAST(rnk AS BIGINT) AS knn_rank
FROM knn3 WHERE rnk <= 3
""",
        "hnr_streets_missing_in_osm": pre + f"""
SELECT DISTINCT b.muni_id, {_fold('l.street')} AS street_key
FROM list_raw l JOIN bounds b ON b.official_ref = l.muni_ref
WHERE NOT EXISTS (
  SELECT 1 FROM valid_streets s
  WHERE s.muni_id = b.muni_id AND s.skey = {_fold('l.street')}
)
""",
        "hnr_subarea_rows": pre + f"""
, subs AS (
  SELECT sb.muni_id, sb.sub_id, sb.minlon AS slo, sb.minlat AS sla,
         sb.maxlon AS shi, sb.maxlat AS sha
  FROM read_parquet('{{world_dir}}/boundaries.parquet') sb
  JOIN bounds p ON p.muni_id = sb.muni_id
  WHERE sb.sub_id <> '-1' AND sb.admin_level > p.admin_level
    AND sb.minlon >= p.minlon - 0.03 AND sb.maxlon <= p.maxlon + 0.03
    AND sb.minlat >= p.minlat - 0.03 AND sb.maxlat <= p.maxlat + 0.03
)
SELECT url, cand_seq, muni_id, sub_id FROM (
  SELECT a.url, a.cand_seq, a.muni_id, coalesce(s.sub_id, '-1') AS sub_id,
         row_number() OVER (PARTITION BY a.url, a.cand_seq
                            ORDER BY coalesce(s.sub_id, '~')) AS rn
  FROM assigned a
  -- ±1e-9° (≈0.1 mm) mirrors the engine's ST_Covers-style boundary
  -- inclusion (geo.pip.ON_RING_EPS2 = 1e-18 squared degrees): a point
  -- float-exactly on a shared subarea edge — including the ~1-ulp
  -- arithmetic slack of the edge's own computed coordinate — counts as
  -- inside; genuinely near-boundary points (≥1 coordinate quantum away)
  -- never qualify
  LEFT JOIN subs s
    ON s.muni_id = a.muni_id
   AND a.lon >= s.slo - 1e-9 AND a.lon <= s.shi + 1e-9
   AND a.lat >= s.sla - 1e-9 AND a.lat <= s.sha + 1e-9
) WHERE rn = 1
""".replace("{world_dir}", world_dir),
        # per-subarea street jobs (MunicipalityJobs.java:649-660): the street
        # surface repeated per (muni, subarea) — exploded OSM observations
        # grouped at the subarea level, subarea assignment identical to
        # hnr_subarea_rows (same bbox join + rn=1 tie rule)
        "hnr_subarea_street_summary": pre + f"""
, subs AS (
  SELECT sb.muni_id, sb.sub_id, sb.minlon AS slo, sb.minlat AS sla,
         sb.maxlon AS shi, sb.maxlat AS sha
  FROM read_parquet('{world_dir}/boundaries.parquet') sb
  JOIN bounds p ON p.muni_id = sb.muni_id
  WHERE sb.sub_id <> '-1' AND sb.admin_level > p.admin_level
    AND sb.minlon >= p.minlon - 0.03 AND sb.maxlon <= p.maxlon + 0.03
    AND sb.minlat >= p.minlat - 0.03 AND sb.maxlat <= p.maxlat + 0.03
),
cand_sub AS (
  SELECT url, cand_seq, sub_id FROM (
    SELECT a.url, a.cand_seq, coalesce(s.sub_id, '-1') AS sub_id,
           row_number() OVER (PARTITION BY a.url, a.cand_seq
                              ORDER BY coalesce(s.sub_id, '~')) AS rn
    FROM assigned a
    LEFT JOIN subs s
      ON s.muni_id = a.muni_id
     AND a.lon >= s.slo - 1e-9 AND a.lon <= s.shi + 1e-9
     AND a.lat >= s.sla - 1e-9 AND a.lat <= s.sha + 1e-9
  ) WHERE rn = 1
)
SELECT e.muni_id, cs.sub_id, e.street_key,
       CAST(count(*) AS BIGINT) AS n_obs,
       CAST(count(DISTINCT e.hnr_norm) AS BIGINT) AS hnr_osm,
       min(e.hnr_sortable) AS hnr_min,
       max(e.hnr_sortable) AS hnr_max
FROM exploded_norm e
JOIN cand_sub cs ON cs.url = e.url AND cs.cand_seq = e.cand_seq
GROUP BY e.muni_id, cs.sub_id, e.street_key
""",
        # local-OSM boundary import (importlocalosmboundaries.java): the XML
        # rendition is DERIVED deterministically from boundaries.parquet
        # (worldgen.ensure_boundaries_osm_xml), so the oracle replays the
        # candidate-generation + J6 disambiguation rules in SQL: relation B
        # (full 8-digit key) wins when present and its key is not over-long
        # (muni%5==3 plants a 10-digit key → rejected); otherwise relation C
        # (equal key length, EXACT name) wins when present; else relation A.
        # The winning multipolygon is the byte-exact WKB reassembly: subarea
        # munis union their two half polygons, multipolygon parents pass
        # through, plain parents get the 1-element multipolygon wrapper.
        "hnr_boundary_import": f"""
WITH b AS (
  SELECT * FROM read_parquet('{world_dir}/boundaries.parquet') WHERE sub_id = '-1'
),
s1 AS (SELECT muni_id, polygon_wkb FROM read_parquet('{world_dir}/boundaries.parquet') WHERE sub_id = '1'),
s2 AS (SELECT muni_id, polygon_wkb FROM read_parquet('{world_dir}/boundaries.parquet') WHERE sub_id = '2')
SELECT b.official_ref AS muni_ref,
       CAST(700000 + b.muni_id * 10
            + CASE WHEN b.muni_id % 3 = 0 AND b.muni_id % 5 <> 3 THEN 1
                   WHEN b.muni_id % 4 = 1 THEN 2 ELSE 0 END AS BIGINT) AS relation_id,
       CAST(b.admin_level AS BIGINT) AS admin_level,
       b.name || CASE WHEN b.muni_id % 3 = 0 AND b.muni_id % 5 <> 3
                      THEN ' (Stadt)' ELSE '' END AS rel_name,
       CAST(CASE WHEN s1.muni_id IS NOT NULL THEN 2
                 WHEN upper(substr(hex(b.polygon_wkb), 1, 10)) = '0106000000'
                 -- little-endian uint32 part count: first byte is hex 11..12
                 THEN CAST(('0x' || substr(hex(b.polygon_wkb), 11, 2)) AS INT)
                 ELSE 1 END AS BIGINT) AS n_parts,
       CASE WHEN s1.muni_id IS NOT NULL
            THEN lower('0106000000' || '02000000' || hex(s1.polygon_wkb) || hex(s2.polygon_wkb))
            WHEN upper(substr(hex(b.polygon_wkb), 1, 10)) = '0106000000'
            THEN lower(hex(b.polygon_wkb))
            ELSE lower('0106000000' || '01000000' || hex(b.polygon_wkb)) END AS polygon_wkb_hex
FROM b LEFT JOIN s1 ON s1.muni_id = b.muni_id
       LEFT JOIN s2 ON s2.muni_id = b.muni_id
""",
        "hnr_csv_import": f"""
SELECT DISTINCT gemeindeid AS muni_ref, strasse AS street,
       hausnummer AS housenumber, plz AS postcode,
       CAST(lon AS DOUBLE) AS lon, CAST(lat AS DOUBLE) AS lat
FROM read_csv('{world_dir}/derived/list_export.csv', delim=';', header=true, all_varchar=true)
WHERE trim(strasse) <> '' AND trim(hausnummer) <> ''
""",
        # S2: the shapefile import must round-trip exactly back to the list
        # relation (the .shp/.dbf rendition is derived from it; the reject
        # row is engine-side only and must be dropped)
        "hnr_shape_import": f"""
SELECT DISTINCT muni_ref, street, housenumber, postcode, lon, lat
FROM read_parquet('{world_dir}/list_addresses.parquet')
""",
        # S3: OSM XML reader semantics recomputed from the parquet ground
        # truth: associatedStreet name propagation applies to node/way
        # members only (OsmReader.java:400-426); relation-type members keep
        # an empty street
        "hnr_osm_import": f"""
SELECT CAST(o.osm_id AS BIGINT) AS osm_id, o.osm_type, o.lon, o.lat,
       CASE WHEN o.addr_street IS NOT NULL THEN o.addr_street
            WHEN o.assoc_rel_id IS NOT NULL AND o.osm_type IN ('node', 'way') THEN r.name
            ELSE '' END AS addr_street,
       coalesce(o.addr_place, '') AS addr_place,
       o.addr_housenumber
FROM read_parquet('{world_dir}/osm_addresses.parquet') o
LEFT JOIN read_parquet('{world_dir}/osm_relations.parquet') r
  ON r.rel_id = o.assoc_rel_id
""",
        # S4: the GML street-list import strips the planted 'Ulica ' prefix
        # via the PL correction chain and must recover exactly the distinct
        # official street list
        "hnr_gml_import": f"""
SELECT DISTINCT muni_ref, street
FROM read_parquet('{world_dir}/list_addresses.parquet')
""",
        # two REAL snapshots: evaluation over pages vs evaluation over the
        # SQL-recomputed previous snapshot (prev_pages_sql) — both full
        # evaluation chains run independently inside derived-table WITHs
        "hnr_evaluation_delta": f"""
SELECT coalesce(p.muni_id, c.muni_id) AS muni_id,
       coalesce(p.street_key, c.street_key) AS street_key,
       coalesce(p.hnr_norm, c.hnr_norm) AS hnr_norm,
       CASE WHEN p.muni_id IS NULL THEN 'insert'
            WHEN c.muni_id IS NULL THEN 'delete'
            WHEN p.treffertyp <> c.treffertyp THEN 'update'
            ELSE 'unchanged' END AS change,
       coalesce(c.treffertyp, p.treffertyp) AS treffertyp
FROM ({preamble(world_dir, pages_sql=prev_pages_sql(world_dir))}
      SELECT muni_id, street_key, hnr_norm, treffertyp FROM evaluation) p
FULL OUTER JOIN ({pre}
      SELECT muni_id, street_key, hnr_norm, treffertyp FROM evaluation) c
  ON p.muni_id = c.muni_id AND p.street_key = c.street_key AND p.hnr_norm = c.hnr_norm
""",
        "hnr_muni_coverage": pre + """
, cov AS (
  SELECT muni_id,
         CAST(sum(CASE WHEN treffertyp <> 'o' THEN 1 ELSE 0 END) AS BIGINT) AS hnr_soll,
         CAST(sum(CASE WHEN treffertyp <> 'l' THEN 1 ELSE 0 END) AS BIGINT) AS hnr_osm,
         CAST(sum(CASE WHEN treffertyp = 'l' THEN 1 ELSE 0 END) AS BIGINT) AS hnr_fhlosm,
         CAST(sum(CASE WHEN treffertyp = 'o' THEN 1 ELSE 0 END) AS BIGINT) AS hnr_nurosm,
         CASE WHEN sum(CASE WHEN treffertyp <> 'o' THEN 1 ELSE 0 END) > 0
              THEN 100.0 * sum(CASE WHEN treffertyp = 'i' THEN 1 ELSE 0 END)
                   / sum(CASE WHEN treffertyp <> 'o' THEN 1 ELSE 0 END)
              ELSE 0.0 END AS hnr_abdeck
  FROM evaluation GROUP BY muni_id
)
-- export geometry (exportjobs2shape, dbstructure.sql:289-307): polygon +
-- bbox of the municipality, hex-encoded WKB for cross-engine comparison
SELECT cov.*, lower(hex(b.polygon_wkb)) AS polygon_wkb_hex,
       b.minlon, b.minlat, b.maxlon, b.maxlat
FROM cov JOIN bounds b USING (muni_id)
""",
        "hnr_street_summary": pre + """
, summ AS (
  SELECT muni_id, street_key,
         CAST(sum(CASE WHEN treffertyp <> 'o' THEN 1 ELSE 0 END) AS BIGINT) AS hnr_soll,
         CAST(sum(CASE WHEN treffertyp <> 'l' THEN 1 ELSE 0 END) AS BIGINT) AS hnr_osm,
         CAST(sum(CASE WHEN treffertyp = 'l' THEN 1 ELSE 0 END) AS BIGINT) AS hnr_fhlosm,
         CAST(sum(CASE WHEN treffertyp = 'o' THEN 1 ELSE 0 END) AS BIGINT) AS hnr_nurosm,
         CASE WHEN sum(CASE WHEN treffertyp <> 'o' THEN 1 ELSE 0 END) > 0
              THEN 100.0 * sum(CASE WHEN treffertyp = 'i' THEN 1 ELSE 0 END)
                   / sum(CASE WHEN treffertyp <> 'o' THEN 1 ELSE 0 END)
              ELSE 0.0 END AS hnr_abdeck,
         coalesce(string_agg(CASE WHEN treffertyp = 'l' THEN hnr_display END, ','
                             ORDER BY hnr_sortable, hnr_display), '') AS hnr_liste
  FROM evaluation GROUP BY muni_id, street_key
),
-- street export geometry (exporthnr2shape, dbstructure.sql:311-331):
-- the matched OSM street's linestring (min osm_id tie-break); streets only
-- in the official list have no geometry
street_geom AS (
  SELECT muni_id, skey, lower(hex(min_by(linestring_wkb, osm_id))) AS wkb_hex
  FROM valid_streets GROUP BY muni_id, skey
)
SELECT summ.*, coalesce(sg.wkb_hex, '') AS street_wkb_hex
FROM summ LEFT JOIN street_geom sg
  ON sg.muni_id = summ.muni_id AND sg.skey = summ.street_key
""",
    }


#: shared CTE chain computing per-point flat-top axial hex coords (hq, hr)
#: — the SQL mirror of tiles.hex_axial (see its docstring for the
#: arithmetic contract). Placeholders: world_dir, c1=2/3, c2=-1/3,
#: c3=sqrt(3)/3, size.
_HEX_CTES = """pts AS (
  SELECT coalesce(addr_street, '') AS street,
         (lon * {c1}) / {size} AS q0,
         ((lon * {c2}) + (lat * {c3})) / {size} AS r0
  FROM read_parquet('{world_dir}/osm_addresses.parquet')
),
rnd AS (
  SELECT street, q0, r0, -q0 - r0 AS y0,
         floor(q0 + 0.5) AS rx, floor(-q0 - r0 + 0.5) AS ry,
         floor(r0 + 0.5) AS rz
  FROM pts
),
fx AS (
  SELECT street, rx, ry, rz,
         abs(rx - q0) AS dx, abs(ry - y0) AS dy, abs(rz - r0) AS dz
  FROM rnd
),
hx AS (
  SELECT street,
         CAST(CASE WHEN dx > dy AND dx > dz THEN -ry - rz ELSE rx END
              AS BIGINT) AS hq,
         CAST(CASE WHEN NOT (dx > dy AND dx > dz) AND NOT (dy > dz)
              THEN -rx - ry ELSE rz END AS BIGINT) AS hr
  FROM fx
)"""


def tiles_sql(world_dir: str) -> dict[str, str]:
    """Full SQL recomputation of the tile operators (pipelines/tiles.py).

    Arithmetic contract shared with the engine: z0 index =
    ``floor((lon+180)/RES)`` in float64 (identical IEEE double ops in
    DuckDB and numpy), coarser zooms derived from z0 by ``>>`` — never
    recomputed from lon/lat, which could differ by one ulp at boundaries.
    The vectorize oracle computes the true reachability closure of the
    4-adjacency with a recursive CTE (min-label per cell), independent of
    the engine's star-contraction kernel."""
    from .tiles import (
        BFS_HOT_POINTS,
        BFS_MAX_ROUNDS,
        HEX_OFFSET,
        HEX_SIZE_DEG,
        HEX_SQRT3_3,
        MORTON_QUERY_RECT,
        N_ZOOMS,
        TILE_RES_DEG,
        VECTORIZE_MIN_POINTS,
    )

    mx0, mx1, my0, my1 = MORTON_QUERY_RECT

    res = TILE_RES_DEG
    base = (f"SELECT CAST(osm_id AS BIGINT) AS osm_id, "
            f"CAST(floor((lon + 180.0) / {res}) AS BIGINT) AS ix, "
            f"CAST(floor((lat + 90.0) / {res}) AS BIGINT) AS iy, "
            f"coalesce(addr_street, '') AS street "
            f"FROM read_parquet('{world_dir}/osm_addresses.parquet')")
    zooms = ", ".join(str(z) for z in range(N_ZOOMS))
    return {
        "geo_morton_range": f"""
WITH b AS ({base}),
inb AS (SELECT osm_id, ix, iy FROM b
        WHERE ix BETWEEN {mx0} AND {mx1} AND iy BETWEEN {my0} AND {my1}),
k AS (SELECT unnest(range(0, 22)) AS k)
SELECT i.osm_id, i.ix, i.iy,
       CAST(sum(((i.ix >> k.k) & 1) * (CAST(1 AS BIGINT) << (2 * k.k))
                + ((i.iy >> k.k) & 1) * (CAST(1 AS BIGINT) << (2 * k.k + 1)))
            AS BIGINT) AS morton
FROM inb i CROSS JOIN k GROUP BY i.osm_id, i.ix, i.iy
""",
        "geo_tile_assign": f"""
WITH b AS ({base})
SELECT osm_id, ix, iy, (ix << 22) | iy AS cell FROM b
""",
        "geo_tile_rasterize": f"""
WITH b AS ({base})
SELECT (ix << 22) | iy AS cell, ix, iy,
       CAST(count(*) AS BIGINT) AS n_points,
       CAST(count(DISTINCT street) AS BIGINT) AS n_streets
FROM b GROUP BY 1, 2, 3
""",
        "geo_tile_pyramid": f"""
WITH b AS ({base}), z AS (SELECT unnest([{zooms}]) AS zoom)
SELECT CAST(z.zoom AS BIGINT) AS zoom, b.ix >> z.zoom AS ix,
       b.iy >> z.zoom AS iy, CAST(count(*) AS BIGINT) AS n_points
FROM b CROSS JOIN z GROUP BY 1, 2, 3
""",
        "geo_tile_vectorize": f"""
WITH RECURSIVE
b AS ({base}),
hot AS (
  SELECT (ix << 22) | iy AS cell, ix, iy, CAST(count(*) AS BIGINT) AS n
  FROM b GROUP BY 1, 2, 3 HAVING count(*) >= {VECTORIZE_MIN_POINTS}
),
e0 AS (
  SELECT a.cell AS src, h.cell AS dst
  FROM hot a JOIN hot h
    ON (h.ix = a.ix + 1 AND h.iy = a.iy) OR (h.ix = a.ix AND h.iy = a.iy + 1)
),
edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
reach(a, d) AS (
  SELECT cell, cell FROM hot
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.d
),
lab AS (SELECT a AS cell, min(d) AS region_id FROM reach GROUP BY a)
SELECT lab.region_id, CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(h.n) AS BIGINT) AS n_points,
       min(h.ix) AS min_ix, min(h.iy) AS min_iy,
       max(h.ix) AS max_ix, max(h.iy) AS max_iy
FROM lab JOIN hot h USING (cell) GROUP BY lab.region_id
""",
        "geo_tile_kring": f"""
WITH b AS ({base}),
raster AS (SELECT ix, iy, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1, 2),
offs AS (SELECT unnest([-1, 0, 1]) AS dx),
contrib AS (
  SELECT r.ix + o1.dx AS ix, r.iy + o2.dx AS iy,
         CASE WHEN o1.dx = 0 AND o2.dx = 0 THEN r.n ELSE 0 END AS n_own,
         r.n AS n_ring
  FROM raster r CROSS JOIN offs o1 CROSS JOIN offs o2
)
SELECT (ix << 22) | iy AS cell, ix, iy,
       CAST(sum(n_own) AS BIGINT) AS n_points,
       CAST(sum(n_ring) AS BIGINT) AS ring3_points
FROM contrib GROUP BY 1, 2, 3 HAVING sum(n_own) > 0
""",
        "geo_tile_zonal": f"""
WITH b AS ({base}),
raster AS (SELECT (ix << 22) | iy AS cell, ix, iy,
                  CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1, 2, 3),
zones AS (SELECT muni_id, minlon, minlat, maxlon, maxlat
          FROM read_parquet('{world_dir}/boundaries.parquet') WHERE sub_id = '-1'),
assigned AS (
  SELECT z.muni_id, r.cell, r.n
  FROM raster r JOIN zones z
    ON (r.ix + 0.5) * {res} - 180.0 >= z.minlon
   AND (r.ix + 0.5) * {res} - 180.0 <= z.maxlon
   AND (r.iy + 0.5) * {res} - 90.0 >= z.minlat
   AND (r.iy + 0.5) * {res} - 90.0 <= z.maxlat
)
SELECT CAST(muni_id AS BIGINT) AS muni_id,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(n) AS BIGINT) AS n_points,
       CAST(max(n) AS BIGINT) AS max_cell_points,
       round(CAST(sum(n) AS DOUBLE) / count(*), 6) AS mean_cell_points
FROM assigned GROUP BY muni_id
""",
        # polyfill: worldgen parent polygons are exact bbox tilings (see
        # module docstring), so center-in-polygon == center-in-bbox; lattice
        # centers sit 0.005° off every worldgen edge, so the engine's
        # ON_RING eps band can never flip a verdict vs the bare compare.
        "geo_tile_polyfill": f"""
WITH zones AS (SELECT CAST(muni_id AS BIGINT) AS muni_id,
                      minlon, minlat, maxlon, maxlat
               FROM read_parquet('{world_dir}/boundaries.parquet')
               WHERE sub_id = '-1'),
cand AS (
  SELECT z.muni_id, z.minlon, z.minlat, z.maxlon, z.maxlat,
         CAST(ixu.ix AS BIGINT) AS ix, CAST(iyu.iy AS BIGINT) AS iy
  FROM zones z,
       LATERAL unnest(range(CAST(floor((z.minlon + 180.0) / {res}) AS BIGINT),
                            CAST(floor((z.maxlon + 180.0) / {res}) AS BIGINT) + 1)) AS ixu(ix),
       LATERAL unnest(range(CAST(floor((z.minlat + 90.0) / {res}) AS BIGINT),
                            CAST(floor((z.maxlat + 90.0) / {res}) AS BIGINT) + 1)) AS iyu(iy)
)
SELECT muni_id, ix, iy, (ix << 22) | iy AS cell
FROM cand
WHERE (ix + 0.5) * {res} - 180.0 >= minlon AND (ix + 0.5) * {res} - 180.0 <= maxlon
  AND (iy + 0.5) * {res} - 90.0 >= minlat AND (iy + 0.5) * {res} - 90.0 <= maxlat
""",
        # compact: a zoom-z parent is complete iff all 4 children are
        # complete (z0 = occupied); keep complete cells whose parent is not.
        "geo_tile_compact": f"""
WITH b AS ({base}),
l0 AS (SELECT DISTINCT ix, iy FROM b),
c1 AS (SELECT ix >> 1 AS ix, iy >> 1 AS iy FROM l0
       GROUP BY 1, 2 HAVING count(*) = 4),
c2 AS (SELECT ix >> 1 AS ix, iy >> 1 AS iy FROM c1
       GROUP BY 1, 2 HAVING count(*) = 4),
c3 AS (SELECT ix >> 1 AS ix, iy >> 1 AS iy FROM c2
       GROUP BY 1, 2 HAVING count(*) = 4)
SELECT CAST(0 AS BIGINT) AS zoom, ix, iy, (ix << 22) | iy AS cell FROM l0
WHERE NOT EXISTS (SELECT 1 FROM c1
                  WHERE c1.ix = l0.ix >> 1 AND c1.iy = l0.iy >> 1)
UNION ALL
SELECT 1, ix, iy, (ix << 22) | iy FROM c1
WHERE NOT EXISTS (SELECT 1 FROM c2
                  WHERE c2.ix = c1.ix >> 1 AND c2.iy = c1.iy >> 1)
UNION ALL
SELECT 2, ix, iy, (ix << 22) | iy FROM c2
WHERE NOT EXISTS (SELECT 1 FROM c3
                  WHERE c3.ix = c2.ix >> 1 AND c3.iy = c2.iy >> 1)
UNION ALL
SELECT 3, ix, iy, (ix << 22) | iy FROM c3
""",
        # Moran's I: pairs recomputed by a DIRECT raster self-join (queen
        # adjacency predicate), independent of the engine's shifted-key
        # contributions; sufficient statistics are integers (order-free),
        # the one float expression mirrors the engine's tree exactly.
        "geo_tile_moran": f"""
WITH b AS ({base}),
raster AS (SELECT ix, iy, CAST(count(*) AS BIGINT) AS x FROM b GROUP BY 1, 2),
nb AS (
  SELECT a.x AS xa, c.x AS xc
  FROM raster a JOIN raster c
    ON abs(a.ix - c.ix) <= 1 AND abs(a.iy - c.iy) <= 1
   AND NOT (a.ix = c.ix AND a.iy = c.iy)
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(x * x) AS BIGINT) AS sxx FROM raster),
pw AS (SELECT CAST(count(*) AS BIGINT) AS w, CAST(sum(xa * xc) AS BIGINT) AS a,
              CAST(sum(xa + xc) AS BIGINT) AS bsum FROM nb)
SELECT n AS n_cells, w AS w_pairs, sx AS sum_x, sxx AS sum_xx, a AS cross_xx,
       round((CAST(n AS DOUBLE) / w) *
             ((a - (CAST(sx AS DOUBLE) / n) * bsum
                 + (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n) * w)
              / (sxx - (CAST(sx AS DOUBLE) / n) * sx)), 9) AS moran_i
FROM tot, pw
""",
        # Getis-Ord Gi*: window sums by a direct raster self-join (vs the
        # engine's shifted-key contributions); global stats and window
        # stats are integers, the z expression mirrors the engine's tree.
        "geo_tile_hotspots": f"""
WITH b AS ({base}),
raster AS (SELECT ix, iy, CAST(count(*) AS BIGINT) AS x FROM b GROUP BY 1, 2),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(x * x) AS BIGINT) AS sxx FROM raster),
win AS (
  SELECT a.ix, a.iy, a.x,
         CAST(sum(c.x) AS BIGINT) AS ring3, CAST(count(*) AS BIGINT) AS wi
  FROM raster a JOIN raster c
    ON abs(a.ix - c.ix) <= 1 AND abs(a.iy - c.iy) <= 1
  GROUP BY a.ix, a.iy, a.x
)
SELECT (win.ix << 22) | win.iy AS cell, win.ix AS ix, win.iy AS iy, win.x AS x,
       ring3 AS ring3_x, wi AS w_in,
       round((ring3 - (CAST(sx AS DOUBLE) / n) * wi)
             / (sqrt(CAST(sxx AS DOUBLE) / n
                     - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
                * sqrt((n * wi - wi * wi) / (n - 1.0))), 9) AS gi_z,
       CAST((ring3 - (CAST(sx AS DOUBLE) / n) * wi)
            / (sqrt(CAST(sxx AS DOUBLE) / n
                    - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
               * sqrt((n * wi - wi * wi) / (n - 1.0))) > 1.96 AS BIGINT) AS hotspot
FROM win, tot
""",
        # quadkey/morton: formula-independent recomputation — morton as a
        # per-bit SUM over generate_series (engine: magic-number bit spread),
        # quadkey as a per-digit ordered string aggregation (engine: base-4
        # bytes view of the morton code).
        "geo_tile_quadkey": f"""
WITH b AS ({base}),
cells AS (SELECT DISTINCT ix, iy FROM b),
k AS (SELECT unnest(range(0, 22)) AS k),
kp AS (SELECT unnest(range(0, 14)) AS k),
enc AS (
  SELECT c.ix, c.iy,
         array_to_string(list(CAST(((c.ix >> (21 - k.k)) & 1)
                                   + 2 * ((c.iy >> (21 - k.k)) & 1) AS VARCHAR)
                              ORDER BY k.k), '') AS quadkey,
         CAST(sum(((c.ix >> k.k) & 1) * (CAST(1 AS BIGINT) << (2 * k.k))
                  + ((c.iy >> k.k) & 1) * (CAST(1 AS BIGINT) << (2 * k.k + 1)))
              AS BIGINT) AS morton
  FROM cells c CROSS JOIN k GROUP BY c.ix, c.iy
),
par AS (
  SELECT c.ix, c.iy,
         CAST(sum((((c.ix >> 8) >> k.k) & 1) * (CAST(1 AS BIGINT) << (2 * k.k))
                  + (((c.iy >> 8) >> k.k) & 1) * (CAST(1 AS BIGINT) << (2 * k.k + 1)))
              AS BIGINT) AS parent_z8
  FROM cells c CROSS JOIN kp k GROUP BY c.ix, c.iy
)
SELECT (c.ix << 22) | c.iy AS cell, c.ix AS ix, c.iy AS iy,
       e.morton, e.quadkey, par.parent_z8
FROM cells c
JOIN enc e ON e.ix = c.ix AND e.iy = c.iy
JOIN par ON par.ix = c.ix AND par.iy = c.iy
""",
        # BFS distance transform: recursive-CTE breadth-first closure over
        # a grid-free 4-neighbor self-join (engine: frontier expansion with
        # bucketed joins + anti-join). UNION dedups (ix,iy,d) rows; min(d)
        # is the hop distance; the d < cap guard mirrors BFS_MAX_ROUNDS.
        "geo_tile_distance": f"""
WITH RECURSIVE
b AS ({base}),
cells AS (SELECT ix, iy, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1, 2),
bfs(ix, iy, d) AS (
  SELECT ix, iy, 0 FROM cells WHERE n >= {{bfs_hot}}
  UNION
  SELECT c.ix, c.iy, f.d + 1
  FROM bfs f JOIN cells c
    ON (c.ix = f.ix AND abs(c.iy - f.iy) = 1)
    OR (c.iy = f.iy AND abs(c.ix - f.ix) = 1)
  WHERE f.d < {{bfs_cap}}
),
lab AS (SELECT ix, iy, min(d) AS dist FROM bfs GROUP BY ix, iy)
SELECT (c.ix << 22) | c.iy AS cell, c.ix, c.iy, c.n AS n_points,
       CAST(coalesce(l.dist, -1) AS BIGINT) AS dist
FROM cells c LEFT JOIN lab l ON l.ix = c.ix AND l.iy = c.iy
""".replace("{bfs_hot}", str(BFS_HOT_POINTS)).replace(
            "{bfs_cap}", str(BFS_MAX_ROUNDS)),
        # Hex binning: the cube-rounding algebra of tiles.hex_axial written
        # as stepwise SQL over float64 — identical multiply/add/floor/abs
        # order, floor(v+0.5) rounding (no banker's-round mismatch), and
        # the SAME sqrt(3)/3 literal (HEX_SQRT3_3) on both sides.
        "geo_hex_bin": f"""
WITH {_HEX_CTES.format(world_dir=world_dir, c1=repr(2.0 / 3.0),
                       c2=repr(-1.0 / 3.0), c3=repr(HEX_SQRT3_3),
                       size=repr(HEX_SIZE_DEG))}
SELECT ((hq + {HEX_OFFSET}) << 22) | (hr + {HEX_OFFSET}) AS hex, hq, hr,
       CAST(count(*) AS BIGINT) AS n_points,
       CAST(count(DISTINCT street) AS BIGINT) AS n_streets
FROM hx GROUP BY 1, 2, 3
""",
        # Hex k-ring (gridDisk k=1): raster counts per hex, then each hex
        # contributes its count to itself and its 6 axial neighbors; the
        # n_own trick mirrors the engine (occupied = sum(n_own) > 0).
        "geo_hex_kring": f"""
WITH {_HEX_CTES.format(world_dir=world_dir, c1=repr(2.0 / 3.0),
                       c2=repr(-1.0 / 3.0), c3=repr(HEX_SQRT3_3),
                       size=repr(HEX_SIZE_DEG))},
raster AS (SELECT hq, hr, CAST(count(*) AS BIGINT) AS n FROM hx GROUP BY 1, 2),
offs(dq, dr) AS (
  VALUES (0, 0), (1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)
),
contrib AS (
  SELECT r.hq + o.dq AS hq, r.hr + o.dr AS hr,
         CASE WHEN o.dq = 0 AND o.dr = 0 THEN r.n ELSE 0 END AS n_own,
         r.n AS n_disk
  FROM raster r CROSS JOIN offs o
)
SELECT ((hq + {HEX_OFFSET}) << 22) | (hr + {HEX_OFFSET}) AS hex, hq, hr,
       CAST(sum(n_own) AS BIGINT) AS n_points,
       CAST(sum(n_disk) AS BIGINT) AS disk_points
FROM contrib GROUP BY 1, 2, 3 HAVING sum(n_own) > 0
""",
        # KDE raster: binomial(4)⊗binomial(4) weighted neighborhood sum via
        # an offset-table self-join; integer weights, one exact /256 float.
        "geo_tile_kde": f"""
WITH b AS ({base}),
raster AS (SELECT ix, iy, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1, 2),
k(d, w) AS (VALUES (-2, 1), (-1, 4), (0, 6), (1, 4), (2, 1)),
contrib AS (
  SELECT r.ix + kx.d AS ix, r.iy + ky.d AS iy,
         CASE WHEN kx.d = 0 AND ky.d = 0 THEN r.n ELSE 0 END AS n_own,
         r.n * (kx.w * ky.w) AS num
  FROM raster r CROSS JOIN k kx CROSS JOIN k ky
)
SELECT (ix << 22) | iy AS cell, ix, iy,
       CAST(sum(n_own) AS BIGINT) AS n_points,
       CAST(sum(num) AS BIGINT) AS kde_num,
       CAST(sum(num) AS BIGINT) / 256.0 AS kde
FROM contrib GROUP BY 1, 2, 3 HAVING sum(n_own) > 0
""",
        # Marching-squares contours: raster counts, 4 corner left-joins per
        # candidate square (absent corner = empty cell = 0), the literal
        # 16-case segment table (saddles 5/10 use the fixed two-segment
        # choice the engine documents), and the SAME float64 interpolation
        # (L - va) / (vb - va) — integer corners, iso-level 2.5, so the
        # denominator never vanishes on a crossing edge.
        "geo_tile_contour": f"""
WITH b AS ({base}),
raster AS (SELECT ix, iy, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1, 2),
d(dx, dy) AS (VALUES (0, 0), (1, 0), (0, 1), (1, 1)),
sq AS (SELECT DISTINCT r.ix - d.dx AS sx, r.iy - d.dy AS sy
       FROM raster r CROSS JOIN d),
corner AS (
  SELECT s.sx, s.sy,
         coalesce(r0.n, 0) AS v0, coalesce(r1.n, 0) AS v1,
         coalesce(r2.n, 0) AS v2, coalesce(r3.n, 0) AS v3
  FROM sq s
  LEFT JOIN raster r0 ON r0.ix = s.sx     AND r0.iy = s.sy
  LEFT JOIN raster r1 ON r1.ix = s.sx + 1 AND r1.iy = s.sy
  LEFT JOIN raster r2 ON r2.ix = s.sx + 1 AND r2.iy = s.sy + 1
  LEFT JOIN raster r3 ON r3.ix = s.sx     AND r3.iy = s.sy + 1
),
cs AS (
  SELECT *,
         (CASE WHEN v0 >= {VECTORIZE_MIN_POINTS} THEN 1 ELSE 0 END)
       + (CASE WHEN v1 >= {VECTORIZE_MIN_POINTS} THEN 2 ELSE 0 END)
       + (CASE WHEN v2 >= {VECTORIZE_MIN_POINTS} THEN 4 ELSE 0 END)
       + (CASE WHEN v3 >= {VECTORIZE_MIN_POINTS} THEN 8 ELSE 0 END) AS mscase
  FROM corner
),
segtab(mscase, seg, ea, eb) AS (VALUES
  (1, 0, 3, 0), (2, 0, 0, 1), (3, 0, 3, 1), (4, 0, 1, 2),
  (5, 0, 3, 0), (5, 1, 1, 2), (6, 0, 0, 2), (7, 0, 3, 2),
  (8, 0, 2, 3), (9, 0, 2, 0), (10, 0, 0, 1), (10, 1, 2, 3),
  (11, 0, 2, 1), (12, 0, 1, 3), (13, 0, 1, 0), (14, 0, 0, 3))
SELECT c.sx AS sq_ix, c.sy AS sq_iy, CAST(c.mscase AS BIGINT) AS mscase,
       CAST(t.seg AS BIGINT) AS seg,
       CAST(t.ea AS BIGINT) AS edge_a,
       (2.5 - (CASE t.ea WHEN 0 THEN c.v0 WHEN 1 THEN c.v1
                         WHEN 2 THEN c.v2 ELSE c.v3 END))
       / ((CASE t.ea WHEN 0 THEN c.v1 WHEN 1 THEN c.v2
                     WHEN 2 THEN c.v3 ELSE c.v0 END)
        - (CASE t.ea WHEN 0 THEN c.v0 WHEN 1 THEN c.v1
                     WHEN 2 THEN c.v2 ELSE c.v3 END)) AS t_a,
       CAST(t.eb AS BIGINT) AS edge_b,
       (2.5 - (CASE t.eb WHEN 0 THEN c.v0 WHEN 1 THEN c.v1
                         WHEN 2 THEN c.v2 ELSE c.v3 END))
       / ((CASE t.eb WHEN 0 THEN c.v1 WHEN 1 THEN c.v2
                     WHEN 2 THEN c.v3 ELSE c.v0 END)
        - (CASE t.eb WHEN 0 THEN c.v0 WHEN 1 THEN c.v1
                     WHEN 2 THEN c.v2 ELSE c.v3 END)) AS t_b
FROM cs c JOIN segtab t ON t.mscase = c.mscase
""",
        # IDW gridding: offset-table self-join with the exact integer
        # weights 40/d² (lcm{1,2,4,5,8}=40); empty cells are sum(n_own)=0,
        # the single float division replayed identically.
        "geo_tile_idw": f"""
WITH b AS ({base}),
raster AS (SELECT ix, iy, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1, 2),
offs(dx, dy) AS (
  SELECT dx, dy
  FROM (SELECT unnest([-2, -1, 0, 1, 2]) AS dx) x
  CROSS JOIN (SELECT unnest([-2, -1, 0, 1, 2]) AS dy) y
),
contrib AS (
  SELECT r.ix + o.dx AS ix, r.iy + o.dy AS iy,
         CASE WHEN o.dx = 0 AND o.dy = 0 THEN r.n ELSE 0 END AS n_own,
         CASE WHEN o.dx = 0 AND o.dy = 0 THEN 0
              ELSE r.n * (40 // (o.dx * o.dx + o.dy * o.dy)) END AS num,
         CASE WHEN o.dx = 0 AND o.dy = 0 THEN 0
              ELSE 40 // (o.dx * o.dx + o.dy * o.dy) END AS den
  FROM raster r CROSS JOIN offs o
)
SELECT (ix << 22) | iy AS cell, ix, iy,
       CAST(sum(num) AS BIGINT) AS idw_num,
       CAST(sum(den) AS BIGINT) AS idw_den,
       CAST(sum(num) AS BIGINT) * 1.0 / CAST(sum(den) AS BIGINT) AS idw
FROM contrib GROUP BY 1, 2, 3
HAVING sum(n_own) = 0 AND sum(den) > 0
""",
        # aspect: the slope raster's atan2 orientation, flat cells dropped
        "geo_tile_aspect": f"""
WITH b AS ({base}),
raster AS (SELECT ix, iy, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1, 2),
offs(dx, dy) AS (
  SELECT dx, dy
  FROM (SELECT unnest([-1, 0, 1]) AS dx) x
  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dy) y
),
contrib AS (
  SELECT r.ix + o.dx AS ix, r.iy + o.dy AS iy,
         CASE WHEN o.dx = 0 AND o.dy = 0 THEN r.n ELSE 0 END AS n_own,
         r.n * (-o.dx * (2 - abs(o.dy))) AS cx,
         r.n * (-o.dy * (2 - abs(o.dx))) AS cy
  FROM raster r CROSS JOIN offs o
),
g AS (SELECT (ix << 22) | iy AS cell, ix, iy,
             CAST(sum(n_own) AS BIGINT) AS n_points,
             CAST(sum(cx) AS BIGINT) AS gx,
             CAST(sum(cy) AS BIGINT) AS gy
      FROM contrib GROUP BY 1, 2, 3 HAVING sum(n_own) > 0)
SELECT cell, ix, iy, n_points, gx, gy,
       round(fmod(90.0 - degrees(atan2(CAST(gy AS DOUBLE),
                                       CAST(gx AS DOUBLE))) + 360.0,
                  360.0), 6) AS aspect
FROM g WHERE gx * gx + gy * gy > 0
""",
        # Sobel gradient: 9-offset self-join with the emission weights
        # ex = -dx·(2-|dy|), ey = -dy·(2-|dx|) (kernel weight at (-dx,-dy));
        # integer Gx/Gy/g2, sqrt replayed as the single float op.
        "geo_tile_slope": f"""
WITH b AS ({base}),
raster AS (SELECT ix, iy, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1, 2),
offs(dx, dy) AS (
  SELECT dx, dy
  FROM (SELECT unnest([-1, 0, 1]) AS dx) x
  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dy) y
),
contrib AS (
  SELECT r.ix + o.dx AS ix, r.iy + o.dy AS iy,
         CASE WHEN o.dx = 0 AND o.dy = 0 THEN r.n ELSE 0 END AS n_own,
         r.n * (-o.dx * (2 - abs(o.dy))) AS cx,
         r.n * (-o.dy * (2 - abs(o.dx))) AS cy
  FROM raster r CROSS JOIN offs o
)
SELECT (ix << 22) | iy AS cell, ix, iy,
       CAST(sum(n_own) AS BIGINT) AS n_points,
       CAST(sum(cx) AS BIGINT) AS gx,
       CAST(sum(cy) AS BIGINT) AS gy,
       CAST(sum(cx) AS BIGINT) * CAST(sum(cx) AS BIGINT)
         + CAST(sum(cy) AS BIGINT) * CAST(sum(cy) AS BIGINT) AS g2,
       sqrt(CAST(sum(cx) AS BIGINT) * CAST(sum(cx) AS BIGINT)
         + CAST(sum(cy) AS BIGINT) * CAST(sum(cy) AS BIGINT)) AS grad
FROM contrib GROUP BY 1, 2, 3 HAVING sum(n_own) > 0
""",
    }
