"""CSV list reader with separator sniffing and header-synonym mapping — the
Ray-native S1 (reference: util/CsvReader.java:70-549).

Reference semantics reproduced:
  - UTF-8 BOM strip on the first line (CsvReader.java:346-350);
  - separator sniffing among TAB / ';' / ',' by max occurrence on the header
    line, ties resolved in that order with strictly-greater wins
    (CsvReader.java:351-369); zero hits → error;
  - leading '#' stripped from the header (analyseHeaderline :197-198);
  - header-name synonyms (German/French/generic, case-insensitive) mapped to
    canonical fields; FIRST matching column wins per field
    (CsvReader.java:191-297; canonical enum CsvImportparameter.java:21-23);
  - user overrides: explicit ``column_overrides`` (the ``-c colno=dest``
    flag, CsvListImport.java:301-360) and ``extra_tag_columns``
    (``-cf colno=osmkey`` → extra OSM tags, applied CsvReader.java:481-487);
  - housenumber = housenumber + addition + addition2 concatenation;
  - lon/lat parse with ','→'.'; EPSG:25832 false-easting fix
    (lon > 32,000,000 → −32e6; CsvReader.java:489-527); parse failure →
    both coordinates unset (sentinel 999.0, Address.java:35-36);
  - rows missing street or housenumber are skipped and counted per category
    (CsvReader.java:531-542 → here a metrics dict instead of Protokoll logs).

Ray integration: a file is sniffed once (cheap driver-side pre-pass on the
first line), then parsed with ``ray.data.read_csv`` using the detected
dialect, and normalized per batch — everything downstream sees the one
canonical Arrow schema (SURVEY.md §1.3).
"""

from __future__ import annotations

import io
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

LON_UNSET = 999.0
LAT_UNSET = 999.0

CANONICAL_FIELDS = [
    "region", "district", "municipality", "municipalityid", "municipalityref",
    "postcode", "subarea", "subareaid", "street", "streetid", "housenumber",
    "housenumberaddition", "housenumberaddition2", "note", "sourcesrid",
    "lon", "lat", "ignore",
]

# CsvReader.analyseHeaderline:191-297 (lower-cased synonym → canonical field)
HEADER_SYNONYMS: dict[str, str] = {
    "stadt": "municipality", "addr:city": "municipality", "gemeinde": "municipality",
    "commune": "municipality",
    "stadtid": "municipalityref", "gemeindeid": "municipalityref",
    "gemeinde_id": "municipalityref", "gemeinde-id": "municipalityref",
    "straße": "street", "strasse": "street", "rue": "street",
    "straße-id": "streetid", "straßeid": "streetid", "strasseid": "streetid",
    "strasse-id": "streetid", "id_caclr_rue": "streetid",
    "postcode": "postcode", "plz": "postcode", "postleitzahl": "postcode",
    "code_postal": "postcode",
    "hausnummer": "housenumber", "numero": "housenumber",
    "hausnummerzusatz": "housenumberaddition", "hausnummernzusatz": "housenumberaddition",
    "hausnummerzusatz2": "housenumberaddition2", "hausnummernzusatz2": "housenumberaddition2",
    "bemerkung": "note", "bemerkungen": "note",
    "koordindatensystem": "sourcesrid", "epsg": "sourcesrid", "srid": "sourcesrid",
    "lon": "lon", "rw": "lon", "laengengrad": "lon", "längengrad": "lon",
    "rechtswert": "lon", "lon_wgs84": "lon",
    "lat": "lat", "hw": "lat", "breitengrad": "lat", "hochwert": "lat",
    "lat_wgs84": "lat",
    "sub": "subarea", "subarea": "subarea", "localite": "subarea",
    "subid": "subareaid", "subarea_id": "subareaid", "subarea-id": "subareaid",
    "subareaid": "subareaid",
}


@dataclass
class CsvDialect:
    separator: str
    columns: dict[str, int]            # canonical field → column index
    extra_tag_columns: dict[int, str] = field(default_factory=dict)  # colno → osm key
    n_columns: int = 0


def sniff_separator(header_line: str) -> str:
    """CsvReader.java:351-369: max occurrence among TAB ; , — strictly
    greater wins, tested in that order."""
    best_sep, best = None, 0
    for sep in ("\t", ";", ","):
        n = header_line.count(sep)
        if n > best:
            best_sep, best = sep, n
    if best_sep is None:
        raise ValueError("Field separator couldn't be examined, set it explicitly")
    return best_sep


def analyse_header(header_line: str, separator: str,
                   column_overrides: dict[int, str] | None = None,
                   extra_tag_columns: dict[int, str] | None = None) -> CsvDialect:
    if header_line.startswith("﻿"):
        header_line = header_line[1:]
    if header_line.startswith("#"):
        header_line = header_line[1:]
    cols = header_line.split(separator)
    mapping: dict[str, int] = {}
    for idx, name in enumerate(cols):
        fieldname = HEADER_SYNONYMS.get(name.strip().lower())
        if fieldname and fieldname not in mapping:   # first match wins
            mapping[fieldname] = idx
    for colno, dest in (column_overrides or {}).items():
        if dest not in CANONICAL_FIELDS:
            raise ValueError(f"unknown destination field {dest!r}")
        if dest == "ignore":
            mapping = {f: c for f, c in mapping.items() if c != colno}
        else:
            mapping[dest] = colno
    return CsvDialect(separator=separator, columns=mapping,
                      extra_tag_columns=dict(extra_tag_columns or {}), n_columns=len(cols))


def sniff_file(path: str, encoding: str = "utf-8",
               column_overrides: dict[int, str] | None = None,
               extra_tag_columns: dict[int, str] | None = None) -> CsvDialect:
    with io.open(path, encoding=encoding) as fh:
        header = fh.readline().rstrip("\r\n")
    sep = sniff_separator(header)
    return analyse_header(header, sep, column_overrides, extra_tag_columns)


def parse_lines(lines: pd.Series, dialect: CsvDialect, source_srid: str = "4326",
                countrycode: str = "") -> pd.DataFrame:
    """Vectorized line → canonical address rows. Returns the canonical frame
    plus a ``_reject`` column ('', 'Missing_Street', 'Missing_Housenumber').

    Country hook M17 (CsvReader.java:473-478): for ``countrycode='LU'``,
    rows with an empty municipality but a non-empty locality (subarea)
    resolve the municipality through the Luxembourg locality→commune side
    table (functions.lu_localities)."""
    parts = lines.str.split(dialect.separator)

    def col(fieldname: str) -> pd.Series:
        idx = dialect.columns.get(fieldname)
        if idx is None:
            return pd.Series("", index=lines.index)
        return parts.str[idx].fillna("").str.strip()

    street = col("street")
    hnr = col("housenumber") + col("housenumberaddition") + col("housenumberaddition2")
    lon_raw = col("lon").str.replace(",", ".", regex=False)
    lat_raw = col("lat").str.replace(",", ".", regex=False)
    lon = pd.to_numeric(lon_raw, errors="coerce")
    lat = pd.to_numeric(lat_raw, errors="coerce")
    have_both = lon_raw.ne("") & lat_raw.ne("")
    ok = have_both & lon.notna() & lat.notna()
    # 25832 false-easting fix (CsvReader.java:506-508)
    if source_srid == "25832":
        lon = lon.where(~(lon > 32_000_000), lon - 32_000_000.0)
    lon = lon.where(ok, LON_UNSET)
    lat = lat.where(ok, LAT_UNSET)

    municipality = col("municipality")
    subarea = col("subarea")
    if countrycode == "LU":
        from ..functions.lu_localities import LU_LOCALITY_TO_COMMUNE

        need = municipality.eq("") & subarea.ne("")
        resolved = subarea[need].map(LU_LOCALITY_TO_COMMUNE).fillna("")
        municipality = municipality.mask(need, resolved)

    out = pd.DataFrame({
        "municipality": municipality,
        "muni_ref": col("municipalityref"),
        "subarea": subarea,
        "street": street,
        "housenumber": hnr,
        "postcode": col("postcode"),
        "note": col("note"),
        "lon": lon.astype(np.float64),
        "lat": lat.astype(np.float64),
        "sourcesrid": np.where(col("sourcesrid").ne(""), col("sourcesrid"), source_srid),
    })
    for colno, osmkey in dialect.extra_tag_columns.items():
        out[f"tag:{osmkey}"] = parts.str[colno].fillna("").str.strip()
    out["_reject"] = np.where(
        street.eq(""), "Missing_Street",
        np.where(hnr.eq(""), "Missing_Housenumber", ""),
    )
    return out


def read_csv_addresses(path: str, encoding: str = "utf-8", source_srid: str = "4326",
                       column_overrides: dict[int, str] | None = None,
                       extra_tag_columns: dict[int, str] | None = None,
                       countrycode: str = ""):
    """→ (ray Dataset of canonical accepted rows, metrics dict).

    The header is sniffed driver-side (one line); the body parses inside
    ``map_batches`` on ``read_text`` lines, so arbitrarily large lists
    stream. Rejected rows are counted per category (the Importlog analog)."""
    import ray.data as rd

    dialect = sniff_file(path, encoding, column_overrides, extra_tag_columns)

    ds = rd.read_text(path, encoding=encoding)

    header_prefix = None
    with io.open(path, encoding=encoding) as fh:
        header_prefix = fh.readline().rstrip("\r\n")

    def parse(batch: pd.DataFrame) -> pd.DataFrame:
        lines = batch["text"]
        lines = lines[lines.str.rstrip("\r\n") != header_prefix]  # drop header line
        if len(lines) == 0:
            empty = parse_lines(pd.Series(["x"], dtype=str), dialect, source_srid, countrycode).iloc[:0]
            return empty
        return parse_lines(lines.str.rstrip("\r\n"), dialect, source_srid, countrycode)

    parsed = ds.map_batches(parse, batch_format="pandas")
    accepted = parsed.map_batches(
        lambda b: b[b["_reject"] == ""].drop(columns=["_reject"]), batch_format="pandas"
    )
    return accepted, dialect
