"""List-import pipeline (entry 1, SURVEY.md §3.1) — CSV → canonical deduped
official addresses, end to end through the sniffing reader.

Mirrors CsvListImport.main: stream lines → sniff separator + headers →
canonical rows → reject rows missing street/housenumber → exact dedup on the
import key (street + subarea + postcode + housenumber per municipality,
HousenumberList.java:117-158) → the ``list_addresses`` relation (the
reference's delete+reinsert into stadt_hausnummern becomes an idempotent
full-replace parquet write).

For the oracle, a deterministic CSV serialization of the world's list table
(including its duplicate rows and one reject row) is materialized once under
``<world>/derived/`` and both the engine (via the sniffing reader) and the
DuckDB oracle (via read_csv) consume the same file.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd

CSV_NAME = "list_export.csv"


def ensure_list_csv(world_dir: str) -> str:
    """Serialize list_addresses → semicolon CSV (cached, atomic)."""
    out = os.path.join(world_dir, "derived", CSV_NAME)
    if os.path.exists(out):
        return out
    os.makedirs(os.path.dirname(out), exist_ok=True)
    la = pq.read_table(
        f"{world_dir}/list_addresses.parquet",
        columns=["muni_ref", "street", "housenumber", "postcode", "lon", "lat"],
    ).to_pandas()
    lines = ["gemeindeid;strasse;hausnummer;plz;lon;lat"]
    for r in la.itertuples():
        lines.append(f"{r.muni_ref};{r.street};{r.housenumber};{r.postcode};{r.lon!r};{r.lat!r}")
    # one reject row (missing street) — must be dropped by the reader
    lines.append("99999999;;9;10115;10.0;50.0")
    tmp = out + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write("\n".join(lines) + "\n")
    os.replace(tmp, out)
    return out


def csv_import(world_dir: str) -> rd.Dataset:
    """CSV file → canonical deduped rows (muni_ref, street, housenumber,
    postcode, lon, lat)."""
    from ..sources.csv_reader import read_csv_addresses

    path = ensure_list_csv(world_dir)
    ds, _dialect = read_csv_addresses(path)

    def project(b: pd.DataFrame) -> pd.DataFrame:
        out = b[["muni_ref", "street", "housenumber", "postcode", "lon", "lat"]].copy()
        return out

    projected = ds.map_batches(project, batch_format="pandas")
    # exact dedup on the import key; duplicates carry identical coordinates
    # (by construction), so full-row distinct == key distinct
    from .corpus import _shard_on

    return (
        projected.map_batches(_shard_on(["muni_ref", "street", "housenumber", "postcode"]),
                              batch_format="pandas")
        .groupby("_shard")
        .map_groups(
            lambda g: g.drop_duplicates(["muni_ref", "street", "housenumber", "postcode"]).drop(columns=["_shard"]),
            batch_format="pandas",
        )
    )
