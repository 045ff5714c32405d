"""GML street/address list reader (S4) — the
imports/import_stadtstrassenGENERICGml.java:57-1214 analog.

Reference semantics reproduced:
  - chunked, memory-bounded parsing — the reference re-parses 500-feature
    XML windows (:998); here ``xml.etree.ElementTree.iterparse`` with element
    clearing streams any file size in bounded memory;
  - per-country field-path configuration (:808-915): a
    :class:`GmlCountryConfig` maps canonical fields to element paths
    (namespace-agnostic local names, '/' separated);
  - ordered street-name regex corrections per country (:943-977) via
    functions.street.apply_regex_corrections;
  - per-word case normalization (StreetToUpperLower) optionally applied.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

import pandas as pd
import pyarrow as pa

from ..functions.street import apply_regex_corrections, street_upper_lower


@dataclass
class GmlCountryConfig:
    """Field → slash-separated local-name path below the feature element."""
    countrycode: str
    feature_tag: str                      # local name of one feature member
    paths: dict[str, str] = field(default_factory=dict)
    apply_corrections: bool = True
    apply_case_normalization: bool = False


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _find_path(el, path: str):
    cur = [el]
    for part in path.split("/"):
        nxt = []
        for c in cur:
            nxt.extend(ch for ch in c if _local(ch.tag) == part)
        cur = nxt
        if not cur:
            return None
    return cur[0]


def parse_gml(source, config: GmlCountryConfig, chunk_size: int = 500):
    """Yield pandas DataFrames of ≤ ``chunk_size`` features each (the
    reference's 500-feature parse window, :998). ``source`` is a path or
    file-like of GML bytes."""
    rows: list[dict] = []
    for _, el in ET.iterparse(source, events=("end",)):
        if _local(el.tag) != config.feature_tag:
            continue
        row = {}
        for fieldname, path in config.paths.items():
            node = _find_path(el, path)
            row[fieldname] = (node.text or "").strip() if node is not None else ""
        if "street" in row:
            s = row["street"]
            if config.apply_case_normalization:
                s = street_upper_lower(s, config.countrycode)
            if config.apply_corrections:
                s = apply_regex_corrections(s, config.countrycode)
            row["street"] = s
        rows.append(row)
        el.clear()
        if len(rows) >= chunk_size:
            yield pd.DataFrame(rows)
            rows = []
    if rows:
        yield pd.DataFrame(rows)


def read_gml(paths, config: GmlCountryConfig, chunk_size: int = 500):
    """Ray source: one GML file per task (unsplittable XML), chunk-streamed
    inside the task."""
    import ray.data as rd

    def parse(batch: pa.Table) -> pa.Table:
        import io

        frames = []
        for data in batch["bytes"].to_pylist():
            frames.extend(parse_gml(io.BytesIO(data), config, chunk_size))
        if not frames:
            return pa.Table.from_pydict({f: [] for f in config.paths})
        return pa.Table.from_pandas(pd.concat(frames, ignore_index=True), preserve_index=False)

    return rd.read_binary_files(paths).map_batches(parse, batch_format="pyarrow", batch_size=1)
