"""Osmosis replication state-file handling (VERDICT r4 next-round #6).

The reference reads the osmosis ``last.state.txt`` at evaluation start to
stamp each evaluation row with the OSM DB's replication timestamp
(``TheoreticalHousenumbers.java:817-843``; the column is
``evaluations.osmdb_tstamp``, ``dbstructure.sql:209-226``). The file is
Java-properties format with escaped colons::

    #Fri Sep 21 07:39:59 CEST 2012
    sequenceNumber=121
    timestamp=2012-09-17T08\\:00\\:00Z

Parse quirks replicated exactly: take everything after the first ``=`` of
the ``timestamp=`` line, strip ALL backslashes (Java
``replace("\\\\", "")``), rewrite the ``Z`` zone abbreviation to ``+0000``
(Java's SimpleDateFormat cannot parse ``Z``), then parse ISO-8601
``yyyy-MM-dd'T'HH:mm:ssZ``."""

from __future__ import annotations

import os
from datetime import datetime, timezone


def parse_state_timestamp(text: str) -> datetime | None:
    """Parse the ``timestamp=`` line of an osmosis state file → naive-UTC
    datetime (the reference stores ``timestamp without time zone``).
    Returns None when no timestamp line exists. Later lines win, matching
    the reference's read-all-lines loop."""
    ts = None
    for line in text.splitlines():
        if line.startswith("timestamp="):
            local_time = line[line.index("=") + 1:]
            local_time = local_time.replace("\\", "")
            local_time = local_time.replace("Z", "+0000")
            ts = datetime.strptime(local_time, "%Y-%m-%dT%H:%M:%S%z")
    if ts is None:
        return None
    return ts.astimezone(timezone.utc).replace(tzinfo=None)


def ensure_state_txt(world_dir: str) -> str:
    """Write (cached) the world's ``derived/state.txt`` — the osmosis
    last.state.txt analog. The timestamp is DERIVED from the crawl itself
    (max ``warc_ts`` over pages, truncated to the hour), so the DuckDB
    oracle can recompute the same instant independently from the parquet
    while the engine exercises the real file-parse path, escapes and all."""
    out = os.path.join(world_dir, "derived", "state.txt")
    if os.path.exists(out):
        return out
    import pyarrow.dataset as pads

    os.makedirs(os.path.dirname(out), exist_ok=True)
    tbl = pads.dataset(os.path.join(world_dir, "pages")).to_table(columns=["warc_ts"])
    max_ts = tbl["warc_ts"].to_pandas().max().to_pydatetime()
    hour = max_ts.replace(minute=0, second=0, microsecond=0)
    stamp = hour.strftime("%Y-%m-%dT%H\\:%M\\:%SZ")
    seq = tbl.num_rows % 1_000_000
    tmp = out + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(f"#{hour.strftime('%a %b %d %H:%M:%S')} UTC {hour.year}\n")
        fh.write(f"sequenceNumber={seq}\n")
        fh.write(f"timestamp={stamp}\n")
    os.replace(tmp, out)
    return out


def osmdb_tstamp(world_dir: str) -> datetime:
    """The evaluation run's OSM-DB timestamp: ensure + parse the state file."""
    with open(ensure_state_txt(world_dir)) as fh:
        ts = parse_state_timestamp(fh.read())
    if ts is None:
        raise ValueError(f"state file for {world_dir} has no timestamp line")
    return ts
