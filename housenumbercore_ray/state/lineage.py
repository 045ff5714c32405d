"""Resumable partitioned output with per-partition lineage + metrics.

Generalizes the reference's resume machinery:
  - skip-if-already-evaluated (TheoreticalHousenumbers.java:801-812),
  - per-municipality delete+reinsert idempotency (HousenumberList.java:349-361,
    MunicipalityJobs.java:162-167),
  - the Workcache delta writeback whose whole purpose is minimizing re-work
    (Workcache.java header :2-20),
  - the Protokoll-* per-category log sinks (K4).

Layout::

    out_dir/
      part=<key>/data.parquet        # written via temp file + atomic rename
      _manifest/part=<key>.json      # lineage row: inputs, rows, metrics, content hash

A rerun calls :func:`run_resumable` with the same partition keys: completed
partitions (manifest present + data file present) are SKIPPED; the remaining
ones are computed and written. Content hashes prove byte-identical resumed
output (tests/test_resume.py). Partition functions must be deterministic —
no wall-clock, no RNG — which every stage in this engine is.

At cluster scale the same layout works per input shard / key range: the
manifest is tiny JSON per partition, readable with one listing, and a failed
run resumes by diffing manifest keys against the plan.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from collections.abc import Callable, Iterable

import pyarrow as pa
import pyarrow.parquet as pq


def _part_dir(out_dir: str, key: str) -> str:
    return os.path.join(out_dir, f"part={key}")


def _manifest_path(out_dir: str, key: str) -> str:
    return os.path.join(out_dir, "_manifest", f"part={key}.json")


def _table_content_hash(table: pa.Table) -> str:
    """Deterministic content hash: column-name-sorted, row-sorted digest."""
    import pandas as pd

    df = table.to_pandas()
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        df[c] = df[c].astype(str)
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort")
    payload = df.to_csv(index=False).encode("utf-8")
    return hashlib.sha256(payload).hexdigest()


class ResumableWriter:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)

    def is_done(self, key: str) -> bool:
        mp = _manifest_path(self.out_dir, key)
        dp = os.path.join(_part_dir(self.out_dir, key), "data.parquet")
        return os.path.exists(mp) and os.path.exists(dp)

    def write_partition(self, key: str, table: pa.Table, inputs: list[str] | None = None,
                        metrics: dict | None = None) -> dict:
        """Atomic write: temp file → rename; manifest last (commit point)."""
        pdir = _part_dir(self.out_dir, key)
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, ".data.parquet.tmp")
        pq.write_table(table, tmp)
        os.replace(tmp, os.path.join(pdir, "data.parquet"))
        row = {
            "part": key,
            "inputs": inputs or [],
            "rows": table.num_rows,
            "metrics": metrics or {},
            "content_hash": _table_content_hash(table),
            "status": "done",
            "written_at": time.time(),  # informational only; not part of content
        }
        mtmp = _manifest_path(self.out_dir, key) + ".tmp"
        with open(mtmp, "w") as fh:
            json.dump(row, fh)
        os.replace(mtmp, _manifest_path(self.out_dir, key))
        return row


def read_manifest(out_dir: str) -> list[dict]:
    mdir = os.path.join(out_dir, "_manifest")
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in sorted(os.listdir(mdir)):
        if name.endswith(".json"):
            with open(os.path.join(mdir, name)) as fh:
                out.append(json.load(fh))
    return out


def run_resumable(out_dir: str, keys: Iterable[str],
                  compute: Callable[[str], pa.Table],
                  inputs_for: Callable[[str], list[str]] | None = None) -> dict:
    """Compute/write every partition not already committed; returns summary.

    ``compute(key)`` must be deterministic. Partitions already committed are
    skipped (the resume path); the summary reports both sets.
    """
    writer = ResumableWriter(out_dir)
    done, skipped = [], []
    for key in keys:
        if writer.is_done(key):
            skipped.append(key)
            continue
        table = compute(key)
        writer.write_partition(
            key, table, inputs=inputs_for(key) if inputs_for else [],
            metrics={"rows": table.num_rows},
        )
        done.append(key)
    return {"computed": done, "skipped": skipped,
            "manifest_rows": len(read_manifest(out_dir))}


def read_output(out_dir: str) -> pa.Table:
    """Read back all partitions as one table (small results / tests)."""
    parts = []
    for name in sorted(os.listdir(out_dir)):
        if name.startswith("part="):
            parts.append(pq.read_table(os.path.join(out_dir, name, "data.parquet")))
    if not parts:
        raise FileNotFoundError(f"no partitions under {out_dir}")
    return pa.concat_tables(parts)
