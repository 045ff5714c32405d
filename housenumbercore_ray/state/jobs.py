"""Job queue / schedule metadata — the ``jobs`` table analog
(scripts/dbinstallation/dbstructure.sql:83-94: id, jobname, land_id,
stadt_id, gebiete_id, ``schedule text[]`` of weekly 'day hh:mm:ss' entries,
checkedtime) plus the upsert semantics of
MunicipalityJobs.generateJob (MunicipalityJobs.java:140-175: existing job
for the area → jobname + checkedtime updated; else inserted).

Ray-side the registry is a small JSON file next to the pipeline's lineage
manifests — the driver-visible scheduling state surface. All timestamps are
PASSED IN (ISO strings), never taken from the wall clock, so runs stay
deterministic and testable.

Scale note: one row per (country, municipality) job — bounded by the number
of municipalities (~11k for nationwide Germany, dbstructure_theoeval.sql),
so a single JSON document on the driver is the right tool; the heavy state
(per-partition progress) lives in the lineage manifests, not here.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field
from datetime import datetime, timedelta

__all__ = ["Job", "JobRegistry", "next_due_after"]

_DAYS = {"mon": 0, "tue": 1, "wed": 2, "thu": 3, "fri": 4, "sat": 5, "sun": 6}


def _parse_entry(entry: str) -> tuple[int, int, int, int]:
    """'day hh:mm:ss' (day name or 0-6, Monday first) → (dow, h, m, s)."""
    day_s, time_s = entry.strip().split()
    day_key = day_s.strip().lower()[:3]
    if day_key in _DAYS:
        dow = _DAYS[day_key]
    else:
        dow = int(day_key)
        if not 0 <= dow <= 6:
            raise ValueError(f"bad schedule day {day_s!r}")
    h, m, s = (int(p) for p in time_s.split(":"))
    return dow, h, m, s


def next_due_after(schedule: list[str], after_iso: str) -> str | None:
    """Earliest occurrence strictly AFTER ``after_iso`` of any weekly
    'day hh:mm:ss' entry. None for an empty schedule (run-on-demand jobs)."""
    if not schedule:
        return None
    after = datetime.fromisoformat(after_iso)
    best: datetime | None = None
    for entry in schedule:
        dow, h, m, s = _parse_entry(entry)
        candidate = after.replace(hour=h, minute=m, second=s, microsecond=0)
        candidate += timedelta(days=(dow - after.weekday()) % 7)
        if candidate <= after:
            candidate += timedelta(days=7)
        if best is None or candidate < best:
            best = candidate
    return best.isoformat()


@dataclass
class Job:
    job_id: int
    jobname: str
    land: str
    muni_id: int
    area_id: int
    schedule: list[str] = field(default_factory=list)
    checkedtime: str | None = None      # ISO timestamp of creation/last check


class JobRegistry:
    """JSON-backed jobs table with the reference's upsert + due semantics."""

    def __init__(self, path: str):
        self.path = path
        self.jobs: dict[int, Job] = {}
        self._by_area: dict[int, int] = {}
        if os.path.exists(path):
            with open(path, encoding="utf-8") as fh:
                for row in json.load(fh):
                    job = Job(**row)
                    self.jobs[job.job_id] = job
                    self._by_area[job.area_id] = job.job_id

    def _save(self) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump([asdict(j) for j in sorted(self.jobs.values(), key=lambda j: j.job_id)],
                      fh, ensure_ascii=False, indent=1)
        os.replace(tmp, self.path)

    def generate_job(self, jobname: str, land: str, muni_id: int, area_id: int,
                     now_iso: str, schedule: list[str] | None = None) -> Job:
        """MunicipalityJobs.generateJob:140-175: one job per boundary area —
        existing job gets jobname + checkedtime refreshed, else insert."""
        existing = self._by_area.get(area_id)
        if existing is not None:
            job = self.jobs[existing]
            job.jobname = jobname
            job.checkedtime = now_iso
            if schedule is not None:
                job.schedule = list(schedule)
        else:
            job_id = max(self.jobs, default=0) + 1
            job = Job(job_id, jobname, land, int(muni_id), int(area_id),
                      list(schedule or []), now_iso)
            self.jobs[job_id] = job
            self._by_area[int(area_id)] = job_id
        self._save()
        return job

    def due_jobs(self, now_iso: str) -> list[Job]:
        """Jobs whose next scheduled occurrence after their last check is
        ≤ now. Never-checked scheduled jobs are immediately due."""
        due = []
        for job in sorted(self.jobs.values(), key=lambda j: j.job_id):
            if not job.schedule:
                continue
            if job.checkedtime is None:
                due.append(job)
                continue
            nxt = next_due_after(job.schedule, job.checkedtime)
            if nxt is not None and nxt <= now_iso:
                due.append(job)
        return due

    def mark_checked(self, job_id: int, now_iso: str) -> None:
        self.jobs[job_id].checkedtime = now_iso
        self._save()

    def job_states(self, manifest_partitions: set[str]) -> dict[int, str]:
        """Combine with lineage manifests: 'done' when the job's partition
        key (zero-padded muni id, the run_join_rows_resumable layout) is
        committed, else 'queued'."""
        return {
            j.job_id: ("done" if f"{j.muni_id:05d}" in manifest_partitions else "queued")
            for j in self.jobs.values()
        }
