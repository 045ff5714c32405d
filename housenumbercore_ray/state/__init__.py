"""Per-partition lineage/metrics + resumable output (north rule)."""

from .lineage import ResumableWriter, run_resumable, read_manifest  # noqa: F401
