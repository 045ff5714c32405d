"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash → CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

Housenumber-pipeline queries run over the deterministic synthetic world
(BASELINE.json ``input_hint`` shape) materialized under /tmp/hnr_world/<sf>/
— generated on demand by ``housenumbercore_ray.sources.worldgen`` (seeded,
byte-identical across runs); the oracle SQL reads the same parquet files via
``read_parquet`` and recomputes each stage independently (see
housenumbercore_ray/pipelines/oracle.py for why that's a genuine oracle).
Dedup / text-analysis / similarity queries run over the driver-provided
``documents`` / ``embeddings`` tables with oracles on the registered views.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SF001 = "/root/testdata/sf0.001"
ORACLE_SF = "/root/testdata/sf0.01"


def entry() -> Any:
    """Flagship pipeline on sf0.001: pages → extract → spatial join →
    street kNN → evaluation merge; returns the evaluation Dataset."""
    from housenumbercore_ray.pipelines import evaluation as ev
    from housenumbercore_ray.sources.worldgen import ensure_world

    wd = ensure_world(DEFAULT_SF001)
    return ev.evaluation(wd)


def _world(sf_dir: str) -> str:
    from housenumbercore_ray.sources.worldgen import ensure_world

    return ensure_world(sf_dir)


def queries() -> dict[str, Callable[[str], Any]]:
    from housenumbercore_ray.pipelines import evaluation as ev

    def q_extract(sf_dir: str):
        return ev.candidates(_world(sf_dir))

    def q_join_rows(sf_dir: str):
        return ev.join_rows(_world(sf_dir))

    def q_evaluation(sf_dir: str):
        return ev.evaluation(_world(sf_dir))

    def q_muni_summary(sf_dir: str):
        return ev.muni_summary(_world(sf_dir))

    def q_street_summary(sf_dir: str):
        return ev.street_summary(_world(sf_dir))

    return {
        "hnr_extract_candidates": q_extract,
        "hnr_join_rows": q_join_rows,
        "hnr_evaluation": q_evaluation,
        "hnr_muni_summary": q_muni_summary,
        "hnr_street_summary": q_street_summary,
    }


def oracle_sql() -> dict[str, str]:
    from housenumbercore_ray.pipelines.oracle import queries_sql
    from housenumbercore_ray.sources.worldgen import ensure_world, world_dir_for

    # the driver runs oracles at sf=0.01 — make sure that world exists before
    # any SQL runs, and point the SQL at its absolute path
    ensure_world(ORACLE_SF)
    return queries_sql(world_dir_for(ORACLE_SF))
