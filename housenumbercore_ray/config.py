"""Pipeline configuration + user-extension surface (SURVEY.md §2.10).

The reference exposes: CSV column-mapping flags (``-c`` / ``-cf``,
CsvListImport.java:301-360), per-municipality behavior flags
(``housenumberaddition_exactly``, ``subareasidentifyable``,
``officialgeocoordinates``, ``active_adminlevels``, free-form ``parameters``
hstore — dbstructure.sql:45-58), per-country hooks (official-key handling,
street normalization, subarea admin-level rules) and a highway-validity list
(OSMStreet.java:89-101 with the TODO for a custom override at :100).

Here the same surface is:
  - :class:`PipelineConfig` — a frozen dataclass carried into stages;
  - a registry of NAMED UDF hooks (``register_hook`` / ``get_hook``) so users
    drop in custom per-country normalizers without touching engine code;
  - every pipeline step is a plain ``Dataset -> Dataset`` function, so users
    can insert their own ``map_batches`` stages anywhere in a composition.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field, replace

from .stages.context import VALID_HIGHWAYS

_HOOKS: dict[str, Callable] = {}


def register_hook(name: str, fn: Callable) -> None:
    """Register a named UDF hook (e.g. 'street_normalize:XX')."""
    _HOOKS[name] = fn


def get_hook(name: str, default: Callable | None = None) -> Callable | None:
    return _HOOKS.get(name, default)


@dataclass(frozen=True)
class MunicipalityFlags:
    """Per-municipality behavior (stadt table flags, dbstructure.sql:45-58)."""
    housenumberaddition_exactly: bool = False
    subareasidentifyable: bool = False
    officialgeocoordinates: bool = True
    active_adminlevels: tuple[int, ...] = ()
    parameters: dict = field(default_factory=dict)


@dataclass(frozen=True)
class PipelineConfig:
    countrycode: str = "DE"
    cell_res_deg: float = 0.05
    valid_highways: frozenset = VALID_HIGHWAYS
    subarea_buffer_deg: float = 0.03          # MunicipalityArea.java:675-686
    extract_batch_size: int = 512
    row_batch_size: int = 8192
    source_srid: str = "4326"
    knn_fallback: bool = True                  # assign nearest street when name misses
    lookforassociatedstreetrelations: bool = True  # TheoreticalHousenumbers -l flag

    def with_overrides(self, **kw) -> "PipelineConfig":
        return replace(self, **kw)


DEFAULT_CONFIG = PipelineConfig()
