"""Scalar/vector function library (SURVEY.md §2.2, §2.8).

Pure, deterministic functions — no I/O, no wall-clock, no RNG — so every
``map_batches`` stage built on them is safely retryable/resumable.
"""

from .housenumber import (  # noqa: F401
    split_multivalue,
    expand_range,
    housenumber_sortable,
    housenumber_normalized,
    sortable_series,
    normalized_series,
)
from .street import (  # noqa: F401
    normalize_street_name,
    street_upper_lower,
    apply_regex_corrections,
    german_collation_fold,
)
from .refs import normalize_official_key, official_key_variants  # noqa: F401
from .tags import parse_hstore, format_hstore, select_tag_priority  # noqa: F401
