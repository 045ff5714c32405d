"""Official municipality key (AGS) normalization — SURVEY.md M9.

Reference: TheoreticalHousenumbers.polygon_holen:344-358 (query variants) and
:400-425 (normalize to length 8); MunicipalityArea.java:293-306, 368-401.
"""

from __future__ import annotations

__all__ = ["normalize_official_key", "official_key_variants"]


def normalize_official_key(key: str) -> str:
    """Remove spaces; right-pad with '0' to length 8; reject (→ "") if > 8.

    (TheoreticalHousenumbers.java:403-422: spaces stripped, short keys
    appended with zeros with a warning, over-long keys cleared with an error.)
    """
    key = key.replace(" ", "")
    if key == "":
        return ""
    if len(key) > 8:
        return ""
    return key + "0" * (8 - len(key))


def official_key_variants(key: str) -> list[str]:
    """Query variants the reference generates to match OSM-tagged keys
    (TheoreticalHousenumbers.java:344-358): the key itself, the
    trailing-zeros-stripped form, and the spaced "03 1 52 012" form
    (2+1+2+rest grouping). Deduplicated, order preserved."""
    variants = [key]
    stripped = key.rstrip("0")
    if stripped and stripped != key:
        variants.append(stripped)
    if len(key) >= 6:
        spaced = f"{key[0:2]} {key[2:3]} {key[3:5]} {key[5:]}"
        variants.append(spaced)
    out: list[str] = []
    for v in variants:
        if v not in out:
            out.append(v)
    return out
