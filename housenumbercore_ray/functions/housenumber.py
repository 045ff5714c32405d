"""Housenumber normalization — exact reference semantics.

Housenumbers are STRINGS, never ints ("4a", "47 1/2", "11 1/128b" —
/root/reference/src/de/regioosm/housenumbercore/util/Address.java:340-342).

Functions here reproduce, bit-for-bit:
  - multi-value split (TheoreticalHousenumbers.java:1012-1018): ','→';' then
    split on ';', trim each part;
  - range expansion (Hausnummernbereich_aufloesen,
    TheoreticalHousenumbers.java:292-316): "a-b" with both sides parseable as
    int and b > a expands to a, a+2, …, ≤ b (step 2 — same street side);
    a failed int parse or b <= a yields the EMPTY list (the number is
    dropped, the reference's documented TODO for "28d-30"); no '-' → the
    value itself;
  - sortable form (Workcache_Entry.setHausnummerNormalisiert:504-528 and the
    duplicate Address.getHousenumberSortable:338-360, pad width 4): prepend
    (4 - len(leading digit run)) zeros to the WHOLE string ("1"→"0001",
    "47 1/2"→"0047 1/2", "12345"→"12345");
  - match-normalized form (Workcache_Entry.java:521-525): the sortable form,
    lower-cased iff the municipality's ``housenumberaddition_exactly`` flag
    is False ("4A" ≡ "4a" in the inexact mode).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = [
    "split_multivalue",
    "expand_range",
    "split_and_expand",
    "housenumber_sortable",
    "housenumber_normalized",
    "sortable_series",
    "normalized_series",
]


def split_multivalue(text: str) -> list[str]:
    """M1: "1,3" → ["1", "3"]; "5; 7" → ["5", "7"]."""
    return [p.strip() for p in text.replace(",", ";").split(";")]


_INT_RE = None


def _strict_int(text: str):
    """Integer.parseInt-equivalent: ASCII digits with optional sign only.
    Python ``int()`` alone accepts underscores and non-ASCII digits
    ('1_0' → 10), which both the reference and the vectorized
    ``explode_housenumbers`` regex reject — validate first so the scalar
    and vectorized paths agree bit-for-bit."""
    global _INT_RE
    if _INT_RE is None:
        import re

        _INT_RE = re.compile(r"[+-]?[0-9]+")
    if not _INT_RE.fullmatch(text):
        return None
    return int(text)


def expand_range(text: str) -> list[str]:
    """M2: step-2 range expansion with the reference's failure semantics."""
    if "-" not in text:
        return [text]
    left, _, right = text.partition("-")
    start = _strict_int(left.strip())
    end = _strict_int(right.strip())
    if start is None or end is None:
        return []
    if end > start:
        return [str(v) for v in range(start, end + 1, 2)]
    return []


def split_and_expand(text: str) -> list[str]:
    """M1 then M2, dropping empties (the reference skips blank parts only via
    later empty-housenumber guards)."""
    out: list[str] = []
    for part in split_multivalue(text):
        out.extend(expand_range(part))
    return out


def _leading_digits(text: str) -> int:
    n = 0
    for ch in text:
        if "0" <= ch <= "9":
            n += 1
        else:
            break
    return n


def housenumber_sortable(text: str) -> str:
    """M3: pad the leading digit run to width 4 by prepending zeros."""
    if text == "":
        return ""
    return "0" * max(0, 4 - _leading_digits(text)) + text


def housenumber_normalized(text: str, addition_exactly: bool) -> str:
    """M4: sortable form; lower-cased when additions compare case-insensitively."""
    s = housenumber_sortable(text)
    return s if addition_exactly else s.lower()


def sortable_series(hnr: pd.Series) -> pd.Series:
    """Vectorized M3 over a string Series."""
    runs = hnr.str.extract(r"^([0-9]*)", expand=False).str.len().fillna(0)
    pads = (4 - runs).clip(lower=0).astype(int)
    zeros = pd.Series(np.char.multiply("0", pads.to_numpy()), index=hnr.index)
    out = zeros + hnr.fillna("")
    return out.where(hnr.fillna("") != "", "")


def normalized_series(hnr: pd.Series, addition_exactly) -> pd.Series:
    """Vectorized M4; ``addition_exactly`` is a bool Series aligned to hnr."""
    s = sortable_series(hnr)
    exact = pd.Series(addition_exactly, index=hnr.index).fillna(False).astype(bool)
    return s.where(exact, s.str.lower())
